"""Distribution-drift detection (Population Stability Index) between
two dataset slices — the data-quality monitor a continuously-ingesting
pipeline runs per batch ("did this week's feature distribution move?").

PSI over fixed-width bins:

    PSI = Σ_bins (p_a - p_b) · ln(p_a / p_b)

with additive (Laplace) smoothing so empty bins never divide by zero.
Conventional reading: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25
major shift.

Spark shape: one groupBy per side keyed on (group, bin) — counts
partial-aggregate map-side — then a full-outer join on the bounded
(group × bins) grid and a per-group reduce.  Nothing in the plan
scales with row count except the initial scan, so the monitor runs as
a cheap tail stage of any ingest job.  Per-bin PSI terms round to
DECIMAL(18,8) before the final sum, making the reported index
accumulation-order independent (cluster-size stable).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _binned(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    bin_width: float,
    n_bins: int,
    out: str,
) -> DataFrame:
    """Fixed-width-bin counts per group; values outside [0, n_bins·w)
    clamp to the edge bins; NULL values are excluded (count them
    separately if missingness drift matters)."""
    b = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor(F.col(value_col) / F.lit(bin_width)).cast("int")),
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, b.alias("bin"))
        .agg(F.count(F.lit(1)).alias(out))
    )


def psi_drift(
    baseline: DataFrame,
    current: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    bin_width: float,
    n_bins: int = 20,
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-group PSI of ``current`` against ``baseline``.

    Returns (group_cols..., psi double, n_baseline, n_current).
    The smoothed estimator runs over the FULL n_bins grid (bins empty
    on both sides still contribute their smoothing mass, so the
    normalizer is consistent).  Identical distributions with EQUAL
    sample counts give PSI = 0 exactly (p_a == p_b per bin); with very
    unequal window sizes the smoothing itself contributes a small
    positive bias — compare like-sized windows, or raise ``smoothing``
    consciously, before alerting near the 0.1 threshold.
    """
    group_cols = list(group_cols)
    ca = _binned(baseline, group_cols, value_col, bin_width, n_bins, "na")
    cb = _binned(current, group_cols, value_col, bin_width, n_bins, "nb")
    counts = ca.join(cb, on=[*group_cols, "bin"], how="full_outer").select(
        *group_cols,
        "bin",
        F.coalesce("na", F.lit(0)).alias("na"),
        F.coalesce("nb", F.lit(0)).alias("nb"),
    )
    # densify to the full grid: every group x every bin
    all_bins = (
        counts.select(*group_cols)
        .distinct()
        .select(
            *group_cols,
            F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"),
        )
    )
    grid = all_bins.join(counts, on=[*group_cols, "bin"], how="left").select(
        *group_cols,
        "bin",
        F.coalesce("na", F.lit(0)).alias("na"),
        F.coalesce("nb", F.lit(0)).alias("nb"),
    )
    totals = grid.groupBy(*group_cols).agg(
        F.sum("na").alias("na_tot"), F.sum("nb").alias("nb_tot")
    )
    # totals table is |groups|-sized: broadcast back onto the bin grid
    g = grid.join(F.broadcast(totals), on=group_cols)
    s, sb = F.lit(float(smoothing)), F.lit(float(smoothing) * n_bins)
    pa = (F.col("na") + s) / (F.col("na_tot") + sb)
    pb = (F.col("nb") + s) / (F.col("nb_tot") + sb)
    term = ((pa - pb) * F.log(pa / pb)).cast("decimal(18,8)")
    return (
        g.groupBy(*group_cols)
        .agg(
            F.sum(term).cast("double").alias("psi"),
            F.max("na_tot").alias("n_baseline"),
            F.max("nb_tot").alias("n_current"),
        )
    )
