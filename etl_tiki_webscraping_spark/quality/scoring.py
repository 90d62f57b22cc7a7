"""Model-inference scoring operators: apply a TRAINED model to every
row as pure column arithmetic — the quality-classifier deployment
pattern for pretraining corpora (fastText/logreg-style filters a la
CCNet/LLaMA data pipelines), distinct from the heuristic
``functions.text.quality_score``.

The model is a plain dict of weights — small by construction — so it
rides the closure into every task (effectively a broadcast); scoring
is one narrow projection inside whole-stage codegen: no UDF, no
shuffle, no model server.  At 100 TB the cost is the scan.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sigmoid(z: Column) -> Column:
    """Numerically-stable logistic: computed on -|z| so ``exp`` never
    overflows (exp(-|z|) <= 1), then mirrored for positive z."""
    ez = F.exp(-F.abs(z))
    pos = F.lit(1.0) / (F.lit(1.0) + ez)
    return F.when(z >= 0, pos).otherwise(F.lit(1.0) - pos)


def linear_model_score(
    features: dict[str, Column],
    weights: dict[str, float],
    bias: float = 0.0,
) -> Column:
    """Logistic-regression score ``sigmoid(bias + sum_i w_i * x_i)``
    over named feature columns.  Raises on a weight without a matching
    feature (a silently-dropped model term is a wrong model).  Feature
    terms fold left in sorted-name order so the float sum is
    deterministic across plans and replayable by an oracle."""
    missing = set(weights) - set(features)
    if missing:
        raise ValueError(
            f"weights reference unknown features: {sorted(missing)}"
        )
    z: Column = F.lit(float(bias))
    for name in sorted(weights):
        z = z + F.lit(float(weights[name])) * features[name].cast("double")
    return sigmoid(z)


def score_and_band(
    df: DataFrame,
    score_col: Column,
    bands: list[float],
    out_score: str = "score",
    out_band: str = "band",
) -> DataFrame:
    """Attach the model score plus a quality band (index of the first
    threshold the score clears, descending bands list) — the
    keep/review/drop routing step after classifier scoring."""
    if bands != sorted(bands, reverse=True):
        raise ValueError("bands must be descending thresholds")
    band: Column = F.lit(len(bands))
    for i in range(len(bands) - 1, -1, -1):
        band = F.when(score_col >= F.lit(bands[i]), F.lit(i)).otherwise(band)
    return df.withColumn(out_score, score_col).withColumn(out_band, band)


def _sigmoid_py(z: float) -> float:
    """Python twin of :func:`sigmoid` for unit-gating the expression."""
    ez = math.exp(-abs(z))
    p = 1.0 / (1.0 + ez)
    return p if z >= 0 else 1.0 - p


def laplace_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float,
    seed_col: Column | None = None,
) -> DataFrame:
    """Laplace-mechanism noisy counts per group (the count-release
    primitive of differential privacy): each group's count gets
    additive Laplace(1/epsilon) noise — sensitivity 1 for a
    one-row-per-entity count — via inverse-CDF sampling
    ``-b * sgn(u - 1/2) * ln(1 - 2|u - 1/2|)``.

    The uniform u derives from the md5-prefix hash of the group key
    (plus an optional ``seed_col``), making the release DETERMINISTIC:
    re-running never re-randomizes (re-release with fresh noise leaks
    — averaging attacks), and an oracle can replay the exact noise on
    any engine.  True DP deployment swaps the hash draw for secure
    randomness ONCE and persists the release; the mechanism, scale,
    and post-processing are identical.  Counts are one
    map-side-combinable aggregate; the noise is arithmetic on the
    group-cardinality result — nothing scales with row count.

    Returns (group_cols..., noisy_count) with the noisy value rounded
    to 6 places.
    """
    noise = laplace_noise(
        F.concat_ws(
            "\x1f",
            *[F.col(c).cast("string") for c in group_cols],
            *([seed_col.cast("string")] if seed_col is not None else []),
        ),
        epsilon,
    )
    return (
        df.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *group_cols,
            F.round(F.col("n") + noise, 6).alias("noisy_count"),
        )
    )


def laplace_noise(key: Column, epsilon: float) -> Column:
    """Deterministic Laplace(1/epsilon) noise column keyed on ``key``
    (see :func:`laplace_noisy_counts` for the release semantics): the
    md5-prefix uniform feeds the inverse CDF.  The half-offset keeps
    BOTH tails of u strictly inside (0, 1) — u = 1 would put
    ln(1 - 2|u - 1/2|) at ln(0) = -inf and release an infinite count
    for that unlucky 1-in-2^32 key."""
    if epsilon <= 0:
        raise ValueError("epsilon must be > 0")
    b = 1.0 / epsilon
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double")
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    centered = u - F.lit(0.5)
    return (
        F.lit(-b)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
