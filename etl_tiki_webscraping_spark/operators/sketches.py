"""Frequency-sketch operators: exact heavy hitters at scale via a
Misra-Gries candidate pass, and DataFrame-native mergeable Count-Min
sketches.

The reference's warehouse answers "top sellers" with a full GROUP BY
over current state (sql/dwh.sql aggregates); at 100 TB a groupBy over
a high-cardinality column shuffles every distinct key.  The operators
here bound that:

- :func:`heavy_hitters` — two passes, both bounded: a per-partition
  Misra-Gries summary (at most ``capacity`` counters in memory,
  candidates only — never full counts — cross the wire), then an
  EXACT count restricted to the broadcast candidate set.  The output
  is exactly the values with count >= threshold: the MG guarantee
  makes false negatives impossible when ``capacity + 1 > 2n/threshold``
  (auto-sized), and the exact pass kills false positives — the same
  approximate-prune + exact-close design as
  ``operators/bloom.py::bloom_pruned_semi_join``.

- :func:`cms_build` / :func:`cms_merge` / :func:`cms_estimate` — a
  Count-Min sketch held as ordinary DataFrame rows ``(depth, bucket,
  cnt)`` with seeded md5-derived bucket hashing (engine-portable —
  DuckDB replays every cell, see ``_cms_bucket``): build is one
  map-side-combined groupBy bounded by depth x width cells per task,
  merging sketches of different batches is a plain additive groupBy
  (the re-aggregatable form rollups need), and estimates join probes
  against the bounded cell grid.  Estimates only ever OVER-count
  (eps = e/width relative mass, delta = e^-depth), the classic CMS
  bound.
"""

from __future__ import annotations

import math
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    df: DataFrame,
    col: str,
    threshold_count: int,
    capacity: int | None = None,
    n: int | None = None,
) -> DataFrame:
    """EXACT frequent-value mining: all values of ``col`` occurring at
    least ``threshold_count`` times, with their exact counts — without
    a full-cardinality groupBy shuffle.

    Pass 1 (candidates): each partition runs batch Misra-Gries over its
    Arrow batches — at most ``capacity`` counters; when the table
    overflows, the (capacity+1)-th largest count is subtracted from
    every counter and non-positive ones drop, which removes at least
    ``(capacity+1) * delta`` mass per step, so a partition's total
    undercount is bounded by ``n_p / (capacity + 1)``.  Any value with
    global count >= threshold therefore survives in at least one
    partition whenever ``capacity + 1 > 2n/threshold`` — the default
    sizing (one ``df.count()``; pass ``capacity`` explicitly to skip
    it, e.g. from a snapshot manifest's free row count).  An explicit
    ``capacity`` below that bound would silently void the
    no-false-negatives guarantee, so when passing one also pass ``n``
    (the row count it was sized from — a manifest free count is fine)
    and the bound is CHECKED: an undersized capacity raises instead of
    returning a silently incomplete set.  Only
    candidate VALUES leave the executors.

    Pass 2 (exact close): count only rows matching the broadcast
    candidate set — the aggregation's key space is the candidate list,
    not the column's cardinality — and apply the threshold exactly.
    False positives die here; false negatives cannot exist by the MG
    guarantee, so the result is identical to the full GROUP BY +
    HAVING.  NULLs are not counted (SQL COUNT semantics).
    """
    import pandas as pd

    if threshold_count < 1:
        raise ValueError(f"threshold_count must be >= 1, got {threshold_count}")
    if capacity is None:
        if n is None:
            n = df.count()
        capacity = max(64, math.ceil(2.0 * n / threshold_count))
    elif n is not None and int(capacity) + 1 <= 2.0 * n / threshold_count:
        raise ValueError(
            f"capacity={capacity} voids the Misra-Gries exactness guarantee for "
            f"n={n}, threshold={threshold_count}: need capacity + 1 > 2n/threshold "
            f"= {2.0 * n / threshold_count:.1f}; raise capacity or lower n"
        )
    cap = int(capacity)
    vals = df.select(F.col(col).alias("value")).where(F.col(col).isNotNull())
    out_type = vals.schema["value"].dataType.simpleString()

    def mg(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counters = None  # pd.Series: value -> (possibly decremented) count
        for pdf in batches:
            # dropna=False: Spark's exact GROUP BY groups NaN as a
            # value, and the pandas default would silently drop it —
            # a NaN heavy hitter could then never become a candidate,
            # a false negative the Misra-Gries guarantee forbids
            # (NULLs are already filtered Spark-side, symmetric with
            # the exact definition)
            vc = pdf["value"].value_counts(dropna=False)
            counters = vc if counters is None else counters.add(vc, fill_value=0)
            if len(counters) > cap:
                delta = counters.nlargest(cap + 1).iloc[-1]
                counters = counters - delta
                counters = counters[counters > 0]
        if counters is not None and len(counters):
            yield pd.DataFrame({"value": counters.index})

    candidates = vals.mapInPandas(mg, schema=f"value {out_type}").distinct()
    return (
        vals.join(F.broadcast(candidates), "value")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= int(threshold_count))
        .withColumnRenamed("value", col)
    )


def _cms_bucket(col: str, depth_col, width: int):
    """Seeded bucket id: each depth row d hashes ``md5(d || ':' || v)``
    (first 15 hex digits as a 60-bit non-negative bigint, mod width) so
    the d rows are pairwise-independent-ish — the classic CMS
    construction with an md5-derived hash family.  md5 (vs the old
    xxhash64) makes the whole sketch ENGINE-PORTABLE: DuckDB replays a
    cell as ``('0x' || substr(md5(d || ':' || v), 1, 15))::BIGINT %
    width``, which is what upgraded cms_frequency_rollup from
    rows-only to a full oracle in round 11.  The value participates
    via its canonical string form — bucket identity must not depend on
    an engine's integer byte layout.

    Fast path: when ``width`` divides a power of 16 (any power-of-two
    width does, since 2^k | 16^ceil(k/4)), the mod only depends on the
    LAST hex digits of the 15-digit prefix — x mod width =
    (x mod 16^j) mod width where 16^j is the smallest power of 16 the
    width divides — so only those j trailing digits are parsed.  The
    bucket VALUE is bit-identical to the full 15-digit parse (same
    number, fewer parsed digits); the oracle keeps replaying the
    documented 15-digit form."""
    h = F.md5(
        F.concat_ws(":", depth_col.cast("string"), F.col(col).cast("string"))
    )
    digits = 15
    for j in range(1, 15):
        if (16**j) % width == 0:
            digits = j
            break
    return F.pmod(
        F.conv(F.substring(h, 1 + (15 - digits), digits), 16, 10).cast("bigint"),
        F.lit(width),
    )


def cms_build(
    df: DataFrame,
    col: str,
    group_cols: Sequence[str] = (),
    depth: int = 5,
    width: int = 2048,
) -> DataFrame:
    """Build a Count-Min sketch of ``col``'s value frequencies as
    DataFrame rows ``(*group_cols, depth, bucket, cnt)`` — one sketch
    per group (e.g. per day).  One exploded projection then one
    groupBy whose key space is bounded by ``|groups| x depth x width``
    cells — partial aggregation collapses each task's contribution to
    at most that many rows before the exchange, regardless of input
    row count or column cardinality."""
    gcols = list(group_cols)
    # Pre-aggregate (group, value) -> count FIRST so the md5 hash family
    # runs once per DISTINCT value per depth, not once per raw row per
    # depth — md5 is ~5x the cost of xxhash64 and the depth-explode
    # multiplies it; hashing the distinct-value table keeps the oracle's
    # bucket function bit-identical (same (d, v) inputs) while cutting
    # the hash work from depth x |rows| to depth x |distinct values|.
    per_value = (
        df.where(F.col(col).isNotNull())
        .groupBy(*gcols, col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rows = per_value.select(
        *gcols,
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("depth"),
        F.col(col),
        "cnt",
    )
    return (
        rows.select(
            *gcols,
            "depth",
            _cms_bucket(col, F.col("depth"), width).alias("bucket"),
            "cnt",
        )
        .groupBy(*gcols, "depth", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_merge(sketch: DataFrame, drop_cols: Sequence[str] = ()) -> DataFrame:
    """Merge per-group sketches by summing matching cells — dropping
    ``drop_cols`` from the grouping coarsens the rollup (per-day ->
    global), the same re-aggregation contract as ``hll_union_agg``.
    Input and output are both bounded by the cell grid, so rollups
    never rescan raw data."""
    keep = [c for c in sketch.columns if c not in ("cnt", *drop_cols)]
    return sketch.groupBy(*keep).agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 5,
    width: int = 2048,
) -> DataFrame:
    """Estimated frequency of each value in ``items[col]``: probe every
    depth row's bucket and take the MIN across depths — the Count-Min
    estimate, which can only OVER-count (collisions add, never
    subtract).  ``depth``/``width`` MUST match the build's (they define
    the hash family; the sketch rows don't carry them).  The probe side
    explodes to ``|items| x depth`` rows and joins the bounded cell
    grid; missing cells count 0.

    The sketch must be fully merged — exactly ``(depth, bucket, cnt)``
    columns.  A still-grouped sketch (extra group columns) would fan
    the probe join out across groups and take MIN over per-group
    cells, UNDER-counting the global frequency and violating the
    over-count-only guarantee, so it is rejected."""
    extra = [c for c in sketch.columns if c not in ("depth", "bucket", "cnt")]
    if extra or set(sketch.columns) != {"depth", "bucket", "cnt"}:
        raise ValueError(
            f"cms_estimate needs a fully merged sketch with columns exactly "
            f"(depth, bucket, cnt); got {sketch.columns} — call "
            f"cms_merge(sketch, drop_cols={extra}) first"
        )
    probes = (
        items.select(F.col(col))
        # NULL probes mirror the build side's isNotNull filter: the
        # sketch never counted NULLs, and concat_ws DROPS a null input,
        # so a NULL probe would hash to a depth-only bucket and return
        # pure collision mass as a confident-looking estimate
        .where(F.col(col).isNotNull())
        .distinct()
        .select(
            col,
            F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("depth"),
        )
        .withColumn("bucket", _cms_bucket(col, F.col("depth"), width))
    )
    joined = probes.join(
        sketch.select("depth", "bucket", "cnt"), ["depth", "bucket"], "left"
    ).fillna({"cnt": 0})
    return joined.groupBy(col).agg(F.min("cnt").alias("est_count"))
