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

Round 12 VERDICT ask #3 extended the same md5 engine-portability
playbook to the remaining sketch families, upgrading their catalog
queries from rows-only to bit-strict DuckDB oracles:

- :func:`hll_build` / :func:`hll_merge` / :func:`hll_estimate` — a
  PORTABLE HyperLogLog whose register decisions (md5-derived index +
  leading-zero rank via binary-string length) and estimator (exact
  bigint harmonic denominator, one IEEE division, linear-counting
  correction from a precomputed literal table — ln() is not
  bit-reproducible across engines) all replay in ANSI SQL
  (:func:`hll_oracle_sql` generates the replay from the same
  constants).  Spark's built-in DataSketches HLL stays exercised in
  tests as the accuracy cross-check.

- :func:`quantile_sample_build` / :func:`quantile_sample_merge` /
  :func:`quantile_sample_quantiles` — a mergeable quantile summary as
  a DETERMINISTIC md5-Bernoulli row sample (row-intrinsic retain
  predicate, so per-batch samples union into exactly the global
  sample); quantiles are integer-rank lookups under a total order.
  The engine-portable stand-in for KLL, whose randomized compaction
  no external engine can replay.

- :func:`theta_sketch` / :func:`theta_set_estimates` — a KMV/theta
  sketch (k+1 smallest distinct 60-bit md5 hashes; set ops evaluate
  at the min of the two theta boundaries) giving union / intersection
  / difference estimates HLL cannot express, with every retained hash
  and both theta decisions SQL-replayable.
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


# --------------------------------------------------------------------------
# Portable HyperLogLog (md5 hash family — every register decision and the
# whole estimator replay in ANSI SQL; the round-11 CMS md5 playbook applied
# to distinct counting, round-12 VERDICT ask #3)
# --------------------------------------------------------------------------

#: rho window width: bits 17..40 of the md5 (hex digits 5..10).  W + 1 is
#: the register ceiling, so registers fit in a byte and the scaled
#: harmonic-mean denominator sum(2^(W+1 - rho)) is an EXACT bigint.
HLL_W = 24


def hll_alpha(m: int) -> float:
    """The standard HLL bias-correction constant (Flajolet et al. 2007)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_linear_counting_table(lg_k: int) -> list[float]:
    """``table[v - 1] = m * ln(m / v)`` for ``v`` in 1..m — the linear-
    counting estimates as PRECOMPUTED double literals.  ln() is NOT
    bit-reproducible between the JVM and other engines (measured: 18 of
    256 inputs differ in the last ulp for m=256), so the correction is
    a lookup whose values are embedded as the SAME literals in the
    Spark plan and the DuckDB oracle — the minhash a/b-constants
    pattern, making the whole estimator engine-portable."""
    m = 1 << lg_k
    return [m * math.log(m / v) for v in range(1, m + 1)]


def _hll_register_cols(col: str, lg_k: int, salt: str):
    """(idx, rho) expressions: idx = first 4 md5 hex digits mod m,
    rho = 1 + leading zeros of the next 6 hex digits' 24-bit window
    (via binary-string length — no float log2, identical on any engine:
    ``25 - length(conv(hex, 16, 2))``, with the all-zero window pinned
    to W + 1 = 25)."""
    m = 1 << lg_k
    h = F.md5(F.concat(F.lit(salt), F.col(col).cast("string")))
    idx = F.pmod(F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint"), F.lit(m))
    win = F.substring(h, 5, 6)
    rho = F.when(
        win == F.lit("000000"), F.lit(HLL_W + 1)
    ).otherwise(F.lit(HLL_W + 1) - F.length(F.conv(win, 16, 2)))
    return idx, rho


def hll_build(
    df: DataFrame,
    col: str,
    group_cols: Sequence[str] = (),
    lg_k: int = 8,
    salt: str = "hll:",
) -> DataFrame:
    """Build one HLL register table per group as DataFrame rows
    ``(*group_cols, idx, rho)`` — at most ``m = 2^lg_k`` rows per group
    regardless of input volume (empty registers are implicit).  The
    value is hashed through md5 of its canonical string form (CMS
    convention), so DuckDB replays every register decision.  NULLs are
    not counted (COUNT DISTINCT semantics).  Distinct values are
    pre-aggregated first so the md5 family runs once per distinct
    value, and the register groupBy's key space is bounded by
    ``|groups| x m`` — partial aggregation collapses each task's
    contribution before the exchange."""
    gcols = list(group_cols)
    vals = (
        df.where(F.col(col).isNotNull()).select(*gcols, col).distinct()
    )
    idx, rho = _hll_register_cols(col, lg_k, salt)
    return (
        vals.select(*gcols, idx.alias("idx"), rho.alias("rho"))
        .groupBy(*gcols, "idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(sketch: DataFrame, drop_cols: Sequence[str] = ()) -> DataFrame:
    """Merge per-group register tables by MAX per register — dropping
    ``drop_cols`` coarsens the rollup (per-day -> global), the same
    re-aggregation contract as ``cms_merge``.  max is associative and
    register assignment is group-independent, so build-then-merge is
    IDENTICAL to a direct build at the coarser grain (the property the
    catalog oracle exploits)."""
    keep = [c for c in sketch.columns if c not in ("rho", *drop_cols)]
    return sketch.groupBy(*keep).agg(F.max("rho").alias("rho"))


def hll_estimate(
    sketch: DataFrame,
    group_cols: Sequence[str] = (),
    lg_k: int = 8,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Distinct-count estimate per group from a merged register table —
    the standard HLL estimator, arranged so every arithmetic step is
    engine-portable:

    - the harmonic-mean denominator is the EXACT bigint
      ``sum(2^(W+1 - rho))`` over non-empty registers plus
      ``2^(W+1)`` per empty register (no float pow);
    - the raw estimate is ONE IEEE division of a Python-precomputed
      double literal (``alpha * m^2 * 2^(W+1)``) by that bigint —
      correctly rounded, hence bit-identical on any engine;
    - the small-range (linear counting) branch, taken when
      ``E_raw <= 2.5m`` and empty registers exist, reads its value from
      the precomputed literal table (:func:`hll_linear_counting_table`)
      instead of computing ``m * ln(m/V)`` at query time.

    The sketch must be fully merged: exactly ``(*group_cols, idx,
    rho)`` columns (the cms_estimate guard contract)."""
    gcols = list(group_cols)
    if set(sketch.columns) != {*gcols, "idx", "rho"}:
        raise ValueError(
            f"hll_estimate needs a merged sketch with columns exactly "
            f"({', '.join([*gcols, 'idx', 'rho'])}); got {sketch.columns} — "
            f"call hll_merge first"
        )
    m = 1 << lg_k
    scale = 1 << (HLL_W + 1)
    numer = hll_alpha(m) * m * m * float(scale)
    lc = hll_linear_counting_table(lg_k)
    agg = sketch.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("__nz"),
        # the Python F.shiftleft only takes a literal bit count; the SQL
        # form takes an expression — same JVM ShiftLeft either way
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), cast({HLL_W + 1} - rho as int))")
        ).alias("__s"),
    )
    v = F.lit(m) - F.col("__nz")  # empty registers
    denom = (F.col("__s") + v * F.lit(scale)).cast("double")
    e_raw = F.lit(numer) / denom
    lc_est = F.element_at(
        F.array(*[F.lit(x) for x in lc]), F.greatest(v, F.lit(1)).cast("int")
    )
    est = F.when((e_raw <= F.lit(2.5 * m)) & (v > 0), lc_est).otherwise(e_raw)
    return agg.select(*gcols, est.alias(out_col))


def hll_oracle_sql(
    src_select: str,
    col: str,
    group_cols: Sequence[str],
    lg_k: int = 8,
    salt: str = "hll:",
    out_col: str = "approx_distinct",
) -> str:
    """The DuckDB replay of build -> merge -> estimate as a WITH body
    fragment (``src_select`` provides relation ``(group_cols..., col)``)
    — generated from the SAME constants as the Spark plan so the two
    cannot drift (the language_id generated-oracle pattern)."""
    m = 1 << lg_k
    scale = 1 << (HLL_W + 1)
    numer = hll_alpha(m) * m * m * float(scale)
    # the e0 suffix forces DOUBLE literal inference: a bare decimal
    # literal in a VALUES table is unified to one DECIMAL type across
    # ALL rows, and at lg_k >= 11 the shared scale rounds the 17th
    # significant digit of some entries (measured: one-ulp oracle
    # drift at m=2048) — scientific notation parses as DOUBLE per
    # literal, bit-exact by repr round-trip
    lc_values = ", ".join(
        f"({v}, {x!r}e0)" for v, x in enumerate(hll_linear_counting_table(lg_k), 1)
    )
    g = ", ".join(group_cols)
    return f"""
    hll_vals AS (
        SELECT DISTINCT {g}, {col} FROM ({src_select})
        WHERE {col} IS NOT NULL
    ),
    hll_reg AS (
        SELECT {g},
               CAST(('0x' || substr(md5('{salt}' || {col}), 1, 4)) AS BIGINT)
                   % {m} AS idx,
               substr(md5('{salt}' || {col}), 5, 6) AS win
        FROM hll_vals
    ),
    hll_regmax AS (
        SELECT {g}, idx,
               MAX(CASE WHEN win = '000000' THEN {HLL_W + 1}
                        ELSE {HLL_W + 1} - length(bin(CAST(('0x' || win)
                                                           AS BIGINT)))
                   END) AS rho
        FROM hll_reg GROUP BY ALL
    ),
    hll_agg AS (
        SELECT {g}, COUNT(*) AS nz,
               SUM(CAST(1 AS BIGINT) << ({HLL_W + 1} - rho)) AS s
        FROM hll_regmax GROUP BY ALL
    ),
    hll_lc(v, lc_est) AS (VALUES {lc_values}),
    hll_est AS (
        SELECT {g}, {m} - nz AS v,
               {numer!r} / CAST(s + ({m} - nz) * {scale} AS DOUBLE) AS e_raw
        FROM hll_agg
    )
    SELECT {g},
           CASE WHEN e_raw <= {2.5 * m!r} AND v > 0
                THEN (SELECT lc_est FROM hll_lc WHERE hll_lc.v = hll_est.v)
                ELSE e_raw END AS {out_col}
    FROM hll_est
    """


# --------------------------------------------------------------------------
# Portable deterministic quantile sample (mergeable quantile summary whose
# every decision replays in ANSI SQL — round-12 VERDICT ask #3)
# --------------------------------------------------------------------------

def quantile_sample_build(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_cols: Sequence[str] = (),
    sample_shift: int = 3,
    salt: str = "q:",
) -> DataFrame:
    """Mergeable quantile summary as a DETERMINISTIC md5-Bernoulli row
    sample: keep rows whose 60-bit md5 hash of ``salt || id`` falls
    below ``2^(60 - sample_shift)`` (rate 2^-shift).  The predicate is
    row-intrinsic, so the union of per-batch/per-day samples IS the
    global sample — the mergeability KLL provides, with every retained
    row replayable by an external engine (KLL's randomized compaction
    is not).  Expected size n * 2^-shift; rank error ~sqrt(q(1-q)/
    sample_n) — tolerance-gated in tests.  NULL values are excluded
    (NULL sort order differs across engines, and quantiles of NULL are
    undefined anyway)."""
    gcols = list(group_cols)
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    return (
        df.where(F.col(value_col).isNotNull() & F.col(id_col).isNotNull())
        .where(hv < F.lit(1 << (60 - sample_shift)))
        .select(*gcols, value_col, id_col)
    )


def quantile_sample_merge(
    sample: DataFrame, drop_cols: Sequence[str] = ()
) -> DataFrame:
    """Coarsen a grouped sample by dropping group columns — because the
    retain predicate is row-intrinsic, this is EXACTLY the sample that
    a direct build at the coarser grain would produce (no re-sampling,
    no accuracy loss; the property the catalog oracle exploits)."""
    keep = [c for c in sample.columns if c not in drop_cols]
    return sample.select(*keep)


def quantile_sample_quantiles(
    sample: DataFrame,
    value_col: str,
    id_col: str,
    probs: "dict[str, float]",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Quantile estimates per group from a sample: the value at rank
    ``max(ceil(p * n), 1)`` under the TOTAL order (value, id) — the id
    tie-break makes the rank deterministic, and ceil of one correctly
    rounded double product is engine-portable.  The window shuffles
    ONLY sample rows (2^-shift of the data); at a scale where even the
    sample overflows one partition per group, raise ``sample_shift``."""
    from pyspark.sql import Window

    gcols = list(group_cols)
    w = Window.partitionBy(*gcols)
    ranked = sample.select(
        *gcols,
        F.col(value_col),
        F.row_number()
        .over(w.orderBy(F.col(value_col), F.col(id_col)))
        .alias("__rnk"),
        F.count(F.lit(1)).over(w).alias("__n"),
    )
    aggs = [
        F.max(
            F.when(
                F.col("__rnk")
                == F.greatest(
                    F.ceil(F.lit(p) * F.col("__n")), F.lit(1).cast("bigint")
                ),
                F.col(value_col),
            )
        ).alias(name)
        for name, p in probs.items()
    ]
    return ranked.groupBy(*gcols).agg(*aggs)


# --------------------------------------------------------------------------
# Portable theta/KMV sketch (distinct-set algebra whose every decision
# replays in ANSI SQL — round-12 VERDICT ask #3)
# --------------------------------------------------------------------------

THETA_MAX = 1 << 60  # the md5-60-bit hash space; theta for exact sketches


def theta_sketch(
    df: DataFrame, col: str, k: int = 64, salt: str = "t:"
) -> DataFrame:
    """KMV/theta sketch of ``col``'s distinct values: the ``k + 1``
    smallest distinct 60-bit md5 hashes, as rows ``(hv)``.  The
    (k+1)-th smallest is the theta boundary (retained sample = hashes
    strictly below it); when fewer than k + 1 distinct values exist the
    sketch is EXACT with theta = 2^60.  orderBy().limit() plans as
    TakeOrderedAndProject — per-partition top-(k+1) then a k-sized
    merge, never a global sort — so the build is scan + one bounded
    reduction at any scale."""
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    return (
        df.where(F.col(col).isNotNull())
        .select(hv.alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k + 1)
    )


def theta_set_estimates(
    sk_a: DataFrame,
    sk_b: DataFrame,
    k: int = 64,
    names: Sequence[str] = ("n_a", "n_b", "n_union", "n_intersect", "n_a_only"),
) -> DataFrame:
    """|A|, |B|, |A∪B|, |A∩B|, |A\\B| estimates from two theta sketches
    (one row, doubles).  theta_x = the (k+1)-th min when the sketch
    overflowed, else 2^60 (exact); set ops evaluate at theta_u =
    min(theta_a, theta_b) — every sketch retains ALL hashes below its
    own theta >= theta_u, so membership below theta_u is exact.  Each
    estimate is ``cnt * 2^60 / theta`` computed as two correctly
    rounded IEEE ops on exactly-representable operands — bit-identical
    on any engine.  Inputs are <= k+1 rows each; everything broadcasts."""
    na, nb, nu, ni, nd = names

    def theta_of(sk: DataFrame, alias: str) -> DataFrame:
        return sk.agg(
            F.count(F.lit(1)).alias("__c"), F.max("hv").alias("__m")
        ).select(
            F.when(F.col("__c") == k + 1, F.col("__m"))
            .otherwise(F.lit(THETA_MAX))
            .alias(alias)
        )

    thetas = (
        theta_of(sk_a, "theta_a")
        .crossJoin(theta_of(sk_b, "theta_b"))
        .withColumn("theta_u", F.least("theta_a", "theta_b"))
    )
    marked = (
        sk_a.select("hv", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            sk_b.select("hv", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
        )
        .groupBy("hv")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
        .crossJoin(F.broadcast(thetas))
    )

    def cnt(cond) -> F.Column:
        return F.coalesce(
            F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))), F.lit(0)
        )

    hv, ia, ib = F.col("hv"), F.col("in_a") == 1, F.col("in_b") == 1
    th_a, th_b, th_u = F.col("theta_a"), F.col("theta_b"), F.col("theta_u")
    agg = marked.groupBy("theta_a", "theta_b", "theta_u").agg(
        cnt(ia & (hv < th_a)).alias("ca"),
        cnt(ib & (hv < th_b)).alias("cb"),
        cnt(hv < th_u).alias("cu"),
        cnt(ia & ib & (hv < th_u)).alias("ci"),
        cnt(ia & ~ib & (hv < th_u)).alias("cd"),
    )

    def est(c: str, theta: str) -> F.Column:
        return (F.col(c).cast("double") * F.lit(float(THETA_MAX))) / F.col(
            theta
        ).cast("double")

    return agg.select(
        est("ca", "theta_a").alias(na),
        est("cb", "theta_b").alias(nb),
        est("cu", "theta_u").alias(nu),
        est("ci", "theta_u").alias(ni),
        est("cd", "theta_u").alias(nd),
    )
