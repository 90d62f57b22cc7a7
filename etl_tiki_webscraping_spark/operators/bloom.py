"""Bloom-filter join pruning: shrink a huge probe side BEFORE its
shuffle with a compact bitmap built from the build side's keys.

The reference's only join is an application-side semi-join filter
(`/root/reference/dags/etl.py:250-251` — an ``isin`` over a key set
collected into driver memory).  That shape dies twice at 100 TB: the
key set no longer fits on the driver, and the probe side shuffles in
full even though most rows will not survive the join.  The fix every
warehouse engine ships (Spark's runtime row-level filtering /
``spark.sql.optimizer.runtime.bloomFilter``, ORC/Iceberg bloom
indexes) is to ship a fixed-size Bloom filter instead of the keys:

- build: one pass over the build side's keys — k positions per key via
  seeded ``xxhash64``, OR-folded into a ``num_bits``-wide bitmap held
  as ``num_bits/64`` longs.  The partial aggregation is map-side
  (bit_or is commutative), so the exchange carries one bitmap per
  partition, not the keys.
- probe: the bitmap (16 KiB at the default 2^17 bits) is broadcast and
  each probe row tests its k bits — pure codegen'd JVM expressions
  (hash, shift, AND), zero UDFs, zero extra shuffles.  False positives
  pass (bounded by ``fpp ≈ (1 - e^{-k·n/m})^k``), false negatives
  cannot happen, so a downstream EXACT join keeps full correctness
  while its shuffle input is already pruned.

Everything here is DataFrame-native; the whole probe filter inlines
into the scan stage, which is precisely where you want it on a
1000-executor cluster: rows die before they are ever serialized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_BITS = 1 << 17  # 16 KiB bitmap — broadcast-trivial
DEFAULT_NUM_HASHES = 5

_BLOOM_COL = "__bloom_words"


def _positions(col: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k bit positions for a key: pmod of independently-seeded xxhash64
    (the seed is an extra hashed column, giving k independent hash
    functions from one primitive)."""
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(num_bits)).cast("int")
        for i in range(num_hashes)
    ]


def bloom_build(
    keys: DataFrame,
    col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Aggregate the build side's ``col`` into a one-row DataFrame
    holding the bitmap as ``array<bigint>`` (length ``num_bits/64``).

    Distributed end to end: set-bit masks partial-aggregate map-side
    (``bit_or``), the word map collapses to one row, and the dense
    array materializes in a single projection — the driver never holds
    the key set.  Size for ~1% false positives with
    ``num_bits ≈ 10 × n_keys`` at the default k=5.
    """
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    nwords = num_bits // 64
    positions = keys.select(
        F.explode(F.array(*_positions(F.col(col), num_bits, num_hashes))).alias("pos")
    )
    words = positions.select(
        (F.col("pos") / 64).cast("int").alias("w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
    )
    word_map = (
        words.groupBy("w")
        .agg(F.bit_or("mask").alias("bits"))
        .agg(F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("wm"))
    )
    return word_map.select(
        F.transform(
            F.sequence(F.lit(0), F.lit(nwords - 1)),
            lambda i: F.coalesce(F.element_at(F.col("wm"), i), F.lit(0).cast("bigint")),
        ).alias(_BLOOM_COL)
    )


def bloom_probe(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Keep only rows whose ``col`` *might* be in the filter.

    The one-row bitmap joins in via a broadcast (single-row nested-loop
    — effectively a broadcast variable the optimizer can see through),
    and the k bit tests are codegen'd into the scan stage.  Guarantee:
    every true match survives; non-matches survive with probability
    ~fpp.  NULL keys are dropped (a NULL never equi-joins, matching
    left-semi semantics).
    """
    pos_names = [f"__bloom_pos{i}" for i in range(num_hashes)]
    probed = df.join(F.broadcast(bloom))
    for name, pos in zip(pos_names, _positions(F.col(col), num_bits, num_hashes)):
        probed = probed.withColumn(name, pos)
    cond = F.col(col).isNotNull()
    for name in pos_names:
        word = F.element_at(F.col(_BLOOM_COL), (F.col(name) / 64).cast("int") + 1)
        mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({name} % 64 AS INT))")
        cond = cond & (word.bitwiseAND(mask) != 0)
    return probed.filter(cond).drop(_BLOOM_COL, *pos_names)


def bloom_pruned_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_col: str,
    build_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """EXACT left-semi join whose probe-side shuffle reads only rows
    that pass the Bloom pre-filter.

    Composition, not approximation: bloom_probe admits false positives,
    and the closing semi join eliminates them — the result is
    bit-identical to ``probe ⋉ build`` while the expensive exchange
    moves ~``sel + fpp`` of the probe side instead of all of it.  This
    is the manual form of Spark's runtime bloom-filter rewrite, exposed
    as an operator so a pipeline can build the filter ONCE and reuse it
    across several probe tables (e.g. one customer-key filter pruning
    orders, returns, and clickstream scans in the same job).
    """
    keys = build.select(build_col).where(F.col(build_col).isNotNull()).distinct()
    bloom = bloom_build(keys, build_col, num_bits, num_hashes)
    pruned = bloom_probe(probe, probe_col, bloom, num_bits, num_hashes)
    cond = pruned[probe_col] == build[build_col]
    return pruned.join(build.select(build_col).distinct(), on=cond, how="left_semi")
