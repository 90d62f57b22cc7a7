"""Bloom-filter join pruning (operators/bloom.py): correctness of the
probe (no false negatives), exactness of the composed semi join, and
the broadcast plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_tiki_webscraping_spark.operators.bloom import (
    bloom_build,
    bloom_probe,
    bloom_pruned_semi_join,
)


def test_bloom_semi_join_equals_exact_semi_join(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    got = bloom_pruned_semi_join(orders, cust, "o_custkey", "c_custkey")
    want = orders.join(
        cust.select("c_custkey").distinct(),
        orders.o_custkey == cust.c_custkey,
        "left_semi",
    )
    assert sorted(r.o_orderkey for r in got.collect()) == sorted(
        r.o_orderkey for r in want.collect()
    )


def test_bloom_probe_has_no_false_negatives_and_prunes(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    keys = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_custkey") % 17 == 0)
        .select("c_custkey")
        .distinct()
    )
    bloom = bloom_build(keys, "c_custkey")
    passed = {r.o_custkey for r in bloom_probe(orders, "o_custkey", bloom).collect()}
    true_keys = {r.c_custkey for r in keys.collect()}
    order_keys = {r.o_custkey for r in orders.collect()}
    # every true match survives the probe
    assert (order_keys & true_keys) <= passed
    # and the probe actually prunes (bitmap is generously sized here)
    assert len(passed) < len(order_keys)


def test_bloom_undersized_bitmap_still_exact_via_closing_join(spark):
    """A deliberately tiny bitmap (high fpp) lets false positives
    through the probe, but the composed semi join stays exact."""
    probe = spark.range(0, 2000).select(F.col("id").alias("k"))
    build = spark.range(0, 2000, 7).select(F.col("id").alias("bk"))
    pruned = bloom_pruned_semi_join(probe, build, "k", "bk", num_bits=256, num_hashes=2)
    assert sorted(r.k for r in pruned.collect()) == list(range(0, 2000, 7))
    # the tiny bitmap really does admit false positives at the probe stage
    keys = build.select("bk").distinct()
    bloom = bloom_build(keys, "bk", num_bits=256, num_hashes=2)
    n_pass = bloom_probe(probe, "k", bloom, num_bits=256, num_hashes=2).count()
    assert n_pass > build.count()


def test_bloom_probe_drops_null_keys(spark):
    probe = spark.createDataFrame([(1,), (None,), (2,)], "k int")
    build = spark.createDataFrame([(1,), (2,)], "bk int")
    bloom = bloom_build(build, "bk")
    got = sorted(r.k for r in bloom_probe(probe, "k", bloom).collect())
    assert got == [1, 2]


def test_bloom_probe_plan_is_broadcast_no_probe_shuffle(spark, sf_dir):
    """The bitmap arrives by broadcast and the bit tests sit in the probe
    table's scan stage: no hash exchange of the probe side exists in the
    probe sub-plan (the whole point — rows die before serialization)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    keys = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey")
        .distinct()
    )
    bloom = bloom_build(keys, "c_custkey")
    plan = bloom_probe(orders, "o_custkey", bloom)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "shiftleft" in plan
    # only the one-row bitmap is exchanged; the orders side never hash-shuffles
    assert "hashpartitioning(o_custkey" not in plan


# --- file-level Bloom index on snapshot tables ----------------------------


def _indexed_table(spark, tmp_path, n=8000):
    from etl_tiki_webscraping_spark.sinks.upsert import (
        build_bloom_index,
        compact_table,
        upsert_parquet,
    )

    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 37 % 100).alias("grp"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"),
    )
    path = str(tmp_path / "tbl")
    upsert_parquet(spark, df, path, ["k"])
    compact_table(spark, path, target_file_bytes=10 * 1024, sort_by=["grp"])
    build_bloom_index(spark, path, ["k", "name"])
    return path


def test_bloom_index_skips_files_and_stays_exact(spark, tmp_path):
    from etl_tiki_webscraping_spark.sinks.upsert import read_parquet_table

    path = _indexed_table(spark, tmp_path)
    full = read_parquet_table(spark, path)
    total = len(full.inputFiles())
    assert total > 2
    hit = read_parquet_table(spark, path, eq_filter=("k", [7, 1234, 3999]))
    assert len(hit.inputFiles()) < total
    got = sorted(r.k for r in hit.collect())
    assert got == [7, 1234, 3999]
    # grp-clustering scatters k, so min/max barely skips; the bloom
    # index must skip STRICTLY more files than range stats can
    stats_only = read_parquet_table(spark, path, range_filter=("k", 7, 7))
    single = read_parquet_table(spark, path, eq_filter=("k", 7))
    assert len(single.inputFiles()) < len(stats_only.inputFiles())


def test_bloom_index_string_column_and_absent_key(spark, tmp_path):
    from etl_tiki_webscraping_spark.sinks.upsert import read_parquet_table

    path = _indexed_table(spark, tmp_path)
    hit = read_parquet_table(spark, path, eq_filter=("name", "name-77"))
    assert [r.k for r in hit.collect()] == [77]
    missing = read_parquet_table(spark, path, eq_filter=("k", 10_000_000))
    assert missing.count() == 0


def test_unindexed_snapshot_falls_back_conservatively(spark, tmp_path):
    from etl_tiki_webscraping_spark.sinks.upsert import (
        read_parquet_table,
        upsert_parquet,
    )

    path = _indexed_table(spark, tmp_path)
    extra = spark.createDataFrame(
        [(99_999, 1, "name-99999")], "k long, grp long, name string"
    )
    upsert_parquet(spark, extra, path, ["k"])  # new snapshot, no index
    hit = read_parquet_table(spark, path, eq_filter=("k", [77, 99_999]))
    got = sorted(r.k for r in hit.collect())
    assert got == [77, 99_999]


def test_eq_and_range_filters_are_mutually_exclusive(spark, tmp_path):
    import pytest

    from etl_tiki_webscraping_spark.sinks.upsert import read_parquet_table

    path = _indexed_table(spark, tmp_path, n=100)
    with pytest.raises(ValueError):
        read_parquet_table(
            spark, path, eq_filter=("k", 1), range_filter=("k", 0, 10)
        )
