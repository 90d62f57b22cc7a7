"""Frequency/quantile sketch operators (operators/sketches.py,
catalog kll_quantile_rollup): exactness of the Misra-Gries + exact-
close heavy hitters, the Count-Min over-count-only + error-bound
guarantees and merge identity, and KLL rank-tolerance vs exact
percentiles."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_tiki_webscraping_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_merge,
    heavy_hitters,
)


def _skewed_df(spark, n_hot=8, hot_count=500, n_cold=5000, cold_count=3):
    """A few hot values over a wide cold tail — distinct count far above
    any reasonable candidate capacity, so MG pruning really prunes."""
    rows = []
    for h in range(n_hot):
        rows += [(f"hot-{h}",)] * hot_count
    for c in range(n_cold):
        rows += [(f"cold-{c}",)] * cold_count
    return spark.createDataFrame(rows, "v string").repartition(8)


class TestHeavyHitters:
    def test_matches_exact_group_by_under_real_pruning(self, spark):
        df = _skewed_df(spark)
        n = df.count()  # 19000
        threshold = 400
        # capacity 2n/threshold = 95 << 5008 distinct values: the MG
        # pass cannot hold the cold tail, yet hot values must all survive
        got = sorted(
            tuple(r) for r in heavy_hitters(df, "v", threshold).collect()
        )
        exact = sorted(
            tuple(r)
            for r in df.groupBy("v")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") >= threshold)
            .collect()
        )
        assert got == exact and len(got) == 8

    def test_explicit_capacity_and_int_column(self, spark):
        df = spark.createDataFrame(
            [(i % 7,) for i in range(700)] + [(99,)] * 300, "v int"
        ).repartition(4)
        got = sorted(
            tuple(r)
            for r in heavy_hitters(df, "v", 100, capacity=512).collect()
        )
        exact = [(i, 100) for i in range(7)] + [(99, 300)]
        assert got == sorted(exact)

    def test_nulls_not_counted_and_bad_threshold(self, spark):
        df = spark.createDataFrame([(None,)] * 50 + [("a",)] * 5, "v string")
        assert heavy_hitters(df, "v", 5).collect()[0]["v"] == "a"
        with pytest.raises(ValueError):
            heavy_hitters(df, "v", 0)


class TestCountMin:
    DEPTH, WIDTH = 5, 256

    def test_merged_rollup_equals_oneshot_build(self, spark):
        df = spark.createDataFrame(
            [(f"d{i % 3}", f"u{i % 37}") for i in range(600)], "day string, u string"
        )
        daily = cms_build(df, "u", group_cols=["day"], depth=self.DEPTH, width=self.WIDTH)
        merged = cms_merge(daily, drop_cols=["day"])
        oneshot = cms_build(df, "u", depth=self.DEPTH, width=self.WIDTH)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, oneshot.collect())
        )

    def test_estimates_overcount_only_within_eps_bound(self, spark):
        df = spark.createDataFrame(
            [(f"u{i % 100}",) for i in range(5000)], "u string"
        )
        sk = cms_build(df, "u", depth=self.DEPTH, width=self.WIDTH)
        items = df.distinct()
        est = {
            r["u"]: r["est_count"]
            for r in cms_estimate(sk, items, "u", depth=self.DEPTH, width=self.WIDTH).collect()
        }
        true = {r["u"]: r["cnt"] for r in df.groupBy("u").agg(F.count(F.lit(1)).alias("cnt")).collect()}
        n = 5000
        eps_bound = math.e / self.WIDTH * n  # classic CMS additive bound
        assert set(est) == set(true)
        for u, t in true.items():
            assert est[u] >= t, f"{u}: CMS must never under-count"
            assert est[u] <= t + eps_bound, f"{u}: overshoot beyond eps bound"

    def test_absent_item_estimates_bounded(self, spark):
        df = spark.createDataFrame([(f"u{i}",) for i in range(200)], "u string")
        sk = cms_build(df, "u", depth=self.DEPTH, width=self.WIDTH)
        ghost = spark.createDataFrame([("nope",)], "u string")
        est = cms_estimate(sk, ghost, "u", depth=self.DEPTH, width=self.WIDTH).collect()
        assert est[0]["est_count"] >= 0
        assert est[0]["est_count"] <= math.e / self.WIDTH * 200 + 1


class TestThetaSetOps:
    def test_estimates_within_tolerance_of_exact(self, spark, sf_dir):
        from etl_tiki_webscraping_spark.io import load_table
        from etl_tiki_webscraping_spark.plans.catalog import QUERIES

        est = QUERIES["theta_sketch_set_ops"].fn(spark, sf_dir).collect()[0]
        ev = load_table(spark, sf_dir, "events")
        view = {r["user_id"] for r in ev.filter(F.col("event_type") == "view").select("user_id").distinct().collect()}
        buy = {r["user_id"] for r in ev.filter(F.col("event_type") == "purchase").select("user_id").distinct().collect()}
        exact = {
            "n_view": len(view),
            "n_buy": len(buy),
            "n_union": len(view | buy),
            "n_intersect": len(view & buy),
            "n_view_only": len(view - buy),
        }
        for k, t in exact.items():
            got = est[k]
            # theta default sketches are EXACT below ~4096 retained
            # hashes and <=5% beyond; intersections compound error, so
            # gate at 5% + small absolute slack for tiny true values
            assert abs(got - t) <= max(2.0, 0.05 * t), (k, got, t)


class TestKllRollup:
    def test_rollup_quantiles_within_rank_tolerance(self, spark, sf_dir):
        from etl_tiki_webscraping_spark.plans.catalog import QUERIES

        est = {
            r["event_type"]: r
            for r in QUERIES["kll_quantile_rollup"].fn(spark, sf_dir).collect()
        }
        from etl_tiki_webscraping_spark.io import load_table

        ev = load_table(spark, sf_dir, "events")
        # rank tolerance: KLL k=200 normalized rank error ~1.65%; the
        # estimate at rank q must lie between exact quantiles q -/+ 4%
        for q, name in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            lo_q, hi_q = max(0.0, q - 0.04), min(1.0, q + 0.04)
            bounds = (
                ev.groupBy("event_type")
                .agg(
                    F.expr(f"percentile(value, {lo_q})").alias("lo"),
                    F.expr(f"percentile(value, {hi_q})").alias("hi"),
                )
                .collect()
            )
            for r in bounds:
                got = est[r["event_type"]][name]
                assert r["lo"] <= got <= r["hi"], (
                    f"{r['event_type']} {name}: {got} outside "
                    f"[{r['lo']}, {r['hi']}]"
                )


class TestSketchGuards:
    """ADVICE r7 guards: the sketch APIs reject inputs that would
    silently void their documented guarantees."""

    def test_undersized_explicit_capacity_raises(self, spark):
        df = _skewed_df(spark)
        n = 19000
        # 2n/threshold = 95: capacity 50 would void no-false-negatives
        with pytest.raises(ValueError, match="Misra-Gries"):
            heavy_hitters(df, "v", 400, capacity=50, n=n)
        # right-sized explicit capacity with n: still exact
        got = sorted(
            tuple(r)
            for r in heavy_hitters(df, "v", 400, capacity=96, n=n).collect()
        )
        assert len(got) == 8

    def test_cms_estimate_rejects_grouped_sketch(self, spark):
        df = spark.createDataFrame(
            [("d1", i % 5) for i in range(100)], "day string, u int"
        )
        daily = cms_build(df, "u", group_cols=["day"], depth=3, width=64)
        items = df.select("u").distinct()
        with pytest.raises(ValueError, match="cms_merge"):
            cms_estimate(daily, items, "u", depth=3, width=64)
        # merged sketch goes through and over-counts only
        merged = cms_merge(daily, drop_cols=["day"])
        est = {
            r["u"]: r["est_count"]
            for r in cms_estimate(merged, items, "u", depth=3, width=64).collect()
        }
        assert all(est[u] >= 20 for u in range(5))


class TestThetaEstimationRegime:
    def test_estimator_path_bounded_above_exact_regime(self, spark):
        """VERDICT r7 ask #8: default theta sketches are exact below
        ~4096 retained hashes; this forces TRUE estimation (100k and
        60k distinct keys, overlap 20k) and gates the estimator itself.
        k=4096 gives RSE ~1.6%, so 5% is >3 sigma."""
        a = spark.range(0, 100_000).select(F.col("id").alias("u"))
        b = spark.range(80_000, 140_000).select(F.col("id").alias("u"))
        row = (
            a.agg(F.theta_sketch_agg("u").alias("sa"))
            .crossJoin(b.agg(F.theta_sketch_agg("u").alias("sb")))
            .select(
                F.theta_sketch_estimate(F.col("sa")).alias("n_a"),
                F.theta_sketch_estimate(F.col("sb")).alias("n_b"),
                F.theta_sketch_estimate(
                    F.theta_union(F.col("sa"), F.col("sb"))
                ).alias("n_union"),
                F.theta_sketch_estimate(
                    F.theta_intersection(F.col("sa"), F.col("sb"))
                ).alias("n_intersect"),
            )
            .collect()[0]
        )
        exact = {
            "n_a": 100_000, "n_b": 60_000,
            "n_union": 140_000, "n_intersect": 20_000,
        }
        for k, t in exact.items():
            got = row[k]
            assert got != t or k == "n_intersect", (
                f"{k} returned the exact count at cardinality {t} — "
                "the estimation regime was not reached"
            )
            # intersections compound both sketches' error: wider gate
            tol = 0.10 if k == "n_intersect" else 0.05
            assert abs(got - t) <= tol * t, (k, got, t)
