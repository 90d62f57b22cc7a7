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
        """The catalog query's quantile estimates must sit within the
        sample estimator's own 3-sigma rank guarantee: the p-quantile of
        an n_s-row uniform sample has rank error stdev sqrt(p(1-p)/n_s),
        plus 1/n_s rank granularity.  (The old fixed +-4% gate was sized
        for KLL k=200; the portable md5-Bernoulli sample's width depends
        on the realized per-group sample size, tiny at sf0.001.)"""
        from etl_tiki_webscraping_spark.io import load_table
        from etl_tiki_webscraping_spark.operators.sketches import (
            quantile_sample_build,
        )
        from etl_tiki_webscraping_spark.plans.catalog import QUERIES

        est = {
            r["event_type"]: r
            for r in QUERIES["kll_quantile_rollup"].fn(spark, sf_dir).collect()
        }
        ev = load_table(spark, sf_dir, "events")
        n_s = {
            r["event_type"]: r["n"]
            for r in quantile_sample_build(
                ev, "value", "event_id", group_cols=["event_type"]
            )
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        for q, name in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            for etype, ns in n_s.items():
                tol = 3.0 * math.sqrt(q * (1.0 - q) / ns) + 1.0 / ns
                lo_q, hi_q = max(0.0, q - tol), min(1.0, q + tol)
                r = (
                    ev.filter(F.col("event_type") == etype)
                    .agg(
                        F.expr(f"percentile(value, {lo_q})").alias("lo"),
                        F.expr(f"percentile(value, {hi_q})").alias("hi"),
                    )
                    .collect()[0]
                )
                got = est[etype][name]
                assert r["lo"] <= got <= r["hi"], (
                    f"{etype} {name}: {got} outside [{r['lo']}, {r['hi']}] "
                    f"(n_s={ns}, tol={tol:.3f})"
                )

    def test_sample_quantiles_tight_at_scale(self, spark):
        """Real accuracy pin on a sample big enough to matter: 40k rows
        at rate 1/8 -> ~5k samples, 3-sigma rank tolerance ~2.2% at p50
        — the regime the 100 TB rollup actually runs in.  Values are a
        deterministic permuted ramp so exact quantiles are known."""
        from etl_tiki_webscraping_spark.operators.sketches import (
            quantile_sample_build,
            quantile_sample_quantiles,
        )

        df = spark.range(40_000).select(
            F.col("id").alias("event_id"),
            # value = a pseudo-random permutation of 0..39999
            ((F.col("id") * 48271) % 40_000).cast("double").alias("value"),
        )
        sample = quantile_sample_build(df, "value", "event_id")
        n_s = sample.count()
        assert 3_000 <= n_s <= 7_000  # rate 1/8 of 40k, wide 3-sigma band
        row = quantile_sample_quantiles(
            sample, "value", "event_id", {"p50": 0.5, "p95": 0.95}
        ).collect()[0]
        for q, name in ((0.5, "p50"), (0.95, "p95")):
            tol = 3.0 * math.sqrt(q * (1.0 - q) / n_s) + 1.0 / n_s
            true_val = q * 39_999
            assert abs(row[name] - true_val) <= tol * 40_000, (
                name, row[name], true_val, tol,
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


class TestPortableHll:
    """Portable md5 HLL (r12 VERDICT ask #3): merge identity, raw-branch
    accuracy at scale, and cross-check vs Spark's built-in DataSketches
    HLL (which stays the reference implementation)."""

    def test_build_then_merge_equals_direct_build(self, spark, sf_dir):
        """Register max is associative and assignment is group-blind, so
        per-day sketches merged to per-type must equal a direct per-type
        build EXACTLY — the identity the catalog oracle replays."""
        from etl_tiki_webscraping_spark.io import load_table
        from etl_tiki_webscraping_spark.operators.sketches import (
            hll_build,
            hll_merge,
        )

        ev = load_table(spark, sf_dir, "events").withColumn(
            "day", F.to_date("ts")
        )
        merged = hll_merge(
            hll_build(ev, "user_id", group_cols=["day", "event_type"]),
            drop_cols=["day"],
        )
        direct = hll_build(ev, "user_id", group_cols=["event_type"])
        assert merged.exceptAll(direct).count() == 0
        assert direct.exceptAll(merged).count() == 0

    def test_raw_branch_accuracy_at_scale(self, spark):
        """10k distinct values with m=256 registers sits squarely in the
        raw-estimator regime (n >= 2.5m); HLL RSE = 1.04/sqrt(256) =
        6.5%, so 20% is a 3-sigma gate."""
        from etl_tiki_webscraping_spark.operators.sketches import (
            hll_build,
            hll_estimate,
        )

        df = spark.range(10_000).select(F.col("id").alias("u"))
        est = hll_estimate(hll_build(df, "u"), out_col="e").collect()[0]["e"]
        assert abs(est - 10_000) <= 2_000, est

    def test_matches_builtin_datasketches_hll(self, spark):
        """The portable estimator and Spark's DataSketches HLL must
        agree within their combined error bands — the built-in stays
        exercised as the cross-check (both at default precision on the
        same 10k distinct input)."""
        from etl_tiki_webscraping_spark.operators.sketches import (
            hll_build,
            hll_estimate,
        )

        df = spark.range(10_000).select(F.col("id").alias("u"))
        portable = hll_estimate(hll_build(df, "u"), out_col="e").collect()[0][
            "e"
        ]
        builtin = df.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("u")).alias("e")
        ).collect()[0]["e"]
        assert abs(portable - builtin) <= 0.25 * builtin, (portable, builtin)


class TestPortableThetaKmv:
    def test_estimation_path_at_scale(self, spark):
        """Forces TRUE KMV estimation (far beyond k+1 retained hashes):
        100k and 60k distinct keys with 20k overlap, k=4096 -> RSE
        ~1.6%, gate 6% (>3 sigma; intersection compounds both thetas so
        it gets absolute slack too)."""
        from etl_tiki_webscraping_spark.operators.sketches import (
            theta_set_estimates,
            theta_sketch,
        )

        a = spark.range(0, 100_000).select(F.col("id").alias("u"))
        b = spark.range(80_000, 140_000).select(F.col("id").alias("u"))
        row = theta_set_estimates(
            theta_sketch(a, "u", k=4096), theta_sketch(b, "u", k=4096), k=4096
        ).collect()[0]
        exact = {
            "n_a": 100_000, "n_b": 60_000,
            "n_union": 140_000, "n_intersect": 20_000, "n_a_only": 80_000,
        }
        for name, t in exact.items():
            assert abs(row[name] - t) <= max(0.06 * t, 1500), (
                name, row[name], t,
            )

    def test_exact_below_k(self, spark):
        """Fewer than k+1 distinct values: theta = 2^60 and every
        estimate is the EXACT count (the sf0.001 regime)."""
        from etl_tiki_webscraping_spark.operators.sketches import (
            theta_set_estimates,
            theta_sketch,
        )

        a = spark.range(0, 40).select(F.col("id").alias("u"))
        b = spark.range(30, 50).select(F.col("id").alias("u"))
        row = theta_set_estimates(
            theta_sketch(a, "u"), theta_sketch(b, "u")
        ).collect()[0]
        assert (row["n_a"], row["n_b"], row["n_union"],
                row["n_intersect"], row["n_a_only"]) == (40, 20, 50, 10, 30)
