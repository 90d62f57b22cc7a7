"""Incremental rollup maintenance: merge(rollup(A), rollup(B)) must
equal rollup(A ∪ B) for additive metrics."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_tiki_webscraping_spark.operators.rollup import (
    hourly_event_rollup,
    merge_additive,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts_s string, event_type string, value double"
    ).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value"
    )


def test_merge_additive_equals_one_shot(spark):
    a = _events(spark, [
        (1, "2024-01-01 10:05:00", "click", 1.5),
        (2, "2024-01-01 10:40:00", "click", 2.5),
        (3, "2024-01-01 11:05:00", "view", 1.0),
    ])
    b = _events(spark, [
        (4, "2024-01-01 10:59:00", "click", 4.0),
        (5, "2024-01-01 12:00:00", "error", 0.5),
    ])
    merged = merge_additive(
        hourly_event_rollup(a), hourly_event_rollup(b),
        keys=["bucket_ts", "event_type"], add_cols=["n_events", "sum_value"],
    )
    oneshot = hourly_event_rollup(a.unionByName(b))
    m = {(str(r["bucket_ts"]), r["event_type"]): (r["n_events"], float(r["sum_value"]))
         for r in merged.collect()}
    o = {(str(r["bucket_ts"]), r["event_type"]): (r["n_events"], float(r["sum_value"]))
         for r in oneshot.collect()}
    assert m == o
    assert m[("2024-01-01 10:00:00", "click")] == (3, 8.0)  # both batches contribute
    assert m[("2024-01-01 12:00:00", "error")] == (1, 0.5)  # update-only key inserted


def test_merge_additive_min_max_combiners(spark):
    target = spark.createDataFrame(
        [("k1", 5, 2, 9), ("k2", 1, 0, 3)],
        "k string, n long, lo long, hi long",
    )
    updates = spark.createDataFrame(
        [("k1", 2, 1, 12), ("k3", 7, 4, 4)],
        "k string, n long, lo long, hi long",
    )
    out = {
        r["k"]: (r["n"], r["lo"], r["hi"])
        for r in merge_additive(
            target, updates, keys=["k"], add_cols=["n"], min_cols=["lo"], max_cols=["hi"]
        ).collect()
    }
    assert out == {
        "k1": (7, 1, 12),  # sum / min / max combined
        "k2": (1, 0, 3),   # target-only passthrough
        "k3": (7, 4, 4),   # update-only insert
    }


def test_rollup_deltas_from_change_feed_maintains_aggregate(spark, tmp_parquet_dir):
    """merge_additive(rollup(v1), deltas(feed v2..v3)) == rollup(v3),
    including a group that cancels to zero when all its rows delete."""
    from pyspark.sql import functions as F

    from etl_tiki_webscraping_spark.operators.rollup import (
        merge_additive,
        rollup_deltas_from_change_feed,
    )
    from etl_tiki_webscraping_spark.sinks.upsert import (
        delete_where,
        read_change_feed,
        read_parquet_table,
        upsert_parquet,
    )

    b1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "c", 40.0)],
        "k int, g string, v double",
    )
    upsert_parquet(spark, b1, tmp_parquet_dir, ["k"], change_feed=True, keep_snapshots=6)
    b2 = spark.createDataFrame([(2, "a", 25.0), (5, "b", 5.0)], "k int, g string, v double")
    upsert_parquet(spark, b2, tmp_parquet_dir, ["k"], change_feed=True, keep_snapshots=6)
    delete_where(spark, tmp_parquet_dir, F.col("g") == "c", change_feed=True, keep_snapshots=6)

    def rollup(df):
        return df.groupBy("g").agg(
            F.sum(F.col("v").cast("decimal(18,6)")).alias("sum_v"),
            F.count(F.lit(1)).alias("n"),
        )

    base = rollup(read_parquet_table(spark, tmp_parquet_dir, version=1))
    deltas = rollup_deltas_from_change_feed(
        read_change_feed(spark, tmp_parquet_dir, 2, 3), ["g"], "v",
        sum_col="sum_v", count_col="n",
    )
    maintained = merge_additive(base, deltas, ["g"], add_cols=["sum_v", "n"])
    got = {
        r.g: (float(r.sum_v), r.n)
        for r in maintained.filter(F.col("n") > 0).collect()
    }
    want = {
        r.g: (float(r.sum_v), r.n)
        for r in rollup(read_parquet_table(spark, tmp_parquet_dir)).collect()
    }
    assert got == want == {"a": (35.0, 2), "b": (35.0, 2)}
    # the fully-deleted group cancelled to exactly zero before the filter
    zeroed = {r.g: r.n for r in maintained.collect()}
    assert zeroed["c"] == 0


def test_rollup_deltas_unknown_change_type_raises(spark):
    import pytest
    from py4j.protocol import Py4JJavaError

    from etl_tiki_webscraping_spark.operators.rollup import (
        rollup_deltas_from_change_feed,
    )

    feed = spark.createDataFrame(
        [("a", 1.0, "upsert")], "g string, v double, _change_type string"
    )
    with pytest.raises(Exception) as ei:
        rollup_deltas_from_change_feed(feed, ["g"], "v").collect()
    assert "unknown change type" in str(ei.value)


class TestJoinViewRefresh:
    """Affected-key recompute IVM for a materialized equi-join view:
    incremental refresh must equal full recompute across inserts,
    updates, deletes, and JOIN-KEY CHANGES on either side."""

    def _mk(self, spark, rows, schema):
        return spark.createDataFrame(rows, schema)

    def test_refresh_equals_recompute_incl_key_change(self, spark):
        from etl_tiki_webscraping_spark.operators.rollup import (
            join_view_refresh,
        )

        fact_v1 = self._mk(
            spark,
            [(1, 10, "a"), (2, 10, "b"), (3, 20, "c"), (4, 30, "d")],
            "fid int, k int, fx string",
        )
        dim_v1 = self._mk(
            spark, [(10, "ten"), (20, "twenty"), (30, "thirty")],
            "dk int, dname string",
        )
        view1 = fact_v1.join(
            dim_v1, on=F.col("k") == F.col("dk")
        ).select("fid", "k", "fx", "dname")

        # changes: fact 3 MOVES key 20->40 (old AND new key touched),
        # fact 5 inserted at 10, fact 4 deleted; dim 40 inserted,
        # dim 10 renamed, dim 30 deleted
        fact_v2 = self._mk(
            spark,
            [(1, 10, "a"), (2, 10, "b"), (3, 40, "c"), (5, 10, "e")],
            "fid int, k int, fx string",
        )
        dim_v2 = self._mk(
            spark, [(10, "TEN"), (20, "twenty"), (40, "forty")],
            "dk int, dname string",
        )
        touched = self._mk(
            spark, [(20,), (40,), (10,), (30,)], "k int"
        )
        got = sorted(
            tuple(r)
            for r in join_view_refresh(
                view1, fact_v2, dim_v2, "k", "dk", touched
            ).collect()
        )
        full = sorted(
            tuple(r)
            for r in fact_v2.join(dim_v2, on=F.col("k") == F.col("dk"))
            .select("fid", "k", "fx", "dname")
            .collect()
        )
        assert got == full
        assert ("fid", "k", "fx", "dname") == tuple(
            join_view_refresh(view1, fact_v2, dim_v2, "k", "dk", touched).columns
        )

    def test_untouched_rows_come_from_the_view_not_a_rejoin(self, spark):
        from etl_tiki_webscraping_spark.operators.rollup import (
            join_view_refresh,
        )

        fact = self._mk(spark, [(1, 10, "a")], "fid int, k int, fx string")
        dim = self._mk(spark, [(10, "ten")], "dk int, dname string")
        view = fact.join(dim, on=F.col("k") == F.col("dk")).select(
            "fid", "k", "fx", "dname"
        )
        # empty delta: the refresh must return the view rows verbatim
        # even if the base tables have silently diverged (proves kept
        # rows are NOT recomputed)
        diverged = self._mk(spark, [(10, "LIES")], "dk int, dname string")
        empty = self._mk(spark, [], "k int")
        got = [tuple(r) for r in join_view_refresh(
            view, fact, diverged, "k", "dk", empty
        ).collect()]
        assert got == [(1, 10, "a", "ten")]

    def test_same_key_name_uses_using_join(self, spark):
        # the common case: both sides share the join-key NAME; the
        # recompute must not hit AMBIGUOUS_REFERENCE (ADVICE r8) and
        # must keep a single key column like a USING-join view
        from etl_tiki_webscraping_spark.operators.rollup import (
            join_view_refresh,
        )

        fact = self._mk(spark, [(1, 10, "a"), (2, 20, "b")], "fid int, k int, fx string")
        dim = self._mk(spark, [(10, "ten"), (20, "twenty")], "k int, dname string")
        view = fact.join(dim, on="k").select("fid", "k", "fx", "dname")
        fact2 = self._mk(spark, [(1, 10, "a"), (2, 20, "B")], "fid int, k int, fx string")
        touched = self._mk(spark, [(20,)], "k int")
        got = sorted(
            tuple(r)
            for r in join_view_refresh(view, fact2, dim, "k", "k", touched).collect()
        )
        assert got == [(1, 10, "a", "ten"), (2, 20, "B", "twenty")]

    def test_touched_keys_schema_validated(self, spark):
        import pytest

        from etl_tiki_webscraping_spark.operators.rollup import (
            join_view_refresh,
        )

        df = self._mk(spark, [(1, 10, "a")], "fid int, k int, fx string")
        dim = self._mk(spark, [(10, "t")], "dk int, dname string")
        view = df.join(dim, on=F.col("k") == F.col("dk")).select(
            "fid", "k", "fx", "dname"
        )
        bad = self._mk(spark, [(10, 1)], "k int, extra int")
        with pytest.raises(ValueError, match="exactly one column"):
            join_view_refresh(view, df, dim, "k", "dk", bad)


class TestEquiWidthHistogram:
    def test_buckets_edges_and_clamping(self, spark):
        from etl_tiki_webscraping_spark.operators.rollup import (
            equi_width_histogram,
        )

        df = spark.createDataFrame(
            [(-5.0,), (0.0,), (9.9,), (10.0,), (25.0,), (100.0,), (999.0,)],
            "v double",
        )
        # 10 buckets of width 10 on [0, 100): -5 clamps into bucket 0,
        # 100 and 999 clamp into bucket 9, 10.0 lands in bucket 1
        got = {
            r.bucket: (r.bucket_lo, r.bucket_hi, r.cnt)
            for r in equi_width_histogram(df, "v", 0.0, 100.0, 10).collect()
        }
        assert got == {
            0: (0.0, 10.0, 3),
            1: (10.0, 20.0, 1),
            2: (20.0, 30.0, 1),
            9: (90.0, 100.0, 2),
        }

    def test_nulls_never_pollute_bucket_zero(self, spark):
        # ADVICE r8 (medium): floor(NULL-lo) is NULL and greatest()
        # skips NULLs, so the old clamp silently counted NULLs into
        # bucket 0.  Default: NULLs excluded; null_bucket=True: a
        # dedicated bucket=-1 row with NULL edges carries the count.
        from etl_tiki_webscraping_spark.operators.rollup import (
            equi_width_histogram,
        )

        df = spark.createDataFrame(
            [(None,), (None,), (5.0,), (15.0,)], "v double"
        )
        got = {
            r.bucket: r.cnt
            for r in equi_width_histogram(df, "v", 0.0, 100.0, 10).collect()
        }
        assert got == {0: 1, 1: 1}  # NULLs excluded, bucket 0 honest

        with_null = {
            r.bucket: (r.bucket_lo, r.bucket_hi, r.cnt)
            for r in equi_width_histogram(
                df, "v", 0.0, 100.0, 10, null_bucket=True
            ).collect()
        }
        assert with_null == {
            -1: (None, None, 2),
            0: (0.0, 10.0, 1),
            1: (10.0, 20.0, 1),
        }

    def test_nan_routes_with_null_and_outliers_clamp_under_ansi(self, spark):
        # NaN has no place on the number line: it follows the NULL
        # routing (excluded, or bucket -1 with null_bucket=True), and a
        # far outlier whose floor() exceeds int range clamps into the
        # edge bucket instead of raising CAST_OVERFLOW under ANSI mode.
        from etl_tiki_webscraping_spark.operators.rollup import (
            equi_width_histogram,
        )

        df = spark.createDataFrame(
            [(float("nan"),), (5.0,), (1e18,), (-1e18,), (float("inf"),)],
            "v double",
        )
        got = {
            r.bucket: r.cnt
            for r in equi_width_histogram(df, "v", 0.0, 100.0, 10).collect()
        }
        assert got == {0: 2, 9: 2}  # NaN gone; +/-1e18 and inf clamp
        with_null = {
            r.bucket: r.cnt
            for r in equi_width_histogram(
                df, "v", 0.0, 100.0, 10, null_bucket=True
            ).collect()
        }
        assert with_null == {-1: 1, 0: 2, 9: 2}

    def test_total_count_preserved(self, spark, sf_dir):
        from etl_tiki_webscraping_spark.operators.rollup import (
            equi_width_histogram,
        )
        from pyspark.sql import functions as F

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            F.col("o_totalprice").cast("double").alias("price")
        )
        hist = equi_width_histogram(orders, "price", 0.0, 600_000.0, 20)
        assert (
            hist.agg(F.sum("cnt")).collect()[0][0] == orders.count()
        )  # clamped edges: no row ever drops


class TestGroupedOlsTrend:
    def test_matches_numpy_polyfit(self, spark):
        import numpy as np

        from etl_tiki_webscraping_spark.operators.rollup import (
            grouped_ols_trend,
        )

        pts = {
            "a": [(0.0, 1.0), (1.0, 3.0), (2.0, 5.0), (3.0, 7.0)],  # y=2x+1
            "b": [(0.0, 10.0), (2.0, 4.0), (4.0, 1.0)],
        }
        rows = [(g, x, y) for g, ps in pts.items() for x, y in ps]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        got = {
            r.g: (r.slope, r.intercept)
            for r in grouped_ols_trend(df, ["g"], "x", "y").collect()
        }
        for g, ps in pts.items():
            xs, ys = zip(*ps)
            b, a = np.polyfit(xs, ys, 1)
            assert abs(got[g][0] - round(b, 6)) < 1e-9
            assert abs(got[g][1] - round(a, 6)) < 1e-9
        assert got["a"] == (2.0, 1.0)  # exact on exact data

    def test_degenerate_groups_yield_null(self, spark):
        from etl_tiki_webscraping_spark.operators.rollup import (
            grouped_ols_trend,
        )

        df = spark.createDataFrame(
            [("single", 1.0, 5.0),
             ("novar", 2.0, 1.0), ("novar", 2.0, 9.0)],
            "g string, x double, y double",
        )
        got = {r.g: (r.n, r.slope, r.intercept)
               for r in grouped_ols_trend(df, ["g"], "x", "y").collect()}
        assert got["single"] == (1, None, None)
        assert got["novar"] == (2, None, None)  # vertical: no finite fit


class TestCooccurrencePairs:
    def test_pairs_and_support(self, spark):
        from etl_tiki_webscraping_spark.operators.rollup import (
            cooccurrence_pairs,
        )

        rows = [
            (1, "a"), (1, "b"), (1, "c"),
            (2, "a"), (2, "b"),
            (3, "a"), (3, "b"), (3, "a"),  # dup item in basket: counts once
            (4, "c"),
        ]
        df = spark.createDataFrame(rows, "b int, item string")
        got = {
            (r.item_a, r.item_b): r.support
            for r in cooccurrence_pairs(df, "b", "item", 2).collect()
        }
        assert got == {("a", "b"): 3}  # (a,c)/(b,c) support 1 drop


class TestEventTransitionMatrix:
    def test_counts_probabilities_and_tiebreak(self, spark):
        from etl_tiki_webscraping_spark.operators.rollup import (
            event_transition_matrix,
        )

        # user 1: A -> B -> B; user 2: A -> C.  Same-ts pair in user 2
        # orders by the id tiebreak (id 1 before id 2).
        rows = [
            (1, 10, 1, "A"), (1, 20, 2, "B"), (1, 30, 3, "B"),
            (2, 50, 1, "A"), (2, 50, 2, "C"),
        ]
        df = spark.createDataFrame(rows, "u int, t int, eid int, s string")
        got = {
            (r.state_from, r.state_to): (r.n, r.p)
            for r in event_transition_matrix(
                df, "u", "t", "s", tiebreak_col="eid"
            ).collect()
        }
        assert got == {
            ("A", "B"): (1, 0.5),
            ("A", "C"): (1, 0.5),
            ("B", "B"): (1, 1.0),
        }


class TestTimeWeightedAverage:
    def test_twap_hand_computed(self, spark):
        import datetime

        from etl_tiki_webscraping_spark.operators.rollup import (
            time_weighted_average,
        )

        base = datetime.datetime(2024, 1, 1)
        mk = lambda s: base + datetime.timedelta(seconds=s)
        # value 10 held 5s, value 20 held 15s -> (50 + 300) / 20 = 17.5
        rows = [
            (1, mk(0), 1, 10.0), (1, mk(5), 2, 20.0), (1, mk(20), 3, 99.0),
            (2, mk(0), 1, 7.0),  # single observation: no closed interval
        ]
        df = spark.createDataFrame(
            rows, "u int, ts timestamp, eid int, v double"
        )
        got = {r.u: r.twap
               for r in time_weighted_average(
                   df, "u", "ts", "v", tiebreak_col="eid").collect()}
        assert got == {1: 17.5}  # user 2 absent entirely


def test_equi_width_histogram_validates_bounds(spark):
    import pytest

    from etl_tiki_webscraping_spark.operators.rollup import (
        equi_width_histogram,
    )

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match="hi > lo"):
        equi_width_histogram(df, "v", 10.0, 10.0, 5)
    with pytest.raises(ValueError, match="n_buckets"):
        equi_width_histogram(df, "v", 0.0, 10.0, 0)


def test_event_ohlc_deterministic_ties(spark, tmp_path):
    """Two events with the SAME timestamp in one bucket: open/close
    must come from the min/max (ts, event_id) row — a total order —
    not whichever row a partition delivered first."""
    import datetime as dt

    import pandas as pd

    from etl_tiki_webscraping_spark.plans.catalog import QUERIES

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # bucket 0: tie at t0 — event_id 1 is open; last ts wins close
        (1, t0, 7, "click", 10.0, "{}"),
        (2, t0, 8, "click", 99.0, "{}"),
        (3, t0 + dt.timedelta(hours=1), 9, "click", 55.0, "{}"),
        # NULL value excluded entirely
        (4, t0, 9, "click", None, "{}"),
        # different bucket (6h width)
        (5, t0 + dt.timedelta(hours=7), 9, "click", 1.0, "{}"),
    ]
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet", index=False)

    out = {
        (r["event_type"], r["bucket"]): r
        for r in QUERIES["event_ohlc_resample"].fn(spark, str(tmp_path)).collect()
    }
    assert len(out) == 2
    b0 = [v for k, v in out.items() if v["n"] == 3][0]
    assert b0["open"] == 10.0   # event_id 1 at the tied timestamp
    assert b0["close"] == 55.0  # strictly later row
    assert b0["high"] == 99.0 and b0["low"] == 10.0
    assert abs(b0["volume"] - 164.0) < 1e-9
    b1 = [v for k, v in out.items() if v["n"] == 1][0]
    assert b1["open"] == b1["close"] == 1.0
