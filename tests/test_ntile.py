"""distributed_ntile (operators/relational.py) vs the window-form
NTILE it replaces: row-for-row equality on random data with ties,
every N mod n residue, both directions, and the degenerate
all-equal-values input (one hot bucket)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_tiki_webscraping_spark.operators.relational import distributed_ntile


def _window_truth(df, order_col, tie_col, n, ascending):
    order = (
        [F.col(order_col).asc(), F.col(tie_col).asc()]
        if ascending
        else [F.col(order_col).desc(), F.col(tie_col).asc()]
    )
    return {
        r["id"]: r["t"]
        for r in df.withColumn(
            "t", F.ntile(n).over(Window.orderBy(*order))
        ).collect()
    }


@pytest.mark.parametrize("n,rows,ascending", [
    (3, 90, True),    # N % n == 0
    (3, 91, False),   # N % n == 1
    (3, 92, True),    # N % n == 2
    (4, 10, True),    # small-N residue
    (7, 5, False),    # N < n: every row its own tile
    (1, 17, True),    # single tile
])
def test_matches_window_ntile(spark, n, rows, ascending):
    rng = random.Random(42 + n + rows)
    # duplicate-heavy values so tile boundaries land on ties
    data = [(i, float(rng.randint(0, 12))) for i in range(rows)]
    df = spark.createDataFrame(data, "id long, score double")
    got = {
        r["id"]: r["tile"]
        for r in distributed_ntile(
            df, "score", "id", n=n, n_buckets=8, ascending=ascending
        ).collect()
    }
    assert got == _window_truth(df, "score", "id", n, ascending)


def test_all_equal_values_single_bucket(spark):
    df = spark.createDataFrame(
        [(i, 5.0) for i in range(10)], "id long, score double"
    )
    got = {
        r["id"]: r["tile"]
        for r in distributed_ntile(df, "score", "id", n=3).collect()
    }
    assert got == _window_truth(df, "score", "id", 3, True)


def test_null_order_values_excluded(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 2.0), (4, 3.0)], "id long, score double"
    )
    out = distributed_ntile(df, "score", "id", n=2).collect()
    assert {r["id"] for r in out} == {1, 3, 4}
    assert {r["id"]: r["tile"] for r in out} == {1: 1, 3: 1, 4: 2}


def test_rejects_bad_n(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, score double")
    with pytest.raises(ValueError):
        distributed_ntile(df, "score", "id", n=0)
