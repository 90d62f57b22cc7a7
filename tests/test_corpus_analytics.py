"""Degenerate-input hardening for the round-12 corpus analytics:
cross-engine stability where the math goes singular."""

import duckdb
import math
from pyspark.sql import functions as F


def test_heaps_beta_single_token_source_is_null(spark):
    """ln(N)=0 for a 1-token source: try_divide and NULLIF agree on
    NULL — never Inf/NaN leaking into downstream comparisons."""
    df = spark.createDataFrame(
        [(1, "solo", "s1"), (2, "a a a b", "s2")],
        "doc_id long, text string, source string",
    )
    got = {
        r["source"]: r["beta"]
        for r in df.select(
            "source", F.explode(F.split("text", " ")).alias("tok")
        )
        .groupBy("source")
        .agg(
            F.try_divide(
                F.log(F.countDistinct("tok").cast("double")),
                F.log(F.count(F.lit(1)).cast("double")),
            ).alias("beta")
        )
        .collect()
    }
    assert got["s1"] is None
    assert got["s2"] is not None and 0.0 < got["s2"] < 1.0
    # DuckDB replay agrees on the NULL
    (null_beta,) = duckdb.sql(
        "SELECT ln(1.0) / NULLIF(ln(1.0), 0.0)"
    ).fetchone()
    assert null_beta is None


def test_entropy_all_same_token_doc_is_positive_zero(spark):
    """An all-one-token doc has entropy exactly 0; the raw IEEE sum
    negates to -0.0, and the mirrored `+ 0.0` normalization makes both
    engines emit the SAME bit pattern (+0.0)."""
    df = spark.createDataFrame(
        [(1, "batch batch batch")], "doc_id long, text string"
    )
    tf = (
        df.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    n = tf.groupBy("doc_id").agg(F.sum("c").alias("n"))
    row = (
        tf.join(n, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.round(
                -F.sum(
                    (F.col("c") / F.col("n"))
                    * F.log(F.col("c") / F.col("n"))
                    / F.log(F.lit(2.0))
                )
                + F.lit(0.0),
                9,
            ).alias("e")
        )
        .collect()[0]
    )
    assert row["e"] == 0.0
    assert math.copysign(1.0, row["e"]) == 1.0  # +0.0, not -0.0
    (duck_e,) = duckdb.sql(
        "SELECT round(-(1.0 * ln(1.0) / ln(2.0)) + 0.0, 9)"
    ).fetchone()
    assert duck_e == 0.0 and math.copysign(1.0, duck_e) == 1.0
