"""Benchmark decontamination + repetition scoring
(operators/decontaminate.py, training-data pipeline surface)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_tiki_webscraping_spark.operators.decontaminate import (
    decontaminate,
    repetition_ratio,
    word_ngrams,
)


def test_word_ngrams_and_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, "")], "id long, text string"
    )
    out = {r["id"]: r["g"] for r in df.select("id", word_ngrams("text", 3).alias("g")).collect()}
    assert out[1] == ["a b c", "b c d"]
    assert out[2] == []  # shorter than n
    assert out[3] == []


def test_decontaminate_removes_docs_sharing_benchmark_ngrams(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "intro text then the quick brown fox jumps over the lazy dog end"),  # contains it
            (2, "completely unrelated content about spark catalyst optimizer"),
            (3, "the quick brown cat naps"),  # shares words, not a 5-gram
        ],
        "doc_id long, text string",
    )
    out = sorted(r["doc_id"] for r in decontaminate(corpus, bench, "text", "doc_id", n=5).collect())
    assert out == [2, 3]


def test_decontaminate_min_hits_threshold(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta"), (101, "one two three four")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "x alpha beta gamma delta y one two three four z"),  # 2 distinct hits
            (2, "x alpha beta gamma delta y"),  # 1 hit
        ],
        "doc_id long, text string",
    )
    out1 = sorted(r["doc_id"] for r in decontaminate(corpus, bench, "text", "doc_id", n=4, min_hits=1).collect())
    out2 = sorted(r["doc_id"] for r in decontaminate(corpus, bench, "text", "doc_id", n=4, min_hits=2).collect())
    assert out1 == []
    assert out2 == [2]  # only the double-hit doc removed


def test_decontaminate_plan_broadcasts_benchmark(spark):
    bench = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    corpus = spark.createDataFrame([(2, "f g h i j")], "doc_id long, text string")
    plan = decontaminate(corpus, bench, "text", "doc_id", n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan and "Broadcast" in plan


def test_repetition_ratio_bounds(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),   # one distinct 3-gram
            (2, "all tokens here are fully unique"),
            (3, "ab"),                               # too short -> 0.0
        ],
        "id long, text string",
    )
    out = {r["id"]: r["r"] for r in df.select("id", F.round(repetition_ratio("text", 3), 4).alias("r")).collect()}
    assert out[1] == 0.75  # 4 grams, 1 distinct
    assert out[2] == 0.0
    assert out[3] == 0.0
