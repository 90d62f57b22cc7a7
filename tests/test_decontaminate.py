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


def test_pack_by_token_budget_chunk_semantics(spark):
    from etl_tiki_webscraping_spark.operators.decontaminate import pack_by_token_budget

    docs = spark.createDataFrame(
        [(1, 60), (2, 60), (3, 100), (4, 300), (5, 10)],
        "doc_id long, n_tokens long",
    )
    out = {
        r["doc_id"]: r["pack_id"]
        for r in pack_by_token_budget(
            docs, "n_tokens", "doc_id", budget=100, shard_expr=F.lit(0)
        ).collect()
    }
    # stream offsets: 0, 60, 120, 220, 520 -> chunks 0, 0, 1, 2, 5
    assert out == {1: 0, 2: 0, 3: 1, 4: 2, 5: 5}


def test_pack_by_token_budget_sharded_is_deterministic(spark):
    from etl_tiki_webscraping_spark.operators.decontaminate import pack_by_token_budget

    docs = spark.createDataFrame(
        [(i, (i * 37) % 90 + 10) for i in range(200)], "doc_id long, n_tokens long"
    )
    a = sorted(map(tuple, pack_by_token_budget(docs, "n_tokens", "doc_id", 256).collect()))
    b = sorted(map(tuple, pack_by_token_budget(docs, "n_tokens", "doc_id", 256).collect()))
    assert a == b
    packs = pack_by_token_budget(docs, "n_tokens", "doc_id", 256)
    # every doc assigned; pack ids contiguous from 0 within a shard
    import pyspark.sql.functions as SF
    per_shard = packs.groupBy("shard").agg(SF.min("pack_id").alias("lo")).collect()
    assert all(r["lo"] == 0 for r in per_shard)


def test_dsir_log_weights_favor_target_vocabulary(spark):
    """A pool doc written in the target's vocabulary must out-weigh a
    pool doc written in out-of-target vocabulary (the defining DSIR
    property), and token-less docs get no weight row."""
    from etl_tiki_webscraping_spark.operators.decontaminate import (
        dsir_log_weights,
    )

    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta epsilon") for i in range(5)],
        "doc_id long, text string",
    )
    pool = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha beta"),   # target-like
            (2, "zork quux blarg wibble frotz"),  # out-of-target
            (3, "!!! ???"),                        # tokenizes to nothing
            (4, None),                             # NULL text
        ],
        "doc_id long, text string",
    )
    rows = {
        r["id"]: r
        for r in dsir_log_weights(pool, target, "text", "doc_id").collect()
    }
    assert set(rows) == {1, 2}          # 3 and 4 have no tokens
    assert rows[1]["log_weight"] > rows[2]["log_weight"]
    assert rows[1]["log_weight"] > 0    # in-target vocab: ratio > 1
    assert rows[2]["log_weight"] < 0    # never-seen-in-target vocab
    assert rows[1]["n_tokens"] == 5


def test_dsir_resample_deterministic_and_bounded(spark):
    from etl_tiki_webscraping_spark.operators.decontaminate import (
        dsir_resample,
    )

    target = spark.createDataFrame(
        [(1000, "alpha beta gamma delta")], "doc_id long, text string"
    )
    pool = spark.createDataFrame(
        [(i, f"alpha beta token{i % 7} token{i % 3}") for i in range(40)],
        "doc_id long, text string",
    )
    once = dsir_resample(pool, target, "text", "doc_id", k=10).collect()
    twice = dsir_resample(pool, target, "text", "doc_id", k=10).collect()
    assert len(once) == 10
    assert [r["id"] for r in once] == [r["id"] for r in twice]
    # keys are finite bigints (the u=(h+0.5)/2^32 construction can
    # never produce ln(-ln(1.0)) = -inf)
    assert all(r["key_units"] is not None for r in once)
    # selection is weight-biased: ranked by key desc
    keys = [r["key_units"] for r in once]
    assert keys == sorted(keys, reverse=True)


def test_dsir_resample_k_larger_than_pool_returns_all(spark):
    from etl_tiki_webscraping_spark.operators.decontaminate import (
        dsir_resample,
    )

    target = spark.createDataFrame(
        [(99, "alpha beta")], "doc_id long, text string"
    )
    pool = spark.createDataFrame(
        [(1, "alpha x"), (2, "beta y")], "doc_id long, text string"
    )
    assert dsir_resample(pool, target, "text", "doc_id", k=50).count() == 2


def test_dsir_tokenless_target_degrades_to_uniform(spark):
    """A target with no tokens must NOT NULL every weight (SUM over an
    empty histogram is NULL): add-1 smoothing over a 0 total gives a
    UNIFORM target density, so weights rank by inverse raw frequency."""
    from etl_tiki_webscraping_spark.operators.decontaminate import (
        dsir_log_weights,
    )

    target = spark.createDataFrame(
        [(9, "!!!")], "doc_id long, text string"  # tokenizes to nothing
    )
    pool = spark.createDataFrame(
        [(1, "common common common"), (2, "rare")],
        "doc_id long, text string",
    )
    rows = {
        r["id"]: r["log_weight"]
        for r in dsir_log_weights(pool, target, "text", "doc_id").collect()
    }
    assert all(v is not None for v in rows.values())
    # per-token weight of the rarer token is higher under uniform target
    assert rows[2] / 1 > rows[1] / 3


def test_repetition_report_matches_column_form(spark):
    """The aggregate-shaped operator equals the Column expression on
    every case incl. NULL text and too-short docs (both 0.0)."""
    from pyspark.sql import functions as F

    from etl_tiki_webscraping_spark.operators.decontaminate import (
        repetition_ratio,
        repetition_report,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),  # heavy repetition
            (2, "all distinct words here now truly"),
            (3, "a b"),  # too short for 3-grams
            (4, None),
            (5, "x y z x y z"),
        ],
        "doc_id long, text string",
    )
    via_col = {
        r["doc_id"]: r["r"]
        for r in df.select(
            "doc_id", F.round(repetition_ratio("text", 3), 9).alias("r")
        ).collect()
    }
    via_agg = {
        r["doc_id"]: r["r"]
        for r in repetition_report(df, "text", "doc_id", 3)
        .select("doc_id", F.round("repetition", 9).alias("r"))
        .collect()
    }
    assert via_col == via_agg
    assert via_agg[3] == 0.0 and via_agg[4] == 0.0
    assert via_agg[1] > 0.5
