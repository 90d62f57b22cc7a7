"""BM25 retrieval (operators/retrieval.py): scoring semantics on a
hand-checkable corpus plus determinism of the ranked output."""

from __future__ import annotations

from etl_tiki_webscraping_spark.operators.retrieval import bm25_topk, tokenize


def _search(spark, docs_rows, query_terms, top_k=10):
    docs = spark.createDataFrame(docs_rows, "doc_id bigint, text string")
    q = spark.createDataFrame([("q", t) for t in query_terms], "query_id string, term string")
    return bm25_topk(docs, q, top_k=top_k).collect()


def test_bm25_prefers_higher_tf_at_equal_length(spark):
    rows = _search(
        spark,
        [(1, "apple banana cherry date"), (2, "apple apple cherry date")],
        ["apple"],
    )
    by_doc = {r.doc_id: r for r in rows}
    assert by_doc[2].rank == 1 and by_doc[1].rank == 2
    assert by_doc[2].score > by_doc[1].score


def test_bm25_idf_downweights_common_terms(spark):
    """A term in every doc contributes less than an equally-frequent
    rare term: the doc matching the rare term must win."""
    corpus = [
        (1, "common rare"),
        (2, "common other words here"),
        (3, "common more filler text"),
        (4, "common yet more filler"),
    ]
    rows = _search(spark, corpus, ["rare"])
    assert rows and rows[0].doc_id == 1 and rows[0].rank == 1
    # doc 1 scores higher on 'rare' than any doc does on 'common'
    common = _search(spark, corpus, ["common"])
    assert rows[0].score > max(r.score for r in common)


def test_bm25_length_normalization(spark):
    """Same tf: the shorter doc ranks first (b=0.75 length penalty)."""
    rows = _search(
        spark,
        [(1, "target plus a few extra words padding this document out"),
         (2, "target here")],
        ["target"],
    )
    assert rows[0].doc_id == 2


def test_bm25_multi_term_sums_and_ties_break_on_doc_id(spark):
    rows = _search(
        spark,
        [(7, "alpha beta"), (3, "alpha beta"), (9, "alpha only")],
        ["alpha", "beta"],
    )
    assert [r.doc_id for r in rows] == [3, 7, 9]  # equal scores: doc_id ascending
    assert rows[0].score == rows[1].score > rows[2].score


def test_tokenize_matches_oracle_contract(spark):
    df = spark.createDataFrame([("Hello, World! x2 --",)], "text string")
    got = df.select(tokenize("text").alias("t")).collect()[0].t
    assert got == ["hello", "world", "x2"]


def test_merged_batch_index_equals_one_shot_index(spark):
    from etl_tiki_webscraping_spark.operators.retrieval import (
        bm25_from_index,
        build_index,
        bm25_topk,
        merge_index,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i} gamma" + (" alpha" if i % 3 == 0 else "")) for i in range(30)],
        "doc_id bigint, text string",
    )
    q = spark.createDataFrame([("q", "alpha"), ("q", "gamma")], "query_id string, term string")
    merged = merge_index(
        build_index(docs.filter("doc_id % 2 = 0")),
        build_index(docs.filter("doc_id % 2 = 1")),
    )
    got = [(r.doc_id, r.rank, r.score) for r in bm25_from_index(*merged, q, top_k=30).collect()]
    want = [(r.doc_id, r.rank, r.score) for r in bm25_topk(docs, q, top_k=30).collect()]
    assert sorted(got) == sorted(want) and len(want) == 30
