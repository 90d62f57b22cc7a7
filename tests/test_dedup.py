"""Dedup operator semantics: exact, MinHash-LSH, SimHash, n-gram
Jaccard (training-data-pipeline extension surface)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_tiki_webscraping_spark.operators.dedup import (
    exact_dedup,
    jaccard_on_pairs,
    minhash_analysis,
    minhash_candidate_pairs,
    minhash_dedup,
    simhash_candidate_pairs,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
    (3, "The  quick brown fox jumps over the lazy dog near the river bank today"),  # ws/case variant of 1
    (4, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near dup of 1
    (5, "completely different content about spark dataframes and catalyst optimizer rules"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_exact_dedup_keeps_lowest_id(spark):
    out = exact_dedup(_docs(spark), "text", "doc_id")
    ids = sorted(r["doc_id"] for r in out.collect())
    # 2 and 3 normalize to doc 1's text; 4 and 5 are distinct
    assert ids == [1, 4, 5]


def test_minhash_signature_deterministic_and_discriminative(spark):
    a = minhash_analysis(_docs(spark), "text", "doc_id").collect()
    sig = {r["id"]: tuple(r["sig"]) for r in a}
    assert sig[1] == sig[2]  # identical text -> identical signature
    assert sig[1] != sig[5]  # unrelated text -> different signature
    # near-dup docs share most signature components
    matches = sum(x == y for x, y in zip(sig[1], sig[4]))
    assert matches > len(sig[1]) // 2


def test_minhash_candidates_find_near_dups_not_unrelated(spark):
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_candidate_pairs(_docs(spark), "text", "doc_id").collect()}
    assert (1, 2) in pairs
    assert (1, 4) in pairs
    assert not any(5 in p for p in pairs)


def test_minhash_dedup_drops_higher_id_near_dups(spark):
    out = minhash_dedup(_docs(spark), "text", "doc_id", threshold=0.8)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert 1 in ids and 5 in ids
    assert 2 not in ids  # exact dup dropped
    assert ids == sorted(set(ids))


def test_jaccard_on_pairs_exact_values(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "x y z w")],
        "doc_id bigint, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a bigint, id_b bigint")
    out = {(r["id_a"], r["id_b"]): r["jaccard"] for r in jaccard_on_pairs(pairs, docs, "text", "doc_id", shingle_n=1).collect()}
    assert abs(out[(1, 2)] - 3 / 5) < 1e-9  # |{a,b,c}| / |{a,b,c,d,e}|
    assert out[(1, 3)] == 0.0


def test_simhash_pairs_identical_distance_zero(spark):
    out = simhash_candidate_pairs(_docs(spark), "text", "doc_id")
    rows = {(r["id_a"], r["id_b"]): r["hamming"] for r in out.collect()}
    assert rows.get((1, 2)) == 0  # identical docs -> identical simhash
    assert all(h <= 3 for h in rows.values())
    assert not any(5 in (a, b) for a, b in rows)
