"""Quality gates for the APPROXIMATE operators: measure, don't trust.

The approximate tier (SRP-LSH / IVF top-k, MinHash-LSH / SimHash
candidate generation) is rows-only under the SQL oracle — an external
engine cannot replay seeded LSH.  These gates close that evidence gap
by scoring every approximate operator against its EXACT twin, which IS
oracle-checked:

- :func:`topk_recall`      : per-query recall@k of an ANN result
  against brute-force cosine top-k (``operators.similarity``).
- :func:`pair_quality`     : candidate-pair precision/recall of an LSH
  candidate generator against exact n-gram Jaccard ground truth
  (``operators.dedup.jaccard_on_pairs``).

Both are pure DataFrame compositions (joins + aggregates on bare id
columns), so the gate itself scales like any other bare-id join: at
100 TB you gate on a sampled query/document slice, not the full
corpus — recall estimates converge long before the sample stops
fitting a cluster.

Used three ways: unit tests assert recall/precision floors
(tests/test_quality_gates.py), the catalog exports the measured table
(``ann_recall_report`` / ``lsh_pair_quality``) so every driver round
records the numbers, and COVERAGE.md cites the measured values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def topk_recall(
    approx: DataFrame,
    exact: DataFrame,
    query_id_col: str = "query_id",
    neighbor_id_col: str = "neighbor_id",
) -> DataFrame:
    """Per-query recall of ``approx`` against ``exact`` top-k results.

    Both inputs carry (query_id, neighbor_id) rows — the output shape
    of ``brute_force_topk`` / ``lsh_topk`` / ``ivf_topk``.  Recall per
    query = |approx ∩ exact| / |exact|, computed with one semi-join on
    the pair key and one count per side; nothing but 16-byte id pairs
    ever shuffles.  Ties at the k-th score mean |exact| can exceed k —
    dividing by |exact| (not k) keeps recall in [0, 1] regardless.
    """
    t = exact.select(
        F.col(query_id_col).alias("__q"), F.col(neighbor_id_col).alias("__n")
    )
    a = approx.select(
        F.col(query_id_col).alias("__q"), F.col(neighbor_id_col).alias("__n")
    )
    truth_n = t.groupBy("__q").agg(F.count(F.lit(1)).alias("truth_k"))
    hit_n = (
        t.join(a, on=["__q", "__n"], how="left_semi")
        .groupBy("__q")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    return (
        truth_n.join(hit_n, on="__q", how="left")
        .select(
            F.col("__q").alias(query_id_col),
            "truth_k",
            F.coalesce("hits", F.lit(0)).alias("hits"),
            (F.coalesce("hits", F.lit(0)) / F.col("truth_k")).alias("recall"),
        )
    )


def topk_recall_summary(
    approx: DataFrame,
    exact: DataFrame,
    method: str,
    query_id_col: str = "query_id",
    neighbor_id_col: str = "neighbor_id",
) -> DataFrame:
    """One-row summary: (method, n_queries, mean_recall, min_recall)."""
    per_q = topk_recall(approx, exact, query_id_col, neighbor_id_col)
    return per_q.agg(
        F.lit(method).alias("method"),
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg("recall"), 4).alias("mean_recall"),
        F.round(F.min("recall"), 4).alias("min_recall"),
    )


def _norm_pairs(pairs: DataFrame, id_a: str, id_b: str) -> DataFrame:
    """Orient pairs so id_a < id_b (candidate generators already emit
    this, but ground-truth builders may not) and distinct them."""
    return (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("__a"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("__b"),
        )
        .filter(F.col("__a") != F.col("__b"))
        .distinct()
    )


def pair_quality(
    candidates: DataFrame,
    truth: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> dict[str, float]:
    """Precision/recall of a candidate-pair set against ground truth.

    ``candidates``: the pairs an approximate generator surfaced (e.g.
    MinHash-LSH band buckets).  ``truth``: the pairs that actually
    exceed the similarity threshold (exact n-gram Jaccard).  Collects
    three scalar counts — the frames themselves are never collected.
    """
    c = _norm_pairs(candidates, id_a, id_b)
    t = _norm_pairs(truth, id_a, id_b)
    n_cand = c.count()
    n_truth = t.count()
    n_hit = c.join(t, on=["__a", "__b"], how="left_semi").count()
    return {
        "n_candidates": float(n_cand),
        "n_truth": float(n_truth),
        "n_hit": float(n_hit),
        "precision": n_hit / n_cand if n_cand else 1.0,
        "recall": n_hit / n_truth if n_truth else 1.0,
    }


def pair_quality_summary(
    candidates: DataFrame,
    truth: DataFrame,
    method: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """DataFrame form of :func:`pair_quality` for catalog export:
    (method, n_candidates, n_truth, n_hit, precision, recall) — one
    row, computed fully engine-side (no driver-side counts)."""
    c = _norm_pairs(candidates, id_a, id_b).withColumn("__is_cand", F.lit(1))
    t = _norm_pairs(truth, id_a, id_b).withColumn("__is_truth", F.lit(1))
    joined = c.join(t, on=["__a", "__b"], how="full_outer")
    return joined.agg(
        F.lit(method).alias("method"),
        F.sum("__is_cand").alias("n_candidates"),
        F.sum("__is_truth").alias("n_truth"),
        F.sum(
            F.when((F.col("__is_cand") == 1) & (F.col("__is_truth") == 1), 1).otherwise(0)
        ).alias("n_hit"),
    ).select(
        "method",
        "n_candidates",
        "n_truth",
        "n_hit",
        F.round(F.col("n_hit") / F.col("n_candidates"), 4).alias("precision"),
        F.round(F.col("n_hit") / F.col("n_truth"), 4).alias("recall"),
    )


def exact_jaccard_pairs_all(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    shingle_n: int = 3,
) -> DataFrame:
    """EXACT all-pairs n-gram Jaccard ground truth: every (id_a < id_b)
    pair with Jaccard >= threshold.  O(n^2) by construction — this is
    the TRUTH BUILDER for gate measurement on a bounded slice (unit
    tests, the driver's sf0.01 fixture, a sampled audit at scale), NOT
    a production dedup path; ``minhash_duplicate_edges`` is the scale
    path being measured against it.

    Shape note even so: shingle sets are hashed to bigint arrays first
    (the MinHash kernel's 31-bit md5-prefix recipe — first 4 md5 bytes
    masked to 31 bits, which made this truth builder SQL-replayable in
    r11 exactly like the kernel: the oracle reuses the same ``hset``
    CTE, so even the rare 31-bit collisions match bit-for-bit) so the
    quadratic join compares int arrays, not strings, and the pair
    frame carries only (id, hashes).
    """
    from etl_tiki_webscraping_spark.operators.dedup import shingles

    sh = df.select(
        F.col(id_col).alias("id"),
        F.array_sort(
            F.array_distinct(
                F.transform(
                    shingles(text_col, shingle_n),
                    lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10)
                    .cast("bigint")
                    .bitwiseAND(F.lit(0x7FFFFFFF)),
                )
            )
        ).alias("hs"),
    )
    left = sh.select(F.col("id").alias("id_a"), F.col("hs").alias("h_a"))
    right = sh.select(F.col("id").alias("id_b"), F.col("hs").alias("h_b"))
    return (
        left.join(right, on=F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("h_a", "h_b")).cast("double")
                / F.size(F.array_union("h_a", "h_b")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
