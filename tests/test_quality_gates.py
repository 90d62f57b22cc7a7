"""Quantitative gates for the approximate tier (VERDICT r3 asks #1/#8).

Two kinds of assertion:

- GEOMETRY tests on clustered synthetic vectors: when the data has
  real neighborhood structure (tight clusters), the approximate paths
  must hit >= 0.9 recall@10 at their default configs.  This is the
  "machinery works" proof.
- FIXTURE floors: the driver's ``embeddings`` fixture is ISOTROPIC
  random noise (measured: same-label and diff-label mean cosine both
  ~0.000, top-10 neighbor cosine ~0.30 vs noise sigma 0.125).  On such
  data LSH selectivity is information-theoretically weak (p1=0.60 vs
  p2=0.50 per hyperplane bit -> rho~0.75), so the honest measured
  recall is low — the floors here pin the MEASURED operating point so
  a silent recall collapse (the r3 verdict's concern) still fails
  loudly, without pretending noise data clusters.

MinHash/SimHash gates run on the ``documents`` fixture, which has real
near-duplicates: candidate precision/recall is measured against exact
all-pairs n-gram Jaccard ground truth.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_tiki_webscraping_spark.quality.gates import (
    exact_jaccard_pairs_all,
    pair_quality,
    topk_recall,
    topk_recall_summary,
)


def _mk_pairs(spark, rows):
    return spark.createDataFrame(rows, "query_id bigint, neighbor_id bigint")


def test_topk_recall_arithmetic(spark):
    exact = _mk_pairs(spark, [(1, 10), (1, 11), (2, 20), (2, 21)])
    approx = _mk_pairs(spark, [(1, 10), (1, 99), (2, 20), (2, 21)])
    got = {r["query_id"]: r for r in topk_recall(approx, exact).collect()}
    assert got[1]["recall"] == 0.5 and got[1]["truth_k"] == 2 and got[1]["hits"] == 1
    assert got[2]["recall"] == 1.0


def test_topk_recall_missing_query_counts_zero(spark):
    exact = _mk_pairs(spark, [(1, 10), (2, 20)])
    approx = _mk_pairs(spark, [(1, 10)])  # query 2 returned nothing
    got = {r["query_id"]: r["recall"] for r in topk_recall(approx, exact).collect()}
    assert got[2] == 0.0


def test_pair_quality_counts(spark):
    cand = spark.createDataFrame([(1, 2), (3, 4), (5, 6)], "id_a bigint, id_b bigint")
    truth = spark.createDataFrame([(2, 1), (3, 4), (7, 8)], "id_a bigint, id_b bigint")
    q = pair_quality(cand, truth)
    assert q["n_hit"] == 2  # (1,2) matches despite orientation flip
    assert q["precision"] == pytest.approx(2 / 3)
    assert q["recall"] == pytest.approx(2 / 3)


# --------------------------------------------------------------------------
# geometry tests: clustered data -> high recall at default configs
# --------------------------------------------------------------------------

N_CLUSTERS, PER_CLUSTER, DIM = 10, 50, 32


@pytest.fixture(scope="module")
def clustered(spark):
    """500 vectors in 10 tight clusters (noise sigma 0.04/dim around
    unit centers -> noise norm ~0.23, within-cluster cosine ~0.95,
    cross-cluster ~0) — the geometry ANN indexes are built for."""
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(N_CLUSTERS):
        for _ in range(PER_CLUSTER):
            v = centers[c] + 0.04 * rng.standard_normal(DIM)
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )


def _queries_of(clustered):
    return clustered.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _exact_topk(clustered):
    from etl_tiki_webscraping_spark.operators.similarity import brute_force_topk

    return brute_force_topk(clustered, _queries_of(clustered), k=10)


def test_lsh_recall_on_clustered_data(spark, clustered):
    from etl_tiki_webscraping_spark.operators.similarity import lsh_topk

    exact = _exact_topk(clustered)
    approx = lsh_topk(clustered, _queries_of(clustered), k=10, tables=8, bits=8)
    row = topk_recall_summary(approx, exact, "lsh").collect()[0]
    assert row["mean_recall"] >= 0.9, row
    assert row["n_queries"] == 5


def test_ivf_kmeans_recall_on_clustered_data(spark, clustered):
    from etl_tiki_webscraping_spark.operators.similarity import (
        ivf_topk,
        ivf_train_centroids,
    )

    exact = _exact_topk(clustered)
    cents = ivf_train_centroids(clustered, n_cells=N_CLUSTERS, max_iter=5)
    approx = ivf_topk(clustered, _queries_of(clustered), cents, k=10, nprobe=2)
    row = topk_recall_summary(approx, exact, "ivf").collect()[0]
    assert row["mean_recall"] >= 0.9, row


def test_ivf_pq_recall_on_clustered_data(spark, clustered):
    """The composed IVF x PQ pipeline (route -> in-list ADC -> exact
    refine) must hit >= 0.9 recall@10 on clustered geometry at its
    default config (VERDICT r8 ask #5's pinned floor)."""
    from etl_tiki_webscraping_spark.operators.similarity import (
        ivf_pq_topk,
        ivf_train_centroids,
        pq_train_codebooks,
    )

    exact = _exact_topk(clustered)
    cents = ivf_train_centroids(clustered, n_cells=N_CLUSTERS, max_iter=5)
    books = pq_train_codebooks(clustered, m=8, k=16, max_iter=5)
    approx = ivf_pq_topk(
        clustered, cents, books, _queries_of(clustered),
        k=10, nprobe=2, shortlist_k=50,
    )
    row = topk_recall_summary(approx, exact, "ivf_pq").collect()[0]
    assert row["mean_recall"] >= 0.9, row
    assert row["n_queries"] == 5


# --------------------------------------------------------------------------
# fixture floors: pin the measured operating point on isotropic noise
# --------------------------------------------------------------------------

def test_fixture_ann_recall_floors(spark, sf_dir):
    from etl_tiki_webscraping_spark.plans.catalog import QUERIES

    rows = {r["method"]: r for r in QUERIES["ann_recall_report"].fn(spark, sf_dir).collect()}
    # measured r5 on sf0.001 (isotropic noise, see module docstring):
    # lsh 0.20, ivf 0.52, ivf_kmeans 0.64.  Floors at ~half the measured
    # value: they fail on collapse (0 recall, broken banding, empty
    # candidate sets), not on benign jitter.
    assert rows["knn_lsh"]["mean_recall"] >= 0.10, rows["knn_lsh"]
    # the 16x4 wide operating point trades candidates for recall and
    # must stay HIGH even on isotropic noise (measured r5: 0.90)
    assert rows["knn_lsh_wide"]["mean_recall"] >= 0.70, rows["knn_lsh_wide"]
    assert rows["knn_ivf"]["mean_recall"] >= 0.25, rows["knn_ivf"]
    assert rows["knn_ivf_kmeans"]["mean_recall"] >= 0.30, rows["knn_ivf_kmeans"]
    # PQ shortlist(50)+refine measured 0.76 on isotropic noise (r7);
    # floor at ~half, same convention as the rest
    assert rows["knn_pq"]["mean_recall"] >= 0.40, rows["knn_pq"]
    # composed IVF(16, nprobe 4) x PQ measured 0.60 on isotropic noise
    # (r9) — between ivf_kmeans (routing loss) and pure PQ, as the
    # composition predicts; floor at half
    assert rows["knn_ivf_pq"]["mean_recall"] >= 0.30, rows["knn_ivf_pq"]
    assert all(r["n_queries"] == 5 for r in rows.values())


# --------------------------------------------------------------------------
# MinHash / SimHash candidate quality vs exact Jaccard ground truth
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from etl_tiki_webscraping_spark.io import load_table

    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def jaccard_truth(docs):
    return exact_jaccard_pairs_all(docs, "text", "doc_id", threshold=0.8, shingle_n=3)


def test_minhash_candidates_quality(docs, jaccard_truth):
    from etl_tiki_webscraping_spark.operators.dedup import minhash_candidate_pairs

    cand = minhash_candidate_pairs(docs, "text", "doc_id", shingle_n=3)
    q = pair_quality(cand, jaccard_truth)
    # banding theory at J=0.8 (16 bands x 4 rows): P(candidate) =
    # 1-(1-0.8^4)^16 ~ 0.9998; measured r5 on sf0.001: P=1.0, R=1.0
    assert q["n_truth"] > 0, "fixture has no near-dups; gate is vacuous"
    assert q["recall"] >= 0.95, q
    assert q["precision"] >= 0.80, q


def test_simhash_candidates_quality(docs, jaccard_truth):
    from etl_tiki_webscraping_spark.operators.dedup import simhash_candidate_pairs

    cand = simhash_candidate_pairs(docs, "text", "doc_id", max_hamming=3).select(
        "id_a", "id_b"
    )
    q = pair_quality(cand, jaccard_truth)
    # hamming<=3 on 64-bit simhash is a TIGHTER similarity than J>=0.8,
    # so recall against the J-truth is structurally below MinHash's;
    # measured r5 on sf0.001: P=0.909, R=0.714
    assert q["recall"] >= 0.5, q
    assert q["precision"] >= 0.7, q


def test_bucket_cap_does_not_change_recall_on_normal_corpus(docs, jaccard_truth):
    """VERDICT r3 ask #8: the hot-bucket cap (default 1024) must be a
    no-op on a NON-adversarial corpus — identical candidate recall with
    the cap on vs off, not merely identical row counts."""
    from etl_tiki_webscraping_spark.operators.dedup import minhash_candidate_pairs

    capped = minhash_candidate_pairs(docs, "text", "doc_id", shingle_n=3, bucket_cap=1024)
    uncapped = minhash_candidate_pairs(docs, "text", "doc_id", shingle_n=3, bucket_cap=None)
    q_c = pair_quality(capped, jaccard_truth)
    q_u = pair_quality(uncapped, jaccard_truth)
    assert q_c["recall"] == q_u["recall"], (q_c, q_u)
    # stronger: the candidate SETS are identical, not just their recall
    assert q_c["n_candidates"] == q_u["n_candidates"]
    assert capped.exceptAll(uncapped).count() == 0


def test_crosscorpus_candidates_quality(spark, docs, jaccard_truth):
    """Cross-corpus LSH recall gate: splitting the corpus into old/new
    (the incremental-crawl shape) must find every true J>=0.8 pair that
    CROSSES the split — same banding theory as the self-join, so the
    same ~0.9998 per-pair probability applies."""
    from pyspark.sql import functions as F

    from etl_tiki_webscraping_spark.operators.dedup import minhash_candidate_pairs_cross

    bk = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("bigint")
        % 100
    )
    old = docs.filter(bk < 70)
    new = docs.filter(bk >= 70)
    cand = minhash_candidate_pairs_cross(new, old, "text", "doc_id", shingle_n=3)

    old_ids = {r["doc_id"] for r in old.select("doc_id").collect()}
    truth_cross = {
        (a, b)
        for a, b in (
            (r["id_a"], r["id_b"]) for r in jaccard_truth.select("id_a", "id_b").collect()
        )
        if (a in old_ids) != (b in old_ids)  # pair crosses the split
    }
    got = {
        tuple(sorted((r["new_id"], r["old_id"])))
        for r in cand.collect()
    }
    missed = {tuple(sorted(p)) for p in truth_cross} - got
    assert truth_cross, "no cross-split near-dups in fixture; gate is vacuous"
    assert not missed, f"cross-corpus LSH missed true pairs: {missed}"


def test_pq_adc_recall_on_clustered_data(spark, clustered):
    from etl_tiki_webscraping_spark.operators.similarity import (
        pq_encode,
        pq_refine,
        pq_topk,
        pq_train_codebooks,
    )

    exact = _exact_topk(clustered)
    qs = _queries_of(clustered)
    books = pq_train_codebooks(clustered, m=8, k=16, max_iter=5)
    codes = pq_encode(clustered, books)
    # ADC alone ranks at quantization-cell resolution — near-identical
    # within-cluster neighbors are indistinguishable to it — so the
    # pipeline is shortlist (5k) + exact refine, like FAISS
    approx = pq_refine(pq_topk(codes, books, qs, k=50), clustered, qs, k=10)
    row = topk_recall_summary(approx, exact, "pq").collect()[0]
    assert row["mean_recall"] >= 0.9, row
    assert row["n_queries"] == 5


class TestLinearModelScore:
    def test_matches_python_sigmoid_exactly(self, spark):
        import math

        from etl_tiki_webscraping_spark.quality.scoring import (
            _sigmoid_py,
            linear_model_score,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(1, 2.0, 0.1), (2, -3.0, 0.9), (3, 0.0, 0.5), (4, 800.0, 0.0)],
            "id int, a double, b double",
        )
        score = linear_model_score(
            {"a": F.col("a"), "b": F.col("b")},
            weights={"a": 0.5, "b": -1.5},
            bias=0.25,
        )
        got = {r.id: r.s for r in df.select("id", score.alias("s")).collect()}
        for id_, a, b in [(1, 2.0, 0.1), (2, -3.0, 0.9), (3, 0.0, 0.5), (4, 800.0, 0.0)]:
            z = 0.25 + 0.5 * a - 1.5 * b
            assert got[id_] == _sigmoid_py(z), (id_, got[id_])
        # z=400: naive 1/(1+exp(-z)) is fine but exp(z) would overflow;
        # the stable form returns exactly 1.0, not inf/nan
        assert got[4] == 1.0 and not math.isnan(got[4])

    def test_unknown_weight_raises(self, spark):
        import pytest

        from etl_tiki_webscraping_spark.quality.scoring import (
            linear_model_score,
        )
        from pyspark.sql import functions as F

        with pytest.raises(ValueError, match="unknown features"):
            linear_model_score({"a": F.col("a")}, weights={"a": 1.0, "zz": 2.0})

    def test_banding_routes_by_descending_thresholds(self, spark):
        import pytest

        from etl_tiki_webscraping_spark.quality.scoring import score_and_band
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(1, 0.9), (2, 0.75), (3, 0.6), (4, 0.1)], "id int, s double"
        )
        got = {
            r.id: r.band
            for r in score_and_band(df, F.col("s"), [0.75, 0.5]).collect()
        }
        assert got == {1: 0, 2: 0, 3: 1, 4: 2}  # >= is inclusive
        with pytest.raises(ValueError, match="descending"):
            score_and_band(df, F.col("s"), [0.5, 0.75])


class TestLaplaceNoisyCounts:
    def test_noise_is_laplace_shaped_and_deterministic(self, spark):
        import math

        from etl_tiki_webscraping_spark.quality.scoring import (
            laplace_noisy_counts,
        )

        rows = [(f"g{i % 40}",) for i in range(400)]
        df = spark.createDataFrame(rows, "g string")
        r1 = {r.g: r.noisy_count
              for r in laplace_noisy_counts(df, ["g"], 0.5).collect()}
        r2 = {r.g: r.noisy_count
              for r in laplace_noisy_counts(
                  df.repartition(7), ["g"], 0.5).collect()}
        assert r1 == r2  # deterministic across partitionings
        # every group has 10 rows; noise = noisy - 10.  b = 2 ->
        # median |noise| should be ~ 2*ln(2) = 1.386; check the
        # empirical median is in a generous band and signs occur both
        # ways (the draw is fixed, so this is a regression pin)
        noises = sorted(v - 10.0 for v in r1.values())
        absmed = sorted(abs(x) for x in noises)[len(noises) // 2]
        assert 0.4 < absmed < 4.0
        assert any(x < 0 for x in noises) and any(x > 0 for x in noises)
        assert all(math.isfinite(x) for x in noises)

    def test_epsilon_validation_and_scale(self, spark):
        import pytest

        from etl_tiki_webscraping_spark.quality.scoring import (
            laplace_noisy_counts,
        )

        df = spark.createDataFrame([("a",)], "g string")
        with pytest.raises(ValueError, match="epsilon"):
            laplace_noisy_counts(df, ["g"], 0.0)
        # smaller epsilon -> strictly larger noise magnitude for the
        # same group (same u, scale multiplies)
        n1 = laplace_noisy_counts(df, ["g"], 1.0).collect()[0].noisy_count
        n01 = laplace_noisy_counts(df, ["g"], 0.1).collect()[0].noisy_count
        assert abs(n01 - 1.0) > abs(n1 - 1.0)


def test_laplace_draw_is_strictly_interior(spark):
    """The uniform uses a half-offset so both tails stay open: even
    the extreme 32-bit hash values cannot reach u in {0, 1} where the
    inverse CDF is infinite.  Pin the arithmetic directly."""
    lo = (0 + 0.5) / 4294967296.0
    hi = (4294967295 + 0.5) / 4294967296.0
    assert 0.0 < lo and hi < 1.0
    import math

    for u in (lo, hi):
        assert math.isfinite(math.log(1 - 2 * abs(u - 0.5)))
