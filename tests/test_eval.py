"""quality/eval.py: ROC-AUC (tied-rank Mann-Whitney) and BLEU-2 /
ROUGE-2 overlap eval — hand-computed truths plus a python replay of
the rank arithmetic, the catalog queries' unit-level backing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_tiki_webscraping_spark.quality.eval import overlap_eval, roc_auc_report


def _auc(spark, rows):
    df = spark.createDataFrame(rows, "score double, label int")
    return roc_auc_report(df, "score", "label").collect()[0]


def test_roc_auc_with_ties_hand_computed(spark):
    # ranks: 0.3 -> 1, the tied 0.8s -> 2.5 each, 0.9 -> 4
    # sum of positive ranks = 4 + 2.5 = 6.5; U = 6.5 - 3 = 3.5
    # auc = 3.5 / (2 * 2) = 0.875
    r = _auc(spark, [(0.9, 1), (0.8, 1), (0.8, 0), (0.3, 0)])
    assert (r["n_pos"], r["n_neg"]) == (2, 2)
    assert r["auc"] == pytest.approx(0.875, abs=1e-9)


def test_roc_auc_perfect_random_and_inverted(spark):
    assert _auc(spark, [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)])["auc"] == 1.0
    # all scores identical: every pair is a tie -> 0.5 exactly
    assert _auc(spark, [(0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)])["auc"] == 0.5
    assert _auc(spark, [(0.1, 1), (0.2, 1), (0.8, 0), (0.9, 0)])["auc"] == 0.0


def test_roc_auc_single_class_is_null(spark):
    # one-class input: the Mann-Whitney denominator 2*n_pos*n_neg is 0;
    # try_divide yields NULL (not NaN/Inf), matching the oracle's NULLIF
    r = _auc(spark, [(0.9, 1), (0.8, 1), (0.3, 1)])
    assert (r["n_pos"], r["n_neg"]) == (3, 0)
    assert r["auc"] is None
    r = _auc(spark, [(0.9, 0), (0.3, 0)])
    assert (r["n_pos"], r["n_neg"]) == (0, 2)
    assert r["auc"] is None


def test_roc_auc_null_rows_excluded(spark):
    r = _auc(
        spark,
        [(0.9, 1), (0.1, 0), (None, 1), (0.5, None)],
    )
    assert (r["n_pos"], r["n_neg"], r["auc"]) == (1, 1, 1.0)


def test_roc_auc_python_replay(spark):
    # deterministic scores with deliberate tie collisions
    rows = [
        (round((i * 7 % 13) / 13.0, 6), 1 if (i * 5 % 11) > 5 else 0)
        for i in range(200)
    ]
    got = _auc(spark, rows)
    # replay: average ranks over sorted scores
    from collections import Counter

    cnt = Counter(s for s, _ in rows)
    below, avg_rank = 0, {}
    for s in sorted(cnt):
        avg_rank[s] = below + (cnt[s] + 1) / 2.0
        below += cnt[s]
    n_pos = sum(l for _, l in rows)
    n_neg = len(rows) - n_pos
    u = sum(avg_rank[s] for s, l in rows if l) - n_pos * (n_pos + 1) / 2.0
    assert got["auc"] == pytest.approx(round(u / (n_pos * n_neg), 6), abs=1e-9)
    assert (got["n_pos"], got["n_neg"]) == (n_pos, n_neg)


def _conf(spark, rows, alphas):
    from etl_tiki_webscraping_spark.quality.eval import conformal_coverage_report

    df = spark.createDataFrame(rows, "score double, is_cal boolean")
    out = conformal_coverage_report(df, "score", "is_cal", alphas).collect()
    return {round(r["alpha"], 6): r for r in out}


def test_conformal_threshold_order_statistic(spark):
    # calibration nonconformities 0.1..1.0 (n_cal = 10):
    #   alpha 0.1: k = ceil(11 * 0.9)  = 10 -> qhat = 10th smallest = 1.0
    #   alpha 0.5: k = ceil(11 * 0.5)  = 6  -> qhat = 0.6
    cal = [(round(1.0 - i / 10.0, 6), True) for i in range(1, 11)]
    test = [(0.75, False), (0.25, False)]  # nc 0.25 and 0.75
    got = _conf(spark, cal + test, (0.1, 0.5))
    assert got[0.1]["n_cal"] == 10 and got[0.1]["n_test"] == 2
    assert got[0.1]["qhat"] == pytest.approx(1.0, abs=1e-9)
    assert got[0.1]["coverage"] == 1.0  # both test ncs <= 1.0
    assert got[0.5]["qhat"] == pytest.approx(0.6, abs=1e-9)
    assert got[0.5]["coverage"] == 0.5  # only nc=0.25 conforms


def test_conformal_degenerate_alpha_full_coverage(spark):
    # k = ceil(4 * 0.9999) = 4 > n_cal = 3: no threshold -> coverage 1.0
    rows = [(0.9, True), (0.8, True), (0.7, True), (0.1, False)]
    got = _conf(spark, rows, (0.0001,))
    assert got[0.0001]["qhat"] is None
    assert got[0.0001]["coverage"] == 1.0


def test_conformal_zero_coverage(spark):
    # threshold below every test nonconformity -> coverage 0.0
    rows = [(0.99, True), (0.98, True), (0.97, True), (0.96, True),
            (0.95, True), (0.94, True), (0.93, True), (0.92, True),
            (0.91, True), (0.90, True),
            (0.05, False), (0.10, False)]
    got = _conf(spark, rows, (0.5,))
    # cal ncs are 0.01..0.10; k = ceil(11*0.5) = 6 -> qhat ~= 0.06
    assert got[0.5]["qhat"] == pytest.approx(0.06, abs=1e-9)
    assert got[0.5]["coverage"] == 0.0


def _eval_pairs(spark, rows):
    df = spark.createDataFrame(rows, "pair_id long, cand string, ref string")
    out = overlap_eval(df, "pair_id", "cand", "ref").collect()
    return {r["pair_id"]: r for r in out}


def test_overlap_eval_identical_pair_is_perfect(spark):
    r = _eval_pairs(spark, [(1, "the cat sat", "the cat sat")])[1]
    assert r["bleu2"] == 1.0
    assert r["rouge2_recall"] == 1.0 and r["rouge2_f1"] == 1.0
    assert r["cand_tokens"] == 3 and r["ref_tokens"] == 3


def test_overlap_eval_hand_computed_partial(spark):
    # cand "the cat the cat" vs ref "the cat sat":
    #   p1 = (min(2,1)+min(2,1)) / 4 = 0.5
    #   cand bigrams {the cat:2, cat the:1}, ref {the cat:1, cat sat:1}
    #   clip2 = 1, p2 = 1/3; bp = 1 (cand longer)
    #   bleu2 = sqrt(0.5 * 1/3) = sqrt(1/6)
    #   rouge2: P = 1/3, R = 1/2, F1 = 2PR/(P+R) = 0.4
    r = _eval_pairs(spark, [(1, "the cat the cat", "the cat sat")])[1]
    assert r["bleu2"] == pytest.approx(round(math.sqrt(1 / 6), 6), abs=1e-9)
    assert r["rouge2_recall"] == 0.5
    assert r["rouge2_f1"] == pytest.approx(0.4, abs=1e-9)


def test_overlap_eval_brevity_penalty(spark):
    # cand "the cat" (2 tokens) vs ref "the cat sat" (3): p1 = 1, p2 = 1
    # bp = exp(1 - 3/2); bleu2 = bp
    r = _eval_pairs(spark, [(1, "the cat", "the cat sat")])[1]
    assert r["bleu2"] == pytest.approx(round(math.exp(1 - 3 / 2), 6), abs=1e-9)


def test_overlap_eval_single_token_sides(spark):
    # no bigrams anywhere: bleu2 hard-zeroes, rouge2 undefined -> NULL
    r = _eval_pairs(spark, [(1, "hello", "hello")])[1]
    assert r["bleu2"] == 0.0
    assert r["rouge2_recall"] is None and r["rouge2_f1"] is None


def test_overlap_eval_empty_side_excluded(spark):
    out = _eval_pairs(spark, [(1, "   ", "the cat"), (2, "the cat", "the cat")])
    assert set(out) == {2}


def test_overlap_eval_disjoint_texts_zero(spark):
    r = _eval_pairs(spark, [(1, "aa bb cc", "xx yy zz")])[1]
    assert r["bleu2"] == 0.0
    assert r["rouge2_recall"] == 0.0 and r["rouge2_f1"] == 0.0
