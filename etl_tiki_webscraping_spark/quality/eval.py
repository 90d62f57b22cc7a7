"""Model/generation evaluation metrics over the corpus, Spark-first
and SQL-replayable.

- :func:`roc_auc_report` — ROC AUC of a score column against a binary
  label via the tied-rank Mann-Whitney statistic.  The score table
  aggregates to |distinct scores| rows FIRST (scores are 6dp-quantized
  upstream, so the domain is bounded by ~2e6 values regardless of raw
  row count), then one bounded single-partition running-sum window
  ranks the groups — the same shape a 100 TB AUC needs: the raw scan
  partial-aggregates map-side and only the tiny (score, cnt, pos)
  table crosses an exchange.  All rank arithmetic stays integer
  (2*avg_rank = 2*below + cnt + 1) until the final division, so an
  external SQL engine replays the AUC bit-for-bit.

- :func:`overlap_eval` — BLEU-2 and ROUGE-2 per (candidate,
  reference) pair: clipped modified n-gram precisions from one tagged
  explode + map-side-combined groupBy (exchange rows bounded by
  distinct grams per pair, no gram wider than a bigram), brevity
  penalty, and BLEU-2 as bp * sqrt(p1*p2) — the 2-gram geometric mean
  needs no exp/ln except the one brevity-penalty exp (rounded to 6dp,
  the quality_model_score sigmoid precedent).

The reference repo has no model-eval surface (it is a scraper DAG,
dags/etl.py); these extend the LLM-pipeline tier the same way
retrieval_quality_metrics / model_calibration_bins do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_tiki_webscraping_spark.operators.decontaminate import ngrams_of_tokens


def roc_auc_report(
    scored: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """One-row (n_pos, n_neg, auc) report.

    AUC = P(score_pos > score_neg) + 0.5 * P(tie), computed exactly as
    the normalized Mann-Whitney U from average ranks: per distinct
    score, the tied group's doubled average rank is the integer
    ``2*below + cnt + 1``; positives contribute ``pos * that``; then
    ``auc = (sum_pos_rank2 - n_pos*(n_pos+1)) / (2*n_pos*n_neg)``.
    Integer-exact until the one final division (DECIMAL(38,0) sums so
    ANSI mode never overflows), rounded to 6dp — bit-replayable in SQL.
    NULL scores/labels are excluded (unscorable rows are not ranked).
    """
    g = (
        scored.filter(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())
        .groupBy(F.col(score_col).alias("s"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col(label_col).cast("long")).alias("pos"),
        )
    )
    # bounded window: |distinct 6dp scores| rows, never the raw table
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    r = g.withColumn("below", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
    dec = "decimal(38,0)"
    a = r.agg(
        F.sum(
            F.col("pos").cast(dec)
            * (2 * F.col("below") + F.col("cnt") + 1).cast(dec)
        ).alias("pos_rank2"),
        F.sum("pos").cast(dec).alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos")).cast(dec).alias("n_neg"),
    )
    return a.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        # try_divide (the cosine() convention): a single-class input
        # (n_pos or n_neg = 0) yields a NULL auc instead of NaN/Inf,
        # cross-engine stable with the oracle's NULLIF denominator
        F.round(
            F.try_divide(
                (F.col("pos_rank2") - F.col("n_pos") * (F.col("n_pos") + 1))
                .cast("double"),
                F.lit(2.0)
                * F.col("n_pos").cast("double")
                * F.col("n_neg").cast("double"),
            ),
            6,
        ).alias("auc"),
    )


def conformal_coverage_report(
    scored: DataFrame,
    score_col: str,
    calib_col: str,
    alphas: "tuple[float, ...]" = (0.1, 0.05),
) -> DataFrame:
    """Split-conformal calibration audit: one row per ``alpha`` with
    the conformal threshold and its measured test coverage.

    Split conformal prediction (Vovk et al.; Angelopoulos & Bates 2021
    tutorial): on a held-out CALIBRATION split, take the
    ``k = ceil((n_cal + 1) * (1 - alpha))``-th smallest nonconformity
    score (here ``1 - score``); predicting "conforming" for every test
    row with nonconformity <= that threshold guarantees >= 1 - alpha
    marginal coverage.  The report MEASURES that coverage on the test
    split — the distribution-free cousin of the reliability-diagram
    audit (model_calibration_bins).

    Scale shape: the same bounded-domain trick as
    :func:`roc_auc_report` — both splits partial-aggregate map-side to
    |distinct 6dp scores| tables, running-count windows rank those
    bounded tables, and the <= |alphas| threshold rows broadcast onto
    the test cumulative table.  Exact order statistics, no sampling;
    a 100 TB audit costs one scan per split.  ``k > n_cal`` (alpha too
    small for the split) yields a NULL threshold and coverage 1.0 —
    the conformal "predict everything" degenerate case, mirrored in
    SQL.  All comparisons happen on the 6dp-quantized score, so the
    thresholds and coverages replay bit-for-bit.
    """
    nonconf = (F.lit(1.0) - F.col(score_col)).alias("nc")
    base = scored.filter(F.col(score_col).isNotNull()).select(
        nonconf, F.col(calib_col).cast("boolean").alias("is_cal")
    )

    def cum_table(df: DataFrame) -> DataFrame:
        g = df.groupBy("nc").agg(F.count(F.lit(1)).alias("cnt"))
        w = Window.orderBy("nc").rowsBetween(Window.unboundedPreceding, 0)
        return g.withColumn("cum", F.sum("cnt").over(w))

    cal = cum_table(base.filter(F.col("is_cal"))).withColumn(
        "n_cal", F.max("cum").over(Window.partitionBy())
    )
    test = cum_table(base.filter(~F.col("is_cal"))).withColumn(
        "n_test", F.max("cum").over(Window.partitionBy())
    )
    spark = scored.sparkSession
    al = spark.createDataFrame([(float(a),) for a in alphas], "alpha double")
    # threshold per alpha: smallest nc whose cumulative calibration
    # count reaches k (NULL when k > n_cal — degenerate full coverage)
    k_expr = F.ceil((F.col("n_cal") + 1) * (F.lit(1.0) - F.col("alpha")))
    qhat = (
        al.crossJoin(cal)
        .withColumn("k", k_expr)
        .groupBy("alpha")
        .agg(
            F.min(F.when(F.col("cum") >= F.col("k"), F.col("nc"))).alias("qhat"),
            F.max("n_cal").alias("n_cal"),
        )
    )
    # coverage per alpha: largest test-cum at nc <= qhat, over n_test
    # (cross of <= |alphas| threshold rows x the bounded test table)
    cov = (
        qhat.crossJoin(test)
        .groupBy("alpha", "n_cal", "qhat")
        .agg(
            F.max(
                F.when(F.col("nc") <= F.col("qhat"), F.col("cum"))
            ).alias("cov_cnt"),
            F.max("n_test").alias("n_test"),
        )
    )
    return cov.select(
        "alpha", "n_cal", "n_test", "qhat",
        F.when(F.col("qhat").isNull(), F.lit(1.0))
        .otherwise(
            F.round(
                F.coalesce(F.col("cov_cnt"), F.lit(0)).cast("double")
                / F.col("n_test").cast("double"),
                6,
            )
        )
        .alias("coverage"),
    )


def _nonempty_tokens(col: Column) -> Column:
    """Lowercased whitespace tokens with empties dropped — the corpus
    tokenization convention (tfidf_top_terms / bpe_encode oracles)."""
    return F.filter(
        F.split(F.lower(F.trim(col)), "[ \t\n\f\r]+"), lambda t: t != ""
    )


def overlap_eval(
    pairs: DataFrame,
    pair_id_col: str,
    cand_col: str,
    ref_col: str,
) -> DataFrame:
    """Per-pair generation-overlap metrics: BLEU-2 (clipped modified
    1/2-gram precisions, brevity penalty) and ROUGE-2 recall / F1.

    Shape: each side explodes ONCE into (pair, side, n, gram) rows —
    grams are at most bigrams, so no exchange carries text wider than
    two tokens — then two map-side-combined groupBys fold to per-pair
    counters.  Pairs where either side has zero tokens are excluded
    (no candidate or no reference = nothing to score); ROUGE-2 columns
    are NULL when the respective side has no bigrams (single-token
    text), mirrored exactly by the SQL oracle.
    """
    base = pairs.select(
        F.col(pair_id_col).alias("pair_id"),
        _nonempty_tokens(F.col(cand_col)).alias("tc"),
        _nonempty_tokens(F.col(ref_col)).alias("tr"),
    ).filter((F.size("tc") > 0) & (F.size("tr") > 0))

    def side_grams(tok: str, side: str) -> DataFrame:
        arr = F.flatten(
            F.array(
                F.transform(
                    ngrams_of_tokens(F.col(tok), 1),
                    lambda g: F.struct(F.lit(1).alias("n"), g.alias("gram")),
                ),
                F.transform(
                    ngrams_of_tokens(F.col(tok), 2),
                    lambda g: F.struct(F.lit(2).alias("n"), g.alias("gram")),
                ),
            )
        )
        return base.select(
            "pair_id", F.lit(side).alias("side"), F.explode(arr).alias("g")
        ).select(
            "pair_id", "side", F.col("g.n").alias("n"), F.col("g.gram").alias("gram")
        )

    counts = (
        side_grams("tc", "c")
        .unionByName(side_grams("tr", "r"))
        .groupBy("pair_id", "n", "gram")
        .agg(
            F.sum(F.when(F.col("side") == "c", 1).otherwise(0)).alias("c_cnt"),
            F.sum(F.when(F.col("side") == "r", 1).otherwise(0)).alias("r_cnt"),
        )
    )
    per_n = counts.groupBy("pair_id", "n").agg(
        F.sum(F.least("c_cnt", "r_cnt")).alias("clip"),
        F.sum("c_cnt").alias("c_tot"),
        F.sum("r_cnt").alias("r_tot"),
    )
    m = per_n.groupBy("pair_id").agg(
        F.max(F.when(F.col("n") == 1, F.col("clip"))).alias("clip1"),
        F.max(F.when(F.col("n") == 1, F.col("c_tot"))).alias("c_tot1"),
        F.max(F.when(F.col("n") == 1, F.col("r_tot"))).alias("r_tot1"),
        F.coalesce(F.max(F.when(F.col("n") == 2, F.col("clip"))), F.lit(0)).alias("clip2"),
        F.coalesce(F.max(F.when(F.col("n") == 2, F.col("c_tot"))), F.lit(0)).alias("c_tot2"),
        F.coalesce(F.max(F.when(F.col("n") == 2, F.col("r_tot"))), F.lit(0)).alias("r_tot2"),
    )
    p1 = F.col("clip1").cast("double") / F.col("c_tot1").cast("double")
    p2 = F.try_divide(F.col("clip2").cast("double"), F.col("c_tot2").cast("double"))
    bp = F.when(F.col("c_tot1") > F.col("r_tot1"), F.lit(1.0)).otherwise(
        F.exp(F.lit(1.0) - F.col("r_tot1").cast("double") / F.col("c_tot1").cast("double"))
    )
    r2p = F.try_divide(F.col("clip2").cast("double"), F.col("c_tot2").cast("double"))
    r2r = F.try_divide(F.col("clip2").cast("double"), F.col("r_tot2").cast("double"))
    return m.select(
        "pair_id",
        F.col("c_tot1").alias("cand_tokens"),
        F.col("r_tot1").alias("ref_tokens"),
        F.when(
            (F.col("clip1") > 0) & (F.col("clip2") > 0),
            F.round(bp * F.sqrt(p1 * p2), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("bleu2"),
        F.round(r2r, 6).alias("rouge2_recall"),
        F.when(
            r2p.isNotNull() & r2r.isNotNull(),
            F.when(r2p + r2r > 0, F.round(F.lit(2.0) * r2p * r2r / (r2p + r2r), 6)).otherwise(
                F.lit(0.0)
            ),
        ).alias("rouge2_f1"),
    )
