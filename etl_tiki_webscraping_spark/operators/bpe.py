"""Distributed BPE merge training (Sennrich et al. 2016): learn the
byte-pair-encoding merge table from a corpus — the tokenizer-training
step of an LLM data pipeline, expressed as a bounded iterative
DataFrame algorithm.

Scale shape (the part that matters at 100 TB): training runs on the
WORD VOCABULARY (distinct words + counts), never the corpus — the
corpus is scanned ONCE to build the vocab, and every merge iteration
is one explode + groupBy over vocab-sized rows plus a single-row
argmax collect (the chosen pair — a scalar, like PageRank's dangling
mass).  Applying a merge rewrites the symbol arrays with a pure
JVM-side fold (F.aggregate), and the vocab localCheckpoints per
iteration so lineage stays O(1) like operators/graph.py::pagerank.
Iteration count bounds driver-side work; vocab size bounds executor
work; corpus size only ever affects the initial scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_tiki_webscraping_spark.functions.text import tokenize_ws


def build_word_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, count) over the lowercased corpus — the ONE corpus-sized
    pass; everything after runs on this bounded table."""
    return (
        docs.select(
            F.explode(tokenize_ws(F.lower(F.col(text_col)))).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _apply_merge(symbols, left: str, right: str):
    """Fold the symbol array, merging every non-overlapping adjacent
    (left, right) occurrence left-to-right — the exact greedy
    application order reference BPE uses."""
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            # try_element_at: ANSI element_at throws on the empty
            # accumulator; NULL == left is NULL -> falls to otherwise
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    vocab: DataFrame, num_merges: int, min_pair_count: int = 2
) -> list[tuple[int, str, str]]:
    """Learn ``num_merges`` BPE merges from a (word, cnt) vocabulary.
    Returns [(rank, left, right)] in learned order; stops early when
    no pair reaches ``min_pair_count``.  Ties break on
    (count DESC, left ASC, right ASC) — fully deterministic, matching
    the single-node reference in tests/test_bpe.py.
    """
    spark = vocab.sparkSession
    syms = vocab.select(
        "cnt",
        F.split(F.col("word"), "").alias("symbols"),
    ).localCheckpoint()  # reused every iteration; computed once

    merges: list[tuple[int, str, str]] = []
    for rank in range(num_merges):
        pairs = (
            syms.filter(F.size("symbols") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("symbols") - 1),
                        lambda i: F.struct(
                            F.element_at("symbols", i).alias("l"),
                            F.element_at("symbols", i + 1).alias("r"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("n"))
        )
        best = pairs.orderBy(
            F.col("n").desc(), F.col("l").asc(), F.col("r").asc()
        ).limit(1).collect()  # ONE row — the argmax scalar, never the table
        if not best or best[0]["n"] < min_pair_count:
            break
        left, right = best[0]["l"], best[0]["r"]
        merges.append((rank, left, right))
        # rewrite + checkpoint: bounded lineage, one job per merge
        syms = syms.select(
            "cnt", _apply_merge(F.col("symbols"), left, right).alias("symbols")
        ).localCheckpoint()
    return merges


def bpe_train_report(
    spark: SparkSession, docs: DataFrame, text_col: str, num_merges: int
) -> DataFrame:
    """Merge table as a DataFrame: (rank, left, right, merged)."""
    merges = bpe_train(build_word_vocab(docs, text_col), num_merges)
    return spark.createDataFrame(
        [(r, l, rt, l + rt) for r, l, rt in merges],
        "rank int, left string, right string, merged string",
    )
