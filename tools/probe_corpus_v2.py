"""Stage-level probe for corpus_pipeline_v2's recurring in-pass
spikes (VERDICT r14 "what's wrong" #1 / ask #5, the r11 minhash
playbook): reproduce the in-pass context — the heavy headliner block
that precedes it in bench.py's HEADLINE order — then time the query
BY STAGE with GC/heap stamps around each, against a same-session
isolated-converged baseline.

The query has no persist and no Python kernel anywhere in its path
(pure JVM expressions -> one top-k window -> dedup join -> agg), so
the stage timings + GC deltas attribute the spike to either
  (a) JVM residue from predecessors (GC time inflates across ALL
      stages, heap high on entry), or
  (b) one specific stage (a plan/staging problem in that stage).

Usage: python tools/probe_corpus_v2.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

# the heavy block immediately preceding corpus_pipeline_v2 in HEADLINE
_PREDECESSORS = [
    "bpe_train_merges",
    "contamination_new_docs",
    "part_triangles",
    "embedding_dim_stats",
    "weighted_median_price",
    "entity_resolution_clusters",
]


def main() -> None:
    from pyspark.sql import functions as F

    from etl_tiki_webscraping_spark.io import load_table
    from etl_tiki_webscraping_spark.plans.catalog import QUERIES
    from etl_tiki_webscraping_spark.session import get_spark

    spark = get_spark("probe-corpus-v2")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def gc_ms() -> int:
        mf = spark._jvm.java.lang.management.ManagementFactory
        total = 0
        it = mf.getGarbageCollectorMXBeans().iterator()
        while it.hasNext():
            total += it.next().getCollectionTime()
        return int(total)

    def heap_mb() -> int:
        mf = spark._jvm.java.lang.management.ManagementFactory
        return int(mf.getMemoryMXBean().getHeapMemoryUsage().getUsed() >> 20)

    def stages() -> "dict[str, object]":
        """Rebuild the exact q_corpus_pipeline_v2 chain, returning each
        stage boundary as a DataFrame (same operators, same params)."""
        from etl_tiki_webscraping_spark.functions.text import (
            punct_ratio,
            stopword_ratio,
            token_count,
        )
        from etl_tiki_webscraping_spark.operators.dedup import exact_dedup
        from etl_tiki_webscraping_spark.operators.relational import (
            weighted_sample_per_group,
        )
        from etl_tiki_webscraping_spark.quality.scoring import (
            linear_model_score,
        )

        docs = load_table(spark, SF_DIR, "documents")
        score = linear_model_score(
            {
                "punct_ratio": punct_ratio("text"),
                "stopword_ratio": stopword_ratio("text"),
                "log_tokens": F.log(F.lit(1.0) + token_count("text")),
            },
            weights={"log_tokens": 0.55, "punct_ratio": -2.1,
                     "stopword_ratio": 3.0},
            bias=-0.8,
        )
        kept = docs.withColumn("_s", score).filter(F.col("_s") >= 0.5).drop("_s")
        sampled = weighted_sample_per_group(
            kept, group_cols=["lang"], key_col="doc_id",
            weight_col=F.col("n_chars").cast("double"), k=20,
        )
        survivors = exact_dedup(sampled, "text", "doc_id")
        final = survivors.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        return {"score": kept, "sample": sampled, "dedup": survivors,
                "full": final}

    def hash_action(df) -> None:
        df.select(F.xxhash64(*df.columns).alias("h")).agg(
            F.expr("bit_xor(h)")
        ).collect()

    def time_stages(tag: str) -> dict:
        rec: "dict[str, object]" = {"tag": tag, "heap_mb_entry": heap_mb()}
        for name, df in stages().items():
            g0, t0 = gc_ms(), time.perf_counter()
            if name == "full":
                df.collect()
            else:
                hash_action(df)
            rec[name] = round(time.perf_counter() - t0, 3)
            rec[f"{name}_gc_ms"] = gc_ms() - g0
            spark.catalog.clearCache()
        rec["heap_mb_exit"] = heap_mb()
        return rec

    out = {"sf_dir": SF_DIR}
    # isolated baseline, 3 runs (fresh-plan each, cache cleared)
    out["isolated"] = [time_stages(f"isolated{i}") for i in range(3)]
    # recreate the in-pass context: the heavy predecessor block
    pred = {}
    for name in _PREDECESSORS:
        if name not in QUERIES:
            continue
        t0 = time.perf_counter()
        df = QUERIES[name].fn(spark, SF_DIR)
        try:
            hash_action(df)
        except Exception:
            df.count()
        pred[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
    out["predecessors"] = pred
    out["gc_ms_after_predecessors"] = gc_ms()
    # the in-pass measurement, then two repeats (convergence)
    out["in_pass"] = [time_stages(f"inpass{i}") for i in range(3)]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
