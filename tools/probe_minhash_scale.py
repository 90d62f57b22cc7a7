"""Stage-decomposition probe for the dedup_minhash_lsh scaling wall
(round-11 VERDICT ask #2): 345 s at the 100x synthesis vs 7.6 s at 10x
is 4.5x superlinear for the final decade, and the bench entry doesn't
say WHICH stage bends.

The query touches only ``documents``, so the probe synthesizes a
documents-only scaled dir (same replica token-salting as
tools/bench_sf1.py — per-replica duplicate density stays exactly the
fixture's) and times each pipeline stage to a count() barrier:

  1. sig      — Arrow minhash_analysis kernel, persisted
  2. buckets  — band explode + hot-bucket cap
  3. cand     — bucket self-join + pair DISTINCT
  4. edges    — exact-Jaccard verification joins
  5. final    — anti-join back onto documents

Also records bucket-fatness diagnostics (sum |b|^2 drives the
self-join) and the physical join strategy actually chosen at each
scale (the sf10 probe lesson: Catalyst is blind to mapInPandas
fan-out and may broadcast an exploded table it thinks is small).

    python tools/probe_minhash_scale.py 10 100      # replica counts
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SRC_SF = "/root/testdata/sf0.1"


def build_docs_only(spark, replicas: int) -> str:
    from pyspark.sql import functions as F

    out_dir = f"/tmp/spark-graft-mh-{replicas}x"
    marker = os.path.join(out_dir, "_OK")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    docs = spark.read.parquet(os.path.join(SRC_SF, "documents.parquet"))
    parts = []
    for i in range(replicas):
        salted = F.array_join(
            F.transform(
                F.split(F.col("text"), " "), lambda w: F.concat(w, F.lit(str(i)))
            ),
            " ",
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
                F.when(F.col("text").isNotNull(), salted).alias("text"),
                "lang",
                "source",
            ).withColumn("n_chars", F.length(F.coalesce("text", F.lit(""))))
        )
    scaled = parts[0]
    for p in parts[1:]:
        scaled = scaled.unionByName(p)
    scaled.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    for fname in os.listdir(SRC_SF):
        if fname.endswith(".parquet") and fname != "documents.parquet":
            dst = os.path.join(out_dir, fname)
            if not os.path.exists(dst):
                os.symlink(os.path.join(SRC_SF, fname), dst)
    with open(marker, "w") as fh:
        fh.write("ok")
    return out_dir


def probe(spark, sf_dir: str) -> dict:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from etl_tiki_webscraping_spark.io import load_table
    from etl_tiki_webscraping_spark.operators.dedup import (
        _band_buckets,
        cap_bucket_membership,
        minhash_analysis,
    )

    docs = load_table(spark, sf_dir, "documents")
    t = {}

    t0 = time.perf_counter()
    analysis = minhash_analysis(docs, "text", "doc_id", 64, 3).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n_docs = analysis.count()
    t["sig"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    buckets = analysis.select(
        "id", F.explode(_band_buckets(F.col("sig"), 16, 4)).alias("bb")
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    capped = cap_bucket_membership(buckets, ["band", "bucket"], 1024).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n_bucket_rows = capped.count()
    t["buckets"] = round(time.perf_counter() - t0, 2)

    # bucket fatness: the self-join's real cost axis
    fat = (
        capped.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
            F.max("c").alias("max_c"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
        .first()
    )

    t0 = time.perf_counter()
    cand = (
        capped.alias("l")
        .join(capped.alias("r"), on=["band", "bucket"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    join_plan = cand._jdf.queryExecution().executedPlan().toString()
    strategy = [
        ln.strip()
        for ln in join_plan.splitlines()
        if "Join" in ln and ("Broadcast" in ln or "SortMerge" in ln or "ShuffledHash" in ln)
    ]
    n_cand = cand.count()
    t["cand"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    hs = analysis.select("id", "hset")
    edges = (
        cand.join(hs.withColumnRenamed("id", "id_a").withColumnRenamed("hset", "h_a"), on="id_a")
        .join(hs.withColumnRenamed("id", "id_b").withColumnRenamed("hset", "h_b"), on="id_b")
        .filter(
            F.size(F.array_intersect("h_a", "h_b")).cast("double")
            / F.size(F.array_union("h_a", "h_b")).cast("double")
            >= 0.8
        )
        .select("id_a", "id_b")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_edges = edges.count()
    t["edges"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    dups = edges.select(F.col("id_b").alias("doc_id")).distinct()
    n_final = docs.join(dups, on="doc_id", how="left_anti").count()
    t["final"] = round(time.perf_counter() - t0, 2)

    for df in (analysis, capped, cand, edges):
        df.unpersist()
    return {
        "timings": t,
        "total": round(sum(t.values()), 2),
        "n_docs": n_docs,
        "n_bucket_rows": n_bucket_rows,
        "n_buckets": fat["n_buckets"],
        "sum_bucket_sq": int(fat["sum_sq"]),
        "max_bucket": int(fat["max_c"]),
        "n_cand": n_cand,
        "n_edges": n_edges,
        "n_final": n_final,
        "join_strategy": strategy[:3],
    }


def main() -> None:
    from etl_tiki_webscraping_spark.session import get_spark

    replicas = [int(a) for a in sys.argv[1:]] or [10, 100]
    spark = get_spark("probe-minhash-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    out = {}
    for rep in replicas:
        t0 = time.perf_counter()
        sf_dir = build_docs_only(spark, rep)
        build_s = round(time.perf_counter() - t0, 1)
        res = probe(spark, sf_dir)
        res["build_s"] = build_s
        out[f"{rep}x"] = res
        print(json.dumps({f"{rep}x": res}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
