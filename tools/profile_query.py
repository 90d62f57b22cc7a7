"""Per-query isolation profiler for the optimization rounds.

Runs the named catalog queries EXACTLY as bench.py does (same action:
collect / count / hash-fold), isolated (fresh lineage per run, cache
cleared between runs), N repeats, and prints per-run wall seconds plus
the converged (min) time.  Optionally saves .explain("formatted") to
plans/<tag>/<query>_<suffix>.txt so plan claims are auditable without
running Spark.

Usage:
  python tools/profile_query.py [--sf DIR] [--n N] [--plans TAG:SUFFIX] \
      [--jobs] query [query ...]

--jobs additionally prints the Spark job/stage breakdown (job
description, duration, #stages) recorded by a status listener, which
attributes wall time to jobs without the UI.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def run_action(df, action: str) -> None:
    if action == "collect":
        df.collect()
    elif action == "hash":
        df.select(F.xxhash64(*df.columns).alias("h")).agg(
            F.expr("bit_xor(h)")
        ).collect()
    else:
        df.count()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="TAG:SUFFIX -> save explain to plans/TAG/<q>_SUFFIX.txt")
    ap.add_argument("--jobs", action="store_true")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from bench import HEADLINE
    from etl_tiki_webscraping_spark.plans.catalog import (
        QUERIES,
        prepare_fixtures,
    )
    from etl_tiki_webscraping_spark.session import get_spark

    actions = dict(HEADLINE)
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up bench.py does, so run 1 is comparable to a bench slot
    spark.range(1000).selectExpr("sum(id)").collect()

    def _warm_kernel(s):
        import numpy as np  # noqa: F401

        return s

    _warm = F.pandas_udf(_warm_kernel, "long")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(10_000).repartition(cpus).select(_warm("id")).count()
    prepare_fixtures(spark, args.sf)

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    for name in args.queries:
        action = actions.get(name, "count")
        fn = QUERIES[name].fn
        times = []
        for i in range(args.n):
            jobs_before = set(tracker.getJobIdsForGroup(None) or [])
            sc.setJobDescription(f"profile:{name}#{i}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            run_action(df, action)
            dt = time.perf_counter() - t0
            sc.setJobDescription(None)
            times.append(round(dt, 3))
            if args.jobs and i == args.n - 1:
                jobs_after = tracker.getJobIdsForGroup(None) or []
                new = sorted(set(jobs_after) - jobs_before)
                print(f"  jobs in last run: {len(new)}")
            spark.catalog.clearCache()
        print(f"{name}: action={action} runs={times} min={min(times)}")
        if args.plans:
            tag, suffix = args.plans.split(":", 1)
            outdir = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "plans", tag)
            os.makedirs(outdir, exist_ok=True)
            import contextlib
            import io

            df = QUERIES[name].fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
