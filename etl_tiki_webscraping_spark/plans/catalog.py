"""Query catalog: one named query per operator in SURVEY.md §2 plus the
extension surface, each paired with a DuckDB-runnable ANSI-SQL oracle
where SQL can express it (driver contract, __spark_entry__.py).

Determinism rules used throughout (so order-insensitive value hashes
match across engines):
- SUMs of doubles go through DECIMAL(18,6) (exact, order-independent),
  then cast to double for a stable output schema.
- AVGs are emitted as exact-decimal-sum / count in double division —
  one IEEE op, no accumulation-order dependence.
- Every computed column is aliased identically in Spark and SQL.
- Top-k / limit queries always carry a total tie-break ordering.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_tiki_webscraping_spark.io import load_table
from etl_tiki_webscraping_spark.operators.relational import (
    anti_join,
    dedup_deterministic,
    dedup_first,
    distinct_keys,
    fk_semi_join,
    key_space_union,
    top_k_per_group,
    union_all,
)

SparkQuery = Callable[[SparkSession, str], DataFrame]


def _par_ids(ids: DataFrame) -> DataFrame:
    """Spread a small id table across ``defaultParallelism`` partitions
    before a synthesis/decode Arrow kernel (r16, guide §2.5): the id
    tables these fixtures derive from a single parquet file arrive as
    ONE split, so the per-blob encode/decode kernels otherwise run on
    one core.  The exchange carries BARE IDS only — blobs still never
    cross an exchange (the plan-audited contract).  The partition
    count is EXPLICIT because AQE's byte-based coalescing folds a tiny
    keyless-size exchange back to one partition, which is exactly
    wrong for a compute-bound kernel stage; defaultParallelism scales
    with the cluster.

    Applied SELECTIVELY (r16 measurement): the exchange + extra task
    wave costs ~0.25 s fixed at fixture scale, so only fixtures whose
    serial synthesis/decode kernel measured >= ~1 s keep it (FLAC
    encode+decode 3.2 s -> 0.75 s, full-pixel webp/jpeg/png decodes,
    MP3 frame UDTF); header-triage tiers whose kernel is a cheap
    byte-walk stay on the plain single-split scan."""
    sc = ids.sparkSession.sparkContext
    return ids.repartition(sc.defaultParallelism, *ids.columns[:1])


@dataclass
class QuerySpec:
    fn: SparkQuery
    oracle: str | None  # DuckDB SQL; None -> rows-only driver check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = "") -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# Driver-window rotation (fully computed since r9, VERDICT r8 ask #1).
# The driver records only the FIRST 50 ``queries()`` entries per round,
# so exports order:
#   1. never-driver-covered — computed from the committed
#      CORRECTNESS_r*.json files at import time, NOT hand-maintained:
#      any catalog query without a passing driver row in any prior
#      round leads the window (this automatically front-loads queries
#      added late in a round, the exact failure mode that left 5
#      r7 additions without evidence).
#   2. _DRIVER_FRESH — hand-listed queries whose execution path THIS
#      round's code changes touch, so their prior green rows predate
#      the code; they re-verify next.
#   3. stalest-first remainder — every other covered query, ordered by
#      the ROUND of its most recent passing driver row ASCENDING
#      (registration order breaks ties), computed from the same
#      committed CORRECTNESS files.  No query's driver evidence can
#      age more than ~ceil(catalog/50)+1 rounds before it rotates back
#      into the window — the r8 hand-maintained freshness list is no
#      longer the only thing keeping settled queries re-verified.


def _driver_latest_round() -> "dict[str, int]":
    """Per-query round number of the most recent PASSING driver row
    across the committed CORRECTNESS_r*.json files: oracle rows must
    be err-free and row-count-matched; rows-only queries
    (``err == 'no_oracle'`` by the driver contract, for
    non-SQL-expressible ops) count when the driver recorded a
    non-negative Spark row count.  A failed or errored row does NOT
    count — the query must rotate back in.  Queries absent from the
    result have no driver evidence at all and lead the window."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                recs = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, rec in recs.items():
            if not isinstance(rec, dict):
                continue
            # a row counts as passing only if the VALUE hash matched
            # too — r9 recorded tpch_q9/q12 with rows_match=True but
            # hash_match=False, and treating that as green would rotate a
            # FAILING query out of the window instead of back in
            oracle_pass = (
                rec.get("err") is None
                and rec.get("rows_match", False)
                and rec.get("hash_match") is not False
            )
            spec = QUERIES.get(name)
            # a rows-only row only covers a query that is STILL
            # rows-only: once it gains an oracle, the oracle itself
            # needs driver evidence (the dedup_embedding_clusters
            # r6->r7 upgrade precedent)
            rows_only_pass = (
                rec.get("err") == "no_oracle"
                and rec.get("spark_rows") is not None
                and (spec is None or spec.oracle is None)
            )
            if oracle_pass or rows_only_pass:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _driver_covered() -> "frozenset[str]":
    """Names with a PASSING driver row in any committed
    CORRECTNESS_r*.json (see :func:`_driver_latest_round`)."""
    return frozenset(_driver_latest_round())

# Prior-round green but re-verify THIS round because this round's code
# changes touch their execution path.  Only the handful of queries
# whose code changed THIS round belongs here; everything else rotates
# automatically stalest-first, so forgetting an entry costs at most
# ~ceil(catalog/50) rounds of evidence age, never unbounded drift.
_DRIVER_FRESH = frozenset({
    # r17 code changes (optimization round — every reshaped query path
    # re-verifies against the driver's oracle next):
    #   - bm25_from_index: dft from the semi-filtered postings slice +
    #     shared persisted slice (operators/retrieval.py)
    "bm25_search",
    "bm25_search_cjk",
    "hybrid_search_rrf",
    "incremental_postings_bm25",
    #   - ivf_pq_topk: fused assign+encode Arrow kernel, single collects
    "knn_ivf_pq",
    #   - jaccard_on_pairs: conditional id-spread of the shingle base
    "ngram_jaccard_pairs",
    "dedup_cluster_components",
    "crosscorpus_neardup_lsh",  # + persisted signature table
    "golden_record_survivorship",
    #   - doc_bigram_logprob: persisted token stream (one exchange)
    "doc_bigram_logprob",
    #   - run_available_now_to_memory: trailing no-data micro-batch
    #     disabled at the five safe call sites
    "streaming_windowed_counts",
    "streaming_dedup_ids",
    "streaming_enriched_counts",
    "streaming_stream_stream_join",
    "streaming_stream_stream_left_outer",
    #   - conditional (under-split-only) media repartition
    "image_dedup_ahash",
    #   - scd2_from_change_feed: coalesced checkpoints + lazy last commit
    "scd2_dim_from_feed",
    #   - _deletion_variant_rows keep_cols payload trim
    "entity_match_blocked",
    "entity_resolution_clusters",
    #   - pagerank: lazy per-iteration checkpoint
    "graph_pagerank",
})


def _export_order() -> list[str]:
    latest = _driver_latest_round()
    prio = [n for n in QUERIES if n not in latest]
    fresh = [n for n in QUERIES if n in _DRIVER_FRESH and n not in prio]
    reg_order = {n: i for i, n in enumerate(QUERIES)}
    settled = sorted(
        (n for n in QUERIES if n in latest and n not in _DRIVER_FRESH),
        key=lambda n: (latest[n], reg_order[n]),
    )
    return prio + fresh + settled


# Queries whose fn() performs EAGER one-time staging at plan-build time
# (snapshot builds, bucketed saveAsTable, SQLite load) and memoizes it
# per process; the DataFrame they return is lazy, so calling fn() and
# discarding the result runs exactly the staging and none of the query.
# The left-outer stream-stream join's multibatch input recipe — shared
# between the query and prepare_fixtures so eager staging builds the
# SAME memoized dir the query reads (margin = horizon + delay + slack)
_LOJ_MULTIBATCH_KW = dict(
    n_batches=3,
    cache_tag="outer-spacer",
    spacer_batches=2,
    spacer_margin_seconds=3600 + 600 + 120,
)

_EAGER_STAGING_QUERIES = (
    "dbapi_partitioned_read",
    "snapshot_file_skipping",
    "zorder_multidim_skipping",
    "bucketed_colocated_join",
    "snapshot_delete_where",
    "snapshot_change_feed",  # stages the shared 3-commit CDF table
    "streaming_cdc_replication",  # runs the CDC stream into the replica
    "bloom_index_point_lookup",  # compaction + bloom index build
    "snapshot_restore",  # stages the 3-commit restore fixture table
    "csv_ingest_quarantine",  # stages the CSV + corrupt-lines dir
    "jsonl_ingest_quarantine",  # stages the JSONL + corrupt-lines dir
    "partition_evolution",  # stages + evolves the layout fixture table
    "streaming_quarantine_ingest",  # runs the quarantine stream to its sinks
    "streaming_sketch_maintenance",  # runs the sketch-table stream
    "snapshot_dv_delete",  # stages + DV-deletes the fixture table
    "snapshot_update_where",  # stages + updates the fixture table
    "knn_pq_adc",  # trains + memoizes the PQ codebooks (index build)
    "knn_ivf_pq",  # trains + memoizes coarse centroids + PQ codebooks
    "snapshot_compaction",  # stages 5 micro-batch commits + compacts
    "tpch_refresh_rf1_rf2",  # stages the orders table + RF1/RF2 commits
    "streaming_corpus_screen",  # runs the multi-batch screen to its sink
    "streaming_media_triage",  # runs the multi-batch triage to its sink
    "contamination_new_docs",  # builds + memoizes the base winnow store
    "wds_datasource_scan",  # stages the WebDataset shard directory
    "streaming_shard_ingest",  # runs the multi-batch ingest to its sink
)


def prepare_fixtures(
    spark: SparkSession, sf_dir: str, names: "Sequence[str] | None" = None
) -> None:
    """Hoist one-time per-process warehouse staging out of a timed
    region (VERDICT r6 ask #3).  A deployment's snapshot tables,
    bucketed warehouse tables, JDBC-side database, and streaming input
    dirs already exist when a query runs; the catalog queries build
    them on first invocation only because the driver runs each query
    cold.  bench.py calls this before its timed passes so pass-1
    timings measure query execution, not fixture construction; the
    driver's correctness sweep does NOT call it, so the cold build
    path stays exercised there."""
    for name in names if names is not None else _EAGER_STAGING_QUERIES:
        QUERIES[name].fn(spark, sf_dir)  # staging side effect; plan discarded
    from etl_tiki_webscraping_spark.streaming.events import (
        read_events_stream_multibatch,
    )

    # stage the shared multi-batch streaming input dirs (memoized by
    # (sf_dir, n_batches, tag)); starting no stream here.  The spacer
    # variant is the left-outer join's input — without staging it here
    # that query's pass-1 pays the 5-file re-stage (r11 ask #8)
    read_events_stream_multibatch(spark, sf_dir, n_batches=3)
    read_events_stream_multibatch(spark, sf_dir, **_LOJ_MULTIBATCH_KW)


def get_queries() -> dict[str, SparkQuery]:
    return {name: QUERIES[name].fn for name in _export_order()}


def get_oracles() -> dict[str, str]:
    return {
        name: QUERIES[name].oracle
        for name in _export_order()
        if QUERIES[name].oracle is not None
    }


def _exact_sum(col: str):
    """Order-independent sum of a double column: exact decimal
    accumulate, double on the way out."""
    return F.sum(F.col(col).cast("decimal(18,6)")).cast("double")


# ===========================================================================
# Flagship (SURVEY §7 step 1): the reference's core semantics in
# analytical form — union of date-sliced orders (U1), dedup (A1),
# FK semi-join (J1/J2), star join, groupBy aggregates.
# ===========================================================================

@register(
    "flagship",
    oracle="""
    WITH sliced AS (
        SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1995-01-01'
        UNION ALL
        SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    ),
    custs AS (
        SELECT DISTINCT c_custkey, c_nationkey, c_acctbal FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
    )
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(s.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue,
           CAST(SUM(CAST(s.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_order_value
    FROM sliced s
    JOIN custs c ON s.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="Union-sliced orders ⋈ deduped segment customers ⋈ nation, revenue rollup "
        "(reference semantics: dags/etl.py:66,86,250-251 re-expressed analytically)",
)
def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    cut = F.lit("1995-01-01").cast("timestamp")
    sliced = union_all(
        [orders.filter(F.col("o_orderdate") < cut), orders.filter(F.col("o_orderdate") >= cut)]
    )
    custs = (
        customer.filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY"))
        .select("c_custkey", "c_nationkey", "c_acctbal")
        .distinct()
    )
    # customer grows with scale factor — no hand-forced broadcast; AQE picks
    # broadcast at small SF and falls back to shuffle join when custs outgrows
    # the threshold. nation is constant-size (25 rows) so its hint is safe.
    joined = (
        sliced.join(custs, sliced.o_custkey == custs.c_custkey)
        .join(F.broadcast(nation), custs.c_nationkey == nation.n_nationkey)
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        _exact_sum("o_totalprice").alias("total_revenue"),
        (_exact_sum("o_totalprice") / F.count(F.lit(1)).cast("double")).alias("avg_order_value"),
    )


# ===========================================================================
# §2.2 Projections / filters / predicates
# ===========================================================================

@register(
    "projection_pruning",
    oracle="SELECT p_partkey, p_name, p_retailprice FROM part",
    doc="P1-P3 fixed projection list (dags/etl.py:67-80)",
)
def q_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_retailprice")


@register(
    "literal_provenance_tag",
    oracle="SELECT o_orderkey, 'sendo' AS source_system, 'daily' AS batch_tag FROM orders",
    doc="P6 literal column append (dags/etl.py:61-62,143)",
)
def q_lit_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.lit("sendo").alias("source_system"),
        F.lit("daily").alias("batch_tag"),
    )


@register(
    "membership_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag
    FROM lineitem WHERE l_returnflag IN ('A', 'R')
    """,
    doc="P5 isin membership predicate (dags/etl.py:251, small-key broadcast form)",
)
def q_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag").isin("A", "R"))
        .select("l_orderkey", "l_linenumber", "l_returnflag")
    )


# ===========================================================================
# §2.3 Joins
# ===========================================================================

@register(
    "fk_semi_join",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
    doc="J1 left-semi FK gate (dags/etl.py:247-251) — distributed, no driver collect",
)
def q_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    building = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return fk_semi_join(orders, building.select(F.col("c_custkey").alias("o_custkey")), "o_custkey").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@register(
    "anti_join",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
    doc="left-anti complement of J1 (upsert survivor leg, SURVEY §2.9 W2c)",
)
def q_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    building = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return anti_join(orders, building.select(F.col("c_custkey").alias("o_custkey")), "o_custkey").select(
        "o_orderkey", "o_custkey"
    )


@register(
    "key_space_union",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    UNION
    SELECT c_custkey AS custkey FROM customer
    """,
    doc="J2/U3 key-space union+distinct (dags/etl.py:250)",
)
def q_key_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders_keys = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    cust_keys = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    return key_space_union(orders_keys, cust_keys)


@register(
    "star_join_rollup",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    doc="implied star-schema equi-joins (sql/dwh.sql:28,44 FK graph) with broadcast dims",
)
def q_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _exact_sum("c_acctbal").alias("total_acctbal"),
        )
    )


# ===========================================================================
# §2.4 Aggregations / distinct
# ===========================================================================

@register(
    "dedup_keys",
    oracle="SELECT DISTINCT l_orderkey FROM lineitem",
    doc="A1 dropDuplicates key projection == DISTINCT (dags/etl.py:86)",
)
def q_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_first(load_table(spark, sf_dir, "lineitem"), ["l_orderkey"]).select("l_orderkey")


@register(
    "dedup_deterministic",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM (
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC
               ) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
    doc="A1 deterministic variant: latest order per customer via row_number window",
)
def q_dedup_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    return dedup_deterministic(
        orders, ["o_custkey"], [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()]
    )


@register(
    "distinct_keys",
    oracle="SELECT DISTINCT c_mktsegment FROM customer",
    doc="A2 distinct key set (dags/etl.py:250)",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return distinct_keys(load_table(spark, sf_dir, "customer"), ["c_mktsegment"])


@register(
    "groupby_agg_metrics",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                    * CAST(FLOOR((1 - l_discount) * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 1e4 AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H-Q1-style pricing summary — the groupBy/agg surface the warehouse's "
        "pre-aggregated columns imply (SURVEY §2.4, sql/dwh.sql:4-11)",
)
def q_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    # the price x (1-discount) PRODUCT lands off the 1e-6 grid, so a
    # double->DECIMAL cast hits half-way ties the two engines round
    # differently (one tie flipped at sf0.1); quantizing each FACTOR
    # via the floor recipe keeps the product and sum exact and
    # bit-identical on both engines.  Factors quantize at their NATIVE
    # precision (prices and discounts are 2-decimal data): cents x
    # integer-percent keeps the per-row product <= ~1.1e9, so the sum
    # runs as a plain codegen'd BIGINT sum — the r10 micros form
    # needed a per-row DECIMAL(38,0) conversion + Decimal128 sum,
    # which is what the r10 bench regression flagged.  Headroom: a
    # bigint sum holds ~10^10 such rows per group; past that re-cast
    # the product to decimal(38,0) (same expression, slower sum).
    disc_units = F.floor(
        F.col("l_extendedprice") * F.lit(100) + F.lit(0.5)
    ) * F.floor((F.lit(1) - F.col("l_discount")) * F.lit(100) + F.lit(0.5))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _exact_sum("l_quantity").alias("sum_qty"),
        _exact_sum("l_extendedprice").alias("sum_base_price"),
        (F.sum(disc_units).cast("double") / F.lit(1e4)).alias(
            "sum_disc_price"
        ),
        (_exact_sum("l_quantity") / F.count(F.lit(1)).cast("double")).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "rollup_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="grouping-sets surface: ROLLUP over returnflag/linestatus (SURVEY §2.4 native)",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"), _exact_sum("l_quantity").alias("sum_qty"))
    )


@register(
    "count_distinct",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
    doc="exact count-distinct per group (SURVEY §2.4)",
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "conditional_percent_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) * 100.0 AS pct_large_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="good_review_percent recompute pattern (SURVEY §2.4: avg of predicate × 100)",
)
def q_cond_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    hits = F.sum(F.when(F.col("l_quantity") > 25, 1).otherwise(0)).cast("double")
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(((hits / F.count(F.lit(1)).cast("double")) * F.lit(100.0)).alias("pct_large_qty"))
    )


# ===========================================================================
# §2.5 Set operations
# ===========================================================================

@register(
    "union_all_slices",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderdate < TIMESTAMP '1995-01-01'
    UNION ALL
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    """,
    doc="U1/U2 n-ary UNION ALL of page frames (dags/etl.py:66,147)",
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("1995-01-01").cast("timestamp")
    return union_all(
        [
            orders.filter(F.col("o_orderdate") < cut).select("o_orderkey", "o_totalprice"),
            orders.filter(F.col("o_orderdate") >= cut).select("o_orderkey", "o_totalprice"),
        ]
    )


@register(
    "intersect_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    INTERSECT
    SELECT o_custkey AS custkey FROM orders
    """,
    doc="INTERSECT surface (SURVEY §2.5, native)",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    custs = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    orders = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return custs.intersect(orders)


# ===========================================================================
# §2.6 Scalar functions
# ===========================================================================

@register(
    "regexp_suffix_strip",
    oracle=r"""
    SELECT p_partkey,
           regexp_replace(p_name || '.html', '\.html$', '') AS clean_path
    FROM part
    """,
    doc="F1 '.html' suffix strip (dags/etl.py:91) + F2 string build",
)
def q_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.scalar import strip_html_suffix

    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        strip_html_suffix(F.concat(F.col("p_name"), F.lit(".html"))).alias("clean_path"),
    )


@register(
    "date_dayfirst_roundtrip",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%d/%m/%Y') AS day_first_str,
           CAST(strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y') AS DATE) AS parsed_date
    FROM orders
    """,
    doc="F3 dd/MM/yyyy day-first parse (dags/etl.py:164-166)",
)
def q_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.scalar import parse_day_first_date

    day_str = F.date_format(F.col("o_orderdate"), "dd/MM/yyyy")
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        day_str.alias("day_first_str"),
        parse_day_first_date(day_str).alias("parsed_date"),
    )


@register(
    "json_extraction",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_path,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct
    FROM events
    """,
    doc="F4 JSON path extraction (dags/etl.py:31,57,95,139): get_json_object + typed from_json",
)
def q_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k BIGINT")
    return events.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").cast("bigint").alias("k_path"),
        parsed["k"].alias("k_struct"),
    )


@register(
    "array_explode",
    oracle="""
    SELECT vec_id, CAST(unnest(range(0, len(embedding))) AS INT) AS pos,
           CAST(unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS DOUBLE) AS component
    FROM embeddings
    """,
    doc="F5 nested-array traversal: posexplode over embedding vectors (dags/etl.py:33-39 analog)",
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.posexplode("embedding")
    ).select(
        "vec_id", F.col("pos"), F.col("col").cast("double").alias("component")
    )


@register(
    "map_build_explode",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    """,
    doc="F5/F6 sitemap flatten: build map<region, list<nation>> then explode back to "
        "relational pairs (dags/etl.py:32-39)",
)
def q_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    # build the reference's dict-of-lists shape, then dissolve it back —
    # proves MapType round-trips losslessly
    nested = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.collect_list("n_name").alias("nations"))
        .select(F.map_from_entries(F.array(F.struct("r_name", "nations"))).alias("m"))
        .select(F.explode("m").alias("region", "nations"))
    )
    return nested.select("region", F.explode("nations").alias("nation"))


# ===========================================================================
# §2.7 Sorts / limits / top-k / windows
# ===========================================================================

@register(
    "window_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rank FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
               ) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
    doc="§2.7 top-k per group via row_number window (WindowGroupLimit pushes k into sort)",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


@register(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
    """,
    doc="§2.7 global top-N (TakeOrderedAndProject — no full sort at scale)",
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .limit(100)
    )


# ===========================================================================
# §2.9 Sinks — upsert semantics as a checkable query
# ===========================================================================

@register(
    "upsert_merge",
    oracle="""
    WITH updates AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 2 AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey + 1000000000, o_custkey, 'N' AS o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 97 = 0
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
    UNION ALL
    SELECT * FROM updates
    """,
    doc="W2 upsert: ON DUPLICATE KEY UPDATE semantics (dags/etl.py:181-199) as "
        "anti-join + union — conflicting keys take update values, new keys insert",
)
def q_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.sinks.upsert import upsert_dataframes

    orders = load_table(spark, sf_dir, "orders")
    conflicting = orders.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    fresh = orders.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + 1000000000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    updates = conflicting.unionByName(fresh)
    return upsert_dataframes(orders, updates, ["o_orderkey"])


# ===========================================================================
# §2.1 Sources — paginated source with a deterministic injected fetcher
# ===========================================================================

@register(
    "paginated_source_scan",
    oracle="""
    SELECT n_nationkey, CAST(unnest(range(0, n_nationkey * 3 + 5)) AS BIGINT) AS item_id
    FROM nation
    """,
    doc="S2/S4 pagination-until-empty per key via mapInPandas; fetcher injected "
        "(deterministic synthetic pages; proves no tail loss — dags/etl.py:50-64,115-120)",
)
def q_paginated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.sources.http import FetchConfig, paginated_source

    keys = load_table(spark, sf_dir, "nation").select("n_nationkey")
    page_size = 4

    def fetch_page(row: dict, page: int, cfg: FetchConfig) -> list | None:
        total = row["n_nationkey"] * 3 + 5
        start = (page - 1) * page_size
        if start >= total:
            return None  # empty page terminates (dags/etl.py:58-59)
        return [{"item_id": i} for i in range(start, min(start + page_size, total))]

    return paginated_source(
        keys, fetch_page, "n_nationkey int, item_id bigint", FetchConfig(max_retries=0)
    )


# ===========================================================================
# Extension surface: text analysis (documents)
# ===========================================================================

@register(
    "text_token_stats",
    oracle=r"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
               + CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS BIGINT) AS n_bpe_ish
    FROM documents
    """,
    doc="token counting: whitespace tokens + BPE-ish pretokenizer count "
        "(alnum runs + punct marks), all JVM-side regexp",
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    alnum_runs = F.regexp_count(F.col("text"), F.lit(r"[A-Za-z0-9]+"))
    punct_chars = F.length(F.regexp_replace(F.col("text"), r"[A-Za-z0-9\s]", ""))
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        F.size(F.split(F.trim(F.col("text")), "[ \t\n\f\r]+")).cast("bigint").alias("n_tokens"),
        (alnum_runs + punct_chars).cast("bigint").alias("n_bpe_ish"),
    )


@register(
    "text_quality_score",
    oracle=r"""
    SELECT doc_id,
           CAST(length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS DOUBLE)
               / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio,
           CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                    t -> t IN ('the','and','of','to','in','is','it','that','for','with'))) AS DOUBLE)
               / CAST(greatest(len(string_split_regex(lower(trim(text)), '\s+')), 1) AS DOUBLE)
               AS stopword_ratio
    FROM documents
    """,
    doc="quality scoring: punctuation + stopword ratios (C4/Gopher-style heuristics)",
)
def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.text import punct_ratio, stopword_ratio

    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        punct_ratio("text").alias("punct_ratio"),
        stopword_ratio("text").alias("stopword_ratio"),
    )


def _language_id_oracle() -> str:
    """The stopword-hit classifier replayed in DuckDB SQL, built from
    the SAME STOPWORDS table the Spark expression uses (single source
    of truth): per-language occurrence counts, argmax with the
    max-(score, language-code) tie-break array_max applies, 'und' when
    nothing hits."""
    from etl_tiki_webscraping_spark.functions.text import STOPWORDS

    lang_values = ", ".join(
        "('{}', [{}])".format(lang, ", ".join(f"'{w}'" for w in words))
        for lang, words in STOPWORDS.items()
    )
    return rf"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '') AS tok
      FROM documents
    ),
    langs(lang, words) AS (VALUES {lang_values}),
    scores AS (
      SELECT doc_id, lang, len(list_filter(tok, t -> list_contains(words, t))) AS v
      FROM toks CROSS JOIN langs
    ),
    best AS (
      SELECT doc_id, lang, v,
             row_number() OVER (PARTITION BY doc_id ORDER BY v DESC, lang DESC) AS rn
      FROM scores
    )
    SELECT doc_id, CASE WHEN v > 0 THEN lang ELSE 'und' END AS pred_lang
    FROM best WHERE rn = 1
    """


@register(
    "language_id",
    oracle=_language_id_oracle(),
    doc="stopword-hit language ID, pure built-in array expressions (no UDF); "
        "oracle replays the classifier in SQL from the same STOPWORDS table "
        "with the identical argmax tie-break",
)
def q_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.text import language_id

    return load_table(spark, sf_dir, "documents").select(
        "doc_id", language_id("text").alias("pred_lang")
    )


@register(
    "langid_confusion_matrix",
    oracle=f"""
    WITH pred AS ({_language_id_oracle()})
    SELECT d.lang AS label_lang, p.pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents d JOIN pred p ON p.doc_id = d.doc_id
    GROUP BY d.lang, p.pred_lang
    """,
    doc="Language-ID confusion matrix against the fixture's labeled "
        "lang column — the evaluation loop a corpus pipeline runs "
        "before trusting a router: predicted x labeled counts, built "
        "on the SAME oracle-green classifier CTE as language_id (one "
        "source of truth, so the matrix and the per-doc query can "
        "never disagree).  Scale shape: the classifier is a narrow "
        "array expression; the matrix is one map-side-combined "
        "groupBy over |langs|^2 cells.",
)
def q_langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.text import language_id

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("label_lang"),
            language_id("text").alias("pred_lang"),
        )
        .groupBy("label_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "doc_fingerprint",
    oracle=r"""
    SELECT doc_id,
           CASE WHEN text IS NULL THEN NULL ELSE
             CAST(('0x' || substr(
               list_reduce(
                 list_prepend(md5(''),
                   list_filter(string_split_regex(trim(text), '\s+'),
                               x -> x <> '')),
                 (a, b) -> md5(a || '|' || b)), 1, 15)) AS BIGINT)
           END AS fingerprint
    FROM documents
    """,
    doc="order-sensitive rolling document fingerprint: md5 hash-chain "
        "over whitespace tokens (acc' = md5(acc || '|' || tok) from the "
        "md5('') seed), first 15 hex digits as bigint — re-ordered text "
        "fingerprints differently, reformatted text doesn't.  The md5 "
        "chain (vs the old xxhash64 fold) is engine-portable, so the "
        "oracle replays the exact fold via list_reduce (round-11 "
        "rows-only -> oracle upgrade)",
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.text import doc_fingerprint

    return load_table(spark, sf_dir, "documents").select(
        "doc_id", doc_fingerprint("text").alias("fingerprint")
    )


# ===========================================================================
# Extension surface: deduplication (documents)
# ===========================================================================

@register(
    "dedup_exact_text",
    oracle=r"""
    SELECT doc_id, text, lang, source, n_chars FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
            ORDER BY doc_id ASC
        ) AS rn
        FROM documents
    ) WHERE rn = 1 OR text IS NULL
    """,
    doc="exact content dedup: hash-groupBy on md5(normalized text), min-id "
        "survivor; NULL-text rows are not dedup candidates and pass through",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.dedup import exact_dedup

    return exact_dedup(load_table(spark, sf_dir, "documents"), "text", "doc_id")


def _minhash_sig_ctes(src: str = "documents", segment_cjk: bool = False) -> str:
    """MinHash signature/banding replay as DuckDB CTEs through
    ``mh_buckets`` (plus ``mh_sh`` raw shingle sets for string-level
    Jaccard verification) over relation ``src(doc_id, text)`` — the
    shared front half of every MinHash oracle (round-11 VERDICT ask
    #4: the kernel's md5-based hashes made the whole pipeline
    SQL-expressible).  Embeds the kernel's exact seeded universal-hash
    constants as literals (the language_id pattern): tokenize ->
    distinct 3-shingles -> 31-bit md5-prefix base hash -> (a*h + b)
    mod p column-min signature -> 16 x 4 bands -> 15-hex-md5 bucket
    ids.  ``segment_cjk=True`` swaps the tokenizer for the
    tokenize_mixed replay (no-space-script runs -> character bigrams,
    the shared ``\\x{...}`` class body), matching the kernel's
    segment_cjk flag (r12 VERDICT ask #5)."""
    from etl_tiki_webscraping_spark.functions.text import (
        NO_SPACE_SCRIPT_CLASS,
    )
    from etl_tiki_webscraping_spark.operators.dedup import (
        minhash_hash_params,
    )

    a, b = minhash_hash_params(64)
    ab_values = ", ".join(
        f"({i}, {int(a[i])}, {int(b[i])})" for i in range(64)
    )
    cls = NO_SPACE_SCRIPT_CLASS
    if segment_cjk:
        toks_cte = rf"""
    mh_toks AS (
        SELECT doc_id,
               flatten(list_transform(
                   list_filter(string_split_regex(
                       regexp_replace(lower(coalesce(text, '')),
                                      '([{cls}]+)', ' \1 ', 'g'),
                       '\s+'), x -> x <> ''),
                   t -> CASE WHEN regexp_matches(t, '^[{cls}]+$')
                                  AND length(t) >= 2
                        THEN list_transform(range(1, length(t)::BIGINT),
                                            i -> substring(t, i::INT, 2))
                        ELSE [t] END)) AS tok
        FROM {src}
    ),"""
    else:
        toks_cte = rf"""
    mh_toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                           x -> x <> '') AS tok
        FROM {src}
    ),"""
    return rf"""
    ab(i, a, b) AS (VALUES {ab_values}),{toks_cte}
    mh_sh AS (
        SELECT doc_id,
               CASE WHEN len(tok) >= 3
                    THEN list_distinct(list_transform(range(1, len(tok) - 1),
                             i -> array_to_string(list_slice(tok, i, i + 2), ' ')))
                    ELSE [array_to_string(tok, ' ')]
               END AS shingles
        FROM mh_toks
    ),
    mh_hs AS (
        SELECT doc_id,
               list_distinct(list_transform(shingles,
                   s -> CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)
                        & 2147483647)) AS hset
        FROM mh_sh
    ),
    mh_hx AS (SELECT doc_id, unnest(hset) AS h FROM mh_hs),
    mh_sig AS (
        SELECT doc_id, i, MIN((a * h + b) % 2147483647) AS g
        FROM mh_hx CROSS JOIN ab
        GROUP BY doc_id, i
    ),
    mh_sigarr AS (
        SELECT doc_id, array_agg(g ORDER BY i) AS s FROM mh_sig GROUP BY doc_id
    ),
    mh_buckets AS (
        SELECT doc_id, band,
               CAST(('0x' || substr(md5(array_to_string(
                   list_slice(s, band * 4 + 1, band * 4 + 4), ',')), 1, 15))
                   AS BIGINT) AS bucket
        FROM mh_sigarr, unnest(range(0, 16)) AS r(band)
    )
    """


def _minhash_lsh_ctes(src: str = "documents", segment_cjk: bool = False) -> str:
    """The full MinHash-LSH replay ending in ``edges`` (verified
    duplicate pairs, id_a < id_b): :func:`_minhash_sig_ctes` plus
    cap-1024 bucket join -> exact hset-Jaccard >= 0.8 — shared by
    dedup_minhash_lsh, dedup_minhash_clusters, dedup_minhash_cjk
    (``segment_cjk=True``), and (via ``src``) the
    corpus_pipeline_neardup oracle."""
    return rf"""{_minhash_sig_ctes(src, segment_cjk)},
    mh_keep AS (
        SELECT band, bucket FROM mh_buckets
        GROUP BY band, bucket HAVING COUNT(*) <= 1024
    ),
    mh_capped AS (
        SELECT b.* FROM mh_buckets b JOIN mh_keep k USING (band, bucket)
    ),
    mh_cand AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        FROM mh_capped l
        JOIN mh_capped r
          ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    ),
    edges AS (
        SELECT c.id_a, c.id_b
        FROM mh_cand c
        JOIN mh_hs ha ON ha.doc_id = c.id_a
        JOIN mh_hs hb ON hb.doc_id = c.id_b
        WHERE CAST(len(list_intersect(ha.hset, hb.hset)) AS DOUBLE)
              / CAST(len(list_distinct(list_concat(ha.hset, hb.hset)))
                     AS DOUBLE) >= 0.8
    )
    """


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_minhash_lsh_ctes()},
    dup AS (SELECT DISTINCT id_b FROM edges)
    SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
    FROM documents d LEFT JOIN dup ON dup.id_b = d.doc_id
    WHERE dup.id_b IS NULL
    """,
    doc="MinHash+LSH near-dup removal: shingle → 64-hash signature → 16 bands → "
        "bucket join → exact-Jaccard verify ≥0.8 → drop higher id.  The DuckDB "
        "oracle replays the ENTIRE pipeline (md5-prefix base hashes, the "
        "kernel's seeded universal-hash constants as literals, md5 band "
        "buckets, cap-1024, hset Jaccard) — upgraded from rows-only in r11",
)
def q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.dedup import minhash_dedup

    docs = load_table(spark, sf_dir, "documents")
    return minhash_dedup(docs, "text", "doc_id", threshold=0.8).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


# SimHash replay CTEs (through the capped chunk table) + the pair
# SELECT tail — shared by the dedup_simhash oracle and
# lsh_pair_quality's simhash candidate leg.
_SIMHASH_CTES = r"""
    sh_toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                           x -> x <> '') AS tok
        FROM documents
    ),
    sh_h AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(u.w), 1, 16)) AS UBIGINT) AS h,
               COUNT(*) AS cnt
        FROM sh_toks, unnest(tok) AS u(w)
        GROUP BY doc_id, h
    ),
    sh_votes AS (
        SELECT doc_id, r.i,
               SUM(CASE WHEN (h >> r.i) & 1 = 1 THEN cnt ELSE -cnt END) AS v
        FROM sh_h, unnest(range(0, 64)) AS r(i)
        GROUP BY doc_id, r.i
    ),
    sh_packed AS (
        SELECT doc_id,
               SUM(CASE WHEN v > 0 THEN CAST(1 AS HUGEINT) << i ELSE 0 END) AS p
        FROM sh_votes GROUP BY doc_id
    ),
    sh_sig AS (
        SELECT d.doc_id, CAST(coalesce(p.p, 0) AS UBIGINT) AS s
        FROM documents d LEFT JOIN sh_packed p USING (doc_id)
    ),
    sh_chunks AS (
        SELECT doc_id, r.c AS chunk, (s >> (16 * r.c)) & 65535 AS val, s
        FROM sh_sig, unnest(range(0, 4)) AS r(c)
    ),
    sh_keep AS (
        SELECT chunk, val FROM sh_chunks
        GROUP BY chunk, val HAVING COUNT(*) <= 1024
    ),
    sh_capped AS (
        SELECT c.* FROM sh_chunks c JOIN sh_keep k USING (chunk, val)
    )
"""

_SIMHASH_PAIRS_SQL = r"""
    SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
           CAST(bit_count(xor(l.s, r.s)) AS INT) AS hamming
    FROM sh_capped l
    JOIN sh_capped r
      ON l.chunk = r.chunk AND l.val = r.val AND l.doc_id < r.doc_id
    WHERE bit_count(xor(l.s, r.s)) <= 3
"""


@register(
    "dedup_simhash",
    oracle=f"WITH {_SIMHASH_CTES} {_SIMHASH_PAIRS_SQL}",
    doc="SimHash near-dup candidates: 64-bit simhash, 16-bit chunk banding, "
        "hamming ≤ 3.  The DuckDB oracle replays the ENTIRE pipeline "
        "(md5-prefix 64-bit token hashes — the round-11 blake2b→md5 swap "
        "that made the signature SQL-expressible — duplicate-weighted "
        "per-bit votes, HUGEINT sign-pack, 4×16-bit chunk banding, "
        "cap-1024 hot buckets, full-width hamming verify); upgraded from "
        "rows-only in r11",
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.dedup import simhash_candidate_pairs

    return simhash_candidate_pairs(load_table(spark, sf_dir, "documents"), "text", "doc_id")


@register(
    "ngram_jaccard_pairs",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS tok
        FROM documents
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.tok AS ta, b.tok AS tb
        FROM toks a JOIN toks b ON b.doc_id = a.doc_id + 1
        WHERE a.doc_id % 10 = 0
    )
    SELECT id_a, id_b,
           CAST(len(list_intersect(ta, tb)) AS DOUBLE)
               / CAST(len(list_distinct(list_concat(ta, tb))) AS DOUBLE) AS jaccard
    FROM pairs
    """,
    doc="exact n-gram (n=1) Jaccard similarity on fixed candidate pairs — the "
        "verification kernel of MinHash dedup, oracle-checkable",
)
def q_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.dedup import jaccard_on_pairs

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.select("doc_id").filter(F.col("doc_id") % 10 == 0)
    pairs = ids.select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    ).join(
        docs.select(F.col("doc_id").alias("id_b")), on="id_b", how="left_semi"
    )
    return jaccard_on_pairs(pairs, docs, "text", "doc_id", shingle_n=1)


@register(
    "dedup_cluster_components",
    oracle=r"""
    WITH RECURSIVE toks AS (
        SELECT doc_id, list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS tok
        FROM documents
    ),
    cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.tok AS ta, b.tok AS tb
        FROM toks a JOIN toks b ON b.doc_id = a.doc_id + 1 OR b.doc_id = a.doc_id + 2
    ),
    edges AS (
        SELECT id_a, id_b FROM cand
        WHERE CAST(len(list_intersect(ta, tb)) AS DOUBLE)
                  / CAST(len(list_distinct(list_concat(ta, tb))) AS DOUBLE) >= 0.5
    ),
    undirected AS (
        SELECT id_a AS src, id_b AS dst FROM edges
        UNION SELECT id_b AS src, id_a AS dst FROM edges
    ),
    reach AS (
        SELECT src AS id, src AS lbl FROM undirected
        UNION
        SELECT u.dst AS id, r.lbl FROM reach r JOIN undirected u ON u.src = r.id
    ),
    comp AS (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id)
    SELECT d.doc_id, CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component
    FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    """,
    doc="exact duplicate clustering: deterministic candidate window (doc_id +1/+2) "
        "-> unigram Jaccard >= 0.5 edges -> iterated min-id connected components "
        "(one bare-id shuffle per round, O(cluster diameter) rounds) so transitive "
        "chains a~b~c collapse into ONE cluster; oracle recomputes the components "
        "with a recursive reachability CTE in DuckDB — the distributed label "
        "propagation is exactly equivalent to recursive min-label closure",
)
def q_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.dedup import (
        connected_components,
        jaccard_on_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.select("doc_id")
    cand = (
        ids.select(F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b"))
        .union(ids.select(F.col("doc_id").alias("id_a"), (F.col("doc_id") + 2).alias("id_b")))
        .join(ids.select(F.col("doc_id").alias("id_b")), on="id_b", how="left_semi")
    )
    edges = (
        jaccard_on_pairs(cand, docs, "text", "doc_id", shingle_n=1)
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b")
    )
    comps = connected_components(edges)
    return docs.select("doc_id").join(
        comps.withColumnRenamed("id", "doc_id"), on="doc_id", how="left"
    ).select(
        "doc_id", F.coalesce("component", F.col("doc_id")).alias("component")
    )


@register(
    "dedup_minhash_clusters",
    oracle=f"""
    WITH RECURSIVE {_minhash_lsh_ctes()},
    undirected AS (
        SELECT id_a AS src, id_b AS dst FROM edges
        UNION SELECT id_b AS src, id_a AS dst FROM edges
    ),
    reach AS (
        SELECT src AS id, src AS lbl FROM undirected
        UNION
        SELECT u.dst AS id, r.lbl FROM reach r JOIN undirected u ON u.src = r.id
    ),
    comp AS (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id),
    dup AS (SELECT id AS id_b FROM comp WHERE id <> component)
    SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
    FROM documents d LEFT JOIN dup ON dup.id_b = d.doc_id
    WHERE dup.id_b IS NULL
    """,
    doc="MinHash-LSH near-dup removal in exact-components mode: verified "
        "duplicate edges -> min-id connected components -> keep ONE survivor "
        "per duplicate cluster (transitive chains collapse, unlike the "
        "single-pass drop-higher-id default).  Oracle replays the full LSH "
        "pipeline plus a recursive-CTE min-label closure — upgraded from "
        "rows-only in r11",
)
def q_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.dedup import minhash_dedup

    docs = load_table(spark, sf_dir, "documents")
    return minhash_dedup(
        docs, "text", "doc_id", threshold=0.8, exact_components=True
    ).select("doc_id", "text", "lang", "source", "n_chars")


# ===========================================================================
# Extension surface: similarity search (embeddings)
# ===========================================================================

@register(
    "knn_bruteforce",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id % 100 = 0),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               round(list_dot_product(
                         list_transform(q.qvec, x -> CAST(x AS DOUBLE)),
                         list_transform(e.embedding, x -> CAST(x AS DOUBLE)))
                     / (sqrt(list_dot_product(list_transform(q.qvec, x -> CAST(x AS DOUBLE)),
                                              list_transform(q.qvec, x -> CAST(x AS DOUBLE))))
                        * sqrt(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                                                list_transform(e.embedding, x -> CAST(x AS DOUBLE))))),
                     6) AS cosine
        FROM q, embeddings e
    )
    SELECT query_id, neighbor_id, cosine FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rn
        FROM scored
    ) WHERE rn <= 10
    """,
    doc="exact cosine top-10 per query (queries broadcast, corpus scan, window top-k)",
)
def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rank on the ROUNDED score so tie-breaking matches the oracle
    # exactly even when rounding collapses near-equal cosines
    from etl_tiki_webscraping_spark.operators.similarity import as_double_vec, cosine

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), as_double_vec("embedding").alias("qvec")
    )
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"), as_double_vec("embedding").alias("cvec"))
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cosine"),
    )
    return top_k_per_group(
        scored, ["query_id"], [F.col("cosine").desc(), F.col("neighbor_id").asc()], 10
    )


# Embedding replay building blocks (shared by the knn_lsh /
# dedup_embedding_cosine / knn_ivf oracles).  ``units`` quantizes every
# vector to exact floor(v*1e6 + 0.5) integer units (list_dot_product
# over integer-valued doubles is exact: |unit| < 2^20 here, 2^40 worst
# case); ``vecs`` is the plain double view the round-6 cosine scores
# on (knn_bruteforce's proven oracle arithmetic).
_VEC_REPLAY_CTES = """
    units AS (
        SELECT vec_id,
               list_transform(embedding,
                              x -> floor(CAST(x AS DOUBLE) * 1000000 + 0.5)) AS u
        FROM embeddings
    ),
    vecs AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    )
"""

# SRP-LSH replay: the kernel's md5-Rademacher hyperplanes over the
# integer units — plane j has entry +1 at dim d iff the first 60 bits
# of md5('j:d') are even, and each bucket id packs the 8 sign bits of
# the 8 plane dots per table (operators/similarity.py::
# srp_buckets_udf).  Every sign decision is exact, so every bucket id,
# candidate pair, and top-k is bit-identical across engines.
_SRP_REPLAY_CTES = _VEC_REPLAY_CTES + """,
    signs AS (
        SELECT r.j,
               list_transform(range(0, d.dim), d2 ->
                   CASE WHEN CAST(('0x' || substr(md5(r.j || ':' || d2), 1, 15))
                             AS BIGINT) % 2 = 0
                        THEN 1.0 ELSE -1.0 END) AS sv
        FROM range(0, 64) r(j),
             (SELECT CAST(max(len(embedding)) AS BIGINT) AS dim FROM embeddings) d
    ),
    bk AS (
        SELECT u.vec_id, s.j // 8 AS t,
               CAST(SUM(CASE WHEN list_dot_product(u.u, s.sv) >= 0
                             THEN (CAST(1 AS BIGINT) << (7 - (s.j % 8)))
                             ELSE 0 END) AS BIGINT) AS bucket
        FROM units u
        CROSS JOIN signs s
        GROUP BY 1, 2
    )
"""


@register(
    "knn_lsh",
    oracle=f"""
    WITH {_SRP_REPLAY_CTES},
    qb AS (SELECT vec_id AS query_id, t, bucket FROM bk WHERE vec_id % 100 = 0),
    cand AS (
        SELECT DISTINCT qb.query_id, cb.vec_id AS neighbor_id
        FROM qb JOIN bk cb USING (t, bucket)
    ),
    scored AS (
        SELECT c.query_id, c.neighbor_id,
               round(list_dot_product(q.v, n.v)
                     / (sqrt(list_dot_product(q.v, q.v))
                        * sqrt(list_dot_product(n.v, n.v))), 6) AS cosine
        FROM cand c
        JOIN vecs q ON q.vec_id = c.query_id
        JOIN vecs n ON n.vec_id = c.neighbor_id
        WHERE list_dot_product(q.v, q.v) > 0
          AND list_dot_product(n.v, n.v) > 0
    )
    SELECT query_id, neighbor_id, cosine FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rn
        FROM scored
    ) WHERE rn <= 10
    """,
    doc="LSH (signed-random-projection) approximate top-k: bucket join, score "
        "within buckets.  FULL oracle (upgraded r11 from rows-only): the "
        "md5-Rademacher hyperplanes + exact 1e-6 integer units make every "
        "bucket bit SQL-replayable, and the round-6 JVM cosine is "
        "knn_bruteforce's proven oracle arithmetic — DuckDB replays buckets, "
        "candidate set, scores, and ranking bit-for-bit.",
)
def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.similarity import lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_topk(emb, queries, k=10, tables=8, bits=8)


@register(
    "knn_ivf",
    oracle=f"""
    WITH {_VEC_REPLAY_CTES},
    norms AS (
        SELECT vec_id, u, list_dot_product(u, u) AS nv FROM units
    ),
    cents AS (
        SELECT vec_id AS cell, u AS cu, nv AS ncen
        FROM norms WHERE vec_id % 31 = 0
    ),
    sims AS (
        SELECT n.vec_id, c.cell,
               floor(list_dot_product(n.u, c.cu)
                     / (sqrt(n.nv) * sqrt(c.ncen)) * 1000000 + 0.5) AS simq
        FROM norms n CROSS JOIN cents c
        WHERE n.nv > 0 AND c.ncen > 0
    ),
    assigned AS (
        SELECT vec_id, cell FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY simq DESC, cell ASC
            ) AS rn FROM sims
        ) WHERE rn = 1
    ),
    qprobe AS (
        SELECT vec_id AS query_id, cell FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY simq DESC, cell ASC
            ) AS rn FROM sims WHERE vec_id % 100 = 0
        ) WHERE rn <= 4
    ),
    cand AS (
        SELECT q.query_id, a.vec_id AS neighbor_id
        FROM qprobe q JOIN assigned a USING (cell)
    ),
    scored AS (
        SELECT c.query_id, c.neighbor_id,
               round(list_dot_product(q.v, n.v)
                     / (sqrt(list_dot_product(q.v, q.v))
                        * sqrt(list_dot_product(n.v, n.v))), 6) AS cosine
        FROM cand c
        JOIN vecs q ON q.vec_id = c.query_id
        JOIN vecs n ON n.vec_id = c.neighbor_id
        WHERE list_dot_product(q.v, q.v) > 0
          AND list_dot_product(n.v, n.v) > 0
    )
    SELECT query_id, neighbor_id, cosine FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rn FROM scored
    ) WHERE rn <= 10
    """,
    doc="IVF approximate top-k: centroid cells + nprobe probing, relational IVF "
        "layout.  FULL oracle (upgraded r11 from rows-only): with deterministic "
        "centroids (vec_id % 31) the whole search is SQL-replayable — cell "
        "assignment argmax over the quantized similarity floor(dot/(sqrt*sqrt)"
        "*1e6+0.5) on exact 1e-6 integer units (identical IEEE arithmetic in "
        "the numpy kernel, the JVM probe, and DuckDB), nprobe=4 probing, and "
        "round-6 cosine ranking inside the probed cells.",
)
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centroids = emb.filter(F.col("vec_id") % 31 == 0).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return ivf_topk(emb, queries, centroids, k=10, nprobe=4)


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH {_SRP_REPLAY_CTES},
    kept AS (
        SELECT b.vec_id AS id, b.t, b.bucket
        FROM bk b
        JOIN (SELECT t, bucket, COUNT(*) AS c FROM bk GROUP BY 1, 2) n
          USING (t, bucket)
        WHERE n.c <= 1024
    ),
    pairs AS (
        SELECT DISTINCT l.id AS id_a, r.id AS id_b
        FROM kept l JOIN kept r USING (t, bucket)
        WHERE l.id < r.id
    ),
    scored AS (
        SELECT p.id_a, p.id_b,
               round(list_dot_product(a.v, b2.v)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(b2.v, b2.v))), 6) AS cosine
        FROM pairs p
        JOIN vecs a  ON a.vec_id  = p.id_a
        JOIN vecs b2 ON b2.vec_id = p.id_b
        WHERE list_dot_product(a.v, a.v) > 0
          AND list_dot_product(b2.v, b2.v) > 0
    )
    SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.30
    """,
    doc="embedding-cosine near-dup pairs via SRP-LSH buckets (threshold 0.30 on the "
        "random test vectors so the check exercises non-empty output; production "
        "near-dup would use ≥0.95).  FULL oracle (upgraded r11 from rows-only): "
        "DuckDB replays the md5-Rademacher buckets, the 1024 hot-bucket cap, the "
        "distinct id_a < id_b candidate pairs, and the round-6 cosine threshold "
        "bit-for-bit (shared _SRP_REPLAY_CTES with knn_lsh).",
)
def q_cos_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.similarity import cosine_dedup_pairs

    return cosine_dedup_pairs(load_table(spark, sf_dir, "embeddings"), threshold=0.30)


# ===========================================================================
# Streaming batch twins (events)
# ===========================================================================

@register(
    "windowed_event_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2, 3
    """,
    doc="§2.10 tumbling event-time window aggregation (batch twin of the streaming op)",
)
def q_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window(F.col("ts"), "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
    FROM sessions GROUP BY user_id, session_id
    """,
    doc="sessionization: 30-min-gap sessions via lag + running sum windows "
        "(the stateful-streaming analog expressed relationally)",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(Window.unboundedPreceding, 0)
    gap = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    flagged = events.withColumn(
        "is_new",
        F.when(F.lag("ts").over(w).isNull() | (gap > 30 * 60), 1).otherwise(0),
    )
    sessions = flagged.withColumn("session_id", F.sum("is_new").over(run).cast("bigint"))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("session_value"),
    )


# ===========================================================================
# §2.10 Real Structured Streaming (readStream -> AvailableNow -> memory sink)
# ===========================================================================

@register(
    "streaming_windowed_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2, 3
    """,
    doc="§2.10 REAL streaming run: readStream file source split into 3 time-range "
        "micro-batches (maxFilesPerTrigger=1), watermark + tumbling window agg, "
        "Trigger.AvailableNow, memory sink — cross-batch window state and "
        "batch-by-batch watermark advancement exercised; must equal the batch twin "
        "(and its oracle) on fully-available in-order input",
)
def q_stream_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.streaming.events import (
        read_events_stream_multibatch,
        run_available_now_to_memory,
    )

    stream = read_events_stream_multibatch(spark, sf_dir, n_batches=3)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window(F.col("ts"), "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    # no_data_batches=False (r17): complete mode rewrites the full
    # result every trigger, so the trailing watermark-only round can't
    # change the table — it only costs a state reload/commit cycle
    return run_available_now_to_memory(
        agg, "stream_windowed_counts", "complete", no_data_batches=False
    )


@register(
    "streaming_dedup_ids",
    oracle="SELECT event_id, user_id, event_type, value FROM events",
    doc="§2.10 stateful streaming dedup: dropDuplicatesWithinWatermark on event_id "
        "over a readStream source split into 3 time-range micro-batches — the dedup "
        "state store persists across batches and the watermark advances per batch "
        "(ids are unique in the fixture, so the streaming result must equal the "
        "full table — the dedup is exercised, not lossy)",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.streaming.events import (
        read_events_stream_multibatch,
        run_available_now_to_memory,
    )
    from etl_tiki_webscraping_spark.streaming.events import streaming_dedup

    stream = read_events_stream_multibatch(spark, sf_dir, n_batches=3)
    deduped = streaming_dedup(stream, keys=["event_id"]).select(
        "event_id", "user_id", "event_type", "value"
    )
    # no_data_batches=False (r17): dedup emits each surviving row IN
    # the batch it arrives (state only suppresses later duplicates), so
    # the trailing watermark-only round emits nothing
    return run_available_now_to_memory(
        deduped, "stream_dedup_ids", "append", no_data_batches=False
    )


# ===========================================================================
# §2.1 S3 keyed lookup + §2.12 pipeline assembly
# ===========================================================================

@register(
    "keyed_lookup_scan",
    oracle="""
    SELECT n_nationkey, upper(n_name) AS detail_name, n_nationkey * 2 AS detail_code
    FROM nation WHERE n_nationkey % 5 <> 3
    """,
    doc="S3 per-key lookup enrichment via mapInPandas (dags/etl.py:89-96); fetcher "
        "injected and deterministic; keys whose lookup fails (returns None) are skipped",
)
def q_keyed_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.sources.http import FetchConfig, keyed_lookup_source

    keys = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    def fetch_row(row: dict, cfg: FetchConfig) -> dict | None:
        if row["n_nationkey"] % 5 == 3:
            return None  # failed lookup -> key skipped
        return {
            "n_nationkey": row["n_nationkey"],
            "detail_name": row["n_name"].upper(),
            "detail_code": row["n_nationkey"] * 2,
        }

    return keyed_lookup_source(
        keys, fetch_row, "n_nationkey bigint, detail_name string, detail_code bigint"
    ).select("n_nationkey", "detail_name", "detail_code")


_PIPELINE_WAREHOUSE: list[str] = []  # memoized per process (content is sf-independent)


def _pipeline_warehouse(spark: SparkSession) -> str:
    """Build the e2e warehouse: TWO pipeline runs over injected
    deterministic fetchers, so the PK upserts actually resolve
    conflicts (run 2 overwrites a subset and inserts new rows) and the
    FK gate actually drops a row (run 2 scrapes an orphan product whose
    shop lookup fails).  Memoized — the three pipeline_e2e* queries
    share one build."""
    import os
    import tempfile
    from decimal import Decimal

    from etl_tiki_webscraping_spark.plans.pipeline import (
        PipelineFetchers,
        run_pipeline,
    )
    from etl_tiki_webscraping_spark.sources.http import FetchConfig

    if _PIPELINE_WAREHOUSE and os.path.isdir(_PIPELINE_WAREHOUSE[0]):
        return _PIPELINE_WAREHOUSE[0]

    sitemap = [
        {"url_key": "electronics", "child": [{"url_key": "phones"}, {"url_key": "laptops"}]},
        {"url_key": "fashion", "child": [{"url_key": "shoes"}]},
    ]
    shop_of = {"phones": 0, "laptops": 1, "shoes": 0}

    def product_page(row, page, cfg):
        if page > 3:
            return None
        sc = row["sub_category"]
        return [
            {
                "product_id": f"p-{sc}-{page}-{j}",
                "name": f"Product {sc} {page} {j}",
                "category_path": f"{sc}/p-{sc}-{page}-{j}.html",
                "price": Decimal("10.00"),
                "price_max": Decimal("20.00"),
                "final_price": Decimal("9.00"),
                "final_price_max": Decimal("18.00"),
                "shop_id": f"shop-{shop_of[sc]}",
            }
            for j in range(3)
        ]

    def shop_detail(row, cfg):
        return {
            "shop_id": row["shop_id"],
            "shop_name": f"Shop {row['shop_id']}",
            "good_review_percent": Decimal("99.10"),
            "score": Decimal("4.50"),
            "customer_id": "c1",
            "phone_number": "555",
            "rating_avg": Decimal("4.40"),
            "rating_count": 10,
            "response_time": "fast",
            "product_total": 9,
            "sale_on_sendo": "5 years",
            "time_prepare_product": "1 day",
            "warehourse_region_name": "north",
        }

    def rating_page(row, page, cfg):
        if page > 1:
            return None
        return [
            {
                "rating_id": f"r-{row['shop_id']}-{i}",
                "shop_id": row["shop_id"],
                "address": "x",
                "star": 4,
                "comment": "ok",
                "status": "approved",
                "update_time": "05/03/2024",
                "customer_id": f"c{i}",
                "user_name": f"u{i}",
                "product_name": "p",
                "product_path": "p.html",
                "price": Decimal("10.00"),
            }
            for i in range(3)
        ]

    # --- run 2: the NEXT day's scrape (dags/etl.py:296-297 daily rerun):
    # pages 1-2 re-scraped with new prices/names (upsert UPDATE leg),
    # page 3 not reached (stays at run-1 values), one orphan product
    # whose shop lookup fails (FK gate drops it), shops re-scraped with
    # new scores, ratings 1 updated + 3 newly inserted per shop.
    def product_page2(row, page, cfg):
        if page > 2:
            return None
        sc = row["sub_category"]
        rows = [
            {
                "product_id": f"p-{sc}-{page}-{j}",
                "name": f"Product2 {sc} {page} {j}",
                "category_path": f"{sc}/p-{sc}-{page}-{j}.html",
                "price": Decimal("11.00"),
                "price_max": Decimal("20.00"),
                "final_price": Decimal("10.00"),
                "final_price_max": Decimal("18.00"),
                "shop_id": f"shop-{shop_of[sc]}",
            }
            for j in range(3)
        ]
        if sc == "shoes" and page == 1:
            rows.append(
                {
                    "product_id": "p-orphan-1",
                    "name": "Orphan product",
                    "category_path": "shoes/p-orphan-1.html",
                    "price": Decimal("1.00"),
                    "price_max": Decimal("1.00"),
                    "final_price": Decimal("1.00"),
                    "final_price_max": Decimal("1.00"),
                    "shop_id": "shop-9",  # lookup fails -> FK gate drops it
                }
            )
        return rows

    def shop_detail2(row, cfg):
        if row["shop_id"] == "shop-9":
            return None  # unresolvable shop: key skipped (S3 contract)
        d = shop_detail(row, cfg)
        d.update(
            shop_name=f"Shop {row['shop_id']} v2",
            score=Decimal("4.70"),
            rating_count=12,
            product_total=10,
        )
        return d

    def rating_page2(row, page, cfg):
        if page > 1:
            return None
        return [
            {
                "rating_id": f"r-{row['shop_id']}-{i}",
                "shop_id": row["shop_id"],
                "address": "x",
                "star": 5,
                "comment": "updated",
                "status": "approved",
                "update_time": "06/03/2024",
                "customer_id": f"c{i}",
                "user_name": f"u{i}",
                "product_name": "p",
                "product_path": "p.html",
                "price": Decimal("12.00"),
            }
            for i in (1, 3)
        ]

    warehouse = tempfile.mkdtemp(prefix="pipeline-e2e-") + "/wh"
    cfg = FetchConfig(max_retries=0, backoff_seconds=0.0)
    run_pipeline(
        spark,
        PipelineFetchers(
            sitemap=lambda: sitemap,
            product_page=product_page,
            shop_detail=shop_detail,
            rating_page=rating_page,
        ),
        warehouse,
        cfg,
    )
    run_pipeline(
        spark,
        PipelineFetchers(
            sitemap=lambda: sitemap,
            product_page=product_page2,
            shop_detail=shop_detail2,
            rating_page=rating_page2,
        ),
        warehouse,
        cfg,
    )
    _PIPELINE_WAREHOUSE[:] = [warehouse]
    return warehouse


@register(
    "pipeline_e2e",
    oracle="""
    WITH sc(category, sub_category, shop_id) AS (
      VALUES ('electronics','phones','shop-0'),
             ('electronics','laptops','shop-1'),
             ('fashion','shoes','shop-0')
    ),
    b1 AS (
      SELECT 'p-'||sub_category||'-'||page||'-'||j AS product_id,
             'Product '||sub_category||' '||page||' '||j AS name,
             sub_category||'/p-'||sub_category||'-'||page||'-'||j||'.html' AS category_path,
             10.00 AS price, 20.00 AS price_max,
             9.00 AS final_price, 18.00 AS final_price_max,
             shop_id, category, sub_category, 1 AS batch
      FROM sc, range(1,4) p(page), range(0,3) jj(j)
    ),
    b2 AS (
      -- run 2 re-scrapes pages 1-2 only; its orphan (shop-9) row is
      -- dropped by the FK gate before load and never reaches the table
      SELECT 'p-'||sub_category||'-'||page||'-'||j AS product_id,
             'Product2 '||sub_category||' '||page||' '||j AS name,
             sub_category||'/p-'||sub_category||'-'||page||'-'||j||'.html' AS category_path,
             11.00 AS price, 20.00 AS price_max,
             10.00 AS final_price, 18.00 AS final_price_max,
             shop_id, category, sub_category, 2 AS batch
      FROM sc, range(1,3) p(page), range(0,3) jj(j)
    ),
    merged AS (
      SELECT *, row_number() OVER (PARTITION BY product_id ORDER BY batch DESC) AS rn
      FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2) u
    )
    SELECT product_id, name, category_path,
           CAST(price AS DOUBLE) AS price,
           CAST(price_max AS DOUBLE) AS price_max,
           CAST(final_price AS DOUBLE) AS final_price,
           CAST(final_price_max AS DOUBLE) AS final_price_max,
           shop_id, category, sub_category
    FROM merged WHERE rn = 1
    """,
    doc="§2.12 O1-O5 full Sendo-shaped pipeline on injected deterministic "
        "fetchers, TWO daily runs: sitemap -> paginated products -> shop lookups "
        "-> ratings -> FK-ordered PK upserts into a parquet warehouse. The oracle "
        "replays the same scrape data as SQL literals with last-writer-wins per PK "
        "(the upsert) and omits the FK-dropped orphan — the final product_detail "
        "table must hash-match",
)
def q_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.plans.pipeline import warehouse_table

    t = warehouse_table(spark, _pipeline_warehouse(spark), "product_detail")
    return t.select(
        "product_id",
        "name",
        "category_path",
        F.col("price").cast("double").alias("price"),
        F.col("price_max").cast("double").alias("price_max"),
        F.col("final_price").cast("double").alias("final_price"),
        F.col("final_price_max").cast("double").alias("final_price_max"),
        "shop_id",
        "category",
        "sub_category",
    )


@register(
    "pipeline_e2e_shops",
    oracle="""
    WITH shops(shop_id) AS (VALUES ('shop-0'), ('shop-1'))
    SELECT shop_id,
           'Shop '||shop_id||' v2' AS shop_name,
           CAST(99.10 AS DOUBLE) AS good_review_percent,
           CAST(4.70 AS DOUBLE) AS score,
           'c1' AS customer_id, '555' AS phone_number,
           CAST(4.40 AS DOUBLE) AS rating_avg,
           CAST(12 AS INT) AS rating_count,
           'fast' AS response_time,
           CAST(10 AS INT) AS product_total,
           '5 years' AS sale_on_sendo, '1 day' AS time_prepare_product,
           'north' AS warehourse_region_name
    FROM shops
    """,
    doc="pipeline_e2e warehouse, shop_info table: run-2 shop re-scrape must have "
        "overwritten EVERY non-key column (ON DUPLICATE KEY UPDATE semantics, "
        "dags/etl.py:218-246); the unresolvable shop-9 never entered",
)
def q_pipeline_shops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.plans.pipeline import warehouse_table

    t = warehouse_table(spark, _pipeline_warehouse(spark), "shop_info")
    return t.select(
        "shop_id",
        "shop_name",
        F.col("good_review_percent").cast("double").alias("good_review_percent"),
        F.col("score").cast("double").alias("score"),
        "customer_id",
        "phone_number",
        F.col("rating_avg").cast("double").alias("rating_avg"),
        "rating_count",
        "response_time",
        "product_total",
        "sale_on_sendo",
        "time_prepare_product",
        "warehourse_region_name",
    )


@register(
    "pipeline_e2e_ratings",
    oracle="""
    WITH shops(shop_id) AS (VALUES ('shop-0'), ('shop-1')),
    b1 AS (
      SELECT 'r-'||shop_id||'-'||i AS rating_id, shop_id, 'x' AS address,
             4 AS star, 'ok' AS comment, 'approved' AS status,
             DATE '2024-03-05' AS update_time,
             'c'||i AS customer_id, 'u'||i AS user_name,
             'p' AS product_name, 'p.html' AS product_path,
             10.00 AS price, 1 AS batch
      FROM shops, range(0,3) t(i)
    ),
    b2 AS (
      SELECT 'r-'||shop_id||'-'||i AS rating_id, shop_id, 'x' AS address,
             5 AS star, 'updated' AS comment, 'approved' AS status,
             DATE '2024-03-06' AS update_time,
             'c'||i AS customer_id, 'u'||i AS user_name,
             'p' AS product_name, 'p.html' AS product_path,
             12.00 AS price, 2 AS batch
      FROM shops, (VALUES (1), (3)) v(i)
    ),
    merged AS (
      SELECT *, row_number() OVER (PARTITION BY rating_id ORDER BY batch DESC) AS rn
      FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2) u
    )
    SELECT rating_id, shop_id, address, star, comment, status, update_time,
           customer_id, user_name, product_name, product_path,
           CAST(price AS DOUBLE) AS price
    FROM merged WHERE rn = 1
    """,
    doc="pipeline_e2e warehouse, rating table: run 2 updated rating 1 and "
        "inserted rating 3 per shop; ratings 0/2 keep run-1 values; update_time "
        "parsed from dd/MM/yyyy strings during load (F3, dags/etl.py:164-166)",
)
def q_pipeline_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.plans.pipeline import warehouse_table

    t = warehouse_table(spark, _pipeline_warehouse(spark), "rating")
    return t.select(
        "rating_id",
        "shop_id",
        "address",
        "star",
        "comment",
        "status",
        "update_time",
        "customer_id",
        "user_name",
        "product_name",
        "product_path",
        F.col("price").cast("double").alias("price"),
    )


# ===========================================================================
# Multimodal columns (binary payload + typed metadata; stubbed decode)
# ===========================================================================

@register(
    "multimodal_image_features",
    oracle="""
    SELECT doc_id AS media_id, 8 AS width, 8 AS height,
           CAST(coalesce(list_sum(list_transform(range(1, least(strlen(text), 64) + 1),
                    i -> ascii(substr(text, i, 1)))), 0) AS BIGINT) AS luma_sum,
           round(coalesce(list_sum(list_transform(range(1, least(strlen(text), 64) + 1),
                    i -> ascii(substr(text, i, 1)))), 0) / 64.0, 6) AS mean_luma
    FROM documents
    """,
    doc="binary media column -> mapInPandas decode/feature kernel (deterministic "
        "fake decoder; real impl swaps _decode_image_impl only). The catalog "
        "projection is driver-canonicalizer-safe: the feature array<float> is "
        "digested to a scalar checksum (sum of the 64 feature values, exact in "
        "float32 since values are byte codes); the full array output stays "
        "covered by tests/test_multimodal.py. Oracle recomputes the fake "
        "decoder's byte arithmetic in SQL (documents are ascii).",
)
def q_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.multimodal import extract_image_features

    media = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("media_id"), F.encode("text", "utf-8").alias("content"))
    )
    feats = extract_image_features(media)
    return feats.select(
        "media_id",
        "width",
        "height",
        F.aggregate("feature", F.lit(0.0), lambda acc, x: acc + x).cast("bigint").alias("luma_sum"),
        F.round(F.col("mean_luma"), 6).alias("mean_luma"),
    )


@register(
    "multimodal_image_resize",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(ry AS INT) AS ry, CAST(rx AS INT) AS rx,
           round((
               CASE WHEN (2*ry)*8 + 2*rx + 1 <= strlen(text)
                    THEN ascii(substr(text, CAST((2*ry)*8 + 2*rx + 1 AS INT), 1)) ELSE 0 END
             + CASE WHEN (2*ry)*8 + 2*rx + 2 <= strlen(text)
                    THEN ascii(substr(text, CAST((2*ry)*8 + 2*rx + 2 AS INT), 1)) ELSE 0 END
             + CASE WHEN (2*ry+1)*8 + 2*rx + 1 <= strlen(text)
                    THEN ascii(substr(text, CAST((2*ry+1)*8 + 2*rx + 1 AS INT), 1)) ELSE 0 END
             + CASE WHEN (2*ry+1)*8 + 2*rx + 2 <= strlen(text)
                    THEN ascii(substr(text, CAST((2*ry+1)*8 + 2*rx + 2 AS INT), 1)) ELSE 0 END
           ) / 4.0, 6) AS px
    FROM documents,
         (SELECT unnest(range(0, 4)) AS ry),
         (SELECT unnest(range(0, 4)) AS rx)
    WHERE text IS NOT NULL
    """,
    doc="box-downsample resize over the binary media column "
        "(operators/multimodal.py::resize_images — the resize leg of "
        "the decode/feature/resize/frame-sample surface): each output "
        "pixel is the EXACT mean of its source block, so the oracle "
        "replays every one of the 4x4 output cells from the fake "
        "decoder's byte arithmetic (documents are ascii; blocks of 4 "
        "uint8 values mean exactly in float32).  Real PNG/BMP inputs "
        "take the same kernel via the shared decoder (unit-tested).",
)
def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.multimodal import resize_images

    media = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(F.col("doc_id").alias("media_id"), F.encode("text", "utf-8").alias("content"))
    )
    resized = resize_images(media, out_w=4, out_h=4)
    return resized.select(
        "media_id", F.posexplode("pixels").alias("pos", "val")
    ).select(
        "media_id",
        (F.col("pos") / 4).cast("int").alias("ry"),
        (F.col("pos") % 4).cast("int").alias("rx"),
        F.round(F.col("val").cast("double"), 6).alias("px"),
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(unnest(range(0, CAST(ceil(strlen(text) / 32.0) AS BIGINT))) AS INT) AS frame_index
    FROM documents WHERE text IS NOT NULL AND strlen(text) > 0
    """,
    doc="1->N frame sampling over a binary column via mapInPandas (video demux "
        "shape); frame indexes oracle-checked against byte-length arithmetic "
        "(documents are ascii so strlen == byte length)",
)
def q_mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.multimodal import sample_frames

    media = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("media_id"), F.encode("text", "utf-8").alias("content"))
    )
    return sample_frames(media, every_n_bytes=32).select("media_id", "frame_index")


# ===========================================================================
# §2.3/§2.7 extensions: as-of join + remaining agg/window families
# ===========================================================================

@register(
    "asof_join_events_orders",
    oracle="""
    WITH o AS (
        SELECT o_custkey, o_orderdate,
               CAST(MAX(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS order_price
        FROM orders GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id, o.o_orderdate AS matched_order_ts, o.order_price
    FROM events e
    ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    doc="as-of (backward) join: each event matched to the same customer's most "
        "recent order at-or-before the event — merge-scan union + last-value "
        "window (ONE shuffle, no |L|x|R| range explosion); DuckDB native ASOF "
        "JOIN as the oracle",
)
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.relational import asof_join

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").cast("timestamp").alias("order_ts"),
        )
        .agg(F.max(F.col("o_totalprice").cast("decimal(18,6)")).cast("double").alias("order_price"))
        .select("user_id", F.col("order_ts").alias("matched_order_ts"), "order_price")
    )
    return asof_join(
        events, orders, on="user_id", left_ts="ts", right_ts="matched_order_ts",
        right_cols=["matched_order_ts", "order_price"],
    ).select("event_id", "user_id", "matched_order_ts", "order_price")


def _asof_orders_cte() -> str:
    return """
    o AS (
        SELECT o_custkey, o_orderdate,
               CAST(MAX(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                   AS order_price
        FROM orders GROUP BY 1, 2
    )
    """


@register(
    "asof_join_forward",
    oracle=f"""
    WITH {_asof_orders_cte()}
    SELECT e.event_id, e.user_id,
           m.order_ts AS matched_order_ts, m.order_price
    FROM events e
    LEFT JOIN LATERAL (
        SELECT o.o_orderdate AS order_ts, o.order_price
        FROM o
        WHERE o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
        ORDER BY o.o_orderdate LIMIT 1
    ) m ON true
    """,
    doc="as-of FORWARD join (pandas merge_asof direction='forward'): "
        "each event matched to the same customer's NEXT order at-or-"
        "after the event.  Same merge-scan as the backward form with "
        "the sort flipped — one shuffle, one sort, no |L|x|R| range "
        "explosion.  The oracle replays per-row via LATERAL argmin "
        "(fine at oracle scale; the merge-scan is the 100 TB shape).",
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.relational import asof_join

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").cast("timestamp").alias("order_ts"),
        )
        .agg(F.max(F.col("o_totalprice").cast("decimal(18,6)")).cast("double").alias("order_price"))
        .select("user_id", F.col("order_ts").alias("matched_order_ts"), "order_price")
    )
    return asof_join(
        events, orders, on="user_id", left_ts="ts", right_ts="matched_order_ts",
        right_cols=["matched_order_ts", "order_price"], direction="forward",
    ).select("event_id", "user_id", "matched_order_ts", "order_price")


@register(
    "asof_join_nearest",
    oracle=f"""
    WITH {_asof_orders_cte()}
    SELECT e.event_id, e.user_id,
           m.order_ts AS matched_order_ts, m.order_price
    FROM events e
    LEFT JOIN LATERAL (
        SELECT o.o_orderdate AS order_ts, o.order_price
        FROM o
        WHERE o.o_custkey = e.user_id
        ORDER BY CASE WHEN epoch_us(e.ts) >= epoch_us(o.o_orderdate)
                      THEN epoch_us(e.ts) - epoch_us(o.o_orderdate)
                      ELSE epoch_us(o.o_orderdate) - epoch_us(e.ts) END,
                 o.o_orderdate
        LIMIT 1
    ) m ON true
    """,
    doc="as-of NEAREST join (pandas merge_asof direction='nearest'): "
        "each event matched to the same customer's closest order in "
        "time, ties preferring the earlier (backward) order.  Both "
        "directional fills run over ONE exchange (the second window "
        "re-sorts the same shuffle output) and distances compare on "
        "exact integer microseconds.  Oracle: LATERAL argmin over "
        "(|us delta|, order_ts) — the same tie rule spelled out.",
)
def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.relational import asof_join

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").cast("timestamp").alias("order_ts"),
        )
        .agg(F.max(F.col("o_totalprice").cast("decimal(18,6)")).cast("double").alias("order_price"))
        .select("user_id", F.col("order_ts").alias("matched_order_ts"), "order_price")
    )
    return asof_join(
        events, orders, on="user_id", left_ts="ts", right_ts="matched_order_ts",
        right_cols=["matched_order_ts", "order_price"], direction="nearest",
    ).select("event_id", "user_id", "matched_order_ts", "order_price")


@register(
    "cube_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="§2.4 CUBE aggregation: all 4 grouping combinations in one pass "
        "(partial-agg + Expand, single shuffle)",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("sum_qty"),
        )
    )


@register(
    "grouping_sets_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="§2.4 GROUPING SETS via the Spark SQL surface (Spark SQL IS the engine's "
        "query language; no parser of our own, SURVEY §7 non-goals)",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("__gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "running_window_sum",
    oracle="""
    SELECT o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total
    FROM orders
    """,
    doc="§2.7 running (cumulative) window aggregate per key — decimal "
        "accumulation so the result is order-exact across engines",
)
def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w).cast("double").alias("running_total"),
        )
    )


@register(
    "lag_lead_delta",
    oracle="""
    SELECT event_id,
           value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta_prev,
           lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) - value AS delta_next
    FROM events
    """,
    doc="§2.7 lag/lead window offsets per key (event-over-event deltas)",
)
def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta_prev"),
        (F.lead("value").over(w) - F.col("value")).alias("delta_next"),
    )


# ===========================================================================
# Skew handling + remaining scalar/sketch surface
# ===========================================================================

@register(
    "skew_salted_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus,
           CAST(l.l_extendedprice AS DOUBLE) AS price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey % 50 = 0
    """,
    doc="skew-resistant salted equi-join: fact keys salted 16 ways, dim side "
        "replicated per salt — result must be IDENTICAL to the plain join "
        "(salting changes the shuffle layout, never the semantics)",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.relational import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 50 == 0)
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus")
    )
    return salted_join(li, orders, on="l_orderkey", salt_buckets=16).select(
        "l_orderkey",
        "l_linenumber",
        "o_orderstatus",
        F.col("l_extendedprice").cast("double").alias("price"),
    )


@register(
    "url_build",
    oracle="""
    SELECT n_nationkey,
           printf('https://api.example.com/v1/%s/items?page=%d',
                  replace(lower(n_name), ' ', '-'), n_nationkey % 7) AS url
    FROM nation
    """,
    doc="F2 URL construction from key + page columns (dags/etl.py:53,91,135) as "
        "codegen'd format_string",
)
def q_url_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.scalar import build_url

    return load_table(spark, sf_dir, "nation").select(
        "n_nationkey",
        build_url(
            "https://api.example.com/v1/%s/items?page=%d",
            F.regexp_replace(F.lower(F.col("n_name")), " ", "-"),
            F.col("n_nationkey") % 7,
        ).alias("url"),
    )


def _approx_distinct_oracle() -> str:
    from etl_tiki_webscraping_spark.operators.sketches import hll_oracle_sql

    return "WITH " + hll_oracle_sql(
        "SELECT event_type, user_id FROM events",
        "user_id",
        ["event_type"],
        lg_k=11,
        out_col="approx_users",
    )


@register(
    "approx_distinct_users",
    oracle=_approx_distinct_oracle(),
    doc="approx-distinct users per event_type on the PORTABLE HLL "
        "(operators/sketches.py::hll_build/hll_estimate — rows-only -> "
        "bit-strict, r13 VERDICT ask #3): the r13 sketch machinery that "
        "made hll_sketch_rollup hash-strict applied to the original "
        "approx_count_distinct query, at lg_k=11 so a second, larger "
        "register grid sits under the driver's oracle gate (the "
        "rollup query covers lg_k=8; 2048 registers keep the worst "
        "per-type error under 1% at every fixture scale).  Every "
        "step replays in DuckDB: md5 register index + leading-zero "
        "rank, exact bigint harmonic denominator, ONE IEEE division by "
        "a Python-precomputed literal, linear-counting correction from "
        "a precomputed table.  Spark's built-in HLL++ "
        "(approx_count_distinct) remains the accuracy cross-check in "
        "tests/test_sketches.py.  Scale shape: distinct pre-aggregate "
        "-> bounded |types| x 2048 register rows -> tiny estimate.",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.sketches import (
        hll_build,
        hll_estimate,
    )

    ev = load_table(spark, sf_dir, "events")
    reg = hll_build(ev, "user_id", group_cols=["event_type"], lg_k=11)
    return hll_estimate(
        reg, group_cols=["event_type"], lg_k=11, out_col="approx_users"
    )


@register(
    "tfidf_top_terms",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks WHERE term <> '' GROUP BY 1, 2
    ),
    df AS (
        SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tf GROUP BY 1
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
    scored AS (
        SELECT tf.doc_id, tf.term,
               round(tf.tf * ln((SELECT n_docs FROM n) / df.df), 6) AS tfidf
        FROM tf JOIN df USING (term)
    ),
    ranked AS (
        SELECT doc_id, term, tfidf,
               row_number() OVER (ORDER BY tfidf DESC, doc_id ASC, term ASC) AS rn
        FROM scored
    )
    SELECT doc_id, term, tfidf FROM ranked WHERE rn <= 100
    """,
    doc="tf-idf over whitespace terms: explode -> per-doc tf -> doc-frequency join "
        "-> idf weight -> global top-100 via orderBy().limit() so Spark plans "
        "TakeOrderedAndProject (per-partition local top-100 + driver merge), NOT "
        "a partition-less row_number window that would funnel every scored row "
        "through one task at scale (score rounded to 6dp before ranking so the "
        "global order is engine-independent)",
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.text import tokenize_ws

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.trim("text") != ""))
    )
    n_docs = docs.count()
    toks = docs.select(
        "doc_id", F.explode(tokenize_ws(F.lower(F.col("text")))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(dfreq, on="term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("tfidf"),
    )
    return (
        scored.orderBy(F.col("tfidf").desc(), F.col("doc_id").asc(), F.col("term").asc())
        .limit(100)
        .select("doc_id", "term", "tfidf")
    )


@register(
    "streaming_stateful_sessions",
    oracle="""
    WITH e AS (SELECT user_id, ts, epoch_ms(ts) AS ms, value FROM events),
    flagged AS (
        SELECT *, CASE WHEN ms - LAG(ms) OVER (PARTITION BY user_id ORDER BY ms)
                            > 1800000
                       OR LAG(ms) OVER (PARTITION BY user_id ORDER BY ms) IS NULL
                  THEN 1 ELSE 0 END AS is_new
        FROM e
    ),
    sess AS (
        SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ms
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged
    ),
    agg AS (
        SELECT user_id,
               MIN(date_trunc('milliseconds', ts)) AS session_start,
               MAX(date_trunc('milliseconds', ts)) AS session_end,
               MAX(ms) AS last_ms,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               SUM(value) AS sum_value
        FROM sess GROUP BY user_id, sid
    ),
    wm AS (SELECT MAX(ms) AS wm FROM e)
    SELECT user_id, session_start, session_end, n_events, sum_value
    FROM agg, wm
    WHERE last_ms + 1800000 <= wm
    """,
    doc="custom stateful streaming operator via applyInPandasWithState: per-user "
        "gap sessionization with event-time timeouts.  FULL oracle (upgraded "
        "r7 from rows-only): the SQL replays ms-resolution gap splitting and "
        "the EMISSION RULE — a session emits iff its timeout (last event + "
        "gap) is at or before the final watermark (max event time, 0s delay); "
        "each user's trailing open session stays in state and must NOT "
        "appear.  Timestamps truncate to ms exactly as the state kernel "
        "stores them (batch twin at second resolution: sessionize_events)",
)
def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.streaming.events import (
        read_events_stream,
        run_available_now_to_memory,
        sessionize_stream,
    )

    stream = read_events_stream(spark, sf_dir)
    sessions = sessionize_stream(stream, gap="30 minutes")
    return run_available_now_to_memory(sessions, "stream_stateful_sessions", "append")


@register(
    "custom_datasource_scan",
    oracle="""
    SELECT CAST(unnest(range(0, n_nationkey * 3 + 5)) AS BIGINT) AS item_id,
           CAST(n_nationkey AS BIGINT) AS k
    FROM nation
    """,
    doc="Spark-4 custom DataSource (python data source API): one InputPartition "
        "per key, pagination-until-empty inside the partition read — the "
        "planner-visible form of the mapInPandas source builders (S1-S4 at scale)",
)
def q_custom_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json

    from etl_tiki_webscraping_spark.sources.datasource import PaginatedHttpDataSource

    spark.dataSource.register(PaginatedHttpDataSource)
    keys = [
        {"k": r["n_nationkey"]}
        for r in load_table(spark, sf_dir, "nation").select("n_nationkey").collect()
    ]  # source DESCRIPTOR (like a URL list) — config, not data movement
    return (
        spark.read.format("paginated_http")
        .schema("item_id bigint, k bigint")
        .option("keys", json.dumps(keys))
        .option("fetcher", "etl_tiki_webscraping_spark.sources.datasource:synthetic_fetch_page")
        .load()
    )


@register(
    "corpus_quality_filter",
    oracle=r"""
    WITH feats AS (
        SELECT doc_id, lang, source,
               len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')) AS n_tokens,
               CAST(length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS DOUBLE)
                   / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio,
               CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                        t -> t IN ('the','and','of','to','in','is','it','that','for','with'))) AS DOUBLE)
                   / CAST(greatest(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                        t -> t <> '')), 1) AS DOUBLE) AS stopword_ratio
        FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id, lang, source, CAST(n_tokens AS BIGINT) AS n_tokens
    FROM feats
    WHERE n_tokens >= 5 AND punct_ratio <= 0.3 AND stopword_ratio >= 0.01
    """,
    doc="the composite pretraining-corpus gate: keep docs passing ALL quality "
        "heuristics (length, punctuation noise, stopword density) — one "
        "codegen'd filter pass, no UDF, no shuffle",
)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.text import (
        punct_ratio,
        stopword_ratio,
        token_count,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            token_count("text").alias("n_tokens"),
            punct_ratio("text").alias("__punct"),
            stopword_ratio("text").alias("__stop"),
        )
        .filter((F.col("n_tokens") >= 5) & (F.col("__punct") <= 0.3) & (F.col("__stop") >= 0.01))
        .drop("__punct", "__stop")
    )


@register(
    "deterministic_split",
    oracle="""
    SELECT doc_id,
           CASE
               WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
               WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
               ELSE 'test'
           END AS split
    FROM documents
    """,
    doc="deterministic 80/10/10 train/val/test split by content-independent key "
        "hash (md5 prefix) — reproducible across engines, runs and cluster sizes; "
        "the sampling primitive a training pipeline needs instead of rand()",
)
def q_det_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("bigint") % 100
    )
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
    )


@register(
    "pivot_event_matrix",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
           CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error,
           CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
           CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view
    FROM events GROUP BY user_id
    """,
    doc="pivot: per-user event-type count matrix; explicit pivot values so Spark "
        "skips the extra distinct-discovery job (and the output schema is stable)",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )


@register(
    "unpivot_stack",
    oracle="""
    SELECT o_orderkey, 'total' AS measure, CAST(o_totalprice AS DOUBLE) AS amount FROM orders
    UNION ALL
    SELECT o_orderkey, 'key_mod' AS measure, CAST(o_orderkey % 1000 AS DOUBLE) AS amount FROM orders
    """,
    doc="unpivot (wide->long) via the native unpivot/melt operator — narrow, "
        "no shuffle",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("total"),
            (F.col("o_orderkey") % 1000).cast("double").alias("key_mod"),
        )
        .unpivot(["o_orderkey"], ["total", "key_mod"], "measure", "amount")
    )


@register(
    "exact_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90
    FROM events GROUP BY event_type
    """,
    doc="exact interpolated percentiles per group (median/p90); the approximate "
        "twin for 100 TB is percentile_approx/approx_count_distinct",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
    )


@register(
    "scd2_history_merge",
    oracle="""
    WITH cur AS (
        SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
               '2024-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to, TRUE AS is_current
        FROM orders
    ),
    upd AS (
        SELECT o_orderkey, 'X' AS o_orderstatus,
               CAST(o_totalprice * 1.1 AS DOUBLE) AS o_totalprice,
               '2024-06-01' AS eff
        FROM orders WHERE o_orderkey % 20 = 0
    )
    SELECT c.* FROM cur c WHERE c.o_orderkey NOT IN (SELECT o_orderkey FROM upd)
    UNION ALL
    SELECT c.o_orderkey, c.o_orderstatus, c.o_totalprice, c.valid_from,
           u.eff AS valid_to, FALSE AS is_current
    FROM cur c JOIN upd u USING (o_orderkey)
    UNION ALL
    SELECT u.o_orderkey, u.o_orderstatus, u.o_totalprice,
           u.eff AS valid_from, CAST(NULL AS VARCHAR) AS valid_to, TRUE AS is_current
    FROM upd u
    """,
    doc="SCD2 (type-2 slowly-changing dimension) merge: changed keys close their "
        "current version (valid_to = effective ts) and open a new one; unchanged "
        "rows pass through — CDC history tracking without Delta, one shuffle",
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.sinks.upsert import scd2_apply

    orders = load_table(spark, sf_dir, "orders")
    target = orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.lit("2024-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = orders.filter(F.col("o_orderkey") % 20 == 0).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") * 1.1).cast("double").alias("o_totalprice"),
        F.lit("2024-06-01").alias("effective_ts"),
    )
    return scd2_apply(target, updates, ["o_orderkey"])


@register(
    "knn_bruteforce_blocked",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id % 100 = 0),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               round(list_dot_product(
                         list_transform(q.qvec, x -> CAST(x AS DOUBLE)),
                         list_transform(e.embedding, x -> CAST(x AS DOUBLE)))
                     / (sqrt(list_dot_product(list_transform(q.qvec, x -> CAST(x AS DOUBLE)),
                                              list_transform(q.qvec, x -> CAST(x AS DOUBLE))))
                        * sqrt(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                                                list_transform(e.embedding, x -> CAST(x AS DOUBLE))))),
                     6) AS cosine
        FROM q, embeddings e
    )
    SELECT query_id, neighbor_id, cosine FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rn
        FROM scored
    ) WHERE rn <= 10
    """,
    doc="exact cosine top-10, blocked-matmul form: per-partition numpy matmul + "
        "local top-k, global top-k over partitions x queries x k rows only — the "
        "100 TB brute-force layout; must produce the SAME rows as knn_bruteforce",
)
def q_knn_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.similarity import brute_force_topk_blocked

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk_blocked(emb, queries, k=10, round_digits=6)


@register(
    "knn_ivf_kmeans",
    oracle=None,  # approximate (trained quantizer) — rows-only
    doc="IVF with k-means-TRAINED centroids (pyspark.ml KMeans as the coarse "
        "quantizer, FAISS-IVF style) instead of sampled data points; probe the "
        "nprobe nearest trained cells per query",
)
def q_knn_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.similarity import (
        ivf_topk,
        ivf_train_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centroids = ivf_train_centroids(emb, n_cells=16, max_iter=5)
    return ivf_topk(emb, queries, centroids, k=10, nprobe=4)


@register(
    "session_window_agg",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sid
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM sessions GROUP BY user_id, sid
    """,
    doc="native session_window aggregation (gap-based event-time sessions as a "
        "built-in grouping); oracle rebuilds the same sessions via lag + running "
        "sum (Spark defines session end = last event + gap)",
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


# ===========================================================================
# Round-2 extensions: range join, incremental rollup, deterministic
# stratified sampling, snapshot time travel, embedding dedup clusters
# ===========================================================================

@register(
    "interval_join_purchase_context",
    oracle="""
    WITH p AS (
        SELECT event_id AS purchase_id, user_id,
               ts - INTERVAL 1 HOUR AS w_start, ts AS w_end
        FROM events WHERE event_type = 'purchase'
    ),
    x AS (
        SELECT event_id, user_id, ts, event_type
        FROM events WHERE event_type <> 'purchase'
    )
    SELECT p.purchase_id,
           CAST(COUNT(*) AS BIGINT) AS n_context,
           CAST(COUNT(*) FILTER (x.event_type = 'view') AS BIGINT) AS n_views
    FROM p JOIN x
      ON x.user_id = p.user_id AND x.ts >= p.w_start AND x.ts <= p.w_end
    GROUP BY p.purchase_id
    """,
    doc="point-in-interval (range) join without a cross product: context events "
        "in the hour before each purchase, bucketed to an equi-join on "
        "(user, time-bucket) + exact BETWEEN filter (operators/relational.py:"
        "interval_join); oracle is DuckDB's native non-equi join",
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.relational import interval_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("w_start"),
        F.col("ts").alias("w_end"),
    )
    points = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", "event_id", "ts", "event_type"
    )
    joined = interval_join(
        points, purchases, on="user_id", ts_col="ts", start_col="w_start", end_col="w_end"
    )
    return joined.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_context"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("n_views"),
    )


@register(
    "incremental_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket_ts, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc="incremental materialized-view maintenance: the events table arrives as "
        "two disjoint batches, each is partially aggregated alone, and the "
        "partials are additively merged on the bucket key "
        "(operators/rollup.py) — the merge invariant "
        "merge(rollup(A), rollup(B)) == rollup(A ∪ B) is checked against a "
        "one-shot GROUP BY oracle; decimal sums make the result independent of "
        "float addition order",
)
def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.rollup import (
        hourly_event_rollup,
        merge_additive,
    )

    ev = load_table(spark, sf_dir, "events")
    batch1 = ev.filter(F.col("event_id") % 2 == 0)
    batch2 = ev.filter(F.col("event_id") % 2 == 1)
    merged = merge_additive(
        hourly_event_rollup(batch1),
        hourly_event_rollup(batch2),
        keys=["bucket_ts", "event_type"],
        add_cols=["n_events", "sum_value"],
    )
    return merged.select(
        "bucket_ts",
        "event_type",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
    )


@register(
    "stratified_hash_sample",
    oracle="""
    SELECT event_id, event_type FROM events
    WHERE (event_type = 'click'
           AND CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 50)
       OR (event_type = 'view'
           AND CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 20)
       OR (event_type = 'error'
           AND CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10)
    """,
    doc="deterministic per-stratum sampling by key hash (50% clicks, 20% views, "
        "10% errors): the dataset-mix primitive for training pipelines — "
        "reproducible across engines/cluster sizes, unlike seeded sampleBy; "
        "pure codegen'd filter, zero shuffle",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.relational import (
        deterministic_stratified_sample,
    )

    ev = load_table(spark, sf_dir, "events")
    return deterministic_stratified_sample(
        ev, key_col="event_id", strata_col="event_type",
        fractions={"click": 0.5, "view": 0.2, "error": 0.1},
    ).select("event_id", "event_type")


@register(
    "snapshot_time_travel",
    oracle="""
    SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS acctbal FROM customer
    """,
    doc="snapshot time travel on the upsert-managed table layout: version 1 is "
        "committed, version 2 overwrites a tenth of the rows, then version 1 is "
        "read back — must equal the original batch exactly (the commit protocol "
        "from sinks/upsert.py: versioned snapshot dirs + atomic pointer swap)",
)
def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from etl_tiki_webscraping_spark.sinks.upsert import (
        read_parquet_table,
        upsert_parquet,
    )

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.col("c_acctbal").cast("double").alias("acctbal")
    )
    path = tempfile.mkdtemp(prefix="time-travel-") + "/tbl"
    upsert_parquet(spark, base, path, ["c_custkey"], keep_snapshots=4)
    updates = base.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "acctbal", F.col("acctbal") * 2
    )
    upsert_parquet(spark, updates, path, ["c_custkey"], keep_snapshots=4)
    return read_parquet_table(spark, path, version=1)


@register(
    "dedup_embedding_clusters",
    oracle=r"""
    WITH RECURSIVE vecs AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    edges AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.v, b.v)
                    / (sqrt(list_dot_product(a.v, a.v))
                       * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4
    ),
    undirected AS (
        SELECT id_a AS src, id_b AS dst FROM edges
        UNION SELECT id_b AS src, id_a AS dst FROM edges
    ),
    reach AS (
        SELECT src AS id, src AS lbl FROM undirected
        UNION
        SELECT u.dst AS id, r.lbl FROM reach r JOIN undirected u ON u.src = r.id
    ),
    comp AS (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id)
    SELECT e.vec_id FROM embeddings e LEFT JOIN comp c ON c.id = e.vec_id
    WHERE c.component IS NULL OR c.component = e.vec_id
    """,
    doc="embedding-cosine near-dup removal in exact-components mode, FULLY "
        "oracle-checked (VERDICT r6 ask #2): exact cosine >= 0.4 threshold "
        "pairs (broadcast brute force on rounded scores — the verification "
        "twin; cosine_dedup_pairs' SRP buckets are the 100 TB path) -> "
        "connected components -> one survivor (min id) per duplicate "
        "cluster.  The oracle recomputes edges with DuckDB's "
        "list_dot_product on identical rounded arithmetic and closes them "
        "with a recursive min-label reachability CTE.",
)
def q_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.dedup import connected_components
    from etl_tiki_webscraping_spark.operators.similarity import (
        cosine_threshold_pairs_exact,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    edges = cosine_threshold_pairs_exact(emb, threshold=0.4).select("id_a", "id_b")
    comps = connected_components(edges)
    dups = comps.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("vec_id")
    )
    return emb.join(dups, on="vec_id", how="left_anti").select("vec_id")


_DBAPI_DBS: dict[str, str] = {}  # sf_dir -> sqlite file (memoized per process)


@register(
    "dbapi_partitioned_read",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey FROM customer
    """,
    doc="S5 warehouse read-back EXECUTED (dags/etl.py:247-249): the customer "
        "table is loaded into a real SQLite database once, then read back "
        "through sources/records.py::dbapi_read with "
        "partitionColumn/lowerBound/upperBound/numPartitions=8 range strides — "
        "the exact spark.read.jdbc partitioned-read contract, each Spark task "
        "opening its own connection and pushing its stride's WHERE down to the "
        "database. Bounds are set INSIDE the key range on purpose so the "
        "unbounded first/last strides prove no row is lost at the edges.",
)
def q_dbapi_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import functools
    import os
    import sqlite3
    import tempfile

    from etl_tiki_webscraping_spark.sources.records import dbapi_read

    db = _DBAPI_DBS.get(sf_dir)
    if db is None or not os.path.exists(db):
        db = os.path.join(tempfile.mkdtemp(prefix="dbapi-wh-"), "wh.db")
        rows = (
            load_table(spark, sf_dir, "customer")
            .select("c_custkey", "c_name", "c_nationkey")
            .collect()
        )
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE customer (c_custkey INT PRIMARY KEY, c_name TEXT, c_nationkey INT)")
        con.executemany("INSERT INTO customer VALUES (?, ?, ?)", [tuple(r) for r in rows])
        con.commit()
        con.close()
        _DBAPI_DBS[sf_dir] = db

    # bounds deliberately inside the true key range (strides 1st/last are
    # unbounded, so edge rows must still be read exactly once)
    lo, hi = (
        spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
        .selectExpr(
            "CAST(min(c_custkey) + (max(c_custkey) - min(c_custkey)) / 10 AS BIGINT)",
            "CAST(max(c_custkey) - (max(c_custkey) - min(c_custkey)) / 10 AS BIGINT)",
        )
        .collect()[0]
    )
    return dbapi_read(
        spark,
        functools.partial(sqlite3.connect, db),
        "SELECT c_custkey, c_name, c_nationkey FROM customer",
        "c_custkey bigint, c_name string, c_nationkey bigint",
        partition_column="c_custkey",
        lower_bound=int(lo),
        upper_bound=int(hi),
        num_partitions=8,
    )


@register(
    "snapshot_partitioned_upsert",
    oracle="""
    SELECT event_id, event_type,
           CASE WHEN event_type = 'click' AND event_id % 10 = 0
                THEN value * 2 ELSE value END AS value
    FROM events
    """,
    doc="partition-pruned snapshot upsert (the 100 TB write-amplification fix, "
        "sinks/upsert.py): the events table is committed partitioned by "
        "event_type, then a batch touching ONLY the click partition is upserted "
        "— the other partitions carry into snapshot v2 by reference (symlink "
        "farm + vN.json manifest) with zero rewrite, which "
        "tests/test_partitioning.py proves file-identically. The read-back of "
        "v2 must equal base-with-click-updates applied.",
)
def q_snapshot_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from etl_tiki_webscraping_spark.sinks.upsert import (
        read_parquet_table,
        upsert_parquet,
    )

    base = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    path = tempfile.mkdtemp(prefix="snap-part-") + "/tbl"
    upsert_parquet(spark, base, path, ["event_id"], partition_by=["event_type"])
    updates = base.filter(
        (F.col("event_type") == "click") & (F.col("event_id") % 10 == 0)
    ).withColumn("value", F.col("value") * 2)
    upsert_parquet(spark, updates, path, ["event_id"], partition_by=["event_type"])
    return read_parquet_table(spark, path).select("event_id", "event_type", "value")


@register(
    "decontaminate_corpus",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tok
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(tok) - 5 + 2, 1)),
                                     i -> array_to_string(list_slice(tok, i, i + 4), ' '))) AS g
        FROM toks
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
    contaminated AS (
        SELECT DISTINCT doc_id FROM grams
        WHERE doc_id % 50 <> 0 AND g IN (SELECT g FROM bench)
    )
    SELECT doc_id FROM documents
    WHERE doc_id % 50 <> 0 AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    """,
    doc="benchmark decontamination (training-data hygiene): docs with doc_id%50=0 "
        "play the held-out benchmark; every other doc sharing any word 5-gram "
        "with it is removed. Corpus grams are generated in whole-stage codegen "
        "and probed against the BROADCAST benchmark gram set map-side — zero "
        "shuffle beyond the final bare-id anti join (operators/decontaminate.py)",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.decontaminate import decontaminate

    # the fixture is a single parquet file (1 input split); spread the
    # gram generation across cores — a real corpus arrives pre-split
    # into many files and needs no repartition
    docs = load_table(spark, sf_dir, "documents").repartition(32)
    benchmark = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    return decontaminate(corpus, benchmark, "text", "doc_id", n=5).select("doc_id")


@register(
    "doc_repetition_score",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tok
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               list_transform(range(1, greatest(len(tok) - 3 + 2, 1)),
                              i -> array_to_string(list_slice(tok, i, i + 2), ' ')) AS gs
        FROM toks
    )
    SELECT doc_id,
           CASE WHEN len(gs) <= 0 THEN 0.0
                ELSE round(1.0 - CAST(len(list_distinct(gs)) AS DOUBLE) / len(gs), 6)
           END AS repetition
    FROM grams
    """,
    doc="intra-document repetition ratio (boilerplate/spam signal): 1 - "
        "distinct/total word 3-grams per doc, as ONE explode into a "
        "map-side-combined (doc, gram) aggregate + per-doc rollup "
        "(operators/decontaminate.py::repetition_report — the Column "
        "form's triple grams reference made Catalyst inline the "
        "interpreted HOF chain 3x: 12 s vs 1.5 s measured at sf0.1, "
        "found when r12's hash-fold bench action stopped count() from "
        "pruning the whole computation)",
)
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.decontaminate import (
        repetition_report,
    )

    docs = load_table(spark, sf_dir, "documents")
    return repetition_report(docs, "text", "doc_id", 3).select(
        "doc_id", F.round("repetition", 6).alias("repetition")
    )


@register(
    "streaming_enriched_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events JOIN nation ON user_id % 25 = n_nationkey
    GROUP BY 1, 2
    """,
    doc="§2.10 stream-static join: the event stream (REAL 3-micro-batch run) is "
        "enriched with a broadcast static dimension per micro-batch — stateless, "
        "no join state accumulates — then windowed-aggregated under the watermark. "
        "Must hash-match the batch SQL oracle on fully-available in-order input.",
)
def q_stream_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.streaming.events import (
        enriched_windowed_counts,
        read_events_stream_multibatch,
        run_available_now_to_memory,
    )

    stream = read_events_stream_multibatch(spark, sf_dir, n_batches=3)
    dim = load_table(spark, sf_dir, "nation")
    agg = enriched_windowed_counts(stream, dim)
    # no_data_batches=False (r17): complete mode — see stream_windowed
    return run_available_now_to_memory(
        agg, "stream_enriched_counts", "complete", no_data_batches=False
    )


@register(
    "sql_surface_revenue",
    oracle="""
    SELECT n_name AS nation,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_buyers,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="the engine's SQL surface IS Spark SQL (SURVEY §7: no parser of our own): "
        "fixture tables registered as views, the query submitted as SQL TEXT and "
        "planned by Catalyst — same statement the DuckDB oracle runs modulo casts",
)
def q_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.io import register_views

    register_views(spark, sf_dir, "orders", "customer", "nation")
    return spark.sql(
        """
        SELECT n_name AS nation,
               COUNT(DISTINCT o_custkey) AS n_buyers,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


@register(
    "array_higher_order_funcs",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
           round(list_max(embedding), 6) AS vmax,
           round(list_min(embedding), 6) AS vmin,
           round(list_max(list_transform(embedding, x -> abs(x))), 6) AS vabsmax
    FROM embeddings
    """,
    doc="§2.6 higher-order array functions (transform/filter/max/min over "
        "array<double>) — the built-in library surface the reference never "
        "needed but any consumer query uses; exact (non-accumulating) ops so "
        "the oracle is float-order-safe",
)
def q_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    arr = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(arr).alias("dim"),
        F.size(F.filter(arr, lambda x: x > 0)).alias("n_pos"),
        F.round(F.array_max(arr), 6).alias("vmax"),
        F.round(F.array_min(arr), 6).alias("vmin"),
        F.round(F.array_max(F.transform(arr, lambda x: F.abs(x))), 6).alias("vabsmax"),
    )


@register(
    "multimodal_audio_features",
    oracle="""
    WITH samples AS (
      SELECT doc_id AS media_id,
             list_transform(range(1, 257),
                i -> CASE WHEN i <= strlen(text)
                          THEN (ascii(substr(text, i, 1)) - 128.0) / 128.0
                          ELSE -1.0 END) AS s
      FROM documents
    )
    SELECT media_id,
           CAST(256 AS INT) AS n_samples,
           CAST(16 AS BIGINT) AS duration_ms,
           round(sqrt(list_sum(list_transform(s, x -> x * x)) / 256.0), 6) AS rms,
           round(list_max(list_transform(s, x -> abs(x))), 6) AS peak,
           CAST(len(list_filter(range(2, 257), i -> s[i - 1] * s[i] < 0)) AS INT)
               AS zero_crossings
    FROM samples
    """,
    doc="audio leg of the multimodal surface: binary -> waveform stats (RMS, "
        "peak, zero crossings, duration) via mapInPandas; the deterministic "
        "fake decoder maps byte k to (k-128)/128 over the first 256 bytes "
        "(zero-padded -> -1.0), which the oracle replays in SQL from the same "
        "ascii documents (operators/multimodal.py::extract_audio_features)",
)
def q_mm_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.multimodal import extract_audio_features

    media = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"), F.encode("text", "utf-8").alias("content")
    )
    feats = extract_audio_features(media)
    return feats.select(
        "media_id",
        "n_samples",
        "duration_ms",
        F.round("rms", 6).alias("rms"),
        F.round("peak", 6).alias("peak"),
        "zero_crossings",
    )


@register(
    "token_budget_packing",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''))
                  AS BIGINT) AS n_tokens,
             doc_id % 16 AS shard
      FROM documents
    ),
    c AS (
      SELECT doc_id, shard, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT doc_id, n_tokens, shard,
           CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS pack_id
    FROM c
    """,
    doc="token-stream chunk assignment (GPT-style concat-then-cut packing): per "
        "shard, docs concatenated in id order and the stream cut every 512 "
        "tokens; pack_id = chunk where the doc starts. One running-sum window "
        "per shard, no global ordering (operators/decontaminate.py). Shard "
        "routed by doc_id%16 here so the SQL oracle reproduces it exactly.",
)
def q_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.text import token_count
    from etl_tiki_webscraping_spark.operators.decontaminate import pack_by_token_budget

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").alias("n_tokens")
    )
    return pack_by_token_budget(
        docs,
        "n_tokens",
        "doc_id",
        budget=512,
        shard_expr=F.pmod(F.col("doc_id"), F.lit(16)),
    )


# ===========================================================================
# Quality gates for the approximate tier (VERDICT r3 ask #1): measured
# recall/precision of every approximate operator against its EXACT,
# oracle-checked twin.  Rows-only by contract (the LSH side is seeded
# and not SQL-replayable) — but the VALUES the driver records each
# round are the evidence the rows-only ops were missing.
# ===========================================================================

@register(
    "ann_recall_report",
    oracle=None,  # measures seeded-LSH/IVF output — not SQL-replayable
    doc="recall@10 of every approximate ANN path (SRP-LSH, IVF-sampled, "
        "IVF-kmeans) against oracle-checked brute-force cosine top-10, one row "
        "per method: (method, n_queries, mean_recall, min_recall).  The gate "
        "itself is bare-id joins + one agg; tests/test_quality_gates.py asserts "
        "floors on the same numbers",
)
def q_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.similarity import lsh_topk
    from etl_tiki_webscraping_spark.quality.gates import topk_recall_summary

    exact = q_knn(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # lsh_wide: the HIGH-RECALL operating point for weakly-clustered data
    # (fewer bits -> bigger buckets -> more candidates scored); on the
    # isotropic fixture the default 8x8 config measures ~0.2 recall@10
    # while 16x4 measures ~0.9 at ~2/3 of the corpus scored — the
    # rho~0.75 trade-off made visible as data, not prose
    wide = lsh_topk(emb, queries, k=10, tables=16, bits=4)
    reports = [
        topk_recall_summary(q_knn_lsh(spark, sf_dir), exact, "knn_lsh"),
        topk_recall_summary(wide, exact, "knn_lsh_wide"),
        topk_recall_summary(q_knn_ivf(spark, sf_dir), exact, "knn_ivf"),
        topk_recall_summary(q_knn_ivf_kmeans(spark, sf_dir), exact, "knn_ivf_kmeans"),
        # PQ shortlist + exact refine (the knn_pq_adc pipeline)
        topk_recall_summary(q_knn_pq(spark, sf_dir), exact, "knn_pq"),
        # composed IVF routing + in-list ADC + refine (knn_ivf_pq)
        topk_recall_summary(q_knn_ivf_pq(spark, sf_dir), exact, "knn_ivf_pq"),
    ]
    out = reports[0]
    for r in reports[1:]:
        out = out.unionAll(r)
    return out


@register(
    "lsh_pair_quality",
    oracle=f"""
    WITH {_minhash_lsh_ctes()},
    {_SIMHASH_CTES},
    pq_truth AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM mh_hs a JOIN mh_hs b ON b.doc_id > a.doc_id
        WHERE CAST(len(list_intersect(a.hset, b.hset)) AS DOUBLE)
              / CAST(len(list_distinct(list_concat(a.hset, b.hset)))
                     AS DOUBLE) >= 0.8
    ),
    pq_sim AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        FROM sh_capped l JOIN sh_capped r
          ON l.chunk = r.chunk AND l.val = r.val AND l.doc_id < r.doc_id
        WHERE bit_count(xor(l.s, r.s)) <= 3
    ),
    pq AS (
        SELECT 'minhash_lsh_t0.8' AS method,
               (SELECT COUNT(*) FROM mh_cand) AS n_candidates,
               (SELECT COUNT(*) FROM pq_truth) AS n_truth,
               (SELECT COUNT(*) FROM mh_cand c
                 JOIN pq_truth t ON t.id_a = c.id_a AND t.id_b = c.id_b)
                   AS n_hit
        UNION ALL
        SELECT 'simhash_h3',
               (SELECT COUNT(*) FROM pq_sim),
               (SELECT COUNT(*) FROM pq_truth),
               (SELECT COUNT(*) FROM pq_sim c
                 JOIN pq_truth t ON t.id_a = c.id_a AND t.id_b = c.id_b)
    )
    SELECT method,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_truth AS BIGINT) AS n_truth,
           CAST(n_hit AS BIGINT) AS n_hit,
           round(CAST(n_hit AS DOUBLE) / n_candidates, 4) AS precision,
           round(CAST(n_hit AS DOUBLE) / n_truth, 4) AS recall
    FROM pq
    """,
    doc="candidate-pair precision/recall of MinHash-LSH (threshold 0.8, its "
        "advertised operating point) and SimHash (hamming<=3 band) against "
        "EXACT all-pairs n-gram Jaccard ground truth on the documents fixture; "
        "one row per method.  Truth builder is O(n^2) on hashed shingle sets — "
        "gate-measurement scope (bounded slice), while the generators under "
        "test are the 100 TB paths.  Upgraded from rows-only in r11: with "
        "both generators AND the truth builder on the md5-prefix hash "
        "recipes, the oracle replays candidates, ground truth (same 31-bit "
        "hset — even hash collisions match), and the precision/recall "
        "arithmetic end-to-end",
)
def q_lsh_pair_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.dedup import (
        minhash_candidate_pairs,
        simhash_candidate_pairs,
    )
    from etl_tiki_webscraping_spark.quality.gates import (
        exact_jaccard_pairs_all,
        pair_quality_summary,
    )

    docs = load_table(spark, sf_dir, "documents")
    truth_m = exact_jaccard_pairs_all(docs, "text", "doc_id", threshold=0.8, shingle_n=3)
    cand_m = minhash_candidate_pairs(docs, "text", "doc_id", shingle_n=3)
    # SimHash's hamming<=3 band approximates near-identity; measured against
    # the SAME exact-Jaccard truth so the two generators are comparable
    cand_s = simhash_candidate_pairs(docs, "text", "doc_id", max_hamming=3)
    return pair_quality_summary(cand_m, truth_m, "minhash_lsh_t0.8").unionAll(
        pair_quality_summary(cand_s.select("id_a", "id_b"), truth_m, "simhash_h3")
    )


# ===========================================================================
# Corpus-pipeline capstone (VERDICT r3 ask #7): the LLM-data operators
# COMPOSED, not just run singly — quality gate -> benchmark
# decontamination -> dedup -> deterministic split -> token packing, one
# DataFrame chain.  Mirrors the warehouse pipeline_e2e pattern: the
# fully deterministic variant carries a complete DuckDB oracle; the
# near-dup variant swaps in MinHash-LSH dedup (seeded, rows-only).
# ===========================================================================

# head (quality gate -> decontamination -> clean) and tail (token
# count -> shard/pack -> split) of the corpus-pipeline replay, shared
# by the exact-dedup (corpus_pipeline_e2e) and MinHash-LSH
# (corpus_pipeline_neardup) compositions — only the dedup stage in the
# middle differs.
_CORPUS_HEAD_SQL = r"""
    quality AS (
        SELECT doc_id, text
        FROM documents
        WHERE text IS NOT NULL
          AND len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')) >= 5
          AND CAST(length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS DOUBLE)
                  / CAST(greatest(length(text), 1) AS DOUBLE) <= 0.3
          AND CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                   t -> t IN ('the','and','of','to','in','is','it','that','for','with'))) AS DOUBLE)
                  / CAST(greatest(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                   t -> t <> '')), 1) AS DOUBLE) >= 0.01
    ),
    toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tok FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(tok) - 5 + 2, 1)),
                                     i -> array_to_string(list_slice(tok, i, i + 4), ' '))) AS g
        FROM toks
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
    contaminated AS (
        SELECT DISTINCT doc_id FROM grams
        WHERE doc_id % 50 <> 0 AND g IN (SELECT g FROM bench)
    ),
    clean AS (
        SELECT q.doc_id, q.text FROM quality q
        WHERE q.doc_id % 50 <> 0
          AND q.doc_id NOT IN (SELECT doc_id FROM contaminated)
    )
"""

_CORPUS_TAIL_SQL = r"""
    counted AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> ''))
                    AS BIGINT) AS n_tokens
        FROM deduped
    ),
    c AS (
        SELECT doc_id, n_tokens, doc_id % 16 AS shard,
               SUM(n_tokens) OVER (PARTITION BY doc_id % 16 ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM counted
    )
    SELECT doc_id, n_tokens, shard,
           CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS pack_id,
           CASE
               WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
               WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
               ELSE 'test'
           END AS split
    FROM c
"""

_CORPUS_PIPELINE_SQL = rf"""
    WITH {_CORPUS_HEAD_SQL},
    deduped AS (
        SELECT doc_id, text FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
                ORDER BY doc_id ASC
            ) AS rn FROM clean
        ) WHERE rn = 1
    ),
    {_CORPUS_TAIL_SQL}
"""


def _corpus_pipeline(spark: SparkSession, sf_dir: str, near_dup: bool) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.text import (
        punct_ratio,
        stopword_ratio,
        token_count,
    )
    from etl_tiki_webscraping_spark.operators.decontaminate import (
        decontaminate,
        pack_by_token_budget,
    )
    from etl_tiki_webscraping_spark.operators.dedup import exact_dedup, minhash_dedup

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    quality = docs.filter(
        (token_count("text") >= 5)
        & (punct_ratio("text") <= 0.3)
        & (stopword_ratio("text") >= 0.01)
    )
    # the benchmark is EXTERNAL held-out data — it is not quality-gated
    benchmark = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = quality.filter(F.col("doc_id") % 50 != 0)
    clean = decontaminate(corpus, benchmark, "text", "doc_id", n=5)
    if near_dup:
        deduped = minhash_dedup(clean, "text", "doc_id", threshold=0.8)
    else:
        deduped = exact_dedup(clean, "text", "doc_id")
    counted = deduped.select("doc_id", token_count("text").alias("n_tokens"))
    packed = pack_by_token_budget(
        counted, "n_tokens", "doc_id", budget=512,
        shard_expr=F.pmod(F.col("doc_id"), F.lit(16)),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("bigint") % 100
    )
    return packed.select(
        "doc_id",
        "n_tokens",
        "shard",
        "pack_id",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
    )


@register(
    "corpus_pipeline_e2e",
    oracle=_CORPUS_PIPELINE_SQL,
    doc="the corpus capstone: quality gate -> benchmark decontamination (5-gram "
        "broadcast probe) -> exact content dedup -> deterministic 80/10/10 "
        "split -> token-budget packing, composed as ONE DataFrame chain with a "
        "full DuckDB oracle.  Every stage keeps its standalone scale shape "
        "(codegen filters, broadcast semi-join, bare-id survivor election, one "
        "window per shard); Catalyst fuses the narrow stages into shared scans",
)
def q_corpus_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _corpus_pipeline(spark, sf_dir, near_dup=False)


@register(
    "corpus_pipeline_neardup",
    oracle=rf"""
    WITH {_CORPUS_HEAD_SQL},
    {_minhash_lsh_ctes(src="clean")},
    nd_dup AS (SELECT DISTINCT id_b FROM edges),
    deduped AS (
        SELECT cl.doc_id, cl.text FROM clean cl
        LEFT JOIN nd_dup d ON d.id_b = cl.doc_id
        WHERE d.id_b IS NULL
    ),
    {_CORPUS_TAIL_SQL}
    """,
    doc="the same composed corpus pipeline with MinHash-LSH near-dup removal "
        "(threshold 0.8) in place of exact dedup — proves the approximate tier "
        "composes into the chain.  Upgraded from rows-only in r11: the oracle "
        "splices the full MinHash-LSH replay (signatures over the CLEANED "
        "corpus, cap-1024, hset-Jaccard >= 0.8, drop-higher-id) between the "
        "shared pipeline head (quality gate + decontamination) and tail "
        "(token packing + split); pair quality additionally gated by "
        "lsh_pair_quality + tests/test_quality_gates.py",
)
def q_corpus_pipeline_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _corpus_pipeline(spark, sf_dir, near_dup=True)


@register(
    "streaming_stream_stream_join",
    oracle="""
    SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id,
           v.ts AS view_ts, p.ts AS purchase_ts
    FROM events v JOIN events p
      ON p.user_id = v.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
    """,
    doc="§2.10 stream-STREAM inner join (VERDICT r3 ask #4): the view and "
        "purchase slices of the event stream run as two independent 3-micro-batch "
        "file sources, each with its own watermark, joined on user with a 1-hour "
        "range bound — the bound gives Spark a per-side state watermark so "
        "buffered rows are evicted as the watermarks advance (state bounded by "
        "horizon+delay of traffic, proven in tests/test_streaming.py). On "
        "fully-available in-order input the append-mode result must hash-match "
        "the batch SQL twin",
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.streaming.events import (
        read_events_stream_multibatch,
        run_available_now_to_memory,
        stream_stream_purchase_views,
    )

    views = read_events_stream_multibatch(spark, sf_dir, n_batches=3).filter(
        F.col("event_type") == "view"
    )
    purchases = read_events_stream_multibatch(spark, sf_dir, n_batches=3).filter(
        F.col("event_type") == "purchase"
    )
    joined = stream_stream_purchase_views(views, purchases)
    # 4 shuffle partitions, not the streaming default 8: a
    # stream-stream join keeps FOUR state stores per partition, so
    # per-micro-batch store overhead dominates at fixture scale —
    # measured sp=4 ~15% faster than sp=8 at sf0.1 (r11 tuning, the
    # r3 windowed-counts exercise applied to the join)
    # no_data_batches=False (r17): an INNER stream-stream join emits a
    # pair in the micro-batch where the later side arrives; the trailing
    # watermark-only round only evicts state (no emission) and costs a
    # full 4-store x 4-partition reload/commit cycle + re-plan (~1 s)
    return run_available_now_to_memory(
        joined, "stream_stream_join", "append", shuffle_partitions=4,
        no_data_batches=False,
    )


@register(
    "streaming_stream_stream_left_outer",
    oracle="""
    SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id,
           v.ts AS view_ts, p.ts AS purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = v.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
    """,
    doc="stream-STREAM LEFT OUTER join with watermarks on both sides "
        "(streaming/events.py::stream_stream_purchase_views "
        "how='leftOuter'): every view emits, null-extended when no "
        "purchase followed within the horizon — abandonment detection, "
        "the semantics only a watermark can provide in a stream (the "
        "null row is emittable only once the watermark PROVES no "
        "matching purchase can still arrive).  A finite stream never "
        "flushes its own tail, so the source appends two heartbeat "
        "spacer micro-batches (advance the watermark, then let the "
        "eviction batch emit) — the availableNow stand-in for a "
        "production punctuation topic; sentinel rows filter out by "
        "user_id < 0.  State stays bounded by horizon+delay of traffic "
        "per side exactly as the inner variant.  Hash-matches the batch "
        "LEFT JOIN oracle.",
)
def q_stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.streaming.events import (
        read_events_stream_multibatch,
        run_available_now_to_memory,
        stream_stream_purchase_views,
    )

    def side(kind: str) -> DataFrame:
        return read_events_stream_multibatch(
            spark, sf_dir, **_LOJ_MULTIBATCH_KW
        ).filter(F.col("event_type") == kind)

    joined = stream_stream_purchase_views(
        side("view"), side("purchase"), how="leftOuter"
    )
    # sp=4: see streaming_stream_stream_join — four state stores per
    # partition make per-batch store overhead the cost driver here
    # no_data_batches=False (r17): the LOJ's tail is flushed by the TWO
    # trailing heartbeat DATA batches (the 1st advances the watermark
    # past every view's expiry — margin 1h+10min+120s — and the 2nd's
    # processing emits the evicted null-extensions), so the trailing
    # watermark-only round emits nothing; oracle-verified
    res = run_available_now_to_memory(
        joined, "stream_stream_loj", "append", shuffle_partitions=4,
        no_data_batches=False,
    )
    return res.filter(F.col("user_id") >= 0)


@register(
    "snapshot_file_skipping",
    oracle="""
    SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS acctbal
    FROM customer
    WHERE c_custkey >= 20 AND c_custkey <= 80
    """,
    doc="file-level min/max data skipping (VERDICT r3 ask #6): the customer "
        "table is committed, compacted with sort_by=c_custkey into many small "
        "files covering disjoint key ranges (manifest records per-file parquet "
        "footer min/max), then range-read via read_parquet_table(range_filter=) "
        "— files whose range cannot overlap are never given to the scan "
        "(asserted scan-count test in tests/test_upsert.py); the oracle proves "
        "the pruned result equals the plain SQL range filter",
)
def q_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from etl_tiki_webscraping_spark.sinks.upsert import (
        compact_table,
        read_parquet_table,
        upsert_parquet,
    )

    path = _FILE_SKIP_TABLES.get(sf_dir)
    if path is None:
        base = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_name", F.col("c_acctbal").cast("double").alias("acctbal")
        )
        path = tempfile.mkdtemp(prefix="file-skip-") + "/tbl"
        upsert_parquet(spark, base, path, ["c_custkey"])
        compact_table(spark, path, target_file_bytes=16 * 1024, sort_by=["c_custkey"])
        _FILE_SKIP_TABLES[sf_dir] = path
    return read_parquet_table(spark, path, range_filter=("c_custkey", 20, 80))


_FILE_SKIP_TABLES: dict[str, str] = {}  # sf_dir -> table path (memoized)


# ===========================================================================
# Round-6 additions: incremental-corpus management + multi-dim layout
# ===========================================================================

@register(
    "incremental_dedup_new_docs",
    oracle=r"""
    WITH b AS (
        SELECT *, CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bk
        FROM documents
    ),
    old_fp AS (
        SELECT DISTINCT md5(regexp_replace(lower(trim(coalesce(text, ''))), '\s+', ' ', 'g')) AS fp
        FROM b WHERE bk < 70
    ),
    new_dedup AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY md5(regexp_replace(lower(trim(coalesce(text, ''))), '\s+', ' ', 'g'))
                ORDER BY doc_id ASC
            ) AS rn
            FROM b WHERE bk >= 70
        ) WHERE rn = 1
    )
    SELECT doc_id, lang, source, n_chars FROM new_dedup
    WHERE md5(regexp_replace(lower(trim(coalesce(text, ''))), '\s+', ' ', 'g'))
          NOT IN (SELECT fp FROM old_fp)
    """,
    doc="incremental-crawl exact dedup: an incoming batch (the md5-split 30%% "
        "slice standing in for a new crawl) is deduped within itself, then "
        "anti-joined against the EXISTING corpus's fingerprint store (distinct "
        "md5 of normalized text, the 70%% slice) — the cross-run dedup a "
        "training pipeline performs on every ingest.  Scale shape: only "
        "(fingerprint, id) pairs enter the exchanges; at 100 TB the store is "
        "a persisted table maintained alongside the corpus snapshot, not "
        "recomputed",
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.dedup import exact_dedup, normalize_text

    docs = load_table(spark, sf_dir, "documents")
    bk = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("bigint") % 100
    )
    fp = F.md5(normalize_text(F.coalesce(F.col("text"), F.lit(""))))
    old_store = docs.filter(bk < 70).select(fp.alias("fp")).distinct()
    new_batch = exact_dedup(docs.filter(bk >= 70), "text", "doc_id")
    kept = new_batch.join(old_store, on=fp == F.col("fp"), how="left_anti")
    return kept.select("doc_id", "lang", "source", "n_chars")


@register(
    "crosscorpus_neardup_lsh",
    oracle=f"""
    WITH {_minhash_sig_ctes()},
    cc_flag AS (
        SELECT doc_id,
               (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 100) < 70 AS is_old
        FROM documents
    ),
    cc_new AS (
        SELECT b.doc_id, b.band, b.bucket
        FROM mh_buckets b JOIN cc_flag f USING (doc_id) WHERE NOT f.is_old
    ),
    cc_old AS (
        SELECT b.doc_id, b.band, b.bucket
        FROM mh_buckets b JOIN cc_flag f USING (doc_id) WHERE f.is_old
    ),
    cc_new_keep AS (
        SELECT band, bucket FROM cc_new
        GROUP BY band, bucket HAVING COUNT(*) <= 1024
    ),
    cc_old_keep AS (
        SELECT band, bucket FROM cc_old
        GROUP BY band, bucket HAVING COUNT(*) <= 1024
    ),
    cc_cand AS (
        SELECT DISTINCT n.doc_id AS id_a, o.doc_id AS id_b
        FROM (SELECT c.* FROM cc_new c JOIN cc_new_keep USING (band, bucket)) n
        JOIN (SELECT c.* FROM cc_old c JOIN cc_old_keep USING (band, bucket)) o
          USING (band, bucket)
    )
    SELECT c.id_a AS new_id, c.id_b AS old_id
    FROM cc_cand c
    JOIN mh_sh sa ON sa.doc_id = c.id_a
    JOIN mh_sh sb ON sb.doc_id = c.id_b
    WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
          / CAST(len(list_distinct(list_concat(sa.shingles, sb.shingles)))
                 AS DOUBLE) >= 0.8
    """,
    doc="incremental-crawl NEAR-dup: MinHash-LSH candidates between the new "
        "slice and the existing corpus (minhash_candidate_pairs_cross — bare "
        "(band,bucket,id) join, per-side hot-bucket cap), verified by exact "
        "n-gram Jaccard >= 0.8 on candidates only.  The cross-corpus analog "
        "of dedup_minhash_lsh: candidate generation never compares new x old "
        "exhaustively, and document text never enters an exchange.  The "
        "DuckDB oracle replays the whole thing — shared signature CTEs, the "
        "md5(doc_id)%100 old/new split, per-side cap-1024, string-shingle "
        "Jaccard verify (this query verifies on raw shingles where "
        "dedup_minhash_lsh verifies on the 31-bit hset) — upgraded from "
        "rows-only in r11 (the kernel's md5 hashes made it replayable)",
)
def q_crosscorpus_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.dedup import (
        _band_buckets,
        cap_bucket_membership,
        jaccard_on_pairs,
        minhash_analysis,
    )

    docs = load_table(spark, sf_dir, "documents")
    bk = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("bigint") % 100
    )
    # both "corpora" are slices of one table here, so the signature
    # kernel (the dominant cost) runs ONCE over the union and the bucket
    # table splits afterwards — semantically identical to
    # minhash_candidate_pairs_cross(new, old, ...) on the two slices
    # (which the unit tests + quality gate exercise for the genuinely
    # two-table case), at half the signature cost
    is_old = (
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10).cast("bigint") % 100
        < 70
    )
    # persisted (r17): the bucket table splits into a NEW and an OLD
    # side below, and each side is an independent consumer — unpinned,
    # the Arrow signature kernel (the dominant cost) re-ran per side.
    # One kernel pass total now; released via LRU / clearCache.
    sig = minhash_analysis(docs, "text", "doc_id").select(
        "id", "sig", is_old.alias("__is_old")
    ).persist()
    buckets = sig.select(
        "id", "__is_old", F.explode(_band_buckets(F.col("sig"), 16, 4)).alias("bb")
    ).select("id", "__is_old", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    new_b = cap_bucket_membership(
        buckets.filter(~F.col("__is_old")).select(F.col("id").alias("id_a"), "band", "bucket"),
        ["band", "bucket"],
        1024,
    )
    old_b = cap_bucket_membership(
        buckets.filter(F.col("__is_old")).select(F.col("id").alias("id_b"), "band", "bucket"),
        ["band", "bucket"],
        1024,
    )
    pairs = new_b.join(old_b, on=["band", "bucket"]).select("id_a", "id_b").distinct()
    verified = jaccard_on_pairs(pairs, docs, "text", "doc_id").filter(F.col("jaccard") >= 0.8)
    return verified.select(
        F.col("id_a").alias("new_id"), F.col("id_b").alias("old_id")
    )


@register(
    "zorder_multidim_skipping",
    oracle="""
    SELECT DISTINCT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           CAST(l_quantity AS DOUBLE) AS qty
    FROM lineitem
    WHERE l_partkey >= 20 AND l_partkey <= 90
      AND l_suppkey >= 2 AND l_suppkey <= 5
    """,
    doc="multi-dimension file skipping: lineitem committed, compacted with "
        "zorder_by=(l_partkey, l_suppkey) — Morton bit-interleave of "
        "equal-width-binned dims, pure codegen bit expressions, no UDF/global "
        "sort — so EVERY file covers a bounded range in BOTH dims and the "
        "2-predicate range read skips files via manifest min/max stats "
        "(per-dimension skipping asserted in tests/test_upsert.py); the "
        "oracle proves the pruned read equals the plain SQL filter",
)
def q_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from etl_tiki_webscraping_spark.sinks.upsert import (
        compact_table,
        read_parquet_table,
        upsert_parquet,
    )

    path = _ZORDER_TABLES.get(sf_dir)
    if path is None:
        base = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_suppkey",
            F.col("l_quantity").cast("double").alias("qty"),
        )
        path = tempfile.mkdtemp(prefix="zorder-") + "/tbl"
        # key = the full tuple: the fixture's (orderkey, linenumber) is
        # not unique, so the upsert is a plain DISTINCT (oracle mirrors)
        upsert_parquet(spark, base, path, list(base.columns))
        compact_table(
            spark, path, target_file_bytes=256 * 1024, zorder_by=["l_partkey", "l_suppkey"]
        )
        _ZORDER_TABLES[sf_dir] = path
    return read_parquet_table(
        spark, path, range_filter=[("l_partkey", 20, 90), ("l_suppkey", 2, 5)]
    )


_ZORDER_TABLES: dict[str, str] = {}  # sf_dir -> table path (memoized)


@register(
    "quality_decile_binning",
    oracle=r"""
    WITH s AS (
      SELECT doc_id,
             CAST(length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS DOUBLE)
                 / CAST(greatest(length(text), 1) AS DOUBLE) AS score
      FROM documents
    ),
    b AS (SELECT min(score) AS mn, max(score) AS mx FROM s)
    SELECT doc_id, score,
           CAST(CASE WHEN mx > mn
                     THEN least(9, CAST(floor((score - mn) / (mx - mn) * 10) AS BIGINT))
                     ELSE 0 END AS BIGINT) AS decile
    FROM s, b
    """,
    doc="quality-mix binning: equal-width deciles of the punctuation-ratio "
        "quality score, bounds from ONE min/max aggregate broadcast back over "
        "the corpus — no global sort/window (NTILE's shape collapses to a "
        "single partition at 100 TB; equal-width binning is one map-side agg "
        "+ a scalar broadcast), the curation primitive behind quality-tiered "
        "sampling mixes",
)
def q_quality_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.text import punct_ratio

    s = load_table(spark, sf_dir, "documents").select(
        "doc_id", punct_ratio("text").alias("score")
    )
    bounds = s.agg(F.min("score").alias("mn"), F.max("score").alias("mx"))
    j = s.crossJoin(F.broadcast(bounds))
    decile = (
        F.when(
            F.col("mx") > F.col("mn"),
            F.least(
                F.lit(9).cast("bigint"),
                F.floor((F.col("score") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 10).cast(
                    "bigint"
                ),
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
    )
    return j.select("doc_id", "score", decile.alias("decile"))


@register(
    "corpus_mix_allocation",
    oracle=r"""
    WITH lang_tok AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split_regex(trim(coalesce(text, '')), '\s+'))) AS BIGINT) AS tok_sum
      FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(SUM(tok_sum) AS DOUBLE) AS t, CAST(COUNT(*) AS BIGINT) AS k FROM lang_tok)
    SELECT lang, n_docs, tok_sum,
           CAST(tok_sum AS DOUBLE) / t AS token_share,
           least(CAST(1.0 AS DOUBLE), (CAST(1.0 AS DOUBLE) / k) / (CAST(tok_sum AS DOUBLE) / t)) AS sample_rate
    FROM lang_tok, tot
    """,
    doc="data-mix allocation: per-language token counts and the capped "
        "sampling rate that equalizes the mix toward a uniform per-language "
        "token budget (rate = min(1, target_share / actual_share)) — the "
        "planning step of corpus mixing.  One partial-aggregated groupBy "
        "plus a broadcast single-row total; no window, no second scan",
)
def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.size(F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), "[ \t\n\f\r]+")).cast("bigint")
    lang_tok = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("n_docs"), F.sum(toks).cast("bigint").alias("tok_sum"))
    )
    tot = lang_tok.agg(
        F.sum("tok_sum").cast("double").alias("t"), F.count("*").cast("bigint").alias("k")
    )
    j = lang_tok.crossJoin(F.broadcast(tot))
    share = F.col("tok_sum").cast("double") / F.col("t")
    rate = F.least(F.lit(1.0), (F.lit(1.0) / F.col("k")) / share)
    return j.select(
        "lang", "n_docs", "tok_sum", share.alias("token_share"), rate.alias("sample_rate")
    )


@register(
    "corpus_temperature_mix",
    oracle="""
    WITH src AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(POW(n, 0.5)) AS DOUBLE) AS z,
             CAST(SUM(n) AS DOUBLE) AS total
      FROM src
    ),
    rates AS (
      SELECT source,
             least(CAST(1.0 AS DOUBLE),
                   ((POW(n, 0.5) / z) * (0.5 * total)) / CAST(n AS DOUBLE)
             ) AS sample_rate
      FROM src, tot
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
          < CAST(floor(r.sample_rate * 10000) AS BIGINT)
    """,
    doc="TEMPERATURE-tau mixture resampling (the mT5/XLM-R data-mix "
        "knob): per-source sampling mass proportional to n^tau with "
        "tau=0.5 — low-resource sources upweight, dominant ones "
        "downweight — scaled to a 50%-of-corpus target and applied as "
        "the same deterministic md5-bucket gate as corpus_mix_sampled "
        "(reproducible across engines/runs/cluster sizes, no rand()).  "
        "Plan: one count-by-source aggregate, the tiny rate table "
        "broadcasts onto the corpus scan — one pass, no window.",
)
def q_corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = src.agg(
        F.sum(F.pow("n", F.lit(0.5))).cast("double").alias("z"),
        F.sum("n").cast("double").alias("total"),
    )
    rates = src.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(1.0),
            ((F.pow("n", F.lit(0.5)) / F.col("z")) * (F.lit(0.5) * F.col("total")))
            / F.col("n").cast("double"),
        ).alias("sample_rate"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("bigint")
        % 10000
    )
    return (
        docs.join(F.broadcast(rates), on="source")
        .filter(bucket < F.floor(F.col("sample_rate") * 10000).cast("bigint"))
        .select("doc_id", "source")
    )


@register(
    "corpus_mix_sampled",
    oracle=r"""
    WITH lang_tok AS (
      SELECT lang,
             CAST(SUM(len(string_split_regex(trim(coalesce(text, '')), '\s+'))) AS BIGINT) AS tok_sum
      FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(SUM(tok_sum) AS DOUBLE) AS t, CAST(COUNT(*) AS BIGINT) AS k FROM lang_tok),
    rates AS (
      SELECT lang,
             least(CAST(1.0 AS DOUBLE), (CAST(1.0 AS DOUBLE) / k) / (CAST(tok_sum AS DOUBLE) / t)) AS sample_rate
      FROM lang_tok, tot
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
          < CAST(floor(r.sample_rate * 10000) AS BIGINT)
    """,
    doc="data-mix APPLICATION: corpus_mix_allocation's per-language rates "
        "applied as a deterministic hash-gated sample (md5-prefix bucket < "
        "rate*10000) — reproducible across engines/runs/cluster sizes, no "
        "rand().  Plan: the tiny rate table broadcasts onto the corpus scan; "
        "one pass, no window, no second aggregation of the corpus",
)
def q_corpus_mix_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), "[ \t\n\f\r]+")).cast("bigint")
    lang_tok = docs.groupBy("lang").agg(F.sum(toks).cast("bigint").alias("tok_sum"))
    tot = lang_tok.agg(
        F.sum("tok_sum").cast("double").alias("t"), F.count("*").cast("bigint").alias("k")
    )
    rates = (
        lang_tok.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.least(
                F.lit(1.0), (F.lit(1.0) / F.col("k")) / (F.col("tok_sum").cast("double") / F.col("t"))
            ).alias("sample_rate"),
        )
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("bigint")
        % 10000
    )
    return (
        docs.join(F.broadcast(rates), on="lang")
        .filter(bucket < F.floor(F.col("sample_rate") * 10000).cast("bigint"))
        .select("doc_id", "lang")
    )


@register(
    "cdc_apply_changes",
    oracle="""
    WITH cust AS (
      SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS acctbal FROM customer
    ),
    changes AS (
      SELECT c_custkey, c_name, acctbal, 'D' AS op, CAST(1 AS BIGINT) AS seq
      FROM cust WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey, c_name || ' (updated)', acctbal * 2, 'U', CAST(2 AS BIGINT)
      FROM cust WHERE c_custkey % 10 IN (1, 2, 3)
      UNION ALL
      SELECT c_custkey, c_name, acctbal, 'D', CAST(1 AS BIGINT)
      FROM cust WHERE c_custkey % 10 = 1
      UNION ALL
      SELECT c_custkey + 1000000, c_name || ' (new)', acctbal, 'I', CAST(1 AS BIGINT)
      FROM cust WHERE c_custkey % 10 = 5
    ),
    latest AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY seq DESC, op ASC) AS rn
        FROM changes
      ) WHERE rn = 1
    )
    SELECT c.c_custkey, c.c_name, c.acctbal FROM cust c
    WHERE c.c_custkey NOT IN (SELECT c_custkey FROM latest)
    UNION ALL
    SELECT c_custkey, c_name, acctbal FROM latest WHERE op <> 'D'
    """,
    doc="CDC change-feed application (sinks/upsert.py::apply_changes): a "
        "deterministic I/U/D feed derived from the customer table — deletes "
        "for key%10=0, updates (name suffix + doubled balance) for 1-3, "
        "inserts under shifted keys for 5, plus a SAME-KEY delete-vs-update "
        "seq conflict (the seq-2 update must beat the seq-1 delete) — merged "
        "as MERGE..WHEN MATCHED AND op='D' THEN DELETE semantics the "
        "reference's ON DUPLICATE KEY UPDATE cannot express.  Plan: one "
        "dedup over the (small) feed + one anti join; the target scans once",
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.sinks.upsert import apply_changes

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.col("c_acctbal").cast("double").alias("acctbal")
    )
    m = F.col("c_custkey") % 10
    seq1 = F.lit(1).cast("bigint")
    dels = cust.filter(m == 0).select(
        "c_custkey", "c_name", "acctbal", F.lit("D").alias("op"), seq1.alias("seq")
    )
    upds = cust.filter(m.isin(1, 2, 3)).select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit(" (updated)")).alias("c_name"),
        (F.col("acctbal") * 2).alias("acctbal"),
        F.lit("U").alias("op"),
        F.lit(2).cast("bigint").alias("seq"),
    )
    late_dels = cust.filter(m == 1).select(
        "c_custkey", "c_name", "acctbal", F.lit("D").alias("op"), seq1.alias("seq")
    )
    ins = cust.filter(m == 5).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.col("c_name"), F.lit(" (new)")).alias("c_name"),
        "acctbal",
        F.lit("I").alias("op"),
        seq1.alias("seq"),
    )
    changes = dels.unionByName(upds).unionByName(late_dels).unionByName(ins)
    return apply_changes(cust, changes, ["c_custkey"])


@register(
    "bucketed_colocated_join",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, CAST(o.o_totalprice AS DOUBLE) AS total,
           CAST(SUM(CAST(l.l_quantity AS DOUBLE)) AS DOUBLE) AS qty_sum
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_custkey, o.o_totalprice
    """,
    doc="co-located fact-to-fact join (sinks/bucketed.py): orders and lineitem "
        "pre-bucketed by the join key into managed tables ONCE, so the "
        "recurring join is exchange-free — each task zips bucket i with "
        "bucket i (zero-Exchange plan asserted in tests/test_bucketed.py and "
        "below in tools/plan_audit.py).  At 100 TB this converts the "
        "per-run shuffle of both fact tables into a one-time write cost — "
        "the Spark-native answer to the reference's staging-table layout "
        "for joins that repeat across daily runs",
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.sinks.bucketed import write_bucketed

    suffix = _BUCKETED_TABLES.get(sf_dir)
    if suffix is None:
        # deterministic per sf_dir (Python's str hash is process-salted)
        suffix = "".join(c if c.isalnum() else "_" for c in sf_dir.strip("/"))
        # a previous PROCESS leaves the warehouse dirs on disk but not in
        # this session's in-memory catalog; saveAsTable refuses to adopt
        # an existing location, so clear leftovers first
        import os
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        for t in (f"b_orders_{suffix}", f"b_lineitem_{suffix}"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", F.col("o_totalprice").cast("double").alias("total")
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", F.col("l_quantity").cast("double").alias("qty")
        )
        write_bucketed(orders, f"b_orders_{suffix}", 8, ["o_orderkey"], ["o_orderkey"])
        write_bucketed(li, f"b_lineitem_{suffix}", 8, ["l_orderkey"], ["l_orderkey"])
        _BUCKETED_TABLES[sf_dir] = suffix
    o = spark.table(f"b_orders_{suffix}")
    l = spark.table(f"b_lineitem_{suffix}")
    # hint("merge"): at toy SF Catalyst would broadcast the small side,
    # which hides the property under test; the sort-merge plan is the
    # one a 100 TB fact-to-fact join takes, and on bucketed+sorted
    # tables it runs with ZERO exchanges and zero per-task sorts
    # (plan-audited)
    return (
        o.join(l.hint("merge"), o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_custkey", "total")
        .agg(F.sum("qty").cast("double").alias("qty_sum"))
    )


_BUCKETED_TABLES: dict[str, str] = {}  # sf_dir -> managed-table suffix (memoized)


@register(
    "streaming_sink_upsert_e2e",
    oracle="""
    WITH src AS (
      SELECT event_id, ts, user_id, event_type, value FROM events
      UNION ALL
      SELECT event_id, ts + INTERVAL 60 DAY, user_id, 'restate', value * 2
      FROM events WHERE event_id % 37 = 0
    ),
    final AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts DESC) AS rn
        FROM src
      ) WHERE rn = 1
    )
    SELECT event_id, user_id, event_type, value, CAST(ts AS DATE) AS event_date
    FROM final
    """,
    doc="streaming -> warehouse capstone: the event stream (original wave + a "
        "later 'restatement' wave doubling value for event_id%%37=0, shifted "
        "+60 days so it arrives in LATER micro-batches) runs as a real "
        "multi-batch AvailableNow stream through the foreachBatch upsert "
        "sink into a date-partitioned snapshot table; the query returns the "
        "final COMMITTED table, which must equal the SQL last-writer-wins "
        "replay.  Proves the deployable path end-to-end: per-batch "
        "partition-pruned merges, restatements overwriting earlier versions "
        "across batches (and across partitions: the restated row moves to "
        "its new event_date), exactly-once sink semantics",
)
def q_streaming_sink_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from etl_tiki_webscraping_spark.sinks.upsert import read_parquet_table
    from etl_tiki_webscraping_spark.streaming.events import (
        foreach_batch_upsert,
        read_events_stream_multibatch,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    restated = events.filter(F.col("event_id") % 37 == 0).select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 60 DAYS")).alias("ts"),
        "user_id",
        F.lit("restate").alias("event_type"),
        (F.col("value") * 2).alias("value"),
    )
    stream = read_events_stream_multibatch(
        spark, sf_dir, n_batches=4,
        events_df=events.unionByName(restated), cache_tag="restate-v1",
    ).withColumn("event_date", F.to_date("ts"))

    target = tempfile.mkdtemp(prefix="stream-sink-") + "/tbl"
    ckpt = tempfile.mkdtemp(prefix="stream-sink-ckpt-")
    writer = foreach_batch_upsert(
        stream,
        target,
        keys=["event_id"],
        checkpoint_dir=ckpt,
        # original + restatement of one key can share a micro-batch at
        # the range boundary; last-wins under ts keeps the batch-level
        # merge identical to the global last-writer-wins replay
        order_by=["ts"],
        partition_by=["event_date"],
        # a restated event MOVES partitions (new date): the default
        # whole-table key scan must remove the stale version
        stable_partitions=False,
    )
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    return read_parquet_table(spark, target).select(
        "event_id", "user_id", "event_type", "value", "event_date"
    )


@register(
    "constraint_audit",
    oracle="""
    WITH cust_aug AS (
      SELECT c_custkey, c_name FROM customer
      UNION ALL
      SELECT (SELECT min(c_custkey) FROM customer), 'injected-dup'
    ),
    orders_aug AS (
      SELECT o_orderkey, o_custkey FROM orders
      UNION ALL
      SELECT -1, -999
    )
    SELECT 'pk_customer' AS constraint_name,
           CAST((SELECT COUNT(*) FROM (
               SELECT c_custkey FROM cust_aug GROUP BY c_custkey HAVING COUNT(*) > 1
           )) AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'fk_orders_customer',
           CAST((SELECT COUNT(*) FROM orders_aug o
                 WHERE o.o_custkey IS NOT NULL
                   AND o.o_custkey NOT IN (SELECT c_custkey FROM cust_aug)) AS BIGINT)
    UNION ALL
    SELECT 'fk_lineitem_orders',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE l.l_orderkey IS NOT NULL
                   AND l.l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT)
    """,
    doc="engine-level integrity audit (SURVEY §1.4: PK/FK semantics the "
        "reference gets from MySQL DDL, sql/dwh.sql:2,28,44): PK uniqueness "
        "via partial-aggregated key groupBy, FK orphans via bare-key anti "
        "join — run against the fixture star schema with one INJECTED "
        "duplicate key and one injected orphan so the check proves it "
        "detects (counts 1/1) while the clean lineitem→orders FK proves it "
        "passes (0).  The same checks gate commits via "
        "quality/constraints.py::require_constraints (WAP)",
)
def q_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.quality.constraints import fk_violations, pk_violations

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    min_key = cust.agg(F.min("c_custkey").alias("mn"))
    cust_aug = cust.unionByName(
        min_key.select(F.col("mn").alias("c_custkey"), F.lit("injected-dup").alias("c_name"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    orders_aug = orders.unionByName(
        spark.range(1).select(
            F.lit(-1).cast("long").alias("o_orderkey"), F.lit(-999).cast("long").alias("o_custkey")
        )
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")

    def one(name: str, n_df: DataFrame) -> DataFrame:
        return n_df.select(
            F.lit(name).alias("constraint_name"), F.col("n").cast("bigint").alias("n_violations")
        )

    pk_n = pk_violations(cust_aug, ["c_custkey"]).agg(F.count(F.lit(1)).alias("n"))
    fk1_n = fk_violations(orders_aug, cust_aug, ["o_custkey"], ["c_custkey"]).agg(
        F.count(F.lit(1)).alias("n")
    )
    fk2_n = fk_violations(li, orders, ["l_orderkey"], ["o_orderkey"]).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        one("pk_customer", pk_n)
        .unionByName(one("fk_orders_customer", fk1_n))
        .unionByName(one("fk_lineitem_orders", fk2_n))
    )


@register(
    "snapshot_delete_where",
    oracle="""
    SELECT event_id, event_type, CAST(value AS DOUBLE) AS value
    FROM events WHERE event_type <> 'error' OR event_type IS NULL
    """,
    doc="declarative row deletion on a committed snapshot table "
        "(sinks/upsert.py::delete_where — the GDPR/right-to-be-forgotten "
        "maintenance op Delta gets from DELETE FROM): events committed "
        "partitioned by event_type, then delete_where(event_type='error') "
        "rewrites ONLY the matching partitions (every other partition "
        "carries forward by reference) and commits a new version; the "
        "returned table must equal the SQL anti-filter.  Deleting is a "
        "commit: time travel still sees the rows in earlier versions until "
        "retention prunes them",
)
def q_snapshot_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from etl_tiki_webscraping_spark.sinks.upsert import (
        delete_where,
        read_parquet_table,
        upsert_parquet,
    )

    path = _DELETE_TABLES.get(sf_dir)
    if path is None:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", F.col("value").cast("double").alias("value")
        )
        path = tempfile.mkdtemp(prefix="delete-where-") + "/tbl"
        upsert_parquet(spark, ev, path, ["event_id"], partition_by=["event_type"])
        delete_where(spark, path, F.col("event_type") == "error", partition_by=["event_type"])
        _DELETE_TABLES[sf_dir] = path
    return read_parquet_table(spark, path).select("event_id", "event_type", "value")


_DELETE_TABLES: dict[str, str] = {}  # sf_dir -> table path (memoized)


@register(
    "tpch_refresh_rf1_rf2",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(o_totalprice AS DOUBLE) AS price
        FROM orders
    ),
    rf1 AS (
        SELECT o_orderkey + 600000000 AS o_orderkey, o_orderstatus,
               CAST(o_totalprice AS DOUBLE) + 100.0 AS price
        FROM orders WHERE o_orderkey % 10 = 1
    ),
    v2 AS (
        SELECT * FROM base UNION ALL SELECT * FROM rf1
    ),
    v3 AS (
        SELECT * FROM v2 WHERE o_orderkey % 37 <> 0
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(floor(price * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM v3 GROUP BY o_orderstatus
    """,
    doc="TPC-H refresh functions against the snapshot store — the "
        "benchmark's own update model, completing the 22/22 query "
        "suite with its write side: RF1 (new-order batch, keys offset "
        "beyond the key space) lands through upsert_parquet's MERGE "
        "path, RF2 (old-order deletions, the %37 slice) through "
        "delete_where's pruned rewrite, and the report aggregates the "
        "surviving table by status with cent-exact totals (the floor-"
        "quantize recipe).  The oracle replays both refreshes as pure "
        "CTE algebra over the same parquet.  Scale shape: both "
        "refreshes rewrite only touched files (manifest carry-"
        "forward); the report is one map-side-combined 3-group "
        "aggregate.",
)
def q_tpch_refresh_rf1_rf2(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from etl_tiki_webscraping_spark.sinks.upsert import (
        delete_where,
        read_parquet_table,
        upsert_parquet,
    )

    path = _RF_TABLES.get(sf_dir)
    if path is None:
        base = load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("double").alias("price"),
        )
        path = tempfile.mkdtemp(prefix="tpch-rf-") + "/orders"
        upsert_parquet(spark, base, path, ["o_orderkey"])
        rf1 = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderkey") % 10 == 1
        ).select(
            (F.col("o_orderkey") + 600000000).alias("o_orderkey"),
            "o_orderstatus",
            (F.col("o_totalprice").cast("double") + 100.0).alias("price"),
        )
        upsert_parquet(spark, rf1, path, ["o_orderkey"])
        delete_where(spark, path, F.col("o_orderkey") % 37 == 0)
        _RF_TABLES[sf_dir] = path
    return (
        read_parquet_table(spark, path)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("price") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("total_cents"),
        )
    )


_RF_TABLES: dict[str, str] = {}  # sf_dir -> table path (memoized)


@register(
    "snapshot_change_feed",
    oracle="""
    WITH v1 AS (
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DOUBLE) AS price,
               o_orderpriority AS prio
        FROM orders WHERE o_orderkey % 3 = 0
    ),
    b AS (
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DOUBLE) + 1000.0 AS price,
               o_orderpriority AS prio
        FROM orders WHERE o_orderkey % 5 = 0
    ),
    v2 AS (
        SELECT * FROM v1 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b)
        UNION ALL SELECT * FROM b
    ),
    changes AS (
        SELECT 1 AS _commit_version, 'insert' AS _change_type, * FROM v1
        UNION ALL
        SELECT 2, 'insert', * FROM b
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM v1)
        UNION ALL
        SELECT 2, 'update_preimage', * FROM v1
        WHERE o_orderkey IN (SELECT o_orderkey FROM b)
        UNION ALL
        SELECT 2, 'update_postimage', * FROM b
        WHERE o_orderkey IN (SELECT o_orderkey FROM v1)
        UNION ALL
        SELECT 3, 'delete', * FROM v2 WHERE prio = '1-URGENT'
    )
    SELECT _commit_version, _change_type, o_orderkey, o_custkey, price
    FROM changes
    """,
    doc="change data feed over the snapshot table (sinks/upsert.py::"
        "read_change_feed — Delta CDF semantics, no reference analog: the "
        "reference's warehouse keeps only current state, dags/etl.py:181-202): "
        "three commits with change_feed=True (create, overlapping upsert, "
        "predicate delete) record per-commit change files inside their "
        "snapshots; the read-back feed must equal the SQL replay of "
        "insert/update_preimage/update_postimage/delete rows.  Changes are "
        "derived at commit time from the touched rows the merge already "
        "reads — never an O(table) version diff — which is what lets CDC "
        "consumers follow a 100 TB table batch-by-batch",
)
def q_snapshot_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.sinks.upsert import read_change_feed

    path = _change_feed_table(spark, sf_dir)
    return read_change_feed(spark, path).select(
        "_commit_version", "_change_type", "o_orderkey", "o_custkey", "price"
    )


_CHANGE_FEED_TABLES: dict[str, str] = {}  # sf_dir -> table path (memoized)


def _change_feed_table(spark: SparkSession, sf_dir: str) -> str:
    """Stage (once per process) the three-commit CDF fixture table:
    v1 = orders keys %3, v2 = overlapping %5 batch at price+1000,
    v3 = delete of 1-URGENT rows.  Shared by snapshot_change_feed and
    snapshot_history."""
    import tempfile

    from etl_tiki_webscraping_spark.sinks.upsert import delete_where, upsert_parquet

    path = _CHANGE_FEED_TABLES.get(sf_dir)
    if path is None:
        orders = load_table(spark, sf_dir, "orders")
        base = orders.filter(F.col("o_orderkey") % 3 == 0).select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("double").alias("price"),
            F.col("o_orderpriority").alias("prio"),
        )
        batch = orders.filter(F.col("o_orderkey") % 5 == 0).select(
            "o_orderkey",
            "o_custkey",
            (F.col("o_totalprice").cast("double") + F.lit(1000.0)).alias("price"),
            F.col("o_orderpriority").alias("prio"),
        )
        path = tempfile.mkdtemp(prefix="change-feed-") + "/tbl"
        upsert_parquet(spark, base, path, ["o_orderkey"], keep_snapshots=5, change_feed=True)
        upsert_parquet(spark, batch, path, ["o_orderkey"], keep_snapshots=5, change_feed=True)
        delete_where(spark, path, F.col("prio") == "1-URGENT", change_feed=True, keep_snapshots=5)
        _CHANGE_FEED_TABLES[sf_dir] = path
    return path


_CUSTOMER_FEED_TABLES: dict[str, str] = {}  # sf_dir -> table path (memoized)


def _customer_feed_table(spark: SparkSession, sf_dir: str) -> str:
    """Stage (once per process) the customer-side three-commit CDF
    fixture: v1 = customers with even keys, v2 = overlapping %7 batch
    at acctbal+500, v3 = delete of the BUILDING segment.  The
    dimension-side twin of :func:`_change_feed_table`, used by the
    join-view IVM query."""
    import tempfile

    from etl_tiki_webscraping_spark.sinks.upsert import delete_where, upsert_parquet

    path = _CUSTOMER_FEED_TABLES.get(sf_dir)
    if path is None:
        cust = load_table(spark, sf_dir, "customer")
        base = cust.filter(F.col("c_custkey") % 2 == 0).select(
            "c_custkey",
            "c_name",
            F.col("c_acctbal").cast("double").alias("acctbal"),
            F.col("c_mktsegment").alias("seg"),
        )
        batch = cust.filter(F.col("c_custkey") % 7 == 0).select(
            "c_custkey",
            "c_name",
            (F.col("c_acctbal").cast("double") + F.lit(500.0)).alias("acctbal"),
            F.col("c_mktsegment").alias("seg"),
        )
        path = tempfile.mkdtemp(prefix="cust-feed-") + "/tbl"
        upsert_parquet(spark, base, path, ["c_custkey"], keep_snapshots=5, change_feed=True)
        upsert_parquet(spark, batch, path, ["c_custkey"], keep_snapshots=5, change_feed=True)
        delete_where(spark, path, F.col("seg") == "BUILDING", change_feed=True, keep_snapshots=5)
        _CUSTOMER_FEED_TABLES[sf_dir] = path
    return path


@register(
    "snapshot_history",
    oracle="""
    WITH v1 AS (SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey % 3 = 0),
    b AS (SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey % 5 = 0),
    v2 AS (
        SELECT * FROM v1 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b)
        UNION ALL SELECT * FROM b
    )
    SELECT 1 AS version, (SELECT COUNT(*) FROM v1) AS n_rows, TRUE AS has_change_feed
    UNION ALL
    SELECT 2, (SELECT COUNT(*) FROM v2), TRUE
    UNION ALL
    SELECT 3, (SELECT COUNT(*) FROM v2 WHERE o_orderpriority <> '1-URGENT'), TRUE
    """,
    doc="DESCRIBE HISTORY analog (sinks/upsert.py::table_history): one row "
        "per retained snapshot version with exact row counts taken from "
        "parquet FOOTER metadata (never a data scan — Delta-log-class "
        "I/O, bounded by retained versions x files).  The oracle "
        "recomputes what each commit's row count must have been from the "
        "same base slices, so the history's counts are verified against "
        "first principles, not against the engine's own reads.",
)
def q_snapshot_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.sinks.upsert import table_history

    path = _change_feed_table(spark, sf_dir)
    return table_history(spark, path).select("version", "n_rows", "has_change_feed")


def _hll_rollup_oracle() -> str:
    from etl_tiki_webscraping_spark.operators.sketches import hll_oracle_sql

    return "WITH " + hll_oracle_sql(
        "SELECT event_type, user_id FROM events",
        "user_id",
        ["event_type"],
        lg_k=8,
        out_col="approx_users",
    )


@register(
    "hll_sketch_rollup",
    oracle=_hll_rollup_oracle(),
    doc="mergeable distinct-count sketches — PORTABLE HyperLogLog "
        "(operators/sketches.py::hll_build/hll_merge/hll_estimate, the "
        "round-11 CMS md5 playbook applied to distinct counting, r12 "
        "VERDICT ask #3): per-day (day, event_type) register tables "
        "(md5-derived index + leading-zero rank, at most 2^8 rows per "
        "group) roll up to per-event-type totals by register MAX — "
        "never rescanning raw events, the re-aggregatable form a "
        "100 TB metrics table needs.  Upgraded from rows-only: the "
        "estimator is arranged so every step is engine-portable (exact "
        "bigint harmonic denominator, ONE IEEE division by a "
        "Python-precomputed literal, linear-counting correction as a "
        "precomputed literal table because ln() differs across engines "
        "in the last ulp), so the DuckDB oracle — GENERATED from the "
        "same constants via hll_oracle_sql — replays the FULL sketch "
        "bit-exactly: register grid, day->global max-merge (equal to a "
        "direct global build by max-associativity), branch select, "
        "estimate.  Accuracy vs exact count_distinct stays gated in "
        "tests/test_plans.py; Spark's built-in DataSketches HLL "
        "(hll_sketch_agg/hll_union_agg) remains exercised in "
        "tests/test_sketches.py as the cross-check.",
)
def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.sketches import (
        hll_build,
        hll_estimate,
        hll_merge,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = hll_build(
        ev.withColumn("day", F.to_date("ts")),
        "user_id",
        group_cols=["day", "event_type"],
        lg_k=8,
    )
    # the rollup re-aggregates REGISTER TABLES, not events: this
    # stage's input is |days x types x 256| rows regardless of volume
    merged = hll_merge(daily, drop_cols=["day"])
    return hll_estimate(
        merged, group_cols=["event_type"], lg_k=8, out_col="approx_users"
    )


@register(
    "bloom_pruned_semi_join",
    oracle="""
    SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'MACHINERY')
    """,
    doc="Bloom-filter join pruning (operators/bloom.py): the reference's "
        "driver-side isin key-set filter (dags/etl.py:250-251) re-expressed "
        "for 100 TB — the build side's keys fold into a 16 KiB bitmap "
        "(map-side bit_or partials), the probe side tests k codegen'd bits "
        "IN THE SCAN STAGE so non-matching rows die before the shuffle, and "
        "a closing exact semi join removes the bounded false positives. "
        "Result must be bit-identical to the plain semi join (the oracle).",
)
def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.bloom import bloom_pruned_semi_join

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_totalprice").cast("double").alias("price")
    )
    build = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    )
    return bloom_pruned_semi_join(orders, build, "o_custkey", "c_custkey")


@register(
    "bm25_search",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           t -> t <> '') AS toks
        FROM documents
    ),
    dd AS (SELECT doc_id, toks, len(toks) AS dl FROM d),
    stats AS (SELECT COUNT(*) AS n_docs,
                     CAST(SUM(dl) AS DOUBLE)/COUNT(*) AS avgdl FROM dd),
    postings AS (
        SELECT doc_id, dl, term, COUNT(*) AS tf
        FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dd)
        GROUP BY doc_id, dl, term
    ),
    dft AS (SELECT term, COUNT(*) AS dft FROM postings GROUP BY term),
    q(query_id, term) AS (VALUES
        ('q1','spark'),('q1','join'),('q2','window'),('q2','merge'),
        ('q3','hash'),('q3','scan'),('q3','table'),
        ('q4','vector'),('q4','stream')),
    scored AS (
        SELECT q.query_id, p.doc_id,
               SUM(CAST(ln(1 + (s.n_docs - f.dft + 0.5)/(f.dft + 0.5))
                   * (p.tf * 2.2) / (p.tf + 1.2*(0.25 + 0.75*p.dl/s.avgdl))
                   AS DECIMAL(18,8))) AS score_dec
        FROM postings p JOIN q ON p.term = q.term
        JOIN dft f ON f.term = p.term CROSS JOIN stats s
        GROUP BY q.query_id, p.doc_id
    )
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY score_dec DESC, doc_id) AS rank,
           CAST(score_dec AS DOUBLE) AS score
    FROM scored
    QUALIFY rank <= 10
    """,
    doc="BM25 ranked retrieval (operators/retrieval.py): inverted postings "
        "via one explode+groupBy shuffle, corpus stats as a one-row "
        "broadcast, the query term set broadcast onto the postings so the "
        "scored intermediate is |terms|-bounded, per-term contributions "
        "rounded to DECIMAL(18,8) before summation for order-independent "
        "ranking, row_number top-10 per query with a doc-id tie-break. "
        "Keyword corpus slicing / eval-mining leg of the LLM-data surface.",
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        [
            ("q1", "spark"), ("q1", "join"), ("q2", "window"), ("q2", "merge"),
            ("q3", "hash"), ("q3", "scan"), ("q3", "table"),
            ("q4", "vector"), ("q4", "stream"),
        ],
        "query_id string, term string",
    )
    return bm25_topk(docs, queries, top_k=10)


@register(
    "pii_redact",
    oracle=r"""
    WITH salted AS (
        SELECT doc_id,
               COALESCE(text, '') || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@mail.example.com or call +84 123 4567' AS raw
        FROM documents
    )
    SELECT doc_id,
           regexp_replace(
               regexp_replace(raw,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
               '\+\d{1,3}[ -]\d{3}[ -]\d{3,4}', '<PHONE>', 'g') AS clean_text,
           TRUE AS redacted
    FROM salted
    """,
    doc="PII scrubbing pass (functions/text.py::redact_pii — the C4-style "
        "pretraining-corpus email/phone redaction): deterministic synthetic "
        "PII is appended per doc (the fixture corpus carries none), then "
        "scrubbed to typed placeholders by two chained codegen'd "
        "regexp_replace calls — scan-bound at 100 TB, zero shuffle, zero "
        "UDF.  Patterns are the Java-regex/RE2 shared subset so the DuckDB "
        "oracle replays the exact same scrub.",
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.text import redact_pii

    docs = load_table(spark, sf_dir, "documents")
    # coalesce NULL text: concat would null the whole row and make
    # `redacted` NULL while the oracle emits constant TRUE
    raw = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or call +84 123 4567"),
    )
    clean = redact_pii(raw)
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        (clean != raw).alias("redacted"),
    )


def _html_fixture_sql() -> str:
    """The DuckDB half of the html_text_extract fixture: the SAME page
    template the Spark side concats, as a SQL expression."""
    return (
        "'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || "
        "'</title><style type=\"text/css\"> p { color: #333; } </style>"
        "<script> var n = ' || CAST(doc_id AS VARCHAR) || "
        "'; if (n &gt; 0) { track(n); } </script></head><body><h1>Doc ' "
        "|| CAST(doc_id AS VARCHAR) || '</h1><p>' || COALESCE(text, '') "
        "|| '</p><!-- crawl id ' || CAST(doc_id AS VARCHAR) || ' -->"
        "<div class=\"footer\">&amp;copy; Example &nbsp;Corp "
        "&lt;admin&gt;</div></body></html>'"
    )


def _register_html_text_extract() -> None:
    from etl_tiki_webscraping_spark.functions.html import html_to_text_sql

    @register(
        "html_text_extract",
        oracle=f"""
        WITH pages AS (
            SELECT doc_id, {_html_fixture_sql()} AS raw FROM documents
        )
        SELECT doc_id,
               {html_to_text_sql('raw')} AS clean_text,
               CAST(len(string_split({html_to_text_sql('raw')}, ' '))
                    AS INT) AS n_words
        FROM pages
        """,
        doc="HTML -> running-text extraction (functions/html.py — the "
            "first stage of every web-crawl corpus pipeline; the "
            "reference's pandas HTML readers do this implicitly, here "
            "it is explicit and oracle-checked): a deterministic page "
            "template (title/style/script/comment/entities) wraps each "
            "document at query time IN BOTH ENGINES, then the shared "
            "strip chain runs — script/style/comment content dropped, "
            "tags to spaces, entities decoded amp-LAST (so &amp;copy; "
            "yields the literal '&copy;', the double-decode trap), "
            "whitespace collapsed.  Every regex is the Java-regex/RE2 "
            "shared dialect and the oracle SQL is GENERATED from the "
            "same pattern tables (html_to_text_sql), so the engines "
            "cannot drift.  Scale shape: codegen'd narrow ops, "
            "scan-bound, zero shuffle, zero UDF.",
    )
    def q_html_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
        from etl_tiki_webscraping_spark.functions.html import html_to_text

        docs = load_table(spark, sf_dir, "documents")
        page = F.concat(
            F.lit("<html><head><title>Doc "),
            F.col("doc_id").cast("string"),
            F.lit('</title><style type="text/css"> p { color: #333; } '
                  "</style><script> var n = "),
            F.col("doc_id").cast("string"),
            F.lit("; if (n &gt; 0) { track(n); } </script></head>"
                  "<body><h1>Doc "),
            F.col("doc_id").cast("string"),
            F.lit("</h1><p>"),
            F.coalesce(F.col("text"), F.lit("")),
            F.lit("</p><!-- crawl id "),
            F.col("doc_id").cast("string"),
            F.lit(' --><div class="footer">&amp;copy; Example &nbsp;Corp '
                  "&lt;admin&gt;</div></body></html>"),
        )
        clean = html_to_text(page)
        return docs.select(
            "doc_id",
            clean.alias("clean_text"),
            F.size(F.split(clean, " ")).alias("n_words"),
        )


_register_html_text_extract()


# The dicttag queries' shared dictionary + its positional-enumeration
# oracle CTE (every start offset substr-checked — the exact overlapping
# semantics of the Aho-Corasick output function).
_DICTTAG_TERMS = ["spark", "window", "data line", "batch batch", "merge sort"]
_BLOCKLIST_TERMS = ["slow merge", "dup"]


def _dicttag_pos_cte(terms: "list[str]") -> str:
    vals = ", ".join("('" + t + "')" for t in terms)
    return f"""
    t(term) AS (VALUES {vals}),
    d AS (
        SELECT doc_id, lower(text) AS s FROM documents WHERE text IS NOT NULL
    ),
    pos AS (
        -- length() = CHARACTERS (substr is char-indexed); never strlen
        SELECT d.doc_id, t.term
        FROM d, t,
             unnest(range(0, greatest(length(d.s) - length(t.term) + 1, 0)))
                 AS g(p)
        WHERE substr(d.s, CAST(p + 1 AS INT), CAST(length(t.term) AS INT))
              = t.term
    )
    """


@register(
    "dicttag_term_counts",
    oracle=f"""
    WITH {_dicttag_pos_cte(_DICTTAG_TERMS)}
    SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS n_matches
    FROM pos GROUP BY doc_id, term
    """,
    doc="Aho-Corasick dictionary tagging (operators/dicttag.py — "
        "blocklists, topic tags, contamination probes): ONE automaton "
        "scan per document finds all (overlapping) occurrences of "
        "every dictionary term — multi-word terms and repeat-overlaps "
        "('batch batch' twice inside 'batch batch batch') included.  "
        "The DuckDB oracle enumerates every start offset and substr-"
        "compares, replaying the overlap semantics exactly.  Scale "
        "shape: dictionary broadcast in the task closure, automaton "
        "built once per task, Arrow-batched mapInPandas, only bare "
        "(id, term, count) rows ever cross an exchange.",
)
def q_dicttag_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.dicttag import tag_terms

    docs = load_table(spark, sf_dir, "documents")
    return tag_terms(docs, _DICTTAG_TERMS).select(
        F.col("id").alias("doc_id"), "term", "n_matches"
    )


@register(
    "blocklist_filter_survivors",
    oracle=f"""
    WITH {_dicttag_pos_cte(_BLOCKLIST_TERMS)},
    offenders AS (
        SELECT doc_id FROM pos GROUP BY doc_id HAVING COUNT(*) > 1
    )
    SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
    FROM documents d LEFT JOIN offenders o ON o.doc_id = d.doc_id
    WHERE o.doc_id IS NULL
    """,
    doc="Blocklist corpus filter over the same Aho-Corasick scan "
        "(operators/dicttag.py::blocklist_filter): documents whose "
        "total blocked-term hits exceed the threshold drop via a bare-"
        "id left-anti join — the C4-style bad-word screen.  Documents "
        "never shuffle; the offender set is tiny and broadcasts.",
)
def q_blocklist_filter_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.dicttag import blocklist_filter

    docs = load_table(spark, sf_dir, "documents")
    return blocklist_filter(docs, _BLOCKLIST_TERMS, max_hits=1).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


# url_canonicalize's deterministic crawl-URL fixture: scheme/host
# casing, default + explicit ports, tracking params in varying order,
# trailing slashes, fragments — every rule the canonicalizer owns.
def _url_fixture_sql() -> str:
    return """
        CASE doc_id % 4
            WHEN 0 THEN 'https://WWW.Example.COM:443'
            WHEN 1 THEN 'https://blog.example.org'
            WHEN 2 THEN 'http://Shop.Example.net:80'
            ELSE 'https://cdn.example.net:8443'
        END
        || '/Posts/' || CAST(doc_id AS VARCHAR)
        || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
        || CASE doc_id % 5
            WHEN 0 THEN '?utm_source=feed&b=2&a=1'
            WHEN 1 THEN '?b=2&a=1&fbclid=xyz'
            WHEN 2 THEN '?a=1&utm_medium=mail'
            WHEN 3 THEN '?gclid=123'
            ELSE ''
        END
        || CASE WHEN doc_id % 3 = 0 THEN '#Section-2' ELSE '' END
    """


def _register_url_canonicalize() -> None:
    from etl_tiki_webscraping_spark.functions.url import (
        canonicalize_url_sql,
        extract_host_sql,
    )

    @register(
        "url_canonicalize",
        oracle=f"""
        WITH crawl AS (
            SELECT doc_id, {_url_fixture_sql()} AS raw_url FROM documents
        )
        SELECT doc_id,
               {canonicalize_url_sql('raw_url')} AS canon_url,
               {extract_host_sql('raw_url')} AS host
        FROM crawl
        """,
        doc="URL canonicalization for crawl curation (functions/url.py "
            "— the inverse of the reference's URL assembly, "
            "dags/etl.py's category/product path building): host "
            "casing folded, default ports stripped, fragments dropped, "
            "tracking params (utm_*/fbclid/gclid) removed and the "
            "survivors SORTED so parameter order never splits one page "
            "into two identities, trailing slashes trimmed, plus the "
            "www-stripped host as the rollup key.  Chain avoids "
            "capture-group replacements entirely (Java spells them $1, "
            "RE2 \\\\1 — the one place the shared dialect splits), and "
            "the DuckDB SQL is generated from the same rules.  Scale "
            "shape: codegen'd narrow ops, scan-bound, zero shuffle.",
    )
    def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
        from etl_tiki_webscraping_spark.functions.url import (
            canonicalize_url,
            extract_host,
        )

        docs = load_table(spark, sf_dir, "documents")
        raw = F.concat(
            F.when(F.col("doc_id") % 4 == 0, F.lit("https://WWW.Example.COM:443"))
            .when(F.col("doc_id") % 4 == 1, F.lit("https://blog.example.org"))
            .when(F.col("doc_id") % 4 == 2, F.lit("http://Shop.Example.net:80"))
            .otherwise(F.lit("https://cdn.example.net:8443")),
            F.lit("/Posts/"),
            F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("/")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit("?utm_source=feed&b=2&a=1"))
            .when(F.col("doc_id") % 5 == 1, F.lit("?b=2&a=1&fbclid=xyz"))
            .when(F.col("doc_id") % 5 == 2, F.lit("?a=1&utm_medium=mail"))
            .when(F.col("doc_id") % 5 == 3, F.lit("?gclid=123"))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 3 == 0, F.lit("#Section-2")).otherwise(
                F.lit("")
            ),
        )
        return docs.select(
            "doc_id",
            canonicalize_url(raw).alias("canon_url"),
            extract_host(raw).alias("host"),
        )


_register_url_canonicalize()


# mojibake damage injected into a deterministic doc slice (the fixture
# corpus is clean ASCII): the CP1252 renderings of é / ’ / » / … plus a
# replacement char — 6 marker hits for the %7=0 slice, 1 for %7=3.
_MOJIBAKE_TAIL_HEAVY = " donâ€™t cafÃ© Â» costâ€¦ bad�byte"
_MOJIBAKE_TAIL_LIGHT = " cafÃ©"


def _register_encoding_quality() -> None:
    from etl_tiki_webscraping_spark.functions.encoding import mojibake_hits_sql

    @register(
        "encoding_quality_report",
        oracle=f"""
        WITH damaged AS (
            SELECT doc_id, source,
                   COALESCE(text, '') ||
                   CASE WHEN doc_id % 7 = 0 THEN '{_MOJIBAKE_TAIL_HEAVY}'
                        WHEN doc_id % 7 = 3 THEN '{_MOJIBAKE_TAIL_LIGHT}'
                        ELSE '' END AS raw
            FROM documents
        ),
        scored AS (
            SELECT doc_id, source, {mojibake_hits_sql('raw')} AS hits
            FROM damaged
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_damaged,
               CAST(SUM(hits) AS BIGINT) AS total_hits
        FROM scored GROUP BY source
        """,
        doc="Encoding-damage screen (functions/encoding.py — the C4/"
            "Gopher-style mojibake check the reference's charset-"
            "guessing scraper never does): deterministic CP1252-"
            "mojibake tails are injected into a doc_id slice IN BOTH "
            "ENGINES, then counted via the replace-length identity "
            "over the shared marker table — literal substring counts, "
            "zero regex, zero UDF.  The oracle generator uses "
            "length() (characters) never strlen (bytes): the markers "
            "are multi-byte UTF-8, the one cross-engine trap here.  "
            "Scale: scan-bound narrow ops + one tiny groupBy(source).",
    )
    def q_encoding_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
        from etl_tiki_webscraping_spark.functions.encoding import mojibake_hits

        docs = load_table(spark, sf_dir, "documents")
        raw = F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(F.col("doc_id") % 7 == 0, F.lit(_MOJIBAKE_TAIL_HEAVY))
            .when(F.col("doc_id") % 7 == 3, F.lit(_MOJIBAKE_TAIL_LIGHT))
            .otherwise(F.lit("")),
        )
        return (
            docs.select("source", mojibake_hits(raw).alias("hits"))
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum((F.col("hits") > 0).cast("long")).alias("n_damaged"),
                F.sum("hits").alias("total_hits"),
            )
        )


_register_encoding_quality()


@register(
    "variant_semistructured_extract",
    oracle="""
    WITH payloads AS (
        SELECT doc_id,
               '{"doc": {"id": ' || CAST(doc_id AS VARCHAR) ||
               ', "lang": "' || lang || '"}, "metrics": {"chars": ' ||
               CAST(n_chars AS VARCHAR) || ', "flags": [' ||
               CAST(doc_id % 2 AS VARCHAR) || ', ' ||
               CAST(doc_id % 3 AS VARCHAR) || ']}}' AS js
        FROM documents
    )
    SELECT doc_id,
           json_extract_string(js, '$.doc.lang') AS lang_v,
           CAST(json_extract(js, '$.metrics.chars') AS BIGINT) AS chars_v,
           CAST(json_extract(js, '$.metrics.flags[1]') AS INT) AS flag1,
           json_extract_string(js, '$.metrics.absent') AS absent_v
    FROM payloads
    """,
    doc="Schema-on-read semi-structured ingestion via Spark 4's "
        "VARIANT type (parse_json -> variant_get / try_variant_get): "
        "the modern engine path for ragged crawl metadata where "
        "from_json's fixed StructType can't follow drifting payloads.  "
        "A deterministic JSON document wraps each row IN BOTH ENGINES; "
        "extraction pulls a nested string, a nested bigint, an array "
        "index (0-based in variant paths AND DuckDB json paths), and "
        "a MISSING path (try_variant_get -> NULL, json_extract_string "
        "-> NULL — the two engines agree on absence).  Scale shape: "
        "variant parse + typed gets are codegen'd narrow ops over the "
        "binary variant encoding; zero shuffle, zero UDF.",
)
def q_variant_semistructured_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    js = F.concat(
        F.lit('{"doc": {"id": '),
        F.col("doc_id").cast("string"),
        F.lit(', "lang": "'),
        F.col("lang"),
        F.lit('"}, "metrics": {"chars": '),
        F.col("n_chars").cast("string"),
        F.lit(', "flags": ['),
        (F.col("doc_id") % 2).cast("string"),
        F.lit(", "),
        (F.col("doc_id") % 3).cast("string"),
        F.lit("]}}"),
    )
    v = docs.select("doc_id", F.parse_json(js).alias("v"))
    return v.select(
        "doc_id",
        F.variant_get("v", "$.doc.lang", "string").alias("lang_v"),
        F.variant_get("v", "$.metrics.chars", "long").alias("chars_v"),
        F.variant_get("v", "$.metrics.flags[1]", "int").alias("flag1"),
        F.try_variant_get("v", "$.metrics.absent", "string").alias("absent_v"),
    )


@register(
    "attribution_last_touch",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events
    ),
    w AS (
        SELECT *,
               MAX(CASE WHEN event_type = 'view' THEN ms END) OVER (
                   PARTITION BY user_id ORDER BY ms, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lv
        FROM e
    )
    SELECT event_id AS purchase_id, user_id,
           (lv IS NOT NULL AND ms - lv <= 3600000) AS attributed,
           CASE WHEN lv IS NOT NULL AND ms - lv <= 3600000
                THEN CAST((ms - lv) // 60000 AS INT) END AS mins_since_view
    FROM w WHERE event_type = 'purchase'
    """,
    doc="Last-touch attribution: each purchase credits the user's most "
        "recent preceding view within a 1-hour window — the classic "
        "marketing-attribution shape, expressed as ONE conditional-max "
        "window over the event stream instead of a purchases-to-views "
        "self-join (one shuffle on user_id; the as-of join twin is "
        "asof_join_events_orders).  The frame is ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND 1 PRECEDING over (ms, event_id) — a "
        "deterministic total order, so a view and purchase sharing a "
        "millisecond resolve identically in both engines.  ms "
        "arithmetic is exact integer math.",
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_millis("ts").alias("ms"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lv = F.max(
        F.when(F.col("event_type") == "view", F.col("ms"))
    ).over(w)
    flagged = ev.withColumn("lv", lv).filter(
        F.col("event_type") == "purchase"
    )
    attributed = F.col("lv").isNotNull() & (
        F.col("ms") - F.col("lv") <= 3600000
    )
    return flagged.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        attributed.alias("attributed"),
        F.when(
            attributed,
            F.floor((F.col("ms") - F.col("lv")) / 60000).cast("int"),
        ).alias("mins_since_view"),
    )


@register(
    "contrastive_negatives_sample",
    oracle="""
    WITH anchors AS (
        SELECT doc_id AS anchor_id,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 16 AS bucket
        FROM documents WHERE doc_id % 25 = 0
    ),
    pool AS (
        SELECT doc_id AS neg_id,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 16 AS bucket
        FROM documents WHERE doc_id % 25 <> 0 AND text IS NOT NULL
    ),
    scored AS (
        SELECT a.anchor_id, p.neg_id,
               CAST(('0x' || substr(md5(CAST(a.anchor_id AS VARCHAR) || ':'
                                        || CAST(p.neg_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h
        FROM anchors a JOIN pool p ON p.bucket = a.bucket
    ),
    ranked AS (
        SELECT anchor_id, neg_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY anchor_id
                                       ORDER BY h, neg_id) AS INT) AS rank
        FROM scored
    )
    SELECT anchor_id, neg_id, rank FROM ranked WHERE rank <= 3
    """,
    doc="Deterministic negative mining for contrastive training: each "
        "anchor draws 3 pseudo-random negatives ranked by a 60-bit md5 "
        "of the (anchor, candidate) pair — reproducible across "
        "engines, cluster sizes and reruns (the md5-determinism rule), "
        "so a resumed training job regenerates the SAME pairs.  The "
        "candidate pool is pre-bucketed by md5(doc_id)%16 and anchors "
        "join only their own bucket — an EQUI join (plan-audited: no "
        "cartesian), which is the scale shape: the per-anchor "
        "candidate set is |pool|/16 regardless of corpus size, and "
        "widening the draw is a bucket-count knob, not a quadratic "
        "blow-up.  Top-3 per anchor is a bounded per-group window over "
        "the bucket-restricted candidates.",
)
def q_contrastive_negatives_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 16
    )
    anchors = docs.filter(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("anchor_id"), bucket.alias("bucket")
    )
    pool = docs.filter(
        (F.col("doc_id") % 25 != 0) & F.col("text").isNotNull()
    ).select(F.col("doc_id").alias("neg_id"), bucket.alias("bucket"))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("anchor_id").cast("string"),
                    F.lit(":"),
                    F.col("neg_id").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    scored = anchors.join(pool, on="bucket").select(
        "anchor_id", "neg_id", h.alias("h")
    )
    w = Window.partitionBy("anchor_id").orderBy("h", "neg_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("anchor_id", "neg_id", "rank")
    )


@register(
    "heaps_law_report",
    oracle=r"""
    WITH toks AS (
        SELECT source, u.t AS tok
        FROM (SELECT source,
                     list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                 x -> x <> '') AS tk
              FROM documents WHERE text IS NOT NULL),
             unnest(tk) AS u(t)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct,
           CAST(ln(CAST(COUNT(DISTINCT tok) AS DOUBLE))
                / NULLIF(ln(CAST(COUNT(*) AS DOUBLE)), 0.0) AS DOUBLE)
               AS heaps_beta
    FROM toks GROUP BY source
    """,
    doc="Heaps'-law vocabulary-growth report per source: total token "
        "occurrences, distinct vocabulary, and the empirical exponent "
        "beta = ln V / ln N (V ~ N^beta) — the standard check that a "
        "corpus slice isn't degenerate (template spam shows beta near "
        "0; random noise near 1).  Scale shape: one explode into one "
        "map-side-combined groupBy carrying (source, token); the "
        "distinct count is exact here — swap in the HLL sketch rollup "
        "(operators/sketches.py) when vocabulary cardinality itself "
        "is the bottleneck at 100 TB.",
)
def q_heaps_law_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.text import tokenize_ws

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = docs.select(
        "source", F.explode(tokenize_ws(F.lower(F.col("text")))).alias("tok")
    )
    return toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct"),
        # try_divide: a 1-token source has ln(N)=0 — NULL in both
        # engines (mirrors the oracle's NULLIF), never Inf/NaN
        F.try_divide(
            F.log(F.countDistinct("tok").cast("double")),
            F.log(F.count(F.lit(1)).cast("double")),
        ).alias("heaps_beta"),
    )


@register(
    "doc_token_entropy",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, u.t AS tok
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                 x -> x <> '') AS tk
              FROM documents WHERE text IS NOT NULL),
             unnest(tk) AS u(t)
    ),
    tf AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS c
        FROM toks GROUP BY doc_id, tok
    ),
    n AS (
        SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS n FROM tf GROUP BY doc_id
    )
    SELECT tf.doc_id,
           CAST(n.n AS BIGINT) AS n_tokens,
           -- + 0.0 normalizes -0.0 (an all-one-token doc sums to 0;
           -- IEEE negation gives -0.0, whose BIT pattern could differ
           -- across engines under the full-precision comparator)
           round(-SUM((tf.c / n.n) * ln(tf.c / n.n) / ln(2.0)) + 0.0, 9)
               AS entropy_bits
    FROM tf JOIN n ON n.doc_id = tf.doc_id
    GROUP BY tf.doc_id, n.n
    """,
    doc="Per-document Shannon entropy of the in-doc token distribution "
        "(bits/token) — the Gopher-family repetition/diversity signal: "
        "near-zero entropy is a one-token spam page, maximal entropy "
        "is all-distinct tokens.  Both engines evaluate the identical "
        "-(c/n) ln(c/n)/ln 2 expression tree over identical (count, "
        "total) integers and round to 9 digits (the ranking "
        "convention).  Scale shape: one explode, one map-side-combined "
        "(doc, token) count, one (doc) rollup — exchanges carry single "
        "tokens at most.",
)
def q_doc_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.text import tokenize_ws

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    tf = (
        docs.select(
            "doc_id",
            F.explode(tokenize_ws(F.lower(F.col("text")))).alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    n = tf.groupBy("doc_id").agg(F.sum("c").alias("n"))
    return (
        tf.join(n, on="doc_id")
        .groupBy("doc_id", "n")
        .agg(
            F.round(
                -F.sum(
                    (F.col("c") / F.col("n"))
                    * F.log(F.col("c") / F.col("n"))
                    / F.log(F.lit(2.0))
                )
                + F.lit(0.0),  # -0.0 -> +0.0, mirrored in the oracle
                9,
            ).alias("entropy_bits")
        )
        .select(
            "doc_id", F.col("n").cast("bigint").alias("n_tokens"), "entropy_bits"
        )
    )


@register(
    "export_shard_manifest",
    oracle=r"""
    WITH assigned AS (
        SELECT doc_id, n_chars,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   AS n_tokens,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 16 AS shard
        FROM documents WHERE text IS NOT NULL
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM assigned GROUP BY shard
    """,
    doc="Training-export shard manifest: every document maps to one of "
        "16 shards by md5(doc_id) — deterministic across engines, "
        "cluster sizes and reruns (the stratified_hash_sample rule), "
        "which is what makes dataloader resume and cross-run diffing "
        "possible — and the manifest reports per-shard doc/token/char "
        "totals, the numbers a training job's data plan is signed off "
        "against.  At scale the same assignment column feeds "
        "DataFrameWriter.partitionBy for the physical export; the "
        "manifest is one map-side-combined 16-group aggregate.",
)
def q_export_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    assigned = docs.select(
        "doc_id",
        "n_chars",
        F.size(F.split(F.trim(F.col("text")), "[ \t\n\f\r]+")).cast("bigint").alias(
            "n_tokens"
        ),
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint") % 16
        ).alias("shard"),
    )
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


def _register_host_quality_rollup() -> None:
    from etl_tiki_webscraping_spark.functions.url import extract_host_sql

    @register(
        "host_quality_rollup",
        oracle=f"""
        WITH crawl AS (
            SELECT doc_id, text, {_url_fixture_sql()} AS raw_url
            FROM documents
        ),
        scored AS (
            SELECT {extract_host_sql('raw_url')} AS host,
                   CAST(len(list_filter(
                           string_split_regex(lower(trim(text)), '\\s+'),
                           t -> t IN ('the','and','of','to','in','is','it',
                                      'that','for','with'))) AS DOUBLE)
                       / CAST(greatest(len(string_split_regex(
                             lower(trim(text)), '\\s+')), 1) AS DOUBLE)
                       AS quality
            FROM crawl WHERE text IS NOT NULL
        )
        SELECT host,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               round(AVG(quality), 9) AS avg_quality
        FROM scored GROUP BY host
        """,
        doc="Per-host crawl-quality rollup — the composition the "
            "curation loop actually runs (bad hosts get domain-level "
            "blocks, not per-doc filters): canonical host extraction "
            "(functions/url.py) x stopword-ratio quality (functions/"
            "text.py), one map-side-combined groupBy over a handful of "
            "hosts.  AVG is replayed with identical double summation "
            "order via round-9 (the ranking convention).",
    )
    def q_host_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
        from etl_tiki_webscraping_spark.functions.text import stopword_ratio
        from etl_tiki_webscraping_spark.functions.url import extract_host

        docs = load_table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull()
        )
        raw = F.concat(
            F.when(F.col("doc_id") % 4 == 0, F.lit("https://WWW.Example.COM:443"))
            .when(F.col("doc_id") % 4 == 1, F.lit("https://blog.example.org"))
            .when(F.col("doc_id") % 4 == 2, F.lit("http://Shop.Example.net:80"))
            .otherwise(F.lit("https://cdn.example.net:8443")),
            F.lit("/Posts/"),
            F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("/")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit("?utm_source=feed&b=2&a=1"))
            .when(F.col("doc_id") % 5 == 1, F.lit("?b=2&a=1&fbclid=xyz"))
            .when(F.col("doc_id") % 5 == 2, F.lit("?a=1&utm_medium=mail"))
            .when(F.col("doc_id") % 5 == 3, F.lit("?gclid=123"))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 3 == 0, F.lit("#Section-2")).otherwise(
                F.lit("")
            ),
        )
        return (
            docs.select(
                extract_host(raw).alias("host"),
                stopword_ratio("text").alias("quality"),
            )
            .groupBy("host")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.round(F.avg("quality"), 9).alias("avg_quality"),
            )
        )


_register_host_quality_rollup()


def _register_corpus_pipeline_v3() -> None:
    from etl_tiki_webscraping_spark.functions.encoding import mojibake_hits_sql
    from etl_tiki_webscraping_spark.functions.html import html_to_text_sql

    page_sql = (
        "'<html><head><title>Crawl Page</title>"
        "<style> body { margin: 0; } </style>"
        "<script> trackPage(); </script></head><body><h1>Post</h1><p>' "
        "|| dtext || '</p><!-- crawler --><div class=\"footer\">"
        "&amp;copy; Example &nbsp;Corp</div></body></html>'"
    )
    bl_vals = ", ".join("('" + t + "')" for t in _BLOCKLIST_TERMS)

    @register(
        "corpus_pipeline_v3",
        oracle=f"""
        WITH damaged AS (
            SELECT doc_id, lang,
                   COALESCE(text, '') ||
                   CASE WHEN doc_id % 7 = 0 THEN '{_MOJIBAKE_TAIL_HEAVY}'
                        WHEN doc_id % 7 = 3 THEN '{_MOJIBAKE_TAIL_LIGHT}'
                        ELSE '' END AS dtext
            FROM documents
        ),
        pages AS (
            SELECT doc_id, lang, {page_sql} AS rawpage FROM damaged
        ),
        cleaned AS (
            SELECT doc_id, lang, {html_to_text_sql('rawpage')} AS clean
            FROM pages
        ),
        screened AS (
            SELECT * FROM cleaned WHERE {mojibake_hits_sql('clean')} = 0
        ),
        bt(term) AS (VALUES {bl_vals}),
        bl_pos AS (
            SELECT s.doc_id
            FROM (SELECT doc_id, lower(clean) AS cl FROM screened) s, bt,
                 unnest(range(0, greatest(length(s.cl) - length(bt.term) + 1,
                                          0))) AS g(p)
            WHERE substr(s.cl, CAST(p + 1 AS INT),
                         CAST(length(bt.term) AS INT)) = bt.term
        ),
        offenders AS (
            SELECT doc_id FROM bl_pos GROUP BY doc_id HAVING COUNT(*) > 1
        ),
        kept AS (
            SELECT c.* FROM screened c
            LEFT JOIN offenders o ON o.doc_id = c.doc_id
            WHERE o.doc_id IS NULL
        ),
        deduped AS (
            SELECT doc_id, lang, clean FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY md5(regexp_replace(lower(trim(clean)),
                                                    '\\s+', ' ', 'g'))
                    ORDER BY doc_id ASC) AS rn
                FROM kept
            ) WHERE rn = 1
        ),
        scored AS (
            SELECT doc_id, lang,
                   CAST(len(list_filter(
                           string_split_regex(lower(trim(clean)), '\\s+'),
                           t -> t IN ('the','and','of','to','in','is','it',
                                      'that','for','with'))) AS DOUBLE)
                       / CAST(greatest(len(string_split_regex(
                             lower(trim(clean)), '\\s+')), 1) AS DOUBLE)
                       AS quality,
                   CAST(len(string_split_regex(trim(clean), '\\s+'))
                        AS BIGINT) AS n_tokens
            FROM deduped
        ),
        ordered AS (
            SELECT doc_id, lang, quality, n_tokens,
                   CAST(SUM(CAST(n_tokens AS DECIMAL(38,6))) OVER (
                       PARTITION BY lang
                       ORDER BY quality DESC, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DOUBLE) AS cum
            FROM scored
        )
        SELECT doc_id, lang, quality, n_tokens
        FROM ordered WHERE cum <= 1500
        ORDER BY lang, quality DESC, doc_id
        """,
        doc="Corpus-curation capstone v3 — the ROUND-12 STAGES chained "
            "end to end, every stage oracle-replayed in one CTE tree: "
            "crawl HTML (with CP1252 mojibake injected into a doc "
            "slice) -> html_to_text extraction -> encoding-damage "
            "screen (any marker hit drops) -> Aho-Corasick blocklist "
            "(>1 total hits drops, positional-enumeration replay) -> "
            "exact content dedup (md5-normalized, min-id survivor, "
            "bare 24-byte shuffle rows) -> per-language token-budget "
            "fill (distributed two-pass prefix sum, quality-ranked, "
            "DECIMAL-exact).  Scale shape: stages 1-3 are scan-bound "
            "codegen; the blocklist scan ships only (id, count) rows; "
            "dedup and budget shuffle bare ids + grouped partials — "
            "full documents never cross an exchange after extraction.",
    )
    def q_corpus_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
        from etl_tiki_webscraping_spark.functions.encoding import mojibake_hits
        from etl_tiki_webscraping_spark.functions.html import html_to_text
        from etl_tiki_webscraping_spark.functions.text import stopword_ratio
        from etl_tiki_webscraping_spark.operators.dedup import exact_dedup
        from etl_tiki_webscraping_spark.operators.dicttag import blocklist_filter
        from etl_tiki_webscraping_spark.operators.relational import (
            ordered_budget_select,
        )

        docs = load_table(spark, sf_dir, "documents")
        dtext = F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(F.col("doc_id") % 7 == 0, F.lit(_MOJIBAKE_TAIL_HEAVY))
            .when(F.col("doc_id") % 7 == 3, F.lit(_MOJIBAKE_TAIL_LIGHT))
            .otherwise(F.lit("")),
        )
        page = F.concat(
            F.lit("<html><head><title>Crawl Page</title>"
                  "<style> body { margin: 0; } </style>"
                  "<script> trackPage(); </script></head><body><h1>Post</h1><p>"),
            dtext,
            F.lit('</p><!-- crawler --><div class="footer">'
                  "&amp;copy; Example &nbsp;Corp</div></body></html>"),
        )
        # PERSIST the extraction projection: Catalyst collapses a
        # projection into the consuming filter, re-inlining the big
        # regexp chain once per reference — mojibake_hits alone
        # references `clean` 9 times, so the unpinned plan evaluated
        # the whole extraction ~9x per row (measured: 4.0 s for the
        # screen vs 0.4 s for the extraction itself), and the chain
        # additionally feeds four downstream executions (blocklist
        # scan + anti-join, dedup election + semi join).  The persist
        # is the projection barrier; at 100 TB the same role is played
        # by checkpointing the extracted corpus to parquet once.
        cleaned = docs.select(
            "doc_id", "lang", html_to_text(page).alias("clean")
        ).persist()
        screened = cleaned.filter(mojibake_hits(F.col("clean")) == 0)
        kept = blocklist_filter(
            screened, _BLOCKLIST_TERMS, text_col="clean", id_col="doc_id",
            max_hits=1,
        ).persist()
        deduped = exact_dedup(kept, "clean", "doc_id")
        scored = deduped.select(
            "doc_id",
            "lang",
            stopword_ratio("clean").alias("quality"),
            F.size(F.split(F.trim(F.col("clean")), "[ \t\n\f\r]+"))
            .cast("bigint").alias("n_tokens"),
        )
        return ordered_budget_select(
            scored, "quality", "n_tokens", 1500, "doc_id", group_cols=["lang"]
        ).orderBy("lang", F.col("quality").desc(), "doc_id")


_register_corpus_pipeline_v3()


@register(
    "exists_subquery_agg",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-06-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
    """,
    doc="correlated EXISTS subquery (TPC-H Q4 shape) submitted as SQL TEXT: "
        "Catalyst's RewritePredicateSubquery turns the EXISTS into a "
        "left-semi join — the declarative form of the reference's "
        "application-side FK gate (dags/etl.py:251).  The engine's SQL "
        "surface must accept the subquery form a warehouse user writes, "
        "not only the pre-joined DataFrame form.",
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.io import register_views

    register_views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-06-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        GROUP BY o_orderpriority
        """
    )


@register(
    "correlated_scalar_subquery",
    oracle="""
    SELECT p.p_brand,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
               AS small_qty_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_small
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_quantity < (
        SELECT 0.5 * CAST(SUM(l2.l_quantity) AS DOUBLE) / COUNT(*)
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
    )
    GROUP BY p.p_brand
    """,
    doc="correlated SCALAR subquery (TPC-H Q17 shape) as SQL TEXT: "
        "Catalyst de-correlates the per-part average into an aggregate + "
        "join (RewriteCorrelatedScalarSubquery) instead of re-running it "
        "per row.  The threshold average is computed as exact-integer "
        "SUM/COUNT in double division on both engines, so the comparison "
        "is bit-deterministic.",
)
def q_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.io import register_views

    register_views(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        """
        SELECT p.p_brand,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                   AS small_qty_revenue,
               COUNT(*) AS n_small
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity < (
            SELECT 0.5 * CAST(SUM(l2.l_quantity) AS DOUBLE) / COUNT(*)
            FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
        )
        GROUP BY p.p_brand
        """
    )


@register(
    "cdc_replication_from_feed",
    oracle="""
    WITH v1 AS (
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DOUBLE) AS price, o_orderpriority AS prio
        FROM orders WHERE o_orderkey % 3 = 0
    ),
    b AS (
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DOUBLE) + 1000.0 AS price, o_orderpriority AS prio
        FROM orders WHERE o_orderkey % 5 = 0
    ),
    v2 AS (
        SELECT * FROM v1 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b)
        UNION ALL SELECT * FROM b
    )
    SELECT o_orderkey, o_custkey, price FROM v2 WHERE prio <> '1-URGENT'
    """,
    doc="CDC replication closed loop: a downstream replica is rebuilt "
        "PURELY from the upstream table's change feed — "
        "read_change_feed rows map to I/U/D ops (preimages dropped, "
        "_commit_version as the sequence) and apply_changes folds them "
        "into the replica, which must equal the upstream table's current "
        "state (the oracle recomputes it from first principles).  This is "
        "the consumer half of the CDF story: a 100 TB replica follows "
        "per-commit change files, never re-reading the source table.",
)
def q_cdc_replication(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.sinks.upsert import (
        apply_changes,
        read_change_feed,
    )

    path = _change_feed_table(spark, sf_dir)
    feed = read_change_feed(spark, path)
    mapped = feed.filter(F.col("_change_type") != "update_preimage").select(
        "o_orderkey",
        "o_custkey",
        "price",
        "prio",
        F.when(F.col("_change_type") == "insert", "I")
        .when(F.col("_change_type") == "delete", "D")
        .otherwise("U")
        .alias("op"),
        F.col("_commit_version").alias("seq"),
    )
    empty = spark.createDataFrame(
        [], "o_orderkey bigint, o_custkey bigint, price double, prio string"
    )
    replica = apply_changes(empty, mapped, ["o_orderkey"])
    return replica.select("o_orderkey", "o_custkey", "price")


@register(
    "ivm_rollup_from_feed",
    oracle="""
    WITH v1 AS (
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price,
               o_orderpriority AS prio
        FROM orders WHERE o_orderkey % 3 = 0
    ),
    b AS (
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) + 1000.0 AS price,
               o_orderpriority AS prio
        FROM orders WHERE o_orderkey % 5 = 0
    ),
    v2 AS (
        SELECT * FROM v1 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b)
        UNION ALL SELECT * FROM b
    ),
    final AS (SELECT * FROM v2 WHERE prio <> '1-URGENT')
    SELECT prio, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(price AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM final GROUP BY prio
    """,
    doc="incremental view maintenance from the change feed "
        "(operators/rollup.py::rollup_deltas_from_change_feed): the "
        "per-priority revenue rollup of version 1 is merged with SIGNED "
        "deltas derived from the v2..v3 change feed (+post/-pre, "
        "-delete) and must equal a direct aggregate over the final "
        "table — including the 1-URGENT group cancelling to zero and "
        "dropping out.  At 100 TB the rollup follows batch-sized change "
        "files; the table is never re-aggregated.",
)
def q_ivm_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.rollup import (
        merge_additive,
        rollup_deltas_from_change_feed,
    )
    from etl_tiki_webscraping_spark.sinks.upsert import (
        read_change_feed,
        read_parquet_table,
    )

    path = _change_feed_table(spark, sf_dir)
    base = read_parquet_table(spark, path, version=1)
    base_rollup = base.groupBy("prio").agg(
        F.sum(F.col("price").cast("decimal(18,6)")).alias("sum_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    deltas = rollup_deltas_from_change_feed(
        read_change_feed(spark, path, from_version=2, to_version=3),
        ["prio"],
        "price",
        sum_col="sum_price",
        count_col="n_rows",
    )
    maintained = merge_additive(
        base_rollup, deltas, ["prio"], add_cols=["sum_price", "n_rows"]
    )
    return maintained.filter(F.col("n_rows") > 0).select(
        "prio",
        "n_rows",
        F.col("sum_price").cast("double").alias("sum_price"),
    )


@register(
    "distribution_drift_psi",
    oracle="""
    WITH binned AS (
        SELECT event_type,
               CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'a' ELSE 'b' END AS period,
               LEAST(19, GREATEST(0, CAST(FLOOR(value / 25.0) AS INT))) AS bin
        FROM events WHERE value IS NOT NULL
    ),
    ca AS (SELECT event_type, bin, COUNT(*) AS na FROM binned WHERE period = 'a' GROUP BY 1, 2),
    cb AS (SELECT event_type, bin, COUNT(*) AS nb FROM binned WHERE period = 'b' GROUP BY 1, 2),
    allbins AS (
        SELECT g.event_type, gs.generate_series AS bin
        FROM (SELECT DISTINCT event_type FROM binned) g,
             generate_series(0, 19) gs
    ),
    grid AS (
        SELECT ab.event_type, ab.bin,
               COALESCE(na, 0) AS na, COALESCE(nb, 0) AS nb
        FROM allbins ab
        LEFT JOIN ca ON ca.event_type = ab.event_type AND ca.bin = ab.bin
        LEFT JOIN cb ON cb.event_type = ab.event_type AND cb.bin = ab.bin
    ),
    tot AS (SELECT event_type, SUM(na) AS na_tot, SUM(nb) AS nb_tot
            FROM grid GROUP BY 1),
    terms AS (
        SELECT g.event_type,
               CAST(((na + 0.5) / (na_tot + 10.0) - (nb + 0.5) / (nb_tot + 10.0))
                    * ln(((na + 0.5) / (na_tot + 10.0))
                         / ((nb + 0.5) / (nb_tot + 10.0)))
                    AS DECIMAL(18,8)) AS term,
               na_tot, nb_tot
        FROM grid g JOIN tot USING (event_type)
    )
    SELECT event_type,
           CAST(SUM(term) AS DOUBLE) AS psi,
           CAST(MAX(na_tot) AS BIGINT) AS n_baseline,
           CAST(MAX(nb_tot) AS BIGINT) AS n_current
    FROM terms GROUP BY event_type
    """,
    doc="distribution-drift monitor (quality/drift.py::psi_drift): per-"
        "event-type Population Stability Index of second-half-of-January "
        "values against the first half — fixed-width bins with Laplace "
        "smoothing, per-bin terms rounded to DECIMAL(18,8) before the sum "
        "so the index is accumulation-order independent.  Nothing past "
        "the scan scales with row count (bounded group x bin grid), so "
        "the monitor is a cheap tail stage of any ingest job.",
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.quality.drift import psi_drift

    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    return psi_drift(
        ev.filter(F.col("ts") < cut),
        ev.filter(F.col("ts") >= cut),
        ["event_type"],
        "value",
        bin_width=25.0,
        n_bins=20,
    )


@register(
    "incremental_postings_bm25",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           t -> t <> '') AS toks
        FROM documents
    ),
    dd AS (SELECT doc_id, toks, len(toks) AS dl FROM d),
    stats AS (SELECT COUNT(*) AS n_docs,
                     CAST(SUM(dl) AS DOUBLE)/COUNT(*) AS avgdl FROM dd),
    postings AS (
        SELECT doc_id, dl, term, COUNT(*) AS tf
        FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dd)
        GROUP BY doc_id, dl, term
    ),
    dft AS (SELECT term, COUNT(*) AS dft FROM postings GROUP BY term),
    q(query_id, term) AS (VALUES
        ('p1','merge'),('p1','filter'),('p2','customer'),('p2','order'),
        ('p3','batch'),('p3','stream'),('p3','query')),
    scored AS (
        SELECT q.query_id, p.doc_id,
               SUM(CAST(ln(1 + (s.n_docs - f.dft + 0.5)/(f.dft + 0.5))
                   * (p.tf * 2.2) / (p.tf + 1.2*(0.25 + 0.75*p.dl/s.avgdl))
                   AS DECIMAL(18,8))) AS score_dec
        FROM postings p JOIN q ON p.term = q.term
        JOIN dft f ON f.term = p.term CROSS JOIN stats s
        GROUP BY q.query_id, p.doc_id
    )
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY score_dec DESC, doc_id) AS rank,
           CAST(score_dec AS DOUBLE) AS score
    FROM scored
    QUALIFY rank <= 10
    """,
    doc="incremental inverted-index maintenance (operators/retrieval.py::"
        "build_index/merge_index/bm25_from_index): the index is built from "
        "TWO disjoint ingest batches (even/odd doc ids) and merged by "
        "append — postings and doclens union, no rebuild — then BM25 over "
        "the merged index must rank identically to a one-shot index of the "
        "full corpus (the oracle).  Corpus stats and df_t are aggregates "
        "over the merged index, so they stay correct by construction; at "
        "100 TB a crawl batch appends its posting partitions and the "
        "search side never re-tokenizes history.",
)
def q_incremental_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.retrieval import (
        bm25_from_index,
        build_index,
        merge_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    batch_a = docs.filter(F.col("doc_id") % 2 == 0)
    batch_b = docs.filter(F.col("doc_id") % 2 == 1)
    postings, doclens = merge_index(build_index(batch_a), build_index(batch_b))
    queries = spark.createDataFrame(
        [
            ("p1", "merge"), ("p1", "filter"), ("p2", "customer"), ("p2", "order"),
            ("p3", "batch"), ("p3", "stream"), ("p3", "query"),
        ],
        "query_id string, term string",
    )
    return bm25_from_index(postings, doclens, queries, top_k=10)


@register(
    "streaming_cdc_replication",
    oracle="""
    WITH v1 AS (
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DOUBLE) AS price, o_orderpriority AS prio
        FROM orders WHERE o_orderkey % 3 = 0
    ),
    b AS (
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DOUBLE) + 1000.0 AS price, o_orderpriority AS prio
        FROM orders WHERE o_orderkey % 5 = 0
    ),
    v2 AS (
        SELECT * FROM v1 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b)
        UNION ALL SELECT * FROM b
    )
    SELECT o_orderkey, o_custkey, price FROM v2 WHERE prio <> '1-URGENT'
    """,
    doc="STREAMING CDC replication (streaming/events.py::"
        "foreach_batch_apply_changes + sinks/upsert.py::"
        "apply_changes_parquet — APPLY CHANGES INTO as a streaming "
        "sink): the upstream table's three change-feed commits stream "
        "as REAL micro-batches (file source, maxFilesPerTrigger=1, "
        "AvailableNow) and each batch folds I/U/D rows into a committed "
        "snapshot replica; the final replica must equal the upstream "
        "state recomputed from first principles.  The replica never "
        "scans the upstream table — at 100 TB it follows batch-sized "
        "change files at streaming cadence.",
)
def q_streaming_cdc_replication(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile

    from etl_tiki_webscraping_spark.sinks.upsert import (
        read_change_feed,
        read_parquet_table,
    )
    from etl_tiki_webscraping_spark.streaming.events import (
        foreach_batch_apply_changes,
    )

    replica = _STREAM_CDC_REPLICAS.get(sf_dir)
    if replica is None:
        src = _change_feed_table(spark, sf_dir)
        root = tempfile.mkdtemp(prefix="stream-cdc-")
        in_dir = os.path.join(root, "in")
        os.makedirs(in_dir)
        for v in (1, 2, 3):
            mapped = (
                read_change_feed(spark, src, v, v)
                .filter(F.col("_change_type") != "update_preimage")
                .select(
                    "o_orderkey",
                    "o_custkey",
                    "price",
                    "prio",
                    F.when(F.col("_change_type") == "delete", "D")
                    .otherwise("U")
                    .alias("op"),
                    F.col("_commit_version").alias("seq"),
                )
            )
            tmp = os.path.join(root, f"stage{v}")
            mapped.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            dst = os.path.join(in_dir, f"{v:04d}.parquet")
            shutil.move(part, dst)
            os.utime(dst, (v * 1000, v * 1000))  # strictly increasing mtimes
        replica = os.path.join(root, "replica")
        stream = (
            spark.readStream.schema(
                "o_orderkey bigint, o_custkey bigint, price double, "
                "prio string, op string, seq int"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            foreach_batch_apply_changes(
                stream,
                replica,
                ["o_orderkey"],
                os.path.join(root, "ckpt"),
            )
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            # timed out: stop and FAIL rather than memoize a replica
            # missing later micro-batches (silent wrong answers)
            q.stop()
            raise RuntimeError("streaming CDC replication did not finish in 300s")
        _STREAM_CDC_REPLICAS[sf_dir] = replica
    return read_parquet_table(spark, replica).select("o_orderkey", "o_custkey", "price")


_STREAM_CDC_REPLICAS: dict[str, str] = {}  # sf_dir -> replica path (memoized)


@register(
    "sequence_assembly",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           string_agg(event_type || '@' || CAST(epoch_ms(ts) AS VARCHAR),
                      '|' ORDER BY epoch_ms(ts), event_id) AS seq
    FROM events
    GROUP BY user_id
    """,
    doc="training-sequence assembly: each user's event history collected "
        "into ONE ordered serialized sequence (the example-construction "
        "primitive an LLM-behavioral/RL pipeline runs before tokenization). "
        "Spark: collect_list of (ms, event_id, type) structs, array_sort "
        "for a TOTAL order (ms then event_id — no partition-order "
        "dependence), transform+array_join for the serialization; one "
        "shuffle keyed on the user.  The oracle replays it with DuckDB's "
        "ordered string_agg.  Per-user state is one array — the same "
        "bound a 100 TB run needs (skewed users cap at their own history, "
        "not corpus size).",
)
def q_sequence_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # exact integer epoch-ms (micros div 1000) — a double*1000 detour can
    # flip the truncated ms at representation boundaries
    item = F.struct(
        F.expr("unix_micros(ts) div 1000").alias("ms"),
        F.col("event_id").alias("event_id"),
        F.col("event_type").alias("event_type"),
    )
    assembled = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_sort(F.collect_list(item)).alias("items"),
        )
        .select(
            "user_id",
            "n_events",
            F.array_join(
                F.transform(
                    F.col("items"),
                    lambda e: F.concat(
                        e["event_type"], F.lit("@"), e["ms"].cast("string")
                    ),
                ),
                "|",
            ).alias("seq"),
        )
    )
    return assembled


@register(
    "hybrid_search_rrf",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           t -> t <> '') AS toks
        FROM documents
    ),
    dd AS (SELECT doc_id, toks, len(toks) AS dl FROM d),
    stats AS (SELECT COUNT(*) AS n_docs,
                     CAST(SUM(dl) AS DOUBLE)/COUNT(*) AS avgdl FROM dd),
    postings AS (
        SELECT doc_id, dl, term, COUNT(*) AS tf
        FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dd)
        GROUP BY doc_id, dl, term
    ),
    dft AS (SELECT term, COUNT(*) AS dft FROM postings GROUP BY term),
    q(query_id, term) AS (VALUES
        ('h1','spark'),('h1','join'),('h2','window'),('h2','merge')),
    bm AS (
        SELECT q.query_id, p.doc_id,
               SUM(CAST(ln(1 + (s.n_docs - f.dft + 0.5)/(f.dft + 0.5))
                   * (p.tf * 2.2) / (p.tf + 1.2*(0.25 + 0.75*p.dl/s.avgdl))
                   AS DECIMAL(18,8))) AS score_dec
        FROM postings p JOIN q ON p.term = q.term
        JOIN dft f ON f.term = p.term CROSS JOIN stats s
        GROUP BY q.query_id, p.doc_id
    ),
    bm_rank AS (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score_dec DESC, doc_id) AS r
        FROM bm QUALIFY r <= 50
    ),
    qv AS (
        SELECT CASE vec_id WHEN 0 THEN 'h1' ELSE 'h2' END AS query_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qvec
        FROM embeddings WHERE vec_id IN (0, 100)
    ),
    cos AS (
        SELECT qv.query_id, e.vec_id AS doc_id,
               round(list_dot_product(qv.qvec,
                         list_transform(e.embedding, x -> CAST(x AS DOUBLE)))
                     / (sqrt(list_dot_product(qv.qvec, qv.qvec))
                        * sqrt(list_dot_product(
                              list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                              list_transform(e.embedding, x -> CAST(x AS DOUBLE))))),
                     6) AS cosine
        FROM qv, embeddings e
    ),
    cos_rank AS (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, doc_id) AS r
        FROM cos QUALIFY r <= 50
    ),
    fused AS (
        SELECT COALESCE(b.query_id, c.query_id) AS query_id,
               COALESCE(b.doc_id, c.doc_id) AS doc_id,
               COALESCE(1.0/(60 + b.r), 0) + COALESCE(1.0/(60 + c.r), 0) AS rrf
        FROM bm_rank b FULL OUTER JOIN cos_rank c
          ON b.query_id = c.query_id AND b.doc_id = c.doc_id
    )
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY rrf DESC, doc_id) AS rank,
           rrf AS score
    FROM fused
    QUALIFY rank <= 15
    """,
    doc="hybrid retrieval via Reciprocal Rank Fusion: BM25 keyword ranks "
        "and exact-cosine embedding ranks (both top-50, both totally "
        "ordered on rounded scores + id) fuse as sum of 1/(60+rank) — "
        "the standard lexical+vector ensemble a retrieval/eval-mining "
        "pipeline runs.  Rank-based fusion sidesteps score-scale "
        "mismatch between the two modalities, and every arithmetic step "
        "(integer ranks, two-term IEEE sums) is engine-exact, so the "
        "whole ensemble hash-matches the SQL replay.",
)
def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.retrieval import bm25_topk
    from etl_tiki_webscraping_spark.operators.similarity import as_double_vec, cosine

    docs = load_table(spark, sf_dir, "documents")
    text_queries = spark.createDataFrame(
        [("h1", "spark"), ("h1", "join"), ("h2", "window"), ("h2", "merge")],
        "query_id string, term string",
    )
    bm = bm25_topk(docs, text_queries, top_k=50).select(
        "query_id", "doc_id", F.col("rank").alias("r_bm")
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id").isin(0, 100)).select(
        F.when(F.col("vec_id") == 0, "h1").otherwise("h2").alias("query_id"),
        as_double_vec("embedding").alias("qvec"),
    )
    corpus = emb.select(
        F.col("vec_id").alias("doc_id"), as_double_vec("embedding").alias("cvec")
    )
    scored = corpus.crossJoin(F.broadcast(qv)).select(
        "query_id",
        "doc_id",
        F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cosine"),
    )
    from pyspark.sql import Window as _W

    w_cos = _W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("doc_id").asc()
    )
    cos_rank = (
        scored.withColumn("r_cos", F.row_number().over(w_cos))
        .filter(F.col("r_cos") <= 50)
        .select("query_id", "doc_id", "r_cos")
    )

    fused = bm.join(cos_rank, on=["query_id", "doc_id"], how="full_outer").select(
        "query_id",
        "doc_id",
        (
            F.coalesce(F.lit(1.0) / (F.col("r_bm") + 60), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.col("r_cos") + 60), F.lit(0.0))
        ).alias("rrf"),
    )
    w = _W.partitionBy("query_id").orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 15)
        .select("query_id", "doc_id", "rank", F.col("rrf").alias("score"))
    )


@register(
    "bloom_index_point_lookup",
    oracle="""
    SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS price
    FROM orders WHERE o_orderkey IN (11, 502, 1203)
    """,
    doc="file-level Bloom index point lookup (sinks/upsert.py::"
        "build_bloom_index + read_parquet_table(eq_filter=...)): the "
        "snapshot is compacted CLUSTERED BY o_custkey, so every file's "
        "o_orderkey [min,max] spans the whole key space and min/max "
        "skipping is useless — exactly the case Delta's bloom index "
        "exists for.  The distributed index build folds each file's "
        "keys into a per-file bitmap (map-side bit_or, basename-keyed, "
        "stored inside the snapshot dir); the lookup probes k engine-"
        "exact xxhash64 bits per file and scans only possible files, "
        "with unindexed files kept conservatively so results always "
        "equal the unpruned read.",
)
def q_bloom_index_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from etl_tiki_webscraping_spark.sinks.upsert import (
        build_bloom_index,
        compact_table,
        read_parquet_table,
        upsert_parquet,
    )

    path = _BLOOM_INDEX_TABLES.get(sf_dir)
    if path is None:
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("double").alias("price"),
        )
        path = tempfile.mkdtemp(prefix="bloom-index-") + "/tbl"
        upsert_parquet(spark, orders, path, ["o_orderkey"])
        # cluster by the OTHER key: o_orderkey scatters across every file
        compact_table(spark, path, target_file_bytes=48 * 1024, sort_by=["o_custkey"])
        build_bloom_index(spark, path, ["o_orderkey"])
        _BLOOM_INDEX_TABLES[sf_dir] = path
    return read_parquet_table(spark, path, eq_filter=("o_orderkey", [11, 502, 1203]))


_BLOOM_INDEX_TABLES: dict[str, str] = {}  # sf_dir -> table path (memoized)


# ===========================================================================
# Round 7 (cont.): table maintenance — RESTORE / shallow clone / vacuum
# and snapshot reconciliation diff.
# ===========================================================================

@register(
    "snapshot_restore",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DOUBLE) AS price,
           o_orderpriority AS prio
    FROM orders WHERE o_orderkey % 3 = 0
    """,
    doc="RESTORE TABLE ... TO VERSION AS OF (sinks/upsert.py::"
        "restore_table — Delta RESTORE semantics; the reference's "
        "warehouse has no history to roll back to, dags/etl.py:181-202): "
        "a PARTITIONED table takes a bad overlapping batch (v2), then "
        "restores to v1 as a NEW commit v3 — metadata-only (the v1 "
        "farm's pool references are recreated; zero data bytes rewritten, "
        "so rolling back a 100 TB table costs file-count metadata ops). "
        "The current read must equal first-principles v1, proving the "
        "rollback through the ordinary claim + pointer-swap commit.",
)
def q_snapshot_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.sinks.upsert import (
        read_parquet_table,
        restore_table,
        upsert_parquet,
    )

    path = _RESTORE_TABLES.get(sf_dir)
    if path is None:
        import tempfile

        orders = load_table(spark, sf_dir, "orders")
        base = orders.filter(F.col("o_orderkey") % 3 == 0).select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("double").alias("price"),
            F.col("o_orderpriority").alias("prio"),
        )
        bad = orders.filter(F.col("o_orderkey") % 5 == 0).select(
            "o_orderkey",
            "o_custkey",
            (F.col("o_totalprice").cast("double") + F.lit(1000.0)).alias("price"),
            F.col("o_orderpriority").alias("prio"),
        )
        path = tempfile.mkdtemp(prefix="restore-") + "/tbl"
        upsert_parquet(
            spark, base, path, ["o_orderkey"], partition_by=["prio"], keep_snapshots=5
        )
        upsert_parquet(
            spark, bad, path, ["o_orderkey"], partition_by=["prio"], keep_snapshots=5
        )
        restore_table(spark, path, version=1, keep_snapshots=5)
        _RESTORE_TABLES[sf_dir] = path
    return read_parquet_table(spark, path).select(
        "o_orderkey", "o_custkey", "price", "prio"
    )


_RESTORE_TABLES: dict[str, str] = {}  # sf_dir -> table path (memoized)


@register(
    "snapshot_table_diff",
    oracle="""
    WITH v1 AS (
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DOUBLE) AS price,
               o_orderpriority AS prio
        FROM orders WHERE o_orderkey % 3 = 0
    ),
    b AS (
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DOUBLE) + 1000.0 AS price,
               o_orderpriority AS prio
        FROM orders WHERE o_orderkey % 5 = 0
    ),
    v2 AS (
        SELECT * FROM v1 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b)
        UNION ALL SELECT * FROM b
    ),
    v3 AS (SELECT * FROM v2 WHERE prio <> '1-URGENT')
    SELECT COALESCE(v1.o_orderkey, v3.o_orderkey) AS o_orderkey,
           CASE WHEN v1.o_orderkey IS NULL THEN 'added'
                WHEN v3.o_orderkey IS NULL THEN 'removed'
                WHEN v1.o_custkey IS DISTINCT FROM v3.o_custkey
                  OR v1.price     IS DISTINCT FROM v3.price
                  OR v1.prio      IS DISTINCT FROM v3.prio THEN 'changed'
           END AS change_type
    FROM v1 FULL OUTER JOIN v3 ON v1.o_orderkey = v3.o_orderkey
    WHERE (CASE WHEN v1.o_orderkey IS NULL THEN 'added'
                WHEN v3.o_orderkey IS NULL THEN 'removed'
                WHEN v1.o_custkey IS DISTINCT FROM v3.o_custkey
                  OR v1.price     IS DISTINCT FROM v3.price
                  OR v1.prio      IS DISTINCT FROM v3.prio THEN 'changed'
           END) IS NOT NULL
    """,
    doc="snapshot reconciliation diff (operators/relational.py::"
        "table_diff, hash_compare scale path): time-travel v1 vs the "
        "current v3 of the shared 3-commit CDF table, classifying every "
        "key as added/removed/changed.  Each side collapses its compared "
        "attributes to one position-marked xxhash64 fingerprint IN THE "
        "SCAN STAGE, so the full-outer exchange carries bare (key, 8-byte "
        "hash) rows — a 100-column 100 TB reconciliation shuffles two "
        "long columns.  The oracle recomputes the diff from first "
        "principles with exact IS DISTINCT FROM comparison, so the "
        "fingerprint path is verified against exact semantics.",
)
def q_snapshot_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.relational import table_diff
    from etl_tiki_webscraping_spark.sinks.upsert import read_parquet_table

    path = _change_feed_table(spark, sf_dir)
    v1 = read_parquet_table(spark, path, version=1)
    cur = read_parquet_table(spark, path)
    return table_diff(v1, cur, keys=["o_orderkey"], hash_compare=True)


@register(
    "heavy_hitters_exact",
    oracle="""
    SELECT l_partkey, COUNT(*) AS cnt
    FROM lineitem
    GROUP BY l_partkey
    HAVING COUNT(*) >= 40
    """,
    doc="exact heavy hitters WITHOUT a full-cardinality groupBy "
        "(operators/sketches.py::heavy_hitters — the scale form of the "
        "reference's top-seller aggregates, sql/dwh.sql): pass 1 runs "
        "bounded-memory Misra-Gries per partition (capacity auto-sized "
        "to 2n/threshold, so the MG undercount bound makes false "
        "negatives impossible); only candidate VALUES cross the wire. "
        "Pass 2 exact-counts the broadcast candidate set and applies the "
        "threshold — the approximate-prune + exact-close design of the "
        "bloom semi join, so the result is bit-identical to the full "
        "GROUP BY ... HAVING the oracle runs.",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.sketches import heavy_hitters

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    return heavy_hitters(li, "l_partkey", threshold_count=40)


@register(
    "table_profile",
    oracle="""
    SELECT 'l_quantity' AS col_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(l_quantity) AS n_nulls,
           COUNT(DISTINCT l_quantity) AS n_distinct,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_value,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_value,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(l_quantity) AS mean_value
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(*), COUNT(*) - COUNT(l_extendedprice),
           COUNT(DISTINCT l_extendedprice),
           CAST(MIN(l_extendedprice) AS DOUBLE),
           CAST(MAX(l_extendedprice) AS DOUBLE),
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(l_extendedprice)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*), COUNT(*) - COUNT(l_discount),
           COUNT(DISTINCT l_discount),
           CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE),
           CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(l_discount)
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
           COUNT(DISTINCT l_returnflag),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM lineitem
    """,
    doc="one-pass table profiling (quality/profile.py::profile_table — "
        "the ANALYZE TABLE / data-quality-report primitive): per-column "
        "completeness, exact cardinality, and numeric min/max/mean from "
        "ONE aggregate over ONE scan, unpivoted executor-side into a row "
        "per column.  The mean accumulates in exact decimal before the "
        "double division, so it is accumulation-order independent; "
        "approx_distinct=True is the 100 TB path (HLL++ instead of "
        "per-column distinct Expand).  The oracle recomputes each "
        "column's stats independently.",
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.quality.profile import profile_table

    li = load_table(spark, sf_dir, "lineitem")
    return profile_table(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_returnflag"]
    )


@register(
    "kll_quantile_rollup",
    oracle=r"""
    WITH qs AS (
        SELECT event_type, value, event_id FROM events
        WHERE value IS NOT NULL AND event_id IS NOT NULL
          AND CAST(('0x' || substr(md5('q:' || event_id), 1, 15)) AS BIGINT)
              < 144115188075855872
    ),
    qr AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rnk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM qs
    )
    SELECT event_type,
           MAX(CASE WHEN rnk = GREATEST(CAST(CEIL(0.5 * n) AS BIGINT), 1)
                    THEN value END) AS p50,
           MAX(CASE WHEN rnk = GREATEST(CAST(CEIL(0.95 * n) AS BIGINT), 1)
                    THEN value END) AS p95,
           MAX(CASE WHEN rnk = GREATEST(CAST(CEIL(0.99 * n) AS BIGINT), 1)
                    THEN value END) AS p99
    FROM qr GROUP BY event_type
    """,
    doc="mergeable quantile summaries — PORTABLE deterministic "
        "md5-Bernoulli sample (operators/sketches.py::"
        "quantile_sample_build/merge/quantiles, the round-11 CMS md5 "
        "playbook applied to quantiles, r12 VERDICT ask #3): per-day "
        "(day, event_type) samples retain rows whose 60-bit md5 hash "
        "of the event id falls below 2^57 (rate 1/8), roll up to "
        "per-event-type p50/p95/p99 by plain union — the predicate is "
        "row-intrinsic, so merged per-day samples ARE the global "
        "sample, the mergeability KLL provides with none of its "
        "randomized compaction (which no external engine can replay).  "
        "Upgraded from rows-only: the quantile is the value at rank "
        "max(ceil(p*n), 1) under the total order (value, event_id) — "
        "integer ranks, one correctly rounded double product — so the "
        "DuckDB oracle replays every retained row and every rank "
        "decision bit-exactly.  Rank accuracy vs exact percentiles "
        "stays gated in tests/test_sketches.py; Spark's built-in "
        "DataSketches KLL (kll_sketch_agg_double) remains exercised "
        "there as the cross-check.  Scale shape: the sample predicate "
        "is scan-side (12.5% of rows survive), the window shuffles "
        "only sample rows.",
)
def q_kll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.sketches import (
        quantile_sample_build,
        quantile_sample_merge,
        quantile_sample_quantiles,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = quantile_sample_build(
        ev.withColumn("day", F.to_date("ts")),
        "value",
        "event_id",
        group_cols=["day", "event_type"],
        sample_shift=3,
    )
    # the rollup merges SAMPLES: dropping the day column IS the merge
    # (row-intrinsic predicate), bounded by 2^-shift of the raw volume
    merged = quantile_sample_merge(daily, drop_cols=["day"])
    return quantile_sample_quantiles(
        merged,
        "value",
        "event_id",
        {"p50": 0.5, "p95": 0.95, "p99": 0.99},
        group_cols=["event_type"],
    )


@register(
    "cms_frequency_rollup",
    oracle=r"""
    WITH cells AS (
        SELECT r.d AS depth,
               CAST(('0x' || substr(md5(r.d || ':' || user_id), 1, 15))
                    AS BIGINT) % 2048 AS bucket,
               COUNT(*) AS cnt
        FROM events, unnest(range(0, 5)) AS r(d)
        WHERE user_id IS NOT NULL
        GROUP BY 1, 2
    ),
    probes AS (
        SELECT DISTINCT user_id, r.d AS depth,
               CAST(('0x' || substr(md5(r.d || ':' || user_id), 1, 15))
                    AS BIGINT) % 2048 AS bucket
        FROM events, unnest(range(0, 5)) AS r(d)
        WHERE user_id IS NOT NULL AND user_id < 50
    )
    SELECT p.user_id, CAST(MIN(coalesce(c.cnt, 0)) AS BIGINT) AS est_count
    FROM probes p LEFT JOIN cells c USING (depth, bucket)
    GROUP BY p.user_id
    """,
    doc="DataFrame-native mergeable Count-Min sketch (operators/"
        "sketches.py::cms_build/cms_merge/cms_estimate): per-day "
        "frequency sketches of user activity held as (day, depth, "
        "bucket, cnt) rows — build is one map-side-combined groupBy "
        "bounded by depth x width cells per task, the day->global "
        "rollup is a plain additive groupBy over the bounded grid "
        "(never rescans events), and point estimates probe k seeded "
        "md5-derived buckets taking the min.  Estimates can only "
        "OVER-count (CMS guarantee) — asserted with the eps-bound in "
        "tests/test_sketches.py.  The md5 hash family (round-11 "
        "xxhash64 swap) makes every cell engine-portable, so the "
        "DuckDB oracle replays the FULL sketch — build grid, day→"
        "global additivity (a direct global groupBy equals the merged "
        "day cells), probe min — not just the exact answer; upgraded "
        "from rows-only in r11.",
)
def q_cms_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.sketches import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = cms_build(
        ev.withColumn("day", F.to_date("ts")), "user_id",
        group_cols=["day"], depth=5, width=2048,
    )
    merged = cms_merge(daily, drop_cols=["day"])
    probes = ev.select("user_id").distinct().filter(F.col("user_id") < 50)
    return cms_estimate(merged, probes, "user_id", depth=5, width=2048)


# ===========================================================================
# Round 7 (cont.): ingest quarantine, partition evolution, time-range
# windows, funnel analysis, theta set algebra.
# ===========================================================================

_INGEST_FIXTURES: dict[tuple, str] = {}  # (sf_dir, fmt) -> staged dir


def _ingest_fixture(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    """Stage (once per process) a headerless CSV / JSONL dir derived
    from orders, plus an extra file of deliberately corrupt lines that
    quarantine must absorb without disturbing the good rows."""
    import os
    import tempfile

    key = (sf_dir, fmt)
    path = _INGEST_FIXTURES.get(key)
    if path is None:
        mod = 7 if fmt == "csv" else 11
        rows = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderkey") % mod == 0
        ).select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("double").alias("price"),
            F.col("o_orderpriority").alias("prio"),
        )
        path = tempfile.mkdtemp(prefix=f"ingest-{fmt}-")
        if fmt == "csv":
            rows.write.mode("overwrite").option("header", "false").csv(path)
        else:
            rows.write.mode("overwrite").json(path)
        with open(os.path.join(path, "part-corrupt.txt"), "w") as fh:
            if fmt == "csv":
                fh.write("THIS IS NOT A ROW\n")
                fh.write("garbage,notanint,zz,1-URGENT\n")  # type mismatch
                fh.write("1,2\n")  # short row
            else:
                fh.write("{truncated json\n")
                fh.write('{"o_orderkey": "notanint", "o_custkey": 1}\n')
                fh.write("plain text line\n")
        _INGEST_FIXTURES[key] = path
    return path


_INGEST_SCHEMA = "o_orderkey bigint, o_custkey bigint, price double, prio string"


@register(
    "csv_ingest_quarantine",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DOUBLE) AS price,
           o_orderpriority AS prio
    FROM orders WHERE o_orderkey % 7 = 0
    """,
    doc="CSV ingest with corrupt-record quarantine (sources/files.py::"
        "read_csv_quarantine — the split the reference's pandas ingest "
        "lacks, dags/etl.py:69-113, where one malformed record aborts the "
        "batch): files read as raw text lines, parsed per-line with "
        "codegen'd from_csv in PERMISSIVE mode; short rows, type "
        "mismatches and garbage lines route their RAW bytes to the "
        "quarantine side for replay while every clean line lands typed.  "
        "Expression-layer parsing dodges SPARK-38523's cache requirement "
        "and works unchanged on a streaming text source.  The oracle is "
        "the uncorrupted slice read straight from parquet — the 3 "
        "injected corrupt lines must vanish into quarantine, nothing "
        "else.",
)
def q_csv_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.sources.files import read_csv_quarantine

    good, _bad = read_csv_quarantine(
        spark, _ingest_fixture(spark, sf_dir, "csv"), _INGEST_SCHEMA
    )
    return good


@register(
    "jsonl_ingest_quarantine",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DOUBLE) AS price,
           o_orderpriority AS prio
    FROM orders WHERE o_orderkey % 11 = 0
    """,
    doc="JSON-lines ingest with corrupt-record quarantine (sources/"
        "files.py::read_jsonl_quarantine): per-line from_json carrying a "
        "corrupt-record column; truncated JSON, type mismatches, and "
        "non-JSON lines quarantine as raw bytes (from_json's null-struct "
        "case is folded into the same predicate).  Closest to the "
        "reference's actual input (scraped JSON records, "
        "dags/etl.py:69-113), re-expressed as a fault-isolating scan.",
)
def q_jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.sources.files import read_jsonl_quarantine

    good, _bad = read_jsonl_quarantine(
        spark, _ingest_fixture(spark, sf_dir, "json"), _INGEST_SCHEMA
    )
    return good


_EVOLVED_TABLES: dict[str, str] = {}  # sf_dir -> table path (memoized)


@register(
    "partition_evolution",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DOUBLE) AS price,
           o_orderpriority AS prio
    FROM orders WHERE o_orderkey % 3 = 0
    """,
    doc="partition evolution (sinks/upsert.py::repartition_table — "
        "ALTER TABLE ... PARTITIONED BY): an unpartitioned table is "
        "rewritten under a prio-partitioned layout as ONE ordinary "
        "claim+pointer commit; content must be byte-identical (the "
        "oracle), the old layout stays time-travelable, and subsequent "
        "upserts prune on the new partition columns (unit-tested).  The "
        "rewrite is O(table) by necessity — the payoff is every later "
        "1 GB batch touching only its partitions instead of 100 TB.",
)
def q_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.sinks.upsert import (
        read_parquet_table,
        repartition_table,
        upsert_parquet,
    )

    path = _EVOLVED_TABLES.get(sf_dir)
    if path is None:
        import tempfile

        base = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderkey") % 3 == 0
        ).select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("double").alias("price"),
            F.col("o_orderpriority").alias("prio"),
        )
        path = tempfile.mkdtemp(prefix="evolve-") + "/tbl"
        upsert_parquet(spark, base, path, ["o_orderkey"], keep_snapshots=5)
        repartition_table(spark, path, partition_by=["prio"], keep_snapshots=5)
        _EVOLVED_TABLES[sf_dir] = path
    return read_parquet_table(spark, path).select(
        "o_orderkey", "o_custkey", "price", "prio"
    )


@register(
    "range_frame_moving_avg",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6)))
                    OVER w AS DOUBLE) / COUNT(value) OVER w AS avg_7d
    FROM events
    WINDOW w AS (
        -- floor to WHOLE seconds: Spark's cast(ts AS LONG) truncates
        -- sub-second precision, while DuckDB's epoch() is fractional —
        -- without the floor, rows within a fraction of a second of the
        -- 6-day boundary flip frame membership between engines
        PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW
    )
    """,
    doc="time-RANGE window frame (Window.orderBy(epoch).rangeBetween): "
        "per-user trailing 7-day moving average of event values — the "
        "frame is bounded by TIME, not row count, so sparse and dense "
        "users get the same semantics.  One user-keyed shuffle; the "
        "frame scan is linear per partition.  Sums accumulate in exact "
        "decimal before the double division, so the average is "
        "evaluation-order independent and the DuckDB window replay "
        "hash-matches exactly.",
)
def q_range_frame_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value",
        F.col("ts").cast("long").alias("epoch_s"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-6 * 86400, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        (
            F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
            / F.count("value").over(w)
        ).alias("avg_7d"),
    )


@register(
    "event_funnel_stages",
    oracle="""
    WITH v AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS tv
        FROM events GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, v.tv,
               MIN(CASE WHEN e.event_type = 'click' AND e.ts >= v.tv
                        THEN e.ts END) AS tc
        FROM events e JOIN v USING (user_id)
        GROUP BY e.user_id, v.tv
    ),
    p AS (
        SELECT e.user_id, c.tv, c.tc,
               MIN(CASE WHEN e.event_type = 'purchase' AND e.ts >= c.tc
                        THEN e.ts END) AS tp
        FROM events e JOIN c USING (user_id)
        GROUP BY e.user_id, c.tv, c.tc
    )
    SELECT CASE WHEN tp IS NOT NULL THEN 'purchase'
                WHEN tc IS NOT NULL THEN 'click'
                WHEN tv IS NOT NULL THEN 'view'
                ELSE 'none' END AS stage,
           COUNT(*) AS n_users
    FROM p GROUP BY 1
    """,
    doc="ordered funnel analysis (view -> click-after-view -> "
        "purchase-after-click): the furthest stage each user reached "
        "respecting event ORDER, then stage population counts — the "
        "conversion query every event warehouse runs, and a shape plain "
        "aggregation can't express (each stage's threshold depends on "
        "the previous stage's timestamp).  Spark: three chained MIN "
        "windows over the SAME user partitioning — Catalyst reuses one "
        "exchange for all three Window operators (single user-keyed "
        "shuffle), then a bounded groupBy on the stage label.",
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    staged = (
        ev.withColumn(
            "tv", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "tc",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") >= F.col("tv")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "tp",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("tc")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.select("user_id", "tv", "tc", "tp").distinct()
    stage = (
        F.when(F.col("tp").isNotNull(), "purchase")
        .when(F.col("tc").isNotNull(), "click")
        .when(F.col("tv").isNotNull(), "view")
        .otherwise("none")
    )
    return per_user.select(stage.alias("stage")).groupBy("stage").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@register(
    "theta_sketch_set_ops",
    oracle=r"""
    WITH th_h AS (
        SELECT event_type,
               CAST(('0x' || substr(md5('t:' || user_id), 1, 15)) AS BIGINT)
                   AS hv
        FROM (SELECT DISTINCT event_type, user_id FROM events
              WHERE user_id IS NOT NULL)
        WHERE event_type IN ('view', 'purchase')
    ),
    th_rk AS (
        SELECT event_type, hv,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rnk
        FROM (SELECT DISTINCT event_type, hv FROM th_h)
    ),
    sk AS (SELECT event_type, hv FROM th_rk WHERE rnk <= 65),
    th AS (
        SELECT event_type,
               CASE WHEN COUNT(*) = 65 THEN MAX(hv)
                    ELSE 1152921504606846976 END AS theta
        FROM sk GROUP BY event_type
    ),
    thetas AS (
        SELECT a.theta AS theta_a, b.theta AS theta_b,
               LEAST(a.theta, b.theta) AS theta_u
        FROM (SELECT theta FROM th WHERE event_type = 'view') a,
             (SELECT theta FROM th WHERE event_type = 'purchase') b
    ),
    marked AS (
        SELECT hv,
               MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS in_a,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_b
        FROM sk GROUP BY hv
    ),
    counts AS (
        SELECT t.theta_a, t.theta_b, t.theta_u,
               SUM(CASE WHEN in_a = 1 AND hv < theta_a THEN 1 ELSE 0 END) AS ca,
               SUM(CASE WHEN in_b = 1 AND hv < theta_b THEN 1 ELSE 0 END) AS cb,
               SUM(CASE WHEN hv < theta_u THEN 1 ELSE 0 END) AS cu,
               SUM(CASE WHEN in_a = 1 AND in_b = 1 AND hv < theta_u
                        THEN 1 ELSE 0 END) AS ci,
               SUM(CASE WHEN in_a = 1 AND in_b = 0 AND hv < theta_u
                        THEN 1 ELSE 0 END) AS cd
        FROM marked, thetas t
        GROUP BY 1, 2, 3
    )
    SELECT (CAST(ca AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE))
               / CAST(theta_a AS DOUBLE) AS n_view,
           (CAST(cb AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE))
               / CAST(theta_b AS DOUBLE) AS n_buy,
           (CAST(cu AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE))
               / CAST(theta_u AS DOUBLE) AS n_union,
           (CAST(ci AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE))
               / CAST(theta_u AS DOUBLE) AS n_intersect,
           (CAST(cd AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE))
               / CAST(theta_u AS DOUBLE) AS n_view_only
    FROM counts
    """,
    doc="distinct-set ALGEBRA via PORTABLE KMV/theta sketches "
        "(operators/sketches.py::theta_sketch/theta_set_estimates, the "
        "round-11 CMS md5 playbook applied to set algebra, r12 VERDICT "
        "ask #3): per-event-type sketches keep the k+1 = 65 smallest "
        "distinct 60-bit md5 user hashes; |view ∪ purchase|, "
        "|view ∩ purchase| and |view \\ purchase| evaluate at theta_u "
        "= min of the two theta boundaries, where every sketch retains "
        "ALL hashes below its own theta so membership below theta_u is "
        "exact — set operations HLL cannot express.  Upgraded from "
        "rows-only: each estimate is cnt * 2^60 / theta as two "
        "correctly rounded IEEE ops on exactly representable operands, "
        "so the DuckDB oracle replays every retained hash, both theta "
        "decisions, and the arithmetic bit-exactly.  The build plans "
        "as TakeOrderedAndProject (per-partition top-k then a k-sized "
        "merge — no global sort at any scale); accuracy vs exact "
        "distinct counts stays gated in tests/test_sketches.py, where "
        "Spark's built-in DataSketches theta family remains exercised "
        "as the cross-check.",
)
def q_theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.sketches import (
        theta_set_estimates,
        theta_sketch,
    )

    ev = load_table(spark, sf_dir, "events")
    view = theta_sketch(
        ev.filter(F.col("event_type") == "view"), "user_id", k=64
    )
    buy = theta_sketch(
        ev.filter(F.col("event_type") == "purchase"), "user_id", k=64
    )
    return theta_set_estimates(
        view,
        buy,
        k=64,
        names=("n_view", "n_buy", "n_union", "n_intersect", "n_view_only"),
    )


@register(
    "scd2_dim_from_feed",
    oracle="""
    WITH v1 AS (
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DOUBLE) AS price,
               o_orderpriority AS prio
        FROM orders WHERE o_orderkey % 3 = 0
    ),
    b AS (
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DOUBLE) + 1000.0 AS price,
               o_orderpriority AS prio
        FROM orders WHERE o_orderkey % 5 = 0
    )
    -- v1 rows superseded by the v2 batch (attrs always change: +1000)
    SELECT v1.o_orderkey, v1.o_custkey, v1.price, v1.prio,
           1 AS valid_from, 2 AS valid_to, FALSE AS is_current
    FROM v1 WHERE o_orderkey IN (SELECT o_orderkey FROM b)
    UNION ALL
    -- v1-only rows soft-deleted by the v3 urgent purge
    SELECT o_orderkey, o_custkey, price, prio, 1, 3, FALSE
    FROM v1 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b)
      AND prio = '1-URGENT'
    UNION ALL
    -- v1-only rows still current
    SELECT o_orderkey, o_custkey, price, prio, 1, NULL, TRUE
    FROM v1 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b)
      AND prio <> '1-URGENT'
    UNION ALL
    -- v2 batch rows soft-deleted at v3
    SELECT o_orderkey, o_custkey, price, prio, 2, 3, FALSE
    FROM b WHERE prio = '1-URGENT'
    UNION ALL
    -- v2 batch rows still current
    SELECT o_orderkey, o_custkey, price, prio, 2, NULL, TRUE
    FROM b WHERE prio <> '1-URGENT'
    """,
    doc="Type-2 dimension built PURELY from the change feed (sinks/"
        "upsert.py::scd2_from_change_feed — the history-tracking CDF "
        "consumer; apply_changes is its SCD1 sibling): the shared "
        "3-commit table's feed folds commit-by-commit — inserts/"
        "postimages open versions via the single-shuffle scd2_apply "
        "merge, deletes close the key's current row without a successor "
        "(soft delete), valid_from/valid_to carry commit versions.  The "
        "base table is never rescanned: dimension history accrues from "
        "batch-sized change files, which is how a 100 TB fact's "
        "dimension stays maintainable.  The oracle derives every "
        "expected (valid_from, valid_to, is_current) row from first "
        "principles.",
)
def q_scd2_from_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.sinks.upsert import scd2_from_change_feed

    path = _change_feed_table(spark, sf_dir)
    return scd2_from_change_feed(spark, path, keys=["o_orderkey"]).select(
        "o_orderkey", "o_custkey", "price", "prio",
        "valid_from", "valid_to", "is_current",
    )


@register(
    "scd2_backfill_from_feed",
    oracle=QUERIES["scd2_dim_from_feed"].oracle,
    doc="ONE-SHOT Type-2 dimension backfill from the same change feed "
        "(sinks/upsert.py::scd2_backfill_from_feed, VERDICT r7 ask #2): "
        "instead of the fold's O(commits) sequential scd2_apply jobs, "
        "two key-partitioned windows build the whole history in one "
        "pass — lag(kind/attrs) suppresses no-op upserts and dead "
        "deletes, lead(version) closes each open row at the key's next "
        "kept event.  Shares scd2_dim_from_feed's first-principles "
        "oracle, so the driver hash-proves fold/backfill parity.",
)
def q_scd2_backfill_from_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.sinks.upsert import scd2_backfill_from_feed

    path = _change_feed_table(spark, sf_dir)
    return scd2_backfill_from_feed(spark, path, keys=["o_orderkey"]).select(
        "o_orderkey", "o_custkey", "price", "prio",
        "valid_from", "valid_to", "is_current",
    )


@register(
    "ivm_join_from_feed",
    oracle="""
    WITH o1 AS (
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DOUBLE) AS price,
               o_orderpriority AS prio
        FROM orders WHERE o_orderkey % 3 = 0
    ),
    ob AS (
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DOUBLE) + 1000.0 AS price,
               o_orderpriority AS prio
        FROM orders WHERE o_orderkey % 5 = 0
    ),
    o_final AS (
        SELECT * FROM (
            SELECT * FROM o1 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM ob)
            UNION ALL SELECT * FROM ob
        ) WHERE prio <> '1-URGENT'
    ),
    c1 AS (
        SELECT c_custkey, c_name,
               CAST(c_acctbal AS DOUBLE) AS acctbal,
               c_mktsegment AS seg
        FROM customer WHERE c_custkey % 2 = 0
    ),
    cb AS (
        SELECT c_custkey, c_name,
               CAST(c_acctbal AS DOUBLE) + 500.0 AS acctbal,
               c_mktsegment AS seg
        FROM customer WHERE c_custkey % 7 = 0
    ),
    c_final AS (
        SELECT * FROM (
            SELECT * FROM c1 WHERE c_custkey NOT IN (SELECT c_custkey FROM cb)
            UNION ALL SELECT * FROM cb
        ) WHERE seg <> 'BUILDING'
    )
    SELECT o.o_orderkey, o.o_custkey, o.price, o.prio,
           c.c_name, c.acctbal, c.seg
    FROM o_final o JOIN c_final c ON o.o_custkey = c.c_custkey
    """,
    doc="incremental maintenance of a materialized JOIN view "
        "(operators/rollup.py::join_view_refresh — the join sibling of "
        "ivm_rollup_from_feed's additive-aggregate IVM): the stored "
        "orders-x-customer view at v1 is refreshed to the final state "
        "using only the two tables' change feeds — affected-key "
        "recompute: delta-sized touched-key set broadcast into one "
        "anti leg (keep untouched view rows) and two semi legs "
        "(recompute only touched keys' join groups).  Work is bounded "
        "by |delta| x join fan-out, never table size; the oracle "
        "recomputes the FULL final-state join in DuckDB from first "
        "principles, hash-proving incremental == recompute across "
        "upserts, updates, and deletes on both sides.",
)
def q_ivm_join_from_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.rollup import (
        feed_touched_keys,
        join_view_refresh,
    )
    from etl_tiki_webscraping_spark.sinks.upsert import (
        read_change_feed,
        read_parquet_table,
    )

    path_o = _change_feed_table(spark, sf_dir)
    path_c = _customer_feed_table(spark, sf_dir)
    out_cols = [
        "o_orderkey", "o_custkey", "price", "prio", "c_name", "acctbal", "seg"
    ]
    view1 = (
        read_parquet_table(spark, path_o, version=1)
        .join(
            read_parquet_table(spark, path_c, version=1),
            on=F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(*out_cols)
    )
    touched = feed_touched_keys(
        read_change_feed(spark, path_o, from_version=2), "o_custkey", "o_custkey"
    ).unionByName(
        feed_touched_keys(
            read_change_feed(spark, path_c, from_version=2), "c_custkey", "o_custkey"
        )
    )
    return join_view_refresh(
        view1,
        read_parquet_table(spark, path_o),
        read_parquet_table(spark, path_c),
        "o_custkey",
        "c_custkey",
        touched,
    )


@register(
    "multi_exists_anti",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE l1.l_returnflag = 'R'
      AND o.o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    """,
    doc="combined correlated EXISTS + NOT EXISTS (TPC-H Q21 shape, "
        "adapted to the fixture's columns: the sole supplier with a "
        "returned item on a finished multi-supplier order) as SQL TEXT: "
        "Catalyst must rewrite the positive subquery to a left-semi and "
        "the negated one to a left-anti join over the SAME correlated "
        "table — the hardest decorrelation shape in the TPC-H suite and "
        "a SQL form the DataFrame API cannot express more directly.",
)
def q_multi_exists_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.io import register_views

    register_views(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(
        """
        SELECT s.s_name, COUNT(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE l1.l_returnflag = 'R'
          AND o.o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s.s_name
        """
    )


@register(
    "window_rank_functions",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ntile(4)       OVER w AS price_quartile,
           dense_rank()   OVER w AS drank,
           percent_rank() OVER w AS prank,
           cume_dist()    OVER w AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
    doc="ranking-function window breadth (ntile / dense_rank / "
        "percent_rank / cume_dist) over a deterministic total order "
        "(price with key tie-break): quartile binning and distribution "
        "position per priority group in ONE window pass over one "
        "group-keyed shuffle.  percent_rank and cume_dist are exact "
        "integer-ratio doubles, so the DuckDB replay hash-matches "
        "bit-for-bit.",
)
def q_window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("price_quartile"),
        F.dense_rank().over(w).alias("drank"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
    )


_STREAM_QUARANTINE: dict[str, str] = {}  # sf_dir -> output root (memoized)


@register(
    "streaming_quarantine_ingest",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DOUBLE) AS price,
           o_orderpriority AS prio
    FROM orders WHERE o_orderkey % 7 = 0
    """,
    doc="STREAMING twin of the quarantine ingest (sources/files.py::"
        "parse_lines_quarantine over readStream.text + foreachBatch): a "
        "REAL multi-micro-batch run (maxFilesPerTrigger=1, AvailableNow) "
        "over the same CSV-plus-corrupt-lines dir; each micro-batch "
        "splits typed rows from raw quarantine bytes and appends both "
        "sinks.  The committed good table must equal the clean slice "
        "(the oracle) and the quarantine exactly the 3 injected corrupt "
        "lines (unit-tested) — fault-isolating ingest with identical "
        "semantics in batch and streaming, which is the point of "
        "parsing at the expression layer.",
)
def q_streaming_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.sources.files import parse_lines_quarantine

    out = _STREAM_QUARANTINE.get(sf_dir)
    if out is None:
        import tempfile

        src = _ingest_fixture(spark, sf_dir, "csv")
        root = tempfile.mkdtemp(prefix="stream-quarantine-")
        good_dir, bad_dir = root + "/good", root + "/bad"

        def sink(batch_df, _batch_id: int) -> None:
            good, bad = parse_lines_quarantine(batch_df, _INGEST_SCHEMA)
            good.write.mode("append").parquet(good_dir)
            bad.write.mode("append").parquet(bad_dir)

        q = (
            spark.readStream.option("maxFilesPerTrigger", 1)
            .text(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", root + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming quarantine ingest did not finish")
        out = root
        _STREAM_QUARANTINE[sf_dir] = out
    return (
        spark.read.schema(_INGEST_SCHEMA).parquet(out + "/good")
        .select("o_orderkey", "o_custkey", "price", "prio")
    )


_STREAM_SCREEN: dict[str, str] = {}  # sf_dir -> survivors dir (memoized)


def _register_streaming_corpus_screen() -> None:
    from etl_tiki_webscraping_spark.functions.encoding import mojibake_hits_sql

    bl_vals = ", ".join("('" + t + "')" for t in _BLOCKLIST_TERMS)

    @register(
        "streaming_corpus_screen",
        oracle=f"""
        WITH damaged AS (
            SELECT doc_id, lang, n_chars,
                   COALESCE(text, '') ||
                   CASE WHEN doc_id % 7 = 0 THEN '{_MOJIBAKE_TAIL_HEAVY}'
                        WHEN doc_id % 7 = 3 THEN '{_MOJIBAKE_TAIL_LIGHT}'
                        ELSE '' END AS raw
            FROM documents
        ),
        screened AS (
            SELECT doc_id, lang, n_chars, lower(raw) AS lraw FROM damaged
            WHERE {mojibake_hits_sql('raw')} = 0
        ),
        bt(term) AS (VALUES {bl_vals}),
        pos AS (
            SELECT s.doc_id
            FROM screened s, bt,
                 unnest(range(0, greatest(length(s.lraw) - length(bt.term)
                                          + 1, 0))) AS g(p)
            WHERE substr(s.lraw, CAST(p + 1 AS INT),
                         CAST(length(bt.term) AS INT)) = bt.term
        ),
        offenders AS (
            SELECT doc_id FROM pos GROUP BY doc_id HAVING COUNT(*) > 1
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM screened s
        LEFT JOIN offenders o ON o.doc_id = s.doc_id
        WHERE o.doc_id IS NULL
        GROUP BY lang
        """,
        doc="STREAMING twin of the corpus quality screen: a REAL "
            "multi-micro-batch run (maxFilesPerTrigger=1, AvailableNow "
            "over a 3-file staged copy of documents); each micro-batch "
            "injects the deterministic mojibake slice, drops any "
            "marker hit, runs the Aho-Corasick blocklist (>1 hits "
            "drops — the screen is per-document, so batch boundaries "
            "cannot change the answer, which is exactly why it "
            "streams safely stateless), and appends survivors.  The "
            "committed sink aggregate must equal the batch replay "
            "(the oracle) — identical semantics in batch and "
            "streaming, the quarantine-ingest contract applied to "
            "corpus curation.",
    )
    def q_streaming_corpus_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
        from etl_tiki_webscraping_spark.functions.encoding import mojibake_hits
        from etl_tiki_webscraping_spark.operators.dicttag import blocklist_filter

        out = _STREAM_SCREEN.get(sf_dir)
        if out is None:
            import tempfile

            root = tempfile.mkdtemp(prefix="stream-screen-")
            src, sink_dir = root + "/src", root + "/survivors"
            docs = load_table(spark, sf_dir, "documents").select(
                "doc_id", "text", "lang", "n_chars"
            )
            docs.repartition(3).write.parquet(src)

            def screen(batch_df, _batch_id: int) -> None:
                raw = F.concat(
                    F.coalesce(F.col("text"), F.lit("")),
                    F.when(F.col("doc_id") % 7 == 0, F.lit(_MOJIBAKE_TAIL_HEAVY))
                    .when(F.col("doc_id") % 7 == 3, F.lit(_MOJIBAKE_TAIL_LIGHT))
                    .otherwise(F.lit("")),
                )
                screened = batch_df.withColumn("raw", raw).filter(
                    mojibake_hits(F.col("raw")) == 0
                )
                kept = blocklist_filter(
                    screened, _BLOCKLIST_TERMS, text_col="raw",
                    id_col="doc_id", max_hits=1,
                )
                kept.select("doc_id", "lang", "n_chars").write.mode(
                    "append"
                ).parquet(sink_dir)

            q = (
                spark.readStream.schema(docs.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
                .writeStream.foreachBatch(screen)
                .option("checkpointLocation", root + "/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError("streaming corpus screen did not finish")
            out = sink_dir
            _STREAM_SCREEN[sf_dir] = out
        return (
            spark.read.parquet(out)
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("total_chars"),
            )
        )


_register_streaming_corpus_screen()


@register(
    "snapshot_files_metadata",
    oracle="""
    SELECT o_orderpriority AS prio, COUNT(*) AS n_rows
    FROM orders WHERE o_orderkey % 3 = 0
    GROUP BY o_orderpriority
    """,
    doc="files metadata table (sinks/upsert.py::table_files — Iceberg "
        ".files / DESCRIBE DETAIL analog): one row per data file of the "
        "current snapshot with footer-exact row count, byte size, and "
        "decoded partition values, from PURE metadata I/O (footers + "
        "stat calls, never data pages).  The query aggregates the "
        "metadata to per-partition row counts on the restored fixture "
        "table; the oracle RECOUNTS the same partitions from raw data — "
        "a metadata-vs-data consistency audit, the substrate compaction "
        "planning and cost estimation read.",
)
def q_snapshot_files_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.sinks.upsert import table_files

    # reuse the restore fixture: partitioned by prio, current == v1 (%3)
    path = _RESTORE_TABLES.get(sf_dir)
    if path is None:
        QUERIES["snapshot_restore"].fn(spark, sf_dir)  # stages + memoizes
        path = _RESTORE_TABLES[sf_dir]
    return (
        table_files(spark, path, partition_cols=["prio"])
        .groupBy("prio")
        .agg(F.sum("n_rows").alias("n_rows"))
    )


@register(
    "not_in_null_aware",
    oracle="""
    SELECT o_orderkey, 'clean' AS branch
    FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'FURNITURE')
    UNION ALL
    SELECT o_orderkey, 'null_poisoned'
    FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'FURNITURE'
                            UNION ALL SELECT CAST(NULL AS BIGINT))
    """,
    doc="NOT IN null semantics (null-aware anti join): the clean branch "
        "is an ordinary anti join; the poisoned branch's subquery "
        "contains a NULL, so three-valued logic makes every NOT IN "
        "predicate UNKNOWN and the branch MUST return zero rows — the "
        "classic correctness trap a naive anti-join rewrite gets wrong "
        "(it would return the clean branch's rows).  Spark plans the "
        "poisoned branch as a null-aware anti join; the oracle replays "
        "identical ANSI semantics on DuckDB.",
)
def q_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.io import register_views

    register_views(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        SELECT o_orderkey, 'clean' AS branch
        FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                                WHERE c_mktsegment = 'FURNITURE')
        UNION ALL
        SELECT o_orderkey, 'null_poisoned'
        FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                                WHERE c_mktsegment = 'FURNITURE'
                                UNION ALL SELECT CAST(NULL AS BIGINT))
        """
    )


@register(
    "lateral_subquery_topn",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.price
    FROM customer c, LATERAL (
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
        FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) t
    WHERE c.c_mktsegment = 'BUILDING'
    """,
    doc="correlated LATERAL subquery with per-row ORDER BY ... LIMIT "
        "(top-2 orders per customer) as SQL TEXT: the lateral form a "
        "warehouse user writes instead of the window-function rewrite "
        "(window_topk_per_group is the DataFrame twin).  Catalyst's "
        "lateral-join decorrelation must turn the per-customer LIMIT "
        "into a rank-per-partition plan, not a nested re-execution.",
)
def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.io import register_views

    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.price
        FROM customer c, LATERAL (
            SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
            FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) t
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


@register(
    "doc_unigram_logprob",
    oracle="""
    WITH toks AS (
        SELECT doc_id, term
        FROM (SELECT doc_id,
                     unnest(list_filter(
                         regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '')) AS term
              FROM documents)
    ),
    vocab AS (
        SELECT term, COUNT(*) AS cnt,
               SUM(COUNT(*)) OVER () AS total
        FROM toks GROUP BY term
    ),
    scored AS (
        SELECT t.doc_id,
               CAST(ln(CAST(v.cnt AS DOUBLE) / v.total)
                    AS DECIMAL(18,8)) AS lp
        FROM toks t JOIN vocab v USING (term)
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS avg_logprob
    FROM scored GROUP BY doc_id
    """,
    doc="unigram language-model scoring (the corpus-statistics quality "
        "filter real pretraining pipelines run — low mean token "
        "log-probability flags gibberish/boilerplate, complementing the "
        "heuristic quality_score): one explode+groupBy builds the "
        "corpus unigram table, a token-keyed equi join scores every "
        "token, per-token ln(p) rounds to DECIMAL(18,8) before the "
        "per-doc sum (order-independent, so the DuckDB replay "
        "hash-matches despite float log).  Exchanges carry bare "
        "(doc_id, term) pairs, never document text.",
)
def q_doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower("text"), "[^a-z0-9]+"), lambda t: t != F.lit("")
            )
        ).alias("term"),
    )
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    # corpus total as a broadcast SCALAR (quality_decile idiom) — a
    # SUM() OVER () global window would funnel the whole vocab through
    # one partition; ReuseExchange shares the groupBy shuffle between
    # the two subtrees, so the extra aggregate is one bounded reduce
    total = counts.agg(F.sum("cnt").alias("total"))
    vocab = counts.crossJoin(F.broadcast(total))
    scored = toks.join(vocab, "term").select(
        "doc_id",
        F.log(F.col("cnt").cast("double") / F.col("total"))
        .cast("decimal(18,8)")
        .alias("lp"),
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (F.sum("lp").cast("double") / F.count(F.lit(1))).alias("avg_logprob"),
    )


@register(
    "doc_chunking",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           t -> t <> '') AS toks
        FROM documents
    ),
    dd AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
    chunks AS (
        SELECT doc_id, n,
               unnest(range(0, n, 24)) AS start
        FROM dd
    )
    SELECT c.doc_id,
           CAST(c.start / 24 AS BIGINT) AS chunk_id,
           CAST(LEAST(32, c.n - c.start) AS BIGINT) AS chunk_len,
           array_to_string(list_slice(dd.toks, c.start + 1,
                                      LEAST(c.start + 32, c.n)), ' ')
               AS chunk_text
    FROM chunks c JOIN dd USING (doc_id, n)
    """,
    doc="sliding-window document chunking for training/RAG (chunk_size "
        "32 tokens, stride 24 -> 8-token overlap): tokenize once, "
        "generate chunk starts with sequence(), explode, and slice the "
        "token array per chunk — all codegen'd array functions, one "
        "narrow explode, no shuffle at all until a downstream consumer "
        "groups (the plan is scan -> generate -> project).  Every token "
        "of every document lands in at least one chunk; boundaries are "
        "deterministic so the DuckDB replay is exact.",
)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    CHUNK, STRIDE = 32, 24
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), "[^a-z0-9]+"), lambda t: t != F.lit("")
        ).alias("toks"),
    ).withColumn("n", F.size("toks")).filter(F.col("n") > 0)
    chunks = toked.select(
        "doc_id",
        "n",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(STRIDE))
        ).alias("start"),
    )
    return chunks.select(
        "doc_id",
        (F.col("start") / STRIDE).cast("bigint").alias("chunk_id"),
        F.least(F.lit(CHUNK), F.col("n") - F.col("start"))
        .cast("bigint")
        .alias("chunk_len"),
        F.array_join(
            F.slice(F.col("toks"), F.col("start") + 1, F.lit(CHUNK)), " "
        ).alias("chunk_text"),
    )


@register(
    "recursive_cte_calendar",
    oracle="""
    WITH RECURSIVE cal(day) AS (
        SELECT DATE '2024-01-01'
        UNION ALL
        SELECT day + 1 FROM cal WHERE day < DATE '2024-01-30'
    ),
    daily AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
        FROM events
        WHERE event_type = 'purchase' AND user_id % 29 = 7
        GROUP BY 1
    )
    SELECT cal.day, CAST(COALESCE(daily.n, 0) AS BIGINT) AS n_events
    FROM cal LEFT JOIN daily ON daily.day = cal.day
    """,
    doc="recursive CTE date spine (WITH RECURSIVE, new SQL surface in "
        "Spark 4): generate the January 2024 calendar by recursion and "
        "LEFT JOIN sparse per-day purchase counts so EMPTY days appear "
        "as explicit zeros — the gap-filling query reporting needs that "
        "a plain GROUP BY cannot produce (it has no row to group for a "
        "silent day).  Spark's recursion is UNION ALL with a monotone "
        "termination predicate (UNION-distinct recursion is not yet "
        "supported, so cyclic closures stay with the union-find "
        "operator); the oracle replays the identical spine in DuckDB.",
)
def q_recursive_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.io import register_views

    register_views(spark, sf_dir, "events")
    return spark.sql(
        """
        WITH RECURSIVE cal(day) AS (
            SELECT DATE '2024-01-01'
            UNION ALL
            SELECT date_add(day, 1) FROM cal WHERE day < DATE '2024-01-30'
        ),
        daily AS (
            SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
            FROM events
            WHERE event_type = 'purchase' AND user_id % 29 = 7
            GROUP BY 1
        )
        SELECT cal.day, COALESCE(daily.n, CAST(0 AS BIGINT)) AS n_events
        FROM cal LEFT JOIN daily ON daily.day = cal.day
        """
    )


@register(
    "grouped_topk_bounded",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS price
    FROM (
        SELECT o_orderpriority, o_orderkey,
               o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey)
                   AS rk
        FROM orders
    )
    WHERE rk <= 3
    """,
    doc="EXACT top-k per group with a BOUNDED exchange (operators/"
        "relational.py::grouped_topk — the scale form of "
        "window_topk_per_group): each partition reduces to its local "
        "top-k per group in an Arrow kernel (state bounded by groups x "
        "k), so the group-keyed shuffle carries <= partitions x groups "
        "x k rows instead of the whole table — the global top-k of a "
        "union is contained in the union of local top-ks, so the final "
        "rank over the shrunken set is exact.  A 100 TB 'top sellers "
        "per category' never sorts the full table through a shuffle.  "
        "Deterministic via the key tie-break; oracle = plain window "
        "ROW_NUMBER.",
)
def q_grouped_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.relational import grouped_topk

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("price"),
    )
    return grouped_topk(
        orders, ["o_orderpriority"], "price", k=3, tiebreak="o_orderkey"
    )


_SKETCH_TABLES: dict[str, str] = {}  # sf_dir -> sketch table path (memoized)


def _sketch_maintenance_oracle() -> str:
    from etl_tiki_webscraping_spark.operators.sketches import hll_oracle_sql

    return "WITH " + hll_oracle_sql(
        "SELECT CAST(ts AS DATE) AS day, user_id FROM events",
        "user_id",
        ["day"],
        lg_k=8,
        out_col="approx_users",
    )


@register(
    "streaming_sketch_maintenance",
    oracle=_sketch_maintenance_oracle(),
    doc="STREAMING mergeable-sketch table maintenance on the PORTABLE "
        "HLL (streaming/events.py::foreach_batch_portable_hll — r13 "
        "VERDICT ask #4, upgraded from the DataSketches rows-only form "
        "that carried the repo's stalest driver evidence): a REAL "
        "3-micro-batch run folds each batch's per-day md5 register "
        "rows into a stored register table by per-register MAX "
        "(batch-sized LEFT-join update set; stored-only registers "
        "carry forward through the snapshot upsert), then estimates "
        "per-day distinct users from the final table.  Register "
        "assignment is row-intrinsic and max is associative, so the "
        "maintained table is BIT-IDENTICAL to a one-shot build over "
        "all events — the DuckDB oracle (generated from the same "
        "constants via hll_oracle_sql) replays the whole estimator "
        "hash-strict, turning the old <=5%-tolerance rows-only check "
        "into an exact gate.  The distinct-users dashboard pattern: a "
        "100 TB stream's state is |days| x 256 register rows, never "
        "raw ids, and weekly-from-daily stays one register-MAX away.",
)
def q_streaming_sketch_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.sketches import hll_estimate
    from etl_tiki_webscraping_spark.streaming.events import (
        foreach_batch_portable_hll,
        read_events_stream_multibatch,
    )

    path = _SKETCH_TABLES.get(sf_dir)
    if path is None:
        import tempfile

        root = tempfile.mkdtemp(prefix="sketch-table-")
        path = root + "/tbl"
        stream = read_events_stream_multibatch(spark, sf_dir, n_batches=3)
        stream = stream.withColumn("day", F.to_date("ts"))
        q = (
            foreach_batch_portable_hll(
                stream, path, ["day"], "user_id", root + "/ckpt", lg_k=8
            )
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming sketch maintenance did not finish")
        _SKETCH_TABLES[sf_dir] = path
    from etl_tiki_webscraping_spark.sinks.upsert import read_parquet_table

    reg = read_parquet_table(spark, path).select("day", "idx", "rho")
    return hll_estimate(
        reg, group_cols=["day"], lg_k=8, out_col="approx_users"
    )


_DV_TABLES: dict[str, str] = {}  # sf_dir -> table path (memoized)


@register(
    "snapshot_dv_delete",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DOUBLE) AS price,
           o_orderpriority AS prio
    FROM orders
    WHERE o_orderkey % 3 = 0
      AND NOT (o_orderpriority = '1-URGENT' AND o_custkey % 2 = 1)
    """,
    doc="merge-on-read DELETE via deletion vectors (sinks/upsert.py::"
        "delete_where(deletion_vectors=True) — Delta DV / Iceberg "
        "positional-delete semantics): a partitioned table deletes the "
        "odd-customer urgent rows WITHOUT rewriting a single data file "
        "— the matched rows' (snapshot-relative path, row index) "
        "coordinates commit into the snapshot's _dv/ dir and every read "
        "anti-joins them out.  A point delete against a 100 TB table "
        "costs the matching scan plus KB of vector rows; the next "
        "rewriting commit purges the vectors (unit-tested, along with "
        "carry-through of untouched partitions' vectors and "
        "restore/pruned-read paths).  The oracle replays the delete "
        "from first principles.",
)
def q_snapshot_dv_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.sinks.upsert import (
        delete_where,
        read_parquet_table,
        upsert_parquet,
    )

    path = _DV_TABLES.get(sf_dir)
    if path is None:
        import tempfile

        base = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderkey") % 3 == 0
        ).select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("double").alias("price"),
            F.col("o_orderpriority").alias("prio"),
        )
        path = tempfile.mkdtemp(prefix="dv-") + "/tbl"
        upsert_parquet(
            spark, base, path, ["o_orderkey"], partition_by=["prio"], keep_snapshots=5
        )
        delete_where(
            spark, path,
            (F.col("prio") == "1-URGENT") & (F.col("o_custkey") % 2 == 1),
            deletion_vectors=True, keep_snapshots=5,
        )
        _DV_TABLES[sf_dir] = path
    return read_parquet_table(spark, path).select(
        "o_orderkey", "o_custkey", "price", "prio"
    )


_UPDATE_TABLES: dict[str, str] = {}  # sf_dir -> table path (memoized)


@register(
    "snapshot_update_where",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderpriority = '2-HIGH'
                THEN CAST(o_totalprice AS DOUBLE) * 1.1
                ELSE CAST(o_totalprice AS DOUBLE) END AS price,
           o_orderpriority AS prio
    FROM orders WHERE o_orderkey % 3 = 0
    """,
    doc="predicate UPDATE (sinks/upsert.py::update_where — the DML leg "
        "between the keyed upsert and the predicate delete): a "
        "partitioned table raises 2-HIGH prices 10% in ONE commit that "
        "rewrites ONLY the 2-HIGH partition; every other partition "
        "carries forward by reference (assignments may not target "
        "partition columns — that migration is a keyed op).  The "
        "merge-on-read variant (vectors + appended images, zero "
        "rewrite) is unit-tested; the oracle replays the update from "
        "first principles.",
)
def q_snapshot_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.sinks.upsert import (
        read_parquet_table,
        update_where,
        upsert_parquet,
    )

    path = _UPDATE_TABLES.get(sf_dir)
    if path is None:
        import tempfile

        base = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderkey") % 3 == 0
        ).select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("double").alias("price"),
            F.col("o_orderpriority").alias("prio"),
        )
        path = tempfile.mkdtemp(prefix="update-") + "/tbl"
        upsert_parquet(
            spark, base, path, ["o_orderkey"], partition_by=["prio"], keep_snapshots=5
        )
        update_where(
            spark, path, F.col("prio") == "2-HIGH",
            {"price": F.col("price") * 1.1}, partition_by=["prio"],
            keep_snapshots=5,
        )
        _UPDATE_TABLES[sf_dir] = path
    return read_parquet_table(spark, path).select(
        "o_orderkey", "o_custkey", "price", "prio"
    )


@register(
    "dynamic_partition_pruning",
    oracle="""
    WITH fact AS (
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DOUBLE) AS price,
               o_orderpriority AS prio
        FROM orders WHERE o_orderkey % 3 = 0
    ),
    dim(prio, tier) AS (VALUES ('1-URGENT', 'hot'), ('2-HIGH', 'hot'))
    SELECT f.o_orderkey, f.price, d.tier
    FROM fact f JOIN dim d ON d.prio = f.prio
    """,
    doc="dynamic partition pruning: the prio-partitioned fixture table "
        "joined to a 2-row dimension on the PARTITION column — at plan "
        "time the fact's partition filter is unknown, so Catalyst "
        "injects a dynamicpruning subquery that evaluates the dim side "
        "first and prunes the fact scan to the matching partitions AT "
        "RUNTIME (3 of 5 partition dirs are never opened; asserted in "
        "tools/plan_audit.py).  The star-schema pattern where the date "
        "dimension's WHERE clause prunes a 100 TB fact without the "
        "fact's own predicate mentioning partitions.",
)
def q_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.sinks.upsert import read_parquet_table

    path = _RESTORE_TABLES.get(sf_dir)
    if path is None:
        QUERIES["snapshot_restore"].fn(spark, sf_dir)  # stages + memoizes
        path = _RESTORE_TABLES[sf_dir]
    fact = read_parquet_table(spark, path)
    # the DPP rule fires only when the filtering side carries a
    # SELECTIVE predicate — a full priority dimension filtered to the
    # hot tier, exactly the dimension-WHERE star-schema shape
    dim = spark.createDataFrame(
        [
            ("1-URGENT", "hot"),
            ("2-HIGH", "hot"),
            ("3-MEDIUM", "warm"),
            ("4-NOT SPECIFIED", "cold"),
            ("5-LOW", "cold"),
        ],
        "prio string, tier string",
    ).filter(F.col("tier") == "hot")
    return fact.join(dim, "prio").select("o_orderkey", "price", "tier")


@register(
    "timeseries_gap_interpolation",
    oracle="""
    WITH RECURSIVE cal(day) AS (
        SELECT DATE '2024-01-01'
        UNION ALL SELECT day + 1 FROM cal WHERE day < DATE '2024-01-30'
    ),
    users(user_id) AS (SELECT DISTINCT user_id FROM events WHERE user_id % 37 = 5),
    daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        FROM events
        WHERE user_id % 37 = 5 AND event_type = 'purchase'
        GROUP BY 1, 2
    ),
    spine AS (
        SELECT u.user_id, c.day, d.v
        FROM users u CROSS JOIN cal c
        LEFT JOIN daily d ON d.user_id = u.user_id AND d.day = c.day
    ),
    walls AS (
        SELECT user_id, day, v,
               MAX(CASE WHEN v IS NOT NULL THEN day END)
                   OVER (PARTITION BY user_id ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_day,
               MIN(CASE WHEN v IS NOT NULL THEN day END)
                   OVER (PARTITION BY user_id ORDER BY day
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_day
        FROM spine
    ),
    valued AS (
        SELECT w.user_id, w.day, w.v, w.prev_day, w.next_day,
               pv.v AS prev_v, nv.v AS next_v
        FROM walls w
        LEFT JOIN daily pv ON pv.user_id = w.user_id AND pv.day = w.prev_day
        LEFT JOIN daily nv ON nv.user_id = w.user_id AND nv.day = w.next_day
    )
    SELECT user_id, day,
           ROUND(CASE
               WHEN v IS NOT NULL THEN v
               WHEN prev_day IS NULL THEN next_v
               WHEN next_day IS NULL THEN prev_v
               ELSE prev_v + (next_v - prev_v)
                    * (day - prev_day) / (next_day - prev_day)
           END, 6) AS v_filled
    FROM valued
    """,
    doc="time-series gap filling with LINEAR INTERPOLATION: sparse "
        "per-user daily purchase totals land on a dense calendar spine; "
        "missing days interpolate between the nearest observed walls "
        "(edges extend flat) — the feature-engineering primitive for "
        "regular-cadence model inputs.  Spark shape: two window passes "
        "over ONE user-keyed exchange find each gap's walls via "
        "last/first over ordered frames, then pure arithmetic; values "
        "round to 6 places on both engines so the ratio arithmetic "
        "hash-matches.",
)
def q_timeseries_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("user_id") % 37 == 5) & (F.col("event_type") == "purchase")
    )
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("v"))
    users = daily.select("user_id").distinct()
    cal = spark.sql(
        "SELECT explode(sequence(DATE '2024-01-01', DATE '2024-01-30')) AS day"
    )
    spine = users.crossJoin(cal).join(daily, ["user_id", "day"], "left")
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    marked = spine.select(
        "user_id",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(w_back).alias("prev_v"),
        F.first("v", ignorenulls=True).over(w_fwd).alias("next_v"),
        F.max(F.when(F.col("v").isNotNull(), F.col("day"))).over(w_back).alias("prev_day"),
        F.min(F.when(F.col("v").isNotNull(), F.col("day"))).over(w_fwd).alias("next_day"),
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("prev_day").isNull(), F.col("next_v"))
        .when(F.col("next_day").isNull(), F.col("prev_v"))
        .otherwise(
            F.col("prev_v")
            + (F.col("next_v") - F.col("prev_v"))
            * F.datediff("day", "prev_day")
            / F.datediff("next_day", "prev_day")
        )
    )
    return marked.select(
        "user_id", "day", F.round(filled, 6).alias("v_filled")
    )


@register(
    "k_anonymity_audit",
    oracle="""
    WITH cells AS (
        SELECT c_mktsegment, n_name, COUNT(*) AS cell_size
        FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2
    )
    SELECT c_mktsegment, n_name, cell_size,
           cell_size < 5 AS below_k
    FROM cells
    """,
    doc="k-anonymity audit (privacy/governance): group the "
        "quasi-identifier combination (segment x nation) and flag "
        "equivalence classes smaller than k=5 — rows in those cells are "
        "re-identifiable and must generalize or suppress before "
        "release.  One bounded groupBy over one broadcast dim join; the "
        "audit output is |QI-combinations| rows regardless of table "
        "size, so it runs as a release gate at any scale (pairs with "
        "pii_redact for the column-level half of the privacy story).",
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_mktsegment", "n_name")
        .agg(F.count(F.lit(1)).alias("cell_size"))
        .select(
            "c_mktsegment", "n_name", "cell_size",
            (F.col("cell_size") < 5).alias("below_k"),
        )
    )


@register(
    "winsorize_clip",
    oracle="""
    WITH bounds AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS lo,
               quantile_cont(value, 0.95) AS hi
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           ROUND(LEAST(GREATEST(e.value, b.lo), b.hi), 6) AS v_clipped
    FROM events e JOIN bounds b USING (event_type)
    """,
    doc="winsorization (outlier clipping for model features): per-type "
        "exact p5/p95 bounds clamp every value — one bounded aggregate "
        "(|types| rows) broadcast back onto the scan, so the clip is a "
        "map-side expression over one pass; the classic alternative "
        "(a global sort for percentiles) never happens.  Spark's exact "
        "interpolated percentile == DuckDB quantile_cont, values "
        "rounded to 6 places for the hash match.",
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    return ev.join(F.broadcast(bounds), "event_type").select(
        "event_id",
        "event_type",
        F.round(F.least(F.greatest("value", "lo"), "hi"), 6).alias("v_clipped"),
    )


@register(
    "golden_record_survivorship",
    oracle=r"""
    WITH RECURSIVE toks AS (
        SELECT doc_id, list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS tok
        FROM documents
    ),
    cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.tok AS ta, b.tok AS tb
        FROM toks a JOIN toks b ON b.doc_id = a.doc_id + 1 OR b.doc_id = a.doc_id + 2
    ),
    edges AS (
        SELECT id_a, id_b FROM cand
        WHERE CAST(len(list_intersect(ta, tb)) AS DOUBLE)
                  / CAST(len(list_distinct(list_concat(ta, tb))) AS DOUBLE) >= 0.5
    ),
    undirected AS (
        SELECT id_a AS src, id_b AS dst FROM edges
        UNION SELECT id_b AS src, id_a AS dst FROM edges
    ),
    reach AS (
        SELECT src AS id, src AS lbl FROM undirected
        UNION
        SELECT u.dst AS id, r.lbl FROM reach r JOIN undirected u ON u.src = r.id
    ),
    comp AS (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id),
    labeled AS (
        SELECT d.doc_id, d.n_chars,
               CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component
        FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    ),
    ranked AS (
        SELECT component, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY component
                                  ORDER BY n_chars DESC, doc_id) AS rk
        FROM labeled
    )
    SELECT r.component,
           r.doc_id AS golden_doc_id,
           (SELECT COUNT(*) FROM labeled l WHERE l.component = r.component)
               AS n_members
    FROM ranked r WHERE r.rk = 1
    """,
    doc="entity-resolution survivorship (golden record): duplicate "
        "clusters from the SAME deterministic candidate/Jaccard/"
        "connected-components pipeline as dedup_cluster_components, then "
        "each cluster elects one surviving record by the completeness "
        "rule (longest text, id tie-break) with its member count — the "
        "step that turns dedup output into a master table.  One extra "
        "window over the bounded (doc -> component) labels; the "
        "recursive-CTE oracle recomputes clusters AND survivorship from "
        "first principles.",
)
def q_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from etl_tiki_webscraping_spark.operators.dedup import (
        connected_components,
        jaccard_on_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.select("doc_id")
    cand = (
        ids.select(F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b"))
        .union(ids.select(F.col("doc_id").alias("id_a"), (F.col("doc_id") + 2).alias("id_b")))
        .join(ids.select(F.col("doc_id").alias("id_b")), on="id_b", how="left_semi")
    )
    edges = (
        jaccard_on_pairs(cand, docs, "text", "doc_id", shingle_n=1)
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b")
    )
    comps = connected_components(edges)
    labeled = (
        docs.select("doc_id", "n_chars")
        .join(comps.withColumnRenamed("id", "doc_id"), on="doc_id", how="left")
        .select(
            "doc_id",
            "n_chars",
            F.coalesce("component", "doc_id").cast("bigint").alias("component"),
        )
    )
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    members = labeled.groupBy("component").agg(F.count(F.lit(1)).alias("n_members"))
    golden = (
        labeled.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("component", F.col("doc_id").alias("golden_doc_id"))
    )
    return golden.join(members, "component")


@register(
    "chunk_dedup_rate",
    oracle="""
    WITH d AS (
        SELECT doc_id, source,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           t -> t <> '') AS toks
        FROM documents
    ),
    dd AS (SELECT doc_id, source, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
    chunks AS (
        SELECT dd.source,
               md5(array_to_string(
                   list_slice(dd.toks, c.start + 1, LEAST(c.start + 32, dd.n)),
                   ' ')) AS h
        FROM dd, LATERAL (SELECT unnest(range(0, dd.n, 24)) AS start) c
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT h) AS BIGINT) AS n_distinct,
           ROUND(1.0 - CAST(COUNT(DISTINCT h) AS DOUBLE) / COUNT(*), 6)
               AS dup_ratio
    FROM chunks GROUP BY source
    """,
    doc="chunk-level duplication measurement (composition of "
        "doc_chunking + exact dedup): 32-token/stride-24 chunks hash to "
        "md5 and per-source duplication ratios fall out of one groupBy "
        "over bare hashes — the paragraph-grain contamination metric "
        "pretraining curation tracks (document-level dedup misses "
        "boilerplate repeated ACROSS distinct documents).  Exchanges "
        "carry (source, 16-byte hash), never chunk text.",
)
def q_chunk_dedup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    CHUNK, STRIDE = 32, 24
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "source",
        F.filter(
            F.split(F.lower("text"), "[^a-z0-9]+"), lambda t: t != F.lit("")
        ).alias("toks"),
    ).withColumn("n", F.size("toks")).filter(F.col("n") > 0)
    chunks = toked.select(
        "source",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(STRIDE))
        ).alias("start"),
        "toks",
        "n",
    ).select(
        "source",
        F.md5(
            F.array_join(F.slice(F.col("toks"), F.col("start") + 1, F.lit(CHUNK)), " ")
        ).alias("h"),
    )
    return chunks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("h").alias("n_distinct"),
        F.round(
            F.lit(1.0) - F.countDistinct("h").cast("double") / F.count(F.lit(1)), 6
        ).alias("dup_ratio"),
    )


@register(
    "knn_pq_adc",
    oracle=None,  # approximate (trained product quantizer) — rows-only
    doc="product-quantization ANN (operators/similarity.py::"
        "pq_train_codebooks/pq_encode/pq_topk — the FAISS PQ/ADC "
        "design): vectors compress to m=8 sub-space codes (k=16 "
        "codebook entries each, trained by m distributed k-means fits; "
        "effective cell count 16^8) plus an exact norm; search scans "
        "CODES — 8 small ints per vector, never the 64 floats — via "
        "per-query asymmetric-distance lookup tables, keeping a local "
        "top-k per partition so the shuffle carries partitions x "
        "queries x k rows.  ADC ranks at quantization-cell resolution, "
        "so it generates a 5k SHORTLIST that pq_refine re-ranks with "
        "exact cosine over the bounded candidate set — the standard "
        "PQ + refine pipeline, with the memory/IO story brute force "
        "cannot have (a 100 TB float corpus becomes ~3 TB of codes; "
        "full vectors are touched only for shortlisted ids).  Recall "
        "floors pinned in tests/test_quality_gates.py alongside the "
        "LSH/IVF gates.",
)
def q_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.similarity import (
        pq_encode,
        pq_refine,
        pq_topk,
        pq_train_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # codebook training is INDEX BUILD (m k-means fits) — one-time
    # staging like the bloom-index build, memoized per process; the
    # measured query is encode + ADC scan + refine
    rows = _PQ_BOOKS.get(sf_dir)
    if rows is None:
        rows = pq_train_codebooks(emb, m=8, k=16, max_iter=5).collect()
        _PQ_BOOKS[sf_dir] = rows
    books = spark.createDataFrame(rows, "subspace int, code int, subvec array<double>")
    codes = pq_encode(emb, books)
    shortlist = pq_topk(codes, books, queries, k=50)
    return pq_refine(shortlist, emb, queries, k=10)


_PQ_BOOKS: dict[str, list] = {}  # sf_dir -> collected codebook rows
_IVF_PQ_CENTS: dict[str, list] = {}  # sf_dir -> collected IVF centroid rows


@register(
    "knn_ivf_pq",
    oracle=None,  # approximate (trained coarse + product quantizers) — rows-only
    doc="COMPOSED IVF x PQ ANN (operators/similarity.py::ivf_pq_topk "
        "— FAISS 'IVF16,PQ8' expressed relationally; VERDICT r8 ask "
        "#5): queries route driver-side to their nprobe=4 of 16 IVF "
        "cells, the (query, cell) probe list BROADCASTS onto the "
        "cell-tagged PQ code table (the scan side never shuffles), "
        "the ADC kernel scores codes only inside probed lists keeping "
        "a per-batch shortlist, and exact refine re-ranks the "
        "bounded candidate set.  IVF prunes the scan to ~nprobe/"
        "n_cells of the corpus, PQ shrinks what IS scanned to 8 ints "
        "+ a norm per vector — together the 10^9-vector serving "
        "shape: at 100 TB the code table persists partitioned by "
        "cell so probing becomes partition pruning.  Index build "
        "(k-means coarse quantizer + m codebook fits) is one-time "
        "staging, memoized like the PQ/bloom builds; recall floor "
        "pinned in tests/test_quality_gates.py.",
)
def q_knn_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.similarity import (
        ivf_pq_topk,
        ivf_train_centroids,
        pq_train_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cent_rows = _IVF_PQ_CENTS.get(sf_dir)
    if cent_rows is None:
        cent_rows = ivf_train_centroids(emb, n_cells=16, max_iter=5).collect()
        _IVF_PQ_CENTS[sf_dir] = cent_rows
    centroids = spark.createDataFrame(
        cent_rows, "centroid_id bigint, embedding array<double>"
    )
    book_rows = _PQ_BOOKS.get(sf_dir)
    if book_rows is None:
        book_rows = pq_train_codebooks(emb, m=8, k=16, max_iter=5).collect()
        _PQ_BOOKS[sf_dir] = book_rows
    books = spark.createDataFrame(
        book_rows, "subspace int, code int, subvec array<double>"
    )
    return ivf_pq_topk(
        emb, centroids, books, queries, k=10, nprobe=4, shortlist_k=50
    )


@register(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    cohorts AS (
        SELECT user_id,
               CAST(date_trunc('week', first_day) AS DATE) AS cohort_week
        FROM firsts
    ),
    activity AS (
        SELECT DISTINCT e.user_id, c.cohort_week,
               CAST(floor(date_diff('day', c.cohort_week,
                                    CAST(e.ts AS DATE)) / 7) AS BIGINT)
                   AS week_offset
        FROM events e JOIN cohorts c USING (user_id)
        WHERE e.event_type = 'purchase'
    ),
    sizes AS (
        SELECT cohort_week, COUNT(*) AS cohort_size FROM cohorts GROUP BY 1
    )
    SELECT a.cohort_week, a.week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           ROUND(CAST(COUNT(*) AS DOUBLE) / s.cohort_size, 6) AS retention
    FROM activity a JOIN sizes s USING (cohort_week)
    GROUP BY a.cohort_week, a.week_offset, s.cohort_size
    """,
    doc="cohort retention analysis (the canonical product-analytics "
        "matrix): users cohorted by first-purchase week, then the share "
        "of each cohort still purchasing k weeks later.  Spark shape: "
        "one user-keyed aggregate finds first purchases, the cohort "
        "label broadcasts back onto the event scan (small dimension by "
        "construction: one row per user collapses to one per cohort "
        "before the final bounded groupBy over the cohort x offset "
        "grid).  Week offsets are integer day arithmetic — no float in "
        "the grid — and the retention ratio rounds to 6 places for the "
        "exact DuckDB replay.",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.relational import cohort_retention

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select("user_id", F.col("ts").cast("date").alias("day"))
    return cohort_retention(ev)


_PAGERANK_EDGES_SQL = """
    SELECT 's' || CAST(l_suppkey AS VARCHAR) AS src,
           'c' || CAST(o_custkey AS VARCHAR) AS dst
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""


def _pagerank_oracle() -> str:
    from etl_tiki_webscraping_spark.operators.graph import pagerank_oracle_sql

    return pagerank_oracle_sql(_PAGERANK_EDGES_SQL, damping=0.85, iterations=6)


@register(
    "graph_pagerank",
    oracle=_pagerank_oracle(),
    doc="fixed-point iterative PageRank (6 iterations, d=0.85) over the "
        "supplier->customer fulfilment graph (edge per distinct "
        "(supplier, customer) pair observed in lineitem x orders).  The "
        "canonical iterative-algorithm shape the linear reference DAG "
        "lacks: each iteration is ONE shuffle (contribution groupBy on "
        "dst) plus a broadcast scalar (dangling mass), with edges and "
        "out-degrees localCheckpoint-ed once and reused — O(iterations) "
        "bounded jobs, lineage truncated per step, rank sums through "
        "integer 1e-15 units (exact DECIMAL(38,0) sums) so the DuckDB "
        "oracle (same iterations unrolled "
        "as chained CTEs) hash-matches exactly.  At 100 TB the driver "
        "holds only the node COUNT and per-iteration dangling scalar.",
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # r16: iterate over INTEGER node ids (supplier 2k, customer 2k+1 —
    # bijective with the 's<k>'/'c<k>' labels) and reattach the string
    # labels once at the end: the per-iteration contribution groupBy,
    # the edge distinct, and every node join then hash/compare 8-byte
    # longs instead of variable-length strings (guide §2.3 narrower
    # types).  The graph is isomorphic and the quantized sums are
    # label-independent, so ranks — and the labeled output the oracle
    # replays — are bit-identical.
    edges = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        (F.col("l_suppkey").cast("bigint") * 2).alias("src"),
        (F.col("o_custkey").cast("bigint") * 2 + 1).alias("dst"),
    )
    pr = pagerank(edges, damping=0.85, iterations=6)
    return pr.select(
        F.when(
            F.col("node") % 2 == 0,
            F.concat(F.lit("s"), (F.col("node") / 2).cast("bigint").cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("c"), ((F.col("node") - 1) / 2).cast("bigint").cast("string")
            )
        )
        .alias("node"),
        "rank",
    )


@register(
    "entity_match_blocked",
    oracle="""
    SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
           a.c_name AS a_name, b.c_name AS b_name,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS distance
    FROM customer a
    JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_mktsegment = b.c_mktsegment
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
    doc="blocked fuzzy entity matching (record linkage): candidate "
        "customer pairs generated ONLY inside a (nation, segment) "
        "blocking key, scored with exact Levenshtein edit distance, "
        "kept at distance <= 2.  The all-pairs O(n^2) comparison is "
        "the classic entity-resolution scale killer; blocking bounds "
        "the cost by sum(|block|^2) regardless of table size.  Physical "
        "plan: ONE shuffle on the block key (self equi-join) and the "
        "edit distance runs JVM-side (F.levenshtein, whole-stage "
        "codegen) on blocked candidates only — no UDF, no cartesian.  "
        "An optional per-block row cap excludes skew-degenerate blocks "
        "(unit-tested); the oracle replays blocking + distance "
        "first-principles in DuckDB.",
)
def q_entity_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.relational import (
        blocked_entity_match,
    )

    cust = load_table(spark, sf_dir, "customer")
    # cap 64 + deletion_join overflow: EXACTLY the uncapped result (the
    # deletion-neighborhood path is an exact candidate generator), but
    # per-block cost stops being quadratic in block fatness — at sf0.01
    # every block is under the cap (pure equi path), at sf0.1 every
    # block is over it (pure deletion path), so the one oracle checks
    # BOTH physical strategies across the driver's two SFs
    return blocked_entity_match(
        cust,
        id_col="c_custkey",
        name_col="c_name",
        block_cols=["c_nationkey", "c_mktsegment"],
        max_distance=2,
        max_block_rows=64,
        overflow="deletion_join",
    )


@register(
    "histogram_equi_depth",
    oracle="""
    WITH t AS (
        SELECT o_totalprice,
               NTILE(8) OVER (ORDER BY CAST(o_totalprice AS DOUBLE),
                              o_orderkey) AS tile
        FROM orders WHERE o_totalprice IS NOT NULL
    )
    SELECT tile,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(MIN(CAST(o_totalprice AS DOUBLE)) AS DOUBLE) AS lo,
           CAST(MAX(CAST(o_totalprice AS DOUBLE)) AS DOUBLE) AS hi
    FROM t GROUP BY tile
    """,
    doc="equi-DEPTH histogram (the profiling twin of the equi-width "
        "one): 8 equal-population bands over order totals with each "
        "band's exact [lo, hi] — what an optimizer's depth histogram "
        "or a feature-binning step actually stores.  Built on "
        "distributed_ntile (the two-pass range-bucket prefix shape — "
        "no single-partition global sort; the window in the ORACLE is "
        "DuckDB's problem, not the engine's plan), with the "
        "(order, tie) total order making tile assignment engine-"
        "independent.  One bounded rollup per tile follows.",
)
def q_histogram_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.relational import (
        distributed_ntile,
    )

    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice").isNotNull())
        .select(
            "o_orderkey", F.col("o_totalprice").cast("double").alias("price")
        )
    )
    tiled = distributed_ntile(
        orders, "price", "o_orderkey", n=8, out_col="tile"
    )
    return tiled.groupBy("tile").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("price").alias("lo"),
        F.max("price").alias("hi"),
    )


@register(
    "dau_wau_stickiness",
    oracle="""
    WITH activity AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    days AS (SELECT DISTINCT d FROM activity),
    dau AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM activity GROUP BY d
    ),
    wau AS (
        SELECT days.d, CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS wau
        FROM days JOIN activity a
          ON a.d <= days.d AND a.d >= days.d - INTERVAL 6 DAY
        GROUP BY days.d
    )
    SELECT dau.d AS day, dau.dau, wau.wau,
           round(CAST(dau.dau AS DOUBLE) / wau.wau, 9) AS stickiness
    FROM dau JOIN wau ON wau.d = dau.d
    """,
    doc="DAU/WAU stickiness (the engagement ratio product analytics "
        "reports): daily actives over trailing-7-day actives per day.  "
        "COUNT(DISTINCT) over a RANGE frame is unsupported in Spark "
        "windows, so the trailing window is a bounded day-grid range "
        "join — the (day x active-day) pairs blow up by at most 7x the "
        "distinct (day, user) table, NOT the event table, because "
        "activity is de-duplicated to day grain first (events collapse "
        "~100x before any join).  Ratio rounds at 9 (the ranking "
        "convention).",
)
def q_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    activity = ev.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    days = activity.select("d").distinct()
    dau = activity.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    wau = (
        days.alias("g")
        .join(
            activity.alias("a"),
            (F.col("a.d") <= F.col("g.d"))
            & (F.col("a.d") >= F.date_sub(F.col("g.d"), 6)),
        )
        .groupBy(F.col("g.d").alias("d"))
        .agg(F.countDistinct("a.user_id").alias("wau"))
    )
    return (
        dau.join(wau, on="d")
        .select(
            F.col("d").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 9).alias(
                "stickiness"
            ),
        )
    )


_QNORM_FRACTIONS = [i / 100.0 for i in range(101)]
_QNORM_STOPWORD_SQL = (
    "CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
    "t -> t IN ('the','and','of','to','in','is','it','that','for','with')))"
    " AS DOUBLE) / CAST(greatest(len(string_split_regex(lower(trim(text)),"
    " '\\s+')), 1) AS DOUBLE)"
)


@register(
    "quantile_normalize_scores",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, source, {_QNORM_STOPWORD_SQL} AS q
        FROM documents WHERE text IS NOT NULL
    ),
    pr AS (
        SELECT doc_id, source, q,
               percent_rank() OVER (PARTITION BY source
                                    ORDER BY q, doc_id) AS pr
        FROM scored
    ),
    grid AS (
        SELECT quantile_cont(q, [{", ".join(repr(f) for f in _QNORM_FRACTIONS)}]) AS g
        FROM scored
    )
    SELECT doc_id, source, round(q, 9) AS raw_q,
           round(g[CAST(floor(pr * 100 + 0.5) AS INT) + 1], 9) AS norm_q
    FROM pr, grid
    """,
    doc="Cross-source quantile normalization of quality scores (batch-"
        "effect correction before corpus mixing: a lenient scorer on "
        "one source must not flood the budget): each document's "
        "within-source percent_rank maps onto the GLOBAL score "
        "distribution via a 101-point exact-percentile grid.  Scale "
        "shape: per-source windows (bounded partitions), ONE global "
        "percentile aggregate whose 101-double result broadcasts, "
        "pure arithmetic lookup after — no global sort, no global "
        "window.  Cross-engine exactness: Spark percentile == DuckDB "
        "quantile_cont (linear interpolation at p*(n-1), proven by "
        "exact_percentiles), the grid FRACTIONS are generated from "
        "the same Python doubles into both engines, and the grid "
        "index uses the floor(x+0.5) recipe, never round().",
)
def q_quantile_normalize_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from etl_tiki_webscraping_spark.functions.text import stopword_ratio

    scored = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "source", stopword_ratio("text").alias("q"))
    )
    w = Window.partitionBy("source").orderBy("q", "doc_id")
    pr = scored.withColumn("pr", F.percent_rank().over(w))
    grid = scored.agg(
        F.percentile("q", F.array(*[F.lit(f) for f in _QNORM_FRACTIONS])).alias(
            "g"
        )
    )
    return pr.crossJoin(F.broadcast(grid)).select(
        "doc_id",
        "source",
        F.round("q", 9).alias("raw_q"),
        F.round(
            F.element_at(
                "g",
                (F.floor(F.col("pr") * 100 + F.lit(0.5)) + 1).cast("int"),
            ),
            9,
        ).alias("norm_q"),
    )


@register(
    "histogram_equi_width",
    oracle="""
    WITH b AS (
        SELECT LEAST(19, GREATEST(0,
                   CAST(floor((CAST(o_totalprice AS DOUBLE) - 0.0)
                              / 30000.0) AS INT))) AS bucket
        FROM orders WHERE o_totalprice IS NOT NULL
    )
    SELECT bucket,
           CAST(bucket * 30000.0 AS DOUBLE) AS bucket_lo,
           CAST((bucket + 1) * 30000.0 AS DOUBLE) AS bucket_hi,
           COUNT(*) AS cnt
    FROM b GROUP BY bucket
    """,
    doc="equi-width histogram (profiling primitive): order totals "
        "bucketed into 20 equal intervals on [0, 600000) with clamped "
        "edges so no non-NULL row drops (NULLs are excluded, or "
        "surfaced as a dedicated bucket=-1 row with null_bucket=True — "
        "never silently folded into bucket 0).  ONE map-side-"
        "combinable groupBy on a "
        "derived integer — shuffle cardinality is the bucket count, "
        "never row count, so the cost at 100 TB is the scan.  Bucket "
        "arithmetic is plain floor division (no dialect-specific "
        "width_bucket), replayed exactly by the DuckDB oracle.",
)
def q_histogram_equi_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.rollup import equi_width_histogram

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast("double").alias("price")
    )
    return equi_width_histogram(orders, "price", lo=0.0, hi=600_000.0, n_buckets=20)


_COMPACT_TABLES: dict[str, str] = {}  # sf_dir -> table path (memoized)


@register(
    "snapshot_compaction",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DOUBLE) AS price,
           o_orderpriority AS prio
    FROM orders WHERE o_orderkey % 3 = 0
    """,
    doc="small-file compaction as a first-class maintenance commit "
        "(sinks/upsert.py::compact_table — Delta OPTIMIZE / Iceberg "
        "rewrite_data_files): the fixture table accretes FIVE "
        "micro-batch upsert commits (one file set each — the small-"
        "file storm that dominates 100 TB scan time via per-file open "
        "+ footer reads), then ONE compaction commit rewrites the live "
        "snapshot into ~target-size files CLUSTERED on the order key "
        "(range-partitioned sort, so selective scans skip whole files "
        "via manifest min/max).  Data is bit-identical before and "
        "after BY CONTRACT — the oracle reads the same rows from first "
        "principles, and the unit suite pins the file-count drop and "
        "the sort-clustering.",
)
def q_snapshot_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.sinks.upsert import (
        compact_table,
        read_parquet_table,
        upsert_parquet,
    )

    path = _COMPACT_TABLES.get(sf_dir)
    if path is None:
        import tempfile

        base = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderkey") % 3 == 0
        ).select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("double").alias("price"),
            F.col("o_orderpriority").alias("prio"),
        )
        path = tempfile.mkdtemp(prefix="compact-") + "/tbl"
        # five micro-batch commits: disjoint key slices, one file set
        # each — the accretion pattern a streaming sink produces
        for i in range(5):
            upsert_parquet(
                spark,
                base.filter(F.col("o_orderkey") % 5 == i),
                path,
                ["o_orderkey"],
                keep_snapshots=7,
            )
        compact_table(
            spark, path, sort_by=["o_orderkey"], keep_snapshots=7
        )
        _COMPACT_TABLES[sf_dir] = path
    return read_parquet_table(spark, path).select(
        "o_orderkey", "o_custkey", "price", "prio"
    )


@register(
    "embedding_pca_variance",
    oracle=None,  # eigensolve is not SQL-expressible; numpy-gated in
    # tests/test_similarity.py (exact eigenvalue match to 1e-12 rel.)
    doc="distributed PCA over the embedding corpus (whitening / "
        "dimension-reduction prerequisite for 100 TB embedding "
        "pipelines): the O(n d^2) Gram + mean accumulation runs in ONE "
        "Arrow pass (mapInPandas partials), the reduce is a "
        "posexplode + groupBy(pos) of cardinality d^2 + d (never n), "
        "and only the d x d Gram reaches the driver for the O(d^3) "
        "eigensolve — no row data is ever collected.  Returns the "
        "top-8 (component, eigenvalue, explained_ratio) rows; the "
        "unit gate pins eigenvalues against a single-node numpy PCA "
        "of the same vectors.",
)
def q_embedding_pca_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.similarity import (
        embedding_pca_report,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_pca_report(emb, "embedding", k=8)


# quality_model_score's full replay (features -> stable sigmoid ->
# banding), shared with the quality_model_auc oracle below.
_QMS_ORACLE = r"""
    WITH feats AS (
        SELECT doc_id,
               CAST(length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS DOUBLE)
                   / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio,
               CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                        t -> t IN ('the','and','of','to','in','is','it','that','for','with'))) AS DOUBLE)
                   / CAST(greatest(len(string_split_regex(lower(trim(text)), '\s+')), 1) AS DOUBLE)
                   AS stopword_ratio,
               ln(1.0 + len(list_filter(string_split_regex(trim(text), '\s+'),
                                        t -> t <> ''))) AS log_tokens
        FROM documents
    ),
    scored AS (
        SELECT doc_id,
               (-0.8) + 0.55 * log_tokens + (-2.1) * punct_ratio
                      + 3.0 * stopword_ratio AS z
        FROM feats
    )
    SELECT doc_id,
           ROUND(CASE WHEN z >= 0
                      THEN 1.0 / (1.0 + exp(-abs(z)))
                      ELSE 1.0 - 1.0 / (1.0 + exp(-abs(z))) END, 6) AS score,
           CASE WHEN (CASE WHEN z >= 0 THEN 1.0 / (1.0 + exp(-abs(z)))
                           ELSE 1.0 - 1.0 / (1.0 + exp(-abs(z))) END) >= 0.75 THEN 0
                WHEN (CASE WHEN z >= 0 THEN 1.0 / (1.0 + exp(-abs(z)))
                           ELSE 1.0 - 1.0 / (1.0 + exp(-abs(z))) END) >= 0.5 THEN 1
                ELSE 2 END AS band
    FROM scored
    """


@register(
    "quality_model_score",
    oracle=_QMS_ORACLE,
    doc="trained-classifier inference at scan speed (the CCNet/LLaMA-"
        "style quality-filter deployment, distinct from the heuristic "
        "text_quality_score): a logistic-regression model's weights "
        "ride the task closure (broadcast by construction — a dict, "
        "not a table) and the score is ONE narrow projection in "
        "whole-stage codegen — no UDF, no shuffle, no model server; "
        "at 100 TB the cost is the scan.  The sigmoid computes on "
        "-|z| (quality/scoring.py::sigmoid) so exp never overflows; "
        "band thresholds route keep/review/drop.  The oracle replays "
        "features, the stable sigmoid, and the banding in DuckDB; "
        "scores round to 6 places.",
)
def q_quality_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.text import (
        punct_ratio,
        stopword_ratio,
        token_count,
    )
    from etl_tiki_webscraping_spark.quality.scoring import (
        linear_model_score,
        score_and_band,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = {
        "punct_ratio": punct_ratio("text"),
        "stopword_ratio": stopword_ratio("text"),
        "log_tokens": F.log(F.lit(1.0) + token_count("text")),
    }
    score = linear_model_score(
        feats,
        weights={
            "log_tokens": 0.55,
            "punct_ratio": -2.1,
            "stopword_ratio": 3.0,
        },
        bias=-0.8,
    )
    return score_and_band(docs, score, bands=[0.75, 0.5]).select(
        "doc_id", F.round("score", 6).alias("score"), "band"
    )


@register(
    "quality_model_auc",
    oracle=f"""
    WITH lab AS (
        SELECT s.score,
               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS label
        FROM ({_QMS_ORACLE}) s JOIN documents d USING (doc_id)
    ),
    g AS (
        SELECT score, COUNT(*) AS cnt, SUM(label) AS pos
        FROM lab GROUP BY 1
    ),
    r AS (
        SELECT *,
               COALESCE(SUM(cnt) OVER (
                   ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS below
        FROM g
    ),
    a AS (
        SELECT SUM(pos * (2 * below + cnt + 1)) AS pos_rank2,
               SUM(pos) AS n_pos, SUM(cnt - pos) AS n_neg
        FROM r
    )
    SELECT CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n_neg AS BIGINT) AS n_neg,
           round(CAST(pos_rank2 - n_pos * (n_pos + 1) AS DOUBLE)
                 / NULLIF(2.0 * CAST(n_pos AS DOUBLE)
                          * CAST(n_neg AS DOUBLE), 0),
                 6) AS auc
    FROM a
    """,
    doc="classifier EVALUATION closing the quality-model loop (train = "
        "logreg_quality_train, inference = quality_model_score, "
        "calibration = model_calibration_bins): ROC AUC of the deployed "
        "score against the independent lang='en' label via the tied-rank "
        "Mann-Whitney statistic (quality/eval.py::roc_auc_report).  The "
        "English-stopword feature gives the score real signal on the "
        "label, so the AUC is a meaningful measurement, not a fixture "
        "artifact.  Scale shape: the raw scan partial-aggregates to "
        "|distinct 6dp scores| <= ~1e6 rows map-side; only that bounded "
        "table crosses an exchange and feeds the one bounded ranking "
        "window — a 100 TB AUC costs one scan.  Rank arithmetic is "
        "integer-exact (2*avg_rank = 2*below+cnt+1, DECIMAL sums) until "
        "the single final division, rounded 6dp — the oracle replays it "
        "bit-for-bit.",
)
def q_quality_model_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.quality.eval import roc_auc_report

    docs = load_table(spark, sf_dir, "documents")
    scored = q_quality_model_score(spark, sf_dir).join(
        docs.select(
            "doc_id",
            # coalesce: a NULL lang is a NEGATIVE label (0), exactly like
            # the oracle's CASE ... ELSE 0 — without it Spark's NULL label
            # would drop the row from the ranking while DuckDB counts it
            F.coalesce(
                (F.col("lang") == "en").cast("int"), F.lit(0)
            ).alias("label"),
        ),
        "doc_id",
    )
    return roc_auc_report(scored, "score", "label")


@register(
    "conformal_coverage_report",
    oracle=f"""
    WITH s AS (SELECT doc_id, score FROM ({_QMS_ORACLE}) q),
    base AS (
        SELECT 1.0 - score AS nc, doc_id % 2 = 0 AS is_cal FROM s
    ),
    calg AS (SELECT nc, COUNT(*) AS cnt FROM base WHERE is_cal GROUP BY 1),
    calc AS (
        SELECT nc, SUM(cnt) OVER (
            ORDER BY nc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS cum FROM calg
    ),
    caln AS (SELECT MAX(cum) AS n_cal FROM calc),
    testg AS (SELECT nc, COUNT(*) AS cnt FROM base WHERE NOT is_cal GROUP BY 1),
    testc AS (
        SELECT nc, SUM(cnt) OVER (
            ORDER BY nc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS cum FROM testg
    ),
    testn AS (SELECT MAX(cum) AS n_test FROM testc),
    alphas AS (SELECT CAST(unnest([0.1, 0.05]) AS DOUBLE) AS alpha),
    qh AS (
        SELECT a.alpha, n.n_cal,
               MIN(CASE WHEN c.cum >= ceil((n.n_cal + 1) * (1.0 - a.alpha))
                        THEN c.nc END) AS qhat
        FROM alphas a, caln n, calc c
        GROUP BY 1, 2
    ),
    cov AS (
        SELECT q.alpha, q.n_cal, q.qhat,
               MAX(CASE WHEN t.nc <= q.qhat THEN t.cum END) AS cov_cnt
        FROM qh q, testc t GROUP BY 1, 2, 3
    )
    SELECT alpha,
           CAST(n_cal AS BIGINT) AS n_cal,
           CAST((SELECT n_test FROM testn) AS BIGINT) AS n_test,
           qhat,
           CASE WHEN qhat IS NULL THEN 1.0
                ELSE round(CAST(COALESCE(cov_cnt, 0) AS DOUBLE)
                           / CAST((SELECT n_test FROM testn) AS DOUBLE), 6)
                END AS coverage
    FROM cov
    """,
    doc="split-conformal calibration audit (Vovk; Angelopoulos & Bates "
        "2021) — the distribution-free fourth leg of the classifier "
        "loop (train / score / reliability-bins / CONFORMAL): on the "
        "even-doc_id calibration split, the ceil((n+1)(1-alpha))-th "
        "smallest nonconformity (1 - score) is the threshold that "
        "guarantees >= 1-alpha marginal coverage; the report measures "
        "that coverage on the odd-doc_id test split for alpha in "
        "{0.1, 0.05}.  Exact order statistics at 100 TB via the "
        "roc_auc_report bounded-domain trick: each split partial-"
        "aggregates to |distinct 6dp scores| rows map-side, running-"
        "count windows rank only those bounded tables, and the 2 "
        "threshold rows cross the bounded test table "
        "(quality/eval.py::conformal_coverage_report).",
)
def q_conformal_coverage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.quality.eval import conformal_coverage_report

    scored = q_quality_model_score(spark, sf_dir).select(
        "doc_id", "score", (F.col("doc_id") % 2 == 0).alias("is_cal")
    )
    return conformal_coverage_report(scored, "score", "is_cal")


@register(
    "generation_overlap_eval",
    oracle=r"""
    WITH docs2 AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           t -> t <> '') AS tok
        FROM documents
    ),
    pairs AS (
        SELECT c.doc_id // 2 AS pair_id, c.tok AS tc, r.tok AS tr
        FROM docs2 c JOIN docs2 r ON r.doc_id = c.doc_id - 1
        WHERE c.doc_id % 2 = 1 AND len(c.tok) > 0 AND len(r.tok) > 0
    ),
    grams AS (
        SELECT pair_id, 'c' AS side, 1 AS n, unnest(tc) AS gram FROM pairs
        UNION ALL
        SELECT pair_id, 'r', 1, unnest(tr) FROM pairs
        UNION ALL
        SELECT pair_id, 'c', 2,
               unnest(list_transform(range(1, len(tc)),
                                     i -> tc[i] || ' ' || tc[i + 1]))
        FROM pairs
        UNION ALL
        SELECT pair_id, 'r', 2,
               unnest(list_transform(range(1, len(tr)),
                                     i -> tr[i] || ' ' || tr[i + 1]))
        FROM pairs
    ),
    cnt AS (
        SELECT pair_id, n, gram,
               SUM(CASE WHEN side = 'c' THEN 1 ELSE 0 END) AS c_cnt,
               SUM(CASE WHEN side = 'r' THEN 1 ELSE 0 END) AS r_cnt
        FROM grams GROUP BY 1, 2, 3
    ),
    per_n AS (
        SELECT pair_id, n,
               SUM(LEAST(c_cnt, r_cnt)) AS clip,
               SUM(c_cnt) AS c_tot, SUM(r_cnt) AS r_tot
        FROM cnt GROUP BY 1, 2
    ),
    m AS (
        SELECT pair_id,
               MAX(CASE WHEN n = 1 THEN clip  END) AS clip1,
               MAX(CASE WHEN n = 1 THEN c_tot END) AS c_tot1,
               MAX(CASE WHEN n = 1 THEN r_tot END) AS r_tot1,
               COALESCE(MAX(CASE WHEN n = 2 THEN clip  END), 0) AS clip2,
               COALESCE(MAX(CASE WHEN n = 2 THEN c_tot END), 0) AS c_tot2,
               COALESCE(MAX(CASE WHEN n = 2 THEN r_tot END), 0) AS r_tot2
        FROM per_n GROUP BY pair_id
    )
    SELECT pair_id,
           CAST(c_tot1 AS BIGINT) AS cand_tokens,
           CAST(r_tot1 AS BIGINT) AS ref_tokens,
           CASE WHEN clip1 > 0 AND clip2 > 0
                THEN round(
                    (CASE WHEN c_tot1 > r_tot1 THEN 1.0
                          ELSE exp(1.0 - CAST(r_tot1 AS DOUBLE)
                                         / CAST(c_tot1 AS DOUBLE)) END)
                    * sqrt((CAST(clip1 AS DOUBLE) / CAST(c_tot1 AS DOUBLE))
                           * (CAST(clip2 AS DOUBLE) / CAST(c_tot2 AS DOUBLE))),
                    6)
                ELSE 0.0 END AS bleu2,
           CASE WHEN r_tot2 > 0
                THEN round(CAST(clip2 AS DOUBLE) / CAST(r_tot2 AS DOUBLE), 6)
                END AS rouge2_recall,
           CASE WHEN c_tot2 > 0 AND r_tot2 > 0 THEN
               CASE WHEN (CAST(clip2 AS DOUBLE) / CAST(c_tot2 AS DOUBLE))
                         + (CAST(clip2 AS DOUBLE) / CAST(r_tot2 AS DOUBLE)) > 0
                    THEN round(2.0
                         * (CAST(clip2 AS DOUBLE) / CAST(c_tot2 AS DOUBLE))
                         * (CAST(clip2 AS DOUBLE) / CAST(r_tot2 AS DOUBLE))
                         / ((CAST(clip2 AS DOUBLE) / CAST(c_tot2 AS DOUBLE))
                            + (CAST(clip2 AS DOUBLE) / CAST(r_tot2 AS DOUBLE))),
                         6)
                    ELSE 0.0 END
                END AS rouge2_f1
    FROM m
    """,
    doc="generation-overlap evaluation (BLEU-2 + ROUGE-2 per candidate/"
        "reference pair, quality/eval.py::overlap_eval): clipped modified "
        "n-gram precisions, brevity penalty, ROUGE-2 recall/F1 — the "
        "reference-based eval leg of the LLM-pipeline tier (pairing: odd "
        "doc_id is the candidate for the preceding even doc_id, a fixture "
        "adaptation; production pairs generations with references by key). "
        "One tagged explode (grams never wider than a bigram) + two "
        "map-side-combined groupBys; BLEU-2's geometric mean is "
        "sqrt(p1*p2) so the only transcendental is the brevity-penalty "
        "exp, rounded 6dp (the quality_model_score sigmoid precedent).",
)
def q_generation_overlap_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.quality.eval import overlap_eval

    docs = load_table(spark, sf_dir, "documents")
    # integer division (div), not float-divide-then-truncate: exact past
    # 2^53 and the same operation the oracle's // performs (doc_ids are
    # non-negative by the data contract, where div and // coincide)
    cand = docs.filter(F.col("doc_id") % 2 == 1).select(
        F.expr("doc_id div 2").cast("long").alias("pair_id"),
        F.col("text").alias("cand_text"),
    )
    ref = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.expr("doc_id div 2").cast("long").alias("pair_id"),
        F.col("text").alias("ref_text"),
    )
    return overlap_eval(
        cand.join(ref, "pair_id"), "pair_id", "cand_text", "ref_text"
    )




@register(
    "weighted_sample_per_group",
    oracle="""
    WITH s AS (
        SELECT doc_id, lang, n_chars,
               ROUND(ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                         + 1.0) / 4294967296.0)
                     / CAST(n_chars AS DOUBLE), 9) AS ares
        FROM documents WHERE n_chars > 0
    ),
    r AS (
        SELECT doc_id, lang, n_chars,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY ares DESC, doc_id ASC) AS rn
        FROM s
    )
    SELECT doc_id, lang, n_chars FROM r WHERE rn <= 15
    """,
    doc="weighted reservoir sampling per group (Efraimidis-Spirakis "
        "A-Res): 15 documents per language, inclusion odds scaling "
        "with document length — the corpus-mixing primitive seeded "
        "rand() can't give reproducibly across engines, cluster sizes "
        "or retries.  Each row's uniform comes from the md5-prefix "
        "hash (content-independent, engine-portable), the A-Res key "
        "ln(u)/w rounds to 9 places before ranking (cross-engine "
        "ranking convention), and the plan is scan + ONE "
        "top-k-per-group window (WindowGroupLimit bounds the sort at "
        "k per partition).  The oracle replays hash, key, and rank in "
        "DuckDB exactly.",
)
def q_weighted_sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.relational import (
        weighted_sample_per_group,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    return weighted_sample_per_group(
        docs,
        group_cols=["lang"],
        key_col="doc_id",
        weight_col=F.col("n_chars").cast("double"),
        k=15,
    )


@register(
    "setsim_prefix_join",
    oracle=r"""
    WITH words AS (
        SELECT doc_id AS id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS tk
        FROM documents
    ),
    toks AS (
        SELECT DISTINCT id, t.token
        FROM words,
             unnest(list_distinct(list_transform(range(1, len(tk) - 1),
                 i -> array_to_string(list_slice(tk, i, i + 2), ' '))))
                 AS t(token)
    ),
    sizes AS (SELECT id, COUNT(*) AS sz FROM toks GROUP BY id),
    dfreq AS (SELECT token, COUNT(*) AS df FROM toks GROUP BY token),
    ranked AS (
        SELECT k.id, k.token, s.sz,
               row_number() OVER (PARTITION BY k.id
                                  ORDER BY d.df, k.token) AS rn
        FROM toks k JOIN dfreq d USING (token) JOIN sizes s USING (id)
    ),
    prefix AS (
        SELECT id, token, sz FROM ranked
        WHERE rn <= sz - ((9 * sz + 10 - 1) // 10) + 1
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM prefix a JOIN prefix b USING (token)
        WHERE a.id < b.id
          AND 10 * b.sz >= 9 * a.sz
          AND 10 * a.sz >= 9 * b.sz
    ),
    inter AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS inter
        FROM cand c
        JOIN toks ta ON ta.id = c.id_a
        JOIN toks tb ON tb.id = c.id_b AND tb.token = ta.token
        GROUP BY c.id_a, c.id_b
    )
    SELECT i.id_a, i.id_b, i.inter,
           sa.sz + sb.sz - i.inter AS union_sz
    FROM inter i
    JOIN sizes sa ON sa.id = i.id_a
    JOIN sizes sb ON sb.id = i.id_b
    WHERE 10 * i.inter >= 9 * (sa.sz + sb.sz - i.inter)
    """,
    doc="EXACT set-similarity self-join via prefix filtering (the "
        "AllPairs/PPJoin candidate generation): every document pair "
        "with 3-gram shingle Jaccard >= 9/10 (every doc in the fixture "
        "has >= 10 tokens, so the short-doc shingle fallback never "
        "fires), zero false negatives, no LSH "
        "probabilism and no all-pairs blow-up — candidates must share "
        "a token in their rarest-first PREFIX (len - ceil(t*len) + 1 "
        "tokens under the global (df, token) order), so stop-word "
        "fan-out never enters the join; a rational-arithmetic length "
        "filter and the integer verification den*inter >= num*union "
        "make every decision bit-exact on both engines (a float t*len "
        "compare at a boundary silently drops true pairs).  Three "
        "bare-(id, token) shuffles; text never moves.  Complements "
        "dedup_minhash_lsh (approximate, recall-gated) with the exact "
        "algorithm at the same scale shape.",
)
def q_setsim_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.dedup import setsim_prefix_join

    docs = load_table(spark, sf_dir, "documents")
    return setsim_prefix_join(
        docs, "doc_id", "text", threshold_num=9, threshold_den=10,
        shingle_n=3,
    )


@register(
    "grouped_ols_trend",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               COUNT(*) AS y
        FROM events
        GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(x AS DECIMAL(38,10))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(38,10))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS DECIMAL(38,10)) * CAST(y AS DECIMAL(38,10))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x AS DECIMAL(38,10)) * CAST(x AS DECIMAL(38,10))) AS DOUBLE) AS sxx
        FROM daily GROUP BY 1
    )
    SELECT event_type, n,
           ROUND(CASE WHEN n >= 2 AND n * sxx - sx * sx <> 0
                      THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6)
               AS slope,
           ROUND(CASE WHEN n >= 2 AND n * sxx - sx * sx <> 0
                      THEN (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n END, 6)
               AS intercept
    FROM stats
    """,
    doc="per-group OLS trend via sufficient statistics: daily event "
        "counts per type regressed on day index in ONE map-side-"
        "combinable aggregate (n, Sx, Sy, Sxy, Sxx accumulate in "
        "DECIMAL(38,10) for order-independent sums) plus closed-form "
        "arithmetic — trend-per-key at any scale with no ML runtime; "
        "the shuffle carries group-cardinality rows only.  Degenerate "
        "groups (n < 2, zero x-variance) yield NULL fits.  The oracle "
        "replays the identical closed form in DuckDB; slope and "
        "intercept round to 6 places.",
)
def q_grouped_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.rollup import grouped_ols_trend

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("x"),
    ).agg(F.count(F.lit(1)).alias("y"))
    return grouped_ols_trend(daily, ["event_type"], "x", "y")


@register(
    "substring_dup_spans",
    oracle=r"""
    WITH norm AS (
        SELECT doc_id AS id,
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        FROM documents
    ),
    grams AS (
        SELECT id, t,
               list_transform(range(1, length(t) - 16 + 2),
                   i -> CAST(('0x' || substr(md5(substr(t, i, 16)), 1, 8))
                             AS BIGINT) * 1048576 + i) AS hs
        FROM norm WHERE length(t) >= 16
    ),
    fps AS (
        SELECT id, t,
               list_distinct(list_transform(range(1, len(hs) - 8 + 2),
                   j -> list_aggregate(list_slice(hs, j, j + 7), 'min'))) AS fp
        FROM grams WHERE len(hs) >= 8
    ),
    pts AS (
        SELECT id, t, e.enc // 1048576 AS h, e.enc % 1048576 AS pos
        FROM fps, unnest(fp) AS e(enc)
    ),
    cand AS (
        SELECT a.id AS id_a, b.id AS id_b, a.h
        FROM pts a JOIN pts b ON a.h = b.h AND a.id < b.id
        WHERE substr(a.t, a.pos, 16) = substr(b.t, b.pos, 16)
    )
    SELECT id_a, id_b, COUNT(DISTINCT h) AS shared
    FROM cand GROUP BY id_a, id_b HAVING COUNT(DISTINCT h) >= 3
    """,
    doc="span-level duplicate detection via winnowing fingerprints "
        "(Schleimer/Wilkerson/Aiken SIGMOD'03, the MOSS algorithm): "
        "document pairs sharing >= 3 verified fingerprints, where ANY "
        "shared character span >= k + w - 1 = 23 chars is guaranteed "
        "to produce a shared fingerprint — the contamination/"
        "boilerplate primitive set-level Jaccard and MinHash cannot "
        "see (a copied 40-char licence line barely moves document "
        "similarity).  Gram hashes use the engine-portable md5-prefix "
        "integer; (hash, pos) packs into one bigint so the window "
        "minimum is a plain array_min; fingerprint rows carry their "
        "own k-char gram (with_grams=True), so the hash-keyed "
        "candidate join verifies by gram equality INLINE — no "
        "verification exchange ever carries document text, only "
        "(id, h, 16 chars) (32-bit collision kill).  The "
        "oracle replays selection, verification, and the distinct-"
        "hash count in DuckDB bit-exactly.",
)
def q_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.dedup import substring_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    return substring_dup_pairs(
        docs, "doc_id", "text", k=16, w=8, min_shared=3
    )


@register(
    "winnow_coverage_report",
    oracle=r"""
    WITH norm AS (
        SELECT coalesce(
                 length(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')),
                 0) AS n
        FROM documents
    )
    SELECT CASE WHEN n >= 1048576 THEN 'oversize_quarantined'
                WHEN n < 23 THEN 'too_short'
                ELSE 'fingerprinted' END AS status,
           COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_chars
    FROM norm GROUP BY 1 ORDER BY status
    """,
    doc="span-dedup coverage report (VERDICT r8 ask #8): how every "
        "document routes through winnow_fingerprints — fingerprinted "
        "(guarantee regime), too_short (< k + w - 1 = 23 normalized "
        "chars: no guarantee-length span exists), or "
        "oversize_quarantined (>= the 2^20 position-encoder base: "
        "route through doc_chunking first).  Turns the operator's two "
        "silent exclusion filters into observable counts so corpus "
        "coverage loss is a report number, not vanished rows.  One "
        "projection + a 3-row groupBy.",
)
def q_winnow_coverage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.dedup import winnow_coverage

    docs = load_table(spark, sf_dir, "documents")
    return winnow_coverage(docs, "doc_id", "text")


@register(
    "dp_noisy_counts",
    oracle="""
    WITH g AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1),
    h AS (
        SELECT event_type, n,
               (CAST(('0x' || substr(md5(event_type), 1, 8)) AS BIGINT)
                + 0.5) / 4294967296.0 AS u
        FROM g
    )
    SELECT event_type,
           ROUND(n + (-2.0) * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5)), 6)
               AS noisy_count
    FROM h
    """,
    doc="Laplace-mechanism noisy count release (epsilon = 0.5, "
        "sensitivity 1): per-event-type counts plus inverse-CDF "
        "Laplace(2) noise — the differential-privacy release "
        "primitive.  The noise draw is DETERMINISTIC (md5-derived "
        "uniform per group key): a re-run never re-randomizes, which "
        "is what a correct DP release requires anyway (fresh noise "
        "per query averages away), and what lets the oracle replay "
        "the exact noise; production swaps the hash draw for secure "
        "randomness once and persists.  Counts are one bounded "
        "aggregate; noise is arithmetic on group-cardinality rows.",
)
def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.quality.scoring import (
        laplace_noisy_counts,
    )

    ev = load_table(spark, sf_dir, "events")
    return laplace_noisy_counts(ev, ["event_type"], epsilon=0.5)


@register(
    "token_bigram_pmi",
    oracle=r"""
    WITH toks AS (
        SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> '') AS tk
        FROM documents
    ),
    pairs AS (
        SELECT tk[i] AS tok_a, tk[i + 1] AS tok_b
        FROM toks, unnest(range(1, len(tk))) AS r(i)
        WHERE len(tk) >= 2
    ),
    bi AS (
        SELECT tok_a, tok_b, COUNT(*) AS n_ab FROM pairs GROUP BY 1, 2
    ),
    ua AS (SELECT tok_a, COUNT(*) AS n_a FROM pairs GROUP BY 1),
    ub AS (SELECT tok_b, COUNT(*) AS n_b FROM pairs GROUP BY 1),
    tot AS (SELECT COUNT(*) AS total FROM pairs)
    SELECT b.tok_a, b.tok_b, b.n_ab,
           ROUND(ln(t.total * b.n_ab / (a.n_a * u.n_b)), 6) AS pmi
    FROM bi b
    JOIN ua a USING (tok_a) JOIN ub u USING (tok_b) CROSS JOIN tot t
    WHERE b.n_ab >= 5
    """,
    doc="adjacent-bigram pointwise mutual information (Church & Hanks "
        "collocation mining): PMI = ln(N * c(ab) / (c(a) * c(b))) over "
        "bigram-position marginals, min-count 5 against spurious "
        "rare-pair PMI.  One explode to (tok, next_tok), two "
        "vocabulary-bounded aggregates, two vocabulary-sized joins — "
        "nothing past the token scan scales with corpus size.  Counts "
        "are exact integers; only the final ln is float (rounded 6).",
)
def q_token_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.text import bigram_pmi

    docs = load_table(spark, sf_dir, "documents")
    return bigram_pmi(docs, "text", min_count=5)


@register(
    "image_dedup_ahash",
    oracle="""
    WITH px AS (
        SELECT doc_id AS media_id,
               list_transform(range(0, 64),
                   i -> CASE WHEN i + 1 <= strlen(text)
                             THEN ascii(substr(text, CAST(i + 1 AS INT), 1))
                             ELSE 0 END) AS luma
        FROM documents
    ),
    m AS (SELECT media_id, luma, list_sum(luma) / 64.0 AS mean FROM px),
    hh AS (
        SELECT media_id,
               list_sum(list_transform(range(0, 32),
                   i -> CASE WHEN luma[CAST(i + 1 AS INT)] > mean
                             THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
                             ELSE 0 END)) AS h_lo,
               list_sum(list_transform(range(0, 32),
                   i -> CASE WHEN luma[CAST(i + 33 AS INT)] > mean
                             THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
                             ELSE 0 END)) AS h_hi
        FROM m
    )
    SELECT media_id_a, media_id_b, hamming FROM (
        SELECT a.media_id AS media_id_a, b.media_id AS media_id_b,
               bit_count(xor(a.h_lo, b.h_lo))
                   + bit_count(xor(a.h_hi, b.h_hi)) AS hamming
        FROM hh a JOIN hh b ON a.media_id < b.media_id
    ) WHERE hamming <= 6
    """,
    doc="perceptual-hash image near-dup (aHash + banded Hamming join): "
        "each decoded image's 64 luma pixels threshold against their "
        "mean into a 64-bit fingerprint (two bigint halves — ANSI "
        "forbids bit 63 in one signed fold), and pairs within Hamming "
        "6 surface via EIGHT 8-bit band equi-joins (pigeonhole: d "
        "differing bits CAN touch d bands, so catching distance d "
        "needs >= d+1 bands; 8 bands cover max_hamming <= 7) — the "
        "SimHash "
        "band shape applied to the multimodal column, one "
        "(band, value) shuffle, no all-pairs.  Decode runs once in "
        "the Arrow kernel; the hash and join are pure JVM integer "
        "ops.  The oracle replays the fake decoder's byte arithmetic, "
        "both hash halves, and an all-pairs popcount in DuckDB (500 "
        "docs — the band join is the scale path, the oracle the "
        "semantic spec).",
)
def q_image_dedup_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.multimodal import (
        extract_image_features,
        image_ahash,
        image_neardup_pairs,
    )

    media = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
    )
    # r16/r17: the synthetic blobs here ARE the fixture text (bytes
    # come straight off the scan); spreading them parallelizes the
    # decode + aHash kernels past a single scan split (explicit count:
    # AQE would coalesce it back to one).  CONDITIONAL on an
    # under-split scan (r17, VERDICT r16 #2): nothing downstream needs
    # media_id clustering (near-dup pairs band on hash), so on a
    # multi-split input at real scale this is a no-op — never an
    # unconditional input-sized exchange of all image bytes.
    sc = spark.sparkContext
    if media.rdd.getNumPartitions() < sc.defaultParallelism:
        media = media.repartition(sc.defaultParallelism, "media_id")
    hashes = image_ahash(extract_image_features(media))
    return image_neardup_pairs(hashes, max_hamming=6)


@register(
    "basket_cooccurrence",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey AS b, l_partkey AS item FROM lineitem
    )
    SELECT a.item AS item_a, c.item AS item_b, COUNT(*) AS support
    FROM items a JOIN items c ON a.b = c.b AND a.item < c.item
    GROUP BY 1, 2 HAVING COUNT(*) >= 2
    """,
    doc="market-basket co-occurrence (the candidate-pair stage of "
        "affinity mining): part pairs co-ordered in >= 2 orders, via "
        "ONE basket-keyed self equi-join whose cost is "
        "sum(|basket|^2) — bounded by basket size (~4-7 line items), "
        "never order or part count — then a pair-keyed count.  The "
        "same bounded-quadratic argument as blocked entity matching; "
        "a mega-basket is the skew risk and caps upstream like LSH "
        "buckets.  The oracle replays the join and support floor.",
)
def q_basket_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.rollup import (
        cooccurrence_pairs,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    return cooccurrence_pairs(li, "l_orderkey", "l_partkey", min_support=2)


@register(
    "event_transition_matrix",
    oracle="""
    WITH adj AS (
        SELECT event_type AS state_from,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS state_to
        FROM events
    ),
    counts AS (
        SELECT state_from, state_to, COUNT(*) AS n
        FROM adj WHERE state_to IS NOT NULL GROUP BY 1, 2
    ),
    totals AS (SELECT state_from, SUM(n) AS tot FROM counts GROUP BY 1)
    SELECT c.state_from, c.state_to, c.n, ROUND(c.n / t.tot, 6) AS p
    FROM counts c JOIN totals t USING (state_from)
    """,
    doc="first-order Markov transition matrix over per-user event "
        "streams: ONE user-keyed lag/lead window finds adjacencies "
        "(ties break on event_id — without a tiebreak, same-timestamp "
        "adjacency is partition-order-dependent and unreplayable), "
        "then |states|^2-bounded aggregates and a broadcast row-total "
        "join yield P(next | state).  The behavioral-analytics "
        "primitive between lag_lead_delta and the funnel queries.",
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.rollup import (
        event_transition_matrix,
    )

    ev = load_table(spark, sf_dir, "events")
    return event_transition_matrix(
        ev, "user_id", "ts", "event_type", tiebreak_col="event_id"
    )


@register(
    "time_weighted_average",
    oracle="""
    WITH iv AS (
        SELECT user_id, value,
               date_diff('microsecond', ts,
                   lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)) / 1000000.0 AS dur
        FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id,
           ROUND(CASE WHEN CAST(SUM(CAST(dur AS DECIMAL(38,6))) AS DOUBLE) <> 0
                 THEN CAST(SUM(CAST(value * dur AS DECIMAL(38,6))) AS DOUBLE)
                      / CAST(SUM(CAST(dur AS DECIMAL(38,6))) AS DOUBLE) END, 6)
               AS twap
    FROM iv WHERE dur IS NOT NULL
    GROUP BY user_id
    """,
    doc="time-weighted average of an irregularly-sampled value per "
        "user (TWAP): each purchase value holds until the user's next "
        "purchase, weights are the holding durations, and the "
        "weighted sums accumulate in DECIMAL(38,6) so the aggregate "
        "is order-independent (float sums hash-mismatch across "
        "partitionings).  ONE user-keyed window + one bounded "
        "aggregate; single-observation users drop (no closed "
        "interval).  Ties break on event_id.",
)
def q_time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.rollup import (
        time_weighted_average,
    )

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    return time_weighted_average(
        ev, "user_id", "ts", "value", tiebreak_col="event_id"
    )


@register(
    "streaming_dp_noisy_counts",
    oracle=QUERIES["dp_noisy_counts"].oracle,
    doc="streaming twin of dp_noisy_counts: the per-type counts "
        "accumulate in a REAL 3-micro-batch readStream aggregate "
        "(complete mode, Trigger.AvailableNow) and the Laplace noise "
        "applies as a POST-PROCESSING projection on the released "
        "aggregate — exactly how a DP release composes with "
        "streaming ingestion (noise on the release, never inside the "
        "running state, or the draws would compose across triggers).  "
        "Shares the batch query's oracle verbatim; hash-match proves "
        "cross-batch count state plus the deterministic noise "
        "reproduce the batch answer on in-order input.",
)
def q_streaming_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.quality.scoring import laplace_noise
    from etl_tiki_webscraping_spark.streaming.events import (
        read_events_stream_multibatch,
        run_available_now_to_memory,
    )

    stream = read_events_stream_multibatch(spark, sf_dir, n_batches=3)
    counts = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    released = run_available_now_to_memory(
        counts, "stream_dp_counts", "complete"
    )
    noise = laplace_noise(F.col("event_type").cast("string"), epsilon=0.5)
    return released.select(
        "event_type", F.round(F.col("n") + noise, 6).alias("noisy_count")
    )


# ===========================================================================
# Recognized-benchmark surface: TPC-H queries adapted to the fixture
# schema (dates shifted to the generator's 1995-2001 range; intact
# columns only).  Each runs as a declarative DataFrame plan — Catalyst
# picks broadcast/shuffle strategies — with the standard SQL as its
# DuckDB oracle.
# ===========================================================================

@register(
    "tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 (pricing summary report) on the fixture lineitem: "
        "ONE scan with the ship-date filter pushed to parquet, all "
        "eight aggregates in a single partial+final hash aggregate "
        "over the 6-group key space; sums accumulate in "
        "DECIMAL(38,6) so the answer is order-independent and the "
        "DuckDB oracle (the standard SQL) hash-matches.  The "
        "benchmark's canonical scan-heavy aggregation shape.",
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp")
    )
    dec = lambda c: c.cast("decimal(38,6)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(dec(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
            F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))).cast("double").alias("sum_disc_price"),
            F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")))).cast("double").alias("sum_charge"),
            F.round(F.sum(dec(F.col("l_quantity"))).cast("double") / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(F.sum(dec(F.col("l_extendedprice"))).cast("double") / F.count(F.lit(1)), 6).alias("avg_price"),
            F.round(F.sum(dec(F.col("l_discount"))).cast("double") / F.count(F.lit(1)), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "tpch_q3",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15'
      AND l_shipdate > TIMESTAMP '1997-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 (shipping priority): segment-filtered customers "
        "BROADCAST into orders, the date filters push to both scans, "
        "revenue aggregates per order, and the global top-10 runs as "
        "TakeOrderedAndProject (partition-local top-10, never a full "
        "sort).  l_orderkey joins the tie-break so the limit edge is "
        "deterministic on both engines.",
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
            ).cast("double").alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q5",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 (local supplier volume): the six-table star — "
        "region/nation BROADCAST down the join tree, the "
        "customer-nation = supplier-nation equality rides the "
        "supplier join, date range pushes to the orders scan, and "
        "ONE final aggregate over the 5-nation key space.  The "
        "canonical multi-join shape Catalyst must reorder well.",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
            ).cast("double").alias("revenue")
        )
    )


@register(
    "tpch_q6",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 (forecasting revenue change): pure scan-filter-"
        "aggregate — every predicate pushes to the parquet scan "
        "(PushedFilters carries the date range, discount band, and "
        "quantity cap) and a single global sum in DECIMAL(38,6) "
        "collapses map-side.  The benchmark's selectivity-and-"
        "pushdown probe.",
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(
            (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(38,6)")
        ).cast("double").alias("revenue")
    )


@register(
    "bpe_train_merges",
    oracle=None,  # iterative argmax-per-round — not SQL-expressible;
    # exact parity with a single-node reference BPE is pinned by
    # tests/test_bpe.py on this very fixture
    doc="BPE merge training (Sennrich et al. 2016 — the "
        "tokenizer-learning step of an LLM pipeline): 12 merges "
        "learned from the corpus.  The corpus is scanned ONCE into a "
        "(word, count) vocabulary; when the vocab fits the driver "
        "(<= 2M distinct words — true even for very large corpora) "
        "the merge loop runs driver-local with INCREMENTAL pair-count "
        "deltas (only words containing the chosen pair re-count per "
        "merge): TWO Spark jobs total regardless of num_merges, the "
        "classic trainer shape.  Oversized vocabs fall back to the "
        "distributed per-merge loop (explode + groupBy over "
        "VOCAB-sized rows, single-row argmax collect, JVM-fold "
        "rewrite, localCheckpoint per round).  Both paths are "
        "byte-identical; ties break (count DESC, pair ASC) so the "
        "merge sequence is deterministic — tests pin exact parity "
        "with a textbook single-node implementation on both sides of "
        "the threshold, and a job-count test proves the 256-merge "
        "train stays at O(1) jobs.",
)
def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.bpe import bpe_train_report

    docs = load_table(spark, sf_dir, "documents")
    return bpe_train_report(spark, docs, "text", num_merges=12)


# keyed by (Spark application id, sf_dir): a persisted DataFrame is
# bound to the session that built it, so a session restart within one
# process must rebuild the store instead of probing a dead cache (the
# other index memos store collected rows and are session-free; the
# fingerprint store is too large to collect, so it keys by app)
_WINNOW_BASE_STORE: "dict[tuple[str, str], str]" = {}  # -> parquet path


@register(
    "contamination_new_docs",
    oracle=r"""
    WITH norm AS (
        SELECT doc_id AS id,
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        FROM documents
    ),
    grams AS (
        SELECT id, t,
               list_transform(range(1, length(t) - 16 + 2),
                   i -> CAST(('0x' || substr(md5(substr(t, i, 16)), 1, 8))
                             AS BIGINT) * 1048576 + i) AS hs
        FROM norm WHERE length(t) >= 16
    ),
    fps AS (
        SELECT id, t,
               list_distinct(list_transform(range(1, len(hs) - 8 + 2),
                   j -> list_aggregate(list_slice(hs, j, j + 7), 'min'))) AS fp
        FROM grams WHERE len(hs) >= 8
    ),
    pts AS (
        SELECT id, t, e.enc // 1048576 AS h, e.enc % 1048576 AS pos
        FROM fps, unnest(fp) AS e(enc)
    ),
    cand AS (
        SELECT a.id AS new_id, b.id AS base_id, a.h
        FROM pts a JOIN pts b ON a.h = b.h
        WHERE a.id % 10 = 0 AND b.id % 10 <> 0
          AND substr(a.t, a.pos, 16) = substr(b.t, b.pos, 16)
    )
    SELECT new_id, base_id, COUNT(DISTINCT h) AS shared
    FROM cand GROUP BY new_id, base_id HAVING COUNT(DISTINCT h) >= 1
    """,
    doc="ingest-time span-contamination check (the incremental "
        "consumer of the winnowing index, mirroring "
        "incremental_postings_bm25): a new batch (doc_id % 10 = 0) "
        "probes the BASE corpus's persisted GRAM-CARRYING fingerprint "
        "store — the base is never re-fingerprinted per batch and its "
        "TEXT is not retained at all (the store's k-char grams are "
        "the collision-verification payload) — and any new doc "
        "sharing a verified >= 23-char span with a base doc surfaces "
        "with its shared-fingerprint count.  The decontamination gate "
        "a training pipeline runs on every crawl increment, at "
        "batch x store-match cost.  The oracle replays both sides' "
        "fingerprint selection and the cross-corpus verification.",
)
def q_contamination_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.dedup import (
        contaminated_new_docs,
        winnow_fingerprints,
    )

    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    # the base corpus's fingerprint store is a PERSISTED TABLE in a
    # deployment (appended batch-by-batch; it carries its own k-char
    # grams so the base TEXT is not an input to the probe at all) —
    # written to PARQUET once per process, exactly like the PQ/bloom
    # index builds, so every probe pays only the batch fingerprinting
    # + the store join, never a base re-fingerprint.  A parquet path
    # (not a cached DataFrame) survives the bench's clear-cache policy
    # the way a real warehouse table would — the r12 run where the
    # store was a .persist() handle re-fingerprinted the base corpus
    # on every probe (8.4 s vs ~2 s) because clearCache evicted it.
    store_key = (spark.sparkContext.applicationId, sf_dir)
    store_path = _WINNOW_BASE_STORE.get(store_key)
    if store_path is None:
        import tempfile

        base = docs.filter(F.col("doc_id") % 10 != 0)
        store_path = tempfile.mkdtemp(prefix="winnow-store-") + "/fps"
        winnow_fingerprints(
            base, "doc_id", "text", with_grams=True
        ).write.parquet(store_path)
        _WINNOW_BASE_STORE[store_key] = store_path
    return contaminated_new_docs(
        batch, spark.read.parquet(store_path), "doc_id", "text", min_shared=1
    )


@register(
    "tpch_q10",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    doc="TPC-H Q10 (returned-item reporting): one quarter's returned "
        "line items aggregate revenue per customer, nation BROADCAST, "
        "date + returnflag pushed to the scans, global top-20 as "
        "TakeOrderedAndProject with the customer key as tie-break.",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
            ).cast("double").alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q18",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 150
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY totalprice DESC, o_orderkey LIMIT 50
    """,
    doc="TPC-H Q18 (large-volume customers): the HAVING subquery "
        "becomes a grouped-filter SEMI JOIN gating the orders scan "
        "(never a rescan-per-row correlated form), then the customer "
        "join and per-order quantity rollup feed a top-50 "
        "TakeOrderedAndProject keyed (totalprice DESC, orderkey).",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"], "left_semi")
        .join(li, orders["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double").alias("sum_qty")
        )
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(50)
    )


@register(
    "part_triangles",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey AS b, l_partkey AS item FROM lineitem
    ),
    edges AS (
        SELECT a.item AS u, c.item AS v
        FROM items a JOIN items c ON a.b = c.b AND a.item < c.item
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT e1.u AS a, e1.v AS b, e2.v AS c
    FROM edges e1
    JOIN edges e2 ON e1.v = e2.u
    JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
    doc="triangle enumeration over the part-affinity graph (edges = "
        "basket_cooccurrence at support >= 2): the canonical "
        "bounded-shuffle graph-mining join — node ordering u < v < w "
        "means each triangle materializes EXACTLY once and the "
        "wedge-closing join never mirrors, so cost is "
        "sum(deg(v)^2 / 2) over the ORDERED adjacency, the textbook "
        "distributed triangle bound.  Two edge-keyed equi-joins, no "
        "cartesian (plan-audited).",
)
def q_part_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.rollup import (
        cooccurrence_pairs,
    )

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = cooccurrence_pairs(li, "l_orderkey", "l_partkey", min_support=2).select(
        F.col("item_a").alias("u"), F.col("item_b").alias("v")
    )
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = edges.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = edges.select(F.col("u").alias("a"), F.col("v").alias("c"))
    return (
        e1.join(e2, "b")
        .join(e3, ["a", "c"], "left_semi")
        .select("a", "b", "c")
    )


@register(
    "embedding_dim_stats",
    oracle="""
    WITH e AS (SELECT embedding FROM embeddings)
    SELECT i AS dim,
           ROUND(CAST(SUM(CAST(CAST(embedding[i + 1] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
                 / COUNT(*), 9) AS mean_val,
           ROUND(sqrt(
               CAST(SUM(CAST(CAST(embedding[i + 1] AS DOUBLE)
                             * CAST(embedding[i + 1] AS DOUBLE)
                             AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*)
               - pow(CAST(SUM(CAST(CAST(embedding[i + 1] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
                     / COUNT(*), 2)
           ), 6) AS std_val
    FROM e, unnest(range(0, 64)) AS r(i)
    GROUP BY i
    """,
    doc="per-dimension mean and population std over the embedding "
        "column (the feature-standardization stats a vector pipeline "
        "broadcasts before z-scoring): ONE posexplode + groupBy(dim) "
        "whose shuffle cardinality is d, with both moments "
        "accumulated in DECIMAL(38,12) for order-independent sums — "
        "mean rounds to 9, std (a sqrt of a difference, ulp-"
        "amplifying) to 6.  The relational twin of embedding_pca's "
        "Gram pass.",
)
def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    vals = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v")
    )
    dec = F.col("v").cast("decimal(38,12)")
    dec2 = (F.col("v") * F.col("v")).cast("decimal(38,12)")
    return (
        vals.groupBy("dim")
        .agg(
            F.round(F.sum(dec).cast("double") / F.count(F.lit(1)), 9).alias("mean_val"),
            F.round(
                F.sqrt(
                    F.sum(dec2).cast("double") / F.count(F.lit(1))
                    - F.pow(F.sum(dec).cast("double") / F.count(F.lit(1)), 2)
                ),
                6,
            ).alias("std_val"),
        )
    )


@register(
    "weighted_median_price",
    oracle="""
    WITH pos AS (
        SELECT l_returnflag, l_extendedprice AS v,
               CAST(l_quantity AS DECIMAL(38,6)) AS w
        FROM lineitem WHERE l_quantity > 0
    ),
    m AS (
        SELECT l_returnflag, v,
               SUM(w) OVER (PARTITION BY l_returnflag
                            ORDER BY v ASC, w DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cum,
               SUM(w) OVER (PARTITION BY l_returnflag) AS tot
        FROM pos
    )
    SELECT l_returnflag, MIN(v) AS wmedian
    FROM m WHERE cum * 2 >= tot GROUP BY l_returnflag
    """,
    doc="exact weighted median line price per return flag, quantity-"
        "weighted (operators/relational.py::weighted_median): one "
        "group-keyed window accumulates the running weight in "
        "DECIMAL(38,6) — order-exact, so the crossing row cannot "
        "drift across partitionings — and a min-over-qualifying "
        "aggregate picks the smallest value whose cumulative weight "
        "reaches half the total.  Ties inside a value block cannot "
        "change the block-end cumulative, so the median is "
        "deterministic; both engines replay identically.",
)
def q_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.relational import (
        weighted_median,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").alias("w"),
    )
    return weighted_median(li, ["l_returnflag"], "v", "w").select(
        "l_returnflag", "wmedian"
    )


@register(
    "entity_resolution_clusters",
    oracle="""
    WITH RECURSIVE edges AS (
        SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
        FROM customer a JOIN customer b
          ON a.c_nationkey = b.c_nationkey
         AND a.c_mktsegment = b.c_mktsegment
         AND a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 2
    ),
    undirected AS (
        SELECT id_a AS src, id_b AS dst FROM edges
        UNION SELECT id_b, id_a FROM edges
    ),
    reach AS (
        SELECT src AS id, src AS lbl FROM undirected
        UNION
        SELECT u.dst, r.lbl FROM reach r JOIN undirected u ON u.src = r.id
    ),
    comp AS (SELECT id, MIN(lbl) AS entity_id FROM reach GROUP BY id)
    SELECT c.c_custkey,
           CAST(coalesce(p.entity_id, c.c_custkey) AS BIGINT) AS entity_id
    FROM customer c LEFT JOIN comp p ON p.id = c.c_custkey
    """,
    doc="end-to-end entity resolution: blocked fuzzy match pairs "
        "(entity_match_blocked's exact plan) feed connected components "
        "(the dedup clustering operator), so transitive chains of "
        "near-identical customer records collapse into ONE entity id "
        "(min member key); unmatched records are their own entity.  "
        "The match-then-cluster composition every MDM pipeline runs; "
        "the oracle recomputes components with a recursive "
        "reachability CTE — the distributed min-label contraction is "
        "exactly equivalent.",
)
def q_entity_resolution_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.dedup import (
        connected_components,
    )
    from etl_tiki_webscraping_spark.operators.relational import (
        blocked_entity_match,
    )

    cust = load_table(spark, sf_dir, "customer")
    # same cap-64 + deletion_join config as entity_match_blocked: the
    # sf10 probe showed the plain block self-join exploding 10,000x at
    # 100x data (block-key cardinality is constant in table size);
    # routing fat blocks through the exact deletion-neighborhood join
    # keeps the identical edge set at near-linear cost
    edges = blocked_entity_match(
        cust, "c_custkey", "c_name",
        ["c_nationkey", "c_mktsegment"], max_distance=2,
        max_block_rows=64, overflow="deletion_join",
    ).select(F.col("a_id").alias("id_a"), F.col("b_id").alias("id_b"))
    comps = connected_components(edges)
    return (
        cust.select("c_custkey")
        .join(
            comps.select(
                F.col("id").alias("c_custkey"),
                F.col("component").alias("entity_id"),
            ),
            "c_custkey",
            "left",
        )
        .select(
            "c_custkey",
            F.coalesce("entity_id", F.col("c_custkey")).alias("entity_id"),
        )
    )


@register(
    "corpus_pipeline_v2",
    oracle=r"""
    WITH feats AS (
        SELECT doc_id, lang, n_chars, text,
               CAST(length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS DOUBLE)
                   / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio,
               CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                        t -> t IN ('the','and','of','to','in','is','it','that','for','with'))) AS DOUBLE)
                   / CAST(greatest(len(string_split_regex(lower(trim(text)), '\s+')), 1) AS DOUBLE)
                   AS stopword_ratio,
               ln(1.0 + len(list_filter(string_split_regex(trim(text), '\s+'),
                                        t -> t <> ''))) AS log_tokens
        FROM documents
    ),
    scored AS (
        SELECT doc_id, lang, n_chars, text,
               (-0.8) + 0.55 * log_tokens + (-2.1) * punct_ratio
                      + 3.0 * stopword_ratio AS z
        FROM feats
    ),
    kept AS (
        SELECT doc_id, lang, n_chars, text
        FROM scored
        WHERE (CASE WHEN z >= 0 THEN 1.0 / (1.0 + exp(-abs(z)))
                    ELSE 1.0 - 1.0 / (1.0 + exp(-abs(z))) END) >= 0.5
    ),
    sampled AS (
        SELECT doc_id, lang, n_chars, text,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY ROUND(ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                                      + 1.0) / 4294967296.0)
                                  / CAST(n_chars AS DOUBLE), 9) DESC,
                            doc_id ASC) AS rn
        FROM kept WHERE n_chars > 0
    ),
    survivors AS (
        SELECT s.doc_id, s.lang, s.n_chars
        FROM sampled s
        JOIN (
            SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h,
                   MIN(doc_id) AS doc_id
            FROM sampled WHERE rn <= 20 GROUP BY 1
        ) k ON k.doc_id = s.doc_id
        WHERE s.rn <= 20
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM survivors GROUP BY lang
    """,
    doc="corpus-curation capstone v2, chaining THIS round's operators "
        "end-to-end: classifier scoring (keep score >= 0.5) -> "
        "weighted reservoir sample (20 docs/lang, length-weighted "
        "A-Res) -> exact content dedup (lowest-id survivor per "
        "normalized text) -> per-language size report.  Every stage "
        "is the same code path as its standalone query "
        "(quality_model_score, weighted_sample_per_group, "
        "dedup_exact_text); the oracle replays the whole chain in one "
        "SQL pipeline — composition is where silent contract "
        "mismatches between stages would surface.",
)
def q_corpus_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
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

    docs = load_table(spark, sf_dir, "documents")
    score = linear_model_score(
        {
            "punct_ratio": punct_ratio("text"),
            "stopword_ratio": stopword_ratio("text"),
            "log_tokens": F.log(F.lit(1.0) + token_count("text")),
        },
        weights={"log_tokens": 0.55, "punct_ratio": -2.1, "stopword_ratio": 3.0},
        bias=-0.8,
    )
    kept = docs.withColumn("_s", score).filter(F.col("_s") >= 0.5).drop("_s")
    sampled = weighted_sample_per_group(
        kept,
        group_cols=["lang"],
        key_col="doc_id",
        weight_col=F.col("n_chars").cast("double"),
        k=20,
    )
    survivors = exact_dedup(sampled, "text", "doc_id")
    return survivors.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@register(
    "tpch_q14",
    oracle="""
    SELECT ROUND(
        100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount)
                         ELSE 0 END AS DECIMAL(38,6))) AS DOUBLE)
              / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(38,6))) AS DOUBLE), 6)
        AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-02-01'
    """,
    doc="TPC-H Q14 (promotion effect): one month's line items join "
        "the part dimension — BROADCAST, the fact side never shuffles "
        "— and a single conditional/unconditional sum pair in "
        "DECIMAL(38,6) yields the promo revenue share.  The "
        "broadcast-join + conditional-aggregate archetype.",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)).cast("decimal(38,6)")
                ).cast("double")
                / F.sum(rev.cast("decimal(38,6)")).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "zscore_outlier_report",
    oracle="""
    WITH stats AS (
        SELECT o_orderpriority AS prio,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE)
                   / COUNT(*) AS mu,
               sqrt(CAST(SUM(CAST(o_totalprice * o_totalprice
                                  AS DECIMAL(38,8))) AS DOUBLE) / COUNT(*)
                    - pow(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE)
                          / COUNT(*), 2)) AS sigma
        FROM orders GROUP BY 1
    )
    SELECT o.o_orderkey, s.prio,
           ROUND((CAST(o.o_totalprice AS DOUBLE) - s.mu) / s.sigma, 4) AS z
    FROM orders o JOIN stats s ON o.o_orderpriority = s.prio
    WHERE s.sigma > 0
      AND abs((CAST(o.o_totalprice AS DOUBLE) - s.mu) / s.sigma) > 1.65
    """,
    doc="grouped z-score outlier report (the detection sibling of "
        "winsorize_clip, which CLIPS): per-priority mean and "
        "population sigma from one bounded aggregate with "
        "DECIMAL(38,8) moment accumulation, then the group stats "
        "BROADCAST back onto the scan and the |z| > 1.65 filter runs "
        "in codegen — two passes over the fact, zero fact-side "
        "shuffles.  z rounds to 4 (a sigma-division amplifies ulp; "
        "the round also keeps the cut away from the boundary; the threshold sits at 1.65 because the fixture's totalprice is uniform — max attainable |z| is sqrt(3), so a classic 3-sigma cut can never fire on this data).  "
        "Zero-variance groups are excluded rather than dividing by "
        "zero.",
)
def q_zscore_outlier_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").alias("v"),
    )
    dec = F.col("v").cast("decimal(38,8)")
    dec2 = (F.col("v") * F.col("v")).cast("decimal(38,8)")
    stats = orders.groupBy("prio").agg(
        (F.sum(dec).cast("double") / F.count(F.lit(1))).alias("mu"),
        F.sqrt(
            F.sum(dec2).cast("double") / F.count(F.lit(1))
            - F.pow(F.sum(dec).cast("double") / F.count(F.lit(1)), 2)
        ).alias("sigma"),
    ).filter(F.col("sigma") > 0)
    z = (F.col("v").cast("double") - F.col("mu")) / F.col("sigma")
    return (
        orders.join(F.broadcast(stats), "prio")
        .filter(F.abs(z) > 1.65)
        .select("o_orderkey", "prio", F.round(z, 4).alias("z"))
    )


@register(
    "tpch_q17",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0
               AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23' AND p_size <= 10
      AND l_quantity < (
        SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                      / COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    doc="TPC-H Q17 (small-quantity-order revenue; reference star "
        "schema sql/dwh.sql:28 consumers hit this correlated-AVG "
        "shape): the per-part correlated scalar AVG subquery "
        "DECORRELATES to aggregate-then-join — ONE groupBy(l_partkey) "
        "computes every part's average once (decimal-exact sum / "
        "count, so Spark and the oracle see the identical double), "
        "then joins back on the same l_partkey partitioning; the "
        "brand/size part filter broadcasts into the lineitem scan "
        "first so the aggregate only touches qualifying parts.  A "
        "naive planner rescans lineitem per outer row — here lineitem "
        "is read ONCE for the filter side and ONCE for the aggregate, "
        "both pruned to 3 columns.  Predicates adapted to the "
        "fixture's part columns (p_brand/p_size; no p_container).",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pf = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 10))
        .select("p_partkey")
    )
    li_f = li.join(
        F.broadcast(pf), li["l_partkey"] == pf["p_partkey"]
    ).drop("p_partkey")
    avg_qty = li_f.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        li_f.join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double")
                / 7.0
            ).alias("avg_yearly")
        )
    )


@register(
    "tpch_q21",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE o_orderstatus = 'F' AND l1.l_shipdate >= TIMESTAMP '1999-01-01'
      AND r_name = 'EUROPE'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate >= TIMESTAMP '1999-01-01')
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
    """,
    doc="TPC-H Q21 (suppliers who kept orders waiting): the nested "
        "EXISTS / NOT EXISTS chain — the canonical decorrelation "
        "stress shape — rewrites to ONE per-order aggregate: "
        "countDistinct(supplier) and countDistinct(LATE supplier) per "
        "order, then EXISTS(other supplier) == n_supp >= 2 and "
        "NOT EXISTS(other late supplier) == n_late_supp = 1 (the late "
        "outer row itself is that one).  lineitem is scanned exactly "
        "TWICE (outer late lines + the aggregate) instead of the "
        "naive three correlated rescans, the qualifying-order set "
        "gates through semi joins, and the supplier/nation/region dim "
        "stack broadcasts.  'Late' adapts to the fixture's columns "
        "(shipdate cutoff; no receipt/commit dates).",
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1999-01-01").cast("timestamp")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") >= cutoff
    ord_stats = (
        li.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .select("l_orderkey")
    )
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(region, nation["n_regionkey"] == region["r_regionkey"])
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        li.filter(late)
        .join(orders_f, li["l_orderkey"] == orders_f["o_orderkey"], "left_semi")
        .join(ord_stats, "l_orderkey", "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@register(
    "tpch_q20",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                 AS ps_availqty
      FROM lineitem GROUP BY 1, 2
    )
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND s_suppkey IN (
        SELECT ps_suppkey FROM ps
        WHERE ps_partkey IN (SELECT p_partkey FROM part
                             WHERE p_name LIKE 'small%')
          AND ps_availqty > (
            SELECT 0.5 * CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
            FROM lineitem
            WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
              AND l_shipdate >= TIMESTAMP '1998-01-01'
              AND l_shipdate < TIMESTAMP '1999-01-01'))
    ORDER BY s_name
    """,
    doc="TPC-H Q20 (potential part promotion): nested IN with a "
        "correlated aggregate.  The availability relation derives "
        "from lineitem (the fixture carries no partsupp table) with "
        "ONE groupBy(part, supplier); the correlated half-year "
        "quantity SUM decorrelates to a second, date-filtered "
        "aggregate on the SAME (l_partkey, l_suppkey) keys — the two "
        "aggregates co-partition, so their join adds no exchange.  "
        "The part-name IN-list broadcasts as a semi join before the "
        "aggregate, the qualifying supplier set gates supplier "
        "through a semi join, and nation/region broadcast.  An "
        "absent half-year sum means the correlated subquery returns "
        "NULL and the > comparison fails — inner-join semantics, "
        "identical in both engines.",
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li_p = li.join(
        F.broadcast(parts), li["l_partkey"] == parts["p_partkey"], "left_semi"
    )
    ps = li_p.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(38,6)"))
        .cast("double")
        .alias("ps_availqty")
    )
    half = (
        li_p.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            (
                0.5
                * F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double")
            ).alias("half_qty")
        )
    )
    qual_supp = (
        ps.join(half, ["l_partkey", "l_suppkey"])
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select("l_suppkey")
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(region, nation["n_regionkey"] == region["r_regionkey"])
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            qual_supp, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "tpch_q2",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(l_extendedprice / l_quantity) AS ps_supplycost
      FROM lineitem GROUP BY 1, 2
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
           CAST(ps_supplycost AS DOUBLE) AS supplycost
    FROM part
    JOIN ps ON p_partkey = ps_partkey
    JOIN supplier ON s_suppkey = ps_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_size = 15 AND r_name = 'EUROPE'
      AND ps_supplycost = (
        SELECT MIN(ps2.ps_supplycost)
        FROM ps ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
    doc="TPC-H Q2 (minimum-cost supplier): correlated scalar MIN.  "
        "The supply-cost relation derives from lineitem (no partsupp "
        "in the fixture; min unit price per part x supplier — IEEE "
        "double division, bit-identical in both engines).  The "
        "correlated per-part MIN over region-gated suppliers "
        "DECORRELATES to aggregate-then-join: the region-filtered "
        "(part, supplier, cost) stream is computed ONCE, a "
        "groupBy(part) takes each part's min, and the equality "
        "becomes a same-key equi-join + filter — the p_size part "
        "filter semi-joins the stream FIRST so both the aggregate "
        "and the final join only carry qualifying parts.  The "
        "supplier/nation/region stack (100 rows) broadcasts; top-100 "
        "is TakeOrderedAndProject on the 4-key tie-broken sort.",
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    parts15 = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") == 15)
        .select("p_partkey", "p_type")
    )
    li_p = li.join(
        F.broadcast(parts15.select("p_partkey")),
        li["l_partkey"] == parts15["p_partkey"],
        "left_semi",
    )
    ps = li_p.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost")
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur_supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(region, nation["n_regionkey"] == region["r_regionkey"])
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps_eur = ps.join(
        F.broadcast(eur_supp), ps["l_suppkey"] == eur_supp["s_suppkey"]
    )
    min_cost = ps_eur.groupBy("l_partkey").agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        ps_eur.join(min_cost, "l_partkey")
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .join(F.broadcast(parts15), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.col("ps_supplycost").alias("supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# Pinned merge table for the encode query — a DEPLOYED tokenizer is a
# fixed artifact applied unchanged to new data (training it is
# bpe_train_merges above); these 16 merges are the trainer's exact
# output on the sf0.001 documents fixture (asserted by
# tests/test_bpe.py::test_pinned_merges_are_the_trainers_output) and
# are frozen here so the oracle replays the encode byte-for-byte at
# any scale factor.
_BPE_PINNED_MERGES: "list[tuple[int, str, str]]" = [
    (0, "e", "r"), (1, "o", "r"), (2, "i", "n"), (3, "o", "w"),
    (4, "s", "t"), (5, "l", "u"), (6, "a", "r"), (7, "p", "ar"),
    (8, "m", "er"), (9, "a", "t"), (10, "a", "n"), (11, "c", "an"),
    (12, "s", "can"), (13, "c", "o"), (14, "co", "lu"), (15, "colu", "m"),
]


def _bpe_encode_oracle() -> str:
    """Generate the encode oracle from the pinned merge table: greedy
    BPE merge application == chained non-overlapping literal replace
    on the stream where EVERY symbol is wrapped chr(30)..chr(31)
    (operators/bpe.py::_bpe_wrapped_col — full wrappers, not bare
    separators, so a replace can only match whole adjacent symbols),
    so the whole encode replays in ANSI SQL — one replace per merge,
    in rank order; token count = OPEN markers."""
    e = (
        "array_to_string(list_transform("
        "string_split(replace(replace(word, chr(31), ''), chr(30), ''), ''),"
        " c -> chr(30) || c || chr(31)), '')"
    )
    for _, left, right in _BPE_PINNED_MERGES:
        e = (
            f"replace({e}, chr(30) || '{left}' || chr(31) || chr(30) || "
            f"'{right}' || chr(31), chr(30) || '{left}{right}' || chr(31))"
        )
    return f"""
    WITH words AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
        FROM documents
    ),
    enc AS (
        SELECT doc_id, {e} AS e FROM words WHERE word <> ''
    )
    SELECT doc_id, COUNT(*) AS n_words,
           CAST(SUM(length(e) - length(replace(e, chr(30), '')))
                AS BIGINT) AS n_tokens
    FROM enc GROUP BY doc_id
    """


@register(
    "bpe_encode_corpus",
    oracle=_bpe_encode_oracle(),
    doc="BPE corpus encode (VERDICT r8 ask #3 — the other half of the "
        "tokenizer loop bpe_train_merges opened): per-document word "
        "and token counts under the pinned 16-merge table learned by "
        "the trainer from this corpus.  Greedy merge application is "
        "EXACTLY non-overlapping left-to-right literal replace of "
        "'l<SEP>r'->'lr' on the separator-joined symbol string, so "
        "the encode runs as chained JVM codegen string replaces on "
        "the exploded word stream — no Python, no join, and the ONE "
        "exchange is the map-side-combined groupBy(doc_id) carrying "
        "(id, two bigints).  The oracle replays the identical replace "
        "chain in DuckDB (operators/bpe.py::bpe_encode_col documents "
        "the equivalence; parity with a single-node fold encode is "
        "unit-tested in tests/test_bpe.py).",
)
def q_bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.bpe import bpe_encode_corpus

    docs = load_table(spark, sf_dir, "documents")
    return bpe_encode_corpus(docs, "doc_id", "text", _BPE_PINNED_MERGES)


@register(
    "tokenizer_fertility_by_lang",
    oracle=(lambda _enc=_bpe_encode_oracle(): f"""
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(e.n_words) AS BIGINT) AS n_words,
           CAST(SUM(e.n_tokens) AS BIGINT) AS n_tokens,
           round(CAST(SUM(e.n_tokens) AS DOUBLE)
                 / CAST(SUM(e.n_words) AS DOUBLE), 6) AS fertility
    FROM ({_enc}) e JOIN documents d USING (doc_id)
    GROUP BY 1
    """)(),
    doc="tokenizer fertility report (tokens per word under the pinned "
        "BPE merge table, grouped by language): the standard tokenizer-"
        "coverage diagnostic for a multilingual corpus — languages the "
        "merges were not trained on show higher fertility, which is how "
        "a production pipeline decides when a tokenizer needs retraining "
        "or a bigger vocab.  Composes the oracle-green bpe_encode_corpus "
        "(chained codegen replaces, one map-side-combined groupBy) with "
        "one broadcast-sized lang join; the oracle wraps the SAME encode "
        "replay SQL and aggregates identically.  Docs with zero words "
        "drop out of the encode on both engines (no row, not a zero).",
)
def q_tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.bpe import bpe_encode_corpus

    docs = load_table(spark, sf_dir, "documents")
    enc = bpe_encode_corpus(docs, "doc_id", "text", _BPE_PINNED_MERGES)
    return (
        enc.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_tokens").alias("n_tokens"),
            F.round(
                F.sum("n_tokens").cast("double") / F.sum("n_words").cast("double"), 6
            ).alias("fertility"),
        )
    )


@register(
    "unigram_train",
    oracle=None,  # iterative EM — not SQL-expressible; exact parity
    # with a single-node replay is gated (tools/gates_report.py +
    # tests/test_unigram.py, the bpe_train_merges pattern)
    doc="unigram-LM (SentencePiece-style, Kudo 2018) tokenizer "
        "training — BPE's sibling and round-11 VERDICT ask #6: "
        "substring-seed candidates (distributed explode + groupBy over "
        "the WORD VOCABULARY, the suffix-array enumeration's "
        "distributed equivalent), then hard-EM where each iteration "
        "Viterbi-segments every vocab word in ONE Arrow kernel "
        "(piece table in the closure) and re-estimates piece "
        "log-probs from a piece-table-sized groupBy; final prune to "
        "vocab_size with single-char coverage.  All scores are exact "
        "integers (1e-6-unit log-probs, (score, -ntok) packed into "
        "one bigint), so the trained table drives the SQL-replayable "
        "encode below.  Corpus size touches only the vocab-building "
        "scan; EM cost is vocab-bounded.",
)
def q_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.unigram import (
        unigram_train_report,
    )

    docs = load_table(spark, sf_dir, "documents")
    return unigram_train_report(spark, docs, "text")


# Pinned unigram piece table for the encode query — a DEPLOYED
# tokenizer artifact (training it is unigram_train above); this is the
# trainer's exact output on the sf0.001 documents fixture (asserted by
# tests/test_unigram.py::test_pinned_pieces_are_the_trainers_output)
# frozen so the oracle replays the encode at any scale factor.
_UNIGRAM_PINNED: "list[tuple[str, int]]" = [
    ("a", -3806233), ("agg", -3783951), ("b", -10643566),
    ("batc", -3830121), ("big", -3852345), ("c", -10643566),
    ("co", -3758056), ("cust", -3853469), ("d", -10643566),
    ("data", -3845626), ("dup", -7276270), ("e", -2710128),
    ("er", -3822459), ("f", -10643566), ("fast", -3826830),
    ("filt", -3822459), ("g", -3803019), ("h", -3829023),
    ("hash", -3815937), ("i", -10643566), ("j", -10643566),
    ("join", -3801951), ("k", -10643566), ("key", -3792381),
    ("l", -10643566), ("line", -3791323), ("lumn", -3758056),
    ("m", -10643566), ("mall", -3843396), ("merg", -3803019),
    ("n", -10643566), ("o", -10643566), ("omer", -3853469),
    ("or", -3807307), ("orde", -3761129), ("ow", -3760103),
    ("p", -10643566), ("park", -3830121), ("part", -3773513),
    ("q", -10643566), ("quer", -3804090), ("r", -3760103),
    ("ream", -3820280), ("roup", -3804090), ("row", -3879681),
    ("s", -3143037), ("scan", -3751940), ("slow", -3818106),
    ("sort", -3762155), ("st", -3820280), ("t", -10643566),
    ("tabl", -3837843), ("the", -3830121), ("u", -10643566),
    ("v", -10643566), ("valu", -3787104), ("vect", -3807307),
    ("w", -10643566), ("wind", -3760103), ("y", -3803019),
]


def _unigram_encode_oracle(max_piece_len: int = 4, max_word_len: int = 20) -> str:
    """Generate the encode oracle: the EXACT integer Viterbi DP
    unrolled over character positions — dp_k = MAX over the last
    <= max_piece_len positions of dp_j + 64*lp(piece) - 1, pieces as a
    VALUES table from the pinned artifact, fallback ntok = word length
    for unreachable / over-long words.  Pure generated ANSI SQL, no
    recursion (a recursive CTE cannot take a per-step argmax)."""
    pieces_values = ", ".join(
        "('{}', {})".format(p.replace("'", "''"), u)
        for p, u in _UNIGRAM_PINNED
    )
    # every CTE is MATERIALIZED: DuckDB inlines plain CTEs per
    # reference, and the dp chain references each predecessor up to
    # max_piece_len times — un-materialized that inlines exponentially
    # (the first attempt died on file handles re-opening the parquet)
    ctes = [
        f"up(piece, lp) AS MATERIALIZED (VALUES {pieces_values})",
        r"""ut AS MATERIALIZED (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(coalesce(text, '')),
                                                     '\s+'), x -> x <> '')) AS word
        FROM documents
    )""",
        f"uw AS MATERIALIZED (SELECT DISTINCT word FROM ut WHERE length(word) <= {max_word_len})",
        "dp0 AS MATERIALIZED (SELECT word, CAST(63 AS BIGINT) AS v FROM uw)",
    ]
    for k in range(1, max_word_len + 1):
        branches = [
            f"SELECT d.word, d.v + 64 * p.lp - 1 AS v "
            f"FROM dp{j} d JOIN up p ON p.piece = substr(d.word, {j + 1}, {k - j}) "
            f"WHERE length(d.word) >= {k}"
            for j in range(max(0, k - max_piece_len), k)
        ]
        ctes.append(f"cand{k} AS ({' UNION ALL '.join(branches)})")
        ctes.append(
            f"dp{k} AS MATERIALIZED "
            f"(SELECT word, MAX(v) AS v FROM cand{k} GROUP BY word)"
        )
    joins = " ".join(
        f"LEFT JOIN dp{k} d{k} ON d{k}.word = w.word AND length(w.word) = {k}"
        for k in range(1, max_word_len + 1)
    )
    vexpr = "COALESCE(" + ", ".join(
        f"d{k}.v" for k in range(1, max_word_len + 1)
    ) + ")"
    ctes.append(
        f"""untok AS MATERIALIZED (
        SELECT w.word,
               CASE WHEN {vexpr} IS NULL THEN CAST(length(w.word) AS BIGINT)
                    ELSE 63 - ({vexpr} - 64 * CAST(floor({vexpr} / 64.0) AS BIGINT))
               END AS nt
        FROM uw w {joins}
    )"""
    )
    return (
        "WITH " + ",\n    ".join(ctes) + """
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(COALESCE(n.nt, length(t.word))) AS BIGINT) AS n_tokens
    FROM ut t LEFT JOIN untok n ON n.word = t.word
    GROUP BY t.doc_id
    """
    )


@register(
    "unigram_encode_corpus",
    oracle=_unigram_encode_oracle(),
    doc="corpus tokenization under the DEPLOYED unigram piece table "
        "(the artifact unigram_train learns): per-document (n_words, "
        "n_tokens) via exact integer Viterbi — bpe_encode_corpus's "
        "sibling.  Plan: the corpus explodes to words, the DISTINCT "
        "word vocabulary Viterbi-encodes once per word in an Arrow "
        "kernel, token counts BROADCAST back onto the word stream, "
        "and one map-side-combinable groupBy(id) carries (doc_id, two "
        "bigints) — text never enters an exchange twice.  The oracle "
        "replays the DP exactly: scores are integer-packed "
        "(64*score_units + 63 - ntok), so the generated SQL's "
        "unrolled position-DP is bit-identical, including the "
        "one-token-per-char fallback for over-long or unreachable "
        "words.",
)
def q_unigram_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.unigram import (
        unigram_encode_corpus,
    )

    docs = load_table(spark, sf_dir, "documents")
    return unigram_encode_corpus(docs, "doc_id", "text", _UNIGRAM_PINNED)


# ===========================================================================
# TPC-H completion set (round 9): the 11 queries that finish the full
# 22-query suite over the fixture star schema (reference consumers of
# sql/dwh.sql:28,44 write exactly these shapes).  Fixture adaptations
# are per-query documented: no partsupp table (derived from lineitem
# like tpch_q2/q20), no l_shipmode/l_commitdate/l_receiptdate ("late"
# = shipped long after order date), no c_phone (nation key plays the
# country code).  Every oracle is standard SQL; decimal-exact sums
# keep doubles bit-identical across engines.


@register(
    "tpch_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 (order priority checking): the correlated EXISTS "
        "decorrelates to ONE left-semi hash join — orders keep their "
        "quarter filter pushed to the scan, lineitem prunes to two "
        "columns, and the extra correlated inequality (shipped > 60 "
        "days after order date — the fixture's 'late' stand-in for "
        "commitdate < receiptdate) rides the semi join as a residual "
        "condition, never a nested loop.  ONE final aggregate over "
        "the 5-priority key space.",
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders["o_orderkey"] == li["l_orderkey"])
            & (li["l_shipdate"]
               > orders["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q7",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume_d) AS DOUBLE) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
                 CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(38,6)) AS volume_d
          FROM supplier
          JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
              OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01') shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 (volume shipping between two nations): nation "
        "appears TWICE (supplier side and customer side) — both "
        "copies pre-filter to the two named nations and BROADCAST, "
        "so the disjunctive cross-pair predicate evaluates over a "
        "2x2 space as a residual filter, never a cartesian.  The "
        "two-year ship-date range pushes to the lineitem scan and "
        "ONE final aggregate covers the (2 x 2 x 2-year) key space.  "
        "Nation pair chosen to have suppliers at every fixture "
        "scale (sf0.001 staffs only 10 suppliers).",
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    the_two = ["NATION_3", "NATION_8"]
    n1 = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(the_two)
    ).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(the_two)
    ).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate",
             "l_extendedprice", "l_discount")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp.join(n1, supp["s_nationkey"] == n1["n1_key"])),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == the_two[0]) & (F.col("cust_nation") == the_two[1]))
            | ((F.col("supp_nation") == the_two[1]) & (F.col("cust_nation") == the_two[0]))
        )
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
            ).cast("double").alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8",
    oracle="""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                               THEN volume_d ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(volume_d) AS DOUBLE), 6) AS mkt_share
    FROM (SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                 CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(38,6)) AS volume_d,
                 n1.n_name AS supp_nation
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          JOIN region ON n2.n_regionkey = r_regionkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1998-01-01') all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8 (national market share): the eight-table star — "
        "part (type filter), supplier+nation, customer+nation+region "
        "(market filter) ALL broadcast into the lineitem-orders "
        "spine; market share is one conditional aggregate (share of "
        "the named supplier nation within the ASIA-customer volume), "
        "NOT two passes.  Both sums accumulate DECIMAL(38,6) so the "
        "double division is bit-identical on both engines; ROUND(6) "
        "pins the printed edge.",
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    asia_cust = cust.join(
        F.broadcast(
            n2.join(region, n2["n_regionkey"] == region["r_regionkey"])
        ),
        F.col("c_nationkey") == F.col("n_nationkey"),
        "left_semi",
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    return (
        li.join(F.broadcast(parts), li["l_partkey"] == parts["p_partkey"], "left_semi")
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(
            F.broadcast(supp.join(n1, supp["s_nationkey"] == n1["n1_key"])),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol)
                    .otherwise(F.lit(0).cast("decimal(38,6)"))
                ).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q9",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(l_extendedprice / l_quantity) AS ps_supplycost
      FROM lineitem GROUP BY 1, 2
    )
    SELECT nation, o_year,
           CAST(SUM(amount_micros) AS DOUBLE) / 1000000.0 AS sum_profit
    FROM (SELECT n_name AS nation,
                 CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                 CAST(FLOOR((l_extendedprice * (1 - l_discount)
                             - ps_supplycost * l_quantity) * 1000000.0 + 0.5)
                      AS DECIMAL(38,0)) AS amount_micros
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN ps ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%widget%') profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 (product type profit): profit = revenue minus "
        "supply cost, supply cost derived from lineitem (min unit "
        "price per part x supplier — the fixture carries no partsupp; "
        "same derivation as tpch_q2).  The name-filtered part set "
        "semi-joins the lineitem scan FIRST so the cost aggregate "
        "only touches qualifying parts, the cost relation joins back "
        "on its own (l_partkey, l_suppkey) grouping keys (co-"
        "partitioned, no extra exchange), supplier+nation broadcast, "
        "and ONE final aggregate covers (nation x year).  Per-row "
        "amounts quantize to integer micros via FLOOR(x*1e6 + 0.5) "
        "before the sum — the SAME IEEE-double formula on both "
        "engines — so the exact-integer total is order-independent "
        "AND bit-identical across engines at any hash precision "
        "(a double->DECIMAL cast rounds half-way ties differently "
        "between Spark and DuckDB, which a full-precision value "
        "hash catches even when the sums agree to 9 digits).",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    ).join(F.broadcast(parts), F.col("l_partkey") == parts["p_partkey"], "left_semi")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # quantize to integer micros with the same IEEE-double formula the
    # oracle uses: floor(x*1e6 + 0.5) on identical doubles is
    # bit-deterministic on both engines (double->DECIMAL casts are
    # not: the engines round half-way ties differently).  DECIMAL(38,0)
    # keeps the sum exact at any scale (a raw BIGINT sum could overflow
    # at 100 TB; ~1e10 micros/row x 1e12 rows > 2^63).
    amount_micros = F.floor(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.col("ps_supplycost") * F.col("l_quantity")
        )
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("decimal(38,0)")
    return (
        li.join(ps, ["l_partkey", "l_suppkey"])
        .join(orders, F.col("l_orderkey") == orders["o_orderkey"])
        .join(
            F.broadcast(
                supp.join(nation, supp["s_nationkey"] == nation["n_nationkey"])
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            (F.sum(amount_micros).cast("double") / F.lit(1000000.0))
            .alias("sum_profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "tpch_q11",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                 AS ps_availqty,
             MIN(l_extendedprice / l_quantity) AS ps_supplycost
      FROM lineitem GROUP BY 1, 2
    ), asia_ps AS (
      SELECT ps_partkey, ps_supplycost * ps_availqty AS part_value
      FROM ps JOIN supplier ON ps_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    ), per_part AS (
      SELECT ps_partkey,
             CAST(SUM(CAST(part_value AS DECIMAL(38,6))) AS DOUBLE)
                 AS part_value
      FROM asia_ps GROUP BY ps_partkey
    )
    SELECT ps_partkey, part_value
    FROM per_part
    WHERE part_value > (
      SELECT 2.0 * CAST(SUM(CAST(part_value AS DECIMAL(38,6))) AS DOUBLE)
             / COUNT(*)
      FROM per_part)
    ORDER BY part_value DESC, ps_partkey
    """,
    doc="TPC-H Q11 (important stock identification): inventory value "
        "per part held by one region's suppliers, kept when above a "
        "threshold of the region's AVERAGE per-part value (the "
        "standard's fixed fraction-of-total is 1/SF-scaled per spec; "
        "a mean-relative threshold is the scale-invariant equivalent "
        "— a fixed fraction empties as the part count grows).  "
        "availqty/supplycost derive from lineitem in ONE groupBy (no "
        "partsupp in the fixture); the uncorrelated scalar mean is a "
        "tiny second aggregate BROADCAST into the HAVING filter — "
        "never a rescan per group.  supplier x nation x region (10 "
        "rows) broadcasts into the cost relation.  Both sides of the "
        "> quantize through DECIMAL(38,6) so the threshold edge is "
        "identical on both engines.",
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(38,6)"))
        .cast("double").alias("ps_availqty"),
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(region, nation["n_regionkey"] == region["r_regionkey"])
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_suppkey")
    )
    asia_ps = ps.join(
        F.broadcast(asia_supp), ps["l_suppkey"] == asia_supp["s_suppkey"], "left_semi"
    ).select(
        F.col("l_partkey").alias("ps_partkey"),
        (F.col("ps_supplycost") * F.col("ps_availqty")).alias("part_value"),
    )
    per_part = asia_ps.groupBy("ps_partkey").agg(
        F.sum(F.col("part_value").cast("decimal(38,6)"))
        .cast("double").alias("part_value")
    )
    threshold = per_part.agg(
        (
            2.0
            * F.sum(F.col("part_value").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("ps_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "ps_partkey")
    )


@register(
    "tpch_q12",
    oracle="""
    SELECT l_returnflag AS shipgroup,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="TPC-H Q12 (shipping modes and order priority): lines shipped "
        "slowly (>30 days after order — the fixture's stand-in for "
        "the receipt/commit-date lag; l_returnflag stands in for the "
        "absent l_shipmode) counted into high- vs low-priority in ONE "
        "conditional aggregate.  The year filter pushes to the "
        "lineitem scan; the cross-table lag inequality rides the "
        "o_orderkey hash join as a residual — no second pass, no "
        "nested loop.  Oracle SUMs cast to BIGINT: DuckDB's SUM over "
        "INTEGER yields HUGEINT (int128), which fetch paths coerce "
        "to float/str unlike Spark's BIGINT — the one bare "
        "integer-SUM oracle in the catalog was the one the driver "
        "hash-mismatched in r9.",
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy(F.col("l_returnflag").alias("shipgroup"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("shipgroup")
    )


@register(
    "tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey
           AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 (customer distribution): the LEFT OUTER join "
        "preserves zero-order customers (COUNT(o_orderkey) counts "
        "only matched rows — NULLs from the outer side don't), the "
        "non-join predicate (priority exclusion; stands in for the "
        "absent o_comment NOT LIKE) stays INSIDE the join condition "
        "so it cannot turn the join inner, and the distribution is "
        "a double aggregate: per-customer count on the join keys' "
        "own partitioning, then a tiny regroup by count value.",
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    c_orders = (
        cust.join(
            orders,
            (cust["c_custkey"] == orders["o_custkey"])
            & (orders["o_orderpriority"] != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "tpch_q15",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 (top supplier): the revenue view computes ONCE "
        "(quarter filter pushed to the scan, one groupBy(l_suppkey)), "
        "the uncorrelated scalar MAX is a second tiny aggregate over "
        "that same view BROADCAST into the equality filter, and the "
        "supplier dimension broadcasts.  Ties all surface (the "
        "standard's semantics) — equality is safe because both "
        "engines compute the identical decimal-exact sum before the "
        "double cast.",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    revenue = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
            ).cast("double").alias("total_revenue")
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q16",
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
      FROM lineitem
    )
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM ps JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                             WHERE s_acctbal < 2000)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 (parts/supplier relationship): the part-supplier "
        "relation derives as DISTINCT (part, supplier) pairs from "
        "lineitem (no partsupp in the fixture); the brand/type/size "
        "screens broadcast as the part dimension join; the NOT IN "
        "excluded-supplier set (low account balance stands in for "
        "the absent complaint-comment scan) is provably non-null "
        "(s_suppkey is the PK) so it plans as a tiny BROADCAST anti "
        "join, not a null-aware nested loop.  countDistinct rides "
        "the (brand, type, size) regroup.",
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    parts = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 2000
    ).select("s_suppkey")
    return (
        ps.join(F.broadcast(bad_supp),
                ps["ps_suppkey"] == bad_supp["s_suppkey"], "left_anti")
        .join(F.broadcast(parts), F.col("ps_partkey") == parts["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q19",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    doc="TPC-H Q19 (discounted revenue): the classic disjunctive "
        "join predicate.  The part-only half of each branch "
        "((brand, size-range) x3) pre-filters the part side BEFORE "
        "the broadcast, the lineitem-only bounds (quantity in the "
        "union of the three ranges: 1..30) push to the parquet scan, "
        "and the full three-branch disjunction evaluates as a "
        "residual on the p_partkey hash join — the join itself stays "
        "a single equi-join, never a nested-loop over the OR.",
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = load_table(spark, sf_dir, "part").filter(
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#24") & F.col("p_size").between(1, 15))
    ).select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    ).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    branch = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#24") & F.col("p_size").between(1, 15)
           & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 30))
    )
    return (
        li.join(F.broadcast(parts), li["l_partkey"] == parts["p_partkey"])
        .filter(branch)
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
            ).cast("double").alias("revenue")
        )
    )


@register(
    "tpch_q22",
    oracle="""
    SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
               AS totacctbal
    FROM customer
    WHERE c_nationkey IN (3, 8, 12, 13, 15, 18, 20)
      AND c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(*)
        FROM customer
        WHERE c_acctbal > 0.0
          AND c_nationkey IN (3, 8, 12, 13, 15, 18, 20))
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-06-01')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    doc="TPC-H Q22 (global sales opportunity): customers in seven "
        "countries (nation key stands in for the absent phone-prefix "
        "cntrycode) with above-average positive balance and NO "
        "RECENT order (the fixture's every customer has SOME order, "
        "so the standard's NOT EXISTS adapts to a pushed 18-month "
        "recency window — same anti-join shape, non-vacuous here).  "
        "The uncorrelated scalar AVG is one tiny aggregate broadcast "
        "into the filter (decimal-exact sum / count on both "
        "engines); the NOT EXISTS plans as a left-anti hash join "
        "with the date filter pushed to the orders scan.  ONE final "
        "aggregate over the 7-code key space.",
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes = [3, 8, 12, 13, 15, 18, 20]
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(codes)
    ).select("c_custkey", "c_nationkey", "c_acctbal")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(38,6)"))
            .cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@register(
    "token_budget_cutoff",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                      t -> t IN ('the','and','of','to','in','is','it','that','for','with'))) AS DOUBLE)
                 / CAST(greatest(len(string_split_regex(lower(trim(text)), '\s+')), 1) AS DOUBLE)
                 AS quality,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                 AS n_tokens
      FROM documents
    ),
    ordered AS (
      SELECT doc_id, quality, n_tokens,
             CAST(SUM(CAST(n_tokens AS DECIMAL(38,6))) OVER (
               ORDER BY quality DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS cum
      FROM toks
    )
    SELECT doc_id, quality, n_tokens FROM ordered WHERE cum <= 8000
    ORDER BY quality DESC, doc_id
    """,
    doc="Token-budget corpus truncation: keep the highest-quality "
        "documents (stopword-ratio ranking, doc_id tie-break) until "
        "a fixed token budget fills — THE selection primitive of a "
        "training-data pipeline ('fill 10B tokens with the best "
        "docs').  The definition is a global-order cumulative window "
        "— a single partition at 100 TB — so the implementation "
        "(operators/relational.py::ordered_budget_select) runs it as "
        "a distributed two-pass prefix sum: equi-width quality "
        "buckets (monotone mapping, ties can't straddle), per-bucket "
        "weight totals turned into strict-prior prefixes by a window "
        "over <=256 TINY rows, broadcast back, and a within-bucket "
        "window PARTITIONED BY BUCKET — parallel across buckets, "
        "row-identical to the single-window definition (the oracle "
        "IS that definition).  DECIMAL accumulation keeps the "
        "running total exact.",
)
def q_token_budget_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.text import stopword_ratio
    from etl_tiki_webscraping_spark.operators.relational import (
        ordered_budget_select,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        stopword_ratio("text").alias("quality"),
        F.size(F.split(F.trim(F.col("text")), "[ \t\n\f\r]+"))
        .cast("bigint").alias("n_tokens"),
    )
    return ordered_budget_select(
        docs, "quality", "n_tokens", 8000, "doc_id"
    ).orderBy(F.col("quality").desc(), "doc_id")


@register(
    "token_budget_per_lang",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                      t -> t IN ('the','and','of','to','in','is','it','that','for','with'))) AS DOUBLE)
                 / CAST(greatest(len(string_split_regex(lower(trim(text)), '\s+')), 1) AS DOUBLE)
                 AS quality,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                 AS n_tokens
      FROM documents
    ),
    ordered AS (
      SELECT doc_id, lang, quality, n_tokens,
             CAST(SUM(CAST(n_tokens AS DECIMAL(38,6))) OVER (
               PARTITION BY lang
               ORDER BY quality DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS cum
      FROM toks
    )
    SELECT doc_id, lang, quality, n_tokens FROM ordered WHERE cum <= 2000
    ORDER BY lang, quality DESC, doc_id
    """,
    doc="Per-language token-budget truncation: every language fills "
        "its own quota with its best documents — the per-stratum form "
        "of token_budget_cutoff that data-mix curation runs after "
        "corpus_mix_allocation decides the quotas.  Same distributed "
        "two-pass prefix sum (ordered_budget_select with group_cols), "
        "but the range/prefix relations are per-group and their "
        "windows partition by (lang, bucket) — the degenerate one-"
        "partition-per-LANGUAGE cumulative window (each carrying that "
        "language's full doc count: still billions of rows per "
        "partition at corpus scale) never appears.",
)
def q_token_budget_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.text import stopword_ratio
    from etl_tiki_webscraping_spark.operators.relational import (
        ordered_budget_select,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        stopword_ratio("text").alias("quality"),
        F.size(F.split(F.trim(F.col("text")), "[ \t\n\f\r]+"))
        .cast("bigint").alias("n_tokens"),
    )
    return ordered_budget_select(
        docs, "quality", "n_tokens", 2000, "doc_id", group_cols=["lang"]
    ).orderBy("lang", F.col("quality").desc(), "doc_id")


@register(
    "doc_bigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(terms) AS term,
             generate_subscripts(terms, 1) AS pos
      FROM (SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                               t -> t <> '') AS terms
            FROM documents)
    ),
    bigrams AS (
      SELECT doc_id,
             lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev,
             term AS cur
      FROM toks
      QUALIFY prev IS NOT NULL
    ),
    c2 AS (SELECT prev, cur, COUNT(*) AS n2 FROM bigrams GROUP BY 1, 2),
    c1 AS (SELECT prev, SUM(n2) AS n1 FROM c2 GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT term) AS vsize FROM toks),
    scored AS (
      SELECT b.doc_id,
             CAST(ln((c2.n2 + 0.5)
                     / (c1.n1 + 0.5 * v.vsize)) AS DECIMAL(18,8)) AS lp
      FROM bigrams b
      JOIN c2 ON b.prev = c2.prev AND b.cur = c2.cur
      JOIN c1 ON b.prev = c1.prev
      CROSS JOIN v
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS avg_logprob
    FROM scored GROUP BY doc_id
    """,
    doc="Bigram language-model scoring with add-k smoothing (k=0.5): "
        "the conditional upgrade of doc_unigram_logprob — low mean "
        "ln P(w|prev) flags token-order gibberish that unigram "
        "frequency cannot (shuffled text keeps its unigram score).  "
        "Bigrams form via ONE lag window partitioned per document "
        "(parallel across docs); corpus statistics are two map-side-"
        "combined aggregates (bigram counts, then context totals "
        "derived from them — the token stream is NOT re-scanned) plus "
        "a scalar vocabulary size; scoring is one (prev, cur)-keyed "
        "equi join of the doc stream against the count table with the "
        "context totals broadcast onto it.  Per-token ln quantizes to "
        "DECIMAL(18,8) before the sum (the doc_unigram_logprob "
        "precedent) so the per-doc average is order-independent and "
        "bit-identical across engines.  Docs with fewer than two "
        "tokens have no bigrams and are absent by definition.",
)
def q_doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    # r16: one explicit-count id-keyed exchange of raw text BEFORE the
    # token explode — the lag window and the final per-doc rollup then
    # reuse the partitioning (no exploded-token exchange), and the
    # tokenizer parallelizes past the single scan split (explicit
    # count because AQE would coalesce the tiny exchange to one
    # partition and serialize it)
    docs = docs.select("doc_id", "text").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    # persisted (r17): the token stream has TWO independent consumers —
    # the bigram build and the vocabulary-size count.  Unpinned, the
    # vsize leg re-scans and re-tokenizes the whole corpus through its
    # OWN copy of the doc_id exchange (exchange reuse cannot fire
    # across the bigram cache boundary), i.e. the raw-text exchange was
    # paid twice (VERDICT r16 #3).  One tokenize pass total now.
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda t: t != "",
            )
        ).alias("pos", "term"),
    ).persist()
    doc_w = Window.partitionBy("doc_id").orderBy("pos")
    # persisted: the bigram stream has TWO consumers (the count build
    # and the scoring join) — without pinning it, the explode + lag
    # window would rerun per consumer (two extra full passes at scale)
    bigrams = (
        toks.select(
            "doc_id",
            F.lag("term").over(doc_w).alias("prev"),
            F.col("term").alias("cur"),
        )
        .filter(F.col("prev").isNotNull())
        .persist()
    )
    # persisted too: c2 (bigram-TYPE cardinality, tiny) feeds both the
    # context totals and the scoring lookup — one combined shuffle of
    # the stream instead of two
    c2 = (
        bigrams.groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("n2"))
        .persist()
    )
    c1 = c2.groupBy("prev").agg(F.sum("n2").alias("n1"))
    vsize = toks.agg(F.countDistinct("term").alias("vsize"))
    lookup = (
        c2.join(F.broadcast(c1), "prev")
        .join(F.broadcast(vsize))
        .select(
            "prev",
            "cur",
            F.log(
                (F.col("n2") + 0.5) / (F.col("n1") + 0.5 * F.col("vsize"))
            ).cast("decimal(18,8)").alias("lp"),
        )
    )
    return (
        bigrams.join(lookup, ["prev", "cur"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            (F.sum("lp").cast("double") / F.count(F.lit(1)))
            .alias("avg_logprob"),
        )
    )


@register(
    "logreg_quality_train",
    oracle=None,  # iterative Newton solves — not SQL-replayable
    doc="Distributed logistic-regression TRAINING via IRLS "
        "(operators/mlfit.py::logreg_train_irls) — the trainable half "
        "of the quality classifier whose fixed-weight scoring side is "
        "quality_model_score: fit P(lang='en' | stopword_ratio, "
        "punct_ratio, log10 tokens) on the documents fixture.  Each "
        "Newton iteration is ONE shuffle-free Arrow pass accumulating "
        "the d x d normal matrix; partials reduce at d^2+d+2 "
        "cardinality (the embedding_pca shape) and only that reaches "
        "the driver's O(d^3) solve — n never leaves the executors, "
        "and d is the feature count (4), not the corpus.  Gates "
        "(tools/gates_report.py + tests/test_mlfit.py): exact "
        "coefficient parity (<=1e-6) with a single-node numpy IRLS "
        "replay on the same features, monotone non-increasing "
        "deviance, and partitioning invariance.",
)
def q_logreg_quality_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.text import (
        punct_ratio,
        stopword_ratio,
    )
    from etl_tiki_webscraping_spark.operators.mlfit import (
        logreg_train_report,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        (F.col("lang") == "en").cast("int").alias("is_en"),
        stopword_ratio("text").alias("stopword_ratio"),
        punct_ratio("text").alias("punct_ratio"),
        F.log10(
            F.size(F.split(F.trim(F.col("text")), "[ \t\n\f\r]+")).cast("double")
        ).alias("log10_tokens"),
    )
    return logreg_train_report(
        docs,
        ["stopword_ratio", "punct_ratio", "log10_tokens"],
        "is_en",
        max_iters=8,
    )


@register(
    "model_calibration_bins",
    oracle=r"""
    WITH feats AS (
        SELECT doc_id,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               CAST(length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS DOUBLE)
                   / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio,
               CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                        t -> t IN ('the','and','of','to','in','is','it','that','for','with'))) AS DOUBLE)
                   / CAST(greatest(len(string_split_regex(lower(trim(text)), '\s+')), 1) AS DOUBLE)
                   AS stopword_ratio,
               ln(1.0 + len(list_filter(string_split_regex(trim(text), '\s+'),
                                        t -> t <> ''))) AS log_tokens
        FROM documents
    ),
    scored AS (
        SELECT y,
               (-0.8) + 0.55 * log_tokens + (-2.1) * punct_ratio
                      + 3.0 * stopword_ratio AS z
        FROM feats
    ),
    probs AS (
        SELECT y,
               CASE WHEN z >= 0 THEN 1.0 / (1.0 + exp(-abs(z)))
                    ELSE 1.0 - 1.0 / (1.0 + exp(-abs(z))) END AS p
        FROM scored
    )
    SELECT CAST(least(9, CAST(floor(p * 10) AS BIGINT)) AS INT) AS bin,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(p AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*), 6)
               AS mean_pred,
           ROUND(CAST(SUM(CAST(y AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*), 6)
               AS obs_rate
    FROM probs
    GROUP BY 1
    ORDER BY 1
    """,
    doc="Model calibration (reliability bins) — the third leg of the "
        "classifier loop: logreg_quality_train TRAINS, "
        "quality_model_score SCORES at scan speed, and this audits "
        "whether the scores MEAN what they claim (predicted "
        "probability vs observed label rate per decile bin — the "
        "reliability-diagram table).  Same deployed weights and "
        "stable -|z| sigmoid as the scoring query; binning is a "
        "derived-integer groupBy (bounded 10-row key space, partial+"
        "final aggregate, one exchange); per-bin means quantize "
        "through DECIMAL(18,8) so they are order-independent and "
        "hash-identical across engines.",
)
def q_model_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.text import (
        punct_ratio,
        stopword_ratio,
    )
    from etl_tiki_webscraping_spark.quality.scoring import sigmoid

    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(
        F.filter(F.split(F.trim(F.col("text")), "[ \t\n\f\r]+"), lambda t: t != "")
    )
    z = (
        F.lit(-0.8)
        + 0.55 * F.log(1.0 + n_tok.cast("double"))
        - 2.1 * punct_ratio("text")
        + 3.0 * stopword_ratio("text")
    )
    probs = docs.select(
        (F.col("lang") == "en").cast("int").alias("y"),
        sigmoid(z).alias("p"),
    )
    dec = lambda c: F.sum(c.cast("decimal(18,8)")).cast("double")
    return (
        probs.groupBy(
            F.least(F.lit(9), F.floor(F.col("p") * 10).cast("bigint"))
            .cast("int").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(dec(F.col("p")) / F.count(F.lit(1)), 6).alias("mean_pred"),
            F.round(dec(F.col("y")) / F.count(F.lit(1)), 6).alias("obs_rate"),
        )
        .orderBy("bin")
    )


@register(
    "dsir_importance_resample",
    oracle="""
    WITH pool_toks AS (
        SELECT doc_id AS id,
               unnest(list_filter(
                   regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                   t -> t <> '')) AS term
        FROM documents WHERE source <> 'src1'
    ),
    tgt_toks AS (
        SELECT doc_id AS id,
               unnest(list_filter(
                   regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                   t -> t <> '')) AS term
        FROM documents WHERE source = 'src1'
    ),
    raw_hist AS (
        SELECT CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) % 4096
                   AS bucket,
               COUNT(*) AS c_raw
        FROM pool_toks GROUP BY 1
    ),
    tgt_hist AS (
        SELECT CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) % 4096
                   AS bucket,
               COUNT(*) AS c_tgt
        FROM tgt_toks GROUP BY 1
    ),
    nr AS (SELECT CAST(COALESCE(SUM(c_raw), 0) AS BIGINT) AS n_raw
           FROM raw_hist),
    nt AS (SELECT CAST(COALESCE(SUM(c_tgt), 0) AS BIGINT) AS n_tgt
           FROM tgt_hist),
    ratios AS (
        SELECT COALESCE(r.bucket, t.bucket) AS bucket,
               CAST(FLOOR(ln(
                   ((CAST(COALESCE(t.c_tgt, 0) AS DOUBLE) + 1.0)
                    / (CAST(nt.n_tgt AS DOUBLE) + 4096.0))
                   / ((CAST(COALESCE(r.c_raw, 0) AS DOUBLE) + 1.0)
                      / (CAST(nr.n_raw AS DOUBLE) + 4096.0))
               ) * 1e8 + 0.5) AS BIGINT) AS lw_units
        FROM raw_hist r FULL OUTER JOIN tgt_hist t ON r.bucket = t.bucket
        CROSS JOIN nr CROSS JOIN nt
    ),
    scored AS (
        SELECT id,
               CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) % 4096
                   AS bucket
        FROM pool_toks
    ),
    lw AS (
        SELECT s.id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(CAST(r.lw_units AS DECIMAL(38,0))) AS DOUBLE) / 1e8
                   AS log_weight
        FROM scored s JOIN ratios r USING (bucket) GROUP BY s.id
    ),
    keyed AS (
        SELECT id AS doc_id, n_tokens, log_weight,
               CAST(FLOOR((log_weight - ln(-ln(
                   (CAST(CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))
                              AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0)))
                   * 1e9 + 0.5) AS BIGINT) AS key_units
        FROM lw
    )
    SELECT doc_id, n_tokens, log_weight, key_units
    FROM keyed ORDER BY key_units DESC, doc_id ASC LIMIT 100
    """,
    doc="DSIR — data selection via importance resampling (Xie et al. "
        "2023), the published recipe for steering a raw crawl toward a "
        "curated target domain: two add-1-smoothed hashed-unigram LMs "
        "(4096 md5 buckets; the hashing is why DSIR scales — the "
        "vocabulary never leaves the fixed bucket grid), per-document "
        "log-weight = sum of per-token log-ratios, then Gumbel-top-k "
        "selection of 100 docs WITHOUT replacement with odds "
        "proportional to the weight (log-space — never exponentiates), "
        "using the deterministic md5-prefix uniform.  Plan: both "
        "corpora tokenize once, the bucket histograms are 4096-bounded "
        "map-side-combinable aggregates, the log-ratio table "
        "BROADCASTS into the pool token stream, the per-doc reduce "
        "carries bare (id, bigint) pairs, and the top-k is "
        "TakeOrderedAndProject.  Per-bucket ratios and rank keys "
        "quantize via floor(x*1eN + 0.5) (exact DECIMAL sums), so the "
        "oracle replay is bit-identical at any hash precision.",
)
def q_dsir_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.decontaminate import dsir_resample

    docs = load_table(spark, sf_dir, "documents")
    pool = docs.filter(F.col("source") != "src1")
    target = docs.filter(F.col("source") == "src1")
    out = dsir_resample(pool, target, "text", "doc_id", k=100, n_buckets=4096)
    return out.withColumnRenamed("id", "doc_id")


@register(
    "embedding_centroid_outliers",
    oracle="""
    WITH x AS (
        SELECT vec_id, label, i, CAST(embedding[i + 1] AS DOUBLE) AS vd
        FROM embeddings, unnest(range(0, 64)) AS r(i)
        WHERE embedding IS NOT NULL AND label IS NOT NULL
    ),
    cent AS (
        SELECT label, i,
               CAST(SUM(CAST(FLOOR(vd * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
                   / COUNT(*) / 1e9 AS c
        FROM x GROUP BY label, i
    ),
    nc AS (
        SELECT label,
               SUM(CAST(FLOOR(c * c * 1e12 + 0.5) AS BIGINT)) AS nc_units
        FROM cent GROUP BY label
    ),
    dots AS (
        SELECT x.vec_id, x.label,
               SUM(CAST(FLOOR(x.vd * c.c * 1e12 + 0.5) AS BIGINT))
                   AS dot_units,
               SUM(CAST(FLOOR(x.vd * x.vd * 1e12 + 0.5) AS BIGINT))
                   AS nv_units
        FROM x JOIN cent c ON x.label = c.label AND x.i = c.i
        GROUP BY x.vec_id, x.label
    ),
    cosd AS (
        SELECT d.vec_id, d.label,
               CAST(FLOOR((CAST(d.dot_units AS DOUBLE) / 1e12)
                   / sqrt((CAST(d.nv_units AS DOUBLE) / 1e12)
                          * (CAST(n.nc_units AS DOUBLE) / 1e12))
                   * 1e6 + 0.5) AS BIGINT) AS cos_units
        FROM dots d JOIN nc n ON d.label = n.label
        WHERE d.nv_units > 0 AND n.nc_units > 0
    ),
    r AS (
        SELECT label, vec_id, cos_units,
               row_number() OVER (PARTITION BY label
                                  ORDER BY cos_units ASC, vec_id ASC) AS rn
        FROM cosd
    )
    SELECT label, vec_id, CAST(cos_units AS DOUBLE) / 1e6 AS cos_centroid
    FROM r WHERE rn <= 5
    """,
    doc="per-group embedding prototypicality pruning (SemDeDup / "
        "SSL-prototypes, Abbas et al. 2023; Sorscher et al. 2022): "
        "each label's centroid, then the 5 vectors per label with the "
        "LOWEST cosine to their own centroid — the in-cluster outliers "
        "a curation pipeline routes to review before training.  Plan: "
        "ONE posexplode + groupBy(label, dim) whose shuffle "
        "cardinality is |labels| x d (never row count), centroid "
        "arrays BROADCAST back onto the vector scan, dot/norm fold "
        "JVM-side (zip_with + aggregate over integer units, no "
        "Python), one WindowGroupLimit top-k.  Every float enters a "
        "sum as floor(x*1eN + 0.5) integer units, so the DuckDB "
        "replay is bit-identical at any hash precision.",
)
def q_embedding_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.similarity import (
        centroid_cosine_outliers,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return centroid_cosine_outliers(emb, "embedding", "vec_id", "label", k=5)


# Shared KN-score replay: CTEs ending in ``kn_scores (doc_id,
# n_bigrams, avg_logprob)`` — used by doc_kneser_ney_logprob and the
# perplexity_terciles band assignment (round 11).
_KN_SCORE_CTES = r"""
    kn_toks AS (
      SELECT doc_id, unnest(terms) AS term,
             generate_subscripts(terms, 1) AS pos
      FROM (SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                               t -> t <> '') AS terms
            FROM documents)
    ),
    kn_bigrams AS (
      SELECT doc_id,
             lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev,
             term AS cur
      FROM kn_toks
      QUALIFY prev IS NOT NULL
    ),
    kn_c2 AS (SELECT prev, cur, COUNT(*) AS n2 FROM kn_bigrams GROUP BY 1, 2),
    kn_c1 AS (SELECT prev, CAST(SUM(n2) AS BIGINT) AS n1,
                  COUNT(*) AS nv
           FROM kn_c2 GROUP BY 1),
    kn_cw AS (SELECT cur, COUNT(*) AS nw FROM kn_c2 GROUP BY 1),
    kn_tt AS (SELECT COUNT(*) AS t FROM kn_c2),
    kn_lookup AS (
      SELECT kn_c2.prev, kn_c2.cur,
             CAST(FLOOR(ln(
                 (CAST(kn_c2.n2 AS DOUBLE) - 0.75) / CAST(kn_c1.n1 AS DOUBLE)
                 + (0.75 * CAST(kn_c1.nv AS DOUBLE) / CAST(kn_c1.n1 AS DOUBLE))
                   * (CAST(kn_cw.nw AS DOUBLE) / CAST(kn_tt.t AS DOUBLE))
             ) * 1e8 + 0.5) AS BIGINT) AS lp_units
      FROM kn_c2
      JOIN kn_c1 ON kn_c2.prev = kn_c1.prev
      JOIN kn_cw ON kn_c2.cur = kn_cw.cur
      CROSS JOIN kn_tt
    ),
    kn_scores AS (
      SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(CAST(l.lp_units AS DECIMAL(38,0))) AS DOUBLE)
                 / COUNT(*) / 1e8 AS avg_logprob
      FROM kn_bigrams b JOIN kn_lookup l ON b.prev = l.prev AND b.cur = l.cur
      GROUP BY b.doc_id
    )
"""


@register(
    "doc_kneser_ney_logprob",
    oracle=f"""
    WITH {_KN_SCORE_CTES}
    SELECT doc_id, n_bigrams, avg_logprob FROM kn_scores
    """,
    doc="interpolated Kneser-Ney bigram scoring (absolute discount "
        "D=0.75): P(w|v) = max(c(vw)-D,0)/c(v) + D*N1+(v,.)/c(v) * "
        "N1+(.,w)/N1+(.,.) — the smoothing real LM-based corpus "
        "filters use (CCNet's KenLM is modified KN), ranking by "
        "CONTINUATION diversity where add-k ranks by raw frequency "
        "('san francisco' scores high under add-k even though "
        "'francisco' follows almost nothing else; KN discounts it).  "
        "Self-scored corpus, so every doc bigram has c(vw) >= 1 and "
        "the discounted term never hits ln(0).  Same plan shape as "
        "doc_bigram_logprob: one lag window per doc, all statistics "
        "cascade from the persisted bigram-TYPE table (context "
        "totals + continuation fan-outs are two aggregates of c2, "
        "never corpus re-scans; the type total is a 1-row broadcast), "
        "one (prev,cur)-keyed scoring join.  Per-bigram ln quantizes "
        "to integer 1e-8 units via floor(x*1e8+0.5), so the per-doc "
        "average is order-independent and the DuckDB replay "
        "bit-identical at any precision.",
)
def q_doc_kneser_ney_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _kn_doc_scores(spark, sf_dir)


def _kn_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob) Kneser-Ney score table — the
    shared engine of doc_kneser_ney_logprob and perplexity_terciles;
    see the former's doc for the plan shape and the 1e-8-unit
    quantization that makes avg_logprob bit-identical cross-engine."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    # r16: one explicit-count id-keyed exchange of raw text BEFORE the
    # token explode — the lag window and the final per-doc rollup then
    # reuse the partitioning (no exploded-token exchange), and the
    # tokenizer parallelizes past the single scan split (explicit
    # count because AQE would coalesce the tiny exchange to one
    # partition and serialize it)
    docs = docs.select("doc_id", "text").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda t: t != "",
            )
        ).alias("pos", "term"),
    )
    doc_w = Window.partitionBy("doc_id").orderBy("pos")
    # persisted: two consumers (count build + scoring join) — the
    # doc_bigram_logprob precedent; lifecycle: LRU-evicted, released
    # via spark.catalog.clearCache()
    bigrams = (
        toks.select(
            "doc_id",
            F.lag("term").over(doc_w).alias("prev"),
            F.col("term").alias("cur"),
        )
        .filter(F.col("prev").isNotNull())
        .persist()
    )
    c2 = (
        bigrams.groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("n2"))
        .persist()
    )
    c1 = c2.groupBy("prev").agg(
        F.sum("n2").alias("n1"), F.count(F.lit(1)).alias("nv")
    )
    cw = c2.groupBy("cur").agg(F.count(F.lit(1)).alias("nw"))
    tt = c2.agg(F.count(F.lit(1)).alias("t"))
    lookup = (
        c2.join(F.broadcast(c1), "prev")
        .join(F.broadcast(cw), "cur")
        .join(F.broadcast(tt))
        .select(
            "prev",
            "cur",
            F.floor(
                F.log(
                    (F.col("n2").cast("double") - F.lit(0.75))
                    / F.col("n1").cast("double")
                    + (
                        F.lit(0.75) * F.col("nv").cast("double")
                        / F.col("n1").cast("double")
                    )
                    * (
                        F.col("nw").cast("double")
                        / F.col("t").cast("double")
                    )
                )
                * F.lit(1e8)
                + F.lit(0.5)
            ).cast("bigint").alias("lp_units"),
        )
    )
    return (
        bigrams.join(lookup, ["prev", "cur"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            (
                F.sum(F.col("lp_units").cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1))
                / F.lit(1e8)
            ).alias("avg_logprob"),
        )
    )


@register(
    "event_ohlc_resample",
    oracle="""
    WITH b AS (
        SELECT event_type,
               CAST(FLOOR(CAST(epoch_us(ts) AS DOUBLE) / 21600000000.0)
                    AS BIGINT) AS bucket,
               ts, event_id, value
        FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    r AS (
        SELECT *,
               row_number() OVER (PARTITION BY event_type, bucket
                                  ORDER BY ts ASC, event_id ASC) AS rn_a,
               row_number() OVER (PARTITION BY event_type, bucket
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM b
    )
    SELECT event_type, bucket,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
               / 1e6 AS volume,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM r GROUP BY event_type, bucket
    """,
    doc="time-bucket OHLC resampling (the downsampling primitive every "
        "metrics/market pipeline runs): per (event_type, 6-hour "
        "bucket) the first/last/min/max of value plus exact volume "
        "and count.  First/last are DETERMINISTIC under ties: Spark "
        "takes min/max of struct(ts, event_id, value) — a total order "
        "because event_id is unique — where a bare min_by/arg_min "
        "would return whichever row a partition delivered first.  "
        "ONE map-side-combinable groupBy (struct min/max and sum are "
        "all partial aggregates; no window on the Spark side — the "
        "oracle uses windows only because SQL lacks struct min); "
        "shuffle cardinality is |types| x |buckets|, never row "
        "count.  Volume sums integer 1e-6 units (floor recipe) for "
        "bit-identical cross-engine replay.",
)
def q_event_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL ts is excluded on BOTH engines: inside a struct min Spark
    # orders a NULL field low while the oracle window's default puts
    # NULLs last — the one spot the two replays could diverge
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    us = F.unix_micros(F.col("ts"))
    bucket = F.floor(us.cast("double") / F.lit(21600000000.0)).cast("bigint")
    first_s = F.min(F.struct(F.col("ts"), F.col("event_id"), F.col("value")))
    last_s = F.max(F.struct(F.col("ts"), F.col("event_id"), F.col("value")))
    return (
        ev.select("event_type", bucket.alias("bucket"), "ts", "event_id", "value")
        .groupBy("event_type", "bucket")
        .agg(
            first_s["value"].alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            last_s["value"].alias("close"),
            (
                F.sum(F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)))
                .cast("double")
                / F.lit(1e6)
            ).alias("volume"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def _dcg_units() -> "tuple[list[int], list[int]]":
    """Integer 1e-9-unit DCG discounts for ranks 1..10 and their prefix
    sums (ideal DCG for m relevant), PRECOMPUTED in Python and embedded
    as literals in BOTH the Spark plan and the DuckDB oracle — the one
    place the floor recipe is not enough, because ln() is libm-backed
    and the JVM and DuckDB could legally differ by 1 ULP on the same
    input; integer constants cannot."""
    import math

    units = [
        math.floor(1e9 * (math.log(2.0) / math.log(i + 1.0)) + 0.5)
        for i in range(1, 11)
    ]
    prefix = [sum(units[: m + 1]) for m in range(10)]
    return units, prefix


@register(
    "retrieval_quality_metrics",
    oracle=(lambda _u=_dcg_units(): f"""
    WITH q AS (
        SELECT vec_id AS query_id, label AS qlabel, embedding AS qvec
        FROM embeddings WHERE vec_id % 100 = 0
    ),
    scored AS (
        SELECT q.query_id, q.qlabel, e.vec_id AS neighbor_id,
               e.label AS nlabel,
               round(list_dot_product(
                         list_transform(q.qvec, x -> CAST(x AS DOUBLE)),
                         list_transform(e.embedding, x -> CAST(x AS DOUBLE)))
                     / (sqrt(list_dot_product(
                            list_transform(q.qvec, x -> CAST(x AS DOUBLE)),
                            list_transform(q.qvec, x -> CAST(x AS DOUBLE))))
                        * sqrt(list_dot_product(
                            list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                            list_transform(e.embedding, x -> CAST(x AS DOUBLE))))),
                     6) AS cosine
        FROM q, embeddings e WHERE e.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rn
        FROM scored
    ),
    lbl AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS lbl_n
            FROM embeddings GROUP BY label),
    per_q AS (
        SELECT query_id, qlabel,
               CAST(SUM(CASE WHEN nlabel = qlabel
                    THEN list_extract({_u[0]}, rn) ELSE 0 END) AS BIGINT)
                   AS dcg_units,
               MIN(CASE WHEN nlabel = qlabel THEN rn END) AS first_rel,
               CAST(SUM(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END)
                    AS BIGINT) AS hits
        FROM ranked WHERE rn <= 10
        GROUP BY query_id, qlabel
    ),
    per_q2 AS (
        SELECT p.query_id, p.qlabel,
               CAST(FLOOR((CAST(p.dcg_units AS DOUBLE)
                    / CAST(list_extract({_u[1]},
                           LEAST(10, l.lbl_n - 1)) AS DOUBLE))
                    * 1e9 + 0.5) AS BIGINT) AS ndcg_units,
               CASE WHEN p.first_rel IS NULL THEN 0
                    ELSE CAST(FLOOR(1e9 * (1.0 / CAST(p.first_rel AS DOUBLE))
                                    + 0.5) AS BIGINT) END AS mrr_units,
               CAST(FLOOR((CAST(p.hits AS DOUBLE)
                    / CAST(l.lbl_n - 1 AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
                   AS recall_units
        FROM per_q p JOIN lbl l ON p.qlabel = l.label
        WHERE l.lbl_n - 1 > 0
    )
    SELECT qlabel AS label, CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CAST(mrr_units AS DECIMAL(38,0))) AS DOUBLE)
               / COUNT(*) / 1e9 AS mean_mrr,
           CAST(SUM(CAST(ndcg_units AS DECIMAL(38,0))) AS DOUBLE)
               / COUNT(*) / 1e9 AS mean_ndcg10,
           CAST(SUM(CAST(recall_units AS DECIMAL(38,0))) AS DOUBLE)
               / COUNT(*) / 1e9 AS mean_recall10
    FROM per_q2 GROUP BY qlabel
    """)(),
    doc="retrieval quality evaluation (nDCG@10 / MRR / recall@10) of "
        "exact cosine top-10 against same-label relevance — the "
        "eval-harness half every ANN/retrieval deployment needs next "
        "to the indexes themselves.  Ranking reuses knn_bruteforce's "
        "cross-engine convention (round-6 cosine, id tie-break); DCG "
        "discounts are PYTHON-precomputed integer 1e-9 units embedded "
        "as literals in BOTH engines (ln is libm-backed and may "
        "legally differ 1 ULP between JVM and DuckDB; integer "
        "constants cannot), ideal DCG is a prefix-sum lookup at "
        "min(10, n_relevant), and per-label means accumulate exact "
        "integer units.  Plan: queries broadcast onto one corpus "
        "scan, WindowGroupLimit top-10, label counts broadcast, one "
        "bounded rollup.",
)
def q_retrieval_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from etl_tiki_webscraping_spark.operators.similarity import (
        as_double_vec,
        cosine,
    )

    units, prefix = _dcg_units()
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        as_double_vec("embedding").alias("qvec"),
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("nlabel"),
        as_double_vec("embedding").alias("cvec"),
    )
    scored = (
        corpus.crossJoin(F.broadcast(qs))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "qlabel", "neighbor_id", "nlabel",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    ranked = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 10
    )
    disc = F.element_at(F.array(*[F.lit(u) for u in units]), F.col("rn"))
    rel = (F.col("nlabel") == F.col("qlabel")).cast("int")
    per_q = ranked.groupBy("query_id", "qlabel").agg(
        F.sum(F.when(rel == 1, disc).otherwise(F.lit(0)))
        .cast("bigint").alias("dcg_units"),
        F.min(F.when(rel == 1, F.col("rn"))).alias("first_rel"),
        F.sum(rel).cast("bigint").alias("hits"),
    )
    lbl = emb.groupBy(F.col("label")).agg(F.count(F.lit(1)).alias("lbl_n"))
    idcg = F.element_at(
        F.array(*[F.lit(p) for p in prefix]),
        F.least(F.lit(10), F.col("lbl_n") - 1).cast("int"),
    )
    per_q2 = (
        per_q.join(F.broadcast(lbl), per_q["qlabel"] == lbl["label"])
        .filter(F.col("lbl_n") - 1 > 0)
        .select(
            "qlabel",
            F.floor(
                (F.col("dcg_units").cast("double") / idcg.cast("double"))
                * F.lit(1e9) + F.lit(0.5)
            ).cast("bigint").alias("ndcg_units"),
            F.when(F.col("first_rel").isNull(), F.lit(0).cast("bigint"))
            .otherwise(
                F.floor(
                    F.lit(1e9)
                    * (F.lit(1.0) / F.col("first_rel").cast("double"))
                    + F.lit(0.5)
                ).cast("bigint")
            ).alias("mrr_units"),
            F.floor(
                (
                    F.col("hits").cast("double")
                    / (F.col("lbl_n") - 1).cast("double")
                )
                * F.lit(1e9) + F.lit(0.5)
            ).cast("bigint").alias("recall_units"),
        )
    )

    def mean_units(c: str) -> "F.Column":
        return (
            F.sum(F.col(c).cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1))
            / F.lit(1e9)
        )

    return per_q2.groupBy(F.col("qlabel").alias("label")).agg(
        F.count(F.lit(1)).alias("n_queries"),
        mean_units("mrr_units").alias("mean_mrr"),
        mean_units("ndcg_units").alias("mean_ndcg10"),
        mean_units("recall_units").alias("mean_recall10"),
    )


_GIF_PALETTE = [(0, 0, 0), (255, 255, 255), (64, 128, 192), (200, 100, 50)]


def _gif_luma_units() -> "list[int]":
    """Integer 1e-6-unit luma of each _GIF_PALETTE color, computed with
    the DECODER's exact float32 arithmetic (same numpy, same op order)
    and embedded as literals in the oracle — the _dcg_units pattern:
    constants cannot drift between engines."""
    import numpy as np

    pal = np.array(_GIF_PALETTE, dtype=np.float32)
    luma = 0.299 * pal[:, 0] + 0.587 * pal[:, 1] + 0.114 * pal[:, 2]
    return [int(np.floor(np.float64(v) * 1e6 + 0.5)) for v in luma]


@register(
    "gif_frame_sampling",
    oracle=(lambda _u=_gif_luma_units(): f"""
    WITH ids AS (
        SELECT doc_id AS media_id FROM documents WHERE doc_id % 12 = 0
    ),
    fr AS (SELECT media_id, fi FROM ids, unnest([0, 2]) AS t(fi)),
    grid AS (
        SELECT a.x, b.y
        FROM unnest(range(0, 4)) AS a(x), unnest(range(0, 4)) AS b(y)
    ),
    px AS (
        SELECT media_id, fi,
               CAST((media_id + fi + x * y) % 4 AS INT) AS k
        FROM fr, grid
    )
    SELECT media_id, CAST(fi AS INT) AS frame_index,
           4 AS height, 4 AS width,
           CAST(SUM(list_extract({_u}, k + 1)) AS BIGINT) AS luma_units
    FROM px GROUP BY media_id, fi
    """)(),
    doc="REAL animated-media frame sampling, oracle-checked end to end "
        "through the codec: per selected document a 3-frame 4x4 GIF is "
        "synthesized at query time (package encoder: spec-correct LZW "
        "with code-width growth; pixel(f,y,x) = (id+f+x*y) mod 4 over "
        "a fixed 4-color table), decoded back through the pure-python "
        "GIF LZW decoder inside ONE mapInPandas kernel, and every 2nd "
        "frame emits (height, width, luma_units) — the exact integer "
        "1e-6-unit luma sum of the float32 plane.  The DuckDB oracle "
        "recomputes those sums FROM FIRST PRINCIPLES (pixel-formula x "
        "palette-luma constants precomputed with the decoder's own "
        "float32 arithmetic, embedded as integer literals) — so a "
        "hash match proves the encode->LZW->decode->composite round "
        "trip bit-exactly, with no codec in the oracle.  Scale shape: "
        "1->N mapInPandas (Arrow both ways), no shuffle before the "
        "final exchange; non-GIF content would surface as "
        "frame_index=-1 quarantine rows, never vanish.",
)
def q_gif_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.multimodal import (
        encode_gif,
        sample_gif_frames,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 12 == 0)
        .select(F.col("doc_id").alias("media_id"))
    )
    pal = list(_GIF_PALETTE)

    def build(d: int) -> bytes:
        frames = [
            [[(d + fi + x * y) % 4 for x in range(4)] for y in range(4)]
            for fi in range(3)
        ]
        return encode_gif(frames, pal, 4, 4)

    blob_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "content": b["media_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = ids.mapInPandas(gen, blob_schema)
    return sample_gif_frames(blobs, every_n=2).select(
        "media_id", "frame_index", "height", "width", "luma_units"
    )


@register(
    "jpeg_image_stats",
    oracle="""
    WITH ids AS (
        SELECT doc_id AS media_id FROM documents WHERE doc_id % 12 = 1
    ),
    blk AS (
        SELECT media_id, bx, by,
               128 + 2 * ((media_id + 3 * bx + 5 * by) % 50 - 25) AS lvl
        FROM ids, unnest(range(0, 2)) AS a(bx), unnest(range(0, 2)) AS b(by)
    )
    SELECT media_id, 16 AS width, 16 AS height,
           CAST(SUM(64 * lvl * 1000000) AS BIGINT) AS luma_units
    FROM blk GROUP BY media_id
    """,
    doc="REAL baseline-JPEG decode, oracle-checked end to end through "
        "the codec (round-11 VERDICT ask #2 — the dominant web image "
        "format): per selected document a 16x16 grayscale baseline "
        "JPEG of 2x2 constant 8x8 blocks (level(bx,by) = 128 + "
        "2*((id + 3bx + 5by) mod 50 - 25)) is synthesized at query "
        "time by the package encoder (two-pass OPTIMIZED canonical "
        "Huffman, Annex K tables), decoded back through the full "
        "baseline pipeline (marker parse -> Huffman entropy decode -> "
        "dequantize -> vectorized IDCT -> round/clamp) inside the "
        "shared _decode_image_impl dispatch (so format SNIFFING is "
        "exercised too), and (width, height, luma_units) emit per "
        "image — luma_units the exact integer 1e-6-unit sum folded "
        "JVM-side over the feature vector.  Block-constant levels on "
        "the DC quantization grid (offset even, Annex K DC step 16) "
        "roundtrip BIT-EXACTLY: AC of a constant block quantizes to "
        "zero and the DC path is integer-exact, so the DuckDB oracle "
        "replays the whole encode -> Huffman -> DCT -> IDCT trip from "
        "first principles with no codec at all (the gif_frame_sampling "
        "pattern).  Scale shape: 1->1 mapInPandas (Arrow both ways), "
        "blobs never cross an exchange, the only shuffle carries "
        "(media_id, 3 ints).",
)
def q_jpeg_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.multimodal import (
        extract_image_features,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 12 == 1)
        .select(F.col("doc_id").alias("media_id"))
    )

    def build(d: int) -> bytes:
        import numpy as np

        from etl_tiki_webscraping_spark.operators.jpeg import encode_jpeg

        img = np.empty((16, 16), dtype=np.float64)
        for by in range(2):
            for bx in range(2):
                img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = 128 + 2 * (
                    (d + 3 * bx + 5 * by) % 50 - 25
                )
        return encode_jpeg(img)

    blob_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "content": b["media_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = _par_ids(ids).mapInPandas(gen, blob_schema)
    feats = extract_image_features(blobs)
    return feats.select(
        "media_id",
        "width",
        "height",
        F.aggregate(
            "feature",
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.floor(x * F.lit(1e6) + F.lit(0.5)).cast("long"),
        ).alias("luma_units"),
    )


@register(
    "jpeg_progressive_stats",
    oracle="""
    WITH ids AS (
        SELECT doc_id AS media_id FROM documents WHERE doc_id % 12 = 5
    ),
    blk AS (
        SELECT media_id, bx, by,
               128 + 2 * ((media_id + 3 * bx + 5 * by) % 50 - 25) AS lvl
        FROM ids, unnest(range(0, 2)) AS a(bx), unnest(range(0, 2)) AS b(by)
    )
    SELECT media_id, 16 AS width, 16 AS height,
           CAST(SUM(64 * lvl * 1000000) AS BIGINT) AS luma_units
    FROM blk GROUP BY media_id
    """,
    doc="REAL progressive-JPEG (SOF2) decode, oracle-checked end to "
        "end (round-11 VERDICT ask #4 — the dominant real-web JPEG "
        "variant): the jpeg_image_stats fixture scheme on a disjoint "
        "doc_id slice, but encoded with encode_jpeg_progressive — a "
        "4-phase Annex G scan script (interleaved DC first at Al=1, "
        "DC refinement raw bits, per-component AC first with EOB "
        "runs, AC refinement with correction-bit buffering) — and "
        "decoded back through the multi-scan progressive machinery "
        "inside the shared _decode_image_impl dispatch.  One "
        "successive-approximation step is lossless once the "
        "refinement scans land, so the block-constant DC-grid "
        "bit-exactness argument carries over verbatim and the DuckDB "
        "oracle replays the whole trip from first principles.  Scale "
        "shape identical to jpeg_image_stats: 1->1 mapInPandas, blobs "
        "never shuffle.",
)
def q_jpeg_progressive_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.multimodal import (
        extract_image_features,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 12 == 5)
        .select(F.col("doc_id").alias("media_id"))
    )

    def build(d: int) -> bytes:
        import numpy as np

        from etl_tiki_webscraping_spark.operators.jpeg import (
            encode_jpeg_progressive,
        )

        img = np.empty((16, 16), dtype=np.float64)
        for by in range(2):
            for bx in range(2):
                img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = 128 + 2 * (
                    (d + 3 * bx + 5 * by) % 50 - 25
                )
        return encode_jpeg_progressive(img)

    blob_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "content": b["media_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = _par_ids(ids).mapInPandas(gen, blob_schema)
    feats = extract_image_features(blobs)
    return feats.select(
        "media_id",
        "width",
        "height",
        F.aggregate(
            "feature",
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.floor(x * F.lit(1e6) + F.lit(0.5)).cast("long"),
        ).alias("luma_units"),
    )


@register(
    "png_image_stats",
    oracle="""
    WITH ids AS (
        SELECT doc_id AS media_id FROM documents WHERE doc_id % 12 = 7
    ),
    px AS (
        SELECT media_id, (media_id + 7 * y + 11 * x) % 256 AS v
        FROM ids, unnest(range(0, 16)) AS a(y), unnest(range(0, 16)) AS b(x)
    )
    SELECT media_id, 16 AS width, 16 AS height,
           CAST(SUM(v * 1000000) AS BIGINT) AS luma_units
    FROM px GROUP BY media_id
    """,
    doc="REAL PNG decode, oracle-checked end to end through the codec "
        "— completes the still-image format trio (JPEG baseline + "
        "progressive, GIF, now PNG): per selected document a 16x16 "
        "grayscale 8-bit PNG (px(y,x) = (id + 7y + 11x) mod 256) is "
        "synthesized at query time by the package writer "
        "(multimodal.py::encode_png) with the ROTATING per-row filter "
        "schedule — rows cycle None/Sub/Up/Average/Paeth, so every "
        "image exercises the decoder's full unfilter surface incl. "
        "the serial Sub/Average/Paeth reconstruction — zlib-deflated, "
        "then decoded back through the shared _decode_image_impl "
        "dispatch (strict signature + IHDR + inflated-length sniff) "
        "and (width, height, luma_units) emit per image.  PNG is "
        "LOSSLESS and gray luma IS the stored channel, so the DuckDB "
        "oracle replays the pixel formula directly — no codec, no "
        "float tolerance (integer-valued float32 is exact under the "
        "1e-6-unit fold).  Scale shape: 1->1 mapInPandas (Arrow both "
        "ways), blobs never cross an exchange, the only shuffle "
        "carries (media_id, 3 ints).",
)
def q_png_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.multimodal import (
        extract_image_features,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 12 == 7)
        .select(F.col("doc_id").alias("media_id"))
    )

    def build(d: int) -> bytes:
        import numpy as np

        from etl_tiki_webscraping_spark.operators.multimodal import encode_png

        y, x = np.mgrid[0:16, 0:16]
        return encode_png(((d + 7 * y + 11 * x) % 256).astype(np.uint8))

    blob_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "content": b["media_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = _par_ids(ids).mapInPandas(gen, blob_schema)
    feats = extract_image_features(blobs)
    return feats.select(
        "media_id",
        "width",
        "height",
        F.aggregate(
            "feature",
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.floor(x * F.lit(1e6) + F.lit(0.5)).cast("long"),
        ).alias("luma_units"),
    )


@register(
    "png_interlaced_stats",
    oracle="""
    WITH ids AS (
        SELECT doc_id AS media_id FROM documents WHERE doc_id % 12 = 11
    ),
    px AS (
        SELECT media_id, (media_id + 7 * y + 11 * x) % 256 AS v
        FROM ids, unnest(range(0, 16)) AS a(y), unnest(range(0, 16)) AS b(x)
    )
    SELECT media_id, 16 AS width, 16 AS height,
           CAST(SUM(v * 1000000) AS BIGINT) AS luma_units
    FROM px GROUP BY media_id
    """,
    doc="REAL Adam7-INTERLACED PNG decode, oracle-checked end to end — "
        "the PNG analogue of the progressive-JPEG coverage (interlaced "
        "is the progressive-rendering variant real crawls carry): the "
        "png_image_stats pixel scheme on a disjoint doc_id slice, but "
        "written with encode_png(interlace=True) — seven Adam7 "
        "sub-images, each with its OWN rotating filter schedule and "
        "prev-row chain — and decoded back through the multi-pass "
        "scatter in the shared dispatch.  Lossless, so the same "
        "first-principles DuckDB oracle replays the pixel formula "
        "directly.  Scale shape identical to png_image_stats: 1->1 "
        "mapInPandas, blobs never shuffle.",
)
def q_png_interlaced_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.multimodal import (
        extract_image_features,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 12 == 11)
        .select(F.col("doc_id").alias("media_id"))
    )

    def build(d: int) -> bytes:
        import numpy as np

        from etl_tiki_webscraping_spark.operators.multimodal import encode_png

        y, x = np.mgrid[0:16, 0:16]
        return encode_png(
            ((d + 7 * y + 11 * x) % 256).astype(np.uint8), interlace=True
        )

    blob_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "content": b["media_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = ids.mapInPandas(gen, blob_schema)
    feats = extract_image_features(blobs)
    return feats.select(
        "media_id",
        "width",
        "height",
        F.aggregate(
            "feature",
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.floor(x * F.lit(1e6) + F.lit(0.5)).cast("long"),
        ).alias("luma_units"),
    )


@register(
    "mjpeg_video_stats",
    oracle="""
    WITH ids AS (
        SELECT doc_id AS media_id FROM documents WHERE doc_id % 12 = 9
    ),
    blk AS (
        SELECT media_id, fi, bx, by,
               128 + 2 * ((media_id + 3 * bx + 5 * by + 7 * fi) % 50 - 25)
                   AS lvl
        FROM ids,
             (SELECT unnest([0, 2]) AS fi),
             (SELECT unnest(range(0, 2)) AS bx),
             (SELECT unnest(range(0, 2)) AS by)
    )
    SELECT media_id, CAST(fi AS INT) AS frame_index,
           16 AS height, 16 AS width,
           CAST(SUM(64 * lvl * 1000000) AS BIGINT) AS luma_units
    FROM blk GROUP BY media_id, fi
    """,
    doc="REAL video decode, oracle-checked end to end — the VIDEO leg "
        "of the multimodal surface is no longer the byte-stride fake: "
        "per selected document a 3-frame MJPEG AVI (RIFF hdrl/movi "
        "tree, one 00dc chunk per frame, each payload a genuine "
        "baseline JPEG of the block-constant DC-grid scheme with a "
        "per-frame term) is synthesized at query time by "
        "multimodal.py::encode_mjpeg_avi, demuxed by the strict RIFF "
        "walker, every frame decoded through the real JPEG pipeline, "
        "and every 2nd frame's (height, width, luma_units) emitted.  "
        "Block-constant levels on the DC quantization grid roundtrip "
        "BIT-EXACTLY (the jpeg_image_stats argument), so the DuckDB "
        "oracle replays container + codec from first principles.  "
        "Scale shape: 1->N mapInPandas, blobs never shuffle.",
)
def q_mjpeg_video_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.multimodal import (
        sample_video_frames,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 12 == 9)
        .select(F.col("doc_id").alias("media_id"))
    )

    def build(d: int) -> bytes:
        import numpy as np

        from etl_tiki_webscraping_spark.operators.multimodal import (
            encode_mjpeg_avi,
        )

        frames = []
        for fi in range(3):
            img = np.empty((16, 16), dtype=np.float64)
            for by in range(2):
                for bx in range(2):
                    img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                        128 + 2 * ((d + 3 * bx + 5 * by + 7 * fi) % 50 - 25)
                    )
            frames.append(img)
        return encode_mjpeg_avi(frames)

    blob_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "content": b["media_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = _par_ids(ids).mapInPandas(gen, blob_schema)
    return sample_video_frames(blobs, every_n=2).select(
        "media_id", "frame_index", "height", "width", "luma_units"
    )


@register(
    "audio_spectral_features",
    oracle=None,  # an FFT has no SQL replay — rows-only; the accuracy
    # gate (tools/gates_report.py) checks synthesized pure tones'
    # centroids land on the tone frequency, end to end through the
    # WAV encode -> decode -> rFFT path
    doc="frequency-domain audio features (spectral centroid / 85% "
        "rolloff / bandwidth) over REAL 16-bit PCM WAV: per selected "
        "document a pure sine tone at 200 + (doc_id mod 20)*150 Hz is "
        "synthesized at query time (stdlib wave encoder), decoded "
        "back, and rFFT'd — all inside two chained Arrow kernels on "
        "the scan, no shuffle, blobs never cross an exchange.  The "
        "spectral leg the time-domain multimodal_audio_features "
        "cannot provide (dominant frequency, brightness, band "
        "spread).  Gate: max |centroid - tone| <= 25 Hz over every "
        "row (tools/gates_report.py + tests/test_multimodal.py).",
)
def q_audio_spectral_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.multimodal import (
        encode_wav_tone,
        extract_audio_spectral_features,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 12 == 0)
        .select(F.col("doc_id").alias("media_id"))
    )
    blob_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "content": b["media_id"].map(
                        lambda d: encode_wav_tone(
                            200.0 + (int(d) % 20) * 150.0
                        )
                    ),
                }
            )

    blobs = _par_ids(ids).mapInPandas(gen, blob_schema)
    return extract_audio_spectral_features(blobs)


# ===========================================================================
# Round 11: Gopher-style repetition quality rules (operators/repetition.py)
# ===========================================================================

def _gopher_ctes(rep_toks_cte: str) -> str:
    """Gopher-stats oracle CTE chain over an injectable token source:
    ``rep_toks_cte`` must define ``rep_toks(doc_id, tok)``.  Shared by
    the whitespace-token queries and the CJK-segmented variant so the
    gram/mass/frac replay logic exists exactly once."""
    return rep_toks_cte + r"""
    rep_base AS (
        SELECT doc_id,
               CAST(len(tok) AS INT) AS n_words,
               CAST(length(array_to_string(tok, ' ')) AS INT) AS total_chars,
               tok
        FROM rep_toks
    ),
    rep_tagged AS (
        SELECT doc_id, ns.n AS n,
               CASE WHEN len(tok) >= ns.n THEN
                   list_transform(range(1, len(tok) - ns.n + 2),
                       i -> array_to_string(list_slice(tok, i, i + ns.n - 1), ' '))
               ELSE [] END AS gs
        FROM rep_base CROSS JOIN (SELECT unnest([2, 3, 4, 5]) AS n) AS ns
    ),
    rep_grams AS (SELECT doc_id, n, unnest(gs) AS g FROM rep_tagged),
    rep_cnt AS (
        SELECT doc_id, n, g, COUNT(*) AS c FROM rep_grams GROUP BY doc_id, n, g
    ),
    rep_per_n AS (
        SELECT doc_id, n,
               MAX(c * length(g)) AS top_mass,
               SUM(CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END) AS dup_mass
        FROM rep_cnt GROUP BY doc_id, n
    ),
    rep_wide AS (
        SELECT doc_id,
               MAX(CASE WHEN n = 2 THEN top_mass END) AS t2,
               MAX(CASE WHEN n = 3 THEN top_mass END) AS t3,
               MAX(CASE WHEN n = 4 THEN top_mass END) AS t4,
               MAX(CASE WHEN n = 5 THEN dup_mass END) AS d5
        FROM rep_per_n GROUP BY doc_id
    ),
    rep_stats AS (
        SELECT b.doc_id, b.n_words, b.total_chars,
               CAST(coalesce(w.t2, 0) AS BIGINT) AS top2gram_mass,
               CAST(coalesce(w.t3, 0) AS BIGINT) AS top3gram_mass,
               CAST(coalesce(w.t4, 0) AS BIGINT) AS top4gram_mass,
               CAST(coalesce(w.d5, 0) AS BIGINT) AS dup5gram_mass,
               CASE WHEN b.total_chars > 0 THEN
                   CAST(coalesce(w.t2, 0) AS DOUBLE) / CAST(b.total_chars AS DOUBLE)
               END AS top2gram_frac,
               CASE WHEN b.total_chars > 0 THEN
                   CAST(coalesce(w.t3, 0) AS DOUBLE) / CAST(b.total_chars AS DOUBLE)
               END AS top3gram_frac,
               CASE WHEN b.total_chars > 0 THEN
                   CAST(coalesce(w.t4, 0) AS DOUBLE) / CAST(b.total_chars AS DOUBLE)
               END AS top4gram_frac,
               CASE WHEN b.total_chars > 0 THEN
                   CAST(coalesce(w.d5, 0) AS DOUBLE) / CAST(b.total_chars AS DOUBLE)
               END AS dup5gram_frac
        FROM rep_base b LEFT JOIN rep_wide w USING (doc_id)
    )
"""


_GOPHER_STATS_CTES = _gopher_ctes(r"""
    rep_toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                           x -> x <> '') AS tok
        FROM documents
    ),""")



@register(
    "gopher_repetition_stats",
    oracle=f"""
    WITH {_GOPHER_STATS_CTES}
    SELECT * FROM rep_stats
    """,
    doc="Gopher-style repetition signals (Rae et al. 2021 §A1.1, the "
        "token-stream variant documented in operators/repetition.py): "
        "per-doc top-2/3/4-gram character mass and duplicated-5-gram "
        "mass as exact BIGINTs plus float64 fractions.  One tagged "
        "explode into one map-side-combined groupBy — shuffle rows "
        "bound by per-task distinct grams, no UDF.  The oracle replays "
        "tokenize → gram → count → mass exactly; fractions are int64/"
        "int64 IEEE divisions, bit-identical across engines.",
)
def q_gopher_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.repetition import repetition_signals

    return repetition_signals(load_table(spark, sf_dir, "documents"))


@register(
    "gopher_repetition_filter",
    oracle=f"""
    WITH {_GOPHER_STATS_CTES}
    SELECT * FROM rep_stats
    WHERE n_words >= 5
      AND top2gram_mass * 5 <= total_chars * 1
      AND top3gram_mass * 50 <= total_chars * 9
      AND top4gram_mass * 25 <= total_chars * 4
      AND dup5gram_mass * 20 <= total_chars * 3
    """,
    doc="documents SURVIVING the Gopher repetition thresholds (top-2/3/"
        "4-gram char fraction <= 0.20/0.18/0.16, duplicated-5-gram "
        "fraction <= 0.15, >= 5 words) — every threshold an integer "
        "cross-multiplication so no float tie can flip a keep/drop "
        "between engines (r10 float discipline)",
)
def q_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.repetition import repetition_filter

    return repetition_filter(load_table(spark, sf_dir, "documents"))


# --- CJK / no-space-script segmentation (round-11 VERDICT ask #5) ---
#
# The fixture corpus is Latin-script even where lang='zh', so the
# mixed-script corpus is SYNTHESIZED deterministically from doc_id in
# both engines: md5 hex digits translated to Han / kana alphabets
# (16 chars each — one per hex digit), appended to the first 40 chars
# of the real text.  The trailing re-emission of the first 6 Han chars
# plants genuine intra-document repeated bigrams, so the signal
# columns are non-trivially exercised, not all-zero.
_CJK_HAN16 = "日月火水木金土山川田中大小上下人"
_CJK_KANA16 = "あいうえおかきくけこさしすせそた"
_CJK_HEX = "0123456789abcdef"


def _cjk_mixed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = F.md5(F.col("doc_id").cast("string"))
    run_han = F.translate(F.substring(h, 1, 12), _CJK_HEX, _CJK_HAN16)
    run_kana = F.translate(F.substring(h, 13, 8), _CJK_HEX, _CJK_KANA16)
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 40),
            F.lit(" "),
            run_han,
            F.lit(" "),
            run_kana,
            F.lit(" "),
            F.substring(run_han, 1, 6),
        ).alias("text"),
    )


def _cjk_mixed_docs_sql() -> str:
    return f"""
    cjk_mixed AS (
        SELECT doc_id,
               concat(substring(coalesce(text, ''), 1, 40), ' ',
                      translate(substring(md5(CAST(doc_id AS VARCHAR)), 1, 12),
                                '{_CJK_HEX}', '{_CJK_HAN16}'), ' ',
                      translate(substring(md5(CAST(doc_id AS VARCHAR)), 13, 8),
                                '{_CJK_HEX}', '{_CJK_KANA16}'), ' ',
                      translate(substring(md5(CAST(doc_id AS VARCHAR)), 1, 6),
                                '{_CJK_HEX}', '{_CJK_HAN16}')) AS text
        FROM documents
    ),"""


def _cjk_rep_toks_cte() -> str:
    """rep_toks CTE replaying functions.text.tokenize_mixed in DuckDB:
    space-delimit no-space-script runs (same \\x{{...}} class body as
    the Spark regex — hex escapes are the Java-regex/RE2-shared
    syntax), whitespace-split, then expand each full run of length
    >= 2 into overlapping character bigrams."""
    from etl_tiki_webscraping_spark.functions.text import NO_SPACE_SCRIPT_CLASS

    cls = NO_SPACE_SCRIPT_CLASS
    return (
        _cjk_mixed_docs_sql()
        + f"""
    rep_toks AS (
        SELECT doc_id,
               flatten(list_transform(
                   list_filter(string_split_regex(
                       regexp_replace(lower(text), '([{cls}]+)', ' \\1 ', 'g'),
                       '\\s+'), x -> x <> ''),
                   t -> CASE WHEN regexp_matches(t, '^[{cls}]+$')
                                  AND length(t) >= 2
                        THEN list_transform(range(1, length(t)::BIGINT),
                                            i -> substring(t, i::INT, 2))
                        ELSE [t] END)) AS tok
        FROM cjk_mixed
    ),"""
    )


@register(
    "gopher_repetition_cjk",
    oracle=f"""
    WITH {_gopher_ctes(_cjk_rep_toks_cte())}
    SELECT * FROM rep_stats
    """,
    doc="Gopher repetition signals over a MIXED-SCRIPT corpus with "
        "segment_cjk=True (functions/text.py::tokenize_mixed): "
        "no-space-script runs (CJK ideographs, kana, hangul, Thai/Lao/"
        "Myanmar/Khmer — explicit \\x{{...}} codepoint ranges, the one "
        "regex syntax Java and RE2 share) are space-delimited and "
        "expanded to overlapping character bigrams before the gram "
        "counts; spaced-script tokens pass through whole.  Without the "
        "flag a CJK sentence is ONE whitespace token and every "
        "repetition mass is degenerately 0.  Corpus synthesized "
        "deterministically from doc_id (md5-hex -> Han/kana translate) "
        "so the oracle rebuilds byte-identical input; the oracle "
        "replays the full segment -> gram -> mass chain via the shared "
        "_gopher_ctes body.  Same 100 TB shape as gopher_repetition_"
        "stats: one codegen'd tokenize expression, one tagged explode, "
        "one map-side-combined groupBy; no UDF.",
)
def q_gopher_cjk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.repetition import repetition_signals

    return repetition_signals(_cjk_mixed_docs(spark, sf_dir), segment_cjk=True)


@register(
    "perplexity_terciles",
    oracle=f"""
    WITH {_KN_SCORE_CTES}
    SELECT doc_id, n_bigrams, avg_logprob,
           CAST(NTILE(3) OVER (ORDER BY avg_logprob DESC, doc_id ASC)
                AS INT) AS tile,
           CASE NTILE(3) OVER (ORDER BY avg_logprob DESC, doc_id ASC)
                WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
           END AS band
    FROM kn_scores
    """,
    doc="CCNet-style perplexity band assignment (Wenzek et al. 2020): "
        "every document labeled head/middle/tail by LM-score tercile "
        "— the bucketing CCNet uses to stratify CommonCrawl by KenLM "
        "perplexity before sampling.  Score = the bit-strict "
        "doc_kneser_ney_logprob average (higher avg_logprob = lower "
        "perplexity = head); ties break on doc_id so the order is "
        "total.  The tercile is operators/relational.py::"
        "distributed_ntile — NTILE(3) via the two-pass range-bucket "
        "prefix-count plan (no single-partition global sort; the only "
        "global structures are the 256-row bucket-count table and a "
        "1-row total, both broadcast), row-for-row identical to the "
        "window form, which is exactly what the oracle runs.",
)
def q_perplexity_terciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.relational import (
        distributed_ntile,
    )

    scores = _kn_doc_scores(spark, sf_dir)
    banded = distributed_ntile(
        scores, "avg_logprob", "doc_id", n=3, ascending=False
    )
    return banded.select(
        "doc_id",
        "n_bigrams",
        "avg_logprob",
        "tile",
        F.when(F.col("tile") == 1, F.lit("head"))
        .when(F.col("tile") == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("band"),
    )


# ===========================================================================
# Round 13: CJK-aware dedup/search wiring (r12 VERDICT ask #5) — the
# tokenize_mixed segmentation reaches the MinHash shingle and BM25
# posting paths, each behind a segment_cjk flag with a full oracle.
# ===========================================================================

# the shared Java-regex/RE2 class body, embedded in oracle SQL below
from etl_tiki_webscraping_spark.functions.text import (  # noqa: E402
    NO_SPACE_SCRIPT_CLASS as NO_SPACE_SCRIPT_CLASS_SQL,
)

def _cjk_neardup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic CJK near-duplicate corpus: docs pair on
    ``doc_id div 2`` — both halves share a 24-char Han + 8-char kana
    body derived from md5 of the pair id, and the ODD half appends a
    4-char Han suffix (md5 of its own id), so each pair's bigram-
    shingle Jaccard is ~0.90 (>= the 0.8 threshold) while cross-pair
    similarity is ~0.  Without CJK segmentation each run is ONE
    whitespace token and the pair shares NOTHING (the blindness the
    segment_cjk flag fixes — pinned in tests/test_dedup.py)."""
    pair = F.expr("doc_id div 2").cast("string")
    hp = F.md5(F.concat(F.lit("p:"), pair))
    hs = F.md5(F.concat(F.lit("s:"), F.col("doc_id").cast("string")))
    body = F.concat(
        F.translate(F.substring(hp, 1, 24), _CJK_HEX, _CJK_HAN16),
        F.lit(" "),
        F.translate(F.substring(hp, 25, 8), _CJK_HEX, _CJK_KANA16),
    )
    suffix = F.when(
        F.col("doc_id") % 2 == 1,
        F.concat(
            F.lit(" "),
            F.translate(F.substring(hs, 1, 4), _CJK_HEX, _CJK_HAN16),
        ),
    ).otherwise(F.lit(""))
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", F.concat(body, suffix).alias("text")
    )


def _cjk_neardup_docs_sql() -> str:
    return f"""
    cjk_pairs AS (
        SELECT doc_id,
               translate(substring(md5('p:' || (doc_id // 2)), 1, 24),
                         '{_CJK_HEX}', '{_CJK_HAN16}')
               || ' ' ||
               translate(substring(md5('p:' || (doc_id // 2)), 25, 8),
                         '{_CJK_HEX}', '{_CJK_KANA16}')
               || CASE WHEN doc_id % 2 = 1
                       THEN ' ' || translate(
                           substring(md5('s:' || doc_id), 1, 4),
                           '{_CJK_HEX}', '{_CJK_HAN16}')
                       ELSE '' END AS text
        FROM documents
    )"""


@register(
    "dedup_minhash_cjk",
    oracle=f"""
    WITH {_cjk_neardup_docs_sql()},
    {_minhash_lsh_ctes(src="cjk_pairs", segment_cjk=True)},
    dup AS (SELECT DISTINCT id_b FROM edges)
    SELECT d.doc_id
    FROM cjk_pairs d LEFT JOIN dup ON dup.id_b = d.doc_id
    WHERE dup.id_b IS NULL
    """,
    doc="MinHash+LSH near-dup removal over a NO-SPACE-SCRIPT corpus "
        "with segment_cjk=True (r12 VERDICT ask #5): the signature "
        "kernel tokenizes through the Python twin of functions.text."
        "tokenize_mixed (character bigrams for CJK runs; "
        "dedup.py::minhash_analysis_udf), then the standard shingle -> "
        "64-hash signature -> 16-band bucket join -> exact-Jaccard "
        ">= 0.8 -> drop-higher-id chain.  The corpus pairs docs on "
        "doc_id div 2 (~0.90 pair Jaccard under bigram shingles); "
        "WITHOUT the flag every Han/kana run is one whitespace token "
        "and zero pairs are caught — the blindness this closes.  The "
        "DuckDB oracle replays the ENTIRE pipeline (fixture synthesis, "
        "mixed tokenization with the shared \\x{{...}} class body, "
        "md5-prefix base hashes, seeded universal-hash literals, band "
        "buckets, cap-1024, hset Jaccard).  Same 100 TB shape as "
        "dedup_minhash_lsh: bare (bucket, id) exchanges, blobs/text "
        "never shuffle.",
)
def q_minhash_cjk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.dedup import minhash_dedup

    docs = _cjk_neardup_docs(spark, sf_dir)
    return minhash_dedup(
        docs, "text", "doc_id", threshold=0.8, segment_cjk=True
    ).select("doc_id")


@register(
    "bm25_search_cjk",
    oracle=rf"""
    WITH {_cjk_mixed_docs_sql().rstrip().rstrip(',')},
    d AS (
        SELECT doc_id,
               flatten(list_transform(
                   list_filter(string_split_regex(
                       regexp_replace(lower(text),
                           '[^a-z0-9{NO_SPACE_SCRIPT_CLASS_SQL}]+', ' ', 'g'),
                       '\s+'), x -> x <> ''),
                   t -> CASE WHEN regexp_matches(
                                      t, '^[{NO_SPACE_SCRIPT_CLASS_SQL}]+$')
                                  AND length(t) >= 2
                        THEN list_transform(range(1, length(t)::BIGINT),
                                            i -> substring(t, i::INT, 2))
                        ELSE [t] END)) AS toks
        FROM cjk_mixed
    ),
    dd AS (SELECT doc_id, toks, len(toks) AS dl FROM d),
    stats AS (SELECT COUNT(*) AS n_docs,
                     CAST(SUM(dl) AS DOUBLE)/COUNT(*) AS avgdl FROM dd),
    postings AS (
        SELECT doc_id, dl, term, COUNT(*) AS tf
        FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dd)
        GROUP BY doc_id, dl, term
    ),
    dft AS (SELECT term, COUNT(*) AS dft FROM postings GROUP BY term),
    q(query_id, term) AS (VALUES
        ('q1','日月'),('q1','火水'),('q2','あい'),('q2','かき'),
        ('q3','the'),('q3','田中'),('q4','山川')),
    scored AS (
        SELECT q.query_id, p.doc_id,
               SUM(CAST(ln(1 + (s.n_docs - f.dft + 0.5)/(f.dft + 0.5))
                   * (p.tf * 2.2) / (p.tf + 1.2*(0.25 + 0.75*p.dl/s.avgdl))
                   AS DECIMAL(18,8))) AS score_dec
        FROM postings p JOIN q ON p.term = q.term
        JOIN dft f ON f.term = p.term CROSS JOIN stats s
        GROUP BY q.query_id, p.doc_id
    )
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY score_dec DESC, doc_id) AS rank,
           CAST(score_dec AS DOUBLE) AS score
    FROM scored
    QUALIFY rank <= 10
    """,
    doc="BM25 ranked retrieval over a MIXED-SCRIPT corpus with "
        "segment_cjk=True (operators/retrieval.py::tokenize_cjk, r12 "
        "VERDICT ask #5): non-alnum/non-CJK characters become "
        "separators, then no-space-script runs index as overlapping "
        "character bigrams — the standard CJK IR treatment — so Han/"
        "kana query terms actually match postings (under whitespace "
        "tokenization a CJK sentence is ONE term and recall is zero).  "
        "Query mixes Han bigrams, kana bigrams, and an English "
        "stopword over the gopher_repetition_cjk fixture corpus "
        "(deterministic md5 -> Han/kana translate, so the oracle "
        "rebuilds byte-identical input).  Same plan shape as "
        "bm25_search: one explode+groupBy postings shuffle, broadcast "
        "corpus stats and query terms, DECIMAL(18,8) order-free "
        "contributions, row_number top-10.",
)
def q_bm25_cjk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.retrieval import bm25_topk

    docs = _cjk_mixed_docs(spark, sf_dir)
    queries = spark.createDataFrame(
        [
            ("q1", "日月"), ("q1", "火水"), ("q2", "あい"), ("q2", "かき"),
            ("q3", "the"), ("q3", "田中"), ("q4", "山川"),
        ],
        "query_id string, term string",
    )
    return bm25_topk(docs, queries, segment_cjk=True)


@register(
    "udtf_sliding_chunks",
    oracle=r"""
    WITH d AS (
        SELECT doc_id,
               list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                           x -> x <> '') AS toks
        FROM documents
    ),
    sized AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
    win AS (
        SELECT doc_id, toks, n, CAST(r.i AS INT) AS chunk_idx,
               CAST(r.i * 24 AS INT) AS start_tok
        FROM sized, unnest(range(0, (n - 1) // 24 + 1)) AS r(i)
    )
    SELECT doc_id, chunk_idx, start_tok,
           CAST(LEAST(start_tok + 32, n) - start_tok AS INT) AS n_tokens,
           array_to_string(
               list_slice(toks, start_tok + 1, LEAST(start_tok + 32, n)),
               ' ') AS chunk_text
    FROM win
    """,
    doc="Spark-4 Python UDTF tier (operators/udtf.py, r12 VERDICT ask "
        "#7 — probed working in this container: plain, Arrow-optimized, "
        "LATERAL, and TABLE-argument forms, unlike the blocked "
        "transformWithStateInPandas): the idiomatic port of the "
        "reference's PythonOperator-as-row-producer framing (dags/"
        "etl.py:25-120) — a table-in/table-out Python function INSIDE "
        "the query plan.  The function is the RAG/embedding context-"
        "window chunker: overlapping 32-token windows every 24 tokens "
        "(8-token overlap, trailing partial window kept — the R1 "
        "tail-loss-free contract), 1->N fan-out streamed through the "
        "Arrow channel (useArrow=True).  The DuckDB oracle replays the "
        "window arithmetic and slicing exactly (strings, integer "
        "ranks).  Scale shape: fully distributed per-partition "
        "evaluation, no shuffle at all in the chunk stage; Catalyst "
        "sees a black box, so the projection happens BEFORE the call.",
)
def q_udtf_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.operators.udtf import sliding_chunks

    docs = load_table(spark, sf_dir, "documents")
    return sliding_chunks(spark, docs, chunk_tokens=32, stride=24)


@register(
    "webp_image_stats",
    oracle="""
    WITH ids AS (
        SELECT doc_id AS media_id FROM documents WHERE doc_id % 12 = 2
    ),
    px AS (
        SELECT media_id, (media_id + 7 * y + 11 * x) % 256 AS v
        FROM ids, unnest(range(0, 16)) AS a(y), unnest(range(0, 16)) AS b(x)
    )
    SELECT media_id, 16 AS width, 16 AS height,
           CAST(SUM(v * 1000000) AS BIGINT) AS luma_units
    FROM px GROUP BY media_id
    """,
    doc="REAL WebP-lossless (VP8L) decode, oracle-checked end to end "
        "through the codec (r12 VERDICT ask #1 — WebP is a large and "
        "growing share of modern web crawls and previously landed in "
        "the generic quarantine): per selected document a 16x16 gray "
        "image (px(y,x) = (id + 7y + 11x) mod 256, the png_image_stats "
        "scheme on a disjoint doc_id slice) is synthesized at query "
        "time by the package's own VP8L writer (operators/webp.py::"
        "encode_webp_lossless with the SUBTRACT-GREEN transform, so a "
        "real transform sits in the verified path) — canonical Huffman "
        "literal streams inside a spec-shaped RIFF/WEBP/VP8L container "
        "— then decoded back through the shared _decode_image_impl "
        "dispatch (strict RIFF + signature + version sniff, full "
        "Huffman/transform machinery).  VP8L is LOSSLESS and the gray "
        "luma is exactly the stored value, so the DuckDB oracle "
        "replays the pixel formula directly — no codec, no float "
        "tolerance (integer-valued float32 is exact under the "
        "1e-6-unit fold).  Scale shape identical to png_image_stats: "
        "1->1 mapInPandas (Arrow both ways), blobs never cross an "
        "exchange, the only shuffle carries (media_id, 3 ints).",
)
def q_webp_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.multimodal import (
        extract_image_features,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 12 == 2)
        .select(F.col("doc_id").alias("media_id"))
    )

    def build(d: int) -> bytes:
        import numpy as np

        from etl_tiki_webscraping_spark.operators.webp import (
            encode_webp_lossless,
        )

        y, x = np.mgrid[0:16, 0:16]
        return encode_webp_lossless(
            ((d + 7 * y + 11 * x) % 256).astype(np.uint8),
            subtract_green=True,
        )

    blob_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "content": b["media_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = _par_ids(ids).mapInPandas(gen, blob_schema)
    feats = extract_image_features(blobs)
    return feats.select(
        "media_id",
        "width",
        "height",
        F.aggregate(
            "feature",
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.floor(x * F.lit(1e6) + F.lit(0.5)).cast("long"),
        ).alias("luma_units"),
    )


@register(
    "flac_audio_features",
    oracle=r"""
    WITH ids AS (
        SELECT doc_id AS media_id FROM documents WHERE doc_id % 12 = 3
    ),
    s AS (
        SELECT media_id, r.t,
               CASE WHEN media_id % 2 = 0
                    THEN abs(((r.t * 389 + media_id * 7) % 2048) - 1024)
                         * 20 - 10240
                    ELSE CAST(('0x' || substr(md5(media_id || ':' || r.t),
                                              1, 4)) AS BIGINT) - 32768
               END AS v
        FROM ids, unnest(range(0, 512)) AS r(t)
    ),
    feats AS (
        SELECT media_id, COUNT(*) AS n, MAX(abs(v)) AS peak,
               SUM(abs(v)) AS sab
        FROM s GROUP BY media_id
    ),
    zc AS (
        SELECT media_id,
               SUM(CASE WHEN v * next_v < 0 THEN 1 ELSE 0 END) AS z
        FROM (SELECT media_id, v,
                     LEAD(v) OVER (PARTITION BY media_id ORDER BY t)
                         AS next_v
              FROM s)
        WHERE next_v IS NOT NULL
        GROUP BY media_id
    )
    SELECT f.media_id, CAST(f.n AS INT) AS n_samples,
           CAST(f.peak AS INT) AS peak_units,
           CAST(z.z AS INT) AS zero_crossings,
           CAST(f.sab AS BIGINT) AS sum_abs_units
    FROM feats f JOIN zc z USING (media_id)
    """,
    doc="REAL FLAC decode, oracle-checked end to end through the codec "
        "(r12 VERDICT ask #4 — compressed audio; previously the audio "
        "leg was 16-bit PCM WAV only): per selected document a 512-"
        "sample mono 16-bit waveform is synthesized at query time — "
        "even docs an integer triangle wave (fixed-predictor-friendly), "
        "odd docs md5-derived white noise (Rice-parameter stress; both "
        "formulas pure integer/md5 arithmetic an external engine "
        "replays) — encoded by the package's own FLAC writer "
        "(operators/flac.py: CRC-8/CRC-16-framed, best-of fixed "
        "predictors, Rice residuals, MD5 signature) and decoded back "
        "through extract_audio_pcm_features (strict full-verification "
        "decode).  FLAC is LOSSLESS, so the INTEGER features (peak, "
        "zero crossings, exact |PCM| sum — no float RMS in the oracle "
        "path) replay from first principles, bit-strict.  Scale shape: "
        "1->1 mapInPandas, blobs never shuffle.",
)
def q_flac_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.multimodal import (
        extract_audio_pcm_features,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 12 == 3)
        .select(F.col("doc_id").alias("media_id"))
    )

    def build(d: int) -> bytes:
        from hashlib import md5 as _md5

        import numpy as np

        from etl_tiki_webscraping_spark.operators.flac import encode_flac

        t = np.arange(512, dtype=np.int64)
        if d % 2 == 0:
            pcm = np.abs(((t * 389 + d * 7) % 2048) - 1024) * 20 - 10240
        else:
            pcm = np.array(
                [
                    int(_md5(f"{d}:{i}".encode()).hexdigest()[:4], 16) - 32768
                    for i in range(512)
                ],
                dtype=np.int64,
            )
        return encode_flac(pcm)

    blob_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "content": b["media_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = _par_ids(ids).mapInPandas(gen, blob_schema)
    return extract_audio_pcm_features(blobs)


def _audio_quarantine_blob(d: int) -> bytes:
    """The audio_format_quarantine fixture builder (module-level so the
    streaming twin synthesizes byte-identical blobs per micro-batch)."""
    from hashlib import md5 as _md5

    import numpy as np

    from etl_tiki_webscraping_spark.operators.flac import encode_flac
    from etl_tiki_webscraping_spark.operators.multimodal import (
        encode_wav_tone,
    )

    j = (d // 12) % 7
    if j == 0:
        return encode_wav_tone(200 + (d % 20) * 10, n_samples=256)
    if j in (1, 5):
        t = np.arange(256, dtype=np.int64)
        pcm = np.abs(((t * 389 + d * 7) % 2048) - 1024) * 20 - 10240
        enc = encode_flac(pcm)
        if j == 5:
            ba = bytearray(enc)
            ba[60] ^= 0x40  # inside frame 1: CRC/MD5 must reject
            return bytes(ba)
        return enc
    junk = b"".join(
        _md5(f"j:{d}:{i}".encode()).digest() for i in range(4)
    )
    if j == 2:
        return b"ID3\x03\x00" + junk
    if j == 3:
        # FF FB (MPEG-1 Layer III) + a VALID third byte (bitrate idx 9,
        # sample-rate idx 0): the r14 sniff validates version/layer/
        # bitrate/samplerate bits (ADVICE r13), so md5 junk in byte 2
        # would flip ~30% of these to 'unknown' against the oracle
        return b"\xff\xfb\x92" + junk
    if j == 4:
        return b"OggS" + junk
    return b"\x00\x01" + junk  # unsniffable



@register(
    "audio_format_quarantine",
    oracle="""
    SELECT doc_id AS media_id,
           CASE (doc_id // 12) % 7
                WHEN 0 THEN 'wav'  WHEN 1 THEN 'flac'
                WHEN 2 THEN 'mp3'  WHEN 3 THEN 'mp3'
                WHEN 4 THEN 'ogg'  WHEN 5 THEN 'flac'
                ELSE 'unknown' END AS container,
           (doc_id // 12) % 7 IN (0, 1) AS decodable,
           CASE WHEN (doc_id // 12) % 7 IN (0, 1) THEN 256 END AS n_samples
    FROM documents WHERE doc_id % 12 = 4
    """,
    doc="Per-format audio ingest triage (r12 VERDICT ask #4: coverage "
        "loss must be measurable PER CONTAINER, not one generic bucket) "
        "— strict magic sniff (RIFF/WAVE, fLaC, OggS, ID3v2 tag, MPEG "
        "sync word) + a REAL decode attempt per blob "
        "(multimodal.py::sniff_audio_formats): the fixture cycles "
        "through a real WAV tone, a real FLAC, ID3- and sync-word MP3 "
        "heads, an Ogg head, a BIT-FLIPPED FLAC (container 'flac' but "
        "decodable=false — the CRC/MD5 verification catching silent "
        "corruption, per-format quarantine in action), and unsniffable "
        "garbage.  The ground-truth class is a pure doc_id formula, so "
        "the oracle replays what every sniff + decode MUST conclude — "
        "a misrouting sniff or a decoder accepting corrupt bytes "
        "hash-mismatches.  Scale shape: one Arrow-batched mapInPandas "
        "pass, blobs never shuffle.",
)
def q_audio_format_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.multimodal import (
        sniff_audio_formats,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 12 == 4)
        .select(F.col("doc_id").alias("media_id"))
    )

    build = _audio_quarantine_blob

    blob_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "content": b["media_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = ids.mapInPandas(gen, blob_schema)
    return sniff_audio_formats(blobs)


@register(
    "audio_stream_metadata",
    oracle="""
    WITH ids AS (
        SELECT doc_id, (doc_id // 12) % 4 AS k
        FROM documents WHERE doc_id % 12 = 6
    )
    SELECT doc_id AS media_id,
           CASE WHEN k = 2 THEN 'ogg' ELSE 'mp3' END AS container,
           CASE WHEN k IN (0, 1) THEN 'mp3'
                WHEN k = 2 THEN CASE doc_id % 3 WHEN 0 THEN 'vorbis'
                                     WHEN 1 THEN 'opus' ELSE 'theora' END
           END AS codec,
           CAST(CASE WHEN k = 2 AND doc_id % 3 < 2
                     THEN 1 + doc_id % 2 END AS INT) AS channels,
           CAST(CASE k WHEN 0 THEN 8 + doc_id % 7
                       WHEN 1 THEN 2 * (4 + doc_id % 5)
                       WHEN 2 THEN 3 + doc_id % 5 END AS INT) AS n_units,
           CAST(CASE k WHEN 0 THEN
                           CASE doc_id % 3 WHEN 0 THEN 44100
                                WHEN 1 THEN 48000 ELSE 32000 END
                       WHEN 1 THEN 44100
                       WHEN 2 THEN CASE doc_id % 3
                                WHEN 0 THEN 8000 * (1 + doc_id % 6)
                                WHEN 1 THEN 48000 END
                END AS INT) AS sample_rate,
           CAST(CASE k WHEN 0 THEN ((8 + doc_id % 7) * 1152 * 1000)
                           // (CASE doc_id % 3 WHEN 0 THEN 44100
                                    WHEN 1 THEN 48000 ELSE 32000 END)
                       WHEN 1 THEN (2 * (4 + doc_id % 5) * 1152 * 1000)
                           // 44100
                       WHEN 2 THEN CASE doc_id % 3
                           WHEN 0 THEN (doc_id * 441 + 17) * 1000
                                       // (8000 * (1 + doc_id % 6))
                           WHEN 1 THEN greatest(doc_id * 441 + 17
                                       - (312 + doc_id % 100), 0) * 1000
                                       // 48000 END
                END AS BIGINT) AS duration_ms,
           CASE k WHEN 0 THEN FALSE WHEN 1 THEN TRUE END AS vbr,
           CAST(CASE WHEN k = 2 THEN doc_id * 441 + 17 END
                AS BIGINT) AS last_granule
    FROM ids
    """,
    doc="Header-only compressed-audio STREAM METADATA (operators/"
        "audiometa.py, round-13): the triage a 100 TB crawl runs on "
        "audio it will not decode — MP3 frame walks (strict MPEG-1 "
        "Layer III headers, frame sizes tiling the buffer, ID3v2 "
        "syncsafe skip) yield n_frames / sample_rate / duration_ms / "
        "VBR-ness; Ogg page walks (27-byte headers, lacing tables, "
        "per-page CRC-32 VERIFIED) yield n_pages / last granule, plus "
        "codec identity from the first packet's fixed-layout ident "
        "header (r14, VERDICT ask #5): Vorbis (channels / rate / "
        "nominal bitrate), Opus (RFC 7845 OpusHead), and a Theora "
        "magic routed to the distinct video-in-Ogg quarantine class.  "
        "The "
        "fixture cycles CBR MP3, VBR MP3 with an ID3 tag, CRC-correct "
        "Ogg pages, and a TRUNCATED MP3 the strict parser must reject "
        "into the per-format NULL quarantine row.  Ground truth is "
        "pure doc_id arithmetic, so the oracle replays what every "
        "walk must conclude — bit-strict, all integers.  Scale shape: "
        "one Arrow-batched mapInPandas pass, blobs never shuffle.",
)
def q_audio_stream_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.audiometa import (
        extract_audio_stream_metadata,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 12 == 6)
        .select(F.col("doc_id").alias("media_id"))
    )

    def build(d: int) -> bytes:
        from etl_tiki_webscraping_spark.operators.audiometa import (
            encode_mp3_frames,
            encode_ogg_pages,
        )

        k = (d // 12) % 4
        if k == 0:
            return encode_mp3_frames(
                [1 + d % 14] * (8 + d % 7), sr_idx=d % 3, seed=d
            )
        if k == 1:
            return encode_mp3_frames(
                [5, 10] * (4 + d % 5), sr_idx=0,
                id3_size=50 + d % 100, seed=d,
            )
        if k == 2:
            from etl_tiki_webscraping_spark.operators.audiometa import (
                encode_opus_head,
                encode_vorbis_ident,
            )

            if d % 3 == 0:
                ident = encode_vorbis_ident(
                    1 + d % 2, 8000 * (1 + d % 6), 64_000 * (1 + d % 3)
                )
            elif d % 3 == 1:
                ident = encode_opus_head(1 + d % 2, 48000, 312 + d % 100)
            else:  # video-in-Ogg: the distinct quarantine route
                ident = b"\x80theora" + bytes(
                    bytearray((d + i) % 256 for i in range(20))
                )
            return encode_ogg_pages(
                3 + d % 5, serial=d & 0xFFFFFFFF,
                final_granule=d * 441 + 17, seed=d, ident=ident,
            )
        return encode_mp3_frames([9] * 6, seed=d)[:-3]  # truncated

    blob_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "content": b["media_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = ids.mapInPandas(gen, blob_schema)
    return extract_audio_stream_metadata(blobs)


@register(
    "udtf_mp3_frames",
    oracle="""
    WITH ids AS (
        SELECT doc_id AS media_id FROM documents WHERE doc_id % 12 = 8
    ),
    br(idx, kbps) AS (VALUES (1,32),(2,40),(3,48),(4,56),(5,64),(6,80),
        (7,96),(8,112),(9,128),(10,160),(11,192),(12,224),(13,256),
        (14,320)),
    fr AS (
        SELECT media_id, CAST(r.i AS INT) AS frame_idx,
               1 + (media_id + r.i) % 14 AS bidx,
               CAST(r.i % 2 AS INT) AS pad
        FROM ids, unnest(range(0, 6 + media_id % 5)) AS r(i)
    )
    SELECT media_id, frame_idx, CAST(b.kbps AS INT) AS bitrate_kbps,
           CAST((144000 * b.kbps) // 44100 + pad AS INT) AS frame_bytes
    FROM fr JOIN br b ON b.idx = fr.bidx
    """,
    doc="Python UDTF over BINARY media (the sliding-chunk UDTF's 1->N "
        "sibling, round-13): each MP3 blob lateral-expands into one row "
        "per FRAME — (frame_idx, bitrate_kbps, frame_bytes) from the "
        "strict MPEG-1 Layer III walk in operators/audiometa.py, "
        "streamed through the Arrow UDTF channel (TABLE(...) form).  "
        "The fixture gives every doc a per-frame bitrate schedule "
        "1 + (doc_id + i) mod 14 with alternating padding, so the "
        "DuckDB oracle replays every frame size from the bitrate "
        "table — a parser that mis-walks one boundary shifts every "
        "later frame and hash-mismatches.  Scale shape: fully "
        "distributed per-partition evaluation, no shuffle.",
)
def q_udtf_mp3_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.udtf import mp3_frames

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 12 == 8)
        .select(F.col("doc_id").alias("media_id"))
    )

    def build(d: int) -> bytes:
        from etl_tiki_webscraping_spark.operators.audiometa import (
            encode_mp3_frames,
        )

        return encode_mp3_frames(
            [1 + (d + i) % 14 for i in range(6 + d % 5)], sr_idx=0, seed=d
        )

    blob_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "content": b["media_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = _par_ids(ids).mapInPandas(gen, blob_schema)
    return mp3_frames(spark, blobs)


_STREAM_TRIAGE: dict = {}


@register(
    "streaming_media_triage",
    oracle="""
    WITH ids AS (
        SELECT doc_id, (doc_id // 12) % 7 AS k
        FROM documents WHERE doc_id % 12 = 4
    ),
    cls AS (
        SELECT CASE k WHEN 0 THEN 'wav' WHEN 1 THEN 'flac'
                      WHEN 2 THEN 'mp3' WHEN 3 THEN 'mp3'
                      WHEN 4 THEN 'ogg' WHEN 5 THEN 'flac'
                      ELSE 'unknown' END AS container,
               k IN (0, 1) AS decodable,
               CASE WHEN k IN (0, 1) THEN 256 ELSE 0 END AS ns
        FROM ids
    )
    SELECT container, decodable,
           CAST(COUNT(*) AS BIGINT) AS n_blobs,
           CAST(SUM(ns) AS BIGINT) AS n_samples_total
    FROM cls GROUP BY container, decodable
    """,
    doc="STREAMING twin of the per-format audio triage: a REAL "
        "multi-micro-batch run (maxFilesPerTrigger=1, AvailableNow "
        "over a 3-file staged copy of the media ids); each micro-batch "
        "synthesizes its blobs (the audio_format_quarantine fixture "
        "classes), runs the strict sniff + decode triage "
        "(multimodal.py::sniff_audio_formats), and appends per-blob "
        "verdicts.  Triage is per-document, so batch boundaries cannot "
        "change the answer — exactly why it streams safely stateless — "
        "and the committed sink rollup (blobs + decoded samples per "
        "(container, decodable)) must equal the batch ground-truth "
        "replay (the oracle).  The crawl-ingest shape: media arrives "
        "continuously, triage/quarantine accounting runs incrementally.",
)
def q_streaming_media_triage(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _STREAM_TRIAGE.get(sf_dir)
    if out is None:
        import tempfile

        from pyspark.sql import types as T

        from etl_tiki_webscraping_spark.operators.multimodal import (
            sniff_audio_formats,
        )

        root = tempfile.mkdtemp(prefix="stream-triage-")
        src, sink_dir = root + "/src", root + "/verdicts"
        ids = (
            load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 12 == 4)
            .select(F.col("doc_id").alias("media_id"))
        )
        ids.repartition(3).write.parquet(src)

        blob_schema = T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("content", T.BinaryType(), False),
            ]
        )

        def triage(batch_df, _batch_id: int) -> None:
            # same deterministic fixture builder as audio_format_quarantine
            def gen(batches):
                import pandas as pd

                build = _audio_quarantine_blob
                for b in batches:
                    yield pd.DataFrame(
                        {
                            "media_id": b["media_id"],
                            "content": b["media_id"].map(
                                lambda d: build(int(d))
                            ),
                        }
                    )

            blobs = batch_df.mapInPandas(gen, blob_schema)
            sniff_audio_formats(blobs).write.mode("append").parquet(sink_dir)

        q = (
            spark.readStream.schema("media_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(triage)
            .option("checkpointLocation", root + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming media triage did not finish")
        out = sink_dir
        _STREAM_TRIAGE[sf_dir] = out
    return (
        spark.read.parquet(out)
        .groupBy("container", "decodable")
        .agg(
            F.count(F.lit(1)).alias("n_blobs"),
            F.sum(F.coalesce(F.col("n_samples"), F.lit(0))).alias(
                "n_samples_total"
            ),
        )
    )


@register(
    "png_palette_stats",
    oracle="""
    WITH ids AS (
        SELECT doc_id AS media_id FROM documents WHERE doc_id % 12 = 10
    ),
    px AS (
        SELECT media_id,
               (media_id * 31 + ((y * 3 + x * 5 + media_id) % 16) * 17)
                   % 256 AS v
        FROM ids, unnest(range(0, 16)) AS a(y), unnest(range(0, 16)) AS b(x)
    )
    SELECT media_id, 16 AS width, 16 AS height,
           CAST(SUM(v * 1000000) AS BIGINT) AS luma_units
    FROM px GROUP BY media_id
    """,
    doc="REAL PALETTED PNG decode (color type 3, 4-bit sub-byte "
        "indices — the GIF-converted-PNG variant real crawls carry), "
        "oracle-checked end to end through the codec: per selected "
        "document a 16x16 image is synthesized at query time as 4-bit "
        "palette indices idx(y,x) = (3y + 5x + id) mod 16 over a "
        "16-entry GRAY palette v_k = (31*id + 17*k) mod 256, written "
        "by encode_png(palette=..., bit_depth=4) — MSB-first bit "
        "packing, filtering on the packed bytes with bpp=1, PLTE — "
        "and decoded back through the shared dispatch (strict PLTE "
        "presence + index-range checks).  Gray palettes return the "
        "stored value exactly (the WebP gray-luma rule), so the DuckDB "
        "oracle replays the palette formula directly — lossless, no "
        "float tolerance.  Scale shape identical to png_image_stats: "
        "1->1 mapInPandas, blobs never shuffle.",
)
def q_png_palette_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.multimodal import (
        extract_image_features,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 12 == 10)
        .select(F.col("doc_id").alias("media_id"))
    )

    def build(d: int) -> bytes:
        import numpy as np

        from etl_tiki_webscraping_spark.operators.multimodal import encode_png

        pal = [((d * 31 + k * 17) % 256,) * 3 for k in range(16)]
        y, x = np.mgrid[0:16, 0:16]
        idx = ((y * 3 + x * 5 + d) % 16).astype(np.uint8)
        return encode_png(idx, palette=pal, bit_depth=4)

    blob_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "content": b["media_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = ids.mapInPandas(gen, blob_schema)
    feats = extract_image_features(blobs)
    return feats.select(
        "media_id",
        "width",
        "height",
        F.aggregate(
            "feature",
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.floor(x * F.lit(1e6) + F.lit(0.5)).cast("long"),
        ).alias("luma_units"),
    )


_CJK_HANG16 = "가나다라마바사아자차카타파하거너"
_CJK_THAI16 = "กขคงจฉชซญดตถทนบป"


def _langid_script_oracle() -> str:
    """Script-aware classifier replay: the mixed fixture, the script
    strip-counts with the SAME \\x{...} range strings as the Spark
    expression, and the stopword fallback from the SAME STOPWORDS
    table (both single sources of truth)."""
    from etl_tiki_webscraping_spark.functions.text import (
        SCRIPT_RANGES,
        STOPWORDS,
    )

    lang_values = ", ".join(
        "('{}', [{}])".format(lang, ", ".join(f"'{w}'" for w in words))
        for lang, words in STOPWORDS.items()
    )
    r = SCRIPT_RANGES
    return rf"""
    WITH langid_mix AS (
        SELECT doc_id,
               CASE doc_id % 5
                 WHEN 0 THEN translate(substring(md5('L:' || doc_id), 1, 24),
                                       '{_CJK_HEX}', '{_CJK_HAN16}')
                 WHEN 1 THEN translate(substring(md5('L:' || doc_id), 1, 12),
                                       '{_CJK_HEX}', '{_CJK_HAN16}')
                          || translate(substring(md5('L:' || doc_id), 13, 8),
                                       '{_CJK_HEX}', '{_CJK_KANA16}')
                 WHEN 2 THEN translate(substring(md5('L:' || doc_id), 1, 24),
                                       '{_CJK_HEX}', '{_CJK_HANG16}')
                 WHEN 3 THEN translate(substring(md5('L:' || doc_id), 1, 24),
                                       '{_CJK_HEX}', '{_CJK_THAI16}')
                 ELSE 'the quick brown fox and the lazy dog '
                      || substring(coalesce(text, ''), 1, 30)
               END AS text
        FROM documents
    ),
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         t -> t <> '') AS tok
      FROM langid_mix
    ),
    langs(lang, words) AS (VALUES {lang_values}),
    scores AS (
      SELECT doc_id, lang,
             len(list_filter(tok, t -> list_contains(words, t))) AS v
      FROM toks CROSS JOIN langs
    ),
    best AS (
      SELECT doc_id, lang, v,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY v DESC, lang DESC) AS rn
      FROM scores
    ),
    sw AS (
      SELECT doc_id, CASE WHEN v > 0 THEN lang ELSE 'und' END AS sp
      FROM best WHERE rn = 1
    ),
    cnts AS (
      SELECT doc_id,
             CAST(greatest(length(text), 1) AS DOUBLE) AS n,
             CAST(length(text) - length(regexp_replace(text,
                  '[{r["ja"]}]', '', 'g')) AS DOUBLE) AS kana,
             CAST(length(text) - length(regexp_replace(text,
                  '[{r["ko"]}]', '', 'g')) AS DOUBLE) AS ko,
             CAST(length(text) - length(regexp_replace(text,
                  '[{r["th"]}]', '', 'g')) AS DOUBLE) AS th,
             CAST(length(text) - length(regexp_replace(text,
                  '[{r["zh"]}]', '', 'g')) AS DOUBLE) AS zh
      FROM langid_mix
    )
    SELECT c.doc_id,
           CASE WHEN c.kana / c.n > 0.05 THEN 'ja'
                WHEN c.ko / c.n > 0.3 THEN 'ko'
                WHEN c.th / c.n > 0.3 THEN 'th'
                WHEN c.zh / c.n > 0.3 THEN 'zh'
                ELSE s.sp END AS pred_lang
    FROM cnts c JOIN sw s USING (doc_id)
    """


@register(
    "langid_script_mixed",
    oracle=_langid_script_oracle(),
    doc="script-aware language ID (functions/text.py::language_id_"
        "script, round-13): closes the stopword classifier's CJK "
        "blindspot — no-space scripts have NO whitespace-token "
        "stopwords, so plain language_id returns 'und' for every CJK/"
        "Thai document.  The script tier counts characters per "
        "codepoint range (the shared \\x{...} class strings) via one "
        "regexp strip per script: kana presence above 5% -> 'ja' "
        "(Japanese mixes Han + kana, so kana outranks the Han "
        "majority), then hangul/Thai/Han majorities, then the "
        "stopword fallback for spaced scripts.  The fixture cycles "
        "Han-only, Han+kana, hangul, Thai, and English texts "
        "(deterministic md5 -> translate), so every branch of the "
        "CASE chain is exercised; the oracle replays strip-counts, "
        "thresholds, and the stopword argmax from the same constant "
        "tables.  One codegen'd expression, no UDF, no shuffle.",
)
def q_langid_script_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.text import language_id_script

    h = F.md5(F.concat(F.lit("L:"), F.col("doc_id").cast("string")))
    text = (
        F.when(
            F.col("doc_id") % 5 == 0,
            F.translate(F.substring(h, 1, 24), _CJK_HEX, _CJK_HAN16),
        )
        .when(
            F.col("doc_id") % 5 == 1,
            F.concat(
                F.translate(F.substring(h, 1, 12), _CJK_HEX, _CJK_HAN16),
                F.translate(F.substring(h, 13, 8), _CJK_HEX, _CJK_KANA16),
            ),
        )
        .when(
            F.col("doc_id") % 5 == 2,
            F.translate(F.substring(h, 1, 24), _CJK_HEX, _CJK_HANG16),
        )
        .when(
            F.col("doc_id") % 5 == 3,
            F.translate(F.substring(h, 1, 24), _CJK_HEX, _CJK_THAI16),
        )
        .otherwise(
            F.concat(
                F.lit("the quick brown fox and the lazy dog "),
                F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 30),
            )
        )
    )
    mix = load_table(spark, sf_dir, "documents").select(
        "doc_id", text.alias("text")
    )
    return mix.select(
        "doc_id", language_id_script("text").alias("pred_lang")
    )


@register(
    "webp_variants_stats",
    oracle="""
    WITH ids AS (
        SELECT doc_id AS media_id FROM documents WHERE doc_id % 14 = 9
    ),
    px AS (
        SELECT media_id,
               CASE WHEN media_id % 3 = 0
                    THEN (media_id * 29
                          + ((y * 5 + x * 7 + media_id) % 16) * 13) % 256
                    ELSE (media_id + 7 * y + 11 * x) % 256
               END AS v
        FROM ids, unnest(range(0, 16)) AS a(y), unnest(range(0, 16)) AS b(x)
    )
    SELECT media_id, 16 AS width, 16 AS height,
           CAST(SUM(v * 1000000) AS BIGINT) AS luma_units
    FROM px GROUP BY media_id
    """,
    doc="VP8L decoder VARIANT coverage in the VERIFIED path (round-13; "
        "webp_image_stats covers subtract-green only): docs cycle "
        "THREE encodings by media_id mod 3 — (0) COLOR-INDEXED "
        "(16-entry gray palette, 4-bit sub-byte bundling: the palette "
        "transform + unbundling branches), (1) subtract-green + "
        "CONSTANT-MODE PREDICTOR (mode 2/Up) + COLOR CACHE (6 bits) + "
        "LZ77 LEFT RUNS (backward-reference + cache-hit + "
        "predictor-inverse branches), (2) subtract-green + META-"
        "HUFFMAN (two Huffman groups routed by the 8-px-block meta "
        "image — the multi-group recursion) — together with "
        "webp_image_stats, every encoder-reachable VP8L branch now "
        "sits under the driver's oracle gate, not just unit tests.  "
        "All variants are LOSSLESS over gray pixels (stored-channel "
        "luma), so the DuckDB oracle replays the pixel formulas "
        "directly.  Scale shape: 1->1 mapInPandas, blobs never "
        "shuffle.",
)
def q_webp_variants_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.multimodal import (
        extract_image_features,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 14 == 9)
        .select(F.col("doc_id").alias("media_id"))
    )

    def build(d: int) -> bytes:
        import numpy as np

        from etl_tiki_webscraping_spark.operators.webp import (
            encode_webp_lossless,
        )

        y, x = np.mgrid[0:16, 0:16]
        if d % 3 == 0:
            idx = ((y * 5 + x * 7 + d) % 16).astype(np.uint8)
            pal = np.array(
                [[(d * 29 + k * 13) % 256] * 3 for k in range(16)],
                dtype=np.uint8,
            )
            return encode_webp_lossless(pal[idx], palette=True)
        img = ((d + 7 * y + 11 * x) % 256).astype(np.uint8)
        if d % 3 == 1:
            return encode_webp_lossless(
                img, subtract_green=True, predictor_mode=2,
                cache_bits=6, lz77_left_runs=True,
            )
        return encode_webp_lossless(img, subtract_green=True, meta_split=True)

    blob_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "content": b["media_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = _par_ids(ids).mapInPandas(gen, blob_schema)
    feats = extract_image_features(blobs)
    return feats.select(
        "media_id",
        "width",
        "height",
        F.aggregate(
            "feature",
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.floor(x * F.lit(1e6) + F.lit(0.5)).cast("long"),
        ).alias("luma_units"),
    )


@register(
    "webp_lossy_meta",
    oracle="""
    WITH ids AS (
        SELECT doc_id, (doc_id // 14) % 4 AS k
        FROM documents WHERE doc_id % 14 = 3
    )
    SELECT doc_id AS media_id,
           CASE WHEN k = 2 THEN 'lossless'
                WHEN k = 1 THEN 'extended'
                ELSE 'lossy' END AS variant,
           CAST(CASE WHEN k IN (0, 1) THEN 1 + (doc_id * 37) % 4000
                     WHEN k = 2 THEN 4 + doc_id % 13 END AS INT) AS width,
           CAST(CASE WHEN k IN (0, 1) THEN 1 + (doc_id * 53) % 3000
                     WHEN k = 2 THEN 4 + doc_id % 13 END AS INT) AS height,
           CASE WHEN k = 3 THEN NULL
                WHEN k = 1 THEN doc_id % 2 = 1
                ELSE FALSE END AS has_alpha,
           CASE WHEN k = 3 THEN NULL
                WHEN k = 1 THEN (doc_id // 2) % 2 = 1
                ELSE FALSE END AS has_exif,
           CASE WHEN k = 3 THEN NULL
                WHEN k = 1 THEN (doc_id // 4) % 2 = 1
                ELSE FALSE END AS has_xmp,
           CAST(CASE WHEN k = 3 THEN NULL
                     WHEN k = 1 THEN 2 + (doc_id // 2) % 2 + (doc_id // 4) % 2
                     ELSE 1 END AS INT) AS n_chunks
    FROM ids
    """,
    doc="LOSSY-WebP (VP8/VP8X) header TRIAGE (operators/webp.py::"
        "parse_webp_header + extract_webp_meta — r13 VERDICT ask #1): "
        "the majority of real-crawl WebP is lossy and previously "
        "quarantined dimension-less; the audiometa pattern applied to "
        "the VP8 keyframe's 10-byte uncompressed header (frame tag "
        "validity, start code 9D 01 2A, 14-bit dimension words) and "
        "the VP8X extended header (feature flags, zero reserved bits, "
        "24-bit LE canvas size, inner-chunk validation) gives every "
        "variant dimensions and feature accounting with ZERO payload "
        "decode.  The fixture cycles a bare lossy file (pad-byte "
        "tiling exercised via odd first-partition sizes), a VP8X "
        "extended file wrapping a lossy image with doc_id-driven "
        "alpha/EXIF/XMP flags and stub metadata chunks, a REAL VP8L "
        "lossless encode (dimension extraction through the same walk), "
        "and a TRUNCATED lossy file the strict RIFF tiling must "
        "reject into the fourcc-sniffed per-variant quarantine row.  "
        "All outputs are doc_id arithmetic, so the oracle replays "
        "every header decision bit-strict.  Scale shape: one "
        "Arrow-batched 1->1 mapInPandas pass, blobs never shuffle.",
)
def q_webp_lossy_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.webp import extract_webp_meta

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 14 == 3)
        .select(F.col("doc_id").alias("media_id"))
    )

    def build(d: int) -> bytes:
        import numpy as np

        from etl_tiki_webscraping_spark.operators.webp import (
            encode_webp_extended,
            encode_webp_lossless,
            encode_webp_lossy_stub,
        )

        k = (d // 14) % 4
        if k == 2:
            s = 4 + d % 13
            y, x = np.mgrid[0:s, 0:s]
            img = ((d + 3 * y + 5 * x) % 256).astype(np.uint8)
            return encode_webp_lossless(img)
        w, h = 1 + (d * 37) % 4000, 1 + (d * 53) % 3000
        if k == 1:
            inner = encode_webp_lossy_stub(w, h, seed=d)
            return encode_webp_extended(
                inner,
                alpha=d % 2 == 1,
                exif=(d // 2) % 2 == 1,
                xmp=(d // 4) % 2 == 1,
                seed=d,
            )
        blob = encode_webp_lossy_stub(w, h, seed=d)
        return blob[:-3] if k == 3 else blob

    blob_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "content": b["media_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = ids.mapInPandas(gen, blob_schema)
    return extract_webp_meta(blobs).select(
        "media_id", "variant", "width", "height",
        "has_alpha", "has_exif", "has_xmp", "n_chunks",
    )


@register(
    "mp4_stream_metadata",
    oracle="""
    WITH ids AS (
        SELECT doc_id, (doc_id // 14) % 4 AS k
        FROM documents WHERE doc_id % 14 = 5
    )
    SELECT doc_id AS media_id,
           TRUE AS is_mp4,
           CASE k WHEN 0 THEN CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END
                  WHEN 1 THEN 'mp42'
                  WHEN 2 THEN 'M4A ' END AS brand,
           CAST(CASE k
                WHEN 0 THEN ((600 * (1 + doc_id % 4)) * (2 + doc_id % 30)
                             + doc_id % 11) * 1000
                            // (600 * (1 + doc_id % 4))
                WHEN 1 THEN (90000 * (2 + doc_id % 30) + doc_id % 17) * 1000
                            // 90000
                WHEN 2 THEN (44100 * (1 + doc_id % 8) + doc_id % 13) * 1000
                            // 44100
           END AS BIGINT) AS duration_ms,
           CAST(CASE k WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 1
                END AS INT) AS n_tracks,
           CASE k WHEN 0 THEN CASE doc_id % 3 WHEN 0 THEN 'avc1'
                                   WHEN 1 THEN 'hvc1' ELSE 'vp09' END
                  WHEN 1 THEN 'avc1,' || CASE WHEN doc_id % 2 = 0
                                   THEN 'mp4a' ELSE 'opus' END
                  WHEN 2 THEN 'mp4a' END AS codecs,
           CAST(CASE k WHEN 0 THEN 24 * (2 + doc_id % 30)
                       WHEN 1 THEN 130 + doc_id % 100 + doc_id % 50
                       WHEN 2 THEN 500 + doc_id % 200
                END AS BIGINT) AS total_samples
    FROM ids
    """,
    doc="MP4 / ISO-BMFF container TRIAGE (operators/mp4meta.py — r13 "
        "VERDICT ask #2): web video is MP4-dominant and had no triage "
        "leg (the only video path was MJPEG-in-AVI).  A strict "
        "header-only box walk — ftyp-first rule, exact box tiling at "
        "every nesting level, mvhd v0 AND v1 (64-bit duration) "
        "layouts, per-trak stsd first-entry codec fourcc, uniform-stsz "
        "sample counts — yields brand / duration_ms / track count / "
        "codec list / total samples with zero payload work.  The "
        "fixture cycles a single-video file (avc1/hvc1/vp09 by "
        "doc_id), a v1-mvhd video+audio mux (mp4a/opus), an audio-only "
        "M4A, and a TRUNCATED file the tiling check must reject into "
        "the ftyp-sniffed quarantine row (is_mp4 true, NULL stats).  "
        "Every constructor argument is doc_id arithmetic, so the "
        "oracle replays the full parse bit-strict.  Scale shape: one "
        "Arrow-batched 1->1 mapInPandas pass, blobs never shuffle.",
)
def q_mp4_stream_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.mp4meta import (
        extract_mp4_metadata,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 14 == 5)
        .select(F.col("doc_id").alias("media_id"))
    )

    def build(d: int) -> bytes:
        from etl_tiki_webscraping_spark.operators.mp4meta import (
            encode_mp4_stub,
        )

        k = (d // 14) % 4
        if k == 0:
            ts = 600 * (1 + d % 4)
            codec = ("avc1", "hvc1", "vp09")[d % 3]
            return encode_mp4_stub(
                brand="isom" if d % 2 == 0 else "mp42",
                timescale=ts,
                duration=ts * (2 + d % 30) + d % 11,
                tracks=[(codec, "vide", 24 * (2 + d % 30))],
                seed=d,
            )
        if k == 1:
            return encode_mp4_stub(
                brand="mp42",
                timescale=90000,
                duration=90000 * (2 + d % 30) + d % 17,
                tracks=[
                    ("avc1", "vide", 30 + d % 100),
                    ("mp4a" if d % 2 == 0 else "opus", "soun", 100 + d % 50),
                ],
                mvhd_version=1,
                seed=d,
            )
        if k == 2:
            return encode_mp4_stub(
                brand="M4A ",
                timescale=44100,
                duration=44100 * (1 + d % 8) + d % 13,
                tracks=[("mp4a", "soun", 500 + d % 200)],
                seed=d,
            )
        return encode_mp4_stub(seed=d)[:-7]  # truncated mdat tail

    blob_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "content": b["media_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = ids.mapInPandas(gen, blob_schema)
    return extract_mp4_metadata(blobs)


@register(
    "image_exif_meta",
    oracle="""
    WITH ids AS (
        SELECT doc_id, (doc_id // 14) % 4 AS k
        FROM documents WHERE doc_id % 14 = 7
    )
    SELECT doc_id AS media_id,
           CAST(CASE WHEN k < 3 THEN 5 + doc_id % 12 END AS INT) AS width,
           CAST(CASE WHEN k < 3 THEN 5 + (doc_id * 3) % 12 END AS INT)
               AS height,
           CASE WHEN k = 3 THEN NULL ELSE k = 1 END AS progressive,
           CAST(CASE k WHEN 0 THEN 1 + doc_id % 8
                       WHEN 1 THEN 1 + (doc_id * 3) % 8
                END AS INT) AS orientation,
           CASE WHEN k = 3 THEN NULL ELSE k IN (0, 1) END AS has_exif,
           CASE WHEN k = 3 THEN NULL ELSE k = 1 END AS has_icc,
           CAST(CASE WHEN k < 3 THEN 0 END AS INT) AS density_unit,
           CAST(CASE WHEN k < 3 THEN 1 END AS INT) AS x_density,
           CAST(CASE WHEN k < 3 THEN 1 END AS INT) AS y_density
    FROM ids
    """,
    doc="JPEG EXIF / JFIF metadata TRIAGE (operators/jpeg.py::"
        "parse_jpeg_meta + extract_jpeg_meta — r13 VERDICT ask #7): "
        "the crawl-side dedup/quality signals that need no pixel "
        "decode — EXIF orientation (rotated near-dups hash apart "
        "without it), JFIF density, ICC presence, dimensions, "
        "progressive-ness — via a strict SOI..SOS marker-segment walk "
        "plus a bounds-checked TIFF IFD walk inside the EXIF APP1 "
        "(both byte orders, non-target tags skipped).  The fixture "
        "cycles a baseline JPEG with an EXIF orientation (II/MM by "
        "doc_id, extra IFD entries exercised), a progressive JPEG "
        "with EXIF + ICC, a plain JFIF with no EXIF, and a CORRUPT "
        "EXIF (orientation value 0 — a lying IFD) the strict walk "
        "must reject into the NULL quarantine row.  All signals are "
        "doc_id arithmetic; the oracle replays the full walk "
        "bit-strict.  Scale shape: one Arrow-batched 1->1 mapInPandas "
        "pass, blobs never shuffle.",
)
def q_image_exif_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.jpeg import extract_jpeg_meta

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 14 == 7)
        .select(F.col("doc_id").alias("media_id"))
    )

    def build(d: int) -> bytes:
        import numpy as np

        from etl_tiki_webscraping_spark.operators.jpeg import (
            encode_exif_app1,
            encode_icc_app2,
            encode_jpeg,
            encode_jpeg_progressive,
            insert_app_segments,
        )

        k = (d // 14) % 4
        w, h = 5 + d % 12, 5 + (d * 3) % 12
        y, x = np.mgrid[0:h, 0:w]
        img = ((d + 7 * y + 11 * x) % 256).astype(np.uint8)
        if k == 0:
            return insert_app_segments(
                encode_jpeg(img),
                encode_exif_app1(
                    1 + d % 8, "II" if d % 2 == 0 else "MM",
                    extra_tags=d % 3,
                ),
            )
        if k == 1:
            return insert_app_segments(
                encode_jpeg_progressive(img),
                encode_exif_app1(1 + (d * 3) % 8, "II")
                + encode_icc_app2(16 + d % 16, seed=d),
            )
        if k == 2:
            return encode_jpeg(img)
        # corrupt EXIF: orientation value 0 (TIFF SHORT out of range)
        seg = bytearray(encode_exif_app1(1, "II"))
        vpos = bytes(seg).index(b"\x12\x01\x03\x00") + 8
        seg[vpos : vpos + 2] = b"\x00\x00"
        return insert_app_segments(encode_jpeg(img), bytes(seg))

    blob_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "content": b["media_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = ids.mapInPandas(gen, blob_schema)
    return extract_jpeg_meta(blobs)


@register(
    "webp_native_parity",
    oracle="""
    WITH ids AS (
        SELECT doc_id AS media_id FROM documents WHERE doc_id % 14 = 11
    ),
    px AS (
        SELECT media_id,
               CASE WHEN media_id % 3 = 0
                    THEN (media_id * 29
                          + ((y * 5 + x * 7 + media_id) % 16) * 13) % 256
                    ELSE (media_id + 7 * y + 11 * x) % 256
               END AS v
        FROM ids, unnest(range(0, 16)) AS a(y), unnest(range(0, 16)) AS b(x)
    )
    SELECT media_id, 16 AS width, 16 AS height,
           CAST(SUM(v) AS BIGINT) AS luma_sum
    FROM px GROUP BY media_id
    """,
    doc="VP8L encoder CONFORMANCE under the driver gate (operators/"
        "webp_native.py — the r13 'decide on the bool-coder' decision, "
        "r14): bitstreams written by the pure-Python encoder "
        "(palette/sub-byte bundling, subtract-green + predictor + "
        "color-cache + LZ77 runs, meta-Huffman groups — the "
        "webp_variants_stats matrix) are decoded through the SYSTEM "
        "libwebp (the reference implementation, bound via stdlib "
        "ctypes), and the resulting pixels must replay the fixture's "
        "pixel formula bit-exactly.  This upgrades the codec's "
        "correctness claim from self-consistent (our decoder reads our "
        "encoder) to SPEC-CONFORMANT (the production decoder reads our "
        "encoder; the reverse direction — libwebp's own streams "
        "through our decoder — is pinned in tests/test_webp_native.py)."
        "  Scale shape: 1->1 mapInPandas, blobs never shuffle; the C "
        "decode runs inside the Python worker, zero extra copies.",
)
def q_webp_native_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 14 == 11)
        .select(F.col("doc_id").alias("media_id"))
    )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("luma_sum", T.LongType()),
        ]
    )

    def run(batches):
        import numpy as np
        import pandas as pd

        from etl_tiki_webscraping_spark.operators.webp import (
            encode_webp_lossless,
        )
        from etl_tiki_webscraping_spark.operators.webp_native import (
            webp_native_decode_rgba,
        )

        for b in batches:
            out = []
            for mid in b["media_id"]:
                d = int(mid)
                y, x = np.mgrid[0:16, 0:16]
                if d % 3 == 0:
                    idx = ((y * 5 + x * 7 + d) % 16).astype(np.uint8)
                    pal = np.array(
                        [[(d * 29 + k * 13) % 256] * 3 for k in range(16)],
                        dtype=np.uint8,
                    )
                    enc = encode_webp_lossless(pal[idx], palette=True)
                elif d % 3 == 1:
                    img = ((d + 7 * y + 11 * x) % 256).astype(np.uint8)
                    enc = encode_webp_lossless(
                        img, subtract_green=True, predictor_mode=2,
                        cache_bits=6, lz77_left_runs=True,
                    )
                else:
                    img = ((d + 7 * y + 11 * x) % 256).astype(np.uint8)
                    enc = encode_webp_lossless(
                        img, subtract_green=True, meta_split=True
                    )
                px = webp_native_decode_rgba(enc)
                if px is None:  # lib absent / nonconformant: quarantine
                    out.append({"media_id": d, "width": None,
                                "height": None, "luma_sum": None})
                    continue
                out.append({
                    "media_id": d,
                    "width": int(px.shape[1]),
                    "height": int(px.shape[0]),
                    "luma_sum": int(px[..., 1].astype(np.int64).sum()),
                })
            yield pd.DataFrame.from_records(out)

    return ids.mapInPandas(run, out_schema)


@register(
    "webp_lossy_decode_meta",
    oracle="""
    WITH ids AS (
        SELECT doc_id, (doc_id // 14) % 2 AS k
        FROM documents WHERE doc_id % 14 = 13
    )
    SELECT doc_id AS media_id,
           'lossy' AS variant,
           k = 0 AS decodable,
           CAST(CASE WHEN k = 0 THEN 16 + doc_id % 48 END AS INT) AS width,
           CAST(CASE WHEN k = 0 THEN 16 + (doc_id * 3) % 48 END AS INT)
               AS height
    FROM ids
    """,
    doc="REAL lossy-VP8 decode coverage (operators/webp_native.py, "
        "r14): fixtures are encoded by the system libwebp's lossy "
        "encoder at doc_id-driven dimensions and quality, then decoded "
        "back through WebPDecodeRGBA inside the kernel — the "
        "majority-lossy crawl share moves from dimension-only triage "
        "to full pixel decode where the library is present, and a "
        "TRUNCATED stream must fail decode into the fourcc-sniffed "
        "quarantine row (decodable = false).  Decoded dimensions must "
        "agree with the doc_id formula AND with the header-triage "
        "parse (asserted in-kernel: a disagreement raises rather than "
        "reporting wrong metadata).  Lossy pixels are not "
        "SQL-replayable by construction, so the oracle pins the "
        "structural outputs; pixel sanity is tolerance-gated in "
        "tests/test_webp_native.py.  Scale shape: 1->1 mapInPandas, "
        "blobs never shuffle.",
)
def q_webp_lossy_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 14 == 13)
        .select(F.col("doc_id").alias("media_id"))
    )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("variant", T.StringType()),
            T.StructField("decodable", T.BooleanType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def run(batches):
        import numpy as np
        import pandas as pd

        from etl_tiki_webscraping_spark.operators.webp import (
            parse_webp_header,
            sniff_webp_variant,
        )
        from etl_tiki_webscraping_spark.operators.webp_native import (
            webp_native_decode_rgba,
            webp_native_encode_lossy,
        )

        for b in batches:
            out = []
            for mid in b["media_id"]:
                d = int(mid)
                k = (d // 14) % 2
                w, h = 16 + d % 48, 16 + (d * 3) % 48
                y, x = np.mgrid[0:h, 0:w]
                img = ((d + 5 * y + 9 * x) % 256).astype(np.uint8)
                blob = webp_native_encode_lossy(
                    np.stack([img, img, img,
                              np.full_like(img, 255)], axis=-1),
                    quality=50.0 + d % 50,
                )
                if blob is None:  # lib absent: all rows quarantine
                    out.append({"media_id": d, "variant": "unknown",
                                "decodable": False,
                                "width": None, "height": None})
                    continue
                if k == 1:
                    blob = blob[: max(24, len(blob) // 2)]
                px = webp_native_decode_rgba(blob)
                if px is None:
                    out.append({
                        "media_id": d,
                        "variant": sniff_webp_variant(blob),
                        "decodable": False, "width": None, "height": None,
                    })
                    continue
                hdr = parse_webp_header(blob)
                if hdr is not None and (
                    hdr["width"] != px.shape[1] or hdr["height"] != px.shape[0]
                ):
                    raise AssertionError(
                        f"triage/decode dimension disagreement on {d}"
                    )
                out.append({
                    "media_id": d, "variant": "lossy", "decodable": True,
                    "width": int(px.shape[1]), "height": int(px.shape[0]),
                })
            yield pd.DataFrame.from_records(out)

    return ids.mapInPandas(run, out_schema)


@register(
    "warc_record_scan",
    oracle="""
    WITH ids AS (
        SELECT doc_id, (doc_id // 12) % 3 AS k,
               2 + doc_id % 4 AS n_pages
        FROM documents WHERE doc_id % 12 = 10
    ),
    ok AS (
        SELECT doc_id, n_pages, CAST(r.i AS INT) AS i
        FROM ids, unnest(range(0, 1 + 2 * n_pages)) AS r(i)
        WHERE k < 2
    ),
    rows_ok AS (
        SELECT doc_id AS file_id, i AS record_idx,
               CASE WHEN i = 0 THEN 'warcinfo'
                    WHEN i % 2 = 1 THEN 'request'
                    ELSE 'response' END AS warc_type,
               CASE WHEN i = 0 THEN NULL
                    ELSE 'https://example.org/site' || (doc_id % 97)
                         || '/page' || ((i - 1) // 2) END AS target_uri,
               CAST(CASE WHEN i = 0 THEN 19
                    WHEN i % 2 = 1 THEN 44
                         + length(CAST(doc_id % 97 AS VARCHAR))
                         + length(CAST((i - 1) // 2 AS VARCHAR))
                    ELSE 65 + 100 + (doc_id + (i - 1) // 2) % 64
               END AS BIGINT) AS content_length,
               CAST(CASE WHEN i > 0 AND i % 2 = 0
                    THEN 200 + 4 * (((i - 1) // 2) % 2)
               END AS INT) AS http_status,
               CASE WHEN i > 0 AND i % 2 = 0 THEN 'text/html'
               END AS http_content_type
        FROM ok
    ),
    rows_bad AS (
        SELECT doc_id AS file_id, CAST(-1 AS INT) AS record_idx,
               NULL AS warc_type, NULL AS target_uri,
               CAST(NULL AS BIGINT) AS content_length,
               CAST(NULL AS INT) AS http_status,
               NULL AS http_content_type
        FROM ids WHERE k = 2
    )
    SELECT * FROM rows_ok UNION ALL SELECT * FROM rows_bad
    """,
    doc="WARC record scan (sources/warc.py — round-14): the "
        "crawl-NATIVE source format a 100 TB pretraining pipeline "
        "actually ingests (ISO 28500 / Common-Crawl layout).  Each "
        "binary archive blob 1->N-expands into typed per-record rows: "
        "WARC-Type, target URI, Content-Length, and — for response "
        "records — the HTTP status line and Content-Type parsed from "
        "the payload head (no body decode).  Both layouts are "
        "exercised: plain .warc (records tile the file, CRLF-CRLF "
        "separators enforced) and .warc.gz (one gzip MEMBER per "
        "record, walked with stdlib zlib + the unused_data loop, "
        "member tiling enforced); a TRUNCATED archive rejects into a "
        "single record_idx = -1 quarantine row — a half-written "
        "archive is never half-ingested.  The fixture writes "
        "warcinfo + request/response pairs from pure doc_id "
        "arithmetic, so the oracle replays every extracted field "
        "including the exact byte lengths of the HTTP payloads.  "
        "Scale shape: one Arrow-batched 1->N mapInPandas pass, files "
        "never shuffle.",
)
def q_warc_record_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.sources.warc import scan_warc_records

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 12 == 10)
        .select(F.col("doc_id").alias("file_id"))
    )

    def build(d: int) -> bytes:
        from etl_tiki_webscraping_spark.sources.warc import encode_warc

        k = (d // 12) % 3
        n_pages = 2 + d % 4
        if k == 0:
            return encode_warc(d, n_pages, seed=d)
        if k == 1:
            return encode_warc(d, n_pages, gzip_per_record=True, seed=d)
        return encode_warc(d, n_pages, seed=d, truncate=5)

    blob_schema = T.StructType(
        [
            T.StructField("file_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "file_id": b["file_id"],
                    "content": b["file_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = ids.mapInPandas(gen, blob_schema)
    return scan_warc_records(blobs)


@register(
    "webm_stream_metadata",
    oracle="""
    WITH ids AS (
        SELECT doc_id, (doc_id // 14) % 4 AS k
        FROM documents WHERE doc_id % 14 = 1
    )
    SELECT doc_id AS media_id,
           TRUE AS is_ebml,
           CASE WHEN k = 3 THEN NULL
                WHEN k = 2 THEN 'matroska' ELSE 'webm' END AS doc_type,
           CAST(CASE k WHEN 0 THEN 3000 + doc_id % 50000
                       WHEN 1 THEN 4000 + doc_id % 10000
                       WHEN 2 THEN 2 * (1000 + doc_id % 9000)
                END AS BIGINT) AS duration_ms,
           CAST(CASE k WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 1
                END AS INT) AS n_tracks,
           CASE k WHEN 0 THEN CASE WHEN doc_id % 2 = 0
                                   THEN 'V_VP8' ELSE 'V_VP9' END
                  WHEN 1 THEN 'V_VP9,' || CASE WHEN doc_id % 2 = 0
                                   THEN 'A_OPUS' ELSE 'A_VORBIS' END
                  WHEN 2 THEN 'A_FLAC' END AS codecs,
           CAST(CASE WHEN k IN (0, 1)
                     THEN 640 + (doc_id % 64) * 2 END AS INT) AS video_w,
           CAST(CASE WHEN k IN (0, 1)
                     THEN 360 + (doc_id % 36) * 2 END AS INT) AS video_h,
           CAST(CASE WHEN k IN (1, 2)
                     THEN 1 + doc_id % 2 END AS INT) AS audio_channels
    FROM ids
    """,
    doc="WebM / Matroska EBML container TRIAGE (operators/ebmlmeta.py "
        "— round-14, completing the web-video container family next "
        "to the MP4 box walk): a strict RFC 8794 element walk (VINT "
        "ids/sizes, exact tiling at every nesting level, unknown-size "
        "elements rejected) extracts DocType, duration (Matroska's "
        "float-in-timestamp-scale-units — fixtures write "
        "integer-valued doubles and integer-ratio scales so "
        "duration_ms replays exactly), per-track codec IDs, and "
        "video/audio parameters with zero payload decode.  The "
        "fixture cycles video-only WebM (VP8/VP9), a v+a mux "
        "(VP9 + Opus/Vorbis) at TimestampScale 500000, an audio-only "
        "Matroska (FLAC) at scale 2000000, and a TRUNCATED file the "
        "tiling check rejects into the EBML-sniffed quarantine row.  "
        "Scale shape: one Arrow-batched 1->1 mapInPandas pass, blobs "
        "never shuffle.",
)
def q_webm_stream_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.ebmlmeta import (
        extract_webm_metadata,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 14 == 1)
        .select(F.col("doc_id").alias("media_id"))
    )

    def build(d: int) -> bytes:
        from etl_tiki_webscraping_spark.operators.ebmlmeta import (
            encode_webm_stub,
        )

        k = (d // 14) % 4
        w, h = 640 + (d % 64) * 2, 360 + (d % 36) * 2
        if k == 0:
            return encode_webm_stub(
                tracks=[{"type": "video",
                         "codec": "V_VP8" if d % 2 == 0 else "V_VP9",
                         "w": w, "h": h}],
                duration=3000 + d % 50000, seed=d,
            )
        if k == 1:
            return encode_webm_stub(
                tracks=[
                    {"type": "video", "codec": "V_VP9", "w": w, "h": h},
                    {"type": "audio",
                     "codec": "A_OPUS" if d % 2 == 0 else "A_VORBIS",
                     "channels": 1 + d % 2},
                ],
                timestamp_scale=500_000,
                duration=2 * (4000 + d % 10000), seed=d,
            )
        if k == 2:
            return encode_webm_stub(
                doc_type="matroska",
                tracks=[{"type": "audio", "codec": "A_FLAC",
                         "channels": 1 + d % 2}],
                timestamp_scale=2_000_000,
                duration=1000 + d % 9000, seed=d,
            )
        return encode_webm_stub(seed=d)[:-5]  # truncated

    blob_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "content": b["media_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = ids.mapInPandas(gen, blob_schema)
    return extract_webm_metadata(blobs)


@register(
    "warc_html_extract",
    oracle='\n    WITH ids AS (\n        SELECT doc_id, 2 + doc_id % 4 AS n_pages\n        FROM documents WHERE doc_id % 12 = 0\n    ),\n    pages AS (\n        SELECT doc_id, CAST(r.i AS INT) AS p\n        FROM ids, unnest(range(0, n_pages)) AS r(i)\n        WHERE r.i % 2 = 0\n    )\n    SELECT doc_id AS file_id, p AS page,\n           \'https://example.org/site\' || (doc_id % 97) || \'/page\' || p\n               AS target_uri,\n           trim(regexp_replace(replace(replace(replace(replace(replace(replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(\'<html><head><title>Site \' || (doc_id % 97) || \' page \' || p || \'</title><script>var x = \' || doc_id || \';</script></head><body><h1>Doc \' || doc_id || \'&nbsp;\' || p || \'</h1><p>alpha beta tok\' || ((doc_id + p) % 50) || \' gamma</p><!-- hidden \' || doc_id || \' --></body></html>\', \'(?is)<script[^>]*>.*?</script>\', \' \', \'g\'), \'(?is)<style[^>]*>.*?</style>\', \' \', \'g\'), \'(?s)<!--.*?-->\', \' \', \'g\'), \'<[^>]*>\', \' \', \'g\'), \'&nbsp;\', \' \'), \'&quot;\', \'"\'), \'&#39;\', \'\'\'\'), \'&lt;\', \'<\'), \'&gt;\', \'>\'), \'&amp;\', \'&\'), \'\\s+\', \' \', \'g\')) AS clean_text,\n           CAST(11 AS BIGINT) AS n_tokens\n    FROM pages\n',
    doc="WARC -> corpus CAPSTONE (sources/warc.py::scan_warc_responses "
        "+ functions/html.py::html_to_text — round-14): the first leg "
        "of a real pretraining pipeline in ONE oracle-gated query.  "
        "Archive blobs (plain and per-record-gzip alternating by "
        "file) 1->N-expand into response records WITH bodies, the "
        "HTTP filter keeps status-200 text/html (the 204s drop — "
        "filter semantics under the gate), and the HTML bodies run "
        "the full markup->text chain (script/comment stripping, tag "
        "boundaries, entity decode, whitespace collapse) plus a "
        "token count.  The fixture's HTML is pure (file_id, page) "
        "arithmetic, so the DuckDB oracle REBUILDS the exact raw "
        "string per page and pushes it through html_to_text_sql — "
        "generated from the same pattern tables as the Spark "
        "expression, so extraction and oracle cannot drift.  Scale "
        "shape: one Arrow-batched 1->N mapInPandas expansion (files "
        "never shuffle) followed by codegen'd JVM-side string "
        "expressions; no Python in the per-record hot path.",
)
def q_warc_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.functions.html import html_to_text
    from etl_tiki_webscraping_spark.functions.text import token_count
    from etl_tiki_webscraping_spark.sources.warc import scan_warc_responses

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 12 == 0)
        .select(F.col("doc_id").alias("file_id"))
    )

    def build(d: int) -> bytes:
        from etl_tiki_webscraping_spark.sources.warc import encode_warc

        return encode_warc(
            d, 2 + d % 4, gzip_per_record=d % 2 == 1,
            html_bodies=True, seed=d,
        )

    blob_schema = T.StructType(
        [
            T.StructField("file_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "file_id": b["file_id"],
                    "content": b["file_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = ids.mapInPandas(gen, blob_schema)
    responses = scan_warc_responses(blobs)
    kept = responses.filter(
        (F.col("http_status") == 200)
        & (F.col("http_content_type") == "text/html")
    )
    return kept.select(
        "file_id",
        "page",
        "target_uri",
        html_to_text(F.col("body")).alias("clean_text"),
        token_count(html_to_text(F.col("body"))).alias("n_tokens"),
    )


@register(
    "avif_image_meta",
    oracle="""
    WITH ids AS (
        SELECT doc_id, (doc_id // 14) % 4 AS k
        FROM documents WHERE doc_id % 14 = 4
    )
    SELECT doc_id AS media_id,
           TRUE AS is_bmff,
           CASE WHEN k = 1 THEN 'heic' WHEN k = 3 THEN NULL
                ELSE 'avif' END AS family,
           CASE k WHEN 0 THEN 'avif' WHEN 1 THEN 'heic'
                  WHEN 2 THEN 'avis' END AS brand,
           CAST(CASE WHEN k < 3 THEN 64 * (1 + doc_id % 32)
                END AS INT) AS width,
           CAST(CASE WHEN k < 3 THEN 48 * (1 + doc_id % 24)
                END AS INT) AS height,
           CAST(CASE WHEN k = 2 THEN 2 + doc_id % 3
                     WHEN k < 2 THEN 1 END AS INT) AS n_items
    FROM ids
    """,
    doc="AVIF / HEIC still-image TRIAGE (operators/mp4meta.py::"
        "parse_avif — round-14): the modern crawl's growing image "
        "formats are ISO-BMFF files whose dimensions live in the "
        "meta/iprp/ipco/ispe box (image spatial extent), not in any "
        "codec payload — the same strict box-tiling walk as "
        "mp4_stream_metadata extended with the meta branch ('pict' "
        "handler validation, version-0/1 iinf item counts, pitm "
        "primary item).  The fixture cycles a single-item AVIF, a "
        "HEIC, a multi-item AVIF sequence brand (avis), and a "
        "TRUNCATED file the tiling check rejects into the "
        "ftyp-sniffed quarantine row.  AV1/HEVC payload decode is out "
        "of scope for the same table-constant reason as VP8 (see "
        "webp_native.py) — dimensions and brand/item accounting need "
        "only the structural walk.  Scale shape: one Arrow-batched "
        "1->1 mapInPandas pass, blobs never shuffle.",
)
def q_avif_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.mp4meta import (
        extract_avif_metadata,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 14 == 4)
        .select(F.col("doc_id").alias("media_id"))
    )

    def build(d: int) -> bytes:
        from etl_tiki_webscraping_spark.operators.mp4meta import (
            encode_avif_stub,
        )

        k = (d // 14) % 4
        w, h = 64 * (1 + d % 32), 48 * (1 + d % 24)
        if k == 0:
            return encode_avif_stub("avif", w, h, seed=d)
        if k == 1:
            return encode_avif_stub("heic", w, h, seed=d)
        if k == 2:
            return encode_avif_stub("avis", w, h, n_items=2 + d % 3, seed=d)
        return encode_avif_stub("avif", w, h, seed=d)[:-6]

    blob_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "content": b["media_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = ids.mapInPandas(gen, blob_schema)
    return extract_avif_metadata(blobs)


@register(
    "zip_container_meta",
    oracle="""
    WITH ids AS (
        SELECT doc_id, (doc_id // 12) % 6 AS k,
               2 + doc_id % 4 AS n_docs
        FROM documents WHERE doc_id % 12 = 9
    ),
    sized AS (
        SELECT doc_id, k, n_docs,
               list_aggregate(
                   list_transform(range(0, n_docs),
                                  i -> 40 + (doc_id + i) % 32),
                   'sum') AS payload_bytes
        FROM ids
    )
    SELECT doc_id AS file_id,
           TRUE AS is_zip,
           CASE k WHEN 0 THEN 'zip' WHEN 1 THEN 'docx' WHEN 2 THEN 'epub'
                  WHEN 3 THEN 'jar' WHEN 4 THEN 'xlsx' END AS kind,
           CAST(CASE k WHEN 0 THEN n_docs
                       WHEN 1 THEN n_docs + 2 WHEN 4 THEN n_docs + 2
                       WHEN 2 THEN n_docs + 1 WHEN 3 THEN n_docs + 1
                END AS INT) AS n_entries,
           CAST(CASE k WHEN 0 THEN payload_bytes
                       WHEN 1 THEN payload_bytes + 15
                       WHEN 4 THEN payload_bytes + 15
                       WHEN 2 THEN payload_bytes + 20
                       WHEN 3 THEN payload_bytes + 23
                END AS BIGINT) AS total_uncompressed,
           CASE WHEN k < 5 THEN FALSE END AS has_encrypted
    FROM sized
    """,
    doc="ZIP / office-document container TRIAGE (operators/zipmeta.py "
        "— round-14): docx/xlsx/pptx are OPC zips, EPUB is a zip with "
        "a 'mimetype' first entry, JARs carry META-INF/MANIFEST.MF — "
        "a crawl classifies them all from the central directory alone "
        "(PKWARE APPNOTE layout): EOCD located from the tail with the "
        "comment-length-must-reach-EOF rule, per-entry name/method/"
        "sizes/encryption-flag, entry count and directory size "
        "cross-checked against the EOCD (a lying EOCD rejects), "
        "ZIP64 and multi-disk explicitly out of scope rather than "
        "silently wrong.  Fixtures are written by the STDLIB zipfile "
        "module (stored entries, fixed date) but parsed by this "
        "module's independent walk — writer and reader share no code; "
        "the oracle replays kinds, entry counts, and exact "
        "uncompressed byte totals from doc_id arithmetic, and a "
        "TRUNCATED archive quarantines under the magic sniff.  Scale "
        "shape: one Arrow-batched 1->1 mapInPandas pass, blobs never "
        "shuffle.",
)
def q_zip_container_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.zipmeta import (
        extract_zip_metadata,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 12 == 9)
        .select(F.col("doc_id").alias("file_id"))
    )

    def build(d: int) -> bytes:
        from etl_tiki_webscraping_spark.operators.zipmeta import (
            encode_zip_fixture,
        )

        k = (d // 12) % 6
        n_docs = 2 + d % 4
        kind = ("zip", "docx", "epub", "jar", "xlsx", "zip")[k]
        blob = encode_zip_fixture(d, kind, n_docs=n_docs, seed=d)
        return blob[:-4] if k == 5 else blob

    blob_schema = T.StructType(
        [
            T.StructField("file_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "file_id": b["file_id"],
                    "content": b["file_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = ids.mapInPandas(gen, blob_schema)
    return extract_zip_metadata(blobs)


@register(
    "sitemap_url_extract",
    oracle="""
    WITH ids AS (
        SELECT doc_id, 3 + doc_id % 5 AS n_urls
        FROM documents WHERE doc_id % 12 = 11
    )
    SELECT doc_id, CAST(r.i AS INT) AS pos,
           'https://example.org/p/' || (doc_id * 100 + r.i) AS url,
           printf('2026-01-%02d', CAST(1 + r.i % 28 AS INT)) AS lastmod
    FROM ids, unnest(range(0, n_urls)) AS r(i)
    """,
    doc="Sitemap URL extraction (round-14): the reference's FIRST "
        "pipeline stage is a sitemap scan (dags/etl.py:25-46 — S1 in "
        "SURVEY §2.1); the public-web equivalent is sitemaps.org XML, "
        "and this query runs the whole trip as PURE JVM expressions — "
        "the sitemap body is synthesized per doc with transform + "
        "format_string, <loc>/<lastmod> pairs are pulled with "
        "regexp_extract_all (RE2-safe pattern, identical in the "
        "oracle's engine), zipped positionally with arrays_zip, and "
        "posexploded to one row per URL.  No UDF, no mapInPandas, no "
        "shuffle — a 100 TB sitemap dump extracts inside whole-stage "
        "codegen.  The oracle rebuilds every URL/lastmod from doc_id "
        "arithmetic, so a mis-paired zip or an off-by-one extraction "
        "hash-mismatches.",
)
def q_sitemap_url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 12 == 11)
        .select("doc_id", (F.lit(3) + F.col("doc_id") % 5).alias("n_urls"))
    )
    entry = (
        "<url><loc>https://example.org/p/%d</loc>"
        "<lastmod>2026-01-%02d</lastmod></url>"
    )
    xml = F.concat(
        F.lit('<?xml version="1.0"?><urlset>'),
        F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(0), F.col("n_urls") - 1),
                lambda i: F.format_string(
                    entry, F.col("doc_id") * 100 + i, i % 28 + 1
                ),
            ),
        ),
        F.lit("</urlset>"),
    )
    docs = ids.select("doc_id", xml.alias("xml"))
    pairs = docs.select(
        "doc_id",
        F.arrays_zip(
            F.regexp_extract_all(F.col("xml"), F.lit("<loc>([^<]+)</loc>"), F.lit(1)).alias("url"),
            F.regexp_extract_all(
                F.col("xml"), F.lit("<lastmod>([^<]+)</lastmod>"), F.lit(1)
            ).alias("lastmod"),
        ).alias("entries"),
    )
    return pairs.select(
        "doc_id", F.posexplode("entries").alias("pos", "e")
    ).select(
        "doc_id",
        "pos",
        F.col("e.url").alias("url"),
        F.col("e.lastmod").alias("lastmod"),
    )


@register(
    "mp3_id3_tags",
    oracle="""
    WITH ids AS (
        SELECT doc_id, (doc_id // 12) % 4 AS k
        FROM documents WHERE doc_id % 12 = 3
    )
    SELECT doc_id AS media_id,
           CAST(CASE k WHEN 0 THEN 3 WHEN 1 THEN 4 WHEN 2 THEN 3
                END AS INT) AS id3_version,
           CAST(CASE k WHEN 0 THEN 3 WHEN 1 THEN 3 WHEN 2 THEN 1
                END AS INT) AS n_frames,
           CASE WHEN k < 3 THEN 'Track ' || (doc_id % 1000)
                END AS title,
           CASE WHEN k IN (0, 1) THEN 'Artist ' || (doc_id % 50)
                END AS artist,
           CASE WHEN k IN (0, 1) THEN 'Album ' || (doc_id % 20)
                END AS album,
           CAST(CASE WHEN k < 3 THEN 4 + doc_id % 6
                END AS INT) AS n_mp3_frames
    FROM ids
    """,
    doc="ID3v2 text-frame extraction (operators/audiometa.py::"
        "parse_id3v2_frames — round-14): the tag the MP3 frame walk "
        "always skipped now yields title/artist/album — the metadata "
        "that routes music content and groups near-dups.  Both tag "
        "versions are exercised (v2.3 plain-big-endian frame sizes, "
        "v2.4 SYNCSAFE sizes — the classic cross-version parser bug), "
        "both supported text encodings (latin-1, utf-8), the padding "
        "region (must be all zeros), and a TRUNCATED tag that rejects "
        "into the NULL quarantine row.  Each blob also carries a real "
        "MP3 frame stream after the tag, so the row pins tag AND "
        "stream agreement.  All fields are doc_id arithmetic — "
        "bit-strict oracle.  Scale shape: one Arrow-batched 1->1 "
        "mapInPandas pass, blobs never shuffle.",
)
def q_mp3_id3_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.audiometa import (
        extract_mp3_id3_tags,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 12 == 3)
        .select(F.col("doc_id").alias("media_id"))
    )

    def build(d: int) -> bytes:
        from etl_tiki_webscraping_spark.operators.audiometa import (
            encode_id3v2_tag,
            encode_mp3_frames,
        )

        k = (d // 12) % 4
        frames = encode_mp3_frames([1 + d % 14] * (4 + d % 6), seed=d)
        title = f"Track {d % 1000}"
        if k == 0:
            tag = encode_id3v2_tag(
                3, title, f"Artist {d % 50}", f"Album {d % 20}",
                padding=d % 16,
            )
        elif k == 1:
            tag = encode_id3v2_tag(
                4, title, f"Artist {d % 50}", f"Album {d % 20}",
                padding=d % 16, utf8=True,
            )
        elif k == 2:
            tag = encode_id3v2_tag(3, title, padding=1 + d % 8)
        else:
            tag = encode_id3v2_tag(3, title, f"Artist {d % 50}")[:-3]
            return tag  # truncated tag, no stream: quarantine
        return tag + frames

    blob_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "content": b["media_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = ids.mapInPandas(gen, blob_schema)
    return extract_mp3_id3_tags(blobs)


@register(
    "robots_rules_extract",
    oracle="""
    WITH ids AS (
        SELECT doc_id FROM documents WHERE doc_id % 14 = 8
    )
    SELECT doc_id, pos, agent, rule, value FROM (
        SELECT doc_id, 0 AS pos, NULL AS agent, 'disallow' AS rule,
               '/orphan' AS value FROM ids
        UNION ALL
        SELECT doc_id, 3, '*', 'disallow',
               '/private' || (doc_id % 10) FROM ids
        UNION ALL
        SELECT doc_id, 3, 'extrabot' || (doc_id % 4), 'disallow',
               '/private' || (doc_id % 10) FROM ids
        UNION ALL
        SELECT doc_id, 4, '*', 'allow', '/public' FROM ids
        UNION ALL
        SELECT doc_id, 4, 'extrabot' || (doc_id % 4), 'allow', '/public'
        FROM ids
        UNION ALL
        SELECT doc_id, 7, 'bot' || (doc_id % 5) || ':v2', 'disallow',
               '/tmp' || (doc_id % 7) FROM ids
        UNION ALL
        SELECT doc_id, 8, NULL, 'sitemap',
               'https://example.org/sitemap' || (doc_id % 3) || '.xml'
        FROM ids
    )
    """,
    doc="robots.txt rule extraction (functions/url.py::robots_rules — "
        "round-14, RFC 9309 groups round-15): the crawl-GOVERNANCE "
        "operator every polite 100 TB crawl runs before fetching — "
        "Allow/Disallow directives bound to their governing User-agent "
        "GROUP and global Sitemap pointers.  Group semantics per RFC "
        "9309 §2.1: CONSECUTIVE agent lines share one group, so a rule "
        "block under two agent lines emits one row per agent (the "
        "fixture's first block sits under 'User-agent: *' AND "
        "'User-agent: extrabotN' — both get the block's rules); the "
        "agent value is captured after the FIRST colon, so the "
        "fixture's 'botN:v2' product token survives intact; a rule "
        "BEFORE any agent line emits with agent NULL (orphan rules "
        "stay observable, never silently dropped).  No UDF: a running "
        "rule-count keys the group, collect_list over the (file, "
        "group) window gathers its agents, explode_outer fans rules "
        "out per agent (window state bounded by the tiny per-file "
        "line count).  CRLF and bare-LF line conventions are both "
        "exercised by doc parity; the oracle replays every (agent, "
        "rule, value, line-position) row directly.",
)
def q_robots_rules_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.url import robots_rules

    ids = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 14 == 8
    )
    nl = F.when(F.col("doc_id") % 2 == 0, F.lit("\n")).otherwise(
        F.lit("\r\n")
    )
    robots = ids.select(
        "doc_id",
        F.concat_ws(
            "",
            F.lit("Disallow: /orphan"), nl,
            F.lit("User-agent: *"), nl,
            F.format_string("User-agent: extrabot%d", F.col("doc_id") % 4), nl,
            F.format_string("Disallow: /private%d", F.col("doc_id") % 10), nl,
            F.lit("Allow: /public"), nl,
            nl,
            F.format_string("User-agent: bot%d:v2", F.col("doc_id") % 5), nl,
            F.format_string("Disallow: /tmp%d", F.col("doc_id") % 7), nl,
            F.format_string(
                "Sitemap: https://example.org/sitemap%d.xml",
                F.col("doc_id") % 3,
            ),
        ).alias("robots_txt"),
    )
    return robots_rules(robots)


@register(
    "warc_http_decoding",
    oracle="""
    WITH ids AS (
        SELECT doc_id, 2 + doc_id % 5 AS n_pages FROM documents
        WHERE doc_id % 14 = 2
    ),
    pages AS (
        SELECT doc_id, CAST(r.i AS INT) AS page,
               CAST((doc_id + r.i) % 6 AS INT) AS mode,
               'café doc ' || doc_id || ' page ' || r.i ||
                   ' tok' || ((doc_id + r.i) % 50) AS txt
        FROM ids, unnest(range(0, n_pages)) AS r(i)
    )
    SELECT doc_id AS file_id, page,
           'https://example.org/site' || (doc_id % 97) || '/page' || page
               AS target_uri,
           CAST(200 AS INT) AS http_status,
           CASE WHEN mode = 4 AND doc_id % 2 = 0
                THEN 'text/html; charset=iso-8859-1'
                ELSE 'text/html' END AS http_content_type,
           CASE WHEN mode = 5 THEN NULL
                WHEN mode = 4 AND doc_id % 2 = 1
                THEN '<meta charset="iso-8859-1">' || txt
                ELSE txt END AS body,
           CASE mode WHEN 0 THEN 'identity' WHEN 1 THEN 'chunked'
                WHEN 2 THEN 'gzip' WHEN 3 THEN 'chunked+gzip'
                WHEN 4 THEN 'identity' WHEN 5 THEN 'bad_chunked'
           END AS http_encoding,
           CASE WHEN mode = 5 THEN NULL WHEN mode = 4 THEN 'latin-1'
                ELSE 'utf-8' END AS charset
    FROM pages
    """,
    doc="WARC HTTP-body DECODING (sources/warc.py::"
        "decode_http_response — round-15, VERDICT r14 ask #1): the "
        "majority shape of real crawl responses is Transfer-Encoding: "
        "chunked and/or Content-Encoding: gzip with a non-UTF-8 "
        "charset — previously those bodies reached the text stack as "
        "chunk-framing garbage or mojibake.  The fixture cycles every "
        "decode path per page ((file_id + page) % 6): identity, "
        "chunked, gzipped, chunked+gzipped (dechunk THEN gunzip — the "
        "layering order is part of the contract), latin-1 via the "
        "Content-Type charset parameter (even file) or a <meta "
        "charset> body tag (odd file), and a TRUNCATED chunk stream "
        "that must quarantine at ROW granularity as bad_chunked with "
        "a NULL body — never a silently shorter body, and never "
        "poisoning sibling responses in the same archive.  Every "
        "body carries a non-ASCII é so charset handling is "
        "hash-observable.  The archive is parsed exactly ONCE "
        "(validation and payload capture share the walk — the r14 "
        "double-parse is gone).  Scale shape: one Arrow-batched 1->N "
        "mapInPandas pass, blobs never shuffle.",
)
def q_warc_http_decoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.sources.warc import scan_warc_responses

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 14 == 2)
        .select(F.col("doc_id").alias("file_id"))
    )

    def build(d: int) -> bytes:
        from etl_tiki_webscraping_spark.sources.warc import encode_warc

        return encode_warc(
            d, 2 + d % 5, gzip_per_record=d % 2 == 1, http_modes=True,
        )

    blob_schema = T.StructType(
        [
            T.StructField("file_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "file_id": b["file_id"],
                    "content": b["file_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = ids.mapInPandas(gen, blob_schema)
    return scan_warc_responses(blobs)


@register(
    "robots_url_gate",
    oracle="""
    WITH ids AS (
        SELECT doc_id, doc_id % 5 AS m5, doc_id % 3 AS m3
        FROM documents WHERE doc_id % 14 = 6
    ),
    combos AS (
        SELECT doc_id, m5, m3, CAST(r.i AS INT) AS k, b.bot
        FROM ids, unnest(range(0, 5)) AS r(i),
             (VALUES ('GenericBot'), ('Crawler:X')) AS b(bot)
    )
    SELECT 'h' || doc_id || '.example.org' AS host,
           CASE k WHEN 0 THEN '/p' || m5 || '/a'
                  WHEN 1 THEN '/p' || m5 || '/ok'
                  WHEN 2 THEN '/p' || m5 || '/ok2'
                  WHEN 3 THEN '/about'
                  ELSE '/t' || m3 || '/f' END AS path,
           bot,
           CASE WHEN bot = 'Crawler:X' THEN k <> 4
                ELSE k IN (1, 3, 4) END AS allowed,
           CASE WHEN bot = 'Crawler:X'
                THEN CASE WHEN k = 4 THEN 'disallow' ELSE 'allow' END
                ELSE CASE WHEN k IN (0, 2) THEN 'disallow'
                          WHEN k = 1 THEN 'allow' END
           END AS matched_rule,
           CASE WHEN bot = 'Crawler:X'
                THEN CASE WHEN k = 4 THEN '/t' || m3 || '/'
                          ELSE '/' END
                ELSE CASE WHEN k IN (0, 2) THEN '/p' || m5 || '*'
                          WHEN k = 1 THEN '/p' || m5 || '/ok$' END
           END AS matched_value
    FROM combos
    """,
    doc="robots.txt URL GATE (functions/url.py::robots_url_gate — "
        "round-15, VERDICT r14 ask #4): extraction alone governs "
        "nothing — this applies the extracted rules to a URL table "
        "with the full public-REP precedence: group selection by "
        "exact case-insensitive agent match falling back to '*' (the "
        "fixture's 'Crawler:X' bot must select the 'crawler:x' group "
        "— exercising BOTH case folding and the first-colon agent "
        "capture), longest-rule-value match with '*' wildcards and "
        "terminal-'$' anchors, Allow-first on length ties, "
        "allowed-by-default when nothing matches.  The oracle is a "
        "HAND-DERIVED expected-verdict table (per (path-kind, bot) "
        "from the spec, parameterized by doc arithmetic), NOT a "
        "replay of the match pipeline — a shared bug in the pattern "
        "compiler cannot hide.  Composition is end-to-end: robots "
        "text -> robots_rules extraction -> gate.  Scale shape: the "
        "tiny rules side BROADCASTS (the 100 TB URL side never "
        "shuffles for the join); the precedence windows key on "
        "(host, path, bot) with state bounded by per-host rule "
        "count.",
)
def q_robots_url_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.url import (
        robots_rules,
        robots_url_gate,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 14 == 6)
        .select(
            "doc_id",
            (F.col("doc_id") % 5).alias("m5"),
            (F.col("doc_id") % 3).alias("m3"),
        )
    )
    host = F.concat(F.lit("h"), F.col("doc_id").cast("string"),
                    F.lit(".example.org"))
    nl = F.lit("\n")
    robots = ids.select(
        host.alias("host"),
        F.concat_ws(
            "",
            F.lit("User-agent: *"), nl,
            F.format_string("Disallow: /p%d*", F.col("m5")), nl,
            F.format_string("Allow: /p%d/ok$", F.col("m5")), nl,
            F.lit("User-agent: crawler:x"), nl,
            F.lit("Allow: /"), nl,
            F.format_string("Disallow: /t%d/", F.col("m3")),
        ).alias("robots_txt"),
    )
    rules = robots_rules(robots, id_col="host", text_col="robots_txt")
    k = F.col("k")
    path = (
        F.when(k == 0, F.format_string("/p%d/a", F.col("m5")))
        .when(k == 1, F.format_string("/p%d/ok", F.col("m5")))
        .when(k == 2, F.format_string("/p%d/ok2", F.col("m5")))
        .when(k == 3, F.lit("/about"))
        .otherwise(F.format_string("/t%d/f", F.col("m3")))
    )
    urls = (
        ids.select(
            "doc_id", "m5", "m3",
            F.explode(F.sequence(F.lit(0), F.lit(4))).alias("k"),
        )
        .select(
            host.alias("host"),
            path.alias("path"),
            F.explode(
                F.array(F.lit("GenericBot"), F.lit("Crawler:X"))
            ).alias("bot"),
        )
    )
    return robots_url_gate(urls, rules)


@register(
    "pdf_doc_meta",
    oracle="""
    WITH ids AS (
        SELECT doc_id, doc_id % 6 AS j, doc_id % 5 AS k,
               CAST(1 + doc_id % 4 AS INT) AS n_pages,
               CAST(4 + doc_id % 3 AS INT) AS ver
        FROM documents WHERE doc_id % 14 = 10
    )
    SELECT doc_id AS file_id,
           TRUE AS is_pdf,
           CASE WHEN j <> 5 THEN ver END AS version_minor,
           CASE WHEN j <> 5 THEN n_pages END AS n_pages,
           CAST(CASE WHEN j = 5 THEN NULL
                     WHEN k = 3 THEN 4 + 2 * n_pages
                     ELSE 3 + 2 * n_pages END AS INT) AS n_objects,
           CASE WHEN j <> 5 THEN k = 3 END AS encrypted,
           CASE WHEN j <> 5 AND k <> 3 THEN 'FixtureWriter 1.0'
                END AS producer,
           CASE WHEN j <> 5 AND k <> 3 THEN 'Doc (' || doc_id || ')'
                END AS title
    FROM ids
    """,
    doc="PDF document TRIAGE (operators/pdfmeta.py::parse_pdf — "
        "round-15, VERDICT r14 ask #2): the #1 non-HTML document "
        "format in any crawl, walked from the PUBLIC ISO 32000 "
        "layout — header version, startxref -> classic xref table "
        "(every in-use entry's offset CROSS-CHECKED to land exactly "
        "on its own 'N 0 obj' header), trailer /Size validation, "
        "/Root -> /Pages /Count page count, /Info producer/title "
        "with escape-aware literal parsing (the fixture title "
        "carries REAL parens through \\( \\) escapes).  /Encrypt "
        "routes to a DISTINCT class: structure stays readable "
        "(page/object counts are plaintext in standard security) but "
        "strings stay NULL rather than decoding ciphertext to "
        "mojibake; a TRUNCATED file (missing %%EOF) rejects into the "
        "header-sniffed quarantine row.  Scale shape: one "
        "Arrow-batched 1->1 mapInPandas pass, blobs never shuffle.",
)
def q_pdf_doc_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.pdfmeta import (
        extract_pdf_metadata,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 14 == 10)
        .select(F.col("doc_id").alias("file_id"))
    )

    def build(d: int) -> bytes:
        from etl_tiki_webscraping_spark.operators.pdfmeta import (
            encode_pdf_fixture,
        )

        return encode_pdf_fixture(d, truncate=7 if d % 6 == 5 else 0)

    blob_schema = T.StructType(
        [
            T.StructField("file_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "file_id": b["file_id"],
                    "content": b["file_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = ids.mapInPandas(gen, blob_schema)
    return extract_pdf_metadata(blobs)


@register(
    "pdf_text_extract",
    oracle="""
    WITH ids AS (
        SELECT doc_id, doc_id % 6 AS j, doc_id % 5 AS k,
               1 + doc_id % 4 AS n_pages
        FROM documents WHERE doc_id % 14 = 12
    ),
    clean AS (
        SELECT doc_id, CAST(r.i AS INT) AS page,
               'Pdf ' || doc_id || ' page ' || r.i ||
                   ' (q' || ((doc_id + r.i) % 7) || ') tok' ||
                   ((doc_id + r.i) % 50) AS text
        FROM ids, unnest(range(0, n_pages)) AS r(i)
        WHERE j <> 5 AND k <> 3
    )
    SELECT doc_id AS file_id, page, text,
           CAST(length(text) AS INT) AS n_chars
    FROM clean
    UNION ALL
    SELECT doc_id, -1, NULL, NULL FROM ids WHERE j = 5 OR k = 3
    """,
    doc="PDF TEXT extraction (operators/pdfmeta.py::parse_pdf_text — "
        "round-15): FlateDecode'd content streams (stdlib zlib, "
        "strict /Length + clean-EOF inflate — stream bytes are "
        "sliced at the xref offset, never by endobj scan, because "
        "compressed bytes can contain 'endobj' by chance) scanned "
        "for BT..ET text operators.  The fixture cycles the three "
        "public show-operator shapes per file (file_id % 5): single "
        "(s) Tj, kerning-split [(s) -120 (s)] TJ whose elements join "
        "with '' (one logical run), and two positioned Tj runs that "
        "join with ' ' — the join conventions are oracle-pinned, and "
        "every page's text carries REAL parens through literal "
        "escapes.  Encrypted and truncated files emit the single "
        "page = -1 quarantine row (ciphertext must never decode to "
        "mojibake text).  Scale shape: one Arrow-batched 1->N "
        "mapInPandas pass, blobs never shuffle.",
)
def q_pdf_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.pdfmeta import (
        extract_pdf_text,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 14 == 12)
        .select(F.col("doc_id").alias("file_id"))
    )

    def build(d: int) -> bytes:
        from etl_tiki_webscraping_spark.operators.pdfmeta import (
            encode_pdf_fixture,
        )

        return encode_pdf_fixture(d, truncate=7 if d % 6 == 5 else 0)

    blob_schema = T.StructType(
        [
            T.StructField("file_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "file_id": b["file_id"],
                    "content": b["file_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = ids.mapInPandas(gen, blob_schema)
    return extract_pdf_text(blobs)


@register(
    "sitemap_index_extract",
    oracle="""
    WITH ids AS (
        SELECT doc_id, 2 + doc_id % 3 AS n_members
        FROM documents WHERE doc_id % 14 = 0
    ),
    members AS (
        SELECT doc_id, CAST(r.i AS INT) AS member_idx,
               (doc_id + r.i) % 3 = 1 AS is_gz,
               ((doc_id + r.i) % 3 = 1) AND ((doc_id + r.i) % 5 = 4)
                   AS trunc,
               2 + (doc_id + r.i) % 4 AS n_urls
        FROM ids, unnest(range(0, n_members)) AS r(i)
    )
    SELECT doc_id AS site_id, member_idx, is_gz, CAST(u.i AS INT) AS pos,
           'https://h' || doc_id || '.example.org/p/' ||
               (member_idx * 100 + u.i) AS url,
           printf('2026-02-%02d', CAST(1 + (member_idx + u.i) % 28 AS INT))
               AS lastmod
    FROM members, unnest(range(0, n_urls)) AS u(i)
    WHERE NOT trunc
    UNION ALL
    SELECT doc_id, member_idx, is_gz, -1, NULL, NULL
    FROM members WHERE trunc
    """,
    doc="Sitemap INDEX recursion + gzipped members (round-15, VERDICT "
        "r14 ask #3): real sites serve a <sitemapindex> pointing at "
        ".xml(.gz) member sitemaps — the exact two-level category -> "
        "children shape of the reference's S1 (dags/etl.py:26-39), "
        "and the sitemaps.org publication shape at crawl scale.  The "
        "pipeline runs the whole recursion: the index XML is scanned "
        "with JVM regexp_extract_all for member <loc>s (gz-ness from "
        "the .gz suffix), each member blob is strictly decompressed "
        "(sources/records.py::gunzip_member_text — gzip members must "
        "reach EOF with no trailing garbage; a TRUNCATED .xml.gz "
        "emits the pos = -1 quarantine row, never a partial URL "
        "list), and member <urlset> entries extract with the same "
        "JVM regexp/arrays_zip/posexplode_outer chain as "
        "sitemap_url_extract.  Scale shape: narrow explode of the "
        "index, one Arrow 1->1 decompress kernel, whole-stage-codegen "
        "extraction — no shuffle anywhere.",
)
def q_sitemap_index_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.sources.records import (
        gunzip_member_text,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 14 == 0)
        .select("doc_id", (F.lit(2) + F.col("doc_id") % 3).alias("n_members"))
    )
    index_xml = F.concat(
        F.lit('<?xml version="1.0"?><sitemapindex>'),
        F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(0), F.col("n_members") - 1),
                lambda m: F.format_string(
                    "<sitemap><loc>https://h%d.example.org/s%d.xml%s"
                    "</loc></sitemap>",
                    F.col("doc_id"),
                    m,
                    F.when((F.col("doc_id") + m) % 3 == 1, F.lit(".gz"))
                    .otherwise(F.lit("")),
                ),
            ),
        ),
        F.lit("</sitemapindex>"),
    )
    locs = (
        ids.select("doc_id", index_xml.alias("index_xml"))
        .select(
            F.col("doc_id").alias("site_id"),
            F.posexplode(
                F.regexp_extract_all(
                    F.col("index_xml"), F.lit("<loc>([^<]+)</loc>"), F.lit(1)
                )
            ).alias("member_idx", "loc"),
        )
        .select(
            "site_id", "member_idx", F.col("loc").endswith(".gz").alias("is_gz")
        )
    )

    def build(d: int, m: int, gz: bool) -> bytes:
        import zlib

        n_urls = 2 + (d + m) % 4
        xml = (
            '<?xml version="1.0"?><urlset>'
            + "".join(
                f"<url><loc>https://h{d}.example.org/p/{m * 100 + u}</loc>"
                f"<lastmod>2026-02-{1 + (m + u) % 28:02d}</lastmod></url>"
                for u in range(n_urls)
            )
            + "</urlset>"
        ).encode()
        if not gz:
            return xml
        blob = zlib.compressobj(6, zlib.DEFLATED, 31)
        out = blob.compress(xml) + blob.flush()
        return out[:-6] if (d + m) % 5 == 4 else out

    blob_schema = T.StructType(
        [
            T.StructField("site_id", T.LongType(), False),
            T.StructField("member_idx", T.IntegerType(), False),
            T.StructField("is_gz", T.BooleanType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "site_id": b["site_id"],
                    "member_idx": b["member_idx"],
                    "is_gz": b["is_gz"],
                    "content": [
                        build(int(d), int(m), bool(g))
                        for d, m, g in zip(
                            b["site_id"], b["member_idx"], b["is_gz"]
                        )
                    ],
                }
            )

    blobs = locs.mapInPandas(gen, blob_schema)
    decoded = gunzip_member_text(blobs, content_col="content", text_col="xml")
    pairs = decoded.select(
        "site_id",
        "member_idx",
        "is_gz",
        F.arrays_zip(
            F.regexp_extract_all(
                F.col("xml"), F.lit("<url><loc>([^<]+)</loc>"), F.lit(1)
            ).alias("url"),
            F.regexp_extract_all(
                F.col("xml"), F.lit("<lastmod>([^<]+)</lastmod>"), F.lit(1)
            ).alias("lastmod"),
        ).alias("entries"),
    )
    return pairs.select(
        "site_id",
        "member_idx",
        "is_gz",
        F.posexplode_outer("entries").alias("pos", "e"),
    ).select(
        "site_id",
        "member_idx",
        "is_gz",
        F.coalesce(F.col("pos"), F.lit(-1)).alias("pos"),
        F.col("e.url").alias("url"),
        F.col("e.lastmod").alias("lastmod"),
    )


@register(
    "docx_text_extract",
    oracle="""
    WITH ids AS (
        SELECT doc_id, 1 + doc_id % 5 AS n_paras, doc_id % 7 = 3 AS trunc
        FROM documents WHERE doc_id % 14 = 1
    )
    SELECT doc_id AS file_id, CAST(r.i AS INT) AS para,
           'Para ' || r.i || ' alpha' || ((doc_id + r.i) % 9) ||
               ' beta' || ((doc_id + r.i) % 7) AS text,
           CAST(length('Para ' || r.i || ' alpha' ||
               ((doc_id + r.i) % 9) || ' beta' ||
               ((doc_id + r.i) % 7)) AS INT) AS n_chars
    FROM ids, unnest(range(0, n_paras)) AS r(i)
    WHERE NOT trunc
    UNION ALL
    SELECT doc_id, -1, NULL, NULL FROM ids WHERE trunc
    """,
    doc="docx TEXT extraction (operators/zipmeta.py::extract_docx_xml "
        "+ zip_member_bytes — round-15, VERDICT r14 ask #7): the r14 "
        "ZIP triage becomes an actual TEXT SOURCE, the same capstone "
        "shape as warc_html_extract.  The strict central-directory "
        "walk classifies the blob as docx, the word/document.xml "
        "member INFLATES (raw deflate, wbits=-15) with size AND "
        "CRC-32 cross-checked against the directory record (a lying "
        "member quarantines, never mojibake text), and paragraph/run "
        "extraction runs JVM-side: regexp_extract_all over <w:p> "
        "blocks, inner <w:t> runs joined with '' inside transform() "
        "(the OOXML run-split convention — the fixture's second run "
        "carries a preserved leading space).  A truncated archive "
        "emits the para = -1 quarantine row.  The oracle replays "
        "every paragraph from pure arithmetic — independent of the "
        "whole zip+regex chain.  Scale shape: one Arrow 1->1 kernel "
        "per blob (Python touches each blob exactly once), then "
        "whole-stage-codegen extraction; blobs never shuffle.",
)
def q_docx_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.zipmeta import (
        extract_docx_xml,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 14 == 1)
        .select(F.col("doc_id").alias("file_id"))
    )

    def build(d: int) -> bytes:
        from etl_tiki_webscraping_spark.operators.zipmeta import (
            encode_docx_fixture,
        )

        return encode_docx_fixture(
            d, 1 + d % 5, truncate=9 if d % 7 == 3 else 0
        )

    blob_schema = T.StructType(
        [
            T.StructField("file_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "file_id": b["file_id"],
                    "content": b["file_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = ids.mapInPandas(gen, blob_schema)
    xml = extract_docx_xml(blobs)
    texts = F.transform(
        F.regexp_extract_all(
            F.col("document_xml"), F.lit("<w:p>(.*?)</w:p>"), F.lit(1)
        ),
        lambda p: F.array_join(
            F.regexp_extract_all(
                p, F.lit("<w:t[^>]*>([^<]*)</w:t>"), F.lit(1)
            ),
            "",
        ),
    )
    return xml.select(
        "file_id", texts.alias("texts")
    ).select(
        "file_id", F.posexplode_outer("texts").alias("para", "text")
    ).select(
        "file_id",
        F.coalesce(F.col("para"), F.lit(-1)).alias("para"),
        "text",
        F.length("text").cast("int").alias("n_chars"),
    )


@register(
    "crawl_frontier_gate",
    oracle="""
    WITH ids AS (
        SELECT doc_id, 3 + doc_id % 5 AS n_urls
        FROM documents WHERE doc_id % 14 = 5
    )
    SELECT 'h' || doc_id || '.example.org' AS host,
           CAST(n_urls AS BIGINT) AS n_urls,
           CAST(n_urls - 1 - CASE WHEN n_urls >= 4 THEN 1 ELSE 0 END
                AS BIGINT) AS n_allowed,
           CAST(1 + CASE WHEN n_urls >= 4 THEN 1 ELSE 0 END
                AS BIGINT) AS n_blocked
    FROM ids
    """,
    doc="Crawl-frontier GATE capstone (round-15): the polite-crawl "
        "front door in ONE oracle-gated composition — sitemap-shaped "
        "URL lists (with the real-world noise: utm_ tracking params, "
        "fragments, unsorted query params, cycling by u % 3) pass "
        "through url.py::canonicalize_url, the canonical path+query "
        "joins the per-host robots rules through robots_rules -> "
        "robots_url_gate (exact 'frontierbot' group selected over a "
        "Disallow-all '*' group — a group-selection bug would block "
        "EVERYTHING and shift every count), and the verdict rolls up "
        "per host.  Per-site arithmetic: rules block u = 1 (prefix "
        "rule) and u = 3 (terminal-$ anchored rule) of n = 3 + d % 5 "
        "URLs, so the oracle's expected counts are a HAND-DERIVED "
        "closed form (n_blocked = 1 + [n >= 4]), independent of the "
        "whole extraction+match pipeline.  Scale shape: codegen'd "
        "canonicalization, tiny rules BROADCAST, one (host) rollup "
        "exchange.",
)
def q_crawl_frontier_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.url import (
        canonicalize_url,
        robots_rules,
        robots_url_gate,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 14 == 5)
        .select("doc_id", (F.lit(3) + F.col("doc_id") % 5).alias("n_urls"))
    )
    host = F.concat(F.lit("h"), F.col("doc_id").cast("string"),
                    F.lit(".example.org"))
    nl = F.lit("\n")
    robots = ids.select(
        host.alias("host"),
        F.concat_ws(
            "",
            F.lit("User-agent: frontierbot"), nl,
            F.format_string("Disallow: /p/%d", F.col("doc_id") * 100 + 1), nl,
            F.format_string("Disallow: /p/%d$", F.col("doc_id") * 100 + 3), nl,
            F.lit("User-agent: *"), nl,
            F.lit("Disallow: /"),
        ).alias("robots_txt"),
    )
    rules = robots_rules(robots, id_col="host", text_col="robots_txt")
    u = F.col("u")
    suffix = (
        F.when(u % 3 == 0, F.lit("?utm_source=x"))
        .when(u % 3 == 1, F.lit("#frag"))
        .otherwise(F.lit("?b=2&a=1"))
    )
    raw_urls = ids.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_urls") - 1)).alias("u"),
    ).select(
        F.concat(
            F.lit("https://h"), F.col("doc_id").cast("string"),
            F.lit(".example.org/p/"),
            (F.col("doc_id") * 100 + u).cast("string"),
            suffix,
        ).alias("url"),
    )
    canon = raw_urls.select(canonicalize_url("url").alias("curl"))
    urls = canon.select(
        F.regexp_extract("curl", r"^https://([^/]+)", 1).alias("host"),
        F.regexp_replace("curl", r"^https://[^/]+", "").alias("path"),
        F.lit("FrontierBot").alias("bot"),
    )
    gated = robots_url_gate(urls, rules)
    return gated.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum(F.col("allowed").cast("bigint")).alias("n_allowed"),
        F.sum((~F.col("allowed")).cast("bigint")).alias("n_blocked"),
    )


def _register_warc_corpus_router() -> None:
    from etl_tiki_webscraping_spark.functions.html import html_to_text_sql

    _raw_html = (
        "'<html><head><title>Site ' || (doc_id % 97) || ' page ' || page"
        " || '</title><script>var x = ' || doc_id || ';</script></head>"
        "<body><h1>Doc ' || doc_id || '&nbsp;' || page || '</h1>"
        "<p>alpha beta tok' || ((doc_id + page) % 50) || ' gamma</p>"
        "<!-- hidden ' || doc_id || ' --></body></html>'"
    )

    @register(
        "warc_corpus_router",
        oracle=f"""
        WITH ids AS (
            SELECT doc_id, 2 + doc_id % 4 AS n_pages
            FROM documents WHERE doc_id % 14 = 13
        ),
        pages AS (
            SELECT doc_id, CAST(r.i AS INT) AS page,
                   CAST(r.i % 3 AS INT) AS kind3,
                   doc_id + r.i AS e
            FROM ids, unnest(range(0, n_pages)) AS r(i)
        ),
        html AS (
            SELECT doc_id, page, 'html' AS kind,
                   {html_to_text_sql('raw')} AS clean_text,
                   CAST(len(string_split({html_to_text_sql('raw')}, ' '))
                        AS BIGINT) AS n_tokens
            FROM (SELECT doc_id, page, {_raw_html} AS raw
                  FROM pages WHERE kind3 <> 1)
        ),
        pdf AS (
            SELECT doc_id, page, 'pdf' AS kind,
                   CASE WHEN e % 5 = 3 THEN NULL ELSE
                       array_to_string(list_transform(range(0, 1 + e % 4),
                           p -> 'Pdf ' || e || ' page ' || p ||
                                ' (q' || ((e + p) % 7) || ') tok' ||
                                ((e + p) % 50)), ' ')
                   END AS clean_text,
                   CASE WHEN e % 5 = 3 THEN NULL
                        ELSE CAST(6 * (1 + e % 4) AS BIGINT)
                   END AS n_tokens
            FROM pages WHERE kind3 = 1
        )
        SELECT doc_id AS file_id, page, kind, clean_text, n_tokens
        FROM html
        UNION ALL
        SELECT doc_id, page, kind, clean_text, n_tokens FROM pdf
        """,
        doc="WARC mixed-media corpus ROUTER capstone (sources/warc.py::"
            "scan_warc_routed — round-15): the real crawl front end in "
            "one oracle-gated query — a single archive carries "
            "text/html (identity AND gzip-encoded), application/pdf, "
            "and the router dispatches each response body by MIME "
            "type AFTER framing decode: HTML ships the charset-decoded "
            "string to the JVM html_to_text chain; PDF ships the "
            "framing-decoded BYTES through pdfmeta.parse_pdf_text "
            "in-kernel (binary must never round-trip a charset "
            "decode — the bug class this query pins); an ENCRYPTED "
            "embedded PDF keeps kind='pdf' with NULL text.  The "
            "oracle rebuilds HTML text via html_to_text_sql from the "
            "same pattern tables and PDF text from closed-form "
            "arithmetic (hand-derived 6-tokens-per-page count).  "
            "Scale shape: one Arrow 1->N kernel per archive, then "
            "codegen'd extraction; blobs never shuffle.",
    )
    def q_warc_corpus_router(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import types as T

        from etl_tiki_webscraping_spark.functions.html import html_to_text
        from etl_tiki_webscraping_spark.functions.text import token_count
        from etl_tiki_webscraping_spark.sources.warc import scan_warc_routed

        ids = (
            load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 14 == 13)
            .select(F.col("doc_id").alias("file_id"))
        )

        def build(d: int) -> bytes:
            from etl_tiki_webscraping_spark.sources.warc import encode_warc

            return encode_warc(
                d, 2 + d % 4, gzip_per_record=d % 2 == 1,
                mixed_bodies=True,
            )

        blob_schema = T.StructType(
            [
                T.StructField("file_id", T.LongType(), False),
                T.StructField("content", T.BinaryType(), False),
            ]
        )

        def gen(batches):
            import pandas as pd

            for b in batches:
                yield pd.DataFrame(
                    {
                        "file_id": b["file_id"],
                        "content": b["file_id"].map(lambda d: build(int(d))),
                    }
                )

        routed = scan_warc_routed(ids.mapInPandas(gen, blob_schema))
        clean = (
            F.when(F.col("kind") == "html", html_to_text(F.col("html")))
            .when(F.col("kind") == "pdf", F.col("pdf_text"))
        )
        return routed.select(
            "file_id",
            "page",
            "kind",
            clean.alias("clean_text"),
            F.when(clean.isNotNull(), token_count(clean)).alias("n_tokens"),
        )


_register_warc_corpus_router()


@register(
    "tar_shard_scan",
    oracle="""
    WITH ids AS (
        SELECT doc_id, (doc_id // 13) % 3 AS k,
               2 + doc_id % 3 AS n_samples
        FROM documents WHERE doc_id % 13 = 2
    ),
    samples AS (
        SELECT doc_id, k, CAST(s.i AS INT) AS i
        FROM ids, unnest(range(0, n_samples)) AS s(i)
        WHERE k < 2
    ),
    parts AS (
        SELECT doc_id, k, i, CAST(p.j AS INT) AS p
        FROM samples, unnest(range(0, 3 + i % 2)) AS p(j)
    ),
    member_rows AS (
        SELECT doc_id AS file_id,
               CAST(CASE WHEN k = 1 THEN 1 ELSE 0 END
                    + 3 * i + i // 2 + p AS INT) AS member_idx,
               CASE WHEN k = 1 THEN 'data/' ELSE '' END
                   || 'sample' || (doc_id * 1000 + i) || '.'
                   || CASE p WHEN 0 THEN 'jpg' WHEN 1 THEN 'txt'
                             WHEN 2 THEN 'json' ELSE 'seg.png' END AS name,
               CAST(CASE p WHEN 0 THEN 120 + (doc_id + i) % 64
                           WHEN 1 THEN 30 + (doc_id + i) % 16
                           WHEN 2 THEN 25 + (doc_id + i) % 8
                           ELSE 40 + (doc_id + i) % 32
                    END AS BIGINT) AS size,
               CAST(1767225600 AS BIGINT) AS mtime,
               FALSE AS is_dir
        FROM parts
    ),
    dir_rows AS (
        SELECT doc_id AS file_id, CAST(0 AS INT) AS member_idx,
               'data/' AS name, CAST(0 AS BIGINT) AS size,
               CAST(1767225600 AS BIGINT) AS mtime, TRUE AS is_dir
        FROM ids WHERE k = 1
    ),
    bad_rows AS (
        SELECT doc_id AS file_id, CAST(-1 AS INT) AS member_idx,
               NULL AS name, CAST(NULL AS BIGINT) AS size,
               CAST(NULL AS BIGINT) AS mtime,
               CAST(NULL AS BOOLEAN) AS is_dir
        FROM ids WHERE k = 2
    )
    SELECT * FROM member_rows
    UNION ALL SELECT * FROM dir_rows
    UNION ALL SELECT * FROM bad_rows
    """,
    doc="TAR / WebDataset shard scan (operators/tarmeta.py — "
        "round-15): the container format TRAINING data ships in — "
        "multimodal pipelines stream tar shards of keyed samples (the "
        "WebDataset convention), and a 100 TB ingest triages them "
        "exactly like WARC: one blob in, N member rows out.  The "
        "strict POSIX.1-1988 ustar walk verifies the header checksum "
        "(chksum field read as spaces), parses NUL/space-padded octal "
        "sizes/mtimes, honors the prefix field, requires declared "
        "data blocks to tile inside the file and the two-zero-block "
        "end marker (plus only zero padding after it), and REJECTS "
        "the non-ustar typeflags (links, pax, GNU long names — the "
        "strict-subset posture of the ZIP64 rejection).  The fixture "
        "cycles a plain shard, a shard under a directory entry, and a "
        "TRUNCATED shard (header block only) that quarantines as the "
        "member_idx = -1 row.  Fixtures are written by stdlib "
        "tarfile (USTAR_FORMAT) — writer and reader share no code.  "
        "Scale shape: one Arrow-batched 1->N mapInPandas expansion, "
        "blobs never shuffle.",
)
def q_tar_shard_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.tarmeta import scan_tar_members

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 13 == 2)
        .select(F.col("doc_id").alias("file_id"))
    )

    def build(d: int) -> bytes:
        from etl_tiki_webscraping_spark.operators.tarmeta import (
            encode_tar_shard,
        )

        k = (d // 13) % 3
        n_samples = 2 + d % 3
        if k == 0:
            return encode_tar_shard(d, n_samples)
        if k == 1:
            return encode_tar_shard(d, n_samples, dir_prefix="data")
        return encode_tar_shard(d, n_samples, truncate=True)

    blob_schema = T.StructType(
        [
            T.StructField("file_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "file_id": b["file_id"],
                    "content": b["file_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = ids.mapInPandas(gen, blob_schema)
    return scan_tar_members(blobs)


@register(
    "webdataset_sample_group",
    oracle="""
    WITH ids AS (
        SELECT doc_id, 2 + doc_id % 4 AS n_samples
        FROM documents WHERE doc_id % 13 = 7
    ),
    samples AS (
        SELECT doc_id, CAST(s.i AS INT) AS i
        FROM ids, unnest(range(0, n_samples)) AS s(i)
    )
    SELECT doc_id AS file_id,
           'sample' || (doc_id * 1000 + i) AS sample_key,
           CAST(3 + i % 2 AS BIGINT) AS n_parts,
           CAST(120 + (doc_id + i) % 64 + 30 + (doc_id + i) % 16
                + 25 + (doc_id + i) % 8
                + CASE WHEN i % 2 = 1 THEN 40 + (doc_id + i) % 32
                       ELSE 0 END AS BIGINT) AS total_bytes,
           CASE WHEN i % 2 = 1 THEN 'jpg,json,seg.png,txt'
                ELSE 'jpg,json,txt' END AS exts
    FROM samples
    """,
    doc="WebDataset sample grouping CAPSTONE (operators/tarmeta.py — "
        "round-15): tar member rows -> training SAMPLES.  The "
        "WebDataset contract keys every member by the basename up to "
        "the FIRST dot (so ``sample1.seg.png`` and ``sample1.jpg`` "
        "are parts of ONE sample — pinned by the fixture's "
        "two-segment extension on odd samples), and a sample row "
        "aggregates its parts: count, total bytes, and the sorted "
        "extension list.  After the one Arrow-batched 1->N member "
        "scan everything is JVM-side: regexp key/ext extraction and "
        "a groupBy (file_id, sample_key) whose groups are tiny "
        "(<= 4 parts) and whose exchange carries only the narrow "
        "member rows — never the blobs.  collect_list goes through "
        "array_sort so the exts column is deterministic under any "
        "partitioning.",
)
def q_webdataset_sample_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.tarmeta import scan_tar_members

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 13 == 7)
        .select(F.col("doc_id").alias("file_id"))
    )

    def build(d: int) -> bytes:
        from etl_tiki_webscraping_spark.operators.tarmeta import (
            encode_tar_shard,
        )

        return encode_tar_shard(d, 2 + d % 4)

    blob_schema = T.StructType(
        [
            T.StructField("file_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "file_id": b["file_id"],
                    "content": b["file_id"].map(lambda d: build(int(d))),
                }
            )

    members = scan_tar_members(ids.mapInPandas(gen, blob_schema))
    files = members.filter(
        (F.col("member_idx") >= 0) & (~F.col("is_dir"))
    ).select(
        "file_id",
        F.regexp_extract(F.col("name"), r"^([^.]+)", 1).alias("sample_key"),
        F.regexp_extract(F.col("name"), r"^[^.]+\.(.*)$", 1).alias("ext"),
        "size",
    )
    return files.groupBy("file_id", "sample_key").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("size").alias("total_bytes"),
        F.concat_ws(",", F.array_sort(F.collect_list("ext"))).alias("exts"),
    )


@register(
    "wet_text_scan",
    oracle="""
    WITH ids AS (
        SELECT doc_id, (doc_id // 12) % 3 AS k,
               2 + doc_id % 4 AS n_pages
        FROM documents WHERE doc_id % 12 = 6
    ),
    ok AS (
        SELECT doc_id, CAST(p.i AS INT) AS page
        FROM ids, unnest(range(0, n_pages)) AS p(i)
        WHERE k < 2
    ),
    rows_ok AS (
        SELECT doc_id AS file_id, page,
               'https://example.org/site' || (doc_id % 97) || '/page'
                   || page AS target_uri,
               'Résumé doc ' || doc_id || ' page ' || page
                   || ': alpha beta tok' || ((doc_id + page) % 50)
                   || ' gamma delta' AS text,
               CAST(10 AS BIGINT) AS n_tokens
        FROM ok
    ),
    rows_bad AS (
        SELECT doc_id AS file_id, CAST(-1 AS INT) AS page,
               NULL AS target_uri, NULL AS text,
               CAST(NULL AS BIGINT) AS n_tokens
        FROM ids WHERE k = 2
    )
    SELECT * FROM rows_ok UNION ALL SELECT * FROM rows_bad
    """,
    doc="WET conversion-record scan (sources/warc.py::"
        "scan_wet_conversions — round-15): Common Crawl's published "
        "TEXT derivative — the same ISO 28500 framing as WARC but "
        "carrying one ``conversion`` record of pre-extracted utf-8 "
        "text per page — is the single cheapest entry point to "
        "web-scale pretraining text, and it rides the SAME single "
        "validated walk as every other WARC query (strict tiling, "
        "per-member gzip via the unused_data loop, lenient header "
        "decode).  Non-conversion records (warcinfo) skip without "
        "consuming a page index; the fixture cycles plain .wet, "
        "per-record-gzip .wet.gz, and a TRUNCATED archive that "
        "quarantines as the page = -1 row.  The text carries "
        "non-ASCII (Résumé) so the utf-8 payload decode is "
        "hash-observable, and token counting stays JVM-side "
        "(token_count over the scanned column).  Scale shape: one "
        "Arrow-batched 1->N mapInPandas pass, blobs never shuffle.",
)
def q_wet_text_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.functions.text import token_count
    from etl_tiki_webscraping_spark.sources.warc import scan_wet_conversions

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 12 == 6)
        .select(F.col("doc_id").alias("file_id"))
    )

    def build(d: int) -> bytes:
        from etl_tiki_webscraping_spark.sources.warc import encode_wet

        k = (d // 12) % 3
        n_pages = 2 + d % 4
        if k == 0:
            return encode_wet(d, n_pages)
        if k == 1:
            return encode_wet(d, n_pages, gzip_per_record=True)
        return encode_wet(d, n_pages, truncate=5)

    blob_schema = T.StructType(
        [
            T.StructField("file_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "file_id": b["file_id"],
                    "content": b["file_id"].map(lambda d: build(int(d))),
                }
            )

    scanned = scan_wet_conversions(ids.mapInPandas(gen, blob_schema))
    return scanned.select(
        "file_id", "page", "target_uri", "text",
        F.when(
            F.col("text").isNotNull(), token_count(F.col("text"))
        ).alias("n_tokens"),
    )


def _jsonl_gz_blob(d: int) -> bytes:
    """The jsonl.gz shard fixture shared by the batch ingest and its
    streaming twin: (d // 11) % 3 cycles single-member / two-member
    (split mid-line-list) / truncated-member; (d + i) % 7 == 3 lines
    are malformed JSON.  Pure doc_id arithmetic — both oracles replay
    every field."""
    import json
    import zlib

    def gz(b: bytes) -> bytes:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return co.compress(b) + co.flush()

    k = (d // 11) % 3
    n_lines = 4 + d % 5
    langs = ["en", "vi", "fr", "de"]
    lines = []
    for i in range(n_lines):
        if (d + i) % 7 == 3:
            lines.append("{oops")
        else:
            rid = d * 100 + i
            lines.append(json.dumps({
                "id": rid, "lang": langs[(d + i) % 4],
                "text": f"doc {rid} é text",
            }, ensure_ascii=False))
    if k == 1:
        h = (n_lines + 1) // 2
        m1 = ("\n".join(lines[:h]) + "\n").encode("utf-8")
        m2 = ("\n".join(lines[h:]) + "\n").encode("utf-8")
        return gz(m1) + gz(m2)
    raw = gz(("\n".join(lines) + "\n").encode("utf-8"))
    return raw[:-5] if k == 2 else raw


@register(
    "jsonl_gz_ingest",
    oracle="""
    WITH ids AS (
        SELECT doc_id, (doc_id // 11) % 3 AS k,
               4 + doc_id % 5 AS n_lines
        FROM documents WHERE doc_id % 11 = 4
    ),
    lines AS (
        SELECT doc_id, CAST(l.i AS INT) AS line_idx,
               (doc_id + l.i) % 7 = 3 AS bad
        FROM ids, unnest(range(0, n_lines)) AS l(i)
        WHERE k < 2
    ),
    rows_ok AS (
        SELECT doc_id AS file_id, line_idx,
               CAST(CASE WHEN bad THEN NULL
                    ELSE doc_id * 100 + line_idx END AS BIGINT) AS rec_id,
               CASE WHEN bad THEN NULL
                    ELSE CASE (doc_id + line_idx) % 4
                         WHEN 0 THEN 'en' WHEN 1 THEN 'vi'
                         WHEN 2 THEN 'fr' ELSE 'de' END END AS lang,
               CAST(CASE WHEN bad THEN NULL
                    ELSE length('doc ' || (doc_id * 100 + line_idx)
                                || ' é text') END AS BIGINT) AS n_chars,
               NOT bad AS valid
        FROM lines
    ),
    rows_bad AS (
        SELECT doc_id AS file_id, CAST(-1 AS INT) AS line_idx,
               CAST(NULL AS BIGINT) AS rec_id, NULL AS lang,
               CAST(NULL AS BIGINT) AS n_chars, FALSE AS valid
        FROM ids WHERE k = 2
    )
    SELECT * FROM rows_ok UNION ALL SELECT * FROM rows_bad
    """,
    doc="Gzipped-JSONL shard ingest (sources/records.py::"
        "gunzip_concat_text — round-15): the OTHER format training "
        "corpora actually ship in (c4/RedPajama/FineWeb-style "
        "``.jsonl.gz`` shards).  The decompress honors RFC 1952 "
        "multi-member concatenation — shard writers APPEND members, "
        "so the fixture cycles a single-member shard, a TWO-member "
        "shard split mid-line-list (only correct member concatenation "
        "reproduces the full line set), and a TRUNCATED member that "
        "quarantines the whole file as the line_idx = -1 row.  "
        "Everything after the one 1->1 Arrow decompress is JVM-side: "
        "split + posexplode to lines (original line numbers "
        "preserved), from_json with an explicit schema, and LINE-"
        "level quarantine — a malformed line yields valid = false "
        "with NULL fields while its neighbors survive (row-granular "
        "loss, the WARC http-decode contract at line granularity).  "
        "The text carries é so the utf-8 decode is hash-observable.",
)
def q_jsonl_gz_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.sources.records import gunzip_concat_text

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 11 == 4)
        .select(F.col("doc_id").alias("file_id"))
    )

    build = _jsonl_gz_blob

    blob_schema = T.StructType(
        [
            T.StructField("file_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "file_id": b["file_id"],
                    "content": b["file_id"].map(lambda d: build(int(d))),
                }
            )

    shards = gunzip_concat_text(
        ids.mapInPandas(gen, blob_schema), text_col="text"
    )
    # single pass over the kernel output: a quarantined file explodes
    # into one NULL line (-> the line_idx = -1 row) instead of a
    # separate union branch, so the Arrow decompress runs exactly ONCE
    # per blob — a union-of-filters shape re-evaluates the kernel per
    # branch (verified in the physical plan)
    lines = F.when(
        F.col("text").isNull(), F.array(F.lit(None).cast("string"))
    ).otherwise(F.split(F.col("text"), "\n"))
    exploded = shards.select(
        "file_id",
        F.col("text").isNull().alias("bad_file"),
        F.posexplode(lines).alias("pos", "line"),
    ).filter(F.col("bad_file") | (F.col("line") != ""))
    rec = F.from_json(F.col("line"), "id BIGINT, lang STRING, text STRING")
    return exploded.select(
        "file_id",
        F.when(F.col("bad_file"), F.lit(-1))
        .otherwise(F.col("pos")).alias("line_idx"),
        rec.getField("id").alias("rec_id"),
        rec.getField("lang").alias("lang"),
        F.length(rec.getField("text")).cast("bigint").alias("n_chars"),
        (~F.col("bad_file") & rec.getField("id").isNotNull()).alias("valid"),
    )


@register(
    "subtitle_cue_extract",
    oracle="""
    WITH ids AS (
        SELECT doc_id, 2 + doc_id % 4 AS n_cues
        FROM documents WHERE doc_id % 9 = 2
    ),
    cues AS (
        SELECT doc_id, CAST(c.i AS INT) AS cue_idx
        FROM ids, unnest(range(0, n_cues)) AS c(i)
    )
    SELECT doc_id AS sub_id, cue_idx,
           CAST(cue_idx * 2000 + doc_id % 500 AS BIGINT) AS start_ms,
           CAST(cue_idx * 2000 + doc_id % 500 + 1200
                + (cue_idx % 3) * 300 AS BIGINT) AS end_ms,
           CAST(1200 + (cue_idx % 3) * 300 AS BIGINT) AS duration_ms,
           'Line one tok' || ((doc_id + cue_idx) % 40)
               || ' second line ' || (doc_id % 7) AS text,
           CAST(6 AS BIGINT) AS n_tokens
    FROM cues
    """,
    doc="SRT / WebVTT subtitle cue extraction (round-15): subtitles "
        "are the highest-volume ALIGNED text for speech/video "
        "training data, and both public formats parse with pure JVM "
        "string machinery — zero UDF, zero shuffle, whole-stage "
        "codegen end to end (the sitemap_url_extract shape).  The "
        "fixture builds each document JVM-side from doc_id "
        "arithmetic — SRT on even ids (comma millisecond separator), "
        "WebVTT on odd (header line, dot separator) — and the parser "
        "under test is format-agnostic: one regexp family accepting "
        "``[,.]`` pulls the ``HH:MM:SS?mmm --> HH:MM:SS?mmm`` stamp "
        "pairs and the two text lines per cue via "
        "regexp_extract_all + arrays_zip + posexplode, then converts "
        "stamps to integer milliseconds with split/cast arithmetic "
        "(start, end, duration) and counts tokens.  The oracle "
        "replays the closed form.",
)
def q_subtitle_cue_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.text import token_count

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 9 == 2)
        .select(
            F.col("doc_id").alias("sub_id"),
            (F.lit(2) + F.col("doc_id") % 4).alias("n_cues"),
        )
    )

    sep = F.when(F.col("sub_id") % 2 == 0, F.lit(",")).otherwise(F.lit("."))

    def stamp(ms):
        return F.concat(
            F.lit("00:00:"),
            F.lpad((ms / 1000).cast("int").cast("string"), 2, "0"),
            sep,
            F.lpad((ms % 1000).cast("string"), 3, "0"),
        )

    def cue(i):
        start = i * 2000 + F.col("sub_id") % 500
        end = start + 1200 + (i % 3) * 300
        return F.concat(
            (i + 1).cast("string"), F.lit("\n"),
            stamp(start), F.lit(" --> "), stamp(end), F.lit("\n"),
            F.lit("Line one tok"),
            ((F.col("sub_id") + i) % 40).cast("string"), F.lit("\n"),
            F.lit("second line "),
            (F.col("sub_id") % 7).cast("string"), F.lit("\n\n"),
        )

    body = F.concat_ws(
        "",
        F.transform(F.sequence(F.lit(0), F.col("n_cues") - 1), cue),
    )
    doc = F.when(
        F.col("sub_id") % 2 == 0, body
    ).otherwise(F.concat(F.lit("WEBVTT\n\n"), body))
    docs = ids.select("sub_id", doc.alias("doc"))

    ts = r"\d{2}:\d{2}:\d{2}[,.]\d{3}"
    cue_pat = (
        "(" + ts + ") --> (" + ts + r")\n([^\n]+)\n([^\n]+)\n\n"
    )
    zipped = docs.select(
        "sub_id",
        F.arrays_zip(
            F.regexp_extract_all(F.col("doc"), F.lit(cue_pat), F.lit(1)).alias("s"),
            F.regexp_extract_all(F.col("doc"), F.lit(cue_pat), F.lit(2)).alias("e"),
            F.regexp_extract_all(F.col("doc"), F.lit(cue_pat), F.lit(3)).alias("t1"),
            F.regexp_extract_all(F.col("doc"), F.lit(cue_pat), F.lit(4)).alias("t2"),
        ).alias("cues"),
    )

    def to_ms(col):
        p = F.split(col, "[:,.]")
        return (
            p.getItem(0).cast("bigint") * 3600000
            + p.getItem(1).cast("bigint") * 60000
            + p.getItem(2).cast("bigint") * 1000
            + p.getItem(3).cast("bigint")
        )

    rows = zipped.select(
        "sub_id", F.posexplode("cues").alias("cue_idx", "c")
    )
    text = F.concat(F.col("c.t1"), F.lit(" "), F.col("c.t2"))
    start_ms = to_ms(F.col("c.s"))
    end_ms = to_ms(F.col("c.e"))
    return rows.select(
        "sub_id",
        "cue_idx",
        start_ms.alias("start_ms"),
        end_ms.alias("end_ms"),
        (end_ms - start_ms).alias("duration_ms"),
        text.alias("text"),
        token_count(text).alias("n_tokens"),
    )


@register(
    "tfrecord_example_scan",
    oracle="""
    WITH ids AS (
        SELECT doc_id, (doc_id // 14) % 4 AS k,
               3 + doc_id % 4 AS n_records
        FROM documents WHERE doc_id % 14 = 5
    ),
    recs AS (
        SELECT doc_id, k, n_records, CAST(r.i AS INT) AS i
        FROM ids, unnest(range(0, n_records)) AS r(i)
        WHERE k < 2
    ),
    tok AS (
        SELECT doc_id, i,
               CAST(SUM(100 + (doc_id + i + t.j) % 50) AS BIGINT)
                   AS tokens_sum
        FROM recs, unnest(range(0, 2 + i % 3)) AS t(j)
        GROUP BY doc_id, i
    ),
    rows_ok AS (
        SELECT r.doc_id AS file_id, r.i AS record_idx,
               NOT (r.k = 1 AND r.i = r.doc_id % r.n_records) AS valid,
               CAST(CASE WHEN r.k = 1 AND r.i = r.doc_id % r.n_records
                    THEN NULL ELSE 4 END AS INT) AS n_features,
               CASE WHEN r.k = 1 AND r.i = r.doc_id % r.n_records
                    THEN NULL
                    ELSE 'image,label,tokens,weight' END AS feature_names,
               CAST(CASE WHEN r.k = 1 AND r.i = r.doc_id % r.n_records
                    THEN NULL ELSE r.doc_id * 10 + r.i % 5
                    END AS BIGINT) AS label,
               CASE WHEN r.k = 1 AND r.i = r.doc_id % r.n_records
                    THEN NULL ELSE (r.i % 8) / 4.0 END AS weight,
               CASE WHEN r.k = 1 AND r.i = r.doc_id % r.n_records
                    THEN NULL ELSE t.tokens_sum END AS tokens_sum,
               CAST(CASE WHEN r.k = 1 AND r.i = r.doc_id % r.n_records
                    THEN NULL ELSE 2 + r.i % 3 END AS INT) AS n_tokens,
               CAST(CASE WHEN r.k = 1 AND r.i = r.doc_id % r.n_records
                    THEN NULL ELSE 40 + (r.doc_id + r.i) % 60
                    END AS BIGINT) AS image_len
        FROM recs r JOIN tok t ON r.doc_id = t.doc_id AND r.i = t.i
    ),
    rows_bad AS (
        SELECT doc_id AS file_id, CAST(-1 AS INT) AS record_idx,
               FALSE AS valid, CAST(NULL AS INT) AS n_features,
               NULL AS feature_names, CAST(NULL AS BIGINT) AS label,
               CAST(NULL AS DOUBLE) AS weight,
               CAST(NULL AS BIGINT) AS tokens_sum,
               CAST(NULL AS INT) AS n_tokens,
               CAST(NULL AS BIGINT) AS image_len
        FROM ids WHERE k >= 2
    )
    SELECT * FROM rows_ok UNION ALL SELECT * FROM rows_bad
    """,
    doc="TFRecord / tf.Example scan (operators/tfrecord.py — "
        "round-15): the TensorFlow training-shard format, parsed at "
        "BOTH public layers — the TFRecord framing (masked-CRC32C "
        "Castagnoli over length and payload, verified against the "
        "public 0xe3069283 test vector) and the tf.Example protobuf "
        "wire format (varint/fixed/length-delimited field walk; "
        "BytesList / packed FloatList / packed-varint Int64List).  "
        "Quarantine granularity follows what each failure leaves "
        "trustworthy: a corrupt DATA crc quarantines that RECORD "
        "(valid=false, NULL features) while neighbors survive; a "
        "corrupt LENGTH crc or truncation quarantines the FILE "
        "(record_idx = -1) because the walk itself cannot continue.  "
        "The fixture's float32 weights sit on the exact 0.25 grid so "
        "the float32->double decode is bit-replayable in the oracle; "
        "labels, token sums and image lengths are doc_id arithmetic.  "
        "Scale shape: one Arrow-batched 1->N mapInPandas expansion, "
        "blobs never shuffle.",
)
def q_tfrecord_example_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.tfrecord import (
        scan_tfrecord_examples,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 14 == 5)
        .select(F.col("doc_id").alias("file_id"))
    )

    def build(d: int) -> bytes:
        from etl_tiki_webscraping_spark.operators.tfrecord import (
            encode_tfrecord_file,
        )

        k = (d // 14) % 4
        n = 3 + d % 4
        if k == 0:
            return encode_tfrecord_file(d, n)
        if k == 1:
            return encode_tfrecord_file(d, n, corrupt_data_crc_at=d % n)
        if k == 2:
            return encode_tfrecord_file(d, n, corrupt_length_crc_at=0)
        return encode_tfrecord_file(d, n, truncate=3)

    blob_schema = T.StructType(
        [
            T.StructField("file_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "file_id": b["file_id"],
                    "content": b["file_id"].map(lambda d: build(int(d))),
                }
            )

    return scan_tfrecord_examples(ids.mapInPandas(gen, blob_schema))


@register(
    "avro_record_scan",
    oracle="""
    WITH ids AS (
        SELECT doc_id, (doc_id // 10) % 3 AS k,
               3 + doc_id % 5 AS n_records
        FROM documents WHERE doc_id % 10 = 7
    ),
    ok AS (
        SELECT doc_id, k, CAST(r.i AS INT) AS i
        FROM ids, unnest(range(0, n_records)) AS r(i)
        WHERE k < 2
    ),
    rows_ok AS (
        SELECT doc_id AS file_id, i AS rec_idx,
               CAST(doc_id * 100 + i AS BIGINT) AS rec_id,
               'avro doc ' || (doc_id * 100 + i) || ' é tok'
                   || ((doc_id + i) % 50) AS text,
               CASE k WHEN 0 THEN 'null' ELSE 'deflate' END AS codec
        FROM ok
    ),
    rows_bad AS (
        SELECT doc_id AS file_id, CAST(-1 AS INT) AS rec_idx,
               CAST(NULL AS BIGINT) AS rec_id, NULL AS text,
               NULL AS codec
        FROM ids WHERE k = 2
    )
    SELECT * FROM rows_ok UNION ALL SELECT * FROM rows_bad
    """,
    doc="Avro Object Container File record scan (operators/"
        "avrometa.py — round-15): the data-lake interchange format "
        "(Kafka dumps, schema-registry pipelines), decoded END TO "
        "END — OCF header metadata map (avro.schema JSON + "
        "avro.codec), 16-byte sync-marker discipline on every block, "
        "zigzag-varint longs, per-block record decode for the "
        "fixture's ``record Doc { long id; string text; }`` schema "
        "with null AND raw-deflate codecs, and the strict contract "
        "that each block's records consume its bytes EXACTLY with "
        "the declared count.  Any malformation (sync mismatch, "
        "truncation, codec/schema outside the strict subset, leftover "
        "block bytes) rejects the whole file into the rec_idx = -1 "
        "quarantine row.  The text carries é so the utf-8 string "
        "decode is hash-observable.  Scale shape: one Arrow-batched "
        "1->N mapInPandas expansion, blobs never shuffle.",
)
def q_avro_record_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.avrometa import (
        scan_avro_records,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 7)
        .select(F.col("doc_id").alias("file_id"))
    )

    def build(d: int) -> bytes:
        from etl_tiki_webscraping_spark.operators.avrometa import (
            encode_avro_file,
        )

        k = (d // 10) % 3
        n = 3 + d % 5
        if k == 0:
            return encode_avro_file(d, n)
        if k == 1:
            return encode_avro_file(d, n, codec="deflate")
        return encode_avro_file(d, n, truncate=3)

    blob_schema = T.StructType(
        [
            T.StructField("file_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "file_id": b["file_id"],
                    "content": b["file_id"].map(lambda d: build(int(d))),
                }
            )

    return scan_avro_records(ids.mapInPandas(gen, blob_schema))


@register(
    "sequence_pack_manifest",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               CAST(len(list_filter(
                   string_split_regex(trim(text), '[ \t\n\f\r]+'),
                   t -> t <> '')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    cum AS (
        SELECT doc_id, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS cum_before
        FROM toks
    )
    SELECT doc_id, n_tokens, cum_before,
           CAST(cum_before // 512 AS BIGINT) AS pack_first,
           CAST((cum_before + greatest(n_tokens, 1) - 1) // 512
               AS BIGINT) AS pack_last,
           CAST((cum_before + greatest(n_tokens, 1) - 1) // 512
               - cum_before // 512 AS BIGINT) AS n_boundary_crossings,
           CAST(cum_before % 512 AS BIGINT) AS offset_in_pack
    FROM cum
    """,
    doc="Sequence packing manifest (round-15): the GPT-style "
        "concat-and-chunk step every pretraining run performs — "
        "documents concatenate in a deterministic order and the token "
        "stream cuts into fixed 512-token packs, so each document "
        "lands at (pack_first, offset) and may cross pack boundaries.  "
        "The interesting part is the SCALE SHAPE of the global "
        "ordered cumsum: a naive Window over ORDER BY doc_id with no "
        "partition key collapses Spark onto ONE task for the whole "
        "corpus, so this query computes it as the classic two-pass "
        "distributed prefix sum instead — (1) per-bucket token sums "
        "(doc_id // 1000 buckets, a map-side-combined groupBy over "
        "BOUNDED groups), (2) bucket prefix offsets on the driver "
        "(a .collect() of |buckets| rows ~ |docs|/1000 — bounded, "
        "annotated), (3) broadcast-joined back and a window "
        "PARTITIONED BY bucket for the within-bucket cumsum — no "
        "single-task sort anywhere, every exchange keyed and "
        "bounded.  The DuckDB oracle replays the same arithmetic "
        "with a plain global window (correctness is "
        "order-deterministic, only the execution shape differs).",
)
def q_sequence_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from etl_tiki_webscraping_spark.functions.text import token_count

    cap = 512
    bucket_width = 1000
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            token_count(F.col("text")).alias("n_tokens"),
            (F.col("doc_id") / bucket_width).cast("bigint").alias("bucket"),
        )
    )
    # pass 1: per-bucket totals (bounded: |docs| / bucket_width groups)
    bucket_sums = docs.groupBy("bucket").agg(
        F.sum("n_tokens").alias("bucket_total")
    )
    # pass 2: bucket prefix offsets.  The .collect() is bounded by the
    # bucket count (5 rows at sf0.1, ~100k at 100 TB with a wider
    # bucket) — the classic distributed prefix-sum driver step.
    rows = sorted(
        (r["bucket"], r["bucket_total"]) for r in bucket_sums.collect()
    )
    prefix = []
    acc = 0
    for b, total in rows:
        prefix.append((b, acc))
        acc += total
    prefix_df = F.broadcast(
        docs.sparkSession.createDataFrame(
            prefix, "bucket bigint, bucket_prefix bigint"
        )
    )
    # pass 3: within-bucket window + broadcast prefix
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = (
        F.col("bucket_prefix")
        + F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    ).cast("bigint")
    eff = F.greatest(F.col("n_tokens"), F.lit(1))
    out = (
        docs.join(prefix_df, "bucket")
        .withColumn("cum_before", cum_before)
        .withColumn(
            "pack_first", (F.col("cum_before") / cap).cast("bigint")
        )
        .withColumn(
            "pack_last",
            ((F.col("cum_before") + eff - 1) / cap).cast("bigint"),
        )
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "cum_before",
        "pack_first",
        "pack_last",
        (F.col("pack_last") - F.col("pack_first")).alias(
            "n_boundary_crossings"
        ),
        (F.col("cum_before") % cap).alias("offset_in_pack"),
    )


@register(
    "webdataset_media_router",
    oracle="""
    WITH ids AS (
        SELECT doc_id, (doc_id // 15) % 2 AS k,
               2 + doc_id % 3 AS n_samples
        FROM documents WHERE doc_id % 15 = 3
    ),
    samples AS (
        SELECT doc_id, CAST(s.i AS INT) AS i
        FROM ids, unnest(range(0, n_samples)) AS s(i)
        WHERE k = 0
    ),
    luma AS (
        SELECT doc_id, i,
               CAST(SUM((doc_id + i + 3 * g.y + 5 * g.x) % 256)
                   AS BIGINT) AS luma_sum
        FROM samples,
             unnest(range(0, 6)) AS g_(y),
             unnest(range(0, 8)) AS g2(x),
             LATERAL (SELECT g_.y AS y, g2.x AS x) AS g
        GROUP BY doc_id, i
    ),
    png_rows AS (
        SELECT s.doc_id AS file_id, CAST(3 * s.i AS INT) AS member_idx,
               's' || (s.doc_id * 1000 + s.i) || '.png' AS name,
               'image' AS kind, l.luma_sum,
               CAST(8 AS INT) AS img_w, CAST(6 AS INT) AS img_h,
               CAST(NULL AS BIGINT) AS n_tokens,
               CAST(NULL AS BIGINT) AS label
        FROM samples s JOIN luma l ON s.doc_id = l.doc_id AND s.i = l.i
    ),
    txt_rows AS (
        SELECT doc_id AS file_id, CAST(3 * i + 1 AS INT) AS member_idx,
               's' || (doc_id * 1000 + i) || '.txt' AS name,
               'text' AS kind, CAST(NULL AS BIGINT) AS luma_sum,
               CAST(NULL AS INT) AS img_w, CAST(NULL AS INT) AS img_h,
               CAST(6 AS BIGINT) AS n_tokens,
               CAST(NULL AS BIGINT) AS label
        FROM samples
    ),
    json_rows AS (
        SELECT doc_id AS file_id, CAST(3 * i + 2 AS INT) AS member_idx,
               's' || (doc_id * 1000 + i) || '.json' AS name,
               'json' AS kind, CAST(NULL AS BIGINT) AS luma_sum,
               CAST(NULL AS INT) AS img_w, CAST(NULL AS INT) AS img_h,
               CAST(NULL AS BIGINT) AS n_tokens,
               CAST(doc_id * 10 + i % 7 AS BIGINT) AS label
        FROM samples
    ),
    bad_rows AS (
        SELECT doc_id AS file_id, CAST(-1 AS INT) AS member_idx,
               NULL AS name, NULL AS kind,
               CAST(NULL AS BIGINT) AS luma_sum,
               CAST(NULL AS INT) AS img_w, CAST(NULL AS INT) AS img_h,
               CAST(NULL AS BIGINT) AS n_tokens,
               CAST(NULL AS BIGINT) AS label
        FROM ids WHERE k = 1
    )
    SELECT * FROM png_rows UNION ALL SELECT * FROM txt_rows
    UNION ALL SELECT * FROM json_rows UNION ALL SELECT * FROM bad_rows
    """,
    doc="WebDataset mixed-media router CAPSTONE (operators/tarmeta.py"
        "::scan_tar_routed — round-15): the multimodal twin of "
        "warc_corpus_router, tying the tar container to the image and "
        "text stacks in one oracle-gated query.  One validated ustar "
        "walk per shard (payload capture inline — never a second "
        "parse); members dispatch by MAGIC, not extension: the PNG "
        "signature routes through the REAL in-kernel PNG decode "
        "(stdlib-zlib inflate + unfilter; the fixture's gray 6x8 "
        "gradient replays its luma SUM exactly — integer-valued "
        "float32 sums below 2^24 are exact), ``{`` routes the bytes "
        "out as a JSON string for JVM from_json (label extraction), "
        "and everything else decodes utf-8 and token-counts JVM-side "
        "(é in the fixture pins the charset path).  Binary never "
        "round-trips a charset decode.  A truncated shard "
        "quarantines whole (member_idx = -1).  Scale shape: one "
        "Arrow-batched 1->N mapInPandas pass, blobs never shuffle, "
        "all post-scan extraction is codegen'd JVM work.",
)
def q_webdataset_media_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.functions.text import token_count
    from etl_tiki_webscraping_spark.operators.tarmeta import scan_tar_routed

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 15 == 3)
        .select(F.col("doc_id").alias("file_id"))
    )

    def build(d: int) -> bytes:
        from etl_tiki_webscraping_spark.operators.tarmeta import (
            encode_wds_media_shard,
        )

        k = (d // 15) % 2
        return encode_wds_media_shard(d, 2 + d % 3, truncate=k == 1)

    blob_schema = T.StructType(
        [
            T.StructField("file_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "file_id": b["file_id"],
                    "content": b["file_id"].map(lambda d: build(int(d))),
                }
            )

    routed = scan_tar_routed(ids.mapInPandas(gen, blob_schema))
    return routed.select(
        "file_id",
        "member_idx",
        "name",
        "kind",
        "luma_sum",
        "img_w",
        "img_h",
        F.when(
            F.col("kind") == "text", token_count(F.col("payload_text"))
        ).alias("n_tokens"),
        F.when(
            F.col("kind") == "json",
            F.from_json(F.col("payload_text"), "label BIGINT").getField(
                "label"
            ),
        ).alias("label"),
    )


_WDS_SHARD_DIRS: "dict[str, str]" = {}


def _wds_shard_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage (memoized per sf_dir) the WebDataset shard DIRECTORY the
    custom DataSource reads — the deployment analog is a shard
    directory that already exists on shared storage.  The staging
    .collect() is the fixture WRITER, bounded at |docs|/17 shard ids
    (~300 rows at sf0.1); the READ path never collects."""
    if sf_dir in _WDS_SHARD_DIRS:
        return _WDS_SHARD_DIRS[sf_dir]
    import os
    import tempfile

    from etl_tiki_webscraping_spark.operators.tarmeta import encode_tar_shard

    ids = [
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 17 == 4)
        .select("doc_id")
        .collect()
    ]
    d_dir = tempfile.mkdtemp(prefix="wds-shards-")
    for d in sorted(ids):
        k = (d // 17) % 3
        blob = encode_tar_shard(d, 2 + d % 3, truncate=k == 2)
        with open(os.path.join(d_dir, f"shard{d:06d}.tar"), "wb") as fh:
            fh.write(blob)
    _WDS_SHARD_DIRS[sf_dir] = d_dir
    return d_dir


@register(
    "wds_datasource_scan",
    oracle="""
    WITH ids AS (
        SELECT doc_id, (doc_id // 17) % 3 AS k,
               2 + doc_id % 3 AS n_samples
        FROM documents WHERE doc_id % 17 = 4
    ),
    samples AS (
        SELECT doc_id, CAST(s.i AS INT) AS i
        FROM ids, unnest(range(0, n_samples)) AS s(i)
        WHERE k < 2
    ),
    parts AS (
        SELECT doc_id, i, CAST(p.j AS INT) AS p
        FROM samples, unnest(range(0, 3 + i % 2)) AS p(j)
    ),
    rows_ok AS (
        SELECT 'shard' || lpad(CAST(doc_id AS VARCHAR), 6, '0')
                   || '.tar' AS shard,
               CAST(3 * i + i // 2 + p AS INT) AS member_idx,
               'sample' || (doc_id * 1000 + i) || '.'
                   || CASE p WHEN 0 THEN 'jpg' WHEN 1 THEN 'txt'
                             WHEN 2 THEN 'json' ELSE 'seg.png' END AS name,
               CAST(CASE p WHEN 0 THEN 120 + (doc_id + i) % 64
                           WHEN 1 THEN 30 + (doc_id + i) % 16
                           WHEN 2 THEN 25 + (doc_id + i) % 8
                           ELSE 40 + (doc_id + i) % 32
                    END AS BIGINT) AS size,
               'sample' || (doc_id * 1000 + i) AS sample_key,
               CASE p WHEN 0 THEN 'jpg' WHEN 1 THEN 'txt'
                      WHEN 2 THEN 'json' ELSE 'seg.png' END AS ext
        FROM parts
    ),
    rows_bad AS (
        SELECT 'shard' || lpad(CAST(doc_id AS VARCHAR), 6, '0')
                   || '.tar' AS shard,
               CAST(-1 AS INT) AS member_idx, NULL AS name,
               CAST(NULL AS BIGINT) AS size, NULL AS sample_key,
               NULL AS ext
        FROM ids WHERE k = 2
    )
    SELECT * FROM rows_ok UNION ALL SELECT * FROM rows_bad
    """,
    doc="WebDataset shard-directory DataSource (sources/"
        "wds_datasource.py — round-15): the Spark-4-native packaging "
        "of the tar layer.  A registered python DataSource whose "
        "planner-visible unit of parallelism is the SHARD FILE — one "
        "InputPartition per *.tar, so Spark schedules shards across "
        "executors like file splits, a task retry re-reads only its "
        "own shard, and the strict ustar walk (checksum/octal/tiling/"
        "end-marker) runs inside the partition read with the "
        "member_idx = -1 quarantine row surfacing at the source "
        "boundary.  Key/extension derivation stays JVM-side "
        "(regexp over the narrow member rows).  The staged directory "
        "is the deployment analog of shards on shared storage "
        "(memoized; bench hoists it like the other warehouse "
        "fixtures).",
)
def q_wds_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.sources.wds_datasource import (
        WebDatasetDataSource,
    )

    spark.dataSource.register(WebDatasetDataSource)
    d_dir = _wds_shard_dir(spark, sf_dir)
    raw = (
        spark.read.format("webdataset")
        .schema("shard string, member_idx int, name string, size bigint")
        .option("path", d_dir)
        .load()
    )
    return raw.select(
        "shard",
        "member_idx",
        "name",
        "size",
        F.regexp_extract(F.col("name"), r"^([^.]+)", 1).alias("sample_key"),
        F.regexp_extract(F.col("name"), r"^[^.]+\.(.*)$", 1).alias("ext"),
    )


_STREAM_SHARD_INGEST: dict = {}


@register(
    "streaming_shard_ingest",
    oracle="""
    WITH ids AS (
        SELECT doc_id, (doc_id // 11) % 3 AS k,
               4 + doc_id % 5 AS n_lines
        FROM documents WHERE doc_id % 11 = 4
    ),
    lines AS (
        SELECT doc_id, CAST(l.i AS INT) AS i,
               (doc_id + l.i) % 7 = 3 AS bad
        FROM ids, unnest(range(0, n_lines)) AS l(i)
        WHERE k < 2
    ),
    cls AS (
        SELECT CASE WHEN bad THEN NULL
                    ELSE CASE (doc_id + i) % 4
                         WHEN 0 THEN 'en' WHEN 1 THEN 'vi'
                         WHEN 2 THEN 'fr' ELSE 'de' END END AS lang,
               NOT bad AS valid,
               CASE WHEN bad THEN 0
                    ELSE length('doc ' || (doc_id * 100 + i)
                                || ' é text') END AS n_chars
        FROM lines
        UNION ALL
        SELECT NULL AS lang, FALSE AS valid, 0 AS n_chars
        FROM ids WHERE k = 2
    )
    SELECT lang, valid, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(n_chars) AS BIGINT) AS chars_total
    FROM cls GROUP BY lang, valid
    """,
    doc="STREAMING twin of the jsonl.gz shard ingest: a REAL "
        "multi-micro-batch run (maxFilesPerTrigger=1, AvailableNow "
        "over a 3-file staged copy of the shard ids); each micro-batch "
        "synthesizes its shards (the shared _jsonl_gz_blob fixture — "
        "single-member / split-members / truncated cycling), runs the "
        "SAME single-pass decompress + JVM from_json + line-granular "
        "quarantine as the batch query, and appends per-line verdicts "
        "to a committed sink.  Ingest is per-shard, so batch "
        "boundaries cannot change the answer — the property that "
        "makes shard ingest stream safely stateless — and the sink "
        "rollup per (lang, valid) must equal the batch ground truth "
        "(the oracle).  The crawl-ingest shape: shards land "
        "continuously, parse/quarantine accounting runs "
        "incrementally.",
)
def q_streaming_shard_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _STREAM_SHARD_INGEST.get(sf_dir)
    if out is None:
        import tempfile

        from pyspark.sql import types as T

        from etl_tiki_webscraping_spark.sources.records import (
            gunzip_concat_text,
        )

        root = tempfile.mkdtemp(prefix="stream-shards-")
        src, sink_dir = root + "/src", root + "/verdicts"
        ids = (
            load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 11 == 4)
            .select(F.col("doc_id").alias("file_id"))
        )
        ids.repartition(3).write.parquet(src)

        blob_schema = T.StructType(
            [
                T.StructField("file_id", T.LongType(), False),
                T.StructField("content", T.BinaryType(), False),
            ]
        )

        def ingest(batch_df, _batch_id: int) -> None:
            def gen(batches):
                import pandas as pd

                for b in batches:
                    yield pd.DataFrame(
                        {
                            "file_id": b["file_id"],
                            "content": b["file_id"].map(
                                lambda d: _jsonl_gz_blob(int(d))
                            ),
                        }
                    )

            shards = gunzip_concat_text(
                batch_df.mapInPandas(gen, blob_schema), text_col="text"
            )
            lines = F.when(
                F.col("text").isNull(),
                F.array(F.lit(None).cast("string")),
            ).otherwise(F.split(F.col("text"), "\n"))
            exploded = shards.select(
                "file_id",
                F.col("text").isNull().alias("bad_file"),
                F.posexplode(lines).alias("pos", "line"),
            ).filter(F.col("bad_file") | (F.col("line") != ""))
            rec = F.from_json(
                F.col("line"), "id BIGINT, lang STRING, text STRING"
            )
            verdicts = exploded.select(
                "file_id",
                F.when(~F.col("bad_file"), rec.getField("lang")).alias(
                    "lang"
                ),
                (
                    ~F.col("bad_file")
                    & rec.getField("id").isNotNull()
                ).alias("valid"),
                F.coalesce(
                    F.when(
                        ~F.col("bad_file"),
                        F.length(rec.getField("text")).cast("bigint"),
                    ),
                    F.lit(0),
                ).alias("n_chars"),
            )
            verdicts.write.mode("append").parquet(sink_dir)

        q = (
            spark.readStream.schema("file_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(ingest)
            .option("checkpointLocation", root + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming shard ingest did not finish")
        out = sink_dir
        _STREAM_SHARD_INGEST[sf_dir] = out
    return (
        spark.read.parquet(out)
        .groupBy("lang", "valid")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_chars").alias("chars_total"),
        )
    )


@register(
    "compressed_shard_dispatch",
    oracle="""
    WITH ids AS (
        SELECT doc_id, (doc_id // 16) % 4 AS k,
               3 + doc_id % 4 AS n_lines
        FROM documents WHERE doc_id % 16 = 9
    ),
    lines AS (
        SELECT doc_id, k, CAST(l.i AS INT) AS line_idx
        FROM ids, unnest(range(0, n_lines)) AS l(i)
        WHERE k < 3
    ),
    rows_ok AS (
        SELECT doc_id AS file_id, line_idx,
               CAST(doc_id * 100 + line_idx AS BIGINT) AS rec_id,
               CAST(length('z doc ' || (doc_id * 100 + line_idx)
                           || ' é') AS BIGINT) AS n_chars,
               CASE k WHEN 0 THEN 'gzip' WHEN 1 THEN 'bz2'
                      ELSE 'xz' END AS codec
        FROM lines
    ),
    rows_bad AS (
        SELECT doc_id AS file_id, CAST(-1 AS INT) AS line_idx,
               CAST(NULL AS BIGINT) AS rec_id,
               CAST(NULL AS BIGINT) AS n_chars,
               'bz2' AS codec
        FROM ids WHERE k = 3
    )
    SELECT * FROM rows_ok UNION ALL SELECT * FROM rows_bad
    """,
    doc="Codec-dispatched shard ingest (sources/records.py::"
        "decompress_concat_text — round-15): the OTHER compressions "
        "public corpus dumps ship — bzip2 MULTISTREAM (the Wikipedia-"
        "dump layout, two independently-compressed streams "
        "concatenated so only a correct stream walk replays the full "
        "line set), xz (Pushshift-era archives), and gzip members — "
        "all stdlib, dispatched on magic INSIDE one Arrow kernel, "
        "with codec identification ALSO done JVM-side (hex-prefix "
        "compare on the binary column) so the quarantine row for a "
        "truncated bz2 stream still reports codec='bz2' — the loss "
        "is observable AND attributable.  Line parse and the "
        "quarantine row share the single-pass explode shape "
        "(kernel evaluates once per blob).",
)
def q_compressed_shard_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.sources.records import (
        decompress_concat_text,
    )

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 16 == 9)
        .select(F.col("doc_id").alias("file_id"))
    )

    def build(d: int) -> bytes:
        import bz2
        import json
        import lzma
        import zlib

        def gz(b: bytes) -> bytes:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            return co.compress(b) + co.flush()

        k = (d // 16) % 4
        n_lines = 3 + d % 4
        lines = [
            json.dumps(
                {"id": d * 100 + i, "text": f"z doc {d * 100 + i} é"},
                ensure_ascii=False,
            )
            for i in range(n_lines)
        ]
        raw = ("\n".join(lines) + "\n").encode("utf-8")
        if k == 0:
            return gz(raw)
        if k == 1:
            h = len(raw) // 2  # split mid-stream: true multistream
            return bz2.compress(raw[:h]) + bz2.compress(raw[h:])
        if k == 2:
            return lzma.compress(raw, format=lzma.FORMAT_XZ)
        return bz2.compress(raw)[:-4]  # truncated final stream

    blob_schema = T.StructType(
        [
            T.StructField("file_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "file_id": b["file_id"],
                    "content": b["file_id"].map(lambda d: build(int(d))),
                }
            )

    blobs = ids.mapInPandas(gen, blob_schema)
    # codec identification JVM-side from the magic bytes — reported
    # even for blobs the kernel quarantines
    codec = (
        F.when(
            F.hex(F.expr("substring(content, 1, 2)")) == "1F8B", "gzip"
        )
        .when(F.hex(F.expr("substring(content, 1, 3)")) == "425A68", "bz2")
        .when(
            F.hex(F.expr("substring(content, 1, 6)")) == "FD377A585A00",
            "xz",
        )
        .otherwise("unknown")
    )
    shards = decompress_concat_text(blobs).withColumn("codec", codec)
    lines = F.when(
        F.col("text").isNull(), F.array(F.lit(None).cast("string"))
    ).otherwise(F.split(F.col("text"), "\n"))
    exploded = shards.select(
        "file_id",
        "codec",
        F.col("text").isNull().alias("bad_file"),
        F.posexplode(lines).alias("pos", "line"),
    ).filter(F.col("bad_file") | (F.col("line") != ""))
    rec = F.from_json(F.col("line"), "id BIGINT, text STRING")
    return exploded.select(
        "file_id",
        F.when(F.col("bad_file"), F.lit(-1))
        .otherwise(F.col("pos")).alias("line_idx"),
        rec.getField("id").alias("rec_id"),
        F.length(rec.getField("text")).cast("bigint").alias("n_chars"),
        "codec",
    )


@register(
    "chat_turns_extract",
    oracle="""
    WITH ids AS (
        SELECT doc_id, 3 + doc_id % 5 AS n_turns,
               doc_id % 7 = 2 AS broken
        FROM documents WHERE doc_id % 18 = 6
    ),
    turns AS (
        SELECT doc_id, broken, CAST(t.j AS INT) AS turn_idx
        FROM ids, unnest(range(0, n_turns)) AS t(j)
    )
    SELECT doc_id AS conv_id, turn_idx,
           CASE WHEN turn_idx = 0 THEN 'system'
                WHEN turn_idx = 2 AND broken THEN 'user'
                WHEN turn_idx % 2 = 1 THEN 'user'
                ELSE 'assistant' END AS role,
           CASE WHEN turn_idx = 0 THEN 'sys prompt ' || (doc_id % 13)
                ELSE 'msg ' || turn_idx || ' tok'
                     || ((doc_id + turn_idx) % 30) || ' é' END AS content,
           CAST(CASE WHEN turn_idx = 0 THEN 3 ELSE 4 END AS BIGINT)
               AS n_tokens,
           NOT broken AS conv_valid
    FROM turns
    """,
    doc="Chat-conversation turn extraction (round-15): the SFT/RLHF "
        "data-prep step — ShareGPT-style conversation documents "
        "(a JSON array of {role, content} messages) flatten to typed "
        "turn rows with a per-conversation ROLE-ALTERNATION gate: "
        "system first, then strict user/assistant alternation; a "
        "conversation with two consecutive user turns (the fixture "
        "breaks position 2 on doc_id % 7 == 2) fails the gate for "
        "ALL its turns.  Everything is JVM codegen: the fixture "
        "builds each document through to_json over transform-built "
        "structs (a REAL JSON string), the parse is from_json with "
        "an explicit array<struct> schema + posexplode, and the gate "
        "is bool_and(role == expected(turn_idx)) over a window "
        "partitioned by conversation — small per-conversation "
        "groups, nothing wide crosses the exchange.  Zero UDF, one "
        "keyed window exchange.",
)
def q_chat_turns_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from etl_tiki_webscraping_spark.functions.text import token_count

    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 18 == 6)
        .select(
            F.col("doc_id").alias("conv_id"),
            (F.lit(3) + F.col("doc_id") % 5).alias("n_turns"),
            (F.col("doc_id") % 7 == 2).alias("broken"),
        )
    )

    def role_of(j):
        return (
            F.when(j == 0, F.lit("system"))
            .when((j == 2) & F.col("broken"), F.lit("user"))
            .when(j % 2 == 1, F.lit("user"))
            .otherwise(F.lit("assistant"))
        )

    def content_of(j):
        return F.when(
            j == 0,
            F.concat(F.lit("sys prompt "), (F.col("conv_id") % 13).cast("string")),
        ).otherwise(
            F.concat(
                F.lit("msg "), j.cast("string"), F.lit(" tok"),
                ((F.col("conv_id") + j) % 30).cast("string"), F.lit(" é"),
            )
        )

    doc = F.to_json(
        F.transform(
            F.sequence(F.lit(0), F.col("n_turns") - 1),
            lambda j: F.struct(
                role_of(j).alias("role"), content_of(j).alias("content")
            ),
        )
    )
    docs = ids.select("conv_id", doc.alias("doc"))

    turns = docs.select(
        "conv_id",
        F.posexplode(
            F.from_json(
                F.col("doc"), "array<struct<role string, content string>>"
            )
        ).alias("turn_idx", "turn"),
    ).select(
        "conv_id",
        "turn_idx",
        F.col("turn.role").alias("role"),
        F.col("turn.content").alias("content"),
    )
    expected = (
        F.when(F.col("turn_idx") == 0, F.lit("system"))
        .when(F.col("turn_idx") % 2 == 1, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    w = Window.partitionBy("conv_id")
    return turns.select(
        "conv_id",
        "turn_idx",
        "role",
        "content",
        token_count(F.col("content")).alias("n_tokens"),
        F.bool_and(F.col("role") == expected).over(w).alias("conv_valid"),
    )


@register(
    "preference_pair_prep",
    oracle="""
    WITH ids AS (
        SELECT doc_id,
               'answer ' || (doc_id % 50) || ' alpha beta é' AS chosen,
               CASE WHEN doc_id % 11 = 5
                    THEN 'answer ' || (doc_id % 50) || ' alpha beta é'
                    ELSE 'reply ' || (doc_id % 31) || ' gamma'
                         || CASE WHEN doc_id % 3 = 0
                                 THEN ' delta epsilon zeta eta theta'
                                 ELSE '' END END AS rejected
        FROM documents WHERE doc_id % 18 = 11
    ),
    feats AS (
        SELECT doc_id AS pair_id,
               CAST(len(list_filter(string_split_regex(trim(chosen),
                   '[ \t\n\f\r]+'), t -> t <> '')) AS BIGINT)
                   AS chosen_tokens,
               CAST(len(list_filter(string_split_regex(trim(rejected),
                   '[ \t\n\f\r]+'), t -> t <> '')) AS BIGINT)
                   AS rejected_tokens,
               chosen = rejected AS degenerate
        FROM ids
    )
    SELECT pair_id, chosen_tokens, rejected_tokens, degenerate,
           NOT degenerate
               AND chosen_tokens * 4 >= rejected_tokens
               AND rejected_tokens * 4 >= chosen_tokens AS keep
    FROM feats
    """,
    doc="Preference-pair preparation (round-15): the RLHF/DPO data-"
        "hygiene step — (chosen, rejected) pairs built from doc_id "
        "arithmetic (degenerate identical pairs on doc_id % 11 == 5, "
        "length-skewed rejections on doc_id % 3 == 0) gate on the "
        "two standard filters: degenerate pairs (chosen == rejected "
        "teaches the reward model nothing) and extreme length "
        "imbalance (a >4x token-count gap lets the model learn "
        "length, not preference — the documented length-bias "
        "failure).  All JVM codegen: the ASCII-class tokenizer both "
        "engines share, integer-ratio comparisons (never a float "
        "division), zero UDF, zero shuffle.",
)
def q_preference_pair_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tiki_webscraping_spark.functions.text import token_count

    ids = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 18 == 11
    )
    chosen = F.concat(
        F.lit("answer "), (F.col("doc_id") % 50).cast("string"),
        F.lit(" alpha beta é"),
    )
    rejected = F.when(F.col("doc_id") % 11 == 5, chosen).otherwise(
        F.concat(
            F.lit("reply "), (F.col("doc_id") % 31).cast("string"),
            F.lit(" gamma"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit(" delta epsilon zeta eta theta"),
            ).otherwise(F.lit("")),
        )
    )
    pairs = ids.select(
        F.col("doc_id").alias("pair_id"),
        token_count(chosen).alias("chosen_tokens"),
        token_count(rejected).alias("rejected_tokens"),
        (chosen == rejected).alias("degenerate"),
    )
    return pairs.select(
        "pair_id",
        "chosen_tokens",
        "rejected_tokens",
        "degenerate",
        (
            ~F.col("degenerate")
            & (F.col("chosen_tokens") * 4 >= F.col("rejected_tokens"))
            & (F.col("rejected_tokens") * 4 >= F.col("chosen_tokens"))
        ).alias("keep"),
    )


@register(
    "fim_transform",
    oracle="""
    WITH docs AS (
        SELECT doc_id, text, length(text) AS n
        FROM documents WHERE doc_id % 18 = 15
    ),
    cuts AS (
        SELECT doc_id, text, n,
               CAST(1 + (n * 2) // 5 + doc_id % 7 AS BIGINT) AS a,
               CAST(1 + (n * 2) // 5 + doc_id % 7 + (n * 3) // 10
                   AS BIGINT) AS b
        FROM docs
    )
    SELECT doc_id,
           CAST(a - 1 AS BIGINT) AS prefix_len,
           CAST(b - a AS BIGINT) AS middle_len,
           CAST(n - b + 1 AS BIGINT) AS suffix_len,
           '<PRE>' || substr(text, 1, CAST(a - 1 AS INT))
               || '<SUF>' || substr(text, CAST(b AS INT))
               || '<MID>' || substr(text, CAST(a AS INT),
                                    CAST(b - a AS INT)) AS psm
    FROM cuts
    """,
    doc="Fill-in-the-middle transform (round-15): the PSM "
        "(prefix-suffix-middle) reordering code-model pretraining "
        "applies to a fraction of documents — deterministic cut "
        "points from pure length/doc_id arithmetic (a at ~40% + "
        "jitter, b at a + ~30%), the document re-emitted as "
        "<PRE>prefix<SUF>suffix<MID>middle with the three span "
        "lengths, so the model learns to infill conditioned on both "
        "sides.  Cut points land mid-token by design (FIM operates "
        "on characters/bytes, not token boundaries — the public "
        "recipe).  All JVM codegen substring arithmetic on REAL "
        "document text (1-based substr agrees across engines), zero "
        "UDF, zero shuffle; the oracle replays every span from the "
        "same closed form.",
)
def q_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 18 == 15)
        .select("doc_id", "text", F.length("text").alias("n"))
    )
    a = (
        F.lit(1) + (F.col("n") * 2 / 5).cast("bigint")
        + F.col("doc_id") % 7
    ).cast("bigint")
    b = (a + (F.col("n") * 3 / 10).cast("bigint")).cast("bigint")
    cuts = docs.select("doc_id", "text", "n", a.alias("a"), b.alias("b"))
    psm = F.concat(
        F.lit("<PRE>"),
        F.expr("substr(text, 1, CAST(a - 1 AS INT))"),
        F.lit("<SUF>"),
        F.expr("substr(text, CAST(b AS INT))"),
        F.lit("<MID>"),
        F.expr("substr(text, CAST(a AS INT), CAST(b - a AS INT))"),
    )
    return cuts.select(
        "doc_id",
        (F.col("a") - 1).alias("prefix_len"),
        (F.col("b") - F.col("a")).alias("middle_len"),
        (F.col("n") - F.col("b") + 1).alias("suffix_len"),
        psm.alias("psm"),
    )


@register(
    "context_length_histogram",
    oracle="""
    WITH toks AS (
        SELECT CAST(len(list_filter(
            string_split_regex(trim(text), '[ \t\n\f\r]+'),
            t -> t <> '')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    b AS (
        SELECT CAST(length(bin(greatest(n_tokens, 1))) AS INT)
                   AS bucket,
               n_tokens
        FROM toks
    ),
    g AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS tokens_total
        FROM b GROUP BY bucket
    )
    SELECT bucket,
           CAST(power(2, bucket - 1) AS BIGINT) AS lo,
           CAST(power(2, bucket) - 1 AS BIGINT) AS hi,
           n_docs, tokens_total,
           CAST(SUM(tokens_total) OVER (
               ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS tokens_cum
    FROM g
    """,
    doc="Context-length histogram (round-15): the context-window "
        "planning stat every pretraining run computes — documents "
        "bucketed by power-of-two token-count ranges (how much data "
        "fits a 2k/8k/32k context, what share of tokens lives in "
        "long documents).  The log2 bucket uses the cross-engine "
        "leading-zero recipe (r13 portability note #4): Spark "
        "length(conv(x, 10, 2)) == DuckDB length(bin(x)), both "
        "unpadded — never a float log().  The cumulative-token "
        "window runs over the BUCKET rollup (<= 64 rows by "
        "construction), so the unpartitioned window is bounded and "
        "scale-safe; the per-document work is one map-side-combined "
        "groupBy.  All JVM codegen, zero UDF.",
)
def q_context_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from etl_tiki_webscraping_spark.functions.text import token_count

    toks = load_table(spark, sf_dir, "documents").select(
        token_count(F.col("text")).alias("n_tokens")
    )
    bucket = F.length(
        F.conv(F.greatest(F.col("n_tokens"), F.lit(1)), 10, 2)
    ).cast("int")
    g = (
        toks.select(bucket.alias("bucket"), "n_tokens")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens_total"),
        )
    )
    # the unpartitioned window runs over the bucket ROLLUP (<= 64
    # rows by construction) — bounded, not a scale-killer
    w = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return g.select(
        "bucket",
        F.pow(F.lit(2), F.col("bucket") - 1).cast("bigint").alias("lo"),
        (F.pow(F.lit(2), F.col("bucket")) - 1).cast("bigint").alias("hi"),
        "n_docs",
        "tokens_total",
        F.sum("tokens_total").over(w).cast("bigint").alias("tokens_cum"),
    )
