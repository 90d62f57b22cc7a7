"""Iterative graph algorithms over edge DataFrames.

The reference has no graph surface (its dataflow is a linear scrape ->
project -> upsert chain, dags/etl.py:25-343); this module is part of
the large-scale training-data extension surface: duplicate clusters,
citation/link graphs, and source-authority weighting all reduce to a
few primitives over an ``(src, dst)`` edge table.  Connected
components already lives in ``operators.dedup``; this adds PageRank,
the canonical *fixed-point* iteration (ranks converge rather than
labels propagating).

Scale shape: each PageRank iteration is exactly ONE shuffle (the
contribution ``groupBy(dst)``) plus one scalar aggregate (dangling
mass, broadcast back); the edge table and out-degree table are
localCheckpoint-ed once and reused by every iteration, so the loop is
O(iterations) jobs with O(edges) work each — never O(edges^2) and
never a growing lineage.  Per-row contributions quantize to integer
1e-15 units (floor(x*1e15 + 0.5), exact DECIMAL(38,0) sums) so the
result is order-independent and BIT-identical across engines (the
DuckDB oracle unrolls the same iterations and hash-matches at any
precision).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 6,
    tol: float | None = None,
    broadcast_node_limit: int = 2_000_000,
) -> DataFrame:
    """PageRank over a directed edge DataFrame — fixed-iteration by
    default, CONVERGENCE-STOPPED when ``tol`` is set.

    Returns ``(node, rank)`` for every node that appears as a source
    or destination.  Duplicate edges are collapsed (standard unweighted
    PageRank).  Dangling nodes (no out-edges) redistribute their mass
    uniformly each iteration, so total rank mass is conserved at 1.0.

    ``tol``: when given, iteration stops EARLY once the L1 delta
    ``sum(|rank' - rank|)`` falls below it (one extra scalar aggregate
    per iteration — a node-keyed join of two checkpointed rank tables
    reduced to a single row), with ``iterations`` as the hard cap.  At
    100x scale the fixed count is either wasted work or not converged;
    the epsilon stop pays one cheap job per iteration to run exactly
    as many as the graph needs.  The oracle-checked catalog query
    keeps the fixed-iteration form (the unrolled-CTE oracle needs a
    known count).

    Update rule per iteration (mirrored verbatim by the SQL oracle so
    the arithmetic is IEEE-identical across engines)::

        rank'(v) = (1-d)/N + d * (sum_{u->v} rank(u)/outdeg(u) + D/N)

    where ``D`` is the summed rank of dangling nodes.  Both sums
    quantize per row to integer 1e-15 units (floor(x*1e15 + 0.5) —
    the same IEEE formula on both engines) and accumulate exactly in
    DECIMAL(38,0), for order-independence AND bit-identical
    cross-engine replay.

    The driver loop runs ``iterations`` bounded Spark jobs (one
    localCheckpoint per iteration truncates the otherwise-doubling
    plan lineage — same bounded-fold shape as the SCD2 commit fold in
    ``sinks.upsert``); each job is one shuffle keyed by ``dst``.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint()  # reused every iteration; computed once
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()  # scalar; graphs fit node COUNTS on the driver, not nodes
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    # out-degree rides ON the node/rank table (r16): the former shape
    # kept outdeg as a separate checkpointed table and joined +
    # broadcast it TWICE per iteration (contribution join, dangling
    # anti-join) — two extra broadcast-build jobs and one extra join
    # per iteration, 6x over.  Folding od into the node table once
    # makes the contribution pass a single rank-table join and turns
    # the dangling anti-join into a null-od filter over the already-
    # checkpointed ranks.  Values are unchanged: same rows feed the
    # same quantized sums.
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("od"))
    nodes_od = (
        nodes.join(outdeg, nodes["node"] == outdeg["src"], "left")
        .select("node", "od")
        .localCheckpoint()
    )

    inv_n = 1.0 / float(n)
    teleport = (1.0 - damping) / float(n)
    ranks = nodes_od.select("node", "od", F.lit(inv_n).alias("rank"))

    # adaptive join strategy, decided from the EXACT node count the
    # driver already holds: when the rank table fits comfortably in a
    # broadcast (n <= broadcast_node_limit, ~40 B/row -> <= ~80 MB),
    # ship ranks/outdeg to the edge partitions instead of shuffling
    # the (much larger) edge table once per iteration — the edge scan
    # then never crosses an exchange and the only shuffle left is the
    # (dst, units) partial-aggregated contribution reduce.  Past the
    # limit the plain shuffle join is the correct 100 TB plan, so this
    # degrades to exactly what it was.  Values are unchanged either
    # way: the quantized integer sums are order- and plan-independent.
    def maybe_broadcast(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if n <= broadcast_node_limit else df

    for _ in range(iterations):
        # per-row quantization to integer 1e-15 units via
        # floor(x*1e15 + 0.5): the SAME IEEE-double formula on both
        # engines, so the exact DECIMAL(38,0) sums are bit-identical
        # at any hash precision (a double->DECIMAL(38,18) cast rounds
        # half-way ties differently between Spark and DuckDB and
        # drifted the final ranks by ~1 ULP).  Ranks sum to 1 so
        # x <= 1 and x*1e15 <= 1e15 < 2^53 — the product is an exact
        # integer in double on both engines.
        contrib = (
            e.join(
                maybe_broadcast(ranks.filter(F.col("od").isNotNull())),
                ranks["node"] == e["src"],
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(
                (
                    F.sum(
                        F.floor(
                            (F.col("rank") / F.col("od")) * F.lit(1e15)
                            + F.lit(0.5)
                        ).cast("decimal(38,0)")
                    ).cast("double")
                    / F.lit(1e15)
                ).alias("s")
            )
        )
        dangling = (
            ranks.filter(F.col("od").isNull())
            .agg(
                (
                    F.coalesce(
                        F.sum(
                            F.floor(
                                F.col("rank") * F.lit(1e15) + F.lit(0.5)
                            ).cast("decimal(38,0)")
                        ),
                        F.lit(0).cast("decimal(38,0)"),
                    ).cast("double")
                    / F.lit(1e15)
                ).alias("dm")
            )
        )
        new_ranks = (
            nodes_od.crossJoin(F.broadcast(dangling))  # 1-row scalar
            .join(contrib, "node", "left")
            .select(
                "node",
                "od",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("s"), F.lit(0.0))
                        + F.col("dm") * F.lit(inv_n)
                    )
                ).alias("rank"),
            )
            # LAZY checkpoint (r17): the SQL plan truncates immediately
            # (same bounded-lineage guarantee), but materialization is
            # deferred to the consumer's action, so the 6 iterations
            # execute as one composed submission instead of 6 serial
            # per-iteration job round-trips — measured ~8% on the
            # fixture, bit-identical ranks.  (Eager materialization
            # also counted against driver.maxResultSize in local mode.)
            .localCheckpoint(eager=False)
        )
        if tol is not None:
            # L1 delta as ONE scalar row: both rank tables are
            # checkpointed and share the node key set by construction
            delta = (
                new_ranks.select("node", F.col("rank").alias("r2"))
                .join(ranks.select("node", F.col("rank").alias("r1")), "node")
                .agg(
                    F.sum(
                        F.abs(F.col("r2") - F.col("r1")).cast("decimal(38,18)")
                    )
                    .cast("double")
                    .alias("d")
                )
                .first()["d"]
            )
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        else:
            ranks = new_ranks
    return ranks.select("node", "rank")


def pagerank_oracle_sql(
    edges_cte: str,
    damping: float = 0.85,
    iterations: int = 6,
) -> str:
    """Build the DuckDB oracle for :func:`pagerank` by unrolling the
    iterations into chained CTEs (DuckDB 1.0 recursive CTEs cannot
    aggregate in the recursive term, so unrolling is the faithful
    SQL form).  ``edges_cte`` must be a SELECT producing (src, dst).

    Every arithmetic step mirrors the Spark expression shape exactly —
    contributions and dangling mass quantized per row to integer
    1e-15 units and summed exactly via DECIMAL(38,0), the
    teleport/damping combine in the same association order — so the
    two engines agree bit-for-bit at full precision.
    """
    parts = [
        f"WITH edges AS (SELECT DISTINCT src, dst FROM ({edges_cte}))",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "outdeg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS od"
        " FROM edges GROUP BY src)",
        "r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS rank"
        " FROM nodes, nn)",
    ]
    d = repr(damping)
    one_minus_d = repr(1.0 - damping)
    for i in range(1, iterations + 1):
        p = i - 1
        parts.append(
            f"s{i} AS (SELECT e.dst AS node,"
            f" CAST(SUM(CAST(FLOOR(r.rank / o.od * 1e15 + 0.5)"
            f" AS DECIMAL(38,0))) AS DOUBLE) / 1e15 AS s"
            f" FROM edges e JOIN r{p} r ON r.node = e.src"
            f" JOIN outdeg o ON o.src = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"d{i} AS (SELECT CAST(COALESCE("
            f"SUM(CAST(FLOOR(r.rank * 1e15 + 0.5) AS DECIMAL(38,0))),"
            f" CAST(0 AS DECIMAL(38,0))) AS DOUBLE) / 1e15 AS dm"
            f" FROM r{p} r LEFT JOIN outdeg o ON o.src = r.node"
            f" WHERE o.src IS NULL)"
        )
        parts.append(
            f"r{i} AS (SELECT nd.node,"
            f" (CAST({one_minus_d} AS DOUBLE) / nn.n)"
            f" + CAST({d} AS DOUBLE) * (COALESCE(s.s, CAST(0.0 AS DOUBLE))"
            f" + d.dm * (CAST(1.0 AS DOUBLE) / nn.n)) AS rank"
            f" FROM nodes nd CROSS JOIN nn CROSS JOIN d{i} d"
            f" LEFT JOIN s{i} s ON s.node = nd.node)"
        )
    body = ",\n".join(parts)
    return f"{body}\nSELECT node, rank FROM r{iterations}"
