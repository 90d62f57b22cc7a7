"""PageRank (operators/graph.py, catalog graph_pagerank): fixed-point
semantics pinned against a NumPy power-iteration reference, mass
conservation, dangling-node redistribution, and the analytic uniform
solution on a cycle."""

from __future__ import annotations

import numpy as np
import pytest

from etl_tiki_webscraping_spark.operators.graph import pagerank


def _numpy_pagerank(edges, damping=0.85, iterations=6):
    """Dense power-iteration reference with the same update rule:
    rank' = (1-d)/N + d * (M @ rank + dangling_mass / N)."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    dedup = sorted(set(edges))
    outdeg = np.zeros(n)
    for u, _ in dedup:
        outdeg[idx[u]] += 1
    m = np.zeros((n, n))
    for u, v in dedup:
        m[idx[v], idx[u]] = 1.0 / outdeg[idx[u]]
    rank = np.full(n, 1.0 / n)
    for _ in range(iterations):
        dangling = rank[outdeg == 0].sum()
        rank = (1.0 - damping) / n + damping * (m @ rank + dangling / n)
    return dict(zip(nodes, rank))


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


class TestPagerank:
    def test_cycle_is_uniform(self, spark):
        # on a simple cycle every node has the analytic rank 1/N at
        # every iteration, regardless of damping
        edges = [("a", "b"), ("b", "c"), ("c", "a")]
        got = _run(spark, edges, iterations=4)
        for v in got.values():
            assert v == pytest.approx(1.0 / 3.0, abs=1e-12)

    def test_matches_numpy_power_iteration(self, spark):
        # deterministic pseudo-random digraph incl. dangling nodes and
        # a duplicate edge (must collapse)
        rng = np.random.default_rng(7)
        edges = [
            (f"n{a}", f"n{b}")
            for a, b in rng.integers(0, 25, size=(120, 2))
            if a != b
        ]
        edges.append(edges[0])  # duplicate edge
        want = _numpy_pagerank(edges, iterations=6)
        got = _run(spark, edges, iterations=6)
        assert set(got) == set(want)
        for node, w in want.items():
            assert got[node] == pytest.approx(w, rel=1e-9), node

    def test_mass_conserved_with_dangling(self, spark):
        # b and c are dangling; without redistribution total mass decays
        edges = [("a", "b"), ("a", "c")]
        got = _run(spark, edges, iterations=5)
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
        # symmetry: b and c are structurally identical
        assert got["b"] == pytest.approx(got["c"], abs=1e-15)
        # a receives only teleport + dangling share; b/c also get a's mass
        assert got["b"] > got["a"]


class TestPagerankConvergence:
    """tol= epsilon early stop (VERDICT r8 ask #6)."""

    EDGES = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]

    def test_loose_tol_stops_after_one_iteration(self, spark):
        """A tol bigger than any possible L1 delta stops after the
        first iteration — result must equal iterations=1 exactly."""
        one = _run(spark, self.EDGES, iterations=1)
        early = _run(spark, self.EDGES, iterations=50, tol=10.0)
        assert early == one

    def test_tight_tol_matches_converged_fixed_run(self, spark):
        """A tight tol converges to (numerically) the same fixed point
        a long fixed run reaches, without running all 100 iterations."""
        fixed = _run(spark, self.EDGES, iterations=100)
        conv = _run(spark, self.EDGES, iterations=100, tol=1e-12)
        for node, r in fixed.items():
            assert conv[node] == pytest.approx(r, abs=1e-9)

    def test_mass_conserved_under_early_stop(self, spark):
        got = _run(spark, self.EDGES, iterations=50, tol=1e-6)
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    def test_early_stop_runs_fewer_jobs(self, spark):
        """The epsilon stop must actually cut iterations: on a cycle
        (uniform from iteration 0, delta 0 after the first update) a
        tol run equals the 1-iteration result even with a huge cap."""
        cycle = [("a", "b"), ("b", "c"), ("c", "a")]
        one = _run(spark, cycle, iterations=1)
        conv = _run(spark, cycle, iterations=500, tol=1e-15)
        assert conv == one
