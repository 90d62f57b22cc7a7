"""Distributed IRLS logistic regression vs a single-node numpy replay."""

from __future__ import annotations

import numpy as np
import pytest


def _reference_irls(X, y, max_iters=10, ridge=1e-8, tol=1e-10):
    d = X.shape[1]
    beta = np.zeros(d)
    devs = []
    for _ in range(max_iters):
        eta = X @ beta
        p = 1.0 / (1.0 + np.exp(-eta))
        eps = 1e-12
        w = np.clip(p * (1.0 - p), eps, None)
        z = eta + (y - p) / w
        A = X.T @ (w[:, None] * X) + ridge * np.eye(d)
        v = X.T @ (w * z)
        devs.append(-2.0 * float(
            np.sum(y * np.log(np.clip(p, eps, None))
                   + (1 - y) * np.log(np.clip(1 - p, eps, None)))
        ))
        nb = np.linalg.solve(A, v)
        if np.max(np.abs(nb - beta)) < tol:
            beta = nb
            break
        beta = nb
    return beta, devs


def _toy(n=500, seed=3):
    rng = np.random.RandomState(seed)
    x1 = rng.uniform(-2, 2, n)
    x2 = rng.uniform(-2, 2, n)
    logit = 0.7 + 1.8 * x1 - 1.1 * x2
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-logit))).astype(float)
    return x1, x2, y


class TestLogregIRLS:
    def _fit(self, spark, x1, x2, y, repartition=8, **kw):
        from etl_tiki_webscraping_spark.operators.mlfit import (
            logreg_train_irls,
        )

        df = spark.createDataFrame(
            [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)],
            "x1 double, x2 double, y double",
        ).repartition(repartition)
        return logreg_train_irls(df, ["x1", "x2"], "y", **kw)

    def test_matches_single_node_irls(self, spark):
        x1, x2, y = _toy()
        beta, devs = self._fit(spark, x1, x2, y)
        X = np.column_stack([np.ones(len(y)), x1, x2])
        want, want_devs = _reference_irls(X, y)
        assert np.max(np.abs(beta - want)) < 1e-6
        assert abs(devs[-1] - want_devs[-1]) < 1e-6
        # recovered roughly the generating coefficients
        assert abs(beta[0] - 0.7) < 0.6
        assert abs(beta[1] - 1.8) < 0.8
        assert abs(beta[2] + 1.1) < 0.8

    def test_deviance_monotone_nonincreasing(self, spark):
        x1, x2, y = _toy(seed=9)
        _, devs = self._fit(spark, x1, x2, y)
        assert len(devs) >= 2
        assert all(b <= a + 1e-6 for a, b in zip(devs, devs[1:]))

    def test_partitioning_invariance(self, spark):
        x1, x2, y = _toy(seed=5, n=300)
        b1, _ = self._fit(spark, x1, x2, y, repartition=1)
        b8, _ = self._fit(spark, x1, x2, y, repartition=8)
        assert np.max(np.abs(b1 - b8)) < 1e-8

    def test_null_rows_excluded(self, spark):
        from etl_tiki_webscraping_spark.operators.mlfit import (
            logreg_train_irls,
        )

        df = spark.createDataFrame(
            [(0.5, 1.0), (None, 0.0), (-0.5, 0.0), (1.5, 1.0)],
            "x1 double, y double",
        )
        beta, _ = logreg_train_irls(df, ["x1"], "y", max_iters=5)
        clean = spark.createDataFrame(
            [(0.5, 1.0), (-0.5, 0.0), (1.5, 1.0)], "x1 double, y double"
        )
        want, _ = logreg_train_irls(clean, ["x1"], "y", max_iters=5)
        assert np.max(np.abs(beta - want)) < 1e-10

    def test_report_shape(self, spark):
        from etl_tiki_webscraping_spark.operators.mlfit import (
            logreg_train_report,
        )

        x1, x2, y = _toy(n=120, seed=2)
        df = spark.createDataFrame(
            [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)],
            "x1 double, x2 double, y double",
        )
        rows = logreg_train_report(df, ["x1", "x2"], "y").collect()
        assert [r.feature for r in rows] == [
            "(intercept)", "x1", "x2", "(deviance)"
        ]

    def test_empty_raises(self, spark):
        from etl_tiki_webscraping_spark.operators.mlfit import (
            logreg_train_irls,
        )

        df = spark.createDataFrame([], "x1 double, y double")
        with pytest.raises(ValueError):
            logreg_train_irls(df, ["x1"], "y")
