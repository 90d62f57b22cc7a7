"""Distributed model fitting: logistic regression via IRLS.

The quality-classifier half the corpus pipeline was missing: the
engine could SCORE documents with fixed weights (catalog
``quality_model_score``) but not TRAIN those weights on labeled data.
A pretraining pipeline trains exactly this model (fastText-style
linear classifier over cheap text features) on a few hundred thousand
labels and then scores billions of documents with it.

Scale shape (the ``embedding_pca`` precedent, similarity.py:829): each
IRLS iteration is ONE shuffle-free Arrow pass computing per-batch
partials of the d x d normal matrix X'WX, the d-vector X'Wz, and the
deviance; partials reduce through a posexplode + groupBy(pos) whose
cardinality is d^2 + d + 2 regardless of n, and only that reaches the
driver for the O(d^3) solve.  Feature dimension d is small by
construction (heuristic text features), n never leaves the executors.

Like PageRank/BPE, the iteration count is the driver-loop depth —
IRLS is Newton's method, so 6-10 iterations reach float precision on
well-conditioned problems; ``tol`` stops early on coefficient
stability.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def logreg_train_irls(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    max_iters: int = 10,
    ridge: float = 1e-8,
    tol: float = 1e-10,
) -> "tuple[np.ndarray, list[float]]":
    """Fit ``P(y=1|x) = sigmoid(b0 + b . x)`` by iteratively reweighted
    least squares.  Returns ``(beta, deviances)`` where ``beta[0]`` is
    the intercept and ``deviances`` has one entry per iteration
    (monotone non-increasing on convergent fits — the gate the unit
    tests pin).

    Each iteration solves ``(X'WX + ridge*I) beta = X'Wz`` with
    ``W = diag(p(1-p))`` and working response
    ``z = X beta + (y - p)/w``, accumulated in ONE Arrow pass as
    described in the module docstring.  Rows with a NULL feature or
    label are excluded up front (same contract as
    ``ordered_budget_select``).  ``ridge`` keeps the solve defined
    under separable data; with default 1e-8 it is numerically
    invisible on non-degenerate problems.

    Determinism: partials add in float64 across batches; coefficients
    are reproducible to ~1e-9 across partitionings (report consumers
    round — see the catalog query), exactly the embedding_pca
    contract.
    """
    if max_iters < 1:
        # zero iterations would return the all-zero init with NO
        # deviance trace — the report indexes deviances[-1]
        raise ValueError("need max_iters >= 1")
    feats = list(feature_cols)
    d = len(feats) + 1
    cols = [F.col(label_col).cast("double").alias("__y")] + [
        F.col(c).cast("double").alias(f"__x{i}") for i, c in enumerate(feats)
    ]
    # persisted for the loop: every iteration re-consumes the feature
    # projection — uncached, the caller's upstream plan (feature
    # extraction over the whole corpus) would re-execute max_iters
    # times; unpersisted before returning (the fit is the only
    # consumer)
    data = df.select(*cols).na.drop().persist()

    beta = np.zeros(d)
    deviances: list[float] = []
    try:
        return _irls_loop(data, d, beta, deviances, max_iters, ridge, tol)
    finally:
        data.unpersist()


def _irls_loop(data, d, beta, deviances, max_iters, ridge, tol):
    for _ in range(max_iters):
        b = beta.copy()

        def _partials(batches, _b=b, _d=d):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.column_stack(
                    [np.ones(len(pdf))]
                    + [pdf[f"__x{i}"].to_numpy(np.float64)
                       for i in range(_d - 1)]
                )
                y = pdf["__y"].to_numpy(np.float64)
                eta = X @ _b
                p = 1.0 / (1.0 + np.exp(-eta))
                eps = 1e-12
                w = np.clip(p * (1.0 - p), eps, None)
                z = eta + (y - p) / w
                A = X.T @ (w[:, None] * X)
                v = X.T @ (w * z)
                dev = -2.0 * float(
                    np.sum(y * np.log(np.clip(p, eps, None))
                           + (1 - y) * np.log(np.clip(1 - p, eps, None)))
                )
                yield pd.DataFrame(
                    {
                        "a": [A.ravel().tolist()],
                        "v": [v.tolist()],
                        "dev": [dev],
                        "cnt": [float(len(pdf))],
                    }
                )

        reduced = (
            data.mapInPandas(
                _partials,
                schema="a array<double>, v array<double>, dev double, cnt double",
            )
            .select(
                F.posexplode(
                    F.concat(
                        "a", "v", F.array("dev"), F.array("cnt")
                    )
                ).alias("pos", "val")
            )
            .groupBy("pos")
            .agg(F.sum("val").alias("val"))
            .collect()  # d^2 + d + 2 rows — small by construction
        )
        flat = np.zeros(d * d + d + 2)
        for r in reduced:
            flat[r["pos"]] = r["val"]
        if flat[-1] < 1:
            raise ValueError("logreg_train_irls needs at least 1 row")
        A = flat[: d * d].reshape(d, d) + ridge * np.eye(d)
        v = flat[d * d : d * d + d]
        deviances.append(float(flat[d * d + d]))
        beta = np.linalg.solve(A, v)
        if float(np.max(np.abs(beta - b))) < tol:
            break
    return beta, deviances


def logreg_train_report(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    max_iters: int = 10,
    ridge: float = 1e-8,
) -> DataFrame:
    """Training report as a DataFrame: one row per coefficient
    ((feature, coef)) with '(intercept)' first, plus a '(deviance)'
    row carrying the final deviance.  Coefficients round to 6 places
    so the report is reproducible across partitionings."""
    spark = df.sparkSession
    beta, deviances = logreg_train_irls(
        df, feature_cols, label_col, max_iters=max_iters, ridge=ridge
    )
    rows = [("(intercept)", round(float(beta[0]), 6))] + [
        (c, round(float(beta[i + 1]), 6)) for i, c in enumerate(feature_cols)
    ] + [("(deviance)", round(deviances[-1], 6))]
    return spark.createDataFrame(rows, "feature string, coef double")
