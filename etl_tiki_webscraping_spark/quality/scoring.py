"""Model-inference scoring operators: apply a TRAINED model to every
row as pure column arithmetic — the quality-classifier deployment
pattern for pretraining corpora (fastText/logreg-style filters a la
CCNet/LLaMA data pipelines), distinct from the heuristic
``functions.text.quality_score``.

The model is a plain dict of weights — small by construction — so it
rides the closure into every task (effectively a broadcast); scoring
is one narrow projection inside whole-stage codegen: no UDF, no
shuffle, no model server.  At 100 TB the cost is the scan.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sigmoid(z: Column) -> Column:
    """Numerically-stable logistic: computed on -|z| so ``exp`` never
    overflows (exp(-|z|) <= 1), then mirrored for positive z."""
    ez = F.exp(-F.abs(z))
    pos = F.lit(1.0) / (F.lit(1.0) + ez)
    return F.when(z >= 0, pos).otherwise(F.lit(1.0) - pos)


def linear_model_score(
    features: dict[str, Column],
    weights: dict[str, float],
    bias: float = 0.0,
) -> Column:
    """Logistic-regression score ``sigmoid(bias + sum_i w_i * x_i)``
    over named feature columns.  Raises on a weight without a matching
    feature (a silently-dropped model term is a wrong model).  Feature
    terms fold left in sorted-name order so the float sum is
    deterministic across plans and replayable by an oracle."""
    missing = set(weights) - set(features)
    if missing:
        raise ValueError(
            f"weights reference unknown features: {sorted(missing)}"
        )
    z: Column = F.lit(float(bias))
    for name in sorted(weights):
        z = z + F.lit(float(weights[name])) * features[name].cast("double")
    return sigmoid(z)


def score_and_band(
    df: DataFrame,
    score_col: Column,
    bands: list[float],
    out_score: str = "score",
    out_band: str = "band",
) -> DataFrame:
    """Attach the model score plus a quality band (index of the first
    threshold the score clears, descending bands list) — the
    keep/review/drop routing step after classifier scoring."""
    if bands != sorted(bands, reverse=True):
        raise ValueError("bands must be descending thresholds")
    band: Column = F.lit(len(bands))
    for i in range(len(bands) - 1, -1, -1):
        band = F.when(score_col >= F.lit(bands[i]), F.lit(i)).otherwise(band)
    return df.withColumn(out_score, score_col).withColumn(out_band, band)


def _sigmoid_py(z: float) -> float:
    """Python twin of :func:`sigmoid` for unit-gating the expression."""
    ez = math.exp(-abs(z))
    p = 1.0 / (1.0 + ez)
    return p if z >= 0 else 1.0 - p
