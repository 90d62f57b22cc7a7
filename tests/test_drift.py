"""PSI drift monitor (quality/drift.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_tiki_webscraping_spark.quality.drift import psi_drift


def test_identical_distributions_have_zero_psi(spark):
    df = spark.createDataFrame(
        [("g", float(v % 50)) for v in range(500)], "grp string, v double"
    )
    got = psi_drift(df, df, ["grp"], "v", bin_width=10.0, n_bins=5).collect()[0]
    assert got.psi == 0.0
    assert got.n_baseline == got.n_current == 500


def test_shifted_distribution_flags_major_drift(spark):
    a = spark.createDataFrame([("g", float(v % 40)) for v in range(400)], "grp string, v double")
    b = spark.createDataFrame(
        [("g", 60.0 + float(v % 40)) for v in range(400)], "grp string, v double"
    )
    got = psi_drift(a, b, ["grp"], "v", bin_width=10.0, n_bins=10).collect()[0]
    assert got.psi > 0.25  # conventional 'major shift' threshold


def test_psi_groups_are_independent_and_nulls_excluded(spark):
    a = spark.createDataFrame(
        [("stable", 5.0), ("stable", 15.0), ("moving", 5.0), ("moving", None)],
        "grp string, v double",
    )
    b = spark.createDataFrame(
        [("stable", 5.0), ("stable", 15.0), ("moving", 95.0)],
        "grp string, v double",
    )
    got = {r.grp: r for r in psi_drift(a, b, ["grp"], "v", bin_width=10.0, n_bins=10).collect()}
    assert got["stable"].psi == 0.0
    assert got["moving"].psi > got["stable"].psi
    assert got["moving"].n_baseline == 1  # the NULL row never entered a bin
