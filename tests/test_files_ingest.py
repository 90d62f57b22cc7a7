"""File ingest with corrupt-record quarantine (sources/files.py) and
partition evolution (sinks/upsert.py::repartition_table)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_tiki_webscraping_spark.sources.files import (
    parse_lines_quarantine,
    read_csv_quarantine,
    read_jsonl_quarantine,
)


class TestQuarantine:
    SCHEMA = "k bigint, name string, x double"

    def _write(self, tmp_path, lines, name="data.txt"):
        p = tmp_path / name
        p.write_text("\n".join(lines) + "\n")
        return str(p)

    def test_csv_good_and_bad_split(self, spark, tmp_path):
        path = self._write(
            tmp_path,
            [
                "1,alpha,1.5",
                "2,beta,2.5",
                "notanint,gamma,3.0",  # type mismatch -> quarantine
                "4,delta",  # short row -> quarantine
                "THIS IS NOT A ROW AT ALL",  # -> quarantine
                "5,epsilon,5.5",
            ],
        )
        good, bad = read_csv_quarantine(spark, path, self.SCHEMA)
        assert sorted(map(tuple, good.collect())) == [
            (1, "alpha", 1.5),
            (2, "beta", 2.5),
            (5, "epsilon", 5.5),
        ]
        # quarantine carries the RAW lines, byte-for-byte, for replay
        assert sorted(r["_raw"] for r in bad.collect()) == [
            "4,delta",
            "THIS IS NOT A ROW AT ALL",
            "notanint,gamma,3.0",
        ]

    def test_jsonl_good_and_bad_split(self, spark, tmp_path):
        path = self._write(
            tmp_path,
            [
                '{"k": 1, "name": "alpha", "x": 1.5}',
                "{truncated",
                '{"k": "notanint", "name": "b", "x": 2.0}',
                "plain text",
                '{"k": 3, "name": null, "x": null}',  # nulls are DATA, not corrupt
            ],
        )
        good, bad = read_jsonl_quarantine(spark, path, self.SCHEMA)
        assert sorted(map(tuple, good.collect())) == [
            (1, "alpha", 1.5),
            (3, None, None),
        ]
        assert bad.count() == 3

    def test_extra_json_fields_ignored_missing_nullfilled(self, spark, tmp_path):
        path = self._write(
            tmp_path,
            ['{"k": 1, "name": "a", "x": 1.0, "surprise": true}', '{"k": 2}'],
        )
        good, bad = read_jsonl_quarantine(spark, path, self.SCHEMA)
        assert bad.count() == 0
        assert sorted(map(tuple, good.collect())) == [(1, "a", 1.0), (2, None, None)]

    def test_csv_custom_separator_option(self, spark, tmp_path):
        path = self._write(tmp_path, ["1|a|1.0", "2|b|2.0"])
        good, bad = read_csv_quarantine(spark, path, self.SCHEMA, sep="|")
        assert good.count() == 2 and bad.count() == 0

    def test_bad_fmt_raises(self, spark):
        lines = spark.createDataFrame([("x",)], "value string")
        with pytest.raises(ValueError):
            parse_lines_quarantine(lines, self.SCHEMA, fmt="xml")


class TestPartitionEvolution:
    def test_evolve_then_upsert_prunes_new_layout(self, spark, sf_dir, tmp_path):
        from etl_tiki_webscraping_spark.sinks.upsert import (
            read_parquet_table,
            repartition_table,
            upsert_parquet,
        )

        orders = read_parquet_table(
            spark, os.path.join(sf_dir, "orders.parquet")
        ).select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("double").alias("price"),
            F.col("o_orderpriority").alias("prio"),
        )
        path = str(tmp_path / "t")
        upsert_parquet(
            spark, orders.filter(F.col("o_orderkey") % 3 == 0), path,
            ["o_orderkey"], keep_snapshots=5,
        )
        before = sorted(map(tuple, read_parquet_table(spark, path).collect()))
        v = repartition_table(spark, path, partition_by=["prio"], keep_snapshots=5)
        assert v == 2
        after = read_parquet_table(spark, path).select(
            "o_orderkey", "o_custkey", "price", "prio"
        )
        assert sorted(map(tuple, after.collect())) == before
        # the new layout is a real hive farm: prio dirs exist
        snap = os.path.join(path, "v00000002")
        assert any(e.startswith("prio=") for e in os.listdir(snap))
        # old layout stays time-travelable
        assert read_parquet_table(spark, path, version=1).count() == len(before)
        # a subsequent upsert touches ONLY its partitions (stable layout):
        batch = orders.filter(
            (F.col("o_orderkey") % 3 == 0) & (F.col("prio") == "1-URGENT")
        ).withColumn("price", F.col("price") + 1.0)
        upsert_parquet(
            spark, batch, path, ["o_orderkey"], partition_by=["prio"],
            stable_partitions=True, keep_snapshots=5,
        )
        v3 = os.path.join(path, "v00000003")
        # untouched partitions carry forward as references to the SAME
        # pool dirs v2 used; the touched one points at a fresh pool
        same = diff = 0
        for e in os.listdir(v3):
            if not e.startswith("prio="):
                continue
            t2 = os.path.realpath(os.path.join(path, "v00000002", e))
            t3 = os.path.realpath(os.path.join(v3, e))
            if t2 == t3:
                same += 1
            else:
                diff += 1
        assert diff == 1 and same >= 3

    def test_evolve_to_unpartitioned_and_bad_column(self, spark, sf_dir, tmp_path):
        from etl_tiki_webscraping_spark.sinks.upsert import (
            read_parquet_table,
            repartition_table,
            upsert_parquet,
        )

        orders = read_parquet_table(
            spark, os.path.join(sf_dir, "orders.parquet")
        ).select(
            "o_orderkey", F.col("o_orderpriority").alias("prio")
        ).filter(F.col("o_orderkey") % 5 == 0)
        path = str(tmp_path / "t")
        upsert_parquet(spark, orders, path, ["o_orderkey"], partition_by=["prio"])
        n = read_parquet_table(spark, path).count()
        repartition_table(spark, path, partition_by=None)
        assert read_parquet_table(spark, path).count() == n
        snap = os.path.join(path, "v00000002")
        assert not any(e.startswith("prio=") for e in os.listdir(snap))
        with pytest.raises(ValueError):
            repartition_table(spark, path, partition_by=["nope"])


class TestStreamingQuarantine:
    def test_stream_splits_good_and_quarantine(self, spark, sf_dir):
        from etl_tiki_webscraping_spark.plans.catalog import (
            QUERIES,
            _STREAM_QUARANTINE,
        )

        good = QUERIES["streaming_quarantine_ingest"].fn(spark, sf_dir)
        root = _STREAM_QUARANTINE[sf_dir]
        bad = spark.read.parquet(root + "/bad")
        assert sorted(r["_raw"] for r in bad.collect()) == [
            "1,2",
            "THIS IS NOT A ROW",
            "garbage,notanint,zz,1-URGENT",
        ]
        assert good.filter(F.col("o_orderkey") % 7 != 0).count() == 0


class TestMultilineCsv:
    """read_csv_multiline_quarantine: the tested escape hatch for the
    line-delimited reader's quoted-embedded-newline limitation
    (VERDICT r7 ask #5)."""

    SCHEMA = "k bigint, name string, x double"

    def test_quoted_embedded_newline_record_survives(self, spark, tmp_path):
        from etl_tiki_webscraping_spark.sources.files import (
            read_csv_multiline_quarantine,
            read_csv_quarantine,
        )

        p = tmp_path / "data.csv"
        p.write_text(
            '1,alpha,1.5\n'
            '2,"two\nlines",2.5\n'   # quoted newline: ONE logical record
            'notanint,gamma,3.0\n'   # type mismatch -> quarantine
            '4,delta,4.5\n'
        )
        good, bad = read_csv_multiline_quarantine(spark, str(p), self.SCHEMA)
        assert sorted(map(tuple, good.collect())) == [
            (1, "alpha", 1.5),
            (2, "two\nlines", 2.5),  # newline preserved inside the field
            (4, "delta", 4.5),
        ]
        assert [r["_raw"] for r in bad.collect()] == ["notanint,gamma,3.0"]
        # contrast: the line-delimited reader quarantines BOTH halves of
        # the quoted record — exactly the documented limitation
        lg, lb = read_csv_quarantine(spark, str(p), self.SCHEMA)
        assert lg.count() == 2
        assert sorted(r["_raw"] for r in lb.collect()) == [
            '2,"two', 'lines",2.5', "notanint,gamma,3.0",
        ]

    def test_options_pass_through(self, spark, tmp_path):
        from etl_tiki_webscraping_spark.sources.files import (
            read_csv_multiline_quarantine,
        )

        p = tmp_path / "data.csv"
        p.write_text("1|'pipe\nfield'|9.0\n")
        good, bad = read_csv_multiline_quarantine(
            spark, str(p), self.SCHEMA, sep="|", quote="'"
        )
        assert [tuple(r) for r in good.collect()] == [(1, "pipe\nfield", 9.0)]
        assert bad.count() == 0
