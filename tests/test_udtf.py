"""Python UDTF tier (operators/udtf.py, SURVEY §2.11): the Spark-4
table-function surface — window arithmetic, tail handling, empty-doc
behavior, and the three invocation forms probed working in this
container."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _chunks(spark, rows, chunk=4, stride=3):
    from etl_tiki_webscraping_spark.operators.udtf import sliding_chunks

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return sliding_chunks(
        spark, docs, chunk_tokens=chunk, stride=stride,
        view_name="udtf_test_src",
    )


def test_overlapping_windows_and_tail(spark):
    out = sorted(
        tuple(r)
        for r in _chunks(spark, [(1, "a b c d e f g h")]).collect()
    )
    # 8 tokens, chunk 4, stride 3: starts 0, 3, 6; last is a 2-token tail
    assert out == [
        (1, 0, 0, 4, "a b c d"),
        (1, 1, 3, 4, "d e f g"),
        (1, 2, 6, 2, "g h"),
    ]


def test_empty_and_null_docs_emit_nothing(spark):
    out = _chunks(spark, [(1, ""), (2, None), (3, "   "), (4, "x")]).collect()
    assert [tuple(r) for r in out] == [(4, 0, 0, 1, "x")]


def test_exact_multiple_has_no_empty_tail(spark):
    out = _chunks(spark, [(1, "a b c d e f")], chunk=3, stride=3).collect()
    assert sorted(r["chunk_idx"] for r in out) == [0, 1]
    assert all(r["n_tokens"] == 3 for r in out)


def test_bad_params_raise(spark):
    from etl_tiki_webscraping_spark.operators.udtf import sliding_chunk_udtf

    with pytest.raises(ValueError):
        sliding_chunk_udtf(0, 3)
    with pytest.raises(ValueError):
        sliding_chunk_udtf(4, 0)


def test_lateral_scalar_form_matches_table_form(spark):
    """The scalar-argument LATERAL invocation (the other documented
    UDTF form) produces the same rows as the TABLE-argument wrapper."""
    from etl_tiki_webscraping_spark.operators.udtf import (
        sliding_chunk_udtf,
        sliding_chunks,
    )
    from pyspark.sql.functions import udtf as _udtf

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y")], "doc_id long, text string"
    )
    table_form = sorted(
        tuple(r) for r in sliding_chunks(
            spark, docs, 3, 2, view_name="udtf_lat_src"
        ).collect()
    )

    chunker = sliding_chunk_udtf(3, 2)

    @_udtf(returnType="chunk_idx: int, start_tok: int, n_tokens: int, "
                      "chunk_text: string")
    class Scalar:
        def eval(self, text: str):
            for row in chunker.func().eval({"doc_id": 0, "text": text}):
                yield row[1:]

    spark.udtf.register("udtf_scalar_chunks", Scalar)
    docs.createOrReplaceTempView("udtf_scalar_src")
    lateral = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT doc_id, chunk_idx, start_tok, n_tokens, chunk_text "
            "FROM udtf_scalar_src, LATERAL udtf_scalar_chunks(text)"
        ).collect()
    )
    assert lateral == table_form


def test_mp3_frames_udtf_expansion_and_quarantine(spark):
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.audiometa import (
        encode_mp3_frames,
    )
    from etl_tiki_webscraping_spark.operators.udtf import mp3_frames

    blobs = spark.createDataFrame(
        [
            (1, bytearray(encode_mp3_frames([9, 5, 14]))),
            (2, bytearray(b"\xffjunk-not-mp3")),
        ],
        T.StructType([
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]),
    )
    rows = sorted(
        tuple(r) for r in mp3_frames(spark, blobs, "udtf_mp3_test").collect()
    )
    # frame sizes: 144000*kbps//44100 (+pad on odd frames)
    assert rows == [
        (1, 0, 128, 144000 * 128 // 44100),
        (1, 1, 64, 144000 * 64 // 44100 + 1),
        (1, 2, 320, 144000 * 320 // 44100),
        (2, -1, None, None),
    ], rows
