"""MP4 / ISO-BMFF header triage (operators/mp4meta.py): strict box
tiling, both mvhd versions, multi-track codec extraction, truncation
rejection, and the Spark-side mapInPandas path."""

from __future__ import annotations

import struct

import pytest

from etl_tiki_webscraping_spark.operators.mp4meta import (
    encode_mp4_stub,
    extract_mp4_metadata,
    parse_mp4,
    sniff_mp4,
)


def test_single_track_parse():
    b = encode_mp4_stub(
        brand="isom", timescale=600, duration=1205,
        tracks=[("avc1", "vide", 48)], seed=1,
    )
    m = parse_mp4(b)
    assert m == {
        "brand": "isom", "timescale": 600, "duration": 1205,
        "duration_ms": 1205 * 1000 // 600, "n_tracks": 1,
        "codecs": "avc1", "total_samples": 48, "has_mdat": True,
    }
    assert sniff_mp4(b)


def test_multi_track_and_v1_mvhd():
    b = encode_mp4_stub(
        brand="mp42", timescale=90000, duration=(1 << 33) + 7,
        tracks=[("hvc1", "vide", 240), ("opus", "soun", 431)],
        mvhd_version=1, seed=2,
    )
    m = parse_mp4(b)
    assert m["duration"] == (1 << 33) + 7  # 64-bit duration survives
    assert m["n_tracks"] == 2 and m["codecs"] == "hvc1,opus"
    assert m["total_samples"] == 671
    assert m["duration_ms"] == ((1 << 33) + 7) * 1000 // 90000


def test_strictness():
    b = encode_mp4_stub(seed=3)
    # any truncation -> None; ftyp sniff still routes the head
    for cut in (1, 7, len(b) - 20):
        assert parse_mp4(b[:-cut]) is None
    assert sniff_mp4(b[:-7])
    # ftyp must be first: swap in a free box at the front
    free = struct.pack(">I", 16) + b"free" + b"\x00" * 8
    assert parse_mp4(free + b) is None
    # box size < 8 anywhere rejects
    bb = bytearray(b)
    bb[0:4] = struct.pack(">I", 4)
    assert parse_mp4(bytes(bb)) is None
    # an mvhd with an unsupported version rejects
    bb = bytearray(b)
    pos = bytes(bb).index(b"mvhd") + 4
    bb[pos] = 3
    assert parse_mp4(bytes(bb)) is None
    # zero timescale rejects
    bb = bytearray(b)
    pos = bytes(bb).index(b"mvhd") + 4 + 12
    bb[pos : pos + 4] = struct.pack(">I", 0)
    assert parse_mp4(bytes(bb)) is None
    # stsd entry count lying about its entries rejects
    bb = bytearray(b)
    pos = bytes(bb).index(b"stsd") + 4 + 4
    bb[pos : pos + 4] = struct.pack(">I", 2)
    assert parse_mp4(bytes(bb)) is None
    assert parse_mp4(None) is None
    assert parse_mp4(b"") is None
    assert not sniff_mp4(b"\x00" * 40)


def test_spark_extract(spark):
    from pyspark.sql import types as T

    good = encode_mp4_stub(
        brand="M4A ", timescale=44100, duration=44100 * 3,
        tracks=[("mp4a", "soun", 700)], seed=4,
    )
    rows = [
        (1, bytearray(good)),
        (2, bytearray(good[:-9])),     # truncated -> quarantine
        (3, bytearray(b"\xff" * 32)),  # not MP4 at all
    ]
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    out = {
        r["media_id"]: r
        for r in extract_mp4_metadata(spark.createDataFrame(rows, schema)).collect()
    }
    assert out[1]["brand"] == "M4A " and out[1]["duration_ms"] == 3000
    assert out[1]["codecs"] == "mp4a" and out[1]["total_samples"] == 700
    assert out[2]["is_mp4"] and out[2]["brand"] is None
    assert not out[3]["is_mp4"] and out[3]["brand"] is None


# --------------------------------------------------------------------------
# round-14 second wave: AVIF / HEIC (the meta branch)
# --------------------------------------------------------------------------


def test_avif_parse():
    from etl_tiki_webscraping_spark.operators.mp4meta import (
        encode_avif_stub,
        parse_avif,
    )

    m = parse_avif(encode_avif_stub("avif", 1024, 768, n_items=2, seed=1))
    assert m == {
        "brand": "avif", "family": "avif", "width": 1024, "height": 768,
        "n_items": 2, "primary_item": 1,
    }
    m = parse_avif(encode_avif_stub("heic", 4032, 3024))
    assert m["family"] == "heic" and (m["width"], m["height"]) == (4032, 3024)


def test_avif_strictness():
    from etl_tiki_webscraping_spark.operators.mp4meta import (
        encode_avif_stub,
        parse_avif,
    )

    b = encode_avif_stub("avif", 640, 480, seed=2)
    for cut in (1, 6, len(b) - 20):
        assert parse_avif(b[:-cut]) is None
    # a video brand routes to parse_mp4's domain, not this one
    assert parse_avif(encode_mp4_stub(seed=3)) is None
    # a non-'pict' handler rejects
    bad = b.replace(b"pict", b"vide", 1)
    assert parse_avif(bad) is None
    # zero dimensions reject
    import struct as _s

    bb = bytearray(b)
    pos = bytes(bb).index(b"ispe") + 4 + 4
    bb[pos : pos + 4] = _s.pack(">I", 0)
    assert parse_avif(bytes(bb)) is None
    assert parse_avif(None) is None and parse_avif(b"") is None


def test_avif_spark(spark):
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.mp4meta import (
        encode_avif_stub,
        extract_avif_metadata,
    )

    good = encode_avif_stub("avif", 320, 200, seed=4)
    rows = [(1, bytearray(good)), (2, bytearray(good[:-7]))]
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    out = {
        r["media_id"]: r
        for r in extract_avif_metadata(spark.createDataFrame(rows, schema)).collect()
    }
    assert out[1]["family"] == "avif" and out[1]["width"] == 320
    assert out[2]["is_bmff"] and out[2]["family"] is None
