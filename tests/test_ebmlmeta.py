"""WebM/Matroska EBML triage (operators/ebmlmeta.py): VINT parsing,
strict element tiling, both doc types, duration scale arithmetic,
truncation rejection, and the Spark-side path."""

from __future__ import annotations

from etl_tiki_webscraping_spark.operators.ebmlmeta import (
    _read_vint,
    encode_webm_stub,
    extract_webm_metadata,
    parse_webm,
    sniff_ebml,
)


def test_vint_widths():
    # 1-byte: 0x81 -> 1 (size), 2-byte: 0x40 0x7F -> 127
    assert _read_vint(b"\x81", 0, keep_marker=False) == (1, 1)
    assert _read_vint(b"\x40\x7f", 0, keep_marker=False) == (127, 2)
    assert _read_vint(b"\x1a\x45\xdf\xa3", 0, keep_marker=True) == (0x1A45DFA3, 4)
    # all-ones = unknown size: rejected for sizes, fine for ids
    assert _read_vint(b"\xff", 0, keep_marker=False) is None
    assert _read_vint(b"\x00", 0, keep_marker=False) is None
    assert _read_vint(b"\x40", 0, keep_marker=False) is None  # truncated


def test_video_audio_mux():
    b = encode_webm_stub(
        tracks=[
            {"type": "video", "codec": "V_VP8", "w": 1920, "h": 1080},
            {"type": "audio", "codec": "A_OPUS", "channels": 2},
        ],
        duration=60000, timestamp_scale=1_000_000, seed=1,
    )
    m = parse_webm(b)
    assert m["doc_type"] == "webm" and m["n_tracks"] == 2
    assert m["codecs"] == "V_VP8,A_OPUS"
    assert (m["video_w"], m["video_h"], m["audio_channels"]) == (1920, 1080, 2)
    assert m["duration_ms"] == 60000


def test_timestamp_scale_arithmetic():
    # scale 500000 ns/tick -> duration_ms = ticks / 2
    m = parse_webm(encode_webm_stub(duration=9000, timestamp_scale=500_000))
    assert m["duration_ms"] == 4500
    # scale 2000000 -> x2
    m = parse_webm(encode_webm_stub(duration=9000, timestamp_scale=2_000_000))
    assert m["duration_ms"] == 18000
    # no duration element -> None (a live stream's Info omits it)
    m = parse_webm(encode_webm_stub(duration=None))
    assert m["duration_ms"] is None


def test_strictness():
    b = encode_webm_stub(seed=2)
    for cut in (1, 5, len(b) - 10):
        assert parse_webm(b[:-cut]) is None
    assert sniff_ebml(b[:-5]) and not sniff_ebml(b"\x00" * 9)
    assert parse_webm(b"\x00" * 40) is None
    assert parse_webm(None) is None and parse_webm(b"") is None
    # a wrong DocType rejects
    bad = b.replace(b"webm", b"spam", 1)
    assert parse_webm(bad) is None
    # trailing garbage after the Segment rejects (tiling)
    assert parse_webm(b + b"x") is None


def test_spark_extract(spark):
    from pyspark.sql import types as T

    good = encode_webm_stub(
        tracks=[{"type": "audio", "codec": "A_VORBIS", "channels": 1}],
        doc_type="matroska", duration=1234, seed=3,
    )
    rows = [(1, bytearray(good)), (2, bytearray(good[:-6]))]
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    out = {
        r["media_id"]: r
        for r in extract_webm_metadata(spark.createDataFrame(rows, schema)).collect()
    }
    assert out[1]["doc_type"] == "matroska" and out[1]["codecs"] == "A_VORBIS"
    assert out[1]["duration_ms"] == 1234 and out[1]["audio_channels"] == 1
    assert out[2]["is_ebml"] and out[2]["doc_type"] is None
