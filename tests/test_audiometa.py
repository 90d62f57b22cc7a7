"""Compressed-audio stream-metadata parsers (operators/audiometa.py):
MP3 frame walks, Ogg page walks with verified CRCs, strictness, and
the Spark-side triage path."""

from __future__ import annotations

import numpy as np
import pytest

from etl_tiki_webscraping_spark.operators.audiometa import (
    encode_mp3_frames,
    encode_ogg_pages,
    parse_id3v2_size,
    parse_mp3_stream,
    parse_ogg_stream,
)


class TestMp3:
    def test_cbr_walk(self):
        m = parse_mp3_stream(encode_mp3_frames([9] * 12))
        assert m == {
            "n_frames": 12, "sample_rate": 44100,
            "bitrate_kbps_min": 128, "bitrate_kbps_max": 128,
            "duration_ms": 12 * 1152 * 1000 // 44100, "has_id3": False,
        }

    def test_vbr_with_id3(self):
        m = parse_mp3_stream(
            encode_mp3_frames([5, 10] * 7, sr_idx=1, id3_size=77, seed=3)
        )
        assert m["n_frames"] == 14 and m["sample_rate"] == 48000
        assert m["has_id3"]
        assert (m["bitrate_kbps_min"], m["bitrate_kbps_max"]) == (64, 160)
        assert m["duration_ms"] == 14 * 1152 * 1000 // 48000

    @pytest.mark.parametrize("sr_idx,rate", [(0, 44100), (1, 48000), (2, 32000)])
    def test_all_mpeg1_rates(self, sr_idx, rate):
        m = parse_mp3_stream(encode_mp3_frames([14] * 3, sr_idx=sr_idx))
        assert m["sample_rate"] == rate

    def test_strictness(self):
        enc = encode_mp3_frames([9] * 3)
        assert parse_mp3_stream(None) is None
        assert parse_mp3_stream(b"") is None
        assert parse_mp3_stream(enc[:-3]) is None       # truncated
        assert parse_mp3_stream(enc + b"\x00") is None  # trailing bytes
        bad = bytearray(enc)
        bad[0] ^= 0x01  # break the sync word
        assert parse_mp3_stream(bytes(bad)) is None
        # malformed syncsafe ID3 size
        assert parse_id3v2_size(b"ID3\x04\x00\x00\x80\x00\x00\x00xx") == -1

    def test_every_bitrate_index(self):
        for idx in range(1, 15):
            m = parse_mp3_stream(encode_mp3_frames([idx] * 2))
            assert m is not None and m["bitrate_kbps_min"] == \
                m["bitrate_kbps_max"]


class TestOgg:
    def test_page_walk_with_crc(self):
        o = parse_ogg_stream(
            encode_ogg_pages(5, serial=777, final_granule=123456, seed=2)
        )
        assert o == {
            "n_pages": 5, "serial": 777, "last_granule": 123456,
            "payload_bytes": 1000, "bos": True, "eos": True,
        }

    def test_multi_segment_lacing(self):
        o = parse_ogg_stream(
            encode_ogg_pages(2, serial=1, final_granule=9, page_payload=700)
        )
        assert o["payload_bytes"] == 1400

    def test_strictness(self):
        enc = encode_ogg_pages(3, serial=4, final_granule=1)
        assert parse_ogg_stream(enc[:-2]) is None       # truncated
        assert parse_ogg_stream(enc + b"x") is None     # trailing bytes
        bad = bytearray(enc)
        bad[40] ^= 0x01  # payload flip: page CRC must catch it
        assert parse_ogg_stream(bytes(bad)) is None
        # a stream missing EOS (drop the last page) rejects
        first_two_len = len(encode_ogg_pages(2, serial=4, final_granule=1))
        # rebuild: two BOS/mid pages only (no EOS) is not expressible
        # via the writer, so tamper the header-type byte instead
        solo = bytearray(encode_ogg_pages(1, serial=4, final_granule=1))
        solo[5] &= ~0x04  # clear EOS
        # CRC now mismatches too — recompute via writer internals
        from etl_tiki_webscraping_spark.operators.audiometa import _ogg_crc
        import struct as _s
        solo[22:26] = b"\x00\x00\x00\x00"
        solo[22:26] = _s.pack("<I", _ogg_crc(bytes(solo)))
        assert parse_ogg_stream(bytes(solo)) is None
        assert first_two_len > 0


def test_spark_triage_path(spark):
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.audiometa import (
        extract_audio_stream_metadata,
    )

    rows = [
        (1, bytearray(encode_mp3_frames([9] * 4))),
        (2, bytearray(encode_ogg_pages(2, serial=5, final_granule=99))),
        (3, bytearray(encode_mp3_frames([9] * 4)[:-2])),  # truncated mp3
        (4, bytearray(b"\x00junk")),
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]),
    )
    got = {r["media_id"]: r for r in extract_audio_stream_metadata(df).collect()}
    assert got[1]["container"] == "mp3" and got[1]["n_units"] == 4
    assert got[1]["duration_ms"] == 4 * 1152 * 1000 // 44100
    assert got[2]["container"] == "ogg" and got[2]["last_granule"] == 99
    assert got[3]["container"] == "mp3" and got[3]["n_units"] is None
    assert got[4]["container"] == "unknown" and got[4]["n_units"] is None
