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
            # identless junk payload routes to the 'other' codec class
            "codec": "other", "channels": None, "sample_rate": None,
            "duration_ms": None,  # no codec -> no granule semantics
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


# --------------------------------------------------------------------------
# round-14: Ogg identification headers (Vorbis / Opus / Theora routing)
# --------------------------------------------------------------------------


class TestOggIdent:
    def test_vorbis_ident_roundtrip(self):
        from etl_tiki_webscraping_spark.operators.audiometa import (
            encode_ogg_pages,
            encode_vorbis_ident,
            parse_ogg_ident,
            parse_ogg_stream,
        )

        ident = encode_vorbis_ident(2, 44100, 160_000)
        p = parse_ogg_ident(ident)
        assert p == {
            "codec": "vorbis", "channels": 2, "sample_rate": 44100,
            "bitrate_nominal": 160_000, "pre_skip": None,
        }
        stream = encode_ogg_pages(4, serial=7, final_granule=1000, ident=ident)
        o = parse_ogg_stream(stream)
        assert o is not None and o["codec"] == "vorbis"
        assert o["channels"] == 2 and o["sample_rate"] == 44100
        assert o["n_pages"] == 4 and o["last_granule"] == 1000

    def test_opus_head_roundtrip(self):
        from etl_tiki_webscraping_spark.operators.audiometa import (
            encode_ogg_pages,
            encode_opus_head,
            parse_ogg_ident,
            parse_ogg_stream,
        )

        ident = encode_opus_head(1, 48000, pre_skip=312)
        p = parse_ogg_ident(ident)
        assert p["codec"] == "opus" and p["channels"] == 1
        assert p["sample_rate"] == 48000 and p["pre_skip"] == 312
        o = parse_ogg_stream(
            encode_ogg_pages(3, serial=9, final_granule=5, ident=ident)
        )
        assert o is not None and o["codec"] == "opus" and o["channels"] == 1

    def test_theora_and_other_routing(self):
        from etl_tiki_webscraping_spark.operators.audiometa import (
            encode_ogg_pages,
            parse_ogg_ident,
            parse_ogg_stream,
        )

        assert parse_ogg_ident(b"\x80theora" + b"\x00" * 20)["codec"] == "theora"
        assert parse_ogg_ident(b"junkpacket")["codec"] == "other"
        o = parse_ogg_stream(
            encode_ogg_pages(3, serial=1, final_granule=2,
                             ident=b"\x80theora" + b"\x00" * 20)
        )
        assert o is not None and o["codec"] == "theora"
        assert o["channels"] is None and o["sample_rate"] is None
        # identless junk pages -> 'other'
        o2 = parse_ogg_stream(encode_ogg_pages(3, serial=1, final_granule=2))
        assert o2 is not None and o2["codec"] == "other"

    def test_ident_strictness(self):
        from etl_tiki_webscraping_spark.operators.audiometa import (
            encode_opus_head,
            encode_vorbis_ident,
            parse_ogg_ident,
        )

        v = bytearray(encode_vorbis_ident(2, 44100))
        v[7] = 1  # version != 0
        assert parse_ogg_ident(bytes(v)) is None
        v = bytearray(encode_vorbis_ident(2, 44100))
        v[-1] = 0  # framing bit must be 1
        assert parse_ogg_ident(bytes(v)) is None
        assert parse_ogg_ident(encode_vorbis_ident(2, 44100)[:-2]) is None
        o = bytearray(encode_opus_head(2, 48000))
        o[8] = 16  # incompatible major version
        assert parse_ogg_ident(bytes(o)) is None
        o = bytearray(encode_opus_head(2, 48000))
        o[9] = 3  # mapping family 0 caps channels at 2
        assert parse_ogg_ident(bytes(o)) is None
        assert parse_ogg_ident(encode_opus_head(1, 48000)[:18]) is None

    def test_multipage_ident_lacing(self):
        # an ident spanning multiple 255-lacing segments still parses
        from etl_tiki_webscraping_spark.operators.audiometa import (
            encode_ogg_pages,
            parse_ogg_stream,
        )

        big = b"\x80theora" + b"\x01" * 600  # 3 lacing segments
        o = parse_ogg_stream(
            encode_ogg_pages(2, serial=4, final_granule=1, ident=big)
        )
        assert o is not None and o["codec"] == "theora"

    def test_granule_duration(self):
        from etl_tiki_webscraping_spark.operators.audiometa import (
            encode_ogg_pages,
            encode_opus_head,
            encode_vorbis_ident,
            parse_ogg_stream,
        )

        # vorbis: granule counts PCM samples at the declared rate
        o = parse_ogg_stream(encode_ogg_pages(
            3, serial=1, final_granule=44100 * 7 + 123,
            ident=encode_vorbis_ident(2, 44100),
        ))
        assert o["duration_ms"] == (44100 * 7 + 123) * 1000 // 44100
        # opus: always 48 kHz, pre-skip subtracted (RFC 7845 §4)
        o = parse_ogg_stream(encode_ogg_pages(
            3, serial=1, final_granule=48000 * 2 + 312,
            ident=encode_opus_head(1, 48000, pre_skip=312),
        ))
        assert o["duration_ms"] == 2000
        # unknown codec: no duration claim
        o = parse_ogg_stream(encode_ogg_pages(3, serial=1, final_granule=999))
        assert o["duration_ms"] is None


class TestId3Frames:
    def test_both_versions_and_encodings(self):
        from etl_tiki_webscraping_spark.operators.audiometa import (
            encode_id3v2_tag,
            parse_id3v2_frames,
        )

        for v in (3, 4):
            for utf8 in (False, True):
                t = encode_id3v2_tag(
                    v, "Song", "Band", "LP", padding=5, utf8=utf8
                )
                m = parse_id3v2_frames(t)
                assert m == {
                    "version": v, "title": "Song", "artist": "Band",
                    "album": "LP", "n_frames": 3,
                }, (v, utf8)
        # partial tags keep missing fields NULL
        m = parse_id3v2_frames(encode_id3v2_tag(3, title="Only"))
        assert m["title"] == "Only" and m["artist"] is None
        assert m["n_frames"] == 1

    def test_strictness(self):
        from etl_tiki_webscraping_spark.operators.audiometa import (
            encode_id3v2_tag,
            parse_id3v2_frames,
        )

        t = encode_id3v2_tag(4, "A", "B", "C")
        assert parse_id3v2_frames(t[:-2]) is None
        assert parse_id3v2_frames(b"ID3\x05\x00\x00\x00\x00\x00\x00") is None
        assert parse_id3v2_frames(b"notatag") is None
        # v2.4 frame size with a high bit set (non-syncsafe) rejects
        bad = bytearray(t)
        bad[14] = 0xFF
        assert parse_id3v2_frames(bytes(bad)) is None
        # nonzero bytes inside the padding region reject
        p = bytearray(encode_id3v2_tag(3, "A", padding=4))
        p[-2] = 0x41
        assert parse_id3v2_frames(bytes(p)) is None
        # utf-16 text encoding is strictly out of scope
        u16 = bytearray(encode_id3v2_tag(3, "A"))
        u16[20] = 0x01  # encoding byte of the TIT2 body
        assert parse_id3v2_frames(bytes(u16)) is None

    def test_tag_plus_stream_extract(self, spark):
        from pyspark.sql import types as T

        from etl_tiki_webscraping_spark.operators.audiometa import (
            encode_id3v2_tag,
            extract_mp3_id3_tags,
        )

        tag = encode_id3v2_tag(3, "T1", "A1", "L1", padding=2)
        blob = tag + encode_mp3_frames([9] * 5)
        rows = [(1, bytearray(blob)), (2, bytearray(tag[:-1]))]
        schema = T.StructType([
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ])
        out = {
            r["media_id"]: r
            for r in extract_mp3_id3_tags(
                spark.createDataFrame(rows, schema)
            ).collect()
        }
        assert out[1]["title"] == "T1" and out[1]["n_mp3_frames"] == 5
        assert out[2]["title"] is None and out[2]["id3_version"] is None
