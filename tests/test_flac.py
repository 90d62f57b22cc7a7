"""FLAC codec (operators/flac.py) + audio triage (multimodal sniff):
roundtrip across every subframe/residual branch, CRC/MD5 strictness,
per-format container sniffing, and the Spark-side feature path."""

from __future__ import annotations

import numpy as np
import pytest

from etl_tiki_webscraping_spark.operators.flac import (
    decode_flac,
    decode_flac_pcm,
    encode_flac,
)
from etl_tiki_webscraping_spark.operators.multimodal import (
    sniff_audio_container,
)

_RNG = np.random.default_rng(11)
NOISE = _RNG.integers(-32768, 32768, 1000).astype(np.int64)
RAMP = (np.arange(700) * 37 % 20000 - 10000).astype(np.int64)
TRI = np.abs(((np.arange(512) * 389) % 2048) - 1024) * 20 - 10240


def _roundtrip(pcm: np.ndarray, **kw) -> bytes:
    enc = encode_flac(pcm, **kw)
    dec = decode_flac_pcm(enc)
    assert dec is not None and (dec == pcm).all()
    return enc


@pytest.mark.parametrize(
    "pcm,kw",
    [
        (NOISE, {}),
        (RAMP, {}),
        (TRI, {}),
        (NOISE, {"subframe": "verbatim"}),
        (np.full(300, -1234, np.int64), {"subframe": "constant"}),
        (RAMP, {"subframe": "lpc1"}),
        (NOISE, {"fixed_order": 0}),
        (RAMP, {"fixed_order": 1}),
        (TRI, {"fixed_order": 2}),
        (TRI, {"partition_order": 2}),
        (NOISE, {"force_escape": True}),
        (TRI, {"force_escape": True, "partition_order": 1}),
        (NOISE[:777], {}),              # partial tail frame (8-bit code)
        (NOISE, {"blocksize": 512}),
        (np.array([5], np.int64), {}),
        (np.array([-32768, 32767, 0, -1], np.int64), {}),  # full range
    ],
    ids=[
        "noise", "ramp", "tri", "verbatim", "constant", "lpc1",
        "fixed0", "fixed1", "fixed2", "porder2", "escape",
        "escape-porder1", "odd-tail", "bs512", "single", "extremes",
    ],
)
def test_roundtrip_matrix(pcm, kw):
    _roundtrip(pcm, **kw)


def test_compression_actually_compresses():
    """The fixed-predictor + Rice path must beat raw PCM on smooth
    input — otherwise the 'real codec' claim is hollow."""
    enc = encode_flac(RAMP)
    assert len(enc) < RAMP.size * 2 * 0.45


def test_strictness():
    enc = encode_flac(TRI)
    assert decode_flac_pcm(None) is None
    assert decode_flac_pcm(b"") is None
    assert decode_flac_pcm(b"fLaC" + b"\x00" * 40) is None
    assert decode_flac_pcm(enc[:-3]) is None        # truncated
    assert decode_flac_pcm(enc + b"\x00") is None   # trailing garbage
    for off in (50, 60, len(enc) - 4):              # corrupt anywhere
        bad = bytearray(enc)
        bad[off] ^= 0x40
        assert decode_flac_pcm(bytes(bad)) is None, off
    # STREAMINFO md5 tamper: frames decode, signature must catch it
    bad = bytearray(enc)
    bad[30] ^= 0x01  # inside the 16-byte md5 field (4+4+18=26..41)
    assert decode_flac_pcm(bytes(bad)) is None


def test_float_contract_matches_wav_convention():
    enc = encode_flac(TRI)
    w = decode_flac(enc)
    assert w.dtype == np.float32
    assert np.allclose(w, TRI.astype(np.float32) / 32768.0)


def test_sniff_audio_container():
    from etl_tiki_webscraping_spark.operators.multimodal import (
        encode_wav_tone,
    )

    assert sniff_audio_container(encode_wav_tone(440)) == "wav"
    assert sniff_audio_container(encode_flac(TRI)) == "flac"
    assert sniff_audio_container(b"OggS" + b"\x00" * 30) == "ogg"
    assert sniff_audio_container(b"ID3\x03\x00" + b"\x00" * 30) == "mp3"
    assert sniff_audio_container(b"\xff\xfb\x90\x00" + b"\x00" * 30) == "mp3"
    assert sniff_audio_container(b"\xff\x1b\x90\x00") == "unknown"  # bad sync
    assert sniff_audio_container(b"\x00\x01\x02\x03") == "unknown"
    assert sniff_audio_container(None) == "unknown"
    assert sniff_audio_container(b"") == "unknown"
    # r14 validity bits (ADVICE r13): a bare FF Ex sync is not enough
    assert sniff_audio_container(b"\xff\xfe\x00\x00abcd") == "unknown"  # UTF-16LE BOM (version 1 reserved)
    assert sniff_audio_container(b"\xff\xf9\x90\x00") == "unknown"  # layer 0 reserved
    assert sniff_audio_container(b"\xff\xeb\x90\x00") == "unknown"  # version 1 reserved
    assert sniff_audio_container(b"\xff\xfb\xf0\x00") == "unknown"  # bitrate idx 15
    assert sniff_audio_container(b"\xff\xfb\x9c\x00") == "unknown"  # sample-rate idx 3


def test_flac_streaminfo_fixed_blocksize_fields():
    """STREAMINFO min/max blocksize both carry the stream blocksize
    (fixed-blocksize signal; the short FINAL frame does not demote the
    stream to variable-blocksize — ADVICE r13), and sub-16 blocksizes
    are rejected per spec."""
    enc = encode_flac(TRI, blocksize=256)  # 512 samples -> 2 frames
    # STREAMINFO body starts at byte 8 (4 magic + 4 block header)
    min_bs = int.from_bytes(enc[8:10], "big")
    max_bs = int.from_bytes(enc[10:12], "big")
    assert min_bs == max_bs == 256
    # short final frame: 700 % 256 = 188 — STREAMINFO still 256/256
    enc2 = encode_flac(RAMP, blocksize=256)
    assert int.from_bytes(enc2[8:10], "big") == 256
    assert int.from_bytes(enc2[10:12], "big") == 256
    assert decode_flac_pcm(enc2) is not None
    with pytest.raises(ValueError):
        encode_flac(TRI, blocksize=8)


def test_audio_decode_dispatch_routes_flac(spark):
    """FLAC blobs flow through the shared _decode_audio_impl dispatch:
    the time-domain feature kernel sees the REAL waveform, not the
    byte fake."""
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.multimodal import (
        extract_audio_features,
    )

    enc = encode_flac(TRI)
    df = spark.createDataFrame(
        [(1, bytearray(enc))],
        T.StructType([
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]),
    )
    row = extract_audio_features(df).collect()[0]
    assert row["n_samples"] == TRI.size
    exp_peak = float(np.abs(TRI.astype(np.float64) / 32768.0).max())
    assert row["peak"] == pytest.approx(exp_peak, rel=1e-6)


def test_pcm_features_quarantine_row(spark):
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.multimodal import (
        extract_audio_pcm_features,
    )

    good = encode_flac(TRI)
    bad = bytearray(good)
    bad[60] ^= 0x40
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bad), (3, bytearray(b"junkjunk"))],
        T.StructType([
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]),
    )
    rows = {r["media_id"]: r for r in extract_audio_pcm_features(df).collect()}
    assert rows[1]["n_samples"] == TRI.size
    assert rows[1]["sum_abs_units"] == int(np.abs(TRI).sum())
    assert rows[2]["n_samples"] is None  # corrupt FLAC quarantined
    assert rows[3]["n_samples"] is None


class TestStereo:
    """Stereo FLAC (round-13 second pass): all four channel
    assignments roundtrip exactly; side channels carry 17 bits."""

    L = _RNG.integers(-32768, 32768, 700).astype(np.int64)
    R = (L + _RNG.integers(-2000, 2000, 700)).clip(-32768, 32767).astype(
        np.int64
    )
    STEREO = np.stack([L, R], axis=1)

    @pytest.mark.parametrize(
        "mode", ["independent", "left_side", "right_side", "mid_side"]
    )
    def test_roundtrip_all_assignments(self, mode):
        from etl_tiki_webscraping_spark.operators.flac import (
            decode_flac_pcm,
            decode_flac_pcm_multi,
            encode_flac,
        )

        enc = encode_flac(self.STEREO, stereo_mode=mode)
        out = decode_flac_pcm_multi(enc)
        assert out is not None and (out == self.STEREO).all()
        # the 1-D contract returns the FIRST channel
        assert (decode_flac_pcm(enc) == self.L).all()

    def test_side_channel_extremes_need_17_bits(self):
        from etl_tiki_webscraping_spark.operators.flac import (
            decode_flac_pcm_multi,
            encode_flac,
        )

        ext = np.array(
            [[-32768, 32767], [32767, -32768], [0, 0], [-1, 1]],
            dtype=np.int64,
        )  # side = ±65535: overflows 16 bits, exercises bps+1
        for mode in ("left_side", "right_side", "mid_side"):
            out = decode_flac_pcm_multi(
                encode_flac(ext, stereo_mode=mode, subframe="verbatim")
            )
            assert out is not None and (out == ext).all(), mode

    def test_decorrelation_beats_independent_on_correlated_input(self):
        from etl_tiki_webscraping_spark.operators.flac import encode_flac

        indep = len(encode_flac(self.STEREO, stereo_mode="independent"))
        ls = len(encode_flac(self.STEREO, stereo_mode="left_side"))
        assert ls < indep  # the point of stereo decorrelation

    def test_stereo_strictness_and_md5(self):
        from etl_tiki_webscraping_spark.operators.flac import (
            decode_flac_pcm_multi,
            encode_flac,
        )

        enc = encode_flac(self.STEREO, stereo_mode="mid_side")
        assert decode_flac_pcm_multi(enc[:-2]) is None
        bad = bytearray(enc)
        bad[80] ^= 0x10
        assert decode_flac_pcm_multi(bytes(bad)) is None

    def test_audio_dispatch_takes_first_channel(self, spark):
        from pyspark.sql import types as T

        from etl_tiki_webscraping_spark.operators.flac import encode_flac
        from etl_tiki_webscraping_spark.operators.multimodal import (
            extract_audio_features,
        )

        enc = encode_flac(self.STEREO, stereo_mode="left_side")
        df = spark.createDataFrame(
            [(1, bytearray(enc))],
            T.StructType([
                T.StructField("media_id", T.LongType(), False),
                T.StructField("content", T.BinaryType(), False),
            ]),
        )
        row = extract_audio_features(df).collect()[0]
        assert row["n_samples"] == self.STEREO.shape[0]
