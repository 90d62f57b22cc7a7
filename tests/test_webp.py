"""WebP-lossless (VP8L) codec (operators/webp.py): encode->decode
roundtrip across every decoder branch (plain literals, all 14
predictor modes, subtract-green, cross-color, palette incl. sub-byte
bundling, color cache, LZ77 left runs, and combinations), the
generated distance-map prefix vs the published table, strictness on
malformed/truncated input, and the Spark-side dispatch end to end."""

from __future__ import annotations

import numpy as np
import pytest

from etl_tiki_webscraping_spark.operators.webp import (
    _DIST_MAP,
    _prefix_decode,
    _prefix_encode,
    _BitReader,
    _BitWriter,
    decode_webp_lossless,
    decode_webp_luma,
    encode_webp_lossless,
)

_RNG = np.random.default_rng(7)
GRAY = _RNG.integers(0, 256, (16, 16)).astype(np.uint8)
RGB = _RNG.integers(0, 256, (13, 9, 3)).astype(np.uint8)
RGBA = _RNG.integers(0, 256, (8, 24, 4)).astype(np.uint8)
FLAT = np.zeros((10, 40, 3), np.uint8)
FLAT[:, :20] = 77
FLAT[:, 20:] = 200


def _rgba(img: np.ndarray) -> np.ndarray:
    a = np.asarray(img)
    if a.ndim == 2:
        a = np.stack([a] * 3, -1)
    if a.shape[2] == 3:
        a = np.concatenate(
            [a, np.full((*a.shape[:2], 1), 255, np.uint8)], 2
        )
    return a


def _roundtrip(img: np.ndarray, **kw) -> None:
    enc = encode_webp_lossless(img, **kw)
    dec = decode_webp_lossless(enc)
    assert dec is not None
    got = np.stack([dec[..., 1], dec[..., 2], dec[..., 3], dec[..., 0]], -1)
    assert (got == _rgba(img)).all()


def test_distance_map_matches_published_prefix():
    """The generated table must reproduce the documented ordering —
    pinned against the spec's first 24 entries (one full ring cycle of
    every tie-break rule)."""
    assert len(_DIST_MAP) == 120
    assert _DIST_MAP[:24] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    ]


def test_prefix_code_roundtrip_exhaustive():
    for v in list(range(1, 500)) + [4095, 4096]:
        code, extra, ebits = _prefix_encode(v)
        bw = _BitWriter()
        bw.write(extra, ebits)
        br = _BitReader(bw.getvalue() or b"\x00")
        assert _prefix_decode(br, code) == v, v


@pytest.mark.parametrize("img", [GRAY, RGB, RGBA], ids=["gray", "rgb", "rgba"])
def test_plain_literal_roundtrip(img):
    _roundtrip(img)


@pytest.mark.parametrize("mode", list(range(14)))
def test_all_predictor_modes_roundtrip(mode):
    _roundtrip(RGB, predictor_mode=mode)


def test_transforms_and_features_roundtrip():
    _roundtrip(GRAY, subtract_green=True)
    _roundtrip(RGB, subtract_green=True)
    _roundtrip(RGB, cache_bits=4)
    _roundtrip(FLAT, lz77_left_runs=True)
    _roundtrip(FLAT, lz77_left_runs=True, cache_bits=6)
    _roundtrip(RGB, cross_color=(34, 250, 17))
    _roundtrip(RGB, subtract_green=True, cross_color=(200, 5, 99))
    _roundtrip(RGB, subtract_green=True, predictor_mode=11)
    _roundtrip(FLAT, predictor_mode=13, cache_bits=5, lz77_left_runs=True)


def test_palette_roundtrip_bundled_and_plain():
    pal3 = (_RNG.integers(0, 3, (11, 23)) * 90).astype(np.uint8)   # 2-bit
    pal2 = (_RNG.integers(0, 2, (9, 17)) * 255).astype(np.uint8)   # 1-bit
    many = _RNG.integers(0, 200, (6, 7, 3)).astype(np.uint8)       # >16
    _roundtrip(pal3, palette=True)
    _roundtrip(pal2, palette=True)
    _roundtrip(many, palette=True)


def test_degenerate_sizes():
    _roundtrip(np.array([[123]], np.uint8))
    _roundtrip(np.arange(17, dtype=np.uint8).reshape(1, 17))
    _roundtrip(np.arange(9, dtype=np.uint8).reshape(9, 1), subtract_green=True)


def test_luma_contract_gray_exact_color_weighted():
    enc = encode_webp_lossless(GRAY, subtract_green=True)
    luma = decode_webp_luma(enc)
    assert luma is not None and luma.dtype == np.float32
    assert (luma == GRAY.astype(np.float32)).all()  # gray: EXACT channel
    enc_c = encode_webp_lossless(RGB)
    luma_c = decode_webp_luma(enc_c)
    r, g, b = (RGB[..., i].astype(np.float32) for i in range(3))
    exp = (
        np.float32(0.299) * r + np.float32(0.587) * g + np.float32(0.114) * b
    )
    assert np.allclose(luma_c, exp, atol=1e-3)


def test_strictness_rejects_malformed_and_truncated():
    enc = encode_webp_lossless(GRAY, subtract_green=True)
    assert decode_webp_lossless(None) is None
    assert decode_webp_lossless(b"") is None
    assert decode_webp_lossless(b"\x00" * 64) is None
    assert decode_webp_lossless(enc[:30]) is None          # truncated header
    assert decode_webp_lossless(enc[:-5]) is None          # truncated stream
    bad_sig = bytes(enc[:20]) + b"\x00" + bytes(enc[21:])  # not 0x2f
    assert decode_webp_lossless(bad_sig) is None
    # VP8 (lossy) fourcc must not route here
    lossy = enc[:12] + b"VP8 " + enc[16:]
    assert decode_webp_lossless(lossy) is None
    # version bits != 0 reject (flip the top bit of byte 24: the 3-bit
    # version field is the high bits of the 4th stream byte)
    tampered = bytearray(enc)
    tampered[24] |= 0x80
    assert decode_webp_lossless(bytes(tampered)) is None


def test_spark_dispatch_end_to_end(spark):
    """WebP blobs flow through the shared multimodal decode dispatch
    (mapInPandas, Arrow both ways) and produce exact gray luma — and a
    non-WebP RIFF (AVI fourcc) still falls through to the 8x8 fake."""
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.multimodal import (
        extract_image_features,
    )

    imgs = {i: ((i * 3 + np.arange(256).reshape(16, 16)) % 256).astype(np.uint8)
            for i in range(4)}
    rows = [
        (i, bytearray(encode_webp_lossless(img, subtract_green=True)))
        for i, img in imgs.items()
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]),
    )
    feats = {
        r["media_id"]: r
        for r in extract_image_features(df).collect()
    }
    for i, img in imgs.items():
        assert (feats[i]["width"], feats[i]["height"]) == (16, 16)
        assert feats[i]["mean_luma"] == pytest.approx(float(img.mean()))


def test_meta_huffman_groups_roundtrip():
    """meta_split writes TWO Huffman groups routed by a meta-Huffman
    image (the only reachable multi-group path) — roundtrip across
    shapes incl. the single-block-column degenerate case."""
    for shape in ((16, 16), (13, 9, 3), (24, 17), (8, 8), (7, 5)):
        img = _RNG.integers(0, 256, shape).astype(np.uint8)
        enc = encode_webp_lossless(img, meta_split=True)
        dec = decode_webp_lossless(enc)
        assert dec is not None, shape
        a = _rgba(img)
        got = np.stack(
            [dec[..., 1], dec[..., 2], dec[..., 3], dec[..., 0]], -1
        )
        assert (got == a).all(), shape
    with pytest.raises(ValueError):
        encode_webp_lossless(
            _RNG.integers(0, 256, (8, 8)).astype(np.uint8),
            meta_split=True, cache_bits=4,
        )
