"""Conformance cross-checks between the pure-Python VP8L codec
(operators/webp.py) and the system libwebp (operators/webp_native.py):
our encoder's bitstreams must decode bit-identically through the
reference implementation, and the reference encoder's bitstreams must
decode bit-identically through our decoder.  Plus real lossy-VP8
decode and its dispatch wiring.  Everything skips cleanly when the
shared library is absent."""

from __future__ import annotations

import numpy as np
import pytest

from etl_tiki_webscraping_spark.operators.webp import (
    decode_webp_lossless,
    encode_webp_lossless,
    parse_webp_header,
)
from etl_tiki_webscraping_spark.operators.webp_native import (
    native_available,
    webp_native_decode_rgba,
    webp_native_encode_lossless,
    webp_native_encode_lossy,
    webp_native_get_info,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="libwebp shared library not present"
)

_RNG = np.random.default_rng(14)


def _rgba_of_gray(img: np.ndarray) -> np.ndarray:
    return np.stack([img, img, img, np.full_like(img, 255)], axis=-1)


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"subtract_green": True},
        {"subtract_green": True, "predictor_mode": 2},
        {"subtract_green": True, "cache_bits": 6, "lz77_left_runs": True},
        {"subtract_green": True, "meta_split": True},
        {"palette": True},
    ],
)
def test_our_encoder_conformant_through_libwebp(kw):
    """Every encoder variant's bitstream decodes BIT-IDENTICALLY
    through the reference implementation — our writer emits
    spec-conformant VP8L, not merely self-consistent bytes."""
    if kw.get("palette"):
        img = (_RNG.integers(0, 16, (16, 16)) * 13 % 256).astype(np.uint8)
    else:
        img = _RNG.integers(0, 256, (16, 16)).astype(np.uint8)
    enc = encode_webp_lossless(img, **kw)
    px = webp_native_decode_rgba(enc)
    assert px is not None and px.shape == (16, 16, 4)
    for ch in range(3):
        assert (px[..., ch] == img).all(), (kw, ch)
    assert (px[..., 3] == 255).all()


@pytest.mark.parametrize("shape", [(8, 8), (13, 9), (31, 5), (24, 17)])
def test_libwebp_encoder_streams_decode_through_ours(shape):
    """The reference encoder's own VP8L output (its choice of
    transforms, code lengths, cache sizes) decodes bit-identically
    through the pure-Python decoder."""
    img = _RNG.integers(0, 256, shape).astype(np.uint8)
    enc = webp_native_encode_lossless(_rgba_of_gray(img))
    assert enc is not None
    hdr = parse_webp_header(enc)
    assert hdr is not None and (hdr["height"], hdr["width"]) == shape
    dec = decode_webp_lossless(enc)
    assert dec is not None, "our decoder rejected a libwebp stream"
    for ch in (1, 2, 3):  # [a, r, g, b] layout
        assert (dec[..., ch] == img).all()


def test_libwebp_color_stream_decodes_through_ours():
    img = _RNG.integers(0, 256, (12, 19, 3)).astype(np.uint8)
    rgba = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])
    enc = webp_native_encode_lossless(rgba)
    dec = decode_webp_lossless(enc)
    assert dec is not None
    assert (dec[..., 1] == img[..., 0]).all()
    assert (dec[..., 2] == img[..., 1]).all()
    assert (dec[..., 3] == img[..., 2]).all()


def test_lossy_decode_and_triage_agree():
    img = _RNG.integers(0, 256, (20, 33)).astype(np.uint8)
    lossy = webp_native_encode_lossy(_rgba_of_gray(img), quality=80.0)
    assert lossy is not None
    hdr = parse_webp_header(lossy)
    assert hdr is not None and hdr["variant"] == "lossy"
    assert (hdr["width"], hdr["height"]) == (33, 20)
    assert webp_native_get_info(lossy) == (33, 20)
    px = webp_native_decode_rgba(lossy)
    assert px is not None and px.shape == (20, 33, 4)
    # lossy but sane: mean abs error bounded at this quality
    err = np.abs(px[..., 1].astype(int) - img.astype(int)).mean()
    assert err < 16.0, err


def test_dispatch_routes_lossy_webp(spark):
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.multimodal import (
        extract_image_features,
    )

    img = (np.arange(256).reshape(16, 16) % 256).astype(np.uint8)
    lossy = webp_native_encode_lossy(_rgba_of_gray(img), quality=90.0)
    rows = [(1, bytearray(lossy))]
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    out = extract_image_features(spark.createDataFrame(rows, schema)).collect()
    assert out[0]["width"] == 16 and out[0]["height"] == 16


def test_garbage_and_truncation_return_none():
    assert webp_native_decode_rgba(b"\x00" * 64) is None
    assert webp_native_get_info(b"junk") is None
    img = _RNG.integers(0, 256, (8, 8)).astype(np.uint8)
    lossy = webp_native_encode_lossy(_rgba_of_gray(img))
    assert webp_native_decode_rgba(lossy[: len(lossy) // 2]) is None
