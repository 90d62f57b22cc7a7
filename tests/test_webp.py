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


# --------------------------------------------------------------------------
# round-14: lossy VP8 / extended VP8X header triage
# --------------------------------------------------------------------------


def test_lossy_header_triage_roundtrip():
    from etl_tiki_webscraping_spark.operators.webp import (
        encode_webp_lossy_stub,
        parse_webp_header,
        sniff_webp_variant,
    )

    for w, h, seed in ((1, 1, 0), (640, 480, 7), (16383, 16383, 3)):
        b = encode_webp_lossy_stub(w, h, seed=seed)
        hdr = parse_webp_header(b)
        assert hdr is not None
        assert (hdr["variant"], hdr["width"], hdr["height"]) == ("lossy", w, h)
        assert hdr["n_chunks"] == 1 and not hdr["has_alpha"]
        assert sniff_webp_variant(b) == "lossy"
    with pytest.raises(ValueError):
        encode_webp_lossy_stub(0, 5)
    with pytest.raises(ValueError):
        encode_webp_lossy_stub(5, 0x4000)


def test_lossy_header_strictness():
    from etl_tiki_webscraping_spark.operators.webp import (
        encode_webp_lossy_stub,
        parse_webp_header,
        sniff_webp_variant,
    )

    b = encode_webp_lossy_stub(320, 200, seed=5)
    # truncation anywhere -> None, but the fourcc sniff still routes it
    for cut in (1, 3, len(b) - 21):
        assert parse_webp_header(b[:-cut]) is None
        assert sniff_webp_variant(b[:-cut]) == "lossy"
    # bad start code
    bb = bytearray(b)
    bb[23] ^= 0x01
    assert parse_webp_header(bytes(bb)) is None
    # interframe bit set
    bb = bytearray(b)
    bb[20] |= 0x01
    assert parse_webp_header(bytes(bb)) is None
    # version > 3
    bb = bytearray(b)
    bb[20] = (bb[20] & ~0x0E) | (4 << 1)
    assert parse_webp_header(bytes(bb)) is None
    # RIFF size off by one
    bb = bytearray(b)
    bb[4] ^= 0x01
    assert parse_webp_header(bytes(bb)) is None
    # declared first partition overruns the chunk
    bb = bytearray(b)
    tag = bb[20] | (bb[21] << 8) | (bb[22] << 16)
    tag = (tag & 0x1F) | (0x7FFFF << 5)
    bb[20], bb[21], bb[22] = tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF
    assert parse_webp_header(bytes(bb)) is None


def test_extended_header_triage():
    from etl_tiki_webscraping_spark.operators.webp import (
        encode_webp_extended,
        encode_webp_lossless,
        encode_webp_lossy_stub,
        parse_webp_header,
        sniff_webp_variant,
    )

    inner = encode_webp_lossy_stub(101, 57, seed=9)  # odd first-part pad
    ext = encode_webp_extended(inner, alpha=True, exif=True, xmp=True, icc=True, seed=2)
    hdr = parse_webp_header(ext)
    assert hdr is not None and hdr["variant"] == "extended"
    assert (hdr["width"], hdr["height"]) == (101, 57)
    assert hdr["has_alpha"] and hdr["has_exif"] and hdr["has_xmp"] and hdr["has_icc"]
    assert hdr["n_chunks"] == 5
    assert sniff_webp_variant(ext) == "extended"
    # lossless inner + canvas override
    img = _RNG.integers(0, 256, (6, 11)).astype(np.uint8)
    ext2 = encode_webp_extended(encode_webp_lossless(img), canvas_w=400, canvas_h=300)
    hdr2 = parse_webp_header(ext2)
    assert hdr2 is not None and (hdr2["width"], hdr2["height"]) == (400, 300)
    # reserved flag bits must be zero
    bb = bytearray(ext)
    bb[20] |= 0x80
    assert parse_webp_header(bytes(bb)) is None
    # animation flag without an ANIM chunk rejects
    bb = bytearray(ext)
    bb[20] |= 0x02
    assert parse_webp_header(bytes(bb)) is None
    # corrupting the INNER image header rejects the whole file
    pos = ext.index(b"\x9d\x01\x2a")
    bb = bytearray(ext)
    bb[pos] ^= 0x01
    assert parse_webp_header(bytes(bb)) is None


def test_lossless_header_matches_decoder():
    from etl_tiki_webscraping_spark.operators.webp import (
        decode_webp_lossless,
        encode_webp_lossless,
        parse_webp_header,
    )

    for shape in ((8, 8), (13, 9), (5, 31)):
        img = _RNG.integers(0, 256, shape).astype(np.uint8)
        enc = encode_webp_lossless(img)
        hdr = parse_webp_header(enc)
        dec = decode_webp_lossless(enc)
        assert hdr is not None and dec is not None
        assert (hdr["height"], hdr["width"]) == dec.shape[:2]
        assert hdr["variant"] == "lossless"


def test_extract_webp_meta_spark(spark):
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.webp import (
        encode_webp_lossy_stub,
        extract_webp_meta,
    )

    good = encode_webp_lossy_stub(44, 33, seed=1)
    rows = [
        (1, bytearray(good)),
        (2, bytearray(good[:-2])),           # truncated -> quarantine
        (3, bytearray(b"\x00" * 30)),        # not RIFF -> unknown
    ]
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    out = {
        r["media_id"]: r
        for r in extract_webp_meta(spark.createDataFrame(rows, schema)).collect()
    }
    assert out[1]["variant"] == "lossy" and out[1]["width"] == 44
    assert out[1]["n_chunks"] == 1 and out[1]["size_bytes"] == len(good)
    assert out[2]["variant"] == "lossy" and out[2]["width"] is None
    assert out[3]["variant"] == "unknown" and out[3]["width"] is None
