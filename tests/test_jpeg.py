"""Baseline JPEG codec: encode/decode roundtrips, sampling modes,
restart markers, strict sniffing, and the mapInPandas dispatch."""

from __future__ import annotations

import numpy as np


def _grad(h: int, w: int) -> np.ndarray:
    gx, gy = np.meshgrid(np.linspace(0, 255, w), np.linspace(0, 255, h))
    return 0.5 * gx + 0.5 * gy


def test_zigzag_is_the_standard_permutation():
    from etl_tiki_webscraping_spark.operators.jpeg import ZIGZAG

    # ITU-T T.81 figure A.6 head and tail (natural row-major indices)
    assert ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert ZIGZAG[-6:].tolist() == [61, 54, 47, 55, 62, 63]
    assert sorted(ZIGZAG.tolist()) == list(range(64))


def test_block_constant_grayscale_roundtrips_exactly():
    """Levels on the DC quantization grid (even offset from 128 with
    the Annex K DC step 16): AC quantizes to zero, DC is integer-exact
    at every step — the catalog oracle's foundation."""
    from etl_tiki_webscraping_spark.operators.jpeg import (
        decode_jpeg_luma,
        encode_jpeg,
    )

    img = np.zeros((24, 16), dtype=np.float64)
    levels = [[78, 178], [128, 130], [254, 0]]
    for by in range(3):
        for bx in range(2):
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = levels[by][bx]
    out = decode_jpeg_luma(encode_jpeg(img))
    assert out is not None and out.dtype == np.float32
    assert np.array_equal(out, img.astype(np.float32))


def test_gradient_roundtrip_within_quantization_error():
    from etl_tiki_webscraping_spark.operators.jpeg import (
        decode_jpeg_luma,
        encode_jpeg,
    )

    img = _grad(24, 40)
    out = decode_jpeg_luma(encode_jpeg(img))
    assert out.shape == (24, 40)
    assert float(np.abs(out - img).mean()) < 3.0


def test_color_subsampling_modes_return_luma():
    """4:4:4 / 4:2:2 / 4:2:0: the decoder entropy-decodes the chroma
    blocks (the stream is interleaved) and returns the Y plane; for a
    block-constant color image the Y error is bounded by the DC
    quantization step (16/8 = 2)."""
    from etl_tiki_webscraping_spark.operators.jpeg import (
        decode_jpeg_luma,
        encode_jpeg,
    )

    rgb = np.zeros((16, 16, 3), dtype=np.float64)
    rgb[:8, :8] = [255, 0, 0]
    rgb[:8, 8:] = [0, 255, 0]
    rgb[8:, :8] = [0, 0, 255]
    rgb[8:, 8:] = [128, 128, 128]
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    for sub in ("444", "422", "420"):
        out = decode_jpeg_luma(encode_jpeg(rgb, subsampling=sub))
        assert out is not None and out.shape == (16, 16), sub
        assert float(np.abs(out - y).max()) <= 2.0, sub


def test_restart_interval_roundtrip():
    """DRI + RSTn markers: byte alignment and DC-pred reset on both
    sides, grayscale and 4:2:0."""
    from etl_tiki_webscraping_spark.operators.jpeg import (
        decode_jpeg_luma,
        encode_jpeg,
    )

    img = _grad(32, 48)
    out = decode_jpeg_luma(encode_jpeg(img, restart_interval=2))
    assert out is not None and float(np.abs(out - img).mean()) < 3.0
    rgb = np.stack([img, img[::-1], img[:, ::-1]], axis=-1)
    out2 = decode_jpeg_luma(
        encode_jpeg(rgb, subsampling="420", restart_interval=1)
    )
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    assert out2 is not None and float(np.abs(out2 - y).mean()) < 4.0


def test_odd_dimensions_pad_and_crop():
    from etl_tiki_webscraping_spark.operators.jpeg import (
        decode_jpeg_luma,
        encode_jpeg,
    )

    img = _grad(29, 37)
    out = decode_jpeg_luma(encode_jpeg(img))
    assert out.shape == (29, 37)
    assert float(np.abs(out - img).mean()) < 3.0
    # 4:2:0 with odd dims: chroma pads to its own grid
    rgb = np.stack([img] * 3, axis=-1)
    out2 = decode_jpeg_luma(encode_jpeg(rgb, subsampling="420"))
    assert out2.shape == (29, 37)


def test_strict_sniffing_and_truncation_reject():
    from etl_tiki_webscraping_spark.operators.jpeg import (
        decode_jpeg_luma,
        encode_jpeg,
    )

    assert decode_jpeg_luma(b"") is None
    assert decode_jpeg_luma(b"not a jpeg at all") is None
    assert decode_jpeg_luma(b"\xff\xd8\x00\x00") is None
    blob = encode_jpeg(_grad(16, 16))
    assert decode_jpeg_luma(blob) is not None
    # truncation anywhere (headers or entropy data) rejects wholesale,
    # including a missing EOI
    for cut in (10, len(blob) // 2, len(blob) - 1, len(blob) - 2):
        assert decode_jpeg_luma(blob[:cut]) is None, cut


def test_malformed_progressive_and_nonbaseline_reject():
    from etl_tiki_webscraping_spark.operators.jpeg import (
        decode_jpeg_luma,
        encode_jpeg,
    )

    blob = bytearray(encode_jpeg(_grad(16, 16)))
    sof = blob.find(b"\xff\xc0")
    assert sof > 0
    # SOF2 with a BASELINE scan header (interleaved Ss=0..Se=63) is
    # malformed progressive: a DC scan must have Se=0
    blob[sof + 1] = 0xC2
    assert decode_jpeg_luma(bytes(blob)) is None
    blob[sof + 1] = 0xC1  # extended sequential — out of scope
    assert decode_jpeg_luma(bytes(blob)) is None


def test_progressive_roundtrip_matches_baseline():
    """The 4-phase progressive scan script reconstructs EXACTLY the
    coefficients baseline codes (one successive-approximation step is
    lossless once the refinement scan lands), so the decoded planes
    must be bit-identical across framings."""
    import numpy as np

    from etl_tiki_webscraping_spark.operators.jpeg import (
        decode_jpeg_luma,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(11)
    for shape in [(16, 16), (24, 33), (8, 50)]:
        g = (rng.rand(*shape) * 255).round()
        pb = decode_jpeg_luma(encode_jpeg(g))
        pp = decode_jpeg_luma(encode_jpeg_progressive(g))
        assert pp is not None and np.array_equal(pb, pp), shape
    for sub in ("444", "422", "420"):
        rgb = (rng.rand(21, 18, 3) * 255).round()
        pb = decode_jpeg_luma(encode_jpeg(rgb, subsampling=sub))
        pp = decode_jpeg_luma(encode_jpeg_progressive(rgb, subsampling=sub))
        assert pp is not None and np.array_equal(pb, pp), sub


def test_progressive_block_constant_roundtrips_exactly():
    import numpy as np

    from etl_tiki_webscraping_spark.operators.jpeg import (
        decode_jpeg_luma,
        encode_jpeg_progressive,
    )

    img = np.empty((16, 16))
    for by in range(2):
        for bx in range(2):
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = 128 + 2 * (
                (7 + 3 * bx + 5 * by) % 50 - 25
            )
    dec = decode_jpeg_luma(encode_jpeg_progressive(img))
    assert dec is not None and np.array_equal(dec, img.astype(np.float32))


def test_progressive_eobrun_and_sparse_content():
    """Flat images with isolated speckles stress the cross-block EOB
    runs in both AC passes and the correction-bit buffering of the
    refinement scan."""
    import numpy as np

    from etl_tiki_webscraping_spark.operators.jpeg import (
        decode_jpeg_luma,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(3)
    for _ in range(4):
        h, w = rng.randint(16, 64), rng.randint(16, 64)
        g = np.full((h, w), 128.0)
        for _ in range(5):
            g[rng.randint(h), rng.randint(w)] = 255
        pb = decode_jpeg_luma(encode_jpeg(g))
        pp = decode_jpeg_luma(encode_jpeg_progressive(g))
        assert pp is not None and np.array_equal(pb, pp)


def test_progressive_truncation_rejects():
    import numpy as np

    from etl_tiki_webscraping_spark.operators.jpeg import (
        decode_jpeg_luma,
        encode_jpeg_progressive,
    )

    blob = encode_jpeg_progressive(_grad(16, 16))
    assert decode_jpeg_luma(blob) is not None
    for cut in (10, len(blob) // 3, len(blob) // 2, len(blob) - 1, len(blob) - 2):
        assert decode_jpeg_luma(blob[:cut]) is None, cut


def test_optimized_huffman_tables_are_canonical_and_complete():
    """The two-pass table builder: every emitted symbol gets a code,
    lengths fit 16 bits, and the all-ones max-length code is unused
    (the pseudo-symbol reservation)."""
    from etl_tiki_webscraping_spark.operators.jpeg import (
        _canonical_codes,
        _huffman_code_lengths,
    )

    freqs = {i: (i + 1) ** 2 for i in range(40)}
    lengths = _huffman_code_lengths(freqs)
    assert set(lengths) == set(freqs)
    assert max(lengths.values()) <= 16
    bits, values, codes = _canonical_codes(lengths)
    assert sum(bits) == len(freqs) and sorted(values) == sorted(freqs)
    # prefix-free: no code is a prefix of another
    as_bits = {
        format(c, f"0{ln}b") for c, ln in codes.values()
    }
    for a in as_bits:
        for b in as_bits:
            assert a == b or not b.startswith(a)
    # the all-ones code of the maximum assigned length is reserved
    maxlen = max(ln for _, ln in codes.values())
    assert ("1" * maxlen) not in as_bits


def test_jpeg_dispatch_through_mapinpandas(spark):
    """End to end through extract_image_features: a real JPEG routes
    to the baseline decoder (not the byte fake), junk falls back."""
    from etl_tiki_webscraping_spark.operators.jpeg import (
        decode_jpeg_luma,
        encode_jpeg,
    )
    from etl_tiki_webscraping_spark.operators.multimodal import (
        extract_image_features,
    )

    img = np.full((16, 16), 130.0)
    blob = encode_jpeg(img)
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(b"junk-bytes-here"))],
        "media_id long, content binary",
    )
    feats = {r["media_id"]: r for r in extract_image_features(df).collect()}
    assert (feats[1]["height"], feats[1]["width"]) == (16, 16)
    want = decode_jpeg_luma(blob)
    assert abs(feats[1]["mean_luma"] - float(want.mean())) < 1e-9
    assert feats[1]["mean_luma"] == 130.0  # grid-aligned level: exact
    assert (feats[2]["height"], feats[2]["width"]) == (8, 8)  # fake path


# --------------------------------------------------------------------------
# round-14: EXIF / JFIF metadata triage
# --------------------------------------------------------------------------


def test_jpeg_meta_plain_and_density():
    from etl_tiki_webscraping_spark.operators.jpeg import (
        encode_jpeg,
        parse_jpeg_meta,
    )

    img = (np.arange(140).reshape(10, 14) % 256).astype(np.uint8)
    m = parse_jpeg_meta(encode_jpeg(img))
    assert (m["width"], m["height"]) == (14, 10)
    assert m["progressive"] is False and m["n_components"] == 1
    assert not m["has_exif"] and m["orientation"] is None
    assert (m["density_unit"], m["x_density"], m["y_density"]) == (0, 1, 1)


def test_jpeg_meta_exif_both_byte_orders():
    from etl_tiki_webscraping_spark.operators.jpeg import (
        encode_exif_app1,
        encode_icc_app2,
        encode_jpeg,
        encode_jpeg_progressive,
        insert_app_segments,
        parse_jpeg_meta,
    )

    img = (np.arange(64).reshape(8, 8) * 3 % 256).astype(np.uint8)
    for bo in ("II", "MM"):
        for ori in (1, 5, 8):
            b = insert_app_segments(
                encode_jpeg(img), encode_exif_app1(ori, bo, extra_tags=2)
            )
            m = parse_jpeg_meta(b)
            assert m["orientation"] == ori and m["has_exif"], (bo, ori)
    prog = insert_app_segments(
        encode_jpeg_progressive(img),
        encode_exif_app1(3) + encode_icc_app2(24, seed=1),
    )
    m = parse_jpeg_meta(prog)
    assert m["progressive"] is True and m["has_icc"] and m["orientation"] == 3


def test_jpeg_meta_strictness():
    from etl_tiki_webscraping_spark.operators.jpeg import (
        encode_exif_app1,
        encode_jpeg,
        insert_app_segments,
        parse_jpeg_meta,
    )

    img = (np.arange(64).reshape(8, 8) % 256).astype(np.uint8)
    b = insert_app_segments(encode_jpeg(img), encode_exif_app1(2, "II"))
    # truncation before SOS rejects
    assert parse_jpeg_meta(b[:30]) is None
    # IFD entry count overrunning the segment rejects
    bb = bytearray(b)
    pos = bytes(bb).index(b"Exif\x00\x00") + 6 + 8
    bb[pos : pos + 2] = b"\x00\x40"  # II count 0x4000
    assert parse_jpeg_meta(bytes(bb)) is None
    # orientation value out of range rejects
    bb = bytearray(b)
    vpos = bytes(bb).index(b"\x12\x01\x03\x00") + 8
    bb[vpos : vpos + 2] = b"\x09\x00"
    assert parse_jpeg_meta(bytes(bb)) is None
    # bad TIFF byte-order magic rejects
    bb = bytearray(b)
    tpos = bytes(bb).index(b"Exif\x00\x00") + 6
    bb[tpos : tpos + 2] = b"XX"
    assert parse_jpeg_meta(bytes(bb)) is None
    # decoder-level sanity: EXIF splice never breaks pixel decode
    from etl_tiki_webscraping_spark.operators.jpeg import decode_jpeg_luma

    assert decode_jpeg_luma(b) is not None
    assert parse_jpeg_meta(None) is None and parse_jpeg_meta(b"") is None


def test_jpeg_meta_spark(spark):
    from pyspark.sql import types as T

    from etl_tiki_webscraping_spark.operators.jpeg import (
        encode_exif_app1,
        encode_jpeg,
        extract_jpeg_meta,
        insert_app_segments,
    )

    img = (np.arange(64).reshape(8, 8) % 256).astype(np.uint8)
    good = insert_app_segments(encode_jpeg(img), encode_exif_app1(7, "MM"))
    rows = [(1, bytearray(good)), (2, bytearray(good[:25]))]
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    out = {
        r["media_id"]: r
        for r in extract_jpeg_meta(spark.createDataFrame(rows, schema)).collect()
    }
    assert out[1]["orientation"] == 7 and out[1]["width"] == 8
    assert out[2]["width"] is None and out[2]["orientation"] is None
