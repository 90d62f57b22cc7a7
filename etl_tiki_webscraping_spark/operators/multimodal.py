"""Multimodal column plumbing (BASELINE.json north star).

Pattern: media travels as an opaque ``binary`` column plus a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched pandas iterators over ``mapInPandas`` so each task
streams batches without materializing a partition of blobs in memory.

No codec LIBRARY ships in this container, but the dominant formats
decode for real with the stdlib alone: 8-bit PNG (zlib inflate +
scanline unfilter), uncompressed 24-bit BMP (struct + numpy), and
16-bit PCM WAV (``wave``).  Anything else falls back to clearly-marked
deterministic fakes behind ``_decode_image_impl`` /
``_decode_audio_impl``; swapping in Pillow/torchcodec changes only
those two private functions.  The Spark-side contract (schemas, batch
shapes, partitioning) is real and tested.

Scale notes: blobs make row-group sizing the bottleneck — keep media
tables partitioned by a content-size bucket, set
``spark.sql.files.maxPartitionBytes`` low enough that a task's batch of
blobs fits the executor, and always project metadata-only when the
query doesn't touch bytes (columnar parquet makes that free).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # 'image' | 'audio' | 'video'
        T.StructField("format", T.StringType()),      # 'jpeg', 'wav', ...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_bmp(content: bytes) -> "np.ndarray | None":
    """REAL decoder for uncompressed 24-bit BMP (pure struct + numpy,
    no codec libraries): returns the luma plane as float32 (h, w), or
    None when the bytes are not such a BMP.  Sniffing is strict — magic,
    header sizes, bpp/compression fields, and exact pixel-array length
    must all agree — so arbitrary binary never mis-routes here."""
    import struct

    if content is None or len(content) < 54 or content[:2] != b"BM":
        return None
    try:
        pixel_off = struct.unpack_from("<I", content, 10)[0]
        hdr_size, w, h = struct.unpack_from("<Iii", content, 14)
        planes, bpp = struct.unpack_from("<HH", content, 26)
        comp = struct.unpack_from("<I", content, 30)[0]
    except struct.error:
        return None
    if hdr_size < 40 or planes != 1 or bpp != 24 or comp != 0:
        return None
    flip, h = h > 0, abs(h)
    if w <= 0 or h == 0 or w > 1 << 16 or h > 1 << 16:
        return None
    stride = (w * 3 + 3) & ~3
    if pixel_off < 54 or len(content) < pixel_off + stride * h:
        return None
    rows = np.frombuffer(content, dtype=np.uint8, count=stride * h, offset=pixel_off)
    bgr = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3).astype(np.float32)
    if flip:
        bgr = bgr[::-1]
    return 0.114 * bgr[..., 0] + 0.587 * bgr[..., 1] + 0.299 * bgr[..., 2]


def _decode_png(content: bytes) -> "np.ndarray | None":
    """REAL decoder for 8-bit-depth non-interlaced PNG (stdlib ``zlib``
    + numpy, no codec libraries): gray, gray+alpha, RGB, and RGBA color
    types; all five scanline filters (None/Sub/Up/Average/Paeth).
    Returns the luma plane as float32 (h, w) — same contract as
    :func:`_decode_bmp` — or None when the bytes are not such a PNG.
    Sniffing is strict (signature, IHDR fields, exact inflated length)
    so arbitrary binary never mis-routes here.

    Filters None/Up reconstruct vectorized; Sub/Average/Paeth carry a
    per-byte serial dependency along the scanline, so those rows
    reconstruct in a Python loop — fine for thumbnail-scale fixtures;
    a production deployment swaps in a codec library at
    :func:`_decode_image_impl` and none of this runs."""
    import struct
    import zlib

    sig = b"\x89PNG\r\n\x1a\n"
    if content is None or len(content) < len(sig) + 25 or not content.startswith(sig):
        return None
    pos = len(sig)
    w = h = None
    ct = 0
    idat = bytearray()
    try:
        while pos + 8 <= len(content):
            (ln,) = struct.unpack_from(">I", content, pos)
            ctype = content[pos + 4 : pos + 8]
            data = content[pos + 8 : pos + 8 + ln]
            if len(data) < ln:
                return None
            if ctype == b"IHDR":
                w, h, bitd, ct, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", data
                )
                if (
                    comp != 0 or filt != 0 or interlace != 0 or bitd != 8
                    or ct not in (0, 2, 4, 6)
                    or w == 0 or h == 0 or w > 1 << 16 or h > 1 << 16
                ):
                    return None
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
            pos += 12 + ln  # length + type + data + crc32
        if w is None or not idat:
            return None
        raw = zlib.decompress(bytes(idat))
    except Exception:
        return None
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
    stride = w * nch
    if len(raw) != (stride + 1) * h:
        return None
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.int64)
    for y in range(h):
        f = int(arr[y, 0])
        cur = arr[y, 1:].astype(np.int64)
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int64)
        if f == 0:
            rec = cur
        elif f == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: serial in x
            rec = cur
            for x in range(stride):
                a = rec[x - nch] if x >= nch else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + prev[x]) >> 1
                else:
                    b, c = prev[x], prev[x - nch] if x >= nch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            return None
        out[y] = rec
    px = out.reshape(h, w, nch).astype(np.float32)
    if ct in (0, 4):  # gray / gray+alpha: channel 0 IS the luma
        return px[..., 0]
    return 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]


def _decode_wav(content: bytes) -> "np.ndarray | None":
    """REAL decoder for 16-bit PCM WAV (stdlib ``wave`` + numpy):
    returns the first channel as float32 in [-1, 1), or None when the
    bytes are not such a WAV."""
    import io
    import wave as _wave

    if content is None or len(content) < 44 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None
    try:
        with _wave.open(io.BytesIO(content), "rb") as wf:
            if wf.getsampwidth() != 2:
                return None
            n, ch = wf.getnframes(), wf.getnchannels()
            pcm = np.frombuffer(wf.readframes(n), dtype="<i2")
    except Exception:
        return None
    if ch > 1:
        pcm = pcm[::ch]
    return pcm.astype(np.float32) / 32768.0


def _decode_image_impl(content: bytes) -> np.ndarray:
    """Image decode: REAL for 8-bit PNG (stdlib zlib inflate +
    unfilter, see :func:`_decode_png`) and uncompressed 24-bit BMP
    (pure numpy, see :func:`_decode_bmp`); other formats fall back to
    the DETERMINISTIC FAKE (a stable 8x8 grayscale derived from the
    bytes) because no codec library ships in this container — swapping
    in ``PIL.Image.open(io.BytesIO(content))`` changes only this
    function.  The fixture blobs are arbitrary binary, so the catalog
    oracles exercise the fake branch; the PNG/BMP branches are pinned
    by unit tests decoding real files end to end through mapInPandas.
    """
    if content is None:
        raise NotImplementedError("null content not decodable")
    png = _decode_png(content)
    if png is not None:
        return png
    bmp = _decode_bmp(content)
    if bmp is not None:
        return bmp
    arr = np.frombuffer(content[:64].ljust(64, b"\0"), dtype=np.uint8)
    return arr.reshape(8, 8).astype(np.float32)


def _decode_audio_impl(content: bytes, sample_rate: int = 16_000) -> np.ndarray:
    """Audio decode: REAL for 16-bit PCM WAV (stdlib ``wave``); other
    formats fall back to the DETERMINISTIC FAKE (swap point for
    soundfile/librosa — same contract as :func:`_decode_image_impl`)."""
    if content is None:
        raise NotImplementedError("null content not decodable")
    wav = _decode_wav(content)
    if wav is not None:
        return wav
    arr = np.frombuffer(content[:256].ljust(256, b"\0"), dtype=np.uint8)
    return (arr.astype(np.float32) - 128.0) / 128.0


def attach_meta(df: DataFrame, content_col: str = "content", media_type: str = "image", fmt: str = "raw") -> DataFrame:
    """Populate the typed metadata struct from the binary column —
    JVM-side (length etc.), no decode needed."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
            F.length(F.col(content_col)).cast("bigint").alias("size_bytes"),
        ),
    )


def extract_image_features(df: DataFrame, id_col: str = "media_id", content_col: str = "content") -> DataFrame:
    """Decode + feature-extract images via mapInPandas (Arrow batches).

    Output: IMAGE_FEATURES_SCHEMA (width/height/mean-luma + a flat
    float feature vector).  One Python worker per task; batch size is
    governed by spark.sql.execution.arrow.maxRecordsPerBatch.
    """

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for mid, content in zip(batch[id_col], batch[content_col]):
                img = _decode_image_impl(bytes(content) if content is not None else None)
                out.append(
                    {
                        "media_id": int(mid),
                        "width": int(img.shape[1]),
                        "height": int(img.shape[0]),
                        "mean_luma": float(img.mean()),
                        "feature": img.flatten().tolist(),
                    }
                )
            yield pd.DataFrame.from_records(out)

    return df.select(id_col, content_col).mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.FloatType())),
    ]
)


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Decode + BOX-DOWNSAMPLE images via mapInPandas — the resize leg
    of the multimodal surface (thumbnailing / patch-grid prep for a
    vision encoder), same Arrow-batched 1->1 shape as
    :func:`extract_image_features`.

    Box (area-average) semantics: the source luma plane splits into an
    ``out_h x out_w`` grid of equal pixel blocks and each output pixel
    is its block's exact mean — deterministic arithmetic an external
    oracle can replay per cell.  Requires the source dimensions to be
    divisible by the target's (true for the pipeline's fixed
    encoder-input sizes); anything else raises rather than silently
    interpolating.  The decode is shared with the feature extractor
    (real PNG/BMP, deterministic fake otherwise)."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for mid, content in zip(batch[id_col], batch[content_col]):
                img = _decode_image_impl(bytes(content) if content is not None else None)
                h, w = img.shape
                if h % out_h or w % out_w:
                    raise ValueError(
                        f"box resize needs src dims divisible by target: "
                        f"({h}x{w}) -> ({out_h}x{out_w})"
                    )
                small = img.reshape(
                    out_h, h // out_h, out_w, w // out_w
                ).mean(axis=(1, 3))
                out.append(
                    {
                        "media_id": int(mid),
                        "src_width": int(w),
                        "src_height": int(h),
                        "width": int(out_w),
                        "height": int(out_h),
                        "pixels": small.astype(np.float32).flatten().tolist(),
                    }
                )
            yield pd.DataFrame.from_records(out)

    return df.select(id_col, content_col).mapInPandas(run, schema=RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zero_crossings", T.IntegerType()),
    ]
)


def extract_audio_features(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    sample_rate: int = 16_000,
) -> DataFrame:
    """Decode + feature-extract audio via mapInPandas: waveform stats
    (RMS energy, peak amplitude, zero-crossing count, duration) — the
    audio leg of the multimodal surface, same Arrow-batched 1->1 shape
    as :func:`extract_image_features`.  The decode is the deterministic
    fake (``_decode_audio_impl``); a real deployment swaps in
    soundfile/librosa there and nothing else changes.
    """

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for mid, content in zip(batch[id_col], batch[content_col]):
                wave = _decode_audio_impl(
                    bytes(content) if content is not None else None
                ).astype(np.float64)
                n = wave.shape[0]
                zc = int(np.sum(wave[:-1] * wave[1:] < 0))
                out.append(
                    {
                        "media_id": int(mid),
                        "n_samples": n,
                        "duration_ms": int(n * 1000 // sample_rate),
                        "rms": float(np.sqrt(np.mean(wave**2))),
                        "peak": float(np.max(np.abs(wave))),
                        "zero_crossings": zc,
                    }
                )
            yield pd.DataFrame.from_records(out)

    return df.select(id_col, content_col).mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 16, id_col: str = "media_id", content_col: str = "content") -> DataFrame:
    """Frame-sampling plumbing for video: emits one row per sampled
    'frame' (here: byte-stride chunks from the fake decoder; real impl
    would use a demuxer).  Demonstrates the 1->N mapInPandas shape.
    """
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for mid, content in zip(batch[id_col], batch[content_col]):
                data = bytes(content) if content is not None else b""
                for i in range(0, len(data), every_n_bytes):
                    out.append({"media_id": int(mid), "frame_index": i // every_n_bytes, "frame": data[i : i + every_n_bytes]})
            if out:
                yield pd.DataFrame.from_records(out)

    return df.select(id_col, content_col).mapInPandas(run, schema=schema)


def image_ahash(features: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) from decoded image features:
    bit i is set iff luma pixel i exceeds the image's mean luma — the
    standard cheap perceptual fingerprint (visually-identical images
    modulo compression/brightness noise land within a few bits).

    Input is :func:`extract_image_features` output (the 64-value luma
    vector + mean), so decode cost is paid once and the hash itself is
    pure JVM column arithmetic.  The 64 bits split into TWO bigint
    halves (h_lo = bits 0-31, h_hi = bits 32-63) built from literal
    shift terms: ANSI mode forbids a set bit 63 in one signed bigint
    fold, and the split halves replay as plain integer arithmetic on
    any engine.  Returns (media_id, h_lo, h_hi).
    """
    # aHash is defined on the 8x8 = 64-pixel thumbnail; a differently-
    # sized feature vector would make element_at(feature, i) THROW
    # under ANSI mode mid-query, so non-conforming rows are excluded
    # up front (resize to 8x8 first via resize_images)
    features = features.filter(F.size("feature") == 64)
    mean = F.col("mean_luma")

    def half(lo_bit: int) -> Column:
        terms = [
            F.when(
                F.element_at("feature", i + 1) > mean, F.lit(1 << (i - lo_bit))
            ).otherwise(F.lit(0)).cast("bigint")
            for i in range(lo_bit, lo_bit + 32)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out

    return features.select(
        "media_id",
        half(0).alias("h_lo"),
        half(32).alias("h_hi"),
    )


def image_neardup_pairs(
    hashes: DataFrame, max_hamming: int = 6
) -> DataFrame:
    """Near-duplicate image pairs by aHash Hamming distance: the
    64-bit hash splits into EIGHT 8-bit bands, and any pair within
    ``max_hamming <= 7`` differing bits must agree exactly on at least
    one band (pigeonhole: 7 bits cannot touch all 8 bands — note d
    differing bits CAN touch d bands, so catching distance d needs at
    least d + 1 bands), so candidates come from band-value equi-joins
    — one shuffle on (band, value), never an all-pairs scan — and the
    exact popcount check runs on candidates only.  The same band-join
    shape as the SimHash text path (operators/dedup.py), closing the
    loop between the multimodal and dedup families.

    Returns (media_id_a, media_id_b, hamming) with a < b.
    """
    if not 0 <= max_hamming <= 7:
        raise ValueError("8-band scheme supports max_hamming in [0, 7]")
    bands = hashes.select(
        "media_id",
        "h_lo",
        "h_hi",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.shiftright(F.col(c), s).bitwiseAND(F.lit(255))
                        ).alias("val"),
                    )
                    for b, (c, s) in enumerate(
                        [(c, s) for c in ("h_lo", "h_hi")
                         for s in (0, 8, 16, 24)]
                    )
                ]
            )
        ).alias("bb"),
    ).select("media_id", "h_lo", "h_hi", "bb.band", "bb.val")
    a = bands.select(
        F.col("media_id").alias("media_id_a"),
        F.col("h_lo").alias("lo_a"),
        F.col("h_hi").alias("hi_a"),
        "band",
        "val",
    )
    b = bands.select(
        F.col("media_id").alias("media_id_b"),
        F.col("h_lo").alias("lo_b"),
        F.col("h_hi").alias("hi_b"),
        "band",
        "val",
    )
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("media_id_a") < F.col("media_id_b"))
        .select(
            "media_id_a",
            "media_id_b",
            (
                F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
                + F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
