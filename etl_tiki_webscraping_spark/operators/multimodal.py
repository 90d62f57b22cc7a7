"""Multimodal column plumbing (BASELINE.json north star).

Pattern: media travels as an opaque ``binary`` column plus a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched pandas iterators over ``mapInPandas`` so each task
streams batches without materializing a partition of blobs in memory.

The image/audio codecs are NOT in this container, so the decode kernels
are deterministic fakes behind ``_decode_image_impl`` /
``_decode_audio_impl`` — clearly marked; swapping in Pillow/torchcodec
changes only those two private functions.  The Spark-side contract
(schemas, batch shapes, partitioning) is real and tested.

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


def _decode_image_impl(content: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE decoder (no codec libs in this container).

    Real implementation: ``PIL.Image.open(io.BytesIO(content))``.
    The fake derives a stable 8x8 grayscale 'image' from the bytes so
    every downstream kernel (resize, luma, feature) is testable.
    """
    if content is None:
        raise NotImplementedError("real image decode requires Pillow; null content not decodable")
    arr = np.frombuffer(content[:64].ljust(64, b"\0"), dtype=np.uint8)
    return arr.reshape(8, 8).astype(np.float32)


def _decode_audio_impl(content: bytes, sample_rate: int = 16_000) -> np.ndarray:
    """DETERMINISTIC FAKE audio decoder (real: soundfile/librosa)."""
    if content is None:
        raise NotImplementedError("real audio decode requires soundfile; null content not decodable")
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
