"""Python UDTF tier (Spark 4) — the fourth Python-execution surface
next to scalar pandas_udf, grouped applyInPandas, and streaming
mapInPandas (SURVEY.md §2.11: the reference wraps arbitrary per-task
Python in coarse PythonOperator tasks, dags/etl.py:25-120; a UDTF is
the idiomatic Spark port of that "python function returning rows"
framing — table in, table out, inside the query plan).

Probed in this container (round-13): plain UDTFs, Arrow-optimized
UDTFs (``useArrow=True``), the scalar-argument LATERAL form, and the
``TABLE(...)`` argument form all work (unlike
transformWithStateInPandas, whose driver worker needs the absent
protobuf — see COVERAGE.md environment note).

Scale notes: a UDTF evaluates per input row inside a task — the plan
stays fully distributed (no collect), output fan-out streams through
the same Arrow channel mapInPandas uses.  Catalyst treats the UDTF as
a black box (no pushdown through it), so project/filter BEFORE the
call; like mapInPandas fan-out, the optimizer cannot see the output
multiplicity, so size downstream joins accordingly (the r12
``.hint("merge")`` lesson applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def sliding_chunk_udtf(chunk_tokens: int = 32, stride: int = 24):
    """UDTF class factory: whitespace-tokenize each document and emit
    overlapping ``chunk_tokens``-token windows every ``stride`` tokens
    — the context-window chunker an embedding/RAG pipeline runs before
    encoding (overlap preserves cross-boundary context).  The trailing
    partial window is emitted (tail-loss-free, the R1 split contract);
    empty/NULL documents emit nothing.

    Arrow-optimized (``useArrow=True``): rows stream through the same
    Arrow channel as the pandas kernels, not pickled one by one.

    Tokenization splits on the explicit ASCII class ``[ \\t\\n\\f\\r]``
    (RE2 ``\\s`` — what the DuckDB oracle uses; NOT ``str.split()``,
    whose Unicode whitespace — U+3000, NBSP — would diverge from the
    ``\\s+``-based oracle; the tokenize_mixed_py pitfall, ADVICE r13)."""
    import re

    from pyspark.sql.functions import udtf

    ws = re.compile("[ \t\n\f\r]+")

    if chunk_tokens < 1 or stride < 1:
        raise ValueError(
            f"chunk_tokens and stride must be >= 1, got "
            f"({chunk_tokens}, {stride})"
        )

    @udtf(
        returnType=(
            "doc_id: bigint, chunk_idx: int, start_tok: int, "
            "n_tokens: int, chunk_text: string"
        ),
        useArrow=True,
    )
    class SlidingChunks:
        def eval(self, row):
            toks = [t for t in ws.split(row["text"] or "") if t]
            n = len(toks)
            idx = 0
            for start in range(0, n, stride):
                window = toks[start : start + chunk_tokens]
                yield (
                    row["doc_id"],
                    idx,
                    start,
                    len(window),
                    " ".join(window),
                )
                idx += 1

    return SlidingChunks


def sliding_chunks(
    spark: SparkSession,
    docs: DataFrame,
    chunk_tokens: int = 32,
    stride: int = 24,
    view_name: str = "udtf_sliding_chunks_src",
) -> DataFrame:
    """Run the sliding-window chunker over ``docs(doc_id, text)`` via
    the ``TABLE(...)`` argument form — one table-function call in the
    plan, each task streaming its partition's rows through the UDTF.
    The registration pair (udtf + temp view) is per-session idempotent.
    """
    spark.udtf.register("udtf_sliding_chunks", sliding_chunk_udtf(chunk_tokens, stride))
    docs.select("doc_id", "text").createOrReplaceTempView(view_name)
    return spark.sql(
        f"SELECT * FROM udtf_sliding_chunks(TABLE({view_name}))"
    )


def mp3_frames_udtf():
    """UDTF: expand each MP3 blob into one row PER FRAME — the 1->N
    lateral form over BINARY media (the sliding-chunk UDTF's text
    sibling), backed by the strict frame walk in
    :mod:`..operators.audiometa`.  A blob the walk rejects emits the
    frame_idx = -1 quarantine row (the sample_gif_frames convention)."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "media_id: bigint, frame_idx: int, bitrate_kbps: int, "
            "frame_bytes: int"
        ),
        useArrow=True,
    )
    class Mp3Frames:
        def eval(self, row):
            from etl_tiki_webscraping_spark.operators.audiometa import (
                iter_mp3_frames,
            )

            content = row["content"]
            frames = iter_mp3_frames(
                bytes(content) if content is not None else None
            )
            if frames is None:
                yield (row["media_id"], -1, None, None)
                return
            for idx, kbps, size in frames:
                yield (row["media_id"], idx, kbps, size)

    return Mp3Frames


def mp3_frames(
    spark: SparkSession,
    blobs: DataFrame,
    view_name: str = "udtf_mp3_frames_src",
) -> DataFrame:
    """Run the per-frame MP3 expansion over ``blobs(media_id,
    content)`` via the TABLE(...) argument form."""
    spark.udtf.register("udtf_mp3_frames", mp3_frames_udtf())
    blobs.select("media_id", "content").createOrReplaceTempView(view_name)
    return spark.sql(f"SELECT * FROM udtf_mp3_frames(TABLE({view_name}))")
