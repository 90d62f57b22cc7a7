"""Structured Streaming surface (SURVEY.md §2.10).

The reference is batch-only: a daily full re-scrape + PK upsert
(``schedule_interval="@daily"`` /root/reference/dags/etl.py:296-297;
merge loads :181-202).  That pattern IS incremental-by-merge, and its
idiomatic Spark form is ``Trigger.AvailableNow`` streaming with
``foreachBatch(upsert)`` — each micro-batch merged idempotently, state
carried by the checkpoint instead of re-reading the world.

Exercised against the ``events`` fixture: event-time tumbling windows
with watermarks for late data, stateful dropDuplicates on event_id,
and the foreachBatch-upsert sink.  Each streaming transform has a
batch twin (same logical plan on a static frame) used by the
correctness oracle; the streaming path is covered by unit tests with
file sources + AvailableNow, run as REAL multi-batch streams
(maxFilesPerTrigger=1 over time-ordered files) so cross-batch state,
watermark advancement, and eviction are actually exercised.

WHICH SINK SHIPS: the deployable production path is
:func:`foreach_batch_upsert` — ``outputMode("update")`` +
``foreachBatch`` merging each micro-batch into the partitioned
snapshot table by PK.  Its state is bounded by the watermark and the
sink table absorbs the history, so it scales to unbounded streams.
The ``complete``-mode memory sink used by the correctness catalog
(:func:`run_available_now_to_memory` in ``q_stream_windowed``) is an
ORACLE HARNESS ONLY: complete mode retains every window's state
forever and the memory sink collects to the driver — both fine for a
bounded fixture comparison, both wrong for production.  Do not deploy
the harness path.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import DataStreamWriter


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source streaming read of the ``events`` fixture.

    Streams the parquet directory with a glob pinned to the events
    file (a real deployment would point at an arriving-files dir).
    Normalizes the fixture's ts encoding the same way the batch loader
    does (nanos-as-long + floor to micros; micros-NTZ cast to session-tz
    timestamp) so the streaming and batch plans see identical schemas.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(schema["ts"].dataType, T.LongType):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(schema["ts"].dataType, T.TimestampNTZType):
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def read_events_stream_multibatch(
    spark: SparkSession,
    sf_dir: str,
    n_batches: int = 3,
    events_df: "DataFrame | None" = None,
    cache_tag: str = "",
    spacer_batches: int = 0,
    spacer_margin_seconds: int = 0,
) -> DataFrame:
    """Stream the ``events`` fixture as ``n_batches`` REAL micro-batches.

    The fixture is one parquet file, which AvailableNow would consume in
    a single batch — exercising none of the cross-batch machinery.  This
    helper re-stages it as ``n_batches`` disjoint time-range files
    (ascending mtimes; the file source processes oldest-first) and
    limits each trigger to one file, so windows and dedup keys spanning
    adjacent ranges carry state ACROSS batches and the watermark
    advances batch-by-batch exactly as in production.  Because arrival
    order follows event time, no row is ever late — results stay equal
    to the batch twin / SQL oracle.  (Late-data EVICTION is proven
    separately in tests/test_streaming.py with out-of-order batches.)

    ``spacer_batches`` appends that many trailing single-file
    micro-batches of sentinel heartbeat rows (one 'view' + one
    'purchase', ``user_id`` -1/-2, ``event_id`` < 0) whose timestamps
    start ``spacer_margin_seconds`` past the data's max ``ts``.
    Outer-join null emissions and state evictions only materialize
    once the watermark PASSES a row's expiry — and a result-emitting
    micro-batch uses the watermark computed at the END of the previous
    one — so a stream that just ends never flushes its tail.  In
    production a heartbeat/punctuation topic plays this role; two
    spacer batches (advance, then flush) are the availableNow
    equivalent.  Callers filter ``user_id < 0`` out of results.
    Requires a non-empty ``cache_tag`` (distinct staging layout).
    """
    from etl_tiki_webscraping_spark.io import load_table

    # ``events_df`` substitutes a derived event set (must keep a ``ts``
    # column); ``cache_tag`` discriminates its staging cache entry — the
    # cache key cannot see the DataFrame's contents, so a custom
    # events_df with the default tag would silently reuse a previously
    # staged dir for DIFFERENT rows (r6 ADVICE)
    if events_df is not None and not cache_tag:
        raise ValueError(
            "read_events_stream_multibatch: a custom events_df needs a "
            "non-empty cache_tag to key its staging cache entry"
        )
    if spacer_batches and not cache_tag:
        raise ValueError(
            "read_events_stream_multibatch: spacer_batches changes the "
            "staged layout — pass a non-empty cache_tag"
        )
    events = events_df if events_df is not None else load_table(spark, sf_dir, "events")
    # staging is one-time setup (a deployment streams an already-arriving
    # dir); memoize per (fixture, split) so repeated runs in one session
    # — the bench's steady-state pass — don't re-shuffle and re-write it
    # spacer params are part of the staged LAYOUT: same tag with a
    # different spacer count/margin must stage fresh, not silently
    # reuse a dir whose sentinel batches differ (the same hazard the
    # events_df/cache_tag guard exists for)
    key = (
        os.path.abspath(sf_dir), n_batches, cache_tag,
        spacer_batches, spacer_margin_seconds,
    )
    staged = _STAGED_STREAM_DIRS.get(key)
    if staged is None or not os.path.isdir(staged):
        staged = tempfile.mkdtemp(prefix="stream-batches-") + "/in"
        (
            events.repartitionByRange(n_batches, "ts")
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(staged)
        )
        files = sorted(
            f
            for f in os.listdir(staged)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        for i, f in enumerate(files):  # part-00000 holds the lowest ts range
            os.utime(os.path.join(staged, f), (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
        if spacer_batches:
            import datetime as _dt
            import shutil

            # one bounded scalar read: the sentinel ts must clear every
            # real row's state expiry (caller adds horizon+delay margin)
            mx = events.agg(F.max("ts").alias("m")).collect()[0]["m"]
            for b in range(spacer_batches):
                ts = mx + _dt.timedelta(seconds=spacer_margin_seconds + 60 * b)
                rows = [
                    (-(2 * b + 1), ts, -1, "view", 0.0, None),
                    (-(2 * b + 2), ts, -2, "purchase", 0.0, None),
                ]
                tmp = staged + f".spacer{b}"
                events.sparkSession.createDataFrame(
                    rows, schema=events.schema
                ).coalesce(1).write.mode("overwrite").parquet(tmp)
                part = next(
                    f for f in os.listdir(tmp)
                    if f.endswith(".parquet") and not f.startswith((".", "_"))
                )
                dst = os.path.join(staged, f"spacer-{b:02d}.parquet")
                shutil.move(os.path.join(tmp, part), dst)
                shutil.rmtree(tmp, ignore_errors=True)
                t = 1_700_000_000 + (len(files) + b) * 60
                os.utime(dst, (t, t))
        _STAGED_STREAM_DIRS[key] = staged
    schema = events.schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
    )


_STAGED_STREAM_DIRS: dict[tuple[str, int, str], str] = {}


def run_available_now_to_memory(
    stream: DataFrame,
    query_name: str,
    output_mode: str,
    shuffle_partitions: int | None = 8,
    no_data_batches: bool = True,
) -> DataFrame:
    """Execute a streaming plan over all currently-available input
    (``Trigger.AvailableNow`` — the idiomatic form of the reference's
    daily batch re-run, dags/etl.py:296-297) into an in-memory sink and
    return the result table.

    ``shuffle_partitions`` sizes the STATE STORE: a streaming query
    instantiates one state-store partition per shuffle partition per
    trigger, so the setting is a real knob, not a tuning nicety —
    oversized on a small stream it pays empty-task overhead every
    micro-batch; undersized at scale it bounds parallelism (the value
    is frozen into the checkpoint).  Default 8 suits the fixture
    streams; production picks per-stream capacity and keeps it fixed
    for the checkpoint's lifetime.  Restored after the run.

    ``no_data_batches=False`` disables the trailing watermark-only
    micro-batch (``spark.sql.streaming.noDataMicroBatches.enabled``;
    restored after the run).  Each no-data round costs a full
    state-store reload/commit cycle across every store partition plus
    an incremental re-plan (~1 s at fixture scale, r16 measurement) and
    exists ONLY to emit results an advancing watermark unlocks after
    the last data batch.  Callers may disable it exactly when their
    emitted rows cannot depend on that trailing round: complete-mode
    aggregates (every trigger rewrites the full result), inner
    stream-stream joins (rows emit when the matching data arrives), and
    append sinks whose tail is flushed by trailing DATA batches (the
    left-outer join's heartbeat spacers).  Queries whose tail emission
    NEEDS a watermark-only round must keep the default.
    """
    session = stream.sparkSession
    prev = session.conf.get("spark.sql.shuffle.partitions")
    _ND_KEY = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev_nd = session.conf.get(_ND_KEY)
    if shuffle_partitions is not None:
        session.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    if not no_data_batches:
        session.conf.set(_ND_KEY, "false")
    try:
        q = (
            stream.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(query_name)
            .trigger(availableNow=True)
            .option("checkpointLocation", tempfile.mkdtemp(prefix=f"ckpt-{query_name}-"))
            .start()
        )
        q.awaitTermination()
    finally:
        if shuffle_partitions is not None:
            session.conf.set("spark.sql.shuffle.partitions", prev)
        session.conf.set(_ND_KEY, prev_nd)
    return session.table(query_name)


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "10 minutes",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts/sums per event type with a watermark.

    Works on a streaming DataFrame (late rows beyond the watermark are
    dropped; state is bounded) AND on a batch DataFrame (watermark is a
    no-op there) — one definition, both engines.
    """
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"), F.col(type_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            type_col,
            "n_events",
            "sum_value",
        )
    )


def windowed_event_counts_batch(events: DataFrame, window_duration: str = "1 hour") -> DataFrame:
    """Batch twin without the watermark node (for oracle comparison)."""
    return (
        events.groupBy(F.window(F.col("ts"), window_duration).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: Sequence[str] = ("event_id",),
    watermark_delay: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Stateful exactly-once dedup on the event key within the
    watermark horizon — the streaming analog of the reference's
    upsert-based cross-run dedup (PK keyed, SURVEY §2.9 W2).
    """
    return events.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(list(keys))


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "0 seconds",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Custom STATEFUL streaming sessionization via
    ``applyInPandasWithState`` — the operator Spark's built-ins can't
    express (``session_window`` exists for aggregation, but not with
    arbitrary per-session state transitions / emission logic).

    Per key, consecutive events within ``gap`` belong to one session.
    Sessions that close WITHIN a batch (a later event arrives after the
    gap) emit immediately; the trailing open session is held in state
    with an event-time timeout of ``last_ts + gap`` and emits when the
    watermark passes it.  State per key is four scalars — bounded
    regardless of session length; the batch twin is the catalog's
    ``sessionize_events`` (lag + running-sum windows).
    """
    import pandas as pd  # driver-side too: parse the gap duration

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = int(pd.Timedelta(gap).total_seconds() * 1000)
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
        ]
    )
    state_schema = "session_start bigint, last_ts bigint, n_events bigint, sum_value double"

    def _emit(user_id, ss, lt, n, sv):
        return {
            "user_id": int(user_id),
            "session_start": pd.to_datetime(ss, unit="ms"),
            "session_end": pd.to_datetime(lt, unit="ms"),
            "n_events": int(n),
            "sum_value": float(sv),
        }

    def fn(key, pdfs, state: GroupState):
        user_id = key[0]
        if state.hasTimedOut:
            ss, lt, n, sv = state.get
            state.remove()
            yield pd.DataFrame([_emit(user_id, ss, lt, n, sv)])
            return
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
        # normalize to ns first — Arrow may hand us datetime64[us] or [ns]
        ts_ms = (
            pdf[ts_col].astype("datetime64[ns]").astype("int64") // 1_000_000
        ).tolist()
        vals = pdf[value_col].tolist()
        ss = lt = n = sv = None
        if state.exists:
            ss, lt, n, sv = state.get
        closed = []
        for t, v in zip(ts_ms, vals):
            if ss is None:
                ss, lt, n, sv = t, t, 1, float(v)
            elif t - lt > gap_ms:
                closed.append(_emit(user_id, ss, lt, n, sv))
                ss, lt, n, sv = t, t, 1, float(v)
            else:
                lt, n, sv = t, n + 1, sv + float(v)
        timeout_at = int(lt) + gap_ms
        wm = state.getCurrentWatermarkMs()
        if timeout_at <= wm:
            # the open session is already expired relative to the
            # watermark (e.g. late-ish batch): emit now — a timeout in
            # the past cannot be registered
            closed.append(_emit(user_id, ss, lt, n, sv))
            if state.exists:
                state.remove()
        else:
            state.update((int(ss), int(lt), int(n), float(sv)))
            state.setTimeoutTimestamp(timeout_at)
        if closed:
            yield pd.DataFrame(closed)

    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def enriched_windowed_counts(
    events: DataFrame,
    dim: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Stream-static join + windowed aggregation: enrich the event
    stream with a broadcast dimension (nation, keyed by
    ``user_id % 25``), then tumbling-window counts per nation.

    The stream-static join is stateless — each micro-batch hash-joins
    against the (re-broadcast-on-update) static side, no join state
    accumulates — so only the windowed agg holds state, bounded by the
    watermark.  Works identically on a batch frame (the oracle twin).
    """
    enriched = events.withWatermark("ts", watermark_delay).join(
        F.broadcast(dim.select("n_nationkey", "n_name")),
        F.pmod(F.col("user_id"), F.lit(25)) == F.col("n_nationkey"),
        "inner",
    )
    return (
        enriched.groupBy(F.window("ts", window_duration).alias("w"), "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("n_name").alias("nation"),
            "n_events",
            "sum_value",
        )
    )


def foreach_batch_upsert(
    stream: DataFrame,
    target_path: str,
    keys: Sequence[str],
    checkpoint_dir: str,
    order_by: Sequence[str] | None = None,
    partition_by: Sequence[str] | None = None,
    stable_partitions: bool = True,
    evolve_schema: bool = False,
) -> DataStreamWriter:
    """``writeStream.foreachBatch`` sink that merges every micro-batch
    into a parquet target by PK — the reference's daily staging+merge
    (dags/etl.py:173-202) as a streaming sink.  Idempotent per batch:
    re-processing a batch after failure converges to the same table.

    Pass ``partition_by`` (typically the event date) so each
    micro-batch rewrites ONLY the partitions it touches — at streaming
    cadence the partition-pruned upsert is what makes a 100 TB sink
    table sustainable (a full-table rewrite per trigger is not).
    Streaming event keys don't migrate partitions when partitioned by
    their own event date, hence ``stable_partitions=True`` here by
    default (see sinks/upsert.py).

    ``evolve_schema=True`` forwards Delta-``mergeSchema``-style ADDITIVE
    evolution to the per-batch merge: when a redeployed query's batches
    carry a column the committed table lacks, the column is appended and
    prior rows read NULL for it (a streaming source's own schema is
    fixed for the lifetime of one query, so mid-stream evolution arrives
    exactly this way — a restart with a wider schema).  Off by default:
    a stray column in a feed should be a loud error, not silent DDL.
    """
    from etl_tiki_webscraping_spark.sinks.upsert import upsert_parquet

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_parquet(
            batch_df.sparkSession,
            batch_df,
            target_path,
            keys,
            order_by,
            partition_by=partition_by,
            stable_partitions=stable_partitions,
            evolve_schema=evolve_schema,
        )

    return (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(merge)
    )


def foreach_batch_hll_union(
    stream: DataFrame,
    target_path: str,
    key_cols: Sequence[str],
    value_col: str,
    checkpoint_dir: str,
) -> "DataStreamWriter":
    """``foreachBatch`` sink maintaining a MERGEABLE-SKETCH table: each
    micro-batch aggregates per-key HLL sketches of ``value_col`` and
    unions them into the stored sketch table (scalar ``hll_union`` on
    the overlap, pass-through on either side's novel keys), committed
    through the ordinary snapshot upsert.

    This is the streaming half of the sketch-rollup story: a
    distinct-users dashboard over a 100 TB event stream never stores
    raw ids — the state is |keys| compact sketches, every trigger's
    work is one batch-sized aggregate plus a sketch-table merge, and
    any coarser rollup (weekly from daily) stays a sketch union away.
    Estimates are read back with ``hll_sketch_estimate``."""
    from etl_tiki_webscraping_spark.sinks.upsert import (
        read_parquet_table,
        upsert_parquet,
    )

    keys = list(key_cols)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        fresh = batch_df.groupBy(*keys).agg(
            F.hll_sketch_agg(value_col).alias("sk")
        )
        import os

        # emptiness check, not bare exists(): a pre-created empty sink
        # dir would otherwise hit a schema-less parquet read and kill
        # the first micro-batch (same guard the upsert paths use)
        if os.path.isdir(target_path) and any(
            not e.startswith((".", "_")) for e in os.listdir(target_path)
        ):
            stored = read_parquet_table(spark, target_path).select(
                *keys, F.col("sk").alias("__old")
            )
            # LEFT join: the update set stays batch-sized.  full_outer
            # would pull every STORED key into `fresh` and rewrite the
            # whole table each trigger — O(stored), not O(batch);
            # stored-only keys already survive via the upsert's
            # anti-join carry-forward.
            fresh = (
                fresh.join(stored, on=keys, how="left")
                .select(
                    *keys,
                    F.when(
                        F.col("__old").isNotNull(),
                        F.hll_union("sk", "__old"),
                    )
                    .otherwise(F.col("sk"))
                    .alias("sk"),
                )
            )
        upsert_parquet(spark, fresh, target_path, keys)

    return (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(merge)
    )


def foreach_batch_portable_hll(
    stream: DataFrame,
    target_path: str,
    key_cols: Sequence[str],
    value_col: str,
    checkpoint_dir: str,
    lg_k: int = 8,
) -> "DataStreamWriter":
    """``foreachBatch`` sink maintaining a PORTABLE-HLL register table
    (operators/sketches.py::hll_build) — the engine-replayable twin of
    :func:`foreach_batch_hll_union` (r13 VERDICT ask #4: the portable
    sketches make the maintained state itself bit-strict against a SQL
    oracle, where the DataSketches binary blobs could only ever be
    rows-only).

    Each micro-batch builds its own ``(keys..., idx, rho)`` register
    rows, folds them into the stored table by per-register MAX (LEFT
    join keeps the update set batch-sized; stored-only registers
    survive via the upsert's anti-join carry-forward), and commits
    through the ordinary snapshot upsert keyed on ``(keys..., idx)``.
    Because register assignment is row-intrinsic and max is
    associative, the final table is IDENTICAL to a one-shot build over
    the full event set — any batch split replays to the same bits,
    which is exactly what the catalog oracle asserts.  State is
    bounded: ``|keys| x 2^lg_k`` rows regardless of stream volume."""
    from etl_tiki_webscraping_spark.operators.sketches import hll_build
    from etl_tiki_webscraping_spark.sinks.upsert import (
        read_parquet_table,
        upsert_parquet,
    )

    keys = list(key_cols)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        fresh = hll_build(batch_df, value_col, group_cols=keys, lg_k=lg_k)
        import os

        # emptiness check, not bare exists(): a pre-created empty sink
        # dir would hit a schema-less parquet read (the
        # foreach_batch_hll_union guard)
        if os.path.isdir(target_path) and any(
            not e.startswith((".", "_")) for e in os.listdir(target_path)
        ):
            stored = read_parquet_table(spark, target_path).select(
                *keys, "idx", F.col("rho").alias("__old")
            )
            fresh = (
                fresh.join(stored, on=[*keys, "idx"], how="left")
                .select(
                    *keys,
                    "idx",
                    F.greatest(F.col("rho"), F.col("__old")).alias("rho"),
                )
            )
        upsert_parquet(spark, fresh, target_path, [*keys, "idx"])

    return (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(merge)
    )


def stream_stream_purchase_views(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark_delay: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream INNER join with watermarks on BOTH sides and a
    time-range condition (SURVEY §2.10 extension; VERDICT r3 ask #4):
    each purchase joins the same user's views from the preceding
    ``horizon``.

    State-cleanup contract (the part a stream-static join doesn't
    have): both inputs carry their own watermark, and the range
    condition ``view_ts in [purchase_ts - horizon, purchase_ts]`` lets
    Spark derive a state watermark PER SIDE — a buffered view row is
    dropped once the combined watermark passes ``view_ts + horizon``
    (no purchase that could still arrive can match it), and a buffered
    purchase once the watermark passes its own event time.  Without
    the range bound the join state would grow forever; with it, state
    is bounded by ``horizon + watermark_delay`` of traffic per side.
    Works identically on batch frames (watermarks are no-ops) — the
    oracle twin.

    ``how='leftOuter'`` emits every view, null-extending the ones no
    purchase followed within the horizon (abandonment detection) — the
    semantics only a watermark makes possible in a stream: the
    null row for a view can be emitted ONLY once the watermark proves
    no matching purchase can still arrive (watermark past ``view_ts +
    horizon``), so a finite input needs trailing watermark-advancing
    rows to flush its tail (see read_events_stream_multibatch's
    ``spacer_batches``).
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"how must be 'inner' or 'leftOuter', got {how!r}")
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", watermark_delay)
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", watermark_delay)
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {horizon}")),
        how,
    ).select(
        "view_id",
        "purchase_id",
        F.col("v_user").alias("user_id"),
        "view_ts",
        "purchase_ts",
    )


def foreach_batch_apply_changes(
    stream: DataFrame,
    target_path: str,
    keys: Sequence[str],
    checkpoint_dir: str,
    op_col: str = "op",
    seq_col: str = "seq",
    partition_by: Sequence[str] | None = None,
) -> DataStreamWriter:
    """``writeStream.foreachBatch`` sink folding a CDC stream into a
    snapshot replica — the streaming form of ``APPLY CHANGES INTO``
    (sinks/upsert.py::apply_changes_parquet): each micro-batch's
    I/U/D rows merge by key with highest-``seq``-wins and deletes
    removing rows; the replica follows the upstream change feed
    batch-by-batch without ever scanning the upstream table.
    Idempotent per batch (a replayed batch converges), which is what
    foreachBatch's at-least-once delivery requires.
    """
    from etl_tiki_webscraping_spark.sinks.upsert import apply_changes_parquet

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_changes_parquet(
            batch_df.sparkSession,
            batch_df,
            target_path,
            keys,
            op_col,
            seq_col,
            partition_by=partition_by,
        )

    return (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(fold)
    )
