"""Incremental rollup maintenance (continuous-aggregate / materialized
view shape for the training-data pipeline surface).

A 100 TB event stream can't re-aggregate history per batch; the rollup
table is maintained incrementally: aggregate ONLY the new batch, then
additively merge the partial aggregates into the stored rollup on the
bucket key.  Works for any commutative-monoid metric (count, sum, min,
max — store sum+count for mean); the invariant is

    merge(rollup(A), rollup(B)) == rollup(A ∪ B)

which the catalog query checks against a one-shot GROUP BY oracle.

Scale shape: the batch aggregation is a partial-agg shuffle on the
batch only; the merge is one outer join on bucket keys against a table
whose size is the bucket-key cardinality (time × dims), orders of
magnitude smaller than the raw events.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_additive(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    add_cols: Sequence[str],
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Merge partial aggregates into a rollup: matching keys ADD their
    ``add_cols`` (and combine ``min_cols``/``max_cols`` accordingly);
    keys present on only one side pass through.

    One full-outer join on the bucket keys — no window, no second
    shuffle.  Metric columns must be additive (counts, sums — use
    decimal sums for exact float-order-independent results).
    """
    keys = list(keys)
    metric_cols = list(add_cols) + list(min_cols) + list(max_cols)
    t = target.select(*keys, *[F.col(c).alias(f"__t_{c}") for c in metric_cols])
    u = updates.select(*keys, *[F.col(c).alias(f"__u_{c}") for c in metric_cols])
    joined = t.join(u, on=keys, how="full_outer")

    def combine(c: str, fn) -> F.Column:
        tc, uc = F.col(f"__t_{c}"), F.col(f"__u_{c}")
        return (
            F.when(tc.isNull(), uc).when(uc.isNull(), tc).otherwise(fn(tc, uc)).alias(c)
        )

    return joined.select(
        *keys,
        *[combine(c, lambda a, b: a + b) for c in add_cols],
        *[combine(c, F.least) for c in min_cols],
        *[combine(c, F.greatest) for c in max_cols],
    )


def hourly_event_rollup(events: DataFrame, value_col: str = "value") -> DataFrame:
    """Per (hour-bucket, event_type) partial aggregate of an events
    batch: row count + exact decimal sum (float-order-independent so
    incremental merges reproduce the one-shot aggregation bit-for-bit).
    """
    return events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket_ts"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("sum_value"),
    )


def rollup_deltas_from_change_feed(
    feed: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    change_type_col: str = "_change_type",
    sum_col: str = "sum_value",
    count_col: str = "n_rows",
) -> DataFrame:
    """Signed partial aggregates from a change-data-feed slice — the
    incremental-view-maintenance delta: inserts/update postimages
    contribute +1/+value, deletes/update preimages contribute
    -1/-value, so

        merge_additive(rollup(v_a), deltas(feed a+1..b)) == rollup(v_b)

    A 100 TB table's rollup is then maintained from each commit's
    change files (batch-sized) instead of re-aggregating the table;
    an update's net effect is post - pre, and a fully-deleted group
    cancels to count 0 (drop those rows to match a direct aggregate).
    Sums are exact decimal so additions and cancellations are
    order-independent.  Unknown change types raise instead of silently
    skewing the rollup.
    """
    ct = F.col(change_type_col)
    sign = (
        F.when(ct.isin("insert", "update_postimage"), F.lit(1))
        .when(ct.isin("delete", "update_preimage"), F.lit(-1))
        .otherwise(F.raise_error(F.concat(F.lit("unknown change type: "), ct)).cast("int"))
    )
    return (
        feed.select(
            *group_cols,
            (sign.cast("decimal(2,0)") * F.col(value_col).cast("decimal(18,6)")).alias("__sv"),
            sign.alias("__sn"),
        )
        .groupBy(*group_cols)
        .agg(
            F.sum("__sv").cast("decimal(18,6)").alias(sum_col),
            F.sum("__sn").cast("bigint").alias(count_col),
        )
    )


def join_view_refresh(
    view: DataFrame,
    left_new: DataFrame,
    right_new: DataFrame,
    left_key: str,
    right_key: str,
    touched_keys: DataFrame,
) -> DataFrame:
    """Incrementally maintain a materialized equi-JOIN view — the join
    sibling of the additive-rollup IVM above.

    ``view`` is the stored ``left JOIN right`` result as of some
    version; ``touched_keys`` is the distinct set of JOIN-key values
    any change between then and now touched on EITHER side (project
    the join key out of both tables' change feeds — inserts, both
    update images, and deletes all count, since each changes the
    key's join group).  The refresh is affected-key recompute:

        view' = (view ANTI touched) UNION (left' SEMI touched) JOIN
                (right' SEMI touched)

    which handles inserts, updates, and deletes uniformly with set
    semantics — no signed-multiplicity bookkeeping, and join-key
    changes are covered because the feed contains both the pre- and
    post-image, putting the OLD and the NEW key value in the touched
    set.

    Scale shape: work is bounded by |touched| x join fan-out, never
    table size.  ``touched_keys`` is delta-sized, so Spark broadcasts
    it into all three legs (semi/anti joins with no shuffle of the
    big sides); the stored view is rewritten only logically — commit
    it through upsert/overwrite partitioned by a key bucket so the
    anti+union materializes only touched partitions.

    ``touched_keys`` must carry exactly one column named ``left_key``.
    When both sides share the join-key NAME (``left_key == right_key``
    — the common case for a view joined on a shared key), the
    recompute uses the USING-column form, which resolves the otherwise
    AMBIGUOUS_REFERENCE and keeps a single key column, matching a view
    stored from a USING join.
    """
    if touched_keys.columns != [left_key]:
        raise ValueError(
            f"touched_keys must have exactly one column named {left_key!r}, "
            f"got {touched_keys.columns}"
        )
    touched = touched_keys.distinct()
    kept = view.join(F.broadcast(touched), on=left_key, how="left_anti")
    l_hit = left_new.join(F.broadcast(touched), on=left_key, how="left_semi")
    r_hit = right_new.join(
        F.broadcast(touched.withColumnRenamed(left_key, right_key)),
        on=right_key,
        how="left_semi",
    )
    if left_key == right_key:
        # USING join: one key column, no ambiguous F.col reference
        recomputed = l_hit.join(r_hit, on=left_key, how="inner").select(
            view.columns
        )
    else:
        recomputed = l_hit.join(
            r_hit, on=F.col(left_key) == F.col(right_key), how="inner"
        ).select(view.columns)
    # the USING-column anti join moves the key column first; restore
    # the view's declared column order for a stable output contract
    return kept.select(view.columns).unionByName(recomputed)


def feed_touched_keys(
    feed: DataFrame, key_col: str, out_name: str
) -> DataFrame:
    """Distinct join-key values a change-feed slice touches: every
    change row counts (insert / both update images / delete — each
    changes its key's join group).  Delta-sized by construction."""
    return feed.select(F.col(key_col).alias(out_name)).distinct()


def equi_width_histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int,
    null_bucket: bool = False,
) -> DataFrame:
    """Equi-width histogram over a numeric column: ``n_buckets`` equal
    intervals on [lo, hi); values below ``lo`` clamp into bucket 0,
    values at or above ``hi`` into bucket ``n_buckets - 1`` (the
    closed-top convention, so no NON-NULL row is dropped).  Returns
    (bucket, bucket_lo, bucket_hi, cnt) with empty buckets ABSENT —
    profile consumers densify against a spine if they need zeros.

    NULL handling is explicit, never silent: NULL values are EXCLUDED
    from the numeric buckets (``floor(NULL-lo)`` has no bucket; the
    old clamp quietly folded them into bucket 0, misreporting the low
    bucket on any nullable column).  With ``null_bucket=True`` the
    NULL count is emitted as a dedicated ``bucket = -1`` row with NULL
    edges, so profiling stays total without corrupting bucket 0.

    The aggregate is a single map-side-combinable groupBy on a derived
    integer — one shuffle whose cardinality is ``n_buckets`` (+1), never
    row count, so it costs the same at 100 TB as at 100 MB (the scan
    dominates).  Bucket arithmetic is plain floor division, replayable
    exactly in any SQL dialect (no dialect-specific width_bucket)."""
    if not hi > lo:
        raise ValueError("need hi > lo")
    if n_buckets < 1:
        raise ValueError("need n_buckets >= 1")
    width = (hi - lo) / n_buckets
    # clamp in BIGINT first, cast int only after: floor() of a far
    # outlier (or +/-inf) yields a long outside int range, and under
    # ANSI mode an early .cast('int') throws CAST_OVERFLOW — one
    # extreme row aborting the whole histogram instead of clamping
    # into the edge bucket as documented
    clamped = F.least(
        F.lit(n_buckets - 1).cast("bigint"),
        F.greatest(
            F.lit(0).cast("bigint"),
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)),
        ),
    ).cast("int")
    # NaN has no place on the number line: route it with NULL (the
    # -1 bucket / exclusion), never through floor() arithmetic
    vtype = df.schema[value_col].dataType.simpleString()
    is_missing = F.col(value_col).isNull()
    if vtype in ("float", "double"):
        is_missing = is_missing | F.isnan(F.col(value_col))
    if null_bucket:
        # one extra groupBy key value, same single shuffle
        bucket = F.when(is_missing, F.lit(-1)).otherwise(clamped)
        src = df
    else:
        bucket = clamped
        src = df.filter(~is_missing)
    return (
        src.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "bucket",
            F.when(
                F.col("bucket") >= 0, F.lit(lo) + F.col("bucket") * F.lit(width)
            ).alias("bucket_lo"),
            F.when(
                F.col("bucket") >= 0,
                F.lit(lo) + (F.col("bucket") + 1) * F.lit(width),
            ).alias("bucket_hi"),
            "cnt",
        )
    )


def grouped_ols_trend(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group simple linear regression (OLS y = a + b*x) via
    sufficient statistics: ONE map-side-combinable aggregate collects
    (n, sum x, sum y, sum xy, sum x^2) per group and the closed form
    b = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), a = (Sy - b*Sx) / n does the
    rest as plain arithmetic — the trend-per-key primitive (metric
    drift per segment, activity slope per cohort) that needs no ML
    runtime and costs one shuffle of group-cardinality rows at any
    data size.

    Sums accumulate in DECIMAL(38,10) so the aggregate is
    order-independent (float sums would hash-mismatch across
    partitionings); the closed form divides as double at the end.
    Groups with < 2 points or zero x-variance return NULL slope and
    intercept (a vertical or single-point fit has neither).  Returns
    (group_cols..., n, slope, intercept) with slope/intercept rounded
    to 6 places for cross-engine replay.
    """
    x = F.col(x_col).cast("decimal(38,10)")
    y = F.col(y_col).cast("decimal(38,10)")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).cast("decimal(38,10)").alias("sxy"),
        F.sum(x * x).cast("decimal(38,10)").alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    denom = n * sxx - sx * sx
    slope = F.when(
        (F.col("n") >= 2) & (denom != 0), (n * sxy - sx * sy) / denom
    )
    intercept = F.when(slope.isNotNull(), (sy - slope * sx) / n)
    return agg.select(
        *group_cols,
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    )


def cooccurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Frequent item PAIRS by basket co-occurrence (the candidate-pair
    stage of market-basket / affinity mining): for every basket, each
    unordered pair of DISTINCT items it contains counts once, and
    pairs below ``min_support`` baskets drop.

    Shape: one basket-keyed self equi-join generates in-basket pairs —
    the cost is sum(|basket|^2) bounded by basket size, never item or
    basket count (the same bounded-quadratic argument as blocked
    entity matching) — then a pair-keyed count.  A pathological
    mega-basket is the skew risk; cap basket size upstream the same
    way LSH caps buckets.  Returns (item_a, item_b, support) with
    item_a < item_b.
    """
    items = df.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("item")
    ).distinct()
    a = items.select("b", F.col("item").alias("item_a"))
    c = items.select("b", F.col("item").alias("item_b"))
    return (
        a.join(c, "b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )


def event_transition_matrix(
    events: DataFrame,
    key_col: str,
    order_col: str,
    state_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: count (state, next state) adjacencies within each key's
    ``order_col``-ordered stream and emit each row's transition
    probability P(next | state) = count / row total.

    ONE key-partitioned window (lag) finds adjacencies; the transition
    aggregate and the per-source total are both bounded by
    |states|^2, so everything after the window is constant-sized at
    any scale.  Ordering ties break on ``tiebreak_col`` (pass the
    event id) — without it, same-timestamp adjacency would be
    partition-order-dependent and unreplayable.  Probabilities round
    to 6.  Returns (state_from, state_to, n, p).
    """
    order = [F.col(order_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    adj = (
        events.withColumn("_next", F.lead(state_col).over(w))
        .filter(F.col("_next").isNotNull())
        .select(
            F.col(state_col).alias("state_from"),
            F.col("_next").alias("state_to"),
        )
    )
    counts = adj.groupBy("state_from", "state_to").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("state_from").agg(F.sum("n").alias("tot"))
    return (
        counts.join(F.broadcast(totals), "state_from")
        .select(
            "state_from",
            "state_to",
            "n",
            F.round(F.col("n") / F.col("tot"), 6).alias("p"),
        )
    )


def time_weighted_average(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Time-weighted average of an irregularly-sampled value per key
    (TWAP): each observation holds until the next one, so its weight
    is that duration in seconds, and the key's average is
    sum(value * dur) / sum(dur) over the closed intervals (the last
    observation has no successor and is excluded — standard TWAP over
    the observed span).

    ONE key-partitioned window computes successor timestamps; the
    weighted sums accumulate in DECIMAL(38,6) so the aggregate is
    order-independent.  Keys with a single observation (no closed
    interval) return NULL.  Returns (key, twap) rounded to 6.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    # duration via INTEGER microsecond difference, divided once:
    # subtracting two already-divided doubles rounds differently than
    # dividing the exact integer difference, and the 1-ulp drift
    # breaks cross-engine replay
    dur = (
        F.unix_micros(F.lead(F.col(ts_col)).over(w))
        - F.unix_micros(F.col(ts_col))
    ) / F.lit(1_000_000.0)
    closed = events.withColumn("_dur", dur).filter(F.col("_dur").isNotNull())
    num = F.sum(
        (F.col(value_col) * F.col("_dur")).cast("decimal(38,6)")
    ).cast("double")
    den = F.sum(F.col("_dur").cast("decimal(38,6)")).cast("double")
    return closed.groupBy(key_col).agg(
        F.round(
            F.when(den != 0, num / den), 6
        ).alias("twap")
    )
