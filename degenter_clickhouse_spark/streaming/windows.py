"""Native streaming windowed aggregations (ST3 with watermarks).

The batch pipeline recomputes candles per micro-batch (ST6 semantics:
readers merge duplicate minute rows). This module is the *pure*
Structured Streaming form: event-time tumbling windows with a
watermark, emitting each (pool, minute) candle exactly once when the
watermark passes the window end — the shape to use when downstream
consumers can't merge-at-read.

Late-data policy: the reference has no watermark and accepts duplicate
minute rows (SURVEY.md ST6); here the watermark bound makes the
trade-off explicit — events later than ``watermark`` are dropped from
the stream aggregate (they'd still land in the batch recompute path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_bars(
    ticks: DataFrame,
    step: str = "1 minute",
    watermark: str = "2 minutes",
    ts: str = "ts",
    pool: str = "pool_id",
    price: str = "price",
    seq: str = "event_id",
) -> DataFrame:
    """Tumbling OHLCV candles over a streaming tick source. Append
    output mode: a candle is final once the watermark passes its
    window. Deterministic open/close via the (ts, seq) order struct."""
    order = F.struct(F.col(ts), F.col(seq))
    w = ticks.withWatermark(ts, watermark)
    return (
        w.groupBy(F.col(pool), F.window(F.col(ts), step))
        .agg(
            F.min_by(F.col(price), order).alias("open"),
            F.max(price).alias("high"),
            F.min(price).alias("low"),
            F.max_by(F.col(price), order).alias("close"),
            F.count(F.lit(1)).alias("trade_count"),
        )
        .select(
            pool,
            F.col("window.start").alias("bucket_start"),
            "open",
            "high",
            "low",
            "close",
            "trade_count",
        )
    )


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "pool_id",
    left_ts: str = "ts",
    right_ts: str = "tick_ts",
    lower: str = "1 minute",
    upper: str = "0 seconds",
    left_watermark: str = "10 minutes",
    right_watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join — TWO live streams
    joined at event time (the streaming sibling of the batch
    ``range_join``; the reference enriches trades with ticks in batch,
    api/routes/trades.js — this is the form where both sides arrive
    continuously).

    Matches ``l`` with every ``r`` of the same ``key`` whose
    ``right_ts`` lies in ``[l.left_ts - lower, l.left_ts + upper]``.
    Both sides carry a watermark AND the join condition bounds the
    event-time distance, so Spark's state store evicts buffered rows
    as the watermarks advance — state is bounded by (key cardinality x
    interval width x arrival rate), never by stream history. Without
    the time-range condition a stream-stream join would buffer both
    streams forever; this shape is what makes the join runnable on an
    unbounded 100 TB/day feed.

    ``how='inner'`` emits matches as soon as both rows arrive;
    ``how='leftOuter'`` additionally emits unmatched left rows
    null-padded once the watermark proves no match can still arrive.
    ``right_ts`` must differ from ``left_ts`` (rename upstream) so the
    output is unambiguous; the join key keeps one column.
    """
    if left_ts == right_ts:
        raise ValueError(
            "streaming_interval_join: rename one side's event-time "
            f"column — both are {left_ts!r}"
        )
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark).withColumnRenamed(
        key, "__rkey"
    )
    cond = (
        (F.col(key) == F.col("__rkey"))
        & (
            F.col(right_ts)
            >= F.col(left_ts) - F.expr(f"INTERVAL {lower}")
        )
        & (
            F.col(right_ts)
            <= F.col(left_ts) + F.expr(f"INTERVAL {upper}")
        )
    )
    return lw.join(rw, cond, how).drop("__rkey")


def streaming_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts: str = "ts",
    key: str = "user_id",
    value: str = "value",
) -> DataFrame:
    """Gap-based session frames over a TRUE stream (the streaming
    sibling of the batch ``session_frames`` query, W2): Spark's native
    ``session_window`` merges events closer than ``gap`` into one
    growing window per key; a session is emitted exactly once, when
    the watermark passes its close (append mode). State per key is the
    open session's bounds — bounded by key cardinality, not history.
    DECIMAL accumulation keeps the emitted sums bit-stable under
    micro-batch re-planning."""
    w = events.withWatermark(ts, watermark)
    return (
        w.groupBy(F.col(key), F.session_window(F.col(ts), gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value).cast("decimal(25,6)"))
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            key,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )
