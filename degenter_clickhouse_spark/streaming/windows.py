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
