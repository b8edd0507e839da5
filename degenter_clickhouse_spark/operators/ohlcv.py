"""OHLCV candle construction, resampling, continuity, and gap fill.

Reference semantics reproduced (SURVEY.md §2.5 A7/A8, §2.6 W4/W5):

* A7 bar build (core/ohlcv.js:32-62): per (pool, minute) open=first,
  high=max, low=min, close=last, volume=sum, trades=count. The reference
  uses *arrival order* for first/last; this engine imposes an explicit
  deterministic order column (event time + sequence) as SURVEY.md §7
  requires.
* A8 resample (api/routes/tokens.js:1429-1486): bucket =
  intDiv(unix_ts, step)*step; open=argMin(open, ts), close=argMax(close,
  ts), high/low=max/min, sums for volume/trades. Duplicate input rows
  for the same minute are merged by the aggregation (ST6).
* W4 continuity (core/ohlcv.js:122-154): a candle's open is the previous
  candle's close — ``lag`` per pool. The carried open may legitimately
  fall outside [low, high] (core/ohlcv.js:142-144); we preserve that.
* W5 + spine gap fill (api/routes/tokens.js:1491-1558): missing buckets
  on the step grid are synthesized; fill='prev' carries the last close
  forward as a flat candle, fill='zero' emits zero-price candles.

Scale: everything is groupBy/window over (pool_id, bucket) — partial
aggregation map-side, one shuffle on pool_id. The gap-fill spine uses
``sequence``+``explode`` per pool (rows ∝ pools × buckets, generated
distributed, never on the driver).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bars(
    ticks: DataFrame,
    step_sec: int = 60,
    pool: str = "pool_id",
    price: str = "price",
    ts: str = "ts",
    seq: str | None = None,
    qty: str | Column | None = None,
) -> DataFrame:
    """Build OHLCV bars from ticks. ``seq`` breaks ties within a
    timestamp ((height, msg_index) in the reference model)."""
    order = F.struct(F.col(ts), F.col(seq)) if seq else F.col(ts)
    bucket = F.timestamp_seconds(
        (F.unix_timestamp(F.col(ts)) / step_sec).cast("long") * step_sec
    ).alias("bucket_start")
    vol = (
        F.lit(0.0)
        if qty is None
        else (F.col(qty) if isinstance(qty, str) else qty)
    )
    return (
        ticks.groupBy(F.col(pool).alias("pool_id"), bucket)
        .agg(
            F.min_by(F.col(price), order).alias("open"),
            F.max(F.col(price)).alias("high"),
            F.min(F.col(price)).alias("low"),
            F.max_by(F.col(price), order).alias("close"),
            F.sum(vol).alias("volume"),
            F.count(F.lit(1)).alias("trade_count"),
        )
    )


def resample(
    bars_df: DataFrame,
    step_sec: int,
    pool: str = "pool_id",
    bucket: str = "bucket_start",
) -> DataFrame:
    """1m bars -> N-second buckets; also merges duplicate (pool, bucket)
    rows, which the reference tolerates in storage (ST6)."""
    b = F.col(bucket)
    new_bucket = F.timestamp_seconds(
        (F.unix_timestamp(b) / step_sec).cast("long") * step_sec
    ).alias("bucket_start")
    return (
        bars_df.groupBy(F.col(pool).alias("pool_id"), new_bucket)
        .agg(
            F.min_by(F.col("open"), b).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by(F.col("close"), b).alias("close"),
            F.sum("volume").alias("volume"),
            F.sum("trade_count").alias("trade_count"),
        )
    )


def with_carried_open(
    bars_df: DataFrame,
    pool: str = "pool_id",
    bucket: str = "bucket_start",
) -> DataFrame:
    """W4: open := previous candle's close (first candle keeps its own
    open). Deliberately may fall outside [low, high]."""
    w = Window.partitionBy(pool).orderBy(bucket)
    prev_close = F.lag("close").over(w)
    return bars_df.withColumn("open", F.coalesce(prev_close, F.col("open")))


def gap_fill(
    bars_df: DataFrame,
    step_sec: int,
    fill: str = "prev",
    pool: str = "pool_id",
    bucket: str = "bucket_start",
    materialize_input: bool = False,
) -> DataFrame:
    """Densify each pool's bar series onto the step grid between its
    first and last bucket.

    fill='prev': synthetic candles are flat at the carried close with
    zero volume/trades (reference fill=prev, api/routes/tokens.js:1524-1535).
    fill='zero': synthetic candles are all-zero (fill=zero, :1536-1546).
    fill='interp': synthetic closes interpolate linearly between the
    bracketing real closes (ClickHouse ORDER BY ... WITH FILL
    INTERPOLATE semantics — beyond the reference's two modes); each
    gap candle opens at the previous interpolated close, so the
    synthetic segment is continuous. The interpolation is pointwise
    double arithmetic in a fixed association — prev + ((next - prev)
    * j) / n — bit-identical across engines and shuffle orders.
    Real candles additionally get open := carried prev close, and
    high/low widened to include it (:1520-1523).

    ``materialize_input`` lazily localCheckpoints the bars so the real-
    row branch and the gap branch share one computation instead of
    re-aggregating the tick source twice (bars output is series-sized —
    cheap to hold; batch contexts only).

    Plan shape (the 100 TB concern): gap candles between consecutive
    real bars depend only on the PRECEDING bar, so they are generated
    locally from ``lead(bucket)`` — one window shuffle on ``pool``
    total. The earlier calendar-spine form paid a (pool, bucket) join
    against a generated grid plus a separate window pass: three
    exchanges where one suffices, and the join's build side grows with
    the grid, not the data.
    """
    if materialize_input:
        bars_df = bars_df.localCheckpoint(eager=False)
    out_cols = [pool, bucket, "open", "high", "low", "close", "volume", "trade_count"]
    if fill == "none":
        return bars_df.select(*out_cols).withColumn("is_gap", F.lit(False))
    step = F.expr(f"INTERVAL {step_sec} SECONDS")
    w = Window.partitionBy(pool).orderBy(bucket)
    b = bars_df.withColumn("__prev_close", F.lag("close").over(w)).withColumn(
        "__next", F.lead(bucket).over(w)
    )
    gap_bucket = F.explode(
        F.sequence(F.col(bucket) + step, F.col("__next") - step, step)
    )
    has_gap = F.col("__next").isNotNull() & (F.col("__next") > F.col(bucket) + step)
    if fill == "prev":
        opn = F.coalesce(F.col("__prev_close"), F.col("open"))
        real = b.select(
            F.col(pool),
            F.col(bucket),
            opn.alias("open"),
            F.greatest(F.col("high"), opn).alias("high"),
            F.least(F.col("low"), opn).alias("low"),
            F.col("close"),
            F.col("volume"),
            F.col("trade_count"),
            F.lit(False).alias("is_gap"),
        )
        flat = F.col("close")  # the carried close, flat candle
        gaps = b.filter(has_gap).select(
            F.col(pool),
            gap_bucket.alias(bucket),
            flat.alias("open"),
            flat.alias("high"),
            flat.alias("low"),
            flat.alias("close"),
            F.lit(0.0).alias("volume"),
            F.lit(0).cast("long").alias("trade_count"),
            F.lit(True).alias("is_gap"),
        )
        return real.unionByName(gaps)
    if fill == "interp":
        b = b.withColumn("__next_close", F.lead("close").over(w))
        opn = F.coalesce(F.col("__prev_close"), F.col("open"))
        real = b.select(
            F.col(pool),
            F.col(bucket),
            opn.alias("open"),
            F.greatest(F.col("high"), opn).alias("high"),
            F.least(F.col("low"), opn).alias("low"),
            F.col("close"),
            F.col("volume"),
            F.col("trade_count"),
            F.lit(False).alias("is_gap"),
        )
        g = (
            b.filter(has_gap)
            .select(
                F.col(pool),
                F.col(bucket).alias("__a"),
                F.col("__next"),
                F.col("close").alias("__ca"),
                F.col("__next_close").alias("__cb"),
                gap_bucket.alias(bucket),
            )
            .withColumn(
                "__n",
                F.expr(
                    f"(unix_timestamp(__next) - unix_timestamp(__a))"
                    f" div {step_sec}"
                ),
            )
            .withColumn(
                "__j",
                F.expr(
                    f"(unix_timestamp({bucket}) - unix_timestamp(__a))"
                    f" div {step_sec}"
                ),
            )
        )
        diff = F.col("__cb") - F.col("__ca")
        nd = F.col("__n").cast("double")
        close_i = F.col("__ca") + (diff * F.col("__j").cast("double")) / nd
        open_i = F.col("__ca") + (
            diff * (F.col("__j") - 1).cast("double")
        ) / nd
        gaps = g.select(
            F.col(pool),
            F.col(bucket),
            open_i.alias("open"),
            F.greatest(open_i, close_i).alias("high"),
            F.least(open_i, close_i).alias("low"),
            close_i.alias("close"),
            F.lit(0.0).alias("volume"),
            F.lit(0).cast("long").alias("trade_count"),
            F.lit(True).alias("is_gap"),
        )
        return real.unionByName(gaps)
    if fill == "zero":
        zero = F.lit(0.0)
        real = b.select(*[F.col(c) for c in out_cols], F.lit(False).alias("is_gap"))
        gaps = b.filter(has_gap).select(
            F.col(pool),
            gap_bucket.alias(bucket),
            zero.alias("open"),
            zero.alias("high"),
            zero.alias("low"),
            zero.alias("close"),
            zero.alias("volume"),
            F.lit(0).cast("long").alias("trade_count"),
            F.lit(True).alias("is_gap"),
        )
        return real.unionByName(gaps)
    raise ValueError(f"unknown fill mode: {fill!r}")


def change_pct(
    series: DataFrame,
    cutoff: Column,
    pool: str = "pool_id",
    value: str = "close",
    ts: str = "bucket_start",
    seq: str | None = None,
) -> DataFrame:
    """B12 (api/util/pool-select.js:84-126): per pool,
    (latest value − value at-or-before cutoff) / previous × 100.
    ``seq`` breaks timestamp ties deterministically."""
    ordc = F.struct(F.col(ts), F.col(seq)) if seq else F.col(ts)
    latest = F.max_by(F.col(value), ordc).alias("last_value")
    in_window = F.col(ts) <= cutoff
    prev = F.max_by(
        F.when(in_window, F.col(value)),
        F.when(in_window, ordc),
    ).alias("prev_value")
    out = series.groupBy(pool).agg(latest, prev)
    return out.select(
        F.col(pool),
        F.col("last_value"),
        F.col("prev_value"),
        F.when(
            F.col("prev_value").isNotNull() & (F.col("prev_value") != 0),
            (F.col("last_value") - F.col("prev_value"))
            / F.col("prev_value")
            * 100.0,
        ).alias("change_pct"),
    )
