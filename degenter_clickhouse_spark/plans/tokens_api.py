"""Token read-side plans (api/routes/tokens.js; SURVEY.md §3.3).

``ohlcv_series`` is the full GET /tokens/:id/ohlcv pipeline: pool-set
selection happens upstream (all | pool | best via plans.swap), then
1m candles are merged across the selected pools, resampled to the
requested step, gap-filled on the [from, to) grid with prev-close
seeding (the reference's JS gap-fill loop becomes a calendar-spine
join), and unit-transformed (native | usd | mcap).

Scale: the 1m source is partition-pruned by (dt, pool_id); the spine is
rows ∝ window/step — generated, not scanned; every join after the
resample touches series-sized data only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import topk
from ..operators.joins import dim_broadcast


def _bucket(col: Column, step_sec: int) -> Column:
    return F.timestamp_seconds(
        (F.unix_timestamp(col) / step_sec).cast("long") * step_sec
    )


def ohlcv_series(
    ohlcv_1m: DataFrame,
    pool_ids: list[int] | DataFrame,
    step_sec: int,
    ts_from: Column,
    ts_to: Column,
    fill: str = "prev",
    zig_usd: Column | None = None,
    circ_supply_disp: Column | None = None,
) -> DataFrame:
    """One merged candle series for a token (api/routes/tokens.js:
    1414-1576). fill ∈ {prev, zero, none}; unit transforms applied when
    ``zig_usd`` (usd mode) / ``circ_supply_disp`` (mcap mode) given.

    ``pool_ids`` is either a literal id list or a DataFrame with a
    ``pool_id`` column — the relational form keeps pool selection
    (e.g. best-pool-by-simulation) inside the plan as a broadcast
    semi join instead of a driver-side collect + isin."""
    from .views import prune_day_partition

    if isinstance(pool_ids, DataFrame):
        src = ohlcv_1m.join(
            dim_broadcast(pool_ids.select("pool_id").distinct()),
            "pool_id",
            "left_semi",
        )
    else:
        src = ohlcv_1m.filter(F.col("pool_id").isin(pool_ids))
    # the explicit-range leg prunes whole day partitions at planning
    # time on a __day-partitioned store; the W5 seed below keeps the
    # unpruned src (it looks arbitrarily far back for the last close)
    in_window = prune_day_partition(src, lo=ts_from, hi=ts_to).filter(
        (F.col("bucket_start") >= ts_from) & (F.col("bucket_start") < ts_to)
    )
    ordc = F.struct(F.col("bucket_start"), F.col("pool_id"))
    resampled = (
        in_window.withColumn("bucket", _bucket(F.col("bucket_start"), step_sec))
        .groupBy("bucket")
        .agg(
            F.min_by(F.col("open"), ordc).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by(F.col("close"), ordc).alias("close"),
            F.sum("volume_zig").alias("volume"),
            F.sum("trade_count").alias("trade_count"),
        )
    )
    # W5 seed: last close strictly before the window start
    seed = (
        src.filter(F.col("bucket_start") < ts_from)
        .agg(F.max_by(F.col("close"), ordc).alias("close"))
        .select(
            (ts_from - F.expr(f"INTERVAL {step_sec} SECONDS")).alias("bucket"),
            F.lit(None).cast("double").alias("open"),
            F.lit(None).cast("double").alias("high"),
            F.lit(None).cast("double").alias("low"),
            "close",
            F.lit(None).cast("double").alias("volume"),
            F.lit(None).cast("long").alias("trade_count"),
        )
        .filter(F.col("close").isNotNull())
    )
    series = resampled.unionByName(seed)
    spine = spark_range_spine(series, ts_from, ts_to, step_sec)
    joined = spine.join(series, "bucket", "left")
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    prev_close = F.last(F.col("close"), ignorenulls=True).over(w)
    is_gap = F.col("trade_count").isNull()
    if fill == "prev":
        opn = F.coalesce(prev_close, F.col("open"))
        out = joined.select(
            "bucket",
            opn.alias("open"),
            F.greatest(F.coalesce(F.col("high"), prev_close), opn).alias("high"),
            F.least(F.coalesce(F.col("low"), prev_close), opn).alias("low"),
            F.coalesce(F.col("close"), prev_close).alias("close"),
            F.coalesce(F.col("volume"), F.lit(0.0)).alias("volume"),
            F.coalesce(F.col("trade_count"), F.lit(0)).alias("trade_count"),
            is_gap.alias("is_gap"),
        )
    elif fill == "zero":
        z = F.lit(0.0)
        out = joined.select(
            "bucket",
            F.coalesce(F.col("open"), z).alias("open"),
            F.coalesce(F.col("high"), z).alias("high"),
            F.coalesce(F.col("low"), z).alias("low"),
            F.coalesce(F.col("close"), z).alias("close"),
            F.coalesce(F.col("volume"), z).alias("volume"),
            F.coalesce(F.col("trade_count"), F.lit(0)).alias("trade_count"),
            is_gap.alias("is_gap"),
        )
    else:  # none
        out = joined.filter(~is_gap).withColumn("is_gap", F.lit(False))
    # drop the synthetic seed row (sits before the window)
    out = out.filter(F.col("bucket") >= ts_from)
    scale = None
    if zig_usd is not None:
        scale = zig_usd
    if circ_supply_disp is not None:
        scale = circ_supply_disp if scale is None else scale * circ_supply_disp
    if scale is not None:
        for c in ("open", "high", "low", "close"):
            out = out.withColumn(c, F.col(c) * scale)
    return out


def spark_range_spine(
    series: DataFrame, ts_from: Column, ts_to: Column, step_sec: int
) -> DataFrame:
    """[from, to) step grid as one-column DataFrame (distributed
    sequence+explode — no driver loop). An EMPTY window (from >= to)
    yields zero rows: Spark's sequence() counts DOWN for inverted
    bounds and aborts on an inverted step, so a degenerate range (e.g.
    the push server's forming fetch one second into a fresh bucket)
    must short-circuit explicitly."""
    spine = F.when(
        ts_from < ts_to,
        F.sequence(
            ts_from,
            ts_to - F.expr("INTERVAL 1 SECONDS"),
            F.expr(f"INTERVAL {step_sec} SECONDS"),
        ),
    ).otherwise(F.array().cast("array<timestamp>"))
    return series.sparkSession.range(1).select(F.explode(spine).alias("bucket"))


def forming_bar(
    ohlcv_1m: DataFrame,
    pool_ids: list[int],
    step_sec: int,
    now: Column,
) -> DataFrame:
    """ST9 (api/ws.js:118-169): the still-open candle for tf > 1m,
    synthesized by aggregating 1m bars since the current bucket start.
    One row (or zero if the bucket has no trades yet)."""
    from .views import prune_day_partition

    bucket_start = _bucket(now, step_sec)
    src = prune_day_partition(ohlcv_1m, lo=bucket_start, hi=now).filter(
        F.col("pool_id").isin(pool_ids)
        & (F.col("bucket_start") >= bucket_start)
        & (F.col("bucket_start") <= now)
    )
    ordc = F.struct(F.col("bucket_start"), F.col("pool_id"))
    return src.groupBy().agg(
        F.min_by(F.col("open"), ordc).alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by(F.col("close"), ordc).alias("close"),
        F.sum("volume_zig").alias("volume"),
        F.sum("trade_count").alias("trade_count"),
    ).select(bucket_start.alias("bucket"), "*").filter(F.col("trade_count").isNotNull())


SORT_KEYS = {
    "volume": lambda: F.coalesce(F.col("vol_buy_zig") + F.col("vol_sell_zig"), F.lit(0.0)),
    "tx": lambda: F.coalesce(F.col("tx_buy") + F.col("tx_sell"), F.lit(0)),
    "price": lambda: F.coalesce(F.col("price_in_zig"), F.lit(0.0)),
    "holders": lambda: F.coalesce(F.col("holders"), F.lit(0)),
    "mcap": lambda: F.coalesce(F.col("mcap_zig"), F.lit(0.0)),
}


def token_list(
    token_matrix: DataFrame,
    sort: str = "volume",
    desc: bool = True,
    limit: int = 50,
    offset: int = 0,
    with_total: bool = True,
) -> DataFrame:
    """O1/O2/A12 (api/routes/tokens.js:187-242): dynamic sort key,
    clamped pagination, optional grand total."""
    limit = min(limit, 200)
    key = SORT_KEYS[sort]()
    order = [key.desc() if desc else key.asc(), F.col("token_id").asc()]
    return topk.paginate(token_matrix, order, limit, offset, with_total)


def gainers_losers(
    ohlcv_1m: DataFrame,
    pools: DataFrame,
    cutoff: Column,
    n: int = 10,
) -> DataFrame:
    """O5 without the oversampling hack: change% per token from its
    native pools' candles, full relational top/bottom-N."""
    native = pools.filter(F.col("is_uzig_quote")).select(
        "pool_id", F.col("base_token_id").alias("token_id")
    )
    series = ohlcv_1m.join(dim_broadcast(native), "pool_id")
    ordc = F.struct(F.col("bucket_start"), F.col("pool_id"))
    per_token = series.groupBy("token_id").agg(
        F.max_by(F.col("close"), ordc).alias("last_close"),
        F.max_by(
            F.when(F.col("bucket_start") <= cutoff, F.col("close")),
            F.when(F.col("bucket_start") <= cutoff, ordc),
        ).alias("prev_close"),
    )
    ch = per_token.filter(
        F.col("prev_close").isNotNull() & (F.col("prev_close") != 0)
    ).select(
        "token_id",
        "last_close",
        "prev_close",
        ((F.col("last_close") - F.col("prev_close")) / F.col("prev_close") * 100).alias(
            "change_pct"
        ),
    )
    g = (
        ch.orderBy(F.col("change_pct").desc(), F.col("token_id"))
        .limit(n)
        .withColumn("side", F.lit("gainer"))
    )
    lo = (
        ch.orderBy(F.col("change_pct").asc(), F.col("token_id"))
        .limit(n)
        .withColumn("side", F.lit("loser"))
    )
    return g.unionByName(lo)
