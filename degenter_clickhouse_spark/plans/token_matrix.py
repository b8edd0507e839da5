"""Token matrix rollup (jobs/matrix-rollups.js:242-336): per token,
aggregated over its native (uzig-quoted) pools — volumes/tx/traders
summed, price = latest across native pools with the REBASING GUARD,
holders count, mcap/FDV.

Rebasing guard (A14, jobs/matrix-rollups.js:272-288): when the prices
feed disagrees with OHLCV by a factor in [1e5, 1e7] and the token
exponent is 6, the feed price is divided by 1e6 (a token that rebased
its base units without republishing metadata).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import schemas as S
from ..operators import latest
from . import pool_matrix as PM
from . import views
from ..operators.joins import dim_broadcast


def token_price_guarded(
    pools: DataFrame,
    prices: DataFrame,
    ohlcv_1m: DataFrame,
    tokens: DataFrame,
    now: Column | None = None,
) -> DataFrame:
    """Latest native-pool price per token, with the rebasing sanity
    check against the 60-minute average OHLCV close
    (jobs/matrix-rollups.js:256-264: ``bucket_start >= now() -
    toIntervalMinute(60)``). With ``now`` the avg is bounded to that
    trailing hour — at 100 TB the unbounded form re-averages all of
    candle history every 60 s tick; the bound also day-prunes a
    partitioned store at planning. ``now=None`` keeps the unbounded
    average (whole-frame semantics for ad-hoc use)."""
    tok_px = views.latest_token_prices(prices).select(
        "token_id", F.col("latest_price_zig").alias("feed_px")
    )
    native_pools = pools.filter(F.col("is_uzig_quote")).select(
        "pool_id", F.col("base_token_id").alias("token_id")
    )
    bars = ohlcv_1m
    if now is not None:
        lo = now - F.expr("INTERVAL 60 MINUTES")
        bars = views.prune_day_partition(bars, lo=lo).filter(
            F.col("bucket_start") >= lo
        )
    bar_px = (
        bars.join(dim_broadcast(native_pools), "pool_id")
        .groupBy("token_id")
        .agg(F.avg("close").alias("bar_px"))
    )
    exp = tokens.select("token_id", "exponent")
    j = tok_px.join(dim_broadcast(bar_px), "token_id", "left").join(
        dim_broadcast(exp), "token_id", "left"
    )
    ratio = F.col("feed_px") / F.col("bar_px")
    rebased = (
        F.col("bar_px").isNotNull()
        & (F.col("bar_px") != 0)
        & (F.coalesce(F.col("exponent"), F.lit(S.UZIG_EXPONENT)) == S.UZIG_EXPONENT)
        & (ratio >= 1e5)
        & (ratio <= 1e7)
    )
    return j.select(
        "token_id",
        F.when(rebased, F.col("feed_px") / 1e6).otherwise(F.col("feed_px")).alias(
            "price_in_zig"
        ),
        rebased.alias("rebasing_adjusted"),
    )


def rollup(
    trades: DataFrame,
    pools: DataFrame,
    tokens: DataFrame,
    prices: DataFrame,
    holders: DataFrame,
    ohlcv_1m: DataFrame,
    now: Column,
    bucket: str,
    vols: DataFrame | None = None,
    traders: DataFrame | None = None,
) -> DataFrame:
    """``vols``/``traders`` override the trades-derived legs so the
    CDC partials path (plans/incremental.token_rollup_from_partials)
    reuses THIS price/supply/holders logic unchanged — the same
    single-sourcing pool_matrix.rollup uses. With overrides set,
    ``trades`` may be None."""
    minutes = PM.BUCKETS[bucket]
    if vols is None:
        vols = PM.trade_volumes(trades, pools, tokens, now, minutes, prices=prices)
    per_token_vols = (
        vols.filter(F.col("is_uzig_quote"))
        .groupBy(F.col("base_token_id").alias("token_id"))
        .agg(
            F.sum("vol_buy_zig").alias("vol_buy_zig"),
            F.sum("vol_sell_zig").alias("vol_sell_zig"),
            F.sum("tx_buy").alias("tx_buy"),
            F.sum("tx_sell").alias("tx_sell"),
        )
    )
    # traders must be uniqExact per TOKEN over its native pools — a
    # sum of per-pool uniques would double-count multi-pool traders
    if traders is None:
        native = pools.filter(F.col("is_uzig_quote")).select(
            "pool_id", F.col("base_token_id").alias("token_id")
        )
        lo = now - F.expr(f"INTERVAL {minutes} MINUTES")
        traders = (
            views.prune_day_partition(trades, lo=lo)
            .filter((F.col("action") == "swap") & (F.col("created_at") >= lo))
            .join(dim_broadcast(native), "pool_id")
            .groupBy("token_id")
            .agg(
                F.countDistinct(
                    F.when(F.col("signer") != "", F.col("signer"))
                ).alias("traders")
            )
        )
    per_token = per_token_vols.join(traders, "token_id", "left")
    px = token_price_guarded(pools, prices, ohlcv_1m, tokens, now=now)
    hc = views.holders_counts(holders)
    t = tokens.select(
        "token_id",
        "denom",
        "exponent",
        "max_supply_base",
        "total_supply_base",
    )
    j = (
        t.join(per_token, "token_id", "left")
        .join(dim_broadcast(px), "token_id", "left")
        .join(dim_broadcast(hc), "token_id", "left")
    )
    circ_disp = F.col("total_supply_base").cast("double") / F.pow(
        F.lit(10.0), F.coalesce(F.col("exponent"), F.lit(S.UZIG_EXPONENT))
    )
    max_disp = F.col("max_supply_base").cast("double") / F.pow(
        F.lit(10.0), F.coalesce(F.col("exponent"), F.lit(S.UZIG_EXPONENT))
    )
    return j.select(
        "token_id",
        "denom",
        F.lit(bucket).alias("bucket"),
        F.coalesce("vol_buy_zig", F.lit(0.0)).alias("vol_buy_zig"),
        F.coalesce("vol_sell_zig", F.lit(0.0)).alias("vol_sell_zig"),
        F.coalesce("tx_buy", F.lit(0)).alias("tx_buy"),
        F.coalesce("tx_sell", F.lit(0)).alias("tx_sell"),
        F.coalesce("traders", F.lit(0)).alias("traders"),
        "price_in_zig",
        F.coalesce("rebasing_adjusted", F.lit(False)).alias("rebasing_adjusted"),
        F.coalesce("holders", F.lit(0)).alias("holders"),
        (circ_disp * F.col("price_in_zig")).alias("mcap_zig"),
        (max_disp * F.col("price_in_zig")).alias("fdv_zig"),
        now.alias("updated_at"),
    )
