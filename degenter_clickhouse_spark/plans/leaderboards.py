"""Trader leaderboards + large-trade extraction
(jobs/leaderboards.js:16-152).

Leaderboard (A10): per signer over the trailing bucket — trade count,
volume = sum(offer_zig + return_zig), gross PnL = sum(return_zig −
offer_zig), where the zig legs are the uzig-denominated sides of each
swap. Empty signers excluded (F5).

Large trades (A15 + W1): swaps whose ZIG notional >= threshold,
deduped last-wins on (tx_hash, pool_id, direction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import schemas as S
from ..operators import dedupe


def _zig_legs(trades: DataFrame) -> DataFrame:
    """offer/return ZIG display amounts: the uzig side of each swap
    (jobs/leaderboards.js:46-60 sums toFloat64 of the uzig legs)."""
    offer_zig = F.when(
        F.col("offer_asset_denom") == S.UZIG,
        F.col("offer_amount_base").cast("double") / 1e6,
    ).otherwise(F.lit(0.0))
    return_zig = F.when(
        F.col("ask_asset_denom") == S.UZIG,
        F.col("return_amount_base").cast("double") / 1e6,
    ).otherwise(F.lit(0.0))
    return trades.withColumn("offer_zig", offer_zig).withColumn("return_zig", return_zig)


def leaderboard(trades: DataFrame, now: Column, minutes: int) -> DataFrame:
    # static dt prune first (VERDICT r11 #1): dt = to_date(created_at)
    # on the persisted fact layout, so the day bound is implied by the
    # created_at bound — it only turns the scan into a partition-pruned
    # one (wallet_summary inherits this through its delegation here)
    from . import views

    lo = now - F.expr(f"INTERVAL {minutes} MINUTES")
    t = _zig_legs(
        views.prune_day_partition(trades, lo=lo, day_col="dt").filter(
            (F.col("action") == "swap")
            & (F.col("signer") != "")
            & (F.col("created_at") >= lo)
        )
    )
    return t.groupBy("signer").agg(
        F.count(F.lit(1)).alias("trades"),
        F.sum(F.col("offer_zig") + F.col("return_zig")).alias("volume_zig"),
        F.sum(F.col("return_zig") - F.col("offer_zig")).alias("gross_pnl_zig"),
    )


def large_trades_all(trades: DataFrame, min_zig: float = 1000.0) -> DataFrame:
    """Un-windowed, un-deduped large-trade extraction: every swap row
    whose ZIG notional >= threshold, keeping (created_at, msg_index)
    so the W1 keep-latest dedupe can run AT READ. This is the
    store-maintenance form (the reference APPENDS to its large_trades
    table per bucket, jobs/leaderboards.js:129-142, and dedupes with
    ReplacingMergeTree semantics at query time); ``large_trades`` is
    the windowed read over it."""
    t = _zig_legs(trades.filter(F.col("action") == "swap"))
    t = t.withColumn("value_zig", F.greatest("offer_zig", "return_zig"))
    return t.filter(F.col("value_zig") >= min_zig).select(
        "pool_id", "tx_hash", "direction", "signer", "value_zig",
        "created_at", "msg_index",
    )


def large_trades_read(big: DataFrame, now: Column, minutes: int) -> DataFrame:
    """Windowed keep-latest read over ``large_trades_all`` rows — the
    window filter runs BEFORE the dedupe, exactly like the direct path
    (a key whose latest row falls outside the window still surfaces
    its latest IN-window row)."""
    # prune whichever day layout the source carries (the streamed
    # large-trades store is __day-partitioned, the raw fact table
    # dt-partitioned; the default handles both, no-op otherwise)
    from . import views

    lo = now - F.expr(f"INTERVAL {minutes} MINUTES")
    w = views.prune_day_partition(big, lo=lo).filter(
        F.col("created_at") >= lo
    )
    return dedupe.keep_latest(
        w,
        keys=["tx_hash", "pool_id", "direction"],
        order=["created_at", "msg_index"],
    ).select(
        "pool_id", "tx_hash", "direction", "signer", "value_zig", "created_at"
    )


def large_trades(
    trades: DataFrame, now: Column, minutes: int, min_zig: float = 1000.0
) -> DataFrame:
    # dt prune BEFORE the extraction: large_trades_all's projection
    # drops the partition column, so the windowed read downstream
    # could no longer prune the raw fact layout
    from . import views

    t = views.prune_day_partition(
        trades,
        lo=now - F.expr(f"INTERVAL {minutes} MINUTES"),
        day_col="dt",
    )
    return large_trades_read(large_trades_all(t, min_zig), now, minutes)
