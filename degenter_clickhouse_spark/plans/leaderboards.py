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
    t = _zig_legs(
        trades.filter(
            (F.col("action") == "swap")
            & (F.col("signer") != "")
            & (F.col("created_at") >= now - F.expr(f"INTERVAL {minutes} MINUTES"))
        )
    )
    return t.groupBy("signer").agg(
        F.count(F.lit(1)).alias("trades"),
        F.sum(F.col("offer_zig") + F.col("return_zig")).alias("volume_zig"),
        F.sum(F.col("return_zig") - F.col("offer_zig")).alias("gross_pnl_zig"),
    )


def large_trades(
    trades: DataFrame, now: Column, minutes: int, min_zig: float = 1000.0
) -> DataFrame:
    t = _zig_legs(
        trades.filter(
            (F.col("action") == "swap")
            & (F.col("created_at") >= now - F.expr(f"INTERVAL {minutes} MINUTES"))
        )
    )
    t = t.withColumn("value_zig", F.greatest("offer_zig", "return_zig"))
    big = t.filter(F.col("value_zig") >= min_zig)
    return dedupe.keep_latest(
        big,
        keys=["tx_hash", "pool_id", "direction"],
        order=["created_at", "msg_index"],
    ).select(
        "pool_id", "tx_hash", "direction", "signer", "value_zig", "created_at"
    )
