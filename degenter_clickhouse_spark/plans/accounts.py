"""Wallet/watchlist serving plans (phase3schema.sql:272-316) and the
metadata-refresh scheduler (jobs/meta-refresher.js).

Watchlist rows join the token matrix (the list a user watches, with
live stats); the wallet page is the per-signer leaderboard slice plus
its trade feed (assembled by the engine facade). The meta-refresh
queue is the reference's stalest-K scheduler: NULL-metadata tokens
first by priority (IBC denoms first — O7), then by staleness (O6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def watchlist_view(
    watchlist: DataFrame, token_matrix: DataFrame, wallet_id: int
) -> DataFrame:
    """A wallet's watched tokens with their current rollup stats."""
    w = watchlist.filter(F.col("wallet_id") == wallet_id).select("token_id", "added_at")
    return (
        w.join(token_matrix, "token_id", "left")
        .orderBy(F.col("added_at").desc(), F.col("token_id"))
    )


def wallet_summary(trades: DataFrame, address: str, now: Column, minutes: int) -> DataFrame:
    """Per-wallet stats slice (count, volume, PnL over the window) —
    the leaderboard aggregation scoped to one signer."""
    from . import leaderboards as LB

    return LB.leaderboard(trades, now, minutes).filter(F.col("signer") == address)


def meta_refresh_queue(tokens: DataFrame, k: int = 3) -> DataFrame:
    """F8 + O6/O7 (jobs/meta-refresher.js:90-117): tokens missing any
    metadata, IBC denoms prioritized, then stalest-first (token_id desc
    as the tiebreaker the reference uses)."""
    missing = tokens.filter(
        F.col("name").isNull()
        | F.col("symbol").isNull()
        | F.col("display").isNull()
        | F.col("exponent").isNull()
    )
    return (
        missing.orderBy(
            F.col("denom").startswith("ibc/").desc(), F.col("token_id").desc()
        )
        .limit(k)
        .select("token_id", "denom", "name", "symbol")
    )
