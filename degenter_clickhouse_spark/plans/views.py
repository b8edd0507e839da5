"""Canonical decorrelated views (SURVEY.md §7 M2).

These four views are the architectural answer to the reference's
correlated latest-row lookups (J5/J6, api/routes/trades.js:295,410-416):
downstream plans join these instead of ever generating a correlated
``ORDER BY updated_at DESC LIMIT 1``. Each is one max_by aggregation —
dimension-sized output, always broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import latest


def prune_day_partition(
    df: DataFrame,
    lo=None,
    hi=None,
    day_col: str | tuple[str, ...] = ("__day", "dt"),
) -> DataFrame:
    """Planning-time partition prune for a day-partitioned store: the
    serving filters bound a TIMESTAMP column (bucket_start /
    created_at / updated_at), which Catalyst cannot translate into
    partition pruning on ``day = to_date(ts)`` by itself — derive the
    day bounds explicitly (the exact timestamp filter still applies
    after). The default tries BOTH day layouts the engine produces
    (streamed stores partition by ``__day``, ``engine.save`` fact
    tables by ``dt`` — VERDICT r11 #1 found the trades reads missing
    the latter; the ohlcv reads had the same gap) and no-ops for
    frames carrying neither (in-memory tables, legacy flat stores),
    so every plan stays valid on every layout. ``lo``/``hi`` are
    timestamp Columns or literals; whole days containing them are
    kept."""
    cols = (day_col,) if isinstance(day_col, str) else tuple(day_col)
    for c in cols:
        if c not in df.columns:
            continue
        if lo is not None:
            df = df.filter(F.col(c) >= F.to_date(lo))
        if hi is not None:
            df = df.filter(F.col(c) <= F.to_date(hi))
    return df


def latest_prices(prices: DataFrame) -> DataFrame:
    """argMax(price_in_zig, updated_at) per pool
    (jobs/matrix-rollups.js:45-51)."""
    return latest.latest_by(
        prices, keys=["pool_id"], values=["price_in_zig", "updated_at"],
        order=["updated_at"],
    ).withColumnRenamed("price_in_zig", "latest_price_zig")


def latest_token_prices(prices: DataFrame) -> DataFrame:
    """Latest price per *token* across its native pools — the J5
    correlated-subquery decorrelation (quote-price lookups)."""
    native = prices.filter(F.col("is_pair_native"))
    return latest.latest_by(
        native, keys=["token_id"], values=["price_in_zig", "updated_at"],
        order=["updated_at"],
    ).withColumnRenamed("price_in_zig", "latest_price_zig")


def latest_token_prices_all(prices: DataFrame) -> DataFrame:
    """Latest price per token over ALL pools (no is_pair_native
    filter) — the exact decorrelation of the reference's correlated
    probe (api/routes/trades.js:295), which scans the whole prices
    table. ``latest_token_prices`` (native-only) is the curated quote
    view; this one exists so the SQL-compat rewrite preserves the
    original query's semantics bit-for-bit."""
    return latest.latest_by(
        prices, keys=["token_id"], values=["price_in_zig", "updated_at"],
        order=["updated_at"],
    ).withColumnRenamed("price_in_zig", "latest_price_zig")


def latest_pool_state(pool_state: DataFrame) -> DataFrame:
    """Latest reserves per pool (core/pool_state.js:5-36 read side)."""
    return latest.latest_by(
        pool_state,
        keys=["pool_id"],
        values=["reserve_base_base", "reserve_quote_base", "updated_at"],
        order=["updated_at"],
    )


def latest_security(token_security: DataFrame) -> DataFrame:
    """ReplacingMergeTree(checked_at) read state
    (jobs/token-security.js:29-31)."""
    return latest.latest_row(token_security, keys=["token_id"], order=["checked_at"])


def holders_counts(holders: DataFrame) -> DataFrame:
    """holders-per-token with the balance>0 filter (F6,
    jobs/matrix-rollups.js:295-302)."""
    return (
        holders.filter(F.col("balance_base") > 0)
        .groupBy("token_id")
        .agg(F.count(F.lit(1)).alias("holders"))
    )
