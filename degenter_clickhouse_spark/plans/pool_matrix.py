"""Pool matrix rollup (SURVEY.md §3.2; jobs/matrix-rollups.js:27-236).

Per pool per trailing bucket {30m, 1h, 4h, 24h}: buy/sell volumes in
ZIG display units, tx counts, unique traders, latest price, and TVL
with the reference's price fallback chain (direct pool price -> any
native pool of the token -> last OHLCV close -> 0).

Spark shape: one DataFrame DAG per bucket — trades filtered by the
trailing predicate (partition-pruned on dt at scale), conditional
aggregation with map-side combine, then broadcast joins against the
dimension-sized latest-price/state views. The reference recomputes all
four buckets every 60 s; here ``rollup_all`` unions the four bucket
plans so one scan of trades serves all buckets (Catalyst reuses the
exchange under AQE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import schemas as S
from ..operators import latest
from . import views
from ..operators.joins import dim_broadcast

BUCKETS = {"30m": 30, "1h": 60, "4h": 240, "24h": 1440}


def _disp(amount: Column, exponent: Column) -> Column:
    return amount.cast("double") / F.pow(F.lit(10.0), F.coalesce(exponent, F.lit(S.UZIG_EXPONENT)))


def trade_volumes(
    trades: DataFrame,
    pools: DataFrame,
    tokens: DataFrame,
    now: Column,
    minutes: int,
    approx_traders: bool = False,
    prices: DataFrame | None = None,
) -> DataFrame:
    """CTE q + vol_enriched (jobs/matrix-rollups.js:30-91): per-pool
    conditional sums over the trailing window, scaled to ZIG display
    units. Buy volume = quote (offer) leg; sell volume = quote (ask)
    leg — the quote is uzig for native pools.

    ``approx_traders=True`` swaps exact distinct for HyperLogLog++ —
    the A3-at-scale variant (SURVEY.md §2.5): at 100 TB the exact
    distinct's per-group hash sets dominate the shuffle; HLL sketches
    are constant-size and mergeable. Hot-pool volume skew itself is
    benign here: sums/counts partial-aggregate map-side, so the hot
    pool ships one partial row per map task, not its raw rows (see
    operators/skew.salted_agg for the general pattern when an
    aggregate can't partial-aggregate).
    """
    from ..operators import skew

    # uniqExact(t.signer) — the reference does NOT exclude empty signers
    # (jobs/matrix-rollups.js:37), so neither do we ('' is a value).
    traders_agg = (
        skew.approx_distinct(F.col("signer"))
        if approx_traders
        else F.countDistinct(F.col("signer"))
    )
    # static dt partition prune (VERDICT r11 #1): the fact store is
    # dt-partitioned (engine.save, dt = to_date(created_at)) but
    # Catalyst cannot derive dt bounds from the created_at predicate —
    # without this, every trailing tick footer-reads all of history
    lo = now - F.expr(f"INTERVAL {minutes} MINUTES")
    t = views.prune_day_partition(trades, lo=lo, day_col="dt").filter(
        (F.col("action") == "swap") & (F.col("created_at") >= lo)
    )
    q = t.groupBy("pool_id").agg(
        F.sum(
            F.when(F.col("direction") == "buy", F.col("offer_amount_base")).otherwise(F.lit(0))
        ).alias("vol_buy_base"),
        F.sum(
            F.when(F.col("direction") == "sell", F.col("ask_amount_base")).otherwise(F.lit(0))
        ).alias("vol_sell_base"),
        F.count(F.when(F.col("direction") == "buy", 1)).alias("tx_buy"),
        F.count(F.when(F.col("direction") == "sell", 1)).alias("tx_sell"),
        traders_agg.alias("traders"),
    )
    return enrich_volumes(q, pools, tokens, prices)


def enrich_volumes(
    q: DataFrame,
    pools: DataFrame,
    tokens: DataFrame,
    prices: DataFrame | None = None,
) -> DataFrame:
    """vol_enriched tail shared by the direct rollup above and the
    partials-fed incremental path (plans/incremental.py): per-pool base
    sums (vol_buy_base, vol_sell_base, tx_buy, tx_sell, traders) ->
    ZIG display units via pool/token dims. One definition, so the two
    rollup paths cannot drift."""
    p = pools.select("pool_id", "base_token_id", "quote_token_id", "is_uzig_quote")
    qt = tokens.select(F.col("token_id").alias("quote_token_id"), F.col("exponent").alias("quote_exp"))
    enriched = q.join(dim_broadcast(p), "pool_id").join(dim_broadcast(qt), "quote_token_id", "left")
    # quote display units -> ZIG: native pools are already ZIG; non-uzig
    # quotes convert via the pool's OWN latest price_in_zig — LEFT JOIN
    # latest_prices ON pool_id, coalesce 0 (vol_enriched,
    # jobs/matrix-rollups.js:44-91)
    if prices is not None:
        ppx = views.latest_prices(prices).select(
            "pool_id", F.col("latest_price_zig").alias("pool_px_zig")
        )
        enriched = enriched.join(dim_broadcast(ppx), "pool_id", "left")
        quote_px = F.when(F.col("is_uzig_quote"), F.lit(1.0)).otherwise(
            F.coalesce(F.col("pool_px_zig"), F.lit(0.0))
        )
    else:
        quote_px = F.lit(1.0)  # raw quote display units
    return enriched.select(
        "pool_id",
        "base_token_id",
        "quote_token_id",
        "is_uzig_quote",
        (_disp(F.col("vol_buy_base"), F.col("quote_exp")) * quote_px).alias("vol_buy_zig"),
        (_disp(F.col("vol_sell_base"), F.col("quote_exp")) * quote_px).alias("vol_sell_zig"),
        "tx_buy",
        "tx_sell",
        "traders",
    )


def price_with_fallback(
    pools: DataFrame, prices: DataFrame, ohlcv_1m: DataFrame
) -> DataFrame:
    """Fallback chain (jobs/matrix-rollups.js:93-121): direct pool
    price -> latest price in ANY native pool of the base token -> last
    OHLCV close -> NULL (0 applied at TVL)."""
    direct = views.latest_prices(prices).select(
        "pool_id", F.col("latest_price_zig").alias("direct_price")
    )
    token_native = views.latest_token_prices(prices).select(
        F.col("token_id").alias("base_token_id"),
        F.col("latest_price_zig").alias("token_native_price"),
    )
    bar_last = latest.latest_by(
        ohlcv_1m, keys=["pool_id"], values=["close"], order=["bucket_start"]
    ).withColumnRenamed("close", "ohlcv_close")
    p = pools.select("pool_id", "base_token_id")
    return (
        p.join(dim_broadcast(direct), "pool_id", "left")
        .join(dim_broadcast(token_native), "base_token_id", "left")
        .join(dim_broadcast(bar_last), "pool_id", "left")
        .select(
            "pool_id",
            F.coalesce("direct_price", "token_native_price", "ohlcv_close").alias(
                "price_in_zig"
            ),
        )
    )


def pool_tvl(
    pools: DataFrame,
    tokens: DataFrame,
    pool_state: DataFrame,
    prices: DataFrame,
    ohlcv_1m: DataFrame,
) -> DataFrame:
    """A13 (jobs/matrix-rollups.js:123-189): tvl = Rq_disp * quote_px +
    Rb_disp * base_px, price fallbacks per leg, 0 when unknown."""
    state = views.latest_pool_state(pool_state)
    base_px = price_with_fallback(pools, prices, ohlcv_1m).withColumnRenamed(
        "price_in_zig", "base_px"
    )
    tok_px = views.latest_token_prices(prices).select(
        F.col("token_id").alias("quote_token_id"),
        F.col("latest_price_zig").alias("quote_px_lookup"),
    )
    bt = tokens.select(F.col("token_id").alias("base_token_id"), F.col("exponent").alias("base_exp"))
    qt = tokens.select(F.col("token_id").alias("quote_token_id"), F.col("exponent").alias("quote_exp"))
    p = pools.select("pool_id", "base_token_id", "quote_token_id", "is_uzig_quote")
    j = (
        p.join(dim_broadcast(state), "pool_id", "left")
        .join(dim_broadcast(base_px), "pool_id", "left")
        .join(dim_broadcast(tok_px), "quote_token_id", "left")
        .join(dim_broadcast(bt), "base_token_id", "left")
        .join(dim_broadcast(qt), "quote_token_id", "left")
    )
    quote_px = F.when(F.col("is_uzig_quote"), F.lit(1.0)).otherwise(
        F.coalesce(F.col("quote_px_lookup"), F.lit(0.0))
    )
    tvl = _disp(F.coalesce(F.col("reserve_quote_base"), F.lit(0)), F.col("quote_exp")) * quote_px + _disp(
        F.coalesce(F.col("reserve_base_base"), F.lit(0)), F.col("base_exp")
    ) * F.coalesce(F.col("base_px"), F.lit(0.0))
    return j.select("pool_id", tvl.alias("tvl_zig"))


def rollup(
    trades: DataFrame,
    pools: DataFrame,
    tokens: DataFrame,
    prices: DataFrame,
    pool_state: DataFrame,
    ohlcv_1m: DataFrame,
    now: Column,
    bucket: str,
    vols: DataFrame | None = None,
) -> DataFrame:
    """One bucket of the pool matrix. ``vols`` overrides the volume
    leg with a pre-computed enrich_volumes frame — the incremental
    partials path (plans/incremental.rollup_from_partials) supplies
    trailing_volumes output here so price/TVL logic stays single-
    sourced."""
    minutes = BUCKETS[bucket]
    if vols is None:
        vols = trade_volumes(trades, pools, tokens, now, minutes, prices=prices)
    px = price_with_fallback(pools, prices, ohlcv_1m)
    tvl = pool_tvl(pools, tokens, pool_state, prices, ohlcv_1m)
    base = pools.select("pool_id")
    out = (
        base.join(vols.drop("base_token_id", "quote_token_id", "is_uzig_quote"), "pool_id", "left")
        .join(dim_broadcast(px), "pool_id", "left")
        .join(dim_broadcast(tvl), "pool_id", "left")
    )
    return out.select(
        "pool_id",
        F.lit(bucket).alias("bucket"),
        F.coalesce("vol_buy_zig", F.lit(0.0)).alias("vol_buy_zig"),
        F.coalesce("vol_sell_zig", F.lit(0.0)).alias("vol_sell_zig"),
        F.coalesce("tx_buy", F.lit(0)).alias("tx_buy"),
        F.coalesce("tx_sell", F.lit(0)).alias("tx_sell"),
        F.coalesce("traders", F.lit(0)).alias("traders"),
        "price_in_zig",
        F.coalesce("tvl_zig", F.lit(0.0)).alias("tvl_zig"),
        now.alias("updated_at"),
    )


def rollup_all(
    trades: DataFrame,
    pools: DataFrame,
    tokens: DataFrame,
    prices: DataFrame,
    pool_state: DataFrame,
    ohlcv_1m: DataFrame,
    now: Column,
) -> DataFrame:
    out = None
    for bucket in BUCKETS:
        df = rollup(trades, pools, tokens, prices, pool_state, ohlcv_1m, now, bucket)
        out = df if out is None else out.unionByName(df)
    return out
