"""Swap route selection (api/routes/swap.js; SURVEY.md §2.11 B1-B4).

Candidate pools for a token = its uzig-quoted pools joined with latest
reserves + 24h matrix (J13) and filtered by a TVL floor (F10); the
route chosen is the argmax of simulated output across candidates (B3)
— ``max_by(struct, sim_out)`` instead of a driver-side loop, so a
whole token list can be routed in one plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import schemas as S
from ..functions import business
from . import views


def candidate_pools(
    pools: DataFrame,
    tokens: DataFrame,
    pool_state: DataFrame,
    pool_matrix_24h: DataFrame | None = None,
    min_tvl_zig: float = 0.0,
) -> DataFrame:
    """loadUzigPoolsForToken (api/routes/swap.js:64-127): native pools
    with display reserves, fee, and optional 24h stats."""
    state = views.latest_pool_state(pool_state)
    bt = tokens.select(
        F.col("token_id").alias("base_token_id"), F.col("exponent").alias("base_exp")
    )
    p = pools.filter(F.col("is_uzig_quote")).select(
        "pool_id", "pair_contract", "base_token_id", "pair_type"
    )
    j = p.join(F.broadcast(state), "pool_id", "left").join(F.broadcast(bt), "base_token_id", "left")
    rz = F.coalesce(F.col("reserve_quote_base").cast("double"), F.lit(0.0)) / F.pow(
        F.lit(10.0), F.lit(S.UZIG_EXPONENT)
    )
    rt = F.coalesce(F.col("reserve_base_base").cast("double"), F.lit(0.0)) / F.pow(
        F.lit(10.0), F.coalesce(F.col("base_exp"), F.lit(S.UZIG_EXPONENT))
    )
    out = j.select(
        "pool_id",
        "pair_contract",
        "base_token_id",
        "pair_type",
        rz.alias("reserve_zig"),
        rt.alias("reserve_token"),
        business.pair_fee(F.col("pair_type")).alias("fee"),
        (rz * 2).alias("tvl_zig_approx"),
    )
    if pool_matrix_24h is not None:
        pm = pool_matrix_24h.select("pool_id", "tvl_zig", "vol_buy_zig", "vol_sell_zig")
        out = out.join(F.broadcast(pm), "pool_id", "left").withColumn(
            "tvl_zig", F.coalesce("tvl_zig", "tvl_zig_approx")
        )
    else:
        out = out.withColumn("tvl_zig", F.col("tvl_zig_approx"))
    return out.filter(F.col("tvl_zig") >= min_tvl_zig)


def best_pool_by_simulation(
    candidates: DataFrame, amount_in: Column, from_is_zig: bool = True
) -> DataFrame:
    """B3 pickBySimulation: per token, keep the pool with max simulated
    output. Zero-reserve pools simulate to NULL and lose (B2 guard).
    Ties break to the LOWEST pool_id (the reference keeps the first max
    in iteration order, which is nondeterministic — a fixed tiebreak is
    strictly better and required for the oracle gate).

    If the candidates carry a ``mid_zig`` column (per-pool mid price),
    it rides along in the winning struct for cross-rate math."""
    sim = business.simulate_xyk(
        F.lit(from_is_zig),
        amount_in,
        F.col("reserve_zig"),
        F.col("reserve_token"),
        F.col("fee"),
    )
    ok = (F.col("reserve_zig") > 0) & (F.col("reserve_token") > 0)
    scored = candidates.withColumn("sim", F.when(ok, sim))
    extra = (
        [F.col("mid_zig").alias("mid_zig")]
        if "mid_zig" in candidates.columns
        else []
    )
    return (
        scored.filter(F.col("sim").isNotNull())
        .groupBy("base_token_id")
        .agg(
            F.max_by(
                F.struct(
                    "pool_id",
                    "pair_contract",
                    F.col("sim.out").alias("out"),
                    F.col("sim.exec_price").alias("exec_price"),
                    F.col("sim.impact").alias("impact"),
                    *extra,
                ),
                F.struct(F.col("sim.out"), (-F.col("pool_id")).alias("tb")),
            ).alias("best")
        )
        .select("base_token_id", "best.*")
    )


def default_amount_zig(
    fx_zig_usd: Column, side_is_buy: bool, mid_price: Column | None = None,
    usd_notional: float = 100.0,
) -> Column:
    """B4: ~$100 notional in ZIG; sell side divides by the mid price to
    get a token amount."""
    zig = F.lit(usd_notional) / fx_zig_usd
    if side_is_buy or mid_price is None:
        return zig
    return zig / mid_price
