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
from ..operators.joins import dim_broadcast


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
    j = p.join(dim_broadcast(state), "pool_id", "left").join(dim_broadcast(bt), "base_token_id", "left")
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
        out = out.join(dim_broadcast(pm), "pool_id", "left").withColumn(
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


def _best_leg(
    reqs: DataFrame,
    candidates: DataFrame,
    key: str,
    amount: Column,
    from_is_zig: bool,
    prefix: str,
) -> DataFrame:
    """One routing leg: join each request to the candidate pools of the
    token named by ``reqs[key]``, simulate at ``amount``, keep the
    argmax-out pool per request (ties to lowest pool_id). Requests with
    no candidate — or a NULL amount threaded from a failed prior leg —
    keep their row with NULL leg columns (the reference returns a
    pairs:[] route, api/routes/swap.js:289-308)."""
    cand = candidates.select(
        F.col("base_token_id").alias(key),
        "pool_id",
        "reserve_zig",
        "reserve_token",
        "fee",
        "mid_zig",
    )
    j = reqs.join(dim_broadcast(cand), key, "left")
    sim = business.simulate_xyk(
        F.lit(from_is_zig), amount, F.col("reserve_zig"), F.col("reserve_token"), F.col("fee")
    )
    ok = (F.col("reserve_zig") > 0) & (F.col("reserve_token") > 0)
    scored = j.withColumn("sim", F.when(ok, sim))
    best = F.max_by(
        F.struct(
            F.col("pool_id").alias(f"{prefix}_pool_id"),
            F.col("sim.out").alias(f"{prefix}_out"),
            F.col("sim.exec_price").alias(f"{prefix}_exec_price"),
            F.col("sim.impact").alias(f"{prefix}_impact"),
            F.col("mid_zig").alias(f"{prefix}_mid_zig"),
        ),
        # NULL ordering rows are skipped by max_by, so sim-less rows
        # (no candidate / zero reserves / NULL amount) never win
        F.when(
            F.col("sim.out").isNotNull(),
            F.struct(F.col("sim.out"), (-F.col("pool_id")).alias("tb")),
        ),
    )
    keep = list(reqs.columns)
    return scored.groupBy(*keep).agg(best.alias("__best")).select(*keep, "__best.*")


def route_via_uzig(requests: DataFrame, candidates: DataFrame) -> DataFrame:
    """Two-hop swap route TOKEN A -> uzig -> TOKEN B
    (api/routes/swap.js:284-350).

    Leg 1 (sellA): best SELL pool per request over A's uzig-quoted
    candidates at the requested token amount — argmax simulated ZIG
    out. Leg 2 (buyB): the sell leg's ZIG out threads as the buy
    amount into B's candidates; best BUY pool at THAT amount. Cross
    rate ``b_per_a`` = mid(A, winning sell pool) / max(mid(B, winning
    buy pool), 1e-18) — the reference's ``bPerA`` (swap.js:317).

    ``requests`` needs (from_token_id, to_token_id, amount_in) plus
    any id columns; ``candidates`` is ``candidate_pools()`` output
    plus a ``mid_zig`` column (the prices-table mid the reference
    loads per pool, swap.js:66). Both legs are broadcast-join +
    ``max_by``, so a whole batch of route requests resolves in one
    relational plan — no per-request driver loop, and the fact tables
    are never touched (candidates are dimension-sized)."""
    # both legs broadcast the same candidate frame under different join
    # keys, which defeats Spark's ReusedExchange — materialize the
    # (dimension-sized) candidates once instead of rescanning + re-deriving
    # them per leg
    candidates = candidates.localCheckpoint(eager=False)
    sell = _best_leg(
        requests, candidates, "from_token_id", F.col("amount_in"), False, "sell"
    )
    buy = _best_leg(sell, candidates, "to_token_id", F.col("sell_out"), True, "buy")
    return buy.withColumn(
        "b_per_a",
        F.col("sell_mid_zig") / F.greatest(F.col("buy_mid_zig"), F.lit(1e-18)),
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
