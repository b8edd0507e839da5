"""Business-logic column expressions (SURVEY.md §2.11 B1-B12).

Everything is pure math / when-chains — JVM-side, whole-stage-codegen
friendly, no UDFs. Formulas are written in one canonical operation
order so results are bit-identical across engines that evaluate IEEE
doubles left-to-right.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pair_fee(pair_type: Column) -> Column:
    """B1 (api/routes/swap.js:21-32): xyk->0.0001, concentrated->0.01,
    xyk_<bps> -> bps/10000, else 0.003."""
    bps = F.regexp_extract(pair_type, r"^xyk_(\d+)$", 1)
    return (
        F.when(pair_type == "xyk", F.lit(0.0001))
        .when(pair_type == "concentrated", F.lit(0.01))
        .when(pair_type.rlike(r"^xyk_\d+$"), bps.cast("double") / F.lit(10000.0))
        .otherwise(F.lit(0.003))
    )


def simulate_xyk(
    from_is_zig: Column,
    amount_in: Column,
    reserve_zig: Column,
    reserve_token: Column,
    fee: Column,
) -> Column:
    """B2 (api/routes/swap.js:35-55): constant-product swap with
    fee-on-input. Returns struct(out, exec_price, mid_price, impact).

    out = (xin_eff * R_out) / (R_in + xin_eff); prices quoted in
    ZIG-per-token. ``impact`` is a FRACTION (not percent) measured vs
    the mid price Rz/Rt, direction-branched exactly like the
    reference: eff/mid - 1 for ZIG->token, mid/eff - 1 for token->ZIG
    (both >= 0 for any fee >= 0), with the same 1e-18 denominator
    guards."""
    xin_eff = amount_in * (F.lit(1.0) - fee)
    r_in = F.when(from_is_zig, reserve_zig).otherwise(reserve_token)
    r_out = F.when(from_is_zig, reserve_token).otherwise(reserve_zig)
    out = (xin_eff * r_out) / (r_in + xin_eff)
    mid = reserve_zig / reserve_token
    exec_price = F.when(
        from_is_zig, amount_in / F.greatest(out, F.lit(1e-18))
    ).otherwise(out / amount_in)
    impact = F.when(mid <= 0, F.lit(0.0)).otherwise(
        F.when(from_is_zig, exec_price / mid - F.lit(1.0)).otherwise(
            mid / F.greatest(exec_price, F.lit(1e-18)) - F.lit(1.0)
        )
    )
    return F.struct(
        out.alias("out"),
        exec_price.alias("exec_price"),
        mid.alias("mid_price"),
        impact.alias("impact"),
    )


def classify_worth(worth: Column, shrimp_max: float = 1000.0, whale_min: float = 10000.0) -> Column:
    """B5 (api/routes/trades.js:217-226): shrimp < 1000 <= shark <=
    10000 < whale (ZIG notional)."""
    return (
        F.when(worth < shrimp_max, "shrimp")
        .when(worth <= whale_min, "shark")
        .otherwise("whale")
    )


def trade_worth_zig(
    action: Column,
    offer_denom: Column,
    offer_amount_disp: Column,
    ask_denom: Column,
    ask_amount_disp: Column,
    quote_amount_disp: Column,
    quote_price_zig: Column,
    zig_denom: str = "uzig",
) -> Column:
    """B6 (api/routes/trades.js:353-372): ZIG leg preferred — if either
    side IS zig, that amount is the worth; else quote notional x quote
    price."""
    return (
        F.when(offer_denom == zig_denom, offer_amount_disp)
        .when(ask_denom == zig_denom, ask_amount_disp)
        .otherwise(quote_amount_disp * F.coalesce(quote_price_zig, F.lit(0.0)))
    )


def price_from_reserves(
    reserve_quote_base: Column,
    reserve_base_base: Column,
    base_exponent: Column,
    quote_exponent: Column | None = None,
) -> Column:
    """B11 (core/prices.js:72-92): price = (Rq/10^qexp) / (Rb/10^bexp),
    quote exponent fixed at 6 (uzig) in the reference."""
    qexp = quote_exponent if quote_exponent is not None else F.lit(6)
    rq = reserve_quote_base.cast("double") / F.pow(F.lit(10.0), qexp)
    rb = reserve_base_base.cast("double") / F.pow(F.lit(10.0), F.coalesce(base_exponent, F.lit(6)))
    return F.when(rb != 0.0, rq / rb)


def security_score(
    can_mint: Column,
    top10_pct: Column,
    creator_pct: Column,
    holders: Column,
    age_days: Column,
    fully_minted: Column,
) -> Column:
    """B9 (api/routes/tokens.js:1104-1143): 100 - penalties + bonuses,
    clamped to [1, 99]."""
    score = (
        F.lit(100.0)
        - F.when(can_mint, 30.0).otherwise(0.0)
        - F.when(top10_pct >= 75, 25.0)
        .when(top10_pct >= 50, 15.0)
        .when(top10_pct >= 30, 7.0)
        .otherwise(0.0)
        - F.when(creator_pct >= 50, 20.0)
        .when(creator_pct >= 25, 10.0)
        .otherwise(0.0)
        - F.when(holders < 10, 15.0).when(holders < 50, 7.0).otherwise(0.0)
        + F.when(age_days >= 180, 6.0)
        .when(age_days >= 90, 4.0)
        .when(age_days >= 30, 2.0)
        .otherwise(0.0)
        + F.when(fully_minted, 5.0).otherwise(0.0)
    )
    return F.least(F.lit(99.0), F.greatest(F.lit(1.0), score))


def risk_flags(
    creator_pct: Column, top10_pct: Column, can_mint: Column, can_change_cap: Column
) -> Column:
    """B10 (jobs/token-security.js:101-108)."""
    return F.struct(
        (creator_pct >= 50).alias("creator_majority"),
        (top10_pct >= 50).alias("top10_majority"),
        can_mint.alias("can_mint_more"),
        can_change_cap.alias("can_change_cap"),
    )
