"""Trade feed shaping (api/routes/trades.js; SURVEY.md §2.11 B5-B8).

shapeRow (B7) becomes a pure column projection: display scaling via
per-denom exponent joins (J3), per-trade price = quoteZig / baseAmt,
ZIG/USD worth (B6), whale/shark/shrimp class (B5). Router-leg
combining (B8) is a relational groupBy over tx_hash — exact, no
oversampling (the reference fetches limit x 20 rows and combines in
JS; SURVEY.md §4 notes the relational form supersedes that).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import schemas as S
from ..functions import business
from ..operators.joins import dim_broadcast


def shape(
    trades: DataFrame,
    tokens: DataFrame,
    latest_token_prices: DataFrame,
    pools: DataFrame,
    zig_usd: Column,
) -> DataFrame:
    """B7: one output row per trade with display amounts, price, worth,
    class. ``latest_token_prices`` is the decorrelated J5 view keyed by
    token_id."""
    toff = tokens.select(
        F.col("denom").alias("offer_asset_denom"), F.col("exponent").alias("offer_exp")
    )
    task = tokens.select(
        F.col("denom").alias("ask_asset_denom"), F.col("exponent").alias("ask_exp")
    )
    p = pools.select("pool_id", "base_token_id", "quote_token_id", "is_uzig_quote")
    qpx = latest_token_prices.select(
        F.col("token_id").alias("quote_token_id"),
        F.col("latest_price_zig").alias("quote_px"),
    )
    t = (
        trades.join(dim_broadcast(toff), "offer_asset_denom", "left")
        .join(dim_broadcast(task), "ask_asset_denom", "left")
        .join(dim_broadcast(p), "pool_id", "left")
        .join(dim_broadcast(qpx), "quote_token_id", "left")
    )
    offer_disp = F.col("offer_amount_base").cast("double") / F.pow(
        F.lit(10.0), F.coalesce(F.col("offer_exp"), F.lit(S.UZIG_EXPONENT))
    )
    ask_disp = F.col("return_amount_base").cast("double") / F.pow(
        F.lit(10.0), F.coalesce(F.col("ask_exp"), F.lit(S.UZIG_EXPONENT))
    )
    # quote/base legs by direction: buy offers quote, sell receives quote
    quote_disp = F.when(F.col("direction") == "buy", offer_disp).otherwise(ask_disp)
    base_disp = F.when(F.col("direction") == "buy", ask_disp).otherwise(offer_disp)
    quote_px_eff = F.when(F.col("is_uzig_quote"), F.lit(1.0)).otherwise(
        F.coalesce(F.col("quote_px"), F.lit(0.0))
    )
    worth_zig = business.trade_worth_zig(
        action=F.col("action"),
        offer_denom=F.col("offer_asset_denom"),
        offer_amount_disp=offer_disp,
        ask_denom=F.col("ask_asset_denom"),
        ask_amount_disp=ask_disp,
        quote_amount_disp=quote_disp,
        quote_price_zig=quote_px_eff,
    )
    price = F.when(base_disp != 0, quote_disp * quote_px_eff / base_disp)
    return t.select(
        "pool_id",
        "tx_hash",
        "msg_index",
        "signer",
        "action",
        "direction",
        "is_router",
        "created_at",
        "height",
        "base_token_id",
        "quote_token_id",
        offer_disp.alias("offer_amount_disp"),
        ask_disp.alias("ask_amount_disp"),
        base_disp.alias("base_amount_disp"),
        quote_disp.alias("quote_amount_disp"),
        price.alias("price_in_zig"),
        worth_zig.alias("worth_zig"),
        (worth_zig * zig_usd).alias("worth_usd"),
        business.classify_worth(worth_zig).alias("trade_class"),
    )


def combine_router_legs(
    shaped: DataFrame,
    max_legs: int | None = None,
    salted: bool | None = None,
) -> DataFrame:
    """B8 (api/routes/trades.js:269-279 combineRouterTradesShallow,
    :236-268 buildRouterCombined): ALL legs of a tx group together. If
    ANY leg is router-flagged, the whole group — router and non-router
    legs alike — combines into one record: first leg's
    time/direction/signer, pool path over every leg in time order,
    worth summed over every leg, amount in = first leg offer, amount
    out = last leg return for a buy else last leg offer. A tx with no
    router leg collapses to its first leg (one record even for a tx
    holding several independent swaps — ``legs[0]`` in the reference).
    Leg order is (created_at, msg_index): the reference sorts by time
    only; msg_index is the deterministic tiebreak within a block.

    Skew hedge (VERDICT r4 #8): legs-per-tx is protocol-bounded today,
    so the default plan is the single groupBy + sorted collect_list.
    For adversarial txs two config-governed defenses exist (also
    settable per call; ``None`` reads the session conf):

    * ``spark.degenter.routerCombine.salted=true`` — two-phase merge:
      phase 1 collects per (tx_hash, msg_index % 8) salt so no single
      aggregation buffer holds a hot tx's full leg list; phase 2
      flattens + sorts the (already reduced) partials. Bit-identical
      output (unit-tested), one extra dimension-sized shuffle.
    * ``spark.degenter.routerCombine.maxLegs=N`` — clamp the OUTPUT
      leg array of a tx exceeding N to its first N-1 legs + true last
      leg. Endpoints (amount in/out, time, signer), worth sum, leg
      count, and is_router stay EXACT (they aggregate outside the
      array); only the middle of the displayed path truncates.
    """
    conf = shaped.sparkSession.conf
    if max_legs is None:
        raw = conf.get("spark.degenter.routerCombine.maxLegs", "")
        max_legs = int(raw) if raw else None
    if max_legs is not None and max_legs < 2:
        # < 2 cannot keep BOTH endpoints the docstring promises exact:
        # max_legs=1 would silently take the "first leg" fields from
        # the LAST leg, and 0 is a negative slice length that errors at
        # runtime — reject here, whether passed or read from the conf
        raise ValueError(
            f"combine_router_legs: max_legs must be >= 2 (got {max_legs}); "
            "the clamp keeps the first max_legs-1 legs plus the true last leg"
        )
    if salted is None:
        salted = conf.get("spark.degenter.routerCombine.salted", "false") == "true"
    legs = shaped.withColumn(
        "leg",
        F.struct(
            "created_at",
            "msg_index",
            "pool_id",
            "direction",
            "signer",
            "offer_amount_disp",
            "ask_amount_disp",
            "worth_zig",
        ),
    )
    if salted:
        p1 = legs.groupBy(
            "tx_hash",
            F.pmod(F.col("msg_index").cast("int"), F.lit(8)).alias("__salt"),
        ).agg(
            F.collect_list("leg").alias("legs_p"),
            F.max("is_router").alias("is_router_p"),
            F.sum("worth_zig").alias("worth_p"),
            F.count(F.lit(1)).alias("n_p"),
        )
        grouped = p1.groupBy("tx_hash").agg(
            F.sort_array(F.flatten(F.collect_list("legs_p"))).alias("legs"),
            F.max("is_router_p").alias("is_router"),
            F.sum("worth_p").alias("worth_zig_sum"),
            F.sum("n_p").cast("long").alias("n_legs"),
        )
    else:
        grouped = legs.groupBy("tx_hash").agg(
            F.sort_array(F.collect_list("leg")).alias("legs"),
            F.max("is_router").alias("is_router"),
            F.sum("worth_zig").alias("worth_zig_sum"),
            F.count(F.lit(1)).alias("n_legs"),
        )
    if max_legs is not None:
        clamped = F.concat(
            F.slice(F.col("legs"), 1, max_legs - 1),
            F.array(F.element_at(F.col("legs"), -1)),
        )
        grouped = grouped.withColumn(
            "legs",
            F.when(F.size(F.col("legs")) > max_legs, clamped).otherwise(
                F.col("legs")
            ),
        )
    first = F.col("legs")[0]
    last = F.element_at(F.col("legs"), -1)
    any_r = F.col("is_router")
    router_out = F.when(last["direction"] == "buy", last["ask_amount_disp"]).otherwise(
        last["offer_amount_disp"]
    )
    out = grouped.select(
        "tx_hash",
        any_r.alias("is_router"),
        F.when(any_r, F.col("n_legs")).otherwise(F.lit(1).cast("long")).alias("n_legs"),
        first["created_at"].alias("created_at"),
        first["direction"].alias("direction"),
        first["signer"].alias("signer"),
        F.when(any_r, F.transform(F.col("legs"), lambda x: x["pool_id"]))
        .otherwise(F.array(first["pool_id"]))
        .alias("path"),
        first["offer_amount_disp"].alias("amount_in_disp"),
        F.when(any_r, router_out)
        .otherwise(first["ask_amount_disp"])
        .alias("amount_out_disp"),
        F.when(any_r, F.col("worth_zig_sum"))
        .otherwise(first["worth_zig"])
        .alias("worth_zig"),
    )
    return out.withColumn("trade_class", business.classify_worth(F.col("worth_zig")))
