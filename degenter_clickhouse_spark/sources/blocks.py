"""Batch ingest: raw block events -> trades / pools / prices /
pool_state / ohlcv_1m (SURVEY.md §3.1; core/block-processor.js).

Ingest contract (SURVEY.md §2.1 S1): a DataFrame of rows
``{height, time, txs: [b64_tx], tx_results: [{events: [{type,
attributes: [{key, value}]}]}]}`` — what the reference assembles from
Tendermint block + block_results polling. Event attribute names follow
the CosmWasm conventions the reference consumes:

  create_pair:        action, pair ("base-quote"), _contract_address,
                      pair_type?, lp_denom?
  swap:               action, offer_asset, offer_amount, ask_asset,
                      return_amount, and reserves either combined
                      ("denom:amt,denom2:amt2") or as
                      reserve_asset{1,2}_{denom,amount}
  provide_liquidity / withdraw_liquidity:
                      assets ("123denom,456denom2"), share under one of
                      withdrawn_share|withdraw_share|liquidity|share
  message:            sender, msg_index   (P8 sender map)
  execute:            _contract_address   (P12 router detection)

Everything below is column expressions — including the P1 heuristic
base64 decode (round-trip + printable check), which the reference does
in JS per attribute; no Python touches the hot path.

Scale: one shuffle per output (the per-key aggregations); parsing is
narrow (explode + projections). Dedupe ST2 shuffles on the natural key
(pool_id, tx_hash, msg_index) — the same key downstream MERGEs use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import schemas as S
from ..functions import parse
from ..operators import dedupe, joins, ohlcv
from ..operators.joins import dim_broadcast

RAW_SCHEMA = T.StructType(
    [
        T.StructField("height", T.LongType(), False),
        T.StructField("time", T.StringType(), False),
        T.StructField("txs", T.ArrayType(T.StringType())),
        T.StructField(
            "tx_results",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "events",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("type", T.StringType()),
                                        T.StructField(
                                            "attributes",
                                            T.ArrayType(
                                                T.StructType(
                                                    [
                                                        T.StructField("key", T.StringType()),
                                                        T.StructField("value", T.StringType()),
                                                    ]
                                                )
                                            ),
                                        ),
                                    ]
                                )
                            ),
                        )
                    ]
                )
            ),
        ),
    ]
)

PRINTABLE = "^[ -~]*$"


def _maybe_b64(col: Column) -> Column:
    """P1 (core/parse.js:4-17): decode iff it round-trips AND decodes to
    printable ASCII; otherwise keep the original. ANSI-safe: the binary
    probe uses try_to_binary (NULL, never throw) and UTF-8 decode only
    runs inside the branch where validity is already proven."""
    b = F.try_to_binary(col, F.lit("base64"))
    is_b64_shape = col.rlike("^[A-Za-z0-9+/]+={0,2}$") & (F.length(col) % 4 == 0)
    safe = is_b64_shape & b.isNotNull() & F.is_valid_utf8(b) & (F.base64(b) == col)
    decoded = F.decode(b, "UTF-8")
    return F.when(
        safe, F.when(decoded.rlike(PRINTABLE), decoded).otherwise(col)
    ).otherwise(col)


def events_frame(raw: DataFrame) -> DataFrame:
    """Unwrap (S2) + tx hash (P2) + attr map (P3) + sender map (P8):
    one row per event with ``m`` = Map(attr key -> decoded value)."""
    txs = raw.select(
        "height",
        F.to_timestamp("time").alias("created_at"),
        F.posexplode_outer(F.arrays_zip("txs", "tx_results")).alias("tx_index", "tx"),
    ).select(
        "height",
        "created_at",
        "tx_index",
        parse.sha256_hex_upper(F.unbase64(F.col("tx.txs"))).alias("tx_hash"),
        F.col("tx.tx_results.events").alias("events"),
    )
    ev = txs.select(
        "height",
        "created_at",
        "tx_index",
        "tx_hash",
        F.explode("events").alias("ev"),
    ).select(
        "height",
        "created_at",
        "tx_index",
        "tx_hash",
        F.col("ev.type").alias("event_type"),
        F.map_from_entries(
            F.transform(
                F.col("ev.attributes"),
                lambda a: F.struct(
                    _maybe_b64(a["key"]).alias("key"), _maybe_b64(a["value"]).alias("value")
                ),
            )
        ).alias("m"),
    )
    ev = ev.withColumn("msg_index", parse.digits_or_null(F.col("m")["msg_index"]).cast("int"))
    senders = (
        ev.filter(F.col("event_type") == "message")
        .filter(F.col("m")["sender"].isNotNull())
        .select("height", "tx_index", "msg_index", F.col("m")["sender"].alias("sender"))
        .dropDuplicates(["height", "tx_index", "msg_index"])
    )
    return ev.join(senders, ["height", "tx_index", "msg_index"], "left")


def _wasm(ev: DataFrame, action: str) -> DataFrame:
    """P4 (core/parse.js:32): wasm events by action attribute."""
    return ev.filter(
        (F.col("event_type") == "wasm") & (F.col("m")["action"] == action)
    )


def extract_pools(ev: DataFrame, existing_pools: DataFrame | None = None) -> DataFrame:
    """create_pair -> pools rows; P9 normalization (uzig forced to the
    quote side), deterministic hash ids, NOT-EXISTS guard (J8)."""
    cp = _wasm(ev, "create_pair").filter(
        # malformed events (missing contract / pair) never become rows
        F.col("m")["_contract_address"].isNotNull()
        & F.col("m")["pair"].rlike(r"^[^-]+-.+$")
    )
    pair = F.col("m")["pair"]
    norm = parse.normalize_pair(pair)
    contract = F.col("m")["_contract_address"]
    rows = cp.select(
        parse.nat_key_id(contract).alias("pool_id"),
        contract.alias("pair_contract"),
        parse.nat_key_id(norm["base_denom"]).alias("base_token_id"),
        parse.nat_key_id(norm["quote_denom"]).alias("quote_token_id"),
        F.coalesce(F.col("m")["pair_type"], F.lit("xyk")).alias("pair_type"),
        (norm["quote_denom"] == S.UZIG).alias("is_uzig_quote"),
        F.col("m")["lp_denom"].alias("lp_token_denom"),
        F.lit(None).cast("string").alias("router_contract"),
        F.col("created_at"),
        F.col("height").alias("created_height"),
        F.col("sender").alias("signer"),
        norm["base_denom"].alias("base_denom"),
        norm["quote_denom"].alias("quote_denom"),
    ).dropDuplicates(["pair_contract"])
    if existing_pools is not None:
        rows = joins.anti(
            rows, existing_pools.select("pair_contract"), on=["pair_contract"]
        )
    return rows


def _reserves(col_m: Column) -> tuple[Column, Column, Column, Column]:
    """P7: combined 'denom:amt,denom2:amt2' blob, else the four separate
    reserve attrs (both forms appear on chain)."""
    kv = parse.parse_reserves_kv(col_m["reserves"])
    r1d = F.coalesce(kv[0]["denom"], col_m["reserve_asset1_denom"])
    r1a = F.coalesce(
        kv[0]["amount_base"],
        parse.amount_decimal(parse.digits_or_null(col_m["reserve_asset1_amount"])),
    )
    r2d = F.coalesce(kv[1]["denom"], col_m["reserve_asset2_denom"])
    r2a = F.coalesce(
        kv[1]["amount_base"],
        parse.amount_decimal(parse.digits_or_null(col_m["reserve_asset2_amount"])),
    )
    return r1d, r1a, r2d, r2a


def extract_swaps(
    ev: DataFrame, pools_dim: DataFrame, router_addr: str | None = None
) -> DataFrame:
    """swap events -> trades rows: direction (P10), digit validation
    (P5), reserve passthrough, router detection (P12)."""
    sw = _wasm(ev, "swap")
    m = F.col("m")
    contract = m["_contract_address"]
    p = pools_dim.select(
        "pool_id",
        "pair_contract",
        F.col("quote_denom").alias("pool_quote_denom"),
    )
    j = sw.join(
        dim_broadcast(p), sw["m"]["_contract_address"] == p["pair_contract"], "inner"
    )
    execs = (
        ev.filter(F.col("event_type") == "execute")
        .filter(F.col("m")["_contract_address"] == F.lit(router_addr))
        .select("height", "tx_index", "msg_index")
        .dropDuplicates(["height", "tx_index", "msg_index"])
        .withColumn("router_exec", F.lit(True))
        if router_addr
        else None
    )
    if execs is not None:
        j = j.join(dim_broadcast(execs), ["height", "tx_index", "msg_index"], "left")
        is_router = (F.col("sender") == F.lit(router_addr)) | F.coalesce(
            F.col("router_exec"), F.lit(False)
        )
    else:
        is_router = F.lit(False)
    r1d, r1a, r2d, r2a = _reserves(m)
    direction = parse.classify_direction(m["offer_asset"], F.col("pool_quote_denom"))
    return j.select(
        "pool_id",
        "pair_contract",
        F.lit("swap").alias("action"),
        direction.alias("direction"),
        m["offer_asset"].alias("offer_asset_denom"),
        parse.amount_decimal(parse.digits_or_null(m["offer_amount"])).alias("offer_amount_base"),
        m["ask_asset"].alias("ask_asset_denom"),
        parse.amount_decimal(parse.digits_or_null(m["return_amount"])).alias("ask_amount_base"),
        parse.amount_decimal(parse.digits_or_null(m["return_amount"])).alias("return_amount_base"),
        is_router.alias("is_router"),
        r1d.alias("reserve_asset1_denom"),
        r1a.alias("reserve_asset1_amount"),
        r2d.alias("reserve_asset2_denom"),
        r2a.alias("reserve_asset2_amount"),
        "height",
        "tx_hash",
        F.coalesce(F.col("sender"), F.lit("")).alias("signer"),
        F.coalesce(F.col("msg_index"), F.lit(0)).alias("msg_index"),
        "created_at",
    )


SHARE_ALIASES = ["withdrawn_share", "withdraw_share", "liquidity", "share"]


def extract_liquidity(ev: DataFrame, pools_dim: DataFrame) -> DataFrame:
    """provide/withdraw -> trades rows (U1: processed uniformly);
    assets list parsed per P6; share amount under its aliases."""
    out = None
    p = pools_dim.select("pool_id", "pair_contract")
    for action, kind in (("provide_liquidity", "provide"), ("withdraw_liquidity", "withdraw")):
        e = _wasm(ev, action)
        m = F.col("m")
        share = F.coalesce(*[parse.digits_or_null(m[a]) for a in SHARE_ALIASES])
        j = e.join(dim_broadcast(p), e["m"]["_contract_address"] == p["pair_contract"])
        rows = j.select(
            "pool_id",
            "pair_contract",
            F.lit(kind).alias("action"),
            F.lit(kind).alias("direction"),
            F.lit(None).cast("string").alias("offer_asset_denom"),
            F.lit(None).cast("decimal(38,0)").alias("offer_amount_base"),
            F.lit(None).cast("string").alias("ask_asset_denom"),
            F.lit(None).cast("decimal(38,0)").alias("ask_amount_base"),
            parse.amount_decimal(share).alias("return_amount_base"),
            F.lit(False).alias("is_router"),
            F.lit(None).cast("string").alias("reserve_asset1_denom"),
            F.lit(None).cast("decimal(38,0)").alias("reserve_asset1_amount"),
            F.lit(None).cast("string").alias("reserve_asset2_denom"),
            F.lit(None).cast("decimal(38,0)").alias("reserve_asset2_amount"),
            "height",
            "tx_hash",
            F.coalesce(F.col("sender"), F.lit("")).alias("signer"),
            F.coalesce(F.col("msg_index"), F.lit(0)).alias("msg_index"),
            "created_at",
        )
        out = rows if out is None else out.unionByName(rows)
    return out


def derive_pool_state(trades: DataFrame, pools_dim: DataFrame) -> DataFrame:
    """P13 reserve orientation + last-wins per pool (A16,
    core/pool_state.js:21-25,46-57): reserves mapped onto (base, quote)
    by denom match; unmappable rows skipped."""
    p = pools_dim.select("pool_id", "base_denom", "quote_denom")
    t = trades.filter(F.col("reserve_asset1_denom").isNotNull()).join(
        dim_broadcast(p), "pool_id"
    )
    base_amt = (
        F.when(F.col("reserve_asset1_denom") == F.col("base_denom"), F.col("reserve_asset1_amount"))
        .when(F.col("reserve_asset2_denom") == F.col("base_denom"), F.col("reserve_asset2_amount"))
    )
    quote_amt = (
        F.when(F.col("reserve_asset1_denom") == F.col("quote_denom"), F.col("reserve_asset1_amount"))
        .when(F.col("reserve_asset2_denom") == F.col("quote_denom"), F.col("reserve_asset2_amount"))
    )
    oriented = t.select(
        "pool_id",
        base_amt.alias("reserve_base_base"),
        quote_amt.alias("reserve_quote_base"),
        F.col("created_at").alias("updated_at"),
        "height",
        "msg_index",
    ).filter(F.col("reserve_base_base").isNotNull() & F.col("reserve_quote_base").isNotNull())
    return dedupe.keep_latest(oriented, keys=["pool_id"], order=["height", "msg_index"]).drop(
        "height", "msg_index"
    )


def derive_prices(
    trades: DataFrame, pools_dim: DataFrame, tokens_exp: DataFrame | None = None
) -> DataFrame:
    """B11: price from post-trade reserves for uzig-quoted pools; one
    tick per trade (price_ticks) — the prices table is its append log.

    Each tick also carries the swap's quote-leg volume in ZIG
    (core/block-processor.js:277-291: quoteRaw/1e6, where the quote leg
    is offer_amount when the offer asset IS the quote denom, else the
    return amount) so downstream 1-minute candles sum real volume."""
    p = pools_dim.select(
        "pool_id", "base_denom", "quote_denom", "base_token_id", "is_uzig_quote"
    )
    t = trades.filter(
        (F.col("action") == "swap") & F.col("reserve_asset1_denom").isNotNull()
    ).join(dim_broadcast(p), "pool_id")
    base_amt = (
        F.when(F.col("reserve_asset1_denom") == F.col("base_denom"), F.col("reserve_asset1_amount"))
        .when(F.col("reserve_asset2_denom") == F.col("base_denom"), F.col("reserve_asset2_amount"))
    )
    quote_amt = (
        F.when(F.col("reserve_asset1_denom") == F.col("quote_denom"), F.col("reserve_asset1_amount"))
        .when(F.col("reserve_asset2_denom") == F.col("quote_denom"), F.col("reserve_asset2_amount"))
    )
    exp = (
        tokens_exp.select(F.col("token_id").alias("base_token_id"), "exponent")
        if tokens_exp is not None
        else None
    )
    quote_leg_raw = F.when(
        F.col("offer_asset_denom") == F.col("quote_denom"),
        F.col("offer_amount_base"),
    ).otherwise(F.col("return_amount_base"))
    out = t.select(
        F.col("base_token_id").alias("token_id"),
        "pool_id",
        base_amt.alias("rb"),
        quote_amt.alias("rq"),
        F.col("is_uzig_quote"),
        F.coalesce(quote_leg_raw.cast("double") / F.lit(1e6), F.lit(0.0)).alias(
            "quote_volume_zig"
        ),
        F.col("created_at").alias("updated_at"),
        "height",
        "msg_index",
    )
    if exp is not None:
        out = out.join(dim_broadcast(exp), out["token_id"] == exp["base_token_id"], "left").drop(
            "base_token_id"
        )
        e = F.col("exponent")
    else:
        e = F.lit(None).cast("int")
    from ..functions import business

    px = business.price_from_reserves(F.col("rq"), F.col("rb"), e)
    return (
        out.filter(F.col("is_uzig_quote"))
        .select(
            "token_id",
            "pool_id",
            px.alias("price_in_zig"),
            F.lit(True).alias("is_pair_native"),
            "quote_volume_zig",
            "updated_at",
            "height",
            "msg_index",
        )
        .filter(F.col("price_in_zig").isNotNull())
    )


def derive_ohlcv_1m(prices_ticks: DataFrame) -> DataFrame:
    """A7/ST3: tumbling 1-minute candles from the price ticks, ordered
    deterministically by (height, msg_index) — SURVEY.md §7's fix for
    the reference's arrival-order close."""
    ticks = prices_ticks.select(
        "pool_id",
        F.col("price_in_zig").alias("price"),
        F.col("updated_at").alias("ts"),
        F.struct("height", "msg_index").alias("seq"),
        F.coalesce(F.col("quote_volume_zig"), F.lit(0.0)).alias("qty"),
    )
    return ohlcv.bars(ticks, 60, seq="seq", qty="qty").withColumnRenamed(
        "volume", "volume_zig"
    )


def ingest(
    raw: DataFrame,
    existing_pools: DataFrame | None = None,
    existing_trades: DataFrame | None = None,
    router_addr: str | None = None,
    tokens_exp: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Full batch ingest (three-phase order §3.1: dims -> facts ->
    derived), idempotent under replay (ST2): exact-duplicate events
    collapse via key dedupe, and previously ingested (pool, tx, msg)
    keys are anti-joined away."""
    # the five outputs share this lineage and are written (or counted)
    # as separate actions by every caller — without materialization the
    # block parse + event extraction re-executes once PER OUTPUT (4
    # redundant passes per micro-batch in stream_ingest). Lazy
    # localCheckpoints make the parse run once: ev on first touch,
    # trades again after the dedupe/anti-join shuffle.
    ev = events_frame(raw).localCheckpoint(eager=False)
    new_pools = extract_pools(ev, existing_pools)
    pools_dim = (
        existing_pools.unionByName(new_pools, allowMissingColumns=True)
        if existing_pools is not None
        else new_pools
    )
    trades = extract_swaps(ev, pools_dim, router_addr).unionByName(
        extract_liquidity(ev, pools_dim)
    )
    trades = dedupe.ingest_dedupe(trades, ["pool_id", "tx_hash", "msg_index"])
    if existing_trades is not None:
        trades = joins.anti(
            trades,
            existing_trades.select("pool_id", "tx_hash", "msg_index"),
            on=["pool_id", "tx_hash", "msg_index"],
        )
    trades = trades.localCheckpoint(eager=False)
    prices = derive_prices(trades, pools_dim, tokens_exp)
    return {
        "pools": new_pools,
        "trades": trades,
        "prices": prices.drop("height", "msg_index", "quote_volume_zig"),
        "pool_state": derive_pool_state(trades, pools_dim),
        "ohlcv_1m": derive_ohlcv_1m(prices),
    }
