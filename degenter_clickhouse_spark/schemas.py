"""Central StructType registry for the domain tables (SURVEY.md §1).

Types follow the reference's own ClickHouse clamp (phase3schema.sql's
NUMERIC(78,0) is stored as Decimal(38,0) in the port —
jobs/token-security.js:20-24): raw on-chain amounts are
DecimalType(38,0), prices Decimal(38,18) read as double for derived
math, timestamps UTC. Ids are deterministic 64-bit hashes of natural
keys (core/pools.js:14-19), so parallel writers never coordinate.

Storage layout for scale: fact tables (trades, price_ticks, ohlcv_1m)
partition by ``dt = date(created_at)`` — monthly RANGE partitions in
the reference (phase3schema.sql:91,160,176) become date partition
pruning; sort within files by (pool_id, created_at) replaces the
B-tree indexes.
"""

from __future__ import annotations

from pyspark.sql import types as T

AMOUNT = T.DecimalType(38, 0)
PRICE = T.DoubleType()  # reference computes with toFloat64(...) throughout
VOL = T.DoubleType()


def _s(*fields: T.StructField) -> T.StructType:
    return T.StructType(list(fields))


def f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


TOKENS = _s(
    f("token_id", T.LongType(), False),
    f("denom", T.StringType(), False),
    f("type", T.StringType()),
    f("name", T.StringType()),
    f("symbol", T.StringType()),
    f("display", T.StringType()),
    f("exponent", T.IntegerType()),
    f("image_uri", T.StringType()),
    f("website", T.StringType()),
    f("twitter", T.StringType()),
    f("max_supply_base", AMOUNT),
    f("total_supply_base", AMOUNT),
    f("can_mint", T.BooleanType()),
    f("can_change_cap", T.BooleanType()),
    f("creator_address", T.StringType()),
    f("created_at", T.TimestampType()),
)

POOLS = _s(
    f("pool_id", T.LongType(), False),
    f("pair_contract", T.StringType(), False),
    f("base_token_id", T.LongType(), False),
    f("quote_token_id", T.LongType(), False),
    f("pair_type", T.StringType()),
    f("is_uzig_quote", T.BooleanType()),
    f("lp_token_denom", T.StringType()),
    f("router_contract", T.StringType()),
    f("created_at", T.TimestampType()),
    f("created_height", T.LongType()),
    f("signer", T.StringType()),
)

TRADES = _s(
    f("pool_id", T.LongType(), False),
    f("pair_contract", T.StringType()),
    f("action", T.StringType(), False),  # swap | provide | withdraw
    f("direction", T.StringType()),  # buy | sell | provide | withdraw
    f("offer_asset_denom", T.StringType()),
    f("offer_amount_base", AMOUNT),
    f("ask_asset_denom", T.StringType()),
    f("ask_amount_base", AMOUNT),
    f("return_amount_base", AMOUNT),
    f("is_router", T.BooleanType()),
    f("reserve_asset1_denom", T.StringType()),
    f("reserve_asset1_amount", AMOUNT),
    f("reserve_asset2_denom", T.StringType()),
    f("reserve_asset2_amount", AMOUNT),
    f("height", T.LongType()),
    f("tx_hash", T.StringType(), False),
    f("signer", T.StringType()),
    f("msg_index", T.IntegerType(), False),
    f("created_at", T.TimestampType(), False),
)

PRICES = _s(
    f("token_id", T.LongType(), False),
    f("pool_id", T.LongType(), False),
    f("price_in_zig", PRICE, False),
    f("is_pair_native", T.BooleanType()),
    f("updated_at", T.TimestampType(), False),
)

PRICE_TICKS = _s(
    f("pool_id", T.LongType(), False),
    f("token_id", T.LongType(), False),
    f("price_in_zig", PRICE, False),
    f("ts", T.TimestampType(), False),
)

OHLCV_1M = _s(
    f("pool_id", T.LongType(), False),
    f("bucket_start", T.TimestampType(), False),
    f("open", PRICE),
    f("high", PRICE),
    f("low", PRICE),
    f("close", PRICE),
    f("volume_zig", VOL),
    f("trade_count", T.LongType()),
)

POOL_STATE = _s(
    f("pool_id", T.LongType(), False),
    f("reserve_base_base", AMOUNT),
    f("reserve_quote_base", AMOUNT),
    f("updated_at", T.TimestampType(), False),
)

EXCHANGE_RATES = _s(
    f("ts", T.TimestampType(), False),
    f("zig_usd", T.DoubleType(), False),
)

HOLDERS = _s(
    f("token_id", T.LongType(), False),
    f("address", T.StringType(), False),
    f("balance_base", AMOUNT, False),
    f("updated_at", T.TimestampType()),
)

TOKEN_SECURITY = _s(
    f("token_id", T.LongType(), False),
    f("can_mint", T.BooleanType()),
    f("can_change_cap", T.BooleanType()),
    f("top10_pct", T.DoubleType()),
    f("creator_pct", T.DoubleType()),
    f("holders", T.LongType()),
    f("score", T.DoubleType()),
    f("checked_at", T.TimestampType(), False),
)

ALERTS = _s(
    f("alert_id", T.LongType(), False),
    f("wallet_id", T.LongType()),
    f("kind", T.StringType(), False),  # price_cross|wallet_trade|large_trade|tvl_change
    f("params", T.StringType(), False),  # JSON
    f("throttle_sec", T.LongType()),
    f("last_triggered", T.TimestampType()),
    f("active", T.BooleanType()),
)

# Derived rollups (produced, never fixtures)
POOL_MATRIX = _s(
    f("pool_id", T.LongType(), False),
    f("bucket", T.StringType(), False),
    f("vol_buy_zig", VOL),
    f("vol_sell_zig", VOL),
    f("tx_buy", T.LongType()),
    f("tx_sell", T.LongType()),
    f("traders", T.LongType()),
    f("price_in_zig", PRICE),
    f("tvl_zig", VOL),
    f("updated_at", T.TimestampType()),
)

SCHEMAS: dict[str, T.StructType] = {
    "tokens": TOKENS,
    "pools": POOLS,
    "trades": TRADES,
    "prices": PRICES,
    "price_ticks": PRICE_TICKS,
    "ohlcv_1m": OHLCV_1M,
    "pool_state": POOL_STATE,
    "exchange_rates": EXCHANGE_RATES,
    "holders": HOLDERS,
    "token_security": TOKEN_SECURITY,
    "alerts": ALERTS,
    "pool_matrix": POOL_MATRIX,
}

UZIG = "uzig"
UZIG_EXPONENT = 6

WALLETS = _s(
    f("wallet_id", T.LongType(), False),
    f("address", T.StringType(), False),
    f("label", T.StringType()),
    f("created_at", T.TimestampType()),
)

WATCHLIST = _s(
    f("wallet_id", T.LongType(), False),
    f("token_id", T.LongType(), False),
    f("added_at", T.TimestampType()),
)

SCHEMAS["wallets"] = WALLETS
SCHEMAS["watchlist"] = WATCHLIST
