"""Deterministic domain fixtures per FIXTURES.md: small synthetic
tokens/pools/trades/prices/pool_state/exchange_rates/holders tables
encoding the tricky reference semantics (buy/sell classification,
exponent scaling, uzig vs non-uzig quotes, router multi-leg txs,
duplicate (tx,pool,msg_index) events, rebasing price discontinuity,
candle gaps/continuity, concentration tiers)."""

from __future__ import annotations

import random
from datetime import datetime, timedelta
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession

from degenter_clickhouse_spark import schemas as S

T0 = datetime(2024, 3, 1, 0, 0, 0)
SEED = 42


def _d(x: int) -> Decimal:
    return Decimal(int(x))


def token_rows():
    # (token_id, denom, type, name, symbol, display, exponent, ..supplies..,
    #  can_mint, can_change_cap, creator, created_at)
    rows = [
        # uzig: the quote currency, exponent 6
        (1, "uzig", "native", "Zig", "ZIG", "zig", 6, None, None, _d(10**15), _d(10**15), False, False, None, T0 - timedelta(days=400)),
        (2, "coin.zig1aaa.ualpha", "factory", "Alpha", "ALPHA", "alpha", 6, None, None, _d(10**14), _d(5 * 10**13), True, False, "zigcreator_alpha", T0 - timedelta(days=200)),
        (3, "coin.zig1bbb.ubeta", "factory", "Beta", "BETA", "beta", 8, None, None, _d(10**16), _d(10**16), False, False, "zigcreator_beta", T0 - timedelta(days=100)),
        (4, "coin.zig1ccc.ugamma", "factory", "Gamma", "GAMMA", "gamma", 0, None, None, _d(10**9), _d(8 * 10**8), False, True, "zigcreator_gamma", T0 - timedelta(days=60)),
        (5, "ibc/ABCDEF0123", "ibc", "Wrapped Atom", "ATOM", "atom", 18, None, None, None, None, False, False, None, T0 - timedelta(days=35)),
        # NULL metadata row (meta-refresh queue semantics F8)
        (6, "coin.zig1ddd.udelta", "factory", None, None, None, None, None, None, _d(10**12), _d(10**11), True, True, "zigcreator_delta", T0 - timedelta(days=10)),
        # symbol colliding case-insensitively with ALPHA
        (7, "coin.zig1eee.ualpha2", "factory", "Alpha2", "alpha", "alpha2", 6, None, None, _d(10**12), _d(10**12), False, False, None, T0 - timedelta(days=5)),
        # rebasing-guard token: prices feed is 1e6 x off vs OHLCV
        (8, "coin.zig1fff.urebase", "factory", "Rebase", "RB", "rb", 6, None, None, _d(10**13), _d(10**13), False, False, None, T0 - timedelta(days=90)),
        # quote token for the non-uzig pools
        (9, "coin.zig1ggg.uusdc", "factory", "USD Coin", "USDC", "usdc", 6, None, None, _d(10**14), _d(10**14), False, False, None, T0 - timedelta(days=300)),
    ]
    out = []
    for (tid, denom, typ, name, sym, disp, exp, img, web, mx, tot, mint, cap, creator, at) in rows:
        out.append((tid, denom, typ, name, sym, disp, exp, img, web, None, mx, tot, mint, cap, creator, at))
    return out


def pool_rows():
    # (pool_id, pair_contract, base, quote, pair_type, is_uzig, lp, router, created_at, height, signer)
    return [
        (101, "zig1pool_alpha", 2, 1, "xyk", True, "lp_alpha", None, T0 - timedelta(days=199), 1000, "zigdeployer"),
        # second uzig pool for ALPHA (best-pool selection)
        (102, "zig1pool_alpha2", 2, 1, "xyk_30", True, "lp_alpha2", None, T0 - timedelta(days=150), 2000, "zigdeployer"),
        (103, "zig1pool_beta", 3, 1, "concentrated", True, "lp_beta", None, T0 - timedelta(days=99), 3000, "zigdeployer"),
        (104, "zig1pool_gamma", 4, 1, "xyk", True, "lp_gamma", None, T0 - timedelta(days=59), 4000, "zigdeployer"),
        (105, "zig1pool_atom", 5, 1, "xyk", True, "lp_atom", None, T0 - timedelta(days=30), 5000, "zigdeployer"),
        (106, "zig1pool_rebase", 8, 1, "xyk", True, "lp_rb", None, T0 - timedelta(days=89), 6000, "zigdeployer"),
        (107, "zig1pool_delta", 6, 1, "xyk", True, "lp_delta", None, T0 - timedelta(days=9), 7000, "zigdeployer"),
        # non-uzig-quote pools (J4/B6 fallback paths)
        (108, "zig1pool_beta_usdc", 3, 9, "xyk", False, "lp_bu", None, T0 - timedelta(days=50), 8000, "zigdeployer"),
        (109, "zig1pool_alpha_usdc", 2, 9, "xyk", False, "lp_au", None, T0 - timedelta(days=40), 9000, "zigdeployer"),
        (110, "zig1pool_usdc", 9, 1, "xyk", True, "lp_usdc", None, T0 - timedelta(days=299), 500, "zigdeployer"),
    ]


POOL_BASE_DENOM = {101: "coin.zig1aaa.ualpha", 102: "coin.zig1aaa.ualpha",
                   103: "coin.zig1bbb.ubeta", 104: "coin.zig1ccc.ugamma",
                   105: "ibc/ABCDEF0123", 106: "coin.zig1fff.urebase",
                   107: "coin.zig1ddd.udelta", 108: "coin.zig1bbb.ubeta",
                   109: "coin.zig1aaa.ualpha", 110: "coin.zig1ggg.uusdc"}
POOL_QUOTE_DENOM = {p: ("coin.zig1ggg.uusdc" if p in (108, 109) else "uzig")
                    for p in POOL_BASE_DENOM}
POOL_BASE_EXP = {101: 6, 102: 6, 103: 8, 104: 0, 105: 18, 106: 6, 107: 6, 108: 8, 109: 6, 110: 6}
# approximate "true" price per pool in quote display units
POOL_MID = {101: 2.0, 102: 2.05, 103: 0.5, 104: 40.0, 105: 9.0, 106: 0.001,
            107: 0.1, 108: 25.0, 109: 100.0, 110: 0.02}


def trade_rows(n_minutes: int = 480):
    """Swaps + liquidity events over ``n_minutes``; router txs 2 legs;
    ~1% exact duplicates; 2% empty signers; value bands across
    shrimp/shark/whale; minute gaps per pool."""
    rng = random.Random(SEED)
    rows = []
    wallets = [f"zigwallet{i:03d}" for i in range(30)]
    height = 10_000
    pools = [101, 101, 101, 102, 103, 103, 104, 105, 106, 107, 110]  # skew: 101 hot
    for minute in range(n_minutes):
        ts_base = T0 + timedelta(minutes=minute)
        n_in_minute = rng.choice([0, 0, 1, 1, 1, 2, 2, 3, 5])
        for k in range(n_in_minute):
            height += 1
            pool = rng.choice(pools)
            base_denom, quote_denom = POOL_BASE_DENOM[pool], POOL_QUOTE_DENOM[pool]
            bexp = POOL_BASE_EXP[pool]
            mid = POOL_MID[pool] * (1 + 0.1 * rng.uniform(-1, 1))
            is_buy = rng.random() < 0.5
            # notional in quote display units across bands
            notional = rng.choice([rng.uniform(1, 900), rng.uniform(1000, 9000), rng.uniform(11000, 40000)])
            quote_amt = _d(round(notional * 10**6))
            base_amt = _d(max(1, round(notional / mid * 10**bexp)))
            signer = "" if rng.random() < 0.02 else rng.choice(wallets)
            tx = f"{height:08d}{'AB' if is_buy else 'CD'}{pool}".ljust(64, "F")
            ts = ts_base + timedelta(seconds=rng.randint(0, 59))
            is_router = rng.random() < 0.08
            r_base, r_quote = _d(10**12 + height), _d(10**12 + 2 * height)
            swapped = rng.random() < 0.5  # reserve orientation P13
            res1 = (base_denom, r_base) if not swapped else (quote_denom, r_quote)
            res2 = (quote_denom, r_quote) if not swapped else (base_denom, r_base)
            row = (
                pool, f"contract{pool}", "swap",
                "buy" if is_buy else "sell",
                quote_denom if is_buy else base_denom,
                quote_amt if is_buy else base_amt,
                base_denom if is_buy else quote_denom,
                base_amt if is_buy else quote_amt,
                base_amt if is_buy else quote_amt,
                is_router, res1[0], res1[1], res2[0], res2[1],
                height, tx, signer, 0, ts,
            )
            rows.append(row)
            if is_router:  # second leg: same tx, next msg_index, other pool
                pool2 = 110
                row2 = list(row)
                row2[0], row2[1] = pool2, f"contract{pool2}"
                row2[17] = 1  # msg_index
                rows.append(tuple(row2))
            if rng.random() < 0.01:  # replayed duplicate (ST2/W1)
                rows.append(row)
        if minute % 37 == 0:  # liquidity events
            height += 1
            pool = rng.choice(pools)
            rows.append((
                pool, f"contract{pool}", "provide", "provide",
                None, None, None, None, _d(10**6),
                False, None, None, None, None,
                height, f"{height:08d}LIQ{pool}".ljust(64, "E"),
                rng.choice(wallets), 0, ts_base,
            ))
    return rows


def price_rows():
    rng = random.Random(SEED + 1)
    rows = []
    token_of_pool = {101: 2, 102: 2, 103: 3, 104: 4, 105: 5, 106: 8, 107: 6, 110: 9,
                     108: 3, 109: 2}
    for pool, tok in token_of_pool.items():
        px = POOL_MID[pool]
        # rebasing token: prices feed carries a 1e6-scaled price vs ohlcv
        scale = 10**6 if pool == 106 else 1
        for v in range(40):
            px *= 1 + 0.05 * rng.uniform(-1, 1)
            rows.append(
                (tok, pool, px * scale, pool not in (108, 109),
                 T0 + timedelta(minutes=12 * v, seconds=rng.randint(0, 50)))
            )
    return rows


def pool_state_rows():
    rng = random.Random(SEED + 2)
    rows = []
    for pool, bexp in POOL_BASE_EXP.items():
        for v in range(6):
            rb = _d(round(10**6 * 10**bexp * (1 + 0.2 * rng.random())))
            rq = _d(round(POOL_MID[pool] * 10**6 * 10**6 * (1 + 0.2 * rng.random())))
            rows.append((pool, rb, rq, T0 + timedelta(hours=v)))
    # zero-reserve pool state (sim guard B2) — latest version for 107
    rows.append((107, _d(0), _d(0), T0 + timedelta(hours=10)))
    return rows


def exchange_rate_rows(n_minutes: int = 480):
    rng = random.Random(SEED + 3)
    px, rows = 0.02, []
    for m in range(n_minutes):
        px *= 1 + 0.01 * rng.uniform(-1, 1)
        rows.append((T0 + timedelta(minutes=m), px))
    return rows


def holder_rows():
    rng = random.Random(SEED + 4)
    rows = []
    # concentration tiers across tokens (B9): token 2 low, 3 mid, 4 high, 6 extreme
    plans = {2: (60, 0.25), 3: (40, 0.45), 4: (25, 0.65), 6: (8, 0.9), 8: (30, 0.4)}
    for tok, (n, top_share) in plans.items():
        total = 10**12
        top = int(total * top_share / 10)
        for i in range(10):
            rows.append((tok, f"zigholder_{tok}_{i:03d}", _d(top), T0))
        rest = int(total * (1 - top_share) / max(n - 10, 1))
        for i in range(10, n):
            rows.append((tok, f"zigholder_{tok}_{i:03d}", _d(max(rest, 1)), T0))
        # zero balances excluded from counts (F6)
        rows.append((tok, f"zigholder_{tok}_zero", _d(0), T0))
    # creator holding >= 25% for token 2 (B10 creator_majority path)
    rows.append((2, "zigcreator_alpha", _d(int(10**12 * 0.30)), T0))
    return rows


def build(spark: SparkSession) -> dict[str, DataFrame]:
    dfs = {
        "tokens": spark.createDataFrame(token_rows(), S.TOKENS),
        "pools": spark.createDataFrame(pool_rows(), S.POOLS),
        "trades": spark.createDataFrame(trade_rows(), S.TRADES),
        "prices": spark.createDataFrame(
            price_rows(),
            "token_id long, pool_id long, price_in_zig double, is_pair_native boolean, updated_at timestamp",
        ),
        "pool_state": spark.createDataFrame(pool_state_rows(), S.POOL_STATE),
        "exchange_rates": spark.createDataFrame(exchange_rate_rows(), S.EXCHANGE_RATES),
        "holders": spark.createDataFrame(holder_rows(), S.HOLDERS),
    }
    return dfs
