"""Third parity batch: the remaining filter/join shapes — NULL-meta
refresh queue scan (F8 + O6 stalest-K ordering), literal IN-list join
(J9), and set-of-keys rejoin (J10, the sibling-legs refetch pattern).
NULLs are synthesized deterministically (driver tables are dense)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..functions import parse
from . import register
from .core import dsum, o_dsum
from ..operators.joins import dim_broadcast

# ---------------------------------------------------------------------------
# F8 + O6: NULL-metadata scan feeding a stalest-K refresh queue
# ---------------------------------------------------------------------------

NULL_META_ORACLE = """
SELECT custkey, name, segment
FROM (
  SELECT c_custkey AS custkey,
         CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_name END AS name,
         CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS segment
  FROM customer
)
WHERE name IS NULL OR segment IS NULL
ORDER BY custkey ASC
LIMIT 20
"""


# registered via queries.suites.ordering_suite (driver 50-entry cap)
def q_null_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = catalog.load_table(spark, sf_dir, "customer")
    sparse = c.select(
        F.col("c_custkey").alias("custkey"),
        F.when(F.col("c_custkey") % 5 == 0, None).otherwise(F.col("c_name")).alias("name"),
        F.when(F.col("c_custkey") % 7 == 0, None)
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
    )
    return (
        sparse.filter(F.col("name").isNull() | F.col("segment").isNull())
        .orderBy(F.col("custkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# J9: literal IN-list join
# ---------------------------------------------------------------------------

IN_LIST = [1, 2, 3, 5, 8, 13, 21, 34]

IN_LIST_ORACLE = f"""
SELECT o_custkey AS custkey, COUNT(*) AS n_orders, {o_dsum("o_totalprice")} AS total
FROM orders
WHERE o_custkey IN ({", ".join(map(str, IN_LIST))})
GROUP BY o_custkey
"""


# registered via queries.suites.set_join_suite
def q_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = catalog.load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_custkey").isin(IN_LIST))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total"))
    )


# ---------------------------------------------------------------------------
# J10: set-of-keys rejoin (sibling refetch: all orders of customers who
# placed at least one big order)
# ---------------------------------------------------------------------------

REJOIN_ORACLE = f"""
WITH big AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000
)
SELECT o.o_custkey AS custkey, COUNT(*) AS n_sibling_orders,
       {o_dsum("o.o_totalprice")} AS sibling_total
FROM orders o JOIN big b ON b.o_custkey = o.o_custkey
GROUP BY o.o_custkey
"""


# registered via queries.suites.set_join_suite
def q_set_rejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = catalog.load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 400000).select("o_custkey").distinct()
    sib = o.join(dim_broadcast(big), "o_custkey", "left_semi")
    return sib.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_sibling_orders"),
        dsum("o_totalprice").alias("sibling_total"),
    )


# ---------------------------------------------------------------------------
# §2.9 string normalizer: twitter-handle canonicalization
# ---------------------------------------------------------------------------

HANDLE_ORACLE = r"""
SELECT p_partkey,
       lower(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         raw, '^https?://(www\.)?(twitter\.com|x\.com)/', ''),
         '[?#].*$', ''), '^@', ''), '/+$', '')) AS handle
FROM (
  SELECT p_partkey,
         CASE p_partkey % 4
           WHEN 0 THEN 'https://x.com/' || p_brand || '?ref=degenter'
           WHEN 1 THEN 'https://www.twitter.com/' || p_brand || '/'
           WHEN 2 THEN '@' || p_brand
           ELSE p_brand
         END AS raw
  FROM part
)
"""


# registered via queries.suites.string_hash_suite
def q_twitter_handle(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = catalog.load_table(spark, sf_dir, "part")
    raw = (
        F.when(F.col("p_partkey") % 4 == 0,
               F.concat(F.lit("https://x.com/"), F.col("p_brand"), F.lit("?ref=degenter")))
        .when(F.col("p_partkey") % 4 == 1,
              F.concat(F.lit("https://www.twitter.com/"), F.col("p_brand"), F.lit("/")))
        .when(F.col("p_partkey") % 4 == 2, F.concat(F.lit("@"), F.col("p_brand")))
        .otherwise(F.col("p_brand"))
    )
    return p.select(
        "p_partkey", parse.normalize_twitter_handle(raw).alias("handle")
    )


# ---------------------------------------------------------------------------
# Session windows: gap-based sessionization (Spark-native session_window;
# the event-stream analytics op the events table exists for)
# ---------------------------------------------------------------------------

SESSION_GAP_SEC = 1800

SESSION_ORACLE = f"""
WITH t AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_SEC}
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS session_no
  FROM t
)
SELECT user_id,
       CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
       CAST(floor(epoch(MAX(ts))) AS BIGINT) AS session_last,
       COUNT(*) AS n_events,
       {o_dsum("value")} AS total_value
FROM s GROUP BY user_id, session_no
"""


# registered via queries.suites.session_frames
def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog.load_table(spark, sf_dir, "events")
    sw = ev.groupBy(
        "user_id", F.session_window("ts", f"{SESSION_GAP_SEC} seconds")
    ).agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("total_value"),
    )
    return sw.select(
        "user_id",
        F.unix_timestamp("first_ts").alias("session_start"),
        F.unix_timestamp("last_ts").alias("session_last"),
        "n_events",
        "total_value",
    )


# ---------------------------------------------------------------------------
# B3 two-hop: swap route TOKEN A -> uzig -> TOKEN B (api/routes/swap.js:284-350)
# ---------------------------------------------------------------------------

ROUTE_ORACLE = r"""
WITH cand AS (
  SELECT CAST(p_partkey % 50 AS BIGINT) AS token_id,
         CAST(p_partkey AS BIGINT) AS pool_id,
         p_retailprice * 1000.0 AS rz,
         (p_size * 500.0) + 1.0 AS rt,
         CASE WHEN pair_type = 'xyk' THEN 0.0001
              WHEN pair_type = 'concentrated' THEN 0.01
              WHEN regexp_matches(pair_type, '^xyk_\d+$')
                THEN CAST(regexp_extract(pair_type, '^xyk_(\d+)$', 1) AS DOUBLE) / 10000.0
              ELSE 0.003 END AS fee
  FROM (
    SELECT p_partkey, p_retailprice, p_size,
           CASE p_partkey % 4
             WHEN 0 THEN 'xyk'
             WHEN 1 THEN 'concentrated'
             WHEN 2 THEN 'xyk_' || CAST((p_size % 100) * 10 AS VARCHAR)
             ELSE lower(p_brand)
           END AS pair_type
    FROM part
  )
),
req AS (
  SELECT CAST(n_nationkey AS BIGINT) AS req_id,
         CAST(n_nationkey % 50 AS BIGINT) AS from_token_id,
         CAST((n_nationkey * 7 + 3) % 50 AS BIGINT) AS to_token_id,
         100.0 + n_nationkey AS amount_in
  FROM nation
),
sell_sim AS (
  SELECT r.req_id, r.from_token_id, r.to_token_id, r.amount_in,
         c.pool_id, c.rz / c.rt AS mid,
         (r.amount_in * (1.0 - c.fee) * c.rz) / (c.rt + r.amount_in * (1.0 - c.fee)) AS out
  FROM req r JOIN cand c ON c.token_id = r.from_token_id
  WHERE c.rz > 0 AND c.rt > 0
),
sell AS (
  SELECT req_id, from_token_id, to_token_id, amount_in,
         pool_id AS sell_pool_id, out AS sell_out, mid AS sell_mid
  FROM (SELECT *, row_number() OVER (PARTITION BY req_id
              ORDER BY out DESC, pool_id ASC) AS rn
        FROM sell_sim) WHERE rn = 1
),
buy_sim AS (
  SELECT s.*, c.pool_id, c.rz / c.rt AS mid,
         (s.sell_out * (1.0 - c.fee) * c.rt) / (c.rz + s.sell_out * (1.0 - c.fee)) AS out
  FROM sell s JOIN cand c ON c.token_id = s.to_token_id
  WHERE c.rz > 0 AND c.rt > 0
),
buy AS (
  SELECT req_id, from_token_id, to_token_id, amount_in,
         sell_pool_id, sell_out, sell_mid,
         pool_id AS buy_pool_id, out AS amount_out, mid AS buy_mid
  FROM (SELECT *, row_number() OVER (PARTITION BY req_id
              ORDER BY out DESC, pool_id ASC) AS rn
        FROM buy_sim) WHERE rn = 1
)
SELECT req_id, from_token_id, to_token_id, amount_in,
       sell_pool_id, sell_out, buy_pool_id, amount_out,
       sell_mid / greatest(buy_mid, 1e-18) AS b_per_a
FROM buy
"""


@register("swap_route_via_uzig", ROUTE_ORACLE)
def q_swap_route_via_uzig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two chained argmax simulations with the ZIG amount threaded from
    the sell leg into the buy leg (plans/swap.route_via_uzig). Pools /
    requests are synthesized from part / nation exactly like
    xyk_swap_sim so DuckDB can replay the route selection."""
    from ..functions import business
    from ..plans import swap
    from .parity2 import _pair_type_col

    p = catalog.load_table(spark, sf_dir, "part")
    n = catalog.load_table(spark, sf_dir, "nation")
    rz = F.col("p_retailprice") * 1000.0
    rt = (F.col("p_size") * 500.0) + 1.0
    cand = p.select(
        (F.col("p_partkey") % 50).cast("long").alias("base_token_id"),
        F.col("p_partkey").cast("long").alias("pool_id"),
        rz.alias("reserve_zig"),
        rt.alias("reserve_token"),
        business.pair_fee(_pair_type_col()).alias("fee"),
        (rz / rt).alias("mid_zig"),
    )
    reqs = n.select(
        F.col("n_nationkey").cast("long").alias("req_id"),
        (F.col("n_nationkey") % 50).cast("long").alias("from_token_id"),
        ((F.col("n_nationkey") * 7 + 3) % 50).cast("long").alias("to_token_id"),
        (F.lit(100.0) + F.col("n_nationkey")).alias("amount_in"),
    )
    r = swap.route_via_uzig(reqs, cand)
    return r.select(
        "req_id",
        "from_token_id",
        "to_token_id",
        "amount_in",
        "sell_pool_id",
        "sell_out",
        "buy_pool_id",
        F.col("buy_out").alias("amount_out"),
        "b_per_a",
    )


# ---------------------------------------------------------------------------
# B8 driver-checked: router-leg combining (api/routes/trades.js:269-279)
# ---------------------------------------------------------------------------

ROUTER_COMBINE_ORACLE = """
WITH legs AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS tx_hash,
         (CAST(l_linenumber AS BIGINT) * 100000 + l_partkey) * 100000
           + l_suppkey AS msg_index,
         CAST(l_partkey % 100 AS BIGINT) AS pool_id,
         CASE WHEN l_returnflag = 'R' THEN 'sell' ELSE 'buy' END AS direction,
         CAST(l_shipdate AS TIMESTAMP) AS created_at,
         CAST(l_suppkey AS VARCHAR) AS signer,
         CAST(l_quantity AS DOUBLE) AS offer_amount_disp,
         CAST(floor(l_extendedprice) AS DOUBLE) AS ask_amount_disp,
         CAST(l_quantity AS DOUBLE) * 100.0 AS worth_zig,
         (l_orderkey % 3 = 0 AND l_linenumber <= 2) AS is_router
  FROM lineitem
),
g AS (
  SELECT tx_hash,
         bool_or(is_router) AS any_r,
         COUNT(*) AS cnt,
         SUM(worth_zig) AS wsum,
         string_agg(CAST(pool_id AS VARCHAR), '-' ORDER BY created_at, msg_index) AS path_all,
         first(direction ORDER BY created_at, msg_index) AS f_dir,
         first(signer ORDER BY created_at, msg_index) AS f_signer,
         first(created_at ORDER BY created_at, msg_index) AS f_ts,
         first(offer_amount_disp ORDER BY created_at, msg_index) AS f_off,
         first(ask_amount_disp ORDER BY created_at, msg_index) AS f_ask,
         first(pool_id ORDER BY created_at, msg_index) AS f_pool,
         first(worth_zig ORDER BY created_at, msg_index) AS f_worth,
         last(direction ORDER BY created_at, msg_index) AS l_dir,
         last(ask_amount_disp ORDER BY created_at, msg_index) AS l_ask,
         last(offer_amount_disp ORDER BY created_at, msg_index) AS l_off
  FROM legs GROUP BY tx_hash
)
SELECT tx_hash,
       any_r AS is_router,
       CAST(CASE WHEN any_r THEN cnt ELSE 1 END AS BIGINT) AS n_legs,
       CAST(epoch(f_ts) AS BIGINT) AS created_s,
       f_dir AS direction,
       f_signer AS signer,
       CASE WHEN any_r THEN path_all ELSE CAST(f_pool AS VARCHAR) END AS path_str,
       f_off AS amount_in_disp,
       CASE WHEN any_r THEN (CASE WHEN l_dir = 'buy' THEN l_ask ELSE l_off END)
            ELSE f_ask END AS amount_out_disp,
       CASE WHEN any_r THEN wsum ELSE f_worth END AS worth_zig,
       CASE WHEN (CASE WHEN any_r THEN wsum ELSE f_worth END) < 1000 THEN 'shrimp'
            WHEN (CASE WHEN any_r THEN wsum ELSE f_worth END) <= 10000 THEN 'shark'
            ELSE 'whale' END AS trade_class
FROM g
"""


@register("router_combine", ROUTER_COMBINE_ORACLE)
def q_router_combine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 (api/routes/trades.js:269-279 combineRouterTradesShallow):
    ALL legs of a tx fold into one record when ANY leg is
    router-flagged; an all-non-router multi-leg tx collapses to its
    first leg. lineitem orders are natural multi-leg tx groups; every
    third order is router-flagged on its first two legs so mixed txs
    (router + non-router legs) are exercised. Worth values are
    integer-valued doubles so the per-tx sum is exact in any
    aggregation order."""
    from ..plans import trades_feed as TF

    li = catalog.load_table(spark, sf_dir, "lineitem")
    legs = li.select(
        F.col("l_orderkey").cast("string").alias("tx_hash"),
        (
            (F.col("l_linenumber").cast("long") * 100000 + F.col("l_partkey"))
            * 100000
            + F.col("l_suppkey")
        ).alias("msg_index"),
        (F.col("l_partkey") % 100).cast("long").alias("pool_id"),
        F.when(F.col("l_returnflag") == "R", "sell").otherwise("buy").alias("direction"),
        F.col("l_shipdate").cast("timestamp").alias("created_at"),
        F.col("l_suppkey").cast("string").alias("signer"),
        F.col("l_quantity").cast("double").alias("offer_amount_disp"),
        F.floor(F.col("l_extendedprice")).cast("double").alias("ask_amount_disp"),
        (F.col("l_quantity").cast("double") * 100.0).alias("worth_zig"),
        ((F.col("l_orderkey") % 3 == 0) & (F.col("l_linenumber") <= 2)).alias("is_router"),
    )
    out = TF.combine_router_legs(legs)
    return out.select(
        "tx_hash",
        "is_router",
        "n_legs",
        F.unix_timestamp("created_at").alias("created_s"),
        "direction",
        "signer",
        F.array_join(F.transform("path", lambda p: p.cast("string")), "-").alias("path_str"),
        "amount_in_disp",
        "amount_out_disp",
        "worth_zig",
        "trade_class",
    )


# ---------------------------------------------------------------------------
# ST4 incremental path: minute partials -> trailing-window merge
# (plans/incremental.py; the ClickHouse-materialized-view analogue)
# ---------------------------------------------------------------------------

INC_NOW = "1998-08-02 00:00:00"
INC_WINDOW_MIN = 43200  # 30 days

INCREMENTAL_ORACLE = f"""
WITH legs AS (
  SELECT CAST(l_partkey % 100 AS BIGINT) AS pool_id,
         CASE WHEN l_returnflag = 'R' THEN 'sell' ELSE 'buy' END AS direction,
         CAST(l_shipdate AS TIMESTAMP) AS created_at,
         CAST(l_suppkey AS VARCHAR) AS signer,
         CAST(l_quantity AS BIGINT) AS offer_amount_base,
         CAST(floor(l_extendedprice) AS BIGINT) AS ask_amount_base
  FROM lineitem
)
SELECT pool_id,
       CAST(SUM(CASE WHEN direction = 'buy' THEN offer_amount_base ELSE 0 END) AS BIGINT)
         AS vol_buy_base,
       CAST(SUM(CASE WHEN direction = 'sell' THEN ask_amount_base ELSE 0 END) AS BIGINT)
         AS vol_sell_base,
       CAST(COUNT(CASE WHEN direction = 'buy' THEN 1 END) AS BIGINT) AS tx_buy,
       CAST(COUNT(CASE WHEN direction = 'sell' THEN 1 END) AS BIGINT) AS tx_sell,
       CAST(COUNT(DISTINCT signer) AS BIGINT) AS traders
FROM legs
WHERE created_at >= TIMESTAMP '{INC_NOW}' - INTERVAL {INC_WINDOW_MIN} MINUTES
  AND created_at <= TIMESTAMP '{INC_NOW}'
GROUP BY pool_id
"""


@register("incremental_rollup", INCREMENTAL_ORACLE)
def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 incremental maintenance, driver-checked: the Spark side goes
    through the PARTIAL path (plans/incremental.minute_partials ->
    trailing_volumes — per-(pool, minute) decomposed aggregates merged
    over the window) while the oracle computes the rollup DIRECTLY from
    the legs; a hash match proves the partial merge is exact, distinct
    traders included (set-union semantics). Day-aligned timestamps make
    the minute-truncated window boundary identical to the direct
    created_at filter."""
    from ..plans import incremental as INC

    li = catalog.load_table(spark, sf_dir, "lineitem")
    trades = li.select(
        (F.col("l_partkey") % 100).cast("long").alias("pool_id"),
        F.lit("swap").alias("action"),
        F.when(F.col("l_returnflag") == "R", "sell").otherwise("buy").alias("direction"),
        F.col("l_shipdate").cast("timestamp").alias("created_at"),
        F.col("l_suppkey").cast("string").alias("signer"),
        F.col("l_quantity").cast("long").alias("offer_amount_base"),
        F.floor(F.col("l_extendedprice")).cast("long").alias("ask_amount_base"),
    )
    partials = INC.minute_partials(trades)
    now = F.lit(INC_NOW).cast("timestamp")
    out = INC.trailing_volumes(partials, now, INC_WINDOW_MIN)
    return out.select(
        "pool_id",
        F.col("vol_buy_base").cast("long").alias("vol_buy_base"),
        F.col("vol_sell_base").cast("long").alias("vol_sell_base"),
        F.col("tx_buy").cast("long").alias("tx_buy"),
        F.col("tx_sell").cast("long").alias("tx_sell"),
        F.col("traders").cast("long").alias("traders"),
    )


# ---------------------------------------------------------------------------
# wallet-alert evaluation off the per-(signer, minute) partials
# (VERDICT r10: plans/alerts.eval_wallet_trade_from_partials — the 10 s
# alert tick's wallet leg reads minutes x active signers instead of the
# trailing day of raw trades). lineitem plays the swap stream: signer =
# l_suppkey % 50, direction from l_returnflag, day-aligned shipdates so
# the minute-floored window bound coincides with the direct filter. The
# oracle counts the qualifying rows per alert DIRECTLY — a hash match
# proves the partials merge + per-direction counts + throttle gate +
# window floor are exact. Alert 4's bogus direction must fire nothing;
# alert 5's shorter window exercises a different minute floor.
# ---------------------------------------------------------------------------

_WA_NOW = "1998-08-01 00:00:00"
_WA_ALERTS = [
    (1, "1", 525600, None),
    (2, "2", 525600, "buy"),
    (3, "3", 525600, "sell"),
    (4, "4", 525600, "bogus"),
    (5, "7", 43200, None),
]

WALLET_ALERT_ORACLE = f"""
WITH legs AS (
  SELECT CAST(l_suppkey % 50 AS VARCHAR) AS address,
         CASE WHEN l_returnflag = 'R' THEN 'sell' ELSE 'buy' END AS dir,
         CAST(l_shipdate AS TIMESTAMP) AS created_at
  FROM lineitem
),
alerts(alert_id, address, since_min, want_dir) AS (
  VALUES {", ".join(f"({i}, '{a}', {m}, {repr(d) if d else 'NULL'})" for i, a, m, d in _WA_ALERTS)}
)
SELECT CAST(a.alert_id AS BIGINT) AS alert_id,
       a.address,
       CAST(COUNT(*) AS BIGINT) AS n_trades
FROM alerts a JOIN legs l ON l.address = a.address
WHERE l.created_at >= date_trunc('minute',
        TIMESTAMP '{_WA_NOW}' - to_minutes(a.since_min))
  AND (a.want_dir IS NULL OR l.dir = a.want_dir)
GROUP BY 1, 2
HAVING COUNT(*) > 0
"""

from . import register_extended  # noqa: E402


@register_extended("wallet_alert_partials", WALLET_ALERT_ORACLE)
def q_wallet_alert_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json

    from .. import schemas as S
    from ..plans import alerts as AL
    from ..plans import incremental as INC

    li = catalog.load_table(spark, sf_dir, "lineitem")
    direction = F.when(F.col("l_returnflag") == "R", "sell").otherwise("buy")
    trades = li.select(
        F.lit("swap").alias("action"),
        (F.col("l_suppkey") % 50).cast("string").alias("signer"),
        direction.alias("direction"),
        F.col("l_shipdate").cast("timestamp").alias("created_at"),
        # route the uzig leg by direction so the decimal sums exercise
        # both partial columns (their values are not compared here —
        # the alert predicate needs only the counts)
        F.when(direction == "buy", F.lit("uzig")).otherwise(F.lit("x"))
         .alias("offer_asset_denom"),
        F.col("l_quantity").cast("decimal(38,0)").alias("offer_amount_base"),
        F.when(direction == "sell", F.lit("uzig")).otherwise(F.lit("x"))
         .alias("ask_asset_denom"),
        F.floor(F.col("l_extendedprice")).cast("decimal(38,0)")
         .alias("return_amount_base"),
    )
    alerts = spark.createDataFrame(
        [
            (i, None, "wallet_trade",
             _json.dumps({"address": a, "since_min": m,
                          **({"direction": d} if d else {})}),
             300, None, True)
            for i, a, m, d in _WA_ALERTS
        ],
        S.ALERTS,
    )
    now = F.lit(_WA_NOW).cast("timestamp")
    out = AL.eval_wallet_trade_from_partials(
        alerts, INC.signer_minute_partials(trades), now, max_since_min=525600
    )
    return out.select("alert_id", "address", "n_trades")
