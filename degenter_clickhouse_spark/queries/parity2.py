"""Second parity batch: parsing scalars (P2/P5-P11), business math
(B1/B2), TVL fallback chain (A13), mcap/FDV (A14), join shapes
(J11/J12/J13), orderings (O5/O7/O8), full-frame windows (W2), unions
(U1). Inputs that the driver tables don't provide (asset strings, pair
names) are synthesized deterministically inside the query in BOTH
dialects, so the parse operators themselves are what's compared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import catalog
from ..functions import business, parse
from ..operators import latest, ohlcv
from . import register
from .core import CHANGE_CUTOFF, DEC, O_TICKS, dsum, epoch, o_bars, o_dsum, spark_bars
from ..operators.joins import dim_broadcast

# ---------------------------------------------------------------------------
# P2: sha256 tx-hash derivation
# ---------------------------------------------------------------------------


SHA256_ORACLE = "SELECT doc_id, upper(sha256(text)) AS tx_hash FROM documents"


# registered via queries.suites.string_hash_suite (driver 50-entry cap)
def q_sha256(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = catalog.load_table(spark, sf_dir, "documents")
    return d.select("doc_id", parse.sha256_hex_upper(F.col("text")).alias("tx_hash"))


# ---------------------------------------------------------------------------
# Deterministic natural-key ids (cityHash64 analogue) + dim join
# ---------------------------------------------------------------------------

HASH_ID_ORACLE = f"""
SELECT md5(c_name) AS cust_hash,
       COUNT(o_orderkey) AS n_orders,
       {o_dsum("COALESCE(o_totalprice, 0)")} AS total_spent
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY md5(c_name)
"""


# registered via queries.suites.string_hash_suite
def q_hash_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = catalog.load_table(spark, sf_dir, "customer")
    o = catalog.load_table(spark, sf_dir, "orders")
    j = c.join(o, on=[F.col("o_custkey") == F.col("c_custkey")], how="left")
    return j.groupBy(F.md5(F.col("c_name")).alias("cust_hash")).agg(
        F.count("o_orderkey").alias("n_orders"),
        dsum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))).alias("total_spent"),
    )


# ---------------------------------------------------------------------------
# P5/P6: assets-list parse ('123denom,456denom2' -> rows)
# ---------------------------------------------------------------------------

ASSETS_ORACLE = r"""
SELECT l_orderkey, l_linenumber,
       CAST(regexp_extract(piece, '^(\d+)', 1) AS BIGINT) AS amount_base,
       regexp_extract(piece, '^\d+([a-zA-Z0-9.\-_/]+)$', 1) AS denom
FROM (
  SELECT l_orderkey, l_linenumber,
         unnest(string_split(
           CAST(l_partkey AS VARCHAR) || 'ucoin,' ||
           CAST(l_suppkey AS VARCHAR) || 'factory/zig1x/utok', ',')) AS piece
  FROM lineitem
)
"""


# registered via queries.suites.parsing_suite
def q_parse_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = catalog.load_table(spark, sf_dir, "lineitem")
    assets_str = F.concat(
        F.col("l_partkey").cast("string"),
        F.lit("ucoin,"),
        F.col("l_suppkey").cast("string"),
        F.lit("factory/zig1x/utok"),
    )
    parsed = li.select(
        "l_orderkey",
        "l_linenumber",
        F.explode(parse.parse_assets_list(assets_str)).alias("a"),
    )
    return parsed.select(
        "l_orderkey",
        "l_linenumber",
        F.col("a.amount_base").cast("bigint").alias("amount_base"),
        F.col("a.denom").alias("denom"),
    )


# ---------------------------------------------------------------------------
# P9/P10: pair normalization (force uzig to quote side) + direction
# ---------------------------------------------------------------------------

PAIR_ORACLE = """
SELECT p_partkey, base_denom, quote_denom,
       CASE WHEN offer_denom = quote_denom THEN 'buy' ELSE 'sell' END AS direction
FROM (
  SELECT p_partkey,
         CASE WHEN split_part(pair, '-', 1) = 'uzig'
              THEN regexp_replace(pair, '^[^-]*-', '')
              ELSE split_part(pair, '-', 1) END AS base_denom,
         CASE WHEN split_part(pair, '-', 1) = 'uzig'
              THEN 'uzig'
              ELSE regexp_replace(pair, '^[^-]*-', '') END AS quote_denom,
         CASE WHEN p_partkey % 2 = 0 THEN
           CASE WHEN split_part(pair, '-', 1) = 'uzig' THEN 'uzig'
                ELSE regexp_replace(pair, '^[^-]*-', '') END
         ELSE
           CASE WHEN split_part(pair, '-', 1) = 'uzig'
                THEN regexp_replace(pair, '^[^-]*-', '')
                ELSE split_part(pair, '-', 1) END
         END AS offer_denom
  FROM (
    SELECT p_partkey,
           CASE p_partkey % 3
             WHEN 0 THEN 'uzig-' || p_brand
             WHEN 1 THEN p_brand || '-uzig'
             ELSE p_brand || '-' || p_name
           END AS pair
    FROM part
  )
)
"""


# registered via queries.suites.parsing_suite
def q_pair_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = catalog.load_table(spark, sf_dir, "part")
    pair = (
        F.when(F.col("p_partkey") % 3 == 0, F.concat(F.lit("uzig-"), F.col("p_brand")))
        .when(F.col("p_partkey") % 3 == 1, F.concat(F.col("p_brand"), F.lit("-uzig")))
        .otherwise(F.concat(F.col("p_brand"), F.lit("-"), F.col("p_name")))
    )
    norm = parse.normalize_pair(pair)
    out = p.select("p_partkey", norm.alias("n"))
    offer = F.when(
        F.col("p_partkey") % 2 == 0, F.col("n.quote_denom")
    ).otherwise(F.col("n.base_denom"))
    return out.select(
        "p_partkey",
        F.col("n.base_denom").alias("base_denom"),
        F.col("n.quote_denom").alias("quote_denom"),
        parse.classify_direction(offer, F.col("n.quote_denom")).alias("direction"),
    )


# ---------------------------------------------------------------------------
# P11: display scaling with exponent fallback
# ---------------------------------------------------------------------------

SCALING_ORACLE = """
SELECT event_id,
       amount_base,
       amount_base / pow(10.0, COALESCE(exp, 6)) AS amount_disp
FROM (
  SELECT event_id,
         CAST(floor(value * 1000000) AS BIGINT) AS amount_base,
         CASE user_id % 4 WHEN 0 THEN 6 WHEN 1 THEN 8 WHEN 2 THEN 0 END AS exp
  FROM events
)
"""


# registered via queries.suites.parsing_suite
def q_display_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog.load_table(spark, sf_dir, "events")
    amount = F.floor(F.col("value") * 1000000).cast("bigint")
    exp = (
        F.when(F.col("user_id") % 4 == 0, 6)
        .when(F.col("user_id") % 4 == 1, 8)
        .when(F.col("user_id") % 4 == 2, 0)
    )
    base = ev.select(
        "event_id", amount.alias("amount_base"), exp.alias("exp")
    )
    return base.select(
        "event_id",
        "amount_base",
        parse.to_display(F.col("amount_base"), F.col("exp")).alias("amount_disp"),
    )


# ---------------------------------------------------------------------------
# B1: pair-type fee parse (when-chain + regexp bps)
# ---------------------------------------------------------------------------

FEE_ORACLE = r"""
SELECT p_partkey, pair_type,
       CASE WHEN pair_type = 'xyk' THEN 0.0001
            WHEN pair_type = 'concentrated' THEN 0.01
            WHEN regexp_matches(pair_type, '^xyk_\d+$')
              THEN CAST(regexp_extract(pair_type, '^xyk_(\d+)$', 1) AS DOUBLE) / 10000.0
            ELSE 0.003 END AS fee
FROM (
  SELECT p_partkey,
         CASE p_partkey % 4
           WHEN 0 THEN 'xyk'
           WHEN 1 THEN 'concentrated'
           WHEN 2 THEN 'xyk_' || CAST((p_size % 100) * 10 AS VARCHAR)
           ELSE lower(p_brand)
         END AS pair_type
  FROM part
)
"""


def _pair_type_col() -> F.Column:
    return (
        F.when(F.col("p_partkey") % 4 == 0, F.lit("xyk"))
        .when(F.col("p_partkey") % 4 == 1, F.lit("concentrated"))
        .when(
            F.col("p_partkey") % 4 == 2,
            F.concat(F.lit("xyk_"), ((F.col("p_size") % 100) * 10).cast("string")),
        )
        .otherwise(F.lower(F.col("p_brand")))
    )


# registered via queries.suites.swap_math_suite
def q_fee_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = catalog.load_table(spark, sf_dir, "part")
    base = p.select("p_partkey", _pair_type_col().alias("pair_type"))
    return base.select(
        "p_partkey", "pair_type", business.pair_fee(F.col("pair_type")).alias("fee")
    )


# ---------------------------------------------------------------------------
# B2: constant-product swap simulation (pure math, fee-on-input)
# ---------------------------------------------------------------------------

XYK_ORACLE = r"""
SELECT p_partkey,
       (amount_in * (1.0 - fee) * r_out) / (r_in + amount_in * (1.0 - fee)) AS out,
       CASE WHEN from_is_zig
            THEN amount_in / ((amount_in * (1.0 - fee) * r_out) / (r_in + amount_in * (1.0 - fee)))
            ELSE ((amount_in * (1.0 - fee) * r_out) / (r_in + amount_in * (1.0 - fee))) / amount_in
       END AS exec_price,
       rz / rt AS mid_price
FROM (
  SELECT p_partkey, rz, rt, fee, from_is_zig, amount_in,
         CASE WHEN from_is_zig THEN rz ELSE rt END AS r_in,
         CASE WHEN from_is_zig THEN rt ELSE rz END AS r_out
  FROM (
    SELECT p_partkey,
           p_retailprice * 1000.0 AS rz,
           (p_size * 500.0) + 1.0 AS rt,
           CASE WHEN pair_type = 'xyk' THEN 0.0001
                WHEN pair_type = 'concentrated' THEN 0.01
                WHEN regexp_matches(pair_type, '^xyk_\d+$')
                  THEN CAST(regexp_extract(pair_type, '^xyk_(\d+)$', 1) AS DOUBLE) / 10000.0
                ELSE 0.003 END AS fee,
           p_partkey % 2 = 0 AS from_is_zig,
           100.0 AS amount_in
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
  )
)
"""


# registered via queries.suites.swap_math_suite
def q_xyk_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = catalog.load_table(spark, sf_dir, "part")
    base = p.select(
        "p_partkey",
        (F.col("p_retailprice") * 1000.0).alias("rz"),
        ((F.col("p_size") * 500.0) + 1.0).alias("rt"),
        business.pair_fee(_pair_type_col()).alias("fee"),
        (F.col("p_partkey") % 2 == 0).alias("from_is_zig"),
        F.lit(100.0).alias("amount_in"),
    )
    sim = business.simulate_xyk(
        F.col("from_is_zig"),
        F.col("amount_in"),
        F.col("rz"),
        F.col("rt"),
        F.col("fee"),
    )
    return base.select("p_partkey", sim.alias("s")).select(
        "p_partkey",
        F.col("s.out").alias("out"),
        F.col("s.exec_price").alias("exec_price"),
        F.col("s.mid_price").alias("mid_price"),
    )


# ---------------------------------------------------------------------------
# B4 + F10: same-pool direct quote with TVL floor and default amounts
# (api/routes/swap.js:98-126 — the single-pool quote endpoint: pools
# below the TVL floor are not quotable; the buy side quotes the ~$100
# ZIG notional, the sell side divides by the pool mid to get a token
# amount in). Completes B4's CORRECTNESS row (VERDICT r11 #7).
# ---------------------------------------------------------------------------

DIRECT_QUOTE_ORACLE = r"""
SELECT p_partkey,
       amount_in,
       (amount_in * (1.0 - fee) * r_out) / (r_in + amount_in * (1.0 - fee)) AS out,
       CASE WHEN side_is_buy
            THEN amount_in / ((amount_in * (1.0 - fee) * r_out) / (r_in + amount_in * (1.0 - fee)))
            ELSE ((amount_in * (1.0 - fee) * r_out) / (r_in + amount_in * (1.0 - fee))) / amount_in
       END AS exec_price
FROM (
  SELECT p_partkey, side_is_buy, fee,
         CASE WHEN side_is_buy THEN rz ELSE rt END AS r_in,
         CASE WHEN side_is_buy THEN rt ELSE rz END AS r_out,
         CASE WHEN side_is_buy THEN 100.0 / 0.02
              ELSE (100.0 / 0.02) / (rz / rt) END AS amount_in
  FROM (
    SELECT p_partkey,
           p_retailprice * 1000.0 AS rz,
           (p_size * 500.0) + 1.0 AS rt,
           CASE WHEN pair_type = 'xyk' THEN 0.0001
                WHEN pair_type = 'concentrated' THEN 0.01
                WHEN regexp_matches(pair_type, '^xyk_\d+$')
                  THEN CAST(regexp_extract(pair_type, '^xyk_(\d+)$', 1) AS DOUBLE) / 10000.0
                ELSE 0.003 END AS fee,
           p_partkey % 2 = 0 AS side_is_buy
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
  )
  WHERE rz * 2.0 >= 1820000.0
)
"""


# registered via queries.suites.swap_math_suite
def q_direct_pool_quote(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.swap import default_amount_zig

    p = catalog.load_table(spark, sf_dir, "part")
    base = p.select(
        "p_partkey",
        (F.col("p_retailprice") * 1000.0).alias("rz"),
        ((F.col("p_size") * 500.0) + 1.0).alias("rt"),
        business.pair_fee(_pair_type_col()).alias("fee"),
        (F.col("p_partkey") % 2 == 0).alias("side_is_buy"),
    ).filter(F.col("rz") * 2.0 >= 1820000.0)  # F10 TVL floor
    fx = F.lit(0.02)
    mid = F.col("rz") / F.col("rt")
    amount = F.when(
        F.col("side_is_buy"), default_amount_zig(fx, True)
    ).otherwise(default_amount_zig(fx, False, mid))
    base = base.withColumn("amount_in", amount)
    sim = business.simulate_xyk(
        F.col("side_is_buy"),
        F.col("amount_in"),
        F.col("rz"),
        F.col("rt"),
        F.col("fee"),
    )
    return base.select("p_partkey", "amount_in", sim.alias("s")).select(
        "p_partkey",
        "amount_in",
        F.col("s.out").alias("out"),
        F.col("s.exec_price").alias("exec_price"),
    )


# ---------------------------------------------------------------------------
# A13: price fallback chain (direct -> any-pool -> ohlcv close -> 0)
# ---------------------------------------------------------------------------

TVL_ORACLE = f"""
WITH t AS ({O_TICKS}),
pools AS (SELECT DISTINCT pool_id FROM t),
direct AS (
  SELECT pool_id, price FROM (
    SELECT pool_id, price, row_number() OVER (PARTITION BY pool_id
            ORDER BY ts DESC, event_id DESC) rn
    FROM t WHERE event_type = 'purchase') WHERE rn = 1
),
anyp AS (
  SELECT pool_id, price FROM (
    SELECT pool_id, price, row_number() OVER (PARTITION BY pool_id
            ORDER BY ts DESC, event_id DESC) rn
    FROM t WHERE event_type = 'view') WHERE rn = 1
),
bars AS ({o_bars(3600)}),
barlast AS (
  SELECT pool_id, close FROM (
    SELECT pool_id, close, row_number() OVER (PARTITION BY pool_id
            ORDER BY bucket_ts DESC) rn FROM bars) WHERE rn = 1
)
SELECT p.pool_id,
       COALESCE(d.price, a.price, b.close, 0.0) AS price_used,
       CASE WHEN d.price IS NOT NULL THEN 'direct'
            WHEN a.price IS NOT NULL THEN 'any_pool'
            WHEN b.close IS NOT NULL THEN 'ohlcv'
            ELSE 'none' END AS price_source
FROM pools p
LEFT JOIN direct d ON d.pool_id = p.pool_id
LEFT JOIN anyp a ON a.pool_id = p.pool_id
LEFT JOIN barlast b ON b.pool_id = p.pool_id
"""


# registered via queries.suites.valuation_suite
def q_price_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = catalog.ticks(spark, sf_dir)
    pools = t.select("pool_id").distinct()
    direct = latest.latest_by(
        t.filter(F.col("event_type") == "purchase"),
        keys=["pool_id"], values=["price"], order=["ts", "event_id"],
    ).withColumnRenamed("price", "direct_price")
    anyp = latest.latest_by(
        t.filter(F.col("event_type") == "view"),
        keys=["pool_id"], values=["price"], order=["ts", "event_id"],
    ).withColumnRenamed("price", "any_price")
    bars = spark_bars(spark, sf_dir, 3600)
    barlast = latest.latest_by(
        bars, keys=["pool_id"], values=["close"], order=["bucket_start"]
    ).withColumnRenamed("close", "bar_close")
    j = (
        pools.join(dim_broadcast(direct), "pool_id", "left")
        .join(dim_broadcast(anyp), "pool_id", "left")
        .join(dim_broadcast(barlast), "pool_id", "left")
    )
    return j.select(
        "pool_id",
        F.coalesce(
            F.col("direct_price"), F.col("any_price"), F.col("bar_close"), F.lit(0.0)
        ).alias("price_used"),
        F.when(F.col("direct_price").isNotNull(), "direct")
        .when(F.col("any_price").isNotNull(), "any_pool")
        .when(F.col("bar_close").isNotNull(), "ohlcv")
        .otherwise("none")
        .alias("price_source"),
    )


# ---------------------------------------------------------------------------
# A14: market cap / FDV from supply x latest price
# ---------------------------------------------------------------------------

MCAP_ORACLE = f"""
WITH t AS ({O_TICKS}),
supply AS (
  SELECT pool_id, {o_dsum("CASE WHEN event_type = 'purchase' THEN price ELSE 0 END")} AS circ
  FROM t GROUP BY pool_id
),
px AS (
  SELECT pool_id, price FROM (
    SELECT pool_id, price, row_number() OVER (PARTITION BY pool_id
            ORDER BY ts DESC, event_id DESC) rn FROM t) WHERE rn = 1
)
SELECT s.pool_id, s.circ, p.price,
       s.circ * p.price AS mcap,
       (s.circ * 2.0) * p.price AS fdv
FROM supply s JOIN px p ON p.pool_id = s.pool_id
"""


# registered via queries.suites.valuation_suite
def q_mcap_fdv(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = catalog.ticks(spark, sf_dir)
    supply = t.groupBy("pool_id").agg(
        dsum(
            F.when(F.col("event_type") == "purchase", F.col("price")).otherwise(0.0)
        ).alias("circ")
    )
    px = latest.latest_by(t, keys=["pool_id"], values=["price"], order=["ts", "event_id"])
    j = supply.join(dim_broadcast(px), "pool_id")
    return j.select(
        "pool_id",
        "circ",
        "price",
        (F.col("circ") * F.col("price")).alias("mcap"),
        ((F.col("circ") * 2.0) * F.col("price")).alias("fdv"),
    )


# ---------------------------------------------------------------------------
# J11: sums/firsts/lasts joined USING (bucket) — alternative resample form
# ---------------------------------------------------------------------------

USING_ORACLE = f"""
WITH t AS (
  SELECT *, CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS bucket_ts
  FROM ({O_TICKS})
),
sums AS (
  SELECT bucket_ts, {o_dsum("price")} AS volume, COUNT(*) AS n
  FROM t GROUP BY bucket_ts
),
firsts AS (
  SELECT bucket_ts, price AS first_price FROM (
    SELECT bucket_ts, price, row_number() OVER (PARTITION BY bucket_ts
            ORDER BY ts ASC, event_id ASC) rn FROM t) WHERE rn = 1
),
lasts AS (
  SELECT bucket_ts, price AS last_price FROM (
    SELECT bucket_ts, price, row_number() OVER (PARTITION BY bucket_ts
            ORDER BY ts DESC, event_id DESC) rn FROM t) WHERE rn = 1
)
SELECT s.bucket_ts, s.volume, s.n, f.first_price, l.last_price
FROM sums s
LEFT JOIN firsts f USING (bucket_ts)
LEFT JOIN lasts l USING (bucket_ts)
"""


# registered via queries.suites.join_parity_suite
def q_join_using(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = catalog.ticks(spark, sf_dir).withColumn(
        "bucket_ts", (F.unix_timestamp("ts") / 3600).cast("long") * 3600
    )
    order = F.struct(F.col("ts"), F.col("event_id"))
    sums = t.groupBy("bucket_ts").agg(
        dsum("price").alias("volume"), F.count(F.lit(1)).alias("n")
    )
    firsts = t.groupBy("bucket_ts").agg(
        F.min_by(F.col("price"), order).alias("first_price")
    )
    lasts = t.groupBy("bucket_ts").agg(
        F.max_by(F.col("price"), order).alias("last_price")
    )
    return sums.join(firsts, "bucket_ts", "left").join(lasts, "bucket_ts", "left")


# ---------------------------------------------------------------------------
# J12: cross join of 1-row CTEs (global change%)
# ---------------------------------------------------------------------------

SCALAR_CHANGE_ORACLE = f"""
WITH t AS ({O_TICKS}),
lastv AS (
  SELECT price AS last_value FROM (
    SELECT price, row_number() OVER (ORDER BY ts DESC, event_id DESC) rn FROM t)
  WHERE rn = 1
),
prevv AS (
  SELECT price AS prev_value FROM (
    SELECT price, row_number() OVER (ORDER BY ts DESC, event_id DESC) rn
    FROM t WHERE ts <= TIMESTAMP '{CHANGE_CUTOFF}')
  WHERE rn = 1
)
SELECT last_value, prev_value,
       (last_value - prev_value) / prev_value * 100.0 AS change_pct
FROM lastv, prevv
"""


# registered via queries.suites.join_parity_suite
def q_scalar_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = catalog.ticks(spark, sf_dir)
    order = F.struct(F.col("ts"), F.col("event_id"))
    lastv = t.agg(F.max_by(F.col("price"), order).alias("last_value"))
    cutoff = F.lit(CHANGE_CUTOFF).cast("timestamp")
    tf = t.filter(F.col("ts") <= cutoff)
    prevv = tf.agg(F.max_by(F.col("price"), order).alias("prev_value"))
    j = lastv.crossJoin(prevv)
    return j.select(
        "last_value",
        "prev_value",
        ((F.col("last_value") - F.col("prev_value")) / F.col("prev_value") * 100.0).alias(
            "change_pct"
        ),
    )


# ---------------------------------------------------------------------------
# J13: multi-condition join (key + literal)
# ---------------------------------------------------------------------------

MULTICOND_ORACLE = """
SELECT c_custkey AS custkey,
       COUNT(o_orderkey) AS n_f_orders
FROM customer LEFT JOIN orders
  ON o_custkey = c_custkey AND o_orderstatus = 'F'
GROUP BY c_custkey
"""


# registered via queries.suites.join_parity_suite
def q_multicond(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = catalog.load_table(spark, sf_dir, "customer")
    o = catalog.load_table(spark, sf_dir, "orders")
    j = c.join(
        o,
        on=[(F.col("o_custkey") == F.col("c_custkey")) & (F.col("o_orderstatus") == "F")],
        how="left",
    )
    return j.groupBy(F.col("c_custkey").alias("custkey")).agg(
        F.count("o_orderkey").alias("n_f_orders")
    )


# ---------------------------------------------------------------------------
# O5: gainers / losers by change% (no oversampling — full relational top-k)
# ---------------------------------------------------------------------------

GAINERS_ORACLE = f"""
WITH t AS ({O_TICKS}),
lastv AS (
  SELECT pool_id, price AS last_value FROM (
    SELECT *, row_number() OVER (PARTITION BY pool_id
            ORDER BY ts DESC, event_id DESC) rn FROM t) WHERE rn = 1
),
prevv AS (
  SELECT pool_id, price AS prev_value FROM (
    SELECT *, row_number() OVER (PARTITION BY pool_id
            ORDER BY ts DESC, event_id DESC) rn
    FROM t WHERE ts <= TIMESTAMP '{CHANGE_CUTOFF}') WHERE rn = 1
),
ch AS (
  SELECT l.pool_id,
         (l.last_value - p.prev_value) / p.prev_value * 100.0 AS change_pct
  FROM lastv l JOIN prevv p ON l.pool_id = p.pool_id
  WHERE p.prev_value <> 0
),
g AS (SELECT pool_id, change_pct, 'gainer' AS side FROM ch
      ORDER BY change_pct DESC, pool_id ASC LIMIT 3),
l AS (SELECT pool_id, change_pct, 'loser' AS side FROM ch
      ORDER BY change_pct ASC, pool_id ASC LIMIT 3)
SELECT * FROM g UNION ALL SELECT * FROM l
"""


@register("gainers_losers", GAINERS_ORACLE)
def q_gainers_losers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = catalog.ticks(spark, sf_dir)
    cutoff = F.lit(CHANGE_CUTOFF).cast("timestamp")
    ch = (
        ohlcv.change_pct(t, cutoff, pool="pool_id", value="price", ts="ts", seq="event_id")
        .filter(F.col("prev_value") != 0)
        .select("pool_id", "change_pct")
    )
    g = (
        ch.orderBy(F.col("change_pct").desc(), F.col("pool_id").asc())
        .limit(3)
        .withColumn("side", F.lit("gainer"))
    )
    lo = (
        ch.orderBy(F.col("change_pct").asc(), F.col("pool_id").asc())
        .limit(3)
        .withColumn("side", F.lit("loser"))
    )
    return g.unionByName(lo)


# ---------------------------------------------------------------------------
# O7/F7: boolean-priority ordering + NOT LIKE filter
# ---------------------------------------------------------------------------

PRIORITY_ORACLE = """
SELECT p_partkey, p_type, is_standard FROM (
  SELECT p_partkey, p_type, p_type LIKE 'STANDARD%' AS is_standard
  FROM part WHERE p_type NOT LIKE 'SMALL%'
)
ORDER BY is_standard DESC, p_partkey ASC
LIMIT 30
"""


# registered via queries.suites.ordering_suite
def q_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = catalog.load_table(spark, sf_dir, "part")
    out = (
        p.filter(~F.col("p_type").startswith("SMALL"))
        .select(
            "p_partkey",
            "p_type",
            F.col("p_type").startswith("STANDARD").alias("is_standard"),
        )
        .orderBy(F.col("is_standard").desc(), F.col("p_partkey").asc())
        .limit(30)
    )
    return out


# ---------------------------------------------------------------------------
# O8: multi-key relevance resolution (best match per group)
# ---------------------------------------------------------------------------

RESOLVE_ORACLE = """
SELECT c_nationkey AS nationkey, c_custkey AS best_custkey, relevance
FROM (
  SELECT *, row_number() OVER (PARTITION BY c_nationkey
          ORDER BY relevance ASC, c_custkey ASC) AS rn
  FROM (
    SELECT c_nationkey, c_custkey,
           CASE WHEN c_mktsegment = 'BUILDING' THEN 0
                WHEN lower(c_mktsegment) LIKE 'a%' THEN 1
                ELSE 2 END AS relevance
    FROM customer
  )
)
WHERE rn = 1
"""


# registered via queries.suites.ordering_suite
def q_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = catalog.load_table(spark, sf_dir, "customer")
    relevance = (
        F.when(F.col("c_mktsegment") == "BUILDING", 0)
        .when(F.lower(F.col("c_mktsegment")).startswith("a"), 1)
        .otherwise(2)
    )
    base = c.select("c_nationkey", "c_custkey", relevance.alias("relevance"))
    best = base.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.min_by(
            F.struct(F.col("c_custkey"), F.col("relevance")),
            F.struct(F.col("relevance"), F.col("c_custkey")),
        ).alias("b")
    )
    return best.select(
        "nationkey",
        F.col("b.c_custkey").alias("best_custkey"),
        F.col("b.relevance").alias("relevance"),
    )


# ---------------------------------------------------------------------------
# W2: first/last value over full frame (PG leftover form of A8)
# ---------------------------------------------------------------------------

FIRSTLAST_ORACLE = f"""
SELECT DISTINCT pool_id,
       CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_ts,
       first_value(price) OVER w AS first_price,
       last_value(price) OVER w AS last_price
FROM ({O_TICKS})
WINDOW w AS (PARTITION BY pool_id, date_trunc('day', ts)
             ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# registered via queries.suites.session_frames
def q_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = catalog.ticks(spark, sf_dir).withColumn("day", F.date_trunc("day", F.col("ts")))
    w = (
        Window.partitionBy("pool_id", "day")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        t.select(
            "pool_id",
            F.unix_timestamp("day").alias("day_ts"),
            F.first("price").over(w).alias("first_price"),
            F.last("price").over(w).alias("last_price"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# U1/U2: unionByName of event streams + regroup (router-leg merge shape)
# ---------------------------------------------------------------------------

UNION_ORACLE = f"""
WITH legs AS (
  SELECT pool_id, price, 'provide' AS leg FROM ({O_TICKS}) WHERE event_type = 'purchase'
  UNION ALL
  SELECT pool_id, price, 'withdraw' AS leg FROM ({O_TICKS}) WHERE event_type = 'view'
)
SELECT pool_id, COUNT(*) AS n_legs,
       {o_dsum("price")} AS combined_value,
       CAST(SUM(CASE WHEN leg = 'provide' THEN 1 ELSE 0 END) AS BIGINT) AS n_provide
FROM legs GROUP BY pool_id
"""


# registered via queries.suites.set_join_suite
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = catalog.ticks(spark, sf_dir)
    provides = t.filter(F.col("event_type") == "purchase").select(
        "pool_id", "price", F.lit("provide").alias("leg")
    )
    withdraws = t.filter(F.col("event_type") == "view").select(
        "pool_id", "price", F.lit("withdraw").alias("leg")
    )
    legs = provides.unionByName(withdraws)
    return legs.groupBy("pool_id").agg(
        F.count(F.lit(1)).alias("n_legs"),
        dsum("price").alias("combined_value"),
        F.sum(F.when(F.col("leg") == "provide", 1).otherwise(0)).alias("n_provide"),
    )
