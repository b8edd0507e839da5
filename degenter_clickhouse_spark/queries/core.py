"""Reference-parity operator queries over the driver tables.

Each query exercises one row of SURVEY.md §2's operator inventory,
mapped onto the TPC-H-ish driver tables (events plays the tick/trade
stream, lineitem the fact table, customer/nation the dimensions), and
carries a DuckDB oracle that must hash-match at sf=0.01.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import catalog
from ..operators import dedupe, joins, latest, ohlcv, topk
from . import register, register_extended
from ..operators.joins import dim_broadcast

DEC = "decimal(25,6)"


def dsum(c: str | Column) -> Column:
    """Order-insensitive double sum: exact decimal accumulate, double out."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast(DEC)).cast("double")


def o_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"


def epoch(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.unix_timestamp(col)


# Shared oracle CTE: events shaped as ticks (catalog.ticks twin).
O_TICKS = (
    "SELECT user_id AS pool_id, value AS price, event_id, event_type, ts "
    "FROM events"
)


def o_bars(step: int) -> str:
    """Oracle twin of operators.ohlcv.bars on the ticks view."""
    return f"""
    SELECT pool_id, bucket_ts,
           MAX(CASE WHEN rn_a = 1 THEN price END) AS open,
           MAX(price) AS high,
           MIN(price) AS low,
           MAX(CASE WHEN rn_d = 1 THEN price END) AS close,
           SUM(CAST(price AS DECIMAL(25,6))) AS volume,
           COUNT(*) AS trade_count
    FROM (
      SELECT *,
             row_number() OVER (PARTITION BY pool_id, bucket_ts
                                ORDER BY ts ASC, event_id ASC) AS rn_a,
             row_number() OVER (PARTITION BY pool_id, bucket_ts
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM (
        SELECT pool_id, price, event_id, ts,
               CAST(floor(epoch(ts) / {step}) AS BIGINT) * {step} AS bucket_ts
        FROM ({O_TICKS})
      )
    )
    GROUP BY pool_id, bucket_ts
    """


def spark_bars(spark: SparkSession, sf_dir: str, step: int) -> DataFrame:
    t = catalog.ticks(spark, sf_dir)
    return ohlcv.bars(
        t,
        step_sec=step,
        seq="event_id",
        qty=F.col("price").cast(DEC),
    )


def _bars_out(b: DataFrame) -> DataFrame:
    return b.select(
        "pool_id",
        epoch("bucket_start").alias("bucket_ts"),
        "open",
        "high",
        "low",
        "close",
        F.col("volume").cast("double").alias("volume"),
        "trade_count",
    )


# ---------------------------------------------------------------------------
# Flagship: pricing summary (F2 range filter + A1/A2/A6 aggregates)
# ---------------------------------------------------------------------------

PRICING_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {o_dsum("l_quantity")} AS sum_qty,
       {o_dsum("l_extendedprice")} AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1.0 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
            AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("pricing_summary", PRICING_ORACLE)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = catalog.load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1.0).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1999-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count(F.lit(1))).alias(
                "avg_qty"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# A1/A2/A3: conditional sums/counts + exact distinct (sumIf/countIf/uniqExact)
# ---------------------------------------------------------------------------

CONDITIONAL_ORACLE = f"""
SELECT pool_id,
       {o_dsum("CASE WHEN event_type = 'purchase' THEN price ELSE 0 END")} AS buy_volume,
       {o_dsum("CASE WHEN event_type = 'view' THEN price ELSE 0 END")} AS sell_volume,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS tx_buy,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS tx_sell,
       COUNT(DISTINCT CAST(ts AS DATE)) AS active_days
FROM ({O_TICKS})
GROUP BY pool_id
"""


@register("conditional_rollup", CONDITIONAL_ORACLE)
def q_conditional_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = catalog.ticks(spark, sf_dir)
    is_buy = F.col("event_type") == "purchase"
    is_sell = F.col("event_type") == "view"
    return t.groupBy("pool_id").agg(
        dsum(F.when(is_buy, F.col("price")).otherwise(0.0)).alias("buy_volume"),
        dsum(F.when(is_sell, F.col("price")).otherwise(0.0)).alias("sell_volume"),
        F.sum(F.when(is_buy, 1).otherwise(0)).alias("tx_buy"),
        F.sum(F.when(is_sell, 1).otherwise(0)).alias("tx_sell"),
        F.countDistinct(F.to_date("ts")).alias("active_days"),
    )


# ---------------------------------------------------------------------------
# J4/A4: decorrelated latest-row view (argMax / max_by)
# ---------------------------------------------------------------------------

LATEST_ORACLE = f"""
SELECT pool_id, price AS last_price, event_type AS last_type,
       CAST(floor(epoch(ts)) AS BIGINT) AS last_ts
FROM (
  SELECT *, row_number() OVER (PARTITION BY pool_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM ({O_TICKS})
)
WHERE rn = 1
"""


@register_extended("latest_value", LATEST_ORACLE)
def q_latest_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = catalog.ticks(spark, sf_dir)
    out = latest.latest_by(
        t,
        keys=["pool_id"],
        values=["price", "event_type", "ts"],
        order=["ts", "event_id"],
    )
    return out.select(
        "pool_id",
        F.col("price").alias("last_price"),
        F.col("event_type").alias("last_type"),
        epoch("ts").alias("last_ts"),
    )


# ---------------------------------------------------------------------------
# A5/O4: earliest-row view (argMin / min_by) — first order per customer
# ---------------------------------------------------------------------------

EARLIEST_ORACLE = """
SELECT o_custkey AS custkey, o_orderkey AS first_orderkey,
       o_totalprice AS first_totalprice,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS first_order_ts
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn = 1
"""


@register_extended("earliest_value", EARLIEST_ORACLE)
def q_earliest_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = catalog.load_table(spark, sf_dir, "orders")
    out = latest.earliest_by(
        o,
        keys=["o_custkey"],
        values=["o_orderkey", "o_totalprice", "o_orderdate"],
        order=["o_orderdate", "o_orderkey"],
    )
    return out.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("first_orderkey"),
        F.col("o_totalprice").alias("first_totalprice"),
        epoch("o_orderdate").alias("first_order_ts"),
    )


# ---------------------------------------------------------------------------
# A7: OHLCV 1-minute bars from ticks
# ---------------------------------------------------------------------------


OHLCV_1M_ORACLE = (
    f"SELECT pool_id, bucket_ts, open, high, low, close, "
    f"CAST(volume AS DOUBLE) AS volume, trade_count FROM ({o_bars(60)})"
)


@register_extended("ohlcv_1m", OHLCV_1M_ORACLE)
def q_ohlcv_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bars_out(spark_bars(spark, sf_dir, 60))


# ---------------------------------------------------------------------------
# A8: OHLCV resample 1m -> 15m (argMin open / argMax close + sums)
# ---------------------------------------------------------------------------

RESAMPLE_ORACLE = f"""
WITH b AS ({o_bars(60)})
SELECT pool_id, bucket15_ts AS bucket_ts,
       MAX(CASE WHEN rn_a = 1 THEN open END) AS open,
       MAX(high) AS high,
       MIN(low) AS low,
       MAX(CASE WHEN rn_d = 1 THEN close END) AS close,
       CAST(SUM(volume) AS DOUBLE) AS volume,
       CAST(SUM(trade_count) AS BIGINT) AS trade_count
FROM (
  SELECT *,
         row_number() OVER (PARTITION BY pool_id, bucket15_ts
                            ORDER BY bucket_ts ASC) AS rn_a,
         row_number() OVER (PARTITION BY pool_id, bucket15_ts
                            ORDER BY bucket_ts DESC) AS rn_d
  FROM (SELECT *, (bucket_ts // 900) * 900 AS bucket15_ts FROM b)
)
GROUP BY pool_id, bucket15_ts
"""


@register_extended("ohlcv_resample_15m", RESAMPLE_ORACLE)
def q_ohlcv_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = spark_bars(spark, sf_dir, 60)
    r = ohlcv.resample(b, 900)
    return _bars_out(r)


# ---------------------------------------------------------------------------
# W4: candle continuity — open := previous close per pool
# ---------------------------------------------------------------------------

CONTINUITY_ORACLE = f"""
WITH b AS ({o_bars(60)})
SELECT pool_id, bucket_ts,
       COALESCE(lag(close) OVER (PARTITION BY pool_id ORDER BY bucket_ts),
                open) AS open,
       close
FROM b
"""


@register_extended("candle_continuity", CONTINUITY_ORACLE)
def q_candle_continuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = spark_bars(spark, sf_dir, 60)
    out = ohlcv.with_carried_open(b)
    return out.select("pool_id", epoch("bucket_start").alias("bucket_ts"), "open", "close")


# ---------------------------------------------------------------------------
# W5 + calendar spine: gap fill (fill=prev) on hourly bars
# ---------------------------------------------------------------------------

GAPFILL_ORACLE = f"""
WITH b AS ({o_bars(3600)}),
rng AS (
  SELECT pool_id, MIN(bucket_ts) AS lo, MAX(bucket_ts) AS hi FROM b GROUP BY pool_id
),
spine AS (
  SELECT pool_id, unnest(generate_series(lo, hi, 3600)) AS bucket_ts FROM rng
),
j AS (
  SELECT s.pool_id, s.bucket_ts,
         b.open, b.high, b.low, b.close, b.volume, b.trade_count
  FROM spine s LEFT JOIN b ON b.pool_id = s.pool_id AND b.bucket_ts = s.bucket_ts
),
f AS (
  SELECT *,
         last_value(close IGNORE NULLS) OVER (
           PARTITION BY pool_id ORDER BY bucket_ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_close
  FROM j
)
SELECT pool_id, bucket_ts,
       COALESCE(prev_close, open) AS open,
       GREATEST(COALESCE(high, prev_close), COALESCE(prev_close, open)) AS high,
       LEAST(COALESCE(low, prev_close), COALESCE(prev_close, open)) AS low,
       COALESCE(close, prev_close) AS close,
       CAST(COALESCE(volume, 0) AS DOUBLE) AS volume,
       COALESCE(trade_count, 0) AS trade_count,
       close IS NULL AS is_gap
FROM f
"""


@register("gap_fill_hourly", GAPFILL_ORACLE)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = spark_bars(spark, sf_dir, 3600)
    filled = ohlcv.gap_fill(b, 3600, fill="prev", materialize_input=True)
    return filled.select(
        "pool_id",
        epoch("bucket_start").alias("bucket_ts"),
        "open",
        "high",
        "low",
        "close",
        F.col("volume").cast("double").alias("volume"),
        F.col("trade_count").cast("long").alias("trade_count"),
        "is_gap",
    )


# W5 variant: linear interpolation across gaps (ClickHouse ORDER BY ...
# WITH FILL INTERPOLATE semantics — beyond the reference's prev/zero).
# The interpolation is pointwise double math in a fixed association
# (prev + ((next - prev) * j) / n), so Spark and DuckDB agree bitwise.

_ICLOSE = (
    "prev_close + ((next_close - prev_close) * "
    "CAST((bucket_ts - prev_ts) // 3600 AS DOUBLE)) / "
    "CAST((next_ts - prev_ts) // 3600 AS DOUBLE)"
)
_IOPEN = (
    "prev_close + ((next_close - prev_close) * "
    "CAST((bucket_ts - prev_ts) // 3600 - 1 AS DOUBLE)) / "
    "CAST((next_ts - prev_ts) // 3600 AS DOUBLE)"
)

GAPFILL_INTERP_ORACLE = f"""
WITH b AS ({{o_bars}}),
rng AS (
  SELECT pool_id, MIN(bucket_ts) AS lo, MAX(bucket_ts) AS hi FROM b GROUP BY pool_id
),
spine AS (
  SELECT pool_id, unnest(generate_series(lo, hi, 3600)) AS bucket_ts FROM rng
),
j AS (
  SELECT s.pool_id, s.bucket_ts,
         b.open, b.high, b.low, b.close, b.volume, b.trade_count
  FROM spine s LEFT JOIN b ON b.pool_id = s.pool_id AND b.bucket_ts = s.bucket_ts
),
f AS (
  SELECT *,
         last_value(close IGNORE NULLS) OVER w1 AS prev_close,
         last_value(CASE WHEN close IS NOT NULL THEN bucket_ts END IGNORE NULLS)
           OVER w1 AS prev_ts,
         first_value(close IGNORE NULLS) OVER w2 AS next_close,
         first_value(CASE WHEN close IS NOT NULL THEN bucket_ts END IGNORE NULLS)
           OVER w2 AS next_ts
  FROM j
  WINDOW w1 AS (PARTITION BY pool_id ORDER BY bucket_ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         w2 AS (PARTITION BY pool_id ORDER BY bucket_ts
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
)
SELECT pool_id, bucket_ts,
       CASE WHEN close IS NULL THEN {_IOPEN}
            ELSE COALESCE(prev_close, open) END AS open,
       CASE WHEN close IS NULL THEN GREATEST({_IOPEN}, {_ICLOSE})
            ELSE GREATEST(high, COALESCE(prev_close, open)) END AS high,
       CASE WHEN close IS NULL THEN LEAST({_IOPEN}, {_ICLOSE})
            ELSE LEAST(low, COALESCE(prev_close, open)) END AS low,
       CASE WHEN close IS NULL THEN {_ICLOSE} ELSE close END AS close,
       CAST(COALESCE(volume, 0) AS DOUBLE) AS volume,
       COALESCE(trade_count, 0) AS trade_count,
       close IS NULL AS is_gap
FROM f
""".replace("{o_bars}", o_bars(3600))


@register_extended("gap_fill_interp", GAPFILL_INTERP_ORACLE)
def q_gap_fill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = spark_bars(spark, sf_dir, 3600)
    filled = ohlcv.gap_fill(b, 3600, fill="interp", materialize_input=True)
    return filled.select(
        "pool_id",
        epoch("bucket_start").alias("bucket_ts"),
        "open",
        "high",
        "low",
        "close",
        F.col("volume").cast("double").alias("volume"),
        F.col("trade_count").cast("long").alias("trade_count"),
        "is_gap",
    )


# ---------------------------------------------------------------------------
# B12: change% — latest vs at-or-before cutoff
# ---------------------------------------------------------------------------

CHANGE_CUTOFF = "2024-01-24 00:00:00"

CHANGE_ORACLE = f"""
WITH t AS ({O_TICKS}),
lastv AS (
  SELECT pool_id, price AS last_value FROM (
    SELECT *, row_number() OVER (PARTITION BY pool_id
                                 ORDER BY ts DESC, event_id DESC) rn FROM t
  ) WHERE rn = 1
),
prevv AS (
  SELECT pool_id, price AS prev_value FROM (
    SELECT *, row_number() OVER (PARTITION BY pool_id
                                 ORDER BY ts DESC, event_id DESC) rn
    FROM t WHERE ts <= TIMESTAMP '{CHANGE_CUTOFF}'
  ) WHERE rn = 1
)
SELECT l.pool_id, l.last_value, p.prev_value,
       CASE WHEN p.prev_value IS NOT NULL AND p.prev_value <> 0
            THEN (l.last_value - p.prev_value) / p.prev_value * 100.0
       END AS change_pct
FROM lastv l LEFT JOIN prevv p ON l.pool_id = p.pool_id
"""


@register_extended("change_pct", CHANGE_ORACLE)
def q_change_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = catalog.ticks(spark, sf_dir)
    cutoff = F.lit(CHANGE_CUTOFF).cast("timestamp")
    return ohlcv.change_pct(
        t, cutoff, pool="pool_id", value="price", ts="ts", seq="event_id"
    )


# ---------------------------------------------------------------------------
# A9: top-K per group + concentration share (top-10 holders analogue)
# ---------------------------------------------------------------------------

CONC_ORACLE = """
SELECT c_nationkey AS nationkey,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS total,
       CAST(SUM(CASE WHEN rk <= 3 THEN CAST(c_acctbal AS DECIMAL(25,6))
                     ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE) AS topk_sum,
       COUNT(*) AS n
FROM (
  SELECT *, row_number() OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal DESC, c_custkey DESC) AS rk
  FROM customer
)
GROUP BY c_nationkey
"""


@register("topk_concentration", CONC_ORACLE)
def q_topk_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = catalog.load_table(spark, sf_dir, "customer").withColumn(
        "bal_d", F.col("c_acctbal").cast(DEC)
    )
    out = topk.concentration(
        c, keys=["c_nationkey"], value="bal_d", k=3, order=["c_acctbal", "c_custkey"]
    )
    return out.select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("total").cast("double").alias("total"),
        F.col("topk_sum").cast("double").alias("topk_sum"),
        "n",
    )


# ---------------------------------------------------------------------------
# A10: trader leaderboard (count / volume / PnL per signer)
# ---------------------------------------------------------------------------

LEADERBOARD_ORACLE = f"""
SELECT pool_id AS trader,
       COUNT(*) AS trades,
       {o_dsum("price")} AS volume,
       {o_dsum("CASE WHEN event_type = 'purchase' THEN price ELSE 0 END")} AS buy_volume,
       {o_dsum("CASE WHEN event_type = 'view' THEN price ELSE 0 END")} AS sell_volume,
       {o_dsum("CASE WHEN event_type = 'purchase' THEN price ELSE 0 END")}
         - {o_dsum("CASE WHEN event_type = 'view' THEN price ELSE 0 END")} AS gross_pnl
FROM ({O_TICKS})
GROUP BY pool_id
"""


@register("leaderboard", LEADERBOARD_ORACLE)
def q_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = catalog.ticks(spark, sf_dir)
    buy = dsum(F.when(F.col("event_type") == "purchase", F.col("price")).otherwise(0.0))
    sell = dsum(F.when(F.col("event_type") == "view", F.col("price")).otherwise(0.0))
    return t.groupBy(F.col("pool_id").alias("trader")).agg(
        F.count(F.lit(1)).alias("trades"),
        dsum("price").alias("volume"),
        buy.alias("buy_volume"),
        sell.alias("sell_volume"),
        (buy - sell).alias("gross_pnl"),
    )


# ---------------------------------------------------------------------------
# W1/J14: keep-latest dedupe (DISTINCT ON analogue)
# ---------------------------------------------------------------------------

DEDUPE_ORACLE = f"""
SELECT pool_id, event_type, event_id, price,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
FROM (
  SELECT *, row_number() OVER (PARTITION BY pool_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM ({O_TICKS})
)
WHERE rn = 1
"""


@register("dedupe_latest", DEDUPE_ORACLE)
def q_dedupe_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = catalog.ticks(spark, sf_dir)
    out = dedupe.keep_latest(t, keys=["pool_id", "event_type"], order=["ts", "event_id"])
    return out.select(
        "pool_id", "event_type", "event_id", "price", epoch("ts").alias("ts_sec")
    )


# ---------------------------------------------------------------------------
# J7/J8: semi and anti joins (EXISTS / NOT EXISTS guards)
# ---------------------------------------------------------------------------


SEMI_ORACLE = (
    "SELECT c_custkey AS custkey, c_name AS name FROM customer "
    "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"
)

ANTI_ORACLE = (
    "SELECT c_custkey AS custkey, c_name AS name FROM customer "
    "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"
)


# registered via queries.suites.semi_anti_join (driver 50-entry cap)
def q_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = catalog.load_table(spark, sf_dir, "customer")
    o = catalog.load_table(spark, sf_dir, "orders")
    out = joins.semi(c, o.select(F.col("o_custkey").alias("c_custkey")), on=["c_custkey"])
    return out.select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))


# registered via queries.suites.semi_anti_join
def q_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = catalog.load_table(spark, sf_dir, "customer")
    o = catalog.load_table(spark, sf_dir, "orders")
    out = joins.anti(c, o.select(F.col("o_custkey").alias("c_custkey")), on=["c_custkey"])
    return out.select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))


# ---------------------------------------------------------------------------
# J1/J2: star-schema dim joins (broadcast) — revenue per region
# ---------------------------------------------------------------------------

STAR_ORACLE = """
SELECT r_name AS region,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1.0 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderstatus = 'F'
GROUP BY r_name
"""


@register("star_revenue", STAR_ORACLE)
def q_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = catalog.load_all(spark, sf_dir)
    li, o, c, n, r = t["lineitem"], t["orders"], t["customer"], t["nation"], t["region"]
    # orders is fact-sized, not a dim: no forced broadcast — AQE picks
    # broadcast while the filtered side fits the threshold and falls
    # back to a shuffle join at real scale
    fact = li.join(
        o.filter(F.col("o_orderstatus") == "F"), on=[li.l_orderkey == o.o_orderkey]
    )
    fact = joins.dim_join(fact, c, on=[F.col("o_custkey") == F.col("c_custkey")])
    fact = joins.dim_join(fact, n, on=[F.col("c_nationkey") == F.col("n_nationkey")])
    fact = joins.dim_join(fact, r, on=[F.col("n_regionkey") == F.col("r_regionkey")])
    disc_price = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1.0).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )
    return fact.groupBy(F.col("r_name").alias("region")).agg(
        F.sum(disc_price).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# O2/A12/W3: pagination with grand total
# ---------------------------------------------------------------------------

PAGE_ORACLE = """
SELECT custkey, name, acctbal, total FROM (
  SELECT c_custkey AS custkey, c_name AS name, c_acctbal AS acctbal,
         COUNT(*) OVER () AS total,
         row_number() OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
  FROM customer
)
WHERE rn > 10 AND rn <= 30
"""


@register("page_top_customers", PAGE_ORACLE)
def q_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = catalog.load_table(spark, sf_dir, "customer")
    out = topk.paginate(
        c,
        order=[F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
        limit=20,
        offset=10,
        with_total=True,
    )
    return out.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        "total",
    )


# ---------------------------------------------------------------------------
# B5/B6/F9: notional banding (shrimp/shark/whale)
# ---------------------------------------------------------------------------

WORTH_ORACLE = f"""
SELECT CASE WHEN price < 50 THEN 'shrimp'
            WHEN price <= 150 THEN 'shark'
            ELSE 'whale' END AS trade_class,
       COUNT(*) AS n,
       {o_dsum("price")} AS total_worth
FROM ({O_TICKS})
GROUP BY 1
"""


@register("worth_classification", WORTH_ORACLE)
def q_worth(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = catalog.ticks(spark, sf_dir)
    cls = (
        F.when(F.col("price") < 50, "shrimp")
        .when(F.col("price") <= 150, "shark")
        .otherwise("whale")
    )
    return t.groupBy(cls.alias("trade_class")).agg(
        F.count(F.lit(1)).alias("n"), dsum("price").alias("total_worth")
    )


# ---------------------------------------------------------------------------
# JSON scalar functions (§2.9): extract + aggregate over props
# ---------------------------------------------------------------------------

JSON_ORACLE = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max,
       CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                THEN 1 ELSE 0 END) AS BIGINT) AS n_gt50
FROM events
GROUP BY event_type
"""


@register("json_props_stats", JSON_ORACLE)
def q_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog.load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("k_sum"),
        F.max(k).alias("k_max"),
        F.sum(F.when(k > 50, 1).otherwise(0)).alias("n_gt50"),
    )


# ---------------------------------------------------------------------------
# F1: rolling trailing-window predicate (now() - INTERVAL, fixed cutoff)
# ---------------------------------------------------------------------------

RECENT_ORACLE = f"""
SELECT event_type, COUNT(*) AS n, {o_dsum("value")} AS total_value
FROM events
WHERE ts >= TIMESTAMP '2024-01-24 00:00:00'
GROUP BY event_type
"""


@register("recent_window_activity", RECENT_ORACLE)
def q_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog.load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts") >= F.lit("2024-01-24 00:00:00").cast("timestamp"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
    )


# ---------------------------------------------------------------------------
# Flagship composite — the SURVEY §7 M1 slice on driver tables: "pool
# matrix, 24h bucket". One plan touching trailing filter (F1),
# conditional aggs (A1-A3), latest-row view (J4/A4), price fallback
# (A13), display scaling (P11), and a left dim join — the end-to-end
# shape of jobs/matrix-rollups.js.
# ---------------------------------------------------------------------------

MATRIX_CUTOFF = "2024-01-24 00:00:00"  # plays now(); data spans Jan 2024

POOL_MATRIX_ORACLE = f"""
WITH t AS ({O_TICKS}),
win AS (
  SELECT * FROM t
  WHERE ts >  TIMESTAMP '{MATRIX_CUTOFF}' - INTERVAL 7 DAY
    AND ts <= TIMESTAMP '{MATRIX_CUTOFF}'
),
q AS (
  SELECT pool_id,
         {o_dsum("CASE WHEN event_type = 'purchase' THEN price ELSE 0 END")} AS vol_buy,
         {o_dsum("CASE WHEN event_type = 'view' THEN price ELSE 0 END")} AS vol_sell,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS tx_buy,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS tx_sell,
         COUNT(DISTINCT CAST(ts AS DATE)) AS active_days
  FROM win GROUP BY pool_id
),
latest AS (
  SELECT pool_id, price AS direct_price FROM (
    SELECT pool_id, price, row_number() OVER (PARTITION BY pool_id
            ORDER BY ts DESC, event_id DESC) rn
    FROM t WHERE event_type = 'purchase') WHERE rn = 1
),
bars AS ({o_bars(3600)}),
barlast AS (
  SELECT pool_id, close FROM (
    SELECT pool_id, close, row_number() OVER (PARTITION BY pool_id
            ORDER BY bucket_ts DESC) rn FROM bars) WHERE rn = 1
),
pools AS (SELECT DISTINCT pool_id FROM t)
SELECT p.pool_id,
       COALESCE(q.vol_buy, 0.0) AS vol_buy,
       COALESCE(q.vol_sell, 0.0) AS vol_sell,
       COALESCE(q.tx_buy, 0) AS tx_buy,
       COALESCE(q.tx_sell, 0) AS tx_sell,
       COALESCE(q.active_days, 0) AS active_days,
       COALESCE(l.direct_price, b.close, 0.0) AS price,
       COALESCE(l.direct_price, b.close, 0.0) * (COALESCE(q.vol_buy, 0.0) + COALESCE(q.vol_sell, 0.0)) / 1000000.0 AS tvl_proxy
FROM pools p
LEFT JOIN q ON q.pool_id = p.pool_id
LEFT JOIN latest l ON l.pool_id = p.pool_id
LEFT JOIN barlast b ON b.pool_id = p.pool_id
"""


@register("pool_matrix_24h", POOL_MATRIX_ORACLE)
def q_pool_matrix_analog(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = catalog.ticks(spark, sf_dir)
    cutoff = F.lit(MATRIX_CUTOFF).cast("timestamp")
    win = t.filter(
        (F.col("ts") > cutoff - F.expr("INTERVAL 7 DAYS")) & (F.col("ts") <= cutoff)
    )
    is_buy = F.col("event_type") == "purchase"
    is_sell = F.col("event_type") == "view"
    q = win.groupBy("pool_id").agg(
        dsum(F.when(is_buy, F.col("price")).otherwise(0.0)).alias("vol_buy"),
        dsum(F.when(is_sell, F.col("price")).otherwise(0.0)).alias("vol_sell"),
        F.sum(F.when(is_buy, 1).otherwise(0)).alias("tx_buy"),
        F.sum(F.when(is_sell, 1).otherwise(0)).alias("tx_sell"),
        F.countDistinct(F.to_date("ts")).alias("active_days"),
    )
    direct = latest.latest_by(
        t.filter(is_buy), keys=["pool_id"], values=["price"], order=["ts", "event_id"]
    ).withColumnRenamed("price", "direct_price")
    barlast = latest.latest_by(
        spark_bars(spark, sf_dir, 3600),
        keys=["pool_id"], values=["close"], order=["bucket_start"],
    )
    pools = t.select("pool_id").distinct()
    j = (
        pools.join(q, "pool_id", "left")
        .join(dim_broadcast(direct), "pool_id", "left")
        .join(dim_broadcast(barlast), "pool_id", "left")
    )
    price = F.coalesce("direct_price", "close", F.lit(0.0))
    vol_buy = F.coalesce("vol_buy", F.lit(0.0))
    vol_sell = F.coalesce("vol_sell", F.lit(0.0))
    return j.select(
        "pool_id",
        vol_buy.alias("vol_buy"),
        vol_sell.alias("vol_sell"),
        F.coalesce("tx_buy", F.lit(0)).alias("tx_buy"),
        F.coalesce("tx_sell", F.lit(0)).alias("tx_sell"),
        F.coalesce("active_days", F.lit(0)).alias("active_days"),
        price.alias("price"),
        (price * (vol_buy + vol_sell) / 1000000.0).alias("tvl_proxy"),
    )
