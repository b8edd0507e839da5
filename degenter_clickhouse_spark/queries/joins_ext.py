"""EXTENDED-registry queries for operators/asof.py, oracle-checked
against DuckDB's NATIVE ``ASOF JOIN`` (and a plain theta join for the
range case) — the strongest possible cross-engine check for these
operators: two completely different algorithms must agree bit-for-bit.

Fixtures come from the events table: clicks as-of matched to each
user's most recent prior purchase; error-event intervals range-joined
to the views that happen inside them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..operators.asof import asof_join, range_join
from . import register_extended

# Right side deduped to one row per (user_id, ts) by greatest payload
# struct — the operator's documented tie rule, mirrored here so DuckDB
# ASOF never sees ambiguous duplicates.
ASOF_ORACLE = """
WITH clicks AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts, max(value) AS pvalue
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT c.event_id,
       CAST(c.user_id AS BIGINT) AS user_id,
       CAST(floor(epoch(c.ts)) AS BIGINT) AS ts_s,
       c.value AS click_value,
       p.pvalue AS purchase_value,
       CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_ts_s
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


@register_extended("asof_join_events", ASOF_ORACLE)
def q_asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog.load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("pvalue")
    )
    out = asof_join(clicks, purchases, on="ts", by=["user_id"])
    return out.select(
        "event_id",
        F.col("user_id").cast("long").alias("user_id"),
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("ts_s"),
        F.col("value").alias("click_value"),
        F.col("pvalue").alias("purchase_value"),
        F.unix_timestamp(F.col("ts_r").cast("timestamp")).alias("purchase_ts_s"),
    )


RANGE_W = 1800  # error window: [ts, ts + 30 min)

RANGE_ORACLE = f"""
WITH errs AS (
  SELECT event_id, user_id, ts AS t0, ts + INTERVAL {RANGE_W} SECOND AS t1
  FROM events WHERE event_type = 'error'
),
views AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'view'
)
SELECT e.event_id,
       CAST(e.user_id AS BIGINT) AS user_id,
       CAST(count(v.ts) AS BIGINT) AS n_views,
       CAST(coalesce(sum(CAST(round(v.value * 1e6) AS BIGINT)), 0) AS BIGINT)
         AS view_value_sum_scaled
FROM errs e JOIN views v
  ON e.user_id = v.user_id AND e.t0 <= v.ts AND v.ts < e.t1
GROUP BY e.event_id, e.user_id
"""


@register_extended("range_join_events", RANGE_ORACLE)
def q_range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog.load_table(spark, sf_dir, "events")
    errs = ev.filter(F.col("event_type") == "error").select(
        "event_id",
        "user_id",
        F.col("ts").alias("t0"),
        (F.col("ts") + F.expr(f"INTERVAL {RANGE_W} SECOND")).alias("t1"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts"), F.col("value").alias("vvalue")
    )
    pairs = range_join(
        errs, views, start="t0", end="t1", point="vts", by=["user_id"],
        bucket_width=float(RANGE_W),
    )
    return pairs.groupBy("event_id", F.col("user_id").cast("long").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_views"),
        F.sum(F.expr("CAST(round(vvalue * 1e6) AS BIGINT)"))
        .cast("long")
        .alias("view_value_sum_scaled"),
    )


# ---------------------------------------------------------------------------
# interval_overlap_orders — interval-INTERVAL overlap join
# (operators/asof.interval_join): pairs of 30-day "open order" windows
# of the SAME customer that overlap in time, i.e. concurrently open
# orders. Exactly-once bucket attribution (pair kept only in the
# bucket containing greatest(start_a, start_b)); oracle is the plain
# DuckDB theta join.
# ---------------------------------------------------------------------------

OVERLAP_DAYS = 30

INTERVAL_OVERLAP_ORACLE = f"""
WITH o AS (
  SELECT o_orderkey, o_custkey, o_orderdate AS s,
         o_orderdate + INTERVAL {OVERLAP_DAYS} DAY AS e
  FROM orders
)
SELECT CAST(a.o_custkey AS BIGINT) AS custkey,
       CAST(a.o_orderkey AS BIGINT) AS order_a,
       CAST(b.o_orderkey AS BIGINT) AS order_b,
       CAST(epoch(least(a.e, b.e)) - epoch(greatest(a.s, b.s)) AS BIGINT)
         AS overlap_secs
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
 AND a.s < b.e AND b.s < a.e
"""


@register_extended("interval_overlap_orders", INTERVAL_OVERLAP_ORACLE)
def q_interval_overlap_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import interval_join

    o = catalog.load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").alias("s"),
        (F.col("o_orderdate") + F.expr(f"INTERVAL {OVERLAP_DAYS} DAY")).alias("e"),
    )
    pairs = interval_join(
        o,
        o,
        left_span=("s", "e"),
        right_span=("s", "e"),
        by=["o_custkey"],
        bucket_width=float(OVERLAP_DAYS * 86400),
    ).filter(F.col("o_orderkey") < F.col("o_orderkey_r"))
    sec = lambda c: F.unix_timestamp(F.col(c).cast("timestamp"))  # noqa: E731
    return pairs.select(
        F.col("o_custkey").cast("long").alias("custkey"),
        F.col("o_orderkey").cast("long").alias("order_a"),
        F.col("o_orderkey_r").cast("long").alias("order_b"),
        (
            F.least(sec("e"), sec("e_r")) - F.greatest(sec("s"), sec("s_r"))
        )
        .cast("long")
        .alias("overlap_secs"),
    )


# ---------------------------------------------------------------------------
# Snapshot reconciliation (operators/diff.snapshot_diff): yesterday's
# vs today's orders snapshot — "today" is derived deterministically
# from the same table (every 7th customer's orders dropped; every 5th
# order's priority rewritten; status-'F' orders of every 11th customer
# re-keyed as new rows), so both engines diff identical states. Oracle is a FULL
# OUTER JOIN with NULL-safe value comparison — the independent
# formulation of the same question.
# ---------------------------------------------------------------------------

SNAPSHOT_DIFF_ORACLE = """
WITH today AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0 THEN '9-REPRICED'
              ELSE o_orderpriority END AS o_orderpriority,
         o_totalprice
  FROM orders WHERE o_custkey % 7 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_orderpriority, o_totalprice
  FROM orders WHERE o_orderstatus = 'F' AND o_custkey % 11 = 0
),
yesterday AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
)
SELECT CASE WHEN y.o_orderkey IS NULL THEN 'added'
            WHEN t.o_orderkey IS NULL THEN 'removed'
            ELSE 'changed' END AS status,
       COALESCE(y.o_orderkey, t.o_orderkey) AS o_orderkey
FROM yesterday y
FULL OUTER JOIN today t ON y.o_orderkey = t.o_orderkey
WHERE y.o_orderkey IS NULL OR t.o_orderkey IS NULL
   OR y.o_orderpriority IS DISTINCT FROM t.o_orderpriority
   OR y.o_totalprice IS DISTINCT FROM t.o_totalprice
"""


@register_extended("snapshot_diff", SNAPSHOT_DIFF_ORACLE)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.diff import snapshot_diff

    o = catalog.load_table(spark, sf_dir, "orders")
    yesterday = o.select("o_orderkey", "o_orderpriority", "o_totalprice")
    today = (
        o.filter(F.col("o_custkey") % 7 != 0)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 5 == 0, F.lit("9-REPRICED"))
            .otherwise(F.col("o_orderpriority"))
            .alias("o_orderpriority"),
            "o_totalprice",
        )
        .unionByName(
            o.filter(
                (F.col("o_orderstatus") == "F") & (F.col("o_custkey") % 11 == 0)
            ).select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                "o_orderpriority",
                "o_totalprice",
            )
        )
    )
    return snapshot_diff(yesterday, today, ["o_orderkey"]).select(
        "status", F.col("o_orderkey").cast("long").alias("o_orderkey")
    )
