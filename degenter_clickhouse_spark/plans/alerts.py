"""Alert evaluation (ST8, jobs/alerts.js:14-135): every tick, evaluate
active alerts against the latest-state views; per-alert throttle
suppression.

Four alert kinds (params is a JSON string, phase3schema.sql:300):
  price_cross  {pool_id|token_id, direction: above|below, threshold}
  wallet_trade {address, since_min, direction?}  count > 0 in window
  large_trade  {min_zig, since_min}              count >= 1
  tvl_change   {pool_id, window_min, delta_pct}  |Δ%| >= delta_pct

All four evaluate as one plan each over broadcast state views — the
periodic driver loop just re-runs them (the reference's 10 s cadence).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators import latest
from . import views
from ..operators.joins import dim_broadcast


def _params(alerts: DataFrame, *fields: tuple[str, str]) -> DataFrame:
    out = alerts
    for name, dtype in fields:
        out = out.withColumn(
            name, F.get_json_object("params", f"$.{name}").cast(dtype)
        )
    return out


def unthrottled(alerts: DataFrame, now: Column) -> DataFrame:
    """Throttle gate: last_triggered older than throttle_sec (or never)."""
    return alerts.filter(F.col("active")).filter(
        F.col("last_triggered").isNull()
        | (
            F.unix_timestamp(now) - F.unix_timestamp(F.col("last_triggered"))
            >= F.coalesce(F.col("throttle_sec"), F.lit(300))
        )
    )


def eval_price_cross(alerts: DataFrame, prices: DataFrame, now: Column) -> DataFrame:
    a = _params(
        unthrottled(alerts, now).filter(F.col("kind") == "price_cross"),
        ("pool_id", "long"),
        ("direction", "string"),
        ("threshold", "double"),
    )
    lp = views.latest_prices(prices).select("pool_id", "latest_price_zig")
    j = a.join(dim_broadcast(lp), "pool_id", "left")
    fired = F.when(
        F.col("direction") == "above", F.col("latest_price_zig") > F.col("threshold")
    ).otherwise(F.col("latest_price_zig") < F.col("threshold"))
    return j.filter(F.col("latest_price_zig").isNotNull() & fired).select(
        "alert_id",
        F.lit("price_cross").alias("kind"),
        F.col("pool_id"),
        F.col("latest_price_zig").alias("observed"),
        now.alias("fired_at"),
    )


def eval_wallet_trade(alerts: DataFrame, trades: DataFrame, now: Column) -> DataFrame:
    a = _params(
        unthrottled(alerts, now).filter(F.col("kind") == "wallet_trade"),
        ("address", "string"),
        ("since_min", "long"),
    ).withColumn("want_direction", F.get_json_object("params", "$.direction"))
    t = trades.filter(F.col("action") == "swap").select(
        F.col("signer").alias("address"),
        F.col("direction").alias("t_direction"),
        "created_at",
    )
    in_window = F.col("created_at") >= now - (
        F.col("since_min") * F.expr("INTERVAL 1 MINUTE")
    )
    dir_ok = F.col("want_direction").isNull() | (
        F.col("t_direction") == F.col("want_direction")
    )
    j = a.join(t, "address", "left").filter(in_window & dir_ok)
    hits = j.groupBy("alert_id", "address").agg(F.count(F.lit(1)).alias("n_trades"))
    return hits.filter(F.col("n_trades") > 0).select(
        "alert_id",
        F.lit("wallet_trade").alias("kind"),
        F.col("address"),
        F.col("n_trades"),
        now.alias("fired_at"),
    )


def eval_large_trade(
    alerts: DataFrame, large_trades: DataFrame, now: Column
) -> DataFrame:
    a = _params(
        unthrottled(alerts, now).filter(F.col("kind") == "large_trade"),
        ("min_zig", "double"),
        ("since_min", "long"),
    )
    # bound the theta join's fact-side input FIRST: no trade below the
    # loosest alert threshold / older than the widest alert window can
    # ever match, so filter them out below the join instead of
    # materializing |alerts| x |trades| rows and filtering after
    bounds = a.agg(
        F.min("min_zig").alias("__gmin"), F.max("since_min").alias("__gwin")
    )
    lt = (
        large_trades.select("value_zig", "created_at")
        .join(dim_broadcast(bounds))
        .filter(
            (F.col("value_zig") >= F.col("__gmin"))
            & (
                F.col("created_at")
                >= now - F.col("__gwin") * F.expr("INTERVAL 1 MINUTE")
            )
        )
        .drop("__gmin", "__gwin")
    )
    j = a.crossJoin(lt).filter(
        (F.col("value_zig") >= F.col("min_zig"))
        & (F.col("created_at") >= now - F.col("since_min") * F.expr("INTERVAL 1 MINUTE"))
    )
    hits = j.groupBy("alert_id", "min_zig").agg(F.count(F.lit(1)).alias("n_trades"))
    return hits.filter(F.col("n_trades") >= 1).select(
        "alert_id",
        F.lit("large_trade").alias("kind"),
        F.col("n_trades"),
        now.alias("fired_at"),
    )


def record_fired(alerts: DataFrame, fired: DataFrame, now: Column) -> DataFrame:
    """Close the ST8 loop: bump ``last_triggered`` for fired alerts so
    the throttle gate suppresses them next tick. Returns the updated
    alerts table (append-only storage would Delta-MERGE this; callers
    on plain parquet overwrite the small alerts dim)."""
    from ..operators.merge import conditional_merge

    bump = fired.select("alert_id").distinct().withColumn("last_triggered", now)
    return conditional_merge(
        alerts, bump, keys=["alert_id"], merge_cols=["last_triggered"],
        empty_is_null=False,
    )


def eval_tvl_change(
    alerts: DataFrame, pool_state: DataFrame, tokens_tvl_now_past: DataFrame | None,
    now: Column,
) -> DataFrame:
    """Δ% between the latest reserve snapshot and the snapshot at-or-
    before (now − window): two max_by lookups per pool (B12 pattern on
    the quote reserve, the reference's TVL proxy jobs/alerts.js:82-103)."""
    a = _params(
        unthrottled(alerts, now).filter(F.col("kind") == "tvl_change"),
        ("pool_id", "long"),
        ("window_min", "long"),
        ("delta_pct", "double"),
    )
    nowv = views.latest_pool_state(pool_state).select(
        "pool_id", F.col("reserve_quote_base").cast("double").alias("rq_now")
    )
    j = a.join(dim_broadcast(nowv), "pool_id", "left")
    past_all = pool_state.select(
        "pool_id", F.col("reserve_quote_base").cast("double").alias("rq"), "updated_at"
    )
    j2 = (
        j.join(past_all, "pool_id", "left")
        .filter(
            F.col("updated_at")
            <= now - F.col("window_min") * F.expr("INTERVAL 1 MINUTE")
        )
        .groupBy("alert_id", "pool_id", "delta_pct", "rq_now")
        .agg(F.max_by("rq", "updated_at").alias("rq_past"))
    )
    delta = (F.col("rq_now") - F.col("rq_past")) / F.col("rq_past") * 100
    return (
        j2.filter(F.col("rq_past").isNotNull() & (F.col("rq_past") != 0))
        .filter(F.abs(delta) >= F.col("delta_pct"))
        .select(
            "alert_id",
            F.lit("tvl_change").alias("kind"),
            F.col("pool_id"),
            delta.alias("delta_observed_pct"),
            now.alias("fired_at"),
        )
    )
