"""Token security scan (jobs/token-security.js; api/routes/tokens.js:
1104-1143): concentration + mintability + age -> score in [1,99] and
boolean risk flags. Output appends to a versioned table read through
``views.latest_security`` (ReplacingMergeTree semantics S10)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import business
from . import holders as H
from ..operators.joins import dim_broadcast


def scan(tokens: DataFrame, holders: DataFrame, now: Column) -> DataFrame:
    stats = H.holder_stats(holders)
    cpct = H.creator_pct(holders, tokens)
    t = tokens.select(
        "token_id",
        "can_mint",
        "can_change_cap",
        "created_at",
        "max_supply_base",
        "total_supply_base",
    )
    j = t.join(dim_broadcast(stats), "token_id", "left").join(
        dim_broadcast(cpct), "token_id", "left"
    )
    age_days = F.datediff(now.cast("date"), F.col("created_at").cast("date"))
    fully_minted = (
        F.col("max_supply_base").isNotNull()
        & (F.col("max_supply_base") == F.col("total_supply_base"))
    )
    score = business.security_score(
        can_mint=F.coalesce(F.col("can_mint"), F.lit(False)),
        top10_pct=F.coalesce(F.col("top10_pct"), F.lit(0.0)),
        creator_pct=F.coalesce(F.col("creator_pct"), F.lit(0.0)),
        holders=F.coalesce(F.col("holders"), F.lit(0)),
        age_days=age_days,
        fully_minted=fully_minted,
    )
    flags = business.risk_flags(
        creator_pct=F.coalesce(F.col("creator_pct"), F.lit(0.0)),
        top10_pct=F.coalesce(F.col("top10_pct"), F.lit(0.0)),
        can_mint=F.coalesce(F.col("can_mint"), F.lit(False)),
        can_change_cap=F.coalesce(F.col("can_change_cap"), F.lit(False)),
    )
    return j.select(
        "token_id",
        F.coalesce(F.col("can_mint"), F.lit(False)).alias("can_mint"),
        F.coalesce(F.col("can_change_cap"), F.lit(False)).alias("can_change_cap"),
        F.coalesce(F.col("top10_pct"), F.lit(0.0)).alias("top10_pct"),
        F.coalesce(F.col("creator_pct"), F.lit(0.0)).alias("creator_pct"),
        F.coalesce(F.col("holders"), F.lit(0)).cast("long").alias("holders"),
        score.alias("score"),
        flags.alias("risk_flags"),
        now.alias("checked_at"),
    )
