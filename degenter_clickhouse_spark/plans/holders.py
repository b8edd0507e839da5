"""Holder snapshot statistics (jobs/holders-refresher.js:126-194,
jobs/matrix-rollups.js:295-302, api/routes/tokens.js:1026-1043).

Per token: holders count (balance > 0), top-10 list, top-10
concentration share. The snapshot sink semantics (delete+reinsert per
token) map to a partitioned overwrite — ``replaceWhere`` on Delta or
``partitionBy(token_id)`` dynamic overwrite on plain parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import topk
from ..operators.joins import dim_broadcast


def holder_stats(holders: DataFrame) -> DataFrame:
    """token_holders_stats: count, total, top10 sum + share."""
    pos = holders.filter(F.col("balance_base") > 0)
    conc = topk.concentration(
        pos.withColumn("bal_d", F.col("balance_base").cast("decimal(38,0)")),
        keys=["token_id"],
        value="bal_d",
        k=10,
        order=[F.col("balance_base"), F.col("address")],
    )
    return conc.select(
        "token_id",
        F.col("n").alias("holders"),
        F.col("total").cast("double").alias("total_balance"),
        F.col("topk_sum").cast("double").alias("top10_balance"),
        (F.col("topk_sum") / F.col("total") * 100).cast("double").alias("top10_pct"),
    )


def top_holders(holders: DataFrame, k: int = 10) -> DataFrame:
    """Per-token top-K holder list (A9), rank included."""
    pos = holders.filter(F.col("balance_base") > 0)
    return topk.topk_per_group(
        pos, keys=["token_id"], order=[F.col("balance_base"), F.col("address")], k=k
    ).select("token_id", "address", "balance_base", "rank")


def creator_pct(holders: DataFrame, tokens: DataFrame) -> DataFrame:
    """Creator's share of supply-in-wallets (B10 input)."""
    pos = holders.filter(F.col("balance_base") > 0)
    totals = pos.groupBy("token_id").agg(
        F.sum(F.col("balance_base").cast("decimal(38,0)")).alias("total")
    )
    creators = tokens.select("token_id", "creator_address")
    cb = (
        pos.join(dim_broadcast(creators), "token_id")
        .filter(F.col("address") == F.col("creator_address"))
        .groupBy("token_id")
        .agg(F.sum(F.col("balance_base").cast("decimal(38,0)")).alias("creator_bal"))
    )
    return (
        totals.join(cb, "token_id", "left")
        .select(
            "token_id",
            (
                F.coalesce(F.col("creator_bal"), F.lit(0)).cast("double")
                / F.col("total").cast("double")
                * 100
            ).alias("creator_pct"),
        )
    )
