"""CSV pools backfill (S5, bin/import-pools-csv.js:28-192): read a
pools CSV export, normalize pairs (uzig forced to quote side), derive
deterministic ids, and anti-join against existing pools. ``dry=True``
returns the would-be inserts without writing — the reference's --dry.
LP denoms are never inserted as tokens (the import skips them by
construction: only pair legs become token candidates)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas as S
from ..functions import parse
from ..operators import joins

EXPECTED_COLUMNS = ["pair_contract", "pair", "pair_type", "lp_token_denom", "created_at"]


def read_pools_csv(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.csv(path, header=True, inferSchema=False)


def normalize(df: DataFrame) -> DataFrame:
    norm = parse.normalize_pair(F.col("pair"))
    return df.select(
        parse.nat_key_id(F.col("pair_contract")).alias("pool_id"),
        "pair_contract",
        parse.nat_key_id(norm["base_denom"]).alias("base_token_id"),
        parse.nat_key_id(norm["quote_denom"]).alias("quote_token_id"),
        F.coalesce(F.col("pair_type"), F.lit("xyk")).alias("pair_type"),
        (norm["quote_denom"] == S.UZIG).alias("is_uzig_quote"),
        F.col("lp_token_denom"),
        F.to_timestamp("created_at").alias("created_at"),
        norm["base_denom"].alias("base_denom"),
        norm["quote_denom"].alias("quote_denom"),
    )


def import_pools(
    spark: SparkSession,
    path: str,
    existing_pools: DataFrame | None = None,
    dry: bool = False,
) -> DataFrame:
    rows = normalize(read_pools_csv(spark, path)).dropDuplicates(["pair_contract"])
    if existing_pools is not None:
        rows = joins.anti(rows, existing_pools.select("pair_contract"), on=["pair_contract"])
    # dry mode is just "don't write" — the plan itself is the preview
    return rows
