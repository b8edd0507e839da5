"""Upsert / conditional-merge operators (SURVEY.md §2.1 S9-S11, §2.11 B14).

The reference mutates dimension rows in place (``ALTER TABLE tokens
UPDATE name = if($2 != '', $2, name) ...`` core/tokens.js:387-434) and
replaces snapshots wholesale (holders delete+reinsert,
jobs/holders-refresher.js:126-194). On an append-only data lake both
become deterministic dataframe merges written back per partition —
with Delta these map 1:1 to ``MERGE WHEN MATCHED`` and ``replaceWhere``;
the plain-parquet forms below keep identical semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def conditional_merge(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    merge_cols: Sequence[str],
    empty_is_null: bool = True,
) -> DataFrame:
    """S11: per column, take the update value unless it's NULL (or empty
    string) — the reference's ``if($2 != '', $2, old)`` field merge.
    New keys are inserted; untouched columns keep current values."""
    upd = updates.select(
        *keys, *[F.col(c).alias(f"__new_{c}") for c in merge_cols]
    )
    j = current.join(upd, on=list(keys), how="full_outer")
    out_cols = []
    for c in current.columns:
        if c in keys:
            out_cols.append(F.col(c))
        elif c in merge_cols:
            new = F.col(f"__new_{c}")
            if empty_is_null:
                new = F.when(new.cast("string") == "", None).otherwise(new)
            out_cols.append(F.coalesce(new, F.col(c)).alias(c))
        else:
            out_cols.append(F.col(c))
    return j.select(*out_cols)


def merge_token_metadata(tokens: DataFrame, meta_updates: DataFrame) -> DataFrame:
    """B14 (core/tokens.js:263-434) precedence rules on ingest-side
    metadata refresh: non-empty update wins per field, existing value
    otherwise; exponent falls back through the chain (update ->
    existing -> NULL, display-derived fallback handled upstream)."""
    return conditional_merge(
        tokens,
        meta_updates,
        keys=["token_id"],
        merge_cols=[
            c for c in ("name", "symbol", "display", "exponent", "image_uri",
                        "website", "twitter")
            if c in tokens.columns
        ],
    )


def snapshot_overwrite(
    df: DataFrame, path: str, partition_col: str = "token_id"
) -> None:
    """S9 delete+reinsert snapshot sink: dynamic partition overwrite
    replaces exactly the partitions present in ``df`` (Delta
    ``replaceWhere`` analogue), leaving other keys' snapshots intact."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
