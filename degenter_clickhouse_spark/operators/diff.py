"""Snapshot reconciliation: keyed diff of two table states.

The reference's delete+reinsert snapshot maintenance (S9,
core/block-processor.js holder snapshots) implies a reconciliation
question the engine should answer directly: given yesterday's and
today's snapshot, WHICH rows were added / removed / changed? At
100 TB this is one full-outer join hash-partitioned on the key — no
driver materialization, no row hashing across engines (values are
compared as a struct, NULL-safe), and column pruning keeps the scan
at keys + compared columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Rows of ``right`` not in ``left`` -> 'added'; rows of ``left``
    gone from ``right`` -> 'removed'; same key, different compared
    values -> 'changed'. Unchanged rows are dropped (the common case —
    the output is delta-sized). Returns (status, *keys).

    ``compare_cols`` defaults to every non-key column present in BOTH
    sides. Comparison is via a struct equality with NULL-safe
    semantics (``<=>``), so NULL -> value and value -> NULL both count
    as changes.
    """
    ks = list(keys)
    if compare_cols is None:
        compare_cols = [
            c for c in left.columns if c in set(right.columns) and c not in ks
        ]
    cc = list(compare_cols)
    l = left.select(
        *ks,
        F.struct(*[F.col(c) for c in cc]).alias("__lv"),
        F.lit(1).alias("__l"),
    )
    r = right.select(
        *ks,
        F.struct(*[F.col(c) for c in cc]).alias("__rv"),
        F.lit(1).alias("__r"),
    )
    j = l.join(r, ks, "full_outer")
    status = (
        F.when(F.col("__l").isNull(), F.lit("added"))
        .when(F.col("__r").isNull(), F.lit("removed"))
        .when(~F.col("__lv").eqNullSafe(F.col("__rv")), F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select("status", *ks)
    )
