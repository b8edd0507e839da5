"""Dedupe operators (SURVEY.md §2.6 W1, §2.10 ST2, §2.4 J14).

The reference guards against replayed chain events by looking up
(pool_id, tx_hash, msg_index) before insert
(core/block-processor.js:64-76,199-206) and dedupes large-trade rows
with DISTINCT ON / row_number (phase3schema.sql:377-388,
api/routes/trades.js:874-893).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ingest_dedupe(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """ST2 effectively-once: arbitrary row wins per key (matches the
    reference's first-insert-wins since duplicate events are identical).
    """
    return df.dropDuplicates(list(keys))


def keep_latest(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str | Column],
) -> DataFrame:
    """W1/J14: keep the newest row per key (DISTINCT ON ... ORDER BY ...
    DESC). Deterministic given a total ``order``."""
    ordc = [F.col(c) if isinstance(c, str) else c for c in order]
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in ordc])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
