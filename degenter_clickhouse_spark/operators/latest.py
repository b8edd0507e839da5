"""Latest/earliest-row views (SURVEY.md §2.4 J4/J5/J6, §2.5 A4/A5).

The reference resolves "current price" / "current reserves" with either
``argMax(value, updated_at)`` GROUP BY subqueries
(jobs/matrix-rollups.js:45-51) or correlated ``ORDER BY updated_at DESC
LIMIT 1`` lookups (api/routes/trades.js:295,410-416). This engine
standardizes on the decorrelated form: one ``max_by`` aggregation that
becomes a broadcastable lookup side for downstream joins — the correlated
pattern is never generated (SURVEY.md §4).

Scale: a ``groupBy(keys).agg(max_by...)`` is a single shuffle on the
key with full map-side partial aggregation; the result (one row per key)
is dimension-sized and broadcast in downstream joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ord(order_cols: Sequence[str | Column]) -> Column:
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    return cols[0] if len(cols) == 1 else F.struct(*cols)


def latest_by(
    df: DataFrame,
    keys: Sequence[str],
    values: Sequence[str],
    order: Sequence[str | Column],
) -> DataFrame:
    """One row per key; each value column taken from the row with the
    greatest ``order`` tuple. ClickHouse ``argMax`` ≙ Spark ``max_by``."""
    ordc = _ord(order)
    aggs = [F.max_by(F.col(v), ordc).alias(v) for v in values]
    return df.groupBy(*keys).agg(*aggs)


def earliest_by(
    df: DataFrame,
    keys: Sequence[str],
    values: Sequence[str],
    order: Sequence[str | Column],
) -> DataFrame:
    """ClickHouse ``argMin`` ≙ Spark ``min_by`` (first-seen lookups,
    e.g. first provide trade jobs/fasttrack-listener.js:122-137)."""
    ordc = _ord(order)
    aggs = [F.min_by(F.col(v), ordc).alias(v) for v in values]
    return df.groupBy(*keys).agg(*aggs)


def latest_row(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str | Column],
) -> DataFrame:
    """Whole-row latest per key via row_number (keeps every column).

    Equivalent to reading a ClickHouse ReplacingMergeTree at its merged
    state (jobs/token-security.js:29-31): latest version per key wins.
    """
    from pyspark.sql.window import Window

    ordc = [F.col(c) if isinstance(c, str) else c for c in order]
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in ordc])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
