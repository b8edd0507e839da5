"""Top-K, pagination, and ordering operators (SURVEY.md §2.5 A9, §2.7).

Scale notes: per-group top-K uses a rank window — with AQE this is one
shuffle on the group key and the window never materializes more than a
partition. Global ``paginate`` relies on Spark's TakeOrderedAndProject
(limit pushdown through sort) rather than a full sort when
offset+limit is small.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _cols(cols: Sequence[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def topk_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str | Column],
    k: int,
    desc: bool = True,
) -> DataFrame:
    """Top-K rows per key (A9: top-10 holders jobs/token-security.js:62-87)."""
    ordc = _cols(order)
    ordc = [c.desc() for c in ordc] if desc else ordc
    w = Window.partitionBy(*keys).orderBy(*ordc)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def concentration(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    k: int,
    order: Sequence[str | Column] | None = None,
) -> DataFrame:
    """Per key: total, top-K sum, and top-K share of total — the
    holder-concentration metric (api/routes/tokens.js:1042-1043).

    One pass: rank window then conditional sums (no second scan).
    """
    ordc = _cols(order or [value])
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in ordc])
    ranked = df.withColumn("__rk", F.row_number().over(w))
    return ranked.groupBy(*keys).agg(
        F.sum(F.col(value)).alias("total"),
        F.sum(F.when(F.col("__rk") <= k, F.col(value)).otherwise(F.lit(0))).alias(
            "topk_sum"
        ),
        F.count(F.lit(1)).alias("n"),
    )


def paginate(
    df: DataFrame,
    order: Sequence[str | Column],
    limit: int,
    offset: int = 0,
    with_total: bool = False,
) -> DataFrame:
    """O2 LIMIT/OFFSET pagination with optional grand total (A12/W3:
    ``count() OVER ()`` api/routes/tokens.js:224-229).

    Shape: ``orderBy(...).offset(...).limit(...)`` plans as ONE
    TakeOrderedAndProject(limit=offset+limit, offset=offset) — each
    partition keeps a bounded heap and only offset+limit rows reach the
    driver-side merge; the full input never crosses a single-partition
    exchange (a global ``row_number`` window would shuffle the ENTIRE
    frame to one task before slicing, SURVEY §2.7 O2). The optional
    total is a broadcast one-row count — map-side partial counts, one
    row per input partition through the exchange — NOT the reference's
    ``COUNT(*) OVER ()`` empty-frame window, which would also funnel
    every row through one task; the cost is a second scan of ``df``,
    which is why the reference gates totals behind ``includeTotal``
    and this port keeps the gate.
    """
    ordc = _cols(order)
    if with_total:
        df = df.crossJoin(
            F.broadcast(df.groupBy().agg(F.count(F.lit(1)).alias("total")))
        )
    return df.orderBy(*ordc).offset(offset).limit(limit)


def frequent_items(
    df: DataFrame, col: str, k: int, pool_factor: int = 4
) -> DataFrame:
    """Heavy hitters at scale (ClickHouse ``topK``): exact top-k counts
    WITHOUT a full-cardinality shuffle.

    Two phases: (1) ``approx_top_k`` sketches a candidate pool of
    ``k * pool_factor`` items — mergeable, map-side partials, only
    sketch summaries cross the exchange; (2) the candidate set
    broadcasts into a semi-join and the survivors get ONE exact
    filtered aggregation. The exact groupBy-everything-then-TakeOrdered
    form (vocab_stats) shuffles every distinct key; on a 100 TB
    high-cardinality column that shuffle IS the job, while this plan's
    exchanges carry sketch bytes + candidate rows only.

    Exactness: returned counts are always exact (phase 2 recounts).
    The top-k MEMBERSHIP is exact whenever the true k-th item lands in
    the sketch's candidate pool — guaranteed for skewed (Zipfian)
    columns, which is the only regime where this operator is the right
    choice; for near-uniform columns use the exact form. The pytest
    compares against the exact plan on a real word corpus.
    """
    cands = (
        df.agg(F.expr(f"approx_top_k({col}, {int(k) * int(pool_factor)})").alias("tk"))
        .select(F.explode("tk").alias("t"))
        .select(F.col("t.item").alias(col))
    )
    exact = (
        df.join(F.broadcast(cands), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return exact.orderBy(F.col("cnt").desc(), F.col(col).asc()).limit(k)
