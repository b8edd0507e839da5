"""Sequence packing for LLM training pipelines: assign documents to
fixed-token-budget training sequences ("packs").

Production pipelines pack per input shard, in a deterministic document
order, with a greedy rule: append the next document to the current pack
unless it would overflow the budget, in which case start a new pack
(an oversized document gets a pack of its own). The scan is inherently
sequential *within* a shard, so the shard (``group_col``) is the unit
of parallelism — at 100 TB a corpus has millions of shards and the
stage is embarrassingly parallel; no shuffle beyond the group
repartition, no driver-side work.

The per-group scan runs as an Arrow-batched ``applyInPandas`` (a numpy
loop over one shard's doc list — thousands of rows, microseconds),
which is the correct Spark tool for order-dependent per-group state
that plain window functions cannot express (the running sum RESETS on
overflow, so it is not a cumsum).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def greedy_pack(
    docs: DataFrame,
    budget: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Greedy sequence packing per group.

    Input: one row per document with ``group_col`` (shard), ``order_col``
    (deterministic order within the shard), ``tokens_col`` (token count).
    Output: the same rows plus ``pack_id`` (0-based pack index within the
    group) and ``pack_pos`` (0-based position within the pack).
    """
    out_schema = T.StructType(
        [
            T.StructField(group_col, docs.schema[group_col].dataType),
            T.StructField(order_col, docs.schema[order_col].dataType),
            T.StructField(tokens_col, T.LongType()),
            T.StructField("pack_id", T.LongType()),
            T.StructField("pack_pos", T.LongType()),
        ]
    )

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, ignore_index=True)
        toks = pdf[tokens_col].to_numpy()
        pack_ids = [0] * len(toks)
        pack_pos = [0] * len(toks)
        acc = 0
        pid = 0
        pos = 0
        for i, t in enumerate(toks):
            if i > 0 and acc + t > budget:
                pid += 1
                acc = 0
                pos = 0
            acc += int(t)
            pack_ids[i] = pid
            pack_pos[i] = pos
            pos += 1
        pdf = pdf[[group_col, order_col, tokens_col]].copy()
        pdf[tokens_col] = pdf[tokens_col].astype("int64")
        pdf["pack_id"] = pack_ids
        pdf["pack_pos"] = pack_pos
        return pdf

    return docs.select(group_col, order_col, tokens_col).groupBy(group_col).applyInPandas(
        pack_group, schema=out_schema
    )


def pack_stats(packed: DataFrame, budget: int, group_col: str = "source") -> DataFrame:
    """Pack-level utilization: docs per pack, token fill ratio."""
    return packed.groupBy(group_col, "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tokens").alias("pack_tokens"),
        (F.sum("tokens") / F.lit(float(budget))).alias("fill_ratio"),
    )


def corpus_order(
    docs: DataFrame,
    weights: dict[str, int],
    group_col: str = "source",
    order_col: str = "doc_id",
    default_weight: int = 1,
) -> DataFrame:
    """Deterministic weighted interleave — the final training-order
    step: a source with weight w contributes w consecutive slots per
    cycle, so the mixture ratio is exact over any long window and the
    order is fully reproducible (integer math only, no RNG).

    Scale shape: one window per source (rank within source) and one
    global sort by the computed (cycle, source, slot) key — a
    range-partitioned sort, no driver involvement.
    """
    w_expr = None
    for src, w in weights.items():
        base = F.when(F.col(group_col) == src, F.lit(int(w)))
        w_expr = base if w_expr is None else w_expr.when(
            F.col(group_col) == src, F.lit(int(w))
        )
    w_expr = (
        w_expr.otherwise(F.lit(int(default_weight)))
        if w_expr is not None
        else F.lit(int(default_weight))
    )
    from pyspark.sql.window import Window

    rn = F.row_number().over(
        Window.partitionBy(group_col).orderBy(F.col(order_col).asc())
    )
    ordered = (
        docs.withColumn("__w", w_expr)
        .withColumn("__rn", rn - 1)
        .withColumn("__cycle", (F.col("__rn") / F.col("__w")).cast("long"))
        .withColumn("__slot", F.col("__rn") % F.col("__w"))
    )
    pos = F.row_number().over(
        Window.orderBy(
            F.col("__cycle").asc(), F.col(group_col).asc(), F.col("__slot").asc()
        )
    )
    return ordered.select(
        F.col(order_col), F.col(group_col), (pos - 1).alias("position")
    )
