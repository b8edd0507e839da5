"""Hybrid retrieval fusion — reciprocal-rank fusion (RRF) of multiple
retriever rankings (Cormack/Clarke/Buettcher 2009), the standard way a
training-data or RAG pipeline combines lexical (BM25) and dense (ANN)
retrieval into one candidate list.

    rrf(d) = sum over retrievers r of 1 / (k + rank_r(d))

Determinism contract (matches the rest of llm/*): each contribution is
the exact integer ``RRF_SCALE div (k + rank)``; per-doc sums are
BIGINT, so the fused ordering is bit-identical across engines and
shuffle orders. Ties break on doc id. The one float column is the
pointwise final division (no reduction).

Scale (100 TB): each input ranking is already top-k (bounded — BM25 via
TakeOrdered, ANN via per-query top-k), so the fusion union holds
``retrievers x k`` rows regardless of corpus size; the groupBy + final
TakeOrdered are bounded by the same constant. The expensive parts are
the retrievers themselves, which keep their own scale paths (posting
buckets for BM25, LSH/IVF cells for ANN).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RRF_SCALE = 1_000_000_000


def rrf_fuse(
    rankings: Sequence[DataFrame],
    k_const: int = 60,
    topk: int = 20,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse ranked lists into (id, rrf_scaled, n_retrievers, rrf),
    best-first. Every input needs (id_col, rank_col) with rank 1-based;
    a doc absent from a ranking simply contributes nothing. A doc that
    appears MORE than once within one ranking (a retriever that emits
    duplicate hits) counts once, at its best (lowest) rank — without
    the reduction it would double-count in both rrf_scaled and
    n_retrievers (ADVICE r5)."""
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking DataFrame")
    contrib = F.expr(
        f"CAST({RRF_SCALE} AS BIGINT) div ({k_const} + {rank_col})"
    )
    tagged = [
        r.groupBy(id_col)
        .agg(F.min(rank_col).alias(rank_col))
        .select(F.col(id_col), contrib.alias("__c"))
        for r in rankings
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    fused = u.groupBy(id_col).agg(
        F.sum("__c").cast("long").alias("rrf_scaled"),
        F.count(F.lit(1)).cast("long").alias("n_retrievers"),
    )
    return (
        fused.orderBy(F.col("rrf_scaled").desc(), F.col(id_col).asc())
        .limit(topk)
        .withColumn(
            "rrf", F.col("rrf_scaled").cast("double") / F.lit(float(RRF_SCALE))
        )
    )


def rrf_fuse_batch(
    rankings: Sequence[DataFrame],
    k_const: int = 60,
    topk: int = 20,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Batch RRF: fuse per-query ranked lists for MANY queries at once.
    Every input needs (query_col, id_col, rank_col); fusion groups on
    (query, doc) and the top-k cut is a query-partitioned rank window —
    bounded per query (inputs are per-query top-k), never global.
    Output: (query_id, doc_id, rrf_scaled, n_retrievers, rrf, rank),
    best-first within each query, ties on doc id."""
    from pyspark.sql.window import Window

    if not rankings:
        raise ValueError("rrf_fuse_batch: need at least one ranking DataFrame")
    contrib = F.expr(
        f"CAST({RRF_SCALE} AS BIGINT) div ({k_const} + {rank_col})"
    )
    tagged = [
        r.groupBy(query_col, id_col)
        .agg(F.min(rank_col).alias(rank_col))
        .select(F.col(query_col), F.col(id_col), contrib.alias("__c"))
        for r in rankings
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    fused = u.groupBy(query_col, id_col).agg(
        F.sum("__c").cast("long").alias("rrf_scaled"),
        F.count(F.lit(1)).cast("long").alias("n_retrievers"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_scaled").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .withColumn(
            "rrf", F.col("rrf_scaled").cast("double") / F.lit(float(RRF_SCALE))
        )
        .select(
            query_col, id_col, "rrf_scaled", "n_retrievers", "rrf", "rank"
        )
    )
