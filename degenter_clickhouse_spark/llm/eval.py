"""Retrieval evaluation metrics — the measurement step of a retrieval
/ RAG data pipeline: recall@k, precision@k and MRR for a ranked result
set against a relevance table, per query and macro-averaged.

Spark-first shape: two dimension-sized joins (results x relevance on
(query, doc); relevant-counts per query) and one aggregation — the
shuffle carries queries x metrics rows, never the corpus. All metrics
are ratios of small integers evaluated in doubles, identical in any
engine; the macro averages accumulate ``floor(metric * 1e9)`` BIGINTs
through DECIMAL sums, so the summary is bit-identical across shuffle
orders and engines (floor, not round: floor of identical doubles can
never straddle a rounding rule difference).

nDCG lives in :func:`ndcg_at_k`, SEPARATE from the hash-gated metrics
above: its log2 discount is a libm call whose last-ulp behavior
differs across engines, so it is verified by a tolerance-checked
pytest (tests/test_eval.py) rather than the driver's value-hash
oracle — the exact-rational metrics keep their bit-identical gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_S = 1_000_000_000  # metric scale for exact macro-averaging


def retrieval_metrics(
    results: DataFrame,
    relevance: DataFrame,
    k: int,
    queries: DataFrame | None = None,
    query_col: str = "q_id",
    doc_col: str = "c_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query metrics → (query, n_rel, n_hits, recall_at_k,
    precision_at_k, reciprocal_rank).

    ``results``: ranked retrieval output (query, doc, rank 1-based).
    ``relevance``: ground-truth (query, doc) pairs.
    ``queries``: optional one-column frame pinning the evaluated query
    set — queries with NO results (or no relevant docs) still get a
    row (zeros) instead of silently dropping out of the average.
    """
    r = results.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("__q"), F.col(doc_col).alias("__d"),
        F.col(rank_col).alias("__r"),
    )
    rel = relevance.select(
        F.col(query_col).alias("__q"), F.col(doc_col).alias("__d")
    )
    if queries is None:
        qs = rel.select("__q").union(r.select("__q")).distinct()
    else:
        qs = queries.select(F.col(queries.columns[0]).alias("__q")).distinct()
    nrel = rel.groupBy("__q").agg(F.count(F.lit(1)).alias("n_rel"))
    hits = r.join(rel, ["__q", "__d"]).groupBy("__q").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("__r").alias("first_rank"),
    )
    out = (
        qs.join(nrel, "__q", "left")
        .join(hits, "__q", "left")
        .select(
            F.col("__q").alias(query_col),
            F.coalesce("n_rel", F.lit(0)).cast("long").alias("n_rel"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.when(
                F.coalesce("n_rel", F.lit(0)) > 0,
                F.coalesce("n_hits", F.lit(0)) / F.col("n_rel"),
            )
            .otherwise(F.lit(0.0))
            .alias("recall_at_k"),
            (F.coalesce("n_hits", F.lit(0)) / F.lit(float(k))).alias(
                "precision_at_k"
            ),
            F.when(
                F.col("first_rank").isNotNull(), F.lit(1.0) / F.col("first_rank")
            )
            .otherwise(F.lit(0.0))
            .alias("reciprocal_rank"),
        )
    )
    return out


def retrieval_summary(per_query: DataFrame, query_col: str = "q_id") -> DataFrame:
    """Macro averages over the per-query frame — one row:
    (n_queries, macro_recall, macro_precision, mrr). Deterministic:
    floor-scaled BIGINTs through DECIMAL sums."""

    def favg(c: str):
        return (
            F.sum(
                F.floor(F.col(c) * F.lit(_S)).cast("long").cast("decimal(38,0)")
            ).cast("double")
            / F.count(F.lit(1))
            / F.lit(float(_S))
        )

    return per_query.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        favg("recall_at_k").alias("macro_recall"),
        favg("precision_at_k").alias("macro_precision"),
        favg("reciprocal_rank").alias("mrr"),
    )


def ndcg_at_k(
    results: DataFrame,
    relevance: DataFrame,
    k: int,
    queries: DataFrame | None = None,
    query_col: str = "q_id",
    doc_col: str = "c_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Binary-relevance nDCG@k per query → (query, dcg, idcg, ndcg).

    DCG = Σ 1/log2(rank+1) over the relevant docs retrieved in the
    top-k; IDCG = Σ_{i=1..min(n_rel,k)} 1/log2(i+1) (the best possible
    ordering); nDCG = DCG/IDCG, 0 for queries with no relevant docs.
    Same two dimension-sized joins as :func:`retrieval_metrics` — the
    shuffle carries queries, never the corpus. The IDCG fold
    short-circuits ``n_rel = 0`` explicitly (Spark's sequence(1, 0)
    counts DOWN, not empty).

    Kept out of the value-hash oracle surface on purpose: log2 is a
    libm call with engine-specific last-ulp behavior; correctness is
    asserted with an epsilon in tests/test_eval.py.
    """
    r = results.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("__q"), F.col(doc_col).alias("__d"),
        F.col(rank_col).alias("__r"),
    )
    rel = relevance.select(
        F.col(query_col).alias("__q"), F.col(doc_col).alias("__d")
    )
    if queries is None:
        qs = rel.select("__q").union(r.select("__q")).distinct()
    else:
        qs = queries.select(F.col(queries.columns[0]).alias("__q")).distinct()
    nrel = rel.groupBy("__q").agg(F.count(F.lit(1)).alias("n_rel"))
    dcg = (
        r.join(rel, ["__q", "__d"])
        .groupBy("__q")
        .agg(F.sum(F.lit(1.0) / F.log2(F.col("__r") + F.lit(1.0))).alias("dcg"))
    )
    ideal = F.expr(
        f"aggregate(sequence(1, int(least(n_rel, {int(k)}))), "
        f"CAST(0.0 AS DOUBLE), (acc, i) -> acc + 1.0 / log2(i + 1.0))"
    )
    return (
        qs.join(nrel, "__q", "left")
        .join(dcg, "__q", "left")
        .select(
            F.col("__q").alias(query_col),
            F.coalesce("dcg", F.lit(0.0)).alias("dcg"),
            F.when(F.coalesce("n_rel", F.lit(0)) > 0, ideal)
            .otherwise(F.lit(0.0))
            .alias("idcg"),
        )
        .withColumn(
            "ndcg",
            F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg")).otherwise(
                F.lit(0.0)
            ),
        )
    )
