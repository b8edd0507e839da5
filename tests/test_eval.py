"""Retrieval metrics (llm/eval.py): hit counting, zero-result queries,
pinned query sets, deterministic macro averages."""

from __future__ import annotations

from degenter_clickhouse_spark.llm.eval import (
    retrieval_metrics,
    retrieval_summary,
)


def _res(spark, rows):
    return spark.createDataFrame(rows, ["q_id", "c_id", "rank"])


def _rel(spark, rows):
    return spark.createDataFrame(rows, ["q_id", "c_id"])


def test_metrics_basic(spark):
    res = _res(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3),
                       (2, 20, 1), (2, 21, 2)])
    rel = _rel(spark, [(1, 11), (1, 12), (1, 99), (2, 77)])
    out = {r["q_id"]: r.asDict() for r in
           retrieval_metrics(res, rel, k=3).collect()}
    # q1: 2 of 3 relevant retrieved, first at rank 2
    assert out[1]["n_rel"] == 3 and out[1]["n_hits"] == 2
    assert out[1]["recall_at_k"] == 2 / 3
    assert out[1]["precision_at_k"] == 2 / 3
    assert out[1]["reciprocal_rank"] == 1 / 2
    # q2: nothing relevant retrieved
    assert out[2]["n_hits"] == 0 and out[2]["reciprocal_rank"] == 0.0


def test_rank_cutoff_applies(spark):
    res = _res(spark, [(1, 10, 1), (1, 11, 4)])  # 11 beyond k=3
    rel = _rel(spark, [(1, 11)])
    out = retrieval_metrics(res, rel, k=3).collect()[0]
    assert out["n_hits"] == 0 and out["recall_at_k"] == 0.0


def test_queries_frame_pins_zero_result_queries(spark):
    res = _res(spark, [(1, 10, 1)])
    rel = _rel(spark, [(1, 10), (3, 30)])
    qs = spark.createDataFrame([(1,), (2,), (3,)], ["q"])
    out = {r["q_id"]: r.asDict() for r in
           retrieval_metrics(res, rel, k=5, queries=qs).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2]["n_rel"] == 0 and out[2]["recall_at_k"] == 0.0
    assert out[3]["n_rel"] == 1 and out[3]["n_hits"] == 0


def test_summary_macro_averages(spark):
    res = _res(spark, [(1, 10, 1), (2, 20, 2)])
    rel = _rel(spark, [(1, 10), (2, 20), (2, 21)])
    per = retrieval_metrics(res, rel, k=2)
    s = retrieval_summary(per).collect()[0]
    assert s["n_queries"] == 2
    assert abs(s["macro_recall"] - (1.0 + 0.5) / 2) < 1e-8
    assert abs(s["mrr"] - (1.0 + 0.5) / 2) < 1e-8
    # determinism across partitionings
    s2 = retrieval_summary(per.repartition(7)).collect()[0]
    assert s == s2


def test_ndcg_at_k_matches_python_oracle(spark):
    """VERDICT r7 #8: nDCG@k joins the harness with a tolerance oracle
    (log2 is libm — epsilon, not value-hash). Hand-built case plus a
    pure-Python recomputation; zero-relevance and empty-result queries
    pin to 0."""
    import math

    from degenter_clickhouse_spark.llm.eval import ndcg_at_k

    res = _res(spark, [
        (1, 10, 1), (1, 11, 2), (1, 12, 3),   # rel at ranks 1, 3
        (2, 20, 1), (2, 21, 2),               # rel at rank 2 only
        (3, 30, 1),                           # no relevant docs at all
    ])
    rel = _rel(spark, [
        (1, 10), (1, 12), (1, 99),   # n_rel=3 (one never retrieved)
        (2, 21), (2, 98), (2, 97),   # n_rel=3
        (4, 40),                     # query with relevance, no results
    ])
    got = {r.q_id: r for r in ndcg_at_k(res, rel, k=3).collect()}

    def idcg(n_rel, k=3):
        return sum(1.0 / math.log2(i + 1) for i in range(1, min(n_rel, k) + 1))

    want = {
        1: (1 / math.log2(2) + 1 / math.log2(4)) / idcg(3),
        2: (1 / math.log2(3)) / idcg(3),
        3: 0.0,  # no relevant docs -> idcg 0 -> ndcg 0
        4: 0.0,  # nothing retrieved -> dcg 0
    }
    assert set(got) == set(want)
    for q, w in want.items():
        assert abs(got[q].ndcg - w) < 1e-9, (q, got[q].ndcg, w)
    # bounds + perfect-ranking sanity: rel docs at the top -> ndcg 1
    perfect = _res(spark, [(7, 1, 1), (7, 2, 2)])
    prel = _rel(spark, [(7, 1), (7, 2)])
    row = ndcg_at_k(perfect, prel, k=3).collect()[0]
    assert abs(row.ndcg - 1.0) < 1e-12
