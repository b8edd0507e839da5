"""llm/classify.py: distributed classifiers over the embeddings table.

The exact-oracle checks for centroid_classify / knn_label_vote live in
test_oracle_queries.py (extended registry); here we test the iterative
logistic-regression trainer against a sequential numpy reference and
the blocked knn_vote variant's semantics.
"""

from __future__ import annotations

import numpy as np
import pytest

from degenter_clickhouse_spark import catalog
from degenter_clickhouse_spark.llm import classify

from .helpers import SF_DIR

POS = 3
ITERS = 8
LR = 0.5
L2 = 1e-3


def _numpy_logreg(X, y, iters=ITERS, lr=LR, l2=L2):
    n, dim = X.shape
    w = np.zeros(dim)
    b = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        err = p - y
        gw = X.T @ err
        w = w - lr * (gw / n + l2 * w)
        b = b - lr * err.sum() / n
    return w, b


@pytest.fixture(scope="module")
def emb_np(spark):
    df = catalog.load_table(spark, SF_DIR, "embeddings").toPandas()
    X = np.array(df["embedding"].tolist(), dtype=np.float64)
    y = (df["label"].to_numpy() == POS).astype(np.float64)
    return df, X, y


def test_fit_logreg_matches_numpy(spark, emb_np):
    _, X, y = emb_np
    e = catalog.load_table(spark, SF_DIR, "embeddings")
    w, b = classify.fit_logreg(e, positive_label=POS, iters=ITERS, lr=LR, l2=L2)
    w_ref, b_ref = _numpy_logreg(X, y)
    # DECIMAL gradient sums vs numpy float64 sums: identical up to the
    # float64 reduction-order noise that compounds over ITERS steps
    np.testing.assert_allclose(np.array(w), w_ref, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(b, b_ref, rtol=1e-7, atol=1e-10)


def test_predict_logreg_matches_numpy_probs(spark, emb_np):
    df, X, y = emb_np
    w_ref, b_ref = _numpy_logreg(X, y)
    e = catalog.load_table(spark, SF_DIR, "embeddings")
    scored = (
        classify.predict_logreg(e, list(w_ref), b_ref).toPandas().set_index("vec_id")
    )
    probs_ref = 1.0 / (1.0 + np.exp(-(X @ w_ref + b_ref)))
    got = scored.loc[df["vec_id"]]["prob"].to_numpy()
    np.testing.assert_allclose(got, probs_ref, rtol=1e-9, atol=1e-12)
    # the fitted filter must beat the base rate on its training set
    acc = ((probs_ref >= 0.5) == (y == 1.0)).mean()
    assert acc >= (y == 0.0).mean()


def test_knn_vote_blocked_subset_of_brute(spark):
    """Blocking restricts candidate neighbors to the bucket, so every
    blocked vote is computed from a subset of the brute pair set, and
    within-label blocking trivially predicts the stored label."""
    e = catalog.load_table(spark, SF_DIR, "embeddings")
    blocked = classify.knn_vote(e, k=3, group_col="label").toPandas()
    assert (blocked["pred_label"] == blocked["label"]).all()
    assert blocked["agree"].all()
    n = e.count()
    assert len(blocked) == n


def test_class_centroids_shape_and_mean(spark, emb_np):
    df, X, _ = emb_np
    e = catalog.load_table(spark, SF_DIR, "embeddings")
    cents = classify.class_centroids(e).toPandas().set_index("label")
    labels = df["label"].unique()
    assert set(cents.index) == set(labels)
    for lbl in labels:
        mask = df["label"].to_numpy() == lbl
        # integer-scaled mean: floor(x*1e6) sums / n / 1e6 — within
        # quantization of the true mean
        ref = X[mask].mean(axis=0)
        got = np.array(cents.loc[lbl]["centroid"])
        assert cents.loc[lbl]["n"] == mask.sum()
        np.testing.assert_allclose(got, ref, atol=1e-6 + 1e-12)


def test_knn_blocked_default_recall_vs_brute(spark):
    """The REGISTERED blocked k-NN (hyperplane bucket + 1-bit multi-
    probe, VERDICT r4 #1) vs the brute all-pairs baseline: full vector
    coverage (multi-probe leaves no vector neighbor-less at fixture
    density), and vote agreement well above the coarse-filter floor —
    same standard as test_lsh_ann_recall_vs_brute (single-digit-bit
    LSH on near-orthogonal vectors is a candidate bound, not an exact
    method; the oracle check is what pins the computation itself)."""
    from degenter_clickhouse_spark.llm import similarity

    e = catalog.load_table(spark, SF_DIR, "embeddings").withColumn(
        "bucket", similarity.hyperplane_bucket()
    )
    blocked = (
        classify.knn_vote(
            e, k=5, group_col="bucket", probe_bits=similarity.N_HYPERPLANES
        )
        .toPandas()
        .set_index("vec_id")
    )
    brute = classify.knn_vote(e.drop("bucket"), k=5).toPandas().set_index("vec_id")
    # multi-probe coverage: every vector that brute votes on gets a vote
    assert set(blocked.index) == set(brute.index)
    agree_rate = (
        blocked.loc[brute.index, "pred_label"] == brute["pred_label"]
    ).mean()
    assert agree_rate >= 0.3, agree_rate
    # single-bucket (no probe) blocking is a strict subset of the
    # multi-probe candidate relation: it must never vote on MORE vectors
    single = classify.knn_vote(e, k=5, group_col="bucket").toPandas()
    assert set(single["vec_id"]) <= set(blocked.index)


def test_adaptive_bits_match_oracle_scales(spark):
    """The static 4-bit KNN_BLOCKED_ORACLE stays exact because every
    oracle-scale corpus (sf0.001/sf0.01 embeddings: 500 rows; bench
    sf0.1: 2000) resolves to N_HYPERPLANES bits; larger corpora split
    buckets to hold ~BUCKET_TARGET vectors each (linear scaling law)."""
    from degenter_clickhouse_spark.llm import similarity as S

    for n in (1, 100, 500, 2000):
        assert S.adaptive_hyperplane_bits(n) == S.N_HYPERPLANES
    assert S.adaptive_hyperplane_bits(20_000) == 8
    assert S.adaptive_hyperplane_bits(1_000_000) == 13
    assert S.adaptive_hyperplane_bits(10**12) == 24  # hi clamp
    # monotone: more data never means fewer buckets
    vals = [S.adaptive_hyperplane_bits(2**k) for k in range(8, 40)]
    assert vals == sorted(vals)


def test_hyperplane_bucket_prefix_stable(spark):
    """bucket(bits=b) must equal bucket(bits=b+2) masked to the low b
    bits — raising bits only SPLITS buckets, so recall comparisons
    across scales stay meaningful."""
    from pyspark.sql import functions as F

    from degenter_clickhouse_spark.llm import similarity as S
    from degenter_clickhouse_spark.queries.llm import _embs

    e = _embs(spark, "/root/testdata/sf0.001")
    got = e.select(
        S.hyperplane_bucket(bits=4).alias("b4"),
        S.hyperplane_bucket(bits=6).alias("b6"),
    )
    assert got.where(F.col("b4") != F.col("b6").bitwiseAND(15)).count() == 0


def test_adaptive_ivf_cells_match_oracle_scales(spark):
    """The static 8-cell IVF oracles (hybrid dense leg, batch ANN)
    stay exact because every oracle-scale corpus (<= 500 embeddings)
    resolves to 8 cells; larger corpora grow ~sqrt(n)/4 (FAISS nlist
    discipline) in power-of-two steps."""
    from degenter_clickhouse_spark.llm import similarity as S

    for n in (1, 100, 500, 1000):
        assert S.adaptive_ivf_cells(n) == 8
    assert S.adaptive_ivf_cells(2000) == 16
    assert S.adaptive_ivf_cells(20_000) == 64
    assert S.adaptive_ivf_cells(1_000_000) == 256
    vals = [S.adaptive_ivf_cells(2**k) for k in range(8, 40)]
    assert vals == sorted(vals)


def test_hard_negatives_semantics_brute(spark):
    """Unblocked hard negatives = exact top-k different-label
    neighbors: no same-label row ever appears, ranks are 1..k dense
    per anchor, and the cosine ordering matches a numpy reference."""
    import numpy as np

    e = catalog.load_table(spark, SF_DIR, "embeddings")
    k = 3
    got = classify.hard_negatives(e, k=k).toPandas()
    assert (got["label"] != got["neg_label"]).all()
    for _, grp in got.groupby("vec_id"):
        assert sorted(grp["rank"]) == list(range(1, len(grp) + 1))
        assert len(grp) <= k
        # ranks follow cosine desc
        srt = grp.sort_values("rank")
        assert (srt["cosine"].diff().dropna() <= 1e-12).all()
    # numpy cross-check on one anchor: its rank-1 negative has the max
    # cosine among different-label vectors
    pdf = e.toPandas()
    X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    labels = pdf["label"].to_numpy()
    ids = pdf["vec_id"].to_numpy()
    a = 0
    sims = Xn @ Xn[a]
    mask = labels != labels[a]
    best = ids[mask][np.argmax(sims[mask])]
    got_a = got[got["vec_id"] == ids[a]].sort_values("rank")
    # tolerance: engine cosine uses integer-scaled dot, ties broken by
    # id — allow equality of cosine rather than exact id when tied
    top_cos = got_a.iloc[0]["cosine"]
    ref_cos = sims[mask].max()
    assert abs(top_cos - ref_cos) < 1e-5
    if abs(np.sort(sims[mask])[-1] - np.sort(sims[mask])[-2]) > 1e-9:
        assert got_a.iloc[0]["neg_id"] == best


def test_hard_negatives_blocked_subset_of_brute(spark):
    """Blocked mining only draws candidates from probed buckets, so
    every (anchor, negative) it emits must appear in the brute pair
    universe of different-label pairs."""
    from degenter_clickhouse_spark.llm import similarity as S

    e = catalog.load_table(spark, SF_DIR, "embeddings")
    bits = S.adaptive_hyperplane_bits(e.count())
    eb = e.withColumn("bucket", S.hyperplane_bucket(bits=bits))
    blocked = classify.hard_negatives(
        eb, k=3, group_col="bucket", probe_bits=bits
    ).toPandas()
    assert (blocked["label"] != blocked["neg_label"]).all()
    brute = classify.hard_negatives(e, k=10_000).toPandas()
    universe = set(zip(brute["vec_id"], brute["neg_id"]))
    assert set(zip(blocked["vec_id"], blocked["neg_id"])) <= universe
