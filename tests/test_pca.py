"""Distributed PCA (llm/pca.py): moment-pass fit vs numpy, projection
expressions, sign stability, model artifact roundtrip."""

from __future__ import annotations

import numpy as np
import pytest

from degenter_clickhouse_spark import catalog
from degenter_clickhouse_spark.llm import pca as P

from .helpers import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    e = catalog.load_table(spark, SF_DIR, "embeddings")
    pdf = e.toPandas()
    X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    return e, X


def _numpy_pca(X, k):
    # the SAME integer quantization the distributed fit applies
    Xq = np.floor(X * 1_000_000)
    n, d = Xq.shape
    mean = Xq.sum(0) / n / 1_000_000
    cov = (Xq.T @ Xq) / n / 1e12 - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T
    for c in range(comps.shape[0]):
        a = int(np.argmax(np.abs(comps[c])))
        if comps[c][a] < 0:
            comps[c] = -comps[c]
    return mean, comps, w[order]


def test_fit_pca_matches_numpy(spark, emb):
    e, X = emb
    k = 4
    model = P.fit_pca(e, k=k)
    mean, comps, ev = _numpy_pca(X, k)
    np.testing.assert_allclose(model["mean"], mean, rtol=0, atol=1e-12)
    np.testing.assert_allclose(
        model["explained_variance"], ev, rtol=1e-9, atol=1e-15
    )
    np.testing.assert_allclose(model["components"], comps, rtol=0, atol=1e-8)
    assert model["n"] == len(X) and model["dim"] == X.shape[1]


def test_project_pca_matches_numpy(spark, emb):
    e, X = emb
    model = P.fit_pca(e, k=3)
    got = (
        P.project_pca(e, model)
        .select("vec_id", "pca")
        .toPandas()
        .set_index("vec_id")
    )
    comps = np.array(model["components"])
    mean = np.array(model["mean"])
    ref = (X - mean) @ comps.T
    ids = e.select("vec_id").toPandas()["vec_id"].to_numpy()
    got_m = np.array([got.loc[i]["pca"] for i in ids])
    np.testing.assert_allclose(got_m, ref, rtol=0, atol=1e-9)
    # projections of the top component carry the most variance
    vars_ = got_m.var(axis=0)
    assert vars_[0] >= vars_[1] >= vars_[2]


def test_fit_deterministic_across_partitionings(spark, emb):
    e, _ = emb
    m1 = P.fit_pca(e.repartition(17), k=2)
    m2 = P.fit_pca(e.repartition(3), k=2)
    assert m1 == m2  # bit-identical, integer-scaled moments


def test_model_artifact_roundtrip(spark, emb, tmp_path):
    e, _ = emb
    model = P.fit_pca(e, k=3)
    path = str(tmp_path / "pca_model")
    P.save_pca_model(spark, model, path)
    loaded = P.load_pca_model(spark, path)
    assert loaded["mean"] == model["mean"]
    assert loaded["components"] == model["components"]
    assert loaded["n"] == model["n"] and loaded["dim"] == model["dim"]
    np.testing.assert_allclose(
        loaded["explained_variance"], model["explained_variance"]
    )
    # projecting from the artifact equals projecting from the fit
    a = P.project_pca(e, model).select("vec_id", "pca").collect()
    b = P.project_pca(e, loaded).select("vec_id", "pca").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_empty_input_rejected(spark):
    e = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        P.fit_pca(e, k=2)
