"""Distributed PCA for embedding columns — the dimensionality-reduction
step of large-scale embedding pipelines (whitening before clustering /
ANN, compressing stored vectors, SemDeDup-style preprocessing).

Spark-first shape: the ONLY distributed work is one pass computing the
d-vector of component sums and the d(d+1)/2 upper-triangle second-moment
sums (per-row products explode map-side and partial-aggregate
immediately — the shuffle carries at most d(d+1)/2 + d rows TOTAL,
independent of corpus size). The d x d covariance eigendecomposition
runs on the driver with numpy — d is model-sized (64 here), so this is
the classic Gram-matrix split: cluster for the O(n d^2) moment pass,
driver for the O(d^3) solve. Projection back over the corpus is pure
column expressions (no UDF): each output component is a fold of
(x_j - mean_j) * w_j over the vector.

Determinism: moment sums accumulate integer-scaled products
(floor(x*1e6) BIGINT multiplied exactly) so the covariance — and hence
the fitted model — is bit-identical across shuffle orders and
partitionings. numpy.linalg.eigh on identical input is deterministic.
Eigenvector SIGN is normalized (largest-|component| coordinate made
positive) so refits can't flip components.

Model persistence mirrors the LM/DSIR/BPE family: ``save_pca_model`` /
``load_pca_model`` parquet rows + a ``pca fit|project`` CLI seam
(cli.py), so the corpus is fit ONCE and projected many times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000  # matches the integer-scaled cosine stack (similarity.py)


def fit_pca(
    vectors: DataFrame,
    k: int = 8,
    vec: str = "embedding",
) -> dict:
    """Fit a PCA model: {"mean": [d], "components": [k][d],
    "explained_variance": [k], "n": int, "dim": int}.

    One distributed job: per row, explode the upper-triangle index
    pairs (i <= j) with exact integer-scaled products; sum per (i, j)
    with map-side partials. Cells = d(d+1)/2 + d rows total on the
    driver — model-sized at any corpus size.
    """
    import numpy as np

    first = vectors.select(F.size(F.col(vec)).alias("d")).first()
    if first is None:
        raise ValueError("fit_pca: empty input")
    d = first["d"]
    k = min(int(k), d)

    xs = F.expr(
        f"transform({vec}, x -> CAST(floor(CAST(x AS DOUBLE) * {_SCALE}) AS BIGINT))"
    )
    pairs = F.expr(
        "flatten(transform(sequence(0, size(__xs) - 1), i -> "
        "transform(sequence(i, size(__xs) - 1), j -> "
        "struct(i AS i, j AS j, __xs[i] * __xs[j] AS p, "
        "CASE WHEN i = j THEN __xs[i] ELSE CAST(NULL AS BIGINT) END AS s))))"
    )
    cells = (
        vectors.select(xs.alias("__xs"))
        .select(F.explode(pairs).alias("c"))
        .groupBy(F.col("c.i").alias("i"), F.col("c.j").alias("j"))
        .agg(
            F.sum(F.col("c.p").cast("decimal(38,0)")).alias("pp"),
            F.sum(F.col("c.s").cast("decimal(38,0)")).alias("ss"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    n = cells[0]["n"]
    S1 = np.zeros(d)  # component sums (scaled)
    S2 = np.zeros((d, d))  # product sums (scaled^2)
    for r in cells:
        i, j = r["i"], r["j"]
        S2[i, j] = S2[j, i] = float(r["pp"])
        if i == j:
            S1[i] = float(r["ss"])
    mean = S1 / n / _SCALE
    cov = S2 / n / (_SCALE * _SCALE) - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T  # k x d
    for c in range(comps.shape[0]):  # sign normalization
        a = int(np.argmax(np.abs(comps[c])))
        if comps[c][a] < 0:
            comps[c] = -comps[c]
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained_variance": w[order].tolist(),
        "n": int(n),
        "dim": int(d),
    }


def _arr_lit(xs) -> str:
    return "array(" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in xs) + ")"


def project_pca(
    vectors: DataFrame,
    model: dict,
    vec: str = "embedding",
    out: str = "pca",
) -> DataFrame:
    """Append ``out``: array<double> of length k — the centered input
    projected onto the fitted components. Pure column expressions (the
    mean and component matrix inline as literals, broadcast with the
    plan), zero shuffle, whole-stage codegen."""
    mean = model["mean"]
    comps = model["components"]
    d = model["dim"]
    comp_lit = "array(" + ", ".join(_arr_lit(c) for c in comps) + ")"
    expr = (
        f"transform({comp_lit}, c -> aggregate(sequence(0, {d - 1}), "
        f"CAST(0.0 AS DOUBLE), (acc, j) -> "
        f"acc + (CAST({vec}[j] AS DOUBLE) - {_arr_lit(mean)}[j]) * c[j]))"
    )
    return vectors.withColumn(out, F.expr(expr))


def save_pca_model(spark, model: dict, path: str) -> None:
    """Persist as parquet rows (one per component + a mean row), the
    engine's model-artifact convention (llm/lm.py, llm/dsir.py)."""
    rows = [(-1, model["mean"], float("nan"), model["n"], model["dim"])]
    for c, (comp, ev) in enumerate(
        zip(model["components"], model["explained_variance"])
    ):
        rows.append((c, comp, float(ev), model["n"], model["dim"]))
    spark.createDataFrame(
        rows, "component int, weights array<double>, explained_variance double, n bigint, dim int"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_pca_model(spark, path: str) -> dict:
    rows = spark.read.parquet(path).collect()
    mean_row = next(r for r in rows if r["component"] == -1)
    comp_rows = sorted(
        (r for r in rows if r["component"] >= 0), key=lambda r: r["component"]
    )
    return {
        "mean": list(mean_row["weights"]),
        "components": [list(r["weights"]) for r in comp_rows],
        "explained_variance": [r["explained_variance"] for r in comp_rows],
        "n": mean_row["n"],
        "dim": mean_row["dim"],
    }
