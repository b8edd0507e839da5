"""Distributed classification over embedding columns.

Training-data pipelines filter and route documents with cheap learned
classifiers (quality filters a la CCNet/fastText, topic routers,
label-noise detection). The reference engine has no ML surface, so
these are beyond-reference operators in the same family as llm/dedup
and llm/similarity, sharing their determinism contract: every
cross-row float reduction is an exact integer (or DECIMAL) sum, so
results are bit-identical across shuffle orders and engines.

Operators
---------
``class_centroids``      per-label mean embedding (integer-scaled sums)
``nearest_centroid``     assign each vector to its max-cosine centroid
``knn_vote``             k-NN majority-vote label + agreement flag
                         (disagreements = label-noise candidates)
``fit_logreg``           one-vs-rest logistic regression by batch
                         gradient descent, each step a single Spark
                         aggregation (DECIMAL-summed gradients)
``predict_logreg``       apply fitted weights as a column expression

Scale design (100 TB):

* ``class_centroids`` posexplodes to (label, idx) rows, but the
  groupBy sum has map-side partial aggregation, so the shuffle is
  ``partitions x labels x dim`` rows — independent of corpus size.
* ``nearest_centroid`` / ``predict_logreg`` broadcast a model that is
  ``labels x dim`` / ``dim`` floats and stream the corpus in one pass:
  no shuffle at all.
* ``knn_vote`` is quadratic per blocking group, exactly like
  similarity.neardup_pairs: ``group_col=None`` is the small-data /
  oracle baseline, at scale pass a bucket column (hyperplane LSH or
  IVF cell) so the join key bounds the pair count.
* ``fit_logreg`` keeps the model driver-side (dim+1 doubles) and runs
  one distributed aggregation per iteration — the classic "broadcast
  weights, reduce gradients" layout; nothing per-row ever returns to
  the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.joins import dim_broadcast
from .similarity import cosine_from_scaled, scaled_dot, scaled_norm2, with_norm

# Centroid components are accumulated as floor(x * 1e6) BIGINTs: exact,
# associative, and overflow-safe to ~9e12 rows per (label, idx) cell.
CENTROID_SCALE = "1e6"


def class_centroids(
    vectors: DataFrame,
    label_col: str = "label",
    vec: str = "embedding",
) -> DataFrame:
    """Per-label mean embedding -> (label, centroid array<double>, n).

    Component sums are integer-scaled so the mean is bit-identical
    across engines and shuffle orders; the division back to DOUBLE is
    pointwise (no reduction) and therefore IEEE-deterministic.
    """
    comp = vectors.select(
        F.col(label_col).alias("label"), F.posexplode(F.col(vec)).alias("idx", "x")
    ).withColumn(
        "cs",
        F.expr(f"CAST(floor(CAST(x AS DOUBLE) * {CENTROID_SCALE}) AS BIGINT)"),
    )
    per = comp.groupBy("label", "idx").agg(
        F.sum("cs").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return per.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("idx", "s", "n"))),
            lambda t: t["s"] / t["n"] / F.lit(1e6),
        ).alias("centroid"),
        F.max("n").alias("n"),
    )


def nearest_centroid(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec: str = "embedding",
) -> DataFrame:
    """Max-cosine centroid per vector (tie -> smallest label).

    Output: (vec_id, label, pred_label, cosine). The centroid table is
    broadcast — the corpus streams through with zero shuffle.
    """
    c = centroids.select(
        F.col("label").alias("cand_label"),
        F.col("centroid"),
        scaled_norm2("centroid").alias("c_n2"),
    )
    v = with_norm(vectors, vec).select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("label"),
        F.col(vec).alias("v"),
        F.col("norm2_s").alias("v_n2"),
    )
    scored = v.crossJoin(dim_broadcast(c)).withColumn(
        "cosine",
        cosine_from_scaled(scaled_dot("v", "centroid"), F.col("v_n2"), F.col("c_n2")),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("cand_label").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("vec_id", "label", F.col("cand_label").alias("pred_label"), "cosine")
    )


def _scored_pairs(
    vectors: DataFrame,
    group_col: str | None = None,
    probe_bits: int = 0,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec: str = "embedding",
) -> DataFrame:
    """Directed cosine-scored neighbor pairs (vec_id, label, nb_id,
    nb_label, cosine) — the shared pair stage of ``knn_vote`` and
    ``hard_negatives``.

    ``group_col=None`` scores all pairs — the correctness baseline.
    At scale pass a blocking column (hyperplane bucket, IVF cell) so
    the pair join is bounded per bucket, mirroring neardup_pairs.
    ``probe_bits=b`` (requires an INT ``group_col``) additionally
    scores pairs whose buckets differ in exactly one of the low ``b``
    bits — LSH multi-probe, which recovers most of the recall a single
    bucket loses while keeping the pair count bounded by
    ``(1 + b) x corpus^2 / 2^bits``. Hamming distance is symmetric, so
    the unordered-pair optimization below stays valid: a qualifying
    pair matches exactly one probe (the 0-flip for same-bucket pairs,
    the single differing bit otherwise) — no duplicate scoring.
    """
    # NOT pinned (optimization r14, measured): a localCheckpoint here
    # would compute the bucket+norm once instead of once per join side,
    # but a same-session A/B read 1.835s -> 1.835s min-of-4 on
    # knn_label_vote_blocked — the pair join's cosine folds and the
    # top-k windows dominate; the per-vector bucket fold is map-side
    # noise, and the pin would add a full materialization of the
    # embedding column for nothing.
    v = with_norm(vectors, vec)
    a = v.select(
        *([F.col(group_col).alias("g")] if group_col else []),
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("label"),
        F.col(vec).alias("va"),
        F.col("norm2_s").alias("na"),
    )
    if group_col and probe_bits:
        a = a.withColumn(
            "g",
            F.explode(
                F.array(
                    F.col("g"),
                    *[F.col("g").bitwiseXOR(1 << j) for j in range(probe_bits)],
                )
            ),
        )
    b = v.select(
        *([F.col(group_col).alias("gb")] if group_col else []),
        F.col(id_col).alias("nb_id"),
        F.col(label_col).alias("nb_label"),
        F.col(vec).alias("vb"),
        F.col("norm2_s").alias("nb"),
    )
    # cosine is symmetric, so score each unordered pair ONCE (id <
    # id join — half the dot products, the dominant cost: higher-order
    # array aggregates are interpreted, not codegen'd) and mirror the
    # scored row for the other direction; the mirror is a map-only
    # union of already-small (ids, labels, cosine) rows.
    cond = F.col("vec_id") < F.col("nb_id")
    if group_col:
        cond = (F.col("g") == F.col("gb")) & cond
    def _dir(id1, l1, id2, l2):
        return F.struct(
            F.col(id1).alias("vec_id"),
            F.col(l1).alias("label"),
            F.col(id2).alias("nb_id"),
            F.col(l2).alias("nb_label"),
            F.col("cosine").alias("cosine"),
        )

    # each unordered pair explodes into both directions IN THE SAME
    # STAGE (map-side, after the single cosine evaluation) — a
    # self-union would re-run the join, a checkpoint would pay
    # materialization I/O; this pays neither
    pairs = (
        a.join(b, cond)
        .withColumn(
            "cosine",
            cosine_from_scaled(scaled_dot("va", "vb"), F.col("na"), F.col("nb")),
        )
        .select(
            F.explode(
                F.array(
                    _dir("vec_id", "label", "nb_id", "nb_label"),
                    _dir("nb_id", "nb_label", "vec_id", "label"),
                )
            ).alias("p")
        )
        .select("p.*")
    )
    return pairs


def knn_vote(
    vectors: DataFrame,
    k: int = 5,
    group_col: str | None = None,
    probe_bits: int = 0,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec: str = "embedding",
) -> DataFrame:
    """k-NN majority-vote label per vector; ``agree`` flags whether the
    vote matches the stored label (disagreement = label-noise
    candidate, the SemDeDup-era data-cleaning use).

    Blocking/multi-probe semantics are ``_scored_pairs``'s. Ties break
    on (count desc, label asc); neighbor rank ties break on (cosine
    desc, neighbor id asc) — total order, engine-independent.
    """
    pairs = _scored_pairs(vectors, group_col, probe_bits, id_col, label_col, vec)
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("nb_id").asc())
    top = pairs.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    votes = top.groupBy("vec_id", "label", "nb_label").agg(
        F.count(F.lit(1)).alias("votes")
    )
    wv = Window.partitionBy("vec_id").orderBy(
        F.col("votes").desc(), F.col("nb_label").asc()
    )
    return (
        votes.withColumn("__rv", F.row_number().over(wv))
        .filter(F.col("__rv") == 1)
        .select(
            "vec_id",
            "label",
            F.col("nb_label").alias("pred_label"),
            "votes",
            (F.col("nb_label") == F.col("label")).alias("agree"),
        )
    )


def hard_negatives(
    vectors: DataFrame,
    k: int = 3,
    group_col: str | None = None,
    probe_bits: int = 0,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec: str = "embedding",
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: for
    each anchor, the top-``k`` most-similar vectors with a DIFFERENT
    label — the near-miss negatives that dominate the training signal
    (easy negatives contribute ~zero gradient once the model separates
    them).

    Same bounded pair stage as ``knn_vote`` (``_scored_pairs``:
    hyperplane-bucket blocking + Hamming multi-probe at scale — never
    all-pairs), then a label-mismatch filter BEFORE the per-anchor
    rank window, so negatives crowded out of a mixed top-k still
    surface. Output: (vec_id, label, neg_id, neg_label, cosine, rank),
    rank 1..k by (cosine desc, neg_id asc) — total order.
    """
    pairs = _scored_pairs(vectors, group_col, probe_bits, id_col, label_col, vec)
    negs = pairs.filter(F.col("nb_label") != F.col("label"))
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("nb_id").asc()
    )
    return (
        negs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "vec_id",
            "label",
            F.col("nb_id").alias("neg_id"),
            F.col("nb_label").alias("neg_label"),
            "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def _sigmoid(z: float) -> float:
    if z >= 0:
        return 1.0 / (1.0 + math.exp(-z))
    e = math.exp(z)
    return e / (1.0 + e)


def fit_logreg(
    vectors: DataFrame,
    positive_label: int,
    label_col: str = "label",
    vec: str = "embedding",
    iters: int = 20,
    lr: float = 0.5,
    l2: float = 1e-3,
) -> tuple[list[float], float]:
    """One-vs-rest logistic regression by full-batch gradient descent.

    Each iteration is ONE distributed job: broadcast the current
    weights as a literal array, compute the per-row error
    ``sigmoid(w.x + b) - y`` JVM-side, posexplode the feature vector,
    and DECIMAL-sum the per-component gradient (groupBy idx has
    map-side partials, so the shuffle is partitions x dim rows). The
    model (dim+1 doubles) is the only thing that touches the driver.

    Returns (weights, bias).
    """
    dim = len(vectors.select(vec).first()[0])
    n = vectors.count()
    w = [0.0] * dim
    b = 0.0
    base = vectors.select(
        F.col(vec).alias("x"),
        F.when(F.col(label_col) == positive_label, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("y"),
    ).localCheckpoint()
    for _ in range(iters):
        w_lit = F.array(*[F.lit(float(c)) for c in w])
        margin = F.expr(
            "aggregate(zip_with(x, __w, (xi, wi) -> CAST(xi AS DOUBLE) * wi), "
            "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        ) + F.lit(float(b))
        err = (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__m")))) - F.col("y")
        rows = (
            base.withColumn("__w", w_lit)
            .withColumn("__m", margin)
            .withColumn("__e", err)
        )
        # bias folded in as feature index `dim` (constant 1.0), so the
        # whole gradient is ONE aggregation job per iteration
        grad_rows = (
            rows.select(
                F.col("__e"),
                F.posexplode(F.concat(F.col("x"), F.array(F.lit(1.0)))).alias(
                    "idx", "xi"
                ),
            )
            .groupBy("idx")
            .agg(
                F.sum((F.col("__e") * F.col("xi")).cast("decimal(38,18)")).alias("g")
            )
            .collect()
        )
        g = [0.0] * (dim + 1)
        for r in grad_rows:
            g[r["idx"]] = float(r["g"])
        w = [wi - lr * (gi / n + l2 * wi) for wi, gi in zip(w, g[:dim])]
        b = b - lr * g[dim] / n
    return w, b


def predict_logreg(
    vectors: DataFrame,
    weights: list[float],
    bias: float,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Score vectors with fitted weights: pure column expressions, one
    pass, no shuffle. Output: (vec_id, prob, pred)."""
    w_lit = F.array(*[F.lit(float(c)) for c in weights])
    margin = F.expr(
        "aggregate(zip_with(__x, __w, (xi, wi) -> CAST(xi AS DOUBLE) * wi), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    ) + F.lit(float(bias))
    return (
        vectors.select(F.col(id_col).alias("vec_id"), F.col(vec).alias("__x"))
        .withColumn("__w", w_lit)
        .withColumn("prob", F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)))
        .select(
            "vec_id", "prob", (F.col("prob") >= F.lit(0.5)).alias("pred")
        )
    )
