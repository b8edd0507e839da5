"""EXTENDED-registry queries for llm/classify.py: nearest-centroid
classification and k-NN majority-vote labeling over the embeddings
table. Beyond the driver gate's 50-entry cap, so the exact oracle
checks run in pytest (tests/test_oracle_queries.py) at sf0.001.

Beyond-reference operators (the reference has no ML surface); they
follow the CCNet/fastText quality-filter pattern re-expressed as
DataFrame plans — see llm/classify.py for the scale shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..llm import classify, similarity
from . import register_extended
from .llm import O_DOT, O_NORM2, _embs, _hyperplane_bucket_sql

# Per-label centroid as list<double>: integer-scaled component sums
# (floor(x*1e6) BIGINT) so mean components are bit-identical to Spark.
_CENT_CTES = """
comp AS (
  SELECT label,
         unnest(range(0, len(embedding))) AS idx,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS cs
  FROM embeddings
),
per AS (
  SELECT label, idx, SUM(cs) AS s, COUNT(*) AS n
  FROM comp GROUP BY label, idx
),
cent AS (
  SELECT label AS cand_label,
         list(CAST(s AS DOUBLE) / n / 1e6 ORDER BY idx) AS centroid
  FROM per GROUP BY label
)
"""

CENTROID_ORACLE = (
    "WITH "
    + _CENT_CTES
    + f""",
scored AS (
  SELECT e.vec_id, e.label, c.cand_label,
         {O_DOT.format(a="e.embedding", b="c.centroid")} AS dot_s,
         {O_NORM2.format(e="e.embedding")} AS vn2,
         {O_NORM2.format(e="c.centroid")} AS cn2
  FROM embeddings e CROSS JOIN cent c
),
cosed AS (
  SELECT vec_id, label, cand_label,
         (dot_s / 1e12) / (sqrt(vn2 / 1e12) * sqrt(cn2 / 1e12)) AS cosine
  FROM scored
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id ORDER BY cosine DESC, cand_label ASC) AS rn
  FROM cosed
)
SELECT vec_id, label, cand_label AS pred_label, cosine
FROM ranked WHERE rn = 1
"""
)


@register_extended("centroid_classify", CENTROID_ORACLE)
def q_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _embs(spark, sf_dir, parallel=True)
    cents = classify.class_centroids(e)
    return classify.nearest_centroid(e, cents)


_KNN_K = 5

KNN_ORACLE = f"""
WITH v AS (
  SELECT vec_id, label, embedding,
         {O_NORM2.format(e="embedding")} AS n2
  FROM embeddings
),
p AS (
  SELECT a.vec_id AS vec_id, a.label AS label,
         b.vec_id AS nb_id, b.label AS nb_label,
         ({O_DOT.format(a="a.embedding", b="b.embedding")} / 1e12)
           / (sqrt(a.n2 / 1e12) * sqrt(b.n2 / 1e12)) AS cosine
  FROM v a JOIN v b ON a.vec_id <> b.vec_id
),
topk AS (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id ORDER BY cosine DESC, nb_id ASC) AS rn
  FROM p
),
votes AS (
  SELECT vec_id, label, nb_label, COUNT(*) AS votes
  FROM topk WHERE rn <= {_KNN_K}
  GROUP BY vec_id, label, nb_label
),
win AS (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id ORDER BY votes DESC, nb_label ASC) AS rv
  FROM votes
)
SELECT vec_id, label, nb_label AS pred_label, votes,
       (nb_label = label) AS agree
FROM win WHERE rv = 1
"""


@register_extended("knn_label_vote", KNN_ORACLE)
def q_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _embs(spark, sf_dir, parallel=True)
    return classify.knn_vote(e, k=_KNN_K).select(
        "vec_id", "label", "pred_label", F.col("votes").cast("long").alias("votes"), "agree"
    )


# ---------------------------------------------------------------------------
# Blocked k-NN vote — the REGISTERED default (VERDICT r4 #1): the pair
# join is bounded per hyperplane bucket instead of all-pairs, exactly
# the recipe that made embedding_ann_scalable exact — the bucketing is
# deterministic, so the oracle restricts its pair CTE to in-bucket
# pairs and the whole pipeline hash-compares. Recall vs the brute
# baseline stays a pytest claim (tests/test_classify.py); the brute
# form above remains the small-scale baseline.
# ---------------------------------------------------------------------------

# Shared blocked-pair CTEs (v -> multi-probe qp -> scored pairs p):
# the pair stage of BOTH the blocked vote and hard-negative oracles —
# mirrors classify._scored_pairs exactly.
_BLOCKED_PAIR_CTES = f"""v AS (
  SELECT vec_id, label, embedding,
         {_hyperplane_bucket_sql()} AS bucket,
         {O_NORM2.format(e="embedding")} AS n2
  FROM embeddings
),
qp AS (
  SELECT vec_id, label, embedding, n2,
         unnest([bucket, xor(bucket, 1), xor(bucket, 2),
                 xor(bucket, 4), xor(bucket, 8)]) AS bucket
  FROM v
),
p AS (
  SELECT a.vec_id AS vec_id, a.label AS label,
         b.vec_id AS nb_id, b.label AS nb_label,
         ({O_DOT.format(a="a.embedding", b="b.embedding")} / 1e12)
           / (sqrt(a.n2 / 1e12) * sqrt(b.n2 / 1e12)) AS cosine
  FROM qp a JOIN v b ON b.bucket = a.bucket AND a.vec_id <> b.vec_id
)"""

KNN_BLOCKED_ORACLE = f"""
WITH {_BLOCKED_PAIR_CTES},
topk AS (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id ORDER BY cosine DESC, nb_id ASC) AS rn
  FROM p
),
votes AS (
  SELECT vec_id, label, nb_label, COUNT(*) AS votes
  FROM topk WHERE rn <= {_KNN_K}
  GROUP BY vec_id, label, nb_label
),
win AS (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id ORDER BY votes DESC, nb_label ASC) AS rv
  FROM votes
)
SELECT vec_id, label, nb_label AS pred_label, votes,
       (nb_label = label) AS agree
FROM win WHERE rv = 1
"""


@register_extended("knn_label_vote_blocked", KNN_BLOCKED_ORACLE)
def q_knn_label_vote_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bits ADAPT to the corpus (sf1 spot-check r6: fixed 16 buckets
    made the pair join quadratic — 42x time at 10x data): a planning-
    time count picks bits = log2(n / BUCKET_TARGET), keeping per-vector
    candidate work ~constant at any corpus size. At every oracle scale
    (n <= 2000) adaptive_hyperplane_bits returns N_HYPERPLANES, so the
    static 4-bit oracle above stays exact — asserted in
    tests/test_classify.py::test_adaptive_bits_match_oracle_scales."""
    e = _embs(spark, sf_dir, parallel=True)
    # planning count from parquet footer metadata (catalog.table_rows)
    # — no Spark job for one integer
    bits = similarity.adaptive_hyperplane_bits(
        catalog.table_rows(spark, sf_dir, "embeddings")
    )
    e = e.withColumn("bucket", similarity.hyperplane_bucket(bits=bits))
    return classify.knn_vote(
        e, k=_KNN_K, group_col="bucket", probe_bits=bits
    ).select(
        "vec_id", "label", "pred_label",
        F.col("votes").cast("long").alias("votes"), "agree",
    )


# ---------------------------------------------------------------------------
# Classifier evaluation: confusion matrix of the blocked k-NN vote
# against the true labels — the model-eval step of a labeling pipeline,
# expressed as one aggregation over the prediction frame (the oracle
# reuses the full blocked-vote oracle as a CTE, so the evaluated
# predictions are exactly the gate-checked ones).
# ---------------------------------------------------------------------------

CONFUSION_ORACLE = f"""
WITH base AS ({KNN_BLOCKED_ORACLE})
SELECT label, pred_label, CAST(COUNT(*) AS BIGINT) AS n
FROM base
GROUP BY label, pred_label
"""


@register_extended("classifier_confusion", CONFUSION_ORACLE)
def q_classifier_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    preds = q_knn_label_vote_blocked(spark, sf_dir)
    return preds.groupBy("label", "pred_label").agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive-training data prep): per anchor,
# the top-K most-similar DIFFERENT-label vectors, over the same
# blocked multi-probe pair stage as the registered k-NN vote — the
# oracle reuses the shared pair CTEs verbatim, filtered to label
# mismatches before the rank window.
# ---------------------------------------------------------------------------

_HARDNEG_K = 3

HARDNEG_ORACLE = f"""
WITH {_BLOCKED_PAIR_CTES},
negs AS (
  SELECT * FROM p WHERE nb_label <> label
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id ORDER BY cosine DESC, nb_id ASC) AS rank
  FROM negs
)
SELECT vec_id, label, nb_id AS neg_id, nb_label AS neg_label, cosine,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {_HARDNEG_K}
"""


@register_extended("hard_negative_mining", HARDNEG_ORACLE)
def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked hard negatives — same adaptive-bits discipline as the
    blocked vote (static 4-bit oracle exact at every oracle scale)."""
    e = _embs(spark, sf_dir, parallel=True)
    bits = similarity.adaptive_hyperplane_bits(
        catalog.table_rows(spark, sf_dir, "embeddings")
    )
    e = e.withColumn("bucket", similarity.hyperplane_bucket(bits=bits))
    return classify.hard_negatives(
        e, k=_HARDNEG_K, group_col="bucket", probe_bits=bits
    )
