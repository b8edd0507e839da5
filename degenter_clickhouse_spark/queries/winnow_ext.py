"""Winnowing fingerprint overlap (extended registry): llm/winnow.py
vs an independent DuckDB implementation of the same contract —
k-gram polynomial hashes (the shared combiner constants), min of each
sliding window of w, stop-fingerprint cap, integer-exact
floor(shared * 1e9 / min(|A|, |B|)) containment score.

The synthetic corpus carries planted near-dup families (TESTDATA.md),
so the pair output is non-trivial: near-dups share long runs of
identical k-grams and surface with high overlap scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..llm.text import shingle_combine_sql
from ..llm.winnow import DEFAULT_K, DEFAULT_W, SCALE, winnow_overlap_pairs
from . import register_extended
from .llm import O_WORD_HASHES, _docs

_MIN_SHARED = 2
_MAX_FP_FREQ = 64

WINNOW_ORACLE = f"""
WITH hw AS (
  SELECT doc_id, {O_WORD_HASHES} AS hw FROM documents
),
ks AS (
  SELECT doc_id,
         CASE WHEN len(hw) >= {DEFAULT_K} THEN
           list_transform(generate_series(1, len(hw) - {DEFAULT_K - 1}),
                          i -> {shingle_combine_sql("hw", DEFAULT_K)})
         ELSE CAST([] AS BIGINT[]) END AS ks
  FROM hw
),
fp AS (
  SELECT DISTINCT doc_id, unnest(
    CASE WHEN len(ks) >= {DEFAULT_W} THEN
      list_transform(generate_series(1, len(ks) - {DEFAULT_W - 1}),
                     i -> list_min(ks[i:i + {DEFAULT_W - 1}]))
    ELSE ks END
  ) AS fp
  FROM ks
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp FROM fp GROUP BY doc_id),
rare AS (SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) <= {_MAX_FP_FREQ}),
keep AS (SELECT f.doc_id, f.fp FROM fp f WHERE f.fp IN (SELECT fp FROM rare)),
pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(COUNT(*) AS BIGINT) AS shared
  FROM keep a JOIN keep b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_MIN_SHARED}
)
SELECT CAST(p.d1 AS BIGINT) AS d1, CAST(p.d2 AS BIGINT) AS d2, p.shared,
       CAST(least(s1.n_fp, s2.n_fp) AS BIGINT) AS min_fps,
       CAST((p.shared * {SCALE}) // least(s1.n_fp, s2.n_fp) AS BIGINT)
         AS overlap_1e9
FROM pairs p
JOIN sizes s1 ON s1.doc_id = p.d1
JOIN sizes s2 ON s2.doc_id = p.d2
"""


@register_extended("winnow_overlap", WINNOW_ORACLE)
def q_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    d = _docs(spark, sf_dir, parallel=True).select("doc_id", "text")
    return winnow_overlap_pairs(
        d, min_shared=_MIN_SHARED, max_fp_freq=_MAX_FP_FREQ
    ).select(
        F.col("d1").cast("long").alias("d1"),
        F.col("d2").cast("long").alias("d2"),
        "shared",
        "min_fps",
        "overlap_1e9",
    )


# ---------------------------------------------------------------------------
# Persisted-index probe (VERDICT r8 #8 follow-through): even doc_ids
# form the stored corpus, odd doc_ids the incoming shard. The probe's
# frequency cap counts document frequency over (pruned index + shard)
# rows — identical to the full-frame count for every fingerprint the
# shard holds, because a fingerprint's index rows all live in its own
# __fpb bucket. The oracle is therefore the full-frame pair SQL
# restricted to pairs touching a shard doc.
# ---------------------------------------------------------------------------

_WIDX_CACHE: dict[str, str] = {}


def _winnow_index_root(spark: SparkSession, sf_dir: str) -> str:
    import os
    import tempfile

    from pyspark.sql import functions as F

    from ..llm.winnow import build_winnow_index

    root = _WIDX_CACHE.get(sf_dir)
    if root and os.path.isdir(os.path.join(root, "fps")):
        return root
    root = tempfile.mkdtemp(prefix="winnow_idx_")
    corpus = (
        _docs(spark, sf_dir, parallel=True)
        .filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", "text")
    )
    build_winnow_index(corpus, root)
    _WIDX_CACHE[sf_dir] = root
    return root


WINNOW_PROBE_ORACLE = f"""
WITH base AS ({WINNOW_ORACLE})
SELECT * FROM base WHERE d1 % 2 = 1 OR d2 % 2 = 1
"""


@register_extended("winnow_index_probe", WINNOW_PROBE_ORACLE)
def q_winnow_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..llm.winnow import winnow_index_probe

    root = _winnow_index_root(spark, sf_dir)
    shard = (
        _docs(spark, sf_dir, parallel=True)
        .filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", "text")
    )
    return winnow_index_probe(
        spark, root, shard, min_shared=_MIN_SHARED, max_fp_freq=_MAX_FP_FREQ
    ).select(
        F.col("d1").cast("long").alias("d1"),
        F.col("d2").cast("long").alias("d2"),
        "shared",
        "min_fps",
        "overlap_1e9",
    )
