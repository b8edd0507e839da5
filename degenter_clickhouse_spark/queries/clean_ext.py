"""EXTENDED-registry queries: substring-level corpus cleaning + BM25
(llm/clean.py). These sit beyond the driver gate's 50-entry cap, so
their oracle checks run in pytest (tests/test_oracle_queries.py) — the
same exact rows/schema/hash compare the driver performs, at sf0.001.

Beyond-reference operators: the reference engine has no corpus
tooling; these follow the exact-substring dedup of Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better") and
classic BM25, re-expressed as DataFrame plans (see llm/clean.py
docstring for the scale shapes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from . import register_extended
from .llm import _docs, _minhash_ctes

SPAN_N = 5

_SPANS_CORE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id, t.i - 1 AS pos,
         array_to_string(ws[t.i : t.i + {SPAN_N - 1}], ' ') AS gram
  FROM w, unnest(generate_series(1, greatest(len(ws) - {SPAN_N - 1}, 0))) AS t(i)
),
dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
f AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM dup)),
brk AS (
  SELECT doc_id, pos,
    CASE WHEN pos > coalesce(max(pos + {SPAN_N}) OVER (
      PARTITION BY doc_id ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
    THEN 1 ELSE 0 END AS is_new
  FROM f
),
isl AS (
  SELECT doc_id, pos,
         sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM brk
),
spans AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(min(pos) AS BIGINT) AS span_start,
         CAST(max(pos) + {SPAN_N} AS BIGINT) AS span_end,
         CAST(max(pos) + {SPAN_N} - min(pos) AS BIGINT) AS span_tokens
  FROM isl GROUP BY doc_id, island
)
"""

SPANS_ORACLE = _SPANS_CORE + "SELECT * FROM spans"

CLEAN_ORACLE = _SPANS_CORE + f""",
tok AS (
  SELECT w.doc_id, t.i - 1 AS pos, ws[t.i] AS tk
  FROM w, unnest(generate_series(1, len(ws))) AS t(i)
),
kept AS (
  SELECT tok.doc_id, tok.pos, tok.tk FROM tok
  WHERE NOT EXISTS (
    SELECT 1 FROM spans
    WHERE spans.doc_id = tok.doc_id
      AND tok.pos >= spans.span_start AND tok.pos < spans.span_end)
)
SELECT CAST(w.doc_id AS BIGINT) AS doc_id,
       coalesce(k.cleaned, '') AS cleaned_text,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS kept_tokens,
       CAST(len(w.ws) - coalesce(k.n_kept, 0) AS BIGINT) AS removed_tokens
FROM w LEFT JOIN (
  SELECT doc_id, string_agg(tk, ' ' ORDER BY pos) AS cleaned,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
) k USING (doc_id)
"""

BM25_TERMS = ["spark", "window", "merge"]
BM25_K = 25
_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)

BM25_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
base AS (SELECT doc_id, len(ws) AS dl, ws FROM w),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(CAST(dl AS DECIMAL(38,0))) AS DOUBLE) / count(*) AS avgdl
  FROM base
),
tok AS (
  SELECT doc_id, dl, t.tk AS term
  FROM base, unnest(ws) AS t(tk)
  WHERE t.tk IN ({_TERMS_SQL})
),
tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM tok GROUP BY 1, 2, 3),
dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         CAST(round(
           ln(1.0 + (stats.n_docs - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf * {1.2 + 1.0}
           / (tf.tf + {1.2} * (1.0 - {0.75} + {0.75} * tf.dl / stats.avgdl)),
           9) AS DECIMAL(38,12)) AS s
  FROM tf JOIN dfx USING (term) CROSS JOIN stats
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       round(CAST(sum(s) AS DOUBLE), 6) AS score,
       CAST(count(*) AS BIGINT) AS n_terms
FROM scored GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT {BM25_K}
"""


def _leakage_split_oracle() -> str:
    return f"""
WITH RECURSIVE {_minhash_ctes()},
edges AS (SELECT d1 AS a, d2 AS b FROM nd_pairs
          UNION SELECT d2, d1 FROM nd_pairs),
comp(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT c.a, e.b FROM comp c JOIN edges e ON e.a = c.b
),
canon AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS canonical_id FROM comp GROUP BY a),
g AS (
  SELECT d.doc_id, COALESCE(c.canonical_id, d.doc_id) AS group_id
  FROM documents d LEFT JOIN canon c ON c.doc_id = d.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(group_id AS BIGINT) AS group_id,
       CASE WHEN u < 0.9 THEN 'train'
            WHEN u < 0.95 THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT *, CAST((group_id * 2654435761) % 4294967296 AS DOUBLE)
            / 4294967296.0 AS u
  FROM g
)
"""


@register_extended("leakage_free_split", _leakage_split_oracle())
def q_leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware train/val/test assignment: near-duplicate docs
    (MinHash-LSH pairs, jaccard >= 0.5) always share a split."""
    from ..llm import dedup as D

    d = _docs(spark, sf_dir, parallel=True)
    pairs = D.minhash_lsh_pairs(d, threshold=0.5)
    out = D.leakage_free_split(d, pairs)
    return out.select(
        F.col("doc_id").cast("long"), F.col("group_id").cast("long"), "split"
    )


def _kfold_oracle(k: int = 5) -> str:
    return f"""
WITH RECURSIVE {_minhash_ctes()},
edges AS (SELECT d1 AS a, d2 AS b FROM nd_pairs
          UNION SELECT d2, d1 FROM nd_pairs),
comp(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT c.a, e.b FROM comp c JOIN edges e ON e.a = c.b
),
canon AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS canonical_id FROM comp GROUP BY a),
g AS (
  SELECT d.doc_id, COALESCE(c.canonical_id, d.doc_id) AS group_id
  FROM documents d LEFT JOIN canon c ON c.doc_id = d.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(group_id AS BIGINT) AS group_id,
       CAST(((group_id * 2654435761) % 4294967296) % {k} AS INTEGER) AS fold
FROM g
"""


@register_extended("kfold_split", _kfold_oracle())
def q_kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free 5-fold cross-validation assignment: near-dup
    clusters (MinHash-LSH, jaccard >= 0.5) always share a fold."""
    from ..llm import dedup as D

    d = _docs(spark, sf_dir, parallel=True)
    pairs = D.minhash_lsh_pairs(d, threshold=0.5)
    out = D.kfold_split(d, pairs, k=5)
    return out.select(
        F.col("doc_id").cast("long"), F.col("group_id").cast("long"), "fold"
    )


BIGRAM_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
rp AS (
  SELECT ws[t.i] AS w1, ws[t.i + 1] AS w2
  FROM w, unnest(generate_series(1, greatest(len(ws) - 1, 0))) AS t(i)
),
c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM rp GROUP BY 1, 2),
ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
vv AS (
  SELECT CAST(count(DISTINCT t.tk) AS BIGINT) AS v
  FROM w, unnest(ws) AS t(tk)
),
model AS (
  SELECT w1, w2, (c12 + 1) * 1000000000 // (c1 + v) AS sc
  FROM c12 JOIN ctx USING (w1) CROSS JOIN vv
),
dp AS (
  SELECT doc_id, ws[t.i] AS w1, ws[t.i + 1] AS w2
  FROM w, unnest(generate_series(1, greatest(len(ws) - 1, 0))) AS t(i)
),
j AS (
  SELECT dp.doc_id,
         coalesce(m.sc,
           CASE WHEN c.c1 IS NOT NULL THEN 1000000000 // (c.c1 + vv.v)
                ELSE 1000000000 // (2 * vv.v) END) AS sc_eff,
         CASE WHEN m.sc IS NULL THEN 1 ELSE 0 END AS up,
         CASE WHEN c.c1 IS NULL THEN 1 ELSE 0 END AS uc
  FROM dp
  LEFT JOIN model m ON m.w1 = dp.w1 AND m.w2 = dp.w2
  LEFT JOIN ctx c ON c.w1 = dp.w1
  CROSS JOIN vv
),
agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(up) AS BIGINT) AS n_unseen_pairs,
         CAST(sum(uc) AS BIGINT) AS n_unseen_contexts,
         CAST(sum(sc_eff) AS BIGINT) AS fluency_sum_scaled
  FROM j GROUP BY doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(coalesce(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(a.n_unseen_pairs, 0) AS BIGINT) AS n_unseen_pairs,
       CAST(coalesce(a.n_unseen_contexts, 0) AS BIGINT) AS n_unseen_contexts,
       CAST(coalesce(a.fluency_sum_scaled, 0) AS BIGINT) AS fluency_sum_scaled,
       CASE WHEN coalesce(a.n_bigrams, 0) > 0 THEN
         CAST(a.fluency_sum_scaled AS DOUBLE) / a.n_bigrams / 1000000000.0
       END AS fluency_score
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
"""


@register_extended("bigram_fluency", BIGRAM_ORACLE)
def q_bigram_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-smoothed bigram-LM fluency per doc (self-referenced
    model) — the exact-integer twin of a CCNet perplexity filter, one
    order above the unigram rarity stage."""
    from ..llm.lm import bigram_fluency

    # measured at sf0.1: the repartition costs more than the extra
    # parallelism buys now that the model join broadcasts (1.2s plain
    # vs 2.1s parallel warm) — the heavy lifting is the fit's own
    # (w1, w2) aggregation, which parallelizes via its shuffle anyway
    d = _docs(spark, sf_dir, parallel=False)
    out = bigram_fluency(d)
    return out.select(
        F.col("doc_id").cast("long"),
        "n_bigrams",
        "n_unseen_pairs",
        "n_unseen_contexts",
        "fluency_sum_scaled",
        "fluency_score",
    )


TEMP_ALPHA = 0.5
TEMP_FRAC = 0.5

TEMP_SAMPLE_ORACLE = f"""
WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
z AS (
  SELECT CAST(sum(CAST(pow(n, {TEMP_ALPHA}) AS DECIMAL(38,12))) AS DOUBLE) AS z,
         CAST(sum(n) AS BIGINT) AS total
  FROM c
),
r AS (
  SELECT source,
         least(1.0, round(pow(n, {TEMP_ALPHA}) / z.z
                          * ({TEMP_FRAC} * z.total) / n, 9)) AS keep_rate
  FROM c, z
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.source, r.keep_rate
FROM documents d JOIN r USING (source)
WHERE CAST((d.doc_id * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0
      < r.keep_rate
"""


@register_extended("temperature_sampling", TEMP_SAMPLE_ORACLE)
def q_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.5) mixture downsampling to ~50% of
    the corpus — per-source keep rates proportional to sqrt(share)."""
    from ..llm.packing import temperature_sample

    d = _docs(spark, sf_dir)
    out = temperature_sample(d, alpha=TEMP_ALPHA, target_frac=TEMP_FRAC)
    return out.select(F.col("doc_id").cast("long"), "source", "keep_rate")


@register_extended("dup_ngram_spans", SPANS_ORACLE)
def q_dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup, detection half: maximal >= 5-token spans
    whose every 5-gram occurs >= 2 times corpus-wide."""
    from ..llm import clean as C

    d = _docs(spark, sf_dir, parallel=True)
    s = C.duplicate_ngram_spans(d, n=SPAN_N, min_count=2)
    return s.select(
        F.col("doc_id").cast("long"),
        F.col("span_start").cast("long"),
        F.col("span_end").cast("long"),
        F.col("span_tokens").cast("long"),
    )


@register_extended("span_dedup_clean", CLEAN_ORACLE)
def q_span_dedup_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup, removal half: corpus text rebuilt with
    every duplicated span deleted."""
    from ..llm import clean as C

    d = _docs(spark, sf_dir, parallel=True)
    spans = C.duplicate_ngram_spans(d, n=SPAN_N, min_count=2)
    out = C.remove_duplicate_spans(d, spans)
    return out.select(
        F.col("doc_id").cast("long"),
        "cleaned_text",
        "kept_tokens",
        "removed_tokens",
    )


@register_extended("bm25_search", BM25_ORACLE)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval for a fixed bag-of-words query."""
    from ..llm import clean as C

    d = _docs(spark, sf_dir, parallel=True)
    out = C.bm25_topk(d, BM25_TERMS, k=BM25_K)
    return out.select(
        F.col("doc_id").cast("long"), "score", F.col("n_terms").cast("long")
    )


# ---------------------------------------------------------------------------
# C4-style global line dedup. The synthetic docs have no newlines, so
# the query deterministically line-ifies each doc first (fixed 12-token
# lines) — same convention as the dedup queries' synthesized
# duplicates; the operator itself is separator-generic.
# ---------------------------------------------------------------------------

LINE_W = 12

LINE_DEDUP_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
l AS (
  SELECT doc_id, t.i - 1 AS pos,
         array_to_string(ws[(t.i - 1) * {LINE_W} + 1 : t.i * {LINE_W}], ' ') AS line
  FROM w, unnest(generate_series(1,
         greatest(CAST(ceil(len(ws) / {LINE_W}.0) AS BIGINT), 1))) AS t(i)
),
win AS (
  SELECT doc_id, pos, line,
         row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
  FROM l
),
reb AS (
  SELECT doc_id,
         string_agg(line, chr(10) ORDER BY pos) AS cleaned_text,
         count(*) AS kept_lines
  FROM win WHERE rn = 1 GROUP BY doc_id
),
tot AS (SELECT doc_id, count(*) AS n_lines FROM l GROUP BY doc_id)
SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
       coalesce(r.cleaned_text, '') AS cleaned_text,
       CAST(coalesce(r.kept_lines, 0) AS BIGINT) AS kept_lines,
       CAST(t.n_lines - coalesce(r.kept_lines, 0) AS BIGINT) AS removed_lines
FROM tot t LEFT JOIN reb r USING (doc_id)
"""


def _lineified(d: DataFrame) -> DataFrame:
    ws = F.split(F.col("text"), " ")
    n_lines = F.greatest(
        F.ceil(F.size(ws) / F.lit(float(LINE_W))).cast("int"), F.lit(1)
    )
    lines = F.transform(
        F.sequence(F.lit(1), n_lines),
        lambda i: F.array_join(
            F.slice(ws, (i - F.lit(1)) * F.lit(LINE_W) + F.lit(1), F.lit(LINE_W)),
            " ",
        ),
    )
    return d.select("doc_id", F.array_join(lines, "\n").alias("text"))


@register_extended("line_dedup", LINE_DEDUP_ORACLE)
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global line dedup over line-ified docs: each exact-duplicate
    line survives only at its first (doc_id, pos) occurrence."""
    from ..llm import clean as C

    d = _docs(spark, sf_dir, parallel=True)
    out = C.line_dedup(_lineified(d), sep="\n")
    return out.select(
        F.col("doc_id").cast("long"), "cleaned_text", "kept_lines", "removed_lines"
    )


# ---------------------------------------------------------------------------
# PMI-style collocation mining (phrase discovery): pointwise lift over
# bigram vs unigram frequencies, exact integer counts, one rounded
# pointwise double per surviving pair
# ---------------------------------------------------------------------------

COLLOC_MIN = 5
COLLOC_K = 50

COLLOC_ORACLE = f"""
WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
pr AS (
  SELECT ws[t.i] AS w1, ws[t.i + 1] AS w2
  FROM w, unnest(generate_series(1, greatest(len(ws) - 1, 0))) AS t(i)
),
c12 AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
  FROM pr GROUP BY 1, 2 HAVING count(*) >= {COLLOC_MIN}
),
n2 AS (SELECT CAST(count(*) AS BIGINT) AS n2 FROM pr),
uni AS (
  SELECT t.tk AS t, CAST(count(*) AS BIGINT) AS c
  FROM w, unnest(ws) AS t(tk) GROUP BY 1
),
n1 AS (SELECT CAST(sum(c) AS BIGINT) AS n1 FROM uni)
SELECT c12.w1, c12.w2, c12.c12,
       round((CAST(c12 AS DOUBLE) * CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE))
             / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE) * CAST(n2 AS DOUBLE)),
             6) AS lift
FROM c12
JOIN uni u1 ON u1.t = c12.w1
JOIN uni u2 ON u2.t = c12.w2
CROSS JOIN n1 CROSS JOIN n2
ORDER BY lift DESC, c12.w1 ASC, c12.w2 ASC
LIMIT {COLLOC_K}
"""


@register_extended("collocations", COLLOC_ORACLE)
def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.lm import collocations

    d = _docs(spark, sf_dir)
    return collocations(d, min_count=COLLOC_MIN, k=COLLOC_K)


TRIGRAM_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
rt AS (
  SELECT ws[t.i] AS w1, ws[t.i + 1] AS w2, ws[t.i + 2] AS w3
  FROM w, unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS t(i)
),
c3 AS (SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS c123 FROM rt GROUP BY 1, 2, 3),
c12 AS (SELECT w1, w2, CAST(sum(c123) AS BIGINT) AS c12 FROM c3 GROUP BY 1, 2),
tri AS (
  SELECT w1, w2, w3, c123 * 1000000000 // c12 AS sc3
  FROM c3 JOIN c12 USING (w1, w2)
),
rb AS (
  SELECT ws[t.i] AS w2, ws[t.i + 1] AS w3
  FROM w, unnest(generate_series(1, greatest(len(ws) - 1, 0))) AS t(i)
),
c23 AS (SELECT w2, w3, CAST(count(*) AS BIGINT) AS c23 FROM rb GROUP BY 1, 2),
c2 AS (SELECT w2, CAST(sum(c23) AS BIGINT) AS c2 FROM c23 GROUP BY 1),
bi AS (
  SELECT w2, w3, 2 * c23 * 1000000000 // (5 * c2) AS sc2
  FROM c23 JOIN c2 USING (w2)
),
cu AS (
  SELECT t.tk AS w3, CAST(count(*) AS BIGINT) AS cu
  FROM w, unnest(ws) AS t(tk) GROUP BY 1
),
nn AS (SELECT CAST(sum(cu) AS BIGINT) AS n FROM cu),
uni AS (SELECT w3, 4 * cu * 1000000000 // (25 * n) AS sc1 FROM cu CROSS JOIN nn),
dt AS (
  SELECT doc_id,
         CASE WHEN len(ws) >= 3 THEN ws[t.i] END AS w1,
         CASE WHEN len(ws) >= 3 THEN ws[t.i + 1] END AS w2,
         CASE WHEN len(ws) >= 3 THEN ws[t.i + 2] END AS w3
  FROM w, unnest(CASE WHEN len(ws) >= 3
                      THEN generate_series(1, len(ws) - 2)
                      ELSE [0] END) AS t(i)
),
j AS (
  SELECT dt.doc_id,
         dt.w1 IS NOT NULL AS real,
         tri.sc3, bi.sc2, uni.sc1,
         coalesce(tri.sc3, bi.sc2, uni.sc1, 0) AS sc_eff
  FROM dt
  LEFT JOIN tri ON tri.w1 = dt.w1 AND tri.w2 = dt.w2 AND tri.w3 = dt.w3
  LEFT JOIN bi ON bi.w2 = dt.w2 AND bi.w3 = dt.w3
  LEFT JOIN uni ON uni.w3 = dt.w3
)
SELECT doc_id,
       CAST(sum(CASE WHEN real THEN 1 ELSE 0 END) AS BIGINT) AS n_trigrams,
       CAST(sum(CASE WHEN real AND sc3 IS NULL AND sc2 IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_backoff_bi,
       CAST(sum(CASE WHEN real AND sc3 IS NULL AND sc2 IS NULL
                     AND sc1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_backoff_uni,
       CAST(sum(CASE WHEN real AND sc3 IS NULL AND sc2 IS NULL AND sc1 IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(sum(CASE WHEN real THEN sc_eff ELSE 0 END) AS BIGINT)
         AS fluency_sum_scaled,
       CASE WHEN sum(CASE WHEN real THEN 1 ELSE 0 END) > 0
            THEN CAST(sum(CASE WHEN real THEN sc_eff ELSE 0 END) AS DOUBLE)
                 / sum(CASE WHEN real THEN 1 ELSE 0 END) / 1000000000
       END AS fluency_score
FROM j GROUP BY doc_id
"""


@register_extended("trigram_fluency", TRIGRAM_ORACLE)
def q_trigram_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-3 stupid-backoff LM fluency (self-referenced model): the
    exact-integer, transcendental-free twin of a trigram perplexity
    filter — trigram hit, else 0.4x the bigram score, else 0.16x the
    unigram relative frequency."""
    from ..llm.lm import trigram_fluency

    return trigram_fluency(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_trigrams",
        "n_backoff_bi",
        "n_backoff_uni",
        "n_oov",
        "fluency_sum_scaled",
        "fluency_score",
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical ranking
# and a dense-ANN cosine ranking (llm/fusion.py). Registered in the
# DRIVER gate (round-5 slot 50): both sub-rankings and the integer RRF
# sum are deterministic, so the fused list has an exact SQL oracle.
# The post-TakeOrdered rank windows run over k<=25 rows by construction
# (bounded, not corpus-sized).
#
# The REGISTERED default (VERDICT r5 #1) retrieves through the
# engine's PERSISTED indexes — the lexical leg probes the 64-way
# term-bucket inverted index (llm/clean.py build_text_index /
# text_index_search: planning-time file pruning to the query terms'
# buckets, bit-identical scores to the direct scan) and the dense leg
# probes the cell-partitioned IVF index (llm/similarity.py
# build_ivf_index / ivf_search with SEED centroids, iters=0, so the
# probe is exactly oracle-able — the embedding_ann_scalable recipe).
# At 100 TB a per-query retrieval must touch probed buckets/cells, not
# rescan the corpus; indexes build once per sf_dir and are memoized,
# matching the build-once/probe-many workflow the index family exists
# for. The full-corpus-scan form stays available as
# hybrid_retrieval_direct (extended registry) — the small-scale
# baseline, deliberately not benched.
# ---------------------------------------------------------------------------

import os  # noqa: E402
import tempfile  # noqa: E402

from . import register  # noqa: E402  (extended module, one gate entry)
from .llm import _O_L2, O_DOT, O_NORM2  # noqa: E402

RRF_K = 60
RRF_TOPK = 20
_ANN_Q = 0  # dense query: embedding of vec_id 0
_ANN_K = 25
_IVF_CELLS = 8
_IVF_NPROBE = 3


def _rrf_tail(bmr_sql: str, annr_sql: str) -> str:
    """Shared fusion tail: integer RRF over the two rank CTE bodies."""
    return f"""
u AS (
  SELECT doc_id, CAST(1000000000 AS BIGINT) // ({RRF_K} + rank) AS c
  FROM ({bmr_sql})
  UNION ALL
  SELECT doc_id, CAST(1000000000 AS BIGINT) // ({RRF_K} + rank) AS c
  FROM ({annr_sql})
),
fused AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(SUM(c) AS BIGINT) AS rrf_scaled,
         CAST(COUNT(*) AS BIGINT) AS n_retrievers
  FROM u GROUP BY doc_id
)
SELECT doc_id, rrf_scaled, n_retrievers,
       CAST(rrf_scaled AS DOUBLE) / 1e9 AS rrf
FROM fused ORDER BY rrf_scaled DESC, doc_id ASC LIMIT {RRF_TOPK}
"""


_BMR_SQL = f"""
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM ({BM25_ORACLE})
"""

# Dense leg of the DIRECT baseline: exact full-corpus cosine top-k.
_ANNR_BRUTE_SQL = f"""
  WITH v AS (
    SELECT vec_id, embedding, {O_NORM2.format(e="embedding")} AS n2
    FROM embeddings
  ),
  qv AS (SELECT * FROM v WHERE vec_id = {_ANN_Q}),
  s AS (
    SELECT c.vec_id AS doc_id,
           ({O_DOT.format(a="qv.embedding", b="c.embedding")} / 1e12)
             / (sqrt(qv.n2 / 1e12) * sqrt(c.n2 / 1e12)) AS cosine
    FROM v c CROSS JOIN qv WHERE c.vec_id <> {_ANN_Q}
  )
  SELECT doc_id, rank FROM (
    SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id ASC) AS rank
    FROM s
  ) WHERE rank <= {_ANN_K}
"""

# Dense leg of the INDEX-BACKED default: exact cosine top-k RESTRICTED
# to the query's nprobe nearest IVF cells under seed centroids (the
# IVF_ANN_ORACLE recipe from queries/llm.py, specialized to one query).
_ANNR_IVF_SQL = f"""
  WITH cents AS (
    SELECT row_number() OVER (ORDER BY vec_id ASC) AS cell,
           embedding AS centroid
    FROM (SELECT vec_id, embedding FROM embeddings
          ORDER BY vec_id ASC LIMIT {_IVF_CELLS})
  ),
  dd AS (
    SELECT v.vec_id, c.cell,
           {_O_L2.format(a="v.embedding", b="c.centroid")} AS dist
    FROM embeddings v CROSS JOIN cents c
  ),
  ca AS (
    SELECT vec_id, cell FROM (
      SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
             ORDER BY dist ASC, cell ASC) AS rk FROM dd
    ) WHERE rk <= 1
  ),
  qa AS (
    SELECT vec_id, cell FROM (
      SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
             ORDER BY dist ASC, cell ASC) AS rk
      FROM dd WHERE vec_id = {_ANN_Q}
    ) WHERE rk <= {_IVF_NPROBE}
  ),
  vn AS (
    SELECT vec_id, embedding, {O_NORM2.format(e="embedding")} AS n2
    FROM embeddings
  ),
  p AS (
    SELECT DISTINCT qa.vec_id AS q_id, ca.vec_id AS c_id
    FROM qa JOIN ca ON ca.cell = qa.cell AND ca.vec_id <> qa.vec_id
  ),
  s AS (
    SELECT p.c_id AS doc_id,
           ({O_DOT.format(a="qv.embedding", b="cv.embedding")} / 1e12)
             / (sqrt(qv.n2 / 1e12) * sqrt(cv.n2 / 1e12)) AS cosine
    FROM p JOIN vn qv ON qv.vec_id = p.q_id JOIN vn cv ON cv.vec_id = p.c_id
  )
  SELECT doc_id, rank FROM (
    SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id ASC) AS rank
    FROM s
  ) WHERE rank <= {_ANN_K}
"""

HYBRID_ORACLE = "WITH " + _rrf_tail(_BMR_SQL, _ANNR_BRUTE_SQL)
HYBRID_IDX_ORACLE = "WITH " + _rrf_tail(_BMR_SQL, _ANNR_IVF_SQL)

# build-once/probe-many memo: one persisted (text, ivf) index pair per
# corpus directory — the driver/bench call each registered query
# repeatedly and must measure the PROBE, with the build amortized, just
# like a production retrieval service
_HYBRID_IDX_CACHE: dict[str, str] = {}


def _hybrid_index_root(spark: SparkSession, sf_dir: str) -> str:
    root = _HYBRID_IDX_CACHE.get(sf_dir)
    if root and os.path.isdir(os.path.join(root, "ivf", "cells")):
        return root
    from ..llm.clean import build_text_index
    from ..llm.similarity import adaptive_ivf_cells, build_ivf_index
    from .llm import _embs

    root = tempfile.mkdtemp(prefix="hybrid_idx_")
    build_text_index(
        _docs(spark, sf_dir, parallel=True), os.path.join(root, "text")
    )
    e = _embs(spark, sf_dir, parallel=True)
    # cells scale ~sqrt(n) (FAISS nlist discipline); at every oracle
    # scale (n <= 500) the adaptive value is exactly _IVF_CELLS, so the
    # static 8-cell oracle SQL stays exact (asserted in tests). The
    # planning count from parquet footer metadata — no Spark job.
    n = catalog.table_rows(spark, sf_dir, "embeddings")
    build_ivf_index(
        e,
        os.path.join(root, "ivf"),
        k_cells=adaptive_ivf_cells(n, lo=_IVF_CELLS),
        iters=0,  # seed centroids: deterministic, exactly oracle-able
    )
    _HYBRID_IDX_CACHE[sf_dir] = root
    return root


def _fuse_legs(bmr: DataFrame, annr: DataFrame) -> DataFrame:
    from ..llm.fusion import rrf_fuse

    return rrf_fuse([bmr, annr], k_const=RRF_K, topk=RRF_TOPK).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "rrf_scaled",
        "n_retrievers",
        "rrf",
    )


@register_extended("hybrid_retrieval", HYBRID_IDX_ORACLE)
def q_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-backed hybrid retrieval (the benched default; its gate
    slot is now the retrieval_suite composite in queries/suites2.py,
    which carries this plus the whole r6 batch-retrieval family +
    retrieval_eval behind the driver gate):
    BM25 via the persisted term-bucket inverted index + dense ANN via
    the persisted cell-partitioned IVF index, fused with integer RRF.
    Both legs read only probed buckets/cells — never the corpus."""
    from pyspark.sql.window import Window

    from ..llm.clean import text_index_search
    from ..llm.similarity import ivf_search
    from .llm import _embs

    root = _hybrid_index_root(spark, sf_dir)
    bm = text_index_search(
        spark, os.path.join(root, "text"), BM25_TERMS, k=BM25_K
    )
    # rank window over the already-TakeOrdered top-25: bounded input
    wb = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    bmr = bm.select("doc_id", F.row_number().over(wb).alias("rank"))
    q = _embs(spark, sf_dir).filter(F.col("vec_id") == _ANN_Q)
    ann = ivf_search(
        spark, os.path.join(root, "ivf"), q, k=_ANN_K, nprobe=_IVF_NPROBE
    )
    annr = ann.select(F.col("c_id").alias("doc_id"), "rank")
    return _fuse_legs(bmr, annr)


@register_extended("hybrid_retrieval_direct", HYBRID_ORACLE)
def q_hybrid_retrieval_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-scan baseline: direct BM25 + brute-force dense top-k.
    Exact but rescans the corpus per query — kept for recall
    comparison and small corpora, excluded from the bench."""
    from pyspark.sql.window import Window

    from ..llm.similarity import brute_topk
    from .llm import _embs

    bm = q_bm25_search(spark, sf_dir)
    wb = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    bmr = bm.select("doc_id", F.row_number().over(wb).alias("rank"))
    e = _embs(spark, sf_dir, parallel=True)
    ann = brute_topk(e.filter(F.col("vec_id") == _ANN_Q), e, k=_ANN_K)
    annr = ann.select(F.col("c_id").alias("doc_id"), "rank")
    return _fuse_legs(bmr, annr)


# ---------------------------------------------------------------------------
# DSIR importance scores (llm/dsir.py): target = the English slice of
# the corpus, raw = the whole corpus. Every stage is deterministic —
# polyhash bigram buckets, exact-integer counts, pointwise rounded
# log-ratios, DECIMAL per-doc sums (the BM25 ln-round-DECIMAL pattern)
# — so the full pipeline hash-compares against DuckDB.
# ---------------------------------------------------------------------------

from .llm import O_WORD_HASHES  # noqa: E402

_DSIR_B = 8192

DSIR_ORACLE = f"""
WITH hw AS (SELECT doc_id, lang, {O_WORD_HASHES} AS hw FROM documents),
feats AS (
  SELECT doc_id, lang,
         unnest(list_transform(generate_series(1, greatest(len(hw) - 1, 0)),
                i -> ((hw[i] * 131 + hw[i + 1]) % 2147483647) % {_DSIR_B}))
           AS f
  FROM hw
),
ct AS (SELECT f, count(*) AS ct FROM feats WHERE lang = 'en' GROUP BY f),
cr AS (SELECT f, count(*) AS cr FROM feats GROUP BY f),
nt AS (SELECT sum(ct) AS nt FROM ct),
nr AS (SELECT sum(cr) AS nr FROM cr),
lam AS (
  SELECT coalesce(ct.f, cr.f) AS f,
         round(ln(CAST(coalesce(ct.ct, 0) + 1 AS DOUBLE)
                  / CAST(nt.nt + {_DSIR_B} AS DOUBLE))
             - ln(CAST(coalesce(cr.cr, 0) + 1 AS DOUBLE)
                  / CAST(nr.nr + {_DSIR_B} AS DOUBLE)), 9) AS lam
  FROM ct FULL OUTER JOIN cr ON ct.f = cr.f
  CROSS JOIN nt CROSS JOIN nr
),
scored AS (
  SELECT feats.doc_id, count(*) AS n_feats,
         CAST(SUM(CAST(lam AS DECIMAL(38,12))) AS DOUBLE) AS dsir_score
  FROM feats JOIN lam USING (f) GROUP BY feats.doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(coalesce(s.n_feats, 0) AS BIGINT) AS n_feats,
       s.dsir_score
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


@register_extended("dsir_selection", DSIR_ORACLE)
def q_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm import dsir

    d = _docs(spark, sf_dir, parallel=True).select("doc_id", "lang", "text")
    # target_col instead of a target frame (optimization r14): the en
    # slice is a predicate over the same corpus, so the target
    # distribution derives from the scoring leg's per-(doc, f)
    # exchange instead of a second explode+hash pass over the en docs
    return dsir.dsir_scores(d, target_col=F.col("lang") == "en").select(
        F.col("doc_id").cast("long").alias("doc_id"), "n_feats", "dsir_score"
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (A-ES, llm/packing.py): sample
# 100 documents with probability proportional to length. Deterministic
# hash uniform -> pointwise rounded ln -> TakeOrdered: exact oracle.
# ---------------------------------------------------------------------------

_WS_K = 100

WEIGHTED_SAMPLE_ORACLE = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_chars AS BIGINT) AS weight,
       round(ln(((doc_id * 2654435761) % 4294967296 + 0.5) / 4294967296.0)
             / CAST(n_chars AS DOUBLE), 9) AS es_key
FROM documents
WHERE n_chars > 0
ORDER BY es_key DESC, doc_id ASC LIMIT {_WS_K}
"""


@register_extended("weighted_sample", WEIGHTED_SAMPLE_ORACLE)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.packing import weighted_sample

    d = _docs(spark, sf_dir).select("doc_id", "n_chars")
    return weighted_sample(d, "n_chars", k=_WS_K).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("weight").cast("long").alias("weight"),
        "es_key",
    )


# ---------------------------------------------------------------------------
# Batch-query ANN (VERDICT r5 #6): real retrieval workloads probe
# thousands of query vectors at once, not one. The batch path is the
# same persisted-IVF probe as the hybrid dense leg — queries DF joined
# to the cell-partitioned index on the CELL key (dim_broadcast degrades
# the query side to a shuffle join past the estimate ceiling), per-query
# top-k via a q_id-partitioned rank window (bounded, never global).
# Seed centroids (iters=0) keep the whole probe exactly oracle-able.
# ---------------------------------------------------------------------------

_BATCH_MOD = 10  # query set: vec_id % 10 == 0
_BATCH_K = 5

BATCH_ANN_ORACLE = f"""
WITH cents AS (
  SELECT row_number() OVER (ORDER BY vec_id ASC) AS cell,
         embedding AS centroid
  FROM (SELECT vec_id, embedding FROM embeddings
        ORDER BY vec_id ASC LIMIT {_IVF_CELLS})
),
dd AS (
  SELECT v.vec_id, c.cell,
         {_O_L2.format(a="v.embedding", b="c.centroid")} AS dist
  FROM embeddings v CROSS JOIN cents c
),
ca AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
           ORDER BY dist ASC, cell ASC) AS rk FROM dd
  ) WHERE rk <= 1
),
qa AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
           ORDER BY dist ASC, cell ASC) AS rk
    FROM dd WHERE vec_id % {_BATCH_MOD} = 0
  ) WHERE rk <= {_IVF_NPROBE}
),
vn AS (
  SELECT vec_id, embedding, {O_NORM2.format(e="embedding")} AS n2
  FROM embeddings
),
p AS (
  SELECT DISTINCT qa.vec_id AS q_id, ca.vec_id AS c_id
  FROM qa JOIN ca ON ca.cell = qa.cell AND ca.vec_id <> qa.vec_id
),
s AS (
  SELECT p.q_id, p.c_id,
         ({O_DOT.format(a="qv.embedding", b="cv.embedding")} / 1e12)
           / (sqrt(qv.n2 / 1e12) * sqrt(cv.n2 / 1e12)) AS cosine
  FROM p JOIN vn qv ON qv.vec_id = p.q_id JOIN vn cv ON cv.vec_id = p.c_id
)
SELECT CAST(q_id AS BIGINT) AS q_id, CAST(c_id AS BIGINT) AS c_id,
       cosine, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
            ORDER BY cosine DESC, c_id ASC) AS rank
  FROM s
) WHERE rank <= {_BATCH_K}
"""


@register_extended("embedding_ann_batch", BATCH_ANN_ORACLE)
def q_embedding_ann_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch probe of the persisted IVF index: every 10th vector is a
    query; one cell-key join pairs each with its nprobe cells'
    candidates, then a per-query rank window keeps top-k."""
    from ..llm.similarity import ivf_search
    from .llm import _embs

    root = _hybrid_index_root(spark, sf_dir)
    e = _embs(spark, sf_dir)
    q = e.filter(F.col("vec_id") % _BATCH_MOD == 0)
    out = ivf_search(
        spark, os.path.join(root, "ivf"), q, k=_BATCH_K, nprobe=_IVF_NPROBE
    )
    return out.select(
        F.col("q_id").cast("long").alias("q_id"),
        F.col("c_id").cast("long").alias("c_id"),
        "cosine",
        F.col("rank").cast("long").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Fixed-size batch ANN (VERDICT r8 #6): embedding_ann_batch's query set
# is 10% of ALL vectors, so its bench/sf1 numbers measure WORKLOAD
# growth under the documented O(n^1.5) law, not plan regression. This
# row holds the batch CONSTANT (the 64 lowest vec_ids — stable across
# the sf1 synthesis, whose replicas shift ids up by +100M), so the sf1
# section separates plan scaling (this row, ~flat modulo the
# candidates-per-cell term) from workload scaling (the corpus-growing
# probe, kept as the scale study).
# ---------------------------------------------------------------------------

_FIXED_BATCH = 64

BATCH_ANN_FIXED_ORACLE = f"""
WITH cents AS (
  SELECT row_number() OVER (ORDER BY vec_id ASC) AS cell,
         embedding AS centroid
  FROM (SELECT vec_id, embedding FROM embeddings
        ORDER BY vec_id ASC LIMIT {_IVF_CELLS})
),
qs AS (SELECT vec_id FROM embeddings ORDER BY vec_id ASC LIMIT {_FIXED_BATCH}),
dd AS (
  SELECT v.vec_id, c.cell,
         {_O_L2.format(a="v.embedding", b="c.centroid")} AS dist
  FROM embeddings v CROSS JOIN cents c
),
ca AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
           ORDER BY dist ASC, cell ASC) AS rk FROM dd
  ) WHERE rk <= 1
),
qa AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
           ORDER BY dist ASC, cell ASC) AS rk
    FROM dd WHERE vec_id IN (SELECT vec_id FROM qs)
  ) WHERE rk <= {_IVF_NPROBE}
),
vn AS (
  SELECT vec_id, embedding, {O_NORM2.format(e="embedding")} AS n2
  FROM embeddings
),
p AS (
  SELECT DISTINCT qa.vec_id AS q_id, ca.vec_id AS c_id
  FROM qa JOIN ca ON ca.cell = qa.cell AND ca.vec_id <> qa.vec_id
),
s AS (
  SELECT p.q_id, p.c_id,
         ({O_DOT.format(a="qv.embedding", b="cv.embedding")} / 1e12)
           / (sqrt(qv.n2 / 1e12) * sqrt(cv.n2 / 1e12)) AS cosine
  FROM p JOIN vn qv ON qv.vec_id = p.q_id JOIN vn cv ON cv.vec_id = p.c_id
)
SELECT CAST(q_id AS BIGINT) AS q_id, CAST(c_id AS BIGINT) AS c_id,
       cosine, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
            ORDER BY cosine DESC, c_id ASC) AS rank
  FROM s
) WHERE rank <= {_BATCH_K}
"""


@register_extended("embedding_ann_batch_fixed", BATCH_ANN_FIXED_ORACLE)
def q_embedding_ann_batch_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same persisted-IVF batch probe as embedding_ann_batch, but with
    a constant {_FIXED_BATCH}-query batch — the benched/sf1 row whose
    flatness certifies the PLAN as the corpus grows."""
    from ..llm.similarity import ivf_search
    from .llm import _embs

    root = _hybrid_index_root(spark, sf_dir)
    e = _embs(spark, sf_dir)
    q = e.orderBy(F.col("vec_id").asc()).limit(_FIXED_BATCH)
    out = ivf_search(
        spark, os.path.join(root, "ivf"), q, k=_BATCH_K, nprobe=_IVF_NPROBE
    )
    return out.select(
        F.col("q_id").cast("long").alias("q_id"),
        F.col("c_id").cast("long").alias("c_id"),
        "cosine",
        F.col("rank").cast("long").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Batch BM25 (the lexical twin of embedding_ann_batch): many queries
# served by ONE pruned postings scan of the persisted inverted index,
# fanned out via a broadcast (query_id, term) table, per-query top-k by
# a query_id-partitioned rank window. Scoring is identical to
# bm25_search, so the whole batch has an exact oracle.
# ---------------------------------------------------------------------------

BM25_BATCH_QUERIES = {
    1: ["spark", "window", "merge"],
    2: ["join", "hash", "scan"],
    3: ["stream", "batch"],
    4: ["vector", "column", "filter", "sort"],
}
_BM25_BATCH_K = 10

_Q_VALUES = ", ".join(
    f"({qid}, '{t}')"
    for qid, ts in sorted(BM25_BATCH_QUERIES.items())
    for t in sorted(set(ts))
)
_ALL_TERMS_SQL = ", ".join(
    f"'{t}'" for t in sorted({t for ts in BM25_BATCH_QUERIES.values() for t in ts})
)

BM25_BATCH_ORACLE = f"""
WITH q AS (SELECT * FROM (VALUES {_Q_VALUES}) AS v(query_id, term)),
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
base AS (SELECT doc_id, len(ws) AS dl, ws FROM w),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(CAST(dl AS DECIMAL(38,0))) AS DOUBLE) / count(*) AS avgdl
  FROM base
),
tok AS (
  SELECT doc_id, dl, t.tk AS term
  FROM base, unnest(ws) AS t(tk)
  WHERE t.tk IN ({_ALL_TERMS_SQL})
),
tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM tok GROUP BY 1, 2, 3),
dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT q.query_id, tf.doc_id,
         CAST(round(
           ln(1.0 + (stats.n_docs - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf * {1.2 + 1.0}
           / (tf.tf + {1.2} * (1.0 - {0.75} + {0.75} * tf.dl / stats.avgdl)),
           9) AS DECIMAL(38,12)) AS s
  FROM tf JOIN dfx USING (term) JOIN q USING (term) CROSS JOIN stats
),
per_q AS (
  SELECT query_id, doc_id,
         round(CAST(sum(s) AS DOUBLE), 6) AS score,
         count(*) AS n_terms
  FROM scored GROUP BY 1, 2
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(doc_id AS BIGINT) AS doc_id,
       score,
       CAST(n_terms AS BIGINT) AS n_terms,
       CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, doc_id ASC) AS rank
  FROM per_q
) WHERE rank <= {_BM25_BATCH_K}
"""


@register_extended("bm25_batch", BM25_BATCH_ORACLE)
def q_bm25_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.clean import text_index_search_batch

    root = _hybrid_index_root(spark, sf_dir)
    out = text_index_search_batch(
        spark, os.path.join(root, "text"), BM25_BATCH_QUERIES, k=_BM25_BATCH_K
    )
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        "score",
        F.col("n_terms").cast("long").alias("n_terms"),
        F.col("rank").cast("long").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Batch hybrid retrieval: the full production shape — N queries, each
# with a term bag AND an embedding, served by ONE pruned postings scan
# (lexical) + ONE cell-key index join (dense), fused per query with
# integer RRF (llm/fusion.rrf_fuse_batch). query_id == vec_id of the
# query's embedding; seed centroids keep the dense leg exactly
# oracle-able, so the whole batch hash-compares.
# ---------------------------------------------------------------------------

HB_QUERIES = {
    0: ["spark", "window", "merge"],
    1: ["join", "hash", "scan"],
    2: ["stream", "batch"],
    3: ["vector", "column", "filter", "sort"],
}
_HB_K = 25  # per-leg top-k
_HB_TOPK = 10  # fused top-k per query

_HB_Q_VALUES = ", ".join(
    f"({qid}, '{t}')"
    for qid, ts in sorted(HB_QUERIES.items())
    for t in sorted(set(ts))
)
_HB_TERMS_SQL = ", ".join(
    f"'{t}'" for t in sorted({t for ts in HB_QUERIES.values() for t in ts})
)

_HB_LEX_SQL = f"""
WITH q AS (SELECT * FROM (VALUES {_HB_Q_VALUES}) AS v(query_id, term)),
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
base AS (SELECT doc_id, len(ws) AS dl, ws FROM w),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(CAST(dl AS DECIMAL(38,0))) AS DOUBLE) / count(*) AS avgdl
  FROM base
),
tok AS (
  SELECT doc_id, dl, t.tk AS term
  FROM base, unnest(ws) AS t(tk)
  WHERE t.tk IN ({_HB_TERMS_SQL})
),
tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM tok GROUP BY 1, 2, 3),
dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT q.query_id, tf.doc_id,
         CAST(round(
           ln(1.0 + (stats.n_docs - dfx.df + 0.5) / (dfx.df + 0.5))
           * tf.tf * {1.2 + 1.0}
           / (tf.tf + {1.2} * (1.0 - {0.75} + {0.75} * tf.dl / stats.avgdl)),
           9) AS DECIMAL(38,12)) AS s
  FROM tf JOIN dfx USING (term) JOIN q USING (term) CROSS JOIN stats
),
per_q AS (
  SELECT query_id, doc_id, round(CAST(sum(s) AS DOUBLE), 6) AS score
  FROM scored GROUP BY 1, 2
)
SELECT query_id, doc_id, rank FROM (
  SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
         ORDER BY score DESC, doc_id ASC) AS rank
  FROM per_q
) WHERE rank <= {_HB_K}
"""

_HB_DENSE_SQL = f"""
WITH cents AS (
  SELECT row_number() OVER (ORDER BY vec_id ASC) AS cell,
         embedding AS centroid
  FROM (SELECT vec_id, embedding FROM embeddings
        ORDER BY vec_id ASC LIMIT {_IVF_CELLS})
),
dd AS (
  SELECT v.vec_id, c.cell,
         {_O_L2.format(a="v.embedding", b="c.centroid")} AS dist
  FROM embeddings v CROSS JOIN cents c
),
ca AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
           ORDER BY dist ASC, cell ASC) AS rk FROM dd
  ) WHERE rk <= 1
),
qa AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
           ORDER BY dist ASC, cell ASC) AS rk
    FROM dd WHERE vec_id < {len(HB_QUERIES)}
  ) WHERE rk <= {_IVF_NPROBE}
),
vn AS (
  SELECT vec_id, embedding, {O_NORM2.format(e="embedding")} AS n2
  FROM embeddings
),
p AS (
  SELECT DISTINCT qa.vec_id AS q_id, ca.vec_id AS c_id
  FROM qa JOIN ca ON ca.cell = qa.cell AND ca.vec_id <> qa.vec_id
),
s AS (
  SELECT p.q_id, p.c_id,
         ({O_DOT.format(a="qv.embedding", b="cv.embedding")} / 1e12)
           / (sqrt(qv.n2 / 1e12) * sqrt(cv.n2 / 1e12)) AS cosine
  FROM p JOIN vn qv ON qv.vec_id = p.q_id JOIN vn cv ON cv.vec_id = p.c_id
)
SELECT q_id AS query_id, c_id AS doc_id, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
            ORDER BY cosine DESC, c_id ASC) AS rank
  FROM s
) WHERE rank <= {_HB_K}
"""

HYBRID_BATCH_ORACLE = f"""
WITH u AS (
  SELECT query_id, doc_id, CAST(1000000000 AS BIGINT) // ({RRF_K} + rank) AS c
  FROM ({_HB_LEX_SQL})
  UNION ALL
  SELECT query_id, doc_id, CAST(1000000000 AS BIGINT) // ({RRF_K} + rank) AS c
  FROM ({_HB_DENSE_SQL})
),
fused AS (
  SELECT CAST(query_id AS BIGINT) AS query_id,
         CAST(doc_id AS BIGINT) AS doc_id,
         CAST(SUM(c) AS BIGINT) AS rrf_scaled,
         CAST(COUNT(*) AS BIGINT) AS n_retrievers
  FROM u GROUP BY 1, 2
)
SELECT query_id, doc_id, rrf_scaled, n_retrievers,
       CAST(rrf_scaled AS DOUBLE) / 1e9 AS rrf,
       CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY rrf_scaled DESC, doc_id ASC) AS rank
  FROM fused
) WHERE rank <= {_HB_TOPK}
"""


@register_extended("hybrid_retrieval_batch", HYBRID_BATCH_ORACLE)
def q_hybrid_retrieval_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.clean import text_index_search_batch
    from ..llm.fusion import rrf_fuse_batch
    from ..llm.similarity import ivf_search
    from .llm import _embs

    root = _hybrid_index_root(spark, sf_dir)
    lex = text_index_search_batch(
        spark, os.path.join(root, "text"), HB_QUERIES, k=_HB_K
    ).select("query_id", "doc_id", "rank")
    e = _embs(spark, sf_dir)
    dense = ivf_search(
        spark,
        os.path.join(root, "ivf"),
        e.filter(F.col("vec_id") < len(HB_QUERIES)),
        k=_HB_K,
        nprobe=_IVF_NPROBE,
    ).select(
        F.col("q_id").alias("query_id"), F.col("c_id").alias("doc_id"), "rank"
    )
    out = rrf_fuse_batch([lex, dense], k_const=RRF_K, topk=_HB_TOPK)
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        "rrf_scaled",
        "n_retrievers",
        "rrf",
        F.col("rank").cast("long").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Retrieval evaluation (llm/eval.py): recall@k / precision@k / MRR of
# the batch-ANN retrieval against same-label relevance, per query plus
# a macro-average summary row (q_id = -1). Every metric is a ratio of
# small integers; macro averages accumulate floor-scaled BIGINTs via
# DECIMAL sums — bit-identical across engines and shuffle orders. The
# oracle reuses the batch-ANN oracle verbatim as its result CTE.
# ---------------------------------------------------------------------------

RETRIEVAL_EVAL_ORACLE = f"""
WITH res AS ({BATCH_ANN_ORACLE}),
lab AS (SELECT vec_id, label FROM embeddings),
qset AS (SELECT vec_id AS q_id FROM embeddings WHERE vec_id % {_BATCH_MOD} = 0),
rel AS (
  SELECT a.vec_id AS q_id, b.vec_id AS doc_id
  FROM lab a JOIN lab b ON a.label = b.label AND a.vec_id <> b.vec_id
  WHERE a.vec_id % {_BATCH_MOD} = 0
),
nrel AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_rel FROM rel GROUP BY q_id),
hits AS (
  SELECT r.q_id, CAST(count(*) AS BIGINT) AS n_hits, min(r.rank) AS first_rank
  FROM res r JOIN rel ON rel.q_id = r.q_id AND rel.doc_id = r.c_id
  WHERE r.rank <= {_BATCH_K}
  GROUP BY r.q_id
),
per AS (
  SELECT q.q_id,
         coalesce(n.n_rel, 0) AS n_rel,
         coalesce(h.n_hits, 0) AS n_hits,
         CASE WHEN coalesce(n.n_rel, 0) > 0
              THEN coalesce(h.n_hits, 0) / CAST(n.n_rel AS DOUBLE)
              ELSE 0.0 END AS recall_at_k,
         coalesce(h.n_hits, 0) / CAST({_BATCH_K} AS DOUBLE) AS precision_at_k,
         CASE WHEN h.first_rank IS NOT NULL
              THEN 1.0 / h.first_rank ELSE 0.0 END AS reciprocal_rank
  FROM qset q LEFT JOIN nrel n USING (q_id) LEFT JOIN hits h USING (q_id)
)
SELECT CAST(q_id AS BIGINT) AS q_id, n_rel, n_hits,
       recall_at_k, precision_at_k, reciprocal_rank
FROM per
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(count(*) AS BIGINT), CAST(-1 AS BIGINT),
       CAST(sum(CAST(floor(recall_at_k * 1e9) AS BIGINT)) AS DOUBLE)
         / count(*) / 1e9,
       CAST(sum(CAST(floor(precision_at_k * 1e9) AS BIGINT)) AS DOUBLE)
         / count(*) / 1e9,
       CAST(sum(CAST(floor(reciprocal_rank * 1e9) AS BIGINT)) AS DOUBLE)
         / count(*) / 1e9
FROM per
"""


@register_extended("retrieval_eval", RETRIEVAL_EVAL_ORACLE)
def q_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.eval import retrieval_metrics, retrieval_summary
    from .llm import _embs

    res = q_embedding_ann_batch(spark, sf_dir)
    lab = _embs(spark, sf_dir).select("vec_id", "label")
    qs = lab.filter(F.col("vec_id") % _BATCH_MOD == 0).select(
        F.col("vec_id").alias("q_id")
    )
    a = lab.filter(F.col("vec_id") % _BATCH_MOD == 0).select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("ql")
    )
    rel = (
        a.join(lab, a["ql"] == lab["label"])
        .filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", F.col("vec_id").alias("c_id"))
    )
    # `per` feeds BOTH output branches (per-query rows + the macro
    # summary); without a checkpoint the union re-evaluates the whole
    # upstream IVF batch search (the most expensive subtree of this
    # query) once per branch (guide §2.4) — lazy so construction stays
    # cheap, pinned at the first action
    per = retrieval_metrics(res, rel, k=_BATCH_K, queries=qs).localCheckpoint(
        eager=False
    )
    summ = retrieval_summary(per).select(
        F.lit(-1).cast("long").alias("q_id"),
        F.col("n_queries").alias("n_rel"),
        F.lit(-1).cast("long").alias("n_hits"),
        F.col("macro_recall").alias("recall_at_k"),
        F.col("macro_precision").alias("precision_at_k"),
        F.col("mrr").alias("reciprocal_rank"),
    )
    return per.unionByName(summ)
