"""LLM training-data pipeline queries: dedup (exact / n-gram Jaccard /
MinHash-LSH / SimHash), similarity search (brute-force + LSH ANN),
text analysis (lang-ID, quality, token counts, fingerprints), and
multimodal feature-extraction plumbing — each with a DuckDB oracle
except the approximate-ANN scale path (rows-only; recall is asserted
against the exact baseline in tests/test_llm.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..llm import dedup, multimodal, similarity
from ..llm import text as T
from . import register, register_extended

# ---------------------------------------------------------------------------
# Shared oracle fragments (exact twins of llm/text.py expressions)
# ---------------------------------------------------------------------------

O_POLY = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(generate_series(1, length({s})), "
    "i -> CAST(ord(substring({s}, i, 1)) AS BIGINT))), "
    f"(acc, x) -> (acc * {T.POLY_BASE} + x) % {T.POLY_MOD})"
)

# Shingle-hash CTE: exact twin of llm/dedup.with_shingle_rows (word
# polyhashes rolled into shingle hashes — same combiner constants).
from ..llm.text import POLY_BASE, POLY_MOD, SHINGLE_B, shingle_combine_sql

O_WORD_HASHES = (
    "list_transform(string_split(text, ' '), w -> CASE WHEN length(w) = 0 "
    "THEN CAST(0 AS BIGINT) ELSE "
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(generate_series(1, length(w)), "
    "j -> CAST(ord(substring(w, j, 1)) AS BIGINT))), "
    f"(acc, x) -> (acc * {POLY_BASE} + x) % {POLY_MOD}) END)"
)

O_SHINGLES = f"""
SELECT DISTINCT doc_id, unnest(sh) AS h
FROM (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(len(hw) - 2, 0)),
                        i -> {shingle_combine_sql("hw", 3)}) AS sh
  FROM (SELECT doc_id, {O_WORD_HASHES} AS hw FROM documents)
)
"""

O_NORM2 = (
    "CAST(list_sum(list_transform({e}, x -> "
    "CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e12) AS BIGINT))) AS BIGINT)"
)

O_DOT = (
    "CAST(list_sum(list_transform(generate_series(1, len({a})), i -> "
    "CAST(floor(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) * 1e12) AS BIGINT))) "
    "AS BIGINT)"
)


def _parallel_scan(
    spark: SparkSession, df: DataFrame, path: str | None = None
) -> DataFrame:
    """Small-file parallelization guard for CPU-heavy per-row JVM
    operators (rolled hashes, scaled-integer dot products): a sub-MB
    parquet arrives as ONE split, serializing the whole hash chain onto
    one core. Repartition only when the scan has fewer splits than half
    the cores — at real scale the input already has >= cores partitions
    and this is a no-op, so the shuffle cost exists only where it buys
    parallelism. Callers opt IN per query: ops whose per-row work is
    cheap (md5 groupBy) or Python-bound (mapInPandas decode, where 32
    tasks mean 32 worker spin-ups) measured SLOWER with it.

    When ``path`` names a local file/dir, the split count is estimated
    from file bytes / maxPartitionBytes instead of
    ``df.rdd.getNumPartitions()`` — the ``.rdd`` probe runs physical
    planning on every call (~0.1 s of driver time per builder, ~40
    builders in the bench); the byte estimate is planning-free and
    errs the same way for the decision at hand (sub-split files on
    either estimate repartition; multi-split inputs on either skip)."""
    target = spark.sparkContext.defaultParallelism
    splits = None
    if path is not None and os.path.exists(path):
        try:
            if os.path.isfile(path):
                nbytes, n_files = os.path.getsize(path), 1
            else:
                sizes = [
                    os.path.getsize(os.path.join(r, f))
                    for r, _d, fs in os.walk(path)
                    for f in fs
                    if not f.startswith(("_", "."))
                ]
                nbytes, n_files = sum(sizes), max(1, len(sizes))
            import re

            raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
            m = re.match(r"(\d+)\s*([a-zA-Z]*)", raw)
            mult = {
                "": 1, "b": 1,
                "k": 1 << 10, "kb": 1 << 10,
                "m": 1 << 20, "mb": 1 << 20,
                "g": 1 << 30, "gb": 1 << 30,
            }.get(m.group(2).lower(), 1)
            max_pb = int(m.group(1)) * mult
            # Charge each file Spark's openCostInBytes like the real
            # split packer does (ADVICE r13): a directory of many small
            # files genuinely yields many splits, and the bare
            # bytes/maxPartitionBytes estimate under-counted them to ~1,
            # triggering a pointless corpus-wide repartition exactly on
            # multi-file inputs.
            open_cost = 4 * 1024 * 1024
            try:
                open_cost = int(
                    spark.conf.get("spark.sql.files.openCostInBytes", str(open_cost))
                )
            except Exception:
                pass
            adjusted = nbytes + n_files * open_cost
            splits = max(1, -(-adjusted // max_pb))
        except Exception:
            splits = None
    if splits is None:
        splits = df.rdd.getNumPartitions()
    if splits < max(target // 2, 2):
        return df.repartition(target)
    return df


def _docs(spark: SparkSession, sf_dir: str, parallel: bool = False) -> DataFrame:
    df = catalog.load_table(spark, sf_dir, "documents")
    if not parallel:
        return df
    return _parallel_scan(spark, df, os.path.join(sf_dir, "documents.parquet"))


def _embs(spark: SparkSession, sf_dir: str, parallel: bool = False) -> DataFrame:
    df = catalog.load_table(spark, sf_dir, "embeddings")
    if not parallel:
        return df
    return _parallel_scan(spark, df, os.path.join(sf_dir, "embeddings.parquet"))


# ---------------------------------------------------------------------------
# Exact dedup (hash-groupBy); duplicates synthesized deterministically
# since the corpus has only *near*-dups
# ---------------------------------------------------------------------------

EXACT_ORACLE = """
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 50
),
h AS (SELECT doc_id, md5(text) AS content_hash FROM all_docs),
g AS (SELECT content_hash, MIN(doc_id) AS canonical_id, COUNT(*) AS n
      FROM h GROUP BY content_hash)
SELECT h.doc_id, g.canonical_id, h.content_hash
FROM h JOIN g USING (content_hash)
WHERE g.n > 1 AND h.doc_id <> g.canonical_id
"""


@register_extended("dedup_exact", EXACT_ORACLE)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", "text")
    dupes = d.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return dedup.exact_dedup(d.unionByName(dupes))


# ---------------------------------------------------------------------------
# N-gram Jaccard near-dup pairs (exact baseline)
# ---------------------------------------------------------------------------

JACCARD_ORACLE = f"""
WITH sh AS ({O_SHINGLES}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d1, d2, common, s1.n_sh AS n1, s2.n_sh AS n2,
       CAST(common AS DOUBLE) / (s1.n_sh + s2.n_sh - common) AS jaccard
FROM pairs
JOIN sizes s1 ON s1.doc_id = d1
JOIN sizes s2 ON s2.doc_id = d2
WHERE CAST(common AS DOUBLE) / (s1.n_sh + s2.n_sh - common) >= 0.5
"""


@register_extended("dedup_ngram_jaccard", JACCARD_ORACLE)
def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.jaccard_pairs(_docs(spark, sf_dir, parallel=True), threshold=0.5)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup pairs (the scale path, verified by Jaccard)
# ---------------------------------------------------------------------------


def _minhash_ctes() -> str:
    """Shared CTE chain: shingle hashes -> signatures -> bands ->
    candidates -> verified near-dup pairs (jaccard >= 0.5)."""
    mins = ",\n       ".join(
        f"MIN(({a} * h + {b}) % {T.POLY_MOD}) AS m{i}"
        for i, (a, b) in enumerate(T.MINHASH_SEEDS)
    )
    bands = "\n  UNION ALL\n".join(
        f"  SELECT doc_id AS d, {j} AS band, "
        f"CAST(m{2 * j} AS VARCHAR) || '_' || CAST(m{2 * j + 1} AS VARCHAR) AS key "
        f"FROM sig"
        for j in range(4)
    )
    return f"""
sh AS ({O_SHINGLES}),
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
bands AS (
{bands}
),
cand AS (
  SELECT DISTINCT a.d AS d1, b.d AS d2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.d < b.d
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT c.d1, c.d2, COUNT(*) AS common
  FROM cand c
  JOIN sh a ON a.doc_id = c.d1
  JOIN sh b ON b.doc_id = c.d2 AND b.h = a.h
  GROUP BY c.d1, c.d2
),
nd_pairs AS (
  SELECT d1, d2,
         CAST(common AS DOUBLE) / (s1.n_sh + s2.n_sh - common) AS jaccard
  FROM common
  JOIN sizes s1 ON s1.doc_id = d1
  JOIN sizes s2 ON s2.doc_id = d2
  WHERE CAST(common AS DOUBLE) / (s1.n_sh + s2.n_sh - common) >= 0.5
)"""


def _minhash_oracle() -> str:
    return f"WITH {_minhash_ctes()}\nSELECT d1, d2, jaccard FROM nd_pairs"


@register("dedup_minhash_lsh", _minhash_oracle())
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(_docs(spark, sf_dir, parallel=True), threshold=0.5)


# ---------------------------------------------------------------------------
# SimHash fingerprints + equal-fingerprint cluster sizes
# ---------------------------------------------------------------------------


def _simhash_oracle() -> str:
    poly_w = O_POLY.format(s="w")
    bit_sums = ",\n       ".join(
        f"SUM(CASE WHEN (h & {1 << b}) <> 0 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(T.SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(T.SIMHASH_BITS)
    )
    return f"""
WITH w0 AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
wh AS (SELECT doc_id, {poly_w} AS h FROM w0),
bits AS (SELECT doc_id, {bit_sums} FROM wh GROUP BY doc_id),
fp AS (SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM bits)
SELECT f.doc_id, f.simhash, c.cluster_n
FROM fp f JOIN (SELECT simhash, COUNT(*) AS cluster_n FROM fp GROUP BY simhash) c
  ON c.simhash = f.simhash
"""


@register("dedup_simhash", _simhash_oracle())
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # checkpoint the fingerprints: the cluster-count self-join would
    # otherwise re-run the whole word-hash chain on BOTH join sides
    fp = dedup.simhash(_docs(spark, sf_dir, parallel=True)).localCheckpoint(eager=False)
    clusters = fp.groupBy("simhash").agg(F.count(F.lit(1)).alias("cluster_n"))
    return fp.join(clusters, "simhash").select("doc_id", "simhash", "cluster_n")


# ---------------------------------------------------------------------------
# Language ID (stopword heuristic)
# ---------------------------------------------------------------------------


def _langid_oracle() -> str:
    scores = ",\n       ".join(
        "len(list_intersect(words, [{lits}])) AS s_{lang}".format(
            lits=", ".join(f"'{w}'" for w in ws), lang=lang
        )
        for lang, ws in T.LANG_STOPWORDS.items()
    )
    langs = list(T.LANG_STOPWORDS)
    best = "GREATEST(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    guess = "CASE " + " ".join(
        f"WHEN s_{lang} = {best} THEN '{lang}'" for lang in langs
    ) + " END"
    return f"""
WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents),
s AS (SELECT doc_id, lang, {scores} FROM w)
SELECT doc_id, lang AS labeled_lang, s_en, s_de, s_es, s_fr, s_zh,
       {guess} AS lang_guess
FROM s
"""


# registered via queries.suites.text_analysis (driver 50-entry cap)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir, parallel=True).withColumn("words", T.words())
    langs = list(T.LANG_STOPWORDS)
    scored = d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[
            T.lang_score("words", T.LANG_STOPWORDS[lang]).alias(f"s_{lang}")
            for lang in langs
        ],
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in langs])
    guess = F
    expr = None
    for lang in langs:
        cond = F.col(f"s_{lang}") == best
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return scored.withColumn("lang_guess", expr)


# ---------------------------------------------------------------------------
# Text quality metrics + score buckets
# ---------------------------------------------------------------------------


def _quality_oracle() -> str:
    stop_lits = ", ".join(f"'{w}'" for w in T.ENGLISH_STOPWORDS)
    return f"""
WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS words FROM documents),
m AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(words) AS BIGINT) AS n_words,
         CAST(len(list_filter(words, x -> list_contains([{stop_lits}], x))) AS BIGINT)
           AS n_stop,
         CAST(len(regexp_extract_all(text, '([.!?,;:])', 1)) AS BIGINT) AS punct_count,
         CAST(len(regexp_extract_all(text, '([0-9])', 1)) AS BIGINT) AS digit_count
  FROM w
)
SELECT doc_id, n_chars, n_words, n_stop, punct_count, digit_count,
       CAST(n_stop AS DOUBLE) / n_words AS stop_ratio,
       LEAST(1.0, CAST(n_words AS DOUBLE) / 100.0)
         * (1.0 - CAST(n_stop AS DOUBLE) / n_words) AS quality_score,
       CASE WHEN LEAST(1.0, CAST(n_words AS DOUBLE) / 100.0)
                 * (1.0 - CAST(n_stop AS DOUBLE) / n_words) >= 0.5 THEN 'high'
            WHEN LEAST(1.0, CAST(n_words AS DOUBLE) / 100.0)
                 * (1.0 - CAST(n_stop AS DOUBLE) / n_words) >= 0.2 THEN 'mid'
            ELSE 'low' END AS quality_bucket
FROM m
"""


# registered via queries.suites.text_analysis
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir, parallel=True).withColumn("words", T.words())
    m = d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        F.size("words").cast("bigint").alias("n_words"),
        T.stopword_count("words", T.ENGLISH_STOPWORDS).cast("bigint").alias("n_stop"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(T.PUNCT_RE), 1))
        .cast("bigint")
        .alias("punct_count"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(T.DIGIT_RE), 1))
        .cast("bigint")
        .alias("digit_count"),
    )
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_words")
    score = F.least(F.lit(1.0), F.col("n_words").cast("double") / 100.0) * (
        F.lit(1.0) - stop_ratio
    )
    return m.select(
        "*",
        stop_ratio.alias("stop_ratio"),
        score.alias("quality_score"),
        F.when(score >= 0.5, "high").when(score >= 0.2, "mid").otherwise("low").alias(
            "quality_bucket"
        ),
    )


# ---------------------------------------------------------------------------
# Token counting (whitespace + BPE-ish regex)
# ---------------------------------------------------------------------------

TOKEN_ORACLE = r"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '([a-z]+|[0-9]+|[^a-z0-9\s])', 1))
            AS BIGINT) AS bpe_tokens,
       CAST(length(text) AS DOUBLE)
         / len(regexp_extract_all(lower(text), '([a-z]+|[0-9]+|[^a-z0-9\s])', 1))
         AS chars_per_token
FROM documents
"""


# registered via queries.suites.text_analysis
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir, parallel=True)
    bpe = T.token_count_regex()
    return d.select(
        "doc_id",
        F.size(T.words()).cast("bigint").alias("ws_tokens"),
        bpe.cast("bigint").alias("bpe_tokens"),
        (F.length("text").cast("double") / bpe).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# Document fingerprint (rolling polynomial hash of normalized text)
# ---------------------------------------------------------------------------

_NORM_SQL = r"regexp_replace(lower(text), '\s+', ' ', 'g')"
FP_ORACLE = (
    "SELECT doc_id, " + O_POLY.format(s=_NORM_SQL) + " AS fingerprint FROM documents"
)


# registered via queries.suites.text_analysis
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir, parallel=True).withColumn("norm_text", T.normalized_text())
    return d.select("doc_id", T.poly_hash("norm_text").alias("fingerprint"))


# ---------------------------------------------------------------------------
# Similarity search: exact brute-force top-k (queries = vec_id < 5)
# ---------------------------------------------------------------------------

ANN_ORACLE = f"""
WITH v AS (
  SELECT vec_id, embedding, {O_NORM2.format(e="embedding")} AS n2 FROM embeddings
),
q AS (SELECT * FROM v WHERE vec_id < 5),
p AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         {O_DOT.format(a="q.embedding", b="c.embedding")} AS dot_s,
         q.n2 AS qn2, c.n2 AS cn2
  FROM q JOIN v c ON c.vec_id <> q.vec_id
),
s AS (
  SELECT q_id, c_id,
         (dot_s / 1e12) / (sqrt(qn2 / 1e12) * sqrt(cn2 / 1e12)) AS cosine
  FROM p
)
SELECT q_id, c_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
            ORDER BY cosine DESC, c_id ASC) AS rank
  FROM s
) WHERE rank <= 5
"""


@register("embedding_ann_topk", ANN_ORACLE)
def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _embs(spark, sf_dir, parallel=True)
    out = similarity.brute_topk(e.filter(F.col("vec_id") < 5), e, k=5)
    return out.select("q_id", "c_id", "cosine", F.col("rank").cast("long").alias("rank"))


# ---------------------------------------------------------------------------
# Embedding near-dup pairs (label-blocked cosine threshold)
# ---------------------------------------------------------------------------

NEARDUP_ORACLE = f"""
WITH v AS (
  SELECT vec_id, label, embedding, {O_NORM2.format(e="embedding")} AS n2 FROM embeddings
),
p AS (
  SELECT a.vec_id AS v1, b.vec_id AS v2, a.label AS label,
         {O_DOT.format(a="a.embedding", b="b.embedding")} AS dot_s,
         a.n2 AS n1, b.n2 AS nn2
  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT v1, v2, (dot_s / 1e12) / (sqrt(n1 / 1e12) * sqrt(nn2 / 1e12)) AS cosine, label
FROM p
WHERE (dot_s / 1e12) / (sqrt(n1 / 1e12) * sqrt(nn2 / 1e12)) >= 0.35
"""


@register("embedding_neardup", NEARDUP_ORACLE)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _embs(spark, sf_dir, parallel=True)
    return similarity.neardup_pairs(e, threshold=0.35, group_col="label")


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-style): hyperplane-bucket blocking + cosine
# pairs + recursive-closure resolution — fully deterministic, so the
# whole pipeline (bucketing included) hash-compares against DuckDB
# ---------------------------------------------------------------------------


def _hyperplane_bucket_sql(vec: str = "embedding") -> str:
    """Exact DuckDB twin of llm/similarity.hyperplane_bucket: same
    fixed pseudo-random hyperplane family, same strict left-fold over
    the components (list_reduce, not list_sum, so the float summation
    order matches Spark's aggregate())."""
    bits = []
    for j in range(similarity.N_HYPERPLANES):
        comp = (
            f"(CAST((({j} * 37 + (i - 1) * 101) * 2654435761) % 1000000 AS DOUBLE)"
            f" / 1000000.0 - 0.5)"
        )
        dot = (
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(generate_series(1, len({vec})), "
            f"i -> CAST({vec}[i] AS DOUBLE) * {comp})), (acc, x) -> acc + x)"
        )
        bits.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(bits)


SEMANTIC_DEDUP_ORACLE = f"""
WITH RECURSIVE v AS (
  SELECT vec_id, embedding,
         {_hyperplane_bucket_sql()} AS bucket,
         {O_NORM2.format(e="embedding")} AS n2
  FROM embeddings
),
p AS (
  SELECT a.vec_id AS v1, b.vec_id AS v2
  FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE ({O_DOT.format(a="a.embedding", b="b.embedding")} / 1e12)
        / (sqrt(a.n2 / 1e12) * sqrt(b.n2 / 1e12)) >= 0.35
),
edges AS (SELECT v1 AS a, v2 AS b FROM p UNION SELECT v2, v1 FROM p),
comp(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT c.a, e.b FROM comp c JOIN edges e ON e.a = c.b
),
canon AS (SELECT a AS vec_id, LEAST(a, MIN(b)) AS canonical_id FROM comp GROUP BY a)
SELECT e.vec_id,
       COALESCE(c.canonical_id, e.vec_id) AS canonical_id,
       COALESCE(c.canonical_id, e.vec_id) = e.vec_id AS keep
FROM embeddings e LEFT JOIN canon c ON c.vec_id = e.vec_id
"""


@register("semantic_dedup", SEMANTIC_DEDUP_ORACLE)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _embs(spark, sf_dir, parallel=True)
    # planning count from parquet footer metadata (catalog.table_rows)
    # — identical row count, no Spark job
    bits = similarity.adaptive_hyperplane_bits(
        catalog.table_rows(spark, sf_dir, "embeddings")
    )
    return dedup.semantic_dedup(e, threshold=0.35, bits=bits)


# ---------------------------------------------------------------------------
# Approximate ANN (hyperplane LSH buckets) — rows-only; recall asserted
# against brute_topk in tests/test_llm.py
# ---------------------------------------------------------------------------


# registered via queries.suites.embedding_ann_scalable
def q_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _embs(spark, sf_dir, parallel=True)
    bits = similarity.adaptive_hyperplane_bits(
        catalog.table_rows(spark, sf_dir, "embeddings")
    )
    return similarity.lsh_topk(e.filter(F.col("vec_id") < 5), e, k=5, bits=bits)


# The LSH probe is APPROXIMATE as an ANN method but fully DETERMINISTIC
# as a computation (fixed hyperplane family, integer-scaled cosine), so
# it has an exact oracle: top-k restricted to the probed buckets —
# bucket itself plus every 1-bit-flip neighbor, mirroring lsh_topk's
# multi-probe explode. Recall vs brute force stays a pytest claim.
LSH_ANN_ORACLE = f"""
WITH v AS (
  SELECT vec_id, embedding, {_hyperplane_bucket_sql()} AS bucket,
         {O_NORM2.format(e="embedding")} AS n2
  FROM embeddings
),
qp AS (
  SELECT vec_id, embedding, n2,
         unnest([bucket, xor(bucket, 1), xor(bucket, 2),
                 xor(bucket, 4), xor(bucket, 8)]) AS bucket
  FROM v WHERE vec_id < 5
),
s AS (
  SELECT qp.vec_id AS q_id, c.vec_id AS c_id,
         ({O_DOT.format(a="qp.embedding", b="c.embedding")} / 1e12)
         / (sqrt(qp.n2 / 1e12) * sqrt(c.n2 / 1e12)) AS cosine
  FROM qp JOIN v c ON c.bucket = qp.bucket AND c.vec_id <> qp.vec_id
)
SELECT q_id, c_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
            ORDER BY cosine DESC, c_id ASC) AS rank
  FROM s
) WHERE rank <= 5
"""

# IVF cell-probe oracle: with SEED centroids (the k lowest-id vectors,
# iters=0) the whole pipeline — Voronoi assignment by integer-scaled
# L2, nprobe cells per query, exact cosine within probed cells — is
# bit-deterministic and SQL-expressible. (Lloyd-fitted centroids use
# float means whose summation order is engine-dependent, so the fitted
# variant keeps its recall pytest instead of an oracle.)
_O_L2 = (
    "CAST(list_sum(list_transform(generate_series(1, len({a})), i -> "
    "CAST(floor((CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * "
    "(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * 1e12) AS BIGINT))) "
    "AS BIGINT)"
)

IVF_ANN_ORACLE = f"""
WITH cents AS (
  SELECT row_number() OVER (ORDER BY vec_id ASC) AS cell,
         embedding AS centroid
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id ASC LIMIT 8)
),
d AS (
  SELECT v.vec_id, c.cell,
         {_O_L2.format(a="v.embedding", b="c.centroid")} AS dist
  FROM embeddings v CROSS JOIN cents c
),
ca AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
           ORDER BY dist ASC, cell ASC) AS rk FROM d
  ) WHERE rk <= 1
),
qa AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
           ORDER BY dist ASC, cell ASC) AS rk FROM d WHERE vec_id < 5
  ) WHERE rk <= 3
),
vn AS (
  SELECT vec_id, embedding, {O_NORM2.format(e="embedding")} AS n2 FROM embeddings
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
SELECT q_id, c_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
            ORDER BY cosine DESC, c_id ASC) AS rank
  FROM s
) WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# Multimodal plumbing: binary media -> Arrow-batched feature extraction
# ---------------------------------------------------------------------------

MM_ORACLE = f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS byte_len,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
         list_transform(generate_series(1, length(text)),
           i -> CAST(ord(substring(text, i, 1)) AS BIGINT))),
         (acc, x) -> acc + x) % {multimodal.CHECKSUM_MOD} AS checksum,
       CAST(length(text) AS BIGINT) % 640 AS width,
       (CAST(length(text) AS BIGINT) * 7) % 480 AS height,
       CAST(length(text) AS BIGINT) % 30 + 1 AS n_frames
FROM documents
"""


@register_extended("multimodal_features", MM_ORACLE)
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = multimodal.media_table(_docs(spark, sf_dir))
    return multimodal.extract_features(media)


FRAME_SAMPLE_ORACLE = f"""
WITH f AS ({MM_ORACLE})
SELECT doc_id, n_frames,
       CAST(unnest(generate_series(0, CAST(n_frames - 1 AS BIGINT), 10)) AS INT)
         AS frame_idx
FROM f
"""


@register_extended("multimodal_frame_sample", FRAME_SAMPLE_ORACLE)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = multimodal.media_table(_docs(spark, sf_dir))
    return multimodal.frame_sample(media, every_n=10)


# ---------------------------------------------------------------------------
# Near-dup cluster resolution: iterative min-label propagation on Spark,
# oracled by a recursive-CTE transitive closure in DuckDB
# ---------------------------------------------------------------------------


def _resolution_oracle() -> str:
    return f"""
WITH RECURSIVE {_minhash_ctes()},
edges AS (SELECT d1 AS a, d2 AS b FROM nd_pairs
          UNION SELECT d2, d1 FROM nd_pairs),
comp(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT c.a, e.b FROM comp c JOIN edges e ON e.a = c.b
),
canon AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS canonical_id FROM comp GROUP BY a)
SELECT d.doc_id,
       COALESCE(c.canonical_id, d.doc_id) AS canonical_id,
       COALESCE(c.canonical_id, d.doc_id) = d.doc_id AS keep
FROM documents d LEFT JOIN canon c ON c.doc_id = d.doc_id
"""


@register("dedup_resolution", _resolution_oracle())
def q_dedup_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir, parallel=True)
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    return dedup.dedup_resolution(docs, pairs)


# ---------------------------------------------------------------------------
# Train/eval decontamination: n-gram collision against a benchmark set
# (benchmark = every 10th doc, deterministically; train = the rest —
# the corpus's planted near-dups straddle the split, so real hits exist)
# ---------------------------------------------------------------------------

DECONTAMINATION_ORACLE = f"""
WITH sh AS ({O_SHINGLES}),
bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % 10 = 0),
tr AS (SELECT doc_id, h FROM sh WHERE doc_id % 10 <> 0),
hits AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM tr JOIN bench USING (h) GROUP BY doc_id
),
train AS (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0)
SELECT train.doc_id,
       CAST(COALESCE(hits.n_hits, 0) AS BIGINT) AS n_hits,
       COALESCE(hits.n_hits, 0) > 0 AS contaminated
FROM train LEFT JOIN hits USING (doc_id)
"""


@register("decontamination", DECONTAMINATION_ORACLE)
def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir, parallel=True)
    bench = d.filter(F.col("doc_id") % 10 == 0)
    train = d.filter(F.col("doc_id") % 10 != 0)
    return dedup.contamination(train, bench)


# registered via queries.suites.embedding_ann_scalable
def q_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell probe with SEED centroids (iters=0: the k lowest-id
    vectors) so the whole probe is exactly oracle-able — see
    IVF_ANN_ORACLE. The Lloyd-FITTED path exercises identical probe
    plumbing and keeps its recall + index pytest coverage
    (tests/test_llm.py::test_ivf_topk_recall_and_cost)."""
    e = _embs(spark, sf_dir, parallel=True)
    cents = similarity.fit_ivf_centroids(e, k=8, iters=0)
    return similarity.ivf_topk(e.filter(F.col("vec_id") < 5), e, cents, k=5, nprobe=3)


# ---------------------------------------------------------------------------
# PII-style redaction: regex masking of emails/URLs/long digit runs
# (inputs synthesized deterministically — the corpus is clean text)
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}"
_URL_RE = r"https?://[^\s]+"
_PHONE_RE = r"[0-9]{7,}"

PII_ORACLE = rf"""
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(dirty,
         '{_EMAIL_RE}', '<EMAIL>', 'g'),
         '{_URL_RE}', '<URL>', 'g'),
         '{_PHONE_RE}', '<NUM>', 'g') AS clean,
       CAST(len(regexp_extract_all(dirty, '({_EMAIL_RE})', 1)) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(dirty, '({_URL_RE})', 1)) AS BIGINT) AS n_urls
FROM (
  SELECT doc_id,
         'contact user' || CAST(doc_id AS VARCHAR) || '@example.com or see ' ||
         'https://docs.example.com/d/' || CAST(doc_id AS VARCHAR) || ' call 5551234567 ' ||
         text AS dirty
  FROM documents
)
"""


@register("pii_redaction", PII_ORACLE)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir, parallel=True)
    dirty = F.concat(
        F.lit("contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or see https://docs.example.com/d/"),
        F.col("doc_id").cast("string"), F.lit(" call 5551234567 "), F.col("text"),
    )
    base = d.select("doc_id", dirty.alias("dirty"))
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("dirty"), _EMAIL_RE, "<EMAIL>"),
            _URL_RE, "<URL>",
        ),
        _PHONE_RE, "<NUM>",
    )
    return base.select(
        "doc_id",
        clean.alias("clean"),
        F.size(F.regexp_extract_all(F.col("dirty"), F.lit(f"({_EMAIL_RE})"), 1))
        .cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("dirty"), F.lit(f"({_URL_RE})"), 1))
        .cast("bigint").alias("n_urls"),
    )


# ---------------------------------------------------------------------------
# The composite corpus filter: language + quality + near-dup + unigram-LM
# verdicts folded into one keep/drop decision per document — the full
# training-data cleaning pipeline as a single plan. The LM model fits on
# the doc_id % 10 == 0 reference split (decontamination's convention) so
# out-of-vocabulary rates are meaningful; gate = OOV rate <= 20%,
# expressed in integer math (n_oov * 5 <= n_terms) for hash exactness.
# ---------------------------------------------------------------------------

from ..llm.lm import SCALE as LM_SCALE  # noqa: E402


def _corpus_filter_oracle() -> str:
    stop_lits = ", ".join(f"'{w}'" for w in T.ENGLISH_STOPWORDS)
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
q AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(len(list_filter(string_split(text, ' '),
              x -> list_contains([{stop_lits}], x))) AS BIGINT) AS n_stop
  FROM documents
),
rt AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents
       WHERE doc_id % 10 = 0),
v AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM rt GROUP BY term),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM v),
sv AS (SELECT term, (c * {LM_SCALE}) // total AS sc FROM v, tot),
dt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
lm AS (
  SELECT dt.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_lm_terms,
         CAST(SUM(CASE WHEN sv.sc IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
  FROM dt LEFT JOIN sv USING (term) GROUP BY dt.doc_id
)
SELECT d.doc_id,
       COALESCE(c.canonical_id, d.doc_id) = d.doc_id AS dedup_keep,
       q.n_words >= 20 AS length_keep,
       CAST(q.n_stop AS DOUBLE) / q.n_words < 0.5 AS quality_keep,
       lm.n_oov * 5 <= lm.n_lm_terms AS lm_keep,
       (COALESCE(c.canonical_id, d.doc_id) = d.doc_id)
         AND q.n_words >= 20
         AND CAST(q.n_stop AS DOUBLE) / q.n_words < 0.5
         AND lm.n_oov * 5 <= lm.n_lm_terms AS keep
FROM documents d
JOIN q ON q.doc_id = d.doc_id
JOIN lm ON lm.doc_id = d.doc_id
LEFT JOIN canon c ON c.doc_id = d.doc_id
"""


@register("corpus_filter_pipeline", _corpus_filter_oracle())
def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm import lm

    docs = _docs(spark, sf_dir, parallel=True)
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    resolution = dedup.dedup_resolution(docs, pairs).select(
        "doc_id", F.col("keep").alias("dedup_keep")
    )
    d = docs.withColumn("words", T.words())
    q = d.select(
        "doc_id",
        F.size("words").cast("bigint").alias("n_words"),
        T.stopword_count("words", T.ENGLISH_STOPWORDS).cast("bigint").alias("n_stop"),
    )
    rarity = lm.unigram_rarity(
        docs, ref=docs.filter(F.col("doc_id") % 10 == 0)
    ).select("doc_id", "n_lm_terms", "n_oov")
    j = q.join(resolution, "doc_id").join(rarity, "doc_id")
    length_keep = F.col("n_words") >= 20
    quality_keep = F.col("n_stop").cast("double") / F.col("n_words") < 0.5
    lm_keep = F.col("n_oov") * 5 <= F.col("n_lm_terms")
    return j.select(
        "doc_id",
        F.col("dedup_keep"),
        length_keep.alias("length_keep"),
        quality_keep.alias("quality_keep"),
        lm_keep.alias("lm_keep"),
        (F.col("dedup_keep") & length_keep & quality_keep & lm_keep).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Sequence packing: greedy token-budget pack assignment per shard
# (the training-sequence construction step of an LLM data pipeline)
# ---------------------------------------------------------------------------

PACK_BUDGET = 1024

PACKING_ORACLE = f"""
WITH RECURSIVE o AS (
  SELECT source, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
),
packed AS (
  SELECT source, doc_id, tokens, rn,
         tokens AS acc, CAST(0 AS BIGINT) AS pack_id, CAST(0 AS BIGINT) AS pack_pos
  FROM o WHERE rn = 1
  UNION ALL
  SELECT d.source, d.doc_id, d.tokens, d.rn,
         CASE WHEN p.acc + d.tokens > {PACK_BUDGET} THEN d.tokens
              ELSE p.acc + d.tokens END,
         CASE WHEN p.acc + d.tokens > {PACK_BUDGET} THEN p.pack_id + 1
              ELSE p.pack_id END,
         CASE WHEN p.acc + d.tokens > {PACK_BUDGET} THEN CAST(0 AS BIGINT)
              ELSE p.pack_pos + 1 END
  FROM o d JOIN packed p ON d.source = p.source AND d.rn = p.rn + 1
)
SELECT source, doc_id, tokens, pack_id, pack_pos FROM packed
"""


@register("sequence_packing", PACKING_ORACLE)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing (llm/packing.py): per-shard Arrow-batched
    scan assigns each doc to a fixed-token-budget pack. The oracle twin
    is the same greedy rule as a recursive CTE."""
    from ..llm import packing

    d = _docs(spark, sf_dir).select(
        "source",
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("tokens"),
    )
    return packing.greedy_pack(d, budget=PACK_BUDGET)


# ---------------------------------------------------------------------------
# Corpus sampling: deterministic stratified sample + per-domain quota cap
# (corpus mixing primitives: rate-downsample each source, cap domination)
# ---------------------------------------------------------------------------

KNUTH = 2654435761  # Knuth multiplicative-hash constant
U32 = 4294967296

SAMPLING_ORACLE = f"""
WITH s AS (
  SELECT doc_id, source, n_chars,
         CAST((doc_id * {KNUTH}) % {U32} AS BIGINT) AS h,
         CASE coalesce(TRY_CAST(regexp_extract(source, '([0-9]+)$', 1) AS INTEGER), 0) % 4
           WHEN 0 THEN 1.0 WHEN 1 THEN 0.5 WHEN 2 THEN 0.25 ELSE 0.125 END AS rate
  FROM documents
)
SELECT 'sample' AS part, doc_id, source,
       CAST(h AS DOUBLE) / {U32} AS metric
FROM s WHERE CAST(h AS DOUBLE) / {U32} < rate
UNION ALL
SELECT 'quota', doc_id, source, CAST(n_chars AS DOUBLE) AS metric
FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents
) WHERE rn <= 10
"""


@register_extended("corpus_sampling", SAMPLING_ORACLE)
def q_corpus_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus sampling. part='sample': deterministic
    multiplicative-hash uniform in [0,1) per doc, kept under a
    per-source rate — reproducible downsampling with NO shuffle and no
    RNG state (the 100 TB path: a map-only filter). part='quota': cap
    each source at its top-N docs by length — one windowed rank per
    source (single shuffle on the group key)."""
    from pyspark.sql.window import Window

    d = _docs(spark, sf_dir)
    src_idx = F.coalesce(
        F.regexp_extract(F.col("source"), r"([0-9]+)$", 1).cast("int"), F.lit(0)
    )
    rate = (
        F.when(src_idx % 4 == 0, 1.0)
        .when(src_idx % 4 == 1, 0.5)
        .when(src_idx % 4 == 2, 0.25)
        .otherwise(0.125)
    )
    from ..functions.hashing import knuth_uniform

    u = knuth_uniform(F.col("doc_id"))
    sample = (
        d.withColumn("metric", u)
        .filter(F.col("metric") < rate)
        .select(F.lit("sample").alias("part"), "doc_id", "source", "metric")
    )
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    quota = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select(
            F.lit("quota").alias("part"),
            "doc_id",
            "source",
            F.col("n_chars").cast("double").alias("metric"),
        )
    )
    return sample.unionByName(quota)


# ---------------------------------------------------------------------------
# Vocabulary stats: global term/document frequencies, top-K terms
# (the corpus-statistics pass before tokenizer training)
# ---------------------------------------------------------------------------

VOCAB_ORACLE = """
WITH terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
agg AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS tf,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM terms GROUP BY term
)
SELECT term, tf, df, CAST(rank AS BIGINT) AS rank FROM (
  SELECT term, tf, df, row_number() OVER (ORDER BY tf DESC, term ASC) AS rank
  FROM agg
) WHERE rank <= 100
"""


@register_extended("vocab_stats", VOCAB_ORACLE)
def q_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics: explode terms, aggregate term
    frequency + document frequency (map-side partial aggregation takes
    the explosion down to |vocab| rows before the shuffle), then global
    top-K via orderBy+limit — Spark plans TakeOrdered, so no
    single-partition window ever sees the full vocabulary; the rank
    column is assigned on the K survivors only."""
    from pyspark.sql.window import Window

    d = _docs(spark, sf_dir, parallel=True)
    terms = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
    agg = terms.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("doc_id").alias("df"),
    )
    top = agg.orderBy(F.desc("tf"), F.asc("term")).limit(100)
    w = Window.orderBy(F.desc("tf"), F.asc("term"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


# ---------------------------------------------------------------------------
# Document chunking: overlapping fixed-token windows (the pre-packing
# split step for overlong docs); chunk content proven by rolled hash
# ---------------------------------------------------------------------------

_CH, _OV, _ST = T.CHUNK_TOKENS, T.CHUNK_OVERLAP, T.CHUNK_TOKENS - T.CHUNK_OVERLAP

CHUNKING_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
c AS (
  SELECT doc_id, ws,
         unnest(generate_series(0,
           CAST(greatest(1, ceil((len(ws) - {_OV}) / {_ST}.0)) AS INT) - 1)) AS chunk_idx
  FROM w
),
s AS (
  SELECT doc_id, chunk_idx,
         list_slice(ws, chunk_idx * {_ST} + 1, chunk_idx * {_ST} + {_CH}) AS cw
  FROM c
),
t AS (
  SELECT doc_id, chunk_idx, len(cw) AS n_chunk_tokens,
         array_to_string(cw, ' ') AS chunk_text
  FROM s
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(n_chunk_tokens AS BIGINT) AS n_chunk_tokens,
       {O_POLY.format(s="chunk_text")} AS chunk_hash
FROM t
"""


@register_extended("doc_chunking", CHUNKING_ORACLE)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-token chunking (llm/text.n_chunks /
    chunk_slice): one explode over a generated index range, window
    slicing as map-only array expressions — no shuffle anywhere. The
    rolled hash of each chunk's text proves content equality against
    the oracle without shipping the text."""
    d = _docs(spark, sf_dir, parallel=True).withColumn(
        "ws", F.split(F.col("text"), " ")
    )
    c = d.select(
        "doc_id",
        "ws",
        F.explode(F.sequence(F.lit(0), T.n_chunks("ws") - 1)).alias("chunk_idx"),
    )
    s = c.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        T.chunk_slice("ws", "chunk_idx").alias("cw"),
    )
    t = s.select(
        "doc_id",
        "chunk_idx",
        F.size("cw").cast("long").alias("n_chunk_tokens"),
        F.array_join("cw", " ").alias("chunk_text"),
    )
    return t.select(
        "doc_id",
        "chunk_idx",
        "n_chunk_tokens",
        T.poly_hash("chunk_text").alias("chunk_hash"),
    )


# ---------------------------------------------------------------------------
# Quality-priority dedup resolution (r6): keep the HIGHEST-priority
# member of each near-dup cluster (here: longest doc, tie -> lower id)
# instead of the min-id — the production rule when duplicates differ in
# quality. Same recursive-CTE closure oracle as dedup_resolution plus a
# per-cluster argmax window.
# ---------------------------------------------------------------------------


def _keep_best_oracle() -> str:
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
members AS (
  SELECT c.doc_id, c.canonical_id, d.n_chars
  FROM canon c JOIN documents d USING (doc_id)
),
reps AS (
  SELECT canonical_id, doc_id AS rep_id FROM (
    SELECT canonical_id, doc_id,
           row_number() OVER (PARTITION BY canonical_id
               ORDER BY n_chars DESC, doc_id ASC) AS rk
    FROM members
  ) WHERE rk = 1
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(COALESCE(c.canonical_id, d.doc_id) AS BIGINT) AS cluster_id,
       CAST(COALESCE(r.rep_id, d.doc_id) AS BIGINT) AS rep_id,
       COALESCE(r.rep_id, d.doc_id) = d.doc_id AS keep
FROM documents d
LEFT JOIN canon c ON c.doc_id = d.doc_id
LEFT JOIN reps r ON r.canonical_id = c.canonical_id
"""


@register_extended("dedup_keep_best", _keep_best_oracle())
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir, parallel=True)
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    out = dedup.dedup_keep_best(docs, pairs, priority_col="n_chars")
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.col("rep_id").cast("long").alias("rep_id"),
        "keep",
    )


# ---------------------------------------------------------------------------
# Fuzzy (near-duplicate) decontamination (r6): exact n-gram collision
# misses reworded benchmark leaks; MinHash-banded candidates BETWEEN
# the train and benchmark sets, verified at exact Jaccard >= 0.5. Same
# %10 split as the exact `decontamination` query.
# ---------------------------------------------------------------------------

_FUZZY_THR = 0.5


def _fuzzy_decontamination_oracle() -> str:
    # reuse the corpus-wide shingle/band CTEs; cross-set candidates
    ctes = _minhash_ctes()
    return f"""
WITH {ctes},
candx AS (
  SELECT DISTINCT a.d AS d1, b.d AS d2
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.d % 10 <> 0 AND b.d % 10 = 0
),
commonx AS (
  SELECT c.d1, c.d2, COUNT(*) AS common
  FROM candx c
  JOIN sh a ON a.doc_id = c.d1
  JOIN sh b ON b.doc_id = c.d2 AND b.h = a.h
  GROUP BY c.d1, c.d2
),
fhits AS (
  SELECT d1, CAST(common AS DOUBLE) / (s1.n_sh + s2.n_sh - common) AS jaccard
  FROM commonx
  JOIN sizes s1 ON s1.doc_id = d1
  JOIN sizes s2 ON s2.doc_id = d2
  WHERE CAST(common AS DOUBLE) / (s1.n_sh + s2.n_sh - common) >= {_FUZZY_THR}
),
fagg AS (
  SELECT d1 AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
         MAX(jaccard) AS max_jaccard
  FROM fhits GROUP BY d1
)
SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
       CAST(COALESCE(f.n_matches, 0) AS BIGINT) AS n_matches,
       f.max_jaccard,
       COALESCE(f.n_matches, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0) t
LEFT JOIN fagg f USING (doc_id)
"""


@register_extended("fuzzy_decontamination", _fuzzy_decontamination_oracle())
def q_fuzzy_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir, parallel=True)
    bench = d.filter(F.col("doc_id") % 10 == 0)
    train = d.filter(F.col("doc_id") % 10 != 0)
    return dedup.fuzzy_contamination(train, bench, threshold=_FUZZY_THR).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_matches",
        "max_jaccard",
        "contaminated",
    )


# ---------------------------------------------------------------------------
# Token-budget corpus mixing (llm/packing.budget_mix): per-source
# reproducible prefix under a token budget — the pretraining-mix
# recipe. Budgets derive from the source suffix (1000 * (1 + N % 4))
# so Spark (dict built from the dimension-sized distinct-source list)
# and the oracle (closed-form CASE) agree at every scale.
# ---------------------------------------------------------------------------

MIX_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
         CAST((doc_id * {KNUTH}) % {U32} AS BIGINT) AS h,
         1000 * (1 + coalesce(TRY_CAST(regexp_extract(source, '([0-9]+)$', 1) AS INTEGER), 0) % 4)
           AS budget
  FROM documents
),
c AS (
  SELECT doc_id, source, tokens, budget,
         CAST(SUM(tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_tokens
  FROM t
)
SELECT doc_id, source, tokens, cum_tokens
FROM c WHERE cum_tokens <= budget
"""


@register_extended("budget_mix", MIX_ORACLE)
def q_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm import packing

    d = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    sources = [r["source"] for r in d.select("source").distinct().collect()]
    budgets = {s: 1000 * (1 + _src_suffix(s) % 4) for s in sources}
    return packing.budget_mix(d, budgets)


def _src_suffix(source: str) -> int:
    import re

    m = re.search(r"([0-9]+)$", source)
    return int(m.group(1)) if m else 0
