"""Text-analysis expressions for large-scale training-data pipelines:
tokenization, shingling, deterministic hashing, quality metrics,
language ID. All pure column expressions (whole-stage codegen, no
Python in the hot path) built to be exactly reproducible in ANSI SQL —
see queries/llm.py for the DuckDB twins.

Scale: every metric here is embarrassingly parallel per document; no
shuffles except the aggregations callers add.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

POLY_MOD = 2147483647  # 2^31 - 1
POLY_BASE = 31

# (a, b) affine constants for the minhash family h_i(x) = (a*x + b) mod P.
MINHASH_SEEDS = [(2, 1), (3, 7), (5, 13), (7, 31), (11, 101), (13, 407), (17, 1009), (19, 2003)]

SIMHASH_BITS = 16

TOKEN_RE = r"([a-z]+|[0-9]+|[^a-z0-9\s])"
PUNCT_RE = r"([.!?,;:])"
DIGIT_RE = r"([0-9])"

# Tiny deterministic stopword lists per language (heuristic lang-ID).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "im", "zu"],
    "es": ["el", "la", "que", "y", "en", "los", "se", "del", "por", "un"],
    "fr": ["le", "et", "les", "des", "une", "du", "dans", "est", "pour", "sur"],
    "zh": ["shi", "de", "le", "wo", "bu", "zai", "ta", "you", "zhe", "jiu"],
}

ENGLISH_STOPWORDS = LANG_STOPWORDS["en"]


def words(text: str = "text") -> Column:
    """Whitespace tokenization (single-space corpus convention)."""
    return F.split(F.col(text), " ")


def poly_hash(expr: str) -> Column:
    """Deterministic 31-base polynomial rolling hash mod 2^31-1 over the
    string's codepoints — the document-fingerprint primitive. Expressed
    via aggregate() so it runs codegen'd on the JVM."""
    return F.expr(
        f"aggregate(transform(sequence(1, length({expr})), "
        f"i -> ascii(substring({expr}, i, 1))), CAST(0 AS BIGINT), "
        f"(acc, x) -> (acc * {POLY_BASE} + x) % {POLY_MOD})"
    )


def shingles(words_expr: str, n: int = 3) -> Column:
    """Word n-grams as space-joined strings; empty below n words."""
    return F.expr(
        f"CASE WHEN size({words_expr}) >= {n} THEN "
        f"transform(sequence(1, size({words_expr}) - {n - 1}), "
        f"i -> array_join(slice({words_expr}, i, {n}), ' ')) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )


SHINGLE_B = 131


def word_hash_array(words_expr: str) -> Column:
    """Polynomial hash per word. Hashing the (small) per-doc word list
    once and combining per shingle is ~n_shingle_chars/n_word_chars
    cheaper than hashing every overlapping shingle string."""
    return F.expr(
        f"transform({words_expr}, w -> CASE WHEN length(w) = 0 "
        f"THEN CAST(0 AS BIGINT) ELSE "
        f"aggregate(transform(sequence(1, length(w)), j -> ascii(substring(w, j, 1))), "
        f"CAST(0 AS BIGINT), (acc, x) -> (acc * {POLY_BASE} + x) % {POLY_MOD}) END)"
    )


def shingle_combine_sql(hw: str, n: int = 3) -> str:
    """The (engine-agnostic) combiner: h = ((h*B + next) % P) rolled
    over ``n`` word hashes; identical text is used in the DuckDB
    oracles. ``{hw}[i + k]`` must be 1-based indexing in the dialect."""
    expr = f"{hw}[i]"
    for k in range(1, n):
        expr = f"(({expr}) * {SHINGLE_B} + {hw}[i + {k}]) % {POLY_MOD}"
    return expr


def shingle_hash_array(hw_expr: str, n: int = 3) -> Column:
    combine = shingle_combine_sql(f"__hw", n).replace("__hw[i]", f"element_at({hw_expr}, i)")
    # element_at for the offset terms too (Spark [] is 0-based; element_at is 1-based)
    for k in range(1, n):
        combine = combine.replace(f"__hw[i + {k}]", f"element_at({hw_expr}, i + {k})")
    return F.expr(
        f"CASE WHEN size({hw_expr}) >= {n} THEN "
        f"transform(sequence(1, size({hw_expr}) - {n - 1}), i -> {combine}) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )


def stopword_count(words_expr: str, stopwords: list[str]) -> Column:
    """Non-distinct stopword occurrences."""
    lits = ", ".join(f"'{w}'" for w in stopwords)
    return F.expr(
        f"size(filter({words_expr}, x -> array_contains(array({lits}), x)))"
    )


def lang_score(words_expr: str, stopwords: list[str]) -> Column:
    """Distinct stopword hits — the lang-ID scoring primitive."""
    lits = ", ".join(f"'{w}'" for w in stopwords)
    return F.expr(f"size(array_intersect({words_expr}, array({lits})))")


def word_repetition_ratio(words_expr: str) -> Column:
    """Fraction of word occurrences that repeat an earlier word:
    ``1 - distinct/total`` (0 for an empty list). The cheapest Gopher-
    style repetition signal — a map-only array expression."""
    return F.expr(
        f"CASE WHEN size({words_expr}) = 0 THEN 0.0 ELSE "
        f"1.0 - CAST(size(array_distinct({words_expr})) AS DOUBLE) "
        f"/ size({words_expr}) END"
    )


def dup_ngram_fraction(grams_expr: str) -> Column:
    """Fraction of n-grams that duplicate an earlier n-gram (Gopher's
    'duplicate n-gram fraction'): ``1 - distinct/total``; 0 when the
    doc is shorter than n words."""
    return F.expr(
        f"CASE WHEN size({grams_expr}) = 0 THEN 0.0 ELSE "
        f"1.0 - CAST(size(array_distinct({grams_expr})) AS DOUBLE) "
        f"/ size({grams_expr}) END"
    )


def top_ngram_fraction(grams_expr: str) -> Column:
    """Fraction of n-grams covered by the single most frequent n-gram
    (Gopher's 'top n-gram fraction'). Linear per doc: sort the gram
    array, then one aggregate() pass tracks the longest equal run —
    no per-doc groupBy, no shuffle, whole-stage codegen throughout."""
    return F.expr(
        f"CASE WHEN size({grams_expr}) = 0 THEN 0.0 ELSE "
        f"CAST(aggregate(array_sort({grams_expr}), "
        f"named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0), "
        f"(acc, x) -> named_struct("
        f"'prev', x, "
        f"'run', CASE WHEN acc.prev IS NOT NULL AND x = acc.prev "
        f"THEN acc.run + 1 ELSE 1 END, "
        f"'best', greatest(acc.best, CASE WHEN acc.prev IS NOT NULL "
        f"AND x = acc.prev THEN acc.run + 1 ELSE 1 END)), "
        f"acc -> acc.best) AS DOUBLE) / size({grams_expr}) END"
    )


def mean_word_length(words_expr: str) -> Column:
    """Mean characters per word (0 for an empty list)."""
    return F.expr(
        f"CASE WHEN size({words_expr}) = 0 THEN 0.0 ELSE "
        f"CAST(aggregate(transform({words_expr}, w -> length(w)), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x) AS DOUBLE) "
        f"/ size({words_expr}) END"
    )


def nonalnum_word_fraction(words_expr: str) -> Column:
    """Fraction of words containing any char outside [a-z0-9] (the
    symbol-to-word ratio filter in C4/Gopher pipelines)."""
    return F.expr(
        f"CASE WHEN size({words_expr}) = 0 THEN 0.0 ELSE "
        f"CAST(size(filter({words_expr}, "
        f"x -> x NOT RLIKE '^[a-z0-9]+$')) AS DOUBLE) "
        f"/ size({words_expr}) END"
    )


def token_count_regex(text: str = "text") -> Column:
    """BPE-ish token count: letter runs, digit runs, single symbols."""
    return F.size(F.regexp_extract_all(F.lower(F.col(text)), F.lit(TOKEN_RE), 1))


def normalized_text(text: str = "text") -> Column:
    """Whitespace-collapsed lowercase text for fingerprinting."""
    return F.regexp_replace(F.lower(F.col(text)), r"\s+", " ")


CHUNK_TOKENS = 64
CHUNK_OVERLAP = 16


def n_chunks(words_expr: str, chunk: int = CHUNK_TOKENS, overlap: int = CHUNK_OVERLAP) -> Column:
    """Number of overlapping fixed-token windows covering the doc:
    ``max(1, ceil((n_words - overlap) / stride))`` with
    ``stride = chunk - overlap`` — chunk i covers words
    ``[i*stride + 1, i*stride + chunk]`` (1-based), so consecutive
    chunks share ``overlap`` words and the last chunk may run short.
    Every doc gets >= 1 chunk (empty docs produce one empty chunk)."""
    stride = chunk - overlap
    return F.greatest(
        F.lit(1),
        F.ceil((F.size(F.col(words_expr)) - F.lit(overlap)) / F.lit(float(stride))).cast(
            "int"
        ),
    )


def chunk_slice(
    words_expr: str,
    idx_expr: str,
    chunk: int = CHUNK_TOKENS,
    overlap: int = CHUNK_OVERLAP,
) -> Column:
    """The word window of chunk ``idx`` (0-based): a map-only array
    slice — chunking a 100 TB corpus is an explode with no shuffle."""
    stride = chunk - overlap
    return F.slice(
        F.col(words_expr), F.col(idx_expr) * stride + 1, chunk
    )
