"""Unigram language-model scoring — the CCNet/perplexity-filter stage
of an LLM data pipeline: fit a token-frequency model on a trusted
reference corpus, score every candidate document, and gate on the
score (docs whose tokens the reference has never seen, or sees at
wildly unusual rates, are boilerplate/garbled/foreign-format
candidates).

Determinism: the classic form of this filter is mean token
log-probability, but ``ln`` is a libm call whose last ulp differs
across engines, which would break the hash-compared oracle gate. The
score here is therefore the exact-integer twin: each term's relative
frequency is the INTEGER ``c * SCALE div total`` (BigInt division,
identical everywhere), per-doc sums stay BIGINT, and only the final
per-doc mean divides in floating point (one division of exact
integers — bit-identical across engines). The OOV rate needs no
floats at all. Same filtering power, zero transcendentals.

Scale (100 TB): the vocabulary is a groupBy of the REFERENCE corpus
(usually a curated, much smaller set); scoring is one join of the
exploded candidate terms against it — routed through ``dim_broadcast``
so it broadcasts while the vocab is dimension-sized and degrades to a
shuffle join on the term key when it isn't. Per-term work is a single
integer multiply-divide inside codegen.

``SCALE = 1e9`` keeps ``c * SCALE`` inside BIGINT for reference
corpora up to ~9e9 total tokens; for corpora beyond that fit the model
on a sample (standard practice — CCNet fits on Wikipedia, not the
crawl) rather than raising SCALE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.joins import dim_broadcast

SCALE = 1_000_000_000  # integer relative-frequency scale (see docstring)


def fit_unigram(ref: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, sc) unigram model: sc = floor(count * SCALE / total),
    the exact-integer relative frequency of each reference term."""
    terms = ref.select(F.explode(F.split(F.col(text_col), " ")).alias("term"))
    vocab = terms.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("c"))
    total = vocab.agg(F.sum("c").cast("long").alias("total"))
    return vocab.crossJoin(dim_broadcast(total)).select(
        "term", F.expr(f"c * CAST({SCALE} AS BIGINT) div total").alias("sc")
    )


def unigram_rarity(
    docs: DataFrame,
    ref: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score each document against a unigram model of ``ref`` (default:
    ``docs`` itself, in which case OOV is zero by construction).

    Returns one row per doc, all-BIGINT except the derived mean:
    ``n_lm_terms`` (tokens scored), ``n_oov`` (tokens absent from the
    reference vocabulary), ``tf_sum_scaled`` (exact sum of the scaled
    relative frequencies), and ``rarity_score`` = tf_sum_scaled /
    n_lm_terms / SCALE — the mean in-reference frequency of the doc's
    tokens (LOW = rare/foreign vocabulary, HIGH = common filler)."""
    model = fit_unigram(ref if ref is not None else docs, text_col)
    terms = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    j = terms.join(dim_broadcast(model), "term", "left")
    agg = j.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_lm_terms"),
        F.sum(F.when(F.col("sc").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        F.sum(F.coalesce(F.col("sc"), F.lit(0))).cast("long").alias("tf_sum_scaled"),
    )
    return agg.withColumn(
        "rarity_score",
        F.col("tf_sum_scaled").cast("double")
        / F.col("n_lm_terms").cast("double")
        / F.lit(float(SCALE)),
    )
