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


def collocations(
    ref: DataFrame,
    min_count: int = 5,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Top-k collocated word pairs by pointwise lift — the phrase-mining
    pass that feeds tokenizer vocabularies and boilerplate detectors:

        lift(w1, w2) = P(w1, w2) / (P(w1) * P(w2))
                     = (c12 / N2) / ((c1 / N1) * (c2 / N1))

    computed as ``round((c12 * N1 * N1) / (c1 * c2 * N2), 6)`` in
    DOUBLE — every operand is an exact integer below 2^53 and the
    expression is pointwise (no reduction), so the rounded value is
    bit-identical across engines; no logs, so no transcendental drift
    (log-PMI orders identically to lift).

    Plan: one (w1, w2) pair aggregation + one unigram aggregation,
    broadcast totals, TakeOrdered top-k. ``min_count`` prunes the pair
    table before the unigram joins."""
    w = ref.select(F.split(F.col(text_col), " ").alias("ws"))
    pairs = w.select(
        F.explode(
            F.expr(
                "CASE WHEN size(ws) >= 2 THEN transform(sequence(1, size(ws) - 1), "
                "i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2)) "
                "ELSE CAST(array() AS ARRAY<STRUCT<w1:STRING, w2:STRING>>) END"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    c12 = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .filter(F.col("c12") >= min_count)
    )
    n2 = pairs.agg(F.count(F.lit(1)).cast("long").alias("n2"))
    uni = ref.select(F.explode(F.split(F.col(text_col), " ")).alias("t")).groupBy(
        "t"
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    n1 = uni.agg(F.sum("c").cast("long").alias("n1"))
    scored = (
        c12.join(dim_broadcast(uni.select(F.col("t").alias("w1"), F.col("c").alias("c1"))), "w1")
        .join(dim_broadcast(uni.select(F.col("t").alias("w2"), F.col("c").alias("c2"))), "w2")
        .crossJoin(dim_broadcast(n1))
        .crossJoin(dim_broadcast(n2))
        .withColumn(
            "lift",
            F.round(
                (
                    F.col("c12").cast("double")
                    * F.col("n1").cast("double")
                    * F.col("n1").cast("double")
                )
                / (
                    F.col("c1").cast("double")
                    * F.col("c2").cast("double")
                    * F.col("n2").cast("double")
                ),
                6,
            ),
        )
    )
    return (
        scored.select("w1", "w2", "c12", "lift")
        .orderBy(F.col("lift").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(k)
    )


def _padded_bigram_rows(df: DataFrame, id_cols: list[str], text_col: str) -> DataFrame:
    """(ids..., w1, w2): ONE padded explode per document — position i
    carries (w_i, w_{i+1} | NULL), so every token appears exactly once
    as w1 (the vocabulary) and every adjacent pair appears exactly once
    as a w2-bearing row (the bigrams). NULL text degrades to one
    (NULL, NULL) row — the same sentinel the classic CASE explode
    keeps, so NULL-text docs survive identically (ADVICE r13: the
    unguarded ``sequence(1, size(NULL))`` DROPPED them)."""
    w = df.select(
        *[F.col(c) for c in id_cols],
        F.coalesce(
            F.split(F.col(text_col), " "),
            F.array(F.lit(None).cast("string")),
        ).alias("ws"),
    )
    return w.select(
        *[F.col(c) for c in id_cols],
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws)), i -> struct("
                "element_at(ws, i) AS w1, "
                "CASE WHEN i + 1 <= size(ws) THEN element_at(ws, i + 1) "
                "END AS w2))"
            )
        ).alias("p"),
    ).select(*id_cols, "p.w1", "p.w2")


def _bigram_model_from_padded(pairs: DataFrame):
    """(model, contexts, v) from a padded bigram frame. Counts are
    identical to the classic three-pass fit: bigrams from the
    w2-bearing rows, vocabulary from the distinct w1 values
    (countDistinct ignores the NULL sentinel like the classic token
    explode drops NULL text)."""
    c12 = (
        pairs.where(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
    )
    contexts = c12.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    v = pairs.agg(F.countDistinct("w1").cast("long").alias("v"))
    model = (
        c12.join(dim_broadcast(contexts), "w1")
        .crossJoin(dim_broadcast(v))
        .select(
            "w1",
            "w2",
            F.expr(f"(c12 + 1) * CAST({SCALE} AS BIGINT) div (c1 + v)").alias("sc"),
        )
    )
    return model, contexts, v


def fit_bigram(ref: DataFrame, text_col: str = "text"):
    """Laplace-smoothed bigram model as exact integers (the CCNet
    perplexity filter's determinism-safe twin, one order up from
    unigram): for every reference word pair,

        sc = (c(w1,w2) + 1) * SCALE div (c(w1,·) + V)

    — the scaled conditional probability p(w2|w1) with add-1
    smoothing. All counts stay BIGINT and the division is integer
    ``div``, so model and scores are bit-identical across engines and
    shuffle orders (no ``log``; see module docstring for why the mean
    scaled probability replaces mean log-probability).

    Plan (optimization r14): ONE pinned padded explode serves both the
    pair counts and the vocabulary — the classic form re-tokenized the
    reference twice (0 runtime subtree reuse in this engine).

    Returns (model, contexts, v): the (w1, w2, sc) model, the
    (w1, c1) context totals, and the vocabulary size V — everything a
    scorer needs to smooth unseen pairs/contexts identically.
    """
    pairs = _padded_bigram_rows(ref, [], text_col).localCheckpoint(eager=False)
    return _bigram_model_from_padded(pairs)


def bigram_fluency(
    docs: DataFrame,
    ref: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    model: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Per-document fluency under the reference bigram model: the mean
    smoothed p(w2|w1) over the doc's word pairs, exact-integer scaled.
    Unseen pair in a seen context -> the Laplace floor
    ``SCALE div (c1 + V)``; unseen context -> the uniform prior
    ``SCALE div (2V)``. LOW score = word sequences the reference never
    produces (garbled/foreign/boilerplate candidates); single-word
    docs score NULL (no bigrams).

    Output: (id, n_bigrams, n_unseen_pairs, n_unseen_contexts,
    fluency_sum_scaled, fluency_score).

    Plan shape: sub-2-word docs explode to ONE sentinel (null, null)
    pair, so every doc survives the per-doc aggregation and no join
    back to the doc table is needed; the model and context tables are
    dimension-sized (vocabulary-bounded) governed broadcasts. The only
    corpus-sized shuffle in the scoring half is the per-doc groupBy —
    scan, explode, broadcast-lookups, one hash aggregation."""
    # ``model=`` skips the fit entirely: pass the (model, contexts, v)
    # triple from fit_bigram or load_lm_model — the persisted-model
    # path that amortizes the fit across scoring runs (VERDICT r4 #3)
    if model is not None or ref is not None:
        w = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("ws"))
        pairs = w.select(
            F.col(id_col),
            F.explode(
                F.expr(
                    "CASE WHEN size(ws) >= 2 THEN transform(sequence(1, size(ws) - 1), "
                    "i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2)) "
                    "ELSE array(struct(CAST(NULL AS STRING) AS w1, "
                    "CAST(NULL AS STRING) AS w2)) END"
                )
            ).alias("p"),
        ).select(id_col, "p.w1", "p.w2")
        if model is not None:
            model, contexts, v = model
        else:
            model, contexts, v = fit_bigram(ref, text_col)
    else:
        # fused self-fit (optimization r13): executed plans show Spark
        # never reuses the duplicated explode subtrees (0 ReusedExchange
        # at runtime), so the separate fit re-tokenized the corpus twice
        # more. ONE padded explode — position i carries (w_i, w_{i+1} |
        # NULL) — serves the scoring rows AND the model fit: pair counts
        # come from rows with w2 set, the vocabulary from w1 (every
        # token appears exactly once as w1). Rows with NULL w2 are the
        # non-real tail/sentinel rows the classic form already produces
        # for short docs, so the scoring aggregation below is unchanged.
        pairs = _padded_bigram_rows(docs, [id_col], text_col).localCheckpoint(
            eager=False
        )
        model, contexts, v = _bigram_model_from_padded(pairs)
    j = (
        pairs.join(dim_broadcast(model), ["w1", "w2"], "left")
        .join(dim_broadcast(contexts), "w1", "left")
        .crossJoin(dim_broadcast(v))
    )
    floor_seen = F.expr(f"CAST({SCALE} AS BIGINT) div (c1 + v)")
    uniform = F.expr(f"CAST({SCALE} AS BIGINT) div (2 * v)")
    # real rows always carry w2; the classic sentinel and the fused
    # padded tail both have w2 NULL — one predicate serves both shapes
    real = F.col("w2").isNotNull()
    sc_eff = F.coalesce(
        F.col("sc"), F.when(F.col("c1").isNotNull(), floor_seen).otherwise(uniform)
    )
    agg = (
        j.select(
            F.col(id_col),
            F.when(real, sc_eff).otherwise(F.lit(0)).alias("sc_eff"),
            (real & F.col("sc").isNull()).cast("long").alias("unseen_pair"),
            (real & F.col("c1").isNull()).cast("long").alias("unseen_ctx"),
            real.cast("long").alias("is_pair"),
        )
        .groupBy(id_col)
        .agg(
            F.sum("is_pair").cast("long").alias("n_bigrams"),
            F.sum("unseen_pair").cast("long").alias("n_unseen_pairs"),
            F.sum("unseen_ctx").cast("long").alias("n_unseen_contexts"),
            F.sum("sc_eff").cast("long").alias("fluency_sum_scaled"),
        )
    )
    return agg.select(
        id_col,
        "n_bigrams",
        "n_unseen_pairs",
        "n_unseen_contexts",
        "fluency_sum_scaled",
        F.when(
            F.col("n_bigrams") > 0,
            F.col("fluency_sum_scaled").cast("double")
            / F.col("n_bigrams").cast("double")
            / F.lit(float(SCALE)),
        ).alias("fluency_score"),
    )


def _doc_trigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2, w3) per word trigram; docs with < 3 words explode
    to ONE (null, null, null) sentinel so every doc survives the
    scoring aggregation without a join back."""
    w = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("ws"))
    return w.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "CASE WHEN size(ws) >= 3 THEN transform(sequence(1, size(ws) - 2), "
                "i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2, "
                "element_at(ws, i + 2) AS w3)) "
                "ELSE array(struct(CAST(NULL AS STRING) AS w1, "
                "CAST(NULL AS STRING) AS w2, CAST(NULL AS STRING) AS w3)) END"
            )
        ).alias("t"),
    ).select(id_col, "t.w1", "t.w2", "t.w3")


def _padded_trigram_rows(
    df: DataFrame, id_cols: list[str], text_col: str
) -> DataFrame:
    """(ids..., w1, w2, w3): ONE padded explode per document — position
    i carries (w_i, w_{i+1}|NULL, w_{i+2}|NULL), so one frame serves
    trigram counts (w3-bearing rows), bigram counts (w2-bearing rows),
    the vocabulary (w1 occurrences), and the scoring rows themselves.
    NULL text degrades to one (NULL, NULL, NULL) row — the classic
    sentinel shape (ADVICE r13: the unguarded form DROPPED those
    docs)."""
    w = df.select(
        *[F.col(c) for c in id_cols],
        F.coalesce(
            F.split(F.col(text_col), " "),
            F.array(F.lit(None).cast("string")),
        ).alias("ws"),
    )
    return w.select(
        *[F.col(c) for c in id_cols],
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws)), i -> struct("
                "element_at(ws, i) AS w1, "
                "CASE WHEN i + 1 <= size(ws) THEN element_at(ws, i + 1) "
                "END AS w2, "
                "CASE WHEN i + 2 <= size(ws) THEN element_at(ws, i + 2) "
                "END AS w3))"
            )
        ).alias("t"),
    ).select(*id_cols, "t.w1", "t.w2", "t.w3")


def _trigram_model_from_padded(t: DataFrame):
    """(tri, bi, uni) stupid-backoff tables from a padded trigram
    frame. Counts are identical to the classic three-pass fit: every
    trigram appears exactly once as a w3-bearing row, every adjacent
    pair exactly once as a w2-bearing row (keyed (w2, w3) to match the
    model tables), every token exactly once as a non-NULL w1 (the
    ``isNotNull`` keeps NULL-text sentinel rows out of the vocabulary,
    exactly like the classic token explode dropping NULL text —
    ADVICE r13's corpus-wide sc1 skew)."""
    c3 = (
        t.where(F.col("w3").isNotNull())
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).cast("long").alias("c123"))
    )
    c12 = c3.groupBy("w1", "w2").agg(F.sum("c123").cast("long").alias("c12"))
    tri = c3.join(dim_broadcast(c12), ["w1", "w2"]).select(
        "w1", "w2", "w3",
        F.expr(f"c123 * CAST({SCALE} AS BIGINT) div c12").alias("sc3"),
    )
    c23 = (
        t.where(F.col("w2").isNotNull())
        .groupBy(F.col("w1").alias("w2"), F.col("w2").alias("w3"))
        .agg(F.count(F.lit(1)).cast("long").alias("c23"))
    )
    c2 = c23.groupBy("w2").agg(F.sum("c23").cast("long").alias("c2"))
    bi = c23.join(dim_broadcast(c2), "w2").select(
        "w2", "w3",
        F.expr(f"2 * c23 * CAST({SCALE} AS BIGINT) div (5 * c2)").alias("sc2"),
    )
    cu = (
        t.where(F.col("w1").isNotNull())
        .groupBy(F.col("w1").alias("w3"))
        .agg(F.count(F.lit(1)).cast("long").alias("cu"))
    )
    n = cu.agg(F.sum("cu").cast("long").alias("n"))
    uni = cu.crossJoin(dim_broadcast(n)).select(
        "w3",
        F.expr(f"4 * cu * CAST({SCALE} AS BIGINT) div (25 * n)").alias("sc1"),
    )
    return tri, bi, uni


def fit_backoff_trigram(ref: DataFrame, text_col: str = "text"):
    """Order-3 stupid-backoff model (Brants et al. 2007, 'Large
    Language Models in Machine Translation') as exact integers:

        S(w3|w1,w2) = c123/c12            if the trigram was seen
                    = 0.4 * c23/c2        else if the bigram was seen
                    = 0.16 * c3/N         else

    The backoff factor 0.4 = 2/5 is rational, so every score is a pure
    BIGINT expression (``c * 2 * SCALE div (5 * ctx)`` etc.) — the
    whole model is transcendental-free and bit-identical across
    engines, like the unigram/bigram stages. Backoff weights are folded
    INTO the three score tables at fit time, so scoring is three left
    joins and one ``coalesce``.

    Context counts derive from the same order's numerators (c12 =
    sum of c123 over w3), the standard normalization that makes each
    order's scores sum to <= 1 over its context.

    Plan (optimization r14): ONE pinned padded explode serves all
    three orders — the classic form re-tokenized the reference three
    times (trigram, bigram, unigram passes; 0 runtime subtree reuse in
    this engine).

    Returns (tri, bi, uni): (w1,w2,w3,sc3), (w2,w3,sc2), (w3,sc1).
    """
    t = _padded_trigram_rows(ref, [], text_col).localCheckpoint(eager=False)
    return _trigram_model_from_padded(t)


def trigram_fluency(
    docs: DataFrame,
    ref: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    model: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Per-document fluency under the order-3 stupid-backoff model —
    the upgrade CCNet-style pipelines make when bigram filtering is
    too blunt: trigrams catch garbled word order the lower orders
    can't. Output per doc: ``n_trigrams``, ``n_backoff_bi`` (trigram
    unseen, bigram hit), ``n_backoff_uni``, ``n_oov`` (no order knew
    w3), ``fluency_sum_scaled`` (exact BIGINT), ``fluency_score``
    (the one float: sum / n / SCALE). Docs with < 3 words score NULL.

    Plan: explode (sentinel for short docs), three governed-broadcast
    model joins, one per-doc hash aggregation — the corpus crosses one
    shuffle, the models are vocabulary-bounded."""
    if model is not None:
        tri, bi, uni = model
        t = _doc_trigrams(docs, id_col, text_col)
    elif ref is not None:
        tri, bi, uni = fit_backoff_trigram(ref, text_col)
        t = _doc_trigrams(docs, id_col, text_col)
    else:
        # fused self-fit (optimization r13): the separate
        # fit_backoff_trigram re-tokenized the corpus THREE more times
        # (trigram, bigram, unigram passes) on top of the scoring
        # explode, and executed plans show zero runtime subtree reuse.
        # ONE padded explode serves all four: the three model orders
        # and the scoring rows themselves (see _padded_trigram_rows /
        # _trigram_model_from_padded — shared with the ref-path fit
        # since r14). NULL-w3 rows are exactly the non-real
        # tail/sentinel rows of the classic shape.
        t = _padded_trigram_rows(docs, [id_col], text_col).localCheckpoint(
            eager=False
        )
        tri, bi, uni = _trigram_model_from_padded(t)
    j = (
        t.join(dim_broadcast(tri), ["w1", "w2", "w3"], "left")
        .join(dim_broadcast(bi), ["w2", "w3"], "left")
        .join(dim_broadcast(uni), ["w3"], "left")
    )
    # real rows always carry w3; the classic sentinel and the fused
    # padded tail both have w3 NULL — one predicate serves both shapes
    real = F.col("w3").isNotNull()
    sc_eff = F.coalesce("sc3", "sc2", "sc1", F.lit(0))
    agg = j.groupBy(id_col).agg(
        F.sum(real.cast("long")).alias("n_trigrams"),
        F.sum((real & F.col("sc3").isNull() & F.col("sc2").isNotNull()).cast("long"))
        .alias("n_backoff_bi"),
        F.sum(
            (
                real
                & F.col("sc3").isNull()
                & F.col("sc2").isNull()
                & F.col("sc1").isNotNull()
            ).cast("long")
        ).alias("n_backoff_uni"),
        F.sum(
            (real & F.col("sc3").isNull() & F.col("sc2").isNull() & F.col("sc1").isNull())
            .cast("long")
        ).alias("n_oov"),
        F.sum(F.when(real, sc_eff).otherwise(F.lit(0))).cast("long").alias(
            "fluency_sum_scaled"
        ),
    )
    return agg.withColumn(
        "fluency_score",
        F.when(
            F.col("n_trigrams") > 0,
            F.col("fluency_sum_scaled").cast("double")
            / F.col("n_trigrams").cast("double")
            / F.lit(float(SCALE)),
        ),
    )


# ---------------------------------------------------------------------------
# Persisted LM models (VERDICT r4 #3): fit once, score many — the same
# build-once index discipline as the MinHash / IVF / text indexes. At
# 100 TB the reference corpus fit is a real job (three count
# aggregations over the corpus); refitting it inside every scoring
# query multiplies that cost by the number of scoring runs. The model
# tables are vocabulary-bounded parquet artifacts; scoring reads them
# back and runs the identical join tail, so score-from-model is
# bit-equal to fit-and-score (asserted in tests/test_clean.py).
# ---------------------------------------------------------------------------

_LM_PARTS = {2: ("model", "contexts", "v"), 3: ("tri", "bi", "uni")}


def build_lm_model(
    ref: DataFrame, path: str, order: int = 2, text_col: str = "text"
) -> dict:
    """Fit the order-2 (Laplace bigram) or order-3 (stupid-backoff
    trigram) model on ``ref`` and persist its tables under ``path``.
    Returns {"order": n, "rows": {part: count}}. Model tables are
    coalesced to few files (they are vocabulary-sized, not
    corpus-sized); the scoring join broadcasts them under the governed
    threshold and shuffles on the term key past it."""
    import os

    if order == 2:
        parts = fit_bigram(ref, text_col)
    elif order == 3:
        parts = fit_backoff_trigram(ref, text_col)
    else:
        raise ValueError(f"unsupported LM order: {order} (2|3)")
    rows = {}
    for name, df in zip(_LM_PARTS[order], parts):
        n = df.count()
        files = max(1, min(8, n // 500_000 + 1))
        df.coalesce(files).write.mode("overwrite").parquet(
            os.path.join(path, name)
        )
        rows[name] = n
    return {"order": order, "rows": rows}


def load_lm_model(spark, path: str, order: int = 2):
    """Read a persisted LM model back as the (a, b, c) DataFrame triple
    the ``model=`` parameter of bigram_fluency / trigram_fluency
    expects."""
    import os

    return tuple(
        spark.read.parquet(os.path.join(path, name)) for name in _LM_PARTS[order]
    )
