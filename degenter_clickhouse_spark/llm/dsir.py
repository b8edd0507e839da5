"""DSIR-style data selection: importance resampling on hashed n-gram
features (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling").

Fit two bag-of-hashed-bigrams distributions — the TARGET (a trusted
reference: curated set, in-domain sample) and the RAW pool — and score
every raw document by its importance log-ratio

    score(d) = sum over d's hashed-bigram features f of
               ln p_target(f) - ln p_raw(f)        (add-1 smoothed)

High score = the document looks more like the target distribution than
like the raw pool; selecting the top-weighted documents shifts the
training mixture toward the target domain. The paper samples with
Gumbel noise; this implementation selects deterministically by
(score desc, id asc) — the engine-wide no-RNG rule (same corpus, same
selection, any partitioning).

Determinism: ``ln`` is transcendental, but each per-feature log-ratio
``lam(f)`` is computed POINTWISE on one bucket row and rounded to 9
decimals before the per-doc reduction; the reduction itself sums
DECIMAL(38,12) — the BM25 pattern (llm/clean.py) proven bit-identical
across engines and shuffle orders.

Scale (100 TB): features hash into ``n_buckets`` ids, so both fitted
distributions are ``n_buckets``-row tables regardless of corpus size
(groupBy with map-side partials); scoring joins the exploded raw
corpus to the broadcast lambda table and aggregates per doc — one
corpus-sized shuffle. This is exactly why DSIR hashes features: the
model stays broadcastable at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.joins import dim_broadcast
from .text import POLY_MOD, SHINGLE_B, word_hash_array

N_BUCKETS = 8192


def _features(df: DataFrame, id_col: str | None, text_col: str) -> DataFrame:
    """Hashed-bigram feature ids: adjacent word polyhashes combined with
    the shingle constant, bucketed mod N_BUCKETS. One row per feature
    OCCURRENCE (DSIR counts occurrences, not distinct features)."""
    hw = word_hash_array(f"split({text_col}, ' ')")
    grams = (
        f"CASE WHEN size(__hw) >= 2 THEN transform(sequence(1, size(__hw) - 1), "
        f"i -> ((element_at(__hw, i) * {SHINGLE_B} + element_at(__hw, i + 1)) "
        f"% {POLY_MOD}) % {N_BUCKETS}) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )
    cols = [F.col(id_col)] if id_col else []
    return df.withColumn("__hw", hw).select(
        *cols, F.explode(F.expr(grams)).alias("f")
    )


def _counts(feats: DataFrame) -> DataFrame:
    return feats.groupBy("f").agg(F.count(F.lit(1)).cast("long").alias("c"))


def dsir_lambdas(
    raw: DataFrame, target: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(f, lam) per feature bucket: the rounded importance log-ratio
    under add-1 smoothing over the N_BUCKETS feature space. Buckets
    never seen in either corpus contribute the constant
    ln((1/(Nt+B))/(1/(Nr+B))) — folded in by the full outer join with
    zero-coalesced counts."""
    ct = _counts(_features(target, None, text_col))
    cr = _counts(_features(raw, None, text_col))
    return _lambdas_from_counts(ct, cr)


def _lambdas_from_counts(ct: DataFrame, cr: DataFrame) -> DataFrame:
    """Lambda table from pre-computed per-feature counts — shared by
    the two-scan fit above and dsir_scores' fused fit-and-score path
    (which derives ``cr`` from the same per-(doc, f) exchange the
    scoring leg reuses). Both count tables are <= N_BUCKETS rows;
    lazily checkpointing them means the nt/nr totals sum the tiny
    tables instead of re-deriving them from another corpus scan."""
    ct = ct.localCheckpoint(eager=False)
    cr = cr.localCheckpoint(eager=False)
    nt = ct.agg(F.sum("c").cast("long").alias("nt"))
    nr = cr.agg(F.sum("c").cast("long").alias("nr"))
    both = (
        ct.withColumnRenamed("c", "ct")
        .join(cr.withColumnRenamed("c", "cr"), "f", "full_outer")
        .select(
            "f",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cr", F.lit(0)).alias("cr"),
        )
        .crossJoin(dim_broadcast(nt))
        .crossJoin(dim_broadcast(nr))
    )
    lam = F.round(
        F.log((F.col("ct") + 1).cast("double") / (F.col("nt") + N_BUCKETS))
        - F.log((F.col("cr") + 1).cast("double") / (F.col("nr") + N_BUCKETS)),
        9,
    )
    return both.select("f", lam.alias("lam"))


def build_dsir_model(
    raw: DataFrame, target: DataFrame, path: str, text_col: str = "text"
) -> dict:
    """Fit the DSIR importance model once and persist it (VERDICT r5
    #3, mirroring llm/lm.py's build_lm_model): ``lambdas/`` = the
    (f, lam) log-ratio table (at most N_BUCKETS rows — broadcastable
    at any corpus size by construction) and ``meta/`` = one row of
    (nt, nr, lam_default), where lam_default is the smoothed log-ratio
    of a bucket seen in NEITHER corpus — needed when the artifact
    scores a corpus other than the one it was fitted on. Returns
    {"rows": n_lambda_rows, "nt": ..., "nr": ...}."""
    import os

    ct = _counts(_features(target, None, text_col))
    cr = _counts(_features(raw, None, text_col))
    nt = ct.agg(F.sum("c").cast("long").alias("nt"))
    nr = cr.agg(F.sum("c").cast("long").alias("nr"))
    lam = dsir_lambdas(raw, target, text_col)
    lam.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "lambdas")
    )
    lam_default = F.round(
        F.log(F.lit(1.0) / (F.col("nt") + N_BUCKETS))
        - F.log(F.lit(1.0) / (F.col("nr") + N_BUCKETS)),
        9,
    )
    meta = nt.crossJoin(nr).select("nt", "nr", lam_default.alias("lam_default"))
    meta.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "meta"))
    spark = meta.sparkSession
    row = spark.read.parquet(os.path.join(path, "meta")).collect()[0]
    n = spark.read.parquet(os.path.join(path, "lambdas")).count()
    return {"rows": n, "nt": row["nt"], "nr": row["nr"]}


def load_dsir_model(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Read a persisted DSIR model back as the (lambdas, meta) pair the
    ``model=`` parameter of dsir_scores expects."""
    import os

    return (
        spark.read.parquet(os.path.join(path, "lambdas")),
        spark.read.parquet(os.path.join(path, "meta")),
    )


def dsir_scores(
    raw: DataFrame,
    target: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    model: tuple[DataFrame, DataFrame] | None = None,
    target_col: F.Column | str | None = None,
) -> DataFrame:
    """Per-raw-document importance score: (id, n_feats, dsir_score).
    Documents with fewer than two words carry no features and score
    NULL with n_feats 0 (kept via the sentinel feature, mirroring the
    LM scorers' no-join-back shape).

    ``model=`` (from load_dsir_model) scores from the persisted
    artifact instead of refitting both feature distributions per call —
    bit-equal to fit-and-score on the fitted corpus (the lambda table
    round-trips rounded doubles exactly); on a DIFFERENT corpus,
    buckets the model never saw score the persisted lam_default.

    ``target_col=`` (optimization r14): when the target corpus is a
    PREDICATE over ``raw`` (the common in-domain-slice fit, e.g.
    lang == 'en'), pass the boolean column instead of a separate
    DataFrame — the target distribution then derives from the same
    per-(doc, f) exchange the raw side and the scoring leg already
    share, so the target subset is never re-tokenized/re-hashed in a
    second corpus pass. Counts are identical to the two-scan fit
    (sum of per-doc occurrence counts over target docs).

    Plan shape: raw features aggregate ONCE into per-(doc, f)
    occurrence counts; the raw-side distribution for the lambda fit
    and the scoring leg both derive from that one exchange (Spark's
    ReusedExchange), so fit-and-score reads the raw corpus once
    instead of twice. Scores are bit-equal to occurrence-level
    summing: DECIMAL(38,12) lam x exact integer count."""
    hw = word_hash_array(f"split({text_col}, ' ')")
    grams = (
        f"CASE WHEN size(__hw) >= 2 THEN transform(sequence(1, size(__hw) - 1), "
        f"i -> ((element_at(__hw, i) * {SHINGLE_B} + element_at(__hw, i + 1)) "
        f"% {POLY_MOD}) % {N_BUCKETS}) "
        f"ELSE array(CAST(NULL AS BIGINT)) END"
    )
    tflag = []
    if target_col is not None:
        if target is not None:
            raise ValueError("dsir_scores: pass target= OR target_col=, not both")
        tc = F.col(target_col) if isinstance(target_col, str) else target_col
        tflag = [tc.alias("__t")]
    feats = raw.withColumn("__hw", hw).select(
        F.col(id_col), *tflag, F.explode(F.expr(grams)).alias("f")
    )
    # __t is constant per doc, so adding it to the grouping keys keeps
    # the same group cardinality — it just rides the exchange
    df_cnt = feats.groupBy(id_col, *(["__t"] if tflag else []), "f").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    if model is None:
        # fit-and-score: materialized once (lazy localCheckpoint) and
        # shared by THREE consumers — the raw-side distribution, its
        # total, and the scoring join — so the raw corpus explodes
        # once, not three times (AQE does not canonicalize the
        # branches into a ReusedExchange on its own; verified).
        # Storage is the distinct (doc, feature) pairs — the same
        # order of bytes the aggregation's shuffle already writes.
        # Artifact scoring (model=) has exactly ONE consumer: skip
        # the checkpoint, keep the recomputable lineage.
        df_cnt = df_cnt.localCheckpoint(eager=False)
    if model is not None:
        lam, meta = model
    elif target is not None or target_col is not None:
        # raw-side counts re-aggregate the per-(doc, f) exchange —
        # sentinel NULL features (docs of < 2 words) are no rows in
        # the two-scan _features form, so they are excluded here too
        if target_col is not None:
            # BOTH distributions from one aggregation of the shared
            # per-(doc, f) exchange (see docstring): target <= raw, so
            # every target bucket exists on the raw side and the
            # general full_outer of _lambdas_from_counts degenerates to
            # a single groupBy with a conditional sum — one exchange,
            # one checkpoint, no join. The lam expression is verbatim
            # _lambdas_from_counts', so scores are bit-identical.
            both = (
                df_cnt.filter(F.col("f").isNotNull())
                .groupBy("f")
                .agg(
                    F.sum(F.when(F.col("__t"), F.col("__n")).otherwise(F.lit(0)))
                    .cast("long")
                    .alias("ct"),
                    F.sum("__n").cast("long").alias("cr"),
                )
                .localCheckpoint(eager=False)
            )
            nt = both.agg(F.sum("ct").cast("long").alias("nt"))
            nr = both.agg(F.sum("cr").cast("long").alias("nr"))
            lam_col = F.round(
                F.log((F.col("ct") + 1).cast("double") / (F.col("nt") + N_BUCKETS))
                - F.log((F.col("cr") + 1).cast("double") / (F.col("nr") + N_BUCKETS)),
                9,
            )
            lam = (
                both.crossJoin(dim_broadcast(nt))
                .crossJoin(dim_broadcast(nr))
                .select("f", lam_col.alias("lam"))
            )
            meta = None
        else:
            cr = (
                df_cnt.filter(F.col("f").isNotNull())
                .groupBy("f")
                .agg(F.sum("__n").cast("long").alias("c"))
            )
            ct = _counts(_features(target, None, text_col))
            lam, meta = _lambdas_from_counts(ct, cr), None
    else:
        raise ValueError("dsir_scores: pass either target= or model=")
    j = df_cnt.join(dim_broadcast(lam), "f", "left")
    lam_eff = F.col("lam")
    if meta is not None:
        # artifact scoring of a corpus the model was not fitted on:
        # buckets absent from the lambda table (seen in neither fit
        # corpus) take the persisted smoothed default. On the fitted
        # corpus every feature is in the table, so the coalesce never
        # fires and the result is bit-equal to fit-and-score.
        j = j.crossJoin(dim_broadcast(meta.select("lam_default")))
        lam_eff = F.coalesce(F.col("lam"), F.col("lam_default"))
    agg = j.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("f").isNotNull(), F.col("__n")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_feats"),
        # decimal(25,12) x decimal(12,0) -> precision 25+12+1 = 38,
        # scale 12 -> decimal(38,12) with NO precision-loss scale cut
        # (ADVICE r8: 20,12 x 18,0 hit precision 39 and Spark trimmed
        # the scale to 11; exactness then hung on lam being rounded to
        # 9 decimals). __n is a per-doc token count — far below 1e12.
        F.sum(
            F.when(
                F.col("f").isNotNull(),
                lam_eff.cast("decimal(25,12)")
                * F.col("__n").cast("decimal(12,0)"),
            )
        ).alias("__s"),
    )
    return agg.select(
        id_col,
        "n_feats",
        F.when(F.col("n_feats") > 0, F.col("__s").cast("double")).alias(
            "dsir_score"
        ),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic top-k selection by importance weight — the
    resampling step with ties broken by id instead of Gumbel noise.
    Plans as TakeOrderedAndProject (bounded per-partition heaps)."""
    return (
        dsir_scores(raw, target, id_col, text_col)
        .where(F.col("dsir_score").isNotNull())
        .orderBy(F.col("dsir_score").desc(), F.col(id_col).asc())
        .limit(k)
    )
