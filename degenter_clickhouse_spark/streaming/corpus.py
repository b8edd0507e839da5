"""Streaming corpus ingestion — the LLM-training-data analogue of the
trade indexer: documents land continuously (crawl shards, upload
batches), and the pipeline dedupes and quality-gates them online
instead of re-scanning the corpus per batch.

Topology (all Structured Streaming built-ins):

* file-source stream over a landing zone (Kafka drop-in at scale);
* ``dropDuplicatesWithinWatermark`` on the content hash — streaming
  state holds one key per UNIQUE document seen inside the watermark
  horizon, so replayed/duplicated shards are no-ops without unbounded
  state (the batch pipeline's exact-dedup semantics, made incremental);
* the Gopher-style quality gate runs as the same column expressions the
  batch path uses (llm/text.py) — no Python in the stream;
* accepted docs append to parquet via ``foreachBatch``; rejected docs
  append to a quarantine table with the failing signal, because corpus
  pipelines audit their filters.

Restart safety: the checkpoint directory replays an interrupted batch
(S13/ST2), and every sink write is IDEMPOTENT under that replay — each
output is partitioned by ``__batch_id`` and written with dynamic
partition overwrite, so re-running a batch replaces exactly its own
partitions instead of appending duplicates (foreachBatch is
at-least-once; batch content for a given id is deterministic, so the
overwrite converges). This is the file-sink analogue of the trade
indexer's anti-join replay guard.

Online NEAR-dedup cost model (the 100 TB concern): band PROBING is a
join of the small batch side against the persisted band keys — fine.
VERIFICATION must not re-read the whole persisted shingle set per
batch, so the shingle index is laid out partitioned by
``__bucket = pmod(xxhash64(doc_id), N_SHINGLE_BUCKETS)`` and the
verify step reads ONLY the buckets that hold candidate index docs
(partition-pruned file scan; the candidate bucket list is collected —
bounded by N_SHINGLE_BUCKETS, a constant). Verify input therefore
scales with the batch's candidates, not with corpus size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..llm import text as TX

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("event_ts", T.TimestampType()),
    ]
)

# layout constants and the bounded index read live with the batch LSH
# operators (llm/dedup.py) — one definition for both ingest paths
from ..llm.dedup import N_SHINGLE_BUCKETS  # noqa: F401 (re-export)
from ..llm.dedup import _doc_bucket, candidate_index_shingles  # noqa: F401


def quality_columns(df: DataFrame) -> DataFrame:
    """The batch quality signals as stream-safe column expressions."""
    df = df.withColumn("__words", F.split(F.col("text"), " "))
    return (
        df.withColumn("n_words", F.size("__words").cast("long"))
        .withColumn(
            "stop_ratio",
            F.when(
                F.col("n_words") > 0,
                TX.stopword_count("__words", TX.ENGLISH_STOPWORDS)
                / F.col("n_words").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("word_rep_ratio", TX.word_repetition_ratio("__words"))
        .drop("__words")
    )


# Mergeable length-profile config (maintain_profile=True): fixed-range
# histogram over per-doc whitespace token counts. 4096 tokens covers
# the corpus regime the quality gate admits; longer docs clamp into the
# top bin (quantile_state semantics).
PROFILE_LO, PROFILE_HI, PROFILE_BINS = 0.0, 4096.0, 256


# Mergeable word-frequency sketch config (maintain_freq_sketch=True):
# count-min states over the accepted docs' word hashes. 4 x 8192
# counters bound the overcount at ~2N/8192 while the per-batch state
# stays sketch-sized (<= touched positions, never vocabulary-sized).
FREQ_DEPTH, FREQ_WIDTH = 4, 8192


def read_freq_sketch(
    spark: SparkSession, output_dir: str, keys: tuple[str, ...] = ("source",)
) -> DataFrame:
    """Merged count-min counters from the stream-maintained frequency
    state — integer addition over batch rows, never a corpus rescan.
    Probe with ``operators.skew.cms_estimate(sketch, probes, hashed,
    FREQ_DEPTH, FREQ_WIDTH, keys=...)``; pass ``keys=()`` for one
    corpus-global sketch. Equals (row-for-row) a direct ``cms_state``
    over all accepted docs' words."""
    from ..operators.skew import cms_merge

    states = spark.read.parquet(os.path.join(output_dir, "freq_sketch"))
    return cms_merge(states.drop("__batch_id"), list(keys))


def read_length_profile(spark: SparkSession, output_dir: str, q: float = 0.5) -> DataFrame:
    """Per-source token-length quantile estimates from the
    stream-maintained mergeable profile — sums histogram rows, never
    rescans the corpus. Equals (bit-for-bit) a direct
    ``quantile_state`` + ``quantile_merge`` over all accepted docs."""
    from ..operators.skew import quantile_merge

    states = spark.read.parquet(os.path.join(output_dir, "length_profile"))
    return quantile_merge(states.drop("__batch_id"), ["source"], q)


def _prior_ids(
    spark: SparkSession, path: str, batch_id: int, batch_rows: DataFrame
) -> DataFrame:
    """Other batches' doc_ids restricted to THIS batch's hash buckets:
    the bucket list collects driver-side (<= N_SHINGLE_BUCKETS ints —
    dimension-sized by construction) and becomes a static IN partition
    filter, so the replay-guard read prunes every untouched bucket's
    files at planning time. Tables written before the bucket layout
    (no __bucket partition) fall back to the full column-pruned
    read."""
    from pyspark.errors import AnalysisException

    try:
        prior = spark.read.parquet(path)
    except AnalysisException:
        # directory exists but holds no data files (e.g. only _SUCCESS
        # from an all-rejected batch written before the empty-guard)
        return batch_rows.select("doc_id").limit(0)
    if "__bucket" in prior.columns:
        buckets = [
            r.b
            for r in batch_rows.select(_doc_bucket("doc_id").alias("b"))
            .distinct()
            .collect()
        ]
        prior = prior.where(F.col("__bucket").isin(buckets))
    return prior.where(F.col("__batch_id") != int(batch_id)).select("doc_id")


def _read_optional(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a stream-grown parquet dir, treating "missing" and "exists
    but holds no data files" (a pre-guard empty dynamic overwrite left
    only _SUCCESS) identically: no index yet."""
    from pyspark.errors import AnalysisException

    if not os.path.exists(path):
        return None
    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return None


def _idempotent_write(df: DataFrame, path: str, batch_id: int, *extra_parts: str) -> None:
    """Batch-scoped dynamic partition overwrite: replaying batch N
    rewrites exactly batch N's partitions (idempotent under
    foreachBatch's at-least-once contract). With sub-partitions the
    frame is first repartitioned on them — otherwise every input task
    writes into every partition it holds rows for (tasks x buckets
    small files per batch)."""
    if extra_parts:
        df = df.repartition(*[F.col(c) for c in extra_parts])
    (
        df.withColumn("__batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch_id", *extra_parts)
        .parquet(path)
    )


def process_corpus_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    output_dir: str,
    keep: F.Column,
    near_dup_threshold: float | None,
    maintain_text_index: bool = False,
    maintain_ivf_index: bool = False,
    maintain_pq_index: bool = False,
    maintain_winnow_index: bool = False,
    maintain_profile: bool = False,
    maintain_freq_sketch: bool = False,
    validate_constraints: list | None = None,
) -> None:
    """One micro-batch of the corpus sink (module-level so replay
    idempotency and the bounded probe are unit-testable outside a
    stream). ``batch_df`` must carry DOC_SCHEMA + content_hash +
    quality columns + reject_reason."""
    from ..llm import dedup as D

    idx_dir = os.path.join(output_dir, "minhash_idx")
    batch_df = batch_df.cache()
    to_unpersist = [batch_df]
    try:
        accepted = batch_df.filter(keep).drop("reject_reason")
        rejected = batch_df.filter(~keep)
        # Cross-batch replay guard (the update_text_index_batch recipe,
        # applied to the corpus tables themselves): a LOST-checkpoint
        # replay re-batches the landing files, so batch-scoped
        # overwrites alone can land an already-stored doc under a NEW
        # batch id — anti-join against every OTHER batch's rows (own
        # partition excluded so a crash-replay can rewrite itself).
        # Doing it before any downstream write protects accepted, the
        # quarantine, the MinHash/text/IVF index growth, and the
        # profile states in one place.
        #
        # BOUNDED read: accepted/quarantine are additionally
        # partitioned by a doc-id hash bucket, and the guard reads
        # ONLY this batch's buckets (a static IN partition filter —
        # the candidate_index_shingles discipline). Without this the
        # guard scanned the whole corpus's doc_id column per
        # micro-batch: O(corpus) per batch, quadratic over the stream.
        acc_path = os.path.join(output_dir, "accepted")
        if os.path.exists(acc_path):
            accepted = accepted.join(
                _prior_ids(spark, acc_path, batch_id, accepted),
                "doc_id",
                "left_anti",
            )
        accepted = accepted.cache()
        to_unpersist.append(accepted)
        # Evaluate emptiness BEFORE the near-dup block: an all-rejected
        # batch must not grow the MinHash index — an empty dynamic
        # overwrite would create a data-less shingles/bands directory
        # (only _SUCCESS) that makes the next batch's index read raise
        # UNABLE_TO_INFER_SCHEMA (same failure class as the accepted/
        # quarantine empty-write guard below).
        has_accepted = bool(accepted.limit(1).count())
        if near_dup_threshold is not None and has_accepted:
            sh = D._minhash_shingles(accepted)
            bands = D._minhash_bands(sh)
            a = bands.alias("a")
            idx_bands = _read_optional(spark, os.path.join(idx_dir, "bands"))
            if idx_bands is not None:
                idx_bands = idx_bands.select("d", "band", "key").alias("b")
                # vs the INDEX: any collision drops the NEW doc, no id
                # ordering — an already-accepted near-duplicate wins even
                # when the new doc's id is lower (ids need not arrive
                # monotonically; the id-inequality guard only excludes
                # self-pairs under a crash-replay where this batch's own
                # partial index write is visible).
                cand_idx = (
                    a.join(
                        idx_bands,
                        (F.col("a.band") == F.col("b.band"))
                        & (F.col("a.key") == F.col("b.key"))
                        & (F.col("a.d") != F.col("b.d")),
                    )
                    .select(F.col("a.d").alias("d2"), F.col("b.d").alias("d1"))
                    .distinct()
                    .cache()
                )
                to_unpersist.append(cand_idx)
                idx_sh = candidate_index_shingles(spark, idx_dir, cand_idx)
            else:  # first batch: only batchmates can collide
                cand_idx, idx_sh = None, None
            # vs BATCHMATES: keep the earlier (lower-id) doc of the pair
            b2 = bands.alias("b")
            cand_new = (
                a.join(
                    b2,
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.key") == F.col("b.key"))
                    & (F.col("a.d") > F.col("b.d")),
                )
                .select(F.col("a.d").alias("d2"), F.col("b.d").alias("d1"))
                .distinct()
            )
            cand = cand_new if cand_idx is None else cand_new.unionByName(cand_idx)
            all_sh = sh if idx_sh is None else sh.unionByName(idx_sh)
            dup_ids = (
                D._verify_jaccard(cand.distinct(), all_sh, near_dup_threshold)
                .select(F.col("d2").alias("doc_id"))
                .distinct()
                .cache()
            )
            to_unpersist.append(dup_ids)
            near = accepted.join(dup_ids, "doc_id", "left_semi").withColumn(
                "reject_reason", F.lit("near_duplicate")
            )
            accepted = accepted.join(dup_ids, "doc_id", "left_anti")
            rejected = rejected.unionByName(near, allowMissingColumns=True)
            surv = dup_ids.withColumnRenamed("doc_id", "d")
            _idempotent_write(
                sh.join(surv, "d", "left_anti").withColumn("__bucket", _doc_bucket("d")),
                os.path.join(idx_dir, "shingles"),
                batch_id,
                "__bucket",
            )
            _idempotent_write(
                bands.join(surv, "d", "left_anti"),
                os.path.join(idx_dir, "bands"),
                batch_id,
                "band",
            )
        # an empty write would create a data-less directory (only
        # _SUCCESS) that breaks every subsequent reader — skip it and
        # the growth hooks below (nothing to add)
        has_accepted = bool(accepted.limit(1).count())
        if has_accepted:
            _idempotent_write(
                accepted.withColumn("__bucket", _doc_bucket("doc_id")),
                os.path.join(output_dir, "accepted"),
                batch_id,
                "__bucket",
            )
        if maintain_text_index and has_accepted:
            # BM25 index grows with the corpus, like the MinHash index
            # above: batch-scoped idempotent writes, search-ready after
            # every micro-batch (llm/clean.update_text_index_batch)
            from ..llm.clean import update_text_index_batch

            update_text_index_batch(
                spark,
                accepted.select("doc_id", "text"),
                os.path.join(output_dir, "text_idx"),
                batch_id,
            )
        if maintain_ivf_index and has_accepted:
            # dense ANN index grows too (completing the trio: MinHash
            # bands, posting lists, IVF cells — all stream-maintained):
            # accepted docs are hash-trick embedded (zero-shuffle
            # column expressions, llm/similarity.hash_embed) and
            # appended to the frozen-centroid index. The append's
            # stored-id anti-join makes replays CONVERGE: a crash
            # mid-append leaves some ids visible, and the replay adds
            # exactly the missing ones — no duplicates either way.
            from ..llm.similarity import (
                adaptive_ivf_cells,
                build_ivf_index,
                hash_embed,
                ivf_index_append,
            )

            ivf_dir = os.path.join(output_dir, "ivf_idx")
            emb = hash_embed(accepted.select("doc_id", "text"))
            # append only when BOTH artifacts exist — a crash between
            # the centroid and cells writes must fall back to rebuild
            if os.path.exists(os.path.join(ivf_dir, "centroids")) and os.path.exists(
                os.path.join(ivf_dir, "cells")
            ):
                ivf_index_append(spark, emb, ivf_dir)
            else:
                # first batch seeds the (frozen) centroids; rebuild
                # offline when drift warrants (build_ivf_index docs).
                # A batch whose accepted set is EMPTY cannot seed —
                # defer until one with rows arrives (an all-rejected
                # first shard used to crash the k-means seeding here)
                n_emb = emb.count()
                if n_emb:
                    build_ivf_index(
                        emb,
                        ivf_dir,
                        k_cells=adaptive_ivf_cells(n_emb),
                        iters=1,
                    )
        if maintain_pq_index and has_accepted:
            # 16x-compressed PQ codes grow with the stream (all FOUR
            # index families now stream-maintained: MinHash bands,
            # posting lists, IVF cells, PQ codes). Codebooks freeze on
            # the first batch (the add-after-train contract shared
            # with IVF); pq_index_append's stored-id anti-join makes
            # replays converge.
            from ..llm.pq import build_pq_index, pq_index_append
            from ..llm.similarity import hash_embed

            pq_dir = os.path.join(output_dir, "pq_idx")
            pemb = hash_embed(accepted.select("doc_id", "text"))
            if os.path.exists(os.path.join(pq_dir, "codebooks")) and os.path.exists(
                os.path.join(pq_dir, "codes")
            ):
                pq_index_append(spark, pemb, pq_dir)
            elif pemb.limit(1).count():  # same empty-first-batch guard
                build_pq_index(pemb, pq_dir, iters=1)
        if maintain_winnow_index and has_accepted:
            # winnowed-fingerprint (MOSS) index grows with the stream
            # too (the FIFTH stream-maintained family): first non-empty
            # batch builds, later batches ride winnow_index_append's
            # bucket-pruned effectively-once guard (replays converge;
            # probe reads dedup — llm/winnow.py layout note).
            from ..llm.winnow import build_winnow_index, winnow_index_append

            widx_dir = os.path.join(output_dir, "winnow_idx")
            wdocs = accepted.select("doc_id", "text")
            if os.path.exists(os.path.join(widx_dir, "fps")) and os.path.exists(
                os.path.join(widx_dir, "sizes")
            ):
                winnow_index_append(spark, wdocs, widx_dir)
            else:
                build_winnow_index(wdocs, widx_dir)
        if maintain_profile and has_accepted:
            # mergeable corpus profile (operators/skew.quantile_state):
            # one summable histogram-state row set per batch over the
            # accepted docs' token counts — any-range length quantiles
            # (per source, or across any batch window) come from
            # quantile_merge over these rows, never a corpus rescan.
            # Batch-scoped overwrite => replays rewrite their own rows.
            from ..operators.skew import quantile_state

            toks = accepted.select(
                "source",
                F.size(F.split(F.col("text"), " ")).cast("double").alias("toks"),
            )
            state = quantile_state(
                toks, ["source"], "toks", PROFILE_LO, PROFILE_HI, PROFILE_BINS
            )
            _idempotent_write(
                state, os.path.join(output_dir, "length_profile"), batch_id
            )
        if maintain_freq_sketch and has_accepted:
            # mergeable word-frequency sketch (operators/skew.cms_state):
            # one summable counter-row set per batch over the accepted
            # docs' word hashes — any-range/any-source point-frequency
            # estimates come from cms_merge over these rows (addition),
            # never a corpus rescan. Batch-scoped overwrite => replays
            # rewrite their own rows, and because merge is ADDITION the
            # overwrite (not append) is what keeps replays exactly-once.
            from ..llm.text import poly_hash
            from ..operators.skew import cms_state

            wrds = (
                accepted.select(
                    "source", F.explode(F.split(F.col("text"), " ")).alias("w")
                )
                .filter(F.length("w") > 0)
                .withColumn("h", poly_hash("w"))
            )
            fstate = cms_state(
                wrds, ["source"], "h", depth=FREQ_DEPTH, width=FREQ_WIDTH
            )
            _idempotent_write(
                fstate, os.path.join(output_dir, "freq_sketch"), batch_id
            )
        if validate_constraints and batch_df.limit(1).count():
            # per-batch admission report (operators/validate.py): one
            # row per constraint per micro-batch, batch-scoped
            # idempotent write — an auditable quality ledger the
            # operator can alert on without rescanning the corpus
            from ..operators.validate import check as _dq_check

            report = _dq_check(batch_df, validate_constraints).withColumn(
                "batch_id", F.lit(int(batch_id)).cast("long")
            )
            _idempotent_write(
                report, os.path.join(output_dir, "quality_reports"), batch_id
            )
        # same replay guard for the quarantine — applied after the
        # near-dup union so re-detected near-duplicates of a replayed
        # batch don't duplicate their existing quarantine rows either
        quar_path = os.path.join(output_dir, "quarantine")
        if os.path.exists(quar_path):
            rejected = rejected.join(
                _prior_ids(spark, quar_path, batch_id, rejected),
                "doc_id",
                "left_anti",
            )
        if rejected.limit(1).count():
            _idempotent_write(
                rejected.withColumn("__bucket", _doc_bucket("doc_id")),
                os.path.join(output_dir, "quarantine"),
                batch_id,
                "__bucket",
            )
    finally:
        for df in to_unpersist:
            df.unpersist()


def stream_corpus_ingest(
    spark: SparkSession,
    landing_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    min_words: int = 5,
    max_rep_ratio: float = 0.9,
    watermark: str = "1 hour",
    near_dup_threshold: float | None = None,
    maintain_text_index: bool = False,
    maintain_ivf_index: bool = False,
    maintain_pq_index: bool = False,
    maintain_winnow_index: bool = False,
    maintain_profile: bool = False,
    maintain_freq_sketch: bool = False,
    validate_constraints: list | None = None,
    available_now: bool = True,
):
    """Drain ``landing_dir`` (json docs with an ``event_ts``) into
    ``output_dir/accepted`` + ``output_dir/quarantine`` with online
    exact-dedup and quality gating. ``available_now`` processes what is
    present and stops (test/batch-drain mode).

    ``near_dup_threshold`` additionally enables ONLINE NEAR-dedup: each
    batch probes the growing MinHash index at ``output_dir/minhash_idx``
    (band buckets + bucket-partitioned shingle sets, llm/dedup.py),
    quarantines docs whose Jaccard against any earlier-accepted doc (or
    a lower-id batchmate) reaches the threshold, and appends the
    survivors' LSH state to the index — the corpus is never
    re-shingled, and verification reads only the candidate docs'
    shingle buckets (see module docstring), so per-batch cost tracks
    the batch, not the corpus.

    ``maintain_text_index`` additionally keeps the BM25 inverted index
    at ``output_dir/text_idx`` current: each batch's accepted docs are
    indexed with batch-scoped idempotent writes
    (llm/clean.update_text_index_batch), so ``text_index_search`` over
    the index matches a from-scratch build over ``accepted`` after
    every micro-batch (tested). ``maintain_ivf_index`` does the same
    for the dense side at ``output_dir/ivf_idx``: accepted docs are
    hash-trick embedded and appended to a frozen-centroid IVF index
    (first batch seeds the centroids), so `ivf_search` works over the
    growing corpus without a rebuild. ``validate_constraints``
    (operators/validate.py constraint objects) appends a per-batch
    admission report to ``output_dir/quality_reports`` — the streaming
    form of the deequ-style batch gate. ``maintain_winnow_index`` keeps a
    winnowed-fingerprint (MOSS) index at ``output_dir/winnow_idx``
    (llm/winnow.build_winnow_index layout) so substring-overlap probes
    (winnow_index_probe) run against the growing corpus without
    re-fingerprinting it. ``maintain_profile`` keeps a
    MERGEABLE length-quantile profile at ``output_dir/length_profile``
    (operators/skew.quantile_state rows per batch); read it with
    ``read_length_profile``. ``maintain_freq_sketch`` keeps a mergeable
    per-source word-frequency count-min state at
    ``output_dir/freq_sketch`` (operators/skew.cms_state rows per
    batch); read it with ``read_freq_sketch`` and probe with
    ``cms_estimate`` — point word/n-gram frequencies over any batch
    window without rescanning the corpus."""
    raw = spark.readStream.schema(DOC_SCHEMA).json(landing_dir)
    hashed = raw.withColumn("content_hash", F.md5(F.col("text")))
    deduped = hashed.withWatermark("event_ts", watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )
    scored = quality_columns(deduped)
    keep = (F.col("n_words") >= min_words) & (
        F.col("word_rep_ratio") <= max_rep_ratio
    )
    reason = (
        F.when(F.col("n_words") < min_words, F.lit("too_short"))
        .when(F.col("word_rep_ratio") > max_rep_ratio, F.lit("repetitive"))
        .otherwise(F.lit(None).cast("string"))
    )
    tagged = scored.withColumn("reject_reason", reason)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        process_corpus_batch(
            spark,
            batch_df,
            batch_id,
            output_dir,
            keep,
            near_dup_threshold,
            maintain_text_index=maintain_text_index,
            maintain_ivf_index=maintain_ivf_index,
            maintain_pq_index=maintain_pq_index,
            maintain_winnow_index=maintain_winnow_index,
            maintain_profile=maintain_profile,
            maintain_freq_sketch=maintain_freq_sketch,
            validate_constraints=validate_constraints,
        )

    writer = (
        tagged.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="5 seconds").start()
