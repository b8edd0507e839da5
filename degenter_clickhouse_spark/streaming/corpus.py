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

Restart safety comes from the checkpoint directory, exactly like the
trade indexer (S13/ST2).
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


def stream_corpus_ingest(
    spark: SparkSession,
    landing_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    min_words: int = 5,
    max_rep_ratio: float = 0.9,
    watermark: str = "1 hour",
    near_dup_threshold: float | None = None,
    available_now: bool = True,
):
    """Drain ``landing_dir`` (json docs with an ``event_ts``) into
    ``output_dir/accepted`` + ``output_dir/quarantine`` with online
    exact-dedup and quality gating. ``available_now`` processes what is
    present and stops (test/batch-drain mode).

    ``near_dup_threshold`` additionally enables ONLINE NEAR-dedup: each
    batch probes the growing MinHash index at ``output_dir/minhash_idx``
    (band buckets + shingle sets, llm/dedup.py), quarantines docs whose
    Jaccard against any earlier-accepted doc (or a lower-id batchmate)
    reaches the threshold, and appends the survivors' LSH state to the
    index — the corpus is never re-shingled, so per-batch cost tracks
    the batch, not the corpus."""
    from ..llm import dedup as D

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
    idx_dir = os.path.join(output_dir, "minhash_idx")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.cache()
        try:
            accepted = batch_df.filter(keep).drop("reject_reason")
            rejected = batch_df.filter(~keep)
            if near_dup_threshold is not None:
                accepted = accepted.cache()
                sh = D._minhash_shingles(accepted)
                bands = D._minhash_bands(sh)
                if os.path.exists(os.path.join(idx_dir, "bands")):
                    idx_bands = spark.read.parquet(os.path.join(idx_dir, "bands"))
                    idx_sh = spark.read.parquet(os.path.join(idx_dir, "shingles"))
                    all_bands = idx_bands.unionByName(bands)
                    all_sh = idx_sh.unionByName(sh)
                else:  # first batch: only batchmates can collide
                    all_bands, all_sh = bands, sh
                a, b = bands.alias("a"), all_bands.alias("b")
                cand = (
                    a.join(
                        b,
                        (F.col("a.band") == F.col("b.band"))
                        & (F.col("a.key") == F.col("b.key"))
                        # keep the EARLIER doc: a batch doc is dropped if
                        # it near-dups the index or a lower-id batchmate
                        & (F.col("a.d") > F.col("b.d")),
                    )
                    .select(F.col("a.d").alias("d2"), F.col("b.d").alias("d1"))
                    .distinct()
                )
                dup_ids = (
                    D._verify_jaccard(cand, all_sh, near_dup_threshold)
                    .select(F.col("d2").alias("doc_id"))
                    .distinct()
                    .cache()
                )
                near = accepted.join(dup_ids, "doc_id", "left_semi").withColumn(
                    "reject_reason", F.lit("near_duplicate")
                )
                accepted = accepted.join(dup_ids, "doc_id", "left_anti")
                rejected = rejected.unionByName(near, allowMissingColumns=True)
                surv = dup_ids.withColumnRenamed("doc_id", "d")
                sh.join(surv, "d", "left_anti").write.mode("append").parquet(
                    os.path.join(idx_dir, "shingles")
                )
                bands.join(surv, "d", "left_anti").write.mode("append").partitionBy(
                    "band"
                ).parquet(os.path.join(idx_dir, "bands"))
            accepted.write.mode("append").parquet(
                os.path.join(output_dir, "accepted")
            )
            if rejected.limit(1).count():
                rejected.write.mode("append").parquet(
                    os.path.join(output_dir, "quarantine")
                )
        finally:
            batch_df.unpersist()

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
