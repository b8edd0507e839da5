"""Structured Streaming ingest (SURVEY.md §2.10).

The reference's indexer loop (ordered heights, pipeline depth 3,
checkpoint after in-order commit — bin/start-indexer.js:45-79) maps to
a file-source stream over the raw-blocks landing zone:

* ordering/checkpointing: the streaming checkpoint directory replaces
  ``index_state`` (S13); ``foreachBatch`` commits whole micro-batches,
  and per-key ordering is recovered analytically with (height,
  msg_index) rather than by arrival (§7).
* effectively-once (ST2): within-batch key dedupe + anti-join against
  the already-written trades keys — replayed blocks are no-ops.
* derived state (prices, pool_state, ohlcv_1m) is recomputed per batch
  from the batch's trades and appended; readers aggregate per (pool,
  bucket) so duplicate minute rows merge at read (ST6), exactly the
  reference's semantics.
* a ``pair_created`` fast-track hook (ST7): new pools detected in a
  batch are handed to a driver-side callback (the event-bus analogue).

At scale the same topology runs from Kafka: swap ``readStream.json``
for ``readStream.format("kafka")`` + ``from_json``.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import blocks


def _read_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    if os.path.exists(path):
        try:
            return spark.read.parquet(path)
        except Exception:
            return None
    return None


def stream_ingest(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    checkpoint_dir: str,
    router_addr: str | None = None,
    on_pair_created: Callable[[list], None] | None = None,
    available_now: bool = True,
    maintain_partials: bool = False,
    hot_signer_threshold: int | None = None,
):
    """File-source streaming ingest; ``available_now`` drains the
    landing zone and stops (the batch-test mode); otherwise runs
    continuously with a processing-time trigger.

    ``maintain_partials=True`` additionally appends the matrix /
    leaderboard PARTIALS per micro-batch — per-(pool, minute) and
    per-(signer, minute) decomposed aggregates (plans/incremental.py),
    day-partitioned at ``output_dir/minute_partials`` and
    ``output_dir/signer_minute_partials``. This is the ingest-side
    alternative to the JobsRunner's CDC advancement: partials are one
    extra map-side aggregation over the batch's deduped trades (the
    ohlcv_1m write shape), rows for the same (key, minute) across
    batches MERGE AT READ (ST6 — trailing_volumes sums add, signer
    sets union), and effectively-once flows from the trades dedup
    itself (a replayed block contributes no new trades, hence no
    partial rows). ``hot_signer_threshold`` selects the dual signer
    layout (see minute_partials)."""
    raw = spark.readStream.schema(blocks.RAW_SCHEMA).json(input_path)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        pools_path = os.path.join(output_dir, "pools")
        existing_pools = _read_or_none(spark, pools_path)
        existing_trades = _read_or_none(spark, os.path.join(output_dir, "trades"))
        out = blocks.ingest(
            batch_df,
            existing_pools=existing_pools,
            existing_trades=existing_trades,
            router_addr=router_addr,
        )
        # three-phase order (§3.1): dims first, then facts, then derived
        new_pools = out["pools"].cache()
        new_pool_rows = new_pools.collect()  # dimension-sized
        if new_pool_rows:
            new_pools.write.mode("append").parquet(pools_path)
        trades_df = out["trades"]
        if maintain_partials:
            trades_df = trades_df.cache()  # feeds the fact write + 2 partials
        for name in ("trades", "prices", "pool_state", "ohlcv_1m"):
            df = trades_df if name == "trades" else out[name]
            if name == "trades":
                df = df.withColumn("dt", F.to_date("created_at"))
                df.write.mode("append").partitionBy("dt").parquet(
                    os.path.join(output_dir, name)
                )
            else:
                df.write.mode("append").parquet(os.path.join(output_dir, name))
        if maintain_partials:
            # guard the empty batch (a replay dedupes to zero trades):
            # an all-empty day-partitioned append writes only _SUCCESS
            # and breaks later reads of a fresh store
            if not trades_df.isEmpty():
                from ..plans import incremental as INC

                def _append(partials: DataFrame, name: str) -> None:
                    (
                        partials.withColumn("__day", F.to_date("minute"))
                        .repartition(F.col("__day"))
                        .write.mode("append")
                        .partitionBy("__day")
                        .parquet(os.path.join(output_dir, name))
                    )

                _append(
                    INC.minute_partials(
                        trades_df, hot_signer_threshold=hot_signer_threshold
                    ),
                    "minute_partials",
                )
                _append(
                    INC.signer_minute_partials(trades_df), "signer_minute_partials"
                )
            trades_df.unpersist()
        if on_pair_created and new_pool_rows:
            on_pair_created(new_pool_rows)  # ST7 fast-track trigger
        new_pools.unpersist()

    writer = (
        raw.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="2 seconds").start()


def read_output(spark: SparkSession, output_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(output_dir, name))
