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


def _batch_tag(checkpoint_dir: str, batch_id: int) -> str:
    """Deterministic per-(stream, batch) identity for partials rows.
    Stable across a replay of the same batch under the same checkpoint
    (Structured Streaming pins the batch's file set in the offset log,
    so the recomputed rows are identical), and distinct across
    checkpoint lifetimes: a fresh checkpoint restarts batch ids at 0,
    and without the checkpoint component batch 0 of the new stream
    would collide with batch 0 of the old one — the read-side replay
    dedupe would then collapse genuinely distinct rows."""
    import zlib

    norm = os.path.abspath(checkpoint_dir).rstrip("/")
    return f"{zlib.crc32(norm.encode()) & 0xFFFFFFFF:08x}:{batch_id}"


def _marker_paths(output_dir: str) -> tuple[str, str]:
    # brackets ALL derived appends of one micro-batch: prices,
    # pool_state, ohlcv_1m, and (when maintained) the partials +
    # large-trades stores
    return (
        os.path.join(output_dir, "_derived_batch.started"),
        os.path.join(output_dir, "_derived_batch.done"),
    )


def read_marker(path: str) -> str | None:
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return fh.read().strip() or None


def _write_marker(path: str, value: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(value)
    os.replace(tmp, path)


def unsafe_partials_tag(output_dir: str) -> str | None:
    """The one batch tag whose derived rows may still be RE-APPENDED
    by a crash replay: a batch whose appends ran but whose ``done``
    marker was never written (the started/done pair differs). Everything
    at or below ``done`` is settled — a replay of the done batch skips
    its appends entirely — so compaction may merge those rows; rows
    under the returned tag must be left untouched (and ohlcv_1m, whose
    replay identity lives in file NAMES, must not be rewritten at all
    while a tag is unsettled)."""
    started_p, done_p = _marker_paths(output_dir)
    started, done = read_marker(started_p), read_marker(done_p)
    return started if started is not None and started != done else None


def _day_partitioned_append(df: DataFrame, path: str, day_of: str) -> None:
    """Streaming append into ``__day=`` partition dirs (ADVICE r10:
    flat append-only stores force full-table compaction rewrites and
    collapse to single files — day partitioning makes the compact slot
    dirty-only and O(new data)). A pre-partitioned store (root-level
    data files) keeps its legacy flat layout: Spark cannot read a
    table mixing both. Replay duplicates remain read-absorbed
    (keep-latest views), exactly as with the flat layout. Holds the
    table writer lock like every streaming append."""
    import glob as _glob

    from ..operators.merge import _table_lock

    with _table_lock(path, timeout_s=300.0):
        if _glob.glob(os.path.join(path, "*.parquet")):
            df.write.mode("append").parquet(path)
            return
        (
            df.withColumn("__day", F.to_date(day_of))
            .repartition(F.col("__day"))
            .write.mode("append")
            .partitionBy("__day")
            .parquet(path)
        )


def _tagged_file_append(
    df: DataFrame, path: str, tag: str, day_of: str = "bucket_start"
) -> None:
    """Exactly-once append for a table whose reads SUM duplicate rows
    (ohlcv_1m: resample adds volume/trade_count — a replay duplicate
    double-counts, a lost append under-counts forever). The batch
    identity lives in the FILE NAMES (``part-<tag>-<i>``), so a
    crashed attempt's files are unlinked before the rewrite and the
    reader schema never changes. Holds the table writer lock like
    every other streaming append.

    Files land in ``__day=`` partition dirs (from ``day_of``) like
    every other streamed store, so the hourly compact slot rewrites
    only dirty days instead of the whole table (ADVICE r10 — the
    unpartitioned layout made ohlcv compaction O(table age) forever)
    and day-bounded reads prune at planning time. The replay unlink
    globs recursively: it removes a crashed attempt's files in
    whichever days that batch touched (and root-level files from a
    pre-partitioned store)."""
    import glob
    import shutil

    from ..operators.merge import _table_lock

    safe = tag.replace(":", "-")
    os.makedirs(path, exist_ok=True)
    with _table_lock(path, timeout_s=300.0):
        for f in glob.glob(
            os.path.join(path, "**", f"part-{safe}-*"), recursive=True
        ):
            os.remove(f)  # crashed prior attempt of this same batch
        tmp = os.path.join(path, f"._batch_{safe}")  # dot-dir: invisible
        if glob.glob(os.path.join(path, "*.parquet")):
            # pre-partitioned store (root-level data files): keep the
            # legacy flat layout — Spark cannot read a table mixing
            # root files with partition dirs; migrate by draining +
            # rebuilding the store
            df.write.mode("overwrite").parquet(tmp)
            files = sorted(glob.glob(os.path.join(tmp, "*.parquet")))
            for i, f in enumerate(files):
                os.replace(
                    f, os.path.join(path, f"part-{safe}-{i}.snappy.parquet")
                )
            shutil.rmtree(tmp, ignore_errors=True)
            return
        (
            df.withColumn("__day", F.to_date(day_of))
            .repartition(F.col("__day"))
            .write.mode("overwrite")
            .partitionBy("__day")
            .parquet(tmp)
        )
        i = 0
        for day_dir in sorted(glob.glob(os.path.join(tmp, "__day=*"))):
            dest = os.path.join(path, os.path.basename(day_dir))
            os.makedirs(dest, exist_ok=True)
            for f in sorted(glob.glob(os.path.join(day_dir, "*.parquet"))):
                os.replace(
                    f, os.path.join(dest, f"part-{safe}-{i}.snappy.parquet")
                )
                i += 1
        shutil.rmtree(tmp, ignore_errors=True)


def maintain_partials_for_batch(
    trades_df: DataFrame,
    output_dir: str,
    tag: str,
    hot_signer_threshold: int | None = None,
    large_trade_min_zig: float = 1000.0,
) -> None:
    """Append one micro-batch's matrix/leaderboard partials and
    large-trade rows, tagged ``__batch = tag``, day-partitioned.

    Effectively-once protocol (ADVICE r9 — the old order appended
    partials AFTER the fact table, so a crash in between dropped them
    forever: the replay dedupes trades to empty and skips the append):

    1. these appends run BEFORE the trades append — a replay of a
       crashed batch recomputes the identical deduped trades and
       re-runs them;
    2. ``started``/``done`` markers bracket the appends: a replay of a
       batch whose ``done`` marker exists skips them (its rows are
       already durable even though the trades append may not be);
    3. a crash between the appends and the ``done`` marker re-appends
       the same rows under the SAME tag — the trailing merges collapse
       duplicates per (group, minute, __batch)
       (plans/incremental.dedupe_replayed_partials), and the
       large-trades read's keep-latest dedupe (W1) absorbs its
       duplicates keylessly.

    Each store append holds the table's advisory writer lock so the
    JobsRunner's compaction pass (a read-rewrite-swap) can never drop
    an in-flight append; on an object store the lock becomes the
    manifest commit (operators/merge._table_lock)."""
    from ..operators.merge import _table_lock
    from ..plans import incremental as INC
    from ..plans import leaderboards as LB

    def _append_day_partitioned(df: DataFrame, name: str, day_of: str) -> None:
        path = os.path.join(output_dir, name)
        out = (
            df.withColumn("__day", F.to_date(day_of))
            .repartition(F.col("__day"))
        )
        with _table_lock(path, timeout_s=300.0):
            out.write.mode("append").partitionBy("__day").parquet(path)

    _append_day_partitioned(
        INC.minute_partials(
            trades_df, hot_signer_threshold=hot_signer_threshold
        ).withColumn("__batch", F.lit(tag)),
        "minute_partials",
        "minute",
    )
    _append_day_partitioned(
        INC.signer_minute_partials(trades_df).withColumn("__batch", F.lit(tag)),
        "signer_minute_partials",
        "minute",
    )
    big = LB.large_trades_all(trades_df, large_trade_min_zig)
    # an all-empty day-partitioned append writes only _SUCCESS and
    # breaks later reads of a fresh store — and most batches carry no
    # large trades at all
    if not big.isEmpty():
        _append_day_partitioned(big, "large_trades_store", "created_at")


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
    large_trade_min_zig: float = 1000.0,
):
    """File-source streaming ingest; ``available_now`` drains the
    landing zone and stops (the batch-test mode); otherwise runs
    continuously with a processing-time trigger.

    ``maintain_partials=True`` additionally appends the matrix /
    leaderboard PARTIALS and the large-trades store per micro-batch —
    per-(pool, minute) and per-(signer, minute) decomposed aggregates
    (plans/incremental.py) plus qualifying large-trade rows,
    day-partitioned at ``output_dir/minute_partials``,
    ``output_dir/signer_minute_partials`` and
    ``output_dir/large_trades_store``. This is the ingest-side
    alternative to the JobsRunner's CDC advancement
    (``JobsRunner(partials_source="store")`` consumes these directly):
    partials are one extra map-side aggregation over the batch's
    deduped trades (the ohlcv_1m write shape), rows for the same
    (key, minute) across batches MERGE AT READ (ST6 —
    trailing_volumes sums add, signer sets union). Effectively-once is
    the ``maintain_partials_for_batch`` protocol (ADVICE r9): partials
    append BEFORE the fact table under started/done markers with a
    per-batch ``__batch`` tag, so neither crash side loses or
    double-counts rows. ``hot_signer_threshold`` selects the dual
    signer layout (see minute_partials);
    ``large_trade_min_zig`` is the store threshold
    (jobs/leaderboards.js:6)."""
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
        # three-phase order (§3.1): dims first, then EVERY derived
        # output (prices, pool_state, ohlcv_1m, partials, large
        # trades), then the fact table LAST. Derived rows are only
        # recomputable while the batch's trades are still un-appended
        # (a replay dedupes committed trades to empty), so the old
        # facts-then-derived order permanently lost any derived append
        # a crash preempted (ADVICE r9) — ohlcv_1m under-counting
        # volume forever, the same class as the partials finding.
        # Derived-first + the started/done marker bracket makes each
        # crash side recoverable: a replay of a done batch skips the
        # derived appends (already durable) and lands only the facts;
        # a replay of an un-done batch recomputes identical rows whose
        # duplicates every reader absorbs (keep-latest for prices/
        # pool_state, file-tag idempotence for ohlcv_1m, per-(group,
        # minute, __batch) dedupe for the partials).
        from ..operators.merge import _table_lock

        new_pools = out["pools"].cache()
        new_pool_rows = new_pools.collect()  # dimension-sized
        if new_pool_rows:
            # every output-table append holds the table writer lock so
            # the JobsRunner's compaction rewrite (read -> temp ->
            # swap under the same lock) can never drop it
            with _table_lock(pools_path, timeout_s=300.0):
                new_pools.write.mode("append").parquet(pools_path)
        trades_df = out["trades"].cache()  # feeds derived + fact writes
        if not trades_df.isEmpty():
            tag = _batch_tag(checkpoint_dir, batch_id)
            started_p, done_p = _marker_paths(output_dir)
            if read_marker(done_p) != tag:
                _write_marker(started_p, tag)
                for name in ("prices", "pool_state"):
                    _day_partitioned_append(
                        out[name], os.path.join(output_dir, name), "updated_at"
                    )
                _tagged_file_append(
                    out["ohlcv_1m"], os.path.join(output_dir, "ohlcv_1m"), tag
                )
                if maintain_partials:
                    maintain_partials_for_batch(
                        trades_df, output_dir, tag,
                        hot_signer_threshold=hot_signer_threshold,
                        large_trade_min_zig=large_trade_min_zig,
                    )
                _write_marker(done_p, tag)
            trades_path = os.path.join(output_dir, "trades")
            with _table_lock(trades_path, timeout_s=300.0):
                (
                    trades_df.withColumn("dt", F.to_date("created_at"))
                    .write.mode("append")
                    .partitionBy("dt")
                    .parquet(trades_path)
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
