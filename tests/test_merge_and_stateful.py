"""S11 conditional merge, B14 token-metadata merge, S9 snapshot
overwrite sink, and the ST5 stateful streaming carried-open operator
(cross-run state via the state store)."""

from __future__ import annotations

import json
from datetime import datetime

from pyspark.sql import functions as F

from degenter_clickhouse_spark.operators import merge as M
from degenter_clickhouse_spark.session import ship_package


def test_conditional_merge_field_rules(spark):
    current = spark.createDataFrame(
        [(1, "Alpha", "ALPHA", 6), (2, None, None, None)],
        "token_id long, name string, symbol string, exponent int",
    )
    updates = spark.createDataFrame(
        [
            (1, "", "ALPHA2", None),  # empty name ignored, symbol wins
            (2, "Beta", "", 8),  # fills the NULL row, empty symbol ignored
            (3, "Gamma", "GAMMA", 0),  # brand-new key inserted
        ],
        "token_id long, name string, symbol string, exponent int",
    )
    out = {
        r.token_id: r
        for r in M.conditional_merge(
            current, updates, keys=["token_id"], merge_cols=["name", "symbol", "exponent"]
        ).collect()
    }
    assert out[1].name == "Alpha" and out[1].symbol == "ALPHA2" and out[1].exponent == 6
    assert out[2].name == "Beta" and out[2].symbol is None and out[2].exponent == 8
    assert out[3].name == "Gamma" and out[3].exponent == 0


def test_snapshot_overwrite_replaces_only_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "holders")
    v1 = spark.createDataFrame(
        [(1, "a", 100), (1, "b", 50), (2, "c", 70)],
        "token_id long, address string, balance long",
    )
    M.snapshot_overwrite(v1, path)
    v2 = spark.createDataFrame(
        [(1, "a", 120)], "token_id long, address string, balance long"
    )
    M.snapshot_overwrite(v2, path)  # refresh token 1 only
    got = spark.read.parquet(path).collect()
    by_tok = {}
    for r in got:
        by_tok.setdefault(r.token_id, []).append(r)
    assert len(by_tok[1]) == 1 and by_tok[1][0].balance == 120
    assert len(by_tok[2]) == 1 and by_tok[2][0].balance == 70  # untouched


def _write_bars(path, rows):
    payload = [
        json.dumps(
            {
                "pool_id": p,
                "bucket_start": b,
                "open": o,
                "high": h,
                "low": lo,
                "close": c,
                "volume_zig": v,
                "trade_count": n,
            }
        )
        for (p, b, o, h, lo, c, v, n) in rows
    ]
    path.write_text("\n".join(payload))


def test_upsert_write_parquet_roundtrip(spark, tmp_path):
    """S10/S11 seam: keyed upsert into a parquet table — updated keys
    replaced, new keys inserted, untouched keys survive; first write
    creates the table."""
    import pytest

    path = str(tmp_path / "tokens")
    t0 = spark.createDataFrame(
        [(1, "alpha", 6), (2, "beta", 6), (3, "gamma", 8)],
        "token_id long, name string, exponent int",
    )
    M.upsert_write(spark, t0, path, keys=["token_id"])  # creates
    upd = spark.createDataFrame(
        [(2, "BETA2", 12), (9, "new", 6)],
        "token_id long, name string, exponent int",
    )
    M.upsert_write(spark, upd, path, keys=["token_id"])
    got = {r.token_id: r for r in spark.read.parquet(path).collect()}
    assert set(got) == {1, 2, 3, 9}
    assert got[1].name == "alpha"  # untouched key survives
    assert got[2].name == "BETA2" and got[2].exponent == 12  # replaced
    assert got[9].name == "new"  # inserted
    # the Delta swap-in path fails loudly when delta-spark is absent
    with pytest.raises(Exception):
        M.upsert_write(spark, upd, path, keys=["token_id"], fmt="delta")
    with pytest.raises(ValueError):
        M.upsert_write(spark, upd, path, keys=["token_id"], fmt="orc")


def test_stateful_carried_open_across_restarts(spark, tmp_path):
    from degenter_clickhouse_spark.streaming import stateful

    ship_package(spark)
    landing = tmp_path / "bars"
    landing.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    schema = (
        "pool_id long, bucket_start timestamp, open double, high double, "
        "low double, close double, volume_zig double, trade_count long"
    )
    _write_bars(
        landing / "b1.json",
        [
            (1, "2024-05-01 10:00:00", 10.0, 12.0, 9.0, 11.0, 5.0, 3),
            (1, "2024-05-01 10:01:00", 11.5, 13.0, 11.0, 12.5, 2.0, 1),
            (2, "2024-05-01 10:00:00", 100.0, 100.0, 100.0, 100.0, 1.0, 1),
        ],
    )

    def run():
        stream = spark.readStream.schema(schema).json(str(landing))
        carried = stateful.carried_open_stream(stream)
        q = (
            carried.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    first = {(r.pool_id, r.bucket_start): r for r in spark.read.parquet(out_dir).collect()}
    k1, k2 = (1, datetime(2024, 5, 1, 10, 0)), (1, datetime(2024, 5, 1, 10, 1))
    assert first[k1].open == 10.0  # no prior state: own open
    assert first[k2].open == 11.0  # carried from previous close
    # restart with new data: state must survive via the state store
    _write_bars(
        landing / "b2.json",
        [(1, "2024-05-01 10:02:00", 99.0, 99.0, 12.0, 12.8, 1.0, 1)],
    )
    run()
    rows = {(r.pool_id, r.bucket_start): r for r in spark.read.parquet(out_dir).collect()}
    k3 = (1, datetime(2024, 5, 1, 10, 2))
    # opens at batch-1's last close (12.5), not its own stored open —
    # and that carried open may escape [low, high] (reference semantics)
    assert rows[k3].open == 12.5


def test_streaming_corpus_ingest_dedup_and_gate(spark, tmp_path):
    """Streaming corpus ingestion: exact dupes inside the watermark are
    dropped across micro-batches AND across a restart from checkpoint;
    quality rejects land in quarantine with a reason."""
    import json as _json
    import os

    from degenter_clickhouse_spark.streaming.corpus import stream_corpus_ingest

    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def doc(i, text, ts="2024-01-01 10:00:00"):
        return {"doc_id": i, "text": text, "lang": "en", "source": "src0",
                "n_chars": len(text), "event_ts": ts}

    good = "the quick brown fox jumps over the lazy dog again and again"
    (landing / "b1.json").write_text("\n".join(_json.dumps(d) for d in [
        doc(1, good),
        doc(2, good),                      # exact dupe of 1 -> dropped
        doc(3, "hi"),                      # too short -> quarantine
        doc(4, " ".join(["spam"] * 12)),     # rep ratio 11/12 -> gated
    ]))
    stream_corpus_ingest(spark, str(landing), out, ckpt)
    acc = spark.read.parquet(os.path.join(out, "accepted"))
    assert [r.doc_id for r in acc.collect()] == [1]
    quar = spark.read.parquet(os.path.join(out, "quarantine"))
    reasons = {r.doc_id: r.reject_reason for r in quar.collect()}
    assert reasons == {3: "too_short", 4: "repetitive"}

    # second drain (fresh file, same checkpoint): the dupe of doc 1 is
    # still remembered by the dedupe state; the new doc lands
    (landing / "b2.json").write_text("\n".join(_json.dumps(d) for d in [
        doc(5, good, ts="2024-01-01 10:30:00"),      # dupe within watermark
        doc(6, good + " but different now", ts="2024-01-01 10:30:00"),
    ]))
    stream_corpus_ingest(spark, str(landing), out, ckpt)
    acc2 = sorted(r.doc_id for r in spark.read.parquet(
        os.path.join(out, "accepted")).collect())
    assert acc2 == [1, 6]


def test_compact_table_reduces_files_preserves_data(spark, tmp_path):
    """Many small appended files collapse to files_per_partition per
    dt partition with identical row content."""
    from pyspark.sql import functions as F

    from degenter_clickhouse_spark.operators.merge import compact_table

    path = str(tmp_path / "facts")
    for batch in range(5):  # 5 appends x 4 tasks -> many small files
        spark.range(batch * 100, batch * 100 + 100).repartition(4).select(
            F.col("id"),
            F.to_date(
                F.concat(F.lit("2024-03-0"), ((F.col("id") % 2) + 1).cast("string"))
            ).alias("dt"),
        ).write.mode("append").partitionBy("dt").parquet(path)
    before_rows = spark.read.parquet(path).count()
    stats = compact_table(spark, path, partition_col="dt", files_per_partition=1)
    assert stats["files_before"] >= 20
    assert stats["files_after"] == 2  # one file per dt partition
    after = spark.read.parquet(path)
    assert after.count() == before_rows == 500
    assert after.select(F.countDistinct("id")).collect()[0][0] == 500


def _corpus_doc(i, text, ts="2024-01-01 10:00:00"):
    return {"doc_id": i, "text": text, "lang": "en", "source": "src0",
            "n_chars": len(text), "event_ts": ts}


def _tagged_batch(spark, docs, min_words=5, max_rep_ratio=0.9):
    """Build a frame shaped like the stream hands foreachBatch (doc
    schema + content_hash + quality columns + reject_reason) plus the
    matching keep predicate."""
    from datetime import datetime

    from degenter_clickhouse_spark.streaming import corpus as C

    rows = [
        {**d, "event_ts": datetime.fromisoformat(d["event_ts"])} for d in docs
    ]
    df = spark.createDataFrame(rows, C.DOC_SCHEMA)
    df = C.quality_columns(df.withColumn("content_hash", F.md5(F.col("text"))))
    keep = (F.col("n_words") >= min_words) & (F.col("word_rep_ratio") <= max_rep_ratio)
    reason = (
        F.when(F.col("n_words") < min_words, F.lit("too_short"))
        .when(F.col("word_rep_ratio") > max_rep_ratio, F.lit("repetitive"))
        .otherwise(F.lit(None).cast("string"))
    )
    return df.withColumn("reject_reason", reason), keep


def test_streaming_near_dedup_nonmonotonic_ids(spark, tmp_path):
    """A new doc whose id is LOWER than an already-indexed near-dup
    must still be quarantined: index collisions drop the new doc
    regardless of id order (ids need not arrive monotonically)."""
    import json as _json
    import os

    from degenter_clickhouse_spark.streaming.corpus import stream_corpus_ingest

    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    base = ("the quick brown fox jumps over the lazy dog while the calm cat "
            "watches the bright moon rise above the quiet hills tonight")
    (landing / "b1.json").write_text(_json.dumps(_corpus_doc(100, base)))
    stream_corpus_ingest(spark, str(landing), out, ckpt, near_dup_threshold=0.5)
    (landing / "b2.json").write_text("\n".join([
        _json.dumps(_corpus_doc(50, base.replace("lazy", "sleepy"),
                                ts="2024-01-01 10:10:00")),
        _json.dumps(_corpus_doc(60, "entirely different sentence about spark "
                                    "adaptive shuffle partition planning",
                                ts="2024-01-01 10:10:00")),
    ]))
    stream_corpus_ingest(spark, str(landing), out, ckpt, near_dup_threshold=0.5)
    acc = sorted(r.doc_id for r in spark.read.parquet(
        os.path.join(out, "accepted")).collect())
    assert acc == [60, 100]
    quar = {r.doc_id: r.reject_reason for r in spark.read.parquet(
        os.path.join(out, "quarantine")).collect()}
    assert quar == {50: "near_duplicate"}
    idx_docs = {r.d for r in spark.read.parquet(
        os.path.join(out, "minhash_idx", "shingles")).collect()}
    assert idx_docs == {60, 100}


def test_corpus_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running the same (batch_df,
    batch_id) — a crash-replay — must not duplicate rows in accepted,
    quarantine, or the LSH index (batch-scoped partition overwrite)."""
    import os

    from degenter_clickhouse_spark.streaming.corpus import process_corpus_batch

    out = str(tmp_path / "out")
    base = ("the quick brown fox jumps over the lazy dog while the calm cat "
            "watches the bright moon rise above the quiet hills tonight")
    tagged, keep = _tagged_batch(spark, [
        _corpus_doc(1, base),
        _corpus_doc(2, base.replace("quick", "swift")),  # near-dup of 1
        _corpus_doc(3, "hi"),                            # too short
    ])
    for _ in range(2):  # second run simulates the crash-replay
        process_corpus_batch(spark, tagged, 0, out, keep, 0.5)
    acc = [r.doc_id for r in spark.read.parquet(os.path.join(out, "accepted")).collect()]
    assert sorted(acc) == [1]
    quar = [(r.doc_id, r.reject_reason) for r in spark.read.parquet(
        os.path.join(out, "quarantine")).collect()]
    assert sorted(quar) == [(2, "near_duplicate"), (3, "too_short")]
    sh = spark.read.parquet(os.path.join(out, "minhash_idx", "shingles"))
    assert [r.d for r in sh.collect()] == [1]  # exactly one row, once


def test_streaming_near_dedup_verify_read_is_bucket_pruned(spark, tmp_path):
    """Verification reads only the candidate docs' shingle buckets,
    not the whole persisted index: with an index of several docs spread
    over multiple buckets, a single-candidate probe must surface fewer
    index docs than the corpus holds; no candidates reads nothing."""
    import os

    from degenter_clickhouse_spark.streaming import corpus as C
    from degenter_clickhouse_spark.streaming.corpus import process_corpus_batch

    out = str(tmp_path / "out")
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "one two three four five six seven eight nine",
        "red orange yellow green blue indigo violet colors",
        "spark shuffles partitions across many executor nodes",
        "rivers flow down mountains into the wide sea",
        "planets orbit stars inside spiral galaxy arms",
    ]
    tagged, keep = _tagged_batch(
        spark, [_corpus_doc(i + 1, t) for i, t in enumerate(texts)]
    )
    process_corpus_batch(spark, tagged, 0, out, keep, 0.5)
    idx_dir = os.path.join(out, "minhash_idx")
    sh = spark.read.parquet(os.path.join(idx_dir, "shingles"))
    n_index_docs = sh.select("d").distinct().count()
    assert n_index_docs == 6
    # precondition (deterministic): the six docs span more than one bucket
    n_buckets = sh.select("__bucket").distinct().count()
    assert n_buckets >= 2
    # a probe with one candidate (index doc 3) reads only 3's bucket
    cand = spark.createDataFrame([(100, 3)], "d2 long, d1 long")
    pruned = C.candidate_index_shingles(spark, idx_dir, cand)
    pruned_docs = {r.d for r in pruned.select("d").distinct().collect()}
    assert 3 in pruned_docs
    assert len(pruned_docs) < n_index_docs
    # and zero candidates skips the index read entirely
    empty = spark.createDataFrame([], "d2 long, d1 long")
    assert C.candidate_index_shingles(spark, idx_dir, empty) is None


def _delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def test_upsert_write_delta_seam_contract(spark, tmp_path):
    """The fmt='delta' adapter seam (S10/S11 under concurrent writers,
    reference semantics core/tokens.js:387-415). The transactional
    story TESTED in this repo is operators/versioned.py (11 tests);
    delta-spark is not installable here (no pip/network/jars), so this
    asserts the seam's CONTRACT in both environments instead of
    skipping: without delta-spark the branch must fail fast with the
    documented actionable error BEFORE touching the table; with it,
    the MERGE must upsert like the parquet path."""
    path = str(tmp_path / "tokens_delta")
    upd = spark.createDataFrame(
        [(2, "BETA2", 12), (9, "new", 6)], "token_id long, name string, exponent int"
    )
    if not _delta_available():
        import pytest

        with pytest.raises(RuntimeError, match="delta-spark"):
            M.upsert_write(spark, upd, path, keys=["token_id"], fmt="delta")
        assert not (tmp_path / "tokens_delta").exists()  # fail-fast, no debris
        return
    t0 = spark.createDataFrame(
        [(1, "alpha", 6), (2, "beta", 6)], "token_id long, name string, exponent int"
    )
    t0.write.format("delta").save(path)
    M.upsert_write(spark, upd, path, keys=["token_id"], fmt="delta")
    got = {r.token_id: r for r in spark.read.format("delta").load(path).collect()}
    assert set(got) == {1, 2, 9}
    assert got[2].name == "BETA2" and got[9].name == "new" and got[1].name == "alpha"


def test_compact_table_swap_recovers_from_stale_old_copy(spark, tmp_path):
    """The compaction swap renames the live table aside before
    promoting the compacted copy (no instant with zero copies on disk);
    a leftover ._old dir from a crash after promotion must not block
    the next compaction."""
    path = str(tmp_path / "t")
    spark.range(0, 100).write.mode("append").parquet(path)
    spark.range(100, 200).write.mode("append").parquet(path)
    # simulate debris from a crash between promote and cleanup
    spark.range(0, 5).write.parquet(path + "._old")
    stats = M.compact_table(spark, path, partition_col=None, files_per_partition=1)
    assert stats["files_after"] <= stats["files_before"]
    import os

    assert not os.path.exists(path + "._old")
    assert spark.read.parquet(path).count() == 200


def test_leaf_swap_temps_invisible_to_readers(spark, tmp_path):
    """ADVICE r11: the per-leaf compaction temp/backup dirs must be
    invisible to Spark's file index and to leaf_parquet_dirs. The
    dot-prefixed names are (proven empirically against the running
    Spark: a planted ``.__day=...._old`` full of parquet adds zero
    rows), while the pre-r12 ``=``-without-dot names were counted as
    data partitions — readers saw both copies during a swap and a
    crash left a permanent phantom partition."""
    import os
    import shutil

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("2024-03-01", i) for i in range(10)]
        + [("2024-03-02", i) for i in range(10)],
        "d string, v long",
    ).withColumn("__day", F.to_date("d")).drop("d")
    df.repartition(1).write.partitionBy("__day").parquet(path)
    live = os.path.join(path, "__day=2024-03-01")

    # plant a dot-prefixed backup holding a full copy of one leaf —
    # exactly the state mid-swap / after a crashed swap
    tmp_name, old_name = M._leaf_swap_paths(live)
    assert "=" in os.path.basename(old_name)  # name keeps the '='...
    assert os.path.basename(old_name).startswith(".")  # ...behind a dot
    shutil.copytree(live, old_name)
    assert spark.read.parquet(path).count() == 20  # Spark skips it
    leaves = M.leaf_parquet_dirs(path)
    assert old_name not in leaves and set(leaves) == {
        live, os.path.join(path, "__day=2024-03-02")
    }
    assert M.excess_file_count(path, 1) == 0  # gate can't loop on it
    shutil.rmtree(old_name)

    # the PRE-r12 visible name: Spark reads it as a phantom partition
    # (this is the bug — documents why the dot prefix is load-bearing)
    shutil.copytree(live, live + "._old")
    assert spark.read.parquet(path).count() == 30
    shutil.rmtree(live + "._old")


def test_publish_atomic_readers_never_fail_under_republish(spark, tmp_path):
    """VERDICT r11 #2: the serving-table publish must be READER-atomic.
    Hammers serving_read (the publish's read seam: resolve the pointer
    to the immutable version dir, then scan) from concurrent threads
    through 100 republishes: zero read failures, and every read sees a
    COMPLETE version (the count is always one of the published sizes —
    never a torn/empty/ENOENT table, which the r11 dir swap could
    yield). Also: version dirs stay pruned, raw path reads keep
    working, and a legacy real-dir table migrates into the pointer
    layout."""
    import glob
    import os
    import threading

    path = str(tmp_path / "pool_matrix")
    # legacy layout: a real directory from a pre-pointer publish
    spark.range(0, 5).coalesce(1).write.parquet(path)
    assert not os.path.islink(path)
    M.publish_atomic(spark.range(0, 5).coalesce(1), path)
    assert os.path.islink(path)  # migrated to the pointer layout
    assert spark.read.parquet(path).count() == 5  # raw reads still work

    stop = threading.Event()
    errors: list[str] = []
    counts: list[int] = []

    def reader():
        while not stop.is_set():
            try:
                counts.append(M.serving_read(spark, path).count())
            except Exception as e:  # noqa: BLE001 — the assertion target
                errors.append(repr(e))
                return

    threads = [threading.Thread(target=reader) for _ in range(2)]
    for t in threads:
        t.start()
    try:
        for i in range(100):
            M.publish_atomic(spark.range(0, 5 + (i % 3)).coalesce(1), path)
    finally:
        stop.set()
        for t in threads:
            t.join()
    assert not errors, errors[:3]
    assert counts and all(c in (5, 6, 7) for c in counts), sorted(set(counts))
    # old versions pruned: current + keep_versions backups at most
    assert len(glob.glob(path + ".__v*")) <= 4
    assert spark.read.parquet(path).count() in (5, 6, 7)
    assert M.serving_read(spark, path).count() == spark.read.parquet(path).count()


def test_recover_leaf_leftovers_crash_states(spark, tmp_path):
    """Crash recovery for interrupted leaf swaps, all four states:
    backup with live leaf missing -> restored; backup + temp + live
    recreated by post-crash appends -> backup files merged in beside
    the appends; backup with completed swap -> deleted as duplicate;
    legacy ``=``-visible names from pre-r12 crashes -> same handling.
    compact_table/compact_partials_store run this under the table lock
    before every pass."""
    import os
    import shutil

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(f"2024-03-0{d}", i) for d in (1, 2, 3, 4) for i in range(6)],
        "d string, v long",
    ).withColumn("__day", F.to_date("d")).drop("d")
    df.repartition(1).write.partitionBy("__day").parquet(path)

    def leaf(d):
        return os.path.join(path, f"__day=2024-03-0{d}")

    # state 1: crash between the two renames — live gone, backup holds
    # the original data, temp holds the compacted rewrite
    tmp1, old1 = M._leaf_swap_paths(leaf(1))
    os.rename(leaf(1), old1)
    shutil.copytree(old1, tmp1)
    # state 2: same crash, but a streaming append recreated the leaf
    # with NEW rows before recovery ran -> merge, don't clobber
    tmp2, old2 = M._leaf_swap_paths(leaf(2))
    os.rename(leaf(2), old2)
    shutil.copytree(old2, tmp2)
    extra = spark.createDataFrame([(99,), (98,)], "v long")
    extra.coalesce(1).write.mode("append").parquet(leaf(2))
    # state 3: crash after the swap completed — backup is a duplicate
    _, old3 = M._leaf_swap_paths(leaf(3))
    shutil.copytree(leaf(3), old3)
    # state 4: legacy pre-r12 names for a missing leaf -> restored
    os.rename(leaf(4), leaf(4) + "._old")
    shutil.copytree(leaf(4) + "._old", leaf(4) + "._compacting")

    # removed = the state-3 duplicate backup + the three leftover temps
    got = M.recover_leaf_leftovers(path)
    assert got == {"restored": 2, "merged": 1, "removed": 4}
    assert spark.read.parquet(path).count() == 26  # 24 + the 2 appends
    assert (
        spark.read.parquet(path)
        .filter(F.col("__day") == "2024-03-02")
        .count()
        == 8
    )
    leftovers = [
        n for n in os.listdir(path)
        if n.endswith(("._old", "._compacting"))
    ]
    assert leftovers == []
    # idempotent and wired into the compact pass
    assert M.recover_leaf_leftovers(path) == {
        "restored": 0, "merged": 0, "removed": 0
    }
    stats = M.compact_table(
        spark, path, partition_col="__day", dirty_only=True
    )
    assert stats["files_after"] <= stats["files_before"]
    assert spark.read.parquet(path).count() == 26


def test_streaming_corpus_online_near_dedup(spark, tmp_path):
    """With near_dup_threshold set, each batch probes the growing
    MinHash index: a REWORDED near-duplicate (different content hash)
    of an earlier-accepted doc is quarantined as near_duplicate, and
    only survivors' LSH state joins the index."""
    import json as _json
    import os

    from degenter_clickhouse_spark.streaming.corpus import stream_corpus_ingest

    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def doc(i, text, ts="2024-01-01 10:00:00"):
        return {"doc_id": i, "text": text, "lang": "en", "source": "src0",
                "n_chars": len(text), "event_ts": ts}

    base = ("the quick brown fox jumps over the lazy dog while the calm cat "
            "watches the bright moon rise above the quiet hills tonight")
    distinct = ("completely different words about spark engines shuffling "
                "partitions across executors with adaptive query plans")
    (landing / "b1.json").write_text(_json.dumps(doc(1, base)))
    stream_corpus_ingest(spark, str(landing), out, ckpt, near_dup_threshold=0.5)
    # batch 2: a near-dup (one word changed -> same shingles mostly) + unrelated
    near = base.replace("lazy", "sleepy")
    (landing / "b2.json").write_text("\n".join([
        _json.dumps(doc(2, near, ts="2024-01-01 10:10:00")),
        _json.dumps(doc(3, distinct, ts="2024-01-01 10:10:00")),
    ]))
    stream_corpus_ingest(spark, str(landing), out, ckpt, near_dup_threshold=0.5)
    acc = sorted(r.doc_id for r in spark.read.parquet(
        os.path.join(out, "accepted")).collect())
    assert acc == [1, 3]
    quar = {r.doc_id: r.reject_reason for r in spark.read.parquet(
        os.path.join(out, "quarantine")).collect()}
    assert quar == {2: "near_duplicate"}
    # the dropped doc's LSH state never joined the index
    idx_docs = {r.d for r in spark.read.parquet(
        os.path.join(out, "minhash_idx", "shingles")).collect()}
    assert idx_docs == {1, 3}


def test_table_lock_serializes_writers(spark, tmp_path):
    """The parquet upsert path takes a per-table advisory lock: a held
    lock times out a second writer (instead of interleaving
    read-modify-swap and silently dropping one writer's rows), a
    released lock admits it, and a stale lock from a crashed holder is
    broken."""
    import os
    import threading
    import time

    import pytest

    path = str(tmp_path / "locked")
    t0 = spark.createDataFrame([(1, "a")], "token_id long, name string")
    M.upsert_write(spark, t0, path, keys=["token_id"])
    assert not os.path.exists(path + "._lock")  # released after write

    # contention: hold the lock, expect the writer to give up
    os.mkdir(path + "._lock")
    upd = spark.createDataFrame([(2, "b")], "token_id long, name string")
    with pytest.raises(M.TableLockTimeout):
        M.upsert_write(spark, upd, path, keys=["token_id"], lock_timeout_s=0.3)
    # release mid-wait: a delayed unlock lets the writer proceed
    t = threading.Timer(0.5, os.rmdir, args=(path + "._lock",))
    t.start()
    M.upsert_write(spark, upd, path, keys=["token_id"])
    t.join()
    assert {r.token_id for r in spark.read.parquet(path).collect()} == {1, 2}

    # stale lock (crashed holder): broken and the write proceeds
    os.mkdir(path + "._lock")
    old = time.time() - 7200
    os.utime(path + "._lock", (old, old))
    upd2 = spark.createDataFrame([(3, "c")], "token_id long, name string")
    M.upsert_write(spark, upd2, path, keys=["token_id"])
    assert {r.token_id for r in spark.read.parquet(path).collect()} == {1, 2, 3}


def test_streaming_maintained_text_index(spark, tmp_path):
    """maintain_text_index=True keeps the BM25 inverted index current
    across micro-batches: after each drain, text_index_search over the
    streaming-grown index is bit-equal to bm25_topk over the accepted
    corpus; replaying a drained landing dir (fresh checkpoint, same
    files) leaves the index unchanged; quarantined docs never index."""
    import json as _json
    import os

    from degenter_clickhouse_spark.llm.clean import bm25_topk, text_index_search
    from degenter_clickhouse_spark.streaming.corpus import stream_corpus_ingest

    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def doc(i, text, ts="2024-01-01 10:00:00"):
        return {"doc_id": i, "text": text, "lang": "en", "source": "src0",
                "n_chars": len(text), "event_ts": ts}

    t1 = "spark shuffles data across executors while the window merges rows"
    t2 = "merge joins and hash joins shuffle partitions in the spark engine"
    t3 = "short"  # below min_words: quarantined, must never index
    (landing / "b1.json").write_text(
        "\n".join([_json.dumps(doc(1, t1)), _json.dumps(doc(3, t3))])
    )
    stream_corpus_ingest(spark, str(landing), out, ckpt, maintain_text_index=True)
    idx = os.path.join(out, "text_idx")
    terms = ["spark", "merge", "shuffle"]

    def snap(df):
        return sorted(tuple(r) for r in df.collect())

    accepted = spark.read.parquet(os.path.join(out, "accepted")).select(
        "doc_id", "text"
    )
    assert snap(text_index_search(spark, idx, terms, k=10)) == snap(
        bm25_topk(accepted, terms, k=10)
    )
    assert {r.doc_id for r in accepted.collect()} == {1}
    # batch 2 grows the corpus AND the index
    (landing / "b2.json").write_text(
        _json.dumps(doc(2, t2, ts="2024-01-01 10:10:00"))
    )
    stream_corpus_ingest(spark, str(landing), out, ckpt, maintain_text_index=True)
    accepted2 = spark.read.parquet(os.path.join(out, "accepted")).select(
        "doc_id", "text"
    )
    want = snap(bm25_topk(accepted2, terms, k=10))
    assert snap(text_index_search(spark, idx, terms, k=10)) == want
    assert {r.doc_id for r in accepted2.collect()} == {1, 2}
    # full replay with a FRESH checkpoint (lost-checkpoint scenario):
    # batch-scoped overwrites + the cross-batch anti-join keep the
    # index identical
    stream_corpus_ingest(
        spark, str(landing), out, str(tmp_path / "ckpt2"),
        maintain_text_index=True,
    )
    assert snap(text_index_search(spark, idx, terms, k=10)) == want


def test_streaming_maintained_ivf_index(spark, tmp_path):
    """maintain_ivf_index=True embeds each batch's accepted docs
    (hash trick) and grows a frozen-centroid IVF index: every accepted
    doc is probe-able after its batch, replays add nothing, and
    quarantined docs never index."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    from degenter_clickhouse_spark.llm.similarity import hash_embed, ivf_search
    from degenter_clickhouse_spark.streaming.corpus import stream_corpus_ingest

    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def doc(i, text, ts="2024-01-01 10:00:00"):
        return {"doc_id": i, "text": text, "lang": "en", "source": "src0",
                "n_chars": len(text), "event_ts": ts}

    texts = {
        1: "spark shuffles data across executors while windows merge rows",
        2: "merge joins and hash joins shuffle partitions in the engine",
        4: "completely different animal words cat dog fox hen owl bee ant",
    }
    (landing / "b1.json").write_text(
        "\n".join([_json.dumps(doc(1, texts[1])), _json.dumps(doc(3, "short"))])
    )
    stream_corpus_ingest(spark, str(landing), out, ckpt, maintain_ivf_index=True)
    idx = os.path.join(out, "ivf_idx")
    ids = {r.c_id for r in spark.read.parquet(idx + "/cells").collect()}
    assert ids == {1}  # quarantined doc 3 never indexed
    (landing / "b2.json").write_text("\n".join(
        [_json.dumps(doc(2, texts[2], ts="2024-01-01 10:10:00")),
         _json.dumps(doc(4, texts[4], ts="2024-01-01 10:10:00"))]
    ))
    stream_corpus_ingest(spark, str(landing), out, ckpt, maintain_ivf_index=True)
    ids = {r.c_id for r in spark.read.parquet(idx + "/cells").collect()}
    assert ids == {1, 2, 4}
    # a doc-2-shaped query retrieves doc 1 (shared vocabulary) above
    # the unrelated doc 4
    q = hash_embed(
        spark.createDataFrame([(99, texts[2])], "doc_id long, text string")
    )
    hits = ivf_search(spark, idx, q, k=2, nprobe=4).collect()
    assert hits and hits[0]["c_id"] in (1, 2)
    # lost-checkpoint replay: the stored-id anti-join adds nothing
    stream_corpus_ingest(
        spark, str(landing), out, str(tmp_path / "ckpt2"),
        maintain_ivf_index=True,
    )
    assert {r.c_id for r in spark.read.parquet(idx + "/cells").collect()} == {1, 2, 4}


def test_streaming_corpus_quality_reports(spark, tmp_path):
    """validate_constraints appends a per-batch admission report
    (streaming form of the deequ-style gate): one row per constraint
    per micro-batch, flags computed over the RAW batch (pre-gate)."""
    import json as _json
    import os

    from degenter_clickhouse_spark.operators import validate as V
    from degenter_clickhouse_spark.streaming.corpus import stream_corpus_ingest

    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "out")

    def doc(i, text, ts="2024-01-01 10:00:00"):
        return {"doc_id": i, "text": text, "lang": "en", "source": "src0",
                "n_chars": len(text), "event_ts": ts}

    good = "the quick brown fox jumps over the lazy dog again and again"
    (landing / "b1.json").write_text("\n".join(_json.dumps(d) for d in [
        doc(1, good), doc(2, "hi"), doc(3, good + " more"),
    ]))
    constraints = [
        V.not_null("doc_id"),
        V.in_range("n_chars", 10, 10_000, min_pct=60),
        V.Unique("unique(doc_id)", ["doc_id"]),
    ]
    stream_corpus_ingest(
        spark, str(landing), out, str(tmp_path / "ckpt"),
        validate_constraints=constraints,
    )
    rep = spark.read.parquet(os.path.join(out, "quality_reports"))
    rows = {r["constraint"]: r for r in rep.collect()}
    assert len(rows) == 3
    assert rows["not_null(doc_id)"]["passed"] is True
    # 2/3 docs >= 10 chars -> 66% >= 60%
    assert rows["range(n_chars)"] == rows["range(n_chars)"]
    assert (rows["range(n_chars)"]["metric_num"],
            rows["range(n_chars)"]["metric_den"]) == (2, 3)
    assert rows["range(n_chars)"]["passed"] is True
    assert {r["batch_id"] for r in rows.values()} == {0}


def test_streaming_maintained_length_profile(spark, tmp_path):
    """maintain_profile=True writes one mergeable histogram-state row
    set per batch; merging them equals a direct state build over all
    accepted docs BIT-FOR-BIT, a lost-checkpoint replay changes
    nothing, and quarantined docs never profile."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    from degenter_clickhouse_spark.operators.skew import (
        quantile_merge,
        quantile_state,
    )
    from degenter_clickhouse_spark.streaming.corpus import (
        PROFILE_BINS,
        PROFILE_HI,
        PROFILE_LO,
        read_length_profile,
        stream_corpus_ingest,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def doc(i, text, src="src0", ts="2024-01-01 10:00:00"):
        return {"doc_id": i, "text": text, "lang": "en", "source": src,
                "n_chars": len(text), "event_ts": ts}

    (landing / "b1.json").write_text("\n".join([
        _json.dumps(doc(1, "alpha beta gamma delta epsilon zeta")),
        _json.dumps(doc(3, "short")),  # quarantined: too few words
    ]))
    stream_corpus_ingest(spark, str(landing), out, ckpt, maintain_profile=True)
    (landing / "b2.json").write_text("\n".join([
        _json.dumps(doc(2, "one two three four five six seven eight nine ten",
                        ts="2024-01-01 10:10:00")),
        _json.dumps(doc(4, "red green blue cyan magenta yellow black white",
                        src="src1", ts="2024-01-01 10:10:00")),
    ]))
    stream_corpus_ingest(spark, str(landing), out, ckpt, maintain_profile=True)

    streamed = {
        (r["source"]): (r["n"], r["quantile_estimate"])
        for r in read_length_profile(spark, out, q=0.5).collect()
    }
    accepted = spark.read.parquet(os.path.join(out, "accepted"))
    direct_state = quantile_state(
        accepted.select(
            "source",
            F.size(F.split(F.col("text"), " ")).cast("double").alias("toks"),
        ),
        ["source"], "toks", PROFILE_LO, PROFILE_HI, PROFILE_BINS,
    )
    direct = {
        (r["source"]): (r["n"], r["quantile_estimate"])
        for r in quantile_merge(direct_state, ["source"], 0.5).collect()
    }
    assert streamed == direct
    assert streamed["src0"][0] == 2  # doc 3 quarantined, never profiled
    assert streamed["src1"][0] == 1
    # lost-checkpoint full replay: batch-scoped overwrites rewrite the
    # same state rows — the merged profile is unchanged
    stream_corpus_ingest(
        spark, str(landing), out, str(tmp_path / "ckpt2"), maintain_profile=True
    )
    replayed = {
        (r["source"]): (r["n"], r["quantile_estimate"])
        for r in read_length_profile(spark, out, q=0.5).collect()
    }
    assert replayed == streamed


def test_lost_checkpoint_replay_no_duplicate_corpus_rows(spark, tmp_path):
    """REGRESSION: a lost-checkpoint replay re-batches the landing
    files (all files in one fresh batch 0), so batch-scoped overwrites
    alone landed already-stored docs under a NEW batch id — accepted
    held doc 2 twice. The cross-batch anti-join guard must keep both
    accepted and quarantine exactly-once by doc_id."""
    import json as _json
    import os

    from degenter_clickhouse_spark.streaming.corpus import stream_corpus_ingest

    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "out")

    def doc(i, text, ts="2024-01-01 10:00:00"):
        return {"doc_id": i, "text": text, "lang": "en", "source": "s",
                "n_chars": len(text), "event_ts": ts}

    (landing / "b1.json").write_text("\n".join([
        _json.dumps(doc(1, "alpha beta gamma delta epsilon zeta")),
        _json.dumps(doc(3, "nope")),  # quarantined
    ]))
    stream_corpus_ingest(spark, str(landing), out, str(tmp_path / "ck1"))
    (landing / "b2.json").write_text(
        _json.dumps(doc(2, "one two three four five six seven",
                        ts="2024-01-01 10:10:00"))
    )
    stream_corpus_ingest(spark, str(landing), out, str(tmp_path / "ck1"))
    # fresh checkpoint: both files land in ONE batch (different batching)
    stream_corpus_ingest(spark, str(landing), out, str(tmp_path / "ck2"))
    acc = [r.doc_id for r in
           spark.read.parquet(os.path.join(out, "accepted")).collect()]
    assert sorted(acc) == [1, 2]  # no duplicates
    qua = [r.doc_id for r in
           spark.read.parquet(os.path.join(out, "quarantine")).collect()]
    assert sorted(qua) == [3]


def test_streaming_sequence_count_across_restarts(spark, tmp_path):
    """sequence_count_stream carries the per-user automaton (stage,
    count) across micro-batches AND restarts: a chain that straddles
    the batch boundary still completes, and the final totals equal the
    batch operator over the union of all events."""
    import json as _json

    from pyspark.sql import functions as F

    from degenter_clickhouse_spark.operators.seqmatch import sequence_count
    from degenter_clickhouse_spark.streaming import stateful

    ship_package(spark)
    landing = tmp_path / "ev"
    landing.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    schema = "event_id long, ts timestamp, user_id long, event_type string"

    def write(fname, rows):
        (landing / fname).write_text("\n".join(
            _json.dumps({"event_id": e, "ts": t, "user_id": u, "event_type": ty})
            for e, t, u, ty in rows
        ))

    def run():
        stream = spark.readStream.schema(schema).json(str(landing))
        counted = stateful.sequence_count_stream(stream, ["a", "b"])
        q = (
            counted.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: user 1 completes one chain and ARMS a second (a at the
    # end); user 2 sees only 'b'
    b1 = [
        (1, "2024-05-01 10:00:00", 1, "a"),
        (2, "2024-05-01 10:01:00", 1, "b"),
        (3, "2024-05-01 10:02:00", 1, "a"),
        (4, "2024-05-01 10:00:00", 2, "b"),
    ]
    write("b1.json", b1)
    run()
    first = {r.user_id: (r.n_matches, r.n_events)
             for r in spark.read.parquet(out_dir).collect()}
    assert first == {1: (1, 3), 2: (0, 1)}
    # restart: the armed stage survives — one 'b' completes chain 2
    b2 = [
        (5, "2024-05-01 10:03:00", 1, "b"),
        (6, "2024-05-01 10:01:00", 2, "a"),
    ]
    write("b2.json", b2)
    run()
    latest = {}
    for r in spark.read.parquet(out_dir).collect():
        prev = latest.get(r.user_id)
        if prev is None or r.n_events > prev[1]:
            latest[r.user_id] = (r.n_matches, r.n_events)
    assert latest == {1: (2, 4), 2: (0, 2)}
    # equals the batch operator over all events (arrival order == ts
    # order here, so the contracts coincide)
    all_ev = spark.createDataFrame(
        [(e, datetime.fromisoformat(t), u, ty) for e, t, u, ty in b1 + b2],
        schema,
    )
    batch = {
        r["user_id"]: (r["n_matches"], r["n_events"])
        for r in sequence_count(
            all_ev, "user_id", "ts",
            [F.col("event_type") == "a", F.col("event_type") == "b"],
            tiebreak="event_id",
        ).collect()
    }
    assert batch == latest


def test_streaming_sessions_gap_and_watermark(spark, tmp_path):
    """session_window streaming: events within the gap merge into one
    session per user; the session emits exactly once after the
    watermark passes its close; totals match the events that formed
    it."""
    import json as _json

    from degenter_clickhouse_spark.streaming.windows import streaming_sessions

    landing = tmp_path / "ev"
    landing.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    schema = "event_id long, ts timestamp, user_id long, value double"

    def write(fname, rows):
        (landing / fname).write_text("\n".join(
            _json.dumps({"event_id": e, "ts": t, "user_id": u, "value": v})
            for e, t, u, v in rows
        ))

    def run():
        stream = spark.readStream.schema(schema).json(str(landing))
        sess = streaming_sessions(stream, gap="10 minutes", watermark="5 minutes")
        q = (
            sess.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # one burst: 3 events within the gap (session A), plus an isolated
    # event 30 min later (session B) that also advances the watermark
    # past session A's close
    write("b1.json", [
        (1, "2024-05-01 10:00:00", 1, 1.0),
        (2, "2024-05-01 10:05:00", 1, 2.0),
        (3, "2024-05-01 10:08:00", 1, 4.0),
        (4, "2024-05-01 10:40:00", 1, 8.0),
    ])
    run()
    import os

    got = (
        spark.read.parquet(out_dir).collect()
        if os.path.exists(out_dir) else []
    )
    done = {(r.user_id, r.session_start.strftime("%H:%M")):
            (r.n_events, r.value_sum) for r in got}
    # session A (10:00-10:18) closed by the watermark (10:40 - 5min);
    # session B still open -> not emitted
    assert done == {(1, "10:00"): (3, 7.0)}
    # a much-later event closes session B on the next drain
    write("b2.json", [(5, "2024-05-01 12:00:00", 1, 16.0)])
    run()
    got2 = {(r.user_id, r.session_start.strftime("%H:%M")):
            (r.n_events, r.value_sum)
            for r in spark.read.parquet(out_dir).collect()}
    assert got2[(1, "10:40")] == (1, 8.0)


def test_replay_guard_reads_are_bucket_pruned(spark, tmp_path):
    """The cross-batch replay guard must prune the prior read to this
    batch's doc-id hash buckets (static partition IN filter) — the
    whole point of the bucket layout: guard cost tracks the batch,
    not the corpus. Legacy tables without the bucket layout fall back
    to the full column-pruned read."""
    import os

    from degenter_clickhouse_spark.streaming.corpus import (
        _doc_bucket,
        _idempotent_write,
        _prior_ids,
    )

    acc = str(tmp_path / "accepted")
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"), F.lit("t").alias("text")
    )
    _idempotent_write(
        docs.withColumn("__bucket", _doc_bucket("doc_id")), acc, 0, "__bucket"
    )
    batch = spark.range(3).select(F.col("id").alias("doc_id"))
    plan = (
        _prior_ids(spark, acc, 1, batch)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "__bucket" in m.group(1), plan[:1500]

    # legacy layout (no __bucket): fall back, still correct
    legacy = str(tmp_path / "legacy")
    _idempotent_write(docs, legacy, 0)
    ids = {r.doc_id for r in _prior_ids(spark, legacy, 1, batch).collect()}
    assert ids == set(range(200))


def test_streaming_maintained_pq_index(spark, tmp_path):
    """All four index families stream-maintained: with
    maintain_pq_index=True the PQ code table grows with accepted docs
    (codebooks frozen on the first batch) and a pq_search over the
    streaming-grown index finds the expected docs."""
    import json
    import os

    from degenter_clickhouse_spark.llm.pq import pq_search
    from degenter_clickhouse_spark.llm.similarity import hash_embed
    from degenter_clickhouse_spark.streaming.corpus import (
        stream_corpus_ingest,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "out")

    def shard(name, docs):
        (landing / name).write_text(
            "\n".join(
                json.dumps(
                    {
                        "doc_id": i,
                        "text": t,
                        "lang": "en",
                        "source": "s",
                        "n_chars": len(t),
                        "event_ts": f"2024-05-01 10:{i % 60:02d}:00",
                    }
                )
                for i, t in docs
            )
        )

    texts = {
        i: f"document number {i} talks about topic {i % 3} in many plain words"
        for i in range(20)
    }
    shard("a.json", [(i, texts[i]) for i in range(10)])
    stream_corpus_ingest(
        spark, str(landing), out, str(tmp_path / "ckpt"),
        maintain_pq_index=True,
    )
    n1 = spark.read.parquet(f"{out}/pq_idx/codes").count()
    assert n1 == 10
    shard("b.json", [(i, texts[i]) for i in range(10, 20)])
    stream_corpus_ingest(
        spark, str(landing), out, str(tmp_path / "ckpt"),
        maintain_pq_index=True,
    )
    assert spark.read.parquet(f"{out}/pq_idx/codes").count() == 20

    acc = spark.read.parquet(f"{out}/accepted").select("doc_id", "text")
    q = hash_embed(acc.filter(F.col("doc_id") == 3))
    res = pq_search(
        spark, f"{out}/pq_idx", q, k=3, rerank_with=hash_embed(acc),
    )
    assert res.count() == 3


def test_all_rejected_first_batch_defers_index_seeding(spark, tmp_path):
    """A first shard whose docs ALL fail the quality gate must not
    crash the IVF/PQ seeding (k-means over an empty frame) — the
    indexes defer to the first batch with accepted rows."""
    import json
    import os

    from degenter_clickhouse_spark.streaming.corpus import (
        stream_corpus_ingest,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "out")
    # all too short -> all rejected
    (landing / "a.json").write_text(
        "\n".join(
            json.dumps(
                {
                    "doc_id": i, "text": "tiny", "lang": "en", "source": "s",
                    "n_chars": 4, "event_ts": "2024-05-01 10:00:00",
                }
            )
            for i in range(3)
        )
    )
    stream_corpus_ingest(
        spark, str(landing), out, str(tmp_path / "ckpt"),
        maintain_ivf_index=True, maintain_pq_index=True,
    )
    assert not os.path.exists(f"{out}/pq_idx/codes")
    assert not os.path.exists(f"{out}/ivf_idx/cells")
    # a later shard with real docs seeds both
    (landing / "b.json").write_text(
        "\n".join(
            json.dumps(
                {
                    "doc_id": 100 + i,
                    "text": f"a proper document with enough words {i}",
                    "lang": "en", "source": "s", "n_chars": 40,
                    "event_ts": "2024-05-01 11:00:00",
                }
            )
            for i in range(5)
        )
    )
    stream_corpus_ingest(
        spark, str(landing), out, str(tmp_path / "ckpt"),
        maintain_ivf_index=True, maintain_pq_index=True,
    )
    assert spark.read.parquet(f"{out}/pq_idx/codes").count() == 5
    assert spark.read.parquet(f"{out}/ivf_idx/cells").count() == 5


def test_all_rejected_first_batch_defers_minhash_index(spark, tmp_path):
    """With near_dup_threshold enabled, a first shard whose docs ALL
    fail the quality gate must not seed a data-less minhash_idx
    (an empty dynamic overwrite leaves only _SUCCESS, and the next
    batch's index read would raise UNABLE_TO_INFER_SCHEMA). The index
    defers to the first batch with accepted rows, and near-dedup vs
    that index still works afterwards."""
    import json
    import os

    from degenter_clickhouse_spark.streaming.corpus import (
        stream_corpus_ingest,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # batch 1: all too short -> all quality-rejected
    (landing / "a.json").write_text(
        "\n".join(
            json.dumps(
                {
                    "doc_id": i, "text": "tiny", "lang": "en", "source": "s",
                    "n_chars": 4, "event_ts": "2024-05-01 10:00:00",
                }
            )
            for i in range(3)
        )
    )
    stream_corpus_ingest(spark, str(landing), out, ckpt,
                         near_dup_threshold=0.5)
    assert not os.path.exists(f"{out}/minhash_idx/bands")
    assert not os.path.exists(f"{out}/minhash_idx/shingles")
    assert not os.path.exists(f"{out}/accepted")
    # batch 2: real docs seed the index (regression: this crashed at
    # the unguarded bands read / candidate_index_shingles)
    base = ("the quick brown fox jumps over the lazy dog while the calm "
            "cat watches the bright moon rise above the quiet hills")
    (landing / "b.json").write_text(json.dumps(
        {"doc_id": 100, "text": base, "lang": "en", "source": "s",
         "n_chars": len(base), "event_ts": "2024-05-01 11:00:00"}
    ))
    stream_corpus_ingest(spark, str(landing), out, ckpt,
                         near_dup_threshold=0.5)
    assert {r.d for r in spark.read.parquet(
        f"{out}/minhash_idx/shingles").collect()} == {100}
    # batch 3: a near-dup of doc 100 is quarantined against the index
    (landing / "c.json").write_text(json.dumps(
        {"doc_id": 200, "text": base.replace("lazy", "sleepy"),
         "lang": "en", "source": "s", "n_chars": len(base),
         "event_ts": "2024-05-01 12:00:00"}
    ))
    stream_corpus_ingest(spark, str(landing), out, ckpt,
                         near_dup_threshold=0.5)
    acc = sorted(r.doc_id for r in spark.read.parquet(
        f"{out}/accepted").collect())
    assert acc == [100]
    quar = {r.doc_id: r.reject_reason for r in spark.read.parquet(
        f"{out}/quarantine").collect()}
    assert quar[200] == "near_duplicate"


def test_streaming_maintained_winnow_index(spark, tmp_path):
    """maintain_winnow_index=True grows the MOSS fingerprint index
    with each batch's accepted docs: probes against the stored index
    equal the inline computation over the accepted corpus, replays add
    nothing, and quarantined docs never index (VERDICT r8 #8)."""
    import json as _json
    import os

    from degenter_clickhouse_spark.llm.winnow import (
        winnow_index_probe,
        winnow_overlap_pairs,
    )
    from degenter_clickhouse_spark.streaming.corpus import stream_corpus_ingest

    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def doc(i, text, ts="2024-01-01 10:00:00"):
        return {"doc_id": i, "text": text, "lang": "en", "source": "src0",
                "n_chars": len(text), "event_ts": ts}

    t1 = ("spark shuffles data across executors while windows merge rows "
          "and the optimizer prunes columns from every scan")
    t2 = ("a different second document about graphs and components "
          "with its own vocabulary entirely separate words")
    (landing / "b1.json").write_text(
        "\n".join([_json.dumps(doc(1, t1)), _json.dumps(doc(3, "short"))])
    )
    stream_corpus_ingest(spark, str(landing), out, ckpt,
                         maintain_winnow_index=True)
    idx = os.path.join(out, "winnow_idx")
    ids = {r.doc_id for r in spark.read.parquet(idx + "/sizes").collect()}
    assert ids == {1}  # quarantined doc 3 never indexed
    (landing / "b2.json").write_text(
        _json.dumps(doc(2, t2, ts="2024-01-01 10:10:00"))
    )
    stream_corpus_ingest(spark, str(landing), out, ckpt,
                         maintain_winnow_index=True)
    ids = {r.doc_id for r in spark.read.parquet(idx + "/sizes").collect()}
    assert ids == {1, 2}
    # probe a doc that plagiarizes doc 1: index probe == inline pairs
    probe = spark.createDataFrame(
        [(50, "prefix words then " + t1)], "doc_id long, text string"
    )
    accepted = spark.read.parquet(os.path.join(out, "accepted")).select(
        "doc_id", "text"
    )
    got = sorted(
        tuple(r)
        for r in winnow_index_probe(spark, idx, probe, min_shared=1).collect()
    )
    want = sorted(
        tuple(r)
        for r in winnow_overlap_pairs(
            accepted.unionByName(probe), min_shared=1
        ).collect()
        if r.d1 == 50 or r.d2 == 50
    )
    assert want and got == want
    # lost-checkpoint replay: the bucket-pruned guard adds nothing
    stream_corpus_ingest(spark, str(landing), out, str(tmp_path / "ckpt2"),
                         maintain_winnow_index=True)
    assert spark.read.parquet(idx + "/sizes").count() == 2
    assert sorted(
        tuple(r)
        for r in winnow_index_probe(spark, idx, probe, min_shared=1).collect()
    ) == want


def test_migrate_to_day_layout(spark, tmp_path):
    """One-shot legacy-flat -> __day layout migration: rows preserved,
    subsequent appends/compaction see a partitioned store, a second
    run is a no-op, and the guard (ohlcv's no-unsettled-batch check)
    defers the rewrite."""
    import glob

    from degenter_clickhouse_spark.operators import merge as M

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("2024-03-01 10:00:00", i) for i in range(10)]
        + [("2024-03-02 11:00:00", i) for i in range(10)],
        "ts string, v long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    for _ in range(2):
        df.coalesce(1).write.mode("append").parquet(path)
    before = sorted((str(r.ts), r.v) for r in spark.read.parquet(path).collect())

    got = M.migrate_to_day_layout(spark, path, "ts", guard=lambda: False)
    assert got.get("skipped") == 1  # guard defers, store untouched
    assert glob.glob(f"{path}/*.parquet")

    got = M.migrate_to_day_layout(spark, path, "ts")
    assert "skipped" not in got
    days = sorted(glob.glob(f"{path}/__day=*"))
    assert [d.split("=")[-1] for d in days] == ["2024-03-01", "2024-03-02"]
    assert not glob.glob(f"{path}/*.parquet")
    after = sorted(
        (str(r.ts), r.v)
        for r in spark.read.parquet(path).drop("__day").collect()
    )
    assert after == before
    # idempotent: already-partitioned store is a no-op
    got = M.migrate_to_day_layout(spark, path, "ts")
    assert got.get("skipped") == 1
    # migration consolidates to one file per day; fresh partitioned
    # appends then fragment and dirty-only compaction applies
    assert M.excess_file_count(path, 1) == 0
    df.withColumn("__day", F.to_date("ts")).coalesce(1).write.mode(
        "append"
    ).partitionBy("__day").parquet(path)
    assert M.excess_file_count(path, 1) >= 2
    M.compact_table(spark, path, partition_col="__day", dirty_only=True)
    assert M.excess_file_count(path, 1) == 0
    assert spark.read.parquet(path).count() == 60


def test_publish_atomic_legacy_migration_resolvable_during_write(spark, tmp_path):
    """ADVICE r12 #4: migrating a legacy real-dir table into the
    pointer layout must not leave ``path`` unresolvable for the whole
    duration of the new version's parquet write — the bridge symlink to
    the migrated v0 goes in place BEFORE the write starts, so a reader
    hitting the table mid-migration sees the complete old data."""
    import os

    path = str(tmp_path / "legacy")
    spark.range(0, 7).coalesce(1).write.parquet(path)
    assert not os.path.islink(path)
    real = spark.range(0, 9).coalesce(1)
    seen = {}

    class Probe:  # publish_atomic touches only .write — probe there
        @property
        def write(self):
            seen["resolvable"] = os.path.isdir(os.path.realpath(path))
            seen["count"] = spark.read.parquet(os.path.realpath(path)).count()
            return real.write

    M.publish_atomic(Probe(), path)
    # at write time the pointer already resolved to the migrated v0
    assert seen == {"resolvable": True, "count": 7}
    assert os.path.islink(path)
    assert M.serving_read(spark, path).count() == 9


def test_streaming_maintained_freq_sketch(spark, tmp_path):
    """maintain_freq_sketch=True writes one mergeable count-min
    counter-row set per batch over the accepted docs' words; merging
    them equals a direct cms_state over all accepted words ROW-FOR-ROW
    (addition is exactly-once thanks to the cross-batch doc guard), a
    lost-checkpoint replay changes nothing, and quarantined docs never
    count. Point estimates probed from the stream-grown sketch match
    exact word counts."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    from degenter_clickhouse_spark.llm.text import poly_hash
    from degenter_clickhouse_spark.operators.skew import (
        cms_estimate,
        cms_merge,
        cms_state,
    )
    from degenter_clickhouse_spark.streaming.corpus import (
        FREQ_DEPTH,
        FREQ_WIDTH,
        read_freq_sketch,
        stream_corpus_ingest,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def doc(i, text, src="src0", ts="2024-01-01 10:00:00"):
        return {"doc_id": i, "text": text, "lang": "en", "source": src,
                "n_chars": len(text), "event_ts": ts}

    (landing / "b1.json").write_text("\n".join([
        _json.dumps(doc(1, "alpha beta alpha gamma alpha beta")),
        _json.dumps(doc(3, "spam")),  # quarantined: too few words
    ]))
    stream_corpus_ingest(spark, str(landing), out, ckpt,
                         maintain_freq_sketch=True)
    (landing / "b2.json").write_text("\n".join([
        _json.dumps(doc(2, "alpha delta delta beta gamma epsilon zeta",
                        ts="2024-01-01 10:10:00")),
        _json.dumps(doc(4, "beta beta beta red green blue cyan",
                        src="src1", ts="2024-01-01 10:10:00")),
    ]))
    stream_corpus_ingest(spark, str(landing), out, ckpt,
                         maintain_freq_sketch=True)

    def words_of(df):
        return (
            df.select("source", F.explode(F.split("text", " ")).alias("w"))
            .filter(F.length("w") > 0)
            .withColumn("h", poly_hash("w"))
        )

    accepted = spark.read.parquet(os.path.join(out, "accepted"))
    streamed = sorted(map(tuple, read_freq_sketch(spark, out).collect()))
    direct = sorted(map(tuple, cms_state(
        words_of(accepted), ["source"], "h", depth=FREQ_DEPTH, width=FREQ_WIDTH
    ).collect()))
    assert streamed == direct  # addition merge is exactly-once

    # probe: per-source estimates over the stream-grown sketch match
    # exact word counts ('spam' was quarantined — counts nothing)
    exact = words_of(accepted).groupBy("source", "w", "h").agg(
        F.count(F.lit(1)).cast("long").alias("exact")
    )
    est = cms_estimate(
        read_freq_sketch(spark, out), exact, "h",
        depth=FREQ_DEPTH, width=FREQ_WIDTH, keys=["source"],
    )
    rows = est.collect()
    assert rows and all(r["cms_est"] >= r["exact"] for r in rows)
    by = {(r["source"], r["w"]): r["cms_est"] for r in rows}
    assert by[("src0", "alpha")] == 4  # 3 in doc 1 + 1 in doc 2
    assert by[("src1", "beta")] == 3
    assert ("src0", "spam") not in by

    # lost-checkpoint full replay: the doc-level guard empties the
    # replayed batch, so no counter row doubles
    stream_corpus_ingest(spark, str(landing), out, str(tmp_path / "ckpt2"),
                         maintain_freq_sketch=True)
    replayed = sorted(map(tuple, read_freq_sketch(spark, out).collect()))
    assert replayed == streamed
