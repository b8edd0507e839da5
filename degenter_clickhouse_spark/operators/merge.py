"""Upsert / conditional-merge operators (SURVEY.md §2.1 S9-S11, §2.11 B14).

The reference mutates dimension rows in place (``ALTER TABLE tokens
UPDATE name = if($2 != '', $2, name) ...`` core/tokens.js:387-434) and
replaces snapshots wholesale (holders delete+reinsert,
jobs/holders-refresher.js:126-194). On an append-only data lake both
become deterministic dataframe merges written back per partition —
with Delta these map 1:1 to ``MERGE WHEN MATCHED`` and ``replaceWhere``;
the plain-parquet forms below keep identical semantics.
"""

from __future__ import annotations

import os
from collections.abc import Sequence
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from .joins import dim_broadcast


def conditional_merge(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    merge_cols: Sequence[str],
    empty_is_null: bool = True,
) -> DataFrame:
    """S11: per column, take the update value unless it's NULL (or empty
    string) — the reference's ``if($2 != '', $2, old)`` field merge.
    New keys are inserted; untouched columns keep current values."""
    upd = updates.select(
        *keys, *[F.col(c).alias(f"__new_{c}") for c in merge_cols]
    )
    j = current.join(upd, on=list(keys), how="full_outer")
    out_cols = []
    for c in current.columns:
        if c in keys:
            out_cols.append(F.col(c))
        elif c in merge_cols:
            new = F.col(f"__new_{c}")
            if empty_is_null:
                new = F.when(new.cast("string") == "", None).otherwise(new)
            out_cols.append(F.coalesce(new, F.col(c)).alias(c))
        else:
            out_cols.append(F.col(c))
    return j.select(*out_cols)


def merge_token_metadata(tokens: DataFrame, meta_updates: DataFrame) -> DataFrame:
    """B14 (core/tokens.js:263-434) precedence rules on ingest-side
    metadata refresh: non-empty update wins per field, existing value
    otherwise; exponent falls back through the chain (update ->
    existing -> NULL, display-derived fallback handled upstream)."""
    return conditional_merge(
        tokens,
        meta_updates,
        keys=["token_id"],
        merge_cols=[
            c for c in ("name", "symbol", "display", "exponent", "image_uri",
                        "website", "twitter")
            if c in tokens.columns
        ],
    )


class TableLockTimeout(RuntimeError):
    pass


@contextmanager
def _table_lock(path: str, timeout_s: float = 60.0, stale_s: float = 3600.0):
    """Advisory per-table writer lock for the plain-parquet
    read-modify-swap paths: ``mkdir`` is atomic on POSIX (and on object
    stores becomes a conditional-put), so exactly one writer enters the
    critical section; others poll until ``timeout_s`` then raise
    ``TableLockTimeout`` instead of silently interleaving and losing
    one writer's rows. A lock older than ``stale_s`` (crashed holder)
    is broken. This serializes writers — it does not make them
    transactional; ``fmt="delta"`` remains the concurrent-writer seam
    (reference semantics: single-writer jobs runner, jobs/runner.js).
    """
    import json
    import time

    lock = path.rstrip("/") + "._lock"
    deadline = time.monotonic() + timeout_s
    while True:
        try:
            os.makedirs(os.path.dirname(lock) or ".", exist_ok=True)
            os.mkdir(lock)
            break
        except FileExistsError:
            try:
                age = time.time() - os.stat(lock).st_mtime
                if age > stale_s:
                    os.rmdir(lock)  # crashed holder; next loop retries
                    continue
            except FileNotFoundError:
                continue  # raced with the holder's release
            if time.monotonic() >= deadline:
                raise TableLockTimeout(
                    f"writer lock on {path} held for {age:.0f}s; "
                    "concurrent upsert/compact of the same parquet table"
                )
            time.sleep(0.05)
    try:
        with open(os.path.join(lock, "holder.json"), "w") as f:
            json.dump({"pid": os.getpid(), "ts": time.time()}, f)
        yield
    finally:
        import shutil

        shutil.rmtree(lock, ignore_errors=True)


def _swap_dirs(path: str, tmp: str, old: str | None = None) -> None:
    """Promote ``tmp`` over ``path`` with no instant where neither copy
    exists: live table moves aside first, the new copy takes its place,
    then the old one is deleted. A crash between the renames leaves the
    live table or both copies — never zero. os.rename requires the dirs
    to share a filesystem (they are siblings by construction); on an
    object store this swap becomes one manifest/metadata commit.

    ``old`` overrides the backup name — REQUIRED when ``path`` is a
    partition leaf INSIDE a table (ADVICE r11): the default
    ``<path>._old`` then contains ``=`` without a ``.`` prefix, which
    Spark's file index treats as a data partition, so readers see both
    copies during the swap and a crash leaves a phantom partition."""
    import shutil

    old = old if old is not None else path.rstrip("/") + "._old"
    if os.path.exists(old):
        shutil.rmtree(old)  # leftover from a prior crash after promote
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def publish_atomic(df: DataFrame, path: str, keep_versions: int = 3) -> None:
    """READER-atomic publish of a serving table (VERDICT r11 #2):
    write to a fresh ``<path>.__v<N>`` version dir and atomically
    repoint a symlink at ``path``. ``_swap_dirs`` keeps a copy on disk
    at every instant but has an ENOENT window for PATH RESOLUTION
    between its two renames — a reader hitting the 60 s tick's
    republish mid-swap fails. ``os.replace`` of a symlink is one
    atomic rename: every resolution of ``path`` sees a complete table.
    The previous ``keep_versions`` dirs outlive the swap (a reader
    that already listed one keeps reading it — the local-FS analogue
    of snapshot isolation); older ones are pruned. On an object store
    this is exactly the manifest-pointer commit
    ``operators/versioned.py`` does for engine tables.

    A legacy real directory at ``path`` (pre-r12 layout) is migrated
    by renaming it to version 0 — the only publish with a resolution
    gap, once per table lifetime. Writers serialize on the table
    lock.

    READ CONTRACT: ``serving_read`` (resolve the link, then scan the
    immutable version dir) is list-then-read safe through any number
    of concurrent republishes. A raw ``spark.read.parquet(path)``
    through the link still works but re-resolves the link per file
    access — a republish landing between Spark's listing and its
    fetches invalidates the listed paths (an inherent local-FS race
    for any reader that addresses data through a mutable pointer; the
    r11 dir swap additionally had an ENOENT window, which this layout
    removes)."""
    import glob
    import shutil

    base = path.rstrip("/")
    parent = os.path.dirname(base) or "."
    os.makedirs(parent, exist_ok=True)

    def vnum(p: str) -> int:
        try:
            return int(p.rsplit(".__v", 1)[1])
        except (IndexError, ValueError):
            return -1

    with _table_lock(base + ".__pub"):
        if os.path.isdir(base) and not os.path.islink(base):
            os.rename(base, base + ".__v0")  # legacy real dir -> v0
            # bridge the pointer IMMEDIATELY: without this, ``path``
            # resolves to nothing for the whole duration of the new
            # version's parquet write (seconds), not just a rename
            # window (ADVICE r12 #4) — readers must keep resolving to
            # the migrated v0 until the real swap below
            _bridge = base + ".__lnktmp"
            if os.path.lexists(_bridge):
                os.remove(_bridge)
            os.symlink(os.path.basename(base + ".__v0"), _bridge)
            os.replace(_bridge, base)
        versions = sorted(glob.glob(base + ".__v*"), key=vnum)
        n = (vnum(versions[-1]) if versions else -1) + 1
        target = f"{base}.__v{n}"
        df.write.mode("overwrite").parquet(target)
        lnk = base + ".__lnktmp"
        if os.path.lexists(lnk):
            os.remove(lnk)
        os.symlink(os.path.basename(target), lnk)
        os.replace(lnk, base)  # the atomic pointer swap
        for old in versions[: max(0, len(versions) - keep_versions)]:
            shutil.rmtree(old, ignore_errors=True)


def serving_read(spark: SparkSession, path: str) -> DataFrame:
    """Snapshot read of a ``publish_atomic`` serving table: resolve
    the pointer symlink FIRST and hand Spark the immutable version
    directory, whose files never change and survive ``keep_versions``
    further publishes — so the read cannot race a republish. Identity
    on a plain directory (realpath of a non-link is itself), so every
    consumer can use it unconditionally."""
    return spark.read.parquet(os.path.realpath(path))


def _leaf_swap_paths(leaf: str) -> tuple[str, str]:
    """Hidden (tmp, old) sibling names for swapping one partition leaf
    dir in place. Dot-prefixed so BOTH Spark's file index and
    ``leaf_parquet_dirs`` skip them even though the name keeps the
    ``=``: Spark excludes any ``.``-prefixed path unconditionally — the
    ``contains('=')`` escape in its path filter applies only to
    ``_``-prefixed names (tests/test_merge.py proves the read-side
    invisibility empirically)."""
    parent, base = os.path.split(leaf.rstrip("/"))
    return (
        os.path.join(parent, "." + base + "._compacting"),
        os.path.join(parent, "." + base + "._old"),
    )


def recover_leaf_leftovers(path: str) -> dict[str, int]:
    """Crash cleanup for interrupted leaf swaps, run under the table
    writer lock at the start of every compact pass. Handles the
    dot-prefixed names and the pre-r12 ``=``-visible ones
    (``__day=X._old`` / ``__day=X._compacting``), which a crash left as
    permanent phantom partitions (ADVICE r11). Cases per leftover
    ``<leaf>._old`` backup:

    * live leaf missing (crash between the two renames): restore the
      backup — it is the complete original data;
    * live leaf present AND the swap's temp still present: the crash
      happened mid-swap and streaming appends recreated the leaf
      afterwards, so the live dir holds ONLY post-crash appends — move
      the backup's files in beside them (names are unique: Spark part
      files carry UUIDs, ohlcv files carry distinct batch tags);
    * live leaf present, no temp: the swap completed before the crash
      — the backup duplicates the live data; delete it.

    Any remaining ``*._compacting`` temp is deleted: the rewrite is
    idempotent and the next pass redoes it. Returns counts."""
    import shutil

    restored = merged = removed = 0
    if not os.path.isdir(path):
        return {"restored": 0, "merged": 0, "removed": 0}
    for dirpath, dirnames, _ in os.walk(path):
        for d in list(dirnames):
            if not d.endswith("._old"):
                continue
            full = os.path.join(dirpath, d)
            base = d[: -len("._old")]
            if base.startswith("."):
                base = base[1:]
            live = os.path.join(dirpath, base)
            tmp_names = ("." + base + "._compacting", base + "._compacting")
            had_tmp = any(os.path.exists(os.path.join(dirpath, t)) for t in tmp_names)
            if not os.path.exists(live):
                os.rename(full, live)
                restored += 1
            elif had_tmp:
                for f in os.listdir(full):
                    if not f.startswith((".", "_")):
                        os.replace(os.path.join(full, f), os.path.join(live, f))
                shutil.rmtree(full, ignore_errors=True)
                merged += 1
            else:
                shutil.rmtree(full, ignore_errors=True)
                removed += 1
            dirnames.remove(d)
    for dirpath, dirnames, _ in os.walk(path):
        for d in list(dirnames):
            if d.endswith("._compacting"):
                shutil.rmtree(os.path.join(dirpath, d), ignore_errors=True)
                dirnames.remove(d)
                removed += 1
    return {"restored": restored, "merged": merged, "removed": removed}


def upsert_write(
    spark,
    updates: DataFrame,
    path: str,
    keys: Sequence[str],
    fmt: str = "parquet",
    lock_timeout_s: float = 60.0,
) -> None:
    """S10/S11 write seam: key-based upsert of ``updates`` into the
    table at ``path``. This is THE swap-in point for a transactional
    lakehouse format — the engine's semantics don't change, only the
    concurrency story:

    * ``fmt="parquet"`` (default, no extra deps): read-modify-write —
      current rows whose keys are absent from ``updates`` survive via
      anti-join, then the union rewrites the table. Correct for a
      single writer (the reference's jobs runner is single-writer per
      table, jobs/runner.js); NOT safe for concurrent writers.
    * ``fmt="delta"``: transactional ``MERGE WHEN MATCHED UPDATE ALL
      WHEN NOT MATCHED INSERT ALL`` via delta-spark, safe under
      concurrent writers at 100 TB. Requires the delta-spark package
      and a Delta-enabled session; raises a clear error otherwise.
      (Iceberg's ``MERGE INTO`` SQL is the equivalent seam.)
    * ``fmt="versioned"``: the engine-native manifest-versioned table
      (operators/versioned.py) — atomic pointer-swap commits, snapshot
      isolation for readers, time travel, and per-file rewrite cost;
      dependency-free, so the transactional path is TESTED in this
      environment (tests/test_versioned.py) instead of gated on an
      uninstallable package. Requires the table to have been created
      with ``versioned.vt_write``.
    """
    if fmt == "delta":
        try:
            from delta.tables import DeltaTable  # type: ignore
        except ImportError as e:  # pragma: no cover - delta not in test env
            raise RuntimeError(
                "fmt='delta' needs the delta-spark package and a "
                "Delta-enabled SparkSession (spark.sql.extensions="
                "io.delta.sql.DeltaSparkSessionExtension); install it or "
                "use fmt='parquet' for single-writer semantics"
            ) from e
        cond = " AND ".join(f"t.{k} = u.{k}" for k in keys)
        (
            DeltaTable.forPath(spark, path)
            .alias("t")
            .merge(updates.alias("u"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return
    if fmt == "versioned":
        from .versioned import vt_upsert

        vt_upsert(spark, updates, path, keys=list(keys))
        return
    if fmt != "parquet":
        raise ValueError(f"unsupported fmt: {fmt!r} (parquet|delta|versioned)")
    with _table_lock(path, timeout_s=lock_timeout_s):
        try:
            current = spark.read.parquet(path)
        except Exception:
            updates.write.mode("overwrite").parquet(path)
            return
        survivors = current.join(
            dim_broadcast(updates.select(*keys).distinct()),
            on=list(keys),
            how="left_anti",
        )
        merged = survivors.unionByName(updates.select(*current.columns))
        # write-to-temp + atomic-ish swap: overwriting the live path
        # would first truncate it (a crash mid-write loses the table)
        # and also truncate the plan's own input; the swap leaves either
        # the old or both copies on disk at every instant (see
        # _swap_dirs)
        tmp = path.rstrip("/") + "._upserting"
        merged.write.mode("overwrite").parquet(tmp)
        _swap_dirs(path, tmp)


def delete_keys(
    spark,
    path: str,
    keys: Sequence[str],
    matching: DataFrame,
    fmt: str = "parquet",
    lock_timeout_s: float = 60.0,
) -> None:
    """Keyed DELETE companion to ``upsert_write``: remove from the table
    at ``path`` every row whose key tuple appears in ``matching``.
    Needed by CDC consumers (plans/incremental.py) where a delta can
    retract a group entirely — an upsert alone would leave the stale
    row behind. Same fmt seams as upsert_write."""
    if fmt == "versioned":
        from .versioned import vt_delete

        vt_delete(spark, path, keys=list(keys), matching=matching)
        return
    if fmt != "parquet":
        raise ValueError(f"unsupported fmt: {fmt!r} (parquet|versioned)")
    with _table_lock(path, timeout_s=lock_timeout_s):
        try:
            current = spark.read.parquet(path)
        except Exception:
            return  # no table: nothing to delete
        survivors = current.join(
            dim_broadcast(matching.select(*keys).distinct()),
            on=list(keys),
            how="left_anti",
        ).select(*current.columns)
        tmp = path.rstrip("/") + "._deleting"
        survivors.write.mode("overwrite").parquet(tmp)
        _swap_dirs(path, tmp)


def snapshot_overwrite(
    df: DataFrame, path: str, partition_col: str = "token_id"
) -> None:
    """S9 delete+reinsert snapshot sink: dynamic partition overwrite
    replaces exactly the partitions present in ``df`` (Delta
    ``replaceWhere`` analogue), leaving other keys' snapshots intact."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def leaf_parquet_dirs(path: str) -> dict[str, int]:
    """Map of directory -> direct ``*.parquet`` file count for every
    non-hidden directory under ``path`` that holds data files directly.
    A hive-partitioned table yields its leaf partition dirs; an
    unpartitioned table yields ``path`` itself. The skip rule mirrors
    Spark's path filter EXACTLY: any ``.``-prefixed entry is metadata
    (in-flight ``._compacting`` temps and ``._old`` backups — even
    when the name contains ``=``), and a ``_``-prefixed entry is
    metadata unless it contains ``=`` (``__day=...`` partition dirs
    are data, ``_SUCCESS`` is not). The pre-r12 rule kept any
    ``=``-containing name, so a leaf swap's temp/backup counted as
    data (ADVICE r11)."""
    out: dict[str, int] = {}
    for dirpath, dirnames, filenames in os.walk(path):
        dirnames[:] = [
            d
            for d in dirnames
            if not d.startswith(".") and ("=" in d or not d.startswith("_"))
        ]
        n = sum(1 for f in filenames if f.endswith(".parquet"))
        if n:
            out[dirpath] = n
    return out


def excess_file_count(path: str, files_per_partition: int = 1) -> int:
    """How many data files a compaction pass could actually remove:
    per-leaf-directory count beyond the ``files_per_partition`` target,
    summed. This is the compaction GATE (ADVICE r10): gating on the
    TOTAL file count re-triggers a full rewrite every slot once a
    partitioned table simply has more partitions than the threshold —
    e.g. compacted trades keep one file per day forever, and a
    year-retention partials store holds 365 single-file days that no
    rewrite can shrink."""
    return sum(
        max(0, n - files_per_partition)
        for n in leaf_parquet_dirs(path).values()
    )


def compact_table(
    spark: SparkSession,
    path: str,
    partition_col: str | Sequence[str] | None = "dt",
    files_per_partition: int = 1,
    zorder_by: Sequence[str] | None = None,
    guard=None,
    dirty_only: bool = False,
) -> dict[str, int]:
    """Small-file compaction for append-heavy tables (every streaming
    micro-batch appends a file per task; a 60s-cadence ingest makes
    thousands of sub-MB files per day, and scan planning degrades with
    file count — the lakehouse OPTIMIZE operation).

    Rewrites the table with ``files_per_partition`` files per
    partition via a write-to-temp + swap (Spark cannot safely overwrite
    the path it is reading; on an object store the swap becomes a
    manifest/metadata commit — this local form documents the seam).
    Returns {"files_before": n, "files_after": m}.

    ``guard`` — optional callable evaluated AFTER the writer lock is
    acquired; a falsy return skips the rewrite (``{"skipped": 1}`` in
    the result). This closes the ADVICE r10 TOCTOU for tables whose
    replay identity a rewrite could destroy (ohlcv_1m's tag-named
    files): the caller's precondition (no unsettled streaming batch) is
    re-checked at the moment it matters, under the same lock the
    streaming appends take — a batch that writes its ``started`` marker
    after the check blocks on this lock until the swap completes, so
    its files land in the new directory untouched.

    ``dirty_only`` — for a hive-partitioned table, rewrite ONLY leaf
    partition dirs holding more than ``files_per_partition`` files
    (each swapped independently under the table lock). Keeps the
    hourly compact slot O(new data): a year-old day-partitioned fact
    table has one dirty partition (today), not 365.
    """

    def count_files(p: str) -> int:
        return sum(leaf_parquet_dirs(p).values())

    with _table_lock(path):
        recover_leaf_leftovers(path)
        if guard is not None and not guard():
            n = count_files(path)
            return {"files_before": n, "files_after": n, "skipped": 1}
        before = count_files(path)
        if dirty_only:
            leaves = leaf_parquet_dirs(path)
            if path not in leaves:  # partitioned on disk
                for leaf, n in leaves.items():
                    if n <= files_per_partition:
                        continue
                    # the write-to-temp executes the scan while the
                    # leaf's files are still in place; the swap follows.
                    # Dot-prefixed temp/backup: invisible to readers
                    # during AND after a crashed swap (ADVICE r11)
                    tmp, old = _leaf_swap_paths(leaf)
                    (
                        spark.read.parquet(leaf)
                        .coalesce(files_per_partition)
                        .write.mode("overwrite")
                        .parquet(tmp)
                    )
                    _swap_dirs(leaf, tmp, old=old)
                return {"files_before": before, "files_after": count_files(path)}
            # unpartitioned: a full rewrite is the only form — fall through
        df = spark.read.parquet(path)
        tmp = path.rstrip("/") + "._compacting"
        part_cols = (
            [partition_col] if isinstance(partition_col, str) else list(partition_col or [])
        )
        if part_cols and all(c in df.columns for c in part_cols):
            (
                df.repartition(files_per_partition, *[F.col(c) for c in part_cols])
                .write.mode("overwrite")
                .partitionBy(*part_cols)
                .parquet(tmp)
            )
        elif zorder_by:
            # OPTIMIZE ZORDER analogue: rewrite clustered on the
            # Z-curve so footer min-max stats prune files for
            # predicates on any of the clustering columns
            from .layout import with_zvalue

            (
                with_zvalue(df, zorder_by)
                .repartitionByRange(max(files_per_partition, 1), F.col("__z"))
                .sortWithinPartitions("__z")
                .drop("__z")
                .write.mode("overwrite")
                .parquet(tmp)
            )
        else:
            df.coalesce(files_per_partition).write.mode("overwrite").parquet(tmp)
        _swap_dirs(path, tmp)
        return {"files_before": before, "files_after": count_files(path)}


def migrate_to_day_layout(
    spark: SparkSession,
    path: str,
    day_of: str,
    guard=None,
) -> dict[str, int]:
    """One-shot upgrade of a LEGACY flat streamed store (root-level
    data files) to the ``__day=`` partitioned layout the streaming
    appends now produce: read, rewrite day-partitioned to a temp dir,
    swap under the table writer lock. After the swap, appends
    partition and compaction goes dirty-only; a store that already has
    no root-level files is left untouched (no-op).

    ``guard`` is re-checked under the lock (same contract as
    ``compact_table``) — for ohlcv_1m pass a no-unsettled-batch check,
    since the rewrite strips the tag-named replay identity exactly
    like a compaction does."""
    import glob

    with _table_lock(path, timeout_s=300.0):
        if not glob.glob(os.path.join(path, "*.parquet")):
            n = sum(leaf_parquet_dirs(path).values())
            return {
                "files_before": n, "files_after": n, "skipped": 1,
                "reason": "already-partitioned",
            }
        if guard is not None and not guard():
            n = sum(leaf_parquet_dirs(path).values())
            return {
                "files_before": n, "files_after": n, "skipped": 1,
                "reason": "guard",
            }
        before = sum(leaf_parquet_dirs(path).values())
        df = spark.read.parquet(path)
        tmp = path.rstrip("/") + "._migrating"
        (
            df.withColumn("__day", F.to_date(day_of))
            .repartition(F.col("__day"))
            .write.mode("overwrite")
            .partitionBy("__day")
            .parquet(tmp)
        )
        _swap_dirs(path, tmp)
        return {
            "files_before": before,
            "files_after": sum(leaf_parquet_dirs(path).values()),
        }
