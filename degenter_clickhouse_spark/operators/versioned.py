"""Manifest-versioned parquet tables: atomic commits, time travel, and
file-pruned copy-on-write MERGE — the lakehouse-format pattern
(Iceberg/Delta snapshot isolation) in dependency-free parquet.

The reference mutates state tables in place under a single-writer jobs
runner (jobs/runner.js; core/tokens.js:387-415 upsert). The plain
parquet paths in operators/merge.py reproduce those semantics but swap
whole directories; at 100 TB a whole-table rewrite per upsert is
impossible — lakehouse formats solve it with IMMUTABLE data files plus
a versioned manifest, committing by atomically advancing a pointer.
delta-spark cannot be installed in this environment, so this module
implements the pattern directly:

* ``path/data/``      immutable parquet files, never rewritten in place
* ``path/_v/{N}.json``  manifest: the exact file list of version N
* ``path/_v/LATEST``    current version number, advanced by atomic
                        ``os.replace`` — THE commit point. A crash
                        anywhere before it leaves readers on the prior
                        version and only orphan data files behind
                        (reclaimed by ``vt_vacuum``); there is no
                        torn-state window at all, unlike the
                        rename-swap in merge.py. On an object store
                        the replace becomes a conditional put.

Readers never take locks: a read resolves LATEST (or an explicit
``version=`` for time travel) to one manifest and scans exactly those
files — stable even while a writer commits the next version.

Writers serialize through merge.py's advisory ``_table_lock`` and
additionally verify at commit time that LATEST still equals the
version they read (``VersionConflict`` otherwise) — lock plus
optimistic check, the same discipline Delta applies per commit.

MERGE cost model: ``vt_upsert`` touches only the files that CONTAIN a
matching key — membership is decided by scanning the key column of the
current snapshot tagged with ``input_file_name()`` (column-pruned; at
scale the same decision reads parquet footer min/max instead).
Untouched files carry over into the new manifest by reference; the
rewrite cost is proportional to the files hit, not the table.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .joins import dim_broadcast
from .merge import _table_lock

_V = "_v"
_DATA = "data"


class VersionConflict(RuntimeError):
    pass


def _vdir(path: str) -> str:
    return os.path.join(path, _V)


def _latest_file(path: str) -> str:
    return os.path.join(_vdir(path), "LATEST")


def vt_version(path: str) -> int:
    """Current committed version (0 = table does not exist yet)."""
    try:
        with open(_latest_file(path)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return 0


def _manifest(path: str, version: int) -> dict:
    with open(os.path.join(_vdir(path), f"{version}.json")) as f:
        return json.load(f)


def _write_data_files(spark: SparkSession, df: DataFrame, path: str) -> list[str]:
    """Materialize ``df`` as immutable files under ``path/data/`` and
    return their names. Spark writes a staging dir; files move in by
    rename (same filesystem by construction, a copy on object stores)."""
    stage = os.path.join(path, f".stage-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(stage)
    data_dir = os.path.join(path, _DATA)
    os.makedirs(data_dir, exist_ok=True)
    names = []
    for f in sorted(os.listdir(stage)):
        if not f.endswith(".parquet"):
            continue
        name = f"{uuid.uuid4().hex}.parquet"
        os.rename(os.path.join(stage, f), os.path.join(data_dir, name))
        names.append(name)
    shutil.rmtree(stage)
    return names


def _commit(
    path: str,
    parent: int,
    files: list[str],
    op: str,
    extra: dict | None = None,
) -> int:
    """Write manifest ``parent+1`` then atomically advance LATEST.
    Callers hold the writer lock; the optimistic check still guards
    against a lock-bypassing writer."""
    if vt_version(path) != parent:
        raise VersionConflict(
            f"table at {path} moved past v{parent} during this write"
        )
    version = parent + 1
    os.makedirs(_vdir(path), exist_ok=True)
    meta = {"version": version, "parent": parent, "op": op, "files": files}
    meta.update(extra or {})
    with open(os.path.join(_vdir(path), f"{version}.json"), "w") as f:
        json.dump(meta, f)
    tmp = _latest_file(path) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, _latest_file(path))  # the commit point
    return version


def vt_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Snapshot read of ``version`` (default: latest). Time travel =
    pass any still-retained version number."""
    v = version if version is not None else vt_version(path)
    if v == 0:
        raise FileNotFoundError(f"no committed version at {path}")
    files = _manifest(path, v)["files"]
    return spark.read.parquet(
        *[os.path.join(path, _DATA, f) for f in files]
    )


def vt_write(spark: SparkSession, df: DataFrame, path: str) -> int:
    """Create the table (v1) or replace its entire contents."""
    with _table_lock(path):
        parent = vt_version(path)
        files = _write_data_files(spark, df, path)
        return _commit(path, parent, files, "write")


def vt_append(spark: SparkSession, df: DataFrame, path: str) -> int:
    """New version = previous file list + the new rows' files. Existing
    files are referenced, never read or rewritten."""
    with _table_lock(path):
        parent = vt_version(path)
        old = _manifest(path, parent)["files"] if parent else []
        files = _write_data_files(spark, df, path)
        return _commit(path, parent, old + files, "append")


def vt_upsert(
    spark: SparkSession, updates: DataFrame, path: str, keys: list[str]
) -> int:
    """Copy-on-write MERGE: update-matched + insert-unmatched by key.

    Only files containing a matching key are rewritten (their
    non-matched rows survive via anti-join); every other file carries
    over by reference. Equivalent to Delta's ``MERGE WHEN MATCHED
    UPDATE ALL WHEN NOT MATCHED INSERT ALL`` for whole-row updates —
    the semantics of merge.upsert_write, now with snapshot isolation
    and per-file rewrite cost.
    """
    with _table_lock(path):
        parent = vt_version(path)
        if not parent:
            files = _write_data_files(spark, updates, path)
            return _commit(path, parent, files, "upsert")
        manifest = _manifest(path, parent)["files"]
        current = vt_read(spark, path, parent)
        hit = (
            current.withColumn("__file", F.input_file_name())
            .join(dim_broadcast(updates.select(*keys).distinct()), keys, "left_semi")
            .select("__file")
            .distinct()
            .collect()
        )
        hit_names = {os.path.basename(r["__file"]) for r in hit}
        kept = [f for f in manifest if f not in hit_names]
        if hit_names:
            touched = spark.read.parquet(
                *[os.path.join(path, _DATA, f) for f in sorted(hit_names)]
            )
            survivors = touched.join(
                dim_broadcast(updates.select(*keys).distinct()), keys, "left_anti"
            )
            rewritten = survivors.unionByName(updates)
        else:
            rewritten = updates
        files = _write_data_files(spark, rewritten, path)
        return _commit(path, parent, kept + files, "upsert")


def vt_delete(
    spark: SparkSession, path: str, keys: list[str], matching: DataFrame
) -> int:
    """Copy-on-write DELETE of rows whose key appears in ``matching``;
    same file-pruned rewrite as ``vt_upsert``."""
    with _table_lock(path):
        parent = vt_version(path)
        manifest = _manifest(path, parent)["files"]
        current = vt_read(spark, path, parent)
        hit = (
            current.withColumn("__file", F.input_file_name())
            .join(dim_broadcast(matching.select(*keys).distinct()), keys, "left_semi")
            .select("__file")
            .distinct()
            .collect()
        )
        hit_names = {os.path.basename(r["__file"]) for r in hit}
        kept = [f for f in manifest if f not in hit_names]
        files: list[str] = []
        if hit_names:
            touched = spark.read.parquet(
                *[os.path.join(path, _DATA, f) for f in sorted(hit_names)]
            )
            survivors = touched.join(
                dim_broadcast(matching.select(*keys).distinct()), keys, "left_anti"
            )
            files = _write_data_files(spark, survivors, path)
        return _commit(path, parent, kept + files, "delete")


def vt_history(path: str) -> list[dict]:
    """All retained versions, oldest first: version, parent, op,
    n_files."""
    out = []
    for v in range(1, vt_version(path) + 1):
        try:
            m = _manifest(path, v)
        except FileNotFoundError:
            continue  # vacuumed away
        out.append(
            {
                "version": m["version"],
                "parent": m["parent"],
                "op": m["op"],
                "n_files": len(m["files"]),
            }
        )
    return out


def vt_vacuum(path: str, keep_versions: int = 2) -> int:
    """Drop manifests older than the newest ``keep_versions`` and
    delete data files no retained manifest references (crash orphans
    included). Returns the number of files removed. Runs under the
    writer lock so a concurrent commit cannot race the liveness scan."""
    with _table_lock(path):
        latest = vt_version(path)
        keep = range(max(1, latest - keep_versions + 1), latest + 1)
        live: set[str] = set()
        for v in keep:
            live.update(_manifest(path, v)["files"])
        removed = 0
        data_dir = os.path.join(path, _DATA)
        for f in os.listdir(data_dir):
            if f not in live:
                os.remove(os.path.join(data_dir, f))
                removed += 1
        for v in range(1, max(1, latest - keep_versions + 1)):
            try:
                os.remove(os.path.join(_vdir(path), f"{v}.json"))
            except FileNotFoundError:
                pass
        return removed


def vt_append_batch(
    spark: SparkSession, df: DataFrame, path: str, batch_id: int
) -> int | None:
    """Exactly-once streaming sink primitive for ``foreachBatch``.

    foreachBatch is at-least-once: after a crash between sink write and
    checkpoint commit, Spark REPLAYS the last micro-batch. Plain
    appends then duplicate rows (the round-3 streaming-corpus advice
    item, fixed there with batch-id-scoped paths). Here the manifest
    itself records the batch id, and a replayed id is detected by
    walking the manifest chain — the append becomes a no-op (returns
    None), so at-least-once delivery + idempotent commit = exactly-once
    table contents.

    Only the tail of the chain needs to be consistent for this to hold
    (a replay can only ever be of the most recent batches, bounded by
    the checkpoint); vacuuming manifests older than the checkpoint
    horizon is therefore safe.
    """
    with _table_lock(path):
        parent = vt_version(path)
        v = parent
        while v:
            m = _manifest(path, v)
            if m.get("batch_id") == batch_id:
                return None  # replayed micro-batch: already committed
            v = m["parent"]
        old = _manifest(path, parent)["files"] if parent else []
        files = _write_data_files(spark, df, path)
        return _commit(
            path, parent, old + files, "append_batch", extra={"batch_id": batch_id}
        )


def vt_compact(spark: SparkSession, path: str, target_files: int = 8) -> int:
    """Rewrite the current snapshot as ``target_files`` files in one
    new version — the OPTIMIZE step for append-fragmented tables.
    History (and time travel to pre-compaction versions) is preserved
    until ``vt_vacuum`` reclaims it; readers mid-scan on the old
    version are untouched because their files are immutable."""
    with _table_lock(path):
        parent = vt_version(path)
        current = vt_read(spark, path, parent)
        files = _write_data_files(spark, current.coalesce(target_files), path)
        return _commit(path, parent, files, "compact")


def vt_changes(
    spark: SparkSession, path: str, from_version: int, to_version: int | None = None
) -> DataFrame:
    """Row-level diff between two versions (the change-data-feed
    analogue): each output row is a table row tagged ``__change`` =
    'insert' | 'delete'; an update surfaces as delete + insert of the
    key's old/new rows.

    Cost is file-pruned like the merges that produced the versions:
    files present in BOTH manifests are identical by immutability and
    are skipped entirely — only each side's exclusive files are read,
    and the anti-joins run over those subsets. Incremental consumers
    (downstream rollup refresh, cache invalidation) read the delta, not
    the table.
    """
    to_v = to_version if to_version is not None else vt_version(path)
    a = set(_manifest(path, from_version)["files"])
    b = set(_manifest(path, to_v)["files"])
    only_a, only_b = sorted(a - b), sorted(b - a)

    def _scan(names):
        return spark.read.parquet(
            *[os.path.join(path, _DATA, n) for n in names]
        )

    if not only_a and not only_b:
        base = vt_read(spark, path, to_v)
        return base.withColumn("__change", F.lit("insert")).limit(0)
    if not only_a:
        return _scan(only_b).withColumn("__change", F.lit("insert"))
    if not only_b:
        return _scan(only_a).withColumn("__change", F.lit("delete"))
    old, new = _scan(only_a), _scan(only_b)
    cols = old.columns
    inserts = new.exceptAll(old).withColumn("__change", F.lit("insert"))
    deletes = old.exceptAll(new).withColumn("__change", F.lit("delete"))
    return inserts.unionByName(deletes).select(*cols, "__change")
