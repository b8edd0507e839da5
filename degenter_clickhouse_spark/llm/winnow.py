"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
2003 — the MOSS algorithm): per document, hash every k-gram, then
keep the MINIMUM hash of each sliding window of ``w`` consecutive
k-gram hashes. The selected set is position-robust (any shared
substring of length >= k + w - 1 is GUARANTEED to contribute at least
one common fingerprint) and ~1/w the size of the full k-gram set —
the middle ground between MinHash (set-level Jaccard, no locality
guarantee) and exact-substring dedup (precise but heavier).

Spark-first shape: fingerprint selection is pure per-row array
expressions over the existing shingle-hash primitives (llm/text.py) —
zero shuffles; the pair stage shuffles once on the fingerprint value
with a stop-fingerprint cap (a fingerprint shared by more than
``max_fp_freq`` docs is boilerplate and is dropped BEFORE the
self-join, the same frequency-cap discipline as the LSH band join),
so pair work is bounded by cap^2 per fingerprint, never all-pairs.

Exact cross-engine contract: hashes are the repo's integer polynomial
rolls; the overlap score is emitted as ``floor(shared * 1e9 /
min(|A|, |B|))`` in pure BIGINT arithmetic, so DuckDB reproduces
every bit (queries/web_ext-style oracle in queries/winnow_ext.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import shingle_hash_array, word_hash_array

DEFAULT_K = 4  # k-gram length (words)
DEFAULT_W = 5  # winnowing window (k-gram hashes per window)
SCALE = 1_000_000_000


def winnow_fingerprints(
    docs: DataFrame,
    k: int = DEFAULT_K,
    w: int = DEFAULT_W,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, fp) — one row per DISTINCT winnowed fingerprint per doc:
    min of each length-``w`` window over the k-gram hash sequence.
    Documents with fewer than k words fingerprint to nothing (no
    k-grams); documents with fewer than k+w-1 words keep every k-gram
    hash (no full window exists — short docs degrade to
    full-resolution, which is still tiny)."""
    d = docs.withColumn("__hw", word_hash_array(f"split({text_col}, ' ')"))
    d = d.withColumn("__ks", shingle_hash_array("__hw", k))
    wins = F.expr(
        f"CASE WHEN size(__ks) >= {int(w)} THEN "
        f"transform(sequence(1, size(__ks) - {int(w) - 1}), "
        f"i -> array_min(slice(__ks, i, {int(w)}))) "
        f"ELSE __ks END"
    )
    return d.select(
        F.col(id_col), F.explode(F.array_distinct(wins)).alias("fp")
    )


def _capped_pairs(
    fps: DataFrame, max_fp_freq: int, min_shared: int, id_col: str
) -> DataFrame:
    """Shared pair stage: frequency-cap the (id, fp) rows, then emit
    (d1 < d2, shared) pair counts.

    The C(k, 2) combination explode replaces the old fp self-join —
    whose two exchanges + join Spark never shared at runtime (0
    ReusedExchange observed). Order of operations is skew-safe for a
    100 TB corpus: the frequency cap is applied FIRST with a
    partial-aggregating count + semi-join (a boilerplate fingerprint
    held by 1e8 docs ships one partial row per map task and is dropped
    before anything collects), and only then does the bounded
    ``collect_list`` run — its buffer never exceeds ``max_fp_freq``
    members, and it piggybacks on the semi-join's fp partitioning (no
    extra exchange). The (id, fp) rows are unique by the callers'
    contract, so each qualifying pair appears exactly once per shared
    fingerprint — identical counts to the self-join form."""
    rare = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= int(max_fp_freq))
        .select("fp")
    )
    keep = fps.join(rare, "fp", "left_semi")
    per_fp = keep.groupBy("fp").agg(
        F.sort_array(F.collect_list(F.col(id_col))).alias("__ds")
    )
    combos = F.expr(
        "flatten(transform(__ds, (x, i) -> "
        "transform(slice(__ds, i + 2, size(__ds)), "
        "y -> struct(x AS d1, y AS d2))))"
    )
    return (
        per_fp.select(F.explode(combos).alias("p"))
        .select("p.d1", "p.d2")
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .filter(F.col("shared") >= int(min_shared))
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    k: int = DEFAULT_K,
    w: int = DEFAULT_W,
    min_shared: int = 2,
    max_fp_freq: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Document pairs ranked by winnowed-fingerprint overlap:
    (d1, d2, shared, min_fps, overlap_1e9) with d1 < d2,
    ``overlap_1e9 = floor(shared * 1e9 / min(|fps(d1)|, |fps(d2)|))``
    — integer-exact containment-style score in [0, 1e9].

    Fingerprints held by more than ``max_fp_freq`` docs are dropped
    before the pair join (boilerplate/stop-fingerprints — they carry
    no discrimination and their pair blow-up is quadratic); the cap is
    reported nowhere in-row, so callers comparing corpora should hold
    it fixed like any LSH hyper-parameter."""
    # lazy localCheckpoint: the fingerprint frame feeds FOUR consumers
    # (sizes, the frequency cap, both sides of the pair join) — the
    # per-doc hash work runs once at the first action instead of once
    # per branch, and the call itself stays plan-building-cheap (an
    # eager checkpoint here moved ~4s of execution into query
    # CONSTRUCTION, which the bench measures as pure overhead)
    fps = winnow_fingerprints(docs, k, w, id_col, text_col).localCheckpoint(
        eager=False
    )
    sizes = fps.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_fp"))
    pairs = _capped_pairs(fps, max_fp_freq, min_shared, id_col)
    s1 = sizes.select(F.col(id_col).alias("d1"), F.col("n_fp").alias("n1"))
    s2 = sizes.select(F.col(id_col).alias("d2"), F.col("n_fp").alias("n2"))
    # Plain shuffle joins on purpose (ADVICE r8): `sizes` derives from
    # a localCheckpoint'd frame, so Catalyst reports the Long.MaxValue
    # "no estimate" sentinel and dim_broadcast's sentinel branch would
    # FORCE-broadcast it — collecting O(n_docs) rows to the driver at
    # corpus scale. The pairs frame is already doc-pair-sized, so the
    # shuffle here is bounded by the pair output, not the corpus.
    return (
        pairs.join(s1, "d1")
        .join(s2, "d2")
        .select(
            "d1",
            "d2",
            "shared",
            F.least("n1", "n2").cast("long").alias("min_fps"),
            F.expr(f"(shared * {SCALE}) div least(n1, n2)")
            .cast("long")
            .alias("overlap_1e9"),
        )
    )


# ---------------------------------------------------------------------------
# Persisted winnow index (VERDICT r8 #8): the build-once/probe-many
# lifecycle the other dedup families have (llm/dedup.build_minhash_index
# is the template). Layout:
#
#   path/fps    — (d, fp) partitioned by (__idb, __fpb): __fpb is a
#                 hash bucket OF THE FINGERPRINT, so a probe prunes to
#                 the query's fingerprint buckets; __idb is a hash
#                 bucket OF THE DOC ID, so the append replay guard
#                 prunes to the batch's id buckets (the r8 IVF/PQ
#                 nested-bucket discipline — both reads are O(batch),
#                 never O(index)).
#   path/sizes  — (d, n_fp) partitioned by __idb (per-doc fingerprint
#                 counts for the overlap denominator + the id store
#                 the replay guard anti-joins against).
#
# Replay convergence: appends guard per-doc (anti-join on stored ids,
# bucket-pruned), write fps BEFORE sizes, and every probe read
# ``.distinct()``s its candidate-sized slice — a crash anywhere
# mid-append leaves at-most-duplicated rows that the next replay
# completes and the dedup-at-read makes invisible.
# ---------------------------------------------------------------------------

N_FP_BUCKETS = 16
N_WID_BUCKETS = 8


def _fp_bucket(col: str) -> F.Column:
    return F.pmod(F.xxhash64(F.col(col)), F.lit(N_FP_BUCKETS)).cast("int")


def _wid_bucket(col: str) -> F.Column:
    return F.pmod(F.xxhash64(F.col(col)), F.lit(N_WID_BUCKETS)).cast("int")


def build_winnow_index(
    docs: DataFrame,
    path: str,
    k: int = DEFAULT_K,
    w: int = DEFAULT_W,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist the corpus's winnowed fingerprints so new shards check
    overlap against the corpus WITHOUT re-fingerprinting it."""
    import os

    fps = winnow_fingerprints(docs, k, w, id_col, text_col).localCheckpoint(
        eager=False
    )
    (
        fps.withColumn("__idb", _wid_bucket(id_col))
        .withColumn("__fpb", _fp_bucket("fp"))
        .repartition(F.col("__idb"), F.col("__fpb"))
        .write.mode("overwrite")
        .partitionBy("__idb", "__fpb")
        .parquet(os.path.join(path, "fps"))
    )
    (
        fps.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_fp"))
        .withColumn("__idb", _wid_bucket(id_col))
        .repartition(F.col("__idb"))
        .write.mode("overwrite")
        .partitionBy("__idb")
        .parquet(os.path.join(path, "sizes"))
    )


def _stored_winnow_ids_for(sizes: DataFrame, new_docs: DataFrame, id_col: str):
    """Stored doc ids restricted to the new batch's id-hash buckets —
    the bucket list collects driver-side (<= N_WID_BUCKETS ints) and
    becomes a static IN partition filter, so the guard read prunes
    every untouched bucket's files at planning (O(batch), the
    similarity._stored_ids_for discipline)."""
    buckets = [
        r.b
        for r in new_docs.select(_wid_bucket(id_col).alias("b")).distinct().collect()
    ]
    return sizes.where(F.col("__idb").isin(buckets)).select(id_col)


def winnow_index_append(
    spark,
    new_docs: DataFrame,
    path: str,
    k: int = DEFAULT_K,
    w: int = DEFAULT_W,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Append a new shard's fingerprints, effectively-once: docs whose
    ids are already stored (bucket-pruned anti-join) append nothing,
    so replaying a shard is a no-op and a crashed append converges on
    the next replay (see module layout note). Returns the number of
    newly indexed docs."""
    import os

    from ..operators.merge import _table_lock

    with _table_lock(path):
        sizes = spark.read.parquet(os.path.join(path, "sizes"))
        existing = _stored_winnow_ids_for(sizes, new_docs, id_col)
        fresh = new_docs.join(existing, on=id_col, how="left_anti").cache()
        try:
            n_new = fresh.count()
            if not n_new:
                return 0
            fps = winnow_fingerprints(fresh, k, w, id_col, text_col).localCheckpoint(
                eager=True
            )
            (
                fps.withColumn("__idb", _wid_bucket(id_col))
                .withColumn("__fpb", _fp_bucket("fp"))
                .repartition(F.col("__idb"), F.col("__fpb"))
                .write.mode("append")
                .partitionBy("__idb", "__fpb")
                .parquet(os.path.join(path, "fps"))
            )
            (
                fps.groupBy(id_col)
                .agg(F.count(F.lit(1)).alias("n_fp"))
                .withColumn("__idb", _wid_bucket(id_col))
                .repartition(F.col("__idb"))
                .write.mode("append")
                .partitionBy("__idb")
                .parquet(os.path.join(path, "sizes"))
            )
            return n_new
        finally:
            fresh.unpersist()


def winnow_index_probe(
    spark,
    path: str,
    new_docs: DataFrame,
    k: int = DEFAULT_K,
    w: int = DEFAULT_W,
    min_shared: int = 2,
    max_fp_freq: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlap pairs TOUCHING the new shard (new x corpus and
    new x new) with the same (d1, d2, shared, min_fps, overlap_1e9)
    contract as ``winnow_overlap_pairs`` — only the shard is
    fingerprinted; the index read prunes to the shard's fingerprint
    buckets (and sizes to the candidates' id buckets), so probe cost
    tracks the shard and its collisions, not the corpus.

    The frequency cap counts document frequency over (pruned index +
    shard) rows per fingerprint — identical to the full-frame count
    for every fingerprint the shard holds, because a fingerprint's
    index rows all live in its own bucket."""
    import os

    from ..operators.joins import dim_broadcast

    q_fps = winnow_fingerprints(new_docs, k, w, id_col, text_col).localCheckpoint(
        eager=False
    )
    q_ids = new_docs.select(id_col).distinct()
    fp_buckets = [
        r.b for r in q_fps.select(_fp_bucket("fp").alias("b")).distinct().collect()
    ]
    stored = (
        spark.read.parquet(os.path.join(path, "fps"))
        .where(F.col("__fpb").isin(fp_buckets))
        .select(id_col, "fp")
        # BROADCAST the shard fp set (optimization r14): the shuffle
        # semi-join exchanged BOTH the pruned index slice and the shard
        # fps by fp — two exchanges + an AQE stage round-trip each, for
        # a probe-sized build side. The shard's distinct fingerprints
        # are batch-bounded, the same scale contract as the q_ids
        # anti-join below (shard-derived sets broadcast; the corpus
        # never does).
        .join(dim_broadcast(q_fps.select("fp").distinct()), "fp", "left_semi")
        # dedup + overlap removal on the SMALL side only (optimization
        # r13): converged-replay dup rows dedup with a distinct of the
        # collision-sized stored slice, and docs that are both in the
        # index and in the shard keep only their fresh q_fps rows via a
        # broadcast anti-join — the previous union-then-distinct paid a
        # full exchange of (stored + shard) for rows only the stored
        # side could ever duplicate. q_fps rows are already unique per
        # doc (winnow_fingerprints emits array_distinct), so the union
        # below needs no dedup at all.
        .join(dim_broadcast(q_ids.select(F.col(id_col))), id_col, "left_anti")
        .distinct()
        # pinned (optimization r14): three consumers — the pair union,
        # the sizes semi-join's id set, and the sizes bucket collect —
        # and the collision-sized slice is the cheapest thing in this
        # query to materialize once
        .localCheckpoint(eager=False)
    )
    all_fps = stored.unionByName(q_fps.select(id_col, "fp"))
    pairs = _capped_pairs(all_fps, max_fp_freq, min_shared, id_col)
    # keep only pairs touching the shard (index x index collisions in
    # a shared bucket are corpus-internal — not this probe's business).
    # OR-of-two-broadcast-flags instead of union-of-two-semi-joins: the
    # union form evaluated the whole pair aggregation subtree TWICE and
    # needed a full distinct exchange to collapse the overlap (pairs
    # with BOTH endpoints in the shard); two broadcast left joins + one
    # filter keep a single evaluation, no union, no distinct — the pair
    # set is already unique
    q1 = dim_broadcast(
        q_ids.select(F.col(id_col).alias("d1"), F.lit(1).alias("__m1"))
    )
    q2 = dim_broadcast(
        q_ids.select(F.col(id_col).alias("d2"), F.lit(1).alias("__m2"))
    )
    pairs = (
        pairs.join(q1, "d1", "left")
        .join(q2, "d2", "left")
        .filter(F.col("__m1").isNotNull() | F.col("__m2").isNotNull())
        .select("d1", "d2", "shared")
    )
    # sizes: fresh for the shard; bucket-pruned stored rows for the
    # candidate index docs. Candidates are bounded by the STORED slice
    # ids (every non-shard pair endpoint came from `stored`), so the
    # bucket list and the semi-join's id set both read off the pinned
    # slice (optimization r14) — the old shape collected the bucket
    # list from the PAIR output, which forced the whole pair pipeline
    # to materialize in a separate blocking job (and made `pairs` a
    # two-consumer frame needing its own checkpoint). A stored id
    # without a qualifying pair adds a harmless row that the final
    # inner joins drop; the result set is identical.
    q_sizes = q_fps.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_fp"))
    id_buckets = [
        r.b
        for r in stored.select(_wid_bucket(id_col).alias("b")).distinct().collect()
    ]
    sizes = q_sizes
    if id_buckets:
        stored_sizes = (
            spark.read.parquet(os.path.join(path, "sizes"))
            .where(F.col("__idb").isin(id_buckets))
            .select(id_col, "n_fp")
            .distinct()  # dedup-at-read, as above
            .join(dim_broadcast(stored.select(id_col).distinct()), id_col, "left_semi")
        )
        sizes = q_sizes.unionByName(stored_sizes)
    s1 = sizes.select(F.col(id_col).alias("d1"), F.col("n_fp").alias("n1"))
    s2 = sizes.select(F.col(id_col).alias("d2"), F.col("n_fp").alias("n2"))
    # plain shuffle joins (pairs is collision-sized; sizes derives from
    # checkpointed frames whose Catalyst estimate is the sentinel)
    return (
        pairs.join(s1, "d1")
        .join(s2, "d2")
        .select(
            "d1",
            "d2",
            "shared",
            F.least("n1", "n2").cast("long").alias("min_fps"),
            F.expr(f"(shared * {SCALE}) div least(n1, n2)")
            .cast("long")
            .alias("overlap_1e9"),
        )
    )


def compact_winnow_index(spark, path: str, files_per_partition: int = 1) -> dict:
    """Small-file compaction for a streaming-grown winnow index —
    probes before and after see identical state."""
    import os

    from ..operators.merge import compact_table

    return {
        "fps": compact_table(
            spark,
            os.path.join(path, "fps"),
            partition_col=("__idb", "__fpb"),
            files_per_partition=files_per_partition,
        ),
        "sizes": compact_table(
            spark,
            os.path.join(path, "sizes"),
            partition_col="__idb",
            files_per_partition=files_per_partition,
        ),
    }
