"""Similarity search over embedding columns (array<float>).

Determinism trick shared with the oracles: the dot product and squared
norms are accumulated as BIGINT after scaling each pointwise product by
1e12 and flooring — exact integer sums are order-independent, so the
cosine is bit-identical regardless of shuffle order or engine.

Scale design (100 TB): ``brute_topk`` is the correctness baseline —
a broadcast of the (small) query set against the full candidate table,
one pass, no candidate shuffle. ``lsh_topk`` is the scale path: random-
hyperplane signatures bucket the candidates so each query only scores
its bucket (plus multi-probe neighbors); the bucket id is the shuffle
key. For billion-vector corpora swap the bucketer for IVF centroids
(kmeans fit offline) — the plumbing (bucket column + per-bucket top-k)
is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from ..operators.joins import dim_broadcast

SCALE = "1e12"


def scaled_dot(a: str, b: str) -> F.Column:
    """Exact-integer scaled dot product of two float arrays."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * {SCALE}) AS BIGINT)), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def scaled_norm2(a: str) -> F.Column:
    return F.expr(
        f"aggregate(transform({a}, x -> "
        f"CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * {SCALE}) AS BIGINT)), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def cosine_from_scaled(dot_s: F.Column, n1_s: F.Column, n2_s: F.Column) -> F.Column:
    return (dot_s / F.lit(1e12)) / (
        F.sqrt(n1_s / F.lit(1e12)) * F.sqrt(n2_s / F.lit(1e12))
    )


def with_norm(vectors: DataFrame, vec: str = "embedding") -> DataFrame:
    return vectors.withColumn("norm2_s", scaled_norm2(vec))


def brute_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector. Queries are
    broadcast; candidates stream through in one pass."""
    q = with_norm(queries, vec).select(
        F.col(id_col).alias("q_id"), F.col(vec).alias("q_vec"), F.col("norm2_s").alias("q_n2")
    )
    c = with_norm(candidates, vec).select(
        F.col(id_col).alias("c_id"), F.col(vec).alias("c_vec"), F.col("norm2_s").alias("c_n2")
    )
    pairs = c.crossJoin(dim_broadcast(q)).filter(F.col("c_id") != F.col("q_id"))
    scored = pairs.withColumn("dot_s", scaled_dot("q_vec", "c_vec")).withColumn(
        "cosine", cosine_from_scaled(F.col("dot_s"), F.col("q_n2"), F.col("c_n2"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cosine", "rank")
    )


def neardup_pairs(
    vectors: DataFrame,
    threshold: float,
    group_col: str | None = "label",
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs. ``group_col`` (when set)
    is the blocking key — the 100 TB answer to 'never all-pairs': an
    equality join on a cheap precomputed bucket (label, LSH band, IVF
    cell) bounds the quadratic term."""
    v = with_norm(vectors, vec)
    a = v.select(
        *( [F.col(group_col).alias("g")] if group_col else [] ),
        F.col(id_col).alias("v1"),
        F.col(vec).alias("e1"),
        F.col("norm2_s").alias("n1"),
    )
    b = v.select(
        *( [F.col(group_col).alias("g")] if group_col else [] ),
        F.col(id_col).alias("v2"),
        F.col(vec).alias("e2"),
        F.col("norm2_s").alias("n2"),
    )
    on = [F.col("a.v1") < F.col("b.v2")]
    if group_col:
        on.insert(0, F.col("a.g") == F.col("b.g"))
    pairs = a.alias("a").join(b.alias("b"), on[0] if len(on) == 1 else on[0] & on[1])
    scored = pairs.withColumn("dot_s", scaled_dot("e1", "e2")).withColumn(
        "cosine", cosine_from_scaled(F.col("dot_s"), F.col("a.n1"), F.col("b.n2"))
    )
    out = scored.filter(F.col("cosine") >= threshold)
    sel = [F.col("a.v1").alias("v1"), F.col("b.v2").alias("v2"), F.col("cosine")]
    if group_col:
        sel.append(F.col("a.g").alias(group_col))
    return out.select(*sel)


N_HYPERPLANES = 4

# Adaptive sizing: with FIXED bits the per-bucket population — and so
# the blocked pair joins built on these buckets — grows linearly with
# the corpus, i.e. pair count grows QUADRATICALLY (the sf1 spot-check
# measured knn_label_vote_blocked at 42x for 10x data). The scale law
# that holds at 100 TB is a fixed target bucket SIZE: bits =
# log2(n / target), so per-vector candidate count stays ~target x
# (1 + bits) regardless of corpus size.
BUCKET_TARGET = 128


def adaptive_hyperplane_bits(
    n: int, target: int = BUCKET_TARGET, lo: int = N_HYPERPLANES, hi: int = 24
) -> int:
    """Hyperplane-bit count giving ~``target`` vectors per bucket for a
    corpus of ``n``: clamp(ceil(log2(n / target)), lo, hi). At the
    oracle scales (n <= ~2000 with the defaults) this returns ``lo`` =
    N_HYPERPLANES, keeping the static 4-bit oracle SQL exact —
    asserted in tests/test_classify.py."""
    import math

    if n <= target:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(n / target))))


def adaptive_ivf_cells(n: int, lo: int = 8, hi: int = 65536) -> int:
    """IVF cell count for a corpus of ``n`` vectors: ~sqrt(n)/4 rounded
    up to a power of two, clamped to [lo, hi] — the FAISS-style
    nlist ~ sqrt(n) balance between assignment cost (n x cells) and
    probe cost (nprobe x n / cells). At the oracle scales (n <= 500
    embeddings) this returns ``lo`` = 8, keeping the static 8-cell
    oracle SQL exact (asserted in tests)."""
    import math

    if n <= 1:
        return lo
    raw = math.sqrt(n) / 4
    if raw <= lo:
        return lo
    return min(hi, 1 << math.ceil(math.log2(raw)))


def hyperplane_bucket(vec: str = "embedding", bits: int = N_HYPERPLANES) -> F.Column:
    """Deterministic random-hyperplane LSH bucket id: ``bits`` sign
    bits of dot(v, h_j) where h_j[i] = frac((j*37 + i*101) * phi) - 0.5
    — a fixed pseudo-random hyperplane family needing no fitted model.
    The family is PREFIX-STABLE: bucket(bits=b) == bucket(bits=b+1)
    masked to the low b bits, so raising bits only splits buckets."""
    bits_ = []
    for j in range(bits):
        comp = (
            f"CAST((({j} * 37 + (i - 1) * 101) * 2654435761) % 1000000 AS DOUBLE) "
            f"/ 1000000.0 - 0.5"
        )
        dot = (
            f"aggregate(transform(sequence(1, size({vec})), i -> "
            f"CAST({vec}[i - 1] AS DOUBLE) * ({comp})), CAST(0.0 AS DOUBLE), "
            f"(acc, x) -> acc + x)"
        )
        bits_.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << j} ELSE 0 END)")
    return F.expr(" + ".join(bits_)).cast("int")


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec: str = "embedding",
    bits: int | None = None,
) -> DataFrame:
    """Approximate top-k with multi-probe: each query scores its own
    hyperplane bucket plus every 1-bit-flip neighbor bucket (for cos
    ~0.3 neighbors that takes per-neighbor collision probability from
    ~(0.6)^4 to ~0.48). Recall vs brute_topk is asserted in
    tests/test_llm.py. ``bits=None`` sizes the family from a
    planning-time candidate count (adaptive_hyperplane_bits) so the
    per-query scoring cost corpus / 2^bits x (1 + bits) stays ~constant
    as the corpus grows; at the oracle scales that resolves to
    N_HYPERPLANES, keeping the static 4-bit oracles exact."""
    if bits is None:
        bits = adaptive_hyperplane_bits(candidates.count())
    probes = F.array(
        F.col("bucket"), *[F.col("bucket").bitwiseXOR(1 << j) for j in range(bits)]
    )
    q = (
        with_norm(queries, vec)
        .withColumn("bucket", hyperplane_bucket(vec, bits=bits))
        .withColumn("bucket", F.explode(probes))
        .select(
            F.col(id_col).alias("q_id"), F.col(vec).alias("q_vec"),
            F.col("norm2_s").alias("q_n2"), "bucket",
        )
    )
    c = with_norm(candidates, vec).withColumn(
        "bucket", hyperplane_bucket(vec, bits=bits)
    ).select(
        F.col(id_col).alias("c_id"), F.col(vec).alias("c_vec"),
        F.col("norm2_s").alias("c_n2"), "bucket",
    )
    pairs = c.join(dim_broadcast(q), "bucket").filter(F.col("c_id") != F.col("q_id"))
    scored = pairs.withColumn("dot_s", scaled_dot("q_vec", "c_vec")).withColumn(
        "cosine", cosine_from_scaled(F.col("dot_s"), F.col("q_n2"), F.col("c_n2"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# IVF index: k-means-lite centroids + nprobe cell search — the
# billion-vector scale path (bucket by learned cells instead of random
# hyperplanes; same per-bucket top-k plumbing as lsh_topk)
# ---------------------------------------------------------------------------


def fit_ivf_centroids(
    vectors: DataFrame,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Lloyd's iterations entirely in DataFrame ops: seeds = the k
    lowest-id vectors (deterministic), assignment = argmin scaled-L2
    against broadcast centroids, update = per-component mean via
    posexplode. Each iteration is one broadcast join + two shuffles;
    centroids stay dimension-sized throughout. ``vectors`` is cached
    for the loop (every iteration re-reads it twice: assignment +
    mean update) and released before returning."""
    # the cache only pays for itself inside the Lloyd loop; iters=0
    # (seed centroids) skips both the cache and the final checkpoint —
    # the seed subtree is a tiny orderBy+limit recomputed in-plan
    if iters > 0:
        vectors = vectors.cache()
    cents = (
        vectors.orderBy(F.col(id_col).asc())
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy(F.col(id_col))).alias("cell"),
            F.col(vec).alias("centroid"),
        )
    )
    for _ in range(iters):
        assigned = assign_cells(vectors, cents, id_col=id_col, vec=vec)
        cents = (
            assigned.join(vectors, id_col)
            .select("cell", F.posexplode(vec).alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"].cast("float"),
                ).alias("centroid")
            )
        )
    if iters > 0:
        # materialize the final centroids (tiny) before releasing the cache
        cents = cents.localCheckpoint(eager=True)
        vectors.unpersist()
    return cents


def assign_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """(id, cell) assignment to the ``nprobe`` nearest centroids by
    scaled-integer L2 (deterministic).

    MAP-ONLY shape (optimization r13): the centroid table folds into a
    one-row sorted array that broadcasts, and each vector picks its
    ``nprobe`` nearest cells with a pure array expression —
    ``array_sort`` over (dist, cell) structs sorts exactly like the old
    ``row_number() OVER (ORDER BY dist ASC, cell ASC)`` window, so the
    output is row-identical. The previous form crossJoined every vector
    against every centroid ROW and ranked with a window, which cost an
    Exchange + Sort of |vectors| x |cells| rows on EVERY assignment
    (index build, every probe's query side, every Lloyd iteration);
    this form shuffles nothing (guide §2.4)."""
    return with_cells(vectors, centroids, vec=vec, nprobe=nprobe).select(
        F.col(id_col), "cell"
    )


def with_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    vec: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """``vectors`` with an exploded ``cell`` column — one row per
    (vector, probed cell), all input columns kept. The join-free form
    of cell assignment: callers that previously joined
    ``assign_cells``' output back onto the vectors (index build, probe
    query sides) get the annotated rows directly, with no join and no
    shuffle."""
    carr = centroids.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("cell"), F.col("centroid")))
        ).alias("__cents")
    )
    cells = F.expr(
        f"transform(slice(array_sort(transform(__cents, c -> struct("
        f"aggregate(zip_with({vec}, c.centroid, (x, y) -> "
        f"CAST(floor((CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) "
        f"* (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * 1e12) AS BIGINT)), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x) AS dist, "
        f"c.cell AS cell))), 1, {int(nprobe)}), s -> s.cell)"
    )
    return (
        vectors.crossJoin(dim_broadcast(carr))
        .withColumn("cell", F.explode(cells))
        .drop("__cents")
    )


def _score_cell_pairs(c: DataFrame, q: DataFrame, k: int) -> DataFrame:
    """Shared probe tail: score (query, candidate) pairs that co-occur
    in a cell, keep the per-query top-k (ties to lowest candidate)."""
    pairs = c.join(dim_broadcast(q), "cell").filter(F.col("c_id") != F.col("q_id"))
    scored = pairs.withColumn("dot_s", scaled_dot("q_vec", "c_vec")).withColumn(
        "cosine", cosine_from_scaled(F.col("dot_s"), F.col("q_n2"), F.col("c_n2"))
    ).dropDuplicates(["q_id", "c_id"])
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cosine", "rank")
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: each query scores only the candidates in its
    ``nprobe`` nearest cells. Cost ∝ corpus x nprobe / n_cells per
    query instead of the full corpus."""
    c = with_cells(with_norm(candidates, vec), centroids, vec=vec, nprobe=1).select(
        F.col(id_col).alias("c_id"), F.col(vec).alias("c_vec"),
        F.col("norm2_s").alias("c_n2"), "cell",
    )
    q = with_cells(
        with_norm(queries, vec), centroids, vec=vec, nprobe=nprobe
    ).select(
        F.col(id_col).alias("q_id"), F.col(vec).alias("q_vec"),
        F.col("norm2_s").alias("q_n2"), "cell",
    )
    return _score_cell_pairs(c, q, k)


def _quantize_cols(vec_col: str):
    """(scale, int8 codes) for a float vector: symmetric per-vector
    quantization code = round(x / scale), scale = max|x| / 127.
    Deterministic (round-half-even on IEEE doubles is exact here) and
    4x smaller than float32 — at billion-vector scale the cell scan is
    I/O-bound, so the probe reads a quarter of the bytes."""
    mx = F.expr(
        f"aggregate({vec_col}, CAST(0.0 AS DOUBLE), "
        f"(acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE))))"
    )
    scale = F.when(mx > 0, mx / F.lit(127.0)).otherwise(F.lit(1.0))
    codes = F.expr(
        "transform({v}, x -> CAST(round(CAST(x AS DOUBLE) / __qs) AS TINYINT))".format(
            v=vec_col
        )
    )
    return scale, codes


def build_ivf_index(
    vectors: DataFrame,
    path: str,
    k_cells: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec: str = "embedding",
    quantize: bool = False,
) -> None:
    """Build-once ANN index artifact (the billion-vector workflow:
    amortize the expensive passes, probe many times): centroids plus
    the corpus with norms pre-computed, persisted PARTITIONED BY cell —
    a probe's broadcast cell-join lets dynamic partition pruning skip
    every non-probed cell's files at the scan.

    ``quantize=True`` stores cell vectors as per-vector-scaled int8
    codes instead of float32 (the classic SQ8 IVF layout): ~4x less
    cell I/O per probe. Scoring reconstructs x ~ code * scale, so the
    cosine is approximate — ``ivf_search`` detects the layout
    automatically; recall vs the exact index is pytest-asserted."""
    import os

    cents = fit_ivf_centroids(vectors, k=k_cells, iters=iters, id_col=id_col, vec=vec)
    cents.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    # join-free: annotate every vector with its cell in the same
    # projection (the old assign-then-join-back paid a shuffle join of
    # the corpus against its own assignment)
    base = with_cells(with_norm(vectors, vec), cents, vec=vec, nprobe=1)
    if quantize:
        scale, codes = _quantize_cols(vec)
        out = base.withColumn("__qs", scale).select(
            F.col(id_col).alias("c_id"),
            codes.alias("c_vec_q"),
            F.col("__qs").alias("c_scale"),
            F.col("norm2_s").alias("c_n2"),
            "cell",
        )
    else:
        out = base.select(
            F.col(id_col).alias("c_id"),
            F.col(vec).alias("c_vec"),
            F.col("norm2_s").alias("c_n2"),
            "cell",
        )
    # one write task per (cell, __idb) partition — without the
    # repartition every upstream task writes a file into every
    # partition it holds rows for (the map-only assignment keeps the
    # scan's partitioning, so that would be scan-tasks x partitions
    # small files; guide §6 output sizing)
    (
        out.withColumn("__idb", _id_bucket("c_id"))
        .repartition(F.col("cell"), F.col("__idb"))
        .write.mode("overwrite")
        .partitionBy("cell", "__idb")
        .parquet(os.path.join(path, "cells"))
    )


def _ivf_tombstones(spark, path: str):
    import os

    p = os.path.join(path, "_deleted")
    if not os.path.exists(p):
        return None
    return spark.read.parquet(p).select("c_id").distinct()


def ivf_search(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Probe a persisted IVF index: only the queries are (re)assigned;
    the corpus side comes off the index with norms precomputed and
    cell-pruned file reads. Logically-deleted vectors
    (``ivf_index_delete``) are excluded by a dimension-sized tombstone
    anti-join until ``compact_ivf_index`` applies them physically."""
    import os

    cents = spark.read.parquet(os.path.join(path, "centroids"))
    cells = spark.read.parquet(os.path.join(path, "cells"))
    if "c_vec_q" in cells.columns:
        # SQ8 layout: reconstruct x ~ code * scale at probe time (the
        # scan read a quarter of the bytes; c_n2 is the exact float
        # norm recorded at build)
        cells = cells.select(
            "c_id",
            F.expr(
                "transform(c_vec_q, c -> CAST(c * c_scale AS FLOAT))"
            ).alias("c_vec"),
            "c_n2",
            "cell",
        )
    dead = _ivf_tombstones(spark, path)
    if dead is not None:
        cells = cells.join(F.broadcast(dead), "c_id", "left_anti")
    q = with_cells(with_norm(queries, vec), cents, vec=vec, nprobe=nprobe).select(
        F.col(id_col).alias("q_id"), F.col(vec).alias("q_vec"),
        F.col("norm2_s").alias("q_n2"), "cell",
    )
    return _score_cell_pairs(cells, q, k)


def ivf_index_delete(
    spark, vec_ids: DataFrame, path: str, id_col: str = "vec_id"
) -> int:
    """Logical deletion from a persisted IVF index (the text-index
    tombstone pattern, llm/clean.delete_from_text_index): ids append to
    ``_deleted``; searches anti-join it immediately; already-deleted
    ids are no-ops. Physical rewrite happens in ``compact_ivf_index``.
    Returns the number of vectors newly deleted."""
    import os

    from ..operators.merge import _table_lock

    with _table_lock(path):
        stored = _stored_ids_for(
            spark.read.parquet(os.path.join(path, "cells")),
            vec_ids.withColumnRenamed(id_col, "c_id"),
            "c_id",
            "c_id",
        )
        hit = stored.join(
            vec_ids.select(F.col(id_col).alias("c_id")).distinct(),
            "c_id",
            "left_semi",
        )
        dead = _ivf_tombstones(spark, path)
        if dead is not None:
            hit = hit.join(dead, "c_id", "left_anti")
        n = hit.count()
        if n:
            hit.write.mode("append").parquet(os.path.join(path, "_deleted"))
        return n


def compact_ivf_index(
    spark, path: str, files_per_partition: int = 1
) -> dict:
    """Apply tombstones physically and compact the cell-partitioned
    corpus (incremental appends add a file per touched cell per shard;
    probe planning degrades with file count — the same maintenance the
    MinHash index got in round 5). Probes before and after see
    identical results (tested). Returns before/after file counts."""
    import os
    import shutil

    from ..operators.merge import _table_lock, compact_table

    # same lock key as ivf_index_delete/append so a concurrent delete
    # cannot append a tombstone between the rewrite and the _deleted
    # cleanup (the nested compact_table lock is on the cells subdir —
    # a different key, so no self-deadlock)
    with _table_lock(path):
        cells_p = os.path.join(path, "cells")
        parts = (
            ["cell", "__idb"]
            if "__idb" in spark.read.parquet(cells_p).columns
            else ["cell"]
        )
        dead = _ivf_tombstones(spark, path)
        if dead is not None:
            kept = spark.read.parquet(cells_p).join(
                dead, "c_id", "left_anti"
            )
            tmp = cells_p + "._compacting"
            kept.write.mode("overwrite").partitionBy(*parts).parquet(tmp)
            old = cells_p + "._old"
            if os.path.exists(old):
                shutil.rmtree(old)
            os.rename(cells_p, old)
            os.rename(tmp, cells_p)
            shutil.rmtree(old)
            shutil.rmtree(os.path.join(path, "_deleted"))
        return compact_table(
            spark,
            cells_p,
            partition_col=parts,
            files_per_partition=files_per_partition,
        )


def hash_embed(
    docs: DataFrame, dim: int = 32, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Feature-hashing text embedder (the classic hashing trick): each
    word's polynomial hash picks a bucket (h mod dim) and a sign
    (parity of h div dim); bucket sums are L2-normalized. Pure column
    expressions — deterministic, zero-shuffle, whole-stage codegen —
    so a corpus can flow straight into every embedding operator here
    (brute/LSH/IVF ANN, near-dup, semantic dedup) without a model
    server. Output schema matches the embeddings table:
    (vec_id, embedding array<float>)."""
    from . import text as T

    hw = T.word_hash_array(f"split({text_col}, ' ')")
    raw = F.expr(
        f"transform(sequence(0, {dim - 1}), i -> "
        f"aggregate(__hw, CAST(0.0 AS DOUBLE), (acc, h) -> "
        f"acc + CASE WHEN h % {dim} = i THEN "
        f"CASE WHEN (h div {dim}) % 2 = 0 THEN 1.0 ELSE -1.0 END "
        f"ELSE 0.0 END))"
    )
    norm = F.expr(
        "sqrt(aggregate(__raw, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))"
    )
    return (
        docs.withColumn("__hw", hw)
        .withColumn("__raw", raw)
        .withColumn("__n", norm)
        .select(
            F.col(id_col).alias("vec_id"),
            F.expr(
                "transform(__raw, x -> CAST(CASE WHEN __n > 0 THEN x / __n "
                "ELSE 0.0 END AS FLOAT))"
            ).alias("embedding"),
        )
    )


def cluster_documents(
    docs: DataFrame,
    k: int = 16,
    iters: int = 3,
    dim: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unsupervised domain clustering for corpus curation: hash-trick
    embed every document (zero-shuffle column expressions), fit k
    centroids with the deterministic DataFrame-native Lloyd's loop the
    IVF index uses, and assign each doc its cluster. The standard
    corpus-mixture discovery step (cluster -> inspect -> reweight /
    filter per cluster) with no model server and no RNG — same corpus,
    same clusters, on any partitioning. Output: (id, cluster)."""
    emb = hash_embed(docs, dim=dim, text_col=text_col, id_col=id_col)
    cents = fit_ivf_centroids(emb, k=k, iters=iters)
    return (
        assign_cells(emb, cents)
        .select(F.col("vec_id").alias(id_col), F.col("cell").alias("cluster"))
    )


# id-hash-bucket sub-partitioning for the append replay guards: the
# bucket is a PURE FUNCTION of the vector id (cell is not — an id's
# cell depends on its vector), so the effectively-once anti-join can
# prune its stored-id read to the batch's own buckets with a static IN
# partition filter — O(batch) instead of O(index) per append. Same
# recipe as streaming/corpus._prior_ids / candidate_index_shingles.
N_ID_BUCKETS = 16


def _id_bucket(col: str) -> F.Column:
    return F.pmod(F.xxhash64(F.col(col)), F.lit(N_ID_BUCKETS)).cast("int")


def _stored_ids_for(
    stored: DataFrame, new_vectors: DataFrame, id_col: str, stored_id: str
) -> DataFrame:
    """The replay-guard read: stored ids restricted to the NEW batch's
    id-hash buckets when the table carries the ``__idb`` layout (the
    bucket list collects driver-side — <= N_ID_BUCKETS ints — and
    becomes a static IN partition filter, so planning prunes every
    untouched bucket's files). Pre-layout tables fall back to the full
    column-pruned id scan."""
    if "__idb" in stored.columns:
        buckets = [
            r.b
            for r in new_vectors.select(_id_bucket(id_col).alias("b"))
            .distinct()
            .collect()
        ]
        stored = stored.where(F.col("__idb").isin(buckets))
    return stored.select(F.col(stored_id).alias(id_col))


def ivf_index_append(
    spark,
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> int:
    """Incremental IVF index maintenance: assign NEW vectors to the
    index's existing (frozen) centroids and append them into the
    cell-partitioned corpus — the standard IVF growth model (FAISS
    add-after-train): centroids stay fixed between re-trainings, so
    probes of old and new vectors stay comparable and nothing is
    re-assigned. Effectively-once via an anti-join on the stored ids
    (column-pruned scan of the id column only — same discipline as
    update_text_index / blocks.ingest): replaying a shard appends
    nothing. Returns the number of newly indexed vectors.

    Dynamic partition append: only the touched cells gain files;
    ivf_search keeps pruning untouched cells at planning time. Run
    ``build_ivf_index`` afresh when drift makes the frozen centroids
    stale (the index stores everything needed to compare recall).

    The guard read is BOUNDED: cells are sub-partitioned by an id-hash
    bucket (``__idb`` — a pure function of the id, unlike cell), and
    the anti-join reads only the new batch's buckets via a static IN
    partition filter, so per-append cost tracks the batch, not the
    index — the stream-lifetime-quadratic full-id scan is gone.
    Indexes built before the ``__idb`` layout fall back to the full
    column-pruned id scan (and keep their cell-only layout on write).
    """
    import os

    from ..operators.merge import _table_lock

    with _table_lock(path):
        return _ivf_append_locked(spark, new_vectors, path, id_col, vec)


def _ivf_append_locked(spark, new_vectors, path, id_col, vec):
    import os

    cents = spark.read.parquet(os.path.join(path, "centroids"))
    cells = spark.read.parquet(os.path.join(path, "cells"))
    quantized = "c_vec_q" in cells.columns  # match the index's layout
    bucketed = "__idb" in cells.columns
    existing = _stored_ids_for(cells, new_vectors, id_col, "c_id")
    fresh = new_vectors.join(existing, on=id_col, how="left_anti").cache()
    try:
        n_new = fresh.count()
        if not n_new:
            return 0
        base = with_cells(with_norm(fresh, vec), cents, vec=vec, nprobe=1)
        if quantized:
            scale, codes = _quantize_cols(vec)
            out = base.withColumn("__qs", scale).select(
                F.col(id_col).alias("c_id"),
                codes.alias("c_vec_q"),
                F.col("__qs").alias("c_scale"),
                F.col("norm2_s").alias("c_n2"),
                "cell",
            )
        else:
            out = base.select(
                F.col(id_col).alias("c_id"),
                F.col(vec).alias("c_vec"),
                F.col("norm2_s").alias("c_n2"),
                "cell",
            )
        # one write task per touched partition (see build_ivf_index)
        if bucketed:
            out = out.withColumn("__idb", _id_bucket("c_id"))
            out.repartition(F.col("cell"), F.col("__idb")).write.mode(
                "append"
            ).partitionBy("cell", "__idb").parquet(os.path.join(path, "cells"))
        else:  # pre-__idb index: keep its cell-only layout
            out.repartition(F.col("cell")).write.mode("append").partitionBy(
                "cell"
            ).parquet(os.path.join(path, "cells"))
        return n_new
    finally:
        fresh.unpersist()
