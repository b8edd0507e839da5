"""Product quantization (PQ) for embedding search — the
billion-vector memory/IO story (Jegou et al., "Product Quantization
for Nearest Neighbor Search", TPAMI 2011).

SQ8 (similarity.build_ivf_index(quantize=True)) compresses 4x by
narrowing each float to int8. PQ goes much further: the vector is
split into ``m_sub`` subvectors, each quantized to one of ``k_sub``
per-subspace centroids, so a 64-dim float32 vector (256 bytes)
becomes 8 code bytes — 32x — and distance evaluation against a query
needs NO decode: the query precomputes a lookup table (LUT) of
dot(query_sub, centroid) for every (subspace, centroid), and a
candidate's approximate dot product is m_sub table lookups summed
(asymmetric distance computation, ADC).

Spark-native shape (every stage JVM-side, no UDFs):

* **Fit**: one deterministic Lloyd's k-means PER SUBSPACE — reuses
  ``similarity.fit_ivf_centroids`` on sliced subvectors (seeds = the
  k lowest-id rows, so fits are bit-reproducible across partitionings
  and runs). Codebook size is m_sub x k_sub x (d/m_sub) floats —
  dimension-sized, broadcastable at any corpus scale.
* **Encode**: subvectors in long form (id, sub, slice) — built by a
  fixed-size union, corpus scanned once — argmin against the
  broadcast codebook, then ONE groupBy(id) reassembles the code
  array. Cost: 2 keyed shuffles regardless of m_sub.
* **Search (ADC)**: the query batch's LUTs are dimension-sized
  (n_queries x m_sub x k_sub doubles) and BROADCAST; the code table
  streams past once, each (query, candidate) score = m_sub
  ``element_at`` lookups folded in a column expression. The corpus is
  never exploded, never decoded, and only the per-query top-k
  survives to the final window.

Exact norms are recorded at encode time, so the ADC cosine
denominator is exact and only the dot numerator is approximated —
recall vs the exact brute scan is pytest-asserted
(tests/test_pq_ann.py), as is the >= 8x on-disk compression.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import dim_broadcast
from .similarity import fit_ivf_centroids, with_norm

DEFAULT_M_SUB = 16
DEFAULT_K_SUB = 16


def _dim(vectors: DataFrame, vec: str) -> int:
    row = vectors.select(F.size(F.col(vec)).alias("d")).first()
    if row is None:
        raise ValueError("fit_pq_codebooks: empty vector table")
    return int(row.d)


def _subvectors(
    vectors: DataFrame, m_sub: int, d: int, id_col: str, vec: str
) -> DataFrame:
    """Long form (id, sub, subvec): one corpus scan, fixed-size union."""
    w = d // m_sub
    parts = [
        vectors.select(
            F.col(id_col),
            F.lit(m).alias("sub"),
            F.slice(F.col(vec), m * w + 1, w).alias("subvec"),
        )
        for m in range(m_sub)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def fit_pq_codebooks(
    vectors: DataFrame,
    m_sub: int = DEFAULT_M_SUB,
    k_sub: int = DEFAULT_K_SUB,
    iters: int = 3,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Per-subspace deterministic k-means. Returns (sub, cell,
    centroid array<float>) with m_sub x k_sub rows total."""
    d = _dim(vectors, vec)
    if d % m_sub != 0:
        raise ValueError(
            f"fit_pq_codebooks: dim {d} not divisible by m_sub {m_sub}"
        )
    w = d // m_sub
    books = []
    for m in range(m_sub):
        sliced = vectors.select(
            F.col(id_col), F.slice(F.col(vec), m * w + 1, w).alias("subvec")
        )
        cents = fit_ivf_centroids(
            sliced, k=k_sub, iters=iters, id_col=id_col, vec="subvec"
        )
        books.append(cents.select(F.lit(m).alias("sub"), "cell", "centroid"))
    out = books[0]
    for b in books[1:]:
        out = out.unionByName(b)
    return out.localCheckpoint(eager=True)


def pq_encode(
    vectors: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>, norm2_s) — codes[m] is the 1-based cell
    id of subspace m's nearest centroid (scaled-integer L2 argmin, ties
    to the lowest cell: bit-deterministic). norm2_s is the EXACT
    scaled norm of the original vector (the ADC denominator)."""
    from pyspark.sql.window import Window

    m_sub = codebooks.select(F.max("sub")).first()[0] + 1
    d = _dim(vectors, vec)
    sub = _subvectors(vectors, m_sub, d, id_col, vec)
    dist = F.expr(
        "aggregate(zip_with(subvec, centroid, (x, y) -> "
        "CAST(floor((CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) "
        "* (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * 1e12) AS BIGINT)), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    scored = sub.join(dim_broadcast(codebooks), "sub").withColumn("dist", dist)
    wn = Window.partitionBy(id_col, "sub").orderBy(
        F.col("dist").asc(), F.col("cell").asc()
    )
    assigned = (
        scored.withColumn("__rk", F.row_number().over(wn))
        .filter(F.col("__rk") == 1)
        .select(id_col, "sub", "cell")
    )
    codes = assigned.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "cell"))),
            lambda s: s["cell"],
        ).alias("codes")
    )
    return codes.join(
        with_norm(vectors, vec).select(id_col, "norm2_s"), id_col
    )


def _query_luts(
    queries: DataFrame,
    codebooks: DataFrame,
    k_sub: int,
    m_sub: int,
    d: int,
    id_col: str,
    vec: str,
) -> DataFrame:
    """(q_id, q_n2, lut map<int,double>) where lut[sub * k_sub + cell]
    = dot(query_sub, centroid(sub, cell)). A MAP, not a positional
    array: codebooks can be SPARSE (Lloyd drops empty cells when the
    training set is small), and a compacted array shifts every lookup
    after the first gap — a real mis-scoring bug caught by the
    streaming-maintained index test, where books fit on a 10-doc first
    batch. n_queries x m_sub x k_sub entries — dimension-sized,
    broadcast by the caller."""
    sub = _subvectors(queries, m_sub, d, id_col, vec)
    dot = F.expr(
        "aggregate(zip_with(subvec, centroid, (x, y) -> "
        "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    entries = (
        sub.join(dim_broadcast(codebooks), "sub")
        .select(
            F.col(id_col).alias("q_id"),
            (F.col("sub") * k_sub + F.col("cell")).alias("slot"),
            dot.alias("dp"),
        )
    )
    luts = entries.groupBy("q_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("slot", "dp")))
        ).alias("lut")
    )
    return luts.join(
        with_norm(queries, vec).select(
            F.col(id_col).alias("q_id"), F.col("norm2_s").alias("q_n2")
        ),
        "q_id",
    )


def pq_topk(
    queries: DataFrame,
    encoded: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec: str = "embedding",
    rerank_with: DataFrame | None = None,
    shortlist: int | None = None,
) -> DataFrame:
    """ADC top-k: broadcast query LUTs, stream the code table once.
    Returns (q_id, c_id, score, rank) — score is the approximate
    cosine (PQ dot over exact norms). Self-matches excluded.

    ``rerank_with``: the original float vector table — enables the
    standard two-stage design (FAISS ``IndexRefine``): ADC produces a
    ``shortlist`` (default 10*k) per query from the 16x-compressed
    codes, then ONLY the shortlist pairs are re-scored with the exact
    scaled-integer cosine. The expensive exact math touches
    n_queries x shortlist vectors regardless of corpus size, and the
    returned score/rank are exact over the shortlist (deterministic:
    the same integer cosine as brute_topk). On isotropic synthetic
    data (this repo's worst case) shortlist=20*k recovers ~97% of the
    exact top-k; real low-intrinsic-dimension embeddings need far
    less."""
    if rerank_with is not None:
        short = shortlist or 10 * k
        adc = pq_topk(
            queries, encoded, codebooks, k=short, id_col=id_col, vec=vec
        ).select("q_id", "c_id")
        from .similarity import cosine_from_scaled, scaled_dot

        c = with_norm(rerank_with, vec).select(
            F.col(id_col).alias("c_id"),
            F.col(vec).alias("c_vec"),
            F.col("norm2_s").alias("c_n2"),
        )
        q = with_norm(queries, vec).select(
            F.col(id_col).alias("q_id"),
            F.col(vec).alias("q_vec"),
            F.col("norm2_s").alias("q_n2"),
        )
        exact = (
            adc.join(c, "c_id")
            .join(dim_broadcast(q), "q_id")
            .withColumn("dot_s", scaled_dot("q_vec", "c_vec"))
            .withColumn(
                "score",
                cosine_from_scaled(
                    F.col("dot_s"), F.col("q_n2"), F.col("c_n2")
                ),
            )
        )
        from pyspark.sql.window import Window

        w = Window.partitionBy("q_id").orderBy(
            F.col("score").desc(), F.col("c_id").asc()
        )
        return (
            exact.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "c_id", "score", "rank")
        )
    m_sub = codebooks.select(F.max("sub")).first()[0] + 1
    k_sub = codebooks.select(F.max("cell")).first()[0]
    d = _dim(queries, vec)
    luts = _query_luts(queries, codebooks, k_sub, m_sub, d, id_col, vec)
    pairs = encoded.withColumnRenamed(id_col, "c_id").crossJoin(
        F.broadcast(luts)
    ).filter(F.col("c_id") != F.col("q_id"))
    # ADC: fold codes with their subspace index into LUT slots
    approx_dot = F.expr(
        f"aggregate(zip_with(codes, sequence(0, {m_sub - 1}), "
        f"(c, s) -> element_at(lut, s * {k_sub} + c)), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    scored = pairs.withColumn(
        "score",
        approx_dot
        / F.sqrt(
            (F.col("q_n2").cast("double") / F.lit(1e12))
            * (F.col("norm2_s").cast("double") / F.lit(1e12))
        ),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("c_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "score", "rank")
    )


# ---------------------------------------------------------------------------
# Persisted artifact (build-once / probe-many, the model-family
# contract shared with LM / DSIR / BPE / PCA / IVF)
# ---------------------------------------------------------------------------


def build_pq_index(
    vectors: DataFrame,
    path: str,
    m_sub: int = DEFAULT_M_SUB,
    k_sub: int = DEFAULT_K_SUB,
    iters: int = 3,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> None:
    """Fit codebooks and encode the corpus to ``path`` (codebooks/ +
    codes/). The codes table is the 32x-compressed search surface;
    the original vectors are not stored."""
    books = fit_pq_codebooks(
        vectors, m_sub=m_sub, k_sub=k_sub, iters=iters, id_col=id_col, vec=vec
    )
    books.write.mode("overwrite").parquet(os.path.join(path, "codebooks"))
    from .similarity import _id_bucket

    pq_encode(vectors, books, id_col=id_col, vec=vec).withColumn(
        "__idb", _id_bucket(id_col)
    ).write.mode("overwrite").partitionBy("__idb").parquet(
        os.path.join(path, "codes")
    )


def pq_search(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec: str = "embedding",
    rerank_with: DataFrame | None = None,
    shortlist: int | None = None,
) -> DataFrame:
    """Probe a persisted PQ index (see :func:`pq_topk`)."""
    books = spark.read.parquet(os.path.join(path, "codebooks"))
    codes = spark.read.parquet(os.path.join(path, "codes"))
    return pq_topk(
        queries, codes, books, k=k, id_col=id_col, vec=vec,
        rerank_with=rerank_with, shortlist=shortlist,
    )


# ---------------------------------------------------------------------------
# IVF-PQ: cell-partitioned PQ codes — the FAISS IVFPQ layout. IVF
# prunes WHICH files a probe reads (cell partitions skip at planning
# time); PQ shrinks WHAT those files contain (codes, 16x less I/O);
# the optional exact rerank bounds the full-precision work to
# n_queries x shortlist rows. Together: a billion-vector probe reads
# nprobe/k_cells of the corpus at 1/16 the bytes and touches float
# vectors only for the shortlist.
# ---------------------------------------------------------------------------


def build_ivfpq_index(
    vectors: DataFrame,
    path: str,
    k_cells: int = 8,
    m_sub: int = DEFAULT_M_SUB,
    k_sub: int = DEFAULT_K_SUB,
    iters: int = 3,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> None:
    """centroids/ (IVF cells) + codebooks/ (PQ) + codes/ PARTITIONED
    BY cell. PQ codebooks are fit on the WHOLE corpus (shared across
    cells — one broadcastable artifact; per-cell residual codebooks
    are the classic refinement, omitted deliberately: shared books
    keep the LUT n_queries x m x k regardless of nprobe)."""
    from .similarity import assign_cells, fit_ivf_centroids

    cents = fit_ivf_centroids(
        vectors, k=k_cells, iters=iters, id_col=id_col, vec=vec
    )
    cents.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    books = fit_pq_codebooks(
        vectors, m_sub=m_sub, k_sub=k_sub, iters=iters, id_col=id_col, vec=vec
    )
    books.write.mode("overwrite").parquet(os.path.join(path, "codebooks"))
    assigned = assign_cells(vectors, cents, id_col=id_col, vec=vec, nprobe=1)
    from .similarity import _id_bucket

    codes = pq_encode(vectors, books, id_col=id_col, vec=vec).join(
        assigned, id_col
    )
    codes.withColumn("__idb", _id_bucket(id_col)).write.mode(
        "overwrite"
    ).partitionBy("cell", "__idb").parquet(os.path.join(path, "codes"))


def ivfpq_search(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec: str = "embedding",
    rerank_with: DataFrame | None = None,
    shortlist: int | None = None,
) -> DataFrame:
    """Probe: assign each query to its ``nprobe`` nearest cells, read
    ONLY those cells' code files (partition pruning), ADC-score via
    the broadcast LUTs, keep the per-query top-k (or shortlist +
    exact rerank when ``rerank_with`` is given)."""
    from .similarity import assign_cells

    cents = spark.read.parquet(os.path.join(path, "centroids"))
    books = spark.read.parquet(os.path.join(path, "codebooks"))
    codes = spark.read.parquet(os.path.join(path, "codes"))
    q_cells = assign_cells(
        queries, cents, id_col=id_col, vec=vec, nprobe=nprobe
    )

    m_sub = books.select(F.max("sub")).first()[0] + 1
    k_sub = books.select(F.max("cell")).first()[0]
    d = _dim(queries, vec)
    luts = _query_luts(queries, books, k_sub, m_sub, d, id_col, vec).join(
        q_cells.withColumnRenamed(id_col, "q_id"), "q_id"
    )
    pairs = codes.withColumnRenamed(id_col, "c_id").join(
        F.broadcast(luts), "cell"
    ).filter(F.col("c_id") != F.col("q_id"))
    approx_dot = F.expr(
        f"aggregate(zip_with(codes, sequence(0, {m_sub - 1}), "
        f"(c, s) -> element_at(lut, s * {k_sub} + c)), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    scored = pairs.withColumn(
        "score",
        approx_dot
        / F.sqrt(
            (F.col("q_n2").cast("double") / F.lit(1e12))
            * (F.col("norm2_s").cast("double") / F.lit(1e12))
        ),
    ).dropDuplicates(["q_id", "c_id"])
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("c_id").asc()
    )
    short = (shortlist or 10 * k) if rerank_with is not None else k
    adc = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= short)
        .select("q_id", "c_id", "score", "rank")
    )
    if rerank_with is None:
        return adc
    from .similarity import cosine_from_scaled, scaled_dot

    c = with_norm(rerank_with, vec).select(
        F.col(id_col).alias("c_id"),
        F.col(vec).alias("c_vec"),
        F.col("norm2_s").alias("c_n2"),
    )
    qn = with_norm(queries, vec).select(
        F.col(id_col).alias("q_id"),
        F.col(vec).alias("q_vec"),
        F.col("norm2_s").alias("q_n2x"),
    )
    exact = (
        adc.select("q_id", "c_id")
        .join(c, "c_id")
        .join(dim_broadcast(qn), "q_id")
        .withColumn("dot_s", scaled_dot("q_vec", "c_vec"))
        .withColumn(
            "score",
            cosine_from_scaled(F.col("dot_s"), F.col("q_n2x"), F.col("c_n2")),
        )
    )
    w2 = Window.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("c_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "score", "rank")
    )


def pq_index_append(
    spark: SparkSession,
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> int:
    """Incremental PQ index maintenance (the FAISS add-after-train
    model shared with ivf_index_append): encode NEW vectors with the
    index's FROZEN codebooks and append their codes — old and new
    codes score identically under the same LUTs, nothing re-encodes.
    Effectively-once via an anti-join on the stored ids (id-column-
    pruned scan), so shard replays append nothing. Works for both
    plain PQ (codes/) and IVF-PQ (cell-partitioned codes/ — new rows
    are also cell-assigned against the frozen IVF centroids).
    Returns the number of newly indexed vectors.

    The guard read is BOUNDED (same layout as ivf_index_append): codes
    are partitioned by an id-hash bucket (``__idb``), so the anti-join
    reads only the new batch's buckets via a static IN partition
    filter — O(batch), not O(index), per append. Pre-layout indexes
    fall back to the full id-column scan and keep their layout."""
    from ..operators.merge import _table_lock
    from .similarity import _id_bucket, _stored_ids_for

    with _table_lock(path):
        books = spark.read.parquet(os.path.join(path, "codebooks"))
        codes_path = os.path.join(path, "codes")
        codes_tbl = spark.read.parquet(codes_path)
        bucketed = "__idb" in codes_tbl.columns
        stored = _stored_ids_for(codes_tbl, new_vectors, id_col, id_col).distinct()
        fresh = new_vectors.join(
            stored, id_col, "left_anti"
        ).localCheckpoint(eager=True)
        n = fresh.count()
        if n == 0:
            return 0
        enc = pq_encode(fresh, books, id_col=id_col, vec=vec)
        cents_path = os.path.join(path, "centroids")
        parts: list[str] = []
        if os.path.exists(cents_path):
            from .similarity import assign_cells

            cents = spark.read.parquet(cents_path)
            enc = enc.join(
                assign_cells(fresh, cents, id_col=id_col, vec=vec, nprobe=1),
                id_col,
            )
            parts.append("cell")
        if bucketed:
            enc = enc.withColumn("__idb", _id_bucket(id_col))
            parts.append("__idb")
        if parts:
            enc.write.mode("append").partitionBy(*parts).parquet(codes_path)
        else:
            enc.write.mode("append").parquet(codes_path)
        return n
