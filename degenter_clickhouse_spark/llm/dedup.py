"""Document deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash.

Scale design (100 TB):

* Exact dedup is one hash-groupBy — a single shuffle on the content
  hash; with AQE the reducers coalesce to the true group count.
* The shingle self-join used for *verification* is quadratic in the
  worst case, so candidate generation must bound it: ``minhash_lsh``
  only joins documents sharing an LSH band bucket (band key is the
  shuffle key; non-near-dup pairs never meet). ``jaccard_pairs``
  (candidates = any shared shingle) is the small-scale/oracle baseline.
* SimHash reduces each doc to one 16/64-bit value; near-dup lookup
  becomes an equality (or banded-equality) join — the cheapest pattern
  at extreme scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import text as T
from ..operators.joins import dim_broadcast


def with_shingle_rows(docs: DataFrame, id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(doc_id, h) distinct shingle-hash rows. Shingle identity is its
    rolled word-hash (llm/text.shingle_hash_array) — hash collisions are
    negligible and, because the oracle uses the identical hash, any
    collision affects both engines identically (deterministic)."""
    hw = docs.withColumn("__hw", T.word_hash_array("split(text, ' ')"))
    return hw.select(
        F.col(id_col), F.explode(T.shingle_hash_array("__hw", n)).alias("h")
    ).distinct()


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: emits (doc_id, canonical_id,
    content_hash) for every removed duplicate (canonical = min id).

    No broadcast hint: the duplicate-group frame grows with the corpus
    (a 100 TB crawl has billions of duplicate groups), so the join
    strategy is left to AQE — broadcast while small, shuffle join on
    the shared hash key beyond the threshold."""
    hashed = docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
    groups = (
        hashed.groupBy("content_hash")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    return (
        hashed.join(groups, "content_hash")
        .filter(F.col(id_col) != F.col("canonical_id"))
        .select(F.col(id_col), F.col("canonical_id"), F.col("content_hash"))
    )


def jaccard_pairs(
    docs: DataFrame, threshold: float = 0.5, n: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup pairs by word n-gram Jaccard; candidates = pairs sharing
    at least one shingle (exact but quadratic in shared-shingle pairs —
    the LSH variant is the scale path)."""
    sh = with_shingle_rows(docs, id_col, n).select(F.col(id_col).alias("d"), "h")
    sizes = sh.groupBy("d").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.d") < F.col("b.d")))
        .groupBy(F.col("a.d").alias("d1"), F.col("b.d").alias("d2"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    j = (
        common.join(sizes.withColumnRenamed("d", "d1").withColumnRenamed("n_sh", "n1"), "d1")
        .join(sizes.withColumnRenamed("d", "d2").withColumnRenamed("n_sh", "n2"), "d2")
        .withColumn(
            "jaccard",
            F.col("common").cast("double") / (F.col("n1") + F.col("n2") - F.col("common")),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select(
        "d1", "d2", "common", "n1", "n2", "jaccard"
    )


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """k=8 affine minhashes over shingle polyhashes: one row per doc,
    columns m0..m7."""
    sh = with_shingle_rows(docs, id_col, n)
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % T.POLY_MOD).alias(f"m{i}")
        for i, (a, b) in enumerate(T.MINHASH_SEEDS)
    ]
    return sh.groupBy(F.col(id_col)).agg(*aggs)


def _minhash_shingles(docs: DataFrame, id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(d, hs) per-doc DISTINCT shingle-hash arrays, lazily
    checkpointed. The empty-array filter MUST sit above the checkpoint:
    below it, predicate pushdown inlines the whole hash chain into the
    filter (element_at substitutes the array expression per shingle
    slot), turning the per-doc cost quadratic — measured 76s vs 3s at
    sf0.1."""
    hw = docs.withColumn("__hw", T.word_hash_array("split(text, ' ')"))
    return (
        hw.select(
            F.col(id_col).alias("d"),
            F.array_distinct(T.shingle_hash_array("__hw", n)).alias("hs"),
        )
        .localCheckpoint(eager=False)
        .filter(F.size("hs") >= 1)
    )


def _minhash_bands(sh: DataFrame) -> DataFrame:
    """(d, band, key) LSH band keys: 8 affine minhashes over the
    shingle array (zero-shuffle array_min reductions), rolled into 4
    bands of 2 rows each with ONE posexplode pass (a 4-way union form
    re-evaluated the minhash transform once per band)."""
    sig = sh.select(
        F.col("d"),
        *[
            F.array_min(
                F.transform("hs", lambda h: (F.lit(a) * h + F.lit(b)) % T.POLY_MOD)
            ).alias(f"m{i}")
            for i, (a, b) in enumerate(T.MINHASH_SEEDS)
        ],
    )
    return sig.select(
        F.col("d"),
        F.posexplode(
            F.array(
                *[
                    F.concat_ws("_", F.col(f"m{2 * j}"), F.col(f"m{2 * j + 1}"))
                    for j in range(4)
                ]
            )
        ).alias("band", "key"),
    )


def minhash_lsh_pairs(
    docs: DataFrame, threshold: float = 0.5, n: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """MinHash LSH near-dup detection: signatures -> 4 bands x 2 rows ->
    band-bucket join for candidates -> exact Jaccard verification of
    candidates only.

    Shuffle budget (the 100 TB concern): the per-doc DISTINCT
    shingle-hash ARRAY stays a column expression, so signatures are
    zero-shuffle ``array_min`` reductions (min is duplicate-insensitive)
    and set sizes are ``size(hs)`` — the explode+distinct and two
    groupBys the r1/r2 versions paid are gone. Only verification
    explodes (cheap: no distinct), because per-pair shared-shingle
    counts must aggregate across pairs — joining the full arrays onto
    every candidate pair duplicates both arrays per pair and blows up
    memory/network when buckets are hot (measured 24x worse at sf0.1),
    so the exploded equality join + count is the at-scale shape."""
    # lazy checkpoint: the shingle frame feeds SIX consumers (two band
    # sides, verify's two exploded-row sides, two size sides) — pin it
    # so the scan + per-doc hash chain runs once, not per branch
    # (measured 1.64 -> 1.27 s at sf0.1; the pinned bytes are the same
    # order the band shuffle already carries)
    sh = _minhash_shingles(docs, id_col, n).localCheckpoint(eager=False)
    bands = _minhash_bands(sh)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.d") < F.col("b.d")),
        )
        .select(F.col("a.d").alias("d1"), F.col("b.d").alias("d2"))
        .distinct()
    )
    return _verify_jaccard(cand, sh, threshold)


def _verify_jaccard(cand: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """Exact-Jaccard verification of candidate (d1, d2) pairs against
    the (d, hs) shingle frame; exploded equality join, never arrays
    duplicated per pair (see minhash_lsh_pairs docstring)."""
    rows = sh.select("d", F.explode("hs").alias("h"))
    sizes = sh.select("d", F.size("hs").alias("n_sh"))
    common = (
        cand.join(rows.withColumnRenamed("d", "d1").withColumnRenamed("h", "s1"), "d1")
        .join(rows.withColumnRenamed("d", "d2").withColumnRenamed("h", "s2"), "d2")
        .filter(F.col("s1") == F.col("s2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    j = (
        common.join(sizes.withColumnRenamed("d", "d1").withColumnRenamed("n_sh", "n1"), "d1")
        .join(sizes.withColumnRenamed("d", "d2").withColumnRenamed("n_sh", "n2"), "d2")
        .withColumn(
            "jaccard",
            F.col("common").cast("double") / (F.col("n1") + F.col("n2") - F.col("common")),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("d1", "d2", "jaccard")


# shingle-index layout constant: buckets per doc-id hash. Raise with
# corpus size so one bucket's files stay executor-sized; every probe
# reads at most min(candidates, this) buckets.
N_SHINGLE_BUCKETS = 16


def _doc_bucket(col: str) -> F.Column:
    return F.pmod(F.xxhash64(F.col(col)), F.lit(N_SHINGLE_BUCKETS)).cast("int")


def candidate_index_shingles(spark, idx_dir: str, cand: DataFrame) -> DataFrame | None:
    """The BOUNDED index read shared by batch probe and streaming
    ingest: candidate index-doc ids (column ``d1``) map to their layout
    buckets (a pure function of the id — no index lookup), the bucket
    list collects driver-side (<= N_SHINGLE_BUCKETS values), and the
    shingle read prunes to those partitions. Returns None when there
    are no index candidates (the read is skipped entirely)."""
    import os

    buckets = [
        r["b"] for r in cand.select(_doc_bucket("d1").alias("b")).distinct().collect()
    ]
    if not buckets:
        return None
    from pyspark.errors import AnalysisException

    try:
        stored = spark.read.parquet(os.path.join(idx_dir, "shingles"))
    except AnalysisException:
        # dir holds no data files (empty write from a pre-guard run):
        # same as "no index candidates"
        return None
    return stored.filter(F.col("__bucket").isin(buckets)).select("d", "hs")


def build_minhash_index(
    docs: DataFrame, path: str, n: int = 3, id_col: str = "doc_id"
) -> None:
    """Persist the corpus's LSH state — band keys AND shingle sets — so
    new shards dedupe against the corpus WITHOUT re-shingling it (the
    incremental-corpus-growth workflow; same build-once/probe-many
    amortization as the IVF index). Bands are laid out partitioned by
    band (a probe joins one band at a time, pruning the other bands'
    files at the scan); shingles are partitioned by doc-id hash bucket
    so Jaccard verification reads only the candidate docs' buckets
    instead of the whole corpus's shingle state."""
    import os

    sh = _minhash_shingles(docs, id_col, n)
    _minhash_bands(sh).write.mode("overwrite").partitionBy("band").parquet(
        os.path.join(path, "bands")
    )
    sh.withColumn("__bucket", _doc_bucket("d")).write.mode("overwrite").partitionBy(
        "__bucket"
    ).parquet(os.path.join(path, "shingles"))


def minhash_probe(
    spark,
    path: str,
    new_docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs touching the NEW shard: new x corpus and
    new x new candidates from band-bucket equality, verified by exact
    Jaccard over the fresh shingle sets plus ONLY the candidate corpus
    docs' shingle buckets (bucket-pruned file read — probe cost tracks
    the shard and its collisions, not the corpus). Only the new shard
    is shingled. Returns (d1, d2, jaccard) with d1 < d2."""
    import os

    idx_bands = spark.read.parquet(os.path.join(path, "bands")).select(
        "d", "band", "key"
    )
    # pinned: feeds the shard bands, the corpus-candidate anti-join and
    # the verify union (same rationale as minhash_lsh_pairs)
    new_sh = _minhash_shingles(new_docs, id_col, n).localCheckpoint(eager=False)
    new_bands = _minhash_bands(new_sh)
    all_bands = idx_bands.unionByName(new_bands)
    a, b = new_bands.alias("a"), all_bands.alias("b")
    # keep roles: nd = new-shard doc, od = the other side (corpus or
    # batchmate) — needed to prune the index read to corpus candidates.
    # The pair set is read twice (bucket collect + verify) and is
    # collision-sized, so materialize it once.
    cand_raw = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.d") != F.col("b.d")),
        )
        .select(F.col("a.d").alias("nd"), F.col("b.d").alias("od"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    idx_cand = cand_raw.join(
        new_sh.select(F.col("d")), cand_raw["od"] == F.col("d"), "left_anti"
    ).select(F.col("od").alias("d1"))
    idx_sh = candidate_index_shingles(spark, path, idx_cand)
    all_sh = new_sh if idx_sh is None else new_sh.unionByName(idx_sh)
    cand = cand_raw.select(
        F.least(F.col("nd"), F.col("od")).alias("d1"),
        F.greatest(F.col("nd"), F.col("od")).alias("d2"),
    ).distinct()
    return _verify_jaccard(cand, all_sh, threshold)


def simhash(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash over distinct word hashes: per bit, sum +/-1 by
    the word-hash bit, sign gives the fingerprint bit. Near-identical
    docs land on equal fingerprints -> dedupe by equality join.

    Zero-shuffle AND single-pass: the distinct word set stays a per-doc
    ARRAY; one ``aggregate`` carries all 16 bit sums as an array
    accumulator (``zip_with`` against the bit masks), and a second tiny
    reduction folds the signs into the fingerprint. The whole operator
    is a map-only projection — the r1 explode+distinct+groupBy form
    paid two full shuffles of word rows for the same numbers, and a
    16-separate-aggregates form re-traverses the hash array 16x
    (measured 5x slower at sf0.1)."""
    hw = docs.select(
        F.col(id_col),
        T.word_hash_array("array_distinct(split(text, ' '))").alias("hs"),
    )
    bits = F.array(*[F.lit(1 << b).cast("long") for b in range(T.SIMHASH_BITS)])
    sums = F.aggregate(
        "hs",
        F.array_repeat(F.lit(0), T.SIMHASH_BITS),
        lambda acc, h: F.zip_with(
            acc,
            bits,
            lambda s, m: s + F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    fp = F.aggregate(
        F.zip_with(
            sums, bits, lambda s, m: F.when(s > 0, m).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return hw.select(F.col(id_col), fp.cast("bigint").alias("simhash"))


def neardup_clusters(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Resolve near-dup PAIRS into clusters: connected components by
    iterative min-label propagation plus pointer jumping.

    Returns (doc_id, canonical_id); canonical = min doc_id in the
    component. Two details make this survive real graphs:

    * Every iteration ``localCheckpoint``s its result. ``cache()`` is
      NOT enough for iterative self-joins: it caches data but keeps the
      logical plan, and because each iteration references the previous
      labels twice the plan tree doubles per iteration — Catalyst
      re-optimization goes exponential and a 950-edge graph took
      minutes/iteration by the teens. Checkpointing truncates the plan,
      so every iteration optimizes a constant-size tree. (At cluster
      scale, swap for ``checkpoint()`` on reliable storage.)
    * After the neighbor-min step, labels take their LABEL's label
      (pointer jumping / path halving), so label information hops two
      levels per iteration and convergence is O(log diameter) instead
      of O(diameter) — 20 iterations covers any component a corpus
      could realistically produce; the driver-side count stops the
      loop at the first unchanged iteration.
    """
    # both edge directions come from ONE evaluation of `pairs` via an
    # explode of the two orientations — the union-of-two-selects form
    # evaluated the whole upstream pair pipeline (LSH bands + exact
    # Jaccard verify for every caller in queries/) TWICE before the
    # checkpoint could pin it (guide §2.4: remove duplicated subtrees)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("d1").alias("a"), F.col("d2").alias("b")),
                    F.struct(F.col("d2").alias("a"), F.col("d1").alias("b")),
                )
            ).alias("__e")
        )
        .select("__e.a", "__e.b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # scale-adaptive driver fast path (optimization r13, guide §1.2:
    # fix the algorithm before the constants): near-dup PAIR graphs are
    # collision-sized, usually orders of magnitude smaller than the
    # corpus. When the deduplicated edge list fits a conf-governed cap
    # (default 2M directed edges ~ a few tens of MB on the driver), a
    # single collect + union-find replaces the whole iterative loop —
    # each distributed iteration costs ~6 shuffle stages plus a
    # driver round-trip, which dominates end-to-end latency at every
    # tested scale. Past the cap (a truly huge pair graph) the exact
    # same pointer-jumping loop below runs unchanged. Output is
    # row-identical: canonical = min node id of the component
    # (union-find by min root), asserted against the loop in tests.
    try:
        cap = int(
            pairs.sparkSession.conf.get(
                "spark.degenter.cc.driverMaxEdges", "2000000"
            )
        )
    except Exception:
        cap = 2_000_000
    n_edges = edges.count()  # edges is checkpointed: this is a cached-RDD pass
    if n_edges <= cap:
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for row in edges.collect():
            a, b = row[0], row[1]
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN id so the root IS the canonical label
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        rows = [(n, find(n)) for n in parent]
        spark = pairs.sparkSession
        from pyspark.sql import types as T_

        node_type = edges.schema["a"].dataType
        schema = T_.StructType(
            [
                T_.StructField("doc_id", node_type, True),
                T_.StructField("canonical_id", node_type, True),
            ]
        )
        return spark.createDataFrame(rows, schema)
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # thread the previous label through, so convergence detection
        # is a column (no extra self-join) and the per-iteration job
        # count is ONE: the full-pass change count doubles as the
        # action that materializes the lazy checkpoint
        stepped = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.col("label").alias("old_label"),
            F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
        )
        jump = labels.select(
            F.col("node").alias("j_node"), F.col("label").alias("j_label")
        )
        new_labels = (
            stepped.join(jump, stepped["label"] == jump["j_node"], "left")
            .select(
                "node",
                "old_label",
                F.least(
                    F.col("label"), F.coalesce("j_label", "label")
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.agg(
            F.sum((F.col("label") != F.col("old_label")).cast("long")).alias("n")
        ).collect()[0]["n"]
        labels = new_labels.select("node", "label")
        if not changed:
            break
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("canonical_id")
    )


def semantic_dedup(
    vectors: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec: str = "embedding",
    bits: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column:
    bucket vectors with the deterministic random-hyperplane LSH
    (llm/similarity.hyperplane_bucket — no fitted model, so the whole
    operator is oracle-expressible), emit within-bucket pairs with
    cosine >= threshold, resolve pairs into connected components, and
    keep one representative (min id) per component.

    Scale: the bucket id is the only shuffle key for pair generation —
    never all-pairs; the quadratic term is bounded by bucket size.
    ``bits=None`` sizes the hyperplane family from a planning-time
    count (adaptive_hyperplane_bits: bits = log2(n / BUCKET_TARGET)),
    so bucket population — and the within-bucket pair join — stays
    ~constant per vector as the corpus grows; at the oracle scales the
    adaptive value equals N_HYPERPLANES, keeping the static 4-bit
    oracle exact. Component resolution is the same iterative min-label
    propagation as text near-dups. Swapping the bucketer for fitted
    IVF cells (fit_ivf_centroids) gives the classic SemDeDup layout at
    the cost of oracle exactness.

    Returns (vec_id, canonical_id, keep).
    """
    from .similarity import (
        adaptive_hyperplane_bits,
        hyperplane_bucket,
        neardup_pairs,
    )

    if bits is None:
        bits = adaptive_hyperplane_bits(vectors.count())
    v = vectors.withColumn("__bucket", hyperplane_bucket(vec, bits=bits))
    pairs = neardup_pairs(
        v, threshold, group_col="__bucket", id_col=id_col, vec=vec
    ).select(F.col("v1").alias("d1"), F.col("v2").alias("d2"))
    clusters = neardup_clusters(pairs).withColumnRenamed("doc_id", id_col)
    j = vectors.select(F.col(id_col)).join(clusters, id_col, "left")
    return j.select(
        id_col,
        F.coalesce("canonical_id", F.col(id_col)).alias("canonical_id"),
        (F.coalesce("canonical_id", F.col(id_col)) == F.col(id_col)).alias("keep"),
    )


def contamination(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/eval contamination detection by n-gram collision (the
    GPT-3/PaLM decontamination recipe): a training document is
    contaminated when any of its word n-grams appears anywhere in the
    benchmark/eval set.

    Returns one row per training doc: (doc_id, n_hits, contaminated);
    ``n_hits`` counts the doc's distinct shingles that collide with the
    benchmark gram set.

    Scale (100 TB corpus vs MB-scale benchmark): the benchmark's
    distinct shingle-hash set is tiny even for large eval suites, so it
    is broadcast — the corpus side is a map-only explode + hash lookup
    with no shuffle of corpus data. The only shuffled rows are the
    collisions themselves (groupBy doc_id), rare by construction; the
    final left join re-attaches zero-hit docs.
    """
    bench_grams = with_shingle_rows(benchmark, id_col, n).select("h").distinct()
    train_grams = with_shingle_rows(train, id_col, n)
    hits = (
        train_grams.join(dim_broadcast(bench_grams), "h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def dedup_resolution(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Final dedup verdict per document: keep (canonical or untouched)
    vs drop (non-canonical member of a near-dup cluster)."""
    clusters = neardup_clusters(pairs)
    j = docs.select(F.col(id_col)).join(clusters, id_col, "left")
    return j.select(
        id_col,
        F.coalesce("canonical_id", F.col(id_col)).alias("canonical_id"),
        (F.coalesce("canonical_id", F.col(id_col)) == F.col(id_col)).alias("keep"),
    )


def dedup_keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    priority_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup verdict that keeps the HIGHEST-PRIORITY member of each
    near-dup cluster instead of the lowest id — the production rule
    when duplicates differ in quality (keep the longest / highest
    quality-score copy of a boilerplate family, drop the rest).

    Same cluster resolution as ``dedup_resolution``; the representative
    is ``max_by(id, (priority, -id))`` per cluster — one additional
    dimension-sized aggregation over cluster members (clusters only,
    not the corpus; singleton docs never enter it). Ties break on the
    LOWER id, so the verdict is total and engine-independent.
    Output: (id, cluster_id, rep_id, keep).
    """
    clusters = neardup_clusters(pairs)
    members = clusters.join(
        docs.select(F.col(id_col), F.col(priority_col).alias("__p")), id_col
    )
    reps = members.groupBy("canonical_id").agg(
        F.max_by(
            F.col(id_col),
            F.struct(F.col("__p").alias("p"), (-F.col(id_col)).alias("nid")),
        ).alias("rep_id")
    )
    j = (
        docs.select(F.col(id_col))
        .join(clusters, id_col, "left")
        .join(reps, "canonical_id", "left")
    )
    return j.select(
        id_col,
        F.coalesce("canonical_id", F.col(id_col)).alias("cluster_id"),
        F.coalesce("rep_id", F.col(id_col)).alias("rep_id"),
        (F.coalesce("rep_id", F.col(id_col)) == F.col(id_col)).alias("keep"),
    )


def fuzzy_contamination(
    train: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """NEAR-duplicate train/eval decontamination: exact n-gram
    collision (``contamination``) misses lightly-reworded benchmark
    leaks; this flags a training doc when its MinHash-LSH candidates
    against the benchmark verify at Jaccard >= ``threshold`` — the
    same banded-candidates + exact-verify recipe as
    ``minhash_lsh_pairs``, restricted to cross-set pairs so the
    quadratic term is bounded by band-bucket collisions BETWEEN the
    sets, never within.

    Output: one row per training doc — (id, n_matches, max_jaccard,
    contaminated)."""
    tr = train.select(F.col(id_col), "text")
    be = benchmark.select(F.col(id_col), "text")
    # each side's shingle frame feeds its band projection AND the
    # tagged verify union — pin both (same rationale as
    # minhash_lsh_pairs)
    tr_sh = _minhash_shingles(tr, id_col, n).localCheckpoint(eager=False)
    be_sh = _minhash_shingles(be, id_col, n).localCheckpoint(eager=False)
    a = _minhash_bands(tr_sh).alias("a")
    b = _minhash_bands(be_sh).alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key")),
        )
        .select(F.col("a.d").alias("d1"), F.col("b.d").alias("d2"))
        .distinct()
    )
    # verify over the union of both sides' shingle sets; tag the sides
    # so a shared doc id between sets cannot collide
    tagged_tr = tr_sh.select((F.col("d") * 2).alias("d"), "hs")
    tagged_be = be_sh.select((F.col("d") * 2 + 1).alias("d"), "hs")
    tagged_cand = cand.select(
        (F.col("d1") * 2).alias("d1"), (F.col("d2") * 2 + 1).alias("d2")
    )
    hits = _verify_jaccard(
        tagged_cand, tagged_tr.unionByName(tagged_be), threshold
    ).select(
        (F.col("d1") / 2).cast("long").alias(id_col),
        F.col("jaccard"),
    )
    agg = hits.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.max("jaccard").alias("max_jaccard"),
    )
    return (
        tr.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_matches", F.lit(0)).cast("long").alias("n_matches"),
            "max_jaccard",
            (F.coalesce("n_matches", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def leakage_free_split(
    docs: DataFrame,
    pairs: DataFrame,
    fracs: Sequence[tuple[str, float]] = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/val/test assignment that never lets near-duplicates
    straddle a split boundary (the classic eval-leakage bug): documents
    are first resolved to their near-dup cluster (iterative min-label
    propagation over ``pairs``), then the CLUSTER id — not the doc id —
    is hashed into [0, 1) and bucketed by the cumulative fractions, so
    every member of a cluster lands in the same split.

    Deterministic end-to-end (multiplicative hash, no RNG) and
    scale-shaped: the only data-sized operations are the cluster
    left-join and a map-side hash/bucket; fractions arrive as literal
    comparisons. Output: (id, group_id, split).
    """
    clusters = neardup_clusters(pairs)
    g = (
        docs.select(id_col)
        .join(clusters, id_col, "left")
        .select(
            id_col,
            F.coalesce("canonical_id", F.col(id_col)).alias("group_id"),
        )
    )
    from ..functions.hashing import knuth_uniform

    u = knuth_uniform(F.col("group_id"))
    expr, acc = None, 0.0
    for name, frac in list(fracs)[:-1]:
        acc += float(frac)
        expr = F.when(u < acc, name) if expr is None else expr.when(u < acc, name)
    last = list(fracs)[-1][0]
    split = expr.otherwise(last) if expr is not None else F.lit(last)
    return g.withColumn("split", split)


def compact_minhash_index(spark, path: str, files_per_partition: int = 1) -> dict:
    """Small-file compaction for a streaming-grown MinHash index: every
    micro-batch append adds a file per touched band/bucket partition,
    and probe planning degrades with file count. Rewrites both index
    tables partition-by-partition (write-to-temp + atomic swap via
    operators/merge.compact_table); probes before and after see
    identical state (asserted in tests). Returns per-table
    before/after file counts."""
    import os

    from ..operators.merge import compact_table

    return {
        "bands": compact_table(
            spark,
            os.path.join(path, "bands"),
            partition_col="band",
            files_per_partition=files_per_partition,
        ),
        "shingles": compact_table(
            spark,
            os.path.join(path, "shingles"),
            partition_col="__bucket",
            files_per_partition=files_per_partition,
        ),
    }


# ---------------------------------------------------------------------------
# Sorted-neighborhood fuzzy matching (entity-resolution blocking)
# ---------------------------------------------------------------------------


def snm_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    window: int = 3,
    max_dist: int = 2,
    partitions: int = 32,
) -> DataFrame:
    """Sorted-neighborhood method: order rows by (key, id), compare each
    row against its next ``window`` neighbors in that order, and keep
    pairs whose ``levenshtein(key_i, key_j) <= max_dist``.

    The classic entity-resolution alternative to quadratic blocking: a
    block key like (nation, name-prefix) either explodes (big blocks)
    or misses early-character edits; SNM is O(n * window) with recall
    governed by the sort key. Standard practice layers several SNM
    passes with different sort keys and unions the pairs — callers do
    that by unioning ``snm_pairs`` outputs.

    Scale shape (100 TB): the global order materializes WITHOUT a
    single-partition window:

    1. ``repartitionByRange(key, id)`` + per-partition ``row_number``
       (window partitioned by ``spark_partition_id`` — every partition
       ranks independently);
    2. per-partition counts (one tiny job, ``partitions`` rows to the
       driver) become broadcast offsets, so ``rank = offset + local_i``
       is a GLOBAL dense rank with no global shuffle-to-one;
    3. neighbor pairs come from ONE equi-join on rank after exploding
       j in 1..window (left side fans out x window, join key rank+j) —
       crossing partition boundaries for free, no cartesian anywhere.

    The ranked frame is localCheckpointed so both the counts job and
    the pair join see the same physical partitioning. Output:
    (id_a, id_b, key_a, key_b, dist) with id_a < id_b in sort order.
    """
    ranked = (
        df.select(F.col(id_col).alias("id"), F.col(key_col).alias("key"))
        .repartitionByRange(partitions, F.col("key"), F.col("id"))
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Window

    local = ranked.withColumn(
        "i",
        F.row_number().over(
            Window.partitionBy("pid").orderBy("key", "id")
        ),
    )
    counts = {
        r["pid"]: r["n"]
        for r in ranked.groupBy("pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if offsets:
        off_expr = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )
        rank_col = off_expr[F.col("pid")] + F.col("i")
    else:  # empty input: F.create_map() would type as map<void,void>
        rank_col = F.col("i").cast("long")
    g = local.withColumn("rank", rank_col).select("id", "key", "rank")
    left = g.select(
        F.col("id").alias("id_a"),
        F.col("key").alias("key_a"),
        F.explode(
            F.sequence(F.col("rank") + 1, F.col("rank") + window)
        ).alias("rank"),
    )
    right = g.select(
        F.col("id").alias("id_b"), F.col("key").alias("key_b"), "rank"
    )
    return (
        left.join(right, "rank")
        .withColumn("dist", F.levenshtein("key_a", "key_b"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "key_a", "key_b", "dist")
    )


def kfold_split(
    docs: DataFrame,
    pairs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """K-fold cross-validation assignment with the same no-leakage
    guarantee as :func:`leakage_free_split`: the near-dup CLUSTER id is
    hashed (Knuth u32, overflow-safe) and folded mod k, so every member
    of a cluster lands in the same fold and no near-duplicate pair ever
    straddles a train/held-out boundary in any rotation.

    Pure integer end-to-end — (u32(group) mod k) — so fold assignment
    is bit-identical across engines. Output: (id, group_id, fold).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    clusters = neardup_clusters(pairs)
    g = (
        docs.select(id_col)
        .join(clusters, id_col, "left")
        .select(
            id_col,
            F.coalesce("canonical_id", F.col(id_col)).alias("group_id"),
        )
    )
    from ..functions.hashing import knuth_u32

    return g.withColumn(
        "fold", F.pmod(knuth_u32(F.col("group_id")), F.lit(k)).cast("int")
    )
