"""Corpus cleaning operators beyond whole-document dedup: exact
substring (duplicate n-gram span) detection/removal and BM25 ranked
retrieval.

Whole-doc dedup (llm/dedup.py) misses boilerplate REPEATED INSIDE
otherwise-distinct documents — license headers, navigation chrome,
templated paragraphs. Production pipelines remove those at the
substring level ("Deduplicating Training Data Makes Language Models
Better" uses a suffix array to find substrings occurring >= 2 times in
the corpus and deletes them). A literal distributed suffix array is a
poor fit for the DataFrame model; the fixed-width n-gram formulation
below finds the same spans (any duplicated substring of >= n tokens is
a run of duplicated n-grams, and maximal runs are recovered exactly by
interval-merging the flagged gram positions):

1. explode word-position n-grams — map-only;
2. grams occurring >= min_count times in the corpus — one shuffle on
   the gram (high-cardinality key, no skew hot-spot at 100 TB; an
   aggregate-then-semi-join, never a self-join);
3. merge each doc's flagged positions into maximal [start, end) token
   spans — gaps-and-islands with windows PARTITIONED BY doc (never a
   global window);
4. (optional) rebuild the text without the spanned tokens — a per-doc
   higher-order-function filter, no explode, no shuffle.

BM25 is the classic probabilistic relevance score; here it is a
two-aggregation DataFrame plan (tf per doc-term, df per term) with the
corpus scalars (N, avgdl) folded in via a broadcast single-row cross
join, and a TakeOrdered top-k — no global window, no driver loop.

These are beyond-reference LLM-pipeline operators (the reference has
no corpus tooling); they are registered in the EXTENDED query registry
(queries/clean_ext.py) with DuckDB oracle twins checked by pytest.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import text as TX


def positioned_ngrams(
    docs: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per (doc, token position, n-gram string). Map-only."""
    grams = TX.shingles("__ws", n)
    return (
        docs.select(id_col, F.split(F.col(text_col), " ").alias("__ws"))
        .select(id_col, F.posexplode(grams).alias("pos", "gram"))
    )


def duplicate_ngram_spans(
    docs: DataFrame,
    n: int = 5,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal token spans [span_start, span_end) covered by n-grams
    that occur >= ``min_count`` times corpus-wide (across or within
    docs). Adjacent/overlapping flagged grams merge into one span, so
    a duplicated substring of any length >= n comes out as exactly one
    interval per occurrence."""
    # pinned: the positioned-gram frame feeds the duplicate-count agg
    # AND the semi-join probe, and executed plans show Spark does not
    # reuse the duplicated explode subtree at runtime — without the
    # checkpoint the n-gram strings were built twice per run
    g = positioned_ngrams(docs, n, id_col, text_col).localCheckpoint(eager=False)
    dup = (
        g.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .filter(F.col("__cnt") >= min_count)
        .select("gram")
    )
    flagged = g.join(dup, "gram", "left_semi").select(id_col, "pos")
    # gaps-and-islands, windows partitioned by doc (scale-safe)
    byd = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + F.lit(n)).over(
        byd.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = (
        flagged.withColumn(
            "__new", (F.col("pos") > F.coalesce(prev_end, F.lit(-1))).cast("long")
        )
        .withColumn("__island", F.sum("__new").over(byd))
    )
    return isl.groupBy(id_col, "__island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(n)).alias("span_end"),
        (F.max("pos") + F.lit(n) - F.min("pos")).alias("span_tokens"),
    ).drop("__island")


def remove_duplicate_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rebuild each doc's text with every spanned token removed.

    The span list is grouped to one array per doc and applied with a
    positional higher-order filter over the token array — the doc's
    row never explodes and the only shuffle is the span groupBy (tiny:
    spans, not tokens). Output: (id, cleaned_text, kept_tokens,
    removed_tokens)."""
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    ws = F.split(F.col(text_col), " ")
    covered = lambda i: F.exists(  # noqa: E731
        F.col("__spans"),
        lambda sp: (i >= sp["span_start"]) & (i < sp["span_end"]),
    )
    kept = F.filter(ws, lambda x, i: ~covered(i))
    out = (
        docs.join(per_doc, id_col, "left")
        .withColumn(
            "__spans",
            F.coalesce(
                "__spans",
                F.array().cast("array<struct<span_start:long,span_end:long>>"),
            ),
        )
        .select(
            id_col,
            F.array_join(kept, " ").alias("cleaned_text"),
            F.size(kept).cast("long").alias("kept_tokens"),
            (F.size(ws) - F.size(kept)).cast("long").alias("removed_tokens"),
        )
    )
    return out


def line_dedup(
    docs: DataFrame,
    sep: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style global line deduplication: every exact-duplicate line
    keeps exactly ONE occurrence corpus-wide (the lexicographically
    first (doc_id, position)); all other occurrences are removed and
    each doc's text is rebuilt from its surviving lines.

    Scale shape: one shuffle on the line value for the winner
    aggregation (high-cardinality key — the only hot spots are
    degenerate lines like the empty string, which `min(struct)` still
    reduces map-side), then a key join back and a per-doc rebuild with
    windows/groupBys PARTITIONED BY doc. No global window, no driver
    state. Output: (id, cleaned_text, kept_lines, removed_lines).
    """
    lines = docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )
    winner = lines.groupBy("line").agg(
        F.min(F.struct(F.col("__id").alias("d"), F.col("pos").alias("p"))).alias("__w")
    )
    kept = lines.join(winner, "line").filter(
        (F.col("__id") == F.col("__w.d")) & (F.col("pos") == F.col("__w.p"))
    )
    rebuilt = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda t: t["line"],
            ),
            sep,
        ).alias("cleaned_text"),
        F.count(F.lit(1)).alias("kept_lines"),
    )
    n_lines = F.size(F.split(F.col(text_col), sep)).cast("long")
    return (
        docs.select(F.col(id_col).alias("__id"), n_lines.alias("__n"))
        .join(rebuilt, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
            F.coalesce("kept_lines", F.lit(0)).cast("long").alias("kept_lines"),
            (F.col("__n") - F.coalesce("kept_lines", F.lit(0)))
            .cast("long")
            .alias("removed_lines"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 ranked retrieval: top-k docs for a bag-of-words query.

    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))  (Robertson/Lucene)
    score  = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Plan shape: tokens are filtered to the query terms BEFORE the tf
    aggregation (the explode-filter collapses 100 TB of corpus to the
    posting lists of |q| terms), df and the corpus scalars are
    dimension-sized broadcasts, and the final top-k is orderBy+limit
    (TakeOrderedAndProject — no single-partition window). Per-term
    scores are rounded then DECIMAL-summed so the result is identical
    across engines and partitionings."""
    ws = F.split(F.col(text_col), " ")
    base = docs.select(id_col, ws.alias("__ws")).select(
        id_col, F.size("__ws").cast("long").alias("dl"), "__ws"
    )
    toks = base.select(id_col, "dl", F.explode("__ws").alias("term")).filter(
        F.col("term").isin(query_terms)
    )
    tf = toks.groupBy(id_col, "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfx = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.col("dl").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    scored = tf.join(F.broadcast(dfx), "term").crossJoin(F.broadcast(stats))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    term_score = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    per_doc = (
        scored.withColumn(
            "__s", F.round(term_score, 9).cast("decimal(38,12)")
        )
        .groupBy(id_col)
        .agg(
            F.round(F.sum("__s").cast("double"), 6).alias("score"),
            F.count(F.lit(1)).alias("n_terms"),
        )
    )
    return per_doc.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


# ---------------------------------------------------------------------------
# Persisted inverted index (the build-once/search-many BM25 workflow)
# ---------------------------------------------------------------------------

TERM_BUCKETS = 64


def _term_bucket(col):
    return F.pmod(F.xxhash64(F.col(col)), F.lit(TERM_BUCKETS)).cast("int")


def _postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    ws = F.split(F.col(text_col), " ")
    base = docs.select(id_col, ws.alias("__ws")).select(
        id_col, F.size("__ws").cast("long").alias("dl"), "__ws"
    )
    return (
        base.select(id_col, "dl", F.explode("__ws").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("bucket", _term_bucket("term"))
    )


def build_text_index(
    docs: DataFrame, path: str, id_col: str = "doc_id", text_col: str = "text"
) -> None:
    """Persist the corpus's BM25 state so searches never re-tokenize it
    (completing the build-once/probe-many index family: MinHash bands
    for dedup, IVF cells for ANN, posting lists for retrieval).

    Layout: ``postings/`` = (doc, term, tf, dl) PARTITIONED BY a
    64-way term-hash bucket — a query's terms map to at most |q|
    buckets, so the scan prunes every other bucket's files; df is NOT
    stored but derived from the pruned postings at search time (a
    term's postings live wholly inside its bucket, so the pruned count
    is the exact df — and it stays correct under appends for free).
    ``docs/`` = (doc_id, dl) for the effectively-once update anti-join.
    ``stats/`` = one row of exact integers (n_docs, sum_dl) so
    incremental updates merge by addition, never a corpus rescan.
    """
    import os

    _postings(docs, id_col, text_col).write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(os.path.join(path, "postings"))
    ws = F.split(F.col(text_col), " ")
    d = docs.select(
        F.col(id_col), F.size(ws).cast("long").alias("dl")
    )
    d.write.mode("overwrite").parquet(os.path.join(path, "docs"))
    d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "stats"))


def update_text_index(
    spark,
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Append a new shard's postings; effectively-once via an anti-join
    on the doc table (column-pruned id scan, the blocks.ingest
    pattern). Stats merge by integer addition — no corpus rescan.
    Returns the number of newly indexed docs.

    The stats rewrite is read-then-overwrite; the advisory writer lock
    below serializes concurrent mutators (update/delete/compact) the
    way operators/merge.upsert_write's parquet path does; searches
    running concurrently with an update see either the old or the new
    stats, both self-consistent.
    """
    import os

    from ..operators.merge import _table_lock

    with _table_lock(path):
        return _update_text_index_locked(spark, new_docs, path, id_col, text_col)


def _update_text_index_locked(spark, new_docs, path, id_col, text_col) -> int:
    import os

    existing = spark.read.parquet(os.path.join(path, "docs")).select(id_col)
    fresh = new_docs.join(existing, on=id_col, how="left_anti").cache()
    try:
        n_new = fresh.count()
        if not n_new:
            return 0
        ws = F.split(F.col(text_col), " ")
        d = fresh.select(F.col(id_col), F.size(ws).cast("long").alias("dl"))
        # read EVERYTHING needed from the pre-append state before the
        # first write: appending to path/docs refreshes that path's
        # file index and invalidates every cached plan reading it —
        # including fresh's anti-join, which would then recompute
        # against the post-append table and collapse to zero rows
        old = _read_stats(spark, path)
        delta = d.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dl").cast("long").alias("s")
        ).collect()[0]
        _postings(fresh, id_col, text_col).write.mode("append").partitionBy(
            "bucket"
        ).parquet(os.path.join(path, "postings"))
        d.write.mode("append").parquet(os.path.join(path, "docs"))
        spark.createDataFrame(
            [(old["n_docs"] + delta["n"], old["sum_dl"] + delta["s"])],
            "n_docs bigint, sum_dl bigint",
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "stats"))
    finally:
        fresh.unpersist()
    return n_new


def _stats_frame(spark, path: str) -> DataFrame:
    """Corpus scalars as a one-row frame. The stats table is SUMMED,
    not single-row-read: a batch-built index holds one row, a
    streaming-maintained index (update_text_index_batch) holds one row
    per micro-batch — integer addition merges both layouts exactly."""
    import os

    return spark.read.parquet(os.path.join(path, "stats")).agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("sum_dl").cast("long").alias("sum_dl"),
    )


def _read_stats(spark, path: str):
    return _stats_frame(spark, path).collect()[0]


def text_index_search(
    spark,
    path: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k against the persisted index — bit-identical to
    ``bm25_topk`` on the same corpus (pytest-checked), but the scan
    touches only the query terms' hash-bucket partitions instead of
    tokenizing the corpus.

    The bucket literals are computed DRIVER-SIDE (functions/xxh.py, a
    bit-exact twin of Spark's xxhash64 — pytest-asserted); they become
    static partition filters, so file pruning happens at planning time,
    before a single posting is read. The previous form launched a tiny
    createDataFrame -> collect Spark job per search call just to
    evaluate the hash — one whole sequential driver round-trip of pure
    overhead on every probe.
    """
    import os

    from ..functions.xxh import pmod_bucket

    buckets = sorted({pmod_bucket(t, TERM_BUCKETS) for t in query_terms})
    postings = (
        spark.read.parquet(os.path.join(path, "postings"))
        .where(F.col("bucket").isin(buckets))
        .where(F.col("term").isin(query_terms))
    )
    dead = _tombstones(spark, path, id_col)
    if dead is not None:
        # logically-deleted docs drop out of tf AND df here, so the
        # pruned-postings df derivation stays exact under deletion
        postings = postings.join(F.broadcast(dead), id_col, "left_anti")
    dfx = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = _stats_frame(spark, path).select(
        "n_docs",
        (F.col("sum_dl").cast("decimal(38,0)").cast("double") / F.col("n_docs")).alias(
            "avgdl"
        ),
    )
    scored = postings.join(F.broadcast(dfx), "term").crossJoin(F.broadcast(stats))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    term_score = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    per_doc = (
        scored.withColumn("__s", F.round(term_score, 9).cast("decimal(38,12)"))
        .groupBy(id_col)
        .agg(
            F.round(F.sum("__s").cast("double"), 6).alias("score"),
            F.count(F.lit(1)).alias("n_terms"),
        )
    )
    return per_doc.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def update_text_index_batch(
    spark,
    accepted: DataFrame,
    path: str,
    batch_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Streaming-sink variant of ``update_text_index`` for
    ``foreachBatch`` (at-least-once): every write is a BATCH-SCOPED
    dynamic partition overwrite, so a replayed micro-batch rewrites
    exactly its own partitions instead of appending duplicates —
    idempotent without reading a watermark.

    Layout differs from the batch-built index only by the extra
    ``__batch_id`` partition level: ``postings/`` partitioned by
    (__batch_id, bucket) — bucket file pruning still applies, partition
    columns prune at any level — ``docs/`` by __batch_id, and
    ``stats/`` holds ONE ROW PER BATCH that searches sum (the
    ``_stats_frame`` contract). Cross-batch duplicate doc ids are
    dropped by an anti-join against every OTHER batch's doc table (own
    partition excluded, so a replay cannot erase its own rows).

    Single-maintainer contract: one streaming query per index;
    run ``delete_from_text_index`` / ``compact_text_index`` only with
    the stream stopped (their stats collapse + a concurrent replay
    could double-count a batch)."""
    import os

    docs = accepted.select(F.col(id_col), F.col(text_col))
    docs_path = os.path.join(path, "docs")
    ibkt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(64)).cast("int")
    if os.path.exists(docs_path):
        existing = spark.read.parquet(docs_path)
        if "__ibkt" in existing.columns:
            # bounded read: prune the anti-join to THIS batch's id
            # buckets (static partition filter) — without it the guard
            # scans every stored doc id per micro-batch, O(corpus) per
            # batch. Pre-bucket-layout indexes fall back to the full
            # column-pruned read.
            buckets = [
                r.b for r in docs.select(ibkt.alias("b")).distinct().collect()
            ]
            existing = existing.where(F.col("__ibkt").isin(buckets))
        docs = docs.join(
            existing.where(F.col("__batch_id") != int(batch_id)).select(
                id_col
            ),
            id_col,
            "left_anti",
        )
    docs = docs.cache()
    try:
        ws = F.split(F.col(text_col), " ")
        d = docs.select(F.col(id_col), F.size(ws).cast("long").alias("dl"))

        def batch_overwrite(df: DataFrame, sub: str, *parts: str) -> None:
            if parts:
                # one task per sub-partition — otherwise every input
                # task writes a file into every partition it holds
                df = df.repartition(*[F.col(c) for c in parts])
            (
                df.withColumn("__batch_id", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("__batch_id", *parts)
                .parquet(os.path.join(path, sub))
            )

        batch_overwrite(_postings(docs, id_col, text_col), "postings", "bucket")
        batch_overwrite(d.withColumn("__ibkt", ibkt), "docs", "__ibkt")
        batch_overwrite(
            d.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("sum_dl"),
            ),
            "stats",
        )
    finally:
        docs.unpersist()


def text_index_search_batch(
    spark,
    path: str,
    queries: dict[int, list[str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k for a BATCH of queries against the persisted index —
    the many-queries-at-once retrieval shape (mirrors the batch IVF
    probe, llm/similarity.ivf_search with a query DF).

    One pruned postings scan serves every query: the scan's partition
    filter is the union of all queries' term buckets, df per term is
    derived once from the pruned postings (exact — a term's postings
    live wholly in its bucket), and a broadcast (query_id, term) table
    fans each posting out to the queries containing its term. Per-query
    top-k is a query_id-partitioned rank window (bounded per query,
    never global). Scoring is term-for-term identical to
    ``text_index_search``; a single-query batch returns its rows
    (pytest-checked). Output: (query_id, doc_id, score, n_terms, rank).
    """
    import os

    from ..functions.xxh import pmod_bucket

    qrows = [(qid, t) for qid, ts in queries.items() for t in sorted(set(ts))]
    all_terms = sorted({t for _, t in qrows})
    # driver-side bucket literals (see text_index_search) — no Spark
    # job just to hash a handful of known terms
    buckets = sorted({pmod_bucket(t, TERM_BUCKETS) for t in all_terms})
    postings = (
        spark.read.parquet(os.path.join(path, "postings"))
        .where(F.col("bucket").isin(buckets))
        .where(F.col("term").isin(all_terms))
    )
    dead = _tombstones(spark, path, id_col)
    if dead is not None:
        postings = postings.join(F.broadcast(dead), id_col, "left_anti")
    dfx = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = _stats_frame(spark, path).select(
        "n_docs",
        (F.col("sum_dl").cast("decimal(38,0)").cast("double") / F.col("n_docs")).alias(
            "avgdl"
        ),
    )
    qdf = spark.createDataFrame(qrows, "query_id bigint, term string")
    scored = (
        postings.join(F.broadcast(dfx), "term")
        .join(F.broadcast(qdf), "term")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    term_score = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    per_q = (
        scored.withColumn("__s", F.round(term_score, 9).cast("decimal(38,12)"))
        .groupBy("query_id", id_col)
        .agg(
            F.round(F.sum("__s").cast("double"), 6).alias("score"),
            F.count(F.lit(1)).alias("n_terms"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        per_q.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "n_terms", "rank")
    )


def delete_from_text_index(
    spark, doc_ids: DataFrame, path: str, id_col: str = "doc_id"
) -> int:
    """Logical deletion (right-to-be-forgotten path): postings are
    partitioned by TERM bucket, so a doc's rows are spread across every
    bucket and physical deletion would rewrite the whole index. Instead
    the doc ids append to a tombstone table (``_deleted``) that
    ``text_index_search`` anti-joins (dimension-sized broadcast), and
    the exact-integer stats decrement immediately — scores are correct
    from the moment this returns. ``compact_text_index`` applies
    tombstones physically. Returns the number of docs newly deleted."""
    import os

    from ..operators.merge import _table_lock

    with _table_lock(path):
        return _delete_from_text_index_locked(spark, doc_ids, path, id_col)


def _delete_from_text_index_locked(spark, doc_ids, path, id_col) -> int:
    import os

    docs = spark.read.parquet(os.path.join(path, "docs"))
    hit = docs.join(doc_ids.select(id_col).distinct(), id_col, "left_semi")
    dead = _tombstones(spark, path, id_col)
    if dead is not None:
        # already-tombstoned docs must not decrement the stats twice —
        # re-sending a deletion request is a no-op, like every other
        # ingest-side mutation in this engine
        hit = hit.join(dead, id_col, "left_anti")
    hit = hit.cache()
    try:
        n = hit.count()
        if not n:
            return 0
        delta = hit.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dl").cast("long").alias("s")
        ).collect()[0]
        hit.select(id_col).write.mode("append").parquet(
            os.path.join(path, "_deleted")
        )
        old = _read_stats(spark, path)
        spark.createDataFrame(
            [(old["n_docs"] - delta["n"], old["sum_dl"] - delta["s"])],
            "n_docs bigint, sum_dl bigint",
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "stats"))
    finally:
        hit.unpersist()
    return n


def _tombstones(spark, path: str, id_col: str = "doc_id"):
    import os

    p = os.path.join(path, "_deleted")
    if not os.path.exists(p):
        return None
    return spark.read.parquet(p).select(id_col).distinct()


def compact_text_index(spark, path: str, id_col: str = "doc_id") -> int:
    """Apply tombstones physically: rewrite postings and the doc table
    without deleted docs, clear ``_deleted``. Stats were already
    decremented at delete time, so they are untouched. Returns the
    number of tombstoned docs applied. Holds the same writer lock as
    update/delete, so a tombstone appended mid-compaction cannot be
    dropped."""
    import os
    import shutil

    from ..operators.merge import _table_lock

    with _table_lock(path):
        return _compact_text_index_locked(spark, path, id_col)


def _compact_text_index_locked(spark, path: str, id_col: str) -> int:
    import os
    import shutil

    dead = _tombstones(spark, path, id_col)
    if dead is None:
        return 0
    n = dead.count()
    if n:
        for sub, part in (("postings", "bucket"), ("docs", None)):
            p = os.path.join(path, sub)
            kept = spark.read.parquet(p).join(dead, id_col, "left_anti")
            tmp = p + "._compacting"
            w = kept.write.mode("overwrite")
            if part:
                w = w.partitionBy(part)
            w.parquet(tmp)
            old = p + "._old"
            if os.path.exists(old):
                shutil.rmtree(old)
            os.rename(p, old)
            os.rename(tmp, p)
            shutil.rmtree(old)
    shutil.rmtree(os.path.join(path, "_deleted"))
    return n
