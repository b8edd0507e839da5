"""Semantics + plan-shape tests for llm/clean.py (exact-substring
span dedup and BM25). Oracle parity at corpus scale is covered by
test_oracle_queries.py over the EXTENDED registry; these tests pin the
hand-checkable semantics and the 100 TB plan contracts."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from degenter_clickhouse_spark.llm.clean import (
    bm25_topk,
    duplicate_ngram_spans,
    remove_duplicate_spans,
)


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


W = "w{}".format  # unique filler words


def test_shared_substring_becomes_one_merged_span(spark):
    # docs 0 and 1 share an 8-token run; its 4 overlapping 5-grams must
    # merge into ONE [start, end) span per doc, exactly covering the run
    shared = " ".join(W(i) for i in range(8))
    a = "a0 a1 a2 " + shared + " a3 a4"
    b = "b0 " + shared + " b1 b2 b3 b4"
    c = " ".join(f"c{i}" for i in range(12))
    spans = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicate_ngram_spans(_mk_docs(spark, [a, b, c]), n=5).collect()
    }
    assert spans == {(0, 3, 11, 8), (1, 1, 9, 8)}


def test_within_doc_repeat_is_flagged(spark):
    run = " ".join(W(i) for i in range(5))
    text = run + " x0 x1 x2 " + run
    [r0, r1] = sorted(
        duplicate_ngram_spans(_mk_docs(spark, [text]), n=5).collect(),
        key=lambda r: r.span_start,
    )
    assert (r0.span_start, r0.span_end) == (0, 5)
    assert (r1.span_start, r1.span_end) == (8, 13)


def test_remove_spans_rebuilds_text(spark):
    shared = " ".join(W(i) for i in range(6))
    a = "a0 a1 " + shared + " a2"
    b = shared  # fully covered -> empty after removal
    c = "c0 c1 c2 c3 c4 c5"  # untouched
    docs = _mk_docs(spark, [a, b, c])
    spans = duplicate_ngram_spans(docs, n=5)
    out = {r.doc_id: r for r in remove_duplicate_spans(docs, spans).collect()}
    assert out[0].cleaned_text == "a0 a1 a2"
    assert (out[0].kept_tokens, out[0].removed_tokens) == (3, 6)
    assert out[1].cleaned_text == "" and out[1].kept_tokens == 0
    assert out[2].cleaned_text == c and out[2].removed_tokens == 0


def test_bm25_matches_reference_formula(spark):
    texts = [
        "spark spark window alpha beta",
        "spark gamma delta epsilon zeta eta theta iota",
        "window window window kappa",
        "alpha beta gamma delta",  # no query terms -> absent
    ]
    got = {
        r.doc_id: (r.score, r.n_terms)
        for r in bm25_topk(_mk_docs(spark, texts), ["spark", "window"], k=10).collect()
    }
    assert 3 not in got and set(got) == {0, 1, 2}

    # sequential reference implementation
    toks = [t.split(" ") for t in texts]
    n, avgdl = len(toks), sum(len(t) for t in toks) / len(toks)
    dfx = {
        q: sum(1 for t in toks if q in t) for q in ("spark", "window")
    }

    def score(d):
        s = 0.0
        for q in ("spark", "window"):
            tf = toks[d].count(q)
            if not tf:
                continue
            idf = math.log(1.0 + (n - dfx[q] + 0.5) / (dfx[q] + 0.5))
            s += round(
                idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(toks[d]) / avgdl)),
                9,
            )
        return round(s, 6)

    for d, (sc, _) in got.items():
        assert abs(sc - score(d)) < 1e-9, (d, sc, score(d))


def test_temperature_sample_flattens_mixture(spark):
    """alpha=0.5 rates must equal the closed form sqrt-share formula,
    and the kept set must be exactly the multiplicative-hash filter —
    reproducible, no RNG."""
    from degenter_clickhouse_spark.llm.packing import temperature_sample

    rows = [(i, "big") for i in range(900)] + [(1000 + i, "small") for i in range(100)]
    d = spark.createDataFrame(rows, ["doc_id", "source"])
    out = temperature_sample(d, alpha=0.5, target_frac=0.5).collect()

    z = math.sqrt(900) + math.sqrt(100)
    rate = {
        "big": min(1.0, round(math.sqrt(900) / z * 500 / 900, 9)),
        "small": min(1.0, round(math.sqrt(100) / z * 500 / 100, 9)),
    }
    # small source is upsampled toward uniform: rate 1.0 (clipped)
    assert rate["small"] == 1.0 and rate["big"] < 0.5
    expect = {
        i
        for i, s in rows
        if (i * 2654435761) % 2**32 / 2**32 < rate[s]
    }
    assert {r.doc_id for r in out} == expect
    for r in out:
        assert abs(r.keep_rate - rate[r.source]) < 1e-12


def test_clean_plans_stay_jvm_side_with_no_global_window(spark):
    docs = _mk_docs(spark, ["x0 x1 x2 x3 x4 y", "x0 x1 x2 x3 x4 z"])
    spans = duplicate_ngram_spans(docs, n=5)
    for df in (spans, remove_duplicate_spans(docs, spans)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "SinglePartition" not in plan, plan


def test_bm25_plan_is_take_ordered(spark):
    docs = _mk_docs(spark, ["spark window a b", "spark c d e"])
    plan = (
        bm25_topk(docs, ["spark", "window"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_leakage_free_split_keeps_clusters_together(spark):
    """Members of a near-dup cluster must land in the same split, and
    the split is the hash bucket of the cluster's canonical id."""
    from degenter_clickhouse_spark.llm.dedup import leakage_free_split

    docs = spark.createDataFrame([(i,) for i in range(10)], ["doc_id"])
    # clusters: {0,3,7}, {2,5}; rest singletons
    pairs = spark.createDataFrame(
        [(0, 3), (3, 7), (2, 5)], ["d1", "d2"]
    )
    out = {r.doc_id: r for r in leakage_free_split(docs, pairs).collect()}
    assert {out[i].group_id for i in (0, 3, 7)} == {0}
    assert {out[i].group_id for i in (2, 5)} == {2}
    assert len({out[i].split for i in (0, 3, 7)}) == 1
    assert len({out[i].split for i in (2, 5)}) == 1
    for i in (1, 4, 6, 8, 9):
        assert out[i].group_id == i
    for i in range(10):
        u = (out[i].group_id * 2654435761) % 2**32 / 2**32
        want = "train" if u < 0.9 else ("val" if u < 0.95 else "test")
        assert out[i].split == want, (i, u)


def test_corpus_pipeline_end_to_end(spark):
    """The full training-data chain over real testdata: span-clean ->
    leakage-free split -> temperature sample (train only) -> token
    count -> greedy pack -> training order. Row conservation and the
    packing/order invariants hold at every stage."""
    from degenter_clickhouse_spark.llm.clean import (
        duplicate_ngram_spans,
        remove_duplicate_spans,
    )
    from degenter_clickhouse_spark.llm.dedup import (
        leakage_free_split,
        minhash_lsh_pairs,
    )
    from degenter_clickhouse_spark.llm.packing import (
        corpus_order,
        greedy_pack,
        temperature_sample,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_docs = docs.count()

    spans = duplicate_ngram_spans(docs, n=5)
    cleaned = remove_duplicate_spans(docs, spans)
    assert cleaned.count() == n_docs  # cleaning never drops docs

    splits = leakage_free_split(docs, minhash_lsh_pairs(docs, threshold=0.5))
    assert splits.count() == n_docs
    train = cleaned.join(
        splits.filter(F.col("split") == "train").select("doc_id"), "doc_id"
    ).join(docs.select("doc_id", "source"), "doc_id")
    n_train = train.count()
    assert 0 < n_train <= n_docs

    sampled = temperature_sample(train, alpha=0.5, target_frac=0.8)
    n_sampled = sampled.count()
    assert 0 < n_sampled <= n_train

    with_tokens = sampled.withColumn("tokens", F.col("kept_tokens"))
    packed = greedy_pack(with_tokens.filter(F.col("tokens") > 0), budget=512)
    stats = packed.groupBy("source", "pack_id").agg(
        F.sum("tokens").alias("pack_tokens"), F.count("*").alias("n")
    )
    # no multi-doc pack exceeds the budget (single oversized docs may)
    assert (
        stats.filter((F.col("pack_tokens") > 512) & (F.col("n") > 1)).count() == 0
    )

    ordered = corpus_order(
        sampled.select("doc_id", "source"), weights={"src0": 2}, default_weight=1
    )
    pos = sorted(r.position for r in ordered.collect())
    assert pos == list(range(n_sampled))  # dense, contiguous, no dupes


def test_cluster_documents_deterministic_and_groups_neardups(spark):
    """Domain clustering: deterministic across runs, at most k
    clusters, and exact-duplicate texts always share a cluster."""
    from degenter_clickhouse_spark.llm.similarity import cluster_documents

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    # plant exact dups with fresh ids
    dups = docs.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    d = docs.unionByName(dups)
    a = {r.doc_id: r.cluster for r in cluster_documents(d, k=8, iters=2).collect()}
    b = {r.doc_id: r.cluster for r in cluster_documents(d, k=8, iters=2).collect()}
    assert a == b  # deterministic
    assert len(set(a.values())) <= 8
    for i in range(5):
        assert a[i] == a[i + 100000]  # identical text -> identical cluster


def test_new_ops_handle_empty_and_degenerate_input(spark):
    """Empty corpora and sub-n docs must produce empty/zero results,
    not errors — the driver regenerates testdata between rounds."""
    from degenter_clickhouse_spark.llm.clean import (
        bm25_topk,
        duplicate_ngram_spans,
        remove_duplicate_spans,
    )
    from degenter_clickhouse_spark.llm.dedup import leakage_free_split
    from degenter_clickhouse_spark.llm.packing import temperature_sample

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert duplicate_ngram_spans(empty, n=5).count() == 0
    assert remove_duplicate_spans(
        empty, duplicate_ngram_spans(empty, n=5)
    ).count() == 0
    assert bm25_topk(empty, ["x"], k=5).count() == 0

    short = spark.createDataFrame([(1, "a b"), (2, "c")], ["doc_id", "text"])
    assert duplicate_ngram_spans(short, n=5).count() == 0
    out = {r.doc_id: r for r in remove_duplicate_spans(
        short, duplicate_ngram_spans(short, n=5)
    ).collect()}
    assert out[1].cleaned_text == "a b" and out[2].removed_tokens == 0

    e2 = spark.createDataFrame([], "doc_id long, source string")
    assert temperature_sample(
        e2.withColumn("text", F.lit("x")), target_frac=0.5
    ).count() == 0
    pairs = spark.createDataFrame([], "d1 long, d2 long")
    s = {r.doc_id: r.split for r in leakage_free_split(short, pairs).collect()}
    assert set(s) == {1, 2}


# ---------------------------------------------------------------------------
# persisted inverted index
# ---------------------------------------------------------------------------


def test_text_index_search_matches_direct(spark, tmp_path):
    from degenter_clickhouse_spark import catalog
    from degenter_clickhouse_spark.llm.clean import (
        build_text_index,
        text_index_search,
    )

    docs = catalog.load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "idx")
    build_text_index(docs, path)
    terms = ["the", "data", "pipeline"]
    direct = bm25_topk(docs, terms, k=10).collect()
    indexed = text_index_search(spark, path, terms, k=10).collect()
    assert [tuple(r) for r in indexed] == [tuple(r) for r in direct]


def test_text_index_update_equals_rebuild(spark, tmp_path):
    from degenter_clickhouse_spark import catalog
    from degenter_clickhouse_spark.llm.clean import (
        build_text_index,
        text_index_search,
        update_text_index,
    )

    docs = catalog.load_table(spark, "/root/testdata/sf0.001", "documents")
    old = docs.where(F.col("doc_id") < 400)
    new = docs.where(F.col("doc_id") >= 380)  # overlaps 20 already-indexed
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    build_text_index(old, inc)
    assert update_text_index(spark, new, inc) == new.join(
        old, "doc_id", "left_anti"
    ).count()
    # re-sending the same shard is a no-op
    assert update_text_index(spark, new, inc) == 0
    build_text_index(docs, full)
    terms = ["the", "data", "model"]
    assert [
        tuple(r) for r in text_index_search(spark, inc, terms, k=10).collect()
    ] == [tuple(r) for r in text_index_search(spark, full, terms, k=10).collect()]


def test_text_index_search_prunes_buckets(spark, tmp_path):
    from degenter_clickhouse_spark import catalog
    from degenter_clickhouse_spark.llm.clean import (
        build_text_index,
        text_index_search,
    )

    docs = catalog.load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "idx")
    build_text_index(docs, path)
    plan = text_index_search(spark, path, ["the"])._jdf.queryExecution().executedPlan().toString()
    # the single query term maps to one hash bucket; the scan must carry
    # a static partition filter on it (planning-time file pruning)
    assert "bucket" in plan and "PartitionFilters: [" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), f"empty partition filters in:\n{plan[:2000]}"


def test_text_index_delete_and_compact(spark, tmp_path):
    """Tombstoned docs vanish from search results AND from the derived
    df/stats immediately; physical compaction reproduces exactly the
    index built without them."""
    from degenter_clickhouse_spark import catalog
    from degenter_clickhouse_spark.llm.clean import (
        build_text_index,
        compact_text_index,
        delete_from_text_index,
        text_index_search,
    )

    docs = catalog.load_table(spark, "/root/testdata/sf0.001", "documents")
    full, survivors_only = str(tmp_path / "full"), str(tmp_path / "ref")
    build_text_index(docs, full)
    terms = ["the", "data", "model"]
    victims = [
        r["doc_id"] for r in text_index_search(spark, full, terms, k=3).collect()
    ]
    vdf = spark.createDataFrame([(v,) for v in victims], ["doc_id"])
    assert delete_from_text_index(spark, vdf, full) == 3
    assert delete_from_text_index(spark, vdf, full) == 0  # idempotent
    build_text_index(
        docs.join(vdf, "doc_id", "left_anti"), survivors_only
    )
    got = [tuple(r) for r in text_index_search(spark, full, terms, k=10).collect()]
    want = [
        tuple(r) for r in text_index_search(spark, survivors_only, terms, k=10).collect()
    ]
    assert got == want and not (set(victims) & {r[0] for r in got})
    # physical compaction: same results, tombstones gone
    assert compact_text_index(spark, full) == 3
    after = [tuple(r) for r in text_index_search(spark, full, terms, k=10).collect()]
    assert after == want
    assert compact_text_index(spark, full) == 0


def test_lm_score_from_persisted_model_bit_equal(spark, tmp_path):
    """VERDICT r4 #3: fit-once/score-many — scoring from a persisted LM
    model must be BIT-EQUAL to fit-and-score, for both orders. The
    models are exact-integer tables, so parquet round-tripping cannot
    move a value."""
    from degenter_clickhouse_spark import catalog
    from degenter_clickhouse_spark.llm import lm

    from .helpers import SF_DIR

    docs = catalog.load_table(spark, SF_DIR, "documents").select("doc_id", "text")

    def snap(df):
        return sorted(tuple(r) for r in df.collect())

    for order, score in ((2, lm.bigram_fluency), (3, lm.trigram_fluency)):
        path = str(tmp_path / f"lm{order}")
        info = lm.build_lm_model(docs, path, order=order)
        assert info["order"] == order and all(
            n > 0 for n in info["rows"].values()
        )
        direct = snap(score(docs))
        from_model = snap(
            score(docs, model=lm.load_lm_model(spark, path, order=order))
        )
        assert direct == from_model, f"order {order} diverged"


def test_lm_cli_build_then_score(spark, tmp_path):
    """CLI seam: `lm build` then `lm score` produce a scored parquet
    equal to the library fit-and-score path."""
    from degenter_clickhouse_spark import catalog, cli
    from degenter_clickhouse_spark.llm import lm

    from .helpers import SF_DIR

    docs = catalog.load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    ref = str(tmp_path / "ref")
    docs.write.parquet(ref)
    model = str(tmp_path / "model")
    scored = str(tmp_path / "scored")
    assert cli.main(["lm", "build", "--model", model, "--order", "2", "--ref", ref]) == 0
    assert (
        cli.main(
            ["lm", "score", "--model", model, "--order", "2",
             "--input", ref, "--output", scored]
        )
        == 0
    )
    got = sorted(tuple(r) for r in spark.read.parquet(scored).collect())
    want = sorted(tuple(r) for r in lm.bigram_fluency(docs).collect())
    assert got == want


def test_rrf_fusion_properties(spark):
    """RRF invariants: a doc ranked by BOTH retrievers outscores a doc
    holding the same ranks in only one; contributions are the exact
    integers RRF_SCALE div (k + rank); order ties break on doc id."""
    from degenter_clickhouse_spark.llm.fusion import RRF_SCALE, rrf_fuse

    r1 = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["doc_id", "rank"])
    r2 = spark.createDataFrame([(1, 2), (4, 1), (5, 3)], ["doc_id", "rank"])
    out = {r.doc_id: r for r in rrf_fuse([r1, r2], k_const=60, topk=10).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1].n_retrievers == 2
    assert out[1].rrf_scaled == RRF_SCALE // 61 + RRF_SCALE // 62
    assert out[4].rrf_scaled == RRF_SCALE // 61
    # doc 1 (both lists) beats every single-list doc
    assert all(out[1].rrf_scaled > out[d].rrf_scaled for d in (2, 3, 4, 5))
    # equal-score tie (doc 2 rank2-only vs doc absent) -> doc id ordering
    tie = rrf_fuse(
        [spark.createDataFrame([(7, 1), (3, 1)], ["doc_id", "rank"])],
        topk=2,
    ).collect()
    assert [r.doc_id for r in tie] == [3, 7]


def test_rrf_fusion_guards(spark):
    """ADVICE r5: empty input raises a descriptive error; a doc
    duplicated WITHIN one ranking counts once at its best rank (no
    double-count in rrf_scaled or n_retrievers)."""
    import pytest

    from degenter_clickhouse_spark.llm.fusion import RRF_SCALE, rrf_fuse

    with pytest.raises(ValueError, match="at least one ranking"):
        rrf_fuse([])
    dup = spark.createDataFrame(
        [(1, 3), (1, 1), (2, 2)], ["doc_id", "rank"]
    )
    out = {r.doc_id: r for r in rrf_fuse([dup], topk=10).collect()}
    assert out[1].n_retrievers == 1
    assert out[1].rrf_scaled == RRF_SCALE // 61  # best rank only


def test_hybrid_retrieval_index_backed_equals_direct_on_probed_set(spark):
    """VERDICT r5 #1: the registered hybrid_retrieval probes the
    persisted text + IVF indexes; its legs must be bit-equal to the
    same retrieval computed directly (bm25_topk on the corpus; ivf_topk
    with the same seed centroids, no persisted index) — index access
    changes the I/O path, never the answer."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from degenter_clickhouse_spark.llm.clean import bm25_topk
    from degenter_clickhouse_spark.llm.fusion import rrf_fuse
    from degenter_clickhouse_spark.llm.similarity import (
        fit_ivf_centroids,
        ivf_topk,
    )
    from degenter_clickhouse_spark.queries import clean_ext as CE
    from degenter_clickhouse_spark.queries.llm import _docs, _embs

    sf_dir = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r) for r in CE.q_hybrid_retrieval(spark, sf_dir).collect()
    )
    # direct twin: same parameters, no persisted index anywhere
    bm = bm25_topk(_docs(spark, sf_dir), CE.BM25_TERMS, k=CE.BM25_K)
    wb = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    bmr = bm.select("doc_id", F.row_number().over(wb).alias("rank"))
    e = _embs(spark, sf_dir)
    cents = fit_ivf_centroids(e, k=CE._IVF_CELLS, iters=0)
    ann = ivf_topk(
        e.filter(F.col("vec_id") == CE._ANN_Q),
        e,
        cents,
        k=CE._ANN_K,
        nprobe=CE._IVF_NPROBE,
    )
    annr = ann.select(F.col("c_id").alias("doc_id"), "rank")
    want = sorted(
        tuple(r)
        for r in rrf_fuse([bmr, annr], k_const=CE.RRF_K, topk=CE.RRF_TOPK)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "rrf_scaled",
            "n_retrievers",
            "rrf",
        )
        .collect()
    )
    assert got == want


def test_hybrid_retrieval_plan_probes_indexes(spark):
    """The registered hybrid plan must read the PERSISTED indexes with
    pruned scans: a static bucket partition filter on the postings
    (lexical leg) and a scan of the cell-partitioned IVF corpus (dense
    leg) — not a re-tokenization / full-embedding-table rescan."""
    from degenter_clickhouse_spark.queries import clean_ext as CE

    import re

    df = CE.q_hybrid_retrieval(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # postings scan carries a non-empty static partition filter on bucket
    m = re.search(r"PartitionFilters: \[([^\]]*bucket[^\]]*)\]", plan)
    assert m and m.group(1).strip(), plan[:4000]
    # both index locations appear as scan roots
    assert plan.count("hybrid_idx_") >= 2, "expected text AND ivf index scans"


def test_dsir_score_from_persisted_model_bit_equal(spark, tmp_path):
    """VERDICT r5 #3: fit-once/score-many for DSIR — scoring from the
    persisted lambda artifact must be BIT-EQUAL to fit-and-score on
    the fitted corpus (rounded doubles round-trip parquet exactly)."""
    from pyspark.sql import functions as F

    from degenter_clickhouse_spark import catalog
    from degenter_clickhouse_spark.llm import dsir

    from .helpers import SF_DIR

    raw = catalog.load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "text"
    )
    target = raw.where(F.col("lang") == "en")
    path = str(tmp_path / "dsir")
    info = dsir.build_dsir_model(raw, target, path)
    assert 0 < info["rows"] <= dsir.N_BUCKETS
    assert info["nt"] > 0 and info["nr"] >= info["nt"]

    def snap(df):
        return sorted(tuple(r) for r in df.collect())

    direct = snap(dsir.dsir_scores(raw, target))
    from_model = snap(
        dsir.dsir_scores(raw, model=dsir.load_dsir_model(spark, path))
    )
    assert direct == from_model


def test_dsir_model_default_lambda_for_unseen_buckets(spark, tmp_path):
    """Scoring a corpus the model was NOT fitted on: feature buckets
    the fit never saw take the persisted smoothed default instead of
    silently dropping out of the DECIMAL sum."""
    from degenter_clickhouse_spark.llm import dsir

    fit = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta delta")], ["doc_id", "text"]
    )
    tgt = spark.createDataFrame([(1, "alpha beta gamma")], ["doc_id", "text"])
    path = str(tmp_path / "m")
    dsir.build_dsir_model(fit, tgt, path)
    model = dsir.load_dsir_model(spark, path)
    meta = model[1].collect()[0]
    # every bigram of this doc is outside the fitted vocabulary (with
    # 8192 buckets and 4 fitted grams, collisions are checked below)
    new = spark.createDataFrame(
        [(9, "zq1 zq2 zq3 zq4")], ["doc_id", "text"]
    )
    fitted_buckets = {r["f"] for r in model[0].collect()}
    got = dsir.dsir_scores(new, model=model).collect()[0]
    assert got["n_feats"] == 3
    # if no bucket collided with a fitted one, the score is exactly
    # 3 * lam_default; with a collision it still must be non-null
    new_buckets = {
        r["f"]
        for r in dsir._features(new, "doc_id", "text").select("f").collect()
    }
    if not (new_buckets & fitted_buckets):
        assert got["dsir_score"] == round(3 * meta["lam_default"], 12)
    assert got["dsir_score"] is not None


def test_dsir_cli_build_then_score(spark, tmp_path):
    """CLI seam: `dsir build` then `dsir score` produce a scored
    parquet equal to the library fit-and-score path."""
    from pyspark.sql import functions as F

    from degenter_clickhouse_spark import catalog, cli
    from degenter_clickhouse_spark.llm import dsir

    from .helpers import SF_DIR

    raw = catalog.load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "text"
    )
    raw_p = str(tmp_path / "raw")
    tgt_p = str(tmp_path / "tgt")
    raw.write.parquet(raw_p)
    raw.where(F.col("lang") == "en").write.parquet(tgt_p)
    model = str(tmp_path / "model")
    scored = str(tmp_path / "scored")
    assert (
        cli.main(
            ["dsir", "build", "--model", model, "--raw", raw_p,
             "--target", tgt_p]
        )
        == 0
    )
    assert (
        cli.main(
            ["dsir", "score", "--model", model, "--input", raw_p,
             "--output", scored]
        )
        == 0
    )
    got = sorted(tuple(r) for r in spark.read.parquet(scored).collect())
    want = sorted(
        tuple(r)
        for r in dsir.dsir_scores(
            raw.select("doc_id", "text"),
            raw.where(F.col("lang") == "en").select("doc_id", "text"),
        ).collect()
    )
    assert got == want


def test_bm25_batch_matches_per_query_single_search(spark, tmp_path):
    """The batch probe must return, per query, exactly the rows the
    single-query index search returns (same index, same k) — one
    pruned scan serving N queries changes the I/O shape, never the
    answer."""
    from degenter_clickhouse_spark import catalog
    from degenter_clickhouse_spark.llm.clean import (
        build_text_index,
        text_index_search,
        text_index_search_batch,
    )

    from .helpers import SF_DIR

    docs = catalog.load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    idx = str(tmp_path / "idx")
    build_text_index(docs, idx)
    queries = {7: ["spark", "merge"], 8: ["join", "scan", "row"], 9: ["stream"]}
    batch = text_index_search_batch(spark, idx, queries, k=8)
    got = {
        qid: sorted(
            (r["doc_id"], r["score"], r["n_terms"], r["rank"])
            for r in batch.where(batch.query_id == qid).collect()
        )
        for qid in queries
    }
    for qid, terms in queries.items():
        single = text_index_search(spark, idx, terms, k=8).collect()
        want = sorted(
            (r["doc_id"], r["score"], r["n_terms"], i + 1)
            for i, r in enumerate(single)
        )
        assert got[qid] == want, f"query {qid} diverged"


def test_rrf_fuse_batch_equals_per_query_fusion(spark):
    """rrf_fuse_batch must return, per query, exactly what rrf_fuse
    returns for that query's rankings alone — including the
    within-ranking best-rank dedupe."""
    from pyspark.sql import functions as F

    from degenter_clickhouse_spark.llm.fusion import rrf_fuse, rrf_fuse_batch

    r1 = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (0, 2, 5), (1, 7, 1), (1, 8, 2)],
        ["query_id", "doc_id", "rank"],
    )
    r2 = spark.createDataFrame(
        [(0, 2, 1), (0, 3, 2), (1, 8, 1), (1, 9, 2)],
        ["query_id", "doc_id", "rank"],
    )
    batch = rrf_fuse_batch([r1, r2], k_const=60, topk=3)
    for qid in (0, 1):
        got = sorted(
            (r["doc_id"], r["rrf_scaled"], r["n_retrievers"], r["rrf"])
            for r in batch.where(batch.query_id == qid).collect()
        )
        single = rrf_fuse(
            [r.where(F.col("query_id") == qid).drop("query_id") for r in (r1, r2)],
            k_const=60,
            topk=3,
        )
        want = sorted(
            (r["doc_id"], r["rrf_scaled"], r["n_retrievers"], r["rrf"])
            for r in single.collect()
        )
        assert got == want, f"query {qid} diverged"


def test_driver_xxhash64_matches_spark(spark):
    """functions/xxh.py is the driver-side twin of Spark's xxhash64 —
    the static partition-prune bucket literals of every text-index
    search depend on it being bit-exact (ASCII, multibyte UTF-8, all
    length classes around the 4/8/32-byte XXH64 block boundaries)."""
    from degenter_clickhouse_spark.functions.xxh import pmod_bucket, xxhash64

    cases = (
        ["", "a", "ab", "abc", "abcd", "spark", "window", "merge"]
        + ["x" * n for n in (7, 8, 9, 15, 16, 31, 32, 33, 63, 64, 100)]
        + ["héllo wörld", "日本語テキスト", "emoji 🚀 tail"]
    )
    got = spark.createDataFrame([(c,) for c in cases], "s string").select(
        "s",
        F.xxhash64("s").alias("h"),
        F.pmod(F.xxhash64("s"), F.lit(64)).alias("b"),
    )
    for r in got.collect():
        assert xxhash64(r["s"]) == r["h"], r["s"]
        assert pmod_bucket(r["s"], 64) == r["b"], r["s"]
