"""Semantic tests for the LLM-pipeline operators beyond oracle parity:
LSH recall vs the exact baseline, MinHash-LSH vs exhaustive Jaccard,
dedup correctness properties, multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from degenter_clickhouse_spark import catalog
from degenter_clickhouse_spark.llm import dedup, multimodal, similarity

from .helpers import SF_DIR


def test_minhash_lsh_finds_planted_neardups(spark):
    """The corpus has planted near-dup pairs (Jaccard >= ~0.95). LSH
    candidate generation must recover every pair the exhaustive
    shingle-join finds at the 0.5 threshold: with 4 bands x 2 rows,
    P(all bands miss | j=0.95) = (1 - 0.95^2)^4 ~ 1e-4."""
    docs = catalog.load_table(spark, SF_DIR, "documents")
    exact = {
        (r.d1, r.d2)
        for r in dedup.jaccard_pairs(docs, threshold=0.5).collect()
    }
    lsh = {(r.d1, r.d2) for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert exact, "corpus should contain planted near-dups"
    assert lsh <= exact, "LSH emits only Jaccard-verified pairs"
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, f"LSH recall too low: {recall} ({len(lsh)}/{len(exact)})"


def test_exact_dedup_properties(spark):
    docs = catalog.load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    dupes = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text"
    )
    out = dedup.exact_dedup(docs.unionByName(dupes)).collect()
    assert len(out) == 20
    # canonical is always the original (min id), removed is the clone
    assert all(r.canonical_id == r.doc_id - 500000 for r in out)


def test_lsh_ann_recall_vs_brute(spark):
    emb = catalog.load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    brute = similarity.brute_topk(q, emb, k=5).collect()
    approx = similarity.lsh_topk(q, emb, k=5).collect()
    brute_sets = {}
    for r in brute:
        brute_sets.setdefault(r.q_id, set()).add(r.c_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.q_id, set()).add(r.c_id)
    # bucketed search returns a subset of candidates; measure top-5 recall
    hits = sum(len(brute_sets[q] & approx_sets.get(q, set())) for q in brute_sets)
    total = sum(len(v) for v in brute_sets.values())
    recall = hits / total
    # single-probe 8-bit LSH on near-orthogonal vectors is a coarse
    # filter; just assert it returns ranked same-bucket results with
    # nontrivial overlap and far fewer comparisons than brute force
    assert recall > 0.05, f"LSH ANN recall collapsed: {recall}"
    for r in approx:
        assert 1 <= r.rank <= 5


def test_simhash_clusters_near_identical_docs(spark):
    docs = catalog.load_table(spark, SF_DIR, "documents")
    near = dedup.jaccard_pairs(docs, threshold=0.9).collect()
    if not near:  # corpus-dependent; planted dups are ~0.95+
        return
    fp = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    # near-identical docs must have close fingerprints (hamming <= 4/16)
    for r in near:
        ham = bin(fp[r.d1] ^ fp[r.d2]).count("1")
        assert ham <= 4, f"simhash too far for near-dups {r.d1},{r.d2}: {ham}"


def test_multimodal_features_match_python(spark):
    docs = catalog.load_table(spark, SF_DIR, "documents").limit(50)
    rows = {r.doc_id: r.text for r in docs.collect()}
    feats = multimodal.extract_features(multimodal.media_table(docs)).collect()
    assert len(feats) == len(rows)
    for r in feats:
        b = rows[r.doc_id].encode("utf-8")
        assert r.byte_len == len(b)
        assert r.checksum == sum(b) % multimodal.CHECKSUM_MOD
        assert r.width == len(b) % 640


def test_frame_sample_shape(spark):
    docs = catalog.load_table(spark, SF_DIR, "documents").limit(20)
    fs = multimodal.frame_sample(multimodal.media_table(docs), every_n=7).collect()
    assert fs
    for r in fs:
        assert 0 <= r.frame_idx < r.n_frames
        assert r.frame_idx % 7 == 0


def test_neardup_cluster_resolution(spark):
    docs = catalog.load_table(spark, SF_DIR, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    res = dedup.dedup_resolution(docs, pairs).collect()
    assert len(res) == docs.count()
    by_id = {r.doc_id: r for r in res}
    # every pair ends up in one cluster with a single canonical
    for p in pairs.collect():
        assert by_id[p.d1].canonical_id == by_id[p.d2].canonical_id
        canon = by_id[p.d1].canonical_id
        assert canon <= min(p.d1, p.d2)
        assert by_id[canon].keep
    # non-duplicated docs keep themselves
    dup_ids = {p.d1 for p in pairs.collect()} | {p.d2 for p in pairs.collect()}
    for r in res:
        if r.doc_id not in dup_ids:
            assert r.keep and r.canonical_id == r.doc_id
    # transitivity: build components in python and compare exactly
    import itertools

    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for p in pairs.collect():
        union(p.d1, p.d2)
    for d in dup_ids:
        assert by_id[d].canonical_id == find(d)


def test_ivf_topk_recall_and_cost(spark):
    emb = catalog.load_table(spark, SF_DIR, "embeddings")
    cents = similarity.fit_ivf_centroids(emb, k=8, iters=2).cache()
    assert cents.count() == 8
    q = emb.filter(F.col("vec_id") < 10)
    brute = similarity.brute_topk(q, emb, k=5).collect()
    approx = similarity.ivf_topk(q, emb, cents, k=5, nprobe=3).collect()
    brute_sets, approx_sets = {}, {}
    for r in brute:
        brute_sets.setdefault(r.q_id, set()).add(r.c_id)
    for r in approx:
        approx_sets.setdefault(r.q_id, set()).add(r.c_id)
    hits = sum(len(brute_sets[i] & approx_sets.get(i, set())) for i in brute_sets)
    total = sum(len(v) for v in brute_sets.values())
    # nprobe=3 of 8 cells scores ~3/8 of the corpus; near-orthogonal
    # neighbors still land in shared cells far above chance
    assert hits / total >= 0.3, f"IVF recall: {hits}/{total}"
    # every query returns a full ranked page
    for i, s in approx_sets.items():
        assert len(s) == 5
    cents.unpersist()


def test_repetition_metrics_edge_cases(spark):
    from degenter_clickhouse_spark.llm import text as T

    rows = [
        (1, "a b a b a b"),        # one repeated 2-gram dominates
        (2, "u v w x y z"),        # no repetition at all
        (3, "q"),                  # shorter than any 2-gram
    ]
    df = (
        spark.createDataFrame(rows, ["doc_id", "text"])
        .withColumn("words", T.words())
        .withColumn("g2", T.shingles("words", 2))
    )
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            T.word_repetition_ratio("words").alias("rep"),
            T.dup_ngram_fraction("g2").alias("dup2"),
            T.top_ngram_fraction("g2").alias("top2"),
            T.mean_word_length("words").alias("mwl"),
            T.nonalnum_word_fraction("words").alias("sym"),
        ).collect()
    }
    # doc 1: 6 words over alphabet {a,b} -> rep = 1 - 2/6; 5 bigrams =
    # [ab, ba, ab, ba, ab] -> dup2 = 1 - 2/5, top2 = 3/5
    assert abs(got[1]["rep"] - (1 - 2 / 6)) < 1e-12
    assert abs(got[1]["dup2"] - (1 - 2 / 5)) < 1e-12
    assert abs(got[1]["top2"] - 3 / 5) < 1e-12
    # doc 2: all distinct -> everything 0 except top2 = 1/5
    assert got[2]["rep"] == 0.0 and got[2]["dup2"] == 0.0
    assert abs(got[2]["top2"] - 1 / 5) < 1e-12
    # doc 3: no 2-grams -> fractions all 0, mean word len = 1
    assert got[3]["dup2"] == 0.0 and got[3]["top2"] == 0.0
    assert got[3]["mwl"] == 1.0 and got[3]["sym"] == 0.0


def test_semantic_dedup_groups_planted_duplicates(spark):
    import random

    from pyspark.sql import functions as F

    from degenter_clickhouse_spark.llm import dedup

    rng = random.Random(7)
    base = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(20)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # plant exact copies of vectors 0..4 under new ids — same bucket,
    # cosine 1.0, so each copy must collapse onto its source
    rows += [(100 + i, [float(x) for x in base[i]]) for i in range(5)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    out = {r["vec_id"]: r for r in dedup.semantic_dedup(df, threshold=0.99).collect()}
    assert len(out) == 25
    for i in range(5):
        assert out[100 + i]["canonical_id"] == i and not out[100 + i]["keep"]
        assert out[i]["canonical_id"] == i and out[i]["keep"]


def test_contamination_ngram_collision(spark):
    from degenter_clickhouse_spark.llm import dedup

    bench = spark.createDataFrame(
        [(1000, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [
            # shares the 3-grams of the benchmark sentence verbatim
            (1, "watch the quick brown fox jumps today"),
            # same words, shuffled order -> no 3-gram collision
            (2, "fox brown the jumps quick dog lazy over"),
            # disjoint vocabulary
            (3, "alpha beta gamma delta epsilon zeta"),
            # too short for any 3-gram
            (4, "hi there"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in dedup.contamination(train, bench).collect()}
    assert len(got) == 4
    # doc 1 contains "the quick brown", "quick brown fox", "brown fox jumps"
    assert got[1].contaminated and got[1].n_hits == 3
    assert not got[2].contaminated and got[2].n_hits == 0
    assert not got[3].contaminated and got[3].n_hits == 0
    assert not got[4].contaminated and got[4].n_hits == 0


def test_greedy_pack_semantics(spark):
    """Greedy packing: budget overflow starts a new pack; an oversized
    doc gets a pack of its own; groups pack independently."""
    from degenter_clickhouse_spark.llm import packing

    rows = [
        # group a, budget 10: [4, 5] fit; 3 overflows -> pack 1; 20 is
        # oversized -> its own pack 2; 2 follows in pack 3
        ("a", 1, 4),
        ("a", 2, 5),
        ("a", 3, 3),
        ("a", 4, 20),
        ("a", 5, 2),
        # group b independent: starts back at pack 0
        ("b", 6, 10),
        ("b", 7, 1),
    ]
    d = spark.createDataFrame(rows, ["source", "doc_id", "tokens"])
    got = {
        r.doc_id: (r.pack_id, r.pack_pos)
        for r in packing.greedy_pack(d, budget=10).collect()
    }
    assert got == {
        1: (0, 0),
        2: (0, 1),
        3: (1, 0),
        4: (2, 0),
        5: (3, 0),
        6: (0, 0),
        7: (1, 0),
    }
    stats = {
        (r.source, r.pack_id): (r.n_docs, r.pack_tokens)
        for r in packing.pack_stats(
            packing.greedy_pack(d, budget=10), budget=10
        ).collect()
    }
    assert stats[("a", 0)] == (2, 9)
    assert stats[("a", 2)] == (1, 20)


def test_ivf_index_build_and_search_matches_direct(spark, tmp_path):
    """A persisted IVF index returns exactly what the direct (in-memory)
    IVF top-k returns for the same centroids, and the probe plan reads
    the cell-partitioned layout."""
    from degenter_clickhouse_spark import catalog
    from degenter_clickhouse_spark.llm import similarity as SIM

    vecs = catalog.load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = vecs.limit(5)
    idx = str(tmp_path / "ivf")
    SIM.build_ivf_index(vecs, idx, k_cells=8, iters=2)
    got = {
        (r.q_id, r.rank): (r.c_id, r.cosine)
        for r in SIM.ivf_search(spark, idx, queries, k=3, nprobe=2).collect()
    }
    cents = SIM.fit_ivf_centroids(vecs, k=8, iters=2)
    want = {
        (r.q_id, r.rank): (r.c_id, r.cosine)
        for r in SIM.ivf_topk(queries, vecs, cents, k=3, nprobe=2).collect()
    }
    assert got == want and len(got) > 0
    # the index layout is cell-partitioned (file-level pruning target)
    import os

    assert any(p.startswith("cell=") for p in os.listdir(os.path.join(idx, "cells")))


def test_minhash_index_probe_matches_batch(spark, tmp_path):
    """Probing a new shard against a persisted MinHash index finds
    exactly the pairs the batch LSH finds on the full union that touch
    the new shard — the corpus is never re-shingled."""
    from pyspark.sql import functions as F

    from degenter_clickhouse_spark import catalog
    from degenter_clickhouse_spark.llm import dedup

    docs = catalog.load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    shard = docs.filter(F.col("doc_id") % 5 == 0).unionByName(
        # a guaranteed near-dup: clone of a corpus doc under a new id
        docs.filter(F.col("doc_id") == 1).select(
            (F.col("doc_id") + 900000).alias("doc_id"), "text"
        )
    )
    idx = str(tmp_path / "mh")
    dedup.build_minhash_index(corpus, idx)
    got = {
        (r.d1, r.d2): r.jaccard
        for r in dedup.minhash_probe(spark, idx, shard, threshold=0.5).collect()
    }
    shard_ids = {r.doc_id for r in shard.select("doc_id").collect()}
    want = {
        (r.d1, r.d2): r.jaccard
        for r in dedup.minhash_lsh_pairs(
            corpus.unionByName(shard), threshold=0.5
        ).collect()
        if r.d1 in shard_ids or r.d2 in shard_ids
    }
    assert got == want
    assert (1, 900001) in got and got[(1, 900001)] == 1.0
    # the index shingle layout is bucket-partitioned, and a probe's
    # verify read prunes to the candidate docs' buckets (bounded read)
    import os

    assert any(
        p.startswith("__bucket=") for p in os.listdir(os.path.join(idx, "shingles"))
    )
    cand = spark.createDataFrame([(1,)], "d1 long")
    pruned = dedup.candidate_index_shingles(spark, idx, cand)
    n_idx = spark.read.parquet(os.path.join(idx, "shingles")).select("d").distinct().count()
    assert 0 < pruned.select("d").distinct().count() < n_idx
    empty = spark.createDataFrame([], "d1 long")
    assert dedup.candidate_index_shingles(spark, idx, empty) is None


def test_hash_embed_feeds_similarity_stack(spark):
    """The feature-hashing embedder produces unit vectors that plug
    straight into the ANN operators: exact duplicates score cosine 1.0
    and rank first; vectors are L2-normalized; empty docs embed to the
    zero vector without errors."""
    import math

    from pyspark.sql import functions as F

    from degenter_clickhouse_spark import catalog
    from degenter_clickhouse_spark.llm import similarity as SIM

    docs = catalog.load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    clone = docs.filter(F.col("doc_id") == 3).select(
        (F.col("doc_id") + 800000).alias("doc_id"), "text"
    )
    empty = spark.createDataFrame([(900000, "")], ["doc_id", "text"])
    vecs = SIM.hash_embed(docs.unionByName(clone).unionByName(empty))
    norms = vecs.select(
        "vec_id",
        F.expr(
            "aggregate(embedding, CAST(0.0 AS DOUBLE), "
            "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
        ).alias("n2"),
    ).collect()
    for r in norms:
        assert r.n2 == 0.0 or math.isclose(r.n2, 1.0, rel_tol=1e-6), r
    top = SIM.brute_topk(vecs.filter(F.col("vec_id") == 800003), vecs, k=1).collect()
    assert len(top) == 1 and top[0].c_id == 3
    assert math.isclose(top[0].cosine, 1.0, rel_tol=1e-9)


def test_corpus_pipeline_composes_end_to_end(spark, tmp_path):
    """The full training-data flow on raw text, no pre-made embeddings:
    chunk -> hash-embed chunks -> build IVF index -> probe for near-dups
    -> drop dup chunks -> greedy-pack survivors. Every stage's output
    feeds the next; the planted duplicate documents' chunks are caught
    by the embedding index and never reach a pack."""
    from pyspark.sql import functions as F

    from degenter_clickhouse_spark import catalog
    from degenter_clickhouse_spark.llm import packing
    from degenter_clickhouse_spark.llm import similarity as SIM
    from degenter_clickhouse_spark.llm import text as T

    docs = catalog.load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "source", "text"
    )
    clones = docs.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 700000).alias("doc_id"), "source", "text"
    )
    corpus = docs.unionByName(clones)

    # 1) chunk (overlapping token windows), keep chunk text
    d = corpus.withColumn("ws", F.split("text", " "))
    chunks = (
        d.select(
            "doc_id", "source", "ws",
            F.explode(F.sequence(F.lit(0), T.n_chunks("ws") - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id", "source", "chunk_idx",
            F.array_join(T.chunk_slice("ws", "chunk_idx"), " ").alias("text"),
            (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("chunk_id"),
        )
    )
    # 2) embed every chunk
    vecs = SIM.hash_embed(chunks, id_col="chunk_id")
    # 3) index + probe: exact-clone chunks have cosine 1.0 neighbors
    idx = str(tmp_path / "ivf")
    SIM.build_ivf_index(vecs, idx, k_cells=8, iters=2)
    dups = (
        SIM.ivf_search(spark, idx, vecs.filter(F.col("vec_id") >= 700000000), k=1, nprobe=2)
        .filter(F.col("cosine") >= 0.999999)
        .select(F.col("q_id").alias("chunk_id"))
    )
    assert dups.count() >= 3  # every cloned doc's chunks found
    # 4) drop dup chunks, 5) pack survivors per source
    kept = chunks.join(dups, "chunk_id", "left_anti").select(
        "source", "chunk_id", F.size(F.split("text", " ")).cast("long").alias("tokens")
    )
    packed = packing.greedy_pack(
        kept, budget=128, group_col="source", order_col="chunk_id"
    )
    assert packed.count() == kept.count() > 0
    stats = packing.pack_stats(packed, budget=128).filter(F.col("n_docs") > 1)
    assert stats.filter(F.col("pack_tokens") > 128).count() == 0
    packed_ids = {r.chunk_id for r in packed.select("chunk_id").collect()}
    dup_ids = {r.chunk_id for r in dups.collect()}
    assert packed_ids.isdisjoint(dup_ids)


def _py_bpe(word_counts, n_merges):
    """Reference BPE implementation: greedy most-frequent adjacent pair,
    lexicographic tie-break, left-to-right non-overlapping merges."""
    words = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                pairs[k] = pairs.get(k, 0) + word_counts[w]
        if not pairs:
            break
        (left, right), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((left, right))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words


def test_bpe_merges_match_reference_implementation(spark):
    """Distributed BPE fitting returns exactly the merge list a
    sequential reference implementation produces (greedy max pair,
    lexicographic ties, non-overlapping application), and tokenizing
    with it conserves characters."""
    from degenter_clickhouse_spark import catalog
    from degenter_clickhouse_spark.llm import bpe

    docs = (
        catalog.load_table(spark, "/root/testdata/sf0.001", "documents")
        .filter(F.col("doc_id") < 30)
        .select("doc_id", "text")
    )
    wc = {
        r.word: r.cnt for r in bpe.word_counts(docs).collect()
    }
    want_merges, want_words = _py_bpe(wc, 8)
    got = bpe.fit_bpe_merges(docs, n_merges=8)
    assert got == want_merges
    # applying the merges reproduces the reference segmentation
    toks = bpe.apply_bpe(docs, got).collect()
    assert len(toks) == docs.count()
    for r in toks:
        assert r.n_tokens == len(r.tokens)
    # character conservation: concatenated tokens == concatenated words
    one = sorted(toks, key=lambda r: r.doc_id)[0]
    doc_text = docs.filter(F.col("doc_id") == one.doc_id).collect()[0].text
    assert "".join(one.tokens) == doc_text.replace(" ", "")
    # the overlapping-merge edge case: "aaa" + (a,a) -> [aa, a]
    tiny = spark.createDataFrame([(1, "aaa aaa")], ["doc_id", "text"])
    m = bpe.fit_bpe_merges(tiny, n_merges=1)
    assert m == [("a", "a")]
    t = bpe.apply_bpe(tiny, m).collect()[0]
    assert sorted(t.tokens) == ["a", "a", "aa", "aa"]


def test_unigram_rarity_exact_and_oov(spark):
    """The unigram-LM scorer (CCNet-style filter, exact-integer form):
    self-reference makes OOV zero; a foreign-vocabulary doc scored
    against a reference corpus shows full OOV; the scaled frequency sum
    matches hand arithmetic."""
    from degenter_clickhouse_spark.llm import lm

    ref = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], ["doc_id", "text"]
    )  # counts: a=3, b=1, c=1, total=5
    scored = {r.doc_id: r for r in lm.unigram_rarity(ref).collect()}
    assert all(r.n_oov == 0 for r in scored.values())  # self-reference
    sc_a, sc_b = 3 * lm.SCALE // 5, 1 * lm.SCALE // 5
    assert scored[1].tf_sum_scaled == 2 * sc_a + sc_b
    assert scored[1].rarity_score == (2 * sc_a + sc_b) / 3 / lm.SCALE
    # foreign vocabulary vs the same reference: every token OOV
    alien = spark.createDataFrame([(9, "x y z z")], ["doc_id", "text"])
    out = lm.unigram_rarity(alien, ref=ref).collect()[0]
    assert out.n_lm_terms == 4 and out.n_oov == 4 and out.tf_sum_scaled == 0
    assert out.rarity_score == 0.0


def test_corpus_order_weighted_interleave(spark):
    """weights {a:2, b:1}: each cycle is a,a,b while both sources last;
    exhausted sources drop out and the tail keeps its order; positions
    are a permutation of 0..n-1."""
    from degenter_clickhouse_spark.llm.packing import corpus_order

    rows = [("a", i) for i in range(6)] + [("b", 10 + i) for i in range(2)]
    d = spark.createDataFrame(rows, ["source", "doc_id"])
    out = sorted(
        ((r.position, r.source, r.doc_id) for r in corpus_order(
            d, weights={"a": 2, "b": 1}
        ).collect())
    )
    assert [p for p, _, _ in out] == list(range(8))
    assert [s for _, s, _ in out] == ["a", "a", "b", "a", "a", "b", "a", "a"]
    assert [i for _, _, i in out] == [0, 1, 10, 2, 3, 11, 4, 5]


def test_corpus_order_no_single_partition_exchange(spark):
    """The global training position is closed-form arithmetic, never an
    unpartitioned window: the physical plan must not funnel the corpus
    through a SinglePartition exchange (WindowExec with no partitionBy
    would — the 100 TB scale-killer the closed form exists to avoid)."""
    from degenter_clickhouse_spark.llm.packing import corpus_order

    rows = [("a", i) for i in range(6)] + [("b", 10 + i) for i in range(2)]
    d = spark.createDataFrame(rows, ["source", "doc_id"])
    plan = (
        corpus_order(d, weights={"a": 2, "b": 1})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan, plan


def test_bigram_fluency_matches_sequential_reference(spark):
    """Exact-integer bigram scores equal a sequential Laplace-smoothed
    reference, and in-distribution text outscores scrambled text."""
    from collections import Counter

    from degenter_clickhouse_spark.llm.lm import SCALE, bigram_fluency

    ref_texts = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "the cat ran to the dog",
    ]
    cand = [
        (0, "the cat sat on the rug"),   # fluent under the model
        (1, "rug the on sat cat the"),   # same words, scrambled
        (2, "zz qq"),                    # unseen context
        (3, "solo"),                     # no bigrams
    ]
    ref = spark.createDataFrame([(t,) for t in ref_texts], ["text"])
    docs = spark.createDataFrame(cand, ["doc_id", "text"])
    got = {r.doc_id: r for r in bigram_fluency(docs, ref=ref).collect()}

    # sequential reference
    rp = [
        (ws[i], ws[i + 1])
        for ws in (t.split(" ") for t in ref_texts)
        for i in range(len(ws) - 1)
    ]
    c12 = Counter(rp)
    c1 = Counter(w1 for w1, _ in rp)
    vocab = {w for t in ref_texts for w in t.split(" ")}
    V = len(vocab)

    def score(text):
        ws = text.split(" ")
        out = []
        for i in range(len(ws) - 1):
            w1, w2 = ws[i], ws[i + 1]
            if (w1, w2) in c12:
                out.append((c12[(w1, w2)] + 1) * SCALE // (c1[w1] + V))
            elif w1 in c1:
                out.append(SCALE // (c1[w1] + V))
            else:
                out.append(SCALE // (2 * V))
        return out

    for d, text in cand:
        exp = score(text)
        assert got[d].n_bigrams == len(exp), d
        assert got[d].fluency_sum_scaled == sum(exp), d
    assert got[0].fluency_score > got[1].fluency_score > 0
    assert got[2].n_unseen_contexts == 1
    assert got[3].n_bigrams == 0 and got[3].fluency_score is None


def test_fluency_fused_selffit_keeps_null_text_docs(spark):
    """VERDICT r13 #9 / ADVICE r13: the fused single-explode self-fit
    must agree with the classic ref= path on corpora containing NULL
    (and empty) text — the unguarded padded explode DROPPED NULL-text
    docs (losing their sentinel row) and, for trigrams, let the NULL
    sentinel into the unigram vocabulary count, shifting every sc1
    corpus-wide."""
    from degenter_clickhouse_spark.llm.lm import bigram_fluency, trigram_fluency

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the rug"),
        (2, None),  # NULL text: must keep its sentinel row
        (3, ""),    # empty text: one '' token, no bigrams
        (4, "solo"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    for scorer in (bigram_fluency, trigram_fluency):
        self_fit = {r.doc_id: r.asDict() for r in scorer(docs).collect()}
        ref_fit = {r.doc_id: r.asDict() for r in scorer(docs, ref=docs).collect()}
        assert self_fit == ref_fit, scorer.__name__
        assert set(self_fit) == {0, 1, 2, 3, 4}, scorer.__name__


def test_trigram_ref_fit_single_pass_matches(spark):
    """fit_backoff_trigram's fused single-explode fit (r14) must score
    identically through trigram_fluency(ref=) vs a model-table fit on
    the same reference (the persisted-model path is the bit-equality
    anchor in test_clean.py; this guards the ref= entry)."""
    from degenter_clickhouse_spark.llm.lm import fit_backoff_trigram, trigram_fluency

    ref = spark.createDataFrame(
        [(0, "a b c a b d"), (1, "a b c c b a"), (2, None)], ["doc_id", "text"]
    )
    docs = spark.createDataFrame(
        [(10, "a b c"), (11, "d c b"), (12, "xx")], ["doc_id", "text"]
    )
    via_ref = {r.doc_id: r.asDict() for r in trigram_fluency(docs, ref=ref).collect()}
    via_model = {
        r.doc_id: r.asDict()
        for r in trigram_fluency(docs, model=fit_backoff_trigram(ref)).collect()
    }
    assert via_ref == via_model


def test_dsir_prefers_target_like_documents(spark):
    """DSIR semantics: documents drawn from the target distribution
    must outscore out-of-distribution documents; selection is
    deterministic top-k by (score desc, id asc) and plans as
    TakeOrderedAndProject."""
    from degenter_clickhouse_spark.llm import dsir

    target_texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox runs past the lazy dog every day",
        "a quick brown fox and a lazy dog walk through the field",
    ]
    ood_texts = [
        "zzz qqq www eee rrr ttt yyy uuu iii ooo ppp aaa",
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do",
    ]
    rows = [(i, "en", t) for i, t in enumerate(target_texts)] + [
        (100 + i, "xx", t) for i, t in enumerate(ood_texts)
    ]
    raw = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    target = raw.where(raw.lang == "en")
    scores = {r.doc_id: r.dsir_score for r in dsir.dsir_scores(raw, target).collect()}
    assert min(scores[i] for i in range(3)) > max(
        scores[100 + i] for i in range(2)
    )
    sel = dsir.dsir_select(raw, target, k=3)
    assert sorted(r.doc_id for r in sel.collect()) == [0, 1, 2]
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    # degenerate: a 1-word doc carries no features -> NULL score, kept
    one = spark.createDataFrame([(7, "en", "word")], ["doc_id", "lang", "text"])
    out = dsir.dsir_scores(raw.unionByName(one), target).where("doc_id = 7").collect()
    assert out[0].n_feats == 0 and out[0].dsir_score is None
    # target_col= (r14 single-exchange fit) must be BIT-equal to the
    # two-scan target-frame fit when target is a predicate over raw
    base = raw.unionByName(one)
    via_frame = {
        r.doc_id: (r.n_feats, r.dsir_score)
        for r in dsir.dsir_scores(base, base.where(base.lang == "en")).collect()
    }
    via_col = {
        r.doc_id: (r.n_feats, r.dsir_score)
        for r in dsir.dsir_scores(base, target_col=base.lang == "en").collect()
    }
    assert via_frame == via_col


def test_weighted_sample_biases_toward_heavy_rows(spark):
    """A-ES without replacement: sampling half the corpus by weight
    must over-represent heavy rows (sample mean weight > corpus mean),
    be deterministic across invocations, and plan as TakeOrdered."""
    from degenter_clickhouse_spark.llm.packing import weighted_sample

    rows = [(i, 1 if i % 2 else 1000) for i in range(400)]
    d = spark.createDataFrame(rows, ["doc_id", "w"])
    s1 = weighted_sample(d, "w", k=100).collect()
    s2 = weighted_sample(d, "w", k=100).collect()
    assert [r.doc_id for r in s1] == [r.doc_id for r in s2]
    assert len(s1) == 100
    heavy = sum(1 for r in s1 if r.weight == 1000)
    assert heavy >= 80, heavy  # inclusion prob ~1000x the light rows
    plan = (
        weighted_sample(d, "w", k=100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    # zero/negative weights never qualify
    dz = spark.createDataFrame([(1, 0), (2, -5), (3, 7)], ["doc_id", "w"])
    assert [r.doc_id for r in weighted_sample(dz, "w", k=10).collect()] == [3]


def test_ivf_index_append_equals_rebuild_probe(spark, tmp_path):
    """Incremental IVF maintenance: building on half the corpus then
    appending the rest must probe IDENTICALLY to an index whose cells
    were built in one shot against the same centroids (frozen-centroid
    growth model); re-appending the same shard is a no-op."""
    from degenter_clickhouse_spark.llm.similarity import (
        build_ivf_index,
        ivf_index_append,
        ivf_search,
    )

    emb = catalog.load_table(spark, SF_DIR, "embeddings")
    half = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    inc = str(tmp_path / "inc")
    build_ivf_index(half, inc, k_cells=8, iters=2)
    n = ivf_index_append(spark, rest, inc)
    assert n == rest.count()
    # replay: effectively-once
    assert ivf_index_append(spark, rest, inc) == 0
    # one-shot index with the SAME centroids (copy them over, then
    # rebuild cells from the full corpus through the append path)
    import shutil

    one = str(tmp_path / "one")
    (tmp_path / "one").mkdir()
    shutil.copytree(str(tmp_path / "inc/centroids"), one + "/centroids")
    import os

    from degenter_clickhouse_spark.llm.similarity import assign_cells, with_norm

    cents = spark.read.parquet(one + "/centroids")
    assigned = assign_cells(emb, cents, nprobe=1)
    (
        with_norm(emb)
        .join(assigned, "vec_id")
        .select(
            F.col("vec_id").alias("c_id"),
            F.col("embedding").alias("c_vec"),
            F.col("norm2_s").alias("c_n2"),
            "cell",
        )
        .write.partitionBy("cell")
        .parquet(os.path.join(one, "cells"))
    )
    q = emb.filter(F.col("vec_id") < 5)
    got = sorted(tuple(r) for r in ivf_search(spark, inc, q, k=5).collect())
    want = sorted(tuple(r) for r in ivf_search(spark, one, q, k=5).collect())
    assert got == want and len(got) > 0


def test_minhash_index_compaction_preserves_probes(spark, tmp_path):
    """Compacting a fragment-grown MinHash index must shrink file
    counts and leave probe results bit-identical."""
    from degenter_clickhouse_spark.llm.dedup import (
        build_minhash_index,
        compact_minhash_index,
        minhash_probe,
    )

    docs = catalog.load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    idx = str(tmp_path / "mh")
    # fragmented build: base index + several per-"batch" appends
    build_minhash_index(docs.filter(F.col("doc_id") % 4 == 0), idx)
    from degenter_clickhouse_spark.llm.dedup import (
        _doc_bucket,
        _minhash_bands,
        _minhash_shingles,
    )
    import os

    for m in (1, 2, 3):
        shard = docs.filter(F.col("doc_id") % 4 == m)
        sh = _minhash_shingles(shard, "doc_id", 3)
        _minhash_bands(sh).write.mode("append").partitionBy("band").parquet(
            os.path.join(idx, "bands")
        )
        sh.withColumn("__bucket", _doc_bucket("d")).write.mode("append").partitionBy(
            "__bucket"
        ).parquet(os.path.join(idx, "shingles"))
    probe_docs = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 900000).alias("doc_id"), "text"
    )
    before = sorted(tuple(r) for r in minhash_probe(spark, idx, probe_docs, 0.5).collect())
    stats = compact_minhash_index(spark, idx)
    assert stats["bands"]["files_after"] < stats["bands"]["files_before"]
    assert stats["shingles"]["files_after"] < stats["shingles"]["files_before"]
    after = sorted(tuple(r) for r in minhash_probe(spark, idx, probe_docs, 0.5).collect())
    assert before == after and len(after) >= 20  # exact clones all hit


def test_ivf_index_delete_and_compact(spark, tmp_path):
    """IVF index lifecycle parity with the text index: logical delete
    excludes vectors from probes immediately (tombstone anti-join),
    re-delete is a no-op, and compaction applies tombstones physically
    + merges small files — probes identical before and after."""
    from pyspark.sql import functions as F

    from degenter_clickhouse_spark.llm import similarity as S
    from degenter_clickhouse_spark.queries.llm import _embs

    e = _embs(spark, "/root/testdata/sf0.001")
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(e.filter(F.col("vec_id") < 400), idx, k_cells=8, iters=0)
    # incremental growth first, so compaction has small files to merge
    assert S.ivf_index_append(spark, e.filter(F.col("vec_id") >= 400), idx) > 0
    q = e.filter(F.col("vec_id") == 0)
    before = {r["c_id"] for r in S.ivf_search(spark, idx, q, k=10).collect()}
    victims = sorted(before)[:3]
    vdf = spark.createDataFrame([(v,) for v in victims], "vec_id long")
    assert S.ivf_index_delete(spark, vdf, idx) == 3
    assert S.ivf_index_delete(spark, vdf, idx) == 0  # idempotent
    after_del = {
        r["c_id"] for r in S.ivf_search(spark, idx, q, k=10).collect()
    }
    assert not (after_del & set(victims))
    rows_logical = sorted(
        tuple(r) for r in S.ivf_search(spark, idx, q, k=10).collect()
    )
    stats = S.compact_ivf_index(spark, idx)
    assert stats["files_after"] <= stats["files_before"]
    import os

    assert not os.path.exists(os.path.join(idx, "_deleted"))
    rows_physical = sorted(
        tuple(r) for r in S.ivf_search(spark, idx, q, k=10).collect()
    )
    assert rows_logical == rows_physical


def test_ivf_index_int8_quantized_layout(spark, tmp_path):
    """SQ8 cell layout: quantize=True stores int8 codes + per-vector
    scale (4x less probe I/O); ivf_search auto-detects the layout and
    its top-k recall vs the exact index stays high.

    The size claim is measured on the VECTOR COLUMN CHUNKS of an
    8x-replicated corpus: with the (cell, __idb) layout the 500-row
    sf0.001 table lands ~4 rows per file, where per-page/footer
    overhead swamps the 4x data compression — what a probe reads at
    scale is the column data, so that's what the assertion weighs."""
    from pyspark.sql import functions as F

    from degenter_clickhouse_spark.llm import similarity as S
    from degenter_clickhouse_spark.queries.llm import _embs

    e = _embs(spark, "/root/testdata/sf0.001")
    reps = [
        e.withColumn("vec_id", F.col("vec_id") + F.lit(r * 1_000_000))
        .withColumn(
            "embedding",
            F.expr(
                f"transform(embedding, (x, i) -> CAST(CASE WHEN i = 0 "
                f"THEN x + {r * 1e-3} ELSE x END AS FLOAT))"
            ),
        )
        for r in range(8)
    ]
    big = reps[0]
    for rdf in reps[1:]:
        big = big.unionByName(rdf)
    exact_idx, q_idx = str(tmp_path / "f32"), str(tmp_path / "sq8")
    S.build_ivf_index(big, exact_idx, k_cells=8, iters=0)
    S.build_ivf_index(big, q_idx, k_cells=8, iters=0, quantize=True)
    cols = spark.read.parquet(q_idx + "/cells").columns
    assert "c_vec_q" in cols and "c_scale" in cols and "c_vec" not in cols
    # recall vs exact on the ORIGINAL corpus (the replicas are
    # near-tie degenerate by construction — 8 quasi-identical copies
    # make top-5 order flip under int8 rounding, which measures the
    # synthetic tie structure, not SQ8 quality)
    exact_sm, q_sm = str(tmp_path / "f32sm"), str(tmp_path / "sq8sm")
    S.build_ivf_index(e, exact_sm, k_cells=8, iters=0)
    S.build_ivf_index(e, q_sm, k_cells=8, iters=0, quantize=True)
    qs = e.filter(F.col("vec_id") < 10)
    exact = S.ivf_search(spark, exact_sm, qs, k=5, nprobe=3)
    approx = S.ivf_search(spark, q_sm, qs, k=5, nprobe=3)
    ex = {(r["q_id"], r["c_id"]) for r in exact.collect()}
    ap = {(r["q_id"], r["c_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.8, recall
    # the quantized vector column chunks are materially smaller
    import glob
    import os

    import pyarrow.parquet as papq

    def vec_bytes(path, names):
        tot = 0
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
            md = papq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    if c.path_in_schema.split(".")[0] in names:
                        tot += c.total_compressed_size
        return tot

    fb = vec_bytes(exact_idx + "/cells", {"c_vec"})
    qb = vec_bytes(q_idx + "/cells", {"c_vec_q", "c_scale"})
    assert qb < 0.6 * fb, (qb, fb)


def test_ivf_append_preserves_quantized_layout(spark, tmp_path):
    """Appending a shard to an SQ8 index must write int8 codes, not
    float vectors — a mixed-layout cells table would fail every later
    read. Probes over the grown index keep working."""
    from pyspark.sql import functions as F

    from degenter_clickhouse_spark.llm import similarity as S
    from degenter_clickhouse_spark.queries.llm import _embs

    e = _embs(spark, "/root/testdata/sf0.001")
    idx = str(tmp_path / "sq8")
    S.build_ivf_index(e.filter(F.col("vec_id") < 300), idx, k_cells=8, iters=0,
                      quantize=True)
    assert S.ivf_index_append(spark, e.filter(F.col("vec_id") >= 300), idx) > 0
    cols = spark.read.parquet(idx + "/cells").columns
    assert "c_vec_q" in cols and "c_vec" not in cols
    hits = S.ivf_search(
        spark, idx, e.filter(F.col("vec_id") == 0), k=5, nprobe=3
    ).collect()
    assert len(hits) == 5


def test_dedup_keep_best_and_fuzzy_contamination_semantics(spark):
    """dedup_keep_best keeps the highest-priority cluster member (tie
    -> lower id); fuzzy_contamination flags a REWORDED benchmark leak
    that exact n-gram collision can miss less robustly."""
    from pyspark.sql import functions as F

    from degenter_clickhouse_spark.llm import dedup as D

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo")
    docs = spark.createDataFrame(
        [
            (1, base, len(base)),
            (2, base + " extra tail words here", len(base) + 22),  # longest
            (3, "totally unrelated content about spark engines only", 50),
        ],
        "doc_id long, text string, n_chars long",
    )
    pairs = D.minhash_lsh_pairs(docs, threshold=0.5)
    out = {r["doc_id"]: r for r in
           D.dedup_keep_best(docs, pairs, "n_chars").collect()}
    assert out[2]["keep"] and not out[1]["keep"]  # longest wins, not min id
    assert out[1]["rep_id"] == 2 and out[3]["keep"]
    # fuzzy decontamination: bench doc reworded by one word still flags
    train = docs.filter(F.col("doc_id") == 1).select(
        "doc_id", F.regexp_replace("text", "echo", "echoX").alias("text")
    )
    bench = docs.filter(F.col("doc_id") == 1).select("doc_id", "text")
    got = D.fuzzy_contamination(train, bench, threshold=0.5).collect()[0]
    assert got["contaminated"] and got["n_matches"] == 1
    assert 0.5 <= got["max_jaccard"] < 1.0
    # an unrelated train doc stays clean
    clean = D.fuzzy_contamination(
        docs.filter(F.col("doc_id") == 3).select("doc_id", "text"),
        bench,
        threshold=0.5,
    ).collect()[0]
    assert not clean["contaminated"] and clean["max_jaccard"] is None


def test_budget_mix_prefix_property(spark):
    """Each source's kept set is the maximal hash-order prefix within
    its budget; absent sources drop entirely; budgets respected."""
    from degenter_clickhouse_spark.llm.packing import budget_mix

    docs = spark.createDataFrame(
        [(i, "a" if i < 50 else "b", 100) for i in range(100)],
        "doc_id long, source string, n_tokens long",
    )
    out = budget_mix(docs, {"a": 1000})  # b absent -> dropped
    rows = out.collect()
    assert all(r["source"] == "a" for r in rows)
    assert len(rows) == 10  # 1000 / 100 tokens each
    assert max(r["cum_tokens"] for r in rows) == 1000
    import pytest

    with pytest.raises(ValueError):
        budget_mix(docs, {})


def test_ivf_append_guard_is_bucket_pruned(spark, tmp_path):
    """VERDICT r7 #1: the IVF append replay guard must prune its
    stored-id read to the NEW batch's id-hash buckets (static IN
    partition filter on __idb) — O(batch) per append, not O(index).
    Legacy cell-only indexes fall back to the full column-pruned scan
    and keep their layout on append."""
    import re
    import shutil

    from degenter_clickhouse_spark.llm.similarity import (
        _stored_ids_for,
        build_ivf_index,
        ivf_index_append,
        ivf_search,
    )

    emb = catalog.load_table(spark, SF_DIR, "embeddings")
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "idx")
    build_ivf_index(old, idx, k_cells=8, iters=1)
    cells = spark.read.parquet(f"{idx}/cells")
    assert "__idb" in cells.columns
    plan = (
        _stored_ids_for(cells, new.limit(3), "vec_id", "c_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "__idb" in m.group(1), plan[:1500]
    # append keeps the bucketed layout and stays effectively-once
    assert ivf_index_append(spark, new, idx) == new.count()
    assert ivf_index_append(spark, new, idx) == 0
    assert "__idb" in spark.read.parquet(f"{idx}/cells").columns

    # legacy layout (pre-__idb cells): strip the bucket column,
    # append must fall back and preserve the cell-only layout
    legacy = str(tmp_path / "legacy")
    (tmp_path / "legacy").mkdir()
    shutil.copytree(f"{idx}/centroids", f"{legacy}/centroids")
    spark.read.parquet(f"{idx}/cells").filter(
        F.col("c_id") % 2 == 0
    ).drop("__idb").write.partitionBy("cell").parquet(f"{legacy}/cells")
    n_new = ivf_index_append(spark, new.limit(5), legacy)
    assert 0 < n_new <= 5
    assert "__idb" not in spark.read.parquet(f"{legacy}/cells").columns
    assert ivf_search(spark, legacy, new.limit(2), k=3).count() == 6


def test_apply_bpe_token_order_is_partition_invariant(spark):
    """VERDICT r7 #2: document token order must be contractual —
    identical under any upstream partitioning (AQE skew splits, a
    repartition before tokenization), not an accident of rows arriving
    in document order. Byte-equal token arrays across perturbations,
    and tokens always concatenate back to the document."""
    from degenter_clickhouse_spark.llm import bpe

    docs = (
        catalog.load_table(spark, "/root/testdata/sf0.001", "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "text")
    )
    merges = bpe.fit_bpe_merges(docs, n_merges=6)
    want = {
        r.doc_id: list(r.tokens)
        for r in bpe.apply_bpe(docs.coalesce(1), merges).collect()
    }
    texts = {r.doc_id: r.text for r in docs.collect()}
    for perturbed in (
        docs.repartition(16),
        docs.repartition(7, F.col("text")),
        docs.orderBy(F.col("doc_id").desc()).repartition(3),
    ):
        got = {
            r.doc_id: list(r.tokens)
            for r in bpe.apply_bpe(perturbed, merges).collect()
        }
        assert got == want
    for d, toks in want.items():
        assert "".join(toks) == texts[d].replace(" ", "")
