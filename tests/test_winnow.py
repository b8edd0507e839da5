"""Winnowing fingerprints (llm/winnow.py): the guarantee (any shared
word run of >= k+w-1 contributes a common fingerprint), density,
short-doc degradation, stop-fingerprint capping, score exactness."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from degenter_clickhouse_spark.llm.winnow import (
    DEFAULT_K,
    DEFAULT_W,
    winnow_fingerprints,
    winnow_overlap_pairs,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def _words(rng, n):
    return " ".join(f"w{rng.randint(0, 500)}" for _ in range(n))


def test_winnowing_guarantee_shared_run_yields_common_fp(spark):
    """Schleimer et al. Theorem: a shared substring of at least
    k + w - 1 tokens always contributes >= 1 common fingerprint —
    for ANY surrounding context. Randomized: plant an 8-word run
    (k=4, w=5 -> threshold 8) inside two otherwise-unrelated docs."""
    rng = random.Random(11)
    shared_run = _words(rng, DEFAULT_K + DEFAULT_W - 1)
    texts = []
    for i in range(10):
        texts.append(f"{_words(rng, 30)} {shared_run} {_words(rng, 30)}")
    fps = winnow_fingerprints(_docs(spark, texts))
    by_doc = {
        r.doc_id: set(r.fps)
        for r in fps.groupBy("doc_id").agg(F.collect_set("fp").alias("fps")).collect()
    }
    common = set.intersection(*by_doc.values())
    assert common, "planted shared run produced no common fingerprint"


def test_density_and_short_doc_degradation(spark):
    rng = random.Random(3)
    long_doc = _words(rng, 200)
    short_doc = _words(rng, DEFAULT_K + 1)  # k-grams exist, no full window
    tiny_doc = "a b c"  # < k words -> no fingerprints
    fps = winnow_fingerprints(_docs(spark, [long_doc, short_doc, tiny_doc]))
    counts = {r.doc_id: r.n for r in fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_kgrams = 200 - DEFAULT_K + 1
    # winnowing keeps far fewer than all k-grams (expected ~2/(w+1))
    assert counts[0] < 0.6 * n_kgrams
    # short doc: every (distinct) k-gram hash kept
    assert counts[1] == 2  # k+1 words -> 2 k-grams
    assert 2 not in counts  # tiny doc fingerprints to nothing


def test_overlap_pairs_discriminate(spark):
    rng = random.Random(7)
    base = _words(rng, 120)
    near = base.replace("w", "w", 1)  # identical copy
    mutated = " ".join(
        (f"x{i}" if i % 9 == 0 else t) for i, t in enumerate(base.split())
    )
    other = _words(rng, 120)
    pairs = {
        (r.d1, r.d2): r.overlap_1e9
        for r in winnow_overlap_pairs(
            _docs(spark, [base, near, mutated, other]), min_shared=1
        ).collect()
    }
    assert pairs[(0, 1)] == 1_000_000_000  # identical docs: full overlap
    assert pairs.get((0, 2), 0) > 100_000_000  # mutated copy: strong signal
    assert pairs.get((0, 3), 0) < pairs[(0, 1)]  # unrelated: weaker/no pair


def test_stop_fingerprint_cap_bounds_pairs(spark):
    """A fingerprint shared by every doc (boilerplate) must be dropped
    before the pair join: with the cap below the corpus size, the
    boilerplate-only pairs disappear."""
    rng = random.Random(5)
    boiler = _words(rng, DEFAULT_K + DEFAULT_W - 1)
    texts = [f"{_words(rng, 40)} {boiler}" for _ in range(12)]
    docs = _docs(spark, texts)
    capped = winnow_overlap_pairs(docs, min_shared=1, max_fp_freq=4)
    uncapped = winnow_overlap_pairs(docs, min_shared=1, max_fp_freq=1000)
    assert uncapped.count() >= 66  # all 12*11/2 pairs share the boiler run
    assert capped.count() < 20  # boilerplate excluded; only chance overlaps


def test_score_is_exact_integer_arithmetic(spark):
    rng = random.Random(13)
    base = _words(rng, 60)
    pairs = winnow_overlap_pairs(_docs(spark, [base, base]), min_shared=1).collect()
    assert len(pairs) == 1
    r = pairs[0]
    assert r.shared == r.min_fps
    assert r.overlap_1e9 == (r.shared * 1_000_000_000) // r.min_fps


def test_winnow_plan_is_scale_shaped(spark):
    """Fingerprint selection is map-only; the pair stage equi-joins on
    the fingerprint value — never a cartesian product, no global
    window/sort funnel."""
    rng = random.Random(2)
    docs = _docs(spark, [_words(rng, 50) for _ in range(30)])
    plan = (
        winnow_overlap_pairs(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SinglePartition" not in plan


# ---------------------------------------------------------------------------
# Persisted index lifecycle (VERDICT r8 #8)
# ---------------------------------------------------------------------------


def _corpus_and_shard(spark):
    rng = random.Random(77)
    base = [_words(rng, 60) for _ in range(20)]
    # shard doc 100 copies a run from corpus doc 3; 101 is fresh text
    shard_texts = [base[3].split(" ", 5)[-1], _words(rng, 50)]
    corpus = _docs(spark, base)
    shard = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(shard_texts)],
        "doc_id long, text string",
    )
    return corpus, shard


def test_winnow_index_probe_matches_inline_pairs(spark, tmp_path):
    """Build/probe parity: probing a shard against the persisted index
    returns EXACTLY the inline winnow_overlap_pairs rows of
    (corpus ∪ shard) that touch the shard."""
    from degenter_clickhouse_spark.llm.winnow import (
        build_winnow_index,
        winnow_index_probe,
    )

    corpus, shard = _corpus_and_shard(spark)
    idx = str(tmp_path / "widx")
    build_winnow_index(corpus, idx)
    got = {
        (r.d1, r.d2): (r.shared, r.min_fps, r.overlap_1e9)
        for r in winnow_index_probe(spark, idx, shard, min_shared=1).collect()
    }
    shard_ids = {r.doc_id for r in shard.select("doc_id").collect()}
    want = {
        (r.d1, r.d2): (r.shared, r.min_fps, r.overlap_1e9)
        for r in winnow_overlap_pairs(
            corpus.unionByName(shard), min_shared=1
        ).collect()
        if r.d1 in shard_ids or r.d2 in shard_ids
    }
    assert want, "fixture must produce at least one overlapping pair"
    assert got == want


def test_winnow_index_append_effectively_once_and_parity(spark, tmp_path):
    """Appending a shard indexes exactly its docs once (replay = 0);
    after the append, probing a LATER shard against the grown index
    equals the inline computation over the grown corpus."""
    from degenter_clickhouse_spark.llm.winnow import (
        build_winnow_index,
        winnow_index_append,
        winnow_index_probe,
    )

    corpus, shard = _corpus_and_shard(spark)
    idx = str(tmp_path / "widx")
    build_winnow_index(corpus, idx)
    assert winnow_index_append(spark, shard, idx) == 2
    assert winnow_index_append(spark, shard, idx) == 0  # replay no-op
    rng = random.Random(9)
    later = spark.createDataFrame(
        [(200, " ".join([_words(rng, 10), shard.collect()[0].text]))],
        "doc_id long, text string",
    )
    got = {
        (r.d1, r.d2): (r.shared, r.min_fps, r.overlap_1e9)
        for r in winnow_index_probe(spark, idx, later, min_shared=1).collect()
    }
    want = {
        (r.d1, r.d2): (r.shared, r.min_fps, r.overlap_1e9)
        for r in winnow_overlap_pairs(
            corpus.unionByName(shard).unionByName(later), min_shared=1
        ).collect()
        if r.d1 == 200 or r.d2 == 200
    }
    assert want
    assert got == want


def test_winnow_append_guard_read_is_bucket_pruned(spark, tmp_path):
    """O(batch) replay guard (the r8 __idb discipline): the stored-id
    read prunes to the batch's id-hash buckets via a static IN
    partition filter — planning never touches the other buckets."""
    import re

    from degenter_clickhouse_spark.llm.winnow import (
        _stored_winnow_ids_for,
        build_winnow_index,
    )

    corpus, shard = _corpus_and_shard(spark)
    idx = str(tmp_path / "widx")
    build_winnow_index(corpus, idx)
    sizes = spark.read.parquet(f"{idx}/sizes")
    plan = (
        _stored_winnow_ids_for(sizes, shard.limit(1), "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "__idb" in m.group(1), plan[:1500]


def test_winnow_probe_fps_read_is_fpb_pruned(spark, tmp_path):
    """The probe's index read prunes on the fingerprint-bucket
    partition column — probing a tiny shard plans a static __fpb IN
    filter, never a full-index scan."""
    import re

    from degenter_clickhouse_spark.llm import winnow as W

    corpus, shard = _corpus_and_shard(spark)
    idx = str(tmp_path / "widx")
    W.build_winnow_index(corpus, idx)
    q_fps = W.winnow_fingerprints(shard.limit(1))
    buckets = [
        r.b for r in q_fps.select(W._fp_bucket("fp").alias("b")).distinct().collect()
    ]
    stored = spark.read.parquet(f"{idx}/fps").where(F.col("__fpb").isin(buckets))
    plan = stored._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "__fpb" in m.group(1), plan[:1500]


def test_winnow_compact_preserves_probe_state(spark, tmp_path):
    from degenter_clickhouse_spark.llm.winnow import (
        build_winnow_index,
        compact_winnow_index,
        winnow_index_append,
        winnow_index_probe,
    )

    corpus, shard = _corpus_and_shard(spark)
    idx = str(tmp_path / "widx")
    build_winnow_index(corpus, idx)
    winnow_index_append(spark, shard, idx)
    rng = random.Random(5)
    probe = spark.createDataFrame(
        [(300, shard.collect()[0].text + " " + _words(rng, 5))],
        "doc_id long, text string",
    )
    before = sorted(
        tuple(r) for r in winnow_index_probe(spark, idx, probe, min_shared=1).collect()
    )
    stats = compact_winnow_index(spark, idx)
    assert stats["fps"]["files_after"] <= stats["fps"]["files_before"]
    after = sorted(
        tuple(r) for r in winnow_index_probe(spark, idx, probe, min_shared=1).collect()
    )
    assert before == after
