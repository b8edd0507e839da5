"""Sorted-neighborhood fuzzy matching (llm/dedup.snm_pairs)."""

from __future__ import annotations

from degenter_clickhouse_spark.llm import dedup


def _naive(rows, window, max_dist):
    import difflib  # noqa: F401 — not used; naive levenshtein below

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    srt = sorted(rows, key=lambda r: (r[1], r[0]))
    out = set()
    for i, (ida, ka) in enumerate(srt):
        for j in range(i + 1, min(i + 1 + window, len(srt))):
            idb, kb = srt[j]
            d = lev(ka, kb)
            if d <= max_dist:
                out.add((ida, idb, d))
    return out


def test_snm_matches_naive_and_crosses_partition_boundaries(spark):
    rows = [(i, f"name{i:04d}") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, key string")
    # partitions=8 on 200 rows: ~24 boundary crossings that per-
    # partition-only neighbor scans would MISS — the rank equi-join
    # must find them all
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in dedup.snm_pairs(
            df, "key", "id", window=3, max_dist=2, partitions=8
        ).collect()
    }
    assert got == _naive(rows, 3, 2)
    assert got  # non-degenerate


def test_snm_shuffle_partition_invariant(spark):
    rows = [(i, f"user-{i % 37:03d}-{i:05d}") for i in range(150)]
    df = spark.createDataFrame(rows, "id long, key string")
    base = {
        tuple(r)
        for r in dedup.snm_pairs(df, "key", "id", partitions=5).collect()
    }
    default = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        alt = {
            tuple(r)
            for r in dedup.snm_pairs(df, "key", "id", partitions=11).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", default)
    assert base == alt


def test_snm_no_single_partition_global_window(spark):
    """The global rank must come from range partitions + offsets, not
    a global Window (which funnels the table through one task)."""
    rows = [(i, f"k{i}") for i in range(50)]
    df = spark.createDataFrame(rows, "id long, key string")
    pairs = dedup.snm_pairs(df, "key", "id", partitions=4)
    plan = pairs._sc._jvm.PythonSQLUtils.explainString(
        pairs._jdf.queryExecution(), "formatted"
    )
    # a global window shows as 'Window' with no partition spec; ours
    # partitions by pid — assert no partition-less Window operator
    import re

    for m in re.finditer(r"partition(?:By| specification)?: \[\]", plan):
        raise AssertionError(f"global window in plan: {m.group(0)}")


def test_snm_window_monotone(spark):
    """A larger window strictly widens the candidate set: pairs(w=2)
    is a subset of pairs(w=4) at the same cutoff."""
    rows = [(i, f"item-{(i * 13) % 50:04d}") for i in range(120)]
    df = spark.createDataFrame(rows, "id long, key string")
    p2 = {
        (r["id_a"], r["id_b"])
        for r in dedup.snm_pairs(df, "key", "id", window=2, max_dist=3).collect()
    }
    p4 = {
        (r["id_a"], r["id_b"])
        for r in dedup.snm_pairs(df, "key", "id", window=4, max_dist=3).collect()
    }
    assert p2 <= p4
    assert len(p4) > len(p2)


def test_snm_degenerate_inputs(spark):
    """Empty input and window >= n both behave: no pairs / all sorted
    pairs inside the cutoff, no errors."""
    empty = spark.createDataFrame([], "id long, key string")
    assert dedup.snm_pairs(empty, "key", "id").count() == 0
    tiny = spark.createDataFrame(
        [(1, "aa"), (2, "ab"), (3, "zz")], "id long, key string"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.snm_pairs(
            tiny, "key", "id", window=10, max_dist=1
        ).collect()
    }
    # aa~ab (dist 1) pair only; zz is 2 edits from both
    assert got == {(1, 2)}


def test_kfold_no_pair_straddles_folds(spark):
    """Every near-dup pair shares a fold, and all k folds are
    non-empty on a spread id range."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(i, i + 100) for i in range(0, 100, 7)], "d1 long, d2 long"
    )
    out = dedup.kfold_split(docs, pairs, k=5)
    folds = {r["doc_id"]: r["fold"] for r in out.collect()}
    for i in range(0, 100, 7):
        assert folds[i] == folds[i + 100]
    assert set(folds.values()) == {0, 1, 2, 3, 4}
    import pytest

    with pytest.raises(ValueError):
        dedup.kfold_split(docs, pairs, k=1)
