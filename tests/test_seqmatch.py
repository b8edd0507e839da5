"""Event-sequence pattern matching (operators/seqmatch.py):
ClickHouse sequenceCount/sequenceMatch greedy-automaton semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from degenter_clickhouse_spark.operators.seqmatch import (
    sequence_count,
    sequence_match,
)


def _ev(spark, rows):
    # (user, event_id, ts, type)
    return spark.createDataFrame(rows, ["u", "eid", "t", "typ"])


def _steps(*types):
    return [F.col("typ") == t for t in types]


def _counts(df):
    return {r["u"]: r["n_matches"] for r in df.collect()}


def test_non_overlapping_greedy_count(spark):
    # a b a b  -> two (a,b) chains; a a b -> one (greedy: second a is
    # ignored while stage already armed past it)
    rows = [
        (1, 1, 10, "a"), (1, 2, 20, "b"), (1, 3, 30, "a"), (1, 4, 40, "b"),
        (2, 5, 10, "a"), (2, 6, 20, "a"), (2, 7, 30, "b"),
    ]
    out = sequence_count(_ev(spark, rows), "u", "t", _steps("a", "b"), tiebreak="eid")
    assert _counts(out) == {1: 2, 2: 1}


def test_interleaved_noise_ignored(spark):
    rows = [
        (1, 1, 10, "a"), (1, 2, 15, "x"), (1, 3, 20, "b"),
        (1, 4, 25, "y"), (1, 5, 30, "c"),
    ]
    out = sequence_count(_ev(spark, rows), "u", "t", _steps("a", "b", "c"), tiebreak="eid")
    assert _counts(out) == {1: 1}


def test_order_matters(spark):
    # b before a: never completes
    rows = [(1, 1, 10, "b"), (1, 2, 20, "a")]
    out = sequence_count(_ev(spark, rows), "u", "t", _steps("a", "b"), tiebreak="eid")
    assert _counts(out) == {1: 0}


def test_chains_do_not_overlap(spark):
    # a b b: the second b cannot reuse the consumed a
    rows = [(1, 1, 10, "a"), (1, 2, 20, "b"), (1, 3, 30, "b")]
    out = sequence_count(_ev(spark, rows), "u", "t", _steps("a", "b"), tiebreak="eid")
    assert _counts(out) == {1: 1}


def test_tiebreak_resolves_equal_timestamps(spark):
    # same ts: eid order decides -> (a@1, b@2) completes
    rows = [(1, 1, 10, "a"), (1, 2, 10, "b")]
    out = sequence_count(_ev(spark, rows), "u", "t", _steps("a", "b"), tiebreak="eid")
    assert _counts(out) == {1: 1}
    # reversed eids: b sorts first, no chain
    rows2 = [(1, 2, 10, "a"), (1, 1, 10, "b")]
    out2 = sequence_count(_ev(spark, rows2), "u", "t", _steps("a", "b"), tiebreak="eid")
    assert _counts(out2) == {1: 0}


def test_event_matching_multiple_steps_counts_for_current_stage(spark):
    # 'ab' satisfies both steps; two such rows complete one chain
    rows = [(1, 1, 10, "ab"), (1, 2, 20, "ab")]
    steps = [F.col("typ").contains("a"), F.col("typ").contains("b")]
    out = sequence_count(_ev(spark, rows), "u", "t", steps, tiebreak="eid")
    assert _counts(out) == {1: 1}


def test_sequence_match_threshold_and_n_events(spark):
    rows = [
        (1, 1, 10, "a"), (1, 2, 20, "b"),
        (2, 3, 10, "b"), (2, 4, 20, "x"),
    ]
    out = sequence_match(_ev(spark, rows), "u", "t", _steps("a", "b"), tiebreak="eid")
    got = {r["u"]: (r["matched"], r["n_events"]) for r in out.collect()}
    assert got == {1: (True, 2), 2: (False, 2)}


def test_single_step_pattern_counts_every_hit(spark):
    rows = [(1, i, i * 10, "a" if i % 2 else "x") for i in range(1, 7)]
    out = sequence_count(_ev(spark, rows), "u", "t", _steps("a"), tiebreak="eid")
    assert _counts(out) == {1: 3}


def test_empty_steps_rejected(spark):
    import pytest

    with pytest.raises(ValueError):
        sequence_count(_ev(spark, [(1, 1, 10, "a")]), "u", "t", [])
