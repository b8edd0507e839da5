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


# ---------------------------------------------------------------------------
# within (time-gated chains)
# ---------------------------------------------------------------------------


def test_within_blocks_slow_chains(spark):
    rows = [(1, 1, 0, "a"), (1, 2, 100, "b"),  # too slow: 100 > 50
            (2, 3, 0, "a"), (2, 4, 40, "b")]   # fast enough
    out = sequence_count(_ev(spark, rows), "u", "t", _steps("a", "b"),
                         tiebreak="eid", within=50.0)
    assert _counts(out) == {1: 0, 2: 1}


def test_within_expired_chain_restarts_on_step_one(spark):
    # a@0 arms; b@100 expired (chain dead); a@110 restarts; b@120 completes
    rows = [(1, 1, 0, "a"), (1, 2, 100, "b"), (1, 3, 110, "a"),
            (1, 4, 120, "b")]
    out = sequence_count(_ev(spark, rows), "u", "t", _steps("a", "b"),
                         tiebreak="eid", within=50.0)
    assert _counts(out) == {1: 1}


def test_within_dead_chain_not_revived_by_later_steps(spark):
    # a@0 arms, expires; b@100 and b@200 cannot revive it (only an 'a'
    # restarts); count stays 0
    rows = [(1, 1, 0, "a"), (1, 2, 100, "b"), (1, 3, 200, "b")]
    out = sequence_count(_ev(spark, rows), "u", "t", _steps("a", "b"),
                         tiebreak="eid", within=50.0)
    assert _counts(out) == {1: 0}


def test_within_window_measured_from_first_step(spark):
    # 3-step chain: a@0 b@30 c@60 with W=50 -> c is 60s after the
    # FIRST step, expired, even though only 30s after b
    rows = [(1, 1, 0, "a"), (1, 2, 30, "b"), (1, 3, 60, "c")]
    out = sequence_count(_ev(spark, rows), "u", "t", _steps("a", "b", "c"),
                         tiebreak="eid", within=50.0)
    assert _counts(out) == {1: 0}
    # W=70 admits it
    out2 = sequence_count(_ev(spark, rows), "u", "t", _steps("a", "b", "c"),
                          tiebreak="eid", within=70.0)
    assert _counts(out2) == {1: 1}


def test_within_single_step_ignores_window(spark):
    rows = [(1, 1, 0, "a"), (1, 2, 1000, "a")]
    out = sequence_count(_ev(spark, rows), "u", "t", _steps("a"),
                         tiebreak="eid", within=1.0)
    assert _counts(out) == {1: 2}


def test_within_none_unchanged(spark):
    rows = [(1, 1, 0, "a"), (1, 2, 10_000, "b")]
    out = sequence_count(_ev(spark, rows), "u", "t", _steps("a", "b"),
                         tiebreak="eid")
    assert _counts(out) == {1: 1}


# ---------------------------------------------------------------------------
# strict_order (windowFunnel('strict_order') parity)
# ---------------------------------------------------------------------------


def test_strict_order_interrupted_by_unrelated_event(spark):
    # a x b: the x interrupts the armed chain
    rows = [(1, 1, 10, "a"), (1, 2, 20, "x"), (1, 3, 30, "b")]
    loose = sequence_count(_ev(spark, rows), "u", "t", _steps("a", "b"),
                           tiebreak="eid")
    strict = sequence_count(_ev(spark, rows), "u", "t", _steps("a", "b"),
                            tiebreak="eid", strict_order=True)
    assert _counts(loose) == {1: 1}
    assert _counts(strict) == {1: 0}


def test_strict_order_contiguous_chain_counts(spark):
    rows = [(1, 1, 10, "a"), (1, 2, 20, "b"), (1, 3, 30, "a"),
            (1, 4, 40, "b")]
    strict = sequence_count(_ev(spark, rows), "u", "t", _steps("a", "b"),
                            tiebreak="eid", strict_order=True)
    assert _counts(strict) == {1: 2}


def test_strict_order_interrupting_step_one_restarts(spark):
    # a(armed) a(interrupts=restarts) b -> one chain from the SECOND a
    rows = [(1, 1, 10, "a"), (1, 2, 20, "a"), (1, 3, 30, "b")]
    strict = sequence_count(_ev(spark, rows), "u", "t", _steps("a", "b"),
                            tiebreak="eid", strict_order=True)
    assert _counts(strict) == {1: 1}
    # a x a b -> x kills chain 1, second a re-arms, b completes
    rows2 = [(1, 1, 10, "a"), (1, 2, 20, "x"), (1, 3, 30, "a"),
             (1, 4, 40, "b")]
    strict2 = sequence_count(_ev(spark, rows2), "u", "t", _steps("a", "b"),
                             tiebreak="eid", strict_order=True)
    assert _counts(strict2) == {1: 1}


def test_strict_order_with_within_composes(spark):
    # contiguous but too slow -> 0; contiguous and fast -> 1
    rows = [(1, 1, 0, "a"), (1, 2, 100, "b"),
            (2, 3, 0, "a"), (2, 4, 10, "b")]
    out = sequence_count(_ev(spark, rows), "u", "t", _steps("a", "b"),
                         tiebreak="eid", within=50.0, strict_order=True)
    assert _counts(out) == {1: 0, 2: 1}
    # expired + interrupted: a ... (expiry) x a b -> second a arms, completes
    rows2 = [(1, 1, 0, "a"), (1, 2, 100, "x"), (1, 3, 110, "a"),
             (1, 4, 120, "b")]
    out2 = sequence_count(_ev(spark, rows2), "u", "t", _steps("a", "b"),
                          tiebreak="eid", within=50.0, strict_order=True)
    assert _counts(out2) == {1: 1}


def test_sequence_next_node_semantics(spark):
    """first_match forward semantics: consecutive chain required, the
    FIRST match wins, tail matches (nothing follows) and non-matching
    keys are absent."""
    from degenter_clickhouse_spark.operators.seqmatch import (
        sequence_next_node,
    )

    rows = [
        # u1: view,click,buy ... view,click,err -> first next = buy
        (1, 1, "view"), (1, 2, "click"), (1, 3, "buy"),
        (1, 4, "view"), (1, 5, "click"), (1, 6, "err"),
        # u2: view,X,click (not consecutive) -> absent
        (2, 1, "view"), (2, 2, "noise"), (2, 3, "click"), (2, 4, "buy"),
        # u3: chain at tail, nothing follows -> absent
        (3, 1, "view"), (3, 2, "click"),
        # u4: no chain at all -> absent
        (4, 1, "buy"), (4, 2, "err"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, etype string")
    got = dict(
        sequence_next_node(
            df, key="user_id", ts="ts", node="etype",
            steps=[F.col("etype") == "view", F.col("etype") == "click"],
        ).collect()
    )
    assert got == {1: "buy"}


def test_sequence_next_node_single_step(spark):
    from degenter_clickhouse_spark.operators.seqmatch import (
        sequence_next_node,
    )

    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c")]
    df = spark.createDataFrame(rows, "user_id long, ts long, etype string")
    got = dict(
        sequence_next_node(
            df, key="user_id", ts="ts", node="etype",
            steps=[F.col("etype") == "a"],
        ).collect()
    )
    assert got == {1: "b"}
