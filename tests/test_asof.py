"""operators/asof.py semantics beyond the DuckDB-oracle checks in
test_oracle_queries.py (backward direction + bucketized range join):
forward direction, tolerance nulling, the duplicate-right tie rule,
and bucket-width invariance of range_join."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from degenter_clickhouse_spark.operators.asof import asof_join, range_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 15, "c"), (3, 5, "d")],
        "k long, t long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 8, 200.0), (1, 18, 300.0), (2, 15, 400.0), (2, 30, 500.0)],
        "k long, t long, v double",
    )
    return left, right


def _rows(df):
    return {r["tag"]: (r["v"], r["t_r"]) for r in df.collect()}


def test_backward_matches_and_tie_rule(spark, frames):
    left, right = frames
    out = _rows(asof_join(left, right, on="t", by=["k"]))
    # duplicate right rows at (1, 8): greatest payload struct wins
    assert out["a"] == (200.0, 8)
    assert out["b"] == (300.0, 18)
    # equal timestamps match (<=)
    assert out["c"] == (400.0, 15)
    # no earlier right row -> nulls, left row preserved
    assert out["d"] == (None, None)


def test_forward_direction(spark, frames):
    left, right = frames
    out = _rows(asof_join(left, right, on="t", by=["k"], direction="forward"))
    assert out["a"] == (300.0, 18)  # smallest t_r >= 10
    assert out["b"] == (None, None)  # nothing at or after 20 for k=1
    assert out["c"] == (400.0, 15)  # equal ts matches forward too
    assert out["d"] == (None, None)  # k=3 has no right rows


def test_tolerance_nulls_far_matches(spark, frames):
    left, right = frames
    out = _rows(asof_join(left, right, on="t", by=["k"], tolerance=2.0))
    assert out["a"] == (200.0, 8)  # gap 2 <= 2
    assert out["b"] == (300.0, 18)  # gap 2
    assert out["c"] == (400.0, 15)  # gap 0
    assert out["d"] == (None, None)
    none_left = _rows(asof_join(left, right, on="t", by=["k"], tolerance=1.0))
    assert none_left["a"] == (None, None)  # gap 2 > 1


def test_asof_join_is_single_shuffle(spark, frames):
    """The whole operator costs exactly one Exchange (the keyed
    window's) — no pre-dedup aggregation, no join."""
    left, right = frames
    plan = (
        asof_join(left, right, on="t", by=["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_bucket_width_invariance(spark):
    left = spark.createDataFrame(
        [(1, 0.0, 10.0, "i1"), (1, 5.0, 6.0, "i2"), (2, 100.0, 200.0, "i3")],
        "k long, s double, e double, tag string",
    )
    right = spark.createDataFrame(
        [(1, 0.0), (1, 5.5), (1, 9.999), (1, 10.0), (2, 150.0), (2, 99.9)],
        "k long, p double",
    )

    def pairs(width):
        got = range_join(left, right, start="s", end="e", point="p", by=["k"],
                         bucket_width=width)
        return sorted((r["tag"], r["p"]) for r in got.collect())

    expect = [("i1", 0.0), ("i1", 5.5), ("i1", 9.999), ("i2", 5.5), ("i3", 150.0)]
    for width in (1.0, 3.0, 10.0, 1000.0):
        assert pairs(width) == expect, width
    # end-exclusive: p=10.0 not in [0, 10); start-inclusive: p=0.0 in
    # (asserted by expect above)


_row = st.tuples(
    st.integers(min_value=1, max_value=3),  # key
    st.integers(min_value=0, max_value=40),  # time
    st.integers(min_value=0, max_value=9),  # payload
)

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _brute_asof(lrows, rrows, direction):
    out = {}
    for i, (k, t, _) in enumerate(lrows):
        if direction == "backward":
            cand = [(rt, v) for rk, rt, v in rrows if rk == k and rt <= t]
            best = max(cand) if cand else None
        else:
            cand = [(-rt, v) for rk, rt, v in rrows if rk == k and rt >= t]
            best = max(cand) if cand else None
            best = (-best[0], best[1]) if best else None
        out[i] = best
    return out


@given(
    lrows=st.lists(_row, min_size=1, max_size=25),
    rrows=st.lists(_row, min_size=0, max_size=25),
    direction=st.sampled_from(["backward", "forward"]),
)
@_settings
def test_asof_join_matches_bruteforce(spark, lrows, rrows, direction):
    """Random small inputs (duplicate keys/times included) against a
    sequential reference: the nearest-time rule, the <=/>= equality
    edges, and the greatest-payload tie rule all must agree."""
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t, _) in enumerate(lrows)], "i long, k long, t long"
    )
    right = spark.createDataFrame(rrows, "k long, t long, v long")
    got = {
        r["i"]: (None if r["t_r"] is None else (r["t_r"], r["v"]))
        for r in asof_join(left, right, on="t", by=["k"], direction=direction).collect()
    }
    assert got == _brute_asof(lrows, rrows, direction)


# ---------------------------------------------------------------------------
# interval_join (interval-interval overlap, exactly-once bucket
# attribution)
# ---------------------------------------------------------------------------


def _iv(spark, rows, cols=("k", "id", "s", "e")):
    return spark.createDataFrame(rows, list(cols))


def _pairs(df, a="id", b="id_r"):
    return sorted((r[a], r[b]) for r in df.collect())


def test_interval_join_basic_overlap_and_touching_excluded(spark):
    from degenter_clickhouse_spark.operators.asof import interval_join

    left = _iv(spark, [(1, 10, 0.0, 100.0), (1, 11, 200.0, 300.0)])
    right = _iv(spark, [(1, 20, 50.0, 150.0), (1, 21, 100.0, 200.0),
                        (1, 22, 300.0, 400.0)])
    out = interval_join(left, right, ("s", "e"), ("s", "e"), by=["k"],
                        bucket_width=60.0)
    # [0,100) x [50,150) overlap; [0,100) x [100,200) touch -> excluded
    # (half-open); [200,300) x [300,400) touch -> excluded
    assert _pairs(out) == [(10, 20)]


def test_interval_join_exactly_once_across_many_buckets(spark):
    from degenter_clickhouse_spark.operators.asof import interval_join

    # both intervals span many tiny buckets; the pair must appear once
    left = _iv(spark, [(1, 1, 0.0, 1000.0)])
    right = _iv(spark, [(1, 2, 500.0, 900.0)])
    out = interval_join(left, right, ("s", "e"), ("s", "e"), by=["k"],
                        bucket_width=10.0)
    assert _pairs(out) == [(1, 2)]


def test_interval_join_bucket_width_invariance(spark):
    from degenter_clickhouse_spark.operators.asof import interval_join

    import random

    rng = random.Random(7)
    rows = [(rng.randint(1, 3), i, float(s := rng.randint(0, 500)),
             float(s + rng.randint(1, 120))) for i in range(40)]
    left = _iv(spark, rows)
    right = _iv(spark, [(k, i + 1000, s, e) for k, i, s, e in rows])
    base = None
    for w in (7.0, 60.0, 1000.0):
        got = _pairs(interval_join(left, right, ("s", "e"), ("s", "e"),
                                   by=["k"], bucket_width=w))
        if base is None:
            base = got
        assert got == base
    # cross-check vs naive
    naive = sorted(
        (a[1], b[1] + 1000)
        for a in rows for b in rows
        if a[0] == b[0] and a[2] < b[3] and b[2] < a[3]
    )
    assert base == naive


def test_interval_join_empty_intervals_match_nothing(spark):
    from degenter_clickhouse_spark.operators.asof import interval_join

    left = _iv(spark, [(1, 1, 100.0, 100.0)])   # empty [s, s)
    right = _iv(spark, [(1, 2, 0.0, 1000.0)])
    out = interval_join(left, right, ("s", "e"), ("s", "e"), by=["k"])
    assert out.count() == 0


def test_interval_join_self_join_suffix(spark):
    from degenter_clickhouse_spark.operators.asof import interval_join

    df = _iv(spark, [(1, 1, 0.0, 10.0), (1, 2, 5.0, 15.0)])
    out = interval_join(df, df, ("s", "e"), ("s", "e"), by=["k"])
    assert {"id", "id_r", "s", "s_r", "e", "e_r"} <= set(out.columns)
    got = sorted((r["id"], r["id_r"]) for r in out.collect())
    # both directions + self-overlaps (caller filters id < id_r)
    assert got == [(1, 1), (1, 2), (2, 1), (2, 2)]


def test_snapshot_diff_null_transitions(spark):
    """NULL-safe comparison: value->NULL and NULL->value are changes;
    NULL==NULL is unchanged; added/removed classified by side."""
    from degenter_clickhouse_spark.operators.diff import snapshot_diff

    left = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, "d")], "k long, v string"
    )
    right = spark.createDataFrame(
        [(1, None), (2, None), (3, "c2"), (5, "e")], "k long, v string"
    )
    got = {r.k: r.status for r in snapshot_diff(left, right, ["k"]).collect()}
    assert got == {1: "changed", 3: "changed", 4: "removed", 5: "added"}
    # key 2 (NULL == NULL) is unchanged -> absent
    assert 2 not in got


def test_interval_join_epoch_magnitude_boundaries(spark):
    """ADVICE r7: half-open bucket attribution must hold at epoch
    magnitudes, where a float 1e-9 epsilon is below the double ulp
    (~2.4e-7 near 1.7e9) — the bucketing now runs in integer
    microseconds. Touching intervals at an exact bucket boundary stay
    excluded; overlapping pairs surface exactly once; results match a
    brute-force overlap join."""
    from degenter_clickhouse_spark.operators.asof import interval_join

    w = 3600.0
    base = float(472_222 * 3600)  # ~1.69999e9, a bucket boundary
    left = _iv(spark, [
        (1, 10, base, base + w),           # ends exactly on a boundary
        (1, 11, base + w, base + 2 * w),
        (1, 12, base + 0.5 * w, base + 1.5 * w),
    ])
    right = _iv(spark, [
        (1, 20, base + w, base + 2 * w),   # touches id=10 -> excluded
        (1, 21, base, base + 0.25 * w),
        (1, 22, base + 10 * w, base + 11 * w),
    ])
    out = interval_join(left, right, ("s", "e"), ("s", "e"), by=["k"],
                        bucket_width=w)
    # brute-force oracle: ls < re AND rs < le
    import itertools

    lrows = left.collect()
    rrows = right.collect()
    want = sorted(
        (l.id, r.id)
        for l, r in itertools.product(lrows, rrows)
        if l.s < r.e and r.s < l.e
    )
    assert _pairs(out) == want
    assert (10, 20) not in _pairs(out)  # touching, not overlapping
