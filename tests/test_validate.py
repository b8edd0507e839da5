"""Data-quality constraint checks (operators/validate.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from degenter_clickhouse_spark.operators import validate as V


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (3, None, 30.0),
            (4, "a", 200.0),
            (4, "c", 40.0),
        ],
        "id long, cat string, v double",
    )


def _report(df, constraints):
    return {
        r["constraint"]: (r["metric_num"], r["metric_den"], r["passed"])
        for r in V.check(df, constraints).collect()
    }


def test_predicate_and_threshold(spark, frame):
    rep = _report(
        frame,
        [
            V.not_null("cat"),
            # same condition, relaxed threshold: 4/5 = 80% passes via
            # the integer cross-multiply (no float division)
            V.Predicate("cat_mostly_set", F.col("cat").isNotNull(), 80),
            V.in_range("v", 0, 100),
        ],
    )
    assert rep["not_null(cat)"] == (4, 5, False)
    assert rep["cat_mostly_set"] == (4, 5, True)
    assert rep["range(v)"] == (4, 5, False)


def test_unique_and_accepted_values(spark, frame):
    rep = _report(
        frame,
        [
            V.Unique("unique(id)", ["id"]),
            V.accepted_values("cat", ["a", "b", "c"], min_pct=80),
            V.matches("cat", "[ab]", min_pct=50),
        ],
    )
    assert rep["unique(id)"] == (4, 5, False)
    assert rep["accepted_values(cat)"] == (4, 5, True)
    assert rep["matches(cat)"] == (3, 5, True)


def test_foreign_key(spark, frame):
    dim = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    rep = _report(frame, [V.ForeignKey("fk(id)", "id", dim, "k")])
    # two rows carry id=4 with no dim match
    assert rep["fk(id)"] == (3, 5, False)


def test_rejects_unknown_constraint(spark, frame):
    with pytest.raises(TypeError):
        V.check(frame, [object()])


def test_single_scan_plan_for_predicates(spark, frame):
    """All predicate + uniqueness constraints compile into ONE
    aggregation over the input — no per-constraint rescans."""
    rep = V.check(
        frame,
        [V.not_null("cat"), V.in_range("v", 0, 100), V.Unique("u", ["id"])],
    )
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    # exactly one scan of the in-memory relation in the optimized plan
    assert plan.count("LocalRelation") <= 2  # relation + empty-struct side


def test_unique_counts_null_keys(spark):
    """ADVICE r7: NULL-keyed rows must participate in the uniqueness
    metric (struct-wrapped count_distinct). Duplicated NULL keys lower
    the ratio; a single NULL key counts as one distinct value — the
    SQL COUNT(DISTINCT (a, b)) row-value semantics."""
    df = spark.createDataFrame(
        [(1, "x"), (None, "x"), (None, "x"), (2, "y"), (None, "z")],
        "k long, g string",
    )
    rep = _report(df, [V.Unique("u1", ["k"]), V.Unique("u2", ["k", "g"])])
    # k: {1, 2, NULL} -> 3 distinct of 5 rows (two dup NULLs collapse)
    assert rep["u1"] == (3, 5, False)
    # (k,g): (NULL,x) duplicated -> 4 distinct of 5
    assert rep["u2"] == (4, 5, False)
    # fully unique incl. a NULL key passes
    ok = spark.createDataFrame([(1,), (None,)], "k long")
    assert _report(ok, [V.Unique("u", ["k"])])["u"] == (2, 2, True)
