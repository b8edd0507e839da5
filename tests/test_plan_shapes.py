"""Physical-plan invariants over the ENTIRE query registry — the
100 TB design contracts, asserted on the optimizer's output rather
than code review:

1. No row-at-a-time Python UDF (BatchEvalPython) anywhere; Python
   appears only as Arrow-batched map/grouped-map in the operators built
   on them (multimodal decode, sequence packing).
2. Filters and projections reach the parquet scan (pushdown + pruning)
   on the fact-scanning headline queries.
3. Dimension joins broadcast (no shuffle join against a dim table) in
   the star-schema queries.
"""

from __future__ import annotations

import pytest

from degenter_clickhouse_spark.queries import load_registry

from .helpers import SF_DIR

REGISTRY = load_registry()

# Arrow-batched Python is the *designed* slow path for these (binary
# decode / order-dependent per-group state); everything else must stay
# wholly JVM-side.
ARROW_PYTHON_OK = {
    "multimodal_features",
    "multimodal_frame_sample",
    "sequence_packing",
}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _plan_formatted(df) -> str:
    """explain('formatted') as a string — unlike toString(), scan nodes
    are NOT width-truncated, so ReadSchema/PushedFilters are complete."""
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_row_python_udf_anywhere(spark, name):
    plan = _plan(REGISTRY[name].fn(spark, SF_DIR))
    assert "BatchEvalPython" not in plan, f"{name} runs a row-at-a-time Python UDF"
    if name not in ARROW_PYTHON_OK:
        assert "ArrowEvalPython" not in plan and "FlatMapGroupsInPandas" not in plan and (
            "MapInPandas" not in plan
        ), f"{name} unexpectedly leaves the JVM"


def test_fact_scan_pushdown(spark):
    """pricing_summary filters a date range over lineitem: the range
    predicate must reach the parquet reader as a pushed filter, and the
    scan must NOT read every column (projection pruning)."""
    plan = _plan_formatted(REGISTRY["pricing_summary"].fn(spark, SF_DIR))
    import re

    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed and any(p.strip() for p in pushed), plan
    # lineitem has 16 columns; the pricing summary needs far fewer
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan
    n_cols = max(s.count(":") for s in schemas)
    assert n_cols <= 10, f"scan reads {n_cols} columns: {schemas}"


def test_star_joins_broadcast(spark):
    """star_revenue joins facts to region/nation dims: every dim join
    must be a broadcast join, never a shuffle (SortMerge) join."""
    plan = _plan(REGISTRY["star_revenue"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_latest_value_partial_aggregation(spark):
    """The latest-row view aggregates with a map-side partial
    (partial_max_by BELOW the exchange), so the shuffle carries one
    combined row per (key, input partition), not the raw ticks.
    (max_by over a struct ordering plans as SortAggregate — the
    partial/final split is the load-bearing property, not the
    aggregate flavor.)"""
    plan = _plan(REGISTRY["latest_value"].fn(spark, SF_DIR))
    assert "partial_max_by" in plan, plan
    partial_pos = plan.index("partial_max_by")
    exchange_pos = plan.index("Exchange")
    assert exchange_pos < partial_pos, (
        "partial aggregate should sit below (after, in tree print order) "
        "the exchange\n" + plan
    )
