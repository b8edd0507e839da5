"""Skew-aware aggregation (SURVEY.md §6 / 100 TB design).

The trade stream is heavily skewed — the reference's hot pool takes
~30% of rows (FIXTURES.md), and at 1000-executor scale a plain
``groupBy(pool_id)`` sends that pool's entire volume through one
reducer. Two mitigations compose here:

* AQE skew-join splitting handles the JOIN side automatically
  (enabled in session.py).
* For aggregations, ``salted_agg`` does the classic two-phase split:
  shuffle once on (key, salt) so the hot key fans out over N reducers,
  then merge the N partials — correct for any algebraic aggregate
  (sum/count/min/max) supplied as (partial, merge) pairs.

``approx_distinct`` is the A3-at-scale variant SURVEY.md calls for:
HyperLogLog++ instead of exact distinct, one pass, mergeable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partials: dict[str, Column],
    merges: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over a salted key.

    ``partials``: name -> aggregate over the raw rows (phase 1, grouped
    by keys + salt). ``merges``: name -> aggregate over the phase-1
    partials (phase 2, grouped by keys; reference partial columns by
    name). Example::

        salted_agg(trades, ["pool_id"],
                   partials={"vol": F.sum("amount"), "n": F.count(F.lit(1))},
                   merges={"vol": F.sum("vol"), "n": F.sum("n")})
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(name) for name, c in partials.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[c.alias(name) for name, c in merges.items()]
    )


def approx_distinct(col: str | Column, rsd: float = 0.01) -> Column:
    """HyperLogLog++ distinct count (the at-scale stand-in for
    ClickHouse uniqExact / Spark countDistinct); rsd = relative
    standard deviation."""
    return F.approx_count_distinct(col, rsd)


def distinct_state(
    df: DataFrame, keys: Sequence[str], col: str | Column, lgk: int = 12
) -> DataFrame:
    """Mergeable distinct-count STATE per key (ClickHouse ``uniqState``
    into an AggregatingMergeTree): a Datasketches HLL sketch as a
    binary column, persistable in a rollup table.

    The point at 100 TB: distinct counts don't sum across rollup rows
    (a trader active on two days is two rows but one trader), so
    pre-aggregated uniques normally force a raw-data rescan per query
    range. Sketch states merge losslessly instead — materialize one
    sketch per (key, day) once, answer any date-range uniques query by
    unioning the covered days' sketches (``distinct_merge``), never
    touching raw data again. Same pattern as the engine's other
    persisted partials (plans/incremental.py) extended to the one
    aggregate that is not algebraic.
    """
    c = F.col(col) if isinstance(col, str) else col
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(c, F.lit(lgk)).alias("uniq_state")
    )


def distinct_merge(states: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge persisted sketch states (ClickHouse ``uniqMerge``): union
    the sketches per key and estimate. Input rows are partials from
    ``distinct_state`` (possibly different grains — filter to the
    range first); output is one estimate per key."""
    return states.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("uniq_state"))).alias(
            "uniq_estimate"
        )
    )
