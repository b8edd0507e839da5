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
