"""Join helpers (SURVEY.md §2.4).

All reference joins are equi-joins fact→dimension (J1-J3, J13) plus
semi/anti guards (J7/J8). Dimensions (tokens, pools) are tiny vs the
trades fact table, so the fact side keeps its partitioning and the dim
side broadcasts — no fact shuffle. ``F.broadcast`` is an explicit hint;
AQE would usually convert anyway, but at 100 TB we don't want a single
mis-estimated stats pass to fall back to a sort-merge join over the
full fact table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | Column,
    how: str = "inner",
    broadcast: bool = True,
) -> DataFrame:
    other = F.broadcast(dim) if broadcast else dim
    return fact.join(other, on=on, how=how)


def semi(fact: DataFrame, keys: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """J7 EXISTS (jobs/alerts.js:53-56)."""
    return fact.join(F.broadcast(keys), on=on, how="left_semi")


def anti(fact: DataFrame, keys: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """J8 NOT EXISTS insert guard (core/pools.js:51-69)."""
    return fact.join(F.broadcast(keys), on=on, how="left_anti")
