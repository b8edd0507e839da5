"""Join helpers (SURVEY.md §2.4).

All reference joins are equi-joins fact→dimension (J1-J3, J13) plus
semi/anti guards (J7/J8). Dimensions (tokens, pools) are tiny vs the
trades fact table, so the fact side keeps its partitioning and the dim
side broadcasts — no fact shuffle.

``dim_broadcast`` is the ONE seam every dim-side hint goes through,
and it degrades gracefully instead of hard-wiring ``F.broadcast``:

* a hard hint overrides ``spark.sql.autoBroadcastJoinThreshold``
  entirely, so a dimension that grows past executor memory at 100×
  scale (tokens/pools at a 100 TB deployment) would OOM the build side
  rather than fall back to a shuffle join;
* the helper therefore applies the hint only while Catalyst's size
  estimate for the subplan stays under a guard ceiling
  (``spark.degenter.dimBroadcast.maxBytes``, default 8 GiB — Spark's
  own hard broadcast limit); beyond it the join degrades to whatever
  AQE picks at runtime;
* ``spark.degenter.dimBroadcast = always | auto | never`` forces the
  hint on (the r1-r3 behavior), leaves it estimate-governed (default),
  or strips it (lets pure AQE decide — also how the plan-shape tests
  prove the flag flips to a shuffle join).

At test scale the estimates are KiB-sized, so plans keep the exact
r3 shapes (asserted in tests/test_plan_shapes.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MODE_KEY = "spark.degenter.dimBroadcast"
_MAX_KEY = "spark.degenter.dimBroadcast.maxBytes"
_DEFAULT_MAX = 8 * 1024**3  # Spark's hard cap for a broadcast relation


def dim_broadcast(dim: DataFrame) -> DataFrame:
    """Apply the broadcast hint to a dimension-side frame unless it is
    (estimated to be) too big to safely broadcast. See module docstring."""
    try:
        conf = dim.sparkSession.conf
        mode = conf.get(_MODE_KEY, "auto")
    except Exception:
        return F.broadcast(dim)
    if mode == "never":
        return dim
    if mode == "always":
        return F.broadcast(dim)
    try:
        max_bytes = int(conf.get(_MAX_KEY, str(_DEFAULT_MAX)))
        # ANALYZED-plan stats, not optimizedPlan (optimization r14,
        # guide §5): the analyzed plan is already materialized when a
        # DataFrame exists, so reading its size visitor is ~free, while
        # .optimizedPlan() ran the full Catalyst optimizer over the dim
        # subtree — 40-200 ms of driver time per call, all of it thrown
        # away when the enclosing query optimizes the same subtree
        # again. The two estimates differ only by optimization effects
        # (pruning/pushdown), which is noise against an 8 GiB ceiling:
        # the guard's job is "obviously too big to broadcast", not
        # byte-accurate sizing.
        raw = dim._jdf.queryExecution().analyzed().stats().sizeInBytes()
        # py4j maps scala BigInt to int for normal sizes; huge/unknown
        # estimates may arrive as a java object — stringify those
        est = raw if isinstance(raw, int) else int(raw.toString())
    except Exception:
        # estimate unavailable (e.g. streaming subplan): keep the hint —
        # matches the pre-helper behavior for frames Catalyst can't size
        return F.broadcast(dim)
    if est >= (1 << 63) - 1:
        # Catalyst's "no estimate" SENTINEL (defaultSizeInBytes =
        # Long.MaxValue), not a real size — RDD-backed frames
        # (createDataFrame dims: runtime block/allow lists, alert
        # specs) report this and were silently falling back to a
        # sort-merge join. No estimate == estimate unavailable: keep
        # the hint, same as the exception path above.
        return F.broadcast(dim)
    return F.broadcast(dim) if est <= max_bytes else dim


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | Column,
    how: str = "inner",
    broadcast: bool = True,
) -> DataFrame:
    other = dim_broadcast(dim) if broadcast else dim
    return fact.join(other, on=on, how=how)


def semi(fact: DataFrame, keys: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """J7 EXISTS (jobs/alerts.js:53-56)."""
    return fact.join(dim_broadcast(keys), on=on, how="left_semi")


def anti(fact: DataFrame, keys: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """J8 NOT EXISTS insert guard (core/pools.js:51-69)."""
    return fact.join(dim_broadcast(keys), on=on, how="left_anti")
