"""Materialized projections — the ClickHouse ``PROJECTION`` analogue
(reference: phase3schema.sql's AggregatingMergeTree rollups serve the
same role): a table carries pre-aggregated PARTIAL STATES keyed on a
superset of the queries' GROUP BY columns, and an aggregation query
whose keys are covered is answered by MERGING states instead of
rescanning the fact table.

Partial states here are the associative four — sum / count / min /
max — stored as plain columns (sums in DECIMAL for bit-stable
re-reduction). Any coarser grouping derives exactly:

    sum   <- SUM(sum_state)      count <- SUM(count_state)
    min   <- MIN(min_state)      max   <- MAX(max_state)
    avg   <- SUM(sum)/SUM(count) (derived, never stored)

At 100 TB the projection is smaller than the fact table by the
grouping's compression factor (hours x pools vs raw ticks: ~1e4x), so
a dashboard's repeated aggregates cost O(projection) — and because
states merge by the same associative ops, projections compose with
the engine's CDC maintenance (plans/incremental: refresh touched
groups from vt_changes, never rescan).

``ProjectionSet.aggregate`` is the router: it picks the SMALLEST
registered projection whose key set covers the requested grouping and
whose states cover the requested measures, else falls back to the
base table — the same decision ClickHouse's optimizer makes per
query, surfaced as an explicit, testable seam (the chosen source is
returned alongside the frame).
"""

from __future__ import annotations

import os
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEC = "decimal(38,6)"

# measure spec: out_col -> (op, source expression string | None for count)
_PARTIAL_OPS = ("sum", "count", "min", "max")


def _partial_agg(op: str, src: str | None, out: str) -> F.Column:
    if op == "sum":
        return F.sum(F.expr(src).cast(DEC)).alias(out)
    if op == "count":
        return F.count(F.lit(1) if src is None else F.expr(src)).alias(out)
    if op == "min":
        return F.min(F.expr(src)).alias(out)
    if op == "max":
        return F.max(F.expr(src)).alias(out)
    raise ValueError(f"projection: unsupported partial op {op!r}")


def _merge_agg(op: str, col: str) -> F.Column:
    if op == "sum":
        return F.sum(F.col(col).cast(DEC)).alias(col)
    if op == "count":
        return F.sum(F.col(col)).cast("long").alias(col)
    if op == "min":
        return F.min(col).alias(col)
    if op == "max":
        return F.max(col).alias(col)
    raise ValueError(f"projection: unsupported merge op {op!r}")


def build_projection(
    df: DataFrame,
    path: str,
    keys: Sequence[str],
    measures: Mapping[str, tuple[str, str | None]],
) -> None:
    """Materialize partial states grouped on ``keys``. ``measures``:
    out_col -> (op, source expr); op in sum/count/min/max. Keys may be
    expressions via ``df.withColumn`` upstream; here they are column
    names so the router can match them by name."""
    for out, (op, _src) in measures.items():
        if op not in _PARTIAL_OPS:
            raise ValueError(f"projection: unsupported op {op!r} for {out}")
    aggs = [_partial_agg(op, src, out) for out, (op, src) in measures.items()]
    df.groupBy(*list(keys)).agg(*aggs).write.mode("overwrite").parquet(path)


class Projection:
    def __init__(
        self,
        name: str,
        path: str,
        keys: Sequence[str],
        measures: Mapping[str, tuple[str, str | None]],
    ) -> None:
        self.name = name
        self.path = path
        self.keys = list(keys)
        self.measures = dict(measures)

    def covers(
        self,
        group_by: Sequence[str],
        measures: Mapping[str, tuple[str, str | None]],
    ) -> bool:
        """Keys must be a subset AND every requested measure must match
        the stored definition (op + source expression), not just the
        name — a same-named measure computed differently must fall to
        the base table, never silently merge the wrong states."""
        if not set(group_by) <= set(self.keys):
            return False
        return all(
            self.measures.get(name) == spec for name, spec in measures.items()
        )


class ProjectionSet:
    """Registered projections over one logical fact table + the
    routing decision. Register fine and coarse projections freely; the
    router prefers the one with the FEWEST keys that still covers the
    query (fewest keys ~ fewest rows to merge)."""

    def __init__(self, spark: SparkSession, base: DataFrame) -> None:
        self.spark = spark
        self.base = base
        self.projections: list[Projection] = []

    def add(
        self,
        name: str,
        path: str,
        keys: Sequence[str],
        measures: Mapping[str, tuple[str, str | None]],
        build: bool = True,
    ) -> None:
        if build:
            build_projection(self.base, path, keys, measures)
        self.projections.append(Projection(name, path, keys, measures))

    def route(
        self,
        group_by: Sequence[str],
        measures: Mapping[str, tuple[str, str | None]],
    ) -> Projection | None:
        fits = [
            p
            for p in self.projections
            if p.covers(group_by, measures)
        ]
        if not fits:
            return None
        return min(fits, key=lambda p: (len(p.keys), p.name))

    def aggregate(
        self,
        group_by: Sequence[str],
        measures: Mapping[str, tuple[str, str | None]],
        avg: Mapping[str, tuple[str, str]] | None = None,
    ) -> tuple[DataFrame, str]:
        """Answer GROUP BY ``group_by`` with the requested measures.
        Returns (frame, source) where source is the chosen projection
        name or 'base'. ``avg``: out -> (sum_measure, count_measure),
        derived after the merge (exact: DECIMAL sum / BIGINT count).
        Results are identical whichever source is chosen — asserted in
        tests/test_projection.py."""
        gb = list(group_by)
        proj = self.route(gb, measures)
        if proj is None:
            aggs = [
                _partial_agg(op, src, out)
                for out, (op, src) in measures.items()
            ]
            out = self.base.groupBy(*gb).agg(*aggs)
            src_name = "base"
        else:
            part = self.spark.read.parquet(proj.path)
            aggs = [
                _merge_agg(op, out) for out, (op, _src) in measures.items()
            ]
            out = part.groupBy(*gb).agg(*aggs)
            src_name = proj.name
        for out_col, (s, c) in (avg or {}).items():
            out = out.withColumn(
                out_col,
                (F.col(s).cast("double") / F.col(c).cast("double")),
            )
        return out, src_name


def projection_path(root: str, name: str) -> str:
    return os.path.join(root, f"proj_{name}")


def refresh_projection(
    spark: SparkSession,
    base: DataFrame,
    path: str,
    keys: Sequence[str],
    measures: Mapping[str, tuple[str, str | None]],
    touched: DataFrame,
) -> int:
    """CDC maintenance for a projection (the plans/incremental
    recompute-touched-groups recipe, generalized): given the CURRENT
    base snapshot and the distinct key tuples ``touched`` by a delta
    (from ``vt_changes`` or the ingest batch), recompute partial
    states for ONLY those groups (broadcast semi-join — bounded by the
    delta's group count, never the fact table) and swap them into the
    stored projection. Groups whose rows all vanished are REMOVED
    (the vacated-group lesson: an un-upserted stale partial overcounts
    forever). min/max states cannot decrement, which is exactly why
    this recomputes touched groups instead of folding deltas.

    The rewrite is O(|projection|), which is |group combinations| —
    the same envelope ClickHouse pays merging projection parts.
    Returns the number of groups refreshed (including deletions)."""
    ks = list(keys)
    t = touched.select(*ks).distinct().localCheckpoint(eager=True)
    n_touched = t.count()
    if n_touched == 0:
        return 0
    scoped = base.join(F.broadcast(t), ks, "left_semi")
    aggs = [_partial_agg(op, src, out) for out, (op, src) in measures.items()]
    fresh = scoped.groupBy(*ks).agg(*aggs)
    current = spark.read.parquet(path)
    kept = current.join(F.broadcast(t), ks, "left_anti")
    out = kept.unionByName(fresh).localCheckpoint(eager=True)
    out.write.mode("overwrite").parquet(path)
    return n_touched
