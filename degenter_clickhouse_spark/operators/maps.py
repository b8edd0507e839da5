"""Mergeable map-typed aggregates — the ClickHouse ``sumMap`` /
``minMap`` / ``maxMap`` family (reference rollups accumulate
(key -> amount) maps per group, e.g. per-token side/venue volume
breakdowns; phase3schema.sql's AggregatingMergeTree states).

Semantics: each input row carries a ``map<K, V>``; the group result is
the key-wise fold (sum/min/max) of all entry multisets, as a map whose
entries are sorted by key (deterministic across shuffle orders).

Spark-native shape — NOT a collect_list of maps (which would move
whole maps into one reducer's memory): entries explode to rows, fold
in ONE hash aggregation with map-side partials (the per-entry combine
is where 100 TB of maps compresses to |group keys| x |map keys| rows),
then re-assemble per group. Because sum/min/max are associative, the
same operator applied to already-aggregated map rows is the merge
(``sumMapMerge`` analogue) — asserted equal to the direct fold in
tests/test_scale_ops.py.

For bit-stable double sums across engines/partitionings, cast map
values to DECIMAL upstream (see queries/stats_ext.q_map_aggregates).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FOLDS = {"sum": F.sum, "min": F.min, "max": F.max}


def agg_map(
    df: DataFrame,
    keys: Sequence[str],
    map_col: str,
    how: str = "sum",
    out: str | None = None,
) -> DataFrame:
    """Key-wise fold of a map column per group: ClickHouse
    ``{how}Map``. Returns ``keys + [out]`` where ``out`` is a map with
    entries sorted by key. Missing keys are absent (ClickHouse
    semantics: only observed keys appear), never zero-filled; a group
    whose maps are all empty/NULL still appears, with an empty map
    (``explode_outer`` keeps its rows — GROUP BY semantics, found by
    the hypothesis property test)."""
    if how not in _FOLDS:
        raise ValueError(f"agg_map: how must be one of {sorted(_FOLDS)}")
    out = out or f"{how}_map"
    ks = list(keys)
    exploded = df.select(
        *ks, F.explode_outer(F.col(map_col)).alias("__mk", "__mv")
    )
    folded = exploded.groupBy(*ks, "__mk").agg(
        _FOLDS[how]("__mv").alias("__fv")
    )
    # collect_list skips the NULL struct of an entry-less group, so it
    # folds to map() rather than dropping the group
    entry = F.when(
        F.col("__mk").isNotNull(), F.struct("__mk", "__fv")
    )
    return folded.groupBy(*ks).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(entry))
        ).alias(out)
    )


def merge_maps(
    df: DataFrame,
    keys: Sequence[str],
    map_col: str,
    how: str = "sum",
    out: str | None = None,
) -> DataFrame:
    """Merge pre-aggregated map states (``sumMapMerge`` analogue) —
    identical algorithm, named separately to mark the rollup seam:
    partial maps built per partition/day/shard re-fold to the global
    answer without rescanning raw rows."""
    return agg_map(df, keys, map_col, how=how, out=out or map_col)


# ---------------------------------------------------------------------------
# Exact set states (ClickHouse groupBitmap / groupBitmapAnd/Or): the
# group's member-id set as a sorted array — a mergeable EXACT distinct
# state for bounded-cardinality ids (audience/segment analytics, where
# set INTERSECTIONS are the question HLL cannot answer: sketch unions
# are lossless but intersections are not). State size is O(distinct
# ids per group) — the same envelope as ClickHouse's bitmaps; for
# unbounded cardinality use operators/skew.distinct_state (HLL).
# ---------------------------------------------------------------------------


def bitmap_state(
    df: DataFrame, keys: Sequence[str], id_col: str, out: str = "bm"
) -> DataFrame:
    """(keys, bm sorted-distinct array, n member count). One hash agg
    with map-side partial collect_sets."""
    return df.groupBy(*keys).agg(
        F.array_sort(F.collect_set(F.col(id_col))).alias(out),
        F.countDistinct(F.col(id_col)).alias("n"),
    )


def bitmap_merge(
    df: DataFrame, keys: Sequence[str], bm_col: str = "bm"
) -> DataFrame:
    """Merge partial bitmap states (groupBitmapMergeState analogue):
    per-day/shard states re-fold to the global set without rescanning
    raw rows."""
    return df.groupBy(*keys).agg(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list(F.col(bm_col))))
        ).alias(bm_col)
    ).withColumn("n", F.size(F.col(bm_col)).cast("long"))


def distinct_up_to(
    df: DataFrame,
    keys: Sequence[str],
    id_col: str,
    n: int,
    out: str = "bm",
) -> DataFrame:
    """ClickHouse ``uniqUpTo(N)``: exact distinct count capped at N —
    the "more than N distinct buyers?" gate where the precise count
    above N is irrelevant. State = the N+1 SMALLEST distinct ids per
    group, so state size is O(N) regardless of group cardinality
    (unlike ``bitmap_state``) while counts <= N stay exact and > N is
    detected exactly.

    The smallest-(N+1) cap is what makes states MERGEABLE without
    error: every one of the union's N+1 smallest ids is among its own
    partial's N+1 smallest, so re-capping the union of capped states
    equals capping the uncapped union (asserted in
    tests/test_scale_ops.py). Returns (keys, bm capped array,
    n_up_to = least(N+1, true distinct) — read n_up_to > N as "more
    than N").

    Shape note: the cap is applied BEFORE any per-group collection —
    distinct, then a spillable per-key row_number <= N+1, then a
    bounded collect — so no agg buffer ever holds a hot group's full
    id set (a collect_set-then-slice would)."""
    from pyspark.sql.window import Window

    ks = list(keys)
    dist = df.select(*ks, F.col(id_col)).distinct()
    w = Window.partitionBy(*ks).orderBy(F.col(id_col).asc())
    capped_rows = dist.withColumn(
        "__rk", F.row_number().over(w)
    ).filter(F.col("__rk") <= n + 1)
    capped = capped_rows.groupBy(*ks).agg(
        F.array_sort(F.collect_list(F.col(id_col))).alias(out)
    )
    return capped.withColumn("n_up_to", F.size(F.col(out)).cast("long"))


def distinct_up_to_merge(
    df: DataFrame, keys: Sequence[str], n: int, bm_col: str = "bm"
) -> DataFrame:
    """Merge capped states (``uniqUpToMerge``): union, re-sort,
    re-cap."""
    merged = df.groupBy(*keys).agg(
        F.slice(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list(F.col(bm_col))))
            ),
            1,
            n + 1,
        ).alias(bm_col)
    )
    return merged.withColumn("n_up_to", F.size(F.col(bm_col)).cast("long"))
