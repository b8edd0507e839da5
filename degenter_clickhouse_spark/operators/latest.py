"""Latest/earliest-row views (SURVEY.md §2.4 J4/J5/J6, §2.5 A4/A5).

The reference resolves "current price" / "current reserves" with either
``argMax(value, updated_at)`` GROUP BY subqueries
(jobs/matrix-rollups.js:45-51) or correlated ``ORDER BY updated_at DESC
LIMIT 1`` lookups (api/routes/trades.js:295,410-416). This engine
standardizes on the decorrelated form: one ``max_by`` aggregation that
becomes a broadcastable lookup side for downstream joins — the correlated
pattern is never generated (SURVEY.md §4).

Scale: a ``groupBy(keys).agg(max_by...)`` is a single shuffle on the
key with full map-side partial aggregation; the result (one row per key)
is dimension-sized and broadcast in downstream joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ord(order_cols: Sequence[str | Column]) -> Column:
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    return cols[0] if len(cols) == 1 else F.struct(*cols)


def latest_by(
    df: DataFrame,
    keys: Sequence[str],
    values: Sequence[str],
    order: Sequence[str | Column],
) -> DataFrame:
    """One row per key; each value column taken from the row with the
    greatest ``order`` tuple. ClickHouse ``argMax`` ≙ Spark ``max_by``."""
    ordc = _ord(order)
    aggs = [F.max_by(F.col(v), ordc).alias(v) for v in values]
    return df.groupBy(*keys).agg(*aggs)


def earliest_by(
    df: DataFrame,
    keys: Sequence[str],
    values: Sequence[str],
    order: Sequence[str | Column],
) -> DataFrame:
    """ClickHouse ``argMin`` ≙ Spark ``min_by`` (first-seen lookups,
    e.g. first provide trade jobs/fasttrack-listener.js:122-137)."""
    ordc = _ord(order)
    aggs = [F.min_by(F.col(v), ordc).alias(v) for v in values]
    return df.groupBy(*keys).agg(*aggs)


def latest_by_backscan(
    spark,
    store_path: str,
    keys: Sequence[str],
    values: Sequence[str],
    order: Sequence[str],
    universe: DataFrame,
    max_days: int | None = None,
    where: Column | None = None,
    hi_day: str | None = None,
) -> tuple[DataFrame, int]:
    """``latest_by`` over a day-partitioned store WITHOUT scanning all
    of history: probe day partitions newest-first and stop as soon as
    every key in ``universe`` (a dimension-sized frame of the key
    columns) has a row, or the days run out.

    This is the Spark analogue of ClickHouse's ``ORDER BY pk DESC
    LIMIT 1`` early-stop (api/util/pool-select.js:100-106 runs exactly
    that shape): Catalyst cannot stop a ``max_by`` aggregation early,
    so a 60 s tick that only needs each pool's LAST close would
    otherwise re-scan the entire fact table every time. Steady state
    — every live key traded today — costs one day partition's scan;
    a key idle for N days costs the N newest days. Each per-day probe
    is one small job; the accumulated result is dimension-sized
    (one row per key).

    Keys in ``universe`` with no row in any scanned day are simply
    absent from the result, exactly like ``latest_by`` over a frame
    that lacks them. The ``order`` columns ride along in the output
    (callers re-deriving latest-of-latest need them). A store that is
    not day-partitioned on disk falls back to one full ``latest_by``
    (days_scanned = -1). Returns (frame, days_scanned).

    ``where`` pre-filters every probed day (and the flat fallback) —
    e.g. ``bucket_start <= cutoff`` turns this into "latest row AT a
    past instant" (the reference's prev-close leg,
    api/util/pool-select.js:107-113): days newer than the cutoff
    contribute nothing and the scan keeps descending until each key's
    newest qualifying row is found — pass ``hi_day`` (the cutoff's
    ``YYYY-MM-DD``) to skip those no-op probes entirely: day dirs whose
    partition value sorts strictly above it are never opened.

    ``max_days=None`` reads ``spark.degenter.backscan.maxDays``
    (default 90): without a bound, ONE key with no row at all — a new
    pool that never traded, common in the full pools universe — forces
    a sequential probe (collect + localCheckpoint each) of EVERY day
    partition of history on EVERY 60 s tick (ADVICE r12 #3). A key
    idle longer than the bound is simply absent from the result, the
    same contract as a key missing from the store; set the conf to 0
    to restore unbounded scans."""
    import os

    if max_days is None:
        raw = spark.conf.get("spark.degenter.backscan.maxDays", "90")
        max_days = int(raw) if raw and int(raw) > 0 else None
    day_dirs = sorted(
        (
            d
            for d in os.listdir(store_path)
            if (d.startswith("__day=") or d.startswith("dt="))
            and not d.startswith(".")
        ),
        key=lambda d: d.split("=", 1)[1],
        reverse=True,
    )
    had_day_layout = bool(day_dirs)
    if hi_day is not None:
        day_dirs = [d for d in day_dirs if d.split("=", 1)[1] <= hi_day]
    vals = list(dict.fromkeys([*values, *order]))  # order cols ride along
    if not day_dirs:
        if had_day_layout:
            # day-partitioned store but every day sorts above hi_day:
            # the where-bound would empty every probe — answer is empty
            df = spark.read.parquet(store_path)
            return latest_by(df, keys, vals, order).limit(0), 0
        df = spark.read.parquet(store_path)
        if where is not None:
            df = df.filter(where)
        return latest_by(df, keys, vals, order), -1
    want = {tuple(r) for r in universe.select(*keys).distinct().collect()}
    acc: DataFrame | None = None
    found: set[tuple] = set()
    scanned = 0
    for d in day_dirs:
        if max_days is not None and scanned >= max_days:
            break
        if found >= want:
            break
        day = spark.read.parquet(os.path.join(store_path, d))
        if where is not None:
            day = day.filter(where)
        fresh = latest_by(day, keys, vals, order)
        if found:
            missing = [t for t in want - found]
            miss_df = spark.createDataFrame(
                missing, schema=universe.select(*keys).schema
            )
            fresh = fresh.join(F.broadcast(miss_df), list(keys), "left_semi")
        # dimension-sized: pin each day's contribution so the loop's
        # key-collect and the final union don't re-run prior days' scans
        fresh = fresh.localCheckpoint(eager=True)
        found |= {tuple(r) for r in fresh.select(*keys).collect()}
        acc = fresh if acc is None else acc.unionByName(fresh)
        scanned += 1
    if acc is None:  # store has day dirs but none matched (empty)
        df = spark.read.parquet(store_path)
        return latest_by(df, keys, vals, order).limit(0), 0
    return acc, scanned


def latest_row(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str | Column],
) -> DataFrame:
    """Whole-row latest per key via row_number (keeps every column).

    Equivalent to reading a ClickHouse ReplacingMergeTree at its merged
    state (jobs/token-security.js:29-31): latest version per key wins.
    """
    from pyspark.sql.window import Window

    ordc = [F.col(c) if isinstance(c, str) else c for c in order]
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in ordc])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
