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


def salted_topk(
    df: DataFrame,
    keys: Sequence[str],
    k: int,
    order_by: Sequence[Column],
    rank_col: str | None = None,
) -> DataFrame:
    """Per-key top-k that survives hot keys: phase 1 takes the local
    top-k within each (key, input-partition) slice — the hot key's
    rows are already spread over input partitions, so no single window
    partition ever sorts more than one slice — and phase 2 ranks the
    surviving ≤ partitions × k rows per key. Identical output to a
    plain ``row_number() <= k`` window for any total order (``order_by``
    must break ties fully) — asserted in tests — at the cost of one
    extra, much smaller shuffle.

    ``rank_col``: also expose the final per-key rank (1-based)."""
    from pyspark.sql.window import Window

    order = list(order_by)
    w1 = Window.partitionBy(*keys, "__salt").orderBy(*order)
    w2 = Window.partitionBy(*keys).orderBy(*order)
    out = (
        df.withColumn("__salt", F.spark_partition_id())
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= int(k))
        .drop("__r1")
        .withColumn("__rk", F.row_number().over(w2))
        .filter(F.col("__rk") <= int(k))
        .drop("__salt")
    )
    if rank_col is not None:
        return out.withColumnRenamed("__rk", rank_col)
    return out.drop("__rk")


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


def quantile_state(
    df: DataFrame,
    keys: Sequence[str],
    col: str | Column,
    lo: float,
    hi: float,
    bins: int = 128,
) -> DataFrame:
    """Mergeable quantile STATE per key (ClickHouse ``quantileState``
    into an AggregatingMergeTree): a fixed-range integer histogram as
    plain summable rows — (keys..., bin, cnt) plus the self-describing
    (q_lo, q_hi, q_bins) config.

    Same 100 TB motive as ``distinct_state``: quantiles aren't
    algebraic, so pre-aggregated rollups normally force a raw rescan
    per query range. Histogram states merge by integer ADDITION —
    materialize one state per (key, day) once; answer any date-range
    quantile by summing the covered days' rows (``quantile_merge``),
    never touching raw data again. Values outside [lo, hi) clamp into
    the edge bins (estimates at the clamped edges degrade gracefully;
    pick the range from domain knowledge, not the data). Unlike a
    sketch-blob state the rows are transparent SQL — exact-oracle
    checkable and engine-portable.
    """
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    w = (float(hi) - float(lo)) / int(bins)
    b = F.floor((c - F.lit(float(lo))) / F.lit(w)).cast("long")
    b = F.greatest(F.lit(0).cast("long"), F.least(F.lit(int(bins) - 1).cast("long"), b))
    return df.groupBy(*keys, b.alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.lit(float(lo)).alias("q_lo"),
        F.lit(float(hi)).alias("q_hi"),
        F.lit(int(bins)).alias("q_bins"),
    )


def quantile_merge(
    states: DataFrame, keys: Sequence[str], q: float
) -> DataFrame:
    """Merge persisted histogram states (ClickHouse ``quantileMerge``)
    and estimate the q-quantile per key.

    Deterministic estimate, bit-identical across engines: with merged
    per-bin counts, total N and 1-based rank r = max(1, ceil(q*N)),
    the answer bin is the first whose cumulative count reaches r, and
    the estimate interpolates inside it:

        lo + bin_width * (bin + (r - cum_before) / cnt_bin)

    — every input to the final double expression is an integer, so
    Spark and any SQL oracle produce the same bits. Shuffles: one sum
    on (key, bin), one per-key window over <= bins rows; never a
    global window, never raw data.
    """
    keys = list(keys)
    merged = states.groupBy(*keys, "q_lo", "q_hi", "q_bins", "bin").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
    from pyspark.sql.window import Window

    win = Window.partitionBy(*keys).orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy(*keys)
    withcum = merged.withColumn("cum", F.sum("cnt").over(win)).withColumn(
        "n_total", F.sum("cnt").over(tot)
    )
    r = F.greatest(
        F.lit(1).cast("long"), F.ceil(F.lit(float(q)) * F.col("n_total")).cast("long")
    )
    sel = (
        withcum.withColumn("r", r)
        .filter(F.col("cum") >= F.col("r"))
        .groupBy(*keys, "q_lo", "q_hi", "q_bins", "n_total", "r")
        .agg(F.min_by(F.struct("bin", "cnt", "cum"), F.col("bin")).alias("s"))
    )
    w = (F.col("q_hi") - F.col("q_lo")) / F.col("q_bins")
    est = F.col("q_lo") + w * (
        F.col("s.bin")
        + (F.col("r") - (F.col("s.cum") - F.col("s.cnt"))) / F.col("s.cnt")
    )
    return sel.select(
        *keys,
        F.col("n_total").alias("n"),
        est.alias("quantile_estimate"),
    )


# ---------------------------------------------------------------------------
# Count-Min Sketch: mergeable FREQUENCY state (Cormode & Muthukrishnan
# 2005). Completes the engine's mergeable-sketch family — distinct
# (HLL, `distinct_state`), quantiles (`quantile_state`), heavy hitters
# (`topk.frequent_items`) — with point-frequency estimation:
# "how often does this n-gram / word / key occur in any date range?"
# answered from persisted per-partition states by integer ADDITION,
# never rescanning raw data. Estimates only OVER-count (min over rows
# bounds the collision error by ~2N/width at 1-1/2^depth confidence).
#
# The row-hash family is ((h * a_j + b_j) % CMS_MOD) % width over an
# input already hashed into [0, CMS_MOD) — llm/text.py's polynomial
# word hash is the canonical feed, so h < 2^31 and h * a_j < 2^62
# stays inside BIGINT in Spark (ANSI mode aborts on overflow) AND in
# any SQL oracle. Plain-integer rows, no sketch blobs: exact-oracle
# checkable and engine-portable, like `quantile_state`.
# ---------------------------------------------------------------------------

CMS_MOD = 2147483647  # 2^31 - 1, same prime as llm/text.POLY_MOD
CMS_A = (1000003, 1000033, 1000037, 1000039, 1000081, 1000099)
CMS_B = (12345, 67891, 24681, 13579, 86421, 97531)


def cms_position(hashed: Column, row: int, width: int) -> Column:
    """Counter position of a pre-hashed value in sketch row ``row``.
    pmod keeps positions in-range even for a signed hash input (e.g.
    raw xxhash64); for the canonical non-negative polynomial hashes it
    equals plain ``%``, which is what the SQL oracles use."""
    a, b = CMS_A[row], CMS_B[row]
    # reduce BEFORE the multiply: a full-range signed hash (xxhash64)
    # times a would overflow BIGINT (ANSI mode aborts); after pmod the
    # operand is < 2^31 so the product stays < 2^62. For the canonical
    # polynomial hashes (already in [0, CMS_MOD)) the reduction is a
    # no-op and the whole chain equals the SQL oracles' plain ``%``.
    hr = F.pmod(hashed.cast("long"), F.lit(CMS_MOD))
    return F.pmod(
        F.pmod(hr * F.lit(a) + F.lit(b), F.lit(CMS_MOD)), F.lit(int(width))
    )


def _cms_rowpos(hashed: Column, depth: int, width: int) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("cms_row"),
                cms_position(hashed, j, width).cast("int").alias("cms_pos"),
            )
            for j in range(int(depth))
        ]
    )


def cms_state(
    df: DataFrame,
    keys: Sequence[str],
    hashed: str | Column,
    depth: int = 4,
    width: int = 1024,
    weight: Column | None = None,
) -> DataFrame:
    """Mergeable count-min STATE per key: (keys..., cms_row, cms_pos,
    cnt) summable rows — at most depth x width counters per key group
    regardless of input size.

    Scale shape: the depth-way explode is map-side and the partial
    aggregation collapses it before the shuffle, so the exchange
    carries <= |keys| x depth x width rows — sketch-sized, never
    input-sized. ``weight`` counts a column's sum instead of rows
    (e.g. token counts per n-gram)."""
    if int(depth) > len(CMS_A):
        raise ValueError(f"cms_state: depth must be <= {len(CMS_A)}")
    h = F.col(hashed) if isinstance(hashed, str) else hashed
    w = F.lit(1).cast("long") if weight is None else weight.cast("long")
    exploded = df.select(
        *keys, F.explode(_cms_rowpos(h, depth, width)).alias("__rp"), w.alias("__w")
    )
    return exploded.groupBy(
        *keys, F.col("__rp.cms_row").alias("cms_row"),
        F.col("__rp.cms_pos").alias("cms_pos"),
    ).agg(F.sum("__w").cast("long").alias("cnt"))


def cms_merge(states: DataFrame, keys: Sequence[str] = ()) -> DataFrame:
    """Merge persisted count-min states by integer addition — partials
    from different days/shards/streams combine losslessly as long as
    they share (depth, width)."""
    return states.groupBy(*keys, "cms_row", "cms_pos").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_estimate(
    states: DataFrame,
    probes: DataFrame,
    hashed: str | Column,
    depth: int = 4,
    width: int = 1024,
    keys: Sequence[str] = (),
    out_col: str = "cms_est",
) -> DataFrame:
    """Point-frequency estimates for every probe row: min over the
    sketch rows of the counter at the probe's position (0 when the
    position was never touched). ``probes`` keeps all its columns;
    the sketch side is dimension-sized (<= depth x width per key
    group) and broadcasts — the probe frame, which may be huge,
    never shuffles."""
    from .joins import dim_broadcast

    h = F.col(hashed) if isinstance(hashed, str) else hashed
    cols = list(probes.columns)
    p = probes.select(
        *cols, F.explode(_cms_rowpos(h, depth, width)).alias("__rp")
    ).select(
        *cols,
        F.col("__rp.cms_row").alias("cms_row"),
        F.col("__rp.cms_pos").alias("cms_pos"),
    )
    j = p.join(dim_broadcast(states), [*keys, "cms_row", "cms_pos"], "left")
    return j.groupBy(*cols).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias(out_col)
    )


# ---------------------------------------------------------------------------
# Bloom filter: mergeable MEMBERSHIP state — the set-membership member
# of the sketch family (distinct/quantile/heavy-hitter/frequency
# above). Same deterministic row-hash family as the count-min sketch,
# but the state keeps only the distinct touched positions (set bits),
# so shards merge by DISTINCT UNION and a probe is "all depth
# positions set". No false negatives ever; false-positive rate ~
# (1 - e^(-depth*n/width))^depth, tuned by width. The at-scale use:
# decontamination/dedup probes against a reference set whose sketch is
# a few KB of rows — the reference set itself never broadcasts or
# shuffles, only its bit positions do.
# ---------------------------------------------------------------------------


def bloom_state(
    df: DataFrame,
    keys: Sequence[str],
    hashed: str | Column,
    depth: int = 4,
    width: int = 8192,
) -> DataFrame:
    """Mergeable Bloom membership state per key: distinct (keys...,
    cms_row, cms_pos) rows — at most depth x width rows per key group
    regardless of input size (the explode collapses to set bits via
    the distinct's partial aggregation, map-side)."""
    if int(depth) > len(CMS_A):
        raise ValueError(f"bloom_state: depth must be <= {len(CMS_A)}")
    h = F.col(hashed) if isinstance(hashed, str) else hashed
    return (
        df.select(*keys, F.explode(_cms_rowpos(h, depth, width)).alias("__rp"))
        .select(
            *keys,
            F.col("__rp.cms_row").alias("cms_row"),
            F.col("__rp.cms_pos").alias("cms_pos"),
        )
        .distinct()
    )


def bloom_merge(states: DataFrame, keys: Sequence[str] = ()) -> DataFrame:
    """Merge persisted Bloom states: bit-OR == distinct union of the
    set positions. Partials from different days/shards combine
    losslessly as long as they share (depth, width)."""
    return states.select(*keys, "cms_row", "cms_pos").distinct()


def bloom_contains(
    states: DataFrame,
    probes: DataFrame,
    hashed: str | Column,
    depth: int = 4,
    width: int = 8192,
    keys: Sequence[str] = (),
    out_col: str = "maybe_member",
) -> DataFrame:
    """Membership probe: true iff EVERY one of the probe's depth
    positions is set (possibly-member — false positives only, never
    false negatives). The sketch side broadcasts (<= depth x width
    rows per key group); the probe frame never shuffles beyond its
    own per-row aggregation."""
    from .joins import dim_broadcast

    h = F.col(hashed) if isinstance(hashed, str) else hashed
    cols = list(probes.columns)
    p = probes.select(
        *cols, F.explode(_cms_rowpos(h, depth, width)).alias("__rp")
    ).select(
        *cols,
        F.col("__rp.cms_row").alias("cms_row"),
        F.col("__rp.cms_pos").alias("cms_pos"),
    )
    marked = p.join(
        dim_broadcast(states.withColumn("__set", F.lit(1))),
        [*keys, "cms_row", "cms_pos"],
        "left",
    )
    return marked.groupBy(*cols).agg(
        (F.count(F.lit(1)) == F.sum(F.coalesce(F.col("__set"), F.lit(0))))
        .alias(out_col)
    )
