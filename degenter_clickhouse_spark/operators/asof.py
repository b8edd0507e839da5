"""As-of and range joins — time-series join operators Spark lacks as
built-ins, expressed as compositions of existing DataFrame ops (no
UDFs, no mapPartitions).

As-of join (``asof_join``): for each left row, the single right row
with the greatest right-time <= left-time (backward; forward mirrors).
The naive formulation is a theta self-join (quadratic per key) or a
per-key collect; both die at scale. The shape here is the classic
union-and-carry:

1. tag both inputs and union them — map-only;
2. ONE shuffle on the key for a window ordered by (time, side) where
   right rows sort before left rows at equal timestamps (ASOF's
   ``<=``), carrying ``last(right_payload, ignorenulls)``;
3. keep the left rows — each now holds the most recent right payload.

Cost is one shuffle + one per-key sort, identical to any keyed window;
no row multiplication at any point. Skewed keys behave exactly like
any skewed window partition (salt upstream if one key dominates).

Range join (``range_join``): pair left INTERVALS [start, end) with
right POINTS inside them. The naive theta join compares every
left x right row per key. Bucketizing makes it an equi-join: the left
interval explodes to the fixed-width buckets it covers, the right
point maps to exactly ONE bucket, and the (key, bucket) equi-join +
residual range filter finds every pair exactly once — no dedup step,
because a point lives in a single bucket. The explode factor is
interval_span/bucket_width, the knob that trades row multiplication
against join selectivity.

DuckDB has native ASOF JOIN, so the extended-registry queries
(queries/joins_ext.py) hash-check both operators against it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _is_timestamp(df: DataFrame, col: str) -> bool:
    return dict(df.dtypes)[col].startswith("timestamp")


def _micros(col: str | F.Column) -> F.Column:
    """Epoch micros of a TIMESTAMP or TIMESTAMP_NTZ column (the
    testdata has shipped both across regenerations). The NTZ->TZ cast
    applies the session zone, which cancels in every difference/bucket
    computed here."""
    name = col if isinstance(col, str) else None
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp")) if name is None else F.expr(
        f"unix_micros(CAST({name} AS TIMESTAMP))"
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row, plus the right row nearest in
    time on the match side (backward: greatest right ``on`` <= left
    ``on``; forward: smallest right ``on`` >= left ``on``), equal keys
    in ``by`` required. No match -> nulls (left outer semantics).

    ``right_cols`` defaults to every right column except ``by``/``on``.
    The matched right time is emitted as ``{on}{suffix}``; matched
    value columns keep their names unless they collide with a left
    column, in which case they get ``suffix``. ``tolerance`` (seconds
    for timestamp ``on``, same units as ``on`` otherwise) nulls out
    matches farther than the bound.

    Duplicate right rows at the same (by, on) are resolved
    deterministically: the row with the greatest payload struct wins
    (documented tie rule, applied identically in the oracle).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*by, on)]
    right_cols = list(right_cols)

    # No pre-dedup aggregation: equal-(by, on) right rows are resolved
    # INSIDE the window sort instead — right rows at the same time sort
    # by payload struct ascending, so the cumulative last() naturally
    # carries the greatest payload (the documented tie rule) and the
    # whole operator costs exactly ONE shuffle (the window's).
    r1 = right.select(
        *by, F.col(on), F.struct(*[F.col(c) for c in right_cols]).alias("__p")
    )
    payload_t = r1.schema["__p"].dataType
    l_tag = (
        left.withColumn("__side", F.lit(1))
        .withColumn("__p", F.lit(None).cast(payload_t))
        .withColumn("__rt", F.lit(None).cast(dict(right.dtypes)[on]))
    )
    r_tag = r1.select(
        *by,
        F.col(on),
        F.lit(0).alias("__side"),
        F.col("__p"),
        F.col(on).alias("__rt"),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes if c not in (*by, on)],
    )
    u = l_tag.unionByName(r_tag, allowMissingColumns=False)

    time_ord = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    ord_cols = [time_ord, F.col("__side").asc(), F.col("__p").asc()]
    w = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy(*ord_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn("__mp", F.last("__p", ignorenulls=True).over(w)).withColumn(
        "__mt", F.last("__rt", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 1)

    if tolerance is not None:
        if _is_timestamp(left, on):
            gap = F.abs(
                _micros(F.col(on)) - _micros(F.col("__mt"))
            ) / F.lit(1e6)
        else:
            gap = F.abs(F.col(on) - F.col("__mt"))
        ok = F.col("__mt").isNotNull() & (gap <= F.lit(float(tolerance)))
        out = out.withColumn("__mp", F.when(ok, F.col("__mp"))).withColumn(
            "__mt", F.when(ok, F.col("__mt"))
        )

    taken = set(left.columns)
    sel = [F.col(c) for c in left.columns]
    for c in right_cols:
        name = c if c not in taken else f"{c}{suffix}"
        sel.append(F.col("__mp")[c].alias(name))
    sel.append(F.col("__mt").alias(f"{on}{suffix}"))
    return out.select(*sel)


def range_join(
    left: DataFrame,
    right: DataFrame,
    start: str,
    end: str,
    point: str,
    by: Sequence[str] = (),
    bucket_width: float = 3600.0,
) -> DataFrame:
    """Inner join of left intervals [start, end) with right points
    inside them (equal ``by`` keys required), via bucketized equi-join.

    ``bucket_width`` is in seconds for timestamp columns, else in the
    column's own units. Each left interval explodes to the buckets it
    covers; each right point hits exactly one bucket, so the equi-join
    plus the residual ``start <= point < end`` filter produces every
    qualifying pair exactly once with no dedup. Pick ``bucket_width``
    near the typical interval span: explode factor ~= span/width + 1.
    """
    by = list(by)

    def to_num(df: DataFrame, c: str) -> F.Column:
        if _is_timestamp(df, c):
            return _micros(F.col(c)) / F.lit(1e6)
        return F.col(c).cast("double")

    wlit = F.lit(float(bucket_width))
    l_b0 = F.floor(to_num(left, start) / wlit)
    # end is exclusive: an interval ending exactly on a bucket edge
    # does not cover that bucket
    l_b1 = F.floor(
        (to_num(left, end) - F.lit(1e-9)) / wlit
    )
    lx = left.withColumn(
        "__bucket", F.explode(F.sequence(l_b0.cast("long"), l_b1.cast("long")))
    )
    rx = right.withColumn("__bucket", F.floor(to_num(right, point) / wlit).cast("long"))

    keys = ["__bucket", *by]
    joined = lx.join(rx, keys)
    return joined.filter(
        (F.col(start) <= F.col(point)) & (F.col(point) < F.col(end))
    ).drop("__bucket")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_span: tuple[str, str],
    right_span: tuple[str, str],
    by: Sequence[str] = (),
    bucket_width: float = 3600.0,
    suffix: str = "_r",
) -> DataFrame:
    """Inner join of left intervals [ls, le) with right intervals
    [rs, re) whose INTERSECTION IS NON-EMPTY
    (``greatest(ls, rs) < least(le, re)``; equal ``by`` keys
    required) — the interval-interval sibling of ``range_join``.

    Note this is strictly stronger than the raw theta shorthand
    ``ls < re AND rs < le``: the shorthand admits a zero-length
    interval strictly inside another even though their intersection
    is empty. This operator rejects every empty interval up front
    (``end <= start`` rows match nothing), which makes the two
    predicates equivalent on the rows that remain.

    Both sides explode to the fixed-width buckets their interval
    covers; the (key, bucket) equi-join finds every overlapping pair
    in each shared bucket, and the pair is kept ONLY in the bucket
    containing the overlap's start (``greatest(ls, rs)`` — which both
    intervals cover whenever they overlap), so every qualifying pair
    surfaces exactly once with no dedup shuffle. Explode factor is
    span/bucket_width per side — pick ``bucket_width`` near the
    typical interval span.

    Right columns whose names collide with left ones (and are not
    ``by`` keys) come back suffixed with ``suffix`` — self-joins work
    unmodified. Empty/negative intervals (``end <= start``) match
    nothing, per half-open semantics.

    Bucketing runs in INTEGER microseconds (ADVICE r7): the end bucket
    is ``floor((end_us - 1) / width_us)``, so an interval ending
    exactly on a bucket boundary does NOT explode into that bucket —
    a float-epsilon subtraction can't do this at epoch magnitudes
    (double ulp near 1.7e9 s is ~2.4e-7, swallowing any 1e-9 nudge).
    """
    by = list(by)
    w_us = int(round(float(bucket_width) * 1e6))
    if w_us <= 0:
        raise ValueError(f"bucket_width too small: {bucket_width}")

    def to_us(df: DataFrame, c: str) -> F.Column:
        if _is_timestamp(df, c):
            return _micros(F.col(c))
        return F.round(F.col(c).cast("double") * F.lit(1e6)).cast("long")

    def fdiv(col: F.Column) -> F.Column:
        # exact floor-division of integer micros by w_us (pmod keeps
        # it correct for negative spans; the quotient is an exact
        # double because the numerator is a multiple of w_us)
        return ((col - F.pmod(col, F.lit(w_us))) / F.lit(w_us)).cast("long")

    ls, le = left_span
    rs, re_ = right_span

    lx = (
        left.withColumn("__ls", to_us(left, ls))
        .withColumn("__le", to_us(left, le))
        .filter(F.col("__le") > F.col("__ls"))
    )
    rx = (
        right.withColumn("__rs", to_us(right, rs))
        .withColumn("__re", to_us(right, re_))
        .filter(F.col("__re") > F.col("__rs"))
    )
    for c in right.columns:
        if c in left.columns and c not in by:
            rx = rx.withColumnRenamed(c, c + suffix)

    lx = lx.withColumn(
        "__bucket",
        F.explode(
            F.sequence(fdiv(F.col("__ls")), fdiv(F.col("__le") - F.lit(1)))
        ),
    )
    rx = rx.withColumn(
        "__bucket",
        F.explode(
            F.sequence(fdiv(F.col("__rs")), fdiv(F.col("__re") - F.lit(1)))
        ),
    )
    joined = lx.join(rx, ["__bucket", *by])
    out = joined.filter(
        (F.col("__ls") < F.col("__re"))
        & (F.col("__rs") < F.col("__le"))
        & (F.col("__bucket") == fdiv(F.greatest("__ls", "__rs")))
    )
    return out.drop("__bucket", "__ls", "__le", "__rs", "__re")
