"""EXTENDED-registry corpus-statistics queries: per-source quality
report (the domain/source-level filtering step of a training-data
pipeline — flag whole sources whose aggregate signals fall below
thresholds, as CCNet/RefinedWeb do per-domain) and an exact
token-length histogram (the corpus profile that drives context-length
and packing-budget choices).

Both are single-aggregation plans with map-side partials: the shuffle
carries sources x metrics (resp. buckets) rows regardless of corpus
size. DECIMAL accumulation keeps every double bit-identical across
engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register_extended
from ..operators.joins import dim_broadcast
from .llm import _docs

MIN_MEAN_TOKENS = 45.0
MAX_SHORT_SHARE = 0.25
SHORT_TOKENS = 40
BUCKET_W = 16

SOURCE_QUALITY_ORACLE = f"""
WITH base AS (
  SELECT source, lang, len(string_split(text, ' ')) AS toks, n_chars
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(CAST(toks AS DECIMAL(38,0))) AS DOUBLE) / count(*), 6)
         AS mean_tokens,
       round(CAST(sum(CAST(n_chars AS DECIMAL(38,0))) AS DOUBLE) / count(*), 6)
         AS mean_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       round(CAST(sum(CASE WHEN toks < {SHORT_TOKENS} THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS short_share,
       (round(CAST(sum(CAST(toks AS DECIMAL(38,0))) AS DOUBLE) / count(*), 6)
          < {MIN_MEAN_TOKENS}
        OR round(CAST(sum(CASE WHEN toks < {SHORT_TOKENS} THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) > {MAX_SHORT_SHARE})
         AS blocked
FROM base GROUP BY source
"""


@register_extended("source_quality_report", SOURCE_QUALITY_ORACLE)
def q_source_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.size(F.split(F.col("text"), " ")).alias("toks")
    base = d.select("source", "lang", toks, "n_chars")
    mean_tokens = F.round(
        F.sum(F.col("toks").cast("decimal(38,0)")).cast("double")
        / F.count(F.lit(1)),
        6,
    )
    short_share = F.round(
        F.sum(F.when(F.col("toks") < SHORT_TOKENS, 1).otherwise(0)).cast("double")
        / F.count(F.lit(1)),
        6,
    )
    return base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        mean_tokens.alias("mean_tokens"),
        F.round(
            F.sum(F.col("n_chars").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_chars"),
        F.countDistinct("lang").alias("n_langs"),
        short_share.alias("short_share"),
        (
            (mean_tokens < F.lit(MIN_MEAN_TOKENS))
            | (short_share > F.lit(MAX_SHORT_SHARE))
        ).alias("blocked"),
    )


QUANTILE_ORACLE = """
WITH doc_q AS (
  SELECT 'doc_chars' AS part, source AS key,
         CAST(count(*) AS BIGINT) AS n,
         quantile_cont(n_chars, 0.25) AS p25,
         quantile_cont(n_chars, 0.5)  AS p50,
         quantile_cont(n_chars, 0.75) AS p75,
         quantile_cont(n_chars, 0.95) AS p95
  FROM documents GROUP BY source
),
ev_q AS (
  SELECT 'event_value' AS part, event_type AS key,
         CAST(count(*) AS BIGINT) AS n,
         quantile_cont(value, 0.25) AS p25,
         quantile_cont(value, 0.5)  AS p50,
         quantile_cont(value, 0.75) AS p75,
         quantile_cont(value, 0.95) AS p95
  FROM events GROUP BY event_type
)
SELECT * FROM doc_q UNION ALL SELECT * FROM ev_q
"""


def _pcts(col: str):
    return [
        F.percentile(F.col(col), p).alias(a)
        for p, a in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.95, "p95")]
    ]


@register_extended("quantile_summary", QUANTILE_ORACLE)
def q_quantile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantile family (ClickHouse ``quantileExact*`` analogue).

    Spark's ``percentile`` aggregate and DuckDB's ``quantile_cont``
    share the linear-interpolation definition ``lower + frac * (upper -
    lower)`` over the sorted group, so the doubles match bit-for-bit —
    no rounding shim needed (verified on both the integer ``n_chars``
    and the double ``events.value`` inputs). Two grouped aggregations
    over dimension-sized key sets, unioned with a part tag.

    Scale note: exact percentiles sort each group's values inside one
    aggregation buffer — fine for dimension-sized groups (sources,
    event types). For billion-row groups the sketch path is
    ``approx_percentile`` (t-digest-style, mergeable, map-side
    partials); its error bound vs this exact op is pytest-checked in
    ``test_approx_percentile_within_accuracy``.
    """
    from .. import catalog

    d = _docs(spark, sf_dir)
    doc_q = d.groupBy(F.col("source").alias("key")).agg(
        F.count(F.lit(1)).alias("n"), *_pcts("n_chars")
    )
    ev = catalog.load_table(spark, sf_dir, "events")
    ev_q = ev.groupBy(F.col("event_type").alias("key")).agg(
        F.count(F.lit(1)).alias("n"), *_pcts("value")
    )
    cols = ["part", "key", "n", "p25", "p50", "p75", "p95"]
    return (
        doc_q.select(F.lit("doc_chars").alias("part"), "*")
        .select(*cols)
        .unionAll(ev_q.select(F.lit("event_value").alias("part"), "*").select(*cols))
    )


LENGTH_HISTOGRAM_ORACLE = f"""
WITH base AS (
  SELECT len(string_split(text, ' ')) AS toks FROM documents
),
tot AS (SELECT count(*) AS n FROM base)
SELECT CAST((toks // {BUCKET_W}) * {BUCKET_W} AS BIGINT) AS bucket_lo,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(toks) AS BIGINT) AS min_tokens,
       CAST(max(toks) AS BIGINT) AS max_tokens,
       round(CAST(count(*) AS DOUBLE) / any_value(tot.n), 6) AS share
FROM base CROSS JOIN tot
GROUP BY 1
"""


@register_extended("length_histogram", LENGTH_HISTOGRAM_ORACLE)
def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    base = d.select(F.size(F.split(F.col("text"), " ")).alias("toks"))
    tot = base.agg(F.count(F.lit(1)).alias("n"))
    return (
        base.crossJoin(F.broadcast(tot))
        .groupBy(
            (F.floor(F.col("toks") / BUCKET_W) * BUCKET_W)
            .cast("long")
            .alias("bucket_lo")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("toks").cast("long").alias("min_tokens"),
            F.max("toks").cast("long").alias("max_tokens"),
            F.round(F.count(F.lit(1)).cast("double") / F.first("n"), 6).alias(
                "share"
            ),
        )
    )


ROLLUP_ORACLE = """
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(CAST(CAST(ts AS DATE) AS VARCHAR), 'ALL') AS bucket_day,
       CAST(GROUPING(event_type) AS INT) AS g_type,
       CAST(GROUPING(CAST(ts AS DATE)) AS INT) AS g_day,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS volume
FROM events
GROUP BY ROLLUP(event_type, CAST(ts AS DATE))
"""


@register_extended("rollup_totals", ROLLUP_ORACLE)
def q_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with subtotal + grand-total rows (the ClickHouse
    ``GROUP BY ... WITH ROLLUP`` / ``WITH TOTALS`` modifier family).

    Spark's ``rollup`` relation expands to grouping sets inside ONE
    aggregation (each input row expands to its grouping-set variants
    map-side, partial aggregation intact — no per-level re-scan).
    ``grouping()`` flags distinguish a real NULL key from a subtotal
    row; the displayed keys coalesce to 'ALL' like the reference UI's
    totals row. DECIMAL-accumulated volume keeps the three aggregation
    levels bit-identical across engines.
    """
    from .. import catalog

    t = catalog.ticks(spark, sf_dir)
    base = t.select(
        "event_type", F.to_date("ts").alias("__day"), F.col("price")
    )
    return (
        base.rollup("event_type", "__day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("price").cast("decimal(25,6)")).cast("double").alias("volume"),
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("__day").cast("int").alias("g_day"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("__day").cast("string"), F.lit("ALL")).alias(
                "bucket_day"
            ),
            "g_type",
            "g_day",
            "n_events",
            "volume",
        )
    )


TWAP_VWAP_ORACLE = """
WITH ticks AS (
  SELECT user_id AS pool_id, value AS price, event_id, ts FROM events
),
dt AS (
  SELECT pool_id, price,
         lead(epoch_us(ts)) OVER (PARTITION BY pool_id
                                  ORDER BY ts, event_id) - epoch_us(ts)
           AS dt_us
  FROM ticks
),
twap AS (
  SELECT 'twap' AS part, CAST(pool_id AS VARCHAR) AS key,
         round(CAST(SUM(CAST(price * dt_us AS DECIMAL(38,6))) AS DOUBLE)
               / SUM(dt_us), 6) AS wavg,
         CAST(count(*) AS BIGINT) AS n
  FROM dt WHERE dt_us IS NOT NULL GROUP BY pool_id
),
vwap AS (
  SELECT 'vwap' AS part, l_returnflag || '/' || l_linestatus AS key,
         round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)
               / CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE), 6)
           AS wavg,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1, 2
)
SELECT * FROM twap UNION ALL SELECT * FROM vwap
"""


@register_extended("twap_vwap", TWAP_VWAP_ORACLE)
def q_twap_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted and volume-weighted average price (the TWAP/VWAP
    pair every price-oracle and execution-quality report needs;
    ClickHouse ``avgWeighted`` family).

    TWAP: each tick's price weighted by microseconds until the pool's
    next tick (lag-free ``lead`` over a per-pool window — never a
    global window), last tick excluded (no forward duration). VWAP:
    plain weighted mean over the fact table, one aggregation with
    map-side partials. Products are IEEE pointwise; the reductions run
    through DECIMAL so both engines and any partitioning agree bitwise.
    """
    from pyspark.sql.window import Window

    from .. import catalog

    t = catalog.ticks(spark, sf_dir)
    w = Window.partitionBy("pool_id").orderBy("ts", "event_id")
    # events.ts can arrive TIMESTAMP_NTZ (testdata vintage); the cast to
    # TIMESTAMP is exact under the UTC session and matches DuckDB's
    # epoch_us on the naive value
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    dt = t.select(
        "pool_id",
        "price",
        (F.lead(us).over(w) - us).alias("dt_us"),
    ).where(F.col("dt_us").isNotNull())
    twap = dt.groupBy(F.col("pool_id").cast("string").alias("key")).agg(
        F.round(
            F.sum((F.col("price") * F.col("dt_us")).cast("decimal(38,6)")).cast(
                "double"
            )
            / F.sum("dt_us"),
            6,
        ).alias("wavg"),
        F.count(F.lit(1)).alias("n"),
    )
    li = catalog.load_table(spark, sf_dir, "lineitem")
    vwap = li.groupBy(
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("key")
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(25,6)")).cast("double")
            / F.sum(F.col("l_quantity").cast("decimal(25,6)")).cast("double"),
            6,
        ).alias("wavg"),
        F.count(F.lit(1)).alias("n"),
    )
    cols = ["part", "key", "wavg", "n"]
    return (
        twap.select(F.lit("twap").alias("part"), "*")
        .select(*cols)
        .unionAll(vwap.select(F.lit("vwap").alias("part"), "*").select(*cols))
    )


FUNNEL_DAYS = 7

WINDOW_FUNNEL_ORACLE = f"""
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN t1 USING (user_id)
  WHERE e.event_type = 'view' AND e.ts > t1.t1
    AND e.ts <= t1.t1 + INTERVAL {FUNNEL_DAYS} DAY
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN t1 USING (user_id) JOIN t2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > t2.t2
    AND e.ts <= t1.t1 + INTERVAL {FUNNEL_DAYS} DAY
  GROUP BY e.user_id
)
SELECT t1.user_id,
       CAST(CASE WHEN t3.t3 IS NOT NULL THEN 3
                 WHEN t2.t2 IS NOT NULL THEN 2
                 ELSE 1 END AS INT) AS level,
       CAST(floor(epoch(t1.t1)) AS BIGINT) AS entered_ts
FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
"""


@register_extended("window_funnel", WINDOW_FUNNEL_ORACLE)
def q_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-conversion funnel (ClickHouse ``windowFunnel``):
    deepest signup -> view -> purchase chain, strictly time-ordered,
    completed within {FUNNEL_DAYS} days of the user's FIRST signup.

    Relational formulation instead of ClickHouse's per-user state
    machine: one conditional-min aggregation per funnel step, each
    joined back on the (dimension-sized) user key — steps are
    broadcast joins over one fact scan each, map-side partials intact,
    no per-user event sorting and no window function at all. Depth-k
    funnels are k passes over the (filtered) fact table; each pass
    prunes to one event type at the scan.
    """
    from .. import catalog

    ev = catalog.load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    t1 = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    limit = F.col("t1") + F.expr(f"INTERVAL {FUNNEL_DAYS} DAYS")
    t2 = (
        ev.where(F.col("event_type") == "view")
        .join(dim_broadcast(t1), "user_id")
        .where((F.col("ts") > F.col("t1")) & (F.col("ts") <= limit))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(dim_broadcast(t1), "user_id")
        .join(dim_broadcast(t2), "user_id")
        .where((F.col("ts") > F.col("t2")) & (F.col("ts") <= limit))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .otherwise(1)
            .cast("int")
            .alias("level"),
            F.unix_timestamp(F.col("t1").cast("timestamp")).alias("entered_ts"),
        )
    )


RETENTION_ORACLE = """
WITH first_seen AS (
  SELECT user_id, min(ts) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
flags AS (
  SELECT f.user_id, CAST(f.t0 AS DATE) AS cohort_day,
         max(CASE WHEN e.ts > f.t0 AND e.ts <= f.t0 + INTERVAL 1 DAY
                  THEN 1 ELSE 0 END) AS r1,
         max(CASE WHEN e.ts > f.t0 AND e.ts <= f.t0 + INTERVAL 7 DAY
                  THEN 1 ELSE 0 END) AS r7,
         max(CASE WHEN e.ts > f.t0 AND e.ts <= f.t0 + INTERVAL 14 DAY
                  THEN 1 ELSE 0 END) AS r14
  FROM first_seen f LEFT JOIN events e USING (user_id)
  GROUP BY f.user_id, CAST(f.t0 AS DATE)
)
SELECT CAST(CAST(cohort_day AS VARCHAR) AS VARCHAR) AS cohort_day,
       CAST(count(*) AS BIGINT) AS cohort_users,
       CAST(SUM(r1) AS BIGINT) AS d1,
       CAST(SUM(r7) AS BIGINT) AS d7,
       CAST(SUM(r14) AS BIGINT) AS d14,
       round(CAST(SUM(r7) AS DOUBLE) / count(*), 6) AS d7_rate
FROM flags GROUP BY cohort_day
"""


@register_extended("retention_cohorts", RETENTION_ORACLE)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (ClickHouse ``retention`` aggregate): per
    first-signup-day cohort, how many users act again within 1/7/14
    days. One conditional-flag aggregation per user (first_seen is a
    dimension-sized broadcast into the fact join), then a cohort-day
    rollup — two aggregations with map-side partials, no windows.
    """
    from .. import catalog

    ev = catalog.load_table(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = (
        catalog.load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )

    def within(days):
        return F.max(
            F.when(
                (F.col("ts") > F.col("t0"))
                & (F.col("ts") <= F.col("t0") + F.expr(f"INTERVAL {days} DAYS")),
                1,
            ).otherwise(0)
        )

    flags = (
        dim_broadcast(first_seen)
        .join(ev, "user_id", "left")
        .groupBy("user_id", F.col("t0").cast("date").alias("cohort_day"))
        .agg(within(1).alias("r1"), within(7).alias("r7"), within(14).alias("r14"))
    )
    return flags.groupBy(F.col("cohort_day").cast("string").alias("cohort_day")).agg(
        F.count(F.lit(1)).alias("cohort_users"),
        F.sum("r1").alias("d1"),
        F.sum("r7").alias("d7"),
        F.sum("r14").alias("d14"),
        F.round(F.sum("r7").cast("double") / F.count(F.lit(1)), 6).alias("d7_rate"),
    )


MOVING_STATS_ORACLE = """
WITH bars AS (
  SELECT user_id AS pool_id,
         CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket_ts,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS vol,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT pool_id, bucket_ts, vol,
       round(CAST(SUM(CAST(vol AS DECIMAL(25,6)))
                    OVER w AS DOUBLE) / COUNT(*) OVER w, 6) AS sma5,
       CAST(MAX(vol) OVER w AS DOUBLE) AS hi5,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_window
FROM bars
WINDOW w AS (PARTITION BY pool_id ORDER BY bucket_ts
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""


@register_extended("moving_stats", MOVING_STATS_ORACLE)
def q_moving_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-frame rolling aggregates (ClickHouse
    ``groupArrayMovingAvg``/``WINDOW ... ROWS BETWEEN`` family): per
    pool, hourly volume bars with a 5-bar moving average and rolling
    high.

    Every window PARTITIONs BY pool — one shuffle on the pool key,
    then per-key sorted frames; never a global window. The moving
    average is SUM/COUNT with DECIMAL accumulation (identical frame
    contents in both engines because the ROWS frame over the unique
    (pool, bucket) key is deterministic).
    """
    from pyspark.sql.window import Window

    from .. import catalog

    t = catalog.ticks(spark, sf_dir)
    bars = t.groupBy(
        "pool_id",
        (F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / 3600) * 3600)
        .cast("long")
        .alias("bucket_ts"),
    ).agg(
        F.sum(F.col("price").cast("decimal(25,6)")).cast("double").alias("vol"),
        F.count(F.lit(1)).alias("n"),
    )
    w = (
        Window.partitionBy("pool_id")
        .orderBy("bucket_ts")
        .rowsBetween(-4, Window.currentRow)
    )
    return bars.select(
        "pool_id",
        "bucket_ts",
        "vol",
        F.round(
            F.sum(F.col("vol").cast("decimal(25,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            6,
        ).alias("sma5"),
        F.max("vol").over(w).cast("double").alias("hi5"),
        F.count(F.lit(1)).over(w).alias("n_window"),
    )


EMA_ALPHA = 0.25  # exactly representable in binary: bit-stable fold

EMA_ORACLE = f"""
WITH RECURSIVE bars AS (
  SELECT user_id AS pool_id,
         CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket_ts,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS vol
  FROM events GROUP BY 1, 2
),
numbered AS (
  SELECT pool_id, bucket_ts, vol,
         row_number() OVER (PARTITION BY pool_id ORDER BY bucket_ts) AS rn
  FROM bars
),
ema AS (
  SELECT pool_id, bucket_ts, vol, rn, vol AS ema FROM numbered WHERE rn = 1
  UNION ALL
  SELECT n.pool_id, n.bucket_ts, n.vol, n.rn,
         {EMA_ALPHA} * n.vol + (1 - {EMA_ALPHA}) * e.ema
  FROM numbered n JOIN ema e
    ON n.pool_id = e.pool_id AND n.rn = e.rn + 1
)
SELECT pool_id, bucket_ts, vol, ema FROM ema
"""


@register_extended("ema_bars", EMA_ORACLE)
def q_ema_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential moving average (ClickHouse
    ``exponentialMovingAverage``) — an inherently SEQUENTIAL recurrence
    (ema_i = a*x_i + (1-a)*ema_{i-1}) with no windowed-SQL form.

    Spark expression: each pool's bars collect into one sorted array
    and ``aggregate()`` folds the recurrence left-to-right — pure
    column expressions, no UDF; the shuffle is one groupBy on the pool
    key and the fold is map-side. The per-key series must fit an array
    cell, which matches the serving-layer regime (the reference caps
    chart series at 5000 bars); unbounded-history EMA belongs to the
    streaming path (`streaming/stateful.py`'s carried state pattern).
    The oracle is a recursive CTE computing the same double recurrence
    — both engines evaluate a*x + (1-a)*s in IEEE doubles, so the raw
    doubles match bit-for-bit (no rounding shim: round() itself is the
    one operation whose implementation differs between the engines at
    representation boundaries).
    """
    from .. import catalog

    t = catalog.ticks(spark, sf_dir)
    bars = t.groupBy(
        "pool_id",
        (F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / 3600) * 3600)
        .cast("long")
        .alias("bucket_ts"),
    ).agg(F.sum(F.col("price").cast("decimal(25,6)")).cast("double").alias("vol"))
    series = bars.groupBy("pool_id").agg(
        F.array_sort(F.collect_list(F.struct("bucket_ts", "vol"))).alias("s")
    )
    a = float(EMA_ALPHA)
    folded = series.select(
        "pool_id",
        F.aggregate(
            "s",
            F.expr("CAST(array() AS ARRAY<STRUCT<bucket_ts: BIGINT, vol: DOUBLE, ema: DOUBLE>>)"),
            lambda acc, x: F.concat(
                acc,
                F.array(
                    F.struct(
                        x["bucket_ts"].alias("bucket_ts"),
                        x["vol"].alias("vol"),
                        F.when(
                            F.size(acc) == 0, x["vol"]
                        )
                        .otherwise(
                            F.lit(a) * x["vol"]
                            + F.lit(1.0 - a)
                            * F.element_at(acc, -1)["ema"]
                        )
                        .alias("ema"),
                    )
                ),
            ),
        ).alias("out"),
    )
    return folded.select("pool_id", F.explode("out").alias("o")).select(
        "pool_id",
        F.col("o.bucket_ts").alias("bucket_ts"),
        F.col("o.vol").alias("vol"),
        F.col("o.ema").alias("ema"),
    )


# ---------------------------------------------------------------------------
# Rolling z-score anomaly detection (alerts-family extension): flag
# event values whose squared deviation from the trailing-window mean
# exceeds 9x the window variance (|z| > 3), ENTIRELY in integer
# arithmetic — z^2 > 9 rewrites as (n*x - s)^2 > 9*(n*ss - s^2) over
# integer-scaled values, so no float division/sqrt and the flag is
# bit-identical across engines and shuffle orders. Window magnitudes:
# values <= ~1e3 scale to <= 1e7 at 1e4; with n <= 20 every
# intermediate stays far inside int64.
# ---------------------------------------------------------------------------

ANOMALY_W = 20
ANOMALY_MIN_N = 10

ANOMALY_ORACLE = f"""
WITH v AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 1e4) AS BIGINT) AS x
  FROM events
),
w AS (
  SELECT event_id, user_id, x,
         COUNT(*) OVER win AS n,
         CAST(COALESCE(SUM(x) OVER win, 0) AS BIGINT) AS s,
         CAST(COALESCE(SUM(x * x) OVER win, 0) AS BIGINT) AS ss
  FROM v
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN {ANOMALY_W} PRECEDING AND 1 PRECEDING)
)
SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
       CAST(n AS BIGINT) AS n_window,
       (n * x - s) * (n * x - s) AS dev2_num,
       9 * (n * ss - s * s) AS var9_num,
       n >= {ANOMALY_MIN_N}
         AND (n * x - s) * (n * x - s) > 9 * (n * ss - s * s)
         AS is_anomaly
FROM w
"""


@register_extended("value_anomalies", ANOMALY_ORACLE)
def q_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .. import catalog

    ev = catalog.load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.expr("CAST(round(value * 1e4) AS BIGINT)").alias("x"),
    )
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ANOMALY_W, -1)
    )
    w = v.select(
        "event_id",
        "user_id",
        "x",
        F.count(F.lit(1)).over(win).alias("n"),
        F.coalesce(F.sum("x").over(win), F.lit(0)).cast("long").alias("s"),
        F.coalesce(F.sum(F.col("x") * F.col("x")).over(win), F.lit(0))
        .cast("long")
        .alias("ss"),
    )
    dev = F.col("n") * F.col("x") - F.col("s")
    var9 = F.lit(9) * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
    return w.select(
        "event_id",
        F.col("user_id").cast("long").alias("user_id"),
        F.col("n").cast("long").alias("n_window"),
        (dev * dev).alias("dev2_num"),
        var9.alias("var9_num"),
        ((F.col("n") >= ANOMALY_MIN_N) & (dev * dev > var9)).alias(
            "is_anomaly"
        ),
    )


# ---------------------------------------------------------------------------
# Robust statistics: median + MAD (median absolute deviation) per
# event_type — the outlier-resistant location/spread pair (ClickHouse
# quantileExact composition). Both engines share the percentile
# interpolation definition (see quantile_summary), and |x - med| is
# pointwise double math, so the result is bit-exact. Two grouped
# aggregations + one broadcast join of the dimension-sized medians.
# ---------------------------------------------------------------------------

ROBUST_ORACLE = """
WITH m AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
d AS (
  SELECT e.event_type, m.med, abs(e.value - m.med) AS adev
  FROM events e JOIN m ON e.event_type = m.event_type
)
SELECT event_type, med, quantile_cont(adev, 0.5) AS mad,
       CAST(COUNT(*) AS BIGINT) AS n
FROM d GROUP BY event_type, med
"""


@register_extended("robust_stats", ROBUST_ORACLE)
def q_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import catalog

    ev = catalog.load_table(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(
        F.percentile(F.col("value"), 0.5).alias("med")
    )
    d = ev.join(dim_broadcast(m), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    return d.groupBy("event_type", "med").agg(
        F.percentile(F.col("adev"), 0.5).alias("mad"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# sequence_count — ClickHouse sequenceCount('(?1)(?2)(?3)') parity:
# per-user count of NON-OVERLAPPING view -> click -> purchase chains in
# strict time order (other events freely interleaved). Spark plan: step
# flags as flat column expressions, one groupBy(user) shuffle, greedy
# automaton folded over the time-sorted array (operators/seqmatch.py).
# Oracle: the SAME greedy automaton unrolled as a recursive CTE.
# ---------------------------------------------------------------------------

SEQUENCE_COUNT_ORACLE = """
WITH RECURSIVE ev AS (
  SELECT user_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS INT) AS rn,
         CAST(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
              WHEN 'purchase' THEN 4 ELSE 0 END AS INT) AS m
  FROM events
),
tot AS (
  SELECT user_id, CAST(count(*) AS INT) AS n_events FROM ev GROUP BY user_id
),
walk AS (
  SELECT user_id, 0 AS rn, 0 AS stage, 0 AS cnt FROM tot
  UNION ALL
  SELECT w.user_id, e.rn,
         CASE WHEN (e.m & (1 << w.stage)) <> 0
              THEN CASE WHEN w.stage = 2 THEN 0 ELSE w.stage + 1 END
              ELSE w.stage END,
         CASE WHEN (e.m & (1 << w.stage)) <> 0 AND w.stage = 2
              THEN w.cnt + 1 ELSE w.cnt END
  FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.rn = w.rn + 1
)
SELECT CAST(w.user_id AS BIGINT) AS user_id,
       CAST(w.cnt AS BIGINT) AS n_matches,
       CAST(t.n_events AS BIGINT) AS n_events
FROM walk w JOIN tot t ON t.user_id = w.user_id AND w.rn = t.n_events
"""


@register_extended("sequence_count", SEQUENCE_COUNT_ORACLE)
def q_sequence_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceCount``: non-overlapping behavioral chains
    per user — the conversion-loop counter the funnel (depth only)
    cannot express. One shuffle; fold is map-side; no UDF/window."""
    from .. import catalog
    from ..operators.seqmatch import sequence_count

    ev = catalog.load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    steps = [F.col("event_type") == t for t in ("view", "click", "purchase")]
    return sequence_count(ev, "user_id", "ts", steps, tiebreak="event_id")


# ---------------------------------------------------------------------------
# quantile_state_merge — ClickHouse quantileState/quantileMerge +
# AggregatingMergeTree parity (operators/skew.quantile_state/_merge):
# per-(event_type, day) fixed-range integer-histogram STATES merged
# across days into per-type p50/p95 estimates. The oracle computes the
# SAME histogram directly from raw rows — merged-from-daily must equal
# direct-global because states merge by integer addition.
# ---------------------------------------------------------------------------

QS_LO, QS_HI, QS_BINS = 0.0, 512.0, 128
_QS_W = (QS_HI - QS_LO) / QS_BINS


def _hist_quantile_oracle(q: float) -> str:
    return f"""
WITH h AS (
  SELECT event_type,
         greatest(0, least({QS_BINS - 1},
                 CAST(floor((value - {QS_LO}) / {_QS_W}) AS BIGINT))) AS bin,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
c AS (
  SELECT event_type, bin, cnt,
         CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS BIGINT)
           AS cum,
         CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n_total
  FROM h
),
r AS (
  SELECT *, greatest(CAST(1 AS BIGINT),
                     CAST(ceil({q} * n_total) AS BIGINT)) AS rk
  FROM c
)
SELECT event_type, n_total AS n,
       {QS_LO} + {_QS_W} * (bin + (rk - (cum - cnt)) / CAST(cnt AS DOUBLE))
         AS quantile_estimate
FROM r
WHERE cum >= rk
QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY bin) = 1
"""


QUANTILE_STATE_ORACLE = f"""
SELECT a.event_type, a.n, a.quantile_estimate AS p50_est,
       b.quantile_estimate AS p95_est
FROM ({_hist_quantile_oracle(0.5)}) a
JOIN ({_hist_quantile_oracle(0.95)}) b ON a.event_type = b.event_type
"""


@register_extended("quantile_state_merge", QUANTILE_STATE_ORACLE)
def q_quantile_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import catalog
    from ..operators.skew import quantile_merge, quantile_state

    ev = catalog.load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    states = quantile_state(
        ev, ["event_type", "day"], "value", QS_LO, QS_HI, QS_BINS
    )
    p50 = quantile_merge(states, ["event_type"], 0.5).withColumnRenamed(
        "quantile_estimate", "p50_est"
    )
    p95 = quantile_merge(states, ["event_type"], 0.95).select(
        "event_type", F.col("quantile_estimate").alias("p95_est")
    )
    return p50.join(dim_broadcast(p95), "event_type").select(
        "event_type", "n", "p50_est", "p95_est"
    )


# ---------------------------------------------------------------------------
# cube_totals — GROUP BY CUBE sibling of rollup_totals (ClickHouse
# ``WITH CUBE`` modifier): all four grouping sets, including the
# per-day-across-types subtotal ROLLUP cannot produce, in ONE
# aggregation with map-side partials.
# ---------------------------------------------------------------------------

CUBE_ORACLE = """
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(CAST(CAST(ts AS DATE) AS VARCHAR), 'ALL') AS bucket_day,
       CAST(GROUPING(event_type) AS INT) AS g_type,
       CAST(GROUPING(CAST(ts AS DATE)) AS INT) AS g_day,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS volume
FROM events
GROUP BY CUBE(event_type, CAST(ts AS DATE))
"""


@register_extended("cube_totals", CUBE_ORACLE)
def q_cube_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import catalog

    t = catalog.ticks(spark, sf_dir)
    base = t.select(
        "event_type", F.to_date("ts").alias("__day"), F.col("price")
    )
    return (
        base.cube("event_type", "__day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("price").cast("decimal(25,6)")).cast("double").alias("volume"),
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("__day").cast("int").alias("g_day"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("__day").cast("string"), F.lit("ALL")).alias(
                "bucket_day"
            ),
            "g_type",
            "g_day",
            "n_events",
            "volume",
        )
    )


# ---------------------------------------------------------------------------
# sequence_count_windowed — the time-gated pattern form (ClickHouse
# (?1)(?t<=W)(?2)... chains): same greedy automaton with an expiry —
# chains must complete within {SEQ_W_SECONDS}s of their first step; an
# expired chain only restarts on a step-1 event. Oracle: the windowed
# automaton unrolled as a recursive CTE (epoch-second doubles; only
# time DIFFERENCES enter the logic, so engine epoch offsets cancel).
# ---------------------------------------------------------------------------

SEQ_W_SECONDS = 172800  # 2 days

SEQUENCE_WINDOWED_ORACLE = f"""
WITH RECURSIVE ev AS (
  SELECT user_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS INT) AS rn,
         CAST(epoch(ts) AS DOUBLE) AS tn,
         CAST(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
              WHEN 'purchase' THEN 4 ELSE 0 END AS INT) AS m
  FROM events
),
tot AS (
  SELECT user_id, CAST(count(*) AS INT) AS n_events FROM ev GROUP BY user_id
),
walk AS (
  SELECT user_id, 0 AS rn, 0 AS stage, 0 AS cnt, CAST(0 AS DOUBLE) AS start
  FROM tot
  UNION ALL
  SELECT w.user_id, e.rn,
         CASE
           WHEN (e.m & (1 << w.stage)) <> 0
                AND (w.stage = 0 OR e.tn - w.start <= {SEQ_W_SECONDS})
             THEN CASE WHEN w.stage = 2 THEN 0 ELSE w.stage + 1 END
           WHEN NOT (w.stage = 0 OR e.tn - w.start <= {SEQ_W_SECONDS})
                AND (e.m & 1) <> 0
             THEN 1
           ELSE w.stage
         END,
         CASE
           WHEN (e.m & (1 << w.stage)) <> 0
                AND (w.stage = 0 OR e.tn - w.start <= {SEQ_W_SECONDS})
                AND w.stage = 2
             THEN w.cnt + 1
           ELSE w.cnt
         END,
         CASE
           WHEN (e.m & (1 << w.stage)) <> 0
                AND (w.stage = 0 OR e.tn - w.start <= {SEQ_W_SECONDS})
             THEN CASE WHEN w.stage = 2 THEN CAST(0 AS DOUBLE)
                       WHEN w.stage = 0 THEN e.tn ELSE w.start END
           WHEN NOT (w.stage = 0 OR e.tn - w.start <= {SEQ_W_SECONDS})
                AND (e.m & 1) <> 0
             THEN e.tn
           ELSE w.start
         END
  FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.rn = w.rn + 1
)
SELECT CAST(w.user_id AS BIGINT) AS user_id,
       CAST(w.cnt AS BIGINT) AS n_matches,
       CAST(t.n_events AS BIGINT) AS n_events
FROM walk w JOIN tot t ON t.user_id = w.user_id AND w.rn = t.n_events
"""


@register_extended("sequence_count_windowed", SEQUENCE_WINDOWED_ORACLE)
def q_sequence_count_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import catalog
    from ..operators.seqmatch import sequence_count

    ev = catalog.load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    steps = [F.col("event_type") == t for t in ("view", "click", "purchase")]
    return sequence_count(
        ev, "user_id", "ts", steps, tiebreak="event_id",
        within=float(SEQ_W_SECONDS),
    )


# ---------------------------------------------------------------------------
# winsorized_stats — outlier-robust means (the winsorize/trim step of
# metric pipelines): per event_type, the mean with values CLIPPED to
# [p05, p95] (winsorized) and the mean with values outside DROPPED
# (trimmed). Two dimension-sized aggregations + one broadcast join;
# shared percentile interpolation keeps the bounds bit-identical, and
# DECIMAL accumulation keeps both means shuffle-order independent.
# ---------------------------------------------------------------------------

WINSOR_ORACLE = """
WITH b AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS p05,
         quantile_cont(value, 0.95) AS p95
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(CAST(round(least(greatest(e.value, b.p05), b.p95) * 1e6)
                           AS BIGINT)) AS DOUBLE) / count(*) / 1e6, 6)
         AS winsor_mean,
       round(CAST(sum(CASE WHEN e.value BETWEEN b.p05 AND b.p95
                           THEN CAST(round(e.value * 1e6) AS BIGINT)
                           ELSE 0 END) AS DOUBLE)
             / sum(CASE WHEN e.value BETWEEN b.p05 AND b.p95 THEN 1 ELSE 0 END)
             / 1e6, 6) AS trimmed_mean,
       b.p05, b.p95
FROM events e JOIN b USING (event_type)
GROUP BY e.event_type, b.p05, b.p95
"""


@register_extended("winsorized_stats", WINSOR_ORACLE)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import catalog

    ev = catalog.load_table(spark, sf_dir, "events")
    b = ev.groupBy("event_type").agg(
        F.percentile(F.col("value"), 0.05).alias("p05"),
        F.percentile(F.col("value"), 0.95).alias("p95"),
    )
    j = ev.join(dim_broadcast(b), "event_type")
    clipped = F.round(
        F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95")) * 1e6
    ).cast("long")
    inside = F.col("value").between(F.col("p05"), F.col("p95"))
    scaled = F.round(F.col("value") * 1e6).cast("long")
    return j.groupBy("event_type", "p05", "p95").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(clipped.cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1)) / F.lit(1e6), 6,
        ).alias("winsor_mean"),
        F.round(
            F.sum(F.when(inside, scaled).otherwise(F.lit(0)).cast("decimal(38,0)"))
            .cast("double")
            / F.sum(F.when(inside, 1).otherwise(0))
            / F.lit(1e6), 6,
        ).alias("trimmed_mean"),
    ).select("event_type", "n", "winsor_mean", "trimmed_mean", "p05", "p95")


# ---------------------------------------------------------------------------
# Analytic rank-function family (ClickHouse window functions /
# rank-transform parity): rank, dense_rank, percent_rank, cume_dist
# over a TIES-bearing order (o_orderpriority has 5 distinct values, so
# peer groups are real), plus ntile + row_number over the fully
# tie-broken order (ntile depends on row order, so it must be total).
# Deterministic: rank-family values depend only on the peer multiset;
# percent_rank/cume_dist are IEEE divisions of the same small integers
# in both engines — bit-identical. Per-customer windows: the shuffle
# key is o_custkey, never a global sort.
# ---------------------------------------------------------------------------

RANK_FUNCTIONS_ORACLE = """
SELECT CAST(o_custkey AS BIGINT) AS custkey,
       CAST(o_orderkey AS BIGINT) AS orderkey,
       CAST(rank() OVER w1 AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w1 AS BIGINT) AS drnk,
       percent_rank() OVER w1 AS prank,
       cume_dist() OVER w1 AS cdist,
       CAST(ntile(4) OVER w2 AS BIGINT) AS tile,
       CAST(row_number() OVER w2 AS BIGINT) AS rn
FROM orders
WHERE o_custkey % 10 = 0
WINDOW w1 AS (PARTITION BY o_custkey ORDER BY o_orderpriority),
       w2 AS (PARTITION BY o_custkey ORDER BY o_orderpriority, o_orderkey)
"""


@register_extended("rank_functions", RANK_FUNCTIONS_ORACLE)
def q_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from .. import catalog

    o = catalog.load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % 10 == 0
    )
    w1 = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    w2 = Window.partitionBy("o_custkey").orderBy(
        "o_orderpriority", "o_orderkey"
    )
    return o.select(
        F.col("o_custkey").cast("long").alias("custkey"),
        F.col("o_orderkey").cast("long").alias("orderkey"),
        F.rank().over(w1).cast("long").alias("rnk"),
        F.dense_rank().over(w1).cast("long").alias("drnk"),
        F.percent_rank().over(w1).alias("prank"),
        F.cume_dist().over(w1).alias("cdist"),
        F.ntile(4).over(w2).cast("long").alias("tile"),
        F.row_number().over(w2).cast("long").alias("rn"),
    )


# ---------------------------------------------------------------------------
# Map-typed aggregate family (ClickHouse sumMap/minMap/maxMap): each
# event row carries a map {event_type -> value, '_n' -> 1}; the
# per-user fold is the key-wise sum/min/max. The oracle computes the
# same cells directly per (user, key) — an independent formulation, so
# agreement validates the explode-fold-reassemble pipeline, not just
# the arithmetic. DECIMAL values keep the sum bit-stable.
# ---------------------------------------------------------------------------

MAP_AGG_ORACLE = """
WITH base AS (
  SELECT user_id, event_type, CAST(value AS DECIMAL(25, 6)) AS v
  FROM events
)
SELECT 'sum' AS part, CAST(user_id AS BIGINT) AS user_id,
       event_type AS mkey, CAST(SUM(v) AS DOUBLE) AS val
FROM base GROUP BY user_id, event_type
UNION ALL
SELECT 'sum', CAST(user_id AS BIGINT), '_n', CAST(COUNT(*) AS DOUBLE)
FROM base GROUP BY user_id
UNION ALL
SELECT 'min', CAST(user_id AS BIGINT), event_type, CAST(MIN(v) AS DOUBLE)
FROM base GROUP BY user_id, event_type
UNION ALL
SELECT 'min', CAST(user_id AS BIGINT), '_n', CAST(1 AS DOUBLE)
FROM base GROUP BY user_id
UNION ALL
SELECT 'max', CAST(user_id AS BIGINT), event_type, CAST(MAX(v) AS DOUBLE)
FROM base GROUP BY user_id, event_type
UNION ALL
SELECT 'max', CAST(user_id AS BIGINT), '_n', CAST(1 AS DOUBLE)
FROM base GROUP BY user_id
"""


@register_extended("map_aggregates", MAP_AGG_ORACLE)
def q_map_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import catalog
    from ..operators.maps import agg_map

    ev = catalog.load_table(spark, sf_dir, "events")
    m = ev.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.create_map(
            F.col("event_type"), F.col("value").cast("decimal(25,6)"),
            F.lit("_n"), F.lit(1).cast("decimal(25,6)"),
        ).alias("m"),
    )
    parts = []
    for how in ("sum", "min", "max"):
        folded = agg_map(m, ["user_id"], "m", how=how, out="fm")
        parts.append(
            folded.select(
                F.lit(how).alias("part"),
                "user_id",
                F.explode("fm").alias("mkey", "__v"),
            ).select(
                "part", "user_id", "mkey",
                F.col("__v").cast("double").alias("val"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Exact audience overlap via bitmap states (ClickHouse groupBitmapAnd):
# for every pair of event types, how many users did BOTH, plus the
# Jaccard overlap. The Spark plan folds each type's audience into one
# sorted-array state (8 rows total), then intersects states pairwise —
# the corpus is scanned ONCE; the oracle recomputes each cell from raw
# rows with an independent self-join formulation.
# ---------------------------------------------------------------------------

AUDIENCE_OVERLAP_ORACLE = """
WITH ut AS (SELECT DISTINCT event_type, user_id FROM events),
cnt AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY event_type),
ovl AS (
  SELECT a.event_type AS t1, b.event_type AS t2,
         COUNT(*) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT b.t1, b.t2, CAST(c1.n AS BIGINT) AS n1, CAST(c2.n AS BIGINT) AS n2,
       CAST(b.n_both AS BIGINT) AS n_both,
       CAST(b.n_both AS DOUBLE) / (c1.n + c2.n - b.n_both) AS jaccard
FROM ovl b
JOIN cnt c1 ON b.t1 = c1.event_type
JOIN cnt c2 ON b.t2 = c2.event_type
"""


@register_extended("audience_overlap", AUDIENCE_OVERLAP_ORACLE)
def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import catalog
    from ..operators.maps import bitmap_state

    ev = catalog.load_table(spark, sf_dir, "events")
    st = bitmap_state(ev, ["event_type"], "user_id")
    a = st.select(
        F.col("event_type").alias("t1"),
        F.col("bm").alias("bm1"),
        F.col("n").alias("n1"),
    )
    b = st.select(
        F.col("event_type").alias("t2"),
        F.col("bm").alias("bm2"),
        F.col("n").alias("n2"),
    )
    # states are |event types| rows — the pair join is dimension-sized
    pairs = a.join(dim_broadcast(b), F.col("t1") < F.col("t2"))
    n_both = F.size(F.array_intersect("bm1", "bm2")).cast("long")
    return pairs.select(
        "t1", "t2", "n1", "n2",
        n_both.alias("n_both"),
        (
            n_both.cast("double")
            / (F.col("n1") + F.col("n2") - n_both)
        ).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# sequenceNextNode parity: the event type users produce right after
# their first consecutive view -> click chain. Oracle formulates the
# same per-key lead() window logic directly in SQL.
# ---------------------------------------------------------------------------

SEQ_NEXT_ORACLE = """
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         lead(event_type, 1) OVER w AS e1,
         lead(event_type, 2) OVER w AS e2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
hits AS (
  SELECT user_id, ts, event_id, e2 AS next_node
  FROM o
  WHERE event_type = 'view' AND e1 = 'click' AND e2 IS NOT NULL
),
ranked AS (
  SELECT user_id, next_node,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM hits
)
SELECT CAST(user_id AS BIGINT) AS user_id, next_node
FROM ranked WHERE rn = 1
"""


@register_extended("sequence_next_node", SEQ_NEXT_ORACLE)
def q_sequence_next_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import catalog
    from ..operators.seqmatch import sequence_next_node

    ev = catalog.load_table(spark, sf_dir, "events")
    return sequence_next_node(
        ev,
        key="user_id",
        ts="ts",
        node="event_type",
        steps=[F.col("event_type") == "view", F.col("event_type") == "click"],
        tiebreak="event_id",
    ).select(F.col("user_id").cast("long").alias("user_id"), "next_node")


# ---------------------------------------------------------------------------
# Array-function family parity (ClickHouse arrayCumSum /
# arrayDifference / arrayCompact): per-user event-value series as an
# array, transformed with HIGHER-ORDER functions only (aggregate /
# zip_with / filter build the cumsum, differences, and
# adjacent-distinct run count as pure column expressions), then
# exploded back to rows. The oracle formulates the same cells with
# window functions — an independent computation path. Values are
# micro-scaled BIGINTs, so every cell is exact in both engines.
# ---------------------------------------------------------------------------

ARRAY_FUNCS_ORACLE = """
WITH base AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 1e6) AS BIGINT) AS v
  FROM events
),
o AS (
  SELECT user_id, v,
         ROW_NUMBER() OVER w AS idx,
         SUM(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS cum,
         v - COALESCE(lag(v) OVER w, 0) AS diff,
         CASE WHEN lag(v) OVER w IS DISTINCT FROM v THEN 1 ELSE 0 END
           AS run_start
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (SELECT user_id, CAST(SUM(run_start) AS BIGINT) AS n_compact
         FROM o GROUP BY user_id)
SELECT CAST(o.user_id AS BIGINT) AS user_id, CAST(idx AS BIGINT) AS idx,
       v, CAST(cum AS BIGINT) AS cum, diff, n_compact
FROM o JOIN runs ON o.user_id = runs.user_id
"""


@register_extended("array_functions", ARRAY_FUNCS_ORACLE)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import catalog

    ev = catalog.load_table(spark, sf_dir, "events")
    base = ev.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.struct(
            F.col("ts"),
            F.col("event_id"),
            F.round(F.col("value") * 1e6).cast("long").alias("v"),
        ).alias("__e"),
    )
    arr = base.groupBy("user_id").agg(
        F.transform(
            F.array_sort(F.collect_list("__e")), lambda s: s["v"]
        ).alias("vs")
    )
    # arrayCumSum: fold that APPENDS the running total per element
    cums = F.expr(
        "aggregate(vs, CAST(array() AS ARRAY<BIGINT>), "
        "(acc, x) -> array_append(acc, "
        "coalesce(try_element_at(acc, -1), CAST(0 AS BIGINT)) + x))"
    )
    # arrayDifference: x_i - x_{i-1}, first element vs 0
    shifted = F.expr(
        "concat(array(CAST(0 AS BIGINT)), slice(vs, 1, size(vs) - 1))"
    )
    diffs = F.zip_with("vs", shifted, lambda a, b: a - b)
    # arrayCompact length: adjacent-distinct run count
    n_compact = (
        F.lit(1)
        + F.size(
            F.filter(
                F.zip_with(
                    F.expr("slice(vs, 2, size(vs) - 1)"),
                    F.expr("slice(vs, 1, size(vs) - 1)"),
                    lambda a, b: a != b,
                ),
                lambda x: x,
            )
        )
    ).cast("long")
    wide = arr.select(
        "user_id",
        F.col("vs"),
        cums.alias("cums"),
        diffs.alias("diffs"),
        n_compact.alias("n_compact"),
    )
    return wide.select(
        "user_id",
        F.posexplode(F.arrays_zip("vs", "cums", "diffs")).alias("__i", "__z"),
        "n_compact",
    ).select(
        "user_id",
        (F.col("__i") + 1).cast("long").alias("idx"),
        F.col("__z.vs").alias("v"),
        F.col("__z.cums").alias("cum"),
        F.col("__z.diffs").alias("diff"),
        "n_compact",
    )


# ---------------------------------------------------------------------------
# Time-RANGE window frames (ClickHouse RANGE BETWEEN / trailing-window
# aggregates): per-user trailing 1-hour event sum at every event —
# RANGE frames bound by VALUE distance (epoch seconds), not row
# count, so irregular event spacing is handled exactly. One per-user
# window shuffle; micro-scaled BIGINT sums keep both engines
# bit-identical.
# ---------------------------------------------------------------------------

RANGE_FRAMES_ORACLE = """
WITH base AS (
  SELECT user_id, event_id,
         CAST(epoch(ts) AS BIGINT) AS sec,
         CAST(round(value * 1e6) AS BIGINT) AS v
  FROM events
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(event_id AS BIGINT) AS event_id,
       CAST(SUM(v) OVER w AS BIGINT) AS trail_sum,
       CAST(COUNT(*) OVER w AS BIGINT) AS trail_n,
       CAST(MAX(v) OVER w AS BIGINT) AS trail_max
FROM base
WINDOW w AS (PARTITION BY user_id ORDER BY sec
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


@register_extended("range_frames", RANGE_FRAMES_ORACLE)
def q_range_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from .. import catalog

    ev = catalog.load_table(spark, sf_dir, "events")
    base = ev.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1_000_000))
        .cast("long")
        .alias("sec"),
        F.round(F.col("value") * 1e6).cast("long").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return base.select(
        "user_id",
        "event_id",
        F.sum("v").over(w).cast("long").alias("trail_sum"),
        F.count(F.lit(1)).over(w).cast("long").alias("trail_n"),
        F.max("v").over(w).cast("long").alias("trail_max"),
    )


# ---------------------------------------------------------------------------
# Seasonal-baseline anomaly detection: each event compared against its
# (event_type, day-of-week, hour) cell's robust baseline — median +
# MAD computed per seasonal cell (the weekly-seasonality profile that
# calendar-blind rolling z-scores miss: a Monday-9am spike is normal
# on Mondays at 9). Flags |v - med| > 3 * MAD. Shared percentile
# interpolation keeps med/MAD bit-identical across engines (the
# robust_stats contract); the flag compare is exact arithmetic on
# those values. Two grouped aggregations + one broadcast baseline
# join — the fact table is scanned twice, shuffled on the cell key
# only.
# ---------------------------------------------------------------------------

SEASONAL_ORACLE = """
WITH base AS (
  SELECT event_id, event_type, value,
         CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,  -- DuckDB 0=Sun; Spark 1=Sun
         CAST(hour(ts) AS BIGINT) AS hr
  FROM events
),
med AS (
  SELECT event_type, dow, hr,
         quantile_cont(value, 0.5) AS med
  FROM base GROUP BY event_type, dow, hr
),
mad AS (
  SELECT b.event_type, b.dow, b.hr, m.med,
         quantile_cont(abs(b.value - m.med), 0.5) AS mad,
         CAST(COUNT(*) AS BIGINT) AS n_cell
  FROM base b JOIN med m
    ON b.event_type = m.event_type AND b.dow = m.dow AND b.hr = m.hr
  GROUP BY b.event_type, b.dow, b.hr, m.med
)
SELECT CAST(b.event_id AS BIGINT) AS event_id, b.event_type,
       b.dow, b.hr, m.med, m.mad, m.n_cell
FROM base b
JOIN mad m
  ON b.event_type = m.event_type AND b.dow = m.dow AND b.hr = m.hr
WHERE abs(b.value - m.med) > 3 * m.mad
"""


@register_extended("seasonal_anomalies", SEASONAL_ORACLE)
def q_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import catalog

    ev = catalog.load_table(spark, sf_dir, "events")
    base = ev.select(
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        "value",
        F.dayofweek("ts").cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hr"),
    )
    cell = ["event_type", "dow", "hr"]
    med = base.groupBy(*cell).agg(
        F.percentile(F.col("value"), 0.5).alias("med")
    )
    dev = base.join(dim_broadcast(med), cell)
    mad = dev.groupBy(*cell, "med").agg(
        F.percentile(F.abs(F.col("value") - F.col("med")), 0.5).alias("mad"),
        F.count(F.lit(1)).alias("n_cell"),
    )
    flagged = base.join(dim_broadcast(mad), cell).filter(
        F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad")
    )
    return flagged.select(
        "event_id", "event_type", "dow", "hr", "med", "mad",
        F.col("n_cell").cast("long").alias("n_cell"),
    )


# ---------------------------------------------------------------------------
# Exact weighted median (ClickHouse medianExactWeighted): per event
# type, the value at which cumulative integer weight first reaches
# half the total. Cross-engine check by DIFFERENT algorithms: Spark
# computes the cumulative-weight walk (one per-key window over sorted
# values); the oracle REPLICATES each row weight times (unnest range)
# and takes the lower discrete median — the definitions coincide for
# integer weights, so agreement validates the walk, not a shared
# formula. Weights here are small ints (1 + user_id % 7).
# ---------------------------------------------------------------------------

WEIGHTED_MEDIAN_ORACLE = """
WITH w AS (
  SELECT event_type, value, 1 + (user_id % 7) AS wt FROM events
),
expanded AS (
  SELECT event_type, value
  FROM w, UNNEST(generate_series(1, CAST(w.wt AS BIGINT)))
),
ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM expanded
)
SELECT event_type, value AS wmedian
FROM ranked WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
"""


@register_extended("weighted_median", WEIGHTED_MEDIAN_ORACLE)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from .. import catalog

    ev = catalog.load_table(spark, sf_dir, "events")
    w = ev.select(
        "event_type", "value",
        (1 + F.col("user_id") % 7).cast("long").alias("wt"),
    )
    win = Window.partitionBy("event_type").orderBy("value")
    tot = Window.partitionBy("event_type")
    c = (
        w.withColumn("cum", F.sum("wt").over(win))
        .withColumn("total", F.sum("wt").over(tot))
        # lower weighted median: first value whose cumulative weight
        # reaches ceil(total / 2)
        .filter(F.col("cum") >= F.ceil(F.col("total") / 2.0))
    )
    first = Window.partitionBy("event_type").orderBy("value")
    return (
        c.withColumn("__rk", F.row_number().over(first))
        .filter(F.col("__rk") == 1)
        .select("event_type", F.col("value").alias("wmedian"))
    )


# ---------------------------------------------------------------------------
# cms_freq_estimate — Count-Min Sketch lifecycle (operators/skew.py
# cms_state/cms_merge/cms_estimate): per-source frequency states merged
# by integer addition into one global sketch, then point-estimates for
# the corpus's top words checked against their exact counts. The sketch
# is deterministic (fixed row-hash constants over the shared polynomial
# word hash), so DuckDB reproduces every counter and estimate bit-
# exactly — including the overcounts the width forces.
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 512
CMS_TOP = 20


def _cms_oracle() -> str:
    from ..llm.text import POLY_BASE, POLY_MOD
    from ..operators.skew import CMS_A, CMS_B, CMS_MOD

    def pos(h: str, j: int) -> str:
        return f"(({h} * {CMS_A[j]} + {CMS_B[j]}) % {CMS_MOD}) % {CMS_WIDTH}"

    counters = "\n  UNION ALL ".join(
        f"SELECT {j} AS cms_row, {pos('h', j)} AS cms_pos, COUNT(*) AS cnt "
        f"FROM words GROUP BY 1, 2"
        for j in range(CMS_DEPTH)
    )
    probe = "\n  UNION ALL ".join(
        f"SELECT w, exact_cnt, {j} AS cms_row, {pos('h', j)} AS cms_pos FROM top"
        for j in range(CMS_DEPTH)
    )
    word_hash = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(generate_series(1, length(w)), "
        "i -> CAST(ord(substring(w, i, 1)) AS BIGINT))), "
        f"(acc, x) -> (acc * {POLY_BASE} + x) % {POLY_MOD})"
    )
    return f"""
WITH words AS (
  SELECT w, {word_hash} AS h
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE length(w) > 0
),
counters AS (
  {counters}
),
exact AS (SELECT w, h, COUNT(*) AS exact_cnt FROM words GROUP BY w, h),
top AS (SELECT * FROM exact ORDER BY exact_cnt DESC, w ASC LIMIT {CMS_TOP}),
probe AS (
  {probe}
)
SELECT p.w AS word,
       CAST(p.exact_cnt AS BIGINT) AS exact_cnt,
       CAST(MIN(c.cnt) AS BIGINT) AS cms_est,
       CAST(MIN(c.cnt) - p.exact_cnt AS BIGINT) AS overcount
FROM probe p JOIN counters c USING (cms_row, cms_pos)
GROUP BY p.w, p.exact_cnt
"""


@register_extended("cms_freq_estimate", _cms_oracle())
def q_cms_freq_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point-frequency estimates for the corpus's top words,
    via the full persisted-state lifecycle: per-source states
    (``cms_state``) summed into one sketch (``cms_merge`` — the any-
    range/any-shard merge path), probed by ``cms_estimate``. Shuffles:
    one sketch-sized aggregation (<= sources x depth x width rows), one
    exact word count for the probe set, one broadcast estimate join —
    the corpus is scanned twice and never re-shuffled by word."""
    from ..llm.text import POLY_BASE, POLY_MOD
    from ..operators.skew import cms_estimate, cms_merge, cms_state

    docs = _docs(spark, sf_dir, parallel=True)
    # Aggregate FIRST, hash the distinct words (optimization r14): the
    # per-character polynomial hash is an interpreted higher-order fold
    # — by far this query's heaviest per-row expression — and the old
    # shape evaluated it once per word OCCURRENCE, twice over (the
    # unpinned `words` frame fed both the sketch states and the exact
    # counts; 0 runtime subtree reuse in this engine). Counting
    # occurrences per (source, word) first shrinks the hash input from
    # corpus-occurrences x2 to the distinct vocabulary x1; the weighted
    # cms_state sums the same counters bit-identically. The pinned
    # frame feeds both consumers from one evaluation.
    wcounts = (
        docs.select("source", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .withColumn(
            "h",
            F.expr(
                "aggregate(transform(sequence(1, length(w)), "
                "i -> CAST(ascii(substring(w, i, 1)) AS BIGINT)), "
                f"CAST(0 AS BIGINT), (acc, x) -> (acc * {POLY_BASE} + x) % {POLY_MOD})"
            ),
        )
        .localCheckpoint(eager=False)
    )
    states = cms_state(
        wcounts, ["source"], "h",
        depth=CMS_DEPTH, width=CMS_WIDTH, weight=F.col("cnt"),
    )
    sketch = cms_merge(states)  # drop the source grain: one global sketch
    exact = wcounts.groupBy("w", "h").agg(
        F.sum("cnt").cast("long").alias("exact_cnt")
    )
    top = exact.orderBy(F.col("exact_cnt").desc(), F.col("w").asc()).limit(CMS_TOP)
    est = cms_estimate(sketch, top, "h", depth=CMS_DEPTH, width=CMS_WIDTH)
    return est.select(
        F.col("w").alias("word"),
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).cast("long").alias("overcount"),
    )


# ---------------------------------------------------------------------------
# bloom_membership — Bloom membership state (operators/skew.py
# bloom_state/bloom_merge/bloom_contains): a held-out "benchmark" set's
# document fingerprints become a few hundred set-bit rows; every corpus
# document probes the sketch. No false negatives by construction
# (checked against exact membership in-row); the deliberately small
# width forces deterministic false positives both engines reproduce.
# ---------------------------------------------------------------------------

BLOOM_DEPTH = 4
BLOOM_WIDTH = 256


def _bloom_oracle() -> str:
    from ..llm.text import POLY_BASE, POLY_MOD
    from ..operators.skew import CMS_A, CMS_B, CMS_MOD

    def pos(h: str, j: int) -> str:
        return f"(({h} * {CMS_A[j]} + {CMS_B[j]}) % {CMS_MOD}) % {BLOOM_WIDTH}"

    text_hash = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(generate_series(1, length(text)), "
        "i -> CAST(ord(substring(text, i, 1)) AS BIGINT))), "
        f"(acc, x) -> (acc * {POLY_BASE} + x) % {POLY_MOD})"
    )
    bits = "\n  UNION ".join(
        f"SELECT {j} AS cms_row, {pos('h', j)} AS cms_pos FROM bench"
        for j in range(BLOOM_DEPTH)
    )
    probe = "\n  UNION ALL ".join(
        f"SELECT doc_id, h, {j} AS cms_row, {pos('h', j)} AS cms_pos FROM corpus"
        for j in range(BLOOM_DEPTH)
    )
    return f"""
WITH corpus AS (SELECT doc_id, {text_hash} AS h FROM documents),
bench AS (SELECT h FROM corpus WHERE doc_id % 7 = 0),
bits AS (
  {bits}
),
probe AS (
  {probe}
),
hits AS (
  SELECT p.doc_id, COUNT(*) = {BLOOM_DEPTH} AS maybe_member
  FROM probe p JOIN bits b USING (cms_row, cms_pos)
  GROUP BY p.doc_id
)
SELECT c.doc_id,
       COALESCE(h2.maybe_member, FALSE) AS maybe_member,
       c.h IN (SELECT h FROM bench) AS exact_member
FROM corpus c LEFT JOIN hits h2 USING (doc_id)
"""


@register_extended("bloom_membership", _bloom_oracle())
def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe every document against the benchmark subset's Bloom state.
    Scale shape: the benchmark set never broadcasts or shuffles — only
    its <= depth x width set-bit rows do; the corpus side explodes
    map-side and re-aggregates per doc, one broadcast join."""
    from ..llm.text import poly_hash
    from ..operators.joins import dim_broadcast
    from ..operators.skew import bloom_contains, bloom_merge, bloom_state

    # pinned (optimization r14): the per-char polynomial hash of every
    # full document text is this query's dominant per-row cost and the
    # frame feeds FOUR consumers (bench set, shard states, the probe,
    # the exact check) — Spark never reuses the duplicated subtrees at
    # runtime (0 ReusedExchange in this engine's executed plans), so
    # the unpinned shape hashed the corpus ~2.3x over
    docs = _docs(spark, sf_dir, parallel=True).select(
        "doc_id", poly_hash("text").alias("h")
    ).localCheckpoint(eager=False)
    bench = docs.filter(F.col("doc_id") % 7 == 0).select("h")
    # state built per half-shard, then merged — exercises the bit-OR
    # union path the persisted-partials lifecycle relies on
    shards = bloom_state(
        docs.filter(F.col("doc_id") % 7 == 0).withColumn(
            "half", (F.col("doc_id") % 2).cast("int")
        ),
        ["half"], "h", depth=BLOOM_DEPTH, width=BLOOM_WIDTH,
    )
    sketch = bloom_merge(shards)
    # exact membership FIRST, as extra probe columns (optimization
    # r14): bloom_contains carries every probe column through its
    # per-doc aggregation, so folding the broadcast exact check into
    # the probe frame removes the old corpus x corpus shuffle join of
    # `got` with `exact` — one aggregation, zero doc-keyed exchanges
    probes = docs.join(
        dim_broadcast(bench.distinct().withColumn("__m", F.lit(True))), "h", "left"
    ).select("doc_id", "h", F.coalesce(F.col("__m"), F.lit(False)).alias("exact_member"))
    got = bloom_contains(
        sketch, probes, "h", depth=BLOOM_DEPTH, width=BLOOM_WIDTH
    )
    return got.select("doc_id", "maybe_member", "exact_member")


# ---------------------------------------------------------------------------
# source_overlap_matrix — pairwise content overlap between sources
# (the provenance diagnostic run before mixture weighting: which
# sources copy from each other / mirror the same upstream?). Overlap
# is measured on distinct word-3-gram shingle hashes — the repo's
# shared dedup primitive — so exact mirrors, partial scrapes, and
# boilerplate all register. Pair fan-out per shingle is bounded by
# C(n_sources, 2): the matrix is sources x sources regardless of
# corpus size, and the only corpus-scale shuffle is the distinct
# (source, shingle) aggregation.
# ---------------------------------------------------------------------------

SOURCE_OVERLAP_ORACLE = f"""
WITH sh AS (
  SELECT DISTINCT source, unnest(sg) AS h
  FROM (
    SELECT source,
           list_transform(generate_series(1, greatest(len(hw) - 2, 0)),
                          i -> {{combine}}) AS sg
    FROM (SELECT source, {{word_hashes}} AS hw FROM documents)
  )
),
cnt AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
ovl AS (
  SELECT a.source AS src1, b.source AS src2, COUNT(*) AS n_shared
  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
)
SELECT o.src1, o.src2,
       CAST(c1.n AS BIGINT) AS n1, CAST(c2.n AS BIGINT) AS n2,
       CAST(o.n_shared AS BIGINT) AS n_shared,
       CAST(o.n_shared AS DOUBLE) / (c1.n + c2.n - o.n_shared) AS jaccard
FROM ovl o
JOIN cnt c1 ON o.src1 = c1.source
JOIN cnt c2 ON o.src2 = c2.source
"""


def _source_overlap_oracle() -> str:
    from ..llm.text import shingle_combine_sql

    from .llm import O_WORD_HASHES

    return SOURCE_OVERLAP_ORACLE.format(
        combine=shingle_combine_sql("hw", 3), word_hashes=O_WORD_HASHES
    )


@register_extended("source_overlap_matrix", _source_overlap_oracle())
def q_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sources-x-sources shingle-overlap matrix with Jaccard. One
    corpus scan -> distinct (source, shingle) -> self-join on the
    shingle hash (fan-out bounded by the source count) -> two
    dimension-sized count joins."""
    from ..llm.dedup import with_shingle_rows

    docs = _docs(spark, sf_dir, parallel=True).select("source", "text")
    # pinned: the distinct (source, shingle) frame feeds the per-source
    # counts AND the pair stage (plans showed zero runtime subtree
    # reuse — unpinned, the scan + hash + distinct ran three times)
    sh = with_shingle_rows(docs, id_col="source").localCheckpoint(eager=False)
    cnt = sh.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    # pair generation by per-shingle source-set combinations instead of
    # a self-join on h: ONE exchange of (source, h) replaces two, and
    # the explode emits each qualifying (src1 < src2, h) exactly once
    # (sh is distinct, the set is sorted), so the counts are identical.
    # Fan-out per shingle stays bounded by C(n_sources, 2).
    per_h = sh.groupBy("h").agg(F.sort_array(F.collect_set("source")).alias("ss"))
    ovl = (
        per_h.select(
            F.explode(
                F.expr(
                    "flatten(transform(ss, (s1, i) -> "
                    "transform(slice(ss, i + 2, size(ss)), "
                    "s2 -> struct(s1 AS src1, s2 AS src2))))"
                )
            ).alias("p")
        )
        .select("p.src1", "p.src2")
        .groupBy("src1", "src2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    c1 = cnt.select(F.col("source").alias("src1"), F.col("n").alias("n1"))
    c2 = cnt.select(F.col("source").alias("src2"), F.col("n").alias("n2"))
    return (
        ovl.join(dim_broadcast(c1), "src1")
        .join(dim_broadcast(c2), "src2")
        .select(
            "src1", "src2", "n1", "n2", "n_shared",
            (
                F.col("n_shared").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("n_shared"))
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# linear_trend — ClickHouse `simpleLinearRegression(x, y)` parity:
# per-key OLS slope/intercept of price over time from the four
# algebraic moments (n, Σx, Σx², Σxy, Σy). One aggregation with
# map-side partials — trend detection over any key count without a
# per-key sort or window. Determinism: x is integer seconds offset
# from a fixed origin (Σx, Σx² accumulate in DECIMAL(38,0), exact);
# the double-valued y and x*y terms go through the round-then-DECIMAL
# recipe; the final slope/intercept expression is a fixed arithmetic
# tree over those exact sums, so both engines emit identical bits.
# ---------------------------------------------------------------------------

TREND_X0 = 1_700_000_000  # fixed origin keeps x small: x^2 exact in DECIMAL

LINEAR_TREND_ORACLE = f"""
WITH t AS (
  SELECT user_id AS pool_id,
         CAST(floor(epoch(ts)) AS BIGINT) - {TREND_X0} AS x,
         value AS y
  FROM events
),
m AS (
  SELECT pool_id,
         COUNT(*) AS n,
         SUM(CAST(x AS DECIMAL(38,0))) AS sx,
         SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx,
         SUM(CAST(round(y, 9) AS DECIMAL(38,12))) AS sy,
         SUM(CAST(round(CAST(x AS DOUBLE) * y, 6) AS DECIMAL(38,12))) AS sxy
  FROM t GROUP BY pool_id
)
SELECT pool_id,
       CAST(n AS BIGINT) AS n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0), 12) AS slope,
       round((CAST(sy AS DOUBLE)
                - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0))
                  * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), 9) AS intercept
FROM m
"""


@register_extended("linear_trend", LINEAR_TREND_ORACLE)
def q_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pool OLS price trend (ClickHouse simpleLinearRegression):
    slope/intercept from the algebraic moments in ONE aggregation —
    shuffle carries key-count rows, never ticks."""
    from .. import catalog
    from .core import O_TICKS  # noqa: F401 (shared tick shaping contract)

    ev = catalog.load_table(spark, sf_dir, "events")
    t = ev.select(
        F.col("user_id").alias("pool_id"),
        (F.unix_timestamp("ts") - TREND_X0).alias("x"),
        F.col("value").alias("y"),
    )
    m = t.groupBy("pool_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum(F.round(F.col("y"), 9).cast("decimal(38,12)")).alias("sy"),
        F.sum(
            F.round(F.col("x").cast("double") * F.col("y"), 6).cast(
                "decimal(38,12)"
            )
        ).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    sxxd = F.col("sxx").cast("double")
    syd = F.col("sy").cast("double")
    sxyd = F.col("sxy").cast("double")
    denom = F.nullif(nd * sxxd - sxd * sxd, F.lit(0.0))
    slope = (nd * sxyd - sxd * syd) / denom
    return m.select(
        "pool_id",
        "n",
        F.round(slope, 12).alias("slope"),
        F.round((syd - slope * sxd) / nd, 9).alias("intercept"),
    )
