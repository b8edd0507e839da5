"""Compiled Catalyst extension (jvm/src/LatestRowRewrite.scala): the
correlated latest-row rewrite firing on the RESOLVED plan, so alias /
derived-table variants the pre-parse regex shim cannot see still get
the max_by decorrelation (SURVEY.md §4 J5/J6; BASELINE.json "custom
Catalyst rules")."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _ext_active(spark) -> bool:
    try:
        return "DegenterSparkExtensions" in spark.conf.get("spark.sql.extensions", "")
    except Exception:
        return False


@pytest.fixture()
def views(spark):
    prices = spark.createDataFrame(
        [
            (1, 10, 5.0, "2024-01-01 10:00:00"),
            (1, 10, 6.0, "2024-01-01 11:00:00"),
            (2, 11, 7.0, "2024-01-01 10:30:00"),
        ],
        "token_id long, pool_id long, price_in_zig double, ts string",
    ).select(
        "token_id", "pool_id", "price_in_zig",
        F.col("ts").cast("timestamp").alias("updated_at"),
    )
    prices.createOrReplaceTempView("prices")
    spark.createDataFrame(
        [(100, 1), (101, 2), (102, 3)], "pool_id long, quote_token_id long"
    ).createOrReplaceTempView("pools")
    yield
    spark.catalog.dropTempView("prices")
    spark.catalog.dropTempView("pools")


def _opt_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_rule_rewrites_reference_shape(spark, views):
    """The reference's literal correlated probe plans as ONE max_by
    aggregate + left outer join — no ranking window, no per-row sort."""
    if not _ext_active(spark):
        pytest.skip("extension jar not loaded in this session")
    df = spark.sql(
        """
        SELECT p.pool_id,
               (SELECT price_in_zig FROM prices
                WHERE token_id = p.quote_token_id
                ORDER BY updated_at DESC LIMIT 1) AS quote_px
        FROM pools p
        """
    )
    assert sorted((r.pool_id, r.quote_px) for r in df.collect()) == [
        (100, 6.0), (101, 7.0), (102, None),
    ]
    plan = _opt_plan(df)
    assert "max_by" in plan, plan
    assert "row_number" not in plan and "Window" not in plan, plan


def test_rule_fires_on_alias_variant_regex_cannot_see(spark, views):
    """A derived-table alias with renamed columns defeats the pre-parse
    regex shim entirely; the resolved-plan rule still rewrites it."""
    if not _ext_active(spark):
        pytest.skip("extension jar not loaded in this session")
    df = spark.sql(
        """
        SELECT p.pool_id,
               (SELECT pr.px FROM (SELECT token_id AS tid,
                                          price_in_zig AS px,
                                          updated_at AS ts FROM prices) pr
                WHERE pr.tid = p.quote_token_id
                ORDER BY pr.ts DESC LIMIT 1) AS quote_px
        FROM pools p
        """
    )
    assert sorted((r.pool_id, r.quote_px) for r in df.collect()) == [
        (100, 6.0), (101, 7.0), (102, None),
    ]
    assert "max_by" in _opt_plan(df)


def test_rule_earliest_row_and_null_ordering_guard(spark, views):
    """ASC LIMIT 1 (the reference's earliest-1 lookup, O4) rewrites to
    min_by when NULLs cannot win the sort (NULLS LAST or non-nullable
    key); the default ASC NULLS FIRST on a nullable key is left to
    Spark's own decorrelation — min_by skips null keys, so rewriting
    there would change which row wins."""
    if not _ext_active(spark):
        pytest.skip("extension jar not loaded in this session")
    asc_safe = spark.sql(
        """
        SELECT p.pool_id,
               (SELECT price_in_zig FROM prices
                WHERE token_id = p.quote_token_id
                ORDER BY updated_at ASC NULLS LAST LIMIT 1) AS v
        FROM pools p
        """
    )
    assert "min_by" in _opt_plan(asc_safe)
    assert sorted((r.pool_id, r.v) for r in asc_safe.collect()) == [
        (100, 5.0), (101, 7.0), (102, None),
    ]
    asc_default = spark.sql(
        """
        SELECT p.pool_id,
               (SELECT price_in_zig FROM prices
                WHERE token_id = p.quote_token_id
                ORDER BY updated_at ASC LIMIT 1) AS v
        FROM pools p
        """
    )
    plan = _opt_plan(asc_default)
    assert "min_by" not in plan and "max_by" not in plan, plan
    # and Spark's own plan still answers correctly
    assert sorted((r.pool_id, r.v) for r in asc_default.collect()) == [
        (100, 5.0), (101, 7.0), (102, None),
    ]


def test_rule_multikey_struct_ordering(spark, views):
    """A uniform-direction multi-key ORDER BY over NON-nullable keys
    rewrites to max_by/min_by over a struct (field-wise comparison =
    multi-key sort); nullable keys keep the original plan."""
    import pyspark.sql.types as T

    if not _ext_active(spark):
        pytest.skip("extension jar not loaded in this session")
    schema = T.StructType(
        [
            T.StructField("token_id", T.LongType(), False),
            T.StructField("height", T.LongType(), False),
            T.StructField("msg_index", T.LongType(), False),
            T.StructField("v", T.DoubleType(), True),
        ]
    )
    spark.createDataFrame(
        [(1, 5, 2, 5.0), (1, 5, 1, 4.0), (1, 4, 9, 3.0), (2, 7, 0, 9.0)],
        schema,
    ).createOrReplaceTempView("pool_state")  # guarded table name
    df = spark.sql(
        """
        SELECT p.pool_id,
               (SELECT v FROM pool_state
                WHERE token_id = p.quote_token_id
                ORDER BY height ASC, msg_index ASC LIMIT 1) AS first_v
        FROM pools p
        """
    )
    plan = _opt_plan(df)
    assert "min_by" in plan, plan
    assert sorted((r.pool_id, r.first_v) for r in df.collect()) == [
        (100, 3.0), (101, 9.0), (102, None),
    ]
    spark.catalog.dropTempView("pool_state")


def test_rule_leaves_unlisted_tables_alone(spark, views):
    """Only the configured state tables rewrite; arbitrary user tables
    keep Spark's own (window-based) decorrelation untouched."""
    if not _ext_active(spark):
        pytest.skip("extension jar not loaded in this session")
    spark.createDataFrame(
        [(1, 5), (2, 6)], "k long, v long"
    ).createOrReplaceTempView("user_tbl")
    df = spark.sql(
        """
        SELECT p.pool_id,
               (SELECT v FROM user_tbl WHERE k = p.quote_token_id
                ORDER BY v DESC LIMIT 1) AS x
        FROM pools p
        """
    )
    plan = _opt_plan(df)
    assert "max_by" not in plan, plan
    # semantics still correct through Spark's own decorrelation
    assert sorted((r.pool_id, r.x) for r in df.collect()) == [
        (100, 5), (101, 6), (102, None),
    ]
    spark.catalog.dropTempView("user_tbl")


def test_rule_fires_on_reference_earliest_trades_shape(spark, views):
    """VERDICT r5 #8: the reference's first-provide lookup
    (jobs/fasttrack-listener.js:122-137 — ORDER BY height ASC,
    msg_index ASC LIMIT 1 over trades) rewrites to a min_by struct
    aggregate now that trades/pools sit in the default guard list."""
    import pyspark.sql.types as T

    if not _ext_active(spark):
        pytest.skip("extension jar not loaded in this session")
    schema = T.StructType(
        [
            T.StructField("pool_id", T.LongType(), False),
            T.StructField("action", T.StringType(), False),
            T.StructField("height", T.LongType(), False),
            T.StructField("msg_index", T.LongType(), False),
            T.StructField("reserve_asset1_amount", T.DoubleType(), True),
        ]
    )
    spark.createDataFrame(
        [
            (100, "provide", 5, 1, 11.0),
            (100, "provide", 5, 0, 10.0),
            (100, "swap", 4, 0, 99.0),
            (101, "provide", 7, 2, 20.0),
        ],
        schema,
    ).createOrReplaceTempView("trades")
    df = spark.sql(
        """
        SELECT p.pool_id,
               (SELECT reserve_asset1_amount FROM trades
                WHERE pool_id = p.pool_id AND action = 'provide'
                ORDER BY height ASC, msg_index ASC LIMIT 1) AS first_res
        FROM pools p
        """
    )
    plan = _opt_plan(df)
    assert "min_by" in plan, plan
    assert sorted((r.pool_id, r.first_res) for r in df.collect()) == [
        (100, 10.0), (101, 20.0), (102, None),
    ]
    spark.catalog.dropTempView("trades")
