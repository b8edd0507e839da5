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
