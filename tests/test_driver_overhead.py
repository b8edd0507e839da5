"""Round-14 driver-overhead internals: the load_table handle memo,
footer-walk file filtering, and the openCost-aware _parallel_scan
split estimate (guide §5 driver work / ADVICE r13)."""

from __future__ import annotations

import os

from degenter_clickhouse_spark import catalog

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def test_load_table_memoizes_handle_per_app(spark):
    a = catalog.load_table(spark, SF_DIR, "orders")
    b = catalog.load_table(spark, SF_DIR, "orders")
    assert a is b  # same logical-plan handle, no re-resolution
    # a different (sf_dir, name) key resolves separately
    c = catalog.load_table(spark, SF_DIR, "customer")
    assert c is not a
    # the memo holds no rows: actions recompute from parquet
    assert a.count() == spark.read.parquet(
        os.path.join(SF_DIR, "orders.parquet")
    ).count()


def test_table_rows_ignores_marker_and_hidden_files(spark, tmp_path):
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    tdir = tmp_path / "sfX" / "things.parquet"
    df.coalesce(1).write.parquet(str(tdir))
    n = catalog.table_rows(spark, str(tmp_path / "sfX"), "things")
    assert n == 100
    # a stale leading-underscore/dot parquet file must not inflate it
    real = next(p for p in os.listdir(tdir) if p.endswith(".parquet"))
    for stale in ("_stale.parquet", ".hidden.parquet"):
        os.link(tdir / real, tdir / stale)
    assert catalog.table_rows(spark, str(tmp_path / "sfX"), "things") == 100


def test_parallel_scan_skips_repartition_on_many_small_files(spark, tmp_path):
    from degenter_clickhouse_spark.queries.llm import _parallel_scan

    path = tmp_path / "many.parquet"
    # enough files that openCost-aware packing yields >= cores/2 splits
    # (default openCost 4 MB, maxPartitionBytes 128 MB -> ~32 files per
    # split; 8-core test session needs >= 4 splits -> > 128 files)
    spark.range(2000).repartition(140).write.parquet(str(path))
    df = spark.read.parquet(str(path))
    out = _parallel_scan(spark, df, str(path))
    assert out is df  # multi-file input: no repartition injected
    # a single tiny file still opts in to the parallelizing shuffle
    single = tmp_path / "one.parquet"
    spark.range(10).coalesce(1).write.parquet(str(single))
    df1 = spark.read.parquet(str(single))
    out1 = _parallel_scan(spark, df1, str(single))
    assert out1 is not df1
