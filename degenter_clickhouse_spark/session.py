"""SparkSession builder tuned for this engine.

Design notes (100 TB target, tested on local[N]):

* AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast conversion replace most hand-tuning. On a real
  cluster ``spark.sql.shuffle.partitions`` becomes an upper bound that
  AQE coalesces down from, so we set it generously relative to core
  count instead of hardcoding cluster-size assumptions.
* UTC session timezone: the reference stores second-precision UTC
  timestamps everywhere (SURVEY.md §1.2); all window/bucket math in this
  engine assumes UTC.
* ``parquet.nanosAsLong``: the driver's ``events`` table carries
  nanosecond timestamps which Spark's vectorized reader rejects; we read
  them as longs and convert with integer division (see catalog.py) so
  truncation matches other engines' ns->us behavior.
* Broadcast threshold raised to 64 MB: every dimension table in the
  reference model (tokens, pools, wallets — SURVEY.md §1.1) is tiny
  relative to the fact tables; J1-J4 joins should always broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Compiled Catalyst extension (correlated-latest-row rewrite; see
# jvm/src/LatestRowRewrite.scala and plans/rewrite.py). Built by
# jvm/build_jvm.sh with the Scala compiler shipped inside pyspark.
EXT_JAR = os.path.join(os.path.dirname(__file__), "jvm", "degenter-spark-ext.jar")
EXT_CLASS = "degenter.spark.DegenterSparkExtensions"


def build_session(
    app_name: str = "degenter-spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
    with_extension: bool = True,
) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # local mode runs everything in the driver JVM; the 1g default
        # heap GC-thrashes (and eventually breaks py4j) under long
        # sessions with cached fixtures + many broadcasts
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # -- correctness-critical --
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # -- adaptive execution: coalesce shuffles, split skew at runtime --
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        # ObjectHashAggregate (collect_list/collect_set family: router
        # leg folding, line dedup rebuilds, OHLCV path arrays) falls
        # back to SORT-based aggregation after only 128 distinct keys
        # by default — every big grouped-collect pays an extra sort of
        # its full input. Raise the fallback so hash aggregation
        # survives realistic per-task group counts (AQE bounds a task's
        # input to ~advisory-size, so the in-memory buffer set tracks
        # one task's groups, and the sort fallback still guards
        # pathological cases). Env-tunable for cluster profiles.
        .config(
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
            os.environ.get("SPARK_GRAFT_OHA_FALLBACK", str(1 << 20)),
        )
        # -- dims are small: broadcast aggressively (J1-J4) --
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # plans stack many small broadcasts; don't fail under CPU contention
        .config("spark.sql.broadcastTimeout", "600")
        # -- Arrow for any pandas-UDF path (LLM ops, multimodal) --
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # zstd over the default snappy: ~30-50% smaller fact tables at
        # comparable scan speed — at 100 TB that is tens of TB of
        # storage and network per full scan (decode stays vectorized)
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
    )
    if with_extension and os.path.exists(EXT_JAR):
        # session-construction-time only: extensions cannot be injected
        # into a live session (the driver's vanilla session in
        # __spark_entry__ keeps the pre-parse shim, plans/rewrite.py)
        builder = builder.config(
            "spark.driver.extraClassPath", EXT_JAR
        ).config("spark.sql.extensions", EXT_CLASS)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on Python workers regardless of the
    driver's CWD/sys.path — the in-session equivalent of submitting
    with ``--py-files``. Needed for any pandas-UDF/mapInPandas operator
    whose helpers live in this package."""
    import tempfile
    import zipfile
    from pathlib import Path

    pkg_dir = Path(__file__).resolve().parent
    zpath = Path(tempfile.gettempdir()) / "degenter_clickhouse_spark.zip"
    if not zpath.exists():
        with zipfile.ZipFile(zpath, "w") as z:
            for f in pkg_dir.rglob("*.py"):
                z.write(f, f"degenter_clickhouse_spark/{f.relative_to(pkg_dir)}")
    try:
        spark.sparkContext.addPyFile(str(zpath))
    except Exception:
        pass  # already added in this context


def tune_existing(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable subset of our config to a session we
    did not create (the driver hands us one in ``__spark_entry__``)."""
    rt = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.broadcastTimeout": "600",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.parquet.compression.codec": "zstd",
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold": os.environ.get(
            "SPARK_GRAFT_OHA_FALLBACK", str(1 << 20)
        ),
    }
    for k, v in rt.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a live session; keep going
    ship_package(spark)
    return spark
