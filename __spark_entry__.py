"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001.
``queries()`` / ``oracle_sql()`` re-export the engine's query registry
(degenter_clickhouse_spark/queries/) — one entry per implemented
operator from SURVEY.md §2, each with a DuckDB oracle twin.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from degenter_clickhouse_spark.queries import load_registry  # noqa: E402
from degenter_clickhouse_spark.session import tune_existing  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the SURVEY.md §7 M1 slice — a pool-matrix-style
    composite (trailing filter, conditional aggs, decorrelated latest
    view, OHLCV-close price fallback) mapped onto the driver tables.
    """
    tune_existing(spark)
    reg = load_registry()
    return reg["pool_matrix_24h"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    reg = load_registry()

    def make(name):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_existing(spark)
            return reg[name].fn(spark, sf_dir)

        return run

    return {name: make(name) for name in reg}


def oracle_sql() -> dict[str, str]:
    reg = load_registry()
    return {name: q.oracle for name, q in reg.items() if q.oracle is not None}
