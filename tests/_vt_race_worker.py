"""Subprocess worker for the versioned-table two-writer race test
(tests/test_versioned.py::test_two_process_writer_race): its own
SparkSession in its own JVM, N keyed upserts against a shared table.
The advisory mkdir lock plus the LATEST==parent optimistic check must
serialize commits across PROCESSES — any lost commit shows up as a
missing version or a stale final row in the parent test's assertions.

Usage: python _vt_race_worker.py <table_path> <token_id> <n_upserts>
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> None:
    table, token_id, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from degenter_clickhouse_spark.operators import versioned as V
    from degenter_clickhouse_spark.session import build_session

    spark = build_session(
        app_name=f"vt-race-{token_id}", cpus=2, with_extension=False
    )
    try:
        for i in range(n):
            df = spark.createDataFrame(
                [(token_id, float(i), i)], ["token_id", "price", "updated"]
            )
            V.vt_upsert(spark, df, table, keys=["token_id"])
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
