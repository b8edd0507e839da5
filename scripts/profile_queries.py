#!/usr/bin/env python
"""Per-query phase profile: construction time (builder call, incl. any
driver collects it performs), execution time (noop sink), and the
number of Spark jobs/stages each phase launched.

Usage: python scripts/profile_queries.py [q1 q2 ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from degenter_clickhouse_spark.queries import load_registry
from degenter_clickhouse_spark.session import build_session


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="profile-queries")
    spark.sparkContext.setLogLevel("FATAL")
    reg = load_registry(extended=True)
    if not names:
        from bench import BENCH_QUERIES

        names = [n for n in BENCH_QUERIES if n in reg]
    # pre-build persisted indexes untimed (bench.py parity)
    from degenter_clickhouse_spark.queries.clean_ext import _hybrid_index_root
    from degenter_clickhouse_spark.queries.winnow_ext import _winnow_index_root

    _hybrid_index_root(spark, sf_dir)
    _winnow_index_root(spark, sf_dir)
    # warmup
    reg[names[0]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    st = spark.sparkContext.statusTracker()

    def jobs() -> int:
        ids = st.getJobIdsForGroup(None)
        return max(ids) + 1 if ids else 0

    print(f"{'query':34s} {'con_s':>7s} {'exe_s':>7s} {'con_j':>5s} {'exe_j':>5s}")
    for name in names:
        j0 = jobs()
        t0 = time.perf_counter()
        df = reg[name].fn(spark, sf_dir)
        t1 = time.perf_counter()
        j1 = jobs()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        j2 = jobs()
        spark.catalog.clearCache()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
        print(
            f"{name:34s} {t1 - t0:7.3f} {t2 - t1:7.3f} "
            f"{j1 - j0:5d} {j2 - j1:5d}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
