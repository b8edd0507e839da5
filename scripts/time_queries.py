#!/usr/bin/env python
"""Time a subset of bench queries with the noop sink (guide §1.4).

Usage: python scripts/time_queries.py q1 q2 ... [--runs N]
Prints per-query min-of-N seconds plus run-to-run spread. Matches the
bench methodology (clearCache between queries, noop sink) so numbers
are comparable with bench.py rows.
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="time-queries")
    spark.sparkContext.setLogLevel("FATAL")
    reg = load_registry(extended=True)
    # one warmup to pay JVM/codegen/file-listing once
    reg[args[0]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    for name in args:
        times = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"bench:{name}")
            t0 = time.perf_counter()
            reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
        print(
            f"{name}: min={min(times):.3f} max={max(times):.3f} "
            f"all={[round(t, 3) for t in times]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
