#!/usr/bin/env python
"""Memory-pressure check for the ObjectHashAggregate sort-fallback
threshold (VERDICT r13 #10 / ADVICE r13 #2).

session.py raises spark.sql.objectHashAggregate.sortBased.fallbackThreshold
from Spark's default 128 keys to 1M (env knob SPARK_GRAFT_OHA_FALLBACK)
so grouped-collect aggregations (router leg folding, line-dedup doc
rebuilds) keep hash aggregation instead of paying a full sort per task.
The risk: the in-memory buffer map now grows to up to 1M groups per
task before falling back. This script runs the heaviest grouped-collect
queries at sf1 under a CONSTRAINED driver heap (local mode: executor ==
driver) for both thresholds and reports wall time + peak RSS, so the
trade is observed rather than argued.

Usage:
  SPARK_GRAFT_DRIVER_MEM=3g python scripts/check_oha.py [queries...]
"""

from __future__ import annotations

import os
import resource
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")


def run_one(threshold: str, names: list[str]) -> None:
    """Child-process body: one session per threshold (static-ish conf,
    and isolates peak-RSS accounting)."""
    from degenter_clickhouse_spark.queries import load_registry
    from degenter_clickhouse_spark.session import build_session

    spark = build_session(
        app_name=f"oha-check-{threshold}",
        extra_conf={
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold": threshold
        },
    )
    spark.sparkContext.setLogLevel("FATAL")
    reg = load_registry(extended=True)
    # warm
    reg[names[0]].fn(spark, SF1_DIR).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            reg[name].fn(spark, SF1_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
        print(f"  {name}: {best:.2f}s", flush=True)
    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    print(f"  python peak RSS {peak_mb} MB (JVM heap capped at "
          f"{os.environ.get('SPARK_GRAFT_DRIVER_MEM', '16g')})", flush=True)
    spark.stop()


def main() -> None:
    names = sys.argv[1:] or ["router_combine", "line_dedup"]
    if not os.path.exists(os.path.join(SF1_DIR, "_SYNTH_COMPLETE")):
        sys.exit(f"sf1 synth missing at {SF1_DIR} — run bench.py once first")
    import subprocess

    for thr in (os.environ.get("SPARK_GRAFT_OHA_FALLBACK", str(1 << 20)), "128"):
        print(f"fallbackThreshold={thr} driver_mem="
              f"{os.environ.get('SPARK_GRAFT_DRIVER_MEM', '16g')}", flush=True)
        code = subprocess.call(
            [sys.executable, __file__, "--child", thr, *names],
            env=os.environ,
        )
        if code != 0:
            print(f"  FAILED (exit {code}) — fallback={thr} OOMed or crashed",
                  flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        run_one(sys.argv[2], sys.argv[3:])
    else:
        main()
