#!/usr/bin/env python
"""Same-session A/B of Spark conf variants over a query subset.

Usage:
  python scripts/ab_conf.py --confs "k=v,k2=v2;k=v3" q1 q2 ... [--runs N]

Each ';'-separated conf group gets its OWN session (static confs like
shuffle.partitions don't apply to a live session), run over the same
query list with the bench methodology (noop sink, cache clear between
queries, min-of-N). Group 0 with an empty string is the baseline.
Sessions run sequentially in one process: same host window, so the
per-query ratios are comparable even when absolute seconds are not.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from degenter_clickhouse_spark.queries import load_registry  # noqa: E402
from degenter_clickhouse_spark.session import build_session  # noqa: E402


def main() -> None:
    runs = 3
    confs_arg = ""
    names = []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--confs":
            confs_arg = next(it)
        elif a.startswith("--runs"):
            runs = int(a.split("=")[1])
        else:
            names.append(a)
    groups = [
        dict(kv.split("=", 1) for kv in g.split(",") if kv)
        for g in confs_arg.split(";")
    ]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    results: list[dict[str, float]] = []
    for gi, conf in enumerate(groups):
        spark = build_session(app_name=f"ab-conf-{gi}", extra_conf=conf)
        spark.sparkContext.setLogLevel("FATAL")
        reg = load_registry(extended=True)
        reg[names[0]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        timing: dict[str, float] = {}
        for name in names:
            best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                reg[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            timing[name] = best
            spark.catalog.clearCache()
            for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
                rdd.unpersist()
        results.append(timing)
        print(f"-- group {gi}: {conf}")
        for n, t in timing.items():
            base = results[0][n]
            print(f"   {n}: {t:.3f}s  ({t / base:.2f}x vs group0)")
        print(f"   TOTAL: {sum(timing.values()):.3f}s "
              f"({sum(timing.values()) / sum(results[0].values()):.2f}x)")
        spark.stop()


if __name__ == "__main__":
    main()
