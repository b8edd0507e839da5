#!/usr/bin/env python
"""Capture .explain("formatted") for bench queries into plans/<round>/
(round dir from $SPARK_GRAFT_PLANS_DIR, default plans/r14).

Usage: python scripts/capture_plans.py [suffix] [query ...]
  suffix: "before" or "after" (default "before")
  query:  subset of bench queries (default: all BENCH_QUERIES)

Plans are captured WITHOUT executing the query (explain only), so this
is cheap and safe to run alongside other work.
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

import os

from degenter_clickhouse_spark.queries import load_registry
from degenter_clickhouse_spark.session import build_session


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = _REPO / "plans" / os.environ.get("SPARK_GRAFT_PLANS_DIR", "r14")
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = build_session(app_name="capture-plans")
    spark.sparkContext.setLogLevel("FATAL")
    reg = load_registry(extended=True)
    if len(sys.argv) > 2:
        names = sys.argv[2:]
    else:
        from bench import BENCH_QUERIES

        names = [n for n in BENCH_QUERIES if n in reg]
    for name in names:
        try:
            df = reg[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR: {type(exc).__name__}: {exc}"
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(name, "->", f"{name}_{suffix}.txt", len(plan), "chars")
    spark.stop()


if __name__ == "__main__":
    main()
