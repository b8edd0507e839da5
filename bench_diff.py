#!/usr/bin/env python
"""Bench regression guard (VERDICT r1 item 9): compare a fresh bench.py
output line against a committed floor (previous round's BENCH_r{N}.json)
and fail if any headline query regressed more than FACTOR x.

Usage:
    python bench.py | python bench_diff.py            # vs default floor
    python bench_diff.py --floor BENCH_r02.json cur.json

The floor file may be either the driver's wrapper JSON (with a
``parsed`` key) or a raw bench.py line; the current input must be the
bench.py JSON line (last JSON-parseable line wins, so piping bench.py's
full stdout works).
"""

from __future__ import annotations

import argparse
import json
import sys

FACTOR = 2.0


def _default_floor(current: str | None = None) -> str:
    """Newest committed full-bench artifact (BENCH_LOCAL_r*.json,
    written by bench.py each round — VERDICT r7 #3) if present; the
    last driver artifact with a parsed payload otherwise.

    The artifact under test is EXCLUDED from floor selection
    (VERDICT r8 #5): once a round commits its own BENCH_LOCAL_rN.json,
    a default invocation against that same file must pick the previous
    round's floor, never compare the artifact to itself (a vacuous
    1.00x PASS)."""
    import glob
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    cur_real = os.path.realpath(current) if current else None
    locals_ = [
        p
        for p in glob.glob(os.path.join(here, "BENCH_LOCAL_r*.json"))
        if os.path.realpath(p) != cur_real
    ]
    if locals_:
        # NUMERIC round order — lexicographic would rank r9 above r10
        def rnum(p: str) -> int:
            m = re.search(r"_r(\d+)\.json$", p)
            return int(m.group(1)) if m else -1

        return max(locals_, key=rnum)
    return os.path.join(here, "BENCH_r05.json")


def load_bench(text: str) -> dict:
    doc = None
    try:  # whole-document JSON (the driver's pretty-printed wrapper)
        doc = json.loads(text)
    except json.JSONDecodeError:
        for line in text.splitlines():  # bench.py stdout: last JSON line
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                doc = json.loads(line)
            except json.JSONDecodeError:
                continue
    if doc is None:
        raise SystemExit("no JSON bench line found in input")
    if "parsed" in doc:  # driver wrapper
        doc = doc["parsed"]
    if "queries" not in doc:
        raise SystemExit("bench JSON has no 'queries' map")
    return doc


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("current", nargs="?", help="bench output file (default: stdin)")
    ap.add_argument("--floor", default=None)
    ap.add_argument("--factor", type=float, default=FACTOR)
    args = ap.parse_args()

    if args.floor is None:
        args.floor = _default_floor(args.current)
    floor = load_bench(open(args.floor).read())
    cur_text = open(args.current).read() if args.current else sys.stdin.read()
    cur = load_bench(cur_text)

    bad = []
    for name, f_sec in sorted(floor["queries"].items()):
        c_sec = cur["queries"].get(name)
        if c_sec is None:
            print(f"  MISSING  {name} (floor {f_sec:.2f}s)")
            bad.append(name)
            continue
        ratio = c_sec / f_sec if f_sec > 0 else float("inf")
        flag = "REGRESSED" if ratio > args.factor else "ok"
        print(f"  {flag:>9}  {name}: {f_sec:.2f}s -> {c_sec:.2f}s ({ratio:.2f}x)")
        if ratio > args.factor:
            bad.append(name)
    # ingest/streaming THROUGHPUT floors (higher is better): regressed
    # when current rate drops below floor / factor. DECLARED floors
    # (the floor doc's "floors.ingest" section, committed via bench.py
    # FLOORS — VERDICT r9 #7) take precedence over the floor artifact's
    # own measured rates; a current artifact whose ingest section was
    # budget-skipped is exempt (explicit marker, not a regression).
    floor_ingest = (floor.get("floors") or {}).get("ingest") or (
        floor.get("ingest") or {}
    )
    cur_ingest = cur.get("ingest") or {}
    skipped = "skipped_budget_exhausted" in cur_ingest
    for name, f_rate in sorted(floor_ingest.items()):
        if name == "skipped_budget_exhausted":
            continue
        if skipped:
            print(f"  SKIPPED  {name} (current ingest section budget-skipped)")
            continue
        c_rate = cur_ingest.get(name)
        if c_rate is None:
            print(f"  MISSING  {name} (floor {f_rate:.0f}/s)")
            bad.append(name)
            continue
        ratio = f_rate / c_rate if c_rate > 0 else float("inf")
        flag = "REGRESSED" if ratio > args.factor else "ok"
        print(f"  {flag:>9}  {name}: {f_rate:.0f}/s -> {c_rate:.0f}/s "
              f"({ratio:.2f}x slower)" if ratio > 1 else
              f"  {flag:>9}  {name}: {f_rate:.0f}/s -> {c_rate:.0f}/s")
        if ratio > args.factor:
            bad.append(name)
    t_f, t_c = floor.get("value"), cur.get("value")
    if t_f and t_c:
        print(f"total: {t_f:.2f}s -> {t_c:.2f}s ({t_c / t_f:.2f}x)")
    if bad:
        print(f"FAIL: {len(bad)} quer{'y' if len(bad) == 1 else 'ies'} regressed >"
              f"{args.factor}x vs {args.floor}: {', '.join(bad)}")
        return 1
    print(f"PASS: no query regressed >{args.factor}x vs {args.floor}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
