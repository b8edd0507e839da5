"""bench_diff floor selection must never compare a round to itself
(VERDICT r8 #5)."""

from __future__ import annotations

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "bench_diff", os.path.join(REPO, "bench_diff.py")
)
bench_diff = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench_diff)


def _committed_locals() -> list[str]:
    import glob

    return sorted(glob.glob(os.path.join(REPO, "BENCH_LOCAL_r*.json")))


def test_default_floor_excludes_artifact_under_test():
    """When current IS the newest committed BENCH_LOCAL_r*.json, the
    default floor must be an OLDER artifact (or the r5 fallback) —
    never the same file."""
    arts = _committed_locals()
    assert arts, "repo should carry committed BENCH_LOCAL_r*.json artifacts"
    newest = bench_diff._default_floor(None)
    floor = bench_diff._default_floor(newest)
    assert os.path.realpath(floor) != os.path.realpath(newest)


def test_default_floor_without_current_is_newest_local():
    import re

    arts = _committed_locals()
    if not arts:
        return
    got = bench_diff._default_floor(None)
    nums = []
    for p in arts:
        m = re.search(r"_r(\d+)\.json$", p)
        nums.append((int(m.group(1)) if m else -1, p))
    assert os.path.realpath(got) == os.path.realpath(max(nums)[1])


def test_cli_self_comparison_picks_previous_floor(tmp_path, capsys, monkeypatch):
    """End-to-end: run main() with current == newest local artifact in
    a synthetic repo dir; the printed PASS/FAIL line must cite the
    older round's file."""
    import sys

    # synthesize a repo dir with two round artifacts
    r8 = {"metric": "t", "value": 10.0, "queries": {"q1": 1.0}}
    r9 = {"metric": "t", "value": 12.0, "queries": {"q1": 1.2}}
    (tmp_path / "BENCH_LOCAL_r8.json").write_text(json.dumps(r8))
    (tmp_path / "BENCH_LOCAL_r9.json").write_text(json.dumps(r9))
    # point the module's "here" at the synthetic dir
    monkeypatch.setattr(
        bench_diff, "__file__", str(tmp_path / "bench_diff.py")
    )
    monkeypatch.setattr(
        sys, "argv", ["bench_diff.py", str(tmp_path / "BENCH_LOCAL_r9.json")]
    )
    rc = bench_diff.main()
    out = capsys.readouterr().out
    assert rc == 0
    assert "BENCH_LOCAL_r8.json" in out.splitlines()[-1]


def test_declared_floors_enforced(tmp_path, capsys, monkeypatch):
    """VERDICT r9 #7: the floor doc's committed "floors.ingest" section
    overrides its measured rates — a current run below a declared floor
    by more than FACTOR fails, one within it passes, and a
    budget-skipped current ingest section is exempt."""
    import sys

    floor_doc = {
        "metric": "t", "value": 10.0, "queries": {"q1": 1.0},
        # measured rate is LOW (noisy round); the declared floor rules
        "ingest": {"ingest_events_per_sec": 100.0},
        "floors": {"ingest": {"ingest_events_per_sec": 5000.0}},
    }
    (tmp_path / "floor.json").write_text(json.dumps(floor_doc))

    def run(cur_doc):
        (tmp_path / "cur.json").write_text(json.dumps(cur_doc))
        monkeypatch.setattr(sys, "argv", [
            "bench_diff.py", str(tmp_path / "cur.json"),
            "--floor", str(tmp_path / "floor.json"),
        ])
        rc = bench_diff.main()
        return rc, capsys.readouterr().out

    # regression: 5000/2 = 2500 is the pass line; 2000 is below it
    rc, out = run({"metric": "t", "value": 9.0, "queries": {"q1": 0.9},
                   "ingest": {"ingest_events_per_sec": 2000.0}})
    assert rc == 1 and "ingest_events_per_sec" in out

    # within factor of the declared floor: pass (even though it is
    # below the floor itself)
    rc, _ = run({"metric": "t", "value": 9.0, "queries": {"q1": 0.9},
                 "ingest": {"ingest_events_per_sec": 2600.0}})
    assert rc == 0

    # budget-skipped ingest section: exempt, not MISSING
    rc, out = run({"metric": "t", "value": 9.0, "queries": {"q1": 0.9},
                   "ingest": {"skipped_budget_exhausted": 1.0}})
    assert rc == 0 and "SKIPPED" in out
