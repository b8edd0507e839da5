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
