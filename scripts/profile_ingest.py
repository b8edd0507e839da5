#!/usr/bin/env python
"""Per-phase profile of the streaming-corpus ingest path (bench floors
corpus_docs_per_sec / corpus_docs_per_sec_neardup).

Times, for one warmed drain of N docs (bench methodology):
  * total stream wall (the floor's denominator),
  * the foreachBatch body (process_corpus_batch) per batch,
  * each idempotent sink write (by table),
  * the replay-guard reads (_prior_ids),
  * everything else = structured-streaming machinery (source listing,
    stateful dedup + state-store commits, offset/commit log).

Usage: python scripts/profile_ingest.py [n_docs] [n_shards] [thr|none]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from bench_corpus import make_shards  # noqa: E402
from degenter_clickhouse_spark.session import build_session  # noqa: E402
from degenter_clickhouse_spark.streaming import corpus  # noqa: E402

TIMES: dict[str, list[float]] = defaultdict(list)


def _timed(label_fn, fn):
    def wrap(*a, **kw):
        t0 = time.perf_counter()
        try:
            return fn(*a, **kw)
        finally:
            TIMES[label_fn(*a, **kw)].append(time.perf_counter() - t0)

    return wrap


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    thr_arg = sys.argv[3] if len(sys.argv) > 3 else "0.5"
    thr = None if thr_arg == "none" else float(thr_arg)

    # instrument module internals (labels must not re-run work: the
    # label fns only look at string args)
    orig_write = corpus._idempotent_write
    corpus._idempotent_write = _timed(
        lambda df, path, batch_id, *p: f"write:{Path(path).name}", orig_write
    )
    orig_prior = corpus._prior_ids
    corpus._prior_ids = _timed(
        lambda spark, path, b, rows: f"guard:{Path(path).name}", orig_prior
    )
    orig_batch = corpus.process_corpus_batch

    def batch_wrap(spark, batch_df, batch_id, *a, **kw):
        t0 = time.perf_counter()
        try:
            return orig_batch(spark, batch_df, batch_id, *a, **kw)
        finally:
            TIMES[f"batch:{batch_id}"].append(time.perf_counter() - t0)

    corpus.process_corpus_batch = batch_wrap

    spark = build_session(app_name="profile-ingest")
    spark.sparkContext.setLogLevel("FATAL")

    # warm exactly like bench.py (state-store init + codegen dominate
    # the first micro-batch)
    work = Path(tempfile.mkdtemp(prefix="profile_corpus_warm_"))
    try:
        landing = work / "landing"
        landing.mkdir()
        make_shards(landing, 300, 1)
        corpus.stream_corpus_ingest(
            spark, str(landing), str(work / "out"), str(work / "ckpt"),
            near_dup_threshold=0.5,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.catalog.clearCache()
    TIMES.clear()

    work = Path(tempfile.mkdtemp(prefix="profile_corpus_"))
    try:
        landing = work / "landing"
        landing.mkdir()
        make_shards(landing, n_docs, n_shards)
        t0 = time.perf_counter()
        corpus.stream_corpus_ingest(
            spark, str(landing), str(work / "out"), str(work / "ckpt"),
            near_dup_threshold=thr,
        )
        total = time.perf_counter() - t0
    finally:
        shutil.rmtree(work, ignore_errors=True)

    batch_sec = sum(s for k, v in TIMES.items() if k.startswith("batch:") for s in v)
    print(f"docs={n_docs} thr={thr} total={total:.2f}s "
          f"({n_docs / total:.0f} docs/s)")
    print(f"  foreachBatch bodies : {batch_sec:.2f}s")
    print(f"  stream machinery    : {total - batch_sec:.2f}s "
          f"(listing + stateful dedup + offset/commit log)")
    for k in sorted(TIMES):
        if not k.startswith("batch:"):
            v = TIMES[k]
            print(f"    {k:<28} n={len(v):<3} sum={sum(v):.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
