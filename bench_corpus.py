#!/usr/bin/env python
"""Streaming-corpus ingest throughput: synthesize document shards into
a landing zone, drain them through ``stream_corpus_ingest`` with ONLINE
near-dedup enabled (content-hash dedupe -> quality gate -> MinHash
index probe -> idempotent batch-scoped sinks), and report docs/second.

The synthetic stream plants one exact duplicate and one near-duplicate
per 20 docs so every stage does real work; batches land as separate
files so ``availableNow`` drains them as one multi-file run.

    python bench_corpus.py [n_docs] [n_shards]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from degenter_clickhouse_spark.session import build_session  # noqa: E402
from degenter_clickhouse_spark.streaming.corpus import stream_corpus_ingest  # noqa: E402

WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega spark shuffle "
    "partition executor adaptive broadcast parquet arrow vector column"
).split()


def _text(i: int) -> str:
    # 24-word deterministic doc; every 20th is a near-dup of its
    # predecessor (one word changed), every 19th an exact dup
    if i % 20 == 19 and i > 0:
        return _text(i - 1)
    if i % 20 == 18 and i > 0:
        prev = _text(i - 1).split()
        prev[5] = "changed"
        return " ".join(prev)
    # XOR-mixed word picks: per-position choices decorrelate across
    # docs, so unplanted pairs share almost no 3-gram shingles
    base = [f"id{i}"] + [
        WORDS[((i * 73856093) ^ (j * 19349663) ^ (i >> 4)) % len(WORDS)]
        for j in range(24)
    ]
    return " ".join(base)


def make_shards(landing: Path, n_docs: int, n_shards: int) -> None:
    per = max(n_docs // n_shards, 1)
    for s in range(n_shards):
        lo, hi = s * per, min((s + 1) * per, n_docs)
        lines = [
            json.dumps(
                {
                    "doc_id": i,
                    "text": _text(i),
                    "lang": "en",
                    "source": f"src{i % 4}",
                    "n_chars": len(_text(i)),
                    "event_ts": f"2024-01-01 10:{(i // 60) % 60:02d}:{i % 60:02d}",
                }
            )
            for i in range(lo, hi)
        ]
        (landing / f"shard{s:03d}.json").write_text("\n".join(lines))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = build_session(app_name="degenter-corpus-bench")
    spark.sparkContext.setLogLevel("FATAL")
    work = Path(tempfile.mkdtemp(prefix="corpus_bench_"))
    try:
        landing = work / "landing"
        landing.mkdir()
        make_shards(landing, n_docs, n_shards)
        out, ckpt = str(work / "out"), str(work / "ckpt")
        t0 = time.perf_counter()
        stream_corpus_ingest(
            spark, str(landing), out, ckpt, near_dup_threshold=0.5
        )
        dt = time.perf_counter() - t0
        accepted = spark.read.parquet(f"{out}/accepted").count()
        try:
            quarantined = spark.read.parquet(f"{out}/quarantine").count()
        except Exception:
            quarantined = 0
        print(
            json.dumps(
                {
                    "metric": "corpus_ingest_docs_per_sec",
                    "value": round(n_docs / dt, 1),
                    "unit": "docs/sec",
                    "wall_sec": round(dt, 2),
                    "docs": n_docs,
                    "accepted": accepted,
                    "quarantined": quarantined,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
