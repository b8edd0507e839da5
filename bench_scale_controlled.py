#!/usr/bin/env python
"""Family-size-controlled scale probe (VERDICT r8 #7).

The standard sf1 synthesis (bench_sf1.py) replicates documents with a
tiny suffix and embeddings with a 1e-3 bump on one dimension, so every
replica stays a NEAR-DUPLICATE of its original: a planted 10-member
near-dup family becomes an effective ~100-member family at 10x data,
and the pair/verify work of the dedup trio grows quadratically in
family size BY CONSTRUCTION. Their super-linear sf1 ratios therefore
measure the planted workload, not the plan.

This probe holds family size CONSTANT while the corpus grows 10x:

* documents — every word gets a per-replica suffix, so replica r docs
  share ZERO shingles with replica 0 (families never merge across
  replicas; each replica contributes its own constant-size families);
* embeddings — each replica is translated by a large deterministic
  per-dimension offset, separating the replicas' hyperplane/IVF
  neighborhoods the same way.

If the trio's plans are healthy, controlled-10x wall-time ratios land
near (or below) the data ratio; a hidden plan cliff would survive the
control. Run manually (the per-round bench budget stays untouched):

    python bench_scale_controlled.py          # writes SCALE_CONTROLLED.json
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

from pyspark.sql import functions as F  # noqa: E402

import bench_sf1  # noqa: E402
from degenter_clickhouse_spark.queries import load_registry  # noqa: E402
from degenter_clickhouse_spark.session import build_session  # noqa: E402

PROBES = ["dedup_minhash_lsh", "knn_label_vote_blocked", "leakage_free_split"]
DST = os.environ.get("SPARK_GRAFT_SFC_DIR", "/tmp/spark_graft_sf1_controlled")
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_SFC_RUNS", "2"))


def _replica_controlled(df, name: str, r: int):
    """bench_sf1._replica with the near-dup-family control applied."""
    out = df
    for col in bench_sf1._KEY_SHIFTS.get(name, {}):
        out = out.withColumn(col, F.col(col) + F.lit(r * bench_sf1.KEY_OFF))
    if name == "events":
        out = out.withColumn("user_id", F.col("user_id") + F.lit(r * 100_000))
    if name == "documents" and r:
        # suffix EVERY word: replica docs share no shingle with any
        # other replica, so planted families keep their original size
        out = out.withColumn(
            "text",
            F.expr(
                f"array_join(transform(split(text, ' '), "
                f"x -> concat(x, '_zr{r}')), ' ')"
            ),
        ).withColumn("n_chars", F.length("text").cast("long"))
    if name == "embeddings" and r:
        # per-replica diagonal +-1 orthogonal transform (murmur sign
        # per dimension): preserves every replica's INTERNAL geometry
        # exactly (norms, pairwise cosines) while rotating replicas
        # into independent orthants — cross-replica neighbors break,
        # family size stays constant, and hyperplane buckets stay
        # BALANCED (a translation control pushed whole replicas to one
        # side of most hyperplanes and manufactured bucket skew)
        out = out.withColumn(
            "embedding",
            F.expr(
                f"transform(embedding, (x, i) -> CAST(CASE WHEN "
                f"pmod(hash(i, {r}), 2) = 0 THEN x ELSE -x END AS FLOAT))"
            ),
        )
    return out


def main() -> int:
    spark = build_session()
    reg = load_registry(extended=True)
    # synthesize the controlled corpus through bench_sf1's machinery
    # (fingerprint-guarded cache, shared dims) with the replica fn
    # swapped for the controlled one
    orig = bench_sf1._replica
    bench_sf1._replica = _replica_controlled
    try:
        synth_s = bench_sf1.synthesize(spark, SRC, DST)
    finally:
        bench_sf1._replica = orig

    def timed(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(RUNS):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            reg[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    out = {
        "metric": "scale_controlled",
        "src": SRC,
        "controlled_dir": DST,
        "synth_sec": synth_s,
        "runs": RUNS,
        "probes": {},
    }
    for name in PROBES:
        base = timed(name, SRC)
        ctrl = timed(name, DST)
        out["probes"][name] = {
            "sf0.1_sec": base,
            "controlled_10x_sec": ctrl,
            "ratio": round(ctrl / base, 2) if base > 0 else None,
        }
    line = json.dumps(out)
    print(line)
    with open(os.path.join(Path(__file__).parent, "SCALE_CONTROLLED.json"), "w") as f:
        f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
