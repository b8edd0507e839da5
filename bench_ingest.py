#!/usr/bin/env python
"""Ingest-path throughput: synthesize raw blocks (swap events in the
reference's wasm-attribute shape), run the full batch ingest
(parse -> dedupe -> dims -> facts -> derived prices/state/candles), and
report events/second.

Reference envelope for comparison (BASELINE.md): the Node indexer's
batch sinks flush 800 rows / 120 ms (~6.6k rows/s ceiling per sink)
with 12-way task concurrency.

    python bench_ingest.py [n_blocks] [swaps_per_block]
"""

from __future__ import annotations

import base64
import json
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from degenter_clickhouse_spark.session import build_session  # noqa: E402
from degenter_clickhouse_spark.sources import blocks  # noqa: E402

N_POOLS = 200


def _attr(k, v):
    return {"key": k, "value": str(v)}


def _swap_tx(height, i):
    pool = (height * 7 + i) % N_POOLS
    contract = f"zig1pool{pool:05d}"
    return [
        {"type": "message", "attributes": [_attr("sender", f"zig1user{i % 997}"), _attr("msg_index", 0)]},
        {
            "type": "wasm",
            "attributes": [
                _attr("action", "swap"),
                _attr("_contract_address", contract),
                _attr("offer_asset", "uzig"),
                _attr("offer_amount", 1000000 + i),
                _attr("ask_asset", f"coin.zig1f{pool}.utok{pool}"),
                _attr("return_amount", 500000 + i),
                _attr("msg_index", 0),
                _attr("reserve_asset1_denom", "uzig"),
                _attr("reserve_asset1_amount", 10_000_000_000 + i),
                _attr("reserve_asset2_denom", f"coin.zig1f{pool}.utok{pool}"),
                _attr("reserve_asset2_amount", 5_000_000_000 - i),
            ],
        },
    ]


def _pair_tx(pool):
    contract = f"zig1pool{pool:05d}"
    return [
        {"type": "message", "attributes": [_attr("sender", "zig1creator"), _attr("msg_index", 0)]},
        {
            "type": "wasm",
            "attributes": [
                _attr("action", "create_pair"),
                _attr("_contract_address", contract),
                _attr("pair", f"coin.zig1f{pool}.utok{pool}-uzig"),
                _attr("pair_type", "xyk"),
                _attr("msg_index", 0),
            ],
        },
    ]


def make_blocks(n_blocks: int, swaps_per_block: int) -> list[str]:
    out = []
    for h in range(1, n_blocks + 1):
        txs = []
        if h == 1:  # create all pools up front
            txs = [_pair_tx(p) for p in range(N_POOLS)]
        txs += [_swap_tx(h, i) for i in range(swaps_per_block)]
        minute = h // 12  # ~5s blocks
        out.append(
            json.dumps(
                {
                    "height": h,
                    "time": f"2024-06-01T{(minute // 60) % 24:02d}:{minute % 60:02d}:{(h * 5) % 60:02d}",
                    "txs": [
                        base64.b64encode(f"tx-{h}-{i}".encode()).decode()
                        for i in range(len(txs))
                    ],
                    "tx_results": [{"events": evs} for evs in txs],
                }
            )
        )
    return out


def main() -> None:
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    swaps = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    spark = build_session(app_name="degenter-ingest-bench")
    spark.sparkContext.setLogLevel("FATAL")
    lines = make_blocks(n_blocks, swaps)
    raw = spark.read.schema(blocks.RAW_SCHEMA).json(
        spark.sparkContext.parallelize(lines, 32)
    )
    raw = raw.localCheckpoint(eager=True)  # exclude synthesis from timing
    t0 = time.perf_counter()
    out = blocks.ingest(raw)
    counts = {name: df.count() for name, df in out.items()}
    dt = time.perf_counter() - t0
    total_events = n_blocks * swaps
    print(
        json.dumps(
            {
                "metric": "ingest_events_per_sec",
                "value": round(total_events / dt, 1),
                "unit": "events/sec",
                "wall_sec": round(dt, 2),
                "events": total_events,
                "rows": counts,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
