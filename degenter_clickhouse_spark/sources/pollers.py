"""Reference-shaped RPC/LCD/FX pollers — the landing-zone PRODUCER
side of the engine (the reference's indexer/jobs processes).

The Spark engine's ingest contract is a directory of JSON-line shard
files (streaming/pipeline.py tails the raw-blocks landing zone;
FX/price rows land the same way); the reference's contract is a
ClickHouse INSERT. These pollers are the glue between a live chain and
that directory: pure-stdlib (urllib) driver-side loops, no Spark in
the hot path, with the reference's failover/backoff/checkpoint
semantics reproduced exactly and every HTTP call injectable for
testing (tests/test_pollers.py drives them against a stdlib
http.server double).

Reference parity map:

* ``HttpJson``      — endpoint rotation + 1.5x exponential backoff
                      capped at 10 s with jitter, 429/5xx retried
                      (lib/lcd.js:9-26, lib/rpc.js:11-28)
* ``LcdClient``     — denoms_metadata / factory denom / denom_owners
                      pagination / base64 smart query / IBC trace
                      (lib/lcd.js:30-51)
* ``RpcClient``     — /status /block /block_results + unwrap helpers
                      (lib/rpc.js:31-40)
* ``FileCheckpoint``— the index_state('block') row as an atomic local
                      file (core/checkpoint.js:4-24)
* ``BlockPoller``   — the start-indexer loop: tip from /status, resume
                      from checkpoint, fetch block+results per height
                      in bounded batches, land RAW_SCHEMA JSON lines
                      (bin/start-indexer.js:13-60). At-least-once by
                      design: the checkpoint advances AFTER the shard
                      file is atomically visible, and the Spark ingest
                      dedupes by height (ST2), so a crash between
                      write and checkpoint re-lands a shard harmlessly.
* ``FxPoller``      — CMC quote poll -> minute-truncated
                      exchange_rates row (jobs/fx-zig.js:13-59)
* ``PriceFromReservesJob`` — LCD smart-query pool reserves for
                      uzig-quoted pools, price = (Rq/1e6)/(Rb/10^exp),
                      skip-when-meta-missing (jobs/price-from-reserves.js:26-60,
                      core/prices.js:72-92 — same formula as
                      functions/business.price_from_reserves)
"""

from __future__ import annotations

import base64
import json
import os
import random
import time
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Callable, Sequence


def _urllib_transport(url: str, headers: dict | None = None) -> tuple[int, bytes]:
    req = urllib.request.Request(url, headers={"accept": "application/json", **(headers or {})})
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:  # non-2xx still carries a status
        return e.code, e.read()


class HttpJson:
    """Endpoint-failover JSON GET with the reference's retry policy
    (lib/lcd.js:9-26): each call starts from a rotating endpoint
    index; 429/5xx (and transport errors) retry the NEXT endpoint
    after ``min(base * 1.5^attempt, cap) + jitter`` seconds. The
    reference retries forever; ``max_attempts`` bounds it here so a
    dead endpoint set fails loudly instead of hanging a job."""

    def __init__(
        self,
        endpoints: Sequence[str],
        transport: Callable[[str, dict | None], tuple[int, bytes]] | None = None,
        max_attempts: int = 8,
        base_backoff_s: float = 1.0,
        max_backoff_s: float = 10.0,
        sleep: Callable[[float], None] = time.sleep,
        rng: random.Random | None = None,
    ) -> None:
        if not endpoints:
            raise ValueError("no endpoints configured")
        self.endpoints = list(endpoints)
        self.transport = transport or _urllib_transport
        self.max_attempts = max_attempts
        self.base_backoff_s = base_backoff_s
        self.max_backoff_s = max_backoff_s
        self.sleep = sleep
        self.rng = rng or random.Random()
        self._idx = 0

    def get(self, path: str, headers: dict | None = None) -> dict:
        start = self._idx
        self._idx += 1
        last: Exception | None = None
        for attempt in range(self.max_attempts):
            base = self.endpoints[(start + attempt) % len(self.endpoints)]
            try:
                status, body = self.transport(f"{base}{path}", headers)
                if status == 429 or status >= 500:
                    raise RuntimeError(f"HTTP {status}")
            except Exception as e:  # noqa: BLE001 — retry loop, re-raised below
                last = e
                if attempt + 1 >= self.max_attempts:
                    break  # no further attempt: fail now, don't sleep
                backoff = min(
                    self.base_backoff_s * (1.5 ** attempt), self.max_backoff_s
                ) + self.rng.random() * 0.25
                self.sleep(backoff)
                continue
            # Parse OUTSIDE the retry classification (ADVICE r8): a
            # permanent non-retryable 4xx whose body is not JSON (an
            # HTML error page from a proxy/LB) must fail fast with the
            # real status+body, not burn max_attempts x backoff sleeps
            # retrying every endpoint. Non-retryable 4xx bodies that
            # ARE JSON return parsed, like the reference (an LCD 404
            # is a legitimate "denom not found" answer consumed by
            # callers, lib/lcd.js:17-18).
            try:
                return json.loads(body)
            except json.JSONDecodeError as e:
                raise RuntimeError(
                    f"non-JSON response (HTTP {status}) for {path}: "
                    f"{body[:200]!r}"
                ) from e
        raise RuntimeError(
            f"all {self.max_attempts} attempts failed for {path}: {last}"
        )


class LcdClient:
    """lib/lcd.js:30-51 — the five LCD helpers the jobs use."""

    def __init__(self, http: HttpJson) -> None:
        self.http = http

    def denoms_metadata(self, denom: str) -> dict:
        return self.http.get(
            f"/cosmos/bank/v1beta1/denoms_metadata/{urllib.parse.quote(denom, safe='')}"
        )

    def factory_denom(self, denom: str) -> dict:
        return self.http.get(
            f"/zigchain/factory/denom/{urllib.parse.quote(denom, safe='')}"
        )

    def denom_owners(self, denom: str, next_key: str | None = None) -> dict:
        q = (
            f"?pagination.key={urllib.parse.quote(next_key, safe='')}"
            if next_key
            else ""
        )
        return self.http.get(
            f"/cosmos/bank/v1beta1/denom_owners/{urllib.parse.quote(denom, safe='')}{q}"
        )

    def smart(self, contract: str, msg: dict) -> dict:
        b64 = base64.b64encode(json.dumps(msg).encode()).decode()
        return self.http.get(f"/cosmwasm/wasm/v1/contract/{contract}/smart/{b64}")

    def ibc_denom_trace(self, ibc_id: str) -> dict:
        full = ibc_id if (ibc_id or "").startswith("ibc/") else f"ibc/{ibc_id}"
        return self.http.get(
            f"/ibc/apps/transfer/v1/denoms/{urllib.parse.quote(full, safe='')}"
        )


class RpcClient:
    """lib/rpc.js:31-40 — Tendermint RPC surface + unwrap helpers."""

    def __init__(self, http: HttpJson) -> None:
        self.http = http

    def status(self) -> dict:
        return self.http.get("/status")

    def block(self, height: int) -> dict:
        return self.http.get(f"/block?height={int(height)}")

    def block_results(self, height: int) -> dict:
        return self.http.get(f"/block_results?height={int(height)}")

    @staticmethod
    def unwrap_status(j: dict) -> int | None:
        h = (
            (j.get("result") or {}).get("sync_info", {}).get("latest_block_height")
            or (j.get("sync_info") or {}).get("latest_block_height")
        )
        try:
            return int(h)
        except (TypeError, ValueError):
            return None

    @staticmethod
    def unwrap_block(j: dict) -> dict | None:
        blk = (j.get("result") or {}).get("block")
        if not blk:
            return None
        return {
            "header": blk.get("header") or {},
            "txs": (blk.get("data") or {}).get("txs") or [],
        }


class FileCheckpoint:
    """core/checkpoint.js:4-24 as an atomic local file (the engine's
    deployment stores one cursor per consumer next to its output —
    same pattern as the JobsRunner's CDC cursor)."""

    def __init__(self, path: str) -> None:
        self.path = path

    def read(self) -> int | None:
        """None ONLY when no checkpoint exists (fresh start). A file
        that exists but cannot be parsed raises: treating a corrupt
        cursor as 'fresh' would silently jump the poller to the chain
        tip and lose the gap (or force a full partials rebuild)."""
        if not os.path.exists(self.path):
            return None
        with open(self.path) as fh:
            content = fh.read().strip()
        try:
            return int(content)
        except ValueError as e:
            raise RuntimeError(
                f"corrupt checkpoint {self.path!r}: {content[:80]!r} — "
                "restore or delete it explicitly to restart fresh"
            ) from e

    def write(self, height: int) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(int(height)))
        os.replace(tmp, self.path)


def _atomic_write_lines(path: str, lines: list[str]) -> None:
    # the stream tail must never observe a half-written shard: write
    # to a dotfile (ignored by Spark's file source) and rename
    tmp = os.path.join(os.path.dirname(path), "." + os.path.basename(path) + ".tmp")
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    os.replace(tmp, path)


class BlockPoller:
    """bin/start-indexer.js:13-60: follow the chain tip, fetch
    block + block_results per height, and land RAW_SCHEMA-shaped JSON
    lines (sources/blocks.RAW_SCHEMA) into ``landing_dir`` — one shard
    file per drained batch, atomically visible. ``run(max_blocks=N)``
    is the bounded test/batch mode (the reference's MAX_BLOCKS env)."""

    def __init__(
        self,
        rpc: RpcClient,
        landing_dir: str,
        checkpoint: FileCheckpoint,
        pipeline_depth: int = 3,
        poll_sleep_s: float = 0.4,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.rpc = rpc
        self.landing_dir = landing_dir
        self.checkpoint = checkpoint
        self.pipeline_depth = max(1, pipeline_depth)
        self.poll_sleep_s = poll_sleep_s
        self.sleep = sleep
        os.makedirs(landing_dir, exist_ok=True)

    def _raw_line(self, height: int) -> str:
        blk = RpcClient.unwrap_block(self.rpc.block(height))
        if blk is None:
            raise RuntimeError(f"block {height}: no result.block")
        res = self.rpc.block_results(height)
        txs_results = (res.get("result") or {}).get("txs_results") or []
        return json.dumps(
            {
                "height": height,
                "time": (blk["header"] or {}).get("time"),
                "txs": blk["txs"],
                "tx_results": [
                    {"events": (t or {}).get("events") or []} for t in txs_results
                ],
            }
        )

    def run(self, max_blocks: int | None = None) -> int:
        tip = RpcClient.unwrap_status(self.rpc.status())
        if tip is None:
            raise RuntimeError("status: no latest_block_height")
        saved = self.checkpoint.read()
        current = (saved + 1) if saved is not None else tip
        landed = 0
        while max_blocks is None or landed < max_blocks:
            if current > tip:
                tip2 = RpcClient.unwrap_status(self.rpc.status())
                if tip2 is not None:
                    tip = tip2
                if current > tip:
                    if max_blocks is not None:
                        break  # bounded mode: caught up, stop
                    self.sleep(self.poll_sleep_s)
                    continue
            hi = min(tip, current + self.pipeline_depth - 1)
            if max_blocks is not None:
                hi = min(hi, current + (max_blocks - landed) - 1)
            lines = [self._raw_line(h) for h in range(current, hi + 1)]
            shard = os.path.join(
                self.landing_dir, f"blocks-{current:012d}-{hi:012d}.json"
            )
            _atomic_write_lines(shard, lines)
            # checkpoint AFTER the shard is visible: a crash in between
            # re-lands the shard; ingest dedupes by height (ST2)
            self.checkpoint.write(hi)
            landed += hi - current + 1
            current = hi + 1
        return landed


@dataclass
class FxPoller:
    """jobs/fx-zig.js:13-59: poll a CMC-shaped quote API and land one
    minute-truncated (ts, zig_usd) JSON line per cycle. Retries ride
    HttpJson's shared policy (429/5xx retried with capped backoff);
    a non-retryable error body surfaces as the 'no price' RuntimeError
    below — same terminal outcome as the reference's CMC-status
    raise."""

    http: HttpJson
    landing_dir: str
    api_key: str
    symbol: str = "ZIG"
    convert: str = "USD"
    now: Callable[[], datetime] = lambda: datetime.now(timezone.utc)

    def fetch_price(self) -> float:
        j = self.http.get(
            "/v1/cryptocurrency/quotes/latest"
            f"?symbol={urllib.parse.quote(self.symbol)}"
            f"&convert={urllib.parse.quote(self.convert)}",
            headers={"X-CMC_PRO_API_KEY": self.api_key},
        )
        px = (
            ((j.get("data") or {}).get(self.symbol) or {})
            .get("quote", {})
            .get(self.convert, {})
            .get("price")
        )
        if px is None or not isinstance(px, (int, float)):
            raise RuntimeError("CMC returned no price")
        return float(px)

    def once(self) -> float:
        px = self.fetch_price()
        ts = self.now().replace(second=0, microsecond=0)
        os.makedirs(self.landing_dir, exist_ok=True)
        shard = os.path.join(
            self.landing_dir, f"fx-{ts.strftime('%Y%m%d%H%M')}.json"
        )
        _atomic_write_lines(
            shard,
            [json.dumps({"ts": ts.strftime("%Y-%m-%d %H:%M:%S"), "zig_usd": px})],
        )
        return px


class PriceFromReservesJob:
    """jobs/price-from-reserves.js:26-60: for every uzig-quoted pool
    whose base token has an exponent (wait-for-meta skip otherwise),
    smart-query the pair contract's reserves and land
    (pool_id, price_in_zig, created_at) rows. The price formula is
    core/prices.js:72-92 — identical to
    functions/business.price_from_reserves, asserted in tests.

    ``pools`` rows are dicts with pool_id / pair_contract /
    base_denom / base_exp — the dimension-sized SELECT the reference
    runs each cycle; the caller collects them from the pools dim."""

    def __init__(
        self,
        lcd: LcdClient,
        landing_dir: str,
        now: Callable[[], datetime] = lambda: datetime.now(timezone.utc),
    ) -> None:
        self.lcd = lcd
        self.landing_dir = landing_dir
        self.now = now
        os.makedirs(landing_dir, exist_ok=True)

    @staticmethod
    def price_from_reserves(base_denom: str, base_exp: int, reserves: dict) -> float | None:
        assets = (reserves.get("data") or reserves).get("assets") or []
        rq = rb = None
        for a in assets:
            amt, den = a.get("amount"), a.get("denom")
            if den == "uzig":
                rq = int(amt)
            elif den == base_denom:
                rb = int(amt)
        if rq is None or rb is None:
            return None
        rq_d = rq / 10.0 ** 6  # quote exponent fixed at 6 (uzig)
        rb_d = rb / 10.0 ** int(base_exp)
        return (rq_d / rb_d) if rb_d != 0 else None

    def once(self, pools: list[dict]) -> int:
        ts = self.now().strftime("%Y-%m-%d %H:%M:%S")
        rows: list[str] = []
        for p in pools:
            if p.get("base_exp") is None:  # wait-for-meta
                continue
            reserves = self.lcd.smart(p["pair_contract"], {"pool": {}})
            px = self.price_from_reserves(
                p["base_denom"], int(p["base_exp"]), reserves
            )
            if px is None:
                continue
            rows.append(
                json.dumps(
                    {
                        "pool_id": p["pool_id"],
                        "price_in_zig": px,
                        "created_at": ts,
                    }
                )
            )
        if rows:
            shard = os.path.join(
                self.landing_dir,
                f"prices-{self.now().strftime('%Y%m%d%H%M%S%f')}.json",
            )
            _atomic_write_lines(shard, rows)
        return len(rows)
