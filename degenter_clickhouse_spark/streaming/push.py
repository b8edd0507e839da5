"""Client push streams (S14/ST9 — api/ws.js:1-344).

The reference pushes two stream kinds over a WebSocket:

* ``ohlcv``  — ``snapshot.ohlcv`` (200 bars + stepSec/lockSec meta),
  then ``ohlcv.delta`` upserts every ~1 s: the recent CLOSED tf tail
  (3 buckets of overlap) with the still-FORMING bucket synthesized
  from 1m bars for tf > 1m (api/ws.js:83-95,118-170);
* ``trades`` — ``snapshot.trades`` (last 200 within 24 h), then
  ``trades.append`` every 2 s with rows after the last seen time
  cursor (api/ws.js:197-252).

This module is the engine's serving-edge equivalent: the same message
protocol (types, field names, seq/lockSec bookkeeping) pushed over
Server-Sent Events — the stdlib-only push transport (the sandbox has
no websocket package; SSE is one-directional, which is all ws.js's
server→client data path uses; subscriptions ride the request URL
instead of a subscribe message). Each connection gets its own thread
(ThreadingHTTPServer), its own stream state, and its own tick loop;
data access goes through injected provider callables so the server is
testable without Spark and wires to the engine for real serving
(``engine_provider``). Per-tick Spark work collects at most a few
hundred rows — the S12 serving-edge contract.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

TF_STEP = {
    "1m": 60, "5m": 300, "15m": 900, "30m": 1800,
    "1h": 3600, "4h": 14400, "1d": 86400,
}  # api/ws.js:14


def valid_tf(tf: str | None) -> str:
    t = str(tf or "1m").lower()
    return t if t in TF_STEP else "1m"  # api/ws.js:15


def _floor(t: int, step: int) -> int:
    return (t // step) * step


def aggregate_forming_from_1m(bucket_start: int, mins: list[dict]) -> dict | None:
    """ws.js aggregateFormingFrom1m (api/ws.js:83-95): fold the current
    bucket's 1m bars into one forming bar; the first minute's open
    participates in high/low exactly as the reference does."""
    if not mins:
        return None
    open_ = mins[0]["open"]
    highs = [open_] + [m["high"] for m in mins]
    lows = [open_] + [m["low"] for m in mins]
    return {
        "tsSec": bucket_start,
        "open": open_,
        "high": max(highs),
        "low": min(lows),
        "close": mins[-1]["close"],
        "volume": sum(m.get("volume") or 0 for m in mins),
        "trades": sum(m.get("trades") or 0 for m in mins),
    }


class OhlcvStream:
    """One subscriber's OHLCV stream state (api/ws.js:46-195).

    ``bars_fn(token_id, step_sec, from_sec, to_sec) -> list[dict]``
    returns closed+current bars with keys (tsSec, open, high, low,
    close, volume, trades), ascending by tsSec.
    """

    def __init__(self, stream_id, token_id, tf, bars_fn, now_fn=None):
        self.id = stream_id
        self.token_id = token_id
        self.tf = valid_tf(tf)
        self.step = TF_STEP[self.tf]
        self.bars_fn = bars_fn
        self.now_fn = now_fn or (lambda: int(time.time()))
        self.seq = 0
        self.lock_sec: int | None = None

    def snapshot(self) -> dict:
        end = self.now_fn()
        bars = self.bars_fn(self.token_id, self.step, end - 200 * self.step, end)
        self.lock_sec = _floor(end, self.step) - self.step  # api/ws.js:108
        self.seq += 1
        return {
            "type": "snapshot.ohlcv",
            "streamId": self.id,
            "meta": {"stepSec": self.step, "lockSec": self.lock_sec},
            "bars": bars,
            "seq": self.seq,
        }

    def delta(self) -> dict | None:
        end = self.now_fn()
        last_closed = _floor(end, self.step) - self.step
        if self.lock_sec is None or last_closed > self.lock_sec:
            self.lock_sec = last_closed  # api/ws.js:121-122
        # recent closed tf tail with 3 buckets of overlap (api/ws.js:125)
        tail = self.bars_fn(self.token_id, self.step, end - 3 * self.step, end)
        forming = None
        if self.step > 60:  # forming synthesized from 1m (api/ws.js:134-144)
            bucket_start = _floor(end, self.step)
            mins = self.bars_fn(self.token_id, 60, bucket_start, end - 1)
            forming = aggregate_forming_from_1m(bucket_start, mins)
        upserts = list(tail)
        if forming is not None:  # upsert over the tail bucket (ws.js:147-150)
            for i, b in enumerate(upserts):
                if b["tsSec"] == forming["tsSec"]:
                    upserts[i] = forming
                    break
            else:
                upserts.append(forming)
        if not upserts:
            return None
        self.seq += 1
        return {
            "type": "ohlcv.delta",
            "streamId": self.id,
            "upserts": upserts,
            "lockSec": self.lock_sec,
            "seq": self.seq,
        }


class TradesStream:
    """One subscriber's trades stream (api/ws.js:197-252).

    ``trades_fn(token_id, start_sec, end_sec, limit) -> list[dict]``
    returns rows with at least a ``time`` key (epoch seconds),
    ascending by time.
    """

    def __init__(self, stream_id, token_id, trades_fn, now_fn=None):
        self.id = stream_id
        self.token_id = token_id
        self.trades_fn = trades_fn
        self.now_fn = now_fn or (lambda: int(time.time()))
        self.seq = 0
        self.last_time: float | None = None

    def snapshot(self) -> dict:
        now = self.now_fn()
        items = self.trades_fn(self.token_id, now - 24 * 3600, now, 200)
        # The stream is SHARED across subscribers (one hub per token):
        # only the FIRST snapshot may establish the cursor, and it is
        # never reset — a later subscriber's snapshot jumping last_time
        # forward would permanently skip, for every EXISTING subscriber,
        # any trade between their cursor and that snapshot's newest row,
        # and an empty 24 h snapshot resetting it to None would re-send
        # up to 200 historical rows to everyone (ADVICE r12 #2). A late
        # joiner may see its snapshot's newest rows again in the next
        # delta; ws.js clients append idempotently by design.
        if self.last_time is None and items:
            self.last_time = items[-1]["time"]
        self.seq += 1
        return {
            "type": "snapshot.trades",
            "streamId": self.id,
            "items": items,
            "seq": self.seq,
        }

    def delta(self) -> dict | None:
        now = self.now_fn()
        # a never-set cursor (quiet token: every snapshot so far was
        # empty) polls the trailing 24 h, not all of history — ws.js's
        # tick omits startTime and the REST layer defaults the window
        # to tf=24h server-side (api/routes/trades.js windowOpts);
        # epoch-0 here would make every 2 s tick plan an unbounded
        # dt-partition scan for exactly the tokens with no data
        start = (
            self.last_time if self.last_time is not None else now - 24 * 3600
        )
        items = self.trades_fn(self.token_id, start, now, 200)
        # cursor is exclusive on re-poll (ws.js refetches from lastIso
        # inclusive and relies on client-side idempotent append; an
        # explicit strict filter keeps the SSE stream duplicate-free)
        if self.last_time is not None:
            items = [r for r in items if r["time"] > self.last_time]
        if not items:
            return None
        self.last_time = items[-1]["time"]
        self.seq += 1
        return {
            "type": "trades.append",
            "streamId": self.id,
            "items": items,
            "seq": self.seq,
        }


class _Hub:
    """One SHARED stream per (kind, token, tf), fanned out to every
    subscriber. The reference ticks per CONNECTION (each OhlcvStream
    owns a timer, api/ws.js:166) — fine for a node process proxying a
    REST cache, fatal here where every tick is a Spark job: 1000
    subscribers to the same candle stream must cost ONE ~1 s serving
    plan per tick, not 1000. Deltas compute once under the hub lock
    and replicate into per-subscriber queues; a hub with no
    subscribers left exits its ticker thread and deregisters."""

    def __init__(self, stream, interval: float, stopping: threading.Event):
        self.stream = stream
        self.interval = interval
        self.stopping = stopping
        self.lock = threading.Lock()
        self.subs: dict[int, "queue.SimpleQueue"] = {}
        self._next = 0
        self._thread: threading.Thread | None = None

    def subscribe(self):
        import queue

        with self.lock:
            self._next += 1
            q = queue.SimpleQueue()
            self.subs[self._next] = q
            # the ticker clears _thread (under this lock) when it exits
            # on empty subs, so this check can't race a dying ticker
            if self._thread is None:
                self._thread = threading.Thread(target=self._run, daemon=True)
                self._thread.start()
            return self._next, q

    def unsubscribe(self, sub_id: int) -> bool:
        """Remove one subscriber; True when the hub is now empty."""
        with self.lock:
            self.subs.pop(sub_id, None)
            return not self.subs

    def snapshot(self) -> dict:
        with self.lock:
            return self.stream.snapshot()

    def _run(self):
        while not self.stopping.is_set():
            self.stopping.wait(self.interval)
            if self.stopping.is_set():
                return
            with self.lock:
                if not self.subs:
                    self._thread = None  # last subscriber left
                    return
                msg = self.stream.delta()  # ONE computation per tick
                if msg is None:
                    continue
                for q in self.subs.values():
                    q.put(msg)


def _make_handler(server):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # silence per-request stderr spam
            pass

        def _event(self, payload: dict) -> bytes:
            return ("data: " + json.dumps(payload) + "\n\n").encode()

        def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler API
            import queue

            u = urlparse(self.path)
            if u.path != "/stream":
                self.send_error(404)
                return
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            kind = q.get("kind", "ohlcv").lower()
            token_id = q.get("token_id") or q.get("tokenId")
            if not token_id:
                self.send_error(400, "missing token_id")  # ws.js:288
                return
            if kind == "ohlcv":
                tf = valid_tf(q.get("tf"))

                def factory(sid):
                    return OhlcvStream(
                        sid, token_id, tf, server.bars_fn, server.now_fn
                    )

                interval = server.ohlcv_tick_sec
            elif kind == "trades":
                tf = ""

                def factory(sid):
                    return TradesStream(
                        sid, token_id, server.trades_fn, server.now_fn
                    )

                interval = server.trades_tick_sec
            else:
                self.send_error(400, f"unknown stream kind: {kind}")  # ws.js:313
                return
            hub = server.hub((kind, token_id, tf), factory, interval)
            sub_id, inbox = hub.subscribe()
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-store")
            self.send_header("Connection", "close")
            self.end_headers()
            try:
                # hello + snapshot-then-deltas, exactly the ws.js order
                self.wfile.write(self._event({"type": "hello"}))
                self.wfile.write(self._event(hub.snapshot()))
                self.wfile.flush()
                while not server.stopping.is_set():
                    try:
                        msg = inbox.get(timeout=0.5)
                    except queue.Empty:
                        continue
                    self.wfile.write(self._event(msg))
                    self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError):
                pass  # client went away — ws.js 'close' teardown
            finally:
                if hub.unsubscribe(sub_id):
                    server.drop_hub((kind, token_id, tf), hub)

    return Handler


class PushServer:
    """SSE push server. ``GET /stream?kind=ohlcv&token_id=T&tf=5m`` or
    ``kind=trades`` — one long-lived response per subscription, the
    URL playing ws.js's subscribe message. Cadences default to the
    reference's (~1 s ohlcv ticks, 2 s trades ticks; api/ws.js:166,249).
    """

    def __init__(
        self,
        bars_fn,
        trades_fn,
        host: str = "127.0.0.1",
        port: int = 0,
        ohlcv_tick_sec: float = 1.0,
        trades_tick_sec: float = 2.0,
        now_fn=None,
    ):
        self.bars_fn = bars_fn
        self.trades_fn = trades_fn
        self.ohlcv_tick_sec = ohlcv_tick_sec
        self.trades_tick_sec = trades_tick_sec
        self.now_fn = now_fn or (lambda: int(time.time()))
        self.stopping = threading.Event()
        self._sid = 0
        self._sid_lock = threading.Lock()
        self._hubs: dict = {}
        self._hubs_lock = threading.Lock()
        self._httpd = ThreadingHTTPServer((host, port), _make_handler(self))
        self._httpd.daemon_threads = True
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def next_stream_id(self) -> str:
        with self._sid_lock:
            self._sid += 1
            return f"s{self._sid}"  # ws.js newStreamId

    def hub(self, key, factory, interval: float) -> _Hub:
        """Get-or-create the shared stream hub for (kind, token, tf)."""
        with self._hubs_lock:
            h = self._hubs.get(key)
            if h is None:
                h = _Hub(factory(self.next_stream_id()), interval, self.stopping)
                self._hubs[key] = h
            return h

    def drop_hub(self, key, hub: _Hub) -> None:
        """Deregister an emptied hub. Identity-checked (a NEW hub under
        the same key must survive) and re-checked for subscribers under
        the hub lock — a client that grabbed this hub from the registry
        between the last unsubscribe and this call keeps it live."""
        with self._hubs_lock:
            if self._hubs.get(key) is not hub:
                return
            with hub.lock:
                if hub.subs:
                    return
            del self._hubs[key]

    @property
    def active_hubs(self) -> int:
        with self._hubs_lock:
            return len(self._hubs)

    def start(self) -> "PushServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self.stopping.set()
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)


def engine_provider(engine, zig_usd=None):
    """(bars_fn, trades_fn) backed by a DegenterEngine — each call is
    one small serving-edge plan (bounded collect: <= a few hundred
    rows). Bars ride the engine's ohlcv pipeline (resample + prev
    fill, price_source='all'); trades ride the bounded trades feed
    (dt-pruned by ts_from/ts_to)."""
    from datetime import datetime, timezone

    from pyspark.sql import functions as F

    def _ts(sec: int):
        return F.lit(
            datetime.fromtimestamp(int(sec), tz=timezone.utc).strftime(
                "%Y-%m-%d %H:%M:%S"
            )
        ).cast("timestamp")

    def bars_fn(token_id, step_sec, from_sec, to_sec):
        if to_sec <= from_sec:
            return []  # e.g. the forming fetch 1 s into a fresh bucket
        rows = (
            engine.ohlcv(int(token_id), step_sec, _ts(from_sec), _ts(to_sec))
            .orderBy("bucket")
            .collect()
        )
        return [
            {
                "tsSec": int(r.bucket.replace(tzinfo=timezone.utc).timestamp()),
                "open": r.open, "high": r.high, "low": r.low,
                "close": r.close, "volume": r.volume,
                "trades": r.trade_count,
            }
            for r in rows
            if not r.is_gap
        ]

    def trades_fn(token_id, start_sec, end_sec, limit):
        # token scoping happens INSIDE the feed plan (trades_feed's
        # token_id filter: broadcast semi-join on the token's base
        # pools, the reference's `b.token_id = $n` scope) — the
        # combined router output carries no token column, so any
        # post-hoc column filter here would silently no-op and leak
        # the GLOBAL feed to every subscriber (ADVICE r12 #1).
        feed = engine.trades_feed(
            zig_usd if zig_usd is not None else F.lit(0.0),
            ts_from=_ts(start_sec),
            ts_to=_ts(end_sec),
            token_id=int(token_id),
        )
        out = feed.orderBy(F.col("created_at").desc()).limit(limit).collect()
        out.reverse()  # ascending, like ws.js fetchRecent's sort
        # full shaped rows, like /trades/recent's payload the reference
        # streams verbatim (api/ws.js:213-219 items are shapeRow +
        # combineRouterTradesShallow output, not bare cursors)
        return [
            {
                "time": r.created_at.replace(tzinfo=timezone.utc).timestamp(),
                "tx_hash": r.tx_hash,
                "is_router": r.is_router,
                "n_legs": r.n_legs,
                "direction": r.direction,
                "signer": r.signer,
                "path": list(r.path or []),
                "amount_in": r.amount_in_disp,
                "amount_out": r.amount_out_disp,
                "worth_zig": r.worth_zig,
                "trade_class": r.trade_class,
            }
            for r in out
        ]

    return bars_fn, trades_fn
