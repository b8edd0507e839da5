"""S14/ST9 client push streams (api/ws.js): snapshot-then-delta OHLCV
with the forming bucket synthesized from 1m bars, and the trades
append stream with a strict time cursor — pushed over SSE (the
stdlib-only transport; the message protocol is ws.js's)."""

from __future__ import annotations

import http.client
import json

from degenter_clickhouse_spark.streaming import push as P

from .test_domain import dom  # noqa: F401


def _read_events(resp, n, max_lines=500):
    events = []
    for _ in range(max_lines):
        line = resp.fp.readline()
        if not line:
            break
        line = line.decode().strip()
        if line.startswith("data: "):
            events.append(json.loads(line[len("data: "):]))
            if len(events) >= n:
                break
    return events


def test_forming_aggregation_matches_reference():
    """aggregateFormingFrom1m (api/ws.js:83-95): the first minute's
    OPEN participates in high/low; close is the last minute's close;
    volume/trades sum; empty input -> None."""
    mins = [
        {"open": 5.0, "high": 5.5, "low": 4.9, "close": 5.2, "volume": 1.0, "trades": 2},
        {"open": 5.2, "high": 6.0, "low": 5.1, "close": 5.8, "volume": 2.0, "trades": 3},
    ]
    f = P.aggregate_forming_from_1m(1200, mins)
    assert f == {
        "tsSec": 1200, "open": 5.0, "high": 6.0, "low": 4.9,
        "close": 5.8, "volume": 3.0, "trades": 5,
    }
    # open above every minute's high: it still caps the forming high
    g = P.aggregate_forming_from_1m(
        1200, [{"open": 9.0, "high": 5.0, "low": 4.0, "close": 4.5,
                "volume": 0, "trades": 0}]
    )
    assert g["high"] == 9.0 and g["low"] == 4.0
    assert P.aggregate_forming_from_1m(1200, []) is None


def test_push_ohlcv_snapshot_then_forming_delta():
    """One SSE subscription: hello -> snapshot.ohlcv (200-bar window
    request, stepSec/lockSec meta) -> ohlcv.delta whose upserts carry
    the 3-bucket closed tail plus the forming bar synthesized from the
    current bucket's 1m bars (tf > 1m), seq increasing."""
    now = {"t": 1_000_000_020}  # 20 s into a 5m bucket
    calls = []
    closed = {
        "tsSec": P._floor(1_000_000_020, 300) - 300,
        "open": 1.0, "high": 2.0, "low": 0.5, "close": 1.5,
        "volume": 10.0, "trades": 3,
    }
    mins = [{
        "tsSec": P._floor(1_000_000_020, 60),
        "open": 1.6, "high": 1.9, "low": 1.4, "close": 1.7,
        "volume": 2.0, "trades": 1,
    }]

    def bars_fn(token_id, step, lo, hi):
        calls.append((token_id, step, lo, hi))
        return [dict(closed)] if step == 300 else [dict(m) for m in mins]

    srv = P.PushServer(
        bars_fn, lambda *a: [], ohlcv_tick_sec=0.05,
        now_fn=lambda: now["t"],
    ).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=10)
        conn.request("GET", "/stream?kind=ohlcv&token_id=7&tf=5m")
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("Content-Type") == "text/event-stream"
        hello, snap, delta = _read_events(resp, 3)
        assert hello["type"] == "hello"
        assert snap["type"] == "snapshot.ohlcv" and snap["seq"] == 1
        assert snap["meta"]["stepSec"] == 300
        assert snap["meta"]["lockSec"] == P._floor(now["t"], 300) - 300
        assert snap["bars"] == [closed]
        # the snapshot requested the 200-bar trailing window (ws.js:99)
        t0, s0, lo0, hi0 = calls[0]
        assert (t0, s0) == ("7", 300) and hi0 - lo0 == 200 * 300
        assert delta["type"] == "ohlcv.delta" and delta["seq"] == 2
        forming = P.aggregate_forming_from_1m(P._floor(now["t"], 300), mins)
        assert delta["upserts"] == [closed, forming]
        assert delta["lockSec"] == snap["meta"]["lockSec"]
        conn.close()
    finally:
        srv.stop()


def test_push_trades_cursor_no_duplicates():
    """Trades stream: snapshot carries the 24 h window; each append
    pushes only rows strictly after the cursor — a quiet poll pushes
    nothing (no empty trades.append events), and re-polled rows never
    duplicate."""
    now = {"t": 1_000_000}
    store = [
        {"time": 999_900.0, "tx_hash": "a"},
        {"time": 999_910.0, "tx_hash": "b"},
    ]

    def trades_fn(token_id, start, end, limit):
        return [r for r in store if start <= r["time"] <= end][-limit:]
    srv = P.PushServer(
        lambda *a: [], trades_fn, trades_tick_sec=0.05,
        now_fn=lambda: now["t"],
    ).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=10)
        conn.request("GET", "/stream?kind=trades&token_id=9")
        resp = conn.getresponse()
        hello, snap = _read_events(resp, 2)
        assert snap["type"] == "snapshot.trades"
        assert [r["tx_hash"] for r in snap["items"]] == ["a", "b"]
        # two new trades arrive; the next append must carry exactly them
        store.append({"time": 999_920.0, "tx_hash": "c"})
        store.append({"time": 999_930.0, "tx_hash": "d"})
        (app,) = _read_events(resp, 1)
        assert app["type"] == "trades.append" and app["seq"] == 2
        assert [r["tx_hash"] for r in app["items"]] == ["c", "d"]
        # nothing new after that: one more arrival proves no dup of c/d
        store.append({"time": 999_940.0, "tx_hash": "e"})
        (app2,) = _read_events(resp, 1)
        assert [r["tx_hash"] for r in app2["items"]] == ["e"]
        conn.close()
    finally:
        srv.stop()


def test_push_shared_hub_computes_once_per_tick():
    """Scale invariant: N subscribers to the same (kind, token, tf)
    cost ONE provider computation per tick, not N — every delta tick
    is a Spark job at the serving edge, so per-connection ticking (the
    reference's per-WebSocket timers) would melt the driver at 1000
    clients. Both subscribers receive identical delta sequences, and
    the hub deregisters once the last one disconnects."""
    import threading
    import time as _t

    now = {"t": 1_000_000_020}
    tick_calls = {"n": 0}
    closed = {
        "tsSec": P._floor(1_000_000_020, 300) - 300,
        "open": 1.0, "high": 2.0, "low": 0.5, "close": 1.5,
        "volume": 10.0, "trades": 3,
    }

    def bars_fn(token_id, step, lo, hi):
        if step == 300 and hi - lo != 200 * 300:  # delta tail, not snapshot
            tick_calls["n"] += 1
        return [dict(closed)]

    srv = P.PushServer(
        bars_fn, lambda *a: [], ohlcv_tick_sec=0.05,
        now_fn=lambda: now["t"],
    ).start()
    try:
        results = {}

        def client(name):
            conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=10)
            conn.request("GET", "/stream?kind=ohlcv&token_id=7&tf=5m")
            resp = conn.getresponse()
            results[name] = _read_events(resp, 4)  # hello+snap+2 deltas
            conn.close()

        threads = [threading.Thread(target=client, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        hub = None
        for _ in range(200):  # grab the live hub while clients stream
            hubs = list(srv._hubs.values())
            if hubs:
                hub = hubs[0]
                break
            _t.sleep(0.01)
        for t in threads:
            t.join(timeout=30)
        assert hub is not None and len(srv._hubs) <= 1
        a, b = results[0], results[1]
        assert [e["type"] for e in a][:2] == ["hello", "snapshot.ohlcv"]
        # SHARED stream state: the two snapshots drew consecutive seqs
        # from one stream (per-connection streams would both say seq=1)
        snap_seqs = sorted(
            e["seq"] for e in a + b if e["type"] == "snapshot.ohlcv"
        )
        assert snap_seqs == [1, 2]
        # identical shared delta stream (same seq numbers, same upserts)
        da = [e for e in a if e["type"] == "ohlcv.delta"]
        db = [e for e in b if e["type"] == "ohlcv.delta"]
        assert da and db
        # last unsubscribe deregisters the hub (bounded ticker wait)
        for _ in range(200):
            if srv.active_hubs == 0:
                break
            _t.sleep(0.05)
        assert srv.active_hubs == 0
        # one computation per tick: every hub tick made exactly one
        # tail call and bumped seq once; the 2 snapshots are excluded
        # by the window-width check. Per-connection ticking would have
        # made ~2x the calls for the same final seq.
        assert tick_calls["n"] == hub.stream.seq - 2
    finally:
        srv.stop()


def test_push_rejects_bad_requests():
    srv = P.PushServer(lambda *a: [], lambda *a: []).start()
    try:
        for path, code in (
            ("/stream?kind=ohlcv", 400),       # missing token_id (ws.js:288)
            ("/stream?kind=nope&token_id=1", 400),  # unknown kind (ws.js:313)
            ("/other", 404),
        ):
            conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=10)
            conn.request("GET", path)
            assert conn.getresponse().status == code
            conn.close()
    finally:
        srv.stop()


def test_engine_provider_bars_and_stream(spark, dom):  # noqa: F811
    """Engine-wired provider: OhlcvStream.snapshot over the real ohlcv
    pipeline returns the engine's own bars (serving-edge collect), and
    the forming-bar synthesis over engine 1m bars equals the Spark-side
    forming_bar operator for the same bucket."""
    import calendar

    from pyspark.sql import functions as F

    from degenter_clickhouse_spark.engine import DegenterEngine
    from degenter_clickhouse_spark.plans import tokens_api as TA

    from .test_domain import NOW

    eng = DegenterEngine(
        spark,
        tables={
            "tokens": dom["tokens"],
            "pools": dom["pools"],
            "trades": dom["trades_clean"],
            "prices": dom["prices"],
            "pool_state": dom["pool_state"],
            "ohlcv_1m": dom["ohlcv_1m"],
        },
    )
    bars_fn, trades_fn = P.engine_provider(eng)
    now_sec = calendar.timegm(NOW.timetuple())
    stream = P.OhlcvStream("s1", "2", "15m", bars_fn, now_fn=lambda: now_sec)
    snap = stream.snapshot()
    assert snap["bars"], "engine snapshot returned no bars"
    assert snap["meta"]["stepSec"] == 900
    for b in snap["bars"]:
        assert b["tsSec"] % 900 == 0 and b["low"] <= b["high"]
    delta = stream.delta()
    assert delta is not None and delta["seq"] == 2
    # the forming upsert equals the Spark-side forming_bar operator
    bucket = P._floor(now_sec, 900)
    pool_ids = [
        r.pool_id
        for r in eng.table("pools")
        .filter(F.col("is_uzig_quote") & (F.col("base_token_id") == 2))
        .select("pool_id")
        .collect()
    ]
    want = TA.forming_bar(
        eng.table("ohlcv_1m"), pool_ids, 900,
        F.lit(NOW.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp"),
    ).collect()
    got_forming = [u for u in delta["upserts"] if u["tsSec"] == bucket]
    if want:
        assert got_forming, "forming bar missing from delta"
        w = want[0]
        g = got_forming[0]
        assert g["close"] == w.close and g["trades"] == w.trade_count
    # trades provider: bounded ascending rows
    rows = trades_fn("2", now_sec - 24 * 3600, now_sec, 50)
    assert rows == sorted(rows, key=lambda r: r["time"])


def test_push_trades_shared_cursor_survives_late_and_empty_snapshots():
    """ADVICE r12 #2: TradesStream state is hub-SHARED — a late
    subscriber's snapshot must not advance the cursor (existing
    subscribers would permanently miss trades between their cursor and
    the snapshot's newest row), and an empty 24 h snapshot must not
    reset it to None (the next delta would re-send historical rows to
    everyone)."""
    now = {"t": 1_000_000}
    store = [{"time": 999_900.0, "tx_hash": "a"}]

    def trades_fn(token_id, start, end, limit):
        return [r for r in store if start <= r["time"] <= end][-limit:]

    s = P.TradesStream("s1", "9", trades_fn, now_fn=lambda: now["t"])
    s.snapshot()  # first subscriber establishes the cursor at 'a'
    store.append({"time": 999_910.0, "tx_hash": "b"})
    snap2 = s.snapshot()  # late joiner sees a+b, cursor must NOT move
    assert [r["tx_hash"] for r in snap2["items"]] == ["a", "b"]
    d = s.delta()
    assert d is not None
    assert [r["tx_hash"] for r in d["items"]] == ["b"]  # b not skipped
    # quiet token: an empty snapshot (nothing inside 24 h) keeps the
    # established cursor; the next delta carries only genuinely new rows
    now["t"] = int(999_910 + 24 * 3600 + 100)
    snap3 = s.snapshot()
    assert snap3["items"] == []
    store.append({"time": now["t"] - 10.0, "tx_hash": "c"})
    d2 = s.delta()
    assert [r["tx_hash"] for r in d2["items"]] == ["c"]  # not a/b again

    # a NEVER-set cursor (every snapshot empty so far) polls only the
    # trailing 24 h — the reference's server-side tf=24h default —
    # never all of history: pre-window rows stay invisible, in-window
    # rows surface on the next tick
    fresh_now = {"t": 2_000_000}
    quiet = [{"time": 2_000_000 - 30 * 3600.0, "tx_hash": "old"}]

    def quiet_fn(token_id, start, end, limit):
        return [r for r in quiet if start <= r["time"] <= end][-limit:]

    s2 = P.TradesStream("s2", "9", quiet_fn, now_fn=lambda: fresh_now["t"])
    assert s2.snapshot()["items"] == []  # 'old' is outside 24 h
    assert s2.delta() is None  # epoch-0 would have resurfaced 'old'
    quiet.append({"time": 2_000_000 - 5.0, "tx_hash": "new"})
    d3 = s2.delta()
    assert [r["tx_hash"] for r in d3["items"]] == ["new"]


def test_engine_provider_trades_scoped_to_token(spark, dom):  # noqa: F811
    """ADVICE r12 #1: every kind=trades subscriber must receive ONLY
    its token's trades. The scope is the reference's tokenId filter
    (api/routes/trades.js:740-742 — trades of pools whose BASE token is
    the subscribed token), applied inside the feed plan; the router-
    combined output carries no token column, so the old post-hoc column
    guard silently leaked the global feed."""
    import calendar

    from pyspark.sql import functions as F

    from degenter_clickhouse_spark.engine import DegenterEngine

    from .test_domain import NOW

    eng = DegenterEngine(
        spark,
        tables={
            "tokens": dom["tokens"],
            "pools": dom["pools"],
            "trades": dom["trades_clean"],
            "prices": dom["prices"],
        },
    )
    _, trades_fn = P.engine_provider(eng)
    now_sec = calendar.timegm(NOW.timetuple())

    def tx_of_token(tok):
        pool_ids = [
            r.pool_id
            for r in dom["pools"]
            .filter(F.col("base_token_id") == tok)
            .select("pool_id")
            .collect()
        ]
        return {
            r.tx_hash
            for r in dom["trades_clean"]
            .filter(
                (F.col("action") == "swap") & F.col("pool_id").isin(pool_ids)
            )
            .select("tx_hash")
            .collect()
        }

    tx2, tx3 = tx_of_token(2), tx_of_token(3)
    assert tx2 and tx3 and (tx3 - tx2)  # trades exist the filter MUST drop
    rows2 = trades_fn("2", now_sec - 24 * 3600, now_sec, 200)
    # items are full shaped rows, like /trades/recent's payload
    assert rows2 and {"direction", "signer", "path", "worth_zig",
                      "trade_class"} <= set(rows2[0])
    got2 = {r["tx_hash"] for r in rows2}
    got3 = {r["tx_hash"] for r in trades_fn("3", now_sec - 24 * 3600, now_sec, 200)}
    assert got2 and got2 <= tx2  # only token 2's pools' trades
    assert got3 and got3 <= tx3
    # the leak the old column guard allowed: token-3-only txs showing
    # up in token 2's stream
    assert not (got2 & (tx3 - tx2))
