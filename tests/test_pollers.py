"""RPC/LCD/FX poller layer (sources/pollers.py) against a stdlib
http.server double: failover + backoff, LCD helpers, the indexer loop
landing RAW_SCHEMA shards consumed by the real Spark ingest, FX and
price-from-reserves jobs."""

from __future__ import annotations

import base64
import json
import threading
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, unquote, urlparse

import pytest

from degenter_clickhouse_spark.sources.pollers import (
    BlockPoller,
    FileCheckpoint,
    FxPoller,
    HttpJson,
    LcdClient,
    PriceFromReservesJob,
    RpcClient,
)

# ---------------------------------------------------------------------------
# http.server double
# ---------------------------------------------------------------------------

TIP = 5


def _mk_block_txs(height):
    def attr(k, v):
        return {"key": k, "value": str(v)}

    out = []
    if height == 1:  # register the pool first (swaps on unknown pools drop)
        out.append(
            {
                "events": [
                    {"type": "message", "attributes": [attr("sender", "zig1creator"), attr("msg_index", 0)]},
                    {
                        "type": "wasm",
                        "attributes": [
                            attr("action", "create_pair"),
                            attr("_contract_address", "zig1pool00001"),
                            attr("pair", "coin.zig1f.utok-uzig"),
                            attr("pair_type", "xyk"),
                            attr("msg_index", 0),
                        ],
                    },
                ]
            }
        )
    out.append(
        {
            "events": [
                {"type": "message", "attributes": [attr("sender", f"zig1u{height}"), attr("msg_index", 0)]},
                {
                    "type": "wasm",
                    "attributes": [
                        attr("action", "swap"),
                        attr("_contract_address", "zig1pool00001"),
                        attr("offer_asset", "uzig"),
                        attr("offer_amount", 1000000 + height),
                        attr("ask_asset", "coin.zig1f.utok"),
                        attr("return_amount", 500000 + height),
                        attr("msg_index", 0),
                    ],
                },
            ]
        }
    )
    return out


class _Handler(BaseHTTPRequestHandler):
    fail_always = False

    def log_message(self, *a):  # silence
        pass

    def _json(self, obj, status=200):
        body = json.dumps(obj).encode()
        self.send_response(status)
        self.send_header("content-type", "application/json")
        self.send_header("content-length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 — stdlib naming
        if self.fail_always:
            return self._json({"error": "boom"}, status=500)
        u = urlparse(self.path)
        q = parse_qs(u.query)
        if u.path == "/status":
            return self._json(
                {"result": {"sync_info": {"latest_block_height": str(TIP)}}}
            )
        if u.path == "/block":
            h = int(q["height"][0])
            return self._json(
                {
                    "result": {
                        "block": {
                            "header": {"time": f"2024-06-01T00:00:{h:02d}Z"},
                            "data": {"txs": [base64.b64encode(f"tx-{h}".encode()).decode()]},
                        }
                    }
                }
            )
        if u.path == "/block_results":
            h = int(q["height"][0])
            return self._json({"result": {"txs_results": _mk_block_txs(h)}})
        if u.path.startswith("/cosmos/bank/v1beta1/denoms_metadata/"):
            denom = unquote(u.path.rsplit("/", 1)[1])
            return self._json(
                {"metadata": {"base": denom, "symbol": "TOK", "display": "tok",
                              "denom_units": [{"denom": "tok", "exponent": 6}]}}
            )
        if u.path.startswith("/cosmos/bank/v1beta1/denom_owners/"):
            if "pagination.key" in q.get("pagination.key", [""])[0] or q.get("pagination.key"):
                return self._json(
                    {"denom_owners": [{"address": "zig1b", "balance": {"amount": "2"}}],
                     "pagination": {"next_key": None}}
                )
            return self._json(
                {"denom_owners": [{"address": "zig1a", "balance": {"amount": "1"}}],
                 "pagination": {"next_key": "PAGE2"}}
            )
        if "/smart/" in u.path:
            msg = json.loads(base64.b64decode(u.path.rsplit("/", 1)[1]))
            assert msg == {"pool": {}}
            return self._json(
                {"data": {"assets": [
                    {"denom": "uzig", "amount": "2000000"},
                    {"denom": "coin.zig1f.utok", "amount": "1000000000"},
                ]}}
            )
        if u.path == "/v1/cryptocurrency/quotes/latest":
            if self.headers.get("X-CMC_PRO_API_KEY") != "k3y":
                return self._json({"error": "unauthorized"}, status=401)
            return self._json(
                {"data": {"ZIG": {"quote": {"USD": {"price": 0.0123}}}}}
            )
        return self._json({"error": "not found"}, status=404)


class _FailingHandler(_Handler):
    fail_always = True


@pytest.fixture(scope="module")
def server():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


@pytest.fixture(scope="module")
def bad_server():
    srv = HTTPServer(("127.0.0.1", 0), _FailingHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _http(*endpoints):
    # no real sleeping in tests; record backoffs instead
    slept: list[float] = []
    h = HttpJson(list(endpoints), sleep=slept.append)
    return h, slept


# ---------------------------------------------------------------------------
# HttpJson: failover + backoff (lib/lcd.js:9-26)
# ---------------------------------------------------------------------------


def test_http_failover_to_backup_endpoint(server, bad_server):
    http, slept = _http(bad_server, server)
    out = http.get("/status")
    assert out["result"]["sync_info"]["latest_block_height"] == str(TIP)
    assert len(slept) == 1  # one failed attempt, one backoff
    assert 1.0 <= slept[0] <= 1.25  # base 1.0 + jitter <= 0.25


def test_http_backoff_growth_and_bounded_failure(bad_server):
    http, slept = _http(bad_server)
    http.max_attempts = 5
    with pytest.raises(RuntimeError, match="all 5 attempts"):
        http.get("/status")
    # the FINAL failure raises without a pointless trailing sleep
    assert len(slept) == 4
    # 1.5x growth capped at max_backoff_s (jitter <= 0.25 on top)
    for i in range(3):
        assert slept[i + 1] >= slept[i] - 0.25
    assert all(s <= 10.25 for s in slept)


def test_http_rotates_start_endpoint_per_call(server):
    http, _ = _http(server, server)
    http.get("/status")
    assert http._idx == 1
    http.get("/status")
    assert http._idx == 2


def test_http_non_json_4xx_fails_fast_without_retries():
    """ADVICE r8: a permanent 4xx whose body is an HTML error page
    (proxy/LB) must fail fast with the real status+body, not be
    reclassified as retryable by the JSONDecodeError and burn
    max_attempts x backoff across every endpoint."""
    calls = []

    def transport(url, headers):
        calls.append(url)
        return 404, b"<html>not json</html>"

    slept: list[float] = []
    http = HttpJson(["http://a", "http://b"], transport=transport,
                    sleep=slept.append)
    with pytest.raises(RuntimeError, match="non-JSON response .HTTP 404."):
        http.get("/x")
    assert len(calls) == 1  # no failover sweep
    assert slept == []  # no backoff sleeps


def test_http_json_4xx_still_returns_parsed():
    """A JSON 4xx body is a legitimate answer (LCD 404 = denom not
    found) and must come back parsed, not raised."""
    http = HttpJson(["http://a"], transport=lambda u, h: (404, b'{"ok": false}'))
    assert http.get("/x") == {"ok": False}


# ---------------------------------------------------------------------------
# LCD helpers (lib/lcd.js:30-51)
# ---------------------------------------------------------------------------


def test_lcd_helpers_roundtrip(server):
    lcd = LcdClient(_http(server)[0])
    meta = lcd.denoms_metadata("coin.zig1f.utok")
    assert meta["metadata"]["base"] == "coin.zig1f.utok"
    page1 = lcd.denom_owners("coin.zig1f.utok")
    assert page1["pagination"]["next_key"] == "PAGE2"
    page2 = lcd.denom_owners("coin.zig1f.utok", next_key="PAGE2")
    assert page2["denom_owners"][0]["address"] == "zig1b"
    res = lcd.smart("zig1pool00001", {"pool": {}})
    assert res["data"]["assets"][0]["denom"] == "uzig"


# ---------------------------------------------------------------------------
# BlockPoller -> landing shards -> REAL Spark ingest (bin/start-indexer.js)
# ---------------------------------------------------------------------------


def test_block_poller_lands_shards_spark_ingests_them(spark, server, tmp_path):
    import glob

    from degenter_clickhouse_spark.sources import blocks as B

    landing = str(tmp_path / "landing")
    ckpt = FileCheckpoint(str(tmp_path / "ckpt"))
    ckpt.write(0)  # backfill from genesis; no checkpoint = start at tip
    rpc = RpcClient(_http(server)[0])
    poller = BlockPoller(rpc, landing, ckpt, pipeline_depth=2)
    n = poller.run(max_blocks=100)  # bounded mode stops at the tip
    assert n == TIP
    assert ckpt.read() == TIP
    shards = sorted(glob.glob(f"{landing}/blocks-*.json"))
    assert len(shards) == 3  # depth 2 over 5 heights: 2+2+1
    raw = spark.read.schema(B.RAW_SCHEMA).json(landing)
    assert raw.count() == TIP
    out = B.ingest(raw)
    trades = out["trades"]
    assert trades.count() == TIP  # one swap per block
    assert {r.height for r in raw.select("height").collect()} == set(range(1, TIP + 1))
    # resume: nothing new at the tip -> lands zero, checkpoint stable
    assert poller.run(max_blocks=100) == 0
    assert ckpt.read() == TIP


def test_block_poller_resumes_from_checkpoint(server, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = FileCheckpoint(str(tmp_path / "ckpt"))
    ckpt.write(3)  # heights 1-3 already indexed
    poller = BlockPoller(RpcClient(_http(server)[0]), landing, ckpt)
    assert poller.run(max_blocks=100) == 2  # lands 4..5 only
    import glob

    heights = []
    for f in glob.glob(f"{landing}/*.json"):
        heights += [json.loads(l)["height"] for l in open(f) if l.strip()]
    assert sorted(heights) == [4, 5]


# ---------------------------------------------------------------------------
# FX + price-from-reserves jobs
# ---------------------------------------------------------------------------


def test_fx_poller_lands_minute_truncated_rate(spark, server, tmp_path):
    fx = FxPoller(
        _http(server)[0],
        str(tmp_path / "fx"),
        api_key="k3y",
        now=lambda: datetime(2024, 6, 1, 10, 0, 37, tzinfo=timezone.utc),
    )
    assert fx.once() == pytest.approx(0.0123)
    from degenter_clickhouse_spark import schemas

    df = spark.read.schema(schemas.EXCHANGE_RATES).json(str(tmp_path / "fx"))
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].zig_usd == pytest.approx(0.0123)
    assert rows[0].ts.second == 0  # toStartOfMinute(now()) semantics


def test_fx_poller_rejects_bad_key(server, tmp_path):
    fx = FxPoller(_http(server)[0], str(tmp_path / "fx"), api_key="wrong")
    with pytest.raises(RuntimeError, match="no price"):
        fx.once()


def test_price_from_reserves_job_matches_spark_formula(spark, server, tmp_path):
    from pyspark.sql import functions as F

    from degenter_clickhouse_spark.functions import business

    lcd = LcdClient(_http(server)[0])
    job = PriceFromReservesJob(lcd, str(tmp_path / "px"))
    pools = [
        {"pool_id": 1, "pair_contract": "zig1pool00001",
         "base_denom": "coin.zig1f.utok", "base_exp": 6},
        # wait-for-meta: no exponent -> skipped (reference semantics)
        {"pool_id": 2, "pair_contract": "zig1pool00002",
         "base_denom": "coin.zig1g.utok2", "base_exp": None},
    ]
    assert job.once(pools) == 1
    rows = spark.read.json(str(tmp_path / "px")).collect()
    assert len(rows) == 1 and rows[0].pool_id == 1
    # the landed price equals functions/business.price_from_reserves
    # (core/prices.js:72-92) on the same reserves
    want = spark.range(1).select(
        business.price_from_reserves(
            F.lit(2000000), F.lit(1000000000), F.lit(6)
        ).alias("px")
    ).collect()[0].px
    assert rows[0].price_in_zig == pytest.approx(want, rel=1e-12)


def test_cli_poller_command(server, tmp_path, capsys):
    """degenter-spark poller: the process entry point lands shards
    without ever building a SparkSession (pure driver glue)."""
    from degenter_clickhouse_spark.cli import main

    ckpt = str(tmp_path / "ckpt")
    FileCheckpoint(ckpt).write(0)
    rc = main([
        "poller", "--rpc", server, "--landing", str(tmp_path / "landing"),
        "--checkpoint", ckpt, "--max-blocks", "3",
    ])
    assert rc == 0
    assert "landed 3 blocks" in capsys.readouterr().out
    assert FileCheckpoint(ckpt).read() == 3


def test_file_checkpoint_corrupt_vs_missing(tmp_path):
    """A missing checkpoint means fresh start (None); a corrupt one
    must raise — treating it as fresh would silently jump the poller
    to the tip and lose the gap."""
    ck = FileCheckpoint(str(tmp_path / "ck"))
    assert ck.read() is None
    ck.write(7)
    assert ck.read() == 7
    (tmp_path / "ck").write_text("garbled\n")
    with pytest.raises(RuntimeError, match="corrupt checkpoint"):
        ck.read()


def test_jobs_runner_fx_job(spark, server, tmp_path):
    """With an FxPoller wired in, the runner's fx job appends one
    minute-truncated exchange_rates row at FX_SEC cadence and
    refreshes the engine view (jobs/fx-zig.js onceFx semantics)."""
    from degenter_clickhouse_spark.engine import DegenterEngine
    from degenter_clickhouse_spark.jobs import JobsRunner
    from degenter_clickhouse_spark import schemas

    empty = spark.createDataFrame([], schemas.EXCHANGE_RATES)
    eng = DegenterEngine(spark, tables={"exchange_rates": empty})
    fx = FxPoller(_http(server)[0], str(tmp_path / "unused"), api_key="k3y")
    runner = JobsRunner(eng, str(tmp_path / "out"), fx=fx)
    # first tick runs every never-run job; pin the others as just-run
    # so this test exercises ONLY the fx job (the engine carries no
    # trade tables here)
    runner.last_run = {j: 1000.0 for j in
                       ("matrix", "leaderboard", "security", "alerts",
                        "compact")}
    ran = runner.tick(at=1000.0)
    assert ran == ["fx"]
    rows = spark.read.parquet(str(tmp_path / "out/exchange_rates")).collect()
    assert len(rows) == 1 and rows[0].zig_usd == 0.0123
    assert rows[0].ts.second == 0
    # hermetic: the stamp derives from the tick's logical time (at=
    # 1000.0 -> epoch minute 16), not wall-clock datetime.now()
    from datetime import datetime

    assert rows[0].ts == datetime(1970, 1, 1, 0, 16, 0)
    assert eng.table("exchange_rates").count() == 1
    # cadence: not due 10s later, due after 36s
    assert runner.tick(at=1010.0) == []
    assert runner.tick(at=1037.0) == ["fx"]
    assert spark.read.parquet(str(tmp_path / "out/exchange_rates")).count() == 2


# ---------------------------------------------------------------------------
# Holders + meta refreshers (jobs/holders-refresher.js, jobs/meta-refresher.js)
# ---------------------------------------------------------------------------


def test_refresh_holders_once_lands_paged_snapshot(spark, server, tmp_path):
    """One token sweep: both LCD pages land in the snapshot (the
    double serves zig1a on page 1 and zig1b behind next_key), the
    stats row records the positive-balance count, and a re-sweep
    replaces rather than appends (S9 delete+reinsert)."""
    from degenter_clickhouse_spark.sources.refreshers import refresh_holders_once

    lcd = LcdClient(_http(server)[0])
    hp, sp = str(tmp_path / "holders"), str(tmp_path / "stats")
    n = refresh_holders_once(spark, lcd, 7, "coin.zig1f.utok", hp, sp, at=1000.0)
    assert n == 2
    snap = {r.address: int(r.balance_base) for r in spark.read.parquet(hp).collect()}
    assert snap == {"zig1a": 1, "zig1b": 2}
    stats = spark.read.parquet(sp).collect()
    assert len(stats) == 1 and stats[0].holders_count == 2
    # idempotent re-sweep: same rows, not doubled
    refresh_holders_once(spark, lcd, 7, "coin.zig1f.utok", hp, sp, at=1200.0)
    assert spark.read.parquet(hp).count() == 2


def test_refresh_holders_ibc_bumps_stats_only(spark, server, tmp_path):
    from degenter_clickhouse_spark.sources.refreshers import refresh_holders_once

    lcd = LcdClient(_http(server)[0])
    hp, sp = str(tmp_path / "holders"), str(tmp_path / "stats")
    out = refresh_holders_once(spark, lcd, 9, "ibc/ABCDEF", hp, sp, at=1000.0)
    assert out is None
    import os
    assert not os.path.exists(hp)  # no snapshot written
    stats = spark.read.parquet(sp).collect()
    assert len(stats) == 1 and stats[0].holders_count is None


def test_holders_refresh_queue_stalest_first(spark):
    """Never-swept tokens lead; swept tokens rotate to the back;
    uzig and ibc/ denoms never enter the queue."""
    from degenter_clickhouse_spark.sources.refreshers import holders_refresh_queue

    tokens = spark.createDataFrame(
        [(1, "uzig"), (2, "coin.a"), (3, "ibc/X"), (4, "coin.b"), (5, "coin.c")],
        "token_id long, denom string",
    )
    from datetime import datetime
    stats = spark.createDataFrame(
        [(2, 5, datetime(2024, 1, 2)), (4, 1, datetime(2024, 1, 1))],
        "token_id long, holders_count long, updated_at timestamp",
    )
    got = [r.token_id for r in holders_refresh_queue(tokens, stats, k=4).collect()]
    # 5 never swept -> first; then 4 (older), then 2; uzig/ibc excluded
    assert got == [5, 4, 2]


def test_token_meta_from_lcd_display_exponent(server):
    from degenter_clickhouse_spark.sources.refreshers import token_meta_from_lcd

    lcd = LcdClient(_http(server)[0])
    m = token_meta_from_lcd(lcd, "coin.zig1f.utok")
    assert (m["symbol"], m["display"], m["exponent"]) == ("TOK", "tok", 6)


def test_token_meta_from_lcd_bare_u_denom_fallback():
    """No LCD metadata at all: a bare u<core> denom derives
    symbol/display with exponent 0 (core/tokens.js deriveFromBaseDenom)."""
    from degenter_clickhouse_spark.sources.refreshers import token_meta_from_lcd

    class _NoMeta:
        def denoms_metadata(self, denom):
            return {}
        def ibc_denom_trace(self, denom):
            raise RuntimeError("nope")

    m = token_meta_from_lcd(_NoMeta(), "ufoo")
    assert m == {"denom": "ufoo", "name": None, "symbol": "FOO",
                 "display": "foo", "exponent": 0}


def test_jobs_runner_holders_and_meta_jobs(spark, server, tmp_path):
    """End-to-end runner slots (VERDICT r8 #3): with an LcdClient
    wired, the holders job sweeps the stalest tokens into a refreshed
    snapshot + stats rows, the meta job fills missing token metadata
    through the conditional merge, and the next security tick's
    token_holders_stats reflects the refreshed snapshot. Cadences from
    DEFAULT_CADENCES (180 s / 60 s)."""
    from degenter_clickhouse_spark import schemas
    from degenter_clickhouse_spark.engine import DegenterEngine
    from degenter_clickhouse_spark.jobs import DEFAULT_CADENCES, JobsRunner

    assert DEFAULT_CADENCES["holders"] == 180
    assert DEFAULT_CADENCES["meta"] == 60
    tokens = spark.createDataFrame(
        [(7, "coin.zig1f.utok") + (None,) * (len(schemas.TOKENS.fields) - 2)],
        schemas.TOKENS,
    )
    eng = DegenterEngine(spark, tables={
        "tokens": tokens,
        "holders": spark.createDataFrame([], schemas.HOLDERS),
    })
    out = str(tmp_path / "out")
    cadences = {j: 10**9 for j in
                ("matrix", "leaderboard", "alerts", "compact")}
    runner = JobsRunner(eng, out, cadences=cadences,
                        lcd=LcdClient(_http(server)[0]))
    runner.last_run = {j: 1000.0 for j in cadences}
    ran = runner.tick(at=1000.0)
    assert ran == ["holders", "meta", "security"]
    # holders snapshot refreshed into the engine view
    snap = {r.address: int(r.balance_base)
            for r in eng.table("holders").collect()}
    assert snap == {"zig1a": 1, "zig1b": 2}
    stats = spark.read.parquet(f"{out}/holders_refresh_stats").collect()
    assert len(stats) == 1 and stats[0].holders_count == 2
    # token_holders_stats recomputed from the refreshed snapshot in the
    # same tick (refreshers run before the analytical jobs)
    ths = spark.read.parquet(f"{out}/token_holders_stats").collect()
    assert len(ths) == 1 and ths[0].holders == 2
    # meta merged: LCD symbol/display/exponent landed, non-empty wins
    tok = eng.table("tokens").collect()[0]
    assert (tok.symbol, tok.display, tok.exponent) == ("TOK", "tok", 6)
    # cadences: holders not due again until +180, meta at +60
    assert runner.tick(at=1030.0) == []
    assert runner.tick(at=1061.0) == ["meta"]
    assert "holders" in runner.tick(at=1181.0)


def test_refresh_holders_empty_owners_clears_snapshot(spark, server, tmp_path):
    """ADVICE r9: a sweep that returns ZERO owners must clear the
    token's old snapshot partition (the reference's delete+insert), not
    leave stale holders under a count-0 stats row."""
    from degenter_clickhouse_spark.sources.refreshers import refresh_holders_once

    lcd = LcdClient(_http(server)[0])
    hp, sp = str(tmp_path / "holders"), str(tmp_path / "stats")
    assert refresh_holders_once(spark, lcd, 7, "coin.zig1f.utok", hp, sp, at=1000.0) == 2

    class _Emptied:
        def denom_owners(self, denom, next_key=None):
            return {"denom_owners": [], "pagination": {"next_key": None}}

    n = refresh_holders_once(spark, _Emptied(), 7, "coin.zig1f.utok", hp, sp, at=1200.0)
    assert n == 0
    import os

    assert not os.path.exists(os.path.join(hp, "token_id=7"))
    stats = spark.read.parquet(sp).collect()
    assert len(stats) == 1 and stats[0].holders_count == 0


def test_jobs_runner_holders_sweep_isolates_token_failure(spark, server, tmp_path):
    """ADVICE r9: one token's LCD failure must not kill the sweep — the
    healthy token still refreshes, and the failed token's stats
    timestamp bumps (old count kept) so it rotates out of the
    stalest-K queue instead of wedging every cycle."""
    from degenter_clickhouse_spark import schemas
    from degenter_clickhouse_spark.engine import DegenterEngine
    from degenter_clickhouse_spark.jobs import JobsRunner

    real = LcdClient(_http(server)[0])

    class _Flaky:
        def denom_owners(self, denom, next_key=None):
            if denom == "coin.bad":
                raise RuntimeError("lcd exploded")
            return real.denom_owners(denom, next_key)

        def denoms_metadata(self, denom):
            return real.denoms_metadata(denom)

        def ibc_denom_trace(self, denom):
            return real.ibc_denom_trace(denom)

    tokens = spark.createDataFrame(
        [(6, "coin.bad") + (None,) * (len(schemas.TOKENS.fields) - 2),
         (7, "coin.zig1f.utok") + (None,) * (len(schemas.TOKENS.fields) - 2)],
        schemas.TOKENS,
    )
    eng = DegenterEngine(spark, tables={
        "tokens": tokens,
        "holders": spark.createDataFrame([], schemas.HOLDERS),
    })
    out = str(tmp_path / "out")
    cadences = {j: 10**9 for j in
                ("matrix", "leaderboard", "alerts", "compact", "meta", "security")}
    runner = JobsRunner(eng, out, cadences=cadences, lcd=_Flaky())
    runner.last_run = {j: 1000.0 for j in cadences}
    with pytest.warns(UserWarning, match="token 6"):
        assert runner.tick(at=1000.0) == ["holders"]
    stats = {r.token_id: r for r in
             spark.read.parquet(f"{out}/holders_refresh_stats").collect()}
    assert stats[7].holders_count == 2          # healthy token swept
    assert stats[6].holders_count is None       # failed: no count yet...
    assert stats[6].updated_at is not None      # ...but timestamp bumped
    # the failed token rotated out: both have stats rows now, so a
    # second sweep queues BOTH again only by staleness order
    from degenter_clickhouse_spark.sources.refreshers import holders_refresh_queue

    q = [r.token_id for r in holders_refresh_queue(
        eng.table("tokens"), spark.read.parquet(f"{out}/holders_refresh_stats")
    ).collect()]
    assert set(q) == {6, 7}


def test_jobs_runner_reloads_persisted_tokens(spark, tmp_path):
    """ADVICE r9: a restarted runner must resume from the meta
    refresher's persisted tokens merge (output_dir/tokens), not the
    pristine storage snapshot."""
    from degenter_clickhouse_spark import schemas
    from degenter_clickhouse_spark.engine import DegenterEngine
    from degenter_clickhouse_spark.jobs import JobsRunner

    pristine = spark.createDataFrame(
        [(7, "coin.zig1f.utok") + (None,) * (len(schemas.TOKENS.fields) - 2)],
        schemas.TOKENS,
    )
    from pyspark.sql import functions as F

    merged = pristine.withColumn("symbol", F.lit("TOK"))
    out = str(tmp_path / "out")
    import os

    os.makedirs(out, exist_ok=True)
    merged.write.parquet(os.path.join(out, "tokens"))
    eng = DegenterEngine(spark, tables={"tokens": pristine})
    JobsRunner(eng, out)
    assert eng.table("tokens").collect()[0].symbol == "TOK"
