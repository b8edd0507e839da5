"""Ingest pipeline tests (SURVEY.md §5.3): a raw-blocks fixture with
create_pair, swaps (both reserve encodings), liquidity events (share
aliases), router legs, base64-encoded attribute variants, and replayed
duplicates — ingest must produce consistent trades/prices/pool_state/
ohlcv_1m, and re-ingesting must be a no-op."""

from __future__ import annotations

import base64
import json
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from degenter_clickhouse_spark.functions import parse as P
from degenter_clickhouse_spark.sources import blocks

T0 = datetime(2024, 5, 1, 12, 0, 0)
ROUTER = "zig1routerrouterrouter"
PAIR_A = "zig1paircontract_alpha"  # ualpha-uzig
PAIR_B = "zig1paircontract_beta"  # ubeta-uzig


def _attr(k, v, b64=False):
    if b64:
        return {
            "key": base64.b64encode(k.encode()).decode(),
            "value": base64.b64encode(str(v).encode()).decode(),
        }
    return {"key": k, "value": str(v)}


def _msg(sender, i):
    return {"type": "message", "attributes": [_attr("sender", sender), _attr("msg_index", i)]}


def _swap(contract, offer, offer_amt, ask, ret, i, combined_reserves=None, reserves4=None, b64=False):
    attrs = [
        _attr("action", "swap", b64),
        _attr("_contract_address", contract, b64),
        _attr("offer_asset", offer, b64),
        _attr("offer_amount", offer_amt, b64),
        _attr("ask_asset", ask, b64),
        _attr("return_amount", ret, b64),
        _attr("msg_index", i, b64),
    ]
    if combined_reserves:
        attrs.append(_attr("reserves", combined_reserves, b64))
    if reserves4:
        d1, a1, d2, a2 = reserves4
        attrs += [
            _attr("reserve_asset1_denom", d1, b64),
            _attr("reserve_asset1_amount", a1, b64),
            _attr("reserve_asset2_denom", d2, b64),
            _attr("reserve_asset2_amount", a2, b64),
        ]
    return {"type": "wasm", "attributes": attrs}


def _block(height, txs_events, minute):
    """txs_events: list of per-tx event lists; tx bytes derived from height/idx."""
    return {
        "height": height,
        "time": (T0 + timedelta(minutes=minute)).strftime("%Y-%m-%dT%H:%M:%S"),
        "txs": [
            base64.b64encode(f"tx-{height}-{i}".encode()).decode()
            for i in range(len(txs_events))
        ],
        "tx_results": [{"events": evs} for evs in txs_events],
    }


def raw_blocks():
    blocks_out = []
    # block 1: two create_pair events
    blocks_out.append(
        _block(
            1,
            [
                [
                    _msg("zigdeployer", 0),
                    {
                        "type": "wasm",
                        "attributes": [
                            _attr("action", "create_pair"),
                            _attr("_contract_address", PAIR_A),
                            _attr("pair", "ualpha-uzig"),
                            _attr("pair_type", "xyk"),
                            _attr("lp_denom", "lp_alpha"),
                            _attr("msg_index", 0),
                        ],
                    },
                ],
                [
                    _msg("zigdeployer", 0),
                    {
                        "type": "wasm",
                        "attributes": [
                            # uzig on the base side: normalization must swap
                            _attr("action", "create_pair"),
                            _attr("_contract_address", PAIR_B),
                            _attr("pair", "uzig-ubeta"),
                            _attr("msg_index", 0),
                        ],
                    },
                ],
            ],
            0,
        )
    )
    # block 2: swaps — combined reserves + separate (swapped order) + b64 attrs
    blocks_out.append(
        _block(
            2,
            [
                [  # buy: offer uzig for alpha; combined reserves blob
                    _msg("zigwalletA", 0),
                    _swap(PAIR_A, "uzig", 5_000_000, "ualpha", 2_400_000, 0,
                          combined_reserves="ualpha:1000000000,uzig:2000000000"),
                ],
                [  # sell: offer alpha; separate reserves, order swapped (P13)
                    _msg("zigwalletB", 0),
                    _swap(PAIR_A, "ualpha", 1_200_000, "uzig", 2_400_000, 0,
                          reserves4=("uzig", 1_997_600_000, "ualpha", 1_001_200_000)),
                ],
                [  # base64-encoded attribute variant (P1)
                    _msg("zigwalletC", 0),
                    _swap(PAIR_B, "uzig", 7_000_000, "ubeta", 13_000_000, 0,
                          combined_reserves="ubeta:5000000000,uzig:2500000000", b64=True),
                ],
            ],
            1,
        )
    )
    # block 3: router tx with 2 legs + liquidity events with share aliases
    blocks_out.append(
        _block(
            3,
            [
                [
                    _msg(ROUTER, 0),
                    _msg(ROUTER, 1),
                    {"type": "execute", "attributes": [_attr("_contract_address", ROUTER), _attr("msg_index", 0)]},
                    _swap(PAIR_A, "uzig", 3_000_000, "ualpha", 1_400_000, 0,
                          combined_reserves="ualpha:999000000,uzig:2003000000"),
                    _swap(PAIR_B, "ualpha", 1_400_000, "ubeta", 2_500_000, 1,
                          combined_reserves="ubeta:4997500000,uzig:2501000000"),
                ],
                [
                    _msg("zigwalletD", 0),
                    {
                        "type": "wasm",
                        "attributes": [
                            _attr("action", "provide_liquidity"),
                            _attr("_contract_address", PAIR_A),
                            _attr("assets", "100000000ualpha,200000000uzig"),
                            _attr("share", 141421356),
                            _attr("msg_index", 0),
                        ],
                    },
                ],
                [
                    _msg("zigwalletE", 0),
                    {
                        "type": "wasm",
                        "attributes": [
                            _attr("action", "withdraw_liquidity"),
                            _attr("_contract_address", PAIR_B),
                            _attr("assets", "50000000ubeta,25000000uzig"),
                            _attr("withdrawn_share", 35355339),
                            _attr("msg_index", 0),
                        ],
                    },
                ],
            ],
            2,
        )
    )
    # block 4: exact replay of block 2's first swap (duplicate events ST2)
    blocks_out.append(
        _block(
            2,
            [
                [
                    _msg("zigwalletA", 0),
                    _swap(PAIR_A, "uzig", 5_000_000, "ualpha", 2_400_000, 0,
                          combined_reserves="ualpha:1000000000,uzig:2000000000"),
                ]
            ],
            1,
        )
    )
    return blocks_out


@pytest.fixture(scope="module")
def raw_df(spark):
    rows = [json.dumps(b) for b in raw_blocks()]
    return spark.read.schema(blocks.RAW_SCHEMA).json(
        spark.sparkContext.parallelize(rows)
    )


@pytest.fixture(scope="module")
def ingested(spark, raw_df):
    return blocks.ingest(raw_df, router_addr=ROUTER)


def test_pools_extracted_and_normalized(ingested):
    pools = {r.pair_contract: r for r in ingested["pools"].collect()}
    assert set(pools) == {PAIR_A, PAIR_B}
    a, b = pools[PAIR_A], pools[PAIR_B]
    assert a.base_denom == "ualpha" and a.quote_denom == "uzig"
    # P9: uzig forced to quote side even when listed first
    assert b.base_denom == "ubeta" and b.quote_denom == "uzig"
    assert a.is_uzig_quote and b.is_uzig_quote
    assert a.pool_id != 0 and a.pool_id != b.pool_id
    assert a.pair_type == "xyk" and b.pair_type == "xyk"
    assert a.signer == "zigdeployer"


def test_trades_direction_and_dedupe(ingested):
    trades = ingested["trades"].collect()
    swaps = [t for t in trades if t.action == "swap"]
    # 5 distinct swaps (replayed duplicate collapsed)
    assert len(swaps) == 5
    by_offer = {(t.tx_hash, t.msg_index): t for t in swaps}
    assert len(by_offer) == 5
    buys = [t for t in swaps if t.direction == "buy"]
    sells = [t for t in swaps if t.direction == "sell"]
    # P10: offering uzig (the quote) = buy
    assert all(t.offer_asset_denom == "uzig" for t in buys)
    assert all(t.offer_asset_denom != "uzig" for t in sells)
    assert len(buys) == 3 and len(sells) == 2


def test_base64_attrs_decoded(ingested):
    swaps = [t for t in ingested["trades"].collect() if t.action == "swap"]
    b64_swap = [t for t in swaps if t.signer == "zigwalletC"]
    assert len(b64_swap) == 1
    t = b64_swap[0]
    assert t.offer_asset_denom == "uzig"
    assert int(t.offer_amount_base) == 7_000_000


def test_router_detection(ingested):
    swaps = [t for t in ingested["trades"].collect() if t.action == "swap"]
    router_legs = [t for t in swaps if t.is_router]
    assert len(router_legs) == 2
    assert {t.msg_index for t in router_legs} == {0, 1}
    assert len({t.tx_hash for t in router_legs}) == 1


def test_liquidity_events_and_share_aliases(ingested):
    trades = ingested["trades"].collect()
    prov = [t for t in trades if t.action == "provide"]
    wd = [t for t in trades if t.action == "withdraw"]
    assert len(prov) == 1 and len(wd) == 1
    assert int(prov[0].return_amount_base) == 141421356
    assert int(wd[0].return_amount_base) == 35355339  # withdrawn_share alias


def test_pool_state_orientation(ingested):
    st = {r.pool_id: r for r in ingested["pool_state"].collect()}
    pools = {r.pair_contract: r.pool_id for r in ingested["pools"].collect()}
    a = st[pools[PAIR_A]]
    # last-wins per pool: block 3 leg (height 3) supersedes block 2
    assert int(a.reserve_base_base) == 999000000
    assert int(a.reserve_quote_base) == 2003000000
    b = st[pools[PAIR_B]]
    assert int(b.reserve_base_base) == 4997500000
    assert int(b.reserve_quote_base) == 2501000000


def test_prices_from_reserves(ingested):
    prices = ingested["prices"].collect()
    assert prices
    # B11 with default exponent 6 both sides: price = Rq/Rb
    pools = {r.pair_contract: r.pool_id for r in ingested["pools"].collect()}
    pa = [p for p in prices if p.pool_id == pools[PAIR_A]]
    assert any(abs(p.price_in_zig - 2_000_000_000 / 1_000_000_000) < 1e-9 for p in pa)
    assert all(p.is_pair_native for p in prices)


def test_ohlcv_from_ticks(ingested):
    bars = ingested["ohlcv_1m"].collect()
    assert bars
    for b in bars:
        assert b.low <= b.open <= b.high
        assert b.low <= b.close <= b.high
        assert b.trade_count >= 1
    # quote-leg volume summed per minute (core/block-processor.js:277-291):
    # offer_amount when the offer IS the quote denom, else return_amount, /1e6
    pools = {r.pair_contract: r.pool_id for r in ingested["pools"].collect()}
    vols = {(b.pool_id, b.bucket_start.minute): b.volume_zig for b in bars}
    assert vols[(pools[PAIR_A], 1)] == pytest.approx(7.4)  # 5.0 buy + 2.4 sell
    assert vols[(pools[PAIR_B], 1)] == pytest.approx(7.0)
    assert vols[(pools[PAIR_A], 2)] == pytest.approx(3.0)
    assert vols[(pools[PAIR_B], 2)] == pytest.approx(2.5)


def test_reingest_is_noop(spark, raw_df, ingested):
    out2 = blocks.ingest(
        raw_df,
        existing_pools=ingested["pools"],
        existing_trades=ingested["trades"],
        router_addr=ROUTER,
    )
    assert out2["pools"].count() == 0
    assert out2["trades"].count() == 0


def test_streaming_ingest_end_to_end(spark, tmp_path, raw_df):
    import shutil

    from degenter_clickhouse_spark.streaming import pipeline as SP

    landing = tmp_path / "landing"
    landing.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows = [json.dumps(b) for b in raw_blocks()]
    (landing / "batch1.json").write_text("\n".join(rows[:2]))
    created = []
    SP.stream_ingest(
        spark, str(landing), out_dir, ckpt, router_addr=ROUTER,
        on_pair_created=lambda rs: created.extend(rs),
    )
    t1 = SP.read_output(spark, out_dir, "trades").count()
    assert t1 == 3  # block 2's swaps
    assert len(created) == 2  # ST7 fast-track fired for both pools
    # second batch: blocks 3 + replay of block 2 -> only new rows land
    (landing / "batch2.json").write_text("\n".join(rows[2:]))
    SP.stream_ingest(spark, str(landing), out_dir, ckpt, router_addr=ROUTER)
    trades = SP.read_output(spark, out_dir, "trades")
    assert trades.count() == 7  # 5 swaps + 2 liquidity, replay deduped
    keys = trades.select("pool_id", "tx_hash", "msg_index").collect()
    assert len(keys) == len({(k.pool_id, k.tx_hash, k.msg_index) for k in keys})
    # partitioned layout on dt for pruning
    assert any(p.name.startswith("dt=") for p in (tmp_path / "out" / "trades").iterdir())


def test_malformed_events_are_skipped(spark):
    """create_pair without contract/pair, swaps with non-digit amounts,
    and empty blocks must never produce rows or throw (ANSI-safe)."""
    import json as _json

    bad = [
        {
            "height": 99,
            "time": "2024-05-01T13:00:00",
            "txs": [base64.b64encode(b"tx-bad-0").decode()],
            "tx_results": [
                {
                    "events": [
                        {"type": "wasm", "attributes": [
                            _attr("action", "create_pair")  # no contract, no pair
                        ]},
                        {"type": "wasm", "attributes": [
                            _attr("action", "create_pair"),
                            _attr("_contract_address", "zig1nopair"),
                            _attr("pair", "nodashpair"),  # unsplittable
                        ]},
                        {"type": "wasm", "attributes": [
                            _attr("action", "swap"),
                            _attr("_contract_address", "zig1unknowncontract"),
                            _attr("offer_asset", "uzig"),
                            _attr("offer_amount", "not-a-number"),
                            _attr("ask_asset", "ualpha"),
                            _attr("return_amount", "12x34"),
                            _attr("msg_index", 0),
                        ]},
                    ]
                }
            ],
        },
        {"height": 100, "time": "2024-05-01T13:00:05", "txs": [], "tx_results": []},
    ]
    raw = spark.read.schema(blocks.RAW_SCHEMA).json(
        spark.sparkContext.parallelize([_json.dumps(b) for b in bad])
    )
    out = blocks.ingest(raw)
    assert out["pools"].count() == 0
    assert out["trades"].count() == 0  # swap contract matches no pool
    assert out["prices"].count() == 0


def test_cli_indexer_jobs_query_end_to_end(spark, tmp_path, capsys):
    """The three process entry points, driven exactly as a user would:
    indexer --once drains the landing zone into facts, jobs --once
    materializes the rollups, query serves SQL over the views."""
    import json as _json

    from degenter_clickhouse_spark.cli import main

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "blocks.json").write_text(
        "\n".join(_json.dumps(b) for b in raw_blocks())
    )
    storage = str(tmp_path / "storage")
    assert main([
        "indexer", "--landing", str(landing), "--storage", storage,
        "--checkpoint", str(tmp_path / "ckpt"), "--router-addr", ROUTER, "--once",
    ]) == 0
    assert spark.read.parquet(f"{storage}/trades").count() == 7
    assert main([
        "jobs", "--storage", storage, "--output", str(tmp_path / "jobs"), "--once",
    ]) == 0
    pm = spark.read.parquet(str(tmp_path / "jobs" / "pool_matrix"))
    assert pm.select("bucket").distinct().count() == 4
    capsys.readouterr()
    assert main([
        "query", "--storage", storage,
        "--sql", "SELECT COUNT(*) AS n FROM latest_prices",
    ]) == 0
    out = capsys.readouterr().out
    assert "|n" in out and "|2" in out  # count table printed: 2 priced pools


def test_cli_corpus_ingest_and_compact(spark, tmp_path, capsys):
    """The maintenance/LLM-pipeline entry points: corpus-ingest --once
    drains a document landing zone through the online dedup + quality
    gate; compact collapses an append-fragmented table."""
    import json as _json

    from degenter_clickhouse_spark.cli import main

    landing = tmp_path / "docs"
    landing.mkdir()
    good = "the quick brown fox jumps over the lazy dog again tonight"
    (landing / "b.json").write_text("\n".join([
        _json.dumps({"doc_id": 1, "text": good, "lang": "en", "source": "s",
                     "n_chars": len(good), "event_ts": "2024-01-01 10:00:00"}),
        _json.dumps({"doc_id": 2, "text": "hi", "lang": "en", "source": "s",
                     "n_chars": 2, "event_ts": "2024-01-01 10:00:00"}),
    ]))
    out_dir = str(tmp_path / "corpus")
    assert main([
        "corpus-ingest", "--landing", str(landing), "--output", out_dir,
        "--checkpoint", str(tmp_path / "cckpt"),
        "--near-dup-threshold", "0.5", "--once",
    ]) == 0
    assert [r.doc_id for r in spark.read.parquet(f"{out_dir}/accepted").collect()] == [1]
    assert [r.reject_reason for r in spark.read.parquet(
        f"{out_dir}/quarantine").collect()] == ["too_short"]

    tbl = str(tmp_path / "tbl")
    spark.range(0, 50).write.mode("append").parquet(tbl)
    spark.range(50, 100).write.mode("append").parquet(tbl)
    capsys.readouterr()
    assert main(["compact", "--path", tbl, "--partition-col", "none",
                 "--files-per-partition", "1"]) == 0
    assert "files_after" in capsys.readouterr().out
    assert spark.read.parquet(tbl).count() == 100


def test_cli_import_pools_csv(spark, tmp_path, capsys):
    """The pools CSV backfill entry point: --dry previews without
    writing; a real run appends normalized rows; re-running the same
    CSV inserts nothing (anti-join on pair_contract)."""
    from degenter_clickhouse_spark.cli import main

    csv = tmp_path / "pools.csv"
    csv.write_text(
        "pair_contract,pair,pair_type,lp_token_denom,created_at\n"
        "zig1poolaaa,coin.zig1f.utok-uzig,xyk,lp/aaa,2024-01-01 00:00:00\n"
        "zig1poolbbb,uzig-coin.zig1g.uoth,,lp/bbb,2024-01-02 00:00:00\n"
    )
    storage = str(tmp_path / "storage")
    capsys.readouterr()
    assert main(["import-pools", "--csv", str(csv), "--storage", storage,
                 "--dry"]) == 0
    assert "would insert: 2" in capsys.readouterr().out
    import os

    assert not os.path.exists(os.path.join(storage, "pools"))  # dry wrote nothing
    assert main(["import-pools", "--csv", str(csv), "--storage", storage]) == 0
    assert "inserted: 2" in capsys.readouterr().out
    pools = {r.pair_contract: r for r in spark.read.parquet(
        os.path.join(storage, "pools")).collect()}
    assert set(pools) == {"zig1poolaaa", "zig1poolbbb"}
    # uzig forced to the quote side regardless of CSV order
    assert pools["zig1poolbbb"].quote_denom == "uzig"
    assert pools["zig1poolbbb"].base_denom == "coin.zig1g.uoth"
    assert pools["zig1poolbbb"].pair_type == "xyk"  # default filled
    # idempotent: same CSV again inserts nothing
    assert main(["import-pools", "--csv", str(csv), "--storage", storage]) == 0
    assert "inserted: 0" in capsys.readouterr().out
    assert spark.read.parquet(os.path.join(storage, "pools")).count() == 2


def test_cli_corpus_clean_and_split(spark, tmp_path, capsys):
    """Batch LLM-pipeline entry points: corpus-clean writes the span
    audit + cleaned text tables; corpus-split writes leakage-free split
    assignments with cluster-mates co-located."""
    from degenter_clickhouse_spark.cli import main

    docs_path = str(tmp_path / "docs_in")
    run = " ".join(f"s{i}" for i in range(6))
    spark.createDataFrame(
        [
            (0, "a0 a1 " + run + " a2"),
            (1, run),
            (2, "c0 c1 c2 c3 c4 c5"),
        ],
        ["doc_id", "text"],
    ).write.parquet(docs_path)

    out = str(tmp_path / "cleaned_out")
    assert main(["corpus-clean", "--input", docs_path, "--output", out]) == 0
    spans = spark.read.parquet(out + "/spans")
    cleaned = {
        r.doc_id: r.cleaned_text
        for r in spark.read.parquet(out + "/cleaned").collect()
    }
    assert spans.count() == 2  # one span in doc 0, one in doc 1
    assert cleaned[0] == "a0 a1 a2" and cleaned[1] == "" and cleaned[2].startswith("c0")

    split_in = str(tmp_path / "split_in")
    dup = " ".join(f"d{i}" for i in range(10))
    spark.createDataFrame(
        [(0, dup), (1, dup), (2, "z0 z1 z2 z3 z4 z5 z6 z7 z8 z9")],
        ["doc_id", "text"],
    ).write.parquet(split_in)
    split_out = str(tmp_path / "split_out")
    assert main([
        "corpus-split", "--input", split_in, "--output", split_out,
        "--fracs", "train=0.8,val=0.1,test=0.1",
    ]) == 0
    rows = {r.doc_id: r for r in spark.read.parquet(split_out).collect()}
    assert set(rows) == {0, 1, 2}
    assert all(r.split in {"train", "val", "test"} for r in rows.values())
    # docs 0 and 1 are exact near-dups (jaccard 1.0) -> same cluster/split
    assert rows[0].split == rows[1].split and rows[0].group_id == rows[1].group_id


def test_cli_corpus_ingest_with_validation(spark, tmp_path, capsys):
    """--validate-constraints wires the JSON spec file into the
    streaming per-batch quality ledger."""
    import json as _json
    import os

    from degenter_clickhouse_spark.cli import main

    landing = tmp_path / "landing"
    landing.mkdir()
    good = "the quick brown fox jumps over the lazy dog again and again"
    (landing / "b1.json").write_text("\n".join(_json.dumps({
        "doc_id": i, "text": good + f" {i}", "lang": "en", "source": "s",
        "n_chars": len(good) + 2, "event_ts": "2024-01-01 10:00:00",
    }) for i in range(3)))
    specs = tmp_path / "specs.json"
    specs.write_text(_json.dumps([
        {"type": "not_null", "col": "doc_id"},
        {"type": "unique", "cols": ["doc_id"]},
    ]))
    out = str(tmp_path / "out")
    assert main([
        "corpus-ingest", "--landing", str(landing), "--output", out,
        "--checkpoint", str(tmp_path / "ckpt"), "--once",
        "--validate-constraints", str(specs),
    ]) == 0
    rep = spark.read.parquet(os.path.join(out, "quality_reports"))
    rows = {r["constraint"]: r["passed"] for r in rep.collect()}
    assert rows == {"not_null(doc_id)": True, "unique(doc_id)": True}


def test_streaming_maintained_partials(spark, tmp_path, raw_df):
    """maintain_partials=True appends per-batch matrix + leaderboard
    partials that MERGE AT READ across micro-batches: trailing merges
    over the stream-grown stores equal the from-scratch partials over
    everything ingested, and a lost-checkpoint replay appends nothing
    (effectively-once flows from the trades dedup)."""
    from degenter_clickhouse_spark.plans import incremental as INC
    from degenter_clickhouse_spark.streaming import pipeline as SP

    landing = tmp_path / "landing"
    landing.mkdir()
    out_dir = str(tmp_path / "out")
    rows = [json.dumps(b) for b in raw_blocks()]
    (landing / "batch1.json").write_text("\n".join(rows[:2]))
    SP.stream_ingest(spark, str(landing), out_dir, str(tmp_path / "ck1"),
                     router_addr=ROUTER, maintain_partials=True,
                     hot_signer_threshold=4096)
    (landing / "batch2.json").write_text("\n".join(rows[2:]))
    SP.stream_ingest(spark, str(landing), out_dir, str(tmp_path / "ck1"),
                     router_addr=ROUTER, maintain_partials=True,
                     hot_signer_threshold=4096)

    trades = SP.read_output(spark, out_dir, "trades")
    now = F.to_timestamp(F.lit("2024-05-01 13:00:00"))
    pm_stream = spark.read.parquet(f"{out_dir}/minute_partials")
    assert {"__day", "signers", "signers_sk"} <= set(pm_stream.columns)
    got = {
        r.pool_id: (r.tx_buy, r.tx_sell, r.traders, float(r.vol_buy_base),
                    float(r.vol_sell_base))
        for r in INC.trailing_volumes(pm_stream, now, 1440).collect()
    }
    want = {
        r.pool_id: (r.tx_buy, r.tx_sell, r.traders, float(r.vol_buy_base),
                    float(r.vol_sell_base))
        for r in INC.trailing_volumes(
            INC.minute_partials(trades, hot_signer_threshold=4096), now, 1440
        ).collect()
    }
    assert got == want and got
    lb_stream = spark.read.parquet(f"{out_dir}/signer_minute_partials")
    got_lb = {
        r.signer: (r.trades, round(r.volume_zig, 9))
        for r in INC.leaderboard_from_partials(lb_stream, now, 1440).collect()
    }
    want_lb = {
        r.signer: (r.trades, round(r.volume_zig, 9))
        for r in INC.leaderboard_from_partials(
            INC.signer_minute_partials(trades), now, 1440
        ).collect()
    }
    assert got_lb == want_lb and got_lb
    # lost-checkpoint full replay: trades dedupe -> zero partial rows
    n_before = pm_stream.count()
    SP.stream_ingest(spark, str(landing), out_dir, str(tmp_path / "ck2"),
                     router_addr=ROUTER, maintain_partials=True,
                     hot_signer_threshold=4096)
    assert spark.read.parquet(f"{out_dir}/minute_partials").count() == n_before
    assert INC.trailing_volumes(
        spark.read.parquet(f"{out_dir}/minute_partials"), now, 1440
    ).count() == len(got)


def test_partials_survive_crash_before_fact_append(spark, tmp_path):
    """ADVICE r9 (medium): the old order appended partials AFTER the
    fact table, so a crash in between dropped them permanently (the
    replay dedupes trades to empty and skips the append). With the
    partials-first protocol, a crashed batch that completed its
    partials appends (done marker written) but never appended trades is
    replayed correctly: partials are skipped (already durable), trades
    land, and the merged reads equal a from-scratch recompute."""
    from degenter_clickhouse_spark.plans import incremental as INC
    from degenter_clickhouse_spark.sources import blocks as B
    from degenter_clickhouse_spark.streaming import pipeline as SP

    landing = tmp_path / "landing"
    landing.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows = [json.dumps(b) for b in raw_blocks()]
    (landing / "batch1.json").write_text("\n".join(rows[:2]))
    SP.stream_ingest(spark, str(landing), out_dir, ckpt,
                     router_addr=ROUTER, maintain_partials=True,
                     hot_signer_threshold=4096)

    # simulate batch 1 crashing between the done marker and the trades
    # append: run the partials half by hand with the tag the replay
    # will use, then leave the fact table untouched
    (landing / "batch2.json").write_text("\n".join(rows[2:]))
    raw2 = spark.read.schema(B.RAW_SCHEMA).json(str(landing / "batch2.json"))
    crashed_out = B.ingest(
        raw2,
        existing_pools=SP.read_output(spark, out_dir, "pools"),
        existing_trades=SP.read_output(spark, out_dir, "trades"),
        router_addr=ROUTER,
    )
    crashed = crashed_out["trades"].localCheckpoint(eager=True)
    assert crashed.count() > 0
    tag = SP._batch_tag(ckpt, 1)
    SP._write_marker(SP._marker_paths(out_dir)[0], tag)
    for name in ("prices", "pool_state"):
        crashed_out[name].write.mode("append").parquet(f"{out_dir}/{name}")
    SP._tagged_file_append(crashed_out["ohlcv_1m"], f"{out_dir}/ohlcv_1m", tag)
    SP.maintain_partials_for_batch(crashed, out_dir, tag,
                                   hot_signer_threshold=4096)
    SP._write_marker(SP._marker_paths(out_dir)[1], tag)
    n_partials_after_crash = spark.read.parquet(
        f"{out_dir}/minute_partials"
    ).count()
    n_ohlcv_after_crash = spark.read.parquet(f"{out_dir}/ohlcv_1m").count()

    # restart: the replay must append the TRADES but no derived rows
    SP.stream_ingest(spark, str(landing), out_dir, ckpt,
                     router_addr=ROUTER, maintain_partials=True,
                     hot_signer_threshold=4096)
    store = spark.read.parquet(f"{out_dir}/minute_partials")
    assert store.count() == n_partials_after_crash  # no re-append
    assert spark.read.parquet(f"{out_dir}/ohlcv_1m").count() == n_ohlcv_after_crash
    trades = SP.read_output(spark, out_dir, "trades")
    assert trades.count() == 7  # the replay landed the crashed facts
    now = F.to_timestamp(F.lit("2024-05-01 13:00:00"))
    got = {
        r.pool_id: (r.tx_buy, r.tx_sell, r.traders)
        for r in INC.trailing_volumes(store, now, 1440).collect()
    }
    want = {
        r.pool_id: (r.tx_buy, r.tx_sell, r.traders)
        for r in INC.trailing_volumes(
            INC.minute_partials(trades, hot_signer_threshold=4096), now, 1440
        ).collect()
    }
    assert got == want and got


def test_partials_replay_duplicates_collapse_at_read(spark, tmp_path):
    """A crash between the partials appends and the done marker makes
    the replay re-append the SAME rows under the SAME __batch tag:
    the store holds duplicates, but every trailing merge collapses
    them per (group, minute, batch) — sums and signer unions match the
    single-copy store exactly. Until the marker settles, the batch's
    tag is reported unsafe so compaction leaves its rows unmerged."""
    from degenter_clickhouse_spark.plans import incremental as INC
    from degenter_clickhouse_spark.streaming import pipeline as SP

    landing = tmp_path / "landing"
    landing.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows = [json.dumps(b) for b in raw_blocks()]
    (landing / "batch1.json").write_text("\n".join(rows))
    SP.stream_ingest(spark, str(landing), out_dir, ckpt,
                     router_addr=ROUTER, maintain_partials=True,
                     hot_signer_threshold=4096, large_trade_min_zig=0.0)
    now = F.to_timestamp(F.lit("2024-05-01 13:00:00"))
    trades = SP.read_output(spark, out_dir, "trades")
    single_pm = {
        r.pool_id: (r.tx_buy, r.tx_sell, r.traders, float(r.vol_buy_base))
        for r in INC.trailing_volumes(
            spark.read.parquet(f"{out_dir}/minute_partials"), now, 1440
        ).collect()
    }
    single_lb = {
        r.signer: (r.trades, round(r.volume_zig, 9))
        for r in INC.leaderboard_from_partials(
            spark.read.parquet(f"{out_dir}/signer_minute_partials"), now, 1440
        ).collect()
    }
    n_pm = spark.read.parquet(f"{out_dir}/minute_partials").count()

    # replay re-append: identical rows, identical tag (simulates the
    # crash window between the appends and the done marker)
    tag = SP._batch_tag(ckpt, 0)
    SP._write_marker(SP._marker_paths(out_dir)[0], tag)  # started != done
    SP._write_marker(SP._marker_paths(out_dir)[1], "some-older-tag")
    assert SP.unsafe_partials_tag(out_dir) == tag
    SP.maintain_partials_for_batch(trades, out_dir, tag,
                                   hot_signer_threshold=4096,
                                   large_trade_min_zig=0.0)
    store = spark.read.parquet(f"{out_dir}/minute_partials")
    assert store.count() == 2 * n_pm  # duplicates really are on disk
    got_pm = {
        r.pool_id: (r.tx_buy, r.tx_sell, r.traders, float(r.vol_buy_base))
        for r in INC.trailing_volumes(store, now, 1440).collect()
    }
    got_lb = {
        r.signer: (r.trades, round(r.volume_zig, 9))
        for r in INC.leaderboard_from_partials(
            spark.read.parquet(f"{out_dir}/signer_minute_partials"), now, 1440
        ).collect()
    }
    assert got_pm == single_pm and got_lb == single_lb
    # the large-trades store dedupes keylessly through keep-latest (W1)
    lt = INC.large_trades_from_store(
        spark.read.parquet(f"{out_dir}/large_trades_store"), now, 1440
    ).collect()
    keys = {(r.tx_hash, r.pool_id, r.direction) for r in lt}
    assert len(keys) == len(lt)
    # ohlcv_1m replays are FILE-tag idempotent: re-appending the same
    # batch under the same tag unlinks the crashed attempt's files
    # first, so candle volumes never double-count
    from degenter_clickhouse_spark.sources import blocks as B

    n_ohlcv = spark.read.parquet(f"{out_dir}/ohlcv_1m").count()
    replay_ohlcv = B.ingest(
        spark.read.schema(B.RAW_SCHEMA).json(str(landing / "batch1.json")),
        router_addr=ROUTER,
    )["ohlcv_1m"]
    SP._tagged_file_append(replay_ohlcv, f"{out_dir}/ohlcv_1m", tag)
    assert spark.read.parquet(f"{out_dir}/ohlcv_1m").count() == n_ohlcv


def test_ohlcv_day_layout_compacts_dirty_days_and_defers_unsettled(
    spark, tmp_path
):
    """ADVICE r10: the streamed ohlcv_1m store is __day-partitioned so
    the compact slot rewrites only dirty days (the flat layout forced a
    full-table rewrite forever). The tag-file replay identity survives
    the layout: an unlink covers whichever days the batch touched, the
    under-lock guard defers compaction while a batch is unsettled, and
    resampled reads are identical before/after the rewrite."""
    import glob
    import os

    from degenter_clickhouse_spark.operators import merge as M
    from degenter_clickhouse_spark.operators import ohlcv as OH
    from degenter_clickhouse_spark.sources import blocks as B
    from degenter_clickhouse_spark.streaming import pipeline as SP

    landing = tmp_path / "landing"
    landing.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows = [json.dumps(b) for b in raw_blocks()]
    (landing / "batch1.json").write_text("\n".join(rows))
    SP.stream_ingest(spark, str(landing), out_dir, ckpt,
                     router_addr=ROUTER, maintain_partials=True,
                     hot_signer_threshold=4096)
    path = f"{out_dir}/ohlcv_1m"
    day_dirs = glob.glob(f"{path}/__day=*")
    assert day_dirs  # partitioned layout
    assert not glob.glob(f"{path}/*.parquet")  # no root-level files

    # a second tagged append (same candles, new tag) fragments the days
    replay = B.ingest(
        spark.read.schema(B.RAW_SCHEMA).json(str(landing / "batch1.json")),
        router_addr=ROUTER,
    )["ohlcv_1m"].localCheckpoint(eager=True)
    tag2 = SP._batch_tag(ckpt, 77)
    SP._tagged_file_append(replay, path, tag2)
    files_before = glob.glob(f"{path}/**/*.parquet", recursive=True)
    assert len(files_before) > len(day_dirs)

    def resampled():
        return sorted(
            (r.pool_id, str(r.bucket_start), float(r.volume), r.trade_count)
            for r in OH.resample(
                spark.read.parquet(path)
                .drop("__day")
                .withColumnRenamed("volume_zig", "volume"),
                900,
            ).collect()
        )

    want = resampled()

    # unsettled marker: the guard defers the rewrite (tag files intact)
    SP._write_marker(SP._marker_paths(out_dir)[0], tag2)
    SP._write_marker(SP._marker_paths(out_dir)[1], "older")
    got = M.compact_table(
        spark, path, partition_col="__day", dirty_only=True,
        guard=lambda: SP.unsafe_partials_tag(out_dir) is None,
    )
    assert got.get("skipped") == 1
    assert sorted(glob.glob(f"{path}/**/*.parquet", recursive=True)) == sorted(
        files_before
    )
    # the unsettled batch's replay unlinks its files across day dirs
    safe2 = tag2.replace(":", "-")
    assert glob.glob(f"{path}/**/part-{safe2}-*", recursive=True)
    SP._tagged_file_append(replay, path, tag2)
    assert resampled() == want  # idempotent under the day layout

    # settled: dirty-only rewrite collapses each day to one file
    SP._write_marker(SP._marker_paths(out_dir)[1], tag2)
    got = M.compact_table(
        spark, path, partition_col="__day", dirty_only=True,
        guard=lambda: SP.unsafe_partials_tag(out_dir) is None,
    )
    assert "skipped" not in got
    assert got["files_after"] == len(day_dirs)
    assert resampled() == want
    # steady state: nothing left for the excess gate
    assert M.excess_file_count(path, 1) == 0
