"""Incremental rollup maintenance must agree exactly with the direct
recompute over raw trades (minute-aligned windows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from degenter_clickhouse_spark.plans import incremental as INC
from degenter_clickhouse_spark.plans import pool_matrix as PM

from .test_domain import _now, dom  # noqa: F401


def test_trailing_from_partials_equals_direct(spark, dom):  # noqa: F811
    partials = INC.minute_partials(dom["trades_clean"]).cache()
    for minutes in (30, 240, 1440):
        direct = {
            r.pool_id: r
            for r in PM.trade_volumes(
                dom["trades_clean"], dom["pools"], dom["tokens"], _now(), minutes
            ).collect()
        }
        inc = {
            r.pool_id: r
            for r in INC.trailing_volumes(partials, _now(), minutes).collect()
        }
        assert set(direct) == set(inc), minutes
        for pid, d in direct.items():
            i = inc[pid]
            assert i.tx_buy == d.tx_buy, (minutes, pid)
            assert i.tx_sell == d.tx_sell, (minutes, pid)
            assert i.traders == d.traders, (minutes, pid)
            # all fixture quote tokens have exponent 6: base == disp*1e6
            assert float(i.vol_buy_base) == pytest.approx(
                d.vol_buy_zig * 1e6, rel=1e-9
            ), (minutes, pid)
            assert float(i.vol_sell_base) == pytest.approx(
                d.vol_sell_zig * 1e6, rel=1e-9
            ), (minutes, pid)
    partials.unpersist()


def test_partials_merge_replayed_appends(spark, dom):  # noqa: F811
    """Appending the same micro-batch twice then merging at read gives
    doubled sums — which is why ingest dedupes BEFORE partials; with
    deduped input, re-deriving partials is idempotent."""
    p1 = INC.minute_partials(dom["trades_clean"])
    p2 = INC.minute_partials(dom["trades_clean"])
    assert p1.count() == p2.count()
    a = INC.trailing_volumes(p1, _now(), 1440).collect()
    b = INC.trailing_volumes(p2, _now(), 1440).collect()
    assert {(r.pool_id, r.tx_buy, r.tx_sell) for r in a} == {
        (r.pool_id, r.tx_buy, r.tx_sell) for r in b
    }


def test_refresh_partials_from_vt_changes(spark, dom, tmp_path):  # noqa: F811
    """CDC-driven maintenance: after upserting a delta into the
    versioned trades table, refreshing only the changed (pool, minute)
    groups reproduces exactly the partials of a full recompute."""
    from degenter_clickhouse_spark.operators import versioned as V

    trades = dom["trades_clean"]
    table = str(tmp_path / "trades_vt")
    parts = str(tmp_path / "partials")
    half = trades.limit(trades.count() // 2).cache()
    V.vt_write(spark, half, table)
    INC.minute_partials(half).write.parquet(parts)
    # delta: the remaining trades arrive (keyed upsert on trade_id-ish
    # tuple; use tx_hash+msg_index which is unique in the fixture)
    V.vt_upsert(spark, trades, table, keys=["tx_hash", "msg_index"])
    n = INC.refresh_partials_from_changes(spark, table, parts, from_version=1)
    assert n > 0
    got = {
        (r.pool_id, r.minute): (r.tx_buy, r.tx_sell, sorted(r.signers))
        for r in spark.read.parquet(parts).collect()
    }
    want = {
        (r.pool_id, r.minute): (r.tx_buy, r.tx_sell, sorted(r.signers))
        for r in INC.minute_partials(V.vt_read(spark, table)).collect()
    }
    half.unpersist()
    assert got == want
    # no-op refresh when the cursor is current
    assert (
        INC.refresh_partials_from_changes(
            spark, table, parts, from_version=V.vt_version(table)
        )
        == 0
    )


def test_sketch_signer_partials_within_tolerance(spark, dom):  # noqa: F811
    """HLL-state signer partials (the unbounded-cardinality escape
    hatch) merge to trader counts matching the exact path — equal at
    fixture cardinalities, and all other columns stay exact."""
    exact = {
        r.pool_id: r
        for r in INC.trailing_volumes(
            INC.minute_partials(dom["trades_clean"]), _now(), 1440
        ).collect()
    }
    sk = {
        r.pool_id: r
        for r in INC.trailing_volumes(
            INC.minute_partials(dom["trades_clean"], sketch_signers=True),
            _now(),
            1440,
        ).collect()
    }
    assert set(exact) == set(sk)
    for pid, e in exact.items():
        s = sk[pid]
        assert (s.tx_buy, s.tx_sell) == (e.tx_buy, e.tx_sell)
        assert abs(s.traders - e.traders) <= max(2, 0.05 * e.traders)


def test_refresh_removes_vacated_groups(spark, dom, tmp_path):  # noqa: F811
    """ADVICE r4: a CDC delta that deletes ALL swaps of a (pool, minute)
    group must remove the group's stale partial row — otherwise
    trailing_volumes overcounts forever."""
    from degenter_clickhouse_spark.operators import versioned as V

    trades = dom["trades_clean"]
    table = str(tmp_path / "trades_vt")
    parts = str(tmp_path / "partials")
    V.vt_write(spark, trades, table)
    INC.minute_partials(trades).write.parquet(parts)
    # pick one (pool, minute) group and delete every one of its swaps
    victim = (
        trades.filter(F.col("action") == "swap")
        .select(
            "pool_id", F.date_trunc("minute", F.col("created_at")).alias("minute")
        )
        .limit(1)
        .collect()[0]
    )
    doomed = trades.filter(
        (F.col("pool_id") == victim.pool_id)
        & (F.date_trunc("minute", F.col("created_at")) == victim.minute)
        & (F.col("action") == "swap")
    )
    assert doomed.count() > 0
    V.vt_delete(spark, table, ["tx_hash", "msg_index"], doomed)
    n = INC.refresh_partials_from_changes(spark, table, parts, from_version=1)
    assert n >= 1
    got = {
        (r.pool_id, r.minute): (r.tx_buy, r.tx_sell)
        for r in spark.read.parquet(parts).collect()
    }
    want = {
        (r.pool_id, r.minute): (r.tx_buy, r.tx_sell)
        for r in INC.minute_partials(V.vt_read(spark, table)).collect()
    }
    assert (victim.pool_id, victim.minute) not in got
    assert got == want


def test_runner_incremental_matrix_equals_direct(spark, dom, tmp_path):  # noqa: F811
    """VERDICT r7 #9: with ``trades_vt`` set, the JobsRunner's 30m/1h
    pool-matrix buckets ride CDC partials — and must equal the direct
    full-recompute rows EXACTLY, across the initial tick (cursor 0 ->
    full partials build) and a later tick after a CDC delta. The
    cursor persists so the second tick reads only the delta."""
    from degenter_clickhouse_spark.engine import DegenterEngine
    from degenter_clickhouse_spark.jobs import JobsRunner
    from degenter_clickhouse_spark.operators import versioned as V

    trades = dom["trades_clean"].cache()
    half = trades.limit(trades.count() // 2).cache()
    table = str(tmp_path / "trades_vt")
    V.vt_write(spark, half, table)

    def mk_engine(tr):
        return DegenterEngine(spark, tables={
            "tokens": dom["tokens"], "pools": dom["pools"], "trades": tr,
            "prices": dom["prices"], "pool_state": dom["pool_state"],
            "ohlcv_1m": dom["ohlcv_1m"],
            "exchange_rates": dom["exchange_rates"],
            "holders": dom["holders"],
        })

    cadences = {"leaderboard": 10**9, "security": 10**9, "alerts": 10**9,
                "compact": 10**9}

    def matrix_rows(out_dir):
        pool = sorted(
            (r.pool_id, r.bucket, round(r.vol_buy_zig, 9),
             round(r.vol_sell_zig, 9), r.tx_buy, r.tx_sell, r.traders,
             None if r.price_in_zig is None else round(r.price_in_zig, 9),
             round(r.tvl_zig, 9))
            for r in spark.read.parquet(f"{out_dir}/pool_matrix").collect()
        )
        token = sorted(
            (r.token_id, r.bucket, round(r.vol_buy_zig, 9),
             round(r.vol_sell_zig, 9), r.tx_buy, r.tx_sell, r.traders,
             None if r.price_in_zig is None else round(r.price_in_zig, 9),
             r.holders)
            for r in spark.read.parquet(f"{out_dir}/token_matrix").collect()
        )
        return pool, token

    inc_out, full_out = str(tmp_path / "inc"), str(tmp_path / "full")
    r_inc = JobsRunner(mk_engine(V.vt_read(spark, table)), inc_out,
                       cadences=cadences, trades_vt=table)
    r_full = JobsRunner(mk_engine(half), full_out, cadences=cadences)
    # VERDICT r8 #2: the incremental path now covers ALL FOUR buckets
    # by default — the trailing-24h re-aggregation was the hottest
    # recurring scan
    assert r_inc.incremental_buckets == ("30m", "1h", "4h", "24h")
    r_inc.tick(at=1000.0, now_col=_now())
    r_full.tick(at=1000.0, now_col=_now())
    assert matrix_rows(inc_out) == matrix_rows(full_out)
    cursor1 = r_inc._cursor.read() or 0
    assert cursor1 >= 1

    # CDC delta: the remaining trades arrive via upsert
    V.vt_upsert(spark, trades, table, keys=["tx_hash", "msg_index"])
    r_inc.engine = mk_engine(V.vt_read(spark, table))
    r_full.engine = mk_engine(trades)
    r_inc.tick(at=2000.0, now_col=_now())
    r_full.tick(at=2000.0, now_col=_now())
    assert matrix_rows(inc_out) == matrix_rows(full_out)
    assert (r_inc._cursor.read() or 0) > cursor1  # cursor advanced past the delta
    half.unpersist()
    trades.unpersist()


def test_day_partitioned_partials_refresh_and_pruned_reads(spark, dom, tmp_path):  # noqa: F811
    """The day-partitioned partials store (write_partials): a CDC
    refresh rewrites ONLY the delta's days (bounded write — the flat
    store's full-table upsert grows with history), equals the full
    recompute including vacated-group removal, and trailing reads
    prune whole days at planning."""
    import re

    from degenter_clickhouse_spark.operators import versioned as V

    trades = dom["trades_clean"].cache()
    half = trades.limit(trades.count() // 2).cache()
    table = str(tmp_path / "trades_vt")
    parts = str(tmp_path / "partials")
    V.vt_write(spark, half, table)
    INC.write_partials(INC.minute_partials(half), parts)
    assert "__day" in spark.read.parquet(parts).columns

    # delta: rest arrives + one group fully deleted
    V.vt_upsert(spark, trades, table, keys=["tx_hash", "msg_index"])
    victim = (
        trades.filter(F.col("action") == "swap")
        .select("pool_id", F.date_trunc("minute", F.col("created_at")).alias("minute"))
        .limit(1)
        .collect()[0]
    )
    doomed = trades.filter(
        (F.col("pool_id") == victim.pool_id)
        & (F.date_trunc("minute", F.col("created_at")) == victim.minute)
        & (F.col("action") == "swap")
    )
    V.vt_delete(spark, table, ["tx_hash", "msg_index"], doomed)
    n = INC.refresh_partials_from_changes(spark, table, parts, from_version=1)
    assert n >= 1
    got = {
        (r.pool_id, r.minute): (r.tx_buy, r.tx_sell, sorted(r.signers))
        for r in spark.read.parquet(parts).drop("__day").collect()
    }
    want = {
        (r.pool_id, r.minute): (r.tx_buy, r.tx_sell, sorted(r.signers))
        for r in INC.minute_partials(V.vt_read(spark, table)).collect()
    }
    assert (victim.pool_id, victim.minute) not in got
    assert got == want
    # trailing read prunes day partitions at planning
    plan = (
        INC.trailing_volumes(spark.read.parquet(parts), _now(), 60)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "__day" in m.group(1), plan[:2000]
    half.unpersist()
    trades.unpersist()


def test_latest_by_backscan_early_stop_and_equality(spark, dom, tmp_path):  # noqa: F811
    """ClickHouse's ORDER BY pk DESC LIMIT 1 early-stop, in Spark: the
    per-pool latest bar comes from probing day partitions newest-first,
    stopping once every universe key is covered — NOT from a full-table
    max_by. Exactness: equal to latest_by over the whole store for
    every covered key; keys with no rows anywhere are absent, exactly
    like latest_by. Early stop: the scan depth equals how far back the
    stalest universe key's last row is."""
    import os

    from degenter_clickhouse_spark.operators import latest as L

    rows = []
    # pool 1 trades every day; pool 2 stops after 03-02; pool 3 never
    for day in (1, 2, 3, 4):
        rows.append((1, f"2024-03-0{day} 10:00:00", float(day)))
        if day <= 2:
            rows.append((2, f"2024-03-0{day} 11:00:00", 10.0 + day))
    df = spark.createDataFrame(
        rows, "pool_id long, bucket_start string, close double"
    ).withColumn("bucket_start", F.col("bucket_start").cast("timestamp"))
    path = str(tmp_path / "ohlcv_1m")
    df.withColumn("__day", F.to_date("bucket_start")).repartition(
        F.col("__day")
    ).write.partitionBy("__day").parquet(path)

    def uni(*ids):
        return spark.createDataFrame([(i,) for i in ids], "pool_id long")

    want_full = {
        (r.pool_id, r.close, str(r.bucket_start))
        for r in L.latest_by(
            spark.read.parquet(path), ["pool_id"], ["close", "bucket_start"],
            ["bucket_start"],
        ).collect()
    }

    got, days = L.latest_by_backscan(
        spark, path, ["pool_id"], ["close"], ["bucket_start"], uni(1)
    )
    assert days == 1  # pool 1's latest is in the newest day
    assert {(r.pool_id, r.close, str(r.bucket_start)) for r in got.collect()} == {
        t for t in want_full if t[0] == 1
    }

    got, days = L.latest_by_backscan(
        spark, path, ["pool_id"], ["close"], ["bucket_start"], uni(1, 2)
    )
    assert days == 3  # pool 2's last row sits 3 days back
    assert {(r.pool_id, r.close, str(r.bucket_start)) for r in got.collect()} == want_full

    # a key with no rows anywhere: scans all days, returns the others
    got, days = L.latest_by_backscan(
        spark, path, ["pool_id"], ["close"], ["bucket_start"], uni(1, 2, 3)
    )
    assert days == 4
    assert {(r.pool_id, r.close, str(r.bucket_start)) for r in got.collect()} == want_full

    # flat store: one full latest_by, flagged -1
    flat = str(tmp_path / "flat")
    df.write.parquet(flat)
    got, days = L.latest_by_backscan(
        spark, flat, ["pool_id"], ["close"], ["bucket_start"], uni(1, 2)
    )
    assert days == -1
    assert {(r.pool_id, r.close, str(r.bucket_start)) for r in got.collect()} == want_full

    # the substitution the JobsRunner makes is EXACT: the pool-matrix
    # price fallback over the backscan frame equals the full frame
    from degenter_clickhouse_spark.plans import pool_matrix as PMX

    sub, _ = L.latest_by_backscan(
        spark, path, ["pool_id"], ["close"], ["bucket_start"], uni(1, 2)
    )
    test_pools = spark.createDataFrame(
        [(1, 100), (2, 101), (3, 102)], "pool_id long, base_token_id long"
    )

    def px(ohlcv):
        return sorted(
            (r.pool_id, r.price_in_zig)
            for r in PMX.price_with_fallback(
                test_pools, dom["prices"].limit(0), ohlcv
            ).collect()
        )

    assert px(sub) == px(spark.read.parquet(path).drop("__day")) and px(sub)

    # where= turns the probe into latest-at-a-past-instant (prev-close
    # leg): days newer than the cutoff contribute nothing and the scan
    # descends until each key's newest QUALIFYING row is found
    cut = F.lit("2024-03-02 23:59:59").cast("timestamp")
    got, days = L.latest_by_backscan(
        spark, path, ["pool_id"], ["close"], ["bucket_start"], uni(1, 2),
        where=F.col("bucket_start") <= cut,
    )
    assert days == 3  # two empty newer days + 03-02
    assert {(r.pool_id, r.close) for r in got.collect()} == {(1, 2.0), (2, 12.0)}


def test_engine_gainers_backscan_source_is_exact(spark, dom, tmp_path):  # noqa: F811
    """engine.gainers_losers over a day-partitioned storage catalog
    substitutes the backscan union (per-pool latest + latest-at-cutoff)
    for the full ohlcv frame — output identical to the in-memory
    engine's full-scan plan."""
    import os

    from degenter_clickhouse_spark.engine import DegenterEngine

    storage = str(tmp_path / "storage")
    os.makedirs(storage, exist_ok=True)
    dom["ohlcv_1m"].withColumn("__day", F.to_date("bucket_start")).repartition(
        F.col("__day")
    ).write.partitionBy("__day").parquet(os.path.join(storage, "ohlcv_1m"))
    tables = {
        "pools": dom["pools"],
        "tokens": dom["tokens"],
        "prices": dom["prices"],
        "trades": dom["trades_clean"],
    }
    eng_store = DegenterEngine(spark, tables=dict(tables), storage_dir=storage)
    eng_flat = DegenterEngine(
        spark, tables={**tables, "ohlcv_1m": dom["ohlcv_1m"]}
    )
    cutoff = _now() - F.expr("INTERVAL 240 MINUTES")

    def key(df):
        return sorted(
            (r.token_id, r.side, round(r.change_pct, 9)) for r in df.collect()
        )

    assert eng_store._ohlcv_change_source(cutoff) is not None  # fast path on
    assert eng_flat._ohlcv_change_source(cutoff) is None
    got = key(eng_store.gainers_losers(cutoff, n=3))
    assert got == key(eng_flat.gainers_losers(cutoff, n=3)) and got


def test_late_trade_after_minute_compaction_merges_exact(spark, dom, tmp_path):  # noqa: F811
    """VERDICT r11 #6 (ST6 under the day layout): a late/out-of-order
    trade whose minute was ALREADY COMPACTED (its partials merged to a
    NULL-tag row) must still merge exactly — the late batch appends a
    tagged row beside the compacted one and the read's
    (group, minute, batch) dedupe + sum equals the full batch
    recompute, including a crash REPLAY of the late batch and the
    retention trim running afterwards."""
    import os

    from degenter_clickhouse_spark.streaming import pipeline as SP

    trades = dom["trades_clean"].localCheckpoint(eager=True)
    late = trades.filter(F.pmod(F.hash("tx_hash"), F.lit(10)) == 0)
    early = trades.subtract(late)
    assert late.count() > 0 and early.count() > 0
    # the late rows genuinely revisit minutes the early batches covered
    revisited = (
        late.select(F.date_trunc("minute", "created_at").alias("m"))
        .join(
            early.select(F.date_trunc("minute", "created_at").alias("m")),
            "m",
            "left_semi",
        )
        .count()
    )
    assert revisited > 0

    store_dir = str(tmp_path)
    n = early.count()
    halves = [early.limit(n // 2), early.subtract(early.limit(n // 2))]
    for i, b in enumerate(halves):
        SP.maintain_partials_for_batch(
            b.localCheckpoint(eager=True), store_dir,
            SP._batch_tag(str(tmp_path / "ck"), i), hot_signer_threshold=4096,
        )
    # compact: the two batches' rows merge into NULL-tag rows
    for name in ("minute_partials", "signer_minute_partials"):
        INC.compact_partials_store(spark, os.path.join(store_dir, name))
    # the late batch lands AFTER compaction — twice (crash replay)
    for _ in range(2):
        SP.maintain_partials_for_batch(
            late.localCheckpoint(eager=True), store_dir,
            SP._batch_tag(str(tmp_path / "ck"), 2), hot_signer_threshold=4096,
        )
    # retention trim far in the past: keeps everything, breaks nothing
    assert INC.trim_store_days(
        os.path.join(store_dir, "minute_partials"), __import__("datetime").date(2000, 1, 1)
    ) == 0

    now = _now()
    got_pm = sorted(
        (r.pool_id, r.tx_buy, r.tx_sell, r.traders, float(r.vol_buy_base))
        for r in INC.trailing_volumes(
            spark.read.parquet(f"{store_dir}/minute_partials"), now, 1440
        ).collect()
    )
    want_pm = sorted(
        (r.pool_id, r.tx_buy, r.tx_sell, r.traders, float(r.vol_buy_base))
        for r in INC.trailing_volumes(
            INC.minute_partials(trades, hot_signer_threshold=4096), now, 1440
        ).collect()
    )
    assert got_pm == want_pm and got_pm

    got_lb = sorted(
        (r.signer, r.trades, round(r.volume_zig, 9))
        for r in INC.leaderboard_from_partials(
            spark.read.parquet(f"{store_dir}/signer_minute_partials"), now, 1440
        ).collect()
    )
    want_lb = sorted(
        (r.signer, r.trades, round(r.volume_zig, 9))
        for r in INC.leaderboard_from_partials(
            INC.signer_minute_partials(trades), now, 1440
        ).collect()
    )
    assert got_lb == want_lb and got_lb


def test_window_signer_budget_engages_at_adversarial_margin(spark, tmp_path):
    """VERDICT r11 #5 (prove the r9 #3 close): a pool holding exactly
    the hot threshold of distinct signers EVERY minute of a 24 h
    window keeps per-minute exact sets (each is <= threshold, so the
    hot cap never trips), but the window's summed set sizes exceed the
    budget — the read must take the HLL branch instead of
    materializing the giant exact union. Branch choice is proven
    deterministically: the fixture's sketches deliberately contain one
    sentinel signer per minute that the exact sets lack, so the two
    branches give clearly different counts. Compaction then merges the
    replay-duplicated store: rows stay bounded by the threshold (the
    merged exact set is per-MINUTE, never a window union) and both
    branch results are unchanged."""
    import os

    thr, minutes = 32, 1440
    n = thr * minutes
    epoch = F.unix_timestamp(F.lit("2024-03-01 00:00:00"))

    def mk_trades(extra_per_minute: bool):
        t = spark.range(n).select(
            F.lit(1).cast("long").alias("pool_id"),
            F.lit("swap").alias("action"),
            F.timestamp_seconds(
                epoch + (F.col("id") / thr).cast("long") * 60
            ).alias("created_at"),
            F.concat(F.lit("s"), F.col("id")).alias("signer"),
            F.when(F.col("id") % 2 == 0, "buy").otherwise("sell").alias(
                "direction"
            ),
            F.lit(1000000).cast("long").alias("offer_amount_base"),
            F.lit(2000000).cast("long").alias("ask_amount_base"),
        )
        if extra_per_minute:
            sent = spark.range(minutes).select(
                F.lit(1).cast("long").alias("pool_id"),
                F.lit("swap").alias("action"),
                F.timestamp_seconds(epoch + F.col("id") * 60).alias(
                    "created_at"
                ),
                F.concat(F.lit("x"), F.col("id")).alias("signer"),
                F.lit("buy").alias("direction"),
                F.lit(0).cast("long").alias("offer_amount_base"),
                F.lit(0).cast("long").alias("ask_amount_base"),
            )
            t = t.unionByName(sent)
        return t

    p_exact = INC.minute_partials(mk_trades(False), hot_signer_threshold=thr)
    # sketches from a sentinel-augmented stream: every minute's HLL
    # state holds one signer the exact set lacks (33 > thr also makes
    # that frame's own exact sets NULL — only its sketch is taken)
    p_sk = INC.minute_partials(
        mk_trades(True), hot_signer_threshold=thr
    ).select("pool_id", "minute", F.col("signers_sk").alias("__sk2"))
    partials = (
        p_exact.drop("signers_sk")
        .join(p_sk, ["pool_id", "minute"])
        .withColumn("signers_sk", F.col("__sk2"))
        .drop("__sk2")
        .localCheckpoint(eager=True)
    )
    assert partials.count() == minutes
    # every minute kept its exact set, each exactly at the threshold
    sizes = partials.agg(
        F.min(F.size("signers")).alias("lo"), F.max(F.size("signers")).alias("hi")
    ).collect()[0]
    assert (sizes.lo, sizes.hi) == (thr, thr)

    now = F.lit("2024-03-02 00:00:00").cast("timestamp")

    def traders(src, budget):
        return (
            INC.trailing_volumes(src, now, minutes, window_signer_budget=budget)
            .collect()[0]
            .traders
        )

    exact = thr * minutes  # 46080 all-distinct signers
    assert traders(partials, None) == exact
    # summed stored sizes == exact here; budget at the margin keeps
    # the exact branch, one below flips to the sketch
    assert traders(partials, exact) == exact
    est = traders(partials, exact - 1)
    # sentinel-inflated -> sketch branch (true sketch cardinality is
    # exact+1440; the lgK=12 estimate carries ~1.5% error, so the
    # sentinel lift shows through at >500 while never reaching +1440)
    assert est >= exact + 500
    assert est == pytest.approx(exact + minutes, rel=0.03)
    # the shipped default is comfortably above this 24 h x 32 margin
    assert traders(partials, INC.WINDOW_SIGNER_BUDGET) == exact

    # bounded merged rows: replay-duplicate the day-partitioned store,
    # compact, re-assert both branches and the per-row bounds
    store = str(tmp_path / "minute_partials")
    tagged = partials.withColumn("__batch", F.lit("b0")).withColumn(
        "__day", F.to_date("minute")
    )
    for _ in range(2):  # same tag twice = crash replay duplicate
        tagged.write.mode("append").partitionBy("__day").parquet(store)
    INC.compact_partials_store(spark, store)
    merged = spark.read.parquet(store)
    assert merged.count() == minutes  # one row per minute again
    stats = merged.agg(
        F.max(F.size("signers")).alias("max_set"),
        F.max(F.octet_length("signers_sk")).alias("max_sk"),
    ).collect()[0]
    assert stats.max_set == thr  # merged exact set is per-minute
    assert stats.max_sk < 6000  # lgK=12 HLL state, constant-bounded
    assert traders(merged, exact) == exact
    # the compacted rows hold UNION states (hll_union_agg re-targets
    # the register encoding), so the estimate drifts a few counts from
    # the raw-sketch union — same branch, same ~1.5% accuracy
    assert traders(merged, exact - 1) == pytest.approx(est, rel=0.01)
    # one leaf file after compaction
    day_dir = os.path.join(store, "__day=2024-03-01")
    assert len([f for f in os.listdir(day_dir) if f.endswith(".parquet")]) == 1


def test_fact_table_trailing_reads_prune_dt_partitions(spark, dom, tmp_path):  # noqa: F811
    """VERDICT r11 #1: the dt-partitioned fact layout (engine.save,
    dt = to_date(created_at)) must be pruned STATICALLY by every
    trailing-window fact read — the created_at bound alone cannot
    prune partitions, so without this each fallback tick and feed page
    footer-reads every day of history. Asserts dt PartitionFilters in
    the fallback-rollup, leaderboard, large-trades and bounded
    trades-feed plans, plus flat/partitioned result equality."""
    import re

    from degenter_clickhouse_spark.engine import DegenterEngine
    from degenter_clickhouse_spark.plans import leaderboards as LB

    trades = dom["trades_clean"]
    path = str(tmp_path / "trades")
    trades.withColumn("dt", F.to_date("created_at")).write.partitionBy(
        "dt"
    ).parquet(path)
    store = spark.read.parquet(path)
    now = _now()

    def assert_dt_pruned(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "dt" in m.group(1) and m.group(1).strip(), plan[:2000]

    vols = PM.trade_volumes(store, dom["pools"], dom["tokens"], now, 240)
    assert_dt_pruned(vols)
    flat_vols = PM.trade_volumes(trades, dom["pools"], dom["tokens"], now, 240)
    key = lambda rs: sorted(  # noqa: E731
        (r.pool_id, r.tx_buy, r.tx_sell, r.traders, round(r.vol_buy_zig, 9))
        for r in rs.collect()
    )
    assert key(vols) == key(flat_vols) and key(vols)

    lb = LB.leaderboard(store, now, 240)
    assert_dt_pruned(lb)
    lkey = lambda rs: sorted(  # noqa: E731
        (r.signer, r.trades, round(r.volume_zig, 9)) for r in rs.collect()
    )
    assert lkey(lb) == lkey(LB.leaderboard(trades, now, 240)) and lkey(lb)

    lt = LB.large_trades(store, now, 1440, min_zig=100.0)
    assert_dt_pruned(lt)
    tkey = lambda rs: sorted(  # noqa: E731
        (r.tx_hash, r.pool_id, r.direction, round(r.value_zig, 9))
        for r in rs.collect()
    )
    assert tkey(lt) == tkey(LB.large_trades(trades, now, 1440, min_zig=100.0))

    # trades feed: from/to bounds (reference F2, api/routes/trades.js:
    # 62-69) bound created_at AND statically prune dt
    eng = DegenterEngine(
        spark,
        tables={
            "tokens": dom["tokens"],
            "pools": dom["pools"],
            "trades": store,
            "prices": dom["prices"],
        },
    )
    frm = now - F.expr("INTERVAL 240 MINUTES")
    feed = eng.trades_feed(F.lit(0.02), ts_from=frm, ts_to=now)
    assert_dt_pruned(feed)
    eng_flat = DegenterEngine(
        spark,
        tables={
            "tokens": dom["tokens"],
            "pools": dom["pools"],
            "trades": trades,
            "prices": dom["prices"],
        },
    )
    fkey = lambda rs: sorted(  # noqa: E731
        (r.tx_hash, str(r.created_at), r.n_legs) for r in rs.collect()
    )
    assert fkey(feed) == fkey(
        eng_flat.trades_feed(F.lit(0.02), ts_from=frm, ts_to=now)
    ) and fkey(feed)
    # bounds actually bound: the window excludes some fixture rows
    assert len(fkey(feed)) < len(fkey(eng_flat.trades_feed(F.lit(0.02))))


def test_refresh_removes_fully_vacated_day_partition(spark, tmp_path):
    """ADVICE r8 (medium): a touched day whose groups are ALL vacated
    produces zero output rows for that __day, so dynamic partition
    overwrite never rewrites it — the refresh must delete the stale
    day directory explicitly or trailing_volumes overcounts forever."""
    import os

    from degenter_clickhouse_spark.operators import versioned as V

    rows = [
        # day 1: two groups that survive
        ("h1", 0, "swap", "2024-03-01 10:00:30", "p1", "buy", 100.0, 0.0, "s1"),
        ("h2", 0, "swap", "2024-03-01 10:05:10", "p2", "sell", 0.0, 50.0, "s2"),
        # day 2: ONE group — the whole day vacates when it is deleted
        ("h3", 0, "swap", "2024-03-02 09:00:05", "p1", "buy", 70.0, 0.0, "s3"),
        ("h4", 0, "swap", "2024-03-02 09:00:40", "p1", "buy", 30.0, 0.0, "s4"),
    ]
    trades = spark.createDataFrame(
        rows,
        "tx_hash string, msg_index int, action string, created_at string,"
        " pool_id string, direction string, offer_amount_base double,"
        " ask_amount_base double, signer string",
    ).withColumn("created_at", F.to_timestamp("created_at"))
    table = str(tmp_path / "trades_vt")
    parts = str(tmp_path / "partials")
    V.vt_write(spark, trades, table)
    INC.write_partials(INC.minute_partials(trades), parts)
    day2 = os.path.join(parts, "__day=2024-03-02")
    assert os.path.isdir(day2)

    doomed = trades.filter(F.col("tx_hash").isin("h3", "h4"))
    V.vt_delete(spark, table, ["tx_hash", "msg_index"], doomed)
    n = INC.refresh_partials_from_changes(spark, table, parts, from_version=1)
    assert n >= 1
    assert not os.path.isdir(day2), "stale all-vacated day partition survived"
    got = {
        (r.pool_id, r.minute): (r.tx_buy, r.tx_sell)
        for r in spark.read.parquet(parts).drop("__day").collect()
    }
    want = {
        (r.pool_id, r.minute): (r.tx_buy, r.tx_sell)
        for r in INC.minute_partials(V.vt_read(spark, table)).collect()
    }
    assert got == want
    # the surviving day's totals still read correctly
    vols = INC.trailing_volumes(
        spark.read.parquet(parts),
        F.to_timestamp(F.lit("2024-03-02 23:59:00")),
        2 * 1440,
    ).collect()
    assert {r.pool_id: r.tx_buy + r.tx_sell for r in vols} == {"p1": 1, "p2": 1}


def test_hot_threshold_partials_cold_pools_bit_exact(spark, dom):  # noqa: F811
    """Hot-signer dual layout (VERDICT r8 #2): with a threshold above
    every fixture pool-minute, trailing trader counts are BIT-EXACT
    equal to the plain exact path for all four buckets."""
    exact = INC.minute_partials(dom["trades_clean"]).cache()
    dual = INC.minute_partials(
        dom["trades_clean"], hot_signer_threshold=4096
    ).cache()
    assert {"signers", "signers_sk"} <= set(dual.columns)
    for minutes in (30, 60, 240, 1440):
        want = {
            r.pool_id: (r.tx_buy, r.tx_sell, r.traders)
            for r in INC.trailing_volumes(exact, _now(), minutes).collect()
        }
        got = {
            r.pool_id: (r.tx_buy, r.tx_sell, r.traders)
            for r in INC.trailing_volumes(dual, _now(), minutes).collect()
        }
        assert got == want, minutes
    exact.unpersist()
    dual.unpersist()


def test_hot_threshold_partials_hot_pools_use_sketch(spark, dom):  # noqa: F811
    """With threshold=1 every multi-signer pool-minute goes hot: its
    exact set is NULL (constant-size row), and trailing counts fall
    back to the HLL union within tolerance; single-signer pools stay
    exact."""
    dual = INC.minute_partials(
        dom["trades_clean"], hot_signer_threshold=1
    ).cache()
    hot_rows = dual.filter(F.col("signers").isNull())
    assert hot_rows.count() > 0  # the fixture has multi-signer minutes
    exact = {
        r.pool_id: r.traders
        for r in INC.trailing_volumes(
            INC.minute_partials(dom["trades_clean"]), _now(), 1440
        ).collect()
    }
    got = {
        r.pool_id: r.traders
        for r in INC.trailing_volumes(dual, _now(), 1440).collect()
    }
    assert set(got) == set(exact)
    for pid, want in exact.items():
        assert abs(got[pid] - want) <= max(2, 0.05 * want), pid
    dual.unpersist()


def test_refresh_dual_store_requires_threshold(spark, dom, tmp_path):  # noqa: F811
    """Refreshing a hot-signer dual-layout store without the threshold
    must raise (a representation mismatch would silently corrupt the
    all-exact detection), and WITH it must match the full recompute."""
    from degenter_clickhouse_spark.operators import versioned as V

    trades = dom["trades_clean"]
    half = trades.limit(trades.count() // 2).cache()
    table = str(tmp_path / "trades_vt")
    parts = str(tmp_path / "partials")
    V.vt_write(spark, half, table)
    INC.write_partials(
        INC.minute_partials(half, hot_signer_threshold=4096), parts
    )
    V.vt_upsert(spark, trades, table, keys=["tx_hash", "msg_index"])
    with pytest.raises(ValueError, match="hot-signer dual layout"):
        INC.refresh_partials_from_changes(spark, table, parts, from_version=1)
    n = INC.refresh_partials_from_changes(
        spark, table, parts, from_version=1, hot_signer_threshold=4096
    )
    assert n > 0
    got = {
        r.pool_id: (r.tx_buy, r.tx_sell, r.traders)
        for r in INC.trailing_volumes(
            spark.read.parquet(parts), _now(), 1440
        ).collect()
    }
    want = {
        r.pool_id: (r.tx_buy, r.tx_sell, r.traders)
        for r in INC.trailing_volumes(
            INC.minute_partials(V.vt_read(spark, table)), _now(), 1440
        ).collect()
    }
    assert got == want
    half.unpersist()


def test_leaderboard_from_partials_equals_direct(spark, dom):  # noqa: F811
    """VERDICT r8 #9: signer-minute partials merged over the trailing
    window equal the direct leaderboard for all four buckets — trades
    exactly, money columns to 9 decimals (the direct path's per-row
    double sums are themselves shuffle-order nondeterministic at the
    ulp level; the partials path divides one exact decimal sum)."""
    from degenter_clickhouse_spark.plans import leaderboards as LB

    partials = INC.signer_minute_partials(dom["trades_clean"]).cache()
    for minutes in (30, 60, 240, 1440):
        direct = {
            r.signer: (r.trades, round(r.volume_zig, 9), round(r.gross_pnl_zig, 9))
            for r in LB.leaderboard(dom["trades_clean"], _now(), minutes).collect()
        }
        inc = {
            r.signer: (r.trades, round(r.volume_zig, 9), round(r.gross_pnl_zig, 9))
            for r in INC.leaderboard_from_partials(
                partials, _now(), minutes
            ).collect()
        }
        assert inc == direct, minutes
    partials.unpersist()


def test_runner_incremental_leaderboard_equals_direct(spark, dom, tmp_path):  # noqa: F811
    """With trades_vt set, the runner's leaderboard buckets ride the
    signer partials (same flag, same cursor as the matrix partials)
    and equal the direct rows across the bootstrap tick and a CDC
    delta tick."""
    from degenter_clickhouse_spark.engine import DegenterEngine
    from degenter_clickhouse_spark.jobs import JobsRunner
    from degenter_clickhouse_spark.operators import versioned as V

    trades = dom["trades_clean"].cache()
    half = trades.limit(trades.count() // 2).cache()
    table = str(tmp_path / "trades_vt")
    V.vt_write(spark, half, table)

    def mk_engine(tr):
        return DegenterEngine(spark, tables={
            "tokens": dom["tokens"], "pools": dom["pools"], "trades": tr,
            "prices": dom["prices"], "pool_state": dom["pool_state"],
            "ohlcv_1m": dom["ohlcv_1m"],
            "exchange_rates": dom["exchange_rates"],
            "holders": dom["holders"],
        })

    cadences = {"matrix": 10**9, "security": 10**9, "alerts": 10**9,
                "compact": 10**9}

    def lb_rows(out_dir):
        return sorted(
            (r.signer, r.bucket, r.trades, round(r.volume_zig, 9),
             round(r.gross_pnl_zig, 9))
            for r in spark.read.parquet(f"{out_dir}/leaderboard_traders").collect()
        )

    inc_out, full_out = str(tmp_path / "inc"), str(tmp_path / "full")
    r_inc = JobsRunner(mk_engine(V.vt_read(spark, table)), inc_out,
                       cadences=cadences, trades_vt=table)
    r_full = JobsRunner(mk_engine(half), full_out, cadences=cadences)
    r_inc.tick(at=1000.0, now_col=_now())
    r_full.tick(at=1000.0, now_col=_now())
    assert lb_rows(inc_out) == lb_rows(full_out)

    V.vt_upsert(spark, trades, table, keys=["tx_hash", "msg_index"])
    r_inc.engine = mk_engine(V.vt_read(spark, table))
    r_full.engine = mk_engine(trades)
    r_inc.tick(at=2000.0, now_col=_now())
    r_full.tick(at=2000.0, now_col=_now())
    assert lb_rows(inc_out) == lb_rows(full_out)
    half.unpersist()
    trades.unpersist()


def test_leaderboard_partials_reads_prune_days(spark, dom, tmp_path):  # noqa: F811
    """The signer partials store is day-partitioned like the pool
    store: a trailing leaderboard read must prune whole days' files at
    planning (PartitionFilters on __day)."""
    import re

    parts = str(tmp_path / "signer_partials")
    INC.write_partials(INC.signer_minute_partials(dom["trades_clean"]), parts)
    assert "__day" in spark.read.parquet(parts).columns
    plan = (
        INC.leaderboard_from_partials(spark.read.parquet(parts), _now(), 60)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "__day" in m.group(1), plan[:2000]


def test_token_rollup_from_partials_equals_direct(spark, dom):  # noqa: F811
    """token_matrix fed from pool-minute partials equals the direct
    recompute for all four buckets, for BOTH the exact and the
    hot-threshold dual partials layouts (fixture sets stay under the
    threshold, so the dual path must stay bit-exact on traders)."""
    from degenter_clickhouse_spark.plans import token_matrix as TM

    def rows(df):
        return sorted(
            (r.token_id, r.bucket, round(r.vol_buy_zig, 9),
             round(r.vol_sell_zig, 9), r.tx_buy, r.tx_sell, r.traders,
             None if r.price_in_zig is None else round(r.price_in_zig, 9),
             r.holders,
             None if r.mcap_zig is None else round(r.mcap_zig, 6))
            for r in df.collect()
        )

    for kwargs in ({}, {"hot_signer_threshold": 4096}):
        partials = INC.minute_partials(dom["trades_clean"], **kwargs).cache()
        for bucket in ("30m", "1h", "4h", "24h"):
            want = rows(TM.rollup(
                dom["trades_clean"], dom["pools"], dom["tokens"],
                dom["prices"], dom["holders"], dom["ohlcv_1m"], _now(), bucket,
            ))
            got = rows(INC.token_rollup_from_partials(
                partials, dom["pools"], dom["tokens"], dom["prices"],
                dom["holders"], dom["ohlcv_1m"], _now(), bucket,
            ))
            assert got == want, (bucket, kwargs)
        partials.unpersist()


def test_token_traders_hot_minute_excludes_empty_signer(spark):  # noqa: F811
    """A hot minute (threshold=0 forces every multi-signer set to the
    sketch) containing the empty signer must subtract its recorded
    membership from the HLL estimate — the token-level count excludes
    '' while the pool level keeps it."""
    rows = [
        ("h1", 0, "swap", "2024-03-01 10:00:30", "p1", "buy", 1.0, 0.0, "s1"),
        ("h2", 1, "swap", "2024-03-01 10:00:40", "p1", "buy", 1.0, 0.0, ""),
        ("h3", 2, "swap", "2024-03-01 10:00:50", "p1", "sell", 0.0, 1.0, "s2"),
    ]
    trades = spark.createDataFrame(
        rows,
        "tx_hash string, msg_index int, action string, created_at string,"
        " pool_id string, direction string, offer_amount_base double,"
        " ask_amount_base double, signer string",
    ).withColumn("created_at", F.to_timestamp("created_at"))
    partials = INC.minute_partials(trades, hot_signer_threshold=0)
    assert partials.filter(F.col("signers").isNull()).count() == 1  # hot
    pools = spark.createDataFrame(
        [("p1", 7, True)], "pool_id string, base_token_id long, is_uzig_quote boolean"
    )
    now = F.to_timestamp(F.lit("2024-03-01 10:05:00"))
    got = {r.token_id: r.traders
           for r in INC.token_trailing_traders(partials, pools, now, 60).collect()}
    # 3 signers incl. '' -> HLL estimate 3 minus the '' membership = 2
    assert got == {7: 2}


def test_pool_traders_hot_minute_keeps_empty_signer(spark):  # noqa: F811
    """The POOL-level contract keeps '' (uniqExact per the reference),
    but hll_sketch_agg silently skips empty strings — a hot window's
    estimate must add the recorded '' membership back."""
    rows = [
        ("h1", 0, "swap", "2024-03-01 10:00:30", "p1", "buy", 1.0, 0.0, "s1"),
        ("h2", 1, "swap", "2024-03-01 10:00:40", "p1", "buy", 1.0, 0.0, ""),
        ("h3", 2, "swap", "2024-03-01 10:00:50", "p1", "sell", 0.0, 1.0, "s2"),
    ]
    trades = spark.createDataFrame(
        rows,
        "tx_hash string, msg_index int, action string, created_at string,"
        " pool_id string, direction string, offer_amount_base double,"
        " ask_amount_base double, signer string",
    ).withColumn("created_at", F.to_timestamp("created_at"))
    now = F.to_timestamp(F.lit("2024-03-01 10:05:00"))
    hot = INC.minute_partials(trades, hot_signer_threshold=0)
    got = {r.pool_id: r.traders
           for r in INC.trailing_volumes(hot, now, 60).collect()}
    want = {r.pool_id: r.traders
            for r in INC.trailing_volumes(
                INC.minute_partials(trades), now, 60
            ).collect()}
    assert want == {"p1": 3}  # exact path keeps ''
    assert got == want


def test_large_trades_from_store_equals_direct(spark, dom, tmp_path):  # noqa: F811
    """VERDICT r9 #1 (plan level): a CDC-maintained large-trades store
    read back through the windowed keep-latest tail equals the direct
    trailing-scan extraction — across the bootstrap build, a pure
    append delta, and a delete that retracts a stored key."""
    from degenter_clickhouse_spark.operators import versioned as V
    from degenter_clickhouse_spark.plans import leaderboards as LB

    trades = dom["trades_clean"].cache()
    half = trades.limit(trades.count() // 2).cache()
    table = str(tmp_path / "trades_vt")
    store = str(tmp_path / "lt_store")
    V.vt_write(spark, half, table)
    INC.write_large_trades_store(LB.large_trades_all(half, 1000.0), store)

    def rows(df):
        return sorted(
            (r.pool_id, r.tx_hash, r.direction, r.signer,
             round(r.value_zig, 9), r.created_at)
            for r in df.collect()
        )

    def check(tr):
        got = rows(INC.large_trades_from_store(
            spark.read.parquet(store), _now(), 1440))
        want = rows(LB.large_trades(tr, _now(), 1440, min_zig=1000.0))
        assert got == want and got

    check(half)
    # append delta
    V.vt_upsert(spark, trades, table, keys=["tx_hash", "msg_index"])
    n = INC.refresh_large_trades_from_changes(
        spark, table, store, from_version=1, min_zig=1000.0)
    assert n > 0
    check(trades)
    # delete delta: retract one stored large trade entirely
    victim = LB.large_trades_all(trades, 1000.0).limit(1).collect()[0]
    doomed = trades.filter(
        (F.col("tx_hash") == victim.tx_hash)
        & (F.col("pool_id") == victim.pool_id)
        & (F.col("direction") == victim.direction)
    )
    V.vt_delete(spark, table, ["tx_hash", "msg_index"], doomed)
    cur = V.vt_version(table)
    assert INC.refresh_large_trades_from_changes(
        spark, table, store, from_version=cur - 1, min_zig=1000.0) >= 1
    check(V.vt_read(spark, table))
    half.unpersist()
    trades.unpersist()


def test_runner_large_trades_rides_store_no_fact_scan(spark, dom, tmp_path):  # noqa: F811
    """VERDICT r9 #1 (runner level): with trades_vt wired, the
    leaderboard tick's large_trades output equals the direct runner's,
    and its plan reads the day-partitioned store — NOT the trades fact
    table."""
    from degenter_clickhouse_spark.engine import DegenterEngine
    from degenter_clickhouse_spark.jobs import JobsRunner
    from degenter_clickhouse_spark.operators import versioned as V

    trades = dom["trades_clean"].cache()
    half = trades.limit(trades.count() // 2).cache()
    table = str(tmp_path / "trades_vt")
    V.vt_write(spark, half, table)

    def mk_engine(tr):
        return DegenterEngine(spark, tables={
            "tokens": dom["tokens"], "pools": dom["pools"], "trades": tr,
            "prices": dom["prices"], "pool_state": dom["pool_state"],
            "ohlcv_1m": dom["ohlcv_1m"],
            "exchange_rates": dom["exchange_rates"],
            "holders": dom["holders"],
        })

    cadences = {"matrix": 10**9, "security": 10**9, "alerts": 10**9,
                "compact": 10**9}

    def lt_rows(out_dir):
        return sorted(
            (r.pool_id, r.tx_hash, r.direction, r.signer,
             round(r.value_zig, 9), r.created_at)
            for r in spark.read.parquet(f"{out_dir}/large_trades").collect()
        )

    inc_out, full_out = str(tmp_path / "inc"), str(tmp_path / "full")
    r_inc = JobsRunner(mk_engine(V.vt_read(spark, table)), inc_out,
                       cadences=cadences, trades_vt=table)
    r_full = JobsRunner(mk_engine(half), full_out, cadences=cadences)
    r_inc.tick(at=1000.0, now_col=_now())
    r_full.tick(at=1000.0, now_col=_now())
    assert lt_rows(inc_out) == lt_rows(full_out)

    V.vt_upsert(spark, trades, table, keys=["tx_hash", "msg_index"])
    r_inc.engine = mk_engine(V.vt_read(spark, table))
    r_full.engine = mk_engine(trades)
    r_inc.tick(at=2000.0, now_col=_now())
    r_full.tick(at=2000.0, now_col=_now())
    assert lt_rows(inc_out) == lt_rows(full_out)

    # plan audit: the store-fed output must scan large_trades_store
    # files only — never the raw fact table
    files = r_inc._large_trades_output(_now()).inputFiles()
    assert files and all("large_trades_store" in f for f in files), files
    assert not any("trades_vt" in f for f in files), files
    half.unpersist()
    trades.unpersist()


def test_runner_store_mode_equals_direct_no_versioned_table(spark, dom, tmp_path):  # noqa: F811
    """VERDICT r9 missing #1: a plain-parquet streaming deployment
    (no versioned table) runs the JobsRunner with
    partials_source='store' over the stores that
    stream_ingest(maintain_partials=True) grows — all four matrix,
    token-matrix and leaderboard buckets plus the large-trades
    snapshot must equal the direct runner, and the partials-fed plans
    must never touch a trades fact table."""
    from degenter_clickhouse_spark.engine import DegenterEngine
    from degenter_clickhouse_spark.jobs import JobsRunner
    from degenter_clickhouse_spark.streaming import pipeline as SP

    trades = dom["trades_clean"].cache()
    half_n = trades.count() // 2
    batch1 = trades.limit(half_n).localCheckpoint(eager=True)
    batch2 = trades.subtract(batch1).localCheckpoint(eager=True)
    store_out = str(tmp_path / "stream_out")
    import os

    os.makedirs(store_out, exist_ok=True)
    # grow the stores exactly as two ingest micro-batches would
    # (tagged, day-partitioned, hot-threshold dual layout)
    for i, b in enumerate((batch1, batch2)):
        SP.maintain_partials_for_batch(
            b, store_out, SP._batch_tag(str(tmp_path / "ck"), i),
            hot_signer_threshold=4096,
        )
    assert "__batch" in spark.read.parquet(
        f"{store_out}/minute_partials"
    ).columns

    def mk_engine():
        return DegenterEngine(spark, tables={
            "tokens": dom["tokens"], "pools": dom["pools"], "trades": trades,
            "prices": dom["prices"], "pool_state": dom["pool_state"],
            "ohlcv_1m": dom["ohlcv_1m"],
            "exchange_rates": dom["exchange_rates"],
            "holders": dom["holders"],
        })

    cadences = {"security": 10**9, "alerts": 10**9, "compact": 10**9}
    r_store = JobsRunner(mk_engine(), store_out, cadences=cadences,
                         partials_source="store")
    full_out = str(tmp_path / "full")
    r_full = JobsRunner(mk_engine(), full_out, cadences=cadences)
    r_store.tick(at=1000.0, now_col=_now())
    r_full.tick(at=1000.0, now_col=_now())

    def rows(out_dir, name, cols):
        return sorted(
            tuple(
                round(v, 9) if isinstance(v, float) else v
                for v in (getattr(r, c) for c in cols)
            )
            for r in spark.read.parquet(f"{out_dir}/{name}").collect()
        )

    for name, cols in (
        ("pool_matrix", ("pool_id", "bucket", "vol_buy_zig", "vol_sell_zig",
                         "tx_buy", "tx_sell", "traders", "tvl_zig")),
        ("token_matrix", ("token_id", "bucket", "vol_buy_zig", "vol_sell_zig",
                          "tx_buy", "tx_sell", "traders", "holders")),
        ("leaderboard_traders", ("signer", "bucket", "trades", "volume_zig",
                                 "gross_pnl_zig")),
        ("large_trades", ("pool_id", "tx_hash", "direction", "signer",
                          "value_zig", "created_at")),
    ):
        assert rows(store_out, name, cols) == rows(full_out, name, cols), name
        assert rows(store_out, name, cols), name  # non-trivial

    # plan audit: every partials-fed frame reads store files only
    for df in (
        r_store._pool_matrix_bucket("24h", _now()),
        r_store._leaderboard_bucket("24h", _now()),
        r_store._large_trades_output(_now()),
    ):
        files = df.inputFiles()
        assert files and all(
            "minute_partials" in f or "signer_minute_partials" in f
            or "large_trades_store" in f
            for f in files
        ), files
    trades.unpersist()


def test_runner_store_mode_falls_back_without_stores(spark, dom, tmp_path):  # noqa: F811
    """partials_source='store' before the indexer has grown any store
    (fresh output dir) must fall back to the direct plans per bucket —
    same outputs as a direct runner, no crash."""
    from degenter_clickhouse_spark.engine import DegenterEngine
    from degenter_clickhouse_spark.jobs import JobsRunner

    def mk_engine():
        return DegenterEngine(spark, tables={
            "tokens": dom["tokens"], "pools": dom["pools"],
            "trades": dom["trades_clean"],
            "prices": dom["prices"], "pool_state": dom["pool_state"],
            "ohlcv_1m": dom["ohlcv_1m"],
            "exchange_rates": dom["exchange_rates"],
            "holders": dom["holders"],
        })

    cadences = {"security": 10**9, "alerts": 10**9, "compact": 10**9}
    a_out, b_out = str(tmp_path / "a"), str(tmp_path / "b")
    r_a = JobsRunner(mk_engine(), a_out, cadences=cadences,
                     partials_source="store")
    r_b = JobsRunner(mk_engine(), b_out, cadences=cadences)
    r_a.tick(at=1000.0, now_col=_now())
    r_b.tick(at=1000.0, now_col=_now())
    got = sorted(
        (r.pool_id, r.bucket, r.tx_buy, r.tx_sell, r.traders)
        for r in spark.read.parquet(f"{a_out}/pool_matrix").collect()
    )
    want = sorted(
        (r.pool_id, r.bucket, r.tx_buy, r.tx_sell, r.traders)
        for r in spark.read.parquet(f"{b_out}/pool_matrix").collect()
    )
    assert got == want and got


def test_runner_store_mode_and_vt_are_exclusive(spark, dom, tmp_path):  # noqa: F811
    from degenter_clickhouse_spark.engine import DegenterEngine
    from degenter_clickhouse_spark.jobs import JobsRunner

    eng = DegenterEngine(spark, tables={"trades": dom["trades_clean"]})
    with pytest.raises(ValueError, match="mutually exclusive"):
        JobsRunner(eng, str(tmp_path / "o"), trades_vt="/x",
                   partials_source="store")
    with pytest.raises(ValueError, match="partials_source"):
        JobsRunner(eng, str(tmp_path / "o"), partials_source="bogus")


def test_runner_alerts_ride_stores_no_fact_scan(spark, dom, tmp_path):  # noqa: F811
    """VERDICT r9 #2: with trades_vt wired, the 10 s alert tick feeds
    wallet_trade from the signer-minute partials and large_trade from
    the large-trades store — fired alerts equal the direct runner's,
    and the store-fed evaluation plan never reads the fact table."""
    from degenter_clickhouse_spark.engine import DegenterEngine
    from degenter_clickhouse_spark.jobs import JobsRunner
    from degenter_clickhouse_spark.operators import versioned as V

    from .test_domain import _alerts_df

    trades = dom["trades_clean"].cache()
    table = str(tmp_path / "trades_vt")
    V.vt_write(spark, trades, table)

    def mk_engine(tr):
        e = DegenterEngine(spark, tables={
            "tokens": dom["tokens"], "pools": dom["pools"], "trades": tr,
            "prices": dom["prices"], "pool_state": dom["pool_state"],
            "ohlcv_1m": dom["ohlcv_1m"],
            "exchange_rates": dom["exchange_rates"],
            "holders": dom["holders"],
        })
        e.set_table("alerts", _alerts_df(spark))
        return e

    cadences = {"security": 10**9, "compact": 10**9}
    inc_out, full_out = str(tmp_path / "inc"), str(tmp_path / "full")
    r_inc = JobsRunner(mk_engine(V.vt_read(spark, table)), inc_out,
                       cadences=cadences, trades_vt=table)
    r_full = JobsRunner(mk_engine(trades), full_out, cadences=cadences)
    r_inc.tick(at=1000.0, now_col=_now())
    r_full.tick(at=1000.0, now_col=_now())

    def fired(out_dir):
        return sorted(
            (r.alert_id, r.kind)
            for r in spark.read.parquet(f"{out_dir}/alert_events").collect()
        )

    got, want = fired(inc_out), fired(full_out)
    assert got == want
    assert ("wallet_trade" in {k for _, k in got}) and (
        "large_trade" in {k for _, k in got}
    )
    # plan audit: the store-fed legs are active and read store files
    # only — never the versioned fact table
    kwargs = r_inc._alert_kwargs(_now())
    assert "signer_partials" in kwargs and "large_trades" in kwargs
    ev = r_inc.engine.evaluate_alerts(
        r_inc.engine.table("alerts"), _now(), **kwargs
    )
    files = ev.inputFiles()
    assert files and all(
        "signer_minute_partials" in f or "large_trades_store" in f
        for f in files
    ), files
    trades.unpersist()


def test_window_signer_budget_guard(spark):
    """VERDICT r9 #3: a pool that stays UNDER the per-minute hot
    threshold in every minute but accumulates a huge signer-string
    volume across the window must fall back to the HLL union when the
    window budget trips — deterministically equal to the sketch-only
    merge (HLL states over the same values are identical) — while cold
    pools under the budget stay bit-exact."""
    n_min, per_min = 10, 500
    hot = spark.range(n_min * per_min).select(
        F.lit("p1").alias("pool_id"),
        F.concat(F.lit("s"), F.col("id")).alias("signer"),
        F.lit("swap").alias("action"),
        F.lit("buy").alias("direction"),
        F.lit(1.0).alias("offer_amount_base"),
        F.lit(0.0).alias("ask_amount_base"),
        F.expr(
            f"timestamp'2024-03-01 10:00:00' + (id % {n_min}) * INTERVAL 1 MINUTE"
        ).alias("created_at"),
    )
    cold = spark.range(3).select(
        F.lit("p2").alias("pool_id"),
        F.concat(F.lit("c"), F.col("id")).alias("signer"),
        F.lit("swap").alias("action"),
        F.lit("sell").alias("direction"),
        F.lit(0.0).alias("offer_amount_base"),
        F.lit(1.0).alias("ask_amount_base"),
        F.expr("timestamp'2024-03-01 10:05:00'").alias("created_at"),
    )
    trades = hot.unionByName(cold)
    now = F.to_timestamp(F.lit("2024-03-01 10:30:00"))
    dual = INC.minute_partials(trades, hot_signer_threshold=4096).cache()
    # every minute stays under the per-minute threshold: all exact sets
    assert dual.filter(F.col("signers").isNull()).count() == 0

    # default budget (262k) is far above 5000 signers: exact counts
    full = {r.pool_id: r.traders
            for r in INC.trailing_volumes(dual, now, 60).collect()}
    assert full == {"p1": n_min * per_min, "p2": 3}

    # tiny budget: the hot pool must flip to the HLL union — equal to
    # the sketch-only merge bit-for-bit (same values -> same state) —
    # while the cold pool stays exact
    sketch = {r.pool_id: r.traders
              for r in INC.trailing_volumes(
                  INC.minute_partials(trades, sketch_signers=True), now, 60
              ).collect()}
    guarded = {r.pool_id: r.traders
               for r in INC.trailing_volumes(
                   dual, now, 60, window_signer_budget=100
               ).collect()}
    assert guarded["p1"] == sketch["p1"]
    assert abs(guarded["p1"] - n_min * per_min) <= 0.05 * n_min * per_min
    assert guarded["p2"] == 3  # cold: bit-exact under the tiny budget

    # token level: p1 -> token 7 sketched, p2 -> token 8 exact
    pools = spark.createDataFrame(
        [("p1", 7, True), ("p2", 8, True)],
        "pool_id string, base_token_id long, is_uzig_quote boolean",
    )
    tok = {r.token_id: r.traders
           for r in INC.token_trailing_traders(
               dual, pools, now, 60, window_signer_budget=100
           ).collect()}
    tok_sketch = {r.token_id: r.traders
                  for r in INC.token_trailing_traders(
                      INC.minute_partials(trades, sketch_signers=True),
                      pools, now, 60,
                  ).collect()}
    assert tok[7] == tok_sketch[7] and tok[8] == 3
    dual.unpersist()


def test_partials_window_contract_non_aligned_now(spark, dom):  # noqa: F811
    """ADVICE r9 (low): with a NON-minute-aligned ``now`` the partials
    path includes the whole minute containing (now − W) — up to 59 s
    more than the direct exact-timestamp scan. The documented contract
    is minute granularity: equality holds against the direct plan
    evaluated with the SAME minute-floored lower bound."""
    from degenter_clickhouse_spark.plans import leaderboards as LB

    now2 = _now() + F.expr("INTERVAL 37 SECONDS")
    minutes = 240
    floor = F.date_trunc(
        "minute", now2 - F.expr(f"INTERVAL {minutes} MINUTES")
    )
    trades_floored = dom["trades_clean"].filter(F.col("created_at") >= floor)

    got_v = {
        r.pool_id: (r.tx_buy, r.tx_sell, r.traders)
        for r in INC.trailing_volumes(
            INC.minute_partials(dom["trades_clean"]), now2, minutes
        ).collect()
    }
    want_v = {
        r.pool_id: (r.tx_buy, r.tx_sell, r.traders)
        for r in PM.trade_volumes(
            trades_floored, dom["pools"], dom["tokens"], now2, 10**7
        ).collect()
    }
    assert got_v == want_v and got_v

    got_lb = {
        r.signer: (r.trades, round(r.volume_zig, 9))
        for r in INC.leaderboard_from_partials(
            INC.signer_minute_partials(dom["trades_clean"]), now2, minutes
        ).collect()
    }
    want_lb = {
        r.signer: (r.trades, round(r.volume_zig, 9))
        for r in LB.leaderboard(trades_floored, now2, 10**7).collect()
    }
    assert got_lb == want_lb and got_lb


def test_compact_partials_store_merges_and_preserves_reads(spark, dom, tmp_path):  # noqa: F811
    """VERDICT r9 missing #2: compacting a stream-grown partials store
    pre-merges duplicate (group, minute) rows with the read-side
    representation rules — file count drops, every trailing merge
    reads identically before/after, replay duplicates collapse, and
    rows under the unsafe (not-yet-settled) batch tag are carried
    through unmerged."""
    import glob
    import os

    from degenter_clickhouse_spark.streaming import pipeline as SP

    trades = dom["trades_clean"].cache()
    n = trades.count()
    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    thirds = [
        trades.limit(n // 3),
        trades.limit(2 * n // 3).subtract(trades.limit(n // 3)),
        trades.subtract(trades.limit(2 * n // 3)),
    ]
    tags = [SP._batch_tag(str(tmp_path / "ck"), i) for i in range(3)]
    for b, tag in zip(thirds, tags):
        SP.maintain_partials_for_batch(
            b.localCheckpoint(eager=True), out, tag, hot_signer_threshold=4096
        )
    # a replay duplicate of batch 1 (crash between appends and marker)
    SP.maintain_partials_for_batch(
        thirds[1].localCheckpoint(eager=True), out, tags[1],
        hot_signer_threshold=4096,
    )
    # batch 2 is the unsafe one: its done marker never settled
    SP._write_marker(SP._marker_paths(out)[0], tags[2])
    SP._write_marker(SP._marker_paths(out)[1], tags[1])
    assert SP.unsafe_partials_tag(out) == tags[2]

    def files(name):
        return len(glob.glob(f"{out}/{name}/**/*.parquet", recursive=True))

    def reads():
        pm = spark.read.parquet(f"{out}/minute_partials")
        lb = spark.read.parquet(f"{out}/signer_minute_partials")
        lt = spark.read.parquet(f"{out}/large_trades_store")
        return (
            sorted(
                (r.pool_id, r.tx_buy, r.tx_sell, r.traders,
                 float(r.vol_buy_base), float(r.vol_sell_base))
                for r in INC.trailing_volumes(pm, _now(), 1440).collect()
            ),
            sorted(
                (r.signer, r.trades, round(r.volume_zig, 9),
                 round(r.gross_pnl_zig, 9))
                for r in INC.leaderboard_from_partials(lb, _now(), 1440).collect()
            ),
            sorted(
                (r.tx_hash, r.pool_id, r.direction, round(r.value_zig, 9))
                for r in INC.large_trades_from_store(lt, _now(), 1440).collect()
            ),
        )

    before_files = files("minute_partials")
    before_reads = reads()
    got = INC.compact_partials_store(
        spark, f"{out}/minute_partials", unsafe_tag=tags[2]
    )
    assert got["files_after"] < got["files_before"] == before_files
    INC.compact_partials_store(
        spark, f"{out}/signer_minute_partials", unsafe_tag=tags[2]
    )
    assert reads() == before_reads

    pm = spark.read.parquet(f"{out}/minute_partials")
    # unsafe batch rows carried through unmerged; everything else
    # merged to NULL-tag rows, replay duplicates gone
    assert pm.filter(F.col("__batch") == tags[2]).count() > 0
    assert pm.filter(F.col("__batch") == tags[1]).count() == 0
    merged = pm.filter(F.col("__batch").isNull())
    assert merged.count() == merged.select("pool_id", "minute").distinct().count()

    # idempotent: a second compaction (all settled now) only shrinks
    SP._write_marker(SP._marker_paths(out)[1], tags[2])
    INC.compact_partials_store(spark, f"{out}/minute_partials", unsafe_tag=None)
    assert reads() == before_reads
    trades.unpersist()


def test_runner_compacts_streamed_stores(spark, dom, tmp_path, monkeypatch):  # noqa: F811
    """The compact slot covers the partials stores and streamed facts:
    past the file threshold a tick rewrites them, reads unchanged."""
    import glob
    import os

    from degenter_clickhouse_spark import jobs as J
    from degenter_clickhouse_spark.engine import DegenterEngine
    from degenter_clickhouse_spark.streaming import pipeline as SP

    trades = dom["trades_clean"].cache()
    n = trades.count()
    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    halves = [trades.limit(n // 2), trades.subtract(trades.limit(n // 2))]
    for i, b in enumerate(halves):
        SP.maintain_partials_for_batch(
            b.localCheckpoint(eager=True), out,
            SP._batch_tag(str(tmp_path / "ck"), i), hot_signer_threshold=4096,
        )
    # the gate counts EXCESS files beyond one per day partition
    # (ADVICE r10): two appends into the fixture's single day = 1
    monkeypatch.setattr(J, "COMPACT_MIN_FILES", 1)

    eng = DegenterEngine(spark, tables={
        "tokens": dom["tokens"], "pools": dom["pools"], "trades": trades,
        "prices": dom["prices"], "pool_state": dom["pool_state"],
        "ohlcv_1m": dom["ohlcv_1m"],
        "exchange_rates": dom["exchange_rates"], "holders": dom["holders"],
    })
    runner = J.JobsRunner(eng, out, cadences={"security": 10**9,
                                              "alerts": 10**9},
                          partials_source="store")
    before = sorted(
        (r.pool_id, r.bucket, r.tx_buy, r.tx_sell, r.traders)
        for r in runner._pool_matrix_bucket("24h", _now()).collect()
    )
    n_before = len(glob.glob(f"{out}/minute_partials/**/*.parquet",
                             recursive=True))
    assert n_before >= 2
    ran = runner.tick(at=1000.0, now_col=_now())
    assert "compact" in ran
    n_after = len(glob.glob(f"{out}/minute_partials/**/*.parquet",
                            recursive=True))
    assert n_after < n_before
    after = sorted(
        (r.pool_id, r.bucket, r.tx_buy, r.tx_sell, r.traders)
        for r in runner._pool_matrix_bucket("24h", _now()).collect()
    )
    assert after == before
    trades.unpersist()


def test_runner_store_mode_split_dirs(spark, dom, tmp_path):  # noqa: F811
    """The CLI deployment shape: the indexer maintains the stores
    under --storage while the jobs runner writes its outputs to
    --output. store_dir points the runner's reads (and compaction /
    retention) at the indexer's directory."""
    import os

    from degenter_clickhouse_spark.engine import DegenterEngine
    from degenter_clickhouse_spark.jobs import JobsRunner
    from degenter_clickhouse_spark.streaming import pipeline as SP

    trades = dom["trades_clean"]
    storage = str(tmp_path / "storage")
    os.makedirs(storage, exist_ok=True)
    SP.maintain_partials_for_batch(
        trades.localCheckpoint(eager=True), storage,
        SP._batch_tag(str(tmp_path / "ck"), 0), hot_signer_threshold=4096,
    )

    def mk_engine():
        return DegenterEngine(spark, tables={
            "tokens": dom["tokens"], "pools": dom["pools"], "trades": trades,
            "prices": dom["prices"], "pool_state": dom["pool_state"],
            "ohlcv_1m": dom["ohlcv_1m"],
            "exchange_rates": dom["exchange_rates"],
            "holders": dom["holders"],
        })

    cadences = {"security": 10**9, "alerts": 10**9, "compact": 10**9}
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    r_store = JobsRunner(mk_engine(), out_a, cadences=cadences,
                         partials_source="store", store_dir=storage)
    r_full = JobsRunner(mk_engine(), out_b, cadences=cadences)
    r_store.tick(at=1000.0, now_col=_now())
    r_full.tick(at=1000.0, now_col=_now())
    got = sorted(
        (r.pool_id, r.bucket, r.tx_buy, r.tx_sell, r.traders)
        for r in spark.read.parquet(f"{out_a}/pool_matrix").collect()
    )
    want = sorted(
        (r.pool_id, r.bucket, r.tx_buy, r.tx_sell, r.traders)
        for r in spark.read.parquet(f"{out_b}/pool_matrix").collect()
    )
    assert got == want and got
    files = r_store._pool_matrix_bucket("24h", _now()).inputFiles()
    assert files and all("storage" in f for f in files), files
    with pytest.raises(ValueError, match="store_dir requires"):
        JobsRunner(mk_engine(), out_a, store_dir=storage)


def test_compact_partials_callable_unsafe_tag_resolved_under_lock(
    spark, dom, tmp_path
):
    """ADVICE r10 TOCTOU: the unsafe tag is re-read INSIDE the table
    lock, so a marker written after the compaction pass was scheduled
    (but before this table's rewrite) still protects its batch — the
    pass carries those rows unmerged instead of collapsing them to a
    NULL tag a crash replay could then double."""
    import os

    from degenter_clickhouse_spark.streaming import pipeline as SP

    trades = dom["trades_clean"].cache()
    n = trades.count()
    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    halves = [trades.limit(n // 2), trades.subtract(trades.limit(n // 2))]
    tags = [SP._batch_tag(str(tmp_path / "ck"), i) for i in range(2)]
    for b, tag in zip(halves, tags):
        SP.maintain_partials_for_batch(
            b.localCheckpoint(eager=True), out, tag, hot_signer_threshold=4096
        )
    calls = []

    def late_marker():
        # simulates the indexer writing `started` between tick start
        # and this table's lock acquisition
        calls.append(1)
        SP._write_marker(SP._marker_paths(out)[0], tags[1])
        SP._write_marker(SP._marker_paths(out)[1], tags[0])
        return SP.unsafe_partials_tag(out)

    INC.compact_partials_store(
        spark, f"{out}/minute_partials", unsafe_tag=late_marker
    )
    assert calls  # resolved lazily, not at schedule time
    pm = spark.read.parquet(f"{out}/minute_partials")
    assert pm.filter(F.col("__batch") == tags[1]).count() > 0  # carried
    assert pm.filter(F.col("__batch") == tags[0]).count() == 0  # merged
    trades.unpersist()


def test_compact_table_guard_checked_under_lock(spark, tmp_path):
    """compact_table(guard=...) skips the rewrite when the under-lock
    re-check fails (the ohlcv_1m tag-file protection), and proceeds
    when it passes."""
    import glob

    from degenter_clickhouse_spark.operators import merge as M

    path = str(tmp_path / "t")
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    for _ in range(3):
        df.coalesce(1).write.mode("append").parquet(path)
    before = sorted(glob.glob(f"{path}/*.parquet"))
    got = M.compact_table(
        spark, path, partition_col=None, guard=lambda: False
    )
    assert got.get("skipped") == 1
    assert sorted(glob.glob(f"{path}/*.parquet")) == before  # untouched
    got = M.compact_table(
        spark, path, partition_col=None, guard=lambda: True
    )
    assert "skipped" not in got and got["files_after"] < got["files_before"]
    assert spark.read.parquet(path).count() == 300


def test_compact_dirty_only_touches_only_dirty_partitions(spark, tmp_path):
    """ADVICE r10 (medium): the hourly compact slot must be O(new
    data) — a partitioned table rewrites ONLY partitions holding more
    than the per-partition target, and the excess-file gate stops
    re-triggering once every partition is compacted (a total-count
    gate rewrote the whole table every slot forever once it had more
    partitions than the threshold)."""
    import glob

    from degenter_clickhouse_spark.operators import merge as M

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(d, i) for d in ("2024-03-01", "2024-03-02") for i in range(10)],
        "dt string, v long",
    )
    # day 1: one clean file; day 2: three fragment files
    df.filter(F.col("dt") == "2024-03-01").coalesce(1).write.mode(
        "append"
    ).partitionBy("dt").parquet(path)
    for _ in range(3):
        df.filter(F.col("dt") == "2024-03-02").coalesce(1).write.mode(
            "append"
        ).partitionBy("dt").parquet(path)
    clean = glob.glob(f"{path}/dt=2024-03-01/*.parquet")
    assert len(clean) == 1
    clean_stat = (clean[0], __import__("os").stat(clean[0]).st_mtime_ns)
    assert M.excess_file_count(path, 1) == 2
    before = sorted(
        (r.dt, r.v) for r in spark.read.parquet(path).collect()
    )
    M.compact_table(spark, path, partition_col="dt", dirty_only=True)
    # dirty day collapsed, clean day's file is the SAME file on disk
    assert len(glob.glob(f"{path}/dt=2024-03-02/*.parquet")) == 1
    got = glob.glob(f"{path}/dt=2024-03-01/*.parquet")
    assert len(got) == 1
    assert (got[0], __import__("os").stat(got[0]).st_mtime_ns) == clean_stat
    assert sorted(
        (r.dt, r.v) for r in spark.read.parquet(path).collect()
    ) == before
    # steady state: nothing left for the gate to trigger on
    assert M.excess_file_count(path, 1) == 0


def test_runner_partials_retention_trim(spark, dom, tmp_path):
    """Opt-in retention for the partials stores (ADVICE r10 noted the
    year-retention signer store): the compact slot drops day partition
    dirs past the configured window, but the keep window auto-extends
    to cover the widest live wallet-trade alert — a trim can never
    starve the 10 s alert tick's store reads."""
    import json as _json
    import os

    from degenter_clickhouse_spark import jobs as J
    from degenter_clickhouse_spark import schemas as S
    from degenter_clickhouse_spark.engine import DegenterEngine
    from degenter_clickhouse_spark.streaming import pipeline as SP

    from .test_domain import NOW

    trades = dom["trades_clean"].cache()
    old = trades.withColumn(
        "created_at", F.col("created_at") - F.expr("INTERVAL 400 DAYS")
    )
    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    tags = [SP._batch_tag(str(tmp_path / "ck"), i) for i in range(2)]
    SP.maintain_partials_for_batch(
        trades.localCheckpoint(eager=True), out, tags[0],
        hot_signer_threshold=4096,
    )
    SP.maintain_partials_for_batch(
        old.localCheckpoint(eager=True), out, tags[1],
        hot_signer_threshold=4096,
    )

    def days(name):
        return sorted(
            d for d in os.listdir(os.path.join(out, name))
            if d.startswith("__day=")
        )

    assert len(days("minute_partials")) >= 2
    old_day, recent_day = days("minute_partials")[0], days("minute_partials")[-1]

    def mk_engine(alert_rows):
        return DegenterEngine(spark, tables={
            "tokens": dom["tokens"], "pools": dom["pools"], "trades": trades,
            "prices": dom["prices"], "pool_state": dom["pool_state"],
            "ohlcv_1m": dom["ohlcv_1m"],
            "exchange_rates": dom["exchange_rates"],
            "holders": dom["holders"],
            "alerts": spark.createDataFrame(alert_rows, S.ALERTS),
        })

    cadences = {"security": 10**9, "alerts": 10**9}
    at = NOW.timestamp()

    # narrow alert (1 day): both stores trim the 400-day-old day
    narrow = [(1, None, "wallet_trade",
               _json.dumps({"address": "zigwallet001", "since_min": 1440}),
               300, None, True)]
    runner = J.JobsRunner(mk_engine(narrow), out, cadences=cadences,
                          partials_source="store",
                          partials_retention_days=30)
    runner.tick(at=at, now_col=_now())
    assert old_day not in days("minute_partials")
    assert old_day not in days("signer_minute_partials")
    assert recent_day in days("minute_partials")
    assert recent_day in days("signer_minute_partials")

    # wide alert (500 days): the signer store keeps the old day, the
    # minute store (matrices: 24h window) still trims it
    SP.maintain_partials_for_batch(
        old.localCheckpoint(eager=True), out, tags[1],
        hot_signer_threshold=4096,
    )
    assert old_day in days("signer_minute_partials")
    wide = [(2, None, "wallet_trade",
             _json.dumps({"address": "zigwallet001",
                          "since_min": 500 * 1440}),
             300, None, True)]
    runner2 = J.JobsRunner(mk_engine(wide), str(tmp_path / "out2"),
                           cadences=cadences, partials_source="store",
                           store_dir=out, partials_retention_days=30)
    runner2.tick(at=at, now_col=_now())
    assert old_day in days("signer_minute_partials")
    assert old_day not in days("minute_partials")
    # default: no retention configured -> nothing is ever trimmed
    SP.maintain_partials_for_batch(
        old.localCheckpoint(eager=True), out, tags[1],
        hot_signer_threshold=4096,
    )
    runner3 = J.JobsRunner(mk_engine(narrow), str(tmp_path / "out3"),
                           cadences=cadences, partials_source="store",
                           store_dir=out)
    runner3.tick(at=at, now_col=_now())
    assert old_day in days("minute_partials")
    trades.unpersist()


def test_concurrent_appends_vs_compaction_race(spark, dom, tmp_path):
    """Real-concurrency exercise of the ADVICE r10 TOCTOU fix: an
    indexer thread appends batches under the started/done marker
    protocol while a maintenance thread compacts the store in a loop
    with the CALLABLE unsafe tag. Whatever interleaving the scheduler
    picks, the final trailing merge must equal a single-writer build —
    no row lost to a rewrite, none double-counted by a merge of an
    unsettled batch."""
    import os
    import threading

    from degenter_clickhouse_spark.streaming import pipeline as SP

    trades = dom["trades_clean"].cache()
    n = trades.count()
    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    cuts = [0, n // 4, n // 2, 3 * n // 4, n]
    batches = [
        trades.limit(cuts[i + 1]).subtract(trades.limit(cuts[i]))
        .localCheckpoint(eager=True)
        for i in range(4)
    ]
    tags = [SP._batch_tag(str(tmp_path / "ck"), i) for i in range(4)]
    errors: list[BaseException] = []
    done = threading.Event()

    def indexer():
        try:
            started_p, done_p = SP._marker_paths(out)
            for b, tag in zip(batches, tags):
                SP._write_marker(started_p, tag)
                SP.maintain_partials_for_batch(
                    b, out, tag, hot_signer_threshold=4096
                )
                SP._write_marker(done_p, tag)
        except BaseException as e:  # noqa: BLE001
            errors.append(e)
        finally:
            done.set()

    def compactor():
        try:
            while not done.is_set():
                for name in ("minute_partials", "signer_minute_partials"):
                    path = os.path.join(out, name)
                    if os.path.isdir(path):
                        INC.compact_partials_store(
                            spark, path,
                            unsafe_tag=lambda: SP.unsafe_partials_tag(out),
                        )
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    t1 = threading.Thread(target=indexer)
    t2 = threading.Thread(target=compactor)
    t1.start(); t2.start()
    t1.join(timeout=600); t2.join(timeout=600)
    assert not errors, errors
    assert not t1.is_alive() and not t2.is_alive()

    want_pm = sorted(
        (r.pool_id, r.tx_buy, r.tx_sell, r.traders, float(r.vol_buy_base))
        for r in INC.trailing_volumes(
            INC.minute_partials(trades, hot_signer_threshold=4096),
            _now(), 1440,
        ).collect()
    )
    got_pm = sorted(
        (r.pool_id, r.tx_buy, r.tx_sell, r.traders, float(r.vol_buy_base))
        for r in INC.trailing_volumes(
            spark.read.parquet(f"{out}/minute_partials"), _now(), 1440
        ).collect()
    )
    assert got_pm == want_pm
    want_lb = sorted(
        (r.signer, r.trades, round(r.volume_zig, 9))
        for r in INC.leaderboard_from_partials(
            INC.signer_minute_partials(trades), _now(), 1440
        ).collect()
    )
    got_lb = sorted(
        (r.signer, r.trades, round(r.volume_zig, 9))
        for r in INC.leaderboard_from_partials(
            spark.read.parquet(f"{out}/signer_minute_partials"), _now(), 1440
        ).collect()
    )
    assert got_lb == want_lb
    trades.unpersist()


def test_backfill_partials_stores_fresh_repair_and_guards(spark, dom, tmp_path):
    """backfill_partials_stores rebuilds the three stream-maintained
    stores from the fact table: a fresh dir serves trailing reads
    identical to the direct recompute; a stream-grown store with
    replay duplicates is REPAIRED (touched days replaced wholesale,
    tagged schema kept append-compatible); a day range writes only its
    days; and the dual-layout representation guards refuse a
    mismatched threshold."""
    import os

    from degenter_clickhouse_spark.streaming import pipeline as SP

    trades = dom["trades_clean"].cache()
    now = _now()

    def pm_read(store):
        return sorted(
            (r.pool_id, r.tx_buy, r.tx_sell, r.traders, float(r.vol_buy_base))
            for r in INC.trailing_volumes(
                spark.read.parquet(f"{store}/minute_partials"), now, 1440
            ).collect()
        )

    def lb_read(store):
        return sorted(
            (r.signer, r.trades, round(r.volume_zig, 9))
            for r in INC.leaderboard_from_partials(
                spark.read.parquet(f"{store}/signer_minute_partials"), now, 1440
            ).collect()
        )

    def lt_read(store):
        return sorted(
            (r.tx_hash, r.pool_id, r.direction, round(r.value_zig, 9))
            for r in INC.large_trades_from_store(
                spark.read.parquet(f"{store}/large_trades_store"), now, 1440
            ).collect()
        )

    want_pm = sorted(
        (r.pool_id, r.tx_buy, r.tx_sell, r.traders, float(r.vol_buy_base))
        for r in INC.trailing_volumes(
            INC.minute_partials(trades, hot_signer_threshold=4096), now, 1440
        ).collect()
    )
    want_lb = sorted(
        (r.signer, r.trades, round(r.volume_zig, 9))
        for r in INC.leaderboard_from_partials(
            INC.signer_minute_partials(trades), now, 1440
        ).collect()
    )

    # fresh dir: full backfill (historic data -> bound to_day; the
    # open-ended default refuses, asserted below)
    fresh = str(tmp_path / "fresh")
    counts = INC.backfill_partials_stores(
        spark, trades, fresh, to_day="2024-03-05", hot_signer_threshold=4096
    )
    assert all(v > 0 for v in counts.values()), counts
    assert pm_read(fresh) == want_pm
    assert lb_read(fresh) == want_lb

    # repair: stream-grown store with a replay duplicate of batch 0
    grown = str(tmp_path / "grown")
    os.makedirs(grown, exist_ok=True)
    n = trades.count()
    halves = [trades.limit(n // 2), trades.subtract(trades.limit(n // 2))]
    tags = [SP._batch_tag(str(tmp_path / "ck"), i) for i in range(2)]
    for b, tag in zip(halves, tags):
        SP.maintain_partials_for_batch(
            b.localCheckpoint(eager=True), grown, tag,
            hot_signer_threshold=4096, large_trade_min_zig=1000.0,
        )
    SP.maintain_partials_for_batch(  # crash replay duplicate
        halves[0].localCheckpoint(eager=True), grown, tags[0],
        hot_signer_threshold=4096, large_trade_min_zig=1000.0,
    )
    INC.backfill_partials_stores(
        spark, trades, grown, to_day="2024-03-05", hot_signer_threshold=4096
    )
    assert pm_read(grown) == want_pm
    assert lb_read(grown) == want_lb
    assert lt_read(grown) == lt_read(fresh) and lt_read(fresh)
    # append-compatible: the tagged schema survives the repair
    assert "__batch" in spark.read.parquet(f"{grown}/minute_partials").columns

    # day-range: only the requested day's partition is written
    two_days = trades.unionByName(
        trades.withColumn(
            "created_at", F.col("created_at") - F.expr("INTERVAL 1 DAY")
        )
    )
    ranged = str(tmp_path / "ranged")
    INC.backfill_partials_stores(
        spark, two_days, ranged, from_day="2024-03-01",
        to_day="2024-03-01", hot_signer_threshold=4096,
    )
    days = sorted(
        d for d in os.listdir(f"{ranged}/minute_partials")
        if d.startswith("__day=")
    )
    assert days == ["__day=2024-03-01"]

    # representation guards
    with pytest.raises(ValueError, match="dual signer layout"):
        INC.backfill_partials_stores(spark, trades, grown, to_day="2024-03-05")
    plain = str(tmp_path / "plain")
    INC.write_partials(INC.minute_partials(trades), f"{plain}/minute_partials")
    with pytest.raises(ValueError, match="plain exact-set layout"):
        INC.backfill_partials_stores(
            spark, trades, plain, to_day="2024-03-05",
            hot_signer_threshold=4096,
        )

    # safety guards (ADVICE r11): open-ended / current-day ranges
    # refuse (the live stream is appending to today)...
    from datetime import datetime, timezone

    with pytest.raises(ValueError, match="current UTC day"):
        INC.backfill_partials_stores(
            spark, trades, fresh, hot_signer_threshold=4096
        )
    with pytest.raises(ValueError, match="current UTC day"):
        INC.backfill_partials_stores(
            spark, trades, fresh,
            to_day=str(datetime.now(timezone.utc).date()),
            hot_signer_threshold=4096,
        )
    # ...an unsettled streaming batch refuses (its partials landed but
    # its done marker didn't: the overwrite would race the replay)...
    started_p, done_p = SP._marker_paths(grown)
    SP._write_marker(started_p, "crashed-batch")
    with pytest.raises(RuntimeError, match="unsettled"):
        INC.backfill_partials_stores(
            spark, trades, grown, to_day="2024-03-05",
            hot_signer_threshold=4096,
        )
    SP._write_marker(done_p, "crashed-batch")  # settle it
    INC.backfill_partials_stores(
        spark, trades, grown, to_day="2024-03-05", hot_signer_threshold=4096
    )
    # ...and a legacy FLAT store refuses (a __day write would mix
    # layouts and make the table unreadable)
    flat = str(tmp_path / "flat")
    INC.minute_partials(trades).withColumn(
        "__batch", F.lit("legacy")
    ).coalesce(1).write.parquet(f"{flat}/minute_partials")
    with pytest.raises(RuntimeError, match="to-day-layout"):
        INC.backfill_partials_stores(
            spark, trades, flat, to_day="2024-03-05",
            hot_signer_threshold=4096,
        )
    trades.unpersist()


def test_latest_by_backscan_max_days_and_hi_day_bounds(spark, tmp_path):
    """ADVICE r12 #3: a universe key with no row anywhere must not
    force a probe of EVERY day partition of history on every tick —
    the conf-backed max_days default bounds the descent; hi_day skips
    probing days the where-cutoff makes provably empty."""
    from degenter_clickhouse_spark.operators import latest as L

    rows = []
    for day in (1, 2, 3, 4):  # pool 1 daily; pool 2 stops at 03-02
        rows.append((1, f"2024-03-0{day} 10:00:00", float(day)))
        if day <= 2:
            rows.append((2, f"2024-03-0{day} 11:00:00", 10.0 + day))
    df = spark.createDataFrame(
        rows, "pool_id long, bucket_start string, close double"
    ).withColumn("bucket_start", F.col("bucket_start").cast("timestamp"))
    path = str(tmp_path / "ohlcv_1m")
    df.withColumn("__day", F.to_date("bucket_start")).repartition(
        F.col("__day")
    ).write.partitionBy("__day").parquet(path)

    def uni(*ids):
        return spark.createDataFrame([(i,) for i in ids], "pool_id long")

    # conf default bounds the scan a never-traded key would force
    spark.conf.set("spark.degenter.backscan.maxDays", "2")
    try:
        got, days = L.latest_by_backscan(
            spark, path, ["pool_id"], ["close"], ["bucket_start"], uni(1, 2, 3)
        )
        assert days == 2  # stopped at the bound, not all 4 days
        assert {(r.pool_id, r.close) for r in got.collect()} == {(1, 4.0)}
        # an explicit max_days arg overrides the conf
        got, days = L.latest_by_backscan(
            spark, path, ["pool_id"], ["close"], ["bucket_start"], uni(1, 2, 3),
            max_days=3,
        )
        assert days == 3
        assert {(r.pool_id, r.close) for r in got.collect()} == {
            (1, 4.0), (2, 12.0),
        }
    finally:
        spark.conf.unset("spark.degenter.backscan.maxDays")

    # hi_day: the prev-close probe skips days above the cutoff's date
    # outright — same answer as the where-only scan, in ONE probe
    # instead of three (two of which scanned provably-empty days)
    cut = F.lit("2024-03-02 23:59:59").cast("timestamp")
    got, days = L.latest_by_backscan(
        spark, path, ["pool_id"], ["close"], ["bucket_start"], uni(1, 2),
        where=F.col("bucket_start") <= cut, hi_day="2024-03-02",
    )
    assert days == 1
    assert {(r.pool_id, r.close) for r in got.collect()} == {(1, 2.0), (2, 12.0)}

    # hi_day below every partition: empty answer, zero probes — NOT a
    # fall-through to the flat full-store scan
    got, days = L.latest_by_backscan(
        spark, path, ["pool_id"], ["close"], ["bucket_start"], uni(1, 2),
        where=F.col("bucket_start") <= F.lit("2020-01-01").cast("timestamp"),
        hi_day="2020-01-01",
    )
    assert days == 0 and got.count() == 0
