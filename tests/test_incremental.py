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
        return sorted(
            (r.pool_id, r.bucket, round(r.vol_buy_zig, 9),
             round(r.vol_sell_zig, 9), r.tx_buy, r.tx_sell, r.traders,
             None if r.price_in_zig is None else round(r.price_in_zig, 9),
             round(r.tvl_zig, 9))
            for r in spark.read.parquet(f"{out_dir}/pool_matrix").collect()
        )

    inc_out, full_out = str(tmp_path / "inc"), str(tmp_path / "full")
    r_inc = JobsRunner(mk_engine(V.vt_read(spark, table)), inc_out,
                       cadences=cadences, trades_vt=table)
    r_full = JobsRunner(mk_engine(half), full_out, cadences=cadences)
    # the runner wired the incremental path for exactly these buckets
    assert r_inc.incremental_buckets == ("30m", "1h")
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
