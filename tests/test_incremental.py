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
