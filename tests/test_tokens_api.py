"""GET /tokens read-side plan tests: OHLCV endpoint pipeline (resample,
seed, gap fill, unit transforms) + token list + gainers/losers,
including the §5.4 property checks (volume conservation; the carried
open may legally escape [low, high])."""

from __future__ import annotations

from datetime import timedelta

import pytest
from pyspark.sql import functions as F

from degenter_clickhouse_spark.plans import token_matrix as TM
from degenter_clickhouse_spark.plans import tokens_api as TA

from . import fixtures as FX
from .test_domain import NOW, _now, dom  # noqa: F401  (fixture reuse)

FROM = NOW - timedelta(hours=4)


def _from():
    return F.lit(FROM.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp")


def test_ohlcv_series_grid_and_fill(spark, dom):  # noqa: F811
    step = 900
    out = TA.ohlcv_series(
        dom["ohlcv_1m"], [101, 102], step, _from(), _now(), fill="prev"
    ).collect()
    assert len(out) == 4 * 3600 // step  # full grid, no holes
    buckets = [r.bucket for r in out]
    assert buckets == sorted(buckets)
    diffs = {int((b - a).total_seconds()) for a, b in zip(buckets, buckets[1:])}
    assert diffs == {step}
    for r in out:
        if r.is_gap:
            assert r.volume == 0.0 and r.trade_count == 0
            assert r.open == r.close  # flat carried candle
        else:
            # low/high bound the traded prices and the carried open
            assert r.low <= min(r.open, r.close) + 1e-12
            assert r.high >= max(r.open, r.close) - 1e-12


def test_ohlcv_series_volume_conservation(spark, dom):  # noqa: F811
    step = 900
    src = dom["ohlcv_1m"].filter(
        F.col("pool_id").isin([101, 102])
        & (F.col("bucket_start") >= _from())
        & (F.col("bucket_start") < _now())
    )
    expected_vol = src.agg(F.sum("volume_zig")).collect()[0][0] or 0.0
    expected_tc = src.agg(F.sum("trade_count")).collect()[0][0] or 0
    out = TA.ohlcv_series(dom["ohlcv_1m"], [101, 102], step, _from(), _now()).collect()
    assert sum(r.volume for r in out) == pytest.approx(expected_vol, rel=1e-9)
    assert sum(r.trade_count for r in out) == expected_tc


def test_ohlcv_series_fill_modes(spark, dom):  # noqa: F811
    kw = dict(pool_ids=[103], step_sec=300, ts_from=_from(), ts_to=_now())
    prev = TA.ohlcv_series(dom["ohlcv_1m"], **kw, fill="prev").collect()
    zero = TA.ohlcv_series(dom["ohlcv_1m"], **kw, fill="zero").collect()
    none = TA.ohlcv_series(dom["ohlcv_1m"], **kw, fill="none").collect()
    assert len(prev) == len(zero) == 4 * 3600 // 300
    assert len(none) == len([r for r in prev if not r.is_gap])
    gaps = [r for r in zero if r.is_gap]
    assert gaps and all(r.close == 0.0 for r in gaps)


def test_ohlcv_series_usd_transform(spark, dom):  # noqa: F811
    kw = dict(pool_ids=[101], step_sec=900, ts_from=_from(), ts_to=_now())
    native = TA.ohlcv_series(dom["ohlcv_1m"], **kw).collect()
    usd = TA.ohlcv_series(dom["ohlcv_1m"], **kw, zig_usd=F.lit(0.02)).collect()
    for a, b in zip(native, usd):
        assert b.close == pytest.approx(a.close * 0.02, rel=1e-12)
        assert b.volume == a.volume  # volumes stay native


def test_token_list_sort_and_pagination(spark, dom):  # noqa: F811
    tm = TM.rollup(
        dom["trades_clean"], dom["pools"], dom["tokens"], dom["prices"],
        dom["holders"], dom["ohlcv_1m"], _now(), "24h",
    ).cache()
    page = TA.token_list(tm, sort="volume", desc=True, limit=3, offset=0).collect()
    assert len(page) == 3
    vols = [r.vol_buy_zig + r.vol_sell_zig for r in page]
    assert vols == sorted(vols, reverse=True)
    assert page[0].total == tm.count()
    page2 = TA.token_list(tm, sort="volume", desc=True, limit=3, offset=3).collect()
    assert {r.token_id for r in page} & {r.token_id for r in page2} == set()
    by_holders = TA.token_list(tm, sort="holders", desc=True, limit=2).collect()
    assert by_holders[0].holders >= by_holders[1].holders


def test_gainers_losers(spark, dom):  # noqa: F811
    cutoff = F.lit((NOW - timedelta(hours=6)).strftime("%Y-%m-%d %H:%M:%S")).cast(
        "timestamp"
    )
    out = TA.gainers_losers(dom["ohlcv_1m"], dom["pools"], cutoff, n=3).collect()
    gainers = [r for r in out if r.side == "gainer"]
    losers = [r for r in out if r.side == "loser"]
    assert gainers and losers
    assert all(
        r.change_pct == pytest.approx(
            (r.last_close - r.prev_close) / r.prev_close * 100, rel=1e-9
        )
        for r in out
    )
    assert min(g.change_pct for g in gainers) >= max(
        lo.change_pct for lo in losers
    ) - 1e-9


def test_day_partitioned_ohlcv_reads_prune_partitions(spark, dom, tmp_path):
    """Serving reads over a __day-partitioned streamed ohlcv store
    plan static day PartitionFilters (the bucket_start bound alone
    cannot prune partitions — prune_day_partition derives it), and
    candle output is identical to the flat read; the W5 seed leg
    still sees pre-window history."""
    import re

    from degenter_clickhouse_spark.plans import tokens_api as TA
    from degenter_clickhouse_spark.plans.views import prune_day_partition

    path = str(tmp_path / "ohlcv_1m")
    (
        dom["ohlcv_1m"]
        .withColumn("__day", F.to_date("bucket_start"))
        .repartition(F.col("__day"))
        .write.partitionBy("__day")
        .parquet(path)
    )
    store = spark.read.parquet(path)

    ts_from = F.lit("2024-03-01 04:00:00").cast("timestamp")
    ts_to = F.lit("2024-03-01 08:00:00").cast("timestamp")
    pruned = prune_day_partition(store, lo=ts_from, hi=ts_to)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "__day" in m.group(1), plan[:1500]

    def run(src):
        return sorted(
            (str(r.bucket), round(r.close, 9),
             round(r.volume, 6) if r.volume is not None else None,
             r.trade_count)
            for r in TA.ohlcv_series(
                src, [101], 3600, ts_from, ts_to, fill="prev"
            ).collect()
        )

    assert run(store) == run(dom["ohlcv_1m"]) and run(store)
    # no-op contract: a flat frame passes through untouched
    assert prune_day_partition(dom["ohlcv_1m"], lo=ts_from) is dom["ohlcv_1m"]


def test_dt_partitioned_ohlcv_reads_prune_partitions(spark, dom, tmp_path):
    """The SAME reads over the engine.save fact layout (dt =
    to_date(bucket_start)) must also prune statically — VERDICT r11 #1
    called out the trades sites; the ohlcv serving reads had the same
    gap until prune_day_partition learned to try both layouts. Covers
    ohlcv_series AND forming_bar, with flat/partitioned equality."""
    import re

    from degenter_clickhouse_spark.plans import tokens_api as TA

    path = str(tmp_path / "ohlcv_1m_dt")
    (
        dom["ohlcv_1m"]
        .withColumn("dt", F.to_date("bucket_start"))
        .repartition(F.col("dt"))
        .write.partitionBy("dt")
        .parquet(path)
    )
    store = spark.read.parquet(path)
    ts_from = F.lit("2024-03-01 04:00:00").cast("timestamp")
    ts_to = F.lit("2024-03-01 08:00:00").cast("timestamp")

    def assert_dt_pruned(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "dt" in m.group(1) and m.group(1).strip(), plan[:2000]

    series = TA.ohlcv_series(store, [101], 3600, ts_from, ts_to, fill="prev")
    assert_dt_pruned(series)

    def run(src):
        return sorted(
            (str(r.bucket), round(r.close, 9), r.trade_count)
            for r in TA.ohlcv_series(
                src, [101], 3600, ts_from, ts_to, fill="prev"
            ).collect()
        )

    assert run(store) == run(dom["ohlcv_1m"]) and run(store)

    fb = TA.forming_bar(store, [101, 102], 900, ts_to)
    assert_dt_pruned(fb)
    want = [
        tuple(r)
        for r in TA.forming_bar(dom["ohlcv_1m"], [101, 102], 900, ts_to).collect()
    ]
    assert [tuple(r) for r in fb.collect()] == want
