from __future__ import annotations

from datetime import timedelta

import pytest
from pyspark.sql import functions as F

from degenter_clickhouse_spark.plans import tokens_api as TA

from .test_domain import NOW, dom  # noqa: F401


def test_forming_bar_aggregates_partial_window(spark, dom):  # noqa: F811
    # pretend "now" is mid-bucket: 20 minutes into an hour bucket
    now_mid = NOW - timedelta(minutes=40)
    now = F.lit(now_mid.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp")
    out = TA.forming_bar(dom["ohlcv_1m"], [101, 102], 3600, now).collect()
    if not out:  # bucket with no trades is a legal empty result
        return
    r = out[0]
    bucket_start = now_mid.replace(minute=0, second=0)
    assert r.bucket == bucket_start
    src = dom["ohlcv_1m"].filter(
        F.col("pool_id").isin([101, 102])
        & (F.col("bucket_start") >= F.lit(bucket_start))
        & (F.col("bucket_start") <= now)
    ).collect()
    assert r.trade_count == sum(s.trade_count for s in src)
    assert r.high == max(s.high for s in src)
    assert r.low == min(s.low for s in src)
    assert r.volume == pytest.approx(sum(s.volume_zig for s in src), rel=1e-9)
