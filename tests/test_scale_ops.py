"""Scale-path operators: salted aggregation equivalence, approx
distinct accuracy, watermarked streaming candles."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from degenter_clickhouse_spark import catalog
from degenter_clickhouse_spark.operators import skew
from degenter_clickhouse_spark.queries.core import DEC

from .helpers import SF_DIR


def test_salted_agg_equals_plain_agg(spark):
    t = catalog.ticks(spark, SF_DIR)
    plain = {
        r.pool_id: r
        for r in t.groupBy("pool_id")
        .agg(
            F.sum(F.col("price").cast(DEC)).alias("vol"),
            F.count(F.lit(1)).alias("n"),
            F.max("price").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.pool_id: r
        for r in skew.salted_agg(
            t,
            ["pool_id"],
            partials={
                "vol": F.sum(F.col("price").cast(DEC)),
                "n": F.count(F.lit(1)),
                "mx": F.max("price"),
            },
            merges={"vol": F.sum("vol"), "n": F.sum("n"), "mx": F.max("mx")},
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert plain[k].vol == salted[k].vol  # decimal: exact equality
        assert plain[k].n == salted[k].n
        assert plain[k].mx == salted[k].mx


def test_approx_distinct_within_tolerance(spark):
    ev = catalog.load_table(spark, SF_DIR, "events")
    exact = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    approx = ev.agg(skew.approx_distinct("user_id", rsd=0.01)).collect()[0][0]
    assert abs(approx - exact) <= max(2, 0.05 * exact)


def test_streaming_bars_watermarked(spark, tmp_path):
    from degenter_clickhouse_spark.streaming.windows import streaming_bars

    landing = tmp_path / "ticks"
    landing.mkdir()
    rows = [
        {"pool_id": 1, "price": 10.0, "event_id": 1, "ts": "2024-05-01 10:00:05"},
        {"pool_id": 1, "price": 12.0, "event_id": 2, "ts": "2024-05-01 10:00:30"},
        {"pool_id": 1, "price": 11.0, "event_id": 3, "ts": "2024-05-01 10:01:10"},
        {"pool_id": 2, "price": 5.0, "event_id": 4, "ts": "2024-05-01 10:00:50"},
        # watermark pusher: far-future event finalizes the earlier windows
        {"pool_id": 2, "price": 6.0, "event_id": 5, "ts": "2024-05-01 10:30:00"},
    ]
    (landing / "t1.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = spark.readStream.schema(
        "pool_id long, price double, event_id long, ts timestamp"
    ).json(str(landing))
    bars = streaming_bars(stream)
    out_dir = str(tmp_path / "bars_out")
    q = (
        bars.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.pool_id, r.bucket_start.strftime("%H:%M")): r
        for r in spark.read.parquet(out_dir).collect()
    }
    # finalized candles: both 10:00 windows and pool 1's 10:01 window
    assert got[(1, "10:00")].open == 10.0
    assert got[(1, "10:00")].close == 12.0
    assert got[(1, "10:00")].trade_count == 2
    assert got[(1, "10:01")].close == 11.0
    assert got[(2, "10:00")].trade_count == 1
    # the watermark-pushing event's own window is NOT final yet
    assert (2, "10:30") not in got
