"""Materialized projections (ClickHouse PROJECTION analogue): routed
answers equal base-table aggregation exactly, the router picks the
smallest covering projection, uncovered queries fall back."""

from __future__ import annotations

from pyspark.sql import functions as F

from degenter_clickhouse_spark import catalog
from degenter_clickhouse_spark.operators.projection import (
    ProjectionSet,
    projection_path,
)

from .helpers import SF_DIR

MEASURES = {
    "vol": ("sum", "value"),
    "n": ("count", None),
    "vmin": ("min", "value"),
    "vmax": ("max", "value"),
}


def _events(spark):
    return catalog.load_table(spark, SF_DIR, "events").withColumn(
        "day", F.to_date("ts")
    )


def _pset(spark, tmp_path):
    ev = _events(spark)
    ps = ProjectionSet(spark, ev)
    ps.add(
        "by_type_day",
        projection_path(str(tmp_path), "by_type_day"),
        keys=["event_type", "day"],
        measures=MEASURES,
    )
    ps.add(
        "by_type",
        projection_path(str(tmp_path), "by_type"),
        keys=["event_type"],
        measures=MEASURES,
    )
    return ev, ps


def _rows(df):
    return {
        tuple(r[k] for k in sorted(df.columns)): None for r in df.collect()
    }


def test_projection_merge_equals_base(spark, tmp_path):
    """Every routed grouping must equal the direct base aggregation
    bit-for-bit (DECIMAL sums re-reduce exactly)."""
    ev, ps = _pset(spark, tmp_path)
    for gb in (["event_type"], ["event_type", "day"], []):
        routed, src = ps.aggregate(gb, MEASURES)
        direct = ev.groupBy(*gb).agg(
            F.sum(F.col("value").cast("decimal(38,6)")).alias("vol"),
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        assert src != "base", gb  # covered -> never rescans the facts
        assert _rows(routed) == _rows(direct), gb


def test_projection_router_prefers_smallest_covering(spark, tmp_path):
    ev, ps = _pset(spark, tmp_path)
    # by_type (1 key) covers GROUP BY event_type; by_type_day also
    # covers it but has more keys -> more rows to merge
    _, src = ps.aggregate(["event_type"], MEASURES)
    assert src == "by_type"
    _, src = ps.aggregate(["event_type", "day"], MEASURES)
    assert src == "by_type_day"


def test_projection_falls_back_when_uncovered(spark, tmp_path):
    ev, ps = _pset(spark, tmp_path)
    # user_id is not a projection key -> base table
    routed, src = ps.aggregate(["user_id"], MEASURES)
    assert src == "base"
    direct = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(38,6)")).alias("vol"),
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    assert _rows(routed) == _rows(direct)
    # a measure outside the projection's states -> base too
    _, src = ps.aggregate(["event_type"], {"n_users": ("count", "user_id")})
    assert src == "base"


def test_projection_avg_derivation(spark, tmp_path):
    """avg is derived from merged sum/count states, never stored —
    equal to the base-table average exactly."""
    ev, ps = _pset(spark, tmp_path)
    routed, src = ps.aggregate(
        ["event_type"], MEASURES, avg={"vavg": ("vol", "n")}
    )
    assert src == "by_type"
    want = {
        r.event_type: r.vavg
        for r in ev.groupBy("event_type")
        .agg(
            (
                F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("vavg")
        )
        .collect()
    }
    got = {r.event_type: r.vavg for r in routed.collect()}
    assert got == want


def test_projection_plan_reads_projection_files(spark, tmp_path):
    """The routed plan's scan must point at the projection path — the
    fact table is genuinely absent from the query."""
    import io
    from contextlib import redirect_stdout

    _, ps = _pset(spark, tmp_path)
    routed, src = ps.aggregate(["event_type"], MEASURES)
    buf = io.StringIO()
    with redirect_stdout(buf):
        routed.explain("formatted")
    plan = buf.getvalue()
    assert "proj_by_type" in plan
    assert "events.parquet" not in plan


def test_projection_refresh_from_delta_equals_rebuild(spark, tmp_path):
    """Append + delete events, refresh ONLY the touched groups: the
    projection must equal a from-scratch rebuild, including REMOVAL of
    a group whose rows all vanished."""
    from degenter_clickhouse_spark.operators.projection import (
        build_projection,
        refresh_projection,
    )

    ev = _events(spark)
    keys = ["event_type", "day"]
    path = str(tmp_path / "proj")
    build_projection(ev, path, keys, MEASURES)

    # mutate: drop one whole (type, day) group, add rows to another
    victim = ev.select(*keys).first()
    changed = ev.filter(
        ~(
            (F.col("event_type") == victim.event_type)
            & (F.col("day") == victim.day)
        )
    )
    extra = changed.limit(50).withColumn("value", F.col("value") * 2)
    new_base = changed.unionByName(extra)

    touched = ev.select(*keys).limit(0).unionByName(
        spark.createDataFrame(
            [(victim.event_type, victim.day)], "event_type string, day date"
        )
    ).unionByName(extra.select(*keys))
    n = refresh_projection(spark, new_base, path, keys, MEASURES, touched)
    assert n >= 1

    rebuilt_path = str(tmp_path / "rebuilt")
    build_projection(new_base, rebuilt_path, keys, MEASURES)
    got = _rows(spark.read.parquet(path))
    want = _rows(spark.read.parquet(rebuilt_path))
    assert got == want
    # vacated group is gone
    assert (
        spark.read.parquet(path)
        .filter(
            (F.col("event_type") == victim.event_type)
            & (F.col("day") == victim.day)
        )
        .count()
        == 0
    )


def test_projection_refresh_noop_on_empty_delta(spark, tmp_path):
    from degenter_clickhouse_spark.operators.projection import (
        build_projection,
        refresh_projection,
    )

    ev = _events(spark)
    keys = ["event_type"]
    path = str(tmp_path / "proj")
    build_projection(ev, path, keys, MEASURES)
    before = _rows(spark.read.parquet(path))
    n = refresh_projection(
        spark, ev, path, keys, MEASURES, ev.select(*keys).limit(0)
    )
    assert n == 0
    assert _rows(spark.read.parquet(path)) == before


def test_projection_same_name_different_definition_falls_back(spark, tmp_path):
    """A measure with a projection's NAME but a different definition
    must route to the base table — never merge the wrong states."""
    _, ps = _pset(spark, tmp_path)
    # 'vol' stored as sum(value); request 'vol' as sum(user_id)
    routed, src = ps.aggregate(
        ["event_type"], {"vol": ("sum", "user_id"), "n": ("count", None)}
    )
    assert src == "base"
    ev = _events(spark)
    want = _rows(
        ev.groupBy("event_type").agg(
            F.sum(F.col("user_id").cast("decimal(38,6)")).alias("vol"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    assert _rows(routed) == want
