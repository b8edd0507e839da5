"""Physical-layout operators: Z-order clustered writes (the lakehouse
``OPTIMIZE ZORDER BY`` analogue) for multi-dimensional data skipping.

Parquet readers prune files/row-groups with footer min-max stats, but
stats only help when values are CLUSTERED: a table appended in arrival
order interleaves every pool/token into every file, so a per-pool scan
still opens every file. Sorting by one column fixes that column only.
Z-ordering maps each row to a point on a space-filling curve over ALL
clustering columns (bit-interleaved scaled coordinates) and
range-partitions on the curve position, so every output file covers a
small hyper-rectangle of the clustered dimensions — predicates on any
subset of the columns then prune most files. At 100 TB this is the
difference between a per-pool query reading ~1/n_files of the table
and reading all of it.

Spark-native shape: one scalar min/max aggregation (broadcast), a
pure-column bit-interleave expression, and ``repartitionByRange`` +
``sortWithinPartitions`` — a single range shuffle, no driver loops, no
UDFs. (Reference parity note: ClickHouse achieves the same effect with
its primary-key ORDER BY clause, phase3schema.sql; Delta/Iceberg with
OPTIMIZE ZORDER / sort orders.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _to_long(col: str, df: DataFrame) -> F.Column:
    """Clustering coordinate as a BIGINT: numerics/timestamps keep
    order (locality-preserving); strings fall back to a hash (still
    clusters equal values together for equality pruning, no ranges)."""
    dt = df.schema[col].dataType.simpleString()
    c = F.col(col)
    if dt.startswith("timestamp"):
        # unix_micros requires TIMESTAMP; NTZ casts losslessly (order-
        # preserving — only the epoch anchor shifts, uniformly)
        return F.unix_micros(c.cast("timestamp"))
    if dt in ("string",):
        return F.xxhash64(c)
    return c.cast("double").cast("long") if dt in ("double", "float") else c.cast(
        "long"
    )


def zvalue(df: DataFrame, cols: Sequence[str], bits: int = 16) -> F.Column:
    """Bit-interleaved Z-curve position over ``cols``. Each column is
    min-max scaled to ``bits`` bits with one broadcast scalar agg, then
    the bits are interleaved (column i contributes bit k to position
    k*n_cols + i). Monotone per column, so file-level min/max ranges on
    the curve translate to bounded per-column rectangles."""
    aggs = []
    for c in cols:
        v = _to_long(c, df)
        aggs += [F.min(v).alias(f"__min_{c}"), F.max(v).alias(f"__max_{c}")]
    stats = df.agg(*aggs)
    # fold the single stats row in via a broadcast cross join upstream
    # (callers use with_zvalue); here we only build the expression
    n = len(cols)
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        v = _to_long(c, df)
        lo, hi = F.col(f"__min_{c}"), F.col(f"__max_{c}")
        span = F.when(hi > lo, (hi - lo)).otherwise(F.lit(1))
        scaled = (
            ((v - lo).cast("decimal(38,0)") * ((1 << bits) - 1) / span)
            .cast("long")
        )
        for k in range(bits):
            bit = F.shiftright(scaled, k).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, k * n + i))
    return z, stats


def with_zvalue(
    df: DataFrame, cols: Sequence[str], bits: int = 16, out: str = "__z"
) -> DataFrame:
    z, stats = zvalue(df, cols, bits)
    return df.crossJoin(F.broadcast(stats)).withColumn(out, z).drop(
        *[c for c in stats.columns]
    )


def bloom_options(
    cols: Sequence[str], expected_ndv: int = 1_000_000
) -> dict[str, str]:
    """Parquet bloom-filter writer options for point-lookup columns.
    Min-max stats can't prune equality probes on high-cardinality
    unsorted keys (a tx_hash lookup matches every file's range); a
    bloom filter answers "definitely not in this file/row-group" in a
    few KB, so exists-style probes (the reference's trade-dedupe
    lookup, core/block-processor.js:199-206) skip almost all data.
    Spark's parquet reader consumes them automatically for `=` and
    IN predicates."""
    opts: dict[str, str] = {}
    for c in cols:
        opts[f"parquet.bloom.filter.enabled#{c}"] = "true"
        opts[f"parquet.bloom.filter.expected.ndv#{c}"] = str(int(expected_ndv))
    return opts


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: Sequence[str],
    n_buckets: int = 32,
    sort_by: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed table write — the co-located-join layout.

    Every ``groupBy``/``join`` on ``keys`` against a table bucketed on
    the same keys with the same ``n_buckets`` reads pre-shuffled data:
    Spark's scan reports the bucket spec as its output partitioning, so
    the planner drops the Exchange entirely. Two fact tables co-bucketed
    on their join key (the reference's trades x pool_matrix join shape,
    api/routes/trades.js) join at 100 TB with ZERO shuffle — the single
    most expensive stage of a large join is simply absent. ``sort_by``
    additionally orders rows inside each bucket file, which also drops
    the per-partition Sort of a sort-merge join when each bucket is one
    file (guaranteed here by the pre-``repartition`` on the bucket
    keys: one task per bucket writes exactly one file).

    ClickHouse gets the same effect from sharding keys + local joins;
    this is the Spark-native equivalent (Hive-style bucketing, v1
    parquet datasource — ``spark.sql.sources.bucketing.enabled`` is on
    by default). Equality predicates on the first bucket key also prune
    buckets at planning time (``SelectedBucketsCount`` in the scan):
    a point lookup reads 1/n_buckets of the table before any row-group
    stats apply.

    Bucketed layouts live in the session catalog (``saveAsTable``) —
    plain ``.parquet(path)`` writes cannot carry a bucket spec. Pass
    ``path`` to keep the files at an external location; the table name
    is the handle either way (``spark.table(name)``).
    """
    w = (
        df.repartition(n_buckets, *[F.col(k) for k in keys])
        .write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, *list(keys))
    )
    if sort_by:
        w = w.sortBy(*list(sort_by))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 32,
    bits: int = 16,
    bloom_cols: Sequence[str] | None = None,
    bloom_ndv: int = 1_000_000,
) -> None:
    """Cluster ``df`` on the Z-curve over ``cols`` and write ``path``
    as ``n_files`` range-partitioned, internally-sorted parquet files.
    One range shuffle; every file covers a contiguous curve segment.
    ``bloom_cols`` additionally writes bloom filters for equality
    pruning on keys z-ordering can't help (see bloom_options)."""
    zdf = with_zvalue(df, cols, bits)
    w = (
        zdf.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
    )
    for k, v in bloom_options(bloom_cols or [], bloom_ndv).items():
        w = w.option(k, v)
    w.parquet(path)
