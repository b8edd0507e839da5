"""Training-shard writer: deterministic sharded output + manifest.

The last step of a training-data pipeline is writing the packed corpus
as N equal-ish shards that a data loader can address individually
(shard = the unit of shuffling/resume in most training stacks). Two
requirements beyond a plain ``df.write``:

* **Deterministic assignment** — re-running the pipeline on the same
  corpus must produce the same doc->shard mapping (resume/debug
  reproducibility), so the shard is a pure function of the key column
  (``pmod(xxhash64(key), n_shards)``), never round-robin or
  RNG-salted.
* **A manifest** — per-shard row/token counts plus an order-insensitive
  content checksum, written next to the data. Loaders use it to size
  epochs without listing files; ops use ``verify_shards`` to detect
  partial/corrupt writes (the 100 TB failure mode is a lost task's
  missing file, which row counts catch immediately).

Plan shape: one shuffle on the shard id (``repartition(n_shards,
shard)``) so each task writes exactly one shard directory, with an
optional in-file ``sortWithinPartitions`` (no extra exchange). The
manifest is a map-side-partial aggregation over the same frame —
dimension-sized output (n_shards rows).

At 100 TB: n_shards is chosen by the caller (shard size = corpus /
n_shards); the hash assignment balances shards to within sampling
noise regardless of key skew, because keys are unique. Checksums
accumulate as DECIMAL sums of per-row hashes — associative, so
partitioning cannot change a bit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_manifest"


def with_shard(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    """Deterministic shard id in [0, n_shards) as a pure column expr."""
    return df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).cast("int")
    )


def shard_manifest(
    df: DataFrame, key_col: str, token_col: str | None = None
) -> DataFrame:
    """Per-shard rows / tokens / content checksum (order-insensitive).

    ``df`` must already carry a ``shard`` column (``with_shard``).
    Checksum = DECIMAL sum of xxhash64(key) per shard: associative and
    exact, so it is invariant to partitioning and row order, and any
    lost/duplicated row moves it.
    """
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.xxhash64(F.col(key_col)).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("checksum"),
    ]
    if token_col is not None:
        aggs.append(
            F.sum(F.col(token_col).cast("decimal(38,0)"))
            .cast("long")
            .alias("n_tokens")
        )
    return df.groupBy("shard").agg(*aggs)


def write_shards(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
    token_col: str | None = None,
    order_col: str | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Write ``df`` as ``path/shard=K/`` files + ``path/_manifest``.

    One shuffle (on the shard id); each task writes one shard dir.
    ``order_col`` sorts rows inside each shard file without an extra
    exchange (loaders that stream a shard sequentially see a stable
    order). ``fmt``: "parquet" (default) or "jsonl" — gzip-compressed
    JSON-lines shards, the standard LLM training-data interchange
    (one object per line, streamable without a parquet reader).
    Returns the manifest DataFrame (n_shards rows).
    """
    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"unknown shard format: {fmt!r}")
    sharded = with_shard(df, key_col, n_shards)
    writer = (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions(order_col if order_col else key_col)
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if fmt == "jsonl":
        writer.option("compression", "gzip").json(path)
    else:
        writer.parquet(path)
    manifest = shard_manifest(sharded, key_col, token_col)
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, MANIFEST_DIR)
    )
    return manifest


def verify_shards(
    spark: SparkSession,
    path: str,
    key_col: str,
    token_col: str | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Recompute the manifest from the written files and diff it.

    Returns the shards whose recomputed (n_rows, checksum[, n_tokens])
    disagree with the stored manifest — empty means intact. A full-scan
    check by design (that is what verification means); at 100 TB run it
    per-shard-range or sample, both just filters on ``shard``.
    """
    stored = spark.read.parquet(os.path.join(path, MANIFEST_DIR))
    if fmt == "jsonl":
        data = spark.read.json(os.path.join(path, "shard=*"))
        # partition-dir read loses the shard column; recover it from
        # the file path (deterministic, no schema assumptions)
        data = data.withColumn(
            "shard",
            F.regexp_extract(F.input_file_name(), r"shard=(\d+)", 1).cast("int"),
        )
    else:
        data = spark.read.parquet(path)
    actual = shard_manifest(data, key_col, token_col)
    cols = [c for c in stored.columns if c != "shard"]
    joined = stored.alias("m").join(
        actual.alias("a"), on="shard", how="full_outer"
    )
    mismatch = None
    for c in cols:
        cond = ~(F.col(f"m.{c}").eqNullSafe(F.col(f"a.{c}")))
        mismatch = cond if mismatch is None else (mismatch | cond)
    return joined.where(mismatch).select(
        "shard",
        *[F.col(f"m.{c}").alias(f"manifest_{c}") for c in cols],
        *[F.col(f"a.{c}").alias(f"actual_{c}") for c in cols],
    )
