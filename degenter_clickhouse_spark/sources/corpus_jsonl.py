"""JSONL corpus source: schema-enforced read with corrupt-line
quarantine and idempotent append into a parquet corpus.

Web-scale text corpora ship as JSON-lines (one document per line, often
with malformed lines from truncated uploads). Mirrors the engine's
block-ingest discipline (sources/blocks.py): nothing is silently
dropped — bad lines land in a quarantine with the raw line preserved —
and re-ingesting the same file is a no-op (anti-join on ``doc_id``,
the same effectively-once pattern as ``blocks.ingest``).

Plan shape: the json scan is schema-ENFORCED (no sampling/inference
pass over 100 TB — inference reads everything twice and can flip
types between runs); PERMISSIVE mode routes unparseable lines into the
corrupt-record column instead of failing the job. One pass, map-only
until the dedupe anti-join (which probes only ``doc_id``, column-pruned
from the existing corpus).

The ``.cache()`` before splitting good/bad is required, not an
optimization: Spark's json reader refuses queries that select only the
corrupt-record column from an un-materialized scan, and without it the
good/bad branches would each re-read + re-parse the file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def _read_raw(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    with_corrupt = T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType())]
    )
    return (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .cache()
    )


def _split(raw: DataFrame, schema: T.StructType) -> tuple[DataFrame, DataFrame]:
    bad = F.col(CORRUPT_COL).isNotNull() | F.col("doc_id").isNull()
    clean = raw.where(~bad).select(*[f.name for f in schema.fields])
    quarantine = raw.where(bad).select(
        F.coalesce(F.col(CORRUPT_COL), F.to_json(F.struct(*schema.names))).alias(
            "raw_line"
        ),
        F.when(F.col(CORRUPT_COL).isNotNull(), "unparseable")
        .otherwise("missing_doc_id")
        .alias("reason"),
    )
    return clean, quarantine


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType = DOC_SCHEMA
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) from a JSONL path/glob.

    clean: rows matching ``schema`` with a non-null doc_id.
    quarantine: the offending line (raw for unparseable JSON;
    re-serialized for parseable-but-keyless rows) + a reason tag.

    The returned frames share one cached scan; callers that finish
    with both may ``spark.catalog.clearCache()`` or use
    ``ingest_jsonl`` which unpersists internally.
    """
    return _split(_read_raw(spark, path, schema), schema)


def ingest_jsonl(
    spark: SparkSession,
    path: str,
    corpus_path: str,
    schema: T.StructType = DOC_SCHEMA,
) -> dict[str, int]:
    """Append new docs from a JSONL drop into the parquet corpus.

    Effectively-once: docs whose ``doc_id`` already exists in the
    corpus are skipped via a left-anti join (only the id column of the
    existing corpus is scanned). Quarantined lines append to
    ``corpus_path/_quarantine``. Returns counts for the caller's log.
    """
    raw = _read_raw(spark, path, schema)
    clean, quarantine = _split(raw, schema)
    try:
        if os.path.exists(corpus_path):
            existing = spark.read.parquet(corpus_path).select("doc_id")
            new = clean.join(existing, on="doc_id", how="left_anti")
        else:
            new = clean
        new = new.cache()
        try:
            n_new = new.count()
            if n_new:
                new.write.mode("append").parquet(corpus_path)
            n_bad = quarantine.count()
            if n_bad:
                quarantine.write.mode("append").parquet(
                    os.path.join(corpus_path, "_quarantine")
                )
            n_clean = clean.count()
        finally:
            new.unpersist()
    finally:
        raw.unpersist()
    return {
        "read": n_clean + n_bad,
        "new": n_new,
        "skipped": n_clean - n_new,
        "quarantined": n_bad,
    }
