"""Multimodal column plumbing: opaque binary media + typed metadata,
processed with Arrow-batched ``mapInPandas``.

The Spark-side contract is real and tested — schema, batching, and
partition behavior are exactly what a production image/audio pipeline
needs. The *decoder* is a deterministic stand-in (this container has no
image/audio libs): it derives byte-level features (length, checksum,
synthetic width/height/frame-count). Swapping in a real decoder means
replacing ``_decode_batch``'s body only.

Scale: mapInPandas streams Arrow record batches — constant memory per
task regardless of partition size; media bytes never pass through the
driver, and per-file work parallelizes with the input partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHECKSUM_MOD = 1000003

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
    ]
)


def media_table(docs: DataFrame) -> DataFrame:
    """Shape documents as a multimodal table: binary payload + metadata
    struct — the storage contract for image/audio/video columns."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("media"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("n_chars").alias("content_len"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Decode/feature-extract stage: Arrow-batched, schema-stable.

    A real pipeline would decode pixels/samples here; the deterministic
    fake keeps the distributed plumbing testable (and oracle-checkable:
    the checksum is the byte sum mod 1000003).

    The batch function is defined inline so cloudpickle ships it BY
    VALUE — Python workers need no importable copy of this package
    (same contract as submitting with --py-files, minus the file).
    """
    mod = CHECKSUM_MOD

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            out = _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": pdf["media"].map(len).astype("int64"),
                    "checksum": pdf["media"].map(lambda b: sum(b) % mod).astype("int64"),
                }
            )
            out["width"] = out["byte_len"] % 640
            out["height"] = (out["byte_len"] * 7) % 480
            out["n_frames"] = out["byte_len"] % 30 + 1
            yield out

    return media.select("doc_id", "media").mapInPandas(
        decode_batch, schema=FEATURE_SCHEMA
    )


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index.
    Frame count comes from the (stubbed) decoder; the explode pattern —
    one row per (doc, frame) — is the real shape a video pipeline emits.
    """
    feats = extract_features(media)
    return feats.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n)
            )
        ).alias("frame_idx"),
    )
