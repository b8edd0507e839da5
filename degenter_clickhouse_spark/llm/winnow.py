"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
2003 — the MOSS algorithm): per document, hash every k-gram, then
keep the MINIMUM hash of each sliding window of ``w`` consecutive
k-gram hashes. The selected set is position-robust (any shared
substring of length >= k + w - 1 is GUARANTEED to contribute at least
one common fingerprint) and ~1/w the size of the full k-gram set —
the middle ground between MinHash (set-level Jaccard, no locality
guarantee) and exact-substring dedup (precise but heavier).

Spark-first shape: fingerprint selection is pure per-row array
expressions over the existing shingle-hash primitives (llm/text.py) —
zero shuffles; the pair stage shuffles once on the fingerprint value
with a stop-fingerprint cap (a fingerprint shared by more than
``max_fp_freq`` docs is boilerplate and is dropped BEFORE the
self-join, the same frequency-cap discipline as the LSH band join),
so pair work is bounded by cap^2 per fingerprint, never all-pairs.

Exact cross-engine contract: hashes are the repo's integer polynomial
rolls; the overlap score is emitted as ``floor(shared * 1e9 /
min(|A|, |B|))`` in pure BIGINT arithmetic, so DuckDB reproduces
every bit (queries/web_ext-style oracle in queries/winnow_ext.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import shingle_hash_array, word_hash_array

DEFAULT_K = 4  # k-gram length (words)
DEFAULT_W = 5  # winnowing window (k-gram hashes per window)
SCALE = 1_000_000_000


def winnow_fingerprints(
    docs: DataFrame,
    k: int = DEFAULT_K,
    w: int = DEFAULT_W,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, fp) — one row per DISTINCT winnowed fingerprint per doc:
    min of each length-``w`` window over the k-gram hash sequence.
    Documents with fewer than k words fingerprint to nothing (no
    k-grams); documents with fewer than k+w-1 words keep every k-gram
    hash (no full window exists — short docs degrade to
    full-resolution, which is still tiny)."""
    d = docs.withColumn("__hw", word_hash_array(f"split({text_col}, ' ')"))
    d = d.withColumn("__ks", shingle_hash_array("__hw", k))
    wins = F.expr(
        f"CASE WHEN size(__ks) >= {int(w)} THEN "
        f"transform(sequence(1, size(__ks) - {int(w) - 1}), "
        f"i -> array_min(slice(__ks, i, {int(w)}))) "
        f"ELSE __ks END"
    )
    return d.select(
        F.col(id_col), F.explode(F.array_distinct(wins)).alias("fp")
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    k: int = DEFAULT_K,
    w: int = DEFAULT_W,
    min_shared: int = 2,
    max_fp_freq: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Document pairs ranked by winnowed-fingerprint overlap:
    (d1, d2, shared, min_fps, overlap_1e9) with d1 < d2,
    ``overlap_1e9 = floor(shared * 1e9 / min(|fps(d1)|, |fps(d2)|))``
    — integer-exact containment-style score in [0, 1e9].

    Fingerprints held by more than ``max_fp_freq`` docs are dropped
    before the pair join (boilerplate/stop-fingerprints — they carry
    no discrimination and their pair blow-up is quadratic); the cap is
    reported nowhere in-row, so callers comparing corpora should hold
    it fixed like any LSH hyper-parameter."""
    # lazy localCheckpoint: the fingerprint frame feeds FOUR consumers
    # (sizes, the frequency cap, both sides of the pair join) — the
    # per-doc hash work runs once at the first action instead of once
    # per branch, and the call itself stays plan-building-cheap (an
    # eager checkpoint here moved ~4s of execution into query
    # CONSTRUCTION, which the bench measures as pure overhead)
    fps = winnow_fingerprints(docs, k, w, id_col, text_col).localCheckpoint(
        eager=False
    )
    sizes = fps.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_fp"))
    rare = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= int(max_fp_freq))
        .select("fp")
    )
    keep = fps.join(rare, "fp", "left_semi")
    a = keep.select(F.col(id_col).alias("d1"), "fp")
    b = keep.select(F.col(id_col).alias("d2"), "fp")
    pairs = (
        a.join(b, "fp")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .filter(F.col("shared") >= int(min_shared))
    )
    s1 = sizes.select(F.col(id_col).alias("d1"), F.col("n_fp").alias("n1"))
    s2 = sizes.select(F.col(id_col).alias("d2"), F.col("n_fp").alias("n2"))
    # Plain shuffle joins on purpose (ADVICE r8): `sizes` derives from
    # a localCheckpoint'd frame, so Catalyst reports the Long.MaxValue
    # "no estimate" sentinel and dim_broadcast's sentinel branch would
    # FORCE-broadcast it — collecting O(n_docs) rows to the driver at
    # corpus scale. The pairs frame is already doc-pair-sized, so the
    # shuffle here is bounded by the pair output, not the corpus.
    return (
        pairs.join(s1, "d1")
        .join(s2, "d2")
        .select(
            "d1",
            "d2",
            "shared",
            F.least("n1", "n2").cast("long").alias("min_fps"),
            F.expr(f"(shared * {SCALE}) div least(n1, n2)")
            .cast("long")
            .alias("overlap_1e9"),
        )
    )
