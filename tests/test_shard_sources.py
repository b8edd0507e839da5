"""Round-4 pass-3 additions: shard writer + manifest, JSONL corpus
source with corrupt-line quarantine, approx-percentile accuracy vs the
exact quantile_summary op."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from degenter_clickhouse_spark import catalog
from degenter_clickhouse_spark.llm import shard as S
from degenter_clickhouse_spark.sources import corpus_jsonl as J

from .helpers import SF_DIR


# ---------------------------------------------------------------------------
# shard writer
# ---------------------------------------------------------------------------


def test_write_shards_roundtrip_and_manifest(spark, tmp_path):
    docs = catalog.load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "shards")
    manifest = S.write_shards(
        spark, docs, path, n_shards=8, key_col="doc_id", token_col="n_chars"
    ).collect()
    assert len(manifest) == 8
    assert sum(r["n_rows"] for r in manifest) == docs.count()
    assert sum(r["n_tokens"] for r in manifest) == (
        docs.agg(F.sum("n_chars")).collect()[0][0]
    )
    # every row present exactly once after the write
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    # verification passes on intact data
    assert S.verify_shards(spark, path, "doc_id", "n_chars").count() == 0


def test_shard_assignment_deterministic(spark):
    docs = catalog.load_table(spark, SF_DIR, "documents")
    a = {
        r["doc_id"]: r["shard"]
        for r in S.with_shard(docs, "doc_id", 8).select("doc_id", "shard").collect()
    }
    b = {
        r["doc_id"]: r["shard"]
        for r in S.with_shard(
            docs.repartition(3), "doc_id", 8
        )
        .select("doc_id", "shard")
        .collect()
    }
    assert a == b
    assert set(a.values()) <= set(range(8))


def test_verify_shards_detects_tampering(spark, tmp_path):
    docs = catalog.load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "shards")
    S.write_shards(spark, docs, path, n_shards=4, key_col="doc_id")
    # overwrite one shard with a truncated copy (simulated lost task)
    one = spark.read.parquet(path).where(F.col("shard") == 2).limit(5)
    one.select([c for c in one.columns if c != "shard"]).write.mode(
        "overwrite"
    ).parquet(path + "/shard=2")
    bad = S.verify_shards(spark, path, "doc_id").collect()
    assert [r["shard"] for r in bad] == [2]


# ---------------------------------------------------------------------------
# JSONL source
# ---------------------------------------------------------------------------


def _write_jsonl(tmp_path, lines):
    p = tmp_path / "drop.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def _doc_line(i):
    return json.dumps(
        {"doc_id": i, "text": f"doc {i} body", "lang": "en", "source": "web"}
    )


def test_read_jsonl_splits_clean_and_quarantine(spark, tmp_path):
    lines = [_doc_line(i) for i in range(8)]
    lines.insert(3, '{"doc_id": 99, "text": "truncated...')  # unparseable
    lines.insert(6, '{"text": "no id", "lang": "en", "source": "web"}')
    path = _write_jsonl(tmp_path, lines)
    clean, quarantine = J.read_jsonl(spark, path)
    assert sorted(r["doc_id"] for r in clean.collect()) == list(range(8))
    q = {r["reason"]: r["raw_line"] for r in quarantine.collect()}
    assert set(q) == {"unparseable", "missing_doc_id"}
    assert q["unparseable"].startswith('{"doc_id": 99')
    spark.catalog.clearCache()


def test_ingest_jsonl_is_effectively_once(spark, tmp_path):
    path = _write_jsonl(
        tmp_path, [_doc_line(i) for i in range(6)] + ["not json at all"]
    )
    corpus = str(tmp_path / "corpus")
    first = J.ingest_jsonl(spark, path, corpus)
    assert first == {"read": 7, "new": 6, "skipped": 0, "quarantined": 1}
    again = J.ingest_jsonl(spark, path, corpus)
    assert again["new"] == 0 and again["skipped"] == 6
    assert spark.read.parquet(corpus).count() == 6
    # quarantine is append-only (each ingest logs its bad lines)
    assert spark.read.parquet(corpus + "/_quarantine").count() == 2


# ---------------------------------------------------------------------------
# approx percentile vs the exact quantile op (sketch path accuracy)
# ---------------------------------------------------------------------------


def test_approx_percentile_within_accuracy(spark):
    docs = catalog.load_table(spark, SF_DIR, "documents")
    acc = 100
    rows = docs.groupBy("source").agg(
        F.percentile("n_chars", 0.5).alias("exact"),
        F.percentile_approx("n_chars", 0.5, acc).alias("approx"),
        F.count(F.lit(1)).alias("n"),
    )
    for r in rows.collect():
        # GK sketch rank error <= n/acc positions; with per-source n
        # in the hundreds and acc=100 the value must land within the
        # central mass — assert a generous relative-value bound
        assert abs(r["approx"] - r["exact"]) <= max(
            0.15 * r["exact"], r["n"] / acc
        )


def test_write_shards_jsonl_roundtrip(spark, tmp_path):
    """JSONL shards: gzip json-lines files under shard=K/, readable
    back to the same rows, and verify_shards(fmt='jsonl') reports
    intact."""
    import glob

    from degenter_clickhouse_spark.llm.shard import verify_shards, write_shards

    df = spark.createDataFrame(
        [(i, f"doc {i}", i * 10) for i in range(40)],
        "doc_id long, text string, n_tokens long",
    )
    out = str(tmp_path / "sh")
    manifest = write_shards(
        spark, df, out, n_shards=4, key_col="doc_id", token_col="n_tokens",
        fmt="jsonl",
    )
    assert manifest.count() == 4
    gz = glob.glob(f"{out}/shard=*/**/*.gz", recursive=True) + glob.glob(
        f"{out}/shard=*/*.gz"
    )
    assert gz, "expected gzip json shard files"
    back = spark.read.json(f"{out}/shard=*")
    assert back.count() == 40
    assert {r.doc_id for r in back.collect()} == set(range(40))
    bad = verify_shards(spark, out, key_col="doc_id", token_col="n_tokens",
                        fmt="jsonl")
    assert bad.count() == 0
