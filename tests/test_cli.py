"""CLI entry points (degenter_clickhouse_spark.cli) driven through
main() — batch subcommands only (streaming entry points are covered by
the streaming tests on their underlying functions). build_session's
getOrCreate reuses the test session, so these run in-process."""

from __future__ import annotations

import json

from degenter_clickhouse_spark import catalog
from degenter_clickhouse_spark.cli import main
from degenter_clickhouse_spark.operators import versioned as V

from .helpers import SF_DIR

DOCS = f"{SF_DIR}/documents.parquet"


def test_cli_index_text_build_update_search(spark, tmp_path, capsys):
    idx = str(tmp_path / "idx")
    assert main(["index-text", "--input", DOCS, "--index", idx]) == 0
    assert "indexed: 500" in capsys.readouterr().out
    # update with the same corpus: everything already indexed
    assert main(["index-text", "--input", DOCS, "--index", idx, "--update"]) == 0
    assert "new docs indexed: 0" in capsys.readouterr().out
    assert main(["search", "--index", idx, "--query", "the data", "-k", "3"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 3 and all(len(line.split()) == 3 for line in out)


def test_cli_shard_writes_manifest(spark, tmp_path, capsys):
    out_dir = str(tmp_path / "sh")
    assert (
        main(
            [
                "shard",
                "--input",
                DOCS,
                "--output",
                out_dir,
                "--n-shards",
                "4",
                "--key",
                "doc_id",
                "--token-col",
                "n_chars",
            ]
        )
        == 0
    )
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 4
    assert spark.read.parquet(out_dir).count() == 500


def test_cli_jsonl_ingest(spark, tmp_path, capsys):
    drop = tmp_path / "d.jsonl"
    drop.write_text(
        json.dumps({"doc_id": 1, "text": "a b", "lang": "en", "source": "web"})
        + "\nnot json\n"
    )
    corpus = str(tmp_path / "corpus")
    assert main(["jsonl-ingest", "--input", str(drop), "--corpus", corpus]) == 0
    assert "'new': 1" in capsys.readouterr().out
    assert spark.read.parquet(corpus).count() == 1


def test_cli_vt_maintenance(spark, tmp_path, capsys):
    path = str(tmp_path / "t")
    df = catalog.load_table(spark, SF_DIR, "region")
    V.vt_write(spark, df.repartition(3), path)
    V.vt_append(spark, df.repartition(3), path)
    assert main(["vt", "history", "--path", path]) == 0
    hist = capsys.readouterr().out.strip().splitlines()
    assert len(hist) == 2
    assert main(["vt", "compact", "--path", path, "--target-files", "1"]) == 0
    capsys.readouterr()
    assert main(["vt", "vacuum", "--path", path, "--keep-versions", "1"]) == 0
    assert "removed files:" in capsys.readouterr().out
    assert V.vt_read(spark, path).count() == df.count() * 2


def test_cli_decontaminate_exact_and_fuzzy(spark, tmp_path):
    from degenter_clickhouse_spark import cli

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo")
    train = spark.createDataFrame(
        [(1, base.replace("echo", "echoX")),
         (2, "entirely different words about query plans and shuffles")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(9, base)], "doc_id long, text string")
    tr, be = str(tmp_path / "tr"), str(tmp_path / "be")
    train.write.parquet(tr)
    bench.write.parquet(be)
    out1 = str(tmp_path / "exact")
    assert cli.main(
        ["decontaminate", "--train", tr, "--bench", be, "--output", out1]
    ) == 0
    exact = {r.doc_id: r.contaminated for r in spark.read.parquet(out1).collect()}
    out2 = str(tmp_path / "fuzzy")
    assert cli.main(
        ["decontaminate", "--train", tr, "--bench", be, "--output", out2,
         "--fuzzy", "0.5"]
    ) == 0
    fuzzy = {r.doc_id: r.contaminated for r in spark.read.parquet(out2).collect()}
    # the reworded leak is caught by BOTH (exact still hits unchanged
    # 3-gram runs); the unrelated doc by neither
    assert exact[1] and fuzzy[1]
    assert not exact[2] and not fuzzy[2]


def test_cli_validate_report_and_strict_gate(spark, tmp_path, capsys):
    import json

    from degenter_clickhouse_spark import cli

    spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 50.0), (3, None, 500.0)],
        "id long, cat string, v double",
    ).write.parquet(str(tmp_path / "t"))
    spark.createDataFrame([(1,), (2,)], "k long").write.parquet(
        str(tmp_path / "dim")
    )
    specs = [
        {"type": "not_null", "col": "cat"},
        {"type": "range", "col": "v", "lo": 0, "hi": 100, "min_pct": 60},
        {"type": "unique", "cols": ["id"]},
        {"type": "expr", "name": "v_positive", "sql": "v > 0"},
        {"type": "fk", "col": "id", "dim": str(tmp_path / "dim"),
         "dim_col": "k", "min_pct": 50},
    ]
    spec_path = tmp_path / "specs.json"
    spec_path.write_text(json.dumps(specs))
    out = str(tmp_path / "report")
    # non-strict: exit 0 even with failures, report written
    assert cli.main(
        ["validate", "--input", str(tmp_path / "t"),
         "--constraints", str(spec_path), "--output", out]
    ) == 0
    lines = [json.loads(line) for line in
             capsys.readouterr().out.strip().splitlines() if line.startswith("{")]
    rep = {r["constraint"]: r for r in lines}
    assert rep["not_null(cat)"]["passed"] is False
    assert rep["range(v)"]["passed"] is True  # 2/3 >= 60%
    assert rep["unique(id)"]["passed"] is True
    assert rep["v_positive"]["passed"] is True
    assert rep["fk(id)"]["passed"] is True  # 2/3 >= 50%
    assert spark.read.parquet(out).count() == 5
    # strict: same report, exit 1 because not_null fails
    assert cli.main(
        ["validate", "--input", str(tmp_path / "t"),
         "--constraints", str(spec_path), "--strict"]
    ) == 1


def test_cli_bpe_fit_tokenize_roundtrip(spark, tmp_path, capsys):
    from degenter_clickhouse_spark import cli
    from degenter_clickhouse_spark.llm import bpe

    docs = spark.createDataFrame(
        [(1, "aa ab aa ab aa"), (2, "ab aa ab ab")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    model = str(tmp_path / "model")
    assert cli.main(["bpe", "fit", "--input", src, "--model", model,
                     "--merges", "4"]) == 0
    # the artifact reloads in training order and tokenization from the
    # artifact equals fit-and-tokenize
    merges = bpe.load_bpe_model(spark, model)
    assert merges == bpe.fit_bpe_merges(docs, n_merges=4)
    out = str(tmp_path / "tok")
    assert cli.main(["bpe", "tokenize", "--input", src, "--model", model,
                     "--output", out]) == 0
    direct = {
        r["doc_id"]: (sorted(r["tokens"]), r["n_tokens"])
        for r in bpe.apply_bpe(docs, merges).collect()
    }
    loaded = {
        r["doc_id"]: (sorted(r["tokens"]), r["n_tokens"])
        for r in spark.read.parquet(out).collect()
    }
    assert direct == loaded


def test_cli_graph_pagerank_components_degrees(spark, tmp_path, capsys):
    from degenter_clickhouse_spark import cli

    spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (10, 11)], "src long, dst long"
    ).write.parquet(str(tmp_path / "e"))
    out = str(tmp_path / "pr")
    assert cli.main(["graph", "pagerank", "--edges", str(tmp_path / "e"),
                     "--output", out]) == 0
    top = capsys.readouterr().out.strip().splitlines()
    import ast

    rows = [ast.literal_eval(line) for line in top]
    assert rows[0]["node"] == 0  # the hub out-ranks everything
    assert spark.read.parquet(out).count() == 6
    assert cli.main(["graph", "components", "--edges",
                     str(tmp_path / "e")]) == 0
    comp = {r["node"]: r["component"] for r in
            (ast.literal_eval(line) for line in
             capsys.readouterr().out.strip().splitlines())}
    assert comp[1] == 0 and comp[11] == 10
    assert cli.main(["graph", "degrees", "--edges",
                     str(tmp_path / "e")]) == 0
    assert capsys.readouterr().out.strip()


def test_cli_pca_fit_and_project(spark, tmp_path):
    from degenter_clickhouse_spark import cli

    model = str(tmp_path / "pca_model")
    out = str(tmp_path / "projected")
    assert cli.main([
        "pca", "fit", "--model", model,
        "--input", f"{SF_DIR}/embeddings.parquet", "--k", "3",
    ]) == 0
    assert cli.main([
        "pca", "project", "--model", model,
        "--input", f"{SF_DIR}/embeddings.parquet", "--output", out,
    ]) == 0
    df = spark.read.parquet(out)
    assert "pca" in df.columns
    row = df.select("pca").first()
    assert len(row["pca"]) == 3


def test_cli_index_pq_build_and_search(spark, tmp_path, capsys):
    idx = str(tmp_path / "pqidx")
    emb = f"{SF_DIR}/embeddings.parquet"
    assert main(["index-pq", "build", "--index", idx, "--input", emb]) == 0
    assert "indexed: " in capsys.readouterr().out
    assert main([
        "index-pq", "search", "--index", idx, "--input", emb,
        "--k", "3", "--rerank",
    ]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    # every query vector gets exactly k result lines (q_id rank c_id score)
    n_vecs = spark.read.parquet(emb).count()
    assert len(out) == 3 * n_vecs
    assert all(len(line.split()) == 4 for line in out)


def test_cli_vt_clone(spark, tmp_path, capsys):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    V.vt_write(spark, spark.range(5).selectExpr("id", "id * 2 AS v"), src)
    assert main(["vt", "clone", "--path", src, "--dest", dst]) == 0
    assert "cloned to v 1" in capsys.readouterr().out
    assert V.vt_read(spark, dst).count() == 5


def test_cli_profile_and_graph_triangles(spark, tmp_path, capsys):
    assert main([
        "profile", "--input", DOCS, "--columns", "doc_id,lang",
    ]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 2 and all(len(line.split()) >= 8 for line in out)

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )
    ep = str(tmp_path / "edges")
    edges.write.parquet(ep)
    import ast

    assert main(["graph", "triangles", "--edges", ep]) == 0
    tri = {
        d["node"]: d["n_triangles"]
        for d in map(ast.literal_eval,
                     capsys.readouterr().out.strip().splitlines())
    }
    assert tri == {1: 1, 2: 1, 3: 1}
    assert main(["graph", "communities", "--edges", ep]) == 0
    labels = {
        d["node"]: d["label"]
        for d in map(ast.literal_eval,
                     capsys.readouterr().out.strip().splitlines())
    }
    assert set(labels) == {1, 2, 3, 4}


def test_cli_index_winnow_lifecycle(spark, tmp_path, capsys):
    idx = str(tmp_path / "widx")
    assert main(["index-winnow", "build", "--input", DOCS, "--index", idx]) == 0
    assert "indexed: 500" in capsys.readouterr().out
    # append the same corpus: effectively-once no-op
    assert main(["index-winnow", "append", "--input", DOCS, "--index", idx]) == 0
    assert "new docs indexed: 0" in capsys.readouterr().out
    # probing the corpus against its own index surfaces the planted
    # near-dup families at full containment
    assert main([
        "index-winnow", "probe", "--input", DOCS, "--index", idx,
        "--min-shared", "1", "--limit", "5",
    ]) == 0
    out = capsys.readouterr().out
    assert "overlap_1e9" in out and "1000000000" in out
    assert main(["index-winnow", "compact", "--index", idx]) == 0
    assert "files_after" in capsys.readouterr().out


def test_cli_backfill_partials(spark, tmp_path, capsys):
    """backfill-partials rebuilds the three stores from a storage
    dir's trades table and prints per-store counts; the stores then
    serve a JobsRunner store-mode tick."""
    import os

    from pyspark.sql import functions as F

    from degenter_clickhouse_spark.operators import dedupe
    from degenter_clickhouse_spark.plans import incremental as INC

    from .fixtures import build

    d = build(spark)
    clean = dedupe.ingest_dedupe(
        d["trades"], ["pool_id", "tx_hash", "msg_index"]
    )
    storage = str(tmp_path / "storage")
    os.makedirs(storage, exist_ok=True)
    clean.write.parquet(f"{storage}/trades")
    assert (
        main(
            [
                "backfill-partials", "--storage", storage,
                "--to-day", "2024-03-05",  # historic fixture data
                "--hot-signer-threshold", "4096",
            ]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "minute_partials" in out
    got = {
        r.pool_id: (r.tx_buy, r.tx_sell, r.traders)
        for r in INC.trailing_volumes(
            spark.read.parquet(f"{storage}/minute_partials"),
            F.lit("2024-03-01 08:00:00").cast("timestamp"), 1440,
        ).collect()
    }
    want = {
        r.pool_id: (r.tx_buy, r.tx_sell, r.traders)
        for r in INC.trailing_volumes(
            INC.minute_partials(
                spark.read.parquet(f"{storage}/trades"),
                hot_signer_threshold=4096,
            ),
            F.lit("2024-03-01 08:00:00").cast("timestamp"), 1440,
        ).collect()
    }
    assert got == want and got
