"""Process entry points mirroring the reference's three binaries
(package.json:8-10): ``indexer`` (stream raw blocks into facts),
``jobs`` (periodic rollups/alerts), and ``query`` (ad-hoc SQL over the
engine views — the API layer's data surface without the HTTP shell) —
plus the engine-native maintenance/LLM-pipeline commands.

    python -m degenter_clickhouse_spark.cli indexer --landing DIR --storage DIR
    python -m degenter_clickhouse_spark.cli jobs --storage DIR --output DIR [--once]
    python -m degenter_clickhouse_spark.cli query --storage DIR --sql "SELECT ..."
    python -m degenter_clickhouse_spark.cli corpus-ingest --landing DIR \
        --output DIR --checkpoint DIR [--near-dup-threshold 0.5]
    python -m degenter_clickhouse_spark.cli compact --path DIR [--partition-col dt]
    python -m degenter_clickhouse_spark.cli import-pools --csv FILE \
        --storage DIR [--dry]
    python -m degenter_clickhouse_spark.cli corpus-clean --input DOCS \
        --output DIR [--ngram 5 --min-count 2]
    python -m degenter_clickhouse_spark.cli corpus-split --input DOCS \
        --output DIR [--threshold 0.5 --fracs train=0.9,val=0.05,test=0.05]
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="degenter-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    ix = sub.add_parser("indexer", help="stream raw block JSON into fact tables")
    ix.add_argument("--landing", required=True)
    ix.add_argument("--storage", required=True)
    ix.add_argument("--checkpoint", required=True)
    ix.add_argument("--router-addr", default=None)
    ix.add_argument("--once", action="store_true", help="drain and exit (availableNow)")
    ix.add_argument(
        "--maintain-partials", action="store_true",
        help="append matrix/leaderboard minute partials per micro-batch "
             "(the ingest-side alternative to the jobs runner's CDC path)",
    )

    bf = sub.add_parser(
        "backfill-partials",
        help="rebuild the minute/signer/large-trades stores from the "
             "trades table for a day range (canonical per-day "
             "overwrite; fills gaps when --maintain-partials was "
             "enabled after history ingested, or repairs trimmed days)",
    )
    bf.add_argument("--storage", required=True)
    bf.add_argument("--from-day", default=None, metavar="YYYY-MM-DD")
    bf.add_argument("--to-day", default=None, metavar="YYYY-MM-DD")
    bf.add_argument("--hot-signer-threshold", type=int, default=None)
    bf.add_argument("--large-trade-min-zig", type=float, default=1000.0)
    bf.add_argument(
        "--allow-current-day", action="store_true",
        help="override the refusal to backfill a range touching the "
             "current UTC day (requires the stream to be STOPPED: the "
             "overwrite races live appends otherwise)",
    )

    jb = sub.add_parser("jobs", help="periodic rollup/alert jobs")
    jb.add_argument("--storage", required=True)
    jb.add_argument("--output", required=True)
    jb.add_argument("--once", action="store_true")
    jb.add_argument("--poll-sec", type=float, default=5.0)
    jb.add_argument(
        "--lcd", action="append", default=None, metavar="URL",
        help="LCD endpoint(s); enables the holders (180s) and token-"
             "metadata (60s) refresher jobs (repeat for failover)",
    )
    jb.add_argument(
        "--partials-source", choices=["store"], default=None,
        help="'store': serve the matrix/leaderboard/alert ticks from "
             "the partials + large-trades stores the indexer maintains "
             "under --storage (indexer --maintain-partials) instead of "
             "re-aggregating raw trades every tick",
    )
    jb.add_argument(
        "--partials-retention-days", type=int, default=None,
        help="drop partials-store day partitions older than this many "
             "days in the hourly compact slot (default: keep forever); "
             "the keep window auto-extends to cover the widest live "
             "wallet-trade alert and the 24h buckets",
    )

    qr = sub.add_parser("query", help="run SQL over the engine views")
    qr.add_argument("--storage", required=True)
    qr.add_argument("--sql", required=True)
    qr.add_argument("--limit", type=int, default=50)

    sp = sub.add_parser(
        "serve-push",
        help="client push streams over SSE (api/ws.js protocol: "
             "snapshot.ohlcv + ~1s ohlcv.delta with the forming bar, "
             "snapshot.trades + 2s trades.append); subscribe with "
             "GET /stream?kind=ohlcv|trades&token_id=T[&tf=5m]",
    )
    sp.add_argument("--storage", required=True)
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=8765)
    sp.add_argument("--zig-usd", type=float, default=None)
    sp.add_argument("--ohlcv-tick-sec", type=float, default=1.0)
    sp.add_argument("--trades-tick-sec", type=float, default=2.0)

    ci = sub.add_parser(
        "corpus-ingest",
        help="stream documents: exact-dedup, quality gate, online near-dedup",
    )
    ci.add_argument("--landing", required=True)
    ci.add_argument("--output", required=True)
    ci.add_argument("--checkpoint", required=True)
    ci.add_argument("--min-words", type=int, default=5)
    ci.add_argument("--max-rep-ratio", type=float, default=0.9)
    ci.add_argument("--watermark", default="1 hour")
    ci.add_argument(
        "--near-dup-threshold",
        type=float,
        default=None,
        help="enable online MinHash near-dedup at this Jaccard threshold",
    )
    ci.add_argument(
        "--maintain-text-index",
        action="store_true",
        help="keep the BM25 inverted index at OUTPUT/text_idx current "
        "with every micro-batch (idempotent batch-scoped writes)",
    )
    ci.add_argument(
        "--validate-constraints",
        default=None,
        help="JSON constraint-spec file (see `validate`): append a "
        "per-batch admission report to OUTPUT/quality_reports",
    )
    ci.add_argument(
        "--maintain-ivf-index",
        action="store_true",
        help="hash-embed accepted docs and grow the IVF ANN index at "
        "OUTPUT/ivf_idx (frozen centroids, replay-converging appends)",
    )
    ci.add_argument(
        "--maintain-pq-index",
        action="store_true",
        help="hash-embed accepted docs and grow the 16x-compressed PQ "
        "code index at OUTPUT/pq_idx (frozen codebooks)",
    )
    ci.add_argument(
        "--maintain-profile",
        action="store_true",
        help="write mergeable length-quantile histogram states to "
        "OUTPUT/length_profile per batch (quantile_merge to read)",
    )
    ci.add_argument(
        "--maintain-winnow-index",
        action="store_true",
        help="grow the winnowed-fingerprint (MOSS) overlap index at "
        "OUTPUT/winnow_idx (winnow_index_probe to query)",
    )
    ci.add_argument(
        "--maintain-freq-sketch",
        action="store_true",
        help="write mergeable count-min word-frequency states to "
        "OUTPUT/freq_sketch per batch (read_freq_sketch + cms_estimate "
        "to query)",
    )
    ci.add_argument("--once", action="store_true", help="drain and exit (availableNow)")

    cp = sub.add_parser("compact", help="small-file compaction (lakehouse OPTIMIZE)")
    cp.add_argument("--path", required=True)
    cp.add_argument("--partition-col", default="dt")
    cp.add_argument("--files-per-partition", type=int, default=1)
    cp.add_argument(
        "--zorder-by",
        default=None,
        help="comma-separated columns: rewrite clustered on the Z-curve "
        "(OPTIMIZE ZORDER analogue; overrides --partition-col)",
    )
    cp.add_argument(
        "--dirty-only",
        action="store_true",
        help="rewrite only partition dirs holding more than "
        "--files-per-partition files (O(new data) instead of a full "
        "table rewrite; no-op clean partitions keep their files)",
    )
    cp.add_argument(
        "--to-day-layout",
        default=None,
        metavar="TS_COLUMN",
        help="one-shot migration of a legacy flat streamed store to "
        "the __day= partitioned layout (partition by to_date(COLUMN)); "
        "no-op if the store is already partitioned",
    )

    cc = sub.add_parser(
        "corpus-clean",
        help="exact-substring dedup: detect duplicated n-gram spans and "
        "write cleaned docs + span audit table",
    )
    cc.add_argument("--input", required=True, help="documents parquet dir/file")
    cc.add_argument("--output", required=True)
    cc.add_argument("--ngram", type=int, default=5)
    cc.add_argument("--min-count", type=int, default=2)

    cs = sub.add_parser(
        "corpus-split",
        help="leakage-free train/val/test assignment (near-dup clusters "
        "never straddle a split)",
    )
    cs.add_argument("--input", required=True, help="documents parquet dir/file")
    cs.add_argument("--output", required=True)
    cs.add_argument("--threshold", type=float, default=0.5)
    cs.add_argument(
        "--fracs",
        default="train=0.9,val=0.05,test=0.05",
        help="name=frac pairs, comma-separated, in bucket order",
    )

    dc = sub.add_parser(
        "decontaminate",
        help="flag training docs leaking from a benchmark set: exact "
        "n-gram collision or MinHash near-dup (--fuzzy THRESHOLD)",
    )
    dc.add_argument("--train", required=True, help="training corpus parquet")
    dc.add_argument("--bench", required=True, help="benchmark corpus parquet")
    dc.add_argument("--output", required=True, help="flags parquet output")
    dc.add_argument(
        "--fuzzy",
        type=float,
        default=None,
        help="use near-dup matching at this Jaccard threshold instead "
        "of exact n-gram collision",
    )

    ip = sub.add_parser(
        "import-pools",
        help="pools CSV backfill (normalize pairs, skip existing contracts)",
    )
    ip.add_argument("--csv", required=True)
    ip.add_argument("--storage", required=True)
    ip.add_argument("--dry", action="store_true", help="print would-be inserts only")

    it = sub.add_parser(
        "index-text",
        help="build or incrementally update the persisted BM25 inverted index",
    )
    it.add_argument("--input", required=True, help="documents parquet dir/file")
    it.add_argument("--index", required=True, help="index root path")
    it.add_argument(
        "--update",
        action="store_true",
        help="append a new shard to an existing index (effectively-once)",
    )

    iv = sub.add_parser(
        "index-ivf",
        help="build or incrementally grow the persisted IVF ANN index",
    )
    iv.add_argument("--input", required=True, help="embeddings parquet dir/file")
    iv.add_argument("--index", required=True, help="index root path")
    iv.add_argument("--cells", type=int, default=16)
    iv.add_argument("--iters", type=int, default=3)
    iv.add_argument(
        "--update",
        action="store_true",
        help="assign new vectors to the frozen centroids and append "
        "(effectively-once)",
    )
    iv.add_argument(
        "--quantize",
        action="store_true",
        help="store int8 SQ8 cell vectors (~4x less probe I/O, "
        "approximate scores)",
    )

    se = sub.add_parser("search", help="BM25 top-k against a persisted text index")
    se.add_argument("--index", required=True)
    se.add_argument("--query", required=True, help="space-separated terms")
    se.add_argument("-k", type=int, default=10)

    iw = sub.add_parser(
        "index-winnow",
        help="persisted winnowing (MOSS) fingerprint index: build once, "
        "probe shards for substring overlap, append effectively-once",
    )
    iw.add_argument("action", choices=["build", "probe", "append", "compact"])
    iw.add_argument("--index", required=True, help="index root path")
    iw.add_argument("--input", help="documents parquet (build/probe/append)")
    iw.add_argument("--k", type=int, default=4, help="k-gram length (words)")
    iw.add_argument("--w", type=int, default=5, help="winnowing window")
    iw.add_argument("--min-shared", type=int, default=2)
    iw.add_argument("--limit", type=int, default=20, help="probe rows to print")

    sh = sub.add_parser(
        "shard",
        help="write deterministic training shards + manifest",
    )
    sh.add_argument("--input", required=True)
    sh.add_argument("--output", required=True)
    sh.add_argument("--n-shards", type=int, required=True)
    sh.add_argument("--key", default="doc_id")
    sh.add_argument("--token-col", default=None)
    sh.add_argument("--order-col", default=None)
    sh.add_argument("--format", choices=["parquet", "jsonl"], default="parquet")

    ji = sub.add_parser(
        "jsonl-ingest",
        help="append a JSONL drop into the parquet corpus "
        "(corrupt lines quarantined, re-ingest is a no-op)",
    )
    ji.add_argument("--input", required=True, help="jsonl path/glob")
    ji.add_argument("--corpus", required=True, help="corpus parquet dir")

    lm = sub.add_parser(
        "lm",
        help="persisted language model: build once, score many "
        "(bigram/stupid-backoff-trigram fluency filters)",
    )
    lm.add_argument("action", choices=["build", "score"])
    lm.add_argument("--model", required=True, help="model root path")
    lm.add_argument("--order", type=int, default=2, choices=[2, 3])
    lm.add_argument("--ref", help="reference corpus parquet (build)")
    lm.add_argument("--input", help="documents parquet to score (score)")
    lm.add_argument("--output", help="scored parquet output (score)")

    ds = sub.add_parser(
        "dsir",
        help="persisted DSIR importance model: build once (target + raw "
        "corpora -> 8192-row lambda table), score many",
    )
    ds.add_argument("action", choices=["build", "score"])
    ds.add_argument("--model", required=True, help="model root path")
    ds.add_argument("--raw", help="raw-pool corpus parquet (build)")
    ds.add_argument("--target", help="target/reference corpus parquet (build)")
    ds.add_argument("--input", help="documents parquet to score (score)")
    ds.add_argument("--output", help="scored parquet output (score)")

    gr = sub.add_parser(
        "graph",
        help="graph analytics over an edge-list parquet "
        "(pagerank/components/degrees/triangles/communities)",
    )
    gr.add_argument(
        "action",
        choices=[
            "pagerank", "components", "degrees", "triangles", "communities",
        ],
    )
    gr.add_argument("--edges", required=True, help="edge-list parquet")
    gr.add_argument("--src", default="src")
    gr.add_argument("--dst", default="dst")
    gr.add_argument("--output", help="parquet output (default: print top 20)")
    gr.add_argument("--iterations", type=int, default=5)
    gr.add_argument("--seeds", help="parquet with a node column: "
                    "personalized (seeded) pagerank")
    gr.add_argument(
        "--directed",
        action="store_true",
        help="keep edge direction (default symmetrizes; directed "
        "graphs must have out-edges on every node for pagerank)",
    )

    bp = sub.add_parser(
        "bpe",
        help="persisted BPE tokenizer: fit once (merge list artifact), "
        "tokenize many",
    )
    bp.add_argument("action", choices=["fit", "tokenize"])
    bp.add_argument("--model", required=True, help="model path")
    bp.add_argument("--input", required=True, help="documents parquet")
    bp.add_argument("--merges", type=int, default=10, help="merge count (fit)")
    bp.add_argument("--output", help="tokenized parquet output (tokenize)")

    pc = sub.add_parser(
        "pca",
        help="distributed PCA: fit once (moment pass + driver eigh), "
        "project many",
    )
    pc.add_argument("action", choices=["fit", "project"])
    pc.add_argument("--model", required=True, help="model path")
    pc.add_argument("--input", required=True, help="embeddings parquet")
    pc.add_argument("--k", type=int, default=8, help="components (fit)")
    pc.add_argument("--vec-col", default="embedding")
    pc.add_argument("--output", help="projected parquet output (project)")

    pqp = sub.add_parser(
        "index-pq",
        help="product-quantization ANN index: build 16x-compressed "
        "codes once, ADC-search many (optional exact rerank)",
    )
    pqp.add_argument("action", choices=["build", "search"])
    pqp.add_argument("--index", required=True, help="index path")
    pqp.add_argument("--input", required=True, help="embeddings parquet")
    pqp.add_argument("--m-sub", type=int, default=16, help="subspaces (build)")
    pqp.add_argument(
        "--k-sub", type=int, default=16, help="centroids per subspace (build)"
    )
    pqp.add_argument("--vec-col", default="embedding")
    pqp.add_argument("--id-col", default="vec_id")
    pqp.add_argument("--k", type=int, default=5, help="top-k (search)")
    pqp.add_argument(
        "--rerank",
        action="store_true",
        help="exact-rerank the ADC shortlist against --input vectors",
    )

    va = sub.add_parser(
        "validate",
        help="data-quality constraint report (deequ-style ingest gate)",
    )
    va.add_argument("--input", required=True, help="parquet table to validate")
    va.add_argument(
        "--constraints",
        required=True,
        help="JSON file: list of constraint specs "
        "(not_null/range/accepted_values/matches/unique/expr/fk)",
    )
    va.add_argument("--output", help="optional parquet path for the report")
    va.add_argument(
        "--strict",
        action="store_true",
        help="exit 1 if any constraint fails (batch-gate semantics)",
    )

    pf = sub.add_parser(
        "profile",
        help="one-pass column profile (rows/nulls/NDV/min-max/top value)",
    )
    pf.add_argument("--input", required=True, help="parquet table to profile")
    pf.add_argument("--columns", help="comma-separated subset (default: all)")
    pf.add_argument("--output", help="optional parquet path for the profile")

    vt = sub.add_parser(
        "vt",
        help="manifest-versioned table maintenance (history/compact/vacuum)",
    )
    vt.add_argument(
        "action", choices=["history", "compact", "vacuum", "changes", "clone"]
    )
    vt.add_argument("--from-version", type=int, default=1)
    vt.add_argument("--path", required=True)
    vt.add_argument("--target-files", type=int, default=8)
    vt.add_argument("--keep-versions", type=int, default=2)
    vt.add_argument("--dest", help="clone destination path")
    vt.add_argument(
        "--at-version", type=int, help="clone source version (default: latest)"
    )

    po = sub.add_parser(
        "poller",
        help="RPC block poller: follow the chain tip and land RAW_SCHEMA "
        "JSON shards for the indexer stream (bin/start-indexer.js shape)",
    )
    po.add_argument("--rpc", required=True, nargs="+",
                    help="RPC endpoint(s); extras are failover backups")
    po.add_argument("--landing", required=True)
    po.add_argument("--checkpoint", required=True)
    po.add_argument("--max-blocks", type=int, default=None,
                    help="land at most N blocks then exit (default: follow)")
    po.add_argument("--pipeline-depth", type=int, default=3)

    args = p.parse_args(argv)
    if args.cmd == "poller":  # pure driver glue: no SparkSession needed
        from .sources.pollers import (
            BlockPoller,
            FileCheckpoint,
            HttpJson,
            RpcClient,
        )

        poller = BlockPoller(
            RpcClient(HttpJson(args.rpc)),
            args.landing,
            FileCheckpoint(args.checkpoint),
            pipeline_depth=args.pipeline_depth,
        )
        n = poller.run(max_blocks=args.max_blocks)
        print(f"landed {n} blocks")
        return 0

    from .session import build_session

    spark = build_session(app_name=f"degenter-{args.cmd}")
    if args.cmd == "indexer":
        from .streaming import pipeline

        q = pipeline.stream_ingest(
            spark,
            args.landing,
            args.storage,
            args.checkpoint,
            router_addr=args.router_addr,
            available_now=args.once,
            maintain_partials=args.maintain_partials,
        )
        if not args.once:
            q.awaitTermination()
        return 0
    if args.cmd == "corpus-ingest":
        from .streaming import corpus

        _vc = None
        if args.validate_constraints:
            import json as _json

            from .operators.validate import constraints_from_specs

            _vc = constraints_from_specs(
                spark, _json.load(open(args.validate_constraints))
            )

        q = corpus.stream_corpus_ingest(
            spark,
            args.landing,
            args.output,
            args.checkpoint,
            min_words=args.min_words,
            max_rep_ratio=args.max_rep_ratio,
            watermark=args.watermark,
            near_dup_threshold=args.near_dup_threshold,
            maintain_text_index=args.maintain_text_index,
            maintain_ivf_index=args.maintain_ivf_index,
            maintain_pq_index=args.maintain_pq_index,
            maintain_winnow_index=args.maintain_winnow_index,
            maintain_profile=args.maintain_profile,
            maintain_freq_sketch=args.maintain_freq_sketch,
            validate_constraints=_vc,
            available_now=args.once,
        )
        if not args.once:
            q.awaitTermination()
        return 0
    if args.cmd == "compact":
        from .operators.merge import compact_table

        if args.to_day_layout:
            import os as _os

            from .operators.merge import migrate_to_day_layout
            from .streaming.pipeline import unsafe_partials_tag

            # the rewrite strips ohlcv's tag-named replay identity
            # exactly like a compaction: refuse while any streaming
            # batch in the store's parent dir is unsettled (guard is
            # re-checked under the table lock; ADVICE r11). A path
            # outside a streamed storage dir has no markers -> passes.
            parent = _os.path.dirname(_os.path.abspath(args.path.rstrip("/")))
            res = migrate_to_day_layout(
                spark, args.path, args.to_day_layout,
                guard=lambda: unsafe_partials_tag(parent) is None,
            )
            if res.get("reason") == "guard":
                print(
                    "skipped: an unsettled streaming batch holds replay "
                    "state here — stop the stream / let the batch settle, "
                    "then re-run"
                )
            print(res)
            return 0
        pc = args.partition_col if args.partition_col != "none" else None
        zb = args.zorder_by.split(",") if args.zorder_by else None
        print(
            compact_table(
                spark,
                args.path,
                partition_col=None if zb else pc,
                files_per_partition=args.files_per_partition,
                zorder_by=zb,
                dirty_only=args.dirty_only and not zb,
            )
        )
        return 0
    if args.cmd == "corpus-clean":
        import os as _os

        from .llm.clean import duplicate_ngram_spans, remove_duplicate_spans

        docs = spark.read.parquet(args.input)
        spans = duplicate_ngram_spans(
            docs, n=args.ngram, min_count=args.min_count
        ).localCheckpoint(eager=True)
        spans.write.mode("overwrite").parquet(_os.path.join(args.output, "spans"))
        cleaned = remove_duplicate_spans(docs, spans)
        cleaned.write.mode("overwrite").parquet(
            _os.path.join(args.output, "cleaned")
        )
        print("spans:", spans.count())
        return 0
    if args.cmd == "corpus-split":
        from .llm.dedup import leakage_free_split, minhash_lsh_pairs

        docs = spark.read.parquet(args.input)
        fracs = [
            (kv.split("=")[0], float(kv.split("=")[1]))
            for kv in args.fracs.split(",")
        ]
        pairs = minhash_lsh_pairs(docs, threshold=args.threshold)
        leakage_free_split(docs, pairs, fracs=fracs).write.mode(
            "overwrite"
        ).parquet(args.output)
        return 0
    if args.cmd == "lm":
        from .llm import lm as _lm

        if args.action == "build":
            if not args.ref:
                p.error("lm build requires --ref")
            print(
                _lm.build_lm_model(
                    spark.read.parquet(args.ref), args.model, order=args.order
                )
            )
        else:
            if not (args.input and args.output):
                p.error("lm score requires --input and --output")
            model = _lm.load_lm_model(spark, args.model, order=args.order)
            score = (
                _lm.bigram_fluency if args.order == 2 else _lm.trigram_fluency
            )
            out = score(spark.read.parquet(args.input), model=model)
            out.write.mode("overwrite").parquet(args.output)
            print("scored:", spark.read.parquet(args.output).count())
        return 0
    if args.cmd == "decontaminate":
        from .llm.dedup import contamination, fuzzy_contamination

        train = spark.read.parquet(args.train)
        bench = spark.read.parquet(args.bench)
        if args.fuzzy is not None:
            out = fuzzy_contamination(train, bench, threshold=args.fuzzy)
        else:
            out = contamination(train, bench)
        out.write.mode("overwrite").parquet(args.output)
        flagged = spark.read.parquet(args.output)
        print(
            "contaminated:",
            flagged.filter(flagged.contaminated).count(),
            "of",
            flagged.count(),
        )
        return 0
    if args.cmd == "dsir":
        from .llm import dsir as _dsir

        if args.action == "build":
            if not (args.raw and args.target):
                p.error("dsir build requires --raw and --target")
            print(
                _dsir.build_dsir_model(
                    spark.read.parquet(args.raw),
                    spark.read.parquet(args.target),
                    args.model,
                )
            )
        else:
            if not (args.input and args.output):
                p.error("dsir score requires --input and --output")
            model = _dsir.load_dsir_model(spark, args.model)
            out = _dsir.dsir_scores(spark.read.parquet(args.input), model=model)
            out.write.mode("overwrite").parquet(args.output)
            print("scored:", spark.read.parquet(args.output).count())
        return 0
    if args.cmd == "graph":
        from pyspark.sql import functions as _F

        from .operators import graph as _graph

        edges = spark.read.parquet(args.edges).select(
            _F.col(args.src).alias("src"), _F.col(args.dst).alias("dst")
        )
        if not args.directed:
            edges = _graph.symmetrize(edges)
        if args.action == "pagerank":
            if args.seeds:
                seeds = spark.read.parquet(args.seeds).select("node")
                out = _graph.personalized_pagerank(
                    edges, seeds, iterations=args.iterations
                )
            else:
                out = _graph.pagerank(edges, iterations=args.iterations)
            order = [_F.desc("rank"), "node"]
        elif args.action == "components":
            out = _graph.connected_components(edges)
            order = ["component", "node"]
        elif args.action == "triangles":
            out = _graph.triangle_counts(edges)
            order = [_F.desc("n_triangles"), "node"]
        elif args.action == "communities":
            out = _graph.label_propagation(edges, iterations=args.iterations)
            order = ["label", "node"]
        else:
            out = _graph.degree_stats(edges)
            order = [_F.desc("degree")]
        if args.output:
            out.write.mode("overwrite").parquet(args.output)
        for r in out.orderBy(*order).limit(20).collect():
            print(r.asDict())
        return 0
    if args.cmd == "bpe":
        from .llm import bpe as _bpe

        docs = spark.read.parquet(args.input)
        if args.action == "fit":
            merges = _bpe.fit_bpe_merges(docs, n_merges=args.merges)
            _bpe.save_bpe_model(spark, merges, args.model)
            print(f"fitted {len(merges)} merges -> {args.model}")
            return 0
        merges = _bpe.load_bpe_model(spark, args.model)
        out = _bpe.apply_bpe(docs, merges)
        if args.output:
            out.write.mode("overwrite").parquet(args.output)
        print(f"tokenized {out.count()} docs with {len(merges)} merges")
        return 0
    if args.cmd == "pca":
        from .llm import pca as _pca

        vecs = spark.read.parquet(args.input)
        if args.action == "fit":
            model = _pca.fit_pca(vecs, k=args.k, vec=args.vec_col)
            _pca.save_pca_model(spark, model, args.model)
            ev = ", ".join(f"{v:.4g}" for v in model["explained_variance"])
            print(f"fitted k={len(model['components'])} d={model['dim']} "
                  f"n={model['n']} ev=[{ev}] -> {args.model}")
            return 0
        model = _pca.load_pca_model(spark, args.model)
        out = _pca.project_pca(vecs, model, vec=args.vec_col)
        if args.output:
            out.write.mode("overwrite").parquet(args.output)
        print(f"projected {out.count()} vectors to k={len(model['components'])}")
        return 0
    if args.cmd == "profile":
        from .operators.validate import profile_table

        df = spark.read.parquet(args.input)
        cols = args.columns.split(",") if args.columns else None
        prof = profile_table(df, cols)
        if args.output:
            prof.write.mode("overwrite").parquet(args.output)
        for r in prof.orderBy("column").collect():  # column-count-sized
            print(
                r["column"], r["n_rows"], r["n_null"], r["n_distinct"],
                repr(r["min_val"]), repr(r["max_val"]),
                repr(r["top_val"]), r["top_n"],
            )
        return 0
    if args.cmd == "validate":
        import json as _json

        from .operators import validate as _validate

        specs = _json.load(open(args.constraints))
        df = spark.read.parquet(args.input)
        report = _validate.check(
            df, _validate.constraints_from_specs(spark, specs)
        )
        if args.output:
            report.write.mode("overwrite").parquet(args.output)
        rows = report.collect()  # constraint-count-sized
        for r in rows:
            print(
                _json.dumps(
                    {
                        "constraint": r["constraint"],
                        "metric_num": r["metric_num"],
                        "metric_den": r["metric_den"],
                        "passed": r["passed"],
                    }
                )
            )
        if args.strict and any(not r["passed"] for r in rows):
            return 1
        return 0
    if args.cmd == "vt":
        from .operators import versioned as _vt

        if args.action == "history":
            for h in _vt.vt_history(args.path):
                print(h)
        elif args.action == "changes":
            for r in _vt.vt_changes(spark, args.path, args.from_version).collect():
                print(r.asDict())
        elif args.action == "compact":
            print("compacted to v", _vt.vt_compact(spark, args.path, args.target_files))
        elif args.action == "clone":
            if not args.dest:
                p.error("vt clone requires --dest")
            v = _vt.vt_clone(spark, args.path, args.dest, version=args.at_version)
            print("cloned to v", v)
        else:
            print("removed files:", _vt.vt_vacuum(args.path, args.keep_versions))
        return 0
    if args.cmd == "index-text":
        from .llm.clean import build_text_index, update_text_index

        docs = spark.read.parquet(args.input)
        if args.update:
            print("new docs indexed:", update_text_index(spark, docs, args.index))
        else:
            build_text_index(docs, args.index)
            print("indexed:", docs.count())
        return 0
    if args.cmd == "index-ivf":
        from .llm.similarity import build_ivf_index, ivf_index_append

        vecs = spark.read.parquet(args.input)
        if args.update:
            print("new vectors indexed:", ivf_index_append(spark, vecs, args.index))
        else:
            build_ivf_index(
                vecs, args.index, k_cells=args.cells, iters=args.iters,
                quantize=args.quantize,
            )
            print("indexed:", vecs.count())
        return 0
    if args.cmd == "index-winnow":
        from pyspark.sql import functions as F

        from .llm import winnow as W

        if args.action == "compact":
            print(W.compact_winnow_index(spark, args.index))
            return 0
        docs = spark.read.parquet(args.input).select("doc_id", "text")
        if args.action == "build":
            W.build_winnow_index(docs, args.index, k=args.k, w=args.w)
            print("indexed:", docs.count())
        elif args.action == "append":
            print(
                "new docs indexed:",
                W.winnow_index_append(spark, docs, args.index, k=args.k, w=args.w),
            )
        else:  # probe
            W.winnow_index_probe(
                spark, args.index, docs, k=args.k, w=args.w,
                min_shared=args.min_shared,
            ).orderBy(F.col("overlap_1e9").desc(), "d1", "d2").show(
                args.limit, truncate=False
            )
        return 0
    if args.cmd == "index-pq":
        from .llm.pq import build_pq_index, pq_search

        vecs = spark.read.parquet(args.input)
        if args.action == "build":
            build_pq_index(
                vecs, args.index, m_sub=args.m_sub, k_sub=args.k_sub,
                id_col=args.id_col, vec=args.vec_col,
            )
            print("indexed:", vecs.count())
            return 0
        res = pq_search(
            spark, args.index, vecs, k=args.k,
            id_col=args.id_col, vec=args.vec_col,
            rerank_with=vecs if args.rerank else None,
        )
        for r in res.collect():
            print(r["q_id"], r["rank"], r["c_id"], r["score"])
        return 0
    if args.cmd == "search":
        from .llm.clean import text_index_search

        for r in text_index_search(
            spark, args.index, args.query.split(), k=args.k
        ).collect():
            print(r["doc_id"], r["score"], r["n_terms"])
        return 0
    if args.cmd == "shard":
        from .llm.shard import write_shards

        manifest = write_shards(
            spark,
            spark.read.parquet(args.input),
            args.output,
            n_shards=args.n_shards,
            key_col=args.key,
            token_col=args.token_col,
            order_col=args.order_col,
            fmt=args.format,
        )
        for r in manifest.orderBy("shard").collect():
            print(r.asDict())
        return 0
    if args.cmd == "jsonl-ingest":
        from .sources.corpus_jsonl import ingest_jsonl

        print(ingest_jsonl(spark, args.input, args.corpus))
        return 0
    if args.cmd == "import-pools":
        import os as _os

        from .sources.csv_pools import import_pools

        pools_path = _os.path.join(args.storage, "pools")
        try:
            existing = spark.read.parquet(pools_path)
        except Exception:
            existing = None
        rows = import_pools(spark, args.csv, existing_pools=existing, dry=args.dry)
        if args.dry:
            rows.show(50, truncate=False)
            print("would insert:", rows.count())
            return 0
        # materialize before the append: the anti-join re-lists the
        # pools dir at execution, so a lazy plan re-run after the write
        # would see its own inserts
        rows = rows.localCheckpoint(eager=True)
        rows.write.mode("append").parquet(pools_path)
        print("inserted:", rows.count())
        return 0
    if args.cmd == "backfill-partials":
        import os as _os

        from .plans.incremental import backfill_partials_stores

        trades = spark.read.parquet(_os.path.join(args.storage, "trades"))
        print(
            backfill_partials_stores(
                spark, trades, args.storage,
                from_day=args.from_day, to_day=args.to_day,
                hot_signer_threshold=args.hot_signer_threshold,
                large_trade_min_zig=args.large_trade_min_zig,
                allow_current_day=args.allow_current_day,
            )
        )
        return 0
    from .engine import DegenterEngine

    engine = DegenterEngine(spark, storage_dir=args.storage)
    if args.cmd == "jobs":
        from .jobs import JobsRunner

        lcd = None
        if args.lcd:
            from .sources.pollers import HttpJson, LcdClient

            lcd = LcdClient(HttpJson(args.lcd))
        runner = JobsRunner(
            engine, args.output, lcd=lcd,
            partials_source=args.partials_source,
            store_dir=args.storage if args.partials_source == "store" else None,
            partials_retention_days=args.partials_retention_days,
        )
        if args.once:
            print("ran:", runner.tick())
            return 0
        runner.run_forever(args.poll_sec)
        return 0
    if args.cmd == "query":
        engine.sql(args.sql).show(args.limit, truncate=False)
        return 0
    if args.cmd == "serve-push":
        import time as _time

        from pyspark.sql import functions as F

        from .streaming.push import PushServer, engine_provider

        zig = F.lit(args.zig_usd) if args.zig_usd is not None else None
        bars_fn, trades_fn = engine_provider(engine, zig)
        srv = PushServer(
            bars_fn, trades_fn, host=args.host, port=args.port,
            ohlcv_tick_sec=args.ohlcv_tick_sec,
            trades_tick_sec=args.trades_tick_sec,
        ).start()
        print(
            f"push server on http://{args.host}:{srv.port}/stream"
            "?kind=ohlcv|trades&token_id=T[&tf=5m]"
        )
        try:
            while True:
                _time.sleep(3600)
        except KeyboardInterrupt:
            srv.stop()
        return 0
    return 2


if __name__ == "__main__":
    sys.exit(main())
