"""Every registered query must hash-match its DuckDB oracle — this is
the in-repo mirror of the driver's CORRECTNESS gate (at sf0.001 for
speed; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from degenter_clickhouse_spark.queries import load_registry

from .helpers import SF_DIR, assert_matches_oracle

# extended=True: also oracle-check the beyond-cap entries the driver
# gate never sees (queries/clean_ext.py)
REGISTRY = load_registry(extended=True)
ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    assert_matches_oracle(df, q.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES or ["__all_oracled__"])
def test_rows_only_query_runs(spark, name):
    if name == "__all_oracled__":
        # the strongest possible state: EVERY registered query carries
        # an exact oracle, so there is nothing rows-only to weakly
        # check (an empty parametrize would otherwise report a skip)
        assert not ROWS_ONLY_QUERIES
        return
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_results_invariant_to_shuffle_partitioning(spark):
    """The determinism contract holds under different physical
    parallelism: double aggregates go through DECIMAL accumulation, so
    reshuffling (different partition counts => different reduce orders)
    must not move a single bit. Representative queries: decimal-sum
    aggregation, window top-k, LSH dedup with checkpointed shingles."""
    import pandas as pd

    default = spark.conf.get("spark.sql.shuffle.partitions")
    names = [
        "pricing_summary",
        "vocab_stats",
        "dedup_minhash_lsh",
        # round-4 additions: closed-form interleave feeds packing;
        # integer-scaled ANN probes; unigram-LM filter columns
        "embedding_ann_scalable",
        "corpus_filter_pipeline",
        # extended-registry ops: span merge via per-doc windows;
        # cluster-hash split; DECIMAL-summed BM25 scores
        "span_dedup_clean",
        "leakage_free_split",
        "bm25_search",
        # round-4 session 2: single-shuffle window carry with struct
        # tie-ordering; integer-scaled centroid means; global line
        # winner via min-struct
        "asof_join_events",
        "centroid_classify",
        "line_dedup",
        # round-4 session 3: percentile interpolation over per-group
        # sorted buffers; grouping-sets expansion with DECIMAL volume;
        # symmetric-pair knn explode
        "quantile_summary",
        "rollup_totals",
        "knn_label_vote",
        # behavioral-analytics family: DECIMAL rollups under grouped
        # flags, rolling ROWS frames, duration-weighted means
        "twap_vwap",
        "window_funnel",
        "retention_cohorts",
        "moving_stats",
        "ema_bars",
        "trigram_fluency",
        # round-5 additions: multi-probe bucketed knn; integer-RRF
        # fusion of two rankings; ln-round-DECIMAL importance sums;
        # hash-uniform A-ES keys
        "knn_label_vote_blocked",
        "hybrid_retrieval",
        "dsir_selection",
        "weighted_sample",
        # round-13 additions: deterministic sketch counters; DECIMAL
        # moment sums feeding a fixed OLS expression tree
        "cms_freq_estimate",
        "linear_trend",
    ]

    def run_all():
        out = {}
        for n in names:
            df = REGISTRY[n].fn(spark, SF_DIR).toPandas()
            out[n] = df[sorted(df.columns)].astype(str).sort_values(
                by=sorted(df.columns), ignore_index=True
            )
        return out

    base = run_all()
    try:
        for parts in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            got = run_all()
            for n in names:
                pd.testing.assert_frame_equal(got[n], base[n]), (n, parts)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", default)
