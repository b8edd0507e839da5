"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference DEX indexer (Subhan-WebDev/Degenter-clickhouse).

Layout:
    session    -- tuned SparkSession builder (AQE, broadcast, UTC)
    catalog    -- loaders for the driver parquet tables + domain views
    schemas    -- explicit StructType registry for the domain tables
    operators/ -- generic relational operators (latest-by, OHLCV, top-k,
                  dedupe, gap fill, router combine)
    functions/ -- scalar expression library (parse, business math, text)
    plans/     -- DEX rollup pipelines (pool/token matrix, leaderboards,
                  holders, security, alerts, swap simulation)
    sources/   -- ingest (raw block events -> facts), CSV import
    streaming/ -- Structured Streaming variants of the ingest pipeline
    llm/       -- large-scale training-data ops (dedup, similarity
                  search, text analysis, multimodal plumbing)
"""

__version__ = "0.1.0"
