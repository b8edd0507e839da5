"""LLM training-data pipeline queries (dedup, similarity, text analysis).

Filled in milestone M5 — see degenter_clickhouse_spark/llm/.
"""
