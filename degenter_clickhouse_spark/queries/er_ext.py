"""Entity-resolution queries (extended registry): sorted-neighborhood
fuzzy matching over customer names (llm/dedup.snm_pairs).

The oracle expresses the SAME semantics directly: a global
ROW_NUMBER() over the sort order and a rank-band self-join with a
levenshtein cutoff — integer distances, so bit-exact across engines.
The Spark side materializes the identical global rank WITHOUT a
single-partition window (range partitions + broadcast offsets); the
plan guard for this query asserts that shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import catalog
from ..llm import dedup
from . import register_extended

_WINDOW = 3
_MAX_DIST = 2

SNM_ORACLE = f"""
WITH g AS (
  SELECT c_custkey AS id, c_name AS key,
         ROW_NUMBER() OVER (ORDER BY c_name, c_custkey) AS rank
  FROM customer
)
SELECT a.id AS id_a, b.id AS id_b, a.key AS key_a, b.key AS key_b,
       levenshtein(a.key, b.key) AS dist
FROM g a
JOIN g b ON b.rank BETWEEN a.rank + 1 AND a.rank + {_WINDOW}
WHERE levenshtein(a.key, b.key) <= {_MAX_DIST}
"""


@register_extended("fuzzy_snm_pairs", SNM_ORACLE)
def q_fuzzy_snm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy near-duplicate customer-name pairs by SNM (window 3,
    levenshtein <= 2)."""
    cust = catalog.load_table(spark, sf_dir, "customer")
    return dedup.snm_pairs(
        cust, key_col="c_name", id_col="c_custkey",
        window=_WINDOW, max_dist=_MAX_DIST,
    )
