"""Data-quality validation queries (extended registry): the
deequ-style constraint report of operators/validate.py over the
lineitem fact table, with referential integrity against orders.

Integer (num, den, cross-multiplied pass flag) verdicts keep the
report bit-identical across engines — see operators/validate.py.

``Unique`` compiles to Spark ``count_distinct(struct(a, b))``, which
like the DuckDB oracle's ``COUNT(DISTINCT (a, b))`` counts
NULL-containing key tuples (NULL fields compare equal under
DISTINCT) — the two dialects agree on NULL-keyed rows by
construction, not just on NULL-free columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..operators import validate as V
from . import register_extended

QUALITY_ORACLE = """
WITH base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS den,
         CAST(SUM(CASE WHEN l_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS p0,
         CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 1 ELSE 0 END) AS BIGINT) AS p1,
         CAST(SUM(CASE WHEN l_returnflag IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT) AS p2,
         CAST(SUM(CASE WHEN regexp_matches(l_linestatus, '^(?:[OF])$') THEN 1 ELSE 0 END) AS BIGINT) AS p3,
         CAST(SUM(CASE WHEN l_tax + l_discount <= 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS p4,
         CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS u0
  FROM lineitem
),
fk AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS den,
         CAST(SUM(CASE WHEN o.o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS num
  FROM lineitem l
  LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
    ON l.l_orderkey = o.o_orderkey
  WHERE l.l_orderkey IS NOT NULL
)
SELECT 'not_null(l_orderkey)' AS constraint, p0 AS metric_num, den AS metric_den,
       p0 * 100 >= den * 100 AS passed FROM base
UNION ALL
SELECT 'range(l_quantity)', p1, den, p1 * 100 >= den * 100 FROM base
UNION ALL
SELECT 'accepted_values(l_returnflag)', p2, den, p2 * 100 >= den * 100 FROM base
UNION ALL
SELECT 'matches(l_linestatus)', p3, den, p3 * 100 >= den * 100 FROM base
UNION ALL
SELECT 'tax_plus_discount_le_1', p4, den, p4 * 100 >= den * 95 FROM base
UNION ALL
SELECT 'unique(l_orderkey,l_linenumber)', u0, den, u0 * 100 >= den * 100 FROM base
UNION ALL
SELECT 'fk(l_orderkey->orders)', num, den, num * 100 >= den * 100 FROM fk
"""


@register_extended("data_quality_report", QUALITY_ORACLE)
def q_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint report over lineitem: one scan for the six
    row/uniqueness constraints + one semi-join for the foreign key."""
    li = catalog.load_table(spark, sf_dir, "lineitem")
    orders = catalog.load_table(spark, sf_dir, "orders")
    return V.check(
        li,
        [
            V.not_null("l_orderkey"),
            V.in_range("l_quantity", 1, 50),
            V.accepted_values("l_returnflag", ["A", "N", "R"]),
            V.matches("l_linestatus", "[OF]"),
            V.Predicate(
                "tax_plus_discount_le_1",
                F.col("l_tax") + F.col("l_discount") <= 1.0,
                min_pct=95,
            ),
            V.Unique(
                "unique(l_orderkey,l_linenumber)",
                ["l_orderkey", "l_linenumber"],
            ),
            V.ForeignKey(
                "fk(l_orderkey->orders)", "l_orderkey", orders, "o_orderkey"
            ),
        ],
    )


# ---------------------------------------------------------------------------
# One-pass column profile over documents (operators/validate.
# profile_table): per column — rows, nulls, exact NDV, min/max (string
# renderings; the profiled table is int/string-typed so renderings are
# engine-identical), and the (count, value)-max frequent value. The
# oracle rebuilds each column's row with plain SQL aggregates + a
# top-1 subquery: an independent formulation per metric.
# ---------------------------------------------------------------------------

_PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(f"""
SELECT '{c}' AS "column",
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) FILTER ({c} IS NULL) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       MIN(CAST({c} AS VARCHAR)) AS min_val,
       MAX(CAST({c} AS VARCHAR)) AS max_val,
       (SELECT v FROM (
          SELECT CAST({c} AS VARCHAR) AS v, COUNT(*) AS cnt
          FROM documents WHERE {c} IS NOT NULL GROUP BY 1
          ORDER BY cnt DESC, v DESC LIMIT 1)) AS top_val,
       (SELECT CAST(cnt AS BIGINT) FROM (
          SELECT CAST({c} AS VARCHAR) AS v, COUNT(*) AS cnt
          FROM documents WHERE {c} IS NOT NULL GROUP BY 1
          ORDER BY cnt DESC, v DESC LIMIT 1)) AS top_n
FROM documents""")
    return "\nUNION ALL\n".join(parts)


PROFILE_ORACLE = _profile_oracle()


@register_extended("column_profile", PROFILE_ORACLE)
def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import catalog
    from ..operators.validate import profile_table

    docs = catalog.load_table(spark, sf_dir, "documents")
    return profile_table(docs, _PROFILE_COLS)
