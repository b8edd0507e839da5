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


# ---------------------------------------------------------------------------
# corpus_drift — per-source distribution drift vs the corpus profile
# (the monitoring step crawl pipelines run before admitting a new
# source/snapshot: "does this source's length distribution look like
# the corpus, or did the extractor break?"). Chi-square distance over
# fixed-width token-length buckets: expected per (source, bucket) is
# the source's size times the corpus bucket share; missing buckets
# contribute their full expectation. Every input to each term is a
# BIGINT, the double arithmetic is a fixed operand-order expression,
# and the per-source sum goes through the round-then-DECIMAL recipe
# (llm/clean.bm25 scores) — bit-identical across engines and shuffle
# orders. Shuffle cost: sources x buckets rows, never corpus-sized.
# ---------------------------------------------------------------------------

DRIFT_BUCKET_W = 16
DRIFT_CHI2_PER_BIN = 2.0  # drifted when chi2 exceeds 2x the bin count

DRIFT_ORACLE = f"""
WITH toks AS (
  SELECT source,
         CAST(floor(len(string_split(text, ' ')) / {DRIFT_BUCKET_W}) AS BIGINT)
           AS bin
  FROM documents
),
obs AS (SELECT source, bin, COUNT(*) AS o FROM toks GROUP BY source, bin),
gl AS (SELECT bin, SUM(o) AS g FROM obs GROUP BY bin),
ns AS (SELECT source, SUM(o) AS n FROM obs GROUP BY source),
tot AS (SELECT SUM(g) AS nn, COUNT(*) AS n_bins FROM gl),
grid AS (
  SELECT ns.source, ns.n, gl.bin, gl.g, tot.nn, tot.n_bins
  FROM ns CROSS JOIN gl CROSS JOIN tot
),
terms AS (
  SELECT source, n, n_bins,
         CAST(round(
           (CAST(COALESCE(obs.o, 0) AS DOUBLE)
              - CAST(grid.n AS DOUBLE) * CAST(grid.g AS DOUBLE)
                / CAST(grid.nn AS DOUBLE))
           * (CAST(COALESCE(obs.o, 0) AS DOUBLE)
              - CAST(grid.n AS DOUBLE) * CAST(grid.g AS DOUBLE)
                / CAST(grid.nn AS DOUBLE))
           / (CAST(grid.n AS DOUBLE) * CAST(grid.g AS DOUBLE)
              / CAST(grid.nn AS DOUBLE)), 9) AS DECIMAL(38,12)) AS t
  FROM grid LEFT JOIN obs USING (source, bin)
)
SELECT source,
       CAST(n AS BIGINT) AS n_docs,
       CAST(n_bins AS BIGINT) AS n_bins,
       round(CAST(SUM(t) AS DOUBLE), 6) AS chi2,
       round(CAST(SUM(t) AS DOUBLE), 6) > {DRIFT_CHI2_PER_BIN} * n_bins
         AS drifted
FROM terms GROUP BY source, n, n_bins
"""


@register_extended("corpus_drift", DRIFT_ORACLE)
def q_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square drift of each source's token-length histogram against
    the whole corpus's. Plans: two bucket-sized aggregations, a 1-row
    totals frame, a broadcast sources x buckets grid join — the corpus
    is scanned once and only histogram rows shuffle."""
    from .core import F as _F  # noqa: F401 (shared functions import)

    docs = catalog.load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.floor(F.size(F.split("text", " ")) / DRIFT_BUCKET_W)
        .cast("long")
        .alias("bin"),
    )
    obs = toks.groupBy("source", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    gl = obs.groupBy("bin").agg(F.sum("o").cast("long").alias("g"))
    ns = obs.groupBy("source").agg(F.sum("o").cast("long").alias("n"))
    tot = gl.agg(
        F.sum("g").cast("long").alias("nn"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
    )
    grid = ns.crossJoin(F.broadcast(gl)).crossJoin(F.broadcast(tot))
    j = grid.join(obs, ["source", "bin"], "left")
    e = (
        F.col("n").cast("double")
        * F.col("g").cast("double")
        / F.col("nn").cast("double")
    )
    od = F.coalesce(F.col("o"), F.lit(0)).cast("double")
    term = (od - e) * (od - e) / e
    chi2 = F.round(
        F.sum(F.round(term, 9).cast("decimal(38,12)")).cast("double"), 6
    )
    return (
        j.groupBy("source", "n", "n_bins")
        .agg(chi2.alias("chi2"))
        .select(
            "source",
            F.col("n").alias("n_docs"),
            "n_bins",
            "chi2",
            (F.col("chi2") > DRIFT_CHI2_PER_BIN * F.col("n_bins")).alias(
                "drifted"
            ),
        )
    )
