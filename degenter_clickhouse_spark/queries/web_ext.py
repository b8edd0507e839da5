"""Web-corpus curation queries (extended registry): URL
canonicalization / registrable domains / per-domain quota / URL-level
dedup (llm/web.py) as one tagged-union suite with an exact DuckDB
oracle that implements the SAME canonicalization contract
independently (RE2 list/regex functions vs Spark column expressions).

The documents table carries no URL column, so each part derives a
deterministic MESSY url from (doc_id, source) — uppercase
scheme/host, default ports, tracking params, fragments, trailing
slashes, a multi-part public suffix — identically in both dialects,
then canonicalizes it independently. doc_id%4 buckets 2 and 3 build
the same canonical URL on purpose, making the dedup part real.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register_extended
from .llm import _docs

_URL_SPARK = (
    "CASE CAST(doc_id % 4 AS INT) "
    "WHEN 0 THEN concat('HTTPS://WWW.', source, '.News.CO.UK:443/Path/', "
    "CAST(doc_id % 40 AS STRING), '/?utm_source=feed&q=', "
    "CAST(doc_id % 7 AS STRING), '&utm_medium=mail#sec') "
    "WHEN 1 THEN concat('http://', source, '.blog.example.com:80/a/', "
    "CAST(doc_id % 40 AS STRING), '?fbclid=abc') "
    "WHEN 2 THEN concat('https://', source, '.example.com/b/', "
    "CAST(doc_id % 40 AS STRING), '/') "
    "ELSE concat('https://', source, '.example.com/b/', "
    "CAST(doc_id % 40 AS STRING), '?ref=tw') END"
)

_URL_DUCK = """
    CASE CAST(doc_id % 4 AS INT)
      WHEN 0 THEN 'HTTPS://WWW.' || source || '.News.CO.UK:443/Path/' ||
                  CAST(doc_id % 40 AS VARCHAR) || '/?utm_source=feed&q=' ||
                  CAST(doc_id % 7 AS VARCHAR) || '&utm_medium=mail#sec'
      WHEN 1 THEN 'http://' || source || '.blog.example.com:80/a/' ||
                  CAST(doc_id % 40 AS VARCHAR) || '?fbclid=abc'
      WHEN 2 THEN 'https://' || source || '.example.com/b/' ||
                  CAST(doc_id % 40 AS VARCHAR) || '/'
      ELSE 'https://' || source || '.example.com/b/' ||
           CAST(doc_id % 40 AS VARCHAR) || '?ref=tw'
    END
"""

# independent DuckDB implementation of the canonicalization contract
_DUCK_NORM_CTES = f"""
t AS (
  SELECT doc_id, source, n_chars, {_URL_DUCK} AS url FROM documents
),
n1 AS (
  SELECT *, regexp_replace(url, '#.*$', '') AS u1 FROM t
),
n2 AS (
  SELECT *, regexp_extract(u1, '^([A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*)', 1) AS head
  FROM n1
),
n3 AS (
  SELECT *, CASE WHEN head <> '' THEN lower(head) || substr(u1, length(head) + 1)
                 ELSE u1 END AS u2
  FROM n2
),
n4 AS (
  SELECT *, regexp_replace(
              regexp_replace(u2, '^(http://[^/:?#]+):80($|[/?#].*)', '\\1\\2'),
              '^(https://[^/:?#]+):443($|[/?#].*)', '\\1\\2') AS u3
  FROM n3
),
n5 AS (
  SELECT *,
         -- trailing PATH slash strips on the pre-query part only
         regexp_replace(regexp_replace(u3, '\\?.*$', ''),
                        '([^/])/$', '\\1') AS base,
         regexp_extract(u3, '^[^?]*\\?(.*)$', 1) AS q,
         list_filter(string_split(regexp_extract(u3, '^[^?]*\\?(.*)$', 1), '&'),
                     p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|ref)(=.*)?$')) AS kept
  FROM n4
),
canon AS (
  SELECT doc_id, source, n_chars, url,
         CASE WHEN q <> '' AND len(kept) > 0
              THEN base || '?' || array_to_string(kept, '&')
              ELSE base END AS norm_url
  FROM n5
),
hosted AS (
  SELECT *,
         lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://(?:[^/@?#]*@)?([^/:?#]+)', 1)) AS host
  FROM canon
),
domained AS (
  SELECT *,
         string_split(host, '.') AS hp,
         CASE
           WHEN regexp_matches(host, '^\\d+\\.\\d+\\.\\d+\\.\\d+$')
                OR len(string_split(host, '.')) <= 1 THEN host
           WHEN len(string_split(host, '.')) >= 3
                AND (string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1])
                    IN ('co.uk','org.uk','ac.uk','gov.uk','com.au','net.au','org.au',
                        'co.jp','ne.jp','or.jp','com.br','com.cn','com.mx','co.in',
                        'co.kr','com.tr')
             THEN string_split(host, '.')[-3] || '.' || string_split(host, '.')[-2]
                  || '.' || string_split(host, '.')[-1]
           ELSE string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1]
         END AS domain
  FROM hosted
)
"""

WEB_URL_ORACLE = f"""
WITH {_DUCK_NORM_CTES}
SELECT 'normalize' AS part, CAST(doc_id AS BIGINT) AS doc_id,
       norm_url AS s1, NULL AS s2, CAST(NULL AS BIGINT) AS n
FROM canon
UNION ALL
SELECT 'domain', CAST(doc_id AS BIGINT), domain, host, CAST(NULL AS BIGINT)
FROM domained
UNION ALL
SELECT 'quota', CAST(doc_id AS BIGINT), domain, NULL, CAST(n_chars AS BIGINT)
FROM (
  SELECT doc_id, domain, n_chars,
         row_number() OVER (PARTITION BY domain
                            ORDER BY n_chars DESC, doc_id ASC) AS rk
  FROM domained
) WHERE rk <= 3
UNION ALL
SELECT 'dedup', CAST(doc_id AS BIGINT), norm_url, NULL, CAST(n_chars AS BIGINT)
FROM (
  SELECT doc_id, norm_url, n_chars,
         row_number() OVER (PARTITION BY norm_url
                            ORDER BY n_chars DESC, doc_id ASC) AS rk
  FROM canon
) WHERE rk = 1
"""


@register_extended("web_url_suite", WEB_URL_ORACLE)
def q_web_url_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm import web

    d = _docs(spark, sf_dir).select(
        "doc_id", "source", "n_chars", F.expr(_URL_SPARK).alias("url")
    )
    norm = d.select(
        F.lit("normalize").alias("part"),
        F.col("doc_id").cast("long").alias("doc_id"),
        web.url_normalize(F.col("url")).alias("s1"),
        F.lit(None).cast("string").alias("s2"),
        F.lit(None).cast("long").alias("n"),
    )
    dom = d.select(
        F.lit("domain").alias("part"),
        F.col("doc_id").cast("long").alias("doc_id"),
        web.url_domain(F.col("url")).alias("s1"),
        web.url_host(F.col("url")).alias("s2"),
        F.lit(None).cast("long").alias("n"),
    )
    quota = web.domain_quota(
        d, k=3, order_by=[F.col("n_chars").desc(), F.col("doc_id").asc()]
    ).select(
        F.lit("quota").alias("part"),
        F.col("doc_id").cast("long").alias("doc_id"),
        web.url_domain(F.col("url")).alias("s1"),
        F.lit(None).cast("string").alias("s2"),
        F.col("n_chars").cast("long").alias("n"),
    )
    dedup = web.url_dedup(
        d, order_by=[F.col("n_chars").desc(), F.col("doc_id").asc()]
    ).select(
        F.lit("dedup").alias("part"),
        F.col("doc_id").cast("long").alias("doc_id"),
        web.url_normalize(F.col("url")).alias("s1"),
        F.lit(None).cast("string").alias("s2"),
        F.col("n_chars").cast("long").alias("n"),
    )
    return norm.unionByName(dom).unionByName(quota).unionByName(dedup)


# standalone canonicalization SELECT, nestable as a CTE body by other
# oracles (queries/suites.py text_analysis folds norm_url/domain into
# the driver gate through this)
WEB_NORM_SQL = f"WITH {_DUCK_NORM_CTES} SELECT doc_id, norm_url, host, domain FROM domained"
