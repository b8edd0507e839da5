"""Web-corpus curation operators: URL canonicalization, registrable
domains, domain block/allow filtering, per-domain quotas, and
URL-level dedup — the C4 / CCNet / RefinedWeb front half of a web
training-data pipeline, missing from the text-level family
(llm/text.py, llm/clean.py).

All pure column expressions (whole-stage codegen; zero UDFs), so a
100 TB crawl normalizes and filters map-side, and the only shuffles
are the per-domain/per-URL groupings that define the operators.
Regexes avoid lookaround so the DuckDB oracles (RE2) can implement
the same contract independently.

Canonicalization contract (documented, deterministic):

1. strip the fragment (``#...``);
2. lowercase the scheme and authority (host[:port]) — path/query keep
   their case (paths are case-sensitive on most origins);
3. drop default ports (``http://h:80`` -> ``http://h``,
   ``https://h:443`` -> ``https://h``);
4. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``,
   ``ref``), preserving the order of the survivors; an emptied query
   loses its ``?``;
5. strip ONE trailing slash from the PATH when it follows a non-slash
   character (``…/path/`` == ``…/path``; ``https://h/`` == ``https://h``)
   — never from a query value (``?next=/home/`` keeps its slash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Multi-part public suffixes the registrable-domain heuristic knows.
# A full public-suffix list is a runtime data file in production; the
# operator takes extra suffixes as an argument so the built-in set is
# a default, not a limit.
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "com.tr",
)

_TRACKING = "^(utm_[^=]*|fbclid|gclid|ref)(=.*)?$"


def url_normalize(url: Column) -> Column:
    """Canonical URL per the module contract. NULL-safe: NULL in,
    NULL out; a string with no scheme passes through steps that apply
    (fragment/query/slash) with the authority steps inert."""
    u = F.trim(url)
    # 1. fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 2. lowercase scheme://authority (everything before the first
    #    path/query separator after ://)
    head = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)", 1)
    rest = F.substr(u, F.length(head) + F.lit(1))
    u = F.when(head != "", F.concat(F.lower(head), rest)).otherwise(u)
    # 3. default ports (capture groups, no lookaround)
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80($|[/?#].*)", "$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443($|[/?#].*)", "$1$2")
    # 4. tracking params: rebuild the query from surviving pairs;
    # 5. one trailing PATH slash after a non-slash char — applied to
    #    the pre-query part only, so query values keep their slashes
    base = F.regexp_replace(
        F.regexp_replace(u, r"\?.*$", ""), r"([^/])/$", "$1"
    )
    query = F.regexp_extract(u, r"^[^?]*\?(.*)$", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING),
    )
    return F.when(
        (query != "") & (F.size(kept) > 0),
        F.concat(base, F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(base)


def url_host(url: Column) -> Column:
    """Lowercased host of an absolute URL (userinfo and port
    stripped); NULL when the value has no ``scheme://host`` shape.
    Bracketed IPv6 authorities (``https://[2001:db8::1]:8080/x``)
    return the bracketed literal intact — the generic pattern would
    stop at the first ``:`` and emit a truncated garbage host."""
    v6 = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/@?#]*@)?(\[[^\]]+\])", 1
    )
    h = F.lower(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1)
    )
    return F.when(v6 != "", F.lower(v6)).when(h != "", h)


def url_domain(
    url: Column, multi_suffixes: tuple[str, ...] = MULTI_SUFFIXES
) -> Column:
    """Registrable domain: the last two host labels, or the last THREE
    when the last two form a known multi-part public suffix
    (``a.b.co.uk`` -> ``b.co.uk``). IPs and single-label hosts pass
    through unchanged."""
    host = url_host(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    is_ip = host.rlike(r"^\d+\.\d+\.\d+\.\d+$") | host.startswith("[")
    return F.when(host.isNull(), F.lit(None).cast("string")).when(
        is_ip | (n <= 1), host
    ).when((n >= 3) & last2.isin(*multi_suffixes), last3).otherwise(last2)


def domain_filter(
    docs: DataFrame,
    domains: DataFrame | list[str],
    url_col: str = "url",
    mode: str = "block",
) -> DataFrame:
    """Drop (``mode='block'``) or keep only (``mode='allow'``) docs
    whose registrable domain is in ``domains`` — the
    blocklist/allowlist gate every web pipeline runs first. The list
    is dimension-sized by nature (curated), so it broadcasts; the
    corpus side stays map-shaped plus one broadcast join."""
    from ..operators.joins import dim_broadcast

    if isinstance(domains, list):
        spark = docs.sparkSession
        dl = spark.createDataFrame([(d,) for d in domains], "domain string")
    else:
        dl = domains.select(F.col(domains.columns[0]).alias("domain"))
    tagged = docs.withColumn("__dom", url_domain(F.col(url_col)))
    how = "left_anti" if mode == "block" else "left_semi"
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be block|allow, got {mode!r}")
    return tagged.join(
        dim_broadcast(dl.withColumnRenamed("domain", "__dom")), "__dom", how
    ).drop("__dom")


def domain_quota(
    docs: DataFrame,
    k: int,
    url_col: str = "url",
    order_by: list[Column] | None = None,
    id_col: str = "doc_id",
    skew_salted: bool = False,
) -> DataFrame:
    """Keep at most ``k`` docs per registrable domain, best-first
    (RefinedWeb's per-domain cap — stops any one site from dominating
    the corpus). Default order: ``id_col`` ascending; pass e.g.
    ``[F.col('quality').desc(), F.col('doc_id')]`` to keep the best.

    ``skew_salted=True`` routes through skew.salted_topk: a web crawl
    IS hot-domain-skewed by definition (the top domain can be a double
    digit percent of the corpus), and a plain per-domain window sorts
    every hot-domain row in ONE task. The salted form takes a local
    top-k per input slice first, so no task ever sorts more than a
    slice — identical output (order must break ties fully; the default
    order does)."""
    from pyspark.sql.window import Window

    from ..operators.skew import salted_topk

    order = order_by if order_by is not None else [F.col(id_col).asc()]
    tagged = docs.withColumn("__dom", url_domain(F.col(url_col)))
    if skew_salted:
        return salted_topk(tagged, ["__dom"], k, order).drop("__dom")
    w = Window.partitionBy("__dom").orderBy(*order)
    return (
        tagged.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= int(k))
        .drop("__dom", "__rk")
    )


def url_dedup(
    docs: DataFrame,
    url_col: str = "url",
    order_by: list[Column] | None = None,
    id_col: str = "doc_id",
    skew_salted: bool = False,
) -> DataFrame:
    """Exactly one doc per CANONICAL URL (url_normalize collisions
    collapse), best-first like domain_quota — the recrawl/variant
    dedup pass that runs before any content-level dedup. One shuffle
    on the normalized URL; ``skew_salted`` bounds the per-URL window
    the same way as domain_quota's (a hammered URL — a recrawled
    homepage — is the k=1 case of the same hot-key problem)."""
    from pyspark.sql.window import Window

    from ..operators.skew import salted_topk

    order = order_by if order_by is not None else [F.col(id_col).asc()]
    tagged = docs.withColumn("__u", url_normalize(F.col(url_col)))
    if skew_salted:
        return salted_topk(tagged, ["__u"], 1, order).drop("__u")
    w = Window.partitionBy("__u").orderBy(*order)
    return (
        tagged.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__u", "__rk")
    )
