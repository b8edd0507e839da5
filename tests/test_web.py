"""Web-corpus curation operators (llm/web.py): URL canonicalization
contract, registrable domains, block/allow filtering, per-domain
quotas, URL-level dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from degenter_clickhouse_spark.llm import web


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.n for r in df.select(web.url_normalize(F.col("url")).alias("n")).collect()]


def test_url_normalize_contract(spark):
    cases = {
        # scheme/host lowercased, path case kept
        "HTTPS://WWW.Example.COM/Path/A": "https://www.example.com/Path/A",
        # default ports dropped (both schemes), non-default kept
        "http://a.com:80/x": "http://a.com/x",
        "https://a.com:443": "https://a.com",
        "https://a.com:8443/x": "https://a.com:8443/x",
        "http://a.com:8080": "http://a.com:8080",
        # fragment stripped
        "https://a.com/x#frag": "https://a.com/x",
        # tracking params removed, survivor order kept, ? dropped when emptied
        "https://a.com/x?utm_source=f&q=1&utm_medium=m": "https://a.com/x?q=1",
        "https://a.com/x?fbclid=abc": "https://a.com/x",
        "https://a.com/x?ref=tw&gclid=1&a=2&b=3": "https://a.com/x?a=2&b=3",
        # ref= is tracking, but 'refresh' / prefix-collisions are NOT
        "https://a.com/x?refresh=1": "https://a.com/x?refresh=1",
        # one trailing slash collapses; root slash too
        "https://a.com/p/": "https://a.com/p",
        "https://a.com/": "https://a.com",
        # ... on the PATH only: query values keep their slashes, and a
        # path slash collapses even when a query follows
        "https://a.com/r?next=/home/": "https://a.com/r?next=/home/",
        "https://a.com/p/?q=1": "https://a.com/p?q=1",
        # query-value case preserved
        "https://a.com/x?Q=AbC": "https://a.com/x?Q=AbC",
        # IPv6 literal authority survives intact
        "https://[2001:DB8::1]:8080/x": "https://[2001:db8::1]:8080/x",
    }
    got = _norm(spark, list(cases))
    for (src, want), g in zip(cases.items(), got):
        assert g == want, (src, g, want)


def test_url_normalize_idempotent(spark):
    urls = [
        "HTTPS://WWW.Example.CO.UK:443/Path/9/?utm_source=x&id=3#s",
        "http://sub.a.com:80/b/?fbclid=1&x=2",
    ]
    once = _norm(spark, urls)
    twice = _norm(spark, once)
    assert once == twice


def test_url_domain_and_host(spark):
    cases = {
        "https://www.example.com/x": ("www.example.com", "example.com"),
        "https://a.b.news.co.uk/x": ("a.b.news.co.uk", "news.co.uk"),
        "http://user:pw@Sub.Site.ORG:8080/p": ("sub.site.org", "site.org"),
        "https://10.1.2.3:443/x": ("10.1.2.3", "10.1.2.3"),
        "https://[2001:db8::1]:8080/x": ("[2001:db8::1]", "[2001:db8::1]"),
        "https://localhost/x": ("localhost", "localhost"),
        "not a url": (None, None),
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = df.select(
        "url",
        web.url_host(F.col("url")).alias("h"),
        web.url_domain(F.col("url")).alias("d"),
    ).collect()
    for r in got:
        assert (r.h, r.d) == cases[r.url], r.url


def test_domain_filter_block_and_allow(spark):
    docs = spark.createDataFrame(
        [(1, "https://spam.biz/a"), (2, "https://good.com/b"),
         (3, "https://www.spam.biz/c"), (4, "https://news.co.uk/d")],
        "doc_id long, url string",
    )
    blocked = web.domain_filter(docs, ["spam.biz"], mode="block")
    assert sorted(r.doc_id for r in blocked.collect()) == [2, 4]
    allowed = web.domain_filter(docs, ["spam.biz"], mode="allow")
    assert sorted(r.doc_id for r in allowed.collect()) == [1, 3]
    import pytest

    with pytest.raises(ValueError):
        web.domain_filter(docs, ["x"], mode="nope")


def test_domain_quota_keeps_best_k(spark):
    docs = spark.createDataFrame(
        [(i, f"https://big.com/{i}", float(i)) for i in range(6)]
        + [(10, "https://small.com/a", 1.0)],
        "doc_id long, url string, quality double",
    )
    kept = web.domain_quota(
        docs, k=2, order_by=[F.col("quality").desc(), F.col("doc_id")]
    )
    assert sorted(r.doc_id for r in kept.collect()) == [4, 5, 10]


def test_url_dedup_collapses_canonical_variants(spark):
    docs = spark.createDataFrame(
        [
            (1, "https://a.com/p/?utm_source=x", 5.0),
            (2, "HTTPS://A.com:443/p", 9.0),      # same canonical URL, better
            (3, "https://a.com/p?x=1", 1.0),       # different (real param)
        ],
        "doc_id long, url string, quality double",
    )
    for salted in (False, True):
        kept = web.url_dedup(
            docs, order_by=[F.col("quality").desc(), F.col("doc_id")],
            skew_salted=salted,
        )
        assert sorted(r.doc_id for r in kept.collect()) == [2, 3], salted


def test_web_plans_are_scale_shaped(spark):
    """Plan guards: the whole URL family is map-shaped column work —
    no cartesian products anywhere; domain_filter's list side joins as
    a broadcast; quota/dedup shuffle once on their partition key."""
    docs = spark.createDataFrame(
        [(i, f"https://d{i % 5}.example.com/p/{i}", float(i)) for i in range(100)],
        "doc_id long, url string, quality double",
    )
    filt = web.domain_filter(docs, ["d1.example.com"], mode="block")
    plan = filt._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan, plan[:2000]
    for df in (
        web.domain_quota(docs, k=2),
        web.url_dedup(docs),
    ):
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in p
        assert "SinglePartition" not in p  # keyed window, never global


def test_salted_topk_equals_plain_window_on_skew(spark):
    """skew.salted_topk must return exactly the plain-window top-k on
    a hot-key fixture (one domain = 90% of rows), under several input
    partitionings — the equality is what licenses using it for hot
    web domains."""
    from degenter_clickhouse_spark.operators.skew import salted_topk

    rows = [(i, "hot.com", float((i * 37) % 1000)) for i in range(900)]
    rows += [(1000 + i, f"cold{i % 7}.net", float(i)) for i in range(100)]
    base = spark.createDataFrame(rows, "doc_id long, dom string, q double")
    order = [F.col("q").desc(), F.col("doc_id").asc()]
    from pyspark.sql.window import Window

    w = Window.partitionBy("dom").orderBy(*order)
    want = sorted(
        r.doc_id
        for r in base.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .collect()
    )
    for parts in (1, 7, 64):
        got = sorted(
            r.doc_id
            for r in salted_topk(base.repartition(parts), ["dom"], 5, order).collect()
        )
        assert got == want, parts
    # quota path through the salted form agrees with the plain form
    docs = base.select(
        "doc_id", F.concat(F.lit("https://"), "dom", F.lit("/p")).alias("url"), "q"
    )
    plain = sorted(r.doc_id for r in web.domain_quota(
        docs, k=5, order_by=order).collect())
    salted = sorted(r.doc_id for r in web.domain_quota(
        docs, k=5, order_by=order, skew_salted=True).collect())
    assert plain == salted == want
