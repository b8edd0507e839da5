"""Correlated latest-row rewrite (SURVEY.md §4, J5/J6).

The reference's leftover Postgres queries use correlated scalar
subqueries of the shape

    (SELECT price_in_zig FROM prices
     WHERE token_id = p.quote_token_id
     ORDER BY updated_at DESC LIMIT 1)

(api/routes/trades.js:295,410-416 — 8 sites). Spark 4 *can* execute
this (it decorrelates through a ranking window: sort + window + filter,
~4 shuffles of the full state table), but at scale it is the wrong
plan. The engine's architectural answer is the view layer
(plans/views): one ``max_by`` hash aggregation per state table
(single shuffle, dimension-sized output, broadcastable) joined instead
of probed per row — measured here as 1 exchange vs 4 exchanges + 3
sorts for the same query (tests/test_engine.py asserts the gap).

This module is the *compatibility shim* for user SQL written against
the reference: a narrow, pattern-guarded rewrite that redirects the
correlated probe at the pre-aggregated ``latest_*`` view and strips
the now-redundant ORDER BY/LIMIT — leaving a plain correlated equality
scalar subquery, which Catalyst decorrelates into a left outer join on
its own. It is intentionally NOT a general SQL optimizer: one rewrite
rule, for the one pattern the reference emits, applied before parsing.

Why a pre-parse shim exists at all: PySpark cannot author optimizer
rules — ``spark.experimental.extraOptimizations`` and
``spark.sql.extensions`` (``injectOptimizerRule``) both take JVM
``Rule[LogicalPlan]`` classes, which require compiled Scala/Java on the
driver classpath; there is no py4j path to subclass them from Python.

The COMPILED twin now exists: ``jvm/src/LatestRowRewrite.scala`` (built
by ``jvm/build_jvm.sh`` with the Scala compiler shipped inside
pyspark's jars) injects a post-hoc resolution rule that matches
``ScalarSubquery(Limit 1 over Sort(...))`` over the guarded state
tables on the RESOLVED plan and rewrites it to a ``max_by`` (DESC) or
``min_by`` (ASC, the O4 earliest-1 lookup) aggregate subquery —
uniform-direction multi-key sorts collapse to struct ordering, and a
null-ordering guard skips cases where a NULL key could win the sort
(min_by/max_by ignore null keys). Catalyst's own
RewriteCorrelatedScalarSubquery then plans the single-aggregation left
outer join. Sessions built by
``session.build_session`` load it automatically when the jar is
present; alias/derived-table variants this regex cannot see are
covered there (tests/test_catalyst_ext.py). This shim remains the
fallback for vanilla sessions (e.g. the driver's in
``__spark_entry__``), where extensions cannot be injected
post-construction, and stays pattern-complete for the reference's 8
call sites and their tested syntactic variants.
"""

from __future__ import annotations

import re

# (state table, probe key) -> (latest view, renamed value col, order col)
# (prices, token_id) targets the UNFILTERED per-token view: the
# reference's correlated probe (trades.js:295) scans every prices row,
# so redirecting it at the native-only latest_token_prices would
# silently change results whenever non-native rows exist.
LATEST_VIEWS = {
    ("prices", "token_id"): ("latest_token_prices_all", "latest_price_zig", "updated_at"),
    ("prices", "pool_id"): ("latest_prices", "latest_price_zig", "updated_at"),
    ("pool_state", "pool_id"): ("latest_pool_state", None, "updated_at"),
}

# Columns of each probed table (schemas.PRICES / schemas.POOL_STATE).
# An UNQUALIFIED RHS identifier that names one of these is ambiguous:
# SQL resolves it against the inner table first, so the probe is an
# uncorrelated row-wise comparison, not a correlated lookup — rewriting
# it against a view lacking that column would change semantics. Only a
# qualified outer reference (alias.col) or an identifier provably not
# an inner column may rewrite.
TABLE_COLUMNS = {
    "prices": {"token_id", "pool_id", "price_in_zig", "is_pair_native", "updated_at"},
    "pool_state": {"pool_id", "reserve_base_base", "reserve_quote_base", "updated_at"},
    # schemas.TRADES / schemas.POOLS (the earliest-row probe targets)
    "trades": {
        "pool_id", "pair_contract", "action", "direction", "tx_hash",
        "signer", "height", "msg_index", "created_at",
        "offer_asset_denom", "offer_amount_base", "ask_asset_denom",
        "ask_amount_base", "return_amount_base", "is_router",
        "reserve_asset1_denom", "reserve_asset1_amount",
        "reserve_asset2_denom", "reserve_asset2_amount",
    },
    "pools": {
        "pool_id", "pair_contract", "base_token_id", "quote_token_id",
        "pair_type", "is_uzig_quote", "lp_token_denom", "router_contract",
        "created_at", "created_height", "signer",
    },
}

_KW = r"WHERE|ORDER|GROUP|LIMIT|JOIN|ON|AND|OR"

# ASC / earliest-row probes (reference jobs/fasttrack-listener.js:122-137
# first-provide lookup, api/util/pool-select.js:5-15 first pool): no
# earliest_* view exists, so the shim rewrites the probe IN PLACE to the
# aggregate form  (SELECT min_by(col, ord) FROM t WHERE ...)  — the same
# transform the compiled Catalyst rule applies on resolved plans, which
# Spark then decorrelates into one aggregation + left outer join.
# Because the rewrite keeps the original table, extra WHERE conjuncts
# (e.g. AND action = 'provide') carry over verbatim.
#
# min_by SKIPS null ordering keys while ASC (default NULLS FIRST) would
# put them first, so the rewrite is only sound on order columns the
# engine's schemas declare NOT NULL (schemas.py: every ingest-derived
# height/msg_index/created_at/updated_at is populated by
# sources/blocks.py, never null):
NOT_NULL_ORDER_COLS = {
    "prices": {"updated_at"},
    "pool_state": {"updated_at"},
    "trades": {"height", "msg_index", "created_at"},
    "pools": {"created_at"},
}

_ASC_KEY = (
    r"(?:[A-Za-z_]\w*\s*\.\s*)?[A-Za-z_]\w*\s+ASC(?:\s+NULLS\s+LAST)?"
)

_PATTERN_ASC = re.compile(
    rf"""\(\s*SELECT\s+(?P<col>[A-Za-z_][\w.]*)\s+
        FROM\s+(?P<table>[A-Za-z_]\w*)
        (?:\s+(?:AS\s+)?(?P<alias>(?!(?:{_KW})\b)[A-Za-z_]\w*))?\s+
        WHERE\s+(?:(?P<kq>[A-Za-z_]\w*)\s*\.\s*)?(?P<key>[A-Za-z_]\w*)
        \s*=\s*(?P<outer>[A-Za-z_][\w.]*)
        (?P<extra>(?:\s+AND\s+[^()]*?)??)\s+
        ORDER\s+BY\s+(?P<order>{_ASC_KEY}(?:\s*,\s*{_ASC_KEY})*)\s+
        LIMIT\s+1(?:\s+OFFSET\s+0)?\s*\)""",
    re.IGNORECASE | re.VERBOSE,
)

_PATTERN = re.compile(
    rf"""\(\s*SELECT\s+(?P<col>[A-Za-z_][\w.]*)\s+
        FROM\s+(?P<table>[A-Za-z_]\w*)
        (?:\s+(?:AS\s+)?(?P<alias>(?!(?:{_KW})\b)[A-Za-z_]\w*))?\s+
        WHERE\s+(?:(?P<kq>[A-Za-z_]\w*)\s*\.\s*)?(?P<key>[A-Za-z_]\w*)
        \s*=\s*(?P<outer>[A-Za-z_][\w.]*)\s+
        ORDER\s+BY\s+(?:(?P<oq>[A-Za-z_]\w*)\s*\.\s*)?(?P<ord>[A-Za-z_]\w*)
        \s+DESC\s+
        LIMIT\s+1(?:\s+OFFSET\s+0)?\s*\)""",
    re.IGNORECASE | re.VERBOSE,
)


def rewrite_correlated_latest(sql: str) -> str:
    """Rewrite every reference-shaped correlated latest-row probe to a
    probe of the corresponding latest_* view. Covers the syntactic
    variants the reference's 8 sites and hand-edited copies of them
    produce: optional inner-table alias (``FROM prices pr`` /
    ``AS pr``) with alias-qualified columns, arbitrary whitespace and
    case, and a redundant ``OFFSET 0``. Unknown tables/keys/order
    columns — or probes whose equality is not actually correlated to
    an outer column — are left untouched (and run in Spark exactly as
    written: the rewrite never changes semantics silently)."""

    def repl(m: re.Match) -> str:
        table, key = m.group("table").lower(), m.group("key").lower()
        alias = (m.group("alias") or "").lower()
        inner_names = {table, alias} - {""}
        view = LATEST_VIEWS.get((table, key))
        if view is None:
            return m.group(0)
        view_name, value_col, order_col = view
        # the probe must order by the view's order column...
        if m.group("ord").lower() != order_col:
            return m.group(0)
        # ...order a column of the inner table...
        oq = (m.group("oq") or "").lower()
        if oq and oq not in inner_names:
            return m.group(0)
        # ...key on the inner table...
        kq = (m.group("kq") or "").lower()
        if kq and kq not in inner_names:
            return m.group(0)
        # ...and compare against an OUTER column (correlated), not a
        # constant inner self-reference
        outer = m.group("outer")
        outer_q = outer.split(".")[0].lower() if "." in outer else None
        if outer_q in inner_names:
            return m.group(0)
        # a bare RHS identifier that names a column of the probed table
        # resolves to the INNER scope — not correlated; leave it alone
        if outer_q is None and outer.lower() in TABLE_COLUMNS.get(table, set()):
            return m.group(0)
        col = m.group("col")
        col_q = col.split(".")[0].lower() if "." in col else None
        if col_q is not None and col_q not in inner_names:
            return m.group(0)
        base_col = col.split(".")[-1]
        # the view renames the price column; map it when known
        if value_col is not None and base_col.lower() == "price_in_zig":
            base_col = value_col
        return (
            f"(SELECT {base_col} FROM {view_name} "
            f"WHERE {key} = {outer})"
        )

    def repl_asc(m: re.Match) -> str:
        table = m.group("table").lower()
        alias = (m.group("alias") or "").lower()
        inner_names = {table, alias} - {""}
        safe_ords = NOT_NULL_ORDER_COLS.get(table)
        if safe_ords is None:
            return m.group(0)
        # every ORDER BY key must be a schema-NOT-NULL column of the
        # inner table (qualifier, if any, naming the inner alias)
        ord_cols: list[str] = []
        for part in m.group("order").split(","):
            toks = re.split(r"\s+", part.strip())
            name = toks[0]
            q = name.split(".")[0].lower() if "." in name else None
            base = name.split(".")[-1].lower()
            if (q and q not in inner_names) or base not in safe_ords:
                return m.group(0)
            ord_cols.append(name)
        # correlation guards, identical to the DESC path
        if (m.group("kq") or "").lower() not in (inner_names | {""}):
            return m.group(0)
        outer = m.group("outer")
        outer_q = outer.split(".")[0].lower() if "." in outer else None
        if outer_q in inner_names:
            return m.group(0)
        if outer_q is None and outer.lower() in TABLE_COLUMNS.get(table, set()):
            return m.group(0)
        col = m.group("col")
        col_q = col.split(".")[0].lower() if "." in col else None
        if col_q is not None and col_q not in inner_names:
            return m.group(0)
        ord_sql = (
            ord_cols[0]
            if len(ord_cols) == 1
            else "struct(" + ", ".join(ord_cols) + ")"
        )
        from_sql = m.group("table") + (f" {m.group('alias')}" if m.group("alias") else "")
        kq = m.group("kq")
        key_sql = (f"{kq}." if kq else "") + m.group("key")
        extra = m.group("extra") or ""
        return (
            f"(SELECT min_by({col}, {ord_sql}) FROM {from_sql} "
            f"WHERE {key_sql} = {outer}{extra})"
        )

    return _PATTERN_ASC.sub(repl_asc, _PATTERN.sub(repl, sql))
