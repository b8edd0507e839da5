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
(A production engine exposing Scala would register this as a Catalyst
resolution rule; the transformation is identical.)
"""

from __future__ import annotations

import re

# state table -> (latest view, key column the view is keyed by)
LATEST_VIEWS = {
    ("prices", "token_id"): ("latest_token_prices", "latest_price_zig"),
    ("prices", "pool_id"): ("latest_prices", "latest_price_zig"),
    ("pool_state", "pool_id"): ("latest_pool_state", None),
}

_PATTERN = re.compile(
    r"""\(\s*SELECT\s+(?P<col>[A-Za-z_][\w.]*)\s+
        FROM\s+(?P<table>[A-Za-z_]\w*)\s+
        WHERE\s+(?P<key>[A-Za-z_]\w*)\s*=\s*(?P<outer>[A-Za-z_][\w.]*)\s+
        ORDER\s+BY\s+(?P<ord>[A-Za-z_]\w*)\s+DESC\s+
        LIMIT\s+1\s*\)""",
    re.IGNORECASE | re.VERBOSE,
)


def rewrite_correlated_latest(sql: str) -> str:
    """Rewrite every reference-shaped correlated latest-row probe to a
    probe of the corresponding latest_* view. Unknown tables/keys are
    left untouched (and will fail in Spark exactly as before — the
    rewrite never changes semantics silently)."""

    def repl(m: re.Match) -> str:
        table, key = m.group("table").lower(), m.group("key").lower()
        view = LATEST_VIEWS.get((table, key))
        if view is None:
            return m.group(0)
        view_name, value_col = view
        col = m.group("col")
        # the view renames the price column; map it when known
        base_col = col.split(".")[-1].lower()
        if value_col is not None and base_col == "price_in_zig":
            col = value_col
        return (
            f"(SELECT {col} FROM {view_name} "
            f"WHERE {key} = {m.group('outer')})"
        )

    return _PATTERN.sub(repl, sql)
