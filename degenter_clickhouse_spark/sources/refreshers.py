"""Holders + token-metadata refresher jobs (VERDICT r8 #3).

The reference runs two background sweeps next to the indexer
(bin/start-jobs.js):

* ``jobs/holders-refresher.js:6-12,126-194`` — every 180 s pick the
  HOLDERS_BATCH_SIZE (4) stalest non-IBC, non-uzig tokens by their
  token_holders_stats.updated_at, page the LCD ``denom_owners``
  endpoint (≤ 30 pages per token per cycle), and land the full holder
  snapshot with DELETE+INSERT per token, then recompute the per-token
  stats row.
* ``jobs/meta-refresher.js:6-12,79-107`` — every 60 s pick 3 tokens
  with missing metadata, fetch LCD ``denoms_metadata`` (IBC denoms via
  the trace first, core/tokens.js:268-310), and field-merge the result
  into the tokens table (non-empty update wins).

Spark mapping: the LCD paging is inherently driver-side glue (tiny,
rate-limited HTTP) exactly like the reference's node loop; every
SET-shaped write goes through the engine's existing relational sinks —
``snapshot_overwrite`` (S9 delete+reinsert as dynamic partition
overwrite) for the holder snapshot and per-token stats row, and
``merge_token_metadata`` (B14 conditional merge) for metadata. Per
sweep the driver touches K tokens x ≤30 pages — dimension-sized by
construction; the cluster-side cost is one small partition overwrite
per token.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

from .pollers import LcdClient

# reference env defaults (jobs/holders-refresher.js:6-12,
# jobs/meta-refresher.js:6)
HOLDERS_BATCH_SIZE = 4
MAX_HOLDER_PAGES_PER_CYCLE = 30
META_BATCH_SIZE = 3


def fetch_denom_owners_all(
    lcd: LcdClient, denom: str, max_pages: int = MAX_HOLDER_PAGES_PER_CYCLE
) -> list[tuple[str, str]]:
    """Page ``denom_owners`` up to ``max_pages`` and return
    (address, balance_base_digits) pairs — last value wins on
    duplicate addresses and non-digit amounts clamp to '0', exactly
    the reference's addrMap semantics
    (jobs/holders-refresher.js:92-124)."""
    owners: dict[str, str] = {}
    next_key: str | None = None
    for _ in range(max_pages):
        page = lcd.denom_owners(denom, next_key)
        for it in page.get("denom_owners") or []:
            addr = it.get("address")
            if not addr:
                continue
            amt = str((it.get("balance") or {}).get("amount") or "0")
            owners[addr] = amt if amt.isdigit() else "0"
        next_key = (page.get("pagination") or {}).get("next_key")
        if not next_key:
            break
    return list(owners.items())


def token_meta_from_lcd(lcd: LcdClient, denom: str) -> dict:
    """name/symbol/display/exponent for one denom, the LCD slice of
    ``setTokenMetaFromLCD`` (core/tokens.js:268-310): exponent is the
    denom_unit matching ``display``; IBC denoms resolve through the
    trace first and default exponent 6; bare ``u<core>`` denoms derive
    symbol/display with exponent 0. (The reference's chain-registry /
    URI-payload enrichment layers are out of SURVEY scope.)"""
    lookup = denom
    is_ibc = isinstance(denom, str) and denom.startswith("ibc/")
    base_from_trace = None
    if is_ibc:
        try:
            trace = lcd.ibc_denom_trace(denom)
            base_from_trace = (trace.get("denom") or {}).get("base")
        except Exception:
            base_from_trace = None
        if base_from_trace:
            lookup = base_from_trace
    try:
        meta = (lcd.denoms_metadata(lookup) or {}).get("metadata") or {}
    except Exception:
        meta = {}
    name = meta.get("name") or None
    symbol = meta.get("symbol") or None
    display = meta.get("display") or None
    exponent = None
    if display:
        for du in meta.get("denom_units") or []:
            if du.get("denom") == display:
                exponent = du.get("exponent")
                break
    if is_ibc and not isinstance(exponent, int):
        exponent = 6
    if not is_ibc and exponent is None:
        m = re.match(r"^u([a-z0-9]+)$", lookup, re.IGNORECASE)
        core = m.group(1) if m else lookup
        symbol = symbol or core.upper()
        display = display or core.lower()
        exponent = 0
    if not display and is_ibc and base_from_trace:
        display = base_from_trace
    return {
        "denom": denom,
        "name": name,
        "symbol": symbol,
        "display": display,
        "exponent": None if exponent is None else int(exponent),
    }


def _ts(at: float) -> datetime:
    # naive UTC timestamp from the tick's injected logical time —
    # hermetic under test clocks (same convention as the FX job)
    return datetime.fromtimestamp(at, tz=timezone.utc).replace(tzinfo=None)


def refresh_holders_once(
    spark,
    lcd: LcdClient,
    token_id: int,
    denom: str,
    holders_path: str,
    stats_path: str,
    at: float,
    max_pages: int = MAX_HOLDER_PAGES_PER_CYCLE,
) -> int | None:
    """Sweep one token: land the fresh holder snapshot (S9 per-token
    delete+reinsert via dynamic partition overwrite) and its stats row
    (holders_count = positive balances). IBC denoms skip the sweep and
    only bump the stats timestamp with a NULL count
    (jobs/holders-refresher.js:85-89) so they rotate out of the
    stalest-K queue. Returns the count, or None for the IBC bump."""
    from pyspark.sql import functions as F

    from ..functions.parse import amount_decimal
    from ..operators.merge import snapshot_overwrite

    def write_stats(count: int | None) -> None:
        row = spark.createDataFrame(
            [(int(token_id), count, _ts(at))],
            "token_id long, holders_count long, updated_at timestamp",
        )
        snapshot_overwrite(row, stats_path, partition_col="token_id")

    if denom.startswith("ibc/"):
        write_stats(None)
        return None
    rows = fetch_denom_owners_all(lcd, denom, max_pages)
    snap = (
        spark.createDataFrame(
            [(int(token_id), a, b) for a, b in rows] or [],
            "token_id long, address string, balance_base string",
        )
        .select(
            "token_id",
            "address",
            amount_decimal(F.col("balance_base")).alias("balance_base"),
            F.lit(_ts(at)).alias("updated_at"),
        )
    )
    if rows:
        snapshot_overwrite(snap, holders_path, partition_col="token_id")
        count = snap.filter(F.col("balance_base") > 0).count()
    else:
        # zero owners: the reference DELETEs the token's holder rows
        # before inserting (jobs/holders-refresher.js delete+insert), so
        # an emptied denom must CLEAR its old snapshot partition — a
        # dynamic overwrite with zero rows writes nothing and would
        # leave stale holders feeding holder_stats()/security forever
        # (ADVICE r9)
        import os
        import shutil

        shutil.rmtree(
            os.path.join(holders_path, f"token_id={int(token_id)}"),
            ignore_errors=True,
        )
        count = 0
    write_stats(count)
    return count


def bump_holders_stats(
    spark, stats_path: str, token_id: int, at: float, count: int | None
) -> None:
    """Failure-path stats bump (ADVICE r9): a token whose LCD sweep
    errored keeps its previous holders_count but gets a fresh
    updated_at, so it rotates OUT of the stalest-K queue instead of
    wedging the sweep on every cycle — the reference's
    Promise.allSettled warn-and-continue / 501-bump semantics
    (jobs/holders-refresher.js:169-186)."""
    from ..operators.merge import snapshot_overwrite

    row = spark.createDataFrame(
        [(int(token_id), count, _ts(at))],
        "token_id long, holders_count long, updated_at timestamp",
    )
    snapshot_overwrite(row, stats_path, partition_col="token_id")


def holders_refresh_queue(tokens, stats, k: int = HOLDERS_BATCH_SIZE):
    """Stalest-K candidates (jobs/holders-refresher.js:211-226): all
    non-uzig, non-IBC tokens, LEFT JOINed to the stats rows, ordered
    by coalesce(updated_at, epoch) ascending — never-swept tokens go
    first. K is dimension-sized; the caller collects it."""
    from pyspark.sql import functions as F

    cand = tokens.filter(
        (F.col("denom") != "uzig") & (~F.col("denom").startswith("ibc/"))
    ).select("token_id", "denom")
    s = stats.select("token_id", "updated_at")
    return (
        cand.join(s, "token_id", "left")
        .withColumn(
            "last_h_upd",
            F.coalesce(F.col("updated_at"), F.lit("1970-01-01").cast("timestamp")),
        )
        .orderBy(F.col("last_h_upd").asc(), F.col("token_id").asc())
        .limit(int(k))
        .select("token_id", "denom")
    )


def refresh_meta_batch(spark, lcd: LcdClient, queue_rows) -> "object | None":
    """Fetch LCD metadata for the queued (token_id, denom) rows and
    return the updates frame for ``merge_token_metadata`` — or None
    when the queue is empty. Fetch failures for one denom degrade to
    an all-NULL update (a no-op under the conditional merge), matching
    the reference's per-token warn-and-continue
    (jobs/meta-refresher.js:25-27)."""
    if not queue_rows:
        return None
    metas = []
    for r in queue_rows:
        m = token_meta_from_lcd(lcd, r.denom)
        metas.append(
            (int(r.token_id), m["name"], m["symbol"], m["display"], m["exponent"],
             None, None, None)
        )
    # image_uri/website/twitter ride as NULLs (no-ops under the
    # conditional merge) so the frame satisfies merge_token_metadata's
    # full merge-column list; the reference fills them from the URI
    # payload / chain registry, which is out of SURVEY scope
    return spark.createDataFrame(
        metas,
        "token_id long, name string, symbol string, display string,"
        " exponent int, image_uri string, website string, twitter string",
    )
