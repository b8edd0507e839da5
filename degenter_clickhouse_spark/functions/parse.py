"""Ingest-side scalar parsing expressions (SURVEY.md §2.2 P1-P13).

All are pure column expressions (JVM-side, codegen-friendly) except the
base64 round-trip heuristic P1, which needs a Python UDF and lives in
sources/blocks.py where it is applied once at ingest, never in the
query hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DIGITS = "^[0-9]+$"


def sha256_hex_upper(col: Column) -> Column:
    """P2 (core/parse.js:20): uppercase hex SHA-256 — tx-hash derivation."""
    return F.upper(F.sha2(col, 256))


def digits_or_null(col: Column) -> Column:
    """P5 (core/parse.js:19): keep only all-digit strings. The rlike
    guard keeps the later cast ANSI-safe."""
    return F.when(col.rlike(DIGITS), col)


def amount_decimal(col: Column) -> Column:
    """Raw on-chain amount string -> Decimal(38,0), OVERFLOW -> NULL.

    The reference stores amounts as NUMERIC(78,0) strings and clamps
    its ClickHouse DDL to Decimal(38,0) (SURVEY §1.2,
    jobs/token-security.js:20-21) — a >38-digit value simply cannot be
    stored there. Spark 4 runs ANSI mode, where a plain cast would
    ABORT THE JOB on the first oversized amount (one malformed event
    killing a 100 TB ingest); try_cast makes the un-storable value
    NULL instead — the same row-level outcome as the reference's
    digitsOrNull invalid-numeric convention, asserted by a hypothesis
    property test (tests/test_properties.py)."""
    return col.try_cast("decimal(38,0)")


def parse_asset(col: Column) -> Column:
    """P6 (core/parse.js:38-47): '123udenom' -> struct(amount_base, denom).
    Amount must be leading digits; denom is the rest. Amounts past
    Decimal(38,0) become NULL (``amount_decimal``) with the asset's
    list position preserved."""
    amount = F.regexp_extract(col, r"^(\d+)", 1)
    denom = F.regexp_extract(col, r"^\d+([a-zA-Z0-9.\-_/]+)$", 1)
    return F.when(
        col.rlike(r"^\d+[a-zA-Z0-9.\-_/]+$"),
        F.struct(
            amount_decimal(amount).alias("amount_base"),
            denom.alias("denom"),
        ),
    )


def parse_assets_list(col: Column) -> Column:
    """P6: '123denom,456denom2' -> array<struct(amount_base, denom)>."""
    return F.filter(
        F.transform(F.split(col, ","), parse_asset),
        lambda s: s.isNotNull(),
    )


def parse_reserves_kv(col: Column) -> Column:
    """P7 (core/parse.js:48-60): 'denom:amt,denom2:amt2' ->
    array<struct(denom, amount_base)>; amount must be all digits."""
    pair = lambda s: F.when(  # noqa: E731
        s.rlike(r"^[a-zA-Z0-9.\-_/]+:\d+$"),
        F.struct(
            F.regexp_extract(s, r"^([a-zA-Z0-9.\-_/]+):", 1).alias("denom"),
            amount_decimal(F.regexp_extract(s, r":(\d+)$", 1)).alias(
                "amount_base"
            ),
        ),
    )
    return F.filter(F.transform(F.split(col, ","), pair), lambda s: s.isNotNull())


def normalize_pair(pair: Column, quote_denom: str = "uzig") -> Column:
    """P9 (core/parse.js:34,71-76): split 'a-b' on the FIRST '-'; if the
    privileged quote denom is on the base side, swap so it quotes."""
    base = F.substring_index(pair, "-", 1)
    rest = F.regexp_replace(pair, r"^[^-]*-", "")  # after the FIRST '-'
    swap = base == F.lit(quote_denom)
    return F.struct(
        F.when(swap, rest).otherwise(base).alias("base_denom"),
        F.when(swap, base).otherwise(rest).alias("quote_denom"),
    )


def classify_direction(offer_denom: Column, quote_denom: Column) -> Column:
    """P10 (core/parse.js:35): offering the quote asset == buying base."""
    return F.when(offer_denom == quote_denom, "buy").otherwise("sell")


def to_display(amount_base: Column, exponent: Column) -> Column:
    """P11 (core/parse.js:36): base units -> display units, exponent
    defaulting to 6 like the reference's uzig hardcode."""
    return amount_base.cast("double") / F.pow(F.lit(10.0), F.coalesce(exponent, F.lit(6)))


def normalize_twitter_handle(col: Column) -> Column:
    """§2.9 handle normalizer (phase3schema.sql:415-431): strip URL
    prefixes/query strings and a leading '@', lowercase the handle."""
    out = F.regexp_replace(col, r"^https?://(www\.)?(twitter\.com|x\.com)/", "")
    out = F.regexp_replace(out, r"[?#].*$", "")
    out = F.regexp_replace(out, r"^@", "")
    out = F.regexp_replace(out, r"/+$", "")
    return F.lower(out)


def nat_key_id(col: Column) -> Column:
    """Deterministic 64-bit id from a natural key — the reference's
    cityHash64 trick (core/pools.js:14-19). xxhash64 here: same
    contract (stable, collision-negligible), embarrassingly parallel."""
    return F.xxhash64(col)
