"""Deterministic sampling hashes shared by the corpus-selection
operators (temperature_sample, weighted_sample, leakage_free_split).

The generator is the Knuth multiplicative hash u32(x) = (x * 2654435761)
mod 2^32 in MATHEMATICAL (floored / pmod) modulo semantics, mapped to a
uniform in [0, 1). DuckDB evaluates the plain formula exactly for any
BIGINT input because it promotes the product to INT128; a naive Spark
`(id * 2654435761) % 2^32` instead (a) overflows int64 for id above
~3.47e9 — silently wrapping, or throwing under ANSI mode — and (b) is
sign-preserving for negative ids, yielding u <= 0 whose ln() is NULL so
the row silently drops out of every sample. Exactly the 100 TB id
regime this engine targets (ADVICE r5).

``knuth_u32`` therefore reduces the id with pmod FIRST and splits the
low 32 bits into 16-bit halves so every intermediate stays below 2^49:

    x = pmod(id, 2^32); a = x >> 16; b = x & 0xffff
    u32 = pmod(pmod(a * M, 2^16) * 2^16 + b * M, 2^32)

which equals (id * M) mod 2^32 exactly for every int64 id (identity:
(a*2^16 + b)*M mod 2^32 = ((a*M mod 2^16)*2^16 + b*M) mod 2^32, and
pmod(id, 2^32) only drops multiples of the modulus). For 0 <= id < 2^31
— all driver tables — the value is bit-identical to the old naive
formula, so every existing oracle row is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KNUTH = 2654435761  # Knuth multiplicative-hash constant (TAOCP vol 3)
U32 = 2**32


def knuth_u32(col: Column) -> Column:
    """(col * 2654435761) mod 2^32 with pmod semantics, overflow-safe
    for the full BIGINT domain (see module docstring for the split)."""
    x = F.pmod(col.cast("long"), F.lit(U32))
    a = F.shiftright(x, 16)  # x < 2^32 and non-negative: logical shift
    b = x.bitwiseAND(F.lit(0xFFFF))
    hi = F.pmod(a * F.lit(KNUTH), F.lit(1 << 16)) * F.lit(1 << 16)
    return F.pmod(hi + b * F.lit(KNUTH), F.lit(U32))


def knuth_uniform(col: Column, centered: bool = False) -> Column:
    """Deterministic uniform in [0, 1) (or (0, 1) with ``centered``,
    for logs: u = (u32 + 0.5) / 2^32 is never zero)."""
    u = knuth_u32(col)
    if centered:
        return (u + F.lit(0.5)) / F.lit(float(U32))
    return u.cast("double") / F.lit(float(U32))
