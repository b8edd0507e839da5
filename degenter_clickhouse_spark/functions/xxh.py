"""Driver-side XXH64 — bit-identical to Spark's ``xxhash64`` on string
input (XXH64 over the UTF-8 bytes, seed 42, as specified by the public
xxHash format: https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md).

Why: several index probes need the hash **bucket literals** of a small
set of driver-known keys (query terms) so planning can prune the index
partitions with a static IN filter. Computing them used to require a
tiny Spark job per search call (createDataFrame -> xxhash64 -> collect)
— one extra sequential driver round-trip on every probe. The hash is a
pure, stable function, so evaluating it driver-side removes that job.
Cross-engine equality with Spark's ``xxhash64`` is pytest-asserted for
ASCII, multibyte UTF-8, and long strings (tests/test_catalyst_ext.py).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def xxhash64(data: bytes | str, seed: int = 42) -> int:
    """XXH64 of ``data`` with Spark's default seed 42, as a SIGNED
    64-bit int (matching Spark's LongType output)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def pmod_bucket(key: str, n_buckets: int, seed: int = 42) -> int:
    """Driver-side twin of ``pmod(xxhash64(col), n_buckets)``."""
    h = xxhash64(key, seed)
    return h % n_buckets if h >= 0 else (h % n_buckets + n_buckets) % n_buckets
