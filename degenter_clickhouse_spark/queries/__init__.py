"""Query registry: every implemented operator from SURVEY.md §2 gets a
named (Spark builder, DuckDB oracle SQL) pair here. ``__spark_entry__``
re-exports this registry for the driver's correctness gate.

Determinism contract (the driver hash-compares values order-insensitively):

* Sums over doubles are order-sensitive in the last ulp, so every
  aggregated double is cast to DECIMAL first (exact, associative) and
  cast back to DOUBLE after aggregation — identical in Spark and DuckDB.
* Pointwise double arithmetic (no reduction) is IEEE-deterministic and
  emitted raw.
* Time buckets are emitted as epoch seconds (BIGINT) to sidestep
  timestamp-type/timezone mismatches between engines.
* Every computed column is aliased identically in both dialects.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle)
        return fn

    return deco


def load_registry() -> dict[str, QueryDef]:
    # import for side effect of filling REGISTRY
    from . import core, llm, parity2, parity3  # noqa: F401

    return REGISTRY
