"""Event-sequence pattern matching (ClickHouse ``sequenceCount`` /
``sequenceMatch`` parity — SURVEY.md §2.5 aggregate-family extension).

The reference's analytics layer leans on ClickHouse behavioral
aggregates; ``windowFunnel`` is covered by ``queries/stats_ext.
q_window_funnel``. This module adds the chain-pattern siblings:

* ``sequence_count`` — how many NON-OVERLAPPING occurrences of the
  event chain ``(?1)(?2)...(?k)`` (in strict timestamp order, other
  events freely interleaved) each key produced. Equivalent to
  ClickHouse ``sequenceCount('(?1)(?2)...')(ts, cond1, ..., condk)``
  under its greedy left-to-right scan.
* ``sequence_match`` — boolean: at least one full chain
  (``sequenceMatch`` with the same pattern).

Spark-first shape: ClickHouse implements these as a per-group state
machine inside the aggregate. Here each event is reduced to a step
FLAG ARRAY (which of the k conditions it satisfies — evaluated as
plain column expressions while the data is still flat, so predicate
pushdown/pruning stay intact), then each key's events collect into
ONE time-sorted array and ``aggregate()`` folds the greedy automaton
(state = struct<stage, cnt>) left-to-right in pure column
expressions — no UDF, no window function; the only shuffle is the
groupBy on the key. The per-key series must fit an array cell, which
matches the serving-layer regime (the reference caps per-entity
series; unbounded keys belong to the streaming path's carried-state
pattern in ``streaming/stateful.py``).

Determinism: ties on the timestamp are broken by ``tiebreak`` inside
``array_sort`` (struct comparison is lexicographic), so the fold
order — and therefore the count — is identical across shuffle orders
and engines.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _step_flags(steps: Sequence[Column]) -> Column:
    """Boolean array column: element i true iff the row satisfies
    ``steps[i]`` — evaluated while the data is still flat so pushdown
    stays intact; the fold later indexes it by the automaton stage."""
    return F.array(*[c.cast("boolean") for c in steps])


def sequence_count(
    df: DataFrame,
    key: str,
    ts: str,
    steps: Sequence[Column],
    tiebreak: str | None = None,
    out: str = "n_matches",
    within: float | None = None,
    strict_order: bool = False,
) -> DataFrame:
    """Per-``key`` count of non-overlapping ``steps`` chains in ``ts``
    order → (key, out, n_events). Greedy automaton: an event matching
    the currently-expected step advances the chain; completing step k
    increments the count and rearms at step 1 (ClickHouse
    ``sequenceCount`` semantics for ``(?1)(?2)...(?k)`` patterns).

    ``within`` adds the time-gated pattern form (ClickHouse
    ``(?1)(?t<=W)(?2)...`` chains / ``windowFunnel`` windows): a chain
    must complete within ``within`` seconds of its FIRST step. An
    armed chain that expires can no longer advance; the next event
    matching step 1 restarts a fresh chain (events that only match
    later steps cannot revive it). Deterministic — same total order,
    same fold.

    ``strict_order`` mirrors ClickHouse ``windowFunnel('strict_order')``:
    while a chain is armed (stage > 0), an event that does not match
    the expected step INTERRUPTS it — the chain resets to stage 1 if
    the interrupting event matches step 1 (it starts a fresh chain),
    else to stage 0. Default (False) is the subsequence semantics:
    unrelated events interleave freely. ``within`` and
    ``strict_order`` compose (expiry is checked first).
    """
    k = len(steps)
    if k == 0:
        raise ValueError("sequence_count needs at least one step condition")
    cols = [F.col(ts).alias("__t")]
    if tiebreak is not None:
        cols.append(F.col(tiebreak).alias("__tb"))
    cols.append(_step_flags(steps).alias("__m"))
    if within is not None:
        if dict(df.dtypes)[ts].startswith("timestamp"):
            tn = F.unix_micros(F.col(ts).cast("timestamp")) / F.lit(1e6)
        else:
            tn = F.col(ts).cast("double")
        cols.append(tn.alias("__tn"))
    ev = df.select(F.col(key), F.struct(*cols).alias("__e"))
    arr = ev.groupBy(key).agg(
        F.array_sort(F.collect_list("__e")).alias("__s")
    )

    if within is None:
        zero = F.struct(
            F.lit(0).cast("int").alias("stage"),
            F.lit(0).cast("int").alias("cnt"),
        )

        def fold(acc: Column, x: Column) -> Column:
            hit = F.coalesce(
                F.element_at(x["__m"], acc["stage"] + 1), F.lit(False)
            )
            completed = F.struct(
                F.lit(0).cast("int").alias("stage"),
                (acc["cnt"] + 1).cast("int").alias("cnt"),
            )
            advanced = F.struct(
                (acc["stage"] + 1).cast("int").alias("stage"),
                acc["cnt"].alias("cnt"),
            )
            base = F.when(
                hit, F.when(acc["stage"] == k - 1, completed).otherwise(advanced)
            )
            if strict_order:
                hit0 = F.coalesce(F.element_at(x["__m"], 1), F.lit(False))
                interrupted = F.struct(
                    F.when(hit0, F.lit(1 if k > 1 else 0))
                    .otherwise(F.lit(0))
                    .cast("int")
                    .alias("stage"),
                    (acc["cnt"] + F.when(hit0 & F.lit(k == 1), 1).otherwise(0))
                    .cast("int")
                    .alias("cnt"),
                )
                return base.when(acc["stage"] > 0, interrupted).otherwise(acc)
            return base.otherwise(acc)

    else:
        w = F.lit(float(within))
        zero = F.struct(
            F.lit(0).cast("int").alias("stage"),
            F.lit(0).cast("int").alias("cnt"),
            F.lit(0.0).alias("start"),
        )

        def fold(acc: Column, x: Column) -> Column:
            hit = F.coalesce(
                F.element_at(x["__m"], acc["stage"] + 1), F.lit(False)
            )
            hit0 = F.coalesce(F.element_at(x["__m"], 1), F.lit(False))
            valid = (acc["stage"] == 0) | (x["__tn"] - acc["start"] <= w)
            start_if_arming = F.when(
                acc["stage"] == 0, x["__tn"]
            ).otherwise(acc["start"])
            completed = F.struct(
                F.lit(0).cast("int").alias("stage"),
                (acc["cnt"] + 1).cast("int").alias("cnt"),
                F.lit(0.0).alias("start"),
            )
            advanced = F.struct(
                (acc["stage"] + 1).cast("int").alias("stage"),
                acc["cnt"].alias("cnt"),
                start_if_arming.alias("start"),
            )
            restarted = (  # dead chain; this event arms a fresh one
                F.struct(
                    F.lit(1 if k > 1 else 0).cast("int").alias("stage"),
                    (acc["cnt"] + (1 if k == 1 else 0)).cast("int").alias("cnt"),
                    x["__tn"].alias("start"),
                )
            )
            chain = F.when(
                hit & valid,
                F.when(acc["stage"] == k - 1, completed).otherwise(advanced),
            ).when(~valid & hit0, restarted)
            if strict_order:
                interrupted = F.struct(
                    F.when(hit0, F.lit(1 if k > 1 else 0))
                    .otherwise(F.lit(0))
                    .cast("int")
                    .alias("stage"),
                    acc["cnt"].alias("cnt"),
                    F.when(hit0, x["__tn"]).otherwise(F.lit(0.0)).alias("start"),
                )
                chain = chain.when(acc["stage"] > 0, interrupted)
            return chain.otherwise(acc)

    return arr.select(
        F.col(key),
        F.aggregate("__s", zero, fold)["cnt"].cast("long").alias(out),
        F.size("__s").cast("long").alias("n_events"),
    )


def sequence_match(
    df: DataFrame,
    key: str,
    ts: str,
    steps: Sequence[Column],
    tiebreak: str | None = None,
    out: str = "matched",
) -> DataFrame:
    """Per-``key`` boolean — at least one full chain (ClickHouse
    ``sequenceMatch``). Same single-shuffle fold; the count is simply
    thresholded."""
    c = sequence_count(df, key, ts, steps, tiebreak=tiebreak, out="__n")
    return c.select(
        F.col(key), (F.col("__n") > 0).alias(out), "n_events"
    )


def sequence_next_node(
    df: DataFrame,
    key: str,
    ts: str,
    node: str,
    steps: Sequence[Column],
    tiebreak: str | None = None,
    out: str = "next_node",
) -> DataFrame:
    """ClickHouse ``sequenceNextNode('forward', 'first_match')``: per
    ``key``, the ``node`` value of the event immediately AFTER the
    first CONSECUTIVE occurrence of the ``steps`` chain in ``ts``
    order ("what do users do right after view -> click?"). Keys whose
    first match is the tail of their series (nothing follows) or that
    never match are absent from the result.

    Spark-first shape: consecutive matching needs no automaton — a
    chain starting at position i exists iff ``steps[j]`` holds at
    ``lead(j)`` for all j, so the whole operator is k ``lead()``
    columns over ONE per-key window plus a min-position argmin. The
    only shuffle is the window's key partitioning; ties on ``ts``
    break on ``tiebreak`` for cross-engine determinism.
    """
    from pyspark.sql.window import Window

    k = len(steps)
    if k == 0:
        raise ValueError("sequence_next_node needs at least one step")
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    flags = _step_flags(steps)
    d = df.withColumn("__m", flags)
    cond = F.lit(True)
    for j in range(k):
        cond = cond & F.coalesce(
            F.element_at(F.lead("__m", j).over(w), j + 1), F.lit(False)
        )
    d = d.withColumn("__hit", cond).withColumn(
        "__next", F.lead(F.col(node), k).over(w)
    )
    hits = d.filter(F.col("__hit") & F.col("__next").isNotNull()).select(
        F.col(key),
        F.struct(*([F.col(ts).alias("__t")]
                   + ([F.col(tiebreak).alias("__tb")] if tiebreak else [])
                   + [F.col("__next").alias("__n")])).alias("__h"),
    )
    return hits.groupBy(key).agg(
        F.min("__h").alias("__first")
    ).select(key, F.col("__first.__n").alias(out))
