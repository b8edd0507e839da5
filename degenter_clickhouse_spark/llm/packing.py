"""Sequence packing for LLM training pipelines: assign documents to
fixed-token-budget training sequences ("packs").

Production pipelines pack per input shard, in a deterministic document
order, with a greedy rule: append the next document to the current pack
unless it would overflow the budget, in which case start a new pack
(an oversized document gets a pack of its own). The scan is inherently
sequential *within* a shard, so the shard (``group_col``) is the unit
of parallelism — at 100 TB a corpus has millions of shards and the
stage is embarrassingly parallel; no shuffle beyond the group
repartition, no driver-side work.

The per-group scan runs as an Arrow-batched ``applyInPandas`` (a numpy
loop over one shard's doc list — thousands of rows, microseconds),
which is the correct Spark tool for order-dependent per-group state
that plain window functions cannot express (the running sum RESETS on
overflow, so it is not a cumsum).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hashing import knuth_uniform


def greedy_pack(
    docs: DataFrame,
    budget: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Greedy sequence packing per group.

    Input: one row per document with ``group_col`` (shard), ``order_col``
    (deterministic order within the shard), ``tokens_col`` (token count).
    Output: the same rows plus ``pack_id`` (0-based pack index within the
    group) and ``pack_pos`` (0-based position within the pack).
    """
    out_schema = T.StructType(
        [
            T.StructField(group_col, docs.schema[group_col].dataType),
            T.StructField(order_col, docs.schema[order_col].dataType),
            T.StructField(tokens_col, T.LongType()),
            T.StructField("pack_id", T.LongType()),
            T.StructField("pack_pos", T.LongType()),
        ]
    )

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, ignore_index=True)
        toks = pdf[tokens_col].to_numpy()
        pack_ids = [0] * len(toks)
        pack_pos = [0] * len(toks)
        acc = 0
        pid = 0
        pos = 0
        for i, t in enumerate(toks):
            if i > 0 and acc + t > budget:
                pid += 1
                acc = 0
                pos = 0
            acc += int(t)
            pack_ids[i] = pid
            pack_pos[i] = pos
            pos += 1
        pdf = pdf[[group_col, order_col, tokens_col]].copy()
        pdf[tokens_col] = pdf[tokens_col].astype("int64")
        pdf["pack_id"] = pack_ids
        pdf["pack_pos"] = pack_pos
        return pdf

    return docs.select(group_col, order_col, tokens_col).groupBy(group_col).applyInPandas(
        pack_group, schema=out_schema
    )


def pack_stats(packed: DataFrame, budget: int, group_col: str = "source") -> DataFrame:
    """Pack-level utilization: docs per pack, token fill ratio."""
    return packed.groupBy(group_col, "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tokens").alias("pack_tokens"),
        (F.sum("tokens") / F.lit(float(budget))).alias("fill_ratio"),
    )


def temperature_sample(
    docs: DataFrame,
    alpha: float = 0.5,
    target_frac: float = 0.5,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-scaled mixture downsampling: keep rates per source
    proportional to p_s^alpha (renormalized), the standard way to
    flatten a skewed source mixture for training (alpha=1 keeps the
    natural mix, alpha->0 approaches uniform-over-sources). Output has
    ~``target_frac`` of the corpus with source s expected at
    q_s = n_s^alpha / sum_t n_t^alpha of the sample.

    Fully declarative and map-shaped at 100 TB: one dimension-sized
    groupBy for the per-source counts, the rate table broadcast back,
    and a deterministic multiplicative-hash uniform per doc (no RNG
    state, reproducible across runs/partitionings). Rates are
    rounded and the rate-table sums DECIMAL-accumulated so the kept
    set is engine- and shuffle-order-exact (with alpha=0.5 the pow is
    sqrt — correctly rounded in IEEE 754, so cross-engine identical).
    """
    c = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    z = c.agg(
        F.sum(
            F.pow(F.col("__n").cast("double"), F.lit(alpha)).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("__z"),
        F.sum("__n").alias("__total"),
    )
    rates = c.crossJoin(F.broadcast(z)).select(
        group_col,
        F.least(
            F.lit(1.0),
            F.round(
                F.pow(F.col("__n").cast("double"), F.lit(alpha))
                / F.col("__z")
                * (F.lit(target_frac) * F.col("__total"))
                / F.col("__n"),
                9,
            ),
        ).alias("keep_rate"),
    )
    u = knuth_uniform(F.col(id_col))
    return (
        docs.join(F.broadcast(rates), group_col)
        .withColumn("__u", u)
        .filter(F.col("__u") < F.col("keep_rate"))
        .drop("__u")
    )


def corpus_order(
    docs: DataFrame,
    weights: dict[str, int],
    group_col: str = "source",
    order_col: str = "doc_id",
    default_weight: int = 1,
) -> DataFrame:
    """Deterministic weighted interleave — the final training-order
    step: a source with weight w contributes w consecutive slots per
    cycle, so the mixture ratio is exact over any long window and the
    order is fully reproducible (integer math only, no RNG).

    Scale shape: the global training position is CLOSED-FORM, not a
    global window. A row's position in the (cycle, source, slot) order
    is the number of rows with a strictly smaller key, and that count
    is pure arithmetic over the per-source (count, weight) table:

        position(C, S, L) = sum_s min(n_s, C * w_s)            # earlier cycles
                          + sum_{s < S} clamp(n_s - C*w_s, 0, w_s)  # this cycle
                          + L                                  # this source

    The (count, weight) table is dimension-sized — one row per corpus
    source — so it is collected once and folded into literal column
    arithmetic; no row of corpus data ever crosses a single-partition
    exchange (a ``row_number`` over an unpartitioned window would force
    exactly that — Spark's WindowExec requires one task when there is
    no partitionBy, the definitive 100 TB scale-killer). The only
    remaining shuffle is the within-source rank, partitioned on
    ``group_col``; for a corpus whose single largest source outgrows a
    partition, pre-assign the within-source ordinal at ingest and feed
    it in as ``order_col`` densely numbered, skipping that window too.
    """
    w_expr = None
    for src, w in weights.items():
        base = F.when(F.col(group_col) == src, F.lit(int(w)))
        w_expr = base if w_expr is None else w_expr.when(
            F.col(group_col) == src, F.lit(int(w))
        )
    w_expr = (
        w_expr.otherwise(F.lit(int(default_weight)))
        if w_expr is not None
        else F.lit(int(default_weight))
    )
    from pyspark.sql.window import Window

    rn = F.row_number().over(
        Window.partitionBy(group_col).orderBy(F.col(order_col).asc())
    )
    ordered = (
        docs.withColumn("__w", w_expr)
        .withColumn("__rn", rn - 1)
        .withColumn("__cycle", (F.col("__rn") / F.col("__w")).cast("long"))
        .withColumn("__slot", F.col("__rn") % F.col("__w"))
    )
    # dimension-sized driver fold: one (source, count) row per source
    counts = {
        r["s"]: int(r["n"])
        for r in docs.groupBy(F.col(group_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    cycle = F.col("__cycle")
    before_cycles = F.lit(0).cast("long")
    earlier_in_cycle = F.lit(0).cast("long")
    for s, n_s in counts.items():
        w_s = int(weights.get(s, default_weight))
        # rows of source s consumed by cycles strictly before C
        before_cycles = before_cycles + F.least(
            F.lit(n_s).cast("long"), cycle * F.lit(w_s)
        )
        # rows of a lexicographically-earlier source inside cycle C
        in_cycle = F.least(
            F.greatest(F.lit(n_s) - cycle * F.lit(w_s), F.lit(0)), F.lit(w_s)
        ).cast("long")
        earlier_in_cycle = earlier_in_cycle + F.when(
            F.lit(s) < F.col(group_col), in_cycle
        ).otherwise(F.lit(0).cast("long"))
    pos = before_cycles + earlier_in_cycle + F.col("__slot")
    return ordered.select(
        F.col(order_col), F.col(group_col), pos.cast("long").alias("position")
    )


def weighted_sample(
    docs: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    A-ES), derandomized: each row gets key = ln(u) / w where u is the
    deterministic multiplicative-hash uniform of its id (the
    temperature_sample generator) and w its weight; the k LARGEST keys
    are the sample — inclusion probability proportional to weight,
    identical sample on every run/partitioning/engine. Rows with
    w <= 0 never qualify. The key is pointwise (hash -> ln -> divide,
    rounded to 9 like every transcendental in this engine) and the
    selection is one TakeOrderedAndProject — no shuffle beyond the
    bounded top-k merge. Output: (id, weight, es_key), best-first
    ties by id.

    The uniform is the shared overflow-safe Knuth hash
    (functions/hashing.py): valid for NEGATIVE and > 2^31 ids too —
    the naive int64 formula either made u <= 0 (ln -> NULL, row
    silently unsampleable) or overflowed vs the INT128-promoting
    oracle (ADVICE r5)."""
    u = knuth_uniform(F.col(id_col), centered=True)
    key = F.round(F.log(u) / F.col(weight_col).cast("double"), 9)
    return (
        docs.where(F.col(weight_col) > 0)
        .select(
            F.col(id_col),
            F.col(weight_col).alias("weight"),
            key.alias("es_key"),
        )
        .orderBy(F.col("es_key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def budget_mix(
    docs: DataFrame,
    budgets: dict[str, int],
    token_col: str = "n_tokens",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budget corpus mixing: for each source, keep a reproducible
    subset whose token total stays within that source's budget — the
    "2B tokens web + 1B tokens code" recipe of real pretraining mixes.

    Within a source, docs are ordered by (knuth_u32(id), id) — a
    deterministic shuffle, so the kept prefix is an unbiased sample
    with no RNG state — and kept while the INCLUSIVE running token sum
    stays <= budget (first-fit prefix; the first doc over budget and
    everything after it drop). Sources absent from ``budgets`` are
    dropped entirely.

    One shuffle total (the per-source window); the budget table is a
    literal CASE expression, not a join. Integer cumsums — bit-exact
    across engines and shuffle orders. Output: (id, source, tokens,
    cum_tokens).
    """
    from pyspark.sql import Window

    from ..functions.hashing import knuth_u32

    if not budgets:
        raise ValueError("budgets must name at least one source")
    w = (
        Window.partitionBy(source_col)
        .orderBy(knuth_u32(F.col(id_col)), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget = None
    for src, b in sorted(budgets.items()):
        cond = F.col(source_col) == src
        budget = (
            F.when(cond, int(b))
            if budget is None
            else budget.when(cond, int(b))
        )
    budget = budget.otherwise(F.lit(0))
    out = docs.select(
        F.col(id_col),
        F.col(source_col),
        F.col(token_col).cast("long").alias("tokens"),
    ).withColumn("cum_tokens", F.sum("tokens").over(w).cast("long"))
    return out.filter(F.col("cum_tokens") <= budget)
