"""Declarative data-quality validation (deequ-style constraint report).

A training-data pipeline gates every ingest batch on a constraint
report — null ratios, domain membership, key uniqueness, referential
integrity — before the batch is allowed into the corpus. The reference
has no explicit equivalent (its ingestion trusts the chain RPC), so
this is part of the pipeline-extension family.

Design (100 TB target):

* **One scan for all row-predicate constraints.** Every predicate
  constraint (not-null, range, set membership, regex, arbitrary
  boolean expression) compiles to a conditional-count expression in a
  SINGLE ``df.agg(...)`` — one pass over the fact table regardless of
  how many constraints are declared. The one-row result is unpivoted
  driver-free with ``explode(array(struct(...)))``.
* **Uniqueness** rides the same agg via ``count_distinct`` (Spark
  plans one expand + partial aggregation — still a single scan of the
  table; at extreme cardinality swap in the HLL hatch from
  operators/skew.py and treat the constraint as approximate).
* **Referential integrity** is one LEFT SEMI join per foreign key
  against the dimension (broadcast when small — the usual dim path),
  unioned into the same report.
* **Integer verdicts.** Metrics are (numerator, denominator) BIGINT
  pairs and the pass flag is the integer cross-multiplication
  ``100 * num >= min_pct * den`` — no float division anywhere, so the
  report is bit-identical across engines and shuffle orders.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Predicate:
    """Row-level predicate constraint: fraction of rows satisfying
    ``cond`` must reach ``min_pct`` percent."""

    name: str
    cond: Column
    min_pct: int = 100


@dataclass
class Unique:
    """Distinct-count constraint over a key column set. NULL-keyed
    rows participate: the metric is ``count_distinct(struct(cols))``
    (a struct with NULL fields is itself non-NULL, and NULL fields
    compare equal under DISTINCT), so duplicated NULL keys lower the
    uniqueness ratio instead of silently vanishing from the numerator
    — matching SQL ``COUNT(DISTINCT (a, b))`` row-value semantics."""

    name: str
    cols: list[str] = field(default_factory=list)
    min_pct: int = 100


@dataclass
class ForeignKey:
    """Every non-null value of ``col`` must exist in ``dim[dim_col]``."""

    name: str
    col: str
    dim: DataFrame
    dim_col: str
    min_pct: int = 100


def not_null(col: str, min_pct: int = 100) -> Predicate:
    return Predicate(f"not_null({col})", F.col(col).isNotNull(), min_pct)


def in_range(col: str, lo, hi, min_pct: int = 100) -> Predicate:
    return Predicate(
        f"range({col})", F.col(col).between(F.lit(lo), F.lit(hi)), min_pct
    )


def accepted_values(col: str, values, min_pct: int = 100) -> Predicate:
    return Predicate(
        f"accepted_values({col})", F.col(col).isin(list(values)), min_pct
    )


def matches(col: str, pattern: str, min_pct: int = 100) -> Predicate:
    """Anchored regex membership (the pattern must match the WHOLE
    value — both Spark rlike and DuckDB regexp_matches are search-style,
    so the caller's pattern is wrapped in ^...$)."""
    return Predicate(
        f"matches({col})", F.col(col).rlike(f"^(?:{pattern})$"), min_pct
    )


_REPORT_COLS = ["constraint", "metric_num", "metric_den", "passed"]


def check(df: DataFrame, constraints: list) -> DataFrame:
    """Evaluate constraints against ``df`` and return the report frame
    (constraint STRING, metric_num BIGINT, metric_den BIGINT,
    passed BOOLEAN) — one row per constraint, in declaration order
    preserved by the ``constraint`` label (the report itself is
    unordered, as any distributed result is)."""
    preds = [c for c in constraints if isinstance(c, Predicate)]
    uniqs = [c for c in constraints if isinstance(c, Unique)]
    fks = [c for c in constraints if isinstance(c, ForeignKey)]
    if len(preds) + len(uniqs) + len(fks) != len(constraints):
        bad = [
            c for c in constraints
            if not isinstance(c, (Predicate, Unique, ForeignKey))
        ]
        raise TypeError(f"unsupported constraint objects: {bad!r}")

    # Foreign keys fold into the SAME single-scan aggregation as the
    # predicates (optimization r14): a left join against the DISTINCT
    # dim keys (multiplicity-preserving, broadcast when small — the
    # usual dim path via Catalyst's own sizing) tags each row with a
    # match flag, and both FK metrics become conditional counts. The
    # previous shape ran TWO extra aggregation jobs per FK (a count of
    # the non-null values and a count over a semi join), each
    # re-scanning the fact table: 3 scans and 3 single-partition
    # funnels for the bench report, now 1 and 1.
    work = df
    for i, fk in enumerate(fks):
        keys = fk.dim.select(F.col(fk.dim_col).alias(f"__fkv{i}")).distinct()
        flags = keys.withColumn(f"__fkm{i}", F.lit(True))
        work = work.join(
            flags, F.col(fk.col) == F.col(f"__fkv{i}"), "left"
        ).drop(f"__fkv{i}")

    aggs = [F.count(F.lit(1)).cast("long").alias("__den")]
    for i, p in enumerate(preds):
        aggs.append(
            # coalesce: SUM over an empty relation is NULL; an empty
            # input must yield (0, 0, vacuously-passed) rows, not NULLs
            F.coalesce(F.sum(F.when(p.cond, 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias(f"__p{i}")
        )
    for i, u in enumerate(uniqs):
        aggs.append(
            # struct-wrapped so NULL-keyed rows count (see Unique)
            F.count_distinct(F.struct(*[F.col(c) for c in u.cols]))
            .cast("long")
            .alias(f"__u{i}")
        )
    for i, fk in enumerate(fks):
        nn = F.col(fk.col).isNotNull()
        aggs.append(
            F.coalesce(F.sum(F.when(nn, 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias(f"__fkd{i}")
        )
        aggs.append(
            # unmatched rows carry a NULL flag -> the when() falls
            # through to 0, exactly the semi join's exclusion
            F.coalesce(
                F.sum(F.when(nn & F.col(f"__fkm{i}"), 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias(f"__fkn{i}")
        )
    one = work.agg(*aggs)

    rows = []
    for i, p in enumerate(preds):
        rows.append((p.name, F.col(f"__p{i}"), F.col("__den"), p.min_pct))
    for i, u in enumerate(uniqs):
        rows.append((u.name, F.col(f"__u{i}"), F.col("__den"), u.min_pct))
    for i, fk in enumerate(fks):
        rows.append(
            (fk.name, F.col(f"__fkn{i}"), F.col(f"__fkd{i}"), fk.min_pct)
        )
    structs = [
        F.struct(
            F.lit(name).alias("constraint"),
            num.alias("metric_num"),
            den.alias("metric_den"),
            (num * 100 >= den * F.lit(min_pct)).alias("passed"),
        )
        for name, num, den, min_pct in rows
    ]
    if not structs:
        raise ValueError("no constraints given")
    report = one.select(
        F.explode(F.array(*structs)).alias("r")
    ).select("r.*")
    return report.select(*_REPORT_COLS)


def constraints_from_specs(spark, specs: list[dict]) -> list:
    """Build constraint objects from JSON-friendly spec dicts (the CLI
    seam). Types: not_null / range / accepted_values / matches /
    unique / expr (arbitrary SQL boolean) / fk (dim is a parquet
    path)."""
    out = []
    for s in specs:
        t = s["type"]
        pct = int(s.get("min_pct", 100))
        if t == "not_null":
            out.append(not_null(s["col"], pct))
        elif t == "range":
            out.append(in_range(s["col"], s["lo"], s["hi"], pct))
        elif t == "accepted_values":
            out.append(accepted_values(s["col"], s["values"], pct))
        elif t == "matches":
            out.append(matches(s["col"], s["pattern"], pct))
        elif t == "unique":
            out.append(Unique(s.get("name", f"unique({','.join(s['cols'])})"), s["cols"], pct))
        elif t == "expr":
            out.append(Predicate(s.get("name", s["sql"]), F.expr(s["sql"]), pct))
        elif t == "fk":
            dim = spark.read.parquet(s["dim"])
            out.append(
                ForeignKey(
                    s.get("name", f"fk({s['col']})"),
                    s["col"], dim, s["dim_col"], pct,
                )
            )
        else:
            raise ValueError(f"unknown constraint type: {t!r}")
    return out


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One-pass column profiler (the deequ/great-expectations
    ColumnProfile shape): for every column — row count, null count,
    exact distinct count, min/max (as strings, type-agnostic), and the
    most frequent value with its count. Long-form output
    (column, n_rows, n_null, n_distinct, min_val, max_val, top_val,
    top_n), one row per column.

    Plan: ALL per-column aggregates compile into ONE aggregation over
    a single scan (count_distinct partials fold map-side like any
    other aggregate); the mode per column costs one extra grouped
    aggregation per column over (value, count) pairs — each bounded by
    that column's cardinality, computed via a fixed-size union, never
    a corpus re-scan per metric. Deterministic: the top value maximizes
    (count, value), so ties break to the LARGEST string rendering.

    At 100 TB swap the exact ``count_distinct`` for
    ``approx_count_distinct`` and the exact mode for
    ``operators/topk.frequent_items`` — this exact form is the
    profile's oracle-able contract.
    """
    cols = columns or df.columns
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).alias(f"__ndv_{c}"),
            F.min(s).alias(f"__min_{c}"),
            F.max(s).alias(f"__max_{c}"),
        ]
    base = df.agg(*aggs)
    # Modes from ONE melted pass (optimization r14): explode each row
    # into (column, value) pairs, count per (column, value), take the
    # per-column (count, value) max. The previous per-column loop ran
    # a separate scan + aggregation + single-partition funnel PER
    # COLUMN (5 extra scans and 5 SinglePartition exchanges for the
    # bench profile). The explode multiplies rows by |cols| but each
    # pair is two narrow values and the partial aggregation collapses
    # map-side to per-partition (column, value) cardinality — same
    # shuffle bytes as the per-column aggs, one stage pipeline. A
    # column whose values are ALL NULL simply has no melted rows; the
    # left join below turns that into the same NULL top_val/top_n row
    # the old global-agg form produced.
    melted = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("column"),
                            F.col(c).cast("string").alias("__v"),
                        )
                        for c in cols
                    ]
                )
            ).alias("e")
        )
        .select("e.*")
        .filter(F.col("__v").isNotNull())
    )
    top = (
        melted.groupBy("column", "__v")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy("column")
        .agg(
            F.expr("max_by(__v, struct(__c, __v))").alias("top_val"),
            F.max(F.struct("__c", "__v")).getField("__c").alias("top_n"),
        )
    )
    # long form via ONE explode of the single stats row — a per-column
    # union would replan (and re-run) the global aggregate per branch
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__null_{c}").alias("n_null"),
                F.col(f"__ndv_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_val"),
                F.col(f"__max_{c}").alias("max_val"),
            )
            for c in cols
        ]
    )
    wide = base.select(
        F.col("__n").alias("n_rows"), F.explode(entries).alias("__p")
    ).select(
        F.col("__p.column").alias("column"),
        "n_rows",
        F.col("__p.n_null").alias("n_null"),
        F.col("__p.n_distinct").alias("n_distinct"),
        F.col("__p.min_val").alias("min_val"),
        F.col("__p.max_val").alias("max_val"),
    )
    return wide.join(top, "column", "left")
