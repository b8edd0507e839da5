"""Distributed BPE merge fitting — tokenizer training over a corpus.

Classic byte-pair-encoding trains by repeatedly merging the most
frequent adjacent symbol pair. The distributed shape that makes this
tractable at corpus scale is the standard one: BPE statistics depend
only on the WORD FREQUENCY table, so the corpus is touched exactly
once (one explode + groupBy down to distinct words with counts), and
every merge iteration then runs over the vocabulary-sized word table —
a pair-count aggregate (explode adjacent pairs weighted by word count,
one shuffle on the pair key) plus a map-only fold that applies the
winning merge left-to-right non-overlapping inside each word's symbol
array. No Python touches row data; the only driver traffic is the
single winning pair per iteration (the merge table is the tokenizer
artifact itself, inherently driver-sized).

Determinism: ties on pair count break lexicographically, so the merge
list is reproducible regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) distinct-word frequency table — the only pass over
    the corpus BPE needs."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _adjacent_pairs(syms: str) -> F.Column:
    """array of (left, right) structs for each adjacent symbol pair.
    (Spark's sequence(1, 0) counts DOWN, so the single-symbol case
    must short-circuit to an empty array rather than rely on an empty
    sequence.)"""
    return F.expr(
        f"CASE WHEN size({syms}) < 2 THEN CAST(array() AS array<struct<l:string,r:string>>) "
        f"ELSE transform(sequence(1, size({syms}) - 1), "
        f"i -> struct({syms}[i - 1] AS l, {syms}[i] AS r)) END"
    )


def _apply_merge(syms: str, left: str, right: str) -> F.Column:
    """Fold replacing adjacent (left, right) with left||right,
    left-to-right non-overlapping ("aaa" + (a,a) -> [aa, a]) — the
    reference BPE merge semantics, as a pure column expression."""
    la, lb = F.lit(left), F.lit(right)
    merged = F.lit(left + right)
    null_s = F.lit(None).cast("string")
    folded = F.aggregate(
        F.col(syms),
        F.struct(
            F.expr("CAST(array() AS array<string>)").alias("out"),
            null_s.alias("pend"),
        ),
        lambda acc, x: F.when(
            acc["pend"].eqNullSafe(la) & (x == lb),
            F.struct(
                F.concat(acc["out"], F.array(merged)).alias("out"),
                null_s.alias("pend"),
            ),
        ).otherwise(
            F.struct(
                F.when(acc["pend"].isNull(), acc["out"])
                .otherwise(F.concat(acc["out"], F.array(acc["pend"])))
                .alias("out"),
                x.alias("pend"),
            )
        ),
        lambda acc: F.when(acc["pend"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        ),
    )
    return folded


def fit_bpe_merges(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the merge
    list in training order (the tokenizer artifact). Stops early when
    no pair occurs more than once."""
    spark: SparkSession = docs.sparkSession
    words = word_counts(docs, text_col).withColumn(
        "syms", F.expr("split(word, '')")
    )
    # iterations run over the vocab-sized table; checkpoint keeps the
    # plan constant-size across iterations (same rationale as
    # neardup_clusters — cache alone doubles the tree per iteration)
    words = words.select("word", "cnt", "syms").localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            words.select("cnt", F.explode(_adjacent_pairs("syms")).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break
        left, right = top[0]["l"], top[0]["r"]
        merges.append((left, right))
        # lazy: the NEXT iteration's pair-count is the materializing
        # action, so each merge costs one job instead of two
        words = words.select(
            "word", "cnt", _apply_merge("syms", left, right).alias("syms")
        ).localCheckpoint(eager=False)
    return merges


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize documents with a learned merge list: per word, apply
    every merge in training order. Map-only — one nested fold per
    merge, all inside codegen. Returns (id, tokens array<string>,
    n_tokens).

    Document token order is CONTRACTUAL, not an accident of row
    order: words carry their posexplode position and the final
    assembly sorts on it (``array_sort`` over (pos, syms) structs —
    struct ordering compares fields left-to-right, so pos decides).
    A bare ``flatten(collect_list(syms))`` would depend on rows
    arriving in document order, which no Spark shuffle/AQE-skew-split
    guarantees."""
    tok = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word"),
    ).filter(F.col("word") != "")
    tok = tok.withColumn("syms", F.expr("split(word, '')"))
    for left, right in merges:
        tok = tok.withColumn("syms", _apply_merge("syms", left, right))
    return tok.groupBy(id_col).agg(
        F.flatten(
            F.expr("transform(array_sort(collect_list(struct(pos, syms))), x -> x.syms)")
        ).alias("tokens"),
        F.sum(F.size("syms")).cast("long").alias("n_tokens"),
    )


def save_bpe_model(spark: SparkSession, merges: list[tuple[str, str]], path: str) -> None:
    """Persist a fitted merge list as the tokenizer artifact (the
    LM/DSIR build-once/apply-many seam): tiny parquet of
    (ord, left, right) — training order IS the apply order, so the
    ordinal column is the contract."""
    rows = [(i, l, r) for i, (l, r) in enumerate(merges)]
    spark.createDataFrame(rows, "ord int, left string, right string").coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def load_bpe_model(spark: SparkSession, path: str) -> list[tuple[str, str]]:
    """Load a persisted merge list in training order."""
    rows = spark.read.parquet(path).orderBy("ord").collect()
    return [(r["left"], r["right"]) for r in rows]
