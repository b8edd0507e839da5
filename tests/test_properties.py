"""Property-based tests (SURVEY.md §5.4) with hypothesis: OHLCV
invariants, resample conservation, gap-fill grid totality, xyk
simulation bounds. Random tick sets are generated driver-side and run
through the real Spark operators."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from degenter_clickhouse_spark.functions import business
from degenter_clickhouse_spark.operators import ohlcv as O

T0 = datetime(2024, 6, 1)

tick = st.tuples(
    st.integers(min_value=1, max_value=3),  # pool
    st.floats(min_value=0.001, max_value=1e6, allow_nan=False, allow_infinity=False),
    st.integers(min_value=0, max_value=6 * 3600 - 1),  # offset sec
)

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(ticks=st.lists(tick, min_size=1, max_size=120))
@_settings
def test_ohlcv_invariants_and_resample_conservation(spark, ticks):
    rows = [
        (p, float(px), i, T0 + timedelta(seconds=off))
        for i, (p, px, off) in enumerate(ticks)
    ]
    df = spark.createDataFrame(rows, "pool_id long, price double, event_id long, ts timestamp")
    bars = O.bars(df, 60, seq="event_id", qty=F.col("price")).cache()
    got = bars.collect()
    # low <= open/close <= high; counts positive
    for b in got:
        assert b.low <= b.open <= b.high
        assert b.low <= b.close <= b.high
        assert b.trade_count >= 1
    assert sum(b.trade_count for b in got) == len(rows)
    # resample conserves volume and trade count exactly
    res = O.resample(bars, 900).collect()
    assert sum(r.trade_count for r in res) == len(rows)
    assert sum(r.volume for r in res) == pytest.approx(
        sum(b.volume for b in got), rel=1e-9
    )
    for r in res:
        assert r.low <= min(r.open, r.close) and r.high >= max(r.open, r.close)
    # carried open may legally escape [low, high] — but close never does
    carried = O.with_carried_open(bars).collect()
    for b in carried:
        assert b.low <= b.close <= b.high
    bars.unpersist()


@given(ticks=st.lists(tick, min_size=2, max_size=60))
@_settings
def test_gap_fill_total_grid(spark, ticks):
    rows = [
        (p, float(px), i, T0 + timedelta(seconds=off))
        for i, (p, px, off) in enumerate(ticks)
    ]
    df = spark.createDataFrame(rows, "pool_id long, price double, event_id long, ts timestamp")
    bars = O.bars(df, 600, seq="event_id", qty=F.lit(0.0))
    filled = O.gap_fill(bars, 600, fill="prev").collect()
    per_pool = {}
    for r in filled:
        per_pool.setdefault(r.pool_id, []).append(r)
    for pool, rs in per_pool.items():
        rs.sort(key=lambda r: r.bucket_start)
        # contiguous grid, one row per step
        steps = {
            int((b.bucket_start - a.bucket_start).total_seconds())
            for a, b in zip(rs, rs[1:])
        }
        assert steps <= {600}
        # gap rows are flat at the carried close
        for r in rs:
            if r.is_gap:
                assert r.open == r.close == r.high == r.low
                assert r.trade_count == 0


amount = st.floats(min_value=0.01, max_value=1e9, allow_nan=False)
reserve = st.floats(min_value=1.0, max_value=1e12, allow_nan=False)


@given(a_in=amount, rz=reserve, rt=reserve, fee=st.floats(min_value=0.0, max_value=0.05))
@_settings
def test_xyk_simulation_bounds(spark, a_in, rz, rt, fee):
    df = spark.createDataFrame(
        [(float(a_in), float(rz), float(rt), float(fee))],
        "a double, rz double, rt double, fee double",
    )
    sim = business.simulate_xyk(
        F.lit(True), F.col("a"), F.col("rz"), F.col("rt"), F.col("fee")
    )
    r = df.select(sim.alias("s")).collect()[0].s
    # constant-product: output strictly less than the output reserve,
    # positive, and execution price never better than mid
    assert 0 < r.out < rt
    assert r.exec_price >= r.mid_price * (1 - 1e-9)
    assert r.impact >= -1e-9


@given(a_in=amount, rz=reserve, rt=reserve, fee=st.floats(min_value=0.0, max_value=0.05))
@_settings
def test_xyk_simulation_sell_direction(spark, a_in, rz, rt, fee):
    """token->ZIG (swap.js:48-54): eff = outZig/amountIn is never
    better than mid, impact = mid/eff - 1 is a non-negative fraction."""
    df = spark.createDataFrame(
        [(float(a_in), float(rz), float(rt), float(fee))],
        "a double, rz double, rt double, fee double",
    )
    sim = business.simulate_xyk(
        F.lit(False), F.col("a"), F.col("rz"), F.col("rt"), F.col("fee")
    )
    r = df.select(sim.alias("s")).collect()[0].s
    assert 0 < r.out < rz
    assert r.exec_price <= r.mid_price * (1 + 1e-9)
    assert r.impact >= -1e-9
    # exact reference recomputation
    xin = a_in * (1 - fee)
    out = (xin * rz) / (rt + xin)
    eff = out / a_in
    mid = rz / rt
    assert r.out == pytest.approx(out, rel=1e-12)
    assert r.impact == pytest.approx(mid / max(eff, 1e-18) - 1, rel=1e-9)


def test_packing_invariants(spark):
    """Every pack fits the budget unless it is a single oversized doc;
    pack ids and positions are contiguous from 0 in doc order; no doc
    is lost or duplicated."""
    from pyspark.sql import functions as F

    from degenter_clickhouse_spark import catalog
    from degenter_clickhouse_spark.llm import packing

    budget = 256
    docs = catalog.load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "source", "doc_id", F.size(F.split("text", " ")).cast("long").alias("tokens")
    )
    packed = packing.greedy_pack(docs, budget=budget)
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()
    viol = (
        packed.groupBy("source", "pack_id")
        .agg(F.sum("tokens").alias("t"), F.count(F.lit(1)).alias("n"))
        .filter((F.col("t") > budget) & (F.col("n") > 1))
    )
    assert viol.count() == 0
    # contiguity: pack ids within a source form 0..max with no holes,
    # and positions within a pack form 0..n-1
    per_src = packed.groupBy("source").agg(
        F.countDistinct("pack_id").alias("n_packs"), F.max("pack_id").alias("max_id")
    )
    assert per_src.filter(F.col("n_packs") != F.col("max_id") + 1).count() == 0
    per_pack = packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("pack_pos").alias("max_pos")
    )
    assert per_pack.filter(F.col("n") != F.col("max_pos") + 1).count() == 0


@given(
    counts=st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=5),
    weights=st.lists(st.integers(min_value=1, max_value=4), min_size=5, max_size=5),
)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_corpus_order_closed_form_matches_bruteforce(spark, counts, weights):
    """The closed-form training position (arithmetic over the
    per-source count/weight table) equals the brute-force sort by
    (cycle, source, slot) for arbitrary source counts and weights:
    positions are a 0..n-1 permutation in exactly that order."""
    from degenter_clickhouse_spark.llm.packing import corpus_order

    srcs = [f"s{chr(ord('a') + i)}" for i in range(len(counts))]
    w = {s: weights[i] for i, s in enumerate(srcs)}
    rows = [(s, i * 100 + j) for i, s in enumerate(srcs) for j in range(counts[i])]
    if not rows:
        return
    # brute-force model of the documented semantics
    keyed = []
    for s, doc in rows:
        rn = sum(1 for s2, d2 in rows if s2 == s and d2 < doc)
        keyed.append(((rn // w[s], s, rn % w[s]), s, doc))
    expected = [
        (pos, s, doc) for pos, (_, s, doc) in enumerate(sorted(keyed))
    ]
    d = spark.createDataFrame(rows, ["source", "doc_id"])
    got = sorted(
        (r.position, r.source, r.doc_id)
        for r in corpus_order(d, weights=w).collect()
    )
    assert got == expected


@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="abcd", min_size=1, max_size=6),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=6,
    ),
    n_merges=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bpe_fit_matches_reference_on_random_corpora(spark, docs, n_merges):
    """Distributed BPE equals the sequential reference for arbitrary
    tiny corpora: same greedy merge list (count-desc, lexicographic
    ties), same early stop when no pair repeats."""
    from degenter_clickhouse_spark.llm import bpe

    from .test_llm import _py_bpe

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    wc = {}
    for _, text in rows:
        for w in text.split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    want, _ = _py_bpe(wc, n_merges)
    assert bpe.fit_bpe_merges(d, n_merges=n_merges) == want


def test_chunking_reconstructs_documents(spark):
    """Dropping each chunk's leading overlap (except chunk 0) and
    concatenating in chunk order reproduces the original word sequence
    exactly — no word lost, duplicated, or reordered."""
    from pyspark.sql import functions as F

    from degenter_clickhouse_spark import catalog
    from degenter_clickhouse_spark.llm import text as T

    d = catalog.load_table(spark, "/root/testdata/sf0.001", "documents").withColumn(
        "ws", F.split("text", " ")
    )
    c = d.select(
        "doc_id",
        "ws",
        F.explode(F.sequence(F.lit(0), T.n_chunks("ws") - 1)).alias("i"),
    ).select(
        "doc_id",
        "ws",
        "i",
        T.chunk_slice("ws", "i").alias("cw"),
    )
    tail = F.when(F.col("i") == 0, F.col("cw")).otherwise(
        F.expr(f"slice(cw, {T.CHUNK_OVERLAP + 1}, {T.CHUNK_TOKENS})")
    )
    rebuilt = (
        c.select("doc_id", "i", tail.alias("tail"))
        .groupBy("doc_id")
        .agg(
            F.flatten(F.array_sort(F.collect_list(F.struct("i", "tail"))).tail.alias("x")).alias("words")
        )
    )
    j = rebuilt.join(d.select("doc_id", "ws"), "doc_id")
    mismatches = j.filter(F.col("words") != F.col("ws")).count()
    assert mismatches == 0


# ---------------------------------------------------------------------------
# Parse-family round trips (P6/P7/P9): arbitrary generated assets
# survive encode -> parse exactly. One Spark job per property, many
# hypothesis-generated rows inside it.
# ---------------------------------------------------------------------------

_DENOM_ALPHABET = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789._/-"


def _gen_denoms_and_amounts(seed, n):
    import random

    rng = random.Random(seed)
    out = []
    for _ in range(n):
        # denom must start with a non-digit (else digits merge into the
        # amount); the reference's denoms always start with a letter
        head = rng.choice("abcdefghijklmnopqrstuvwxyz")
        tail = "".join(
            rng.choice(_DENOM_ALPHABET) for _ in range(rng.randint(0, 20))
        )
        denom = head + tail
        amount = rng.randint(0, 10**30)
        out.append((denom, amount))
    return out


def test_assets_list_roundtrip(spark):
    from pyspark.sql import functions as F

    from degenter_clickhouse_spark.functions import parse

    rows = []
    for seed in range(50):
        assets = _gen_denoms_and_amounts(seed, seed % 5 + 1)
        encoded = ",".join(f"{a}{d}" for d, a in assets)
        rows.append((seed, encoded, [(str(a), d) for d, a in assets]))
    df = spark.createDataFrame(rows, ["id", "encoded", "expected"])
    got = df.select(
        "id",
        "expected",
        F.transform(
            parse.parse_assets_list(F.col("encoded")),
            lambda s: F.struct(
                s.amount_base.cast("string").alias("a"), s.denom.alias("d")
            ),
        ).alias("parsed"),
    ).collect()
    for r in got:
        assert [(p.a, p.d) for p in r.parsed] == [tuple(e) for e in r.expected], r.id


def test_reserves_kv_roundtrip(spark):
    from pyspark.sql import functions as F

    from degenter_clickhouse_spark.functions import parse

    rows = []
    for seed in range(50):
        assets = _gen_denoms_and_amounts(seed + 1000, seed % 4 + 1)
        encoded = ",".join(f"{d}:{a}" for d, a in assets)
        rows.append((seed, encoded, [(d, str(a)) for d, a in assets]))
    df = spark.createDataFrame(rows, ["id", "encoded", "expected"])
    got = df.select(
        "id",
        "expected",
        F.transform(
            parse.parse_reserves_kv(F.col("encoded")),
            lambda s: F.struct(
                s.denom.alias("d"), s.amount_base.cast("string").alias("a")
            ),
        ).alias("parsed"),
    ).collect()
    for r in got:
        assert [(p.d, p.a) for p in r.parsed] == [tuple(e) for e in r.expected], r.id


def test_pair_normalize_first_dash_and_swap(spark):
    """Split is on the FIRST dash; uzig always lands on the quote side
    even when the other denom itself contains dashes."""
    from pyspark.sql import functions as F

    from degenter_clickhouse_spark.functions import parse

    rows = [
        ("a-b", "a", "b"),
        ("uzig-coin.x", "coin.x", "uzig"),
        ("coin-with-dashes-uzig", "coin", "with-dashes-uzig"),
        ("uzig-a-b-c", "a-b-c", "uzig"),
    ]
    df = spark.createDataFrame([(p,) for p, _, _ in rows], ["pair"])
    got = {r.pair: r.n for r in df.select(
        "pair", parse.normalize_pair(F.col("pair")).alias("n")
    ).collect()}
    for pair, base, quote in rows:
        assert got[pair].base_denom == base, pair
        assert got[pair].quote_denom == quote, pair


span_docs = st.lists(
    st.lists(st.sampled_from("a b c".split()), min_size=0, max_size=14).map(
        " ".join
    ),
    min_size=1,
    max_size=5,
)


@given(texts=span_docs)
@_settings
def test_duplicate_ngram_spans_match_bruteforce(spark, texts):
    """Span detection + removal vs a sequential reference: same merged
    [start, end) intervals, and the cleaned text is exactly the
    uncovered tokens. The 3-letter alphabet forces heavy gram
    collisions (within- and cross-doc)."""
    from collections import Counter

    from degenter_clickhouse_spark.llm.clean import (
        duplicate_ngram_spans,
        remove_duplicate_spans,
    )

    n = 3
    toks = [t.split(" ") for t in texts]
    cnt = Counter(
        " ".join(tk[i : i + n])
        for tk in toks
        for i in range(len(tk) - n + 1)
    )
    want = set()
    covered = {d: set() for d in range(len(toks))}
    for d, tk in enumerate(toks):
        spans = []
        for i in range(len(tk) - n + 1):
            if cnt[" ".join(tk[i : i + n])] < 2:
                continue
            if spans and i <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], i + n)
            else:
                spans.append([i, i + n])
        for s, e in spans:
            want.add((d, s, e))
            covered[d].update(range(s, e))

    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    sp = duplicate_ngram_spans(docs, n=n)
    got = {(r.doc_id, r.span_start, r.span_end) for r in sp.collect()}
    assert got == want

    cleaned = {
        r.doc_id: r.cleaned_text
        for r in remove_duplicate_spans(docs, sp).collect()
    }
    for d, tk in enumerate(toks):
        expect = " ".join(t for i, t in enumerate(tk) if i not in covered[d])
        assert cleaned[d] == expect, (d, texts[d])


# ---------------------------------------------------------------------------
# persisted text index == direct BM25 on arbitrary corpora
# ---------------------------------------------------------------------------

_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg"])
_doc = st.lists(_word, min_size=1, max_size=12).map(" ".join)


@given(
    texts=st.lists(_doc, min_size=1, max_size=20),
    q=st.lists(_word, min_size=1, max_size=3, unique=True),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_text_index_search_equals_direct_on_random_corpora(
    spark, tmp_path_factory, texts, q
):
    """The persisted-index search path (partition-pruned postings,
    derived df, integer-merged stats) must be bit-identical to the
    direct bm25_topk plan on ANY corpus — including all-duplicate
    docs, single-word docs, and query terms absent from the corpus."""
    from degenter_clickhouse_spark.llm.clean import (
        bm25_topk,
        build_text_index,
        text_index_search,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    path = str(tmp_path_factory.mktemp("bm25idx"))
    build_text_index(docs, path)
    direct = [tuple(r) for r in bm25_topk(docs, q, k=5).collect()]
    indexed = [tuple(r) for r in text_index_search(spark, path, q, k=5).collect()]
    assert indexed == direct


@given(
    ids=st.lists(
        st.one_of(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.integers(min_value=-10, max_value=10),
            st.integers(min_value=2**31 - 5, max_value=2**35),
        ),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
@_settings
def test_knuth_hash_exact_on_full_int64_domain(spark, ids):
    """ADVICE r5: the shared sampling hash must equal the mathematical
    (id * 2654435761) mod 2^32 — pmod semantics — for EVERY int64 id:
    negative ids and ids past 2^31 overflowed or went negative in the
    old naive formula, silently dropping rows from samples."""
    from degenter_clickhouse_spark.functions.hashing import KNUTH, knuth_u32

    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {
        r["id"]: r["h"]
        for r in df.select("id", knuth_u32(F.col("id")).alias("h")).collect()
    }
    want = {i: (i * KNUTH) % 2**32 for i in ids}  # Python % is floored
    assert got == want


def test_weighted_sample_valid_keys_for_negative_and_huge_ids(spark):
    """Every positive-weight row must carry a finite, non-null es_key —
    including negative and >2^31 doc ids (the old sign-preserving hash
    made ln(u) NULL for negative ids, silently unsampleable rows)."""
    from degenter_clickhouse_spark.llm.packing import weighted_sample

    rows = [
        (-(2**62), 5),
        (-3, 7),
        (-1, 1),
        (0, 2),
        (7, 3),
        (2**31 + 17, 4),
        (2**62 + 11, 6),
        (5, 0),  # non-positive weight: excluded by contract
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = weighted_sample(df, "n_chars", k=100).collect()
    assert len(out) == 7  # every positive-weight row qualifies
    assert all(r["es_key"] is not None and r["es_key"] <= 0 for r in out)


# ---------------------------------------------------------------------------
# round-7 continuation-3 operators
# ---------------------------------------------------------------------------

_edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=40,
)


@given(pairs=_edge_lists)
@_settings
def test_triangle_counts_property_vs_naive(spark, pairs):
    """Any random multigraph (self-loops, duplicates, both directions):
    degree-oriented wedge counts == brute enumeration."""
    from collections import defaultdict
    from itertools import combinations

    from degenter_clickhouse_spark.operators import graph

    adj = defaultdict(set)
    for u, v in pairs:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    want = defaultdict(int)
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            want[a] += 1
            want[b] += 1
            want[c] += 1
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = dict(graph.triangle_counts(df).collect())
    assert got == dict(want)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),  # group
            st.dictionaries(
                st.sampled_from(["a", "b", "c"]),
                st.integers(-1000, 1000),
                max_size=3,
            ),
        ),
        min_size=1,
        max_size=25,
    )
)
@_settings
def test_agg_map_property_vs_dict_fold(spark, rows):
    """agg_map sum/min/max == a plain Python dict fold per group."""
    from degenter_clickhouse_spark.operators.maps import agg_map

    df = spark.createDataFrame(rows, "g long, m map<string,long>")
    for how, fold in (
        ("sum", lambda a, b: a + b),
        ("min", min),
        ("max", max),
    ):
        want: dict[int, dict[str, int]] = {}
        for g, m in rows:
            acc = want.setdefault(g, {})
            for k, v in m.items():
                acc[k] = fold(acc[k], v) if k in acc else v
        got = {
            r.g: dict(r.fm)
            for r in agg_map(df, ["g"], "m", how=how, out="fm").collect()
        }
        assert got == want, how


@given(
    left=st.dictionaries(st.integers(0, 15), st.one_of(st.none(), st.integers(0, 5)), max_size=12),
    right=st.dictionaries(st.integers(0, 15), st.one_of(st.none(), st.integers(0, 5)), max_size=12),
)
@_settings
def test_snapshot_diff_property(spark, left, right):
    """diff statuses == set algebra over the two dicts (NULL-safe)."""
    from degenter_clickhouse_spark.operators.diff import snapshot_diff

    l = spark.createDataFrame(list(left.items()) or [(None, None)], "k long, v long").filter(
        F.col("k").isNotNull()
    )
    r = spark.createDataFrame(list(right.items()) or [(None, None)], "k long, v long").filter(
        F.col("k").isNotNull()
    )
    got = {row.k: row.status for row in snapshot_diff(l, r, ["k"]).collect()}
    want = {}
    for k in set(left) | set(right):
        if k not in left:
            want[k] = "added"
        elif k not in right:
            want[k] = "removed"
        elif left[k] != right[k]:
            want[k] = "changed"
    assert got == want


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    n_digits=st.lists(st.integers(min_value=1, max_value=78), min_size=1,
                      max_size=6),
)
def test_decimal38_overflow_clamps_to_null_end_to_end(spark, n_digits):
    """VERDICT r7 #7 (SURVEY §1.2): raw on-chain amounts are
    NUMERIC(78,0) strings; the engine clamps to Decimal(38,0) like the
    reference's DDL (jobs/token-security.js:20-21). Property: through
    parse_assets_list -> to_display -> a volume rollup, any amount of
    <= 38 digits survives EXACTLY (as a decimal; non-lossy), any
    amount of > 38 digits becomes NULL at the cast (never an ANSI
    ArithmeticException killing the job), keeps its assets-list
    position, and drops out of sums the way SQL NULLs do."""
    from degenter_clickhouse_spark.functions import parse

    amounts = [("1" * 9 + "7" * max(0, n - 9))[:n] for n in n_digits]
    encoded = ",".join(f"{a}udenom{i}" for i, a in enumerate(amounts))
    df = spark.createDataFrame([(1, encoded)], ["id", "encoded"])
    parsed = df.select(
        F.posexplode(parse.parse_assets_list(F.col("encoded"))).alias(
            "pos", "s"
        )
    ).select("pos", "s.amount_base", "s.denom")
    rows = {r.pos: r for r in parsed.collect()}
    # every asset keeps its position regardless of overflow
    assert set(rows) == set(range(len(amounts)))
    for i, a in enumerate(amounts):
        if len(a) <= 38:
            assert rows[i].amount_base is not None
            assert str(rows[i].amount_base) == a, (a, rows[i].amount_base)
        else:
            assert rows[i].amount_base is None, (a, rows[i].amount_base)
        assert rows[i].denom == f"udenom{i}"
    # volume rollup: NULL amounts drop out of the sum, job never dies
    disp = parsed.select(
        parse.to_display(F.col("amount_base"), F.lit(6)).alias("v")
    )
    got_sum = disp.agg(F.sum("v")).collect()[0][0]
    want = sum(int(a) / 1e6 for a in amounts if len(a) <= 38)
    if all(len(a) > 38 for a in amounts):
        assert got_sum is None
    else:
        assert got_sum is not None
        assert abs(got_sum - want) <= max(1e-9 * want, 1e-9)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    scheme=st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
    host=st.lists(
        st.text(alphabet="abcDEF12", min_size=1, max_size=5),
        min_size=1, max_size=4,
    ),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=st.text(alphabet="abC/9.-", max_size=12),
    params=st.lists(
        st.tuples(
            st.sampled_from(["q", "id", "utm_source", "utm_x", "fbclid",
                             "gclid", "ref", "refresh"]),
            st.text(alphabet="aB3", max_size=4),
        ),
        max_size=4,
    ),
    frag=st.sampled_from(["", "#x", "#Sec/1"]),
)
def test_url_normalize_properties(spark, scheme, host, port, path, params, frag):
    """Canonicalization properties on randomized messy URLs:
    IDEMPOTENT (normalizing a normalized URL is a no-op), never emits
    tracking params or fragments, authority comes back lowercase, and
    url_domain is insensitive to case/port/userinfo noise."""
    from pyspark.sql import functions as F

    from degenter_clickhouse_spark.llm import web

    h = ".".join(host)
    q = "&".join(f"{k}={v}" for k, v in params)
    url = f"{scheme}://{h}{port}/{path}" + (f"?{q}" if q else "") + frag
    df = spark.createDataFrame([(url,)], "url string")
    row = df.select(
        web.url_normalize(F.col("url")).alias("n"),
        web.url_normalize(web.url_normalize(F.col("url"))).alias("nn"),
        web.url_domain(F.col("url")).alias("d1"),
        web.url_domain(web.url_normalize(F.col("url"))).alias("d2"),
    ).collect()[0]
    assert row.n == row.nn, (url, row.n, row.nn)
    assert "#" not in row.n
    for bad in ("utm_source=", "utm_x=", "fbclid=", "gclid=", "ref="):
        # ref= may legitimately appear inside a VALUE; check param keys
        kept = row.n.split("?", 1)[1].split("&") if "?" in row.n else []
        assert not any(p.split("=")[0] in ("utm_source", "utm_x", "fbclid",
                                           "gclid", "ref") for p in kept), row.n
    import re as _re

    auth = (
        _re.split(r"[/?#]", row.n.split("://", 1)[1], maxsplit=1)[0]
        if "://" in row.n
        else ""
    )
    assert auth == auth.lower(), row.n
    assert row.d1 == row.d2, (url, row.d1, row.d2)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 1000)),
        min_size=1, max_size=120,
    ),
    k=st.integers(1, 4),
    parts=st.sampled_from([1, 3, 17]),
)
def test_salted_topk_property_vs_plain_window(spark, rows, k, parts):
    """salted_topk == plain per-key window top-k for ANY key/value
    multiset, k, and input partitioning (given a tie-breaking total
    order)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from degenter_clickhouse_spark.operators.skew import salted_topk

    data = [(i, key, float(v)) for i, (key, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "rid long, key int, v double")
    order = [F.col("v").desc(), F.col("rid").asc()]
    w = Window.partitionBy("key").orderBy(*order)
    want = sorted(
        r.rid for r in df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k).collect()
    )
    got = sorted(
        r.rid
        for r in salted_topk(df.repartition(parts), ["key"], k, order).collect()
    )
    assert got == want


@settings(max_examples=100, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    spans=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 30)),
        min_size=1, max_size=25,
    ),
    width=st.sampled_from([60.0, 3600.0, 7200.0]),
)
def test_interval_join_property_vs_bruteforce_epoch(spark, spans, width):
    """interval_join == brute-force non-empty-intersection join
    (a.s < a.e AND b.s < b.e AND max(starts) < min(ends), equal keys)
    for random intervals at EPOCH magnitudes and any bucket width —
    zero-length intervals match nothing (the operator's contract: the
    raw theta shorthand ls < re AND rs < le is NOT equivalent for
    empty intervals, so the oracle guards them out explicitly) and
    boundary-aligned ends exercise the integer-microsecond fix."""
    import itertools

    from degenter_clickhouse_spark.operators.asof import interval_join

    base = 472_222 * 3600.0  # epoch-scale bucket boundary
    rows = [
        (k, i, base + s * 60.0, base + (s + d) * 60.0)
        for i, (k, s, d) in enumerate(spans)
    ]
    left = spark.createDataFrame(rows, "k int, id long, s double, e double")
    right = spark.createDataFrame(
        [(k, i + 1000, s, e) for k, i, s, e in rows],
        "k int, id long, s double, e double",
    )
    got = sorted(
        (r.id, r.id_r)
        for r in interval_join(
            left, right, ("s", "e"), ("s", "e"), by=["k"], bucket_width=width
        ).collect()
    )
    want = sorted(
        (a[1], b[1] + 1000)
        for a, b in itertools.product(rows, rows)
        if a[0] == b[0]
        and a[2] < a[3]  # non-empty left
        and b[2] < b[3]  # non-empty right
        and max(a[2], b[2]) < min(a[3], b[3])
    )
    assert got == want


@given(
    hs=st.lists(
        st.integers(min_value=-(2**63) + 1, max_value=2**63 - 1),
        min_size=1,
        max_size=60,
    ),
    width=st.sampled_from([8, 64, 1024]),
)
@_settings
def test_sketch_family_invariants(spark, hs, width):
    """Count-Min / Bloom hard guarantees hold for ARBITRARY signed
    64-bit hash inputs and any width: estimates never undercount, the
    estimate of every inserted key is positive, members never probe
    false, and shard-merge equals the direct sketch row-for-row."""
    from pyspark.sql import functions as F

    from degenter_clickhouse_spark.operators.skew import (
        bloom_contains,
        bloom_merge,
        bloom_state,
        cms_estimate,
        cms_merge,
        cms_state,
    )

    rows = [(i % 2, h) for i, h in enumerate(hs)]
    df = spark.createDataFrame(rows, "shard int, h long")
    depth = 3

    cm = cms_merge(cms_state(df, ["shard"], "h", depth=depth, width=width))
    cd = cms_state(df.select("h"), [], "h", depth=depth, width=width)
    assert sorted(map(tuple, cm.collect())) == sorted(map(tuple, cd.collect()))
    exact = df.groupBy("h").agg(F.count(F.lit(1)).cast("long").alias("exact"))
    est = cms_estimate(cm, exact, "h", depth=depth, width=width).collect()
    assert est and all(r["cms_est"] >= r["exact"] >= 1 for r in est)

    bm = bloom_merge(bloom_state(df, ["shard"], "h", depth=depth, width=width))
    bd = bloom_state(df.select("h"), [], "h", depth=depth, width=width)
    assert sorted(map(tuple, bm.collect())) == sorted(map(tuple, bd.collect()))
    members = bloom_contains(
        bm, df.select("h").distinct(), "h", depth=depth, width=width
    ).collect()
    assert members and all(r["maybe_member"] for r in members)
