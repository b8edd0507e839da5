"""Graph centrality operators (operators/graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from degenter_clickhouse_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_symmetrize_dedupes_and_mirrors(spark):
    e = _edges(spark, [(1, 2), (2, 1), (1, 2), (2, 3)])
    got = {tuple(r) for r in graph.symmetrize(e).collect()}
    assert got == {(1, 2), (2, 1), (2, 3), (3, 2)}


def test_pagerank_star_hub_dominates(spark):
    # star: hub 0 <-> leaves 1..6; hub must out-rank every leaf, and
    # all leaves tie by symmetry
    pairs = [(0, i) for i in range(1, 7)]
    ranks = dict(
        graph.pagerank(graph.symmetrize(_edges(spark, pairs))).collect()
    )
    hub, leaves = ranks[0], [ranks[i] for i in range(1, 7)]
    assert hub > max(leaves)
    assert len(set(leaves)) == 1


def test_pagerank_regular_graph_uniform(spark):
    # 4-cycle: every node degree 2 => ranks exactly equal at every
    # iteration, and equal to the fixed point scale (base + d*scale/100
    # telescopes back to scale for a regular graph)
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0)]
    ranks = dict(
        graph.pagerank(graph.symmetrize(_edges(spark, pairs))).collect()
    )
    assert len(set(ranks.values())) == 1
    # scale=1e12: uniform mass is conserved exactly for regular graphs
    assert ranks[0] == graph.DEFAULT_SCALE


def test_pagerank_mass_approximately_conserved(spark):
    # truncating division leaks < 1 unit per edge per round; total mass
    # stays within iterations * (n_edges + n_nodes) units of n * scale
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    sym = graph.symmetrize(_edges(spark, pairs))
    ranks = graph.pagerank(sym, iterations=5)
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    n = ranks.count()
    assert abs(total - n * graph.DEFAULT_SCALE) < 5 * (10 + n) * 100


def test_pagerank_shuffle_partition_invariant(spark):
    pairs = [(i, (i * 7) % 23) for i in range(100)]
    sym = graph.symmetrize(_edges(spark, pairs))
    base = sorted(map(tuple, graph.pagerank(sym).collect()))
    default = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        alt = sorted(map(tuple, graph.pagerank(sym).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", default)
    assert base == alt


def test_pagerank_rejects_bad_damping(spark):
    e = _edges(spark, [(0, 1)])
    with pytest.raises(ValueError):
        graph.pagerank(e, damping_pct=0)
    with pytest.raises(ValueError):
        graph.pagerank(e, damping_pct=100)


def test_degree_stats(spark):
    e = graph.symmetrize(_edges(spark, [(0, 1), (0, 2), (0, 3)]))
    got = {tuple(r) for r in graph.degree_stats(e).collect()}
    # hub degree 3 (1 node), leaves degree 1 (3 nodes)
    assert got == {(3, 1), (1, 3)}


def test_pagerank_relabel_invariant(spark):
    """Shifting every node id by a constant shifts the rank table's
    node column and nothing else — centrality depends on structure,
    not on the id values."""
    pairs = [(i, (i * 5) % 17) for i in range(60)]
    base = graph.pagerank(graph.symmetrize(_edges(spark, pairs)))
    shifted = graph.pagerank(
        graph.symmetrize(
            _edges(spark, [(a + 1000, b + 1000) for a, b in pairs])
        )
    )
    b = {r["node"]: r["rank"] for r in base.collect()}
    s = {r["node"] - 1000: r["rank"] for r in shifted.collect()}
    assert b == s


def test_personalized_pagerank_mass_stays_in_seed_component(spark):
    """Two disconnected components, seeds only in the first: every
    node of the second component ends with rank exactly 0, and every
    node reachable from the seeds ends positive."""
    a = [(0, 1), (1, 2)]          # component A (seeded)
    b = [(10, 11), (11, 12)]      # component B (unseeded)
    edges = graph.symmetrize(_edges(spark, a + b))
    seeds = spark.createDataFrame([(0,)], "node long")
    ranks = dict(graph.personalized_pagerank(edges, seeds).collect())
    assert all(ranks[n] == 0 for n in (10, 11, 12))
    assert all(ranks[n] > 0 for n in (0, 1, 2))


def test_connected_components(spark):
    e = _edges(spark, [(1, 2), (2, 3), (10, 11), (20, 20)])
    got = {tuple(r) for r in graph.connected_components(e).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20)}


def _naive_triangles(pairs):
    """Reference: per-node triangle membership by brute enumeration."""
    from collections import defaultdict
    from itertools import combinations

    adj = defaultdict(set)
    for u, v in pairs:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    counts = defaultdict(int)
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            counts[a] += 1
            counts[b] += 1
            counts[c] += 1
    return dict(counts)


def test_triangle_counts_match_naive(spark):
    """Degree-oriented wedge join equals brute enumeration on a graph
    with a hub (skewed degrees), a clique, a chordless cycle, dup and
    self-loop edges."""
    pairs = (
        [(0, i) for i in range(1, 8)]        # hub star (no triangles alone)
        + [(1, 2), (2, 3), (1, 3)]           # triangles with hub + own
        + [(10, 11), (11, 12), (12, 13), (13, 10)]  # C4: no triangles
        + [(20, 21), (21, 22), (22, 20), (20, 22), (21, 21)]  # dup + loop
    )
    got = dict(
        graph.triangle_counts(_edges(spark, pairs)).collect()
    )
    assert got == _naive_triangles(pairs)


def test_triangle_counts_direction_invariant(spark):
    """Reversed / doubled edge lists count identically (undirected)."""
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1)]
    fwd = dict(graph.triangle_counts(_edges(spark, pairs)).collect())
    rev = dict(
        graph.triangle_counts(
            _edges(spark, [(b, a) for a, b in pairs] + pairs)
        ).collect()
    )
    assert fwd == rev == _naive_triangles(pairs)


def test_label_propagation_separates_communities(spark):
    """Two 5-cliques joined by ONE bridge edge: LPA keeps two
    communities (the sparse cut stops the flood) while weak components
    merge everything — the reason LPA exists alongside
    connected_components."""
    from itertools import combinations

    a = list(combinations(range(1, 6), 2))
    b = list(combinations(range(11, 16), 2))
    bridge = [(5, 11)]
    edges = graph.symmetrize(_edges(spark, a + b + bridge))
    labels = dict(graph.label_propagation(edges, iterations=4).collect())
    assert len({labels[n] for n in range(1, 6)}) == 1
    assert len({labels[n] for n in range(11, 16)}) == 1
    assert labels[1] != labels[11]
    comp = {c for _, c in graph.connected_components(
        _edges(spark, a + b + bridge)
    ).collect()}
    assert len(comp) == 1  # components see one blob; LPA sees two


def test_label_propagation_partition_invariant(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (3, 10)]
    edges = graph.symmetrize(_edges(spark, pairs))
    a = dict(graph.label_propagation(edges, iterations=3).collect())
    b = dict(
        graph.label_propagation(
            edges.repartition(7), iterations=3
        ).collect()
    )
    assert a == b


def test_connected_components_fast_path_matches_loop(spark):
    """The r13 driver fast path (bounded collect + union-find) must be
    row-identical to the distributed pointer-jumping loop on the same
    graph — long paths, stars, singleton self-loops, separate
    components."""
    pairs = [
        (1, 2), (2, 3), (3, 4), (4, 5),          # path (exercises jumping)
        (100, 101), (100, 102), (100, 103),      # star
        (7, 7),                                  # self-loop singleton
        (50, 60),                                # plain pair
    ]
    e = _edges(spark, pairs)
    fast = {tuple(r) for r in graph.connected_components(e).collect()}
    spark.conf.set("spark.degenter.cc.driverMaxEdges", "0")  # force loop
    try:
        loop = {tuple(r) for r in graph.connected_components(e).collect()}
    finally:
        spark.conf.unset("spark.degenter.cc.driverMaxEdges")
    assert fast == loop
    assert fast == {
        (1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
        (100, 100), (101, 100), (102, 100), (103, 100),
        (7, 7), (50, 50), (60, 50),
    }
