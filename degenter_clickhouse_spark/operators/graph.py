"""Distributed graph centrality over edge-list DataFrames.

The reference has no graph operators — this family extends the engine
for large-scale training-data curation, where link-graph centrality is
a standard document-quality prior (CommonCrawl-style harmonic/PageRank
ranking of hosts feeding corpus selection) and bipartite activity
graphs (user <-> item) feed behavioral weighting.

Design (100 TB target):

* **Pregel-shaped power iteration.** Each PageRank iteration is ONE
  shuffle: edges join ranks on ``src`` (both sides hash-partitioned on
  the node key), contributions aggregate on ``dst``. No driver-side
  state beyond the loop counter; lineage is truncated with
  ``localCheckpoint`` every ``checkpoint_every`` iterations exactly
  like the connected-components resolver (llm/dedup.py) so plan depth
  stays bounded at any iteration count.
* **Integer arithmetic end-to-end.** Ranks are integers scaled by
  ``scale`` (default 1e12). Per-edge contribution is ``rank div
  out_degree`` (truncating integer division — all values non-negative,
  so Spark's ``div`` and DuckDB's ``//`` agree bit-for-bit), and the
  damping update is ``(100 - d)*scale div 100 + d*sum div 100``.
  Integer sums are associative, so results are bit-identical under any
  shuffle partitioning AND identical to the unrolled-CTE SQL oracle —
  no float drift across engines or reduce orders.
* **Overflow envelope.** Total rank mass is ~n_nodes * scale and the
  damping step multiplies a per-node contribution sum by d<=99; with
  the default scale=1e12 the int64 envelope holds to ~1e4 nodes of
  in-degree mass concentrated on one node (worst case: star graph).
  For larger graphs pass a smaller ``scale`` (the relative ranking is
  scale-invariant down to ~1e6) — asserted here rather than silently
  wrapping.
* **Degenerate nodes.** Dangling nodes (no out-edges) would leak mass;
  callers that need classic PageRank semantics symmetrize the edge
  list first (``symmetrize=True``) which guarantees out_degree >= 1
  for every node that appears anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SCALE = 10**12


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view of an edge list: each (src, dst) also appears
    as (dst, src); duplicates collapse. One shuffle (the distinct);
    both directions come from ONE evaluation of ``edges`` via explode
    (the union-of-two-selects form scanned the source twice)."""
    return (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("src"), F.col("dst")),
                    F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
                )
            ).alias("__e")
        )
        .select("__e.src", "__e.dst")
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = DEFAULT_SCALE,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Integer-scaled PageRank power iteration.

    ``edges``: DataFrame with BIGINT ``src``/``dst`` columns (already
    deduplicated / symmetrized as the caller requires; every node must
    have out_degree >= 1 — symmetrized graphs guarantee this).

    Returns (node BIGINT, rank BIGINT) where rank is the fixed-point
    value after ``iterations`` rounds, scaled by ``scale``. Bit-exact
    and shuffle-order-independent (see module docstring).
    """
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0,100), got {damping_pct}")
    # checkpoint the edge list FIRST: deg, e_deg and nodes all derive
    # from it, and without the pin the (scan + symmetrize-distinct)
    # subtree re-executed once per derived checkpoint (3x total)
    e = edges.select("src", "dst").localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # hoist the degree join OUT of the iteration loop: the annotated
    # edge list (src, dst, out_deg) is loop-invariant, so each round
    # pays one join (edges x ranks on src) instead of two; checkpoint
    # pins it so the 2-shuffle build runs once, not per iteration
    e_deg = e.join(deg, "src").localCheckpoint(eager=True)
    # nodes appears in EVERY iteration's update join — checkpoint it
    # once or the distinct's full lineage replays per iteration
    # (deg would be the free source of distinct srcs, but it is not
    # pinned on its own; a cheap distinct over the pinned `e` is)
    nodes = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # (100-d)*scale is divisible by common scales; keep exact integer
    base_term = (100 - damping_pct) * scale // 100
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for i in range(iterations):
        contrib = (
            e_deg.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div out_deg").alias("c"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (
                    F.lit(base_term).cast("long")
                    + F.expr(
                        f"({damping_pct} * coalesce(s, 0L)) div 100"
                    )
                ).alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = DEFAULT_SCALE,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Personalized (seeded) PageRank — TrustRank-style propagation of
    quality mass from a curated seed set through the link graph, the
    standard trick for expanding a small trusted corpus into a ranked
    crawl frontier.

    Identical to :func:`pagerank` except the teleport term lands ONLY
    on seed nodes: ``rank' = is_seed * (100-d)*scale/100 + d*contrib``.
    ``seeds``: DataFrame with a single ``node`` column (a subset of
    the edge list's nodes; dimension-sized, broadcast into the update
    join). Same integer arithmetic, same bit-exactness contract.
    """
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0,100), got {damping_pct}")
    # pin the edge list first — deg, e_deg and nodes all derive from it
    # (same rationale as pagerank above)
    e = edges.select("src", "dst").localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    e_deg = e.join(deg, "src").localCheckpoint(eager=True)
    nodes = e.select(F.col("src").alias("node")).distinct()
    seed_flag = seeds.select("node").distinct().withColumn(
        "is_seed", F.lit(1).cast("long")
    )
    nodes = (
        nodes.join(F.broadcast(seed_flag), "node", "left")
        .select(
            "node",
            F.coalesce("is_seed", F.lit(0).cast("long")).alias("is_seed"),
        )
        .localCheckpoint(eager=True)
    )
    base_term = (100 - damping_pct) * scale // 100
    ranks = nodes.select(
        "node", (F.col("is_seed") * scale).alias("rank")
    )
    for i in range(iterations):
        contrib = e_deg.join(
            ranks.withColumnRenamed("node", "src"), "src"
        ).select(
            F.col("dst").alias("node"),
            F.expr("rank div out_deg").alias("c"),
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = nodes.join(summed, "node", "left").select(
            "node",
            (
                F.col("is_seed") * base_term
                + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
            ).alias("rank"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts via degree-ordered edge orientation —
    the standard scale-safe triangle algorithm (node-iterator++ /
    compact-forward): orienting every undirected edge from its
    lower-(degree, id) endpoint to the higher one bounds each node's
    oriented out-degree by O(sqrt(m)) on any graph (arboricity bound),
    so the wedge join below generates O(m^1.5) candidate wedges worst
    case instead of the O(sum deg^2) a naive neighbor self-join pays —
    at 100 TB the difference between a hot-node (celebrity vertex)
    blowing up quadratically and a bounded plan.

    Shape: 3 keyed equi-joins (orientation annotate, wedge join on the
    middle vertex, closure probe on (a, c)) + one corner-explode agg.
    No cartesian, no driver materialization; every shuffle is on a
    node key. Deterministic: orientation ties break on node id.

    ``edges``: any BIGINT (src, dst) edge list; treated as undirected,
    self-loops and duplicate edges collapse. Returns (node BIGINT,
    n_triangles BIGINT) for every node in >= 1 triangle.
    """
    # pin the symmetrized list: it feeds THREE consumers below (the
    # undirected edge set and both endpoint-degree joins) and its
    # distinct is the expensive part of the pre-orientation phase
    sym = (
        symmetrize(edges)
        .filter(F.col("src") != F.col("dst"))
        .localCheckpoint(eager=True)
    )
    und = sym.filter(F.col("src") < F.col("dst"))
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ed = und.join(deg, "src").withColumnRenamed("d", "du").join(
        deg.select(F.col("src").alias("dst"), F.col("d").alias("dv")), "dst"
    )
    # orient src -> dst iff (du, src) < (dv, dst); src < dst already,
    # so the tie case keeps the canonical direction
    keep = (F.col("du") < F.col("dv")) | (F.col("du") == F.col("dv"))
    o = ed.select(
        F.when(keep, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(keep, F.col("dst")).otherwise(F.col("src")).alias("v"),
    ).localCheckpoint(eager=True)  # probed three times below
    wedges = (
        o.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .join(o.select(F.col("u").alias("b"), F.col("v").alias("c")), "b")
    )
    tri = wedges.join(
        o.select(F.col("u").alias("a"), F.col("v").alias("c")), ["a", "c"]
    )
    corners = tri.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007), made DETERMINISTIC: every node starts with its own id
    as label; each round it adopts the label that maximizes
    (neighbor count, -label) — the tie always breaks to the LOWEST
    label, so the result is independent of shuffle/visit order (the
    classic async-LPA nondeterminism is removed; this is the
    synchronous variant both engines can replay bit-for-bit).

    One round = one edge-labels join + one (node, label) count
    aggregation + one argmax per node: all keyed shuffles, no global
    state. ``edges`` should be symmetrized; isolated direction-only
    nodes keep their own label. Returns (node, label) — nodes sharing
    a label after convergence form a community (denser than weak
    components: labels stop at sparse cuts where min-id components
    flood through)."""
    e = edges.select("src", "dst").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    for i in range(iterations):
        votes = (
            e.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        best = votes.groupBy("node").agg(
            F.expr("max_by(label, struct(cnt, -label))").alias("new_label")
        )
        labels = nodes.join(best, "node", "left").select(
            "node",
            F.coalesce("new_label", F.col("node")).alias("label"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            labels = labels.localCheckpoint(eager=True)
    return labels


def degree_stats(edges: DataFrame) -> DataFrame:
    """Degree distribution of an edge list: for each total degree
    (out-degree of ``src`` occurrences), how many nodes have it.
    Returns (degree BIGINT, n_nodes BIGINT). One agg chain, two
    shuffles, no driver materialization."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


def connected_components(edges: DataFrame, max_iters: int = 20) -> DataFrame:
    """Weakly connected components of an edge list: (node, component)
    where component = the minimum node id in the component.

    Thin adapter over the battle-tested pointer-jumping resolver
    (llm/dedup.neardup_clusters: O(log diameter) iterations, constant-
    size plans via per-iteration checkpoints, driver sees only a 1-row
    change count) — same algorithm, graph-flavored column names.
    """
    from ..llm.dedup import neardup_clusters

    pairs = edges.select(F.col("src").alias("d1"), F.col("dst").alias("d2"))
    out = neardup_clusters(pairs, max_iters=max_iters)
    return out.select(
        F.col("doc_id").alias("node"), F.col("canonical_id").alias("component")
    )
