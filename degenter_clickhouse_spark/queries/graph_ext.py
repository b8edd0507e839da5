"""Graph-centrality queries (extended registry): integer PageRank and
degree distribution over the user<->item activity graph derived from
``events`` (user_id -[props.k]-> item).

No reference counterpart — this is the training-data-curation
extension family (link-graph centrality as a document/host quality
prior). Node namespace: user nodes are ``user_id*2`` (even), item
nodes are ``k*2+1`` (odd) — a collision-free integer encoding both
engines compute identically.

The PageRank oracle is the SAME integer power iteration unrolled as
CTEs (one contribution + one rank CTE per round): because every step
is integer (truncating div, integer sums), Spark's iterative plan and
DuckDB's unrolled SQL agree bit-for-bit — no float tolerance needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..operators import graph
from . import register_extended

_SCALE = graph.DEFAULT_SCALE
_ITER = 5
_DAMP = 85
_BASE = (100 - _DAMP) * _SCALE // 100

_EDGE_CTES = """
raw AS (
  SELECT user_id * 2 AS src,
         CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 + 1 AS dst
  FROM events
),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM raw
    UNION ALL
    SELECT dst AS src, src AS dst FROM raw
  )
),
deg AS (SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges)
"""


def _pagerank_oracle() -> str:
    parts = [
        _EDGE_CTES.strip(),
        f"r0 AS (SELECT node, CAST({_SCALE} AS BIGINT) AS rank FROM nodes)",
    ]
    for i in range(1, _ITER + 1):
        parts.append(
            f"c{i} AS (SELECT e.dst AS node,"
            f" CAST(SUM(r.rank // d.out_deg) AS BIGINT) AS s"
            f" FROM edges e JOIN r{i - 1} r ON e.src = r.node"
            f" JOIN deg d ON e.src = d.src GROUP BY e.dst)"
        )
        parts.append(
            f"r{i} AS (SELECT n.node,"
            f" CAST({_BASE} + ({_DAMP} * COALESCE(c.s, 0)) // 100 AS BIGINT)"
            f" AS rank FROM nodes n LEFT JOIN c{i} c ON n.node = c.node)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT node,
       CASE WHEN node % 2 = 0 THEN 'user' ELSE 'item' END AS node_type,
       rank
FROM r{_ITER}
ORDER BY rank DESC, node
LIMIT 20
"""
    )


PAGERANK_ORACLE = _pagerank_oracle()


def _activity_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog.load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    raw = ev.select(
        (F.col("user_id") * 2).alias("src"), (k * 2 + 1).alias("dst")
    )
    return graph.symmetrize(raw)


@register_extended("graph_pagerank", PAGERANK_ORACLE)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 nodes of the symmetrized user<->item activity graph by
    5-round integer PageRank (damping 0.85, scale 1e12)."""
    ranks = graph.pagerank(
        _activity_edges(spark, sf_dir), iterations=_ITER,
        damping_pct=_DAMP, scale=_SCALE,
    )
    return (
        ranks.select(
            "node",
            F.when(F.col("node") % 2 == 0, "user")
            .otherwise("item")
            .alias("node_type"),
            "rank",
        )
        .orderBy(F.desc("rank"), "node")
        .limit(20)
    )


DEGREE_ORACLE = (
    "WITH "
    + _EDGE_CTES.strip()
    + """,
node_deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS degree
             FROM edges GROUP BY src)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM node_deg GROUP BY degree
"""
)


@register_extended("graph_degree_stats", DEGREE_ORACLE)
def q_graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the symmetrized activity graph."""
    return graph.degree_stats(_activity_edges(spark, sf_dir))


# ---------------------------------------------------------------------------
# Triangle counting over the item-item co-occurrence graph: items are
# linked when they share >= 25% of all active users (adaptive
# threshold — scale-free, works at every oracle sf). Triangle density
# is the classic community-structure / spam-farm signal on host
# graphs feeding corpus curation. The oracle replays the SAME
# degree-ordered orientation, so counts match exactly.
# ---------------------------------------------------------------------------

# shared co-occurrence CTE prefix (items linked when they share
# >= 25% of all active users): reused by the triangle + LPA oracles
_COOC_CTES = """
ui AS (
  SELECT DISTINCT user_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
),
nu AS (SELECT COUNT(DISTINCT user_id) AS n FROM ui),
ce AS (
  SELECT a.k AS u, b.k AS v, COUNT(*) AS shared
  FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.k < b.k
  GROUP BY a.k, b.k
),
und AS (SELECT u, v FROM ce WHERE shared * 4 >= (SELECT n FROM nu)),
sym AS (SELECT u AS src, v AS dst FROM und
        UNION ALL SELECT v, u FROM und)
"""

TRIANGLES_ORACLE = f"""
WITH {_COOC_CTES.strip()},
deg AS (SELECT src, COUNT(*) AS d FROM sym GROUP BY src),
o AS (
  SELECT CASE WHEN du.d <= dv.d THEN e.u ELSE e.v END AS u,
         CASE WHEN du.d <= dv.d THEN e.v ELSE e.u END AS v
  FROM und e JOIN deg du ON e.u = du.src JOIN deg dv ON e.v = dv.src
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM o e1
  JOIN o e2 ON e1.v = e2.u
  JOIN o e3 ON e3.u = e1.u AND e3.v = e2.v
),
corners AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM corners GROUP BY node
ORDER BY n_triangles DESC, node
LIMIT 20
"""


def _cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (src < dst) item edges: pairs sharing >= 25% of all
    active users. The per-user self-join is blocked on user_id (the
    SNM-style bounded fanout surface: per-user item count is the skew
    envelope — cap or salt it for adversarial users at 100 TB)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    # checkpoint: the (user, item) distinct feeds BOTH sides of the
    # self-join plus the threshold scalar — one JSON-parse + distinct
    # instead of three replays
    ui = (
        ev.select("user_id", k.alias("k"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nu = ui.agg(F.countDistinct("user_id").alias("__n_users"))
    a = ui.select("user_id", F.col("k").alias("u"))
    b = ui.select("user_id", F.col("k").alias("v"))
    return (
        a.join(b, "user_id")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("shared"))
        .crossJoin(F.broadcast(nu))
        .filter(F.col("shared") * 4 >= F.col("__n_users"))
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )


@register_extended("graph_triangles", TRIANGLES_ORACLE)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 items by triangle membership in the >= 25%-shared-users
    item co-occurrence graph (degree-ordered orientation — see
    operators/graph.triangle_counts for the O(m^1.5) bound)."""
    edges = _cooccurrence_edges(spark, sf_dir)
    return (
        graph.triangle_counts(edges)
        .orderBy(F.desc("n_triangles"), "node")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Personalized PageRank: teleport mass lands only on a curated seed
# set (items with k < 10) — TrustRank-style corpus-quality expansion.
# ---------------------------------------------------------------------------

_SEEDS_SQL = (
    "SELECT DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)"
    " * 2 + 1 AS node FROM events"
    " WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) < 10"
)


def _ppr_oracle() -> str:
    parts = [
        _EDGE_CTES.strip(),
        f"seeds AS ({_SEEDS_SQL})",
        f"r0 AS (SELECT n.node,"
        f" CAST(CASE WHEN s.node IS NOT NULL THEN {_SCALE} ELSE 0 END"
        f" AS BIGINT) AS rank"
        f" FROM nodes n LEFT JOIN seeds s ON n.node = s.node)",
    ]
    for i in range(1, _ITER + 1):
        parts.append(
            f"c{i} AS (SELECT e.dst AS node,"
            f" CAST(SUM(r.rank // d.out_deg) AS BIGINT) AS s"
            f" FROM edges e JOIN r{i - 1} r ON e.src = r.node"
            f" JOIN deg d ON e.src = d.src GROUP BY e.dst)"
        )
        parts.append(
            f"r{i} AS (SELECT n.node,"
            f" CAST(CASE WHEN sd.node IS NOT NULL THEN {_BASE} ELSE 0 END"
            f" + ({_DAMP} * COALESCE(c.s, 0)) // 100 AS BIGINT) AS rank"
            f" FROM nodes n"
            f" LEFT JOIN seeds sd ON n.node = sd.node"
            f" LEFT JOIN c{i} c ON n.node = c.node)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT node,
       CASE WHEN node % 2 = 0 THEN 'user' ELSE 'item' END AS node_type,
       rank
FROM r{_ITER}
ORDER BY rank DESC, node
LIMIT 20
"""
    )


PPR_ORACLE = _ppr_oracle()


@register_extended("graph_pagerank_seeded", PPR_ORACLE)
def q_graph_pagerank_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 nodes by personalized PageRank seeded at items k < 10."""
    ev = catalog.load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    seeds = (
        ev.select((k * 2 + 1).alias("node"))
        .filter(k < 10)
        .distinct()
    )
    ranks = graph.personalized_pagerank(
        _activity_edges(spark, sf_dir), seeds,
        iterations=_ITER, damping_pct=_DAMP, scale=_SCALE,
    )
    return (
        ranks.select(
            "node",
            F.when(F.col("node") % 2 == 0, "user")
            .otherwise("item")
            .alias("node_type"),
            "rank",
        )
        .orderBy(F.desc("rank"), "node")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Label-propagation communities over the same co-occurrence graph —
# deterministic synchronous LPA (ties to the LOWEST label), so the
# unrolled-CTE oracle replays it bit-for-bit like the PageRank one.
# ---------------------------------------------------------------------------

_LPA_ITER = 3


def _lpa_oracle() -> str:
    parts = [
        _COOC_CTES.strip(),
        "lnodes AS (SELECT DISTINCT src AS node FROM sym)",
        "l0 AS (SELECT node, node AS label FROM lnodes)",
    ]
    for i in range(1, _LPA_ITER + 1):
        parts.append(
            f"v{i} AS (SELECT e.dst AS node, l.label, COUNT(*) AS cnt"
            f" FROM sym e JOIN l{i - 1} l ON e.src = l.node"
            f" GROUP BY e.dst, l.label)"
        )
        parts.append(
            f"b{i} AS (SELECT node, label AS new_label FROM ("
            f"SELECT node, label, ROW_NUMBER() OVER ("
            f"PARTITION BY node ORDER BY cnt DESC, label ASC) AS rn"
            f" FROM v{i}) WHERE rn = 1)"
        )
        parts.append(
            f"l{i} AS (SELECT n.node,"
            f" COALESCE(b.new_label, n.node) AS label"
            f" FROM lnodes n LEFT JOIN b{i} b ON n.node = b.node)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node, CAST(label AS BIGINT) AS label FROM l{_LPA_ITER}"
    )


LPA_ORACLE = _lpa_oracle()


@register_extended("graph_communities", LPA_ORACLE)
def q_graph_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label propagation (3 rounds) over the
    item co-occurrence graph: (node, label) community assignment."""
    edges = graph.symmetrize(_cooccurrence_edges(spark, sf_dir))
    return graph.label_propagation(edges, iterations=_LPA_ITER)
