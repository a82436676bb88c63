"""Distributed triangle counting via degree orientation (G2,
beyond-reference) — the canonical "joins, done right, beat graph
frameworks" workload (Suri & Vassilvitskii 2011's MR-friendly
orientation; the same algorithm inside GraphFrames' triangleCount).

Why orientation matters at 100 TB: the naive wedge join (edges ⋈ edges
on the shared endpoint) explodes on high-degree nodes — a degree-d hub
contributes d² wedge rows. Directing every edge from its LOWER
(degree, id) endpoint to the higher caps every out-degree at O(√|E|),
so the wedge join is at most |E|^{3/2} rows TOTAL (the combinatorial
optimum for triangle listing), independent of hub degree. Skewed
degree distributions — exactly what co-occurrence graphs have — go
from quadratic blowup to the √ bound.

Plan shape: three joins and an aggregate, all equi-joins on node ids
(shuffle-partitioned; no broadcast assumption — at scale every relation
here is corpus-sized), plus two keyed degree aggregations. Nothing
iterative, nothing Python-side.

Each triangle {a,b,c} is counted exactly once: orientation is a total
order (ties on degree break by node id), so of the 6 possible wedge
(center) choices only the one rooted at the smallest-ordered vertex
survives the closing-edge check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_edges(edges: DataFrame) -> DataFrame:
    """Undirected simple-graph canonical form: (u < v), deduplicated,
    self-loops dropped. Shared by the operator and the scale-curve tool."""
    return (
        edges.filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"),
            F.greatest("u", "v").alias("v"),
        )
        .dropDuplicates()
    )


def degrees(canon: DataFrame) -> DataFrame:
    """(node, deg) over the canonical edge list."""
    return (
        canon.select(F.col("u").alias("node"))
        .unionAll(canon.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def orient(canon: DataFrame, deg: DataFrame) -> DataFrame:
    """(src, dst) with every edge directed from its lower-(deg, id)
    endpoint — out-degrees capped at O(√|E|)."""
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    with_deg = canon.join(du, "u").join(dv, "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return with_deg.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )


def triangle_count(edges: DataFrame, materialize: bool = True) -> DataFrame:
    """1-row (n_nodes, n_edges, n_triangles) for an undirected simple
    graph given as (u, v) pairs in any order/duplication.

    ``materialize`` localCheckpoints the three shared relations (canon,
    deg, oriented) — each is referenced 2–4 times downstream and Catalyst
    does NOT share the subtrees: the r16 before-plan of g2 carried 72
    parquet scans / 116 exchanges because the edge-construction self-join
    was re-planned under every reference (optimization guide §3.3/§5 —
    materialize a many-referenced intermediate to truncate the plan).
    Measured at sf0.1: 21.7 s → see OPTIMIZATION_r16.md. Pass False to
    keep the single-plan form (g2a's audit evidence needs the sampling
    filter visible in the final plan)."""
    canon = canonical_edges(edges)
    if materialize:
        canon = canon.localCheckpoint()
    deg = degrees(canon)
    if materialize:
        deg = deg.localCheckpoint()
    oriented = orient(canon, deg)
    if materialize:
        oriented = oriented.localCheckpoint()
    wedges = oriented.alias("e1").join(
        oriented.alias("e2"), F.col("e1.dst") == F.col("e2.src")
    ).select(
        F.col("e1.src").alias("a"), F.col("e1.dst").alias("b"), F.col("e2.dst").alias("c")
    )
    # the closing edge of a wedge a->b->c is always oriented a->c: the
    # orientation follows a total order, and a ≺ b ≺ c implies a ≺ c —
    # so the reversed direction can never match and is not probed
    closed = wedges.join(
        oriented.select(F.col("src").alias("a"), F.col("dst").alias("c")),
        ["a", "c"],
        "left_semi",
    )
    return (
        closed.agg(F.count(F.lit(1)).alias("n_triangles"))
        .crossJoin(F.broadcast(deg.agg(F.count(F.lit(1)).alias("n_nodes"))))
        .crossJoin(F.broadcast(canon.agg(F.count(F.lit(1)).alias("n_edges"))))
        .select("n_nodes", "n_edges", "n_triangles")
    )


def sample_edges(canon: DataFrame, p_num: int, p_den: int) -> DataFrame:
    """DOULION edge sparsification (Tsourakakis et al., KDD 2009) made
    cross-engine deterministic: keep a canonical edge iff
    ``portable_hash32(u || ',' || v) % p_den < p_num`` — a fixed
    p = p_num/p_den Bernoulli draw derived from the edge identity itself,
    so Spark and the DuckDB oracle sample the IDENTICAL subgraph and the
    estimate is hash-checkable, not just statistically plausible."""
    from pdf_etl_pipeline_spark.functions.scalars import portable_hash32

    key = F.concat_ws(",", F.col("u").cast("string"), F.col("v").cast("string"))
    return canon.filter(portable_hash32(key) % p_den < p_num)


def triangle_count_sampled(edges: DataFrame, p_num: int, p_den: int) -> DataFrame:
    """DOULION approximate triangle count: run the SAME degree-oriented
    exact counter on a deterministically p-sparsified edge set, then
    scale by 1/p³ (each surviving triangle needed all 3 of its edges
    kept). 1 row: (n_edges_sampled, n_triangles_sampled, est_triangles).

    Why this is the bounded path at the next decade: the wedge join is
    the exact counter's cost center at |E|^{3/2}; sampling at rate p cuts
    it to (p|E|)^{3/2} — p=0.3 is ~6× less wedge volume — while the
    estimator stays unbiased with variance ~1/p³ per triangle (the
    measured sf1 point is in SCALE.md). Everything downstream of the
    one-line filter is the audited exact plan; no new shuffle shape."""
    canon = canonical_edges(edges)
    sampled = sample_edges(canon, p_num, p_den)
    scale = (p_den / p_num) ** 3
    # materialize=False: g2a's audit (_g2a_sample_before_join) verifies the
    # hash draw sits below the degree/orient joins by reading the FINAL
    # plan — a checkpoint cut would hide the filter from it, and the
    # sampled wedge volume is already ~6x down, so the recompute this
    # keeps is proportionally cheaper than exact g2's was
    counted = triangle_count(sampled, materialize=False)
    return counted.select(
        F.col("n_edges").alias("n_edges_sampled"),
        F.col("n_triangles").alias("n_triangles_sampled"),
        F.round(F.col("n_triangles") * F.lit(scale), 6).alias("est_triangles"),
    )


def triangle_count_sampled_sql(edges_sql: str, p_num: int, p_den: int) -> str:
    """DuckDB oracle for :func:`triangle_count_sampled` — identical
    deterministic sparsification, then the naive a<b<c 3-way join (a
    different exact algorithm over the same sampled subgraph)."""
    from pdf_etl_pipeline_spark.functions.scalars import portable_hash32_sql

    h = portable_hash32_sql("CAST(u AS VARCHAR) || ',' || CAST(v AS VARCHAR)")
    scale = (p_den / p_num) ** 3
    return f"""
WITH edges0 AS ({edges_sql}),
edges AS (SELECT u, v FROM edges0 WHERE {h} % {p_den} < {p_num}),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e1.v = e2.u
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT (SELECT COUNT(*) FROM edges) AS n_edges_sampled,
       n_triangles AS n_triangles_sampled,
       round(n_triangles * {scale!r}, 6) AS est_triangles
FROM tri"""


def triangle_count_sql(edges_sql: str) -> str:
    """DuckDB oracle: the naive a<b<c canonical 3-way join — a DIFFERENT
    algorithm than the degree-oriented plan, same count by construction
    (each triangle has exactly one a<b<c labeling). ``edges_sql`` must
    yield canonical (u, v) pairs with u < v, deduplicated."""
    return f"""
WITH edges AS ({edges_sql}),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e1.v = e2.u
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT (SELECT COUNT(DISTINCT node)
        FROM (SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)) AS n_nodes,
       (SELECT COUNT(*) FROM edges) AS n_edges,
       n_triangles
FROM tri"""


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """Per-node LOCAL clustering coefficient — 2·T(v) / (deg(v)·(deg(v)−1))
    for every node of degree ≥ 2 (the neighborhood-density score behind
    community detection and spam/bot features).

    Same degree-oriented wedge join as :func:`triangle_count` (|E|^{3/2}
    bound, hub-skew immune): each triangle is LISTED exactly once at its
    orientation root, exploded to its three corners (linear in the triangle
    count), and counted per node — one keyed aggregate, then a join with the
    degree relation. No per-node neighborhood materialization: the naive
    "intersect adjacency lists per node" shape is quadratic on hubs.
    """
    # same shared-relation materialization as triangle_count (canon/deg/
    # oriented are each referenced 2-4x; Catalyst re-plans the edge
    # self-join under every reference otherwise — guide §3.3/§5)
    canon = canonical_edges(edges).localCheckpoint()
    deg = degrees(canon).localCheckpoint()
    oriented = orient(canon, deg).localCheckpoint()
    wedges = oriented.alias("e1").join(
        oriented.alias("e2"), F.col("e1.dst") == F.col("e2.src")
    ).select(
        F.col("e1.src").alias("a"), F.col("e1.dst").alias("b"), F.col("e2.dst").alias("c")
    )
    closed = wedges.join(
        oriented.select(F.col("src").alias("a"), F.col("dst").alias("c")),
        ["a", "c"],
        "left_semi",
    )
    corners = closed.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )
    tri_per_node = corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
    return (
        deg.filter(F.col("deg") >= 2)
        .join(tri_per_node, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
            F.round(
                F.coalesce("n_triangles", F.lit(0))
                * 2.0
                / (F.col("deg") * (F.col("deg") - F.lit(1))),
                6,
            ).alias("clustering_coeff"),
        )
    )


def clustering_coefficients_sql(edges_sql: str) -> str:
    """DuckDB oracle: naive a<b<c triangle listing, corners unnested,
    joined with degrees — a different listing order, the same per-node
    counts by construction."""
    return f"""
WITH edges AS ({edges_sql}),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM edges e1
  JOIN edges e2 ON e1.v = e2.u
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
),
corners AS (
  SELECT unnest([a, b, c]) AS node FROM tri
),
tpn AS (SELECT node, COUNT(*) AS nt FROM corners GROUP BY 1),
deg AS (
  SELECT node, COUNT(*) AS deg
  FROM (SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
  GROUP BY 1
)
SELECT d.node, d.deg, CAST(COALESCE(t.nt, 0) AS BIGINT) AS n_triangles,
       round(COALESCE(t.nt, 0) * 2.0 / (d.deg * (d.deg - 1)), 6) AS clustering_coeff
FROM deg d LEFT JOIN tpn t ON d.node = t.node
WHERE d.deg >= 2
ORDER BY d.node"""
