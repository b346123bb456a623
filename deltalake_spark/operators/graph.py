"""Graph operators over edge-list DataFrames: degree stats and
degree-oriented triangle counting.

Engine-native north-star surface (the reference has no graph ops;
``connected_components`` for near-dup clustering lives in
``operators/dedup.py``). Co-occurrence graphs — parts bought together,
docs sharing spans, users sharing sessions — are standard corpus-
analysis structures, and triangle counting is the canonical "does this
engine handle graph joins" workload.

Scale shape: the naive triangle join (adjacency ⋈ adjacency ⋈ edges)
explodes on high-degree nodes — a celebrity node of degree d produces
d² wedge candidates. The fix is the classic degree orientation
(node-iterator++ / Schank-Wagner): orient every undirected edge from
the (degree, id)-smaller endpoint to the larger, turning the graph into
a DAG where every vertex's OUT-degree is O(sqrt(|E|)) for any graph —
wedges are enumerated only from each node's oriented out-neighborhood,
so the worst case drops from d² to |E|^1.5 total with no skew hotspot.
Every triangle is counted exactly once (it has exactly one vertex with
two out-edges under a total order). Three shuffles: degree agg, wedge
self-join, closing-edge join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["canonical_edges", "degree_stats", "triangle_count"]


def canonical_edges(df: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Canonicalize an undirected edge list: drop self-loops, order
    endpoints (u < v), dedupe. The required input form for
    :func:`degree_stats` / :func:`triangle_count`."""
    u = F.least(F.col(src), F.col(dst)).alias("u")
    v = F.greatest(F.col(src), F.col(dst)).alias("v")
    return (
        df.filter(F.col(src) != F.col(dst))
        .select(u, v)
        .distinct()
    )


def degree_stats(edges: DataFrame) -> DataFrame:
    """Per-node degree of a canonical edge list (one symmetric expand +
    one agg shuffle)."""
    sym = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node")))
    return sym.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))


def triangle_count(edges: DataFrame, *, per_node: bool = False) -> DataFrame:
    """Count triangles in a canonical undirected edge list.

    Returns a 1-row ``n_triangles`` frame, or per-node counts
    (``node, n_triangles`` — each triangle credited to all three
    corners) with ``per_node=True``.

    Uses degree orientation (see module docstring): wedges come only
    from oriented out-neighborhoods, bounding the self-join blow-up on
    skewed graphs; the closing join checks the third edge in oriented
    form, so each triangle is found exactly once.
    """
    deg = degree_stats(edges)
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("dv"))
    with_deg = edges.join(du, "u").join(dv, "v")
    # orient by (degree, id): lower endpoint -> higher endpoint
    oriented = with_deg.select(
        F.when((F.col("du") < F.col("dv"))
               | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
               F.struct(F.col("u").alias("a"), F.col("v").alias("b")))
        .otherwise(F.struct(F.col("v").alias("a"), F.col("u").alias("b")))
        .alias("e")
    ).select("e.a", "e.b")
    # wedges: two out-edges of the same source (b1 < b2 avoids double
    # counting the unordered pair)
    o1 = oriented.select(F.col("a").alias("w_src"), F.col("b").alias("b1"))
    o2 = oriented.select(F.col("a").alias("w_src"), F.col("b").alias("b2"))
    wedges = o1.join(o2, "w_src").filter(F.col("b1") < F.col("b2"))
    # the closing edge: b1 < b2 already matches the canonical (u, v)
    # form, so join the original edge list directly — no re-orientation
    closing = edges.select(F.col("u").alias("b1"), F.col("v").alias("b2"))
    tris = wedges.join(closing, ["b1", "b2"])
    if not per_node:
        return tris.agg(F.count(F.lit(1)).alias("n_triangles"))
    # explode the three corners in ONE pass — a union of three
    # projections would replay the wedge+closing join three times
    corners = tris.select(
        F.explode(F.array("w_src", "b1", "b2")).alias("node"))
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles"))
