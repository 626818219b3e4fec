"""GA4 — triangle counting by the edge-iterator scheme.

Undirected semantics.  Canonical edges (a<b); wedges a<b<c from
(a,b)⋈(b,c); a wedge closes iff (a,c) is an edge — checked with a
semi-join.  Two shuffles total; the ordering constraint a<b<c counts
each triangle exactly once and keeps hub wedge lists bounded by
orienting edges from low to high degree?  No — by id; degree-orientation
is an optimization documented for the 100×-scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm2ch_spark.graph.adjacency import undirected_edges


def _canonical(edges: DataFrame) -> DataFrame:
    und = undirected_edges(edges)
    return und.filter(F.col("u") < F.col("v")).distinct()


def triangles_df(edges: DataFrame) -> DataFrame:
    """All triangles as (a, b, c) with a < b < c."""
    canon = _canonical(edges)
    e1 = canon.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = canon.select(F.col("u").alias("b"), F.col("v").alias("c"))
    wedges = e1.join(e2, "b").select("a", "b", "c")
    closing = canon.select(F.col("u").alias("a"), F.col("v").alias("c"))
    return wedges.join(closing, ["a", "c"], "left_semi").select("a", "b", "c")


def triangle_count(edges: DataFrame) -> int:
    return triangles_df(edges).count()


def triangles_per_vertex(edges: DataFrame) -> DataFrame:
    """(vertex, triangles) — number of triangles through each vertex."""
    t = triangles_df(edges)
    verts = (
        edges.select(F.col("source_vertex").alias("vertex"))
        .unionAll(edges.select(F.col("target_vertex").alias("vertex")))
        .distinct()
    )
    hits = (
        t.select(F.col("a").alias("vertex"))
        .unionAll(t.select(F.col("b").alias("vertex")))
        .unionAll(t.select(F.col("c").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("tri"))
    )
    return verts.join(hits, "vertex", "left").select(
        "vertex", F.coalesce("tri", F.lit(0)).cast("long").alias("triangles")
    )
