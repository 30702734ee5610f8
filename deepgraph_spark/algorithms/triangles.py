"""Triangle counting on the oriented edge table.

The engine's edge tables already satisfy ``s < t`` (the reference's
upper-triangle invariant, deepgraph.py:232-234) — exactly the orientation
the standard distributed triangle join wants: each triangle {a<b<c} is found
once as (a,b) ⋈ (b,c) closed by (a,c). Two shuffle joins, no per-row Python;
AQE handles the skewed wedge-building join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _oriented(edges: DataFrame, src: str, dst: str) -> DataFrame:
    return (
        edges.select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def triangles_df(edges: DataFrame, *, src: str = "s", dst: str = "t") -> DataFrame:
    """All triangles as rows (a, b, c) with a < b < c."""
    e = _oriented(edges, src, dst)
    e1 = e.select(F.col("a"), F.col("b"))
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedges = e1.join(e2, "b").select("a", "b", "c")
    closing = e.select(F.col("a"), F.col("b").alias("c")).withColumn("_cl", F.lit(1))
    return wedges.join(closing, ["a", "c"], "left_semi").select("a", "b", "c")


def triangle_count(edges: DataFrame, *, src: str = "s", dst: str = "t") -> int:
    return triangles_df(edges, src=src, dst=dst).count()


def triangles_per_vertex(
    edges: DataFrame, *, src: str = "s", dst: str = "t", index_col: str = "id"
) -> DataFrame:
    """(id, triangles) — number of triangles each vertex participates in."""
    tri = triangles_df(edges, src=src, dst=dst)
    stacked = (
        tri.select(F.col("a").alias(index_col))
        .union(tri.select(F.col("b").alias(index_col)))
        .union(tri.select(F.col("c").alias(index_col)))
    )
    return stacked.groupBy(index_col).agg(F.count(F.lit(1)).alias("triangles"))
