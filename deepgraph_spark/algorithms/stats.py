"""Whole-graph summary statistics in one bounded pass.

The profiling numbers you want BEFORE launching an iterative kernel on a
100 TB edge table: size, degree shape (mean/max), Newman degree
assortativity, and the global clustering coefficient — together they say
whether the graph is hub-skewed (salting / middle-degree caps needed),
assortative (community-heavy, CC/LPA converge slowly), and how triangle-
dense the wedge joins will be.

Engine addition past the reference's per-pair connectors: the reference
profiles graphs driver-side after a `return_cs_graph`/`return_nx_graph`
export (deepgraph.py:1746-2057); here it is a handful of keyed
aggregations plus the degree-oriented triangle plan, returning ONE row.

Everything except the triangle count is two shuffles (degree agg + edge-
endpoint degree join); the triangle term reuses ``triangles_df``'s
degree-ordered orientation, so the quadratic wedge step stays bounded by
O(sqrt(m)) out-neighborhoods even on skewed graphs.

Assortativity is Newman's Pearson r over the SYMMETRIZED edge list (each
undirected edge contributes both orientations, the standard convention —
makes the two endpoint-degree marginals identical). Expression shape is
kept mirror-able: plain sums/counts composed exactly like the DuckDB
oracle, so both engines divide the same doubles. Degenerate graphs (all
degrees equal → zero variance) return NULL assortativity on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepgraph_spark.algorithms.motifs import _undirected_simple
from deepgraph_spark.algorithms.triangles import triangles_df


def local_clustering(
    edges: DataFrame, *, src: str = "s", dst: str = "t", index_col: str = "id"
) -> DataFrame:
    """(id, degree, triangles, clustering): per-vertex local clustering
    coefficient triangles / C(degree, 2) (Watts–Strogatz), 0.0 for degree
    <= 1 — the per-vertex companion of ``graph_summary``'s global
    transitivity, and a standard hub/noise feature for link tables.

    Same plan family: one symmetrize+distinct shared by the degree
    aggregation and the degree-oriented triangle join; the per-vertex
    triangle counts fan each triangle to its three corners (keyed agg);
    one left join stitches them onto the degree table. The ratio divides
    a long by a long-valued product — identical doubles on any engine."""
    und = _undirected_simple(edges, src, dst).localCheckpoint(eager=True)
    deg = und.groupBy(F.col("s").alias(index_col)).agg(
        F.count(F.lit(1)).alias("degree")
    )
    tri = triangles_df(und, src="s", dst="t")
    corners = (
        tri.select(F.col("a").alias(index_col))
        .unionByName(tri.select(F.col("b").alias(index_col)))
        .unionByName(tri.select(F.col("c").alias(index_col)))
    )
    per_v = corners.groupBy(index_col).agg(F.count(F.lit(1)).alias("triangles"))
    out = deg.join(per_v, index_col, "left").select(
        index_col,
        "degree",
        F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
        F.round(
            F.when(
                F.col("degree") >= 2,
                F.coalesce(F.col("triangles"), F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1) / 2),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("clustering"),
    )
    return out


def graph_summary(
    edges: DataFrame, *, src: str = "s", dst: str = "t"
) -> DataFrame:
    """One row: (n_vertices, n_edges, avg_degree, max_degree,
    assortativity, global_clustering) of the undirected simple graph.

    global_clustering = 3 * triangles / wedges (the transitivity ratio;
    wedges = Σ_v C(deg(v), 2) counted exactly in decimal so hub-heavy
    graphs cannot overflow a long before the final division).
    """
    und = _undirected_simple(edges, src, dst).localCheckpoint(eager=True)
    # und carries both orientations: groupBy(s) degrees ARE undirected
    # degrees, and each undirected edge appears exactly twice
    deg = und.groupBy(F.col("s").alias("v")).agg(F.count(F.lit(1)).alias("d"))
    deg_stats = deg.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        (F.sum("d") / 2).cast("long").alias("n_edges"),
        (F.sum("d") / F.count(F.lit(1))).alias("avg_degree"),
        F.max("d").alias("max_degree"),
        F.sum(
            (F.col("d").cast("decimal(38,0)") * (F.col("d") - F.lit(1)) / 2).cast(
                "decimal(38,0)"
            )
        ).alias("wedges"),
    )
    # endpoint degrees over the symmetrized edges; x/y marginals identical
    ed = und.join(deg.select(F.col("v").alias("s"), F.col("d").alias("dx")), "s").join(
        deg.select(F.col("v").alias("t"), F.col("d").alias("dy")), "t"
    )
    mom = ed.agg(
        F.count(F.lit(1)).alias("m2"),
        F.sum(F.col("dx").cast("double")).alias("sx"),
        F.sum(F.col("dx").cast("double") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dx").cast("double") * F.col("dy")).alias("sxy"),
    )
    tri = triangles_df(und, src="s", dst="t").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    # 1-row cross joins: three scalars meet, no data motion
    row = deg_stats.crossJoin(mom).crossJoin(tri)
    mean = F.col("sx") / F.col("m2")
    var = F.col("sxx") / F.col("m2") - mean * mean
    cov = F.col("sxy") / F.col("m2") - mean * mean
    return row.select(
        "n_vertices",
        "n_edges",
        F.round("avg_degree", 6).alias("avg_degree"),
        "max_degree",
        F.round(F.when(var > 0, cov / var), 6).alias("assortativity"),
        F.round(
            F.when(
                F.col("wedges") > 0,
                F.lit(3.0)
                * F.col("n_triangles")
                / F.col("wedges").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("global_clustering"),
    )
