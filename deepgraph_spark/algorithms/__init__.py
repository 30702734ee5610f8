"""Distributed graph kernels over the (s, t) edge table.

The reference delegates these to scipy/graph-tool exports
(deepgraph.py:1746-2242; append_cp at deepgraph.py:2244-2319); here they are
first-class distributed operators: driver-side superstep loops over
checkpointed DataFrames.
"""

from deepgraph_spark.algorithms.bfs import bfs
from deepgraph_spark.algorithms.centrality import (
    betweenness_centrality,
    harmonic_centrality,
    seeded_bfs,
)
from deepgraph_spark.algorithms.checkpoint import SuperstepCheckpoint
from deepgraph_spark.algorithms.components import connected_components
from deepgraph_spark.algorithms.kcore import k_core
from deepgraph_spark.algorithms.ktruss import k_truss
from deepgraph_spark.algorithms.linkpred import link_prediction_scores
from deepgraph_spark.algorithms.lpa import label_propagation
from deepgraph_spark.algorithms.motifs import common_neighbor_pairs, four_cycle_count
from deepgraph_spark.algorithms.pagerank import pagerank
from deepgraph_spark.algorithms.scc import strongly_connected_components
from deepgraph_spark.algorithms.sssp import sssp
from deepgraph_spark.algorithms.stats import graph_summary, local_clustering
from deepgraph_spark.algorithms.triangles import triangle_count, triangles_per_vertex
from deepgraph_spark.algorithms.walks import random_walks

__all__ = [
    "SuperstepCheckpoint",
    "betweenness_centrality",
    "bfs",
    "common_neighbor_pairs",
    "connected_components",
    "four_cycle_count",
    "graph_summary",
    "harmonic_centrality",
    "seeded_bfs",
    "k_core",
    "k_truss",
    "label_propagation",
    "link_prediction_scores",
    "local_clustering",
    "pagerank",
    "random_walks",
    "sssp",
    "strongly_connected_components",
    "triangle_count",
    "triangles_per_vertex",
]
