"""deepgraph_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the query / data-processing capabilities of deepgraph/deepgraph
(pandas + numpy + Cython, single-process; see /root/reference) as idiomatic
Spark: DataFrame plans for everything Catalyst can optimize, Arrow-vectorized
pandas stages (``applyInPandas`` / ``mapInPandas``) only where pairwise
connector/selector semantics genuinely require them, and driver-side superstep
loops with checkpoint/resume for the iterative graph kernels.

The data model mirrors the reference (deepgraph.py:82-99): a node table ``v``
and an edge table ``e`` keyed by ``(s, t)`` with the upper-triangle invariant
``s < t`` (deepgraph.py:232-234) — both plain Spark DataFrames here.
"""

from deepgraph_spark.core import DeepGraphFrame
from deepgraph_spark.edges import create_edges, create_edges_ft
from deepgraph_spark.session import get_spark

__all__ = ["DeepGraphFrame", "create_edges", "create_edges_ft", "get_spark"]

__version__ = "0.1.0"
