"""Small-motif counting beyond triangles (engine addition, SURVEY.md §2.6).

4-cycle (C4) counting via the diagonal identity: in a simple undirected
graph, every 4-cycle {u,v,w,x} is determined by its two diagonals (u,w) and
(v,x); a vertex pair with ``p`` common neighbors closes ``C(p,2)`` cycles
through itself as a diagonal, and each cycle has exactly two diagonals, so

    #C4 = (1/2) * sum_over_pairs C(p, 2) = sum_over_pairs p*(p-1) / 4.

The plan is two keyed joins + two aggregations, all JVM: wedge enumeration
(join the adjacency with itself on the middle vertex), then a count per
endpoint pair. Shuffle volume is the wedge count (sum of deg^2 over middle
vertices) — the same hub sensitivity as any wedge-based scheme; on skewed
graphs cap or sample hub middles upstream (the events/link graphs the gate
runs are band-bounded, so the wedge count stays linear-ish).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def common_neighbor_pairs(
    edges: DataFrame, *, src: str = "s", dst: str = "t"
) -> DataFrame:
    """(a, b, p): ordered pairs a < b with their common-neighbor count p >= 1
    in the undirected simple graph. The building block for C4 counting and a
    useful similarity table in its own right (co-citation strength)."""
    a = edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    und = (
        a.unionByName(a.select(F.col("t").alias("s"), F.col("s").alias("t")))
        .where(F.col("s") != F.col("t"))
        .distinct()
    )
    n1 = und.select(F.col("s").alias("m"), F.col("t").alias("a"))
    n2 = und.select(F.col("s").alias("m"), F.col("t").alias("b"))
    wedges = n1.join(n2, "m").where(F.col("a") < F.col("b"))
    return wedges.groupBy("a", "b").agg(F.count(F.lit(1)).alias("p"))


def four_cycle_count(edges: DataFrame, *, src: str = "s", dst: str = "t") -> DataFrame:
    """One-row DataFrame ``(n_four_cycles,)`` — the number of (unordered,
    vertex-distinct) 4-cycles in the undirected simple graph."""
    pairs = common_neighbor_pairs(edges, src=src, dst=dst)
    # sum p*(p-1) is divisible by 4 (2 ordered diagonal choices x 2 diagonals)
    return pairs.agg(
        (F.coalesce(F.sum(F.col("p") * (F.col("p") - F.lit(1))), F.lit(0)) / 4)
        .cast("long")
        .alias("n_four_cycles")
    )
