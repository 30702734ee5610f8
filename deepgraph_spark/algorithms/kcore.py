"""k-core extraction by iterative degree peeling over the undirected edge
view (engine addition alongside the north-rule kernels — the reference has no
graph algorithms; SURVEY.md §2.6).

Each peel round removes every vertex whose current undirected simple-graph
degree is below ``k``, until a fixed point: exactly the classic k-core
definition (Seidman 1983), and — like LPA/CC here — a synchronous,
deterministic iteration whose result is independent of partitioning.

Scale shape: one round = one degree aggregate + two anti-joins, all keyed
hash operations on narrow ``(s, t)`` long pairs; the surviving edge set is
localCheckpointed per round so lineage stays flat, and the convergence test
rides the same action that materializes the round (no extra job). Degrees
shrink monotonically, so per-round cost falls as the graph peels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_core(
    edges: DataFrame,
    k: int,
    *,
    src: str = "s",
    dst: str = "t",
    max_iter: int = 100,
) -> tuple[DataFrame, list[dict]]:
    """Return ``(members, history)``: the vertices of the ``k``-core (ids of
    every vertex whose coreness is >= k) and per-round metrics.

    Edge direction and multiplicity are ignored (undirected simple graph:
    symmetrize + distinct); vertices with no surviving edge are not in any
    core with ``k >= 1``.
    """
    if k <= 0:
        raise ValueError("k_core requires k >= 1 (k=0 is every vertex)")
    a = edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    und = (
        a.unionByName(a.select(F.col("t").alias("s"), F.col("s").alias("t")))
        .where(F.col("s") != F.col("t"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    history: list[dict] = []
    prev = und
    for _ in range(max_iter):
        deg = prev.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
        bad = deg.where(F.col("deg") < k).select("s")
        cur = (
            prev.join(bad, "s", "left_anti")
            .join(bad.withColumnRenamed("s", "t"), "t", "left_anti")
            .select("s", "t")
            .localCheckpoint(eager=False)
        )
        # one action materializes the round AND decides convergence: the
        # peel is monotone, so "no edges removed" == "no vertex was bad"
        n_prev = history[-1]["n_edges"] if history else und.count()
        n_cur = cur.count()
        history.append({"n_edges": n_cur, "removed_edges": n_prev - n_cur})
        old = prev
        prev = cur
        if old is not und:
            old.unpersist()
        if n_cur == n_prev:
            break
    else:
        # never return a non-fixed-point member set silently (round-3 advice)
        live = history[-1]["n_edges"] if history else "all"
        raise RuntimeError(
            f"k_core did not reach a fixed point within max_iter={max_iter} "
            f"rounds ({live} edges still live); raise max_iter"
        )
    members = prev.select(F.col("s").alias("id")).distinct()
    und.unpersist()  # free the initial checkpoint's storage blocks
    return members, history
