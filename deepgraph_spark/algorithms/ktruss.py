"""k-truss extraction by iterative support peeling (engine addition
alongside k-core; SURVEY.md §2.6 family).

The k-truss (Cohen 2008) is the maximal subgraph in which every edge
participates in at least ``k - 2`` triangles *within the subgraph* — the
edge-analogue of the k-core and a much stronger cohesion filter (every
k-truss is inside the (k-1)-core, but not vice versa). Used at web scale
to strip bridge/noise edges before community detection.

Round = re-count per-edge triangle support on the surviving edge set, drop
edges below ``k - 2``, repeat to a fixed point — the classic synchronous
peel, deterministic and partitioning-independent. Support counting reuses
``triangles_df``'s degree-ordered orientation, so the quadratic wedge step
stays bounded by O(sqrt(m)) out-neighborhoods per round even on skewed
graphs; each triangle then contributes one row per side to a keyed count.
Everything is narrow long pairs; per-round cost falls monotonically as the
graph peels, and each round's state is localCheckpointed so lineage stays
flat. The convergence test rides the same count() that materializes the
round (k-core loop discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepgraph_spark.algorithms.triangles import triangles_df


def k_truss(
    edges: DataFrame,
    k: int,
    *,
    src: str = "s",
    dst: str = "t",
    max_iter: int = 100,
) -> tuple[DataFrame, list[dict]]:
    """Return ``(truss_edges, history)``: the canonical ``(s, t)`` (s < t)
    edges of the ``k``-truss, and per-round metrics.

    Direction and multiplicity are ignored (undirected simple graph).
    ``k=2`` is the whole simple graph (support >= 0 is vacuous) and returns
    immediately after one verification round.
    """
    if k < 2:
        raise ValueError("k_truss requires k >= 2 (the 2-truss is the whole graph)")
    canon = (
        edges.select(
            F.least(src, dst).alias("s"), F.greatest(src, dst).alias("t")
        )
        .where(F.col("s") != F.col("t"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    need = k - 2
    history: list[dict] = []
    prev = canon
    for _ in range(max_iter):
        tri = triangles_df(prev, src="s", dst="t")
        side = (
            tri.select(F.col("a").alias("s"), F.col("b").alias("t"))
            .unionByName(tri.select(F.col("a").alias("s"), F.col("c").alias("t")))
            .unionByName(tri.select(F.col("b").alias("s"), F.col("c").alias("t")))
        )
        sup = side.groupBy("s", "t").agg(F.count(F.lit(1)).alias("sup"))
        cur = (
            prev.join(sup, ["s", "t"], "left")
            .where(F.coalesce(F.col("sup"), F.lit(0)) >= need)
            .select("s", "t")
            .localCheckpoint(eager=False)
        )
        n_prev = history[-1]["n_edges"] if history else canon.count()
        n_cur = cur.count()
        history.append({"n_edges": n_cur, "removed_edges": n_prev - n_cur})
        old = prev
        prev = cur
        if old is not canon:
            old.unpersist()
        if n_cur == n_prev:
            break
    else:
        live = history[-1]["n_edges"] if history else "all"
        raise RuntimeError(
            f"k_truss did not reach a fixed point within max_iter={max_iter} "
            f"rounds ({live} edges still live); raise max_iter"
        )
    canon.unpersist()
    return prev, history
