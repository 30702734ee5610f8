"""Weighted single-source(-set) shortest paths (engine addition, §2.6).

Generalizes :mod:`deepgraph_spark.algorithms.bfs`'s frontier loop from hop
counting to min-plus relaxation (distributed Bellman-Ford): per superstep,
relax every edge leaving the vertices whose distance improved last round,
take the min candidate per destination, and merge into the running distance
table. The reference's tutorials export to graph-tool precisely for
traversals (terrorists.py:222,310) — BFS covers hops, this covers weighted
distance (e.g. time-delta-weighted transcript graphs).

Superstep discipline mirrors bfs.py: the state is localCheckpointed each
round, and the single aggregation action that materializes it also counts
the improved vertices, which decides termination — one action per
superstep, flat lineage. Rounds = max hop count over all shortest paths
(frontier relaxation makes the work per round proportional to the improved
set's out-degree sum, not the whole graph).

At 100 TB scale: one keyed equi-join (edges × frontier, partitioned by
vertex id) + one min-aggregation + one full-outer merge per superstep, all
JVM; shuffle volume O(frontier out-degree + |reached|). Negative weights
are rejected up front (min-plus with frontier pruning assumes
non-negativity); unreachable vertices are absent from the result, like bfs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sssp_superstep(
    e: DataFrame, state: DataFrame, max_dist: float | None
) -> DataFrame:
    """One min-plus relaxation round: relax edges leaving the improved
    frontier, min-aggregate candidates per destination, apply the distance
    budget (INSIDE the round — before the state merge, so the state never
    holds beyond-budget vertices; tests/test_plans.py guards that the
    budget filter stays below the merge join), then full-outer merge into
    the running distance table."""
    frontier = state.where(F.col("imp")).select(
        F.col("id").alias("a"), F.col("dist").alias("da")
    )
    cand = (
        e.join(frontier, "a")
        .groupBy(F.col("b").alias("id"))
        .agg(F.min(F.col("da") + F.col("w")).alias("nd"))
    )
    if max_dist is not None:
        cand = cand.where(F.col("nd") <= F.lit(float(max_dist)))
    merged = state.select("id", "dist").join(cand, "id", "full_outer")
    return merged.select(
        "id",
        F.least(
            F.coalesce("dist", F.lit(float("inf"))),
            F.coalesce("nd", F.lit(float("inf"))),
        ).alias("dist"),
        (
            F.col("dist").isNull()
            | (F.col("nd").isNotNull() & (F.col("nd") < F.col("dist")))
        ).alias("imp"),
    )


def sssp(
    edges: DataFrame,
    sources: DataFrame,
    *,
    src: str = "s",
    dst: str = "t",
    weight: str = "w",
    direction: str = "forward",
    max_iter: int = 100,
    max_dist: float | None = None,
) -> DataFrame:
    """Minimum weighted distance from the closest source vertex.

    ``sources``: single-column DataFrame of seed vertex ids (dist 0).
    ``direction``: 'forward' (follow s→t), 'backward', or 'undirected'.
    Returns ``(id, dist)`` (dist: double) for every vertex reachable from
    any seed. Parallel edges collapse to their min weight. Raises on
    negative weights, and if still improving after ``max_iter`` rounds.

    ``max_dist``: distance budget — candidates beyond it are dropped INSIDE
    the loop, so the state (and every per-superstep join) only ever holds the
    within-budget ball, not the whole reachable set. Exact, not approximate:
    with non-negative weights every prefix of a within-budget path is itself
    within budget, so pruning cannot cut an optimal path. Result = exactly
    the vertices with true distance ≤ ``max_dist`` (the primitive behind
    :meth:`DeepGraphFrame.ego_net_weighted`).
    """
    if direction not in ("forward", "backward", "undirected"):
        raise ValueError("direction must be forward | backward | undirected")
    if max_dist is not None and max_dist < 0:
        raise ValueError(f"max_dist must be non-negative, got {max_dist}")
    e = edges.select(
        F.col(src).alias("a"),
        F.col(dst).alias("b"),
        F.col(weight).cast("double").alias("w"),
    )
    if direction == "backward":
        e = e.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
    elif direction == "undirected":
        e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"), "w"))
    e = (
        e.where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
        .persist()  # joined every superstep — never recompute upstream
    )
    wmin = e.agg(F.min("w")).collect()[0][0]
    if wmin is not None and wmin < 0:
        raise ValueError(
            f"sssp requires non-negative weights (min weight {wmin}); "
            "min-plus frontier relaxation does not handle negative edges"
        )

    state = (
        sources.select(F.col(sources.columns[0]).alias("id"))
        .distinct()
        .withColumn("dist", F.lit(0.0))
        .withColumn("imp", F.lit(True))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(max_iter):
            new_state = _sssp_superstep(e, state, max_dist).localCheckpoint(
                eager=False
            )
            # one action: materializes the round and counts improvements
            n_imp = new_state.agg(
                F.sum(F.col("imp").cast("long")).alias("n")
            ).collect()[0]["n"]
            state.unpersist()
            state = new_state
            if not n_imp:
                break
        else:
            raise RuntimeError(
                f"sssp still improving after max_iter={max_iter} rounds — "
                "raise max_iter (rounds = max hops over shortest paths)"
            )
        return state.select("id", "dist")
    finally:
        e.unpersist()
