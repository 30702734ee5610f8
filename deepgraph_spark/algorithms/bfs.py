"""Multi-source BFS / hop distance (engine addition, SURVEY.md §2.6).

The reference's tutorials export to graph-tool precisely to run traversals
(terrorists.py:222,310); this keeps them distributed. Frontier superstep:
each round joins the current frontier to the edge table and anti-joins
already-visited vertices — per round one keyed equi-join + one anti-join on
narrow long pairs, shuffle volume O(frontier-degree sum). The visited set is
localCheckpointed per round so lineage stays flat; the frontier-count action
that materializes it also decides termination (one action per superstep).

At 100 TB scale: the frontier join partitions by vertex id like every other
kernel here; rounds = graph eccentricity from the seed set (band/link graphs
are shallow). Unreached vertices are simply absent from the result (the
reference's traversal semantics) — left-join against a vertex table to get
nulls if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs(
    edges: DataFrame,
    sources: DataFrame,
    *,
    src: str = "s",
    dst: str = "t",
    direction: str = "forward",
    max_iter: int = 100,
    max_depth: int | None = None,
) -> DataFrame:
    """Hop distance from the closest source vertex.

    ``sources``: single-column DataFrame of seed vertex ids. ``direction``:
    'forward' (follow s→t), 'backward' (t→s), or 'undirected'. Returns
    ``(id, dist)`` for every vertex reachable from any seed (seeds: dist 0).
    Raises if the frontier is still non-empty after ``max_iter`` rounds.
    ``max_depth`` instead TRUNCATES deliberately: expansion stops after that
    many hops with no error (k-hop neighborhoods, ego nets).
    """
    if direction not in ("forward", "backward", "undirected"):
        raise ValueError("direction must be forward | backward | undirected")
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if direction == "backward":
        e = e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    elif direction == "undirected":
        e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # joined every round — materialize the deduped adjacency once instead of
    # re-running the distinct per frontier expansion (sssp's discipline)
    e = e.where(F.col("a") != F.col("b")).distinct().persist()

    visited = (
        sources.select(F.col(sources.columns[0]).alias("id"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = visited.select("id")
    n_prev = visited.count()
    limit = max_iter if max_depth is None else min(max_iter, max_depth)
    for k in range(1, limit + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("id", "a"), "a")
            .select(F.col("b").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .withColumn("dist", F.lit(k).cast("long"))
        )
        new_visited = visited.union(nxt).localCheckpoint(eager=False)
        # one action: materializes the checkpoint and measures the frontier
        n_total = new_visited.count()
        visited.unpersist()
        visited = new_visited
        if n_total == n_prev:
            break
        n_prev = n_total
        frontier = new_visited.where(F.col("dist") == k).select("id")
    else:
        if max_depth is None or limit < max_depth:
            e.unpersist()
            raise RuntimeError(f"bfs frontier still active after max_iter={max_iter}")
    e.unpersist()  # visited is checkpointed per round; the cache can go
    return visited
