"""Seed-labeled BFS and sampled harmonic centrality (engine addition,
SURVEY.md §2.6 family).

``seeded_bfs`` keeps one frontier PER SEED — state rows are ``(seed, id,
dist)`` — so downstream operators get exact per-seed distances instead of
``bfs``'s min-over-seeds. That is the building block for landmark methods;
here it powers sampled harmonic centrality (Boldi & Vigna 2014; the
Eppstein–Wang sampling argument): with seed sample S,

    C_H(v) = Σ_{s in S, d(s,v) > 0} 1 / d(s,v)

approximates harmonic centrality up to |S|/n scaling. Exact all-pairs
centrality is O(n·m) and not a 100 TB operation; a hash-chosen seed sample
is the standard scale path, and because the seeds are chosen by id hash the
estimate is deterministic and SQL-mirrorable end to end.

Scale shape: per round one keyed equi-join (frontier × adjacency) + one
anti-join against the visited set, all narrow long triples; state is
O(|S| · reached). Visited is localCheckpointed per round; the frontier
count that materializes the round also terminates the loop (one action per
superstep, kernel-loop discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def seeded_bfs(
    edges: DataFrame,
    sources: DataFrame,
    *,
    src: str = "s",
    dst: str = "t",
    direction: str = "undirected",
    max_iter: int = 100,
    max_depth: int | None = None,
) -> DataFrame:
    """Per-seed hop distances ``(seed, id, dist)`` — every (seed, vertex)
    pair with the vertex reachable from that seed (the seed itself at
    dist 0). Directions as in ``bfs``; ``max_depth`` truncates expansion
    deliberately, ``max_iter`` exhaustion raises."""
    if direction not in ("forward", "backward", "undirected"):
        raise ValueError("direction must be forward | backward | undirected")
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if direction == "backward":
        e = e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    elif direction == "undirected":
        e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # joined every round — materialize the deduped adjacency once instead of
    # re-running the distinct per frontier expansion (bfs/sssp discipline)
    e = e.where(F.col("a") != F.col("b")).distinct().persist()

    try:
        visited = (
            sources.select(F.col(sources.columns[0]).alias("seed"))
            .distinct()
            .select("seed", F.col("seed").alias("id"), F.lit(0).cast("long").alias("dist"))
            .localCheckpoint(eager=True)
        )
        frontier = visited.select("seed", "id")
        n_prev = visited.count()
        limit = max_iter if max_depth is None else min(max_iter, max_depth)
        for depth in range(1, limit + 1):
            cand = (
                frontier.join(e, F.col("id") == F.col("a"))
                .select("seed", F.col("b").alias("id"))
                .distinct()
            )
            new = cand.join(visited, ["seed", "id"], "left_anti").select(
                "seed", "id", F.lit(depth).cast("long").alias("dist")
            )
            visited = visited.unionByName(new).localCheckpoint(eager=False)
            n_cur = visited.count()
            if n_cur == n_prev:
                return visited
            frontier = new.select("seed", "id")
            n_prev = n_cur
        if max_depth is not None:
            return visited
        raise RuntimeError(
            f"seeded_bfs frontier still expanding after max_iter={max_iter} rounds"
        )
    finally:
        # every round's visited state is checkpointed by its count action,
        # so the adjacency cache can be released on any exit
        e.unpersist()


def betweenness_centrality(
    edges: DataFrame,
    sources: DataFrame,
    *,
    src: str = "s",
    dst: str = "t",
    direction: str = "undirected",
    max_iter: int = 100,
) -> DataFrame:
    """Sampled betweenness (Brandes 2001 dependency accumulation over a
    seed sample — the standard estimator; exact betweenness is O(n·m)):
    (id, betweenness) with betweenness(v) = Σ_seeds δ_seed(v).

    Forward phase: one frontier level at a time PER SEED, each new level's
    shortest-path counts σ aggregated from its predecessors (one keyed
    join + one keyed sum + one anti-join per level). Backward phase:
    δ accumulates level-by-level downward, δ(v) = Σ_{w: succ}
    σ(v)/σ(w) · (1 + δ(w)) — each level is computed exactly once from the
    level above, so there is no iterated-self-join lineage growth; every
    level is checkpointed. Raises if the BFS is still expanding after
    ``max_iter`` levels (the gate passes the oracle's unroll cap here, so
    engine and oracle depths can never silently diverge)."""
    if direction not in ("forward", "backward", "undirected"):
        raise ValueError("direction must be forward | backward | undirected")
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if direction == "backward":
        e = e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    elif direction == "undirected":
        e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    e = e.where(F.col("a") != F.col("b")).distinct().localCheckpoint(eager=True)

    f0 = (
        sources.select(F.col(sources.columns[0]).alias("seed"))
        .distinct()
        .select("seed", F.col("seed").alias("id"), F.lit(1).cast("long").alias("sigma"))
        .localCheckpoint(eager=True)
    )
    levels = [f0]
    visited = f0.select("seed", "id")
    for _ in range(max_iter):
        cand = (
            levels[-1]
            .join(e, F.col("id") == F.col("a"))
            .groupBy("seed", F.col("b").alias("nid"))
            .agg(F.sum("sigma").alias("sigma"))
            .withColumnRenamed("nid", "id")
        )
        new = cand.join(visited, ["seed", "id"], "left_anti").localCheckpoint(
            eager=True
        )
        if new.count() == 0:
            break
        levels.append(new)
        visited = (
            visited.unionByName(new.select("seed", "id"))
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(
            f"betweenness_centrality BFS still expanding after max_iter="
            f"{max_iter} levels"
        )

    if len(levels) == 1:
        return f0.select(
            F.col("id"), F.lit(0.0).alias("betweenness")
        ).where(F.lit(False))
    dl = levels[-1].withColumn("delta", F.lit(0.0))
    # every reached non-seed vertex appears in the result, zero or not:
    # the deepest level contributes its (terminal, delta = 0) rows
    acc = [dl.select("id", "delta")]
    for k in range(len(levels) - 2, -1, -1):
        w = dl.select(
            "seed",
            F.col("id").alias("wid"),
            F.col("sigma").alias("wsigma"),
            "delta",
        )
        succ = e.select(F.col("a").alias("id"), F.col("b").alias("wid"))
        contrib = (
            levels[k]
            .join(succ, "id")
            .join(w, ["seed", "wid"])
            .groupBy("seed", "id")
            .agg(
                F.sum(
                    F.col("sigma") / F.col("wsigma") * (F.lit(1.0) + F.col("delta"))
                ).alias("c")
            )
        )
        dl = (
            levels[k]
            .join(contrib, ["seed", "id"], "left")
            .select(
                "seed", "id", "sigma", F.coalesce(F.col("c"), F.lit(0.0)).alias("delta")
            )
            .localCheckpoint(eager=False)
        )
        if k >= 1:
            acc.append(dl.select("id", "delta"))
    out = acc[0]
    for df in acc[1:]:
        out = out.unionByName(df)
    return out.groupBy("id").agg(F.sum("delta").alias("betweenness"))


def harmonic_centrality(
    edges: DataFrame,
    sources: DataFrame,
    *,
    src: str = "s",
    dst: str = "t",
    direction: str = "undirected",
    max_iter: int = 100,
) -> DataFrame:
    """(id, harmonic): Σ over sample seeds of 1/d(seed, id), seeds chosen by
    the caller (pass a hash-chosen sample for the deterministic estimator).
    Vertices unreached from every seed are absent (harmonic 0 by
    convention); seeds contribute nothing to themselves (d=0 excluded)."""
    d = seeded_bfs(
        edges, sources, src=src, dst=dst, direction=direction, max_iter=max_iter
    )
    return (
        d.where(F.col("dist") > 0)
        .groupBy("id")
        .agg(F.sum(F.lit(1.0) / F.col("dist")).alias("harmonic"))
    )
