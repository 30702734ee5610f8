"""Deterministic random walks — reproducible DeepWalk-style corpus
generation (Perozzi et al. 2014) without RNG state.

The step rule replaces the RNG with a content-independent hash: at step
``i`` of the walk started at ``start``, the next neighbor is

    rank = hash60(start ':' i ':' current) % deg(current)

over the current vertex's neighbors ranked by id. The walk corpus is
therefore a pure function of the graph + seed — stable across reruns,
repartitions, and executor counts (the property that matters when the
walks feed a 100 TB embedding pipeline: re-running a failed shard
regenerates byte-identical training sequences), and every step is
SQL-mirrorable (md5 hash + ROW_NUMBER ranking), so the whole corpus is
value-oracle-able.

Plan shape: neighbor ranking is ONE keyed window (partitioned by vertex —
never a global window) computed once and checkpointed; each step is two
keyed joins (degree, then (vertex, rank) equi-join into the ranked
adjacency). State per walk is ``(start, current)`` — two longs — and the
output is the exploded ``(start, step, vertex)`` table. Walks that hit a
dead end (directed sink) stop early; with ``directed=False`` (default,
symmetrized adjacency) every vertex in the edge set has degree >= 1 and
all walks run to full length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from deepgraph_spark.pipeline.dedup import hash60


def random_walks(
    edges: DataFrame,
    *,
    walk_length: int = 4,
    seed: int = 7,
    src: str = "s",
    dst: str = "t",
    directed: bool = False,
) -> DataFrame:
    """(start, step, vertex) rows: one hash-deterministic walk of
    ``walk_length`` steps from every vertex (step 0 = the start itself,
    so each full walk emits ``walk_length + 1`` rows).

    ``seed`` folds into every step hash — different seeds give independent
    walk corpora over the same graph (run W seeds for W walks per vertex).
    """
    if walk_length < 1:
        raise ValueError("random_walks requires walk_length >= 1")
    a = edges.select(F.col(src).alias("v"), F.col(dst).alias("n"))
    if not directed:
        a = a.unionByName(a.select(F.col("n").alias("v"), F.col("v").alias("n")))
    adj = a.where(F.col("v") != F.col("n")).distinct()
    ranked = adj.withColumn(
        "r", F.row_number().over(Window.partitionBy("v").orderBy("n")) - 1
    ).localCheckpoint(eager=True)
    deg = ranked.groupBy("v").agg(F.count(F.lit(1)).alias("d"))

    starts = ranked.select(F.col("v").alias("start")).distinct()
    state = starts.select("start", F.col("start").alias("c"))
    out = state.select("start", F.lit(0).alias("step"), F.col("c").alias("vertex"))
    for i in range(walk_length):
        pick = hash60(
            F.concat(
                F.col("start").cast("string"),
                F.lit(f":{seed}:{i}:"),
                F.col("c").cast("string"),
            )
        )
        state = (
            state.join(deg, F.col("c") == F.col("v"))
            .select("start", "c", (pick % F.col("d")).alias("want"))
            .join(
                ranked.select(
                    F.col("v").alias("c"), F.col("n"), F.col("r").alias("want")
                ),
                ["c", "want"],
            )
            .select("start", F.col("n").alias("c"))
            .localCheckpoint(eager=False)
        )
        out = out.unionByName(
            state.select(
                "start", F.lit(i + 1).alias("step"), F.col("c").alias("vertex")
            )
        )
    return out
