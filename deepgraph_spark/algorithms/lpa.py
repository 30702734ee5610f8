"""Synchronous label propagation over the undirected edge view.

Deterministic update (north_rule demands exact parity): each superstep every
vertex adopts the most frequent label among its neighbors, ties broken by the
smaller label; isolated vertices keep their label. Initial label = vertex id.
Converges when no label changes (or ``max_iter``). Synchronous + ordered
tie-break makes the result independent of partitioning — the engine-wide
invariance property (SURVEY.md §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from deepgraph_spark.algorithms.checkpoint import SuperstepCheckpoint


def label_propagation(
    edges: DataFrame,
    *,
    src: str = "s",
    dst: str = "t",
    vertices: DataFrame | None = None,
    index_col: str = "id",
    max_iter: int = 10,
    checkpoint_dir: str | None = None,
    job_id: str = "lpa",
    resume: bool = True,
    weight: str | None = None,
) -> DataFrame:
    """Returns ``(id, label)``.

    ``weight``: edge-weight column → weighted LPA: each vertex adopts the
    label with the largest TOTAL incoming weight (ties still break on the
    smaller label, keeping the partitioning-invariance property). The
    symmetrized edge view sums weights over parallel/bidirectional
    duplicates. Determinism caveat (round-6 advice): the "integer-valued
    weights sum exactly in double" property that makes the vote tie-breaks
    partitioning-invariant only holds while every per-vertex incoming
    Σ|w| stays below 2^53 — so that bound is ENFORCED (one agg over the
    RAW symmetrized per-vertex abs-weight totals, so mixed-sign weights
    that cancel within a (u, v) pair cannot slip under it), and it fires
    only when a superstep will actually run — ``max_iter=0`` or an
    already-converged resume constructs the plan without any driver job
    (round-7 advice). Past the bound the fix is to rescale weights to
    coarser units upstream. The superstep plan shape
    is unchanged: the vote aggregation sums ``w`` instead of counting
    rows."""
    spark = edges.sparkSession
    ckpt = SuperstepCheckpoint(spark, checkpoint_dir, job_id)

    check_weight_bound = None
    if weight is None:
        sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).union(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        ).distinct().persist()
        vote = F.count(F.lit(1))
    else:
        wc = F.col(weight).cast("double").alias("w")
        raw_sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"), wc).union(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"), wc)
        )
        sym = raw_sym.groupBy("u", "v").agg(F.sum("w").alias("w")).persist()
        vote = F.sum("w")

        def check_weight_bound() -> None:
            # enforce the 2^53 exactness bound on per-vertex vote totals (any
            # per-(vertex, label) vote sum is <= the vertex's total incoming
            # weight, and Σ|x| exact in double implies every partial Σx is):
            # see the docstring's determinism caveat. Summed from the RAW
            # symmetrized weights (round-7 advice) — abs over the per-(u, v)
            # groupBy sums would let mixed-sign weights that cancel within a
            # pair slip under the bound even though their partial sums still
            # exceed 2^53 during aggregation.
            max_tot = (
                raw_sym.groupBy("u")
                .agg(F.sum(F.abs(F.col("w"))).alias("tot"))
                .agg(F.max("tot"))
                .collect()[0][0]
            )
            if max_tot is not None and max_tot >= 2.0**53:
                raise ValueError(
                    f"label_propagation weight column {weight!r}: max per-vertex "
                    f"incoming weight total {max_tot:.3e} >= 2^53, so double vote "
                    "sums are no longer exact and tie-breaks become shuffle-order-"
                    "dependent — rescale weights to coarser units upstream"
                )

    if vertices is not None:
        verts = vertices.select(F.col(vertices.columns[0]).alias("id")).distinct()
    else:
        verts = sym.select(F.col("u").alias("id")).distinct()

    labels = verts.select("id", F.col("id").alias("label"))
    start_iter = 0
    if resume:
        latest = ckpt.latest()
        if latest is not None:
            start_iter, labels, m = latest
            if m.get("changed", 1) == 0:
                start_iter = max_iter  # already converged
            else:
                start_iter += 1

    if check_weight_bound is not None and start_iter < max_iter:
        # validation only gates the vote aggregation, so it runs lazily —
        # only when at least one superstep will actually execute (round-7
        # advice: no collect job at call time for max_iter=0 or an
        # already-converged resume)
        check_weight_bound()

    prev_state = None
    for k in range(start_iter, max_iter):
        nbr_labels = sym.join(
            labels.select(F.col("id").alias("v"), "label"), "v"
        ).select(F.col("u").alias("id"), "label", *(["w"] if weight else []))
        counts = nbr_labels.groupBy("id", "label").agg(vote.alias("cnt"))
        w = Window.partitionBy("id").orderBy(F.desc("cnt"), F.asc("label"))
        best = counts.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).select(
            "id", F.col("label").alias("new_label")
        )
        # prev label carried in state → one action per superstep (the changed
        # count materializes the checkpointed state)
        new_state = labels.join(best, "id", "left").select(
            "id",
            F.coalesce("new_label", "label").alias("label"),
            F.col("label").alias("prev"),
        )
        if ckpt.enabled:
            new_state = ckpt.save(k, new_state, {"superstep": k})
        else:
            new_state = new_state.localCheckpoint(eager=False)
        changed = new_state.where(F.col("label") != F.col("prev")).count()
        ckpt.update_metrics(k, {"changed": int(changed)})
        if prev_state is not None and not ckpt.enabled:
            prev_state.unpersist()  # previous superstep's local checkpoint
        prev_state = new_state
        labels = new_state.drop("prev")
        if changed == 0:
            break

    sym.unpersist()
    return labels.select("id", "label")
