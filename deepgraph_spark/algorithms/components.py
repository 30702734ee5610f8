"""Connected components via alternating large-star / small-star.

Distributed CC in O(log n) supersteps (Kiveris et al., "Connected Components
in MapReduce and Beyond") expressed as DataFrame self-joins + min
aggregations. Replaces the reference's driver-side
``scipy.sparse.csgraph.connected_components`` call (append_cp,
deepgraph.py:2244-2319) while reproducing its post-processing exactly:

* canonical labels = the minimum vertex id of each component (north_rule's
  canonical min-vertex relabeling);
* ``label_by_size`` — relabel components 0..k-1 by decreasing size, ties
  broken by min-vertex id (deepgraph.py:2313-2319);
* ``consolidate_singles`` — all singleton components collapse to label 0 and
  non-singletons are numbered from 1 by decreasing size
  (deepgraph.py:2301-2311).

Vertex ids must be orderable (long / string). Requires ids comparable with
``least``/``greatest``; the min over a component is then well defined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepgraph_spark.algorithms.checkpoint import SuperstepCheckpoint


def _large_star(e: DataFrame) -> DataFrame:
    """(u,v) undirected → edges (v, m(u)) for v > u, m = min(Γ(u) ∪ {u})."""
    nbrs = e.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    mins = nbrs.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", "u").alias("m"))
    return (
        nbrs.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """orient u > v; for each u: link all smaller neighbors (and u) to the min."""
    ed = e.select(
        F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
    ).distinct()
    mins = ed.groupBy("u").agg(F.min("v").alias("m"))
    relink = (
        ed.join(mins, "u")
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .where(F.col("a") != F.col("b"))
    )
    self_link = mins.select(F.col("u").alias("a"), F.col("m").alias("b"))
    return relink.union(self_link).distinct()


def connected_components(
    edges: DataFrame,
    *,
    src: str = "s",
    dst: str = "t",
    vertices: DataFrame | None = None,
    index_col: str = "id",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    job_id: str = "cc",
    resume: bool = True,
    label_by_size: bool = True,
    consolidate_singles: bool = False,
    loop_partitions: int | None = None,
    persist_input: bool = False,
) -> DataFrame:
    """Returns ``(id, cp)``. ``cp`` is the size-ordered dense label by default
    (reference semantics); pass ``label_by_size=False`` for raw canonical
    min-vertex labels."""
    spark = edges.sparkSession
    ckpt = SuperstepCheckpoint(spark, checkpoint_dir, job_id)

    e0 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col(src) != F.col(dst)
    ).distinct()
    # persist_input caches the deduped input edge set. Only superstep 0 reads
    # it (twice, once per star pass) before ``e`` rebinds to checkpointed loop
    # state, and a same-session A/B at bench scale (sf0.1 event edges) showed
    # the eager cache COSTS ~55% wall time (4.08s -> 6.31s median, disjoint
    # repeat bands): the extra action + cache write outweigh one saved
    # re-evaluation. Off by default; the knob stays for callers that feed an
    # expensive upstream plan (e.g. a multi-join edge derivation).
    if persist_input:
        e0 = e0.persist()
    e = e0
    conf_parts = spark.conf.get("spark.sql.shuffle.partitions", "32")

    prev_sig = None
    prev_state = None
    try:
        # loop_partitions overrides the session shuffle width for the star
        # rounds (restored in the finally). Unlike the SCC label loop, a
        # measured A/B at bench scale showed NO win from auto-clamping here —
        # the star rounds are compute-heavy per row, not dispatch-bound — so
        # the default keeps the session setting and the knob stays explicit.
        if loop_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(loop_partitions))

        start_iter = 0
        if resume:
            latest = ckpt.latest()
            if latest is not None:
                start_iter, e, prev_metrics = latest
                if prev_metrics.get("converged"):
                    max_iter = 0  # skip straight to labeling
                start_iter += 1

        for k in range(start_iter, max_iter):
            e2 = _small_star(_large_star(e))
            # one action per superstep: the signature aggregation materializes
            # the (lazily) checkpointed edge set; durable mode re-reads parquet
            if ckpt.enabled:
                e2 = ckpt.save(k, e2, {"superstep": k})
            else:
                e2 = e2.localCheckpoint(eager=False)
            sig_row = e2.agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("hsh"),
            ).collect()[0]
            sig = (sig_row["cnt"], sig_row["hsh"])
            converged = sig == prev_sig
            if prev_state is not None and not ckpt.enabled:
                prev_state.unpersist()
            prev_state = e2
            e = e2
            ckpt.update_metrics(k, {"edges": int(sig_row["cnt"]), "converged": converged})
            if converged:
                break
            prev_sig = sig

        # final star forest: every a points at its component's min vertex b
        labels = e.groupBy("a").agg(F.min("b").alias("cp_raw")).select(
            F.col("a").alias(index_col), "cp_raw"
        )
        roots = e.select(F.col("b").alias(index_col)).distinct().join(
            labels.select(index_col), index_col, "left_anti"
        ).withColumn("cp_raw", F.col(index_col))
        all_labeled = labels.union(roots.select(index_col, "cp_raw"))

        if vertices is not None:
            vs = vertices.select(F.col(vertices.columns[0]).alias(index_col)).distinct()
            all_labeled = vs.join(all_labeled, index_col, "left").withColumn(
                "cp_raw", F.coalesce("cp_raw", F.col(index_col))
            )

        return finalize_component_labels(
            all_labeled, index_col, label_by_size, consolidate_singles
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", conf_parts)
        # the returned plan roots at the last localCheckpointed star state
        # (lineage truncated), so the INPUT edge cache can go (e is rebound
        # to the loop state — only the initial e0 is released here)
        if persist_input:
            e0.unpersist()


def finalize_component_labels(
    all_labeled: DataFrame,
    index_col: str,
    label_by_size: bool,
    consolidate_singles: bool,
) -> DataFrame:
    """Reference post-processing shared by weak CC and SCC: raw canonical
    min-vertex labels in ``cp_raw`` → the reference's size-ordered /
    singles-consolidated ``cp`` (deepgraph.py:2301-2319)."""
    if not (label_by_size or consolidate_singles):
        return all_labeled.withColumnRenamed("cp_raw", "cp")

    # size-ordered dense labels via sort+zipWithIndex — distributed (no
    # global single-partition window even with millions of components)
    from deepgraph_spark.core import with_dense_index

    sizes = all_labeled.groupBy("cp_raw").agg(F.count(F.lit(1)).alias("sz"))
    order = [F.desc("sz"), F.asc("cp_raw")]
    if consolidate_singles:
        # singletons → 0; others numbered from 1 by size desc (ties: min id)
        nonsingle = with_dense_index(sizes.where(F.col("sz") > 1), order, "cp_0")
        nonsingle = nonsingle.select("cp_raw", (F.col("cp_0") + 1).alias("cp"))
        mapping = sizes.join(nonsingle, "cp_raw", "left").fillna(0, subset=["cp"])
    else:
        mapping = with_dense_index(sizes, order, "cp")
    return all_labeled.join(mapping.select("cp_raw", "cp"), "cp_raw").select(index_col, "cp")
