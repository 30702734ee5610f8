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


def _unionfind_min_labels(pairs) -> dict:
    """Union-find with path compression over a small collected edge list:
    vertex -> min member id of its component — the same canonical label the
    distributed extraction produces. Used only below
    ``serial_tail_threshold`` (bounded driver work, the same serial-cutover
    pattern as SCC's ``_tarjan_min_labels``)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by label order so every root is its component's min
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {x: find(x) for x in parent}


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
    serial_tail_threshold: int = 50_000,
) -> DataFrame:
    """Returns ``(id, cp)``. ``cp`` is the size-ordered dense label by default
    (reference semantics); pass ``label_by_size=False`` for raw canonical
    min-vertex labels.

    ``serial_tail_threshold``: when the edge set is (or a star round contracts
    it to) at most this many rows, the remainder is collected and finished
    with a driver-side union-find — the same bounded serial cutover SCC's
    Multistep tail uses (``_tarjan_min_labels``), producing bit-identical
    canonical min labels. The up-front check is a bounded ``limit(t+1)``
    probe on the raw input (scan stops early — never a full pass at scale);
    past it, the cutover re-arms every superstep from the edge count the
    convergence signature already computes (zero extra actions). ``0``
    disables the tail (pure distributed loop). Disabled automatically with
    durable checkpointing, whose resume protocol owns the loop state."""
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

    # Serial-tail pre-probe: a bounded limit(t+1) count. On the raw input the
    # LocalLimit sits directly above the scan, so at corpus scale the probe
    # stops after ~t rows — never a full pass. With persist_input the probe
    # runs on the (cached) deduped set instead, so the rows it materializes
    # are the ones superstep 0 / the collect would need anyway.
    use_tail = bool(serial_tail_threshold) and not ckpt.enabled
    tail_source = None
    if use_tail:
        probe_df = e0 if persist_input else edges.select(
            F.col(src).alias("a"), F.col(dst).alias("b")
        ).where(F.col(src) != F.col(dst))
        if (
            probe_df.limit(serial_tail_threshold + 1).count()
            <= serial_tail_threshold
        ):
            tail_source = probe_df

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

        if tail_source is None:
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
                # star rounds contract the edge set geometrically — once the
                # remainder fits the serial tail, finish it there (the count is
                # the convergence signature's, so re-arming costs no action)
                if use_tail and int(sig_row["cnt"]) <= serial_tail_threshold:
                    tail_source = e2  # materialized by the signature action
                    break

        if tail_source is not None:
            # bounded driver tail: union-find over <= threshold edge rows —
            # identical canonical min labels, zero further supersteps
            labels_map = _unionfind_min_labels(
                (row["a"], row["b"]) for row in tail_source.collect()
            )
            import pandas as pd
            from pyspark.sql import types as T

            id_type = e0.schema["a"].dataType
            all_labeled = spark.createDataFrame(
                pd.DataFrame(
                    {
                        index_col: list(labels_map.keys()),
                        "cp_raw": list(labels_map.values()),
                    }
                ),
                T.StructType(
                    [
                        T.StructField(index_col, id_type),
                        T.StructField("cp_raw", id_type),
                    ]
                ),
            )
        else:
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
