"""Strongly connected components via reachability labeling.

Fills the reference's ``append_cp(directed=True, connection='strong')``
(deepgraph.py:2244-2319, which delegates to driver-side
``scipy.sparse.csgraph.connected_components``) with a distributed
algorithm in the FW-BW / coloring family (Fleischer et al. "On identifying
strongly connected components in parallel"; Slota et al. "Multistep"):

Per outer round, over the *active* subgraph:

1. ``f(v)`` = min vertex id among {v} ∪ ancestors(v)  (forward labels)
2. ``g(v)`` = min vertex id among {v} ∪ descendants(v) (backward labels)
3. Every vertex with ``f(v) == g(v) == c`` is extracted with SCC label
   ``c``: f(v)=c means c reaches v (or c=v), g(v)=c means v reaches c, so
   v and c are mutually reachable. Exactness: all members of SCC(c) share
   identical ancestor and descendant sets, hence identical (f, g); and c is
   the min of its own class, so the whole SCC(c) satisfies f=g=c.
4. Mutually-reachable vertices always share (f, g), so every SCC lies
   wholly inside one (f, g)-class — edges *crossing* classes can never be
   intra-SCC and are dropped; the loop recurses on the class-internal
   subgraph. Progress guarantee: the min-id vertex of every surviving
   class has f=g=itself on the restricted graph, so each round extracts at
   least one vertex per class (in practice whole layers at once — a
   monotone chain of k singleton SCCs finishes in 2 rounds, not k).

Each label propagation is a plain synchronous min-label fixed point:
O(label diameter) supersteps per phase — the standard complexity of
BFS-family distributed SCC (FW-BW and Multistep are likewise
diameter-bound per phase; see the rejection note on pointer jumping in
``_min_labels_fg``). Per superstep: one edge join + one min-aggregation —
all JVM-side, shuffle volume O(|E| + |V|), the same per-round cost profile
as the weak-CC kernel's.

Weak/directed semantics note: the reference's ``connection='weak'`` on a
directed graph is exactly undirected CC (scipy does the same symmetrize),
so only the strong path needs a new kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepgraph_spark.algorithms.checkpoint import SuperstepCheckpoint
from deepgraph_spark.algorithms.components import finalize_component_labels


def _min_labels_fg(verts: DataFrame, e: DataFrame, *, max_iter: int) -> DataFrame:
    """Joint fixed point of both reachability labels, ONE action per
    superstep (they are independent, so fusing them halves the job count):

    * flab(v) = min({v} ∪ {flab(u): u→v})  — min ancestor-or-self
    * glab(v) = min({v} ∪ {glab(w): v→w})  — min descendant-or-self

    Plain synchronous relaxation: O(label diameter) supersteps at FLAT
    per-superstep cost (measured stable through 35+ iterations), the
    standard complexity of BFS-family distributed SCC phases (Fleischer
    FW-BW, Slota Multistep are likewise diameter-bound per phase).
    Pointer-jumping (lab ← lab(lab)) was evaluated and rejected on two
    independent grounds: (1) no asymptotic help on adversarial id layouts —
    where ids run against the propagation direction every intermediate
    vertex's pointer is itself, so information still moves one hop per
    superstep; (2) ANY join whose two sides both derive from the iterated
    label state — one self-join or two, Column-object or USING condition,
    even with the pointer side eagerly checkpointed to its own RDD leaf —
    makes Spark 4 driver-side work grow exponentially from ~iteration 11
    (0.3 s/iter flat → 1.3 → 6 → 26 → 105+ s) despite constant-size plans,
    flat RDD lineage, and constant data. Joins against STATIC inputs (the
    edge table) stay flat indefinitely. ``verts`` is (id,), ``e`` is
    (a, b) meaning a→b. Returns (id, flab, glab)."""
    lab = verts.select("id", F.col("id").alias("flab"), F.col("id").alias("glab"))

    prev_sig = None
    prev_state = None
    for _ in range(max_iter):
        fnbr = (
            e.join(lab.select(F.col("id").alias("a"), F.col("flab").alias("nf")), "a")
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("nf").alias("nf"))
        )
        gnbr = (
            e.join(lab.select(F.col("id").alias("b"), F.col("glab").alias("ng")), "b")
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("ng").alias("ng"))
        )
        new = (
            lab.join(fnbr, "id", "left")
            .join(gnbr, "id", "left")
            .select(
                "id",
                F.least("flab", F.coalesce("nf", "flab")).alias("flab"),
                F.least("glab", F.coalesce("ng", "glab")).alias("glab"),
            )
            .localCheckpoint(eager=False)
        )
        # single action: signature aggregation materializes the checkpoint
        row = new.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.xxhash64("id", "flab", "glab").cast("decimal(38,0)")).alias("hsh"),
        ).collect()[0]
        sig = (row["cnt"], row["hsh"])
        if prev_state is not None:
            prev_state.unpersist()
        prev_state = new
        lab = new
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"_min_labels_fg did not converge in {max_iter} supersteps — raise max_label_iter"
        )
    return lab


def strongly_connected_components(
    edges: DataFrame,
    *,
    src: str = "s",
    dst: str = "t",
    vertices: DataFrame | None = None,
    index_col: str = "id",
    max_outer: int = 50,
    max_label_iter: int = 100,
    checkpoint_dir: str | None = None,
    job_id: str = "scc",
    resume: bool = True,
    label_by_size: bool = True,
    consolidate_singles: bool = False,
) -> DataFrame:
    """Returns ``(index_col, cp)`` where two vertices share ``cp`` iff each
    reaches the other along directed edges. ``cp`` is size-ordered dense by
    default (reference append_cp semantics); ``label_by_size=False`` gives
    raw canonical min-vertex labels. Vertex ids must be long-comparable.

    Checkpoint/resume: each outer round persists the assigned labels and the
    surviving class-internal edge set through the standard superstep
    protocol (kind-tagged rows), so a killed job restarts from the last
    complete outer round.
    """
    spark = edges.sparkSession
    ckpt = SuperstepCheckpoint(spark, checkpoint_dir, job_id)

    e = (
        edges.select(F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b"))
        .where(F.col("a") != F.col("b"))  # self-loops never change SCC membership
        .distinct()
    )
    if vertices is not None:
        v = vertices.select(
            F.col(vertices.columns[0]).cast("long").alias("id")
        ).distinct()
    else:
        v = e.select(F.col("a").alias("id")).union(e.select("b")).distinct()

    assigned = None  # (id, cp_raw), grown per outer round
    start_iter = 0
    if resume:
        latest = ckpt.latest()
        if latest is not None:
            k0, state, prev_metrics = latest
            assigned = state.where(F.col("kind") == "L").select(
                F.col("x").alias("id"), F.col("y").alias("cp_raw")
            )
            e = state.where(F.col("kind") == "E").select(
                F.col("x").alias("a"), F.col("y").alias("b")
            )
            v = state.where(F.col("kind") == "V").select(F.col("x").alias("id"))
            if prev_metrics.get("converged"):
                max_outer = 0
            start_iter = k0 + 1

    done = assigned is not None and max_outer == 0
    for k in range(start_iter, max_outer):
        lbl = _min_labels_fg(v, e, max_iter=max_label_iter)
        extracted = lbl.where(F.col("flab") == F.col("glab")).select(
            "id", F.col("flab").alias("cp_raw")
        )
        assigned = extracted if assigned is None else assigned.union(extracted)
        rest = lbl.where(F.col("flab") != F.col("glab"))

        # drop class-crossing edges: SCCs live wholly inside (f, g) classes
        ra = rest.select(
            F.col("id").alias("a"), F.col("flab").alias("fa"), F.col("glab").alias("ga")
        )
        rb = rest.select(
            F.col("id").alias("b"), F.col("flab").alias("fb"), F.col("glab").alias("gb")
        )
        e = (
            e.join(ra, "a").join(rb, "b")
            .where((F.col("fa") == F.col("fb")) & (F.col("ga") == F.col("gb")))
            .select("a", "b")
        )
        v = rest.select("id")

        # one durable state per outer round; a single count() action
        # materializes assigned+edges+verts together
        state = (
            assigned.select(F.lit("L").alias("kind"), F.col("id").alias("x"), F.col("cp_raw").alias("y"))
            .union(e.select(F.lit("E"), "a", "b"))
            .union(v.select(F.lit("V"), "id", F.lit(None).cast("long")))
        )
        state = ckpt.save(k, state, {"superstep": k})
        n_rest = state.where(F.col("kind") == "V").count()
        assigned = state.where(F.col("kind") == "L").select(
            F.col("x").alias("id"), F.col("y").alias("cp_raw")
        )
        e = state.where(F.col("kind") == "E").select(
            F.col("x").alias("a"), F.col("y").alias("b")
        )
        v = state.where(F.col("kind") == "V").select(F.col("x").alias("id"))
        ckpt.update_metrics(k, {"active": int(n_rest), "converged": n_rest == 0})
        if n_rest == 0:
            done = True
            break
    if not done and _nonempty(v):
        # never return partial labels — fail loud (mirrors the k-core
        # non-fixed-point contract from the round-3 advice)
        raise RuntimeError(f"SCC did not converge within max_outer={max_outer} rounds")
    if assigned is None:  # empty edge set: every vertex is its own SCC
        assigned = v.select("id", F.col("id").alias("cp_raw"))

    all_labeled = assigned
    if vertices is not None:
        vs = vertices.select(
            F.col(vertices.columns[0]).cast("long").alias("id")
        ).distinct()
        all_labeled = vs.join(all_labeled, "id", "left").withColumn(
            "cp_raw", F.coalesce("cp_raw", F.col("id"))
        )
    all_labeled = all_labeled.withColumnRenamed("id", index_col)
    return finalize_component_labels(
        all_labeled, index_col, label_by_size, consolidate_singles
    )


def _nonempty(df: DataFrame) -> bool:
    return df.limit(1).count() > 0
