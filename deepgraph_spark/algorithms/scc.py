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

Each label propagation is a synchronous min-label fixed point; with a
usable barrier filesystem (checkpoint_dir, or a temp dir in local mode)
it additionally relaxes through the label pointers each superstep —
pointer jumping — converging in O(log diameter) supersteps (measured 12×
on a band graph whose longest conversation spans ~200 label hops), with
periodic parquet barriers working around a measured Spark 4 driver-side
pathology in iterated self-joins (details in ``_min_labels_fg``). Without
one it falls back to plain relaxation at O(diameter) supersteps — the
standard complexity of BFS-family distributed SCC (FW-BW and Multistep
are likewise diameter-bound per phase). Per superstep: one edge join +
one min-aggregation (+ two pointer joins when accelerated) — all
JVM-side, shuffle volume O(|E| + |V|), the same per-round cost profile as
the weak-CC kernel's.

Weak/directed semantics note: the reference's ``connection='weak'`` on a
directed graph is exactly undirected CC (scipy does the same symmetrize),
so only the strong path needs a new kernel.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import time

from deepgraph_spark.algorithms.checkpoint import SuperstepCheckpoint
from deepgraph_spark.algorithms.components import finalize_component_labels


_BARRIER_EVERY = 5
_DEBUG = os.environ.get("DG_SCC_DEBUG", "") != ""


def _min_labels_fg(
    verts: DataFrame,
    e: DataFrame,
    *,
    max_iter: int,
    barrier_dir: str | None = None,
) -> DataFrame:
    """Joint fixed point of both reachability labels, ONE action per
    superstep (they are independent, so fusing them halves the job count):

    * flab(v) = min({v} ∪ {flab(u): u→v})  — min ancestor-or-self
    * glab(v) = min({v} ∪ {glab(w): v→w})  — min descendant-or-self

    With ``barrier_dir`` set, each superstep also relaxes through the label
    POINTERS (lab ← lab(lab), valid because min-ancestors/descendants
    compose transitively), which doubles the propagation horizon per
    superstep → O(log diameter) convergence (measured: a 400-hop chain
    converges in 10 supersteps instead of 400). The jump is a self-join of
    the label state, and Spark 4 has a measured pathology there: ANY join
    whose two sides both derive from the iterated state — one self-join or
    two, Column-object or USING condition, even with the pointer side
    eagerly checkpointed to its own RDD leaf — makes driver-side work grow
    exponentially from ~iteration 7-11 (0.3 s/iter flat → 1.3 → 6 → 26 →
    105+ s) despite constant-size plans, flat RDD lineage, and constant
    data; joins against STATIC inputs (the edge table) stay flat
    indefinitely. The fix is an IO barrier: every ``_BARRIER_EVERY``
    supersteps the label state round-trips through parquet under
    ``barrier_dir``, whose fresh file-scan leaf fully resets the
    accumulation (measured flat through 30+ supersteps with barriers).

    Without ``barrier_dir`` (no shared filesystem available — parquet
    barriers need one on a real cluster), the loop is plain synchronous
    relaxation: O(label diameter) supersteps at flat per-superstep cost,
    the standard complexity of BFS-family distributed SCC phases (Fleischer
    FW-BW and Slota Multistep are likewise diameter-bound per phase).

    ``verts`` is (id,), ``e`` is (a, b) meaning a→b. Returns
    (id, flab, glab)."""
    spark = verts.sparkSession
    jump = barrier_dir is not None
    lab = verts.select("id", F.col("id").alias("flab"), F.col("id").alias("glab"))

    prev_sig = None
    prev_state = None
    prev_barrier: str | None = None
    t_loop = time.time()
    for it in range(max_iter):
        t_it = time.time()
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
        new = lab.join(fnbr, "id", "left").join(gnbr, "id", "left")
        fterms = [F.col("flab"), F.coalesce("nf", "flab")]
        gterms = [F.col("glab"), F.coalesce("ng", "glab")]
        if jump:
            fjump = (
                lab.select("id", F.col("flab").alias("fjid"))
                .join(lab.select(F.col("id").alias("fjid"), F.col("flab").alias("jf")), "fjid")
                .select("id", "jf")
            )
            gjump = (
                lab.select("id", F.col("glab").alias("gjid"))
                .join(lab.select(F.col("id").alias("gjid"), F.col("glab").alias("jg")), "gjid")
                .select("id", "jg")
            )
            new = new.join(fjump, "id", "left").join(gjump, "id", "left")
            fterms.append(F.coalesce("jf", "flab"))
            gterms.append(F.coalesce("jg", "glab"))
        new = new.select(
            "id", F.least(*fterms).alias("flab"), F.least(*gterms).alias("glab")
        )

        if jump and it % _BARRIER_EVERY == _BARRIER_EVERY - 1:
            path = os.path.join(barrier_dir, f"it_{it}")
            new.write.mode("overwrite").parquet(path)
            new = spark.read.parquet(path)
            if prev_barrier is not None:
                shutil.rmtree(prev_barrier, ignore_errors=True)
            prev_barrier = path
        else:
            new = new.localCheckpoint(eager=False)
        # single action: signature aggregation materializes the superstep
        row = new.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.xxhash64("id", "flab", "glab").cast("decimal(38,0)")).alias("hsh"),
        ).collect()[0]
        sig = (row["cnt"], row["hsh"])
        if _DEBUG:
            print(
                f"[scc] superstep {it}: {time.time() - t_it:.2f}s "
                f"(loop {time.time() - t_loop:.2f}s) sig={sig}"
            )
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
    trim_iter: int = 4,
    serial_tail_threshold: int = 50_000,
    accelerate: bool | None = None,
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

    ``trim_iter`` bounds the per-round trim pre-pass (Slota et al.'s
    "Multistep" trim): vertices with in-degree 0 or out-degree 0 of the
    *active* subgraph are singleton SCCs and are peeled iteratively —
    isolated vertices, stars, and DAG fringes never reach the label loop
    (a pure DAG whose trim converges costs zero label supersteps). Each
    trim iteration is one degree aggregation, far cheaper than a label
    fixed point; 0 disables trimming.

    ``serial_tail_threshold``: when the post-trim active remainder has at
    most this many vertices (and ≤ 20 edges per vertex), it is collected
    and finished with driver-side iterative Tarjan — Multistep's published
    final step is exactly this serial cutover for the small tail, where
    per-superstep scheduling overhead would dominate distributed work. At
    the default 50k vertices / 1M edges the collected tail is ~16 MB of
    longs — bounded driver memory at any input scale, because the
    threshold gates entry. 0 keeps everything distributed.

    ``accelerate`` turns on pointer-jump label propagation (O(log diameter)
    supersteps instead of O(diameter) — see :func:`_min_labels_fg`), which
    needs a filesystem both driver and executors can read for its periodic
    parquet barriers: ``checkpoint_dir`` when given, a temp dir in local
    mode. Default ``None`` auto-enables exactly when such a location
    exists; ``True`` without one raises; ``False`` forces plain relaxation.

    Checkpoint/resume: each outer round persists the assigned labels and the
    surviving class-internal edge set through the standard superstep
    protocol (kind-tagged rows), so a killed job restarts from the last
    complete outer round.
    """
    spark = edges.sparkSession
    ckpt = SuperstepCheckpoint(spark, checkpoint_dir, job_id)

    barrier_root: str | None = None
    temp_root = False
    if accelerate is None or accelerate:
        if checkpoint_dir is not None:
            barrier_root = os.path.join(checkpoint_dir, job_id, "_label_barriers")
            os.makedirs(barrier_root, exist_ok=True)
        elif spark.sparkContext.master.startswith("local"):
            barrier_root = tempfile.mkdtemp(prefix="dg_scc_labels_")
            temp_root = True
        elif accelerate:
            raise ValueError(
                "accelerate=True needs a shared filesystem for label barriers: "
                "pass checkpoint_dir (cluster) or run in local mode"
            )

    e = (
        edges.select(F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b"))
        .where(F.col("a") != F.col("b"))  # self-loops never change SCC membership
        .distinct()
        .persist()  # every superstep joins e twice — never recompute upstream
    )
    m = e.count()
    # the label loop only ever needs edge ENDPOINTS: a vertex with no edges
    # is trivially its own SCC and is folded in by the final coalesce against
    # ``vertices`` — carrying it through every superstep join is pure waste
    # (measured: 100k-vertex/42k-edge gate graph has ~27k endpoints)
    v = e.select(F.col("a").alias("id")).union(e.select("b")).distinct()

    # right-size the loop's shuffles: a 42k-edge active graph on 32
    # partitions pays 32-task dispatch per stage for ~1k-row tasks. Clamp to
    # ~100k edges/partition, never above the session setting (a 100 TB graph
    # keeps the configured width), floor 4 — same policy as the blocks-mode
    # PageRank layout (pagerank.py:427). Restored in the finally below.
    conf_parts = spark.conf.get("spark.sql.shuffle.partitions", "32")
    loop_parts = max(4, min(int(conf_parts), m // 100_000 + 1))

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
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
        assigned, e, v, done = _outer_loop(
            ckpt, v, e, assigned, start_iter, max_outer, max_label_iter,
            barrier_root, done, trim_iter, serial_tail_threshold,
        )

        if not done and _nonempty(v):
            # never return partial labels — fail loud (mirrors the k-core
            # non-fixed-point contract from the round-3 advice)
            raise RuntimeError(
                f"SCC did not converge within max_outer={max_outer} rounds"
            )
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
        result = finalize_component_labels(
            all_labeled, index_col, label_by_size, consolidate_singles
        )
        if temp_root:
            # the temp barrier/state files back this plan — pin the result
            # into session storage before the finally below deletes them
            result = result.localCheckpoint(eager=True)
        return result
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", conf_parts)
        e.unpersist()
        if temp_root and barrier_root is not None:
            shutil.rmtree(barrier_root, ignore_errors=True)


def _trim(v, e, *, max_iter, stop_below=0):
    """Multistep trim (Slota et al.): iteratively peel vertices whose
    in-degree or out-degree within the ACTIVE subgraph is 0 — each such
    vertex can't lie on any directed cycle, so it is a singleton SCC;
    isolated vertices, stars, and DAG fringes never reach the label loop.

    Per iteration, ONE action: both degrees come from a single union +
    aggregation pass and the surviving vertex set (small: ids only) is
    eagerly localCheckpointed; the peeled set and the restricted edge set
    stay LAZY — they reference only the persisted input edges and the
    materialized keep sets, so the per-iteration cost is one degree
    aggregation, not four re-evaluations of a shared subplan. Chains peel
    only O(length) per pass, which is the label loop's job — hence the cap.

    Returns ``(v, e, peeled, n_active, keeps)``: the surviving subgraph
    (``e`` lazy, depth ≤ max_iter semi-join chain), peeled singletons as
    (id, cp_raw=id) (lazy), surviving vertex count (0 = whole active graph
    was trivial), and the list of checkpointed keep sets — the caller must
    not unpersist those until ``peeled``/``e`` have been materialized."""
    peeled = None
    n_active = None
    keeps = []
    for it in range(max_iter):
        deg = (
            e.select(F.col("a").alias("id"), F.lit(1).alias("o"), F.lit(0).alias("i"))
            .union(e.select(F.col("b").alias("id"), F.lit(0).alias("o"), F.lit(1).alias("i")))
            .groupBy("id")
            .agg(F.sum("o").alias("od"), F.sum("i").alias("idg"))
        )
        keep = (
            deg.where((F.col("od") > 0) & (F.col("idg") > 0))
            .select("id")
            .localCheckpoint(eager=True)
        )
        keeps.append(keep)
        n_keep = keep.count()
        newly = v.join(keep, "id", "left_anti").select(
            "id", F.col("id").alias("cp_raw")
        )
        peeled = newly if peeled is None else peeled.union(newly)
        v = keep
        e = (
            e.join(keep.select(F.col("id").alias("a")), "a", "left_semi")
            .join(keep.select(F.col("id").alias("b")), "b", "left_semi")
        )
        prev_n, n_active = n_active, n_keep
        if _DEBUG:
            print(f"[scc] trim {it}: active={n_active}")
        if n_active <= stop_below or n_active == prev_n:
            # converged, emptied, or already small enough for the caller's
            # serial tail finisher — further peeling buys nothing
            break
    return v, e, peeled, n_active, keeps


def _tarjan_min_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Iterative Tarjan over a small edge list: vertex -> min member id of
    its SCC (the same canonical label the distributed extraction produces).
    Used only below ``serial_tail_threshold`` — Multistep's published final
    step is exactly this serial cutover for the small remainder graph."""
    adj: dict[int, list[int]] = {}
    nodes: set[int] = set()
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        nodes.add(a)
        nodes.add(b)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    out: dict[int, int] = {}
    counter = 0
    for root in nodes:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            node, pi = work[-1]
            if pi == 0:
                index[node] = low[node] = counter
                counter += 1
                stack.append(node)
                on_stack.add(node)
            recurse = False
            nbrs = adj.get(node, ())
            for j in range(pi, len(nbrs)):
                w = nbrs[j]
                if w not in index:
                    work[-1] = (node, j + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[node] = min(low[node], index[w])
            if recurse:
                continue
            work.pop()
            if low[node] == index[node]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == node:
                        break
                label = min(comp)
                for w in comp:
                    out[w] = label
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[node])
    return out


def _outer_loop(ckpt, v, e, assigned, start_iter, max_outer, max_label_iter,
                barrier_root, done, trim_iter=4, serial_tail_threshold=50_000):
    """(f,g)-class refinement rounds; returns (assigned, e, v, done)."""
    prev_round_state = None  # last round's materialized state, freed once superseded
    spark = e.sparkSession
    for k in range(start_iter, max_outer):
        t_round = time.time()
        barrier_dir = None
        if barrier_root is not None:
            barrier_dir = os.path.join(barrier_root, f"round_{k}")

        lbl = None
        keeps = []
        if trim_iter > 0:
            v, e, peeled, n_active, keeps = _trim(
                v, e, max_iter=trim_iter, stop_below=serial_tail_threshold
            )
            if peeled is not None:
                assigned = peeled if assigned is None else assigned.union(peeled)
            if _DEBUG:
                print(f"[scc] round {k} trim phase: {time.time() - t_round:.2f}s")
        else:
            n_active = None

        if n_active is not None and 0 < n_active <= serial_tail_threshold:
            # Multistep's serial cutover: the active remainder is small —
            # collect its edge list (bounded: <= 20 edges/vertex or we stay
            # distributed) and finish with driver-side Tarjan instead of
            # paying whole label-loop rounds of per-superstep overhead
            cap = serial_tail_threshold * 20
            ep = e.limit(cap + 1).toPandas()
            if len(ep) <= cap:
                labels = _tarjan_min_labels(
                    list(zip(ep["a"].astype(int), ep["b"].astype(int)))
                )
                tail = spark.createDataFrame(
                    list(labels.items()), "id long, cp_raw long"
                )
                # active vertices whose every edge went to peeled singletons
                # have no edge in the restricted graph: they're on no cycle,
                # so they're singleton SCCs — Tarjan never saw them
                alone = v.join(tail.select("id"), "id", "left_anti").select(
                    "id", F.col("id").alias("cp_raw")
                )
                tail = tail.union(alone)
                assigned = tail if assigned is None else assigned.union(tail)
                n_active = 0
                if _DEBUG:
                    print(
                        f"[scc] round {k} serial tail: {len(labels)} verts, "
                        f"{len(ep)} edges ({time.time() - t_round:.2f}s in round)"
                    )

        if n_active == 0:
            # trim/serial tail emptied the round: no label loop, fall
            # through to the state save so resume still sees a full round
            rest = None
        else:
            lbl = _min_labels_fg(
                v, e, max_iter=max_label_iter, barrier_dir=barrier_dir
            )
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
        if rest is None:
            v = v.limit(0)
            e = e.limit(0)
            if not ckpt.enabled:
                # terminal round with no durable checkpoint to write and no
                # further label loops to protect with an analysis reset —
                # _trim already materialized everything it produced
                ckpt.update_metrics(k, {"active": 0, "converged": True})
                if barrier_dir is not None:
                    shutil.rmtree(barrier_dir, ignore_errors=True)
                done = True
                break

        # one durable state per outer round; a single count() action
        # materializes assigned+edges+verts together
        state = (
            assigned.select(F.lit("L").alias("kind"), F.col("id").alias("x"), F.col("cp_raw").alias("y"))
            .union(e.select(F.lit("E"), "a", "b"))
            .union(v.select(F.lit("V"), "id", F.lit(None).cast("long")))
        )
        if ckpt.enabled or barrier_root is None:
            # parquet when durable checkpointing is on (which also acts as
            # the cross-round analysis-reset barrier), else localCheckpoint
            state = ckpt.save(k, state, {"superstep": k})
        else:
            # accelerated but non-durable: the state MUST round-trip through
            # parquet anyway — the Spark 4 jump-join analysis pathology (see
            # _min_labels_fg) accumulates ACROSS label loops through any
            # RDD-checkpointed state, and only a file-scan-rooted plan
            # resets it (fast-converging rounds never fire the in-loop
            # barrier, so this is the reset that keeps round N+1 flat)
            spath = os.path.join(barrier_root, f"state_{k}")
            state.write.mode("overwrite").parquet(spath)
            state = state.sparkSession.read.parquet(spath)
            prev_spath = os.path.join(barrier_root, f"state_{k - 1}")
            shutil.rmtree(prev_spath, ignore_errors=True)
        n_rest = state.where(F.col("kind") == "V").count()
        # state is materialized: release the round's label result and the
        # previous round's state blocks (localCheckpoint storage is not
        # safely evictable — lineage was truncated — so free it explicitly,
        # mirroring the k-core/CC unpersist discipline)
        if lbl is not None:
            lbl.unpersist()
        for kp in keeps:  # trim keep sets are baked into state now
            kp.unpersist()
        if prev_round_state is not None:
            prev_round_state.unpersist()
        prev_round_state = state
        assigned = state.where(F.col("kind") == "L").select(
            F.col("x").alias("id"), F.col("y").alias("cp_raw")
        )
        e = state.where(F.col("kind") == "E").select(
            F.col("x").alias("a"), F.col("y").alias("b")
        )
        v = state.where(F.col("kind") == "V").select(F.col("x").alias("id"))
        ckpt.update_metrics(k, {"active": int(n_rest), "converged": n_rest == 0})
        if _DEBUG:
            print(f"[scc] round {k} total: {time.time() - t_round:.2f}s (rest={n_rest})")
        if barrier_dir is not None:
            # state is materialized; this round's label barriers can go
            shutil.rmtree(barrier_dir, ignore_errors=True)
        if n_rest == 0:
            done = True
            break
    return assigned, e, v, done


def _nonempty(df: DataFrame) -> bool:
    return df.limit(1).count() > 0
