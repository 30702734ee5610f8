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
    barrier_every: int = _BARRIER_EVERY,
    jumps_done: int = 0,
    e_materialized: bool = False,
) -> tuple[DataFrame, int]:
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
    indefinitely. The fix is an IO barrier: after every ``barrier_every``
    jump supersteps the label state round-trips through parquet under
    ``barrier_dir``, whose fresh file-scan leaf fully resets the
    accumulation (measured flat through 30+ supersteps with barriers).
    ``jumps_done`` is the number of jump supersteps the INPUT state already
    carries since its last file-scan reset — the accumulation crosses loop
    invocations through any RDD-checkpointed state, so the caller threads
    the counter across outer rounds instead of paying a parquet round-trip
    per round; the return value is the residual count for the output state.

    Without ``barrier_dir`` (no shared filesystem available — parquet
    barriers need one on a real cluster), the loop is plain synchronous
    relaxation: O(label diameter) supersteps at flat per-superstep cost,
    the standard complexity of BFS-family distributed SCC phases (Fleischer
    FW-BW and Slota Multistep are likewise diameter-bound per phase).

    ``verts`` is (id,), ``e`` is (a, b) meaning a→b. Returns
    ((id, flab, glab), jumps_since_last_reset)."""
    spark = verts.sparkSession
    jump = barrier_dir is not None
    lab = verts.select("id", F.col("id").alias("flab"), F.col("id").alias("glab"))

    # the active edge set usually arrives as a LAZY semi-join/filter chain
    # (trim restriction, class restriction) — materialize it once so the
    # per-superstep scans read flat cached blocks instead of re-running the
    # restriction joins twice per superstep; when the caller already hands
    # over checkpointed blocks (``e_materialized``: an untrimmed round's
    # state, see _outer_loop), the extra copy would just burn one job
    own_e = not e_materialized
    if own_e:
        e = e.localCheckpoint(eager=True)

    prev_state = None
    prev_barrier: str | None = None
    t_loop = time.time()

    def build_step(lab_src):
        """One superstep plan over ``lab_src`` (id, flab, glab).

        Fused f/g message pass: ONE edge-message join + ONE pivot
        aggregation carries both label kinds (f flows a→b, g flows b→a),
        halving the per-superstep stage count vs separate fnbr/gnbr joins —
        the dominant cost at small active sizes is per-stage dispatch, not
        rows."""
        vl = lab_src
        msg = e.select(
            F.col("a").alias("u"), F.col("b").alias("v"), F.lit(True).alias("isf")
        ).union(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"), F.lit(False).alias("isf"))
        )
        vals = msg.join(
            vl.select(F.col("id").alias("u"), "flab", "glab"), "u"
        ).select(
            "v",
            "isf",
            F.when(F.col("isf"), F.col("flab")).otherwise(F.col("glab")).alias("val"),
        )
        nbr = vals.groupBy(F.col("v").alias("id")).agg(
            F.min(F.when(F.col("isf"), F.col("val"))).alias("nf"),
            F.min(F.when(~F.col("isf"), F.col("val"))).alias("ng"),
        )
        new = lab_src.join(nbr, "id", "left")
        fterms = [F.col("flab"), F.coalesce("nf", "flab")]
        gterms = [F.col("glab"), F.coalesce("ng", "glab")]
        if jump:
            # fused pointer jump: both label pointers resolve through one
            # union + one join + one pivot agg (lab ← lab(lab) for f and g)
            ptr = lab_src.select(
                "id", F.col("flab").alias("pid"), F.lit(True).alias("isf")
            ).union(
                lab_src.select("id", F.col("glab").alias("pid"), F.lit(False).alias("isf"))
            )
            pv = ptr.join(
                lab_src.select(
                    F.col("id").alias("pid"),
                    F.col("flab").alias("pf"),
                    F.col("glab").alias("pg"),
                ),
                "pid",
            ).select(
                "id",
                "isf",
                F.when(F.col("isf"), F.col("pf")).otherwise(F.col("pg")).alias("val"),
            )
            jmp = pv.groupBy("id").agg(
                F.min(F.when(F.col("isf"), F.col("val"))).alias("jf"),
                F.min(F.when(~F.col("isf"), F.col("val"))).alias("jg"),
            )
            new = new.join(jmp, "id", "left")
            fterms.append(F.coalesce("jf", "flab"))
            gterms.append(F.coalesce("jg", "glab"))
        # chg compares new vs old labels in-select (inputs still visible),
        # so convergence is decided by the SAME action that materializes
        # the superstep — exact, no hash signature needed
        return new.select(
            "id",
            F.least(*fterms).alias("flab"),
            F.least(*gterms).alias("glab"),
            (
                (F.least(*fterms) != F.col("flab"))
                | (F.least(*gterms) != F.col("glab"))
            ).alias("chg"),
        )

    # Per-ACTION fixed cost (driver planning + dispatch) rivals the
    # superstep's own stages at small active sizes, so two supersteps are
    # pipelined into one action whenever the parquet-barrier cadence allows
    # (round-9; same amortization as the pagerank fast path). Convergence
    # semantics are exact: a superstep applied to a fixed point is the
    # identity with chg all-false, so breaking on the PAIR's final change
    # count returns the same converged labels the one-step loop would.
    it = 0
    n_chg = None
    try:
        while it < max_iter:
            t_it = time.time()
            paired = (it + 1 < max_iter) and (
                not jump or jumps_done + 2 < barrier_every
            )
            s1 = build_step(lab).localCheckpoint(eager=False)
            if paired:
                state = build_step(
                    s1.select("id", "flab", "glab")
                ).localCheckpoint(eager=False)
                steps = 2
            else:
                state = s1
                steps = 1
            if jump:
                jumps_done += steps
            if jump and jumps_done >= barrier_every:
                path = os.path.join(barrier_dir, f"it_{it}")
                state.write.mode("overwrite").parquet(path)
                state = spark.read.parquet(path)
                if prev_barrier is not None:
                    shutil.rmtree(prev_barrier, ignore_errors=True)
                prev_barrier = path
                jumps_done = 0
            # single action per (pair of) superstep(s): the change count
            # materializes the chain
            n_chg = state.agg(
                F.sum(F.col("chg").cast("long")).alias("c")
            ).collect()[0]["c"]
            if _DEBUG:
                # cache read: the pair's action materialized s1's checkpoint
                n1 = (
                    s1.agg(F.sum(F.col("chg").cast("long"))).collect()[0][0]
                    if paired
                    else None
                )
                print(
                    f"[scc] superstep {it}(+{steps - 1}): {time.time() - t_it:.2f}s "
                    f"(loop {time.time() - t_loop:.2f}s) changed={n_chg} first={n1}"
                )
            if prev_state is not None:
                prev_state.unpersist()
            if paired:
                s1.unpersist()
            prev_state = state
            lab = state.select("id", "flab", "glab")
            it += steps
            if not n_chg:
                break
        if n_chg is None or n_chg:
            raise RuntimeError(
                f"_min_labels_fg did not converge in {max_iter} supersteps — raise max_label_iter"
            )
    finally:
        if own_e:  # never release blocks the caller's round state still owns
            e.unpersist()
    return lab, jumps_done


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
    trim_rounds: int = 1,
    serial_tail_threshold: int = 50_000,
    barrier_every: int = _BARRIER_EVERY,
    trim_min_frac: float = 0.1,
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
    fixed point; 0 disables trimming. ``trim_min_frac`` stops the pre-pass
    early once an iteration peels less than that fraction of the active set
    (the leftovers are the label loop's job anyway). ``trim_rounds`` caps
    how many OUTER rounds run the trim phase (default 1: a pre-pass, which
    is where Slota et al. place it — later refinement rounds measured
    0.5-0.6 s of degree aggregations for near-zero peels on transcript
    graphs); the serial-tail cutover stays armed in untrimmed rounds via
    the carried remainder count, and correctness never depends on trim
    (the label loop extracts every SCC exactly).

    ``serial_tail_threshold``: when the post-trim active remainder has at
    most this many vertices (and ≤ 20 edges per vertex), it is collected
    and finished with driver-side iterative Tarjan — Multistep's published
    final step is exactly this serial cutover for the small tail, where
    per-superstep scheduling overhead would dominate distributed work. At
    the default 50k vertices / 1M edges the collected tail is ~16 MB of
    longs — bounded driver memory at any input scale, because the
    threshold gates entry. 0 keeps everything distributed.

    ``barrier_every``: jump supersteps between the accelerated path's parquet
    analysis-reset barriers (see :func:`_min_labels_fg`); the counter carries
    across outer rounds, so fast-converging rounds pay no per-round barrier.
    Must stay below the measured pathology onset (~7-11); the default is the
    bench-swept optimum.

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
            # barriers are tiny label tables read right back — in local mode
            # prefer tmpfs over the real disk (a cluster run passes
            # checkpoint_dir on its shared filesystem instead)
            shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
            barrier_root = tempfile.mkdtemp(prefix="dg_scc_labels_", dir=shm)
            temp_root = True
        elif accelerate:
            raise ValueError(
                "accelerate=True needs a shared filesystem for label barriers: "
                "pass checkpoint_dir (cluster) or run in local mode"
            )

    # keep the persisted input under its OWN name: ``e`` is rebound by the
    # resume branch and by _outer_loop's return, so unpersisting ``e`` in the
    # finally would target the rebound loop state and leak the input cache
    # across bench repeats (mirrors components.py's e0 discipline)
    e0 = (
        edges.select(F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b"))
        .where(F.col("a") != F.col("b"))  # self-loops never change SCC membership
        .distinct()
        .persist()  # every superstep joins e twice — never recompute upstream
    )
    e = e0
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
            barrier_every, trim_min_frac, trim_rounds,
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
        e0.unpersist()
        if temp_root and barrier_root is not None:
            shutil.rmtree(barrier_root, ignore_errors=True)


def _trim(v, e, *, max_iter, stop_below=0, min_frac=0.1):
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

    def one_peel(v, e):
        deg = (
            e.select(F.col("a").alias("id"), F.lit(1).alias("o"), F.lit(0).alias("i"))
            .union(e.select(F.col("b").alias("id"), F.lit(0).alias("o"), F.lit(1).alias("i")))
            .groupBy("id")
            .agg(F.sum("o").alias("od"), F.sum("i").alias("idg"))
        )
        keep = (
            deg.where((F.col("od") > 0) & (F.col("idg") > 0))
            .select("id")
            .localCheckpoint(eager=False)
        )
        newly = v.join(keep, "id", "left_anti").select(
            "id", F.col("id").alias("cp_raw")
        )
        e2 = (
            e.join(keep.select(F.col("id").alias("a")), "a", "left_semi")
            .join(keep.select(F.col("id").alias("b")), "b", "left_semi")
        )
        return keep, newly, e2

    # TWO peels per action (round-9): the per-action fixed cost dominates a
    # degree aggregation at active sizes this phase sees, so the second
    # peel chains lazily onto the first's (lazy) checkpoint and one count
    # materializes both. Stop rules apply at pair granularity — trim may
    # thus run up to one extra peel vs the one-peel loop, which is pure
    # (bounded) extra work: peeling more trivial SCCs can never change the
    # final labels, it only shrinks what the label loop sees.
    it = 0
    while it < max_iter:
        keep, newly, e = one_peel(v, e)
        keeps.append(keep)
        peeled = newly if peeled is None else peeled.union(newly)
        v = keep
        it += 1
        if it < max_iter:
            keep, newly, e = one_peel(v, e)
            keeps.append(keep)
            peeled = peeled.union(newly)
            v = keep
            it += 1
        n_keep = v.count()  # materializes the (chained) lazy checkpoints
        prev_n, n_active = n_active, n_keep
        if _DEBUG:
            print(f"[scc] trim {it - 1}: active={n_active}")
        if n_active <= stop_below or n_active == prev_n or (
            prev_n is not None and prev_n - n_active < min_frac * prev_n
        ):
            # converged, emptied, small enough for the caller's serial tail,
            # or the peel rate went marginal (< min_frac of the active set):
            # each further pair costs a fixed action, and whatever survives
            # is the label loop's job anyway
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
                barrier_root, done, trim_iter=4, serial_tail_threshold=50_000,
                barrier_every=_BARRIER_EVERY, trim_min_frac=0.1,
                trim_rounds=1):
    """(f,g)-class refinement rounds; returns (assigned, e, v, done)."""
    prev_round_state = None  # last round's materialized state, freed once superseded
    pending_release = []  # handles a LAZY round state still reads; freed next round
    spark = e.sparkSession
    # jump supersteps accumulated in the loop state since its last file-scan
    # reset — threaded through every label loop so the Spark 4 jump-join
    # analysis pathology (see _min_labels_fg) stays in its flat regime
    # WITHOUT a parquet round-trip per outer round (measured: the per-round
    # round-trip dominated small-remainder rounds)
    jumps = 0
    prev_n_rest = None  # remainder count carried from the last state block
    for k in range(start_iter, max_outer):
        t_round = time.time()
        barrier_dir = None
        if barrier_root is not None:
            barrier_dir = os.path.join(barrier_root, f"round_{k}")

        lbl = None
        keeps = []
        trimmed = trim_iter > 0 and k < trim_rounds
        if trimmed:
            v, e, peeled, n_active, keeps = _trim(
                v, e, max_iter=trim_iter, stop_below=serial_tail_threshold,
                min_frac=trim_min_frac,
            )
            if peeled is not None:
                assigned = peeled if assigned is None else assigned.union(peeled)
            if _DEBUG:
                print(f"[scc] round {k} trim phase: {time.time() - t_round:.2f}s")
        else:
            # trim is a PRE-pass (Slota Multistep runs it once up front, not
            # per refinement round — a measured 0.5-0.6 s/round of degree
            # aggregations for near-zero peels on later-round graphs); the
            # serial-tail cutover still sees the active size via the carried
            # remainder count from the previous round's state block
            n_active = prev_n_rest

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
            lbl, jumps = _min_labels_fg(
                v, e, max_iter=max_label_iter, barrier_dir=barrier_dir,
                barrier_every=barrier_every, jumps_done=jumps,
                # untrimmed rounds after the first hand over this loop's own
                # localCheckpointed round state — already flat blocks, no
                # restriction chain to pin, so skip the inner re-checkpoint
                e_materialized=(not trimmed and not ckpt.enabled and k > start_iter),
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
                # materialize the label table off the trim keep-set caches,
                # then release them (and the previous round's deferred
                # handles, which this round's actions have already read)
                if assigned is not None:
                    assigned = assigned.localCheckpoint(eager=True)
                for kp in keeps:
                    kp.unpersist()
                for h in pending_release:
                    h.unpersist()
                # the previous round's state handles (assigned/e/v local-
                # checkpoint blocks) are superseded too once the eager
                # checkpoint above has materialized — without this they
                # leaked for the rest of the session on the trim/serial-
                # tail-emptied exit path (round-6 advice)
                for h in prev_round_state or []:
                    h.unpersist()
                ckpt.update_metrics(k, {"active": 0, "converged": True})
                if barrier_dir is not None:
                    shutil.rmtree(barrier_dir, ignore_errors=True)
                done = True
                break

        if ckpt.enabled:
            # durable: one kind-tagged parquet state per round (the resume
            # unit); the save's re-read is also a fresh file-scan root
            state = (
                assigned.select(F.lit("L").alias("kind"), F.col("id").alias("x"), F.col("cp_raw").alias("y"))
                .union(e.select(F.lit("E"), "a", "b"))
                .union(v.select(F.lit("V"), "id", F.lit(None).cast("long")))
            )
            state = ckpt.save(k, state, {"superstep": k})
            jumps = 0
            n_rest = state.where(F.col("kind") == "V").count()
            round_handles = [state]
            assigned = state.where(F.col("kind") == "L").select(
                F.col("x").alias("id"), F.col("y").alias("cp_raw")
            )
            e = state.where(F.col("kind") == "E").select(
                F.col("x").alias("a"), F.col("y").alias("b")
            )
            v = state.where(F.col("kind") == "V").select(F.col("x").alias("id"))
        else:
            # non-durable: separate checkpoints instead of the kind-union
            # (which cost a union build + three kind-filter rescans next
            # round). Lineage stays flat, and the jump-join analysis
            # pathology (see _min_labels_fg) stays in its flat regime
            # WITHOUT a per-round parquet round-trip because the ``jumps``
            # carry keeps the accumulated depth below ``barrier_every`` —
            # the next label loop fires its in-loop barrier first (measured:
            # the per-round round-trip dominated fast-converging
            # small-remainder rounds). The loop is action-count bound at
            # small remainders (~0.4 s/job dispatch floor), so only
            # ``assigned`` and ``v`` materialize eagerly here (v's count is
            # the round metric anyway); ``e`` stays lazy and folds its
            # materialization into the next round's first action — which is
            # why ``lbl`` and the trim keep sets CANNOT be released yet
            # (e's restriction joins still read their cached blocks): they
            # defer one round, to after the lazy state has materialized.
            assigned = assigned.localCheckpoint(eager=True)
            e = e.localCheckpoint(eager=False)
            v = v.localCheckpoint(eager=True)
            n_rest = v.count()
            round_handles = [assigned, e, v]
        # localCheckpoint storage is not safely evictable — lineage was
        # truncated — so free superseded handles explicitly, mirroring the
        # k-core/CC unpersist discipline: this round's actions have fully
        # materialized LAST round's state, so last round's deferred handles
        # (label result, trim keeps, state blocks) can all go now
        for h in pending_release:
            h.unpersist()
        pending_release = ([lbl] if lbl is not None else []) + keeps + (
            prev_round_state or []
        )
        prev_round_state = round_handles
        prev_n_rest = n_rest
        ckpt.update_metrics(k, {"active": int(n_rest), "converged": n_rest == 0})
        if _DEBUG:
            print(f"[scc] round {k} total: {time.time() - t_round:.2f}s (rest={n_rest})")
        if barrier_dir is not None:
            # state is materialized; this round's label barriers can go
            shutil.rmtree(barrier_dir, ignore_errors=True)
        if n_rest == 0:
            # converged: force the lazy edge state (empty) so this round's
            # deferred handles can be released before returning — the
            # caller's final assembly must not depend on freed blocks
            e.count()
            for h in pending_release:
                h.unpersist()
            pending_release = []
            done = True
            break
    return assigned, e, v, done


def _nonempty(df: DataFrame) -> bool:
    return df.limit(1).count() > 0
