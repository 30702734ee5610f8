"""Distributed PageRank with checkpoint/resume and explicit skew handling.

Power iteration with damping ``d`` over the directed edge table::

    r_{k+1}(v) = (1-d)/n + d * ( Σ_{u→v} r_k(u)/outdeg(u) + dangling_k / n )

which is exactly the numpy power-iteration oracle's update (dangling mass
redistributed uniformly), so per-vertex scores converge to allclose-1e-6
parity (north_rule).

Two physical strategies, selected by ``mode``:

* ``"join"`` (default, the 100 TB path): one shuffle per superstep —
  ``ranks ⋈ edges`` then ``groupBy(dst).sum``. Spark's partial aggregation
  does map-side combine; ``salt`` additionally splits hot destination keys
  (hub vertices) into ``salt`` sub-keys with a two-phase aggregation so no
  single reducer owns a whole hub (SURVEY.md §4.3).
* ``"broadcast"`` — the mid-scale strategy (rank state ≲ executor memory,
  i.e. up to ~10^8 vertices): edges are hash-partitioned by **dst** once; each
  superstep broadcast-joins the rank state into the edge partitions, so the
  dst aggregation is map-side-complete with NO exchange — per-superstep data
  movement is just the broadcast. CPU-bound → scales with cores where join
  mode is bound by per-superstep shuffle I/O.
* ``"coloc"`` — destination-local (vertex-cut flavored) layout: edges are
  pinned to dst-range partitions once; a static ``needs = distinct (p, src)``
  table drives a per-superstep replication join, so the bulk shuffle per
  superstep is the *rank* table (n·R rows, R = mean src replication — ≈1-2
  when ids correlate with graph locality, e.g. time-banded transcript turns)
  instead of the m-row contribution stream, and the dst aggregation finishes
  inside the p-partitions with no exchange. The 100 TB path for m >> n
  graphs with locality-friendly ids.
* ``"blocks"`` — per-partition CSR SpMV accelerator for graphs whose rank
  vector fits in executor memory (≲10^8 vertices): the rank vector is
  broadcast as a dense numpy array keyed by dense vertex position and each
  edge partition multiplies its local CSR block, emitting pre-aggregated
  (dst, partial) rows. Orders of magnitude less shuffle volume per superstep
  at bench scale; documented cutover, not the asymptotic path.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepgraph_spark.algorithms.checkpoint import SuperstepCheckpoint


def _vertices(edges: DataFrame, src: str, dst: str, vertices: DataFrame | None) -> DataFrame:
    if vertices is not None:
        return vertices.select(F.col(vertices.columns[0]).alias("id")).distinct()
    return (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    *,
    src: str = "s",
    dst: str = "t",
    vertices: DataFrame | None = None,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 200,
    directed: bool = True,
    checkpoint_dir: str | None = None,
    job_id: str = "pagerank",
    resume: bool = True,
    salt: int | None = None,
    mode: str = "join",
    num_partitions: int | None = None,
    check_every: int = 1,
    teleport: DataFrame | None = None,
    weight: str | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Returns ``(ranks_df(id, rank), metrics_history)``. Convergence: L1
    delta < tol. ``resume=True`` restarts from the latest complete superstep
    under ``checkpoint_dir`` (see SuperstepCheckpoint).

    ``teleport``: a DataFrame of vertex ids (first column) → personalized
    PageRank with the teleport (and dangling-mass) distribution uniform over
    that set instead of over all vertices; join mode only. The static ``pv``
    weight rides the rank state, so the superstep plan shape (co-partitioned
    join + one dst-aggregation shuffle) is unchanged.

    ``weight``: an edge-weight column → weighted PageRank: each source
    distributes its rank proportionally to edge weight, contribution =
    rank(u) * w(u→v) / Σ_out w(u) (the random surfer follows an out-edge with
    probability proportional to its weight — the walk the reference's
    weighted ``return_cs_graph`` adjacency export feeds to scipy/graph-tool
    downstream, deepgraph.py:1746-1856). Weights must be positive and
    non-null (checked up front, fail-loud like sssp's negative-weight
    reject). Implementation note: the per-source normalizer Σ_out w replaces
    ``outdeg`` in the static state, so every mode (join/broadcast/coloc/
    blocks), the dangling-mass logic (no out-edges → Σ = absent → dangling),
    checkpoint/resume, and ``teleport`` compose with it unchanged — the
    superstep plan is byte-identical to the unweighted one."""
    spark = edges.sparkSession
    personalized = teleport is not None
    if personalized and mode != "join":
        raise ValueError(
            "teleport (personalized PageRank) is implemented for mode='join' "
            f"(the unbounded-scale path); got mode={mode!r}"
        )
    if weight is not None:
        # try_cast, not cast: under Spark 4's default ANSI mode a plain cast
        # of a malformed string THROWS a SparkNumberFormatException task
        # failure before this validation can raise its own error — try_cast
        # folds "uncastable" into the null branch we already check
        wd = F.col(weight).try_cast("double")
        # ill-defined weights: null, non-positive, NaN, or values whose
        # double cast is null (e.g. non-numeric strings) — any of them would
        # silently poison the per-source normalizer Σ_out w downstream
        bad = edges.where(
            F.col(weight).isNull() | wd.isNull() | F.isnan(wd) | (wd <= 0)
        ).limit(1).count()
        if bad:
            raise ValueError(
                f"pagerank weight column {weight!r} must be positive, "
                "non-null, non-NaN, and castable to double: ill-defined "
                "weights make the per-source distribution undefined "
                "(drop or clamp them upstream)"
            )
    w_cols = [F.col(weight).cast("double").alias("_ew")] if weight is not None else []
    if not directed:
        back = edges.select(F.col(dst).alias(src), F.col(src).alias(dst), *w_cols)
        edges = edges.select(F.col(src), F.col(dst), *w_cols).union(back)
    elif weight is not None:
        edges = edges.select(F.col(src), F.col(dst), *w_cols)

    verts = _vertices(edges, src, dst, vertices)
    if mode != "blocks":
        # blocks mode collects (id, outdeg) to the driver anyway; it derives
        # n (and the empty-graph case) from that one materialization instead
        # of paying a separate distinct+count action here
        n = verts.count()
        if n == 0:
            return verts.withColumn("rank", F.lit(0.0)), []

    # static: per-source weight 1/outdeg, persisted across supersteps.
    # edges_w is hash-partitioned by src and the rank state stays
    # hash-partitioned by id with the same partition count, so the
    # per-superstep contribution join is co-partitioned (no exchange on
    # either side) — the dst aggregation is the single shuffle per superstep.
    if num_partitions is None and mode != "blocks":
        conf_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        # right-size the superstep loop to edge volume (~100k rows/partition,
        # never above the session width — a 100 TB graph keeps the configured
        # parallelism; same policy as the SCC loop and the blocks layout).
        # The probe is a bounded limit(cap+1) count: LocalLimit stops the
        # scan after ~cap rows, so it never costs a full pass at scale.
        # Measured at bench scale (716k edges, local[32], conf 64): the
        # 60-superstep loop drops 54 s → ~33 s at the clamped width — the
        # per-superstep stages were dispatch-bound, 128 tasks moving ~17 MB.
        cap = conf_parts * 100_000
        m_probe = edges.limit(cap + 1).count()
        num_partitions = (
            conf_parts
            if m_probe > cap
            else min(conf_parts, max(8, m_probe // 100_000 + 1))
        )
    if weight is not None:
        # Σ_out w(u) plays outdeg's role everywhere downstream (same column
        # name on purpose): w = _ew / outdeg, dangling iff outdeg == 0
        outdeg = edges.groupBy(F.col(src).alias("id")).agg(
            F.sum("_ew").alias("outdeg")
        )
    else:
        outdeg = edges.groupBy(F.col(src).alias("id")).agg(
            F.count(F.lit(1)).alias("outdeg")
        )
    verts_deg = verts.join(outdeg, "id", "left").fillna(0, subset=["outdeg"])
    if personalized:
        # uniform weight over the (distinct, graph-member) teleport set; the
        # literal 1/|S| keeps the value identical to the SQL oracle's
        tp = (
            teleport.select(F.col(teleport.columns[0]).alias("id"))
            .distinct()
            .join(verts, "id", "left_semi")
        )
        n_src = tp.count()
        if n_src == 0:
            raise ValueError("teleport set contains no graph vertices")
        verts_deg = (
            verts_deg.join(tp.withColumn("_src", F.lit(True)), "id", "left")
            .withColumn(
                "pv", F.when(F.col("_src"), F.lit(1.0 / n_src)).otherwise(F.lit(0.0))
            )
            .drop("_src")
        )
    state_cols = ["outdeg", "pv"] if personalized else ["outdeg"]

    if mode == "blocks":
        # early dispatch: the repartition+persist of the static state, the
        # edges_w join build, and the resume-state join below all exist for
        # the co-partitioned superstep joins of the other modes — blocks
        # resolves everything through its driver-collected position table
        ckpt = SuperstepCheckpoint(spark, checkpoint_dir, job_id)
        start_iter = 0
        if resume:
            latest = ckpt.latest()
            if latest is not None:
                start_iter, _state, m = latest
                if m.get("l1") is not None and m["l1"] < tol:
                    start_iter = max_iter
                else:
                    start_iter += 1
        return _pagerank_blocks(
            spark, verts_deg, edges, src, dst, weight, damping, tol,
            max_iter, ckpt, start_iter
        )

    verts_deg = verts_deg.repartition(num_partitions, "id").persist()

    def check_weight_bound() -> None:
        # exactness bound (round-6 advice): the "integer weights sum exactly
        # in double" determinism/oracle-parity property only holds while
        # every per-source Σ_out w stays below 2^53 — past it, double sums
        # become shuffle-order-dependent. Enforce, don't assume. Weights are
        # validated strictly positive above, so outdeg = Σ_out w IS the
        # abs-sum bound. Called only when a superstep will actually run
        # (round-7 advice: max_iter=0 / an already-converged resume builds
        # the plan without this extra driver job); in the running case the
        # agg rides the persisted static state the first superstep needs
        # anyway, so it costs one early materialization, not an edge pass.
        max_wsum = verts_deg.agg(F.max("outdeg")).collect()[0][0]
        if max_wsum is not None and max_wsum >= 2.0**53:
            raise ValueError(
                f"pagerank weight column {weight!r}: max per-source weight "
                f"sum {max_wsum:.3e} >= 2^53, so double summation is no "
                "longer exact and results become shuffle-order-dependent — "
                "rescale weights to coarser units upstream"
            )
    numer = F.col("_ew") if weight is not None else F.lit(1.0)
    edges_w = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), *(
            ["_ew"] if weight is not None else []
        ))
        .join(verts_deg.select("id", "outdeg"), F.col("src") == F.col("id"))
        .select("src", "dst", (numer / F.col("outdeg")).alias("w"))
    )
    # join mode co-locates the contribution join (partition by src);
    # broadcast mode makes the dst aggregation exchange-free (partition by dst);
    # coloc mode builds its own dst-range layout below; blocks mode maps ids
    # to dense positions with a broadcast lookup instead of joins (skip both)
    if mode not in ("coloc", "blocks"):
        part_key = "dst" if mode == "broadcast" else "src"
        # in-partition (src, dst) sort: consecutive probe hits on the same
        # src rank entry and near-sorted dst keys into the partial aggregate
        # — sequential cache access in the superstep's two hash structures
        # (on graphs whose ids correlate with locality, e.g. banded
        # transcripts, dst is nearly sorted too). One-time cost at build.
        edges_w = (
            edges_w.repartition(num_partitions, part_key)
            .sortWithinPartitions("src", "dst")
            .persist()
        )
        edges_w.count()  # materialize once

    ckpt = SuperstepCheckpoint(spark, checkpoint_dir, job_id)
    start_iter = 0
    init_rank = F.col("pv") if personalized else F.lit(1.0 / n)
    ranks = verts_deg.select("id", init_rank.alias("rank"), *state_cols)
    if resume:
        latest = ckpt.latest()
        if latest is not None:
            start_iter, state, m = latest
            ranks = (
                state.select("id", "rank")
                .join(verts_deg.select("id", *state_cols), "id", "left")
                .fillna(0, subset=["outdeg"])
            )
            if m.get("l1") is not None and m["l1"] < tol:
                start_iter = max_iter  # already converged: no further supersteps
            else:
                start_iter += 1

    if weight is not None and start_iter < max_iter:
        check_weight_bound()

    coloc_e_p = coloc_needs = None
    if mode == "coloc":
        # Destination-local layout (vertex-cut flavored): edges live in fixed
        # dst-range partitions `p`; the static `needs` table records which
        # (p, src) rank each partition must receive. Per superstep the RANK
        # table (n·R rows, R = src replication ≈ 1-2 on locality-friendly
        # graphs like time-banded transcripts) is what shuffles — not the
        # m-row contribution stream — and the dst aggregation completes
        # inside the p-partitions with no exchange (groupBy keys contain p).
        from pyspark.sql.types import NumericType

        id_type = dict(zip(verts_deg.schema.names, verts_deg.schema.fields))["id"].dataType
        if isinstance(id_type, NumericType):
            # numeric ids: dst-range layout preserves graph locality (banded
            # transcript ids land in few partitions per source)
            ids_mx = verts_deg.agg(F.max("id").alias("mx")).collect()[0]["mx"]
            stride = int(ids_mx) // num_partitions + 1
            p_of = ((F.col("dst") - F.pmod(F.col("dst"), F.lit(stride))) / F.lit(stride)).cast("int")
        else:
            # non-numeric ids (string vertices are supported engine-wide):
            # hash bucketing — same correctness, layout loses range locality
            p_of = F.pmod(F.abs(F.xxhash64(F.col("dst"))), F.lit(num_partitions)).cast("int")
        coloc_e_p = (
            edges_w.withColumn("p", p_of)
            .repartition(num_partitions, "p")
            .persist()
        )
        coloc_e_p.count()
        coloc_needs = (
            coloc_e_p.select("p", "src")
            .distinct()
            .repartition(num_partitions, "src")
            .persist()
        )
        coloc_needs.count()

    # One Spark action per `check_every` supersteps: intermediate supersteps
    # chain lazily (dangling mass enters the plan as a broadcast 1-row cross
    # join, so no scalar collect is needed mid-chain); the combined
    # materialize + metrics aggregation at each check point amortizes the
    # fixed per-action cost — the lever that matters when per-superstep
    # overhead (shuffle spin-up, scheduling, broadcast build) rivals compute.
    # `dangling` may instead be a Python float (the check_every=1 fast path
    # below): the previous checkpoint's observed metrics already carry the
    # dangling mass, so the superstep skips the 2-stage in-plan aggregation.
    def one_superstep(ranks_df: DataFrame, dangling) -> DataFrame:
        rank_side = ranks_df.select(F.col("id").alias("src"), "rank")
        if mode == "broadcast":
            rank_side = F.broadcast(rank_side)
        if mode == "coloc":
            # co-partitioned (src) join replicates ranks into their consumer
            # partitions; the explicit repartition on p is the superstep's
            # only bulk shuffle (n·R rows, not m)
            rep = coloc_needs.join(rank_side, "src").repartition(num_partitions, "p")
            contrib = coloc_e_p.join(rep, ["p", "src"]).select(
                "p", "src", "dst", (F.col("w") * F.col("rank")).alias("c")
            )
        else:
            contrib = edges_w.join(rank_side, "src").select(
                "src", "dst", (F.col("w") * F.col("rank")).alias("c")
            )
        if mode == "coloc":
            # keys contain p -> aggregation completes within the persisted
            # p-partitions, no exchange
            sums = (
                contrib.groupBy("p", "dst")
                .agg(F.sum("c").alias("contrib"))
                .select("dst", "contrib")
            )
        elif salt and salt > 1:
            # two-phase aggregation: hot dst keys split across `salt` reducers,
            # deterministically by source hash
            partial = contrib.groupBy(
                "dst", F.pmod(F.abs(F.xxhash64(F.col("src"))), salt).alias("_salt")
            ).agg(F.sum("c").alias("c"))
            sums = partial.groupBy("dst").agg(F.sum("c").alias("contrib"))
        else:
            sums = contrib.groupBy("dst").agg(F.sum("c").alias("contrib"))

        joined = ranks_df.join(sums.withColumnRenamed("dst", "id"), "id", "left").fillna(
            0.0, subset=["contrib"]
        )
        if isinstance(dangling, float):
            dng_expr = F.lit(dangling)
        else:
            joined = joined.crossJoin(F.broadcast(dangling))
            dng_expr = F.col("_dng")
        if personalized:
            # teleport + dangling mass land on the pv distribution; literal
            # shapes mirror the SQL oracle exactly
            new_rank = (
                F.lit(1.0 - damping) * F.col("pv")
                + F.lit(damping) * dng_expr * F.col("pv")
                + F.lit(damping) * F.col("contrib")
            )
        else:
            new_rank = (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * (dng_expr / n)
                + F.lit(damping) * F.col("contrib")
            )
        return joined.select(
            "id",
            new_rank.alias("rank"),
            F.col("rank").alias("prev"),
            *state_cols,
        )

    history: list[dict] = []
    prev_state = None
    k = start_iter

    # the superstep loops run at the adaptive width: clamp the session
    # shuffle partitions so the per-superstep dst aggregation matches the
    # co-partitioned state width (restored below; SCC-loop discipline)
    _conf_key = "spark.sql.shuffle.partitions"
    _conf_saved = spark.conf.get(_conf_key, "32")
    try:
        spark.conf.set(_conf_key, str(num_partitions))
        # fast path (check_every=1, in-memory checkpointing): TWO pipelined
        # supersteps per action with check_every=1 semantics preserved exactly.
        # Per-action fixed cost (driver-side planning, py4j plan build, action
        # dispatch) measured ~0.7 s/action at bench scale — more than the
        # superstep's own stages — so step k+1 is chained into step k's action:
        # its dangling mass is the in-plan 1-row aggregate over state k (the same
        # double the observation reports — the chained loop below has always
        # relied on that equivalence), and if step k turns out converged, state
        # k+1 is simply DISCARDED, so the returned ranks are bit-identical to the
        # one-step-per-action loop (at most one wasted superstep of compute at
        # the end). Convergence metrics still come from per-state observe() side
        # outputs (zero extra stages beyond the step-2 dangling aggregate).
        if check_every == 1 and not ckpt.enabled and k < max_iter:
            from pyspark.sql import Observation

            def _obs_cols():
                return (
                    F.sum(F.abs(F.col("rank") - F.col("prev"))).alias("l1"),
                    F.max(F.abs(F.col("rank") - F.col("prev"))).alias("linf"),
                    F.coalesce(
                        F.sum(F.when(F.col("outdeg") == 0, F.col("rank"))), F.lit(0.0)
                    ).alias("dng"),
                )

            dng = float(
                ranks.agg(
                    F.coalesce(
                        F.sum(F.when(F.col("outdeg") == 0, F.col("rank"))), F.lit(0.0)
                    ).alias("d")
                ).collect()[0]["d"]
            )
            while k < max_iter:
                t0 = time.time()
                # the observed dangling mass enters as a 1-row LocalRelation (not
                # a literal): the superstep plan is then byte-identical across
                # supersteps, so whole-stage-codegen caches hit every iteration
                dng_df = spark.createDataFrame([(float(dng),)], "_dng double")
                s1 = one_superstep(ranks, dng_df).localCheckpoint(eager=False)
                obs1 = Observation()
                o1 = s1.observe(obs1, *_obs_cols())
                paired = k + 1 < max_iter
                if paired:
                    # step 2's dangling reads THROUGH the observed wrapper, so the
                    # step-1 metrics fire exactly once (during the broadcast
                    # build); the contribution join reads the cached s1 directly
                    dng2_df = o1.agg(
                        F.coalesce(
                            F.sum(F.when(F.col("outdeg") == 0, F.col("rank"))),
                            F.lit(0.0),
                        ).alias("_dng")
                    )
                    s2 = one_superstep(s1.drop("prev"), dng2_df).localCheckpoint(
                        eager=False
                    )
                    obs2 = Observation()
                    o2 = s2.observe(obs2, *_obs_cols())
                    o2.write.format("noop").mode("overwrite").save()
                else:
                    s2 = obs2 = None
                    o1.write.format("noop").mode("overwrite").save()
                m1 = obs1.get
                dt = time.time() - t0
                if prev_state is not None:
                    prev_state.unpersist()
                metrics1 = {
                    "l1": float(m1["l1"]),
                    "linf": float(m1["linf"]),
                    "n_vertices": n,
                    "supersteps": 1,
                    "superstep_sec": dt / (2 if paired else 1),
                    "mode": mode,
                    "salt": salt or 0,
                }
                history.append(metrics1)
                k += 1
                if not paired or metrics1["l1"] < tol:
                    # converged at step 1 (or no step 2 scheduled): the pipelined
                    # state 2 is discarded unmaterialized-for-the-caller — the
                    # returned ranks match the one-step loop exactly
                    if s2 is not None:
                        s2.unpersist()
                    prev_state = s1
                    ranks = s1.drop("prev")
                    dng = float(m1["dng"])
                    if metrics1["l1"] < tol:
                        break
                    continue
                m2 = obs2.get
                s1.unpersist()
                prev_state = s2
                ranks = s2.drop("prev")
                dng = float(m2["dng"])
                metrics2 = {
                    "l1": float(m2["l1"]),
                    "linf": float(m2["linf"]),
                    "n_vertices": n,
                    "supersteps": 1,
                    "superstep_sec": dt / 2,
                    "mode": mode,
                    "salt": salt or 0,
                }
                history.append(metrics2)
                k += 1
                if metrics2["l1"] < tol:
                    break
            max_iter = k  # fast path ran to termination; skip the chained loop

        while k < max_iter:
            t0 = time.time()
            steps = min(check_every, max_iter - k)
            cur = ranks
            intermediates = []
            for i in range(steps):
                if i > 0:
                    # each superstep references `cur` twice (dangling-mass agg +
                    # contribution join); a lazy localCheckpoint makes both refs
                    # share one cached leaf, so the chained plan grows linearly in
                    # check_every instead of ~2^k (still one action per chain)
                    cur = cur.localCheckpoint(eager=False)
                    intermediates.append(cur)
                dng_df = cur.agg(
                    F.coalesce(
                        F.sum(F.when(F.col("outdeg") == 0, F.col("rank"))), F.lit(0.0)
                    ).alias("_dng")
                )
                cur = one_superstep(cur, dng_df)
            k_end = k + steps - 1  # superstep index of the materialized state

            if ckpt.enabled:
                # durable path: parquet write + metrics on the re-read state
                pre = {"n_vertices": n, "mode": mode, "salt": salt or 0}
                state = ckpt.save(k_end, cur, pre)
            else:
                state = cur.localCheckpoint(eager=False)

            row = state.agg(
                F.sum(F.abs(F.col("rank") - F.col("prev"))).alias("l1"),
                F.max(F.abs(F.col("rank") - F.col("prev"))).alias("linf"),
            ).collect()[0]
            if prev_state is not None and not ckpt.enabled:
                # free the previous check point's local checkpoint — otherwise 50+
                # cached states accumulate and GC pressure grows per iteration
                prev_state.unpersist()
            for im in intermediates:  # chained-superstep caches: done after collect
                im.unpersist()
            prev_state = state
            metrics = {
                "l1": float(row["l1"]),
                "linf": float(row["linf"]),
                "n_vertices": n,
                "supersteps": steps,
                "superstep_sec": (time.time() - t0) / steps,
                "mode": mode,
                "salt": salt or 0,
            }
            ranks = state.drop("prev")
            history.append(metrics)
            ckpt.update_metrics(k_end, metrics)
            k = k_end + 1
            if metrics["l1"] < tol:
                break

    finally:
        spark.conf.set(_conf_key, _conf_saved)
    verts_deg.unpersist()
    if mode != "coloc":
        edges_w.unpersist()
    if coloc_e_p is not None:
        coloc_e_p.unpersist()
        coloc_needs.unpersist()
    return ranks.select("id", "rank"), history or ckpt.metrics_history()


# ---------------------------------------------------------------------------


def _pagerank_blocks(spark, verts_deg, edges, src, dst, weight, damping, tol, max_iter, ckpt, start_iter):
    """Dense-position CSR accelerator: rank vector broadcast per superstep,
    per-partition numpy SpMV over pre-packed CSR blocks, pre-aggregated
    partials collected once per superstep (never the edge stream).

    Blocks mode's contract is that the rank vector fits in executor memory
    (≲10^8 vertices), so the (id, outdeg) table fits on the driver by the
    same bound — the id→dense-position map therefore rides a broadcast
    sorted-id array and the pack stage resolves positions with
    ``np.searchsorted`` instead of two join passes (round-9: the joins, the
    zipWithIndex round-trip, and the separate ``edges_w`` build+persist were
    ~40% of the mode's wall time; the single exchange left is the dst
    repartition). The edge table is converted to numpy ONCE: each
    dst-partition packs its (sp, tp, w) arrays into one binary row, and the
    parsed blocks — edges sorted by tp with ``np.unique`` offsets, i.e. a
    CSR row index — persist as a Python-object RDD. Every superstep is then
    one map-only job whose per-task work is two vectorized numpy ops
    (gather-multiply + ``add.reduceat``), instead of re-decoding the whole
    cached edge DataFrame through Arrow→pandas and re-grouping it per
    iteration (the round-8 profile: that conversion+groupby dominated the
    0.43 s/superstep; the floor now is the per-job dispatch itself)."""
    pos_pd = (
        verts_deg.select("id", "outdeg")
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    n = len(pos_pd)
    if n == 0:
        return verts_deg.select("id").withColumn("rank", F.lit(0.0)), []
    ids_sorted = pos_pd["id"].values  # dense position == index in this array
    outdeg_arr = pos_pd["outdeg"].values.astype(np.float64)
    dangling_mask = outdeg_arr == 0
    if weight is not None and start_iter < max_iter and float(outdeg_arr.max()) >= 2.0**53:
        # same exactness bound the shared check_weight_bound enforces for the
        # join-family modes (round-6 advice), applied on the collected table
        raise ValueError(
            f"pagerank weight column {weight!r}: max per-source weight "
            f"sum {outdeg_arr.max():.3e} >= 2^53, so double summation is no "
            "longer exact and results become shuffle-order-dependent — "
            "rescale weights to coarser units upstream"
        )
    sc = spark.sparkContext
    lookup = sc.broadcast((ids_sorted, outdeg_arr))

    # partition by destination: every dst lives in exactly one partition, so
    # per-partition combine already yields globally-unique partial keys
    # (<= n rows collected per superstep) and sizing follows edge volume.
    m_est = edges.count()
    n_parts = max(4, min(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), m_est // 100_000 + 1))
    w_cols = [F.col("_ew")] if weight is not None else []
    e_in = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d"), *w_cols
    ).repartition(n_parts, "_d")

    def pack(it):
        # one binary row per partition: only n_parts rows ever cross the
        # Arrow boundary after this point
        ids, od = lookup.value
        sps, tps, ws = [], [], []
        for pdf in it:
            if not len(pdf):
                continue
            s = pdf["_s"].values
            d = pdf["_d"].values
            si = np.searchsorted(ids, s)
            ti = np.searchsorted(ids, d)
            np.clip(si, 0, len(ids) - 1, out=si)
            np.clip(ti, 0, len(ids) - 1, out=ti)
            # inner-join semantics of the old pos joins: drop edges whose
            # endpoint is not a known vertex (only possible with an explicit
            # vertices= subset)
            ok = (ids[si] == s) & (ids[ti] == d)
            if not ok.all():
                si, ti = si[ok], ti[ok]
                ew = pdf["_ew"].values[ok] if "_ew" in pdf else None
            else:
                ew = pdf["_ew"].values if "_ew" in pdf else None
            numer = ew.astype(np.float64) if ew is not None else 1.0
            sps.append(si.astype(np.int64))
            tps.append(ti.astype(np.int64))
            ws.append(numer / od[si])
        if not sps:
            return
        sp = np.concatenate(sps)
        tp = np.concatenate(tps)
        w = np.concatenate(ws)
        order = np.argsort(tp, kind="stable")
        sp, tp, w = sp[order], tp[order], w[order]
        ut, off = np.unique(tp, return_index=True)
        yield pd.DataFrame(
            {
                "sp": [sp.tobytes()],
                "ut": [ut.tobytes()],
                "off": [off.astype(np.int64).tobytes()],
                "w": [w.tobytes()],
            }
        )

    packed = e_in.mapInPandas(pack, "sp binary, ut binary, off binary, w binary")

    def parse(rows):
        for row in rows:
            yield (
                np.frombuffer(row["sp"], dtype=np.int64),
                np.frombuffer(row["ut"], dtype=np.int64),
                np.frombuffer(row["off"], dtype=np.int64),
                np.frombuffer(row["w"], dtype=np.float64),
            )

    blocks = packed.rdd.mapPartitions(parse, preservesPartitioning=True).persist()
    blocks.count()

    r = np.full(n, 1.0 / n)
    if start_iter > 0:
        prev = ckpt.latest()
        if prev is not None:
            rp = prev[1].toPandas()
            rpos = np.searchsorted(ids_sorted, rp["id"].values)
            r = np.zeros(n)
            r[rpos] = rp["rank"].values

    sc = spark.sparkContext
    history = []
    for k in range(start_iter, max_iter):
        t0 = time.time()
        b = sc.broadcast(r)

        def spmv(it):
            # CSR SpMV per block: gather-multiply + segmented reduce; the
            # yielded partials are <= one entry per distinct local dst
            rv = b.value
            for sp, ut, off, w in it:
                yield ut, np.add.reduceat(rv[sp] * w, off)

        # driver-side final combine — tp-partitions are disjoint, so each
        # block's partial adds into its own slice; no shuffle per superstep
        contrib = np.zeros(n)
        for ut, sums in blocks.mapPartitions(spmv, preservesPartitioning=True).collect():
            contrib[ut] += sums
        dangling = float(r[dangling_mask].sum())
        new_r = (1 - damping) / n + damping * (contrib + dangling / n)
        l1 = float(np.abs(new_r - r).sum())
        linf = float(np.abs(new_r - r).max())
        metrics = {
            "l1": l1,
            "linf": linf,
            "dangling_mass": dangling,
            "n_vertices": n,
            "superstep_sec": time.time() - t0,
            "mode": "blocks",
        }
        if ckpt.enabled:
            state_df = spark.createDataFrame(
                pd.DataFrame({"id": pos_pd["id"].values, "rank": new_r})
            )
            ckpt.save(k, state_df, metrics)
        history.append(metrics)
        r = new_r
        b.destroy()
        if l1 < tol:
            break

    out = spark.createDataFrame(pd.DataFrame({"id": pos_pd["id"].values, "rank": r}))
    blocks.unpersist()
    lookup.destroy()
    return out, history


# ---------------------------------------------------------------------------


def pagerank_numpy_oracle(
    edges: np.ndarray,
    n: int,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 200,
    p: np.ndarray | None = None,
    weights: np.ndarray | None = None,
) -> np.ndarray:
    """Reference power iteration on dense-id edges (m×2 int array) — the
    parity oracle required by north_rule (allclose 1e-6). ``p`` is the
    teleport distribution (personalized PageRank); None → uniform.
    ``weights`` (length m, positive) → weighted walk: contribution =
    r(u) * w(u→v) / Σ_out w(u)."""
    src, dst = edges[:, 0], edges[:, 1]
    if weights is None:
        wvals = np.ones(len(src))
        outdeg = np.bincount(src, minlength=n).astype(float)
    else:
        wvals = np.asarray(weights, dtype=float)
        outdeg = np.bincount(src, weights=wvals, minlength=n)
    if p is None:
        p = np.full(n, 1.0 / n)
    r = p.copy()
    for _ in range(max_iter):
        dangling = r[outdeg == 0].sum()
        contrib = np.bincount(dst, weights=r[src] * wvals / np.where(outdeg[src] == 0, 1, outdeg[src]), minlength=n)
        new_r = (1 - damping) * p + damping * (contrib + dangling * p)
        if np.abs(new_r - r).sum() < tol:
            return new_r
        r = new_r
    return r
