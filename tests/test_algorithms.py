"""Graph-kernel parity tests vs pure-numpy oracles (FIXTURES.md F4) and the
checkpoint/resume protocol."""

import glob
import os

import numpy as np
import pandas as pd
import pytest

from deepgraph_spark.algorithms import (
    connected_components,
    label_propagation,
    pagerank,
    triangle_count,
    triangles_per_vertex,
)
from deepgraph_spark.algorithms.pagerank import pagerank_numpy_oracle
from oracles import (
    cc_oracle,
    lpa_oracle,
    random_digraph,
    star_graph,
    triangle_oracle,
    triangles_per_vertex_oracle,
)


def _dfs(spark, edges, n):
    e = spark.createDataFrame(pd.DataFrame({"s": edges[:, 0], "t": edges[:, 1]}))
    v = spark.createDataFrame(pd.DataFrame({"id": np.arange(n)}))
    return e, v


GRAPHS = [
    ("sparse10", 10, 12, 1),
    ("mid100", 100, 150, 2),
    ("dense100", 100, 800, 3),
]


@pytest.mark.parametrize("name,n,m,seed", GRAPHS)
def test_pagerank_parity(spark, name, n, m, seed):
    edges = random_digraph(n, m, seed)
    e, v = _dfs(spark, edges, n)
    oracle = pagerank_numpy_oracle(edges, n)
    for mode in ["join", "blocks", "coloc"]:
        ranks, hist = pagerank(e, vertices=v, tol=1e-6, mode=mode)
        got = ranks.toPandas().sort_values("id")["rank"].values
        assert np.allclose(got, oracle, atol=1e-6), (name, mode)


@pytest.mark.parametrize("name,n,m,seed", GRAPHS)
def test_weighted_pagerank_parity(spark, name, n, m, seed):
    """weight= distributes rank proportionally to edge weight in EVERY mode;
    parity vs the numpy oracle's weighted walk."""
    edges = random_digraph(n, m, seed)
    rng = np.random.default_rng(seed + 100)
    w = rng.integers(1, 50, size=len(edges)).astype(float)
    e = spark.createDataFrame(
        pd.DataFrame({"s": edges[:, 0], "t": edges[:, 1], "w": w})
    )
    v = spark.createDataFrame(pd.DataFrame({"id": np.arange(n)}))
    oracle = pagerank_numpy_oracle(edges, n, weights=w)
    for mode in ["join", "blocks", "coloc", "broadcast"]:
        ranks, _ = pagerank(e, vertices=v, tol=1e-6, mode=mode, weight="w")
        got = ranks.toPandas().sort_values("id")["rank"].values
        assert np.allclose(got, oracle, atol=1e-6), (name, mode)


def test_weighted_pagerank_uniform_weights_match_unweighted(spark):
    edges = random_digraph(50, 120, 7)
    e = spark.createDataFrame(
        pd.DataFrame({"s": edges[:, 0], "t": edges[:, 1], "w": 3.0})
    )
    v = spark.createDataFrame(pd.DataFrame({"id": np.arange(50)}))
    rw, _ = pagerank(e, vertices=v, tol=1e-6, weight="w")
    ru, _ = pagerank(e, vertices=v, tol=1e-6)
    got_w = rw.toPandas().sort_values("id")["rank"].values
    got_u = ru.toPandas().sort_values("id")["rank"].values
    assert np.allclose(got_w, got_u, atol=1e-9)


def test_weighted_pagerank_rejects_nonpositive(spark):
    e = spark.createDataFrame(pd.DataFrame({"s": [0, 1], "t": [1, 0], "w": [1.0, 0.0]}))
    with pytest.raises(ValueError, match="positive"):
        pagerank(e, weight="w")


def test_weighted_pagerank_rejects_nan_and_uncastable(spark):
    """NaN weights and values whose double cast is null must fail loud too
    (round-6 advice): both would silently poison the Σ_out w normalizer."""
    e = spark.createDataFrame(
        pd.DataFrame({"s": [0, 1], "t": [1, 0], "w": [1.0, float("nan")]})
    )
    with pytest.raises(ValueError, match="NaN"):
        pagerank(e, weight="w")
    e2 = spark.createDataFrame(
        [(0, 1, "2.0"), (1, 0, "not-a-number")], "s long, t long, w string"
    )
    with pytest.raises(ValueError, match="castable"):
        pagerank(e2, weight="w")


def test_weighted_pagerank_rejects_sums_past_2_53(spark):
    """Per-source Σ_out w >= 2^53 breaks the exact-double-summation
    invariant → fail loud with rescale guidance (round-6 advice)."""
    e = spark.createDataFrame(
        pd.DataFrame({"s": [0, 0, 1], "t": [1, 2, 0], "w": [2.0**53, 2.0, 1.0]})
    )
    with pytest.raises(ValueError, match="2\\^53"):
        pagerank(e, weight="w")


def test_pagerank_star_skew(spark):
    """Hub fixture: salted two-phase aggregation must not change results."""
    edges = star_graph(200)
    both = np.vstack([edges, edges[:, ::-1]])
    e, v = _dfs(spark, both, 200)
    oracle = pagerank_numpy_oracle(both, 200)
    for salt in [None, 8]:
        ranks, _ = pagerank(e, vertices=v, tol=1e-6, salt=salt)
        got = ranks.toPandas().sort_values("id")["rank"].values
        assert np.allclose(got, oracle, atol=1e-6)


def test_pagerank_blocks_vertex_subset_drops_unknown_edges(spark):
    """blocks mode resolves ids through the broadcast searchsorted lookup
    (round-9 rewrite); edges touching ids outside vertices= must be dropped
    exactly like the old inner pos-joins did. The engine's contract (all
    modes, unchanged since the pos-join implementation): dropped edges do
    NOT propagate rank, but outdeg keeps the raw per-source edge count, so
    a source with dropped out-edges distributes only the surviving
    fraction of its rank — blocks must match the join modes bit-for-bit,
    and both match a numpy walk using the raw outdegrees."""
    e = spark.createDataFrame(
        pd.DataFrame({"s": [0, 1, 2, 5, 0], "t": [1, 2, 0, 0, 7]})
    )
    v = spark.createDataFrame(pd.DataFrame({"id": [0, 1, 2]}))
    got = {}
    for mode in ["blocks", "join"]:
        ranks, _ = pagerank(e, vertices=v, tol=1e-6, mode=mode)
        got[mode] = ranks.toPandas().sort_values("id")["rank"].values
    assert np.allclose(got["blocks"], got["join"], atol=1e-12)
    # numpy mirror of the contract: surviving edges [[0,1],[1,2],[2,0]],
    # but vertex 0 keeps raw outdeg 2 (edge 0->7 dropped, not re-counted)
    d, n = 0.85, 3
    outdeg = np.array([2.0, 1.0, 1.0])
    r = np.full(n, 1.0 / n)
    for _ in range(200):
        contrib = np.zeros(n)
        contrib[1] += r[0] / outdeg[0]
        contrib[2] += r[1] / outdeg[1]
        contrib[0] += r[2] / outdeg[2]
        r = (1 - d) / n + d * contrib
    assert np.allclose(got["blocks"], r, atol=1e-6)


def test_pagerank_blocks_resume(spark, tmp_path):
    """Durable checkpoint/resume through the rewritten blocks loop."""
    edges = random_digraph(60, 150, 5)
    e, v = _dfs(spark, edges, 60)
    ckdir = str(tmp_path / "ckb")
    full, _ = pagerank(
        e, vertices=v, tol=1e-6, mode="blocks", checkpoint_dir=ckdir, job_id="a"
    )
    full_pd = full.toPandas().sort_values("id")["rank"].values
    pagerank(
        e, vertices=v, tol=1e-6, mode="blocks", max_iter=3,
        checkpoint_dir=ckdir, job_id="b",
    )
    resumed, _ = pagerank(
        e, vertices=v, tol=1e-6, mode="blocks", checkpoint_dir=ckdir,
        job_id="b", resume=True,
    )
    res_pd = resumed.toPandas().sort_values("id")["rank"].values
    assert np.allclose(res_pd, full_pd, atol=1e-12)


def test_pagerank_resume(spark, tmp_path):
    """Kill after superstep k, resume → identical final ranks (north_rule)."""
    edges = random_digraph(60, 150, 5)
    e, v = _dfs(spark, edges, 60)
    ckdir = str(tmp_path / "ck")

    # uninterrupted run
    full, hist = pagerank(e, vertices=v, tol=1e-6, checkpoint_dir=ckdir, job_id="a")
    full_pd = full.toPandas().sort_values("id")["rank"].values

    # interrupted: run only 3 supersteps, then resume to convergence
    partial, _ = pagerank(
        e, vertices=v, tol=1e-6, max_iter=3, checkpoint_dir=ckdir, job_id="b"
    )
    assert len(glob.glob(os.path.join(ckdir, "b", "iter_*.json"))) == 3
    resumed, hist2 = pagerank(
        e, vertices=v, tol=1e-6, checkpoint_dir=ckdir, job_id="b", resume=True
    )
    res_pd = resumed.toPandas().sort_values("id")["rank"].values
    assert np.allclose(res_pd, full_pd, atol=1e-12)
    # metrics carry per-partition lineage
    import json

    with open(sorted(glob.glob(os.path.join(ckdir, "b", "iter_*.json")))[0]) as f:
        m = json.load(f)
    assert "partition_lineage" in m and "l1" in m


@pytest.mark.parametrize("name,n,m,seed", GRAPHS)
def test_cc_parity(spark, name, n, m, seed):
    edges = random_digraph(n, m, seed)
    e, v = _dfs(spark, edges, n)
    expected = cc_oracle(edges, n)
    # default (serial tail fires at these sizes) and pure-distributed loop
    # must both reproduce the oracle labels exactly
    for tail in (50_000, 0):
        got = (
            connected_components(
                e, vertices=v, label_by_size=False, serial_tail_threshold=tail
            )
            .toPandas()
            .sort_values("id")["cp"]
            .values
        )
        assert (got == expected).all(), (name, tail)


def test_cc_serial_tail_inloop_cutover(spark):
    """A threshold between the raw edge count and the contracted star-round
    size exercises the mid-loop cutover (the pre-probe fails, a star round
    runs, then the signature count re-arms the tail); labels must equal the
    distributed fixed point bit-for-bit, including for string vertex ids."""
    edges = random_digraph(120, 400, 13)
    e, v = _dfs(spark, edges, 120)
    expected = cc_oracle(edges, 120)
    got = (
        connected_components(
            e, vertices=v, label_by_size=False, serial_tail_threshold=130
        )
        .toPandas()
        .sort_values("id")["cp"]
        .values
    )
    assert (got == expected).all()
    es = spark.createDataFrame(
        pd.DataFrame(
            {"s": [f"v{a:03d}" for a in edges[:, 0]], "t": [f"v{b:03d}" for b in edges[:, 1]]}
        )
    )
    t_tail = (
        connected_components(es, label_by_size=False, serial_tail_threshold=50_000)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    t_dist = (
        connected_components(es, label_by_size=False, serial_tail_threshold=0)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert t_tail.equals(t_dist)


def test_cc_label_by_size_and_consolidate(spark):
    # components: {0,1,2} {3,4} {5} {6}
    e = spark.createDataFrame(pd.DataFrame({"s": [0, 1, 3], "t": [1, 2, 4]}))
    v = spark.createDataFrame(pd.DataFrame({"id": range(7)}))
    by_size = connected_components(e, vertices=v).toPandas().sort_values("id")["cp"].tolist()
    assert by_size == [0, 0, 0, 1, 1, 2, 3]
    cons = (
        connected_components(e, vertices=v, consolidate_singles=True)
        .toPandas()
        .sort_values("id")["cp"]
        .tolist()
    )
    assert cons == [1, 1, 1, 2, 2, 0, 0]


def test_cc_parallelism_invariance(spark):
    edges = random_digraph(80, 100, 9)
    expected = cc_oracle(edges, 80)
    for parts in [1, 7]:
        e = spark.createDataFrame(
            pd.DataFrame({"s": edges[:, 0], "t": edges[:, 1]})
        ).repartition(parts)
        v = spark.createDataFrame(pd.DataFrame({"id": np.arange(80)}))
        got = (
            connected_components(e, vertices=v, label_by_size=False)
            .toPandas()
            .sort_values("id")["cp"]
            .values
        )
        assert (got == expected).all()


@pytest.mark.parametrize("name,n,m,seed", GRAPHS[:2])
def test_lpa_parity(spark, name, n, m, seed):
    edges = random_digraph(n, m, seed)
    e, v = _dfs(spark, edges, n)
    expected = lpa_oracle(edges, n, iters=5)
    got = (
        label_propagation(e, vertices=v, max_iter=5)
        .toPandas()
        .sort_values("id")["label"]
        .values
    )
    assert (got == expected).all(), name


@pytest.mark.parametrize("name,n,m,seed", GRAPHS)
def test_triangles_parity(spark, name, n, m, seed):
    edges = random_digraph(n, m, seed)
    e, _ = _dfs(spark, edges, n)
    assert triangle_count(e) == triangle_oracle(edges, n)
    per_v = triangles_per_vertex(e).toPandas().set_index("id")["triangles"]
    expected = triangles_per_vertex_oracle(edges, n)
    got = np.zeros(n, dtype=np.int64)
    got[per_v.index.values] = per_v.values
    assert (got == expected).all()


@pytest.mark.parametrize("name,n,m,seed", GRAPHS[:2])
def test_triangles_wedge_reduction(spark, name, n, m, seed):
    """Degree-ordered orientation must not enumerate more candidate wedges
    than naive id-orientation (and strictly fewer on skewed graphs)."""
    from deepgraph_spark.algorithms.triangles import wedge_count

    edges = random_digraph(n, m, seed)
    e, _ = _dfs(spark, edges, n)
    w_deg = wedge_count(e, degree_ordered=True)
    w_id = wedge_count(e, degree_ordered=False)
    assert w_deg <= w_id


def test_triangles_skewed_hub(spark):
    """Star + one closing edge: hub of degree d yields C(d,2) wedges under
    id-orientation (hub id 0) but only O(d) under degree ordering."""
    import pandas as pd

    from deepgraph_spark.algorithms.triangles import triangles_df, wedge_count

    d = 50
    rows = [(0, i) for i in range(1, d + 1)] + [(1, 2)]
    e = spark.createDataFrame(pd.DataFrame(rows, columns=["s", "t"]))
    assert triangles_df(e).collect() == [(0, 1, 2)] or [
        tuple(r) for r in triangles_df(e).collect()
    ] == [(0, 1, 2)]
    assert wedge_count(e, degree_ordered=False) == d * (d - 1) // 2
    assert wedge_count(e, degree_ordered=True) < d


def _kcore_py_oracle(edges, n, k):
    """Plain-python iterative peel on the undirected simple graph."""
    und = {(int(a), int(b)) for a, b in edges if a != b}
    und |= {(b, a) for a, b in und}
    while True:
        deg = {}
        for a, _ in und:
            deg[a] = deg.get(a, 0) + 1
        bad = {v for v, d in deg.items() if d < k}
        if not bad:
            break
        und = {(a, b) for a, b in und if a not in bad and b not in bad}
    return sorted({a for a, _ in und})


@pytest.mark.parametrize("name,n,m,seed", GRAPHS)
@pytest.mark.parametrize("k", [2, 3])
def test_kcore_parity(spark, name, n, m, seed, k):
    from deepgraph_spark.algorithms import k_core

    edges = random_digraph(n, m, seed)
    e, _ = _dfs(spark, edges, n)
    members, hist = k_core(e, k=k)
    got = sorted(r["id"] for r in members.collect())
    assert got == _kcore_py_oracle(edges, n, k), name
    # monotone peel: edge counts never increase, last round is a fixed point
    counts = [h["n_edges"] for h in hist]
    assert counts == sorted(counts, reverse=True)
    assert hist[-1]["removed_edges"] == 0


def test_kcore_validates_k(spark):
    from deepgraph_spark.algorithms import k_core

    e = spark.createDataFrame(pd.DataFrame({"s": [0], "t": [1]}))
    with pytest.raises(ValueError):
        k_core(e, 0)


@pytest.mark.parametrize("name,n,m,seed", GRAPHS)
def test_personalized_pagerank_parity(spark, name, n, m, seed):
    """PPR vs the numpy oracle with a uniform-over-subset teleport vector;
    also checks the mass concentrates on/near the source set."""
    edges = random_digraph(n, m, seed)
    e, v = _dfs(spark, edges, n)
    sources = [i for i in range(n) if i % 5 == 0]
    p = np.zeros(n)
    p[sources] = 1.0 / len(sources)
    oracle = pagerank_numpy_oracle(edges, n, p=p)
    tp = spark.createDataFrame(pd.DataFrame({"id": sources}))
    ranks, _ = pagerank(e, vertices=v, tol=1e-6, teleport=tp)
    got = ranks.toPandas().sort_values("id")["rank"].values
    assert np.allclose(got, oracle, atol=1e-6), name
    # non-source vertices unreachable from sources must have rank 0
    assert got.sum() == pytest.approx(1.0, abs=1e-6)


def test_personalized_pagerank_validates(spark):
    edges = random_digraph(20, 30, 1)
    e, v = _dfs(spark, edges, 20)
    tp = spark.createDataFrame(pd.DataFrame({"id": [0, 5]}))
    with pytest.raises(ValueError, match="join"):
        pagerank(e, vertices=v, teleport=tp, mode="blocks")
    ghost = spark.createDataFrame(pd.DataFrame({"id": [10**9]}))
    with pytest.raises(ValueError, match="no graph vertices"):
        pagerank(e, vertices=v, teleport=ghost)


@pytest.mark.parametrize("name,n,m,seed", GRAPHS)
def test_weighted_lpa_parity(spark, name, n, m, seed):
    """weight= sums votes by edge weight; integer weights keep both sides
    exact, ties break on the smaller label as in the unweighted walk."""
    from oracles import weighted_lpa_oracle

    edges = random_digraph(n, m, seed)
    rng = np.random.default_rng(seed + 7)
    w = rng.integers(1, 20, size=len(edges)).astype(float)
    e = spark.createDataFrame(
        pd.DataFrame({"s": edges[:, 0], "t": edges[:, 1], "w": w})
    )
    v = spark.createDataFrame(pd.DataFrame({"id": np.arange(n)}))
    expected = weighted_lpa_oracle(edges, w, n, iters=5)
    got = (
        label_propagation(e, vertices=v, max_iter=5, weight="w")
        .toPandas()
        .sort_values("id")["label"]
        .values
    )
    assert (got == expected).all(), name


def test_weighted_lpa_uniform_weights_match_unweighted(spark):
    # a<b only: reciprocal pairs legitimately diverge (distinct-dedup vs
    # weight-sum symmetrization), uniform equivalence holds on simple graphs
    edges = random_digraph(40, 100, 11)
    edges = edges[edges[:, 0] < edges[:, 1]]
    e = spark.createDataFrame(
        pd.DataFrame({"s": edges[:, 0], "t": edges[:, 1], "w": 2.0})
    )
    v = spark.createDataFrame(pd.DataFrame({"id": np.arange(40)}))
    got_w = (
        label_propagation(e, vertices=v, max_iter=5, weight="w")
        .toPandas().sort_values("id")["label"].values
    )
    got_u = (
        label_propagation(e, vertices=v, max_iter=5)
        .toPandas().sort_values("id")["label"].values
    )
    assert (got_w == got_u).all()


def test_weighted_lpa_rejects_sums_past_2_53(spark):
    """Vote totals >= 2^53 make double sums shuffle-order-dependent and the
    deterministic tie-break contract void → fail loud (round-6 advice)."""
    e = spark.createDataFrame(
        pd.DataFrame({"s": [0, 1], "t": [1, 0], "w": [2.0**53, 1.0]})
    )
    with pytest.raises(ValueError, match="2\\^53"):
        label_propagation(e, max_iter=2, weight="w")


def test_lpa_weight_guard_lazy_and_raw_abs(spark):
    """The 2^53 vote-exactness guard (round-7 advice): no driver job — and no
    raise — when no superstep will run (max_iter=0); computed from RAW
    symmetrized weights, so mixed-sign weights that cancel within a (u, v)
    pair still trip it."""
    big = 2.0**53
    e = spark.createDataFrame([(1, 2, big), (2, 3, big)], "s long, t long, w double")
    out = label_propagation(e, weight="w", max_iter=0).toPandas()
    assert set(out.label) == {1, 2, 3}

    with pytest.raises(ValueError, match=r"2\^53"):
        label_propagation(e, weight="w", max_iter=2)

    # per-(u,v) sums cancel to 0, but the raw |w| totals are 2^54
    e2 = spark.createDataFrame([(1, 2, big), (1, 2, -big)], "s long, t long, w double")
    with pytest.raises(ValueError, match=r"2\^53"):
        label_propagation(e2, weight="w", max_iter=2)


def test_pagerank_resume_converged_is_noop(spark, tmp_path):
    """Resuming an already-converged run returns identical ranks and runs no
    further supersteps (no new checkpoint files, no guard job)."""
    edges = random_digraph(40, 100, 3)
    e, v = _dfs(spark, edges, 40)
    ckdir = str(tmp_path / "ck")
    full, _ = pagerank(e, vertices=v, tol=1e-6, checkpoint_dir=ckdir, job_id="conv")
    full_pd = full.toPandas().sort_values("id")["rank"].values
    n_files = len(glob.glob(os.path.join(ckdir, "conv", "iter_*.json")))
    assert n_files > 0

    again, _ = pagerank(
        e, vertices=v, tol=1e-6, checkpoint_dir=ckdir, job_id="conv", resume=True
    )
    again_pd = again.toPandas().sort_values("id")["rank"].values
    assert np.allclose(again_pd, full_pd, atol=0)
    assert len(glob.glob(os.path.join(ckdir, "conv", "iter_*.json"))) == n_files
