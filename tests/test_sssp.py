"""Weighted SSSP kernel vs the numpy Bellman-Ford oracle."""

import numpy as np
import pytest

from deepgraph_spark.algorithms import sssp
from oracles import random_digraph, sssp_oracle


def _weighted(edges, seed):
    rng = np.random.default_rng(seed)
    return [(int(a), int(b), float(w)) for (a, b), w in
            zip(edges, rng.integers(1, 100, size=len(edges)))]


def _run(spark, wedges, sources, **kw):
    e = spark.createDataFrame(wedges, "s long, t long, w double")
    srcs = spark.createDataFrame([(int(s),) for s in sources], "id long")
    out = sssp(e, srcs, **kw).toPandas().set_index("id")["dist"]
    return out


@pytest.mark.parametrize("seed,n,m", [(0, 25, 60), (1, 40, 120), (2, 20, 150)])
def test_sssp_random_weighted(spark, seed, n, m):
    wedges = _weighted(random_digraph(n, m, seed=seed), seed)
    sources = [0, n // 2]
    got = _run(spark, wedges, sources)
    want = sssp_oracle(wedges, n, sources)
    for v in range(n):
        if np.isinf(want[v]):
            assert v not in got.index
        else:
            assert got[v] == pytest.approx(want[v], abs=1e-9), f"vertex {v}"


def test_sssp_directions(spark):
    # chain 0 -w=1-> 1 -w=2-> 2; weights distinguish from hop counting
    wedges = [(0, 1, 1.0), (1, 2, 2.0)]
    fwd = _run(spark, wedges, [0])
    assert dict(fwd) == {0: 0.0, 1: 1.0, 2: 3.0}
    bwd = _run(spark, wedges, [2], direction="backward")
    assert dict(bwd) == {2: 0.0, 1: 2.0, 0: 3.0}
    und = _run(spark, wedges, [2], direction="undirected")
    assert dict(und) == {2: 0.0, 1: 2.0, 0: 3.0}


def test_sssp_prefers_cheap_long_path(spark):
    # direct hop costs 10; the 3-hop detour costs 3 — weights must win
    wedges = [(0, 3, 10.0), (0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)]
    got = _run(spark, wedges, [0])
    assert got[3] == 3.0


def test_sssp_parallel_edges_take_min(spark):
    wedges = [(0, 1, 5.0), (0, 1, 2.0)]
    assert _run(spark, wedges, [0])[1] == 2.0


@pytest.mark.parametrize("seed,n,m,budget", [(0, 25, 60, 80.0), (3, 40, 120, 50.0)])
def test_sssp_max_dist_equals_postfilter(spark, seed, n, m, budget):
    # in-loop budget pruning must be EXACT: same vertices and distances as
    # running unbounded and filtering dist <= budget afterwards
    wedges = _weighted(random_digraph(n, m, seed=seed), seed)
    sources = [0, n // 2]
    full = _run(spark, wedges, sources)
    pruned = _run(spark, wedges, sources, max_dist=budget)
    want = {v: d for v, d in full.items() if d <= budget}
    assert dict(pruned) == pytest.approx(want)


def test_sssp_max_dist_zero_keeps_seeds(spark):
    got = _run(spark, [(0, 1, 1.0), (1, 2, 1.0)], [0], max_dist=0.0)
    assert dict(got) == {0: 0.0}


def test_sssp_max_dist_negative_raises(spark):
    with pytest.raises(ValueError, match="max_dist"):
        _run(spark, [(0, 1, 1.0)], [0], max_dist=-1.0)


def test_ego_net_weighted_budget_ball(spark):
    # star-with-tails: seed 0; budget 2.5 reaches {0,1,2 (1+1), 3 (2)} but
    # not 4 (1+1+5); induced edges only among the kept set
    from deepgraph_spark.core import DeepGraphFrame

    wedges = [(0, 1, 1.0), (1, 2, 1.0), (0, 3, 2.0), (2, 4, 5.0), (3, 2, 1.0)]
    v = spark.createDataFrame([(i,) for i in range(5)], "id long")
    e = spark.createDataFrame(wedges, "s long, t long, w double")
    g = DeepGraphFrame(v, e, index_col="id").ego_net_weighted([0], 2.5)
    dists = {r["id"]: r["dist"] for r in g.v.collect()}
    assert dists == {0: 0.0, 1: 1.0, 2: 2.0, 3: 2.0}
    kept = {(r["s"], r["t"]) for r in g.e.collect()}
    assert kept == {(0, 1), (1, 2), (0, 3), (3, 2)}


def test_sssp_rejects_negative_weights(spark):
    with pytest.raises(ValueError, match="non-negative"):
        _run(spark, [(0, 1, -1.0)], [0])


def test_sssp_max_iter_raises(spark):
    wedges = [(i, i + 1, 1.0) for i in range(10)]
    with pytest.raises(RuntimeError, match="max_iter"):
        _run(spark, wedges, [0], max_iter=3)
