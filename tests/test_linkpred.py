"""Link-prediction scores vs a brute-force adjacency-set oracle."""

import math

import numpy as np
import pytest

from deepgraph_spark.algorithms import link_prediction_scores
from oracles import random_digraph, star_graph


def _brute(edges, *, min_common=1, predict_new=True, max_middle_degree=None):
    adj = {}
    for s, t in edges:
        s, t = int(s), int(t)
        if s == t:
            continue
        adj.setdefault(s, set()).add(t)
        adj.setdefault(t, set()).add(s)
    deg = {v: len(ns) for v, ns in adj.items()}
    out = {}
    verts = sorted(adj)
    for i, a in enumerate(verts):
        for b in verts[i + 1 :]:
            common = adj[a] & adj[b]
            if max_middle_degree is not None:
                common = {m for m in common if deg[m] <= max_middle_degree}
            cn = len(common)
            if cn < min_common:
                continue
            if predict_new and b in adj[a]:
                continue
            out[(a, b)] = (
                cn,
                cn / (deg[a] + deg[b] - cn),
                sum(1.0 / math.log(deg[m]) for m in common),
                sum(1.0 / deg[m] for m in common),
                deg[a] * deg[b],
            )
    return out


def _run(spark, edges, **kw):
    e = spark.createDataFrame([(int(a), int(b)) for a, b in edges], "s long, t long")
    rows = link_prediction_scores(e, **kw).collect()
    return {
        (r["a"], r["b"]): (
            r["cn"],
            r["jaccard"],
            r["adamic_adar"],
            r["resource_allocation"],
            r["pref_attach"],
        )
        for r in rows
    }


def _assert_match(got, want):
    assert set(got) == set(want), (sorted(set(got) ^ set(want))[:5],)
    for k, g in got.items():
        w = want[k]
        assert g[0] == w[0] and g[4] == w[4], (k, g, w)
        for gi, wi in zip(g[1:4], w[1:4]):
            assert abs(gi - wi) < 1e-9, (k, g, w)


def test_path_graph_hand_values(spark):
    # path 0-1-2: candidate pair (0,2), one common neighbor of degree 2
    got = _run(spark, [(0, 1), (1, 2)])
    assert set(got) == {(0, 2)}
    cn, jac, aa, ra, pa = got[(0, 2)]
    assert cn == 1 and pa == 1
    assert jac == pytest.approx(1.0)
    assert aa == pytest.approx(1.0 / math.log(2))
    assert ra == pytest.approx(0.5)


@pytest.mark.parametrize("seed,n,m", [(0, 25, 60), (1, 30, 120), (2, 20, 150)])
def test_random_graphs_vs_brute(spark, seed, n, m):
    e = random_digraph(n, m, seed=seed)
    _assert_match(_run(spark, e), _brute(e))


def test_scoring_existing_edges_mode(spark):
    # predict_new=False keeps already-connected pairs (edge-weighting mode)
    e = random_digraph(25, 80, seed=3)
    _assert_match(
        _run(spark, e, predict_new=False, min_common=2),
        _brute(e, predict_new=False, min_common=2),
    )


def test_max_middle_degree_is_one_sided_undercount(spark):
    e = random_digraph(25, 120, seed=4)
    capped = _run(spark, e, max_middle_degree=4)
    _assert_match(capped, _brute(e, max_middle_degree=4))
    exact = _run(spark, e)
    # every surviving pair's cn is a lower bound; endpoint-degree features
    # (pref_attach) stay TRUE degrees under the cap
    for k, g in capped.items():
        assert g[0] <= exact[k][0]
        assert g[4] == exact[k][4]


def test_max_wedges_guard_trips_on_star(spark):
    edges = [(int(a), int(b)) for a, b in star_graph(30)]
    e = spark.createDataFrame(edges, "s long, t long")
    with pytest.raises(ValueError, match="max_wedges"):
        link_prediction_scores(e, max_wedges=100).collect()
    # star: every leaf pair shares exactly the hub -> C(29,2) candidates
    got = _run(spark, edges, max_wedges=None)
    assert len(got) == 29 * 28 // 2
    assert all(v[0] == 1 for v in got.values())
