"""Seeded BFS + sampled harmonic centrality vs python oracles."""

from collections import deque

import pytest

from deepgraph_spark.algorithms import harmonic_centrality, seeded_bfs
from oracles import random_digraph, star_graph


def _brute_dists(edges, seeds, directed=False):
    adj = {}
    for s, t in edges:
        s, t = int(s), int(t)
        if s == t:
            continue
        adj.setdefault(s, set()).add(t)
        if not directed:
            adj.setdefault(t, set()).add(s)
    out = {}
    for seed in seeds:
        dist = {seed: 0}
        q = deque([seed])
        while q:
            u = q.popleft()
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for v, d in dist.items():
            out[(seed, v)] = d
    return out


def _df(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "s long, t long"
    )


@pytest.mark.parametrize("seed,n,m", [(0, 25, 60), (1, 30, 120)])
def test_seeded_bfs_vs_brute(spark, seed, n, m):
    e = random_digraph(n, m, seed=seed)
    seeds = sorted({int(a) for a, _ in e})[:4]
    sdf = spark.createDataFrame([(s,) for s in seeds], "id long")
    got = {
        (r["seed"], r["id"]): r["dist"]
        for r in seeded_bfs(_df(spark, e), sdf).collect()
    }
    assert got == _brute_dists(e, seeds)


def test_seeded_bfs_directed(spark):
    e = [(0, 1), (1, 2), (2, 3)]
    sdf = spark.createDataFrame([(0,), (2,)], "id long")
    got = {
        (r["seed"], r["id"]): r["dist"]
        for r in seeded_bfs(_df(spark, e), sdf, direction="forward").collect()
    }
    assert got == _brute_dists(e, [0, 2], directed=True)
    assert (2, 1) not in got  # no backward reach in forward mode


def test_harmonic_star(spark):
    # star: hub at distance 1 from every leaf seed; leaves at distance 1
    # from the hub, 2 from each other. Seeds = hub + 2 leaves.
    e = star_graph(6)  # hub 0, leaves 1..5
    sdf = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    got = {
        r["id"]: r["harmonic"]
        for r in harmonic_centrality(_df(spark, e), sdf).collect()
    }
    # hub: 1/1 from each leaf seed = 2.0 (own seed d=0 excluded)
    assert got[0] == pytest.approx(2.0)
    # leaf 1: 1/1 (hub) + 1/2 (leaf 2) = 1.5; leaf 3: 1/1 + 1/2 + 1/2 = 2.0
    assert got[1] == pytest.approx(1.5)
    assert got[3] == pytest.approx(2.0)


def test_harmonic_excludes_unreached_and_self(spark):
    # two components; seed only in the first
    e = [(0, 1), (5, 6)]
    sdf = spark.createDataFrame([(0,)], "id long")
    got = {
        r["id"]: r["harmonic"]
        for r in harmonic_centrality(_df(spark, e), sdf).collect()
    }
    assert set(got) == {1}  # seed itself (d=0) and the 5-6 component absent
    assert got[1] == pytest.approx(1.0)


def _brute_brandes(edges, seeds, directed=False):
    """Per-seed Brandes dependency accumulation; returns Σ_seeds δ per
    vertex for every vertex reached at depth >= 1 from some seed."""
    adj = {}
    for s, t in edges:
        s, t = int(s), int(t)
        if s == t:
            continue
        adj.setdefault(s, set()).add(t)
        if not directed:
            adj.setdefault(t, set()).add(s)
    out = {}
    for s in seeds:
        dist = {s: 0}
        sigma = {s: 1}
        order = [s]
        q = deque([s])
        while q:
            u = q.popleft()
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    sigma[v] = 0
                    order.append(v)
                    q.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for v in adj.get(w, set()) if not directed else {
                u for u in dist if w in adj.get(u, ())
            }:
                if v in dist and dist[v] == dist[w] - 1:
                    delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
        for v in order:
            if v != s:
                out[v] = out.get(v, 0.0) + delta[v]
    return out


@pytest.mark.parametrize("seed,n,m", [(0, 25, 60), (1, 30, 120), (2, 18, 150)])
def test_betweenness_vs_brute(spark, seed, n, m):
    from deepgraph_spark.algorithms import betweenness_centrality

    e = random_digraph(n, m, seed=seed)
    seeds = sorted({int(a) for a, _ in e})[:4]
    sdf = spark.createDataFrame([(s,) for s in seeds], "id long")
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality(_df(spark, e), sdf).collect()
    }
    want = _brute_brandes(e, seeds)
    assert set(got) == set(want)
    for v, d in want.items():
        assert got[v] == pytest.approx(d, abs=1e-9), (v, got[v], d)


def test_betweenness_path_hand_values(spark):
    # path 0-1-2-3, seeds {0, 3}: middle vertices carry all the paths.
    # From 0: delta(1)=2 (covers pairs (0,2),(0,3) via 1... Brandes:
    # delta(2)=1, delta(1)=2. From 3 symmetric: delta(2)=2, delta(1)=1.
    e = [(0, 1), (1, 2), (2, 3)]
    sdf = spark.createDataFrame([(0,), (3,)], "id long")
    from deepgraph_spark.algorithms import betweenness_centrality

    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality(_df(spark, e), sdf).collect()
    }
    assert got[1] == pytest.approx(3.0)
    assert got[2] == pytest.approx(3.0)
    # endpoints as reached non-seed intermediates with no dependency
    assert got[0] == pytest.approx(0.0) and got[3] == pytest.approx(0.0)


def test_betweenness_raises_past_max_iter(spark):
    e = [(i, i + 1) for i in range(20)]
    sdf = spark.createDataFrame([(0,)], "id long")
    from deepgraph_spark.algorithms import betweenness_centrality

    with pytest.raises(RuntimeError, match="max_iter"):
        betweenness_centrality(_df(spark, e), sdf, max_iter=3)
