"""graph_summary vs a brute-force adjacency oracle."""

import itertools

import numpy as np
import pytest

from deepgraph_spark.algorithms import graph_summary
from oracles import random_digraph, star_graph


def _brute(edges):
    adj = {}
    for s, t in edges:
        s, t = int(s), int(t)
        if s == t:
            continue
        adj.setdefault(s, set()).add(t)
        adj.setdefault(t, set()).add(s)
    deg = {v: len(ns) for v, ns in adj.items()}
    n = len(adj)
    m = sum(deg.values()) // 2
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    tri = 0
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri += 1
    xs = [deg[s] for s, ns in adj.items() for _ in ns]
    ys = [deg[t] for s, ns in adj.items() for t in ns]
    x, y = np.array(xs, float), np.array(ys, float)
    var = (x * x).mean() - x.mean() ** 2
    assort = ((x * y).mean() - x.mean() * y.mean()) / var if var > 0 else None
    clus = 3.0 * tri / wedges if wedges else 0.0
    return {
        "n_vertices": n,
        "n_edges": m,
        "avg_degree": 2.0 * m / n,
        "max_degree": max(deg.values()),
        "assortativity": assort,
        "global_clustering": clus,
    }


def _run(spark, edges):
    e = spark.createDataFrame([(int(a), int(b)) for a, b in edges], "s long, t long")
    return graph_summary(e).collect()[0].asDict()


@pytest.mark.parametrize("seed,n,m", [(0, 25, 60), (1, 30, 120), (2, 20, 150)])
def test_random_graphs_vs_brute(spark, seed, n, m):
    e = random_digraph(n, m, seed=seed)
    got, want = _run(spark, e), _brute(e)
    for k in ("n_vertices", "n_edges", "max_degree"):
        assert got[k] == want[k], (k, got, want)
    for k in ("avg_degree", "assortativity", "global_clustering"):
        assert got[k] == pytest.approx(want[k], abs=2e-6), (k, got, want)


def test_star_graph_values(spark):
    # hub + 29 leaves: n=30, m=29, max_degree=29, no triangles, and the
    # most disassortative simple graph shape (r -> -1 as the star grows)
    got = _run(spark, star_graph(30))
    assert got["n_vertices"] == 30 and got["n_edges"] == 29
    assert got["max_degree"] == 29
    assert got["global_clustering"] == 0.0
    assert got["assortativity"] == pytest.approx(-1.0)


def test_regular_graph_null_assortativity(spark):
    # a 4-cycle is 2-regular: zero degree variance -> NULL, not a divide
    got = _run(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    assert got["assortativity"] is None
    assert got["avg_degree"] == pytest.approx(2.0)
    assert got["global_clustering"] == 0.0


def test_local_clustering_values(spark):
    """Triangle + pendant: triangle vertices have clustering 1 except the
    one carrying the pendant (deg 3, 1 triangle of C(3,2)=3 wedges)."""
    from deepgraph_spark.algorithms import local_clustering

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (0, 9)], "s long, t long"
    )
    got = {r["id"]: r for r in local_clustering(e).collect()}
    assert got[1]["clustering"] == pytest.approx(1.0)
    assert got[2]["clustering"] == pytest.approx(1.0)
    assert got[0]["degree"] == 3 and got[0]["triangles"] == 1
    assert got[0]["clustering"] == pytest.approx(1.0 / 3.0)
    assert got[9]["degree"] == 1 and got[9]["clustering"] == 0.0


@pytest.mark.parametrize("seed,n,m", [(0, 25, 60), (2, 20, 150)])
def test_local_clustering_vs_brute(spark, seed, n, m):
    from deepgraph_spark.algorithms import local_clustering

    e = random_digraph(n, m, seed=seed)
    adj = {}
    for s, t in e:
        s, t = int(s), int(t)
        if s == t:
            continue
        adj.setdefault(s, set()).add(t)
        adj.setdefault(t, set()).add(s)
    got = {r["id"]: r for r in local_clustering(
        spark.createDataFrame([(int(a), int(b)) for a, b in e], "s long, t long")
    ).collect()}
    assert set(got) == set(adj)
    for v, ns in adj.items():
        d = len(ns)
        tri = sum(1 for a in ns for b in ns if a < b and b in adj[a])
        assert got[v]["degree"] == d and got[v]["triangles"] == tri
        want = tri / (d * (d - 1) / 2) if d >= 2 else 0.0
        assert got[v]["clustering"] == pytest.approx(want, abs=2e-6)
