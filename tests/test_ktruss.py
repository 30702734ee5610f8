"""k-truss vs a brute-force support-peel oracle."""

import pytest

from deepgraph_spark.algorithms import k_truss
from oracles import random_digraph, star_graph


def _brute(edges, k):
    es = set()
    for s, t in edges:
        s, t = int(s), int(t)
        if s != t:
            es.add((min(s, t), max(s, t)))
    need = k - 2
    while True:
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        drop = {
            (a, b) for a, b in es if len(adj[a] & adj[b]) < need
        }
        if not drop:
            return es
        es -= drop


def _run(spark, edges, k):
    e = spark.createDataFrame([(int(a), int(b)) for a, b in edges], "s long, t long")
    out, history = k_truss(e, k)
    got = {(r["s"], r["t"]) for r in out.collect()}
    # history is monotone and ends at a fixed point
    sizes = [h["n_edges"] for h in history]
    assert sizes == sorted(sizes, reverse=True)
    assert history[-1]["removed_edges"] == 0
    return got


def test_k4_fixed(spark):
    # K4 (every edge in 2 triangles -> survives k=4) plus a pendant triangle
    # hanging off it (support 1 each -> peeled at k=4, kept at k=3)
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    pendant = [(3, 10), (3, 11), (10, 11)]
    edges = k4 + pendant
    assert _run(spark, edges, 4) == {(a, b) for a, b in k4}
    assert _run(spark, edges, 3) == {(min(a, b), max(a, b)) for a, b in edges}


def test_star_has_no_3truss(spark):
    assert _run(spark, star_graph(20), 3) == set()


@pytest.mark.parametrize("seed,n,m,k", [(0, 25, 120, 3), (1, 20, 150, 4), (2, 18, 120, 5)])
def test_random_vs_brute(spark, seed, n, m, k):
    e = random_digraph(n, m, seed=seed)
    assert _run(spark, e, k) == _brute(e, k)


def test_k2_is_whole_simple_graph(spark):
    e = [(0, 1), (1, 2), (5, 6)]
    assert _run(spark, e, 2) == {(0, 1), (1, 2), (5, 6)}


def test_k_below_2_rejected(spark):
    import pyspark.sql.functions as F  # noqa: F401

    e = [(0, 1)]
    with pytest.raises(ValueError, match="k >= 2"):
        _run(spark, e, 1)
