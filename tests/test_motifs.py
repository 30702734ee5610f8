"""4-cycle counting vs the brute-force common-neighbor oracle."""

import numpy as np
import pytest

from deepgraph_spark.algorithms import common_neighbor_pairs, four_cycle_count
from deepgraph_spark.algorithms.motifs import wedge_count
from oracles import four_cycle_oracle, random_digraph, star_graph


def _count(spark, edges):
    e = spark.createDataFrame([(int(a), int(b)) for a, b in edges], "s long, t long")
    return four_cycle_count(e).collect()[0]["n_four_cycles"]


def test_four_cycles_fixed(spark):
    # square; K4 (3 cycles); triangle (0); two squares sharing an edge —
    # packed disjointly at offsets into one run
    graphs = [
        ([(0, 1), (1, 2), (2, 3), (3, 0)], 1),
        ([(10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)], 3),
        ([(20, 21), (21, 22), (22, 20)], 0),
        ([(30, 31), (31, 32), (32, 33), (33, 30), (32, 35), (35, 34), (34, 33)], 2),
    ]
    edges = [p for g, _ in graphs for p in g]
    assert _count(spark, edges) == sum(c for _, c in graphs)


def test_four_cycles_star_has_none(spark):
    assert _count(spark, star_graph(30)) == 0


@pytest.mark.parametrize("seed,n,m", [(0, 25, 60), (1, 30, 120), (2, 20, 150)])
def test_four_cycles_random(spark, seed, n, m):
    e = random_digraph(n, m, seed=seed)
    assert _count(spark, e) == four_cycle_oracle(e, n)


def test_wedge_count_star(spark):
    # star_graph(30) = hub + 29 leaves: hub degree 29 -> C(29,2)=406 hub
    # wedges; each leaf (degree 1) contributes 0
    e = spark.createDataFrame(
        [(int(a), int(b)) for a, b in star_graph(30)], "s long, t long"
    )
    assert wedge_count(e) == 406


def test_max_wedges_guard_trips_on_star(spark):
    e = spark.createDataFrame(
        [(int(a), int(b)) for a, b in star_graph(30)], "s long, t long"
    )
    with pytest.raises(ValueError, match="max_wedges"):
        four_cycle_count(e, max_wedges=100).collect()
    # None disables the guard; star has no 4-cycles
    assert four_cycle_count(e, max_wedges=None).collect()[0]["n_four_cycles"] == 0


def test_common_neighbor_pairs_values(spark):
    # path 0-1-2: pair (0,2) has exactly one common neighbor (1)
    e = spark.createDataFrame([(0, 1), (1, 2)], "s long, t long")
    rows = {(r["a"], r["b"]): r["p"] for r in common_neighbor_pairs(e).collect()}
    assert rows == {(0, 2): 1}


def test_max_middle_degree_capped_counts(spark):
    """K_{2,m} double-star: hubs h1,h2 over m shared leaves -> C(m,2) exact
    4-cycles. Capping middles at degree 2 drops every wedge THROUGH a hub,
    so each cycle survives only via its leaf-middled diagonal (h1,h2):
    half a cycle each -> C(m,2)/2. Documented lower bound, exact at cap >=
    max degree; a cap also shrinks the wedge guard's pre-count."""
    m = 5
    h1, h2 = 100, 200
    edges = [(h1, i, ) for i in range(m)] + [(h2, i) for i in range(m)]
    e = spark.createDataFrame([(a, b) for a, b in edges], "s long, t long")
    exact = four_cycle_count(e).collect()[0]["n_four_cycles"]
    assert exact == m * (m - 1) // 2  # C(m,2) = 10
    capped = four_cycle_count(e, max_middle_degree=2).collect()[0]["n_four_cycles"]
    assert capped == exact // 2  # one surviving diagonal per cycle
    # undercount is one-sided and vanishes when the cap clears every degree
    assert capped <= exact
    full = four_cycle_count(e, max_middle_degree=m).collect()[0]["n_four_cycles"]
    assert full == exact
    # pair table mirrors it: (h1,h2) keeps p=m leaf middles; leaf pairs
    # lose their hub middles entirely
    pairs = {
        (r["a"], r["b"]): r["p"]
        for r in common_neighbor_pairs(e, max_middle_degree=2).collect()
    }
    assert pairs == {(h1, h2): m}


def test_max_middle_degree_admits_guarded_graph(spark):
    """A graph whose raw wedge count trips max_wedges passes once hub
    middles are capped — the error message's guidance is actionable."""
    e = spark.createDataFrame(
        [(int(a), int(b)) for a, b in star_graph(30)], "s long, t long"
    )
    with pytest.raises(ValueError, match="max_middle_degree"):
        four_cycle_count(e, max_wedges=100).collect()
    got = four_cycle_count(e, max_wedges=100, max_middle_degree=5).collect()
    assert got[0]["n_four_cycles"] == 0
