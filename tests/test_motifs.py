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
