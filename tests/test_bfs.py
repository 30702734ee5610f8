"""BFS kernel vs the queue oracle (the traversal the reference runs by
exporting to graph-tool — terrorists.py:222,310 — kept distributed here)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from deepgraph_spark.algorithms import bfs
from oracles import bfs_oracle, random_digraph


def _run(spark, edges, n, sources, direction):
    e = spark.createDataFrame([(int(a), int(b)) for a, b in edges], "s long, t long")
    s = spark.createDataFrame([(int(x),) for x in sources], "id long")
    out = bfs(e, s, direction=direction).toPandas().set_index("id")["dist"]
    full = np.full(n, -1, dtype=np.int64)
    full[out.index.to_numpy()] = out.to_numpy()
    return full


@pytest.mark.parametrize("seed,n,m", [(0, 40, 80), (1, 50, 60), (2, 30, 150)])
@pytest.mark.parametrize("direction", ["forward", "undirected"])
def test_bfs_random(spark, seed, n, m, direction):
    e = random_digraph(n, m, seed=seed)
    got = _run(spark, e, n, [0, 7], direction)
    want = bfs_oracle(e, n, [0, 7], directed=(direction == "forward"))
    np.testing.assert_array_equal(got, want)


def test_bfs_backward_equals_forward_on_reversed(spark):
    e = random_digraph(30, 50, seed=3)
    got = _run(spark, e[:, ::-1], 30, [1], "forward")
    # forward on reversed edges == backward on originals
    back = _run(spark, e, 30, [1], "backward")
    np.testing.assert_array_equal(got, back)


def test_bfs_chain_and_unreached(spark):
    edges = [(0, 1), (1, 2), (2, 3)]
    got = _run(spark, edges, 6, [0], "forward")
    np.testing.assert_array_equal(got, [0, 1, 2, 3, -1, -1])


def test_bfs_max_iter_raises(spark):
    edges = [(i, i + 1) for i in range(10)]
    e = spark.createDataFrame(edges, "s long, t long")
    s = spark.createDataFrame([(0,)], "id long")
    with pytest.raises(RuntimeError, match="max_iter"):
        bfs(e, s, max_iter=3)


def test_bfs_max_depth_truncates_without_error(spark):
    e = spark.createDataFrame([(i, i + 1) for i in range(10)], "s long, t long")
    seeds = spark.createDataFrame([(0,)], "id long")
    from deepgraph_spark.algorithms import bfs

    out = bfs(e, seeds, max_depth=3).toPandas().set_index("id")["dist"]
    assert dict(out) == {0: 0, 1: 1, 2: 2, 3: 3}


def test_ego_net_induced_subgraph(spark):
    """Chain 0..5 plus an off-net edge: radius-2 forward ego net of {0}
    keeps {0,1,2} with dists and only the edges among them."""
    from deepgraph_spark.core import DeepGraphFrame

    edges = [(i, i + 1) for i in range(5)] + [(10, 11)]
    e = spark.createDataFrame(edges, "s long, t long")
    ids = sorted({x for p in edges for x in p})
    v = spark.createDataFrame([(i,) for i in ids], "id long")
    g = DeepGraphFrame(v, e, index_col="id").ego_net([0], radius=2, direction="forward")
    vd = g.v.toPandas().set_index("id")["dist"]
    assert dict(vd) == {0: 0, 1: 1, 2: 2}
    got_e = sorted(map(tuple, g.e.select("s", "t").toPandas().values.tolist()))
    assert got_e == [(0, 1), (1, 2)]
