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
