"""Partitioning-independence of the engine-addition kernels.

The operators' docstrings promise results that are pure functions of the
graph (deterministic hash walks, peel fixed points, score tables) — these
tests enforce it by running each kernel over the same edges at wildly
different physical layouts (1 partition vs many, shuffled row order) and
requiring identical results. This is the property that makes reruns and
shard retries safe at 100 TB.
"""

import pytest
from pyspark.sql import functions as F

from deepgraph_spark.algorithms import (
    graph_summary,
    harmonic_centrality,
    k_truss,
    link_prediction_scores,
    random_walks,
)
from oracles import random_digraph


@pytest.fixture(scope="module")
def layouts(spark):
    e = random_digraph(30, 150, seed=9)
    rows = [(int(a), int(b)) for a, b in e]
    one = spark.createDataFrame(rows, "s long, t long").coalesce(1)
    many = (
        spark.createDataFrame(list(reversed(rows)), "s long, t long")
        .repartition(17, "t")
    )
    return one, many


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_random_walks_partitioning_invariant(spark, layouts):
    one, many = layouts
    a = _rows(random_walks(one, walk_length=4, seed=7))
    b = _rows(random_walks(many, walk_length=4, seed=7))
    assert a == b


def test_linkpred_partitioning_invariant(spark, layouts):
    one, many = layouts
    cols = ["a", "b", "cn", "pref_attach"]
    a = _rows(link_prediction_scores(one).select(*cols))
    b = _rows(link_prediction_scores(many).select(*cols))
    assert a == b
    # float scores agree to rounding
    fa = _rows(link_prediction_scores(one).select("a", "b", F.round("adamic_adar", 9)))
    fb = _rows(link_prediction_scores(many).select("a", "b", F.round("adamic_adar", 9)))
    assert fa == fb


def test_ktruss_partitioning_invariant(spark, layouts):
    one, many = layouts
    assert _rows(k_truss(one, 4)[0]) == _rows(k_truss(many, 4)[0])


def test_harmonic_partitioning_invariant(spark, layouts):
    one, many = layouts
    seeds = spark.createDataFrame([(0,), (3,), (7,)], "id long")
    a = _rows(harmonic_centrality(one, seeds).select("id", F.round("harmonic", 9)))
    b = _rows(harmonic_centrality(many, seeds).select("id", F.round("harmonic", 9)))
    assert a == b


def test_graph_summary_partitioning_invariant(spark, layouts):
    one, many = layouts
    assert _rows(graph_summary(one)) == _rows(graph_summary(many))
