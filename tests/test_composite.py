"""Composite flow from the reference's precipitation tutorial
(doc/source/tutorials/precipitation.py:258-520): band-join edges →
connected components → component supernode table (with collected member
sets) → supergraph of components via all-pairs intersection connectors —
exercises array-valued columns through the pairwise path and the scipy-free
hypergeometric connector."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from deepgraph_spark.algorithms import connected_components
from deepgraph_spark.core import DeepGraphFrame
from deepgraph_spark.edges import create_edges
from deepgraph_spark.functions import hypergeom_sf


def exact_hypergeom_sf(k, M, n, N):
    """Brute-force tail sum via exact binomials."""
    total = 0.0
    for x in range(k + 1, min(n, N) + 1):
        total += (
            math.comb(n, x) * math.comb(M - n, N - x) / math.comb(M, N)
        )
    return total


def test_hypergeom_sf_exact():
    for (k, M, n, N) in [(0, 20, 7, 12), (2, 50, 10, 5), (4, 100, 30, 20), (-1, 10, 3, 3)]:
        got = hypergeom_sf(k, M, n, N)[0]
        exp = exact_hypergeom_sf(k, M, n, N)
        assert abs(got - exp) < 1e-12, (k, M, n, N, got, exp)


def test_component_supergraph(spark):
    # two chains + one singleton over 7 nodes, with a group feature
    e = spark.createDataFrame(pd.DataFrame({"s": [0, 1, 3, 4], "t": [1, 2, 4, 5]}))
    v = spark.createDataFrame(
        pd.DataFrame({"id": range(7), "grp": ["a", "b", "a", "b", "a", "b", "a"]})
    )
    cp = connected_components(e, vertices=v, label_by_size=False)
    vv = v.join(cp, "id")

    # component supernode table: member-group sets
    sv = vv.groupBy("cp").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.array_sort(F.collect_set("grp")).alias("grps"),
        F.array_sort(F.collect_list("id")).alias("members"),
    )

    def intersections(grps_s, grps_t):
        intsec_card = np.array(
            [len(set(a) & set(b)) for a, b in zip(grps_s, grps_t)], dtype=np.int64
        )
        return intsec_card

    def strength(grps_s, grps_t, intsec_card):
        strength = intsec_card / np.minimum(
            np.array([len(a) for a in grps_s]), np.array([len(b) for b in grps_t])
        ).astype(float)
        return strength

    se = create_edges(
        sv, [intersections, strength], index_col="cp", transfer_features=["n_nodes"]
    ).toPandas().sort_values(["s", "t"]).reset_index(drop=True)

    # components: {0,1,2} cp=0, {3,4,5} cp=3, {6} cp=6
    assert [tuple(r) for r in se[["s", "t"]].values] == [(0, 3), (0, 6), (3, 6)]
    # grp sets: cp0 -> {a,b}, cp3 -> {a,b}, cp6 -> {a}
    assert se.intsec_card.tolist() == [2, 1, 1]
    assert se.strength.tolist() == [1.0, 1.0, 1.0]
    assert se.n_nodes_s.tolist() == [3, 3, 3]
    assert se.n_nodes_t.tolist() == [3, 1, 1]


def test_native_intersection_columns(spark):
    from deepgraph_spark.functions import intersection_strength_col, node_intersection_col

    df = spark.createDataFrame(
        pd.DataFrame({"a": [["x", "y"], ["x"]], "b": [["y", "z"], ["q"]]})
    )
    intsec, card = node_intersection_col(F.col("a"), F.col("b"))
    out = df.select(
        card.alias("card"), intersection_strength_col(F.col("a"), F.col("b")).alias("st")
    ).toPandas()
    assert out.card.tolist() == [1, 0]
    assert out.st.tolist() == [0.5, 0.0]


def test_great_circle_native_vs_pandas(spark):
    from deepgraph_spark.connectors import great_circle_dist
    from deepgraph_spark.functions import great_circle_dist_col

    pdf = pd.DataFrame(
        {
            "lat1": [0.0, 52.5, -33.9],
            "lon1": [0.0, 13.4, 18.4],
            "lat2": [0.0, 48.9, 55.7],
            "lon2": [90.0, 2.3, 12.6],
        }
    )
    df = spark.createDataFrame(pdf)
    native = df.select(
        great_circle_dist_col(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d")
    ).toPandas()["d"].values
    vec = great_circle_dist(pdf.lat1.values, pdf.lat2.values, pdf.lon1.values, pdf.lon2.values)
    assert np.allclose(native, vec, atol=1e-9)
    assert abs(native[0] - 10007.5) < 10  # quarter meridian
