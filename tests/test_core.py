"""DeepGraphFrame partitioning / filtering / binning tests — the Spark
re-expression of the reference's partition and interface tests
(tests/test_DeepGraph.py:42-334), on the F3 fixture."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from deepgraph_spark.core import DeepGraphFrame
from deepgraph_spark.edges import create_edges_ft

V5 = pd.DataFrame(
    {
        "id": np.arange(5, dtype=np.int64),
        "x": [-3.4, 2.1, -1.1, 0.9, 2.3],
        "time": np.array([0, 1, 2, 5, 9], dtype=np.int64),
        "color": ["g", "g", "b", "g", "r"],
        "size": np.array([1, 3, 2, 3, 1], dtype=np.int64),
    }
)


def some_relations(x_s, x_t, color_s, color_t, size_s, size_t):
    dx = x_t - x_s
    same_color = color_s == color_t
    larger_than = size_s > size_t
    return dx, same_color, larger_than


@pytest.fixture(scope="module")
def g(spark):
    v = spark.createDataFrame(V5).cache()
    gf = DeepGraphFrame(v, index_col="id")
    gf.create_edges_ft(("time", 5), [some_relations])
    gf.e = gf.e.cache()
    return gf


def test_edge_table(g):
    e = g.e.toPandas().sort_values(["s", "t"]).reset_index(drop=True)
    # pairs with time_t - time_s <= 5: (0,1),(0,2),(0,3),(1,2),(1,3),(2,3),(3,4)
    assert [tuple(r) for r in e[["s", "t"]].values] == [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)
    ]
    x = V5.x.values
    assert np.allclose(e.dx, [x[t] - x[s] for s, t in e[["s", "t"]].values])
    assert e.same_color.tolist() == [True, False, True, False, True, False, False]


def test_n_m_f_r(g):
    assert g.n == 5
    assert g.m == 7
    assert g.f()["x"] == 5
    assert g.r()["dx"] == 7


def test_partition_nodes(g):
    sv = g.partition_nodes("color", {"size": ["sum", "mean"], "x": "min"}).toPandas()
    sv = sv.sort_values("color").reset_index(drop=True)
    exp = V5.groupby("color").agg(
        n_nodes=("id", "size"), size_sum=("size", "sum"),
        size_mean=("size", "mean"), x=("x", "min"),
    ).reset_index()
    assert sv.color.tolist() == exp.color.tolist()
    assert sv.n_nodes.tolist() == exp.n_nodes.tolist()
    assert sv.size_sum.tolist() == exp.size_sum.tolist()
    assert np.allclose(sv.size_mean, exp.size_mean)
    assert np.allclose(sv.x, exp.x)


def test_partition_edges_by_node_features(g):
    se = g.partition_edges(
        source_features="color", target_features="color", relation_funcs={"dx": "mean"}
    ).toPandas().sort_values(["color_s", "color_t"]).reset_index(drop=True)
    # build expected from edge list
    e = g.e.toPandas()
    c = V5.color.values
    e["color_s"] = c[e.s.values]
    e["color_t"] = c[e.t.values]
    exp = e.groupby(["color_s", "color_t"]).agg(
        n_edges=("dx", "size"), dx=("dx", "mean")
    ).reset_index().sort_values(["color_s", "color_t"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        se[["color_s", "color_t", "n_edges"]], exp[["color_s", "color_t", "n_edges"]],
        check_dtype=False,
    )
    assert np.allclose(se.dx, exp.dx)


def test_partition_graph(g):
    sv, se = g.partition_graph("color")
    svp = sv.toPandas().sort_values("color")
    assert svp.n_nodes.tolist() == [1, 3, 1]
    assert se.toPandas().n_edges.sum() == 7


def test_supernode_labels(g, spark):
    gf = DeepGraphFrame(spark.createDataFrame(V5), index_col="id")
    gf.supernode_labels_by("color_label", "color")
    got = gf.v.toPandas().sort_values("id")
    # dense labels in sorted-key order: b=0, g=1, r=2
    assert got.color_label.tolist() == [1, 1, 0, 1, 2]


def test_superedge_labels(spark):
    """Edge-side twin (ref deepgraph.py:137-146): dense labels over edge
    relation groups, sorted-key order — 2-relation fixture."""
    e = spark.createDataFrame(
        pd.DataFrame(
            {"s": [0, 0, 1, 2], "t": [1, 2, 2, 3], "rel": ["x", "y", "x", "x"]}
        )
    )
    gf = DeepGraphFrame(spark.createDataFrame(V5), e, index_col="id")
    gf.superedge_labels_by("rel_label", "rel")
    got = gf.e.toPandas().sort_values(["s", "t"])
    assert got.rel_label.tolist() == [0, 1, 0, 0]  # x=0, y=1


def test_filters_cascade(g, spark):
    gf = DeepGraphFrame(spark.createDataFrame(V5), index_col="id")
    gf.create_edges_ft(("time", 5), [some_relations])
    gf.filter_by_values_v("color", ["g"])  # keeps 0,1,3
    ids = sorted(gf.v.toPandas().id.tolist())
    assert ids == [0, 1, 3]
    e = gf.e.toPandas()
    assert set(e.s) | set(e.t) <= {0, 1, 3}
    assert len(e) == 3  # (0,1),(0,3),(1,3)


def test_filter_intervals(g, spark):
    gf = DeepGraphFrame(spark.createDataFrame(V5), index_col="id")
    gf.filter_by_interval_v("x", (-2, 2.2))
    assert sorted(gf.v.toPandas().id.tolist()) == [1, 2, 3]
    gf2 = DeepGraphFrame(spark.createDataFrame(V5), index_col="id")
    gf2.create_edges_ft(("time", 5), [some_relations])
    gf2.filter_by_interval_e("dx", (0, 10))
    assert (gf2.e.toPandas().dx >= 0).all()


def test_append_cp(spark):
    """Reference semantics (test_DeepGraph.py:407-433): components on a
    2-edge subgraph of v5 — sizes (3,1,1); consolidate_singles=True →
    labels [1,1,1,0,0]."""
    e2 = spark.createDataFrame(pd.DataFrame({"s": [0, 0], "t": [1, 2]}))

    gf = DeepGraphFrame(spark.createDataFrame(V5), e2, index_col="id")
    gf.append_cp(consolidate_singles=True)
    assert gf.v.toPandas().sort_values("id").cp.tolist() == [1, 1, 1, 0, 0]

    gf2 = DeepGraphFrame(spark.createDataFrame(V5), e2, index_col="id")
    gf2.append_cp()
    assert gf2.v.toPandas().sort_values("id").cp.tolist() == [0, 0, 0, 1, 2]


def test_binning(spark):
    v = spark.createDataFrame(pd.DataFrame({"id": range(6), "val": [0.0, 1, 2, 3, 4, 5]}))
    gf = DeepGraphFrame(v, index_col="id")
    edges = gf.append_binning_labels_v("val", "bin", bins=6, return_bin_edges=True)
    got = gf.v.toPandas().sort_values("id").bin.tolist()
    # np.digitize parity (reference semantics: bins = #edges, labels 1..bins)
    np.testing.assert_allclose(edges, np.linspace(0, 5, 6))
    exp = np.digitize([0, 1, 2, 3, 4, 5], edges)
    assert got == exp.tolist() == [1, 2, 3, 4, 5, 6]


def test_binning_reference_example(spark):
    """The reference's own docstring example (deepgraph.py:2377-2440):
    v.time = [1, 2, 12, 105, 899] under linear, log-per-magnitude, and
    floored-log binning — labels and bin edges must match exactly."""
    v = spark.createDataFrame(pd.DataFrame({"id": range(5), "time": [1, 2, 12, 105, 899]}))
    gf = DeepGraphFrame(v, index_col="id")

    edges = gf.append_binning_labels_v("time", "time_l", return_bin_edges=True)
    assert gf.v.toPandas().sort_values("id").time_l.tolist() == [1, 1, 1, 2, 10]
    np.testing.assert_allclose(edges[:2], [1.0, 100.77777778])
    assert edges[-1] == 899.0 and len(edges) == 10

    gf = DeepGraphFrame(v, index_col="id")
    edges = gf.append_binning_labels_v(
        "time", "time_l", bins=5, log_bins=True, return_bin_edges=True
    )
    assert gf.v.toPandas().sort_values("id").time_l.tolist() == [1, 2, 6, 10, 15]
    assert len(edges) == 15

    gf = DeepGraphFrame(v, index_col="id")
    edges = gf.append_binning_labels_v(
        "time", "time_l", bins=5, log_bins=True, floor=True, return_bin_edges=True
    )
    assert gf.v.toPandas().sort_values("id").time_l.tolist() == [1, 2, 5, 9, 14]
    np.testing.assert_allclose(
        edges, [1, 2, 4, 6, 11, 18, 29, 48, 79, 128, 209, 340, 553, 899]
    )


def test_binning_sequence_edges(spark):
    v = spark.createDataFrame(pd.DataFrame({"id": range(5), "val": [1.0, 3.0, 5.5, 9.0, 20.0]}))
    gf = DeepGraphFrame(v, index_col="id")
    seq = [0.0, 2.0, 6.0, 20.0]
    gf.append_binning_labels_v("val", "bin", bins=seq)
    got = gf.v.toPandas().sort_values("id").bin.tolist()
    assert got == np.digitize([1.0, 3.0, 5.5, 9.0, 20.0], seq).tolist()


def test_datetime_categories(spark):
    ts = pd.to_datetime(
        ["2024-01-15 03:00", "2024-04-01 09:30", "2024-07-08 13:59", "2024-10-30 23:10"]
    )
    v = spark.createDataFrame(pd.DataFrame({"id": range(4), "dt": ts}))
    gf = DeepGraphFrame(v, index_col="id")
    gf.append_datetime_categories_v("dt")
    got = gf.v.toPandas().sort_values("id")
    assert got.tod.tolist() == [0, 1, 2, 3]
    assert got.season.tolist() == [0, 1, 2, 3]  # DJF MAM JJA SON


def test_partition_return_handles(g, spark):
    """return_gv / return_ge live GroupedData handles (ref deepgraph.py:1086,
    1224): follow-up aggregations run against the same grouping."""
    from pyspark.sql import functions as F

    gf = DeepGraphFrame(spark.createDataFrame(V5), index_col="id")
    sv, gv = gf.partition_nodes("color", return_gv=True)
    follow = gv.agg(F.max("time").alias("mx")).toPandas().sort_values("color")
    assert follow.mx.tolist() == [
        spark.createDataFrame(V5).where(F.col("color") == c).agg(F.max("time")).collect()[0][0]
        for c in follow.color.tolist()
    ]
    gf.create_edges_ft(("time", 5), [some_relations])
    se, ge = gf.partition_edges(relations=["same_color"], return_ge=True)
    assert ge.agg(F.count(F.lit(1)).alias("n")).toPandas().n.sum() == se.toPandas().n_edges.sum()
