"""End-to-end transcript link-graph pipeline (FIXTURES.md F1; BASELINE.json
north_star): deterministic transcripts → band-join edge table with
time-delta / role-transition / shared-tool connectors → supernode rollup →
all four kernels."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from deepgraph_spark.core import DeepGraphFrame
from deepgraph_spark.datagen import generate_transcripts
from deepgraph_spark.edges import create_edges_ft
from deepgraph_spark.transcripts import (
    build_turn_graph,
    dt_s,
    role_pair,
    shared_tool,
    turn_vertices,
)


@pytest.fixture(scope="module")
def tiny(spark):
    return generate_transcripts(spark, n_turns=300, seed=42).cache()


def test_determinism(spark, tiny):
    a = tiny.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = (
        generate_transcripts(spark, n_turns=300, seed=42)
        .repartition(7)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 300
    # per-turn text equality invariant: text is a pure fn of (conv_id, turn_idx)
    assert a.text.str.contains("conv-").all()
    # strictly increasing ts within conversation
    g = a.groupby("conv_id")["ts"]
    assert (g.apply(lambda s: s.is_monotonic_increasing)).all()


def test_turn_graph_edges(spark, tiny):
    v = turn_vertices(tiny)
    assert v.count() == 300
    g = build_turn_graph(tiny, tau_seconds=120)
    e = g.e.toPandas()
    assert len(e) > 0
    assert (e.dt_s >= 0).all() and (e.dt_s <= 120).all()
    assert set(e.columns) >= {"s", "t", "ft_r", "dt_s", "role_pair", "shared_tool"}
    # oracle: pandas per-conversation band join
    tp = tiny.toPandas()
    vp = v.toPandas().set_index(["conv_id", "turn_idx"])["id"]
    exp_pairs = set()
    for conv, grp in tp.groupby("conv_id"):
        grp = grp.sort_values("turn_idx").reset_index(drop=True)
        ts = grp.ts.values.astype("datetime64[us]").astype(np.int64) / 1e6
        for i in range(len(grp)):
            for j in range(i + 1, len(grp)):
                if ts[j] - ts[i] <= 120:
                    exp_pairs.add(
                        (vp[(conv, grp.turn_idx[i])], vp[(conv, grp.turn_idx[j])])
                    )
    got_pairs = set(map(tuple, e[["s", "t"]].values))
    assert got_pairs == exp_pairs


def test_full_pipeline_kernels(spark, tiny, tmp_path):
    g = build_turn_graph(tiny, tau_seconds=180)
    from deepgraph_spark.algorithms import (
        connected_components,
        pagerank,
        triangle_count,
    )
    from deepgraph_spark.algorithms.pagerank import pagerank_numpy_oracle

    e_pd = g.e.select("s", "t").toPandas()
    ids = g.v.select("id").toPandas()["id"].values
    id_map = {x: i for i, x in enumerate(np.sort(ids))}
    dense = np.array([[id_map[a], id_map[b]] for a, b in e_pd.values])
    n = len(ids)

    ranks, hist = pagerank(
        g.e, vertices=g.v.select("id"), tol=1e-6, checkpoint_dir=str(tmp_path)
    )
    rp = ranks.toPandas()
    rp["pos"] = rp["id"].map(id_map)
    rp = rp.sort_values("pos")
    oracle = pagerank_numpy_oracle(dense, n) if len(dense) else np.full(n, 1 / n)
    assert np.allclose(rp["rank"].values, oracle, atol=1e-6)

    from oracles import cc_oracle

    cp = connected_components(g.e, vertices=g.v.select("id"), label_by_size=False).toPandas()
    cp["pos"] = cp["id"].map(id_map)
    cp = cp.sort_values("pos")
    exp_cc_dense = cc_oracle(dense, n)
    # map dense min back to id-space min for comparison
    inv = {i: x for x, i in id_map.items()}
    exp_ids = np.array([inv[c] for c in exp_cc_dense])
    assert (cp["cp"].values == exp_ids).all()

    assert triangle_count(g.e) >= 0


def test_supergraph_rollup(spark, tiny):
    """role→role supergraph (the flagship query: SURVEY.md §7.1 step 2)."""
    g = build_turn_graph(tiny, tau_seconds=180)
    sv, se = g.partition_graph("role", relation_funcs={"dt_s": "mean"})
    svp = sv.toPandas()
    assert svp.n_nodes.sum() == 300
    sep = se.toPandas()
    assert sep.n_edges.sum() == g.e.count()
    assert set(sep.columns) == {"role_s", "role_t", "n_edges", "dt_s"}
