"""Strong-components kernel vs the iterative-Tarjan oracle (mirrors the
reference's append_cp test shape, tests/test_DeepGraph.py:407-433, for the
directed/strong case it delegates to scipy.csgraph).

Fixture graphs are embedded as disjoint id-offset copies in ONE edge set and
solved in a single kernel run: SCC of a disjoint union is the union of the
SCCs, and co-resident components stress the simultaneous per-class
extraction the distributed algorithm relies on."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from deepgraph_spark.algorithms import strongly_connected_components
from oracles import random_digraph, scc_oracle

# worst cases for labeling SCC: monotone chain (all singleton SCCs, naive
# coloring degenerates), reversed chain, one big cycle, bridged 2-cycles,
# self loops + isolated vertex, figure-8 (two cycles sharing a vertex),
# SCC-chain (condensation is a path)
FIXED = [
    ([(i, i + 1) for i in range(12)], 13),
    ([(i + 1, i) for i in range(12)], 13),
    ([(i, (i + 1) % 10) for i in range(10)], 10),
    ([(0, 1), (1, 0), (1, 2), (2, 3), (3, 4), (4, 3)], 6),
    ([(0, 0), (1, 1)], 3),
    ([(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2)], 5),
    ([(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (3, 4), (4, 5), (5, 4)], 6),
]


def _disjoint_union(graphs):
    """Pack (edges, n) graphs at offsets 0, 100, 200, ... of one id space."""
    edges, total, want = [], 0, []
    for gi, (ge, gn) in enumerate(graphs):
        off = gi * 100
        edges += [(a + off, b + off) for a, b in ge]
        lab = scc_oracle(ge, gn) + off
        want.append((off, lab))
        total = off + gn
    return edges, total, want


def _run_raw(spark, edges, n):
    e = spark.createDataFrame([(int(a), int(b)) for a, b in edges], "s long, t long")
    v = spark.range(n).withColumnRenamed("id", "v")
    out = strongly_connected_components(
        e, vertices=v, index_col="v", label_by_size=False
    )
    return out.toPandas().set_index("v")["cp"].sort_index()


def test_scc_fixed_graphs_disjoint_union(spark):
    edges, n, want = _disjoint_union(FIXED)
    got = _run_raw(spark, edges, n)
    for off, lab in want:
        np.testing.assert_array_equal(
            got.loc[off : off + len(lab) - 1].to_numpy(), lab, err_msg=f"offset {off}"
        )
    # offset gaps are isolated vertices: singleton SCCs labeled by own id
    gaps = sorted(set(range(n)) - {off + i for off, lab in want for i in range(len(lab))})
    np.testing.assert_array_equal(got.loc[gaps].to_numpy(), gaps)


def test_scc_random_digraphs_disjoint_union(spark):
    graphs = [
        (random_digraph(40, 60, seed=0), 40),
        (random_digraph(40, 120, seed=1), 40),
        (random_digraph(60, 90, seed=2), 60),
        (random_digraph(25, 200, seed=3), 25),
    ]
    edges, n, want = _disjoint_union(graphs)
    got = _run_raw(spark, edges, n)
    for off, lab in want:
        np.testing.assert_array_equal(
            got.loc[off : off + len(lab) - 1].to_numpy(), lab, err_msg=f"offset {off}"
        )


def test_scc_label_by_size_and_consolidate(spark):
    # components: {0,1,2} (cycle), {3,4} (2-cycle), singles {5}, {6}
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3)]
    e = spark.createDataFrame(edges, "s long, t long")
    v = spark.range(7).withColumnRenamed("id", "v")
    by_size = (
        strongly_connected_components(e, vertices=v, index_col="v")
        .toPandas().sort_values("v")["cp"].tolist()
    )
    assert by_size == [0, 0, 0, 1, 1, 2, 3]
    consolidated = (
        strongly_connected_components(
            e, vertices=v, index_col="v", consolidate_singles=True
        )
        .toPandas().sort_values("v")["cp"].tolist()
    )
    assert consolidated == [1, 1, 1, 2, 2, 0, 0]


def test_scc_vs_weak_cc_on_symmetric_graph(spark):
    """On a symmetric edge set SCC must equal undirected CC — and
    append_cp(directed=True, connection='strong'|'weak') must route to the
    matching kernel."""
    from deepgraph_spark.algorithms import connected_components
    from deepgraph_spark.core import DeepGraphFrame

    und = random_digraph(30, 40, seed=7)
    sym = np.vstack([und, und[:, ::-1]])
    e = spark.createDataFrame([(int(a), int(b)) for a, b in sym], "s long, t long")
    v = spark.range(30).withColumnRenamed("id", "v")
    strong = (
        strongly_connected_components(e, vertices=v, index_col="v", label_by_size=False)
        .toPandas().sort_values("v")["cp"].to_numpy()
    )
    weak = (
        connected_components(e, vertices=v, index_col="v", label_by_size=False)
        .toPandas().sort_values("v")["cp"].to_numpy()
    )
    np.testing.assert_array_equal(strong, weak)

    g = DeepGraphFrame(v, e, index_col="v")
    g.append_cp(directed=True, connection="strong", label_by_size=False)
    routed = g.v.toPandas().sort_values("v")["cp"].to_numpy()
    np.testing.assert_array_equal(routed, strong)
    with pytest.raises(ValueError, match="weak"):
        DeepGraphFrame(v, e, index_col="v").append_cp(connection="bogus")


def test_scc_accelerated_equals_plain(spark):
    """Pointer-jump + parquet-barrier label propagation (auto-enabled in
    local mode) must give identical labels to plain relaxation."""
    e = random_digraph(35, 70, seed=11)
    edf = spark.createDataFrame([(int(a), int(b)) for a, b in e], "s long, t long")
    v = spark.range(35).withColumnRenamed("id", "v")
    fast = (
        strongly_connected_components(
            edf, vertices=v, index_col="v", label_by_size=False, accelerate=True
        ).toPandas().sort_values("v")["cp"].to_numpy()
    )
    plain = (
        strongly_connected_components(
            edf, vertices=v, index_col="v", label_by_size=False, accelerate=False
        ).toPandas().sort_values("v")["cp"].to_numpy()
    )
    np.testing.assert_array_equal(fast, plain)
    np.testing.assert_array_equal(fast, scc_oracle(e, 35))


def test_scc_long_chain_accelerated(spark):
    """A 150-hop chain converges fast under the jump path (plain relaxation
    would need 150+ supersteps; the cap below would fail without jumps)."""
    edges = [(i, i + 1) for i in range(150)]
    e = spark.createDataFrame(edges, "s long, t long")
    v = spark.range(151).withColumnRenamed("id", "v")
    out = strongly_connected_components(
        e, vertices=v, index_col="v", label_by_size=False,
        accelerate=True, max_label_iter=40,
    )
    got = out.toPandas().sort_values("v")["cp"].to_numpy()
    np.testing.assert_array_equal(got, np.arange(151))


def test_scc_checkpoint_resume(spark, tmp_path):
    edges = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2)]
    e = spark.createDataFrame(edges, "s long, t long")
    kw = dict(vertices=spark.range(4).withColumnRenamed("id", "v"), index_col="v",
              label_by_size=False, checkpoint_dir=str(tmp_path), job_id="scc_t")
    first = (
        strongly_connected_components(e, **kw)
        .toPandas().sort_values("v")["cp"].tolist()
    )
    # resume from the committed state: must reproduce identical labels
    second = (
        strongly_connected_components(e, **kw)
        .toPandas().sort_values("v")["cp"].tolist()
    )
    assert first == second == [0, 0, 2, 2]


def _partition(df_pd, idc="v"):
    return sorted(
        df_pd.groupby("cp")[idc].apply(lambda s: tuple(sorted(s))).tolist()
    )


@pytest.mark.parametrize(
    "trim_iter,tail",
    [(4, 50_000), (4, 0), (0, 0)],
    ids=["trim+serial", "trim+labels", "labels-only"],
)
def test_scc_trim_chain_and_star(spark, trim_iter, tail):
    """The Multistep trim fixture from the round-4 verdict: a chain (every
    vertex in/out-degree <= 1, all singletons — peels from both ends), a
    star (hub + leaves, all singletons — leaves peel, then the hub), and a
    cycle with a tail (trim must NOT eat the cycle). All three engine
    configurations must agree with the oracle labels."""
    chain = [(i, i + 1) for i in range(10)]
    star = [(100, 100 + i) for i in range(1, 15)]
    cyc = [(200, 201), (201, 202), (202, 200), (202, 203), (203, 204)]
    edges = chain + star + cyc
    e = spark.createDataFrame(edges, "s long, t long")
    ids = sorted({x for p in edges for x in p})
    v = spark.createDataFrame([(i,) for i in ids], "v long")
    out = strongly_connected_components(
        e, vertices=v, index_col="v", label_by_size=False,
        trim_iter=trim_iter, serial_tail_threshold=tail,
    ).toPandas()
    got = out.set_index("v")["cp"].sort_index()
    # every vertex is a singleton except the 3-cycle {200,201,202} -> 200
    for i in ids:
        assert got[i] == (200 if i in (200, 201, 202) else i)


def test_scc_serial_tail_covers_edge_stripped_vertices(spark):
    """A vertex that survives trim (in+out degree > 0) but loses every edge
    to peeled singletons must still be labeled — including when vertices
    are derived from the edge list (vertices=None)."""
    # 11 survives trim round 0 (10->11->12) but 10 and 12 peel, stripping it
    edges = [(1, 2), (2, 1), (10, 11), (11, 12)]
    e = spark.createDataFrame(edges, "s long, t long")
    out = strongly_connected_components(e, label_by_size=False).toPandas()
    got = out.set_index(out.columns[0])["cp"].sort_index()
    assert set(got.index) == {1, 2, 10, 11, 12}
    assert got[1] == got[2] == 1
    assert got[10] == 10 and got[11] == 11 and got[12] == 12


def test_scc_serial_tail_dense_fallback(spark):
    """When the small remainder is denser than the 20-edges/vertex collect
    cap, the serial cutover must decline and the distributed label loop
    must finish the job: complete digraph on 25 vertices (600 edges) with
    serial_tail_threshold=25 -> cap 500 < 600."""
    n = 25
    edges = [(i, j) for i in range(n) for j in range(n) if i != j]
    e = spark.createDataFrame(edges, "s long, t long")
    v = spark.range(n).withColumnRenamed("id", "v")
    out = strongly_connected_components(
        e, vertices=v, index_col="v", label_by_size=False,
        serial_tail_threshold=n,
    ).toPandas()
    # one giant SCC labeled by its min member
    assert set(out["cp"]) == {0} and len(out) == n


def test_tarjan_min_labels_matches_oracle():
    """Driver-side serial-tail Tarjan vs the independent test oracle on
    random digraphs (pure Python, no Spark session needed)."""
    from deepgraph_spark.algorithms.scc import _tarjan_min_labels

    for seed, n, m in [(0, 30, 60), (1, 50, 200), (2, 15, 100)]:
        edges = [(int(a), int(b)) for a, b in random_digraph(n, m, seed=seed)]
        got = _tarjan_min_labels(edges)
        want = scc_oracle(edges, n)
        nodes = {x for p in edges for x in p}
        for v in nodes:
            assert got[v] == want[v], f"seed {seed} vertex {v}"
