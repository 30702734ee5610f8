"""Edge-construction golden tests.

Port of the reference's test strategy (tests/test_CreateEdges.py:18-208):
the 8-node fixture and its hand-checkable full 28-edge table, hierarchical
selection, transfer features, dtype forcing, and — the key property — result
invariance under partitioning/parallelism (the Spark analog of the
reference's step_size/min_chunk_size/max_pairs sweeps).
"""

import numpy as np
import pandas as pd
import pytest

from deepgraph_spark.edges import create_edges, create_edges_ft, triu_indices_range


# ---------------------------------------------------------------------------
# fixture (FIXTURES.md F2 — same values as the reference's 8-node table)
# ---------------------------------------------------------------------------

V8 = pd.DataFrame(
    {
        "id": np.arange(8, dtype=np.int64),
        "si": np.array([0, 1, 2, 3, 4, 5, 6, 7], dtype=np.int64),
        "i": np.array([5, 4, 9, 6, 7, 8, 2, 4], dtype=np.int64),
        "sf": np.array([-3, -2.5, -2, -1.5, -1, -0.5, 0, 0.5]),
        "f": np.array([0.38, 0.84, 0.98, 0.67, 0.97, 0.61, 0.37, 0.82]),
        "s": list("ggbgrrgb"),
        "c": np.array([1, 3, 2, 3, 1, 3, 2, 3], dtype=np.int64),
        "mcs": np.array([0, 3, 6, 7, 7, 8, 12, 12], dtype=np.int64),
        "o": [[1, 2, 3], [2, 2, 2], [3, 1, 2], [1, 2, 3], [3, 3, 2], [1, 2, 3], [3, 1, 1], [1, 1, 1]],
    }
)
V8["sdt"] = pd.Timestamp("1998-01-01") + pd.to_timedelta(V8.si, unit="h")
V8["dtmcs"] = pd.Timestamp("1998-01-01") + pd.to_timedelta(V8.mcs, unit="h")


def full_golden():
    """The 28-edge upper-triangle golden table: dsi, dsf, velo == 2.0."""
    s, t = np.triu_indices(8, k=1)
    return pd.DataFrame(
        {
            "s": s.astype(np.int64),
            "t": t.astype(np.int64),
            "dsi": (t - s).astype(np.int64),
            "dsf": np.round((t - s) * 0.5, 10),
            "velo": np.full(len(s), 2.0),
        }
    )


# connectors / selectors with the reference's signatures
def dsi(si_s, si_t):
    dsi = si_t - si_s
    return dsi


def dsf(sf_s, sf_t):
    dsf = sf_t - sf_s
    return dsf


def velo(dsi, dsf):
    velo = dsi / dsf
    return velo


def dsi_t(dsi, sources, targets):
    sources = sources[dsi <= 3]
    targets = targets[dsi <= 3]
    return sources, targets


def dsf_t(dsf, sources, targets):
    sources = sources[dsf <= 1]
    targets = targets[dsf <= 1]
    return sources, targets


@pytest.fixture(scope="module")
def v8(spark):
    return spark.createDataFrame(V8).cache()


def _collect(e):
    pdf = e.toPandas().sort_values(["s", "t"]).reset_index(drop=True)
    return pdf


# ---------------------------------------------------------------------------


def test_triu_kernel_vs_numpy():
    rng = np.random.default_rng(3)
    for n in [2, 5, 17, 100, 953]:
        total = n * (n - 1) // 2
        s, t = triu_indices_range(n, 0, total)
        es, et = np.triu_indices(n, k=1)
        assert (s == es).all() and (t == et).all()
        lo = int(rng.integers(0, total))
        hi = int(rng.integers(lo, total + 1))
        s2, t2 = triu_indices_range(n, lo, hi)
        assert (s2 == es[lo:hi]).all() and (t2 == et[lo:hi]).all()


def test_full_table(spark, v8):
    e = create_edges(v8, [dsi, dsf, velo], index_col="id")
    got = _collect(e)
    exp = full_golden()
    pd.testing.assert_frame_equal(
        got[["s", "t", "dsi", "velo"]], exp[["s", "t", "dsi", "velo"]]
    )
    assert np.allclose(got.dsf, exp.dsf)


def test_hierarchical_selection(spark, v8):
    e = create_edges(v8, [dsi, dsf, velo], [dsi_t, dsf_t], index_col="id")
    got = _collect(e)
    exp = full_golden()
    exp = exp[(exp.dsi <= 3) & (exp.dsf <= 1)].reset_index(drop=True)
    assert got[["s", "t"]].values.tolist() == exp[["s", "t"]].values.tolist()
    assert np.allclose(got.velo, 2.0)


def test_selector_computing_relation(spark, v8):
    # selector that both filters and emits a relation (ref :254-308)
    def sel_with_r(si_s, si_t, sources, targets):
        dsi2 = si_t - si_s
        keep = dsi2 <= 2
        dsi2 = dsi2 * 10
        sources = sources[keep]
        targets = targets[keep]
        return sources, targets, dsi2

    e = create_edges(v8, [dsf], [sel_with_r], index_col="id")
    got = _collect(e)
    exp = full_golden()
    exp = exp[exp.dsi <= 2].reset_index(drop=True)
    assert got[["s", "t"]].values.tolist() == exp[["s", "t"]].values.tolist()
    assert (got.dsi2 == exp.dsi * 10).all()


def test_transfer_features_and_arrays(spark, v8):
    e = create_edges(v8, [dsi], [dsi_t], index_col="id", transfer_features=["s", "o"])
    got = _collect(e)
    assert list(got.columns) == ["s", "t", "dsi", "s_s", "s_t", "o_s", "o_t"]
    svals = V8["s"].values
    ovals = V8["o"].tolist()
    for _, row in got.iterrows():
        assert row["s_s"] == svals[int(row["s"])]
        assert row["s_t"] == svals[int(row["t"])]
        assert list(row["o_s"]) == ovals[int(row["s"])]
        assert list(row["o_t"]) == ovals[int(row["t"])]


def test_r_dtype_and_no_transfer(spark, v8):
    e = create_edges(
        v8,
        [dsi, dsf, velo],
        index_col="id",
        r_dtype_dic={"dsi": np.float32, "velo": np.float32},
        no_transfer_rs=["dsf"],
    )
    got = _collect(e)
    assert "dsf" not in got.columns
    assert got.dsi.dtype == np.float32
    assert got.velo.dtype == np.float32


def veloft(ft_r, dsf):
    veloft = ft_r / dsf
    return veloft


def test_ft_equals_allpairs_band(spark, v8):
    """create_edges_ft(si, ftt) == all-pairs filtered to the band."""
    for ftt in [1, 3, 7, 100]:
        eft = _collect(create_edges_ft(v8, ("si", ftt), [dsf, veloft], index_col="id"))
        exp = full_golden()
        exp = exp[exp.dsi <= ftt].reset_index(drop=True)
        assert eft[["s", "t"]].values.tolist() == exp[["s", "t"]].values.tolist(), ftt
        assert (eft.ft_r == exp.dsi).all()
        assert np.allclose(eft.veloft, 2.0)


def test_ft_duplicates_and_gaps(spark, v8):
    """mcs has duplicate values and gaps (ref golden dmcs at :583)."""
    eft = _collect(create_edges_ft(v8, ("mcs", 3), index_col="id"))
    mcs = V8.mcs.values
    exp_pairs = [
        (s, t)
        for s in range(8)
        for t in range(s + 1, 8)
        if 0 <= mcs[t] - mcs[s] <= 3
    ]
    assert [tuple(x) for x in eft[["s", "t"]].values] == exp_pairs
    assert (eft.ft_r.values == [mcs[t] - mcs[s] for s, t in exp_pairs]).all()


def test_ft_datetime_unit(spark, v8):
    eft = _collect(create_edges_ft(v8, ("sdt", 3, "h"), index_col="id"))
    exp = full_golden()
    exp = exp[exp.dsi <= 3].reset_index(drop=True)
    assert eft[["s", "t"]].values.tolist() == exp[["s", "t"]].values.tolist()
    assert (eft.ft_r == exp.dsi).all()  # in hours


def test_parallelism_invariance(spark, v8):
    """The reference's chunking-invariance sweeps (test_CreateEdges.py:167-208)
    become: identical results under any num_blocks / step_size / partitioning."""
    base = _collect(create_edges(v8, [dsi, dsf, velo], [dsi_t], index_col="id"))
    for num_blocks in [1, 2, 3, 7]:
        for step_size in [1, 5, 28, 1000]:
            got = _collect(
                create_edges(
                    v8, [dsi, dsf, velo], [dsi_t],
                    index_col="id", num_blocks=num_blocks, step_size=step_size,
                )
            )
            pd.testing.assert_frame_equal(got, base)
    # repartitioned input
    for parts in [1, 3, 8]:
        got = _collect(
            create_edges(v8.repartition(parts), [dsi, dsf, velo], [dsi_t], index_col="id")
        )
        pd.testing.assert_frame_equal(got, base)


def test_ft_partition_invariance(spark, v8):
    base = _collect(create_edges_ft(v8, ("si", 3), [dsf, veloft], index_col="id"))
    for parts in [1, 2, 8]:
        got = _collect(
            create_edges_ft(v8.repartition(parts), ("si", 3), [dsf, veloft], index_col="id")
        )
        pd.testing.assert_frame_equal(got, base)
    for batch_rows in [1, 3, 1000]:
        got = _collect(
            create_edges_ft(v8, ("si", 3), [dsf, veloft], index_col="id", batch_rows=batch_rows)
        )
        pd.testing.assert_frame_equal(got, base)


def test_grouped_pairs_scoped(spark):
    pdf = pd.concat(
        [V8.assign(grp="a"), V8.assign(grp="b", id=V8.id + 100)], ignore_index=True
    )
    vdf = spark.createDataFrame(pdf)
    e = create_edges(vdf, [dsi], index_col="id", group_by="grp", keep_keys=True)
    got = e.toPandas()
    assert len(got) == 56
    # no cross-group pairs
    assert ((got.s < 100) == (got.t < 100)).all()


def test_grouped_blocked_equals_grouped(spark):
    """Skew path: hash-block decomposition WITHIN groups must produce the
    same edges as the one-task-per-group path."""
    pdf = pd.concat(
        [V8.assign(grp="a"), V8.assign(grp="b", id=V8.id + 100)], ignore_index=True
    )
    vdf = spark.createDataFrame(pdf)
    base = (
        create_edges(vdf, [dsi], [dsi_t], index_col="id", group_by="grp", keep_keys=True)
        .toPandas()
        .sort_values(["s", "t"])
        .reset_index(drop=True)
    )
    for nb in [2, 3, 5]:
        got = (
            create_edges(
                vdf, [dsi], [dsi_t], index_col="id", group_by="grp",
                keep_keys=True, num_blocks=nb,
            )
            .toPandas()
            .sort_values(["s", "t"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, base)


def test_ft_keep_keys_mixed_batches(spark):
    """keep_keys must be correct even when one Arrow batch spans groups."""
    pdf = pd.concat(
        [V8.assign(grp="a"), V8.assign(grp="b", id=V8.id + 100)], ignore_index=True
    )
    vdf = spark.createDataFrame(pdf).repartition(1)
    e = create_edges_ft(
        vdf, ("si", 3), index_col="id", group_by="grp", keep_keys=True
    ).toPandas()
    assert set(e.grp) == {"a", "b"}
    assert ((e.s < 100) == (e.grp == "a")).all()
    assert ((e.t < 100) == (e.grp == "a")).all()


def test_ft_selector_placement(spark, v8):
    """'ft_selector' placed explicitly in the selector list runs in that
    position (ref test_CreateEdges.py:572-579): a cheap selector first can
    shrink pairs before the band predicate."""
    def keep_small_t(si_t, sources, targets):
        keep = si_t <= 5
        sources = sources[keep]
        targets = targets[keep]
        return sources, targets

    e1 = _collect(
        create_edges_ft(v8, ("si", 3), [dsf], [keep_small_t, "ft_selector"], index_col="id")
    )
    e2 = _collect(create_edges_ft(v8, ("si", 3), [dsf], [keep_small_t], index_col="id"))
    # same final pair set regardless of order (both predicates are applied)
    pd.testing.assert_frame_equal(e1, e2)
    exp = full_golden()
    exp = exp[(exp.dsi <= 3) & (exp.t <= 5)].reset_index(drop=True)
    assert e1[["s", "t"]].values.tolist() == exp[["s", "t"]].values.tolist()


def test_log_binning(spark):
    from deepgraph_spark.core import DeepGraphFrame

    pdf = pd.DataFrame({"id": range(5), "val": [1.0, 10.0, 100.0, 1000.0, 10000.0]})
    g = DeepGraphFrame(spark.createDataFrame(pdf), index_col="id")
    edges = g.append_binning_labels_v("val", "bin", bins=5, log_bins=True, return_bin_edges=True)
    got = g.v.toPandas().sort_values("id").bin.tolist()
    # reference log-bins-per-magnitude: ceil(4 magnitudes * 5) = 20 edges
    np.testing.assert_allclose(edges, np.logspace(0, 4, 20))
    assert got == np.digitize(pdf["val"].values, edges).tolist()


def test_duplicate_outputs_rejected(spark, v8):
    def c1(si_s, si_t):
        x = si_t - si_s
        return x

    def c2(sf_s, sf_t):
        x = sf_t - sf_s
        return x

    with pytest.raises(AssertionError, match="duplicate output"):
        create_edges(v8, [c1, c2], index_col="id")


def test_missing_relation_rejected(spark, v8):
    def needs_unknown(nope, sources, targets):
        sources = sources[nope > 0]
        targets = targets[nope > 0]
        return sources, targets

    with pytest.raises(Exception, match="nope"):
        create_edges(v8, [dsi], [needs_unknown], index_col="id").count()
