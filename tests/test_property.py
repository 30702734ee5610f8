"""Property-based checks (hypothesis): the band join equals a brute-force
pandas oracle for arbitrary tables/thresholds, under arbitrary partitioning —
the reference's chunking-invariance idea generalized to random inputs."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from deepgraph_spark.edges import create_edges_ft


@st.composite
def node_tables(draw):
    n = draw(st.integers(min_value=2, max_value=24))
    vals = draw(
        st.lists(
            st.integers(min_value=0, max_value=30), min_size=n, max_size=n
        )
    )
    ftt = draw(st.integers(min_value=1, max_value=12))
    parts = draw(st.sampled_from([1, 3, 7]))
    return sorted(vals), ftt, parts


def brute_force_band(vals, ftt):
    """All (i, j) with i<j in (value, index) order and vals[j]-vals[i] <= ftt."""
    out = []
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            if vals[j] - vals[i] <= ftt:
                out.append((i, j, vals[j] - vals[i]))
    return out


@settings(max_examples=12, deadline=None)
@given(node_tables())
def test_band_join_matches_bruteforce(spark, case):
    vals, ftt, parts = case
    pdf = pd.DataFrame({"id": np.arange(len(vals), dtype=np.int64), "x": np.array(vals, dtype=np.int64)})
    vdf = spark.createDataFrame(pdf).repartition(parts)
    got = (
        create_edges_ft(vdf, ("x", ftt), index_col="id")
        .toPandas()
        .sort_values(["s", "t"])
        .reset_index(drop=True)
    )
    exp = brute_force_band(vals, ftt)
    assert [tuple(r) for r in got[["s", "t", "ft_r"]].values] == exp
