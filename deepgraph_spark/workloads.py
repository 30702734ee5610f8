"""Reference benchmark workloads, re-expressed through the engine's
operators — for direct comparison against the numbers in BASELINE.md:

1. all-pairs velocity construction, 1,168 nodes = 681,528 pairs with a
   distance connector + selector (ref 10min_to_deepgraph tutorial: 557 ms
   ≈ 1.22M pairs/s single-process), and its fast-track variant (167 ms);
2. pairwise Pearson correlations, 5,000 whitened features × n_samples
   = 12,497,500 pairs (ref pairwise_correlations tutorial: 14.19 s
   ≈ 0.88M pairs/s) — the whitening trick makes each correlation one dot
   product (ref pairwise_correlations.py:22,37-38,58-62 semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from deepgraph_spark.edges import create_edges, create_edges_ft


# -- 1. flying-balls velocity workload ---------------------------------------

def make_balls(spark: SparkSession, n: int = 1168, seed: int = 0) -> DataFrame:
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "time": np.sort(rng.integers(0, n * 10, size=n)).astype(np.int64),
            "x": rng.standard_normal(n) * 100,
            "y": rng.standard_normal(n) * 100,
        }
    )
    return spark.createDataFrame(pdf)


def d_euclidean(x_s, x_t, y_s, y_t):
    d = np.sqrt((x_t - x_s) ** 2 + (y_t - y_s) ** 2)
    return d


def dt_rel(time_s, time_t):
    dt_rel = time_t - time_s
    return dt_rel


def velocity(d, dt_rel):
    velocity = d / np.where(dt_rel == 0, 1, dt_rel)
    return velocity


def v_selector(velocity, sources, targets):
    keep = velocity <= 50.0
    sources = sources[keep]
    targets = targets[keep]
    return sources, targets


def balls_allpairs(v: DataFrame, num_blocks: int | None = None) -> DataFrame:
    return create_edges(
        v, [d_euclidean, dt_rel, velocity], [v_selector], index_col="id", num_blocks=num_blocks
    )


def balls_ft(v: DataFrame, ftt: int = 1000) -> DataFrame:
    return create_edges_ft(
        v, ("time", ftt), [d_euclidean, velocity_ft], index_col="id"
    )


def velocity_ft(d, ft_r):
    velocity_ft = d / np.where(ft_r == 0, 1, ft_r)
    return velocity_ft


# -- 2. pairwise-correlation workload ----------------------------------------

def make_features(
    spark: SparkSession, n_features: int = 5000, n_samples: int = 100, seed: int = 0
) -> DataFrame:
    """Whitened feature matrix as an array column: corr(i,j) = dot(fi, fj)."""
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n_features, n_samples))
    m = (m - m.mean(axis=1, keepdims=True)) / m.std(axis=1, keepdims=True)
    m /= np.sqrt(n_samples)  # whitening: correlation == plain dot product
    pdf = pd.DataFrame({"id": np.arange(n_features, dtype=np.int64), "f": list(m)})
    return spark.createDataFrame(pdf)


def corr(f_s, f_t):
    # f_s/f_t arrive as 2D matrices (the engine densifies fixed-width array
    # columns once per batch) — asarray is a no-op, einsum is one pass
    a = np.asarray(f_s) if len(f_s) else np.empty((0, 1))
    b = np.asarray(f_t) if len(f_t) else np.empty((0, 1))
    if a.dtype == object:
        a, b = np.stack(a), np.stack(b)
    corr = np.einsum("ij,ij->i", a, b)
    return corr


def pairwise_correlations(v: DataFrame, num_blocks: int | None = None) -> DataFrame:
    return create_edges(v, [corr], index_col="id", num_blocks=num_blocks)
