"""Spark-native Column implementations of the reference's built-in
connector library (connector_selector_implementations.py) — for use in
declarative plans where no pandas stage is needed; the pandas-vectorized
twins for PairPlan pipelines live in connectors.py.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def great_circle_dist_col(lat_s: Column, lon_s: Column, lat_t: Column, lon_t: Column) -> Column:
    """Spherical law of cosines distance in km — pure Catalyst
    (ref connector_selector_implementations.py:37-67)."""
    lat1, lat2 = F.radians(lat_s), F.radians(lat_t)
    dlon = F.radians(lon_t - lon_s)
    cos_d = F.sin(lat1) * F.sin(lat2) + F.cos(lat1) * F.cos(lat2) * F.cos(dlon)
    return F.acos(F.least(F.greatest(cos_d, F.lit(-1.0)), F.lit(1.0))) * F.lit(6371.0)


def node_intersection_col(ids_s: Column, ids_t: Column) -> tuple[Column, Column]:
    """(intersection array, cardinality) over ArrayType columns — native
    ``array_intersect``/``size`` replaces the reference's per-pair Python
    loop (connector_selector_implementations.py:70-84)."""
    intsec = F.array_intersect(ids_s, ids_t)
    return intsec, F.size(intsec)


def intersection_strength_col(ids_s: Column, ids_t: Column) -> Column:
    """|A∩B| / min(|A|,|B|) (ref :87-98)."""
    return F.size(F.array_intersect(ids_s, ids_t)).cast("double") / F.least(
        F.size(ids_s), F.size(ids_t)
    )


def cosine_col(a: Column, b: Column) -> Column:
    """Cosine similarity between array<numeric> columns, computed as
    dot/(sqrt(ssa)*sqrt(ssb)) — whole-stage-codegen friendly."""
    av = F.transform(a, lambda x: x.cast("double"))
    bv = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(av, bv, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    sa = F.aggregate(av, F.lit(0.0), lambda s, x: s + x * x)
    sb = F.aggregate(bv, F.lit(0.0), lambda s, x: s + x * x)
    return dot / (F.sqrt(sa) * F.sqrt(sb))


# ---------------------------------------------------------------------------
# scipy-free hypergeometric survival function (the reference wraps
# scipy.stats.hypergeom.sf, connector_selector_implementations.py:101-121;
# this environment has no scipy, so the tail sum is computed from log
# binomial coefficients via lgamma — exact to double precision)
# ---------------------------------------------------------------------------

_lgamma = np.vectorize(math.lgamma, otypes=[np.float64])


def _log_binom(n, k):
    n = np.asarray(n, dtype=np.float64)
    k = np.asarray(k, dtype=np.float64)
    return _lgamma(n + 1) - _lgamma(k + 1) - _lgamma(n - k + 1)


def hypergeom_sf(k, M, n, N):
    """P[X > k] for X ~ Hypergeometric(M population, n successes, N draws).

    Vectorized over k/n/N (scalars broadcast)."""
    k = np.atleast_1d(np.asarray(k, dtype=np.int64))
    n = np.broadcast_to(np.asarray(n, dtype=np.int64), k.shape)
    N = np.broadcast_to(np.asarray(N, dtype=np.int64), k.shape)
    out = np.zeros(k.shape, dtype=np.float64)
    denom = _log_binom(M, N)
    for i in range(len(k)):
        lo = max(k[i] + 1, 0)
        hi = min(n[i], N[i])
        if lo > hi:
            out[i] = 0.0
            continue
        xs = np.arange(lo, hi + 1)
        logs = _log_binom(n[i], xs) + _log_binom(M - n[i], N[i] - xs) - denom
        m = logs.max()
        out[i] = float(np.exp(m) * np.exp(logs - m).sum())
    return out


def hypergeometric_p_value(n_unique_nodes, intsec_card, supernode_ids_s, supernode_ids_t):
    """PairPlan connector: p-value that two supernodes share >= intsec_card
    members by chance (ref connector_selector_implementations.py:101-121).
    ``n_unique_nodes`` enters as a relation constant or transferred column."""
    card_s = np.array([len(a) for a in supernode_ids_s])
    card_t = np.array([len(b) for b in supernode_ids_t])
    M = int(np.asarray(n_unique_nodes).ravel()[0])
    hg_p = hypergeom_sf(np.asarray(intsec_card) - 1, M, card_s, card_t)
    return hg_p
