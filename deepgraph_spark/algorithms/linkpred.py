"""Link-prediction feature scores over an undirected simple graph.

The classic neighborhood-overlap predictors (Liben-Nowell & Kleinberg 2003;
Zhou/Lü/Zhang 2009 for resource allocation) for every candidate vertex pair
with at least one common neighbor:

    common_neighbors     cn(a,b)  = |Γ(a) ∩ Γ(b)|
    jaccard              cn / (deg(a) + deg(b) - cn)
    adamic_adar          Σ_{m ∈ Γ(a)∩Γ(b)} 1 / ln(deg(m))
    resource_allocation  Σ_{m ∈ Γ(a)∩Γ(b)} 1 / deg(m)
    preferential_attach  deg(a) * deg(b)

Engine addition past the reference's pair-metric connectors (the reference
computes user-supplied pair features on *selected* pairs,
``connector_selector_implementations.py``; these are the standard *derived*
graph features a training pipeline attaches to a link table).

Plan shape — the same wedge family as triangle/C4 counting (`motifs.py`):
one symmetrize+distinct, one degree aggregation reused for (i) the
``max_wedges`` fail-loud guard, (ii) the optional ``max_middle_degree`` hub
cap, and (iii) the Adamic-Adar middle weight; then the single quadratic-
by-contract wedge self-join and one (a, b) aggregation. All JVM Column
expressions, no Python in the hot path. Shuffle volume = wedge count
Σ_m C(deg(m), 2) — guarded exactly like ``common_neighbor_pairs``, because
a single 10^6-degree hub is ~5·10^11 wedge rows at 100 TB.

Every middle vertex of a wedge has degree ≥ 2 by construction (it touches
both endpoints), so 1/ln(deg(m)) never divides by ln(1) = 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepgraph_spark.algorithms.motifs import (
    _undirected_simple,
    _wedge_count_from_und,
)


def link_prediction_scores(
    edges: DataFrame,
    *,
    src: str = "s",
    dst: str = "t",
    min_common: int = 1,
    predict_new: bool = True,
    max_wedges: int | None = 1_000_000_000,
    max_middle_degree: int | None = None,
) -> DataFrame:
    """(a, b, cn, jaccard, adamic_adar, resource_allocation, pref_attach)
    for unordered pairs a < b with cn >= ``min_common``.

    ``predict_new=True`` (default) anti-joins pairs that are already edges —
    link prediction scores candidate NEW links; pass False to score existing
    edges too (neighborhood-similarity mode, e.g. for edge weighting).

    ``max_wedges`` / ``max_middle_degree`` carry the exact
    ``common_neighbor_pairs`` contract: the wedge join is pre-counted with
    one cheap degree aggregation and fails loudly above the budget; capping
    hub middles bounds the join at |V|·C(cap, 2) rows with a documented
    one-sided undercount (cn counts only common neighbors of degree <= cap;
    deg(a)/deg(b) in jaccard and pref_attach stay TRUE degrees, so capped
    scores are lower bounds, never overcounts).
    """
    und = _undirected_simple(edges, src, dst)
    # one symmetrize+distinct shared by guard, degrees, cap, and wedge join
    # (eager localCheckpoint: storage released with the plan by the context
    # cleaner, no caller-side unpersist contract)
    und = und.localCheckpoint(eager=True)
    # und holds both orientations → groupBy(s) degrees ARE undirected degrees
    deg = und.groupBy(F.col("s").alias("v")).agg(F.count(F.lit(1)).alias("d"))
    if max_middle_degree is not None:
        ok = deg.where(F.col("d") <= max_middle_degree).select(F.col("v").alias("s"))
        mid = und.join(ok, "s", "left_semi").localCheckpoint(eager=True)
    else:
        mid = und
    if max_wedges is not None:
        w = _wedge_count_from_und(mid)
        if w > max_wedges:
            raise ValueError(
                f"link_prediction_scores: graph has {w} wedges > "
                f"max_wedges={max_wedges}; the wedge-enumeration join is "
                "quadratic in hub degree — cap hub middles with "
                "max_middle_degree= (documented undercount), or pass "
                "max_wedges=None to force the exact plan"
            )
    # middle degree rides the wedge once (broadcast-size only if deg is small;
    # Catalyst/AQE picks the strategy — both sides shuffle on m otherwise)
    n1 = (
        mid.join(deg.withColumnRenamed("v", "s"), "s")
        .select(F.col("s").alias("m"), F.col("t").alias("a"), F.col("d").alias("dm"))
    )
    n2 = mid.select(F.col("s").alias("m"), F.col("t").alias("b"))
    wedges = n1.join(n2, "m").where(F.col("a") < F.col("b"))
    sc = wedges.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("cn"),
        F.sum(F.lit(1.0) / F.log(F.col("dm"))).alias("adamic_adar"),
        F.sum(F.lit(1.0) / F.col("dm")).alias("resource_allocation"),
    )
    if min_common > 1:
        sc = sc.where(F.col("cn") >= min_common)
    if predict_new:
        sc = sc.join(
            und.select(F.col("s").alias("a"), F.col("t").alias("b")),
            ["a", "b"],
            "left_anti",
        )
    out = (
        sc.join(deg.select(F.col("v").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("db")), "b")
        .select(
            "a",
            "b",
            "cn",
            (F.col("cn") / (F.col("da") + F.col("db") - F.col("cn"))).alias("jaccard"),
            "adamic_adar",
            "resource_allocation",
            (F.col("da") * F.col("db")).alias("pref_attach"),
        )
    )
    return out
