"""Small-motif counting beyond triangles (engine addition, SURVEY.md §2.6).

4-cycle (C4) counting via the diagonal identity: in a simple undirected
graph, every 4-cycle {u,v,w,x} is determined by its two diagonals (u,w) and
(v,x); a vertex pair with ``p`` common neighbors closes ``C(p,2)`` cycles
through itself as a diagonal, and each cycle has exactly two diagonals, so

    #C4 = (1/2) * sum_over_pairs C(p, 2) = sum_over_pairs p*(p-1) / 4.

The plan is two keyed joins + two aggregations, all JVM: wedge enumeration
(join the adjacency with itself on the middle vertex), then a count per
endpoint pair. Shuffle volume is the wedge count (sum of C(deg, 2) over
middle vertices) — the same hub sensitivity as any wedge-based scheme, so
``max_wedges`` guards the quadratic with one cheap degree-aggregation pass
(mirroring ``ngram_jaccard_pairs``'s ``max_block_rows`` contract): a single
10^6-degree hub alone contributes ~5*10^11 wedge rows, which must fail loud
with guidance, never silently melt a 100 TB job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _undirected_simple(edges: DataFrame, src: str, dst: str) -> DataFrame:
    a = edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    return (
        a.unionByName(a.select(F.col("t").alias("s"), F.col("s").alias("t")))
        .where(F.col("s") != F.col("t"))
        .distinct()
    )


def wedge_count(edges: DataFrame, *, src: str = "s", dst: str = "t") -> int:
    """Exact wedge count sum_m C(deg(m), 2) of the undirected simple graph —
    the row count (and shuffle volume) of the wedge-enumeration join, from
    one degree aggregation (cost O(|E|), no join)."""
    return _wedge_count_from_und(_undirected_simple(edges, src, dst))


def _wedge_count_from_und(und: DataFrame) -> int:
    """Wedge count from an already-built undirected simple edge set — lets
    ``common_neighbor_pairs`` share ONE union+distinct between the guard and
    the wedge join instead of shuffling the symmetrization twice."""
    row = (
        und.groupBy("s")
        .agg(F.count(F.lit(1)).alias("deg"))
        .agg(
            F.coalesce(
                F.sum(
                    (
                        F.col("deg").cast("decimal(38,0)")
                        * (F.col("deg") - F.lit(1))
                        / 2
                    ).cast("decimal(38,0)")
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("w")
        )
        .collect()[0]
    )
    return int(row["w"])


def common_neighbor_pairs(
    edges: DataFrame,
    *,
    src: str = "s",
    dst: str = "t",
    max_wedges: int | None = 1_000_000_000,
    max_middle_degree: int | None = None,
) -> DataFrame:
    """(a, b, p): ordered pairs a < b with their common-neighbor count p >= 1
    in the undirected simple graph. The building block for C4 counting and a
    useful similarity table in its own right (co-citation strength).

    The wedge join materializes sum_m C(deg(m), 2) rows — quadratic in hub
    degree. ``max_wedges`` (default 1e9) pre-counts that exactly with one
    cheap degree aggregation and fails loudly when exceeded instead of
    silently enumerating trillions of rows on a skewed graph.

    ``max_middle_degree`` is the actionable follow-up the guard's error
    message points at: wedges whose MIDDLE vertex has (undirected simple)
    degree above the cap are dropped before enumeration, bounding the join
    at sum_{deg(m) <= cap} C(deg(m), 2) <= |V| * C(cap, 2) rows regardless
    of skew. Explicit, documented approximation — ``p`` becomes the number
    of common neighbors of degree <= cap, a LOWER bound on the true count
    (never an overcount), exact whenever no vertex exceeds the cap. The
    wedge guard then counts only surviving wedges, so a cap makes a
    hub-heavy graph admissible without raising ``max_wedges``."""
    und = _undirected_simple(edges, src, dst)
    if max_wedges is not None or max_middle_degree is not None:
        # the guard's degree pass is an extra action over ``und`` — pin the
        # symmetrized edge set once (eager localCheckpoint: its storage is
        # released with the returned plan by the context cleaner, unlike a
        # persist() the caller would have to unpersist) so the union+distinct
        # shuffle runs ONCE for the guard, the degree cap, and the wedge join
        und = und.localCheckpoint(eager=True)
    if max_middle_degree is not None:
        # und holds both orientations, so groupBy(s) degrees ARE the
        # undirected degrees; middles sit in the "s" slot of both wedge arms
        ok = (
            und.groupBy("s")
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") <= max_middle_degree)
            .select("s")
        )
        mid = und.join(ok, "s", "left_semi").localCheckpoint(eager=True)
    else:
        mid = und
    if max_wedges is not None:
        w = _wedge_count_from_und(mid)
        if w > max_wedges:
            raise ValueError(
                f"common_neighbor_pairs: graph has {w} wedges > "
                f"max_wedges={max_wedges}; the wedge-enumeration join is "
                "quadratic in hub degree — cap hub middles with "
                "max_middle_degree= (documented undercount), or pass "
                "max_wedges=None to force the exact plan"
            )
    n1 = mid.select(F.col("s").alias("m"), F.col("t").alias("a"))
    n2 = mid.select(F.col("s").alias("m"), F.col("t").alias("b"))
    wedges = n1.join(n2, "m").where(F.col("a") < F.col("b"))
    return wedges.groupBy("a", "b").agg(F.count(F.lit(1)).alias("p"))


def four_cycle_count(
    edges: DataFrame,
    *,
    src: str = "s",
    dst: str = "t",
    max_wedges: int | None = 1_000_000_000,
    max_middle_degree: int | None = None,
) -> DataFrame:
    """One-row DataFrame ``(n_four_cycles,)`` — the number of (unordered,
    vertex-distinct) 4-cycles in the undirected simple graph. Sums in
    decimal(38,0): per-pair terms p*(p-1) reach ~1e12 on hub-heavy graphs
    and a long sum would wrap silently in non-ANSI mode (the DuckDB oracle
    sums in HUGEINT — keep both exact).

    With ``max_middle_degree`` the count is a LOWER bound: a cycle survives
    through a diagonal only if both of that diagonal's middles have degree
    <= cap, each cycle contributing half per surviving diagonal (0, 1/2, or
    1 cycles; the final floor division truncates a trailing half). Exact
    when no vertex exceeds the cap; never an overcount."""
    pairs = common_neighbor_pairs(
        edges, src=src, dst=dst, max_wedges=max_wedges,
        max_middle_degree=max_middle_degree,
    )
    # sum p*(p-1) is divisible by 4 (2 ordered diagonal choices x 2 diagonals)
    term = (F.col("p").cast("decimal(38,0)") * (F.col("p") - F.lit(1))).cast(
        "decimal(38,0)"
    )
    return pairs.agg(
        (F.coalesce(F.sum(term), F.lit(0).cast("decimal(38,0)")) / 4)
        .cast("long")
        .alias("n_four_cycles")
    )
