"""Transcript link-graph domain layer (BASELINE.json north_star).

Vertices are turn nodes ``(conv_id, turn_idx)``; edges come from the
band join ``0 <= ts_t - ts_s <= tau`` scoped per conversation, carrying the
connector-computed relations the north_star names: time deltas (``dt_s``),
role transitions (``role_pair``), shared-tool links (``shared_tool``).
Conversation / tool supernodes are ``partition_graph`` rollups over these
features (SURVEY.md §2.5).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepgraph_spark.core import DeepGraphFrame
from deepgraph_spark.edges import create_edges_ft


# -- connectors (vectorized; arg-name contract per connectors.py) -----------

def dt_s(ft_r):
    """Time delta in seconds — the band relation itself."""
    dt_s = ft_r
    return dt_s


def role_pair(role_s, role_t):
    """Role-transition label, e.g. 'user>assistant'."""
    role_pair = (pd.Series(role_s).astype(str) + ">" + pd.Series(role_t).astype(str)).values
    return role_pair


def shared_tool(tool_s, tool_t):
    """True iff both turns used the same non-null tool."""
    a = pd.Series(tool_s)
    b = pd.Series(tool_t)
    shared_tool = (a.notna() & b.notna() & (a == b)).values
    return shared_tool


# -- vertex ids ---------------------------------------------------------------

def turn_vertices(transcripts: DataFrame, index_col: str = "id") -> DataFrame:
    """Unique long id per turn: ``conv_rank * stride + turn_idx``.

    Conversation ranks come from :func:`with_dense_index` (range-partitioned
    sort + partition-offset arithmetic — fully distributed, no global window),
    so the scheme survives 10^12 turns even though the conversation dimension
    is itself ~10^10 rows at that scale; the rank join back onto the turn
    table is left to AQE (broadcast when the conv table is genuinely small,
    shuffle join otherwise). Within a conversation, id order == turn order ==
    ts order.
    """
    from deepgraph_spark.core import with_dense_index

    convs = transcripts.select("conv_id").distinct()
    conv_rank = with_dense_index(convs, "conv_id", "_cr")
    stride_row = transcripts.agg(F.max("turn_idx").alias("mx")).collect()[0]
    stride = int(stride_row["mx"]) + 1
    return (
        transcripts.join(conv_rank, "conv_id")
        .withColumn(index_col, (F.col("_cr").cast("long") * stride + F.col("turn_idx")))
        .drop("_cr")
    )


def build_turn_graph(
    transcripts: DataFrame,
    tau_seconds: float = 120.0,
    extra_connectors=None,
    extra_selectors=None,
) -> DeepGraphFrame:
    """transcripts → DeepGraphFrame with the flagship edge table."""
    v = turn_vertices(transcripts)
    g = DeepGraphFrame(v, index_col="id")
    connectors = [dt_s, role_pair, shared_tool] + list(extra_connectors or [])
    g.e = create_edges_ft(
        v,
        ("ts", tau_seconds, "s"),
        connectors,
        extra_selectors,
        index_col="id",
        group_by="conv_id",
        transfer_features=["role", "tool"],
    )
    return g


def conversation_supergraph(g: DeepGraphFrame) -> tuple[DataFrame, DataFrame]:
    """Conversation supernodes: rollup by the conversation id embedded in the
    vertex id (id // stride); with grouped construction every edge is
    intra-conversation, so the superedge table is the per-conv edge census."""
    sv = g.v.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_nodes"))
    se = (
        g.e.join(g.v.select(F.col("id").alias("s"), F.col("conv_id")), "s")
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n_edges"), F.avg("dt_s").alias("dt_s_mean"))
    )
    return sv, se
