"""Deterministic synthetic transcript generator (FIXTURES.md F1, BASELINE.json input_hint).

Schema: ``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``. Conversation sizes follow a seeded Zipf-ish distribution so a
few huge "hub" conversations exercise the skew paths; ``ts`` is strictly
increasing within a conversation (the fast-track / band-join feature); ``text``
is a pure function of ``(conv_id, turn_idx)`` so the per-turn text-equality
invariant holds under any ordering or partitioning.

Generation is distributed: the driver only plans ``(conv_id, n_turns, start)``
per conversation; rows are expanded executor-side with native Spark SQL
functions (sequence + explode + deterministic hashing) — no driver-side
materialization, so the same generator scales from 8 turns to 10^9+ turns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLES = ["user", "assistant", "tool", "system"]
TOOLS = ["search", "exec", "browse", "read", "write", None]
_WORDS = [
    "plan", "query", "graph", "edge", "node", "rank", "merge", "scan",
    "join", "sort", "batch", "token", "tool", "call", "turn", "reply",
]

TRANSCRIPT_SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _plan_conversations(n_turns_target: int, seed: int) -> pd.DataFrame:
    """Driver-side plan: one row per conversation (tiny vs the row count)."""
    rng = np.random.default_rng(seed)
    sizes = []
    total = 0
    i = 0
    while total < n_turns_target:
        # Zipf-ish: mostly short conversations, occasional huge hubs.
        s = int(min(1 + rng.zipf(1.6), max(4, n_turns_target // 4)))
        sizes.append(s)
        total += s
        i += 1
    sizes[-1] -= total - n_turns_target  # exact total
    if sizes[-1] <= 0:
        sizes.pop()
    starts = rng.integers(0, 86400 * 30, size=len(sizes))  # within 30 days
    return pd.DataFrame(
        {
            "conv_id": [f"conv-{j:08d}" for j in range(len(sizes))],
            "n_turns": np.array(sizes, dtype="int64"),
            "start_s": starts.astype("int64"),
        }
    )


def _plan_conversations_distributed(
    spark: SparkSession, n_turns_target: int, seed: int, partitions: int
) -> DataFrame:
    """Fully executor-side conversation plan for huge scales: sizes are an
    inverse-power-law transform of per-conversation hash-uniforms (Zipf-ish,
    same skew shape as the driver-side planner), so nothing of O(#convs)
    ever materializes on the driver. Total turn count is approximate
    (documented; exact-count generation is a driver-side concern that stops
    mattering at 10^9+ turns)."""
    from pyspark.sql import functions as F

    mean_size = 3.2  # empirical mean of the clipped zipf(1.6) draw
    n_convs = max(1, int(n_turns_target / mean_size))
    ids = spark.range(0, n_convs, 1, partitions).select(
        F.concat(F.lit("conv-"), F.lpad(F.col("id").cast("string"), 8, "0")).alias("conv_id"),
        F.col("id").alias("cid"),
    )
    u = (F.abs(F.xxhash64("conv_id", F.lit(seed))) % 1_000_000) / 1_000_000.0 + 1e-9
    # inverse-transform power-law: P(S >= s) ~ s^(1-a), a = 1.6
    size = F.least(
        F.greatest(F.floor(F.pow(u, F.lit(-1.0 / 0.6))), F.lit(1)),
        F.lit(max(4, n_turns_target // 4)),
    )
    start = F.abs(F.xxhash64("conv_id", F.lit(seed + 1))) % (86400 * 30)
    return ids.select(
        "conv_id",
        size.cast("long").alias("n_turns"),
        start.cast("long").alias("start_s"),
    )


def generate_transcripts(
    spark: SparkSession,
    n_turns: int = 1000,
    seed: int = 42,
    partitions: int | None = None,
    distributed: bool | None = None,
) -> DataFrame:
    """Deterministic transcripts table with exactly ``n_turns`` rows (driver
    plan) or approximately (``distributed=True``, no O(#convs) driver state —
    the 10^12-turn path; auto-selected above 5M turns).

    All per-turn attributes are hash-derived from ``(conv_id, turn_idx)`` with
    native Column expressions — executor-side, vectorized, reproducible under
    any partitioning.
    """
    if distributed is None:
        distributed = n_turns > 5_000_000
    if distributed:
        pdf = _plan_conversations_distributed(spark, n_turns, seed, partitions or 64)
    else:
        plan = _plan_conversations(n_turns, seed)
        pdf = spark.createDataFrame(plan)
    if partitions:
        pdf = pdf.repartition(partitions, "conv_id")

    t = (
        pdf.withColumn("turn_idx", F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)))
        .withColumn("turn_idx", F.col("turn_idx").cast("int"))
        .withColumn("h", F.abs(F.xxhash64("conv_id", "turn_idx", F.lit(seed))))
    )
    role = F.array(*[F.lit(r) for r in ROLES])[(F.col("h") % 4).cast("int")]
    # ~1/3 of turns carry a tool; deterministic from the hash
    tool_arr = F.array(*[F.lit(x) for x in TOOLS if x is not None])
    tool = F.when((F.col("h") % 3) == 0, tool_arr[((F.col("h") / 7) % 5).cast("int")]).otherwise(F.lit(None).cast("string"))
    words = F.array(*[F.lit(w) for w in _WORDS])
    text = F.concat_ws(
        " ",
        words[(F.col("h") % 16).cast("int")],
        words[((F.col("h") / 16) % 16).cast("int")],
        words[((F.col("h") / 256) % 16).cast("int")],
        F.concat(F.lit("t"), F.col("turn_idx")),
        F.col("conv_id"),
    )
    # strictly increasing ts: cumulative deterministic gaps of 1..60 s
    gap = (F.col("h") % 60) + 1
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ts = F.timestamp_seconds(F.col("start_s") + F.sum(gap).over(w))

    return t.select(
        "conv_id",
        "turn_idx",
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


