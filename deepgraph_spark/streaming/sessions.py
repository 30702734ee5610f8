"""Streaming sessionization via the built-in session_window aggregation —
the declarative stateful operator (state bounded by watermark + gap; no
custom applyInPandasWithState needed because Spark's merging session windows
express the semantics natively — UDFs stay the escape hatch, not the path).

Batch/stream parity contract: an event extends its session while the gap to
the previous event is strictly less than ``gap_seconds`` (session_window
merge semantics); `sessionize_batch` is the batch twin used by tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stream_sessionize(
    stream: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming (key, session_start, session_end, n_events); append-mode
    sink — a session emits once the watermark passes its close."""
    s = stream.withWatermark(ts_col, watermark)
    return (
        s.groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), f"{gap_seconds} seconds"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def sessionize_batch(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Batch twin with identical strict-gap semantics (new session when the
    gap is >= gap_seconds), for incremental==batch parity checks."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(
        F.lag(F.col(ts_col).cast("timestamp")).over(w)
    )
    is_new = F.when(gap.isNull() | (gap >= gap_seconds * 1_000_000), 1).otherwise(0)
    sess = df.withColumn("_sess", F.sum(is_new).over(w))
    return sess.groupBy(key_col, "_sess").agg(
        F.min(ts_col).alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
    )
