"""Streaming sessionization via the built-in session_window aggregation —
the declarative stateful operator (state bounded by watermark + gap; no
custom applyInPandasWithState needed because Spark's merging session windows
express the semantics natively — UDFs stay the escape hatch, not the path).

Batch/stream parity contract: an event extends its session while the gap to
the previous event is at most ``gap_seconds`` — a gap of EXACTLY
``gap_seconds`` still merges; the session closes only when the gap is
strictly greater (verified empirically against ``session_window`` by
tests/test_streaming.py::test_sessionize_replay_exact_gap_boundary);
`sessionize_batch` is the batch twin used by tests.
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
    """Batch twin with identical gap semantics (new session only when the
    gap is STRICTLY greater than gap_seconds — an exact-gap event merges,
    matching ``session_window``), for incremental==batch parity checks."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(
        F.lag(F.col(ts_col).cast("timestamp")).over(w)
    )
    is_new = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    sess = df.withColumn("_sess", F.sum(is_new).over(w))
    return sess.groupBy(key_col, "_sess").agg(
        F.min(ts_col).alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
    )


def sessionize_replay(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_seconds: int = 1800,
    work_dir: str | None = None,
    timeout_sec: int = 300,
) -> DataFrame:
    """Bounded replay of the REAL streaming sessionizer over a batch table:
    write the events to a file source, run :func:`stream_sessionize` with an
    ``availableNow`` trigger (append mode, exactly the continuous-deployment
    query), and return the emitted sessions as a batch DataFrame.

    This is the batch-equivalence harness for the streaming surface — the
    returned sessions are what the 24/7 deployment would have emitted, so
    they can be value-checked against a SQL oracle. A far-future sentinel
    event (key ``max(key)+1``, filtered from the result) pushes the watermark
    past every real session so append mode flushes all state; requires a
    numeric ``key_col`` (the sentinel needs a fresh key).
    """
    import os
    import tempfile
    import uuid

    spark = events.sparkSession
    work = work_dir or tempfile.mkdtemp(prefix="dg_sess_replay_")
    src = os.path.join(work, "src")
    ck = os.path.join(work, "ck_" + uuid.uuid4().hex[:8])

    # watermarks require TIMESTAMP event time; an NTZ source column is
    # reinterpreted as UTC (sessions run with session tz UTC for oracle
    # parity, so this is a no-op relabeling, not a shift)
    if dict(events.dtypes)[ts_col] == "timestamp_ntz":
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))

    bounds = events.agg(
        F.max(ts_col).alias("mx"), F.max(key_col).alias("mk")
    ).collect()[0]
    sentinel_key = int(bounds["mk"]) + 1
    dtypes = dict(events.dtypes)
    sentinel = spark.createDataFrame(
        [(sentinel_key, bounds["mx"])], f"{key_col} long, {ts_col} timestamp_ntz"
    ).select(
        F.col(key_col).cast(dtypes[key_col]).alias(key_col),
        (F.col(ts_col) + F.expr(f"INTERVAL {10 * gap_seconds + 86400} SECONDS"))
        .cast(dtypes[ts_col])
        .alias(ts_col),
    )
    base = events.select(key_col, ts_col)
    base.unionByName(sentinel).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(base.schema).parquet(src)
    out_name = "dg_sessions_" + uuid.uuid4().hex[:8]
    q = (
        stream_sessionize(
            stream,
            ts_col=ts_col,
            key_col=key_col,
            gap_seconds=gap_seconds,
            watermark="0 seconds",
        )
        .writeStream.format("memory")
        .queryName(out_name)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        # timed out mid-replay: stop and fail loud rather than silently
        # returning a partial sink (round-3 advice)
        q.stop()
        raise TimeoutError(f"availableNow replay did not finish in {timeout_sec}s")
    return spark.table(out_name).where(F.col(key_col) != sentinel_key)
