"""Streaming exact deduplication: admit only the first occurrence of each
distinct content hash as documents arrive (the ingest-side twin of
``pipeline.exact_dedup`` — dedup at the door instead of as a batch pass).

State is one 60-bit hash per distinct text, held by ``dropDuplicates``.
For a 24/7 deployment bound the state with
``dropDuplicatesWithinWatermark`` (dedup only within the rewind horizon);
the unbounded variant here is what a bounded backfill/replay runs, and what
the driver gate value-checks against the batch ``SELECT DISTINCT`` oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepgraph_spark.pipeline.dedup import hash60


def stream_exact_dedup(
    stream: DataFrame, *, text_col: str = "text", hash_col: str = "h"
) -> DataFrame:
    """Streaming distinct-content filter. Emits one row per distinct text
    hash (the hash only — WHICH duplicate arrives first is a race across
    partitions, so the deterministic, oracle-able output is the admitted
    hash set itself; join it back to the stream to gate a pipeline)."""
    return stream.select(hash60(F.col(text_col)).alias(hash_col)).dropDuplicates(
        [hash_col]
    )


def exact_dedup_replay(
    docs: DataFrame,
    *,
    text_col: str = "text",
    work_dir: str | None = None,
    timeout_sec: int = 300,
) -> DataFrame:
    """Bounded replay of the streaming dedup over a batch table (file source
    → availableNow → memory sink): returns the admitted hash set, which must
    equal the batch distinct set exactly."""
    import os
    import tempfile
    import uuid

    spark = docs.sparkSession
    work = work_dir or tempfile.mkdtemp(prefix="dg_dedup_replay_")
    run = uuid.uuid4().hex[:8]
    src = os.path.join(work, "src_" + run)
    ck = os.path.join(work, "ck_" + run)

    base = docs.select(text_col)
    base.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(base.schema).parquet(src)
    out_name = "dg_dedup_" + run
    q = (
        stream_exact_dedup(stream, text_col=text_col)
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
    return spark.table(out_name)
