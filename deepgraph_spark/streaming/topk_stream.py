"""Streaming per-key top-k items (heavy hitters) via applyInPandasWithState.

Streaming aggregations cannot sort-and-limit within a key (no ORDER BY /
LIMIT in update-mode aggregates), so "the k most frequent event types per
user, continuously" is the canonical case for Spark's arbitrary-stateful
escape hatch — unlike sessionization (native ``session_window``, see
streaming/sessions.py) this one genuinely needs ``applyInPandasWithState``.

State per key: the item→count map (JSON, one string column — robust across
state-store encodings) plus the total rows seen. Each micro-batch merges
its counts into the state and emits that key's CURRENT top-k with a
deterministic tie-break (count desc, item asc) and the running ``n_seen``;
the final emission per key (max ``n_seen``) therefore carries the exact
global counts — that is what the driver gate value-checks against the batch
GROUP BY + ROW_NUMBER oracle.

Scale note: state is one small dict per key (bounded by the per-key
distinct-item count). For adversarial cardinalities pass ``max_items`` to
cap the dict with Space-Saving semantics (evict-min on overflow —
approximate counts, guaranteed-superset top-k for skewed streams); the
default keeps exact counts, which is what a bounded replay verifies.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

STATE_SCHEMA = "cnts string, n_seen long"
OUT_SCHEMA = "key long, item string, cnt long, rank long, n_seen long"


def _make_updater(item_col: str, k: int, max_items: int | None):
    def update(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            cnts_json, n_seen = state.get
            cnts = json.loads(cnts_json)
        else:
            cnts, n_seen = {}, 0
        for pdf in pdfs:
            n_seen += len(pdf)
            for item, c in pdf[item_col].value_counts().items():
                it = str(item)
                if max_items is not None and it not in cnts and len(cnts) >= max_items:
                    # Space-Saving eviction: new item inherits min count + c
                    evict = min(cnts, key=lambda x: (cnts[x], x))
                    base = cnts.pop(evict)
                    cnts[it] = base + int(c)
                else:
                    cnts[it] = cnts.get(it, 0) + int(c)
        state.update((json.dumps(cnts, sort_keys=True), n_seen))
        top = sorted(cnts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(top),
                "item": [t for t, _ in top],
                "cnt": [c for _, c in top],
                "rank": list(range(1, len(top) + 1)),
                "n_seen": [n_seen] * len(top),
            }
        )

    return update


def stream_topk(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    item_col: str = "event_type",
    k: int = 3,
    max_items: int | None = None,
) -> DataFrame:
    """Continuous top-``k`` ``item_col`` values per ``key_col`` (long key,
    string item). Emits, per micro-batch and per active key, the current
    ranking ``(key, item, cnt, rank, n_seen)``; rank ties break on item
    asc so the output is deterministic.

    Null items are dropped BEFORE the stateful stage (JVM-side filter), and
    ``n_seen`` counts only non-null rows — previously ``value_counts()``
    silently dropped nulls from the ranking while ``n_seen`` still counted
    them, so engine and a GROUP BY oracle (which keeps a NULL group)
    disagreed on null-bearing data; the filtered semantics are explicit and
    mirror-able (oracle adds ``WHERE item IS NOT NULL``)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.where(stream[item_col].isNotNull())
        .select(stream[key_col].cast("long").alias("key"), stream[item_col].alias(item_col))
        .groupBy("key")
        .applyInPandasWithState(
            _make_updater(item_col, k, max_items),
            OUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def topk_replay(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    item_col: str = "event_type",
    k: int = 3,
    work_dir: str | None = None,
    timeout_sec: int = 300,
) -> DataFrame:
    """Bounded replay (file source → availableNow → memory sink) returning
    the FINAL ranking per key: only each key's last emission (max
    ``n_seen``) survives, which carries the exact global counts."""
    import os
    import tempfile
    import uuid

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = df.sparkSession
    work = work_dir or tempfile.mkdtemp(prefix="dg_topk_replay_")
    run = uuid.uuid4().hex[:8]
    src = os.path.join(work, "src_" + run)
    ck = os.path.join(work, "ck_" + run)

    base = df.select(key_col, item_col)
    base.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(base.schema).parquet(src)
    out_name = "dg_topk_" + run
    q = (
        stream_topk(stream, key_col=key_col, item_col=item_col, k=k)
        .writeStream.format("memory")
        .queryName(out_name)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .outputMode("update")
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(f"availableNow replay did not finish in {timeout_sec}s")
    sink = spark.table(out_name)
    # keep each key's final emission; key-partitioned window (never a
    # self-join on the sink — one lineage, conflicting-reference trap)
    mx = F.max("n_seen").over(Window.partitionBy("key"))
    return (
        sink.withColumn("__mx", mx)
        .where(F.col("n_seen") == F.col("__mx"))
        .select("key", "item", "cnt", "rank")
    )
