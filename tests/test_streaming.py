"""Streaming band-join: incremental (file-source, availableNow) result must
equal the batch band join on the same data."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from deepgraph_spark.datagen import generate_transcripts
from deepgraph_spark.streaming import stream_band_edges
from deepgraph_spark.transcripts import turn_vertices


def test_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    tr = turn_vertices(generate_transcripts(spark, n_turns=200, seed=42))
    # two incremental file drops to exercise multiple micro-batches
    a, b = tr.where(F.col("turn_idx") % 2 == 0), tr.where(F.col("turn_idx") % 2 == 1)
    a.write.mode("overwrite").parquet(src)
    b.write.mode("append").parquet(src)

    stream = spark.readStream.schema(tr.schema).parquet(src)
    edges = stream_band_edges(
        stream, ft_col="ts", tau_seconds=120, group_by="conv_id", index_col="id",
        feature_cols=["role"],
    )
    q = (
        edges.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)

    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values(["s", "t"])
        .reset_index(drop=True)
    )

    # batch reference: same band condition on the static table
    batch = stream_band_edges.__wrapped__ if hasattr(stream_band_edges, "__wrapped__") else None
    left = tr.select(*[F.col(c).alias(f"{c}_s") for c in ["conv_id", "id", "ts", "role"]])
    right = tr.select(*[F.col(c).alias(f"{c}_t") for c in ["conv_id", "id", "ts", "role"]])
    cond = (
        (F.col("conv_id_s") == F.col("conv_id_t"))
        & (F.col("ts_t") >= F.col("ts_s"))
        & (F.col("ts_t") <= F.col("ts_s") + F.expr("INTERVAL 120 SECONDS"))
        & ((F.col("ts_t") > F.col("ts_s")) | (F.col("id_t") > F.col("id_s")))
    )
    exp = (
        left.join(right, cond)
        .select(
            F.col("conv_id_s").alias("conv_id"),
            F.col("id_s").alias("s"),
            F.col("id_t").alias("t"),
            (
                (F.unix_micros(F.col("ts_t").cast("timestamp")) - F.unix_micros(F.col("ts_s").cast("timestamp"))) / 1e6
            ).alias("ft_r"),
            "role_s",
            "role_t",
        )
        .toPandas()
        .sort_values(["s", "t"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)


def test_stream_sessionize_equals_batch(spark, tmp_path):
    """Native session_window stateful aggregation: streamed sessions (append
    mode, availableNow) must equal the strict-gap batch twin. A far-future
    sentinel event pushes the watermark so every real session flushes."""
    from deepgraph_spark.streaming.sessions import sessionize_batch, stream_sessionize

    src = str(tmp_path / "sess_src")
    ck = str(tmp_path / "sess_ck")

    ev = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1, 1, 1, 2, 2, 9999],
                "ts": pd.to_datetime(
                    [
                        "2024-01-01 00:00:00",
                        "2024-01-01 00:10:00",  # same session (gap 10m)
                        "2024-01-01 01:00:00",  # new session (gap 50m)
                        "2024-01-01 01:05:00",
                        "2024-01-01 00:00:00",
                        "2024-01-01 02:00:00",  # user 2: two sessions
                        "2030-01-01 00:00:00",  # watermark sentinel
                    ]
                ),
            }
        )
    )
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        stream_sessionize(stream, gap_seconds=1800, watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)

    got = (
        spark.table("sessions_out")
        .where(F.col("user_id") != 9999)
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    exp = (
        sessionize_batch(ev.where(F.col("user_id") != 9999), gap_seconds=1800)
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    assert got.user_id.tolist() == exp.user_id.tolist()
    assert got.n_events.tolist() == exp.n_events.tolist()
    assert (got.session_start.values == exp.session_start.values).all()


def test_stream_exact_dedup_replay(spark, tmp_path):
    """Planted duplicates must collapse to one admitted hash each, and the
    admitted set must equal the batch distinct set."""
    from deepgraph_spark.streaming import exact_dedup_replay

    rows = [(i, f"text number {i % 7}") for i in range(40)]  # 7 distinct
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = exact_dedup_replay(df, work_dir=str(tmp_path)).toPandas()
    assert len(got) == 7
    assert got.h.nunique() == 7


def test_sessionize_replay_exact_gap_boundary(spark, tmp_path):
    """sessionize_replay end-to-end + the boundary convention the SQL oracle
    assumes (established empirically here): an event at EXACTLY
    prev + gap_seconds still MERGES into the session; only a strictly
    greater gap opens a new one. The batch twin and the DuckDB oracle both
    encode `gap > gap_seconds` as the new-session condition to match."""
    from deepgraph_spark.streaming.sessions import sessionize_batch, sessionize_replay

    ev = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1, 1, 2, 2],
                "ts": pd.to_datetime(
                    [
                        "2024-01-01 00:00:00",
                        "2024-01-01 00:30:00",  # gap == 1800s -> still merges
                        "2024-01-01 01:00:01",  # gap 1801s -> NEW session
                        "2024-01-01 00:00:00",
                        "2024-01-01 00:29:59",  # gap 1799s -> merges
                    ]
                ),
            }
        )
    )
    got = (
        sessionize_replay(ev, gap_seconds=1800, work_dir=str(tmp_path))
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    per_user = got.groupby("user_id").size()
    assert per_user[1] == 2, f"gap>1800s must open a new session: {got}"
    assert per_user[2] == 1
    assert got.n_events.tolist() == [2, 1, 2]
    # session_end = last event + gap (the oracle's MAX(ts) + gap contract)
    u2 = got[got.user_id == 2].iloc[0]
    assert (u2.session_end - u2.session_start) == pd.Timedelta(seconds=1799 + 1800)
    # and the batch twin agrees row-for-row, including the exact-gap merge
    exp = (
        sessionize_batch(ev, gap_seconds=1800)
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    assert got.user_id.tolist() == exp.user_id.tolist()
    assert got.n_events.tolist() == exp.n_events.tolist()
    assert (got.session_start.values == exp.session_start.values).all()


def test_stream_topk_multibatch_state_accumulates(spark, tmp_path):
    """applyInPandasWithState top-k: force MULTIPLE micro-batches
    (maxFilesPerTrigger=1) and assert the final emission per key carries
    exact cross-batch global counts with the deterministic tie-break."""
    import pandas as pd
    from pyspark.sql import functions as F

    from deepgraph_spark.streaming import stream_topk

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    # batch 1: u1 has a:2 b:1 ; batch 2 flips the ranking: b gets 3 more
    b1 = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "x")], "user_id long, event_type string"
    )
    b2 = spark.createDataFrame(
        [(1, "b"), (1, "b"), (1, "b"), (1, "c"), (2, "x")],
        "user_id long, event_type string",
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(b1.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream_topk(stream, key_col="user_id", item_col="event_type", k=2)
        .writeStream.format("memory")
        .queryName("topk_test")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .outputMode("update")
        .start()
    )
    assert q.awaitTermination(120)
    sink = spark.table("topk_test").toPandas()
    # at least two emissions for key 1 (one per batch containing it)
    assert sink[sink["key"] == 1]["n_seen"].nunique() >= 2
    final = sink.loc[sink.groupby("key")["n_seen"].transform("max") == sink["n_seen"]]
    got = {
        (r["key"], r["rank"]): (r["item"], r["cnt"]) for _, r in final.iterrows()
    }
    # u1 global: b:4 a:2 c:1 -> top2 = b, a ; u2: x:2
    assert got[(1, 1)] == ("b", 4)
    assert got[(1, 2)] == ("a", 2)
    assert got[(2, 1)] == ("x", 2)


def test_stream_topk_null_items_filtered(spark, tmp_path):
    """Null items are dropped BEFORE the stateful stage and n_seen counts
    only non-null rows — previously value_counts() silently dropped nulls
    from the ranking while n_seen still counted them, so the engine and a
    GROUP BY oracle (which keeps a NULL group) disagreed on null-bearing
    data. The documented semantics: filtered, oracle adds IS NOT NULL."""
    from deepgraph_spark.streaming import stream_topk

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    b1 = spark.createDataFrame(
        [(1, "a"), (1, None), (1, "a"), (1, None), (1, "b"), (2, None)],
        "user_id long, event_type string",
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(b1.schema).parquet(src)
    q = (
        stream_topk(stream, key_col="user_id", item_col="event_type", k=3)
        .writeStream.format("memory")
        .queryName("topk_nulls")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .outputMode("update")
        .start()
    )
    assert q.awaitTermination(120)
    sink = spark.table("topk_nulls").toPandas()
    # key 2 had ONLY null items -> no state, no emission at all
    assert (sink["key"] == 2).sum() == 0
    u1 = sink[sink["key"] == 1]
    # n_seen counts the 3 non-null rows, not the 5 raw rows
    assert set(u1["n_seen"]) == {3}
    assert u1["item"].notna().all()
    got = {r["rank"]: (r["item"], r["cnt"]) for _, r in u1.iterrows()}
    assert got == {1: ("a", 2), 2: ("b", 1)}


def test_stream_incremental_dedup_replay_equals_batch(spark, tmp_path):
    """The foreachBatch index-matching stream must produce exactly the batch
    dedup_against_index result, independent of micro-batching (per-doc
    signatures + static index => batching-invariant)."""
    from deepgraph_spark.pipeline import dedup_against_index, minhash_signatures
    from deepgraph_spark.streaming import incremental_dedup_replay

    corpus = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta doc {i % 9}") for i in range(30)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (100 + i, f"alpha beta gamma delta epsilon zeta doc {i % 9}")
            for i in range(12)
        ],
        "doc_id long, text string",
    )
    idx = minhash_signatures(corpus)
    got = (
        incremental_dedup_replay(
            new, idx, threshold=0.5, batches=3, work_dir=str(tmp_path)
        )
        .toPandas()
        .sort_values(["new_id", "corpus_id"])
        .reset_index(drop=True)
    )
    want = (
        dedup_against_index(new, idx, threshold=0.5)
        .toPandas()
        .sort_values(["new_id", "corpus_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    assert (got.new_id.values == want.new_id.values).all()
    assert (got.corpus_id.values == want.corpus_id.values).all()
    assert (abs(got.est_jaccard.values - want.est_jaccard.values) < 1e-12).all()
