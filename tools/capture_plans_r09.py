"""Capture .explain('formatted') for round-9-touched queries into plans/r09/.

Usage: python tools/capture_plans_r09.py <outdir> <suffix> [target ...]
Run once from the round-start worktree with suffix=before and once from the
optimized tree with suffix=after.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark():
    from deepgraph_spark.session import get_spark

    s = get_spark(app_name="plan-capture", master="local[8]")
    s.sparkContext.setLogLevel("ERROR")
    return s


def _explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def cap_cc_events(spark):
    from pyspark.sql import functions as F

    from deepgraph_spark.algorithms import connected_components
    from deepgraph_spark.entry_queries import event_edges

    e = event_edges(spark, SF_DIR).persist()
    e.count()
    verts = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        F.col("event_id").alias("id")
    )
    return _explain_str(connected_components(e, vertices=verts, label_by_size=False))


def cap_curation_pipeline(spark):
    # snapshot every localCheckpointed intermediate BEFORE truncation plus
    # the final plan — shows both the composed shape and where the round-9
    # lazy cuts sit
    from pyspark.sql.classic.dataframe import DataFrame
    from pyspark.sql import functions as F

    from deepgraph_spark.pipeline import curation_pipeline

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    captured = []
    orig = DataFrame.localCheckpoint

    def spy(self, eager=True):
        try:
            captured.append(_explain_str(self))
        except Exception:
            pass
        return orig(self, eager=eager)

    DataFrame.localCheckpoint = spy
    try:
        out = curation_pipeline(
            docs.where(F.col("doc_id") % 17 != 0),
            docs.where(F.col("doc_id") % 17 == 0),
            min_alpha_ratio=0.815,
            neardup_threshold=0.5,
            split_seed=42,
            shard_budget=2000,
        )
        final = _explain_str(out)
    finally:
        DataFrame.localCheckpoint = orig
    parts = captured + [final]
    return "\n\n===== next checkpointed intermediate / final =====\n\n".join(parts)


def cap_minhash_dedup(spark):
    from deepgraph_spark.pipeline import minhash_lsh_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return _explain_str(minhash_lsh_dedup(docs, threshold=0.5))


def cap_ngram_jaccard(spark):
    from deepgraph_spark.entry_queries import q_ngram_jaccard_documents

    return _explain_str(q_ngram_jaccard_documents(spark, SF_DIR))


def cap_semantic_dedup(spark):
    from deepgraph_spark.pipeline import semantic_dedup

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return _explain_str(semantic_dedup(emb, threshold=0.4, centroid_mod=25))


def cap_edges_ft_events(spark):
    from deepgraph_spark.entry_queries import event_edges

    return _explain_str(event_edges(spark, SF_DIR))


def cap_ref_ft_100k(spark):
    from deepgraph_spark.workloads import balls_ft, make_balls

    vb = make_balls(spark, 100_000, seed=2)
    return _explain_str(balls_ft(vb, 1000))


def cap_ref_pairwise_corr(spark):
    from deepgraph_spark.workloads import make_features, pairwise_correlations

    vf = make_features(spark, 5000, 100)
    return _explain_str(pairwise_correlations(vf, num_blocks=32))


def cap_decontaminate(spark):
    from pyspark.sql import functions as F

    from deepgraph_spark.pipeline import decontaminate

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return _explain_str(
        decontaminate(
            docs.where(F.col("doc_id") % 17 != 0),
            docs.where(F.col("doc_id") % 17 == 0),
            k=8,
        )
    )


def cap_line_dedup(spark):
    from deepgraph_spark.entry_queries import q_line_dedup_documents

    return _explain_str(q_line_dedup_documents(spark, SF_DIR))


def cap_strip_dup_spans(spark):
    from deepgraph_spark.pipeline import strip_duplicate_spans

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return _explain_str(strip_duplicate_spans(docs, window=8))


def cap_ktruss(spark):
    from deepgraph_spark.algorithms import k_truss
    from deepgraph_spark.entry_queries import event_edges

    e = event_edges(spark, SF_DIR).select("s", "t").persist()
    e.count()
    return _explain_str(k_truss(e, 4)[0])


def cap_pagerank_join_superstep(spark):
    """The join-mode per-superstep plan, snapshotted at the moment the loop
    localCheckpoints each state (i.e. BEFORE lineage truncation hides it):
    runs pagerank exactly as shipped and records every checkpointed state's
    physical plan — whichever loop structure the installed tree has is what
    gets captured, so the file is honest per tree."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.classic.dataframe import DataFrame

    from deepgraph_spark.algorithms import pagerank

    rng = np.random.default_rng(5)
    edges = np.unique(rng.integers(0, 2000, size=(8000, 2)), axis=0)
    edges = edges[edges[:, 0] != edges[:, 1]]
    e = spark.createDataFrame(pd.DataFrame({"s": edges[:, 0], "t": edges[:, 1]}))
    v = spark.createDataFrame(pd.DataFrame({"id": np.arange(2000)}))
    captured = []
    orig = DataFrame.localCheckpoint

    def spy(self, eager=True):
        try:
            captured.append(_explain_str(self))
        except Exception:
            pass
        return orig(self, eager=eager)

    DataFrame.localCheckpoint = spy
    try:
        pagerank(e, vertices=v, tol=0.0, max_iter=4, mode="join")
    finally:
        DataFrame.localCheckpoint = orig
    # a steady-state action's checkpointed plans (skip the first action's,
    # whose inputs are the un-truncated static state)
    tail = captured[-2:] if len(captured) >= 2 else captured
    return (
        "\n\n===== checkpointed state plan(s) of one steady-state action =====\n\n".join(
            tail
        )
        or "(nothing captured)"
    )


CAPS = {k[4:]: v for k, v in list(globals().items()) if k.startswith("cap_")}

if __name__ == "__main__":
    outdir, suffix = sys.argv[1], sys.argv[2]
    targets = sys.argv[3:] or list(CAPS)
    os.makedirs(outdir, exist_ok=True)
    spark = _spark()
    for t in targets:
        try:
            txt = CAPS[t](spark)
        except Exception as exc:  # capture failures visibly, don't abort the batch
            txt = f"(capture failed: {exc})"
        with open(os.path.join(outdir, f"{t}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print("captured", t, suffix)
