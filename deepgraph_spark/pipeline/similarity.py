"""Approximate nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k as one blocked matrix multiply — query
block broadcast, corpus streamed through an Arrow stage doing a single numpy
GEMM per batch, then a global top-k window. Scale path: LSH (random
hyperplane) bucketing that prunes the corpus per query, with measured recall
vs the brute-force baseline in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ann_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame | None = None,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    exclude_self: bool = True,
    max_queries: int = 100_000,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rank).

    Ties broken by neighbor id (deterministic under any partitioning).
    ``queries`` defaults to the corpus itself (all-pairs top-k).

    The query block is collected to the driver and broadcast (that is the
    design: small Q × streamed corpus GEMM); ``max_queries`` makes misuse on
    an unbounded query side fail loudly instead of OOMing the driver — use
    :func:`ann_topk_lsh` for large-Q workloads.
    """
    spark = corpus.sparkSession
    if queries is None:
        queries = corpus
    n_q = queries.count()
    if n_q > max_queries:
        raise ValueError(
            f"ann_topk_bruteforce collects the query side to the driver; got "
            f"{n_q} queries > max_queries={max_queries}. Use ann_topk_lsh or "
            "raise max_queries explicitly."
        )
    qpd = queries.select(id_col, vec_col).toPandas()
    q_ids = qpd[id_col].values
    qm = np.array([np.asarray(x, dtype=np.float64) for x in qpd[vec_col].values])
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    bq = spark.sparkContext.broadcast((q_ids, qm))

    def score(it):
        ids_q, mq = bq.value
        for pdf in it:
            cm = np.array([np.asarray(x, dtype=np.float64) for x in pdf[vec_col].values])
            cm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
            sims = mq @ cm.T  # (Q, B)
            c_ids = pdf[id_col].values
            # emit per-batch top-k only: bounds shuffle volume to Q*k per batch
            kk = min(k + (1 if exclude_self else 0), sims.shape[1])
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = np.repeat(np.arange(sims.shape[0]), kk)
            cols = idx.ravel()
            yield pd.DataFrame(
                {
                    "query_id": ids_q[rows],
                    "neighbor_id": c_ids[cols],
                    "cosine": sims[rows, cols],
                }
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, "query_id long, neighbor_id long, cosine double"
    )
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cosine", 6)), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def ann_topk_lsh(
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """LSH-bucketed approximate top-k: random-hyperplane signatures over
    ``n_tables`` tables; candidates = bucket collisions; exact cosine re-rank
    within candidates. Recall measured in tests vs the brute-force baseline."""
    if dim is None:
        first = corpus.select(vec_col).first()
        dim = len(first[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    bp = corpus.sparkSession.sparkContext.broadcast(planes)

    def bucketize(it):
        pl = bp.value
        for pdf in it:
            m = np.array([np.asarray(x, dtype=np.float64) for x in pdf[vec_col].values])
            nm = m / np.linalg.norm(m, axis=1, keepdims=True)
            out = []
            for t in range(pl.shape[0]):
                bits = (nm @ pl[t].T) > 0  # (B, planes)
                sig = bits @ (1 << np.arange(pl.shape[1]))
                out.append(
                    pd.DataFrame(
                        {
                            "vid": pdf[id_col].values,
                            "table": t,
                            "bucket": sig.astype(np.int64),
                            "nv": [row.tolist() for row in nm],
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    buckets = corpus.select(id_col, vec_col).mapInPandas(
        bucketize, "vid long, table int, bucket long, nv array<double>"
    )
    left = buckets.select(F.col("vid").alias("query_id"), "table", "bucket", F.col("nv").alias("qv"))
    right = buckets.select(F.col("vid").alias("neighbor_id"), "table", "bucket", F.col("nv").alias("cv"))
    cos = F.aggregate(F.zip_with("qv", "cv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    cands = (
        left.join(right, ["table", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.first("cosine").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc(F.round("cosine", 6)), F.asc("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
