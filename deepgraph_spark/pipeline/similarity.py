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
    planes=None,
) -> DataFrame:
    """LSH-bucketed approximate top-k: random-hyperplane signatures over
    ``n_tables`` tables; candidates = bucket collisions; exact cosine re-rank
    within candidates. Recall measured in tests vs the brute-force baseline.

    Narrow-bucket shape (the same candidate→verify design as
    :func:`~deepgraph_spark.pipeline.dedup.embedding_neardup_pairs`): bucket
    rows carry only ``(id, table, bucket)`` — no vector payload rides the
    ``n_tables``-times-replicated bucket shuffle — candidate pairs are
    deduplicated across tables *before* any cosine evaluates, and the vectors
    join in exactly once, at the verify stage."""
    from deepgraph_spark.pipeline.dedup import _emb_base, _hyperplane_buckets

    buckets = _hyperplane_buckets(
        corpus, vec_col=vec_col, id_col=id_col, n_planes=n_planes,
        n_tables=n_tables, seed=seed, planes=planes,
    )
    left = buckets.select(F.col("vid").alias("query_id"), "table", "bucket")
    right = buckets.select(F.col("vid").alias("neighbor_id"), "table", "bucket")
    cands = (
        left.join(right, ["table", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    base = _emb_base(corpus, vec_col, id_col, [])
    qa = base.select(
        F.col(id_col).alias("query_id"), F.col("rv").alias("qv"), F.col("ss").alias("qs")
    )
    cb = base.select(
        F.col(id_col).alias("neighbor_id"), F.col("rv").alias("cv"), F.col("ss").alias("cs")
    )
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    cos = dot / (F.sqrt("qs") * F.sqrt("cs"))
    scored = (
        cands.join(qa, "query_id")
        .join(cb, "neighbor_id")
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc(F.round("cosine", 6)), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def ann_topk_ivf(
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    centroid_mod: int = 1000,
    n_centroids: int | None = None,
    kmeans_iters: int = 0,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-flat approximate top-k: a coarse quantizer partitions the corpus
    into centroid buckets (each vector lives in its single nearest bucket), a
    query scans only its ``nprobe`` nearest buckets, and the exact cosine
    re-ranks within those candidates.

    Centroids are a deterministic hash sample of the corpus itself
    (``id % mod == 0``) — for the coarse-bucketing role a uniform sample
    covers the data distribution (k-means|| seeding starts the same way), and
    determinism is what lets the whole pipeline (assignment argmax included)
    hold bit-for-bit against a SQL oracle; ``kmeans_iters`` Lloyd-refines the
    codebook (deterministic — fixed count, 9-dp-rounded means) without
    touching the plan shape downstream.
    ``n_centroids`` (absolute codebook size) is the open-scale form — a fixed
    ``centroid_mod`` makes the codebook ``n/mod`` rows, linear in the corpus,
    so assignment degenerates to O(n²/mod) as data grows (round-7 verdict);
    with ``n_centroids`` one cheap count pins the codebook at O(k) and
    assignment at O(n·k) forever. See
    :func:`deepgraph_spark.pipeline.dedup._codebook_mod`.

    Scale shape: assignment amplifies the corpus by ``codebook`` rows (the
    inherent IVF assignment cost — keep the coarse codebook small and FIXED,
    via ``n_centroids``); after that only ``(id, cid)`` pairs ride the
    candidate join, vectors enter once at the verify stage, and per-query
    work is ``nprobe/codebook`` of the corpus instead of all of it."""
    from deepgraph_spark.pipeline.dedup import _codebook_mod, _emb_base, _ivf_codebook

    base = _emb_base(corpus, vec_col, id_col, [])
    mod = _codebook_mod(base, id_col, centroid_mod, n_centroids)
    cent = _ivf_codebook(base, id_col, mod, kmeans_iters)
    dot_c = F.aggregate(
        F.zip_with("rv", "cv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    sim = F.round(dot_c / (F.sqrt("ss") * F.sqrt("cs")), 6)
    assign = base.select(id_col, "rv", "ss").crossJoin(cent).select(
        F.col(id_col), F.col("cid"), sim.alias("sim")
    )
    wa = Window.partitionBy(id_col).orderBy(F.desc("sim"), F.asc("cid"))
    ranked_assign = assign.withColumn("arank", F.row_number().over(wa))
    probes = ranked_assign.where(F.col("arank") <= nprobe).select(
        F.col(id_col).alias("query_id"), "cid"
    )
    buckets = ranked_assign.where(F.col("arank") == 1).select(
        F.col(id_col).alias("neighbor_id"), "cid"
    )
    cands = probes.join(buckets, "cid").where(
        F.col("query_id") != F.col("neighbor_id")
    ).select("query_id", "neighbor_id")

    qa = base.select(
        F.col(id_col).alias("query_id"), F.col("rv").alias("qv"), F.col("ss").alias("qs")
    )
    cb = base.select(
        F.col(id_col).alias("neighbor_id"), F.col("rv").alias("cv2"), F.col("ss").alias("cs2")
    )
    dot_v = F.aggregate(
        F.zip_with("qv", "cv2", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    cos = dot_v / (F.sqrt("qs") * F.sqrt("cs2"))
    scored = (
        cands.join(qa, "query_id")
        .join(cb, "neighbor_id")
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc(F.round("cosine", 6)), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
