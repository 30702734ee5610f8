"""Benchmark harness — ONE JSON line to stdout.

Headline: the BASELINE.json metric — edges/sec/core for PageRank to 1e-6
convergence on the synthetic transcript link graph — plus per-query wall
times over the driver tables at $SPARK_GRAFT_SF_DIR (default sf0.1).

Scaling evidence (N vs 4N executors → local[8] vs local[32]) is produced by
tools/scaling_bench.py and recorded in BASELINE.md / BENCH notes; this script
runs at the driver-provided parallelism only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_TURNS = int(os.environ.get("BENCH_TURNS", "200000"))
TAU = float(os.environ.get("BENCH_TAU", "120"))


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def main():
    from pyspark.sql import functions as F

    from deepgraph_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS * 2)
    spark.sparkContext.setLogLevel("ERROR")

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    queries: dict[str, float] = {}

    # -- headline: synthetic transcript link graph → PageRank to 1e-6 -------
    from deepgraph_spark.algorithms import pagerank
    from deepgraph_spark.datagen import generate_transcripts
    from deepgraph_spark.transcripts import build_turn_graph

    t_gen0 = time.time()
    tr = generate_transcripts(spark, n_turns=N_TURNS, seed=42, partitions=CPUS * 2)
    tr = tr.persist()
    n_turns = tr.count()
    queries["gen_transcripts"] = time.time() - t_gen0

    t0 = time.time()
    g = build_turn_graph(tr, tau_seconds=TAU)
    edges = g.e.select("s", "t").persist()
    m_edges = edges.count()
    queries["build_turn_edges"] = time.time() - t0

    t0 = time.time()
    ranks, hist = pagerank(
        edges, vertices=g.v.select("id"), tol=1e-6, mode="blocks", max_iter=100
    )
    _ = ranks.count()
    pr_sec = time.time() - t0
    queries["pagerank_transcripts"] = pr_sec
    iters = len(hist)
    edges_processed = m_edges * max(iters, 1)
    eps_per_core = edges_processed / pr_sec / CPUS

    # -- driver-table queries ------------------------------------------------
    from deepgraph_spark.entry_queries import (
        event_edges,
        q_ann_topk_embeddings,
        q_ngram_jaccard_documents,
        q_triangles_events,
    )

    t0 = time.time()
    e_events = event_edges(spark, SF_DIR).persist()
    m_events = e_events.count()
    queries["edges_ft_events"] = time.time() - t0

    from deepgraph_spark.algorithms import connected_components

    t0 = time.time()
    verts = spark.read.parquet(f"{SF_DIR}/events.parquet").select(F.col("event_id").alias("id"))
    _ = connected_components(e_events, vertices=verts, label_by_size=False).count()
    queries["cc_events"] = time.time() - t0

    t0 = time.time()
    _ = q_triangles_events(spark, SF_DIR).collect()
    queries["triangles_events"] = time.time() - t0

    from deepgraph_spark.pipeline import minhash_lsh_dedup

    t0 = time.time()
    # xxhash64 family = the production fast path (the gate query runs the
    # md5-shared family for oracle parity; same plan, different hash)
    _ = minhash_lsh_dedup(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"), threshold=0.5
    ).count()
    queries["minhash_dedup"] = time.time() - t0

    t0 = time.time()
    _ = q_ngram_jaccard_documents(spark, SF_DIR).count()
    queries["ngram_jaccard"] = time.time() - t0

    t0 = time.time()
    _ = q_ann_topk_embeddings(spark, SF_DIR).count()
    queries["ann_topk"] = time.time() - t0

    # -- reference-published workloads (BASELINE.md head-to-head) ------------
    from deepgraph_spark.workloads import (
        balls_allpairs,
        balls_ft,
        make_balls,
        make_features,
        pairwise_correlations,
    )

    vb = make_balls(spark, 1168).persist()
    vb.count()
    # warm python workers + numpy before the timed head-to-head runs
    _ = balls_allpairs(make_balls(spark, 200, seed=1), num_blocks=2).count()
    _ = pairwise_correlations(make_features(spark, 300, 100, seed=1), num_blocks=4).count()
    t0 = time.time()
    _ = balls_allpairs(vb, num_blocks=4).count()
    queries["ref_allpairs_1168"] = time.time() - t0  # ref: 0.557s
    t0 = time.time()
    _ = balls_ft(vb, 1000).count()
    queries["ref_ft_1168"] = time.time() - t0  # ref: 0.167s

    # crossover point: 100k nodes is ~5.0e9 candidate pairs all-pairs — the
    # band join examines only the ~10M in-band pairs (linear plan). The
    # extrapolated all-pairs cost at the measured all-pairs rate makes the
    # fast-track advantage explicit at the scale where it matters (the
    # reference's published 3.3x at 1,168 nodes is overhead-dominated here).
    vb_big = make_balls(spark, 100_000, seed=2).persist()
    vb_big.count()
    t0 = time.time()
    n_ft_pairs = balls_ft(vb_big, 1000).count()
    ft_100k_sec = time.time() - t0
    queries["ref_ft_100k"] = ft_100k_sec
    vb_big.unpersist()

    vf = make_features(spark, 5000, 100).persist()
    vf.count()
    t0 = time.time()
    n_corr = pairwise_correlations(vf, num_blocks=12).count()
    corr_sec = time.time() - t0
    queries["ref_pairwise_corr_5000"] = corr_sec  # ref: 14.193s

    total = sum(queries.values())
    out = {
        "metric": "headline suite wall time (transcript gen+edges+pagerank@1e-6 + driver-table ops)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": float(sf),
        "pagerank": {
            "n_turns": n_turns,
            "m_edges": m_edges,
            "iterations": iters,
            "edges_per_sec_per_core": round(eps_per_core, 1),
            "cores": CPUS,
            "tol": 1e-6,
        },
        "events_graph_edges": m_events,
        "ref_comparison": {
            "pairwise_corr_pairs_per_sec": round(n_corr / corr_sec, 1),
            "ref_pairwise_corr_pairs_per_sec": 880000,
            "ref_allpairs_1168_sec": 0.557,
            "ref_ft_1168_sec": 0.167,
        },
        "ft_crossover_100k": {
            "band_pairs": n_ft_pairs,
            "band_sec": round(ft_100k_sec, 3),
            "allpairs_candidates": 100_000 * 99_999 // 2,
            # extrapolated from this run's measured all-pairs rate at 1,168
            "allpairs_extrapolated_sec": round(
                (100_000 * 99_999 / 2) / (681_528 / queries["ref_allpairs_1168"]), 1
            ),
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
