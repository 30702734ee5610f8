"""spark-submit entry: full kernel sweep on the transcript link graph.

    spark-submit --master local[N] --py-files deepgraph_spark.zip \
        jobs/graph_kernels_job.py --turns 100000 --tau 120 \
        --kernels pagerank,cc,scc,lpa,triangles,kcore,bfs,c4 --checkpoint /tmp/ck

Each kernel checkpoints per superstep under --checkpoint/<kernel> and
resumes if re-run. Prints one JSON line of timings + summary stats.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=100_000)
    ap.add_argument("--tau", type=float, default=120.0)
    ap.add_argument("--kernels", default="pagerank,cc,lpa,triangles")  # also: scc,kcore,bfs,sssp,c4,ego,wpagerank,wego
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument(
        "--max-label-iter", type=int, default=2000,
        help="SCC label-propagation superstep cap; the band graph's label "
             "diameter is roughly conversation-duration/tau, so long "
             "conversations need a high cap (supersteps are flat-cost)",
    )
    ap.add_argument("--input", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("deepgraph_spark_kernels").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from deepgraph_spark.algorithms import (
        bfs,
        connected_components,
        four_cycle_count,
        k_core,
        label_propagation,
        pagerank,
        sssp,
        strongly_connected_components,
        triangle_count,
    )
    from deepgraph_spark.datagen import generate_transcripts
    from deepgraph_spark.transcripts import build_turn_graph

    tr = (
        spark.read.parquet(args.input)
        if args.input
        else generate_transcripts(spark, n_turns=args.turns, seed=42).persist()
    )
    g = build_turn_graph(tr, tau_seconds=args.tau)
    edges = g.e.select("s", "t").persist()
    verts = g.v.select("id")
    out: dict = {"m_edges": edges.count(), "n_vertices": verts.count()}

    kernels = set(args.kernels.split(","))
    if "pagerank" in kernels:
        t0 = time.time()
        ranks, hist = pagerank(
            edges, vertices=verts, tol=1e-6, mode="blocks", checkpoint_dir=args.checkpoint
        )
        out["pagerank"] = {
            "sec": round(time.time() - t0, 2),
            "iterations": len(hist),
            "max_rank": float(ranks.agg(F.max("rank")).collect()[0][0]),
        }
    if "cc" in kernels:
        t0 = time.time()
        cp = connected_components(edges, vertices=verts, checkpoint_dir=args.checkpoint)
        out["cc"] = {
            "sec": round(time.time() - t0, 2),
            "n_components": cp.select("cp").distinct().count(),
        }
    if "lpa" in kernels:
        t0 = time.time()
        lab = label_propagation(edges, vertices=verts, max_iter=5, checkpoint_dir=args.checkpoint)
        out["lpa"] = {
            "sec": round(time.time() - t0, 2),
            "n_labels": lab.select("label").distinct().count(),
        }
    if "scc" in kernels:
        t0 = time.time()
        scc = strongly_connected_components(
            edges, vertices=verts, checkpoint_dir=args.checkpoint,
            max_label_iter=args.max_label_iter,
        )
        out["scc"] = {
            "sec": round(time.time() - t0, 2),
            "n_components": scc.select("cp").distinct().count(),
        }
    if "triangles" in kernels:
        t0 = time.time()
        out["triangles"] = {"count": triangle_count(edges), "sec": round(time.time() - t0, 2)}
    if "kcore" in kernels:
        t0 = time.time()
        members, khist = k_core(edges, k=2)
        out["kcore"] = {
            "sec": round(time.time() - t0, 2),
            "k": 2,
            "n_members": members.count(),
            "rounds": len(khist),
        }
    if "bfs" in kernels:
        t0 = time.time()
        dist = bfs(edges, verts.limit(100))
        out["bfs"] = {
            "sec": round(time.time() - t0, 2),
            "n_reached": dist.count(),
            "max_dist": dist.agg(F.max("dist")).collect()[0][0],
        }
    if "sssp" in kernels:
        t0 = time.time()
        # weight = inter-turn delay in exact integer microseconds
        we = g.e.select(
            "s", "t", F.round(F.col("dt_s") * 1e6, 0).alias("w")
        ) if "dt_s" in g.e.columns else edges.withColumn("w", F.lit(1.0))
        d = sssp(we, verts.limit(100))
        out["sssp"] = {
            "sec": round(time.time() - t0, 2),
            "n_reached": d.count(),
            "max_dist": d.agg(F.max("dist")).collect()[0][0],
        }
    if "wpagerank" in kernels:
        # weighted walk: rank flows proportionally to the inter-turn delay
        t0 = time.time()
        we = g.e.select(
            "s", "t", (F.round(F.col("dt_s") * 1e6, 0).cast("long") + F.lit(1)).alias("w")
        ) if "dt_s" in g.e.columns else edges.withColumn("w", F.lit(1.0))
        ranks, hist = pagerank(
            we, vertices=verts, tol=1e-6, mode="join", weight="w",
            checkpoint_dir=args.checkpoint, job_id="wpagerank",
        )
        out["wpagerank"] = {
            "sec": round(time.time() - t0, 2),
            "iterations": len(hist),
            "max_rank": float(ranks.agg(F.max("rank")).collect()[0][0]),
        }
    if "ego" in kernels:
        from deepgraph_spark.core import DeepGraphFrame

        t0 = time.time()
        eg = DeepGraphFrame(verts.withColumnRenamed("id", "v"), edges, index_col="v")
        eg.ego_net(verts.limit(100), radius=2, direction="forward")
        out["ego"] = {
            "sec": round(time.time() - t0, 2),
            "n_vertices": eg.v.count(),
            "n_edges": eg.e.count(),
        }
    if "wego" in kernels:
        # time-budget ego ball: everything within 1h cumulative delay
        from deepgraph_spark.core import DeepGraphFrame

        t0 = time.time()
        we = g.e.select(
            "s", "t", F.round(F.col("dt_s") * 1e6, 0).alias("w")
        ) if "dt_s" in g.e.columns else edges.withColumn("w", F.lit(1.0))
        eg = DeepGraphFrame(verts.withColumnRenamed("id", "v"), we, index_col="v")
        eg.ego_net_weighted(verts.limit(100), 3_600_000_000.0, direction="forward")
        out["wego"] = {
            "sec": round(time.time() - t0, 2),
            "n_vertices": eg.v.count(),
            "n_edges": eg.e.count(),
        }
    if "c4" in kernels:
        t0 = time.time()
        out["c4"] = {
            "count": four_cycle_count(edges).collect()[0]["n_four_cycles"],
            "sec": round(time.time() - t0, 2),
        }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
