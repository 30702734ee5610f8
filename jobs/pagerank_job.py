"""spark-submit entry point: transcript link graph → PageRank to convergence.

Run unchanged at any cluster size (north_rule):

    zip -r deepgraph_spark.zip deepgraph_spark
    spark-submit --master local[8]  --py-files deepgraph_spark.zip \
        jobs/pagerank_job.py --turns 100000 --tau 120 --checkpoint /tmp/ck
    spark-submit --master local[32] --py-files deepgraph_spark.zip \
        jobs/pagerank_job.py --turns 100000 --tau 120 --checkpoint /tmp/ck

Prints one JSON line with timings, iterations and the top-10 ranked vertices.
A killed run resumes from the latest complete superstep under --checkpoint.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=100_000)
    ap.add_argument("--tau", type=float, default=120.0)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument(
        "--mode",
        default="join",
        choices=["join", "blocks", "broadcast", "coloc"],
        help="physical strategy: 'join' (default — the 100 TB path: one "
        "co-partitioned shuffle per superstep, unbounded vertex count); "
        "'blocks' is the per-partition CSR accelerator for graphs whose "
        "rank vector fits in executor memory (~<=10^8 vertices)",
    )
    ap.add_argument("--salt", type=int, default=0)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--input", default=None, help="parquet transcripts dir (default: synthesize)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("deepgraph_spark_pagerank").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from deepgraph_spark.algorithms import pagerank
    from deepgraph_spark.datagen import generate_transcripts
    from deepgraph_spark.transcripts import build_turn_graph

    if args.input:
        tr = spark.read.parquet(args.input)
    else:
        tr = generate_transcripts(spark, n_turns=args.turns, seed=42).persist()
        tr.count()

    t0 = time.time()
    g = build_turn_graph(tr, tau_seconds=args.tau)
    edges = g.e.select("s", "t").persist()
    m = edges.count()
    build_sec = time.time() - t0

    t0 = time.time()
    ranks, hist = pagerank(
        edges,
        vertices=g.v.select("id"),
        tol=args.tol,
        mode=args.mode,
        salt=args.salt or None,
        checkpoint_dir=args.checkpoint,
        max_iter=args.max_iter,
    )
    pr_sec = time.time() - t0
    top = ranks.orderBy(ranks["rank"].desc(), "id").limit(10).collect()

    print(
        json.dumps(
            {
                "m_edges": m,
                "build_sec": round(build_sec, 2),
                "pagerank_sec": round(pr_sec, 2),
                "iterations": len(hist),
                "final_l1": hist[-1]["l1"] if hist else None,
                "top10": [{"id": r["id"], "rank": round(r["rank"], 8)} for r in top],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
