"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

Runs the identical job — synthetic transcript link graph construction +
PageRank to 1e-6 convergence — at two parallelism levels (default local[8]
and local[32], i.e. N and 4N cores) on the SAME input, and reports
throughput at both plus per-core scaling efficiency::

    efficiency = (throughput@4N / throughput@N) / 4

Writes BENCH_SCALING.json and prints one JSON line.

Usage: python tools/scaling_bench.py [n_turns] [tau_seconds] [mode]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_TURNS = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
TAU = float(sys.argv[2]) if len(sys.argv) > 2 else 240.0
MODE = sys.argv[3] if len(sys.argv) > 3 else "join"
LEVELS = [8, 32]

# Executor-JVM methodology: SCALING_MASTER="local-cluster[{execs},8,16384]"
# gives each 8-core executor its own JVM (own heap, GC, shuffle tracker) so
# the N -> 4N comparison is 1 executor vs 4 executors — the real cluster
# story — instead of one shared 32-thread JVM. {cores} / {execs} are
# substituted per level (execs = cores/8).
MASTER_TMPL = os.environ.get("SCALING_MASTER", "local[{cores}]")
CHECK_EVERY = int(os.environ.get("SCALING_CHECK_EVERY", "1"))
EXEC_MEM = os.environ.get("SCALING_EXEC_MEM", "12g")
# SCALING_WEAK=1: weak scaling — constant data per core (N cores get
# N_TURNS * N/max_cores turns), the N-executors-with-X-data vs
# 4N-executors-with-4X-data story; efficiency compares per-core throughput.
WEAK = os.environ.get("SCALING_WEAK", "") == "1"


def run_at(cpus: int) -> dict:
    from pyspark.sql import functions as F

    from deepgraph_spark.algorithms import pagerank
    from deepgraph_spark.datagen import generate_transcripts
    from deepgraph_spark.session import get_spark
    from deepgraph_spark.transcripts import build_turn_graph

    master = MASTER_TMPL.format(cores=cpus, execs=max(1, cpus // 8))
    extra_conf = {
        "spark.sql.join.preferSortMergeJoin": "false",
        # the superstep loop is statically co-partitioned; AQE's
        # per-exchange replanning round trips are pure overhead there
        "spark.sql.adaptive.enabled": os.environ.get("SCALING_AQE", "false"),
        # shuffle + local-checkpoint files through tmpfs: removes the
        # single local disk from the superstep loop entirely
        "spark.local.dir": os.environ.get("SCALING_LOCAL_DIR", "/dev/shm/spark-local"),
    }
    if master.startswith("local-cluster"):
        # separate executor JVMs: ship the package path + size the executors
        extra_conf["spark.executorEnv.PYTHONPATH"] = ROOT
        extra_conf["spark.executor.memory"] = EXEC_MEM
    spark = get_spark(
        app_name=f"scaling_{cpus}",
        master=master,
        shuffle_partitions=int(os.environ.get("SCALING_SHUFFLE_MULT", "1")) * cpus,
        # shuffled-hash join beats sort-merge for the per-superstep
        # rank-contribution join (no 38M-row sort per iteration)
        extra_conf=extra_conf,
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_turns = N_TURNS * cpus // max(LEVELS) if WEAK else N_TURNS
    tr = generate_transcripts(spark, n_turns=n_turns, seed=42, partitions=cpus * 2).persist()
    tr.count()

    t0 = time.time()
    g = build_turn_graph(tr, tau_seconds=TAU)
    edges = g.e.select("s", "t").persist()
    m = edges.count()
    build_sec = time.time() - t0

    t0 = time.time()
    _, hist = pagerank(
        edges, vertices=g.v.select("id"), tol=1e-6, mode=MODE, max_iter=100,
        check_every=CHECK_EVERY,
    )
    pr_sec = time.time() - t0
    iters = sum(h.get("supersteps", 1) for h in hist)

    spark.stop()
    edges_processed = m * iters
    return {
        "cores": cpus,
        "m_edges": m,
        "iterations": iters,
        "build_sec": round(build_sec, 2),
        "pagerank_sec": round(pr_sec, 2),
        "pagerank_edges_per_sec": round(edges_processed / pr_sec, 1),
        "pagerank_edges_per_sec_per_core": round(edges_processed / pr_sec / cpus, 1),
        "pipeline_sec": round(build_sec + pr_sec, 2),
    }


def main():
    results = [run_at(c) for c in LEVELS]
    lo, hi = results[0], results[-1]
    ratio = hi["cores"] / lo["cores"]
    pr_eff = (hi["pagerank_edges_per_sec"] / lo["pagerank_edges_per_sec"]) / ratio
    pipe_eff = (lo["pipeline_sec"] / hi["pipeline_sec"]) / ratio
    out = {
        "job": f"transcripts({N_TURNS} turns, tau={TAU}s) -> edges -> pagerank@1e-6 ({MODE})",
        "master": MASTER_TMPL,
        "check_every": CHECK_EVERY,
        "weak_scaling": WEAK,
        "levels": results,
        "pagerank_scaling_efficiency": round(pr_eff, 3),
        "pipeline_scaling_efficiency": round(pipe_eff, 3),
    }
    with open(os.environ.get("SCALING_OUT", os.path.join(ROOT, "BENCH_SCALING.json")), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
