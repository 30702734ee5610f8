"""Locate the blocks-vs-join PageRank crossover (round-4 verdict item 6).

Blocks mode (per-partition CSR + Arrow rank streaming) wins on small graphs
where per-superstep JVM scheduling dominates; join mode (co-partitioned
join + dst aggregation) is the 100 TB plan. This tool measures both modes
on the same synthetic transcript link graphs at increasing sizes — each
(size, mode) in its OWN subprocess/JVM, bench.py's isolation discipline —
and reports the wall-time ratio per size so the crossover edge count is
data, not assertion.

Usage:
  python tools/pagerank_crossover.py               # parent: sweep + report
  python tools/pagerank_crossover.py --child N MODE [REPEATS]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TAU = float(os.environ.get("BENCH_TAU", "120"))
# ~200k turns -> ~0.72M edges; edge count grows ~linearly with turns
SIZES = [int(x) for x in os.environ.get(
    "CROSSOVER_TURNS", "200000,700000,1400000,2800000"
).split(",")]


def child(n_turns: int, mode: str, repeats: int) -> None:
    from deepgraph_spark.algorithms import pagerank
    from deepgraph_spark.datagen import generate_transcripts
    from deepgraph_spark.session import get_spark
    from deepgraph_spark.transcripts import build_turn_graph

    local_dir = os.environ.get("BENCH_LOCAL_DIR", "/dev/shm/spark-local")
    os.makedirs(local_dir, exist_ok=True)
    spark = get_spark(
        app_name=f"crossover-{mode}-{n_turns}",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS * 2,
        extra_conf={"spark.local.dir": local_dir},
    )
    spark.sparkContext.setLogLevel("ERROR")
    tr = generate_transcripts(
        spark, n_turns=n_turns, seed=42, partitions=CPUS * 2
    ).persist()
    tr.count()
    g = build_turn_graph(tr, tau_seconds=TAU)
    edges = g.e.select("s", "t").persist()
    m = edges.count()
    v = g.v.select("id")

    def run():
        ranks, hist = pagerank(edges, vertices=v, tol=1e-6, mode=mode, max_iter=100)
        ranks.count()
        return len(hist)

    iters = run()  # warmup
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        run()
        ts.append(time.time() - t0)
    print(json.dumps({
        "n_turns": n_turns, "mode": mode, "m_edges": m, "iterations": iters,
        "times": [round(t, 2) for t in ts],
        "median": round(statistics.median(ts), 2),
    }))


def parent() -> None:
    rows = []
    for n in SIZES:
        per_mode = {}
        for mode in ("blocks", "join"):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", str(n),
                 mode, os.environ.get("CROSSOVER_REPEATS", "2")],
                capture_output=True, text=True, cwd=ROOT, env=os.environ.copy(),
            )
            if proc.returncode != 0:
                sys.stderr.write(proc.stderr[-3000:])
                raise RuntimeError(f"child {n} {mode} failed")
            per_mode[mode] = json.loads(proc.stdout.strip().splitlines()[-1])
            sys.stderr.write(
                f"  {n} turns {mode}: {per_mode[mode]['median']}s "
                f"({per_mode[mode]['m_edges']} edges, "
                f"{per_mode[mode]['iterations']} iters)\n"
            )
        rows.append({
            "n_turns": n,
            "m_edges": per_mode["blocks"]["m_edges"],
            "iterations": per_mode["blocks"]["iterations"],
            "blocks_sec": per_mode["blocks"]["median"],
            "join_sec": per_mode["join"]["median"],
            "join_over_blocks": round(
                per_mode["join"]["median"] / per_mode["blocks"]["median"], 2
            ),
        })
    print(json.dumps({"cpus": CPUS, "tau": TAU, "rows": rows}, indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3], int(sys.argv[4]) if len(sys.argv) > 4 else 2)
    else:
        parent()
