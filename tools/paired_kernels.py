"""Paired same-session adjudication of short-kernel bench deltas.

Round-6 VERDICT flagged sssp_events +144%, bfs_events +80%, scc_events +89%,
triangles_events +42% vs round 5 — measured in DIFFERENT sessions on a box
with documented ~30% (sometimes 3x) speed drift. The only valid comparison is
paired: the same box, the same hour, alternating fresh-JVM runs of each code
version (exactly the BENCH_PAIRED_R5.json methodology that adjudicated the
round-4 pagerank flag as environmental).

Each arm is a detached git worktree at a fixed commit; each timed run is that
arm's own ``bench.py --group <grp>`` child (fresh JVM, 1 warmup + 3 in-JVM
repeats per query). Arms alternate A,B,A,B,... so slow drift within the
session cancels; per-query times pool across rounds and the artifact reports
medians plus the full samples.

Usage: python tools/paired_kernels.py [rounds=3] [--arms l1=c1,l2=c2]
       [--groups g1,g2] [--queries q1,q2,...] [--out FILE.json]
Defaults reproduce the round-6 adjudication (writes BENCH_PAIRED_R6.json);
the round-7 transcript-group adjudication runs e.g.:
  python tools/paired_kernels.py 3 --arms r7_2208040=2208040,r6_d60b4c2=d60b4c2 \
      --groups transcript --queries gen_transcripts,build_turn_edges,\
pagerank_transcripts,pagerank_join_transcripts --out BENCH_PAIRED_R7.json
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (label, commit) — r6 engine HEAD vs r5 close-out, per the round-6 verdict
ARMS = [
    ("r6_d60b4c2", "d60b4c2"),
    ("r5_668a084", "668a084"),
]
GROUPS = ["kernels2", "events"]
QUERIES = [
    "scc_events",
    "scc_events_distributed",
    "bfs_events",
    "sssp_events",
    "triangles_events",
    "four_cycles_events",
]


def _worktree(commit: str) -> str:
    path = f"/tmp/paired_{commit}"
    if not os.path.isdir(path):
        subprocess.run(
            ["git", "worktree", "add", "--detach", path, commit],
            cwd=ROOT,
            check=True,
            capture_output=True,
        )
    return path


def _run_group(tree: str, grp: str) -> dict[str, list[float]]:
    env = os.environ.copy()
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py"), "--group", grp],
        capture_output=True,
        text=True,
        cwd=tree,
        env=env,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-3000:])
        raise RuntimeError(f"{tree} group {grp} failed")
    return json.loads(proc.stdout.strip().splitlines()[-1])["times"]


def main() -> None:
    argv = list(sys.argv[1:])

    def opt(name: str, default: str | None) -> str | None:
        if name in argv:
            i = argv.index(name)
            val = argv[i + 1]
            del argv[i : i + 2]
            return val
        return default

    arms_s = opt("--arms", None)
    groups_s = opt("--groups", None)
    queries_s = opt("--queries", None)
    out_file = opt("--out", "BENCH_PAIRED_R6.json")
    arms = (
        [tuple(a.split("=", 1)) for a in arms_s.split(",")] if arms_s else ARMS
    )
    groups = groups_s.split(",") if groups_s else GROUPS
    queries = set(queries_s.split(",")) if queries_s else set(QUERIES)
    rounds = int(argv[0]) if argv else 3

    trees = {label: _worktree(c) for label, c in arms}
    pooled: dict[str, dict[str, list[float]]] = {label: {} for label, _ in arms}
    for i in range(rounds):
        for label, _ in arms:
            for grp in groups:
                times = _run_group(trees[label], grp)
                for q, ts in times.items():
                    if q in queries:
                        pooled[label].setdefault(q, []).extend(ts)
            print(f"round {i + 1}/{rounds} arm {label} done", flush=True)
    a0, a1 = arms[0][0], arms[1][0]
    out = {
        "experiment": (
            f"paired adjudication, {a0} ({arms[0][1]}) vs {a1} ({arms[1][1]}), "
            f"alternating fresh-JVM bench-group runs over {groups} "
            f"({rounds} rounds x 1 warmup + 3 in-JVM repeats each), same "
            "session same box"
        ),
        "groups": groups,
        "arms": {
            label: {
                q: {
                    "times": [round(t, 3) for t in ts],
                    "median": round(statistics.median(ts), 3),
                }
                for q, ts in pooled[label].items()
            }
            for label, _ in arms
        },
        f"ratio_{a0}_over_{a1}": {
            q: round(
                statistics.median(pooled[a0][q])
                / statistics.median(pooled[a1][q]),
                3,
            )
            for q in pooled[a0]
            if q in pooled[a1]
        },
    }
    with open(os.path.join(ROOT, out_file), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out[f"ratio_{a0}_over_{a1}"]))


if __name__ == "__main__":
    main()
