"""Repeat driver for tools/scaling_bench.py — median-of-N scaling evidence.

The single-run script measures both parallelism levels once; this wrapper
runs it N times (fresh process per repeat, so no JVM state carries over),
collects the per-repeat efficiencies, and writes BENCH_SCALING.json with the
full repeat list plus the median (the statistic BASELINE.md reports, since
this VM's run-to-run noise is ±15% per level).

Usage: python tools/scaling_repeats.py [repeats] [n_turns] [tau] [mode]
Env: SCALING_WEAK=1 for the weak-scaling (constant data per core) variant.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REPEATS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
ARGS = sys.argv[2:]


def main():
    runs = []
    for i in range(REPEATS):
        env = os.environ.copy()
        env["SCALING_OUT"] = f"/tmp/scaling_run_{i}.json"
        proc = subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "scaling_bench.py"), *ARGS],
            capture_output=True, text=True, cwd=ROOT, env=env,
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-3000:])
            raise RuntimeError(f"scaling repeat {i} failed rc={proc.returncode}")
        payload = json.loads(proc.stdout.strip().splitlines()[-1])
        runs.append(payload)
        print(json.dumps({
            "repeat": i,
            "pagerank_scaling_efficiency": payload["pagerank_scaling_efficiency"],
            "levels": [
                {"cores": l["cores"], "pagerank_sec": l["pagerank_sec"]}
                for l in payload["levels"]
            ],
        }), flush=True)

    effs = [r["pagerank_scaling_efficiency"] for r in runs]
    out = {
        **runs[-1],
        "repeats": REPEATS,
        "pagerank_scaling_efficiency_per_repeat": effs,
        "pagerank_scaling_efficiency_median": round(statistics.median(effs), 3),
        "pagerank_scaling_efficiency_band": [min(effs), max(effs)],
        "levels_per_repeat": [r["levels"] for r in runs],
    }
    # BENCH_SCALING.json is a two-key artifact {strong, weak} (round-4
    # format): merge into the existing file so a strong refresh never
    # clobbers the weak evidence or vice versa
    path = os.path.join(ROOT, "BENCH_SCALING.json")
    mode = "weak" if os.environ.get("SCALING_WEAK") else "strong"
    try:
        with open(path) as f:
            existing = json.load(f)
        if not ("strong" in existing or "weak" in existing):
            existing = {}  # legacy flat file: start fresh
    except (OSError, json.JSONDecodeError):
        existing = {}
    existing[mode] = out
    with open(path, "w") as f:
        json.dump(existing, f, indent=2)
    print(json.dumps({
        "median": out["pagerank_scaling_efficiency_median"],
        "band": out["pagerank_scaling_efficiency_band"],
        "repeats": REPEATS,
    }))


if __name__ == "__main__":
    main()
