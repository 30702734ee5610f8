"""Second-workload scaling probe (BASELINE.md): 8→32 scaling of the
pairwise-correlation workload. Measured finding: the workload is
Arrow-transfer-bound (each candidate pair moves 2×n_samples doubles through
the Arrow boundary), so on one box it hits the same shared-memory-bandwidth
wall as the PageRank superstep — corroborating, not escaping, the
contention diagnosis. Kept as the probe that established that; the pure
hardware ceiling lives in tools/hw_scaling_control.py.

Usage: python tools/corr_scaling_control.py [n_features] [n_samples]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_FEATURES = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
N_SAMPLES = int(sys.argv[2]) if len(sys.argv) > 2 else 100


def run_at(cpus: int) -> dict:
    from deepgraph_spark.session import get_spark
    from deepgraph_spark.workloads import make_features, pairwise_correlations

    spark = get_spark(
        app_name=f"corr_{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus,
        extra_conf={"spark.local.dir": "/dev/shm/spark-local"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    v = make_features(spark, N_FEATURES, N_SAMPLES).persist()
    v.count()
    # warm the python workers before timing
    _ = pairwise_correlations(make_features(spark, 300, N_SAMPLES, seed=1), num_blocks=4).count()
    t0 = time.time()
    n = pairwise_correlations(v, num_blocks=32).count()  # same plan shape at both levels
    dt = time.time() - t0
    spark.stop()
    return {"cores": cpus, "pairs": n, "sec": round(dt, 2), "pairs_per_sec": round(n / dt, 1)}


def main():
    levels = [run_at(8), run_at(32)]
    eff = (levels[1]["pairs_per_sec"] / levels[0]["pairs_per_sec"]) / 4
    out = {
        "workload": f"pairwise correlations, {N_FEATURES} features x {N_SAMPLES} samples",
        "levels": levels,
        "scaling_efficiency": round(eff, 3),
    }
    with open(os.environ.get("CORR_OUT", os.path.join(ROOT, "BENCH_CORR_SCALING.json")), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
