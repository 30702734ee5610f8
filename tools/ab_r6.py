"""Round-6 same-session A/B: CC input-persist on/off, distributed-SCC
barrier-interval sweep, C4 single-distinct check.

Each variant runs in its own subprocess (fresh JVM) with warmup + repeats,
mirroring bench.py's isolation, so the comparisons are bracketed within one
session (absolute numbers on this box drift ~30% between sessions — never
compare across sessions, see BASELINE.md).

Usage: python tools/ab_r6.py            # parent: run all variants
       python tools/ab_r6.py VARIANT    # child
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))

VARIANTS = [
    "cc_persist_off",
    "cc_persist_on",
    "scc_dist_b5",
    "scc_dist_b8",
    "scc_dist_b10",
    "scc_default",
    "c4",
]

VARIANTS2 = [
    "scc_dist_b2",
    "scc_dist_b3",
    "scc_dist_b4",
    "scc_dist_b5",
    "c4",
    "c4_twodist",
]


def _session(name: str):
    from deepgraph_spark.session import get_spark

    local_dir = os.environ.get("BENCH_LOCAL_DIR", "/dev/shm/spark-local")
    os.makedirs(local_dir, exist_ok=True)
    spark = get_spark(
        app_name=f"ab6-{name}",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS * 2,
        extra_conf={"spark.local.dir": local_dir},
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _repeat(fn, n=REPEATS, warmup=1):
    for _ in range(warmup):
        fn()
    out = []
    for _ in range(n):
        t0 = time.time()
        fn()
        out.append(time.time() - t0)
    return out


def run_variant(name: str) -> dict:
    from pyspark.sql import functions as F

    spark = _session(name)

    if name.startswith("cc_persist"):
        from deepgraph_spark.algorithms import connected_components
        from deepgraph_spark.entry_queries import event_edges

        e = event_edges(spark, SF_DIR).persist()
        e.count()
        verts = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
            F.col("event_id").alias("id")
        )
        flag = name.endswith("_on")
        ts = _repeat(
            lambda: connected_components(
                e, vertices=verts, label_by_size=False, persist_input=flag
            ).count()
        )
    elif name.startswith("scc"):
        from deepgraph_spark.algorithms import strongly_connected_components
        from deepgraph_spark.entry_queries import scc_event_edges

        de = scc_event_edges(spark, SF_DIR).persist()
        de.count()
        verts = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
            F.col("event_id").alias("id")
        )
        if name == "scc_default":
            ts = _repeat(
                lambda: strongly_connected_components(
                    de, vertices=verts, label_by_size=False
                ).count()
            )
        else:
            be = int(name.rsplit("b", 1)[1])
            ts = _repeat(
                lambda: strongly_connected_components(
                    de,
                    vertices=verts,
                    label_by_size=False,
                    serial_tail_threshold=0,
                    barrier_every=be,
                ).count()
            )
    elif name == "c4":
        from deepgraph_spark.algorithms import four_cycle_count
        from deepgraph_spark.entry_queries import event_edges

        e = event_edges(spark, SF_DIR).select("s", "t").persist()
        e.count()
        ts = _repeat(lambda: four_cycle_count(e).collect())
    elif name == "c4_twodist":
        # round-5 shape: guard's wedge_count builds its own und (extra
        # union+distinct shuffle), pairs plan builds und again
        from deepgraph_spark.algorithms.motifs import (
            _undirected_simple,
            _wedge_count_from_und,
        )
        from deepgraph_spark.entry_queries import event_edges

        e = event_edges(spark, SF_DIR).select("s", "t").persist()
        e.count()

        def old_c4():
            w = _wedge_count_from_und(_undirected_simple(e, "s", "t"))
            assert w <= 1_000_000_000
            und = _undirected_simple(e, "s", "t")
            n1 = und.select(F.col("s").alias("m"), F.col("t").alias("a"))
            n2 = und.select(F.col("s").alias("m"), F.col("t").alias("b"))
            pairs = (
                n1.join(n2, "m")
                .where(F.col("a") < F.col("b"))
                .groupBy("a", "b")
                .agg(F.count(F.lit(1)).alias("p"))
            )
            term = (
                F.col("p").cast("decimal(38,0)") * (F.col("p") - F.lit(1))
            ).cast("decimal(38,0)")
            pairs.agg(
                (F.coalesce(F.sum(term), F.lit(0).cast("decimal(38,0)")) / 4)
                .cast("long")
                .alias("n_four_cycles")
            ).collect()

        ts = _repeat(old_c4)
    else:
        raise SystemExit(f"unknown variant {name}")

    return {"variant": name, "times": ts, "median": statistics.median(ts)}


def main():
    if len(sys.argv) > 1 and sys.argv[1] != "--set2":
        print(json.dumps(run_variant(sys.argv[1])))
        return
    variants = VARIANTS2 if (len(sys.argv) > 1 and sys.argv[1] == "--set2") else VARIANTS
    results = {}
    for v in variants:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), v],
            capture_output=True,
            text=True,
            cwd=ROOT,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            results[v] = json.loads(line)
        except json.JSONDecodeError:
            results[v] = {"error": proc.stderr[-2000:]}
        print(f"{v}: {results[v].get('median', results[v])}", file=sys.stderr)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
