"""Extra measurement harness for optimization work (guide §1.4): isolates a
single query/operator with the noop sink or its bench-equivalent action,
labels jobs, and prints per-repeat wall times. NOT the driver-facing bench —
``bench.py`` stays frozen; numbers from here are cited in
OPTIMIZATION_r09.md as working evidence.

Usage: python bench_extra.py <target> [repeats]
Targets mirror bench.py's query set (subset, grown as optimization touches
them).
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_TURNS = int(os.environ.get("BENCH_TURNS", "200000"))
TAU = float(os.environ.get("BENCH_TAU", "120"))


def _session(name):
    from deepgraph_spark.session import get_spark

    local_dir = os.environ.get("BENCH_LOCAL_DIR", "/dev/shm/spark-local")
    os.makedirs(local_dir, exist_ok=True)
    spark = get_spark(
        app_name=f"bx-{name}",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS * 2,
        extra_conf={"spark.local.dir": local_dir},
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _time(fn, repeats, warmup=1):
    for _ in range(warmup):
        fn()
    out = []
    for _ in range(repeats):
        t0 = time.time()
        fn()
        out.append(round(time.time() - t0, 3))
    return out


def tgt_pagerank_blocks(repeats):
    from deepgraph_spark.algorithms import pagerank
    from deepgraph_spark.datagen import generate_transcripts
    from deepgraph_spark.transcripts import build_turn_graph

    spark = _session("pr-blocks")
    tr = generate_transcripts(spark, n_turns=N_TURNS, seed=42, partitions=CPUS * 2).persist()
    tr.count()
    g = build_turn_graph(tr, tau_seconds=TAU)
    edges = g.e.select("s", "t").persist()
    edges.count()
    v = g.v.select("id")

    def run():
        ranks, hist = pagerank(edges, vertices=v, tol=1e-6, mode="blocks", max_iter=100)
        ranks.count()
        run.iters = len(hist)

    ts = _time(run, repeats)
    print({"pagerank_blocks": ts, "iters": run.iters})


def tgt_pagerank_join(repeats):
    from deepgraph_spark.algorithms import pagerank
    from deepgraph_spark.datagen import generate_transcripts
    from deepgraph_spark.transcripts import build_turn_graph

    spark = _session("pr-join")
    tr = generate_transcripts(spark, n_turns=N_TURNS, seed=42, partitions=CPUS * 2).persist()
    tr.count()
    g = build_turn_graph(tr, tau_seconds=TAU)
    edges = g.e.select("s", "t").persist()
    edges.count()
    v = g.v.select("id")

    def run():
        ranks, hist = pagerank(edges, vertices=v, tol=1e-6, mode="join", max_iter=100)
        ranks.count()
        run.iters = len(hist)

    ts = _time(run, repeats)
    print({"pagerank_join": ts, "iters": run.iters})


def tgt_cc_events(repeats):
    from pyspark.sql import functions as F

    from deepgraph_spark.algorithms import connected_components
    from deepgraph_spark.entry_queries import event_edges

    spark = _session("cc")
    e = event_edges(spark, SF_DIR).persist()
    e.count()
    verts = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        F.col("event_id").alias("id")
    )

    def run():
        connected_components(e, vertices=verts, label_by_size=False).count()

    print({"cc_events": _time(run, repeats)})


def tgt_cc_events_dist(repeats):
    from pyspark.sql import functions as F

    from deepgraph_spark.algorithms import connected_components
    from deepgraph_spark.entry_queries import event_edges

    spark = _session("cc-dist")
    e = event_edges(spark, SF_DIR).persist()
    e.count()
    verts = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        F.col("event_id").alias("id")
    )

    def run():
        connected_components(
            e, vertices=verts, label_by_size=False, serial_tail_threshold=0
        ).count()

    print({"cc_events_dist": _time(run, repeats)})


def tgt_curation(repeats):
    from pyspark.sql import functions as F

    from deepgraph_spark.pipeline import curation_pipeline

    spark = _session("curation")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def run():
        curation_pipeline(
            docs.where(F.col("doc_id") % 17 != 0),
            docs.where(F.col("doc_id") % 17 == 0),
            min_alpha_ratio=0.815,
            neardup_threshold=0.5,
            split_seed=42,
            shard_budget=2000,
        ).agg(F.sum("n_tokens"), F.max("shard")).collect()

    print({"curation_pipeline": _time(run, repeats)})


def tgt_semantic_dedup(repeats):
    from deepgraph_spark.pipeline import semantic_dedup

    spark = _session("semdd")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def run():
        semantic_dedup(emb, threshold=0.4, centroid_mod=25).count()

    print({"semantic_dedup": _time(run, repeats)})


def tgt_minhash(repeats):
    from deepgraph_spark.pipeline import minhash_lsh_dedup

    spark = _session("minhash")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def run():
        minhash_lsh_dedup(docs, threshold=0.5).count()

    print({"minhash_dedup": _time(run, repeats)})


def tgt_ngram_gate(repeats):
    from deepgraph_spark.entry_queries import q_ngram_jaccard_documents

    spark = _session("ngram")

    def run():
        q_ngram_jaccard_documents(spark, SF_DIR).count()

    print({"ngram_jaccard": _time(run, repeats)})


def tgt_ngram_prefix(repeats):
    from pyspark.sql import functions as F

    from deepgraph_spark.pipeline import ngram_jaccard_pairs

    spark = _session("ngram-pfx")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def run():
        ngram_jaccard_pairs(
            docs, group_cols=["source"], threshold=0.35, method="prefix"
        ).agg(F.sum("jaccard")).collect()

    print({"ngram_prefix": _time(run, repeats)})


def tgt_ngram_allpairs(repeats):
    from pyspark.sql import functions as F

    from deepgraph_spark.pipeline import ngram_jaccard_pairs

    spark = _session("ngram-ap")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def run():
        ngram_jaccard_pairs(
            docs, group_cols=["source"], threshold=0.35, method="allpairs"
        ).agg(F.sum("jaccard")).collect()

    print({"ngram_allpairs_t35": _time(run, repeats)})


def tgt_corr(repeats):
    from deepgraph_spark.workloads import make_features, pairwise_correlations

    spark = _session("corr")
    vf = make_features(spark, 5000, 100).persist()
    vf.count()

    def run():
        pairwise_correlations(vf, num_blocks=CPUS).count()

    print({"ref_pairwise_corr_5000": _time(run, repeats)})


def tgt_allpairs1168(repeats):
    from deepgraph_spark.workloads import balls_allpairs, make_balls

    spark = _session("ap1168")
    vb = make_balls(spark, 1168).persist()
    vb.count()

    def run():
        balls_allpairs(vb, num_blocks=4).count()

    print({"ref_allpairs_1168": _time(run, repeats)})


def tgt_ft100k(repeats):
    from deepgraph_spark.workloads import balls_ft, make_balls

    spark = _session("ft100k")
    vb = make_balls(spark, 100_000, seed=2).persist()
    vb.count()

    def run():
        balls_ft(vb, 1000).count()

    print({"ref_ft_100k": _time(run, repeats)})


def tgt_scc_dist(repeats):
    from pyspark.sql import functions as F

    from deepgraph_spark.algorithms import strongly_connected_components
    from deepgraph_spark.entry_queries import scc_event_edges

    spark = _session("scc-dist")
    de = scc_event_edges(spark, SF_DIR).persist()
    de.count()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    verts = ev.select(F.col("event_id").alias("id"))

    def run():
        strongly_connected_components(
            de, vertices=verts, label_by_size=False, serial_tail_threshold=0
        ).count()

    print({"scc_events_distributed": _time(run, repeats)})


def tgt_build_edges(repeats):
    from deepgraph_spark.datagen import generate_transcripts
    from deepgraph_spark.transcripts import build_turn_graph

    spark = _session("build-edges")
    tr = generate_transcripts(spark, n_turns=N_TURNS, seed=42, partitions=CPUS * 2).persist()
    tr.count()

    def run():
        g = build_turn_graph(tr, tau_seconds=TAU)
        g.e.select("s", "t").count()

    print({"build_turn_edges": _time(run, repeats)})


TARGETS = {k[4:]: v for k, v in list(globals().items()) if k.startswith("tgt_")}

if __name__ == "__main__":
    name = sys.argv[1]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    TARGETS[name](repeats)
