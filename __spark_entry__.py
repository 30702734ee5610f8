"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 — every
query carries a full DuckDB value oracle (the exact count is
``len(queries())``; ``tests/test_entry.py`` asserts docs never drift from
it), including the iterative kernels
(unrolled power iteration / LPA / k-core peel, recursive-CTE closures for
weak CC, strong CC, depth-capped BFS, bit-exact integer-µs weighted SSSP,
and k-hop ego nets), the Structured Streaming
surface (bounded availableNow replays of the real streaming band join and
session queries vs the batch SQL oracles), the corpus-curation family — graded
through one composed nine-stage pipeline gate (PII redaction → lang-id →
quality → MinHash near-dup removal → duplicate-span strip → SemDeDup
semantic dedup → decontamination → hash split → shard packing, mirrored
stage-for-stage in a single DuckDB oracle), with the
four single-op curation gates (plus the brute-force ANN baseline, whose
exact-cosine math the graded IVF/LSH/semantic-dedup gates re-verify, the
incremental-index dedup pair — batch + its foreachBatch streaming twin —
the training-mix assembler, and the engine-addition kernels past the
graded set: link-prediction scores, whole-graph profiling, k-truss,
deterministic random walks, sampled harmonic centrality — every one with
its own full DuckDB mirror, value-checked by ``tools/check_oracles.py``
into ``CORRECTNESS_EXTRA.json``) kept in
a local-only overflow registry (``entry_queries.EXTRA_QUERIES``) because the
driver grades at most the first fifty entries — and the hash
sketches (shared 60-bit MD5 hash family mirrors simhash, winnowing
fingerprints, the complete MinHash-LSH band pipeline, and the
Rademacher-plane ANN-LSH buckets engine-for-engine)."""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: events link graph (band join per user) rolled up into the
    event_type→event_type supergraph — construction + aggregation end-to-end."""
    from deepgraph_spark.entry_queries import q_supergraph_events

    return q_supergraph_events(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from deepgraph_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    # only the graded surface: ORACLES also carries oracles for the
    # local-only EXTRA_QUERIES overflow registry (tools/check_oracles.py
    # values those), and the driver must never see an oracle without a
    # matching queries() entry
    from deepgraph_spark.entry_queries import ORACLES, QUERIES

    return {name: ORACLES[name] for name in QUERIES if name in ORACLES}
