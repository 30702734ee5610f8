"""SparkSession factory with scale-appropriate defaults.

All knobs here are chosen for the 100 TB design point and merely *sized down*
for local testing: AQE on (runtime skew-join splitting + coalescing), Arrow
enabled for every pandas-UDF boundary, and shuffle partitions parameterized so
tests can sweep parallelism (the reference's chunking-invariance property,
tests/test_CreateEdges.py:167-208, becomes partition-count invariance here).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "deepgraph_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    On a real cluster the same package is submitted via
    ``spark-submit --py-files deepgraph_spark.zip`` and ``master`` is left to
    the submit command; nothing in the engine assumes local mode.
    """
    # local-mode python workers inherit the driver env — pin BLAS pools here too
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # one-to-two waves of tasks per core locally; on a cluster this is
        # set to ~2-3x total executor cores (or left to AQE coalescing).
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 32, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # larger Arrow batches: per-batch overhead dominates pandas-stage cost
        # at small batch sizes (measured 2-3x on pair-heavy outputs); 100k rows
        # keeps batch memory modest while amortizing the boundary crossing
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        # deterministic timestamp semantics for parity with pandas/DuckDB
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # numpy/BLAS inside Arrow workers must not spawn their own thread
        # pools — N workers x 32 BLAS threads thrashes the box (measured)
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
