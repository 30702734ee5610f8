"""Shared plumbing for the corpus-pipeline operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def reparallelize_small_scan(df: DataFrame, key_col: str) -> DataFrame:
    """Spread a few-file scan across the cluster before CPU-heavy per-row
    work (tokenize / window-build / hash chains run inside the scan's own
    stage, so a one-file input pins them to one core).

    At the design scale the input has thousands of parquet splits and this is
    a no-op decision; the repartition only fires for a scan with fewer files
    than cores — the local-test / tiny-extract case, where one 580 KB parquet
    file otherwise serializes the whole map side (measured 9.5 s → 1.7 s for
    the span-dedup window-hash chain at sf0.1 on local[32]).
    ``inputFiles()`` is a plan-metadata read — unlike
    ``df.rdd.getNumPartitions()`` it never triggers AQE stage execution on a
    composed upstream plan; non-file upstreams report no files and are left
    alone (their partitioning already comes from shuffle exchanges sized by
    ``spark.sql.shuffle.partitions``)."""
    sc = df.sparkSession.sparkContext
    want = sc.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # non-file or unresolvable plans: leave untouched
        return df
    if 0 < n_files < want:
        return df.repartition(want, key_col)
    return df
