"""Shared plumbing for the corpus-pipeline operators."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# Logical-plan nodes that introduce (or follow) a shuffle exchange: when any
# of these sits above the file scan, the DataFrame's partitioning is already
# governed by spark.sql.shuffle.partitions, not by the scan's split count —
# an extra repartition there is a redundant mid-pipeline exchange.
_WIDE_NODE_RE = re.compile(
    r"^[\s+:|-]*(?:Join|Aggregate|RepartitionByExpression|Repartition\b"
    r"|Sort|Window|Deduplicate|Distinct|Intersect|Except|CoGroup"
    r"|FlatMapGroupsInPandas|FlatMapCoGroupsInPandas)",
    re.MULTILINE,
)


def _is_bare_scan(df: DataFrame) -> bool:
    """True when the analyzed logical plan is a narrow chain over the file
    scan (Project/Filter/generators only) — i.e. the scan's split count is
    what actually decides this DataFrame's parallelism."""
    try:
        tree = df._jdf.queryExecution().analyzed().treeString()
    except Exception:
        return False
    return _WIDE_NODE_RE.search(tree) is None


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
    ``spark.sql.shuffle.partitions``).

    Composed plans are left alone too (round-7 advice): ``inputFiles()``
    reports the LEAF scan's files even when joins/aggregates already sit
    between the scan and this point — there the upstream exchanges have
    already set the parallelism and a repartition would be a redundant
    mid-pipeline shuffle. The gate is a narrow-chain check on the analyzed
    logical plan (:func:`_is_bare_scan`), so the helper stays safe to call
    from shared low-level builders."""
    sc = df.sparkSession.sparkContext
    want = sc.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # non-file or unresolvable plans: leave untouched
        return df
    if 0 < n_files < want and _is_bare_scan(df):
        return df.repartition(want, key_col)
    return df
