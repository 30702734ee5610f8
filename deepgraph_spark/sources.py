"""Table IO: Iceberg-backed when a catalog is configured, parquet otherwise.

The reference's out-of-core node table is an HDFStore with row/column
pushdown (`v.select(key, where=..., columns=...)`,
iterators_and_indexers.py:219-221); the Spark-native analog is a table scan
with column pruning + predicate pushdown, plus a declared sort order so the
fast-track feature's sortedness precondition (deepgraph.py:1046-1050) holds
physically.

THE TESTED DESIGN IS THE PARQUET LAYOUT: partitioned, sorted-within-partition
files written by :func:`write_table` / :func:`write_transcripts` (layout
asserted in tests/test_sources.py). An Iceberg catalog — which would add
hidden partitioning and *declared* sort orders on top of the same physical
idea — is supported only as a thin ``spark.read.table``/``writeTo``
passthrough taken when the runtime jar is actually on the classpath
(:func:`iceberg_available`); the jar is absent in this environment, so that
branch is deliberately minimal and NOT exercised by the test suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, location: str) -> DataFrame:
    """``catalog.db.table`` (Iceberg) or a parquet path."""
    if "/" not in location and "." in location and iceberg_available(spark):
        return spark.read.table(location)
    if location.endswith(".parquet") or "/" in location:
        return spark.read.parquet(location)
    return spark.read.table(location)


def write_table(
    df: DataFrame,
    location: str,
    *,
    partition_by: list[str] | None = None,
    sort_within_partitions: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write with explicit layout: partition columns for pruning, in-partition
    sort for band-join locality (e.g. transcripts partitioned by a conv_id
    bucket, sorted by (conv_id, turn_idx))."""
    spark = df.sparkSession
    if sort_within_partitions:
        if partition_by:
            df = df.repartition(*[df[c] for c in partition_by])
        df = df.sortWithinPartitions(*sort_within_partitions)
    if "/" not in location and "." in location and iceberg_available(spark):
        writer = df.writeTo(location)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(location)


def write_transcripts(df: DataFrame, location: str, buckets: int = 64) -> None:
    """Canonical transcript layout: bucketed by conv_id hash (pruning +
    co-located per-conversation pair generation), sorted by
    (conv_id, turn_idx) within partitions — the Iceberg sort-order analog."""
    from pyspark.sql import functions as F

    df = df.withColumn("conv_bucket", F.pmod(F.abs(F.xxhash64("conv_id")), buckets).cast("int"))
    write_table(
        df,
        location,
        partition_by=["conv_bucket"],
        sort_within_partitions=["conv_id", "turn_idx"],
    )


def read_csv(spark: SparkSession, path: str, *, header: bool = True, infer_schema: bool = True, **options) -> DataFrame:
    """CSV ingestion (the reference's tutorials build node tables with
    ``pandas.read_csv``; deepgraph.py:82-99 accepts any DataFrame). Thin
    wrapper over the built-in reader so CSV sources get the same scan-level
    column pruning as parquet (predicate pushdown is parquet/Iceberg-only)."""
    reader = spark.read.option("header", str(header).lower()).option(
        "inferSchema", str(infer_schema).lower()
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)
