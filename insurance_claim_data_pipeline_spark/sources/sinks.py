"""Distributed sinks: partitioned / bucketed parquet writers.

The reference's only sinks are a driver-side JSON array and a text log
(claim_pipeline.py:218-231 — fine for ≪input candidate sets, wrong for
anything large). These writers are the 100 TB-scale output path:

- ``write_partitioned``: hive-style directory partitioning on a
  low-cardinality column (e.g. event date). Readers filtering on the
  partition column prune whole directories before any IO — the plan
  shows PartitionFilters, verified in tests/test_sinks.py.
- ``write_bucketed``: pre-shuffled bucket layout on a join key, making
  every downstream equi-join on that key shuffle-free (see
  tests/test_bucketing.py).

Partition-count discipline: partitionBy on a high-cardinality column
creates a small-file explosion (one directory per value per task) —
callers should partition on dates/regions/tenants, never ids. The
``coalesce_files`` knob bounds files-per-partition for streaming-ish
append workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    coalesce_files: int | None = None,
) -> None:
    """Write hive-style partitioned parquet; readers get partition
    pruning on ``partition_cols`` filters for free."""
    out = df
    if coalesce_files is not None:
        out = out.repartition(coalesce_files, *partition_cols)
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed external table (metastore entry ``table``) so
    downstream joins/aggregations on ``bucket_col`` skip their shuffle."""
    (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def compact_files(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Compact a directory of small parquet files into ~target-sized
    ones; returns the output file count.

    Streaming appends and over-parallel writers leave thousands of
    KB-sized files per partition; at 100 TB that murders scan planning
    (footer reads, task scheduling) long before it hurts IO. Sizing by
    BYTES — total input size over target size — rather than a fixed
    file count keeps the policy valid at any scale. coalesce() avoids
    a shuffle: it only merges existing partitions, which is exactly
    right for compaction (no key redistribution wanted)."""
    import math

    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(src_path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jvm_path).getLength()
    n_files = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(src_path).coalesce(n_files).write.mode("overwrite").parquet(dst_path)
    return n_files
