"""S10 sink / write path (reference load stage: src/etl.py:38-39 writes the
transformed frame to the configured store; settings.py:8's DB_URL intent).

Spark-first equivalents:

* ``write_partitioned`` — Hive-layout partitioned parquet. The partition
  columns become directory keys, which is what makes later reads prunable:
  a filter on a partition column never touches the other directories'
  files (PartitionFilters in the scan, distinct from PushedFilters).
* ``read_back`` — plain parquet read of a sink directory; partition-column
  values are recovered from the directory names.

100 TB notes:
* Each task writes one file per (task, partition-key) pair, so a shuffled
  upstream with many tasks × many keys explodes into millions of tiny
  files. ``write_partitioned`` repartitions BY the partition columns first
  — one task per key — which bounds output to one file per key. For keys
  too big for one task, ``files_per_partition`` > 1 round-robins rows
  across that many tasks instead (N files per key, all written in
  parallel).
* zstd over snappy: ~30% smaller at comparable scan speed — at 100 TB the
  scan is IO-bound, so smaller IS faster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
    compression: str = "zstd",
    files_per_partition: int = 1,
) -> None:
    out = df
    if partition_by:
        if files_per_partition > 1:
            # round-robin across N tasks: every task sees every key, so the
            # writer emits exactly N files per key — the salt-split for keys
            # too large for a single task's file
            out = df.repartition(files_per_partition)
        else:
            out = df.repartition(*partition_by)
    writer = out.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_back(spark: SparkSession, path: str) -> DataFrame:
    """Read a sink directory; partition columns come back from dir names."""
    return spark.read.parquet(path)


def write_incremental(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...],
    compression: str = "zstd",
) -> None:
    """Incremental maintenance of a partitioned sink: DYNAMIC partition
    overwrite — only the partitions present in ``df`` are replaced; all
    others are untouched.

    This is the engine's incremental-ETL primitive (the reference's
    "incremental" mode re-runs the whole ETL, src/etl.py:16-40; a 100 TB
    table can't). A daily refresh recomputes yesterday's partition(s) and
    overwrites just those directories — cost tracks the DELTA, not the
    table. Static overwrite mode (the default) would silently DROP every
    partition not in the delta, i.e. truncate the table; the conf below is
    the entire difference between "upsert" and "data loss".
    """
    out = df.repartition(*partition_by)
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("compression", compression)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 512 * 1024 * 1024,
    partition_by: tuple[str, ...] = (),
    compression: str = "zstd",
) -> int:
    """Small-file compaction: rewrite a parquet directory so each output
    file is ~``target_file_bytes``. Returns the output task count.

    The operational reality behind it: streaming micro-batches, incremental
    partition overwrites, and high-task-count shuffles all accrete files
    far below the ~128 MB-1 GB sweet spot, and at 100 TB the resulting
    listing/open overhead (plus one scheduler task per tiny file) dominates
    scan time. Compaction = read → repartition to ceil(bytes/target) tasks
    → rewrite → atomic directory swap. The byte size comes from the file
    system listing (driver-side metadata, not data); the swap via rename
    keeps readers from ever seeing a half-written directory.

    With ``partition_by`` the rewrite keys tasks by the partition columns
    (one file per key, same contract as ``write_partitioned``); without it
    rows round-robin across the computed task count.
    """
    import math
    import os
    import shutil

    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    out = df.repartition(*partition_by) if partition_by else df.repartition(n)
    writer = out.write.mode("overwrite").option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    old = path.rstrip("/") + "__precompact"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_by: str,
    n_buckets: int = 16,
    sort_by: str | None = None,
) -> None:
    """Bucketed managed table: rows hash-distributed into n_buckets files
    BY THE JOIN KEY at write time. Two tables bucketed the same way
    join WITHOUT a shuffle — the exchange that usually dominates a big
    fact-fact join simply disappears from the plan (asserted in
    tests/test_plan_shapes.py). At 100 TB this is how repeat joins on the
    same key amortize: pay the distribution once at ingest, never again.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(name)
