"""Table-maintenance utilities: sorted export and small-files compaction.

Two operational jobs every large-scale table needs that are easy to get
wrong at 100 TB:

- **sorted export** (`write_sorted`): a *globally* ordered parquet layout
  via ``repartitionByRange`` + ``sortWithinPartitions`` — file i's keys
  all precede file i+1's, and rows inside each file are sorted. That is
  the layout sequential trainers and merge-readers want, and it costs ONE
  range shuffle (sampled range bounds), never a single-task global sort.
  A plain ``orderBy().write`` collapses to few tasks right where the data
  is biggest; ``sortWithinPartitions`` alone gives no cross-file order.

- **compaction** (`compact_dir`): rewrite a directory of many small files
  into ``ceil(bytes / target)`` right-sized ones. Small files are an
  operational outage at scale (driver-side listing, per-file open cost,
  row-group fragmentation). ``coalesce`` — NOT ``repartition`` — so the
  rewrite is shuffle-free: it only merges read splits. Statistics-bearing
  layouts (partitioned dirs) should compact per partition directory.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_sorted(df: DataFrame, path: str, sort_cols: list[str],
                 num_files: int = 8) -> None:
    """Write ``df`` as ``num_files`` parquet files globally ordered by
    ``sort_cols``: range-partition on the sort key (one shuffle with
    sampled bounds), sort within each partition (spillable, per-task),
    write one file per partition. Files are named by partition index, so
    lexicographic file order == global key order."""
    cols = [F.col(c) for c in sort_cols]
    (df.repartitionByRange(num_files, *cols)
       .sortWithinPartitions(*cols)
       .write.mode("overwrite").parquet(path))


def _dir_parquet_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes of ``*.parquet`` files under ``path``, via the Hadoop
    FileSystem API — so sizing works on ANY Spark-supported filesystem
    (HDFS, S3A, local), not just driver-local paths. The recursive
    listing is the same metadata call the scan planner makes; its cost is
    file-count-bound, not data-bound."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)
    total = 0
    while it.hasNext():
        st = it.next()
        if st.getPath().getName().endswith(".parquet"):
            total += st.getLen()
    return total


def compact_dir(spark: SparkSession, path: str, out_path: str,
                target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """Compact a parquet directory into ``ceil(total_bytes / target)``
    files with a shuffle-free ``coalesce`` rewrite; returns the output
    file count. Reads the directory's real on-disk size (not row counts —
    compression ratio varies) through the Hadoop FileSystem API, so the
    helper is storage-agnostic (local / HDFS / S3A)."""
    total = _dir_parquet_bytes(spark, path)
    n = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(path).coalesce(n).write.mode(
        "overwrite").parquet(out_path)
    return n


def write_day_partitions(df: DataFrame, path: str,
                         day_col: str = "day") -> None:
    """Publish/refresh day partitions with DYNAMIC partition overwrite:
    only the day directories present in ``df`` are replaced; every other
    partition's files are untouched. This is the incremental-refresh
    contract a daily pipeline needs — a plain ``overwrite`` would drop
    the whole table, and ``append`` would duplicate reprocessed days.
    (Conf is set per-write and restored; the static default stays safe
    for other writers in the session.)"""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                          "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (df.write.mode("overwrite").partitionBy(day_col).parquet(path))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
