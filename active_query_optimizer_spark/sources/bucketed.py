"""Bucketed-table support: co-located joins without a shuffle.

At 100 TB the lineitem–orders spine join is the single biggest exchange in
the workload. Writing both tables bucketed by the join key
(``df.write.bucketBy(n, key)``) pre-shuffles them ONCE at ingest; every
subsequent join on that key then reads co-located buckets and Catalyst
plans a SortMergeJoin with **no Exchange on either side** (asserted in
``tests/test_bucketed.py``). This is the ingest-time partitioning strategy
the scale notes (SCALE.md) prescribe for repeatedly-joined fact tables;
Spark persists bucket metadata in the session catalog (saveAsTable), which
is how the planner learns the co-location.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table


def write_bucketed(spark: SparkSession, sf_dir: str, table: str, key: str,
                   n_buckets: int = 8, name: str | None = None) -> str:
    """Write ``table`` bucketed+sorted by ``key`` into the session catalog;
    returns the catalog table name. Sorting within buckets additionally
    lets the merge join skip its sort."""
    name = name or f"{table}_by_{key}"
    (load_table(spark, sf_dir, table)
     .write.mode("overwrite")
     .bucketBy(n_buckets, key).sortBy(key)
     .format("parquet")
     .saveAsTable(name))
    return name


def bucketed_join(spark: SparkSession, left: str, right: str,
                  left_key: str, right_key: str) -> DataFrame:
    """Join two same-bucket-count catalog tables on their bucket keys —
    the co-located join the bucketing paid for."""
    lt, rt = spark.table(left), spark.table(right)
    return lt.join(rt, lt[left_key] == rt[right_key])
