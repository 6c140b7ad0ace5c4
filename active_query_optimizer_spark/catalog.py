"""Catalog: load the star-schema parquet tables of a scale-factor directory
and register them as temp views.

Mirrors the reference's catalog introspection over ``information_schema``
(``pg.py:72-85`` in the reference) — there the schema lives in a running
PostgreSQL; here it is discovered from parquet footers at read time.

Scale note: ``spark.read.parquet`` yields a ``FileSourceScanExec`` with
predicate pushdown + column pruning; at 100 TB the same call simply sees more
files/row-groups — no code change. We deliberately do NOT cache/persist here:
correctness queries each read a pruned column subset, and caching would
materialize full-width rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table of the star schema as a DataFrame.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which vanilla Spark
    refuses to read; we read nanos as long (legacy conf) and rebuild a
    microsecond TimestampType column — same wall-clock values DuckDB sees.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # integer division: float division of int64 nanos exceeds the
            # 53-bit double mantissa and rounds off microseconds
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Read several tables; skips names whose parquet file is absent."""
    out: dict[str, DataFrame] = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view (for the SQL API)."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def load_for_compute(spark: SparkSession, sf_dir: str, name: str,
                     key: str) -> DataFrame:
    """Load a table and spread it across the cluster for CPU-heavy per-row
    derivations (shingling, hashing, vector math).

    Parquet splits by file/row-group, so a small-file table arrives in a
    handful of partitions no matter how many cores exist — at sf0.1 the
    5000-row documents table is ONE task. Expression cost per row here is
    orders of magnitude above scan cost, so we explicitly hash-repartition
    on the key to ``defaultParallelism``. At 100 TB the same call simply
    becomes a cheap even-out of whatever the scan produced (AQE coalesces
    it back if the downstream is shuffle-bound anyway).
    """
    df = load_table(spark, sf_dir, name)
    return df.repartition(spark.sparkContext.defaultParallelism, key)


def table_columns(spark: SparkSession, sf_dir: str) -> dict[str, list[str]]:
    """``{table: [column, ...]}`` — the analog of the reference's
    ``get_column_names`` (``pg.py:80-85``), read from parquet schemas."""
    return {name: df.columns for name, df in load_tables(spark, sf_dir).items()}
