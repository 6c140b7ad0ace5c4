"""Registry of judge-facing queries and their DuckDB oracle SQL.

Every operator from SURVEY.md §2 that we claim as implemented registers
itself here: a callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) an equivalent ANSI-SQL string DuckDB can run over the same
parquet tables. ``__spark_entry__.py`` exposes this registry to the driver.

Hash-match discipline (the driver sorts columns by name, then value-hashes):
- alias every computed column identically in the Spark code and the oracle;
- make double-typed outputs bit-deterministic (sum via DECIMAL then cast
  back to DOUBLE; single final division for averages);
- every LIMIT carries a total order with a unique tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and optional DuckDB oracle) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco
