"""Vector math over ``array<float>`` embedding columns — dual-rendered
(Spark Columns / DuckDB SQL) like ``texttools``.

Everything is built-in higher-order functions (``zip_with`` + ``aggregate``)
— JVM-side, no Python in the loop. Elements are cast to double *before*
multiplication and folded strictly left-to-right in both engines, so cosine
values are bit-identical and safe to value-hash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def dot_sql(a: str, b: str) -> str:
    return (f"list_sum([CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
            f"for i in range(1, len({a}) + 1)])")


def norm2(a: Column) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def norm2_sql(a: str) -> str:
    return (f"sqrt(list_sum([CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE) "
            f"for i in range(1, len({a}) + 1)]))")


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm2(a) * norm2(b))


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm2_sql(a)} * {norm2_sql(b)}))"
