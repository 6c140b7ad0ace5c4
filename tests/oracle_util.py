"""Local replica of the driver's DuckDB-oracle comparison: row count,
schema (column names), and an order-insensitive value comparison after
sorting columns by name. Strict equality — if this passes, the driver's
value-hash should match."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from active_query_optimizer_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize cell values to hashable canonical forms
    def norm(v):
        if isinstance(v, float) and math.isnan(v):
            return None
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        if hasattr(v, "tolist") and not isinstance(v, (str, bytes)):
            t = v.tolist()
            return tuple(norm(x) for x in t) if isinstance(t, list) else norm(t)
        if v is pd.NaT or v is None:
            return None
        if isinstance(v, pd.Timestamp):
            return v.to_pydatetime()
        return v

    out = df.apply(lambda col: col.map(norm))
    return out.sort_values(by=list(out.columns), key=lambda s: s.map(repr)).reset_index(drop=True)


def compare(spark_df, oracle_df: pd.DataFrame, name: str = "?") -> None:
    sp = spark_df.toPandas()
    assert sorted(sp.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch {sorted(sp.columns)} vs {sorted(oracle_df.columns)}")
    assert len(sp) == len(oracle_df), (
        f"{name}: row count {len(sp)} vs {len(oracle_df)}")
    a, b = _canon(sp), _canon(oracle_df)
    for col in a.columns:
        av, bv = list(a[col]), list(b[col])
        assert av == bv, (
            f"{name}: value mismatch in column {col}:\n"
            f" spark : {av[:5]}...\n duckdb: {bv[:5]}...")
