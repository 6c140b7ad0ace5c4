"""Focused oracle check: run named queries() entries vs their DuckDB
oracle_sql() at one SF (driver_sim's canonicalization, subset scope).

Usage: python tools/check_queries.py <sf_dir> <query> [<query> ...]
"""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

FAM = {"i": "int", "u": "int", "f": "float", "b": "bool", "M": "dt", "m": "td"}


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)

    def norm(v):
        if isinstance(v, float) and math.isnan(v):
            return None
        if hasattr(v, "tolist") and not isinstance(v, (str, bytes)):
            t = v.tolist()
            return tuple(t) if isinstance(t, list) else t
        if v is pd.NaT or v is None:
            return None
        if isinstance(v, pd.Timestamp):
            return v.to_pydatetime()
        return v

    out = df.apply(lambda c: c.map(norm))
    return out.sort_values(
        by=list(out.columns), key=lambda s: s.map(repr)).reset_index(drop=True)


def main() -> None:
    sf = sys.argv[1]
    names = sys.argv[2:]
    spark = (SparkSession.builder.master("local[8]")
             .appName("check-queries")
             .config("spark.sql.session.timeZone", "America/New_York")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E
    qs, osql = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    bad = []
    for name in names:
        sp = qs[name](spark, sf).toPandas()
        if name not in osql:
            print(f"  {name}: rows-only ({len(sp)})")
            continue
        du = con.execute(osql[name]).fetchdf()
        ok = (sorted(sp.columns) == sorted(du.columns) and len(sp) == len(du))
        why = "" if ok else f"shape {sp.shape} vs {du.shape}"
        if ok and len(sp):
            for c in sp.columns:
                fa = FAM.get(sp[c].dtype.kind, "obj")
                fb = FAM.get(du[c].dtype.kind, "obj")
                if fa != "obj" and fb != "obj" and fa != fb:
                    ok = False
                    why = f"dtype {c}: {sp[c].dtype} vs {du[c].dtype}"
                    break
        if ok:
            a, b = canon(sp), canon(du)
            ok = all(list(a[c]) == list(b[c]) for c in a.columns)
            if not ok:
                why = "values"
        print(("  OK  " if ok else f"  FAIL[{why}]") + f" {name}")
        if not ok:
            bad.append(name)
    print("FAILURES:", bad if bad else "none")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
