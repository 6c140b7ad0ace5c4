"""Generate an sf1 rehearsal slice (10x sf0.1) for local scale testing.

The driver's testdata stops at sf0.1; round-5 verdict #5 asks for a local
sf1 rehearsal to catch cliffs sf0.1 hides (candidate-pair growth in the
similarity joins, AQE broadcast flips on the de-hinted decision queries,
spine growth in the events family). This produces ``testdata_sf1/`` next
to the repo root by replicating every SF-growing sf0.1 table 10x with
key-shifted copies — deterministic, no RNG:

- ``region``/``nation`` stay fixed (TPC-H semantics: dims don't scale);
- every key column (PK and FK alike) shifts by ``copy * SHIFT`` so each
  copy joins within itself — join fan-outs and group cardinalities scale
  exactly linearly;
- ``documents.text`` goes through a per-copy letter-substitution cipher
  (alphabet rotation by the copy index; copy 0 is verbatim). A bijective
  character map preserves every within-copy similarity structure EXACTLY
  — token sets, character n-gram shingle sets, lengths — while making
  the shingle/token spaces of different copies DISJOINT, so the near-dup
  structure of the original corpus repeats once per copy (pair counts
  scale ~10x linearly) instead of every copied doc forming a 10-clique
  with its siblings (~100x explosion). The first attempt suffixed
  ``~{copy}`` onto every token, which kept within-token CHARACTER
  5-grams identical across copies — the dedup family shingles at the
  character level, so cross-copy Jaccard stayed high and the rehearsal
  measured a 3,000x bucket-join blowup that was an artifact of the
  generator, not of the operators; ``n_chars`` is length-preserved;
- ``embeddings.embedding`` gets a small per-copy deterministic offset so
  copies are near but not exact duplicates (ANN top-k stays non-trivial).

Correctness at sf1 is NOT the point (no oracles run here — the sf0.01
driver gate owns correctness); plan shape and throughput are. Written
with DuckDB (vectorized, writes the same parquet types Spark reads;
``events.ts`` stays timestamp[us] exactly like the sf0.1 original).

Usage: ``python tools/make_sf1.py [outdir]`` (default
``<repo>/testdata_sf1``; ~10x sf0.1 on disk, gitignored).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
SHIFT = 100_000_000
COPIES = 10

#: per-table key columns to shift by copy*SHIFT (PKs and FKs together —
#: nationkey/regionkey deliberately absent: those dims don't scale)
KEY_SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


_ALPHA = "abcdefghijklmnopqrstuvwxyz"


_DIGITS = "0123456789"


def _cipher(k: int) -> tuple[str, str]:
    """Per-copy substitution alphabet: rotate lowercase, uppercase and
    digits by ``k`` (bijective — see module docstring; digits included
    because number-heavy shingles would otherwise still collide across
    copies)."""
    lo = _ALPHA[k:] + _ALPHA[:k]
    dg = _DIGITS[k:] + _DIGITS[:k]
    return (_ALPHA + _ALPHA.upper() + _DIGITS,
            lo + lo.upper() + dg)


def _copy_select(table: str, cols: list[tuple[str, str]], k: int) -> str:
    shifted = set(KEY_SHIFTS[table])
    exprs = []
    for name, _typ in cols:
        if name in shifted:
            exprs.append(f"{name} + {k * SHIFT} AS {name}")
        elif table == "documents" and name == "text" and k > 0:
            # disjoint shingle/token space per copy (see module docstring)
            src, dst = _cipher(k)
            exprs.append(f"translate(text, '{src}', '{dst}') AS text")
        elif table == "embeddings" and name == "embedding" and k > 0:
            # 2k-9 is odd for k in 1..9 — never zero, so no copy is an
            # exact duplicate of the original vectors
            exprs.append(
                f"list_transform(embedding, x -> CAST(x + ({2 * k - 9}) * "
                f"0.00055 AS FLOAT)) AS embedding")
        else:
            exprs.append(name)
    return f"SELECT {', '.join(exprs)} FROM src"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_sf1")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table in ("region", "nation"):
        con.sql(f"COPY (SELECT * FROM read_parquet('{SRC}/{table}.parquet'))"
                f" TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        print(f"{table}: copied fixed dim")
    for table, _keys in KEY_SHIFTS.items():
        con.sql(f"CREATE OR REPLACE VIEW src AS "
                f"SELECT * FROM read_parquet('{SRC}/{table}.parquet')")
        cols = [(r[0], r[1]) for r in con.sql("DESCRIBE src").fetchall()]
        union = " UNION ALL ".join(
            _copy_select(table, cols, k) for k in range(COPIES))
        con.sql(f"COPY ({union}) TO '{out}/{table}.parquet' "
                f"(FORMAT PARQUET, ROW_GROUP_SIZE 122880)")
        n = con.sql(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
