"""Change-data-capture table maintenance: MERGE/upsert semantics on plain
parquet-backed frames — the operation every incrementally-maintained
snapshot table needs (apply a change batch of inserts/updates/deletes to
the previous snapshot), expressed without a transactional table format:
an anti-join (deletes) + a left join (updates) + a union (inserts), which
is exactly the relational algebra a MERGE statement lowers to.

The change batch here is derived deterministically from the snapshot
itself (key % 7 slice; action = key % 3) so the operator has an exact
DuckDB oracle; in production the batch comes from a CDC feed with an
explicit action column — the plan is identical.

Money arithmetic is integer cents end-to-end (``decimal(18,2) * 100 →
bigint``; the 10% uplift is ``* 11 div 10``) so both engines agree
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register

#: change-batch carving: every 7th key is in the batch; action by key % 3
CDC_BATCH_MOD = 7
#: insert keys are remapped far above the live key range
CDC_INS_OFFSET = 1_000_000_000

_CENTS = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"


@register(
    "upsert_snapshot_apply",
    oracle=f"""
    WITH snap AS (
      SELECT o_orderkey AS k, o_orderstatus AS status,
             {_CENTS} AS cents
      FROM orders
    ), batch AS (
      SELECT k, status, cents, k % 3 AS action FROM snap
      WHERE k % {CDC_BATCH_MOD} = 0
    ), merged AS (
      SELECT s.k,
             COALESCE(u.status, s.status) AS status,
             COALESCE(u.cents * 11 // 10, s.cents) AS cents
      FROM snap s
      LEFT JOIN (SELECT k, status, cents FROM batch WHERE action = 0) u
        ON s.k = u.k
      WHERE NOT EXISTS (SELECT 1 FROM batch d
                        WHERE d.action = 1 AND d.k = s.k)
      UNION ALL
      SELECT k + {CDC_INS_OFFSET}, 'NEW', cents
      FROM batch WHERE action = 2
    )
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM merged GROUP BY status
    """,
)
def upsert_snapshot_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC change batch (inserts / updates / deletes) to the
    orders snapshot and summarize the merged table per status — MERGE
    semantics as three relational steps:

    - **delete**: ``left_anti`` join on the batch's delete keys;
    - **update**: left join on the update keys, ``coalesce`` picking the
      new value (10% price uplift, integer cents);
    - **insert**: union of the remapped insert rows (status ``'NEW'``).

    Scale: one shuffle family on the snapshot key covers all three steps
    (the anti and left joins share the key; at 100 TB bucketing the
    snapshot by key makes every incremental apply co-located and
    shuffle-free on the big side — the batch side is the small one and
    broadcasts). The summary aggregate bounds the driver output; the
    production form writes ``merged`` back via the curated sink's
    bounded-files path instead."""
    o = load_table(spark, sf_dir, "orders")
    snap = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.expr(f"cast({_CENTS} as bigint)").alias("cents"))
    batch = (snap.filter(F.col("k") % CDC_BATCH_MOD == 0)
             .withColumn("action", F.col("k") % 3))
    upd = (batch.filter(F.col("action") == 0)
           .select("k", F.col("status").alias("u_status"),
                   F.expr("cents * 11 div 10").alias("u_cents")))
    dels = batch.filter(F.col("action") == 1).select("k")
    ins = (batch.filter(F.col("action") == 2)
           .select((F.col("k") + CDC_INS_OFFSET).alias("k"),
                   F.lit("NEW").alias("status"), "cents"))
    merged = (snap.join(dels, "k", "left_anti")
              .join(upd, "k", "left")
              .select("k",
                      F.coalesce("u_status", "status").alias("status"),
                      F.coalesce("u_cents", "cents").alias("cents"))
              .unionByName(ins))
    return (merged.groupBy("status")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("cents").cast("bigint").alias("sum_cents")))
