"""Change-data-capture table maintenance: MERGE/upsert semantics on plain
parquet-backed frames — the operation every incrementally-maintained
snapshot table needs (apply a change batch of inserts/updates/deletes to
the previous snapshot), expressed without a transactional table format:
an anti-join (deletes) + a left join (updates) + a union (inserts), which
is exactly the relational algebra a MERGE statement lowers to.

The change batch here is derived deterministically from the snapshot
itself (key % 7 slice; action = key % 3) so the operator has an exact
DuckDB oracle; in production the batch comes from a CDC feed with an
explicit action column and before-images — the plans are identical.

The family built on that batch:

- ``upsert_snapshot_apply`` — MERGE + summarize the merged table;
- ``scd2_history_build`` — slowly-changing-dimension Type-2 versioning
  from two snapshot versions (full-outer diff → history rows);
- ``incremental_agg_maintenance`` — maintain a per-status aggregate from
  the base aggregate + CDC deltas only, never rescanning the snapshot;
  the oracle IS the full recompute, so the green row proves
  delta-maintenance ≡ recompute.

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

#: shared oracle CTEs: snapshot → carved change batch → merged snapshot
_CDC_CTES = f"""
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
"""

_MERGED_SUMMARY = """
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM merged GROUP BY status
"""


def cdc_frames(spark: SparkSession, sf_dir: str
               ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """``(snap, batch, merged)`` — the snapshot, the carved change batch
    (with before-image columns and an ``action`` code: 0=update,
    1=delete, 2=insert), and the post-MERGE snapshot.

    Scale: one shuffle family on the snapshot key covers all three merge
    steps (the anti and left joins share the key; at 100 TB bucketing
    the snapshot by key makes every incremental apply co-located and
    shuffle-free on the big side — the batch side is the small one and
    broadcasts)."""
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
    return snap, batch, merged


@register("upsert_snapshot_apply", oracle=_CDC_CTES + _MERGED_SUMMARY)
def upsert_snapshot_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC change batch (inserts / updates / deletes) to the
    orders snapshot and summarize the merged table per status — MERGE
    semantics as three relational steps:

    - **delete**: ``left_anti`` join on the batch's delete keys;
    - **update**: left join on the update keys, ``coalesce`` picking the
      new value (10% price uplift, integer cents);
    - **insert**: union of the remapped insert rows (status ``'NEW'``).

    The summary aggregate bounds the driver output; the production form
    writes ``merged`` back via the curated sink's bounded-files path
    instead. Scale notes in :func:`cdc_frames`."""
    _snap, _batch, merged = cdc_frames(spark, sf_dir)
    return (merged.groupBy("status")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("cents").cast("bigint").alias("sum_cents")))


@register(
    "scd2_history_build",
    oracle=_CDC_CTES + """
    , diff AS (
      SELECT COALESCE(a.k, b.k) AS k,
             a.k IS NOT NULL AS in_v1, b.k IS NOT NULL AS in_v2,
             a.status AS s1, a.cents AS c1,
             b.status AS s2, b.cents AS c2
      FROM snap a FULL OUTER JOIN merged b ON a.k = b.k
    ), classified AS (
      SELECT *,
             CASE WHEN in_v1 AND in_v2 AND s1 = s2 AND c1 = c2
                    THEN 'unchanged'
                  WHEN in_v1 AND in_v2 THEN 'updated'
                  WHEN in_v1 THEN 'deleted'
                  ELSE 'inserted' END AS change_type
      FROM diff
    ), hist AS (
      SELECT k, s1 AS status, c1 AS cents,
             CAST(0 AS BIGINT) AS valid_from,
             CASE WHEN change_type = 'unchanged' THEN NULL
                  ELSE CAST(1 AS BIGINT) END AS valid_to,
             change_type
      FROM classified WHERE in_v1
      UNION ALL
      SELECT k, s2, c2, CAST(1 AS BIGINT), CAST(NULL AS BIGINT),
             change_type
      FROM classified WHERE change_type IN ('updated', 'inserted')
    )
    SELECT change_type, (valid_to IS NULL) AS is_current,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM hist GROUP BY change_type, is_current
    """,
)
def scd2_history_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension **Type 2** history from two snapshot
    versions (v1 = the snapshot, v2 = the post-MERGE snapshot): a
    full-outer diff on the key classifies every key as unchanged /
    updated / deleted / inserted, then expands into validity-versioned
    history rows —

    - every v1-era row (closed with ``valid_to = 1`` unless unchanged);
    - a new current row for updated and inserted keys.

    The judge-facing result aggregates the history per (change_type,
    is_current) with row counts and integer-cents sums; the production
    form writes ``hist`` as the versioned dimension table.

    Scale: the full-outer join shares the merge's key partitioning (one
    exchange family end-to-end); full outer can never broadcast, but
    both sides are key-bucketed dimension snapshots, not facts. The
    history expansion is a map-only ``explode`` of a per-key row array —
    ONE pass over the joined frame (a union of two filtered projections
    would execute the full-outer join twice; the plan test pins the
    single-join shape)."""
    snap, _batch, merged = cdc_frames(spark, sf_dir)
    v1 = snap.select(F.col("k"), F.col("status").alias("s1"),
                     F.col("cents").alias("c1"),
                     F.lit(True).alias("in_v1"))
    v2 = merged.select(F.col("k"), F.col("status").alias("s2"),
                       F.col("cents").alias("c2"),
                       F.lit(True).alias("in_v2"))
    diff = (v1.join(v2, "k", "full")
            .select("k", "s1", "c1", "s2", "c2",
                    F.coalesce("in_v1", F.lit(False)).alias("in_v1"),
                    F.coalesce("in_v2", F.lit(False)).alias("in_v2")))
    ct = (F.when(F.col("in_v1") & F.col("in_v2")
                 & (F.col("s1") == F.col("s2"))
                 & (F.col("c1") == F.col("c2")), "unchanged")
          .when(F.col("in_v1") & F.col("in_v2"), "updated")
          .when(F.col("in_v1"), "deleted")
          .otherwise("inserted"))
    classified = diff.withColumn("change_type", ct)
    # one history-row struct array per key, exploded in the same pass —
    # NOT a union of filtered projections (that plan runs the full-outer
    # join once per branch)
    row = ("named_struct('status', {s}, 'cents', {c}, "
           "'valid_from', cast({f} as bigint), "
           "'valid_to', cast({t} as bigint))")
    v1_closed = row.format(s="s1", c="c1", f=0, t=1)
    v1_open = row.format(s="s1", c="c1", f=0, t="null")
    v2_open = row.format(s="s2", c="c2", f=1, t="null")
    hist = (classified.select(
        "k", "change_type",
        F.explode(F.expr(f"""
            CASE change_type
              WHEN 'unchanged' THEN array({v1_open})
              WHEN 'updated'  THEN array({v1_closed}, {v2_open})
              WHEN 'deleted'  THEN array({v1_closed})
              ELSE array({v2_open})
            END""")).alias("h"))
        .select("k", "change_type", "h.status", "h.cents",
                "h.valid_from", "h.valid_to"))
    return (hist.groupBy("change_type",
                         F.col("valid_to").isNull().alias("is_current"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("cents").cast("bigint").alias("sum_cents")))


@register("incremental_agg_maintenance", oracle=_CDC_CTES + _MERGED_SUMMARY)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain the per-status ``(n_rows, sum_cents)`` aggregate
    **incrementally**: fold the CDC batch's deltas into the base
    aggregate instead of rescanning the snapshot —

    - update: ``(status, +0 rows, new_cents - old_cents)``;
    - delete: ``(status, -1 row, -old_cents)``;
    - insert: ``('NEW', +1 row, +cents)``.

    The oracle is the FULL RECOMPUTE over the merged snapshot (same SQL
    as ``upsert_snapshot_apply``), so the hash-green row proves the
    delta maintenance is exact — the materialized-view maintenance
    identity ``agg(base) ⊕ Δ(batch) = agg(merge(base, batch))``.

    Scale: the snapshot is touched ONCE (for the base aggregate, which a
    production system already has materialized — then the cost is the
    batch only), and the batch ONCE (every change row maps to exactly
    one delta row via conditional expressions — no per-action filtered
    branches, which would scan the batch three times). No join at all:
    two aggregate passes unioned on a 25-value grouping key. At 100 TB
    vs the MERGE-then-rescan plan this replaces a full-snapshot shuffle
    with a batch-sized one."""
    snap, batch, _merged = cdc_frames(spark, sf_dir)
    base = (snap.groupBy("status")
            .agg(F.count(F.lit(1)).cast("bigint").alias("dn"),
                 F.sum("cents").cast("bigint").alias("dc")))
    deltas = batch.select(
        F.when(F.col("action") == 2, F.lit("NEW"))
         .otherwise(F.col("status")).alias("status"),
        F.when(F.col("action") == 0, 0)
         .when(F.col("action") == 1, -1)
         .otherwise(1).cast("bigint").alias("dn"),
        F.when(F.col("action") == 0,
               F.expr("cents * 11 div 10") - F.col("cents"))
         .when(F.col("action") == 1, -F.col("cents"))
         .otherwise(F.col("cents")).cast("bigint").alias("dc"))
    return (base.unionByName(deltas).groupBy("status")
            .agg(F.sum("dn").cast("bigint").alias("n_rows"),
                 F.sum("dc").cast("bigint").alias("sum_cents"))
            .filter(F.col("n_rows") > 0))
