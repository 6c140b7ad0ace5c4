"""Targeted tests for the lakehouse table-ops family (operators/lakeops.py,
the CDC extensions in operators/cdcops.py) and graph_bfs_hops — properties
the generic oracle-parity sweep can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from active_query_optimizer_spark.operators import QUERIES
from active_query_optimizer_spark.operators.cdcops import cdc_frames
from active_query_optimizer_spark.operators.dedup import graph_bfs_hops
from active_query_optimizer_spark.operators.lakeops import ZORDER_BUCKET_DIV

from .conftest import SF_MED, SF_SMALL


def test_dq_report_exercises_both_statuses(spark):
    """Exactly one constraint (the deliberate freshness bar) fails; the
    other five pass with zero violations — the report must prove the
    fail path works, not just emit six greens."""
    rep = {r.check_name: r for r in
           QUERIES["dq_constraint_report"](spark, SF_MED).collect()}
    assert len(rep) == 6
    fails = {n for n, r in rep.items() if r.status == "fail"}
    assert fails == {"orderdate_before_1999"}
    assert rep["orderdate_before_1999"].violations > 0
    for name in rep:
        if name not in fails:
            assert rep[name].violations == 0, (name, rep[name])


def test_dq_fk_anti_join_is_broadcast(spark):
    """The referential-integrity check's anti-join must broadcast the
    customer side — a shuffled anti-join over the fact table is the
    wrong 100 TB plan."""
    df = QUERIES["dq_constraint_report"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan[:2000]


def test_scd2_history_accounts_for_every_key(spark):
    """SCD2 bookkeeping identities: closed + current rows reconstruct
    both snapshot versions exactly — n_history(v1-era) = |v1| and
    n_current = |v2|."""
    snap, _batch, merged = cdc_frames(spark, SF_SMALL)
    n_v1, n_v2 = snap.count(), merged.count()
    hist = QUERIES["scd2_history_build"](spark, SF_SMALL).collect()
    n_current = sum(r.n_rows for r in hist if r.is_current)
    # v1-era rows: every non-insert history row with valid_from=0 — the
    # aggregate output can't see valid_from, but v1-era == everything
    # except the 'inserted' current rows and the 'updated' current rows
    n_v1_era = sum(r.n_rows for r in hist) - sum(
        r.n_rows for r in hist
        if r.is_current and r.change_type in ("updated", "inserted"))
    assert n_v1_era == n_v1
    assert n_current == n_v2


def test_incremental_agg_equals_merge_then_rescan(spark):
    """The materialized-view identity on the Spark side too: the
    delta-maintained aggregate is row-identical to aggregating the
    merged snapshot (the oracle already pins both to DuckDB; this pins
    them to each other without an engine in between)."""
    inc = {r.status: (r.n_rows, r.sum_cents) for r in
           QUERIES["incremental_agg_maintenance"](spark, SF_SMALL).collect()}
    ups = {r.status: (r.n_rows, r.sum_cents) for r in
           QUERIES["upsert_snapshot_apply"](spark, SF_SMALL).collect()}
    assert inc == ups


def test_zorder_buckets_are_narrow_in_both_dimensions(spark):
    """The data-skipping property: inside every Z-range bucket only the
    low 9 bits of each dimension vary, so both the custkey span and the
    epoch-day span are < 512 — while the table's global spans are far
    wider. A single-column sort would give a narrow span in one
    dimension and the full global span in the other."""
    prof = QUERIES["zorder_layout_profile"](spark, SF_MED).collect()
    assert len(prof) > 4  # genuinely multi-bucket at sf0.01
    for r in prof:
        assert r.max_ck - r.min_ck < 512, r
        assert r.max_day - r.min_day < 512, r
    global_ck = max(r.max_ck for r in prof) - min(r.min_ck for r in prof)
    global_day = max(r.max_day for r in prof) - min(r.min_day for r in prof)
    assert global_ck >= 512 or global_day >= 512
    # ZORDER_BUCKET_DIV is the contract the 512-bound derives from
    assert ZORDER_BUCKET_DIV == 2 ** 18


def test_bfs_local_and_loop_paths_agree(spark):
    """graph_bfs_hops resolves small edge lists driver-side; forcing the
    distributed frontier loop (local_max_edges=0) must produce the
    identical per-hop layer sizes, and hop 0 must equal the seed count
    in both modes."""
    stats_a: dict = {}
    stats_b: dict = {}
    local = {r.hops: r.n_docs for r in
             graph_bfs_hops(spark, SF_SMALL, stats=stats_a).collect()}
    loop = {r.hops: r.n_docs for r in
            graph_bfs_hops(spark, SF_SMALL, local_max_edges=0,
                           stats=stats_b).collect()}
    assert stats_a["mode"] == "local" and stats_b["mode"] == "loop"
    assert local == loop
    n_seeds = (spark.read.parquet(f"{SF_SMALL}/documents.parquet")
               .filter(F.col("doc_id") % 100 == 0).count())
    assert local[0] == n_seeds
