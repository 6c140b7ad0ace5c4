"""Plan-shape regression net: the 100 TB story lives in the physical plans
(pushdown, pruning, broadcast choice, partial aggregation, no accidental
cross products). These assertions freeze the shapes the round-1/2 plan
audits verified by hand, so a refactor that silently degrades a plan fails
CI instead of the next scale-up.

Plans are inspected pre-execution (the AQE initial plan) — shape checks
need no data to run."""

from __future__ import annotations

import pytest

from active_query_optimizer_spark.operators import QUERIES

from .conftest import SF_SMALL

#: queries whose nested-loop / cross-product shape is the documented design
NESTED_LOOP_BY_DESIGN = {
    "nested_loop_theta_count",    # the §2.A Nested Loop operator itself
    "dedup_embedding_cosine",     # bounded all-pairs correctness baseline
    "ann_cosine_topk",            # broadcast query set × corpus exact scan
    "knn_label_vote",             # composes ann_cosine_topk's exact scan
    "range_join_value_bands",     # broadcast interval join (small bands)
    # single-ROW broadcast scalar frames (a global aggregate joined onto
    # every row) — the BroadcastNestedLoopJoin is 1 row × n, i.e. the
    # cheapest possible way to ship a global scalar to every task
    "sample_weighted_mix",        # global feasible-total scalar
    "sample_temperature_mixture", # global weight-sum + feasible-total
                                  # scalars (same class as weighted_mix)
    "stats_histogram_equiwidth",  # global (min,max) bounds scalar
    "embedding_outlier_flags",    # global norm-moments scalar frame
    # generated-spine completion: hour sequence × distinct type domain —
    # a cross join of two tiny GENERATED frames (thousands of rows),
    # never of scanned data
    "events_resample_hourly_gapfill",
    # single-row × single-row result assembly: two scalar aggregates
    # (edge count, triangle count) cross-joined into one output row
    "graph_triangle_count",
    # single-row global-average bar broadcast onto every customer row
    # (the same scalar-frame pattern as sample_weighted_mix)
    "tpch_q22_lapsed_high_balance",
    # single-row global-MAX frame broadcast onto the per-supplier revenue
    # aggregate (Q15's scalar subquery over its own view)
    "tpch_q15_top_supplier",
    # broadcast interval join of the tiny observed-day spine onto the
    # collapsed (day, user) pairs — the ≤7× sliding-window fan-out, never
    # a join of scanned fact data (same class as range_join_value_bands)
    "events_trailing_7d_active_users",
    # single-row grand-total frame broadcast onto the per-part aggregate
    # (Q11's HAVING-against-scalar-subquery bar)
    "tpch_q11_important_parts",
    # broadcast k-row seed-centroid frame × corpus — the deliberate
    # k-fanout of Lloyd assignment (same class as ann_cosine_topk's
    # broadcast query set)
    "embedding_kmeans_step",
}


def _plan(spark, name: str) -> str:
    return (QUERIES[name](spark, SF_SMALL)
            ._jdf.queryExecution().executedPlan().toString())


def test_no_accidental_cross_products(spark):
    """Sweep EVERY registered query: cartesian/broadcast-NL joins may only
    appear in the four documented nested-loop designs."""
    offenders = {}
    for name in QUERIES:
        plan = _plan(spark, name)
        has_nl = ("CartesianProduct" in plan
                  or "BroadcastNestedLoopJoin" in plan)
        if has_nl and name not in NESTED_LOOP_BY_DESIGN:
            offenders[name] = True
    assert not offenders, f"unexpected cross-product plans: {sorted(offenders)}"


def test_scan_filter_pushdown_and_pruning(spark):
    plan = _plan(spark, "scan_filter_count")
    assert "PushedFilters: [" in plan
    # at least one real pushed filter, not an empty list
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert pushed.strip(), "no filters reached the parquet scan"


def test_projection_prunes_read_schema(spark):
    plan = _plan(spark, "projection_join")
    # every scan reads a pruned schema, never the full table width
    for chunk in plan.split("ReadSchema: ")[1:]:
        schema = chunk.splitlines()[0]
        assert len(schema.split(",")) <= 4, f"unpruned scan: {schema}"


def test_flagship_broadcasts_small_dims(spark):
    plan = _plan(spark, "flagship_multijoin_count")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_sevenway_join_is_broadcast_chain(spark):
    """The 7-way star join: small dims broadcast; at most the two big
    fact-side joins shuffle."""
    plan = _plan(spark, "sevenway_join_count")
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 2


def test_pricing_summary_partial_aggregation(spark):
    """Partial+final aggregation (map-side combine) — two HashAggregate
    levels around the exchange."""
    plan = _plan(spark, "pricing_summary")
    assert plan.count("HashAggregate") >= 2, plan


def test_minhash_has_no_hardcoded_candidate_broadcast(spark):
    """Round-1 verdict item: the verification join must not hard-broadcast
    the candidate-pair set (it scales with the corpus). At tiny SF Catalyst
    still *chooses* broadcast from size stats — fine, that's runtime's
    decision; what must be gone is the F.broadcast() hint, which would
    force it at any scale. Hints surface as ResolvedHint nodes in the
    analyzed logical plan."""
    df = QUERIES["dedup_minhash_lsh"](spark, SF_SMALL)
    logical = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in logical, logical
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in physical
    assert "CartesianProduct" not in physical


@pytest.mark.parametrize("name", ["decontam_ngram_overlap"])
def test_decontam_broadcasts_benchmark_side(spark, name):
    plan = _plan(spark, name)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_latest_order_is_aggregate_not_window(spark):
    """max_by must plan as a partial+final hash aggregate — NO window
    operator and NO sort: that's the whole point of the arg-max
    aggregation over the window-rank idiom."""
    plan = _plan(spark, "latest_order_per_customer")
    assert "Window" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan
    assert "max_by" in plan


def test_null_profile_single_scan_per_table(spark):
    """The null profile reads each table ONCE (count buffers aggregate in
    one pass; unpivot is an Expand over the single aggregate row), so the
    plan has exactly one parquet scan per profiled table."""
    plan = _plan(spark, "stats_null_profile")
    import re
    scans = re.findall(r"Scan parquet|FileScan parquet", plan)
    assert len(scans) == 2, f"expected 2 scans, got {len(scans)}"
    assert "Expand" in plan


def test_upsert_merge_join_shapes(spark):
    """CDC MERGE lowers to the expected relational steps: an anti join
    (deletes) and a left outer join (updates) on the snapshot key, plus
    a union for inserts."""
    plan = _plan(spark, "upsert_snapshot_apply")
    assert "LeftAnti" in plan
    assert "LeftOuter" in plan
    assert "Union" in plan


def test_rolling_window_is_single_exchange_range_frame(spark):
    """The RANGE-frame rolling window plans as one hash exchange on the
    partition key + an in-partition sort + a window — specifically a
    RANGE frame (value-distance), not ROWS."""
    plan = _plan(spark, "window_rolling_7day_avg")
    assert "Window" in plan
    assert "RangeFrame" in plan, "frame degraded to RowFrame"
    assert plan.count("Exchange hashpartitioning") == 1
