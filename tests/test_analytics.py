"""Semantic invariants for the event-analytics / kNN / token-frequency /
semantic-clustering operators (oracle parity itself is covered by
test_relational's registry sweep)."""

from __future__ import annotations

from pyspark.sql import functions as F

from active_query_optimizer_spark.operators import QUERIES

from .conftest import SF_SMALL


def test_funnel_counts_monotone_non_increasing(spark):
    """A strict-order funnel can only lose users at each stage."""
    rows = sorted(QUERIES["event_funnel_steps"](spark, SF_SMALL).collect(),
                  key=lambda r: r["step"])
    counts = [r["n_users"] for r in rows]
    assert [r["stage"] for r in rows] == ["signup", "view", "click",
                                          "purchase"]
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts
    assert counts[0] > 0


def test_funnel_respects_order_not_presence(spark):
    """A user with all four event types but a purchase BEFORE their first
    qualifying click must not count at the purchase step — rebuild the
    stage sets driver-side and compare."""
    from active_query_optimizer_spark.catalog import load_table

    ev = load_table(spark, SF_SMALL, "events").select(
        "user_id", "ts", "event_type").collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["event_type"]))
    stages = ("signup", "view", "click", "purchase")
    expected = [0, 0, 0, 0]
    for _, evs in by_user.items():
        evs.sort()
        t_prev = None
        for i, stage in enumerate(stages):
            cand = [t for t, typ in evs if typ == stage
                    and (t_prev is None or t >= t_prev)]
            if not cand:
                break
            expected[i] += 1
            t_prev = min(cand)
    got = {r["step"]: r["n_users"]
           for r in QUERIES["event_funnel_steps"](spark, SF_SMALL).collect()}
    assert [got[i + 1] for i in range(4)] == expected


def test_cohort_retention_week0_covers_all_users(spark):
    """Every user is active in their own cohort week, so summing week-0
    cells over cohorts equals the number of distinct users; offsets are
    never negative."""
    from active_query_optimizer_spark.catalog import load_table

    ret = QUERIES["cohort_retention_weekly"](spark, SF_SMALL).collect()
    assert all(r["week_offset"] >= 0 for r in ret)
    week0 = sum(r["n_users"] for r in ret if r["week_offset"] == 0)
    n_users = (load_table(spark, SF_SMALL, "events")
               .select("user_id").distinct().count())
    assert week0 == n_users


def test_knn_vote_shape_and_vote_bounds(spark):
    from active_query_optimizer_spark.operators.similarity import (
        N_QUERIES, TOP_K)

    rows = QUERIES["knn_label_vote"](spark, SF_SMALL).collect()
    assert len(rows) == N_QUERIES            # exactly one prediction each
    assert all(1 <= r["n_votes"] <= TOP_K for r in rows)
    assert all(0 <= r["predicted_label"] <= 9 for r in rows)


def test_token_freq_score_bounds(spark):
    """min ≤ avg ≤ sum; every token occurs at least once (its own
    occurrence), so min_token_freq ≥ 1 and avg ≥ 1."""
    rows = QUERIES["quality_token_freq_score"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["n_tokens"] > 0
        assert 1 <= r["min_token_freq"] <= r["avg_token_freq"]
        assert abs(r["avg_token_freq"] * r["n_tokens"]
                   - r["sum_token_freq"]) < 1e-6 * r["sum_token_freq"]


def test_embedding_clusters_consistent_with_pairs(spark):
    """Both endpoints of every near-dup pair land in one cluster; cluster
    ids are the component-minimum vec_id; survivors are exactly the ids
    equal to their cluster id."""
    clusters = {r["vec_id"]: r["cluster_id"] for r in
                QUERIES["dedup_embedding_clusters"](spark, SF_SMALL).collect()}
    pairs = QUERIES["dedup_embedding_cosine"](spark, SF_SMALL).collect()
    for p in pairs:
        assert clusters[p["vec_a"]] == clusters[p["vec_b"]], p
    assert all(cid <= vid for vid, cid in clusters.items())
    assert all(clusters[cid] == cid for cid in clusters.values())


def test_length_percentiles_ordered(spark):
    for r in QUERIES["stats_length_percentiles"](spark, SF_SMALL).collect():
        assert r["p50_chars"] <= r["p90_chars"] <= r["p99_chars"]
        assert r["n_docs"] > 0


def test_cross_source_overlap_bounded_by_distinct_fps(spark):
    """n_shared for (a,b) can never exceed either source's distinct
    fingerprint count; pairs are emitted once with source_a < source_b."""
    from active_query_optimizer_spark.catalog import load_table

    per_source = {
        r["source"]: r["n_fps"]
        for r in QUERIES["text_fingerprint"](spark, SF_SMALL)
        .join(load_table(spark, SF_SMALL, "documents")
              .select("doc_id", "source"), "doc_id")
        .groupBy("source").agg(F.count_distinct("fp").alias("n_fps"))
        .collect()}
    rows = QUERIES["cross_source_overlap"](spark, SF_SMALL).collect()
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0 < r["n_shared"] <= min(per_source[r["source_a"]],
                                        per_source[r["source_b"]])
