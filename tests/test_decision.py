"""Targeted tests for the decision-support set II (operators/decision.py)
and the round-4b text/stats/sampling additions — properties the generic
oracle-parity sweep can't express."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from active_query_optimizer_spark.operators import QUERIES

from .conftest import SF_SMALL


def test_levenshtein_semantics_match_duckdb(spark):
    """text_edit_distance_pairs relies on Spark and DuckDB computing the
    SAME Levenshtein distance. Pin the agreement on the tricky classes:
    empty strings, equal strings, pure insert/delete, substitution mixes,
    case sensitivity, and whitespace runs."""
    pairs = [("kitten", "sitting"), ("flaw", "lawn"), ("", "abc"),
             ("abc", ""), ("same", "same"), ("Hello World", "hello  world"),
             ("a b c d", "abcd"), ("aaaa", "aa"), ("ab", "ba")]
    df = spark.createDataFrame(pairs, ["a", "b"]).select(
        "a", "b", F.levenshtein("a", "b").alias("d"))
    got = {(r.a, r.b): r.d for r in df.collect()}
    con = duckdb.connect()
    for a, b in pairs:
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert got[(a, b)] == want, (a, b, got[(a, b)], want)


def test_q13_distribution_covers_every_customer(spark):
    """The Q13 outer-join trap: putting the priority filter in WHERE
    instead of the JOIN condition silently drops zero-match customers.
    The distribution must therefore account for EVERY customer exactly
    once — sum(custdist) == |customer|."""
    dist = QUERIES["tpch_q13_customer_distribution"](spark, SF_SMALL)
    total = dist.agg(F.sum("custdist")).collect()[0][0]
    n_cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet").count()
    assert total == n_cust


def test_q20_prefix_like_pushed_to_scan(spark):
    """p_name LIKE 'small%' is a prefix pattern — it must reach the part
    parquet scan as a StringStartsWith pushed filter, not run as a
    post-scan residual only."""
    df = QUERIES["tpch_q20_promo_volume_suppliers"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "StartsWith" in plan, plan[:2000]


def test_q8_dimension_joins_all_broadcast(spark):
    """Q8 joins eight tables; every dimension (part semi, nation x2,
    region semi, supplier) must be on a broadcast build side so the fact
    flows through one chain — at least four broadcast joins, and never a
    shuffled join against nation/region (bounded dims)."""
    df = QUERIES["tpch_q8_market_share"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 4, plan[:3000]


def test_q21_single_orderkey_exchange_family(spark):
    """Q21's decorrelated form keys BOTH aggregates and the re-join on
    l_orderkey — the physical plan must not hash-partition the fact on
    any other join key (the textbook 3-self-join form would)."""
    import re

    df = QUERIES["tpch_q21_waiting_supplier"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lead_keys = set(re.findall(r"hashpartitioning\((\w+)#", plan))
    # every fact-side exchange leads with l_orderkey; the only other
    # partitioning is the final tiny supplier-side grouping
    assert lead_keys <= {"l_orderkey", "s_suppkey"}, (lead_keys, plan[:2000])


def test_q15_keeps_all_max_ties(spark):
    """Q15's selection is revenue == MAX(revenue) over EXACT decimals —
    every supplier at the max must survive (no arbitrary top-1). Verify
    against an independent recomputation of the max on the same frame."""
    out = QUERIES["tpch_q15_top_supplier"](spark, SF_SMALL).toPandas()
    assert len(out) >= 1
    # all returned rows share one revenue value — the maximum
    assert out["total_revenue"].nunique() == 1
    li = (spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
          .filter((F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp")))
          .groupBy("l_suppkey")
          .agg(F.round(F.sum((F.col("l_extendedprice")
                              * (1 - F.col("l_discount")))
                             .cast("decimal(24,8)")), 2)
                .cast("double").alias("rev")))
    max_rev = li.agg(F.max("rev")).collect()[0][0]
    assert out["total_revenue"].iloc[0] == max_rev
    n_at_max = li.filter(F.col("rev") == max_rev).count()
    assert len(out) == n_at_max


def test_stratified_sample_hits_every_stratum(spark):
    """The ceiling quota guarantees ≥1 doc per source, and the 10% rate
    bounds each stratum's sample at ⌈cnt/10⌉."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    sizes = {r["source"]: r["cnt"] for r in
             docs.groupBy("source").agg(F.count(F.lit(1)).alias("cnt"))
                 .collect()}
    got = (QUERIES["sample_stratified_proportional"](spark, SF_SMALL)
           .groupBy("source").agg(F.count(F.lit(1)).alias("k")).collect())
    got = {r["source"]: r["k"] for r in got}
    assert set(got) == set(sizes)
    for src, cnt in sizes.items():
        assert got[src] == (cnt + 9) // 10


def test_stratified_sketch_matches_anchor_within_rank_error(spark):
    """Production threshold route vs the exact sort-based anchor: every
    stratum is hit, each stratum's sample size is within the GK rank
    envelope (n/accuracy + pseudokey tie mass at the threshold) of the
    anchor's ceil(n/10) quota, and the kept sets differ only at the
    threshold boundary."""
    from active_query_optimizer_spark.operators.curation import (
        SAMPLE_MOD, SAMPLE_MULT, STRAT_SKETCH_ACC)

    docs = (spark.read.parquet(f"{SF_SMALL}/documents.parquet")
            .select("doc_id", "source").collect())
    by_src: dict = {}
    for r in docs:
        by_src.setdefault(r["source"], []).append(r["doc_id"])

    sk = QUERIES["sample_stratified_sketch"](spark, SF_SMALL).collect()
    anchor = {(r["doc_id"], r["source"]) for r in
              QUERIES["sample_stratified_proportional"](
                  spark, SF_SMALL).collect()}
    got: dict = {}
    for r in sk:
        got.setdefault(r["source"], set()).add(r["doc_id"])
        assert r["n_stratum"] == len(by_src[r["source"]])

    assert set(got) == set(by_src), "a stratum got no sample"
    for src, ids in by_src.items():
        n = len(ids)
        pks = sorted(((i * SAMPLE_MULT) % SAMPLE_MOD, i) for i in ids)
        quota = (n + 9) // 10
        kept = got[src]
        # threshold = max kept pk; tie mass at that pseudokey value
        thr = max((i * SAMPLE_MULT) % SAMPLE_MOD for i in kept)
        ties = sum(1 for pk, _ in pks if pk == thr)
        slack = n / STRAT_SKETCH_ACC + ties + 1
        assert abs(len(kept) - quota) <= slack, (src, len(kept), quota)
        # boundary-only divergence: everything strictly below the
        # threshold pseudokey that the anchor kept, the sketch kept too
        anchor_src = {d for (d, s) in anchor if s == src}
        for d in anchor_src:
            if (d * SAMPLE_MULT) % SAMPLE_MOD < thr:
                assert d in kept, (src, d)


def test_stratified_sketch_plan_has_no_sort_or_window(spark):
    """The whole point of the threshold route: no per-stratum sort. The
    anchor plans a Window over a sort (positive control); the sketch
    path must show neither — just the grouped GK aggregate feeding a
    broadcast hash join and a map-side filter."""
    sketch_plan = (QUERIES["sample_stratified_sketch"](spark, SF_SMALL)
                   ._jdf.queryExecution().executedPlan().toString())
    anchor_plan = (QUERIES["sample_stratified_proportional"](
        spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString())
    assert "Window" in anchor_plan and "Sort [" in anchor_plan
    assert "Window" not in sketch_plan, sketch_plan
    assert "Sort [" not in sketch_plan, sketch_plan
    assert "BroadcastHashJoin" in sketch_plan, sketch_plan


def test_median_disc_value_is_group_member(spark):
    """The discrete median must be an actual cents value from its group
    at rank ceil(n/2) — spot-check one group end-to-end in pandas."""
    out = QUERIES["stats_median_disc_per_group"](spark, SF_SMALL).toPandas()
    orders = (spark.read.parquet(f"{SF_SMALL}/orders.parquet")
              .select("o_orderpriority",
                      F.expr("cast(cast(o_totalprice as decimal(18,2)) "
                             "* 100 as bigint)").alias("cents"),
                      "o_orderkey").toPandas())
    for _, row in out.iterrows():
        grp = orders[orders.o_orderpriority == row.o_orderpriority]
        ordered = grp.sort_values(["cents", "o_orderkey"]).cents.tolist()
        assert row.n == len(ordered)
        assert row.median_cents == ordered[(len(ordered) + 1) // 2 - 1]
