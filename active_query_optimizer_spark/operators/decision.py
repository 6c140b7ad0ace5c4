"""Decision-support analog set II — the TPC-H shapes the round-3 set
(Q3/Q5/Q7/Q10/Q12/Q14/Q17/Q18/Q19/Q22 in ``relational.py``) did not yet
cover: Q2/Q4/Q6/Q8/Q9/Q13/Q15/Q16/Q20/Q21 analogs, adapted to the
synthetic star schema (no ``partsupp`` table — the part↔supplier
relationship is derived from ``lineitem``; no
``l_commitdate``/``l_receiptdate`` — "late" is expressed as shipping
long after the order date).

These matter to the optimizer pipeline (SURVEY.md §2.C/§4) because they
exercise the plan shapes the reference's workload generator samples and
its featurizer encodes (``create_sql.py:95-251``, ``Lero/feature.py:27-
255``): correlated EXISTS / NOT-IN decorrelated to semi/anti joins,
aggregate-feeding-join ("join back on the min/max"), left-outer
aggregation with join-side predicates, conditional shares, and grouped
HAVING over a join. Every entry is a declarative DataFrame plan with an
exact DuckDB oracle.

Scale notes (100 TB): all plans are scan-pruned (date/type predicates
push to parquet), and decorrelate every correlated subquery into ONE
pass over the fact table plus an equi-join — no per-row subquery
re-execution anywhere. Broadcast policy: only the fixed-cardinality
dims (nation = 25 rows, region = 5 rows at EVERY scale factor) and
single-row scalar frames carry an explicit ``F.broadcast`` hint.
Frames derived from ``part``/``supplier``/``customer`` grow with the
scale factor, so their join strategy is left to
``spark.sql.autoBroadcastJoinThreshold`` + AQE: at bench SFs the size
stats still pick broadcast (same physical plan), while at 100 TB the
planner degrades gracefully to a shuffled join instead of OOMing an
executor on a forced billion-row build side
(``tests/test_plan_shapes.py::test_no_forced_broadcast_of_sf_growing_tables``
pins the policy for every registered query). The only full-fact
aggregations group on the join key (l_orderkey / l_suppkey / l_partkey),
so AQE coalesces or skew-splits the single shuffle each one needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register
from .relational import _dec_sum, _utc


def _ts(lit: str):
    return F.lit(lit).cast("timestamp")


_REV_DEC = "decimal(24,8)"


def _rev():
    return (F.col("l_extendedprice")
            * (1 - F.col("l_discount"))).cast(_REV_DEC)


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH sold AS (
      SELECT l.l_partkey, l.l_suppkey,
             CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS price_cents
      FROM lineitem l, supplier s, nation n, region r
      WHERE l.l_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
        AND n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
    ), best AS (
      SELECT l_partkey, MIN(price_cents) AS min_price_cents
      FROM sold GROUP BY l_partkey
    )
    SELECT DISTINCT p.p_partkey, sold.l_suppkey AS s_suppkey, s.s_name,
           CAST(CAST(s.s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
             AS acctbal_cents,
           best.min_price_cents
    FROM sold, best, part p, supplier s
    WHERE sold.l_partkey = best.l_partkey
      AND sold.price_cents = best.min_price_cents
      AND p.p_partkey = sold.l_partkey AND s.s_suppkey = sold.l_suppkey
      AND p.p_size = 15 AND p.p_type = 'SMALL'
    ORDER BY acctbal_cents DESC, p_partkey ASC, s_suppkey ASC
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analog (minimum-cost supplier): for each qualifying part,
    the region's supplier(s) offering it at the lowest observed price.
    The schema has no ``partsupp``, so the part↔supplier offer relation
    is the distinct (partkey, suppkey, price) set observed in lineitem,
    and "supply cost" is the line's extended price in integer cents.

    The structural point is Q2's correlated MIN subquery, decorrelated
    the way every engine plans it: aggregate once per part (``best``),
    then equi-join the offers back on (partkey, price = min). Region
    restriction applies to BOTH the aggregate and the probe side — the
    min is taken only over EUROPE offers, matching Q2's correlated
    region condition. nation/region broadcast (fixed 25/5 rows); the
    EUROPE-supplier and filtered-part frames grow with SF so their
    strategy is size-stat/AQE-driven, not hinted. The offers→best join
    keys on l_partkey so the group-by exchange is reused by the probe.
    """
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_supp = (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
               .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
               .select("s_suppkey"))
    li = load_table(spark, sf_dir, "lineitem")
    sold = (li.join(eu_supp, li.l_suppkey == eu_supp.s_suppkey, "left_semi")
            .select("l_partkey", "l_suppkey",
                    F.expr("cast(cast(l_extendedprice as decimal(18,2)) "
                           "* 100 as bigint)").alias("price_cents")))
    # aggregate key aliased: `best` derives from `sold`, so joining the
    # two on the raw column name is an ambiguous self-join lineage
    best = (sold.groupBy(F.col("l_partkey").alias("best_partkey"))
            .agg(F.min("price_cents").alias("min_price_cents")))
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL"))
    return (sold.join(best, (sold.l_partkey == best.best_partkey)
                      & (sold.price_cents == best.min_price_cents))
            .join(p, sold.l_partkey == p.p_partkey)
            .join(load_table(spark, sf_dir, "supplier"),
                  sold.l_suppkey == F.col("s_suppkey"))
            .select("p_partkey",
                    F.col("l_suppkey").alias("s_suppkey"), "s_name",
                    F.expr("cast(cast(s_acctbal as decimal(18,2)) * 100 "
                           "as bigint)").alias("acctbal_cents"),
                    "min_price_cents")
            .distinct()
            .orderBy(F.col("acctbal_cents").desc(),
                     F.col("p_partkey").asc(), F.col("s_suppkey").asc())
            .limit(100))


@register(
    "tpch_q4_priority_exists",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
)
def tpch_q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog (order-priority checking): orders in one quarter
    with at least one SLOW lineitem, counted per priority. The schema
    has no commit/receipt dates, so Q4's ``commitdate < receiptdate``
    lateness becomes "shipped ≥60 days after the order date" — which
    preserves the interesting part: a correlated EXISTS whose predicate
    compares columns from BOTH relations (not a pure equi-condition).

    Catalyst plans it as a left-semi join with the date comparison as a
    residual join condition — one pass over each table, no per-order
    subquery. The quarter filter prunes the orders scan first."""
    _utc(spark)
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-04-01 00:00:00")))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate")
    slow = ((li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate
               >= o.o_orderdate + F.expr("INTERVAL 60 DAYS")))
    return (o.join(li, slow, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count"))
            .orderBy("o_orderpriority"))


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(ROUND(SUM(CAST(l_extendedprice * l_discount
                               AS DECIMAL(24,8))), 2) AS DOUBLE)
             AS discount_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND CAST(l_quantity AS BIGINT) < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analog (forecasting revenue change): the pure scan-and-
    aggregate query — no join at all; its whole cost is how much of the
    fact table the scan avoids reading. Date + discount-band + quantity
    predicates all push to the parquet reader (PushedFilters), column
    pruning reduces the read set to four columns, and the aggregate is
    a two-phase partial/final COUNT+SUM with no exchange of data rows
    (only one partial row per partition). The discount band compares
    the stored doubles against the same literals in both engines —
    bit-identical parquet values, bit-identical comparison."""
    _utc(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity").cast("bigint") < 24))
    return li.agg(
        F.count(F.lit(1)).alias("n_lines"),
        _dec_sum(F.col("l_extendedprice") * F.col("l_discount"),
                 "discount_revenue", _REV_DEC))


@register(
    "tpch_q8_market_share",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(ROUND(SUM(CASE WHEN n2.n_name = 'NATION_5'
                    THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                              AS DECIMAL(24,8))
                    ELSE CAST(0 AS DECIMAL(24,8)) END), 2) AS DOUBLE)
             AS nation_revenue,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(24,8))), 2) AS DOUBLE)
             AS total_revenue
    FROM part p, lineitem l, orders o, customer c, supplier s,
         nation n1, nation n2, region r
    WHERE p.p_partkey = l.l_partkey AND l.l_orderkey = o.o_orderkey
      AND o.o_custkey = c.c_custkey AND c.c_nationkey = n1.n_nationkey
      AND n1.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
      AND l.l_suppkey = s.s_suppkey AND s.s_nationkey = n2.n_nationkey
      AND p.p_type = 'ECONOMY'
    GROUP BY o_year ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analog (national market share): of all ECONOMY-part
    revenue sold into the AMERICA region, what share came from NATION_5
    suppliers, per order year. The widest join in the registry — 8
    tables (part, lineitem, orders, customer, supplier, nation×2,
    region) — with the share expressed as numerator+denominator columns
    from ONE conditional-aggregation pass (the ratio is left to the
    consumer; a float division would break the exact value-hash).

    Plan shape: the fixed dims (nation×2, region) broadcast by hint;
    the part/customer/supplier sides grow with SF, so their strategy is
    size-stat/AQE-driven — at bench SFs the fact table still flows
    through a single broadcast-join chain with zero pre-aggregation
    shuffles, then one grouped exchange on the year."""
    _utc(spark)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY").select("p_partkey")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_regionkey").alias("n1_region"))
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("supp_nation"))
    nation_rev = F.when(F.col("supp_nation") == "NATION_5",
                        _rev()).otherwise(F.lit(0).cast(_REV_DEC))
    return (li.join(p, li.l_partkey == p.p_partkey, "left_semi")
            .join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
            .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"),
                  "left_semi")
            .join(s, li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
            .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
            .agg(F.round(F.sum(nation_rev), 2).cast("double")
                  .alias("nation_revenue"),
                 _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                          "total_revenue", _REV_DEC))
            .orderBy("o_year"))


@register(
    "tpch_q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(24,8))), 2) AS DOUBLE) AS profit
    FROM part p, supplier s, lineitem l, orders o, nation n
    WHERE s.s_suppkey = l.l_suppkey AND p.p_partkey = l.l_partkey
      AND o.o_orderkey = l.l_orderkey AND s.s_nationkey = n.n_nationkey
      AND p.p_name LIKE '%widget%'
    GROUP BY nation, o_year ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analog (product-type profit): profit on widget-named
    parts per supplier nation per order year. No ``partsupp`` →
    no supply-cost term; profit is the discounted revenue (the plan
    shape — a 5-way join whose only selective predicate is a
    non-anchored LIKE on a dimension — is what Q9 contributes, and
    is preserved exactly).

    A contains-LIKE can't prune at the scan, so the part filter is a
    post-scan dimension reduction feeding a semi-join whose build side
    Catalyst keeps small from size stats (no forced hint — the filtered
    part set grows with SF). Orders joins on the fact's key; the
    group-by year+nation is the only wide exchange."""
    _utc(spark)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")).select("p_partkey")
    return (li.join(p, li.l_partkey == p.p_partkey, "left_semi")
            .join(o, li.l_orderkey == o.o_orderkey)
            .join(s, li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").cast("int").alias("o_year"))
            .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                          "profit", _REV_DEC))
            .orderBy(F.col("nation").asc(), F.col("o_year").desc()))


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """TPC-H Q13 analog (customer order-count distribution): how many
    customers placed 0, 1, 2 … non-urgent orders. Two stacked
    aggregations around a LEFT OUTER join whose predicate lives in the
    JOIN condition, not the WHERE (moving it to WHERE would silently
    drop the zero-order customers — the classic outer-join filter
    placement trap, worth pinning against an oracle).

    COUNT(o_orderkey) counts non-null matches only, so unmatched
    customers land in the c_count=0 bucket. First group-by keys on
    c_custkey (co-partitioned with the join exchange — one shuffle
    serves both); the second grouping is over ≤ a few hundred distinct
    counts, a cheap final exchange."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority")
    cond = ((c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"))
    return (c.join(o, cond, "left_outer")
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("c_count"))
            .groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(24,8))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(ROUND(r.total_rev, 2) AS DOUBLE) AS total_revenue
    FROM supplier s, revenue r
    WHERE s.s_suppkey = r.supplier_no
      AND r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 analog (top supplier): the supplier(s) with the highest
    quarterly revenue — the aggregate-then-compare-to-its-own-MAX shape
    (the reference view `revenue0`). The grouped frame is computed ONCE
    and reused for both the scalar MAX and the equality probe; Spark
    caches nothing here but the exchange reuse makes the second pass
    cheap, and the single-row MAX broadcasts to the filter.

    The equality compares DECIMAL sums, not doubles — exact in both
    engines, so ties (multiple suppliers at the max) surface
    identically. Rounding to display cents happens after selection."""
    _utc(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00")))
    revenue = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
               .agg(F.sum(_rev()).alias("total_rev")))
    top = revenue.agg(F.max("total_rev").alias("max_rev"))
    s = load_table(spark, sf_dir, "supplier")
    return (revenue.crossJoin(F.broadcast(top))
            .filter(F.col("total_rev") == F.col("max_rev"))
            .join(s, F.col("supplier_no") == s.s_suppkey)
            .select("s_suppkey", "s_name",
                    F.round(F.col("total_rev"), 2).cast("double")
                     .alias("total_revenue"))
            .orderBy("s_suppkey"))


@register(
    "tpch_q16_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l, part p
    WHERE p.p_partkey = l.l_partkey
      AND p.p_brand <> 'Brand#5'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
    """,
)
def tpch_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analog (part–supplier variety): how many distinct
    suppliers ship each qualifying (brand, size) combination, excluding
    suppliers on a complaint-list analog (negative account balance —
    the schema has no s_comment). The part↔supplier relation is again
    derived from lineitem in place of partsupp.

    Shape: NOT IN over a subquery → anti join (the excluded set is a
    supplier-fraction, SF-growing — strategy left to size stats;
    Catalyst's null-aware anti join is safe here because s_suppkey is
    non-null), dimension IN-list + <> filters push into the part scan,
    and COUNT(DISTINCT) expands to the two-phase distinct-then-count
    aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0).select("s_suppkey")
    return (li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
            .join(p, li.l_partkey == p.p_partkey)
            .groupBy("p_brand", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.col("supplier_cnt").desc(),
                     F.col("p_brand").asc(), F.col("p_size").asc()))


@register(
    "tpch_q20_promo_volume_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'small%')
        AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l.l_suppkey
      HAVING SUM(CAST(l.l_quantity AS BIGINT)) > 50
    )
    ORDER BY s.s_suppkey
    """,
)
def tpch_q20_promo_volume_suppliers(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """TPC-H Q20 analog (potential promotion suppliers): suppliers who
    moved real volume of small-named parts in 1997. No partsupp
    availability → Q20's "excess stock" threshold becomes a shipped-
    quantity HAVING bar, which keeps the doubly-nested IN shape: an IN
    over a grouped/HAVING subquery that itself contains an IN over a
    filtered dimension.

    Both INs decorrelate to semi joins: part-name LIKE 'small%' is a
    prefix pattern (pushable as a range), the filtered partkey set
    semi-joins the fact scan (SF-growing — strategy left to size
    stats/AQE), the per-supplier quantity aggregate groups the reduced
    fact once, and the surviving supplier keys semi-join the supplier
    table."""
    _utc(spark)
    small = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00")))
    movers = (li.join(small, li.l_partkey == small.p_partkey, "left_semi")
              .groupBy("l_suppkey")
              .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("q"))
              .filter(F.col("q") > 50).select("l_suppkey"))
    s = load_table(spark, sf_dir, "supplier")
    return (s.join(movers, s.s_suppkey == movers.l_suppkey, "left_semi")
            .select("s_suppkey", "s_name")
            .orderBy("s_suppkey"))


@register(
    "tpch_q21_waiting_supplier",
    oracle="""
    WITH per_supp AS (
      SELECT l.l_orderkey, l.l_suppkey,
             MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END) AS was_late
      FROM lineitem l, orders o
      WHERE l.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F'
      GROUP BY l.l_orderkey, l.l_suppkey
    ), per_order AS (
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_supp,
             CAST(SUM(was_late) AS BIGINT) AS n_late
      FROM per_supp GROUP BY l_orderkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM per_supp ps, per_order po, supplier s
    WHERE ps.l_orderkey = po.l_orderkey
      AND ps.was_late = 1 AND po.n_supp > 1 AND po.n_late = 1
      AND s.s_suppkey = ps.l_suppkey
    GROUP BY s.s_suppkey, s.s_name
    ORDER BY numwait DESC, s.s_suppkey ASC
    LIMIT 20
    """,
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analog (suppliers who kept orders waiting): on finalized
    multi-supplier orders, the supplier who was the ONLY late shipper —
    Q21's EXISTS(another supplier) AND NOT EXISTS(another LATE supplier)
    pair. No receipt/commit dates → "late" is shipping >90 days after
    the order date.

    Rather than Q21's textbook two correlated self-joins of lineitem
    (three passes over the largest table), both existence tests
    decorrelate into counting aggregates: one pass computes per-
    (order, supplier) lateness, a second aggregates per-order supplier
    and late-supplier counts, and the filter `was_late ∧ n_supp>1 ∧
    n_late=1` reproduces exactly the EXISTS/NOT-EXISTS semantics. The
    two aggregates and the join all key on l_orderkey — one exchange
    family, reused three times (vs three full joins at 100 TB)."""
    _utc(spark)
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate")
        + F.expr("INTERVAL 90 DAYS"), 1).otherwise(0)
    per_supp = (li.join(o, li.l_orderkey == o.o_orderkey)
                .groupBy("l_orderkey", "l_suppkey")
                .agg(F.max(late).alias("was_late")))
    per_order = (per_supp.groupBy("l_orderkey")
                 .agg(F.count(F.lit(1)).alias("n_supp"),
                      F.sum("was_late").cast("bigint").alias("n_late")))
    s = load_table(spark, sf_dir, "supplier")
    return (per_supp.join(per_order, "l_orderkey")
            .filter((F.col("was_late") == 1) & (F.col("n_supp") > 1)
                    & (F.col("n_late") == 1))
            .join(s, F.col("l_suppkey") == s.s_suppkey)
            .groupBy("s_suppkey", "s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.col("numwait").desc(), F.col("s_suppkey").asc())
            .limit(20))


@register(
    "tpch_q11_important_parts",
    oracle="""
    WITH part_rev AS (
      SELECT l.l_partkey,
             SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS part_cents
      FROM lineitem l, supplier s, nation n
      WHERE l.l_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
        AND n.n_name = 'NATION_7'
      GROUP BY l.l_partkey
    ), total AS (
      SELECT SUM(part_cents) AS total_cents FROM part_rev
    )
    SELECT p.l_partkey AS p_partkey,
           CAST(p.part_cents AS BIGINT) AS part_cents
    FROM part_rev p, total t
    WHERE p.part_cents * 1000 > t.total_cents
    ORDER BY part_cents DESC, p_partkey ASC
    """,
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analog (important stock identification): the parts that
    individually account for more than 0.1% of one nation's total part
    value. No ``partsupp`` → "stock value" is the summed extended price
    (integer cents) of the nation's shipped lines; the SHAPE — a grouped
    aggregate filtered by a HAVING bar that is itself a scalar aggregate
    over the SAME grouped frame — is Q11's contribution and survives
    intact. Completes the 22-query decision-support sweep (Q1 ≡
    ``pricing_summary``; every other number has an analog entry).

    The fraction bar is cross-multiplied to integers
    (``part_cents * 1000 > total_cents``) so neither engine divides;
    the single-row total broadcasts onto the per-part frame (the same
    scalar-frame pattern as Q15/Q22). One exchange: the nation-supplier
    filter semi-joins (supplier-derived, so size-stat-driven) before
    the only wide shuffle on l_partkey; the total re-aggregates the
    already-grouped frame, not the fact."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7")
    nat_supp = (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
                .select("s_suppkey"))
    li = load_table(spark, sf_dir, "lineitem")
    part_rev = (li.join(nat_supp, li.l_suppkey == nat_supp.s_suppkey,
                        "left_semi")
                .groupBy("l_partkey")
                .agg(F.sum(F.expr(
                    "cast(cast(l_extendedprice as decimal(18,2)) * 100 "
                    "as bigint)")).alias("part_cents")))
    total = part_rev.agg(F.sum("part_cents").alias("total_cents"))
    return (part_rev.crossJoin(F.broadcast(total))
            .filter(F.col("part_cents") * 1000 > F.col("total_cents"))
            .select(F.col("l_partkey").alias("p_partkey"),
                    F.col("part_cents").cast("bigint").alias("part_cents"))
            .orderBy(F.col("part_cents").desc(), F.col("p_partkey").asc()))
