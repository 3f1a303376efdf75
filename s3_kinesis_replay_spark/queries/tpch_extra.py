"""Extended TPC-H-shape analytics suite (beyond the flagship q1/q3/q5).

Each query is the standard TPC-H pattern adapted to the fixture star
schema (FIXTURES.md: no partsupp table, no l_shipmode/l_commitdate/
l_receiptdate/p_container columns, nation names are NATION_0..24, dates
span 1995-2001) — the point is the OPERATOR pattern, which is what a
switching user runs. With the flagship q1/q3/q5 (relational.py) the
suite covers ALL 22 TPC-H shapes: scalar-filter aggregation (q6),
multi-nation volume join (q7), market share (q8), returned-item top-k
(q10), outer-join histogram (q13), conditional promo share (q14),
having-on-max (q15), correlated per-part threshold (q17), large-order
having + semi join (q18), disjunctive join predicates (q19), semi/anti
subqueries (q4/q22), and — round 7 — ship-delay class split (q12),
waiting-supplier EXISTS chain (q21), NOT-IN supplier counts (q16),
nested grouped-HAVING IN (q20), correlated-min supplier (q2), widest
join tree profit (q9), global-fraction HAVING (q11). The partsupp-bound
five (q2/q9/q11/q16/q20) use lineitem as the part-supplier bridge with
documented cost analogs.

Scale notes: every query keeps the TPC-H canonical plan — dims broadcast,
facts shuffle only on join/group keys, partial aggregation everywhere,
top-k via TakeOrdered. Decimal-sum discipline per SURVEY §5.3 (money
aggregates in DECIMAL(38,6); double division/rounding happens once at the
end, identically in both engines).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_kinesis_replay_spark.registry import register
from s3_kinesis_replay_spark.queries.helpers import DEC, fdec, r6, sdec, t


@register(
    "q6_forecast_revenue",
    "B2",
    f"""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice * l_discount AS {DEC}))
                      AS DOUBLE), 6) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    note="TPC-H Q6: pure scan-side filters + one global decimal agg — "
    "every predicate must reach the parquet scan; at 100 TB this query "
    "IS its scan cost.",
)
def q6_forecast_revenue(spark, sf_dir):
    li = t(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(fdec(F.sum(sdec("l_extendedprice * l_discount"))).alias("revenue"))
    )


@register(
    "q7_volume_shipping",
    "C1",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC}))
                      AS DOUBLE), 6) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
    note="TPC-H Q7 shape: two broadcast nation enrichments with a "
    "cross-pair disjunction, fact-fact joins shuffle on their keys; the "
    "nation filter prunes both dim sides BEFORE the broadcast.",
)
def q7_volume_shipping(spark, sf_dir):
    li = t(spark, "lineitem", sf_dir)
    o = t(spark, "orders", sf_dir)
    c = t(spark, "customer", sf_dir)
    s = t(spark, "supplier", sf_dir)
    n1 = t(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    # pre-filter BOTH nation sides to the named pair before the
    # broadcast (review r8: the note claimed this but the code filtered
    # post-join, relying on Catalyst deriving per-side IN-lists from the
    # cross-pair OR), and broadcast supplier so lineitem never shuffles
    # on l_suppkey with auto-broadcast off — the pinned 100 TB shape
    pair = ["NATION_1", "NATION_2"]
    n1 = n1.filter(F.col("supp_nation").isin(pair))
    n2 = n2.filter(F.col("cust_nation").isin(pair))
    joined = (
        F.broadcast(s).join(li, s.s_suppkey == li.l_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("bigint").alias("l_year"),
    ).agg(
        fdec(F.sum(sdec("l_extendedprice * (1 - l_discount)"))).alias("revenue")
    )


@register(
    "q10_returned_items",
    "F3",
    f"""
    SELECT c_custkey, c_name,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC}))
                      AS DOUBLE), 6) AS revenue,
           n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    note="TPC-H Q10: returned-item revenue top-20 — agg then TakeOrdered "
    "on the ROUNDED revenue with c_custkey tiebreak (deterministic set); "
    "nation broadcasts; no global sort of the agg output.",
)
def q10_returned_items(spark, sf_dir):
    c = t(spark, "customer", sf_dir)
    o = t(spark, "orders", sf_dir)
    li = t(spark, "lineitem", sf_dir)
    n = t(spark, "nation", sf_dir)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
            & (F.col("l_returnflag") == "R")
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            fdec(F.sum(sdec("l_extendedprice * (1 - l_discount)"))).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q13_order_count_distribution",
    "C2",
    """
    WITH c_orders AS (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders GROUP BY c_count
    """,
    note="TPC-H Q13: customers-with-zero-orders REQUIRE the outer join "
    "(an inner join silently drops them); the join predicate filter "
    "(order priority) lives in the ON clause, not WHERE — pushing it to "
    "WHERE would turn the outer join inner. Double aggregation, both "
    "partial-agg friendly.",
)
def q13_order_count_distribution(spark, sf_dir):
    c = t(spark, "customer", sf_dir)
    o = t(spark, "orders", sf_dir)
    c_orders = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q14_promo_revenue",
    "B6",
    f"""
    SELECT ROUND(
             100.0
             * CAST(SUM(CASE WHEN p_type = 'PROMO'
                             THEN CAST(l_extendedprice * (1 - l_discount)
                                       AS {DEC})
                             ELSE CAST(0 AS {DEC}) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC}))
                    AS DOUBLE), 6) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    """,
    note="TPC-H Q14: conditional decimal aggregate over a dim join — "
    "part broadcasts; the CASE rides the partial agg so one pass "
    "computes both numerator and denominator.",
)
def q14_promo_revenue(spark, sf_dir):
    li = t(spark, "lineitem", sf_dir)
    p = t(spark, "part", sf_dir)
    rev = sdec("l_extendedprice * (1 - l_discount)")
    zero = F.expr(f"CAST(0 AS {DEC})")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            r6(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
                ).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    "D13",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS total
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, ROUND(CAST(total AS DOUBLE), 6) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total = (SELECT MAX(total) FROM revenue)
    """,
    note="TPC-H Q15: having-on-global-max. The max is computed on the "
    "EXACT decimal totals (order-independent), so the equality filter "
    "cannot flake across engines or re-executions; the 1-row max "
    "broadcasts. Ties all surface (deterministic set).",
)
def q15_top_supplier(spark, sf_dir):
    li = t(spark, "lineitem", sf_dir)
    s = t(spark, "supplier", sf_dir)
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(sdec("l_extendedprice * (1 - l_discount)")).alias("total"))
    )
    mx = revenue.agg(F.max("total").alias("mx"))
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(mx), F.col("total") == F.col("mx"))
        .select(
            "s_suppkey", "s_name", fdec(F.col("total")).alias("total_revenue")
        )
    )


@register(
    "q17_small_quantity_revenue",
    "D10",
    f"""
    WITH thr AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) / COUNT(*))
               AS lim
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS {DEC})) AS DOUBLE) / 7.0, 6)
             AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = lineitem.l_partkey
    JOIN thr ON thr.l_partkey = lineitem.l_partkey
    WHERE p_brand = 'Brand#13' AND l_quantity < thr.lim
    """,
    note="TPC-H Q17: correlated per-part average threshold, decorrelated "
    "into a per-part agg + equi-join (what Catalyst/DuckDB both do). The "
    "threshold is decimal-sum/count in double — bit-identical in both "
    "engines, so the strict < comparison cannot drift. part broadcasts; "
    "the thr relation is |parts|-sized.",
)
def q17_small_quantity_revenue(spark, sf_dir):
    li = t(spark, "lineitem", sf_dir)
    p = t(spark, "part", sf_dir)
    brand = F.broadcast(p.filter(F.col("p_brand") == "Brand#13"))
    # threshold over BRAND-FILTERED lineitem only (review r8): p_brand
    # is functionally determined by l_partkey, so aggregating the whole
    # fact for thresholds only Brand#13 parts consume shuffled ~25x more
    # rows than needed — identical result, oracle unchanged
    li_brand = li.join(brand, li.l_partkey == p.p_partkey)
    thr = li_brand.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            F.lit(0.2)
            * (F.sum(sdec("l_quantity")).cast("double") / F.count("*"))
        ).alias("lim")
    )
    return (
        li_brand.join(thr, li_brand.l_partkey == thr.t_partkey)
        .filter(F.col("l_quantity") < F.col("lim"))
        .agg(
            r6(F.sum(sdec("l_extendedprice")).cast("double") / 7.0).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q18_large_volume_customers",
    "D13",
    f"""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           ROUND(CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE), 6) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    note="TPC-H Q18: the big-order HAVING produces a small key set that "
    "SEMI-joins the fact tables (never a full materialized subquery "
    "result). l_quantity values are integers-in-doubles (<= 2^53), so "
    "the HAVING sum is order-independent without the decimal detour.",
)
def q18_large_volume_customers(spark, sf_dir):
    c = t(spark, "customer", sf_dir)
    o = t(spark, "orders", sf_dir)
    li = t(spark, "lineitem", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 250)
        .select("l_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(big.withColumnRenamed("l_orderkey", "b_key"),
              F.col("o_orderkey") == F.col("b_key"), "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice")
        .agg(fdec(F.sum(sdec("l_quantity"))).alias("sum_qty"))
    )


@register(
    "q19_disjunctive_predicates",
    "B3",
    f"""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC}))
                      AS DOUBLE), 6) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    note="TPC-H Q19 shape (adapted: fixture part has no p_container): "
    "disjunctive mixed-side predicates over an equi join — the planner "
    "must keep the equi key (not degrade to a nested loop) and push the "
    "per-side conjuncts (brand/size to part scan, quantity to lineitem "
    "scan) below the join.",
)
def q19_disjunctive_predicates(spark, sf_dir):
    li = t(spark, "lineitem", sf_dir)
    p = t(spark, "part", sf_dir)
    cond = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            fdec(F.sum(sdec("l_extendedprice * (1 - l_discount)"))).alias("revenue")
        )
    )


@register(
    "q8_market_share",
    "C1",
    f"""
    WITH base AS (
      SELECT year(o_orderdate) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS {DEC}) AS volume,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT CAST(o_year AS BIGINT) AS o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                               ELSE CAST(0 AS {DEC}) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM base GROUP BY o_year
    """,
    note="TPC-H Q8 (adapted: no partsupp in the fixture schema): one "
    "nation's share of a region's promo-part market per year. Five dim "
    "broadcasts around the two fact joins; numerator and denominator "
    "ride the same decimal partial agg.",
)
def q8_market_share(spark, sf_dir):
    li = t(spark, "lineitem", sf_dir)
    o = t(spark, "orders", sf_dir)
    c = t(spark, "customer", sf_dir)
    s = t(spark, "supplier", sf_dir)
    p = t(spark, "part", sf_dir).filter(F.col("p_type") == "PROMO")
    r = t(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    n1 = t(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rkey")
    )
    n2 = t(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = sdec("l_extendedprice * (1 - l_discount)")
    zero = F.expr(f"CAST(0 AS {DEC})")
    base = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        # broadcast supplier (review r8: the note said five dim
        # broadcasts but only four had hints — with auto-broadcast off,
        # the q9-pinned 100 TB shape, lineitem shuffled on l_suppkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    return base.groupBy("o_year").agg(
        r6(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(
                    zero
                )
            ).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@register(
    "q22_dormant_rich_customers",
    "C4",
    f"""
    WITH thr AS (
      SELECT CAST(SUM(CAST(c_acctbal AS {DEC})) AS DOUBLE) / COUNT(*)
               AS avg_bal
      FROM customer WHERE c_acctbal > 0
    ),
    rich AS (
      SELECT c_custkey, c_mktsegment, c_acctbal
      FROM customer, thr WHERE c_acctbal > thr.avg_bal
    )
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(CAST(SUM(CAST(c_acctbal AS {DEC})) AS DOUBLE), 6)
             AS totacctbal
    FROM rich ANTI JOIN (
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    ) recent ON rich.c_custkey = recent.o_custkey
    GROUP BY c_mktsegment
    """,
    note="TPC-H Q22 shape: above-average-balance customers with NO "
    "RECENT orders (the fixture has no fully order-less customers, so "
    "dormancy is date-windowed to keep the result non-vacuous) — global "
    "decimal-exact threshold (1-row broadcast), then LEFT ANTI join "
    "against the filtered fact (the NOT EXISTS pattern). The anti join "
    "shuffles only customer keys; the date predicate pushes to the "
    "orders scan before the anti join.",
)
def q22_dormant_rich_customers(spark, sf_dir):
    c = t(spark, "customer", sf_dir)
    o = t(spark, "orders", sf_dir)
    thr = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(sdec("c_acctbal")).cast("double") / F.count("*")).alias("avg_bal")
    )
    rich = (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    )
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            fdec(F.sum(sdec("c_acctbal"))).alias("totacctbal"),
        )
    )


@register(
    "q4_order_priority_check",
    "C4",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
    note="TPC-H Q4 shape (adapted: fixture lineitem has no "
    "l_commitdate/l_receiptdate, so 'late' = shipped more than 90 days "
    "after the order date): correlated EXISTS decorrelated to a LEFT "
    "SEMI join with an extra non-equi conjunct riding the equi key — "
    "still a hash/SMJ join on l_orderkey, never a nested loop; the date "
    "window pushes to the orders scan.",
)
def q4_order_priority_check(spark, sf_dir):
    o = t(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = t(spark, "lineitem", sf_dir)
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


@register(
    "q12_ship_priority_classes",
    "D10",
    """
    SELECT CASE WHEN l_shipdate >= o_orderdate + INTERVAL 60 DAY THEN 'LATE'
                WHEN l_shipdate >= o_orderdate + INTERVAL 30 DAY THEN 'SLOW'
                ELSE 'FAST' END AS delay_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
    note="TPC-H Q12 pattern (shipmode -> ship-delay class; the fixture "
    "has no l_shipmode/l_receiptdate, FIXTURES.md): fact-fact equi join "
    "with the year filter pushed to the lineitem scan, then "
    "conditional-count aggregation per derived class — the canonical "
    "priority-split shape. Both facts shuffle on l_orderkey only; the "
    "CASE evaluation is map-side codegen.",
)
def q12_ship_priority_classes(spark, sf_dir):
    li = t(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = t(spark, "orders", sf_dir)
    delay = (
        F.when(
            F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
            "LATE",
        )
        .when(
            F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
            "SLOW",
        )
        .otherwise("FAST")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(delay.alias("delay_class"), high.alias("is_high"))
        .groupBy("delay_class")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(~F.col("is_high"), 1).otherwise(0))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


def q21_waiting_stats(li, ords, days: int = 60):
    """The q21 single-window decorrelation, SHARED with the fuzz test in
    tests/test_property.py (review r8: the test previously exercised a
    frozen inline copy, not the shipped plan): ONE fact shuffle (the
    l_orderkey window) replaces the three-scan semi-join derivation —
    for an 'F' order every lineitem survives the join, so the per-order
    distinct-supplier counts (all suppliers / late suppliers) computed
    over the window are exactly the EXISTS / NOT-EXISTS cardinalities.
    Per-order window state is the supplier set (a handful of ids) — no
    e1-style funnel, l_orderkey is high-cardinality."""
    from pyspark.sql import Window

    late_flag = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {int(days)} DAYS"
    )
    j = li.join(ords, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_suppkey", late_flag.alias("late")
    )
    w = Window.partitionBy("l_orderkey")
    return j.select(
        "l_orderkey",
        "l_suppkey",
        "late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("ns"),
        F.size(
            F.collect_set(
                F.when(F.col("late"), F.col("l_suppkey"))
            ).over(w)
        ).alias("nl"),
    )


@register(
    "q21_waiting_supplier",
    "C4",
    """
    WITH l1 AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
        AND l.l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_3'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l1 l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    """,
    note="TPC-H Q21 pattern (suppliers who kept a finished multi-supplier "
    "order waiting: late = shipped >60 days after order date, the "
    "fixture's l_receiptdate analog — FIXTURES.md): the EXISTS / "
    "NOT-EXISTS chain over a self-referencing fact. Engine side rewrites "
    "both correlations to unnested relational ops — EXISTS(other "
    "supplier) becomes a semi join against orders with >=2 distinct "
    "suppliers, NOT EXISTS(other LATE supplier) a semi join against "
    "orders whose distinct late-supplier count is 1 — so the plan is "
    "three digest-thin aggregates + semi joins + broadcast dims, no "
    "per-row subquery. The oracle keeps the literal correlated SQL, "
    "pinning the rewrite's equivalence.",
)
def q21_waiting_supplier(spark, sf_dir):
    li = t(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    ords = (
        t(spark, "orders", sf_dir)
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    stats = q21_waiting_stats(li, ords, days=60)
    s = t(spark, "supplier", sf_dir)
    n = t(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_3")
    return (
        stats.filter(F.col("late") & (F.col("ns") > 1) & (F.col("nl") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q16_supplier_part_counts",
    "C4",
    """
    SELECT p_brand, p_type, CAST(p_size AS INTEGER) AS p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#4'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
    note="TPC-H Q16 pattern (the fixture has no partsupp/s_comment — "
    "lineitem is the part-supplier bridge and negative account balance "
    "is the excluded-supplier analog, FIXTURES.md): NOT-IN subquery -> "
    "broadcast ANTI join against the tiny excluded-supplier set, then "
    "count(DISTINCT supplier) per part attribute triple. The distinct "
    "agg shuffles (brand, type, size, suppkey) pairs — fixed-width "
    "keys, never part rows; part dim broadcasts into the bridge join.",
)
def q16_supplier_part_counts(spark, sf_dir):
    p = t(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#4")
        & ~F.col("p_type").startswith("PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    li = t(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    excluded = (
        t(spark, "supplier", sf_dir)
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(excluded), li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("int").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_excess_shippers",
    "C4",
    """
    SELECT s_name, ROUND(CAST(s_acctbal AS DOUBLE), 6) AS s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_9'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE '%red%'
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(l_quantity) > 30
      )
    """,
    note="TPC-H Q20 pattern (no partsupp/availqty in the fixture: "
    "'shipped more than the threshold of a red part in 1997' replaces "
    "'stocked more than half a year's demand', FIXTURES.md): a nested "
    "IN whose inner relation is itself a grouped HAVING over a "
    "part-filtered fact slice — engine side is partial-agg per "
    "(suppkey, partkey) then a LEFT SEMI join into the supplier dim, "
    "with the part filter pushed into the fact scan via the broadcast "
    "dim join. No correlated execution anywhere.",
)
def q20_excess_shippers(spark, sf_dir):
    li = t(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    red = (
        t(spark, "part", sf_dir)
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    heavy = (
        li.join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 30)
        # no .distinct(): the left_semi consumer is duplicate-insensitive
        # (review r8 — the distinct cost an extra exchange for nothing)
        .select("l_suppkey")
    )
    s = t(spark, "supplier", sf_dir)
    n = t(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_9")
    return (
        # heavy is a post-HAVING supplier-key set — broadcast it so the
        # semi join never shuffles supplier
        s.join(F.broadcast(heavy), s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", r6(F.col("s_acctbal")).alias("s_acctbal"))
    )


@register(
    "q2_min_balance_supplier",
    "C4",
    """
    WITH bridge AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    ranked AS (
      SELECT b.l_partkey, s.s_name, s.s_acctbal,
             MIN(s.s_acctbal) OVER (PARTITION BY b.l_partkey) AS min_bal
      FROM bridge b JOIN supplier s ON s.s_suppkey = b.l_suppkey
    )
    SELECT p.p_partkey, p.p_name, r.s_name,
           ROUND(CAST(r.s_acctbal AS DOUBLE), 6) AS s_acctbal
    FROM ranked r
    JOIN part p ON p.p_partkey = r.l_partkey
    WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
      AND r.s_acctbal = r.min_bal
    """,
    note="TPC-H Q2 pattern (minimum-cost supplier per part; the fixture "
    "has no partsupp/ps_supplycost, so the correlated scalar is MIN "
    "account balance over the part's lineitem suppliers, FIXTURES.md): "
    "the correlated '= (SELECT MIN ...)' is rewritten to a window MIN "
    "over the distinct (part, supplier) bridge + equality filter — one "
    "shuffle on partkey, no per-row subquery; the part dim filter "
    "broadcasts. Ties (two suppliers at the min) keep both rows, same "
    "as the spec query.",
)
def q2_min_balance_supplier(spark, sf_dir):
    from pyspark.sql import Window

    bridge = (
        t(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey").distinct()
    )
    s = t(spark, "supplier", sf_dir).select("s_suppkey", "s_name", "s_acctbal")
    p = (
        t(spark, "part", sf_dir)
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_name")
    )
    w = Window.partitionBy("l_partkey")
    ranked = (
        bridge.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
    )
    return ranked.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).select(
        "p_partkey", "p_name", "s_name", r6(F.col("s_acctbal")).alias("s_acctbal")
    )


@register(
    "q9_product_type_profit",
    "C1",
    f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                               - 0.6 * p_retailprice * l_quantity
                          AS {DEC})) AS DOUBLE), 6) AS profit
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, EXTRACT(year FROM o_orderdate)
    """,
    note="TPC-H Q9 pattern (product-type profit by nation and year; the "
    "fixture has no ps_supplycost, so cost = 0.6 * p_retailprice per "
    "unit, FIXTURES.md): the widest join tree in the suite — two facts "
    "shuffled on l_orderkey, supplier/nation/filtered-part broadcast — "
    "with per-row double arithmetic cast to DECIMAL(38,6) BEFORE the "
    "sum (SURVEY §5.3: decimal accumulation is order-independent, so "
    "the hash cannot flake on shuffle order).",
)
def q9_product_type_profit(spark, sf_dir):
    li = t(spark, "lineitem", sf_dir)
    o = t(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    s = t(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    n = t(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    p = (
        t(spark, "part", sf_dir)
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    # broadcast-join the filtered part dim FIRST: Catalyst does not
    # reorder joins without CBO, and the p_name filter is the selective
    # predicate — cutting lineitem ~4x before it shuffles against orders
    # is the difference between shuffling 25 TB and 100 TB
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            fdec(
                F.sum(
                    sdec(
                        "l_extendedprice * (1 - l_discount)"
                        " - 0.6 * p_retailprice * l_quantity"
                    )
                )
            ).alias("profit")
        )
    )


@register(
    "q11_important_parts",
    "D13",
    f"""
    WITH v AS (
      SELECT l_partkey, SUM(CAST(l_extendedprice AS {DEC})) AS value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_9'
      GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, ROUND(CAST(value AS DOUBLE), 6) AS value
    FROM v
    WHERE CAST(value AS DOUBLE) > (SELECT CAST(SUM(value) AS DOUBLE) * 0.001
                                   FROM v)
    """,
    note="TPC-H Q11 pattern (parts representing a significant share of "
    "one nation's stock value; lineitem value replaces "
    "ps_supplycost*availqty, FIXTURES.md): per-part decimal sums "
    "HAVING-filtered against a GLOBAL fraction — the scalar subquery "
    "becomes a 1-row broadcast cross join over the already-aggregated "
    "relation. Both engines aggregate in DECIMAL(38,6) exactly and "
    "evaluate the identical cast-to-double threshold expression, so "
    "the boundary cannot flip cross-engine.",
)
def q11_important_parts(spark, sf_dir):
    li = t(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey", "l_extendedprice")
    s = t(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    n = (
        t(spark, "nation", sf_dir)
        .filter(F.col("n_name") == "NATION_9")
        .select("n_nationkey")
    )
    v = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(sdec("l_extendedprice")).alias("value"))
    )
    total = v.agg(
        (F.sum("value").cast("double") * F.lit(0.001)).alias("thresh")
    )
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("value").cast("double") > F.col("thresh"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            fdec(F.col("value")).alias("value"),
        )
    )
