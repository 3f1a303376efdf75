"""Relational core: projection/filter/row ops (§2.B), joins (§2.C),
sort/limit/set ops (§2.F), plus the flagship pricing-summary query (M1).

Each query is a declarative DataFrame plan — Catalyst handles pushdown,
pruning and join selection; we only force physical hints where the 100 TB
plan demands it (broadcast for dimension tables).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_kinesis_replay_spark.registry import register
from s3_kinesis_replay_spark.queries.helpers import DEC, fdec, r6, sdec, t


# ---------------------------------------------------------------- flagship
@register(
    "q1_pricing_summary",
    "D1",
    f"""
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE), 6) AS sum_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS {DEC})) AS DOUBLE), 6) AS sum_base_price,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS DOUBLE), 6) AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS {DEC})) AS DOUBLE), 6) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) / COUNT(*), 6)
               AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS {DEC})) AS DOUBLE) / COUNT(*), 6)
               AS avg_price,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    note="TPC-H Q1 shape; decimal sums are order-independent (SURVEY §5.3)",
)
def q1_pricing_summary(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.partitioning import spread_scan

    # guide §2.5 (r17): the single-file scan pins the filter + partial
    # decimal aggregation — virtually all of Q1's work — to 1-3 tasks;
    # spread to cluster parallelism first (no-op at production scale).
    # Decimal partial sums are exact and order-independent, so the
    # repartition cannot change any output value.
    li = spread_scan(t(spark, "lineitem", sf_dir), "l_orderkey")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            fdec(F.sum(sdec("l_quantity"))).alias("sum_qty"),
            fdec(F.sum(sdec("l_extendedprice"))).alias("sum_base_price"),
            fdec(F.sum(sdec("l_extendedprice * (1 - l_discount)"))).alias(
                "sum_disc_price"
            ),
            fdec(
                F.sum(sdec("l_extendedprice * (1 - l_discount) * (1 + l_tax)"))
            ).alias("sum_charge"),
            # decimal partial sums → exact & order-independent; final divide
            # happens once in double, identically in both engines (§5.3)
            r6(F.sum(sdec("l_quantity")).cast("double") / F.count("*")).alias(
                "avg_qty"
            ),
            r6(F.sum(sdec("l_extendedprice")).cast("double") / F.count("*")).alias(
                "avg_price"
            ),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------- §2.B
@register(
    "b1_project",
    "B1",
    """
    SELECT l_orderkey, l_linenumber AS line_no,
           ROUND(l_extendedprice * (1 - l_discount), 6) AS net_price,
           upper(l_returnflag) AS flag_u
    FROM lineitem
    """,
)
def b1_project(spark, sf_dir):
    return t(spark, "lineitem", sf_dir).select(
        "l_orderkey",
        F.col("l_linenumber").alias("line_no"),
        r6(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        F.upper("l_returnflag").alias("flag_u"),
    )


@register(
    "b2_filter_bool",
    "B2",
    """
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE (l_quantity > 30 AND l_discount <= 0.04) OR NOT (l_returnflag = 'N')
    """,
)
def b2_filter_bool(spark, sf_dir):
    li = t(spark, "lineitem", sf_dir)
    cond = ((F.col("l_quantity") > 30) & (F.col("l_discount") <= 0.04)) | ~(
        F.col("l_returnflag") == "N"
    )
    return li.filter(cond).select("l_orderkey", "l_linenumber")


@register(
    "b3_in_between_like",
    "B3",
    """
    SELECT p_partkey, p_name
    FROM part
    WHERE p_size BETWEEN 10 AND 25
      AND p_type IN ('a', 'b', 'c') = FALSE
      AND p_name LIKE '%a%'
      AND regexp_matches(p_brand, '[0-9]$')
    """,
    note="REF: message filtering by pattern maps to LIKE/RLIKE predicates",
)
def b3_in_between_like(spark, sf_dir):
    p = t(spark, "part", sf_dir)
    return p.filter(
        F.col("p_size").between(10, 25)
        & ~F.col("p_type").isin("a", "b", "c")
        & F.col("p_name").like("%a%")
        & F.col("p_brand").rlike("[0-9]$")
    ).select("p_partkey", "p_name")


@register(
    "b4_null_handling",
    "B4",
    """
    SELECT l_orderkey, l_linenumber,
           COALESCE(NULLIF(l_returnflag, 'A'), 'none') AS flag_or_none,
           (NULLIF(l_discount, 0.0) IS NULL) AS disc_is_zero,
           (NULLIF(l_returnflag, 'A') IS NOT DISTINCT FROM NULL) AS flag_null_safe
    FROM lineitem
    """,
    note="fixtures are null-free; NULLIF manufactures nulls to exercise the paths",
)
def b4_null_handling(spark, sf_dir):
    li = t(spark, "lineitem", sf_dir)
    flag_n = F.nullif(F.col("l_returnflag"), F.lit("A"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(flag_n, F.lit("none")).alias("flag_or_none"),
        F.nullif(F.col("l_discount"), F.lit(0.0)).isNull().alias("disc_is_zero"),
        flag_n.eqNullSafe(F.lit(None).cast("string")).alias("flag_null_safe"),
    )


@register(
    "b5_distinct",
    "B5",
    "SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate FROM lineitem",
)
def b5_distinct(spark, sf_dir):
    return t(spark, "lineitem", sf_dir).select(
        "l_returnflag", "l_linestatus", "l_shipdate"
    ).distinct()


@register(
    "b6_case_when",
    "B6",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'mid'
                ELSE 'large' END AS bucket,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open?') AS status_x
    FROM orders
    """,
)
def b6_case_when(spark, sf_dir):
    o = t(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "mid")
        .otherwise("large")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open?")).alias(
            "status_x"
        ),
    )


@register(
    "b7_casts",
    "B7",
    f"""
    SELECT l_orderkey,
           l_linenumber,
           CAST(l_linenumber AS BIGINT) AS line_big,
           CAST(FLOOR(l_quantity) AS INTEGER) AS qty_int,
           ROUND(CAST(CAST(l_extendedprice AS {DEC}) AS DOUBLE), 6) AS price_dec,
           CAST(l_orderkey AS VARCHAR) AS key_str,
           l_quantity / NULLIF(l_discount - l_discount, 0.0) AS div_null
    FROM lineitem
    """,
    note="floor-then-cast: Spark truncates double→int, DuckDB rounds — floor aligns; "
    "try_divide(x, 0) ≡ x / NULLIF(0)",
)
def b7_casts(spark, sf_dir):
    li = t(spark, "lineitem", sf_dir)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_linenumber").cast("bigint").alias("line_big"),
        F.floor("l_quantity").cast("int").alias("qty_int"),
        fdec(F.col("l_extendedprice").cast(DEC)).alias("price_dec"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.try_divide(F.col("l_quantity"), F.col("l_discount") - F.col("l_discount")).alias(
            "div_null"
        ),
    )


@register(
    "b8_sample_seeded",
    "B8",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total, TRUE AS count_in_ci
    FROM lineitem
    """,
    note="flag-oracle form (VERDICT r7 item 2, d4b pattern): engines "
    "sample differently by design, so the DECLARED invariant is hashed "
    "instead of the sample rows — Spark draws the seeded Bernoulli(0.1) "
    "sample and COMPUTES count_in_ci = |n_sampled − 0.1·N| < 6·σ "
    "(binomial); the oracle recomputes N and hard-codes TRUE, so a "
    "broken sampler flips the flag and hash-mismatches. Row-level EXACT "
    "cross-engine sampling lives in p9 (exactly-k) and p15 (weighted); "
    "seed determinism pinned in tests/test_operators.py.",
)
def b8_sample_seeded(spark, sf_dir):
    li = t(spark, "lineitem", sf_dir)
    sampled = li.sample(fraction=0.1, seed=42)
    return (
        li.agg(F.count("*").alias("n_total"))
        .crossJoin(sampled.agg(F.count("*").alias("n_sampled")))
        .select(
            "n_total",
            (
                F.abs(F.col("n_sampled") - 0.1 * F.col("n_total"))
                < 6 * F.sqrt(F.col("n_total") * 0.1 * 0.9)
            ).alias("count_in_ci"),
        )
    )


# ---------------------------------------------------------------- §2.C joins
@register(
    "c1_inner_join",
    "C1",
    """
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def c1_inner_join(spark, sf_dir):
    o, c = t(spark, "orders", sf_dir), t(spark, "customer", sf_dir)
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "c2_outer_joins",
    "C2",
    """
    SELECT c.c_custkey, o.o_orderkey
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    """,
)
def c2_outer_joins(spark, sf_dir):
    o, c = t(spark, "orders", sf_dir), t(spark, "customer", sf_dir)
    return c.join(o, o.o_custkey == c.c_custkey, "left").select(
        "c_custkey", "o_orderkey"
    )


@register(
    "c2b_full_outer",
    "C2",
    """
    SELECT n.n_nationkey, n.n_name, s.s_suppkey
    FROM nation n FULL JOIN supplier s ON s.s_nationkey = n.n_nationkey
    """,
)
def c2b_full_outer(spark, sf_dir):
    n, s = t(spark, "nation", sf_dir), t(spark, "supplier", sf_dir)
    return n.join(s, s.s_nationkey == n.n_nationkey, "full").select(
        "n_nationkey", "n_name", "s_suppkey"
    )


@register(
    "c3_broadcast_join",
    "C3",
    """
    SELECT r.r_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE), 6)
             AS total_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    note="explicit broadcast of dim tables — at 100 TB the fact side never shuffles "
    "for this join",
)
def c3_broadcast_join(spark, sf_dir):
    c = t(spark, "customer", sf_dir)
    n = t(spark, "nation", sf_dir)
    r = t(spark, "region", sf_dir)
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            fdec(F.sum(sdec("c_acctbal"))).alias("total_bal"),
        )
    )


@register(
    "c4_semi_anti",
    "C4",
    """
    SELECT c_custkey, 'has_orders' AS tag FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT c_custkey, 'no_orders' AS tag FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def c4_semi_anti(spark, sf_dir):
    c, o = t(spark, "customer", sf_dir), t(spark, "orders", sf_dir)
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", F.lit("has_orders").alias("tag")
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", F.lit("no_orders").alias("tag")
    )
    return semi.unionAll(anti)


@register(
    "c5_cross_join",
    "C5",
    "SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n",
)
def c5_cross_join(spark, sf_dir):
    return t(spark, "region", sf_dir).crossJoin(t(spark, "nation", sf_dir)).select(
        "r_name", "n_name"
    )


@register(
    "c6_theta_join",
    "C6",
    """
    SELECT s1.s_suppkey AS sk1, s2.s_suppkey AS sk2
    FROM supplier s1 JOIN supplier s2
      ON s1.s_acctbal < s2.s_acctbal AND s1.s_nationkey <> s2.s_nationkey
    """,
    note="pure inequality join → BroadcastNestedLoopJoin. The C6 "
    "contract REQUIRES one bounded side (an inequality-only join has no "
    "hash/merge strategy), and the code now declares it: s2 carries an "
    "explicit broadcast hint (review r8 — the note claimed a declared "
    "bound the code didn't express). At scale, a theta join whose "
    "smaller side exceeds broadcast limits must be rewritten as a "
    "banded range join (the c7 pattern), not run as-is.",
)
def c6_theta_join(spark, sf_dir):
    s1 = t(spark, "supplier", sf_dir).alias("s1")
    s2 = t(spark, "supplier", sf_dir).alias("s2")
    return s1.join(
        F.broadcast(s2),
        (F.col("s1.s_acctbal") < F.col("s2.s_acctbal"))
        & (F.col("s1.s_nationkey") != F.col("s2.s_nationkey")),
    ).select(F.col("s1.s_suppkey").alias("sk1"), F.col("s2.s_suppkey").alias("sk2"))


@register(
    "c7_range_join",
    "C7",
    """
    SELECT e1.event_id AS eid1, e2.event_id AS eid2
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts >= e1.ts AND e2.ts <= e1.ts + INTERVAL 1 HOUR
     AND e1.event_id <> e2.event_id
    """,
    note="equi key + range band → sort-merge join, no nested loop at scale",
)
def c7_range_join(spark, sf_dir):
    e1 = t(spark, "events", sf_dir).alias("e1")
    e2 = t(spark, "events", sf_dir).alias("e2")
    return e1.join(
        e2,
        (F.col("e1.user_id") == F.col("e2.user_id"))
        & (F.col("e2.ts") >= F.col("e1.ts"))
        & (F.col("e2.ts") <= F.col("e1.ts") + F.expr("INTERVAL 1 HOUR"))
        & (F.col("e1.event_id") != F.col("e2.event_id")),
    ).select(F.col("e1.event_id").alias("eid1"), F.col("e2.event_id").alias("eid2"))


@register(
    "c9_self_join",
    "C9",
    """
    SELECT l1.l_orderkey, l1.l_linenumber AS ln1, l2.l_linenumber AS ln2
    FROM lineitem l1 JOIN lineitem l2
      ON l1.l_orderkey = l2.l_orderkey AND l1.l_linenumber < l2.l_linenumber
    """,
)
def c9_self_join(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.partitioning import spread_scan

    # guide §2.5/§2.4 (r17): spread the single-file scan BY THE JOIN KEY —
    # both self-join sides then arrive hash-partitioned on l_orderkey at
    # cluster parallelism, so the join's two exchanges are satisfied by
    # the one spread exchange (and it no-ops at production scale).
    li = spread_scan(t(spark, "lineitem", sf_dir), "l_orderkey")
    l1 = li.alias("l1")
    l2 = li.alias("l2")
    return l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_linenumber") < F.col("l2.l_linenumber")),
    ).select(
        F.col("l1.l_orderkey").alias("l_orderkey"),
        F.col("l1.l_linenumber").alias("ln1"),
        F.col("l2.l_linenumber").alias("ln2"),
    )


# ---------------------------------------------------------------- §2.F
@register(
    "f1_multi_key_sort",
    "F1",
    """
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    ORDER BY o_orderpriority DESC NULLS LAST, o_totalprice ASC, o_orderkey
    """,
    note="driver hash is order-insensitive; the ORDER itself is pinned "
    "by tests/test_operators.py::test_f1_output_order (review r8: this "
    "note used to claim an ordered check that did not exist)",
)
def f1_multi_key_sort(spark, sf_dir):
    return (
        t(spark, "orders", sf_dir)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(
            F.col("o_orderpriority").desc_nulls_last(),
            F.col("o_totalprice").asc(),
            F.col("o_orderkey"),
        )
    )


@register(
    "f2_limit_offset",
    "F2",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100 OFFSET 50
    """,
)
def f2_limit_offset(spark, sf_dir):
    return (
        t(spark, "orders", sf_dir)
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(50)
        .limit(100)
    )


@register(
    "f3_global_topk",
    "F3",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    note="TakeOrderedAndProject — no total sort at scale",
)
def f3_global_topk(spark, sf_dir):
    return (
        t(spark, "orders", sf_dir)
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "f4_union_all_byname",
    "F4",
    """
    SELECT c_custkey AS key, c_name AS name FROM customer
    UNION ALL
    SELECT s_suppkey AS key, s_name AS name FROM supplier
    """,
)
def f4_union_all_byname(spark, sf_dir):
    c = t(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("key"), F.col("c_name").alias("name")
    )
    s = t(spark, "supplier", sf_dir).select(
        F.col("s_name").alias("name"), F.col("s_suppkey").alias("key")
    )
    return c.unionByName(s)


@register(
    "f5_union_distinct",
    "F5",
    """
    SELECT c_nationkey AS nk FROM customer
    UNION
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def f5_union_distinct(spark, sf_dir):
    c = t(spark, "customer", sf_dir).select(F.col("c_nationkey").alias("nk"))
    s = t(spark, "supplier", sf_dir).select(F.col("s_nationkey").alias("nk"))
    return c.union(s).distinct()


@register(
    "f6_intersect_except",
    "F6",
    """
    SELECT n_nationkey AS nk, 'both' AS tag FROM (
      SELECT c_nationkey AS n_nationkey FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier
    )
    UNION ALL
    SELECT n_nationkey AS nk, 'cust_only' AS tag FROM (
      SELECT c_nationkey AS n_nationkey FROM customer
      EXCEPT
      SELECT s_nationkey FROM supplier
    )
    """,
)
def f6_intersect_except(spark, sf_dir):
    c = t(spark, "customer", sf_dir).select(F.col("c_nationkey").alias("nk"))
    s = t(spark, "supplier", sf_dir).select(F.col("s_nationkey").alias("nk"))
    both = c.intersect(s).select("nk", F.lit("both").alias("tag"))
    conly = c.subtract(s).select("nk", F.lit("cust_only").alias("tag"))
    return both.unionAll(conly)


@register(
    "f6b_intersect_except_all",
    "F6",
    """
    SELECT flag FROM (
      SELECT l_returnflag AS flag FROM lineitem WHERE l_linenumber <= 2
      INTERSECT ALL
      SELECT l_returnflag FROM lineitem WHERE l_quantity > 10
    )
    """,
    note="multiset semantics: result multiplicity = min(left, right) per value",
)
def f6b_intersect_except_all(spark, sf_dir):
    li = t(spark, "lineitem", sf_dir)
    a = li.filter(F.col("l_linenumber") <= 2).select(F.col("l_returnflag").alias("flag"))
    b = li.filter(F.col("l_quantity") > 10).select(F.col("l_returnflag").alias("flag"))
    return a.intersectAll(b)


# ------------------------------------------------- multi-join flagships
@register(
    "q3_shipping_priority",
    "C1",
    f"""
    SELECT l.l_orderkey,
           ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS {DEC}))
                      AS DOUBLE), 6) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    note="TPC-H Q3 shape: selective dim filter -> 3-way join -> agg -> "
    "top-k; customer filter prunes before the fact join, limit becomes "
    "TakeOrdered after the agg. customer scales with SF, so it is NOT "
    "force-broadcast: AQE converts the join to broadcast at small sf and "
    "keeps a shuffle join at the 100 TB design point",
)
def q3_shipping_priority(spark, sf_dir):
    c = t(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = t(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(fdec(F.sum(sdec("l_extendedprice * (1 - l_discount)"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    "C1",
    f"""
    SELECT n.n_name,
           ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS {DEC}))
                      AS DOUBLE), 6) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
    note="TPC-H Q5 shape: 6-table join; only the true fixed-size dims "
    "(nation 25 rows, region 5 rows) are force-broadcast. customer and "
    "supplier scale with SF — they go through shuffle joins, which AQE "
    "converts to broadcast at small sf but which survive fact-sized "
    "inputs at the 100 TB design point (a forced broadcast there is a "
    "hard 8 GB-limit/driver-OOM failure AQE cannot override)",
)
def q5_local_supplier_volume(spark, sf_dir):
    c = t(spark, "customer", sf_dir)
    o = t(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t(spark, "lineitem", sf_dir)
    s = t(spark, "supplier", sf_dir)
    n = t(spark, "nation", sf_dir)
    r = t(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(fdec(F.sum(sdec("l_extendedprice * (1 - l_discount)"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "c1d_cbo_reordered_join",
    "C1",
    f"""
    SELECT n.n_name,
           ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS {DEC}))
                      AS DOUBLE), 6) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
    note="q5's 6-table join with ZERO broadcast hints, planned by "
    "CostBasedJoinReorder over ANALYZE'd catalog tables (SURVEY §4 "
    "catalog bootstrap): statistics — not the written join order, not "
    "hand hints — pick the dim-first tree. The plan inversion (nation⋈"
    "region deepest, lineitem joined last) is pinned in "
    "tests/test_operators.py::test_cbo_join_reorder_plan; at 100 TB "
    "stats-driven reorder is what survives when a hinted broadcast "
    "would OOM and the written order would shuffle the fact twice",
)
def c1d_cbo_reordered_join(spark, sf_dir):
    from s3_kinesis_replay_spark.catalog import bootstrap_cbo_tables, cbo_conf

    bootstrap_cbo_tables(spark, sf_dir)
    with cbo_conf(spark):
        df = spark.sql(
            f"""
            SELECT n_name,
                   ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                              AS {DEC})) AS DOUBLE), 6) AS revenue
            FROM lineitem_cbo l
            JOIN orders_cbo o ON l.l_orderkey = o.o_orderkey
            JOIN customer_cbo c ON o.o_custkey = c.c_custkey
            JOIN supplier_cbo s ON l.l_suppkey = s.s_suppkey
                               AND c.c_nationkey = s.s_nationkey
            JOIN nation_cbo n ON s.s_nationkey = n.n_nationkey
            JOIN region_cbo r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name
            """
        )
        # force planning inside the CBO scope: the optimized plan is built
        # (and cached by lazy QueryExecution) while cbo.enabled is on
        df._jdf.queryExecution().optimizedPlan()
    return df


@register(
    "c1e_stats_lifecycle",
    "C1",
    """
    SELECT CAST((SELECT COUNT(*) FROM events WHERE event_id % 4 <> 3)
                AS BIGINT) AS initial_rows,
           TRUE AS dropped_on_append,
           CAST((SELECT COUNT(*) FROM events) AS BIGINT) AS refreshed_rows,
           CAST((SELECT COUNT(*) FROM events) AS BIGINT)
             AS stale_external_rows,
           CAST((SELECT COUNT(*) FROM events)
                + (SELECT COUNT(*) FROM events WHERE event_id % 4 = 3)
                AS BIGINT) AS final_rows
    """,
    note="CBO STATISTICS LIFECYCLE — the maintenance half of c1d\'s "
    "bootstrap (VERDICT r10 item 2: bootstrap ANALYZEs once per "
    "(table, sf_dir), then its idempotence guard skips the table "
    "forever). The entry replays an ingest lifecycle and pins BOTH "
    "failure modes measured on Spark 4.1.2: (1) a CATALOG-AWARE append "
    "(saveAsTable mode=append) INVALIDATES table stats outright — "
    "dropped_on_append pins that the planner goes CBO-dead, not stale, "
    "until the next ANALYZE (catalog.refresh_stats -> refreshed_rows = "
    "full count, read back from DESCRIBE EXTENDED); (2) a FILESYSTEM-"
    "level append into the external location (how a12-style compaction "
    "or a side-channel ingest lands) leaves stats SILENTLY STALE — "
    "stale_external_rows still reads the pre-append count until a "
    "second refresh (final_rows). The oracle recomputes every count "
    "from the source, so an ANALYZE that mis-counts, or a Spark "
    "behavior change in either staleness mode, hash-mismatches. a14\'s "
    "bucketed install now ends with refresh_stats and heals a missing-"
    "stats table on reuse. At 100 TB: table-level ANALYZE per ingest "
    "batch (count-shaped scan of the appended data, ANALYZE ... "
    "PARTITION for partitioned facts); FOR ALL COLUMNS on the slower "
    "cadence at which join-reorder decisions drift.",
)
def c1e_stats_lifecycle(spark, sf_dir):
    import os
    import shutil

    from s3_kinesis_replay_spark.catalog import refresh_stats, table_stats
    from s3_kinesis_replay_spark.operators.similarity import data_fingerprint

    fp = data_fingerprint(os.path.join(sf_dir, "events.parquet"))[:10]
    tname = f"skr_statslc_{fp}"
    loc = f"/tmp/skr_statslc/{fp}"
    ev = t(spark, "events", sf_dir).select("event_id", "user_id", "event_type")
    delivery = ev.filter(F.col("event_id") % 4 == 3)
    # deliberately rebuilt per run: the stale/dropped INTERMEDIATE states
    # are the thing under test — a cached end state has none left.
    # Explicit /tmp location (not the warehouse): the in-memory metastore
    # forgets tables across sessions while their managed dirs persist,
    # which LOCATION_ALREADY_EXISTS-fails the next create.
    spark.sql(f"DROP TABLE IF EXISTS {tname}")
    shutil.rmtree(loc, ignore_errors=True)
    ev.filter(F.col("event_id") % 4 != 3).write.mode("overwrite").option(
        "path", loc
    ).saveAsTable(tname)
    _, initial = refresh_stats(spark, tname)
    # (1) catalog-aware append: Spark 4 DROPS table stats (planner falls
    # back to file-size guesses — CBO-dead, measured, not assumed)
    delivery.write.mode("append").saveAsTable(tname)
    dropped = table_stats(spark, tname) == (None, None)
    _, refreshed = refresh_stats(spark, tname)
    # (2) filesystem-level append bypassing the catalog (compaction /
    # side-channel ingest): stats survive UNCHANGED — silently stale
    delivery.write.mode("append").parquet(loc)
    spark.sql(f"REFRESH TABLE {tname}")  # file listing, NOT stats
    _, stale_external = table_stats(spark, tname)
    _, final = refresh_stats(spark, tname)
    return spark.createDataFrame(
        [(initial, dropped, refreshed, stale_external, final)],
        "initial_rows long, dropped_on_append boolean, refreshed_rows long, "
        "stale_external_rows long, final_rows long",
    )


@register(
    "c1g_snapshot_table_cbo_join",
    "C1",
    f"""
    SELECT n.n_name,
           ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS {DEC}))
                      AS DOUBLE), 6) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
    note="CBO OVER A SNAPSHOT TABLE (r14, VERDICT item 6 — the c1d "
    "reorder with the FACT leaf served by the lakehouse tier): "
    "register_snapshot_table_cbo pins a manifest snapshot into an "
    "immutable per-version view dir (clean snapshots HARDLINK their "
    "live files — O(#files) metadata, zero copy; MOR/partitioned "
    "snapshots materialize the assembled view), registers it as an "
    "external catalog table, and ANALYZEs FOR ALL COLUMNS — so "
    "CostBasedJoinReorder costs joins against manifest tables exactly "
    "as it does fixture parquet. The q5-shaped 6-table join runs "
    "hint-free with the snapshot table as the fact; the dim-first "
    "inversion is pinned in tests/test_operators.py::"
    "test_snapshot_table_cbo_join_reorder, which also pins that the "
    "registration is version-pinned (never silently stale — the c1e "
    "failure mode is structurally impossible over an immutable pin) "
    "and that delete state materializes instead of leaking deleted "
    "rows. The oracle recomputes from source, so a view dir that "
    "captured the wrong file set hash-mismatches. At 100 TB: a "
    "catalog-integrated deployment serves these stats from table "
    "metadata (Iceberg/Delta); the pinned-dir bridge pays one ANALYZE "
    "scan per registration, amortized across every join that consults "
    "it.",
)
def c1g_snapshot_table_cbo_join(spark, sf_dir):
    import os

    from s3_kinesis_replay_spark.catalog import (
        bootstrap_cbo_tables,
        cbo_conf,
        register_snapshot_table_cbo,
    )
    from s3_kinesis_replay_spark.operators import table_format as tf
    from s3_kinesis_replay_spark.operators.similarity import (
        atomic_cached_build,
        data_fingerprint,
    )

    bootstrap_cbo_tables(spark, sf_dir)
    fp = data_fingerprint(os.path.join(sf_dir, "lineitem.parquet"))[:10]

    def build(tmp: str) -> None:
        root = os.path.join(tmp, "tbl")
        li = t(spark, "lineitem", sf_dir)
        tf.snapshot_write(
            spark, li.filter(F.col("l_orderkey") % 2 == 0), root, "overwrite"
        )
        tf.snapshot_write(
            spark, li.filter(F.col("l_orderkey") % 2 == 1), root, "append"
        )
        open(os.path.join(tmp, "_done"), "w").write("1")

    cache = atomic_cached_build(
        "/tmp/skr_cbosnap", f"{fp}-cbo1", build, "_done"
    )
    register_snapshot_table_cbo(
        spark, "lineitem_snap_cbo", os.path.join(cache, "tbl")
    )
    with cbo_conf(spark):
        df = spark.sql(
            f"""
            SELECT n_name,
                   ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                              AS {DEC})) AS DOUBLE), 6) AS revenue
            FROM lineitem_snap_cbo l
            JOIN orders_cbo o ON l.l_orderkey = o.o_orderkey
            JOIN customer_cbo c ON o.o_custkey = c.c_custkey
            JOIN supplier_cbo s ON l.l_suppkey = s.s_suppkey
                               AND c.c_nationkey = s.s_nationkey
            JOIN nation_cbo n ON s.s_nationkey = n.n_nationkey
            JOIN region_cbo r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name
            """
        )
        df._jdf.queryExecution().optimizedPlan()
    return df


@register(
    "c1b_salted_join",
    "C1",
    """
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderpriority
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
    note="skew-path variant of C1: fact side salted N ways, dim side "
    "exploded across salts — result identical to the plain join (same "
    "oracle); the pattern that bounds per-task skew when one key "
    "dominates and AQE splitting is not enough",
)
def c1b_salted_join(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.skew import salted_join

    li = t(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linenumber"
    )
    o = t(spark, "orders", sf_dir).select("o_orderkey", "o_orderpriority")
    return salted_join(
        li, o, left_key="l_orderkey", right_key="o_orderkey", salts=8
    ).select("l_orderkey", "l_linenumber", "o_orderpriority")


# AQE tuning for c1f, module-level so the plan-pin test applies the SAME
# scope: thresholds lowered to make fixture-scale skew visible to
# OptimizeSkewedJoin (at production scale the DEFAULTS — 5x median and
# 256 MB — are the right knee; only the scale changes, not the rule).
AQE_SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    # the dim side would broadcast at fixture scale, removing the SMJ the
    # rule rewrites — at 100 TB both sides genuinely exceed the threshold
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _c1f_plan(spark, sf_dir):
    """The skewed-join DataFrame (shared by the entry and the plan-pin
    test). 30% of lineitem rows are remapped onto the single smallest
    orderkey — a deterministic hot key the oracle reproduces — and the
    fact side is repartitioned so the shuffle has MULTIPLE map outputs:
    AQE splits a skewed reduce partition at map-output granularity, so a
    one-file scan (one mapper) is unsplittable no matter the skew — the
    same reason a production job reading one giant unsplittable file
    can't be rescued by AQE either."""
    o = t(spark, "orders", sf_dir)
    # bounded scalar: the hot key the oracle's scalar subquery recomputes
    mk = o.agg(F.min("o_orderkey")).collect()[0][0]
    li = (
        t(spark, "lineitem", sf_dir)
        .repartition(16)
        .select(
            F.when(F.col("l_orderkey") % 10 < 3, F.lit(mk))
            .otherwise(F.col("l_orderkey"))
            .alias("jk"),
            "l_extendedprice",
        )
    )
    return (
        li.join(
            o.select(F.col("o_orderkey").alias("jk"), "o_orderpriority"),
            "jk",
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            fdec(F.sum(sdec("l_extendedprice"))).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "c1f_aqe_skew_join",
    "C1",
    f"""
    WITH mk AS (SELECT MIN(o_orderkey) AS k FROM orders),
    l AS (SELECT CASE WHEN l_orderkey % 10 < 3 THEN (SELECT k FROM mk)
                      ELSE l_orderkey END AS jk,
                 l_extendedprice
          FROM lineitem)
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS {DEC})) AS DOUBLE), 6)
             AS revenue
    FROM l JOIN orders o ON o.o_orderkey = l.jk
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
    note="AQE RUNTIME SKEW-JOIN — the third member of the skew tier "
    "(c1b salts by hand, d17 salts a distinct; this entry lets the "
    "ENGINE re-plan): 30% of the fact rows are remapped onto one hot "
    "orderkey, and with adaptive execution on, OptimizeSkewedJoin "
    "splits the skewed reduce partition at map-output granularity at "
    "RUNTIME — the executed plan carries SortMergeJoin(skew=true) and "
    "an 'AQEShuffleRead coalesced and skewed' node, pinned in "
    "tests/test_operators.py::test_c1f_aqe_skew_join_plan (results "
    "invariant vs the same join with AQE off, also pinned). Thresholds "
    "are scoped DOWN to make fixture-scale skew visible (8KB vs the "
    "256MB default — the rule, not the scale, is under test) and "
    "restored after. Mapper-count caveat discovered building this: a "
    "single-file scan yields ONE map output, which AQE cannot split "
    "regardless of skew — the repartition(16) models the many-mapper "
    "shape a real 100 TB fact scan always has. When one KEY (not one "
    "partition) dominates so hard that even split map ranges overload, "
    "that is c1b's salting territory — AQE splits partitions, salts "
    "split keys.",
)
def c1f_aqe_skew_join(spark, sf_dir):
    from s3_kinesis_replay_spark.queries.helpers import scoped_conf

    with scoped_conf(spark, AQE_SKEW_CONFS):
        df = _c1f_plan(spark, sf_dir)
        # force planning + execution inside the scope so the adaptive
        # rewrite actually runs under the tuned thresholds
        rows = df.localCheckpoint(eager=True)
    return rows


def _ensure_bucketed_table(spark, df, key: str, tname: str, write_fn=None) -> None:
    """Install the 8-bucket sorted copy of ``df`` ATOMICALLY (review r8:
    the previous direct mode('overwrite').saveAsTable to the shared
    fixed path let two concurrent sessions corrupt each other's bucket
    files mid-write). Build via saveAsTable into a temp dir under a
    throwaway catalog name (bucket-id file naming comes from the
    writer), drop the temp entry (external — files stay), atomically
    rename the dir into the fingerprint-keyed location, then register
    the bucketed external table over it. Stale sibling fingerprints of
    the same table are reaped after install (each held a full fact-table
    copy forever). The repartition(8, key) uses the same Murmur3 hash as
    bucketBy -> ONE file per bucket, so the sorted-bucket guarantee
    holds globally and the join needs no Sort either.

    ``write_fn(tmp_tbl, tmp_path)``, when given, replaces the default
    single bucketed save — a14 uses it for its initial-load-plus-append
    sequence (review r10: the helper was duplicated there WITHOUT the
    stale-fingerprint reap, reintroducing the r8 disk leak)."""
    import os
    import shutil
    import uuid

    from s3_kinesis_replay_spark.operators.similarity import (
        atomic_cached_build,
    )

    root = "/tmp/skr_bucketed"

    def build(tmp: str) -> None:
        tmp_tbl = f"skr_bld_{uuid.uuid4().hex[:10]}"
        if write_fn is not None:
            write_fn(tmp_tbl, tmp)
        else:
            (
                df.repartition(8, F.col(key))
                .write.bucketBy(8, key)
                .sortBy(key)
                .option("path", tmp)
                .mode("overwrite")
                .saveAsTable(tmp_tbl)
            )
        spark.sql(f"DROP TABLE {tmp_tbl}")  # external: files remain

    final = atomic_cached_build(root, tname, build, "_SUCCESS")
    cols = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    spark.sql(
        f"CREATE TABLE {tname} ({cols}) USING parquet "
        f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO 8 BUCKETS "
        f"LOCATION '{final}'"
    )
    # Reap stale sibling fingerprints with a ONE-GENERATION grace
    # (ADVICE r8): a concurrent session whose catalog still references
    # the immediately-previous fingerprint must not lose its bucket
    # files mid-query, so keep the newest stale dir and delete only
    # older generations (mirrors merge_sink's grace discipline).
    prefix = tname.rsplit("_", 1)[0] + "_"
    stale = [
        os.path.join(root, d)
        for d in os.listdir(root)
        if d.startswith(prefix) and d != tname and not d.startswith("build-")
    ]
    def _mtime(p):
        try:
            return os.path.getmtime(p)
        except OSError:  # reaped by a concurrent session between list and stat
            return 0.0

    stale.sort(key=_mtime, reverse=True)
    for p in stale[1:]:
        shutil.rmtree(p, ignore_errors=True)


@register(
    "c1c_bucketed_join",
    "C1",
    f"""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                              AS {DEC})) AS DOUBLE), 6) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    note="BUCKETED co-located join — the third C1 strategy next to plain "
    "shuffle (c1) and salting (c1b): both facts are written ONCE as "
    "8-bucket sorted tables on their join key (external tables under "
    "/tmp, fingerprint-suffixed names so a regenerated fixture can never "
    "serve stale buckets; rebuilt per session because bucket METADATA "
    "lives in the in-memory catalog) and the join then reads co-located "
    "buckets with NO Exchange and NO Sort on either side — the only "
    "shuffle left is the final aggregate's. At 100 TB this is the "
    "recurring-join killer: the shuffle is paid once at write time, "
    "every subsequent join of the two tables is embarrassingly "
    "bucket-parallel (asserted in tests/test_operators.py::"
    "test_c1c_bucketed_join_eliminates_shuffle).",
)
def c1c_bucketed_join(spark, sf_dir):
    import os

    from s3_kinesis_replay_spark.operators.similarity import data_fingerprint

    # Per-table fingerprints (ADVICE r7): a regenerated orders.parquet
    # with an unchanged lineitem.parquet must not serve stale orders
    # buckets, so each table's cache name hashes its OWN file.
    fps = {
        tbl: data_fingerprint(os.path.join(sf_dir, f"{tbl}.parquet"))[:10]
        for tbl in ("lineitem", "orders")
    }
    specs = {
        "lineitem": ("l_orderkey", f"skr_li_b8_{fps['lineitem']}"),
        "orders": ("o_orderkey", f"skr_ord_b8_{fps['orders']}"),
    }
    for tbl, (key, tname) in specs.items():
        if not spark.catalog.tableExists(tname):
            _ensure_bucketed_table(spark, t(spark, tbl, sf_dir), key, tname)
    li = spark.table(specs["lineitem"][1])
    o = spark.table(specs["orders"][1])
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            fdec(F.sum(sdec("l_extendedprice * (1 - l_discount)"))).alias(
                "revenue"
            ),
        )
    )


@register(
    "c2b_merge_upsert",
    "C2",
    """
    WITH changes AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 3 THEN 'D' ELSE 'U' END AS op,
             text || ' [rev2]' AS new_text
      FROM documents WHERE doc_id % 11 = 3 OR doc_id % 7 = 0
      UNION ALL
      SELECT -doc_id - 1, 'I',
             'new doc ' || CAST(doc_id AS VARCHAR)
      FROM documents WHERE doc_id % 13 = 5
    ),
    merged AS (
      SELECT t.doc_id,
             CASE WHEN c.op = 'U' THEN c.new_text ELSE t.text END AS text,
             CASE WHEN c.op = 'U' THEN 'updated' ELSE 'kept' END AS status
      FROM documents t LEFT JOIN changes c ON c.doc_id = t.doc_id
      WHERE c.op IS NULL OR c.op <> 'D'
      UNION ALL
      SELECT c.doc_id, c.new_text, 'inserted'
      FROM changes c ANTI JOIN documents t ON c.doc_id = t.doc_id
      WHERE c.op = 'I'
    )
    SELECT doc_id, md5(text) AS h, status FROM merged
    """,
    note="MERGE/upsert semantics over a parquet snapshot — the CDC "
    "snapshot-maintenance companion to e9's latest-per-key compaction: "
    "WHEN MATCHED AND op='U' THEN UPDATE, MATCHED AND op='D' THEN "
    "DELETE, NOT MATCHED AND op='I' THEN INSERT, expressed as one LEFT "
    "join (update/delete/keep) + one ANTI join (insert) — no table "
    "format required, output is the next snapshot. The change set is "
    "constructed disjoint per key (delete wins over update), matching "
    "MERGE's one-source-row-per-target contract. At 100 TB both joins "
    "shuffle on the key only; the change batch is usually the small "
    "side and broadcasts.",
)
def c2b_merge_upsert(spark, sf_dir):
    d = t(spark, "documents", sf_dir)
    changes = (
        d.filter((F.col("doc_id") % 11 == 3) | (F.col("doc_id") % 7 == 0))
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 11 == 3, "D").otherwise("U").alias("op"),
            F.concat(F.col("text"), F.lit(" [rev2]")).alias("new_text"),
        )
        .unionByName(
            d.filter(F.col("doc_id") % 13 == 5).select(
                # negative key space for synthetic inserts (review r8:
                # doc_id + 5000000 collided with real ids past 5M rows,
                # breaking MERGE's one-source-row-per-target contract at
                # the design point; -id - 1 is disjoint from any
                # non-negative id domain)
                (-F.col("doc_id") - 1).alias("doc_id"),
                F.lit("I").alias("op"),
                F.concat(
                    F.lit("new doc "), F.col("doc_id").cast("string")
                ).alias("new_text"),
            )
        )
    )
    target = d.select("doc_id", "text")
    joined = target.join(changes, "doc_id", "left")
    survivors = joined.filter(
        F.col("op").isNull() | (F.col("op") != "D")
    ).select(
        "doc_id",
        F.when(F.col("op") == "U", F.col("new_text"))
        .otherwise(F.col("text"))
        .alias("text"),
        F.when(F.col("op") == "U", "updated").otherwise("kept").alias("status"),
    )
    inserts = (
        changes.filter(F.col("op") == "I")
        .join(target, "doc_id", "left_anti")
        .select(
            "doc_id",
            F.col("new_text").alias("text"),
            F.lit("inserted").alias("status"),
        )
    )
    return survivors.unionByName(inserts).select(
        "doc_id", F.md5("text").alias("h"), "status"
    )


@register(
    "c2d_snapshot_diff",
    "C2",
    """
    WITH old_state AS (
      SELECT user_id, event_type AS last_type,
             CAST(event_id AS BIGINT) AS last_event_id
      FROM (SELECT user_id, event_type, event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE event_id < 5000)
      WHERE rn = 1
    ),
    new_state AS (
      SELECT user_id, event_type AS last_type,
             CAST(event_id AS BIGINT) AS last_event_id
      FROM (SELECT user_id, event_type, event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1
    )
    SELECT COALESCE(o.user_id, n.user_id) AS user_id,
           CASE WHEN o.user_id IS NULL THEN 'insert'
                WHEN n.user_id IS NULL THEN 'delete'
                ELSE 'update' END AS op,
           o.last_event_id AS old_event_id,
           n.last_event_id AS new_event_id,
           n.last_type AS new_type
    FROM old_state o FULL OUTER JOIN new_state n ON n.user_id = o.user_id
    WHERE o.user_id IS NULL OR n.user_id IS NULL
       OR o.last_event_id IS DISTINCT FROM n.last_event_id
    ORDER BY user_id
    """,
    note="SNAPSHOT DIFF / CDC extraction — the read-side complement of "
    "c2b's MERGE and c2c's streaming upsert: given two snapshot states "
    "(yesterday = events below an id watermark, today = all events), "
    "emit the change feed (insert/update/delete per key) via ONE "
    "full-outer join of the two per-key argmax states, keeping only "
    "changed keys. Both states reduce to user-grain rows BEFORE the "
    "join (partial-agg groupBys), so the join moves key cardinality, "
    "not events — the same discipline as e11. At 100 TB this is how a "
    "downstream consumer derives incremental updates from two table "
    "versions without any transaction log: cost = two aggregates + one "
    "key-grain join. Append-only fixture -> zero deletes (the branch "
    "is exercised in tests with a constructed deletion).",
)
def c2d_snapshot_diff(spark, sf_dir):
    e = t(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    )

    def state(df):
        key = F.struct("ts", "event_id")
        return df.groupBy("user_id").agg(
            F.max_by("event_type", key).alias("last_type"),
            F.max_by("event_id", key).alias("last_event_id"),
        )

    old = state(e.filter(F.col("event_id") < 5000)).select(
        "user_id",
        F.col("last_event_id").alias("old_event_id"),
    )
    new = state(e).select(
        "user_id",
        F.col("last_event_id").alias("new_event_id"),
        F.col("last_type").alias("new_type"),
    )
    j = old.join(new, "user_id", "full_outer")
    op = (
        F.when(F.col("old_event_id").isNull(), F.lit("insert"))
        .when(F.col("new_event_id").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    return (
        j.filter(
            F.col("old_event_id").isNull()
            | F.col("new_event_id").isNull()
            | ~F.col("old_event_id").eqNullSafe(F.col("new_event_id"))
        )
        .select(
            "user_id", op.alias("op"), "old_event_id", "new_event_id",
            "new_type",
        )
        .orderBy("user_id")
    )
