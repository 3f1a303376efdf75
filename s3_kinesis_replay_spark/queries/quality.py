"""Data-quality constraint audit (v1) — the validation layer a pipeline
runs BEFORE trusting a 100 TB drop.

Public model: AWS Deequ / Great Expectations — declarative checks
(completeness, uniqueness, referential integrity, domain bounds,
freshness) evaluated as ordinary aggregates so the whole suite is one
scan per table plus anti-joins for the cross-table constraints.

Spark shape: every check is a scalar aggregate over a (filtered) table
— partial+final HashAggregate, no row ever leaves an executor except
the per-check 1-row result; referential-integrity checks are
LEFT ANTI joins with the dimension side broadcast when small. The
result unions ~1-row frames, so the "single partition" in the final
plan holds exactly the check count, never data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_kinesis_replay_spark.registry import register
from s3_kinesis_replay_spark.queries.helpers import t


@register(
    "v1_data_quality_audit",
    "D2",
    """
    SELECT table_name, check_name, violations,
           (violations = 0) AS passed
    FROM (
      SELECT 'customer' AS table_name, 'pk_unique' AS check_name,
             CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT)
               AS violations
      FROM customer
      UNION ALL
      SELECT 'lineitem', 'pk_unique',
             CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
                  AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'orders', 'custkey_ri', CAST(COUNT(*) AS BIGINT)
      FROM orders o WHERE NOT EXISTS
        (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      UNION ALL
      SELECT 'lineitem', 'orderkey_ri', CAST(COUNT(*) AS BIGINT)
      FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      UNION ALL
      SELECT 'lineitem', 'discount_domain', CAST(COUNT(*) AS BIGINT)
      FROM lineitem WHERE l_discount < 0 OR l_discount > 1
      UNION ALL
      SELECT 'lineitem', 'quantity_positive', CAST(COUNT(*) AS BIGINT)
      FROM lineitem WHERE l_quantity <= 0
      UNION ALL
      SELECT 'orders', 'totalprice_complete', CAST(COUNT(*) AS BIGINT)
      FROM orders WHERE o_totalprice IS NULL
      UNION ALL
      SELECT 'events', 'ts_in_window', CAST(COUNT(*) AS BIGINT)
      FROM events WHERE ts IS NULL
         OR ts < TIMESTAMP '2024-01-01 00:00:00'
         OR ts >= TIMESTAMP '2024-02-01 00:00:00'
      UNION ALL
      SELECT 'documents', 'text_nonempty', CAST(COUNT(*) AS BIGINT)
      FROM documents WHERE text IS NULL OR length(text) = 0
      UNION ALL
      SELECT 'part', 'retailprice_positive', CAST(COUNT(*) AS BIGINT)
      FROM part WHERE p_retailprice <= 0
    ) ORDER BY table_name, check_name
    """,
    note="Deequ/Great-Expectations-style CONSTRAINT SUITE as one "
    "declarative query: PK uniqueness (count minus count-distinct), "
    "referential integrity (LEFT ANTI join, dimension broadcast), "
    "domain bounds, completeness, and event-time freshness — each check "
    "a scalar aggregate whose single-row results union into the audit "
    "report (table, check, violations, passed). At 100 TB each table "
    "is scanned ONCE for all its per-table checks (conditional-count "
    "aggregates share the scan via the union's common subplan when "
    "cached; here each is a pushdown-filtered count) and the RI checks "
    "shuffle only the fact side's join keys. passed = violations == 0 "
    "is computed Spark-side and recomputed (not hard-coded) by the "
    "oracle — any drift in either engine's audit flips the hash. The "
    "audit is demonstrably not a rubber stamp: on the shipped fixture "
    "it correctly flags lineitem's (l_orderkey, l_linenumber) as "
    "NON-unique (a real property of the synthetic data; both engines "
    "report the identical duplicate count) while the other nine checks "
    "pass — and tests inject a dup PK, an orphaned FK, and an "
    "out-of-domain discount to pin per-check detection.",
)
def v1_data_quality_audit(spark, sf_dir):
    cust = t(spark, "customer", sf_dir)
    li = t(spark, "lineitem", sf_dir)
    o = t(spark, "orders", sf_dir)
    ev = t(spark, "events", sf_dir)
    doc = t(spark, "documents", sf_dir)
    part = t(spark, "part", sf_dir)

    def check(df, table_name, check_name):
        return df.select(
            F.lit(table_name).alias("table_name"),
            F.lit(check_name).alias("check_name"),
            F.col("violations").cast("long").alias("violations"),
        )

    frames = [
        check(
            cust.agg(
                (F.count("*") - F.countDistinct("c_custkey")).alias(
                    "violations"
                )
            ),
            "customer",
            "pk_unique",
        ),
        check(
            # struct-based distinct mirrors DuckDB's ROW semantics: a
            # tuple with a NULL field still counts as one distinct key
            # (bare countDistinct(a, b) would SKIP it, so a NULL-keyed
            # row — the dirty data an audit exists to catch — would be
            # reported as a violation by Spark but not by the oracle;
            # review r9)
            li.agg(
                (
                    F.count("*")
                    - F.countDistinct(
                        F.struct("l_orderkey", "l_linenumber")
                    )
                ).alias("violations")
            ),
            "lineitem",
            "pk_unique",
        ),
        check(
            o.join(
                F.broadcast(cust.select("c_custkey")),
                o.o_custkey == F.col("c_custkey"),
                "left_anti",
            ).agg(F.count("*").alias("violations")),
            "orders",
            "custkey_ri",
        ),
        check(
            li.join(
                o.select("o_orderkey"),
                li.l_orderkey == F.col("o_orderkey"),
                "left_anti",
            ).agg(F.count("*").alias("violations")),
            "lineitem",
            "orderkey_ri",
        ),
        check(
            li.filter(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
            ).agg(F.count("*").alias("violations")),
            "lineitem",
            "discount_domain",
        ),
        check(
            li.filter(F.col("l_quantity") <= 0).agg(
                F.count("*").alias("violations")
            ),
            "lineitem",
            "quantity_positive",
        ),
        check(
            o.filter(F.col("o_totalprice").isNull()).agg(
                F.count("*").alias("violations")
            ),
            "orders",
            "totalprice_complete",
        ),
        check(
            ev.filter(
                F.col("ts").isNull()
                | (F.col("ts") < "2024-01-01 00:00:00")
                | (F.col("ts") >= "2024-02-01 00:00:00")
            ).agg(F.count("*").alias("violations")),
            "events",
            "ts_in_window",
        ),
        check(
            doc.filter(
                F.col("text").isNull() | (F.length("text") == 0)
            ).agg(F.count("*").alias("violations")),
            "documents",
            "text_nonempty",
        ),
        check(
            part.filter(F.col("p_retailprice") <= 0).agg(
                F.count("*").alias("violations")
            ),
            "part",
            "retailprice_positive",
        ),
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.withColumn(
        "passed", F.col("violations") == 0
    ).orderBy("table_name", "check_name")


_DRIFT_COLS = ("event_type", "props", "user_id", "value")


@register(
    "p21_drift_monitor",
    "D2",
    """
    WITH old AS (SELECT * FROM events WHERE event_id < 5000),
    o AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS nulls_event_type,
             SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS nulls_props,
             SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS nulls_user_id,
             SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS nulls_value,
             COUNT(DISTINCT event_type) AS ndv_event_type,
             COUNT(DISTINCT props) AS ndv_props,
             COUNT(DISTINCT user_id) AS ndv_user_id,
             COUNT(DISTINCT value) AS ndv_value
      FROM old
    ),
    w AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS nulls_event_type,
             SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS nulls_props,
             SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS nulls_user_id,
             SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS nulls_value,
             COUNT(DISTINCT event_type) AS ndv_event_type,
             COUNT(DISTINCT props) AS ndv_props,
             COUNT(DISTINCT user_id) AS ndv_user_id,
             COUNT(DISTINCT value) AS ndv_value
      FROM events
    ),
    cols AS (
      SELECT 'event_type' AS column_name,
             o.nulls_event_type AS old_nulls, w.nulls_event_type AS new_nulls,
             o.ndv_event_type AS old_ndv, w.ndv_event_type AS new_ndv,
             o.n AS old_n, w.n AS new_n FROM o, w
      UNION ALL
      SELECT 'props', o.nulls_props, w.nulls_props,
             o.ndv_props, w.ndv_props, o.n, w.n FROM o, w
      UNION ALL
      SELECT 'user_id', o.nulls_user_id, w.nulls_user_id,
             o.ndv_user_id, w.ndv_user_id, o.n, w.n FROM o, w
      UNION ALL
      SELECT 'value', o.nulls_value, w.nulls_value,
             o.ndv_value, w.ndv_value, o.n, w.n FROM o, w
    )
    SELECT column_name,
           CAST(old_nulls AS BIGINT) AS old_nulls,
           CAST(new_nulls AS BIGINT) AS new_nulls,
           CAST(old_ndv AS BIGINT) AS old_ndv,
           CAST(new_ndv AS BIGINT) AS new_ndv,
           ROUND(CAST(new_nulls AS DOUBLE) / new_n
                 - CAST(old_nulls AS DOUBLE) / old_n, 6) AS null_rate_drift,
           (ABS(CAST(new_nulls AS DOUBLE) / new_n
                - CAST(old_nulls AS DOUBLE) / old_n) > 0.01
            OR new_ndv < old_ndv) AS flagged
    FROM cols ORDER BY column_name
    """,
    note="SCHEMA/DISTRIBUTION DRIFT MONITOR — v1's longitudinal twin "
    "(public model: Deequ's AnalyzerContext diffs, Evidently-style "
    "column drift): per-column null rate and NDV compared between the "
    "previous snapshot (event_id < 5000, c2d's version convention) and "
    "the current table, with a flag when the null rate moves > 1 pp or "
    "the column's distinct count SHRINKS (the classic silent-upstream-"
    "break signatures: a producer starts emitting NULLs, or a category "
    "disappears). One scalar-aggregate scan per version computes every "
    "column's metrics (conditional counts + count-distincts share the "
    "pass), then a 4-row unpivot — at 100 TB this is two table scans "
    "total, no shuffle beyond the distinct rewrites, and the monitor "
    "output is COLUMNS x 1 rows whatever the data size.",
)
def p21_drift_monitor(spark, sf_dir):
    ev = t(spark, "events", sf_dir)

    def metrics(df, prefix):
        return df.agg(
            F.count("*").alias(f"{prefix}_n"),
            *[
                F.sum(F.col(c).isNull().cast("long")).alias(
                    f"{prefix}_nulls_{c}"
                )
                for c in _DRIFT_COLS
            ],
            *[
                F.countDistinct(c).alias(f"{prefix}_ndv_{c}")
                for c in _DRIFT_COLS
            ],
        )

    both = metrics(ev.filter(F.col("event_id") < 5000), "old").crossJoin(
        metrics(ev, "new")
    )
    stack_args = ", ".join(
        f"'{c}', old_nulls_{c}, new_nulls_{c}, old_ndv_{c}, new_ndv_{c}"
        for c in _DRIFT_COLS
    )
    per_col = both.select(
        F.expr(
            f"stack({len(_DRIFT_COLS)}, {stack_args}) AS "
            "(column_name, old_nulls, new_nulls, old_ndv, new_ndv)"
        ),
        "old_n",
        "new_n",
    )
    drift = F.col("new_nulls") / F.col("new_n") - F.col("old_nulls") / F.col(
        "old_n"
    )
    return per_col.select(
        "column_name",
        "old_nulls",
        "new_nulls",
        "old_ndv",
        "new_ndv",
        F.round(drift, 6).alias("null_rate_drift"),
        (
            (F.abs(drift) > 0.01) | (F.col("new_ndv") < F.col("old_ndv"))
        ).alias("flagged"),
    ).orderBy("column_name")
