"""t2 correctness: every registry entry with an oracle must match DuckDB.

Mirrors the driver's gate (row count + schema + order-insensitive
value-hash) but strictly — see s3_kinesis_replay_spark.oracle.
"""

from __future__ import annotations

import pytest

from s3_kinesis_replay_spark.oracle import compare, duck_result, spark_result
from s3_kinesis_replay_spark.registry import all_queries

QUERIES = all_queries()
ORACLE_KEYS = [k for k, q in QUERIES.items() if q.oracle is not None]
ROWS_ONLY_KEYS = [k for k, q in QUERIES.items() if q.oracle is None]


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_match(name, spark, duck, sf_dir):
    q = QUERIES[name]
    s_cols, s_rows = spark_result(q.fn(spark, sf_dir))
    d_cols, d_rows = duck_result(duck, q.oracle)
    problems = compare(s_cols, s_rows, d_cols, d_rows)
    assert not problems, f"{name} [{q.survey_id}]: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_KEYS)
def test_rows_only_runs(name, spark, sf_dir):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    n = df.count()
    assert n >= 0


# ---------------------------------------------------------------- TOL rows
# Approximate operators assert their DECLARED bound against the DuckDB
# exact value here — approximation never degrades to "unchecked"
# (VERDICT r3 item 6). Since round 8, b8/d4/d7/g4b are flag-oracles
# (driver-hash-checked; raw bounds pinned in tests/test_operators.py);
# d4b keeps its raw union-merge bound here. Spec: (registry name, DuckDB
# exact-value SQL, Spark-side approx extractor, bound fn -> (ok, detail)).

_TOL_SPECS = [
    pytest.param(
        "d4b_hll_sketch_union",
        "SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events",
        lambda df: float(
            [r["est_users"] for r in df.collect() if r["event_type"] == "__all__"][0]
        ),
        # declared bound: Datasketches HLL default lgK=12 → rsd ≈ 1.6%;
        # union-merged estimate within ±5% (3 standard errors)
        lambda approx, exact: (
            abs(approx - exact) <= 0.05 * exact,
            f"|{approx} - {exact}| vs 0.05*exact",
        ),
        id="d4b-hll-union-bound",
    ),
]


@pytest.mark.parametrize("name,exact_sql,extract,bound", _TOL_SPECS)
def test_tol_rows_against_duck_exact(name, exact_sql, extract, bound, spark, duck, sf_dir):
    approx = extract(QUERIES[name].fn(spark, sf_dir))
    exact = float(duck.execute(exact_sql).fetchone()[0])
    ok, detail = bound(approx, exact)
    assert ok, f"{name}: declared TOL bound violated: {detail}"


# ---------------------------------------------------------- harness guards
def test_harness_detects_wrong_results(spark, duck, sf_dir):
    """Meta-test: the compare harness must FAIL on a deliberately wrong
    engine result — guards against a silently-vacuous comparison (e.g. a
    canonicalizer that maps everything to the same string)."""
    from pyspark.sql import functions as F

    from s3_kinesis_replay_spark.oracle import compare, duck_result, spark_result
    from s3_kinesis_replay_spark.catalog import table

    osql = (
        "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM lineitem GROUP BY l_returnflag"
    )
    li = table(spark, "lineitem", sf_dir)
    good = li.groupBy("l_returnflag").agg(F.count("*").alias("n"))
    d_cols, d_rows = duck_result(duck, osql)
    assert not compare(*spark_result(good), d_cols, d_rows)

    # wrong values (off-by-one count) must be reported
    off = li.groupBy("l_returnflag").agg((F.count("*") + 1).alias("n"))
    assert compare(*spark_result(off), d_cols, d_rows)

    # wrong row set (dropped group) must be reported
    dropped = (
        li.filter(F.col("l_returnflag") != "A")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
    )
    assert compare(*spark_result(dropped), d_cols, d_rows)

    # wrong column naming must be reported
    renamed = li.groupBy("l_returnflag").agg(F.count("*").alias("cnt"))
    assert compare(*spark_result(renamed), d_cols, d_rows)
