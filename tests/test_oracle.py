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
# The three SURVEY §2 rows declared TOL (B8/D4/D7) can never hash-match an
# exact oracle, so each asserts its DECLARED bound against the DuckDB
# exact value here — "rows-only" never degrades to "unchecked"
# (VERDICT r3 item 6). Spec: (registry name, DuckDB exact-value SQL,
# Spark-side approx extractor, bound fn(approx, exact) -> (ok, detail)).

_TOL_SPECS = [
    pytest.param(
        "b8_sample_seeded",
        "SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem",
        lambda df: float(df.count()),
        # declared bound: Bernoulli(p=0.1) sample count within a 6-sigma
        # binomial CI of p*N
        lambda n_sample, n_total: (
            abs(n_sample - 0.1 * n_total)
            < 6 * (n_total * 0.1 * 0.9) ** 0.5,
            f"|{n_sample} - 0.1*{n_total}| vs 6*sqrt(N*p*(1-p))",
        ),
        id="b8-binomial-6sigma-ci",
    ),
    pytest.param(
        "d4_approx_count_distinct",
        "SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) FROM lineitem",
        lambda df: float(df.collect()[0]["approx_parts"]),
        # declared bound: HLL++ rsd=0.02 → ±5% of the exact distinct count
        # (2.5 standard errors)
        lambda approx, exact: (
            abs(approx - exact) <= 0.05 * exact,
            f"|{approx} - {exact}| vs 0.05*exact",
        ),
        id="d4-hll-rsd-bound",
    ),
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
    pytest.param(
        "d7_percentile_approx",
        "SELECT quantile_cont(o_totalprice, 0.5) FROM orders",
        lambda df: float(df.collect()[0]["p50_approx"]),
        # declared bound: accuracy=10000 → rank error ≤ n/10000; mapped to
        # a generous 1% value-space bound on this distribution
        lambda approx, exact: (
            abs(approx - exact) <= 0.01 * abs(exact),
            f"|{approx} - {exact}| vs 0.01*|exact|",
        ),
        id="d7-gk-accuracy-bound",
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
