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
