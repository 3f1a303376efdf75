"""Driver contract for the spark-graft builder (PySpark target).

Exposes the engine's declared-query registry (SURVEY.md §2 — one entry
per operator row) to the driver: ``queries()`` returns the PySpark plans,
``oracle_sql()`` the matching DuckDB SQL. Canonicalization discipline
(decimal money aggs, rounded doubles, aligned aliases) lives in
``s3_kinesis_replay_spark/queries/`` — see helpers.py.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from s3_kinesis_replay_spark.registry import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    q = all_queries()["q1_pricing_summary"]
    return q.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted → rows-only check."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
