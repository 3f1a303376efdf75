"""Driver-contract probes for __spark_entry__ (SURVEY §3.2 / verify recipe).

The driver imports ``__spark_entry__`` and calls ``entry`` / ``queries`` /
``oracle_sql`` with its own session; these tests pin the contract properties
the driver relies on but the oracle comparison doesn't directly check:
determinism of ``entry()``, schema stability across scale factors, and a
clean analysis-time error for a missing sf_dir.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.errors import AnalysisException

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as spark_entry  # noqa: E402

# Batch-only subset for cross-SF schema checks: streaming registry entries
# execute a real AvailableNow stream per call, so they are exercised in
# tests/test_streaming.py instead of re-run here.
SCHEMA_STABLE_SUBSET = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "c1_inner_join",
    "c8_asof_join",
    "d3_count_distinct",
    "d11_rollup",
    "e1_ranking",
    "f3_global_topk",
    "i1_exact_dedup",
    "i5_topk_cosine",
    "i7_wordcount",
    "t1_language_id",
]


def test_entry_is_deterministic(spark):
    df1 = spark_entry.entry(spark)
    df2 = spark_entry.entry(spark)
    assert df1.schema == df2.schema
    rows1 = sorted(map(tuple, df1.collect()))
    rows2 = sorted(map(tuple, df2.collect()))
    assert len(rows1) >= 1
    assert rows1 == rows2


def test_registry_keys_consistent():
    qs = spark_entry.queries()
    oracles = spark_entry.oracle_sql()
    assert len(qs) >= 117
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert name and name == name.strip()
        assert callable(fn)
    for sql in oracles.values():
        assert isinstance(sql, str) and "SELECT" in sql.upper()


@pytest.mark.parametrize("name", SCHEMA_STABLE_SUBSET)
def test_schema_stable_across_sf(spark, name):
    """Same analyzed schema at sf0.001 and sf0.01 (analysis only, no job)."""
    fn = spark_entry.queries()[name]
    s_small = fn(spark, "/root/testdata/sf0.001").schema
    s_big = fn(spark, "/root/testdata/sf0.01").schema
    assert s_small == s_big


def test_missing_sf_dir_raises_analysis_error(spark):
    fn = spark_entry.queries()["q1_pricing_summary"]
    with pytest.raises(AnalysisException):
        fn(spark, "/root/testdata/does-not-exist").collect()
