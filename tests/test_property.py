"""Differential property tests (SURVEY §5.4, optional tier): hypothesis
generates random filter + aggregation shapes over lineitem; the engine and
the DuckDB oracle must agree after §5.3 canonicalization.

This catches semantics drift the hand-declared queries can't: operator
interactions (filter algebra × group-by × decimal aggs) across the whole
predicate space, not just the declared points.
"""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from s3_kinesis_replay_spark.catalog import table  # noqa: E402
from s3_kinesis_replay_spark.oracle import compare, duck_result, spark_result  # noqa: E402

# predicate atoms: (spark_col, duck_col, kind)
NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_linenumber"]
STR_COLS = ["l_returnflag", "l_linestatus"]
STR_VALS = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["F", "O"]}
OPS = ["<", "<=", ">", ">=", "=", "<>"]
BOUNDS = {
    "l_quantity": (1.0, 50.0),
    "l_extendedprice": (900.0, 105000.0),
    "l_discount": (0.0, 0.1),
    "l_linenumber": (1, 7),
}


@st.composite
def predicates(draw):
    n_atoms = draw(st.integers(1, 3))
    atoms = []
    for _ in range(n_atoms):
        if draw(st.booleans()):
            col = draw(st.sampled_from(NUM_COLS))
            lo, hi = BOUNDS[col]
            if isinstance(lo, int):
                val = draw(st.integers(lo, hi))
            else:
                # two-decimal literals: exactly representable in both engines
                val = round(draw(st.floats(lo, hi, allow_nan=False)), 2)
            op = draw(st.sampled_from(OPS))
            atoms.append(f"{col} {op} {val}")
        else:
            col = draw(st.sampled_from(STR_COLS))
            val = draw(st.sampled_from(STR_VALS[col]))
            op = draw(st.sampled_from(["=", "<>"]))
            atoms.append(f"{col} {op} '{val}'")
    glue = draw(st.lists(st.sampled_from(["AND", "OR"]), min_size=n_atoms - 1,
                         max_size=n_atoms - 1))
    sql = atoms[0]
    for g, a in zip(glue, atoms[1:]):
        sql = f"({sql}) {g} ({a})"
    return sql


GROUPS = [None, ["l_returnflag"], ["l_returnflag", "l_linestatus"]]


@pytest.mark.usefixtures("spark", "duck")
class TestDifferential:
    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(pred=predicates(), gi=st.integers(0, len(GROUPS) - 1))
    def test_filter_agg_matches_duckdb(self, spark, duck, sf_dir, pred, gi):
        group = GROUPS[gi]
        li = table(spark, "lineitem", sf_dir).filter(F.expr(pred))
        aggs = [
            F.count("*").alias("n"),
            F.sum(F.expr("CAST(l_quantity AS DECIMAL(38,6))")).alias("sum_qty"),
            F.min("l_orderkey").alias("min_key"),
        ]
        if group:
            sdf = li.groupBy(*group).agg(*aggs)
            gsql = ", ".join(group)
            osql = (
                f"SELECT {gsql}, CAST(COUNT(*) AS BIGINT) AS n, "
                f"SUM(CAST(l_quantity AS DECIMAL(38,6))) AS sum_qty, "
                f"MIN(l_orderkey) AS min_key FROM lineitem WHERE {pred} "
                f"GROUP BY {gsql}"
            )
        else:
            sdf = li.agg(*aggs)
            osql = (
                f"SELECT CAST(COUNT(*) AS BIGINT) AS n, "
                f"SUM(CAST(l_quantity AS DECIMAL(38,6))) AS sum_qty, "
                f"MIN(l_orderkey) AS min_key FROM lineitem WHERE {pred}"
            )
        s_cols, s_rows = spark_result(sdf)
        d_cols, d_rows = duck_result(duck, osql)
        problems = compare(s_cols, s_rows, d_cols, d_rows)
        assert not problems, f"pred={pred!r} group={group}: " + "; ".join(problems)
