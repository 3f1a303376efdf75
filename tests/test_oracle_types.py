"""Oracle output-type guard (SURVEY §5.3 discipline, VERDICT r2 item 3).

The external driver canonicalizes DuckDB results via pandas, which renders
HUGEINT as float64 ("6.0") and Decimal values with engine-specific scale —
both hash-mismatch against Spark's BIGINT/DOUBLE rendering even when the
values are identical. Round 1's failure class was DECIMAL outputs; round
2's was HUGEINT (DuckDB widens integer SUM/list_sum). This test DESCRIBEs
every registered oracle and fails if any output column declares either
type, so the drift is caught at declaration time instead of by the driver.
"""

from __future__ import annotations

import pytest

from s3_kinesis_replay_spark.registry import all_queries

_BANNED = ("HUGEINT", "DECIMAL")


def _oracle_queries():
    return [(n, q.oracle) for n, q in all_queries().items() if q.oracle is not None]


@pytest.mark.parametrize(
    "name,sql", _oracle_queries(), ids=[n for n, _ in _oracle_queries()]
)
def test_oracle_has_no_hugeint_or_decimal_outputs(duck, name, sql):
    desc = duck.execute(f"DESCRIBE {sql}").fetchall()
    drift = [
        (col, ty)
        for col, ty, *_ in desc
        if any(b in ty.upper() for b in _BANNED)
    ]
    assert not drift, (
        f"{name}: oracle output column(s) {drift} would hash-mismatch under "
        f"the driver's pandas canonicalizer — CAST to BIGINT/DOUBLE in the "
        f"oracle SQL (helpers.py discipline)"
    )
