"""Local DuckDB-oracle harness — mirrors the driver's correctness gate.

For each registry entry with an oracle: run the Spark plan and the DuckDB
SQL on the same parquet, canonicalize values, sort columns by name, sort
rows, and compare. This is intentionally STRICTER than needed so the
driver's order-insensitive value-hash check passes whenever this does.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
from typing import Any

import duckdb

from s3_kinesis_replay_spark.catalog import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh DuckDB with the fixture tables registered as views.

    ``events.ts`` is cast to microsecond TIMESTAMP to match Spark's
    TimestampType truncation of the parquet ns column.
    """
    con = duckdb.connect()
    for name in TABLES:
        path = f"{sf_dir}/{name}.parquet"
        if name == "events":
            con.execute(
                f"CREATE VIEW events AS SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) "
                f"FROM read_parquet('{path}')"
            )
        else:
            con.execute(f"CREATE VIEW {name} AS FROM read_parquet('{path}')")
    return con


def canon_value(v: Any) -> str:
    """Canonical string for one value — identical for semantically-equal
    Spark and DuckDB outputs."""
    if v is None:
        return "␀"  # NULL marker
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # shortest round-trip repr; bit-identical doubles agree
    if isinstance(v, decimal.Decimal):
        # STRICT: no trailing-zero stripping. The external driver renders
        # Spark's and DuckDB's Decimals differently (round-1 lesson: 14
        # hash-fails), so any Decimal reaching an output column must fail
        # loudly here too — declared queries final-cast decimals to double.
        return format(v, "f")
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_value(v[k])}" for k in sorted(v)) + "}"
    if hasattr(v, "asDict"):  # pyspark Row
        d = v.asDict()
        return "{" + ",".join(f"{k}:{canon_value(d[k])}" for k in sorted(d)) + "}"
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "tolist"):  # numpy array / scalar
        return canon_value(v.tolist())
    if hasattr(v, "item"):
        return canon_value(v.item())
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    """Project columns in sorted-name order, canonicalize, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def spark_result(df) -> tuple[list[str], list[tuple]]:
    cols = list(df.columns)
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def duck_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return cols, rows


def compare(
    spark_cols: list[str],
    spark_rows: list[tuple],
    duck_cols: list[str],
    duck_rows: list[tuple],
) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")
    a = canon_rows(spark_cols, spark_rows)
    b = canon_rows(duck_cols, duck_rows)
    if a != b:
        for i, (ra, rb) in enumerate(zip(a, b)):
            if ra != rb:
                problems.append(f"first row mismatch at sorted idx {i}: spark={ra} duck={rb}")
                break
        else:
            problems.append("rows differ in length tail")
    return problems
