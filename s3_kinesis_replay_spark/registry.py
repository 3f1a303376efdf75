"""Query registry — the SURVEY.md §2 contract, executable.

Every declared operator registers here as a named entry pairing

* ``fn(spark, sf_dir) -> DataFrame`` — the engine-side PySpark plan, and
* ``oracle`` — the equivalent ANSI SQL the DuckDB oracle runs on the same
  parquet tables (views: region nation customer supplier part orders
  lineitem events documents embeddings),

plus a check mode (EXACT / TOL / SEM — SURVEY §2) for the local harness.
``__spark_entry__.py`` exposes this registry to the driver verbatim.

Canonicalization discipline (SURVEY §5.3), applied at declaration time:

* money aggregates run in DECIMAL(38,6) in BOTH engines (exact, order-
  independent — no float accumulation-order flakes);
* residual doubles (ratios, similarity scores) are rounded to a declared
  number of digits in BOTH engines so value-hashes agree;
* integer SUMs in DuckDB are cast back to BIGINT (DuckDB widens to
  HUGEINT, Spark stays LongType);
* every aggregate/computed column carries the SAME alias in both engines;
* top-k queries carry a unique tiebreak key so the result SET is
  deterministic even though hashing is order-insensitive.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str  # registry key, e.g. "d1_groupby_basic"
    survey_id: str  # SURVEY §2 row, e.g. "D1"
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → rows-only check (non-SQL ops)
    check: str = "EXACT"  # EXACT | TOL | SEM
    tol: float = 0.0
    note: str = ""


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    survey_id: str,
    oracle: str | None,
    check: str = "EXACT",
    tol: float = 0.0,
    note: str = "",
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the registry under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, survey_id, fn, oracle, check, tol, note)
        return fn

    return deco


# DRIVER WINDOW: the external driver verifies the FIRST 50 entries of
# queries() in order, so that ordering IS the verification plan. It is
# generated (not hand-curated) by tools/window_tool.py from the driver's
# own CORRECTNESS_r*.json history: never-checked entries first, then
# entries whose query-fn (or referenced operators/streaming helper)
# source changed since their last green, then oldest-green ballast.
# After code changes: run `python tools/window_tool.py update-green` if a
# new CORRECTNESS_r*.json has landed (emit refuses otherwise), then
# `python tools/window_tool.py emit`.
def _window_first() -> list[str]:
    import json
    from pathlib import Path

    path = Path(__file__).resolve().parent / "window.json"
    if not path.exists():
        return []
    return json.loads(path.read_text())["first"]


def all_queries() -> dict[str, Query]:
    """Import all query modules (side-effect registration) and return the
    registry, reordered so the generated driver window (window.json) comes
    first; all other entries keep module registration order after it.
    """
    # Imports deferred so `import s3_kinesis_replay_spark` stays cheap.
    from s3_kinesis_replay_spark.queries import (  # noqa: F401
        scalar_functions,
        llm_ops,
        custom_ops,
        sources_q,
        pipeline_ops,
        udfs,
        streaming_batch,
        streaming_live,
        relational,
        aggregates,
        windows,
        tpch_extra,
        quality,
    )

    first = _window_first()
    missing = [n for n in first if n not in _REGISTRY]
    if missing:  # explicit raise: survives `python -O` (assert would not)
        raise ValueError(
            f"window.json names not in registry: {missing} — "
            "re-run `python tools/window_tool.py emit` after renames"
        )
    ordered: dict[str, Query] = {}
    for name in first:
        ordered[name] = _REGISTRY[name]
    for name, q in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered
