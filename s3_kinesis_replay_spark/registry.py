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


# ROUND-3 WINDOW (VERDICT r2 items 2/5): the external driver verifies the
# FIRST 50 entries of queries() in order. Rounds 1+2 covered 100 of 127
# entries across two disjoint windows; this list front-loads every entry
# that (a) has never received a driver verdict (udfs 6, streaming_batch 8,
# streaming_live 9, pipeline p4-p7), (b) hash-failed in round 2 with fixes
# landed (g7_array_hof, p2_shard_packing), or (c) failed in round 1 with
# fixes landed but never re-verified (q1/q3/q5/b7/c3, d2/d9/d10-d14,
# e4/e6). Remaining slots carry the pipeline/IVF entries touched this
# round. Entries not listed follow in their module registration order.
_ROUND3_FIRST = [
    # (b) round-2 hash-fails, fixes landed this round — re-verify first
    "g7_array_hof",
    "p2_shard_packing",
    # (c) round-1 FAIL/ERR entries whose fixes never re-entered the window
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "b7_casts",
    "c3_broadcast_join",
    "d2_global_agg",
    "d9_collect_list_set",
    "d10_filtered_agg",
    "d11_rollup",
    "d11b_cube",
    "d12_pivot",
    "d13_having",
    "d14_sum_distinct",
    "e4_running_total",
    "e6_range_frame",
    # (a) never checked: UDF surface
    "j1_scalar_udf",
    "j2_pandas_udf_scalar",
    "j3_pandas_grouped_agg",
    "j4_grouped_map",
    "j5_map_in_pandas",
    "j6_udtf_shingles",
    # (a) never checked: streaming (batch-variant SEM)
    "h1_tumbling_window",
    "h1b_tumbling_window_batch",
    "h2_sliding_window",
    "h2b_sliding_window_batch",
    "h3_session_window",
    "h3b_session_window_batch",
    "h5_streaming_dedup",
    "h6_stateful_running_count",
    # (a) never checked: live streaming / replay surface
    "a6_streaming_source",
    "a7_kinesis_sink",
    "a9_replay_pacing",
    "a10_checkpoint_resume",
    "c10_stream_static_join",
    "c11_stream_stream_join",
    "h4_watermark_late_drop",
    "h7_output_mode_complete",
    "h8_ordered_emission",
    # (a) never checked: pipeline p4-p7
    "p4_quality_funnel",
    "p5_curriculum_deciles",
    "p6_random_projection",
    "p7_contamination_check",
    # fill: pipeline/IVF entries touched this round
    "p3_hash_split",
    "i13_ivf_topk",
]


def all_queries() -> dict[str, Query]:
    """Import all query modules (side-effect registration) and return the
    registry, reordered so the round-3 driver window (_ROUND3_FIRST) comes
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
    )

    ordered: dict[str, Query] = {}
    for name in _ROUND3_FIRST:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, q in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered
