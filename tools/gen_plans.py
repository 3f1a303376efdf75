#!/usr/bin/env python
"""Regenerate PLANS.md: per-query physical-plan audit (SURVEY §4 evidence).

Streaming entries whose registry fn EXECUTES a stream (the live SEM
checks) are skipped — their plan evidence lives in tests/test_streaming.py
— as are sink-roundtrip entries that write files at build time.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from s3_kinesis_replay_spark.plans.audit import audit_plan  # noqa: E402
from s3_kinesis_replay_spark.registry import all_queries  # noqa: E402
from s3_kinesis_replay_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

# fns that run a real stream (or stage sinks) when called — audited by the
# streaming test suite instead; listing them here documents the split.
SKIP_PREFIXES = ("a6", "a7", "a9", "a10", "c10", "c11", "h1_", "h2_", "h3_",
                 "h4", "h5_", "h6_", "h7", "h8", "a8", "p18")

COLS = [
    "exchanges", "single_partition", "broadcast_joins", "shuffle_joins",
    "take_ordered", "window_group_limit", "partial_agg_pairs",
    "pushed_filters", "partition_filters", "codegen_spans", "python_ops",
    "aqe", "rdd_scans", "scans",
]


def fmt(v) -> str:
    if isinstance(v, bool):
        return "yes" if v else ""
    return str(v) if v else ""


def main() -> None:
    spark = get_spark(app_name="skr-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    lines = [
        "# PLANS — physical-plan audit (auto-generated)",
        "",
        "Regenerate with `python tools/gen_plans.py` (analyzes the AQE",
        "initial plan at sf0.01; no query execution). Empty cell = 0/no.",
        "`single_partition` > 0 is acceptable only for declared-global",
        "sorts/limits (F1/F2/F3-class) and scalar/1-row aggregates — current",
        "set: global counts (i1b, d2, d4, d7, d8b, a5b), the 1-row IDF `N`",
        "(i8), the 4-row funnel window (p4), global ntile (p5), the",
        "vocab-sized id-assignment rank (i7b — runs on the aggregated",
        "vocabulary, not the corpus), global-threshold 1-row aggs",
        "(q15/q17/q22, p11) — all bounded",
        "outputs. `python_ops` > 0 only where the operator is Python by",
        "design (J rows, mapInPandas tiers, multimodal, grid matmuls).",
        "`codegen_spans` under-counts before execution under AQE (the",
        "initial plan prints without codegen annotations). Streaming-live",
        "entries are audited by tests/test_streaming.py instead (their",
        "registry fns execute streams).",
        "",
        "| query | " + " | ".join(COLS) + " |",
        "| --- | " + " | ".join("---" for _ in COLS) + " |",
    ]
    skipped = []
    for name, q in qs.items():
        if any(name.startswith(p) for p in SKIP_PREFIXES):
            skipped.append(name)
            continue
        feats = audit_plan(q.fn(spark, SF))
        lines.append(
            f"| {name} | " + " | ".join(fmt(feats[c]) for c in COLS) + " |"
        )
    lines += [
        "",
        f"Skipped (stream-executing / sink-staging fns): {', '.join(skipped)}",
        "",
    ]
    Path(__file__).resolve().parent.parent.joinpath("PLANS.md").write_text(
        "\n".join(lines)
    )
    print(f"PLANS.md: {len(qs) - len(skipped)} audited, {len(skipped)} skipped")


if __name__ == "__main__":
    main()
