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
                 "h4", "h5_", "h6_", "h7", "h8", "a8", "p18", "c2c", "d4c",
                 "d8d", "p19")

COLS = [
    "exchanges", "single_partition", "sp_class", "broadcast_joins",
    "shuffle_joins", "take_ordered", "window_group_limit",
    "partial_agg_pairs", "pushed_filters", "partition_filters",
    "codegen_spans", "python_ops", "aqe", "rdd_scans", "scans",
]

# Declared-semantics exemptions: queries whose UNBOUNDED single-partition
# funnel is the DECLARED contract (with the scale-safe sibling named).
# Everything else with an UNBOUNDED funnel fails the audit test.
SP_UNBOUNDED_DECLARED: dict[str, str] = {}


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
        "`sp_class` machine-classifies every `Exchange SinglePartition`",
        "funnel (round 8; replaces the former hand-listed whitelist):",
        "`bounded(<op>)` = a row-count-bounding operator (aggregate /",
        "limit / group-top-k) feeds the funnel, so at 100 TB the funnel",
        "carries group-space rows, not data; `UNBOUNDED` = raw rows",
        "through one task — the audit test",
        "(tests/test_operators.py::test_no_undeclared_unbounded_funnels)",
        "fails on any UNBOUNDED entry not declared in",
        "tools/gen_plans.py:SP_UNBOUNDED_DECLARED (currently empty —",
        "p5's global ntile, the last one, was rewritten to agg-rank).",
        "`python_ops` > 0 only where the operator is Python by",
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
