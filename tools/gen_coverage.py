#!/usr/bin/env python
"""Regenerate COVERAGE.md: SURVEY §2 row → registry entries mapping,
plus the MEASURED recall-gate table (VERDICT r12 item 7) — run with
--no-gates to skip the Spark session the measurements need."""
from __future__ import annotations

import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from s3_kinesis_replay_spark.registry import all_queries  # noqa: E402

FAMILIES = {
    "A": ("Sources, sinks, replay pipeline", 10),
    "B": ("Projection, filter, row ops", 8),
    "C": ("Joins", 11),
    "D": ("Aggregation", 14),
    "E": ("Window functions", 7),
    "F": ("Sort / limit / set ops", 6),
    "G": ("Scalar functions", 11),
    "H": ("Streaming operators", 8),
    "I": ("LLM-data-pipeline operators", 17),
    "J": ("UDF / UDAF / UDTF surface", 6),
}


def gates_lines(sf_dir: str = "/root/testdata/sf0.01") -> list[str]:
    """Measure the two ENFORCED recall gates (they raise below their
    floors — running them IS the check) and render the values, so a
    fixture change that silently degrades recall shows up in this
    file's diff at review time, not only as a raise in CI (VERDICT r12
    item 7)."""
    from s3_kinesis_replay_spark.queries.llm_ops import (
        ANN_RECALL_FLOOR,
        LSH_RECALL_FLOOR,
    )
    from s3_kinesis_replay_spark.session import get_spark

    spark = get_spark(app_name="skr-coverage-gates")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    ann = qs["i20b_ann_recall_gate"].fn(spark, sf_dir).collect()[0]
    cal = qs["i21_lsh_calibration"].fn(spark, sf_dir).collect()
    hi = [r for r in cal if r["bucket"] >= 8]  # jaccard >= 0.8 buckets
    lsh_recall = round(
        sum(r["n_caught"] for r in hi) / sum(r["n_pairs"] for r in hi), 6
    )
    return [
        "## Enforced recall gates (measured at regen, sf0.01)",
        "",
        "Both entries RAISE engine-side below their floor; the measured",
        "values are recorded here so a silent fixture/parameter change that",
        "degrades recall is visible in review, not just as a CI raise.",
        "",
        "| gate | entry | floor | measured | detail |",
        "| --- | --- | --- | --- | --- |",
        f"| ANN mean recall@10 | `i20b_ann_recall_gate` | >= {ANN_RECALL_FLOOR} "
        f"| **{ann['mean_recall']}** | n_probe={ann['n_probe']}, "
        f"{ann['n_queries']} queries |",
        f"| LSH candidate recall @ jaccard>=0.8 | `i21_lsh_calibration` | "
        f">= {LSH_RECALL_FLOOR} | **{lsh_recall}** | H=32, B=16, r=2; "
        f"{sum(r['n_pairs'] for r in hi)} graded pairs |",
        "",
    ]


def main() -> None:
    qs = all_queries()
    by_id = defaultdict(list)
    for q in qs.values():
        by_id[q.survey_id].append(q)

    lines = [
        "# COVERAGE — SURVEY §2 contract → registry (auto-generated)",
        "",
        "Regenerate with `python tools/gen_coverage.py`. Every §2 row lists its",
        "registry entries (`__spark_entry__.queries()` keys), the check mode, and",
        "whether a DuckDB oracle is declared (rows-only entries are justified in",
        "their `note`).",
        "",
    ]
    total_rows = covered_rows = 0
    for fam, (title, n) in FAMILIES.items():
        lines += [f"## §2.{fam} {title}", "", "| row | registry entries | checks |",
                  "| --- | --- | --- |"]
        for i in range(1, n + 1):
            rid = f"{fam}{i}"
            total_rows += 1
            entries = sorted(by_id.get(rid, []), key=lambda q: q.name)
            if entries:
                covered_rows += 1
                names = ", ".join(f"`{q.name}`" for q in entries)
                checks = ", ".join(
                    f"{q.check}{'' if q.oracle else ' (rows-only)'}" for q in entries
                )
            else:
                names, checks = "—", "MISSING"
            lines.append(f"| {rid} | {names} | {checks} |")
        lines.append("")
    if "--no-gates" not in sys.argv:
        lines += gates_lines()
    n_oracle = sum(1 for q in qs.values() if q.oracle)
    lines += [
        "## Totals",
        "",
        f"- SURVEY §2 rows covered: **{covered_rows}/{total_rows}**",
        f"- Registry queries: **{len(qs)}** ({n_oracle} oracle-checked, "
        f"{len(qs) - n_oracle} rows-only)",
        "",
    ]
    Path(__file__).resolve().parent.parent.joinpath("COVERAGE.md").write_text(
        "\n".join(lines)
    )
    print(f"COVERAGE.md: {covered_rows}/{total_rows} rows, {len(qs)} queries")


if __name__ == "__main__":
    main()
