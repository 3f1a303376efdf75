#!/usr/bin/env python
"""Dump `.explain("formatted")` for bench headline queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> [suffix] [query ...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix defaults to "before").
With no query list, dumps every HEADLINE entry from bench.py except
replay_roundtrip (a streaming round trip — no batch plan to explain).

Plan capture only (no noop execution), so it is safe to run while other
work occupies the host: `explain` output is load-independent.
"""
from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import HEADLINE, SF_DIR  # noqa: E402
from s3_kinesis_replay_spark.registry import all_queries  # noqa: E402
from s3_kinesis_replay_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r16"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or [q for q in HEADLINE if q != "replay_roundtrip"]
    out_dir = REPO / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark(app_name="skr-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in names:
        df = qs[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt", file=sys.stderr)


if __name__ == "__main__":
    main()
