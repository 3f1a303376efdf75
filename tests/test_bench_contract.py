"""bench.py is load-bearing for the official per-round record — a stale
query name in HEADLINE/EXTRAS would fail the driver's bench run outright.
Pin its contract without paying a full bench execution."""

import importlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench
from s3_kinesis_replay_spark.registry import all_queries


def test_bench_names_resolve():
    qs = all_queries()
    missing = [n for n in bench.HEADLINE + bench.EXTRAS if n not in qs]
    assert not missing, f"bench names not in registry: {missing}"


def test_bench_headline_set_unchanged():
    """The headline set IS the BASELINE.md comparison series — adding or
    removing entries silently breaks cross-round comparability. Extend
    EXTRAS instead; change this pin only together with BASELINE.md.
    Round 5: i14_semdedup + i5b_batch_topk joined the headline set in the
    same change that re-recorded the BASELINE.md table (noop protocol)."""
    assert len(bench.HEADLINE) == 22
    assert bench.HEADLINE[0] == "q1_pricing_summary"
    assert bench.HEADLINE[-2:] == ["i14_semdedup", "i5b_batch_topk"]


def test_bench_module_reimports_cleanly():
    importlib.reload(bench)
