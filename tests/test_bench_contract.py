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
    missing = [
        n
        for n in bench.HEADLINE + bench.EXTRAS + bench.EXTRAS_ALWAYS
        if n not in qs
    ]
    assert not missing, f"bench names not in registry: {missing}"


def test_extras_rotation_covers_pool():
    """Every stable extra must cycle back within ceil(len/K) rounds, each
    round's slice is deterministic, and new-this-round entries are always
    included (VERDICT r9 item 6)."""
    k = bench.ROTATE_K
    pool = bench.EXTRAS
    rounds_to_cover = -(-len(pool) // k)
    covered = set()
    for rnd in range(10, 10 + rounds_to_cover):
        sel = bench.extras_for_round(rnd)
        assert sel == bench.extras_for_round(rnd), "rotation not deterministic"
        for n in bench.EXTRAS_ALWAYS:
            assert n in sel
        assert len(sel) <= k + len(bench.EXTRAS_ALWAYS)
        covered.update(sel)
    assert covered >= set(pool), sorted(set(pool) - covered)


def test_bench_round_semantics(tmp_path):
    """bench_round = max CORRECTNESS round + 1, pinned against synthetic
    dirs (review r10: the old test mirrored the implementation): empty
    dir -> round 1, gaps don't matter, stray glob-matching files that
    are not round records are skipped rather than crashed on."""
    assert bench.bench_round(tmp_path) == 1
    (tmp_path / "CORRECTNESS_r01.json").write_text("{}")
    (tmp_path / "CORRECTNESS_r07.json").write_text("{}")
    assert bench.bench_round(tmp_path) == 8
    (tmp_path / "CORRECTNESS_rerun.json").write_text("{}")
    (tmp_path / "CORRECTNESS_r.json").write_text("{}")
    assert bench.bench_round(tmp_path) == 8
    # Sanity-check against the live repo only when round records exist —
    # archiving/pruning CORRECTNESS_r*.json must not break a unit test
    # whose semantics the tmp_path cases above already pin (ADVICE r10).
    if list(bench.REPO.glob("CORRECTNESS_r[0-9]*.json")):
        assert bench.bench_round() >= 2


def test_bench_headline_set_unchanged():
    """The headline set IS the BASELINE.md comparison series — adding or
    removing entries silently breaks cross-round comparability. Extend
    EXTRAS instead; change this pin only together with BASELINE.md.
    Round 5: i14_semdedup + i5b_batch_topk joined the headline set in the
    same change that re-recorded the BASELINE.md table (noop protocol).
    Round 7: i3f_incremental_neardup + p14_bloom_contamination promoted
    from EXTRAS (VERDICT r6 item 5) in the same change that added their
    BASELINE.md rows (i3f 2.03, p14 1.11 — round-5b solo series) and
    restated the official headline baseline total as 20.23 s."""
    assert len(bench.HEADLINE) == 24
    assert bench.HEADLINE[0] == "q1_pricing_summary"
    assert bench.HEADLINE[-2:] == [
        "i3f_incremental_neardup",
        "p14_bloom_contamination",
    ]


def test_bench_module_reimports_cleanly():
    importlib.reload(bench)
