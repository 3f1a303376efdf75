#!/usr/bin/env python
"""Round-12b experiment: quantify the two-level-manifest commit win.

The a15i gate proves the PROPERTY (append metadata is O(one
descriptor)); this measures the NUMBERS: for a table already holding N
file entries, how many bytes and milliseconds does appending one
100-file commit cost under (a) the r12 FLAT manifest (re-serialize
every entry) vs (b) the r12b SEGMENTED manifest (one new segment + one
descriptor list)?

Pure-metadata microbenchmark — entries are synthetic ({path, stats}
dicts shaped exactly like production ones: 3 stat columns), no Spark,
no parquet. That is the point: at 100k files the metadata tier alone
decides whether per-micro-batch ingest (a15c/a15j) stays viable.

Rerun with: python tools/scale_manifest_commit.py
Results land in SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import time

NS = (1_000, 10_000, 100_000)
BATCH = 100  # files per append commit
RUNS = 5
BASE = "/tmp/skr_scale_manifest"


def entry(i: int) -> dict:
    return {
        "path": f"data/part-{i:012x}/part-00000-{i:032x}.snappy.parquet",
        "stats": {
            "event_id": [i * 500, i * 500 + 499],
            "user_id": [0, 9999],
            "value": [0.000001, 999.999999],
        },
    }


def timed(fn) -> float:
    s = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        s.append((time.perf_counter() - t0) * 1000)
    return round(statistics.median(s), 2)


def flat_append(root: str, prior: list[dict], new: list[dict]) -> int:
    """The r12 flat shape: manifest carries every entry inline."""
    m = {"version": 2, "operation": "append", "files": prior + new}
    path = os.path.join(root, "flat.json")
    with open(path, "w") as f:
        json.dump(m, f)
    return os.path.getsize(path)


def segmented_append(
    root: str, prior_descs: list[dict], new: list[dict]
) -> int:
    """The r12b shape: one new segment + descriptor-only manifest."""
    seg = os.path.join(root, f"seg-{len(prior_descs)}.json")
    with open(seg, "w") as f:
        json.dump({"entries": new}, f)
    m = {
        "version": 2,
        "operation": "append",
        "segments": prior_descs + [{"path": seg, "seq": 2}],
    }
    path = os.path.join(root, "seg-manifest.json")
    with open(path, "w") as f:
        json.dump(m, f)
    return os.path.getsize(path) + os.path.getsize(seg)


def main() -> None:
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE)
    new = [entry(10**9 + i) for i in range(BATCH)]
    print(f"append of {BATCH} files onto a table of N entries "
          f"({RUNS}-run medians):")
    print("| N entries | flat: bytes written | flat: ms | "
          "segmented: bytes written | segmented: ms |")
    print("| --- | --- | --- | --- | --- |")
    for n in NS:
        root = os.path.join(BASE, f"n{n}")
        os.makedirs(root, exist_ok=True)
        prior = [entry(i) for i in range(n)]
        # prior segments: one per BATCH files, as real ingest produces
        descs = [
            {"path": f"segments/seg-{j}.json", "seq": j + 1}
            for j in range(n // BATCH)
        ]
        fb = flat_append(root, prior, new)
        ft = timed(lambda: flat_append(root, prior, new))
        sb = segmented_append(root, descs, new)
        st = timed(lambda: segmented_append(root, descs, new))
        print(
            f"| {n:,} | {fb:,} B | {ft} | {sb:,} B | {st} |"
        )
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
