#!/usr/bin/env python
"""Round-13 experiment: measure the METADATA-ONLY table verbs against
table size, using the REAL operators (not synthetic shapes) — the
claims "restore/publish/tag are O(descriptors), never O(files/data)"
get numbers the same way scale_manifest_commit.py numbered the
two-level-commit claim.

A table of N file entries is installed through the real
_write_segment/_commit path (one segment per 100-file commit, exactly
what ingest produces). Data files never exist on disk: every verb
measured here is metadata-only, which is the point — if any of them
accidentally touched data or footers this harness would crash, so the
run itself is also a no-data-IO proof.

Measured per N: snapshot_tag (pin a name), snapshot_restore (roll
latest back to v1), snapshot_branch (fork) + snapshot_publish
(fast-forward main), and snapshot_fold_metadata (the one verb that IS
O(N) by design — it rewrites every entry into one segment; shown for
contrast).

Rerun with: python tools/scale_table_verbs.py
Results land in SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3_kinesis_replay_spark.operators import table_format as tf  # noqa: E402

NS = (1_000, 10_000, 100_000)
BATCH = 100  # files per ingest commit
RUNS = 5
BASE = "/tmp/skr_scale_verbs"


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


def install(root: str, n: int) -> None:
    """N entries via the real ingest path: one commit per BATCH files."""
    os.makedirs(root, exist_ok=True)
    prev = None
    for j in range(n // BATCH):
        seg = tf._write_segment(
            root, [entry(j * BATCH + i) for i in range(BATCH)]
        )
        v = tf._commit(
            root,
            j,
            "append",
            carry_from=prev,
            new_segment=seg,
            schema=[["event_id", "bigint"], ["user_id", "bigint"],
                    ["value", "double"]],
        )
        prev = tf._read_manifest(root, v)


def main() -> None:
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE)
    print(f"metadata verbs on a table of N file entries "
          f"({BATCH}-file commits, {RUNS}-run medians, REAL operators):")
    print("| N files | #descriptors | tag ms | restore ms | "
          "restored manifest B | fork ms | publish ms | fold ms |")
    print("| --- | --- | --- | --- | --- | --- | --- | --- |")
    for n in NS:
        root = os.path.join(BASE, f"n{n}")
        install(root, n)
        head = tf.latest_version(root)
        n_descs = len(tf._read_manifest(root, head).get("segments", []))

        k = [0]

        def tag_once():
            k[0] += 1
            tf.snapshot_tag(root, f"t{k[0]}")

        tag_ms = timed(tag_once)
        restore_ms = timed(lambda: tf.snapshot_restore(root, 1))
        # restore-to-v1 manifests alternate with the timing loop's
        # re-restores; measure the last one's size
        rb = os.path.getsize(tf._manifest_path(root, tf.latest_version(root)))
        # put latest back at the full table before branching
        tf.snapshot_restore(root, head)

        b = [0]

        def fork_once():
            b[0] += 1
            tf.snapshot_branch(root, f"b{b[0]}")

        fork_ms = timed(fork_once)

        # a publish advances main, so each timed publish needs a branch
        # forked at main's THEN-latest: fork+publish interleave, timing
        # only the publish (base-validation at its own fork point)
        pub_s = []
        for i in range(RUNS):
            name = f"q{i}"
            tf.snapshot_branch(root, name)
            t0 = time.perf_counter()
            tf.snapshot_publish(root, name)
            pub_s.append((time.perf_counter() - t0) * 1000)
        publish_ms = round(statistics.median(pub_s), 2)

        # fold is destructive (after one, the rest no-op): time it once
        t0 = time.perf_counter()
        tf.snapshot_fold_metadata(root)
        fold_ms = round((time.perf_counter() - t0) * 1000, 2)
        print(
            f"| {n:,} | {n_descs} | {tag_ms} | {restore_ms} | {rb:,} | "
            f"{fork_ms} | {publish_ms} | {fold_ms} |"
        )
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
