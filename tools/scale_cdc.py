#!/usr/bin/env python
"""Round-14 experiment: does row-level CDC really cost O(changed rows
+ touched files), not O(table)? Measured with the REAL operators on
REAL data files.

Setup per table size N: a table of N rows is built from C commits of
N/C rows each (contiguous, ascending key ranges — exactly what an
append-only ingest produces, and what gives manifest stats their
pruning power). Then ONE more commit of each change class lands and
``snapshot_row_changes(last-1, last)`` is timed:

* append   — insert events; reads only the new files.
* delete   — equality-delete of K keys from the NEWEST range; the
  preimage scan is stats-pruned to overlapping files, so cost should
  track the touched-file count, not N.
* update   — predicate UPDATE of K rows (positions name exact files);
  preimage reads only the addressed files.

If the per-commit CDC cost is flat while N grows 16x, the O(delta)
claim holds. The planning overhead (manifest + segment JSON walk) is
O(live files) driver-side metadata — reported separately via the
commit count.

Rerun with: python tools/scale_cdc.py
Results land in SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from s3_kinesis_replay_spark.operators import table_format as tf  # noqa: E402
from s3_kinesis_replay_spark.session import get_spark  # noqa: E402

NS = (250_000, 1_000_000, 4_000_000)
ROWS_PER_COMMIT = 250_000
K = 1_000  # changed rows per measured commit
BASE = "/tmp/skr_scale_cdc"


def build(spark, n: int) -> str:
    root = f"{BASE}/n{n}"
    shutil.rmtree(root, ignore_errors=True)
    for lo in range(0, n, ROWS_PER_COMMIT):
        df = spark.range(lo, lo + ROWS_PER_COMMIT).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        tf.snapshot_write(
            spark, df.coalesce(4), root,
            "overwrite" if lo == 0 else "append",
        )
    return root


def timed_changes(spark, root: str) -> float:
    v = tf.latest_version(root)
    t0 = time.perf_counter()
    n = tf.snapshot_row_changes(spark, root, v - 1, v).count()
    dt = time.perf_counter() - t0
    return round(dt, 3), n


def build_interleaved(spark, n: int) -> str:
    """r15 key-hash-index probe: commits whose key RANGES all overlap (keys
    striped mod #commits), the adversarial layout where min/max stats
    prune NOTHING — every file overlaps every delete."""
    root = f"{BASE}/il{n}"
    shutil.rmtree(root, ignore_errors=True)
    commits = max(2, n // ROWS_PER_COMMIT)
    for c in range(commits):
        df = spark.range(0, n // commits).select(
            (F.col("id") * commits + c).alias("k"),
            (F.col("id") * 2).alias("v"),
        )
        tf.snapshot_write(
            spark, df.coalesce(4), root,
            "overwrite" if c == 0 else "append",
        )
        if c == 0:
            # establish the row identity so every later commit blooms
            tf.snapshot_delete(
                spark, root,
                spark.createDataFrame([(-1,)], "k long"), "k",
            )
    return root


def kidx_probe(spark) -> None:
    """Delete K keys that live in ONE stripe (one commit's files) of an
    interleaved-key table: min/max stats keep every file a candidate;
    the per-file key-hash indexes (r15) must hold files-read ~flat as the
    table grows. Reported: eq_pre candidates before/after the bloom."""
    from s3_kinesis_replay_spark.streaming.changes_source import (
        SnapshotChangesStreamReader,
    )

    print()
    print("key-hash-index probe (interleaved keys — stats prune nothing):")
    print("| N rows | live files | stats candidates | kidx candidates "
          "| delete s | rows |")
    print("| --- | --- | --- | --- | --- | --- |")
    for n in NS:
        root = build_interleaved(spark, n)
        commits = max(2, n // ROWS_PER_COMMIT)
        # K keys of stripe 1 only (≡1 mod commits) — they live in the
        # files of ONE commit, but every file's [min,max] spans them
        dead = [i * commits + 1 for i in range(K)]
        tf.snapshot_delete(
            spark, root,
            spark.createDataFrame([(k,) for k in dead], "k long"), "k",
        )
        v = tf.latest_version(root)
        m = tf._read_manifest(root, v - 1)
        ents = tf._entries(m, root)
        klo, khi = dead[0], dead[-1]
        stats_cand = [
            e
            for e in ents
            if tf._stats_overlap((e.get("stats") or {}).get("k"), klo, khi)
        ]
        reader = SnapshotChangesStreamReader(None, {"root": root})
        parts = reader.partitions({"version": v - 1}, {"version": v})
        kidx_cand = [p for p in parts if p.kind == "eq_pre"]
        t, rows = timed_changes(spark, root)
        print(
            f"| {n:,} | {len(ents)} | {len(stats_cand)} | "
            f"{len(kidx_cand)} | {t} | {rows} |"
        )
        assert rows == K, rows
        shutil.rmtree(root, ignore_errors=True)


def merge_plan_probe(spark) -> None:
    """r16 (VERDICT r15 item 8): MERGE verdict sets ship as sorted
    uint64 hash-set SIDECARS (<root>/_cdcplan, path in the partition)
    instead of inline value tuples — plan serialization must stay FLAT
    as the merge's key count grows 10x. Reported: sum of per-partition
    pickle sizes (what Spark actually ships — each InputPartition
    serializes alone, so inline tuples used to cost O(keys x files))."""
    import pickle

    from s3_kinesis_replay_spark.streaming.changes_source import (
        SnapshotChangesStreamReader,
    )

    print()
    print("merge-CDC plan-shipping probe (hash-set sidecars, r16):")
    print("| table rows | files | merge keys | parts | shipped bytes "
          "| plan s |")
    print("| --- | --- | --- | --- | --- | --- |")
    n, commits = 400_000, 16
    for keys in (20_000, 200_000):
        root = build(spark, n)
        head0 = tf.latest_version(root)
        step = n // keys
        tf.snapshot_merge(
            spark,
            root,
            spark.range(0, keys).select(
                (F.col("id") * step).alias("k"), F.lit(-1).alias("v")
            ),
            "k",
        )
        reader = SnapshotChangesStreamReader(None, {"root": root})
        t0 = time.time()
        parts = reader.partitions(
            {"version": head0}, {"version": head0 + 1}
        )
        dt = round(time.time() - t0, 2)
        shipped = sum(len(pickle.dumps(p)) for p in parts)
        m = tf._read_manifest(root, head0)
        print(
            f"| {n:,} | {len(tf._entries(m, root))} | {keys:,} | "
            f"{len(parts)} | {shipped:,} | {dt} |"
        )
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    spark = get_spark(app_name="skr-scale-cdc")
    spark.sparkContext.setLogLevel("ERROR")
    print("| N rows | commits | append s | delete s | update s |")
    print("| --- | --- | --- | --- | --- |")
    for n in NS:
        root = build(spark, n)
        commits = tf.latest_version(root)
        tf.snapshot_write(
            spark,
            spark.range(n, n + K).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            ).coalesce(1),
            root,
            "append",
        )
        t_append, n_a = timed_changes(spark, root)
        assert n_a == K, n_a
        tf.snapshot_delete(
            spark,
            root,
            spark.range(n - K, n).select(F.col("id").alias("k")),
            "k",
        )
        t_delete, n_d = timed_changes(spark, root)
        assert n_d == K, n_d
        tf.snapshot_update_where(
            spark, root, f"k >= {n} AND k < {n + K}", {"v": "v + 1"}
        )
        t_update, n_u = timed_changes(spark, root)
        assert n_u == 2 * K, n_u  # preimage + postimage
        print(
            f"| {n:,} | {commits} | {t_append} | {t_delete} | {t_update} |"
        )
        shutil.rmtree(root, ignore_errors=True)
    kidx_probe(spark)
    merge_plan_probe(spark)


if __name__ == "__main__":
    main()
