#!/usr/bin/env python
"""Round-12 experiment (VERDICT r11 "what's wrong" item 3): decompose
the streaming composites' fixed AvailableNow drain floor from their
per-row cost, using d7c (streaming quantile merge) as the
representative — it was the most expensive streaming extra in BENCH_r11
(4.1 s) and its batch tier (quantile partials + merge) is cheap, so the
floor dominates and a real operator regression could hide under it.

Method: for k in {1, 4, 16} build a k-fold replica of the staged gzip
event archive (same files duplicated under distinct names — the drain
reads bytes; row identity is irrelevant to floor/slope), then time

1. empty(k): identical stream (same source, same pacing rule, same
   AvailableNow trigger) into a foreachBatch sink that does NOTHING —
   pure micro-batch machinery: listing, offset log, batch planning,
   checkpoint commits. This is the FLOOR.
2. full(k): the d7c pipeline over the same dir (per-batch weighted
   quantile summaries written as parquet artifacts + drain-end merge).
   full(k) - empty(k) is the OPERATOR's own cost at k.

SPARK_GRAFT_FLOOR_RUNS timed runs after one warm-up (default 2 — the
"median" of two runs is their mean; SCALE.md labels the recorded
numbers accordingly). The pacing rule (files/5, the entry's
own _pace_per_trigger) keeps batch COUNT roughly constant while batch
SIZE grows k-fold, so a flat empty(k) series confirms the floor is
per-BATCH, not per-row. Results land in SCALE.md; rerun with
  python tools/scale_drain_floor.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)
KS = (1, 4, 16)
RUNS = int(os.environ.get("SPARK_GRAFT_FLOOR_RUNS", "2"))
# v2: replica names keep the part- prefix — pace_per_trigger counts
# part-* files, so r0-part-* names made it fall to the floor (6) and
# blew the batch count up 7-100x instead of holding it at ~5
BASE = "/tmp/skr_drainfloor2"


def replicated_archive(base_root: str, k: int) -> str:
    """k-fold copy of the staged archive's gz files under distinct names
    (content replicas — the drain cost is bytes/files, not identities)."""
    out = f"{BASE}/k{k}"
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    # preserve the dt=/hr= partition tree (stream_archive's source shape)
    for dirpath, _dirs, files in os.walk(base_root):
        rel = os.path.relpath(dirpath, base_root)
        tgt = out if rel == "." else os.path.join(out, rel)
        os.makedirs(tgt, exist_ok=True)
        for f in files:
            if not f.endswith(".gz"):
                continue
            for i in range(k):
                os.link(
                    os.path.join(dirpath, f),
                    os.path.join(tgt, f"part-r{i}-{f[5:]}"),
                )
    open(done, "w").close()
    return out


def timed(fn) -> float:
    fn()  # warm-up
    s = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        s.append(time.perf_counter() - t0)
    return round(statistics.median(s), 2)


def drain(spark, root: str, sink) -> None:
    from s3_kinesis_replay_spark.queries.streaming_live import (
        _await_drained,
        _pace_per_trigger,
    )
    from s3_kinesis_replay_spark.sources.archive import stream_archive

    per_trigger = _pace_per_trigger(root)
    q = (
        stream_archive(spark, root, max_files_per_trigger=per_trigger)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="skr_ckpt_"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q)


def empty_run(spark, root: str) -> None:
    drain(spark, root, lambda batch_df, batch_id: None)


def full_run(spark, root: str) -> None:
    """The d7c pipeline shape (streaming_live.py::d7c_streaming_
    quantile_merge) minus the oracle-export tail: per-batch summaries,
    drain, merge, force the estimate."""
    from s3_kinesis_replay_spark.operators.quantile_sketch import (
        quantile_merge,
        quantile_partials,
    )

    art_root = tempfile.mkdtemp(prefix="skr_floor_art_")

    def sink(batch_df, batch_id: int):
        (
            quantile_partials(
                batch_df.filter(F.col("value").isNotNull()),
                group_col="event_type",
                value_col="value",
                shard_col=F.pmod(F.xxhash64("event_id"), F.lit(4)),
                m=128,
            )
            .write.mode("overwrite")
            .parquet(os.path.join(art_root, f"batch-{batch_id}"))
        )

    drain(spark, root, sink)
    quantile_merge(
        spark.read.parquet(os.path.join(art_root, "batch-*")),
        "event_type",
        qs=(0.25, 0.5, 0.75),
    ).collect()
    shutil.rmtree(art_root, ignore_errors=True)


def main() -> None:
    from s3_kinesis_replay_spark.queries.streaming_live import (
        _pace_per_trigger,
    )
    from s3_kinesis_replay_spark.session import get_spark
    from s3_kinesis_replay_spark.sources.archive import stage_archive

    spark = get_spark()
    base_root = stage_archive(SF_DIR, gz=True)
    print(f"sf_dir={SF_DIR} base archive={base_root}")
    print("| k | files | batches | empty drain (floor) | full d7c shape | operator = full - empty |")
    print("| --- | --- | --- | --- | --- | --- |")
    for k in KS:
        root = replicated_archive(base_root, k)
        n_files = sum(
            1
            for _dp, _dn, fs in os.walk(root)
            for f in fs
            if f.endswith(".gz")
        )
        per_trigger = _pace_per_trigger(root)
        batches = -(-n_files // per_trigger)
        t_empty = timed(lambda: empty_run(spark, root))
        t_full = timed(lambda: full_run(spark, root))
        print(
            f"| {k} | {n_files} | {batches} | {t_empty} s | {t_full} s "
            f"| {round(t_full - t_empty, 2)} s |"
        )


if __name__ == "__main__":
    main()
