"""Streaming MERGE sink (SURVEY §2.C2 + A6/A10 composite) — CDC upsert
of a replay stream into a persisted parquet snapshot.

This ties c2b's batch MERGE rewrite to the replay machinery the way p18
tied dedup: each micro-batch of the event replay is treated as a CDC
change feed — the latest event per key in the batch upserts the key's
snapshot row — and the snapshot is republished per batch behind an
atomic pointer.

Idempotence WITHOUT a transaction log: every change carries its event
order key ``(ts, event_id)`` and the merge applies a change only when it
is STRICTLY NEWER than the stored row. Re-running a micro-batch after a
checkpoint recovery (Structured Streaming re-executes the last
uncommitted batch) re-applies changes that are now equal-or-older —
no-ops — so the fold converges to the same snapshot regardless of batch
boundaries, restarts, or at-least-once duplication.

Deletes are TOMBSTONES, not physical removals: a key whose winning event
is the tombstone type keeps its row (with the tombstone recorded as
``last_type``) and is filtered at READ time (:func:`snapshot_live`).
Physically deleting would lose the key's (ts, event_id) watermark, and a
stale out-of-order change arriving later would resurrect the key with
old state — the classic CDC resurrection bug; retained tombstones are
how log-compacted systems (Kafka compaction, Cassandra) avoid it.

At 100 TB: the per-batch merge is one full-outer join keyed on the
snapshot key; rewriting the snapshot per batch is the table-format-free
equivalent of MERGE INTO — swap in Delta/Iceberg MERGE where a table
format is available and keep the same monotonic guard. Tombstone
compaction (dropping tombstones older than the max possible event-time
skew) bounds snapshot growth.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

SNAPSHOT_SCHEMA = (
    "user_id bigint, ts timestamp, event_id bigint, "
    "last_type string, last_value double"
)


def _read_snapshot(spark: SparkSession, pointer: str) -> DataFrame:
    if os.path.exists(pointer):
        return spark.read.parquet(os.path.realpath(pointer))
    return spark.createDataFrame([], SNAPSHOT_SCHEMA)


def merge_batch(target: DataFrame, changes: DataFrame) -> DataFrame:
    """One CDC merge pass: full-outer join target rows with the batch's
    latest-change-per-key; a change applies only when STRICTLY newer
    than the stored row ((ts, event_id) lexicographic). ``changes`` must
    be one-row-per-key (MERGE's one-source-row-per-target contract).
    Pure upsert — tombstones ride through as ordinary rows and are
    interpreted at read time (see module docstring)."""
    ch = changes.select(
        F.col("user_id"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_event_id"),
        F.col("last_type").alias("c_type"),
        F.col("last_value").alias("c_value"),
    )
    j = target.join(ch, "user_id", "full_outer")
    newer = F.col("c_event_id").isNotNull() & (
        F.col("event_id").isNull()
        | (F.struct("c_ts", "c_event_id") > F.struct("ts", "event_id"))
    )
    return j.select(
        "user_id",
        F.when(newer, F.col("c_ts")).otherwise(F.col("ts")).alias("ts"),
        F.when(newer, F.col("c_event_id"))
        .otherwise(F.col("event_id"))
        .alias("event_id"),
        F.when(newer, F.col("c_type")).otherwise(F.col("last_type")).alias(
            "last_type"
        ),
        F.when(newer, F.col("c_value"))
        .otherwise(F.col("last_value"))
        .alias("last_value"),
    )


def merge_foreach_batch(snapshot_root: str):
    """foreachBatch function maintaining the snapshot under
    ``snapshot_root``: ``current`` is an atomic symlink to the latest
    complete snapshot directory (publish via os.replace, the
    publish_index_pointer discipline), one directory per applied batch.
    Safe under checkpoint-recovery re-execution: the monotonic guard in
    :func:`merge_batch` makes re-applying a batch a no-op."""
    from s3_kinesis_replay_spark.operators.similarity import (
        publish_index_pointer,
    )

    pointer = os.path.join(snapshot_root, "current")

    def fn(batch_df: DataFrame, batch_id: int):
        spark = batch_df.sparkSession
        out_dir = os.path.join(snapshot_root, f"batch-{batch_id}")
        # Re-execution short-circuit (review r8): if this batch's dir is
        # what the pointer ALREADY publishes, the batch completed before
        # the crash (write + publish done, stream commit lost). Merging
        # again would be a semantic no-op by the monotonic guard — but
        # mechanically it would OVERWRITE the very directory being read
        # (Spark refuses: 'Cannot overwrite a path that is also being
        # read from'). Skip; the stream re-commits and moves on.
        if os.path.exists(pointer) and os.path.realpath(
            pointer
        ) == os.path.realpath(out_dir):
            return
        changes = (
            batch_df.groupBy("user_id")
            .agg(
                F.max(
                    F.struct(
                        "ts",
                        "event_id",
                        F.col("event_type").alias("last_type"),
                        F.col("value").alias("last_value"),
                    )
                ).alias("m")
            )
            .select(
                "user_id",
                F.col("m.ts").alias("ts"),
                F.col("m.event_id").alias("event_id"),
                F.col("m.last_type").alias("last_type"),
                F.col("m.last_value").cast("double").alias("last_value"),
            )
        )
        target = _read_snapshot(spark, pointer)
        prev = (
            os.path.realpath(pointer) if os.path.islink(pointer) else None
        )
        # no broadcast hint: FULL OUTER cannot broadcast-hash — the join
        # shuffles on user_id only; the change side is micro-batch-sized
        merge_batch(target, changes).write.mode("overwrite").parquet(out_dir)
        publish_index_pointer(out_dir, pointer)
        # reap superseded snapshots with ONE generation of grace (review
        # r8, second pass): deleting the immediately-previous dir right
        # after repointing could yank files from under a reader that
        # resolved the pointer moments earlier — so publishing batch N
        # keeps N-1 and reaps everything older. Disk is bounded at ~2
        # snapshots instead of O(n_batches); a reader has a full
        # micro-batch interval to finish its scan.
        keep = {os.path.realpath(out_dir)}
        if prev:
            keep.add(prev)
        import shutil

        root_real = os.path.realpath(snapshot_root)
        for d in os.listdir(snapshot_root):
            full = os.path.join(root_real, d)
            if (
                d.startswith("batch-")
                and os.path.realpath(full) not in keep
            ):
                shutil.rmtree(full, ignore_errors=True)

    return fn


def snapshot_live(spark: SparkSession, snapshot_root: str, delete_type: str = "error") -> DataFrame:
    """The LIVE view of the snapshot: tombstoned keys filtered out.
    Null-safe (review r8): a key whose winning event_type is NULL is
    live — `!= 'error'` evaluated to NULL and silently dropped it."""
    snap = _read_snapshot(spark, os.path.join(snapshot_root, "current"))
    return snap.filter(~F.col("last_type").eqNullSafe(delete_type))


def compact_tombstones(
    snapshot: DataFrame, watermark_ts, delete_type: str = "error"
) -> DataFrame:
    """Drop tombstone rows whose event time is STRICTLY before
    ``watermark_ts`` — safe once no change older than the tombstone can
    still arrive (the stream's event-time watermark), because the only
    reason to retain a tombstone is to outrank such stragglers. The
    bound is strict (review r8: the watermark only excludes events with
    ts < watermark, so a ts == watermark straggler can still arrive and
    must still lose to an equal-ts tombstone's (ts, event_id) guard —
    dropping that tombstone re-opened the resurrection bug). The
    comparison is null-safe: a NULL last_type is never a tombstone.
    Bounds snapshot growth at 100 TB: live keys persist, dead keys cost
    one row only within the late-data horizon. The LIVE view is
    unchanged by construction (tombstones are already filtered from
    it)."""
    return snapshot.filter(
        ~(
            F.col("last_type").eqNullSafe(delete_type)
            & (F.col("ts") < F.lit(watermark_ts))
        )
    )


def run_streaming_merge(
    spark: SparkSession,
    stream_df: DataFrame,
    snapshot_root: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Wire a replay stream into the merge sink; returns the query."""
    writer = (
        stream_df.writeStream.foreachBatch(merge_foreach_batch(snapshot_root))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
