"""Live Structured-Streaming registry rows (SURVEY §2.A6–A10, C10/C11,
H4/H7/H8) — each fn runs a REAL stream to completion and returns its
result, so the driver's oracle compare covers the streaming path itself
(check mode SEM: stream drained with Trigger.AvailableNow must equal the
stated batch SQL).

Mechanics shared by every entry:

* the archive is the deterministic events staging (sources/archive.py):
  gzipped NDJSON chunks of 500 rows under dt=/hr= dirs, so oracles can
  re-derive file-level facts from the parquet fixture alone;
* each run gets a fresh checkpoint dir and a unique memory-sink name
  (memory sink is test-scale-only; the production path is foreachBatch →
  Kinesis or a parquet sink — both checked here too);
* pacing (maxFilesPerTrigger) makes multi-micro-batch execution real —
  these are not single-batch degenerate runs.

At 100 TB: the same topology holds — file-source listing scales with the
partition index (dt= pruning), state lives in RocksDB, and the sink
parallelism is the post-repartition partition count (single-writer-per-
key). Only the memory sink is test-local.
"""

from __future__ import annotations

import json
import tempfile
import uuid

from pyspark.sql import functions as F

from s3_kinesis_replay_spark.registry import register
from s3_kinesis_replay_spark.queries.helpers import DEC, fdec, sdec, t
from s3_kinesis_replay_spark.sources.archive import stage_archive, stream_archive
from s3_kinesis_replay_spark.streaming.kinesis_sink import CapturingClient
from s3_kinesis_replay_spark.streaming.replay import ReplayConfig, run_replay

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _drain(spark, stream_df, mode="append", name=None):
    """Run a streaming DF to completion (AvailableNow) into a memory sink."""
    name = name or ("skr_live_" + uuid.uuid4().hex[:12])
    ckpt = tempfile.mkdtemp(prefix="skr_ckpt_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return spark.table(name)


def _run_capture_replay(spark, sf_dir, fail_every=0):
    """Replay the staged archive through the Kinesis-shaped sink into an
    in-memory capturing endpoint; returns the captured (key, payload) list
    in arrival order."""
    root = stage_archive(sf_dir, gz=True)
    client = CapturingClient(fail_every=fail_every)
    cfg = ReplayConfig(
        archive_root=root,
        stream_name="skr-replay",
        checkpoint_dir=tempfile.mkdtemp(prefix="skr_ckpt_"),
        max_files_per_trigger=5,
    )
    q = run_replay(spark, cfg, lambda: client, distributed=False)
    q.awaitTermination(600)
    return client


def _records_to_rows(client):
    """Parse captured sink records back to (partition_key, event_id, arrival)."""
    rows = []
    for arrival, (key, payload) in enumerate(client.records):
        tag, body = payload.decode().split("|", 1)
        rows.append((key, json.loads(body)["event_id"], arrival))
    return rows


@register(
    "a6_streaming_source",
    "A6",
    "SELECT event_id, ts, user_id, event_type, value, props FROM events",
    check="SEM",
    note="paced incremental file-source replay (4 micro-batches) drained "
    "to completion == batch read of the same archive",
)
def a6_streaming_source(spark, sf_dir):
    root = stage_archive(sf_dir, gz=True)
    return _drain(spark, stream_archive(spark, root, max_files_per_trigger=6))


@register(
    "a7_kinesis_sink",
    "A7",
    """
    SELECT COALESCE(json_extract_string(props, '$.k'),
                    CAST(user_id AS VARCHAR)) AS partition_key,
           event_id
    FROM events
    """,
    check="SEM",
    note="full replay pipeline into the PutRecords-shaped sink (≤500 rec / "
    "≤5 MiB batching, retry path); captured stream contents == input set",
)
def a7_kinesis_sink(spark, sf_dir):
    client = _run_capture_replay(spark, sf_dir)
    rows = [(k, e) for k, e, _ in _records_to_rows(client)]
    return spark.createDataFrame(rows, "partition_key STRING, event_id BIGINT")


@register(
    "a9_replay_pacing",
    "A9",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CEIL(COUNT(DISTINCT event_id // 500) / 4.0) AS BIGINT)
               AS n_batches
    FROM events
    """,
    check="SEM",
    note="rate-limited replay: ≤4 files per micro-batch; the oracle "
    "re-derives the exact batch count from the deterministic chunking rule",
)
def a9_replay_pacing(spark, sf_dir):
    root = stage_archive(sf_dir, gz=True)
    stream = stream_archive(spark, root, max_files_per_trigger=4)
    counts: list[int] = []

    def count_batch(batch_df, batch_id):
        n = batch_df.count()
        if n:
            counts.append(n)

    q = (
        stream.writeStream.foreachBatch(count_batch)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="skr_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return spark.createDataFrame(
        [(sum(counts), len(counts))], "n_rows BIGINT, n_batches BIGINT"
    )


@register(
    "a10_checkpoint_resume",
    "A10",
    "SELECT event_id, user_id, event_type FROM events",
    check="SEM",
    note="kill mid-replay (injected failure in micro-batch 2), restart from "
    "the same checkpoint: at-least-once capture, exactly-once after "
    "idempotency-key dedup — final set == full input",
)
def a10_checkpoint_resume(spark, sf_dir):
    root = stage_archive(sf_dir, gz=True)
    ckpt = tempfile.mkdtemp(prefix="skr_ckpt_")
    captured: list[tuple[int, int, str]] = []

    def make_sink(fail_at_batch):
        def sink(batch_df, batch_id):
            rows = [
                (r["event_id"], r["user_id"], r["event_type"])
                for r in batch_df.collect()
            ]
            captured.extend(rows)  # appended BEFORE the crash → duplicates
            if batch_id == fail_at_batch:
                raise RuntimeError("injected mid-replay failure")

        return sink

    def run(fail_at_batch):
        stream = stream_archive(spark, root, max_files_per_trigger=5)
        q = (
            stream.writeStream.foreachBatch(make_sink(fail_at_batch))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(600)
        except Exception:
            pass  # run 1 dies on the injected failure; checkpoint survives

    run(fail_at_batch=2)  # batches 0,1 commit; batch 2 crashes after capture
    run(fail_at_batch=-1)  # resume: reprocesses batch 2 (dupes), drains rest
    assert len(captured) > 0
    # idempotent consumer: dedup on the record key (at-least-once → exact set)
    dedup = {r[0]: r for r in captured}
    return spark.createDataFrame(
        sorted(dedup.values()), "event_id BIGINT, user_id BIGINT, event_type STRING"
    )


@register(
    "c10_stream_static_join",
    "C10",
    """
    SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
    check="SEM",
    note="streaming events enriched with the static customer dim "
    "(broadcast-able at scale) == batch join of the same data",
)
def c10_stream_static_join(spark, sf_dir):
    root = stage_archive(sf_dir, gz=True)
    cust = t(spark, "customer", sf_dir)
    stream = stream_archive(spark, root, max_files_per_trigger=50)
    joined = stream.join(cust, stream.user_id == cust.c_custkey, "inner").select(
        "event_id", "user_id", "c_name", "c_mktsegment"
    )
    return _drain(spark, joined)


@register(
    "c11_stream_stream_join",
    "C11",
    """
    SELECT p.event_id AS p_id, v.event_id AS v_id
    FROM events p JOIN events v
      ON p.user_id = v.user_id
     AND p.event_type = 'purchase' AND v.event_type = 'view'
     AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
    """,
    check="SEM",
    note="watermarked stream-stream join: purchases matched to the same "
    "user's views in the preceding hour; time bounds let Spark evict state",
)
def c11_stream_stream_join(spark, sf_dir):
    root = stage_archive(sf_dir, gz=True)
    # no pacing: state-heavy join drains in one batch; pacing semantics are
    # covered by a6/a9/a10 (34 tiny batches of RocksDB join state would
    # dominate wall-clock at sf0.1 for zero extra coverage)
    purchases = (
        stream_archive(spark, root)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 day")
    )
    views = (
        stream_archive(spark, root)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("v_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 day")
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("v_ts") <= F.col("p_ts")),
        "inner",
    ).select("p_id", "v_id")
    return _drain(spark, joined)


@register(
    "h4_watermark_late_drop",
    "H4",
    f"""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS total_value
    FROM events
    GROUP BY 1, 2
    HAVING time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes'
           <= (SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL '2 hours'
               FROM events)
    """,
    check="SEM",
    note="append-mode windowed agg behind a 2h watermark: only finalized "
    "windows emit (end <= final watermark); fixture disorder << delay so "
    "no row is dropped from those windows",
)
def h4_watermark_late_drop(spark, sf_dir):
    root = stage_archive(sf_dir, gz=True)
    stream = stream_archive(spark, root, max_files_per_trigger=50)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count("*").alias("n"), fdec(F.sum(sdec("value"))).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    return _drain(spark, agg, mode="append")


@register(
    "h7_output_mode_complete",
    "H7",
    f"""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS total_value
    FROM events GROUP BY event_type
    """,
    check="SEM",
    note="complete-mode streaming agg: final emitted state == batch agg",
)
def h7_output_mode_complete(spark, sf_dir):
    root = stage_archive(sf_dir, gz=True)
    stream = stream_archive(spark, root, max_files_per_trigger=50)
    agg = stream.groupBy("event_type").agg(
        F.count("*").alias("n"), fdec(F.sum(sdec("value"))).alias("total_value")
    )
    return _drain(spark, agg, mode="complete")


@register(
    "h8_ordered_emission",
    "H8",
    """
    SELECT COALESCE(json_extract_string(props, '$.k'),
                    CAST(user_id AS VARCHAR)) AS partition_key,
           string_agg(event_id, ',' ORDER BY event_id) AS seqs
    FROM events GROUP BY 1
    """,
    check="SEM",
    note="per-partition-key arrival order at the sink must equal seq order "
    "(Kinesis shard-ordering semantics): batches sorted by (key, seq), "
    "micro-batches consumed in key order — sequences compare ORDERED as "
    "','-joined strings (driver canonicalizer cannot hash lists)",
)
def h8_ordered_emission(spark, sf_dir):
    client = _run_capture_replay(spark, sf_dir)
    rows = _records_to_rows(client)
    df = spark.createDataFrame(
        rows, "partition_key STRING, event_id BIGINT, arrival BIGINT"
    )
    # collect each key's event_ids in ARRIVAL order — equality with the
    # oracle's seq-ordered list IS the ordering assertion
    return (
        df.groupBy("partition_key")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("arrival", "event_id"))
            ).alias("pairs")
        )
        .select(
            "partition_key",
            F.array_join(
                F.transform(
                    F.col("pairs"), lambda p: p.event_id.cast("string")
                ),
                ",",
            ).alias("seqs"),
        )
    )
