"""Streaming window/dedup/stateful registry rows (SURVEY §2.H1/H2/H3/H5/H6).

Round-2 upgrade: each H entry now runs a REAL Structured Streaming query
(readStream over the staged archive, paced into ~4 micro-batches, drained
with Trigger.AvailableNow into a memory sink) inside the registry fn, so
the external oracle compare covers the streaming path itself — not a
batch stand-in. The batch-equivalent plans remain registered under
``*_batch`` names: they carry the same oracle (extra coverage) and serve
as the bench-headline variant (bench measures the window-agg cost, not
sink drainage).

Window/session aggregations drain in COMPLETE mode (order-insensitive →
exact equality with the batch SQL regardless of micro-batch boundaries).
Dedup drains in APPEND with a generous watermark (fixture disorder is
bounded, nothing drops). The stateful counter (H6) numbers each user's
events through applyInPandasWithState.

At 100 TB: same topology — file listing prunes on dt= partitions, window
state lives in RocksDB keyed by (window, group), complete-mode memory
sink is test-local (production emits to parquet/Kinesis via foreachBatch).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_kinesis_replay_spark.registry import register
from s3_kinesis_replay_spark.queries.helpers import DEC, fdec, r6, sdec, t

_H1_SQL = f"""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS total_value
    FROM events GROUP BY 1, 2
    """

def _sliding_sql(duration_min: int, slide_min: int) -> str:
    """General sliding-window oracle for ANY (duration, slide) — slide
    need not divide duration (VERDICT r4 item 8). Mirrors Spark's
    ``window()`` semantics exactly: an event's candidate window starts
    are ``floor_slide(ts) - i*slide`` for i in 0..ceil(D/S)-1, kept while
    ``ts < start + duration`` (``ts >= start`` holds by construction)."""
    import math

    k = math.ceil(duration_min / slide_min)
    slide_us = slide_min * 60_000_000
    # EPOCH-aligned floor, not time_bucket: Spark aligns window starts to
    # the epoch for any slide, while DuckDB's time_bucket origin is
    # 2000-01-03 — the two agree only when the interval divides a day
    # (caught by the (duration, slide) fuzzer at D=S=7).
    return f"""
    SELECT ws AS window_start, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS total_value
    FROM (
      SELECT unnest(list_transform(range(0, {k}),
               i -> make_timestamp((epoch_us(ts) // {slide_us}) * {slide_us}
                                   - i * {slide_us}::BIGINT))) AS ws,
             ts, value
      FROM events
    )
    WHERE ts < ws + INTERVAL '{duration_min} minutes'
    GROUP BY ws
    """


_H2_SQL = _sliding_sql(10, 5)

def _session_sql(gap_min: int) -> str:
    """Islands-pattern session oracle for an arbitrary gap: a session
    BREAKS when the inter-event gap is >= the Spark session_window gap
    (Spark half-open [start, last_ts + gap): an event landing exactly at
    the close boundary starts a NEW session), session_end = last event +
    gap. Fuzzed over random gaps in tests/test_property.py."""
    return f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL '{gap_min} minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '{gap_min} minutes' AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS total_value
    FROM numbered GROUP BY user_id, session_id
    """


_H3_SQL = _session_sql(30)

_H5_SQL = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_unique,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_ids
    FROM (SELECT DISTINCT event_id, ts, user_id, event_type, value, props
          FROM (SELECT * FROM events UNION ALL SELECT * FROM events))
    """

_H6_SQL = """
    SELECT event_id, user_id,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS BIGINT) AS running_count
    FROM events
    """


def _paced_stream(spark, sf_dir, target_batches: int = 4):
    """readStream over the staged archive, paced to ~target_batches
    micro-batches at ANY scale factor (fixed file-per-trigger pacing at a
    bigger SF would crawl through dozens of tiny stateful batches)."""
    import glob
    import math

    from s3_kinesis_replay_spark.sources.archive import stage_archive, stream_archive

    root = stage_archive(sf_dir, gz=True)
    n_files = len(glob.glob(f"{root}/**/*.json.gz", recursive=True))
    per_trigger = max(1, math.ceil(n_files / target_batches))
    return stream_archive(spark, root, max_files_per_trigger=per_trigger)


def _h1_plan(df):
    return (
        df.groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count("*").alias("n"), fdec(F.sum(sdec("value"))).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def _h2_plan(df, duration: str = "10 minutes", slide: str = "5 minutes"):
    return (
        df.groupBy(F.window("ts", duration, slide))
        .agg(F.count("*").alias("n"), fdec(F.sum(sdec("value"))).alias("total_value"))
        .select(F.col("window.start").alias("window_start"), "n", "total_value")
    )


def _h3_plan(df, gap: str = "30 minutes"):
    return (
        df.groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            fdec(F.sum(sdec("value"))).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "h1_tumbling_window",
    "H1",
    _H1_SQL,
    check="SEM",
    note="REAL stream: paced archive readStream → tumbling-window agg → "
    "complete-mode drain; complete mode makes the drained state exactly "
    "the batch aggregate",
)
def h1_tumbling_window(spark, sf_dir):
    from s3_kinesis_replay_spark.queries.streaming_live import _drain

    stream = _paced_stream(spark, sf_dir)
    assert stream.isStreaming
    return _drain(spark, _h1_plan(stream), mode="complete")


@register(
    "h1b_tumbling_window_batch",
    "H1",
    _H1_SQL,
    note="batch plan of H1 (same oracle); the bench-headline variant — "
    "window() is identical in batch and streaming",
)
def h1b_tumbling_window_batch(spark, sf_dir):
    return _h1_plan(t(spark, "events", sf_dir))


_H9_SQL = """
    WITH e AS (
      SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS ws,
             event_type, value, ts, event_id
      FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY ws, event_type
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY ws, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM e
    )
    SELECT ws AS window_start, event_type,
           ROUND(CAST(MAX(CASE WHEN rn_a = 1 THEN value END) AS DOUBLE), 6)
             AS open,
           ROUND(CAST(MAX(value) AS DOUBLE), 6) AS high,
           ROUND(CAST(MIN(value) AS DOUBLE), 6) AS low,
           ROUND(CAST(MAX(CASE WHEN rn_d = 1 THEN value END) AS DOUBLE), 6)
             AS close,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ranked GROUP BY ws, event_type
    """


def _h9_plan(df):
    key = F.struct("ts", "event_id")
    return (
        df.filter(F.col("value").isNotNull())
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.round(F.min_by("value", key), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.max_by("value", key), 6).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n",
        )
    )


@register(
    "h9_streaming_ohlc",
    "H1",
    _H9_SQL,
    check="SEM",
    note="REAL stream: ts2's OHLC downsampling running as a live "
    "tumbling-window aggregation — min_by/max_by on the (ts, event_id) "
    "struct key are MERGEABLE, so the candlestick folds correctly "
    "across micro-batch boundaries whatever the pacing (the property "
    "that lets a metrics store downsample IN the ingest stream instead "
    "of a nightly batch); complete-mode drain makes the drained state "
    "exactly the batch candlesticks, which is what the oracle's "
    "ranked-window form recomputes. ts2_ohlc_downsample is the batch "
    "twin at the same semantics.",
)
def h9_streaming_ohlc(spark, sf_dir):
    from s3_kinesis_replay_spark.queries.streaming_live import _drain

    stream = _paced_stream(spark, sf_dir)
    assert stream.isStreaming
    return _drain(spark, _h9_plan(stream), mode="complete")


_H9B_SQL = _H9_SQL.rstrip() + """
    HAVING ws + INTERVAL '1 hour'
           <= (SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL '2 hours'
               FROM events)
    """


@register(
    "h9b_streaming_ohlc_append",
    "H1",
    _H9B_SQL,
    check="SEM",
    note="h9's candlesticks in their 100 TB shape (VERDICT r10 item 3): "
    "withWatermark('ts', '2 hours') + APPEND output, so each OHLC row "
    "emits exactly once when its window closes and the operator state "
    "is BOUNDED (open windows only — complete-mode h9 retains every "
    "window ever seen, which at 100 TB of ingest is the whole history "
    "in executor memory). min_by/max_by stay mergeable across "
    "micro-batches exactly as in h9; the h4 late-drop discipline "
    "supplies the close condition. Oracle = the h9 ranked-window SQL "
    "restricted to windows whose end <= final watermark (max ts − 2 h); "
    "fixture disorder << delay, so emitted candles are complete. h9 "
    "remains the SEM drain of the full state; a live dashboard would "
    "run THIS form and union the open-window tail from a side query.",
)
def h9b_streaming_ohlc_append(spark, sf_dir):
    from s3_kinesis_replay_spark.queries.streaming_live import _drain

    stream = _paced_stream(spark, sf_dir)
    assert stream.isStreaming
    plan = _h9_plan(stream.withWatermark("ts", "2 hours"))
    return _drain(spark, plan, mode="append")


@register(
    "h2_sliding_window",
    "H2",
    _H2_SQL,
    check="SEM",
    note="REAL stream: 10-min windows sliding 5 (each event in exactly 2 "
    "windows), complete-mode drain",
)
def h2_sliding_window(spark, sf_dir):
    from s3_kinesis_replay_spark.queries.streaming_live import _drain

    stream = _paced_stream(spark, sf_dir)
    assert stream.isStreaming
    return _drain(spark, _h2_plan(stream), mode="complete")


@register(
    "h2b_sliding_window_batch",
    "H2",
    _H2_SQL,
    note="batch plan of H2 (same oracle)",
)
def h2b_sliding_window_batch(spark, sf_dir):
    return _h2_plan(t(spark, "events", sf_dir))


@register(
    "h2c_sliding_window_nondiv",
    "H2",
    _sliding_sql(12, 5),
    note="slide ∤ duration (12-min windows every 5 min): events land in 2 "
    "OR 3 windows depending on position within the slide bucket — the "
    "general k-candidate-starts unnest oracle (VERDICT r4 item 8); "
    "fuzzed over random (duration, slide) pairs in tests/test_property.py",
)
def h2c_sliding_window_nondiv(spark, sf_dir):
    return _h2_plan(t(spark, "events", sf_dir), "12 minutes", "5 minutes")


@register(
    "h3_session_window",
    "H3",
    _H3_SQL,
    check="SEM",
    note="REAL stream: session_window(30 min gap) with cross-micro-batch "
    "session merging, complete-mode drain; oracle = SQL islands pattern",
)
def h3_session_window(spark, sf_dir):
    from s3_kinesis_replay_spark.queries.streaming_live import _drain

    stream = _paced_stream(spark, sf_dir)
    assert stream.isStreaming
    return _drain(spark, _h3_plan(stream), mode="complete")


@register(
    "h3b_session_window_batch",
    "H3",
    _H3_SQL,
    note="batch plan of H3 (same oracle)",
)
def h3b_session_window_batch(spark, sf_dir):
    return _h3_plan(t(spark, "events", sf_dir))


@register(
    "h5_streaming_dedup",
    "H5",
    _H5_SQL,
    check="SEM",
    note="REAL stream: two archive readStreams unioned (every event twice) "
    "→ watermark + dropDuplicates(event_id) → append drain; dedup output "
    "then counted. Fixture disorder ≪ the 2-day watermark, so nothing drops",
)
def h5_streaming_dedup(spark, sf_dir):
    from s3_kinesis_replay_spark.queries.streaming_live import _drain

    s1 = _paced_stream(spark, sf_dir)
    s2 = _paced_stream(spark, sf_dir)
    assert s1.isStreaming
    deduped = (
        s1.unionAll(s2).withWatermark("ts", "2 days").dropDuplicates(["event_id"])
    )
    out = _drain(spark, deduped, mode="append")
    return out.agg(
        F.count("*").alias("n_unique"),
        F.countDistinct("event_id").alias("n_ids"),
    )


@register(
    "h6_stateful_running_count",
    "H6",
    _H6_SQL,
    check="SEM",
    note="REAL stream: per-user stateful counter via applyInPandasWithState "
    "(update mode). Single micro-batch + within-group (ts, event_id) sort "
    "makes per-event numbering exactly the batch row_number; the "
    "multi-batch state-carry path is asserted in tests/test_streaming.py",
)
def h6_stateful_running_count(spark, sf_dir):
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    from s3_kinesis_replay_spark.queries.streaming_live import _drain
    from s3_kinesis_replay_spark.sources.archive import stage_archive, stream_archive

    root = stage_archive(sf_dir, gz=True)
    stream = stream_archive(spark, root, max_files_per_trigger=10**6)
    assert stream.isStreaming

    def number_fn(key, pdf_iter, state):
        start = state.get[0] if state.exists else 0
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        n = len(pdf)
        state.update((start + n,))
        yield pd.DataFrame(
            {
                "event_id": pdf["event_id"].to_numpy(),
                "user_id": np.full(n, key[0], dtype=np.int64),
                "running_count": np.arange(start + 1, start + n + 1, dtype=np.int64),
            }
        )

    counted = stream.groupBy("user_id").applyInPandasWithState(
        number_fn,
        outputStructType="event_id BIGINT, user_id BIGINT, running_count BIGINT",
        stateStructType="n BIGINT",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _drain(spark, counted, mode="update")
