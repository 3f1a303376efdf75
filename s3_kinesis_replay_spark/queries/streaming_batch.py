"""Streaming operators' batch-equivalent declarations (SURVEY §2.H).

Check mode SEM: the real streaming path (readStream + AvailableNow) must
equal these batch plans — that equivalence is asserted in
tests/test_streaming.py. The driver-facing oracle checks the batch side;
Spark's window/session_window functions are identical in batch and
streaming, so the pair of checks closes the loop.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_kinesis_replay_spark.registry import register
from s3_kinesis_replay_spark.queries.helpers import DEC, fdec, r6, sdec, t


@register(
    "h1_tumbling_window",
    "H1",
    f"""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS total_value
    FROM events GROUP BY 1, 2
    """,
    check="SEM",
)
def h1_tumbling_window(spark, sf_dir):
    return (
        t(spark, "events", sf_dir)
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count("*").alias("n"), fdec(F.sum(sdec("value"))).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "h2_sliding_window",
    "H2",
    f"""
    SELECT ws AS window_start, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS total_value
    FROM (
      SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
                     time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes']) AS ws,
             value
      FROM events
    ) GROUP BY ws
    """,
    check="SEM",
    note="10-min windows sliding 5: each event lands in exactly 2 windows",
)
def h2_sliding_window(spark, sf_dir):
    return (
        t(spark, "events", sf_dir)
        .groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(F.count("*").alias("n"), fdec(F.sum(sdec("value"))).alias("total_value"))
        .select(F.col("window.start").alias("window_start"), "n", "total_value")
    )


@register(
    "h3_session_window",
    "H3",
    f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
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
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS total_value
    FROM numbered GROUP BY user_id, session_id
    """,
    check="SEM",
    note="oracle = SQL islands pattern; session_window end = last event + gap",
)
def h3_session_window(spark, sf_dir):
    return (
        t(spark, "events", sf_dir)
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"), fdec(F.sum(sdec("value"))).alias("total_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "h5_streaming_dedup",
    "H5",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_unique,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_ids
    FROM (SELECT DISTINCT event_id, ts, user_id, event_type, value, props
          FROM (SELECT * FROM events UNION ALL SELECT * FROM events))
    """,
    check="SEM",
    note="batch analog of withWatermark+dropDuplicates(event_id) on a "
    "duplicated stream; streaming path in tests/test_streaming.py",
)
def h5_streaming_dedup(spark, sf_dir):
    ev = t(spark, "events", sf_dir)
    doubled = ev.unionAll(ev)
    return doubled.dropDuplicates(["event_id"]).agg(
        F.count("*").alias("n_unique"),
        F.countDistinct("event_id").alias("n_ids"),
    )


@register(
    "h6_stateful_running_count",
    "H6",
    """
    SELECT event_id, user_id,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS BIGINT) AS running_count
    FROM events
    """,
    check="SEM",
    note="batch analog of per-user stateful counter "
    "(transformWithStateInPandas in tests/test_streaming.py)",
)
def h6_stateful_running_count(spark, sf_dir):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return t(spark, "events", sf_dir).select(
        "event_id",
        "user_id",
        F.row_number().over(w).cast("bigint").alias("running_count"),
    )
