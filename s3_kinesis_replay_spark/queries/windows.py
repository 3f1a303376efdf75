"""Window functions (SURVEY §2.E).

Determinism discipline: every window orderBy carries a unique tiebreak key
(primary key) so ranking output is stable across engines and runs
(SURVEY §5.3.7). Frames are declared explicitly — Spark's default frame
for ordered windows is RANGE UNBOUNDED PRECEDING..CURRENT ROW which
includes peers; we pin ROWS frames wherever peer-inclusion would differ.

Scale: a window over partitionBy(k) shuffles once on k and sorts within
partitions — same cost shape as a groupBy; no extra passes per function.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from s3_kinesis_replay_spark.registry import register
from s3_kinesis_replay_spark.queries.helpers import DEC, fdec, r6, sdec, t


@register(
    "e1_ranking",
    "E1",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           ROUND(percent_rank() OVER w, 6) AS prnk,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           ROUND(cume_dist() OVER w, 6) AS cdist
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
    """,
)
def e1_ranking(spark, sf_dir):
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    return t(spark, "lineitem", sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        r6(F.percent_rank().over(w)).alias("prnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        r6(F.cume_dist().over(w)).alias("cdist"),
    )


@register(
    "e2_lag_lead",
    "E2",
    """
    SELECT event_id, user_id,
           lag(value, 1, -1.0) OVER w AS prev_value,
           lead(value, 2) OVER w AS next2_value,
           lag(event_type) OVER w AS prev_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def e2_lag_lead(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return t(spark, "events", sf_dir).select(
        "event_id",
        "user_id",
        F.lag("value", 1, -1.0).over(w).alias("prev_value"),
        F.lead("value", 2).over(w).alias("next2_value"),
        F.lag("event_type").over(w).alias("prev_type"),
    )


@register(
    "e3_first_last_nth",
    "E3",
    """
    SELECT event_id, user_id,
           first_value(value) OVER w AS first_v,
           last_value(value) OVER w AS running_last_v,
           nth_value(value, 2) OVER w AS second_v
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def e3_first_last_nth(spark, sf_dir):
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t(spark, "events", sf_dir).select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_v"),
        F.last("value").over(w).alias("running_last_v"),
        F.nth_value("value", 2).over(w).alias("second_v"),
    )


@register(
    "e4_running_total",
    "E4",
    f"""
    SELECT o_custkey, o_orderkey,
           ROUND(CAST(SUM(CAST(o_totalprice AS {DEC})) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
             AS running_spend
    FROM orders
    """,
)
def e4_running_total(spark, sf_dir):
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t(spark, "orders", sf_dir).select(
        "o_custkey",
        "o_orderkey",
        fdec(F.sum(sdec("o_totalprice")).over(w)).alias("running_spend"),
    )


@register(
    "e5_moving_avg",
    "E5",
    f"""
    SELECT o_custkey, o_orderkey,
           ROUND(CAST(SUM(CAST(o_totalprice AS {DEC})) OVER w AS DOUBLE)
                 / COUNT(*) OVER w, 6) AS ma7
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    note="7-row moving average declared as decimal-sum ÷ count (order-exact)",
)
def e5_moving_avg(spark, sf_dir):
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-6, Window.currentRow)
    )
    return t(spark, "orders", sf_dir).select(
        "o_custkey",
        "o_orderkey",
        r6(
            F.sum(sdec("o_totalprice")).over(w).cast("double")
            / F.count("*").over(w)
        ).alias("ma7"),
    )


@register(
    "e6_range_frame",
    "E6",
    f"""
    SELECT o_orderkey, o_totalprice,
           ROUND(CAST(SUM(CAST(o_totalprice AS {DEC})) OVER
             (PARTITION BY o_orderstatus ORDER BY o_totalprice
              RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
             AS near_sum,
           CAST(COUNT(*) OVER
             (PARTITION BY o_orderstatus ORDER BY o_totalprice
              RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS BIGINT) AS near_n
    FROM orders
    """,
    note="numeric RANGE frame: peers included by value, deterministic under "
    "ties; partitioned by o_orderstatus so the window parallelizes — an "
    "ORDER BY with no PARTITION BY funnels every row through one task at "
    "scale",
)
def e6_range_frame(spark, sf_dir):
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, Window.currentRow)
    )
    return t(spark, "orders", sf_dir).select(
        "o_orderkey",
        "o_totalprice",
        fdec(F.sum(sdec("o_totalprice")).over(w)).alias("near_sum"),
        F.count("*").over(w).cast("bigint").alias("near_n"),
    )


@register(
    "e7_topk_per_group",
    "E7",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    note="rn<=3 filter is pushed into the window sort (WindowGroupLimit)",
)
def e7_topk_per_group(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        t(spark, "orders", sf_dir)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "e8_scalable_rank",
    "E1",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag,
           CAST(l_quantity AS DOUBLE) AS qty,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           ROUND(percent_rank() OVER w, 6) AS prnk,
           ROUND(cume_dist() OVER w, 6) AS cdist
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity DESC)
    """,
    note="the SCALE.md low-cardinality-window mitigation as a DECLARED "
    "hash-verified operator: rank/dense_rank/percent_rank/cume_dist over "
    "a 3-value partition key are rewritten as a groupBy(flag, qty) count "
    "+ window over the AGGREGATED relation (3 flags x 50 qtys, not 600k "
    "rows) + broadcast join back — no row of the fact table ever enters "
    "a window sort, so the 3-task funnel e1 inherits from its semantics "
    "never forms. Oracle runs the plain window form; results hash-match",
)
def e8_scalable_rank(spark, sf_dir):
    """Aggregated-rank rewrite (public textbook form; see SCALE.md
    'e1-class LOW-CARDINALITY window partitions'): count-based ranking
    functions depend only on the ORDER BY value's per-partition
    distribution, so compute them once per DISTINCT (partition, value)
    group and broadcast-join the tiny ranked relation back to the fact.
    row_number/ntile are order-sensitive (not count-based) and stay on
    the direct window path (e1)."""
    from s3_kinesis_replay_spark.operators.rank_rewrite import agg_rank

    li = t(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    return agg_rank(li, "l_returnflag", "l_quantity", descending=True).select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.col("l_quantity").cast("double").alias("qty"),
        "rnk",
        "drnk",
        r6(F.col("prnk")).alias("prnk"),
        r6(F.col("cdist")).alias("cdist"),
    )


@register(
    "e9_latest_per_key",
    "E7",
    """
    SELECT event_id, user_id, ts, event_type, value
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    note="CDC/SCD compaction: latest record per key (ts tiebroken by "
    "event_id so concurrent timestamps resolve identically). "
    "WindowGroupLimit keeps per-key state at one row — the upsert-log "
    "compaction every incremental table maintenance job runs; at 100 TB "
    "partition state is k=1 rows per key, shuffle on the key only.",
)
def e9_latest_per_key(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "ts", "event_type", "value")
    )


@register(
    "ts1_resample_interpolate",
    "E2",
    """
    WITH obs AS (
      SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
             -- engine-neutral 6-dp mean: decimal-exact sum -> ONE double
             -- division -> floor-HALF_UP. Spark's decimal quotient
             -- pre-rounds at scale 6 and DuckDB's DECIMAL/COUNT silently
             -- becomes double division, so ROUND-based forms split on the
             -- 7th-decimal midpoints /2 creates constantly (review r9)
             FLOOR(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                   / COUNT(*) * 1000000 + 0.5) / 1000000 AS v
      FROM events WHERE user_id % 50 = 7
      GROUP BY user_id, date_trunc('hour', CAST(ts AS TIMESTAMP))
    ),
    span AS (SELECT user_id, MIN(h) AS mn, MAX(h) AS mx
             FROM obs GROUP BY user_id),
    grid AS (
      SELECT s.user_id, UNNEST(generate_series(s.mn, s.mx,
                                               INTERVAL 1 HOUR)) AS h
      FROM span s
    ),
    j AS (
      SELECT g.user_id, g.h, o.v
      FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.h = g.h
    ),
    f AS (
      SELECT user_id, h, v,
        LAST_VALUE(v IGNORE NULLS) OVER wp AS pv,
        LAST_VALUE(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
          OVER wp AS pt,
        FIRST_VALUE(v IGNORE NULLS) OVER wn AS nv,
        FIRST_VALUE(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
          OVER wn AS nt
      FROM j
      WINDOW
        wp AS (PARTITION BY user_id ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wn AS (PARTITION BY user_id ORDER BY h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, h, (v IS NOT NULL) AS is_observed,
           -- engine-neutral 6-dp HALF_UP: FLOOR over the IEEE product is
           -- bit-identical in both engines, while ROUND() semantics
           -- diverge on decimal midpoints (e.g. 16.1496875)
           FLOOR(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               pv + (nv - pv) * (CAST(epoch(h) - epoch(pt) AS DOUBLE)
                                 / CAST(epoch(nt) - epoch(pt) AS DOUBLE))
             WHEN pv IS NOT NULL THEN pv
             ELSE nv
           END * 1000000 + 0.5) / 1000000 AS value
    FROM f ORDER BY user_id, h
    """,
    note="time-series RESAMPLE + GAP-FILL — hourly grid per user "
    "(sequence+explode, no driver loop), linear interpolation between "
    "the nearest observations via two ignore-nulls window passes "
    "(last/first over ROWS frames), forward/backward fill at the edges. "
    "All built-ins: date_trunc bucketing -> exact-decimal hourly mean "
    "-> per-user span join -> interpolation arithmetic on integer epoch "
    "seconds (identical association both engines). Shuffle shape: one "
    "groupBy(user, hour), one per-user window sort — the same cost "
    "class as any E-family window at 100 TB; the grid never "
    "materializes beyond each user's own span.",
)
def ts1_resample_interpolate(spark, sf_dir):
    e = t(spark, "events", sf_dir).filter(F.col("user_id") % 50 == 7)
    # see the oracle's v comment: decimal sum -> double division ->
    # floor-HALF_UP keeps both engines on identical IEEE bits; fdec's
    # decimal quotient pre-rounds at scale 6 where DuckDB divides in
    # double (review r9 — a 2-event hour with odd 6-dp sum is a midpoint)
    obs = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        (
            F.floor(
                F.sum(sdec("value")).cast("double")
                / F.count("*")
                * 1000000
                + 0.5
            )
            / 1000000
        ).alias("v")
    )
    span = obs.groupBy("user_id").agg(
        F.min("h").alias("mn"), F.max("h").alias("mx")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    j = grid.join(obs, ["user_id", "h"], "left")
    wp = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v = F.col("v")
    ht = F.when(v.isNotNull(), F.col("h"))
    f = j.select(
        "user_id",
        "h",
        "v",
        F.last(v, ignorenulls=True).over(wp).alias("pv"),
        F.last(ht, ignorenulls=True).over(wp).alias("pt"),
        F.first(v, ignorenulls=True).over(wn).alias("nv"),
        F.first(ht, ignorenulls=True).over(wn).alias("nt"),
    )
    frac = (
        (F.unix_timestamp("h") - F.unix_timestamp("pt")).cast("double")
        / (F.unix_timestamp("nt") - F.unix_timestamp("pt")).cast("double")
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv") + (F.col("nv") - F.col("pv")) * frac,
        )
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
    )
    # engine-neutral 6-dp HALF_UP (see oracle comment): F.round's
    # shortest-repr HALF_UP and DuckDB's binary-value ROUND disagree on
    # decimal midpoints the interpolation can land on exactly
    return f.select(
        "user_id",
        "h",
        F.col("v").isNotNull().alias("is_observed"),
        (F.floor(filled * 1000000 + 0.5) / 1000000).alias("value"),
    ).orderBy("user_id", "h")


@register(
    "e12_transition_matrix",
    "E2",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    pairs AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ),
    tot AS (SELECT prev_type, SUM(n) AS n_from FROM pairs GROUP BY prev_type)
    SELECT p.prev_type, p.next_type, CAST(p.n AS BIGINT) AS n,
           -- engine-neutral 6-dp rounding (the ts1 floor form): ROUND
           -- semantics diverge on 7th-decimal midpoints a count ratio
           -- can land on exactly (review r9)
           FLOOR(CAST(p.n AS DOUBLE) / t.n_from * 1000000 + 0.5)
             / 1000000 AS p_transition
    FROM pairs p JOIN tot t ON t.prev_type = p.prev_type
    ORDER BY p.prev_type, p.next_type
    """,
    note="EVENT-TYPE TRANSITION MATRIX — the Markov-chain view of the "
    "event stream (what -> what next, per user journey): one lag window "
    "per user ordered by (ts, event_id) for deterministic sequencing, "
    "pair counts with map-side partial agg, row-normalized into "
    "transition probabilities. Complements e11's fixed funnel with the "
    "full 5x5 transition structure. Shuffle shape: one window sort on "
    "user_id + one pair groupBy — E-family cost; probabilities divide "
    "exact BIGINT counts in double (identical IEEE quotient bits in "
    "both engines) and round via the engine-neutral floor form, since "
    "ROUND semantics diverge on decimal midpoints (the ts1 lesson).",
)
def e12_transition_matrix(spark, sf_dir):
    e = t(spark, "events", sf_dir).select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNotNull()
    )
    pairs = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count("*").alias("n"))
    tot = pairs.groupBy("prev_type").agg(F.sum("n").alias("n_from"))
    return (
        pairs.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            # engine-neutral floor-HALF_UP (see oracle comment)
            (
                F.floor(
                    F.col("n").cast("double") / F.col("n_from") * 1000000
                    + 0.5
                )
                / 1000000
            ).alias("p_transition"),
        )
        .orderBy("prev_type", "next_type")
    )


@register(
    "ts3_rolling_anomaly",
    "E5",
    f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
             ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS v
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, date_trunc('hour', CAST(ts AS TIMESTAMP))
    ),
    scored AS (
      SELECT event_type, hr, v,
             COUNT(*) OVER w AS n_prior,
             AVG(v) OVER w AS mu,
             STDDEV_SAMP(v) OVER w AS sd
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hr
                   ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, hr, v,
           CASE WHEN n_prior >= 6 AND sd > 0
                THEN ROUND((v - mu) / sd, 6) END AS z,
           COALESCE(
             CASE WHEN n_prior >= 6 AND sd > 0
                  THEN ROUND((v - mu) / sd, 6) END > 3.0, FALSE
           ) AS is_anomaly
    FROM scored ORDER BY event_type, hr
    """,
    note="ROLLING-WINDOW ANOMALY DETECTION — the metrics-pipeline "
    "companion of ts1/ts2: hourly per-type totals scored against the "
    "TRAILING 12-hour window's mean/stddev (current row EXCLUDED — a "
    "spike must not dilute its own baseline), z>3 flagged, warm-up "
    "rows (<6 priors) and zero-variance baselines emit NULL z / false "
    "flag rather than a divide artifact. The frame is ROWS -12..-1 "
    "over the hourly AGGREGATE — one row per (type, hour) whatever the "
    "event volume, so at 100 TB the window state is 12 doubles per "
    "series, and the heavy lifting stays in the partial-agg groupBy "
    "underneath (the d*-family shuffle shape). Flag computed from the "
    "6-dp-ROUNDED z in BOTH engines so the >3 boundary cannot split on "
    "last-ulp stddev differences.",
)
def ts3_rolling_anomaly(spark, sf_dir):
    hourly = (
        t(spark, "events", sf_dir)
        .filter(F.col("value").isNotNull())
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .agg(fdec(F.sum(sdec("value"))).alias("v"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-12, -1)
    )
    scored = hourly.select(
        "event_type",
        "hr",
        "v",
        F.count(F.lit(1)).over(w).alias("n_prior"),
        F.avg("v").over(w).alias("mu"),
        F.stddev_samp("v").over(w).alias("sd"),
    )
    z = F.when(
        (F.col("n_prior") >= 6) & (F.col("sd") > 0),
        F.round((F.col("v") - F.col("mu")) / F.col("sd"), 6),
    )
    return scored.select(
        "event_type",
        "hr",
        "v",
        z.alias("z"),
        F.coalesce(z > 3.0, F.lit(False)).alias("is_anomaly"),
    ).orderBy("event_type", "hr")
