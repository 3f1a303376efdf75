"""Source/sink operator rows (SURVEY §2.A) that are batch-checkable.

A2/A3/A4 stage derived files (deterministic, lossless) then read them
back through Spark's file source — the oracle runs on the original
parquet, so a match proves the full serialize→scan round trip.
A5's oracle re-derives file-level facts from the deterministic chunking
rule (chunk = event_id div 500). Streaming rows A6/A7/A9/A10 are SEM —
exercised in tests/test_replay.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_kinesis_replay_spark.registry import register
from s3_kinesis_replay_spark.queries.helpers import DEC, fdec, sdec, t
from s3_kinesis_replay_spark.sources.archive import (
    DEFAULT_CHUNK_ROWS,
    read_archive,
    stage_archive,
    stage_csv_table,
)


@register(
    "a1_parquet_scan",
    "A1",
    "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem "
    "WHERE l_quantity > 45",
    note="pushdown check: predicate + projection reach the parquet scan",
)
def a1_parquet_scan(spark, sf_dir):
    return (
        t(spark, "lineitem", sf_dir)
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )


@register(
    "a2_jsonlines_scan",
    "A2",
    "SELECT event_id, ts, user_id, event_type, value, props FROM events",
    note="NDJSON archive → rows; lossless round trip vs parquet oracle",
)
def a2_jsonlines_scan(spark, sf_dir):
    root = stage_archive(sf_dir, gz=False)
    return read_archive(spark, root)


@register(
    "a3_csv_scan",
    "A3",
    "SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM part",
)
def a3_csv_scan(spark, sf_dir):
    from s3_kinesis_replay_spark.catalog import table

    root = stage_csv_table(sf_dir, "part")
    schema = table(spark, "part", sf_dir).schema
    return spark.read.csv(f"{root}/part.csv", header=True, schema=schema)


@register(
    "a4_gzip_scan",
    "A4",
    "SELECT event_id, ts, user_id, event_type, value, props FROM events",
    note="transparent .gz decompression by extension (Firehose archive shape)",
)
def a4_gzip_scan(spark, sf_dir):
    root = stage_archive(sf_dir, gz=True)
    return read_archive(spark, root)


@register(
    "a5_archive_listing",
    "A5",
    f"""
    WITH chunks AS (
      SELECT event_id // {DEFAULT_CHUNK_ROWS} AS chunk_id,
             MIN(ts) AS min_ts, COUNT(*) AS n
      FROM events GROUP BY event_id // {DEFAULT_CHUNK_ROWS}
    )
    SELECT strftime(min_ts, '%Y-%m-%d') AS dt,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n) AS BIGINT) AS n_rows
    FROM chunks GROUP BY strftime(min_ts, '%Y-%m-%d')
    """,
    note="archive listing + partition grouping; oracle re-derives the "
    "deterministic chunk→file mapping from parquet",
)
def a5_archive_listing(spark, sf_dir):
    root = stage_archive(sf_dir, gz=True)
    df = read_archive(spark, root, with_partitions=True).withColumn(
        "_file", F.input_file_name()
    )
    return df.groupBy(F.col("dt").cast("string").alias("dt")).agg(
        F.countDistinct("_file").alias("n_files"),
        F.count("*").alias("n_rows"),
    )


@register(
    "a5b_key_range_filter",
    "A5",
    f"""
    WITH chunks AS (
      SELECT event_id // {DEFAULT_CHUNK_ROWS} AS chunk_id,
             MIN(ts) AS min_ts, COUNT(*) AS n
      FROM events GROUP BY event_id // {DEFAULT_CHUNK_ROWS}
    )
    SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_files
    FROM chunks
    WHERE strftime(min_ts, '%Y-%m-%d') BETWEEN '2024-01-05' AND '2024-01-09'
    """,
    note="key-range replay window: dt= partition pruning (the reference's "
    "S3 key-prefix filtering)",
)
def a5b_key_range_filter(spark, sf_dir):
    root = stage_archive(sf_dir, gz=True)
    df = read_archive(spark, root, with_partitions=True).withColumn(
        "_file", F.input_file_name()
    )
    return df.filter(
        (F.col("dt") >= "2024-01-05") & (F.col("dt") <= "2024-01-09")
    ).agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("_file").alias("n_files"),
    )


def _lineitem_sink(spark, sf_dir):
    """Write lineitem as parquet partitioned by l_returnflag (once per
    fixture CONTENT) and return the re-read DataFrame. Shared by a8 (sink
    fidelity) and a8b (partition pruning on the read path).

    Cache key is data_fingerprint (relpath+size+mtime of the source
    parquet), NOT the sf_dir path string: a regenerated fixture at the
    same path gets a fresh sink instead of silently aggregating stale
    data against a fresh-reading oracle (ADVICE r5). Build is atomic
    (temp dir + rename) so concurrent builders race benignly."""
    import os

    from s3_kinesis_replay_spark.operators.similarity import (
        atomic_cached_build,
        data_fingerprint,
    )

    src = os.path.join(sf_dir, "lineitem.parquet")
    key = data_fingerprint(src)

    def build(tmp_dir: str) -> None:
        t(spark, "lineitem", sf_dir).write.mode("overwrite").partitionBy(
            "l_returnflag"
        ).parquet(tmp_dir)

    out = atomic_cached_build("/tmp/skr_sink", key, build, "_SUCCESS")
    return spark.read.parquet(out)


@register(
    "a8_parquet_sink_roundtrip",
    "A8",
    """
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE), 6)
             AS total
    FROM lineitem GROUP BY l_returnflag
    """,
    note="write partitioned parquet, re-read, aggregate — sink fidelity",
)
def a8_parquet_sink_roundtrip(spark, sf_dir):
    back = _lineitem_sink(spark, sf_dir)
    return back.groupBy(F.col("l_returnflag").cast("string").alias("l_returnflag")).agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.expr("CAST(l_extendedprice AS DECIMAL(38,6))")).cast("double"), 6
        ).alias("total"),
    )


@register(
    "a8b_partition_pruned_read",
    "A8",
    """
    SELECT l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity >= 25
    GROUP BY l_linestatus
    """,
    note="partition pruning on the sink's READ path: the filter on the "
    "partition column (l_returnflag) must become a PartitionFilter — "
    "files of non-matching partition directories are never opened "
    "(plan-asserted in tests/test_operators.py). At 100 TB this is the "
    "difference between scanning one partition and scanning the corpus; "
    "the residual l_quantity predicate is pushed to the parquet scan.",
)
def a8b_partition_pruned_read(spark, sf_dir):
    back = _lineitem_sink(spark, sf_dir)
    return (
        back.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 25))
        .groupBy("l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        )
    )


def _zorder_layout(spark, sf_dir: str) -> str:
    """Fingerprint-cached Z-order rewrite of lineitem clustered on
    (l_shipdate, l_partkey) — 16 sorted files whose footers carry tight
    2-D min/max boxes (operators/layout.py). Atomic install; a
    regenerated fixture rebuilds."""
    import os

    from s3_kinesis_replay_spark.operators.layout import zorder_write
    from s3_kinesis_replay_spark.operators.similarity import (
        atomic_cached_build,
        data_fingerprint,
    )

    src = os.path.join(sf_dir, "lineitem.parquet")
    key = data_fingerprint(src) + "-z2"

    def build(tmp_dir: str) -> None:
        li = t(spark, "lineitem", sf_dir)
        zorder_write(
            li,
            tmp_dir,
            dims=[
                F.datediff(F.col("l_shipdate"), F.lit("1995-01-01")),
                F.col("l_partkey"),
            ],
            n_files=16,
            bits=10,
        )

    return atomic_cached_build("/tmp/skr_zorder", key, build, "_SUCCESS")


@register(
    "a11_zorder_scan",
    "A8",
    """
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue
    FROM lineitem
    WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-07-01'
      AND l_partkey BETWEEN 100 AND 500
    GROUP BY l_returnflag
    """,
    note="Z-ORDER clustered rewrite + 2-D box scan (operators/layout.py; "
    "public technique: Morton codes as shipped by Delta OPTIMIZE ZORDER "
    "/ Hudi clustering / Iceberg rewrites). lineitem is rewritten ONCE "
    "(fingerprint-cached) as 16 files range-partitioned and sorted on "
    "the interleaved (l_shipdate, l_partkey) bucket bits — all codegen "
    "shift/AND expressions, one agg pass for min/max, ONE range shuffle "
    "— then the box query reads the copy. Oracle = the same query on "
    "the original table: layout invariance is the correctness half. The "
    "efficiency half is BALANCED pruning: a date-sorted layout is "
    "all-or-nothing (tight on l_shipdate, every file a candidate for "
    "any l_partkey predicate — 16/16), while the z-layout prunes a "
    "real fraction on EVERY clustered dimension (measured sf0.01 "
    "footers: partkey-only 8/16 vs 16/16, date-only 7/16), so its "
    "worst single-dimension scan beats the sort layout's. Measured in "
    "tests/test_operators.py::test_zorder_prunes_box_predicates and "
    "SCALE.md. At 100 TB that is the difference between full scans for "
    "secondary-column predicates and bounded overlap fractions.",
)
def a11_zorder_scan(spark, sf_dir):
    z = _zorder_layout(spark, sf_dir)
    li = spark.read.parquet(z)
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-07-01")
            & F.col("l_partkey").between(100, 500)
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(
                    F.expr(
                        "CAST(l_extendedprice * (1 - l_discount)"
                        " AS DECIMAL(38,6))"
                    )
                ).cast("double"),
                6,
            ).alias("revenue"),
        )
    )


def _compacted_archive(spark, sf_dir: str, target_rows: int = 4000) -> str:
    """Fingerprint-cached COMPACTION of the staged gz-NDJSON archive into
    right-sized parquet: the operational fix for the small-file problem a
    Firehose-style delivery creates (one object per flush — the staged
    archive at sf0.1 is ~200 files of 500 rows; S3 listings and task
    scheduling cost per FILE, so a year of that is millions of tiny
    objects). One range shuffle clusters rows by (dt, event_id) and
    ``maxRecordsPerFile`` caps file size; output is dt=-partitioned
    parquet with ~target_rows rows per file. Atomic install."""
    import math
    import os

    from s3_kinesis_replay_spark.operators.similarity import (
        atomic_cached_build,
        data_fingerprint,
    )
    from s3_kinesis_replay_spark.sources.archive import (
        read_archive,
        stage_archive,
    )

    src = os.path.join(sf_dir, "events.parquet")
    key = data_fingerprint(src) + f"-compact{target_rows}"

    def build(tmp_dir: str) -> None:
        root = stage_archive(sf_dir, gz=True)
        df = read_archive(spark, root, with_partitions=True)
        n = df.count()
        n_out = max(1, math.ceil(n / target_rows))
        (
            df.repartitionByRange(n_out, "dt", "event_id")
            .sortWithinPartitions("dt", "event_id")
            .write.option("maxRecordsPerFile", target_rows)
            .partitionBy("dt")
            .mode("overwrite")
            .parquet(tmp_dir)
        )

    return atomic_cached_build("/tmp/skr_compact", key, build, "_SUCCESS")


@register(
    "a12_compact_small_files",
    "A8",
    """
    SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS dt,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(MIN(event_id) AS BIGINT) AS min_id,
           CAST(MAX(event_id) AS BIGINT) AS max_id
    FROM events GROUP BY 1 ORDER BY 1
    """,
    note="SMALL-FILE COMPACTION — the operational follow-on to the "
    "archive staging (A5) and parquet sink (A8): the Firehose-shaped "
    "gz-NDJSON archive (one small object per flush) is compacted into "
    "dt=-partitioned parquet with ~4000 rows/file via ONE "
    "repartitionByRange(dt, event_id) + maxRecordsPerFile — the "
    "standard bin-pack recipe (Delta OPTIMIZE / Iceberg rewrite_data_"
    "files, public). Correctness = content invariance through "
    "gz->compact->scan (per-day aggregate equals the original table); "
    "the file-count collapse (~200 chunks -> ~26 right-sized files at "
    "sf0.1) and per-file row discipline are asserted in tests/test_"
    "operators.py::test_compaction_binpacks_files. At 100 TB this is "
    "what keeps listings, footers, and task counts proportional to "
    "DATA, not to flush cadence.",
)
def a12_compact_small_files(spark, sf_dir):
    out = _compacted_archive(spark, sf_dir)
    df = spark.read.parquet(out)
    # group by the EVENT's day, not the dt= dir: a staged chunk spanning
    # midnight is labeled with its min-ts date, so the layout column is
    # clustering metadata while ts stays the source of truth
    return (
        df.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("dt"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
        .orderBy("dt")
    )


def _incrementally_compacted(spark, sf_dir: str, target_rows: int = 4000) -> str:
    """Fingerprint-cached INCREMENTAL-compaction demonstration layout:
    seed a day-partitioned events table where only the LAST day is
    fragmented (300-row flushes — 'today's delivery'), then run the
    partition-scoped compactor. Only the fragmented day is rewritten;
    every other day's files stay byte-identical (pinned by mtime in
    tests/test_operators.py::test_incremental_compaction_touches_only_
    fragmented_partitions)."""
    import os

    from s3_kinesis_replay_spark.operators.layout import compact_partitions
    from s3_kinesis_replay_spark.operators.similarity import (
        atomic_cached_build,
        data_fingerprint,
    )

    src = os.path.join(sf_dir, "events.parquet")
    key = data_fingerprint(src) + f"-inccompact{target_rows}"

    def build(tmp_dir: str) -> None:
        from s3_kinesis_replay_spark.operators.layout import (
            seed_fragmented_layout,
        )

        ev = t(spark, "events", sf_dir).withColumn(
            "dt", F.date_format("ts", "yyyy-MM-dd")
        )
        seed_fragmented_layout(
            ev, tmp_dir, target_rows=target_rows, flush_rows=300, n_tasks=16
        )
        compact_partitions(spark, tmp_dir, target_rows=target_rows)

    return atomic_cached_build("/tmp/skr_inccompact", key, build, "_SUCCESS")


@register(
    "a12b_incremental_compaction",
    "A8",
    """
    SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS dt,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(MIN(event_id) AS BIGINT) AS min_id,
           CAST(MAX(event_id) AS BIGINT) AS max_id
    FROM events GROUP BY 1 ORDER BY 1
    """,
    note="INCREMENTAL (partition-scoped) compaction — a12's daily "
    "production form (operators/layout.py::compact_partitions): the "
    "footer-read policy rewrites ONLY partitions whose fragment count "
    "exceeds ceil(rows/target), with an atomic per-partition dir swap; "
    "a year-old partition is never rewritten because today's delivery "
    "fragmented today's. The demonstration layout seeds every day "
    "right-sized except the last (300-row flushes); the compactor "
    "rewrites exactly that day, and untouched days keep byte-identical "
    "files (mtime-pinned in tests). Oracle = layout invariance: the "
    "per-day aggregate over the maintained table equals the source. At "
    "100 TB this is the difference between an OPTIMIZE that costs "
    "O(day) every night and one that rewrites the corpus.",
)
def a12b_incremental_compaction(spark, sf_dir):
    out = _incrementally_compacted(spark, sf_dir)
    df = spark.read.parquet(out)
    return (
        df.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("dt"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
        .orderBy("dt")
    )


def _schema_evolved(spark, sf_dir: str, target_rows: int = 4000) -> str:
    """Fingerprint-cached SCHEMA-EVOLVED layout: historical days land
    with the original events schema; the NEWEST day arrives from an
    upgraded producer carrying one extra column (``value_cents`` =
    floor(value*100), the v2 ingest contract) AND fragmented into
    flush-sized files — then the partition-scoped compactor (a12b path)
    runs ACROSS the schema boundary. Old-schema partitions survive
    byte-identical (the policy never touches right-sized days), the new
    day is rewritten within its own schema, and a ``mergeSchema`` read
    unifies the tree with NULL fill for pre-evolution rows."""
    import os

    from s3_kinesis_replay_spark.operators.layout import compact_partitions
    from s3_kinesis_replay_spark.operators.similarity import (
        atomic_cached_build,
        data_fingerprint,
    )

    src = os.path.join(sf_dir, "events.parquet")
    key = data_fingerprint(src) + f"-evolve{target_rows}"

    def build(tmp_dir: str) -> None:
        ev = t(spark, "events", sf_dir).withColumn(
            "dt", F.date_format("ts", "yyyy-MM-dd")
        )
        last_day = ev.agg(F.max("dt")).collect()[0][0]
        (
            ev.filter(F.col("dt") < last_day)
            .repartition(16, "dt")
            .sortWithinPartitions("dt", "event_id")
            .write.option("maxRecordsPerFile", target_rows)
            .partitionBy("dt")
            .mode("overwrite")
            .parquet(tmp_dir)
        )
        (
            ev.filter(F.col("dt") == last_day)
            # the v2 producer's widened schema: floor keeps both engines
            # bit-identical (round() tie semantics differ across engines)
            .withColumn(
                "value_cents", F.floor(F.col("value") * 100).cast("long")
            )
            .repartition(4)
            .write.option("maxRecordsPerFile", 300)
            .partitionBy("dt")
            .mode("append")
            .parquet(tmp_dir)
        )
        compact_partitions(spark, tmp_dir, target_rows=target_rows)

    return atomic_cached_build("/tmp/skr_evolve", key, build, "_SUCCESS")


@register(
    "a13_schema_evolution",
    "A8",
    """
    WITH e AS (
      SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS dt,
             CAST(FLOOR(value * 100) AS BIGINT) AS vc
      FROM events
    )
    SELECT dt,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(CASE WHEN dt = (SELECT MAX(dt) FROM e) THEN vc END)
                AS BIGINT) AS n_v2,
           CAST(SUM(CASE WHEN dt = (SELECT MAX(dt) FROM e) THEN vc END)
                AS BIGINT) AS sum_cents
    FROM e GROUP BY dt ORDER BY dt
    """,
    note="PARQUET-SINK SCHEMA EVOLUTION — the lakehouse verb a12b left "
    "unexercised (VERDICT r9 gap 4): the newest day's delivery carries a "
    "WIDENED schema (added value_cents column, the v2 producer "
    "contract), the partition-scoped compactor runs across the schema "
    "boundary (old-schema partitions byte-untouched, pinned in tests/"
    "test_operators.py::test_schema_evolution_preserves_old_partitions), "
    "and the table reads back with mergeSchema=true: pre-evolution rows "
    "take NULL in the new column — exactly the n_v2=0/sum_cents=NULL "
    "rows of every historical day. Oracle = the same NULL-fill computed "
    "explicitly from the source table. At 100 TB column-add without "
    "corpus rewrite is the only affordable evolution path; the footer-"
    "merge read and partition-scoped rewrite keep it O(new data).",
)
def a13_schema_evolution(spark, sf_dir):
    out = _schema_evolved(spark, sf_dir)
    df = spark.read.option("mergeSchema", "true").parquet(out)
    return (
        df.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("dt"))
        .agg(
            F.count("*").alias("n_events"),
            F.count("value_cents").alias("n_v2"),
            F.sum("value_cents").alias("sum_cents"),
        )
        .orderBy("dt")
    )


def _appended_bucketed_events(spark, sf_dir: str) -> str:
    """Bucketed-table INGEST maintenance: install an 8-bucket events
    table (bucketed+sorted on user_id) built from an initial load PLUS a
    later delivery APPENDED with the same bucket spec — the incremental
    path a co-located layout lives on in production. Appends never
    shuffle existing data (each delivery adds one sorted file per
    bucket); the cost is per-bucket file counts growing until the next
    compaction, and Spark downgrades the sorted-merge to a per-task Sort
    while keeping ZERO Exchange (asserted in tests). Atomic install +
    fingerprint-keyed name, c1c discipline."""
    import os

    from s3_kinesis_replay_spark.operators.similarity import data_fingerprint
    from s3_kinesis_replay_spark.queries.relational import (
        _ensure_bucketed_table,
    )

    from s3_kinesis_replay_spark.catalog import _table_meta, refresh_stats

    fp = data_fingerprint(os.path.join(sf_dir, "events.parquet"))[:10]
    tname = f"skr_evb8_{fp}"
    if spark.catalog.tableExists(tname):
        # heal a crash between install and ANALYZE: the cached table must
        # not stay CBO-dead forever (c1e lifecycle discipline, r11)
        if not _table_meta(spark, tname)[1]:
            refresh_stats(spark, tname)
        return tname

    ev = t(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )

    def write_fn(tmp_tbl: str, tmp: str) -> None:
        initial = ev.filter(F.col("event_id") % 4 != 3)
        delivery = ev.filter(F.col("event_id") % 4 == 3)
        (
            initial.repartition(8, F.col("user_id"))
            .write.bucketBy(8, "user_id")
            .sortBy("user_id")
            .option("path", tmp)
            .mode("overwrite")
            .saveAsTable(tmp_tbl)
        )
        # the later delivery: same bucket spec, mode append — co-location
        # preserved, existing files untouched, one new file per bucket
        (
            delivery.repartition(8, F.col("user_id"))
            .write.bucketBy(8, "user_id")
            .sortBy("user_id")
            .mode("append")
            .saveAsTable(tmp_tbl)
        )

    # shared install ritual: atomic rename + CREATE CLUSTERED BY + the
    # stale-fingerprint reap (review r10: the inlined copy leaked every
    # superseded skr_evb8_* dir — a full events copy each)
    _ensure_bucketed_table(spark, ev, "user_id", tname, write_fn=write_fn)
    # Post-ingest stats refresh (VERDICT r10 item 2): the freshly
    # registered table carries NO catalog stats (CREATE over an existing
    # location), so every CBO costing would fall back to file-size
    # guesses. c1e pins the full lifecycle (drop-on-append /
    # stale-on-external-write); this is its application to a14's ingest.
    refresh_stats(spark, tname)
    return tname


@register(
    "a14_bucketed_append",
    "A8",
    """
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(event_id) AS BIGINT) AS last_event_id
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    note="BUCKETED-TABLE APPEND maintenance — c1c's co-located layout "
    "meeting A8's incremental-ingest reality: the events table is "
    "installed as an initial 8-bucket load on user_id plus a later "
    "delivery (event_id%4=3) APPENDED with the same bucket spec. "
    "Appends move ONLY the delivery (one sorted file per bucket lands "
    "next to the existing ones — no rewrite, no shuffle of history), "
    "and every downstream user_id-keyed aggregate or join still runs "
    "with ZERO Exchange off the bucketed scan (per-task Sort replaces "
    "the global one — the trade pinned in tests/test_operators.py::"
    "test_a14_bucketed_append_layout). Oracle = content invariance: the "
    "per-user aggregate over the appended table equals the source. At "
    "100 TB this is how a co-located fact ingests daily without paying "
    "the bucketing shuffle ever again — until per-bucket file counts "
    "warrant an a12b-style compaction INSIDE each bucket.",
)
def a14_bucketed_append(spark, sf_dir):
    tname = _appended_bucketed_events(spark, sf_dir)
    return (
        spark.table(tname)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("event_id").alias("last_event_id"),
        )
        .orderBy("user_id")
    )


def _time_travel_table(spark, sf_dir: str) -> str:
    """Install (once, fingerprint-cached, atomic) a 3-version
    manifest-table over events: v1 = initial load (event_id < 5000),
    v2 = append of the rest, v3 = overwrite keeping only purchases —
    the create/ingest/rewrite lifecycle every versioned table lives."""
    import os

    from s3_kinesis_replay_spark.operators.similarity import (
        atomic_cached_build,
        data_fingerprint,
    )
    from s3_kinesis_replay_spark.operators.table_format import (
        snapshot_write,
    )

    fp = data_fingerprint(os.path.join(sf_dir, "events.parquet"))[:10]
    ev = t(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )

    def build(tmp: str) -> None:
        snapshot_write(
            spark, ev.filter(F.col("event_id") < 5000), tmp, mode="overwrite"
        )
        snapshot_write(
            spark, ev.filter(F.col("event_id") >= 5000), tmp, mode="append"
        )
        snapshot_write(
            spark,
            ev.filter(F.col("event_type") == "purchase"),
            tmp,
            mode="overwrite",
        )

    # cache tag bumped r13: manifests must carry committed_at (a16's
    # TIMESTAMP AS OF reads v2's commit time; an r12-cached build lacks it)
    return atomic_cached_build(
        "/tmp/skr_timetravel", f"{fp}-v4t", build, "_latest"
    )


@register(
    "a15_time_travel",
    "A8",
    f"""
    SELECT CAST(1 AS BIGINT) AS version, 'overwrite' AS operation,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value
    FROM events WHERE event_id < 5000
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'append', CAST(COUNT(*) AS BIGINT),
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6)
    FROM events
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'overwrite', CAST(COUNT(*) AS BIGINT),
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6)
    FROM events WHERE event_type = 'purchase'
    ORDER BY version
    """,
    note="TIME TRAVEL over a manifest-versioned parquet table "
    "(operators/table_format.py — the minimal Delta/Iceberg-family "
    "member: immutable data files + atomic manifest swaps; public "
    "designs). The installed table carries three snapshots (initial "
    "load / append / compaction-style overwrite) and the entry reads "
    "ALL THREE 'AS OF' their versions from ONE physical table — the "
    "append never rewrote v1's files (a14 discipline) and the "
    "overwrite never deleted them (only vacuum does, tested "
    "separately with the reachability rule). The oracle recomputes "
    "each version's aggregate from the source filters, so a manifest "
    "that lists wrong files, an append that drops history, or a "
    "version pointer off by one hash-mismatches. At 100 TB: a "
    "snapshot is O(#files) metadata — time travel costs one manifest "
    "read, reproducible-training-run pinning costs one version "
    "number, and retention is a metadata diff (snapshot_vacuum).",
)
def a15_time_travel(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.table_format import (
        snapshot_read,
        versions,
    )
    from s3_kinesis_replay_spark.queries.helpers import fdec, sdec

    root = _time_travel_table(spark, sf_dir)
    ops = {1: "overwrite", 2: "append", 3: "overwrite"}
    out = None
    for v in versions(root):
        agg = snapshot_read(spark, root, version=v).agg(
            F.count(F.lit(1)).alias("n_rows"),
            fdec(F.sum(sdec("value"))).alias("sum_value"),
        ).select(
            F.lit(v).cast("bigint").alias("version"),
            F.lit(ops[v]).alias("operation"),
            "n_rows",
            "sum_value",
        )
        out = agg if out is None else out.unionByName(agg)
    return out.orderBy("version")


@register(
    "a15b_snapshot_changes",
    "A8",
    f"""
    SELECT 'insert' AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value
    FROM events WHERE event_id >= 5000
    """,
    note="FILE-LEVEL CDC over the a15 manifest table: 'what changed "
    "between v1 and v2' is answered from the MANIFEST DIFF alone — the "
    "v2 append committed new files without touching v1's, so reading "
    "exactly (files(v2) − files(v1)) IS the inserted-rows relation, "
    "zero data diffing, zero history scan (Delta CDF's append-only "
    "fast path; c2d's key-level snapshot diff covers the "
    "updates/deletes case this operator REFUSES — asserted in tests: "
    "crossing an overwrite version raises instead of mislabeling a "
    "layout diff as a row diff). The scan-only-new-files property is "
    "pinned via inputFiles() ⊂ manifest diff in the test. At 100 TB "
    "this is how an incremental consumer (p18's daily batch, an index "
    "append, a downstream aggregate refresh) discovers its day's work "
    "in O(metadata), not O(table).",
)
def a15b_snapshot_changes(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.table_format import (
        snapshot_changes,
    )

    root = _time_travel_table(spark, sf_dir)
    changes = snapshot_changes(spark, root, from_version=1, to_version=2)
    return changes.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        fdec(F.sum(sdec("value"))).alias("sum_value"),
    ).select(
        F.lit("insert").alias("change_type"),
        "n_rows",
        "n_users",
        "sum_value",
    )


def _p22_base_aggregate(spark, sf_dir: str, root: str) -> str:
    """The STORED materialized aggregate (per-user count/sum over
    snapshot v1), built once per fixture content and persisted —
    incremental refresh reads this artifact plus the CDC delta, never
    the v1 data again."""
    import os

    from s3_kinesis_replay_spark.operators.similarity import (
        atomic_cached_build,
        data_fingerprint,
    )
    from s3_kinesis_replay_spark.operators.table_format import snapshot_read

    fp = data_fingerprint(os.path.join(sf_dir, "events.parquet"))[:10]

    def build(tmp: str) -> None:
        (
            snapshot_read(spark, root, version=1)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(sdec("value")).alias("sum_value_dec"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(tmp, "agg"))
        )

    return atomic_cached_build(
        "/tmp/skr_p22_base", f"{fp}-v1agg", build, os.path.join("agg", "_SUCCESS")
    )


@register(
    "p22_incremental_aggregate",
    "D1",
    f"""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    note="INCREMENTAL VIEW MAINTENANCE — the downstream consumer the "
    "a15b CDC exists for: a per-user aggregate is maintained as a "
    "STORED artifact (built once over snapshot v1, fingerprint-cached) "
    "and refreshed by merging ONLY the CDC delta (files(v2)−files(v1), "
    "read via snapshot_changes) — decimal partial sums and counts are "
    "ADDITIVE, so refresh = union the stored partials with the delta's "
    "partials and re-aggregate, touching O(delta) data + O(groups) "
    "artifact, never the v1 history (the self-maintainable-view case; "
    "non-additive aggregates — MIN/MAX under deletes, exact distinct — "
    "need the sketch tier d4b/d7b/d16 or a recompute). Oracle = the "
    "full aggregate over ALL events recomputed from source: a merge "
    "that double-counts, drops a group, or loses decimal exactness "
    "hash-mismatches. Equality with the direct v2 aggregate plus the "
    "reads-only-delta property are additionally pinned in tests.",
)
def p22_incremental_aggregate(spark, sf_dir):
    import os

    from s3_kinesis_replay_spark.operators.table_format import (
        snapshot_changes,
    )

    root = _time_travel_table(spark, sf_dir)
    base = spark.read.parquet(
        os.path.join(_p22_base_aggregate(spark, sf_dir, root), "agg")
    )
    delta = (
        snapshot_changes(spark, root, from_version=1, to_version=2)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(sdec("value")).alias("sum_value_dec"),
        )
    )
    return (
        base.unionByName(delta)
        .groupBy("user_id")
        .agg(
            F.sum("n_events").alias("n_events"),
            fdec(F.sum("sum_value_dec")).alias("sum_value"),
        )
        .orderBy("user_id")
    )


@register(
    "a15d_pruned_time_travel",
    "A8",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value
    FROM events WHERE event_id BETWEEN 7000 AND 8000
    """,
    note="MANIFEST-LEVEL FILE SKIPPING on the time-travel read path: the "
    "snapshot's file list is pruned against the [7000, 8000] event_id "
    "predicate using parquet footer min/max BEFORE Spark ever lists a "
    "file (operators/table_format.py::snapshot_read_pruned, sharing "
    "layout.py::file_overlaps' exact semantics — stats-less row groups "
    "keep a file candidate), with the residual predicate re-applied on "
    "the scan for row-level exactness. v1's initial-load files carry "
    "only event_id < 5000, so they are provably outside the predicate "
    "box and never opened (pinned via inputFiles() in tests). This is "
    "Iceberg's signature read-path win expressed over the a15 table: "
    "at 100 TB the stats would be lifted INTO the manifest at commit "
    "time so skipping costs zero footer reads — same rule, different "
    "stats residence. Oracle recomputes from the source predicate.",
)
def a15d_pruned_time_travel(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.table_format import (
        snapshot_read_pruned,
    )

    root = _time_travel_table(spark, sf_dir)
    df, _n_read, _n_total = snapshot_read_pruned(
        spark, root, {"event_id": (7000, 8000)}, version=2
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        fdec(F.sum(sdec("value"))).alias("sum_value"),
    )


def _mor_delete_table(spark, sf_dir: str) -> str:
    """Install (once, fingerprint-cached, atomic) the merge-on-read
    table: v1 = full events load, v2 = DELETE of every click by a
    user_id%7==0 user — committed as a key file, data untouched."""
    import os

    from s3_kinesis_replay_spark.operators.similarity import (
        atomic_cached_build,
        data_fingerprint,
    )
    from s3_kinesis_replay_spark.operators.table_format import (
        snapshot_delete,
        snapshot_write,
    )

    fp = data_fingerprint(os.path.join(sf_dir, "events.parquet"))[:10]
    ev = t(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )

    def build(tmp: str) -> None:
        snapshot_write(spark, ev, tmp, mode="overwrite")
        doomed = ev.filter(
            (F.col("event_type") == "click") & (F.col("user_id") % 7 == 0)
        ).select("event_id")
        snapshot_delete(spark, tmp, doomed, "event_id")

    # cache tag bumped r12: manifests now carry per-file seq/stats/schema
    return atomic_cached_build(
        "/tmp/skr_mordelete", f"{fp}-mor2", build, "_latest"
    )


@register(
    "a15e_merge_on_read_delete",
    "A8",
    f"""
    SELECT CAST(1 AS BIGINT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value
    FROM events
    UNION ALL
    SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6)
    FROM events WHERE NOT (event_type = 'click' AND user_id % 7 = 0)
    ORDER BY version
    """,
    note="MERGE-ON-READ ROW DELETES over the manifest table "
    "(operators/table_format.py::snapshot_delete — the Hudi/Iceberg "
    "MOR discipline, key-based): the delete commit writes ONLY a "
    "key file (O(deleted keys)), data files stay byte-untouched, and "
    "readers apply a broadcast anti-join of the delete keys. The entry "
    "reads v1 (pre-delete: rows still visible — time travel across a "
    "delete) and v2 (post-delete) from one physical table; the oracle "
    "recomputes both from the source predicate, so a delete that "
    "misses keys, leaks rows, or bleeds into the earlier version "
    "hash-mismatches. At 100 TB: deletes land in O(keys) at commit "
    "time; the read-side anti-join is the rent until an a12-style "
    "compaction folds the deletes into rewritten files and drops the "
    "key files — the same write-cheap/read-rent trade every MOR table "
    "makes. GDPR-erasure shape: the delete is durable, versioned, and "
    "vacuum-safe (delete files are reachability-tracked).",
)
def a15e_merge_on_read_delete(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.table_format import snapshot_read

    root = _mor_delete_table(spark, sf_dir)
    out = None
    for v in (1, 2):
        agg = snapshot_read(spark, root, version=v).agg(
            F.count(F.lit(1)).alias("n_rows"),
            fdec(F.sum(sdec("value"))).alias("sum_value"),
        ).select(
            F.lit(v).cast("bigint").alias("version"), "n_rows", "sum_value"
        )
        out = agg if out is None else out.unionByName(agg)
    return out.orderBy("version")


@register(
    "a15f_manifest_stats_pruning",
    "A8",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value,
           TRUE AS pruned
    FROM events WHERE event_id BETWEEN 6000 AND 6500
    """,
    note="MANIFEST-EMBEDDED COLUMN STATS (r12) — the a15d→a15f upgrade "
    "and the round-11 verdict's top item: per-file [min, max] stats are "
    "captured from the parquet footer ONCE at COMMIT time (the writer "
    "just produced the file; operators/layout.py::file_column_stats) "
    "and stored in the manifest entry, so snapshot_read_pruned prunes "
    "the file list from O(1) manifest metadata with ZERO per-query "
    "footer I/O — r11 re-read every footer per pruned read, O(files) "
    "driver I/O that a 100k-file table pays per query (Iceberg keeps "
    "stats in manifests for exactly this reason). ENFORCED engine-side: "
    "the entry raises if the footer-fallback counter moves during the "
    "read (table_format.FOOTER_FALLBACK_READS — only legacy stats-less "
    "entries may fall back) or if pruning fails to drop v1's "
    "provably-disjoint files. Oracle recomputes from the source "
    "predicate; the residual filter keeps row-level exactness, so a "
    "manifest stat that lies (wrong min/max -> wrongly pruned file) "
    "hash-mismatches.",
)
def a15f_manifest_stats_pruning(spark, sf_dir):
    from s3_kinesis_replay_spark.operators import table_format as tf

    root = _time_travel_table(spark, sf_dir)
    # per-call counter, not a global before/after delta — a concurrent
    # pruned read elsewhere in the driver can no longer fire this gate
    # spuriously or mask a real fallback (ADVICE r12)
    ctr: dict = {}
    df, n_read, n_total = tf.snapshot_read_pruned(
        spark, root, {"event_id": (6000, 6500)}, version=2, counters=ctr
    )
    if ctr["footer_fallbacks"]:
        raise RuntimeError(
            "a15f gate FAILED: pruned read paid "
            f"{ctr['footer_fallbacks']} parquet footer reads — "
            "manifest stats must answer pruning with zero per-query I/O"
        )
    if not (0 < n_read < n_total):
        raise RuntimeError(
            f"a15f gate FAILED: pruning ineffective ({n_read}/{n_total} "
            "files kept) — v1's event_id<5000 files are provably outside "
            "[6000, 6500] and must be skipped"
        )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        fdec(F.sum(sdec("value"))).alias("sum_value"),
    ).withColumn("pruned", F.lit(True))


def _merge_table(spark, sf_dir: str) -> str:
    """Install (once, fingerprint-cached, atomic) the MERGE fixture:
    v1 = full events load; v2 = ONE atomic merge commit that updates
    every event_id%10==3 row (value doubled) and inserts a shifted copy
    (event_id + 20000000) of every event_id%100==7 row."""
    import os

    from s3_kinesis_replay_spark.operators.similarity import (
        atomic_cached_build,
        data_fingerprint,
    )
    from s3_kinesis_replay_spark.operators.table_format import (
        snapshot_merge,
        snapshot_write,
    )

    fp = data_fingerprint(os.path.join(sf_dir, "events.parquet"))[:10]
    ev = t(spark, "events", sf_dir).select("event_id", "user_id", "value")

    def build(tmp: str) -> None:
        snapshot_write(spark, ev, tmp, mode="overwrite")
        updates = ev.filter(F.col("event_id") % 10 == 3).withColumn(
            "value", F.col("value") * 2
        )
        inserts = ev.filter(F.col("event_id") % 100 == 7).withColumn(
            "event_id", F.col("event_id") + 20000000
        )
        snapshot_merge(spark, tmp, updates.unionByName(inserts), "event_id")

    return atomic_cached_build(
        "/tmp/skr_mergetbl", f"{fp}-mrg1", build, "_latest"
    )


@register(
    "a15g_merge_upsert",
    "A8",
    f"""
    SELECT CAST(1 AS BIGINT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value
    FROM events
    UNION ALL
    SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6)
    FROM (
      SELECT value FROM events WHERE event_id % 10 <> 3
      UNION ALL
      SELECT value * 2 AS value FROM events WHERE event_id % 10 = 3
      UNION ALL
      SELECT value FROM events WHERE event_id % 100 = 7
    )
    ORDER BY version
    """,
    note="KEY-BASED MERGE INTO (upsert) over the manifest table — THE "
    "daily lakehouse verb, composed from the MOR pieces as ONE atomic "
    "commit (operators/table_format.py::snapshot_merge): the commit "
    "appends the source rows AND adds a delete-key file of the source's "
    "keys; SEQUENCE SCOPING (delete at seq v applies only to files with "
    "seq < v, Iceberg equality-delete rule) makes matched rows replaced, "
    "unmatched source rows inserts, unmatched target rows survivors — "
    "and the merge's own rows immune to its own delete file. Zero data "
    "rewrite, O(source) write cost, base-validated commit with bounded "
    "retry under concurrent writers. The entry reads v1 (pre-merge — "
    "time travel across the merge) and v2 from one physical table; the "
    "oracle recomputes both as the anti-join + union equivalent, so a "
    "merge that drops a survivor, double-applies an update, or "
    "suppresses its own inserts hash-mismatches.",
)
def a15g_merge_upsert(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.table_format import snapshot_read

    root = _merge_table(spark, sf_dir)
    out = None
    for v in (1, 2):
        agg = snapshot_read(spark, root, version=v).agg(
            F.count(F.lit(1)).alias("n_rows"),
            fdec(F.sum(sdec("value"))).alias("sum_value"),
        ).select(
            F.lit(v).cast("bigint").alias("version"), "n_rows", "sum_value"
        )
        out = agg if out is None else out.unionByName(agg)
    return out.orderBy("version")


def _schema_evolution_table(spark, sf_dir: str) -> str:
    """Install (once, fingerprint-cached, atomic) the schema-evolution
    fixture: v1 = initial load (event_id < 5000) under the 3-column
    schema; v2 = append of the rest carrying a NEW 'src' column."""
    import os

    from s3_kinesis_replay_spark.operators.similarity import (
        atomic_cached_build,
        data_fingerprint,
    )
    from s3_kinesis_replay_spark.operators.table_format import snapshot_write

    fp = data_fingerprint(os.path.join(sf_dir, "events.parquet"))[:10]
    ev = t(spark, "events", sf_dir).select("event_id", "user_id", "value")

    def build(tmp: str) -> None:
        snapshot_write(
            spark, ev.filter(F.col("event_id") < 5000), tmp, mode="overwrite"
        )
        snapshot_write(
            spark,
            ev.filter(F.col("event_id") >= 5000).withColumn(
                "src", F.lit("late")
            ),
            tmp,
            mode="append",
        )

    return atomic_cached_build(
        "/tmp/skr_schevo", f"{fp}-se1", build, "_latest"
    )


@register(
    "a15h_schema_evolution",
    "A8",
    f"""
    SELECT CASE WHEN event_id < 5000 THEN 'initial' ELSE 'late' END AS src,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value
    FROM events GROUP BY 1 ORDER BY src
    """,
    note="ADD-COLUMN SCHEMA EVOLUTION over the manifest table (r12): "
    "each manifest records its snapshot's schema (a13's discipline "
    "applied to a15); an append may ADD columns — the read pins the "
    "MANIFEST schema on the scan, so files written before the evolution "
    "NULL-fill the new column in one pass (no mergeSchema footer sweep, "
    "stable column order), while a TYPE CHANGE on an existing column is "
    "refused at commit (silently coercing is how tables corrupt; tested "
    "in test_schema_evolution_add_column_and_refuse_type_change along "
    "with time travel across the boundary: v1 keeps its own narrower "
    "schema). The entry groups the evolved table by "
    "COALESCE(src, 'initial') — exactly the NULL-fill boundary — so a "
    "read that drops the new column, fills it wrong, or leaks it into "
    "pre-evolution rows hash-mismatches against the oracle's CASE "
    "recomputation from source. At 100 TB: evolution is a metadata-only "
    "commit; no data file is ever rewritten for a schema change.",
)
def a15h_schema_evolution(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.table_format import snapshot_read

    root = _schema_evolution_table(spark, sf_dir)
    return (
        snapshot_read(spark, root)
        .groupBy(F.coalesce("src", F.lit("initial")).alias("src"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
            fdec(F.sum(sdec("value"))).alias("sum_value"),
        )
        .orderBy("src")
    )


def _incremental_manifest_table(spark, sf_dir: str) -> str:
    """Install (once, fingerprint-cached, atomic) the a15i fixture: an
    initial load (event_id%4==0) plus three appends (parts 1..3) —
    four commits whose metadata growth the entry's gate measures."""
    import os

    from s3_kinesis_replay_spark.operators.similarity import (
        atomic_cached_build,
        data_fingerprint,
    )
    from s3_kinesis_replay_spark.operators.table_format import snapshot_write

    fp = data_fingerprint(os.path.join(sf_dir, "events.parquet"))[:10]
    ev = t(spark, "events", sf_dir).select("event_id", "event_type", "value")

    def build(tmp: str) -> None:
        snapshot_write(
            spark, ev.filter(F.col("event_id") % 4 == 0), tmp, "overwrite"
        )
        for j in (1, 2, 3):
            snapshot_write(
                spark, ev.filter(F.col("event_id") % 4 == j), tmp, "append"
            )

    return atomic_cached_build(
        "/tmp/skr_incrmanifest", f"{fp}-im1", build, "_latest"
    )


@register(
    "a15i_incremental_manifest",
    "A8",
    f"""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    note="TWO-LEVEL MANIFEST METADATA (r12b) — Iceberg's manifest-list/"
    "manifest split applied to the a15 table: a manifest holds segment "
    "DESCRIPTORS ({path, seq}); each commit writes ONE immutable "
    "segment listing only ITS OWN new files (+stats), so commit "
    "metadata cost is O(new files) + O(#commits) descriptors — the "
    "flat manifest re-serialized EVERY file entry per append, ~30 MB "
    "of JSON per commit at a 100k-file table, an O(table) write that "
    "murders high-frequency ingest (a15c commits per micro-batch). "
    "ENFORCED engine-side: over an initial load + 3 appends the gate "
    "raises unless (a) each append adds exactly one segment descriptor, "
    "(b) each append's segment lists only that commit's files, and "
    "(c) consecutive manifest byte sizes differ by less than one "
    "descriptor+slack (512 B) while the table's file count grows. "
    "Sequence numbers live on the DESCRIPTOR, so a conflict retry "
    "re-links the same segment bytes under the new sequence with zero "
    "rewrite. Oracle = content invariance of the fully-assembled table.",
)
def a15i_incremental_manifest(spark, sf_dir):
    import os

    from s3_kinesis_replay_spark.operators import table_format as tf

    root = _incremental_manifest_table(spark, sf_dir)
    sizes = {}
    for v in tf.versions(root):
        m = tf._read_manifest(root, v)
        segs = m.get("segments", [])
        if len(segs) != v:
            raise RuntimeError(
                f"a15i gate FAILED: v{v} carries {len(segs)} segments, "
                f"expected {v} (one immutable segment per commit)"
            )
        own = [d for d in segs if d["seq"] == v]
        if len(own) != 1:
            raise RuntimeError(
                f"a15i gate FAILED: v{v} added {len(own)} segments at its "
                "own sequence — a commit must write exactly one"
            )
        n_total = len(tf._entries(m, root))
        n_own = len(tf._load_segment(root, own[0]))
        if v > 1 and not (0 < n_own < n_total):
            raise RuntimeError(
                f"a15i gate FAILED: v{v}'s segment lists {n_own} of "
                f"{n_total} files — it must list ONLY its own commit"
            )
        sizes[v] = os.path.getsize(tf._manifest_path(root, v))
    for v in range(3, max(sizes) + 1):
        growth = sizes[v] - sizes[v - 1]
        if growth > 512:
            raise RuntimeError(
                f"a15i gate FAILED: manifest v{v} grew {growth} B over "
                f"v{v - 1} — append metadata must be O(one descriptor), "
                "not O(table files)"
            )
    return (
        tf.snapshot_read(spark, root)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            fdec(F.sum(sdec("value"))).alias("sum_value"),
        )
        .orderBy("event_type")
    )


def _folded_table(spark, sf_dir: str) -> str:
    """Install (once, fingerprint-cached, atomic) the a15k fixture:
    load + append + MOR delete, then a metadata-only fold — the admin
    sequence an always-on ingest table runs periodically."""
    import os

    from s3_kinesis_replay_spark.operators.similarity import (
        atomic_cached_build,
        data_fingerprint,
    )
    from s3_kinesis_replay_spark.operators.table_format import (
        snapshot_delete,
        snapshot_fold_metadata,
        snapshot_write,
    )

    fp = data_fingerprint(os.path.join(sf_dir, "events.parquet"))[:10]
    ev = t(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )

    def build(tmp: str) -> None:
        snapshot_write(
            spark, ev.filter(F.col("event_id") < 5000), tmp, "overwrite"
        )
        snapshot_write(
            spark, ev.filter(F.col("event_id") >= 5000), tmp, "append"
        )
        doomed = ev.filter(
            (F.col("event_type") == "click") & (F.col("user_id") % 9 == 0)
        ).select("event_id")
        snapshot_delete(spark, tmp, doomed, "event_id")
        snapshot_fold_metadata(tmp)

    return atomic_cached_build(
        "/tmp/skr_foldtbl", f"{fp}-fold1", build, "_latest"
    )


@register(
    "a15k_fold_metadata",
    "A8",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value
    FROM events WHERE NOT (event_type = 'click' AND user_id % 9 = 0)
    """,
    note="MANIFEST COMPACTION (metadata-only fold — Iceberg's "
    "rewrite_manifests expressed over the a15 table): after a "
    "load/append/MOR-delete history, snapshot_fold_metadata commits a "
    "version whose metadata is ONE data segment + ONE delete segment, "
    "touching ZERO data files — the reset for the O(#commits) "
    "descriptor growth an always-on ingest accrues (measured in "
    "SCALE.md: 10k micro-batch commits ≈ 0.5 MB of descriptors per "
    "manifest before the fold, one descriptor after). The subtle "
    "correctness burden is SEQUENCE PRESERVATION: folded entries keep "
    "their original commit sequence inline, so the sequence-scoped "
    "delete (committed before the fold) still suppresses exactly the "
    "pre-delete files. ENFORCED engine-side: the entry raises unless "
    "the folded manifest has exactly one data segment and one delete "
    "segment; the oracle recomputes the surviving rows from source, so "
    "a fold that loses an entry, drops delete state, or breaks seq "
    "scoping hash-mismatches.",
)
def a15k_fold_metadata(spark, sf_dir):
    from s3_kinesis_replay_spark.operators import table_format as tf

    root = _folded_table(spark, sf_dir)
    m = tf._read_manifest(root, tf.latest_version(root))
    if m["operation"] != "fold" or len(m["segments"]) != 1 or len(
        m.get("delete_segments", [])
    ) != 1:
        raise RuntimeError(
            "a15k gate FAILED: expected a folded manifest with exactly "
            f"one data + one delete segment, got op={m['operation']!r}, "
            f"{len(m.get('segments', []))} data segments, "
            f"{len(m.get('delete_segments', []))} delete segments"
        )
    return tf.snapshot_read(spark, root).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        fdec(F.sum(sdec("value"))).alias("sum_value"),
    )


@register(
    "a16_sql_time_travel",
    "A8",
    f"""
    SELECT CAST(1 AS BIGINT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value
    FROM events WHERE event_id < 5000
    UNION ALL
    SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT user_id) AS BIGINT),
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6)
    FROM events
    UNION ALL
    SELECT CAST(3 AS BIGINT), CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT user_id) AS BIGINT),
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6)
    FROM events WHERE event_type = 'purchase'
    ORDER BY version
    """,
    note="SQL/CATALOG SURFACE for the manifest-table tier (VERDICT r12 "
    "item 1 — the a15 capabilities were reachable only by importing "
    "operator modules): Engine.register_snapshot_table exposes a "
    "versioned table as an ordinary temp view, and Engine.sql resolves "
    "Delta-style time-travel clauses over it — this entry's THREE "
    "branches read 'snap VERSION AS OF 1', \"snap TIMESTAMP AS OF "
    "<v2's committed_at>\", and plain latest (v3) from ONE registered "
    "name, in ONE SQL statement, through the same Catalyst planner as "
    "every fixture view (catalog.resolve_time_travel rewrites each "
    "clause into a per-snapshot view via the ordinary manifest read — "
    "pure metadata, the trick Delta's SQL extension plays at parser "
    "level). The oracle recomputes each version's aggregate from the "
    "source filters, so a rewrite that resolves the wrong version, a "
    "TIMESTAMP resolution off by one commit, or a stale registered view "
    "hash-mismatches. At 100 TB nothing changes: clause resolution is "
    "one manifest read, and the resolved scan is the same pruned "
    "file-list read every a15 entry already pays.",
)
def a16_sql_time_travel(spark, sf_dir):
    from s3_kinesis_replay_spark.engine import Engine
    from s3_kinesis_replay_spark.operators import table_format as tf

    root = _time_travel_table(spark, sf_dir)
    eng = Engine(spark, sf_dir=sf_dir)
    eng.register_snapshot_table("events_snap", root)
    # v2's wall-clock commit time, straight from the immutable manifest —
    # TIMESTAMP AS OF at exactly this instant must resolve to v2
    ts2 = tf._read_manifest(root, 2)["committed_at"]
    agg = (
        f"CAST(COUNT(*) AS BIGINT) AS n_rows, "
        f"CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users, "
        f"ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value"
    )
    return eng.sql(
        f"""
        SELECT CAST(1 AS BIGINT) AS version, {agg}
        FROM events_snap VERSION AS OF 1
        UNION ALL
        SELECT CAST(2 AS BIGINT) AS version, {agg}
        FROM events_snap TIMESTAMP AS OF {ts2!r}
        UNION ALL
        SELECT CAST(3 AS BIGINT) AS version, {agg}
        FROM events_snap
        ORDER BY version
        """
    )


def _partitioned_table(spark, sf_dir: str) -> str:
    """Install (once, fingerprint-cached, atomic) a PARTITIONED manifest
    table over events (partition_by=['event_type']): three commits —
    click, purchase, then the remaining types — so the manifest carries
    three segments with disjoint partition summaries (the shape
    segment-level skipping exists for)."""
    import os

    from s3_kinesis_replay_spark.operators.similarity import (
        atomic_cached_build,
        data_fingerprint,
    )
    from s3_kinesis_replay_spark.operators.table_format import (
        snapshot_write,
    )

    fp = data_fingerprint(os.path.join(sf_dir, "events.parquet"))[:10]
    ev = t(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )

    def build(tmp: str) -> None:
        snapshot_write(
            spark, ev.filter(F.col("event_type") == "click"), tmp,
            mode="overwrite", partition_by=["event_type"],
        )
        snapshot_write(
            spark, ev.filter(F.col("event_type") == "purchase"), tmp,
            mode="append", partition_by=["event_type"],
        )
        snapshot_write(
            spark,
            ev.filter(~F.col("event_type").isin("click", "purchase")),
            tmp, mode="append", partition_by=["event_type"],
        )

    return atomic_cached_build(
        "/tmp/skr_parttbl", f"{fp}-pt1", build, "_latest"
    )


@register(
    "a15l_partition_pruned_read",
    "A8",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value,
           TRUE AS pruned
    FROM events WHERE event_type = 'purchase'
    """,
    note="PARTITION-AWARE SNAPSHOTS (r13, VERDICT r12 item 5): "
    "snapshot_write(partition_by=[...]) lays each commit out one "
    "directory per partition tuple (Hive layout, columns kept in data "
    "so the read path is unchanged), records exact per-entry partition "
    "values in the segment and a distinct-tuple SUMMARY in the "
    "manifest's segment descriptor. A pruned read then applies the "
    "first filter every real table format applies: descriptors whose "
    "summary excludes the predicate are skipped WITHOUT LOADING — at "
    "100k files the per-entry min/max walk is itself O(files) driver "
    "work, and partition skipping bounds it to the matching partitions "
    "(Iceberg's manifest-list partition ranges). ENFORCED engine-side: "
    "the entry raises unless >=1 segment was skipped unloaded, zero "
    "footer fallbacks occurred, AND descriptor visits <= files in the "
    "matching partition (the VERDICT gate). The residual filter keeps "
    "row-level exactness, so a summary that wrongly excludes a "
    "matching segment loses rows and hash-mismatches against the "
    "recomputing oracle.",
)
def a15l_partition_pruned_read(spark, sf_dir):
    from s3_kinesis_replay_spark.operators import table_format as tf

    root = _partitioned_table(spark, sf_dir)
    m = tf._read_manifest(root, tf.latest_version(root))
    ctr: dict = {}
    df, n_read, n_total = tf.snapshot_read_pruned(
        spark, root, {"event_type": ("purchase", "purchase")}, counters=ctr
    )
    matching = len(
        [
            e
            for e in tf._entries(m, root)
            if e.get("partition", {}).get("event_type") == "purchase"
        ]
    )
    if (
        ctr["segments_skipped"] < 1
        or ctr["footer_fallbacks"]
        or ctr["descriptor_visits"] > matching
        or n_read != matching
    ):
        raise RuntimeError(
            "a15l gate FAILED: partition pruning must skip non-matching "
            "segments unloaded and visit at most the matching "
            f"partition's files — got {ctr} with {matching} matching of "
            f"{n_total} total files"
        )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        fdec(F.sum(sdec("value"))).alias("sum_value"),
    ).withColumn("pruned", F.lit(True))


def _days_partitioned_table(spark, sf_dir: str) -> str:
    """Install (once, fingerprint-cached, atomic) a days(ts)-partitioned
    manifest table over events, committed in two month-halves so a
    time-window read can skip one whole SEGMENT unloaded and then prune
    the loaded half to the matching days."""
    import os

    from s3_kinesis_replay_spark.operators.similarity import (
        atomic_cached_build,
        data_fingerprint,
    )
    from s3_kinesis_replay_spark.operators.table_format import (
        snapshot_write,
    )

    fp = data_fingerprint(os.path.join(sf_dir, "events.parquet"))[:10]
    ev = t(spark, "events", sf_dir).select(
        "event_id", "user_id", "ts", "value"
    )
    mid = "2024-01-16"

    def build(tmp: str) -> None:
        snapshot_write(
            spark, ev.filter(F.col("ts") < mid), tmp,
            mode="overwrite", partition_by=["days(ts)"],
        )
        snapshot_write(
            spark, ev.filter(F.col("ts") >= mid), tmp,
            mode="append", partition_by=["days(ts)"],
        )

    return atomic_cached_build(
        "/tmp/skr_daystbl", f"{fp}-dy1", build, "_latest"
    )


@register(
    "a15m_days_partition_scan",
    "A8",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value,
           TRUE AS pruned
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts < TIMESTAMP '2024-01-13 00:00:00'
    """,
    note="HIDDEN PARTITIONING on TIME (r13 — Iceberg's days() transform "
    "re-expressed): the table is laid out days(ts) WITHOUT a derived "
    "date column in the data (directory-encoded transform values only; "
    "the query still predicates on raw ts), committed in two "
    "month-half segments. A 3-day window read (a) skips the "
    "non-overlapping half-month SEGMENT without loading it — descriptor "
    "partition summaries, the manifest-list discipline — and (b) "
    "prunes the loaded half to exactly the 3 matching day partitions "
    "by EXACT transform value. This is the pruning tier parquet "
    "min/max cannot provide here at all: timestamp footer stats are "
    "deliberately not lifted into manifests (datetime is not a JSON "
    "scalar), so time predicates would otherwise scan every file. "
    "ENFORCED engine-side: raises unless >=1 segment skipped unloaded, "
    "files read <= the 3 days' files, zero footer fallbacks. The "
    "residual ts filter keeps row exactness; oracle recomputes from "
    "source. At 100 TB: days() is THE first filter of every "
    "time-series lakehouse — a day query touches O(day) metadata and "
    "data regardless of table age.",
)
def a15m_days_partition_scan(spark, sf_dir):
    import datetime as dtm

    from s3_kinesis_replay_spark.operators import table_format as tf

    root = _days_partitioned_table(spark, sf_dir)
    m = tf._read_manifest(root, tf.latest_version(root))
    lo = dtm.datetime(2024, 1, 10, 0, 0, 0)
    hi = dtm.datetime(2024, 1, 12, 23, 59, 59, 999999)
    ctr: dict = {}
    df, n_read, n_total = tf.snapshot_read_pruned(
        spark, root, {"ts": (lo, hi)}, counters=ctr
    )
    days = {"2024-01-10", "2024-01-11", "2024-01-12"}
    matching = len(
        [
            e
            for e in tf._entries(m, root)
            if e.get("partition", {}).get("days(ts)") in days
        ]
    )
    if (
        ctr["segments_skipped"] < 1
        or ctr["footer_fallbacks"]
        or n_read > matching
    ):
        raise RuntimeError(
            "a15m gate FAILED: days() pruning must skip the "
            "non-overlapping half-month segment unloaded and read at "
            f"most the 3 days' files — got {ctr}, {n_read} read of "
            f"{n_total} total, {matching} in-window files"
        )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        fdec(F.sum(sdec("value"))).alias("sum_value"),
    ).withColumn("pruned", F.lit(True))


def _pos_delete_table(spark, sf_dir: str) -> str:
    """Install (once, fingerprint-cached, atomic) the position-delete
    fixture: v1 = full events load; v2 = snapshot_delete_where on a
    predicate shape (no key identity involved); v3 = append of shifted
    copies MATCHING the deleted predicate — visible by file-identity
    scoping."""
    import os

    from s3_kinesis_replay_spark.operators.similarity import (
        atomic_cached_build,
        data_fingerprint,
    )
    from s3_kinesis_replay_spark.operators.table_format import (
        snapshot_delete_where,
        snapshot_write,
    )

    fp = data_fingerprint(os.path.join(sf_dir, "events.parquet"))[:10]
    ev = t(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    doomed = (F.col("event_type") == "click") & (F.col("user_id") % 7 == 0)

    def build(tmp: str) -> None:
        snapshot_write(spark, ev, tmp, mode="overwrite")
        snapshot_delete_where(
            spark, tmp, "event_type = 'click' AND user_id % 7 = 0"
        )
        snapshot_write(
            spark,
            ev.filter(doomed & (F.col("event_id") % 2 == 0)).withColumn(
                "event_id", F.col("event_id") + 30000000
            ),
            tmp,
            mode="append",
        )

    return atomic_cached_build(
        "/tmp/skr_posdeltbl", f"{fp}-pd1", build, "_latest"
    )


@register(
    "a15n_position_delete",
    "A8",
    f"""
    WITH surviving AS (
      SELECT event_id, user_id, value FROM events
      WHERE NOT (event_type = 'click' AND user_id % 7 = 0)
      UNION ALL
      SELECT event_id + 30000000, user_id, value FROM events
      WHERE event_type = 'click' AND user_id % 7 = 0 AND event_id % 2 = 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(MAX(event_id) AS BIGINT) AS max_event_id,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value
    FROM surviving
    """,
    note="POSITION-based MOR deletes (r13 — the other delete tier of "
    "the real formats, closing the repo's last documented omission): "
    "snapshot_delete_where deletes by exact row address (data file + "
    "_metadata.row_index, Spark 3.5+'s hidden file metadata) written "
    "as a position-delete file readers anti-join — the verb for rows "
    "WITHOUT key identity, where the equality tier cannot apply. "
    "Scoping is FILE IDENTITY, not sequence: v3 appends rows MATCHING "
    "the deleted predicate and they stay visible (new files are "
    "untouched by construction — Iceberg's position-delete rule), "
    "which the oracle's shifted-copy union recomputes exactly. Commit "
    "re-validates that every named file is still live, so a concurrent "
    "compact/overwrite refuses instead of silently deleting nothing. "
    "At 100 TB: O(matched rows) write, zero data rewrite, and the "
    "anti-join rent is broadcast-sized until compaction folds it — "
    "the same economics as the equality tier with addresses instead "
    "of keys.",
)
def a15n_position_delete(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.table_format import (
        snapshot_read,
    )

    root = _pos_delete_table(spark, sf_dir)
    return snapshot_read(spark, root).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.max("event_id").alias("max_event_id"),
        fdec(F.sum(sdec("value"))).alias("sum_value"),
    )


def _update_where_table(spark, sf_dir: str) -> str:
    """Install (once, fingerprint-cached, atomic) the UPDATE fixture:
    v1 = full events load; v2 = ONE atomic snapshot_update_where that
    triples the value of every signup event (predicate shape, no key)."""
    import os

    from s3_kinesis_replay_spark.operators.similarity import (
        atomic_cached_build,
        data_fingerprint,
    )
    from s3_kinesis_replay_spark.operators.table_format import (
        snapshot_update_where,
        snapshot_write,
    )

    fp = data_fingerprint(os.path.join(sf_dir, "events.parquet"))[:10]
    ev = t(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )

    def build(tmp: str) -> None:
        snapshot_write(spark, ev, tmp, mode="overwrite")
        snapshot_update_where(
            spark, tmp, "event_type = 'signup'", {"value": "value * 3"}
        )

    return atomic_cached_build(
        "/tmp/skr_updtbl", f"{fp}-uw1", build, "_latest"
    )


@register(
    "a15o_update_where",
    "A8",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(
             CASE WHEN event_type = 'signup' THEN value * 3 ELSE value END
           AS {DEC})) AS DOUBLE), 6) AS sum_value,
           ROUND(CAST(SUM(CAST(value AS {DEC}))
                 FILTER (WHERE event_type <> 'signup') AS DOUBLE), 6)
             AS sum_untouched
    FROM events
    """,
    note="UPDATE ... WHERE as ONE atomic MOR commit (r13 — the verb the "
    "position tier makes possible for rows WITHOUT key identity; MERGE "
    "covers keyed upserts): the commit simultaneously appends the "
    "matched rows with assignments applied and position-deletes their "
    "old copies — zero data rewrite, O(matched) write, time travel "
    "shows pre-update state, stale-address validation refuses after a "
    "concurrent compact/overwrite. The oracle recomputes the update as "
    "a CASE projection over the source, and separately pins the "
    "UNTOUCHED rows' sum, so an update that leaks to non-matching "
    "rows, double-applies (old copy not deleted), or drops rows "
    "hash-mismatches. At 100 TB: predicate updates (GDPR erasure "
    "rewrites, backfill corrections) cost O(matched) + one metadata "
    "commit, not a table rewrite.",
)
def a15o_update_where(spark, sf_dir):
    from s3_kinesis_replay_spark.operators.table_format import (
        snapshot_read,
    )

    root = _update_where_table(spark, sf_dir)
    return snapshot_read(spark, root).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        fdec(F.sum(sdec("value"))).alias("sum_value"),
        fdec(
            F.sum(
                F.when(
                    F.col("event_type") != "signup", sdec("value")
                )
            )
        ).alias("sum_untouched"),
    )

def _restore_table(spark, sf_dir: str) -> str:
    """Install (once, fingerprint-cached, atomic) the RESTORE fixture:
    v1 = full events load; v2 = fat-finger overwrite to purchases-only;
    v3 = snapshot_restore back to v1 — the undo every versioned table
    exists to make cheap."""
    import os

    from s3_kinesis_replay_spark.operators.similarity import (
        atomic_cached_build,
        data_fingerprint,
    )
    from s3_kinesis_replay_spark.operators.table_format import (
        snapshot_restore,
        snapshot_write,
    )

    fp = data_fingerprint(os.path.join(sf_dir, "events.parquet"))[:10]
    ev = t(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )

    def build(tmp: str) -> None:
        snapshot_write(spark, ev, tmp, mode="overwrite")
        snapshot_write(
            spark,
            ev.filter(F.col("event_type") == "purchase"),
            tmp,
            mode="overwrite",
        )
        snapshot_restore(tmp, 1)

    return atomic_cached_build(
        "/tmp/skr_restoretbl", f"{fp}-rs1", build, "_latest"
    )


@register(
    "a17_restore_rollback",
    "A8",
    f"""
    SELECT 'forensic_v2' AS state,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value
    FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT 'restored_latest',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT user_id) AS BIGINT),
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6)
    FROM events
    ORDER BY state
    """,
    note="RESTORE / ROLLBACK (r13 — Delta RESTORE VERSION AS OF / "
    "Iceberg rollback_to_snapshot, public designs): snapshot_restore "
    "undoes a fat-finger overwrite by committing a NEW manifest that "
    "carries the target snapshot's metadata VERBATIM — metadata-only "
    "(the gate asserts the restored manifest lists exactly v1's file "
    "paths, so zero data was moved or rewritten) and history-preserving "
    "(the entry's other branch still time-travels INTO the bad v2, the "
    "forensic trail). The oracle recomputes both states from source, "
    "so a restore that resurrects the wrong file set, loses delete "
    "state, or lands on the wrong version hash-mismatches. At 100 TB: "
    "undoing a bad commit costs O(manifest descriptors) — never a "
    "data copy — and the restored files become vacuum-reachable from "
    "the new latest again, so retention cannot eat the rollback target.",
)
def a17_restore_rollback(spark, sf_dir):
    from s3_kinesis_replay_spark.operators import table_format as tf

    root = _restore_table(spark, sf_dir)
    m1 = tf._read_manifest(root, 1)
    m3 = tf._read_manifest(root, 3)
    if m3["operation"] != "restore" or [
        d["path"] for d in m3.get("segments", [])
    ] != [d["path"] for d in m1.get("segments", [])]:
        raise RuntimeError(
            "a17 gate FAILED: restore must be a metadata-only commit "
            "carrying exactly the target version's segments — got "
            f"op={m3['operation']!r}, segments {m3.get('segments')} vs "
            f"target {m1.get('segments')}"
        )
    agg = [
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        fdec(F.sum(sdec("value"))).alias("sum_value"),
    ]
    forensic = (
        tf.snapshot_read(spark, root, 2)
        .agg(*agg)
        .select(F.lit("forensic_v2").alias("state"), "*")
    )
    restored = (
        tf.snapshot_read(spark, root)
        .agg(*agg)
        .select(F.lit("restored_latest").alias("state"), "*")
    )
    return forensic.unionByName(restored).orderBy("state")


def _tagged_table(spark, sf_dir: str) -> str:
    """Install (once, fingerprint-cached, atomic) the TAG fixture:
    the 3-version create/append/overwrite lifecycle, 'train_v1' tagged
    at v1, then an aggressive vacuum (keep_last=1, no age grace) —
    which must drop exactly v2: v3 is latest, v1 is pinned by the tag."""
    import os

    from s3_kinesis_replay_spark.operators.similarity import (
        atomic_cached_build,
        data_fingerprint,
    )
    from s3_kinesis_replay_spark.operators.table_format import (
        snapshot_tag,
        snapshot_vacuum,
        snapshot_write,
    )

    fp = data_fingerprint(os.path.join(sf_dir, "events.parquet"))[:10]
    ev = t(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )

    def build(tmp: str) -> None:
        snapshot_write(
            spark, ev.filter(F.col("event_id") < 5000), tmp, mode="overwrite"
        )
        snapshot_write(
            spark, ev.filter(F.col("event_id") >= 5000), tmp, mode="append"
        )
        snapshot_write(
            spark,
            ev.filter(F.col("event_type") == "purchase"),
            tmp,
            mode="overwrite",
        )
        snapshot_tag(tmp, "train_v1", 1)
        snapshot_vacuum(tmp, keep_last=1, min_age_s=0)

    return atomic_cached_build(
        "/tmp/skr_taggedtbl", f"{fp}-tg1", build, "_latest"
    )


@register(
    "a18_tag_protected_travel",
    "A8",
    f"""
    SELECT 'latest' AS branch,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value
    FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT 'tagged',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT user_id) AS BIGINT),
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6)
    FROM events WHERE event_id < 5000
    ORDER BY branch
    """,
    note="NAMED REFS AS RETENTION ROOTS (r13 — Iceberg tags): "
    "snapshot_tag pins 'train_v1' at v1, then a keep_last=1 vacuum "
    "runs — and must drop exactly v2: v3 is the latest, v1 is pinned "
    "(the gate asserts retained versions == [1, 3]). The entry then "
    "reads the pinned snapshot BY NAME through the SQL surface "
    "(engine.sql \"VERSION AS OF 'train_v1'\" — catalog resolves the "
    "quoted spec via the table's refs, Iceberg's Spark SQL behavior) "
    "and the latest, in one statement. The oracle recomputes both from "
    "source, so a vacuum that eats the pinned snapshot's files, a tag "
    "resolving to the wrong version, or a rewrite miss "
    "hash-mismatches. This is the reproducibility verb of a 100 TB "
    "corpus: 'the exact snapshot run X trained on' survives arbitrary "
    "churn for one JSON ref, instead of depending on nobody ever "
    "running retention.",
)
def a18_tag_protected_travel(spark, sf_dir):
    from s3_kinesis_replay_spark.engine import Engine
    from s3_kinesis_replay_spark.operators import table_format as tf

    root = _tagged_table(spark, sf_dir)
    retained = tf.versions(root)
    if retained != [1, 3] or tf.list_tags(root) != {"train_v1": 1}:
        raise RuntimeError(
            "a18 gate FAILED: keep_last=1 vacuum must retain exactly "
            "the latest (v3) plus the tagged v1 — got retained "
            f"{retained}, tags {tf.list_tags(root)}"
        )
    eng = Engine(spark, sf_dir=sf_dir)
    eng.register_snapshot_table("events_tagged", root)
    agg = (
        "CAST(COUNT(*) AS BIGINT) AS n_rows, "
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users, "
        f"ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value"
    )
    return eng.sql(
        f"""
        SELECT 'latest' AS branch, {agg} FROM events_tagged
        UNION ALL
        SELECT 'tagged' AS branch, {agg}
        FROM events_tagged VERSION AS OF 'train_v1'
        ORDER BY branch
        """
    )


def _clustered_table(spark, sf_dir: str) -> str:
    """Install (once, fingerprint-cached, atomic) the OPTIMIZE fixture:
    v1 = events ROUND-ROBIN shuffled into 8 files (ingest-ordered worst
    case: every file spans the whole event_id AND user_id range, so
    min/max stats prune nothing); v2 = snapshot_cluster sorted on
    event_id; v3 = snapshot_cluster Z-ORDERED on (event_id, user_id)."""
    import os

    from s3_kinesis_replay_spark.operators.similarity import (
        atomic_cached_build,
        data_fingerprint,
    )
    from s3_kinesis_replay_spark.operators.table_format import (
        snapshot_cluster,
        snapshot_write,
    )

    fp = data_fingerprint(os.path.join(sf_dir, "events.parquet"))[:10]
    ev = t(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )

    def build(tmp: str) -> None:
        snapshot_write(spark, ev.repartition(8), tmp, mode="overwrite")
        snapshot_cluster(spark, tmp, ["event_id"], target_files=8)
        snapshot_cluster(
            spark, tmp, ["event_id", "user_id"], target_files=16, zorder=True
        )

    return atomic_cached_build(
        "/tmp/skr_clustertbl", f"{fp}-cl1", build, "_latest"
    )


@register(
    "a19_clustered_pruning",
    "A8",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value,
           TRUE AS clustered
    FROM events WHERE event_id BETWEEN 100 AND 199
    """,
    note="OPTIMIZE / CLUSTERED REWRITE (r13 — Delta OPTIMIZE ZORDER's "
    "sort tier / Iceberg sort-order rewrite): manifest min/max stats "
    "are only as good as the LAYOUT — the fixture's v1 is the "
    "ingest-ordered worst case (hash-shuffled, every file spans the "
    "whole event_id range) and the gate FIRST asserts stats prune "
    "nothing there (reads all 8 files), THEN that after "
    "snapshot_cluster (range-partition + sort on event_id, pure "
    "built-ins: repartitionByRange stays in codegen) the same 1%-range "
    "predicate reads at most 2 of 8 files. Time travel makes "
    "before/after measurable on ONE table — the pruned read at v1 is "
    "the control. The oracle recomputes the range aggregate, so a "
    "rewrite that loses or duplicates rows hash-mismatches. At 100 TB "
    "this is the difference between a point query touching O(files) "
    "and O(selectivity x files): clustering is what turns the a15f "
    "zero-footer pruning machinery into actual I/O savings.",
)
def a19_clustered_pruning(spark, sf_dir):
    from s3_kinesis_replay_spark.operators import table_format as tf

    root = _clustered_table(spark, sf_dir)
    preds = {"event_id": (100, 199)}
    _, n_before, t_before = tf.snapshot_read_pruned(spark, root, preds, version=1)
    df, n_after, t_after = tf.snapshot_read_pruned(spark, root, preds, version=2)
    if n_before < t_before or n_after > 2:
        raise RuntimeError(
            "a19 gate FAILED: the shuffled v1 must prune nothing "
            f"(got {n_before}/{t_before}) and the clustered v2 must "
            f"read <=2 files (got {n_after}/{t_after})"
        )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        fdec(F.sum(sdec("value"))).alias("sum_value"),
    ).withColumn("clustered", F.lit(True))


@register(
    "a19b_zorder_pruning",
    "A8",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value,
           TRUE AS zordered
    FROM events WHERE event_id BETWEEN 0 AND 499 AND user_id BETWEEN 0 AND 3
    """,
    note="Z-ORDER clustering (r13): a two-dimensional predicate box "
    "defeats single-column sorting — sorting by event_id alone leaves "
    "every file spanning all user_ids, so the user_id bound prunes "
    "nothing. snapshot_cluster(zorder=True) range-partitions on an "
    "interleaved-bit MORTON key (the public bit-twiddling identity, "
    "pure JVM shifts/masks in codegen; each column min/max-scaled to "
    "16 bits — value-scaled, not rank-scaled, the documented trade) so "
    "BOTH columns' per-file ranges narrow. The gate asserts the "
    "z-ordered v3 reads strictly fewer files for the box than the "
    "ingest-shuffled v1 (which reads all) AND at most half the files. "
    "Oracle recomputes the box aggregate — a Morton key that permutes "
    "rows wrongly (losing/duplicating any) hash-mismatches. At 100 TB: "
    "multi-dimension point lookups (time x tenant, id x shard) are the "
    "norm, and Z-order is the standard public answer to pruning on "
    "more than one column at once.",
)
def a19b_zorder_pruning(spark, sf_dir):
    from s3_kinesis_replay_spark.operators import table_format as tf

    root = _clustered_table(spark, sf_dir)
    preds = {"event_id": (0, 499), "user_id": (0, 3)}
    _, n_before, t_before = tf.snapshot_read_pruned(spark, root, preds, version=1)
    df, n_after, t_after = tf.snapshot_read_pruned(spark, root, preds, version=3)
    if n_before < t_before or n_after >= n_before or n_after > t_after // 2:
        raise RuntimeError(
            "a19b gate FAILED: the shuffled v1 must prune nothing "
            f"(got {n_before}/{t_before}) and the z-ordered v3 must "
            f"read fewer, <= half its files (got {n_after}/{t_after})"
        )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        fdec(F.sum(sdec("value"))).alias("sum_value"),
    ).withColumn("zordered", F.lit(True))


def _materialize_and_cleanup(spark, df, root: str):
    """Collect a SMALL (aggregate-sized) result eagerly and remove the
    live-build tempdir table behind it — the a21/a22/a23 entries build
    a fresh table per run BY DESIGN (mutation/refusal semantics need
    unshared state), and returning a lazy plan over those files would
    leak one events copy per run forever (review r13). The collect is
    bounded: every caller passes a single-row (or few-row) aggregate."""
    import shutil

    rows = df.collect()
    shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, df.schema)


@register(
    "a21_check_constraints",
    "A8",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value,
           CAST(1 AS BIGINT) AS n_constraints
    FROM events
    """,
    note="CHECK CONSTRAINTS (r13 — Delta's ALTER TABLE ADD CONSTRAINT, "
    "public design): snapshot_set_constraint records a named SQL CHECK "
    "expression in the manifest after validating EXISTING data (one "
    "scan); every row-adding writer then validates its WRITTEN files "
    "in one JVM-side conditional-count pass and refuses the commit on "
    "violation. This entry builds a live table, sets a constraint, "
    "proves a violating append is refused ATOMICALLY (the gate asserts "
    "the version did not advance — no partial state), then completes "
    "the table with a valid append; the oracle recomputes the final "
    "aggregate from source, so enforcement that silently dropped or "
    "admitted rows would hash-mismatch. Constraints survive overwrite/"
    "compact/cluster/restore (carried like the schema), and the "
    "session-less raw append path refuses constraint-bearing tables "
    "unless the caller declares its batch validated. At 100 TB: "
    "enforcement is O(batch) per write — one aggregate over the fresh "
    "files, zero reads of the existing table — which is the only "
    "enforcement cost profile an always-on ingest can afford.",
)
def a21_check_constraints(spark, sf_dir):
    import tempfile

    from s3_kinesis_replay_spark.operators import table_format as tf

    ev = t(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="skr_constbl_")
    tf.snapshot_write(
        spark, ev.filter(F.col("event_id") < 5000), root, mode="overwrite"
    )
    tf.snapshot_set_constraint(
        spark, root, "eid_nonneg", "event_id IS NOT NULL AND event_id >= 0"
    )
    v_before = tf.latest_version(root)
    try:
        tf.snapshot_write(
            spark,
            ev.filter(F.col("event_id") < 5000).withColumn(
                "event_id", -F.col("event_id") - F.lit(1).cast("bigint")
            ),
            root,
            mode="append",
        )
        raise RuntimeError(
            "a21 gate FAILED: a constraint-violating append was accepted"
        )
    except tf.ConstraintViolation:
        pass
    if tf.latest_version(root) != v_before:
        raise RuntimeError(
            "a21 gate FAILED: refused append still advanced the version "
            f"({v_before} -> {tf.latest_version(root)})"
        )
    tf.snapshot_write(
        spark, ev.filter(F.col("event_id") >= 5000), root, mode="append"
    )
    n_cons = len(tf.table_constraints(root))
    out = tf.snapshot_read(spark, root).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        fdec(F.sum(sdec("value"))).alias("sum_value"),
        F.lit(n_cons).cast("bigint").alias("n_constraints"),
    )
    # live-build entry: materialize the one-row result so the tempdir
    # table can be removed NOW instead of leaking one events copy per
    # run (review r13) — the returned frame must outlive the files
    return _materialize_and_cleanup(spark, out, root)


@register(
    "a22_wap_branch_publish",
    "A8",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value,
           TRUE AS published
    FROM events
    """,
    note="WRITE-AUDIT-PUBLISH (r13 — Iceberg's WAP / branch refs, "
    "public design): snapshot_branch forks a separate manifest lineage "
    "over the SHARED data dir; branch writes stage rows invisible to "
    "main readers (the gate asserts main still reads the pre-branch "
    "count while the branch reads the full set — the audit step); "
    "snapshot_publish fast-forwards main with ONE metadata-only commit "
    "whose base is the recorded fork point, so the create-exclusive "
    "manifest link at fork+1 IS the WAP conflict check — the entry "
    "proves it by forking a second branch at the same point and "
    "asserting its publish raises CommitConflict AFTER the first "
    "landed (nothing silently overwritten). The oracle recomputes the "
    "published state from source, so a publish that loses staged rows, "
    "double-publishes, or leaks the conflicted branch hash-mismatches. "
    "At 100 TB: staging a day's ingest costs its own files only, the "
    "audit reads cost snapshot reads, and publish costs O(descriptors) "
    "— the quality-gated pipeline pattern (validate BEFORE production "
    "readers see rows) with zero data copies.",
)
def a22_wap_branch_publish(spark, sf_dir):
    import tempfile

    from s3_kinesis_replay_spark.operators import table_format as tf

    ev = t(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="skr_waptbl_")
    lo = ev.filter(F.col("event_id") % 2 == 0)
    hi = ev.filter(F.col("event_id") % 2 == 1)
    tf.snapshot_write(spark, lo, root, mode="overwrite")
    n_lo = tf.snapshot_read(spark, root).count()
    tf.snapshot_branch(root, "staging")
    tf.snapshot_write(spark, hi, root, mode="append", branch="staging")
    # AUDIT: staged rows visible on the branch, invisible on main
    if tf.snapshot_read(spark, root).count() != n_lo:
        raise RuntimeError(
            "a22 gate FAILED: branch write leaked into main before publish"
        )
    tf.snapshot_branch(root, "doomed")
    tf.snapshot_write(
        spark, hi.limit(7), root, mode="append", branch="doomed"
    )
    tf.snapshot_publish(root, "staging")
    try:
        tf.snapshot_publish(root, "doomed")
        raise RuntimeError(
            "a22 gate FAILED: conflicting publish over an advanced main "
            "was accepted"
        )
    except tf.CommitConflict:
        pass
    out = tf.snapshot_read(spark, root).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        fdec(F.sum(sdec("value"))).alias("sum_value"),
    ).withColumn("published", F.lit(True))
    return _materialize_and_cleanup(spark, out, root)


@register(
    "a23_sql_dml",
    "A8",
    f"""
    WITH inserted AS (
      SELECT event_id, user_id, event_type, value FROM events
    ),
    after_delete AS (
      SELECT * FROM inserted
      WHERE NOT (event_type = 'click' AND user_id % 10 = 0)
    ),
    after_update AS (
      SELECT event_id, user_id, event_type,
             CASE WHEN event_type = 'signup' THEN value * 2 ELSE value END
               AS value
      FROM after_delete
    ),
    after_merge AS (
      SELECT event_id, user_id, event_type, value
      FROM after_update WHERE event_id >= 50
      UNION ALL
      SELECT event_id, user_id, 'merged' AS event_type, -1.0 AS value
      FROM events WHERE event_id < 50
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value,
           CAST(COUNT(*) FILTER (WHERE event_type = 'merged') AS BIGINT)
             AS n_merged
    FROM after_merge
    """,
    note="SQL DML SURFACE over registered snapshot tables (r13 — the "
    "write half of the a16 catalog surface; Delta ships these as "
    "parser extensions, a temp-view catalog has no hook, so "
    "catalog.resolve_dml recognizes the statements): ONE Engine drives "
    "CREATE TABLE ... LOCATION ... AS SELECT (genesis commit + "
    "registration), INSERT INTO ... SELECT (append commit, "
    "assignment-cast to the recorded schema), DELETE ... WHERE "
    "(position MOR delete), UPDATE "
    "... SET ... WHERE (atomic MOR update), and MERGE INTO ... USING "
    "(...) ON key (atomic upsert) — each one atomic commit through the "
    "table operators, each re-registering the view so the next "
    "statement reads the committed state. The oracle replays the exact "
    "four-statement sequence as CTE algebra over the source, so a DML "
    "that hits the wrong rows, double-applies, breaks sequencing, or "
    "leaks the refused path hash-mismatches. At 100 TB the costs are "
    "the operators': O(batch) insert, O(matched) delete/update/merge, "
    "zero table rewrites — 'switch your queries over' now includes the "
    "writes.",
)
def a23_sql_dml(spark, sf_dir):
    import tempfile

    from s3_kinesis_replay_spark.engine import Engine
    from s3_kinesis_replay_spark.operators import table_format as tf

    root = tempfile.mkdtemp(prefix="skr_dmltbl_")
    eng = Engine(spark, sf_dir=sf_dir)
    # the full lifecycle starts in SQL too: CTAS = genesis commit +
    # registration in one statement (refuses a non-empty LOCATION)
    eng.sql(
        f"CREATE TABLE events_dml LOCATION '{root}' AS "
        "SELECT event_id, user_id, event_type, value FROM events "
        "WHERE event_id < 5000"
    )
    eng.sql(
        "INSERT INTO events_dml "
        "SELECT event_id, user_id, event_type, value FROM events "
        "WHERE event_id >= 5000"
    )
    eng.sql(
        "DELETE FROM events_dml "
        "WHERE event_type = 'click' AND user_id % 10 = 0"
    )
    eng.sql(
        "UPDATE events_dml SET value = value * 2 "
        "WHERE event_type = 'signup'"
    )
    eng.sql(
        "MERGE INTO events_dml USING ("
        "SELECT event_id, user_id, 'merged' AS event_type, "
        "CAST(-1.0 AS DOUBLE) AS value FROM events WHERE event_id < 50"
        ") ON event_id"
    )
    ops = [
        r["operation"]
        for r in tf.snapshot_history(spark, root).collect()
    ]
    if ops != ["overwrite", "append", "pos_delete", "update", "merge"]:
        raise RuntimeError(
            f"a23 gate FAILED: expected one atomic commit per DML "
            f"statement, got history {ops}"
        )
    out = eng.sql(
        f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6)
                 AS sum_value,
               CAST(COUNT(CASE WHEN event_type = 'merged' THEN 1 END)
                 AS BIGINT) AS n_merged
        FROM events_dml
        """
    )
    return _materialize_and_cleanup(spark, out, root)


@register(
    "a23b_sql_merge_clauses",
    "A8",
    """
    WITH base AS (
      SELECT event_id, user_id, event_type, CAST(value AS DOUBLE) AS value
      FROM events WHERE event_id < 8000
    ),
    src AS (
      SELECT event_id, user_id, CAST(value AS DOUBLE) AS value
      FROM events WHERE event_id >= 6000
    ),
    kept AS (
      SELECT * FROM base WHERE event_id >= 100 AND event_id < 6000
    ),
    boosted AS (
      SELECT b.event_id, b.user_id, 'boosted' AS event_type,
             s.value * 2 AS value
      FROM base b JOIN src s ON b.event_id = s.event_id
      WHERE COALESCE(s.value > 50, FALSE)
    ),
    inserted AS (
      SELECT event_id, user_id, 'merged' AS event_type, value
      FROM src WHERE event_id >= 8000 AND event_id % 3 = 0
    )
    SELECT * FROM kept
    UNION ALL SELECT * FROM boosted
    UNION ALL SELECT * FROM inserted
    """,
    note="SQL MERGE CLAUSE FORMS (r15, VERDICT r14 item 3 — the "
    "statement every Delta/Iceberg SQL user writes first): `MERGE INTO "
    "t USING (q) ON key WHEN MATCHED [AND c] THEN UPDATE SET …/DELETE, "
    "WHEN NOT MATCHED [AND c] THEN INSERT */(cols) VALUES (…), WHEN "
    "NOT MATCHED BY SOURCE [AND c] THEN DELETE` parses to an ordered "
    "clause list and rewrites onto ONE atomic MOR commit "
    "(snapshot_merge_clauses): eligible matched rows per clause — "
    "first-match-wins, NULL conditions don't match — become updated "
    "copies or tombstoned keys; NOT MATCHED source rows insert; NOT "
    "MATCHED BY SOURCE target rows tombstone. Conditions/SET exprs are "
    "Spark SQL over aliases t/s. Refusals: SET on the merge key, "
    "partially-affected duplicate keys, ambiguous source keys; no "
    "auto-retry on conflict (verdicts are evaluated against one "
    "target version — the compact rule). The oracle replays the "
    "conditional merge as CTE algebra: update-with-condition, the "
    "condition's ELSE falling to a matched DELETE, a conditional "
    "INSERT, and an NBS DELETE all land in one commit whose final "
    "state must hash-match. Row-level CDC classifies the commit "
    "correctly (tombstones without postimages are deletes, r15 "
    "extension to batch + streaming). At 100 TB: O(source + matched) "
    "with broadcast source keys, zero table rewrite.",
)
def a23b_sql_merge_clauses(spark, sf_dir):
    import tempfile

    from s3_kinesis_replay_spark.engine import Engine
    from s3_kinesis_replay_spark.operators import table_format as tf

    root = tempfile.mkdtemp(prefix="skr_mrgctbl_")
    eng = Engine(spark, sf_dir=sf_dir)
    eng.sql(
        f"CREATE TABLE events_mrgc LOCATION '{root}' AS "
        "SELECT event_id, user_id, event_type, "
        "CAST(value AS DOUBLE) AS value "
        "FROM events WHERE event_id < 8000"
    )
    eng.sql(
        """
        MERGE INTO events_mrgc USING (
          SELECT event_id, user_id, CAST(value AS DOUBLE) AS value
          FROM events WHERE event_id >= 6000
        ) ON event_id
        WHEN MATCHED AND s.value > 50
          THEN UPDATE SET value = s.value * 2, event_type = 'boosted'
        WHEN MATCHED THEN DELETE
        WHEN NOT MATCHED AND s.event_id % 3 = 0
          THEN INSERT (event_id, user_id, event_type, value)
               VALUES (s.event_id, s.user_id, 'merged', s.value)
        WHEN NOT MATCHED BY SOURCE AND t.event_id < 100 THEN DELETE
        """
    )
    ops = [
        r["operation"] for r in tf.snapshot_history(spark, root).collect()
    ]
    if ops != ["overwrite", "merge"]:
        raise RuntimeError(
            f"a23b gate FAILED: expected one atomic commit for the "
            f"whole clause statement, got history {ops}"
        )
    out = eng.sql(
        "SELECT event_id, user_id, event_type, value FROM events_mrgc"
    )
    return _materialize_and_cleanup(spark, out, root)


@register(
    "a23c_composite_key_merge",
    "A8",
    """
    WITH base AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6)
               AS sv
      FROM events WHERE event_id < 6000 GROUP BY user_id, event_type
    ),
    src AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6)
               AS sv
      FROM events WHERE event_id >= 6000 GROUP BY user_id, event_type
    ),
    m AS (
      SELECT b.user_id, b.event_type, b.n, b.sv, s.n AS sn, s.sv AS ssv
      FROM base b JOIN src s
        ON b.user_id = s.user_id AND b.event_type = s.event_type
    ),
    ins AS (
      SELECT s.* FROM src s WHERE NOT EXISTS (
        SELECT 1 FROM base b
        WHERE b.user_id = s.user_id AND b.event_type = s.event_type)
    ),
    nbs AS (
      SELECT b.* FROM base b WHERE NOT EXISTS (
        SELECT 1 FROM src s
        WHERE s.user_id = b.user_id AND s.event_type = b.event_type)
    )
    SELECT user_id, event_type, n, sv,
           'update_preimage' AS _change_type,
           CAST(2 AS BIGINT) AS _commit_version
    FROM m WHERE ssv > sv
    UNION ALL SELECT user_id, event_type, n + sn, sv + ssv,
           'update_postimage', CAST(2 AS BIGINT) FROM m WHERE ssv > sv
    UNION ALL SELECT user_id, event_type, n, sv,
           'delete', CAST(2 AS BIGINT) FROM m WHERE NOT (ssv > sv)
    UNION ALL SELECT user_id, event_type, n, sv,
           'insert', CAST(2 AS BIGINT) FROM ins
    UNION ALL SELECT user_id, event_type, n, sv,
           'delete', CAST(2 AS BIGINT) FROM nbs WHERE n < 3
    """,
    note="COMPOSITE (MULTI-COLUMN) ROW IDENTITY (r16, VERDICT r15 item "
    "2 — the first thing a real Delta/Iceberg MERGE user hits): the "
    "whole MOR tier — snapshot_delete / snapshot_merge / "
    "snapshot_merge_clauses / read-side anti-joins / row+streaming CDC "
    "/ the kidx sorted-hash sidecars — now takes an ORDERED key-column "
    "LIST; `MERGE INTO t USING (q) ON t.a = s.a AND t.b = s.b` parses "
    "the equality conjunction to the composite identity "
    "(catalog._parse_merge_on; mismatched names and non-equalities "
    "refuse loudly). The manifest keeps the bare-string form for "
    "single-column tables, so every existing lineage and ledger hash "
    "is untouched; composite tables store the list, tombstone files "
    "store ALL key columns, readers anti-join on the column set, and "
    "kidx sidecars hash the TUPLE (per-column hashes folded in key "
    "order, write-side numpy == probe-side scalar). This entry builds "
    "a (user_id, event_type)-keyed summary through the SQL catalog, "
    "runs a four-clause composite MERGE (conditional UPDATE, matched "
    "DELETE, INSERT *, conditional NBS DELETE), gates the identity "
    "recorded in the manifest + single-commit atomicity, and returns "
    "the batch ROW-LEVEL CDC feed across the merge — hash-matched "
    "against the CTE replay of the same clause algebra. At 100 TB: "
    "identical economics to a23b (O(source + affected), zero table "
    "rewrite); per-column stats pruning conjuncts across key columns, "
    "which only SHRINKS candidate sets.",
)
def a23c_composite_key_merge(spark, sf_dir):
    import tempfile

    from s3_kinesis_replay_spark.engine import Engine
    from s3_kinesis_replay_spark.operators import table_format as tf

    root = tempfile.mkdtemp(prefix="skr_compkey_")
    eng = Engine(spark, sf_dir=sf_dir)
    eng.sql(
        f"CREATE TABLE events_ck LOCATION '{root}' AS "
        "SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n, "
        "ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS sv "
        "FROM events WHERE event_id < 6000 GROUP BY user_id, event_type"
    )
    eng.sql(
        """
        MERGE INTO events_ck USING (
          SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE),
                       6) AS sv
          FROM events WHERE event_id >= 6000 GROUP BY user_id, event_type
        ) ON t.user_id = s.user_id AND t.event_type = s.event_type
        WHEN MATCHED AND s.sv > t.sv
          THEN UPDATE SET sv = t.sv + s.sv, n = t.n + s.n
        WHEN MATCHED THEN DELETE
        WHEN NOT MATCHED THEN INSERT *
        WHEN NOT MATCHED BY SOURCE AND t.n < 3 THEN DELETE
        """
    )
    ops = [
        r["operation"] for r in tf.snapshot_history(spark, root).collect()
    ]
    if ops != ["overwrite", "merge"]:
        raise RuntimeError(
            f"a23c gate FAILED: expected one atomic commit, got {ops}"
        )
    m = tf._read_manifest(root, tf.latest_version(root))
    if m.get("delete_key") != ["user_id", "event_type"]:
        raise RuntimeError(
            "a23c gate FAILED: manifest row identity is "
            f"{m.get('delete_key')!r}, expected the ordered composite "
            "['user_id', 'event_type']"
        )
    out = tf.snapshot_row_changes(spark, root, 1, 2).select(
        "user_id", "event_type", "n", "sv",
        "_change_type", "_commit_version",
    )
    return _materialize_and_cleanup(spark, out, root)


@register(
    "a27_replace_where",
    "A8",
    """
    WITH base AS (
      SELECT event_id, user_id, event_type, CAST(value AS DOUBLE) AS value
      FROM events WHERE event_id < 8000
    ),
    repl AS (
      SELECT user_id * 100000 + 7 AS event_id, user_id,
             'click' AS event_type,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6)
               AS value
      FROM base WHERE event_type = 'click' GROUP BY user_id
    )
    SELECT event_id, user_id, event_type, value,
           'delete' AS _change_type, CAST(2 AS BIGINT) AS _commit_version
    FROM base WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, user_id, event_type, value,
           'insert', CAST(2 AS BIGINT)
    FROM repl
    """,
    note="SELECTIVE OVERWRITE — Delta's replaceWhere (r16): `INSERT "
    "INTO t REPLACE WHERE pred (q)` / snapshot_overwrite_where "
    "atomically replaces EXACTLY the predicate's slice with the "
    "source rows in ONE commit — the backfill verb at 100 TB "
    "(rewrite one day of a petabyte table without scanning the "
    "rest): matched current rows position-delete (zero data "
    "rewrite), replacement files land under the table's recorded "
    "partition spec, cost O(matched-file positions + new data). The "
    "Delta rule is enforced: every incoming row must satisfy the "
    "predicate (refused otherwise — a row outside it would silently "
    "survive the NEXT replace of the same slice); NULL predicate "
    "rows neither match nor are accepted. Row/streaming CDC classify "
    "the commit as delete + insert (no row identity links the old "
    "slice to its replacement — Delta CDF's classification); time "
    "travel shows the pre-replace state; the same stale-address "
    "validation as DELETE WHERE refuses over a concurrent "
    "compact/overwrite. The entry collapses the 'click' slice to "
    "one aggregate row per user through the SQL verb, gates single-"
    "commit atomicity, the predicate-violation refusal, and time "
    "travel, and returns the row-level CDC feed across the replace — "
    "hash-matched against the CTE replay (old slice as deletes, "
    "aggregated replacement as inserts). INSERT OVERWRITE t (q) "
    "ships alongside as the catalog's full-table overwrite.",
)
def a27_replace_where(spark, sf_dir):
    import tempfile

    from s3_kinesis_replay_spark.engine import Engine
    from s3_kinesis_replay_spark.operators import table_format as tf

    root = tempfile.mkdtemp(prefix="skr_rw_")
    eng = Engine(spark, sf_dir=sf_dir)
    eng.sql(
        f"CREATE TABLE events_rw LOCATION '{root}' AS "
        "SELECT event_id, user_id, event_type, "
        "CAST(value AS DOUBLE) AS value "
        "FROM events WHERE event_id < 8000"
    )
    base_n = eng.sql("SELECT COUNT(*) AS n FROM events_rw").collect()[0]["n"]
    eng.sql(
        """
        INSERT INTO events_rw REPLACE WHERE event_type = 'click'
        SELECT user_id * 100000 + 7 AS event_id, user_id,
               'click' AS event_type,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6)
                 AS value
        FROM events WHERE event_id < 8000 AND event_type = 'click'
        GROUP BY user_id
        """
    )
    ops = [
        r["operation"] for r in tf.snapshot_history(spark, root).collect()
    ]
    if ops != ["overwrite", "overwrite_where"]:
        raise RuntimeError(
            f"a27 gate FAILED: expected one atomic replace commit, "
            f"got history {ops}"
        )
    try:
        eng.sql(
            "INSERT INTO events_rw REPLACE WHERE event_type = 'click' "
            "VALUES (1, 1, 'view', 0.0)"
        )
        raise RuntimeError(
            "a27 gate FAILED: a replacement row OUTSIDE the predicate "
            "was accepted"
        )
    except ValueError:
        pass
    if tf.snapshot_read(spark, root, 1).count() != base_n:
        raise RuntimeError(
            "a27 gate FAILED: time travel to the pre-replace version "
            "does not show the original slice"
        )
    out = tf.snapshot_row_changes(spark, root, 1, 2).select(
        "event_id", "user_id", "event_type", "value",
        "_change_type", "_commit_version",
    )
    return _materialize_and_cleanup(spark, out, root)


@register(
    "a28_shallow_clone",
    "A8",
    """
    WITH base AS (
      SELECT event_id, user_id, event_type, CAST(value AS DOUBLE) AS value
      FROM events WHERE event_id < 6000
    ),
    kept AS (
      SELECT * FROM base WHERE event_id % 5 <> 0
    ),
    cloned AS (
      SELECT event_id, user_id, event_type,
             CASE WHEN event_type = 'click' THEN value * 2 ELSE value END
               AS value
      FROM kept
    )
    SELECT 'src' AS side, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6)
             AS sv
    FROM kept
    UNION ALL
    SELECT 'clone', CAST(COUNT(*) AS BIGINT),
           ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6)
    FROM cloned
    """,
    note="SHALLOW CLONE (r16): `CREATE TABLE t2 LOCATION p SHALLOW "
    "CLONE t [VERSION AS OF v|'tag']` / snapshot_clone forks a table "
    "with ZERO data bytes copied — the experimentation verb at 100 TB "
    "('a writable copy of prod' must not mean copying 100 TB). Every "
    "data/delete/pos-delete file plus kidx and CDC-plan sidecars is "
    "HARD-LINKED (same inode; EXDEV falls back per-file to copy) and "
    "the manifest+segment chain to the clone point is copied verbatim "
    "(entry paths are root-relative), so the clone keeps the source's "
    "whole retained history — time travel, batch/streaming CDC, "
    "DESCRIBE HISTORY, and tags at or before the clone point all work "
    "on the clone, richer than Delta's shallow clone (whose history "
    "starts at the clone commit). The tables then evolve "
    "independently: fresh-uuid file names can never collide, and "
    "vacuum on either side unlinks only that root's directory "
    "entries — the shared inode survives until the last referent "
    "drops it (the local-FS analogue of the reference counting / "
    "absolute-path-reference design an object store needs). The entry "
    "CTAS-builds a table, position-deletes a slice, clones through "
    "the SQL verb, doubles 'click' values ON THE CLONE ONLY, and "
    "gates: the source head did not move, the clone time-travels to "
    "pre-delete state, the clone's files share inodes with the "
    "source's, and both final states hash-match the CTE replay of "
    "the two divergent lineages. Cost: O(files) metadata ops, zero "
    "data I/O.",
)
def a28_shallow_clone(spark, sf_dir):
    import os as _os
    import shutil as _shutil
    import tempfile

    from s3_kinesis_replay_spark.engine import Engine
    from s3_kinesis_replay_spark.operators import table_format as tf

    root = tempfile.mkdtemp(prefix="skr_clsrc_")
    root2 = _os.path.join(tempfile.mkdtemp(prefix="skr_cldst_"), "t")
    eng = Engine(spark, sf_dir=sf_dir)
    eng.sql(
        f"CREATE TABLE events_cl LOCATION '{root}' AS "
        "SELECT event_id, user_id, event_type, "
        "CAST(value AS DOUBLE) AS value "
        "FROM events WHERE event_id < 6000"
    )
    eng.sql("DELETE FROM events_cl WHERE event_id % 5 = 0")
    eng.sql(
        f"CREATE TABLE events_cl2 LOCATION '{root2}' "
        "SHALLOW CLONE events_cl"
    )
    eng.sql(
        "UPDATE events_cl2 SET value = value * 2 "
        "WHERE event_type = 'click'"
    )
    if tf.latest_version(root) != 2:
        raise RuntimeError(
            "a28 gate FAILED: the clone's commit moved the SOURCE head "
            f"(source at v{tf.latest_version(root)}, expected 2)"
        )
    if tf.latest_version(root2) != 3:
        raise RuntimeError(
            f"a28 gate FAILED: clone head v{tf.latest_version(root2)}, "
            "expected inherited v2 + one update = v3"
        )
    n_base = eng.sql(
        "SELECT COUNT(*) AS n FROM events_cl2 VERSION AS OF 1"
    ).collect()[0]["n"]
    if n_base != tf.snapshot_read(spark, root, 1).count():
        raise RuntimeError(
            "a28 gate FAILED: clone time travel to v1 does not show "
            "the pre-delete state"
        )
    ent = tf._entries(tf._read_manifest(root2, 2), root2)[0]
    st_src = _os.stat(_os.path.join(root, ent["path"]))
    st_cl = _os.stat(_os.path.join(root2, ent["path"]))
    if st_src.st_ino != st_cl.st_ino:
        raise RuntimeError(
            "a28 gate FAILED: cloned data file is a copy, not a "
            "hard link — the clone moved data bytes"
        )
    out = eng.sql(
        """
        SELECT 'src' AS side, CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6)
                 AS sv
        FROM events_cl
        UNION ALL
        SELECT 'clone', CAST(COUNT(*) AS BIGINT),
               ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6)
        FROM events_cl2
        """
    )
    rows = out.collect()
    _shutil.rmtree(root, ignore_errors=True)
    _shutil.rmtree(_os.path.dirname(root2), ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


@register(
    "a29_convert_in_place",
    "A8",
    """
    WITH plain AS (
      SELECT event_id, user_id, event_type, CAST(value AS DOUBLE) AS value
      FROM events WHERE event_id < 7000
    ),
    kept AS (
      SELECT * FROM plain WHERE event_id % 7 <> 0
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6)
             AS sv
    FROM kept GROUP BY event_type
    """,
    note="IN-PLACE CONVERSION (r16 — Delta's `CONVERT TO DELTA "
    "parquet.`path``, the migration verb): `CONVERT TO TABLE t "
    "LOCATION p` / snapshot_convert adopts an EXISTING plain-parquet "
    "directory as a snapshot table by committing a v1 manifest that "
    "references the files where they already sit — zero bytes "
    "rewritten, O(files) footer reads for stats; at 100 TB this is "
    "adopting the format today vs a week-long rewrite. After "
    "conversion every verb applies (DML, MERGE, CDC, constraints, "
    "clone, time travel from the conversion point). Hive-partitioned "
    "layouts refuse loudly (their partition values live only in "
    "directory names, which the explicit-file-list readers cannot "
    "reproduce — CTAS with partition_by is the stated path). The "
    "sibling `CREATE TABLE t LOCATION p (col type, ...)` declared-"
    "schema empty-table form also ships this round (schema-validated "
    "metadata-only v1; typed empty reads; first INSERT is v2). The "
    "entry writes an events slice as PLAIN parquet, converts it, "
    "gates zero-rewrite (inode identity) + the conversion op, deletes "
    "a slice through ordinary DML, and hash-matches the surviving "
    "aggregate state against the CTE replay.",
)
def a29_convert_in_place(spark, sf_dir):
    import os as _os
    import tempfile

    from s3_kinesis_replay_spark.engine import Engine
    from s3_kinesis_replay_spark.operators import table_format as tf

    root = tempfile.mkdtemp(prefix="skr_cvt_")
    t(spark, "events", sf_dir).where("event_id < 7000").selectExpr(
        "event_id", "user_id", "event_type",
        "CAST(value AS DOUBLE) AS value",
    ).write.mode("overwrite").parquet(_os.path.join(root, "ingested"))
    inodes = {
        p: _os.stat(p).st_ino
        for p in (
            _os.path.join(dp, f)
            for dp, _d, fs in _os.walk(root)
            for f in fs
            if f.endswith(".parquet")
        )
    }
    eng = Engine(spark, sf_dir=sf_dir)
    eng.sql(f"CONVERT TO TABLE events_cvt LOCATION '{root}'")
    m = tf._read_manifest(root, 1)
    if m["operation"] != "convert" or len(tf._entries(m, root)) != len(
        inodes
    ):
        raise RuntimeError(
            f"a29 gate FAILED: op={m['operation']!r}, "
            f"{len(tf._entries(m, root))} entries vs {len(inodes)} files"
        )
    if any(_os.stat(p).st_ino != i for p, i in inodes.items()):
        raise RuntimeError(
            "a29 gate FAILED: conversion rewrote data files"
        )
    eng.sql("DELETE FROM events_cvt WHERE event_id % 7 = 0")
    out = eng.sql(
        """
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6)
                 AS sv
        FROM events_cvt GROUP BY event_type
        """
    )
    return _materialize_and_cleanup(spark, out, root)


@register(
    "a25d_column_defaults",
    "A8",
    """
    WITH base AS (
      SELECT event_id, user_id, CAST(value AS DOUBLE) AS value
      FROM events WHERE event_id < 5000
    ),
    aug AS (
      SELECT event_id, user_id, value,
             CASE WHEN value > 90 THEN 'hot' ELSE 'legacy' END AS tier
      FROM base
    ),
    fresh AS (
      SELECT event_id, user_id, CAST(value AS DOUBLE) AS value,
             'fresh' AS tier
      FROM events WHERE event_id >= 5000 AND event_id < 6000
    ),
    allr AS (
      SELECT * FROM aug UNION ALL SELECT * FROM fresh
    )
    SELECT tier, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6)
             AS sv
    FROM allr GROUP BY tier
    """,
    note="INITIAL COLUMN DEFAULTS (r16 — Iceberg's initial-default / "
    "Delta 3.x column defaults, SEQUENCE-SCOPED): `ALTER TABLE t ADD "
    "COLUMN c type DEFAULT constant` records the constant in the "
    "manifest; rows in files written BEFORE the commit read the "
    "default instead of NULL — EXACTLY those files (they physically "
    "cannot contain the column; retired-name reuse is refused, so no "
    "stored NULL is misread as absence). Files written after are "
    "never touched: a post-add writer's stored NULL, or an omitted "
    "column under narrower-append evolution, reads NULL (the "
    "write-default is the writer's job — Iceberg's split). The read "
    "path era-groups entries exactly like the delete-horizon "
    "grouping, so default-free tables keep their single-scan plan; "
    "batch AND streaming CDC surface identical preimages (the "
    "evaluated constant rides the manifest so arrow workers need no "
    "SparkSession); rename moves the default, drop kills it, compact "
    "materializes it; non-deterministic (rand()) and non-primitive "
    "defaults refuse at declare time — the constant is double-"
    "evaluated as the determinism check. The entry adds a defaulted "
    "tier column over an events slice, UPDATEs a sub-slice THROUGH "
    "the default-visible predicate, inserts post-default rows, and "
    "hash-matches the tier aggregate against the CTE replay.",
)
def a25d_column_defaults(spark, sf_dir):
    import tempfile

    from s3_kinesis_replay_spark.engine import Engine
    from s3_kinesis_replay_spark.operators import table_format as tf

    root = tempfile.mkdtemp(prefix="skr_dflt_")
    eng = Engine(spark, sf_dir=sf_dir)
    eng.sql(
        f"CREATE TABLE events_dflt LOCATION '{root}' AS "
        "SELECT event_id, user_id, CAST(value AS DOUBLE) AS value "
        "FROM events WHERE event_id < 5000"
    )
    eng.sql(
        "ALTER TABLE events_dflt ADD COLUMN tier STRING DEFAULT 'legacy'"
    )
    m = tf._read_manifest(root, 2)
    if m["operation"] != "add_column" or m.get(
        "column_defaults", {}
    ).get("tier", {}).get("value") != "legacy":
        raise RuntimeError(
            "a25d gate FAILED: ADD COLUMN DEFAULT must be one "
            f"metadata commit recording the constant — got {m.get('column_defaults')}"
        )
    if "tier" in tf.snapshot_read(spark, root, 1).columns:
        raise RuntimeError(
            "a25d gate FAILED: time travel below the add shows the column"
        )
    # the UPDATE's predicate sees the default on pre-add rows
    eng.sql(
        "UPDATE events_dflt SET tier = 'hot' "
        "WHERE tier = 'legacy' AND value > 90"
    )
    eng.sql(
        "INSERT INTO events_dflt "
        "SELECT event_id, user_id, CAST(value AS DOUBLE) AS value, "
        "'fresh' AS tier "
        "FROM events WHERE event_id >= 5000 AND event_id < 6000"
    )
    out = eng.sql(
        """
        SELECT tier, CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6)
                 AS sv
        FROM events_dflt GROUP BY tier
        """
    )
    return _materialize_and_cleanup(spark, out, root)


@register(
    "a26_minor_compaction",
    "A8",
    """
    WITH e AS (
      SELECT event_id, user_id, CAST(value AS DOUBLE) AS value
      FROM events WHERE event_id < 8500
    )
    SELECT event_id, user_id, value FROM e
    WHERE NOT (event_id % 9 = 0 AND event_id < 8000)
    """,
    note="MINOR (BIN-PACKING) COMPACTION (r16): `OPTIMIZE t BINPACK` / "
    "snapshot_compact_small rewrites ONLY the live files below a size "
    "threshold into fewer larger ones — the maintenance a 100 TB "
    "table actually runs; the full COW compact rewrites the whole "
    "table and is a non-starter at scale. Picked files' VISIBLE rows "
    "are materialized through the ordinary MOR read (their applicable "
    "deletes fold in), the new files commit past every existing "
    "delete, and untouched files keep their entries, sequences, and "
    "exact delete applicability (partially-picked segments rewrite "
    "minus the picked entries, keeping the descriptor's sequence). "
    "Row-preserving: batch + streaming CDC pass through with zero "
    "events, and the clause-merge conflict check re-links over it. "
    "The entry builds one big file + 8 small appends, deletes keys "
    "across BOTH eras, bin-packs with a threshold that spares the big "
    "file, and gates: the big file's path survives verbatim, every "
    "small file left the live set, file count shrank accordingly, a "
    "post-compact CDC feed sees zero compaction events and exactly "
    "the later append's inserts, and the final state hash-matches the "
    "oracle (a rewrite that resurrected a deleted row or dropped a "
    "live one mismatches). `OPTIMIZE t BINPACK ... WHERE day = 'x'` "
    "(r16, late) scopes the pick to ONE partition by recorded "
    "partition value — bin-pack yesterday's partition, not the "
    "table. Cost at 100 TB: O(small files picked) + "
    "O(live-file metadata) — never a table rewrite.",
)
def a26_minor_compaction(spark, sf_dir):
    import os as _os
    import tempfile

    from s3_kinesis_replay_spark.operators import table_format as tf

    ev = t(spark, "events", sf_dir).select(
        "event_id", "user_id", F.col("value").cast("double").alias("value")
    )
    root = tempfile.mkdtemp(prefix="skr_binpack_")
    tf.snapshot_write(
        spark, ev.filter(F.col("event_id") < 6000).coalesce(1), root,
        "overwrite",
    )  # v1: the one BIG file
    for i in range(8):  # v2..v9: small appends
        lo = 6000 + i * 250
        tf.snapshot_write(
            spark,
            ev.filter(
                (F.col("event_id") >= lo) & (F.col("event_id") < lo + 250)
            ).coalesce(1),
            root,
            "append",
        )
    tf.snapshot_delete(
        spark,
        root,
        ev.filter(
            (F.col("event_id") % 9 == 0) & (F.col("event_id") < 8000)
        ).select("event_id"),
        "event_id",
    )  # v10: keys in BOTH eras
    m_before = tf._read_manifest(root, 10)
    ents_before = tf._entries(m_before, root)
    sizes = {
        e["path"]: _os.path.getsize(_os.path.join(root, e["path"]))
        for e in ents_before
    }
    big = [p for p, s in sizes.items() if s >= 30_000]
    small = [p for p, s in sizes.items() if s < 30_000]
    if len(big) != 1 or len(small) != 8:
        raise RuntimeError(
            f"a26 fixture drift: {len(big)} big / {len(small)} small "
            f"files, sizes {sorted(sizes.values())}"
        )
    v = tf.snapshot_compact_small(
        spark, root, small_bytes=30_000, min_files=4
    )  # v11
    if v != 11:
        raise RuntimeError(f"a26 gate FAILED: compacted at v{v}")
    ents_after = tf._entries(tf._read_manifest(root, v), root)
    paths_after = {e["path"] for e in ents_after}
    if big[0] not in paths_after:
        raise RuntimeError(
            "a26 gate FAILED: the big file was rewritten — minor "
            "compaction must not touch files above the threshold"
        )
    if set(small) & paths_after:
        raise RuntimeError("a26 gate FAILED: a picked small file survived")
    if not (1 < len(ents_after) < len(ents_before) - 4):
        raise RuntimeError(
            f"a26 gate FAILED: {len(ents_before)} -> {len(ents_after)} "
            "files (expected a real shrink)"
        )
    tf.snapshot_write(
        spark,
        ev.filter(
            (F.col("event_id") >= 8000) & (F.col("event_id") < 8500)
        ).coalesce(1),
        root,
        "append",
    )  # v12
    cdc = tf.snapshot_row_changes(spark, root, 10, 12)
    agg = cdc.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    got = {r["_change_type"]: r["n"] for r in agg}
    if got != {"insert": 500}:
        raise RuntimeError(
            f"a26 gate FAILED: CDC across the compaction read {got}, "
            "expected zero compaction events + 500 inserts"
        )
    out = tf.snapshot_read(spark, root).select(
        "event_id", "user_id", "value"
    )
    return _materialize_and_cleanup(spark, out, root)


def _orc_table(spark, sf_dir: str) -> str:
    """Install (once, fingerprint-cached, atomic) an ORC copy of
    lineitem — the other columnar format Spark ships a native
    vectorized reader for."""
    import os

    from s3_kinesis_replay_spark.operators.similarity import (
        atomic_cached_build,
        data_fingerprint,
    )

    fp = data_fingerprint(os.path.join(sf_dir, "lineitem.parquet"))[:10]

    def build(tmp: str) -> None:
        t(spark, "lineitem", sf_dir).write.mode("overwrite").orc(
            os.path.join(tmp, "lineitem.orc")
        )
        open(os.path.join(tmp, "_done"), "w").write("1")

    return atomic_cached_build("/tmp/skr_orctbl", f"{fp}-orc1", build, "_done")


@register(
    "a24_orc_scan",
    "A1",
    "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem "
    "WHERE l_quantity > 45",
    note="ORC scan (r13) — the second columnar format with a native "
    "vectorized Spark reader, same pushdown discipline as the parquet "
    "twin a1: the predicate and 4-column projection reach the OrcScan "
    "(PushedFilters + narrowed ReadSchema), so at 100 TB an ORC lake "
    "pays exactly the parquet economics — column pruning + predicate "
    "skipping at the stripe level. The fixture is a staged ORC copy of "
    "lineitem; the oracle recomputes from the parquet source, so a "
    "lossy type mapping (decimal/timestamp width drift between the "
    "formats) or a reader that drops rows hash-mismatches. Avro was "
    "probed and is NOT in this container (external spark-avro jar) — "
    "environmental, like the media codecs.",
)
def a24_orc_scan(spark, sf_dir):
    import os

    root = _orc_table(spark, sf_dir)
    return (
        spark.read.orc(os.path.join(root, "lineitem.orc"))
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )


@register(
    "a25_sql_ddl",
    "A8",
    f"""
    WITH base AS (
      SELECT event_id, user_id, event_type, value FROM events
      WHERE event_id < 8000
    ),
    ins1 AS (
      SELECT event_id, user_id, event_type, value FROM events
      WHERE event_id >= 8000
    ),
    pre_evolution AS (
      SELECT * FROM base UNION ALL SELECT * FROM ins1
    ),
    ins2 AS (
      SELECT event_id + 1000000 AS event_id, user_id,
             'ddl' AS event_type, value, 0.5 AS quality
      FROM events WHERE event_id < 100
    ),
    ins3 AS (
      SELECT CAST(-1 AS BIGINT) AS event_id, CAST(0 AS BIGINT) AS user_id,
             'neg' AS event_type, CAST(0.0 AS DOUBLE) AS value,
             CAST(NULL AS DOUBLE) AS quality
    ),
    final AS (
      SELECT event_id, user_id, event_type, value,
             CAST(NULL AS DOUBLE) AS quality
      FROM pre_evolution
      UNION ALL SELECT * FROM ins2
      UNION ALL SELECT * FROM ins3
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value,
           CAST(COUNT(quality) AS BIGINT) AS n_quality,
           CAST(COUNT(CASE WHEN event_id < 0 THEN 1 END) AS BIGINT) AS n_neg
    FROM final
    """,
    note="SQL DDL SURFACE (r14, VERDICT item 4 — Delta's ALTER TABLE "
    "verbs as public design): catalog.resolve_dml adds ALTER TABLE ... "
    "ADD CONSTRAINT name CHECK (expr) / DROP CONSTRAINT name (driving "
    "snapshot_set_constraint / snapshot_drop_constraint) and ALTER "
    "TABLE ... ADD COLUMN c type (snapshot_add_column: METADATA-ONLY "
    "schema evolution — zero data files touched; readers pin the "
    "manifest schema and NULL-fill pre-evolution files per file). One "
    "Engine drives the whole lifecycle in SQL: CTAS, ADD CONSTRAINT, a "
    "violating INSERT refused ATOMICALLY (gate: version unchanged), a "
    "valid INSERT, ADD COLUMN, an INSERT populating the new column, "
    "DROP CONSTRAINT, and an INSERT the dropped constraint would have "
    "refused. The gate asserts exactly one atomic commit per statement "
    "(history op sequence pinned); the oracle replays the sequence as "
    "CTE algebra over the source, so enforcement that admits/drops the "
    "wrong rows, an evolution that loses or mistypes the column, or a "
    "drop that fails to release hash-mismatches. At 100 TB: every DDL "
    "here is O(metadata) — constraint validation of existing data is "
    "the one O(table) scan (same as Delta), enforcement afterwards is "
    "O(batch) per write, and add-column rewrites nothing.",
)
def a25_sql_ddl(spark, sf_dir):
    import tempfile

    from s3_kinesis_replay_spark.engine import Engine
    from s3_kinesis_replay_spark.operators import table_format as tf

    root = tempfile.mkdtemp(prefix="skr_ddltbl_")
    eng = Engine(spark, sf_dir=sf_dir)
    eng.sql(
        f"CREATE TABLE events_ddl LOCATION '{root}' AS "
        "SELECT event_id, user_id, event_type, value FROM events "
        "WHERE event_id < 8000"
    )
    eng.sql(
        "ALTER TABLE events_ddl ADD CONSTRAINT eid_ok CHECK (event_id >= 0)"
    )
    v_before = tf.latest_version(root)
    try:
        eng.sql("INSERT INTO events_ddl VALUES (-5, 0, 'bad', 1.0)")
        raise RuntimeError(
            "a25 gate FAILED: constraint-violating INSERT was accepted"
        )
    except tf.ConstraintViolation:
        pass
    if tf.latest_version(root) != v_before:
        raise RuntimeError(
            "a25 gate FAILED: refused INSERT still advanced the version"
        )
    eng.sql(
        "INSERT INTO events_ddl "
        "SELECT event_id, user_id, event_type, value FROM events "
        "WHERE event_id >= 8000"
    )
    eng.sql("ALTER TABLE events_ddl ADD COLUMN quality double")
    eng.sql(
        "INSERT INTO events_ddl "
        "SELECT event_id + 1000000 AS event_id, user_id, "
        "'ddl' AS event_type, value, CAST(0.5 AS DOUBLE) AS quality "
        "FROM events WHERE event_id < 100"
    )
    eng.sql("ALTER TABLE events_ddl DROP CONSTRAINT eid_ok")
    eng.sql("INSERT INTO events_ddl VALUES (-1, 0, 'neg', 0.0, NULL)")
    ops = [
        r["operation"]
        for r in tf.snapshot_history(spark, root).collect()
    ]
    if ops != [
        "overwrite", "set_constraint", "append", "add_column",
        "append", "drop_constraint", "append",
    ]:
        raise RuntimeError(
            f"a25 gate FAILED: expected one atomic commit per "
            f"statement, got history {ops}"
        )
    out = eng.sql(
        f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6)
                 AS sum_value,
               CAST(COUNT(quality) AS BIGINT) AS n_quality,
               CAST(COUNT(CASE WHEN event_id < 0 THEN 1 END) AS BIGINT)
                 AS n_neg
        FROM events_ddl
        """
    )
    return _materialize_and_cleanup(spark, out, root)


@register(
    "a22b_branch_sql_read",
    "A8",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value,
           TRUE AS audited_in_sql
    FROM events
    """,
    note="BRANCH-AWARE SQL READS (r14, VERDICT item 5 — Iceberg's "
    "branch refs in SQL, public design): resolve_time_travel adds "
    "`tbl VERSION AS OF 'branch:<name>'`, resolving the WAP branch's "
    "CURRENT head through the ordinary snapshot read and re-registered "
    "per query (branch heads move, unlike pinned snapshots) — so the "
    "AUDIT step of write-audit-publish is plain SQL: stage on a "
    "branch, run validation queries against `VERSION AS OF "
    "'branch:staging'`, publish only when they pass. The gate asserts "
    "the branch read sees staged+main rows while the MAIN view still "
    "reads pre-stage state (isolation both ways), audits in SQL, then "
    "publishes; the oracle recomputes the published state from source, "
    "so a branch read that leaks into main, misses staged rows, or a "
    "publish that diverges from what was audited hash-mismatches. The "
    "CLI twin is `table read --root R --branch B`. At 100 TB the "
    "audit costs exactly a snapshot read of the branch head — zero "
    "data copies, same files, different manifest lineage.",
)
def a22b_branch_sql_read(spark, sf_dir):
    import tempfile

    from s3_kinesis_replay_spark.engine import Engine
    from s3_kinesis_replay_spark.operators import table_format as tf

    root = tempfile.mkdtemp(prefix="skr_wapsql_")
    eng = Engine(spark, sf_dir=sf_dir)
    ev = t(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    lo = ev.filter(F.col("event_id") % 2 == 0)
    hi = ev.filter(F.col("event_id") % 2 == 1)
    tf.snapshot_write(spark, lo, root, mode="overwrite")
    eng.register_snapshot_table("events_wap", root)
    n_lo = eng.sql("SELECT COUNT(*) AS n FROM events_wap").collect()[0]["n"]
    tf.snapshot_branch(root, "staging")
    tf.snapshot_write(spark, hi, root, mode="append", branch="staging")
    # the AUDIT, in SQL: branch head sees staged + main rows ...
    n_branch = eng.sql(
        "SELECT COUNT(*) AS n FROM events_wap VERSION AS OF "
        "'branch:staging'"
    ).collect()[0]["n"]
    # ... while the registered main view still reads pre-stage state
    n_main = eng.sql("SELECT COUNT(*) AS n FROM events_wap").collect()[0]["n"]
    n_all = ev.count()
    if n_branch != n_all or n_main != n_lo:
        raise RuntimeError(
            f"a22b gate FAILED: branch/main isolation broken "
            f"(branch={n_branch}, main={n_main}, lo={n_lo}, all={n_all})"
        )
    tf.snapshot_publish(root, "staging")
    eng.register_snapshot_table("events_wap", root)  # published head
    out = eng.sql(
        f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6)
                 AS sum_value,
               TRUE AS audited_in_sql
        FROM events_wap
        """
    )
    return _materialize_and_cleanup(spark, out, root)


@register(
    "a25b_column_evolution",
    "A8",
    """
    WITH e AS (
      SELECT event_id, user_id, CAST(value AS DOUBLE) AS value FROM events
    ),
    v1 AS (
      SELECT event_id, value, CAST(NULL AS VARCHAR) AS comment
      FROM e WHERE event_id < 1000
    ),
    v3 AS (
      SELECT event_id, value, 'n' || CAST(event_id AS VARCHAR)
      FROM e WHERE event_id >= 1000 AND event_id < 2000
    ),
    v5 AS (
      SELECT event_id, value, 'c' || CAST(event_id AS VARCHAR)
      FROM e WHERE event_id >= 2000 AND event_id < 2500
    )
    SELECT * FROM v1
    UNION ALL SELECT * FROM v3
    UNION ALL SELECT * FROM v5
    """,
    note="FULL COLUMN-EVOLUTION TRIO (r15, VERDICT r14 item 4 — "
    "Iceberg/Delta users expect add + rename + drop): RENAME COLUMN is "
    "a METADATA-ONLY commit recording a NAME MAPPING (the field-id "
    "analogue): readers extend the pinned scan schema with the alias "
    "chain and coalesce, so files written before the rename project "
    "their bytes under the new name — one scan, zero rewrite, exact "
    "because retired names refuse reuse at commit. DROP COLUMN removes "
    "the schema entry and RETIRES the name (+aliases): re-adding "
    "before a compact would resurrect stale file bytes, so it refuses; "
    "compact rewrites to the current schema and clears the mapping. "
    "Time travel reads every version under ITS schema; CDC maps "
    "pre-rename commits' rows; constraint/partition/delete-key "
    "references refuse the evolution at commit; per-file streaming "
    "refuses mapped tables loudly (projection is by name). The entry "
    "drives add → populate → rename → populate-under-new-name → drop "
    "through SQL, gates the per-version schemas and the refusals, and "
    "hash-compares the final state (old file bytes readable under the "
    "renamed column) against the CTE replay.",
)
def a25b_column_evolution(spark, sf_dir):
    import tempfile

    from s3_kinesis_replay_spark.engine import Engine
    from s3_kinesis_replay_spark.operators import table_format as tf

    root = tempfile.mkdtemp(prefix="skr_evotbl_")
    eng = Engine(spark, sf_dir=sf_dir)
    eng.sql(
        f"CREATE TABLE events_evo LOCATION '{root}' AS "
        "SELECT event_id, user_id, CAST(value AS DOUBLE) AS value "
        "FROM events WHERE event_id < 1000"
    )  # v1
    eng.sql("ALTER TABLE events_evo ADD COLUMN note string")  # v2
    eng.sql(
        "INSERT INTO events_evo "
        "SELECT event_id, user_id, CAST(value AS DOUBLE) AS value, "
        "CONCAT('n', CAST(event_id AS STRING)) AS note "
        "FROM events WHERE event_id >= 1000 AND event_id < 2000"
    )  # v3
    eng.sql("ALTER TABLE events_evo RENAME COLUMN note TO comment")  # v4
    eng.sql(
        "INSERT INTO events_evo "
        "SELECT event_id, user_id, CAST(value AS DOUBLE) AS value, "
        "CONCAT('c', CAST(event_id AS STRING)) AS comment "
        "FROM events WHERE event_id >= 2000 AND event_id < 2500"
    )  # v5
    eng.sql("ALTER TABLE events_evo DROP COLUMN user_id")  # v6

    # gates: each version reads under ITS schema; refusals hold
    want = {
        1: ["event_id", "user_id", "value"],
        3: ["event_id", "user_id", "value", "note"],
        5: ["event_id", "user_id", "value", "comment"],
        6: ["event_id", "value", "comment"],
    }
    for v, cols in want.items():
        got = tf.snapshot_read(spark, root, v).columns
        if got != cols:
            raise RuntimeError(
                f"a25b gate FAILED: v{v} columns {got}, expected {cols}"
            )
    for stmt in (
        "ALTER TABLE events_evo ADD COLUMN user_id string",  # retired
        "ALTER TABLE events_evo ADD COLUMN note string",  # renamed-away
    ):
        try:
            eng.sql(stmt)
            raise RuntimeError(f"a25b gate FAILED: {stmt!r} was accepted")
        except ValueError:
            pass
    eng.sql(
        "ALTER TABLE events_evo ADD CONSTRAINT c_ok CHECK "
        "(comment IS NULL OR LENGTH(comment) > 1)"
    )
    try:
        eng.sql("ALTER TABLE events_evo RENAME COLUMN comment TO remark")
        raise RuntimeError(
            "a25b gate FAILED: rename of a constraint-referenced column "
            "was accepted"
        )
    except ValueError:
        pass
    out = eng.sql("SELECT event_id, value, comment FROM events_evo")
    return _materialize_and_cleanup(spark, out, root)


@register(
    "a25c_type_widening",
    "A8",
    """
    WITH e AS (SELECT event_id FROM events WHERE event_id < 3000)
    SELECT event_id,
           CAST(event_id % 100 AS BIGINT) AS cnt,
           CAST(event_id AS DOUBLE) / 2 AS val,
           CASE WHEN event_id < 2500 THEN CAST(event_id AS DOUBLE)
                ELSE CAST(event_id AS DOUBLE) + 0.25 END AS amt
    FROM e
    """,
    note="SAFE TYPE WIDENING (r16, VERDICT r15 item 5 — Iceberg/Delta "
    "both version these promotions): `ALTER TABLE t ALTER COLUMN c "
    "TYPE wider` commits METADATA ONLY — the recorded schema entry "
    "changes type in place, zero files rewritten; readers pin the "
    "manifest schema and the Spark 4 parquet reader up-casts old "
    "files' narrower physical type natively (int32 under bigint, "
    "float under double, decimal rescale — probed in this container; "
    "SPARK-40876's widening reads are what Delta's own type-widening "
    "feature rides on). The lattice: integer rank-up, float->double, "
    "date->timestamp_ntz, decimal growth keeping scale and integer "
    "digits; NARROWING and lateral changes refuse loudly (the a15h "
    "rule with the safe subset carved out). Appends may keep writing "
    "the old NARROWER type — _merge_schema accepts widenable-to-"
    "recorded input and keeps the wide type (this entry's v3 appends "
    "an int/float/decimal(10,2) frame after cnt widened to bigint). "
    "Time travel reads each version under ITS schema (gated); batch "
    "row CDC aligns every commit to the feed end's widest schema "
    "(gated: 3000 inserts across versions {1,3,6}); LIVE widening "
    "mid-stream refuses in both streaming sources (pinned schema "
    "predates it) while backlog widenings pass. Final state "
    "hash-matches the CTE replay in the widened types.",
)
def a25c_type_widening(spark, sf_dir):
    import tempfile

    from s3_kinesis_replay_spark.engine import Engine
    from s3_kinesis_replay_spark.operators import table_format as tf

    root = tempfile.mkdtemp(prefix="skr_widentbl_")
    eng = Engine(spark, sf_dir=sf_dir)
    eng.sql(
        f"CREATE TABLE events_wide LOCATION '{root}' AS "
        "SELECT event_id, CAST(event_id % 100 AS INT) AS cnt, "
        "CAST(event_id / 2 AS FLOAT) AS val, "
        "CAST(event_id AS DECIMAL(10,2)) AS amt "
        "FROM events WHERE event_id < 1500"
    )  # v1: narrow shape
    eng.sql("ALTER TABLE events_wide ALTER COLUMN cnt TYPE bigint")  # v2
    # v3: append the OLD narrow shape AFTER the widening — accepted,
    # recorded type stays wide, pinned read casts the bytes up
    ev = t(spark, "events", sf_dir).select("event_id")
    tf.snapshot_write(
        spark,
        ev.filter(
            (F.col("event_id") >= 1500) & (F.col("event_id") < 2500)
        ).select(
            "event_id",
            (F.col("event_id") % 100).cast("int").alias("cnt"),
            (F.col("event_id") / 2).cast("float").alias("val"),
            F.col("event_id").cast("decimal(10,2)").alias("amt"),
        ),
        root,
        "append",
    )
    eng.sql(
        "ALTER TABLE events_wide ALTER COLUMN val SET DATA TYPE double"
    )  # v4
    eng.sql(
        "ALTER TABLE events_wide ALTER COLUMN amt TYPE decimal(16,4)"
    )  # v5
    eng.sql(
        "INSERT INTO events_wide "
        "SELECT event_id, CAST(event_id % 100 AS BIGINT) AS cnt, "
        "CAST(event_id AS DOUBLE) / 2 AS val, "
        "CAST(event_id + 0.25 AS DECIMAL(16,4)) AS amt "
        "FROM events WHERE event_id >= 2500 AND event_id < 3000"
    )  # v6: the wide shape
    # gates: time travel reads each version under ITS schema
    want = {
        1: ["int", "float", "decimal(10,2)"],
        3: ["bigint", "float", "decimal(10,2)"],
        6: ["bigint", "double", "decimal(16,4)"],
    }
    for v, types in want.items():
        got = [
            f.dataType.simpleString()
            for f in tf.snapshot_read(spark, root, v).schema.fields
            if f.name in ("cnt", "val", "amt")
        ]
        if got != types:
            raise RuntimeError(
                f"a25c gate FAILED: v{v} types {got}, expected {types}"
            )
    # unsafe changes still refuse
    for stmt in (
        "ALTER TABLE events_wide ALTER COLUMN cnt TYPE int",  # narrow
        "ALTER TABLE events_wide ALTER COLUMN val TYPE bigint",  # lateral
        "ALTER TABLE events_wide ALTER COLUMN amt TYPE decimal(16,2)",
    ):
        try:
            eng.sql(stmt)
            raise RuntimeError(f"a25c gate FAILED: {stmt!r} was accepted")
        except ValueError:
            pass
    # batch row CDC crosses the widenings, aligned to the widest schema
    cdc = tf.snapshot_row_changes(spark, root, 0, tf.latest_version(root))
    agg = cdc.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("_commit_version").alias("nv"),
        F.count(F.when(F.col("_change_type") != "insert", 1)).alias("nx"),
    ).collect()[0]
    if (agg["n"], agg["nv"], agg["nx"]) != (3000, 3, 0):
        raise RuntimeError(
            f"a25c gate FAILED: CDC across the widening read "
            f"{agg['n']} rows / {agg['nv']} versions / {agg['nx']} "
            "non-inserts, expected (3000, 3, 0)"
        )
    out = eng.sql(
        "SELECT event_id, cnt, val, CAST(amt AS DOUBLE) AS amt "
        "FROM events_wide"
    )
    return _materialize_and_cleanup(spark, out, root)


@register(
    "a15v_partition_spec_evolution",
    "A8",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value,
           TRUE AS pruned
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
      AND ts < TIMESTAMP '2024-01-08 00:00:00'
    """,
    note="PARTITION SPEC EVOLUTION (r16, VERDICT r15 item 6 — "
    "Iceberg's spec evolution, public design): `ALTER TABLE t SET "
    "PARTITION SPEC (bucket(8, user_id))` is ONE metadata-only commit "
    "moving the authoritative spec; old files keep the per-entry "
    "partition values of THE SPEC THEY WERE WRITTEN UNDER (days(ts) "
    "era), new SQL INSERTs lay out under the new spec "
    "(snapshot_write(partition_by='table') follows the recorded "
    "pointer), and pruned reads consult each entry's own recorded "
    "values — BOTH eras prune, zero rewrite. Gated a19-style: a 3-day "
    "ts window must read exactly (matching days(ts) files + the "
    "bucket era, which a ts predicate cannot prune) with zero footer "
    "fallbacks, and a user_id point read must keep at most (days era "
    "+ the one matching bucket's files). The returned aggregate runs "
    "over the ts-window pruned read, so a pruning bug that drops a "
    "row (not just a skipped-file bug) hash-mismatches the oracle. "
    "At 100 TB this is how a table re-partitions as its query mix "
    "shifts — time-first ingest, key-first serving — without "
    "rewriting history.",
)
def a15v_partition_spec_evolution(spark, sf_dir):
    import datetime as dtm
    import tempfile

    from s3_kinesis_replay_spark import catalog as cat
    from s3_kinesis_replay_spark.operators import table_format as tf

    from s3_kinesis_replay_spark.engine import Engine

    root = tempfile.mkdtemp(prefix="skr_specevo_")
    eng = Engine(spark, sf_dir=sf_dir)  # registers the fixture views
    ev = t(spark, "events", sf_dir).select(
        "event_id", "user_id", "ts", "value"
    )
    tf.snapshot_write(
        spark,
        ev.filter(F.col("event_id") < 5000),
        root,
        "overwrite",
        partition_by=["days(ts)"],
    )  # v1: time-partitioned era
    cat.register_snapshot_table(spark, "events_evp", root)
    eng.sql(
        "ALTER TABLE events_evp SET PARTITION SPEC (bucket(8, user_id))"
    )  # v2: metadata-only evolution
    eng.sql(
        "INSERT INTO events_evp SELECT event_id, user_id, ts, value "
        "FROM events WHERE event_id >= 5000"
    )  # v3: bucket-partitioned era
    m = tf._read_manifest(root, tf.latest_version(root))
    if m.get("partition_spec") != ["bucket(8, user_id)"]:
        raise RuntimeError(
            f"a15v gate FAILED: recorded spec {m.get('partition_spec')}"
        )
    ents = tf._entries(m, root)
    era_days = [e for e in ents if "days(ts)" in (e.get("partition") or {})]
    era_bkt = [
        e for e in ents if "bucket(8, user_id)" in (e.get("partition") or {})
    ]
    if not era_days or not era_bkt or len(era_days) + len(era_bkt) != len(
        ents
    ):
        raise RuntimeError(
            f"a15v gate FAILED: expected two pure eras, got "
            f"{len(era_days)} days / {len(era_bkt)} bucket of {len(ents)}"
        )
    # gate 1: ts window prunes the days era to its matching days; the
    # bucket era is not ts-prunable and stays fully read
    days = {"2024-01-05", "2024-01-06", "2024-01-07"}
    match_days = [
        e
        for e in era_days
        if e["partition"]["days(ts)"] in days
    ]
    lo = dtm.datetime(2024, 1, 5)
    hi = dtm.datetime(2024, 1, 7, 23, 59, 59, 999999)
    ctr: dict = {}
    df, n_read, n_total = tf.snapshot_read_pruned(
        spark, root, {"ts": (lo, hi)}, counters=ctr
    )
    if ctr["footer_fallbacks"] or n_read != len(match_days) + len(era_bkt):
        raise RuntimeError(
            f"a15v gate FAILED (ts era): read {n_read} of {n_total}, "
            f"expected {len(match_days)} in-window days files + "
            f"{len(era_bkt)} bucket files; counters {ctr}"
        )
    # gate 2: a user_id point read keeps at most the one matching
    # bucket of the new era (the days era is only stats-prunable)
    uid = 7
    match_bkt = [
        e for e in era_bkt if e["partition"]["bucket(8, user_id)"] == "7"
    ]
    _df2, n_read2, _tot2 = tf.snapshot_read_pruned(
        spark, root, {"user_id": (uid, uid)}
    )
    if n_read2 > len(era_days) + len(match_bkt):
        raise RuntimeError(
            f"a15v gate FAILED (bucket era): read {n_read2}, cap "
            f"{len(era_days)} days files + {len(match_bkt)} in bucket"
        )
    out = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        fdec(F.sum(sdec("value"))).alias("sum_value"),
    ).withColumn("pruned", F.lit(True))
    return _materialize_and_cleanup(spark, out, root)


@register(
    "a15p_row_level_cdc",
    "A8",
    """
    WITH src AS (
      SELECT event_id, user_id, CAST(value AS DOUBLE) AS value FROM events
    ),
    v2_ins AS (
      SELECT event_id, user_id, value,
             'insert' AS _change_type, CAST(2 AS BIGINT) AS _commit_version
      FROM src WHERE event_id >= 6000
    ),
    v3_del AS (
      SELECT event_id, user_id, value,
             'delete', CAST(3 AS BIGINT)
      FROM src WHERE event_id % 7 = 0
    ),
    state3 AS (SELECT * FROM src WHERE event_id % 7 <> 0),
    v4_pre AS (
      SELECT event_id, user_id, value,
             'update_preimage', CAST(4 AS BIGINT)
      FROM state3 WHERE event_id % 5 = 0
    ),
    v4_post AS (
      SELECT event_id, user_id, value * 2,
             'update_postimage', CAST(4 AS BIGINT)
      FROM state3 WHERE event_id % 5 = 0
    ),
    state4 AS (
      SELECT event_id, user_id,
             CASE WHEN event_id % 5 = 0 THEN value * 2 ELSE value END AS value
      FROM state3
    ),
    v5_pre AS (
      SELECT event_id, user_id, value,
             'update_preimage', CAST(5 AS BIGINT)
      FROM state4 WHERE event_id < 100
    ),
    v5_post AS (
      SELECT event_id, user_id, CAST(-1.0 AS DOUBLE),
             'update_postimage', CAST(5 AS BIGINT)
      FROM src WHERE event_id < 100 AND event_id % 7 <> 0
    ),
    v5_ins AS (
      SELECT event_id, user_id, CAST(-1.0 AS DOUBLE),
             'insert', CAST(5 AS BIGINT)
      FROM src WHERE event_id < 100 AND event_id % 7 = 0
    )
    SELECT * FROM v2_ins
    UNION ALL SELECT * FROM v3_del
    UNION ALL SELECT * FROM v4_pre
    UNION ALL SELECT * FROM v4_post
    UNION ALL SELECT * FROM v5_pre
    UNION ALL SELECT * FROM v5_post
    UNION ALL SELECT * FROM v5_ins
    """,
    note="ROW-LEVEL CDC across non-append commits (r14, VERDICT item 7 "
    "— Delta CDF's row events, public design, synthesized at READ time "
    "from MOR state instead of write-time CDC files): "
    "snapshot_row_changes diffs each commit's manifest against its "
    "predecessor and emits (row, _change_type ∈ insert/delete/"
    "update_preimage/update_postimage, _commit_version). Equality "
    "deletes semi-join the delete keys against the predecessor view "
    "(broadcast keys — the one scan-shaped case); position deletes "
    "read ONLY the addressed files and inner-join (file, row_index) — "
    "O(files touched); a MERGE splits its key set into updates vs "
    "inserts with two broadcast joins; compact/cluster/fold/metadata "
    "commits emit nothing; overwrite/restore refuse (provenance "
    "genuinely lost — same rule Delta CDF applies without CDC files). "
    "The entry drives append → equality delete → predicate update → "
    "merge on a live table and hash-compares the FULL event set "
    "against a CTE replay; the gate pins one commit per op. At 100 TB "
    "a CDC consumer reads O(changed rows + touched files) per commit, "
    "not O(table) — except equality-delete preimages, which cost one "
    "key-filtered scan of the prior snapshot (the price of not "
    "materializing CDC files at write time; stated trade).",
)
def a15p_row_level_cdc(spark, sf_dir):
    import tempfile

    from s3_kinesis_replay_spark.operators import table_format as tf

    ev = t(spark, "events", sf_dir).select(
        "event_id", "user_id", F.col("value").cast("double").alias("value")
    )
    root = tempfile.mkdtemp(prefix="skr_cdctbl_")
    tf.snapshot_write(
        spark, ev.filter(F.col("event_id") < 6000), root, mode="overwrite"
    )  # v1
    tf.snapshot_write(
        spark, ev.filter(F.col("event_id") >= 6000), root, mode="append"
    )  # v2
    tf.snapshot_delete(
        spark,
        root,
        ev.filter(F.col("event_id") % 7 == 0).select("event_id"),
        "event_id",
    )  # v3
    tf.snapshot_update_where(
        spark, root, "event_id % 5 = 0", {"value": "value * 2"}
    )  # v4
    tf.snapshot_merge(
        spark,
        root,
        ev.filter(F.col("event_id") < 100).select(
            "event_id", "user_id", F.lit(-1.0).cast("double").alias("value")
        ),
        "event_id",
    )  # v5
    ops = [
        r["operation"]
        for r in tf.snapshot_history(spark, root).collect()
    ]
    if ops != ["overwrite", "append", "delete", "update", "merge"]:
        raise RuntimeError(
            f"a15p gate FAILED: expected one commit per op, got {ops}"
        )
    out = tf.snapshot_row_changes(spark, root, 1, 5).select(
        "event_id", "user_id", "value", "_change_type", "_commit_version"
    )
    # bounded collect: rows ∝ CHANGED rows at this sf (~9k at sf0.01,
    # ~90k at sf0.1) — a CDC consumer materializes its delta by design
    return _materialize_and_cleanup(spark, out, root)


@register(
    "a15q_sql_table_changes",
    "A8",
    """
    WITH src AS (
      SELECT event_id, CAST(value AS DOUBLE) AS value FROM events
      WHERE event_id < 2000
    ),
    v2_ins AS (
      SELECT event_id, value, 'insert' AS _change_type,
             CAST(2 AS BIGINT) AS _commit_version
      FROM src WHERE event_id >= 1000
    ),
    v3_del AS (
      SELECT event_id, value, 'delete', CAST(3 AS BIGINT)
      FROM src WHERE event_id % 10 = 0
    )
    SELECT * FROM v2_ins UNION ALL SELECT * FROM v3_del
    """,
    note="SQL CDC TVF (r14 — Delta's table_changes): `SELECT * FROM "
    "TABLE_CHANGES(tbl, from, to)` through Engine.sql resolves to "
    "snapshot_row_changes over the registered table, so a SQL-only "
    "user gets row-level CDC without touching the Python operators; "
    "the CLI twin is `table changes --root R --from-version A "
    "--to-version B`. The entry builds append+delete history and "
    "hash-compares the full event set against the CTE replay — same "
    "correctness bar as a15p, exercised through the SQL front door. "
    "DESCRIBE HISTORY / VACUUM [RETAIN n VERSIONS] / OPTIMIZE ZORDER "
    "BY round out the maintenance SQL surface (unit-pinned in "
    "tests/test_operators.py::test_sql_maintenance_and_cdc_verbs).",
)
def a15q_sql_table_changes(spark, sf_dir):
    import tempfile

    from s3_kinesis_replay_spark.engine import Engine
    from s3_kinesis_replay_spark.operators import table_format as tf

    ev = t(spark, "events", sf_dir).select(
        "event_id", F.col("value").cast("double").alias("value")
    ).filter(F.col("event_id") < 2000)
    root = tempfile.mkdtemp(prefix="skr_tvctbl_")
    eng = Engine(spark, sf_dir=sf_dir)
    tf.snapshot_write(
        spark, ev.filter(F.col("event_id") < 1000), root, mode="overwrite"
    )  # v1
    tf.snapshot_write(
        spark, ev.filter(F.col("event_id") >= 1000), root, mode="append"
    )  # v2
    tf.snapshot_delete(
        spark,
        root,
        ev.filter(F.col("event_id") % 10 == 0).select("event_id"),
        "event_id",
    )  # v3
    eng.register_snapshot_table("events_tvc", root)
    out = eng.sql("SELECT * FROM TABLE_CHANGES(events_tvc, 1, 3)").select(
        "event_id", "value", "_change_type", "_commit_version"
    )
    return _materialize_and_cleanup(spark, out, root)


@register(
    "a15t_timestamp_table_changes",
    "A8",
    """
    WITH src AS (
      SELECT event_id, CAST(value AS DOUBLE) AS value FROM events
      WHERE event_id < 2000
    ),
    v2_ins AS (
      SELECT event_id, value, 'insert' AS _change_type,
             CAST(2 AS BIGINT) AS _commit_version
      FROM src WHERE event_id >= 1000
    ),
    v3_del AS (
      SELECT event_id, value, 'delete', CAST(3 AS BIGINT)
      FROM src WHERE event_id % 10 = 0
    )
    SELECT * FROM v2_ins UNION ALL SELECT * FROM v3_del
    """,
    note="TIMESTAMP-RANGE CDC (r15, VERDICT r14 item 5 — Delta's more "
    "common spelling: startingTimestamp rather than a version number): "
    "`TABLE_CHANGES(tbl, TIMESTAMP 'a', TIMESTAMP 'b')` resolves the "
    "starting bound to the newest version strictly BEFORE a (exclusive "
    "lower bound, so commits at/after the timestamp are included) and "
    "the ending bound to the newest version at/before b — composing "
    "the TIMESTAMP AS OF metadata walk (version_as_of / "
    "cdc_start_version) with the existing row-level CDC. The entry "
    "builds the same append+delete history as a15q, derives the "
    "bounds from the commits' RECORDED committed_at (midpoint between "
    "v1 and v2; exactly v3), gates that they resolve to versions "
    "(1, 3], and hash-compares the TVF result against the version-"
    "bound CTE replay — proving timestamp bounds select the same row "
    "set. Both streaming sources take the same `starting_timestamp` "
    "option (unit-pinned in tests). Resolution is O(#retained "
    "manifests) metadata at any table size; a bound below the vacuum "
    "horizon fails loudly rather than silently dropping changes.",
)
def a15t_timestamp_table_changes(spark, sf_dir):
    import tempfile
    from datetime import datetime, timezone

    from s3_kinesis_replay_spark.engine import Engine
    from s3_kinesis_replay_spark.operators import table_format as tf

    ev = t(spark, "events", sf_dir).select(
        "event_id", F.col("value").cast("double").alias("value")
    ).filter(F.col("event_id") < 2000)
    root = tempfile.mkdtemp(prefix="skr_tstvc_")
    eng = Engine(spark, sf_dir=sf_dir)
    tf.snapshot_write(
        spark, ev.filter(F.col("event_id") < 1000), root, mode="overwrite"
    )  # v1
    tf.snapshot_write(
        spark, ev.filter(F.col("event_id") >= 1000), root, mode="append"
    )  # v2
    tf.snapshot_delete(
        spark,
        root,
        ev.filter(F.col("event_id") % 10 == 0).select("event_id"),
        "event_id",
    )  # v3
    at = {
        v: tf._read_manifest(root, v)["committed_at"] for v in (1, 2, 3)
    }

    def iso(ts: float) -> str:
        return datetime.fromtimestamp(ts, timezone.utc).isoformat()

    from_iso = iso((at[1] + at[2]) / 2)  # strictly between v1 and v2
    # NOT iso(at[3]) exactly: isoformat truncates the float to whole
    # microseconds, which can land a hair BEFORE v3's committed_at and
    # resolve the bound to v2 (flaked once in a full verify run) —
    # half a second past the last commit is unambiguous
    to_iso = iso(at[3] + 0.5)
    got = (
        tf.cdc_start_version(root, tf.timestamp_to_epoch(from_iso)),
        tf.version_as_of(root, tf.timestamp_to_epoch(to_iso)),
    )
    if got != (1, 3):
        raise RuntimeError(
            f"a15t gate FAILED: timestamp bounds resolved to {got}, "
            "expected versions (1, 3)"
        )
    eng.register_snapshot_table("events_tstvc", root)
    out = eng.sql(
        f"SELECT * FROM TABLE_CHANGES(events_tstvc, "
        f"TIMESTAMP '{from_iso}', TIMESTAMP '{to_iso}')"
    ).select("event_id", "value", "_change_type", "_commit_version")
    return _materialize_and_cleanup(spark, out, root)


@register(
    "p25_materialized_view_verb",
    "D1",
    f"""
    WITH src AS (
      SELECT event_id, event_type, CAST(value AS DOUBLE) AS value FROM events
    ),
    state3 AS (SELECT * FROM src WHERE event_id % 7 <> 0),
    kept AS (SELECT * FROM state3 WHERE event_id % 5 <> 0),
    merged AS (
      SELECT event_id, event_type, value * 2 AS value
      FROM src WHERE event_id % 5 = 0
    ),
    final AS (SELECT * FROM kept UNION ALL SELECT * FROM merged)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6)
             AS sum_value
    FROM final GROUP BY event_type ORDER BY event_type
    """,
    note="MATERIALIZED VIEW AS A USER VERB (r15, VERDICT r14 item 8 — "
    "p23/p24 proved differential view maintenance; this wires it "
    "through SQL so a user never writes the foreachBatch): `CREATE "
    "MATERIALIZED VIEW v LOCATION '…' AS SELECT g, COUNT(*) AS n, "
    "SUM(e) AS s FROM t GROUP BY g` stores the O(groups) aggregate AS "
    "A MANIFEST TABLE whose commit atomically records the definition + "
    "the source version it reflects (a crash can never leave the "
    "version marker disagreeing with the stored rows); `REFRESH "
    "MATERIALIZED VIEW v` diffs snapshot_row_changes(reflected, "
    "latest) with signed weights and commits the merged O(groups) "
    "rows — O(changed rows) + O(groups), never a source rescan; "
    "provenance-losing commits (overwrite/restore) fall back to a "
    "stated full recompute. Sums accumulate in fixed decimal so the "
    "differential result lands on EXACTLY the recompute's bytes. The "
    "entry creates the view, drives append + equality DELETE + MERGE "
    "on the source, refreshes once, gates the reflected version and "
    "the one-commit-per-verb history, and hash-compares the refreshed "
    "view against the oracle's full recompute of the final state. At "
    "100 TB: a dashboard-grade aggregate stays current for the cost "
    "of the rows that changed. COUNT(*) is required (group "
    "multiplicity — how vanished groups drop); additive aggregates "
    "only, the honest limit of self-maintainable views.",
)
def p25_materialized_view_verb(spark, sf_dir):
    import tempfile

    from s3_kinesis_replay_spark.engine import Engine
    from s3_kinesis_replay_spark.operators import table_format as tf

    ev = t(spark, "events", sf_dir).select(
        "event_id", "event_type", F.col("value").cast("double").alias("value")
    )
    src_root = tempfile.mkdtemp(prefix="skr_mvsrc_")
    view_root = tempfile.mkdtemp(prefix="skr_mview_")
    import os as _os

    _os.rmdir(view_root)  # matview_create wants an empty/absent dir
    eng = Engine(spark, sf_dir=sf_dir)
    tf.snapshot_write(
        spark, ev.filter(F.col("event_id") < 6000), src_root, "overwrite"
    )  # v1
    eng.register_snapshot_table("events_mvsrc", src_root)
    eng.sql(
        f"CREATE MATERIALIZED VIEW mv_events LOCATION '{view_root}' AS "
        "SELECT event_type, COUNT(*) AS n_events, SUM(value) AS sum_dec "
        "FROM events_mvsrc GROUP BY event_type"
    )
    tf.snapshot_write(
        spark, ev.filter(F.col("event_id") >= 6000), src_root, "append"
    )  # v2
    tf.snapshot_delete(
        spark,
        src_root,
        ev.filter(F.col("event_id") % 7 == 0).select("event_id"),
        "event_id",
    )  # v3
    tf.snapshot_merge(
        spark,
        src_root,
        ev.filter(F.col("event_id") % 5 == 0).withColumn(
            "value", F.col("value") * 2
        ),
        "event_id",
    )  # v4
    eng.sql("REFRESH MATERIALIZED VIEW mv_events")
    mv = tf._read_manifest(view_root, tf.latest_version(view_root))
    ops = [
        r["operation"]
        for r in tf.snapshot_history(spark, view_root).collect()
    ]
    if ops != ["matview_create", "matview_refresh"] or mv["matview"][
        "source_version"
    ] != tf.latest_version(src_root):
        raise RuntimeError(
            f"p25 gate FAILED: view history {ops}, reflected "
            f"v{mv['matview']['source_version']} vs source "
            f"v{tf.latest_version(src_root)}"
        )
    out = eng.sql(
        "SELECT event_type, n_events, "
        "ROUND(CAST(sum_dec AS DOUBLE), 6) AS sum_value "
        "FROM mv_events ORDER BY event_type"
    )
    rows = out.collect()
    import shutil

    shutil.rmtree(src_root, ignore_errors=True)
    shutil.rmtree(view_root, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


@register(
    "p26_matview_refresh_on_commit",
    "D1",
    f"""
    WITH src AS (
      SELECT event_id, event_type, CAST(value AS DOUBLE) AS value FROM events
    ),
    state3 AS (SELECT * FROM src WHERE event_id % 7 <> 0),
    kept AS (SELECT * FROM state3 WHERE event_id % 5 <> 0),
    merged AS (
      SELECT event_id, event_type, value * 2 AS value
      FROM src WHERE event_id % 5 = 0
    ),
    final AS (SELECT * FROM kept UNION ALL SELECT * FROM merged)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6)
             AS sum_value
    FROM final GROUP BY event_type ORDER BY event_type
    """,
    note="MATVIEW REFRESH ON COMMIT (r16, VERDICT r15 item 7 — the "
    "option a user expects once the view is a first-class verb): "
    "`CREATE MATERIALIZED VIEW v LOCATION '…' REFRESH ON COMMIT AS "
    "…` records an on-commit pointer under the SOURCE table's root "
    "(_views/, outside the vacuum walk); every catalog DML verb "
    "(INSERT / DELETE / UPDATE / MERGE / DDL) then brings dependent "
    "views current automatically — refresh_dependent_views walks the "
    "pointers and runs the ordinary differential refresh. "
    "Exactly-once is the refresh's own discipline (the view commit "
    "atomically records the source version it reflects, so repeated "
    "or racing refreshes for the same version no-op — the p24 replay "
    "guard, reused); dropped views prune their pointer instead of "
    "failing the writer. The entry creates the on-commit view, "
    "drives INSERT + DELETE WHERE + clause MERGE through SQL with NO "
    "manual REFRESH, gates one matview_refresh per data verb and the "
    "reflected-version currency, and hash-compares the view against "
    "the oracle's full recompute. At 100 TB: each writer pays "
    "O(its own changed rows) + O(groups) extra — the differential "
    "economics, now on by default where the user asked for it.",
)
def p26_matview_refresh_on_commit(spark, sf_dir):
    import os as _os
    import tempfile

    from s3_kinesis_replay_spark.engine import Engine
    from s3_kinesis_replay_spark.operators import table_format as tf

    ev = t(spark, "events", sf_dir).select(
        "event_id", "event_type", F.col("value").cast("double").alias("value")
    )
    src_root = tempfile.mkdtemp(prefix="skr_mvocsrc_")
    view_root = tempfile.mkdtemp(prefix="skr_mvocview_")
    _os.rmdir(view_root)
    eng = Engine(spark, sf_dir=sf_dir)
    tf.snapshot_write(
        spark, ev.filter(F.col("event_id") < 6000), src_root, "overwrite"
    )  # v1
    eng.register_snapshot_table("events_mvoc", src_root)
    eng.sql(
        f"CREATE MATERIALIZED VIEW mv_oc LOCATION '{view_root}' "
        "REFRESH ON COMMIT AS "
        "SELECT event_type, COUNT(*) AS n_events, SUM(value) AS sum_dec "
        "FROM events_mvoc GROUP BY event_type"
    )
    eng.sql(
        "INSERT INTO events_mvoc SELECT event_id, event_type, "
        "CAST(value AS DOUBLE) AS value FROM events WHERE event_id >= 6000"
    )  # v2 + auto-refresh
    eng.sql("DELETE FROM events_mvoc WHERE event_id % 7 = 0")  # v3 + refresh
    eng.sql(
        "MERGE INTO events_mvoc USING ("
        "  SELECT event_id, event_type, CAST(value AS DOUBLE) * 2 AS value"
        "  FROM events WHERE event_id % 5 = 0"
        ") ON event_id "
        "WHEN MATCHED THEN UPDATE SET value = s.value "
        "WHEN NOT MATCHED THEN INSERT *"
    )  # v4 + refresh
    # gates: NO manual REFRESH was issued, yet the view reflects the
    # source head with one refresh commit per data verb
    mvv = tf.latest_version(view_root)
    mv = tf._read_manifest(view_root, mvv)
    ops = [
        r["operation"]
        for r in tf.snapshot_history(spark, view_root).collect()
    ]
    if ops != [
        "matview_create",
        "matview_refresh",
        "matview_refresh",
        "matview_refresh",
    ] or mv["matview"]["source_version"] != tf.latest_version(src_root):
        raise RuntimeError(
            f"p26 gate FAILED: view history {ops}, reflected "
            f"v{mv['matview']['source_version']} vs source "
            f"v{tf.latest_version(src_root)}"
        )
    if not mv["matview"].get("on_commit"):
        raise RuntimeError("p26 gate FAILED: on_commit flag not recorded")
    out = eng.sql(
        "SELECT event_type, n_events, "
        "ROUND(CAST(sum_dec AS DOUBLE), 6) AS sum_value "
        "FROM mv_oc ORDER BY event_type"
    )
    rows = out.collect()
    import shutil

    shutil.rmtree(src_root, ignore_errors=True)
    shutil.rmtree(view_root, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


@register(
    "p23_ivm_row_deltas",
    "D1",
    f"""
    WITH src AS (
      SELECT event_id, event_type, CAST(value AS DOUBLE) AS value FROM events
    ),
    state3 AS (SELECT * FROM src WHERE event_id % 7 <> 0),
    state4 AS (
      SELECT event_type,
             CASE WHEN event_id % 5 = 0 THEN value * 2 ELSE value END AS value
      FROM state3
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(value AS {DEC})) AS DOUBLE), 6) AS sum_value
    FROM state4 GROUP BY event_type ORDER BY event_type
    """,
    note="DIFFERENTIAL VIEW MAINTENANCE over ROW-level CDC (r14 — the "
    "consumer a15p exists for, and the upgrade p22 could not make: "
    "file-level CDC only refreshes views across APPENDS; deletes and "
    "updates forced a recompute). A per-event_type aggregate is "
    "materialized at v1, then the table takes an append, an equality "
    "DELETE, and a predicate UPDATE — and the view is refreshed from "
    "snapshot_row_changes(1, 4) alone with SIGNED weights (insert/"
    "update_postimage +1, delete/update_preimage -1): counts add "
    "Σw, sums add Σ(w·value), groups vanishing to zero rows drop — "
    "classic differential maintenance (additive aggregates are "
    "self-maintainable under deletes given the preimage, which is "
    "exactly what the CDC feed carries; MIN/MAX still need recompute "
    "or the sketch tier). The oracle recomputes the aggregate from "
    "the replayed FINAL state, so a signed merge that double-counts, "
    "misses a preimage, or mis-weights an update hash-mismatches. At "
    "100 TB: refresh cost = O(changed rows) + O(groups), never a "
    "table rescan — and the same signed-delta plan runs unmodified as "
    "a foreachBatch consumer of the a15r streaming CDC feed.",
)
def p23_ivm_row_deltas(spark, sf_dir):
    import tempfile

    from s3_kinesis_replay_spark.operators import table_format as tf

    ev = t(spark, "events", sf_dir).select(
        "event_id", "event_type", F.col("value").cast("double").alias("value")
    )
    root = tempfile.mkdtemp(prefix="skr_ivmtbl_")
    tf.snapshot_write(
        spark, ev.filter(F.col("event_id") < 6000), root, mode="overwrite"
    )  # v1
    base = (
        tf.snapshot_read(spark, root, 1)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(sdec("value")).alias("sum_dec"),
        )
    )
    # the view is a STORED artifact: materialize it before the table
    # mutates (exactly what a production refresh would hold)
    base_rows = base.collect()  # bounded: one row per event_type
    base = spark.createDataFrame(base_rows, base.schema)
    tf.snapshot_write(
        spark, ev.filter(F.col("event_id") >= 6000), root, mode="append"
    )  # v2
    tf.snapshot_delete(
        spark,
        root,
        ev.filter(F.col("event_id") % 7 == 0).select("event_id"),
        "event_id",
    )  # v3
    tf.snapshot_update_where(
        spark, root, "event_id % 5 = 0", {"value": "value * 2"}
    )  # v4
    delta = tf.snapshot_row_changes(spark, root, 1, 4).withColumn(
        "w",
        F.when(
            F.col("_change_type").isin("insert", "update_postimage"), 1
        ).otherwise(-1),
    )
    delta_agg = delta.groupBy("event_type").agg(
        F.sum("w").alias("n_events"),
        F.sum(F.col("w") * sdec("value")).alias("sum_dec"),
    )
    out = (
        base.unionByName(delta_agg)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            fdec(F.sum("sum_dec")).alias("sum_value"),
        )
        .filter(F.col("n_events") > 0)
        .orderBy("event_type")
    )
    return _materialize_and_cleanup(spark, out, root)
