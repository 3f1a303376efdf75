"""Measured scaling of p22's incremental-view-maintenance claim.

Claim under test (p22 note): refresh cost = O(delta data) + O(groups
artifact), never O(base history) — so against a k-fold base corpus with
a FIXED-size delta, incremental refresh time should stay ~flat while a
full recompute grows with k.

Method: events (sf0.1) replicated k-fold with re-keyed event_id/user_id
(k x groups, k x rows), committed as snapshot v1 of a manifest table;
a fixed delta (replica 0's event_id%4==3 slice, re-keyed to fresh ids)
appended as v2; the stored base aggregate is built once per k. Timed
(3-run medians, noop sink): (a) incremental = stored partials + CDC
delta -> merge; (b) full = recompute over snapshot v2. Results land in
SCALE.md. Run: python tools/scale_ivm.py
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from s3_kinesis_replay_spark.catalog import table  # noqa: E402
from s3_kinesis_replay_spark.operators.table_format import (  # noqa: E402
    snapshot_changes,
    snapshot_read,
    snapshot_write,
)
from s3_kinesis_replay_spark.queries.helpers import fdec, sdec  # noqa: E402
from s3_kinesis_replay_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KS = tuple(
    int(x)
    for x in os.environ.get("SPARK_GRAFT_IVM_KS", "1,2,4,8").split(",")
)
RUNS = 3


def timed(fn) -> float:
    fn()  # warm-up
    s = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        s.append(time.perf_counter() - t0)
    return round(statistics.median(s), 2)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark()
    ev = table(spark, "events", SF_DIR).select("event_id", "user_id", "value")
    max_eid = ev.agg(F.max("event_id")).collect()[0][0] + 1
    max_uid = ev.agg(F.max("user_id")).collect()[0][0] + 1
    n_base_rows = ev.count()

    print(f"| k | base rows | incremental refresh | full recompute |")
    print(f"| --- | --- | --- | --- |")
    rows = []
    for k in KS:
        base = ev.select(
            (F.col("event_id")).alias("event_id"),
            "user_id",
            "value",
        )
        parts = [base]
        for i in range(1, k):
            parts.append(
                ev.select(
                    (F.col("event_id") + i * max_eid).alias("event_id"),
                    (F.col("user_id") + i * max_uid).alias("user_id"),
                    "value",
                )
            )
        base_all = parts[0]
        for p in parts[1:]:
            base_all = base_all.unionByName(p)

        root = tempfile.mkdtemp(prefix=f"skr_ivm_k{k}_")
        snapshot_write(spark, base_all, root, mode="overwrite")
        # fixed-size delta whatever k: replica 0's %4==3 slice, fresh ids
        delta_src = ev.filter(F.col("event_id") % 4 == 3).select(
            (F.col("event_id") + k * max_eid).alias("event_id"),
            "user_id",
            "value",
        )
        snapshot_write(spark, delta_src, root, mode="append")

        agg_dir = os.path.join(root, "_base_agg")
        (
            snapshot_read(spark, root, version=1)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(sdec("value")).alias("sum_value_dec"),
            )
            .write.mode("overwrite")
            .parquet(agg_dir)
        )

        def incremental():
            basep = spark.read.parquet(agg_dir)
            delta = (
                snapshot_changes(spark, root, 1, 2)
                .groupBy("user_id")
                .agg(
                    F.count(F.lit(1)).alias("n_events"),
                    F.sum(sdec("value")).alias("sum_value_dec"),
                )
            )
            noop(
                basep.unionByName(delta)
                .groupBy("user_id")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    fdec(F.sum("sum_value_dec")).alias("sum_value"),
                )
            )

        def full():
            noop(
                snapshot_read(spark, root, version=2)
                .groupBy("user_id")
                .agg(
                    F.count(F.lit(1)).alias("n_events"),
                    fdec(F.sum(sdec("value"))).alias("sum_value"),
                )
            )

        t_inc, t_full = timed(incremental), timed(full)
        rows.append((k, k * n_base_rows, t_inc, t_full))
        print(f"| {k} | {k * n_base_rows:,} | {t_inc} s | {t_full} s |")

    print()
    print("rows:", rows)


if __name__ == "__main__":
    main()
