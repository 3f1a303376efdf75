#!/usr/bin/env python
"""Round-16 experiment: number the scale claims of the two new verbs.

* snapshot_overwrite_where (replaceWhere) — claimed O(matched-file
  positions + new data), never O(table). A table of N one-day slices
  has its FIRST day replaced; if the claim holds, wall time stays flat
  as N grows, while a full `overwrite` of the same table grows
  linearly (shown for contrast, it rewrites everything).

* snapshot_clone — claimed O(retained files + manifests) METADATA ops,
  zero data bytes. Wall time should track file count, not row count:
  the same file count at 8x the rows per file must clone in the same
  time (hard links never read data).

Tables are built through the real write path (one commit per day
slice, real parquet on disk — clone hard-links real files, which is
the point).

Rerun with: python tools/scale_clone_rw.py
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

DAYS = (8, 32, 128)
ROWS_PER_DAY = 20_000
BASE = "/tmp/skr_scale_clone_rw"


def day_df(spark, d: int, rows: int):
    return spark.range(rows).select(
        F.lit(f"d{d:03d}").alias("day"),
        (F.col("id") + d * rows).alias("k"),
        (F.col("id") * 3).alias("v"),
    ).coalesce(1)


def build(spark, days: int, rows: int) -> str:
    root = f"{BASE}/d{days}_r{rows}"
    shutil.rmtree(root, ignore_errors=True)
    for d in range(days):
        tf.snapshot_write(
            spark, day_df(spark, d, rows), root,
            "overwrite" if d == 0 else "append",
        )
    return root


def main() -> None:
    spark = get_spark(app_name="skr-scale-clone-rw")
    spark.sparkContext.setLogLevel("ERROR")
    print("| days (files) | rows | replace_where s | full overwrite s "
          "| clone s | clone files |")
    print("| --- | --- | --- | --- | --- | --- |")
    for days in DAYS:
        root = build(spark, days, ROWS_PER_DAY)
        rep = day_df(spark, 0, ROWS_PER_DAY).withColumn(
            "v", F.col("v") + 1
        )
        t0 = time.perf_counter()
        tf.snapshot_overwrite_where(spark, root, rep, "day = 'd000'")
        t_rw = round(time.perf_counter() - t0, 3)
        full = tf.snapshot_read(spark, root)
        t0 = time.perf_counter()
        tf.snapshot_write(spark, full, root, "overwrite")
        t_full = round(time.perf_counter() - t0, 3)
        dst = root + "-clone"
        shutil.rmtree(dst, ignore_errors=True)
        t0 = time.perf_counter()
        tf.snapshot_clone(root, dst)
        t_clone = round(time.perf_counter() - t0, 3)
        n_linked = sum(
            len(fs) for _p, _d, fs in os.walk(os.path.join(dst, "data"))
        )
        print(
            f"| {days} | {days * ROWS_PER_DAY:,} | {t_rw} | {t_full} "
            f"| {t_clone} | {n_linked} |"
        )
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(dst, ignore_errors=True)
    # clone at constant FILE count, 8x the rows: time must not move
    print("| days (files) | rows | clone s | |  |  |")
    for rows in (ROWS_PER_DAY, 8 * ROWS_PER_DAY):
        root = build(spark, 16, rows)
        dst = root + "-clone"
        shutil.rmtree(dst, ignore_errors=True)
        t0 = time.perf_counter()
        tf.snapshot_clone(root, dst)
        t_clone = round(time.perf_counter() - t0, 3)
        print(f"| 16 | {16 * rows:,} | {t_clone} |  |  |  |")
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(dst, ignore_errors=True)


if __name__ == "__main__":
    main()
