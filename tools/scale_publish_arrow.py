#!/usr/bin/env python
"""Round-17 experiment (VERDICT r16 item 7): make the r16 Arrow
distributed-publish win MEASURABLE. The r16 A/B (pickled-Row
foreachPartition → mapInArrow) was a wash at sf0.1 batch sizes; the
claim was that the per-row pickle cost is the term that grows with
batch size. This probe times the two publish shapes over synthetic
batches of growing row count N, identical sort/repartition layout and
an identical do-nothing endpoint, isolating the JVM→Python boundary:

1. pickled rows: ``df.foreachPartition(consume_rows)`` — every row
   crosses as a pickled Row object.
2. Arrow: the production shape — ``mapInArrow(consume_batches)`` over
   the same two columns, forced by the noop sink.

Rows are ~120-byte payloads over 7 keys (the replay envelope shape).
SPARK_GRAFT_PUBLISH_RUNS timed runs after one warm-up (default 3,
median). Results land in OPTIMIZATION_r17.md; rerun with
  python tools/scale_publish_arrow.py [N ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from s3_kinesis_replay_spark.session import get_spark  # noqa: E402

NS = [int(x) for x in sys.argv[1:]] or [10_000, 100_000, 1_000_000]
RUNS = int(os.environ.get("SPARK_GRAFT_PUBLISH_RUNS", "3"))
NUM_WRITERS = 8


def batch_frame(spark, n: int):
    return spark.range(n).select(
        F.concat(F.lit("k"), (F.col("id") % 7).cast("string")).alias("k"),
        F.concat(
            F.lit("0:"),
            F.col("id").cast("string"),
            F.lit("|"),
            F.lpad(F.col("id").cast("string"), 100, "x"),
        ).alias("payload"),
    )


def publish_rows(df) -> None:
    """The pre-r16 shape: pickled-Row foreachPartition."""

    def consume(rows) -> None:
        n = 0
        for r in rows:
            # what the old publisher did per row: touch key + encode
            _ = (r["k"], r["payload"].encode())
            n += 1

    parts = df.repartition(NUM_WRITERS, "k").sortWithinPartitions("k")
    parts.foreachPartition(consume)


def publish_arrow(df) -> None:
    """The r16 production shape: mapInArrow + noop force."""
    import pyarrow as pa

    def consume(batches):
        n = 0
        for b in batches:
            ks = b.column("k").to_pylist()
            ps = b.column("payload").to_pylist()
            for k_, p_ in zip(ks, ps):
                _ = (k_, p_.encode())
                n += 1
        yield pa.RecordBatch.from_pydict(
            {"published": pa.array([n], type=pa.int64())}
        )

    parts = df.repartition(NUM_WRITERS, "k").sortWithinPartitions("k")
    (
        parts.mapInArrow(consume, "published long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )


def timed(fn, df) -> float:
    fn(df)  # warm-up
    samples = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn(df)
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def main() -> None:
    spark = get_spark(app_name="skr-scale-publish-arrow")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'N':>10} {'pickled_s':>10} {'arrow_s':>10} {'speedup':>8}")
    for n in NS:
        df = batch_frame(spark, n)
        tr = timed(publish_rows, df)
        ta = timed(publish_arrow, df)
        print(f"{n:>10} {tr:>10.3f} {ta:>10.3f} {tr / ta:>8.2f}")


if __name__ == "__main__":
    main()
