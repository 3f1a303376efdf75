#!/usr/bin/env python
"""Probe: SemDeDup k-means cell-size distribution (VERDICT r16 item 4).

The r16 scaling block flagged i14's 8-core/32-core ratio (0.72) and
hypothesized cogroup cell skew (one dominant cell = one straggler task).
This probe measures the actual distribution the i14 quantizer produces.

Measured r17 (committed in OPTIMIZATION_r17.md):

    sf0.01: n=500   cells=16 max=43  median=30.5  max/median=1.41
    sf0.1:  n=2000  cells=16 max=144 median=123.5 max/median=1.17

i.e. the cells are BALANCED (nowhere near the guide §2.5 5-10x fix
threshold) — the skew hypothesis is refuted at bench SF. The bad scaling
ratio came from fixed overhead instead: the operator ran 4 jobs (sample
collect, eager assignment checkpoint, cogroup, assigned⟕dropped join)
over 2000 rows, so 32-way partitioning only added empty-task scheduling.
r17 rewrites semdedup to emit its whole output from the per-cell pass
(no checkpoint, no join — see operators/similarity.py::semdedup).
"""
import statistics
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from s3_kinesis_replay_spark.catalog import table
from s3_kinesis_replay_spark.operators.similarity import (
    assign_cells,
    train_quantizer,
)
from s3_kinesis_replay_spark.session import get_spark


def main() -> None:
    spark = get_spark(app_name="skr-probe-semdedup-cells")
    spark.sparkContext.setLogLevel("ERROR")
    for sf in sys.argv[1:] or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]:
        e = table(spark, "embeddings", sf).select("vec_id", "embedding")
        centers = train_quantizer(e, n_clusters=16, seed=42)
        dist = (
            assign_cells(e, centers)
            .groupBy("cell")
            .count()
            .orderBy(F.desc("count"))
            .collect()
        )
        counts = [r["count"] for r in dist]
        med = statistics.median(counts)
        print(
            f"{sf}: n={sum(counts)} cells={len(counts)} max={max(counts)} "
            f"median={med} max/median={max(counts) / med:.2f}"
        )
        print(f"  sizes: {counts}")


if __name__ == "__main__":
    main()
