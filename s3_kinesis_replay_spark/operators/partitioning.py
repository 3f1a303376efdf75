"""Scan-parallelism guard (guide §2.5: under-parallelized input).

The fixture tables are single small parquet files (one row group each),
so every scan plans to 1-3 partitions — and the stage that FOLLOWS the
scan (shingle explodes, per-row hashing, partial aggregation,
broadcast-join probes) runs on 1-3 cores while the rest of the cluster
idles. That is the round-16 scaling block in one sentence: at bench SF
nothing gained from 32 cores over 8, because almost every pipeline's
heavy stage was pinned to the scan's task count.

``spread_scan`` is guide §2.5's prescribed remedy for input that cannot
be split finer ("one huge unsplittable file … otherwise repartition
immediately after the read"), applied to the small-file variant of the
same disease. It is deliberately KEYED (hash repartition on a stable
high-cardinality column): deterministic under task retry — §2.5 warns
off rand-derived placement — and, when the key is the downstream
groupBy/join key and the target equals ``spark.sql.shuffle.partitions``,
the downstream exchange is satisfied by this one and elided outright.

Scale safety: the repartition fires ONLY when the planned scan yields
fewer partitions than the cluster's ``defaultParallelism``. A
production-scale input (thousands of splits) passes through untouched,
so this can never shuffle a 100 TB table; what it shuffles is by
construction smaller than one task per core could not already handle.
The gate reads the planned partitioning (driver metadata, no job) and
costs well under a millisecond per query construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition an under-parallelized scan to cluster parallelism.

    No-op when the plan already yields >= defaultParallelism partitions
    (any production-scale input). ``keys`` should be a stable
    high-cardinality column — ideally the downstream groupBy/join key so
    the exchange this inserts REPLACES the downstream one instead of
    adding to it. Only order-insensitive consumers (aggregations,
    equi-joins, distinct) may sit downstream: a keyed repartition
    changes physical row order.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if target <= 1 or df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *keys) if keys else df.repartition(target)
