"""Aggregated-rank rewrite for low-cardinality window partitions.

A window `PARTITION BY p ORDER BY v` funnels every row of partition p
through one task — with 3 distinct p values, a 100 TB fact table sorts
in 3 tasks (SCALE.md 'e1-class LOW-CARDINALITY window partitions').
Count-based ranking functions (rank, dense_rank, percent_rank,
cume_dist) depend only on the distribution of v within p, never on row
identity, so they can be computed once per DISTINCT (p, v) pair on an
aggregated relation and broadcast-joined back to the fact:

* `groupBy(p, v).count()` — a partial-aggregated shuffle of (p, v, cnt)
  rows, the same cost shape as any groupBy;
* one window over that tiny relation (|p| × |distinct v| rows);
* `fact JOIN broadcast(ranked) ON (p, v)` — no fact row ever enters a
  window sort.

row_number and ntile are order-sensitive (two equal v rows get different
numbers), so they cannot ride this rewrite — they stay on the direct
window path (queries/windows.py e1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def agg_rank(
    df: DataFrame,
    part_col: str,
    order_col: str,
    descending: bool = True,
) -> DataFrame:
    """Attach rnk / drnk / prnk / cdist for the window
    ``PARTITION BY part_col ORDER BY order_col [DESC]`` without sorting
    ``df`` itself. prnk/cdist are raw doubles (callers round/canonicalize
    at the plan edge per SURVEY §5.3)."""
    counts = df.groupBy(part_col, order_col).agg(F.count("*").alias("cnt"))
    key = F.col(order_col).desc() if descending else F.col(order_col).asc()
    wp = Window.partitionBy(part_col).orderBy(key)
    prev = F.sum("cnt").over(wp.rowsBetween(Window.unboundedPreceding, -1))
    # same (partition, order) spec as every other frame here → Spark
    # evaluates all four expressions in ONE Window operator
    total = F.sum("cnt").over(
        wp.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cume = F.sum("cnt").over(wp.rowsBetween(Window.unboundedPreceding, 0))
    ranked = counts.select(
        F.col(part_col).alias("_rr_p"),
        F.col(order_col).alias("_rr_v"),
        (F.coalesce(prev, F.lit(0)) + 1).cast("bigint").alias("rnk"),
        F.row_number().over(wp).cast("bigint").alias("drnk"),
        F.when(total == 1, F.lit(0.0))
        .otherwise(F.coalesce(prev, F.lit(0)).cast("double") / (total - 1))
        .alias("prnk"),
        (cume.cast("double") / total).alias("cdist"),
    )
    # NULL-SAFE join keys: groupBy keeps NULL partition/order values (the
    # direct window ranks them too — nulls-last under DESC), and a plain
    # equi-join would silently drop those rows on the way back
    return df.join(
        F.broadcast(ranked),
        F.col(part_col).eqNullSafe(F.col("_rr_p"))
        & F.col(order_col).eqNullSafe(F.col("_rr_v")),
    ).drop("_rr_p", "_rr_v")
