"""Mergeable frequency summaries (heavy hitters) — the third member of
the sketch trio next to d4b's HLL union (distinct count) and d7b's
equi-rank summaries (quantiles).

Public background: Misra–Gries (1982) and its mergeable form (Agarwal,
Cormode, Huang, Phillips, Wei, Yi — "Mergeable Summaries", PODS 2012):
an m-counter MG summary of a multiset of n items estimates every item's
count with

    c_i - n/(m+1)  <=  est_i  <=  c_i

(never an OVERcount; undercount bounded by n/(m+1)), and summaries merge
by summing per-item counters then re-compressing — the merged summary
keeps the SAME bound over the combined n. That makes per-shard / per-day
artifacts roll up into corpus heavy hitters without rescanning raw data,
the property that matters when "the data" is a 100 TB token stream and
the question is "which items exceed 0.1% frequency".

Offline equivalence used here (standard): the MG compress of an exact
count table is "subtract the (m+1)-th largest count from every counter,
keep the strictly-positive ones" — at most m survive, and each item's
deduction is at most n/(m+1).

Spark wiring mirrors operators/quantile_sketch.py: shard assignment is a
DETERMINISTIC column expression (pmod of a row-key hash), not physical
partitioning, so the sketch is reproducible regardless of task
placement. Both phases are ``applyInPandas`` (Arrow-batched): the
partial phase reduces each (group, shard) to at most m (item, count)
pairs, the merge phase shuffles only m·n_shards rows per group. Per-task
memory is bounded by the shard's distinct-item count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def _mg_compress(items: np.ndarray, counts: np.ndarray, m: int):
    """Offline Misra–Gries compress: keep at most ``m`` counters by
    subtracting the (m+1)-th largest count from all and dropping the
    non-positive remainder. Undercount per item <= sum(counts)/(m+1)."""
    if len(items) <= m:
        return items, counts
    order = np.argsort(counts, kind="stable")[::-1]
    t = counts[order[m]]  # the (m+1)-th largest
    kept = counts - t
    mask = kept > 0
    return items[mask], kept[mask]


def mg_partial_summaries(
    df: DataFrame,
    group_col: str,
    item_col: str,
    shard_col: Column,
    m: int = 16,
) -> DataFrame:
    """(g, items, cnts) per-(group, shard) MG summaries — the mergeable
    ARTIFACT form: each row is at most m counters standing in for its
    shard with undercount <= n_shard/(m+1). Persist these (e.g. one per
    day / per micro-batch) and roll up later with ``mg_merge`` without
    rescanning the raw rows."""
    gtype = df.schema[group_col].dataType.simpleString()
    ityp = df.schema[item_col].dataType.simpleString()
    sharded = df.select(
        F.col(group_col).alias("g"),
        F.col(item_col).alias("it"),
        shard_col.alias("_shard"),
    )

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        vc = pdf["it"].value_counts(dropna=False)
        items, counts = _mg_compress(
            vc.index.to_numpy(), vc.to_numpy().astype(np.int64), m
        )
        return pd.DataFrame(
            {
                "g": [pdf["g"].iloc[0]],
                "items": [list(items)],
                "cnts": [list(int(c) for c in counts)],
            }
        )

    return sharded.groupBy("g", "_shard").applyInPandas(
        partial, f"g {gtype}, items array<{ityp}>, cnts array<long>"
    )


def mg_merge(partials: DataFrame, m: int = 16, item_type: str = "string") -> DataFrame:
    """(g, it, est) from stored MG summaries: per group, sum counters
    across summaries and re-compress — the Agarwal et al. merge, which
    preserves the combined bound est <= exact <= est + N/(m+1)."""
    gtype = partials.schema["g"].dataType.simpleString()

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        acc: dict = {}
        for items, cnts in zip(pdf["items"], pdf["cnts"]):
            for it, c in zip(items, cnts):
                acc[it] = acc.get(it, 0) + int(c)
        if not acc:
            return pd.DataFrame({"g": [], "it": [], "est": []}).astype(
                {"est": "int64"}
            )
        items = np.array(list(acc.keys()), dtype=object)
        counts = np.array(list(acc.values()), dtype=np.int64)
        items, counts = _mg_compress(items, counts, m)
        return pd.DataFrame(
            {
                "g": np.repeat(pdf["g"].iloc[0], len(items)),
                "it": items,
                "est": counts,
            }
        )

    return partials.groupBy("g").applyInPandas(
        merge, f"g {gtype}, it {item_type}, est long"
    )


def _cm_cells(item: Column, d: int, w: int) -> Column:
    """The d (row, bucket) coordinates of an item in a Count-Min matrix:
    row i uses ``pmod(xxhash64(i, item), w)`` — seeded JVM hashes, pure
    codegen, identical wherever they're evaluated (update and query
    sides MUST agree)."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    F.pmod(F.xxhash64(F.lit(i), item), F.lit(w)).alias(
                        "bucket"
                    ),
                )
                for i in range(d)
            ]
        )
    )


def cm_partial_cells(
    df: DataFrame,
    group_col: str,
    item_col: str,
    shard_col: Column,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """(g, shard, i, bucket, cnt) — SPARSE per-(group, shard) Count-Min
    partials (Cormode & Muthukrishnan 2005): each shard's d×w counter
    matrix stored as its non-zero cells, ≤ min(d·w, d·distinct) rows per
    shard whatever the row count. Everything is codegen + one groupBy:
    no UDF touches the hot path (unlike the MG partials, CM's update is
    a pure counter increment, so Spark's native hash aggregate IS the
    sketch builder)."""
    return (
        df.select(
            F.col(group_col).alias("g"),
            shard_col.alias("shard"),
            _cm_cells(F.col(item_col), d, w).alias("c"),
        )
        .groupBy("g", "shard", "c.i", "c.bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_merge(partials: DataFrame) -> DataFrame:
    """(g, i, bucket, cnt) — Count-Min merge is element-wise counter SUM
    (the linearity that makes CM the easiest mergeable sketch): per-day
    / per-shard artifacts roll up with one groupBy, no raw-data rescan,
    and the merged sketch is bit-identical to one built in a single
    pass over the union (pinned in tests)."""
    return partials.groupBy("g", "i", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cm_estimate(
    merged: DataFrame,
    queries: DataFrame,
    group_col: str,
    item_col: str,
    d: int = 4,
    w: int = 1024,
    broadcast_sketch: bool = False,
) -> DataFrame:
    """(group, item, est) point queries against a merged sparse CM
    sketch: est = min over the d rows of the item's counter — NEVER an
    undercount (every occurrence incremented every row), overcount is
    the item's collision mass (expected N/w per row, min over d rows).
    The sketch is ≤ d·w rows PER GROUP but d·w·n_groups in total, so
    ``broadcast_sketch`` is the CALLER's call (review r10): pass True
    when the group column is low-cardinality (d16's handful of langs —
    the lookup then never shuffles the query side); leave False for
    high-cardinality groups, where a forced broadcast of
    n_groups·d·w rows would OOM and the shuffle join is the safe form."""
    sketch = F.broadcast(merged) if broadcast_sketch else merged
    q = queries.select(
        F.col(group_col).alias("g"),
        F.col(item_col).alias("it"),
        _cm_cells(F.col(item_col), d, w).alias("c"),
    ).select("g", "it", "c.i", "c.bucket")
    return (
        q.join(sketch, ["g", "i", "bucket"], "left")
        .groupBy("g", "it")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
        .select(
            F.col("g").alias(group_col),
            F.col("it").alias(item_col),
            "est",
        )
    )


def misra_gries_counts(
    df: DataFrame,
    group_col: str,
    item_col: str,
    shard_col: Column,
    m: int = 16,
) -> DataFrame:
    """(group, item, est) estimated counts from mergeable per-(group,
    shard) Misra–Gries summaries. ``est`` obeys the two-sided MG bound
    per group: est <= exact and exact - est <= N_group/(m+1), where
    N_group counts every row of the group (the bound a correctness flag
    can assert without tolerance). ``shard_col`` must be deterministic
    over the row (e.g. ``pmod(xxhash64(key), n_shards)``)."""
    ityp = df.schema[item_col].dataType.simpleString()
    partials = mg_partial_summaries(df, group_col, item_col, shard_col, m)
    merged = mg_merge(partials, m, item_type=ityp)
    return merged.select(
        F.col("g").alias(group_col),
        F.col("it").alias(item_col),
        "est",
    )
