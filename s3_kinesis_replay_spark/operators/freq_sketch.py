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
