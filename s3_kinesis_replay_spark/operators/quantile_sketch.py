"""Mergeable quantile summaries — the 100 TB shape of SURVEY §2.D7.

d4b gave distinct-count its mergeable-sketch tier (per-group HLL union);
this module is the quantile analog: per-shard summaries built in one
pass, merged WITHOUT rescanning the data — the property that lets
per-day / per-shard artifacts roll up into corpus quantiles the same way
HLL sketches union.

Public background: Greenwald–Khanna (2001), KLL (Karnin/Lang/Liberty
2016), t-digest (Dunning). This implements the simplest member of the
family with a provable bound — the EQUI-RANK summary:

* shard summary: sort the shard's n_i values, keep m points at ranks
  floor((j+0.5)·n_i/m) with weight n_i/m each (shards with n_i <= m keep
  everything exactly, weight 1). Each point stands in for at most
  n_i/(2m) ranks on either side.
* merge: concatenate all shards' weighted points, sort by value, walk
  the cumulative weight to the target rank q·N. Weights are exact, so
  merging adds NO error; total rank error <= Σ n_i/(2m) = N/(2m)
  (m=128 → 0.4% of ranks).

Spark wiring: shard assignment is a DETERMINISTIC column expression
(pmod of a key hash), not physical partitioning — the sketch is
reproducible run-to-run regardless of task scheduling. Both phases are
``applyInPandas`` (Arrow-batched); the partial phase shuffles raw values
once within each (group, shard), the merge phase shuffles only
m·n_shards weighted points per group. Per-task memory is bounded by the
shard size, which the shard count controls.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def _shard_summary(values: np.ndarray, m: int) -> tuple[int, np.ndarray, np.ndarray]:
    v = values.astype(np.float64)
    # SQL percentile/quantile_cont semantics: NULLs are ignored and do
    # not count toward N (review r8 — NaN would sort last, poisoning
    # high quantiles and rank-shifting the rest)
    v = np.sort(v[~np.isnan(v)])
    n = len(v)
    if n <= m:
        return n, v, np.ones(n, dtype=np.float64)
    idx = np.floor((np.arange(m) + 0.5) * n / m).astype(np.int64)
    return n, v[idx], np.full(m, n / m, dtype=np.float64)


def _merge_estimate(
    vals: np.ndarray, wts: np.ndarray, total_n: float, qs: tuple[float, ...]
) -> list[float]:
    order = np.argsort(vals, kind="stable")
    v, w = vals[order], wts[order]
    cum = np.cumsum(w)
    out = []
    for q in qs:
        i = int(np.searchsorted(cum, q * total_n, side="left"))
        out.append(float(v[min(i, len(v) - 1)]))
    return out


def quantile_partials(
    df: DataFrame,
    group_col: str,
    value_col: str,
    shard_col: Column,
    m: int = 128,
) -> DataFrame:
    """(g, n, vals, wts) — the mergeable per-(group, shard) equi-rank
    summaries, exposed as a standalone phase (r11) so a streaming
    pipeline can persist each micro-batch's summaries as artifacts and
    merge at drain (d7c), exactly as the batch path composes them.
    ``shard_col`` must be a deterministic expression over the row so the
    sketch is reproducible regardless of physical partitioning; in the
    streaming form the micro-batch is an additional implicit shard,
    which changes NOTHING about the bound (Σ n_i/(2m) over whatever the
    split is)."""
    # group column keeps its own type through both phases (review r8:
    # a hardcoded string schema broke int/bigint group keys)
    gtype = df.schema[group_col].dataType.simpleString()
    sharded = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("double").alias("v"),
        shard_col.alias("_shard"),
    )

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        n, pts, wts = _shard_summary(pdf["v"].to_numpy(), m)
        return pd.DataFrame(
            {
                "g": [pdf["g"].iloc[0]],
                "n": [n],
                "vals": [list(pts)],
                "wts": [list(wts)],
            }
        )

    return sharded.groupBy("g", "_shard").applyInPandas(
        partial, f"g {gtype}, n long, vals array<double>, wts array<double>"
    )


def quantile_merge(
    partials: DataFrame,
    group_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """(group, est_p{q}...) — weighted cumulative-rank walk over
    concatenated summaries. Weights are exact, so merging adds NO error;
    works identically over live partials and re-read parquet artifacts
    (the d7c streaming path)."""
    est_cols = [f"est_p{int(round(q * 100))}" for q in qs]
    gtype = partials.schema["g"].dataType.simpleString()

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = np.concatenate([np.asarray(x) for x in pdf["vals"]])
        wts = np.concatenate([np.asarray(x) for x in pdf["wts"]])
        row = {"g": [pdf["g"].iloc[0]]}
        if len(vals) == 0:  # all values NULL -> NULL quantiles (SQL)
            row.update({c: [None] for c in est_cols})
            return pd.DataFrame(row)
        ests = _merge_estimate(vals, wts, float(pdf["n"].sum()), qs)
        row.update({c: [round(e, 6)] for c, e in zip(est_cols, ests)})
        return pd.DataFrame(row)

    merged = partials.groupBy("g").applyInPandas(
        merge, f"g {gtype}, " + ", ".join(f"{c} double" for c in est_cols)
    )
    return merged.withColumnRenamed("g", group_col)


def sketch_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    shard_col: Column,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    m: int = 128,
) -> DataFrame:
    """(group, est_p{q}...) per-group quantile estimates from mergeable
    per-(group, shard) summaries — the single-pass composition of
    ``quantile_partials`` + ``quantile_merge`` (one body each since r11;
    the streaming entry d7c runs the same two phases with a parquet
    artifact store between them). Rank error bound: N/(2m) per group."""
    return quantile_merge(
        quantile_partials(df, group_col, value_col, shard_col, m=m),
        group_col,
        qs=qs,
    )
