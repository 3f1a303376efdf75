"""Distributed PCA / whitening over embedding columns.

The classic scalable decomposition (public: every distributed ML text;
Spark MLlib's RowMatrix.computePrincipalComponents uses the same shape):
the d×d covariance of an n×d matrix is a SUM of per-partition Gram
contributions, so one Arrow-batched pass reduces the corpus to
``n_partitions`` artifact rows of (count, sum-vector, upper-tri Gram) —
for d=64 that is 2144 doubles per partition whatever the row count —
and the eigendecomposition of the resulting 64×64 matrix is driver-side
numpy (``eigh``), microseconds. At 100 TB: the corpus is scanned ONCE,
nothing shuffles but the fixed-width partials, and the driver holds
O(partitions·d²) — the same bounded-artifact discipline as the centroid
and codebook tables (similarity.py).

Why it belongs in the LLM-pipeline toolbox: PCA-whitening embeddings
before cosine comparison is standard practice for SemDeDup-style
pipelines and retrieval indexes, and the top-k projection IS the
exact counterpart of i16's random projection (Johnson–Lindenstrauss)
when you can afford a data-dependent basis.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def gram_partials(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """One row per partition: (n, s[dim], g[dim*(dim+1)/2]) — counts,
    column sums, and the upper triangle of Xᵀ·X for the partition's
    rows. Sums are float64 numpy matmuls (deterministic within a
    partition; partition contents are fixed by the file layout)."""
    iu = np.triu_indices(dim)

    def part(batches):
        n = 0
        s = np.zeros(dim)
        g = np.zeros((dim, dim))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            n += len(M)
            s += M.sum(axis=0)
            g += M.T @ M
        if n == 0:
            return
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "g": [g[iu].tolist()]}
        )

    return df.select(vec_col).mapInPandas(
        part, "n long, s array<double>, g array<double>"
    )


def covariance_from_partials(partials_rows, dim: int) -> tuple[int, np.ndarray]:
    """(n, dim×dim population covariance) from collected partial rows —
    merged in partition order (bounded driver work: rows × d²)."""
    iu = np.triu_indices(dim)
    n = 0
    s = np.zeros(dim)
    g = np.zeros((dim, dim))
    for r in partials_rows:
        n += r["n"]
        s += np.asarray(r["s"])
        tri = np.zeros((dim, dim))
        tri[iu] = np.asarray(r["g"])
        g += tri
    g = g + np.triu(g, 1).T  # mirror the upper triangle
    mu = s / n
    cov = g / n - np.outer(mu, mu)
    return n, cov


def pca_components(cov: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Top-k (eigenvalues desc, components as rows) via numpy eigh —
    symmetric, deterministic for a given matrix. Component sign is fixed
    by convention (largest-|coordinate| entry made positive) so results
    are reproducible across runs and platforms."""
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    vals = w[order]
    comps = v[:, order].T.copy()
    for c in comps:
        j = int(np.argmax(np.abs(c)))
        if c[j] < 0:
            c *= -1.0
    return vals, comps


def project(df: DataFrame, comps: np.ndarray, vec_col: str, out_col: str) -> DataFrame:
    """Append the k-dim projection — one Arrow matmul per batch, the
    same shape as assign_cells; the (k×d) component matrix rides in the
    closure (k·d doubles)."""
    C = np.asarray(comps, dtype=np.float64)

    @F.pandas_udf("array<double>")
    def _proj(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        M = np.array(vs.tolist(), dtype=np.float64)
        P = M @ C.T
        return pd.Series(list(P))

    return df.withColumn(out_col, _proj(F.col(vec_col)))
