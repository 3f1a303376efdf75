"""Similarity search over embedding columns (SURVEY §2.I4–I6, §4).

Tiers, chosen by query-batch size and corpus scale:

* ``brute_topk`` — one query vector: broadcast it, score with codegen
  HOFs, reduce with TakeOrdered. No shuffle of the corpus.
* ``block_topk`` — a batch of Q query vectors: broadcast the Q×d matrix,
  ``mapInPandas`` computes a per-partition NumPy matmul (corpus block ×
  Qᵀ) and emits only each partition's local top-k per query; a final
  window trims to global top-k. Data moved after scoring: k × Q ×
  n_partitions rows — independent of corpus size.
* ``block_topk_joined`` — query sets too large for a closure: cogrouped
  (corpus block × query bucket) grid cells, each one NumPy matmul.
* ``lsh_bucketed_topk`` — random-hyperplane LSH prefilter: score only
  candidates whose sign-sketch matches the query in ≥ b bands, then
  exact re-rank. Trades recall for touching a fraction of the corpus.
* ``ivf_*`` — the stored-index tier: seeded-k-means cells materialized
  as cluster-partitioned parquet (``ivf_build``/``ivf_build_cached``),
  probes pruned to n_probe cells at the scan (``ivf_probe``,
  ``ivf_probe_batch``, ``ivf_topk``). PQ/residual-PQ code tables build
  on these in queries/llm_ops.py (i13e–i13i).
* ``embedding_neardup_pairs`` / ``semdedup`` — all-pairs-above-threshold
  via blocked/clustered cell matmuls, exact-fold re-score.

All paths avoid driver-side loops and never materialize the O(n·Q) score
matrix outside a partition.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve here

from pyspark.sql import DataFrame, Window, functions as F


_EXPORT_REAP_GRACE_S = 600.0  # export_behind_pointer's in-flight shield


def _unit_rows(M):
    """Row-normalize a float64 matrix for cosine matmuls — ONE
    definition shared by every block-scoring site (block_topk,
    block_topk_joined, embedding_neardup_pairs, semdedup) so a future
    policy change (e.g. zero-norm handling) cannot drift between them,
    the same reasoning that keeps _sq_dists shared."""
    import numpy as np

    return M / np.linalg.norm(M, axis=1, keepdims=True)


def _half_up6(A):
    """Round a float64 array to 6 places with HALF_UP (away-from-zero)
    tie-breaking — the SAME rule Spark's ``F.round`` applies in the
    final trim (ADVICE r8: ``np.round`` is round-half-to-EVEN, so a sim
    exactly on a 1e-6 half-ulp boundary could land in different tie
    classes at the local cut vs the global one and drop the lowest-id
    tie member the oracle keeps). Sign-aware because cosine sims can be
    negative and Java's ROUND_HALF_UP rounds ties away from zero.

    The vectorized floor formula itself drifts from Spark within a
    float-ulp of a half boundary (Spark rounds the SHORTEST-DECIMAL repr
    via BigDecimal.valueOf, the formula rounds the binary product), so
    the rare near-boundary elements are corrected with an exact Decimal
    quantize over repr() — Python's repr is the same shortest-decimal
    form, making the correction bit-for-bit Spark parity. Pinned against
    F.round in tests/test_operators.py::test_half_up6_matches_spark."""
    import numpy as np

    K = A * 1e6
    out = np.where(A >= 0, np.floor(K + 0.5), -np.floor(-K + 0.5)) / 1e6
    near = np.abs(np.abs(K) - np.floor(np.abs(K)) - 0.5) < 1e-7
    if near.any():
        from decimal import ROUND_HALF_UP, Decimal

        q6 = Decimal("0.000001")
        flat, o = A.ravel(), out.ravel()
        for i in np.flatnonzero(near.ravel()):
            o[i] = float(
                Decimal(repr(float(flat[i]))).quantize(
                    q6, rounding=ROUND_HALF_UP
                )
            )
    return out


def dot_expr(x, y):
    """float64 dot product, sequential left-fold (codegen HOFs)."""
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_expr(a, b):
    """Exact float64 cosine via codegen HOFs (no Python)."""
    return dot_expr(a, b) / (F.sqrt(dot_expr(a, a)) * F.sqrt(dot_expr(b, b)))


def brute_topk(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by cosine against one literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        corpus.select(
            id_col, F.round(cosine_expr(q, F.col(vec_col)), 6).alias("sim")
        )
        .orderBy(F.col("sim").desc(), id_col)
        .limit(k)
    )


def block_topk(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch top-k: per-partition NumPy matmul + global window trim.

    ``queries`` is [(query_id, vector)]; result: (query_id, vec_id, sim).
    """
    import numpy as np
    import pandas as pd

    q_ids = np.array([q[0] for q in queries], dtype=np.int64)
    q_mat = np.array([q[1] for q in queries], dtype=np.float64)
    q_norm = _unit_rows(q_mat)

    schema = "query_id long, vec_id long, sim double"

    def score_block(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            sims = _unit_rows(mat) @ q_norm.T  # |block| × Q
            ids = pdf[id_col].to_numpy()
            # local top-k per query — only k·Q rows leave the partition.
            # Selection mirrors the FINAL ordering rule (rounded sim
            # desc, id asc — the block_topk_joined discipline): plain
            # argpartition breaks exact ties by position and can drop
            # the lowest-id member of a tie class the oracle keeps
            top = min(k, len(pdf))
            sims_r = _half_up6(sims)
            id_cols, sim_cols = [], []
            for j in range(sims.shape[1]):
                order = np.lexsort((ids, -sims_r[:, j]))[:top]
                id_cols.append(ids[order])
                sim_cols.append(sims[order, j])
            out = {
                "query_id": np.repeat(q_ids, top),
                "vec_id": np.concatenate(id_cols),
                "sim": np.concatenate(sim_cols),
            }
            yield pd.DataFrame(out)

    scored = corpus.select(id_col, vec_col).mapInPandas(score_block, schema)
    # round BEFORE the trim window so the global ordering matches
    # brute_topk's (rounded sim desc, id asc) — ordering by the raw sim
    # could keep a different member of a rounded tie class at the k cut
    rounded = scored.select(
        "query_id", "vec_id", F.round("sim", 6).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "vec_id")
    return (
        rounded.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def block_topk_joined(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_blocks: int = 8,
    query_buckets: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
    margin: int = 4,
) -> DataFrame:
    """Batch top-k for query sets too large to ship in a closure.

    ``block_topk`` broadcasts the Q×d query matrix inside the UDF
    closure — fine to ~10⁵ queries, a memory wall past that (SCALE.md
    trade-off). Here queries are a DATAFRAME: corpus rows hash into
    ``corpus_blocks`` blocks, queries into ``query_buckets`` buckets,
    and every (block, bucket) grid cell is scored independently by a
    COGROUPED ``applyInPandas`` NumPy matmul that emits the cell-local
    top-(k+margin) candidates per query WITH their exact sequential-
    left-fold cosine computed in-cell (see ``cell_score``; r16 removed
    the old HOF re-rank attach joins). Only a final per-query window
    trim keeps the global top-k; the margin rows absorb matmul-vs-fold
    rounding risk at selection boundaries.

    Shuffle: corpus × query_buckets + queries × corpus_blocks rows of
    fixed width — pick the grid so each cell's (|corpus|/CB)·d block
    fits an executor, the same sizing rule as embedding_neardup_pairs.
    No driver-side query loop, no closure capture of query vectors.
    """
    import numpy as np
    import pandas as pd

    CB, QB = int(corpus_blocks), int(query_buckets)
    take = int(k) + int(margin)

    c = corpus.select(
        F.col(id_col).alias("_cid"),
        F.col(vec_col).alias("_cvec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(CB)).cast("int").alias("cb"),
    ).withColumn("qb", F.explode(F.sequence(F.lit(0), F.lit(QB - 1))))
    q = queries.select(
        F.col(qid_col).alias("_qid"),
        F.col(qvec_col).alias("_qvec"),
        F.pmod(F.xxhash64(F.col(qid_col)), F.lit(QB)).cast("int").alias("qb"),
    ).withColumn("cb", F.explode(F.sequence(F.lit(0), F.lit(CB - 1))))

    def cell_score(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        """Candidates AND their exact re-score inside the cell (r16,
        guide §8): the cell holds both raw vector sides, so the
        sequential-left-fold cosine (``np.cumsum`` row fold — the same
        IEEE operation sequence as ``cosine_expr``) is computed here for
        the selected candidates and emitted with them. The old shape
        shuffled every candidate through TWO joins back to corpus and
        queries to re-attach vectors the cell already held; only the
        global per-query window trim remains outside."""
        empty = pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                "vec_id": pd.Series([], dtype="int64"),
                "sim": pd.Series([], dtype="float64"),
            }
        )
        if len(left) == 0 or len(right) == 0:
            return empty
        M_raw = np.array(left["_cvec"].tolist(), dtype=np.float64)
        Q_raw = np.array(right["_qvec"].tolist(), dtype=np.float64)
        sims = _unit_rows(M_raw) @ _unit_rows(Q_raw).T  # |block| × |bucket|
        t = min(take, len(M_raw))
        cids = left["_cid"].to_numpy()
        qids = right["_qid"].to_numpy()
        # candidate selection mirrors the FINAL ordering rule — rounded
        # sim desc, id asc — so every member of a rounded-sim tie class
        # the oracle could keep survives the cell (np.argpartition breaks
        # exact ties by position, which can exclude the lowest-id dups);
        # the margin then only has to absorb matmul-vs-fold rounding at
        # class boundaries, not tie-class membership
        sims_r = _half_up6(sims)
        sq_c = np.cumsum(M_raw * M_raw, axis=1)[:, -1]
        sq_q = np.cumsum(Q_raw * Q_raw, axis=1)[:, -1]
        id_cols, sim_cols = [], []
        for j in range(sims.shape[1]):
            sel = np.lexsort((cids, -sims_r[:, j]))[:t]
            # exact left-fold cosine, denominator in cosine_expr's
            # sqrt(q·q)*sqrt(c·c) order (multiplies commute bitwise)
            dots = np.cumsum(M_raw[sel] * Q_raw[j][None, :], axis=1)[:, -1]
            id_cols.append(cids[sel])
            sim_cols.append(dots / (np.sqrt(sq_q[j]) * np.sqrt(sq_c[sel])))
        return pd.DataFrame(
            {
                "query_id": np.repeat(qids, t),
                "vec_id": np.concatenate(id_cols),
                "sim": np.concatenate(sim_cols),
            }
        )

    cand = (
        c.groupBy("cb", "qb")
        .cogroup(q.groupBy("cb", "qb"))
        .applyInPandas(cell_score, "query_id long, vec_id long, sim double")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "vec_id")
    return (
        cand.select("query_id", "vec_id", F.round("sim", 6).alias("sim"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """All (a, b) pairs with exact cosine ≥ threshold (a < b).

    Candidate generation is a fully-distributed BLOCKED SELF-JOIN — no
    driver-side materialization of the corpus anywhere:

    * each vector hashes into one of ``n_blocks`` blocks;
    * every unordered block pair (i ≤ j) forms a grid cell; a vector in
      block b is replicated to the cells where it plays the left role
      (b, j≥b) and the right role (i≤b, b) — ≤ n_blocks+1 copies per row,
      the standard O(B·n) shuffle for exact all-pairs;
    * ``applyInPandas`` per grid cell runs one NumPy matmul of
      (|n|/B)×(|n|/B) and emits only id pairs above ``threshold − ε`` —
      vectors never leave the cell.

    Each pair lands in exactly one cell (the (min,max) of its blocks), so
    no dedup shuffle is needed. Surviving pairs are RE-SCORED with the
    exact left-fold HOF expression so emitted values are bit-identical to
    the declared oracle formulation (the matmul's different accumulation
    order never reaches the output; ε kills boundary risk).

    Scale: pick n_blocks so (n/B)·d·8 B fits an executor (cell memory is
    2·(n/B) vectors); shuffle volume grows as B·n rows of fixed width.
    Past ~10⁸ vectors, front with lsh_bucketed_topk's sign-sketch to
    prune cells before the grid.
    """
    import numpy as np
    import pandas as pd

    eps = 1e-6
    B = int(n_blocks)
    base = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(B)).cast("int").alias("_blk"),
    )
    left = base.select(
        "_id",
        "_vec",
        F.lit(0).alias("_role"),
        F.col("_blk").alias("gi"),
        F.explode(F.sequence(F.col("_blk"), F.lit(B - 1))).alias("gj"),
    )
    right = base.select(
        "_id",
        "_vec",
        F.lit(1).alias("_role"),
        F.explode(F.sequence(F.lit(0), F.col("_blk"))).alias("gi"),
        F.col("_blk").alias("gj"),
    )
    tagged = left.unionByName(right)

    def cell_pairs(key, pdf):
        """Candidates AND the exact verdict inside the cell (r16, guide
        §8): both role copies carry their raw vectors, so the exact
        sequential-left-fold cosine (``np.cumsum`` row fold — the same
        IEEE operation sequence as ``cosine_expr``; elementwise products
        commute bitwise, so the (min,max) id normalization cannot change
        the value) runs here on the ε-margin candidates. The old shape
        shuffled every candidate pair through TWO joins back to the
        corpus to re-attach vectors the cell already held."""
        gi, gj = int(key[0]), int(key[1])
        lmask = pdf["_role"].to_numpy() == 0
        lpdf, rpdf = pdf[lmask], pdf[~lmask]
        empty = pd.DataFrame(
            {
                "ia": pd.Series([], dtype="int64"),
                "ib": pd.Series([], dtype="int64"),
                "sim": pd.Series([], dtype="float64"),
            }
        )
        if len(lpdf) == 0 or len(rpdf) == 0:
            return empty
        ml_raw = np.array(lpdf["_vec"].tolist(), dtype=np.float64)
        mr_raw = np.array(rpdf["_vec"].tolist(), dtype=np.float64)
        sims = _unit_rows(ml_raw) @ _unit_rows(mr_raw).T
        li = lpdf["_id"].to_numpy()
        rj = rpdf["_id"].to_numpy()
        ii, jj = np.nonzero(sims >= threshold - eps)
        ia, ib = li[ii], rj[jj]
        if gi == gj:
            # diagonal cell: L and R are the same set — upper triangle only
            keep = ia < ib
        else:
            # cross cell: each unordered pair appears exactly once (one id
            # per role) — normalize to (min, max); id order ≠ block order
            keep = np.ones(len(ia), dtype=bool)
            ia, ib = np.minimum(ia, ib), np.maximum(ia, ib)
        ii, jj, ia, ib = ii[keep], jj[keep], ia[keep], ib[keep]
        if not len(ii):
            return empty
        # exact left-fold cosine on the candidates; threshold on the RAW
        # fold value, exactly as the declared oracle's WHERE does
        # (review r8: filtering the rounded value admitted pairs at
        # 0.4499996 that round up across the threshold)
        dots = np.cumsum(ml_raw[ii] * mr_raw[jj], axis=1)[:, -1]
        sql_ = np.cumsum(ml_raw * ml_raw, axis=1)[:, -1]
        sqr_ = np.cumsum(mr_raw * mr_raw, axis=1)[:, -1]
        sim = dots / (np.sqrt(sql_[ii]) * np.sqrt(sqr_[jj]))
        real = sim >= threshold
        return pd.DataFrame({"ia": ia[real], "ib": ib[real], "sim": sim[real]})

    pairs = tagged.groupBy("gi", "gj").applyInPandas(
        cell_pairs, "ia long, ib long, sim double"
    )
    # the output column alone is rounded (the JVM F.round keeps rounding
    # semantics identical to every other declared surface)
    return pairs.select(
        F.col("ia").alias("vec_a"),
        F.col("ib").alias("vec_b"),
        F.round("sim", 6).alias("cos_sim"),
    )


# Bumped whenever the quantizer algorithm changes, and folded into
# ivf_build_cached's directory key: a cached index built by an older
# quantizer must never be served to a probe whose in-memory twin would
# cluster differently (i13b's all-agree contract).
QUANTIZER_VERSION = "q2"


def _sq_dists(X, C):
    """n×k squared euclidean distances: ‖x‖² − 2x·c + ‖c‖² (one matmul).

    The SAME formula (and therefore the same float rounding) is used for
    training iterations and for corpus cell assignment, so a vector that
    was in the training sample lands in the cell its last Lloyd
    iteration chose — assignment is consistent everywhere it happens.
    """
    import numpy as np

    return (
        (X * X).sum(axis=1)[:, None]
        - 2.0 * (X @ C.T)
        + (C * C).sum(axis=1)[None, :]
    )


def train_quantizer(
    corpus: DataFrame,
    n_clusters: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 32768,
    max_iter: int = 25,
):
    """Seeded k-means coarse quantizer trained on a BOUNDED sample.

    This is the standard IVF recipe (FAISS trains its coarse quantizer
    on a fixed-size sample, not the corpus): training cost is
    independent of corpus size. The previous implementation ran
    pyspark.ml KMeans over the full corpus — every Lloyd iteration a full
    distributed pass, i.e. ~25 scans of 100 TB to place 16 centroids.
    Here the driver sees ``sample_size × dim`` float64s (32k × 64 ≈
    16 MB) and nothing else; the cluster does ONE TakeOrdered pass.

    Sample selection is deterministic rank-by-hash: order by
    ``xxhash64(id, seed)`` and take the first ``sample_size`` rows — a
    uniform seeded sample computed as a per-partition top-k merge (no
    shuffle of the corpus, no dependence on partitioning or row order).

    Training is k-means++ init (Arthur & Vassilvitskii 2007) + Lloyd,
    all under one ``numpy.random.RandomState(seed)`` — bit-deterministic
    for a given dataset/seed/k, which is what lets a rebuilt index agree
    with an in-memory run (tests/test_operators.py i13b all-agree).
    Returns the (n_clusters × dim) float64 centroid matrix.
    """
    import numpy as np

    rows = (
        corpus.select(
            F.col(vec_col).alias("_v"),
            F.xxhash64(F.col(id_col), F.lit(seed)).alias("_h"),
            F.col(id_col).alias("_id"),
        )
        .orderBy("_h", "_id")
        .limit(int(sample_size))
        .select("_v")
        .collect()
    )
    if not rows:
        raise ValueError(
            "train_quantizer: corpus is empty — no vectors to train on "
            f"(id_col={id_col!r}, vec_col={vec_col!r})"
        )
    X = np.array([r["_v"] for r in rows], dtype=np.float64)
    n = len(X)
    k = min(n_clusters, n)
    rng = np.random.RandomState(seed)

    centers = np.empty((k, X.shape[1]), dtype=np.float64)
    centers[0] = X[int(rng.randint(n))]
    d2 = ((X - centers[0]) ** 2).sum(axis=1)
    for i in range(1, k):
        total = d2.sum()
        if total > 0:
            nxt = int(rng.choice(n, p=d2 / total))
        else:  # all points coincide with a chosen center
            nxt = int(rng.randint(n))
        centers[i] = X[nxt]
        d2 = np.minimum(d2, ((X - centers[i]) ** 2).sum(axis=1))

    for _ in range(max_iter):
        d = _sq_dists(X, centers)
        lab = np.argmin(d, axis=1)
        new = centers.copy()
        empty = []
        for c in range(k):
            m = lab == c
            if m.any():
                new[c] = X[m].mean(axis=0)
            else:
                empty.append(c)
        if empty:
            # deterministic reseed: hand each empty cluster its own point,
            # farthest-from-current-center first (distinct points, lowest
            # cluster id gets the farthest)
            order = np.argsort(-d[np.arange(n), lab], kind="stable")
            for j, c in enumerate(empty):
                new[c] = X[int(order[j % n])]
        if np.array_equal(new, centers):
            break
        centers = new
    return centers


def assign_cells(
    df: DataFrame,
    centers,
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Add the nearest-centroid cell id in ONE Arrow-batched map pass.

    The centroid matrix (k × dim — bytes) ships in the UDF closure; each
    batch is an argmin over the same ‖x‖²−2x·c+‖c‖² matmul the trainer
    used, ties → lowest cell id (np.argmin first-min). No shuffle, no
    per-row Python: this is the declared pandas-UDF slow path used only
    where Spark has no built-in (nearest-centroid), and it is a single
    matmul per Arrow batch.
    """
    import numpy as np

    C = np.asarray(centers, dtype=np.float64)

    @F.pandas_udf("int")
    def _assign(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        M = np.array(vs.tolist(), dtype=np.float64)
        # the SHARED formula — never an inline copy, so trainer and
        # assigner can only ever round identically (i13b's all-agree
        # contract depends on that bit-consistency)
        d = _sq_dists(M, C)
        return pd.Series(np.argmin(d, axis=1).astype("int32"))

    return df.withColumn(out_col, _assign(F.col(vec_col)))


def _probe_cells(centers_rows, query_vec, n_probe):
    """Pick the n_probe cells nearest the query by SEQUENTIAL float64
    fold with (dist, cell) ordering — bit-identical to the list_reduce
    fold the DuckDB oracle (i13c) runs over the exported centroid table,
    so both engines pick the same probe cells even for near-equidistant
    centroids. ``centers_rows`` is [(cell, centroid_list), ...]."""
    scored = []
    for cell, cent in centers_rows:
        d2 = 0.0
        for c, x in zip(cent, query_vec):
            d2 += (float(c) - float(x)) * (float(c) - float(x))
        scored.append((d2, int(cell)))
    return [cell for _d, cell in sorted(scored)[:n_probe]]


def ivf_topk(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: coarse k-means quantizer, probe the
    ``n_probe`` cells nearest the query, exact re-rank inside them.

    The quantizer is sample-trained driver-side (``train_quantizer``),
    assignment is one Arrow pass; the probed-cell filter prunes the scan
    to ~n_probe/n_clusters of the corpus. At scale the assignment is
    precomputed once and the corpus is stored partitioned by cell id
    (``ivf_build``), turning the probe into partition pruning at the
    parquet scan.
    """
    centers = train_quantizer(
        corpus, n_clusters=n_clusters, seed=seed, id_col=id_col, vec_col=vec_col
    )
    probe = _probe_cells(
        [(i, list(c)) for i, c in enumerate(centers)], query_vec, n_probe
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assign_cells(corpus, centers, vec_col=vec_col, out_col="_cell")
        .filter(F.col("_cell").isin(probe))
        .select(id_col, F.round(cosine_expr(q, F.col(vec_col)), 6).alias("sim"))
        .orderBy(F.col("sim").desc(), id_col)
        .limit(k)
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    planes: int = 32,
    min_band_matches: int = 1,
    bands: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH prefilter + exact re-rank (approximate).

    Deterministic planes from a seeded generator; candidates = vectors
    sharing ≥ min_band_matches sign-sketch bands with the query.
    """
    import numpy as np

    if planes <= 0 or bands <= 0 or planes % bands != 0:
        # review r8: planes % bands != 0 silently discarded leftover
        # hyperplanes, and bands > planes made every band the empty
        # string (trivially matching -> the prefilter passed everything)
        raise ValueError(
            f"planes ({planes}) must be a positive multiple of bands "
            f"({bands})"
        )
    rng = np.random.RandomState(seed)
    dim = len(query_vec)
    h = rng.standard_normal((planes, dim))
    per_band = planes // bands
    n_bands = int(bands)

    def band_strings(bits):  # n × planes 0/1 -> n × n_bands "01..." keys
        chars = bits.astype("U1")
        cols = []
        for b in range(n_bands):
            block = chars[:, b * per_band : (b + 1) * per_band]
            s = block[:, 0]
            for c in range(1, per_band):
                s = np.char.add(s, block[:, c])
            cols.append(s)
        return np.stack(cols, axis=1)

    # sign sketch in ONE Arrow pass: a batch × planes matmul replaces
    # `planes` interpreted HOF fold projections per row; band-key
    # construction is np.char column folds (review r8: the previous
    # per-bit str(int(x)) join cost O(batch × planes) interpreted
    # Python after the vectorized matmul)
    @F.pandas_udf("array<string>")
    def bands_udf(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="object")
        M = np.array(vs.tolist(), dtype=np.float64)
        S = (M @ h.T >= 0).astype(np.int8)  # |batch| × planes
        return pd.Series([list(r) for r in band_strings(S)])

    sketched = corpus.select(id_col, vec_col, bands_udf(F.col(vec_col)).alias("_bands"))

    qv = np.array(query_vec, dtype=np.float64)
    q_bits = ((h @ qv) >= 0).astype(np.int8)
    q_bands = list(band_strings(q_bits[None, :])[0])
    match_count = sum(
        F.when(F.col("_bands")[b] == q_bands[b], 1).otherwise(0)
        for b in range(n_bands)
    )
    candidates = sketched.filter(match_count >= min_band_matches)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        candidates.select(
            id_col, F.round(cosine_expr(q, F.col(vec_col)), 6).alias("sim")
        )
        .orderBy(F.col("sim").desc(), id_col)
        .limit(k)
    )


def semdedup(
    corpus: DataFrame,
    threshold: float = 0.45,
    n_clusters: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    cluster embeddings with a seeded k-means coarse quantizer, compare
    EXACT cosine only within a cluster, and drop every vector that has a
    lower-id neighbor with cosine >= threshold (deterministic min-id
    keep rule; ``rep_id`` is that neighbor and may itself be dropped —
    chains resolve to the component's minimum id transitively).

    Scale shape: the k-means assignment is one pass; candidate pairs
    come from ONE NumPy matmul per cell (applyInPandas grouped by cell —
    never corpus × corpus, and never a per-pair HOF fold: 10⁵ pair folds
    cost more than 16 small matmuls), with an ε-margin so the matmul's
    accumulation order cannot lose a boundary pair. Survivors are
    RE-SCORED with the exact left-fold cosine, which alone decides
    keep/drop — emitted semantics are bit-identical to the i14b oracle.
    The cluster count bounds both the quadratic term and per-cell memory
    exactly as in the paper: cells ~ sqrt(N) at 10⁹ vectors, each cell's
    vectors fitting one executor.

    Returns one row per corpus vector: (id, cell, keep, rep_id).
    """
    import numpy as np

    centers = train_quantizer(
        corpus, n_clusters=n_clusters, seed=seed, id_col=id_col, vec_col=vec_col
    )
    assigned = assign_cells(
        corpus.select(id_col, vec_col), centers, vec_col=vec_col, out_col="cell"
    )

    eps = 1e-6

    def cell_result(pdf):
        """Candidates, the exact-fold verdict, AND the final keep/rep
        projection, entirely within the cell (r16 moved the re-score
        in-cell; r17 moves the keep/rep projection in too): a vector's
        candidate neighbors are by construction in its own cell, so the
        cell holds everything needed to emit the operator's WHOLE output
        row — the old shape emitted only victims and shuffled the entire
        corpus id set through an assigned⟕dropped join (and, because
        assigned then had two consumers, paid an eager localCheckpoint
        barrier; both are gone, guide §2.4). The exact score is the SAME
        arithmetic as ``cosine_expr``'s sequential left-fold: elementwise
        float64 products then ``np.cumsum`` along the row (cumsum IS the
        left fold, and the fold's 0.0 seed is exact), so emitted
        keep/drop verdicts stay bit-identical to the oracle."""
        ids = pdf[id_col].to_numpy()
        out_keep = pd.Series(True, index=range(len(ids)), dtype="bool")
        rep = pd.array([None] * len(ids), dtype="Int64")
        if len(pdf) >= 2:
            M = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            sims = _unit_rows(M) @ _unit_rows(M).T
            ii, jj = np.nonzero(sims >= threshold - eps)
            lower = ids[ii] < ids[jj]
            ii, jj = ii[lower], jj[lower]
            if len(ii):
                # exact left-fold cosine on the candidates only (ε-margin
                # above guarantees no boundary pair was lost to matmul
                # accumulation)
                dots = np.cumsum(M[ii] * M[jj], axis=1)[:, -1]
                sq = np.cumsum(M * M, axis=1)[:, -1]
                cos = dots / (np.sqrt(sq[ii]) * np.sqrt(sq[jj]))
                real = cos >= threshold
                if real.any():
                    victims = (
                        pd.DataFrame({"j": jj[real], "ia": ids[ii][real]})
                        .groupby("j")["ia"]
                        .min()
                    )
                    out_keep[victims.index] = False
                    rep[victims.index] = victims.to_numpy()
        return pd.DataFrame(
            {
                id_col: ids,
                "cell": pdf["cell"].to_numpy(),
                "keep": out_keep,
                "rep_id": rep,
            }
        )

    return assigned.groupBy("cell").applyInPandas(
        lambda key, pdf: cell_result(pdf),
        f"{id_col} long, cell int, keep boolean, rep_id long",
    )


def data_fingerprint(path: str) -> str:
    """Content-identity digest for a dataset path: every file's relative
    path, size, and mtime_ns. Regenerating the data at the same path
    changes the fingerprint, so an index cache keyed on it can never
    silently serve stale data (a cache keyed on the *path string* can)."""
    import hashlib
    import os

    h = hashlib.sha256()
    if os.path.isfile(path):
        st = os.stat(path)
        h.update(f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}".encode())
    elif not os.path.isdir(path):
        # fail HERE, not later inside build(): a missing path would
        # otherwise fingerprint as the digest of empty input, and two
        # different missing sf_dirs would share a cache key (ADVICE r6)
        raise FileNotFoundError(f"data_fingerprint: no file or dir at {path}")
    else:
        for root, _dirs, files in sorted(os.walk(path)):
            for f in sorted(files):
                fp = os.path.join(root, f)
                st = os.stat(fp)
                rel = os.path.relpath(fp, path)
                h.update(f"{rel}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


def atomic_cached_build(cache_root, key, build, success_rel) -> str:
    """One rule for every on-disk cache this module keeps: build into a
    unique temp dir, ``os.rename`` into the keyed location so concurrent
    builders race benignly (first rename wins; losers discard their
    copy), and on rename failure only trust the winner if a COMPLETE
    artifact (``success_rel`` marker) is actually in place — otherwise
    (permissions, stale partial dir) deleting our good build would
    destroy the only complete copy (ADVICE r4). ``build(tmp_dir)`` must
    materialize the artifact into ``tmp_dir``."""
    import os
    import shutil
    import tempfile

    final = os.path.join(cache_root, key)
    done = os.path.join(final, success_rel)
    if os.path.exists(done):
        return final
    os.makedirs(cache_root, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="build-", dir=cache_root)
    try:
        build(tmp)
    except BaseException:
        # review r8: a failed build previously abandoned its partial
        # 'build-*' dir under cache_root forever (each retry of a flaky
        # job leaked another one)
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    try:
        os.rename(tmp, final)
    except OSError:
        if not os.path.exists(done):
            raise
        shutil.rmtree(tmp, ignore_errors=True)
    return final


def ivf_build_cached(
    corpus: DataFrame,
    cache_root: str,
    fingerprint: str,
    n_clusters: int = 16,
    seed: int = 42,
    corpus_tag: str = "all",
) -> str:
    """Build the IVF index under ``cache_root`` keyed by the DATA
    fingerprint (atomic install via ``atomic_cached_build``), reusing an
    existing complete build when present.

    ``corpus_tag`` names the corpus DEFINITION (e.g. which slice of the
    fingerprinted file the caller selected) and is part of the cache key:
    the file fingerprint alone cannot distinguish two different filters
    over the same file, and serving one filter's index to the other
    would be silently wrong. Callers building from a filtered corpus
    MUST pass a tag unique to that filter."""
    import os

    return atomic_cached_build(
        cache_root,
        f"{fingerprint}-k{n_clusters}-s{seed}-{corpus_tag}-{QUANTIZER_VERSION}",
        lambda tmp: ivf_build(corpus, tmp, n_clusters=n_clusters, seed=seed),
        os.path.join("vectors", "_SUCCESS"),
    )


def publish_index_pointer(index_path: str, pointer: str) -> str:
    """Atomically point ``pointer`` (a symlink) at ``index_path`` so a
    FIXED filesystem path always names the current complete index.

    This is what lets an external engine — the DuckDB oracle for
    i13c_ivf_probe_xengine — read exactly the index the Spark probe used
    without knowing its fingerprint-keyed location: symlink-into-temp +
    ``os.replace`` is atomic, so a reader never sees a half-updated
    pointer."""
    import os
    import tempfile

    parent = os.path.dirname(pointer) or "."
    os.makedirs(parent, exist_ok=True)
    fd, tmp = tempfile.mkstemp(prefix=".ptr-", dir=parent)
    os.close(fd)
    os.remove(tmp)  # mkstemp created a file; we need the free name
    os.symlink(index_path, tmp)
    os.replace(tmp, pointer)
    return pointer


def export_behind_pointer(pointer: str, write) -> str:
    """The per-run export ritual shared by the export-pointer oracles
    (d4b/d7b/i3h/d4c): make the pointer's parent, build a fresh temp
    export dir there via ``write(export_dir)``, atomically repoint, and
    delete the PREVIOUS export (review r8 — nothing referenced it once
    the pointer moved, and every run leaked one directory). Returns the
    export dir. (Fingerprint-CACHED exports use atomic_cached_build
    instead — this is for artifacts rebuilt every run.)"""
    import os
    import shutil
    import tempfile
    import time as _time

    base = os.path.dirname(pointer)
    os.makedirs(base, exist_ok=True)
    export = tempfile.mkdtemp(prefix="export-", dir=base)
    write(export)
    publish_index_pointer(export, pointer)
    # Reap orphans by SCAN, not by remembered-prev (ADVICE r8: two racing
    # runs each reaped only their own prev, so the losing run's export
    # leaked forever and an in-flight oracle read could be orphaned
    # mid-read). Every export-* dir under base that the pointer no
    # longer names is an orphan; keep the single NEWEST one as a grace
    # generation (covers a reader that resolved the pointer just before
    # the repoint) and delete the rest — racers' leaks converge to at
    # most one extra dir, cleaned by the next run.
    current = os.path.realpath(pointer)
    now = _time.time()
    orphans = []
    for d in os.listdir(base):
        p = os.path.join(base, d)
        if (
            d.startswith("export-")
            and os.path.isdir(p)
            and os.path.realpath(p) != current
        ):
            try:
                orphans.append((os.path.getmtime(p), p))
            except OSError:
                pass  # reaped concurrently between list and stat
    orphans.sort(reverse=True)
    # AGE GUARD (review r9): a racing run's not-yet-published export is
    # indistinguishable from an orphan by name, so never reap anything
    # younger than the grace age — in-flight write() phases finish in
    # seconds, and a reader that resolved the pointer just before this
    # repoint is covered by the same window. The newest orphan is kept
    # unconditionally (one-generation grace); older-than-grace leaks
    # from crashed runs still converge to at most one dir.
    for mtime, p in orphans[1:]:
        if now - mtime > _EXPORT_REAP_GRACE_S:
            shutil.rmtree(p, ignore_errors=True)
    return export


def ivf_build(
    corpus: DataFrame,
    path: str,
    n_clusters: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index as a CLUSTER-PARTITIONED parquet layout.

    Train the seeded k-means coarse quantizer once, assign every vector
    to its cell, and write the corpus partitioned by ``cell=`` dirs with
    the centroid table alongside (``_centroids/``, n_clusters tiny rows).
    This is ``ivf_topk``'s documented scale path made concrete: the
    assignment cost is paid once at build time, and probing becomes
    PARTITION PRUNING at the parquet scan — a query touches
    n_probe/n_clusters of the files, the property that matters when the
    corpus is 10⁹ vectors and the index lives on object storage.
    """
    centers = train_quantizer(
        corpus, n_clusters=n_clusters, seed=seed, id_col=id_col, vec_col=vec_col
    )
    assigned = assign_cells(
        corpus.select(id_col, vec_col), centers, vec_col=vec_col, out_col="cell"
    )
    assigned.write.partitionBy("cell").mode("overwrite").parquet(f"{path}/vectors")

    spark = corpus.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "cell int, centroid array<double>",
    )
    centroids.coalesce(1).write.mode("overwrite").parquet(f"{path}/_centroids")


def ivf_append(
    spark,
    path: str,
    batch: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append a batch of new vectors to an ALREADY-BUILT IVF index
    without rebuilding it — the index-maintenance half of the ANN story
    (standard FAISS practice: the coarse quantizer is trained once and
    FROZEN; ``add`` only assigns and stores).

    Reads the index's own ``_centroids`` table (n_clusters tiny rows),
    assigns each batch vector with the SAME shared ``_sq_dists`` argmin
    the builder used (bit-identical cell choice), and appends the
    assigned rows into the existing ``cell=`` partition dirs — one map
    pass plus a partitioned write of JUST the batch. The existing corpus
    is never read, shuffled, or rewritten: at 100 TB a daily ingest
    costs O(batch), not O(index). Probing the appended index is
    indistinguishable from probing a same-centroid index of the full
    corpus (pinned by i13j's agree flag and
    tests/test_operators.py::test_ivf_append_equals_joint_build).

    Callers appending into a fingerprint-CACHED index must do so inside
    the ``atomic_cached_build`` build function (i13j does), never into
    an installed cache entry another query may be reading.
    """
    import numpy as np

    cents = spark.read.parquet(f"{path}/_centroids").orderBy("cell").collect()
    centers = np.array([r["centroid"] for r in cents], dtype=np.float64)
    assigned = assign_cells(
        batch.select(id_col, vec_col), centers, vec_col=vec_col, out_col="cell"
    )
    assigned.write.partitionBy("cell").mode("append").parquet(f"{path}/vectors")


def ivf_probe_batch(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Probe a built IVF index for a whole DataFrame of queries at once —
    the production many-query ANN shape over the ``cell=``-partitioned
    layout.

    Each query picks its ``n_probe`` nearest cells (the same sequential
    float64 fold ``ivf_probe`` uses, vectorized per Arrow batch with an
    identical accumulation order), explodes to (cell, query) rows, and
    equi-joins the corpus ON THE CELL ID: a corpus vector is scored only
    against queries that probe its cell. Per query the exact-cosine
    re-rank sees ~n_probe/n_clusters of the corpus; per-group state in
    the final trim is k rows (WindowGroupLimit).

    Scale: the probed-queries side is usually tiny relative to the
    corpus, so AQE broadcasts it and the corpus never shuffles; with
    very large query sets the join degrades to one shuffle of each side
    hashed by cell. Skewed cells (popular regions of the space) are the
    AQE skew-join case — same mitigation as any skewed equi-join.
    """
    import numpy as np

    cents = sorted(
        spark.read.parquet(f"{path}/_centroids").collect(),
        key=lambda r: r["cell"],
    )
    C = np.array([r["centroid"] for r in cents], dtype=np.float64)
    cell_ids = np.array([int(r["cell"]) for r in cents], dtype=np.int64)
    npb = int(n_probe)

    @F.pandas_udf("array<int>")
    def probe_cells_udf(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="object")
        out = []
        for v in vs:
            q = np.asarray(v, dtype=np.float64)
            # sequential left-fold per dimension — matches _probe_cells /
            # the i13c oracle bit-for-bit, ties broken by cell id
            d2 = np.zeros(len(C))
            for j in range(C.shape[1]):
                diff = C[:, j] - q[j]
                d2 = d2 + diff * diff
            order = np.lexsort((cell_ids, d2))[:npb]
            out.append([int(cell_ids[i]) for i in order])
        return pd.Series(out)

    probed = queries.select(
        F.col(qid_col).alias("query_id"),
        F.col(qvec_col).alias("_qv"),
        F.explode(probe_cells_udf(F.col(qvec_col))).alias("cell"),
    )
    vecs = spark.read.parquet(f"{path}/vectors")
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), id_col)
    return (
        vecs.join(probed, "cell")
        .select(
            "query_id",
            id_col,
            F.round(cosine_expr(F.col("_qv"), F.col(vec_col)), 6).alias("sim"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def ivf_probe(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a built IVF index: nearest n_probe centroids (driver math on
    the tiny centroid table), then an exact re-rank over ONLY those
    cells' partitions — the ``cell IN (...)`` predicate prunes at the
    file index, never opening the other cells' files."""
    cents = spark.read.parquet(f"{path}/_centroids").collect()
    probe_cells = _probe_cells(
        [(r["cell"], r["centroid"]) for r in cents], query_vec, n_probe
    )

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        spark.read.parquet(f"{path}/vectors")
        .filter(F.col("cell").isin(probe_cells))
        .select(id_col, F.round(cosine_expr(q, F.col(vec_col)), 6).alias("sim"))
        .orderBy(F.col("sim").desc(), id_col)
        .limit(k)
    )
