"""Focused test for the r16 in-cell exact-score rewrites.

semdedup / embedding_neardup_pairs / block_topk_joined now compute the
exact cosine INSIDE the pandas cell via ``np.cumsum`` row folds instead
of re-attaching vectors with joins and evaluating ``cosine_expr``. That
is only sound if the cumsum fold is the SAME IEEE float64 operation
sequence as the HOF's sequential left fold — this pins it bit-for-bit
on real fixture vectors (and the 0.0 seed identity the claim uses).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from s3_kinesis_replay_spark.catalog import table
from s3_kinesis_replay_spark.operators.similarity import cosine_expr


def test_cumsum_fold_matches_cosine_expr_bitwise(spark, sf_dir):
    emb = table(spark, "embeddings", sf_dir).filter(F.col("vec_id") < 64)
    pairs = (
        emb.alias("a")
        .join(emb.alias("b"), F.col("a.vec_id") + 1 == F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ia"),
            cosine_expr(F.col("a.embedding"), F.col("b.embedding")).alias(
                "sim"
            ),
            F.col("a.embedding").alias("va"),
            F.col("b.embedding").alias("vb"),
        )
        .collect()
    )
    assert len(pairs) >= 50
    for r in pairs:
        va = np.array(r["va"], dtype=np.float64)
        vb = np.array(r["vb"], dtype=np.float64)
        dot = np.cumsum(va * vb)[-1]
        na = np.sqrt(np.cumsum(va * va)[-1])
        nb = np.sqrt(np.cumsum(vb * vb)[-1])
        got = dot / (na * nb)
        assert got == r["sim"], (r["ia"], got, r["sim"])  # exact, no tolerance


def test_cumsum_zero_seed_identity():
    # the HOF fold seeds with 0.0; cumsum starts at the first element —
    # identical because 0.0 + x == x exactly in IEEE for every float x
    rng = np.random.RandomState(7)
    xs = rng.standard_normal(1000) * 10.0 ** rng.randint(-300, 300, 1000)
    assert all(0.0 + x == x for x in xs)
