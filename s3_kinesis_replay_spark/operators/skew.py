"""Skew-mitigation join (SURVEY §4 — skew handling beyond AQE).

AQE's OptimizeSkewedJoin splits oversized *partitions*, but a single hot
key still lands in one task. Salting breaks the key itself: the skewed
(large) side gets a deterministic salt in [0, N); the other side is
exploded across all N salts; the join key becomes (key, salt), so one hot
key fans out over N tasks. Row multiplicity is preserved exactly — each
left row matches precisely the one right copy carrying its salt.

Cost model: right side is replicated N× (bounded — use for dim-vs-fact or
moderate right sides), left side gains one tiny column; shuffle skew drops
by ~N for the hot keys. At 100 TB pick N ≈ ceil(hot-key rows / target
task rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with an N-way salt on the (skewed) left side.

    Returns exactly the rows of ``left.join(right, left_key == right_key,
    how)`` (salt columns dropped) for ``how`` in ('inner', 'left') — the
    only modes where the construction is row-exact. 'right'/'full' would
    duplicate every unmatched right row once per salt copy, so they are
    rejected. Deterministic: the salt is a full-row content hash (NOT a
    per-key hash — all columns feed it), not a random number, so
    retries/AQE replans can't flip results.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            "salt-exploded right side would duplicate unmatched right rows"
        )
    salted_l = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*left.columns), F.lit(salts)).cast("int")
    )
    salted_r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    joined = salted_l.join(
        salted_r,
        (salted_l[left_key] == salted_r[right_key])
        & (salted_l["_salt"] == salted_r["_salt"]),
        how,
    )
    return joined.drop(salted_l["_salt"]).drop(salted_r["_salt"])
