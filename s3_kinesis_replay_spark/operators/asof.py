"""As-of join (SURVEY §2.C8) — Spark has no native asof DataFrame join.

Definition (backward as-of): for each left row, the single right row with
the largest ``right_on <= left_on`` within the same ``by`` key, ties
broken by ``tiebreak`` descending (pinned for determinism, SURVEY §5.3.7).

Implementation: union-tag + window — both sides are tagged and unioned,
sorted within each ``by`` partition by (time, side-order, tiebreak), and
each left row picks up the last-seen right row via ``last(..., ignorenulls)``
over an unbounded-preceding frame.

Why this shape at 100 TB: ONE shuffle of (left ∪ right) on the by-key and
one sort — identical cost to a single sort-merge join, no nested loop, no
per-key driver work, and watermark-friendly if re-expressed on streams.
A window-free alternative (range-bucketed join) trades a second shuffle
for bounded memory when a single by-key's history exceeds a partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_on: str,
    by_left: str,
    by_right: str,
    value_cols: list[str],
    tiebreak: str,
    direction: str = "backward",
) -> DataFrame:
    """As-of join; returns all left columns + value_cols (null if no right
    row qualifies). ``direction='backward'`` picks the latest right row at
    or before the left time; ``'forward'`` the earliest at or after —
    implemented as the same one-shuffle window pass with the sort order
    (and the left/right interleaving at equal times) mirrored.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    fwd = direction == "forward"
    lhs = left.select(
        F.col(by_left).alias("_by"),
        F.col(on).alias("_t"),
        F.lit(1).alias("_side"),  # left sorts AFTER right at equal time
        F.lit(None).cast("long").alias("_tb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    # rhs aligned to lhs schema: (_by, _t, _side, _tb, _l=null, _r_*)
    rhs = right.select(
        F.col(by_right).alias("_by"),
        F.col(right_on).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(tiebreak).cast("long").alias("_tb"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("_l"))
            .schema["_l"]
            .dataType
        ).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = lhs.unionByName(rhs)
    # forward = backward on reversed time: sort _t desc so "last seen right"
    # is the earliest right at-or-after; tiebreak asc picks the smallest id
    # "winner" = last row the window sees in its equal-time group:
    # backward keeps _tb asc (largest id wins, matching the declared
    # ts DESC, id DESC oracle); forward flips to desc (smallest id wins)
    t_ord = F.col("_t").desc() if fwd else F.col("_t").asc()
    tb_ord = F.col("_tb").desc() if fwd else F.col("_tb").asc()
    w = (
        Window.partitionBy("_by")
        .orderBy(t_ord, F.col("_side"), tb_ord)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "_side",
        "_l",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_rv_{c}")
            for c in value_cols
        ],
    ).filter(F.col("_side") == 1)
    out_cols = [F.col("_l").getField(c).alias(c) for c in left.columns] + [
        F.col(f"_rv_{c}").alias(c) for c in value_cols
    ]
    return filled.select(*out_cols)
