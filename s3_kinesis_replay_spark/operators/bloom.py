"""Deterministic bloom-filter membership screen (north-star op, no
reference analog — the reference checkout is empty, SURVEY §0).

A bloom filter expressed RELATIONALLY: the filter is a table of set bit
positions (≤ m rows regardless of input size), membership is a broadcast
join requiring all k positions present. Bit positions derive from md5
hex slices, so the filter — including its false-positive set — is
deterministic and reproducible by any engine with md5 (the p14 oracle
recomputes it in DuckDB).

Production shape (measured in SCALE.md round-5b): build the bit table
ONCE when the reference set (e.g. an eval/train gram set) is built and
persist it; each screen then costs one scan of the probe side plus a
broadcast join against a few-MB table, FLAT in the reference-set size.
Rebuilding the bits inline costs as much as the exact join it is meant
to pre-screen — persist or don't bother.

Why not Spark's built-in bloom machinery: ``bloom_filter_agg`` is not
user-exposed in this Spark build (runtime-filter internal only), and
``DataFrame.stat.bloomFilter`` materializes a driver-side object whose
bit layout is JVM-private — not reproducible cross-engine, not storable
as a relation. The relational form trades a constant factor for
determinism, engine-portability, and plain-parquet persistence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

M_BITS_HEX = 4  # 4 hex chars per position -> m = 2^16 bits
K_HASHES = 2  # positions per key: md5 hex slices [1..4] and [5..8]


def _position(md5_col: Column, start: int) -> Column:
    return F.conv(F.substring(md5_col, start, M_BITS_HEX), 16, 10).cast("bigint")


def bloom_bits(keys: DataFrame, key_col: str = "g") -> DataFrame:
    """(pos) — the distinct set-bit table for a key relation. ≤ 2^16 rows
    no matter how many keys went in; persist this at reference-set build
    time (plain parquet) and pass it to bloom_screen forever after.

    Both positions come out of ONE pass (explode of a 2-element array) —
    a union of two selects would execute the upstream key pipeline once
    per branch."""
    m = F.md5(key_col)
    return keys.select(
        F.explode(F.array(_position(m, 1), _position(m, 5))).alias("pos")
    ).distinct()


def bloom_screen(
    probes: DataFrame, bits: DataFrame, key_col: str = "g"
) -> DataFrame:
    """probes + boolean ``bloom_hit``: true iff ALL K_HASHES positions of
    the probe key are present in ``bits``. No false negatives by
    construction; false-positive rate governed by m vs reference-set
    cardinality. The bit table broadcasts (bounded by m)."""
    m = F.md5(key_col)
    p = probes.withColumn("_p1", _position(m, 1)).withColumn(
        "_p2", _position(m, 5)
    )
    b1 = F.broadcast(bits.withColumnRenamed("pos", "_b1"))
    b2 = F.broadcast(bits.withColumnRenamed("pos", "_b2"))
    return (
        p.join(b1, p["_p1"] == b1["_b1"], "left")
        .join(b2, p["_p2"] == b2["_b2"], "left")
        .withColumn(
            "bloom_hit", F.col("_b1").isNotNull() & F.col("_b2").isNotNull()
        )
        .drop("_p1", "_p2", "_b1", "_b2")
    )
