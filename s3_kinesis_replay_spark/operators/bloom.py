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

# Defaults: m = 2^16 bits, k = 2 positions per key (md5 hex slices
# [1..4] and [5..8]). CAPACITY CEILING (ADVICE r5): a bloom filter
# saturates as the reference-set cardinality n approaches m — fp rate
# (1 - e^(-kn/m))^k reads ~1% at n≈6.5k, ~39% at n=2^16, →1 beyond; a
# saturated screen is still SOUND (no false negatives) but useless,
# routing every probe to the exact join it is meant to shield. Size
# bits_hex for the reference set: each +1 hex char is 16× more bits
# (bits_hex=7 → m=2^28 ≈ 268M bits handles tens of millions of grams;
# md5's 32 hex chars bound bits_hex*k ≤ 32).
M_BITS_HEX = 4
K_HASHES = 2


def _meta_pos(bits_hex: int, k: int) -> int:
    """Negative sentinel row encoding the (bits_hex, k) that BUILT a bit
    table — real positions are ≥ 0, so the sentinel survives parquet
    round-trips inside the relation itself and can never collide with a
    probe position. bloom_screen asserts it matches the screen's own
    parameters (ADVICE r6: a mismatched screen is silently UNSOUND —
    false negatives — the one failure mode a bloom must never have)."""
    return -(bits_hex * 100 + k)


def _positions(md5_col: Column, bits_hex: int, k: int) -> list[Column]:
    """k non-overlapping md5 hex slices of bits_hex chars, as bigints."""
    if bits_hex * k > 32:
        raise ValueError(f"md5 has 32 hex chars: bits_hex={bits_hex} * k={k} > 32")
    return [
        F.conv(F.substring(md5_col, 1 + i * bits_hex, bits_hex), 16, 10).cast(
            "bigint"
        )
        for i in range(k)
    ]


def bloom_bits(
    keys: DataFrame,
    key_col: str = "g",
    bits_hex: int = M_BITS_HEX,
    k: int = K_HASHES,
) -> DataFrame:
    """(pos) — the distinct set-bit table for a key relation. ≤ 16^bits_hex
    rows no matter how many keys went in; persist this at reference-set
    build time (plain parquet) and pass it to bloom_screen (with the SAME
    bits_hex/k) forever after.

    All k positions come out of ONE pass (explode of a k-element array) —
    a union of k selects would execute the upstream key pipeline once
    per branch.

    The returned relation carries a negative (bits_hex, k) sentinel row
    (persisted with the bits) plus a same-process `_bloom_params` tag;
    bloom_screen validates either against its own parameters."""
    m = F.md5(key_col)
    bits = keys.select(
        F.explode(F.array(*_positions(m, bits_hex, k))).alias("pos")
    ).distinct()
    meta = keys.sparkSession.range(1).select(
        F.lit(_meta_pos(bits_hex, k)).cast("bigint").alias("pos")
    )
    out = bits.unionAll(meta)
    out._bloom_params = (bits_hex, k)
    return out


def bloom_screen(
    probes: DataFrame,
    bits: DataFrame,
    key_col: str = "g",
    bits_hex: int = M_BITS_HEX,
    k: int = K_HASHES,
) -> DataFrame:
    """probes + boolean ``bloom_hit``: true iff ALL k positions of the
    probe key are present in ``bits``. No false negatives by construction;
    false-positive rate governed by m = 16^bits_hex vs reference-set
    cardinality (see capacity note above). The bit table broadcasts
    (bounded by m); broadcast k times, it is still one executor-resident
    hash relation per join.

    Parameter-soundness check (ADVICE r6): the screen's (bits_hex, k)
    must equal what BUILT the bits, else false negatives. A same-process
    bloom_bits result carries `_bloom_params` (checked for free); a bits
    relation read back from storage is checked via its persisted negative
    sentinel row — on parquet that is a pushed `pos < 0` scan, skipping
    all data row-groups. A table with NO sentinel (pre-r7 or hand-built)
    passes unchecked, documented legacy behavior."""
    tagged = getattr(bits, "_bloom_params", None)
    if tagged is not None:
        if tagged != (bits_hex, k):
            raise ValueError(
                f"bloom_screen(bits_hex={bits_hex}, k={k}) over bits built "
                f"with (bits_hex, k)={tagged} — mismatched parameters make "
                "the screen unsound (false negatives)"
            )
        # A fresh bloom_bits result is distinct by construction (its
        # positive slice is a .distinct() output, the sentinel is the
        # only negative row), so the union-dedup below would be a
        # redundant extra Exchange+HashAggregate (r17, guide §2.4).
        #
        # localCheckpoint (r16, guide §3.3/§5): each of the k broadcast
        # builds below otherwise re-executes the ENTIRE bits pipeline —
        # for an inline bloom_bits(reference) that is k full scans +
        # shingle explodes + distincts of the reference side (p14's plan
        # showed the whole train subtree twice). The bit table is
        # ≤ 16^bits_hex longs; materializing it once is free and the k
        # joins then share it. (The r16 barrier cost at bench SF came
        # from the checkpoint job running on the scan's 1-2 partitions —
        # fixed in the CALLERS by spread_scan, not by giving up the
        # single materialization.)
        bits = bits.filter(F.col("pos") >= 0).localCheckpoint(eager=True)
    else:
        # Stored/unioned bits (no same-process tag): checkpoint the FULL
        # table first — sentinels included — so the sentinel meta-check
        # collect and the k joins read the ONE materialized result
        # instead of each re-executing the bits pipeline (r17, VERDICT
        # r16 item 1: the old order ran the pipeline once for the pos<0
        # collect and again for the checkpoint of the pos>=0 slice).
        # distinct: a union of two bloom tables with overlapping key
        # sets carries duplicate positive positions, and a duplicated
        # position would MULTIPLY probe rows through the k left-joins
        # below (review r8) — the bit relation is tiny, dedup is free.
        bits = bits.distinct().localCheckpoint(eager=True)
        # Set-compare: a union of two bloom tables built with IDENTICAL
        # parameters carries duplicate matching sentinels — still sound.
        metas = {r["pos"] for r in bits.filter(F.col("pos") < 0).collect()}
        if metas and metas != {_meta_pos(bits_hex, k)}:
            raise ValueError(
                f"bloom_screen(bits_hex={bits_hex}, k={k}) over bits whose "
                f"sentinel rows {metas} declare different build parameters "
                "— mismatched parameters make the screen unsound"
            )
        bits = bits.filter(F.col("pos") >= 0)
    p = probes
    for i, pos in enumerate(_positions(F.md5(key_col), bits_hex, k)):
        p = p.withColumn(f"_p{i}", pos)
    hit = F.lit(True)
    for i in range(k):
        b = F.broadcast(bits.withColumnRenamed("pos", f"_b{i}"))
        p = p.join(b, F.col(f"_p{i}") == F.col(f"_b{i}"), "left")
        hit = hit & F.col(f"_b{i}").isNotNull()
    drop = [f"_p{i}" for i in range(k)] + [f"_b{i}" for i in range(k)]
    return p.withColumn("bloom_hit", hit).drop(*drop)
