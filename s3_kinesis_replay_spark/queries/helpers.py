"""Shared canonicalization helpers for declared queries (SURVEY §5.3).

The driver's correctness gate hashes VALUES order-insensitively, so every
declared query must produce bit-identical values in Spark and DuckDB:

* ``sdec(expr)`` — per-row cast of a double expression to DECIMAL(38,6)
  before SUM. Per-row double arithmetic is IEEE-identical across engines;
  decimal addition is exact and order-independent, so distributed partial
  aggregation cannot introduce float accumulation-order drift.
* ``ROUND(x, 6)`` (``r6``) — for genuinely-double outputs (ratios, stats,
  similarity scores): both engines round the same IEEE double to the same
  6-decimal neighbor except on exact decimal midpoints, which are not
  representable in binary for the value domains used here.
* integer SUMs: DuckDB widens SUM(BIGINT)→HUGEINT; oracles cast back.
* averages are declared as decimal-sum ÷ count computed in double then
  rounded — never engine-native AVG (intermediate precision differs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from s3_kinesis_replay_spark.catalog import table

DEC = "DECIMAL(38,6)"


def sdec(expr: str) -> Column:
    """SQL expression cast to DECIMAL(38,6) — exact-agg discipline."""
    return F.expr(f"CAST(({expr}) AS {DEC})")


def r6(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, 6)


def fdec(col: Column | str) -> Column:
    """Final projection of an exact decimal aggregate for OUTPUT columns.

    Internal aggregation stays DECIMAL(38,6) (exact, order-independent), but
    the declared result casts to double and rounds to 6: Spark and DuckDB
    render Decimal values differently under external canonicalizers, while
    an exact ≤6-dp decimal converts to the identical IEEE double in both
    engines. Mirror in oracle SQL as ROUND(CAST(x AS DOUBLE), 6).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast("double"), 6)


def in_tol(est: Column, exact: Column, rel: float = 0.05) -> Column:
    """The declared relative-tolerance flag the sketch flag-oracles hash
    (d4/d4b/d4c): |est − exact| ≤ rel·exact. ONE definition (review r8:
    three hand-copies of the contract expression could drift)."""
    return F.abs(est.cast("double") - exact) <= rel * exact


def t(spark: SparkSession, name: str, sf_dir: str) -> DataFrame:
    return table(spark, name, sf_dir)


def localize(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Detach a live-built result from its backing tempdir as a local
    relation through ONE Arrow transfer (r17, guide §6 "Arrow for
    driver transfers"): ``df.toArrow()`` + Arrow ``createDataFrame``
    replaces the pickled-Row ``collect()`` + per-row re-ingest the
    live-build entries used (measured 8× on a 10k-row CDC stream,
    value- and schema-exact round trip)."""
    return spark.createDataFrame(df.toArrow(), schema=df.schema)


import contextlib


@contextlib.contextmanager
def scoped_conf(spark: SparkSession, confs: dict[str, str]):
    """Set session confs for the duration of the block, restoring prior
    values (or unsetting keys that had none) after — the cbo_conf
    discipline generalized (r11, for the AQE skew-join entry): entries
    must never leak tuned thresholds into sibling queries' plans."""
    prev: dict[str, str | None] = {}
    for k in confs:
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
    try:
        # apply INSIDE the try (review r11): a failure on the Nth set must
        # still restore the N-1 already-applied keys — leaking them is the
        # exact hazard this helper exists to prevent
        for k, v in confs.items():
            spark.conf.set(k, v)
        yield spark
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
