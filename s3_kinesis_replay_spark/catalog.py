"""Catalog: register the fixture parquet tables as temp views.

Tables (TESTDATA.md / FIXTURES.md): region nation customer supplier part
orders lineitem events documents embeddings, one parquet file per table
under ``/root/testdata/sf{0.001,0.01,0.1}/``.

Normalization applied at load (both engines must see identical data):

* ``events.ts`` is parquet ``timestamp[ns]`` — truncated to microseconds
  (Spark's native TimestampType precision); the DuckDB oracle casts
  ``ts`` to ``TIMESTAMP`` (µs) to match.

At 100 TB each "table" would be a partitioned directory tree; the loader
takes any path Spark's parquet source accepts, so nothing here changes —
partition pruning and predicate pushdown apply automatically.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one fixture table as a DataFrame (schema-on-read from parquet)."""
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS): Spark 4 hard-errors on scan
        # unless nanosAsLong is set. Runtime-settable — set it defensively so
        # a caller-provided session (e.g. the driver's) works unmodified.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            # declared timestamp semantics are UTC (SURVEY §5.3.4): pin the
            # session tz so collected values match the oracle's naive UTC
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        except Exception:
            pass  # conf locked by the session → rely on its existing value
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # parquet stores ts as timestamp[ns]; with nanosAsLong it arrives as
        # LongType nanoseconds. Integer `div` (not `/`) keeps full precision
        # (ns epochs exceed 2^53), flooring exactly like DuckDB's ns→µs cast.
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        else:
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load all fixture tables; optionally register as temp views for SQL."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = table(spark, name, sf_dir)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
