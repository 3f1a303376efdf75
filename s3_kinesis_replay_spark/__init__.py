"""s3_kinesis_replay_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of
the reference replay tool ``cludden/s3-kinesis-replay`` (an S3→Kinesis
message replay CLI), re-expressed Spark-first:

* the replay pipeline as Structured Streaming (file source → transform →
  batched Kinesis-style sink with retries, checkpointed),
* a full relational/batch operator core (DataFrame/SQL, Catalyst-optimized),
* LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal column plumbing) designed for 100 TB scale.

The reference checkout at /root/reference is empty (see SURVEY.md §0), so
behavioral parity targets come from SURVEY.md §2 — every declared operator
ships with a DuckDB-oracle query in ``__spark_entry__.py``.
"""

from s3_kinesis_replay_spark.session import get_spark  # noqa: F401
from s3_kinesis_replay_spark.catalog import load_tables, table  # noqa: F401

__version__ = "0.1.0"
