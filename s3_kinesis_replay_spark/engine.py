"""Engine facade — the three entry points of SURVEY §3.2.

* E1 ``Engine.table(name)`` — DataFrame builder over the catalog.
* E2 ``Engine.sql(query)`` — Spark SQL over the registered views.
* E3 ``Engine.replay(cfg, client_factory)`` — the replay pipeline
  (archive → transform → Kinesis-style sink), the reference's purpose.

All three converge on the same Catalyst lifecycle; the facade only wires
catalog + config, never bypasses the optimizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from s3_kinesis_replay_spark.catalog import (
    DEFAULT_SF_DIR,
    ensure_fixture_views,
    register_snapshot_table,
    resolve_time_travel,
    table,
)
from s3_kinesis_replay_spark.session import get_spark
from s3_kinesis_replay_spark.streaming.replay import ReplayConfig, run_replay


class Engine:
    def __init__(
        self, spark: SparkSession | None = None, sf_dir: str = DEFAULT_SF_DIR
    ) -> None:
        self.spark = spark or get_spark()
        self.sf_dir = sf_dir
        self._views_registered = False

    def table(self, name: str) -> DataFrame:
        return table(self.spark, name, self.sf_dir)

    def register_snapshot_table(
        self,
        name: str,
        root: str,
        version: int | str | None = None,
        as_of: float | None = None,
        branch: str | None = None,
    ) -> DataFrame:
        """Expose a manifest-versioned table (operators/table_format.py)
        to ``sql()`` as the view ``name`` — after this, plain SQL can
        query it alongside the fixture views, including Delta-style
        ``name VERSION AS OF n`` / ``name TIMESTAMP AS OF 'ts'`` clauses
        (a quoted VERSION spec resolves a TAG, r13), all resolved
        per-query from the table's immutable manifests. ``version`` may
        be a tag name; ``branch`` registers a WAP branch's head (the
        audit-in-SQL step)."""
        return register_snapshot_table(
            self.spark, name, root, version=version, as_of=as_of,
            branch=branch,
        )

    def sql(self, query: str) -> DataFrame:
        if not self._views_registered:
            # memoized per (session, sf_dir) — see catalog.ensure_fixture_views
            ensure_fixture_views(self.spark, self.sf_dir)
            self._views_registered = True
        from s3_kinesis_replay_spark.catalog import resolve_dml

        # DML on registered snapshot tables executes through the table
        # operators (atomic MOR commits) and returns (op, target,
        # version); everything else is a read through Catalyst
        dml = resolve_dml(self.spark, query)
        if dml is not None:
            return dml
        return self.spark.sql(resolve_time_travel(self.spark, query))

    def replay(self, cfg: ReplayConfig, client_factory, distributed: bool = False):
        return run_replay(self.spark, cfg, client_factory, distributed=distributed)
