"""Kinesis-style sink as a Spark 4 Python streaming DataSource (SURVEY
§2.A7 alternative path, §4 "Kinesis sink" row).

Unlike the foreachBatch sink (kinesis_sink.py), this publishes from
EXECUTOR Python workers: each post-repartition partition owns a disjoint
set of partition keys (single-writer-per-key ⇒ per-key ordering, H8) and
runs the same PutRecords batching (≤500 records / ≤5 MiB) + partial-
failure retry loop. Publish parallelism therefore scales with the
partition count, with no driver involvement in the data path.

The AWS client is built inside the worker from an importable factory
(``pkg.module:function``) because clients can't be pickled into tasks —
the same pattern a boto3 deployment uses (factory reads env credentials).
Tests use ``file_client_factory`` below: a filesystem-backed PutRecords
endpoint whose call files encode (worker, call-seq) so per-key ordering
is assertable after the fact.
"""

from __future__ import annotations

import base64
import json
import os
import uuid
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)

from s3_kinesis_replay_spark.streaming.kinesis_sink import (
    publish_batch,
    resolve_client_factory,
)


@dataclass
class KinesisCommitMessage(WriterCommitMessage):
    count: int = 0


class KinesisStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict) -> None:
        self.stream = options["stream"]
        self.factory_path = options["client_factory"]
        self.factory_arg = options.get("client_arg", "")

    def _client(self):
        # the ONE module:callable resolution (review r8: this was the
        # third hand-rolled copy, without the curated validation errors)
        return resolve_client_factory(self.factory_path, self.factory_arg)()

    def write(self, iterator) -> KinesisCommitMessage:
        # (key, seq) order within the partition = Kinesis shard order (H8).
        # The sort is in-memory per task; micro-batch pacing (A9) bounds it —
        # Spark itself forbids sortWithinPartitions on streaming DFs.
        # Null-safe key (review r8): a null partition key must reach the
        # batcher's descriptive ValueError, not die in the comparator;
        # and the side-effectful client is built only for NON-EMPTY
        # partitions (num_writers can exceed the distinct key count).
        rows = sorted(
            iterator,
            key=lambda r: (r.partition_key is not None, r.partition_key or "", r.seq),
        )
        if not rows:
            return KinesisCommitMessage(count=0)
        client = self._client()
        records = ((row.partition_key, row.data.encode()) for row in rows)
        n = publish_batch(client, self.stream, records)
        return KinesisCommitMessage(count=n)

    def commit(self, messages, batchId) -> None:
        # PutRecords has no transaction to finalize; the offset WAL commit
        # (Structured Streaming) is the durability point. At-least-once.
        pass

    def abort(self, messages, batchId) -> None:
        pass  # partial publishes stand — at-least-once, dedup downstream


class KinesisDataSource(DataSource):
    """``df.writeStream.format("kinesis_replay")`` — expects columns
    (partition_key string, seq long, data string)."""

    @classmethod
    def name(cls) -> str:
        return "kinesis_replay"

    def streamWriter(self, schema, overwrite) -> KinesisStreamWriter:
        return KinesisStreamWriter(self.options)


# ---------------------------------------------------------------- test client


class FileKinesisClient:
    """PutRecords endpoint backed by a directory: one JSON file per call,
    named ``<arrival-ns>-<worker>-<uuid>``. Arrival time is the shard-side
    sequence: tasks for the same key run serially (single-writer-per-key,
    and micro-batch N commits before N+1 starts), so per-key order is
    reconstructable by sorting files on arrival."""

    def __init__(self, root: str) -> None:
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def put_records(self, StreamName: str, Records: list) -> dict:
        import time

        payload = [
            {
                "PartitionKey": r["PartitionKey"],
                "Data": base64.b64encode(r["Data"]).decode(),
            }
            for r in Records
        ]
        name = f"{time.time_ns():020d}-{os.getpid()}-{uuid.uuid4().hex[:8]}.json"
        tmp = self.root / (name + ".tmp")
        tmp.write_text(json.dumps({"stream": StreamName, "records": payload}))
        tmp.rename(self.root / name)  # atomic publish
        return {
            "FailedRecordCount": 0,
            "Records": [{"SequenceNumber": str(i)} for i in range(len(Records))],
        }


def file_client_factory(root: str) -> FileKinesisClient:
    return FileKinesisClient(root)


def read_captured(root: str) -> list[tuple[str, bytes, tuple[int, int]]]:
    """All captured (key, data, (arrival_ns, worker)) in arrival order."""
    out = []
    for f in sorted(Path(root).glob("*.json")):
        arrival, pid, _ = f.name.split("-", 2)
        doc = json.loads(f.read_text())
        for r in doc["records"]:
            out.append(
                (
                    r["PartitionKey"],
                    base64.b64decode(r["Data"]),
                    (int(arrival), int(pid)),
                )
            )
    return out
