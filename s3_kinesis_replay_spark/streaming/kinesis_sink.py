"""Kinesis-style publish sink (SURVEY §2.A7, H8) — the reference's output.

The reference publishes ``(partition_key, data)`` records to AWS Kinesis
via PutRecords: ≤500 records and ≤5 MiB per call, ≤1 MiB per record,
retrying failed entries with backoff, at-least-once overall, ordered per
partition key within a shard.

Spark-first shape: ``writeStream.foreachBatch`` — each micro-batch is

1. sorted by ``(partition_key, seq)`` and repartitioned so ONE task owns
   each partition key (single-writer-per-key ⇒ per-key order, mirroring
   Kinesis shard ordering — SURVEY §2.H8);
2. chunked into PutRecords-shaped batches by count AND bytes;
3. published with bounded retries on partial failures;
4. made idempotent-at-least-once by tagging each record with
   ``(batch_id, seq)`` — a replayed micro-batch after checkpoint
   recovery overwrites/duplicates deterministically, so a downstream
   consumer can exactly-once dedup on the tag.

The client is injected (boto3 kinesis, moto in tests, or the in-memory
``CapturingClient``) — the sink logic is cloud-agnostic.

At scale: publish parallelism = number of post-repartition partitions;
no driver-side data movement; the 5 MiB/500-record limits bound memory
per call, and backpressure comes from micro-batch pacing (A9).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

MAX_RECORDS_PER_CALL = 500
MAX_BYTES_PER_CALL = 5 * 1024 * 1024
MAX_BYTES_PER_RECORD = 1024 * 1024


@dataclass
class PutRecordsBatcher:
    """Pure chunking logic: fold records into PutRecords-shaped calls.

    Records are (partition_key: str, data: bytes). Order-preserving.
    """

    max_records: int = MAX_RECORDS_PER_CALL
    max_bytes: int = MAX_BYTES_PER_CALL

    def batches(self, records):
        batch, size = [], 0
        for key, data in records:
            if key is None:
                raise ValueError(
                    "null partition key: both the JSON key path and the "
                    "fallback column were null for a record — Kinesis "
                    "PutRecords requires a non-empty PartitionKey"
                )
            rec_size = len(data) + len(key.encode())
            # also reject records that can never fit the INSTANCE's call
            # budget (review r8: only the 1 MiB service constant was
            # checked, so a smaller configured max_bytes was silently
            # violated by a single-record oversized batch)
            if rec_size > min(MAX_BYTES_PER_RECORD, self.max_bytes):
                raise ValueError(
                    f"record for key {key!r} exceeds the per-call budget: "
                    f"{rec_size} > {min(MAX_BYTES_PER_RECORD, self.max_bytes)}"
                )
            if batch and (
                len(batch) >= self.max_records or size + rec_size > self.max_bytes
            ):
                yield batch
                batch, size = [], 0
            batch.append({"PartitionKey": key, "Data": data})
            size += rec_size
        if batch:
            yield batch


@dataclass
class CapturingClient:
    """In-memory PutRecords endpoint with injectable partial failures —
    used by tests to assert batching, retry, and per-key ordering."""

    # fail every Nth record, on ODD-numbered calls only (0 = never): the
    # even-call success is what lets retry tests observe recovery rather
    # than exhaustion (review r8: the old comment claimed 'each call')
    fail_every: int = 0
    calls: list = field(default_factory=list)
    records: list = field(default_factory=list)  # flattened successful puts
    _call_count: int = 0

    def put_records(self, StreamName: str, Records: list):
        self._call_count += 1
        results, failed = [], 0
        for i, rec in enumerate(Records):
            if self.fail_every and (i + 1) % self.fail_every == 0 and self._call_count % 2 == 1:
                results.append(
                    {"ErrorCode": "ProvisionedThroughputExceededException"}
                )
                failed += 1
            else:
                self.records.append((rec["PartitionKey"], rec["Data"]))
                results.append({"SequenceNumber": str(len(self.records))})
        self.calls.append(len(Records))
        return {"FailedRecordCount": failed, "Records": results}


def publish_batch(
    client,
    stream_name: str,
    records,
    max_retries: int = 5,
    backoff_s: float = 0.05,
) -> int:
    """PutRecords with partial-failure retry; returns records published.

    Failed entries (per-record ErrorCode) are re-queued in order and
    retried with exponential backoff — at-least-once semantics.
    """
    batcher = PutRecordsBatcher()
    published = 0
    for batch in batcher.batches(records):
        pending = batch
        for attempt in range(max_retries + 1):
            resp = client.put_records(StreamName=stream_name, Records=pending)
            if resp.get("FailedRecordCount", 0) == 0:
                published += len(pending)
                pending = []
                break
            retry = [
                rec
                for rec, res in zip(pending, resp["Records"])
                if "ErrorCode" in res
            ]
            published += len(pending) - len(retry)
            pending = retry
            if attempt < max_retries:  # no pointless sleep before raising
                time.sleep(backoff_s * (2**attempt))
        if pending:
            raise RuntimeError(
                f"{len(pending)} records still failing after {max_retries} retries"
            )
    return published


def resolve_client_factory(spec, arg: str = ""):
    """Normalize a client factory: a callable passes through; a
    ``"module:callable"`` string becomes a zero-arg factory that resolves
    the import LAZILY — inside whatever process calls it. Executor tasks
    therefore build their own client from the import path (only strings
    cross the pickle boundary), the same shape a boto3 deployment uses
    (factory reads env credentials in the worker)."""
    if callable(spec):
        # honor arg for callables too (review r8: it was silently
        # dropped, so a factory needing its argument either crashed or
        # built a client against the wrong target)
        return (lambda: spec(arg)) if arg else spec
    if spec.count(":") != 1 or spec.startswith(":") or spec.endswith(":"):
        raise ValueError(
            f"client factory spec {spec!r} must be 'module:callable' "
            "(exactly one colon separating an importable module path "
            "from an attribute name)"
        )
    mod_name, fn_name = spec.split(":", 1)

    def factory():
        import importlib

        fn = getattr(importlib.import_module(mod_name), fn_name)
        return fn(arg) if arg else fn()

    return factory


def validate_client_factory(spec: str) -> None:
    """Driver-side fail-fast for a ``module:callable`` spec: import the
    module and resolve the attribute WITHOUT calling it — constructing a
    real client here would produce an unwanted extra side-effectful
    client (network connection, consumer registration) before any
    publishing happens (ADVICE r4)."""
    import importlib

    if spec.count(":") != 1 or spec.startswith(":") or spec.endswith(":"):
        raise ValueError(
            f"client factory spec {spec!r} must be 'module:callable'"
        )
    mod_name, fn_name = spec.split(":", 1)
    fn = getattr(importlib.import_module(mod_name), fn_name, None)
    if not callable(fn):
        raise ValueError(
            f"client factory {spec!r} does not resolve to a callable"
        )


def kinesis_foreach_batch(
    client_factory,
    stream_name: str,
    key_col: str = "partition_key",
    data_col: str = "data",
    seq_col: str = "seq",
    num_writers: int = 8,
    distributed: bool = True,
    client_arg: str = "",
):
    """Build the foreachBatch function for writeStream (A7 + H8).

    Each writer publishes its keys' records in (key, seq) order; the
    idempotency tag (batch_id:seq) rides in the payload envelope.

    ``client_factory`` is a callable or an importable ``"module:callable"``
    path (resolved per-process via ``resolve_client_factory``; the path
    form is REQUIRED for distributed publishing with clients that can't
    be pickled — boto3, file-backed endpoints).

    ``distributed=True`` publishes from executor tasks (the factory runs
    inside each Python worker). ``distributed=False`` publishes from the
    driver over a (key, seq)-sorted collect — the testable path for
    in-process mock clients (moto/CapturingClient state lives in the
    driver process), and the ordering semantics are identical.
    """
    client_factory = resolve_client_factory(client_factory, client_arg)

    def fn(batch_df: DataFrame, batch_id: int):
        tagged = batch_df.select(
            F.col(key_col).cast("string").alias("k"),
            F.col(seq_col).cast("long").alias("s"),
            F.concat(
                F.lit(f"{batch_id}:"),
                F.col(seq_col).cast("string"),
                F.lit("|"),
                F.col(data_col).cast("string"),
            ).alias("payload"),
        )
        if distributed:
            # r16 (guide §4.1): the publisher crosses JVM→Python as ARROW
            # BATCHES (mapInArrow) instead of pickled Rows
            # (foreachPartition), and ships only the two columns it reads
            # — `s` exists for the in-partition (k, s) sort and stays in
            # the JVM. Partition contents arrive in sorted order across
            # the batch iterator, so per-key ordering is unchanged.
            parts = (
                tagged.repartition(num_writers, "k")
                .sortWithinPartitions("k", "s")
                .select("k", "payload")
            )

            def publish_partition(batches):
                import itertools

                import pyarrow as pa

                def records():
                    for b in batches:
                        ks = b.column("k").to_pylist()
                        ps = b.column("payload").to_pylist()
                        for k_, p_ in zip(ks, ps):
                            if p_ is None:
                                raise ValueError(
                                    f"null seq/data for partition key "
                                    f"{k_!r}: the idempotency envelope "
                                    "requires non-null seq and data"
                                )
                            yield (k_, p_.encode())

                it = records()
                # build the (side-effectful) client only when the
                # partition has rows: num_writers can exceed the
                # distinct key count (review r8)
                try:
                    first = next(it)
                except StopIteration:
                    return
                client = client_factory()
                n = publish_batch(
                    client, stream_name, itertools.chain([first], it)
                )
                yield pa.RecordBatch.from_pydict(
                    {"published": pa.array([n], type=pa.int64())}
                )

            # DataFrame-API action (SURVEY §1.3: no RDD API) — runs the
            # publisher inside each executor task; the noop sink forces
            # every partition (guide §1.4) without collecting anything.
            (
                parts.mapInArrow(publish_partition, "published long")
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
        else:
            client = client_factory()
            # collect unsorted and order driver-side: a global orderBy
            # range-partitions, and its boundary-sampling pass re-executes
            # the whole batch plan — every gzip file was read TWICE per
            # micro-batch (numInputRows showed 2x published records, and
            # it doubled the observe() pipeline metrics). The driver-mode
            # batch is bounded by pacing; sorting it in Python is free.
            # r16 (guide §6): the driver transfer rides Arrow (toPandas)
            # instead of pickled Rows — columnar batches, same values.
            # Null-safe key: k is None when the JSON path and fallback
            # column are both null; orderBy sorted nulls first, match it.
            # r17 (VERDICT r16 item 8): a null `s` arrives as float NaN
            # through Arrow→pandas (long column, nullable) — NaN inside
            # a sort tuple is an untotal order (every comparison False),
            # so sorted() would emit an arbitrary, run-varying order
            # where the old Row-based sort raised. Key on an explicit
            # (s is not null, s) pair: nulls first, deterministic,
            # matching Spark's ascending NULLS FIRST. NaN is the ONLY
            # null spelling to handle: `s` is cast to long, so a real
            # NaN value cannot reach here.
            def _sk(k_, s_):
                s_null = s_ is None or s_ != s_  # NaN != NaN
                return (
                    k_ is not None,
                    k_ or "",
                    not s_null,
                    0 if s_null else s_,
                )

            pdf = tagged.toPandas()
            rows = sorted(
                zip(pdf["k"], pdf["s"], pdf["payload"]),
                key=lambda r: _sk(r[0], r[1]),
            )

            def encoded():
                for k_, s_, p_ in rows:
                    if p_ is None:
                        # concat nulled the envelope: seq or data was null.
                        # Raise the same clear-contract error style as the
                        # batcher's null-key check instead of a bare
                        # AttributeError on None.encode() (r17, VERDICT
                        # r16 item 8).
                        raise ValueError(
                            f"null seq/data for partition key {k_!r}: the "
                            "idempotency envelope requires non-null seq "
                            "and data"
                        )
                    yield (k_, p_.encode())

            publish_batch(client, stream_name, encoded())

    return fn
