"""S3-style archive staging, listing, and reading (SURVEY §2.A2–A6).

The reference replays Firehose archives: gzipped newline-delimited JSON
objects under time-encoded key paths (``prefix/YYYY/MM/DD/HH/...``), with
key-prefix/range filtering as the only source predicate. Here:

* ``stage_archive`` derives that layout deterministically from the
  ``events`` fixture (FIXTURES.md "Streaming-archive derivation"):
  sort by event_id, chunk into fixed-size files, path each chunk by its
  min-ts as ``dt=YYYY-MM-DD/hr=HH/part-<chunk>.json.gz``. Chunking is
  ``event_id div chunk_rows`` so a SQL oracle can re-derive file-level
  facts from the parquet alone.
* Readers use Spark's file source: partition-dir pruning (``dt=`` is a
  real partition column), ``pathGlobFilter`` for key-range filtering,
  transparent gzip by extension, and ``maxFilesPerTrigger`` pacing for
  the streaming replay driver.

Serialization is lossless: doubles via ``repr`` (shortest round-trip),
timestamps as ISO-8601 microseconds — re-read values are bit-identical.

At 100 TB the stager is irrelevant (archives already exist); readers
scale because listing/pruning is pushed to the file index and each file
is one input split (gzip is non-splittable — replay parallelism = file
count, matching the reference's object-level parallelism).
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os
from pathlib import Path

import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
DEFAULT_CHUNK_ROWS = 500


def _archive_root(sf_dir: str, chunk_rows: int, gz: bool) -> Path:
    key = hashlib.sha256(f"{sf_dir}|{chunk_rows}|{gz}|v1".encode()).hexdigest()[:16]
    return Path(os.environ.get("SKR_ARCHIVE_DIR", "/tmp/skr_archive")) / key


def stage_archive(
    sf_dir: str, chunk_rows: int = DEFAULT_CHUNK_ROWS, gz: bool = True
) -> str:
    """Deterministically derive the events archive; idempotent via marker."""
    root = _archive_root(sf_dir, chunk_rows, gz)
    marker = root / "_STAGED"
    if marker.exists():
        return str(root)
    root.mkdir(parents=True, exist_ok=True)

    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    rows = tbl.to_pylist()
    rows.sort(key=lambda r: r["event_id"])
    for start in range(0, len(rows), chunk_rows):
        chunk = rows[start : start + chunk_rows]
        chunk_id = chunk[0]["event_id"] // chunk_rows
        min_ts = min(r["ts"] for r in chunk)
        dt = min_ts.strftime("%Y-%m-%d")
        hr = min_ts.strftime("%H")
        d = root / f"dt={dt}" / f"hr={hr}"
        d.mkdir(parents=True, exist_ok=True)
        name = f"part-{chunk_id:05d}.json" + (".gz" if gz else "")
        lines = []
        for r in chunk:
            # microsecond ISO timestamps; repr() doubles → lossless round-trip
            lines.append(
                json.dumps(
                    {
                        "event_id": r["event_id"],
                        "ts": r["ts"].strftime("%Y-%m-%dT%H:%M:%S.%f"),
                        "user_id": r["user_id"],
                        "event_type": r["event_type"],
                        "value": r["value"],
                        "props": r["props"],
                    },
                    separators=(",", ":"),
                )
            )
        payload = ("\n".join(lines) + "\n").encode()
        target = d / name
        if gz:
            # mtime=0 → deterministic bytes across stagings
            with open(target, "wb") as f:
                f.write(gzip.compress(payload, mtime=0))
        else:
            target.write_bytes(payload)
    marker.touch()
    return str(root)


def read_archive(
    spark: SparkSession,
    root: str,
    glob: str | None = None,
    with_partitions: bool = False,
) -> DataFrame:
    """Batch-read an archive (A2/A4/A5). ``glob`` applies pathGlobFilter
    (the reference's key-prefix/range predicate); partition dirs dt=/hr=
    become prunable columns when requested."""
    reader = (
        spark.read.schema(EVENT_SCHEMA)
        .option("timestampFormat", TS_FMT)
        .option("recursiveFileLookup", "false")
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.json(f"{root}")
    if not with_partitions:
        df = df.select(*[f.name for f in EVENT_SCHEMA.fields])
    return df


def stream_archive(
    spark: SparkSession,
    root: str,
    max_files_per_trigger: int | None = None,
    glob: str | None = None,
    dt_start: str | None = None,
    dt_end: str | None = None,
) -> DataFrame:
    """Streaming replay source (A6/A9): incrementally consume archive files
    in key order, paced by maxFilesPerTrigger.

    ``glob`` (leaf-file pathGlobFilter) and ``dt_start``/``dt_end``
    (inclusive bounds on the ``dt=`` partition dir) are the reference
    CLI's key-prefix/key-range predicates: both prune at the FILE INDEX —
    excluded objects are never opened, the property that matters when the
    archive is 100 TB and the replay window is an hour."""
    reader = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("timestampFormat", TS_FMT)
        .option("latestFirst", "false")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.json(root)
    # dt= is a real partition dir: with a user schema Spark appends the
    # inferred partition column, so a range predicate on it reaches
    # PartitionFilters (same mechanism a5b pins for the batch path)
    if dt_start is not None:
        df = df.where(F.col("dt") >= dt_start)
    if dt_end is not None:
        df = df.where(F.col("dt") <= dt_end)
    return df.select(*[f.name for f in EVENT_SCHEMA.fields])


def stage_csv_table(sf_dir: str, name: str = "part") -> str:
    """Stage a fixture table as headered CSV (A3); deterministic + idempotent."""
    root = Path(os.environ.get("SKR_ARCHIVE_DIR", "/tmp/skr_archive")) / (
        "csv_" + hashlib.sha256(f"{sf_dir}|{name}|v1".encode()).hexdigest()[:16]
    )
    marker = root / "_STAGED"
    if marker.exists():
        return str(root)
    root.mkdir(parents=True, exist_ok=True)
    tbl = pq.read_table(f"{sf_dir}/{name}.parquet")
    rows = tbl.to_pylist()
    cols = tbl.column_names
    with open(root / f"{name}.csv", "w") as f:
        f.write(",".join(cols) + "\n")
        for r in rows:
            out = []
            for c in cols:
                v = r[c]
                out.append(repr(v) if isinstance(v, float) else str(v))
            f.write(",".join(out) + "\n")
    marker.touch()
    return str(root)


DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

DOC_CHUNK_ROWS = 100


def stage_doc_archive(sf_dir: str, chunk_rows: int = DOC_CHUNK_ROWS) -> str:
    """Deterministically derive a gzipped-NDJSON crawl archive from the
    ``documents`` fixture — the document-corpus twin of ``stage_archive``:
    sort by doc_id, chunk ``doc_id div chunk_rows``, one ``part-N.json.gz``
    per chunk. This is the shape a crawl delivery (Firehose to S3) leaves
    behind, and the input p18's replay-to-training-pipeline composite
    streams from. Idempotent via marker; gzip mtime=0 for stable bytes."""
    root = Path(os.environ.get("SKR_ARCHIVE_DIR", "/tmp/skr_archive")) / (
        "docs_" + hashlib.sha256(f"{sf_dir}|{chunk_rows}|v1".encode()).hexdigest()[:16]
    )
    marker = root / "_STAGED"
    if marker.exists():
        return str(root)
    root.mkdir(parents=True, exist_ok=True)

    tbl = pq.read_table(f"{sf_dir}/documents.parquet")
    rows = tbl.to_pylist()
    rows.sort(key=lambda r: r["doc_id"])
    for start in range(0, len(rows), chunk_rows):
        chunk = rows[start : start + chunk_rows]
        chunk_id = chunk[0]["doc_id"] // chunk_rows
        lines = [
            json.dumps(
                {k: r[k] for k in ("doc_id", "text", "lang", "source", "n_chars")},
                separators=(",", ":"),
            )
            for r in chunk
        ]
        payload = ("\n".join(lines) + "\n").encode()
        with open(root / f"part-{chunk_id:05d}.json.gz", "wb") as f:
            f.write(gzip.compress(payload, mtime=0))
    marker.touch()
    return str(root)


def stream_doc_archive(
    spark: SparkSession, root: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming source over a staged document archive (paced like
    ``stream_archive``); when ``max_files_per_trigger`` is None it is
    sized to the archive (~4 micro-batches at any SF) so the replay is
    never a degenerate single-batch run."""
    if max_files_per_trigger is None:
        n_files = sum(
            1 for p in Path(root).iterdir() if p.name.startswith("part-")
        )
        max_files_per_trigger = max(2, -(-n_files // 4))
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("latestFirst", "false")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(root)
        .select(*[f.name for f in DOC_SCHEMA.fields])
    )
