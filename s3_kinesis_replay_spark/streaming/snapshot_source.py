"""Manifest-table STREAMING SOURCE: read a versioned table
(operators/table_format.py) as a Structured Streaming input — the
public Delta-streaming-source design (a Delta table used with
``readStream``) re-expressed through Spark 4's Python DataSource API.

Offsets ARE snapshot versions: ``{"version": N}`` means "everything
committed through vN has been emitted". Each micro-batch covers the
versions between the last checkpointed offset and ``latestOffset()``;
its input partitions are the data FILES those commits appended (one
partition per file — executor-parallel, zero driver data path), read in
the worker with pyarrow and returned as Arrow record batches (the
vectorized path; never row-at-a-time Python).

Semantics, matching the public Delta source rules:

* APPEND commits stream naturally: the new segment's files are new rows.
* The FIRST consumed version is the initial snapshot (Delta's
  ``startingVersion`` behavior): its full content is emitted even
  though the commit op is ``overwrite``/``cluster``/... . If that
  manifest carries MOR delete state (delete/pos-delete files), the
  source REFUSES (r14): raw file emission cannot apply deletes, so
  it would re-emit deleted and replaced rows — compact first, or
  start at/after a compaction.
* METADATA-ONLY commits (set_constraint / drop_constraint /
  add_column / fold — same data entries, same delete state as their
  base) stream through silently (r14): they change no visible rows,
  so there is nothing to emit and nothing to refuse. (A column added
  mid-stream appears after a stream restart — the query's schema is
  fixed at start, Delta's rule too.)
* Any LATER non-append commit that CHANGES the row set (overwrite,
  compact, cluster, delete, merge, restore) makes "new rows since"
  ill-defined at file granularity — the source FAILS with a clear
  error unless
  ``skip_changes=true``, which skips that commit's file additions
  entirely (the honest subset of Delta's ``ignoreChanges``: already-
  emitted rows are never retracted, rewritten copies are not re-emitted,
  and rows whose only existence is inside the rewrite are missed —
  documented at-the-reader's-own-risk, exactly like ignoreChanges).
* MOR delete files are NOT applied to already-emitted appends (a
  streaming sink cannot retract); a delete commit is itself a
  non-append commit and hits the rule above.

Exactly-once: Spark checkpoints the offset JSON; replays of a committed
range re-plan the same immutable files (manifests and segments never
mutate, and appends never rewrite data files — the a14/a15 invariant
this source leans on). Rate limiting: ``max_versions_per_batch`` caps
how many commits one micro-batch may cover (a 10k-commit backfill
becomes bounded batches instead of one giant one);
``max_bytes_per_batch`` (r14) caps a batch by the APPENDED BYTES of
the commits it covers — the file source's ``maxBytesPerTrigger`` for
tables with wildly uneven commit sizes. Soft cap, commit granularity,
guaranteed progress (the first uncovered commit always fits); byte
totals come from the segment descriptors' recorded sizes, so the cap
walk is O(#commits) metadata, zero file stats. Both caps may be set;
the tighter one wins. The reader tracks
the last COMMITTED offset driver-side to advance the cap window.

Schema: the latest manifest's recorded schema (DDL built the same way
the writers record it); files written before a column was added are
NULL-filled to the read schema in the worker — add-column evolution
streams transparently, the same rule snapshot_read applies.

Usage::

    spark.dataSource.register(SnapshotTableDataSource)
    df = (spark.readStream.format("snapshot_table")
          .option("root", "/path/to/table")
          .option("starting_version", "0")        # default: 0 (genesis)
          .option("starting_timestamp", "2026-01-01T00:00:00")  # xor ^
          .option("max_versions_per_batch", "1")  # default: unbounded
          .option("max_bytes_per_batch", "67108864")  # default: unbounded
          .option("skip_changes", "false")        # default: fail
          .load())
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

def _version_bytes(root: str, v: int) -> int:
    """Bytes of the data files commit ``v`` ADDED (its seq-v segments).
    Descriptors written r14+ carry a precomputed 'bytes' total — one
    dict read; older segments fall back to loading the entry list and
    stat-ing files (absent files count 0 — skews low, smaller batches).
    A PUBLISH commit carries the branch's segments verbatim with
    branch-lineage seq values — no seq-v descriptor exists, so the
    seq filter alone would count it as 0 bytes and the pacing cap
    would admit an arbitrarily large publish (plus more) in one
    micro-batch (ADVICE r14). For such commits, fall back to diffing
    segment paths against the predecessor manifest: the descriptors
    present here but absent at v-1 are what this commit added.
    Predecessor vacuumed → 0 (the source's initial-snapshot / loud
    non-append rules govern that world anyway)."""
    from s3_kinesis_replay_spark.operators.table_format import (
        _load_segment,
        _read_manifest,
    )

    m = _read_manifest(root, v)
    descs = [d for d in m.get("segments", []) if d.get("seq") == v]
    # operation check, not just "no seq-v descs": a publish carries
    # BRANCH-lineage seqs which can coincidentally equal v (branch
    # numbering restarts at fork+1), partially matching wrong segments
    if m.get("segments") and (m.get("operation") == "publish" or not descs):
        try:
            prev_paths = {
                d["path"]
                for d in _read_manifest(root, v - 1).get("segments", [])
            }
        except (FileNotFoundError, OSError):
            prev_paths = None
        if prev_paths is not None:
            descs = [
                d
                for d in m.get("segments", [])
                if d["path"] not in prev_paths
            ]
    total = 0
    for desc in descs:
        if "bytes" in desc:
            total += desc["bytes"]
            continue
        for e in _load_segment(root, desc):
            if e.get("bytes") is not None:
                total += e["bytes"]
                continue
            try:
                total += os.path.getsize(os.path.join(root, e["path"]))
            except OSError:
                pass
    return total


def _resolve_starting(root: str, options) -> int:
    """EXCLUSIVE starting version for a table/CDC stream from either
    ``starting_version`` (a version number) or ``starting_timestamp``
    (r15 — Delta's more common spelling: epoch seconds or ISO-8601,
    naive = UTC; resolves to the newest version strictly BEFORE the
    timestamp so every commit at/after it streams). Mutually
    exclusive; default 0 (genesis)."""
    sv, st = options.get("starting_version"), options.get(
        "starting_timestamp"
    )
    if st is not None:
        if sv is not None:
            raise ValueError(
                "starting_version and starting_timestamp are mutually "
                "exclusive — pass one"
            )
        from s3_kinesis_replay_spark.operators.table_format import (
            cdc_start_version,
            timestamp_to_epoch,
        )

        return cdc_start_version(root, timestamp_to_epoch(st))
    return int(sv) if sv is not None else 0


def _refuse_rename_history(root: str, starting: int) -> None:
    """Refuse a stream whose CONSUMED range (> starting) contains any
    column rename/drop history (r15 review): per-file emission projects
    by NAME, so files written before a rename would silently NULL-fill
    the renamed column — and with paced batches those rows reach the
    sink BEFORE the rename commit's own mid-stream refusal fires. The
    walk is scoped to versions the stream will consume: starting at or
    after the evolution (e.g. after the compact that cleared the
    mapping) is safe and allowed."""
    from s3_kinesis_replay_spark.operators.table_format import (
        _read_manifest,
        versions,
    )

    for v in versions(root):
        if v <= starting:
            continue
        m = _read_manifest(root, v)
        if (
            m.get("column_renames")
            or m.get("retired_columns")
            or m.get("operation") in ("rename_column", "drop_column")
        ):
            raise ValueError(
                f"table {root} has column rename/drop history at v{v}, "
                "inside this stream's range — per-file streaming cannot "
                "apply a name mapping; snapshot_compact and start the "
                "stream at/after the compacted version"
            )


def _metadata_only(root: str, m: dict, v: int) -> bool:
    """True when commit v changed NO visible rows relative to v-1: same
    data-entry paths, same delete and position-delete state. Covers
    set_constraint/drop_constraint/add_column (carry verbatim) and fold
    (rewrites descriptors, entries identical). Conservative: if v-1 was
    vacuumed, answer False (the caller's loud non-append rule then
    applies)."""
    from s3_kinesis_replay_spark.operators.table_format import (
        _delete_entries,
        _entries,
        _paths,
        _pos_delete_entries,
        _read_manifest,
    )

    try:
        prev = _read_manifest(root, v - 1)
    except (FileNotFoundError, OSError):
        return False

    def key(mm: dict):
        return (
            sorted(_paths(_entries(mm, root))),
            sorted(_paths(_delete_entries(mm, root))),
            sorted(_paths(_pos_delete_entries(mm, root))),
        )

    return key(m) == key(prev)


_NONAPPEND_HELP = (
    "file-granularity streaming cannot express a rewrite — restart from "
    "a later starting_version, or pass skip_changes=true to skip "
    "rewrite commits' file additions (already-emitted rows are never "
    "retracted; rewritten copies are not re-emitted)"
)


@dataclass
class SnapshotFilePartition(InputPartition):
    """One appended data file = one input partition. Carries everything
    read() needs (read is stateless in the worker): the absolute file
    path and the pickled Arrow read schema."""

    path: str = ""
    arrow_schema: object = field(default=None, repr=False)


def _read_schema_ddl(root: str) -> str:
    """Read schema for the stream = the LATEST manifest's recorded
    schema (newest wins under add-column evolution). Tables whose whole
    lineage is schema-less (legacy) are refused — a stream needs one
    declared shape up front."""
    from s3_kinesis_replay_spark.operators.table_format import (
        _read_manifest,
        _schema_ddl,
        latest_version,
    )

    v = latest_version(root)
    if v == 0:
        raise ValueError(f"no snapshots under {root} — nothing to stream")
    schema = _read_manifest(root, v).get("schema")
    if schema is None:
        raise ValueError(
            f"table {root} has no recorded schema (legacy lineage) — "
            "snapshot_compact/overwrite once to record one before "
            "streaming"
        )
    return _schema_ddl(schema)


def _arrow_type(simple: str):
    """Spark simpleString type → Arrow type, session-free (the manifest
    records simpleStrings; the stream reader process has no session to
    parse DDL with). Covers the scalar + array types this repo's
    writers produce; anything else raises rather than miscasting."""
    import re

    import pyarrow as pa

    s = simple.strip().lower()
    scalars = {
        "bigint": pa.int64(),
        "long": pa.int64(),
        "int": pa.int32(),
        "integer": pa.int32(),
        "smallint": pa.int16(),
        "tinyint": pa.int8(),
        "double": pa.float64(),
        "float": pa.float32(),
        "string": pa.string(),
        "boolean": pa.bool_(),
        "binary": pa.binary(),
        "date": pa.date32(),
        # session zone is pinned UTC throughout this repo (engine/session)
        "timestamp": pa.timestamp("us", tz="UTC"),
        "timestamp_ntz": pa.timestamp("us"),
    }
    if s in scalars:
        return scalars[s]
    m = re.fullmatch(r"decimal\((\d+),(\d+)\)", s)
    if m:
        return pa.decimal128(int(m.group(1)), int(m.group(2)))
    m = re.fullmatch(r"array<(.+)>", s)
    if m:
        return pa.list_(_arrow_type(m.group(1)))
    raise NotImplementedError(
        f"snapshot_table streaming: no Arrow mapping for type {simple!r}"
    )


def _arrow_schema_of(cols: list[list[str]]):
    import pyarrow as pa

    return pa.schema([pa.field(n, _arrow_type(t)) for n, t in cols])


class SnapshotTableStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options) -> None:
        self.root = options.get("root")
        if not self.root:
            raise ValueError("snapshot_table requires .option('root', ...)")
        self.starting = _resolve_starting(self.root, options)
        mvpb = options.get("max_versions_per_batch")
        self.max_versions = int(mvpb) if mvpb is not None else None
        mbpb = options.get("max_bytes_per_batch")
        self.max_bytes = int(mbpb) if mbpb is not None else None
        if self.max_bytes is not None and self.max_bytes <= 0:
            raise ValueError("max_bytes_per_batch must be > 0")
        self.skip_changes = (
            str(options.get("skip_changes", "false")).lower() == "true"
        )
        # Driver-side position tracker for the rate caps: the END of
        # the last batch this process PLANNED (or committed), monotone.
        # None until the position is KNOWN. Two rules, both learned the
        # hard way (r14 probe against Spark's actual call order):
        # (1) Spark asks latestOffset BEFORE revealing any position —
        #     before initialOffset on a fresh run, and with no call at
        #     all on a checkpoint restart — so an unknown-position
        #     latestOffset must answer UNCAPPED: capping relative to
        #     `starting` would return an offset below a restart's
        #     checkpointed position, and (2) Spark does NOT guard
        #     against a regressing latestOffset — it will happily plan
        #     a "batch" from the newer offset back to the older one and
        #     then re-plan forward, DUPLICATING rows in the sink. The
        #     tracker therefore advances on the END of every planned
        #     batch (not the start, which is what regressed the r13
        #     window) and latestOffset clamps to >= it. Net behavior:
        #     the first batch of a process is uncapped, every later
        #     batch is paced, offsets never move backward.
        self._pos: int | None = None
        # Arrow schema computed ONCE here and shipped per-partition.
        # Built with a hand mapper, NOT StructType.fromDDL: the stream
        # reader lives in Spark's dedicated Python runner process
        # (python_streaming_source_runner), which has no SparkSession —
        # fromDDL raises SESSION_OR_CONTEXT_NOT_EXISTS there.
        from s3_kinesis_replay_spark.operators.table_format import (
            _read_manifest,
            latest_version,
        )

        self._init_head = latest_version(self.root)
        latest_m = _read_manifest(self.root, self._init_head)
        cols = latest_m.get("schema")
        if cols is None:
            raise ValueError(
                f"table {self.root} has no recorded schema (legacy "
                "lineage) — compact/overwrite once before streaming"
            )
        _refuse_rename_history(self.root, self.starting)
        self._arrow_schema = _arrow_schema_of(cols)

    def initialOffset(self) -> dict:
        self._pos = max(self._pos or 0, self.starting)
        return {"version": self.starting}

    def latestOffset(self) -> dict:
        from s3_kinesis_replay_spark.operators.table_format import (
            latest_version,
        )

        v = latest_version(self.root)
        if self._pos is not None:
            if self.max_versions is not None:
                v = min(v, self._pos + self.max_versions)
            if self.max_bytes is not None:
                # byte cap (r14, a20b — the file source's
                # maxBytesPerTrigger for commit-sized units): admit
                # versions until the NEXT one would cross the cap. SOFT
                # cap with guaranteed progress — the first uncovered
                # version always fits, however large (exactly
                # maxBytesPerTrigger's rule), so a table of wildly
                # uneven commits still drains. Costs O(#commits)
                # descriptor reads, no segment loads when descriptors
                # carry 'bytes'.
                base = max(self._pos, self.starting)
                acc = 0
                vb = base
                while vb < v:
                    nxt = _version_bytes(self.root, vb + 1)
                    if vb > base and acc + nxt > self.max_bytes:
                        break
                    acc += nxt
                    vb += 1
                    if acc >= self.max_bytes:
                        break
                v = vb
            v = max(v, self._pos)  # NEVER regress (see tracker note)
        return {"version": max(v, self.starting)}

    def partitions(self, start: dict, end: dict):
        self._pos = max(self._pos or 0, end["version"])
        from s3_kinesis_replay_spark.operators.table_format import (
            _load_segment,
            _read_manifest,
        )

        lo, hi = start["version"], end["version"]
        parts: list[SnapshotFilePartition] = []

        def add(rel_path: str) -> None:
            parts.append(
                SnapshotFilePartition(
                    path=os.path.join(self.root, rel_path),
                    arrow_schema=self._arrow_schema,
                )
            )

        for v in range(lo + 1, hi + 1):
            m = _read_manifest(self.root, v)
            op = m.get("operation")
            if op in ("rename_column", "drop_column"):
                # mid-stream rename/drop: the query's schema was fixed
                # at start and per-file projection is by name — files
                # written after the evolution would silently NULL-fill
                raise ValueError(
                    f"commit v{v} is '{op}' — a column rename/drop "
                    "changes the name mapping mid-stream; restart the "
                    "stream after snapshot_compact"
                )
            if op == "widen_column" and v > self._init_head:
                # backlog widenings are fine (the pinned schema was
                # read at init, after them; old files cast UP) — a
                # LIVE widening leaves the pinned schema narrower than
                # files appended after it; refuse rather than
                # down-cast (r16)
                raise ValueError(
                    f"commit v{v} is 'widen_column' — the column type "
                    "widened after this stream started; restart the "
                    "stream (its pinned schema predates the widening)"
                )
            initial = v == self.starting + 1
            if op != "append" and not initial:
                if _metadata_only(self.root, m, v):
                    # set_constraint / drop_constraint / add_column /
                    # fold: the visible row set is untouched (same data
                    # entries, same delete state) — nothing to emit,
                    # nothing to refuse (r14; Delta's source likewise
                    # streams through metadata-only commits)
                    continue
                if self.skip_changes:
                    continue
                raise ValueError(
                    f"non-append commit v{v} ({op}) under {self.root}: "
                    + _NONAPPEND_HELP
                )
            if initial and op != "append":
                if (
                    m.get("delete_files")
                    or m.get("delete_segments")
                    or m.get("pos_delete_segments")
                ):
                    # ADVICE r13: raw file emission ignores MOR delete
                    # state, so an initial snapshot whose manifest
                    # carries delete/pos-delete files would re-emit
                    # deleted and replaced rows (duplicate keys
                    # downstream). Mirror the loud non-append rule.
                    raise ValueError(
                        f"initial snapshot v{v} ({op}) under "
                        f"{self.root} carries merge-on-read delete "
                        "state — raw file emission would re-emit "
                        "deleted/replaced rows; snapshot_compact the "
                        "table (folds deletes into data files) or pick "
                        "a starting_version at/after a compaction"
                    )
                # the initial snapshot emits its FULL content — which
                # for a legacy flat manifest lives in inline 'files'
                # entries, not segments (review r13: walking segments
                # only silently emitted zero rows for that form)
                from s3_kinesis_replay_spark.operators.table_format import (
                    _norm_entry,
                )

                for e in m.get("files", []):
                    add(_norm_entry(e)["path"])
            for desc in m.get("segments", []):
                if desc.get("seq") != v and not (
                    initial and op != "append"
                ):
                    continue  # carried from an earlier commit
                for e in _load_segment(self.root, desc):
                    add(e["path"])
        return parts

    def read(self, partition):  # executor-side, stateless
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = partition.arrow_schema
        tbl = pq.read_table(partition.path)
        cols = []
        for fld in schema:
            if fld.name in tbl.column_names:
                cols.append(tbl.column(fld.name).cast(fld.type))
            else:
                # add-column evolution: pre-evolution file → NULL-fill
                cols.append(pa.nulls(tbl.num_rows, type=fld.type))
        yield from pa.table(cols, schema=schema).to_batches()

    def commit(self, end: dict) -> None:
        # advance the rate-cap window; durability lives in Spark's
        # checkpointed offset log, not here
        self._pos = max(self._pos or 0, end["version"])

    def stop(self) -> None:
        pass


class SnapshotTableDataSource(DataSource):
    """``spark.readStream.format("snapshot_table")`` — see module doc."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_table"

    def schema(self) -> str:
        return _read_schema_ddl(self.options.get("root", ""))

    def streamReader(self, schema) -> SnapshotTableStreamReader:
        return SnapshotTableStreamReader(schema, self.options)


def register_snapshot_source(spark) -> None:
    """Idempotent registration of the 'snapshot_table' stream format."""
    spark.dataSource.register(SnapshotTableDataSource)
