"""STREAMING ROW-LEVEL CDC over a manifest table (r14) — the public
Delta ``readChangeFeed`` streaming design re-expressed through Spark 4's
Python DataSource API, synthesized at READ time from MOR state (no
write-time CDC files), the streaming twin of
:func:`operators.table_format.snapshot_row_changes`.

``spark.readStream.format("snapshot_changes")`` emits the table's rows
plus ``_change_type`` ∈ {insert, delete, update_preimage,
update_postimage} and ``_commit_version``. Offsets are snapshot
versions, exactly like the ``snapshot_table`` source; the pacing/
monotonicity rules are shared (see snapshot_source.py — the tracker
advances on batch END, latestOffset never regresses).

Per-commit synthesis is executor-parallel with NO driver data path and
NO Spark-side joins — every event class reduces to per-FILE pyarrow
work in the worker:

* append commits: one partition per new file → ``insert`` rows.
* position-delete commits (delete_where): one partition per ADDRESSED
  file — the worker reads that file, inner-joins the commit's address
  rows on the original row index, and emits the preimage. O(files
  touched), never a table scan. With sibling new data files (an
  UPDATE commit) the preimage is ``update_preimage`` and the new files
  are ``update_postimage``.
* equality-delete commits (snapshot_delete): one partition per data
  file VISIBLE at v-1 — the worker rebuilds that file's visible rows
  (anti-join its applicable PRIOR equality-delete keys under Iceberg
  sequence scoping, anti-join its prior position-delete addresses),
  then semi-joins the commit's delete keys and emits ``delete``
  preimages. This is the one scan-shaped class (same as the batch
  function) — but each file's work is one worker task, and the joins
  run in Arrow against key files that are small by construction.
* metadata-only commits and row-preserving rewrites (compact /
  cluster / fold / constraints / add_column) emit nothing.
* MERGE commits (r15): classifying the postimage rows into
  update-vs-insert needs the prior snapshot's key set — which the
  RUNNER computes at plan time with one bounded pass: the commit's
  own key files are small by construction (the merge source), and
  only prior files whose stats overlap the keys' range are read,
  key COLUMN only, under the same sequence-scoped visibility rebuild
  the eq_pre worker applies. The matched-key verdict ships inside
  the postimage partitions; workers then split update_postimage vs
  insert per-file with zero cross-file work, and the preimage
  partitions are the delete machinery with ctype update_preimage.
* overwrite / restore REFUSE, for the batch function's reason: file
  provenance cannot name the changed rows.

Exactly-once: the same immutable-manifest offset-log argument as the
``snapshot_table`` source. Every manifest in the consumed range plus
each range's v-1 must be retained (vacuum raises loudly mid-plan).

Usage::

    from s3_kinesis_replay_spark.streaming.changes_source import (
        register_changes_source,
    )
    register_changes_source(spark)
    (spark.readStream.format("snapshot_changes")
     .option("root", "/path/tbl")
     .option("starting_version", "3")   # EXCLUSIVE lower bound
     .option("starting_timestamp", "2026-01-01T00:00:00")  # xor ^ (r15)
     .option("max_versions_per_batch", "1")
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

_CHANGE_COLS = [["_change_type", "string"], ["_commit_version", "bigint"]]


@dataclass
class ChangePartition(InputPartition):
    """One data file's contribution to one commit's change events.

    ``kind``: 'rows' (emit the whole file — insert/postimage),
    'pos_pre' (inner-join ``new_paths`` addresses on row index),
    'eq_pre' (visibility rebuild via ``prior_eq``/``prior_pos``, then
    semi-join ``new_paths`` keys), 'post_split' (a MERGE commit's new
    file: rows whose key ∈ ``match_keys`` — the runner's plan-time
    verdict — emit update_postimage, the rest insert). All paths are
    ABSOLUTE except ``rel_path`` (the file's root-relative name, what
    position-delete address rows record)."""

    kind: str = "rows"
    path: str = ""
    rel_path: str = ""
    ctype: str = "insert"
    version: int = 0
    key_col: str = ""
    new_paths: tuple = ()
    prior_eq: tuple = ()  # applicable prior equality-delete key files
    prior_pos: tuple = ()  # prior position-delete address files
    # MERGE verdict sets ship as SORTED uint64 KEY-HASH SETS (r16,
    # VERDICT r15 item 8 — the kidx representation): the runner writes
    # each set ONCE to <root>/_cdcplan/v{v}-{match,post}.u64 and ships
    # only the PATH, so plan serialization stays O(8 B x keys) once
    # per commit instead of O(keys x files) inline value tuples. When
    # the root is not runner-writable the raw bytes ship INLINE as the
    # fallback (correct, just per-partition duplicated). Workers hash
    # their rows' key tuples with the same kidx hash family and probe
    # by sorted search (collisions 2^-64/pair misclassify a change
    # TYPE only, never drop a row).
    match_path: str = ""  # merge keys with a visible v-1 row
    match_inline: object = field(default=None, repr=False)
    merge_pre: bool = False  # eq_pre partition belongs to a MERGE
    # merge preimages only: keys with a postimage row — preimage rows
    # whose key is absent here are DELETES (clause-form merges, r15)
    post_path: str = ""
    post_inline: object = field(default=None, repr=False)
    # initial defaults (r16): ((col, value), ...) for columns whose ADD
    # COLUMN DEFAULT postdates this partition's file — the runner ships
    # the manifest's evaluated constants so the worker (no
    # SparkSession) surfaces preimages exactly as batch _assemble does
    defaults: tuple = ()
    arrow_schema: object = field(default=None, repr=False)


def _concat(tables):
    """concat_tables with schema unification: key/address files written
    by different writers disagree on field NULLABILITY (createDataFrame
    marks columns non-null; read-back parquet does not), and vanilla
    concat_tables hard-errors on that."""
    import pyarrow as pa

    return pa.concat_tables(tables, promote_options="permissive")


def _kcols(key) -> list:
    """Normalize a partition's key spec — bare column name (single-
    column identity, the pre-r16 wire shape, unchanged) or a tuple of
    names (composite identity, r16) — to a column list, with
    table_format._key_list's validation (one normalizer, review
    r16)."""
    from s3_kinesis_replay_spark.operators.table_format import _key_list

    return _key_list(key)


def _cast_keys(tbl, kcols, schema):
    """Cast a table's key columns to the PINNED read schema's types
    (review r16): after a type widening the physical parquet types go
    heterogeneous across files (int32 bytes under a bigint schema,
    narrow-scale decimals under a widened one), and both the Arrow
    joins and the verdict-set hashing require every side to agree on
    the LOGICAL type — hashing a Decimal('1.50') and a
    Decimal('1.5000') differently would silently relabel change
    types."""
    import pyarrow as pa

    for k in kcols:
        want = schema.field(k).type
        i = tbl.schema.get_field_index(k)
        if tbl.schema.field(i).type != want:
            tbl = tbl.set_column(
                i, pa.field(k, want), tbl.column(k).cast(want)
            )
    return tbl


def _member_mask(tbl, keys_tbl, kcols):
    """Boolean row mask: True where ``tbl``'s key tuple appears in
    ``keys_tbl``. Single-column keys keep the vectorized ``is_in``
    fast path; composite keys use an index-carrying hash semi-join —
    EXACT set membership, no hashing shortcut (r16). NULL key columns
    never match (SQL equality), matching the engine's delete rule."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if len(kcols) == 1:
        return (
            pc.is_in(
                tbl.column(kcols[0]).combine_chunks(),
                value_set=keys_tbl.column(kcols[0]).combine_chunks(),
            )
            .fill_null(False)
            .to_numpy(zero_copy_only=False)
            .copy()
        )
    n = tbl.num_rows
    mask = np.zeros(n, dtype=bool)
    if n == 0 or keys_tbl.num_rows == 0:
        return mask
    hit = (
        tbl.select(kcols)
        .append_column("__ridx", pa.array(np.arange(n, dtype=np.int64)))
        .join(
            keys_tbl.group_by(kcols).aggregate([]),
            keys=kcols,
            join_type="left semi",
        )
        .column("__ridx")
        .to_numpy(zero_copy_only=False)
    )
    mask[hit.astype(np.int64)] = True
    return mask


def _row_key_hashes(tbl, kcols):
    """Per-ROW uint64 hash of each row's key tuple (the kidx hash
    family — splitmix64 ints, sha256-8 strings, scalar fallback for
    other types, ordered _mix2 fold for composites) plus a validity
    mask: rows with a NULL in any key column never match (SQL
    equality). Vectorized for int/string key columns."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from s3_kinesis_replay_spark.operators.table_format import (
        _hash_arrow_column,
        _key_hash_py,
        _mix2_np,
    )

    n = tbl.num_rows
    valid = np.ones(n, dtype=bool)
    acc = None
    for k in kcols:
        col = tbl.column(k).combine_chunks()
        valid &= ~pc.is_null(col).to_numpy(zero_copy_only=False)
        t = col.type
        if pa.types.is_integer(t):
            h = _hash_arrow_column(col.fill_null(0))
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            h = _hash_arrow_column(col.fill_null(""))
        else:
            # fill value is irrelevant — NULL rows are masked invalid
            h = np.fromiter(
                (_key_hash_py(v) for v in col.to_pylist()),
                dtype=np.uint64,
                count=n,
            )
        acc = h if acc is None else _mix2_np(acc, h)
    if acc is None:
        acc = np.zeros(n, dtype=np.uint64)
    return acc, valid


def _in_sorted_set(hashes, sorted_set):
    """Membership of each hash in a SORTED uint64 array (searchsorted,
    the _kidx_may_contain probe per element)."""
    import numpy as np

    out = np.zeros(len(hashes), dtype=bool)
    if not len(sorted_set) or not len(hashes):
        return out
    idx = np.searchsorted(sorted_set, hashes)
    idx[idx >= len(sorted_set)] = len(sorted_set) - 1
    return sorted_set[idx] == hashes


def _load_hash_set(path: str, inline):
    """A shipped verdict set: inline bytes beat the path (read-only
    root fallback); neither means the empty set."""
    import numpy as np

    if inline is not None:
        return np.frombuffer(inline, dtype="<u8")
    if path:
        try:
            return np.fromfile(path, dtype="<u8")
        except OSError:
            # the plan file vanished between planning and execution
            # (external cleanup) — surface loudly, a silent empty set
            # would relabel every update as an insert
            raise RuntimeError(
                f"CDC plan sidecar {path} unreadable — re-run the batch"
            )
    return np.empty(0, dtype=np.uint64)


def _project(tbl, schema):
    """Project an Arrow table onto the read schema: cast shared columns,
    NULL-fill absent ones (add-column evolution) — the same rule the
    snapshot_table source applies."""
    import pyarrow as pa

    cols = []
    for fld in schema:
        if fld.name in tbl.column_names:
            cols.append(tbl.column(fld.name).cast(fld.type))
        else:
            cols.append(pa.nulls(tbl.num_rows, type=fld.type))
    return pa.table(cols, schema=schema)


def _dflt_values(m: dict, seq) -> tuple:
    """((col, value), ...) for this manifest's initial defaults that
    apply to a file of sequence ``seq`` (r16) — the evaluated constants
    recorded at declare time, so workers need no SparkSession."""
    from s3_kinesis_replay_spark.operators.table_format import (
        _dflt_cols_for,
    )

    defaults = m.get("column_defaults") or {}
    return tuple(
        (c, defaults[c].get("value"))
        for c in _dflt_cols_for(m, seq)
    )


def _apply_defaults(out, defaults):
    """Overwrite the defaulted columns with their constants — exact,
    not coalesce: the runner only ships a default for files that
    PREDATE the column, so the projected column is all-NULL filler."""
    import pyarrow as pa

    for c, v in defaults:
        i = out.schema.get_field_index(c)
        if i < 0:
            # a LIVE add-column-default landed after this stream pinned
            # its schema: the pinned output cannot carry the column, so
            # there is nothing to fill (r16 review — field(-1) would
            # grab the last column / crash the stream)
            continue
        fld = out.schema.field(i)
        arr = (
            pa.nulls(out.num_rows, type=fld.type)
            if v is None
            else pa.array([v] * out.num_rows).cast(fld.type)
        )
        out = out.set_column(i, fld, arr)
    return out


class SnapshotChangesStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options) -> None:
        self.root = options.get("root")
        if not self.root:
            raise ValueError("snapshot_changes requires .option('root', ...)")
        from s3_kinesis_replay_spark.streaming.snapshot_source import (
            _resolve_starting,
        )

        self.starting = _resolve_starting(self.root, options)
        mvpb = options.get("max_versions_per_batch")
        self.max_versions = int(mvpb) if mvpb is not None else None
        self._pos: int | None = None  # monotone batch-END tracker
        from s3_kinesis_replay_spark.operators.table_format import (
            _read_manifest,
            latest_version,
        )
        from s3_kinesis_replay_spark.streaming.snapshot_source import (
            _arrow_schema_of,
        )

        self._init_head = latest_version(self.root)
        latest_m = _read_manifest(self.root, self._init_head)
        cols = latest_m.get("schema")
        if cols is None:
            raise ValueError(
                f"table {self.root} has no recorded schema (legacy "
                "lineage) — compact/overwrite once before streaming CDC"
            )
        from s3_kinesis_replay_spark.streaming.snapshot_source import (
            _refuse_rename_history,
        )

        # r15: per-file Arrow projection is by NAME — it cannot apply a
        # rename mapping (batch snapshot_row_changes can); refuse when
        # the consumed range contains rename/drop history
        _refuse_rename_history(self.root, self.starting)
        self._arrow_schema = _arrow_schema_of([*cols, *_CHANGE_COLS])
        self._data_schema = _arrow_schema_of(cols)

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
            v = max(v, self._pos)  # never regress (snapshot_source rule)
        return {"version": max(v, self.starting)}

    def partitions(self, start: dict, end: dict):
        from s3_kinesis_replay_spark.operators.table_format import (
            _delete_entries,
            _entries,
            _pos_delete_entries,
            _read_manifest,
        )

        lo, hi = start["version"], end["version"]
        self._pos = max(self._pos or 0, hi)
        parts: list[ChangePartition] = []
        # starting_version=0 = "from genesis": the predecessor is the
        # empty table, so v1 (even a genesis overwrite) is pure inserts
        prev = {"version": 0} if lo == 0 else _read_manifest(self.root, lo)
        for v in range(lo + 1, hi + 1):
            m = _read_manifest(self.root, v)
            op = m["operation"]
            prev_paths = {e["path"] for e in _entries(prev, self.root)}
            new_data = [
                e
                for e in _entries(m, self.root)
                if e["path"] not in prev_paths
            ]
            del_prev = {
                e["path"] for e in _delete_entries(prev, self.root)
            }
            new_del = [
                d["path"]
                for d in _delete_entries(m, self.root)
                if d["path"] not in del_prev
            ]
            pdel_prev = {
                e["path"] for e in _pos_delete_entries(prev, self.root)
            }
            new_pdel = [
                d["path"]
                for d in _pos_delete_entries(m, self.root)
                if d["path"] not in pdel_prev
            ]
            if op in ("rename_column", "drop_column"):
                raise ValueError(
                    f"commit v{v} is '{op}' — a column rename/drop "
                    "changes the name mapping mid-stream; use batch "
                    "snapshot_row_changes, or snapshot_compact and "
                    "restart"
                )
            if op == "widen_column" and v > self._init_head:
                # a widening in the BACKLOG is fine (the pinned schema
                # was read at init, after it, and old files cast UP);
                # a LIVE widening leaves this stream's pinned schema
                # narrower than files appended after it — refuse
                # rather than down-cast (r16)
                raise ValueError(
                    f"commit v{v} is 'widen_column' — the column type "
                    "widened after this stream started; restart the "
                    "stream (its pinned schema predates the widening)"
                )
            if op in ("compact", "cluster", "compact_small") or not (
                new_data or new_del or new_pdel
            ):
                prev = m  # row-preserving / metadata-only: no events
                continue
            if op in ("overwrite", "restore") and prev_paths:
                # an overwrite onto an EMPTY predecessor (genesis under
                # starting_version=0) replaces nothing: insert-only
                raise ValueError(
                    f"commit v{v} is '{op}' — a rewrite that replaces "
                    "files loses row provenance; streaming CDC covers "
                    "append / delete / update / merge commits (restart "
                    "the feed from a later version)"
                )
            if new_del and new_data:
                # MERGE (r15, VERDICT r14 item 2): the runner classifies
                # the commit's keys at PLAN time — one bounded pass over
                # the stats-pruned prior view's key columns — and ships
                # the matched-key verdict to the postimage workers; the
                # preimage is the delete machinery relabeled.
                kl = _kcols(m["delete_key"])
                wire_key = kl[0] if len(kl) == 1 else tuple(kl)
                # the commit's key columns, read ONCE (review r15: the
                # range, the matched-key pass, and the kidx probe each
                # re-read these files before)
                key_tbl = self._read_key_tbl(new_del, kl)
                ranges = self._tbl_ranges(key_tbl, kl)
                matched = self._matched_keys(prev, kl, key_tbl, ranges)
                m_path, m_inline = self._ship_hash_set(v, "match", matched)
                # postimage keys (r15, clause-form merges): a tombstoned
                # key with NO new-data row is a DELETE, not a dangling
                # update_preimage — the preimage workers split per row
                # on this set. Runner read bounded by the commit's own
                # new files (for a plain upsert it equals the key file).
                pk = self._file_key_set(
                    [e["path"] for e in new_data], kl
                )
                p_path, p_inline = self._ship_hash_set(v, "post", pk)
                for e in new_data:
                    parts.append(
                        ChangePartition(
                            kind="post_split",
                            path=os.path.join(self.root, e["path"]),
                            rel_path=e["path"],
                            version=v,
                            key_col=wire_key,
                            match_path=m_path,
                            match_inline=m_inline,
                            arrow_schema=self._arrow_schema,
                        )
                    )
                pre_parts = self._eq_preimage_parts(
                    prev, new_del, kl, "update_preimage", v, ranges,
                    key_tbl=key_tbl,
                )
                for p in pre_parts:
                    p.merge_pre = True
                    p.post_path = p_path
                    p.post_inline = p_inline
                parts.extend(pre_parts)
                prev = m
                continue
            # replaceWhere (r16): the removed slice and its replacement
            # share no row identity — delete + insert, never update
            # pairs (same classification as batch snapshot_row_changes)
            post_type = (
                "insert"
                if op == "overwrite_where" or not new_pdel
                else "update_postimage"
            )
            for e in new_data:
                parts.append(
                    ChangePartition(
                        kind="rows",
                        path=os.path.join(self.root, e["path"]),
                        rel_path=e["path"],
                        ctype=post_type,
                        version=v,
                        arrow_schema=self._arrow_schema,
                    )
                )
            if new_pdel:
                pre_type = (
                    "update_preimage"
                    if new_data and op != "overwrite_where"
                    else "delete"
                )
                named = self._addressed_files(new_pdel)
                seq_of = {
                    e["path"]: e.get("seq")
                    for e in _entries(prev, self.root)
                }
                for rel in named:
                    parts.append(
                        ChangePartition(
                            kind="pos_pre",
                            path=os.path.join(self.root, rel),
                            rel_path=rel,
                            ctype=pre_type,
                            version=v,
                            new_paths=tuple(
                                os.path.join(self.root, p)
                                for p in new_pdel
                            ),
                            defaults=_dflt_values(
                                prev, seq_of.get(rel)
                            ),
                            arrow_schema=self._arrow_schema,
                        )
                    )
            if new_del:
                kl = _kcols(m["delete_key"])
                key_tbl = self._read_key_tbl(new_del, kl)
                ranges = self._tbl_ranges(key_tbl, kl)
                parts.extend(
                    self._eq_preimage_parts(
                        prev, new_del, kl, "delete", v, ranges,
                        key_tbl=key_tbl,
                    )
                )
            prev = m
        return parts

    def _ship_hash_set(self, v: int, tag: str, values):
        """Write one MERGE verdict set as a sorted uint64 hash sidecar
        under <root>/_cdcplan (idempotent deterministic name per
        version, atomic replace — a restarted stream re-plans and
        rewrites the same bytes) and return (path, None); on an
        unwritable root, fall back to (\"\", inline_bytes). O(keys x
        8 B) once per commit either way; vacuum reaps sidecars of
        dropped versions."""
        from s3_kinesis_replay_spark.operators.table_format import (
            _kidx_hash_set,
        )

        blob = _kidx_hash_set(list(values)).astype("<u8").tobytes()
        d = os.path.join(self.root, "_cdcplan")
        try:
            os.makedirs(d, exist_ok=True)
            p = os.path.join(d, f"v{v}-{tag}.u64")
            tmp = f"{p}.tmp{os.getpid()}"
            with open(tmp, "wb") as fh:
                fh.write(blob)
            os.replace(tmp, p)
            return p, None
        except OSError:
            return "", blob

    def _read_key_tbl(self, new_del: list, kl: list):
        """The commit's delete-key columns across its key files, as one
        Arrow table with any-NULL-key rows dropped, CAST to the pinned
        read schema's key types — read once per commit and shared by
        the range computation, the matched-key classification, and the
        kidx probe. Single-column keys are the one-column case of the
        same table (r16 composite identity)."""
        import pyarrow.parquet as pq

        return _cast_keys(
            _concat(
                [
                    pq.read_table(os.path.join(self.root, p), columns=kl)
                    for p in new_del
                ]
            ).drop_null(),
            kl,
            self._data_schema,
        )

    @staticmethod
    def _tbl_ranges(key_tbl, kl: list) -> dict:
        """Per-column (min, max) of the key table — {col: (None, None)}
        when empty or incomparable (skip disabled for that column, all
        files stay candidates)."""
        import pyarrow.compute as pc

        out = {}
        for k in kl:
            try:
                col = key_tbl.column(k)
                if len(col) == 0:
                    out[k] = (None, None)
                    continue
                mm = pc.min_max(col).as_py()
                out[k] = (mm["min"], mm["max"])
            except Exception:
                out[k] = (None, None)
        return out

    @staticmethod
    def _tbl_values(key_tbl, kl: list) -> list:
        """Key table → python values: scalars for a single-column key,
        tuples (in key order) for a composite."""
        if len(kl) == 1:
            return key_tbl.column(kl[0]).to_pylist()
        return list(
            zip(*[key_tbl.column(k).to_pylist() for k in kl])
        )

    def _eq_preimage_parts(
        self, prev: dict, new_del: list, kl: list, ctype: str, v: int,
        ranges: dict, key_tbl=None,
    ) -> list:
        """Preimage partitions for an equality-delete (ctype 'delete')
        or merge (ctype 'update_preimage') commit: one eq_pre partition
        per data file VISIBLE at v-1 that survives the stats skip."""
        from s3_kinesis_replay_spark.operators.table_format import (
            _delete_entries,
            _entries,
            _pos_delete_entries,
        )

        prior_dels = _delete_entries(prev, self.root)
        prior_pos = tuple(
            os.path.join(self.root, p["path"])
            for p in _pos_delete_entries(prev, self.root)
        )
        parts: list[ChangePartition] = []
        # manifest-stats file skip (r14): a file whose recorded
        # [min, max] for ANY key column is disjoint from that column's
        # delete-key range cannot hold a preimage — at 100 TB a delete
        # of recent keys skips the cold files entirely. Stats-less
        # entries stay candidates (the usual conservatism). Then the
        # key-hash-index probe (r15) prunes overlapping-range candidates.
        cands = [
            e
            for e in _entries(prev, self.root)
            if not self._stats_disjoint(e, ranges)
        ]
        cands = self._kidx_survivors(cands, kl, key_tbl)
        wire_key = kl[0] if len(kl) == 1 else tuple(kl)
        for e in cands:
            es = e.get("seq")
            applicable = tuple(
                os.path.join(self.root, d["path"])
                for d in prior_dels
                if es is None or d.get("seq") is None or d["seq"] > es
            )
            parts.append(
                ChangePartition(
                    kind="eq_pre",
                    path=os.path.join(self.root, e["path"]),
                    rel_path=e["path"],
                    ctype=ctype,
                    version=v,
                    key_col=wire_key,
                    new_paths=tuple(
                        os.path.join(self.root, p) for p in new_del
                    ),
                    prior_eq=applicable,
                    prior_pos=prior_pos,
                    defaults=_dflt_values(prev, es),
                    arrow_schema=self._arrow_schema,
                )
            )
        return parts

    def _kidx_survivors(self, entries: list, kl: list, key_tbl) -> list:
        """Key-hash-index probe (r15): drop candidates whose sorted
        hash sidecar provably excludes every one of the commit's keys
        (the shared, already-read key table). Bounded: keys hashed
        once, one sorted intersection per file. Composite keys probe
        the folded tuple hash (r16)."""
        from s3_kinesis_replay_spark.operators.table_format import (
            _key_list,
            _kidx_hash_set,
            _kidx_may_contain,
        )

        if key_tbl is None or not any(
            (e.get("kidx") or {}).get("col") is not None
            and _key_list(e["kidx"]["col"]) == kl
            for e in entries
        ):
            return entries
        probe = _kidx_hash_set(self._tbl_values(key_tbl, kl))
        return [
            e
            for e in entries
            if _kidx_may_contain(self.root, e, kl, probe)
        ]

    @staticmethod
    def _stats_disjoint(e: dict, ranges: dict) -> bool:
        """True when the entry's recorded [min, max] for ANY key column
        is provably disjoint from that column's delete-key range (safe
        to skip — per-column overlap is a necessary condition for a
        composite tuple match)."""
        for key, (klo, khi) in ranges.items():
            st = (e.get("stats") or {}).get(key)
            if (
                klo is None
                or not st
                or not isinstance(st, list)
                or len(st) != 2
                or st[0] is None
                or st[1] is None
            ):
                continue
            try:
                if st[1] < klo or st[0] > khi:
                    return True
            except TypeError:
                continue  # incomparable types: candidate
        return False

    def _matched_keys(
        self, prev: dict, kl: list, key_tbl, ranges: dict
    ) -> set:
        """Plan-time MERGE key classification (r15): the subset of the
        commit's source keys with a VISIBLE row at v-1 — the split that
        decides update_postimage vs insert. One bounded runner pass:
        the commit's key files are small by construction (the merge
        source, unique keys enforced at commit), and only prior data
        files whose stats overlap the keys' range are read — key
        COLUMNS only — under the same sequence-scoped delete-state
        rebuild the eq_pre worker applies (prior equality-delete keys
        anti-joined per file seq, prior position-delete addresses
        masked by row index). Matches the batch snapshot_row_changes
        `ex` set exactly: keys whose prior VISIBLE preimage is
        non-empty. Composite keys (r16) use exact join-based
        membership; the returned set holds scalars (single) or
        tuples (composite, key order)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from s3_kinesis_replay_spark.operators.table_format import (
            _delete_entries,
            _entries,
            _pos_delete_entries,
        )

        merge_keys = key_tbl.group_by(kl).aggregate([])
        if merge_keys.num_rows == 0:
            return set()
        prior_dels = _delete_entries(prev, self.root)
        del_tbls = {
            d["path"]: _cast_keys(
                pq.read_table(
                    os.path.join(self.root, d["path"]), columns=kl
                ),
                kl,
                self._data_schema,
            )
            for d in prior_dels
        }
        pos_tbl = None
        prior_pos = _pos_delete_entries(prev, self.root)
        if prior_pos:
            pos_tbl = _concat(
                [
                    pq.read_table(
                        os.path.join(self.root, p["path"]),
                        columns=["file_path", "pos"],
                    )
                    for p in prior_pos
                ]
            )
        matched: set = set()
        cands = [
            e
            for e in _entries(prev, self.root)
            if not self._stats_disjoint(e, ranges)
        ]
        cands = self._kidx_survivors(cands, kl, key_tbl)
        for e in cands:
            ktbl = _cast_keys(
                pq.read_table(
                    os.path.join(self.root, e["path"]), columns=kl
                ),
                kl,
                self._data_schema,
            )
            mask = _member_mask(ktbl, merge_keys, kl)
            if not mask.any():
                continue
            es = e.get("seq")
            appl = [
                d["path"]
                for d in prior_dels
                if es is None or d.get("seq") is None or d["seq"] > es
            ]
            for dp in appl:
                mask &= ~_member_mask(ktbl, del_tbls[dp], kl)
            if pos_tbl is not None and mask.any():
                mine = pos_tbl.filter(
                    pc.equal(pos_tbl.column("file_path"), e["path"])
                ).column("pos").to_numpy(zero_copy_only=False)
                mine = mine[(mine >= 0) & (mine < len(mask))].astype(
                    np.int64
                )
                mask[mine] = False
            if mask.any():
                matched.update(
                    self._tbl_values(
                        ktbl.filter(pa.array(mask)).drop_null(), kl
                    )
                )
        return matched

    def _file_key_set(self, rel_paths: list[str], kl: list) -> set:
        """Distinct non-null key values across the named parquet files
        (runner-side, key columns only, bounded by the commit's own
        file set), under the PINNED schema's types; tuples for
        composite keys."""
        import pyarrow.parquet as pq

        out: set = set()
        for p in rel_paths:
            tbl = _cast_keys(
                pq.read_table(
                    os.path.join(self.root, p), columns=kl
                ).drop_null(),
                kl,
                self._data_schema,
            )
            out.update(self._tbl_values(tbl, kl))
        return out

    def _addressed_files(self, new_pdel: list[str]) -> list[str]:
        """Root-relative data files a commit's address rows name —
        driver-side, bounded by the files the delete touched."""
        import pyarrow.parquet as pq

        named: set[str] = set()
        for p in new_pdel:
            tbl = pq.read_table(
                os.path.join(self.root, p), columns=["file_path"]
            )
            named.update(tbl.column("file_path").to_pylist())
        return sorted(named)

    def read(self, partition):  # executor-side, stateless
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        p = partition
        full = p.arrow_schema
        change_names = {c for c, _t in _CHANGE_COLS}
        data_schema = pa.schema(
            [f for f in full if f.name not in change_names]
        )
        import numpy as np

        tbl = pq.read_table(p.path)
        idx = pa.array(np.arange(tbl.num_rows, dtype=np.int64))
        kcols = _kcols(p.key_col) if p.key_col else []
        if kcols:
            # align physical key types to the pinned schema BEFORE any
            # join or hash — files written before a type widening carry
            # the narrower physical type (review r16)
            tbl = _cast_keys(tbl, kcols, data_schema)

        def hash_mask(out_tbl, path, inline):
            """Rows whose key-tuple hash is in the shipped verdict
            set (NULL-keyed rows never match)."""
            sset = _load_hash_set(path, inline)
            hashes, valid = _row_key_hashes(out_tbl.select(kcols), kcols)
            return pa.array(_in_sorted_set(hashes, sset) & valid)

        if p.kind == "post_split":
            # MERGE postimage: rows whose key the runner classified as
            # matched (visible at v-1) are update_postimage, the rest
            # insert — per-row change type, zero cross-file work here
            out = _project(tbl, data_schema)
            mask = hash_mask(out, p.match_path, p.match_inline)
            ctype = pc.if_else(
                mask,
                pa.scalar("update_postimage"),
                pa.scalar("insert"),
            )
            out = out.append_column("_change_type", ctype).append_column(
                "_commit_version",
                pa.array([p.version] * out.num_rows, type=pa.int64()),
            )
            yield from out.cast(full).to_batches()
            return
        if p.kind == "rows":
            out = _project(tbl, data_schema)
        elif p.kind == "pos_pre":
            addrs = _concat(
                [
                    pq.read_table(ap, columns=["file_path", "pos"])
                    for ap in p.new_paths
                ]
            )
            mine = addrs.filter(
                pc.equal(addrs.column("file_path"), p.rel_path)
            ).select(["pos"])
            out = _apply_defaults(
                _project(
                    tbl.append_column("__idx", idx)
                    .join(
                        mine.rename_columns(["__idx"]).combine_chunks(),
                        "__idx",
                        join_type="left semi",
                    )
                    .drop_columns(["__idx"]),
                    data_schema,
                ),
                p.defaults,
            )
        else:  # eq_pre: rebuild visibility, then match the new keys
            cur = tbl.append_column("__idx", idx)
            if p.prior_eq:
                keys = _cast_keys(
                    _concat(
                        [
                            pq.read_table(kp, columns=kcols)
                            for kp in p.prior_eq
                        ]
                    ).combine_chunks(),
                    kcols,
                    data_schema,
                )
                cur = cur.join(
                    keys.group_by(kcols).aggregate([]),
                    kcols,
                    join_type="left anti",
                )
            if p.prior_pos:
                addrs = _concat(
                    [
                        pq.read_table(ap, columns=["file_path", "pos"])
                        for ap in p.prior_pos
                    ]
                )
                mine = addrs.filter(
                    pc.equal(addrs.column("file_path"), p.rel_path)
                ).select(["pos"])
                if mine.num_rows:
                    cur = cur.join(
                        mine.rename_columns(["__idx"]).combine_chunks(),
                        "__idx",
                        join_type="left anti",
                    )
            new_keys = _cast_keys(
                _concat(
                    [
                        pq.read_table(kp, columns=kcols)
                        for kp in p.new_paths
                    ]
                ).combine_chunks(),
                kcols,
                data_schema,
            )
            cur = cur.join(
                new_keys.group_by(kcols).aggregate([]),
                kcols,
                join_type="left semi",
            )
            out = _apply_defaults(
                _project(cur.drop_columns(["__idx"]), data_schema),
                p.defaults,
            )
            if p.merge_pre:
                # merge preimage split (r15, clause forms): a tombstoned
                # row whose key has a postimage copy is update_preimage;
                # one with none was DELETED by a matched/not-matched-by-
                # source DELETE clause
                has_post = hash_mask(out, p.post_path, p.post_inline)
                ctype = pc.if_else(
                    has_post,
                    pa.scalar("update_preimage"),
                    pa.scalar("delete"),
                )
                out = out.append_column(
                    "_change_type", ctype
                ).append_column(
                    "_commit_version",
                    pa.array([p.version] * out.num_rows, type=pa.int64()),
                )
                yield from out.cast(full).to_batches()
                return
        n = out.num_rows
        out = out.append_column(
            "_change_type", pa.array([p.ctype] * n, type=pa.string())
        ).append_column(
            "_commit_version", pa.array([p.version] * n, type=pa.int64())
        )
        yield from out.cast(full).to_batches()

    def commit(self, end: dict) -> None:
        self._pos = max(self._pos or 0, end["version"])

    def stop(self) -> None:
        pass


class SnapshotChangesDataSource(DataSource):
    """``spark.readStream.format("snapshot_changes")`` — see module doc."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_changes"

    def schema(self) -> str:
        from s3_kinesis_replay_spark.operators.table_format import (
            _read_manifest,
            _schema_ddl,
            latest_version,
        )

        root = self.options.get("root", "")
        v = latest_version(root)
        if v == 0:
            raise ValueError(f"no snapshots under {root} — nothing to stream")
        schema = _read_manifest(root, v).get("schema")
        if schema is None:
            raise ValueError(
                f"table {root} has no recorded schema (legacy lineage)"
            )
        return _schema_ddl([*schema, *_CHANGE_COLS])

    def streamReader(self, schema) -> SnapshotChangesStreamReader:
        return SnapshotChangesStreamReader(schema, self.options)


def register_changes_source(spark) -> None:
    """Idempotent registration of the 'snapshot_changes' stream format."""
    spark.dataSource.register(SnapshotChangesDataSource)
