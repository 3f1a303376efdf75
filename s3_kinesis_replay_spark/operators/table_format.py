"""Manifest-versioned parquet tables: time travel + vacuum (SURVEY §2.A8
maintenance tier, r11).

A deliberately minimal member of the Delta/Iceberg/Hudi family (public
designs), built only on immutable parquet files + atomic manifest swaps:

* ``data/``: immutable parquet files, written once, NEVER rewritten or
  appended in place. Writers add files; only vacuum deletes them.
* ``manifests/v{N}.json``: snapshot N = an explicit list of the data
  files visible at version N, plus the operation that produced it.
  Written to a temp name and ``os.replace``d — readers see an old
  complete manifest or a new complete manifest, never a partial one.
* ``_latest``: one-line pointer to the newest version, same atomic-swap
  discipline (the export_behind_pointer convention).

Why this shape survives 100 TB: a snapshot is O(#files) metadata, not
O(data); appends commit without touching history (the a13/a14 lesson);
time travel is "read the old file list" — no copy-on-write of data; and
vacuum's reachability set is the union of kept manifests' file lists, so
retention is a metadata diff plus deletes of provably-unreferenced
files. Commits use an optimistic-concurrency create-exclusive
(os.link) so racing writers conflict loudly instead of silently
overwriting each other (CommitConflict -> re-read + retry).
Row-level deletes are MERGE-ON-READ (snapshot_delete): a delete commit
adds a key file, readers anti-join it, data files stay byte-untouched
until a compaction rewrites them. What it deliberately omits vs the
real formats: column-level stats in manifests (parquet footers already
carry them — see layout.py's candidate_files, lifted into
snapshot_read_pruned) and position-based (row-offset) delete vectors —
keys are the fixtures' natural identity.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3_kinesis_replay_spark.operators.layout import file_overlaps


def _manifest_dir(root: str) -> str:
    return os.path.join(root, "manifests")


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(_manifest_dir(root), f"v{version}.json")


def latest_version(root: str) -> int:
    """Newest committed version (0 = empty table). The MANIFEST FILES are
    the source of truth — each lands atomically via os.replace, so a
    manifest's existence IS the commit. The ``_latest`` pointer is only a
    convenience marker (and the atomic-install done-flag for cached
    builds); deriving the version from it instead caused a real
    lost-write hazard (review r11): a crash between manifest write and
    pointer swap left an orphaned manifest that batch-id dedup could
    see but the next commit's numbering would silently overwrite."""
    vs = versions(root)
    return max(vs) if vs else 0


def versions(root: str) -> list[int]:
    """All retained versions, ascending (gaps appear after vacuum)."""
    d = _manifest_dir(root)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def _read_manifest(root: str, version: int) -> dict:
    path = _manifest_path(root, version)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"snapshot v{version} not found under {root} "
            f"(retained: {versions(root)}) — vacuumed or never committed"
        )
    with open(path) as f:
        return json.load(f)


class CommitConflict(RuntimeError):
    """Another writer committed this version first — re-read the table
    state (the new latest manifest) and retry the commit on top of it."""


def _commit(
    root: str,
    files: list[str],
    op: str,
    delete_files: list[str] | None = None,
    delete_key: str | None = None,
) -> int:
    """Atomically commit a new manifest over ``files`` (relative paths)
    with OPTIMISTIC CONCURRENCY (r11): the manifest is staged to a temp
    name and published with ``os.link`` — an atomic create-EXCLUSIVE, so
    of two racing writers targeting the same version number exactly one
    wins and the loser gets :class:`CommitConflict` instead of silently
    overwriting the winner's manifest (``os.replace`` did exactly that —
    the Iceberg commit protocol exists for this race). The loser's
    correct move is re-read + retry on the new latest."""
    os.makedirs(_manifest_dir(root), exist_ok=True)
    v = latest_version(root) + 1
    manifest = {"version": v, "operation": op, "files": sorted(files)}
    if delete_files:
        manifest["delete_files"] = sorted(delete_files)
        manifest["delete_key"] = delete_key
    tmp = _manifest_path(root, v) + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    try:
        os.link(tmp, _manifest_path(root, v))
    except FileExistsError:
        raise CommitConflict(
            f"v{v} was committed concurrently under {root} — re-read "
            "latest and retry"
        ) from None
    finally:
        os.unlink(tmp)
    ptr_tmp = os.path.join(root, f"_latest.tmp-{uuid.uuid4().hex[:8]}")
    with open(ptr_tmp, "w") as f:
        f.write(str(v))
    os.replace(ptr_tmp, os.path.join(root, "_latest"))
    return v


def snapshot_write(
    spark: SparkSession, df: DataFrame, root: str, mode: str = "append"
) -> int:
    """Write ``df`` as new immutable data files and commit a snapshot.
    ``mode='append'``: new version = prior file list + the new files
    (history untouched — the a14 discipline). ``mode='overwrite'``: new
    version lists ONLY the new files; the old files stay on disk,
    reachable through older manifests until vacuum. Returns the
    committed version number."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    part = f"part-{uuid.uuid4().hex[:12]}"
    out_dir = os.path.join(root, "data", part)
    df.write.mode("error").parquet(out_dir)
    new_files = [
        os.path.join("data", part, f)
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    ]
    prior: list[str] = []
    prior_del: list[str] = []
    prior_key = None
    if mode == "append" and latest_version(root) > 0:
        pm = _read_manifest(root, latest_version(root))
        prior = pm["files"]
        prior_del = pm.get("delete_files", [])
        prior_key = pm.get("delete_key")
    return _commit(
        root, prior + new_files, mode,
        delete_files=prior_del, delete_key=prior_key,
    )


def snapshot_read(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read the table AS OF ``version`` (default: latest) — time travel
    is nothing but reading an older manifest's file list. Raises
    FileNotFoundError for a vacuumed/unknown version."""
    v = latest_version(root) if version is None else version
    m = _read_manifest(root, v)
    if not m["files"]:
        raise ValueError(f"snapshot v{v} is empty")
    df = spark.read.parquet(*[os.path.join(root, f) for f in m["files"]])
    dels = m.get("delete_files", [])
    if dels:
        # MERGE-ON-READ: the delete-key files are tiny relative to data,
        # so the anti-join broadcasts; data files stay byte-untouched
        # until a compaction folds the deletes in
        keys = spark.read.parquet(*[os.path.join(root, f) for f in dels])
        df = df.join(
            F.broadcast(keys.select(m["delete_key"]).distinct()),
            m["delete_key"],
            "left_anti",
        )
    return df


def snapshot_vacuum(root: str, keep_last: int = 2) -> dict:
    """Retention: drop all but the newest ``keep_last`` manifests, then
    delete every data file not referenced by a RETAINED manifest (the
    reachability rule that makes Delta-style VACUUM safe). Returns
    {'dropped_versions': [...], 'deleted_files': n, 'kept_files': n}."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    vs = versions(root)
    if not vs:
        # review r11: with zero manifests the reachable set is empty and
        # the walk below would delete EVERY data file — refuse loudly
        # (lost manifests dir, wrong root, vacuum before first commit).
        raise ValueError(
            f"no manifests under {root} — refusing to vacuum (an empty "
            "reachable set would delete every data file)"
        )
    keep, drop = vs[-keep_last:], vs[:-keep_last]
    reachable: set[str] = set()
    for v in keep:
        m = _read_manifest(root, v)
        reachable.update(m["files"])
        reachable.update(m.get("delete_files", []))
    deleted = 0
    data_root = os.path.join(root, "data")
    for dirpath, _dirs, files in os.walk(data_root, topdown=False):
        # separator-anchored prefix test (review r11: bare startswith let
        # reachable 'data/batch-10/...' shield dead 'data/batch-1/')
        rel_dir = os.path.relpath(dirpath, root)
        dir_reachable = any(r.startswith(rel_dir + os.sep) for r in reachable)
        for f in files:
            full = os.path.join(dirpath, f)
            rel = os.path.relpath(full, root)
            if f.endswith(".parquet") and rel not in reachable:
                os.remove(full)
                deleted += 1
                # Hadoop local-FS checksum sibling of the deleted file
                crc = os.path.join(dirpath, f".{f}.crc")
                if os.path.exists(crc):
                    os.remove(crc)
            elif (
                not f.endswith(".parquet")
                and not dir_reachable
                and dirpath != data_root
            ):
                # _SUCCESS/.crc markers of a fully-unreferenced part dir
                # (the walk's file list was snapshotted before the
                # parquet branch removed crc siblings — tolerate gone)
                if os.path.exists(full):
                    os.remove(full)
        if dirpath != data_root and not os.listdir(dirpath):
            os.rmdir(dirpath)
    for v in drop:
        os.remove(_manifest_path(root, v))
    return {
        "dropped_versions": drop,
        "deleted_files": deleted,
        "kept_files": len(reachable),
    }


def snapshot_changes(
    spark: SparkSession, root: str, from_version: int, to_version: int
) -> DataFrame:
    """FILE-LEVEL change-data capture between two snapshots: the rows
    added between ``from_version`` and ``to_version``, read from ONLY
    the manifest file-list diff — for append commits this is exact
    row-level CDC with ZERO data diffing (the new files ARE the new
    rows; Delta's CDF for append-only workloads works the same way).
    Refuses non-append histories: after an overwrite, a file diff is a
    layout diff, not a row diff — that case needs c2d's snapshot-diff
    (key-level compare), and silently returning it as 'changes' would
    be wrong-answer territory."""
    if to_version <= from_version:
        raise ValueError("to_version must be > from_version")
    frm = set(_read_manifest(root, from_version)["files"])
    for v in range(from_version + 1, to_version + 1):
        m = _read_manifest(root, v)
        # tagged appends ("append:b<batch_id>", the a15c idempotent
        # streaming commits) are appends for CDC purposes
        if not m["operation"].startswith("append"):
            raise ValueError(
                f"v{v} is '{m['operation']}', not append — file-diff CDC "
                "is only row-exact over append-only history; use a "
                "key-level snapshot diff instead"
            )
    added = sorted(set(_read_manifest(root, to_version)["files"]) - frm)
    if not added:
        raise ValueError(
            f"no files added between v{from_version} and v{to_version}"
        )
    return spark.read.parquet(*[os.path.join(root, f) for f in added])


def snapshot_read_pruned(
    spark: SparkSession,
    root: str,
    preds: dict[str, tuple],
    version: int | None = None,
) -> tuple[DataFrame, int, int]:
    """Time-travel read with MANIFEST-LEVEL FILE SKIPPING: the snapshot's
    file list is pruned against [lo, hi] column predicates using parquet
    footer min/max (operators/layout.py::file_overlaps — the identical
    semantics the zorder layout's pruning measurement uses), and only
    overlapping files are handed to Spark; the residual predicate is
    re-applied on the scan for row-level exactness. Returns
    (df, files_read, files_total). Iceberg keeps these stats IN the
    manifest to skip the footer reads too; here the footers are the
    stats store (one bounded driver-side read per file, no data pages) —
    at 100 TB you'd lift them into the manifest at commit time, which
    changes where the numbers live, not the pruning rule."""
    v = latest_version(root) if version is None else version
    m = _read_manifest(root, v)
    keep = [
        f
        for f in m["files"]
        if file_overlaps(os.path.join(root, f), preds)
    ]
    if not keep:
        # empty candidate set: preserve schema by reading one file with
        # an always-false filter rather than inventing a schema
        df = spark.read.parquet(os.path.join(root, m["files"][0])).limit(0)
    else:
        df = spark.read.parquet(*[os.path.join(root, f) for f in keep])
    for col, (lo, hi) in preds.items():
        df = df.filter((F.col(col) >= lo) & (F.col(col) <= hi))
    return df, len(keep), len(m["files"])


def snapshot_delete(
    spark: SparkSession, root: str, keys: DataFrame, key_col: str
) -> int:
    """MERGE-ON-READ row deletes: commit a snapshot whose data files are
    UNCHANGED plus a new delete-key file readers anti-join (Hudi/Iceberg
    MOR discipline, key-based). O(delete keys) write, zero data rewrite;
    the read-side anti-join cost is what a later compaction (rewrite the
    surviving rows, drop the delete files) amortizes away. Time travel
    still shows the rows at pre-delete versions. Mixed-key-column delete
    chains are refused — one table, one row identity."""
    v = latest_version(root)
    if v == 0:
        raise ValueError("cannot delete from an empty table")
    m = _read_manifest(root, v)
    prior_key = m.get("delete_key")
    if prior_key is not None and prior_key != key_col:
        raise ValueError(
            f"table's delete key is {prior_key!r}; refusing a delete on "
            f"{key_col!r} — one row identity per table"
        )
    part = f"del-{uuid.uuid4().hex[:12]}"
    out_dir = os.path.join(root, "data", part)
    keys.select(key_col).distinct().write.mode("error").parquet(out_dir)
    new_del = [
        os.path.join("data", part, f)
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    ]
    return _commit(
        root,
        m["files"],
        "delete",
        delete_files=m.get("delete_files", []) + new_del,
        delete_key=key_col,
    )


def snapshot_compact(spark: SparkSession, root: str) -> int:
    """COPY-ON-WRITE compaction — the other half of the MOR trade:
    materialize the current merge-on-read view (data minus delete keys)
    into fresh files and commit an overwrite carrying NO delete files,
    paying the rewrite once to drop the per-read anti-join rent. Prior
    versions (including the pre-compaction MOR chain) remain
    time-travel-readable until vacuum reaps them; the delete-key files
    stay on disk exactly as long as a kept manifest references them."""
    v = latest_version(root)
    if v == 0:
        raise ValueError("cannot compact an empty table")
    df = snapshot_read(spark, root, v)
    part = f"part-{uuid.uuid4().hex[:12]}"
    out_dir = os.path.join(root, "data", part)
    df.write.mode("error").parquet(out_dir)
    files = [
        os.path.join("data", part, f)
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    ]
    return _commit(root, files, "compact")
