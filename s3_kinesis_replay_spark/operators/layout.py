"""Multi-dimensional data layout — Z-order (Morton) clustering for
file-level min/max skipping.

Public background: Morton 1966 (interleaved bit codes); the technique as
shipped by Delta Lake's OPTIMIZE ZORDER BY, Apache Hudi clustering, and
Iceberg's z-ordered rewrites. The problem it solves at 100 TB: a table
sorted by ONE column gives tight per-file min/max ranges on that column
only — a predicate on any other column prunes nothing, so a 2-D box
query scans every file. Interleaving the bits of several columns'
bucket ranks makes each file's footprint a small hyper-rectangle in ALL
those dimensions at once: every dimension of a box predicate prunes a
fraction of the files, multiplicatively.

Everything here is codegen column expressions — no UDFs, no shuffle
beyond the ONE repartitionByRange that physically clusters the output:

* bucket: ``floor((x - min) * 2^bits / (max - min + ulp))`` clamped to
  [0, 2^bits) — min/max come from one scalar aggregate pass.
* z-value: bitwise interleave of the bucket codes, built as a sum of
  shiftleft/shiftright/AND terms (WholeStageCodegen keeps it JVM-side).
* layout: ``repartitionByRange(n_files, z)`` + ``sortWithinPartitions``
  → each output file covers a contiguous z-range = a small box in every
  clustered dimension; parquet footers carry the per-file min/max that
  any engine's scan pruning then exploits.

The correctness contract is layout-INVARIANCE (same rows out, pinned by
the a11 oracle); the efficiency contract — fewer candidate files for
box predicates than a single-column sort — is measured from the real
parquet footers in tests/test_operators.py::test_zorder_prunes_box_
predicates and quantified in SCALE.md.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def bucket_code(x: Column, lo: float, hi: float, bits: int) -> Column:
    """Rank-free bucket code in [0, 2^bits): linear min/max scaling —
    one scalar agg supplies lo/hi, no window/ntile (an ntile would
    funnel the table through one partition)."""
    n = 1 << bits
    span = (hi - lo) or 1.0
    raw = F.floor((x.cast("double") - F.lit(float(lo))) / F.lit(span) * n)
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1)).cast("long")


def z_value(codes: list[Column], bits: int) -> Column:
    """Morton-interleave ``len(codes)`` bucket codes of ``bits`` bits
    each into one long: output bit (i*ndims + d) = bit i of code d.
    Pure shiftleft/shiftright/AND terms — stays in codegen."""
    ndims = len(codes)
    z = F.lit(0).cast("long")
    for d, c in enumerate(codes):
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)),
                    i * ndims + d,
                )
            )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    dims: list[Column],
    n_files: int = 16,
    bits: int = 10,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered by the
    Z-order of ``dims`` (numeric column expressions). One aggregate pass
    for min/max, one range shuffle on the z-value, sorted files out.
    The z column itself is dropped — the value of the layout lives in
    the per-file min/max footers of the ORIGINAL columns."""
    mins = df.agg(
        *[F.min(d.cast("double")).alias(f"lo{i}") for i, d in enumerate(dims)],
        *[F.max(d.cast("double")).alias(f"hi{i}") for i, d in enumerate(dims)],
    ).collect()[0]
    if any(
        mins[f"lo{i}"] is None or mins[f"hi{i}"] is None
        for i in range(len(dims))
    ):
        # Degenerate input (empty df or an all-NULL dim): no z-range to
        # cluster by — plain write instead of an obscure None-arithmetic
        # TypeError (ADVICE r9). Still repartition(n_files) so the
        # declared file-count layout contract holds (ADVICE r10).
        df.repartition(n_files).write.mode("overwrite").parquet(path)
        return
    codes = [
        bucket_code(d, mins[f"lo{i}"], mins[f"hi{i}"], bits)
        for i, d in enumerate(dims)
    ]
    (
        df.withColumn("_z", z_value(codes, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_overlaps(file_path: str, preds: dict[str, tuple]) -> bool:
    """Footer-stats overlap test for ONE parquet file against [lo, hi]
    column predicates (extracted from candidate_files in r11 so the
    manifest table's pruned reads share the SAME semantics). One footer
    read, no data pages. Any row group without min/max stats for a
    predicate column keeps the file a candidate — mirroring real engine
    pruning semantics (ADVICE r9: stats-less groups must not be counted
    pruned)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(file_path).metadata
    for col, (lo, hi) in preds.items():
        cmin = cmax = None
        missing_stats = False
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            found = False
            for ci in range(row_group.num_columns):
                c = row_group.column(ci)
                if c.path_in_schema != col:
                    continue
                found = True
                s = c.statistics
                if s is not None and s.has_min_max:
                    cmin = s.min if cmin is None else min(cmin, s.min)
                    cmax = s.max if cmax is None else max(cmax, s.max)
                else:
                    missing_stats = True
            if not found:
                missing_stats = True
        if (
            not missing_stats
            and cmin is not None
            and (cmax < lo or cmin > hi)
        ):
            return False
    return True


def file_column_stats(file_path: str) -> dict[str, list]:
    """Per-column [min, max] for ONE parquet file, read from the footer
    ONCE — the write-time half of manifest-embedded file skipping (r12,
    Iceberg's manifest-stats discipline): the writer just produced the
    file, so its footer is hot; lifting the stats into the manifest here
    means the READ path prunes from O(1) manifest metadata with zero
    per-query footer I/O (the a15d→a15f upgrade).

    Only columns whose stats are (a) present in EVERY row group and
    (b) JSON-serializable scalars (int/float/str/bool) are recorded —
    an omitted column keeps its file a pruning CANDIDATE downstream,
    mirroring file_overlaps' stats-less-group conservatism. NaN bounds
    are skipped too (parquet writers disagree on NaN ordering)."""
    import math

    import pyarrow.parquet as pq

    md = pq.ParquetFile(file_path).metadata
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    bad: set[str] = set()
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            c = row_group.column(ci)
            col = c.path_in_schema
            if col in bad or "." in col:  # nested leaves: not prunable here
                continue
            s = c.statistics
            if s is None or not s.has_min_max:
                bad.add(col)
                continue
            try:
                lo, hi = s.min, s.max
            except Exception:
                # pyarrow cannot decode stats for every physical type
                # (e.g. decimal raises ArrowNotImplementedError, r14) —
                # same conservative answer as stats-less: candidate
                bad.add(col)
                continue
            if not all(
                isinstance(v, (int, float, str, bool))
                and not (isinstance(v, float) and math.isnan(v))
                for v in (lo, hi)
            ):
                bad.add(col)
                continue
            mins[col] = lo if col not in mins else min(mins[col], lo)
            maxs[col] = hi if col not in maxs else max(maxs[col], hi)
    return {
        col: [mins[col], maxs[col]] for col in mins if col not in bad
    }


def candidate_files(path: str, preds: dict[str, tuple]) -> tuple[int, int]:
    """(files overlapping ALL [lo, hi] column predicates, total files)
    straight from the parquet footers via pyarrow — the same min/max
    stats any engine's scan pruning consults. Driver-side but bounded:
    one footer read per file, no data pages."""
    import pyarrow.dataset as ds

    dataset = ds.dataset(path, format="parquet")
    total = 0
    hit = 0
    for f in dataset.files:
        total += 1
        if file_overlaps(f, preds):
            hit += 1
    return hit, total


def _recover_compaction(table_root: str) -> None:
    """Crash recovery for compact_partitions (review r9): a ``.reap-*``
    dir is the old partition parked during the two-rename swap. If the
    live partition dir exists, the swap completed — drop the trash; if
    not, the crash hit between the renames — restore the old dir so no
    partition ever stays missing. Abandoned ``.compact-*`` build dirs
    (failed rewrites) are deleted outright. Leading-dot names are
    invisible to both Spark partition discovery and the ``dt=*`` policy
    glob, so leftovers can never masquerade as partitions."""
    import glob
    import os
    import shutil

    for trash in glob.glob(os.path.join(table_root, ".reap-*")):
        live = os.path.join(
            table_root, os.path.basename(trash).split("-", 2)[2]
        )
        if os.path.isdir(live):
            shutil.rmtree(trash, ignore_errors=True)
        else:
            os.replace(trash, live)
    for tmp in glob.glob(os.path.join(table_root, ".compact-*")):
        shutil.rmtree(tmp, ignore_errors=True)


def compact_partitions(
    spark,
    table_root: str,
    target_rows: int = 4000,
    partition_glob: str = "dt=*",
) -> list[str]:
    """INCREMENTAL compaction: rewrite ONLY the partitions whose
    fragment count exceeds what ``target_rows`` requires, leaving every
    other partition's files byte-untouched — the daily OPTIMIZE shape
    (Delta/Iceberg compaction is always partition-scoped at scale: a
    year-old partition must not be rewritten because today's delivery
    fragmented today's).

    Policy reads parquet FOOTERS only (row counts, one metadata read
    per file — bounded driver work): a partition with f files and r
    rows needs ceil(r/target_rows) files; it is rewritten iff f > that.
    The rewrite range-partitions to exactly ``need`` output files (no
    maxRecordsPerFile re-split — review r9: a boundary-skewed range
    sample could emit need+1 files and make the pass non-convergent;
    per-file rows may exceed target by the sampling skew, which the
    count policy tolerates), so a second pass rewrites nothing.

    Swap discipline (review r9): new layout lands in a hidden
    ``.compact-*`` dir (cleaned on failure), the old partition parks in
    a hidden ``.reap-*`` dir, the new dir takes its place, trash is
    dropped. A crash between the two renames is healed by the
    ``_recover_compaction`` sweep that runs first — the partition is
    restored, never silently missing, and hidden names can never be
    discovered as partitions. Returns the rewritten partition names."""
    import glob
    import math
    import os
    import shutil
    import tempfile
    import uuid

    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    _recover_compaction(table_root)
    rewritten = []
    for pdir in sorted(glob.glob(os.path.join(table_root, partition_glob))):
        files = [
            f
            for f in glob.glob(os.path.join(pdir, "*.parquet"))
            if os.path.isfile(f)
        ]
        if not files:
            continue
        rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        need = max(1, math.ceil(rows / target_rows))
        if len(files) <= need:
            continue  # already right-sized: NOT touched
        part = spark.read.parquet(pdir)
        order = [c for c in ("event_id",) if c in part.columns] or [
            part.columns[0]
        ]
        tmp = tempfile.mkdtemp(
            prefix=".compact-", dir=os.path.dirname(pdir)
        )
        try:
            (
                part.repartitionByRange(need, *[F.col(c) for c in order])
                .sortWithinPartitions(*order)
                .write.mode("overwrite")
                .parquet(tmp)
            )
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)  # review r9: no leak
            raise
        trash = os.path.join(
            os.path.dirname(pdir),
            f".reap-{uuid.uuid4().hex[:8]}-{os.path.basename(pdir)}",
        )
        os.replace(pdir, trash)
        os.replace(tmp, pdir)
        shutil.rmtree(trash, ignore_errors=True)
        rewritten.append(os.path.basename(pdir))
    return rewritten


def seed_fragmented_layout(
    ev,
    root: str,
    target_rows: int,
    flush_rows: int,
    n_tasks: int = 8,
) -> str:
    """Seed the incremental-compaction demonstration layout — ONE
    definition shared by the a12b entry and its test (review r9): every
    day right-sized except the LAST, which lands as tiny flush-sized
    fragments ('today's delivery'). ``ev`` must carry a ``dt`` column.
    Hash-repartition on dt puts each day wholly in one task -> exactly
    one file per seeded day (a range partitioning could split a
    boundary day across two tasks, which the compactor would then
    rightly rewrite). Returns the last (fragmented) day."""
    from pyspark.sql import functions as F

    last_day = ev.agg(F.max("dt")).collect()[0][0]
    (
        ev.filter(F.col("dt") < last_day)
        .repartition(n_tasks, "dt")
        .sortWithinPartitions("dt", "event_id")
        .write.option("maxRecordsPerFile", target_rows)
        .partitionBy("dt")
        .mode("overwrite")
        .parquet(root)
    )
    (
        ev.filter(F.col("dt") == last_day)
        .repartition(4)
        .write.option("maxRecordsPerFile", flush_rows)
        .partitionBy("dt")
        .mode("append")
        .parquet(root)
    )
    return last_day
