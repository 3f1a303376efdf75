#!/usr/bin/env python
"""Round-10 scaling experiment (VERDICT r9 item 4): end-to-end slopes of
the two streaming composites, p18 (replay -> training pipeline) and p19
(replay -> lakehouse maintenance), under k-fold fixture growth — the
i13j append-table methodology applied to the composites.

Three series, all 3-run medians after one warm-up (the warm-up also
builds the fingerprint-cached snapshot artifacts, so timed runs measure
the DAILY cost, not the one-time build):

1. p18(k), p19(k) for k in {1, 4, 16}: corpus AND batch grow together
   (the whole-corpus-replay shape) — expect a data-proportional slope
   on top of a fixed stream-drain floor.
2. drain(k): the stream tier alone (stage -> AvailableNow parquet sink)
   for the same dirs — the floor line item 1's slope sits on.
3. batch tier with batch FIXED at 1x while the snapshot grows k-fold —
   the production daily shape and the O(batch) pin: a day's ingest must
   not get more expensive because the corpus behind the snapshot grew.

Replication recipe (distinct-content discipline, round-5 methodology):
documents text gets every word prefixed with a per-replica tag (all
5-gram shingles distinct across replicas -> no artificial cross-replica
near-dup blowup, within-replica dup structure preserved); events keep
ts untouched (p19's audit window is pinned) and offset event_id/user_id
per replica. Results land in SCALE.md; rerun with
  python tools/scale_streaming_composites.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
KS = (1, 4, 16)
RUNS = 3
BASE = "/tmp/skr_scale_composites"


def replicated_dir(spark, k: int) -> str:
    """Build (once) a fixture dir with documents+events replicated k-fold."""
    out = f"{BASE}/k{k}"
    if os.path.exists(f"{out}/_SUCCESS"):
        return out
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    max_eid = ev.agg(F.max("event_id")).collect()[0][0] + 1
    max_uid = ev.agg(F.max("user_id")).collect()[0][0] + 1
    d_parts, e_parts = [], []
    for i in range(k):
        tag = F.lit(f"x{i}")
        # Replica 0 keeps the REAL fixture text untouched so the k=1 row
        # is directly comparable to BENCH/BASELINE numbers; replicas 1+
        # get the per-replica word tag that keeps shingles distinct
        # across replicas (ADVICE r10: tagging replica 0 too shifted
        # token lengths by +2 chars and broke cross-series comparison).
        text_col = (
            F.col("text")
            if i == 0
            else F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(tag, w),
                ),
                " ",
            )
        )
        d_parts.append(
            docs.select(
                (F.col("doc_id") + i * max_doc).alias("doc_id"),
                "source",
                text_col.alias("text"),
                *[c for c in docs.columns if c not in ("doc_id", "source", "text")],
            )
        )
        e_parts.append(
            ev.select(
                (F.col("event_id") + i * max_eid).alias("event_id"),
                "ts",
                (F.col("user_id") + i * max_uid).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    d_all = d_parts[0]
    e_all = e_parts[0]
    for p in d_parts[1:]:
        d_all = d_all.unionByName(p)
    for p in e_parts[1:]:
        e_all = e_all.unionByName(p)
    # single-file parquet like the fixtures (stage_archive expects a path
    # Spark can read; one coalesced file keeps staging comparable)
    d_all.coalesce(max(1, k // 2)).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    e_all.coalesce(max(1, k // 2)).write.mode("overwrite").parquet(
        f"{out}/events.parquet"
    )
    Path(f"{out}/_SUCCESS").touch()
    return out


def timed(fn, runs: int = RUNS) -> float:
    fn()  # warm-up (builds caches, JIT)
    s = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        s.append(time.perf_counter() - t0)
    return round(statistics.median(s), 2)


def drain_docs_seconds(spark, sf_dir: str) -> None:
    """p18's stream tier alone: staged doc archive -> parquet sink."""
    from s3_kinesis_replay_spark.sources.archive import (
        stage_doc_archive,
        stream_doc_archive,
    )
    from s3_kinesis_replay_spark.queries.streaming_live import _await_drained

    import shutil

    root = stage_doc_archive(sf_dir)
    sink = tempfile.mkdtemp(prefix="skr_scale_drain_")
    try:
        _await_drained(
            stream_doc_archive(spark, root)
            .writeStream.format("parquet")
            .option("path", f"{sink}/crawl")
            .option("checkpointLocation", f"{sink}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
    finally:
        # each timed call would otherwise strand a full corpus copy in
        # /tmp (4 per k — review r10)
        shutil.rmtree(sink, ignore_errors=True)


def batch_tier_seconds(spark, batch_dir: str, snap_sf_dir: str) -> int:
    """p18's snapshot-consuming batch tier with the batch FIXED (crawl =
    batch_dir's documents) while the persisted snapshot artifacts come
    from snap_sf_dir (grown k-fold). Mirrors p18's post-drain stages:
    digest anti-join -> LSH band join vs stored signatures -> bloom
    screen + exact confirm."""
    from s3_kinesis_replay_spark.operators.bloom import bloom_screen
    from s3_kinesis_replay_spark.operators.dedup import (
        minhash_lsh_incremental_pairs,
        word_shingles,
    )
    from s3_kinesis_replay_spark.operators.similarity import data_fingerprint
    from pyspark.sql import Window as W

    fp = data_fingerprint(os.path.join(snap_sf_dir, "documents.parquet"))
    snap_dir = f"/tmp/skr_p18_snapshot/{fp}-v1"
    assert os.path.exists(snap_dir), "run p18 on snap_sf_dir first"

    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    crawl = (
        spark.read.parquet(f"{batch_dir}/documents.parquet")
        .select("doc_id", "source", "text", F.md5(norm).alias("h"))
    )
    snap_h = spark.read.parquet(f"{snap_dir}/digests")
    inb = (
        crawl.withColumn(
            "rn", F.row_number().over(W.partitionBy("h").orderBy("doc_id"))
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    survivors = (
        inb.join(snap_h, "h", "left_anti")
        .select("doc_id", "source", "text")
        .localCheckpoint()
    )
    snap_docs = spark.read.parquet(
        f"{snap_sf_dir}/documents.parquet"
    ).filter(F.col("doc_id") % 3 != 0)
    nd_ids = (
        minhash_lsh_incremental_pairs(
            snap_docs.select("doc_id", "text"),
            survivors.select("doc_id", "text"),
            threshold=0.8,
            snapshot_banded=spark.read.parquet(f"{snap_dir}/banded"),
        )
        .select(F.col("doc_new").alias("doc_id"))
        .distinct()
    )
    ev_g = spark.read.parquet(f"{snap_dir}/eval_grams")
    sv_g = survivors.select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    ).select("doc_id", F.explode(word_shingles(F.col("toks"), k=5)).alias("g"))
    stored_bits = spark.read.parquet(f"{snap_dir}/bloom_bits")
    flagged = bloom_screen(sv_g, stored_bits).filter(F.col("bloom_hit"))
    cont_ids = flagged.join(ev_g, "g", "left_semi").select("doc_id").distinct()
    clean = survivors.join(nd_ids, "doc_id", "left_anti").join(
        cont_ids, "doc_id", "left_anti"
    )
    return clean.count()


def main() -> None:
    from s3_kinesis_replay_spark.registry import all_queries
    from s3_kinesis_replay_spark.session import get_spark

    spark = get_spark(
        app_name="skr-scale-composites",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    out: dict = {"sf_dir": SF_DIR, "loadavg": os.getloadavg()[0]}
    dirs = {k: replicated_dir(spark, k) for k in KS}

    for k in KS:
        d = dirs[k]
        rec: dict = {}
        rec["drain_docs"] = timed(lambda: drain_docs_seconds(spark, d))
        rec["p18"] = timed(
            lambda: qs["p18_replay_training_pipeline"]
            .fn(spark, d)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        rec["p19"] = timed(
            lambda: qs["p19_lakehouse_maintenance"]
            .fn(spark, d)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        # fixed 1x batch against THIS k's snapshot (warm-up built it above)
        rec["batch_fixed_1x"] = timed(
            lambda: batch_tier_seconds(spark, dirs[1], d)
        )
        out[f"k{k}"] = rec
        print(json.dumps({f"k{k}": rec}), flush=True)

    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
