"""Multimodal column plumbing (north-star mandate): image/audio/video as
opaque ``binary`` columns + typed metadata, processed by Arrow-batched
Pandas UDFs over ``mapInPandas``.

The container has no image/audio codecs, so the DECODE step is stubbed
(SURVEY/driver instruction): ``decode_image`` raises NotImplementedError
unless given the deterministic-fake codec. Everything around it — schema,
batch iteration, partitioning, metadata extraction — is real and tested.

Scale shape: media bytes never shuffle. ``mapInPandas`` keeps each binary
batch inside its partition; only extracted features (fixed-width) flow to
downstream joins/aggregations. ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounds batch memory for large blobs; at 100 TB you would also cap
``files.maxPartitionBytes`` so one task holds O(100 MB) of media.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, width int, height int, "
    "sample_rate int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "mean_byte double, frame_count int"
)


def synth_media_table(spark: SparkSession, documents: DataFrame) -> DataFrame:
    """Deterministic fake media derived from the documents fixture: each
    doc becomes one opaque blob (its text bytes + a fake header)."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kinds.alias("kind"),
        F.encode(F.concat(F.lit("FAKE0"), F.col("text")), "UTF-8").alias("content"),
        (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
    )


def decode_image(content: bytes, codec: str = "real"):
    """STUB: real decode needs PIL/ffmpeg (absent in this container).

    ``codec='fake'`` returns a deterministic pseudo-frame (one grayscale
    byte per 64-byte stripe) so the pipeline shape is testable end-to-end.
    """
    if codec != "fake":
        raise NotImplementedError(
            "image/audio decode requires codec libraries not present in this "
            "container; pass codec='fake' for the deterministic test path"
        )
    body = content[5:] if content[:5] == b"FAKE0" else content
    return bytes(sum(body[i : i + 64]) % 256 for i in range(0, len(body), 64))


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: hash, size, mean byte, frame count.

    Runs the stubbed decoder with the deterministic fake codec — the real
    deployment swaps ``codec='real'`` + a codec-bearing container image.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            frames = [decode_image(c, codec="fake") for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c) for c in pdf["content"]],
                    "sha256": [hashlib.sha256(c).hexdigest() for c in pdf["content"]],
                    "mean_byte": [
                        (sum(f) / len(f)) if len(f) else 0.0 for f in frames
                    ],
                    "frame_count": [len(f) for f in frames],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index —
    pure relational explode on metadata; bytes stay put until decode."""
    n_frames = F.greatest(
        (F.col("duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return media.select(
        "media_id",
        "kind",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_"),
    ).select("media_id", "kind", (F.col("frame_idx") * every_ms).alias("frame_ms"))
