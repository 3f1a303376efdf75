"""Multimodal column plumbing (north-star mandate): image/audio/video as
opaque ``binary`` columns + typed metadata, processed by Arrow-batched
Pandas UDFs over ``mapInPandas``.

The container has no image/audio codec libraries, so COMPRESSED decode
(JPEG/PNG/...) is stubbed: ``decode_image`` raises NotImplementedError
for those magics. UNCOMPRESSED formats decode for REAL since round 7 —
P6 PPM and 24-bpp BMP are pure byte parsing (no library), exercised
end-to-end by the oracle-checked mm3 entry. Everything around the
decoder — schema, batch iteration, partitioning, metadata extraction —
is real and tested.

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
    """Image decode. REAL for uncompressed formats (pure byte parsing,
    no codec library needed): P6 PPM and 24-bpp uncompressed BMP decode
    to grayscale luma bytes ((r+g+b)//3 per pixel, row-major top-down).
    COMPRESSED formats (JPEG/PNG/...) still require codec libraries
    absent in this container and raise NotImplementedError — that
    remaining stub is the documented gap.

    ``codec='fake'`` returns a deterministic pseudo-frame (one grayscale
    byte per 64-byte stripe) so the pipeline shape is testable on
    arbitrary opaque blobs.
    """
    if codec == "fake":
        body = content[5:] if content[:5] == b"FAKE0" else content
        # vectorized stripe sums (r15): bit-identical to the per-stripe
        # python loop — zero-padding the final partial stripe leaves its
        # byte-sum unchanged — and ~20× cheaper in the mapInPandas hot
        # path (mm1 drifted to 1.25× its baseline row on this loop)
        import numpy as np

        a = np.frombuffer(body, dtype=np.uint8)
        if not len(a):
            return b""
        k = (len(a) + 63) // 64
        buf = np.zeros(k * 64, dtype=np.uint8)
        buf[: len(a)] = a
        return (
            (buf.reshape(k, 64).sum(axis=1, dtype=np.int64) % 256)
            .astype(np.uint8)
            .tobytes()
        )
    if content[:2] == b"P6":
        return _decode_ppm(content)
    if content[:2] == b"BM":
        return _decode_bmp24(content)
    raise NotImplementedError(
        "compressed image decode (JPEG/PNG/...) requires codec libraries "
        "not present in this container; P6 PPM and 24-bpp BMP decode for "
        "real, or pass codec='fake' for the opaque-blob test path"
    )


def _decode_ppm(content: bytes) -> bytes:
    """P6 PPM: ASCII header 'P6 <w> <h> <maxval>' then raw RGB bytes."""
    parts, i, tok = [], 2, b""
    while len(parts) < 3:
        c = content[i : i + 1]
        if c == b"":  # EOF before 3 header fields: don't spin forever
            raise ValueError("PPM header truncated")
        i += 1
        if c.isspace():
            if tok:
                parts.append(int(tok))
                tok = b""
        elif c == b"#":  # comment to EOL
            while content[i : i + 1] not in (b"\n", b""):
                i += 1
        else:
            tok += c
    w, h, maxval = parts
    if maxval != 255:
        raise NotImplementedError("PPM maxval != 255 unsupported")
    if w <= 0 or h <= 0 or w * h > 1 << 26:  # 64 Mpx cap: garbage headers
        raise ValueError(f"PPM dimensions out of range: {w}x{h}")
    px = content[i : i + w * h * 3]
    if len(px) < w * h * 3:
        raise ValueError("PPM truncated")
    return bytes(
        (px[3 * j] + px[3 * j + 1] + px[3 * j + 2]) // 3 for j in range(w * h)
    )


def _decode_bmp24(content: bytes) -> bytes:
    """Uncompressed 24-bpp BMP (BITMAPINFOHEADER): BGR rows padded to 4
    bytes, stored bottom-up; returned top-down luma."""
    off = struct.unpack_from("<I", content, 10)[0]
    w, h = struct.unpack_from("<ii", content, 18)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    comp = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bpp BMP decodes here")
    stride = (w * 3 + 3) // 4 * 4
    out = bytearray(w * abs(h))
    for row in range(abs(h)):
        src = off + (abs(h) - 1 - row) * stride if h > 0 else off + row * stride
        for col in range(w):
            b, g, r = content[src + 3 * col : src + 3 * col + 3]
            out[row * w + col] = (r + g + b) // 3
    return bytes(out)


def resize_frame(
    frame: bytes, w: int, h: int, out_w: int, out_h: int
) -> bytes:
    """Grayscale frame resize — the third multimodal verb next to decode
    and frame-sample: integer MEAN-POOLING when the source dimensions
    divide evenly by the target (each output pixel = floor-average of
    its sx×sy source block — exact integer arithmetic, cross-engine
    reproducible), else nearest-neighbor sampling (pure index math).
    Runs per-blob inside mapInPandas: frames never shuffle, and the
    downsampled output is what ships to the feature extractor — at
    100 TB resizing AT THE SCAN cuts the bytes entering the pipeline by
    (w·h)/(out_w·out_h)."""
    import numpy as np

    if len(frame) != w * h:
        raise ValueError(f"frame size {len(frame)} != {w}x{h}")
    if out_w <= 0 or out_h <= 0:
        raise ValueError("target dimensions must be positive")
    a = np.frombuffer(frame, dtype=np.uint8)
    if w % out_w == 0 and h % out_h == 0:
        sx, sy = w // out_w, h // out_h
        # vectorized floor-average per sy×sx block — bit-identical to the
        # per-pixel loop (int64 sum // block size), ~100× cheaper in the
        # mapInPandas hot path (review r8)
        pooled = (
            a.reshape(out_h, sy, out_w, sx).sum(axis=(1, 3), dtype=np.int64)
            // (sx * sy)
        )
        return pooled.astype(np.uint8).tobytes()
    rows = (np.arange(out_h) * h // out_h)[:, None]
    cols = (np.arange(out_w) * w // out_w)[None, :]
    return a.reshape(h, w)[rows, cols].tobytes()


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: hash, size, mean byte, frame count.

    Runs the stubbed decoder with the deterministic fake codec — the real
    deployment swaps ``codec='real'`` + a codec-bearing container image.

    Input is pruned to the three columns the extractor reads before the
    Arrow boundary: mapInPandas is opaque to Catalyst, so without the
    explicit select every media column (width/height/sample_rate/
    duration_ms — and transitively the n_chars parquet column feeding
    duration_ms) is read from storage and shipped JVM→Python per batch
    for nothing (guide §4.1).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

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
                    # exact integer sum then one division — identical to
                    # sum(f)/len(f), numpy-speed over the frame bytes
                    "mean_byte": [
                        (
                            int(
                                np.frombuffer(f, dtype=np.uint8).sum(
                                    dtype=np.int64
                                )
                            )
                            / len(f)
                            if len(f)
                            else 0.0
                        )
                        for f in frames
                    ],
                    "frame_count": [len(f) for f in frames],
                }
            )

    return media.select("media_id", "kind", "content").mapInPandas(
        run, FEATURE_SCHEMA
    )


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


def decode_audio(content: bytes):
    """REAL audio decode for uncompressed RIFF/WAVE PCM16 mono — pure
    struct parsing, no codec library: walk the chunk list, read the
    fmt chunk (require PCM, 1 channel, 16-bit), return the int16 sample
    list from the data chunk. Compressed audio (MP3/AAC/...) raises —
    the same documented stub boundary as compressed images."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise NotImplementedError(
            "compressed audio decode requires codec libraries not present "
            "in this container; RIFF/WAVE PCM16 decodes for real"
        )
    i, fmt_ok, samples = 12, False, None
    while i + 8 <= len(content):
        cid = content[i : i + 4]
        size = struct.unpack_from("<I", content, i + 4)[0]
        body = content[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels = struct.unpack_from("<HH", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise NotImplementedError(
                    "only PCM16 mono WAV decodes without codec libraries"
                )
            fmt_ok = True
        elif cid == b"data":
            samples = list(
                struct.unpack_from(f"<{size // 2}h", body, 0)
            )
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if not fmt_ok or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return samples


def pack_wav_pcm16(samples, sample_rate: int = 16000) -> bytes:
    """Inverse of decode_audio for the synthesis/test path: a minimal
    one-fmt-one-data RIFF/WAVE PCM16 mono file."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    size = 4 + 8 + len(fmt) + 8 + len(data)
    return (
        b"RIFF" + struct.pack("<I", size) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_video(content: bytes):
    """REAL video decode for uncompressed YUV4MPEG2 (Y4M) streams — the
    public raw-video interchange format (plain-text header, ``FRAME``
    markers, planar YUV bytes; what ffmpeg emits with ``-f yuv4mpegpipe``)
    — pure byte parsing like the PPM/BMP/WAV decoders. Returns
    ``(width, height, [y_plane_bytes per frame])``. Only the C420 layout
    (the Y4M default) parses; compressed/container formats (AVI, MP4,
    MKV magics) raise NotImplementedError — codec libraries are absent
    in this container, same honesty contract as decode_image."""
    if not content.startswith(b"YUV4MPEG2"):
        raise NotImplementedError(
            "compressed/container video decode requires codec libraries "
            "absent in this environment; only raw Y4M parses"
        )
    nl = content.index(b"\n")
    w = h = None
    for tok in content[:nl].decode("ascii").split(" ")[1:]:
        if tok.startswith("W"):
            w = int(tok[1:])
        elif tok.startswith("H"):
            h = int(tok[1:])
        elif tok.startswith("C") and tok not in (
            "C420",
            "C420jpeg",
            "C420mpeg2",
            "C420paldv",
        ):
            # prefix-matching 'C420' would accept C420p10/C420p12, whose
            # 2-byte samples break the 8-bit frame-size walk (review r9)
            raise NotImplementedError(
                "only 8-bit C420 chroma layouts parse here"
            )
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    fsize = w * h + 2 * ((w // 2) * (h // 2))
    frames = []
    pos = nl + 1
    while pos < len(content):
        if content[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        pos = content.index(b"\n", pos) + 1
        if pos + fsize > len(content):
            raise ValueError("truncated frame payload")
        frames.append(content[pos : pos + w * h])  # luma plane only
        pos += fsize
    return w, h, frames


def pack_y4m(frames: list[bytes], width: int, height: int) -> bytes:
    """Build a genuine Y4M stream from raw planar frames (test/fixture
    helper, the pack_wav_pcm16 analog). Chroma planes are zero-filled —
    the luma plane is what the feature extractors read."""
    fsize_uv = 2 * ((width // 2) * (height // 2))
    out = [f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C420\n".encode()]
    for y in frames:
        if len(y) != width * height:
            raise ValueError("luma plane size mismatch")
        out.append(b"FRAME\n" + y + b"\x00" * fsize_uv)
    return b"".join(out)
