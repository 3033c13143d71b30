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

import io
import struct
import wave
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


def decode_image(content: bytes, fmt: str | None) -> np.ndarray:
    """Decode an image blob to an H×W×C uint8 RGB array.

    REAL for formats decodable without external libraries: ``bmp``
    (24-bit, :func:`decode_bmp`), ``ppm`` (binary P6,
    :func:`decode_ppm`), ``png`` (8-bit gray/RGB/RGBA via zlib inflate
    + full scanline unfiltering, :func:`decode_png`) and — since round
    8 — Huffman ``jpeg``: baseline-sequential AND (round 9)
    progressive SOF2 with spectral selection + successive
    approximation (marker walk, stream-declared Huffman tables,
    restart intervals, dequant + IDCT, chroma upsampling, JFIF
    YCbCr→RGB; operators/jpegcodec.decode_jpeg — arithmetic-coded
    streams still raise) and ``webp`` in its LOSSLESS profile (VP8L
    prefix codes, LZ77, color cache, all four inverse transforms;
    operators/vp8lcodec.decode_vp8l). Lossy WebP (VP8) and avif remain
    the declared stub boundary: swap in Pillow/libvips there in
    production."""
    f = (fmt or "").lower()
    if f == "bmp":
        return decode_bmp(content)
    if f in ("ppm", "p6"):
        return decode_ppm(content)
    if f == "png":
        return decode_png(content)
    if f in ("jpeg", "jpg"):
        from bazof_spark.operators.jpegcodec import decode_jpeg

        px = decode_jpeg(content)
        if px.ndim == 2:  # grayscale → RGB for the uniform H×W×3 contract
            px = np.repeat(px[:, :, None], 3, axis=2)
        return px
    if f == "gif":
        from bazof_spark.operators.gifcodec import decode_gif

        return decode_gif(content)
    if f == "qoi":
        from bazof_spark.operators.qoicodec import decode_qoi

        px = decode_qoi(content)
        return px[:, :, :3]  # RGBA → RGB for the uniform contract
    if f == "webp":
        from bazof_spark.operators.vp8lcodec import decode_vp8l

        return decode_vp8l(content)[:, :, :3]
    if f in ("tiff", "tif"):
        from bazof_spark.operators.tiffcodec import decode_tiff

        px = decode_tiff(content)
        if px.ndim == 2:
            px = np.repeat(px[:, :, None], 3, axis=2)
        return px
    raise NotImplementedError(
        f"image decode for {fmt!r} requires a codec library not present "
        "in this environment (bmp/ppm/png/jpeg/gif/qoi/tiff/webp decode "
        "IS implemented; use those or fake_decode_features for pipeline "
        "testing)"
    )


# --- real stdlib codecs: BMP (24-bit) and PPM (P6) ------------------------
#
# These make the codec slot of the multimodal pipeline REAL without any
# external library: encoders write the actual on-disk formats
# (readable by any image viewer), decoders hand-parse the headers with
# struct/numpy — deliberately NOT the inverse code path of the encoder,
# so a round-trip genuinely validates the byte layout (padding,
# bottom-up row order, BGR channel order).


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an H×W×3 uint8 RGB array as a standard 24-bit BMP
    (BITMAPINFOHEADER, bottom-up rows, BGR byte order, rows padded to
    4 bytes)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_bmp expects H×W×3 RGB")
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    image_size = row_size * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + image_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    rows = []
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.append(pixels[y, :, ::-1].tobytes() + pad)  # RGB → BGR
    return header + b"".join(rows)


def decode_bmp(content: bytes) -> np.ndarray:
    """Hand-parse a 24-bit uncompressed BMP into H×W×3 uint8 RGB."""
    if content[:2] != b"BM":
        raise ValueError("not a BMP stream")
    (data_offset,) = struct.unpack_from("<I", content, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", content, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", content, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        content, dtype=np.uint8, count=row_size * h, offset=data_offset
    ).reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Encode H×W×3 uint8 RGB as binary PPM (P6, maxval 255)."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(content: bytes) -> np.ndarray:
    """Hand-parse binary PPM (P6), including comment lines."""
    if content[:2] != b"P6":
        raise ValueError("not a P6 PPM stream")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":  # comment to end of line
            pos = content.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(content[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only maxval-255 PPM")
    return (
        np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an H×W×3 uint8 RGB array as a standard PNG (8-bit
    truecolor, filter 0 scanlines, one zlib IDAT) — stdlib only
    (struct + zlib), readable by any image viewer."""
    import zlib

    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_png expects H×W×3 RGB")
    h, w, _ = pixels.shape

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y].tobytes() for y in range(h)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def encode_png_filtered(pixels: np.ndarray, row_filters) -> bytes:
    """Encode H×W×3 RGB as PNG applying a CHOSEN filter type per row
    (0-4) — the adversarial fixture generator: the plain encoder only
    emits filter 0, so this is how round-trip tests force the decoder
    through Sub/Up/Average/Paeth scanline reconstruction."""
    import zlib

    h, w, _ = pixels.shape
    ch = 3
    stride = w * ch
    flat = pixels.reshape(h, stride).astype(np.int64)
    lines = []
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = flat[y]
        f = int(row_filters[y % len(row_filters)])
        left = np.concatenate([np.zeros(ch, dtype=np.int64), cur[:-ch]])
        upleft = np.concatenate([np.zeros(ch, dtype=np.int64), prev[:-ch]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - ((left + prev) >> 1)
        elif f == 4:
            p = left + prev - upleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = cur - pred
        else:
            raise ValueError(f"bad filter {f}")
        lines.append(bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
        + chunk(b"IEND", b"")
    )


def decode_png(content: bytes) -> np.ndarray:
    """Hand-decode a PNG (stdlib zlib inflate + full scanline
    unfiltering — all five filter types: None/Sub/Up/Average/Paeth) to
    H×W×3 uint8 RGB. Supports 8-bit grayscale/truecolor/truecolor+alpha,
    non-interlaced (alpha dropped, gray replicated). Deliberately NOT
    the encoder's inverse code path: the encoder always emits filter 0,
    the decoder handles every filter, so round-trips validate layout
    and adversarial fixtures validate the unfilter math. Per-pixel
    Python in the Sub/Average/Paeth branches — fixture-sized images;
    swap in Pillow for production rasters."""
    import zlib

    if content[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG stream")
    pos, idat = 8, b""
    w = h = ct = None
    while pos + 8 <= len(content):
        (ln,) = struct.unpack_from(">I", content, pos)
        typ = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + type + data + crc
        if typ == b"IHDR":
            w, h, bd, ct, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bd != 8 or ct not in (0, 2, 6) or interlace:
                raise NotImplementedError(
                    "only 8-bit gray/RGB/RGBA non-interlaced PNG"
                )
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG without IHDR")
    ch = {0: 1, 2: 3, 6: 4}[ct]
    stride = w * ch
    raw = zlib.decompress(idat)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG payload length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    p = 0
    for y in range(h):
        ftype = raw[p]
        p += 1
        cur = np.frombuffer(raw, np.uint8, stride, p).copy()
        p += stride
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                cur[i] = (int(cur[i]) + int(cur[i - ch])) & 0xFF
        elif ftype == 2:  # Up
            cur += prev  # uint8 wraps mod 256
        elif ftype == 3:  # Average
            for i in range(stride):
                left = int(cur[i - ch]) if i >= ch else 0
                cur[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (int(cur[i]) + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = cur
        prev = out[y]
    arr = out.reshape(h, w, ch)
    if ct == 0:
        return np.repeat(arr, 3, axis=2)
    if ct == 6:
        return arr[:, :, :3].copy()
    return arr


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


def encode_wav(
    samples: np.ndarray, sample_rate: int = 8000, n_channels: int = 1
) -> bytes:
    """Encode int16 PCM samples as a standard RIFF/WAVE file via the
    stdlib ``wave`` module. `samples` is 1-D (interleaved if
    n_channels > 1)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def encode_wav_g711(
    samples: np.ndarray, sample_rate: int = 8000, law: str = "ulaw"
) -> bytes:
    """Encode int16 PCM as a G.711-compressed RIFF/WAVE file (format
    tag 7 = μ-law, 6 = A-law; 8 bits/sample, fact chunk carrying the
    frame count as compressed formats require). Companding via
    operators/g711codec (pinned bit-exact to the public Sun g711.c
    algorithm)."""
    from bazof_spark.operators.g711codec import g711_encode

    tag = 7 if law == "ulaw" else 6
    data = g711_encode(samples.astype(np.int16), law)
    fmt = struct.pack("<HHIIHH", tag, 1, sample_rate, sample_rate, 1, 8)
    fact = struct.pack("<I", len(samples))
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(content: bytes) -> tuple[int, int, np.ndarray]:
    """Hand-parse a RIFF/WAVE blob → (sample_rate, n_channels, samples).

    Deliberately NOT the ``wave`` module (that's the encoder), so an
    encode→decode round-trip validates the actual byte format: RIFF
    container walk, fmt chunk layout, PCM-16/PCM-8 payloads — and,
    round 9, compressed IMA-ADPCM payloads (WAVE_FORMAT_IMA_ADPCM
    0x0011: block headers, low-nibble-first packing, fact-chunk trim —
    operators/adpcmcodec.py). Returns int16 samples (8-bit WAV's
    unsigned bytes are recentered to signed, matching every real
    decoder's convention)."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, fmt, data, fact_frames = 12, None, None, None
    while pos + 8 <= len(content):
        cid, size = struct.unpack_from("<4sI", content, pos)
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        elif cid == b"fact" and size >= 4:
            fact_frames = struct.unpack_from("<I", body, 0)[0]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _brate, balign, bits = fmt
    if audio_format == 0x11:
        # IMA ADPCM (mono): the fact chunk carries the true frame
        # count; without one, every block is assumed full.
        from bazof_spark.operators.adpcmcodec import decode_ima_adpcm_data

        if n_channels != 1:
            raise NotImplementedError("only mono IMA-ADPCM")
        spb = (balign - 4) * 2 + 1
        n = (
            fact_frames
            if fact_frames is not None
            else (len(data) // balign) * spb
        )
        return sample_rate, 1, decode_ima_adpcm_data(data, balign, n)
    if audio_format in (6, 7):  # G.711 A-law / μ-law (ITU-T)
        from bazof_spark.operators.g711codec import g711_decode

        law = "alaw" if audio_format == 6 else "ulaw"
        n = fact_frames * n_channels if fact_frames is not None else None
        return sample_rate, n_channels, g711_decode(data[:n], law)
    if audio_format != 1:
        raise NotImplementedError("only PCM / G.711 / IMA-ADPCM WAV")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.int16)
    elif bits == 8:
        samples = (
            np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128
        )
    else:
        raise NotImplementedError(f"unsupported PCM width {bits}")
    return sample_rate, n_channels, samples


def decode_audio(content: bytes, codec: str | None):
    """Decode an audio blob to (sample_rate, n_channels, int16 samples).

    REAL for ``wav`` (stdlib RIFF parse, :func:`decode_wav`) including
    compressed IMA-ADPCM payloads, and for ``flac`` (round 9,
    operators/{adpcm,flac}codec.py). Remaining compressed codecs
    (mp3/ogg — lossy transform codecs needing external libraries this
    container doesn't ship) are a declared stub boundary: swap in
    ffmpeg/torchaudio there in production."""
    if (codec or "").lower() in ("wav", "wave"):
        return decode_wav(content)
    if (codec or "").lower() == "flac":
        from bazof_spark.operators.flaccodec import decode_flac

        return decode_flac(content)
    if (codec or "").lower() in ("ogg", "oga"):
        from bazof_spark.operators.oggcodec import decode_ogg_flac

        return decode_ogg_flac(content)
    raise NotImplementedError(
        f"audio decode for {codec!r} requires a codec library not "
        "present in this environment (wav decode IS implemented)"
    )


def demux_video_frames(content: bytes, container: str | None) -> list:
    """Demux a video blob into decoded grayscale/indexed frame arrays.

    REAL for ``avi`` (MJPEG-in-AVI: RIFF walk + per-frame baseline-JPEG
    decode, operators/avicontainer.py + jpegcodec.py), ``mp4``/``mov``
    (ISO-BMFF box walk + stsc/stsz/stco sample reconstruction,
    operators/mp4container.py, MJPEG samples), ``mkv``/``webm`` (EBML
    walk + SimpleBlock framing incl. lacing, operators/mkvcontainer.py,
    V_MJPEG) and ``gif`` (animated frames with progressive compositing,
    gifcodec.decode_gif_frames). Inter-frame CODECS (h264/vp9/av1 —
    need a real decoder library) are the declared stub boundary;
    ffmpeg/pyav slots into this dispatcher in production."""
    c = (container or "").lower()
    if c == "avi":
        from bazof_spark.operators.avicontainer import parse_avi
        from bazof_spark.operators.jpegcodec import decode_jpeg

        return [decode_jpeg(f) for f in parse_avi(content)["frames"]]
    if c in ("mp4", "mov", "m4v"):
        from bazof_spark.operators.jpegcodec import decode_jpeg
        from bazof_spark.operators.mp4container import parse_mp4

        meta = parse_mp4(content)
        if meta["codec"] != "jpeg":
            raise NotImplementedError(
                f"mp4 sample codec {meta['codec']!r} needs a decoder "
                "library (the container demux succeeded)"
            )
        return [decode_jpeg(f) for f in meta["frames"]]
    if c in ("mkv", "webm"):
        from bazof_spark.operators.jpegcodec import decode_jpeg
        from bazof_spark.operators.mkvcontainer import parse_mkv

        meta = parse_mkv(content)
        if meta["codec"] != "V_MJPEG":
            raise NotImplementedError(
                f"mkv track codec {meta['codec']!r} needs a decoder "
                "library (the container demux succeeded)"
            )
        return [decode_jpeg(f) for f in meta["frames"]]
    if c == "gif":
        from bazof_spark.operators.gifcodec import decode_gif_frames

        return decode_gif_frames(content)
    raise NotImplementedError(
        f"video demux for {container!r} requires a codec library not "
        "present in this environment (avi, mp4 and mkv — all carrying "
        "mjpeg — and gif ARE implemented)"
    )


def wav_waveform_stats(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Waveform statistics from GENUINELY DECODED WAV blobs: each binary
    value is a complete RIFF/WAVE file; :func:`decode_wav` parses the
    container and the stats are integer-exact over the recovered int16
    PCM, so a cross-engine oracle that knows the synthesis formula
    verifies the whole encode→decode round trip bit-for-bit.

    Output: (media_id, sample_rate, n_frames, peak = max|s|,
    amp_sum = Σ|s|, checksum = Σs). Arrow-batched ``mapInPandas``,
    map-only, no shuffle."""
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, False),
            StructField("sample_rate", IntegerType(), False),
            StructField("n_frames", LongType(), False),
            StructField("peak", IntegerType(), False),
            StructField("amp_sum", LongType(), False),
            StructField("checksum", LongType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                if blob is None:
                    raise ValueError(
                        f"NULL WAV content for media_id={mid!r} — "
                        "filter null blobs upstream"
                    )
                rate, ch, s = decode_wav(bytes(blob))
                a = np.abs(s.astype(np.int64))
                out.append(
                    (
                        mid,
                        rate,
                        s.size // ch,
                        int(a.max()) if s.size else 0,
                        int(a.sum()),
                        int(s.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    id_col,
                    "sample_rate",
                    "n_frames",
                    "peak",
                    "amp_sum",
                    "checksum",
                ],
            )

    return df.select(id_col, content_col).mapInPandas(batches, schema)


def bmp_pixel_stats(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    decoder=None,
) -> DataFrame:
    """Pixel statistics from GENUINELY DECODED BMP blobs: each binary
    value is a complete 24-bit BMP file; :func:`decode_bmp` hand-parses
    headers, bottom-up rows, BGR order and padding. `pos_checksum`
    weights every byte by its (row, col, channel) position, so any
    layout mistake (flipped rows, swapped channels, padding leak)
    changes the answer. Output: (media_id, width, height, checksum,
    pos_checksum). Map-only Arrow-batched pass."""
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, False),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
            StructField("checksum", LongType(), False),
            StructField("pos_checksum", LongType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                px = (decoder or decode_bmp)(bytes(blob)).astype(np.int64)
                h, w, _ = px.shape
                y = np.arange(h).reshape(h, 1, 1)
                x = np.arange(w).reshape(1, w, 1)
                c = np.arange(3).reshape(1, 1, 3)
                weights = y * 1_000_000 + x * 1_000 + c + 1
                out.append(
                    (
                        mid,
                        w,
                        h,
                        int(px.sum()),
                        int((px * weights).sum()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[id_col, "width", "height", "checksum", "pos_checksum"],
            )

    return df.select(id_col, content_col).mapInPandas(batches, schema)


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
            StructField(id_col, df.schema[id_col].dataType, False),
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
                        mid,
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
