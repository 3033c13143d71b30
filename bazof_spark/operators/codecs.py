"""Magic-byte dispatcher over the repo's from-spec decompressors.

One entry point for the whole family (inflate/gzip/zlib, LZ4 frame,
ZSTD, bzip2, .lzma, .xz): sniff the container from its leading bytes
and decode with the in-repo implementation — the surface the CLI's
``decompress`` subcommand exposes. Snappy and raw LZ4 blocks have no
magic and must be dispatched explicitly by their callers.
"""

from __future__ import annotations


def sniff_format(data: bytes) -> str:
    """Identify a compressed container by magic bytes."""
    if data[:2] == b"\x1f\x8b":
        return "gzip"
    if data[:4] == b"\x28\xb5\x2f\xfd":
        return "zstd"
    if data[:6] == b"\xfd7zXZ\x00":
        return "xz"
    if data[:3] == b"BZh" and len(data) > 3 and 0x31 <= data[3] <= 0x39:
        return "bzip2"
    if data[:4] == b"\x04\x22\x4d\x18":
        return "lz4"
    if len(data) >= 2 and data[0] in (0x08, 0x18, 0x28, 0x38, 0x48, 0x58,
                                      0x68, 0x78) and (
        (data[0] * 256 + data[1]) % 31 == 0
    ):
        return "zlib"
    if len(data) >= 13 and _plausible_lzma_alone(data):
        return "lzma"
    raise ValueError("unrecognized compressed container")


def _plausible_lzma_alone(data: bytes) -> bool:
    """Heuristic for the magic-less .lzma (LZMA_ALONE) header: props
    byte, 4-byte LE dict size, 8-byte LE uncompressed size.

    Real encoders only ever emit dict sizes of shape 2^n or
    2^n + 2^(n-1) (xz presets 0-9 span 256 KiB..64 MiB — presets 8/9
    are exact multiples of 2^24, so the low three bytes are zero and a
    low-bytes-nonzero test wrongly rejects them), and the uncompressed
    size field is either all-0xFF (unknown, what liblzma streams) or a
    sane actual size. Checking the full 5-byte shape both accepts
    preset-9 files and stops arbitrary garbage from being dispatched
    to the range decoder only to die with a confusing LZMA error."""
    if not _sane_lzma_header(data):
        return False
    dict_size = int.from_bytes(data[1:5], "little")
    if dict_size < (1 << 12):  # standard encoders start at 4 KiB
        return False
    # 2^n or 2^n + 2^(n-1): clearing the lowest set bit leaves either
    # zero (power of two) or exactly half the remainder
    low = dict_size & -dict_size
    rest = dict_size - low
    return rest == 0 or rest == 2 * low


def _sane_lzma_header(data: bytes) -> bool:
    """Relaxed .lzma header check — props byte and size fields sane,
    but ANY dict size in range (the spec allows any 32-bit value;
    nonstandard encoders exist). Only used by :func:`sniff_decompress`
    as a last-resort DECODE-ATTEMPT gate, never by the magic-only
    :func:`sniff_format`: without the dict-size shape constraint the
    13-byte header is weak evidence, so the decode itself (with its
    internal checks) is the arbiter and its failure is reported as an
    unrecognized container, not a confusing LZMA error."""
    # header alone is 13 bytes (props + dict + usize); a header-only
    # stream (empty payload) is degenerate but spec-shaped, so the
    # threshold matches sniff_format's >= 13 guard
    if len(data) < 13 or data[0] >= 9 * 5 * 5:
        return False
    dict_size = int.from_bytes(data[1:5], "little")
    if dict_size == 0 or dict_size > (3 << 29):
        return False
    usize = int.from_bytes(data[5:13], "little")
    return usize == (1 << 64) - 1 or usize < (1 << 40)


def sniff_decompress(data: bytes) -> tuple[str, bytes]:
    try:
        fmt = sniff_format(data)
    except ValueError:
        # spec-legal .lzma from a nonstandard encoder (dict size not
        # 2^n / 2^n+2^(n-1)): attempt the decode when the rest of the
        # header is sane; its success is the proof sniffing can't give
        if len(data) >= 13 and _sane_lzma_header(data):
            from bazof_spark.operators.lzmacodec import (
                lzma_alone_decompress,
            )

            try:
                return "lzma", lzma_alone_decompress(data)
            except Exception:
                pass
        raise
    if fmt == "gzip":
        from bazof_spark.operators.inflate import gzip_decompress

        return fmt, gzip_decompress(data)
    if fmt == "zlib":
        from bazof_spark.operators.inflate import zlib_decompress

        return fmt, zlib_decompress(data)
    if fmt == "zstd":
        from bazof_spark.operators.zstdcodec import zstd_decompress

        return fmt, zstd_decompress(data)
    if fmt == "xz":
        from bazof_spark.operators.lzmacodec import xz_decompress

        return fmt, xz_decompress(data)
    if fmt == "bzip2":
        from bazof_spark.operators.bzip2codec import bz2_decompress

        return fmt, bz2_decompress(data)
    if fmt == "lz4":
        from bazof_spark.operators.lz4codec import lz4_frame_decompress

        return fmt, lz4_frame_decompress(data)
    from bazof_spark.operators.lzmacodec import lzma_alone_decompress

    return fmt, lzma_alone_decompress(data)
