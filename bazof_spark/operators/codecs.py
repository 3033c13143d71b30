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
    if (
        len(data) >= 13
        and data[0] < 9 * 5 * 5
        and data[1:4] != b"\x00\x00\x00"  # dict size low bytes plausible
    ):
        return "lzma"
    raise ValueError("unrecognized compressed container")


def sniff_decompress(data: bytes) -> tuple[str, bytes]:
    fmt = sniff_format(data)
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
