"""RFC 8878 ZSTD decoder tests, pinned against pyarrow's C zstd —
the heavyweight entry in the from-spec-vs-C-implementation family
(inflate/zlib, LZ4+Snappy/pyarrow, G.711/audioop)."""

import os
import random
import struct

import pyarrow as pa
import pytest

from bazof_spark.operators.zstdcodec import xxhash64, zstd_decompress


def _corpus():
    random.seed(21)
    return [
        b"",
        b"x",
        b"abc" * 3,
        b"hello world " * 500,
        os.urandom(10000),
        bytes(random.choice(b"ab") for _ in range(60000)),
        b"\x00" * 300000,  # multi-block, RLE blocks
        ("the quick brown fox jumps over the lazy dog. " * 3000).encode(),
        bytes(random.getrandbits(3) for _ in range(200000)),
    ]


def test_xxhash64_public_vectors():
    assert xxhash64(b"") == 0xEF46DB3751D8E999
    assert xxhash64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxhash64(b"abc") == 0x44BC2CF5AD770999
    assert xxhash64(b"abc", seed=1) != xxhash64(b"abc")


@pytest.mark.parametrize("level", [1, 3, 6, 9, 12, 19, 22])
def test_zstd_pinned_to_pyarrow_across_levels(level):
    """Levels pick different strategies: fast (more raw/RLE literals,
    predefined tables) through max (FSE-described tables, 4-stream
    Huffman, repeat modes) — all must decode bit-perfect."""
    z = pa.Codec("zstd", compression_level=level)
    for raw in _corpus():
        assert zstd_decompress(z.compress(raw).to_pybytes()) == raw


def test_zstd_real_files():
    z = pa.Codec("zstd", compression_level=3)
    for path in (
        "/root/repo/bazof_spark/workload.py",
        "/root/testdata/sf0.001/documents.parquet",
    ):
        raw = open(path, "rb").read()
        assert zstd_decompress(z.compress(raw).to_pybytes()) == raw


def test_zstd_fuzz_vs_pyarrow():
    random.seed(77)
    for trial in range(60):
        n = random.randint(0, 30000)
        kind = trial % 4
        if kind == 0:
            raw = os.urandom(n)
        elif kind == 1:
            raw = bytes(random.choice(b"abcdef") for _ in range(n))
        elif kind == 2:
            raw = (b"pat%d " % (trial % 10)) * (n // 5)
        else:
            raw = bytes(random.getrandbits(2) for _ in range(n))
        lvl = random.choice([1, 3, 5, 10, 19])
        c = pa.Codec("zstd", compression_level=lvl).compress(raw)
        assert zstd_decompress(c.to_pybytes()) == raw, (trial, n, lvl)


def test_zstd_multiframe_and_skippable():
    z = pa.Codec("zstd")
    a = z.compress(b"first frame ").to_pybytes()
    b = z.compress(b"second frame").to_pybytes()
    skip = struct.pack("<II", 0x184D2A50, 5) + b"junk!"
    assert zstd_decompress(a + skip + b) == b"first frame second frame"


def test_zstd_corruption_fails_loudly():
    z = pa.Codec("zstd")
    c = bytearray(z.compress(b"verify me " * 100).to_pybytes())
    with pytest.raises(ValueError, match="magic"):
        zstd_decompress(b"\x00\x00\x00\x00rest")
    # truncation is always structural
    with pytest.raises(ValueError):
        zstd_decompress(bytes(c[: len(c) - 4]))
    # frame-content-size disagreement (pyarrow writes FCS): flipping a
    # byte either raises or changes the output — never silent equality
    bad = bytearray(c)
    bad[len(bad) // 2] ^= 0x55
    try:
        got = zstd_decompress(bytes(bad))
        assert got != b"verify me " * 100
    except ValueError:
        pass
