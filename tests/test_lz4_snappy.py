"""LZ4 (block + frame + xxHash32) and Snappy tests, pinned both
directions against pyarrow's C implementations — the independent-pin
discipline of inflate-vs-zlib and G.711-vs-audioop."""

import os
import random

import pyarrow as pa
import pytest

from bazof_spark.operators.lz4codec import (
    lz4_block_compress,
    lz4_block_decompress,
    lz4_frame_compress,
    lz4_frame_decompress,
    xxhash32,
)
from bazof_spark.operators.snappycodec import (
    snappy_compress,
    snappy_decompress,
)


def _corpus():
    random.seed(9)
    return [
        b"x",
        b"hello world " * 200,
        os.urandom(4000),
        bytes(random.choice(b"ab") for _ in range(30000)),
        b"\x00" * 100000,
        os.urandom(300000),  # multi-block lz4 frame
    ]


def test_xxhash32_public_vectors():
    assert xxhash32(b"") == 0x02CC5D05
    assert xxhash32(b"a") == 0x550D7456
    assert xxhash32(b"abc") == 0x32D153FF
    assert xxhash32(b"Nobody inspects the spammish repetition") == 0xE2293B2F
    assert xxhash32(b"abc", seed=1) != xxhash32(b"abc")


def test_lz4_block_cross_pinned():
    c = pa.Codec("lz4_raw")
    for raw in _corpus():
        assert lz4_block_decompress(c.compress(raw).to_pybytes()) == raw
        ours = lz4_block_compress(raw)
        assert (
            c.decompress(ours, decompressed_size=len(raw)).to_pybytes()
            == raw
        )
        assert lz4_block_decompress(ours) == raw


def test_lz4_frame_cross_pinned_incl_linked_blocks():
    """pyarrow's frame compressor emits LINKED blocks (matches reach
    into the previous block) — the 300 kB case forces multi-block."""
    c = pa.Codec("lz4")
    for raw in [b""] + _corpus():
        assert lz4_frame_decompress(c.compress(raw).to_pybytes()) == raw
        ours = lz4_frame_compress(raw)
        assert (
            c.decompress(ours, decompressed_size=len(raw)).to_pybytes()
            == raw
        )
        assert lz4_frame_decompress(ours) == raw


def test_snappy_cross_pinned():
    c = pa.Codec("snappy")
    for raw in [b""] + _corpus():
        assert snappy_decompress(c.compress(raw).to_pybytes()) == raw
        ours = snappy_compress(raw)
        assert (
            c.decompress(ours, decompressed_size=len(raw)).to_pybytes()
            == raw
        )
        assert snappy_decompress(ours) == raw


def test_corrupt_streams_fail_loudly():
    f = bytearray(lz4_frame_compress(b"q" * 500))
    f[6] ^= 0xFF  # header-checksum byte
    with pytest.raises(ValueError, match="descriptor checksum"):
        lz4_frame_decompress(bytes(f))
    f = bytearray(lz4_frame_compress(b"q" * 500))
    f[-1] ^= 1  # content checksum
    with pytest.raises(ValueError, match="content checksum"):
        lz4_frame_decompress(bytes(f))
    s = bytearray(snappy_compress(b"hello hello hello hello"))
    s[0] += 1  # declared length now wrong
    with pytest.raises(ValueError, match="declared"):
        snappy_decompress(bytes(s))
    with pytest.raises(ValueError, match="offset"):
        # copy reaching before output start: literal 'a' then copy-1
        # with offset 5
        snappy_decompress(bytes([5, 0x00, ord("a"), 0x05, 5]))
