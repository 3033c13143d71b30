"""bzip2 decoder tests, pinned against CPython's bz2 (the C library)
— inverse BWT, MTF, Huffman groups, RLE passes, both CRC layers."""

import bz2
import os
import random

import pytest

from bazof_spark.operators.bzip2codec import bz2_decompress


def _corpus():
    random.seed(4)
    return [
        b"",
        b"a",
        b"abc" * 5,
        b"hello world " * 2000,
        os.urandom(9000),
        bytes(random.choice(b"ab") for _ in range(50000)),
        b"\x00" * 250000,  # multi-block at level 1
        b"\xaa" * 1000,    # RLE1-heavy
        bytes(random.getrandbits(3) for _ in range(40000)),
    ]


@pytest.mark.parametrize("level", [1, 5, 9])
def test_bz2_pinned_to_stdlib(level):
    for raw in _corpus():
        assert bz2_decompress(bz2.compress(raw, level)) == raw


def test_bz2_real_file_and_multiblock():
    raw = open("/root/repo/bazof_spark/workload.py", "rb").read()
    assert bz2_decompress(bz2.compress(raw, 1)) == raw  # >100k → 3 blocks


def test_bz2_corruption_fails_loudly():
    with pytest.raises(ValueError, match="bzip2 stream"):
        bz2_decompress(b"not bzip2 at all")
    c = bytearray(bz2.compress(b"check me " * 500, 9))
    c[30] ^= 0x10
    with pytest.raises(ValueError):
        bz2_decompress(bytes(c))
