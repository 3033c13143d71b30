"""LZMA (.lzma / FORMAT_ALONE) decoder tests, pinned against
CPython's lzma (liblzma) — the range-coded member of the from-spec
decompressor family."""

import lzma
import os
import random

import pytest

from bazof_spark.operators.lzmacodec import lzma_alone_decompress


def _corpus():
    random.seed(8)
    return [
        b"",
        b"a",
        b"abc" * 7,
        b"hello world " * 1000,
        os.urandom(8000),
        bytes(random.choice(b"ab") for _ in range(40000)),
        b"\x00" * 150000,
        bytes(random.getrandbits(2) for _ in range(30000)),
    ]


@pytest.mark.parametrize("preset", [0, 1, 6, 9])
def test_lzma_pinned_to_stdlib_across_presets(preset):
    for raw in _corpus():
        c = lzma.compress(raw, format=lzma.FORMAT_ALONE, preset=preset)
        assert lzma_alone_decompress(c) == raw


def test_lzma_lc_lp_pb_matrix():
    """All liblzma-accepted literal-context / literal-position /
    position-bits combinations (lc+lp ≤ 4) — each changes the
    probability-model layout the decoder must reconstruct."""
    raws = [os.urandom(3000), b"the cat sat on the mat " * 400]
    for lc, lp in [(0, 0), (0, 2), (1, 1), (2, 2), (3, 0), (3, 1), (4, 0)]:
        for pb in (0, 1, 2):
            filt = [{"id": lzma.FILTER_LZMA1, "lc": lc, "lp": lp,
                     "pb": pb, "preset": 6}]
            for raw in raws:
                c = lzma.compress(
                    raw, format=lzma.FORMAT_ALONE, filters=filt
                )
                assert lzma_alone_decompress(c) == raw, (lc, lp, pb)


def test_lzma_real_file():
    raw = open("/root/repo/bazof_spark/workload.py", "rb").read()
    c = lzma.compress(raw, format=lzma.FORMAT_ALONE, preset=6)
    assert lzma_alone_decompress(c) == raw


def test_lzma_corruption_fails_loudly():
    with pytest.raises(ValueError, match="header"):
        lzma_alone_decompress(b"short")
    with pytest.raises(ValueError, match="properties"):
        lzma_alone_decompress(bytes([255]) + b"\x00" * 12 + b"\x00" * 5)
    c = bytearray(
        lzma.compress(b"check " * 500, format=lzma.FORMAT_ALONE, preset=6)
    )
    c = c[:-6]  # truncate mid-stream
    with pytest.raises(ValueError):
        lzma_alone_decompress(bytes(c))
