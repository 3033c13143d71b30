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


def test_lzma2_pinned_to_stdlib_raw_streams():
    """Raw LZMA2 chunk sequences incl. multi-chunk (>2 MiB unpacked)
    — chunk control bytes, prop/state/dict reset modes, uncompressed
    chunks."""
    from bazof_spark.operators.lzmacodec import lzma2_decompress

    cases = [
        b"",
        b"hello world " * 1000,
        os.urandom(9000),
        b"\x00" * 2_500_000,
        (b"pattern! " * 400_000),
    ]
    for preset in (0, 6):
        for raw in cases:
            filt = [{"id": lzma.FILTER_LZMA2, "preset": preset}]
            c = lzma.compress(raw, format=lzma.FORMAT_RAW, filters=filt)
            got, end = lzma2_decompress(c)
            assert got == raw and end == len(c)


def test_xz_pinned_across_check_types():
    """The full .xz container: header/footer CRCs, block headers,
    padding, index cross-check, and all four integrity-check types
    (none / CRC-32 / generated CRC-64 / SHA-256)."""
    from bazof_spark.operators.lzmacodec import crc64_xz, xz_decompress

    assert crc64_xz(b"123456789") == 0x995DC9BBDF1939FA  # public vector
    cases = [b"", b"hello xz " * 2000, os.urandom(7000), b"\x00" * 2_500_000]
    for check in (
        lzma.CHECK_NONE, lzma.CHECK_CRC32, lzma.CHECK_CRC64,
        lzma.CHECK_SHA256,
    ):
        for raw in cases:
            c = lzma.compress(raw, format=lzma.FORMAT_XZ, check=check)
            assert xz_decompress(c) == raw


def test_xz_corruption_fails_loudly():
    from bazof_spark.operators.lzmacodec import xz_decompress

    with pytest.raises(ValueError, match="not an xz"):
        xz_decompress(b"PK\x03\x04 definitely a zip")
    c = bytearray(lzma.compress(b"check " * 500, format=lzma.FORMAT_XZ,
                                check=lzma.CHECK_CRC64))
    c[-5] ^= 1  # footer region
    with pytest.raises(ValueError):
        xz_decompress(bytes(c))


def test_sniff_decompress_nonstandard_dict_size():
    """Spec-legal .lzma with a dict size that is neither 2^n nor
    2^n + 2^(n-1) (nonstandard encoders emit these): the magic-only
    sniff still rejects the shape, but sniff_decompress falls back to
    a decode attempt and succeeds (r10 ADVICE); garbage with a
    sane-looking header still reports an unrecognized container."""
    from bazof_spark.operators.codecs import sniff_decompress, sniff_format

    raw = b"nonstandard dict size " * 400
    c = bytearray(lzma.compress(raw, format=lzma.FORMAT_ALONE))
    # rewrite the header dict size to an odd value; LZMA_ALONE decoding
    # only needs dict_size >= the window actually used, so inflating it
    # to a non-power-of-two keeps the stream decodable
    odd = (1 << 22) + 12345
    c[1:5] = odd.to_bytes(4, "little")
    with pytest.raises(ValueError, match="unrecognized"):
        sniff_format(bytes(c))
    fmt, out = sniff_decompress(bytes(c))
    assert (fmt, out) == ("lzma", raw)
    # garbage that passes the relaxed header check must not surface a
    # confusing decoder error
    junk = bytes([93]) + odd.to_bytes(4, "little") + (1000).to_bytes(
        8, "little"
    ) + os.urandom(64)
    with pytest.raises(ValueError, match="unrecognized"):
        sniff_decompress(junk)


def test_header_only_lzma_alone_still_classified():
    """A 13-byte header-only LZMA_ALONE stream (props + dict + usize,
    empty payload) is degenerate but spec-shaped; sniff_format's >= 13
    guard and _sane_lzma_header's minimum must agree so it stays
    classified as lzma instead of raising 'unrecognized container'."""
    import lzma as _lzma

    from bazof_spark.operators.codecs import _sane_lzma_header, sniff_format

    blob = _lzma.compress(b"x" * 100, format=_lzma.FORMAT_ALONE)
    header = blob[:13]
    assert len(header) == 13
    assert _sane_lzma_header(header)
    assert sniff_format(header) == "lzma"
