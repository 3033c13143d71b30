"""RFC 1951 inflate tests: pinned byte-for-byte against zlib (the C
implementation — the independent direction) across every compression
level and block type, plus loud failures on corrupt streams."""

import os
import random
import zlib

import pytest

from bazof_spark.operators.inflate import (
    _distance_table,
    _length_table,
    inflate,
    zlib_decompress,
)


def _corpus():
    random.seed(5)
    return [
        b"",
        b"a",
        b"hello world" * 100,
        os.urandom(5000),
        bytes(random.choice(b"abcd") for _ in range(20000)),
        b"\x00" * 70000,  # > one stored block (max 65535)
    ]


@pytest.mark.parametrize("level", list(range(10)))
def test_inflate_matches_zlib_all_levels(level):
    """level 0 = stored blocks, 1 = fixed-leaning, 6/9 = dynamic —
    all three BTYPEs reach the decoder."""
    for raw in _corpus():
        assert zlib_decompress(zlib.compress(raw, level)) == raw
        co = zlib.compressobj(level, zlib.DEFLATED, -15)
        assert inflate(co.compress(raw) + co.flush()) == raw


def test_generated_tables_match_rfc_structure():
    lt = _length_table()
    assert len(lt) == 29
    assert lt[0] == (3, 0) and lt[8] == (11, 1) and lt[-1] == (258, 0)
    assert lt[27] == (227, 5)  # code 284 covers 227..257
    dt = _distance_table()
    assert len(dt) == 30
    assert dt[0] == (1, 0) and dt[4] == (5, 1) and dt[-1] == (24577, 13)


def test_corrupt_streams_fail_loudly():
    z = bytearray(zlib.compress(b"xyz" * 50, 6))
    z[-1] ^= 1
    with pytest.raises(ValueError, match="Adler-32"):
        zlib_decompress(bytes(z))
    with pytest.raises(ValueError, match="header check"):
        zlib_decompress(b"\x78\x00" + b"\x00" * 8)
    with pytest.raises(ValueError, match="truncated"):
        zlib_decompress(zlib.compress(b"q" * 1000, 9)[:-8] + b"\x00" * 4)
    # stored block with broken NLEN complement
    co = zlib.compressobj(0, zlib.DEFLATED, -15)
    d = bytearray(co.compress(b"abcdef") + co.flush())
    d[3] ^= 0xFF
    with pytest.raises(ValueError, match="LEN/NLEN"):
        inflate(bytes(d))


def test_gzip_and_crc32_pinned_to_stdlib():
    import gzip
    import io
    import os
    import zlib as z

    from bazof_spark.operators.inflate import crc32, gzip_decompress

    for raw in [b"", b"abc", b"hello " * 1000, os.urandom(8000)]:
        assert crc32(raw) == z.crc32(raw)
        assert gzip_decompress(gzip.compress(raw, 6)) == raw
    buf = io.BytesIO()
    with gzip.GzipFile(filename="x.txt", fileobj=buf, mode="wb") as f:
        f.write(b"named member")
    assert gzip_decompress(buf.getvalue()) == b"named member"
    bad = bytearray(gzip.compress(b"q" * 100))
    bad[-5] ^= 1  # CRC byte
    with pytest.raises(ValueError, match="CRC-32"):
        gzip_decompress(bytes(bad))


def test_gzip_multi_member_concatenation():
    """Concatenated gzip members (pigz/bgzip, per-record WARC gzip)
    decompress to the concatenation of their payloads, each verified
    against its OWN CRC/ISIZE trailer."""
    import gzip
    import os

    from bazof_spark.operators.inflate import gzip_decompress

    parts = [b"first member ", b"second " * 40, os.urandom(500), b""]
    blob = b"".join(gzip.compress(p, i % 9 + 1) for i, p in enumerate(parts))
    assert gzip_decompress(blob) == b"".join(parts)
    # a corrupt SECOND member's CRC is caught, not silently ignored
    bad = bytearray(gzip.compress(b"a" * 64) + gzip.compress(b"b" * 64))
    bad[-5] ^= 1
    with pytest.raises(ValueError, match="CRC-32"):
        gzip_decompress(bytes(bad))
    # trailing garbage after a member is not silently dropped
    with pytest.raises(ValueError, match="not a gzip member"):
        gzip_decompress(gzip.compress(b"x") + b"JUNKJUNKJUNKJUNKJUNK")
    # FHCRC members: the header CRC covers THIS member's header only
    # (a preceding member must not poison the sum)
    import io as _io
    import zlib as _z

    def member_with_fhcrc(payload: bytes) -> bytes:
        header = b"\x1f\x8b\x08\x02\x00\x00\x00\x00\x00\xff"
        hcrc = (_z.crc32(header) & 0xFFFF).to_bytes(2, "little")
        co = _z.compressobj(6, _z.DEFLATED, -15)
        body = co.compress(payload) + co.flush()
        trailer = _z.crc32(payload).to_bytes(4, "little") + (
            len(payload) % (1 << 32)
        ).to_bytes(4, "little")
        return header + hcrc + body + trailer

    two = member_with_fhcrc(b"first") + member_with_fhcrc(b"second")
    assert gzip.decompress(two) == b"firstsecond"  # stdlib agrees
    assert gzip_decompress(two) == b"firstsecond"


def test_sniff_lzma_header_plausibility():
    """sniff_format accepts every real LZMA_ALONE preset (including
    8/9 whose 32/64 MiB dict sizes zero the low header bytes) and
    rejects garbage instead of dispatching it to the range decoder."""
    import lzma

    import pytest as _pytest

    from bazof_spark.operators.codecs import sniff_decompress, sniff_format

    raw = b"dict size shapes " * 64
    for preset in range(10):
        blob = lzma.compress(raw, format=lzma.FORMAT_ALONE, preset=preset)
        assert sniff_format(blob) == "lzma", preset
        assert sniff_decompress(blob) == ("lzma", raw)
    # plausible-first-byte garbage: props ok but dict size is not a
    # real encoder shape -> clean rejection, not an LZMA decode error
    for junk in [
        b"\x5d\x03\x00\x00\x00" + b"\xff" * 8 + b"junk",   # dict 3
        b"\x5d\x05\x00\x00\x00" + b"\xff" * 8 + b"junk",   # dict 5 (not 2^n/3*2^k)
        b"\x10" + bytes(16),                               # dict 0
        b"hello world, plain text!",
    ]:
        with _pytest.raises(ValueError, match="unrecognized"):
            sniff_format(junk)
