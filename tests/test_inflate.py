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
