"""DEFLATE (RFC 1951) decompressor, pure Python from the spec.

Everything else in the repo that inflates (PNG, ZIP, WARC gzip
members) goes through zlib — the C implementation. This module is the
INDEPENDENT direction: a from-scratch inflate built from RFC 1951,
so a zlib-compress → this-inflate round trip cross-checks the two
implementations against each other at corpus scale (the same
discipline as G.711-vs-audioop). All three block types are handled:
stored (BTYPE 00 — zlib level 0 emits these), fixed-Huffman (01) and
dynamic-Huffman (10) with the full code-length-code machinery
(16/17/18 repeats in the spec's scrambled transmission order).

DEFLATE's two bit orders, for the next reader: everything EXCEPT
Huffman codes is read LSB-first from each byte; Huffman codes are
packed MSB-of-code-first, so decoding appends each new bit at the
low end of the accumulated code (RFC 1951 §3.1.1).

The length/distance value tables are not copied constants — they are
generated from the structure the RFC defines (4 direct codes then
doubling ranges gaining one extra bit every 4 codes for lengths,
every 2 for distances), and the zlib pin in the tests verifies the
generation is exactly right.
"""

from __future__ import annotations

# code-length-code transmission order (RFC 1951 §3.2.7)
_CLC_ORDER = (16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15)


def _length_table() -> list[tuple[int, int]]:
    """(base, extra_bits) for length codes 257..285, generated from
    the RFC's structure: 8 direct codes (3..10), then ranges of 4
    codes per extra-bit width, with 285 a special direct 258."""
    out = [(3 + i, 0) for i in range(8)]  # codes 257-264
    base = 11
    for extra in range(1, 6):  # codes 265-284
        for _ in range(4):
            out.append((base, extra))
            base += 1 << extra
    out.append((258, 0))  # code 285
    return out


def _distance_table() -> list[tuple[int, int]]:
    """(base, extra_bits) for distance codes 0..29: 4 direct codes
    then 2 codes per extra-bit width."""
    out = [(1, 0), (2, 0), (3, 0), (4, 0)]
    base = 5
    for extra in range(1, 14):
        for _ in range(2):
            out.append((base, extra))
            base += 1 << extra
    return out


_LENGTHS = _length_table()
_DISTANCES = _distance_table()


class _Bits:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("deflate stream truncated")
        b = (self.data[byte] >> (self.pos & 7)) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.bit() << i
        return v

    def align_byte(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _Huff:
    """Canonical Huffman decoder; codes are walked bit-by-bit with the
    first-received bit the most significant (RFC 1951 §3.1.1)."""

    def __init__(self, lengths: list[int]):
        pairs = sorted((ln, s) for s, ln in enumerate(lengths) if ln > 0)
        if not pairs:
            raise ValueError("empty Huffman code")
        self.table: dict[tuple[int, int], int] = {}
        code, prev = 0, 0
        for ln, sym in pairs:
            code <<= ln - prev
            self.table[(ln, code)] = sym
            code += 1
            prev = ln
        self.max_len = pairs[-1][0]

    def read(self, br: _Bits) -> int:
        code, ln = 0, 0
        while True:
            code = (code << 1) | br.bit()
            ln += 1
            if ln > self.max_len:
                raise ValueError("invalid Huffman code in stream")
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym


_FIXED_LIT = None
_FIXED_DIST = None


def _fixed_trees():
    global _FIXED_LIT, _FIXED_DIST
    if _FIXED_LIT is None:
        lengths = (
            [8] * 144 + [9] * 112 + [7] * 24 + [8] * 8
        )  # RFC 1951 §3.2.6
        _FIXED_LIT = _Huff(lengths)
        _FIXED_DIST = _Huff([5] * 30)
    return _FIXED_LIT, _FIXED_DIST


def _dynamic_trees(br: _Bits) -> tuple[_Huff, _Huff]:
    hlit = br.bits(5) + 257
    hdist = br.bits(5) + 1
    hclen = br.bits(4) + 4
    clc_lengths = [0] * 19
    for i in range(hclen):
        clc_lengths[_CLC_ORDER[i]] = br.bits(3)
    clc = _Huff(clc_lengths)
    lengths: list[int] = []
    while len(lengths) < hlit + hdist:
        s = clc.read(br)
        if s < 16:
            lengths.append(s)
        elif s == 16:
            if not lengths:
                raise ValueError("repeat code with no previous length")
            lengths.extend([lengths[-1]] * (3 + br.bits(2)))
        elif s == 17:
            lengths.extend([0] * (3 + br.bits(3)))
        else:
            lengths.extend([0] * (11 + br.bits(7)))
    if len(lengths) != hlit + hdist:
        raise ValueError("code-length run overflowed the table")
    return _Huff(lengths[:hlit]), _Huff(lengths[hlit:])


def inflate(data: bytes) -> bytes:
    """Decompress a raw DEFLATE stream (no zlib/gzip wrapper)."""
    return bytes(_inflate_blocks(_Bits(data)))


def _inflate_blocks(br: _Bits) -> bytearray:
    """Inflate from the reader's current bit position through the
    BFINAL block, leaving the reader positioned just past it — the
    hook multi-member gzip needs to find each member's trailer."""
    data = br.data
    out = bytearray()
    while True:
        bfinal = br.bit()
        btype = br.bits(2)
        if btype == 0:  # stored
            br.align_byte()
            p = br.pos >> 3
            if p + 4 > len(data):
                raise ValueError("stored block header truncated")
            ln = data[p] | (data[p + 1] << 8)
            nlen = data[p + 2] | (data[p + 3] << 8)
            if ln != (~nlen & 0xFFFF):
                raise ValueError("stored block LEN/NLEN mismatch")
            if p + 4 + ln > len(data):
                raise ValueError("stored block payload truncated")
            out += data[p + 4 : p + 4 + ln]
            br.pos = (p + 4 + ln) << 3
        elif btype in (1, 2):
            lit, dist = _fixed_trees() if btype == 1 else _dynamic_trees(br)
            while True:
                s = lit.read(br)
                if s < 256:
                    out.append(s)
                elif s == 256:
                    break
                else:
                    if s > 285:
                        raise ValueError(f"invalid length code {s}")
                    base, extra = _LENGTHS[s - 257]
                    length = base + br.bits(extra)
                    d = dist.read(br)
                    if d > 29:
                        raise ValueError(f"invalid distance code {d}")
                    dbase, dextra = _DISTANCES[d]
                    distance = dbase + br.bits(dextra)
                    if distance > len(out):
                        raise ValueError("distance beyond output start")
                    for _ in range(length):
                        out.append(out[-distance])
        else:
            raise ValueError("reserved BTYPE 11")
        if bfinal:
            return out


def zlib_decompress(data: bytes) -> bytes:
    """Decompress a zlib-wrapped stream (RFC 1950): 2-byte header
    (checked), deflate body, Adler-32 trailer (verified)."""
    if len(data) < 6:
        raise ValueError("zlib stream too short")
    cmf, flg = data[0], data[1]
    if cmf & 0x0F != 8:
        raise ValueError("zlib CM is not deflate")
    if (cmf * 256 + flg) % 31:
        raise ValueError("zlib header check failed")
    if flg & 0x20:
        raise ValueError("preset dictionaries unsupported")
    out = inflate(data[2:-4])
    a, b = 1, 0
    for byte in out:
        a = (a + byte) % 65521
        b = (b + a) % 65521
    adler = int.from_bytes(data[-4:], "big")
    if ((b << 16) | a) != adler:
        raise ValueError("Adler-32 mismatch")
    return out


def _crc32_table() -> list[int]:
    """CRC-32 (reflected 0xEDB88320) table, generated — not copied."""
    table = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ 0xEDB88320 if c & 1 else c >> 1
        table.append(c)
    return table


_CRC32 = _crc32_table()


def crc32(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC32[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def gzip_decompress(data: bytes) -> bytes:
    """Decompress gzip data (RFC 1952), including CONCATENATED
    multi-member files (pigz/bgzip output, per-record WARC gzip):
    members are inflated in sequence — the bit reader's position after
    each BFINAL block locates that member's own CRC-32/ISIZE trailer,
    so every member is verified against ITS trailer, not the last
    one's. Headers handle the FEXTRA/FNAME/FCOMMENT/FHCRC optional
    fields; the CRC-32 table is generated from the reflected
    polynomial, not copied."""
    if len(data) < 18:
        raise ValueError("not a gzip member")
    out = bytearray()
    pos = 0
    while pos < len(data):
        if pos + 18 > len(data) or data[pos] != 0x1F or data[pos + 1] != 0x8B:
            raise ValueError("not a gzip member")
        if data[pos + 2] != 8:
            raise ValueError("gzip CM is not deflate")
        member_start = pos
        flg = data[pos + 3]
        pos += 10
        if flg & 0x04:  # FEXTRA
            xlen = data[pos] | (data[pos + 1] << 8)
            pos += 2 + xlen
        if flg & 0x08:  # FNAME
            pos = data.index(b"\x00", pos) + 1
        if flg & 0x10:  # FCOMMENT
            pos = data.index(b"\x00", pos) + 1
        if flg & 0x02:  # FHCRC: low 16 bits of THIS member's header
            # crc (RFC 1952 §2.3.1 — from its own ID1, not the file
            # start; a preceding member must not poison the sum)
            want = data[pos] | (data[pos + 1] << 8)
            if crc32(data[member_start:pos]) & 0xFFFF != want:
                raise ValueError("gzip header CRC mismatch")
            pos += 2
        br = _Bits(data)
        br.pos = pos << 3
        member = _inflate_blocks(br)
        br.align_byte()
        pos = br.pos >> 3
        if pos + 8 > len(data):
            raise ValueError("gzip trailer truncated")
        want_crc = int.from_bytes(data[pos : pos + 4], "little")
        want_size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        if crc32(bytes(member)) != want_crc:
            raise ValueError("gzip CRC-32 mismatch")
        if want_size != len(member) % (1 << 32):
            raise ValueError("gzip ISIZE mismatch")
        out += member
        pos += 8
    return bytes(out)
