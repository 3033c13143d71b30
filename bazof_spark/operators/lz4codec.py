"""LZ4 block + frame codec and xxHash32, pure Python from the specs.

LZ4 is parquet's fastest compression option and ubiquitous in data
pipelines; nothing in this sandbox exposes its internals (pyarrow
wraps the C library opaquely). This module implements the PUBLIC
specs — the LZ4 block format (token nibbles, 255-continued length
extensions, overlapping matches), the LZ4 frame format (magic, FLG/BD
descriptor with its xxHash32-derived header checksum, block framing,
optional block/content checksums), and xxHash32 itself (the five-prime
lane mix) — as the INDEPENDENT direction against pyarrow's C
implementations, the same cross-implementation discipline as
G.711-vs-audioop and inflate-vs-zlib: the tests compress with the C
library and decompress here (and round-trip the other way, since the
block encoder below emits valid streams the C side accepts).
"""

from __future__ import annotations

import struct

# --------------------------------------------------------------------------
# xxHash32 (public algorithm; seeds the LZ4 frame header checksum)
# --------------------------------------------------------------------------

_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393
_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxhash32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed
        v4 = (seed - _P1) & _M32
        while pos + 16 <= n:
            for i, v in enumerate((v1, v2, v3, v4)):
                (lane,) = struct.unpack_from("<I", data, pos + 4 * i)
                v = (v + lane * _P2) & _M32
                v = (_rotl(v, 13) * _P1) & _M32
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            pos += 16
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        h = (h + lane * _P3) & _M32
        h = (_rotl(h, 17) * _P4) & _M32
        pos += 4
    while pos < n:
        h = (h + data[pos] * _P5) & _M32
        h = (_rotl(h, 11) * _P1) & _M32
        pos += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# --------------------------------------------------------------------------
# LZ4 block format
# --------------------------------------------------------------------------


def lz4_block_decompress(data: bytes, max_size: int | None = None) -> bytes:
    """Decode one standalone raw LZ4 block (see _block_decode_into for
    the mechanics; frame decoding uses the linked-window variant)."""
    out = bytearray()
    _block_decode_into(data, out, 0, max_size)
    return bytes(out)


def _block_decode_into(
    data: bytes,
    out: bytearray,
    window_start: int = 0,
    max_size: int | None = None,
) -> None:
    """Decode one raw LZ4 block INTO ``out``: per sequence a token
    byte (literal length high nibble, match length low nibble, 15 →
    255-continued extension bytes), literals, then a 2-byte
    little-endian offset and a match of (low nibble + 4) bytes which
    MAY overlap the bytes being written (offset < length repeats the
    pattern). Matches may reach back to ``window_start`` — in a frame
    whose blocks are LINKED (FLG independence bit 0, what the C
    frame compressor emits by default), that is the start of the
    accumulated output, not of this block."""
    pos = 0
    n = len(data)
    base = len(out)
    while pos < n:
        token = data[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if pos >= n:
                    raise ValueError("literal length extension truncated")
                b = data[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if pos + lit_len > n:
            raise ValueError("literals overrun the block")
        out += data[pos : pos + lit_len]
        pos += lit_len
        if pos == n:
            break  # last sequence carries literals only
        if pos + 2 > n:
            raise ValueError("match offset truncated")
        offset = data[pos] | (data[pos + 1] << 8)
        pos += 2
        if offset == 0 or offset > len(out) - window_start:
            raise ValueError(f"invalid match offset {offset}")
        match_len = token & 0xF
        if match_len == 15:
            while True:
                if pos >= n:
                    raise ValueError("match length extension truncated")
                b = data[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        match_len += 4  # minmatch
        start = len(out) - offset
        for i in range(match_len):  # byte-wise: overlap is the point
            out.append(out[start + i])
        if max_size is not None and len(out) - base > max_size:
            raise ValueError("output exceeds declared size")


def _write_len(first: int, extra: int) -> bytes:
    """255-continued extension bytes after a nibble of 15."""
    if first < 15:
        return b""
    out = bytearray()
    rem = extra
    while rem >= 255:
        out.append(255)
        rem -= 255
    out.append(rem)
    return bytes(out)


def lz4_block_compress(data: bytes) -> bytes:
    """Greedy hash-chain-free LZ4 block encoder: 4-byte-window exact
    rear matches via a dict of last positions. Emits spec-valid
    streams (end-of-block rules: last sequence literal-only, ≥5
    trailing literal bytes when any match was emitted, matches end ≥12
    bytes before the block end) that the C decoder accepts — the
    round-trip direction of the pin."""
    n = len(data)
    if n == 0:
        return b"\x00"
    out = bytearray()
    table: dict[bytes, int] = {}
    anchor = 0
    pos = 0
    # spec: the last match must start at least 12 bytes before the end
    limit = n - 12
    while pos <= limit:
        key = data[pos : pos + 4]
        cand = table.get(key)
        table[key] = pos
        if (
            cand is not None
            and pos - cand <= 0xFFFF
            and data[cand : cand + 4] == key
        ):
            length = 4
            # spec: the last 5 bytes are always literals
            while pos + length < n - 5 and (
                data[cand + length] == data[pos + length]
            ):
                length += 1
            lit = data[anchor:pos]
            lit_n = len(lit)
            ml = length - 4
            token = (min(lit_n, 15) << 4) | min(ml, 15)
            out.append(token)
            out += _write_len(min(lit_n, 15), lit_n - 15)
            out += lit
            out += struct.pack("<H", pos - cand)
            out += _write_len(min(ml, 15), ml - 15)
            pos += length
            anchor = pos
        else:
            pos += 1
    lit = data[anchor:]
    lit_n = len(lit)
    out.append(min(lit_n, 15) << 4)
    out += _write_len(min(lit_n, 15), lit_n - 15)
    out += lit
    return bytes(out)


# --------------------------------------------------------------------------
# LZ4 frame format
# --------------------------------------------------------------------------

_MAGIC = 0x184D2204


def lz4_frame_decompress(data: bytes) -> bytes:
    """Decode an LZ4 frame: magic, FLG/BD descriptor (version must be
    01; the header checksum byte is byte 1 of xxh32 over the
    descriptor), then 4-byte-size-prefixed blocks (high bit set =
    stored uncompressed), optional per-block checksums, the 0 EndMark,
    and the optional whole-content xxh32 — every checksum verified."""
    if len(data) < 7:
        raise ValueError("LZ4 frame too short")
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != _MAGIC:
        raise ValueError("bad LZ4 frame magic")
    flg = data[4]
    bd = data[5]
    if (flg >> 6) != 0b01:
        raise ValueError("unsupported LZ4 frame version")
    b_independent = bool(flg & 0x20)
    b_checksum = bool(flg & 0x10)
    c_size = bool(flg & 0x08)
    c_checksum = bool(flg & 0x04)
    if flg & 0x01:
        raise ValueError("dictionaries unsupported")
    bmax_code = (bd >> 4) & 0x7
    if not 4 <= bmax_code <= 7:
        raise ValueError(f"invalid block max-size code {bmax_code}")
    bmax = 1 << (2 * bmax_code + 8)  # 4→64KB … 7→4MB
    pos = 6
    desc_end = pos + (8 if c_size else 0)
    declared = None
    if c_size:
        (declared,) = struct.unpack_from("<Q", data, pos)
    hc = data[desc_end]
    if ((xxhash32(data[4 : desc_end]) >> 8) & 0xFF) != hc:
        raise ValueError("frame descriptor checksum mismatch")
    pos = desc_end + 1
    out = bytearray()
    while True:
        if pos + 4 > len(data):
            raise ValueError("missing EndMark")
        (bsize,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if bsize == 0:
            break
        stored = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        if bsize > bmax:
            raise ValueError("block exceeds declared max size")
        block = data[pos : pos + bsize]
        if len(block) != bsize:
            raise ValueError("block truncated")
        pos += bsize
        if b_checksum:
            (bc,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if xxhash32(block) != bc:
                raise ValueError("block checksum mismatch")
        if stored:
            out += block
        else:
            # independent blocks reset the match window; linked blocks
            # (the C compressor's default) reach back across them
            _block_decode_into(
                block, out, len(out) if b_independent else 0
            )
    if c_checksum:
        (cc,) = struct.unpack_from("<I", data, pos)
        if xxhash32(bytes(out)) != cc:
            raise ValueError("content checksum mismatch")
    if declared is not None and declared != len(out):
        raise ValueError("content size mismatch")
    return bytes(out)


def lz4_frame_compress(data: bytes, block_size_code: int = 4) -> bytes:
    """Minimal valid frame around the block encoder: independent
    blocks, content checksum on."""
    flg = (0b01 << 6) | 0x20 | 0x04  # version, independent, c-checksum
    bd = (block_size_code & 0x7) << 4
    desc = bytes([flg, bd])
    hc = (xxhash32(desc) >> 8) & 0xFF
    out = bytearray(struct.pack("<I", _MAGIC) + desc + bytes([hc]))
    bmax = 1 << (2 * block_size_code + 8)
    for i in range(0, max(len(data), 1), bmax):
        chunk = data[i : i + bmax]
        comp = lz4_block_compress(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp)) + comp
        else:
            out += struct.pack("<I", 0x80000000 | len(chunk)) + chunk
    out += struct.pack("<I", 0)
    out += struct.pack("<I", xxhash32(data))
    return bytes(out)
