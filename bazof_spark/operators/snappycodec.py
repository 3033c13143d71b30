"""Snappy raw-block codec, pure Python from the public format spec.

Snappy is parquet's DEFAULT compression codec — the single most
common byte format in a lakehouse — and, like LZ4, only reachable
here through pyarrow's opaque C wrapper. This implements the public
``format_description.txt`` both directions as the independent pin:
a little-endian varint uncompressed length, then tagged elements —
literals (tag 00, lengths ≤60 inline, 61-64 → 1-4 extra LE bytes),
1-byte-offset copies (tag 01: 4-11 byte matches, 11-bit offsets
packed 3-in-tag), and 2-/4-byte-offset copies (tags 10/11, 1-64 byte
matches). Copies may overlap their own output (offset < length
repeats the pattern), exactly like LZ4.
"""

from __future__ import annotations


def _uvarint(data: bytes, pos: int) -> tuple[int, int]:
    v, shift = 0, 0
    while True:
        if pos >= len(data):
            raise ValueError("snappy varint truncated")
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy varint overflow")


def _put_uvarint(v: int) -> bytes:
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def snappy_decompress(data: bytes) -> bytes:
    declared, pos = _uvarint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 0x3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nbytes = ln - 59
                if pos + nbytes > n:
                    raise ValueError("literal length bytes truncated")
                ln = int.from_bytes(data[pos : pos + nbytes], "little")
                pos += nbytes
            ln += 1
            if pos + ln > n:
                raise ValueError("literal overruns input")
            out += data[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            length = 4 + ((tag >> 2) & 0x7)
            if pos >= n:
                raise ValueError("copy-1 offset truncated")
            offset = ((tag & 0xE0) << 3) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            length = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError("copy-2 offset truncated")
            offset = data[pos] | (data[pos + 1] << 8)
            pos += 2
        else:  # copy, 4-byte offset
            length = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError("copy-4 offset truncated")
            offset = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError(f"invalid copy offset {offset}")
        start = len(out) - offset
        for i in range(length):  # overlap-safe byte-wise copy
            out.append(out[start + i])
    if len(out) != declared:
        raise ValueError(
            f"decompressed {len(out)} bytes, header declared {declared}"
        )
    return bytes(out)


def _emit_literal(out: bytearray, lit: bytes) -> None:
    ln = len(lit)
    if ln == 0:
        return
    n = ln - 1
    if n < 60:
        out.append(n << 2)
    elif n < (1 << 8):
        out.append(60 << 2)
        out.append(n)
    elif n < (1 << 16):
        out.append(61 << 2)
        out += n.to_bytes(2, "little")
    elif n < (1 << 24):
        out.append(62 << 2)
        out += n.to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += n.to_bytes(4, "little")
    out += lit


def _emit_copy(out: bytearray, offset: int, length: int) -> None:
    """Split a long match into ≤64-byte copy elements; use the packed
    1-byte-offset form when it fits (4-11 bytes, offset < 2048)."""
    while length > 0:
        if 4 <= length <= 11 and offset < 2048:
            out.append(
                0x1 | ((length - 4) << 2) | ((offset >> 8) << 5)
            )
            out.append(offset & 0xFF)
            return
        step = min(length, 64)
        if length - step in (1, 2, 3):
            step = length - 4  # leave a ≥4-byte tail for the next copy
        if offset < (1 << 16):
            out.append(0x2 | ((step - 1) << 2))
            out += offset.to_bytes(2, "little")
        else:
            out.append(0x3 | ((step - 1) << 2))
            out += offset.to_bytes(4, "little")
        length -= step


def snappy_compress(data: bytes) -> bytes:
    """Greedy 4-byte-anchor encoder emitting spec-valid streams the C
    decoder accepts — the round-trip direction of the pin."""
    out = bytearray(_put_uvarint(len(data)))
    n = len(data)
    table: dict[bytes, int] = {}
    anchor = 0
    pos = 0
    while pos + 4 <= n:
        key = data[pos : pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is not None and data[cand : cand + 4] == key:
            length = 4
            while pos + length < n and data[cand + length] == data[
                pos + length
            ]:
                length += 1
            _emit_literal(out, data[anchor:pos])
            _emit_copy(out, pos - cand, length)
            pos += length
            anchor = pos
        else:
            pos += 1
    _emit_literal(out, data[anchor:])
    return bytes(out)
