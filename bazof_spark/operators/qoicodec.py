"""QOI — the "Quite OK Image" format (qoiformat.org, public-domain
spec, 2022), pure stdlib/numpy.

A real, current interchange format (stb-adjacent tooling, game
pipelines, ML dataset dumps) whose whole spec fits on one page:
byte-oriented ops over an RGBA pixel stream with a 64-entry running
index. Implemented both directions from the spec — encoder emits the
standard greedy op choice (RUN → INDEX → DIFF → LUMA → RGB/RGBA), the
decoder accepts any conformant stream — so round trips validate the
actual byte format and the repo's image-decode surface gains a
lossless codec with none of JPEG's entropy-loop cost.

Ops (tag bits): 00xxxxxx INDEX · 01drdgdb DIFF (2-bit, bias 2,
wrapping) · 10dddddd + drdg/dbdg LUMA (6-bit dg bias 32, 4-bit
dr−dg / db−dg bias 8) · 11xxxxxx RUN (bias −1, max 62) · 0xFE RGB ·
0xFF RGBA. Index position = (r*3 + g*5 + b*7 + a*11) % 64, updated
after every decoded pixel; stream ends with seven 0x00 then 0x01.
"""

from __future__ import annotations

import struct

import numpy as np


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(px: np.ndarray) -> bytes:
    """Encode an H×W×3 (RGB) or H×W×4 (RGBA) uint8 array."""
    if px.ndim != 3 or px.shape[2] not in (3, 4):
        raise ValueError("expected H x W x 3|4 uint8 array")
    h, w, ch = px.shape
    out = bytearray(b"qoif" + struct.pack(">IIBB", w, h, ch, 0))
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    flat = px.reshape(-1, ch)
    for p in flat:
        if ch == 4:
            r, g, b, a = int(p[0]), int(p[1]), int(p[2]), int(p[3])
        else:
            r, g, b, a = int(p[0]), int(p[1]), int(p[2]), pa
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        hidx = _hash(r, g, b, a)
        if index[hidx] == (r, g, b, a):
            out.append(hidx)
        else:
            index[hidx] = (r, g, b, a)
            if a == pa:
                dr = (r - pr + 128) % 256 - 128
                dg = (g - pg + 128) % 256 - 128
                db = (b - pb + 128) % 256 - 128
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(
                        0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2)
                    )
                elif (
                    -32 <= dg <= 31
                    and -8 <= dr - dg <= 7
                    and -8 <= db - dg <= 7
                ):
                    out.append(0x80 | (dg + 32))
                    out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                else:
                    out += bytes((0xFE, r, g, b))
            else:
                out += bytes((0xFF, r, g, b, a))
        pr, pg, pb, pa = r, g, b, a
    if run:
        out.append(0xC0 | (run - 1))
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)


def decode_qoi(content: bytes) -> np.ndarray:
    """Decode a QOI blob → H×W×C uint8 (C from the header)."""
    if content[:4] != b"qoif" or len(content) < 14:
        raise ValueError("not a QOI stream")
    w, h, ch, _cs = struct.unpack_from(">IIBB", content, 4)
    if ch not in (3, 4):
        raise ValueError(f"bad channel count {ch}")
    n = w * h
    out = np.empty((n, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos, i = 14, 0
    end = len(content) - 8
    while i < n:
        if pos >= end:
            raise ValueError("QOI stream exhausted before all pixels")
        byte = content[pos]
        pos += 1
        if byte == 0xFE:
            r, g, b = content[pos], content[pos + 1], content[pos + 2]
            pos += 3
        elif byte == 0xFF:
            r, g, b, a = (
                content[pos], content[pos + 1],
                content[pos + 2], content[pos + 3],
            )
            pos += 4
        elif byte >> 6 == 0:
            r, g, b, a = index[byte]
        elif byte >> 6 == 1:
            r = (r + ((byte >> 4) & 3) - 2) % 256
            g = (g + ((byte >> 2) & 3) - 2) % 256
            b = (b + (byte & 3) - 2) % 256
        elif byte >> 6 == 2:
            dg = (byte & 0x3F) - 32
            second = content[pos]
            pos += 1
            r = (r + dg + ((second >> 4) & 0xF) - 8) % 256
            g = (g + dg) % 256
            b = (b + dg + (second & 0xF) - 8) % 256
        else:  # RUN
            run = (byte & 0x3F) + 1
            if i + run > n:
                raise ValueError("QOI run overflows pixel count")
            out[i : i + run] = (r, g, b, a)
            i += run
            index[_hash(r, g, b, a)] = (r, g, b, a)
            continue
        index[_hash(r, g, b, a)] = (r, g, b, a)
        out[i] = (r, g, b, a)
        i += 1
    if content[-8:] != b"\x00" * 7 + b"\x01":
        raise ValueError("missing QOI end marker")
    return out.reshape(h, w, 4)[:, :, :ch]
