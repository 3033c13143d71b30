"""Baseline TIFF 6.0 (Adobe public spec), pure stdlib/numpy.

The remaining ubiquitous still-image container after BMP/PNG/JPEG/GIF/
QOI: scans, satellite tiles, and medical exports ship as TIFF. This
implements the baseline subset both directions:

- Writer: little-endian ("II*\\0") files, 8-bit grayscale or RGB,
  strip layout (RowsPerStrip configurable so multi-strip paths carry
  live data), Compression 1 (none), 32773 (PackBits RLE) or 5 (TIFF
  LZW — MSB-first bit packing, 9-bit start, ClearCode 256 / EOI 257,
  and the spec's EarlyChange width bump one code BEFORE the table
  fills, all unlike GIF's LSB-first variant in gifcodec.py).
- Reader: either byte order ("II"/"MM"), IFD walk with long values
  out-of-line, strip reassembly, and all three compressions.

Encoder and decoder are independent directions (struct builder vs IFD
walk + fresh LZW/PackBits decoders), so round trips validate the
actual byte format; TIFF here is lossless, so the workload oracle
recomputes pixel checksums from the synthesis formula.
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279

COMP_NONE = 1
COMP_LZW = 5
COMP_PACKBITS = 32773


# --- PackBits ---------------------------------------------------------------


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run & 0xFF)
            out.append(data[i])
            i += run
            continue
        j = i + 1
        while (
            j < n
            and j - i < 128
            and not (j + 1 < n and data[j] == data[j + 1])
        ):
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < expect:
        if i >= len(data):
            raise ValueError("PackBits stream exhausted")
        b = data[i]
        i += 1
        if b < 128:
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # 128 = no-op
    return bytes(out[:expect])


# --- TIFF LZW (MSB-first, EarlyChange) --------------------------------------


def tiff_lzw_encode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        # EarlyChange: bump width when next_code == 2^width - 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:  # table nearly full: reset
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([ch])
    if w:
        emit(table[w], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def tiff_lzw_decode(data: bytes, expect: int) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    pos = bit = 0

    def read(width: int) -> int:
        nonlocal pos, bit
        v = 0
        for _ in range(width):
            if pos >= len(data):
                raise ValueError("TIFF LZW stream exhausted")
            v = (v << 1) | ((data[pos] >> (7 - bit)) & 1)
            bit += 1
            if bit == 8:
                bit = 0
                pos += 1
        return v

    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    while len(out) < expect:
        code = read(width)
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt TIFF LZW code")
        out += entry
        prev = entry
        # the decoder's table lags the encoder's by ONE entry (no
        # insertion happens on the first code after CLEAR), so the
        # EarlyChange bump fires at 2^width - 2 here vs the encoder's
        # next_code == 2^width - 1
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    if len(out) < expect:
        raise ValueError("TIFF LZW ended before strip filled")
    return bytes(out[:expect])


# --- container ---------------------------------------------------------------


def encode_tiff(
    px: np.ndarray,
    compression: int = COMP_NONE,
    rows_per_strip: int = 4,
) -> bytes:
    """Encode H×W (grayscale) or H×W×3 (RGB) uint8 pixels as a
    little-endian baseline TIFF with the given compression."""
    if px.ndim == 2:
        spp, photometric = 1, 1
    elif px.ndim == 3 and px.shape[2] == 3:
        spp, photometric = 3, 2
    else:
        raise ValueError("expected H x W or H x W x 3 uint8 array")
    h, w = px.shape[0], px.shape[1]
    raw = px.astype(np.uint8).tobytes()
    stride = w * spp
    strips = []
    for y0 in range(0, h, rows_per_strip):
        rows = min(rows_per_strip, h - y0)
        strip = raw[y0 * stride : (y0 + rows) * stride]
        if compression == COMP_PACKBITS:
            strip = packbits_encode(strip)
        elif compression == COMP_LZW:
            strip = tiff_lzw_encode(strip)
        elif compression != COMP_NONE:
            raise ValueError(f"unsupported compression {compression}")
        strips.append(strip)

    n_entries = 9
    # layout: header(8) | IFD | [bits array if spp==3] | strip tables | data
    ifd_at = 8
    after_ifd = ifd_at + 2 + 12 * n_entries + 4
    bits_at = after_ifd
    bits_extra = 6 if spp == 3 else 0
    offsets_at = bits_at + bits_extra
    n_strips = len(strips)
    tables_extra = 8 * n_strips if n_strips > 1 else 0
    data_at = offsets_at + tables_extra
    strip_offsets = []
    p = data_at
    for s in strips:
        strip_offsets.append(p)
        p += len(s)

    def entry(tag, typ, count, value):
        return struct.pack("<HHI", tag, typ, count) + struct.pack("<I", value)

    entries = [
        entry(_TAG_WIDTH, 3, 1, w),
        entry(_TAG_LENGTH, 3, 1, h),
        entry(
            _TAG_BITS, 3, spp,
            8 if spp == 1 else bits_at,
        ),
        entry(_TAG_COMPRESSION, 3, 1, compression),
        entry(_TAG_PHOTOMETRIC, 3, 1, photometric),
        entry(
            _TAG_STRIP_OFFSETS, 4, n_strips,
            strip_offsets[0] if n_strips == 1 else offsets_at,
        ),
        entry(_TAG_SPP, 3, 1, spp),
        entry(_TAG_ROWS_PER_STRIP, 3, 1, rows_per_strip),
        entry(
            _TAG_STRIP_COUNTS, 4, n_strips,
            len(strips[0]) if n_strips == 1 else offsets_at + 4 * n_strips,
        ),
    ]
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_at))
    out += struct.pack("<H", n_entries) + b"".join(entries)
    out += struct.pack("<I", 0)  # no next IFD
    if spp == 3:
        out += struct.pack("<HHH", 8, 8, 8)
    if n_strips > 1:
        out += b"".join(struct.pack("<I", o) for o in strip_offsets)
        out += b"".join(struct.pack("<I", len(s)) for s in strips)
    for s in strips:
        out += s
    return bytes(out)


def decode_tiff(content: bytes) -> np.ndarray:
    """Decode a baseline TIFF → H×W (gray) or H×W×3 uint8 array.
    Accepts either byte order; gray/RGB 8-bit, strip layout,
    compression none/LZW/PackBits."""
    if content[:4] == b"II*\x00":
        bo = "<"
    elif content[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF stream")
    (ifd_at,) = struct.unpack_from(bo + "I", content, 4)
    (n_entries,) = struct.unpack_from(bo + "H", content, ifd_at)
    tags = {}
    for i in range(n_entries):
        tag, typ, count = struct.unpack_from(
            bo + "HHI", content, ifd_at + 2 + 12 * i
        )
        voff = ifd_at + 2 + 12 * i + 8
        size = {1: 1, 3: 2, 4: 4}.get(typ)
        if size is None:
            continue  # rational/ascii tags irrelevant to baseline decode
        if size * count <= 4:
            at = voff
        else:
            (at,) = struct.unpack_from(bo + "I", content, voff)
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(
            struct.unpack_from(bo + fmt * count, content, at)
        )
    try:
        w = tags[_TAG_WIDTH][0]
        h = tags[_TAG_LENGTH][0]
        offsets = tags[_TAG_STRIP_OFFSETS]
        counts = tags[_TAG_STRIP_COUNTS]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}") from e
    spp = tags.get(_TAG_SPP, [1])[0]
    bits = tags.get(_TAG_BITS, [8])
    comp = tags.get(_TAG_COMPRESSION, [COMP_NONE])[0]
    rps = tags.get(_TAG_ROWS_PER_STRIP, [h])[0]
    if any(b != 8 for b in bits) or spp not in (1, 3):
        raise NotImplementedError("baseline decoder handles 8-bit gray/RGB")
    stride = w * spp
    raw = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        rows = min(rps, h - si * rps)
        expect = rows * stride
        strip = content[off : off + cnt]
        if len(strip) != cnt:
            raise ValueError("TIFF strip extends past end of file")
        if comp == COMP_NONE:
            if len(strip) < expect:
                raise ValueError("uncompressed strip shorter than expected")
            raw += strip[:expect]
        elif comp == COMP_PACKBITS:
            raw += packbits_decode(strip, expect)
        elif comp == COMP_LZW:
            raw += tiff_lzw_decode(strip, expect)
        else:
            raise NotImplementedError(f"TIFF compression {comp}")
    arr = np.frombuffer(bytes(raw), dtype=np.uint8)
    return arr.reshape(h, w) if spp == 1 else arr.reshape(h, w, 3)
