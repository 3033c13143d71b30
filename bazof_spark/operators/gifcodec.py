"""GIF87a/89a codec — pure stdlib+numpy (real LZW, both directions).

The third compressed-media codec after PNG (zlib) and baseline JPEG:
``decode_gif`` hand-parses the logical screen descriptor, global/local
color tables, image descriptors (including INTERLACED row order) and
runs a real variable-width LZW decoder (LSB-first bit packing, code
width growth, clear/end codes, 4096-entry dictionary reset) over the
data sub-blocks; pixels come back as H×W×3 uint8 RGB via the palette.
``encode_gif`` writes a standard GIF89a with a genuine LZW compressor
(dictionary build + reset at 4096) — the two directions share no code,
so a round trip validates the bit packing from both sides. GIF is
LOSSLESS for palette content, so round trips are bit-exact — which is
what lets a DuckDB oracle recompute decoded-pixel statistics from the
synthesis formula (the multimodal_gif_decode workload query).

Animated multi-frame GIFs: ``decode_gif`` returns only the FIRST frame
(the still-image contract the other codecs use), while
``decode_gif_frames`` decodes EVERY frame with progressive
do-not-dispose compositing — the video-seam decode-then-sample path
(multimodal_gif_frame_sample). Unsupported structure raises
ValueError, never mis-decodes.
"""

from __future__ import annotations

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # bit reader: LSB-first across the concatenated sub-block bytes
    acc = 0
    nbits = 0
    pos = 0
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("GIF LZW stream exhausted early")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
            if not entry and code >= clear:
                raise ValueError(f"GIF LZW references empty code {code}")
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"GIF LZW code {code} out of range")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return bytes(out[:n_pixels])


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    w = b""
    for b in indices:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], code_size)
        if next_code < 4096:
            table[wc] = next_code
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:  # dictionary full: reset (the standard strategy)
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def encode_gif(
    pixels: np.ndarray,
    palette: np.ndarray | None = None,
    interlace: bool = False,
) -> bytes:
    """Encode as GIF89a. ``pixels`` is H×W uint8 palette INDICES;
    ``palette`` is N×3 uint8 RGB (default: 256-entry grayscale identity,
    so index == gray value). ``interlace=True`` writes the four-pass
    interlaced row order (decoders must deinterlace)."""
    px = np.asarray(pixels)
    if px.ndim != 2 or px.dtype != np.uint8:
        raise ValueError("encode_gif expects H×W uint8 palette indices")
    h, w = px.shape
    if palette is None:
        g = np.arange(256, dtype=np.uint8)
        palette = np.stack([g, g, g], axis=1)
    pal = np.asarray(palette, dtype=np.uint8)
    n = len(pal)
    bits = max(1, int(n - 1).bit_length())
    size = 1 << bits
    if int(px.max(initial=0)) >= n:
        raise ValueError("pixel index outside the palette")
    out = bytearray(b"GIF89a")
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    out += bytes([0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0])
    table = np.zeros((size, 3), dtype=np.uint8)
    table[:n] = pal
    out += table.tobytes()
    out += b"\x2c" + b"\x00\x00\x00\x00"  # image at (0,0)
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0x00])
    rows = px
    if interlace:
        order = []
        for start, step in _INTERLACE_PASSES:
            order.extend(range(start, h, step))
        rows = px[order]
    min_code = max(2, bits)
    out.append(min_code)
    lzw = _lzw_encode(rows.tobytes(), min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def encode_gif_animated(
    frames: list[np.ndarray],
    palette: np.ndarray | None = None,
    delay_cs: int = 10,
) -> bytes:
    """Encode a list of H×W uint8 palette-index frames as an ANIMATED
    GIF89a (Netscape loop extension + a graphic-control extension per
    frame, disposal "do not dispose") — the fixture side of the real
    video-column seam. All frames share the canvas size and the global
    color table (default 256-entry grayscale identity)."""
    if not frames:
        raise ValueError("encode_gif_animated needs at least one frame")
    fr = [np.asarray(f) for f in frames]
    h, w = fr[0].shape
    for f in fr:
        if f.shape != (h, w) or f.dtype != np.uint8:
            raise ValueError("all frames must be H×W uint8 and same size")
    if palette is None:
        g = np.arange(256, dtype=np.uint8)
        palette = np.stack([g, g, g], axis=1)
    pal = np.asarray(palette, dtype=np.uint8)
    n = len(pal)
    bits = max(1, int(n - 1).bit_length())
    size = 1 << bits
    out = bytearray(b"GIF89a")
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    out += bytes([0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0])
    table = np.zeros((size, 3), dtype=np.uint8)
    table[:n] = pal
    out += table.tobytes()
    # Netscape 2.0 looping extension (loop forever)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(2, bits)
    for f in fr:
        # graphic control: delay, disposal=1 (do not dispose)
        out += b"\x21\xf9\x04" + bytes([0x04]) + int(delay_cs).to_bytes(
            2, "little"
        ) + b"\x00\x00"
        out += b"\x2c" + b"\x00\x00\x00\x00"
        out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
        out += b"\x00"
        out.append(min_code)
        lzw = _lzw_encode(f.tobytes(), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def decode_gif(content: bytes) -> np.ndarray:
    """Decode the first frame of a GIF87a/89a to H×W×3 uint8 RGB."""
    for frame in _iter_gif_frames(content):
        return frame
    raise ValueError("GIF stream has no image block")


def decode_gif_frames(content: bytes, max_frames: int | None = None):
    """Decode ALL frames of an animated GIF to a list of H×W×3 uint8
    RGB arrays — the real video-column seam (frame extraction before
    sampling/feature work). Frames composite progressively: each image
    block paints its region over the previous canvas (the GIF
    "do not dispose" default — disposal methods 2/3, restore-to-
    background/previous, raise rather than mis-composite)."""
    out = []
    for frame in _iter_gif_frames(content):
        out.append(frame)
        if max_frames is not None and len(out) >= max_frames:
            break
    if not out:
        raise ValueError("GIF stream has no image block")
    return out


def _iter_gif_frames(content: bytes):
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    sw = int.from_bytes(content[6:8], "little")
    sh = int.from_bytes(content[8:10], "little")
    packed = content[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(content[pos : pos + 3 * n], dtype=np.uint8)
        gct = gct.reshape(n, 3)
        pos += 3 * n
    canvas = None
    while pos < len(content):
        b = content[pos]
        if b == 0x3B:  # trailer
            return
        if b == 0x21:  # extension: label + sub-blocks
            label = content[pos + 1]
            if label == 0xF9:  # graphic control: check disposal bits
                disposal = (content[pos + 3] >> 2) & 0x7
                if disposal > 1:
                    raise NotImplementedError(
                        f"GIF disposal method {disposal} (restore to "
                        "background/previous) is not implemented — "
                        "frames would mis-composite"
                    )
            pos += 2
            while content[pos] != 0:
                pos += 1 + content[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02X} at {pos}")
        left = int.from_bytes(content[pos + 1 : pos + 3], "little")
        top = int.from_bytes(content[pos + 3 : pos + 5], "little")
        w = int.from_bytes(content[pos + 5 : pos + 7], "little")
        h = int.from_bytes(content[pos + 7 : pos + 9], "little")
        ipacked = content[pos + 9]
        pos += 10
        pal = gct
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(
                content[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image has no color table")
        min_code = content[pos]
        pos += 1
        data = bytearray()
        while content[pos] != 0:
            ln = content[pos]
            data += content[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            _lzw_decode(bytes(data), min_code, w * h), dtype=np.uint8
        ).reshape(h, w)
        if ipacked & 0x40:  # interlaced: invert the four-pass order
            out_rows = np.empty((h, w), dtype=np.uint8)
            src = 0
            for start, step in _INTERLACE_PASSES:
                for y in range(start, h, step):
                    out_rows[y] = idx[src]
                    src += 1
            idx = out_rows
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("GIF pixel index outside the color table")
        rgb = pal[idx]
        if canvas is None:
            canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
        canvas[top : top + h, left : left + w] = rgb
        yield canvas.copy()
