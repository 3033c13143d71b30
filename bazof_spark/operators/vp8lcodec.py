"""WebP-lossless (VP8L) image codec, pure stdlib + numpy.

The reference ships no media pipeline (/root/reference/README.md);
this continues the repo's image-codec surface (BMP/PPM/PNG/QOI/TIFF/
JPEG/GIF) with the format modern web scrapes actually contain: WebP.
The LOSSLESS variant (VP8L) is implemented here from the public "WebP
Lossless Bitstream Specification"; lossy WebP (VP8 intra-frame
prediction + DCT) and AVIF (AV1) remain the declared library seam.

Decoder scope — the real bitstream machinery:

* LSB-first bit reader over the RIFF/WEBP/VP8L container.
* Canonical prefix codes: both the "simple" 1-2 symbol form and the
  full code-length-coded form (the DEFLATE-style 16/17/18 repeat
  scheme with VP8L's own code-length-code ordering and the optional
  max_symbol cap).
* Per-group code bundles (green+length+cache, red, blue, alpha,
  distance) with an optional meta-prefix image selecting groups per
  macro-tile (entropy-coded sub-image, decoded recursively).
* LZ77 backward references (length/distance extra-bit prefix values)
  and the color cache (the spec's 0x1e35a7bd multiplicative hash).
* Transforms, applied in reverse decode order: SUBTRACT_GREEN,
  PREDICTOR (all 14 modes, recursive sub-image of per-tile modes),
  COLOR (delta-multiplied cross-channel, recursive sub-image), and
  COLOR_INDEXING (palette with cumulative deltas + sub-byte pixel
  bundling).

The short-distance 2D neighborhood map (distance codes 1..120) is
generated from the spec's rule (offsets within an 8-row window ranked
by euclidean proximity); in-sandbox there is no second WebP
implementation to pin the exact published ordering against, so the
FIXTURE encoder only ever emits direct distance codes (> 120) — every
byte a fixture stream contains round-trips against independent
machinery, and the map is exercised by its own unit invariants.

The fixture encoder is deliberately the simple corner of the format
(single group, literal/LZ77/cache symbols, optional subtract-green),
while the decoder handles the general structure — same discipline as
the repo's JPEG/GIF/FLAC pairs: parser strictly wider than builder.
"""

from __future__ import annotations

import struct

import numpy as np

# code-length-code read order (spec section "Prefix code groups")
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

PRED = 0
COLOR = 1
SUBTRACT_GREEN = 2
COLOR_INDEXING = 3


class _BitReader:
    """LSB-first bit reader (VP8L reads bits from each byte starting
    at the least-significant end)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("VP8L bitstream truncated")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------


def _canonical_codes(lengths: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, canonical assignment: shorter codes
    first, ties by symbol index; codes count upward MSB-first."""
    pairs = sorted(
        (ln, sym) for sym, ln in enumerate(lengths) if ln > 0
    )
    table: dict[tuple[int, int], int] = {}
    code, prev_len = 0, 0
    for ln, sym in pairs:
        code <<= ln - prev_len
        table[(ln, code)] = sym
        code += 1
        prev_len = ln
    return table


class _PrefixCode:
    def __init__(self, lengths: list[int]):
        nz = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
        if len(nz) == 1:
            # degenerate single-symbol code: consumes no bits
            self.single: int | None = nz[0][1]
            self.table = {}
        else:
            self.single = None
            self.table = _canonical_codes(lengths)
            if not self.table:
                raise ValueError("empty prefix code")

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code, ln = 0, 0
        while True:
            code = (code << 1) | br.read(1)
            ln += 1
            if ln > 15:
                raise ValueError("prefix code walk exceeded 15 bits")
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym


def _canonical_encode_map(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for the writer side."""
    return {
        sym: (code, ln)
        for (ln, code), sym in _canonical_codes(lengths).items()
    }


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        lengths = [0] * alphabet_size
        if num_symbols == 2:
            s1 = br.read(8)
            lengths[s0] = lengths[s1] = 1
        else:
            lengths[s0] = 1
        return _PrefixCode(lengths)
    # full: code lengths themselves prefix-coded
    num_clc = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixCode(clc_lengths)
    if br.read(1):  # limited max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    symbol, prev_len = 0, 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = clc.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        elif code_len == 16:
            for _ in range(3 + br.read(2)):
                lengths[symbol] = prev_len
                symbol += 1
        elif code_len == 17:
            symbol += 3 + br.read(3)
        else:
            symbol += 11 + br.read(7)
    return _PrefixCode(lengths)


# ---------------------------------------------------------------------------
# LZ77 prefix values and the short-distance map
# ---------------------------------------------------------------------------


def _lz77_value(code: int, br: _BitReader) -> int:
    """Length/distance prefix value: 4 direct codes then exponential
    ranges with extra bits (spec 'LZ77 backward reference')."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def short_distance_map() -> list[tuple[int, int]]:
    """The 120 near-offsets for distance codes 1..120: (dx, dy) with
    dy in 0..7, |dx| <= 8, scan-order-prior positions only, ranked by
    euclidean distance (ties: smaller dy, then smaller |dx|, then
    negative dx first). Deterministic; see module docstring for the
    interop caveat."""
    cands = []
    for dy in range(8):
        for dx in range(-8, 9):
            if dy == 0 and dx <= 0:
                continue  # only positions strictly before in scan order
            cands.append((dx, dy))
    cands.sort(key=lambda p: (p[0] ** 2 + p[1] ** 2, p[1], abs(p[0]),
                              -(p[0] < 0)))
    return cands[:120]


_SHORT_MAP = short_distance_map()


def _plane_code_to_distance(xsize: int, code: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _SHORT_MAP[code - 1]
    return max(1, dy * xsize - dx)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _div_round_up(a: int, b: int) -> int:
    return (a + b - 1) // b


def _read_code_groups(br: _BitReader, n_groups: int, cache_bits: int):
    groups = []
    for _ in range(n_groups):
        green = _read_prefix_code(
            br, 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
        )
        red = _read_prefix_code(br, 256)
        blue = _read_prefix_code(br, 256)
        alpha = _read_prefix_code(br, 256)
        dist = _read_prefix_code(br, 40)
        groups.append((green, red, blue, alpha, dist))
    return groups


def _decode_image_stream(
    br: _BitReader, xsize: int, ysize: int, is_level0: bool
):
    """Decode one entropy-coded ARGB image (spec 'Decoding of the
    image data'); returns (pixels uint32[ysize*xsize], xsize') where
    xsize' differs from xsize only under pixel bundling."""
    transforms = []
    if is_level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError(f"transform {ttype} repeated")
            seen.add(ttype)
            if ttype == SUBTRACT_GREEN:
                transforms.append((SUBTRACT_GREEN, None))
            elif ttype in (PRED, COLOR):
                size_bits = br.read(3) + 2
                bx = _div_round_up(xsize, 1 << size_bits)
                by = _div_round_up(ysize, 1 << size_bits)
                sub, _ = _decode_image_stream(br, bx, by, False)
                transforms.append((ttype, (size_bits, bx, by, sub)))
            else:  # COLOR_INDEXING
                n_colors = br.read(8) + 1
                pal_deltas, _ = _decode_image_stream(br, n_colors, 1, False)
                palette = np.cumsum(
                    pal_deltas.astype(np.uint32).view(np.uint8)
                    .reshape(-1, 4).astype(np.uint32),
                    axis=0,
                ).astype(np.uint8)  # per-channel cumulative bytes
                xbits = (
                    3 if n_colors <= 2 else
                    2 if n_colors <= 4 else
                    1 if n_colors <= 16 else 0
                )
                transforms.append(
                    (COLOR_INDEXING, (n_colors, xbits, palette))
                )
                if xbits:
                    xsize = _div_round_up(xsize, 1 << xbits)

    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits and not 1 <= cache_bits <= 11:
        raise ValueError(f"invalid color-cache bits {cache_bits}")
    cache = [0] * ((1 << cache_bits) if cache_bits else 0)

    meta = None
    n_groups = 1
    if is_level0 and br.read(1):
        size_bits = br.read(3) + 2
        mx = _div_round_up(xsize, 1 << size_bits)
        my = _div_round_up(ysize, 1 << size_bits)
        meta_img, _ = _decode_image_stream(br, mx, my, False)
        group_idx = (
            ((meta_img >> 16) & 0xFF) << 8 | ((meta_img >> 8) & 0xFF)
        ).astype(np.int64)
        n_groups = int(group_idx.max()) + 1
        meta = (size_bits, mx, group_idx)

    groups = _read_code_groups(br, n_groups, cache_bits)

    n_px = xsize * ysize
    pix = np.zeros(n_px, dtype=np.uint32)
    pos = 0
    while pos < n_px:
        if meta is not None:
            size_bits, mx, group_idx = meta
            x, y = pos % xsize, pos // xsize
            g = groups[
                int(group_idx[(y >> size_bits) * mx + (x >> size_bits)])
            ]
        else:
            g = groups[0]
        green_c, red_c, blue_c, alpha_c, dist_c = g
        s = green_c.read(br)
        if s < 256:  # literal
            r = red_c.read(br)
            b = blue_c.read(br)
            a = alpha_c.read(br)
            argb = (a << 24) | (r << 16) | (s << 8) | b
            pix[pos] = argb
            pos += 1
        elif s < 256 + 24:  # LZ77 backward reference
            length = _lz77_value(s - 256, br)
            dist_code = _lz77_value(dist_c.read(br), br)
            dist = _plane_code_to_distance(xsize, dist_code)
            if dist > pos or pos + length > n_px:
                raise ValueError("LZ77 reference out of range")
            for _ in range(length):
                pix[pos] = pix[pos - dist]
                pos += 1
            argb = int(pix[pos - 1])
        else:  # color-cache hit
            argb = cache[s - 256 - 24]
            pix[pos] = argb
            pos += 1
        if cache_bits:
            # insert every emitted pixel (literal, each copied pixel,
            # and cache hits re-insert harmlessly)
            if s < 256 or s >= 256 + 24:
                cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> (
                    32 - cache_bits
                )] = argb
            else:
                start = pos - length
                for i in range(length):
                    v = int(pix[start + i])
                    cache[(0x1E35A7BD * v & 0xFFFFFFFF) >> (
                        32 - cache_bits
                    )] = v

    return pix, (xsize, transforms)


def _bts(v):  # uint32 argb -> (a, r, g, b) ints
    return (v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF


def _mk(a, r, g, b):
    return ((a & 0xFF) << 24) | ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (
        b & 0xFF
    )


def _avg2(p, q):
    return tuple((pc + qc) >> 1 for pc, qc in zip(_bts(p), _bts(q)))


def _clamp(v):
    return 0 if v < 0 else 255 if v > 255 else v


def _predict_pixel(pix, xsize, x, y, mode) -> int:
    """Prediction for pixel (x, y) from its already-reconstructed
    neighbors — shared verbatim by the decoder's inverse pass and the
    fixture encoder's forward pass, so a round trip checks the
    residual arithmetic rather than two copies of it. Border rules per
    spec: (0,0)=opaque black, row 0=left, column 0=top."""
    i = y * xsize + x
    if x == 0 and y == 0:
        return 0xFF000000
    if y == 0:
        return int(pix[i - 1])
    if x == 0:
        return int(pix[i - xsize])
    L = int(pix[i - 1])
    T = int(pix[i - xsize])
    TL = int(pix[i - xsize - 1])
    TR = int(pix[i - xsize + 1]) if x + 1 < xsize else TL
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _mk(*_avg2(_mk(*_avg2(L, TR)), T))
    if mode == 6:
        return _mk(*_avg2(L, TL))
    if mode == 7:
        return _mk(*_avg2(L, T))
    if mode == 8:
        return _mk(*_avg2(TL, T))
    if mode == 9:
        return _mk(*_avg2(T, TR))
    if mode == 10:
        return _mk(*_avg2(_mk(*_avg2(L, TL)), _mk(*_avg2(T, TR))))
    if mode == 11:  # Select
        pl = sum(abs(tc - tlc) for tc, tlc in zip(_bts(T), _bts(TL)))
        pt = sum(abs(lc - tlc) for lc, tlc in zip(_bts(L), _bts(TL)))
        return L if pl <= pt else T
    if mode == 12:  # ClampAddSubtractFull
        return _mk(
            *(
                _clamp(lc + tc - tlc)
                for lc, tc, tlc in zip(_bts(L), _bts(T), _bts(TL))
            )
        )
    if mode == 13:  # ClampAddSubtractHalf
        ave = _avg2(L, T)
        return _mk(
            *(_clamp(ac + (ac - tlc) // 2) for ac, tlc in zip(ave, _bts(TL)))
        )
    raise ValueError(f"predictor mode {mode}")


def _apply_predictor_inverse(
    pix: np.ndarray, xsize: int, ysize: int, size_bits: int,
    bx: int, sub: np.ndarray
) -> None:
    """Undo the predictor transform in place (all 14 modes). Residuals
    become pixels scan-line by scan-line; per-channel byte arithmetic
    is mod 256."""
    for y in range(ysize):
        for x in range(xsize):
            i = y * xsize + x
            mode = int(
                (sub[(y >> size_bits) * bx + (x >> size_bits)] >> 8) & 0xFF
            )
            pred = _predict_pixel(pix, xsize, x, y, mode)
            pa, pr, pg, pb = _bts(int(pix[i]))
            qa, qr, qg, qb = _bts(pred)
            pix[i] = _mk(pa + qa, pr + qr, pg + qg, pb + qb)


def _apply_color_inverse(
    pix: np.ndarray, xsize: int, ysize: int, size_bits: int,
    bx: int, sub: np.ndarray
) -> None:
    """Undo the color (cross-channel delta) transform in place."""

    def delta(t, c):  # signed 3.5 fixed-point multiplier
        t = t - 256 if t >= 128 else t
        c = c - 256 if c >= 128 else c
        return (t * c) >> 5

    for y in range(ysize):
        for x in range(xsize):
            i = y * xsize + x
            el = int(sub[(y >> size_bits) * bx + (x >> size_bits)])
            # element channels per spec: blue=green_to_red,
            # green=green_to_blue, red=red_to_blue
            g2r = el & 0xFF
            g2b = (el >> 8) & 0xFF
            r2b = (el >> 16) & 0xFF
            v = int(pix[i])
            a = (v >> 24) & 0xFF
            r = (v >> 16) & 0xFF
            g = (v >> 8) & 0xFF
            b = v & 0xFF
            r = (r + delta(g2r, g)) & 0xFF
            b = (b + delta(g2b, g) + delta(r2b, r)) & 0xFF
            pix[i] = (a << 24) | (r << 16) | (g << 8) | b


def decode_vp8l(content: bytes) -> np.ndarray:
    """Decode a WebP-lossless file → uint8 RGBA array (h, w, 4)."""
    if content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP stream")
    pos = 12
    payload = None
    while pos + 8 <= len(content):
        fourcc, size = struct.unpack_from("<4sI", content, pos)
        if fourcc == b"VP8L":
            payload = content[pos + 8 : pos + 8 + size]
            break
        if fourcc in (b"VP8 ", b"VP8X"):
            raise NotImplementedError(
                "lossy/extended WebP needs a codec library; only the "
                "lossless VP8L profile is implemented in-sandbox"
            )
        pos += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("no VP8L chunk")
    if payload[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(payload)
    br.pos = 8
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    pix, (packed_xsize, transforms) = _decode_image_stream(br, w, h, True)

    xsize = packed_xsize
    for ttype, args in reversed(transforms):
        if ttype == COLOR_INDEXING:
            n_colors, xbits, palette = args
            if xbits:
                # unbundle sub-byte packed indices from the green channel
                per = 1 << xbits
                ibits = 8 >> xbits
                wide = np.zeros(w * h, dtype=np.uint32)
                for y in range(h):
                    for x in range(w):
                        packed = int(
                            pix[y * xsize + (x >> xbits)]
                        )
                        idx = ((packed >> 8) & 0xFF) >> (
                            (x % per) * ibits
                        ) & ((1 << ibits) - 1)
                        if idx >= n_colors:
                            raise ValueError("palette index out of range")
                        p = palette[idx]
                        wide[y * w + x] = (
                            (int(p[3]) << 24) | (int(p[2]) << 16)
                            | (int(p[1]) << 8) | int(p[0])
                        )
                pix, xsize = wide, w
            else:
                idx = ((pix >> 8) & 0xFF).astype(np.int64)
                if idx.max() >= n_colors:
                    raise ValueError("palette index out of range")
                p = palette[idx]
                pix = (
                    p[:, 3].astype(np.uint32) << 24
                ) | (p[:, 2].astype(np.uint32) << 16) | (
                    p[:, 1].astype(np.uint32) << 8
                ) | p[:, 0].astype(np.uint32)
        elif ttype == SUBTRACT_GREEN:
            g = (pix >> 8) & 0xFF
            r = (((pix >> 16) & 0xFF) + g) & 0xFF
            b = ((pix & 0xFF) + g) & 0xFF
            pix = (pix & 0xFF00FF00) | (r << 16) | b
        elif ttype == PRED:
            size_bits, bx, by, sub = args
            _apply_predictor_inverse(pix, xsize, h, size_bits, bx, sub)
        elif ttype == COLOR:
            size_bits, bx, by, sub = args
            _apply_color_inverse(pix, xsize, h, size_bits, bx, sub)

    out = np.zeros((h, w, 4), dtype=np.uint8)
    v = pix.reshape(h, w)
    out[:, :, 0] = (v >> 16) & 0xFF
    out[:, :, 1] = (v >> 8) & 0xFF
    out[:, :, 2] = v & 0xFF
    out[:, :, 3] = (v >> 24) & 0xFF
    return out


# ---------------------------------------------------------------------------
# fixture encoder: the simple corner of the format
# ---------------------------------------------------------------------------


def _code_lengths_for(freqs: dict[int, int], alphabet: int) -> list[int]:
    """Package-merge-free length assignment: a shallow Huffman via
    repeated pairing on (count, symbol) heaps, depth-capped at 15 by
    construction for the tiny alphabets fixtures use."""
    import heapq

    items = [(c, s) for s, c in freqs.items() if c > 0]
    if not items:
        raise ValueError("no symbols")
    if len(items) == 1:
        lengths = [0] * alphabet
        lengths[items[0][1]] = 1
        return lengths
    heap = [(c, i, (s,)) for i, (c, s) in enumerate(sorted(items))]
    heapq.heapify(heap)
    depth: dict[int, int] = {s: 0 for _, s in items}
    nxt = len(heap)
    while len(heap) > 1:
        c1, _, s1 = heapq.heappop(heap)
        c2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (c1 + c2, nxt, s1 + s2))
        nxt += 1
    if max(depth.values()) > 15:
        raise ValueError("fixture alphabet too skewed for 15-bit codes")
    lengths = [0] * alphabet
    for s, d in depth.items():
        lengths[s] = d
    return lengths


def _write_prefix_code(bw: _BitWriter, lengths: list[int]) -> None:
    """Emit a full (non-simple) prefix code: code-length-code lengths
    for ALL 19 entries (3 bits each), then the code lengths themselves
    coded with it — no repeats, no max_symbol cap. Verbose but valid,
    and it exercises the decoder's general path."""
    syms = [s for s, ln in enumerate(lengths) if ln > 0]
    if len(syms) <= 2 and max(syms) <= 255:
        # simple code (spec limits its symbols to 8 bits)
        bw.write(1, 1)
        bw.write(len(syms) - 1, 1)
        if syms[0] < 2:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        else:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        if len(syms) == 2:
            bw.write(syms[1], 8)
        return
    bw.write(0, 1)  # full code
    clc_freq: dict[int, int] = {}
    for ln in lengths:
        clc_freq[ln] = clc_freq.get(ln, 0) + 1
    clc_lengths = _code_lengths_for(clc_freq, 19)
    bw.write(15, 4)  # num_code_lengths = 4 + 15 = 19 (all, in order)
    for i in range(19):
        bw.write(clc_lengths[_CLC_ORDER[i]], 3)
    bw.write(0, 1)  # no max_symbol cap
    enc = _canonical_encode_map(clc_lengths)
    single = len([ln for ln in clc_lengths if ln > 0]) == 1
    for ln in lengths:
        if not single:
            code, n = enc[ln]
            for i in range(n - 1, -1, -1):
                bw.write((code >> i) & 1, 1)


class _SymbolWriter:
    def __init__(self, bw: _BitWriter, lengths: list[int]):
        self.bw = bw
        self.enc = _canonical_encode_map(lengths)
        self.single = len([ln for ln in lengths if ln > 0]) == 1

    def write(self, sym: int) -> None:
        if self.single:
            return
        code, n = self.enc[sym]
        for i in range(n - 1, -1, -1):
            self.bw.write((code >> i) & 1, 1)


def _len_code(length: int) -> tuple[int, int, int]:
    """Inverse of _lz77_value: (code, extra_bits, extra_value)."""
    if length <= 4:
        return length - 1, 0, 0
    rem = length - 1
    nbits = rem.bit_length() - 1
    code = 2 * nbits + ((rem >> (nbits - 1)) & 1) - 2
    extra = nbits - 1
    base = (2 + (code & 1)) << extra
    return code + 2, extra, length - base - 1


def _emit_entropy_image(
    bw: _BitWriter,
    argb: np.ndarray,
    is_level0: bool,
    cache_bits: int = 0,
    lz77_min_run: int = 6,
) -> None:
    """Write one entropy-coded image: color-cache info, (level0 only)
    the no-meta bit, the five prefix codes, and the token stream —
    literals, distance-1 LZ77 runs (direct distance codes only), and
    color-cache hits."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size
    tokens = []  # ('lit', argb) | ('copy', length) | ('cache', idx)
    n = len(argb)
    i = 0
    while i < n:
        v = int(argb[i])
        run = 0
        while (
            i + run < n
            and i - 1 >= 0
            and int(argb[i + run]) == int(argb[i + run - 1])
        ):
            run += 1
        if run >= lz77_min_run:
            tokens.append(("copy", run))
            if cache_bits:
                for j in range(run):
                    vv = int(argb[i + j])
                    cache[
                        (0x1E35A7BD * vv & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = vv
            i += run
            continue
        if cache_bits:
            idx = (0x1E35A7BD * v & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[idx] == v:
                tokens.append(("cache", idx))
                i += 1
                continue
            cache[idx] = v
        tokens.append(("lit", v))
        i += 1

    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    for t, x in tokens:
        if t == "lit":
            gf[(x >> 8) & 0xFF] = gf.get((x >> 8) & 0xFF, 0) + 1
            rf[(x >> 16) & 0xFF] = rf.get((x >> 16) & 0xFF, 0) + 1
            bf[x & 0xFF] = bf.get(x & 0xFF, 0) + 1
            af[(x >> 24) & 0xFF] = af.get((x >> 24) & 0xFF, 0) + 1
        elif t == "copy":
            code, _, _ = _len_code(x)
            gf[256 + code] = gf.get(256 + code, 0) + 1
        else:
            gf[256 + 24 + x] = gf.get(256 + 24 + x, 0) + 1
    # distance is always 1 -> direct plane code 120 + 1 = 121
    dcode, dextra, dextra_val = _len_code(121)
    df = {dcode: 1}

    if not gf:
        gf[0] = 1
    for fr in (rf, bf, af):
        if not fr:
            fr[0] = 1

    g_len = _code_lengths_for(gf, 256 + 24 + cache_size)
    r_len = _code_lengths_for(rf, 256)
    b_len = _code_lengths_for(bf, 256)
    a_len = _code_lengths_for(af, 256)
    d_len = _code_lengths_for(df, 40)

    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if is_level0:
        bw.write(0, 1)  # no meta-prefix image
    for lengths in (g_len, r_len, b_len, a_len, d_len):
        _write_prefix_code(bw, lengths)

    gw = _SymbolWriter(bw, g_len)
    rw = _SymbolWriter(bw, r_len)
    bw_w = _SymbolWriter(bw, b_len)
    aw = _SymbolWriter(bw, a_len)
    dw = _SymbolWriter(bw, d_len)
    for t, x in tokens:
        if t == "lit":
            gw.write((x >> 8) & 0xFF)
            rw.write((x >> 16) & 0xFF)
            bw_w.write(x & 0xFF)
            aw.write((x >> 24) & 0xFF)
        elif t == "copy":
            code, extra, extra_val = _len_code(x)
            gw.write(256 + code)
            if extra:
                bw.write(extra_val, extra)
            dw.write(dcode)
            if dextra:
                bw.write(dextra_val, dextra)
        else:
            gw.write(256 + 24 + x)


def _color_delta(t: int, c: int) -> int:
    t = t - 256 if t >= 128 else t
    c = c - 256 if c >= 128 else c
    return (t * c) >> 5


def encode_vp8l(
    rgba: np.ndarray,
    use_subtract_green: bool = False,
    cache_bits: int = 0,
    lz77_min_run: int = 6,
    predictor_mode: int | None = None,
    color_element: tuple[int, int, int] | None = None,
    palette: bool = False,
) -> bytes:
    """Encode an (h, w, 4) uint8 RGBA array as WebP-lossless: single
    prefix-code group, greedy run-length LZ77 (direct distance codes
    only — see module docstring), optional color cache, and any of the
    four spec transforms — subtract-green, a uniform predictor mode
    (0-13, one whole-image tile, forward residuals computed with the
    decoder's own _predict_pixel so a round trip checks the residual
    arithmetic), a uniform color-transform element (g2r, g2b, r2b),
    and palette color-indexing with sub-byte pixel bundling. The
    transform sub-images go through the same entropy-image emitter the
    main image uses."""
    h, w = rgba.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("dimensions out of VP8L range")
    if palette and (use_subtract_green or predictor_mode is not None
                    or color_element is not None):
        raise ValueError("palette excludes the pixel-space transforms")
    px = rgba.astype(np.uint32)
    argb = (
        (px[:, :, 3] << 24) | (px[:, :, 0] << 16) | (px[:, :, 1] << 8)
        | px[:, :, 2]
    ).ravel()

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version

    xsize = w
    if palette:
        colors = list(dict.fromkeys(int(v) for v in argb))
        if len(colors) > 256:
            raise ValueError("palette mode needs <= 256 distinct colors")
        n_colors = len(colors)
        index_of = {c: i for i, c in enumerate(colors)}
        bw.write(1, 1)
        bw.write(COLOR_INDEXING, 2)
        bw.write(n_colors - 1, 8)
        # delta-encode palette entries channel-wise mod 256
        deltas = []
        prev = 0
        for c in colors:
            d = 0
            for shift in (0, 8, 16, 24):
                dc = ((c >> shift) - (prev >> shift)) & 0xFF
                d |= dc << shift
            deltas.append(d)
            prev = c
        _emit_entropy_image(
            bw, np.array(deltas, dtype=np.uint32), False,
            lz77_min_run=1 << 30,
        )
        xbits = (
            3 if n_colors <= 2 else
            2 if n_colors <= 4 else
            1 if n_colors <= 16 else 0
        )
        idx = np.array([index_of[int(v)] for v in argb], dtype=np.uint32)
        if xbits:
            per = 1 << xbits
            ibits = 8 >> xbits
            xsize = _div_round_up(w, per)
            packed = np.zeros(xsize * h, dtype=np.uint32)
            for y in range(h):
                for x in range(w):
                    packed[y * xsize + (x >> xbits)] |= (
                        idx[y * w + x] << ((x % per) * ibits)
                    ) << 8
            argb = packed
        else:
            argb = idx << 8
    if use_subtract_green:
        bw.write(1, 1)
        bw.write(SUBTRACT_GREEN, 2)
        g = (argb >> 8) & 0xFF
        r = (((argb >> 16) & 0xFF) - g) & 0xFF
        b = ((argb & 0xFF) - g) & 0xFF
        argb = (argb & 0xFF00FF00) | (r << 16) | b
    if color_element is not None:
        g2r, g2b, r2b = (v & 0xFF for v in color_element)
        bw.write(1, 1)
        bw.write(COLOR, 2)
        size_bits = 9
        bw.write(size_bits - 2, 3)
        bx = _div_round_up(xsize, 1 << size_bits)
        by = _div_round_up(h, 1 << size_bits)
        el = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
        _emit_entropy_image(
            bw, np.full(bx * by, el, dtype=np.uint32), False,
            lz77_min_run=1 << 30,
        )
        out = argb.copy()
        for i in range(len(argb)):
            v = int(argb[i])
            a = (v >> 24) & 0xFF
            r = (v >> 16) & 0xFF
            g = (v >> 8) & 0xFF
            b = v & 0xFF
            # the inverse adds delta(r2b, RECONSTRUCTED r) — i.e. the
            # original r — so the forward must subtract exactly that
            nr = (r - _color_delta(g2r, g)) & 0xFF
            nb = (b - _color_delta(g2b, g) - _color_delta(r2b, r)) & 0xFF
            out[i] = (a << 24) | (nr << 16) | (g << 8) | nb
        argb = out
    if predictor_mode is not None:
        if not 0 <= predictor_mode <= 13:
            raise ValueError("predictor mode out of range")
        bw.write(1, 1)
        bw.write(PRED, 2)
        size_bits = 9
        bw.write(size_bits - 2, 3)
        bx = _div_round_up(xsize, 1 << size_bits)
        by = _div_round_up(h, 1 << size_bits)
        _emit_entropy_image(
            bw,
            np.full(
                bx * by, 0xFF000000 | (predictor_mode << 8),
                dtype=np.uint32,
            ),
            False,
            lz77_min_run=1 << 30,
        )
        res = argb.copy()
        for y in range(h):
            for x in range(xsize):
                i = y * xsize + x
                pred = _predict_pixel(argb, xsize, x, y, predictor_mode)
                pa, pr, pg, pb = _bts(int(argb[i]))
                qa, qr, qg, qb = _bts(pred)
                res[i] = _mk(pa - qa, pr - qr, pg - qg, pb - qb)
        argb = res
    bw.write(0, 1)  # no more transforms

    _emit_entropy_image(bw, argb, True, cache_bits, lz77_min_run)

    payload = bw.tobytes()
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\x00"
    body = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(body)) + body
