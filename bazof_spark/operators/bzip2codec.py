"""bzip2 decompressor, pure Python from the public format.

bzip2 is the classic block-sorting compressor (Burrows-Wheeler
transform + move-to-front + Huffman) — still common for archived web
corpora (Wikipedia dumps ship as .bz2). CPython's ``bz2`` wraps the
C library, which makes it a free independent pin for a from-format
implementation, completing the repo's decompressor family
(inflate/zlib, LZ4+Snappy+ZSTD/pyarrow, G.711/audioop).

The format (public, documented in the bzip2 sources and countless
format notes; there is no RFC) per block:

* stream header ``BZh`` + level digit (block size 100k–900k),
* block magic 0x314159265359 (π), 32-bit block CRC (the UNreflected
  0x04C11DB7 polynomial, MSB-first — generated below, not copied),
* the deprecated randomization bit (rejected), 24-bit BWT origin
  pointer,
* the two-level symbol-presence map (16 sector bits + 16 bits per
  present sector),
* 3–6 Huffman tables with delta-coded lengths, selected per 50-symbol
  group by MTF-coded unary selectors,
* the symbol stream: RUNA/RUNB encode zero-runs in bijective base 2,
  other symbols are MTF indices, EOB terminates,
* inverse MTF → inverse BWT (counting-sort successor walk from the
  origin pointer) → the final RLE1 pass (4 equal bytes + count byte).

Everything is read MSB-first — bzip2 is a big-endian bit format.
"""

from __future__ import annotations


def _crc32_msb_table() -> list[int]:
    table = []
    for i in range(256):
        c = i << 24
        for _ in range(8):
            c = ((c << 1) ^ 0x04C11DB7 if c & 0x80000000 else c << 1)
            c &= 0xFFFFFFFF
        table.append(c)
    return table


_CRC = _crc32_msb_table()


def _bz_crc(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC[(crc >> 24) ^ b]
    return crc ^ 0xFFFFFFFF


class _MsbBits:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("bzip2 stream truncated")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


class _Huff:
    def __init__(self, lengths: list[int]):
        pairs = sorted((ln, s) for s, ln in enumerate(lengths))
        self.table: dict[tuple[int, int], int] = {}
        code, prev = 0, pairs[0][0]
        for ln, sym in pairs:
            code <<= ln - prev
            self.table[(ln, code)] = sym
            code += 1
            prev = ln
        self.max_len = pairs[-1][0]

    def read(self, br: _MsbBits) -> int:
        code, ln = 0, 0
        while True:
            code = (code << 1) | br.read(1)
            ln += 1
            if ln > self.max_len:
                raise ValueError("invalid Huffman code in bzip2 block")
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym


def _decode_block(br: _MsbBits, block_max: int) -> bytes:
    crc_want = br.read(32)
    if br.read(1):
        raise ValueError("randomized blocks are deprecated and unsupported")
    orig_ptr = br.read(24)

    # symbol presence map
    sectors = br.read(16)
    present: list[int] = []
    for i in range(16):
        if sectors & (0x8000 >> i):
            bits = br.read(16)
            for j in range(16):
                if bits & (0x8000 >> j):
                    present.append(16 * i + j)
    if not present:
        raise ValueError("empty bzip2 symbol map")
    n_sym = len(present) + 2  # RUNA/RUNB replace 0; +EOB

    n_groups = br.read(3)
    if not 2 <= n_groups <= 6:
        raise ValueError(f"invalid group count {n_groups}")
    n_selectors = br.read(15)
    sel_mtf = [0, 1, 2, 3, 4, 5]
    selectors = []
    for _ in range(n_selectors):
        j = 0
        while br.read(1):
            j += 1
            if j >= n_groups:
                raise ValueError("selector MTF index out of range")
        selectors.append(sel_mtf[j])
        sel_mtf.insert(0, sel_mtf.pop(j))

    tables = []
    for _ in range(n_groups):
        lengths = []
        ln = br.read(5)
        for _ in range(n_sym):
            while br.read(1):
                ln += -1 if br.read(1) else 1
                if not 1 <= ln <= 20:
                    raise ValueError("bzip2 code length out of range")
            lengths.append(ln)
        tables.append(_Huff(lengths))

    # symbol stream → MTF/RLE2 decode into the BWT column
    mtf = list(present)
    bwt = bytearray()
    eob = n_sym - 1
    group_pos = 0
    group_count = 0
    run = 0
    run_bit = 0
    table = None
    while True:
        if group_count == 0:
            if group_pos >= len(selectors):
                raise ValueError("ran out of selector groups")
            table = tables[selectors[group_pos]]
            group_pos += 1
            group_count = 50
        group_count -= 1
        s = table.read(br)
        if s <= 1:  # RUNA / RUNB: zero-run in bijective base 2
            run += (s + 1) << run_bit
            run_bit += 1
            continue
        if run:
            bwt += bytes([mtf[0]]) * run
            run = 0
            run_bit = 0
        if s == eob:
            break
        j = s - 1  # MTF index (1-based after RUNA/RUNB)
        byte = mtf.pop(j)
        mtf.insert(0, byte)
        bwt.append(byte)
        if len(bwt) > block_max:
            raise ValueError("block exceeds declared maximum size")
    if run:
        bwt += bytes([mtf[0]]) * run
    if orig_ptr >= len(bwt):
        raise ValueError("BWT origin pointer out of range")

    # inverse BWT: counting sort gives, for each position in the last
    # column, its successor row — walk n steps from orig_ptr
    n = len(bwt)
    counts = [0] * 256
    for b in bwt:
        counts[b] += 1
    base = [0] * 256
    total = 0
    for v in range(256):
        base[v] = total
        total += counts[v]
    next_row = [0] * n
    seen = [0] * 256
    for i, b in enumerate(bwt):
        next_row[base[b] + seen[b]] = i
        seen[b] += 1
    row = next_row[orig_ptr]
    pre = bytearray()
    for _ in range(n):
        pre.append(bwt[row])
        row = next_row[row]

    # final RLE1 decode: 4 identical bytes are followed by a count
    out = bytearray()
    i = 0
    while i < len(pre):
        b = pre[i]
        run_len = 1
        while run_len < 4 and i + run_len < len(pre) and pre[i + run_len] == b:
            run_len += 1
        if run_len == 4:
            if i + 4 >= len(pre):
                raise ValueError("RLE1 run missing its count byte")
            out += bytes([b]) * (4 + pre[i + 4])
            i += 5
        else:
            out += bytes([b]) * run_len
            i += run_len
    if _bz_crc(bytes(out)) != crc_want:
        raise ValueError("bzip2 block CRC mismatch")
    return bytes(out)


def bz2_decompress(data: bytes) -> bytes:
    """Decompress a complete .bz2 stream (all blocks; block and
    combined stream CRCs verified)."""
    if len(data) < 10 or data[:3] != b"BZh":
        raise ValueError("not a bzip2 stream")
    level = data[3] - 0x30
    if not 1 <= level <= 9:
        raise ValueError("invalid bzip2 block-size level")
    block_max = level * 100_000
    br = _MsbBits(data)
    br.pos = 32
    out = bytearray()
    combined = 0
    while True:
        magic = br.read(48)
        if magic == 0x314159265359:
            block = _decode_block(br, block_max)
            crc = _bz_crc(block)
            combined = (((combined << 1) | (combined >> 31)) ^ crc) & (
                0xFFFFFFFF
            )
            out += block
        elif magic == 0x177245385090:  # sqrt(pi): stream footer
            want = br.read(32)
            if combined != want:
                raise ValueError("bzip2 combined CRC mismatch")
            return bytes(out)
        else:
            raise ValueError(f"bad bzip2 block magic 0x{magic:012X}")
