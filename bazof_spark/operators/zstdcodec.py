"""Zstandard decoder, pure Python from RFC 8878.

ZSTD is the modern default for data at rest (parquet, ORC, Kafka,
checkpoint files); in this sandbox it is only reachable through
pyarrow's opaque C wrapper. This module implements the PUBLIC RFC
8878 decoding path from scratch — the independent direction against
the reference C implementation, the same pin discipline as
inflate-vs-zlib and LZ4/Snappy-vs-pyarrow:

* frame parsing (header descriptor, window descriptor, content size,
  skippable frames, the xxHash64-low-32 content checksum — xxh64
  implemented below from its public five-prime spec),
* raw / RLE / compressed blocks,
* the literals section in all four forms (raw, RLE, Huffman
  "Compressed" with a fresh tree, "Treeless" reusing the previous
  tree) with 1- and 4-stream Huffman payloads,
* Huffman tree descriptions both direct (4-bit weights) and
  FSE-compressed (two interleaved states), canonical table built
  from weights with the implied last weight,
* the sequences section: FSE table descriptions (variable-bit
  probability reads with the low-threshold trick and repeat-zero
  flags), predefined distributions for all three codes, RLE and
  Repeat modes, the interleaved LL/OF/ML state machine over a
  BACKWARD bitstream, and the three-slot repeat-offset history with
  its literals-length-zero shift,
* sequence execution with overlapping matches.

Every structural violation raises ValueError — corrupt frames must
fail loudly, not truncate.
"""

from __future__ import annotations

import struct

# --------------------------------------------------------------------------
# xxHash64 (public algorithm; frames carry its low 32 bits)
# --------------------------------------------------------------------------

_M64 = 0xFFFFFFFFFFFFFFFF
_P64_1 = 11400714785074694791
_P64_2 = 14029467366897019727
_P64_3 = 1609587929392839161
_P64_4 = 9650029242287828579
_P64_5 = 2870177450012600261


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round64(acc: int, lane: int) -> int:
    acc = (acc + lane * _P64_2) & _M64
    return (_rotl64(acc, 31) * _P64_1) & _M64


def _merge64(acc: int, val: int) -> int:
    acc ^= _round64(0, val)
    return (acc * _P64_1 + _P64_4) & _M64


def xxhash64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P64_1 + _P64_2) & _M64
        v2 = (seed + _P64_2) & _M64
        v3 = seed
        v4 = (seed - _P64_1) & _M64
        while pos + 32 <= n:
            lanes = struct.unpack_from("<4Q", data, pos)
            v1 = _round64(v1, lanes[0])
            v2 = _round64(v2, lanes[1])
            v3 = _round64(v3, lanes[2])
            v4 = _round64(v4, lanes[3])
            pos += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12)
            + _rotl64(v4, 18)
        ) & _M64
        h = _merge64(h, v1)
        h = _merge64(h, v2)
        h = _merge64(h, v3)
        h = _merge64(h, v4)
    else:
        h = (seed + _P64_5) & _M64
    h = (h + n) & _M64
    while pos + 8 <= n:
        (lane,) = struct.unpack_from("<Q", data, pos)
        h ^= _round64(0, lane)
        h = (_rotl64(h, 27) * _P64_1 + _P64_4) & _M64
        pos += 8
    if pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        h ^= (lane * _P64_1) & _M64
        h = (_rotl64(h, 23) * _P64_2 + _P64_3) & _M64
        pos += 4
    while pos < n:
        h ^= (data[pos] * _P64_5) & _M64
        h = (_rotl64(h, 11) * _P64_1) & _M64
        pos += 1
    h ^= h >> 33
    h = (h * _P64_2) & _M64
    h ^= h >> 29
    h = (h * _P64_3) & _M64
    h ^= h >> 32
    return h


# --------------------------------------------------------------------------
# bit readers
# --------------------------------------------------------------------------


class _ForwardBits:
    """LSB-first forward reader (FSE table descriptions)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bitpos = pos * 8

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.bitpos >> 3
            if byte >= len(self.data):
                raise ValueError("FSE header bitstream truncated")
            v |= ((self.data[byte] >> (self.bitpos & 7)) & 1) << i
            self.bitpos += 1
        return v

    def byte_pos(self) -> int:
        return (self.bitpos + 7) >> 3


class _BackwardBits:
    """zstd entropy payloads are written front-to-back but READ
    back-to-front: the last byte carries a 1-bit end marker above the
    final bits. Reading n bits yields them MSB-first (the order the
    encoder pushed them)."""

    def __init__(self, data: bytes):
        if not data:
            raise ValueError("empty entropy bitstream")
        last = data[-1]
        if last == 0:
            raise ValueError("entropy bitstream missing end marker")
        marker = last.bit_length() - 1  # position of the padding bit
        self.data = data
        # total readable bits
        self.avail = 8 * (len(data) - 1) + marker

    def read(self, n: int) -> int:
        """Read n bits (n may exceed what remains: Huffman peeks near
        the end implicitly pad with zeros). ``avail`` goes NEGATIVE on
        overread so that pushing surplus peek bits back restores the
        true position — clamping here once corrupted the last literal
        of every 4-stream Huffman segment."""
        v = 0
        for _ in range(n):
            v <<= 1
            self.avail -= 1
            if self.avail >= 0:
                v |= (self.data[self.avail >> 3] >> (self.avail & 7)) & 1
        return v


# --------------------------------------------------------------------------
# FSE
# --------------------------------------------------------------------------


def fse_read_distribution(
    data: bytes, pos: int, max_accuracy: int
) -> tuple[list[int], int, int]:
    """Parse an FSE table description → (normalized counts, accuracy
    log, bytes consumed). Counts may include -1 ("less than 1")."""
    br = _ForwardBits(data, pos)
    accuracy = br.read(4) + 5
    if accuracy > max_accuracy:
        raise ValueError(f"FSE accuracy {accuracy} > max {max_accuracy}")
    table_size = 1 << accuracy
    remaining = table_size + 1
    counts: list[int] = []
    prev_zero = False
    while remaining > 1:
        if prev_zero:
            # repeat-zero flags: 2-bit runs, value 3 continues
            while True:
                rep = br.read(2)
                counts.extend([0] * rep)
                if rep != 3:
                    break
            prev_zero = False
            continue
        nbits = remaining.bit_length()  # bits for values 0..remaining
        threshold = 1 << (nbits - 1)
        maxv = (threshold << 1) - 1 - remaining  # low values saving a bit
        val = br.read(nbits - 1)
        if val < maxv:
            count = val
        else:
            # one more bit decides the high range
            extra = br.read(1)
            full = val | (extra << (nbits - 1))
            count = full - maxv if full >= threshold else full
        count -= 1  # shift: stored 0 means probability -1
        remaining -= -count if count < 0 else count
        counts.append(count)
        prev_zero = count == 0
        if len(counts) > 256:
            raise ValueError("FSE distribution overran symbol space")
    if remaining != 1:
        raise ValueError("FSE distribution does not sum to table size")
    return counts, accuracy, br.byte_pos() - pos


class _FseTable:
    """Decoding table: per state (symbol, nb_bits, baseline)."""

    def __init__(self, counts: list[int], accuracy: int):
        size = 1 << accuracy
        self.accuracy = accuracy
        symbols = [0] * size
        high = size - 1
        # "less than 1" symbols: one cell each from the table's end
        for s, c in enumerate(counts):
            if c == -1:
                symbols[high] = s
                high -= 1
        step = (size >> 1) + (size >> 3) + 3
        mask = size - 1
        pos = 0
        for s, c in enumerate(counts):
            if c <= 0:
                continue
            for _ in range(c):
                symbols[pos] = s
                pos = (pos + step) & mask
                while pos > high:
                    pos = (pos + step) & mask
        if pos != 0:
            raise ValueError("FSE spread did not return to zero")
        next_state = [c if c > 0 else 1 for c in counts]
        # -1 symbols start at their count of 1; others at their count
        occ = list(next_state)
        self.symbol = symbols
        self.nb_bits = [0] * size
        self.baseline = [0] * size
        # cells for -1 symbols live at the end but their (x) counters
        # must follow the same formula; process cells in table order
        counters = {s: (1 if c == -1 else c) for s, c in enumerate(counts)}
        for i in range(size):
            s = symbols[i]
            x = counters[s]
            counters[s] = x + 1
            nb = accuracy - (x.bit_length() - 1)
            self.nb_bits[i] = nb
            self.baseline[i] = (x << nb) - size


class _FseState:
    def __init__(self, table: _FseTable, br: _BackwardBits):
        self.table = table
        self.state = br.read(table.accuracy)

    def peek(self) -> int:
        return self.table.symbol[self.state]

    def update(self, br: _BackwardBits) -> None:
        t = self.table
        self.state = t.baseline[self.state] + br.read(t.nb_bits[self.state])


def _fse_decode_interleaved(
    table: _FseTable, data: bytes, max_symbols: int = 255
) -> list[int]:
    """Two alternating FSE states over one backward stream — the
    Huffman-weights encoding. Stops when a state update would need
    more bits than remain; the other state then flushes its symbol."""
    br = _BackwardBits(data)
    s1 = _FseState(table, br)
    s2 = _FseState(table, br)
    out: list[int] = []
    while True:
        out.append(s1.peek())
        if br.avail < table.nb_bits[s1.state]:
            out.append(s2.peek())
            break
        s1.update(br)
        out.append(s2.peek())
        if br.avail < table.nb_bits[s2.state]:
            out.append(s1.peek())
            break
        s2.update(br)
        if len(out) > max_symbols:
            raise ValueError("FSE weight stream overran symbol space")
    return out


# --------------------------------------------------------------------------
# Huffman literals
# --------------------------------------------------------------------------


class _HuffTable:
    """2^max_bits direct lookup built from zstd weights."""

    def __init__(self, weights: list[int]):
        total = sum((1 << (w - 1)) for w in weights if w > 0)
        if total == 0:
            raise ValueError("empty Huffman weight set")
        max_bits = total.bit_length()  # smallest m with 2^m > total
        left = (1 << max_bits) - total  # the implied last symbol's share
        if left & (left - 1):
            raise ValueError("Huffman weights leave a non-power-of-2 gap")
        last_weight = left.bit_length()
        weights = weights + [last_weight]
        self.max_bits = max_bits
        nbits = [
            (max_bits + 1 - w) if w > 0 else 0 for w in weights
        ]
        size = 1 << max_bits
        self.symbol = [0] * size
        self.nb = [0] * size
        # rank layout: longest codes (smallest weights) occupy the
        # LOWEST table ranges; symbols in natural order within a rank
        rank_base: dict[int, int] = {}
        pos = 0
        for b in range(max_bits, 0, -1):
            rank_base[b] = pos
            pos += sum(1 << (max_bits - b) for nb in nbits if nb == b)
        for s, nb in enumerate(nbits):
            if nb == 0:
                continue
            run = 1 << (max_bits - nb)
            base = rank_base[nb]
            for i in range(run):
                self.symbol[base + i] = s
                self.nb[base + i] = nb
            rank_base[nb] = base + run

    def decode_stream(self, data: bytes, n_symbols: int) -> bytearray:
        br = _BackwardBits(data)
        out = bytearray()
        # peek max_bits (zero-padded past the end), consume entry bits
        state_bits = self.max_bits
        for _ in range(n_symbols):
            idx = br.read(state_bits)  # MSB-first peek-and-consume
            # read() consumed state_bits; but the entry may use fewer —
            # push back the surplus
            nb = self.nb[idx]
            if nb == 0:
                raise ValueError("invalid Huffman code in literals")
            surplus = state_bits - nb
            br.avail += surplus
            out.append(self.symbol[idx])
        return out


def _read_huffman_table(data: bytes, pos: int) -> tuple[_HuffTable, int]:
    """Parse a Huffman tree description → (table, bytes consumed)."""
    header = data[pos]
    pos += 1
    if header >= 128:
        n = header - 127
        raw = data[pos : pos + (n + 1) // 2]
        if len(raw) < (n + 1) // 2:
            raise ValueError("direct Huffman weights truncated")
        weights = []
        for i in range(n):
            b = raw[i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        return _HuffTable(weights), 1 + (n + 1) // 2
    # FSE-compressed weights
    comp = data[pos : pos + header]
    if len(comp) < header:
        raise ValueError("FSE Huffman weights truncated")
    counts, accuracy, consumed = fse_read_distribution(comp, 0, 6)
    table = _FseTable(counts, accuracy)
    weights = _fse_decode_interleaved(table, comp[consumed:])
    return _HuffTable(weights), 1 + header


# --------------------------------------------------------------------------
# sequences: code→value tables
# --------------------------------------------------------------------------


def _ll_value(code: int, br: _BackwardBits) -> int:
    if code < 16:
        return code
    if code > 35:
        raise ValueError(f"invalid literals-length code {code}")
    bits = [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14,
            15, 16][code - 16]
    base = [16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
            2048, 4096, 8192, 16384, 32768, 65536][code - 16]
    return base + br.read(bits)


def _ml_value(code: int, br: _BackwardBits) -> int:
    if code < 32:
        return code + 3
    if code > 52:
        raise ValueError(f"invalid match-length code {code}")
    bits = [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13,
            14, 15, 16][code - 32]
    base = [35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515,
            1027, 2051, 4099, 8195, 16387, 32771, 65539][code - 32]
    return base + br.read(bits)


# predefined distributions (RFC 8878 §3.1.1.3.2.2)
_LL_DEFAULT = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
     2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
     -1, -1, -1, -1],
    6,
)
_ML_DEFAULT = (
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     -1, -1, -1, -1, -1, -1, -1],
    6,
)
_OF_DEFAULT = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1],
    5,
)
_MAX_ACC = {"ll": 9, "of": 8, "ml": 9}
_N_CODES = {"ll": 36, "of": 32, "ml": 53}


def _seq_table(
    mode: int,
    which: str,
    data: bytes,
    pos: int,
    prev: _FseTable | None,
) -> tuple[_FseTable, int]:
    """Resolve one of the three sequence code tables per its 2-bit
    compression mode → (table, bytes consumed)."""
    if mode == 0:  # predefined
        counts, acc = {
            "ll": _LL_DEFAULT, "ml": _ML_DEFAULT, "of": _OF_DEFAULT
        }[which]
        return _FseTable(counts, acc), 0
    if mode == 1:  # RLE: one byte, a single symbol, zero-bit table
        sym = data[pos]
        if sym >= _N_CODES[which]:
            raise ValueError(f"RLE {which} symbol {sym} out of range")
        t = _FseTable.__new__(_FseTable)
        t.accuracy = 0
        t.symbol = [sym]
        t.nb_bits = [0]
        t.baseline = [0]
        return t, 1
    if mode == 2:  # FSE-described in stream
        counts, acc, consumed = fse_read_distribution(
            data, pos, _MAX_ACC[which]
        )
        if len(counts) > _N_CODES[which]:
            raise ValueError(f"{which} distribution has too many symbols")
        return _FseTable(counts, acc), consumed
    if prev is None:  # mode 3: repeat
        raise ValueError(f"repeat mode for {which} with no previous table")
    return prev, 0


# --------------------------------------------------------------------------
# block decoding
# --------------------------------------------------------------------------


class _FrameCtx:
    """State that persists across blocks within one frame."""

    def __init__(self):
        self.huff: _HuffTable | None = None
        self.tables: dict[str, _FseTable | None] = {
            "ll": None, "of": None, "ml": None
        }
        self.rep = [1, 4, 8]


def _decode_literals(
    block: bytes, ctx: _FrameCtx
) -> tuple[bytes, int]:
    """Literals section → (literals, bytes consumed)."""
    b0 = block[0]
    ltype = b0 & 0x3
    size_format = (b0 >> 2) & 0x3
    if ltype in (0, 1):  # Raw / RLE
        if size_format in (0, 2):
            reg = b0 >> 3
            hdr = 1
        elif size_format == 1:
            reg = (b0 >> 4) | (block[1] << 4)
            hdr = 2
        else:
            reg = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            hdr = 3
        if ltype == 0:
            lits = block[hdr : hdr + reg]
            if len(lits) != reg:
                raise ValueError("raw literals truncated")
            return bytes(lits), hdr + reg
        return bytes([block[hdr]]) * reg, hdr + 1
    # Compressed (2) / Treeless (3)
    if size_format == 0:
        streams, hdr = 1, 3
        reg = (b0 >> 4) | ((block[1] & 0x3F) << 4)
        comp = (block[1] >> 6) | (block[2] << 2)
    elif size_format == 1:
        streams, hdr = 4, 3
        reg = (b0 >> 4) | ((block[1] & 0x3F) << 4)
        comp = (block[1] >> 6) | (block[2] << 2)
    elif size_format == 2:
        streams, hdr = 4, 4
        reg = (b0 >> 4) | (block[1] << 4) | ((block[2] & 0x3) << 12)
        comp = (block[2] >> 2) | (block[3] << 6)
    else:
        streams, hdr = 4, 5
        reg = (b0 >> 4) | (block[1] << 4) | ((block[2] & 0x3F) << 12)
        comp = (block[2] >> 6) | (block[3] << 2) | (block[4] << 10)
    payload = block[hdr : hdr + comp]
    if len(payload) != comp:
        raise ValueError("compressed literals truncated")
    pos = 0
    if ltype == 2:
        ctx.huff, consumed = _read_huffman_table(payload, 0)
        pos = consumed
    elif ctx.huff is None:
        raise ValueError("treeless literals with no previous tree")
    huff = ctx.huff
    if streams == 1:
        lits = huff.decode_stream(payload[pos:], reg)
    else:
        s1, s2, s3 = struct.unpack_from("<3H", payload, pos)
        pos += 6
        body = payload[pos:]
        per = (reg + 3) // 4
        sizes = [s1, s2, s3, len(body) - s1 - s2 - s3]
        if sizes[3] <= 0:
            raise ValueError("4-stream jump table inconsistent")
        counts = [per, per, per, reg - 3 * per]
        lits = bytearray()
        off = 0
        for sz, cnt in zip(sizes, counts):
            lits += huff.decode_stream(body[off : off + sz], cnt)
            off += sz
    if len(lits) != reg:
        raise ValueError("literals regenerated size mismatch")
    return bytes(lits), hdr + comp


def _decode_block(block: bytes, ctx: _FrameCtx, out: bytearray) -> None:
    lits, pos = _decode_literals(block, ctx)
    # number of sequences
    if pos >= len(block):
        raise ValueError("sequences section missing")
    b0 = block[pos]
    if b0 < 128:
        n_seq = b0
        pos += 1
    elif b0 < 255:
        n_seq = ((b0 - 128) << 8) | block[pos + 1]
        pos += 2
    else:
        n_seq = block[pos + 1] | (block[pos + 2] << 8)
        n_seq += 0x7F00
        pos += 3
    if n_seq == 0:
        out += lits
        return
    modes = block[pos]
    pos += 1
    if modes & 0x3:
        raise ValueError("reserved sequence-mode bits set")
    ll_mode = (modes >> 6) & 0x3
    of_mode = (modes >> 4) & 0x3
    ml_mode = (modes >> 2) & 0x3
    ll_t, c = _seq_table(ll_mode, "ll", block, pos, ctx.tables["ll"])
    pos += c
    of_t, c = _seq_table(of_mode, "of", block, pos, ctx.tables["of"])
    pos += c
    ml_t, c = _seq_table(ml_mode, "ml", block, pos, ctx.tables["ml"])
    pos += c
    ctx.tables["ll"], ctx.tables["of"], ctx.tables["ml"] = ll_t, of_t, ml_t

    br = _BackwardBits(block[pos:])
    ll_s = _FseState(ll_t, br)
    of_s = _FseState(of_t, br)
    ml_s = _FseState(ml_t, br)
    lit_pos = 0
    for i in range(n_seq):
        of_code = of_s.peek()
        if of_code > 31:
            raise ValueError(f"invalid offset code {of_code}")
        offset_value = (1 << of_code) + br.read(of_code)
        ml = _ml_value(ml_s.peek(), br)
        ll = _ll_value(ll_s.peek(), br)
        # repeat-offset history
        rep = ctx.rep
        if offset_value > 3:
            offset = offset_value - 3
            ctx.rep = [offset, rep[0], rep[1]]
        else:
            idx = offset_value - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = rep[0]
            elif idx == 1:
                offset = rep[1]
                ctx.rep = [offset, rep[0], rep[2]]
            elif idx == 2:
                offset = rep[2]
                ctx.rep = [offset, rep[0], rep[1]]
            else:
                offset = rep[0] - 1
                if offset == 0:
                    offset = 1
                ctx.rep = [offset, rep[0], rep[1]]
        out += lits[lit_pos : lit_pos + ll]
        if lit_pos + ll > len(lits):
            raise ValueError("sequence literals overrun")
        lit_pos += ll
        if offset > len(out):
            raise ValueError("match offset beyond output start")
        start = len(out) - offset
        for j in range(ml):
            out.append(out[start + j])
        if i < n_seq - 1:
            ll_s.update(br)
            ml_s.update(br)
            of_s.update(br)
    out += lits[lit_pos:]


# --------------------------------------------------------------------------
# frames
# --------------------------------------------------------------------------

_MAGIC = 0xFD2FB528
_SKIP_LO = 0x184D2A50
_SKIP_HI = 0x184D2A5F


def zstd_decompress(data: bytes) -> bytes:
    """Decode a zstd stream (one or more frames, skippable frames
    skipped, content checksums verified when present)."""
    out_all = bytearray()
    pos = 0
    seen = False
    while pos + 4 <= len(data):
        (magic,) = struct.unpack_from("<I", data, pos)
        if _SKIP_LO <= magic <= _SKIP_HI:
            (size,) = struct.unpack_from("<I", data, pos + 4)
            pos += 8 + size
            continue
        if magic != _MAGIC:
            raise ValueError(f"bad zstd magic 0x{magic:08X}")
        seen = True
        pos += 4
        fhd = data[pos]
        pos += 1
        fcs_flag = fhd >> 6
        single_segment = bool(fhd & 0x20)
        if fhd & 0x18:
            raise ValueError("reserved frame-header bits set")
        checksum = bool(fhd & 0x04)
        dict_flag = fhd & 0x3
        if not single_segment:
            pos += 1  # window descriptor (bound, not needed to decode)
        pos += (0, 1, 2, 4)[dict_flag]
        if dict_flag:
            raise ValueError("dictionary frames unsupported")
        fcs = None
        if fcs_flag == 0:
            if single_segment:
                fcs = data[pos]
                pos += 1
        elif fcs_flag == 1:
            fcs = struct.unpack_from("<H", data, pos)[0] + 256
            pos += 2
        elif fcs_flag == 2:
            (fcs,) = struct.unpack_from("<I", data, pos)
            pos += 4
        else:
            (fcs,) = struct.unpack_from("<Q", data, pos)
            pos += 8
        ctx = _FrameCtx()
        out = bytearray()
        while True:
            if pos + 3 > len(data):
                raise ValueError("block header truncated")
            hdr = data[pos] | (data[pos + 1] << 8) | (data[pos + 2] << 16)
            pos += 3
            last = hdr & 1
            btype = (hdr >> 1) & 0x3
            bsize = hdr >> 3
            if btype == 0:  # raw
                out += data[pos : pos + bsize]
                pos += bsize
            elif btype == 1:  # RLE: bsize is the REGENERATED size
                out += bytes([data[pos]]) * bsize
                pos += 1
            elif btype == 2:
                block = data[pos : pos + bsize]
                if len(block) != bsize:
                    raise ValueError("compressed block truncated")
                _decode_block(block, ctx, out)
                pos += bsize
            else:
                raise ValueError("reserved block type")
            if last:
                break
        if checksum:
            (want,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if xxhash64(bytes(out)) & 0xFFFFFFFF != want:
                raise ValueError("content checksum mismatch")
        if fcs is not None and fcs != len(out):
            raise ValueError("frame content size mismatch")
        out_all += out
    if not seen:
        raise ValueError("no zstd frame found")
    return bytes(out_all)
