"""LZMA family decoders (.lzma, raw LZMA2, .xz), pure Python from
the public formats.

LZMA completes the repo's from-spec decompressor family: with this,
every compression module CPython ships (zlib/gzip, bz2, lzma) and
every pyarrow page codec (lz4, snappy, zstd, brotli excepted) has an
independent in-repo implementation cross-pinned against the C one.
LZMA is the only RANGE-CODED member — adaptive binary probabilities
(11-bit, 5-bit adaptation shift) over a 32-bit range coder — which is
exactly why it is worth having from spec: the entropy machinery is
disjoint from everything else in the family.

Implemented per the public LZMA specification (the reference
``lzma_spec`` shipped with the SDK, also RFC-ish documented in the
.xz file format docs): the classic 13-byte .lzma header (properties
byte encoding lc/lp/pb, 4-byte dictionary size, 8-byte uncompressed
size with the all-ones "unknown, use end marker" value), the 12-state
match/rep state machine, bit-tree literal coding with the
matched-byte context in post-match states, length coders with
choice/choice2 and per-position-state low/mid trees, position-slot
distance coding with reverse-bittree aligned bits, and the four-slot
rep-distance history.

On top of the LZMA1 core sit LZMA2 (the chunked layer with per-chunk
dict/state/property reset control — what modern encoders emit) and
the full .xz container (stream header/footer with CRC'd flags, padded
block headers, generated CRC-64, SHA-256/CRC-32 integrity checks, and
the index cross-checked against the decoded blocks). CPython's lzma
module writes all three containers — the tests pin each against it
across presets, parameter matrices, and check types.
"""

from __future__ import annotations

import struct

_KNUM_STATES = 12


class _RangeDecoder:
    def __init__(self, data: bytes, pos: int):
        if data[pos] != 0:
            raise ValueError("LZMA range coder must start with a 0 byte")
        self.data = data
        self.pos = pos + 5
        self.range_ = 0xFFFFFFFF
        self.code = int.from_bytes(data[pos + 1 : pos + 5], "big")

    def _normalize(self) -> None:
        if self.range_ < (1 << 24):
            if self.pos >= len(self.data):
                raise ValueError("LZMA stream truncated mid-symbol")
            self.range_ = (self.range_ << 8) & 0xFFFFFFFF
            self.code = ((self.code << 8) | self.data[self.pos]) & 0xFFFFFFFF
            self.pos += 1

    def decode_bit(self, probs: list[int], i: int) -> int:
        prob = probs[i]
        bound = (self.range_ >> 11) * prob
        if self.code < bound:
            probs[i] = prob + ((2048 - prob) >> 5)
            self.range_ = bound
            bit = 0
        else:
            probs[i] = prob - (prob >> 5)
            self.code -= bound
            self.range_ -= bound
            bit = 1
        self._normalize()
        return bit

    def decode_direct(self, n: int) -> int:
        v = 0
        for _ in range(n):
            self.range_ >>= 1
            self.code = (self.code - self.range_) & 0xFFFFFFFF
            t = 0 - (self.code >> 31)
            self.code = (self.code + (self.range_ & t)) & 0xFFFFFFFF
            self._normalize()
            v = (v << 1) + t + 1
        return v

    def bittree(self, probs: list[int], nbits: int) -> int:
        m = 1
        for _ in range(nbits):
            m = (m << 1) | self.decode_bit(probs, m)
        return m - (1 << nbits)

    def bittree_reverse(self, probs: list[int], offset: int, nbits: int) -> int:
        m = 1
        v = 0
        for i in range(nbits):
            b = self.decode_bit(probs, offset + m)
            m = (m << 1) | b
            v |= b << i
        return v

    def finished(self) -> bool:
        return self.code == 0


class _LenCoder:
    def __init__(self):
        self.choice = [1024, 1024]
        self.low = [[1024] * 8 for _ in range(16)]
        self.mid = [[1024] * 8 for _ in range(16)]
        self.high = [1024] * 256

    def decode(self, rc: _RangeDecoder, pos_state: int) -> int:
        if not rc.decode_bit(self.choice, 0):
            return rc.bittree(self.low[pos_state], 3)
        if not rc.decode_bit(self.choice, 1):
            return 8 + rc.bittree(self.mid[pos_state], 3)
        return 16 + rc.bittree(self.high, 8)


class Lzma1Decoder:
    """Reusable LZMA1 decoding core: probability model + state machine
    over a shared output window. ``lzma_alone_decompress`` drives it
    once; the LZMA2 layer drives it per chunk, persisting or resetting
    state/probabilities per the chunk control byte while the
    dictionary (the output history) lives across chunks."""

    def __init__(self, lc: int, lp: int, pb: int, out: bytearray):
        self.out = out
        self.set_props(lc, lp, pb)
        self.reset_state()

    def set_props(self, lc: int, lp: int, pb: int) -> None:
        self.lc, self.lp, self.pb = lc, lp, pb
        self.pos_mask = (1 << pb) - 1
        self.lit_pos_mask = (1 << lp) - 1
        self.reset_probs()

    def reset_probs(self) -> None:
        self.is_match = [[1024] * 16 for _ in range(_KNUM_STATES)]
        self.is_rep = [1024] * _KNUM_STATES
        self.is_rep_g0 = [1024] * _KNUM_STATES
        self.is_rep_g1 = [1024] * _KNUM_STATES
        self.is_rep_g2 = [1024] * _KNUM_STATES
        self.is_rep0_long = [[1024] * 16 for _ in range(_KNUM_STATES)]
        self.pos_slot = [[1024] * 64 for _ in range(4)]
        self.spec_pos = [1024] * 115
        self.align_ = [1024] * 16
        self.literals = [
            [1024] * 0x300 for _ in range(1 << (self.lc + self.lp))
        ]
        self.len_coder = _LenCoder()
        self.rep_len_coder = _LenCoder()

    def reset_state(self) -> None:
        self.state = 0
        self.rep0 = self.rep1 = self.rep2 = self.rep3 = 0

    def decode(
        self,
        rc: _RangeDecoder,
        limit: int | None,
        allow_end_marker: bool = True,
    ) -> bool:
        """Decode symbols until ``len(out)`` reaches ``limit`` (or the
        end marker, if allowed). Returns True if the end marker was
        consumed."""
        out = self.out
        while limit is None or len(out) < limit:
            pos_state = len(out) & self.pos_mask
            if not rc.decode_bit(self.is_match[self.state], pos_state):
                prev = out[-1] if out else 0
                lit_state = (
                    ((len(out) & self.lit_pos_mask) << self.lc)
                    | (prev >> (8 - self.lc))
                )
                probs = self.literals[lit_state]
                if self.state >= 7:
                    match_byte = out[len(out) - self.rep0 - 1]
                    sym = 1
                    while sym < 0x100:
                        match_bit = (match_byte >> 7) & 1
                        match_byte = (match_byte << 1) & 0xFF
                        bit = rc.decode_bit(
                            probs, ((1 + match_bit) << 8) + sym
                        )
                        sym = (sym << 1) | bit
                        if match_bit != bit:
                            while sym < 0x100:
                                sym = (sym << 1) | rc.decode_bit(probs, sym)
                            break
                else:
                    sym = 1
                    while sym < 0x100:
                        sym = (sym << 1) | rc.decode_bit(probs, sym)
                out.append(sym & 0xFF)
                s = self.state
                self.state = 0 if s < 4 else s - 3 if s < 10 else s - 6
                continue
            if rc.decode_bit(self.is_rep, self.state):
                if not out:
                    raise ValueError("rep match at stream start")
                if not rc.decode_bit(self.is_rep_g0, self.state):
                    if not rc.decode_bit(
                        self.is_rep0_long[self.state], pos_state
                    ):
                        self.state = 9 if self.state < 7 else 11
                        out.append(out[len(out) - self.rep0 - 1])
                        continue
                else:
                    if not rc.decode_bit(self.is_rep_g1, self.state):
                        dist = self.rep1
                    else:
                        if not rc.decode_bit(self.is_rep_g2, self.state):
                            dist = self.rep2
                        else:
                            dist = self.rep3
                            self.rep3 = self.rep2
                        self.rep2 = self.rep1
                    self.rep1 = self.rep0
                    self.rep0 = dist
                length = self.rep_len_coder.decode(rc, pos_state) + 2
                self.state = 8 if self.state < 7 else 11
            else:
                self.rep3, self.rep2, self.rep1 = (
                    self.rep2, self.rep1, self.rep0
                )
                length = self.len_coder.decode(rc, pos_state) + 2
                self.state = 7 if self.state < 7 else 10
                slot = rc.bittree(self.pos_slot[min(length - 2, 3)], 6)
                if slot < 4:
                    self.rep0 = slot
                else:
                    direct_bits = (slot >> 1) - 1
                    self.rep0 = (2 | (slot & 1)) << direct_bits
                    if slot < 14:
                        self.rep0 += rc.bittree_reverse(
                            self.spec_pos,
                            self.rep0 - slot - 1,
                            direct_bits,
                        )
                    else:
                        self.rep0 += rc.decode_direct(direct_bits - 4) << 4
                        self.rep0 += rc.bittree_reverse(self.align_, 0, 4)
                if self.rep0 == 0xFFFFFFFF:
                    if not allow_end_marker:
                        raise ValueError(
                            "end marker inside a sized LZMA2 chunk"
                        )
                    return True
            if self.rep0 >= len(out):
                raise ValueError("LZMA match distance beyond output start")
            start = len(out) - self.rep0 - 1
            for i in range(length):
                out.append(out[start + i])
        return False


def _split_props(props: int) -> tuple[int, int, int]:
    if props >= 9 * 5 * 5:
        raise ValueError(f"invalid LZMA properties byte {props}")
    return props % 9, (props // 9) % 5, props // 45


def lzma_alone_decompress(data: bytes) -> bytes:
    """Decode a classic .lzma (FORMAT_ALONE) stream."""
    if len(data) < 13:
        raise ValueError("LZMA header truncated")
    lc, lp, pb = _split_props(data[0])
    (usize,) = struct.unpack_from("<Q", data, 5)
    unknown_size = usize == 0xFFFFFFFFFFFFFFFF

    out = bytearray()
    dec = Lzma1Decoder(lc, lp, pb, out)
    rc = _RangeDecoder(data, 13)
    marker = dec.decode(rc, None if unknown_size else usize)
    if marker:
        if not rc.finished():
            raise ValueError("data after LZMA end marker")
        if not unknown_size and len(out) != usize:
            raise ValueError("LZMA declared size mismatch")
        return bytes(out)
    if unknown_size:
        raise ValueError("LZMA stream ended without end marker")
    return bytes(out)


def lzma2_decompress(data: bytes, pos: int = 0) -> tuple[bytes, int]:
    """Decode an LZMA2 chunk sequence → (output, end position). LZMA2
    wraps LZMA1 in chunks (≤2 MiB unpacked) whose control bytes say
    what persists: dictionary resets, state resets, property changes —
    uncompressed chunks interleave freely."""
    out = bytearray()
    dec: Lzma1Decoder | None = None
    need_dict_reset = True
    while True:
        if pos >= len(data):
            raise ValueError("LZMA2 stream missing end-of-sequence byte")
        control = data[pos]
        pos += 1
        if control == 0:
            return bytes(out), pos
        if control in (1, 2):  # uncompressed chunk
            if control == 1:
                # dict reset: output already emitted stays (xz resets
                # dictionaries at block boundaries anyway; a mid-stream
                # reset only promises no matches reach across it)
                need_dict_reset = False
            size = struct.unpack_from(">H", data, pos)[0] + 1
            pos += 2
            chunk = data[pos : pos + size]
            if len(chunk) != size:
                raise ValueError("LZMA2 uncompressed chunk truncated")
            out += chunk
            pos += size
            if dec is not None:
                dec.reset_state()  # uncompressed chunks reset state
            continue
        if control < 0x80:
            raise ValueError(f"invalid LZMA2 control byte {control:#x}")
        unpacked = (((control & 0x1F) << 16)
                    | struct.unpack_from(">H", data, pos)[0]) + 1
        pos += 2
        packed = struct.unpack_from(">H", data, pos)[0] + 1
        pos += 2
        reset = (control >> 5) & 0x3
        if reset >= 2:
            lc, lp, pb = _split_props(data[pos])
            pos += 1
        if reset == 3:
            need_dict_reset = False
        if need_dict_reset and reset != 3:
            raise ValueError("first LZMA2 chunk must reset the dictionary")
        if reset >= 2:
            if dec is None:
                dec = Lzma1Decoder(lc, lp, pb, out)
            else:
                dec.set_props(lc, lp, pb)
                dec.reset_state()
        elif reset == 1:
            if dec is None:
                raise ValueError("state reset before any properties")
            dec.reset_probs()
            dec.reset_state()
        elif dec is None:
            raise ValueError("LZMA2 chunk with no properties yet")
        chunk = data[pos : pos + packed]
        if len(chunk) != packed:
            raise ValueError("LZMA2 chunk truncated")
        rc = _RangeDecoder(chunk, 0)
        target = len(out) + unpacked
        dec.decode(rc, target, allow_end_marker=False)
        if len(out) != target:
            raise ValueError("LZMA2 chunk unpacked-size mismatch")
        pos += packed


# --------------------------------------------------------------------------
# .xz container (the format Wikipedia dumps ship in)
# --------------------------------------------------------------------------


def _crc64_table() -> list[int]:
    """CRC-64/XZ (reflected ECMA-182 polynomial), generated."""
    poly = 0xC96C5795D7870F42
    table = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        table.append(c)
    return table


_CRC64 = _crc64_table()


def crc64_xz(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFFFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC64[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFFFFFFFFFF


def _xz_varint(data: bytes, pos: int) -> tuple[int, int]:
    v, shift = 0, 0
    while True:
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7
        if shift > 63:
            raise ValueError("xz varint overflow")


_XZ_MAGIC = b"\xfd7zXZ\x00"
_CHECK_SIZES = {0x00: 0, 0x01: 4, 0x04: 8, 0x0A: 32}


def xz_decompress(data: bytes) -> bytes:
    """Decode a .xz stream: stream header/footer with CRC'd flags,
    LZMA2 blocks with padded headers, per-block integrity checks
    (none / CRC-32 / CRC-64 / SHA-256 — CRC tables generated above,
    SHA-256 via hashlib), and the index cross-checked against the
    actually-decoded block sizes."""
    import hashlib

    from bazof_spark.operators.inflate import crc32

    if data[:6] != _XZ_MAGIC:
        raise ValueError("not an xz stream")
    flags = data[6:8]
    if flags[0] != 0 or flags[1] not in _CHECK_SIZES:
        raise ValueError("unsupported xz stream flags")
    (want,) = struct.unpack_from("<I", data, 8)
    if crc32(flags) != want:
        raise ValueError("xz stream-header CRC mismatch")
    check_size = _CHECK_SIZES[flags[1]]
    pos = 12
    out = bytearray()
    records: list[tuple[int, int]] = []
    while True:
        first = data[pos]
        if first == 0:  # index indicator
            break
        header_start = pos
        header_size = (first + 1) * 4
        header = data[pos : pos + header_size]
        (want,) = struct.unpack_from("<I", header, header_size - 4)
        if crc32(header[:-4]) != want:
            raise ValueError("xz block-header CRC mismatch")
        bflags = header[1]
        n_filters = (bflags & 0x3) + 1
        hpos = 2
        comp_size = unc_size = None
        if bflags & 0x40:
            comp_size, hpos = _xz_varint(header, hpos)
        if bflags & 0x80:
            unc_size, hpos = _xz_varint(header, hpos)
        for _ in range(n_filters):
            fid, hpos = _xz_varint(header, hpos)
            psize, hpos = _xz_varint(header, hpos)
            if fid != 0x21:
                raise ValueError(
                    f"xz filter 0x{fid:x} unsupported (LZMA2 only)"
                )
            if psize != 1 or header[hpos] > 40:
                raise ValueError("bad LZMA2 dict-size property")
            hpos += psize
        if any(header[hpos : header_size - 4]):
            raise ValueError("xz block-header padding not zero")
        pos += header_size
        block, end = lzma2_decompress(data, pos)
        if comp_size is not None and end - pos != comp_size:
            raise ValueError("xz compressed-size mismatch")
        if unc_size is not None and len(block) != unc_size:
            raise ValueError("xz uncompressed-size mismatch")
        unpadded = header_size + (end - pos) + check_size
        pos = end
        while pos & 3:  # block padding
            if data[pos]:
                raise ValueError("xz block padding not zero")
            pos += 1
        check = data[pos : pos + check_size]
        pos += check_size
        if flags[1] == 0x01:
            if crc32(block) != int.from_bytes(check, "little"):
                raise ValueError("xz block CRC-32 mismatch")
        elif flags[1] == 0x04:
            if crc64_xz(block) != int.from_bytes(check, "little"):
                raise ValueError("xz block CRC-64 mismatch")
        elif flags[1] == 0x0A:
            if hashlib.sha256(block).digest() != check:
                raise ValueError("xz block SHA-256 mismatch")
        out += block
        records.append((unpadded, len(block)))
    # index
    index_start = pos
    pos += 1
    count, pos = _xz_varint(data, pos)
    if count != len(records):
        raise ValueError("xz index record count mismatch")
    for unpadded, unc in records:
        u1, pos = _xz_varint(data, pos)
        u2, pos = _xz_varint(data, pos)
        if (u1, u2) != (unpadded, unc):
            raise ValueError("xz index record disagrees with block")
    while pos & 3:
        if data[pos]:
            raise ValueError("xz index padding not zero")
        pos += 1
    (want,) = struct.unpack_from("<I", data, pos)
    if crc32(data[index_start:pos]) != want:
        raise ValueError("xz index CRC mismatch")
    pos += 4
    # footer: crc32(backward_size + flags), backward size, flags, YZ
    (want,) = struct.unpack_from("<I", data, pos)
    if crc32(data[pos + 4 : pos + 10]) != want:
        raise ValueError("xz stream-footer CRC mismatch")
    (backward,) = struct.unpack_from("<I", data, pos + 4)
    if (backward + 1) * 4 != pos - index_start:  # index incl. its CRC
        raise ValueError("xz backward size mismatch")
    if data[pos + 8 : pos + 10] != flags:
        raise ValueError("xz footer flags disagree with header")
    if data[pos + 10 : pos + 12] != b"YZ":
        raise ValueError("xz footer magic missing")
    return bytes(out)
