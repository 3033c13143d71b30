"""LZMA decoder (.lzma / FORMAT_ALONE), pure Python from the public
format.

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

CPython's ``lzma.FORMAT_ALONE`` writes exactly this container — the
tests pin the decoder against it across presets and data shapes.
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


def lzma_alone_decompress(data: bytes) -> bytes:
    """Decode a classic .lzma (FORMAT_ALONE) stream."""
    if len(data) < 13:
        raise ValueError("LZMA header truncated")
    props = data[0]
    if props >= 9 * 5 * 5:
        raise ValueError(f"invalid LZMA properties byte {props}")
    lc = props % 9
    lp = (props // 9) % 5
    pb = props // 45
    # dict size (bytes 1-4) informs window allocation only; we keep
    # the whole output so it is not needed for correctness
    (usize,) = struct.unpack_from("<Q", data, 5)
    unknown_size = usize == 0xFFFFFFFFFFFFFFFF

    rc = _RangeDecoder(data, 13)
    pos_mask = (1 << pb) - 1
    lit_pos_mask = (1 << lp) - 1

    is_match = [[1024] * 16 for _ in range(_KNUM_STATES)]
    is_rep = [1024] * _KNUM_STATES
    is_rep_g0 = [1024] * _KNUM_STATES
    is_rep_g1 = [1024] * _KNUM_STATES
    is_rep_g2 = [1024] * _KNUM_STATES
    is_rep0_long = [[1024] * 16 for _ in range(_KNUM_STATES)]
    pos_slot = [[1024] * 64 for _ in range(4)]
    spec_pos = [1024] * 115
    align_ = [1024] * 16
    literals = [[1024] * 0x300 for _ in range(1 << (lc + lp))]
    len_coder = _LenCoder()
    rep_len_coder = _LenCoder()

    out = bytearray()
    state = 0
    rep0 = rep1 = rep2 = rep3 = 0

    while True:
        if not unknown_size and len(out) >= usize:
            break
        pos_state = len(out) & pos_mask
        if not rc.decode_bit(is_match[state], pos_state):
            # literal
            prev = out[-1] if out else 0
            lit_state = (
                ((len(out) & lit_pos_mask) << lc) | (prev >> (8 - lc))
            )
            probs = literals[lit_state]
            if state >= 7:  # post-match: decode against the match byte
                match_byte = out[len(out) - rep0 - 1]
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
            state = (
                0 if state < 4 else state - 3 if state < 10 else state - 6
            )
            continue
        # match or rep
        if rc.decode_bit(is_rep, state):
            if not out:
                raise ValueError("rep match at stream start")
            if not rc.decode_bit(is_rep_g0, state):
                if not rc.decode_bit(is_rep0_long[state], pos_state):
                    # short rep: one byte at rep0
                    state = 9 if state < 7 else 11
                    out.append(out[len(out) - rep0 - 1])
                    continue
            else:
                if not rc.decode_bit(is_rep_g1, state):
                    dist = rep1
                else:
                    if not rc.decode_bit(is_rep_g2, state):
                        dist = rep2
                    else:
                        dist = rep3
                        rep3 = rep2
                    rep2 = rep1
                rep1 = rep0
                rep0 = dist
            length = rep_len_coder.decode(rc, pos_state) + 2
            state = 8 if state < 7 else 11
        else:
            rep3, rep2, rep1 = rep2, rep1, rep0
            length = len_coder.decode(rc, pos_state) + 2
            state = 7 if state < 7 else 10
            slot = rc.bittree(
                pos_slot[min(length - 2, 3)], 6
            )
            if slot < 4:
                rep0 = slot
            else:
                direct_bits = (slot >> 1) - 1
                rep0 = (2 | (slot & 1)) << direct_bits
                if slot < 14:
                    rep0 += rc.bittree_reverse(
                        spec_pos, rep0 - slot - 1, direct_bits
                    )
                else:
                    rep0 += rc.decode_direct(direct_bits - 4) << 4
                    rep0 += rc.bittree_reverse(align_, 0, 4)
            if rep0 == 0xFFFFFFFF:
                # end-of-stream marker
                if not rc.finished():
                    raise ValueError("data after LZMA end marker")
                if not unknown_size and len(out) != usize:
                    raise ValueError("LZMA declared size mismatch")
                return bytes(out)
        if rep0 >= len(out):
            raise ValueError("LZMA match distance beyond output start")
        start = len(out) - rep0 - 1
        for i in range(length):
            out.append(out[start + i])
    if unknown_size:
        raise ValueError("LZMA stream ended without end marker")
    return bytes(out)
