"""FLAC audio codec (xiph.org public spec), pure stdlib/numpy.

Continues the repo's codec surface (jpegcodec, gifcodec, adpcmcodec —
the reference ships no media pipeline at all): FLAC is the named
lossless codec in the "mp3/flac/ogg remain stubs" residue, and the
one fully implementable from the public specification with integer
math alone.

Scope — a genuine interoperable subset:
- Encoder: mono, 16-bit, fixed-blocksize streams; per-frame best-of
  FIXED predictor orders 0–2 (or an LPC subframe when forced, to
  exercise that decode path) with Rice-coded residuals, partition
  order 0 or 1; STREAMINFO with the true MD5 of the unencoded
  samples; correct CRC-8 (poly 0x07) frame-header and CRC-16
  (poly 0x8005) frame checksums. Any conformant FLAC decoder plays
  these files.
- Decoder: CONSTANT, VERBATIM, FIXED orders 0–4 and LPC subframes,
  all Rice partition orders, both 4- and 5-bit Rice parameter widths
  with escape codes, UTF-8 coded frame numbers, wasted-bits shifts,
  and CRC verification (corruption is a loud error).

Encoder and decoder are independent directions (BitWriter builder vs
BitReader walk); FLAC is lossless, so the workload oracle recomputes
stats straight from the synthesis formula — any framing, Rice, CRC,
or predictor mistake changes the hash.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


class BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        out = 0
        while bits:
            if self.byte >= len(self.data):
                raise ValueError("FLAC bitstream exhausted")
            avail = 8 - self.bit
            take = min(bits, avail)
            cur = self.data[self.byte]
            out = (out << take) | (
                (cur >> (avail - take)) & ((1 << take) - 1)
            )
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            bits -= take
        return out

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


def _utf8_coded_number(n: int) -> bytes:
    """FLAC's UTF-8-style frame/sample number coding."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 5 * nbytes + (7 - nbytes):
        nbytes += 1
    prefix = (0xFF << (8 - nbytes - 1)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(prefix | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_coded(br: BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad UTF-8 coded number")
    val = first & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation")
        val = (val << 6) | (b & 0x3F)
    return val


_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _zigzag(r: np.ndarray) -> np.ndarray:
    return np.where(r >= 0, 2 * r, -2 * r - 1)


def _rice_cost(z: np.ndarray, param: int) -> int:
    return int((z >> param).sum()) + len(z) * (1 + param)


def _best_rice_param(z: np.ndarray) -> int:
    best_p, best_c = 0, _rice_cost(z, 0)
    for p in range(1, 15):
        c = _rice_cost(z, p)
        if c < best_c:
            best_p, best_c = p, c
    return best_p


def _write_rice_block(bw: BitWriter, z: np.ndarray, param: int) -> None:
    for v in z:
        v = int(v)
        bw.write_unary(v >> param)
        bw.write(v & ((1 << param) - 1), param)


def _write_residual(bw: BitWriter, resid: np.ndarray, block: int, order: int):
    """Rice coding method 0 (4-bit params); partition order 1 when the
    block splits evenly (exercises partitioned decode), else 0."""
    z = _zigzag(resid.astype(np.int64))
    po = 1 if block % 2 == 0 and block // 2 > order else 0
    bw.write(0, 2)       # coding method: 4-bit rice
    bw.write(po, 4)
    n_part = 1 << po
    start = 0
    for p in range(n_part):
        size = block // n_part - (order if p == 0 else 0)
        part = z[start : start + size]
        start += size
        param = _best_rice_param(part) if len(part) else 0
        if param >= 15:
            param = 14
        bw.write(param, 4)
        _write_rice_block(bw, part, param)


def encode_flac_parts(
    samples: np.ndarray,
    sample_rate: int = 8000,
    block_size: int = 64,
    force_lpc: bool = False,
) -> tuple[bytes, list[bytes]]:
    """(34-byte STREAMINFO body, [frame bytes]) — the parts both the
    native container (encode_flac) and the Ogg mapping
    (oggcodec.encode_ogg_flac) assemble."""
    xs = np.asarray(samples, dtype=np.int64)
    n = len(xs)
    if n == 0:
        raise ValueError("empty sample array")
    md5 = hashlib.md5(xs.astype("<i2").tobytes()).digest()
    si = BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(0, 3)    # channels - 1
    si.write(15, 5)   # bits per sample - 1
    si.write(n, 36)
    streaminfo = si.bytes() + md5
    frames = [
        _encode_frame(xs[pos : pos + block_size], fi, sample_rate,
                      block_size, force_lpc)
        for fi, pos in enumerate(range(0, n, block_size))
    ]
    return streaminfo, frames


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 8000,
    block_size: int = 64,
    force_lpc: bool = False,
) -> bytes:
    """Encode mono int16 PCM to a conformant FLAC stream. Each frame
    picks the cheapest FIXED order 0–2 (CONSTANT when the block is);
    ``force_lpc`` instead emits genuine LPC subframes (order 2,
    precision 12, shift 9, coefficients quantized from the fixed
    order-2 predictor) to exercise that decoder path."""
    streaminfo, frames = encode_flac_parts(
        samples, sample_rate, block_size, force_lpc
    )
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo
    for f in frames:
        out += f
    return bytes(out)


def _encode_frame(
    chunk: np.ndarray, fi: int, sample_rate: int, block_size: int,
    force_lpc: bool,
) -> bytes:
    block = len(chunk)
    hdr = BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 1)   # reserved
    hdr.write(0, 1)   # fixed block size stream
    # block size: exact code when it matches a table entry is optional —
    # 0b0111 = 16-bit value at end of header is always valid
    hdr.write(0b0111, 4)
    hdr.write(0b1101, 4)  # sample rate: 16-bit Hz at end of header
    hdr.write(0, 4)   # channel assignment: mono
    hdr.write(0b100, 3)  # 16 bits per sample
    hdr.write(0, 1)   # reserved
    head = hdr.bytes() + _utf8_coded_number(fi)
    head += struct.pack(">H", block - 1)   # 16-bit block size - 1
    head += struct.pack(">H", sample_rate)  # 16-bit rate in Hz
    head += bytes([_crc8(head)])

    body = BitWriter()
    if np.all(chunk == chunk[0]):
        body.write(0, 1)
        body.write(0b000000, 6)  # CONSTANT
        body.write(0, 1)
        body.write(int(chunk[0]) & 0xFFFF, 16)
    elif force_lpc and block > 2:
        # LPC order 2: quantized coefficients approximating the fixed
        # order-2 predictor (2, -1) at shift 9 / precision 12
        order, shift = 2, 9
        coefs = [2 << shift, -(1 << shift)]
        body.write(0, 1)
        body.write(0b100000 | (order - 1), 6)
        body.write(0, 1)
        for w in chunk[:order]:
            body.write(int(w) & 0xFFFF, 16)
        body.write(12 - 1, 4)  # precision - 1
        body.write(shift, 5)
        for c in coefs:
            body.write(c & 0xFFF, 12)
        pred = (
            coefs[0] * chunk[1 : block - 1] + coefs[1] * chunk[: block - 2]
        ) >> shift
        resid = chunk[2:] - pred
        _write_residual(body, resid, block, order)
    else:
        # best FIXED order 0..2 by residual magnitude
        cands = []
        for order in range(0, 3):
            if order >= block:
                break
            coefs = _FIXED_COEFFS[order]
            resid = chunk[order:].copy()
            for k, c in enumerate(coefs):
                resid = resid - c * chunk[order - 1 - k : block - 1 - k]
            cands.append((int(np.abs(resid).sum()), order, resid))
        _, order, resid = min(cands, key=lambda t: (t[0], t[1]))
        body.write(0, 1)
        body.write(0b001000 | order, 6)  # FIXED
        body.write(0, 1)
        for w in chunk[:order]:
            body.write(int(w) & 0xFFFF, 16)
        _write_residual(body, resid, block, order)
    body.align()
    frame = head + body.bytes()
    return frame + struct.pack(">H", _crc16(frame))


_BLOCK_SIZE_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}
_SAMPLE_RATE_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def parse_streaminfo(body: bytes):
    """STREAMINFO body -> (sample_rate, channels, bits, total samples,
    md5). Rejects shapes this decoder does not handle."""
    br = BitReader(body)
    br.read(16)
    br.read(16)
    br.read(24)
    br.read(24)
    sample_rate = br.read(20)
    n_channels = br.read(3) + 1
    bits = br.read(5) + 1
    total = br.read(36)
    if n_channels != 1 or bits != 16:
        raise NotImplementedError("decoder handles mono 16-bit streams")
    return sample_rate, n_channels, bits, total, body[18:34]


def decode_flac_frame(packet: bytes, stream_bits: int = 16) -> np.ndarray:
    """Decode ONE standalone FLAC frame (an Ogg-FLAC audio packet) to
    its samples, verifying both CRCs."""
    samples, end = _decode_frame(packet, 0, stream_bits)
    if end != len(packet):
        raise ValueError("trailing bytes after FLAC frame in packet")
    return samples


def decode_flac(content: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a mono FLAC stream -> (sample_rate, 1, int16 samples).
    Walks metadata blocks, then frames until the STREAMINFO total is
    reached; verifies both CRCs and the stream MD5."""
    if content[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(content):
            raise ValueError("truncated metadata")
        last = content[pos] & 0x80
        btype = content[pos] & 0x7F
        size = int.from_bytes(content[pos + 1 : pos + 4], "big")
        if btype == 0:
            streaminfo = content[pos + 4 : pos + 4 + size]
        pos += 4 + size
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("missing STREAMINFO")
    sample_rate, n_channels, bits, total, md5_expect = parse_streaminfo(
        streaminfo
    )

    out = np.empty(total, dtype=np.int16)
    got = 0
    while got < total:
        frame, pos = _decode_frame(content, pos, bits)
        take = min(len(frame), total - got)
        out[got : got + take] = frame[:take]
        got += take
    if hashlib.md5(out.astype("<i2").tobytes()).digest() != md5_expect:
        raise ValueError("FLAC stream MD5 mismatch")
    return sample_rate, 1, out


def _decode_frame(content: bytes, pos: int, stream_bits: int):
    start = pos
    br = BitReader(content, pos)
    sync = br.read(14)
    if sync != 0b11111111111110:
        raise ValueError("bad frame sync")
    br.read(1)
    br.read(1)  # blocking strategy
    bs_code = br.read(4)
    sr_code = br.read(4)
    chan = br.read(4)
    ss_code = br.read(3)
    br.read(1)
    if chan != 0:
        raise NotImplementedError("mono frames only")
    _read_utf8_coded(br)
    if bs_code == 0:
        raise ValueError("reserved block size code")
    elif bs_code == 6:
        block = br.read(8) + 1
    elif bs_code == 7:
        block = br.read(16) + 1
    else:
        block = _BLOCK_SIZE_TABLE[bs_code]
    if sr_code == 12:
        br.read(8)
    elif sr_code == 13 or sr_code == 14:
        br.read(16)
    bits = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}.get(ss_code, stream_bits)
    # CRC-8 covers the header bytes up to (not incl.) the CRC byte
    hdr_end = br.byte
    if br.bit:
        raise ValueError("frame header not byte-aligned")
    if _crc8(content[start:hdr_end]) != content[hdr_end]:
        raise ValueError("frame header CRC-8 mismatch")
    br.read(8)  # consume the CRC byte

    samples = _decode_subframe(br, block, bits)
    br.align()
    frame_end = br.byte
    (crc_expect,) = struct.unpack_from(">H", content, frame_end)
    if _crc16(content[start:frame_end]) != crc_expect:
        raise ValueError("frame CRC-16 mismatch")
    return samples, frame_end + 2


def _decode_subframe(br: BitReader, block: int, bits: int) -> np.ndarray:
    if br.read(1) != 0:
        raise ValueError("subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
        bits -= wasted

    def sread() -> int:
        v = br.read(bits)
        if v >= 1 << (bits - 1):
            v -= 1 << bits
        return v

    if stype == 0b000000:  # CONSTANT
        vals = np.full(block, sread(), dtype=np.int64)
    elif stype == 0b000001:  # VERBATIM
        vals = np.array([sread() for _ in range(block)], dtype=np.int64)
    elif 0b001000 <= stype <= 0b001100:  # FIXED 0..4
        order = stype & 0x07
        warm = [sread() for _ in range(order)]
        resid = _read_residual(br, block, order)
        vals = np.empty(block, dtype=np.int64)
        vals[:order] = warm
        coefs = _FIXED_COEFFS[order]
        for i in range(order, block):
            pred = sum(c * vals[i - 1 - k] for k, c in enumerate(coefs))
            vals[i] = pred + resid[i - order]
    elif stype & 0b100000:  # LPC
        order = (stype & 0x1F) + 1
        warm = [sread() for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision escape")
        shift = br.read(5)
        coefs = []
        for _ in range(order):
            c = br.read(precision)
            if c >= 1 << (precision - 1):
                c -= 1 << precision
            coefs.append(c)
        resid = _read_residual(br, block, order)
        vals = np.empty(block, dtype=np.int64)
        vals[:order] = warm
        for i in range(order, block):
            pred = (
                sum(c * int(vals[i - 1 - k]) for k, c in enumerate(coefs))
                >> shift
            )
            vals[i] = pred + resid[i - order]
    else:
        raise ValueError(f"reserved subframe type {stype:06b}")
    return vals << wasted


def _read_residual(br: BitReader, block: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    n_part = 1 << po
    if block % n_part:
        raise ValueError("partition does not divide block size")
    out = np.empty(block - order, dtype=np.int64)
    at = 0
    for p in range(n_part):
        size = block // n_part - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for i in range(size):
                v = br.read(raw) if raw else 0
                if raw and v >= 1 << (raw - 1):
                    v -= 1 << raw
                out[at + i] = v
        else:
            for i in range(size):
                q = br.read_unary()
                r = br.read(param)
                z = (q << param) | r
                out[at + i] = (z >> 1) if z % 2 == 0 else -((z + 1) >> 1)
        at += size
    return out
