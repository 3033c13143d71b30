"""Ogg container (RFC 3533) with the FLAC-in-Ogg mapping, pure stdlib.

Closes the last named entry of the repo's "mp3/flac/ogg" codec
residue (the reference ships no media pipeline): Ogg is xiph.org's
streaming container — pages with a 27-byte header, segment-table
lacing, and a CRC-32 over the whole page (polynomial 0x04C11DB7,
unreflected, zero init/xor — NOT zlib's crc32) — and FLAC-in-Ogg is
the published mapping (first packet ``0x7F "FLAC" maj min nheaders
"fLaC" STREAMINFO``, then one FLAC frame per audio packet, granule
position = last decoded sample number).

Writer and parser are independent directions (page builder vs page
walk + packet reassembly across continuation pages); the audio frames
themselves are decoded by operators/flaccodec.py, so a mistake in
lacing, CRC, continuation flags, or the mapping header is caught by
the frame CRCs, the stream MD5, or the workload oracle's exact stats.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_CRC_TABLE = []
for _b in range(256):
    _r = _b << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if _r & 0x80000000 \
            else (_r << 1) & 0xFFFFFFFF
    _CRC_TABLE.append(_r)


def _ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


def _page(
    packets: list[bytes],
    serial: int,
    seq: int,
    granule: int,
    header_type: int,
    open_ended: bool = False,
) -> bytes:
    """One Ogg page holding whole packets (no splitting here — the
    encoder keeps packets under the 255*255 page payload bound).
    ``open_ended`` marks the last packet as continuing on the next
    page (unused by this encoder, kept for the fixture tests)."""
    lacing = bytearray()
    body = bytearray()
    for i, p in enumerate(packets):
        q, r = divmod(len(p), 255)
        lacing += b"\xff" * q
        if not (open_ended and i == len(packets) - 1):
            lacing.append(r)
        elif r != 0:
            raise ValueError("open-ended packet must end on a 255 boundary")
        body += p
    if len(lacing) > 255:
        raise ValueError("too many segments for one page")
    head = struct.pack(
        "<4sBBqIIIB",
        b"OggS", 0, header_type, granule, serial, seq, 0, len(lacing),
    )
    page = bytearray(head + bytes(lacing) + bytes(body))
    crc = _ogg_crc(bytes(page))
    struct.pack_into("<I", page, 22, crc)
    return bytes(page)


def encode_ogg_flac(
    samples: np.ndarray,
    sample_rate: int = 8000,
    block_size: int = 64,
    force_lpc: bool = False,
    serial: int = 0x1234,
) -> bytes:
    """Wrap mono int16 PCM in an Ogg stream via the FLAC-in-Ogg
    mapping: BOS page with the 0x7F"FLAC" header packet, one audio
    packet (= one FLAC frame) per page, granule = last sample number,
    EOS flag on the final page."""
    from bazof_spark.operators.flaccodec import encode_flac_parts

    streaminfo, frames = encode_flac_parts(
        samples, sample_rate, block_size, force_lpc
    )
    first = (
        b"\x7fFLAC\x01\x00"
        + struct.pack(">H", 1)          # header packets incl. this one
        + b"fLaC"
        + bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:]
        + streaminfo
    )
    out = bytearray(_page([first], serial, 0, 0, 0x02))
    granule = 0
    for fi, frame in enumerate(frames):
        n_in_frame = min(block_size, len(samples) - fi * block_size)
        granule += n_in_frame
        flags = 0x04 if fi == len(frames) - 1 else 0x00
        out += _page([frame], serial, fi + 1, granule, flags)
    return bytes(out)


def parse_ogg_packets(content: bytes) -> list[tuple[int, bytes]]:
    """Walk Ogg pages -> [(serial, packet bytes)], verifying every page
    CRC and reassembling packets that continue across pages."""
    packets: list[tuple[int, bytes]] = []
    partial: dict[int, bytearray] = {}
    pos = 0
    while pos < len(content):
        if content[pos : pos + 4] != b"OggS":
            raise ValueError("bad Ogg capture pattern")
        if pos + 27 > len(content):
            raise ValueError("truncated Ogg page header")
        (_, version, htype, _granule, serial, _seq, crc, nseg) = (
            struct.unpack_from("<4sBBqIIIB", content, pos)
        )
        if version != 0:
            raise ValueError("unsupported Ogg version")
        lacing = content[pos + 27 : pos + 27 + nseg]
        if len(lacing) != nseg:
            raise ValueError("truncated lacing table")
        body_at = pos + 27 + nseg
        body_len = sum(lacing)
        page_end = body_at + body_len
        if page_end > len(content):
            raise ValueError("truncated Ogg page body")
        page = bytearray(content[pos:page_end])
        struct.pack_into("<I", page, 22, 0)
        if _ogg_crc(bytes(page)) != crc:
            raise ValueError("Ogg page CRC mismatch")
        cur = partial.pop(serial, bytearray())
        if not (htype & 0x01) and cur:
            raise ValueError("dangling continued packet")
        at = body_at
        for i, lace in enumerate(lacing):
            cur += content[at : at + lace]
            at += lace
            if lace < 255:
                packets.append((serial, bytes(cur)))
                cur = bytearray()
        if cur:
            partial[serial] = cur
        pos = page_end
    if partial:
        raise ValueError("stream ended mid-packet")
    return packets


def decode_ogg_flac(content: bytes) -> tuple[int, int, np.ndarray]:
    """Decode an Ogg-FLAC stream -> (sample_rate, 1, int16 samples),
    verifying page CRCs, frame CRCs, and the stream MD5."""
    from bazof_spark.operators.flaccodec import (
        decode_flac_frame,
        parse_streaminfo,
    )

    packets = parse_ogg_packets(content)
    if not packets:
        raise ValueError("no Ogg packets")
    serial0, head = packets[0]
    if head[:5] != b"\x7fFLAC":
        raise ValueError("not a FLAC-in-Ogg stream")
    (n_headers,) = struct.unpack_from(">H", head, 7)
    if head[9:13] != b"fLaC":
        raise ValueError("FLAC mapping header lacks native signature")
    if (head[13] & 0x7F) != 0:
        raise ValueError("first metadata block is not STREAMINFO")
    size = int.from_bytes(head[14:17], "big")
    streaminfo = head[17 : 17 + size]
    sample_rate, _, bits, total, md5_expect = parse_streaminfo(streaminfo)

    audio = [
        p for s, p in packets[1:] if s == serial0
    ][max(0, n_headers - 1) :]
    out = np.empty(total, dtype=np.int16)
    got = 0
    for pkt in audio:
        if got >= total:
            break
        frame = decode_flac_frame(pkt, bits)
        take = min(len(frame), total - got)
        out[got : got + take] = frame[:take]
        got += take
    if got < total:
        raise ValueError(f"Ogg-FLAC ended at {got}/{total} samples")
    if hashlib.md5(out.astype("<i2").tobytes()).digest() != md5_expect:
        raise ValueError("FLAC stream MD5 mismatch")
    return sample_rate, 1, out
