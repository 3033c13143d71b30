"""ZIP archive member extraction (APPNOTE.TXT public spec), stdlib.

Document corpora routinely arrive as archives — a binary column of
.zip blobs, each holding many text/HTML members — and the ingestion
step is: walk the central directory, pick members, inflate. The
reference has no such surface; this joins WARC (operators/warc.py) at
the repo's ingestion end.

Discipline mirrors the WAV codec: the ENCODER is the stdlib
``zipfile`` module (a known-good writer, so fixtures are real ZIPs),
while the PARSER is written here from the spec — EOCD scan from the
tail (comment-tolerant), central-directory walk, local-header offset
resolution with its own extra-field lengths, raw-deflate inflate via
zlib, and CRC-32 verification per member. A framing or inflate
mistake is a loud error, never silent truncation.

Scale shape: per-blob pure function → mapInPandas over the binary
column, zero exchanges (the media-codec seam).
"""

from __future__ import annotations

import io
import struct
import zipfile
import zlib

_EOCD_SIG = b"PK\x05\x06"
_CD_SIG = b"PK\x01\x02"
_LOCAL_SIG = b"PK\x03\x04"


def build_zip(members: list[tuple[str, bytes]], compress: bool = True) -> bytes:
    """Real ZIP via the stdlib writer (deflate or stored)."""
    buf = io.BytesIO()
    method = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w", method) as z:
        for name, data in members:
            z.writestr(name, data)
    return buf.getvalue()


def parse_zip(content: bytes) -> list[dict]:
    """Hand-parse a ZIP blob → [{name, size, method, data}] in central-
    directory order, verifying each member's CRC-32."""
    tail = content[-(65536 + 22) :]
    at = tail.rfind(_EOCD_SIG)
    if at == -1:
        raise ValueError("no ZIP end-of-central-directory record")
    eocd_at = len(content) - len(tail) + at
    (n_entries, cd_size, cd_off) = struct.unpack_from(
        "<HII", content, eocd_at + 10
    )
    out = []
    pos = cd_off
    for _ in range(n_entries):
        if content[pos : pos + 4] != _CD_SIG:
            raise ValueError("central directory entry signature mismatch")
        (
            _vmade, _vneed, _flags, method, _mt, _md, crc,
            csize, usize, nlen, elen, clen,
        ) = struct.unpack_from("<HHHHHHIIIHHH", content, pos + 4)
        lho = struct.unpack_from("<I", content, pos + 42)[0]
        name = content[pos + 46 : pos + 46 + nlen].decode("utf-8")
        pos += 46 + nlen + elen + clen
        # the LOCAL header's name/extra lengths govern the data offset
        if content[lho : lho + 4] != _LOCAL_SIG:
            raise ValueError(f"local header signature mismatch for {name!r}")
        lnlen, lelen = struct.unpack_from("<HH", content, lho + 26)
        data_at = lho + 30 + lnlen + lelen
        raw = content[data_at : data_at + csize]
        if len(raw) != csize:
            raise ValueError(f"member {name!r} truncated")
        if method == 0:
            data = raw
        elif method == 8:
            data = zlib.decompress(raw, wbits=-15)
        else:
            raise NotImplementedError(f"ZIP compression method {method}")
        if len(data) != usize:
            raise ValueError(f"member {name!r} inflated to wrong size")
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ValueError(f"member {name!r} CRC-32 mismatch")
        out.append(
            {"name": name, "size": usize, "method": method, "data": data}
        )
    return out
