"""AVI (RIFF) video container with MJPEG frames, pure stdlib.

The reference ships no media pipeline (its roadmap stops at tabular
scans — /root/reference/README.md); this continues the repo's codec
surface. Round 8 made the video seam real with animated GIF; this
module adds the first REAL video *container*: the Microsoft AVI RIFF
format (public spec: the AVI RIFF file reference / OpenDML AVI file
format extensions), carrying an MJPEG stream — each frame an independent
baseline JPEG, decoded by this repo's own T.81 decoder
(operators/jpegcodec.py). MJPEG-in-AVI is a genuinely common shape
(webcams, DV transcodes, OpenCV's default writer), and demux + decode
+ frame-sample is exactly the pipeline a video column needs at scale.

Writer and parser are independent directions (struct.pack builder vs
a recursive RIFF tree walk), so a round trip validates the actual byte
format: LIST nesting, avih/strh/strf layouts, word-aligned '00dc'
chunks, and the idx1 index (offsets relative to the 'movi' fourcc,
the standard convention).
"""

from __future__ import annotations

import struct

AVIF_HASINDEX = 0x00000010
AVIIF_KEYFRAME = 0x00000010


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Build a standard AVI file around pre-encoded JPEG frames: one
    'vids'/'MJPG' stream, '00dc' chunks in the movi list, and an idx1
    keyframe index (every MJPEG frame is independent)."""
    if not frames:
        raise ValueError("no frames")
    max_len = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,       # dwMicroSecPerFrame
        max_len * fps,          # dwMaxBytesPerSec
        0,                      # dwPaddingGranularity
        AVIF_HASINDEX,          # dwFlags
        len(frames),            # dwTotalFrames
        0,                      # dwInitialFrames
        1,                      # dwStreams
        max_len,                # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,             # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4h",
        b"vids", b"MJPG",
        0, 0, 0, 0,             # flags, priority, language, initial
        1, fps,                 # dwScale, dwRate (fps = rate/scale)
        0, len(frames),         # dwStart, dwLength
        max_len,                # dwSuggestedBufferSize
        0xFFFFFFFF, 0,          # dwQuality (-1 = default), dwSampleSize
        0, 0, width, height,    # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks, idx_entries = [], []
    # idx1 offsets are relative to the position of the 'movi' fourcc;
    # the first chunk header sits 4 bytes in (right after the fourcc)
    off = 4
    for f in frames:
        ck = _chunk(b"00dc", f)
        movi_chunks.append(ck)
        idx_entries.append(
            struct.pack("<4sIII", b"00dc", AVIIF_KEYFRAME, off, len(f))
        )
        off += len(ck)
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for each chunk in
    data[pos:end]; chunks are word-aligned."""
    while pos + 8 <= end:
        fourcc, size = struct.unpack_from("<4sI", data, pos)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def parse_avi(content: bytes) -> dict:
    """Parse an AVI blob -> {width, height, fps, codec, n_frames,
    frames: list[bytes]}. Walks the RIFF tree (hdrl for the headers,
    movi for '00dc'/'00db' chunks, recursing into 'rec ' groups) and,
    when an idx1 index is present, cross-checks its entry count and
    per-entry sizes against the demuxed frames — a corrupt index is a
    loud error, not a silent truncation."""
    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    width = height = fps = None
    codec = None
    frames: list[bytes] = []
    idx_sizes: list[int] | None = None

    def walk_movi(pos: int, end: int):
        for fourcc, body, size in _walk_chunks(content, pos, end):
            if fourcc == b"LIST" and content[body : body + 4] == b"rec ":
                walk_movi(body + 4, body + size)
            elif fourcc[2:] in (b"dc", b"db"):
                frames.append(content[body : body + size])

    for fourcc, body, size in _walk_chunks(content, 12, len(content)):
        if fourcc == b"LIST":
            ltype = content[body : body + 4]
            if ltype == b"hdrl":
                for f2, b2, s2 in _walk_chunks(content, body + 4, body + size):
                    if f2 == b"avih":
                        a = struct.unpack_from("<14I", content, b2)
                        width, height = a[8], a[9]
                    elif f2 == b"LIST" and content[b2 : b2 + 4] == b"strl":
                        for f3, b3, s3 in _walk_chunks(
                            content, b2 + 4, b2 + s2
                        ):
                            if f3 == b"strh":
                                st = struct.unpack_from(
                                    "<4s4sIHHIIIII", content, b3
                                )
                                if st[0] == b"vids":
                                    codec = st[1].decode("ascii").strip()
                                    if st[6]:
                                        fps = st[7] // st[6]
            elif ltype == b"movi":
                walk_movi(body + 4, body + size)
        elif fourcc == b"idx1":
            idx_sizes = [
                struct.unpack_from("<4sIII", content, body + 16 * i)[3]
                for i in range(size // 16)
            ]
    if width is None or not frames:
        raise ValueError("missing avih header or movi frames")
    if idx_sizes is not None and idx_sizes != [len(f) for f in frames]:
        raise ValueError("idx1 index disagrees with demuxed frames")
    return {
        "width": width,
        "height": height,
        "fps": fps,
        "codec": codec,
        "n_frames": len(frames),
        "frames": frames,
    }
