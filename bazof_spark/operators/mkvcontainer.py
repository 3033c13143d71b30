"""Matroska (MKV) video container over EBML, pure stdlib.

The reference ships no media pipeline (its roadmap stops at tabular
scans — /root/reference/README.md); this completes the repo's video-
container triple (AVI/RIFF, MP4/ISO-BMFF, and now MKV/EBML — the
format WebM is a profile of), per the public Matroska spec (RFC 9559).
The stream carried here is MJPEG under Matroska's registered
``V_MJPEG`` codec ID, each block an independent baseline JPEG decoded
by this repo's own T.81 decoder (operators/jpegcodec.py); inter-frame
codecs (V_MPEG4/ISO/AVC, V_VP9, V_AV1) remain the declared library
seam — the EBML math below is what any demuxer does first.

Writer and parser are independent directions (a bottom-up element
builder vs a recursive EBML walk), so a round trip validates the
actual byte format: variable-length element IDs, the marker-bit
varint size encoding, nested master elements, SimpleBlock framing
(track-number varint + 16-bit relative timestamp + flags), and Xiph
block lacing (the parser handles laced blocks; the writer emits one
frame per SimpleBlock, the shape MJPEG streams actually use).
"""

from __future__ import annotations

import struct

# element IDs (stored with their marker bits, as they appear on disk)
EBML_HEADER = 0x1A45DFA3
SEGMENT = 0x18538067
INFO = 0x1549A966
TIMESTAMP_SCALE = 0x2AD7B1
MUXING_APP = 0x4D80
WRITING_APP = 0x5741
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
TRACK_NUMBER = 0xD7
TRACK_UID = 0x73C5
TRACK_TYPE = 0x83
CODEC_ID = 0x86
DEFAULT_DURATION = 0x23E383
VIDEO = 0xE0
PIXEL_WIDTH = 0xB0
PIXEL_HEIGHT = 0xBA
CLUSTER = 0x1F43B675
CLUSTER_TIMESTAMP = 0xE7
SIMPLE_BLOCK = 0xA3

_DOC_FIELDS = (
    (0x4286, 1),  # EBMLVersion
    (0x42F7, 1),  # EBMLReadVersion
    (0x42F2, 4),  # EBMLMaxIDLength
    (0x42F3, 8),  # EBMLMaxSizeLength
)


def _encode_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _encode_size(value: int) -> bytes:
    """EBML varint: the leading 1-bit in the first byte marks the
    total width; 7 usable bits per byte after the marker."""
    for width in range(1, 9):
        if value < (1 << (7 * width)) - 1:  # all-ones is reserved
            return (value | (1 << (7 * width))).to_bytes(width, "big")
    raise ValueError("size too large for EBML varint")


def _el(eid: int, body: bytes) -> bytes:
    return _encode_id(eid) + _encode_size(len(body)) + body


def _uint(eid: int, value: int) -> bytes:
    if value == 0:
        return _el(eid, b"\x00")
    return _el(eid, value.to_bytes((value.bit_length() + 7) // 8, "big"))


def encode_mkv_mjpeg(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 10,
    frames_per_cluster: int = 2,
) -> bytes:
    """Build a standard MKV around pre-encoded JPEG frames: one video
    track with CodecID ``V_MJPEG``, frames in SimpleBlocks grouped
    ``frames_per_cluster`` per Cluster (cluster-relative 16-bit block
    timestamps — the split that forces the parser to combine cluster
    and block time), 1 ms TimestampScale, and DefaultDuration carrying
    the frame rate."""
    if not frames:
        raise ValueError("no frames")
    header = _el(
        EBML_HEADER,
        b"".join(_uint(eid, v) for eid, v in _DOC_FIELDS)
        + _el(0x4282, b"matroska")  # DocType
        + _uint(0x4287, 4)          # DocTypeVersion
        + _uint(0x4285, 2),         # DocTypeReadVersion
    )
    info = _el(
        INFO,
        _uint(TIMESTAMP_SCALE, 1_000_000)  # 1 ms ticks
        + _el(MUXING_APP, b"bazof_spark")
        + _el(WRITING_APP, b"bazof_spark"),
    )
    tracks = _el(
        TRACKS,
        _el(
            TRACK_ENTRY,
            _uint(TRACK_NUMBER, 1)
            + _uint(TRACK_UID, 1)
            + _uint(TRACK_TYPE, 1)  # video
            + _el(CODEC_ID, b"V_MJPEG")
            + _uint(DEFAULT_DURATION, 1_000_000_000 // fps)
            + _el(
                VIDEO,
                _uint(PIXEL_WIDTH, width) + _uint(PIXEL_HEIGHT, height),
            ),
        ),
    )
    ms_per_frame = 1000 // fps
    clusters = b""
    for c0 in range(0, len(frames), frames_per_cluster):
        cluster_ts = c0 * ms_per_frame
        body = _uint(CLUSTER_TIMESTAMP, cluster_ts)
        for i, frame in enumerate(frames[c0 : c0 + frames_per_cluster]):
            rel = i * ms_per_frame  # cluster-relative, signed 16-bit
            blk = (
                b"\x81"                       # track 1 as a 1-byte varint
                + struct.pack(">h", rel)
                + b"\x80"                     # flags: keyframe, no lacing
                + frame
            )
            body += _el(SIMPLE_BLOCK, blk)
        clusters += _el(CLUSTER, body)
    return header + _el(SEGMENT, info + tracks + clusters)


def _read_varint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """Read an EBML varint at pos -> (value, next_pos). IDs keep their
    marker bit (that is how Matroska spells element IDs); sizes strip
    it. An all-ones size payload means 'unknown size'."""
    if pos >= len(data):
        raise ValueError("EBML varint past end of buffer")
    first = data[pos]
    if first == 0:
        raise ValueError(f"invalid EBML varint lead byte 0x00 at {pos}")
    width = 8 - first.bit_length() + 1
    if pos + width > len(data):
        raise ValueError(f"EBML varint at {pos} overruns the buffer")
    value = int.from_bytes(data[pos : pos + width], "big")
    if not keep_marker:
        marker = 1 << (7 * width)
        value &= marker - 1
        if value == marker - 1:
            value = -1  # unknown size
    return value, pos + width


def _walk(data: bytes, pos: int, end: int):
    """Yield (element_id, body_start, body_end) for each element in
    data[pos:end]; unknown-size elements extend to the container end."""
    while pos < end:
        eid, pos = _read_varint(data, pos, keep_marker=True)
        size, pos = _read_varint(data, pos, keep_marker=False)
        body_end = end if size < 0 else pos + size
        if body_end > end:
            raise ValueError(
                f"element 0x{eid:X} at {pos} overruns its container"
            )
        yield eid, pos, body_end
        pos = body_end


def _uint_at(data: bytes, b: int, e: int) -> int:
    return int.from_bytes(data[b:e], "big")


def _block_frames(data: bytes, b: int, e: int) -> list[bytes]:
    """Split a (Simple)Block body into frames: track varint, 16-bit
    relative timestamp, flags, then the payload — laced per flags
    bits 0x06 (00 none, 01 Xiph, 11 EBML, 10 fixed-size)."""
    track, pos = _read_varint(data, b, keep_marker=False)
    pos += 2  # relative timestamp
    flags = data[pos]
    pos += 1
    lacing = (flags >> 1) & 0x3
    if lacing == 0:
        return [data[pos:e]]
    n_laced = data[pos] + 1
    pos += 1
    sizes: list[int] = []
    if lacing == 2:  # fixed-size: equal split, no size table
        total = e - pos
        if total % n_laced:
            raise ValueError("fixed-size lacing payload not divisible")
        sizes = [total // n_laced] * n_laced
    elif lacing == 1:  # Xiph: 255-continued bytes for all but the last
        for _ in range(n_laced - 1):
            s = 0
            while data[pos] == 255:
                s += 255
                pos += 1
            s += data[pos]
            pos += 1
            sizes.append(s)
        sizes.append(e - pos - sum(sizes))
    else:  # EBML lacing: first size a varint, rest signed-delta varints
        s, pos = _read_varint(data, pos, keep_marker=False)
        sizes.append(s)
        for _ in range(n_laced - 2):
            raw, npos = _read_varint(data, pos, keep_marker=False)
            width = npos - pos
            pos = npos
            delta = raw - ((1 << (7 * width - 1)) - 1)  # signed bias
            s += delta
            sizes.append(s)
        sizes.append(e - pos - sum(sizes))
    if any(s < 0 for s in sizes) or pos + sum(sizes) > e:
        raise ValueError("laced frame sizes overrun the block")
    out = []
    for s in sizes:
        out.append(data[pos : pos + s])
        pos += s
    return out


def parse_mkv(content: bytes) -> dict:
    """Parse an MKV blob -> {width, height, fps, codec, n_frames,
    frames: list[bytes]}. Walks EBML header (DocType must be
    matroska/webm), then the Segment: Tracks for the first video
    track's CodecID/dimensions/DefaultDuration, Clusters for
    SimpleBlock frames (lacing handled). Non-video tracks' blocks are
    skipped by track number."""
    top = list(_walk(content, 0, len(content)))
    if not top or top[0][0] != EBML_HEADER:
        raise ValueError("not an EBML stream")
    doctype = b"matroska"
    for eid, b, e in _walk(content, top[0][1], top[0][2]):
        if eid == 0x4282:
            doctype = content[b:e]
    if doctype not in (b"matroska", b"webm"):
        raise ValueError(f"unsupported EBML DocType {doctype!r}")
    seg = next(((b, e) for eid, b, e in top if eid == SEGMENT), None)
    if seg is None:
        raise ValueError("no Segment element")

    width = height = fps = None
    codec = None
    video_track = None
    frames: list[bytes] = []
    for eid, b, e in _walk(content, seg[0], seg[1]):
        if eid == TRACKS:
            for tid, tb, te in _walk(content, b, e):
                if tid != TRACK_ENTRY or video_track is not None:
                    continue
                t_num, t_type, t_codec = None, None, None
                t_dur = t_w = t_h = None
                for fid, fb, fe in _walk(content, tb, te):
                    if fid == TRACK_NUMBER:
                        t_num = _uint_at(content, fb, fe)
                    elif fid == TRACK_TYPE:
                        t_type = _uint_at(content, fb, fe)
                    elif fid == CODEC_ID:
                        t_codec = content[fb:fe].decode("ascii")
                    elif fid == DEFAULT_DURATION:
                        t_dur = _uint_at(content, fb, fe)
                    elif fid == VIDEO:
                        for vid, vb, ve in _walk(content, fb, fe):
                            if vid == PIXEL_WIDTH:
                                t_w = _uint_at(content, vb, ve)
                            elif vid == PIXEL_HEIGHT:
                                t_h = _uint_at(content, vb, ve)
                if t_type == 1:
                    video_track, codec = t_num, t_codec
                    width, height = t_w, t_h
                    if t_dur:
                        fps = round(1_000_000_000 / t_dur)
        elif eid == CLUSTER:
            for cid, cb, ce in _walk(content, b, e):
                if cid != SIMPLE_BLOCK:
                    continue
                track, _ = _read_varint(content, cb, keep_marker=False)
                if video_track is not None and track != video_track:
                    continue
                frames.extend(_block_frames(content, cb, ce))
    if video_track is None:
        raise ValueError("no video track in Segment/Tracks")
    if not frames:
        raise ValueError("video track has no SimpleBlock frames")
    return {
        "width": width,
        "height": height,
        "fps": fps,
        "codec": codec,
        "n_frames": len(frames),
        "frames": frames,
    }
