"""MP4 (ISO base media file format) video container, pure stdlib.

The reference ships no media pipeline (its roadmap stops at tabular
scans — /root/reference/README.md); this continues the repo's codec
surface. Round 9 already made the video-container seam real with
AVI/RIFF; this module adds the format that actually dominates training
corpora scraped from the web: MP4, per the public ISO/IEC 14496-12
base-media spec. The stream carried here is MJPEG in a ``jpeg``
VisualSampleEntry (the QuickTime-lineage convention ffmpeg uses for
mjpeg-in-mp4/mov), each sample an independent baseline JPEG decoded by
this repo's own T.81 decoder (operators/jpegcodec.py). Inter-frame
codecs (h264/hevc/av1) remain the declared library seam — the
CONTAINER math below is exactly what a production demuxer does before
handing compressed samples to any of them.

Writer and parser are independent directions (struct.pack box builder
vs a recursive box-tree walk), so a round trip validates the actual
byte format — in particular the sample-table reconstruction that makes
ISO BMFF nontrivial: expanding ``stsc`` first-chunk runs, walking
``stco`` chunk offsets with cumulative ``stsz`` sizes, and deriving
timing from ``mdhd``/``stts``. The parser cross-checks the tables
against each other (stts total vs stsz count, sample extents vs file
bounds) so a corrupt table is a loud error, not silent truncation.
"""

from __future__ import annotations

import struct

_MATRIX_IDENTITY = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(btype, struct.pack(">I", (version << 24) | flags) + body)


def encode_mp4_mjpeg(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 10,
    samples_per_chunk: int = 2,
) -> bytes:
    """Build a standard MP4 around pre-encoded JPEG samples.

    Layout: ``ftyp`` + ``mdat`` + ``moov`` (mdat-first, so the absolute
    ``stco`` chunk offsets are known without a second pass). Samples
    are grouped ``samples_per_chunk`` per chunk — deliberately >1 so
    the ``stsc`` run-length encoding and within-chunk offset arithmetic
    are genuinely exercised (a trailing short chunk gets its own run,
    exactly as the spec's first_chunk table expresses it).
    """
    if not frames:
        raise ValueError("no frames")
    if samples_per_chunk < 1:
        raise ValueError("samples_per_chunk must be >= 1")
    n = len(frames)
    timescale = fps * 100
    delta = 100  # per-sample duration in timescale units
    duration = n * delta

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)

    # chunking: absolute offsets of each chunk's first byte inside the
    # final file (ftyp + mdat header precede the payload)
    chunks: list[list[bytes]] = [
        frames[i : i + samples_per_chunk]
        for i in range(0, n, samples_per_chunk)
    ]
    base = len(ftyp) + 8  # mdat body starts after its size+type header
    offsets, pos = [], base
    for ch in chunks:
        offsets.append(pos)
        pos += sum(len(s) for s in ch)

    # stsc runs: (first_chunk, samples_per_chunk, sample_desc_index)
    runs = [(1, len(chunks[0]), 1)]
    for i, ch in enumerate(chunks[1:], start=2):
        if len(ch) != runs[-1][1]:
            runs.append((i, len(ch), 1))

    stsd_entry = (
        b"\x00" * 6
        + struct.pack(">H", 1)          # data_reference_index
        + struct.pack(">HH", 0, 0)      # pre_defined, reserved
        + b"\x00" * 12                  # pre_defined[3]
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)          # reserved
        + struct.pack(">H", 1)          # frame_count
        + b"\x00" * 32                  # compressorname
        + struct.pack(">Hh", 24, -1)    # depth, pre_defined
    )
    stsd = _full(
        b"stsd", 0, 0,
        struct.pack(">I", 1) + _box(b"jpeg", stsd_entry),
    )
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _full(
        b"stsc", 0, 0,
        struct.pack(">I", len(runs))
        + b"".join(struct.pack(">III", *r) for r in runs),
    )
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = _full(
        b"stco", 0, 0,
        struct.pack(">I", len(offsets))
        + b"".join(struct.pack(">I", o) for o in offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(
        b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")
    )
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)

    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)

    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIII", 0, 0, 1, 0)           # times, track_ID, rsvd
        + struct.pack(">I", duration)
        + b"\x00" * 8                               # reserved[2]
        + struct.pack(">HHHH", 0, 0, 0, 0)          # layer/alt/volume/rsvd
        + _MATRIX_IDENTITY
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)  # rate, volume, rsvd
        + b"\x00" * 8                                 # reserved[2]
        + _MATRIX_IDENTITY
        + b"\x00" * 24                                # pre_defined[6]
        + struct.pack(">I", 2),                       # next_track_ID
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk_boxes(data: bytes, pos: int, end: int):
    """Yield (type, body_start, body_end) for each box in
    data[pos:end]; handles 64-bit largesize and size-0 (to end)."""
    while pos + 8 <= end:
        size, btype = struct.unpack_from(">I4s", data, pos)
        body = pos + 8
        if size == 1:
            (size,) = struct.unpack_from(">Q", data, body)
            body += 8
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(
                f"box {btype!r} at {pos} overruns its container"
            )
        yield btype, body, pos + size
        pos += size


def _find(data: bytes, pos: int, end: int, btype: bytes):
    for t, b, e in _walk_boxes(data, pos, end):
        if t == btype:
            return b, e
    return None


def parse_mp4(content: bytes) -> dict:
    """Parse an MP4 blob -> {width, height, fps, codec, n_frames,
    frames: list[bytes]}.

    Walks the box tree to the first video track ('vide' handler) and
    reconstructs its samples from the four sample tables: ``stsc``
    first-chunk runs are expanded to a per-chunk sample count, each
    chunk's samples are sliced out of the file at ``stco`` offset plus
    the cumulative ``stsz`` sizes, and fps comes from ``mdhd``
    timescale over the (single-run) ``stts`` delta. Inconsistent
    tables — stts total != stsz count, runs that don't cover the
    chunk list, or sample extents outside the file — raise."""
    top = list(_walk_boxes(content, 0, len(content)))
    moov = next(((b, e) for t, b, e in top if t == b"moov"), None)
    if moov is None:
        raise ValueError("not an ISO-BMFF stream: no moov box")

    for t, b, e in _walk_boxes(content, moov[0], moov[1]):
        if t != b"trak":
            continue
        trak = _parse_trak(content, b, e)
        if trak is not None:
            return trak
    raise ValueError("no video track ('vide' handler) in moov")


def _parse_trak(content: bytes, b: int, e: int) -> dict | None:
    mdia = _find(content, b, e, b"mdia")
    if mdia is None:
        return None
    hdlr = _find(content, mdia[0], mdia[1], b"hdlr")
    if hdlr is None or content[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
        return None

    mdhd = _find(content, mdia[0], mdia[1], b"mdhd")
    if mdhd is None:
        raise ValueError("video trak missing mdhd")
    version = content[mdhd[0]]
    timescale = struct.unpack_from(
        ">I", content, mdhd[0] + (20 if version == 1 else 12)
    )[0]

    minf = _find(content, mdia[0], mdia[1], b"minf")
    stbl = minf and _find(content, minf[0], minf[1], b"stbl")
    if not stbl:
        raise ValueError("video trak missing minf/stbl")
    tables: dict[bytes, tuple[int, int]] = {
        t: (bb, ee) for t, bb, ee in _walk_boxes(content, stbl[0], stbl[1])
    }
    for need in (b"stsd", b"stts", b"stsc", b"stsz", b"stco"):
        if need not in tables:
            raise ValueError(f"stbl missing {need.decode()}")

    # stsd: first sample entry carries codec fourcc + coded dimensions
    sb, se = tables[b"stsd"]
    codec_b, entry_body, _ = next(_walk_boxes(content, sb + 8, se))
    width, height = struct.unpack_from(">HH", content, entry_body + 24)

    # stts: total sample count + fps from the first run's delta
    sb, _ = tables[b"stts"]
    (n_runs,) = struct.unpack_from(">I", content, sb + 4)
    stts_total, delta0 = 0, None
    for i in range(n_runs):
        cnt, delta = struct.unpack_from(">II", content, sb + 8 + 8 * i)
        stts_total += cnt
        if delta0 is None:
            delta0 = delta
    fps = timescale // delta0 if delta0 else None

    # stsz: constant sample size or per-sample table
    sb, _ = tables[b"stsz"]
    const_size, n_samples = struct.unpack_from(">II", content, sb + 4)
    if const_size:
        sizes = [const_size] * n_samples
    else:
        sizes = list(
            struct.unpack_from(f">{n_samples}I", content, sb + 12)
        )
    if stts_total != n_samples:
        raise ValueError(
            f"stts covers {stts_total} samples but stsz declares "
            f"{n_samples}"
        )

    # stco chunk offsets (co64 is the 64-bit variant)
    if b"co64" in tables:
        sb, _ = tables[b"co64"]
        (n_chunks,) = struct.unpack_from(">I", content, sb + 4)
        offsets = list(struct.unpack_from(f">{n_chunks}Q", content, sb + 8))
    else:
        sb, _ = tables[b"stco"]
        (n_chunks,) = struct.unpack_from(">I", content, sb + 4)
        offsets = list(struct.unpack_from(f">{n_chunks}I", content, sb + 8))

    # stsc runs -> per-chunk sample counts
    sb, _ = tables[b"stsc"]
    (n_runs,) = struct.unpack_from(">I", content, sb + 4)
    runs = [
        struct.unpack_from(">III", content, sb + 8 + 12 * i)
        for i in range(n_runs)
    ]
    per_chunk: list[int] = []
    for i, (first, spc, _sdi) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
        if first < 1 or last < first - 1:
            raise ValueError("stsc first_chunk runs are not increasing")
        per_chunk.extend([spc] * (last - first + 1))
    if len(per_chunk) != n_chunks or sum(per_chunk) != n_samples:
        raise ValueError(
            f"stsc expands to {sum(per_chunk)} samples over "
            f"{len(per_chunk)} chunks; stco/stsz declare "
            f"{n_chunks}/{n_samples}"
        )

    frames: list[bytes] = []
    si = 0
    for off, cnt in zip(offsets, per_chunk):
        pos = off
        for _ in range(cnt):
            size = sizes[si]
            if pos + size > len(content):
                raise ValueError(
                    f"sample {si} extent [{pos}, {pos + size}) exceeds "
                    f"file size {len(content)}"
                )
            frames.append(content[pos : pos + size])
            pos += size
            si += 1

    return {
        "width": width,
        "height": height,
        "fps": fps,
        "codec": codec_b.decode("ascii").strip(),
        "n_frames": n_samples,
        "frames": frames,
    }
