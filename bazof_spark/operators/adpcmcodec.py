"""IMA ADPCM audio codec (WAVE format tag 0x0011), pure stdlib/numpy.

The reference ships no media pipeline at all (its roadmap stops at
tabular scans — /root/reference/README.md); this module continues the
repo's LLM-data-pipeline codec surface (jpegcodec.py, gifcodec.py):
the first COMPRESSED audio codec decoded for real in-sandbox, closing
part of the "mp3/flac/ogg remain stubs" residue. IMA ADPCM is the
public-domain adaptive differential PCM scheme standardized by the
Interactive Multimedia Association (also RFC 3551's DVI4 payload and
Microsoft's WAVE_FORMAT_IMA_ADPCM); every desktop decoder ships it.

Format recap (mono, the shape this repo's fixtures use):
- 4-bit nibbles, one per sample after the first; each block starts
  with a 4-byte header: predictor int16-LE (which IS output sample 0
  of the block), step index u8, reserved u8.
- samples_per_block = (block_align - 4) * 2 + 1; nibbles are packed
  LOW nibble first within each byte.
- The `fmt ` chunk carries wFormatTag=0x11 and a 2-byte extension
  (wSamplesPerBlock); a `fact` chunk records the true sample count so
  the final block's padding nibbles can be trimmed.

Encoder and decoder are independent directions of the same published
state machine (step-size table of 89 entries + index-adjust table);
the workload oracle (`multimodal_adpcm_decode`) re-runs that state
machine a THIRD time in pure SQL (a DuckDB recursive CTE), so a
mismatch anywhere — nibble packing order, clamp bounds, table entry,
block header layout — changes the hash.
"""

from __future__ import annotations

import struct

import numpy as np

# Published IMA step-size table (89 entries) and index-adjust table.
STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
)
INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _step_update(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """One decoder step: (pred, index, 4-bit nibble) -> new state.
    The predictor after the update IS the decoded sample."""
    step = STEP_TABLE[index]
    vpdiff = step >> 3
    if nibble & 4:
        vpdiff += step
    if nibble & 2:
        vpdiff += step >> 1
    if nibble & 1:
        vpdiff += step >> 2
    pred = _clamp16(pred - vpdiff if nibble & 8 else pred + vpdiff)
    index = min(88, max(0, index + INDEX_TABLE[nibble & 7]))
    return pred, index


def encode_ima_nibbles(samples: np.ndarray) -> tuple[int, list[int]]:
    """Encode int16 samples -> (header predictor, nibble list).
    Sample 0 becomes the block-header predictor verbatim; each later
    sample yields one nibble. Encoder state starts at index 0."""
    xs = [int(v) for v in np.asarray(samples, dtype=np.int64)]
    if not xs:
        raise ValueError("empty sample array")
    pred, index = _clamp16(xs[0]), 0
    first = pred
    nibbles: list[int] = []
    for x in xs[1:]:
        step = STEP_TABLE[index]
        diff = x - pred
        sign = 8 if diff < 0 else 0
        diff = -diff if diff < 0 else diff
        delta = 0
        if diff >= step:
            delta |= 4
            diff -= step
        if diff >= step >> 1:
            delta |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            delta |= 1
        nibble = sign | delta
        pred, index = _step_update(pred, index, nibble)
        nibbles.append(nibble)
    return first, nibbles


def decode_ima_nibbles(
    first: int, index: int, nibbles: list[int], n_samples: int
) -> np.ndarray:
    """Decode (header predictor, start index, nibbles) -> int16 array
    of exactly n_samples (sample 0 = the header predictor)."""
    out = np.empty(n_samples, dtype=np.int16)
    pred = _clamp16(first)
    out[0] = pred
    for i, nib in enumerate(nibbles[: n_samples - 1]):
        pred, index = _step_update(pred, index, nib)
        out[i + 1] = pred
    return out


def encode_wav_ima_adpcm(
    samples: np.ndarray, sample_rate: int = 8000, block_align: int = 256
) -> bytes:
    """Wrap mono int16 PCM into a real WAVE_FORMAT_IMA_ADPCM (0x0011)
    RIFF file: fmt chunk with the wSamplesPerBlock extension, a fact
    chunk with the true frame count, and low-nibble-first block data.
    Encoder state (step index) carries across blocks, as real encoders
    do; each block header re-seeds the predictor with the next input
    sample."""
    xs = np.asarray(samples, dtype=np.int64)
    n = len(xs)
    if n == 0:
        raise ValueError("empty sample array")
    spb = (block_align - 4) * 2 + 1  # samples per full block
    blocks = []
    index = 0
    pos = 0
    while pos < n:
        chunk = xs[pos : pos + spb]
        pred = _clamp16(int(chunk[0]))
        body = bytearray(struct.pack("<hBB", pred, index, 0))
        nibbles: list[int] = []
        p = pred
        for x in chunk[1:]:
            step = STEP_TABLE[index]
            diff = int(x) - p
            sign = 8 if diff < 0 else 0
            diff = -diff if diff < 0 else diff
            delta = 0
            if diff >= step:
                delta |= 4
                diff -= step
            if diff >= step >> 1:
                delta |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                delta |= 1
            nib = sign | delta
            p, index = _step_update(p, index, nib)
            nibbles.append(nib)
        # pad to the full block's nibble capacity (decoders rely on
        # block_align framing); fact-chunk count trims the tail
        nibbles += [0] * ((block_align - 4) * 2 - len(nibbles))
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            body.append(lo | (hi << 4))
        blocks.append(bytes(body))
        pos += spb
    data = b"".join(blocks)
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate, byte_rate, block_align, 4, 2, spb
    )
    fact = struct.pack("<I", n)
    out = bytearray()
    out += b"RIFF" + struct.pack(
        "<I", 4 + (8 + len(fmt)) + (8 + len(fact)) + (8 + len(data) + (len(data) & 1))
    ) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"fact" + struct.pack("<I", len(fact)) + fact
    out += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        out += b"\x00"
    return bytes(out)


def decode_ima_adpcm_data(
    data: bytes, block_align: int, n_samples: int
) -> np.ndarray:
    """Decode mono IMA-ADPCM `data`-chunk bytes (low nibble first,
    4-byte block headers) to exactly n_samples int16 samples."""
    spb = (block_align - 4) * 2 + 1
    out = np.empty(n_samples, dtype=np.int16)
    got = 0
    pos = 0
    while got < n_samples and pos + 4 <= len(data):
        pred, index, _ = struct.unpack_from("<hBB", data, pos)
        body = data[pos + 4 : pos + block_align]
        nibbles: list[int] = []
        for b in body:
            nibbles.append(b & 0xF)
            nibbles.append(b >> 4)
        take = min(spb, n_samples - got)
        out[got : got + take] = decode_ima_nibbles(pred, index, nibbles, take)
        got += take
        pos += block_align
    if got < n_samples:
        raise ValueError(
            f"ADPCM data exhausted at {got}/{n_samples} samples"
        )
    return out
