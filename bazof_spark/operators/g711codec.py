"""G.711 μ-law / A-law companding codecs, pure stdlib + numpy.

ITU-T G.711 is the telephony codec — 8-bit logarithmic companding of
13/14-bit linear PCM, and WAV format tags 6 (A-law) and 7 (μ-law).
It is the simplest LOSSY audio codec with a fully algorithmic
definition (no spec tables needed — the segment/mantissa structure is
closed-form), which makes it exactly oracle-checkable: the 256-entry
decode expansion can be embedded in SQL as literals. The reference
ships no media pipeline (/root/reference/README.md); this continues
the repo's audio surface next to PCM/IMA-ADPCM/FLAC.

The implementation follows the classic public-domain Sun ``g711.c``
(the same algorithm CPython's ``audioop`` wraps, which the tests pin
against bit-for-bit while it exists): 16-bit input is shifted to the
14-bit (μ) / 13-bit (A) domain, sign-split, segment-located against
the doubling thresholds, and packed as (sign | segment | mantissa)
with the format's bit inversion (all-bits for μ-law, alternate-bits
0x55 for A-law — the even-bit flips that keep long silence from being
a DC line signal).
"""

from __future__ import annotations

import numpy as np

_ULAW_BIAS = 0x84  # 132, in the 16-bit domain (33 in the 14-bit one)
_ULAW_CLIP = 8159  # max magnitude in the 14-bit domain
_SEG_UEND = (0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF)
_SEG_AEND = (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)


def _seg(val: int, ends) -> int:
    for i, e in enumerate(ends):
        if val <= e:
            return i
    return len(ends)


def ulaw_encode_sample(pcm: int) -> int:
    """16-bit linear → 8-bit μ-law code (Sun g711.c linear2ulaw)."""
    pcm >>= 2  # 14-bit domain (arithmetic shift)
    if pcm < 0:
        pcm = -pcm
        mask = 0x7F
    else:
        mask = 0xFF
    if pcm > _ULAW_CLIP:
        pcm = _ULAW_CLIP
    pcm += _ULAW_BIAS >> 2
    seg = _seg(pcm, _SEG_UEND)
    if seg >= 8:
        return 0x7F ^ mask
    return ((seg << 4) | ((pcm >> (seg + 1)) & 0xF)) ^ mask


def ulaw_decode_sample(code: int) -> int:
    """8-bit μ-law code → 16-bit linear (Sun g711.c ulaw2linear)."""
    code = ~code & 0xFF
    t = (((code & 0xF) << 3) + _ULAW_BIAS) << ((code & 0x70) >> 4)
    return (_ULAW_BIAS - t) if (code & 0x80) else (t - _ULAW_BIAS)


def alaw_encode_sample(pcm: int) -> int:
    """16-bit linear → 8-bit A-law code (Sun g711.c linear2alaw)."""
    pcm >>= 3  # 13-bit domain
    if pcm >= 0:
        mask = 0xD5
    else:
        mask = 0x55
        pcm = -pcm - 1
    seg = _seg(pcm, _SEG_AEND)
    if seg >= 8:
        return 0x7F ^ mask
    aval = seg << 4
    if seg < 2:
        aval |= (pcm >> 1) & 0xF
    else:
        aval |= (pcm >> seg) & 0xF
    return aval ^ mask


def alaw_decode_sample(code: int) -> int:
    """8-bit A-law code → 16-bit linear (Sun g711.c alaw2linear)."""
    code ^= 0x55
    t = (code & 0xF) << 4
    seg = (code & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t += 0x108
        t <<= seg - 1
    return t if (code & 0x80) else -t


def ulaw_decode_table() -> np.ndarray:
    """All 256 μ-law expansions, int16 — the broadcastable decode."""
    return np.array(
        [ulaw_decode_sample(c) for c in range(256)], dtype=np.int16
    )


def alaw_decode_table() -> np.ndarray:
    return np.array(
        [alaw_decode_sample(c) for c in range(256)], dtype=np.int16
    )


_ENCODE_LUTS: dict[str, np.ndarray] = {}


def _encode_lut(law: str) -> np.ndarray:
    """65536-entry encode LUT, built ONCE per process from the scalar
    reference encoder and cached — the per-call rebuild was 65536
    Python evaluations per blob, which dominated the 100× profile."""
    lut = _ENCODE_LUTS.get(law)
    if lut is None:
        enc = ulaw_encode_sample if law == "ulaw" else alaw_encode_sample
        lut = np.array(
            [enc(v) for v in range(-32768, 32768)], dtype=np.uint8
        )
        _ENCODE_LUTS[law] = lut
    return lut


def g711_encode(samples: np.ndarray, law: str) -> bytes:
    """Vectorized-by-LUT encode of int16 samples to G.711 code bytes:
    one numpy gather — per-sample Python never runs over the payload."""
    idx = samples.astype(np.int32) + 32768
    return _encode_lut(law)[idx].tobytes()


def g711_decode(codes: bytes, law: str) -> np.ndarray:
    table = ulaw_decode_table() if law == "ulaw" else alaw_decode_table()
    return table[np.frombuffer(codes, dtype=np.uint8)]
