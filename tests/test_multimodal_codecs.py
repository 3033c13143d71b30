"""Real stdlib codecs for the multimodal pipeline: WAV (RIFF), BMP
(24-bit), PPM (P6). Encoders and decoders are deliberately independent
code paths (wave-module vs hand struct-parse for WAV; hand-write vs
hand-parse for BMP/PPM), so round trips validate the actual byte
formats — header layout, padding, row order, channel order."""

import os
import struct
import sys
import wave as wave_mod
import io

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bazof_spark.operators.multimodal import (  # noqa: E402
    decode_audio,
    decode_bmp,
    decode_image,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
)


def test_wav_roundtrip_int16():
    rng = np.random.default_rng(7)
    samples = rng.integers(-32768, 32768, size=999, dtype=np.int16)
    blob = encode_wav(samples, sample_rate=44_100)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    rate, ch, got = decode_wav(blob)
    assert (rate, ch) == (44_100, 1)
    assert np.array_equal(got, samples)


def test_wav_roundtrip_stereo():
    samples = np.arange(-100, 100, dtype=np.int16)  # interleaved L/R
    blob = encode_wav(samples, sample_rate=16_000, n_channels=2)
    # the stdlib encoder must agree with our independent parser
    with wave_mod.open(io.BytesIO(blob)) as w:
        assert (w.getnchannels(), w.getframerate(), w.getsampwidth()) == (
            2,
            16_000,
            2,
        )
    rate, ch, got = decode_wav(blob)
    assert (rate, ch) == (16_000, 2)
    assert np.array_equal(got, samples)


def test_wav_8bit_decode_recenters():
    # hand-build an 8-bit PCM WAV: fmt(16) + data chunks
    data = bytes([0, 128, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data + b"\x00"  # pad
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, ch, got = decode_wav(blob)
    assert rate == 8000 and ch == 1
    assert got.tolist() == [-128, 0, 127]


def test_wav_rejects_non_riff():
    with pytest.raises(ValueError):
        decode_wav(b"OggS\x00\x00")


@pytest.mark.parametrize("w,h", [(1, 1), (2, 2), (3, 5), (4, 3), (7, 2)])
def test_bmp_roundtrip_all_paddings(w, h):
    rng = np.random.default_rng(w * 100 + h)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    blob = encode_bmp(px)
    # spec pins: magic, pixel offset 54, row stride padded to 4 bytes
    assert blob[:2] == b"BM"
    assert struct.unpack_from("<I", blob, 10)[0] == 54
    assert len(blob) == 54 + ((w * 3 + 3) & ~3) * h
    assert np.array_equal(decode_bmp(blob), px)


def test_bmp_positional_integrity():
    """A pixel grid whose value encodes its position survives the
    bottom-up + BGR + padding round trip exactly."""
    h, w = 3, 5
    y, x, c = np.ogrid[0:h, 0:w, 0:3]
    px = ((y * 50 + x * 10 + c) % 256).astype(np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_ppm_roundtrip_and_comments():
    px = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)
    commented = b"P6\n# a comment\n4 2\n# another\n255\n" + px.tobytes()
    assert np.array_equal(decode_ppm(commented), px)


def test_decode_dispatchers():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_bmp(px), "bmp"), px)
    assert np.array_equal(decode_image(encode_ppm(px), "ppm"), px)
    from bazof_spark.operators.multimodal import encode_png

    assert np.array_equal(decode_image(encode_png(px), "png"), px)
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff", "jpeg")
    s = np.array([1, -2, 3], dtype=np.int16)
    rate, ch, got = decode_audio(encode_wav(s), "wav")
    assert np.array_equal(got, s)
    with pytest.raises(NotImplementedError):
        decode_audio(b"xxxx", "mp3")


def test_png_roundtrip_plain_and_all_filters():
    """encode(filter 0) → decode, plus adversarial fixtures forcing the
    decoder through every scanline filter — all must reproduce the
    exact pixels."""
    import numpy as np

    from bazof_spark.operators.multimodal import (
        decode_png,
        encode_png,
        encode_png_filtered,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(11, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)
    for f in range(5):
        blob = encode_png_filtered(px, [f])
        assert np.array_equal(decode_png(blob), px), f"filter {f}"
    # cycling filters per row
    blob = encode_png_filtered(px, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(blob), px)


def test_png_gray_and_rgba_and_errors():
    import struct
    import zlib

    import numpy as np

    from bazof_spark.operators.multimodal import decode_png

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    # 2x2 grayscale (ct=0): replicated to RGB
    gray = bytes([10, 20, 30, 40])
    raw = b"\x00" + gray[:2] + b"\x00" + gray[2:]
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = decode_png(blob)
    assert out.shape == (2, 2, 3)
    assert np.array_equal(out[:, :, 0].ravel(), np.array([10, 20, 30, 40]))
    assert np.array_equal(out[:, :, 0], out[:, :, 2])
    # RGBA (ct=6): alpha dropped
    rgba = np.arange(2 * 1 * 4, dtype=np.uint8).reshape(2, 1, 4)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(2))
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 2, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = decode_png(blob)
    assert out.shape == (2, 1, 3)
    assert np.array_equal(out, rgba[:, :, :3])
    # garbage and unsupported depth fail loudly
    import pytest

    with pytest.raises(ValueError):
        decode_png(b"not a png")
    blob16 = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0))
    )
    with pytest.raises(NotImplementedError):
        decode_png(blob16)
