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
    # jpeg routes to the REAL baseline decoder since round 8: truncated
    # input is a loud ValueError, still-unimplemented codecs keep the
    # NotImplementedError contract
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff", "jpeg")
    # webp routes to the REAL VP8L decoder since round 9: a WEBP RIFF
    # with no VP8L chunk is a loud ValueError; the LOSSY profile keeps
    # the NotImplementedError library seam
    with pytest.raises(ValueError, match="VP8L"):
        decode_image(b"RIFFxxxxWEBP", "webp")
    with pytest.raises(NotImplementedError, match="lossless"):
        decode_image(
            b"RIFF\x10\x00\x00\x00WEBPVP8 \x04\x00\x00\x00\x00\x00\x00\x00",
            "webp",
        )
    with pytest.raises(NotImplementedError):
        decode_image(b"????", "avif")
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


# --- baseline JPEG (round 8) ----------------------------------------------


def test_jpeg_block_constant_grayscale_is_bit_exact():
    """A grayscale image of constant 8x8 blocks has a lone integer DC
    coefficient per block; with unit quant tables the whole
    encode->entropy->decode->IDCT chain must round-trip EXACTLY (the
    contract the multimodal_jpeg_decode oracle relies on)."""
    from bazof_spark.operators.jpegcodec import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    rng = np.random.default_rng(11)
    for _ in range(4):
        bh, bw = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        blocks = rng.integers(0, 256, (bh, bw))
        px = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)
        out = decode_jpeg_baseline(encode_jpeg_baseline(px))
        assert out.dtype == np.uint8 and np.array_equal(out, px)


def test_jpeg_gradient_and_rgb_roundtrip_tolerance():
    """General content: every AC path (magnitude categories, runs, ZRL,
    EOB), edge padding for non-multiple-of-8 dims, and the YCbCr color
    loop — quantization rounds each coefficient once, so the round trip
    is within a small uniform tolerance."""
    from bazof_spark.operators.jpegcodec import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    grad = (
        (np.arange(13)[:, None] * 7 + np.arange(21)[None, :] * 3) % 256
    ).astype(np.uint8)
    out = decode_jpeg_baseline(encode_jpeg_baseline(grad))
    assert out.shape == grad.shape
    assert np.abs(out.astype(int) - grad.astype(int)).max() <= 2

    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, (11, 18, 3)).astype(np.uint8)
    out = decode_jpeg_baseline(encode_jpeg_baseline(rgb))
    assert out.shape == rgb.shape
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 4

    # a real (lossy) quantization table still produces a sane image
    q = np.full((8, 8), 16, dtype=np.int64)
    q[0, 0] = 8
    out = decode_jpeg_baseline(encode_jpeg_baseline(rgb, quant=q))
    assert np.abs(out.astype(int) - rgb.astype(int)).mean() < 60


def test_jpeg_sparse_ac_exercises_zrl():
    """A block with one large isolated AC coefficient forces ZRL (16-
    zero-run) symbols through the entropy coder; the decoded pixels
    must match an independent IDCT of the quantized coefficients."""
    from bazof_spark.operators.jpegcodec import (
        _idct,
        ZIGZAG,
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    # craft pixels FROM coefficients so the expected answer is known:
    # DC + a lone high-frequency AC at zigzag index 40 (>2 ZRLs away)
    coef = np.zeros(64)
    coef[ZIGZAG[0]] = 160.0
    coef[ZIGZAG[40]] = 90.0
    px = np.clip(np.round(_idct(coef.reshape(8, 8)) + 128.0), 0, 255).astype(
        np.uint8
    )
    out = decode_jpeg_baseline(encode_jpeg_baseline(px))
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 1


def test_jpeg_420_subsampled_stream_decodes():
    """Hand-built 4:2:0 stream (Y 2x2, Cb/Cr 1x1 in one interleaved
    MCU): exercises the sampling-factor block walk and the chroma
    pixel-replication upsampling the fixture encoder (4:4:4) never
    emits. Constant Y=200 / neutral chroma must decode to uniform
    (200, 200, 200) RGB."""
    from bazof_spark.operators.jpegcodec import (
        _BitWriter,
        _ENC_AC_BITS,
        _ENC_AC_VALS,
        _ENC_DC_BITS,
        _ENC_DC_VALS,
        _canonical_codes,
        _category,
        _seg,
        ZIGZAG,
        decode_jpeg_baseline,
    )

    h = w = 16
    out = bytearray(b"\xff\xd8")
    q = np.ones((8, 8), dtype=np.int64)
    out += _seg(0xDB, bytes([0]) + bytes(int(q.flat[z]) for z in ZIGZAG))
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(3)
    sof += bytes([1, 0x22, 0])  # Y: 2x2
    sof += bytes([2, 0x11, 0])  # Cb: 1x1
    sof += bytes([3, 0x11, 0])  # Cr: 1x1
    out += _seg(0xC0, bytes(sof))
    out += _seg(0xC4, bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS))
    sos = bytearray([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    out += _seg(0xDA, bytes(sos))
    dc = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    bw = _BitWriter()

    def dc_only(diff):
        s, bits = _category(diff)
        code, ln = dc[s]
        bw.write(code, ln)
        if s:
            bw.write(bits, s)
        code, ln = ac[0x00]  # EOB
        bw.write(code, ln)

    # one MCU: 4 Y blocks (first carries DC 8*(200-128)=576, rest diff 0),
    # then Cb, Cr (DC 0 -> plane value 128 = neutral chroma)
    dc_only(576)
    for _ in range(3):
        dc_only(0)
    dc_only(0)  # Cb
    dc_only(0)  # Cr
    out += bw.flush()
    out += b"\xff\xd9"

    px = decode_jpeg_baseline(bytes(out))
    assert px.shape == (16, 16, 3)
    assert np.array_equal(px, np.full((16, 16, 3), 200, dtype=np.uint8))


def test_jpeg_unsupported_frames_fail_loudly():
    from bazof_spark.operators.jpegcodec import (
        _seg,
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_baseline(b"not a jpeg")
    # still-unsupported frame types (extended sequential SOF1,
    # arithmetic SOF9) must raise, not mis-decode — SOF2 progressive
    # IS supported since round 9 (see the progressive tests below)
    for sof in (0xC1, 0xC9):
        blob = bytearray(b"\xff\xd8")
        blob += _seg(sof, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
        with pytest.raises(NotImplementedError, match="SOF"):
            decode_jpeg_baseline(bytes(blob))
    # RSTn markers in the scan with NO DRI declared -> loud error
    blocks = np.arange(6, dtype=np.uint8).reshape(2, 3) * 40
    px6 = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)
    with_rst = bytearray(encode_jpeg_baseline(px6, restart_interval=2))
    dri_at = bytes(with_rst).index(b"\xff\xdd")
    no_dri = with_rst[:dri_at] + with_rst[dri_at + 6 :]  # strip DRI seg
    with pytest.raises(ValueError, match="no DRI"):
        decode_jpeg_baseline(bytes(no_dri))


def test_jpeg_restart_intervals_roundtrip():
    """DRI/RSTn (round-8 follow-up): the encoder emits a restart marker
    with bit-flush + DC-predictor reset every N MCUs, the decoder
    resyncs on each — block-constant grayscale stays BIT-exact across
    segment boundaries (a predictor not reset would shift every DC
    after the first restart)."""
    from bazof_spark.operators.jpegcodec import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    rng = np.random.default_rng(3)
    blocks = rng.integers(0, 256, (3, 5))
    px = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)
    blob = encode_jpeg_baseline(px, restart_interval=2)
    assert b"\xff\xdd" in blob and b"\xff\xd0" in blob
    assert np.array_equal(decode_jpeg_baseline(blob), px)
    # RGB with restarts: same tolerance as without
    rgb = rng.integers(0, 256, (20, 19, 3)).astype(np.uint8)
    out = decode_jpeg_baseline(encode_jpeg_baseline(rgb, restart_interval=3))
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 4


def test_decode_image_routes_jpeg():
    from bazof_spark.operators.multimodal import decode_image
    from bazof_spark.operators.jpegcodec import encode_jpeg_baseline

    px = np.full((8, 8), 77, dtype=np.uint8)
    out = decode_image(encode_jpeg_baseline(px), "jpeg")
    assert out.shape == (8, 8, 3)  # grayscale replicated to RGB
    assert np.array_equal(out[:, :, 0], px)
    rgb = np.full((8, 8, 3), 90, dtype=np.uint8)
    out = decode_image(encode_jpeg_baseline(rgb), "jpg")
    assert out.shape == (8, 8, 3)
    assert np.abs(out.astype(int) - 90).max() <= 2


# --- GIF (round 8) ----------------------------------------------------------


def test_gif_roundtrip_gray_and_palette_and_interlace():
    """Real LZW both directions (independent code paths): grayscale
    identity palette, small RGB palettes, and the four-pass interlaced
    row order all round-trip bit-exactly (GIF is lossless)."""
    from bazof_spark.operators.gifcodec import decode_gif, encode_gif

    rng = np.random.default_rng(9)
    for _ in range(4):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        px = rng.integers(0, 256, (h, w)).astype(np.uint8)
        for interlace in (False, True):
            out = decode_gif(encode_gif(px, interlace=interlace))
            assert out.shape == (h, w, 3)
            assert np.array_equal(out[:, :, 0], px)
            assert np.array_equal(out[:, :, 2], px)
    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], dtype=np.uint8
    )
    px = rng.integers(0, 4, (10, 7)).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif(px, palette=pal)), pal[px])


def test_gif_lzw_dictionary_growth_and_reset():
    """Content long/repetitive enough to grow the code width to 12 bits
    and force the 4096-entry dictionary reset — the paths a short image
    never touches."""
    from bazof_spark.operators.gifcodec import decode_gif, encode_gif

    px = np.tile(np.arange(256, dtype=np.uint8), (80, 1))[:, :250]
    out = decode_gif(encode_gif(px))
    assert np.array_equal(out[:, :, 0], px)
    rng = np.random.default_rng(17)
    noise = rng.integers(0, 256, (64, 200)).astype(np.uint8)
    assert np.array_equal(
        decode_gif(encode_gif(noise))[:, :, 1], noise
    )


def test_gif_errors_and_extension_skipping():
    from bazof_spark.operators.gifcodec import decode_gif, encode_gif

    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"not a gif at all")
    # a graphic-control extension before the image block is skipped
    px = np.arange(16, dtype=np.uint8).reshape(4, 4) * 16
    blob = bytearray(encode_gif(px))
    # image descriptor sits right after header(13) + 256-entry GCT(768)
    img_at = 13 + 768
    assert blob[img_at] == 0x2C
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    with_ext = blob[:img_at] + gce + blob[img_at:]
    out = decode_gif(bytes(with_ext))
    assert np.array_equal(out[:, :, 0], px)
    # index outside the palette fails loudly
    small = encode_gif(
        np.zeros((2, 2), dtype=np.uint8),
        palette=np.zeros((2, 3), dtype=np.uint8),
    )
    ok = decode_gif(small)
    assert ok.shape == (2, 2, 3)


def test_decode_image_routes_gif():
    from bazof_spark.operators.gifcodec import encode_gif
    from bazof_spark.operators.multimodal import decode_image

    px = np.full((3, 5), 42, dtype=np.uint8)
    out = decode_image(encode_gif(px), "gif")
    assert out.shape == (3, 5, 3) and int(out.max()) == 42


def test_gif_animated_frames_roundtrip_and_compositing():
    """Animated GIF: per-frame graphic-control blocks, Netscape loop,
    progressive compositing (do-not-dispose) — all frames round-trip
    exactly; a sub-rectangle frame paints OVER the previous canvas; and
    unsupported disposal methods raise instead of mis-compositing."""
    from bazof_spark.operators.gifcodec import (
        decode_gif,
        decode_gif_frames,
        encode_gif_animated,
    )

    rng = np.random.default_rng(21)
    frames = [rng.integers(0, 256, (9, 13)).astype(np.uint8) for _ in range(4)]
    blob = encode_gif_animated(frames)
    got = decode_gif_frames(blob)
    assert len(got) == 4
    for f, g in zip(frames, got):
        assert np.array_equal(g[:, :, 0], f)
    assert np.array_equal(decode_gif(blob), got[0])  # first frame agrees
    assert len(decode_gif_frames(blob, max_frames=2)) == 2
    # disposal 2 (restore to background) must raise, not mis-composite
    bad = bytearray(blob)
    i = bytes(bad).index(b"\x21\xf9\x04")
    bad[i + 3] = 0x08
    with pytest.raises(NotImplementedError, match="disposal"):
        decode_gif_frames(bytes(bad))
    # sub-rectangle second frame composites over the first canvas
    from bazof_spark.operators.gifcodec import _lzw_encode

    base = encode_gif_animated([frames[0]])
    patch = np.full((2, 3), 200, dtype=np.uint8)
    img = bytearray()
    img += b"\x2c" + (4).to_bytes(2, "little") + (5).to_bytes(2, "little")
    img += (3).to_bytes(2, "little") + (2).to_bytes(2, "little") + b"\x00"
    img.append(8)
    lzw = _lzw_encode(patch.tobytes(), 8)
    for j in range(0, len(lzw), 255):
        chunk = lzw[j : j + 255]
        img.append(len(chunk))
        img += chunk
    img += b"\x00"
    two = base[:-1] + bytes(img) + b"\x3b"
    got = decode_gif_frames(two)
    assert len(got) == 2
    expect = got[0].copy()
    expect[5:7, 4:7] = 200
    assert np.array_equal(got[1], expect)


def test_jpeg_16bit_dqt_and_multi_table_dht_segments():
    """Decoder generality: a 16-bit (Pq=1) quantization table and a
    single DHT segment carrying BOTH the DC and AC tables — shapes real
    encoders emit that the fixture encoder does not — must decode to
    the same pixels as the fixture's layout."""
    from bazof_spark.operators.jpegcodec import (
        _ENC_AC_BITS,
        _ENC_AC_VALS,
        _ENC_DC_BITS,
        _ENC_DC_VALS,
        ZIGZAG,
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    px = np.repeat(
        np.repeat(np.array([[70, 200], [10, 130]], dtype=np.uint8), 8, 0),
        8, 1,
    )
    blob = bytearray(encode_jpeg_baseline(px))
    # locate the fixture's segments
    def seg_at(marker):
        i = bytes(blob).index(bytes([0xFF, marker]))
        ln = int.from_bytes(blob[i + 2 : i + 4], "big")
        return i, i + 2 + ln

    # replace the 8-bit DQT with a 16-bit (big-endian u16) twin
    q16 = b"\xff\xdb" + (2 + 1 + 128).to_bytes(2, "big") + bytes([0x10])
    q16 += b"".join((1).to_bytes(2, "big") for _ in range(64))
    lo, hi = seg_at(0xDB)
    blob2 = blob[:lo] + q16 + blob[hi:]
    # merge the two DHT segments into ONE with both tables
    d1lo, d1hi = seg_at(0xC4)
    rest = blob2[d1hi:]
    d2off = bytes(rest).index(b"\xff\xc4")
    d2ln = int.from_bytes(rest[d2off + 2 : d2off + 4], "big")
    payload = (
        bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
        + bytes([0x10]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS)
    )
    merged = b"\xff\xc4" + (len(payload) + 2).to_bytes(2, "big") + payload
    d1lo2, d1hi2 = None, None
    i = bytes(blob2).index(b"\xff\xc4")
    ln = int.from_bytes(blob2[i + 2 : i + 4], "big")
    first_end = i + 2 + ln
    rest2 = blob2[first_end:]
    j = bytes(rest2).index(b"\xff\xc4")
    jln = int.from_bytes(rest2[j + 2 : j + 4], "big")
    blob3 = blob2[:i] + merged + rest2[: j] + rest2[j + 2 + jln :]
    out = decode_jpeg_baseline(bytes(blob3))
    assert np.array_equal(out, px)
    assert len(ZIGZAG) == 64  # sanity on the imported helper


# --- progressive JPEG (round 9) ---------------------------------------------


def test_jpeg_progressive_block_constant_is_bit_exact():
    """Both progressive scan scripts — minimal spectral selection and
    the full 4-pass successive approximation — must reassemble the
    exact quantized coefficients, so block-constant grayscale under
    unit quant round-trips bit-exactly (the oracle contract of
    multimodal_jpeg_progressive_decode)."""
    from bazof_spark.operators.jpegcodec import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(23)
    for spectral_only in (True, False):
        bh, bw = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        blocks = rng.integers(0, 256, (bh, bw))
        px = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)
        blob = encode_jpeg_progressive(px, spectral_only=spectral_only)
        # the stream really is SOF2
        assert b"\xff\xc2" in blob and b"\xff\xc0" not in blob.split(
            b"\xff\xda"
        )[0]
        out = decode_jpeg(blob)
        assert out.dtype == np.uint8 and np.array_equal(out, px)


def test_jpeg_progressive_decodes_identically_to_baseline():
    """Progressive and baseline streams of the SAME image carry the
    same quantized coefficients, so the two decodes must agree
    BIT-FOR-BIT — any slip in EOB runs, ZRL-in-refinement, correction-
    bit interleaving, or the DC point transform breaks this on random
    content."""
    from bazof_spark.operators.jpegcodec import (
        decode_jpeg,
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(31)
    gray = rng.integers(0, 256, (37, 51)).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(gray)),
        decode_jpeg(encode_jpeg_baseline(gray)),
    )
    rgb = rng.integers(0, 256, (24, 31, 3)).astype(np.uint8)
    for spectral_only in (True, False):
        assert np.array_equal(
            decode_jpeg(
                encode_jpeg_progressive(rgb, spectral_only=spectral_only)
            ),
            decode_jpeg(encode_jpeg_baseline(rgb)),
        )
    # negative coefficients through the successive-approximation
    # refinement sign logic: a lossy quant table makes many
    q = np.clip((np.arange(64).reshape(8, 8) // 4) + 1, 1, 24)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(rgb, quant=q)),
        decode_jpeg(encode_jpeg_baseline(rgb, quant=q)),
    )


def test_jpeg_progressive_rejects_malformed_scans():
    """Structural honesty: interleaved AC scans and mixed-band scans in
    an SOF2 frame are malformed per T.81 B.2.3 and must error loudly,
    never mis-decode; decode_jpeg_baseline stays a working alias."""
    import pytest

    from bazof_spark.operators.jpegcodec import (
        decode_jpeg,
        decode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    assert decode_jpeg_baseline is decode_jpeg

    px = np.full((8, 8), 100, dtype=np.uint8)
    blob = bytearray(encode_jpeg_progressive(px, spectral_only=True))
    # find the AC SOS header (single-component scan: 0xFFDA len=8
    # ns=1) and corrupt its band to start at 0 (mixed DC+AC band)
    i = blob.rindex(b"\xff\xda")
    ns = blob[i + 4]
    assert ns == 1 and blob[i + 7] == 1  # Ss byte of the AC scan
    blob[i + 7] = 0
    with pytest.raises(ValueError, match="mixes DC and AC"):
        decode_jpeg(bytes(blob))


# ---------------------------------------------------------------------------
# IMA ADPCM (round 9): the first COMPRESSED audio codec in-sandbox
# ---------------------------------------------------------------------------

from bazof_spark.operators.adpcmcodec import (  # noqa: E402
    STEP_TABLE,
    decode_ima_adpcm_data,
    decode_ima_nibbles,
    encode_ima_nibbles,
    encode_wav_ima_adpcm,
)


def test_adpcm_wav_roundtrip_is_lossy_but_bounded():
    """ADPCM is lossy; the decode path must still recover a waveform
    that tracks the source within the quantizer's step sizes for
    smooth signals, with exact length and container fields."""
    rng = np.random.default_rng(11)
    for n in (1, 2, 3, 160, 505, 506, 1200):
        x = (
            np.cumsum(rng.integers(-500, 501, n))
            .clip(-32768, 32767)
            .astype(np.int16)
        )
        blob = encode_wav_ima_adpcm(x, sample_rate=16_000)
        assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
        rate, ch, dec = decode_wav(blob)
        assert (rate, ch, len(dec)) == (16_000, 1, n)
        # sample 0 is the block-header predictor: exact
        assert int(dec[0]) == int(x[0])
        err = np.abs(dec.astype(np.int64) - x.astype(np.int64))
        assert err.mean() < 1500


def test_adpcm_nibble_encode_decode_agree():
    """encode_ima_nibbles and decode_ima_nibbles are the two directions
    of one state machine: decoding the encoder's nibbles MUST land on
    the same waveform the encoder's internal predictor tracked —
    checked against a third, hand-stepped reference."""
    x = np.array([0, 100, -300, 5000, 4990, -32768, 32767, 0], np.int16)
    first, nibs = encode_ima_nibbles(x)
    dec = decode_ima_nibbles(first, 0, nibs, len(x))
    # hand-step the published update for the first transition:
    # pred=0 idx=0 step=7; diff=100 -> delta=4|2|... : 100>=7 (b2,
    # r=93), 93>=3 (b1, r=90), 90>=1 (b0) -> nibble 7,
    # vpdiff=0+7+3+1=11... wait: vpdiff = 7>>3 + 7 + 3 + 1 = 0+7+3+1=11
    assert nibs[0] == 7
    assert int(dec[1]) == 11
    # full decode matches an independent per-step replay
    pred, idx = int(x[0]), 0
    replay = [pred]
    for nib in nibs:
        step = STEP_TABLE[idx]
        vp = step >> 3
        if nib & 4:
            vp += step
        if nib & 2:
            vp += step >> 1
        if nib & 1:
            vp += step >> 2
        pred = max(-32768, min(32767, pred - vp if nib & 8 else pred + vp))
        idx = max(0, min(88, idx + (-1, -1, -1, -1, 2, 4, 6, 8)[nib & 7]))
        replay.append(pred)
    assert np.array_equal(dec, np.array(replay, np.int16))


def test_adpcm_low_nibble_first_packing():
    """Byte layout pin: the FIRST nibble of a block body occupies the
    LOW 4 bits (the IMA/Microsoft convention — a high-first decoder
    produces a different waveform)."""
    x = np.array([0, 100, 0], np.int16)  # nibbles: 7 (up), then down
    blob = encode_wav_ima_adpcm(x, block_align=256)
    # locate the data chunk
    pos = 12
    while blob[pos : pos + 4] != b"data":
        size = struct.unpack_from("<I", blob, pos + 4)[0]
        pos += 8 + size + (size & 1)
    body = blob[pos + 8 :]
    first_byte = body[4]  # after the 4-byte block header
    assert first_byte & 0xF == 7  # nibble 0 in the LOW half


def test_adpcm_multiblock_carries_step_index():
    """Encoder state (step index) continues across block boundaries and
    each block header re-seeds the predictor; a decoder that resets the
    index per block WOULD still agree because the header stores it —
    pin that the second block's stored index is the encoder's running
    one (non-zero after a loud first block)."""
    n = 506  # exactly 2 blocks at block_align=256 (505 + 1)
    x = ((np.arange(n) * 977) % 20001 - 10000).astype(np.int16)
    blob = encode_wav_ima_adpcm(x, block_align=256)
    pos = 12
    while blob[pos : pos + 4] != b"data":
        size = struct.unpack_from("<I", blob, pos + 4)[0]
        pos += 8 + size + (size & 1)
    data = blob[pos + 8 :]
    pred2, idx2, _ = struct.unpack_from("<hBB", data, 256)
    assert idx2 > 0
    assert pred2 == int(x[505])
    _, _, dec = decode_wav(blob)
    assert len(dec) == n and int(dec[505]) == int(x[505])


def test_adpcm_fact_chunk_trims_padding():
    """A 2-sample stream emits one nibble + a full block of padding;
    the fact chunk must trim decode to exactly 2 samples."""
    blob = encode_wav_ima_adpcm(np.array([5, 20], np.int16))
    _, _, dec = decode_wav(blob)
    assert len(dec) == 2 and int(dec[0]) == 5


def test_adpcm_data_exhaustion_fails_loudly():
    with pytest.raises(ValueError, match="exhausted"):
        decode_ima_adpcm_data(b"\x00\x00\x00\x00", block_align=256, n_samples=9999)


# ---------------------------------------------------------------------------
# AVI/MJPEG container (round 9): the first REAL video container
# ---------------------------------------------------------------------------

from bazof_spark.operators.avicontainer import (  # noqa: E402
    encode_avi_mjpeg,
    parse_avi,
)
from bazof_spark.operators.jpegcodec import (  # noqa: E402
    decode_jpeg as _decode_jpeg_any,
    encode_jpeg_baseline as _enc_jpeg,
)


def _mk_frames(mid: int, nfr: int):
    w, h = 8 * (1 + mid % 3), 8 * (1 + mid % 2)
    by = np.arange(h // 8).reshape(-1, 1)
    bx = np.arange(w // 8).reshape(1, -1)
    pix, jfs = [], []
    for f in range(nfr):
        blocks = ((mid + 9 * f + 11 * by + 5 * bx) % 256).astype(np.uint8)
        px = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
        pix.append(px)
        jfs.append(_enc_jpeg(px))
    return w, h, pix, jfs


def test_avi_mjpeg_roundtrip_bit_exact():
    """Demux + decode recovers every frame bit-exactly (block-constant
    JPEG under unit quant), with header fields intact."""
    for mid in (0, 1, 5, 11):
        w, h, pix, jfs = _mk_frames(mid, 2 + mid % 4)
        meta = parse_avi(encode_avi_mjpeg(jfs, w, h, fps=12))
        assert (meta["width"], meta["height"], meta["fps"]) == (w, h, 12)
        assert meta["codec"] == "MJPG" and meta["n_frames"] == len(jfs)
        for fb, expect in zip(meta["frames"], pix):
            assert np.array_equal(_decode_jpeg_any(fb), expect)


def test_avi_odd_length_chunks_word_aligned():
    """Odd-length '00dc' chunks must pad to word alignment without
    corrupting the NEXT chunk's framing — force one by handing the
    muxer payloads of every parity."""
    payloads = [b"x" * n for n in (3, 8, 5, 1)]
    meta = parse_avi(encode_avi_mjpeg(payloads, 8, 8))
    assert meta["frames"] == payloads


def test_avi_idx1_crosscheck_fails_loudly():
    w, h, _, jfs = _mk_frames(2, 3)
    blob = bytearray(encode_avi_mjpeg(jfs, w, h))
    i = blob.rfind(b"idx1")
    struct.pack_into("<I", blob, i + 8 + 12, 1)  # corrupt entry 0 size
    with pytest.raises(ValueError, match="idx1"):
        parse_avi(bytes(blob))


def test_avi_rejects_non_avi():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="RIFF/AVI"):
        parse_avi(b"\x89PNG\r\n\x1a\n")


def test_avi_rec_list_grouping_supported():
    """Some muxers group movi chunks inside 'rec ' LISTs (the spec's
    interleave groups); the walker must recurse into them. Build one by
    hand from the flat file's parts."""
    w, h, pix, jfs = _mk_frames(7, 2)
    flat = encode_avi_mjpeg(jfs, w, h)
    # rebuild: wrap each 00dc chunk in its own rec LIST, drop idx1
    # (offsets would shift; index is optional)
    meta_flat = parse_avi(flat)
    body = b""
    for f in jfs:
        ck = b"00dc" + struct.pack("<I", len(f)) + f
        if len(f) & 1:
            ck += b"\x00"
        body += b"LIST" + struct.pack("<I", 4 + len(ck)) + b"rec " + ck
    movi = b"LIST" + struct.pack("<I", 4 + len(body)) + b"movi" + body
    hdrl_start = flat.index(b"LIST", 12)
    hdrl_size = struct.unpack_from("<I", flat, hdrl_start + 4)[0]
    hdrl = flat[hdrl_start : hdrl_start + 8 + hdrl_size + (hdrl_size & 1)]
    riff_body = b"AVI " + hdrl + movi
    nested = b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
    meta = parse_avi(nested)
    assert meta["n_frames"] == 2
    assert [len(f) for f in meta["frames"]] == [len(f) for f in meta_flat["frames"]]


# ---------------------------------------------------------------------------
# FLAC (round 9): lossless compressed audio
# ---------------------------------------------------------------------------

from bazof_spark.operators.flaccodec import (  # noqa: E402
    BitReader,
    BitWriter,
    decode_flac,
    encode_flac,
)


def test_flac_lossless_roundtrip_signal_classes():
    rng = np.random.default_rng(5)
    cases = [
        np.full(7, -12345, np.int16),                          # constant
        rng.integers(-32768, 32768, 333).astype(np.int16),     # noise
        np.cumsum(rng.integers(-40, 41, 500)).clip(-32768, 32767).astype(np.int16),
        np.array([0], np.int16),                               # single sample
        np.array([-32768, 32767] * 40, np.int16),              # extreme swings
    ]
    for x in cases:
        for lpc in (False, True):
            sr, ch, dec = decode_flac(encode_flac(x, 44_100, force_lpc=lpc))
            assert (sr, ch) == (44_100, 1)
            assert np.array_equal(dec, x)


def test_flac_multiframe_sequencing():
    """> block_size samples span several frames; the UTF-8 frame
    numbers and per-frame CRCs must all verify."""
    x = ((np.arange(1000) * 37) % 9001 - 4500).astype(np.int16)
    sr, _, dec = decode_flac(encode_flac(x, 8000, block_size=64))
    assert np.array_equal(dec, x)


def test_flac_crc_and_md5_corruption_detected():
    x = np.cumsum(np.ones(200)).astype(np.int16)
    blob = bytearray(encode_flac(x, 8000))
    # flip a bit in the last frame's body: the frame CRC-16, the
    # stream MD5, or (if the flip stretches a Rice unary run past the
    # end) bitstream exhaustion — corruption is ALWAYS a loud error
    blob[-5] ^= 0x40
    with pytest.raises(ValueError, match="CRC|MD5|exhausted"):
        decode_flac(bytes(blob))
    # corrupt STREAMINFO's MD5 directly
    blob2 = bytearray(encode_flac(x, 8000))
    blob2[8 + 20] ^= 0xFF
    with pytest.raises(ValueError):
        decode_flac(bytes(blob2))


def test_flac_rejects_non_flac():
    with pytest.raises(ValueError, match="FLAC"):
        decode_flac(b"RIFF....WAVE")


def test_flac_decoder_handles_rice_escape_and_wasted_bits():
    """Hand-build a frame using decoder features the encoder never
    emits: a VERBATIM subframe, then a FIXED subframe whose residual
    partition uses the raw-bits escape, then wasted-bits shifting —
    pinned against hand-computed samples."""
    from bazof_spark.operators.flaccodec import (
        _crc8, _crc16, _utf8_coded_number)
    import hashlib, struct as st

    def frame_bytes(body_writer, block, fi=0):
        hdr = BitWriter()
        hdr.write(0b11111111111110, 14); hdr.write(0, 1); hdr.write(0, 1)
        hdr.write(0b0111, 4); hdr.write(0b1101, 4)
        hdr.write(0, 4); hdr.write(0b100, 3); hdr.write(0, 1)
        head = hdr.bytes() + _utf8_coded_number(fi)
        head += st.pack(">H", block - 1) + st.pack(">H", 8000)
        head += bytes([_crc8(head)])
        body_writer.align()
        fr = head + body_writer.bytes()
        return fr + st.pack(">H", _crc16(fr))

    # VERBATIM subframe, block 4
    want1 = np.array([5, -6, 700, -32768], np.int64)
    b = BitWriter(); b.write(0, 1); b.write(0b000001, 6); b.write(0, 1)
    for v in want1:
        b.write(int(v) & 0xFFFF, 16)
    f1 = frame_bytes(b, 4, 0)

    # FIXED order 0, block 4, residual via raw-bits escape (param=1111,
    # raw width 6) + wasted bits = 1 (all samples even, stored >> 1)
    stored = np.array([10, -20, 30, -12], np.int64) >> 1
    b = BitWriter(); b.write(0, 1); b.write(0b001000, 6)
    b.write(1, 1); b.write(1, 1)        # wasted flag, unary(1-1=0)->1
    b.write(0, 2); b.write(0, 4)        # rice4, partition order 0
    b.write(0xF, 4); b.write(6, 5)      # escape, 6 raw bits
    for v in stored:
        b.write(int(v) & 0x3F, 6)
    f2 = frame_bytes(b, 4, 1)
    want2 = stored << 1

    total = np.concatenate([want1, want2]).astype(np.int16)
    si = BitWriter()
    si.write(4, 16); si.write(4, 16); si.write(0, 24); si.write(0, 24)
    si.write(8000, 20); si.write(0, 3); si.write(15, 5); si.write(len(total), 36)
    meta = si.bytes() + hashlib.md5(total.astype("<i2").tobytes()).digest()
    blob = b"fLaC" + bytes([0x80]) + st.pack(">I", len(meta))[1:] + meta + f1 + f2
    sr, _, dec = decode_flac(blob)
    assert np.array_equal(dec, total)


def test_flac_decode_audio_routing():
    x = np.arange(50, dtype=np.int16)
    sr, ch, dec = decode_audio(encode_flac(x, 8000), "flac")
    assert (sr, ch) == (8000, 1) and np.array_equal(dec, x)


# ---------------------------------------------------------------------------
# Ogg container + FLAC-in-Ogg mapping (round 9)
# ---------------------------------------------------------------------------

from bazof_spark.operators.oggcodec import (  # noqa: E402
    _ogg_crc,
    _page,
    decode_ogg_flac,
    encode_ogg_flac,
    parse_ogg_packets,
)


def test_ogg_flac_lossless_roundtrip():
    rng = np.random.default_rng(21)
    for n in (1, 63, 64, 65, 500):
        x = np.cumsum(rng.integers(-200, 201, n)).clip(-32768, 32767).astype(np.int16)
        for lpc in (False, True):
            sr, ch, dec = decode_ogg_flac(encode_ogg_flac(x, 22_050, force_lpc=lpc))
            assert (sr, ch) == (22_050, 1)
            assert np.array_equal(dec, x)


def test_ogg_page_crc_is_the_unreflected_xiph_polynomial():
    """Pin the CRC flavor: zlib's reflected CRC-32 of 'OggS' is
    0x2e9ce6a8; xiph's unreflected 0x04C11DB7 table gives a DIFFERENT
    value — a decoder using zlib.crc32 would accept nothing."""
    import zlib

    assert _ogg_crc(b"") == 0
    assert _ogg_crc(b"OggS") != zlib.crc32(b"OggS")
    # known property: appending the CRC's own big-endian bytes to the
    # message zeroes the register for this polynomial family
    msg = b"hello ogg"
    crc = _ogg_crc(msg)
    assert _ogg_crc(msg + crc.to_bytes(4, "big")) == 0


def test_ogg_corruption_and_truncation_fail_loudly():
    x = np.arange(300, dtype=np.int16)
    blob = bytearray(encode_ogg_flac(x))
    blob[40] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_ogg_flac(bytes(blob))
    with pytest.raises(ValueError, match="capture|truncated"):
        parse_ogg_packets(b"NotOggData")
    # drop the EOS page: fewer samples than STREAMINFO promises
    good = encode_ogg_flac(x)
    last_page = good.rfind(b"OggS")
    with pytest.raises(ValueError, match="ended at"):
        decode_ogg_flac(good[:last_page])


def test_ogg_packet_continuation_across_pages():
    """A packet larger than one page's lacing run must reassemble: the
    open-ended page ends on a 255-boundary and the next page carries
    the continuation flag."""
    pkt = bytes(range(256)) * 2  # 512 bytes
    p1 = _page([pkt[:510]], 7, 0, -1, 0x02, open_ended=True)
    p2 = _page([pkt[510:]], 7, 1, 0, 0x01)
    assert parse_ogg_packets(p1 + p2) == [(7, pkt)]
    # a continuation page with no prior partial is a framing error
    with pytest.raises(ValueError, match="ended mid-packet"):
        parse_ogg_packets(p1)


def test_ogg_decode_audio_routing():
    x = np.arange(80, dtype=np.int16)
    sr, ch, dec = decode_audio(encode_ogg_flac(x, 8000), "ogg")
    assert (sr, ch) == (8000, 1) and np.array_equal(dec, x)


def test_demux_video_frames_dispatcher():
    from bazof_spark.operators.multimodal import demux_video_frames
    from bazof_spark.operators.gifcodec import encode_gif_animated

    w, h, pix, jfs = _mk_frames(4, 3)
    frames = demux_video_frames(encode_avi_mjpeg(jfs, w, h), "avi")
    assert len(frames) == 3 and all(
        np.array_equal(a, b) for a, b in zip(frames, pix)
    )
    gpx = [((np.arange(12).reshape(3, 4) + f) % 256).astype(np.uint8)
           for f in range(2)]
    gf = demux_video_frames(encode_gif_animated(gpx), "gif")
    # GIF frames come back RGB (identity grayscale palette replicated)
    assert len(gf) == 2 and np.array_equal(gf[0][:, :, 0], gpx[0])
    # mp4 is REAL now (operators/mp4container.py) — a bare ftyp with
    # no moov is invalid, not unimplemented; the remaining stub
    # boundary is inter-frame codecs inside any container
    with pytest.raises(ValueError, match="moov"):
        demux_video_frames(b"\x00\x00\x00\x18ftypmp42mp42mp41iso2", "mp4")
    with pytest.raises(NotImplementedError, match="ARE"):
        demux_video_frames(b"\x00", "rm")


# ---------------------------------------------------------------------------
# QOI (round 9): the one-page public-domain lossless format
# ---------------------------------------------------------------------------

from bazof_spark.operators.qoicodec import decode_qoi, encode_qoi  # noqa: E402


def test_qoi_roundtrip_all_op_classes():
    rng = np.random.default_rng(31)
    cases = [
        rng.integers(0, 256, (9, 7, 3), dtype=np.uint8),     # RGB ops
        rng.integers(0, 256, (5, 5, 4), dtype=np.uint8),     # RGBA ops
        np.full((6, 70, 3), 9, np.uint8),                    # >62 runs
    ]
    pal = rng.integers(0, 256, (3, 3), dtype=np.uint8)
    cases.append(pal[rng.integers(0, 3, (8, 8))])            # INDEX hits
    drift = np.cumsum(rng.integers(-1, 2, (1, 40, 3)), 1) % 256
    cases.append(np.repeat(drift, 4, 0).astype(np.uint8))    # DIFF/LUMA
    for px in cases:
        dec = decode_qoi(encode_qoi(px))
        assert dec.shape == px.shape and np.array_equal(dec, px)


def test_qoi_wrapping_diffs():
    """DIFF/LUMA arithmetic wraps mod 256 — pin 255→0 and 0→255."""
    px = np.array([[[255, 255, 255], [0, 0, 0], [255, 254, 255]]], np.uint8)
    assert np.array_equal(decode_qoi(encode_qoi(px)), px)


def test_qoi_errors_loud():
    with pytest.raises(ValueError, match="QOI"):
        decode_qoi(b"nope")
    blob = bytearray(encode_qoi(np.zeros((2, 2, 3), np.uint8)))
    blob[-1] = 0
    with pytest.raises(ValueError):
        decode_qoi(bytes(blob))
    # truncated op stream
    with pytest.raises(ValueError, match="exhausted"):
        decode_qoi(blob[:14] + b"\x00" * 8)


def test_qoi_decode_image_routing():
    px = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    assert np.array_equal(decode_image(encode_qoi(px), "qoi"), px)
    # RGBA input routes to RGB through the uniform contract
    rgba = np.arange(2 * 2 * 4, dtype=np.uint8).reshape(2, 2, 4)
    assert np.array_equal(decode_image(encode_qoi(rgba), "qoi"), rgba[:, :, :3])


# ---------------------------------------------------------------------------
# baseline TIFF (round 9): IFD walk, strips, LZW (EarlyChange) + PackBits
# ---------------------------------------------------------------------------

from bazof_spark.operators.tiffcodec import (  # noqa: E402
    COMP_LZW,
    COMP_NONE,
    COMP_PACKBITS,
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
    tiff_lzw_decode,
    tiff_lzw_encode,
)


def test_tiff_roundtrip_gray_rgb_all_compressions_and_strips():
    rng = np.random.default_rng(23)
    for shape in ((7, 5), (6, 9, 3), (1, 1), (13, 2, 3)):
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        for comp in (COMP_NONE, COMP_PACKBITS, COMP_LZW):
            for rps in (2, 1000):
                dec = decode_tiff(encode_tiff(px, comp, rows_per_strip=rps))
                assert np.array_equal(dec, px), (shape, comp, rps)


def test_tiff_lzw_earlychange_and_table_reset():
    """Low-entropy data long enough to drive the code width to 12 bits
    and force a mid-stream CLEAR/reset; plus incompressible data."""
    rng = np.random.default_rng(29)
    low = bytes(rng.integers(0, 6, 30_000, dtype=np.uint8))
    assert tiff_lzw_decode(tiff_lzw_encode(low), len(low)) == low
    rnd = bytes(rng.integers(0, 256, 50_000, dtype=np.uint8))
    assert tiff_lzw_decode(tiff_lzw_encode(rnd), len(rnd)) == rnd


def test_tiff_packbits_runs_and_literals():
    data = b"\x00" * 300 + b"abcdef" + b"\xff" * 2 + b"x"
    assert packbits_decode(packbits_encode(data), len(data)) == data
    with pytest.raises(ValueError, match="exhausted"):
        packbits_decode(b"", 5)


def test_tiff_big_endian_and_errors():
    """The decoder must accept MM (big-endian) files — hand-flip a
    minimal uncompressed gray file — and reject garbage."""
    px = np.arange(6, dtype=np.uint8).reshape(2, 3)
    import struct as st

    data = px.tobytes()
    entries = [
        (256, 3, 1, 3 << 16), (257, 3, 1, 2 << 16), (258, 3, 1, 8 << 16),
        (259, 3, 1, 1 << 16), (262, 3, 1, 1 << 16),
        (273, 4, 1, None), (277, 3, 1, 1 << 16),
        (278, 3, 1, 1000 << 16), (279, 4, 1, len(data)),
    ]
    ifd_at = 8
    data_at = ifd_at + 2 + 12 * len(entries) + 4
    blob = bytearray(b"MM\x00*" + st.pack(">I", ifd_at))
    blob += st.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        if val is None:
            val = data_at
        blob += st.pack(">HHI", tag, typ, cnt)
        if typ == 3:
            blob += st.pack(">HH", val >> 16, 0)
        else:
            blob += st.pack(">I", val)
    blob += st.pack(">I", 0) + data
    assert np.array_equal(decode_tiff(bytes(blob)), px)
    with pytest.raises(ValueError, match="TIFF"):
        decode_tiff(b"not a tiff")


def test_tiff_decode_image_routing():
    px = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    assert np.array_equal(decode_image(encode_tiff(px), "tiff"), px)
    gray = np.arange(4, dtype=np.uint8).reshape(2, 2)
    out = decode_image(encode_tiff(gray, COMP_LZW), "tif")
    assert out.shape == (2, 2, 3) and np.array_equal(out[:, :, 1], gray)


# ---------------------------------------------------------------------------
# MP4 / ISO BMFF (round 9): the dominant web video container
# ---------------------------------------------------------------------------

from bazof_spark.operators.mp4container import (  # noqa: E402
    encode_mp4_mjpeg,
    parse_mp4,
)


def _mk_mp4_frames(mid: int, nfr: int):
    w, h = 8 * (1 + mid % 3), 8 * (1 + mid % 2)
    by = np.arange(h // 8).reshape(-1, 1)
    bx = np.arange(w // 8).reshape(1, -1)
    pix, jfs = [], []
    for f in range(nfr):
        blocks = ((mid + 13 * f + 11 * by + 5 * bx) % 256).astype(np.uint8)
        px = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
        pix.append(px)
        jfs.append(_enc_jpeg(px))
    return w, h, pix, jfs


def test_mp4_mjpeg_roundtrip_bit_exact():
    """Box walk + stsc/stsz/stco sample reconstruction recovers every
    sample bit-exactly, with stsd/mdhd header fields intact."""
    for mid in (0, 1, 5, 11):
        w, h, pix, jfs = _mk_mp4_frames(mid, 2 + mid % 4)
        meta = parse_mp4(encode_mp4_mjpeg(jfs, w, h, fps=12))
        assert (meta["width"], meta["height"], meta["fps"]) == (w, h, 12)
        assert meta["codec"] == "jpeg" and meta["n_frames"] == len(jfs)
        for fb, expect in zip(meta["frames"], pix):
            assert np.array_equal(_decode_jpeg_any(fb), expect)


def test_mp4_stsc_run_expansion_uneven_tail():
    """7 samples at 3/chunk → stsc runs (1,3)(3,1): the run expansion
    and within-chunk cumulative offsets must both hold. Also the
    degenerate 1/chunk layout (one run, one sample per chunk)."""
    payloads = [bytes([i]) * (5 + 3 * i) for i in range(7)]
    for spc in (3, 1, 7, 100):
        meta = parse_mp4(encode_mp4_mjpeg(payloads, 8, 8,
                                          samples_per_chunk=spc))
        assert meta["frames"] == payloads, spc


def test_mp4_inconsistent_tables_fail_loudly():
    _, _, _, jfs = _mk_mp4_frames(2, 3)
    blob = encode_mp4_mjpeg(jfs, 16, 8)
    # stts sample count disagrees with stsz
    b = bytearray(blob)
    p = b.rfind(b"stts")
    struct.pack_into(">I", b, p + 12, 99)
    with pytest.raises(ValueError, match="stts covers"):
        parse_mp4(bytes(b))
    # a sample extent pointing past EOF
    b = bytearray(blob)
    p = b.rfind(b"stsz")
    struct.pack_into(">I", b, p + 16, 1 << 24)  # first sample size
    with pytest.raises(ValueError, match="exceeds file size"):
        parse_mp4(bytes(b))
    # not BMFF at all: a well-formed box stream with no moov, and a
    # RIFF blob whose fake "size" overruns the buffer
    with pytest.raises(ValueError, match="moov"):
        parse_mp4(b"\x00\x00\x00\x08free")
    with pytest.raises(ValueError, match="overruns"):
        parse_mp4(b"RIFF\x10\x00\x00\x00AVI LIST")


def test_mp4_demux_dispatcher_and_codec_seam():
    from bazof_spark.operators.multimodal import demux_video_frames

    w, h, pix, jfs = _mk_mp4_frames(4, 3)
    blob = encode_mp4_mjpeg(jfs, w, h)
    frames = demux_video_frames(blob, "mp4")
    assert len(frames) == 3
    for got, expect in zip(frames, pix):
        assert np.array_equal(got, expect)
    # a non-jpeg sample entry demuxes but refuses decode with the
    # declared library-seam message
    b = bytearray(blob)
    p = b.rfind(b"jpeg")
    b[p : p + 4] = b"avc1"
    with pytest.raises(NotImplementedError, match="avc1"):
        demux_video_frames(bytes(b), "mp4")


# ---------------------------------------------------------------------------
# MKV / Matroska over EBML (round 9): completes the container triple
# ---------------------------------------------------------------------------

from bazof_spark.operators.mkvcontainer import (  # noqa: E402
    SIMPLE_BLOCK,
    _block_frames,
    _el,
    encode_mkv_mjpeg,
    parse_mkv,
)


def _mk_mkv_frames(mid: int, nfr: int):
    w, h = 8 * (1 + mid % 3), 8 * (1 + mid % 2)
    by = np.arange(h // 8).reshape(-1, 1)
    bx = np.arange(w // 8).reshape(1, -1)
    pix, jfs = [], []
    for f in range(nfr):
        blocks = ((mid + 17 * f + 11 * by + 5 * bx) % 256).astype(np.uint8)
        px = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
        pix.append(px)
        jfs.append(_enc_jpeg(px))
    return w, h, pix, jfs


def test_mkv_mjpeg_roundtrip_bit_exact():
    for mid in (0, 1, 5, 11):
        w, h, pix, jfs = _mk_mkv_frames(mid, 2 + mid % 4)
        meta = parse_mkv(encode_mkv_mjpeg(jfs, w, h, fps=10))
        assert (meta["width"], meta["height"], meta["fps"]) == (w, h, 10)
        assert meta["codec"] == "V_MJPEG" and meta["n_frames"] == len(jfs)
        for fb, expect in zip(meta["frames"], pix):
            assert np.array_equal(_decode_jpeg_any(fb), expect)


def _lace_block(payloads, lacing):
    """Hand-build a SimpleBlock element with the given lacing mode."""
    blk = b"\x81" + struct.pack(">h", 0) + bytes([0x80 | (lacing << 1)])
    if lacing:
        blk += bytes([len(payloads) - 1])
    if lacing == 1:  # Xiph
        for p in payloads[:-1]:
            n = len(p)
            while n >= 255:
                blk += b"\xff"
                n -= 255
            blk += bytes([n])
    elif lacing == 3:  # EBML: first absolute, rest signed deltas
        def enc_size(v):
            for width in range(1, 9):
                if v < (1 << (7 * width)) - 1:
                    return (v | (1 << (7 * width))).to_bytes(width, "big")
        blk += enc_size(len(payloads[0]))
        prev = len(payloads[0])
        for p in payloads[1:-1]:
            bias = (1 << (7 * 2 - 1)) - 1
            blk += (
                ((len(p) - prev + bias) | (1 << 14)).to_bytes(2, "big")
            )
            prev = len(p)
    return _el(SIMPLE_BLOCK, blk + b"".join(payloads))


@pytest.mark.parametrize("lacing", [1, 2, 3])
def test_mkv_block_lacing_modes(lacing):
    """Xiph (255-continued sizes), fixed-size, and EBML (signed-delta
    varint) lacing must all split a block into the original frames."""
    if lacing == 2:
        payloads = [b"abc", b"def", b"ghi"]  # fixed-size needs equal
    else:
        payloads = [b"a" * 300, b"bb" * 10, b"c" * 7]
    el = _lace_block(payloads, lacing)
    # body starts after the element id + size varints
    from bazof_spark.operators.mkvcontainer import _read_varint
    _, p = _read_varint(el, 0, keep_marker=True)
    _, p = _read_varint(el, p, keep_marker=False)
    assert _block_frames(el, p, len(el)) == payloads


def test_mkv_rejects_non_ebml_and_crosschecks():
    # random leading bytes parse as a garbage element that overruns;
    # a WELL-FORMED stream not led by an EBML header gets the typed error
    with pytest.raises(ValueError, match="overruns"):
        parse_mkv(b"RIFF\x10\x00\x00\x00AVI LIST")
    with pytest.raises(ValueError, match="EBML"):
        parse_mkv(b"\xa3\x81\x00")  # lone SimpleBlock, no header
    _, _, _, jfs = _mk_mkv_frames(2, 3)
    blob = encode_mkv_mjpeg(jfs, 16, 8)
    # truncate mid-cluster: element overruns its container
    with pytest.raises(ValueError, match="overruns|past end"):
        parse_mkv(blob[: len(blob) - 5])


def test_mkv_demux_dispatcher_and_codec_seam():
    from bazof_spark.operators.multimodal import demux_video_frames

    w, h, pix, jfs = _mk_mkv_frames(4, 3)
    blob = encode_mkv_mjpeg(jfs, w, h)
    frames = demux_video_frames(blob, "mkv")
    assert len(frames) == 3
    for got, expect in zip(frames, pix):
        assert np.array_equal(got, expect)
    b = bytearray(blob)
    p = b.find(b"V_MJPEG")
    b[p : p + 7] = b"V_MPEG4"
    with pytest.raises(NotImplementedError, match="V_MPEG4"):
        demux_video_frames(bytes(b), "mkv")


# ---------------------------------------------------------------------------
# G.711 μ-law / A-law (round 9): the telephony companding codec
# ---------------------------------------------------------------------------

from bazof_spark.operators.g711codec import (  # noqa: E402
    alaw_decode_table,
    g711_decode,
    g711_encode,
    ulaw_decode_table,
)
from bazof_spark.operators.multimodal import encode_wav_g711  # noqa: E402


def _full_range_samples():
    rng = np.random.default_rng(7)
    return np.concatenate(
        [
            np.arange(-32768, 32768, 97, dtype=np.int32),
            rng.integers(-32768, 32768, 2000),
            np.array([0, 1, -1, 32767, -32768, 132, -132, 8158 * 4]),
        ]
    ).astype(np.int16)


def test_g711_pinned_to_audioop_while_it_exists():
    """audioop wraps the same public Sun g711.c; until its 3.13 removal
    it is a free independent implementation to pin against."""
    audioop = pytest.importorskip("audioop")
    s = _full_range_samples()
    assert g711_encode(s, "ulaw") == audioop.lin2ulaw(s.tobytes(), 2)
    assert g711_encode(s, "alaw") == audioop.lin2alaw(s.tobytes(), 2)
    codes = bytes(range(256))
    assert ulaw_decode_table().tobytes() == audioop.ulaw2lin(codes, 2)
    assert alaw_decode_table().tobytes() == audioop.alaw2lin(codes, 2)


@pytest.mark.parametrize("law", ["ulaw", "alaw"])
def test_g711_requantization_fixpoint(law):
    """decode∘encode is a projection onto the 8-bit grid: encoding the
    DECODED value again must reproduce the same code for every code
    (the classic companding fixpoint), and the error vs the original
    stays within the top segment's step."""
    s = _full_range_samples()
    codes = g711_encode(s, law)
    dec = g711_decode(codes, law)
    assert g711_encode(dec, law) == codes
    err = np.abs(dec.astype(np.int32) - s.astype(np.int32))
    assert err.max() <= 1024  # half the widest segment step, both laws


@pytest.mark.parametrize("law,tag", [("ulaw", 7), ("alaw", 6)])
def test_g711_wav_roundtrip_through_decode_wav(law, tag):
    from bazof_spark.operators.multimodal import decode_wav

    s = (257 * (np.arange(300) % 256) - 32768).astype(np.int16)
    blob = encode_wav_g711(s, 8000, law)
    assert struct.unpack_from("<H", blob, 20)[0] == tag
    rate, ch, dec = decode_wav(blob)
    assert (rate, ch) == (8000, 1)
    assert dec.tobytes() == g711_decode(g711_encode(s, law), law).tobytes()
    # odd-length data chunk is padded; the fact chunk trims it back
    s1 = s[:299]
    rate, ch, dec1 = decode_wav(encode_wav_g711(s1, 8000, law))
    assert len(dec1) == 299


# ---------------------------------------------------------------------------
# WebP lossless / VP8L (round 9): the web-scrape image format
# ---------------------------------------------------------------------------

from bazof_spark.operators.vp8lcodec import (  # noqa: E402
    decode_vp8l,
    encode_vp8l,
    short_distance_map,
)


def _vp8l_grid(mid: int):
    w, h = 4 + mid % 5, 3 + mid % 4
    y = np.arange(h).reshape(h, 1, 1)
    x = np.arange(w).reshape(1, w, 1)
    c = np.arange(3).reshape(1, 1, 3)
    px = ((mid + 7 * y + 3 * x + c) % 256).astype(np.uint8)
    return np.concatenate([px, np.full((h, w, 1), 255, np.uint8)], axis=2)


def test_vp8l_literal_lz77_cache_roundtrips():
    rng = np.random.default_rng(3)
    flat = np.full((20, 30, 4), [10, 200, 30, 255], np.uint8)
    noise = rng.integers(0, 256, (9, 11, 4), dtype=np.uint8)
    rep = np.tile(
        np.array([[1, 2, 3, 255], [4, 5, 6, 255]], np.uint8), (8, 7, 1)
    )[:, :13]
    for im, kw in [
        (flat, {}), (noise, {}), (rep, {"cache_bits": 4}),
        (_vp8l_grid(1), {"use_subtract_green": True}),
        (np.array([[[7, 8, 9, 10]]], np.uint8), {}),
    ]:
        out = decode_vp8l(encode_vp8l(im, **kw))
        assert (out == im).all()


@pytest.mark.parametrize("mode", list(range(14)))
def test_vp8l_all_predictor_modes(mode):
    im = _vp8l_grid(5)
    out = decode_vp8l(encode_vp8l(im, predictor_mode=mode))
    assert (out == im).all(), mode


@pytest.mark.parametrize("n_colors", [2, 4, 13, 250])
def test_vp8l_palette_all_bundle_widths(n_colors):
    pi = np.zeros((11, 23, 4), np.uint8)
    vals = [
        (i * 37 % 256, i * 11 % 256, i * 5 % 256, 255)
        for i in range(n_colors)
    ]
    for y in range(11):
        for x in range(23):
            pi[y, x] = vals[(y * 23 + x) % n_colors]
    out = decode_vp8l(encode_vp8l(pi, palette=True))
    assert (out == pi).all()


def test_vp8l_color_transform_and_combos():
    im = _vp8l_grid(8)
    for kw in [
        {"color_element": (30, 200, 5)},
        {"color_element": (255, 1, 128), "use_subtract_green": True},
        {"color_element": (64, 32, 16), "predictor_mode": 7,
         "cache_bits": 3},
    ]:
        out = decode_vp8l(encode_vp8l(im, **kw))
        assert (out == im).all(), kw


def test_vp8l_rejects_and_seams():
    with pytest.raises(ValueError, match="RIFF/WEBP"):
        decode_vp8l(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(NotImplementedError, match="lossless"):
        decode_vp8l(
            b"RIFF\x10\x00\x00\x00WEBPVP8 \x04\x00\x00\x00\x00\x00\x00\x00"
        )
    blob = bytearray(encode_vp8l(_vp8l_grid(2)))
    i = blob.index(b"VP8L") + 8
    blob[i] = 0x30  # bad signature byte
    with pytest.raises(ValueError, match="signature"):
        decode_vp8l(bytes(blob))
    # truncated payload dies loudly
    with pytest.raises(ValueError, match="truncated|out of range"):
        decode_vp8l(bytes(blob[:i]) + b"\x2f\x00")


def test_vp8l_short_distance_map_invariants():
    m = short_distance_map()
    assert len(m) == 120 and len(set(m)) == 120
    assert all(dy >= 0 and (dy > 0 or dx > 0) for dx, dy in m)
    d = [dx * dx + dy * dy for dx, dy in m]
    assert d == sorted(d)  # proximity-ranked
    assert m[0] in ((0, 1), (1, 0))
