"""Round-9 multimodal codec tests: the dependency-free BMP/WAV containers
are REAL (struct-built headers, chunk-walking decoders), not stubs — prove
it with payloads the closed-form oracles never exercise (non-flat pixels,
multi-chunk WAVs), so the decoder/resizer can't be a fixture trick."""

import struct

from sparkmerge.ext.multimodal import (
    WAV_RATE,
    bmp_dims,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    resample_wav,
    resize_bmp,
    wav_samples,
)


def test_bmp_roundtrip_flat():
    b = encode_bmp(7, 5, 200)
    assert b[:2] == b"BM"
    w, h, luma = decode_bmp(b)
    assert (w, h) == (7, 5)
    assert luma == 200 / 255.0


def test_bmp_decoder_reads_real_pixels_not_metadata():
    """Hand-build a NON-flat 2x2 bitmap; the decoder must average the
    actual PIXEL bytes — and only those: the 4-byte-align pad tail is
    excluded (averaging it in biased real zero-padded BMPs toward 0;
    ADVICE r9) — proving it parses the payload rather than echoing
    encoder parameters."""
    width, height = 2, 2
    stride = (3 * width + 3) // 4 * 4  # 8: 6 pixel bytes + 2 pad per row
    data = bytes([10, 20, 30, 40, 50, 60, 0, 0, 70, 80, 90, 100, 110, 120, 0, 0])
    assert len(data) == stride * height
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    w, h, luma = decode_bmp(header + dib + data)
    assert (w, h) == (2, 2)
    pixels = [10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120]
    assert luma == (sum(pixels) / len(pixels)) / 255.0


def test_bmp_resize_nearest_neighbor_generic():
    """Resize a non-flat 2x1 image (red-ish, blue-ish) to 4x1: nearest
    neighbor must repeat each source pixel twice, in order."""
    width, height = 2, 1
    stride = 8
    data = bytes([1, 2, 3, 9, 8, 7, 0, 0])
    header = struct.pack("<2sIHHI", b"BM", 54 + stride, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, stride, 2835, 2835, 0, 0)
    out = resize_bmp(header + dib + data, 4, 1)
    w, h, _ = decode_bmp(out)
    assert (w, h) == (4, 1)
    (offset,) = struct.unpack_from("<I", out, 10)
    pixels = out[offset : offset + 12]
    assert pixels == bytes([1, 2, 3, 1, 2, 3, 9, 8, 7, 9, 8, 7])


def test_wav_roundtrip_and_chunk_walk():
    b = encode_wav(400, 1234)
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    rate, duration = decode_wav(b)
    assert rate == WAV_RATE
    assert duration == 400 / float(WAV_RATE)
    # decoder must walk chunks, not assume fixed offsets: inject a LIST
    # chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    b2 = b[:fmt_end] + extra + b[fmt_end:]
    # patch RIFF size
    b2 = b2[:4] + struct.pack("<I", len(b2) - 8) + b2[8:]
    rate2, duration2 = decode_wav(b2)
    assert (rate2, duration2) == (rate, duration)


def test_wav_resample_halves_rate_keeps_duration():
    b = encode_wav(801, 77)  # odd count: decimation keeps ceil(n/2)
    out = resample_wav(b, factor=2)
    rate, duration = decode_wav(out)
    assert rate == WAV_RATE // 2
    assert duration == 401 / float(WAV_RATE // 2)


def test_decoders_reject_foreign_payloads():
    import pytest

    with pytest.raises(ValueError):
        decode_bmp(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(ValueError):
        decode_wav(b"OggS" + b"\x00" * 64)
    # non-PCM wav (audio_fmt=3, IEEE float) must be refused, not misread
    f = encode_wav(10, 5)
    bad = f[:20] + struct.pack("<H", 3) + f[22:]
    with pytest.raises(ValueError):
        decode_wav(bad)


def test_fixture_dims_match_formulas():
    for nb in (0, 1, 15, 16, 127, 128, 4096):
        w, h = bmp_dims(nb)
        assert w == 4 + nb % 16 and h == 4 + (nb // 16) % 8
        assert wav_samples(nb) == 100 + nb % 900
