"""Stdlib codec kernels (stages/codecs.py): pure numpy, no Ray needed."""

import numpy as np
import pytest

from citationgraphs_ray.stages.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)


def test_png_roundtrip_all_filters_and_layouts():
    rng = np.random.default_rng(0)
    for ch in (1, 3, 4):
        for ft in range(5):
            img = rng.integers(0, 256, size=(13, 9, ch), dtype=np.uint8)
            out = decode_png(encode_png(img, filter_type=ft))
            exp = np.repeat(img, 3, axis=2) if ch == 1 else img[:, :, :3]
            assert np.array_equal(out, exp), (ch, ft)


def test_png_gradient_exercises_paeth_predictor_branches():
    # smooth gradients make Paeth pick different predictors per pixel
    y, x = np.mgrid[0:24, 0:17]
    img = np.stack([y * 7 % 256, x * 11 % 256, (x + y) * 3 % 256], axis=2).astype(
        np.uint8
    )
    for ft in (3, 4):
        assert np.array_equal(decode_png(encode_png(img, filter_type=ft)), img)


def test_png_rejects_garbage_and_bit_flips():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"FAKEIMG|4|4|0")
    good = bytearray(
        encode_png(np.zeros((4, 4, 3), dtype=np.uint8), filter_type=0)
    )
    good[40] ^= 0xFF  # corrupt inside a chunk body
    with pytest.raises(ValueError):
        decode_png(bytes(good))


def test_wav_roundtrip_widths_and_mono_downmix():
    rng = np.random.default_rng(1)
    wavef = (rng.random(777, dtype=np.float32) * 2 - 1).astype(np.float32)
    for sw, tol in ((1, 1 / 64), (2, 1 / 16384), (4, 1e-7)):
        rate, back = decode_wav(encode_wav(16000, wavef, sampwidth=sw))
        assert rate == 16000 and len(back) == 777
        assert float(np.max(np.abs(back - wavef))) < tol
    # stereo downmix: interleave two channels by hand through stdlib wave
    import io
    import wave as wave_mod

    stereo = np.empty(200, dtype="<i2")
    stereo[0::2] = 1000
    stereo[1::2] = 3000
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(stereo.tobytes())
    rate, mono = decode_wav(buf.getvalue())
    assert rate == 8000 and len(mono) == 100
    assert np.allclose(mono, 2000 / 32768.0)
