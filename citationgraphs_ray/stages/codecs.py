"""Real default media codecs built on the Python stdlib (no codec libs in
the container): PNG (8-bit, non-interlaced gray/RGB/RGBA) via ``zlib`` +
per-scanline unfiltering, and WAV (PCM 8/16/32-bit) via ``wave``.

These are the DEFAULT decoders behind the multimodal stages' injectable
boundary (stages/multimodal.py): production pipelines inject a PIL /
soundfile decoder; these make the decode→features path run on real bytes
out of the box. Matching minimal encoders exist so fixtures and tests can
round-trip deterministic payloads without external files.

Scale note: decode work is per-row inside ``map_batches`` actor stages —
the per-scanline Python loop in ``decode_png`` (sequential left-dependency
of PNG filters 3/4) is bounded by image height and runs worker-side, never
on the driver.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # PNG color type -> samples per pixel
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG writer: 8-bit gray/RGB/RGBA, non-interlaced, one IDAT.

    ``filter_type`` applies the same PNG filter to every scanline (forward
    filtering predicts from the ORIGINAL neighbors, so all five filters
    vectorize) — exercised by tests to prove ``decode_png`` unfilters
    Sub/Up/Average/Paeth correctly.
    """
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if ch not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {ch}")
    if filter_type not in range(5):
        raise ValueError(f"bad PNG filter {filter_type}")
    px = img.astype(np.int64)  # (h, w, ch)
    left = np.zeros_like(px)
    left[:, 1:] = px[:, :-1]
    up = np.zeros_like(px)
    up[1:] = px[:-1]
    ul = np.zeros_like(px)
    ul[1:, 1:] = px[:-1, :-1]
    if filter_type == 0:
        filt = px
    elif filter_type == 1:
        filt = px - left
    elif filter_type == 2:
        filt = px - up
    elif filter_type == 3:
        filt = px - (left + up) // 2
    else:  # Paeth
        p = left + up - ul
        da, db, dc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
        pred = np.where((da <= db) & (da <= dc), left, np.where(db <= dc, up, ul))
        filt = px - pred
    rows = (filt % 256).astype(np.uint8).reshape(h, w * ch)
    raw = np.concatenate(
        [np.full((h, 1), filter_type, dtype=np.uint8), rows], axis=1
    ).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → (h, w, 3) uint8. Supports 8-bit non-interlaced gray / RGB /
    RGBA (gray replicated, alpha dropped), all five scanline filters,
    multi-IDAT streams; verifies chunk CRCs."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    idat = bytearray()
    meta = None
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError(
                    "unsupported PNG (need 8-bit, non-interlaced, "
                    f"standard compression): depth={depth} interlace={interlace}"
                )
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {ctype}")
            meta = (w, h, _CHANNELS[ctype])
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, ch = meta
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("PNG pixel data size mismatch")
    raw = raw.reshape(h, stride + 1)
    filters = raw[:, 0]
    recon = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = int(filters[y])
        cur = raw[y, 1:].astype(np.int64)
        if f == 0:
            pass
        elif f == 1:  # Sub: per-pixel cumsum along the row
            px = cur.reshape(w, ch)
            cur = (np.cumsum(px, axis=0) % 256).ravel()
        elif f == 2:  # Up
            cur = (cur + prev) % 256
        elif f == 3:  # Average (sequential left dependency)
            px = cur.reshape(w, ch)
            up = prev.reshape(w, ch)
            left = np.zeros(ch, dtype=np.int64)
            for x in range(w):
                px[x] = (px[x] + (left + up[x]) // 2) % 256
                left = px[x]
            cur = px.ravel()
        elif f == 4:  # Paeth (sequential left dependency)
            px = cur.reshape(w, ch)
            up = prev.reshape(w, ch)
            left = np.zeros(ch, dtype=np.int64)
            ul = np.zeros(ch, dtype=np.int64)
            for x in range(w):
                p = left + up[x] - ul
                da = np.abs(p - left)
                db = np.abs(p - up[x])
                dc = np.abs(p - ul)
                pred = np.where(
                    (da <= db) & (da <= dc), left, np.where(db <= dc, up[x], ul)
                )
                px[x] = (px[x] + pred) % 256
                left = px[x]
                ul = up[x]
            cur = px.ravel()
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        recon[y] = cur.astype(np.uint8)
        prev = cur
    img = recon.reshape(h, w, ch)
    if ch == 1:
        return np.repeat(img, 3, axis=2)
    if ch == 4:
        return np.ascontiguousarray(img[:, :, :3])
    return img


def encode_wav(
    rate: int, samples: np.ndarray, sampwidth: int = 2
) -> bytes:
    """float[-1,1] mono waveform → PCM WAV bytes (stdlib ``wave``)."""
    s = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    if sampwidth == 2:
        pcm = (s * 32767).astype("<i2").tobytes()
    elif sampwidth == 1:
        pcm = ((s * 127) + 128).astype(np.uint8).tobytes()
    elif sampwidth == 4:
        pcm = (s * 2147483647).astype("<i4").tobytes()
    else:
        raise ValueError(f"unsupported sample width {sampwidth}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        w.writeframes(pcm)
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV → (sample_rate, float32 mono waveform in [-1, 1]).

    PCM 8/16/32-bit; multi-channel input is averaged to mono.
    """
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128) / 128.0
    elif sw == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if ch > 1:
        data = data.reshape(-1, ch).mean(axis=1).astype(np.float32)
    return rate, data
