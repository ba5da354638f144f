"""Dependency-free image/audio codecs for the multimodal kernels.

The sandbox has no PIL/libav, but two formats decode with the stdlib
alone: 24-bit uncompressed BMP (fixed 54-byte header + BGR rows,
4-byte aligned, bottom-up) and PCM WAV (stdlib ``wave``). Having one
REAL codec per modality makes the mapInPandas kernels end-to-end
testable on actual bytes — the production swap (PIL / torchaudio)
changes only the inner decode call, never the Spark plumbing.

Reference behavior being reproduced: camera-frame decode + model
featurization (pipelines/rj_escritorio/flooding_detection/
tasks.py:196-320).
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array → 24-bit uncompressed BMP bytes."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    data_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + data_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up row order
        rows.append(
            pixels[y][:, ::-1].astype(np.uint8).tobytes().ljust(row_size, b"\0")
        )
    return header + info + b"".join(rows)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (h, w, 3) uint8 RGB array."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, np.uint8, row_size * h, data_offset)
    px = raw.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    if not top_down:
        px = px[::-1]
    return np.ascontiguousarray(px)


def resize_nearest(pixels: np.ndarray, target: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, 3) array to (w', h')."""
    tw, th = target
    h, w, _ = pixels.shape
    ys = (np.arange(th) * h // th).clip(0, h - 1)
    xs = (np.arange(tw) * w // tw).clip(0, w - 1)
    return pixels[ys][:, xs]


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float array in [-1, 1] (or int16) → 16-bit mono PCM WAV bytes."""
    if samples.dtype != np.int16:
        samples = np.clip(samples, -1.0, 1.0)
        samples = (samples * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes → (float64 samples in [-1, 1] downmixed to mono,
    sample rate)."""
    with wave.open(io.BytesIO(payload)) as w:
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
        ch = w.getnchannels()
    arr = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    if ch > 1:
        arr = arr.reshape(-1, ch).mean(axis=1)
    return arr, rate
