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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array → PNG bytes (8-bit truecolor,
    filter 0 rows, single IDAT)."""
    import zlib

    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y].astype(np.uint8).tobytes() for y in range(h)
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8 RGB array.

    Supports the dominant web/still-image shape: 8-bit depth,
    grayscale / truecolor / truecolor+alpha (color types 0/2/6),
    non-interlaced, all five scanline filters. Palette, 16-bit, and
    Adam7 variants raise — callers fall back to their stub, matching
    the BMP contract (a bad payload must never fail the task).
    """
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("malformed PNG (missing IHDR/IDAT)")
    w, h, depth, ctype_v, _comp, _filt, interlace = ihdr
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype_v)
    if depth != 8 or channels is None or interlace != 0 or w == 0 or h == 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={ctype_v}, "
            f"interlace={interlace}, {w}x{h})"
        )
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG data")
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y else np.zeros(stride, np.int64)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up — vectorizes
            cur = (line + prev) & 0xFF
        elif ftype == 1:
            # Sub: rec[x] = line[x] + rec[x-bpp]. Per channel lane
            # this is a running sum, and mod-256 distributes over
            # addition, so a lane cumsum then &0xFF is exact —
            # real-world encoders emit mostly Sub/Paeth rows, so this
            # lane keeps large images off the per-byte Python path.
            lanes = line.reshape(-1, bpp)
            cur = (np.cumsum(lanes, axis=0) & 0xFF).reshape(stride)
        else:  # Average/Paeth: nonlinear left-pixel dependency
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 3:
                    rec = line[x] + (a + b) // 2
                elif ftype == 4:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    rec = line[x] + pred
                else:
                    raise ValueError(f"bad PNG filter {ftype}")
                cur[x] = rec & 0xFF
        out[y] = cur.astype(np.uint8)
    px = out.reshape(h, w, channels)
    if channels == 1:
        px = np.repeat(px, 3, axis=2)
    elif channels == 2:  # gray+alpha → replicate gray
        px = np.repeat(px[:, :, :1], 3, axis=2)
    elif channels == 4:  # drop alpha
        px = px[:, :, :3]
    return np.ascontiguousarray(px)


def image_format(payload: bytes) -> str | None:
    """Magic-byte format sniff: 'bmp' | 'png' | 'jpeg' | None. The ONE
    owner of format dispatch — decode/encode/kernel sites all route
    here, so adding a format is a single-site change."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:8] == _PNG_SIG:
        return "png"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    return None


def decode_image_rgb(payload: bytes) -> np.ndarray:
    """Magic-dispatched decode of any supported still-image format →
    (h, w, 3) uint8 RGB. Raises on formats needing PIL (and on JPEG
    variants the baseline decoder rejects — progressive/arithmetic —
    so kernel callers still stub-fallback per contract)."""
    fmt = image_format(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "png":
        return decode_png(payload)
    if fmt == "jpeg":
        from pipelines_spark.llm.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise ValueError("unsupported image format (need PIL)")


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array in the named format."""
    if fmt == "bmp":
        return encode_bmp(pixels)
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":
        from pipelines_spark.llm.jpeg import encode_jpeg

        return encode_jpeg(pixels)
    raise ValueError(f"unsupported image format {fmt!r}")


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
