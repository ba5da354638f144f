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


#: Adam7 pass grid: (x0, y0, dx, dy) per pass
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def encode_png(pixels: np.ndarray, *, interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB array → PNG bytes (8-bit truecolor,
    filter 0 rows, single IDAT; ``interlace=True`` writes the Adam7
    pass sequence — fixture path for the interlaced reader)."""
    import zlib

    h, w, _ = pixels.shape
    # IHDR: w, h, depth, color, compression, filter, INTERLACE
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1 if interlace else 0)
    if not interlace:
        raw = b"".join(
            b"\x00" + pixels[y].astype(np.uint8).tobytes() for y in range(h)
        )
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = pixels[y0::dy, x0::dx]
            if sub.size == 0:
                continue  # empty pass contributes no scanlines
            parts.extend(
                b"\x00" + sub[y].astype(np.uint8).tobytes()
                for y in range(sub.shape[0])
            )
        raw = b"".join(parts)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_palette(
    indices: np.ndarray, palette: np.ndarray, *, depth: int = 8
) -> bytes:
    """(h, w) index array + (n, 3) palette → paletted PNG (color type
    3) at bit depth 1/2/4/8, filter 0 rows — fixture path for the
    palette + sub-byte readers."""
    import zlib

    h, w = indices.shape
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
    plte = palette.astype(np.uint8).tobytes()
    rows = []
    per_byte = 8 // depth
    for y in range(h):
        line = indices[y].astype(np.uint8)
        if depth == 8:
            packed = line.tobytes()
        else:
            pad = (-w) % per_byte
            padded = np.pad(line, (0, pad))
            groups = padded.reshape(-1, per_byte)
            vals = np.zeros(groups.shape[0], dtype=np.uint8)
            for i in range(per_byte):  # MSB-first packing
                vals = (vals << depth) | groups[:, i]
            packed = vals.tobytes()
        rows.append(b"\x00" + packed)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(rows), 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_gray16(gray: np.ndarray) -> bytes:
    """(h, w) uint16 array → 16-bit grayscale PNG (color type 0),
    filter 0 rows — fixture path for the 16-bit reader."""
    import zlib

    h, w = gray.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + gray[y].astype(">u2").tobytes() for y in range(h)
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_defilter(raw: bytes, off: int, h: int, stride: int, bpp: int):
    """Reverse the scanline filters of one (sub-)image: ``h`` rows of
    ``stride`` bytes each, ``bpp`` filter-delta bytes per pixel.
    Returns the (h, stride) byte array and the input bytes consumed."""
    if len(raw) - off < h * (stride + 1):
        raise ValueError("truncated PNG data")
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = raw[off + y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, off + y * (stride + 1) + 1
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
    return out, h * (stride + 1)


def _png_samples(lines: np.ndarray, w: int, channels: int, depth: int) -> np.ndarray:
    """Defiltered byte rows → (h, w, channels) uint8 samples. 16-bit
    samples keep their high byte; sub-byte depths unpack MSB-first
    (values NOT yet palette-mapped or grayscale-rescaled)."""
    h = lines.shape[0]
    if depth == 8:
        return lines[:, : w * channels].reshape(h, w, channels)
    if depth == 16:
        wide = lines[:, : w * channels * 2].reshape(h, w * channels, 2)
        return wide[:, :, 0].reshape(h, w, channels)  # big-endian high byte
    # depths 1/2/4: single-channel only (gray or palette indices)
    per_byte = 8 // depth
    vals = np.zeros((h, lines.shape[1] * per_byte), dtype=np.uint8)
    mask = (1 << depth) - 1
    for i in range(per_byte):  # MSB-first
        vals[:, i::per_byte] = (lines >> (8 - depth * (i + 1))) & mask
    return vals[:, :w].reshape(h, w, 1)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8 RGB array.

    Supports every core-spec still shape: bit depths 1/2/4/8/16,
    grayscale / truecolor / palette / +alpha (color types 0/2/3/4/6),
    non-interlaced AND Adam7 interlaced, all five scanline filters.
    16-bit samples reduce to their high byte; alpha drops (matching
    the 8-bit truecolor contract). Malformed payloads raise — callers
    fall back to their stub (a bad payload must never fail the task).
    """
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, ihdr, plte = 8, [], None, None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("malformed PNG (missing IHDR/IDAT)")
    w, h, depth, ctype_v, _comp, _filt, interlace = ihdr
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype_v)
    ok_depth = depth in (8, 16) or (depth in (1, 2, 4) and ctype_v in (0, 3))
    if channels is None or not ok_depth or interlace > 1 or w == 0 or h == 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={ctype_v}, "
            f"interlace={interlace}, {w}x{h})"
        )
    if ctype_v == 3 and plte is None:
        raise ValueError("paletted PNG missing PLTE")
    raw = zlib.decompress(b"".join(idat))
    bpp = max(1, channels * depth // 8)

    def stride_of(width: int) -> int:
        return -(-width * channels * depth // 8)

    if interlace == 0:
        lines, _used = _png_defilter(raw, 0, h, stride_of(w), bpp)
        samples = _png_samples(lines, w, channels, depth)
    else:  # Adam7: seven independently filtered sub-images
        samples = np.zeros((h, w, channels), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = -(-(w - x0) // dx) if w > x0 else 0
            ph = -(-(h - y0) // dy) if h > y0 else 0
            if pw == 0 or ph == 0:
                continue
            lines, used = _png_defilter(raw, off, ph, stride_of(pw), bpp)
            off += used
            samples[y0::dy, x0::dx] = _png_samples(lines, pw, channels, depth)

    if ctype_v == 3:  # palette lookup
        idx = samples[:, :, 0]
        if int(idx.max(initial=0)) >= plte.shape[0]:
            raise ValueError("PNG palette index out of range")
        return np.ascontiguousarray(plte[idx])
    if ctype_v == 0 and depth in (1, 2, 4):  # rescale sub-byte gray
        samples = (
            samples.astype(np.uint16) * (255 // ((1 << depth) - 1))
        ).astype(np.uint8)
    px = samples
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
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    return None


def _gif_lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-flavor LZW: codes packed LSB-first, code width grows with
    the dictionary up to 12 bits, CLEAR resets, END stops."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out: list[int] = []
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt GIF LZW stream")
            out.extend(entry)
            if prev is not None:
                table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


def _gif_lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    seq = b""
    for idx in indices.astype(np.uint8).tobytes():
        cand = seq + bytes([idx])
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        table[cand] = next_code
        # width covers codes UP TO next_code (decoder grows its table
        # one entry behind the encoder)
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code == 4096:  # table full: reset
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        seq = bytes([idx])
    if seq:
        emit(table[seq], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


#: GIF interlace pass order: (start row, step)
_GIF_INTERLACE = [(0, 8), (4, 8), (2, 4), (1, 2)]


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes → (h, w, 3) uint8 RGB of the FIRST frame (the
    still-image contract; animation frames after the first are
    skipped). Handles 87a/89a, global/local color tables, LZW with
    resets, and interlaced frames. Transparency renders as the
    palette color (no alpha in the RGB contract)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags = struct.unpack_from("<HHB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += payload[pos] + 1
            pos += 1
        elif block == 0x2C:  # image descriptor
            _left, _top, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if ct is None:
                raise ValueError("GIF frame has no color table")
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos]:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += ln + 1
            pos += 1
            idx = _gif_lzw_decode(bytes(data), mcs)
            if len(idx) < w * h:
                raise ValueError("truncated GIF image data")
            grid = np.array(idx[: w * h], dtype=np.uint8).reshape(h, w)
            if iflags & 0x40:  # interlaced: rows arrive in 4 passes
                de = np.zeros_like(grid)
                src = 0
                for start, step in _GIF_INTERLACE:
                    nrows = len(range(start, h, step))
                    de[start::step] = grid[src : src + nrows]
                    src += nrows
                grid = de
            if int(grid.max(initial=0)) >= ct.shape[0]:
                raise ValueError("GIF palette index out of range")
            return np.ascontiguousarray(ct[grid])
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF carries no image frame")


def encode_gif(pixels: np.ndarray, *, interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB with ≤ 256 distinct colors → GIF89a bytes
    (adaptive palette, real LZW; fixture path — arbitrary-color
    inputs need a quantizer and raise)."""
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if palette.shape[0] > 256:
        raise ValueError("encode_gif needs <= 256 distinct colors (quantize first)")
    bits = max(1, int(palette.shape[0] - 1).bit_length())
    n = 1 << bits
    pal = np.zeros((n, 3), dtype=np.uint8)
    pal[: palette.shape[0]] = palette
    grid = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        grid = np.concatenate(
            [grid[start::step] for start, step in _GIF_INTERLACE]
        )
    mcs = max(2, bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    out.append(mcs)
    data = _gif_lzw_encode(grid.reshape(-1), mcs)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_image_rgb(payload: bytes) -> np.ndarray:
    """Magic-dispatched decode of any supported still-image format →
    (h, w, 3) uint8 RGB. Raises on formats needing PIL (and on JPEG
    variants the decoder rejects — arithmetic coding — so kernel
    callers still stub-fallback per contract)."""
    fmt = image_format(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "png":
        return decode_png(payload)
    if fmt == "gif":
        return decode_gif(payload)
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
    if fmt == "gif":
        return encode_gif(pixels)
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
