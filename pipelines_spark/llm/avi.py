"""MJPEG-in-AVI video container codec — pure stdlib, no libav.

AVI is a RIFF container: a ``hdrl`` LIST carries the main header
(frame timing, dimensions) and per-stream headers; a ``movi`` LIST
carries the frame chunks (``00dc``/``00db`` for stream 0 video). In
the MJPEG flavor every frame chunk is a complete JPEG bitstream —
which llm/jpeg.py decodes for real (baseline AND progressive). This
parser + builder give the engine a genuine video ingest path for the
dominant capture format cameras and test rigs emit, with the same
fixture discipline as the JPEG/HDF5 codecs: decode(build(x))
exercises the reader on spec-compliant bytes. Codecs needing native
libs (H.264/MP4) remain behind the multimodal stub fallback.

Reference behavior generalized: the camera pipeline consumes RTSP
JPEG frames (pipelines/rj_escritorio/flooding_detection/
tasks.py:196-320); MJPEG/AVI is those same frames in their standard
at-rest container.

Spec: the public Microsoft AVI RIFF file reference (avih/strh/strf/
movi/idx1 layout).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field


@dataclass
class AviVideo:
    width: int
    height: int
    usec_per_frame: int  # from avih; 0 if absent
    frames: list[bytes] = field(default_factory=list)

    @property
    def fps(self) -> float:
        return 1e6 / self.usec_per_frame if self.usec_per_frame else 0.0


def parse_avi(buf: bytes) -> AviVideo:
    """AVI bytes → dimensions, timing, and the raw per-frame JPEG
    payloads (stream-0 video chunks ``00dc``/``00db``, in file order).

    Walks the RIFF chunk tree structurally; unknown chunks are
    skipped, so files with extra streams/index/metadata parse fine.
    """
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF) payload")
    out = AviVideo(0, 0, 0)

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = buf[pos : pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if cid == b"LIST":
                walk(body_start + 4, body_end)  # skip the list type tag
            elif cid == b"avih" and size >= 40:
                (out.usec_per_frame,) = struct.unpack_from("<I", buf, body_start)
                out.width, out.height = struct.unpack_from(
                    "<II", buf, body_start + 32
                )
            elif cid[2:] in (b"dc", b"db") and cid[:2] == b"00":
                out.frames.append(buf[body_start:body_end])
            pos = body_start + size + (size & 1)  # chunks pad to even

    walk(12, len(buf))
    if not out.frames:
        raise ValueError("AVI payload carries no stream-0 video frames")
    return out


def build_avi(
    frames: list[bytes], *, width: int, height: int, fps: float = 10.0
) -> bytes:
    """MJPEG frame list → AVI bytes (fixture builder): avih + one
    ``vids``/``MJPG`` stream + movi chunks + idx1 index."""
    # round-ok: container frame-duration metadata, not an oracle value
    usec = int(round(1e6 / fps)) if fps else 0

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\0" * (len(body) & 1))

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        usec, 0, 0, 0x10, len(frames), 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, int(fps) or 1, 0,
                      len(frames), 0, 10000, -1)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_chunks = []
    offsets = []
    off = 4  # relative to the start of the movi list type tag
    for f in frames:
        offsets.append(off)
        c = chunk(b"00dc", f)
        movi_chunks.append(c)
        off += len(c)
    movi = lst(b"movi", b"".join(movi_chunks))
    idx1 = chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, o, len(f))
            for o, f in zip(offsets, frames)
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
