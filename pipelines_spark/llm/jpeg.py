"""JPEG codec — pure numpy + stdlib, no PIL/libjpeg.

Decoder: baseline/extended sequential DCT (SOF0/SOF1) AND progressive
DCT (SOF2 — spectral selection + successive approximation, DC/AC
first and refinement scans, EOB runs), Huffman entropy coding, 8-bit
samples, grayscale or YCbCr, any sampling factors (4:4:4 / 4:2:2 /
4:2:0 / …), restart markers. Arithmetic coding, hierarchical, and
12-bit variants raise — callers fall back to their stub, per the
multimodal contract (one bad payload in a 100 TB corpus must never
fail the task; llm/multimodal.py).

Encoder: exists to make REAL compliant fixtures in an environment
with no other JPEG writer — standard marker stream (SOI, DQT,
SOF0/SOF2, DHT, optional DRI, SOS, EOI), canonical Huffman tables
declared in the file itself, 4:4:4 or 4:2:0 subsampling, optional
restart markers, and a multi-scan progressive mode (DC+AC first
scans at one successive-approximation bit plus full refinement
scans, with cross-block EOB runs and buffered correction bits).
Decode(encode(x)) therefore exercises every decoder path on genuine
bitstreams.

This is a correctness/test-scale codec: the per-block Python loop is
fine for fixture-sized frames inside an Arrow batch; a production
deploy swaps PIL/torchvision into the SAME kernel seam
(llm/multimodal.py:_decode_image) without touching the Spark plumbing.

Reference behavior reproduced: the camera pipeline consumes JPEG RTSP
frames (pipelines/rj_escritorio/flooding_detection/tasks.py:196-320).
"""

from __future__ import annotations

import math
import struct

import numpy as np


def _zigzag() -> np.ndarray:
    """Natural (row*8+col) indices in zigzag scan order."""
    idx = []
    for s in range(15):
        if s % 2 == 0:  # even diagonal: walk up-right (row decreasing)
            rows = range(min(s, 7), max(0, s - 7) - 1, -1)
        else:  # odd diagonal: walk down-left (row increasing)
            rows = range(max(0, s - 7), min(s, 7) + 1)
        idx.extend(r * 8 + (s - r) for r in rows)
    return np.array(idx, dtype=np.int64)


_ZZ = _zigzag()

# Orthonormal DCT-II basis: forward F = C @ f @ C.T, inverse f = C.T @ F @ C
_C = np.array(
    [
        [
            0.5 * (math.sqrt(0.5) if u == 0 else 1.0)
            * math.cos((2 * x + 1) * u * math.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _build_huffman(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman table: {(code_length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over an (already unstuffed) entropy segment."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy data")
        v = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return v

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_sym(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, n: int) -> int:
    """JPEG signed-magnitude EXTEND (F.2.2.1)."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _split_entropy(data: bytes) -> list[bytes]:
    """Unstuff 0xFF00 and split the scan on RST markers; returns one
    bytes segment per restart interval."""
    return _split_entropy_consumed(data)[0]


def _split_entropy_consumed(data: bytes) -> tuple[list[bytes], int]:
    """Like :func:`_split_entropy` but also returns the number of
    input bytes consumed — progressive streams carry several scans, so
    the marker parser must resume right after each one."""
    segs: list[bytearray] = [bytearray()]
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < n else 0xD9
            if nxt == 0x00:
                segs[-1].append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # restart marker
                segs.append(bytearray())
                i += 2
                continue
            break  # next real marker: scan over
        segs[-1].append(b)
        i += 1
    return [bytes(s) for s in segs], i


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG bytes → (h, w, 3) uint8 RGB array (sequential or
    progressive)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    dri = 0
    frame = None
    pixels = None
    progressive = False
    coefs: dict[int, np.ndarray] | None = None
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG (marker length cut off)")
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        pos += seglen
        if marker == 0xDB:  # DQT — may hold several tables
            o = 0
            while o < len(seg):
                prec, tid = seg[o] >> 4, seg[o] & 15
                o += 1
                if prec:
                    tbl = np.frombuffer(seg, ">u2", 64, o).astype(np.int64)
                    o += 128
                else:
                    tbl = np.frombuffer(seg, np.uint8, 64, o).astype(np.int64)
                    o += 64
                qt[tid] = tbl  # zigzag order, as stored
        elif marker == 0xC4:  # DHT — may hold several tables
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 15
                bits = list(seg[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(seg[o + 17 : o + 17 + nv])
                huff[(tc, th)] = _build_huffman(bits, vals)
                o += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential or progressive DCT
            prec, h_img, w_img, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = (h_img, w_img, comps)
            if marker == 0xC2:
                progressive = True
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = -(-w_img // (8 * hmax))
                mcuy = -(-h_img // (8 * vmax))
                # natural-order coefficient accumulators, filled in
                # across however many scans the stream carries
                coefs = {
                    c["id"]: np.zeros(
                        (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32
                    )
                    for c in comps
                }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG coding (lossless/arithmetic/hierarchical)")
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS: entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, td_ta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, (td_ta >> 4, td_ta & 15)))
            if progressive:
                ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
                segments, consumed = _split_entropy_consumed(payload[pos:])
                _progressive_scan(
                    segments, frame, coefs, huff, scan, dri,
                    ss, se, ahal >> 4, ahal & 15,
                )
                pos += consumed
                continue  # more scans may follow
            pixels = _decode_scan(
                payload[pos:], frame, qt, huff, dict(scan), dri
            )
            break
        # other markers (APPn, COM): skipped
    if pixels is None and progressive and coefs is not None:
        pixels = _reconstruct_progressive(frame, coefs, qt)
    if pixels is None:
        raise ValueError("no JPEG scan decoded")
    return pixels


def _decode_scan(data, frame, qt, huff, scan_tables, dri):
    h_img, w_img, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    }
    preds = {c["id"]: 0 for c in comps}
    segments = _split_entropy(data)
    seg_no = 0
    reader = _BitReader(segments[0])
    count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and count and count % dri == 0:
                seg_no += 1
                reader = _BitReader(segments[seg_no])
                preds = {c["id"]: 0 for c in comps}
            count += 1
            for c in comps:
                td, ta = scan_tables[c["id"]]
                dc_t, ac_t = huff[(0, td)], huff[(1, ta)]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = reader.decode_sym(dc_t)
                        preds[c["id"]] += _extend(reader.receive(t), t)
                        zz[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.decode_sym(ac_t)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        nat = np.zeros(64, dtype=np.float64)
                        nat[_ZZ] = (zz * q).astype(np.float64)
                        block = _C.T @ nat.reshape(8, 8) @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = block
    # upsample to full resolution, crop, color-convert
    full = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(p, vmax // c["v"], axis=0)
        p = np.repeat(p, hmax // c["h"], axis=1)
        full.append(p[:h_img, :w_img])
    return _planes_to_rgb(full)


def _planes_to_rgb(full: list[np.ndarray]) -> np.ndarray:
    if len(full) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).round().astype(np.uint8)


# ----------------------------------------------------------------------------
# Progressive (SOF2) scan decoding — ITU T.81 Annex G. Coefficients
# accumulate in natural order across scans; spectral selection splits the
# zigzag band, successive approximation splits bit planes (DC is coded in
# two's complement with arithmetic shifts, AC in sign-magnitude).
# ----------------------------------------------------------------------------


def _progressive_scan(
    segments, frame, coefs, huff, scan, dri, ss, se, ah, al
) -> None:
    # header sanity (T.81 G.1.1.1): DC scans are the 0..0 band, AC
    # scans cover one component only and never include DC
    if (ss == 0) != (se == 0) or se > 63 or (ss > 0 and len(scan) != 1):
        raise ValueError("invalid progressive scan header")
    h_img, w_img, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))
    byid = {c["id"]: c for c in comps}
    scomps = [byid[cs] for cs, _ in scan]
    tables = dict(scan)

    def units():
        """Yield one restart-countable unit per iteration: an MCU's
        blocks (interleaved scans) or a single block in component
        raster order (single-component scans, which iterate the
        component's own block grid, not the MCU grid — T.81 A.2.2)."""
        if len(scomps) > 1:
            for my in range(mcuy):
                for mx in range(mcux):
                    yield [
                        (c, my * c["v"] + by, mx * c["h"] + bx)
                        for c in scomps
                        for by in range(c["v"])
                        for bx in range(c["h"])
                    ]
        else:
            c = scomps[0]
            bw = -(-(-(-w_img * c["h"] // hmax)) // 8)
            bh = -(-(-(-h_img * c["v"] // vmax)) // 8)
            for by in range(bh):
                for bx in range(bw):
                    yield [(c, by, bx)]

    seg_no = 0
    reader = _BitReader(segments[0])
    preds = {c["id"]: 0 for c in scomps}
    eobrun = 0
    count = 0
    for unit in units():
        if dri and count and count % dri == 0:
            seg_no += 1
            reader = _BitReader(segments[seg_no])
            preds = {c["id"]: 0 for c in scomps}
            eobrun = 0
        count += 1
        for c, by, bx in unit:
            blk = coefs[c["id"]][by, bx]
            td, ta = tables[c["id"]]
            if ss == 0:
                if ah == 0:  # DC first
                    t = reader.decode_sym(huff[(0, td)])
                    preds[c["id"]] += _extend(reader.receive(t), t)
                    blk[0] = preds[c["id"]] << al
                elif reader.read_bit():  # DC refinement: one bit/block
                    blk[0] |= 1 << al
            elif ah == 0:
                eobrun = _ac_first(reader, blk, huff[(1, ta)], ss, se, al, eobrun)
            else:
                eobrun = _ac_refine(reader, blk, huff[(1, ta)], ss, se, al, eobrun)


def _ac_first(reader, blk, ac_t, ss, se, al, eobrun) -> int:
    """AC first scan for one block (T.81 G.1.2.2 / libjpeg
    decode_mcu_AC_first shape). Returns the updated EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_sym(ac_t)
        r, s = rs >> 4, rs & 15
        if s:
            k += r
            if k > se:
                raise ValueError("JPEG AC index overflow")
            blk[_ZZ[k]] = _extend(reader.receive(s), s) << al
            k += 1
        else:
            if r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.receive(r)
                return eobrun - 1  # this block is the first of the run
            k += 16  # ZRL
    return 0


def _ac_refine(reader, blk, ac_t, ss, se, al, eobrun) -> int:
    """AC refinement scan for one block (T.81 G.1.2.3 / libjpeg
    decode_mcu_AC_refine shape): newly nonzero coefficients arrive as
    ±1<<al; every already-nonzero coefficient traversed consumes a
    correction bit. Returns the updated EOB run."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_sym(ac_t)
            r, s = rs >> 4, rs & 15
            val = 0
            if s:
                if s != 1:
                    raise ValueError("invalid AC refinement symbol")
                val = p1 if reader.read_bit() else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.receive(r)
                break
            # advance past r zero-history coefficients, correcting
            # nonzero-history ones along the way
            while k <= se:
                i = _ZZ[k]
                if blk[i] != 0:
                    if reader.read_bit() and (blk[i] & p1) == 0:
                        blk[i] += p1 if blk[i] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[_ZZ[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            i = _ZZ[k]
            if blk[i] != 0 and reader.read_bit() and (blk[i] & p1) == 0:
                blk[i] += p1 if blk[i] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_progressive(frame, coefs, qt) -> np.ndarray:
    """Dequantize + IDCT the accumulated coefficient planes (one
    vectorized einsum per component — no per-block Python loop)."""
    h_img, w_img, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for c in comps:
        qnat = np.zeros(64, dtype=np.int64)
        qnat[_ZZ] = qt[c["tq"]]
        blocks = coefs[c["id"]].astype(np.float64) * qnat
        nby, nbx = blocks.shape[:2]
        b8 = blocks.reshape(nby, nbx, 8, 8)
        spatial = np.einsum("ij,abjk,kl->abil", _C.T, b8, _C) + 128.0
        p = spatial.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        p = np.repeat(p, vmax // c["v"], axis=0)
        p = np.repeat(p, hmax // c["h"], axis=1)
        full.append(p[:h_img, :w_img])
    return _planes_to_rgb(full)


# ----------------------------------------------------------------------------
# Encoder (fixture generation — any canonical Huffman table is legal JPEG, so
# the tables are declared inline rather than transcribing Annex K)
# ----------------------------------------------------------------------------

# 12 DC categories, all 5-bit codes; 162 AC run/size symbols, all 8-bit codes
_DC_BITS = [0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_VALS = [0x00] + [(r << 4) | s for r in range(16) for s in range(1, 11)] + [0xF0]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _encode_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code_length, code) for the canonical table."""
    dec = _build_huffman(bits, vals)
    return {sym: lc for lc, sym in dec.items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill, per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(
    writer, block: np.ndarray, q: np.ndarray, pred: int, dc_codes, ac_codes
) -> int:
    coef = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    zz = np.round(coef.reshape(64)[_ZZ] / q).astype(np.int64)
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    length, code = dc_codes[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s = _category(v)
        length, code = ac_codes[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        length, code = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return dc


def encode_jpeg(
    pixels: np.ndarray,
    *,
    quant: int = 8,
    subsampling: str = "420",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF JPEG bytes.

    ``quant`` is a flat quantization step (1 = near-lossless);
    ``subsampling`` is '444' or '420'; ``restart_interval`` > 0 emits
    DRI + RSTn markers every that-many MCUs (exercises the decoder's
    restart path)."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h_img, w_img, _ = pixels.shape
    px = pixels.astype(np.float64)
    y = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    cb = 128.0 - 0.168736 * px[:, :, 0] - 0.331264 * px[:, :, 1] + 0.5 * px[:, :, 2]
    cr = 128.0 + 0.5 * px[:, :, 0] - 0.418688 * px[:, :, 1] - 0.081312 * px[:, :, 2]

    sub = 2 if subsampling == "420" else 1
    mcu = 8 * sub
    pad_h = (-h_img) % mcu
    pad_w = (-w_img) % mcu
    y, cb, cr = (
        np.pad(p, ((0, pad_h), (0, pad_w)), mode="edge") for p in (y, cb, cr)
    )
    if sub == 2:  # chroma = 2x2 mean
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))

    qtab = np.full(64, quant, dtype=np.int64)
    dc_codes = _encode_codes(_DC_BITS, _DC_VALS)
    ac_codes = _encode_codes(_AC_BITS, _AC_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid in (0, 1):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(qtab.astype(np.uint8))
    comps_hv = [(1, sub), (2, 1), (3, 1)]  # (id, sampling)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * 3, 8, h_img, w_img, 3)
    for cid, s in comps_hv:
        out += struct.pack(">BBB", cid, (s << 4) | s, 0 if cid == 1 else 1)
    for tc in (0, 1):
        bits, vals = (_DC_BITS, _DC_VALS) if tc == 0 else (_AC_BITS, _AC_VALS)
        for th in (0, 1):
            out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (tc << 4) | th)
            out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * 3, 3)
    for cid, _s in comps_hv:
        out += struct.pack(">BB", cid, 0x00 if cid == 1 else 0x11)
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl for sequential

    writer = _BitWriter()
    preds = {1: 0, 2: 0, 3: 0}
    mcux = y.shape[1] // mcu
    mcuy = y.shape[0] // mcu
    count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and count and count % restart_interval == 0:
                writer.flush()
                out += writer.out
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                writer = _BitWriter()
                preds = {1: 0, 2: 0, 3: 0}
            count += 1
            for by in range(sub):
                for bx in range(sub):
                    blk = y[
                        (my * sub + by) * 8 : (my * sub + by) * 8 + 8,
                        (mx * sub + bx) * 8 : (mx * sub + bx) * 8 + 8,
                    ]
                    preds[1] = _encode_block(writer, blk, qtab, preds[1], dc_codes, ac_codes)
            for cid, plane in ((2, cb), (3, cr)):
                blk = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                preds[cid] = _encode_block(writer, blk, qtab, preds[cid], dc_codes, ac_codes)
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ----------------------------------------------------------------------------
# Progressive encoder (fixture generation). Scan script: DC first (Al=1,
# interleaved) → per-component AC first scans (Al=1, split spectral bands
# for Y) → DC refinement → per-component AC refinement — every Annex G
# decode path (spectral selection, successive approximation, EOB runs,
# buffered correction bits) on one bitstream, refined to full precision so
# the decode is bit-identical to the sequential encoding's.
# ----------------------------------------------------------------------------

#: progressive AC alphabet additionally needs the EOBn symbols (r<<4)|0
_AC_VALS_PROG = [(r << 4) | s for r in range(16) for s in range(11)]
_AC_BITS_PROG = [0, 0, 0, 0, 0, 0, 0, len(_AC_VALS_PROG), 0, 0, 0, 0, 0, 0, 0, 0]


def _component_coefficients(pixels: np.ndarray, quant: int, subsampling: str):
    """RGB → per-component quantized DCT coefficient grids in zigzag
    order: ``[(cid, sampling, (by, bx, 64) int array)]`` plus the flat
    quant table. Shares the color/subsample math of ``encode_jpeg``."""
    h_img, w_img, _ = pixels.shape
    px = pixels.astype(np.float64)
    y = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    cb = 128.0 - 0.168736 * px[:, :, 0] - 0.331264 * px[:, :, 1] + 0.5 * px[:, :, 2]
    cr = 128.0 + 0.5 * px[:, :, 0] - 0.418688 * px[:, :, 1] - 0.081312 * px[:, :, 2]
    sub = 2 if subsampling == "420" else 1
    mcu = 8 * sub
    pad_h = (-h_img) % mcu
    pad_w = (-w_img) % mcu
    y, cb, cr = (
        np.pad(p, ((0, pad_h), (0, pad_w)), mode="edge") for p in (y, cb, cr)
    )
    if sub == 2:
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))
    qtab = np.full(64, quant, dtype=np.int64)
    comps = []
    for cid, s, plane in ((1, sub, y), (2, 1, cb), (3, 1, cr)):
        nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
        b8 = (plane - 128.0).reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ij,abjk,kl->abil", _C, b8, _C.T)
        zz = np.round(coef.reshape(nby, nbx, 64)[:, :, _ZZ] / qtab)
        comps.append((cid, s, zz.astype(np.int64)))
    return h_img, w_img, comps, qtab


class _ScanWriter(_BitWriter):
    """Bit writer with EOB-run + buffered-correction-bit bookkeeping
    (the cross-block state of T.81 G.1.2.2/G.1.2.3). TWO bit buffers,
    as in the reference refinement coder: ``run_bits`` holds the
    correction bits of blocks already folded into the pending EOB run
    (the decoder consumes them while replaying those blocks' bands
    right after the EOB symbol), while ``bbuf`` holds the current
    block's bits since its last symbol (the decoder consumes them
    while traversing toward the NEXT symbol, so they flush after it)."""

    def __init__(self, ac_codes) -> None:
        super().__init__()
        self.ac_codes = ac_codes
        self.eobrun = 0
        self.run_bits: list[int] = []
        self.bbuf: list[int] = []

    def emit_pending_bits(self) -> None:
        for b in self.bbuf:
            self.write(b, 1)
        self.bbuf = []

    def emit_eobrun(self) -> None:
        if self.eobrun:
            nbits = self.eobrun.bit_length() - 1
            length, code = self.ac_codes[nbits << 4]
            self.write(code, length)
            if nbits:
                self.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
            for b in self.run_bits:
                self.write(b, 1)
            self.run_bits = []

    def end_block(self, trailing_run: int) -> None:
        """Fold a block that ends in zeros (or trailing correction
        bits) into the pending EOB run."""
        if trailing_run or self.bbuf:
            self.eobrun += 1
            self.run_bits.extend(self.bbuf)
            self.bbuf = []
            if self.eobrun == 0x7FFF:
                self.emit_eobrun()


def encode_jpeg_progressive(
    pixels: np.ndarray,
    *,
    quant: int = 8,
    subsampling: str = "420",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB → progressive (SOF2) JPEG bytes, refined to
    full precision (decodes bit-identically to the sequential encoding
    at the same quant/subsampling). ``restart_interval`` > 0 emits DRI
    + RSTn markers every that-many MCUs/blocks in EVERY scan (the
    restart unit is the MCU for interleaved DC scans and the block for
    single-component AC scans, per T.81), resetting DC predictors and
    EOB-run state at each boundary."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h_img, w_img, comps, qtab = _component_coefficients(pixels, quant, subsampling)
    dc_codes = _encode_codes(_DC_BITS, _DC_VALS)
    ac_codes = _encode_codes(_AC_BITS_PROG, _AC_VALS_PROG)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid in (0, 1):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(qtab.astype(np.uint8))
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * 3, 8, h_img, w_img, 3)
    for cid, s, _zz in comps:
        out += struct.pack(">BBB", cid, (s << 4) | s, 0 if cid == 1 else 1)
    for tc in (0, 1):
        bits, vals = (_DC_BITS, _DC_VALS) if tc == 0 else (_AC_BITS_PROG, _AC_VALS_PROG)
        for th in (0, 1):
            out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (tc << 4) | th)
            out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def sos(scan_comps, ss, se, ah, al, body: bytes) -> None:
        out.extend(b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(scan_comps), len(scan_comps)))
        for cid in scan_comps:
            out.extend(struct.pack(">BB", cid, 0x00 if cid == 1 else 0x11))
        out.extend(bytes([ss, se, (ah << 4) | al]))
        out.extend(body)

    # --- scan 1: DC first, interleaved, Al=1 ---------------------------
    parts: list[bytes] = []
    w = _BitWriter()
    preds = {cid: 0 for cid, _s, _zz in comps}
    sub = comps[0][1]
    mcuy = comps[1][2].shape[0]  # chroma block grid == MCU grid
    mcux = comps[1][2].shape[1]
    rst = count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and count and count % restart_interval == 0:
                w.flush()
                parts.append(bytes(w.out))
                parts.append(bytes([0xFF, 0xD0 + (rst % 8)]))
                rst += 1
                w = _BitWriter()
                preds = {cid: 0 for cid, _s, _zz in comps}
            count += 1
            for cid, s, zz in comps:
                for by in range(s):
                    for bx in range(s):
                        temp = int(zz[my * s + by, mx * s + bx, 0]) >> 1
                        diff = temp - preds[cid]
                        preds[cid] = temp
                        cat = _category(diff)
                        length, code = dc_codes[cat]
                        w.write(code, length)
                        if cat:
                            w.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    w.flush()
    parts.append(bytes(w.out))
    sos([1, 2, 3], 0, 0, 0, 1, b"".join(parts))

    # --- AC first scans, Al=1 (Y split into two spectral bands) --------
    # Non-interleaved scans cover ceil(component_size/8) data units
    # (T.81 A.2.2), NOT the MCU-padded grid — padding blocks carry DC
    # only (from the interleaved DC scans) and are cropped away.
    def scan_grid(s):
        comp_h = -(-h_img * s // sub)
        comp_w = -(-w_img * s // sub)
        return -(-comp_h // 8), -(-comp_w // 8)

    for cid, bands in ((1, [(1, 5), (6, 63)]), (2, [(1, 63)]), (3, [(1, 63)])):
        cs, zz = next((s, z) for c, s, z in comps if c == cid)
        bh, bw = scan_grid(cs)
        for ss, se in bands:
            w = _ScanWriter(ac_codes)
            parts = []
            rst = count = 0
            for by in range(bh):
                for bx in range(bw):
                    if restart_interval and count and count % restart_interval == 0:
                        w.emit_eobrun()
                        w.flush()
                        parts.append(bytes(w.out))
                        parts.append(bytes([0xFF, 0xD0 + (rst % 8)]))
                        rst += 1
                        w = _ScanWriter(ac_codes)
                    count += 1
                    blk = zz[by, bx]
                    run = 0
                    for k in range(ss, se + 1):
                        v = int(blk[k])
                        mag = abs(v) >> 1
                        if mag == 0:
                            run += 1
                            continue
                        w.emit_eobrun()
                        while run > 15:
                            length, code = ac_codes[0xF0]
                            w.write(code, length)
                            run -= 16
                        cat = mag.bit_length()
                        length, code = ac_codes[(run << 4) | cat]
                        w.write(code, length)
                        val = mag if v > 0 else -mag
                        w.write(val if val >= 0 else val + (1 << cat) - 1, cat)
                        run = 0
                    w.end_block(run)
            w.emit_eobrun()
            w.flush()
            parts.append(bytes(w.out))
            sos([cid], ss, se, 0, 1, b"".join(parts))

    # --- DC refinement, interleaved, Ah=1 Al=0 -------------------------
    w = _BitWriter()
    parts = []
    rst = count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and count and count % restart_interval == 0:
                w.flush()
                parts.append(bytes(w.out))
                parts.append(bytes([0xFF, 0xD0 + (rst % 8)]))
                rst += 1
                w = _BitWriter()
            count += 1
            for cid, s, zz in comps:
                for by in range(s):
                    for bx in range(s):
                        w.write(int(zz[my * s + by, mx * s + bx, 0]) & 1, 1)
    w.flush()
    parts.append(bytes(w.out))
    sos([1, 2, 3], 0, 0, 1, 0, b"".join(parts))

    # --- AC refinement scans, Ah=1 Al=0 --------------------------------
    for cid, cs, zz in comps:
        bh, bw = scan_grid(cs)
        w = _ScanWriter(ac_codes)
        parts = []
        rst = count = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and count and count % restart_interval == 0:
                    w.emit_eobrun()
                    w.flush()
                    parts.append(bytes(w.out))
                    parts.append(bytes([0xFF, 0xD0 + (rst % 8)]))
                    rst += 1
                    w = _ScanWriter(ac_codes)
                count += 1
                blk = zz[by, bx]
                absb = [abs(int(blk[k])) for k in range(64)]
                # last NEWLY nonzero coefficient in the band
                eob = 0
                for k in range(1, 64):
                    if absb[k] == 1:
                        eob = k
                run = 0
                for k in range(1, 64):
                    mag = absb[k]
                    if mag == 0:
                        run += 1
                        continue
                    while run > 15 and k <= eob:
                        w.emit_eobrun()
                        length, code = ac_codes[0xF0]
                        w.write(code, length)
                        run -= 16
                        w.emit_pending_bits()
                    if mag > 1:
                        # history-nonzero: correction bit, run untouched
                        w.bbuf.append(mag & 1)
                        continue
                    w.emit_eobrun()
                    length, code = ac_codes[(run << 4) | 1]
                    w.write(code, length)
                    w.write(1 if int(blk[k]) > 0 else 0, 1)
                    w.emit_pending_bits()
                    run = 0
                w.end_block(run)
        w.emit_eobrun()
        w.flush()
        parts.append(bytes(w.out))
        sos([cid], 1, 63, 1, 0, b"".join(parts))

    out += b"\xff\xd9"
    return bytes(out)
