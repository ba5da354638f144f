"""Minimal pure-numpy HDF5 reader/writer for netCDF-4-style rasters.

netCDF-4 files (the real satellite format — reference
pipelines/rj_cor/meteorologia/satelite/satellite_utils.py:481-509)
are HDF5 containers. The sandbox has no h5py/xarray, but the HDF5
on-disk format is publicly specified, and the subset netCDF-4 needs
for flat raster files is parseable with struct + numpy + zlib:

Reader supports: superblock v0/v1/v2/v3, object headers v1 and v2,
old-style symbol-table groups, compact new-style Link messages AND
dense (fractal-heap) group links (root direct block or one level of
indirect block — the write-once packing every netCDF-4 producer
emits), header continuation blocks, dataspace v1/v2 (incl. maxdims /
H5S_UNLIMITED), fixed-point / IEEE-float / fixed-string datatypes
(either byte order), compact / contiguous / chunked layouts with v1
B-tree, single-chunk, implicit, fixed-array (plain AND paged),
extensible-array (incl. super blocks and paged data blocks — the
index libhdf5 emits for one unlimited dimension, i.e. every
appendable time-series netCDF-4), and v2-B-tree (≥2 unlimited dims)
chunk indexes, deflate + shuffle filters (on chunks AND on fractal
heap direct blocks — I/O-filtered dense groups decode built-in),
v1/v2/v3 attribute messages, VARIABLE-LENGTH STRING payloads (GCOL
global heap: vlen datasets under EVERY supported layout including
chunked+filtered — the descriptors ride the same chunk machinery as
numeric data — and vlen attributes scalar or 1-D), and OBJECT
REFERENCES (class 7 scalar/array attributes and the class-9
vlen-of-reference DIMENSION_LIST shape every netCDF-4 variable
carries, resolved to linked dataset names). The remaining long tail
— fragmented fractal heaps (multi-block manual link deletion, which
no write-once producer emits) — raises a clear
``NotImplementedError``; callers fall back to their env-gate message
exactly as before.

Writer exists to build REAL spec-compliant fixtures in an environment
with no other HDF5 producer (same pattern as llm/jpeg.py): superblock
v0, symbol-table root group, v1 object headers, contiguous or
chunked+deflate(+shuffle) datasets under every reader-supported chunk
index, unlimited-dim dataspaces, string/numeric attributes. Read
(write(x)) therefore exercises every reader path on genuine bytes.

Spec: the public "HDF5 File Format Specification" (Version 2.0).
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF


@dataclass
class H5Dataset:
    name: str
    data: np.ndarray
    attrs: dict = field(default_factory=dict)


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------


class _Msg:
    __slots__ = ("mtype", "body")

    def __init__(self, mtype: int, body: bytes) -> None:
        self.mtype = mtype
        self.body = body


def _defilter(raw: bytes, filters, dtype) -> bytes:
    """Run a stored chunk backwards through the filter pipeline."""
    for fid, vals in reversed(filters):
        if fid == 1:
            raw = zlib.decompress(raw)
        elif fid == 2:  # shuffle
            es = vals[0] if vals else dtype.itemsize
            raw = np.frombuffer(raw, np.uint8).reshape(es, -1).T.tobytes()
        else:
            raise NotImplementedError(f"HDF5 filter id {fid}")
    return raw


def _place_chunk(out: np.ndarray, chunk: np.ndarray, coords) -> None:
    """Copy a (possibly edge-overhanging) chunk into the output array."""
    sl_out, sl_in = [], []
    for d in range(out.ndim):
        start = coords[d]
        span = min(chunk.shape[d], out.shape[d] - start)
        if span <= 0:
            return
        sl_out.append(slice(start, start + span))
        sl_in.append(slice(0, span))
    out[tuple(sl_out)] = chunk[tuple(sl_in)]


#: sentinel dtype marker for variable-length strings (class 9 type 1):
#: elements are 16-byte descriptors (u32 length + global heap id =
#: 8-byte collection address + u32 object index) resolved through the
#: GCOL global heap.
VLEN_STR = "vlen_str"

#: sentinel for object-reference payloads (class 7 type 0): each
#: element is an 8-byte object-header address, resolved to the linked
#: dataset's NAME via the group walk's address map.
OBJ_REF = "obj_ref"

#: sentinel for vlen-of-object-reference payloads (class 9 sequence
#: over class 7) — the type of netCDF-4's DIMENSION_LIST attribute,
#: which is how dimension scales attach to every variable.
VLEN_REF = "vlen_ref"


def _parse_datatype(body: bytes) -> tuple[np.dtype | str | None, int]:
    """Datatype message → (numpy dtype | VLEN_STR | OBJ_REF |
    VLEN_REF | None, size)."""
    cls = body[0] & 0x0F
    bits = body[1:4]
    (size,) = struct.unpack_from("<I", body, 4)
    order = ">" if (bits[0] & 1) else "<"
    if cls == 0:  # fixed-point
        signed = "i" if (bits[0] & 0x08) else "u"
        if size in (1, 2, 4, 8):
            return np.dtype(f"{order}{signed}{size}"), size
    elif cls == 1 and size in (2, 4, 8):  # IEEE float
        return np.dtype(f"{order}f{size}"), size
    elif cls == 3:  # fixed-length string
        return np.dtype(f"S{size}"), size
    elif cls == 7 and (bits[0] & 0x0F) == 0:  # object reference
        return OBJ_REF, size
    elif cls == 9 and (bits[0] & 0x0F) == 1:  # variable-length string
        return VLEN_STR, 16
    elif cls == 9 and (bits[0] & 0x0F) == 0:  # vlen sequence
        base, _ = _parse_datatype(body[8:])
        if base == OBJ_REF:
            return VLEN_REF, 16
    return None, size


def _parse_dataspace_max(body: bytes) -> tuple[list[int], list[int] | None]:
    """Dataspace message → (dims, maxdims | None). maxdims entries of
    ``_UNDEF`` mean H5S_UNLIMITED (appendable record dimensions)."""
    ver = body[0]
    rank = body[1]
    flags = body[2]
    if ver == 1:
        off = 8
    elif ver == 2:
        off = 4
    else:
        raise NotImplementedError(f"HDF5 dataspace version {ver}")
    dims = [struct.unpack_from("<Q", body, off + 8 * i)[0] for i in range(rank)]
    maxdims = None
    if flags & 0x01:
        moff = off + 8 * rank
        maxdims = [
            struct.unpack_from("<Q", body, moff + 8 * i)[0] for i in range(rank)
        ]
    return dims, maxdims


def _parse_dataspace(body: bytes) -> list[int]:
    return _parse_dataspace_max(body)[0]


def _parse_attribute(body: bytes, reader=None):
    """Attribute message (v1/v2/v3) → (name, value | None).

    ``reader`` (the owning ``_H5Reader``) is needed to resolve
    variable-length string payloads through the global heap; without
    it vlen attributes come back name-only, as before."""
    ver = body[0]
    if ver not in (1, 2, 3):
        return None, None
    name_size, dt_size, ds_size = struct.unpack_from("<HHH", body, 2)
    off = 8 if ver < 3 else 9  # v3 adds a charset byte
    pad = (lambda n: (n + 7) & ~7) if ver == 1 else (lambda n: n)
    name = body[off : off + name_size].split(b"\0")[0].decode("utf-8", "replace")
    off += pad(name_size)
    dt_body = body[off : off + dt_size]
    shared = ver >= 2 and (body[1] & 0x01)
    off += pad(dt_size)
    ds_body = body[off : off + ds_size]
    off += pad(ds_size)
    if shared:
        return name, None
    try:
        dims = _parse_dataspace(ds_body) if ds_body and ds_body[1] else []
        dtype, size = _parse_datatype(dt_body)
    except (NotImplementedError, struct.error, IndexError):
        return name, None
    if dtype == VLEN_STR:
        n = int(np.prod(dims)) if dims else 1
        raw = body[off : off + n * 16]
        if reader is None or len(raw) < n * 16:
            return name, None
        try:
            vals = reader._vlen_strings(raw, n)
        except (ValueError, struct.error):
            return name, None
        return name, (vals[0] if not dims else np.array(vals).reshape(dims))
    if dtype == OBJ_REF:
        n = int(np.prod(dims)) if dims else 1
        raw = body[off : off + n * 8]
        if reader is None or len(raw) < n * 8:
            return name, None
        names = [
            reader._ref_name(a) for a in struct.unpack(f"<{n}Q", raw)
        ]
        return name, (names[0] if not dims else names)
    if dtype == VLEN_REF:
        n = int(np.prod(dims)) if dims else 1
        raw = body[off : off + n * 16]
        if reader is None or len(raw) < n * 16:
            return name, None
        try:
            vals = reader._vlen_refs(raw, n)
        except (ValueError, struct.error):
            return name, None
        return name, (vals[0] if not dims else vals)
    if dtype is None:
        return name, None  # exotic payloads: name-only
    n = int(np.prod(dims)) if dims else 1
    raw = body[off : off + n * size]
    if len(raw) < n * size:
        return name, None
    arr = np.frombuffer(raw, dtype, n)
    if dtype.kind == "S":
        val = arr[0].split(b"\0")[0].decode("utf-8", "replace") if n else ""
        return name, val
    if not dims:
        return name, arr[0].item()
    return name, arr.reshape(dims)


class _H5Reader:
    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self._names_by_addr: dict[int, str] = {}
        if buf[:8] != _SIG:
            raise ValueError("not an HDF5 file")
        ver = buf[8]
        if ver in (0, 1):
            self.off_size = buf[13]
            self.len_size = buf[14]
            base = 24 if ver == 0 else 28
            # base/fs/eof/driver addresses, then the root symbol entry
            root_entry = base + 4 * 8
            (self.root_addr,) = struct.unpack_from("<Q", buf, root_entry + 8)
        elif ver in (2, 3):
            self.off_size = buf[9]
            self.len_size = buf[10]
            (self.root_addr,) = struct.unpack_from("<Q", buf, 12 + 3 * 8)
        else:
            raise NotImplementedError(f"HDF5 superblock version {ver}")
        if self.off_size != 8 or self.len_size != 8:
            raise NotImplementedError("HDF5 with non-8-byte offsets/lengths")

    # -- object headers ----------------------------------------------------

    def messages(self, addr: int) -> list[_Msg]:
        buf = self.buf
        if buf[addr : addr + 4] == b"OHDR":
            return self._messages_v2(addr)
        ver = buf[addr]
        if ver != 1:
            raise NotImplementedError(f"HDF5 object header version {ver}")
        nmsgs, = struct.unpack_from("<H", buf, addr + 2)
        hdr_size, = struct.unpack_from("<I", buf, addr + 8)
        blocks = [(addr + 16, hdr_size)]
        out: list[_Msg] = []
        bi = 0
        while bi < len(blocks) and len(out) < nmsgs:
            pos, size = blocks[bi]
            end = pos + size
            while pos + 8 <= end and len(out) < nmsgs:
                mtype, msize = struct.unpack_from("<HH", buf, pos)
                body = buf[pos + 8 : pos + 8 + msize]
                pos += 8 + msize
                if mtype == 0x0010:  # continuation
                    o, ln = struct.unpack_from("<QQ", body, 0)
                    blocks.append((o, ln))
                out.append(_Msg(mtype, body))
            bi += 1
        return out

    def _messages_v2(self, addr: int) -> list[_Msg]:
        buf = self.buf
        flags = buf[addr + 5]
        pos = addr + 6
        if flags & 0x20:
            pos += 8  # access/mod/change/birth times
        if flags & 0x10:
            pos += 4  # max compact/dense attrs
        sz_bytes = 1 << (flags & 0x03)
        chunk0 = int.from_bytes(buf[pos : pos + sz_bytes], "little")
        pos += sz_bytes
        blocks = [(pos, chunk0)]
        out: list[_Msg] = []
        bi = 0
        while bi < len(blocks):
            p, size = blocks[bi]
            end = p + size - (4 if bi == 0 else 0)  # trailing checksum space
            while p + 4 <= end:
                mtype = buf[p]
                msize, = struct.unpack_from("<H", buf, p + 1)
                p += 4
                if flags & 0x04:
                    p += 2  # creation order
                if mtype == 0 and msize == 0:
                    break  # gap/NIL padding
                body = buf[p : p + msize]
                p += msize
                if mtype == 0x10:
                    o, ln = struct.unpack_from("<QQ", body, 0)
                    # OCHK-signed block: messages start after signature
                    blocks.append((o + 4, ln - 4))
                out.append(_Msg(mtype, body))
            bi += 1
        return out

    # -- groups ------------------------------------------------------------

    def root_datasets(self) -> dict[str, H5Dataset]:
        return self._group_datasets(self.root_addr)

    def _group_datasets(self, addr: int) -> dict[str, H5Dataset]:
        msgs = self.messages(addr)
        links: list[tuple[str, int]] = []
        for m in msgs:
            if m.mtype == 0x0011:  # symbol table: btree + heap
                bt, heap = struct.unpack_from("<QQ", m.body, 0)
                links.extend(self._walk_group_btree(bt, heap))
            elif m.mtype == 0x0006:  # compact link message
                lk = self._parse_link(m.body)
                if lk is not None:
                    links.append(lk)
            elif m.mtype == 0x0002:  # link info: dense storage?
                fheap = struct.unpack_from("<Q", m.body, 2 + (8 if m.body[1] & 1 else 0))[0]
                if fheap != _UNDEF:
                    links.extend(self._dense_links(fheap))
        # address → name map BEFORE reading datasets, so reference
        # attributes (DIMENSION_LIST et al.) resolve to names even
        # when they point at later-linked objects
        self._names_by_addr.update({a: n for n, a in links})
        out: dict[str, H5Dataset] = {}
        for name, oaddr in links:
            ds = self._read_dataset(name, oaddr)
            if ds is not None:
                out[name] = ds
        return out

    def _parse_link(self, body: bytes) -> tuple[str, int] | None:
        link, _used = self._parse_link_sized(body)
        return link

    def _parse_link_sized(self, body: bytes):
        """Link message body → ((name, obj_addr) | None, bytes consumed).

        The consumed size makes the same parser usable for
        sequentially packed fractal-heap objects (dense groups), where
        link records sit back-to-back with no per-object framing.
        Soft/external links are skipped but still sized."""
        flags = body[1]
        pos = 2
        ltype = 0
        if flags & 0x08:
            ltype = body[pos]
            pos += 1
        if flags & 0x04:
            pos += 8  # creation order
        if flags & 0x10:
            pos += 1  # charset
        nlen_size = 1 << (flags & 0x03)
        nlen = int.from_bytes(body[pos : pos + nlen_size], "little")
        pos += nlen_size
        name = body[pos : pos + nlen].decode("utf-8", "replace")
        pos += nlen
        if ltype == 0:  # hard link: object header address
            (oaddr,) = struct.unpack_from("<Q", body, pos)
            return (name, oaddr), pos + 8
        if ltype in (1, 64):  # soft/external: 2-byte payload length
            (plen,) = struct.unpack_from("<H", body, pos)
            return None, pos + 2 + plen
        return None, 0

    # -- dense (fractal-heap) group links ----------------------------------

    def _dense_links(self, fheap_addr: int) -> list[tuple[str, int]]:
        """Enumerate the link records of a dense group's fractal heap.

        Strategy: walk every direct block (root direct, or the direct
        rows of the root indirect block) and parse the packed link
        messages sequentially, validating the record count against the
        header's managed-object count. Heap objects carry no per-object
        framing, so this relies on the write-once packing that every
        netCDF-4/libhdf5 producer emits (objects allocated front-to-
        back, no deletions); a fragmented heap fails the count check
        and raises rather than misparsing. The name-index v2 B-tree is
        deliberately not consulted — it indexes by name hash for point
        lookup, while scans need full enumeration anyway."""
        buf = self.buf
        if buf[fheap_addr : fheap_addr + 4] != b"FRHP":
            raise ValueError("bad HDF5 fractal heap header")
        filt_len, = struct.unpack_from("<H", buf, fheap_addr + 7)
        flags = buf[fheap_addr + 9]
        (nmanaged,) = struct.unpack_from("<Q", buf, fheap_addr + 14 + 7 * 8)
        (table_width,) = struct.unpack_from("<H", buf, fheap_addr + 110)
        start_size, max_direct = struct.unpack_from("<QQ", buf, fheap_addr + 112)
        (max_heap_bits,) = struct.unpack_from("<H", buf, fheap_addr + 128)
        (root_addr,) = struct.unpack_from("<Q", buf, fheap_addr + 132)
        (cur_rows,) = struct.unpack_from("<H", buf, fheap_addr + 140)
        # I/O-filtered heap: direct blocks are stored through the
        # filter pipeline (whole block, FHDB header included). The
        # optional header tail carries [filtered root size (8) +
        # filter mask (4), only when the ROOT is a direct block]
        # followed by the filter pipeline message.
        filters: list[tuple[int, tuple]] | None = None
        filt_root_size = 0
        if filt_len:
            fpos = fheap_addr + 142
            if cur_rows == 0:
                (filt_root_size,) = struct.unpack_from("<Q", buf, fpos)
                fpos += 12  # + 4-byte filter mask (unused: no fletcher here)
            filters = self._parse_filters(buf[fpos : fpos + filt_len])
        off_size = (max_heap_bits + 7) // 8
        # direct-block header: sig + version + heap-header addr +
        # block offset (+ checksum when FRHP flags bit 1 is set)
        db_hdr = 4 + 1 + 8 + off_size + (4 if flags & 0x02 else 0)

        def row_size(r: int) -> int:
            return start_size if r < 2 else start_size << (r - 1)

        # (addr, logical size, stored size) per direct block; stored ==
        # logical for unfiltered heaps
        dblocks: list[tuple[int, int, int]] = []
        if cur_rows == 0:  # root IS a direct block
            dblocks.append(
                (root_addr, start_size, filt_root_size or start_size)
            )
        else:
            if buf[root_addr : root_addr + 4] != b"FHIB":
                raise ValueError("bad HDF5 fractal heap indirect block")
            pos = root_addr + 4 + 1 + 8 + off_size
            for r in range(cur_rows):
                size = row_size(r)
                if size > max_direct:
                    raise NotImplementedError(
                        "fractal heap with indirect sub-blocks (heap larger "
                        "than the direct-block doubling table)"
                    )
                for _c in range(table_width):
                    (child,) = struct.unpack_from("<Q", buf, pos)
                    pos += 8
                    stored = size
                    if filters is not None:
                        # filtered heaps append (stored size, mask) to
                        # every child direct-block entry
                        (stored,) = struct.unpack_from("<Q", buf, pos)
                        pos += 12
                    if child != _UNDEF:
                        dblocks.append((child, size, stored))

        links: list[tuple[str, int]] = []
        remaining = nmanaged
        for daddr, dsize, stored in dblocks:
            if remaining <= 0:
                break
            data = bytes(buf[daddr : daddr + stored])
            if filters is not None:
                data = _defilter(data, filters, np.dtype("u1"))
            if data[:4] != b"FHDB":
                raise ValueError("bad HDF5 fractal heap direct block")
            pos, end = db_hdr, min(dsize, len(data))
            while remaining > 0 and pos < end and data[pos] == 1:
                link, used = self._parse_link_sized(data[pos:end])
                if used == 0:
                    break
                if link is not None:
                    links.append(link)
                remaining -= 1
                pos += used
        if remaining:
            raise NotImplementedError(
                "fragmented fractal heap: link records are not packed "
                "front-to-back (deleted links?) — needs a full free-space-"
                "manager walk"
            )
        return links

    def _walk_group_btree(self, addr: int, heap_addr: int) -> list[tuple[str, int]]:
        buf = self.buf
        heap_data = self._heap_data(heap_addr)
        out: list[tuple[str, int]] = []

        def walk(node: int) -> None:
            if buf[node : node + 4] == b"SNOD":
                nsyms, = struct.unpack_from("<H", buf, node + 6)
                for i in range(nsyms):
                    e = node + 8 + 40 * i
                    name_off, oaddr = struct.unpack_from("<QQ", buf, e)
                    name = heap_data[name_off:].split(b"\0")[0].decode("utf-8", "replace")
                    out.append((name, oaddr))
                return
            if buf[node : node + 4] != b"TREE":
                raise ValueError("bad HDF5 group B-tree node")
            level = buf[node + 5]
            entries, = struct.unpack_from("<H", buf, node + 6)
            pos = node + 24
            for _ in range(entries):
                pos += 8  # key
                child, = struct.unpack_from("<Q", buf, pos)
                pos += 8
                walk(child)

        walk(addr)
        return out

    def _heap_data(self, addr: int) -> bytes:
        buf = self.buf
        if buf[addr : addr + 4] != b"HEAP":
            raise ValueError("bad HDF5 local heap")
        size, _free, data_addr = struct.unpack_from("<QQQ", buf, addr + 8)
        return buf[data_addr : data_addr + size]

    # -- global heap (vlen payloads) ---------------------------------------

    def _gheap_object(self, coll_addr: int, index: int) -> bytes:
        """Object ``index`` of the GCOL global heap collection at
        ``coll_addr`` — where vlen data lives (each vlen element's
        16-byte descriptor points here)."""
        buf = self.buf
        if buf[coll_addr : coll_addr + 4] != b"GCOL":
            raise ValueError("bad HDF5 global heap collection")
        (size,) = struct.unpack_from("<Q", buf, coll_addr + 8)
        pos, end = coll_addr + 16, coll_addr + size
        while pos + 16 <= end:
            idx, _refc = struct.unpack_from("<HH", buf, pos)
            (osize,) = struct.unpack_from("<Q", buf, pos + 8)
            if idx == 0:  # free-space object terminates the walk
                break
            if idx == index:
                return buf[pos + 16 : pos + 16 + osize]
            pos += 16 + ((osize + 7) & ~7)
        raise ValueError(f"global heap object {index} not found")

    def _vlen_strings(self, raw: bytes, n: int) -> list[str]:
        """Decode ``n`` 16-byte vlen-string descriptors
        (u32 length, 8-byte collection address, u32 heap index)."""
        out = []
        for i in range(n):
            ln, caddr, idx = struct.unpack_from("<IQI", raw, i * 16)
            data = self._gheap_object(caddr, idx)[:ln]
            out.append(data.decode("utf-8", "replace"))
        return out

    def _ref_name(self, addr: int) -> str:
        """Object-header address → linked name (falls back to the hex
        address for objects outside the walked group)."""
        return self._names_by_addr.get(addr, f"@0x{addr:x}")

    def _vlen_refs(self, raw: bytes, n: int) -> list[list[str]]:
        """Decode ``n`` vlen-of-object-reference descriptors (the
        DIMENSION_LIST shape): each heap object holds ``len`` 8-byte
        object addresses, resolved to dataset names."""
        out = []
        for i in range(n):
            ln, caddr, idx = struct.unpack_from("<IQI", raw, i * 16)
            data = self._gheap_object(caddr, idx)[: ln * 8]
            out.append(
                [self._ref_name(a) for a in struct.unpack(f"<{ln}Q", data)]
            )
        return out

    def _read_vlen_str_layout(
        self, body, dims, name, filters=(), unlim_dim=0
    ) -> np.ndarray:
        """Vlen-string dataset payload: compact/contiguous descriptor
        arrays resolve through the global heap directly; CHUNKED vlen
        rides the exact same chunk machinery as numeric data — each
        element is a 16-byte descriptor record (u32 len, 8-byte GCOL
        address, u32 heap index), so the chunk indexes / filter
        pipeline are reused with an opaque 16-byte dtype and only the
        final heap resolution differs."""
        ver, lclass = body[0], body[1]
        n = int(np.prod(dims)) if dims else 1
        if ver in (3, 4) and lclass == 0:  # compact
            (size,) = struct.unpack_from("<H", body, 2)
            raw = body[4 : 4 + size]
        elif ver in (3, 4) and lclass == 1:  # contiguous
            addr, _size = struct.unpack_from("<QQ", body, 2)
            raw = self.buf[addr : addr + n * 16]
        else:  # chunked (any index type the numeric path supports)
            recs = self._read_layout(
                body, dims, np.dtype("V16"), list(filters), name, unlim_dim
            )
            raw = np.ascontiguousarray(recs).tobytes()
        return np.array(self._vlen_strings(raw, n)).reshape(dims)

    # -- datasets ----------------------------------------------------------

    def _read_dataset(self, name: str, addr: int) -> H5Dataset | None:
        msgs = self.messages(addr)
        dtype = dims = layout = None
        maxdims: list[int] | None = None
        filters: list[tuple[int, tuple]] = []
        attrs: dict = {}
        for m in msgs:
            if m.mtype == 0x0001:
                dims, maxdims = _parse_dataspace_max(m.body)
            elif m.mtype == 0x0003:
                dtype, _ = _parse_datatype(m.body)
            elif m.mtype == 0x0008:
                layout = m.body
            elif m.mtype == 0x000B:
                filters = self._parse_filters(m.body)
            elif m.mtype == 0x000C:
                aname, aval = _parse_attribute(m.body, reader=self)
                if aname is not None:
                    attrs[aname] = aval
            elif m.mtype == 0x0011:
                return None  # sub-group, not a dataset (flat files only)
        if layout is None or dims is None:
            return None
        if dtype == VLEN_STR:
            vunlim = [i for i, mx in enumerate(maxdims or []) if mx == _UNDEF]
            return H5Dataset(
                name,
                self._read_vlen_str_layout(
                    layout, dims, name, filters, vunlim[0] if vunlim else 0
                ),
                attrs,
            )
        if dtype is None:
            raise NotImplementedError(f"dataset {name!r}: unsupported HDF5 datatype")
        unlim = [i for i, mx in enumerate(maxdims or []) if mx == _UNDEF]
        unlim_dim = unlim[0] if unlim else 0
        data = self._read_layout(layout, dims, dtype, filters, name, unlim_dim)
        return H5Dataset(name, data, attrs)

    def _parse_filters(self, body: bytes) -> list[tuple[int, tuple]]:
        ver = body[0]
        nf = body[1]
        pos = 8 if ver == 1 else 2
        out = []
        for _ in range(nf):
            fid, nlen, _flags, nvals = struct.unpack_from("<HHHH", body, pos)
            pos += 8
            if ver == 1 or fid >= 256:
                pos += (nlen + 7) & ~7 if ver == 1 else nlen
            vals = struct.unpack_from(f"<{nvals}I", body, pos)
            pos += 4 * nvals
            if ver == 1 and nvals % 2:
                pos += 4
            out.append((fid, vals))
        return out

    def _read_layout(self, body, dims, dtype, filters, name, unlim_dim=0) -> np.ndarray:
        ver = body[0]
        if ver == 4:
            return self._read_layout_v4(body, dims, dtype, filters, name, unlim_dim)
        if ver != 3:
            raise NotImplementedError(f"HDF5 layout message version {ver}")
        lclass = body[1]
        n = int(np.prod(dims)) if dims else 1
        if lclass == 0:  # compact
            (size,) = struct.unpack_from("<H", body, 2)
            return np.frombuffer(body[4 : 4 + size], dtype, n).reshape(dims)
        if lclass == 1:  # contiguous
            addr, _size = struct.unpack_from("<QQ", body, 2)
            itemsize = dtype.itemsize
            raw = self.buf[addr : addr + n * itemsize]
            return np.frombuffer(raw, dtype, n).reshape(dims)
        if lclass == 2:  # chunked, v1 B-tree index
            ndim_p1 = body[2]
            (bt_addr,) = struct.unpack_from("<Q", body, 3)
            chunk_dims = struct.unpack_from(f"<{ndim_p1}I", body, 11)[: ndim_p1 - 1]
            return self._read_chunked(bt_addr, dims, chunk_dims, dtype, filters)
        raise NotImplementedError(f"HDF5 layout class {lclass}")

    def _read_layout_v4(self, body, dims, dtype, filters, name, unlim_dim=0) -> np.ndarray:
        """Version-4 data layout (libhdf5 ≥ 1.10 "latest" format):
        chunked with single-chunk / implicit / fixed-array (plain or
        paged) / extensible-array / v2-B-tree indexes. libhdf5 picks
        the index from the dataspace: fixed shape → single/implicit/
        fixed array; one unlimited dimension (the appendable record
        shape of time-series netCDF-4 — the reference's satellite
        consumer appends along time) → extensible array; ≥2 unlimited
        dimensions → v2 B-tree."""
        lclass = body[1]
        n = int(np.prod(dims)) if dims else 1
        if lclass == 0:  # compact (same encoding as v3)
            (size,) = struct.unpack_from("<H", body, 2)
            return np.frombuffer(body[4 : 4 + size], dtype, n).reshape(dims)
        if lclass == 1:  # contiguous (same encoding as v3)
            addr, _size = struct.unpack_from("<QQ", body, 2)
            raw = self.buf[addr : addr + n * dtype.itemsize]
            return np.frombuffer(raw, dtype, n).reshape(dims)
        if lclass != 2:
            raise NotImplementedError(f"HDF5 v4 layout class {lclass}")
        flags, rank, enc = body[2], body[3], body[4]
        pos = 5
        chunk_dims = tuple(
            int.from_bytes(body[pos + i * enc : pos + (i + 1) * enc], "little")
            for i in range(rank)
        )
        pos += rank * enc
        itype = body[pos]
        pos += 1
        csize_unf = int(np.prod(chunk_dims)) * dtype.itemsize
        if itype == 1:  # single chunk covering the whole dataset
            if flags & 0x02:  # filtered single chunk
                csize, _mask = struct.unpack_from("<QI", body, pos)
                pos += 12
            else:
                csize = None
            (addr,) = struct.unpack_from("<Q", body, pos)
            entries = [(addr, csize)]
        elif itype == 2:  # implicit: dense unfiltered chunk grid
            (addr,) = struct.unpack_from("<Q", body, pos)
            grid = [-(-dims[d] // chunk_dims[d]) for d in range(rank)]
            entries = [
                (addr + i * csize_unf, None)
                for i in range(int(np.prod(grid)) if grid else 1)
            ]
        elif itype == 3:  # fixed array
            pos += 1  # page bits (the header repeats them)
            (addr,) = struct.unpack_from("<Q", body, pos)
            entries = self._fixed_array_entries(addr)
        elif itype == 4:  # extensible array (one unlimited dimension)
            # creation params (max bits, index elmts, min ptrs, min
            # elmts, page bits) — the EAHD header repeats them all
            pos += 5
            (addr,) = struct.unpack_from("<Q", body, pos)
            grid = [-(-dims[d] // chunk_dims[d]) for d in range(rank)]
            entries = self._earray_entries(addr, int(np.prod(grid)) if grid else 1)
        elif itype == 5:  # v2 B-tree (≥2 unlimited dimensions)
            pos += 6  # node size (4) + split % + merge %
            (addr,) = struct.unpack_from("<Q", body, pos)
            return self._place_bt2_chunks(addr, dims, chunk_dims, dtype, filters)
        else:
            raise NotImplementedError(f"HDF5 v4 chunk index type {itype}")
        return self._place_linear_chunks(
            entries, dims, chunk_dims, dtype, filters, unlim_dim
        )

    @staticmethod
    def _decode_index_elmts(buf, pos, n, client, entry_size):
        """Decode ``n`` chunk-index elements at ``pos`` → [(addr,
        stored size | None)]. Shared by fixed-array and extensible-
        array blocks/pages: client 0 elements are bare chunk
        addresses (unfiltered chunks, size = raw chunk size); client
        1 adds the stored (filtered) size and a 4-byte filter mask."""
        out: list[tuple[int, int | None]] = []
        size_len = entry_size - 8 - 4
        for _ in range(n):
            (caddr,) = struct.unpack_from("<Q", buf, pos)
            pos += 8
            if client == 0:
                out.append((caddr, None))
                continue
            csize = int.from_bytes(buf[pos : pos + size_len], "little")
            pos += size_len + 4  # stored size + filter mask
            out.append((caddr, csize))
        return out

    def _fixed_array_entries(self, addr: int) -> list[tuple[int, int | None]]:
        """Fixed-array chunk index → [(chunk addr, stored size | None)]
        in linear (row-major chunk grid) order. ``None`` size means the
        chunk is unfiltered (client 0). Handles both the plain data
        block (elements inline) and the paged layout libhdf5 switches
        to beyond 2^page_bits elements: header + page bitmap +
        checksum, then fixed-stride pages of (elements, checksum)."""
        buf = self.buf
        if buf[addr : addr + 4] != b"FAHD":
            raise ValueError("bad HDF5 fixed-array header")
        client, entry_size, page_bits = buf[addr + 5], buf[addr + 6], buf[addr + 7]
        (nelmts,) = struct.unpack_from("<Q", buf, addr + 8)
        (dblk,) = struct.unpack_from("<Q", buf, addr + 16)
        if buf[dblk : dblk + 4] != b"FADB":
            raise ValueError("bad HDF5 fixed-array data block")
        pos = dblk + 4 + 1 + 1 + 8  # sig, version, client id, header addr
        page_nelmts = 1 << page_bits
        if nelmts <= page_nelmts:
            return self._decode_index_elmts(buf, pos, nelmts, client, entry_size)
        npages = -(-nelmts // page_nelmts)
        pos += (npages + 7) // 8  # page-init bitmap
        pos += 4  # data-block header checksum precedes the pages
        page_stride = page_nelmts * entry_size + 4  # + page checksum
        out: list[tuple[int, int | None]] = []
        for p in range(npages):
            pe = min(page_nelmts, nelmts - p * page_nelmts)
            out.extend(
                self._decode_index_elmts(
                    buf, pos + p * page_stride, pe, client, entry_size
                )
            )
        return out

    # -- extensible array (one unlimited dimension) --------------------------

    def _earray_entries(self, addr: int, nchunks: int) -> list[tuple[int, int | None]]:
        """Extensible-array chunk index → [(chunk addr, size | None)]
        for the first ``nchunks`` linear element slots. Element space,
        per the public spec (III.A.2) / H5EA sizing rules: the first
        ``idx_blk_elmts`` elements live inline in the index block;
        beyond that, super block u (u = 0, 1, …) holds 2^(u//2) data
        blocks of 2^((u+1)//2) × data_blk_min_elmts elements each. The
        data blocks of the first 2·log2(sup_blk_min_data_ptrs) super
        blocks are addressed directly from the index block; later
        super blocks get their own EASB block. Data blocks larger than
        2^max_dblk_page_nelmts_bits elements are paged."""
        buf = self.buf
        if buf[addr : addr + 4] != b"EAHD":
            raise ValueError("bad HDF5 extensible-array header")
        client = buf[addr + 5]
        elmt_size = buf[addr + 6]
        max_nelmts_bits = buf[addr + 7]
        idx_blk_elmts = buf[addr + 8]
        data_blk_min_elmts = buf[addr + 9]
        sup_blk_min_data_ptrs = buf[addr + 10]
        max_dblk_page_nelmts_bits = buf[addr + 11]
        (iblk,) = struct.unpack_from("<Q", buf, addr + 60)
        arr_off_size = (max_nelmts_bits + 7) // 8
        page_nelmts = 1 << max_dblk_page_nelmts_bits
        nsblks_total = 1 + (
            max_nelmts_bits - (data_blk_min_elmts.bit_length() - 1)
        )
        iblk_nsblks = 2 * (sup_blk_min_data_ptrs.bit_length() - 1)
        ndblk_addrs = 2 * (sup_blk_min_data_ptrs - 1)
        nsblk_addrs = nsblks_total - iblk_nsblks
        sblk_ndblks = [1 << (u // 2) for u in range(nsblks_total)]
        sblk_dblk_nelmts = [
            (1 << ((u + 1) // 2)) * data_blk_min_elmts for u in range(nsblks_total)
        ]

        def dblock(a: int, nelmts: int) -> list[tuple[int, int | None]]:
            if a in (0, _UNDEF):
                return [(_UNDEF, None)] * nelmts
            if buf[a : a + 4] != b"EADB":
                raise ValueError("bad HDF5 extensible-array data block")
            pos = a + 4 + 1 + 1 + 8 + arr_off_size  # sig/ver/client/hdr/off
            if nelmts <= page_nelmts:
                return self._decode_index_elmts(buf, pos, nelmts, client, elmt_size)
            pos += 4  # paged: header checksum precedes the pages
            page_stride = page_nelmts * elmt_size + 4
            out: list[tuple[int, int | None]] = []
            for p in range(nelmts // page_nelmts):  # always an exact multiple
                out.extend(
                    self._decode_index_elmts(
                        buf, pos + p * page_stride, page_nelmts, client, elmt_size
                    )
                )
            return out

        if buf[iblk : iblk + 4] != b"EAIB":
            raise ValueError("bad HDF5 extensible-array index block")
        pos = iblk + 4 + 1 + 1 + 8
        entries = self._decode_index_elmts(buf, pos, idx_blk_elmts, client, elmt_size)
        pos += idx_blk_elmts * elmt_size
        dblk_addrs = list(struct.unpack_from(f"<{ndblk_addrs}Q", buf, pos))
        pos += 8 * ndblk_addrs
        sblk_addrs = list(struct.unpack_from(f"<{nsblk_addrs}Q", buf, pos))

        di = 0
        for u in range(iblk_nsblks):
            for _ in range(sblk_ndblks[u]):
                if len(entries) >= nchunks:
                    return entries[:nchunks]
                entries.extend(dblock(dblk_addrs[di], sblk_dblk_nelmts[u]))
                di += 1
        for u in range(iblk_nsblks, nsblks_total):
            if len(entries) >= nchunks:
                break
            sa = sblk_addrs[u - iblk_nsblks]
            dn, nd = sblk_dblk_nelmts[u], sblk_ndblks[u]
            if sa in (0, _UNDEF):
                entries.extend([(_UNDEF, None)] * (dn * nd))
                continue
            if buf[sa : sa + 4] != b"EASB":
                raise ValueError("bad HDF5 extensible-array super block")
            spos = sa + 4 + 1 + 1 + 8 + arr_off_size
            if dn > page_nelmts:  # page-init bitmap for the whole super block
                spos += (nd * (dn // page_nelmts) + 7) // 8
            for i in range(nd):
                (da,) = struct.unpack_from("<Q", buf, spos + 8 * i)
                entries.extend(dblock(da, dn))
        return entries[:nchunks]

    # -- v2 B-tree (two or more unlimited dimensions) -------------------------

    def _place_bt2_chunks(self, addr, dims, chunk_dims, dtype, filters) -> np.ndarray:
        """Assemble chunks indexed by a v2 B-tree. Records carry the
        scaled (grid) chunk coordinates explicitly, so placement
        needs no linearization convention."""
        buf = self.buf
        rank = len(dims)
        if buf[addr : addr + 4] != b"BTHD":
            raise ValueError("bad HDF5 v2 B-tree header")
        btype = buf[addr + 5]
        (node_size,) = struct.unpack_from("<I", buf, addr + 6)
        (rrec_size,) = struct.unpack_from("<H", buf, addr + 10)
        (depth,) = struct.unpack_from("<H", buf, addr + 12)
        (root_addr,) = struct.unpack_from("<Q", buf, addr + 16)
        (root_nrec,) = struct.unpack_from("<H", buf, addr + 24)
        if btype not in (10, 11):  # (un)filtered dataset-chunk records
            raise NotImplementedError(f"HDF5 v2 B-tree record type {btype}")
        filtered = btype == 11
        size_len = rrec_size - 8 - 4 - 8 * rank if filtered else 0

        # node-capacity math (H5B2 sizing): pointer fields in internal
        # nodes are sized to the max record counts their subtrees allow
        enc = lambda n: ((n.bit_length() - 1) // 8) + 1 if n else 1  # noqa: E731
        leaf_max = (node_size - 10) // rrec_size
        max_nrec_size = enc(leaf_max)
        cum_max, cum_max_size = leaf_max, [0]
        for _ in range(depth):
            ptr = 8 + max_nrec_size + cum_max_size[-1]
            imax = (node_size - (10 + ptr)) // (rrec_size + ptr)
            cum_max = (imax + 1) * cum_max + imax
            cum_max_size.append(enc(cum_max))

        out = np.zeros(dims, dtype=dtype)
        csize_unf = int(np.prod(chunk_dims)) * dtype.itemsize

        def place_record(pos: int) -> None:
            (caddr,) = struct.unpack_from("<Q", buf, pos)
            pos += 8
            if filtered:
                csize = int.from_bytes(buf[pos : pos + size_len], "little")
                pos += size_len + 4  # stored size + filter mask
            else:
                csize = None
            scaled = struct.unpack_from(f"<{rank}Q", buf, pos)
            if caddr in (0, _UNDEF):
                return
            raw = buf[caddr : caddr + (csize if csize is not None else csize_unf)]
            if csize is not None:
                raw = _defilter(raw, filters, dtype)
            chunk = np.frombuffer(raw, dtype, int(np.prod(chunk_dims)))
            coords = tuple(scaled[d] * chunk_dims[d] for d in range(rank))
            _place_chunk(out, chunk.reshape(chunk_dims), coords)

        def walk(node: int, nrec: int, level: int) -> None:
            sig = buf[node : node + 4]
            pos = node + 6  # sig + version + type
            if level == 0:
                if sig != b"BTLF":
                    raise ValueError("bad HDF5 v2 B-tree leaf")
                for _ in range(nrec):
                    place_record(pos)
                    pos += rrec_size
                return
            if sig != b"BTIN":
                raise ValueError("bad HDF5 v2 B-tree internal node")
            for _ in range(nrec):
                place_record(pos)
                pos += rrec_size
            ptr_nrec_off = 8
            ptr_size = 8 + max_nrec_size + (cum_max_size[level - 1] if level > 1 else 0)
            for _ in range(nrec + 1):
                (child,) = struct.unpack_from("<Q", buf, pos)
                cn = int.from_bytes(
                    buf[pos + ptr_nrec_off : pos + ptr_nrec_off + max_nrec_size],
                    "little",
                )
                walk(child, cn, level - 1)
                pos += ptr_size

        if root_addr not in (0, _UNDEF):
            walk(root_addr, root_nrec, depth)
        return out

    def _place_linear_chunks(
        self, entries, dims, chunk_dims, dtype, filters, unlim_dim=0
    ) -> np.ndarray:
        """Assemble chunks listed in linear row-major grid order. When
        the unlimited dimension is not dimension 0, the extensible
        array linearizes over *swizzled* coordinates (the unlimited
        dim rotated to the front — H5VM_swizzle_coords) so appends
        stay address-stable; mirror that here."""
        buf = self.buf
        rank = len(dims)
        out = np.zeros(dims, dtype=dtype)
        csize_unf = int(np.prod(chunk_dims)) * dtype.itemsize
        grid = [-(-dims[d] // chunk_dims[d]) for d in range(rank)]
        if unlim_dim > 0:
            perm = [unlim_dim] + [d for d in range(rank) if d != unlim_dim]
            iter_grid = [grid[d] for d in perm]
            unswizzle = lambda idx: tuple(idx[perm.index(d)] for d in range(rank))  # noqa: E731
        else:
            iter_grid = grid
            unswizzle = lambda idx: tuple(idx)  # noqa: E731
        for sw_idx, (caddr, csize) in zip(np.ndindex(*iter_grid), entries):
            if caddr in (0, _UNDEF):
                continue  # chunk never written: stays at fill (zeros)
            idx = unswizzle(sw_idx)
            raw = buf[caddr : caddr + (csize if csize is not None else csize_unf)]
            if csize is not None:
                raw = _defilter(raw, filters, dtype)
            chunk = np.frombuffer(raw, dtype, int(np.prod(chunk_dims)))
            coords = tuple(idx[d] * chunk_dims[d] for d in range(rank))
            _place_chunk(out, chunk.reshape(chunk_dims), coords)
        return out

    def _read_chunked(self, bt_addr, dims, chunk_dims, dtype, filters) -> np.ndarray:
        buf = self.buf
        rank = len(dims)
        out = np.zeros(dims, dtype=dtype)

        def walk(node: int) -> None:
            if buf[node : node + 4] != b"TREE":
                raise ValueError("bad HDF5 chunk B-tree node")
            level = buf[node + 5]
            entries, = struct.unpack_from("<H", buf, node + 6)
            key_size = 8 + 8 * (rank + 1)
            pos = node + 24
            for _ in range(entries):
                csize, _mask = struct.unpack_from("<II", buf, pos)
                coords = struct.unpack_from(f"<{rank}Q", buf, pos + 8)
                pos += key_size
                child, = struct.unpack_from("<Q", buf, pos)
                pos += 8
                if level > 0:
                    walk(child)
                    continue
                raw = _defilter(buf[child : child + csize], filters, dtype)
                chunk = np.frombuffer(raw, dtype, int(np.prod(chunk_dims)))
                _place_chunk(out, chunk.reshape(chunk_dims), coords)

        walk(bt_addr)
        return out


def parse_hdf5(buf: bytes) -> dict[str, H5Dataset]:
    """HDF5 bytes → {name: H5Dataset} for the file's root datasets."""
    return _H5Reader(buf).root_datasets()


# ---------------------------------------------------------------------------
# Writer (fixture generation)
# ---------------------------------------------------------------------------


def _dt_message(dtype: np.dtype) -> bytes:
    dt = np.dtype(dtype)
    if dt.kind in ("i", "u"):
        bits = bytes([0x08 if dt.kind == "i" else 0x00, 0, 0])
        props = struct.pack("<HH", 0, dt.itemsize * 8)
        return bytes([0x10]) + bits + struct.pack("<I", dt.itemsize) + props
    if dt.kind == "f":
        if dt.itemsize == 4:
            props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
        else:
            props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        bits = bytes([0x20, dt.itemsize * 8 - 1, 0])
        return bytes([0x11]) + bits + struct.pack("<I", dt.itemsize) + props
    if dt.kind == "S":
        return bytes([0x13, 0, 0, 0]) + struct.pack("<I", dt.itemsize)
    raise ValueError(f"unsupported dtype {dt}")


def _ds_message(shape: tuple[int, ...], maxshape=None) -> bytes:
    """Dataspace message v1. ``maxshape`` entries of ``None`` encode
    H5S_UNLIMITED — the appendable record dimensions that make
    libhdf5 pick an extensible-array / v2-B-tree chunk index."""
    flags = 1 if maxshape is not None else 0
    body = bytes([1, len(shape), flags]) + b"\0" * 5
    for d in shape:
        body += struct.pack("<Q", d)
    if maxshape is not None:
        for m in maxshape:
            body += struct.pack("<Q", _UNDEF if m is None else m)
    return body


def _attr_message(name: str, value) -> bytes:
    pad8 = lambda b: b + b"\0" * (-len(b) % 8)  # noqa: E731
    nb = name.encode() + b"\0"
    if isinstance(value, str):
        data = value.encode() + b"\0"
        dt = _dt_message(np.dtype(f"S{len(data)}"))
        ds = _ds_message(())
        payload = data
    else:
        arr = np.atleast_1d(np.asarray(value))
        dt = _dt_message(arr.dtype.newbyteorder("<"))
        ds = _ds_message(arr.shape if np.asarray(value).ndim else ())
        payload = arr.astype(arr.dtype.newbyteorder("<")).tobytes()
    body = bytes([1, 0]) + struct.pack("<HHH", len(nb), len(dt), len(ds))
    return body + pad8(nb) + pad8(dt) + pad8(ds) + payload


def _vlen_dt_message() -> bytes:
    """Datatype message for a variable-length string (class 9 v1,
    vlen-type=string, 16-byte descriptors) with an S1 base type."""
    msg = bytes([(1 << 4) | 9, 0x01, 0x00, 0x00]) + struct.pack("<I", 16)
    msg += bytes([(1 << 4) | 3, 0, 0, 0]) + struct.pack("<I", 1)
    return msg


def _write_vlen_gcol(alloc, strings: list[bytes]) -> tuple[int, list[int]]:
    """Write one GCOL global heap collection holding ``strings`` as
    objects 1..n (+ the terminating free-space object); returns
    (collection address, object indexes)."""
    body = bytearray()
    ids: list[int] = []
    for i, s in enumerate(strings, start=1):
        body += struct.pack("<HHIQ", i, 1, 0, len(s))
        body += s + b"\0" * (-len(s) % 8)
        ids.append(i)
    total = 16 + len(body) + 16
    gcol = bytearray(b"GCOL" + bytes([1, 0, 0, 0]) + struct.pack("<Q", total))
    gcol += body
    gcol += struct.pack("<HHIQ", 0, 0, 0, 16)  # free-space object
    return alloc(bytes(gcol)), ids


def _vlen_descriptors(alloc, values: list[str]) -> bytes:
    """GCOL + the 16-byte-per-element descriptor array for ``values``."""
    raw = [v.encode() for v in values]
    gaddr, ids = _write_vlen_gcol(alloc, raw)
    return b"".join(
        struct.pack("<IQI", len(r), gaddr, i) for r, i in zip(raw, ids)
    )


def _vlen_attr_message(name: str, alloc, value) -> bytes:
    """Attribute message (v1) with a vlen-string payload: scalar str
    or list of str; the strings land in a GCOL collection."""
    pad8 = lambda b: b + b"\0" * (-len(b) % 8)  # noqa: E731
    nb = name.encode() + b"\0"
    scalar = isinstance(value, str)
    values = [value] if scalar else list(value)
    payload = _vlen_descriptors(alloc, values)
    dt = _vlen_dt_message()
    ds = _ds_message(() if scalar else (len(values),))
    body = bytes([1, 0]) + struct.pack("<HHH", len(nb), len(dt), len(ds))
    return body + pad8(nb) + pad8(dt) + pad8(ds) + payload


def _ref_dt_message() -> bytes:
    """Datatype message for an object reference (class 7 v1, type 0,
    8-byte object-header address)."""
    return bytes([(1 << 4) | 7, 0, 0, 0]) + struct.pack("<I", 8)


def _vlen_ref_dt_message() -> bytes:
    """Datatype message for vlen-of-object-reference (class 9 v1
    sequence over class 7) — netCDF-4's DIMENSION_LIST type."""
    msg = bytes([(1 << 4) | 9, 0x00, 0x00, 0x00]) + struct.pack("<I", 16)
    return msg + _ref_dt_message()


def _ref_attr_message(name: str, addrs: list[int]) -> bytes:
    """Attribute message (v1) with an object-reference array payload
    (the REFERENCE_LIST / coordinates shape)."""
    pad8 = lambda b: b + b"\0" * (-len(b) % 8)  # noqa: E731
    nb = name.encode() + b"\0"
    dt = _ref_dt_message()
    ds = _ds_message((len(addrs),))
    payload = b"".join(struct.pack("<Q", a) for a in addrs)
    body = bytes([1, 0]) + struct.pack("<HHH", len(nb), len(dt), len(ds))
    return body + pad8(nb) + pad8(dt) + pad8(ds) + payload


def _vlen_ref_attr_message(
    name: str, alloc, addr_lists: list[list[int]]
) -> bytes:
    """Attribute message (v1) with a vlen-of-object-reference payload:
    one heap object of packed 8-byte addresses per element, descriptor
    length = ELEMENT count (not bytes) — the DIMENSION_LIST shape."""
    pad8 = lambda b: b + b"\0" * (-len(b) % 8)  # noqa: E731
    nb = name.encode() + b"\0"
    blobs = [
        b"".join(struct.pack("<Q", a) for a in lst) for lst in addr_lists
    ]
    gaddr, ids = _write_vlen_gcol(alloc, blobs)
    payload = b"".join(
        struct.pack("<IQI", len(lst), gaddr, i)
        for lst, i in zip(addr_lists, ids)
    )
    dt = _vlen_ref_dt_message()
    ds = _ds_message((len(addr_lists),))
    body = bytes([1, 0]) + struct.pack("<HHH", len(nb), len(dt), len(ds))
    return body + pad8(nb) + pad8(dt) + pad8(ds) + payload


def _header_msg(mtype: int, body: bytes) -> bytes:
    body = body + b"\0" * (-len(body) % 8)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _object_header(msgs: list[bytes]) -> bytes:
    data = b"".join(msgs)
    return struct.pack("<BxHII4x", 1, len(msgs), 1, len(data)) + data


def _layout_v4_prefix(flags: int, chunks: tuple[int, ...]) -> bytes:
    body = struct.pack("<BBBBB", 4, 2, flags, len(chunks), 8)
    for c in chunks:
        body += struct.pack("<Q", c)
    return body


def _write_earray(out, alloc, entries, params, filtered) -> int:
    """Emit a spec-faithful extensible-array chunk index (EAHD + EAIB
    + EADB/EASB blocks, paged data blocks included) for ``entries`` =
    [(chunk addr, stored size | None)] in linear element order.
    Returns the EAHD address. Checksums are written as zero (the
    reader does not verify them, same as every other fixture block)."""
    max_bits, iblk_e, sup_min, dblk_min, page_bits = params
    client = 1 if filtered else 0
    elmt_size = 16 if filtered else 8  # addr + 4-byte size + 4-byte mask
    arr_off = (max_bits + 7) // 8
    page = 1 << page_bits
    nsblks_total = 1 + (max_bits - (dblk_min.bit_length() - 1))
    iblk_nsblks = 2 * (sup_min.bit_length() - 1)
    ndblk_addrs = 2 * (sup_min - 1)
    nsblk_addrs = nsblks_total - iblk_nsblks
    sblk_nd = [1 << (u // 2) for u in range(nsblks_total)]
    sblk_dn = [(1 << ((u + 1) // 2)) * dblk_min for u in range(nsblks_total)]
    stats = {"ndblks": 0, "dblk_bytes": 0, "nsblks": 0, "sblk_bytes": 0}

    def enc_elmt(e: tuple[int, int | None]) -> bytes:
        caddr, csize = e
        if not filtered:
            return struct.pack("<Q", caddr)
        return struct.pack("<QII", caddr, csize if csize is not None else 0, 0)

    unset = (_UNDEF, None)

    def take(base: int, n: int):
        return [entries[i] if i < len(entries) else unset for i in range(base, base + n)]

    hdr_addr = alloc(b"\0" * 72)  # EAHD reserved; patched below

    def write_dblock(elms, block_off: int) -> int:
        if all(e[0] == _UNDEF for e in elms):
            return _UNDEF
        body = bytearray(b"EADB" + bytes([0, client]))
        body += struct.pack("<Q", hdr_addr)
        body += block_off.to_bytes(arr_off, "little")
        if len(elms) <= page:
            for e in elms:
                body += enc_elmt(e)
            body += struct.pack("<I", 0)  # checksum
        else:  # paged: header checksum, then full pages (exact multiple)
            body += struct.pack("<I", 0)
            for p in range(len(elms) // page):
                for e in elms[p * page : (p + 1) * page]:
                    body += enc_elmt(e)
                body += struct.pack("<I", 0)  # page checksum
        stats["ndblks"] += 1
        stats["dblk_bytes"] += len(body)
        return alloc(bytes(body))

    base = iblk_e
    dblk_addrs = []
    for u in range(iblk_nsblks):
        for _ in range(sblk_nd[u]):
            a = write_dblock(take(base, sblk_dn[u]), base) if base < len(entries) else _UNDEF
            dblk_addrs.append(a)
            base += sblk_dn[u]
    assert len(dblk_addrs) == ndblk_addrs
    sblk_addrs = []
    for u in range(iblk_nsblks, nsblks_total):
        dn, nd = sblk_dn[u], sblk_nd[u]
        if base >= len(entries):
            sblk_addrs.append(_UNDEF)
            base += dn * nd
            continue
        das = []
        off = base
        for _ in range(nd):
            das.append(write_dblock(take(off, dn), off) if off < len(entries) else _UNDEF)
            off += dn
        sb = bytearray(b"EASB" + bytes([0, client]))
        sb += struct.pack("<Q", hdr_addr)
        sb += base.to_bytes(arr_off, "little")
        if dn > page:  # page-init bitmap for all data blocks in the sblock
            npg = dn // page
            bits = bytearray((nd * npg + 7) // 8)
            for i, a in enumerate(das):
                if a != _UNDEF:
                    for p in range(npg):
                        b = i * npg + p
                        bits[b // 8] |= 1 << (b % 8)
            sb += bytes(bits)
        for a in das:
            sb += struct.pack("<Q", a)
        sb += struct.pack("<I", 0)
        stats["nsblks"] += 1
        stats["sblk_bytes"] += len(sb)
        sblk_addrs.append(alloc(bytes(sb)))
        base += dn * nd

    iblk = bytearray(b"EAIB" + bytes([0, client]))
    iblk += struct.pack("<Q", hdr_addr)
    for e in take(0, iblk_e):
        iblk += enc_elmt(e)
    for a in dblk_addrs:
        iblk += struct.pack("<Q", a)
    for a in sblk_addrs[:nsblk_addrs]:
        iblk += struct.pack("<Q", a)
    iblk += struct.pack("<I", 0)
    iblk_addr = alloc(bytes(iblk))

    hdr = bytearray(
        b"EAHD"
        + bytes([0, client, elmt_size, max_bits, iblk_e, dblk_min, sup_min, page_bits])
    )
    hdr += struct.pack(
        "<QQQQQQ",
        stats["nsblks"],
        stats["sblk_bytes"],
        stats["ndblks"],
        stats["dblk_bytes"],
        len(entries),
        len(entries),
    )
    hdr += struct.pack("<QI", iblk_addr, 0)
    out[hdr_addr : hdr_addr + len(hdr)] = hdr
    return hdr_addr


def _write_bt2(alloc, records, rank, node_size, filtered) -> int:
    """Emit a v2-B-tree chunk index (BTHD + BTLF leaves + BTIN
    internal levels, built bottom-up to whatever depth the node size
    forces) for ``records`` = [(scaled grid coords, chunk addr,
    stored size | None)] in lexicographic scaled order (the tree's
    sort order). Internal child pointers carry the per-level sized
    count fields the reader recomputes (node count always; subtree
    cumulative count from depth 2 up). Returns the BTHD address."""
    size_len = 4
    rrec = 8 + (size_len + 4 if filtered else 0) + 8 * rank
    btype = 11 if filtered else 10

    def enc_rec(r) -> bytes:
        scaled, caddr, csize = r
        b = struct.pack("<Q", caddr)
        if filtered:
            b += (csize or 0).to_bytes(size_len, "little") + struct.pack("<I", 0)
        return b + struct.pack(f"<{rank}Q", *scaled)

    enc = lambda v: ((v.bit_length() - 1) // 8) + 1 if v else 1  # noqa: E731
    leaf_max = (node_size - 10) // rrec
    max_nrec_size = enc(leaf_max)

    def write_leaf(recs) -> int:
        b = bytearray(b"BTLF" + bytes([0, btype]))
        for r in recs:
            b += enc_rec(r)
        b += struct.pack("<I", 0)
        return alloc(bytes(b))

    def split(items, max_per_group):
        """Chunk ``items`` into ≤max_per_group groups separated by
        single promoted items: [g0] s0 [g1] s1 … (B-tree split)."""
        n = len(items)
        ngroups = -(-(n + 1) // (max_per_group + 1))
        in_groups = n - (ngroups - 1)
        base_sz, extra = divmod(in_groups, ngroups)
        groups, seps, i = [], [], 0
        for gi in range(ngroups):
            sz = base_sz + (1 if gi < extra else 0)
            groups.append(items[i : i + sz])
            i += sz
            if gi < ngroups - 1:
                seps.append(items[i])
                i += 1
        return groups, seps

    if len(records) <= leaf_max:
        root, depth, root_nrec = write_leaf(records), 0, len(records)
    else:
        groups, seps = split(records, leaf_max)
        # nodes: (addr, records in node, records in whole subtree)
        nodes = [(write_leaf(g), len(g), len(g)) for g in groups]
        cum_max, cum_max_size = leaf_max, [0]
        level = 1
        while True:
            ptr_size = 8 + max_nrec_size + cum_max_size[level - 1]
            imax = (node_size - (10 + ptr_size)) // (rrec + ptr_size)
            cum_max = (imax + 1) * cum_max + imax
            cum_max_size.append(enc(cum_max))

            def write_internal(in_seps, children) -> tuple[int, int, int]:
                b = bytearray(b"BTIN" + bytes([0, btype]))
                for sr in in_seps:
                    b += enc_rec(sr)
                total = len(in_seps)
                for caddr, cnrec, ctot in children:
                    b += struct.pack("<Q", caddr)
                    b += cnrec.to_bytes(max_nrec_size, "little")
                    if level > 1:  # subtree cumulative count field
                        b += ctot.to_bytes(cum_max_size[level - 1], "little")
                    total += ctot
                b += struct.pack("<I", 0)
                return alloc(bytes(b)), len(in_seps), total

            if len(seps) <= imax:  # everything fits one root at this level
                root, root_nrec, _ = write_internal(seps, nodes)
                depth = level
                break
            # group children into internal nodes of ≤ imax+1 children;
            # the separator between adjacent groups promotes one level
            # up (seps[i] separates nodes[i] and nodes[i+1])
            n_children = len(nodes)
            ngroups = -(-n_children // (imax + 1))
            base_k, extra_k = divmod(n_children, ngroups)
            new_nodes, promoted, ci = [], [], 0
            for gi in range(ngroups):
                k = base_k + (1 if gi < extra_k else 0)
                new_nodes.append(
                    write_internal(seps[ci : ci + k - 1], nodes[ci : ci + k])
                )
                if gi < ngroups - 1:
                    promoted.append(seps[ci + k - 1])
                ci += k
            nodes, seps = new_nodes, promoted
            level += 1
    hdr = (
        b"BTHD"
        + bytes([0, btype])
        + struct.pack("<IHH", node_size, rrec, depth)
        + bytes([100, 40])  # split / merge percent (libhdf5 defaults)
        + struct.pack("<QHQI", root, root_nrec, len(records), 0)
    )
    return alloc(hdr)


def build_hdf5(
    datasets: dict[str, dict],
    *,
    dense_links: bool = False,
    dense_filtered: bool = False,
) -> bytes:
    """Build a flat HDF5 file: ``{name: {"data": ndarray,
    "attrs": {...}, "chunks": tuple | None, "deflate": level | None,
    "shuffle": bool,
    "index": "v1"|"single"|"implicit"|"fixed"|"earray"|"bt2",
    "maxshape": tuple | None}}`` → bytes. v1 object headers,
    little-endian types. ``index`` picks the chunk index: the default
    v1 B-tree (layout message v3, what libhdf5 1.8-compat emits) or
    the layout-v4 indexes of the 1.10+ "latest" format —
    ``"earray"``/``"bt2"`` are what libhdf5 emits for one / several
    unlimited dimensions (mark them with ``None`` in ``maxshape``).
    Knobs for small fixtures that still hit the deep structures:
    ``"earray_params"`` (max bits, index-block elmts, super-block min
    ptrs, data-block min elmts, page bits; default the libhdf5
    defaults ``(32, 4, 4, 16, 10)``), ``"bt2_node_size"`` (default
    2048), ``"fixed_page_bits"`` (default 10; shrink to force the
    paged fixed-array layout). ``dense_links=True`` stores the root
    group's links densely (fractal heap + name-index v2 B-tree)
    instead of a symbol table — the layout libhdf5 switches to beyond
    8 links, i.e. what a real many-variable netCDF-4 file uses;
    ``dense_filtered=True`` additionally runs the heap's direct
    blocks through the deflate I/O filter (H5Pset_link_phase_change +
    filtered-group layout)."""
    out = bytearray(b"\0" * 2048)  # metadata region, fixed prelude

    def alloc(data: bytes, align: int = 8) -> int:
        while len(out) % align:
            out.append(0)
        addr = len(out)
        out.extend(data)
        return addr

    # 1. raw data + per-dataset object headers
    entries: list[tuple[str, int]] = []
    for name in sorted(datasets):  # symbol tables are name-sorted
        spec = datasets[name]
        if spec.get("vstr") and spec.get("chunks") is None:
            # variable-length string dataset: GCOL heap + contiguous
            # 16-byte descriptor array
            values = [str(v) for v in spec["data"]]
            desc = _vlen_descriptors(alloc, values)
            daddr = alloc(desc)
            msgs = [
                _header_msg(0x0001, _ds_message((len(values),))),
                _header_msg(0x0003, _vlen_dt_message()),
                _header_msg(
                    0x0008, struct.pack("<BBQQ", 3, 1, daddr, len(desc))
                ),
            ]
            for aname, aval in spec.get("attrs", {}).items():
                msgs.append(_header_msg(0x000C, _attr_message(aname, aval)))
            for aname, aval in spec.get("vstr_attrs", {}).items():
                msgs.append(
                    _header_msg(0x000C, _vlen_attr_message(aname, alloc, aval))
                )
            entries.append((name, alloc(_object_header(msgs))))
            continue
        if spec.get("vstr"):
            # CHUNKED vlen: the GCOL heap holds the strings, and the
            # 16-byte descriptor records flow through the SAME chunked
            # pipeline (indexes + filters) as numeric data below
            values = [str(v) for v in spec["data"]]
            arr = np.frombuffer(
                _vlen_descriptors(alloc, values), dtype="V16"
            ).copy()
            dt_body = _vlen_dt_message()
        else:
            arr = np.ascontiguousarray(spec["data"])
            arr = arr.astype(arr.dtype.newbyteorder("<")) if arr.dtype.byteorder == ">" else arr
            dt_body = _dt_message(arr.dtype)
        msgs = [
            _header_msg(0x0001, _ds_message(arr.shape, spec.get("maxshape"))),
            _header_msg(0x0003, dt_body),
        ]
        chunks = spec.get("chunks")
        deflate = spec.get("deflate")
        shuffle = spec.get("shuffle", False)
        index = spec.get("index", "v1")
        if chunks is None:
            addr = alloc(arr.tobytes())
            layout = struct.pack("<BBQQ", 3, 1, addr, arr.nbytes)
        else:
            filters = []
            if shuffle:
                filters.append((2, (arr.dtype.itemsize,)))
            if deflate is not None:
                filters.append((1, (int(deflate),)))
            if filters:
                filt = bytes([1, len(filters)]) + b"\0" * 6
                for fid, vals in filters:
                    filt += struct.pack("<HHHH", fid, 0, 1, len(vals))
                    filt += struct.pack(f"<{len(vals)}I", *vals)
                    if len(vals) % 2:
                        filt += b"\0" * 4
                msgs.append(_header_msg(0x000B, filt))
            rank = arr.ndim
            if index == "single":
                chunks = arr.shape  # one chunk covers the dataset
            grid = [-(-arr.shape[d] // chunks[d]) for d in range(rank)]

            def chunk_raw(idx):
                # edge chunks zero-padded to full chunk size
                start = [idx[d] * chunks[d] for d in range(rank)]
                block = np.zeros(chunks, dtype=arr.dtype)
                sl = tuple(
                    slice(start[d], min(start[d] + chunks[d], arr.shape[d]))
                    for d in range(rank)
                )
                ins = tuple(
                    slice(0, sl[d].stop - sl[d].start) for d in range(rank)
                )
                block[ins] = arr[sl]
                raw = block.tobytes()
                if shuffle:
                    es = arr.dtype.itemsize
                    raw = (
                        np.frombuffer(raw, np.uint8).reshape(-1, es).T.tobytes()
                    )
                if deflate is not None:
                    raw = zlib.compress(raw, int(deflate))
                return start, raw

            if index == "v1":
                chunk_entries = []
                for idx in np.ndindex(*grid):
                    start, raw = chunk_raw(idx)
                    chunk_entries.append((len(raw), start, alloc(raw)))
                node = bytearray()
                node += b"TREE" + bytes([1, 0]) + struct.pack("<H", len(chunk_entries))
                node += struct.pack("<QQ", _UNDEF, _UNDEF)
                for csize, start, caddr in chunk_entries:
                    node += struct.pack("<II", csize, 0)
                    node += struct.pack(f"<{rank}Q", *start) + struct.pack("<Q", 0)
                    node += struct.pack("<Q", caddr)
                # trailing key (right-edge sentinel)
                node += struct.pack("<II", 0, 0)
                node += struct.pack(f"<{rank}Q", *arr.shape) + struct.pack("<Q", 0)
                bt_addr = alloc(bytes(node))
                layout = struct.pack("<BBB", 3, 2, rank + 1) + struct.pack("<Q", bt_addr)
                layout += struct.pack(f"<{rank}I", *chunks) + struct.pack(
                    "<I", arr.dtype.itemsize
                )
            elif index == "single":
                _, raw = chunk_raw(tuple(0 for _ in range(rank)))
                caddr = alloc(raw)
                if filters:
                    layout = (
                        _layout_v4_prefix(0x02, chunks)
                        + b"\x01"
                        + struct.pack("<QI", len(raw), 0)
                        + struct.pack("<Q", caddr)
                    )
                else:
                    layout = _layout_v4_prefix(0, chunks) + b"\x01" + struct.pack("<Q", caddr)
            elif index == "implicit":
                if filters:
                    raise ValueError("implicit chunk index cannot carry filters")
                blob = b"".join(chunk_raw(idx)[1] for idx in np.ndindex(*grid))
                base = alloc(blob)
                layout = _layout_v4_prefix(0, chunks) + b"\x02" + struct.pack("<Q", base)
            elif index == "fixed":
                fa_entries = []
                for idx in np.ndindex(*grid):
                    _, raw = chunk_raw(idx)
                    fa_entries.append((alloc(raw), len(raw)))
                client = 1 if filters else 0
                entry_size = 16 if filters else 8
                page_bits = spec.get("fixed_page_bits", 10)
                page = 1 << page_bits
                fahd_addr = alloc(
                    b"FAHD"
                    + bytes([0, client, entry_size, page_bits])
                    + struct.pack("<QQI", len(fa_entries), 0, 0)
                )

                def fa_enc(caddr, csize):
                    b = struct.pack("<Q", caddr)
                    if filters:
                        b += struct.pack("<II", csize, 0)
                    return b

                fadb = bytearray(b"FADB" + bytes([0, client]) + struct.pack("<Q", fahd_addr))
                n = len(fa_entries)
                if n <= page:
                    for caddr, csize in fa_entries:
                        fadb += fa_enc(caddr, csize)
                    fadb += struct.pack("<I", 0)  # checksum
                else:  # paged layout: bitmap + header checksum, then pages
                    npages = -(-n // page)
                    bits = bytearray((npages + 7) // 8)
                    for p in range(npages):
                        bits[p // 8] |= 1 << (p % 8)
                    fadb += bytes(bits)
                    fadb += struct.pack("<I", 0)  # data-block header checksum
                    for p in range(npages):
                        for caddr, csize in fa_entries[p * page : (p + 1) * page]:
                            fadb += fa_enc(caddr, csize)
                        fadb += struct.pack("<I", 0)  # page checksum
                fadb_addr = alloc(bytes(fadb))
                struct.pack_into("<Q", out, fahd_addr + 16, fadb_addr)
                layout = (
                    _layout_v4_prefix(0, chunks)
                    + b"\x03"
                    + bytes([page_bits])
                    + struct.pack("<Q", fahd_addr)
                )
            elif index == "earray":
                params = spec.get("earray_params", (32, 4, 4, 16, 10))
                ms = spec.get("maxshape") or ()
                unl = [i for i, m in enumerate(ms) if m is None]
                unlim_dim = unl[0] if unl else 0
                if unlim_dim > 0:  # H5VM_swizzle_coords linearization
                    perm = [unlim_dim] + [d for d in range(rank) if d != unlim_dim]
                    idx_iter = (
                        tuple(sw[perm.index(d)] for d in range(rank))
                        for sw in np.ndindex(*[grid[d] for d in perm])
                    )
                else:
                    idx_iter = np.ndindex(*grid)
                ea_entries = []
                for idx in idx_iter:
                    _, raw = chunk_raw(idx)
                    ea_entries.append((alloc(raw), len(raw) if filters else None))
                ea_addr = _write_earray(out, alloc, ea_entries, params, bool(filters))
                max_bits, iblk_e, sup_min, dblk_min, page_bits = params
                layout = (
                    _layout_v4_prefix(0, chunks)
                    + b"\x04"
                    + bytes([max_bits, iblk_e, sup_min, dblk_min, page_bits])
                    + struct.pack("<Q", ea_addr)
                )
            elif index == "bt2":
                node_size = spec.get("bt2_node_size", 2048)
                recs = []
                for idx in np.ndindex(*grid):  # lexicographic = tree order
                    _, raw = chunk_raw(idx)
                    recs.append((idx, alloc(raw), len(raw) if filters else None))
                bt_addr = _write_bt2(alloc, recs, rank, node_size, bool(filters))
                layout = (
                    _layout_v4_prefix(0, chunks)
                    + b"\x05"
                    + struct.pack("<I", node_size)
                    + bytes([100, 40])
                    + struct.pack("<Q", bt_addr)
                )
            else:
                raise ValueError(f"unknown chunk index {index!r}")
        msgs.append(_header_msg(0x0008, layout))
        for aname, aval in spec.get("attrs", {}).items():
            msgs.append(_header_msg(0x000C, _attr_message(aname, aval)))
        for aname, aval in spec.get("vstr_attrs", {}).items():
            msgs.append(
                _header_msg(0x000C, _vlen_attr_message(aname, alloc, aval))
            )
        # reference attributes resolve target names against the
        # already-written entries (targets must sort before the
        # referer — the coordinate-variables-first layout every
        # netCDF-4 producer emits)
        written = dict(entries)
        for aname, targets in spec.get("ref_attrs", {}).items():
            msgs.append(
                _header_msg(
                    0x000C,
                    _ref_attr_message(aname, [written[t] for t in targets]),
                )
            )
        for aname, tlists in spec.get("vlen_ref_attrs", {}).items():
            msgs.append(
                _header_msg(
                    0x000C,
                    _vlen_ref_attr_message(
                        aname, alloc, [[written[t] for t in lst] for lst in tlists]
                    ),
                )
            )
        oaddr = alloc(_object_header(msgs))
        entries.append((name, oaddr))

    if dense_links:
        root_addr = _write_dense_root(out, alloc, entries, filtered=dense_filtered)
        cache = struct.pack("<I", 0) + b"\0" * 4 + b"\0" * 16
    else:
        # 2. local heap with link names
        heap_payload = bytearray(b"\0" * 8)
        name_offsets = {}
        for name, _ in entries:
            name_offsets[name] = len(heap_payload)
            heap_payload += name.encode() + b"\0"
            heap_payload += b"\0" * (-len(heap_payload) % 8)
        heap_data_addr = alloc(bytes(heap_payload))
        heap_addr = alloc(
            b"HEAP" + bytes([0, 0, 0, 0])
            + struct.pack("<QQQ", len(heap_payload), _UNDEF, heap_data_addr)
        )

        # 3. SNOD with sorted symbol entries + group B-tree leaf
        snod = bytearray(b"SNOD" + bytes([1, 0]) + struct.pack("<H", len(entries)))
        for name, oaddr in entries:
            snod += struct.pack("<QQ", name_offsets[name], oaddr)
            snod += struct.pack("<I", 0) + b"\0" * 4 + b"\0" * 16
        snod_addr = alloc(bytes(snod))
        btree = b"TREE" + bytes([0, 0]) + struct.pack("<H", 1)
        btree += struct.pack("<QQ", _UNDEF, _UNDEF)
        first_off = name_offsets[entries[0][0]] if entries else 0
        last_off = name_offsets[entries[-1][0]] if entries else 0
        btree += struct.pack("<QQQ", first_off, snod_addr, last_off)
        bt_addr = alloc(btree)

        # 4. root group object header (symbol table message)
        root_addr = alloc(
            _object_header([_header_msg(0x0011, struct.pack("<QQ", bt_addr, heap_addr))])
        )
        cache = struct.pack("<I", 1) + b"\0" * 4 + struct.pack("<QQ", bt_addr, heap_addr)

    # 5. superblock v0 at offset 0
    sb = bytearray()
    sb += _SIG
    sb += bytes([0, 0, 0, 0, 0, 8, 8, 0])
    sb += struct.pack("<HH", 4, 16)  # leaf k, internal k
    sb += struct.pack("<I", 0)  # flags
    sb += struct.pack("<QQQQ", 0, _UNDEF, len(out), _UNDEF)
    # root symbol table entry: name offset 0, header addr, cache
    sb += struct.pack("<QQ", 0, root_addr)
    sb += cache
    out[: len(sb)] = sb
    return bytes(out)


def _write_dense_root(out: bytearray, alloc, entries, *, filtered: bool = False) -> int:
    """Dense root group: link messages packed into fractal-heap direct
    blocks (one block, or a root indirect block over up to two
    doubling-table rows), a structural name-index v2 B-tree (record
    hashes/checksums zeroed — the reader enumerates the heap, it never
    hashes names), and a root object header carrying Link Info + Group
    Info messages. ``filtered=True`` deflate-compresses every direct
    block (whole block, FHDB header included) and emits the
    I/O-filtered heap layout: pipeline message + [filtered root size
    + mask] in the FRHP tail, (addr, stored size, mask) child entries
    in the root indirect block. Returns the root object header
    address."""
    link_msgs = []
    for name, oaddr in entries:
        nb = name.encode()
        # link message v1: flags 0 → 1-byte name length, hard link
        link_msgs.append(bytes([1, 0, len(nb)]) + nb + struct.pack("<Q", oaddr))

    S, W = 512, 4  # starting block size / table width
    db_hdr = 4 + 1 + 8 + 4  # sig + version + heap addr + 32-bit block offset
    blocks: list[list[bytes]] = [[]]
    heap_ids: list[tuple[int, int]] = []  # (heap offset, length) per link
    fill = db_hdr
    for lm in link_msgs:
        if fill + len(lm) > S:
            blocks.append([])
            fill = db_hdr
        heap_ids.append(((len(blocks) - 1) * S + fill, len(lm)))
        blocks[-1].append(lm)
        fill += len(lm)
    if len(blocks) > 2 * W:
        raise ValueError(
            "dense-link fixture exceeds the two-row fractal heap this "
            "writer emits (raise S/W for bigger fixtures)"
        )

    # deflate pipeline message (v2): one filter, id 1, 1 client value
    filt_body = (
        bytes([2, 1]) + struct.pack("<HHHH", 1, 0, 1, 1) + struct.pack("<I", 6)
        if filtered
        else b""
    )

    # FRHP address is embedded in every block — reserve (worst-case
    # tail: filtered-root size + mask + pipeline message), patch later
    frhp_addr = alloc(b"\0" * (146 + (12 + len(filt_body) if filtered else 0)))
    dblock_addrs = []
    stored_sizes = []
    for bi, blk in enumerate(blocks):
        data = (
            b"FHDB" + bytes([0]) + struct.pack("<Q", frhp_addr)
            + struct.pack("<I", bi * S) + b"".join(blk)
        )
        data += b"\0" * (S - len(data))
        if filtered:
            data = zlib.compress(data, 6)
        stored_sizes.append(len(data))
        dblock_addrs.append(alloc(data))
    if len(blocks) == 1:
        heap_root, cur_rows = dblock_addrs[0], 0
    else:
        nrows = -(-len(blocks) // W)
        fhib = bytearray(
            b"FHIB" + bytes([0]) + struct.pack("<Q", frhp_addr) + struct.pack("<I", 0)
        )
        for i in range(nrows * W):
            fhib += struct.pack(
                "<Q", dblock_addrs[i] if i < len(dblock_addrs) else _UNDEF
            )
            if filtered:
                # filtered heaps: child entries carry (stored size, mask)
                fhib += struct.pack(
                    "<QI", stored_sizes[i] if i < len(stored_sizes) else 0, 0
                )
        fhib += struct.pack("<I", 0)  # checksum
        heap_root, cur_rows = alloc(bytes(fhib)), nrows

    managed = S * len(blocks)
    frhp = bytearray()
    frhp += b"FRHP" + bytes([0]) + struct.pack("<HH", 7, len(filt_body)) + bytes([0])
    frhp += struct.pack("<I", 4096)  # max managed object size
    frhp += struct.pack("<QQ", 0, _UNDEF)  # next huge id, huge btree
    frhp += struct.pack("<QQ", 0, _UNDEF)  # free space, fs manager
    frhp += struct.pack("<QQQQ", managed, managed, managed, len(link_msgs))
    frhp += struct.pack("<QQQQ", 0, 0, 0, 0)  # huge/tiny sizes + counts
    frhp += struct.pack("<H", W) + struct.pack("<QQ", S, 4096)
    frhp += struct.pack("<HH", 32, 1)  # max heap size (bits), starting rows
    frhp += struct.pack("<Q", heap_root) + struct.pack("<H", cur_rows)
    if filtered:
        if cur_rows == 0:  # root direct block: filtered size + mask
            frhp += struct.pack("<QI", stored_sizes[0], 0)
        frhp += filt_body
    frhp += struct.pack("<I", 0)  # checksum
    out[frhp_addr : frhp_addr + len(frhp)] = frhp

    # structural name-index v2 B-tree: one leaf, records (hash, heap id)
    btlf = bytearray(b"BTLF" + bytes([0, 5]))
    for hoff, hlen in heap_ids:
        btlf += struct.pack("<I", 0)  # name hash (unread)
        btlf += bytes([0]) + struct.pack("<I", hoff) + struct.pack("<H", hlen)
    btlf += struct.pack("<I", 0)
    btlf_addr = alloc(bytes(btlf))
    bthd = (
        b"BTHD" + bytes([0, 5]) + struct.pack("<I", 512) + struct.pack("<H", 11)
        + struct.pack("<H", 0) + bytes([100, 40]) + struct.pack("<Q", btlf_addr)
        + struct.pack("<H", len(link_msgs)) + struct.pack("<Q", len(link_msgs))
        + struct.pack("<I", 0)
    )
    bthd_addr = alloc(bthd)

    li_body = bytes([0, 0]) + struct.pack("<QQ", frhp_addr, bthd_addr)
    return alloc(
        _object_header(
            [_header_msg(0x0002, li_body), _header_msg(0x000A, bytes([0, 0]))]
        )
    )
