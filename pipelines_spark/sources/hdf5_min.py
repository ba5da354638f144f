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
emits), header continuation blocks, dataspace v1/v2, fixed-point /
IEEE-float / fixed-string datatypes (either byte order), compact /
contiguous / chunked layouts with v1 B-tree, single-chunk, implicit,
and fixed-array (v4) chunk indexes, deflate + shuffle filters, and
v1/v2/v3 attribute messages. The remaining long tail —
extensible-array / v2-B-tree chunk indexes (libhdf5 only emits them
for unlimited dimensions), paged fixed arrays, filtered or
fragmented fractal heaps, vlen/reference attribute payloads — raises
a clear ``NotImplementedError``; callers fall back to their env-gate
message exactly as before.

Writer exists to build REAL spec-compliant fixtures in an environment
with no other HDF5 producer (same pattern as llm/jpeg.py): superblock
v0, symbol-table root group, v1 object headers, contiguous or
chunked+deflate(+shuffle) datasets, string/numeric attributes. Read
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


def _parse_datatype(body: bytes) -> tuple[np.dtype | None, int]:
    """Datatype message → (numpy dtype | None if unsupported, size)."""
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
    return None, size


def _parse_dataspace(body: bytes) -> list[int]:
    ver = body[0]
    rank = body[1]
    if ver == 1:
        off = 8
        return [struct.unpack_from("<Q", body, off + 8 * i)[0] for i in range(rank)]
    if ver == 2:
        off = 4
        return [struct.unpack_from("<Q", body, off + 8 * i)[0] for i in range(rank)]
    raise NotImplementedError(f"HDF5 dataspace version {ver}")


def _parse_attribute(body: bytes):
    """Attribute message (v1/v2/v3) → (name, value | None)."""
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
    if dtype is None:
        return name, None  # vlen/reference payloads: name-only
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
        if filt_len:
            raise NotImplementedError("filtered fractal heap (group links)")
        (nmanaged,) = struct.unpack_from("<Q", buf, fheap_addr + 14 + 7 * 8)
        (table_width,) = struct.unpack_from("<H", buf, fheap_addr + 110)
        start_size, max_direct = struct.unpack_from("<QQ", buf, fheap_addr + 112)
        (max_heap_bits,) = struct.unpack_from("<H", buf, fheap_addr + 128)
        (root_addr,) = struct.unpack_from("<Q", buf, fheap_addr + 132)
        (cur_rows,) = struct.unpack_from("<H", buf, fheap_addr + 140)
        off_size = (max_heap_bits + 7) // 8
        # direct-block header: sig + version + heap-header addr +
        # block offset (+ checksum when FRHP flags bit 1 is set)
        db_hdr = 4 + 1 + 8 + off_size + (4 if flags & 0x02 else 0)

        def row_size(r: int) -> int:
            return start_size if r < 2 else start_size << (r - 1)

        dblocks: list[tuple[int, int]] = []
        if cur_rows == 0:  # root IS a direct block
            dblocks.append((root_addr, start_size))
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
                    if child != _UNDEF:
                        dblocks.append((child, size))

        links: list[tuple[str, int]] = []
        remaining = nmanaged
        for daddr, dsize in dblocks:
            if remaining <= 0:
                break
            if buf[daddr : daddr + 4] != b"FHDB":
                raise ValueError("bad HDF5 fractal heap direct block")
            pos, end = daddr + db_hdr, daddr + dsize
            while remaining > 0 and pos < end and buf[pos] == 1:
                link, used = self._parse_link_sized(buf[pos:end])
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

    # -- datasets ----------------------------------------------------------

    def _read_dataset(self, name: str, addr: int) -> H5Dataset | None:
        msgs = self.messages(addr)
        dtype = dims = layout = None
        filters: list[tuple[int, tuple]] = []
        attrs: dict = {}
        for m in msgs:
            if m.mtype == 0x0001:
                dims = _parse_dataspace(m.body)
            elif m.mtype == 0x0003:
                dtype, _ = _parse_datatype(m.body)
            elif m.mtype == 0x0008:
                layout = m.body
            elif m.mtype == 0x000B:
                filters = self._parse_filters(m.body)
            elif m.mtype == 0x000C:
                aname, aval = _parse_attribute(m.body)
                if aname is not None:
                    attrs[aname] = aval
            elif m.mtype == 0x0011:
                return None  # sub-group, not a dataset (flat files only)
        if layout is None or dims is None:
            return None
        if dtype is None:
            raise NotImplementedError(f"dataset {name!r}: unsupported HDF5 datatype")
        data = self._read_layout(layout, dims, dtype, filters, name)
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

    def _read_layout(self, body, dims, dtype, filters, name) -> np.ndarray:
        ver = body[0]
        if ver == 4:
            return self._read_layout_v4(body, dims, dtype, filters, name)
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

    def _read_layout_v4(self, body, dims, dtype, filters, name) -> np.ndarray:
        """Version-4 data layout (libhdf5 ≥ 1.10 "latest" format):
        chunked with single-chunk / implicit / fixed-array indexes.
        Extensible-array and v2-B-tree indexes only appear for
        datasets with unlimited dimensions — out of scope for raster
        files, which are fixed-shape."""
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
        else:
            raise NotImplementedError(
                f"HDF5 v4 chunk index type {itype} (extensible array / "
                "v2 B-tree — unlimited-dimension datasets)"
            )
        return self._place_linear_chunks(entries, dims, chunk_dims, dtype, filters)

    def _fixed_array_entries(self, addr: int) -> list[tuple[int, int | None]]:
        """Fixed-array chunk index → [(chunk addr, stored size | None)]
        in linear (row-major chunk grid) order. ``None`` size means the
        chunk is unfiltered (client 0)."""
        buf = self.buf
        if buf[addr : addr + 4] != b"FAHD":
            raise ValueError("bad HDF5 fixed-array header")
        client, entry_size, page_bits = buf[addr + 5], buf[addr + 6], buf[addr + 7]
        (nelmts,) = struct.unpack_from("<Q", buf, addr + 8)
        (dblk,) = struct.unpack_from("<Q", buf, addr + 16)
        if nelmts > (1 << page_bits):
            raise NotImplementedError("paged fixed-array chunk index")
        if buf[dblk : dblk + 4] != b"FADB":
            raise ValueError("bad HDF5 fixed-array data block")
        pos = dblk + 4 + 1 + 1 + 8  # sig, version, client id, header addr
        out: list[tuple[int, int | None]] = []
        for _ in range(nelmts):
            (caddr,) = struct.unpack_from("<Q", buf, pos)
            pos += 8
            if client == 0:
                out.append((caddr, None))
                continue
            size_len = entry_size - 8 - 4
            csize = int.from_bytes(buf[pos : pos + size_len], "little")
            pos += size_len + 4  # stored size + filter mask
            out.append((caddr, csize))
        return out

    def _place_linear_chunks(
        self, entries, dims, chunk_dims, dtype, filters
    ) -> np.ndarray:
        """Assemble chunks listed in linear row-major grid order."""
        buf = self.buf
        rank = len(dims)
        out = np.zeros(dims, dtype=dtype)
        csize_unf = int(np.prod(chunk_dims)) * dtype.itemsize
        grid = [-(-dims[d] // chunk_dims[d]) for d in range(rank)]
        for idx, (caddr, csize) in zip(np.ndindex(*grid), entries):
            if caddr in (0, _UNDEF):
                continue  # chunk never written: stays at fill (zeros)
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


def _ds_message(shape: tuple[int, ...]) -> bytes:
    body = bytes([1, len(shape), 0]) + b"\0" * 5
    for d in shape:
        body += struct.pack("<Q", d)
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


def build_hdf5(datasets: dict[str, dict], *, dense_links: bool = False) -> bytes:
    """Build a flat HDF5 file: ``{name: {"data": ndarray,
    "attrs": {...}, "chunks": tuple | None, "deflate": level | None,
    "shuffle": bool, "index": "v1"|"single"|"implicit"|"fixed"}}`` →
    bytes. v1 object headers, little-endian types. ``index`` picks the
    chunk index: the default v1 B-tree (layout message v3, what
    libhdf5 1.8-compat emits) or the layout-v4 indexes of the 1.10+
    "latest" format. ``dense_links=True`` stores the root group's
    links densely (fractal heap + name-index v2 B-tree) instead of a
    symbol table — the layout libhdf5 switches to beyond 8 links,
    i.e. what a real many-variable netCDF-4 file uses."""
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
        arr = np.ascontiguousarray(spec["data"])
        arr = arr.astype(arr.dtype.newbyteorder("<")) if arr.dtype.byteorder == ">" else arr
        msgs = [
            _header_msg(0x0001, _ds_message(arr.shape)),
            _header_msg(0x0003, _dt_message(arr.dtype)),
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
                fahd_addr = alloc(
                    b"FAHD"
                    + bytes([0, client, entry_size, 10])
                    + struct.pack("<QQI", len(fa_entries), 0, 0)
                )
                fadb = bytearray(b"FADB" + bytes([0, client]) + struct.pack("<Q", fahd_addr))
                for caddr, csize in fa_entries:
                    fadb += struct.pack("<Q", caddr)
                    if filters:
                        fadb += struct.pack("<II", csize, 0)
                fadb += struct.pack("<I", 0)  # checksum
                fadb_addr = alloc(bytes(fadb))
                struct.pack_into("<Q", out, fahd_addr + 16, fadb_addr)
                layout = (
                    _layout_v4_prefix(0, chunks) + b"\x03" + bytes([10]) + struct.pack("<Q", fahd_addr)
                )
            else:
                raise ValueError(f"unknown chunk index {index!r}")
        msgs.append(_header_msg(0x0008, layout))
        for aname, aval in spec.get("attrs", {}).items():
            msgs.append(_header_msg(0x000C, _attr_message(aname, aval)))
        oaddr = alloc(_object_header(msgs))
        entries.append((name, oaddr))

    if dense_links:
        root_addr = _write_dense_root(out, alloc, entries)
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


def _write_dense_root(out: bytearray, alloc, entries) -> int:
    """Dense root group: link messages packed into fractal-heap direct
    blocks (one block, or a root indirect block over up to two
    doubling-table rows), a structural name-index v2 B-tree (record
    hashes/checksums zeroed — the reader enumerates the heap, it never
    hashes names), and a root object header carrying Link Info + Group
    Info messages. Returns the root object header address."""
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

    # FRHP address is embedded in every block — reserve, patch later
    frhp_addr = alloc(b"\0" * 146)
    dblock_addrs = []
    for bi, blk in enumerate(blocks):
        data = (
            b"FHDB" + bytes([0]) + struct.pack("<Q", frhp_addr)
            + struct.pack("<I", bi * S) + b"".join(blk)
        )
        dblock_addrs.append(alloc(data + b"\0" * (S - len(data))))
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
        fhib += struct.pack("<I", 0)  # checksum
        heap_root, cur_rows = alloc(bytes(fhib)), nrows

    managed = S * len(blocks)
    frhp = bytearray()
    frhp += b"FRHP" + bytes([0]) + struct.pack("<HH", 7, 0) + bytes([0])
    frhp += struct.pack("<I", 4096)  # max managed object size
    frhp += struct.pack("<QQ", 0, _UNDEF)  # next huge id, huge btree
    frhp += struct.pack("<QQ", 0, _UNDEF)  # free space, fs manager
    frhp += struct.pack("<QQQQ", managed, managed, managed, len(link_msgs))
    frhp += struct.pack("<QQQQ", 0, 0, 0, 0)  # huge/tiny sizes + counts
    frhp += struct.pack("<H", W) + struct.pack("<QQ", S, 4096)
    frhp += struct.pack("<HH", 32, 1)  # max heap size (bits), starting rows
    frhp += struct.pack("<Q", heap_root) + struct.pack("<H", cur_rows)
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
