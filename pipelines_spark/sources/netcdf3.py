"""Pure-numpy netCDF-3 (classic format) reader.

The classic netCDF format (CDF-1/CDF-2/CDF-5 magic) is a small,
fully-specified binary layout: a header describing dimensions,
attributes, and variables, followed by fixed-size variable data and
an optional unlimited-dimension record section. That is parseable
with struct + numpy alone — no netCDF4/HDF5 library needed — which
un-gates the engine's raster ingest (SURVEY S15) for classic files.
All three classic variants parse: CDF-1, CDF-2 (64-bit offsets), and
CDF-5 (64-bit data: NON_NEG header fields widen to 64-bit and the
unsigned/int64 types exist). netCDF-4 files are HDF5 containers —
they are detected by magic and routed to sources/hdf5_min.py by the
caller.

Format spec: the NetCDF Classic Format Specification (public Unidata
documentation). Reference behavior being reproduced: xarray
open_dataset → to_dataframe long format
(pipelines/rj_cor/meteorologia/satelite/satellite_utils.py:481-509).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_NC_BYTE, _NC_CHAR, _NC_SHORT, _NC_INT, _NC_FLOAT, _NC_DOUBLE = 1, 2, 3, 4, 5, 6
# CDF-5 additions (64-bit data format)
_NC_UBYTE, _NC_USHORT, _NC_UINT, _NC_INT64, _NC_UINT64 = 7, 8, 9, 10, 11
_DTYPES = {
    _NC_BYTE: np.dtype(">i1"),
    _NC_CHAR: np.dtype("S1"),
    _NC_SHORT: np.dtype(">i2"),
    _NC_INT: np.dtype(">i4"),
    _NC_FLOAT: np.dtype(">f4"),
    _NC_DOUBLE: np.dtype(">f8"),
    _NC_UBYTE: np.dtype(">u1"),
    _NC_USHORT: np.dtype(">u2"),
    _NC_UINT: np.dtype(">u4"),
    _NC_INT64: np.dtype(">i8"),
    _NC_UINT64: np.dtype(">u8"),
}
_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 10, 11, 12


@dataclass
class NcVariable:
    name: str
    dim_ids: list[int]
    attrs: dict
    nc_type: int
    vsize: int
    begin: int
    data: np.ndarray | None = None


@dataclass
class NcDataset:
    dims: list[tuple[str, int]] = field(default_factory=list)
    attrs: dict = field(default_factory=dict)
    variables: dict[str, NcVariable] = field(default_factory=dict)
    numrecs: int = 0
    rec_dim: int | None = None


class _Reader:
    """``large=True`` reads the CDF-5 grammar, where every NON_NEG
    header integer (counts, name lengths, ndims, dim ids, sizes) is
    64-bit; tags and nc_type stay 32-bit, value padding stays 4-byte."""

    def __init__(self, buf: bytes, large: bool = False):
        self.buf = buf
        self.pos = 0
        self.large = large

    def take(self, n: int) -> bytes:
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def i4(self) -> int:
        return struct.unpack(">i", self.take(4))[0]

    def u8(self) -> int:
        return struct.unpack(">Q", self.take(8))[0]

    def nonneg(self) -> int:
        return self.u8() if self.large else self.i4()

    def name(self) -> str:
        n = self.nonneg()
        s = self.take(n).decode("utf-8")
        self.pos += (-n) % 4  # padding to 4-byte boundary
        return s

    def values(self, nc_type: int, n: int):
        dt = _DTYPES[nc_type]
        raw = self.take(dt.itemsize * n)
        self.pos += (-(dt.itemsize * n)) % 4
        if nc_type == _NC_CHAR:
            return raw.decode("utf-8", errors="replace")
        return np.frombuffer(raw, dt, n)

    def attr_map(self) -> dict:
        tag = self.i4()
        count = self.nonneg()
        if tag == 0 and count == 0:
            return {}
        if tag != _NC_ATTRIBUTE:
            raise ValueError(f"bad attribute tag {tag}")
        out = {}
        for _ in range(count):
            name = self.name()
            nc_type = self.i4()
            n = self.nonneg()
            vals = self.values(nc_type, n)
            if isinstance(vals, np.ndarray):
                vals = vals.tolist()
                if len(vals) == 1:
                    vals = vals[0]
            out[name] = vals
        return out


def parse_netcdf3(buf: bytes) -> NcDataset:
    """Parse a classic netCDF byte buffer into an ``NcDataset`` with
    every variable materialized as a numpy array (record variables
    stitched across the record section)."""
    if buf[:4] == b"\x89HDF":
        raise NotImplementedError(
            "netCDF-4 (HDF5 container): use the built-in minimal HDF5 "
            "reader (sources/hdf5_min.py); this parser handles classic "
            "netCDF (CDF-1/2/5) only"
        )
    if buf[:3] != b"CDF" or buf[3] not in (1, 2, 5):
        raise ValueError("not a netCDF classic file")
    version = buf[3]
    # CDF-5 ("64-bit data", pnetcdf): every NON_NEG header field is
    # 64-bit and the unsigned/int64 types exist; CDF-2 only widens
    # data offsets
    large = version == 5
    offset64 = version in (2, 5)

    r = _Reader(buf, large)
    r.pos = 4
    ds = NcDataset()
    ds.numrecs = r.nonneg()  # STREAMING (-1) unsupported

    tag = r.i4()
    count = r.nonneg()
    if not (tag == 0 and count == 0):
        if tag != _NC_DIMENSION:
            raise ValueError(f"bad dimension tag {tag}")
        for _ in range(count):
            name = r.name()
            size = r.nonneg()
            if size == 0:
                ds.rec_dim = len(ds.dims)
            ds.dims.append((name, size))

    ds.attrs = r.attr_map()

    tag = r.i4()
    count = r.nonneg()
    variables: list[NcVariable] = []
    if not (tag == 0 and count == 0):
        if tag != _NC_VARIABLE:
            raise ValueError(f"bad variable tag {tag}")
        for _ in range(count):
            name = r.name()
            ndims = r.nonneg()
            dim_ids = [r.nonneg() for _ in range(ndims)]
            attrs = r.attr_map()
            nc_type = r.i4()
            vsize = r.nonneg()
            begin = r.u8() if offset64 else r.i4()
            variables.append(
                NcVariable(name, dim_ids, attrs, nc_type, vsize, begin)
            )

    rec_vars = [v for v in variables if ds.rec_dim in v.dim_ids[:1]]
    rec_stride = sum(v.vsize for v in rec_vars)
    if len(rec_vars) == 1 and _DTYPES[rec_vars[0].nc_type].itemsize < 4:
        # classic-format special case: with exactly ONE record
        # variable of type char/byte/short, record slabs are packed
        # WITHOUT padding (vsize still reports the rounded size)
        v0 = rec_vars[0]
        per_rec = 1
        for d in v0.dim_ids[1:]:
            per_rec *= ds.dims[d][1]
        rec_stride = per_rec * _DTYPES[v0.nc_type].itemsize
    for v in variables:
        dt = _DTYPES[v.nc_type]
        shape = [ds.dims[d][1] for d in v.dim_ids]
        if v.dim_ids and v.dim_ids[0] == ds.rec_dim:
            shape[0] = ds.numrecs
            per_rec = int(np.prod(shape[1:], dtype=np.int64)) if len(shape) > 1 else 1
            chunks = [
                np.frombuffer(
                    buf, dt, per_rec, v.begin + rec * rec_stride
                )
                for rec in range(ds.numrecs)
            ]
            arr = (
                np.concatenate(chunks).reshape(shape)
                if chunks
                else np.empty(shape, dt)
            )
        else:
            n = int(np.prod(shape, dtype=np.int64)) if shape else 1
            arr = np.frombuffer(buf, dt, n, v.begin).reshape(shape)
        # native byte order: Arrow/pandas reject big-endian arrays
        if v.nc_type != _NC_CHAR:
            arr = arr.astype(arr.dtype.newbyteorder("="))
        v.data = arr
        ds.variables[v.name] = v
    return ds


_NC_TYPE_OF = {
    np.dtype("i1"): _NC_BYTE,
    np.dtype("i2"): _NC_SHORT,
    np.dtype("i4"): _NC_INT,
    np.dtype("f4"): _NC_FLOAT,
    np.dtype("f8"): _NC_DOUBLE,
    # CDF-5 types
    np.dtype("u1"): _NC_UBYTE,
    np.dtype("u2"): _NC_USHORT,
    np.dtype("u4"): _NC_UINT,
    np.dtype("i8"): _NC_INT64,
    np.dtype("u8"): _NC_UINT64,
}


def build_netcdf3(
    dims: list[tuple[str, int | None]],
    variables: list[tuple[str, list[str], np.ndarray]],
    *,
    version: int = 1,
) -> bytes:
    """Serialize a classic netCDF file (test/round-trip helper; fixed
    and record variables, no attributes). ``None`` dim size marks the
    record (unlimited) dimension. ``version`` 1 = CDF-1 (32-bit
    offsets), 2 = CDF-2 (64-bit offsets), or 5 = CDF-5 (64-bit data:
    every NON_NEG header integer widens to 64-bit)."""
    if version not in (1, 2, 5):
        raise ValueError("builder supports CDF-1, CDF-2, and CDF-5")
    large = version == 5
    begin_fmt = ">Q" if version in (2, 5) else ">i"
    nn_fmt = ">q" if large else ">i"  # NON_NEG header integers
    dim_index = {name: i for i, (name, _) in enumerate(dims)}
    rec_dim = next((i for i, (_, s) in enumerate(dims) if s is None), None)

    def pad4(b: bytes) -> bytes:
        return b + b"\0" * ((-len(b)) % 4)

    def name_bytes(s: str) -> bytes:
        raw = s.encode("utf-8")
        return struct.pack(nn_fmt, len(raw)) + pad4(raw)

    numrecs = 0
    metas = []  # (name, dim_ids, nc_type, vsize, arr, is_rec)
    for name, dim_names, arr in variables:
        dim_ids = [dim_index[d] for d in dim_names]
        is_rec = bool(dim_ids) and dim_ids[0] == rec_dim
        nc_type = _NC_TYPE_OF[np.dtype(arr.dtype.str[1:])]
        dt = _DTYPES[nc_type]
        per_rec_shape = arr.shape[1:] if is_rec else arr.shape
        n = int(np.prod(per_rec_shape, dtype=np.int64)) if per_rec_shape else 1
        vsize = (n * dt.itemsize + 3) & ~3
        if is_rec:
            numrecs = max(numrecs, arr.shape[0])
        metas.append((name, dim_ids, nc_type, vsize, arr.astype(dt), is_rec))

    def header(begins: list[int]) -> bytes:
        out = [b"CDF" + bytes([version]), struct.pack(nn_fmt, numrecs)]
        out.append(struct.pack(">i", _NC_DIMENSION) + struct.pack(nn_fmt, len(dims)))
        for name, size in dims:
            out.append(name_bytes(name) + struct.pack(nn_fmt, size or 0))
        out.append(struct.pack(">i", 0) + struct.pack(nn_fmt, 0))  # no global attrs
        out.append(struct.pack(">i", _NC_VARIABLE) + struct.pack(nn_fmt, len(metas)))
        for (name, dim_ids, nc_type, vsize, _arr, _r), begin in zip(metas, begins):
            out.append(name_bytes(name))
            out.append(struct.pack(nn_fmt, len(dim_ids)))
            out.extend(struct.pack(nn_fmt, d) for d in dim_ids)
            out.append(struct.pack(">i", 0) + struct.pack(nn_fmt, 0))  # no var attrs
            out.append(struct.pack(">i", nc_type) + struct.pack(nn_fmt, vsize))
            out.append(struct.pack(begin_fmt, begin))
        return b"".join(out)

    hdr_len = len(header([0] * len(metas)))
    begins, off = [], hdr_len
    fixed = [m for m in metas if not m[5]]
    recs = [m for m in metas if m[5]]
    offsets = {}
    for m in fixed:
        offsets[m[0]] = off
        off += m[3]
    rec_start = off
    for m in recs:
        offsets[m[0]] = off
        off += m[3]
    begins = [offsets[m[0]] for m in metas]

    body = bytearray(b"\0" * (rec_start - hdr_len))
    for name, _dim_ids, _t, vsize, arr, _r in fixed:
        raw = pad4(arr.tobytes())
        body[offsets[name] - hdr_len : offsets[name] - hdr_len + vsize] = raw
    # spec special case: exactly one char/byte/short record variable →
    # record slabs pack WITHOUT padding (vsize still reports rounded)
    special = len(recs) == 1 and recs[0][4].dtype.itemsize < 4
    rec_stride = (
        recs[0][4][0].nbytes if special and numrecs else sum(m[3] for m in recs)
    )
    body += b"\0" * (numrecs * rec_stride)
    for name, _dim_ids, _t, vsize, arr, _r in recs:
        base = offsets[name] - hdr_len
        for rec in range(arr.shape[0]):
            raw = arr[rec].tobytes() if special else pad4(arr[rec].tobytes())
            body[base + rec * rec_stride : base + rec * rec_stride + len(raw)] = raw
    return header(begins) + bytes(body)
