"""Pure-numpy NetCDF-3 "classic" reader/writer (no xarray/netCDF4 needed).

Implements the public classic file format (Unidata's "NetCDF Classic Format
Specification": magic ``CDF\\x01``/``\\x02``, header = dim_list + gatt_list +
var_list, big-endian data section, record variables interleaved per record).
This un-gates the reference's S2 input path (processor.py:117-124 opens
forecast ``.nc`` blobs) in environments without the C NetCDF stack: the
reader feeds ``sources.netcdf._melt_one``'s fallback, the writer builds
real ``.nc`` fixture bytes for end-to-end ingest tests.

Scope: CDF-1 and CDF-2 (64-bit offset), all six classic types, fixed and
record variables, attributes. NOT HDF5-based NetCDF-4 — those bytes start
``\\x89HDF`` and raise a clear error pointing at the xarray path.
"""

from __future__ import annotations

import io
import struct
from dataclasses import dataclass, field

import numpy as np

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
_DTYPES = {
    NC_BYTE: np.dtype(">i1"),
    NC_CHAR: np.dtype("S1"),
    NC_SHORT: np.dtype(">i2"),
    NC_INT: np.dtype(">i4"),
    NC_FLOAT: np.dtype(">f4"),
    NC_DOUBLE: np.dtype(">f8"),
}
_NC_TYPE_OF = {v.newbyteorder("="): k for k, v in _DTYPES.items()}


def _nc_type_for(dtype: np.dtype) -> int:
    """Map a numpy dtype onto the classic six (widening ints narrow to
    NC_INT — classic has no 64-bit integer; callers must stay in range)."""
    if dtype.kind == "S":
        return NC_CHAR
    if dtype.kind in "iu":
        return {1: NC_BYTE, 2: NC_SHORT}.get(dtype.itemsize, NC_INT)
    if dtype.kind == "f":
        return NC_FLOAT if dtype.itemsize <= 4 else NC_DOUBLE
    raise TypeError(f"no NetCDF-3 classic type for dtype {dtype}")
_DIM_TAG, _VAR_TAG, _ATT_TAG, _ABSENT = 0x0A, 0x0B, 0x0C, 0x00


@dataclass
class NC3Var:
    name: str
    dims: tuple[str, ...]
    attrs: dict
    data: np.ndarray  # native-endian, shaped (record dim first if present)


@dataclass
class NC3File:
    dims: dict[str, int]  # record dim reported at its true length
    attrs: dict
    variables: dict[str, NC3Var]
    record_dim: str | None = None
    var_order: list[str] = field(default_factory=list)


def _pad4(n: int) -> int:
    return (n + 3) & ~3


class _Reader:
    def __init__(self, data: bytes):
        self.buf = data
        self.pos = 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("truncated NetCDF-3 stream")
        self.pos += n
        return b

    def i4(self) -> int:
        return struct.unpack(">i", self.take(4))[0]

    def i8(self) -> int:
        return struct.unpack(">q", self.take(8))[0]

    def name(self) -> str:
        n = self.i4()
        raw = self.take(_pad4(n))[:n]
        return raw.decode("utf-8")

    def attr_value(self):
        nc_type, nelems = self.i4(), self.i4()
        dt = _DTYPES[nc_type]
        raw = self.take(_pad4(nelems * dt.itemsize))[: nelems * dt.itemsize]
        if nc_type == NC_CHAR:
            return raw.decode("utf-8", errors="replace")
        arr = np.frombuffer(raw, dtype=dt).astype(dt.newbyteorder("="))
        return arr[0] if nelems == 1 else arr

    def att_list(self) -> dict:
        tag, nelems = self.i4(), self.i4()
        if tag == _ABSENT:
            return {}
        if tag != _ATT_TAG:
            raise ValueError(f"bad attribute-list tag {tag}")
        return {self.name(): self.attr_value() for _ in range(nelems)}


def parse_netcdf3(data: bytes, load_data: bool = True) -> NC3File:
    """Classic-format bytes -> dims/attrs/variables with numpy arrays.

    ``load_data=False`` parses the header only (dims, global attrs, var
    headers — variables carry empty arrays): O(header) work for callers
    that just route on attributes (``sources.netcdf.file_attrs``)."""
    if data[:4] == b"\x89HDF":
        raise ValueError(
            "NetCDF-4 (HDF5-based) file: the pure-numpy classic reader "
            "cannot parse it; install xarray/h5netcdf for this input"
        )
    if data[:3] != b"CDF" or data[3] not in (1, 2):
        raise ValueError("not a NetCDF-3 classic file (bad magic)")
    large = data[3] == 2  # CDF-2: 64-bit begin offsets
    r = _Reader(data)
    r.take(4)
    numrecs = r.i4()  # 0xFFFFFFFF (STREAMING) reads as -1: resolve below

    dim_names: list[str] = []
    dim_sizes: list[int] = []
    tag, nelems = r.i4(), r.i4()
    if tag == _DIM_TAG:
        for _ in range(nelems):
            dim_names.append(r.name())
            dim_sizes.append(r.i4())
    elif tag != _ABSENT:
        raise ValueError(f"bad dimension-list tag {tag}")
    record_dim_id = dim_sizes.index(0) if 0 in dim_sizes else None

    gatts = r.att_list()

    headers = []
    tag, nelems = r.i4(), r.i4()
    if tag == _VAR_TAG:
        for _ in range(nelems):
            name = r.name()
            ndims = r.i4()
            dimids = [r.i4() for _ in range(ndims)]
            vatts = r.att_list()
            nc_type, vsize = r.i4(), r.i4()
            begin = r.i8() if large else r.i4()
            headers.append((name, dimids, vatts, nc_type, vsize, begin))
    elif tag != _ABSENT:
        raise ValueError(f"bad variable-list tag {tag}")

    rec_vars = [
        h for h in headers if record_dim_id is not None and h[1][:1] == [record_dim_id]
    ]

    def _per_rec(h) -> int:
        _name, dimids, _va, nc_type, _vs, _b = h
        inner = int(
            np.prod([dim_sizes[i] for i in dimids[1:]], dtype=np.int64)
        )
        return inner * _DTYPES[nc_type].itemsize

    # STREAMING: infer from file length — only when the full file was
    # given (a header-only prefix would silently yield a wrong count;
    # those parses report the record dim as None instead, below)
    if numrecs < 0 and rec_vars and load_data:
        first = min(h[5] for h in rec_vars)
        # spec: a LONE record variable is stored contiguously with NO
        # per-record padding — its stride is the raw slab, not the padded
        # vsize from the header (using vsize here would undercount records
        # for e.g. a single NC_SHORT-per-record variable)
        if len(rec_vars) == 1:
            recsize = _per_rec(rec_vars[0])
        else:
            recsize = sum(h[4] for h in rec_vars)
        numrecs = (len(data) - first) // recsize if recsize else 0

    variables: dict[str, NC3Var] = {}
    order: list[str] = []
    # spec special case: a LONE record variable is laid out contiguously
    # (no per-record padding to the 4-byte boundary)
    lone_record = len(rec_vars) == 1
    recsize = sum(h[4] for h in rec_vars)
    for name, dimids, vatts, nc_type, vsize, begin in headers:
        dt = _DTYPES[nc_type]
        dims = tuple(dim_names[i] for i in dimids)
        shape = [dim_sizes[i] for i in dimids]
        is_record = record_dim_id is not None and dimids[:1] == [record_dim_id]
        if not load_data:
            variables[name] = NC3Var(
                name, dims, vatts, np.empty(0, dtype=dt.newbyteorder("="))
            )
            order.append(name)
            continue
        if is_record:
            shape[0] = numrecs
            per_rec = int(np.prod(shape[1:], dtype=np.int64)) * dt.itemsize
            if lone_record:
                raw = data[begin : begin + per_rec * numrecs]
            else:
                raw = b"".join(
                    data[begin + rec * recsize : begin + rec * recsize + per_rec]
                    for rec in range(numrecs)
                )
        else:
            nbytes = int(np.prod(shape, dtype=np.int64)) * dt.itemsize
            raw = data[begin : begin + nbytes]
        arr = np.frombuffer(raw, dtype=dt)
        if nc_type != NC_CHAR:
            arr = arr.astype(dt.newbyteorder("="))
        variables[name] = NC3Var(name, dims, vatts, arr.reshape(shape))
        order.append(name)

    dims_out = dict(zip(dim_names, dim_sizes))
    record_dim = dim_names[record_dim_id] if record_dim_id is not None else None
    if record_dim is not None:
        # numrecs < 0 only on a header-only parse of a STREAMING file:
        # the true length needs the data section, so report None rather
        # than a wrong number
        dims_out[record_dim] = numrecs if numrecs >= 0 else None
    return NC3File(dims_out, gatts, variables, record_dim, order)


# ---------------------------------------------------------------------------
# writer


def _w_name(out: io.BytesIO, s: str) -> None:
    b = s.encode("utf-8")
    out.write(struct.pack(">i", len(b)))
    out.write(b + b"\x00" * (_pad4(len(b)) - len(b)))


def _w_attr_value(out: io.BytesIO, v) -> None:
    if isinstance(v, str):
        b = v.encode("utf-8")
        out.write(struct.pack(">ii", NC_CHAR, len(b)))
        out.write(b + b"\x00" * (_pad4(len(b)) - len(b)))
        return
    arr = np.atleast_1d(np.asarray(v))
    nc_type = _nc_type_for(arr.dtype)
    be = arr.astype(_DTYPES[nc_type])
    out.write(struct.pack(">ii", nc_type, arr.size))
    raw = be.tobytes()
    out.write(raw + b"\x00" * (_pad4(len(raw)) - len(raw)))


def _w_att_list(out: io.BytesIO, attrs: dict) -> None:
    if not attrs:
        out.write(struct.pack(">ii", _ABSENT, 0))
        return
    out.write(struct.pack(">ii", _ATT_TAG, len(attrs)))
    for k, v in attrs.items():
        _w_name(out, k)
        _w_attr_value(out, v)


def write_netcdf3(
    dims: dict[str, int],
    variables: list[NC3Var],
    global_attrs: dict | None = None,
) -> bytes:
    """Build CDF-1 classic bytes (fixed dims only — ingest fixtures don't
    need the record layout; the reader handles both). Variable data must be
    numpy arrays shaped per ``dims``; dtypes map onto the classic six."""
    dim_ids = {name: i for i, name in enumerate(dims)}
    out = io.BytesIO()
    out.write(b"CDF\x01")
    out.write(struct.pack(">i", 0))  # numrecs
    out.write(struct.pack(">ii", _DIM_TAG, len(dims)))
    for name, size in dims.items():
        _w_name(out, name)
        out.write(struct.pack(">i", size))
    _w_att_list(out, global_attrs or {})

    # variable headers need begin offsets: lay out headers into a scratch
    # buffer first to learn the header length, then assign offsets
    metas = []
    for v in variables:
        arr = np.asarray(v.data)
        nc_type = _nc_type_for(arr.dtype)
        vsize = _pad4(arr.size * _DTYPES[nc_type].itemsize)
        metas.append((v, nc_type, vsize))

    def headers_blob(begins: list[int]) -> bytes:
        h = io.BytesIO()
        h.write(struct.pack(">ii", _VAR_TAG, len(variables)))
        for (v, nc_type, vsize), begin in zip(metas, begins):
            _w_name(h, v.name)
            h.write(struct.pack(">i", len(v.dims)))
            for d in v.dims:
                h.write(struct.pack(">i", dim_ids[d]))
            _w_att_list(h, v.attrs)
            h.write(struct.pack(">iii", nc_type, vsize, begin))
        return h.getvalue()

    fixed_len = out.tell() + len(headers_blob([0] * len(metas)))
    begins, at = [], fixed_len
    for _, _, vsize in metas:
        begins.append(at)
        at += vsize
    out.write(headers_blob(begins))
    for v, nc_type, vsize in metas:
        raw = np.ascontiguousarray(v.data).astype(_DTYPES[nc_type]).tobytes()
        out.write(raw + b"\x00" * (vsize - len(raw)))
    return out.getvalue()
