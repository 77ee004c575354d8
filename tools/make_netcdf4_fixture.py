#!/usr/bin/env python3
"""Generate the NetCDF-4 / HDF5 test fixtures + their flattened parquet
mirrors, all committed under data/netcdf/.

The .nc bytes are written directly from the public "HDF5 File Format
Specification Version 3.0" (The HDF Group) plus the public netCDF-4
dimension-scale conventions (Unidata netcdf-c docs / HDF5 H5DS spec) with
struct.pack — deliberately NOT via h5py/netcdf4 (neither exists in this
environment) and NOT via the Scala reader under test, so the fixture is an
independent from-spec implementation of the format. The parquet mirror is
the reference's raster→table flattening (to_dataframe().reset_index():
long-form rows over the dim cross product) and serves as the DuckDB oracle
for q_netcdf4_raster / q_netcdf4_slice / q_netcdf4_v2.

Two files, covering the layouts netCDF-4 writers actually emit:

thresholds4.nc — superblock v0, v1 object headers, symbol-table root group
  (B-tree v1 + local heap + SNOD), the libhdf5-default layout:
  dims:  lat=20 (descending, GloFAS-style), lon=30 (ascending)
  vars:  lat(lat) f8, lon(lon) f8        — coordinate vars = dimension scales
         threshold_2y(lat,lon)  f4 chunked 7x9 (edge chunks), shuffle+deflate,
                                _FillValue=-9999.0
         threshold_5y(lat,lon)  f8 contiguous
         threshold_20y(lat,lon) f8 chunked 10x30, deflate+fletcher32
         upstream_area(lat,lon) i4 contiguous
  dim scales carry CLASS/NAME/_Netcdf4Dimid + a REFERENCE_LIST (compound
  vlen) attribute the reader must SKIP; variables carry DIMENSION_LIST
  (vlen of object refs via the global heap); root carries _NCProperties.

discharge4_v2.nc — superblock v2 (lookup3-checksummed), v2 object headers
  (OHDR), compact link messages (the H5F_LIBVER_LATEST small-group form):
  dims:  y=12 (phony: "This is a netCDF dimension but not a netCDF
         variable" scale, NO data → indices), x=16 (coord var, f8)
  vars:  discharge(y,x) f4 chunked 5x7 deflate, _FillValue=-1.0

Run once, commit outputs:
  python3 tools/make_netcdf4_fixture.py
"""
import struct
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

UNDEF = 0xFFFFFFFFFFFFFFFF


def u8(v): return struct.pack("<B", v)
def u16(v): return struct.pack("<H", v)
def u32(v): return struct.pack("<I", v)
def u64(v): return struct.pack("<Q", v)


def pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


# ---------------------------------------------------------------- lookup3
# Bob Jenkins' public-domain lookup3 hashlittle(), as HDF5's
# H5_checksum_lookup3 uses it (initval 0) for v2 superblock / OHDR checksums.
def _rot(x, k):
    return ((x << k) | (x >> (32 - k))) & 0xFFFFFFFF


def lookup3(data: bytes, init: int = 0) -> int:
    length = len(data)
    a = b = c = (0xDEADBEEF + length + init) & 0xFFFFFFFF
    i = 0
    while length > 12:
        a = (a + int.from_bytes(data[i:i + 4], "little")) & 0xFFFFFFFF
        b = (b + int.from_bytes(data[i + 4:i + 8], "little")) & 0xFFFFFFFF
        c = (c + int.from_bytes(data[i + 8:i + 12], "little")) & 0xFFFFFFFF
        a = (a - c) & 0xFFFFFFFF; a ^= _rot(c, 4); c = (c + b) & 0xFFFFFFFF
        b = (b - a) & 0xFFFFFFFF; b ^= _rot(a, 6); a = (a + c) & 0xFFFFFFFF
        c = (c - b) & 0xFFFFFFFF; c ^= _rot(b, 8); b = (b + a) & 0xFFFFFFFF
        a = (a - c) & 0xFFFFFFFF; a ^= _rot(c, 16); c = (c + b) & 0xFFFFFFFF
        b = (b - a) & 0xFFFFFFFF; b ^= _rot(a, 19); a = (a + c) & 0xFFFFFFFF
        c = (c - b) & 0xFFFFFFFF; c ^= _rot(b, 4); b = (b + a) & 0xFFFFFFFF
        i += 12
        length -= 12
    tail = data[i:]
    if tail:
        t = tail + b"\x00" * (12 - len(tail))
        a = (a + int.from_bytes(t[0:4], "little")) & 0xFFFFFFFF
        b = (b + int.from_bytes(t[4:8], "little")) & 0xFFFFFFFF
        c = (c + int.from_bytes(t[8:12], "little")) & 0xFFFFFFFF
        c ^= b; c = (c - _rot(b, 14)) & 0xFFFFFFFF
        a ^= c; a = (a - _rot(c, 11)) & 0xFFFFFFFF
        b ^= a; b = (b - _rot(a, 25)) & 0xFFFFFFFF
        c ^= b; c = (c - _rot(b, 16)) & 0xFFFFFFFF
        a ^= c; a = (a - _rot(c, 4)) & 0xFFFFFFFF
        b ^= a; b = (b - _rot(a, 14)) & 0xFFFFFFFF
        c ^= b; c = (c - _rot(b, 24)) & 0xFFFFFFFF
    return c


# ---------------------------------------------------------------- fletcher32
# HDF5's H5_checksum_fletcher32: 16-bit big-endian word sums with the
# 360-word deferred-modulo loop; the filter appends it LITTLE-endian.
def fletcher32(data: bytes) -> int:
    sum1 = sum2 = 0
    n = len(data) // 2
    i = 0
    while n:
        tlen = min(n, 360)
        n -= tlen
        for _ in range(tlen):
            sum1 += (data[i] << 8) | data[i + 1]
            sum2 += sum1
            i += 2
        sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
        sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    if len(data) % 2:
        sum1 += data[-1] << 8
        sum2 += sum1
        sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
        sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
    sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    return ((sum2 << 16) | sum1) & 0xFFFFFFFF


def shuffle_bytes(raw: bytes, elem: int) -> bytes:
    """HDF5 shuffle filter: byte k of element i -> position k*nelem + i."""
    n = len(raw) // elem
    out = bytearray(len(raw))
    for k in range(elem):
        out[k * n:(k + 1) * n] = raw[k::elem]
    # trailing bytes (len not multiple of elem) copied verbatim — never hit
    out[elem * n:] = raw[elem * n:]
    return bytes(out)


# ---------------------------------------------------------------- datatypes
def dt_fixed(size: int, signed=True) -> bytes:
    # class 0 v1; bit0 order=LE(0), bit3 signed
    bits0 = 0x08 if signed else 0x00
    return u8(0x10) + u8(bits0) + u8(0) + u8(0) + u32(size) + u16(0) + u16(size * 8)


def dt_float(size: int) -> bytes:
    # class 1 v1, IEEE LE; bitfield bytes as libhdf5 emits them
    if size == 4:
        props = u16(0) + u16(32) + u8(23) + u8(8) + u8(0) + u8(23) + u32(127)
    else:
        props = u16(0) + u16(64) + u8(52) + u8(11) + u8(0) + u8(52) + u32(1023)
    return u8(0x11) + u8(0x20) + u8(0x3F) + u8(0x00) + u32(size) + props


def dt_string(n: int) -> bytes:
    # class 3 v1, nul-terminated ASCII
    return u8(0x13) + u8(0x00) + u8(0) + u8(0) + u32(n)


def dt_objref() -> bytes:
    # class 7 v1, object reference
    return u8(0x17) + u8(0x00) + u8(0) + u8(0) + u32(8)


def dt_vlen_of(base: bytes) -> bytes:
    # class 9 v1, sequence
    return u8(0x19) + u8(0x00) + u8(0) + u8(0) + u32(16) + base


def dt_compound_ref_int() -> bytes:
    # class 6 v1, 2 members {dataset: objref @0, dimension: i4 @8} — the
    # H5DS REFERENCE_LIST element type; written only so the reader has a
    # real-world unknown-attribute body to SKIP.
    def member(name, off, dt):
        nb = pad8(name.encode() + b"\x00")
        return nb + u32(off) + u8(0) + b"\x00" * 3 + u32(0) + u32(0) * 4 + dt
    m = member("dataset", 0, dt_objref()) + member("dimension", 8, dt_fixed(4))
    return u8(0x16) + u8(0x02) + u8(0) + u8(0) + u32(12) + m


# ---------------------------------------------------------------- dataspaces
def ds_simple_v1(dims) -> bytes:
    return (u8(1) + u8(len(dims)) + u8(0) + u8(0) + u32(0) +
            b"".join(u64(d) for d in dims))


def ds_scalar_v2() -> bytes:
    return u8(2) + u8(0) + u8(0) + u8(0)  # rank 0, type 0 = scalar


def ds_simple_v2(dims) -> bytes:
    return (u8(2) + u8(len(dims)) + u8(0) + u8(1) +
            b"".join(u64(d) for d in dims))


# ---------------------------------------------------------------- messages
def msg_v1(mtype: int, body: bytes) -> bytes:
    body = pad8(body)
    return u16(mtype) + u16(len(body)) + u8(0) + b"\x00" * 3 + body


def object_header_v1(messages) -> bytes:
    block = b"".join(msg_v1(t, b) for t, b in messages)
    return (u8(1) + u8(0) + u16(len(messages)) + u32(1) + u32(len(block)) +
            b"\x00" * 4 + block)


def attr_v1(name: str, dtype: bytes, dspace: bytes, data: bytes) -> bytes:
    nb = name.encode() + b"\x00"
    return (u8(1) + u8(0) + u16(len(nb)) + u16(len(dtype)) + u16(len(dspace)) +
            pad8(nb) + pad8(dtype) + pad8(dspace) + data)


def attr_str(name: str, value: str) -> bytes:
    vb = value.encode() + b"\x00"
    return attr_v1(name, dt_string(len(vb)), ds_scalar_v2(), vb)


def attr_i4(name: str, value: int) -> bytes:
    return attr_v1(name, dt_fixed(4), ds_scalar_v2(), struct.pack("<i", value))


def fill_value_msg(value: bytes | None) -> bytes:
    # version 2: alloc time 2 (early), write time 0, defined flag
    if value is None:
        return u8(2) + u8(2) + u8(0) + u8(0)
    return u8(2) + u8(2) + u8(0) + u8(1) + u32(len(value)) + value


def layout_contiguous(addr: int, size: int) -> bytes:
    return u8(3) + u8(1) + u64(addr) + u64(size)


def layout_chunked(btree_addr: int, chunk_dims, elem: int) -> bytes:
    dims = list(chunk_dims) + [elem]
    return (u8(3) + u8(2) + u8(len(dims)) + u64(btree_addr) +
            b"".join(u32(d) for d in dims))


def filter_pipeline(filters) -> bytes:
    # v1: (id, [client data]) tuples; standard filters carry no name
    body = u8(1) + u8(len(filters)) + u16(0) + u32(0)
    for fid, cd in filters:
        body += u16(fid) + u16(0) + u16(1) + u16(len(cd))
        body += b"".join(u32(c) for c in cd)
        if len(cd) % 2:
            body += u32(0)
    return body


# ---------------------------------------------------------------- chunking
def chunk_grid(dims, cdims):
    """Yield chunk-origin tuples covering dims in row-major order."""
    import itertools
    ranges = [range(0, d, c) for d, c in zip(dims, cdims)]
    return list(itertools.product(*ranges))


def build_chunks(arr: np.ndarray, cdims, fill, filters):
    """Return [(origin, stored_bytes)] — full-size chunks (edge chunks padded
    with the fill value, as libhdf5 stores them), filters applied in
    pipeline order."""
    dims = arr.shape
    elem = arr.dtype.itemsize
    out = []
    for origin in chunk_grid(dims, cdims):
        full = np.full(cdims, fill, dtype=arr.dtype)
        sl = tuple(slice(o, min(o + c, d)) for o, c, d in zip(origin, cdims, dims))
        dst = tuple(slice(0, s.stop - s.start) for s in sl)
        full[dst] = arr[sl]
        raw = full.tobytes()  # LE on this platform, matching the datatype
        for fid, cd in filters:
            if fid == 2:
                raw = shuffle_bytes(raw, elem)
            elif fid == 1:
                raw = zlib.compress(raw, cd[0])
            elif fid == 3:
                raw = raw + u32(fletcher32(raw))
            else:
                raise ValueError(fid)
        out.append((origin, raw))
    return out


def btree_v1_chunks(chunks, addr_of, dataset_dims, cdims):
    """One leaf node (level 0) indexing every chunk; final key = the
    chunk-grid upper bound, as libhdf5 writes it."""
    body = b"TREE" + u8(1) + u8(0) + u16(len(chunks)) + u64(UNDEF) + u64(UNDEF)
    for i, (origin, raw) in enumerate(chunks):
        body += u32(len(raw)) + u32(0)
        body += b"".join(u64(o) for o in origin) + u64(0)
        body += u64(addr_of(i))
    bound = [((d + c - 1) // c) * c for d, c in zip(dataset_dims, cdims)]
    body += u32(0) + u32(0) + b"".join(u64(o) for o in bound) + u64(0)
    return body


# ================================================================ file 1: v0
NLAT, NLON = 20, 30
lat = np.array([17.975 - i * 0.05 for i in range(NLAT)], dtype=np.float64)
lon = np.array([-17.975 + j * 0.05 for j in range(NLON)], dtype=np.float64)
idx = np.arange(NLAT * NLON, dtype=np.int64).reshape(NLAT, NLON)
t2 = (idx * np.float32(0.37) + np.float32(1.5)).astype(np.float32)
t2[(idx % 11) == 0] = np.float32(-9999.0)
t5 = (idx * 1.75 + 0.125).astype(np.float64)
t20 = (idx * 2.5 + 9.25).astype(np.float64)
ua = (idx * 1000 + 7).astype(np.int32)

T2_FILTERS = [(2, [4]), (1, [4])]            # shuffle(elem=4) then deflate(4)
T20_FILTERS = [(1, [6]), (3, [])]            # deflate(6) then fletcher32
t2_chunks = build_chunks(t2, (7, 9), np.float32(-9999.0), T2_FILTERS)
t20_chunks = build_chunks(t20, (10, 30), np.float64(0.0), T20_FILTERS)


def build_v0():
    # ---- address plan: named blocks laid out in order, two passes
    order = ["sb", "root_oh", "btree", "heap", "snod",
             "lat_oh", "lon_oh", "t2_oh", "t5_oh", "t20_oh", "ua_oh",
             "t2_btree", "t20_btree", "gheap",
             "lat_data", "lon_data", "t5_data", "ua_data"]
    order += [f"t2_chunk{i}" for i in range(len(t2_chunks))]
    order += [f"t20_chunk{i}" for i in range(len(t20_chunks))]

    link_names = ["lat", "lon", "threshold_2y", "threshold_5y",
                  "threshold_20y", "upstream_area"]
    oh_of = {"lat": "lat_oh", "lon": "lon_oh", "threshold_2y": "t2_oh",
             "threshold_5y": "t5_oh", "threshold_20y": "t20_oh",
             "upstream_area": "ua_oh"}

    def build(addr, eof):
        blocks = {}

        # local heap: names at known offsets (offset 0 = empty string slot)
        heap_data = bytearray(b"\x00" * 8)
        name_off = {}
        for nm in sorted(link_names):
            name_off[nm] = len(heap_data)
            heap_data += pad8(nm.encode() + b"\x00")
        heap_seg = bytes(heap_data)
        blocks["heap"] = (b"HEAP" + u8(0) + b"\x00" * 3 + u64(len(heap_seg)) +
                          u64(UNDEF) + u64(addr["heap"] + 32) + heap_seg)

        def ste(nm):
            return (u64(name_off[nm]) + u64(addr[oh_of[nm]]) + u32(0) + u32(0) +
                    b"\x00" * 16)
        snod = (b"SNOD" + u8(1) + u8(0) + u16(len(link_names)) +
                b"".join(ste(nm) for nm in sorted(link_names)))
        blocks["snod"] = snod

        last = sorted(link_names)[-1]
        blocks["btree"] = (b"TREE" + u8(0) + u8(0) + u16(1) +
                           u64(UNDEF) + u64(UNDEF) +
                           u64(0) + u64(addr["snod"]) + u64(name_off[last]))

        blocks["root_oh"] = object_header_v1([
            (0x0011, u64(addr["btree"]) + u64(addr["heap"])),
            (0x000C, attr_str("_NCProperties", "version=2,netcdf=c-4.9.2,hdf5=1.12.2")),
        ])

        blocks["sb"] = (b"\x89HDF\r\n\x1a\n" + u8(0) + u8(0) + u8(0) + u8(0) +
                        u8(0) + u8(8) + u8(8) + u8(0) + u16(4) + u16(16) +
                        u32(0) + u64(0) + u64(UNDEF) + u64(eof) + u64(UNDEF) +
                        u64(0) + u64(addr["root_oh"]) + u32(1) + u32(0) +
                        u64(addr["btree"]) + u64(addr["heap"]))

        # ---- global heap: one DIMENSION_LIST ref payload per (var, axis)
        gobjs = []  # data blobs; object index = position+1

        def galloc(data: bytes) -> int:
            gobjs.append(data)
            return len(gobjs)

        def dimension_list(dim_names) -> bytes:
            els = b""
            for dn in dim_names:
                gi = galloc(u64(addr[oh_of[dn]]))
                els += u32(1) + u64(addr["gheap"]) + u32(gi)
            return attr_v1("DIMENSION_LIST", dt_vlen_of(dt_objref()),
                           ds_simple_v1([len(dim_names)]), els)

        def reference_list(var_names) -> bytes:
            payload = b"".join(u64(addr[oh_of[v]]) + struct.pack("<i", d) + b"\x00" * 4
                               for v, d in var_names)
            gi = galloc(payload)
            el = u32(len(var_names)) + u64(addr["gheap"]) + u32(gi)
            return attr_v1("REFERENCE_LIST", dt_vlen_of(dt_compound_ref_int()),
                           ds_simple_v1([1]), el)

        # dim scale headers (must allocate gheap objects in a fixed order)
        def dimscale_oh(name, values, dimid, refs):
            return object_header_v1([
                (0x0001, ds_simple_v1([len(values)])),
                (0x0003, dt_float(8)),
                (0x0005, fill_value_msg(None)),
                (0x0008, layout_contiguous(addr[f"{name}_data"], len(values) * 8)),
                (0x000C, attr_str("CLASS", "DIMENSION_SCALE")),
                (0x000C, attr_str("NAME", name)),
                (0x000C, attr_i4("_Netcdf4Dimid", dimid)),
                (0x000C, reference_list(refs)),
            ])

        var_dims = [("threshold_2y", 0), ("threshold_5y", 0),
                    ("threshold_20y", 0), ("upstream_area", 0)]
        blocks["lat_oh"] = dimscale_oh("lat", lat, 0, var_dims)
        blocks["lon_oh"] = dimscale_oh("lon", lon, 1,
                                       [(v, 1) for v, _ in var_dims])

        blocks["t2_oh"] = object_header_v1([
            (0x0001, ds_simple_v1([NLAT, NLON])),
            (0x0003, dt_float(4)),
            (0x0005, fill_value_msg(struct.pack("<f", -9999.0))),
            (0x000B, filter_pipeline(T2_FILTERS)),
            (0x0008, layout_chunked(addr["t2_btree"], (7, 9), 4)),
            (0x000C, dimension_list(["lat", "lon"])),
            (0x000C, attr_v1("_FillValue", dt_float(4), ds_simple_v1([1]),
                             struct.pack("<f", -9999.0))),
        ])
        blocks["t5_oh"] = object_header_v1([
            (0x0001, ds_simple_v1([NLAT, NLON])),
            (0x0003, dt_float(8)),
            (0x0005, fill_value_msg(None)),
            (0x0008, layout_contiguous(addr["t5_data"], t5.nbytes)),
            (0x000C, dimension_list(["lat", "lon"])),
        ])
        blocks["t20_oh"] = object_header_v1([
            (0x0001, ds_simple_v1([NLAT, NLON])),
            (0x0003, dt_float(8)),
            (0x0005, fill_value_msg(None)),
            (0x000B, filter_pipeline(T20_FILTERS)),
            (0x0008, layout_chunked(addr["t20_btree"], (10, 30), 8)),
            (0x000C, dimension_list(["lat", "lon"])),
        ])
        blocks["ua_oh"] = object_header_v1([
            (0x0001, ds_simple_v1([NLAT, NLON])),
            (0x0003, dt_fixed(4)),
            (0x0005, fill_value_msg(None)),
            (0x0008, layout_contiguous(addr["ua_data"], ua.nbytes)),
            (0x000C, dimension_list(["lat", "lon"])),
        ])

        blocks["t2_btree"] = btree_v1_chunks(
            t2_chunks, lambda i: addr[f"t2_chunk{i}"], (NLAT, NLON), (7, 9))
        blocks["t20_btree"] = btree_v1_chunks(
            t20_chunks, lambda i: addr[f"t20_chunk{i}"], (NLAT, NLON), (10, 30))

        # global heap collection (4096-byte standard size)
        g = bytearray()
        for i, data in enumerate(gobjs):
            g += u16(i + 1) + u16(1) + u32(0) + u64(len(data)) + pad8(data)
        head = b"GCOL" + u8(1) + b"\x00" * 3 + u64(4096)
        free = 4096 - len(head) - len(g)
        assert free >= 16, "grow the gheap collection"
        g += u16(0) + u16(0) + u32(0) + u64(free)
        blocks["gheap"] = head + bytes(g) + b"\x00" * (free - 16)

        blocks["lat_data"] = lat.tobytes()
        blocks["lon_data"] = lon.tobytes()
        blocks["t5_data"] = t5.tobytes()
        blocks["ua_data"] = ua.tobytes()
        for i, (_, raw) in enumerate(t2_chunks):
            blocks[f"t2_chunk{i}"] = raw
        for i, (_, raw) in enumerate(t20_chunks):
            blocks[f"t20_chunk{i}"] = raw
        return blocks

    # pass 1: zero addresses → sizes; pass 2: real addresses
    addr = {k: 0 for k in order}
    sizes = {k: len(v) for k, v in build(addr, 0).items()}
    off = 0
    for k in order:
        addr[k] = off
        off += sizes[k]
    blocks = build(addr, off)
    out = b"".join(blocks[k] for k in order)
    assert len(out) == off
    return out


# ================================================================ file 2: v2
NY, NX = 12, 16
x2 = np.array([100.25 + j * 0.5 for j in range(NX)], dtype=np.float64)
idx2 = np.arange(NY * NX, dtype=np.int64).reshape(NY, NX)
dis = (idx2 * np.float32(0.125) + np.float32(3.0)).astype(np.float32)
dis[(idx2 % 13) == 0] = np.float32(-1.0)
DIS_FILTERS = [(1, [5])]
dis_chunks = build_chunks(dis, (5, 7), np.float32(-1.0), DIS_FILTERS)


def msg_v2(mtype: int, body: bytes) -> bytes:
    return u8(mtype) + u16(len(body)) + u8(0) + body


def object_header_v2(messages) -> bytes:
    block = b"".join(msg_v2(t, b) for t, b in messages)
    # flags 0x20: size-of-chunk0 stored as 4 bytes (bits0-1 = 2)
    prefix = b"OHDR" + u8(2) + u8(0x02) + u32(len(block))
    whole = prefix + block
    return whole + u32(lookup3(whole))


def link_msg(name: str, oh_addr: int) -> bytes:
    nb = name.encode()
    # version 1, flags 0: hard link, 1-byte name length
    return u8(1) + u8(0) + u8(len(nb)) + nb + u64(oh_addr)


def build_v2():
    order = ["sb", "root_oh", "y_oh", "x_oh", "dis_oh", "dis_btree", "gheap",
             "x_data"]
    order += [f"dis_chunk{i}" for i in range(len(dis_chunks))]

    def build(addr, eof):
        blocks = {}
        sb = (b"\x89HDF\r\n\x1a\n" + u8(2) + u8(8) + u8(8) + u8(0) +
              u64(0) + u64(UNDEF) + u64(eof) + u64(addr["root_oh"]))
        blocks["sb"] = sb + u32(lookup3(sb))

        gobjs = []

        def galloc(data: bytes) -> int:
            gobjs.append(data)
            return len(gobjs)

        def dimension_list(dim_addrs) -> bytes:
            els = b""
            for da in dim_addrs:
                gi = galloc(u64(da))
                els += u32(1) + u64(addr["gheap"]) + u32(gi)
            return attr_v1("DIMENSION_LIST", dt_vlen_of(dt_objref()),
                           ds_simple_v1([len(dim_addrs)]), els)

        blocks["root_oh"] = object_header_v2([
            (0x0002, u8(0) + u8(0) + u64(UNDEF) + u64(UNDEF)),  # link info, compact
            (0x000A, u8(0) + u8(0)),                            # group info
            (0x0006, link_msg("y", addr["y_oh"])),
            (0x0006, link_msg("x", addr["x_oh"])),
            (0x0006, link_msg("discharge", addr["dis_oh"])),
        ])

        blocks["y_oh"] = object_header_v2([
            (0x0001, ds_simple_v2([NY])),
            (0x0003, dt_float(4)),
            (0x0005, fill_value_msg(None)),
            (0x0008, layout_contiguous(UNDEF, 0)),  # phony dim: no data
            (0x000C, attr_str("CLASS", "DIMENSION_SCALE")),
            (0x000C, attr_str(
                "NAME",
                "This is a netCDF dimension but not a netCDF variable.    12")),
            (0x000C, attr_i4("_Netcdf4Dimid", 0)),
        ])
        blocks["x_oh"] = object_header_v2([
            (0x0001, ds_simple_v2([NX])),
            (0x0003, dt_float(8)),
            (0x0005, fill_value_msg(None)),
            (0x0008, layout_contiguous(addr["x_data"], x2.nbytes)),
            (0x000C, attr_str("CLASS", "DIMENSION_SCALE")),
            (0x000C, attr_str("NAME", "x")),
            (0x000C, attr_i4("_Netcdf4Dimid", 1)),
        ])
        blocks["dis_oh"] = object_header_v2([
            (0x0001, ds_simple_v2([NY, NX])),
            (0x0003, dt_float(4)),
            (0x0005, fill_value_msg(struct.pack("<f", -1.0))),
            (0x000B, filter_pipeline(DIS_FILTERS)),
            (0x0008, layout_chunked(addr["dis_btree"], (5, 7), 4)),
            (0x000C, dimension_list([addr["y_oh"], addr["x_oh"]])),
            (0x000C, attr_v1("_FillValue", dt_float(4), ds_simple_v1([1]),
                             struct.pack("<f", -1.0))),
        ])
        blocks["dis_btree"] = btree_v1_chunks(
            dis_chunks, lambda i: addr[f"dis_chunk{i}"], (NY, NX), (5, 7))

        g = bytearray()
        for i, data in enumerate(gobjs):
            g += u16(i + 1) + u16(1) + u32(0) + u64(len(data)) + pad8(data)
        head = b"GCOL" + u8(1) + b"\x00" * 3 + u64(1024)
        free = 1024 - len(head) - len(g)
        assert free >= 16
        g += u16(0) + u16(0) + u32(0) + u64(free)
        blocks["gheap"] = head + bytes(g) + b"\x00" * (free - 16)

        blocks["x_data"] = x2.tobytes()
        for i, (_, raw) in enumerate(dis_chunks):
            blocks[f"dis_chunk{i}"] = raw
        return blocks

    addr = {k: 0 for k in order}
    sizes = {k: len(v) for k, v in build(addr, 0).items()}
    off = 0
    for k in order:
        addr[k] = off
        off += sizes[k]
    blocks = build(addr, off)
    out = b"".join(blocks[k] for k in order)
    assert len(out) == off
    return out


# ================================================================ mirrors
def mirror_v0():
    lat_col = np.repeat(lat, NLON)
    lon_col = np.tile(lon, NLAT)
    t2f = t2.reshape(-1).astype(np.float32)
    t2m = np.where(t2f == np.float32(-9999.0), None, t2f)
    return pa.table({
        "lat": pa.array(lat_col, pa.float64()),
        "lon": pa.array(lon_col, pa.float64()),
        "threshold_2y": pa.array(t2m.tolist(), pa.float32()),
        "threshold_5y": pa.array(t5.reshape(-1), pa.float64()),
        "threshold_20y": pa.array(t20.reshape(-1), pa.float64()),
        "upstream_area": pa.array(ua.reshape(-1), pa.int32()),
    })


def mirror_v2():
    y_col = np.repeat(np.arange(NY, dtype=np.float64), NX)
    x_col = np.tile(x2, NY)
    d = dis.reshape(-1).astype(np.float32)
    dm = np.where(d == np.float32(-1.0), None, d)
    return pa.table({
        "y": pa.array(y_col, pa.float64()),
        "x": pa.array(x_col, pa.float64()),
        "discharge": pa.array(dm.tolist(), pa.float32()),
    })


if __name__ == "__main__":
    v0 = build_v0()
    with open("data/netcdf/thresholds4.nc", "wb") as f:
        f.write(v0)
    pq.write_table(mirror_v0(), "data/netcdf/thresholds4_expected.parquet",
                   compression="snappy")
    v2 = build_v2()
    with open("data/netcdf/discharge4_v2.nc", "wb") as f:
        f.write(v2)
    pq.write_table(mirror_v2(), "data/netcdf/discharge4_v2_expected.parquet",
                   compression="snappy")
    print(f"thresholds4.nc: {len(v0)} bytes, {NLAT}x{NLON}, "
          f"{len(t2_chunks)}+{len(t20_chunks)} chunks")
    print(f"discharge4_v2.nc: {len(v2)} bytes, {NY}x{NX}, "
          f"{len(dis_chunks)} chunks")
