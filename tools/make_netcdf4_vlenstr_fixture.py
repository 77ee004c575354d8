#!/usr/bin/env python3
"""vlenstr4.nc — round-20 fixture for NC_STRING (vlen string) metadata:
real GloFAS-family aux rasters carry string attributes (`units`,
`long_name`) and occasionally write the dimension-scale internals as
NC_STRING instead of the classic fixed text — a metadata reader that
chokes on a string attribute it does not even need would falsely reject
the whole raster.

Like every binary fixture here, an INDEPENDENT from-spec implementation
(struct.pack per the public HDF5 File Format Specification v3.0).

Coverage:
  - the y dimension scale's load-bearing NAME and CLASS attributes are
    VLEN STRINGS (class 9, string base) whose bytes live in the GLOBAL
    HEAP — the reader must resolve them through the same machinery as
    DIMENSION_LIST's object references or it cannot even identify the
    coordinate variable;
  - the data variable carries NC_STRING `units` and `long_name`
    attributes the reader must tolerate (framed and skipped — their
    16-byte vlen descriptors must never be misread as text);
  - strvar4.nc (second output, spec-only): a file whose DATA variable is
    itself NC_STRING — pinned to reject LOUDLY by name (no table-column
    mapping exists), never to decode garbage.

Run once, commit outputs:
  python3 tools/make_netcdf4_vlenstr_fixture.py
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_netcdf4_fixture import (  # noqa: E402
    UNDEF, u8, u16, u32, u64, pad8, lookup3, dt_fixed, dt_float, dt_objref,
    dt_vlen_of, dt_string, ds_simple_v1, ds_simple_v2, ds_scalar_v2, attr_v1,
    attr_str, attr_i4, fill_value_msg, layout_contiguous, object_header_v2,
    link_msg)

NY, NX = 5, 4
y_c = np.array([40.0 - 0.5 * i for i in range(NY)], dtype=np.float64)
v = (np.arange(NY * NX, dtype=np.float32).reshape(NY, NX) * 0.25 + 2.0)


def dt_vlen_string() -> bytes:
    # class 9 v1, type = string (bits 0-3 of flags = 1), nul-padded ASCII
    return u8(0x19) + u8(0x01) + u8(0) + u8(0) + u32(16) + dt_string(1)


def build(string_var: bool):
    order = ["sb", "root_oh", "y_oh", "x_oh", "v_oh", "gheap", "y_data",
             "v_data"]

    def build_at(addr, eof):
        blocks = {}
        sb = (b"\x89HDF\r\n\x1a\n" + u8(2) + u8(8) + u8(8) + u8(0) +
              u64(0) + u64(UNDEF) + u64(eof) + u64(addr["root_oh"]))
        blocks["sb"] = sb + u32(lookup3(sb))

        gobjs = []

        def galloc(data):
            gobjs.append(data)
            return len(gobjs)

        def vlen_str_attr(name, value):
            data = value.encode() + b"\x00"
            gi = galloc(data)
            return attr_v1(name, dt_vlen_string(), ds_scalar_v2(),
                           u32(len(data)) + u64(addr["gheap"]) + u32(gi))

        def dimension_list():
            els = b""
            for da in (addr["y_oh"], addr["x_oh"]):
                gi = galloc(u64(da))
                els += u32(1) + u64(addr["gheap"]) + u32(gi)
            return attr_v1("DIMENSION_LIST", dt_vlen_of(dt_objref()),
                           ds_simple_v1([2]), els)

        # y's NAME and CLASS are NC_STRING — load-bearing vlen resolution
        blocks["y_oh"] = object_header_v2([
            (0x0001, ds_simple_v2([NY])),
            (0x0003, dt_float(8)),
            (0x0005, fill_value_msg(None)),
            (0x0008, layout_contiguous(addr["y_data"], y_c.nbytes)),
            (0x000C, vlen_str_attr("CLASS", "DIMENSION_SCALE")),
            (0x000C, vlen_str_attr("NAME", "y")),
            (0x000C, attr_i4("_Netcdf4Dimid", 0)),
        ])
        blocks["x_oh"] = object_header_v2([
            (0x0001, ds_simple_v2([NX])),
            (0x0003, dt_float(4)),
            (0x0005, fill_value_msg(None)),
            (0x0008, layout_contiguous(UNDEF, 0)),
            (0x000C, attr_str("CLASS", "DIMENSION_SCALE")),
            (0x000C, attr_str(
                "NAME",
                "This is a netCDF dimension but not a netCDF variable.     4")),
            (0x000C, attr_i4("_Netcdf4Dimid", 1)),
        ])
        blocks["v_oh"] = object_header_v2([
            (0x0001, ds_simple_v2([NY, NX])),
            (0x0003, dt_vlen_string() if string_var else dt_float(4)),
            (0x0005, fill_value_msg(None)),
            (0x0008, layout_contiguous(addr["v_data"], v.nbytes)),
            (0x000C, dimension_list()),
            # NC_STRING attrs the reader must tolerate without decoding
            (0x000C, vlen_str_attr("units", "m3 s-1")),
            (0x000C, vlen_str_attr("long_name",
                                   "river discharge in the last 24 hours")),
        ])

        blocks["root_oh"] = object_header_v2([
            (0x0002, u8(0) + u8(0) + u64(UNDEF) + u64(UNDEF)),
            (0x000A, u8(0) + u8(0)),
            (0x0006, link_msg("y", addr["y_oh"])),
            (0x0006, link_msg("x", addr["x_oh"])),
            (0x0006, link_msg("discharge", addr["v_oh"])),
        ])

        g = bytearray()
        for i, data in enumerate(gobjs):
            g += u16(i + 1) + u16(1) + u32(0) + u64(len(data)) + pad8(data)
        head = b"GCOL" + u8(1) + b"\x00" * 3 + u64(512)
        free = 512 - len(head) - len(g)
        assert free >= 16, "grow the gheap collection"
        g += u16(0) + u16(0) + u32(0) + u64(free)
        blocks["gheap"] = head + bytes(g) + b"\x00" * (free - 16)

        blocks["y_data"] = y_c.tobytes()
        blocks["v_data"] = v.tobytes()
        return blocks

    addr = {k: 0 for k in order}
    sizes = {k: len(vv) for k, vv in build_at(addr, 0).items()}
    off = 0
    for k in order:
        addr[k] = off
        off += sizes[k]
    blocks = build_at(addr, off)
    out = b"".join(blocks[k] for k in order)
    assert len(out) == off
    return out


def mirror():
    return pa.table({
        "y": pa.array(np.repeat(y_c, NX), pa.float64()),
        "x": pa.array(np.tile(np.arange(NX, dtype=np.float64), NY),
                      pa.float64()),
        "discharge": pa.array(v.reshape(-1), pa.float32()),
    })


if __name__ == "__main__":
    data = build(string_var=False)
    with open("data/netcdf/vlenstr4.nc", "wb") as f:
        f.write(data)
    pq.write_table(mirror(), "data/netcdf/vlenstr4_expected.parquet",
                   compression="snappy")
    bad = build(string_var=True)
    with open("data/netcdf/strvar4.nc", "wb") as f:
        f.write(bad)
    print(f"vlenstr4.nc: {len(data)} bytes (NC_STRING attrs + vlen NAME/CLASS "
          f"scale); strvar4.nc: {len(bad)} bytes (NC_STRING data var, "
          "spec-pinned loud reject)")
