#!/usr/bin/env python3
"""deepdense4.nc — round-19 fixture for the LARGE dense-group shapes: a
root group whose link storage needs NESTED fractal-heap indirect blocks
(the H5HF doubling table past the direct rows) and whose name index is a
DEPTH-2 v2 B-tree — what a group accumulates at many thousands of links
with libhdf5's default geometry, forced here at committed-fixture size by
a tiny from-spec geometry (width 2, 64-byte start blocks, 128-byte max
direct blocks, 74-byte B-tree nodes).

Like every binary fixture here, an INDEPENDENT from-spec implementation
(struct.pack per the public HDF5 File Format Specification v3.0 III.D/
III.A.2) — the Scala reader and this writer are two separate readings of
the same public spec, compared through the committed parquet mirror.

Structure:
  heap: root indirect block of 4 rows (width 2): rows 0-1 = 64-byte
        direct blocks, row 2 = 128-byte direct blocks, row 3 = TWO CHILD
        INDIRECT BLOCKS (span 256 each, 2 rows x 2 cols of 64-byte
        directs; the second child half-empty with Undef slots); 2 links
        per direct block -> 11 blocks for 22 links;
  index: BTHD depth 2, node size 74 (leaf cap 5, internal cap 2): root
        (1 record) -> internal A (2 records, 3 leaves of 4) + internal B
        (1 record, 2 leaves of 3), records sorted by lookup3 name hash;
  dims: y=4 (real f8 coordinate), x=3 (phony);
  vars: v00..v19, i4 contiguous 4x3 (20 vars so the link count forces
        the deep shapes).

Run once, commit outputs:
  python3 tools/make_netcdf4_deepdense_fixture.py
"""
import os
import struct
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_netcdf4_fixture import (  # noqa: E402
    UNDEF, u8, u16, u32, u64, pad8, lookup3, dt_fixed, dt_float, dt_objref,
    dt_vlen_of, ds_simple_v1, ds_simple_v2, attr_v1, attr_str, attr_i4,
    fill_value_msg, layout_contiguous, object_header_v2, link_msg)

NY, NX = 4, 3
y_c = np.array([10.0 + 0.5 * i for i in range(NY)], dtype=np.float64)
idx = np.arange(NY * NX, dtype=np.int64).reshape(NY, NX)
NVARS = 20
VAR_NAMES = [f"v{k:02d}" for k in range(NVARS)]
var_data = {nm: (idx * (k + 1) + 7 * k).astype(np.int32)
            for k, nm in enumerate(VAR_NAMES)}

# ---- heap geometry (tiny, to force nesting at fixture size)
WIDTH = 2
START = 64
MAXDIRECT = 128
MAXBITS = 32            # -> 4-byte heap-ID offsets
MAXOBJ = 4096           # -> 2-byte heap-ID lengths
DB_HDR = 4 + 1 + 8 + 4 + 4
LINKS_PER_BLOCK = 2

# direct blocks in heap-offset order: (name, heap_off, size)
DIRECTS = ([(f"d{i}", i * 64, 64) for i in range(4)] +          # rows 0-1
           [("d4", 256, 128), ("d5", 384, 128)] +               # row 2
           [(f"d{6 + j}", 512 + j * 64, 64) for j in range(4)] +  # child 0
           [("d10", 768, 64)])                                  # child 1

# ---- name-index structure: 22 records over a depth-2 tree
NODE_SIZE = 74  # leaf cap (74-10)//11 = 5; internal cap 2 at depths 1-2


def build():
    names = ["y", "x"] + VAR_NAMES
    assert len(names) == 22
    order = ["sb", "root_oh", "y_oh", "x_oh"]
    order += [f"{v}_oh" for v in VAR_NAMES]
    order += ["frhp", "fhib", "fhib_c0", "fhib_c1"]
    order += [nm for nm, _, _ in DIRECTS]
    order += ["bthd", "bt_root", "bt_intA", "bt_intB",
              "bt_leaf0", "bt_leaf1", "bt_leaf2", "bt_leaf3", "bt_leaf4"]
    order += ["gheap", "y_data"]
    order += [f"{v}_data" for v in VAR_NAMES]

    # link placement: 2 per direct block, in heap-offset order
    placement = {}  # name -> (heap_off, len)
    for i, nm in enumerate(names):
        blk_name, blk_off, _ = DIRECTS[i // LINKS_PER_BLOCK]
        within = DB_HDR + (i % LINKS_PER_BLOCK) * 14
        placement[nm] = (blk_off + within, len(link_msg(nm, 0)))

    def build_at(addr, eof):
        blocks = {}
        sb = (b"\x89HDF\r\n\x1a\n" + u8(2) + u8(8) + u8(8) + u8(0) +
              u64(0) + u64(UNDEF) + u64(eof) + u64(addr["root_oh"]))
        blocks["sb"] = sb + u32(lookup3(sb))

        gobjs = []

        def galloc(data):
            gobjs.append(data)
            return len(gobjs)

        def dimension_list():
            els = b""
            for da in (addr["y_oh"], addr["x_oh"]):
                gi = galloc(u64(da))
                els += u32(1) + u64(addr["gheap"]) + u32(gi)
            return attr_v1("DIMENSION_LIST", dt_vlen_of(dt_objref()),
                           ds_simple_v1([2]), els)

        blocks["y_oh"] = object_header_v2([
            (0x0001, ds_simple_v2([NY])),
            (0x0003, dt_float(8)),
            (0x0005, fill_value_msg(None)),
            (0x0008, layout_contiguous(addr["y_data"], y_c.nbytes)),
            (0x000C, attr_str("CLASS", "DIMENSION_SCALE")),
            (0x000C, attr_str("NAME", "y")),
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
                "This is a netCDF dimension but not a netCDF variable.     3")),
            (0x000C, attr_i4("_Netcdf4Dimid", 1)),
        ])
        for nm in VAR_NAMES:
            blocks[f"{nm}_oh"] = object_header_v2([
                (0x0001, ds_simple_v2([NY, NX])),
                (0x0003, dt_fixed(4)),
                (0x0005, fill_value_msg(None)),
                (0x0008, layout_contiguous(addr[f"{nm}_data"],
                                           var_data[nm].nbytes)),
                (0x000C, dimension_list()),
            ])

        # ---- direct blocks (checksummed, 2 links each)
        by_block = {}
        for i, nm in enumerate(names):
            by_block.setdefault(i // LINKS_PER_BLOCK, []).append(nm)
        for bi, (bnm, boff, bsize) in enumerate(DIRECTS):
            data = bytearray(bsize)
            data[0:4] = b"FHDB"
            data[4] = 0
            struct.pack_into("<Q", data, 5, addr["frhp"])
            struct.pack_into("<I", data, 13, boff)
            for nm in by_block.get(bi, []):
                body = link_msg(nm, addr[f"{nm}_oh"])
                off, ln = placement[nm]
                assert ln == len(body) and boff <= off and \
                    off + ln <= boff + bsize, (nm, off, ln, boff, bsize)
                local = off - boff
                data[local:local + ln] = body
            struct.pack_into("<I", data, 17, lookup3(bytes(data)))
            blocks[bnm] = bytes(data)

        # ---- indirect blocks: root (4 rows) + two children (2 rows)
        def fhib(name, block_off, entries):
            b = (b"FHIB" + u8(0) + u64(addr["frhp"]) + u32(block_off) +
                 b"".join(u64(a) for a in entries))
            blocks[name] = b + u32(lookup3(b))
        fhib("fhib_c0", 512, [addr["d6"], addr["d7"], addr["d8"], addr["d9"]])
        fhib("fhib_c1", 768, [addr["d10"], UNDEF, UNDEF, UNDEF])
        fhib("fhib", 0, [addr["d0"], addr["d1"], addr["d2"], addr["d3"],
                         addr["d4"], addr["d5"],
                         addr["fhib_c0"], addr["fhib_c1"]])

        total_links_bytes = sum(ln for _, ln in placement.values())
        managed = 1024  # rows 0-3 span: 128+128+256+512
        frhp = (b"FRHP" + u8(0) + u16(7) + u16(0) + u8(0x2) +
                u32(MAXOBJ) + u64(0) + u64(UNDEF) +
                u64(managed - total_links_bytes - len(DIRECTS) * DB_HDR) +
                u64(UNDEF) + u64(managed) + u64(sum(s for _, _, s in DIRECTS)) +
                u64(placement[names[-1]][0] + placement[names[-1]][1]) +
                u64(len(names)) +
                u64(0) + u64(0) + u64(0) + u64(0) +
                u16(WIDTH) + u64(START) + u64(MAXDIRECT) +
                u16(MAXBITS) + u16(4) + u64(addr["fhib"]) + u16(4))
        blocks["frhp"] = frhp + u32(lookup3(frhp))

        # ---- name-index v2 B-tree, depth 2
        def heap_id(off, ln):
            return u8(0) + u32(off) + u16(ln)
        recs = sorted((lookup3(nm.encode()),
                       heap_id(*placement[nm])) for nm in names)
        rb = [u32(h) + hid for h, hid in recs]

        def leaf(name, lo, hi):
            b = b"BTLF" + u8(0) + u8(5) + b"".join(rb[lo:hi])
            blocks[name] = b + u32(lookup3(b))
        leaf("bt_leaf0", 0, 4)
        leaf("bt_leaf1", 5, 9)
        leaf("bt_leaf2", 10, 14)
        leaf("bt_leaf3", 15, 18)
        leaf("bt_leaf4", 19, 22)

        def internal(name, recs_ix, children, tot_size):
            b = b"BTIN" + u8(0) + u8(5) + b"".join(rb[i] for i in recs_ix)
            for (a, n, tot) in children:
                b += u64(a) + u8(n)
                if tot_size:
                    b += int(tot).to_bytes(tot_size, "little")
            blocks[name] = b + u32(lookup3(b))
        internal("bt_intA", [4, 9],
                 [(addr["bt_leaf0"], 4, 4), (addr["bt_leaf1"], 4, 4),
                  (addr["bt_leaf2"], 4, 4)], tot_size=0)
        internal("bt_intB", [18],
                 [(addr["bt_leaf3"], 3, 3), (addr["bt_leaf4"], 3, 3)],
                 tot_size=0)
        internal("bt_root", [14],
                 [(addr["bt_intA"], 2, 14), (addr["bt_intB"], 1, 7)],
                 tot_size=1)
        bthd = (b"BTHD" + u8(0) + u8(5) + u32(NODE_SIZE) + u16(11) + u16(2) +
                u8(100) + u8(40) + u64(addr["bt_root"]) + u16(1) +
                u64(len(recs)))
        blocks["bthd"] = bthd + u32(lookup3(bthd))

        blocks["root_oh"] = object_header_v2([
            (0x0002, u8(0) + u8(0) + u64(addr["frhp"]) + u64(addr["bthd"])),
            (0x000A, u8(0) + u8(0)),
        ])

        # ---- global heap (DIMENSION_LIST refs: 20 vars x 2 dims)
        g = bytearray()
        for i, data in enumerate(gobjs):
            g += u16(i + 1) + u16(1) + u32(0) + u64(len(data)) + pad8(data)
        head = b"GCOL" + u8(1) + b"\x00" * 3 + u64(2048)
        free = 2048 - len(head) - len(g)
        assert free >= 16, "grow the gheap collection"
        g += u16(0) + u16(0) + u32(0) + u64(free)
        blocks["gheap"] = head + bytes(g) + b"\x00" * (free - 16)

        blocks["y_data"] = y_c.tobytes()
        for nm in VAR_NAMES:
            blocks[f"{nm}_data"] = var_data[nm].tobytes()
        return blocks

    addr = {k: 0 for k in order}
    sizes = {k: len(v) for k, v in build_at(addr, 0).items()}
    assert set(sizes) == set(order), sorted(set(order) ^ set(sizes))
    off = 0
    for k in order:
        addr[k] = off
        off += sizes[k]
    blocks = build_at(addr, off)
    out = b"".join(blocks[k] for k in order)
    assert len(out) == off
    return out


def mirror():
    cols = {
        "y": pa.array(np.repeat(y_c, NX), pa.float64()),
        "x": pa.array(np.tile(np.arange(NX, dtype=np.float64), NY),
                      pa.float64()),
    }
    for nm in VAR_NAMES:
        cols[nm] = pa.array(var_data[nm].reshape(-1), pa.int32())
    return pa.table(cols)


if __name__ == "__main__":
    data = build()
    with open("data/netcdf/deepdense4.nc", "wb") as f:
        f.write(data)
    pq.write_table(mirror(), "data/netcdf/deepdense4_expected.parquet",
                   compression="snappy")
    print(f"deepdense4.nc: {len(data)} bytes, {NVARS} vars, nested-indirect "
          "heap (11 direct blocks over 2 child iblocks) + depth-2 name index")
