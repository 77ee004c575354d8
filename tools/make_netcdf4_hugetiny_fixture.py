#!/usr/bin/env python3
"""hugetiny4.nc — round-20 fixture for the LAST dense-group storage
classes: fractal-heap HUGE and TINY objects, alongside managed ones.

Like every binary fixture here, an INDEPENDENT from-spec implementation
(struct.pack per the public HDF5 File Format Specification v3.0 III.G) —
the Scala reader and this writer are two separate readings of the same
public spec, compared through the committed parquet mirror.

Heap-ID classes exercised (all four the unfiltered format defines):
  - MANAGED links/attrs (offset+length into direct blocks), here with an
    EXPLICIT id_len larger than the managed minimum — the spec's
    independent heap-ID-length field, zero-padded managed IDs;
  - a TINY link ("z": its 12-byte link message rides INSIDE the 13-byte
    heap ID, short form — 4 length bits in the version/type byte);
  - a HUGE INDIRECT link ("v_with_a_name_past_the_managed_cap": 45-byte
    link message > the heap's 40-byte managed cap, spilled raw and
    indexed by the heap's own type-1 v2 B-tree; id_len 13 < 17 so the ID
    carries a B-tree key, the libhdf5 default for dense links);
  - a HUGE DIRECT attribute ("provenance" on v_att: > the attribute
    heap's 128-byte cap, with id_len 17 — address+length ride the heap
    ID itself, the H5HF rule `id_len >= 1 + sizeof(addr) + sizeof(len)`).
    The deletion-tracking type-3 B-tree libhdf5 would also write is
    omitted: readers never consult it for direct IDs.

Structure: superblock v2; root group with DENSE links (6 links: y, x,
z, v_medium, the huge-named var, v_att — fractal heap with one root
direct block + type-5 name index); dims y=4 (real f8 coordinate),
x=3 (phony); vars all i4 contiguous 4x3. v_att's attributes are DENSE
(Attribute Info message): DIMENSION_LIST managed (load-bearing — a
reader that skips the dense store cannot resolve the dims) + the huge
"provenance" string.

Run once, commit outputs:
  python3 tools/make_netcdf4_hugetiny_fixture.py
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
    dt_vlen_of, dt_string, ds_simple_v1, ds_simple_v2, ds_scalar_v2, attr_v1,
    attr_str, attr_i4, fill_value_msg, layout_contiguous, object_header_v2,
    link_msg)
from make_netcdf4_dense_fixture import attr_v3  # noqa: E402

NY, NX = 4, 3
y_c = np.array([20.0 + 0.25 * i for i in range(NY)], dtype=np.float64)
idx = np.arange(NY * NX, dtype=np.int64).reshape(NY, NX)
HUGE_NAME = "v_with_a_name_past_the_managed_cap"  # 34 chars -> 45-byte link
VAR_NAMES = ["z", "v_medium", HUGE_NAME, "v_att"]
var_data = {nm: (idx * (k + 2) + 3 * k).astype(np.int32)
            for k, nm in enumerate(VAR_NAMES)}

# ---- link heap geometry: managed minimum is 1+4+1=6; id_len 13 leaves
# room for tiny objects up to 12 bytes and keeps huge IDs indirect
L_WIDTH, L_START, L_MAXDIRECT = 4, 512, 4096
L_MAXBITS, L_MAXOBJ, L_IDLEN = 32, 40, 13
L_DB_HDR = 4 + 1 + 8 + 4 + 4  # sig+ver+heapaddr+off(4)+checksum

# ---- attribute heap geometry (v_att): id_len 17 -> huge IDs DIRECT
A_WIDTH, A_START, A_MAXDIRECT = 4, 512, 4096
A_MAXBITS, A_MAXOBJ, A_IDLEN = 32, 128, 17
A_DB_HDR = 4 + 1 + 8 + 4 + 4

PROVENANCE = ("written by make_netcdf4_hugetiny_fixture.py from the public "
              "HDF5 file format specification v3.0 section III.G; this "
              "attribute exists to overflow the 128-byte managed-object cap "
              "of its dense-attribute fractal heap so it is stored as a "
              "huge object with a direct heap ID")


def frhp(idlen, maxobj, next_huge, huge_bt, managed, alloc, n_managed,
         huge_size, n_huge, tiny_size, n_tiny, width, start, maxdirect,
         maxbits, root_addr, cur_rows):
    b = (b"FRHP" + u8(0) + u16(idlen) + u16(0) + u8(0x2) +
         u32(maxobj) + u64(next_huge) + u64(huge_bt) +
         u64(0) + u64(UNDEF) + u64(managed) + u64(alloc) + u64(alloc) +
         u64(n_managed) +
         u64(huge_size) + u64(n_huge) + u64(tiny_size) + u64(n_tiny) +
         u16(width) + u64(start) + u64(maxdirect) +
         u16(maxbits) + u16(1) + u64(root_addr) + u16(cur_rows))
    return b + u32(lookup3(b))


def btree_v2(btype, record_size, leaf_addr, nrec):
    b = (b"BTHD" + u8(0) + u8(btype) + u32(512) + u16(record_size) + u16(0) +
         u8(100) + u8(40) + u64(leaf_addr) + u16(nrec) + u64(nrec))
    return b + u32(lookup3(b))


def btree_leaf(btype, records):
    b = b"BTLF" + u8(0) + u8(btype) + b"".join(records)
    return b + u32(lookup3(b))


def build():
    order = ["sb", "root_oh", "y_oh", "x_oh"]
    order += [f"var{k}_oh" for k in range(len(VAR_NAMES))]
    order += ["frhp", "fdb0", "hugelink_obj", "hbthd", "hbtleaf",
              "bthd", "btleaf",
              "afrhp", "afdb0", "hugeattr_obj", "abthd", "abtleaf",
              "gheap", "y_data"]
    order += [f"var{k}_data" for k in range(len(VAR_NAMES))]

    def build_at(addr, eof):
        blocks = {}
        sb = (b"\x89HDF\r\n\x1a\n" + u8(2) + u8(8) + u8(8) + u8(0) +
              u64(0) + u64(UNDEF) + u64(eof) + u64(addr["root_oh"]))
        blocks["sb"] = sb + u32(lookup3(sb))

        gobjs = []

        def galloc(data):
            gobjs.append(data)
            return len(gobjs)

        def dimension_list_data():
            els = b""
            for da in (addr["y_oh"], addr["x_oh"]):
                gi = galloc(u64(da))
                els += u32(1) + u64(addr["gheap"]) + u32(gi)
            return els

        def dimension_list():
            return attr_v1("DIMENSION_LIST", dt_vlen_of(dt_objref()),
                           ds_simple_v1([2]), dimension_list_data())

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
        for k, nm in enumerate(VAR_NAMES):
            msgs = [
                (0x0001, ds_simple_v2([NY, NX])),
                (0x0003, dt_fixed(4)),
                (0x0005, fill_value_msg(None)),
                (0x0008, layout_contiguous(addr[f"var{k}_data"],
                                           var_data[nm].nbytes)),
            ]
            if nm == "v_att":  # dense attrs: DIMENSION_LIST load-bearing
                msgs.append((0x0015, u8(0) + u8(0) + u64(addr["afrhp"]) +
                             u64(addr["abthd"])))
            else:
                msgs.append((0x000C, dimension_list()))
            blocks[f"var{k}_oh"] = object_header_v2(msgs)

        # ---- link heap: one root DIRECT block with the managed links
        oh_of = {"y": "y_oh", "x": "x_oh"}
        oh_of.update({nm: f"var{k}_oh" for k, nm in enumerate(VAR_NAMES)})
        managed_links = ["y", "x", "v_medium", "v_att"]
        placement = {}
        off = L_DB_HDR
        ldb = bytearray(L_START)
        ldb[0:4] = b"FHDB"
        ldb[4] = 0
        struct.pack_into("<Q", ldb, 5, addr["frhp"])
        struct.pack_into("<I", ldb, 13, 0)
        for nm in managed_links:
            body = link_msg(nm, addr[oh_of[nm]])
            assert len(body) <= L_MAXOBJ, (nm, len(body))
            placement[nm] = (off, len(body))
            ldb[off:off + len(body)] = body
            off += len(body)
        struct.pack_into("<I", ldb, 17, lookup3(bytes(ldb)))
        blocks["fdb0"] = bytes(ldb)

        # ---- huge link: raw object + type-1 (indirect, non-filtered) index
        huge_body = link_msg(HUGE_NAME, addr[oh_of[HUGE_NAME]])
        assert len(huge_body) > L_MAXOBJ, len(huge_body)
        blocks["hugelink_obj"] = huge_body
        hrec = u64(addr["hugelink_obj"]) + u64(len(huge_body)) + u64(1)
        blocks["hbtleaf"] = btree_leaf(1, [hrec])
        blocks["hbthd"] = btree_v2(1, 24, addr["hbtleaf"], 1)

        # ---- tiny link: the message IS the heap ID payload
        tiny_body = link_msg("z", addr[oh_of["z"]])
        assert len(tiny_body) <= L_IDLEN - 1, len(tiny_body)

        def managed_id(o, ln):
            return (u8(0) + u32(o) + u8(ln)).ljust(L_IDLEN, b"\x00")
        heap_ids = {nm: managed_id(*placement[nm]) for nm in managed_links}
        heap_ids[HUGE_NAME] = (u8(0x10) +
                               (1).to_bytes(8, "little")).ljust(L_IDLEN, b"\x00")
        heap_ids["z"] = (u8(0x20 | (len(tiny_body) - 1)) +
                         tiny_body).ljust(L_IDLEN, b"\x00")

        blocks["frhp"] = frhp(
            L_IDLEN, L_MAXOBJ, next_huge=2, huge_bt=addr["hbthd"],
            managed=L_START, alloc=L_START, n_managed=len(managed_links),
            huge_size=len(huge_body), n_huge=1,
            tiny_size=len(tiny_body), n_tiny=1,
            width=L_WIDTH, start=L_START, maxdirect=L_MAXDIRECT,
            maxbits=L_MAXBITS, root_addr=addr["fdb0"], cur_rows=0)

        # ---- name index (type 5): hash + heap ID, ALL six links
        all_names = managed_links + [HUGE_NAME, "z"]
        recs = sorted((lookup3(nm.encode()), heap_ids[nm]) for nm in all_names)
        blocks["btleaf"] = btree_leaf(5, [u32(h) + hid for h, hid in recs])
        blocks["bthd"] = btree_v2(5, 4 + L_IDLEN, addr["btleaf"], len(recs))

        # ---- v_att's dense attributes: managed DIMENSION_LIST + huge
        # DIRECT provenance (id_len 17 -> address+length in the ID; the
        # type-3 deletion-tracking tree is intentionally not written)
        dl_body = attr_v3("DIMENSION_LIST", dt_vlen_of(dt_objref()),
                          ds_simple_v1([2]), dimension_list_data())
        assert len(dl_body) <= A_MAXOBJ, len(dl_body)
        val = PROVENANCE.encode() + b"\x00"
        prov_body = attr_v3("provenance", dt_string(len(val)),
                            ds_scalar_v2(), val)
        assert len(prov_body) > A_MAXOBJ, len(prov_body)
        blocks["hugeattr_obj"] = prov_body

        adb = bytearray(A_START)
        adb[0:4] = b"FHDB"
        adb[4] = 0
        struct.pack_into("<Q", adb, 5, addr["afrhp"])
        struct.pack_into("<I", adb, 13, 0)
        adb[A_DB_HDR:A_DB_HDR + len(dl_body)] = dl_body
        struct.pack_into("<I", adb, 17, lookup3(bytes(adb)))
        blocks["afdb0"] = bytes(adb)

        def attr_rec(hid, corder, name):
            return hid + u8(0) + u32(corder) + u32(lookup3(name.encode()))
        dl_id = (u8(0) + u32(A_DB_HDR) + u8(len(dl_body))).ljust(A_IDLEN, b"\x00")
        prov_id = u8(0x10) + u64(addr["hugeattr_obj"]) + u64(len(prov_body))
        assert len(prov_id) == A_IDLEN
        arecs = sorted([(lookup3(b"DIMENSION_LIST"),
                         attr_rec(dl_id, 0, "DIMENSION_LIST")),
                        (lookup3(b"provenance"),
                         attr_rec(prov_id, 1, "provenance"))])
        blocks["abtleaf"] = btree_leaf(8, [r for _, r in arecs])
        blocks["abthd"] = btree_v2(8, A_IDLEN + 9, addr["abtleaf"], len(arecs))
        blocks["afrhp"] = frhp(
            A_IDLEN, A_MAXOBJ, next_huge=2, huge_bt=UNDEF,
            managed=A_START, alloc=A_START, n_managed=1,
            huge_size=len(prov_body), n_huge=1, tiny_size=0, n_tiny=0,
            width=A_WIDTH, start=A_START, maxdirect=A_MAXDIRECT,
            maxbits=A_MAXBITS, root_addr=addr["afdb0"], cur_rows=0)

        blocks["root_oh"] = object_header_v2([
            (0x0002, u8(0) + u8(0) + u64(addr["frhp"]) + u64(addr["bthd"])),
            (0x000A, u8(0) + u8(0)),
        ])

        # ---- global heap (DIMENSION_LIST refs: 4 vars x 2 dims)
        g = bytearray()
        for i, data in enumerate(gobjs):
            g += u16(i + 1) + u16(1) + u32(0) + u64(len(data)) + pad8(data)
        head = b"GCOL" + u8(1) + b"\x00" * 3 + u64(512)
        free = 512 - len(head) - len(g)
        assert free >= 16, "grow the gheap collection"
        g += u16(0) + u16(0) + u32(0) + u64(free)
        blocks["gheap"] = head + bytes(g) + b"\x00" * (free - 16)

        blocks["y_data"] = y_c.tobytes()
        for k, nm in enumerate(VAR_NAMES):
            blocks[f"var{k}_data"] = var_data[nm].tobytes()
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
    with open("data/netcdf/hugetiny4.nc", "wb") as f:
        f.write(data)
    pq.write_table(mirror(), "data/netcdf/hugetiny4_expected.parquet",
                   compression="snappy")
    print(f"hugetiny4.nc: {len(data)} bytes — managed + tiny + huge-indirect "
          "links, managed + huge-direct dense attrs")
