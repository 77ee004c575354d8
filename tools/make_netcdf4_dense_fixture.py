#!/usr/bin/env python3
"""dense4.nc — the round-18 headline fixture: an HDF5/NetCDF-4 file whose
root group uses DENSE link storage (fractal heap + v2 B-tree name index),
the layout real netCDF-4 writers emit once a group passes the compact
threshold (8 links by default — i.e. any file with more than a handful of
variables), with data layout message VERSION 4 chunk indexes (libhdf5
1.10+ / libver-latest): single chunk, implicit, and fixed array (filtered
and unfiltered), mixed with classic v3 layouts in the same group.

Like every binary fixture here, this is an INDEPENDENT from-spec
implementation (struct.pack per the public HDF5 File Format Specification
v3.0 III.A.2/III.G/IV.A.2.i) — no HDF5 library exists in this
environment, so the Scala reader and this writer are two separate
readings of the same public spec, differentially compared through the
committed parquet mirror.

Structure:
  superblock v2; root OHDR v2 with a Link Info message whose fractal heap
  and name-index v2 B-tree addresses are REAL (no link messages);
  heap: root INDIRECT block (FHIB), one row of four 256-byte direct
        blocks — three allocated (checksummed FHDB), one Undef slot;
        link messages packed ≤6 per block so the multi-block path is
        exercised;
  index: BTHD depth 0, one BTLF leaf holding all 14 records sorted by
        lookup3 name hash, 7-byte managed heap IDs (4-byte offsets from
        the 32-bit max-heap-size, 2-byte lengths from the 4096-byte max
        object size);
  dims: y=11 (real f8 coordinate), x=9 (phony → indices);
  vars (all y×x): v_contig4 f4 v4-contiguous (+fills), v_compact4 i4
        v4-compact, v_single f8 v4-single-chunk, v_single_filt f4
        v4-single-chunk+deflate (flags bit1: filtered size+mask),
        v_implicit i2 v4-implicit (4×5 chunks), v_fixed f4
        v4-fixed-array client 0 (3×4 chunks, chunk 7 UNALLOCATED → fill),
        v_fixed_filt f8 v4-fixed-array client 1
        (shuffle+deflate+fletcher32, 5×4 chunks), v_btree1 f4 v3
        B-tree-v1 chunked deflate, v_u2 u2 v4-contiguous (values past the
        signed short range — the widening proof), v_i8 i8 v4-single,
        v_f8c f8 v3-contiguous, v_i1 i1 v4-implicit (6×9 chunks);
  v_fixed_filt additionally stores its attributes DENSELY (Attribute
  Info message → 8-byte-heap-ID fractal heap + type-8 v2 B-tree, v3
  attribute messages as heap objects) with DIMENSION_LIST inside — the
  load-bearing case a reader that skipped dense attributes would break.

Run once, commit outputs:
  python3 tools/make_netcdf4_dense_fixture.py
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
    dt_vlen_of, ds_simple_v1, ds_simple_v2, msg_v2, object_header_v2,
    attr_v1, attr_str, attr_i4, fill_value_msg, layout_contiguous,
    layout_chunked, filter_pipeline, chunk_grid, build_chunks,
    btree_v1_chunks, link_msg)

NY, NX = 11, 9
y = np.array([2.0 + 0.5 * i for i in range(NY)], dtype=np.float64)
idx = np.arange(NY * NX, dtype=np.int64).reshape(NY, NX)

# ------------------------------------------------------------- v4 layouts
def layout_v4_contiguous(addr, size):
    return u8(4) + u8(1) + u64(addr) + u64(size)


def layout_v4_compact(data):
    return u8(4) + u8(0) + u16(len(data)) + data


def layout_v4_chunked(flags, cdims_elem, index_type, extra, addr, enc_len=2):
    body = u8(4) + u8(2) + u8(flags) + u8(len(cdims_elem)) + u8(enc_len)
    for d in cdims_elem:
        body += int(d).to_bytes(enc_len, "little")
    return body + u8(index_type) + extra + u64(addr)


def fahd(client, entry_size, page_bits, nelmts, db_addr):
    h = (b"FAHD" + u8(0) + u8(client) + u8(entry_size) + u8(page_bits) +
         u64(nelmts) + u64(db_addr))
    return h + u32(lookup3(h))


def fadb(client, hdr_addr, elements):
    d = b"FADB" + u8(0) + u8(client) + u64(hdr_addr) + elements
    return d + u32(lookup3(d))


# ------------------------------------------------------------- variables
FILL_C = np.float32(-5.0)
v_contig4 = (idx * np.float32(0.25) + np.float32(1.5)).astype(np.float32)
v_contig4[(idx % 13) == 0] = FILL_C
v_compact4 = (idx * 3 - 40).astype(np.int32)
v_single = (idx * 0.125 + 2.25).astype(np.float64)
v_single_filt = (idx * np.float32(0.5) - np.float32(7.0)).astype(np.float32)
v_implicit = (idx * 5 - 111).astype(np.int16)
FILL_F = np.float32(-7.0)
v_fixed = (idx * np.float32(0.375) + np.float32(0.25)).astype(np.float32)
v_fixed_filt = (idx * 1.625 - 3.5).astype(np.float64)
v_btree1 = (idx * np.float32(0.75) + np.float32(10.0)).astype(np.float32)
v_u2 = (30000 + idx * 300).astype(np.uint16)          # tops out at 59400
v_i8 = (idx * 1000003 - 5).astype(np.int64)
v_f8c = (idx * 0.875 + 100.0).astype(np.float64)
v_i1 = ((idx % 200) - 100).astype(np.int8)

SF_FILTERS = [(1, [6])]                             # deflate
FF_FILTERS = [(2, [8]), (1, [5]), (3, [])]          # shuffle+deflate+fletcher
B1_FILTERS = [(1, [4])]

single_filt_chunks = build_chunks(v_single_filt, (NY, NX), np.float32(0), SF_FILTERS)
fixed_chunks = build_chunks(v_fixed, (3, 4), FILL_F, [])
MISSING_FIXED = 7                                    # this chunk never allocated
fixed_filt_chunks = build_chunks(v_fixed_filt, (5, 4), np.float64(0), FF_FILTERS)
btree1_chunks = build_chunks(v_btree1, (5, 7), np.float32(0), B1_FILTERS)
implicit_chunks = build_chunks(v_implicit, (4, 5), np.int16(0), [])
i1_chunks = build_chunks(v_i1, (6, 9), np.int8(0), [])

# (name, kind-specific builder parameters) — see build()
VAR_NAMES = ["v_contig4", "v_compact4", "v_single", "v_single_filt",
             "v_implicit", "v_fixed", "v_fixed_filt", "v_btree1", "v_u2",
             "v_i8", "v_f8c", "v_i1"]

# ------------------------------------------------------- dense link store
HEAP_FLAGS = 0x2            # direct blocks carry checksums
TABLE_WIDTH = 4
START_BLOCK = 256
MAX_DIRECT = 65536
MAX_HEAP_BITS = 32          # -> 4-byte heap-ID offsets
MAX_OBJ = 4096              # -> 2-byte heap-ID lengths
DB_HDR = 4 + 1 + 8 + 4 + 4  # sig, ver, heap addr, 4-byte offset, checksum
LINKS_PER_BLOCK = 6         # pack at most this many -> 3 blocks for 14 links


def pack_links(link_bodies):
    """Assign each link message to (block_index, heap_offset); heap offsets
    include the 21-byte direct-block headers (heap address space maps 1:1
    onto block bytes, headers included — H5HF's blk_off arithmetic)."""
    placed = []
    blk, used, count = 0, DB_HDR, 0
    for body in link_bodies:
        if count == LINKS_PER_BLOCK or used + len(body) > START_BLOCK:
            blk += 1
            used, count = DB_HDR, 0
        assert used + len(body) <= START_BLOCK, "link message overflows a block"
        placed.append((blk, blk * START_BLOCK + used, len(body)))
        used += len(body)
        count += 1
    return placed, blk + 1


def heap_id(off, length):
    return u8(0) + u32(off) + u16(length)


def attr_v3(name, dtype, dspace, data):
    nb = name.encode() + b"\x00"
    return (u8(3) + u8(0) + u16(len(nb)) + u16(len(dtype)) + u16(len(dspace))
            + u8(0) + nb + dtype + dspace + data)


# attribute fractal heap: 8-byte heap IDs (1 + 5-byte offsets from a
# 40-bit heap space + 2-byte lengths), one root DIRECT block
ATTR_START = 2048
ATTR_DB_HDR = 4 + 1 + 8 + 5 + 4


def build():
    order = ["sb", "root_oh", "y_oh", "x_oh"]
    order += [f"{v}_oh" for v in VAR_NAMES]
    order += ["afrhp", "afdb0", "abtleaf", "abthd"]
    order += ["fhib", "db0", "db1", "db2", "btleaf", "bthd", "gheap",
              "y_data", "contig4_data", "single_data", "single_filt_chunk",
              "implicit_data", "fixed_fahd", "fixed_fadb",
              "fixed_filt_fahd", "fixed_filt_fadb", "btree1_btree",
              "u2_data", "i8_chunk", "f8c_data", "i1_data"]
    order += [f"fixed_chunk{i}" for i in range(len(fixed_chunks))
              if i != MISSING_FIXED]
    order += [f"fixed_filt_chunk{i}" for i in range(len(fixed_filt_chunks))]
    order += [f"btree1_chunk{i}" for i in range(len(btree1_chunks))]

    def build_at(addr, eof):
        blocks = {}
        sb = (b"\x89HDF\r\n\x1a\n" + u8(2) + u8(8) + u8(8) + u8(0) +
              u64(0) + u64(UNDEF) + u64(eof) + u64(addr["root_oh"]))
        blocks["sb"] = sb + u32(lookup3(sb))

        gobjs = []

        def galloc(data):
            gobjs.append(data)
            return len(gobjs)

        def dimension_list(dim_addrs):
            els = b""
            for da in dim_addrs:
                gi = galloc(u64(da))
                els += u32(1) + u64(addr["gheap"]) + u32(gi)
            return attr_v1("DIMENSION_LIST", dt_vlen_of(dt_objref()),
                           ds_simple_v1([len(dim_addrs)]), els)

        # ---- dataset object headers
        blocks["y_oh"] = object_header_v2([
            (0x0001, ds_simple_v2([NY])),
            (0x0003, dt_float(8)),
            (0x0005, fill_value_msg(None)),
            (0x0008, layout_v4_contiguous(addr["y_data"], y.nbytes)),
            (0x000C, attr_str("CLASS", "DIMENSION_SCALE")),
            (0x000C, attr_str("NAME", "y")),
            (0x000C, attr_i4("_Netcdf4Dimid", 0)),
        ])
        blocks["x_oh"] = object_header_v2([
            (0x0001, ds_simple_v2([NX])),
            (0x0003, dt_float(4)),
            (0x0005, fill_value_msg(None)),
            (0x0008, layout_contiguous(UNDEF, 0)),   # phony: no data
            (0x000C, attr_str("CLASS", "DIMENSION_SCALE")),
            (0x000C, attr_str(
                "NAME",
                "This is a netCDF dimension but not a netCDF variable.     9")),
            (0x000C, attr_i4("_Netcdf4Dimid", 1)),
        ])

        def var_oh(dt, layout_body, filters=None, fill=None, extra=()):
            msgs = [(0x0001, ds_simple_v2([NY, NX])), (0x0003, dt)]
            msgs.append((0x0005, fill_value_msg(fill)))
            if filters:
                msgs.append((0x000B, filter_pipeline(filters)))
            msgs.append((0x0008, layout_body))
            msgs.append((0x000C, dimension_list([addr["y_oh"], addr["x_oh"]])))
            msgs.extend(extra)
            return object_header_v2(msgs)

        blocks["v_contig4_oh"] = var_oh(
            dt_float(4),
            layout_v4_contiguous(addr["contig4_data"], v_contig4.nbytes),
            fill=FILL_C.tobytes(),
            extra=[(0x000C, attr_v1("_FillValue", dt_float(4),
                                    ds_simple_v1([1]), FILL_C.tobytes()))])
        blocks["v_compact4_oh"] = var_oh(
            dt_fixed(4), layout_v4_compact(v_compact4.tobytes()))
        blocks["v_single_oh"] = var_oh(
            dt_float(8),
            layout_v4_chunked(0, (NY, NX, 8), 1, b"", addr["single_data"]))
        sf_raw = single_filt_chunks[0][1]
        blocks["v_single_filt_oh"] = var_oh(
            dt_float(4),
            layout_v4_chunked(0x2, (NY, NX, 4), 1,
                              u64(len(sf_raw)) + u32(0),
                              addr["single_filt_chunk"]),
            filters=SF_FILTERS)
        blocks["v_implicit_oh"] = var_oh(
            dt_fixed(2),
            layout_v4_chunked(0, (4, 5, 2), 2, b"", addr["implicit_data"]))
        blocks["v_fixed_oh"] = var_oh(
            dt_float(4),
            layout_v4_chunked(0, (3, 4, 4), 3, u8(10), addr["fixed_fahd"]),
            fill=FILL_F.tobytes(),
            extra=[(0x000C, attr_v1("_FillValue", dt_float(4),
                                    ds_simple_v1([1]), FILL_F.tobytes()))])
        # v_fixed_filt carries DENSE attributes (Attribute Info message ->
        # fractal heap + type-8 v2 B-tree): DIMENSION_LIST lives in the
        # dense store, so a reader that skipped it would fail to resolve
        # the variable's dimensions — the attributes are load-bearing
        gi0 = galloc(u64(addr["y_oh"]))
        gi1 = galloc(u64(addr["x_oh"]))
        dl_data = (u32(1) + u64(addr["gheap"]) + u32(gi0) +
                   u32(1) + u64(addr["gheap"]) + u32(gi1))
        dense_attrs = [attr_v3("DIMENSION_LIST", dt_vlen_of(dt_objref()),
                               ds_simple_v1([2]), dl_data)]
        for k in range(9):  # filler metadata pushing past the threshold
            val = (f"filler value {k} " + "x" * k).encode() + b"\x00"
            from make_netcdf4_fixture import dt_string, ds_scalar_v2
            dense_attrs.append(attr_v3(f"attr_{k:02d}", dt_string(len(val)),
                                       ds_scalar_v2(), val))
        aplaced = []
        aoff = ATTR_DB_HDR
        for body in dense_attrs:
            assert aoff + len(body) <= ATTR_START, "attr heap block overflow"
            aplaced.append((aoff, len(body)))
            aoff += len(body)
        adb = bytearray(ATTR_START)
        adb[0:4] = b"FHDB"
        adb[4] = 0
        struct.pack_into("<Q", adb, 5, addr["afrhp"])
        adb[13:18] = (0).to_bytes(5, "little")
        for (off, ln), body in zip(aplaced, dense_attrs):
            adb[off:off + ln] = body
        struct.pack_into("<I", adb, 18, lookup3(bytes(adb)))
        blocks["afdb0"] = bytes(adb)
        afrhp = (b"FRHP" + u8(0) + u16(8) + u16(0) + u8(0x2) +
                 u32(4096) + u64(0) + u64(UNDEF) +
                 u64(ATTR_START - aoff) + u64(UNDEF) +
                 u64(ATTR_START) + u64(ATTR_START) + u64(aoff) +
                 u64(len(dense_attrs)) +
                 u64(0) + u64(0) + u64(0) + u64(0) +
                 u16(4) + u64(ATTR_START) + u64(65536) + u16(40) + u16(1) +
                 u64(addr["afdb0"]) + u16(0))
        blocks["afrhp"] = afrhp + u32(lookup3(afrhp))
        anames = ["DIMENSION_LIST"] + [f"attr_{k:02d}" for k in range(9)]
        arecs = sorted(
            (lookup3(nm.encode()),
             u8(0) + off.to_bytes(5, "little") + u16(ln) + u8(0) + u32(ci))
            for ci, (nm, (off, ln)) in enumerate(zip(anames, aplaced)))
        aleaf = b"BTLF" + u8(0) + u8(8)
        for h, rec in arecs:
            aleaf += rec + u32(h)
        blocks["abtleaf"] = aleaf + u32(lookup3(aleaf))
        abthd = (b"BTHD" + u8(0) + u8(8) + u32(512) + u16(17) + u16(0) +
                 u8(100) + u8(40) + u64(addr["abtleaf"]) + u16(len(arecs)) +
                 u64(len(arecs)))
        blocks["abthd"] = abthd + u32(lookup3(abthd))

        blocks["v_fixed_filt_oh"] = object_header_v2([
            (0x0001, ds_simple_v2([NY, NX])),
            (0x0003, dt_float(8)),
            (0x0005, fill_value_msg(None)),
            (0x000B, filter_pipeline(FF_FILTERS)),
            (0x0008, layout_v4_chunked(0, (5, 4, 8), 3, u8(10),
                                       addr["fixed_filt_fahd"])),
            (0x0015, u8(0) + u8(0) + u64(addr["afrhp"]) + u64(addr["abthd"])),
        ])
        blocks["v_btree1_oh"] = var_oh(
            dt_float(4), layout_chunked(addr["btree1_btree"], (5, 7), 4),
            filters=B1_FILTERS)
        blocks["v_u2_oh"] = var_oh(
            dt_fixed(2, signed=False),
            layout_v4_contiguous(addr["u2_data"], v_u2.nbytes))
        blocks["v_i8_oh"] = var_oh(
            dt_fixed(8),
            layout_v4_chunked(0, (NY, NX, 8), 1, b"", addr["i8_chunk"]))
        blocks["v_f8c_oh"] = var_oh(
            dt_float(8), layout_contiguous(addr["f8c_data"], v_f8c.nbytes))
        blocks["v_i1_oh"] = var_oh(
            dt_fixed(1),
            layout_v4_chunked(0, (6, 9, 1), 2, b"", addr["i1_data"]))

        # ---- dense link storage
        names = ["y", "x"] + VAR_NAMES
        bodies = [link_msg(n, addr[f"{n}_oh" if n in VAR_NAMES else n + '_oh'])
                  for n in names]
        placed, nblocks = pack_links(bodies)
        assert nblocks == 3, f"expected 3 direct blocks, got {nblocks}"

        for bi in range(nblocks):
            data = bytearray(START_BLOCK)
            data[0:4] = b"FHDB"
            data[4] = 0
            struct.pack_into("<Q", data, 5, addr["frhp"])
            struct.pack_into("<I", data, 13, bi * START_BLOCK)
            # checksum bytes 17..21 stay zero for the computation
            for (blk, off, ln), body in zip(placed, bodies):
                if blk == bi:
                    local = off - bi * START_BLOCK
                    data[local:local + ln] = body
            ck = lookup3(bytes(data))
            struct.pack_into("<I", data, 17, ck)
            blocks[f"db{bi}"] = bytes(data)

        # root indirect block: one row of four direct slots, last Undef
        fhib = (b"FHIB" + u8(0) + u64(addr["frhp"]) + u32(0) +
                u64(addr["db0"]) + u64(addr["db1"]) + u64(addr["db2"]) +
                u64(UNDEF))
        blocks["fhib"] = fhib + u32(lookup3(fhib))

        managed = 4 * START_BLOCK
        frhp = (b"FRHP" + u8(0) + u16(7) + u16(0) + u8(HEAP_FLAGS) +
                u32(MAX_OBJ) + u64(0) + u64(UNDEF) +
                u64(managed - sum(ln for _, _, ln in placed) - 3 * DB_HDR) +
                u64(UNDEF) + u64(managed) + u64(3 * START_BLOCK) +
                u64(placed[-1][1] + placed[-1][2]) + u64(len(bodies)) +
                u64(0) + u64(0) + u64(0) + u64(0) +
                u16(TABLE_WIDTH) + u64(START_BLOCK) + u64(MAX_DIRECT) +
                u16(MAX_HEAP_BITS) + u16(1) + u64(addr["fhib"]) + u16(1))
        blocks["frhp"] = frhp + u32(lookup3(frhp))

        # name-index v2 B-tree: depth 0, all records in one leaf
        recs = sorted(
            (lookup3(n.encode()), heap_id(off, ln))
            for n, (blk, off, ln) in zip(names, placed))
        leaf = b"BTLF" + u8(0) + u8(5)
        for h, hid in recs:
            leaf += u32(h) + hid
        blocks["btleaf"] = leaf + u32(lookup3(leaf))

        bthd = (b"BTHD" + u8(0) + u8(5) + u32(512) + u16(11) + u16(0) +
                u8(100) + u8(40) + u64(addr["btleaf"]) + u16(len(recs)) +
                u64(len(recs)))
        blocks["bthd"] = bthd + u32(lookup3(bthd))

        # ---- root group object header: link info -> dense storage
        blocks["root_oh"] = object_header_v2([
            (0x0002, u8(0) + u8(0) + u64(addr["frhp"]) + u64(addr["bthd"])),
            (0x000A, u8(0) + u8(0)),
        ])

        # ---- chunk indexes
        fixed_elems = b"".join(
            u64(UNDEF if i == MISSING_FIXED else addr[f"fixed_chunk{i}"])
            for i in range(len(fixed_chunks)))
        blocks["fixed_fahd"] = fahd(0, 8, 10, len(fixed_chunks),
                                    addr["fixed_fadb"])
        blocks["fixed_fadb"] = fadb(0, addr["fixed_fahd"], fixed_elems)

        ff_elems = b"".join(
            u64(addr[f"fixed_filt_chunk{i}"]) + u32(len(raw)) + u32(0)
            for i, (_, raw) in enumerate(fixed_filt_chunks))
        blocks["fixed_filt_fahd"] = fahd(1, 16, 10, len(fixed_filt_chunks),
                                         addr["fixed_filt_fadb"])
        blocks["fixed_filt_fadb"] = fadb(1, addr["fixed_filt_fahd"], ff_elems)

        blocks["btree1_btree"] = btree_v1_chunks(
            btree1_chunks, lambda i: addr[f"btree1_chunk{i}"], (NY, NX), (5, 7))

        # ---- global heap (DIMENSION_LIST references)
        g = bytearray()
        for i, data in enumerate(gobjs):
            g += u16(i + 1) + u16(1) + u32(0) + u64(len(data)) + pad8(data)
        head = b"GCOL" + u8(1) + b"\x00" * 3 + u64(2048)
        free = 2048 - len(head) - len(g)
        assert free >= 16
        g += u16(0) + u16(0) + u32(0) + u64(free)
        blocks["gheap"] = head + bytes(g) + b"\x00" * (free - 16)

        # ---- data payloads
        blocks["y_data"] = y.tobytes()
        blocks["contig4_data"] = v_contig4.tobytes()
        blocks["single_data"] = v_single.tobytes()
        blocks["single_filt_chunk"] = sf_raw
        blocks["implicit_data"] = b"".join(raw for _, raw in implicit_chunks)
        blocks["u2_data"] = v_u2.tobytes()
        blocks["i8_chunk"] = v_i8.tobytes()
        blocks["f8c_data"] = v_f8c.tobytes()
        blocks["i1_data"] = b"".join(raw for _, raw in i1_chunks)
        for i, (_, raw) in enumerate(fixed_chunks):
            if i != MISSING_FIXED:
                blocks[f"fixed_chunk{i}"] = raw
        for i, (_, raw) in enumerate(fixed_filt_chunks):
            blocks[f"fixed_filt_chunk{i}"] = raw
        for i, (_, raw) in enumerate(btree1_chunks):
            blocks[f"btree1_chunk{i}"] = raw
        return blocks

    order.insert(order.index("fhib"), "frhp")
    addr = {k: 0 for k in order}
    sizes = {k: len(v) for k, v in build_at(addr, 0).items()}
    off = 0
    for k in order:
        addr[k] = off
        off += sizes[k]
    blocks = build_at(addr, off)
    out = b"".join(blocks[k] for k in order)
    assert len(out) == off
    return out


def mirror():
    y_col = np.repeat(y, NX)
    x_col = np.tile(np.arange(NX, dtype=np.float64), NY)
    c4 = v_contig4.reshape(-1)
    c4m = np.where(c4 == FILL_C, None, c4.astype(object))
    fx = v_fixed.copy()
    # the unallocated fixed-array chunk reads as the fill -> NULL; chunk 7
    # of the 3x4 grid (row-major) covers rows 6..8, cols 4..7
    og = chunk_grid((NY, NX), (3, 4))[MISSING_FIXED]
    fx[og[0]:og[0] + 3, og[1]:og[1] + 4] = FILL_F
    fxf = fx.reshape(-1)
    fxm = np.where(fxf == FILL_F, None, fxf.astype(object))
    return pa.table({
        "y": pa.array(y_col, pa.float64()),
        "x": pa.array(x_col, pa.float64()),
        "v_contig4": pa.array(c4m.tolist(), pa.float32()),
        "v_compact4": pa.array(v_compact4.reshape(-1), pa.int32()),
        "v_single": pa.array(v_single.reshape(-1), pa.float64()),
        "v_single_filt": pa.array(v_single_filt.reshape(-1), pa.float32()),
        "v_implicit": pa.array(v_implicit.reshape(-1), pa.int16()),
        "v_fixed": pa.array(fxm.tolist(), pa.float32()),
        "v_fixed_filt": pa.array(v_fixed_filt.reshape(-1), pa.float64()),
        "v_btree1": pa.array(v_btree1.reshape(-1), pa.float32()),
        # unsigned u2 widens to Spark IntegerType
        "v_u2": pa.array(v_u2.reshape(-1).astype(np.int32), pa.int32()),
        "v_i8": pa.array(v_i8.reshape(-1), pa.int64()),
        "v_f8c": pa.array(v_f8c.reshape(-1), pa.float64()),
        "v_i1": pa.array(v_i1.reshape(-1), pa.int8()),
    })


if __name__ == "__main__":
    data = build()
    with open("data/netcdf/dense4.nc", "wb") as f:
        f.write(data)
    pq.write_table(mirror(), "data/netcdf/dense4_expected.parquet",
                   compression="snappy")
    print(f"dense4.nc: {len(data)} bytes, {NY}x{NX}, {len(VAR_NAMES)} vars, "
          f"dense links in 3 direct blocks")
