#!/usr/bin/env python3
"""extarray4.nc — the round-19 headline fixture: an HDF5/NetCDF-4 file with
an UNLIMITED outer time dimension, exercising every chunk index shape the
round-18 verdict named as the #1 remaining real-world ingestion gap:

  - EXTENSIBLE-ARRAY chunk indexes (layout v4 type 4) — what libhdf5 gives
    any chunked dataset with one unlimited dimension, i.e. every appended
    NetCDF-4 time series: index-block inline elements, direct data-block
    pointers, super blocks, PAGED data blocks (page bitmap in the super
    block), unallocated elements/blocks/pages -> fill;
  - V2-B-TREE chunk indexes (type 5, record types 10 unfiltered and 11
    filtered) at depth 1 and DEPTH 2 — multiple unlimited dimensions;
  - PAGED fixed-array data blocks (clients 0 and 1, incl. an UNINITIALIZED
    page) — what the FA index becomes past 2^pageBits chunks;
  - a DEPTH-2 v1 chunk B-tree (the classic v3 layout pushed past one node).

Like every binary fixture here, this is an INDEPENDENT from-spec
implementation (struct.pack per the public HDF5 File Format Specification
v3.0 III.A.1/IV.A.2.i plus the public H5EA/H5FA/H5B2 geometry rules) — no
HDF5 library exists in this environment, so the Scala reader and this
writer are two separate readings of the same public spec, differentially
compared through the committed parquet mirror.

Geometry notes (the spec rules both sides implement):
  EA: nsblks = 1 + maxBits - log2(minElmts); super block u holds 2^(u/2)
  data blocks of minElmts*2^((u+1)/2) elements; the index block holds
  idxBlkElmts inline elements, then 2*(minPtrs-1) direct data-block
  pointers (the first 2*log2(minPtrs) super blocks are elided), then
  super-block pointers. Data blocks with more than 2^pageBits elements
  are paged; the page-init bitmap lives in the owning super block, bit 0
  in the first byte's HIGH bit (the H5VM bit order).
  B2: leaf capacity (nodeSize-10)/recSize; child-count fields sized for
  the leaf max; internal pointers at depth >= 2 add a cumulative-total
  field sized per level.
  FA paged: the data block keeps only the page bitmap; pages of
  2^pageBits entries (last partial) follow contiguously, each with its
  own lookup3 checksum; an uninitialized page's chunks are unallocated.

Structure: superblock v2; root OHDR v2 with compact links; dims
time=30 (UNLIMITED, real f8 coordinate), y=11 (real f8), x=9 (phony).
Vars (all time x y x x):
  v_ea            f4 EA client 0, libhdf5-default params (32,4,16,4,10):
                  4 inline + 2 direct data blocks; chunks 17,29 unallocated
  v_ea_filt       f8 EA client 1 (deflate): 4 inline + 1 data block
  v_ea_sb         i2 EA tiny params (10,2,2,2,4): super blocks 2 and 3,
                  an Undef element (chunk 9) and an Undef DATA BLOCK
                  (chunks 24-29)
  v_ea_paged      i1 EA params (10,2,2,2,2): super block 3's data blocks
                  split into pages; one page UNINITIALIZED (chunks 28-29)
  v_bt2           i4 v2 B-tree type 10, node 512, depth 1; chunk 13 absent
  v_bt2f          f4 v2 B-tree type 11 (shuffle+deflate), node 128, DEPTH 2
  v_btree1_deep   f8 v1 B-tree DEPTH 2 (root -> internals -> leaves), deflate
  v_paged_fa      f8 fixed array client 0, pageBits 3 -> 4 pages; chunk 11
                  unallocated
  v_paged_fa_holes f4 fixed array client 1 (deflate), page 1 UNINITIALIZED
                  (chunks 8-15)

Run once, commit outputs:
  python3 tools/make_netcdf4_extarray_fixture.py
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_netcdf4_fixture import (  # noqa: E402
    UNDEF, u8, u16, u32, u64, lookup3, dt_fixed, dt_float, dt_objref,
    dt_vlen_of, ds_simple_v1, attr_v1, attr_str, attr_i4, fill_value_msg,
    layout_contiguous, object_header_v2, build_chunks, link_msg)
from make_netcdf4_dense_fixture import layout_v4_chunked  # noqa: E402

NT, NY, NX = 30, 11, 9
time_c = np.array([19000.5 + i for i in range(NT)], dtype=np.float64)
y_c = np.array([2.0 + 0.25 * i for i in range(NY)], dtype=np.float64)
idx3 = np.arange(NT * NY * NX, dtype=np.int64).reshape(NT, NY, NX)


def ds_v2_unlim(dims, maxdims):
    """Simple dataspace v2 WITH max dims (flags bit 0): UNDEF = unlimited."""
    return (u8(2) + u8(len(dims)) + u8(1) + u8(1) +
            b"".join(u64(d) for d in dims) +
            b"".join(u64(d) for d in maxdims))


def size_len(chunk_bytes):
    """libhdf5's encoded-chunk-size width: 1 + (floor(log2(n))+8)//8."""
    return min(8, 1 + (chunk_bytes.bit_length() - 1 + 8) // 8)


# ------------------------------------------------------------- variables
FILL_EA = np.float32(-3.0)
v_ea = (idx3 * np.float32(0.25) + np.float32(1.5)).astype(np.float32)
EA_MISSING = {17, 29}
v_ea_filt = (idx3 * 0.375 - 2.25).astype(np.float64)
FILL_SB = np.int16(-9999)
v_ea_sb = (idx3 * 3 - 2000).astype(np.int16)
SB_MISSING = {9} | set(range(24, 30))
FILL_PG = np.int8(-7)
v_ea_paged = ((idx3 % 50) + 10).astype(np.int8)
PG_MISSING = {28, 29}
FILL_B2 = np.int32(-1)
v_bt2 = (idx3 * 7 + 11).astype(np.int32)
B2_MISSING = {13}
v_bt2f = (idx3 * np.float32(0.5) + np.float32(4.0)).astype(np.float32)
v_btree1_deep = (idx3 * 1.625 + 0.5).astype(np.float64)
FILL_FA = np.float64(-11.0)
v_paged_fa = (idx3 * 1.125 - 4.0).astype(np.float64)
FA_MISSING = {11}
FILL_FAH = np.float32(-13.0)
v_paged_fa_holes = (idx3 * np.float32(0.5) + np.float32(7.0)).astype(np.float32)
FAH_MISSING = set(range(8, 16))

EAF_FILTERS = [(1, [6])]                      # deflate
B2F_FILTERS = [(2, [4]), (1, [6])]            # shuffle + deflate
B1D_FILTERS = [(1, [5])]
FAH_FILTERS = [(1, [4])]

ROW = (1, NY, NX)
ea_chunks = build_chunks(v_ea, ROW, FILL_EA, [])
ea_filt_chunks = build_chunks(v_ea_filt, (5, NY, NX), np.float64(0), EAF_FILTERS)
ea_sb_chunks = build_chunks(v_ea_sb, ROW, FILL_SB, [])
ea_paged_chunks = build_chunks(v_ea_paged, ROW, FILL_PG, [])
bt2_chunks = build_chunks(v_bt2, ROW, FILL_B2, [])
bt2f_chunks = build_chunks(v_bt2f, (2, NY, NX), np.float32(0), B2F_FILTERS)
b1d_chunks = build_chunks(v_btree1_deep, (3, NY, NX), np.float64(0), B1D_FILTERS)
fa_chunks = build_chunks(v_paged_fa, ROW, FILL_FA, [])
fah_chunks = build_chunks(v_paged_fa_holes, ROW, FILL_FAH, FAH_FILTERS)

VAR_NAMES = ["v_ea", "v_ea_filt", "v_ea_sb", "v_ea_paged", "v_bt2", "v_bt2f",
             "v_btree1_deep", "v_paged_fa", "v_paged_fa_holes"]


# ------------------------------------------------------ extensible array
def ea_hdr(client, elmt_size, maxbits, idx_elmts, min_elmts, min_ptrs,
           pagebits, stats, iblk_addr):
    h = (b"EAHD" + u8(0) + u8(client) + u8(elmt_size) + u8(maxbits) +
         u8(idx_elmts) + u8(min_elmts) + u8(min_ptrs) + u8(pagebits) +
         u64(stats[0]) + u64(stats[1]) + u64(stats[2]) + u64(stats[3]) +
         u64(stats[4]) + u64(stats[5]) + u64(iblk_addr))
    return h + u32(lookup3(h))


def ea_iblock(client, hdr_addr, inline, dblk_addrs, sblk_addrs):
    b = (b"EAIB" + u8(0) + u8(client) + u64(hdr_addr) + inline +
         b"".join(u64(a) for a in dblk_addrs) +
         b"".join(u64(a) for a in sblk_addrs))
    return b + u32(lookup3(b))


def ea_dblock(client, hdr_addr, block_off, off_size, elems):
    b = (b"EADB" + u8(0) + u8(client) + u64(hdr_addr) +
         int(block_off).to_bytes(off_size, "little") + elems)
    return b + u32(lookup3(b))


def ea_dblock_paged(client, hdr_addr, block_off, off_size, pages):
    """Paged data block: prefix+checksum, then pages (elements+checksum
    each); an UNINITIALIZED page is written as zeros (its bitmap bit in
    the super block is clear, so readers must not verify it)."""
    b = (b"EADB" + u8(0) + u8(client) + u64(hdr_addr) +
         int(block_off).to_bytes(off_size, "little"))
    out = b + u32(lookup3(b))
    for elems, init in pages:
        out += (elems + u32(lookup3(elems))) if init else b"\x00" * (len(elems) + 4)
    return out


def ea_sblock(client, hdr_addr, block_off, off_size, page_bitmap, dblk_addrs):
    b = (b"EASB" + u8(0) + u8(client) + u64(hdr_addr) +
         int(block_off).to_bytes(off_size, "little") + page_bitmap +
         b"".join(u64(a) for a in dblk_addrs))
    return b + u32(lookup3(b))


def ea_elem0(addr):
    return u64(addr)


def ea_elem1(addr, size, mask, L):
    if addr == UNDEF:
        return u64(UNDEF) + b"\x00" * (L + 4)
    return u64(addr) + int(size).to_bytes(L, "little") + u32(mask)


def layout_ea(cdims_elem, maxbits, idx_elmts, min_elmts, min_ptrs, pagebits,
              hdr_addr):
    # H5O layout spec parameter order: max bits, index elements, min
    # POINTERS, min ELEMENTS, page bits
    extra = (u8(maxbits) + u8(idx_elmts) + u8(min_ptrs) + u8(min_elmts) +
             u8(pagebits))
    return layout_v4_chunked(0, cdims_elem, 4, extra, hdr_addr)


# ------------------------------------------------------------ v2 B-tree
def bthd(bttype, node_size, rrec, depth, root_addr, root_nrec, total):
    h = (b"BTHD" + u8(0) + u8(bttype) + u32(node_size) + u16(rrec) +
         u16(depth) + u8(100) + u8(40) + u64(root_addr) + u16(root_nrec) +
         u64(total))
    return h + u32(lookup3(h))


def bt2_leaf(bttype, recs):
    b = b"BTLF" + u8(0) + u8(bttype) + b"".join(recs)
    return b + u32(lookup3(b))


def bt2_internal(bttype, recs, children, max_nrec_size, tot_size):
    """children: [(addr, nrec, total_nrec)]; tot field present iff
    tot_size > 0 (i.e. this node's depth >= 2)."""
    b = b"BTIN" + u8(0) + u8(bttype) + b"".join(recs)
    for a, nrec, tot in children:
        b += u64(a) + int(nrec).to_bytes(max_nrec_size, "little")
        if tot_size:
            b += int(tot).to_bytes(tot_size, "little")
    return b + u32(lookup3(b))


def bt2_record(origin, cdims, addr, filtered, size=0, mask=0, L=0):
    r = u64(addr)
    if filtered:
        r += int(size).to_bytes(L, "little") + u32(mask)
    return r + b"".join(u64(o // c) for o, c in zip(origin, cdims))


def layout_bt2(cdims_elem, node_size, hdr_addr):
    return layout_v4_chunked(0, cdims_elem, 5,
                             u32(node_size) + u8(100) + u8(40), hdr_addr)


# --------------------------------------------------------- v1 B-tree deep
def b1_key(nbytes, mask, origin):
    return u32(nbytes) + u32(mask) + b"".join(u64(o) for o in origin) + u64(0)


def b1_node(level, entries, final_key):
    """entries: [(key_bytes, child_addr)]; v1 chunk node, any level."""
    b = (b"TREE" + u8(1) + u8(level) + u16(len(entries)) + u64(UNDEF) +
         u64(UNDEF))
    for key, child in entries:
        b += key + u64(child)
    return b + final_key


# ------------------------------------------------------------ fixed array
def fahd(client, entry_size, page_bits, nelmts, db_addr):
    h = (b"FAHD" + u8(0) + u8(client) + u8(entry_size) + u8(page_bits) +
         u64(nelmts) + u64(db_addr))
    return h + u32(lookup3(h))


def fadb_paged(client, hdr_addr, bitmap, pages):
    """pages: [(entry_bytes, init)] — uninitialized pages written as zeros."""
    d = b"FADB" + u8(0) + u8(client) + u64(hdr_addr) + bitmap
    out = d + u32(lookup3(d))
    for elems, init in pages:
        out += (elems + u32(lookup3(elems))) if init else b"\x00" * (len(elems) + 4)
    return out


def fa_elem1(addr, size, mask, L):
    if addr == UNDEF:
        return u64(UNDEF) + b"\x00" * (L + 4)
    return u64(addr) + int(size).to_bytes(L, "little") + u32(mask)


# ==================================================================== build
def build():
    order = ["sb", "root_oh", "time_oh", "y_oh", "x_oh"]
    order += [f"{v}_oh" for v in VAR_NAMES]
    order += ["gheap", "time_data", "y_data"]
    # extensible-array structures
    order += ["ea_hd", "ea_ib", "ea_db0", "ea_db1"]
    order += ["eaf_hd", "eaf_ib", "eaf_db0"]
    order += ["easb_hd", "easb_ib", "easb_db0", "easb_db1",
              "easb_sb2", "easb_sb2_db0", "easb_sb2_db1",
              "easb_sb3", "easb_sb3_db0"]
    order += ["eap_hd", "eap_ib", "eap_db0", "eap_db1",
              "eap_sb2", "eap_sb2_db0", "eap_sb2_db1",
              "eap_sb3", "eap_sb3_db0", "eap_sb3_db1"]
    # v2 B-trees
    order += ["bt2_hd", "bt2_root", "bt2_leaf0", "bt2_leaf1", "bt2_leaf2"]
    order += ["bt2f_hd", "bt2f_root", "bt2f_intA", "bt2f_intB",
              "bt2f_leafA0", "bt2f_leafA1", "bt2f_leafB0", "bt2f_leafB1"]
    # v1 deep B-tree
    order += ["b1d_root", "b1d_mid0", "b1d_mid1",
              "b1d_leaf0", "b1d_leaf1", "b1d_leaf2", "b1d_leaf3", "b1d_leaf4"]
    # fixed arrays (paged)
    order += ["fa_hd", "fa_db", "fah_hd", "fah_db"]
    # chunk payloads
    order += [f"ea_chunk{i}" for i in range(NT) if i not in EA_MISSING]
    order += [f"eaf_chunk{i}" for i in range(len(ea_filt_chunks))]
    order += [f"easb_chunk{i}" for i in range(NT) if i not in SB_MISSING]
    order += [f"eap_chunk{i}" for i in range(NT) if i not in PG_MISSING]
    order += [f"bt2_chunk{i}" for i in range(NT) if i not in B2_MISSING]
    order += [f"bt2f_chunk{i}" for i in range(len(bt2f_chunks))]
    order += [f"b1d_chunk{i}" for i in range(len(b1d_chunks))]
    order += [f"fa_chunk{i}" for i in range(NT) if i not in FA_MISSING]
    order += [f"fah_chunk{i}" for i in range(NT) if i not in FAH_MISSING]

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
            for da in (addr["time_oh"], addr["y_oh"], addr["x_oh"]):
                gi = galloc(u64(da))
                els += u32(1) + u64(addr["gheap"]) + u32(gi)
            return attr_v1("DIMENSION_LIST", dt_vlen_of(dt_objref()),
                           ds_simple_v1([3]), els)

        # ---- dimension scales (time is UNLIMITED)
        blocks["time_oh"] = object_header_v2([
            (0x0001, ds_v2_unlim([NT], [UNDEF])),
            (0x0003, dt_float(8)),
            (0x0005, fill_value_msg(None)),
            (0x0008, layout_contiguous(addr["time_data"], time_c.nbytes)),
            (0x000C, attr_str("CLASS", "DIMENSION_SCALE")),
            (0x000C, attr_str("NAME", "time")),
            (0x000C, attr_i4("_Netcdf4Dimid", 0)),
        ])
        blocks["y_oh"] = object_header_v2([
            (0x0001, ds_simple_v1([NY])),
            (0x0003, dt_float(8)),
            (0x0005, fill_value_msg(None)),
            (0x0008, layout_contiguous(addr["y_data"], y_c.nbytes)),
            (0x000C, attr_str("CLASS", "DIMENSION_SCALE")),
            (0x000C, attr_str("NAME", "y")),
            (0x000C, attr_i4("_Netcdf4Dimid", 1)),
        ])
        blocks["x_oh"] = object_header_v2([
            (0x0001, ds_simple_v1([NX])),
            (0x0003, dt_float(4)),
            (0x0005, fill_value_msg(None)),
            (0x0008, layout_contiguous(UNDEF, 0)),
            (0x000C, attr_str("CLASS", "DIMENSION_SCALE")),
            (0x000C, attr_str(
                "NAME",
                "This is a netCDF dimension but not a netCDF variable.     9")),
            (0x000C, attr_i4("_Netcdf4Dimid", 2)),
        ])

        def var_oh(dt, dspace, layout_body, filters=None, fill=None):
            msgs = [(0x0001, dspace), (0x0003, dt)]
            msgs.append((0x0005, fill_value_msg(None)))
            if filters:
                from make_netcdf4_fixture import filter_pipeline
                msgs.append((0x000B, filter_pipeline(filters)))
            msgs.append((0x0008, layout_body))
            msgs.append((0x000C, dimension_list()))
            if fill is not None:
                msgs.append((0x000C, attr_v1("_FillValue", dt,
                                             ds_simple_v1([1]), fill)))
            return object_header_v2(msgs)

        ds_unlim_t = ds_v2_unlim([NT, NY, NX], [UNDEF, NY, NX])
        ds_unlim_ty = ds_v2_unlim([NT, NY, NX], [UNDEF, UNDEF, NX])

        # ================================================= v_ea (EA, defaults)
        # params (32,4,16,4,10): arr_off 4; inline 4; direct dblk slots 6
        # (u0: 1x16, u1: 1x32, u2: 2x32, u3: 2x64); 25 sblk slots
        def ea_addr(i, pfx, missing):
            return UNDEF if i in missing or i >= NT else addr[f"{pfx}_chunk{i}"]

        blocks["v_ea_oh"] = var_oh(
            dt_float(4), ds_unlim_t,
            layout_ea((1, NY, NX, 4), 32, 4, 16, 4, 10, addr["ea_hd"]),
            fill=FILL_EA.tobytes())
        ea_db0 = b"".join(ea_elem0(ea_addr(4 + k, "ea", EA_MISSING))
                          for k in range(16))
        ea_db1 = b"".join(ea_elem0(ea_addr(20 + k, "ea", EA_MISSING))
                          for k in range(32))
        blocks["ea_db0"] = ea_dblock(0, addr["ea_hd"], 0, 4, ea_db0)
        blocks["ea_db1"] = ea_dblock(0, addr["ea_hd"], 16, 4, ea_db1)
        blocks["ea_ib"] = ea_iblock(
            0, addr["ea_hd"],
            b"".join(ea_elem0(ea_addr(k, "ea", EA_MISSING)) for k in range(4)),
            [addr["ea_db0"], addr["ea_db1"], UNDEF, UNDEF, UNDEF, UNDEF],
            [UNDEF] * 25)
        blocks["ea_hd"] = ea_hdr(
            0, 8, 32, 4, 16, 4, 10,
            (0, 0, 2, len(blocks["ea_db0"]) + len(blocks["ea_db1"]), NT, NT - 2),
            addr["ea_ib"])

        # ============================================ v_ea_filt (EA client 1)
        EAF_L = size_len(5 * NY * NX * 8)
        assert EAF_L == 3

        def eaf_elem(i):
            if i >= len(ea_filt_chunks):
                return ea_elem1(UNDEF, 0, 0, EAF_L)
            return ea_elem1(addr[f"eaf_chunk{i}"], len(ea_filt_chunks[i][1]),
                            0, EAF_L)

        blocks["v_ea_filt_oh"] = var_oh(
            dt_float(8), ds_unlim_t,
            layout_ea((5, NY, NX, 8), 32, 4, 16, 4, 10, addr["eaf_hd"]),
            filters=EAF_FILTERS)
        blocks["eaf_db0"] = ea_dblock(
            1, addr["eaf_hd"], 0, 4,
            b"".join(eaf_elem(4 + k) for k in range(16)))
        blocks["eaf_ib"] = ea_iblock(
            1, addr["eaf_hd"],
            b"".join(eaf_elem(k) for k in range(4)),
            [addr["eaf_db0"], UNDEF, UNDEF, UNDEF, UNDEF, UNDEF],
            [UNDEF] * 25)
        blocks["eaf_hd"] = ea_hdr(
            1, 8 + EAF_L + 4, 32, 4, 16, 4, 10,
            (0, 0, 1, len(blocks["eaf_db0"]), 6, 6), addr["eaf_ib"])

        # ===================================== v_ea_sb (EA with super blocks)
        # params (10,2,2,2,4): arr_off 2; inline 2; direct dblks u0 (1x2),
        # u1 (1x4); sblk u2 (2x4, start 6), sblk u3 (2x8, start 14);
        # 8 sblk slots. Chunk 9 = Undef ELEMENT; sblk3's second data block
        # Undef -> chunks 24-29 fill.
        blocks["v_ea_sb_oh"] = var_oh(
            dt_fixed(2), ds_unlim_t,
            layout_ea((1, NY, NX, 2), 10, 2, 2, 2, 4, addr["easb_hd"]),
            fill=FILL_SB.tobytes())
        blocks["easb_db0"] = ea_dblock(0, addr["easb_hd"], 0, 2, b"".join(
            ea_elem0(ea_addr(2 + k, "easb", SB_MISSING)) for k in range(2)))
        blocks["easb_db1"] = ea_dblock(0, addr["easb_hd"], 2, 2, b"".join(
            ea_elem0(ea_addr(4 + k, "easb", SB_MISSING)) for k in range(4)))
        blocks["easb_sb2_db0"] = ea_dblock(0, addr["easb_hd"], 6, 2, b"".join(
            ea_elem0(ea_addr(8 + k, "easb", SB_MISSING)) for k in range(4)))
        blocks["easb_sb2_db1"] = ea_dblock(0, addr["easb_hd"], 10, 2, b"".join(
            ea_elem0(ea_addr(12 + k, "easb", SB_MISSING)) for k in range(4)))
        blocks["easb_sb2"] = ea_sblock(
            0, addr["easb_hd"], 6, 2, b"",
            [addr["easb_sb2_db0"], addr["easb_sb2_db1"]])
        blocks["easb_sb3_db0"] = ea_dblock(0, addr["easb_hd"], 14, 2, b"".join(
            ea_elem0(ea_addr(16 + k, "easb", SB_MISSING)) for k in range(8)))
        blocks["easb_sb3"] = ea_sblock(
            0, addr["easb_hd"], 14, 2, b"", [addr["easb_sb3_db0"], UNDEF])
        blocks["easb_ib"] = ea_iblock(
            0, addr["easb_hd"],
            b"".join(ea_elem0(ea_addr(k, "easb", SB_MISSING)) for k in range(2)),
            [addr["easb_db0"], addr["easb_db1"]],
            [addr["easb_sb2"], addr["easb_sb3"]] + [UNDEF] * 6)
        blocks["easb_hd"] = ea_hdr(
            0, 8, 10, 2, 2, 2, 4, (2, 0, 5, 0, 24, 23), addr["easb_ib"])

        # ================================= v_ea_paged (EA with PAGED blocks)
        # params (10,2,2,2,2): page = 4 elements; sblk u3's 8-element data
        # blocks split into 2 pages each. dblk1 page 1 UNINITIALIZED.
        blocks["v_ea_paged_oh"] = var_oh(
            dt_fixed(1), ds_unlim_t,
            layout_ea((1, NY, NX, 1), 10, 2, 2, 2, 2, addr["eap_hd"]),
            fill=FILL_PG.tobytes())
        blocks["eap_db0"] = ea_dblock(0, addr["eap_hd"], 0, 2, b"".join(
            ea_elem0(ea_addr(2 + k, "eap", PG_MISSING)) for k in range(2)))
        blocks["eap_db1"] = ea_dblock(0, addr["eap_hd"], 2, 2, b"".join(
            ea_elem0(ea_addr(4 + k, "eap", PG_MISSING)) for k in range(4)))
        blocks["eap_sb2_db0"] = ea_dblock(0, addr["eap_hd"], 6, 2, b"".join(
            ea_elem0(ea_addr(8 + k, "eap", PG_MISSING)) for k in range(4)))
        blocks["eap_sb2_db1"] = ea_dblock(0, addr["eap_hd"], 10, 2, b"".join(
            ea_elem0(ea_addr(12 + k, "eap", PG_MISSING)) for k in range(4)))
        blocks["eap_sb2"] = ea_sblock(
            0, addr["eap_hd"], 6, 2, b"",
            [addr["eap_sb2_db0"], addr["eap_sb2_db1"]])
        blocks["eap_sb3_db0"] = ea_dblock_paged(
            0, addr["eap_hd"], 14, 2,
            [(b"".join(ea_elem0(ea_addr(16 + k, "eap", PG_MISSING))
                       for k in range(4)), True),
             (b"".join(ea_elem0(ea_addr(20 + k, "eap", PG_MISSING))
                       for k in range(4)), True)])
        blocks["eap_sb3_db1"] = ea_dblock_paged(
            0, addr["eap_hd"], 22, 2,
            [(b"".join(ea_elem0(ea_addr(24 + k, "eap", PG_MISSING))
                       for k in range(4)), True),
             (b"\x00" * 32, False)])  # page 1 uninitialized: chunks 28-31
        # page bitmaps: one byte per data block (2 pages -> bits 7,6),
        # H5VM order: bit 0 = high bit. db0: both init (0xC0); db1: page 0
        # only (0x80).
        blocks["eap_sb3"] = ea_sblock(
            0, addr["eap_hd"], 14, 2, bytes([0xC0, 0x80]),
            [addr["eap_sb3_db0"], addr["eap_sb3_db1"]])
        blocks["eap_ib"] = ea_iblock(
            0, addr["eap_hd"],
            b"".join(ea_elem0(ea_addr(k, "eap", PG_MISSING)) for k in range(2)),
            [addr["eap_db0"], addr["eap_db1"]],
            [addr["eap_sb2"], addr["eap_sb3"]] + [UNDEF] * 6)
        blocks["eap_hd"] = ea_hdr(
            0, 8, 10, 2, 2, 2, 2, (2, 0, 6, 0, 28, 26), addr["eap_ib"])

        # ======================================= v_bt2 (v2 B-tree, type 10)
        # node 512, rrec 32, leaf max 15 -> depth 1: leaves 10/9/8 + 2 root
        # records; chunk 13 has NO record (missing -> fill)
        B2_CD = (1, NY, NX)
        b2_present = [i for i in range(NT) if i not in B2_MISSING]
        b2_recs = [bt2_record((i, 0, 0), B2_CD, addr[f"bt2_chunk{i}"], False)
                   for i in b2_present]
        blocks["v_bt2_oh"] = var_oh(
            dt_fixed(4), ds_unlim_ty,
            layout_bt2((1, NY, NX, 4), 512, addr["bt2_hd"]),
            fill=FILL_B2.tobytes())
        blocks["bt2_leaf0"] = bt2_leaf(10, b2_recs[0:10])
        blocks["bt2_leaf1"] = bt2_leaf(10, b2_recs[11:20])
        blocks["bt2_leaf2"] = bt2_leaf(10, b2_recs[21:29])
        blocks["bt2_root"] = bt2_internal(
            10, [b2_recs[10], b2_recs[20]],
            [(addr["bt2_leaf0"], 10, 10), (addr["bt2_leaf1"], 9, 9),
             (addr["bt2_leaf2"], 8, 8)],
            max_nrec_size=1, tot_size=0)
        blocks["bt2_hd"] = bthd(10, 512, 8 + 24, 1, addr["bt2_root"], 2,
                                len(b2_recs))

        # ================================ v_bt2f (v2 B-tree type 11, DEPTH 2)
        # node 128, rrec 39 (L=3), leaf max 3, internal max 2: root 1 rec,
        # two depth-1 children (1 rec, 2 leaves of 3 each) -> 15 records
        B2F_CD = (2, NY, NX)
        B2F_L = size_len(2 * NY * NX * 4)
        assert B2F_L == 3
        f_recs = [bt2_record((2 * i, 0, 0), B2F_CD, addr[f"bt2f_chunk{i}"],
                             True, len(bt2f_chunks[i][1]), 0, B2F_L)
                  for i in range(15)]
        blocks["v_bt2f_oh"] = var_oh(
            dt_float(4), ds_unlim_ty,
            layout_bt2((2, NY, NX, 4), 128, addr["bt2f_hd"]),
            filters=B2F_FILTERS)
        blocks["bt2f_leafA0"] = bt2_leaf(11, f_recs[0:3])
        blocks["bt2f_leafA1"] = bt2_leaf(11, f_recs[4:7])
        blocks["bt2f_leafB0"] = bt2_leaf(11, f_recs[8:11])
        blocks["bt2f_leafB1"] = bt2_leaf(11, f_recs[12:15])
        blocks["bt2f_intA"] = bt2_internal(
            11, [f_recs[3]],
            [(addr["bt2f_leafA0"], 3, 3), (addr["bt2f_leafA1"], 3, 3)],
            max_nrec_size=1, tot_size=0)
        blocks["bt2f_intB"] = bt2_internal(
            11, [f_recs[11]],
            [(addr["bt2f_leafB0"], 3, 3), (addr["bt2f_leafB1"], 3, 3)],
            max_nrec_size=1, tot_size=0)
        blocks["bt2f_root"] = bt2_internal(
            11, [f_recs[7]],
            [(addr["bt2f_intA"], 1, 7), (addr["bt2f_intB"], 1, 7)],
            max_nrec_size=1, tot_size=1)
        blocks["bt2f_hd"] = bthd(11, 128, 39, 2, addr["bt2f_root"], 1, 15)

        # ============================== v_btree1_deep (v1 B-tree, depth 2)
        B1_CD = (3, NY, NX)
        bound = b1_key(0, 0, (NT, NY, NX))

        def b1_chunk_key(i):
            return b1_key(len(b1d_chunks[i][1]), 0, b1d_chunks[i][0])

        def b1_leaf(name, lo, hi):
            ents = [(b1_chunk_key(i), addr[f"b1d_chunk{i}"])
                    for i in range(lo, hi)]
            fk = b1_chunk_key(hi) if hi < len(b1d_chunks) else bound
            blocks[name] = b1_node(0, ents, fk)

        b1_leaf("b1d_leaf0", 0, 2)
        b1_leaf("b1d_leaf1", 2, 4)
        b1_leaf("b1d_leaf2", 4, 6)
        b1_leaf("b1d_leaf3", 6, 8)
        b1_leaf("b1d_leaf4", 8, 10)
        blocks["b1d_mid0"] = b1_node(1, [
            (b1_chunk_key(0), addr["b1d_leaf0"]),
            (b1_chunk_key(2), addr["b1d_leaf1"]),
            (b1_chunk_key(4), addr["b1d_leaf2"])], b1_chunk_key(6))
        blocks["b1d_mid1"] = b1_node(1, [
            (b1_chunk_key(6), addr["b1d_leaf3"]),
            (b1_chunk_key(8), addr["b1d_leaf4"])], bound)
        blocks["b1d_root"] = b1_node(2, [
            (b1_chunk_key(0), addr["b1d_mid0"]),
            (b1_chunk_key(6), addr["b1d_mid1"])], bound)
        from make_netcdf4_fixture import layout_chunked
        blocks["v_btree1_deep_oh"] = var_oh(
            dt_float(8), ds_v2_unlim([NT, NY, NX], [NT, NY, NX]),
            layout_chunked(addr["b1d_root"], B1_CD, 8),
            filters=B1D_FILTERS)

        # ============================== v_paged_fa (paged fixed array, c0)
        # pageBits 3 -> 4 pages (8/8/8/6), all initialized; chunk 11 Undef
        fa_pages = []
        for p in range(4):
            pn = min(8, NT - p * 8)
            fa_pages.append((b"".join(
                ea_elem0(ea_addr(p * 8 + k, "fa", FA_MISSING))
                for k in range(pn)), True))
        blocks["v_paged_fa_oh"] = var_oh(
            dt_float(8), ds_v2_unlim([NT, NY, NX], [NT, NY, NX]),
            layout_v4_chunked(0, (1, NY, NX, 8), 3, u8(3), addr["fa_hd"]),
            fill=FILL_FA.tobytes())
        blocks["fa_db"] = fadb_paged(0, addr["fa_hd"], bytes([0xF0]), fa_pages)
        blocks["fa_hd"] = fahd(0, 8, 3, NT, addr["fa_db"])

        # ===================== v_paged_fa_holes (paged fixed array, c1)
        # page 1 (chunks 8-15) UNINITIALIZED -> fill
        FAH_L = size_len(NY * NX * 4)
        assert FAH_L == 3
        fah_pages = []
        for p in range(4):
            pn = min(8, NT - p * 8)
            if p == 1:
                fah_pages.append((b"\x00" * (pn * 15), False))
            else:
                fah_pages.append((b"".join(
                    fa_elem1(UNDEF, 0, 0, FAH_L)
                    if (p * 8 + k) in FAH_MISSING else
                    fa_elem1(addr[f"fah_chunk{p * 8 + k}"],
                             len(fah_chunks[p * 8 + k][1]), 0, FAH_L)
                    for k in range(pn)), True))
        blocks["v_paged_fa_holes_oh"] = var_oh(
            dt_float(4), ds_v2_unlim([NT, NY, NX], [NT, NY, NX]),
            layout_v4_chunked(0, (1, NY, NX, 4), 3, u8(3), addr["fah_hd"]),
            filters=FAH_FILTERS, fill=FILL_FAH.tobytes())
        blocks["fah_db"] = fadb_paged(1, addr["fah_hd"], bytes([0xB0]),
                                      fah_pages)
        blocks["fah_hd"] = fahd(1, 8 + FAH_L + 4, 3, NT, addr["fah_db"])

        # ---- root group: compact links
        names = ["time", "y", "x"] + VAR_NAMES
        blocks["root_oh"] = object_header_v2(
            [(0x0002, u8(0) + u8(0) + u64(UNDEF) + u64(UNDEF)),
             (0x000A, u8(0) + u8(0))] +
            [(0x0006, link_msg(n, addr[f"{n}_oh"])) for n in names])

        # ---- global heap (DIMENSION_LIST refs: 9 vars x 3 dims)
        g = bytearray()
        for i, data in enumerate(gobjs):
            from make_netcdf4_fixture import pad8
            g += u16(i + 1) + u16(1) + u32(0) + u64(len(data)) + pad8(data)
        head = b"GCOL" + u8(1) + b"\x00" * 3 + u64(2048)
        free = 2048 - len(head) - len(g)
        assert free >= 16, "grow the gheap collection"
        g += u16(0) + u16(0) + u32(0) + u64(free)
        blocks["gheap"] = head + bytes(g) + b"\x00" * (free - 16)

        # ---- payloads
        blocks["time_data"] = time_c.tobytes()
        blocks["y_data"] = y_c.tobytes()
        for i in range(NT):
            if i not in EA_MISSING:
                blocks[f"ea_chunk{i}"] = ea_chunks[i][1]
            if i not in SB_MISSING:
                blocks[f"easb_chunk{i}"] = ea_sb_chunks[i][1]
            if i not in PG_MISSING:
                blocks[f"eap_chunk{i}"] = ea_paged_chunks[i][1]
            if i not in B2_MISSING:
                blocks[f"bt2_chunk{i}"] = bt2_chunks[i][1]
            if i not in FA_MISSING:
                blocks[f"fa_chunk{i}"] = fa_chunks[i][1]
            if i not in FAH_MISSING:
                blocks[f"fah_chunk{i}"] = fah_chunks[i][1]
        for i, (_, raw) in enumerate(ea_filt_chunks):
            blocks[f"eaf_chunk{i}"] = raw
        for i, (_, raw) in enumerate(bt2f_chunks):
            blocks[f"bt2f_chunk{i}"] = raw
        for i, (_, raw) in enumerate(b1d_chunks):
            blocks[f"b1d_chunk{i}"] = raw
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
    t_col = np.repeat(time_c, NY * NX)
    y_col = np.tile(np.repeat(y_c, NX), NT)
    x_col = np.tile(np.arange(NX, dtype=np.float64), NT * NY)

    def masked(arr, missing, np_t, pa_t):
        flat = arr.reshape(NT, -1).astype(object)
        for t in missing:
            flat[t, :] = None
        return pa.array(flat.reshape(-1).tolist(), pa_t)

    return pa.table({
        "time": pa.array(t_col, pa.float64()),
        "y": pa.array(y_col, pa.float64()),
        "x": pa.array(x_col, pa.float64()),
        "v_ea": masked(v_ea, EA_MISSING, np.float32, pa.float32()),
        "v_ea_filt": pa.array(v_ea_filt.reshape(-1), pa.float64()),
        "v_ea_sb": masked(v_ea_sb, SB_MISSING, np.int16, pa.int16()),
        "v_ea_paged": masked(v_ea_paged, PG_MISSING, np.int8, pa.int8()),
        "v_bt2": masked(v_bt2, B2_MISSING, np.int32, pa.int32()),
        "v_bt2f": pa.array(v_bt2f.reshape(-1), pa.float32()),
        "v_btree1_deep": pa.array(v_btree1_deep.reshape(-1), pa.float64()),
        "v_paged_fa": masked(v_paged_fa, FA_MISSING, np.float64, pa.float64()),
        "v_paged_fa_holes": masked(v_paged_fa_holes, FAH_MISSING,
                                   np.float32, pa.float32()),
    })


if __name__ == "__main__":
    data = build()
    with open("data/netcdf/extarray4.nc", "wb") as f:
        f.write(data)
    pq.write_table(mirror(), "data/netcdf/extarray4_expected.parquet",
                   compression="snappy")
    print(f"extarray4.nc: {len(data)} bytes, {NT}x{NY}x{NX}, "
          f"{len(VAR_NAMES)} vars (EA/B2/paged-FA/deep-B1 chunk indexes)")
