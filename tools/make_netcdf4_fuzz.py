#!/usr/bin/env python3
"""Seeded randomized NetCDF-4/HDF5 files for differential fuzzing of the
Scala reader (Netcdf4FuzzSpec drives this).

Same from-spec byte construction as make_netcdf4_fixture.py (struct.pack
per the public HDF5 File Format Specification + netCDF-4 dimension-scale
conventions, independent of the reader under test), but every structural
parameter randomizes from the seed:

  - superblock v0 (v1 object headers, symbol-table group) or v2 (OHDR v2,
    lookup3 checksums) with COMPACT link messages or DENSE link storage
    (fractal heap + v2 B-tree name index: random block size and
    links-per-block packing, root direct block vs root indirect row with
    Undef slots, B-tree depth 0 vs 1 with separator records; since
    round 20 the heap-ID classes also randomize — id_len 7 or 14 and
    managed cap 4096 or 12 bytes, partitioning links into MANAGED, TINY
    (message inside the ID) and HUGE (raw spill + type-1 v2 B-tree));
  - 2-3 dims of random sizes, random coordinate direction, each dim a
    real coordinate variable or a PHONY scale (index coordinates);
  - 1-3 data variables over random dtypes (f4/f8/i2/i4/i8/u1/u2/u4 —
    unsigned values deliberately exceed the signed range of their width so
    a sign-extension bug in the reader fails the checksum), each with a
    random layout form: v3 contiguous, v3 B-tree-v1 chunked, or the
    1.10+ layout-v4 chunk indexes (v4 contiguous, single chunk
    +-filtered, implicit, fixed array clients 0/1 — occasionally with an
    unallocated chunk that must read back as fill, and occasionally a
    rank-only dim list pinning the reader's documented tolerance), with
    random (often non-dividing -> edge chunks) chunk dims and a random
    filter pipeline from {none, deflate, shuffle+deflate,
    deflate+fletcher32, shuffle+deflate+fletcher32};
  - optional _FillValue with a random fill mask;
  - random extra attributes the reader must SKIP by framing;
  - ~30% of variables store their attributes DENSELY (Attribute Info ->
    fractal heap + type-8 v2 B-tree, v3 attribute messages) with the
    load-bearing DIMENSION_LIST inside.

Values land on the 1/8 grid so `round(value * 1000)` is engine-exact.
For each variable the generator prints one expectation line:
  EXPECT <var> <non_fill_count> <sum of round(value*1000) over non-fill>

Usage: python3 tools/make_netcdf4_fuzz.py <out.nc> <seed>
"""
import struct
import sys
import zlib

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF


def u8(v): return struct.pack("<B", v)
def u16(v): return struct.pack("<H", v)
def u32(v): return struct.pack("<I", v)
def u64(v): return struct.pack("<Q", v)


def pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


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
    n = len(raw) // elem
    out = bytearray(len(raw))
    for k in range(elem):
        out[k * n:(k + 1) * n] = raw[k::elem]
    return bytes(out)


# ---------------------------------------------------------------- datatypes
def dt_for(dtype: np.dtype) -> bytes:
    if dtype == np.float32:
        props = u16(0) + u16(32) + u8(23) + u8(8) + u8(0) + u8(23) + u32(127)
        return u8(0x11) + u8(0x20) + u8(0x3F) + u8(0x00) + u32(4) + props
    if dtype == np.float64:
        props = u16(0) + u16(64) + u8(52) + u8(11) + u8(0) + u8(52) + u32(1023)
        return u8(0x11) + u8(0x20) + u8(0x3F) + u8(0x00) + u32(8) + props
    size = dtype.itemsize
    sign_bit = 0x08 if dtype.kind == "i" else 0x00
    return (u8(0x10) + u8(sign_bit) + u8(0) + u8(0) + u32(size) +
            u16(0) + u16(size * 8))


def dt_string(n: int) -> bytes:
    return u8(0x13) + u8(0x00) + u8(0) + u8(0) + u32(n)


def dt_objref() -> bytes:
    return u8(0x17) + u8(0x00) + u8(0) + u8(0) + u32(8)


def dt_vlen_of(base: bytes) -> bytes:
    return u8(0x19) + u8(0x00) + u8(0) + u8(0) + u32(16) + base


def ds_simple_v1(dims) -> bytes:
    return (u8(1) + u8(len(dims)) + u8(0) + u8(0) + u32(0) +
            b"".join(u64(d) for d in dims))


def ds_scalar_v2() -> bytes:
    return u8(2) + u8(0) + u8(0) + u8(0)


# ---------------------------------------------------------------- messages
def msg_v1(mtype, body):
    body = pad8(body)
    return u16(mtype) + u16(len(body)) + u8(0) + b"\x00" * 3 + body


def object_header_v1(messages):
    block = b"".join(msg_v1(t, b) for t, b in messages)
    return (u8(1) + u8(0) + u16(len(messages)) + u32(1) + u32(len(block)) +
            b"\x00" * 4 + block)


def msg_v2(mtype, body):
    return u8(mtype) + u16(len(body)) + u8(0) + body


def object_header_v2(messages):
    block = b"".join(msg_v2(t, b) for t, b in messages)
    prefix = b"OHDR" + u8(2) + u8(0x02) + u32(len(block))
    whole = prefix + block
    return whole + u32(lookup3(whole))


def attr_v1(name, dtype, dspace, data):
    nb = name.encode() + b"\x00"
    return (u8(1) + u8(0) + u16(len(nb)) + u16(len(dtype)) + u16(len(dspace)) +
            pad8(nb) + pad8(dtype) + pad8(dspace) + data)


def attr_str(name, value):
    vb = value.encode() + b"\x00"
    return attr_v1(name, dt_string(len(vb)), ds_scalar_v2(), vb)


def fill_value_msg(value):
    if value is None:
        return u8(2) + u8(2) + u8(0) + u8(0)
    return u8(2) + u8(2) + u8(0) + u8(1) + u32(len(value)) + value


def layout_contiguous(addr, size):
    return u8(3) + u8(1) + u64(addr) + u64(size)


def layout_chunked(btree_addr, chunk_dims, elem):
    dims = list(chunk_dims) + [elem]
    return (u8(3) + u8(2) + u8(len(dims)) + u64(btree_addr) +
            b"".join(u32(d) for d in dims))


def layout_v4_contiguous(addr, size):
    return u8(4) + u8(1) + u64(addr) + u64(size)


def layout_v4_chunked(flags, cdims_elem, index_type, extra, addr, enc_len):
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


def attr_v3(name, dtype, dspace, data):
    nb = name.encode() + b"\x00"
    return (u8(3) + u8(0) + u16(len(nb)) + u16(len(dtype)) + u16(len(dspace))
            + u8(0) + nb + dtype + dspace + data)


ATTR_DB_HDR = 4 + 1 + 8 + 5 + 4  # 40-bit heap space -> 5-byte offsets


def filter_pipeline(filters):
    body = u8(1) + u8(len(filters)) + u16(0) + u32(0)
    for fid, cd in filters:
        body += u16(fid) + u16(0) + u16(1) + u16(len(cd))
        body += b"".join(u32(c) for c in cd)
        if len(cd) % 2:
            body += u32(0)
    return body


def link_msg(name, oh_addr):
    nb = name.encode()
    return u8(1) + u8(0) + u8(len(nb)) + nb + u64(oh_addr)


def chunk_grid(dims, cdims):
    import itertools
    return list(itertools.product(*[range(0, d, c) for d, c in zip(dims, cdims)]))


def build_chunks(arr, cdims, fillv, filters):
    dims = arr.shape
    elem = arr.dtype.itemsize
    out = []
    for origin in chunk_grid(dims, cdims):
        full = np.full(cdims, fillv, dtype=arr.dtype)
        sl = tuple(slice(o, min(o + c, d)) for o, c, d in zip(origin, cdims, dims))
        dst = tuple(slice(0, s.stop - s.start) for s in sl)
        full[dst] = arr[sl]
        raw = full.tobytes()
        for fid, cd in filters:
            if fid == 2:
                raw = shuffle_bytes(raw, elem)
            elif fid == 1:
                raw = zlib.compress(raw, cd[0])
            elif fid == 3:
                raw = raw + u32(fletcher32(raw))
        out.append((origin, raw))
    return out


def btree_v1_chunks(chunks, addr_of, dataset_dims, cdims):
    body = b"TREE" + u8(1) + u8(0) + u16(len(chunks)) + u64(UNDEF) + u64(UNDEF)
    for i, (origin, raw) in enumerate(chunks):
        body += u32(len(raw)) + u32(0)
        body += b"".join(u64(o) for o in origin) + u64(0)
        body += u64(addr_of(i))
    bound = [((d + c - 1) // c) * c for d, c in zip(dataset_dims, cdims)]
    body += u32(0) + u32(0) + b"".join(u64(o) for o in bound) + u64(0)
    return body


def ds_simple_v1_max(dims, maxdims):
    """v1 dataspace WITH max dims (flags bit 0): UNDEF = unlimited."""
    return (u8(1) + u8(len(dims)) + u8(1) + u8(0) + u32(0) +
            b"".join(u64(d) for d in dims) +
            b"".join(u64(d) for d in maxdims))


# ------------------------------------------------- extensible-array blocks
def ea_hdr(client, elmt_size, params, stats, iblk_addr):
    maxbits, idx, minel, minptr, pagebits = params
    h = (b"EAHD" + u8(0) + u8(client) + u8(elmt_size) + u8(maxbits) +
         u8(idx) + u8(minel) + u8(minptr) + u8(pagebits) +
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


def ea_plan(n, params):
    """Static H5EA geometry for an n-element array: materialized direct
    data blocks (slot, start, ne) and super blocks (start, nd, ne, npages).
    A block is materialized iff its first element index is < n."""
    maxbits, idx, minel, minptr, pagebits = params
    log2 = lambda v: v.bit_length() - 1  # noqa: E731
    nsblks = 1 + maxbits - log2(minel)
    first = 2 * log2(minptr)
    page = 1 << pagebits
    direct = []
    start, slot, u = idx, 0, 0
    while u < first and u < nsblks:
        nd, ne = 1 << (u // 2), minel << ((u + 1) // 2)
        assert ne <= page, "iblock-direct data block would page"
        for _ in range(nd):
            if start < n:
                direct.append((slot, start, ne))
            slot += 1
            start += ne
        u += 1
    sblks = []
    s = 0
    while u < nsblks and start < n:
        nd, ne = 1 << (u // 2), minel << ((u + 1) // 2)
        sblks.append((s, start, nd, ne, ne // page if ne > page else 0))
        start += nd * ne
        s += 1
        u += 1
    return dict(first=first, nda=2 * (minptr - 1),
                nsa=nsblks - first, page=page, direct=direct, sblks=sblks,
                arr_off=(maxbits + 7) // 8)


# ------------------------------------------------------ v2 B-tree builders
def bt2_enc_size(v):
    return max(1, (int(v).bit_length() + 7) // 8)


def bt2_caps(node_size, rrec, max_depth=8):
    """Per-level record capacities + count-field widths, the exact reader
    formulas (leaf (nodeSize-10)/rrec; internal pointers sized for the
    leaf max + the child level's cumulative total)."""
    leaf = (node_size - 10) // rrec
    maxn, cum, cums = [leaf], [leaf], [0]
    mns = bt2_enc_size(leaf)
    for d in range(1, max_depth + 1):
        ptr = 8 + mns + cums[d - 1]
        m = (node_size - 10 - ptr) // (rrec + ptr)
        if m < 1:
            break
        maxn.append(m)
        cum.append((m + 1) * cum[d - 1] + m)
        cums.append(bt2_enc_size(cum[d]))
    return maxn, cum, cums, mns


def bt2_structure(n, maxn, cum):
    """Distribute n records into a minimal-depth tree: ('leaf', count) or
    ('int', depth, own_record_count, [children])."""
    depth = 0
    while cum[depth] < n:
        depth += 1
        assert depth < len(cum), "record count exceeds tree capacity"
    def rec(n, depth):
        if depth == 0:
            return ("leaf", n)
        r = 1
        while (r + 1) * cum[depth - 1] + r < n:
            r += 1
        k = r + 1
        rest = n - r
        subs = [rest // k + (1 if i < rest % k else 0) for i in range(k)]
        assert all(1 <= s <= cum[depth - 1] for s in subs), (n, depth, subs)
        return ("int", depth, r, [rec(s, depth - 1) for s in subs])
    return depth, rec(n, depth)


def bt2_total(node):
    """Total records in a subtree."""
    if node[0] == "leaf":
        return node[1]
    return node[2] + sum(bt2_total(c) for c in node[3])


def bt2_node_names(prefix, structure):
    """Flatten the structure into per-node block names (post-order)."""
    names = []
    counter = [0]
    def walk(node):
        if node[0] == "leaf":
            nm = f"{prefix}_leaf{counter[0]}"
        else:
            for ch in node[3]:
                walk(ch)
            nm = f"{prefix}_int{counter[0]}"
        counter[0] += 1
        names.append((nm, node))
        return nm
    root = walk(structure)
    return names, root


# ---------------------------------------------------------------- generate
def main(out: str, seed: int) -> None:
    rng = np.random.default_rng(seed)
    sb_version = int(rng.choice([0, 2]))
    ndims = int(rng.integers(2, 4))
    dim_sizes = [int(rng.integers(5, 41)) for _ in range(ndims)]
    dim_names = [f"d{i}" for i in range(ndims)]
    # phony vs real coordinate var per dim; coords ascending or descending
    dim_has_coord = [bool(rng.integers(0, 2)) for _ in range(ndims)]
    dim_coords = []
    for i in range(ndims):
        start = float(rng.integers(-100, 100))
        stepv = float(rng.choice([0.125, 0.25, 0.5, 1.0]))
        sign = 1.0 if rng.integers(0, 2) else -1.0
        dim_coords.append(np.array(
            [start + sign * stepv * k for k in range(dim_sizes[i])], np.float64))

    nvars = int(rng.integers(1, 4))
    dtypes = [np.dtype(t) for t in
              rng.choice(["f4", "f8", "i2", "i4", "i8", "u1", "u2", "u4"], nvars)]
    npts = int(np.prod(dim_sizes))
    expects = []
    var_specs = []
    for v in range(nvars):
        dt = dtypes[v]
        if dt.kind == "f":
            vals = rng.integers(-4000, 4000, npts).astype(np.float64) / 8.0
            arr = vals.astype(dt).reshape(dim_sizes)
        elif dt.kind == "u":
            # top half of the unsigned range: every value has the sign bit
            # of the same-width signed type set, so misdecoding as signed
            # yields negatives and a wildly wrong checksum
            lim = 2 ** (dt.itemsize * 8) - 10
            arr = rng.integers(lim // 2, lim, npts).astype(dt).reshape(dim_sizes)
        else:
            lim = min(2 ** (dt.itemsize * 8 - 1) - 10, 30000)
            arr = rng.integers(-lim // 2, lim // 2, npts).astype(dt).reshape(dim_sizes)
        has_fill = bool(rng.integers(0, 2))
        if has_fill:
            if dt.kind == "f":
                fillv = dt.type(-99999)
            elif dt.kind == "u":
                fillv = dt.type(2 ** (dt.itemsize * 8) - 1)
            else:
                fillv = dt.type(min(2 ** (dt.itemsize * 8 - 1) - 1, 32767))
            mask = rng.random(npts).reshape(dim_sizes) < 0.07
            arr[mask] = fillv
        else:
            fillv, mask = dt.type(0), np.zeros(dim_sizes, bool)
        # layout form: classic v3 (contiguous / B-tree-v1 chunked) or the
        # 1.10+ layout-v4 chunk indexes (single chunk ±filtered, implicit,
        # fixed array clients 0/1 ± PAGED data blocks, EXTENSIBLE ARRAY,
        # v2 B-TREE — the round-19 unlimited-dimension index family)
        form = str(rng.choice(["v3_contig", "v3_btree", "v4_contig",
                               "v4_single", "v4_implicit", "v4_fixed",
                               "v4_fixed_paged", "v4_ea", "v4_bt2"]))
        cdims = None
        filters = []
        lvl = int(rng.integers(1, 10))
        if form == "v3_btree":
            cdims = [int(rng.integers(2, d + 3)) for d in dim_sizes]
            style = int(rng.integers(0, 5))
            if style == 1:
                filters = [(1, [lvl])]
            elif style == 2:
                filters = [(2, [dt.itemsize]), (1, [lvl])]
            elif style == 3:
                filters = [(1, [lvl]), (3, [])]
            elif style == 4:
                filters = [(2, [dt.itemsize]), (1, [lvl]), (3, [])]
        elif form == "v4_single":
            cdims = list(dim_sizes)  # one chunk covering the dataset
            if rng.integers(0, 2):
                filters = [(1, [lvl])] if rng.integers(0, 2) else \
                    [(2, [dt.itemsize]), (1, [lvl]), (3, [])]
        elif form == "v4_implicit":
            cdims = [int(rng.integers(2, d + 3)) for d in dim_sizes]
        elif form in ("v4_fixed", "v4_fixed_paged", "v4_ea", "v4_bt2"):
            cdims = [int(rng.integers(2, d + 3)) for d in dim_sizes]
            style = int(rng.integers(0, 3))
            if style == 1:
                filters = [(1, [lvl])]
            elif style == 2:
                filters = [(2, [dt.itemsize]), (1, [lvl]), (3, [])]
        chunked = cdims is not None
        grid = chunk_grid(dim_sizes, cdims) if chunked else None
        nchunks = len(grid) if chunked else 0

        def mark_missing(idxs):
            for mi in idxs:
                og = grid[mi]
                sl = tuple(slice(o, min(o + c, d))
                           for o, c, d in zip(og, cdims, dim_sizes))
                arr[sl] = fillv
                mask[sl] = True

        # unallocated chunks (Undef index entries / absent records) and
        # UNINITIALIZED pages read back as the fill pattern — planted only
        # when a fill is defined, and accounted in the expectation
        missing_set = set()
        extra = {}
        if form == "v4_fixed" and has_fill and not filters and rng.integers(0, 2):
            missing_set = {int(rng.integers(0, nchunks))}
        elif form == "v4_fixed_paged":
            # page small enough that the data block pages (>= 2 pages)
            pb = max(1, min(int(rng.integers(1, 4)),
                            (nchunks - 1).bit_length() - 1)) \
                if nchunks > 2 else 10
            extra["fa_pagebits"] = pb
            page = 1 << pb
            npages = (nchunks + page - 1) // page if nchunks > page else 0
            uninit = set()
            if npages > 1 and has_fill and rng.integers(0, 2):
                uninit = {int(rng.integers(0, npages))}
                for p in uninit:
                    missing_set |= set(range(p * page, min(nchunks, (p + 1) * page)))
            if has_fill and rng.integers(0, 2):
                cand = int(rng.integers(0, nchunks))
                missing_set.add(cand)
            extra["fa_uninit"] = uninit
        elif form == "v4_ea":
            minel = int(rng.choice([2, 4]))
            minptr = int(rng.choice([2, 4]))
            idxe = int(rng.choice([1, 2, 4]))
            lo = (minel * minptr).bit_length() - 1  # keep direct blocks unpaged
            pagebits = int(rng.integers(lo, lo + 3))
            maxbits = max(10, nchunks.bit_length() + 1)
            params = (maxbits, idxe, minel, minptr, pagebits)
            plan = ea_plan(nchunks, params)
            extra["ea_params"] = params
            extra["ea_plan"] = plan
            uninit = set()  # (sblk_index, dblk_j, page_p)
            if has_fill:
                # random Undef elements
                for mi in range(nchunks):
                    if rng.random() < 0.05:
                        missing_set.add(mi)
                # one uninitialized page of a paged super-block data block
                paged = [(s, start, nd, ne, np_) for (s, start, nd, ne, np_)
                         in plan["sblks"] if np_ > 0]
                if paged and rng.integers(0, 2):
                    s, start, nd, ne, np_ = paged[int(rng.integers(0, len(paged)))]
                    j = int(rng.integers(0, nd))
                    p = int(rng.integers(0, np_))
                    base0 = start + j * ne + p * plan["page"]
                    if base0 < nchunks:
                        uninit = {(s, j, p)}
                        missing_set |= set(range(
                            base0, min(nchunks, base0 + plan["page"])))
            extra["ea_uninit"] = uninit
        elif form == "v4_bt2":
            if has_fill:
                for mi in range(nchunks):
                    if rng.random() < 0.05:
                        missing_set.add(mi)
            # record size per the libhdf5 rule; node size from a target
            # leaf capacity so small corpora still exercise depth >= 1
            cbytes = int(np.prod(cdims)) * dt.itemsize
            L = min(8, 1 + ((cbytes.bit_length() - 1) + 8) // 8)
            rrec = 8 + ((L + 4) if filters else 0) + 8 * ndims
            leaf_cap = int(rng.integers(3, 9))
            node_size = 10 + leaf_cap * rrec + int(rng.integers(0, rrec))
            maxn, cum, cums, mns = bt2_caps(node_size, rrec, max_depth=14)
            n_present = nchunks - len(missing_set)
            if n_present < 1:  # keep at least one record in the tree
                missing_set.discard(next(iter(missing_set)))
                n_present += 1
            depth, structure = bt2_structure(n_present, maxn, cum)
            names, root = bt2_node_names(f"bt2_v{v}", structure)
            extra["bt2"] = dict(L=L, rrec=rrec, node_size=node_size,
                                maxn=maxn, cums=cums, mns=mns, depth=depth,
                                names=names, root=root, n=n_present)
        if missing_set:
            mark_missing(missing_set)
        nf = arr[~mask]
        expects.append((f"v{v}",
                        int((~mask).sum()),
                        # per-element rint is exact (<2^53); sum in int64 so
                        # u4-scale checksums (>2^53 total) stay exact too
                        int(np.rint(nf.astype(np.float64) * 1000)
                            .astype(np.int64).sum())))
        chunks = build_chunks(arr, cdims, fillv, filters) if chunked else None
        if missing_set:
            chunks = [(og, raw if i not in missing_set else None)
                      for i, (og, raw) in enumerate(chunks)]
        var_specs.append(dict(name=f"v{v}", arr=arr, dt=dt, cdims=cdims,
                              form=form, filters=filters,
                              missing_set=missing_set,
                              fill=fillv.tobytes() if has_fill else None,
                              history="x" * int(rng.integers(1, 40)),
                              enc_len=int(rng.choice([1, 2, 4])),
                              v4rankonly=bool(rng.random() < 0.2),
                              dense_attrs=bool(rng.random() < 0.3),
                              n_filler=int(rng.integers(6, 12)),
                              chunks=chunks, **extra))

    link_names = dim_names + [s["name"] for s in var_specs]

    # dense (fractal-heap + v2 B-tree) link storage, the post-compact-
    # threshold form — randomized: block size, links-per-block packing,
    # root direct vs root indirect, B-tree depth 0 vs 1
    dense = sb_version == 2 and bool(rng.integers(0, 2))
    dns = {}
    if dense:
        dns["start"] = int(rng.choice([256, 512]))
        dns["cap"] = int(rng.integers(3, 8))
        # round 20: heap-ID classes — an id_len above the managed minimum
        # (the spec's independent heap-ID-length field) makes the 13-byte
        # link bodies TINY-eligible; a small managed-object cap spills
        # bodies to HUGE (raw object + the heap's type-1 v2 B-tree)
        dns["idlen"] = int(rng.choice([7, 14]))
        dns["maxobj"] = int(rng.choice([4096, 4096, 12]))
        dns["lenbytes"] = 2 if dns["maxobj"] > 255 else 1
        cls = {}
        for nm in link_names:
            ln = len(link_msg(nm, 0))
            if ln <= dns["idlen"] - 1 and bool(rng.integers(0, 2)):
                cls[nm] = "tiny"
            elif ln > dns["maxobj"]:
                cls[nm] = "huge"
            else:
                cls[nm] = "managed"
        dns["cls"] = cls
        dns["huges"] = [nm for nm in link_names if cls[nm] == "huge"]
        managed_names = [nm for nm in link_names if cls[nm] == "managed"]
        DB_HDR = 4 + 1 + 8 + 4 + 4  # sig, ver, heap addr, 32-bit offset, cksum
        placements = {}
        blk, used, cnt = 0, DB_HDR, 0
        for nm in managed_names:
            ln = len(link_msg(nm, 0))
            if cnt == dns["cap"] or used + ln > dns["start"]:
                blk += 1
                used, cnt = DB_HDR, 0
            placements[nm] = (blk, blk * dns["start"] + used, ln)
            used += ln
            cnt += 1
        dns["placed"] = placements
        dns["nblocks"] = blk + 1
        assert dns["nblocks"] <= 4, "fuzz link set exceeds one indirect row"
        dns["root_direct"] = dns["nblocks"] == 1 and bool(rng.integers(0, 2))
        recs = sorted((lookup3(nm.encode()), i)
                      for i, nm in enumerate(link_names))
        dns["depth1"] = len(recs) >= 4 and bool(rng.integers(0, 2))
        if dns["depth1"]:
            nl = 2 if len(recs) < 7 else int(rng.integers(2, 4))
            bounds = [len(recs) * j // nl for j in range(nl + 1)]
            runs = [recs[bounds[j]:bounds[j + 1]] for j in range(nl)]
            dns["seps"] = [runs[j][0] for j in range(1, nl)]
            dns["leaves"] = [runs[0]] + [runs[j][1:] for j in range(1, nl)]
        else:
            dns["leaves"] = [recs]
            dns["seps"] = []

    order = ["sb", "root_oh"]
    if sb_version == 0:
        order += ["btree", "heap", "snod"]
    if dense:
        order += ["frhp"]
        if not dns["root_direct"]:
            order += ["fhib"]
        order += [f"fhdb{i}" for i in range(dns["nblocks"])]
        if dns["huges"]:
            order += [f"hugeobj_{nm}" for nm in dns["huges"]]
            order += ["hbthd", "hbtleaf"]
        order += ["bthd"]
        order += [f"btleaf{j}" for j in range(len(dns["leaves"]))]
        if dns["depth1"]:
            order += ["btint"]
    order += [f"oh_{n}" for n in link_names]
    for sp in var_specs:
        if sp["dense_attrs"]:
            order += [f"afrhp_{sp['name']}", f"afdb_{sp['name']}",
                      f"aleaf_{sp['name']}", f"abthd_{sp['name']}"]
    order += [f"vbtree_{s['name']}" for s in var_specs if s["form"] == "v3_btree"]
    order += [f"fahd_{s['name']}" for s in var_specs
              if s["form"] in ("v4_fixed", "v4_fixed_paged")]
    order += [f"fadb_{s['name']}" for s in var_specs
              if s["form"] in ("v4_fixed", "v4_fixed_paged")]
    for s in var_specs:
        nm = s["name"]
        if s["form"] == "v4_ea":
            n = len(s["chunks"])
            order += [f"eahd_{nm}", f"eaib_{nm}"]
            order += [f"eadb_{nm}_{slot}" for (slot, _, _) in s["ea_plan"]["direct"]]
            for (si, start, nd, ne, np_) in s["ea_plan"]["sblks"]:
                order += [f"easb_{nm}_{si}"]
                order += [f"easbdb_{nm}_{si}_{j}" for j in range(nd)
                          if start + j * ne < n]
        elif s["form"] == "v4_bt2":
            order += [f"bthd2_{nm}"]
            order += [n0 for n0, _ in s["bt2"]["names"]]
    order += ["gheap"]
    order += [f"cdata_{i}" for i in range(ndims) if dim_has_coord[i]]
    order += [f"vdata_{s['name']}" for s in var_specs
              if s["form"] in ("v3_contig", "v4_contig", "v4_implicit")]
    for s in var_specs:
        if s["form"] in ("v3_btree", "v4_single", "v4_fixed",
                         "v4_fixed_paged", "v4_ea", "v4_bt2"):
            order += [f"chunk_{s['name']}_{i}" for i in range(len(s["chunks"]))
                      if s["chunks"][i][1] is not None]

    def build(addr, eof):
        blocks = {}
        oh = object_header_v1 if sb_version == 0 else object_header_v2

        gobjs = []

        def galloc(data):
            gobjs.append(data)
            return len(gobjs)

        def dimension_list():
            els = b""
            for i in range(ndims):
                gi = galloc(u64(addr[f"oh_{dim_names[i]}"]))
                els += u32(1) + u64(addr["gheap"]) + u32(gi)
            return attr_v1("DIMENSION_LIST", dt_vlen_of(dt_objref()),
                           ds_simple_v1([ndims]), els)

        # dim scale headers
        for i, dn in enumerate(dim_names):
            msgs = [(0x0001, ds_simple_v1([dim_sizes[i]])),
                    (0x0003, dt_for(np.dtype("f8"))),
                    (0x0005, fill_value_msg(None))]
            if dim_has_coord[i]:
                msgs.append((0x0008, layout_contiguous(
                    addr[f"cdata_{i}"], dim_sizes[i] * 8)))
            else:
                msgs.append((0x0008, layout_contiguous(UNDEF, 0)))
            msgs += [(0x000C, attr_str("CLASS", "DIMENSION_SCALE")),
                     (0x000C, attr_str(
                         "NAME", dn if dim_has_coord[i] else
                         "This is a netCDF dimension but not a netCDF "
                         f"variable.  {dim_sizes[i]}"))]
            blocks[f"oh_{dn}"] = oh(msgs)

        # data variable headers
        for s in var_specs:
            nm = s["name"]
            elem = s["dt"].itemsize
            # extensible arrays imply ONE unlimited (outermost) dimension,
            # v2 B-trees imply several — write the max dims accordingly
            if s["form"] == "v4_ea":
                ds = ds_simple_v1_max(dim_sizes, [UNDEF] + dim_sizes[1:])
            elif s["form"] == "v4_bt2":
                ds = ds_simple_v1_max(dim_sizes, [UNDEF, UNDEF] + dim_sizes[2:])
            else:
                ds = ds_simple_v1(dim_sizes)
            msgs = [(0x0001, ds),
                    (0x0003, dt_for(s["dt"])),
                    (0x0005, fill_value_msg(None))]
            if s["filters"]:
                msgs.append((0x000B, filter_pipeline(s["filters"])))
            # layout v4 dims: rank+1 with trailing element size (libhdf5's
            # convention) most of the time, rank-only occasionally to pin
            # the reader's documented tolerance of both
            v4dims = (list(s["cdims"]) + [elem]) if s["cdims"] else None
            if v4dims is not None and s["v4rankonly"]:
                v4dims = list(s["cdims"])
            enc = s["enc_len"] if s["cdims"] else 0
            if s["form"] == "v3_btree":
                msgs.append((0x0008, layout_chunked(
                    addr[f"vbtree_{nm}"], s["cdims"], elem)))
            elif s["form"] == "v3_contig":
                msgs.append((0x0008, layout_contiguous(
                    addr[f"vdata_{nm}"], s["arr"].nbytes)))
            elif s["form"] == "v4_contig":
                msgs.append((0x0008, layout_v4_contiguous(
                    addr[f"vdata_{nm}"], s["arr"].nbytes)))
            elif s["form"] == "v4_single":
                raw = s["chunks"][0][1]
                extra = (u64(len(raw)) + u32(0)) if s["filters"] else b""
                msgs.append((0x0008, layout_v4_chunked(
                    0x2 if s["filters"] else 0, v4dims, 1, extra,
                    addr[f"chunk_{nm}_0"], enc)))
            elif s["form"] == "v4_implicit":
                msgs.append((0x0008, layout_v4_chunked(
                    0, v4dims, 2, b"", addr[f"vdata_{nm}"], enc)))
            elif s["form"] in ("v4_fixed", "v4_fixed_paged"):
                msgs.append((0x0008, layout_v4_chunked(
                    0, v4dims, 3, u8(s.get("fa_pagebits", 10)),
                    addr[f"fahd_{nm}"], enc)))
            elif s["form"] == "v4_ea":
                mb, idxe, minel, minptr, pbts = s["ea_params"]
                # layout-message parameter order: max bits, index elements,
                # min POINTERS, min ELEMENTS, page bits
                msgs.append((0x0008, layout_v4_chunked(
                    0, v4dims, 4,
                    u8(mb) + u8(idxe) + u8(minptr) + u8(minel) + u8(pbts),
                    addr[f"eahd_{nm}"], enc)))
            else:  # v4_bt2
                msgs.append((0x0008, layout_v4_chunked(
                    0, v4dims, 5,
                    u32(s["bt2"]["node_size"]) + u8(100) + u8(40),
                    addr[f"bthd2_{nm}"], enc)))
            if not s["dense_attrs"]:
                msgs.append((0x000C, dimension_list()))
                if s["fill"] is not None:
                    msgs.append((0x000C, attr_v1("_FillValue", dt_for(s["dt"]),
                                                 ds_simple_v1([1]), s["fill"])))
                # a random unknown attr the reader must skip by framing
                # (length precomputed: build() runs twice and must be pure)
                msgs.append((0x000C, attr_str("history", s["history"])))
            else:
                # DENSE attribute storage: DIMENSION_LIST (load-bearing),
                # optional _FillValue, and filler attrs past the compact
                # threshold ride an attribute fractal heap + type-8 B-tree
                els = b""
                for di in range(ndims):
                    gi = galloc(u64(addr[f"oh_{dim_names[di]}"]))
                    els += u32(1) + u64(addr["gheap"]) + u32(gi)
                abodies = [("DIMENSION_LIST",
                            attr_v3("DIMENSION_LIST", dt_vlen_of(dt_objref()),
                                    ds_simple_v1([ndims]), els))]
                if s["fill"] is not None:
                    abodies.append(("_FillValue",
                                    attr_v3("_FillValue", dt_for(s["dt"]),
                                            ds_simple_v1([1]), s["fill"])))
                for k in range(s["n_filler"]):
                    val = (f"f{k} " + s["history"][:k + 1]).encode() + b"\x00"
                    abodies.append((f"attr_{k:02d}",
                                    attr_v3(f"attr_{k:02d}", dt_string(len(val)),
                                            ds_scalar_v2(), val)))
                start = 2048
                aplaced = []
                aoff = ATTR_DB_HDR
                for _, body in abodies:
                    assert aoff + len(body) <= start, "attr heap overflow"
                    aplaced.append((aoff, len(body)))
                    aoff += len(body)
                adb = bytearray(start)
                adb[0:4] = b"FHDB"
                struct.pack_into("<Q", adb, 5, addr[f"afrhp_{nm}"])
                adb[13:18] = (0).to_bytes(5, "little")
                for (off, ln), (_, body) in zip(aplaced, abodies):
                    adb[off:off + ln] = body
                struct.pack_into("<I", adb, 18, lookup3(bytes(adb)))
                blocks[f"afdb_{nm}"] = bytes(adb)
                afrhp = (b"FRHP" + u8(0) + u16(8) + u16(0) + u8(0x2) +
                         u32(4096) + u64(0) + u64(UNDEF) +
                         u64(start - aoff) + u64(UNDEF) +
                         u64(start) + u64(start) + u64(aoff) +
                         u64(len(abodies)) +
                         u64(0) + u64(0) + u64(0) + u64(0) +
                         u16(4) + u64(start) + u64(65536) + u16(40) + u16(1) +
                         u64(addr[f"afdb_{nm}"]) + u16(0))
                blocks[f"afrhp_{nm}"] = afrhp + u32(lookup3(afrhp))
                arecs = sorted(
                    (lookup3(an.encode()),
                     u8(0) + off.to_bytes(5, "little") + u16(ln) + u8(0) + u32(ci))
                    for ci, ((an, _), (off, ln)) in enumerate(zip(abodies, aplaced)))
                aleaf = b"BTLF" + u8(0) + u8(8)
                for hsh, rec in arecs:
                    aleaf += rec + u32(hsh)
                blocks[f"aleaf_{nm}"] = aleaf + u32(lookup3(aleaf))
                abthd = (b"BTHD" + u8(0) + u8(8) + u32(512) + u16(17) + u16(0) +
                         u8(100) + u8(40) + u64(addr[f"aleaf_{nm}"]) +
                         u16(len(arecs)) + u64(len(arecs)))
                blocks[f"abthd_{nm}"] = abthd + u32(lookup3(abthd))
                msgs.append((0x0015, u8(0) + u8(0) +
                             u64(addr[f"afrhp_{nm}"]) + u64(addr[f"abthd_{nm}"])))
            blocks[f"oh_{s['name']}"] = oh(msgs)

        # root group
        if sb_version == 0:
            heap_data = bytearray(b"\x00" * 8)
            name_off = {}
            for nm in sorted(link_names):
                name_off[nm] = len(heap_data)
                heap_data += pad8(nm.encode() + b"\x00")
            heap_seg = bytes(heap_data)
            blocks["heap"] = (b"HEAP" + u8(0) + b"\x00" * 3 + u64(len(heap_seg))
                              + u64(UNDEF) + u64(addr["heap"] + 32) + heap_seg)

            def ste(nm):
                return (u64(name_off[nm]) + u64(addr[f"oh_{nm}"]) + u32(0)
                        + u32(0) + b"\x00" * 16)
            blocks["snod"] = (b"SNOD" + u8(1) + u8(0) + u16(len(link_names)) +
                              b"".join(ste(nm) for nm in sorted(link_names)))
            last = sorted(link_names)[-1]
            blocks["btree"] = (b"TREE" + u8(0) + u8(0) + u16(1) +
                               u64(UNDEF) + u64(UNDEF) +
                               u64(0) + u64(addr["snod"]) + u64(name_off[last]))
            blocks["root_oh"] = object_header_v1([
                (0x0011, u64(addr["btree"]) + u64(addr["heap"])),
                (0x000C, attr_str("_NCProperties", "version=2,fuzz=1")),
            ])
            blocks["sb"] = (b"\x89HDF\r\n\x1a\n" + u8(0) + u8(0) + u8(0) + u8(0)
                            + u8(0) + u8(8) + u8(8) + u8(0) + u16(4) + u16(16)
                            + u32(0) + u64(0) + u64(UNDEF) + u64(eof)
                            + u64(UNDEF) + u64(0) + u64(addr["root_oh"])
                            + u32(1) + u32(0)
                            + u64(addr["btree"]) + u64(addr["heap"]))
        elif not dense:
            links = [(0x0002, u8(0) + u8(0) + u64(UNDEF) + u64(UNDEF)),
                     (0x000A, u8(0) + u8(0))]
            links += [(0x0006, link_msg(nm, addr[f"oh_{nm}"]))
                      for nm in link_names]
            blocks["root_oh"] = object_header_v2(links)
            sbb = (b"\x89HDF\r\n\x1a\n" + u8(2) + u8(8) + u8(8) + u8(0)
                   + u64(0) + u64(UNDEF) + u64(eof) + u64(addr["root_oh"]))
            blocks["sb"] = sbb + u32(lookup3(sbb))
        else:
            START = dns["start"]
            placed = dns["placed"]
            cls = dns["cls"]
            for bi in range(dns["nblocks"]):
                data = bytearray(START)
                data[0:4] = b"FHDB"
                data[4] = 0
                struct.pack_into("<Q", data, 5, addr["frhp"])
                struct.pack_into("<I", data, 13, bi * START)
                for nm, (bk, off, ln) in placed.items():
                    if bk == bi:
                        local = off - bi * START
                        data[local:local + ln] = link_msg(nm, addr[f"oh_{nm}"])
                struct.pack_into("<I", data, 17, lookup3(bytes(data)))
                blocks[f"fhdb{bi}"] = bytes(data)
            if dns["root_direct"]:
                root_addr, cur_rows = addr["fhdb0"], 0
            else:
                fhib = (b"FHIB" + u8(0) + u64(addr["frhp"]) + u32(0) +
                        b"".join(u64(addr[f"fhdb{i}"] if i < dns["nblocks"]
                                     else UNDEF) for i in range(4)))
                blocks["fhib"] = fhib + u32(lookup3(fhib))
                root_addr, cur_rows = addr["fhib"], 1
            # huge links: raw objects + the heap's type-1 v2 B-tree,
            # records sorted by (monotone) huge ID
            huge_id = {nm: i + 1 for i, nm in enumerate(dns["huges"])}
            huge_size = 0
            for nm in dns["huges"]:
                body = link_msg(nm, addr[f"oh_{nm}"])
                blocks[f"hugeobj_{nm}"] = body
                huge_size += len(body)
            if dns["huges"]:
                hrecs = b"".join(
                    u64(addr[f"hugeobj_{nm}"]) +
                    u64(len(link_msg(nm, addr[f"oh_{nm}"]))) + u64(huge_id[nm])
                    for nm in dns["huges"])
                hleaf = b"BTLF" + u8(0) + u8(1) + hrecs
                blocks["hbtleaf"] = hleaf + u32(lookup3(hleaf))
                hbthd = (b"BTHD" + u8(0) + u8(1) + u32(512) + u16(24) + u16(0) +
                         u8(100) + u8(40) + u64(addr["hbtleaf"]) +
                         u16(len(dns["huges"])) + u64(len(dns["huges"])))
                blocks["hbthd"] = hbthd + u32(lookup3(hbthd))
            tiny_names = [nm for nm in link_names if cls[nm] == "tiny"]
            tiny_size = sum(len(link_msg(nm, 0)) for nm in tiny_names)
            managed = (1 if dns["root_direct"] else 4) * START
            frhp = (b"FRHP" + u8(0) + u16(dns["idlen"]) + u16(0) + u8(0x2) +
                    u32(dns["maxobj"]) + u64(len(dns["huges"]) + 1) +
                    u64(addr["hbthd"] if dns["huges"] else UNDEF) +
                    u64(managed - sum(p[2] for p in placed.values())) + u64(UNDEF) +
                    u64(managed) + u64(dns["nblocks"] * START) +
                    u64(max((p[1] + p[2] for p in placed.values()),
                            default=DB_HDR)) +
                    u64(len(placed)) +
                    u64(huge_size) + u64(len(dns["huges"])) +
                    u64(tiny_size) + u64(len(tiny_names)) +
                    u16(4) + u64(START) + u64(65536) + u16(32) + u16(1) +
                    u64(root_addr) + u16(cur_rows))
            blocks["frhp"] = frhp + u32(lookup3(frhp))

            def rec_bytes(h, i):
                nm = link_names[i]
                if cls[nm] == "managed":
                    bk, off, ln = placed[nm]
                    hid = (u8(0) + u32(off) +
                           ln.to_bytes(dns["lenbytes"], "little"))
                elif cls[nm] == "tiny":
                    body = link_msg(nm, addr[f"oh_{nm}"])
                    hid = u8(0x20 | (len(body) - 1)) + body
                else:  # huge ID field is min(idlen-1, 8) bytes (H5HF rule)
                    hid = (u8(0x10) + huge_id[nm].to_bytes(
                        min(dns["idlen"] - 1, 8), "little"))
                return u32(h) + hid.ljust(dns["idlen"], b"\x00")
            for j, leaf_recs in enumerate(dns["leaves"]):
                leaf = b"BTLF" + u8(0) + u8(5)
                for h, i in leaf_recs:
                    leaf += rec_bytes(h, i)
                blocks[f"btleaf{j}"] = leaf + u32(lookup3(leaf))
            nrec_total = sum(len(lf) for lf in dns["leaves"]) + len(dns["seps"])
            if dns["depth1"]:
                node = b"BTIN" + u8(0) + u8(5)
                for h, i in dns["seps"]:
                    node += rec_bytes(h, i)
                for j, leaf_recs in enumerate(dns["leaves"]):
                    node += u64(addr[f"btleaf{j}"]) + u8(len(leaf_recs))
                blocks["btint"] = node + u32(lookup3(node))
                root_node, root_nrec = addr["btint"], len(dns["seps"])
            else:
                root_node, root_nrec = addr["btleaf0"], len(dns["leaves"][0])
            bthd = (b"BTHD" + u8(0) + u8(5) + u32(512) +
                    u16(4 + dns["idlen"]) + u16(
                    1 if dns["depth1"] else 0) + u8(100) + u8(40) +
                    u64(root_node) + u16(root_nrec) + u64(nrec_total))
            blocks["bthd"] = bthd + u32(lookup3(bthd))
            blocks["root_oh"] = object_header_v2([
                (0x0002, u8(0) + u8(0) + u64(addr["frhp"]) + u64(addr["bthd"])),
                (0x000A, u8(0) + u8(0)),
            ])
            sbb = (b"\x89HDF\r\n\x1a\n" + u8(2) + u8(8) + u8(8) + u8(0)
                   + u64(0) + u64(UNDEF) + u64(eof) + u64(addr["root_oh"]))
            blocks["sb"] = sbb + u32(lookup3(sbb))

        # var chunk indexes + global heap + data
        for s in var_specs:
            nm = s["name"]
            if s["form"] == "v3_btree":
                blocks[f"vbtree_{nm}"] = btree_v1_chunks(
                    s["chunks"], lambda i, n=nm: addr[f"chunk_{n}_{i}"],
                    dim_sizes, s["cdims"])
            elif s["form"] in ("v4_fixed", "v4_fixed_paged"):
                n = len(s["chunks"])
                filtered = bool(s["filters"])
                client = 1 if filtered else 0
                esz = 16 if filtered else 8

                def fa_elem(i, raw, *, _nm=nm, _f=filtered):
                    if raw is None:
                        return u64(UNDEF) + (u32(0) + u32(0) if _f else b"")
                    return (u64(addr[f"chunk_{_nm}_{i}"]) +
                            (u32(len(raw)) + u32(0) if _f else b""))
                pb = s.get("fa_pagebits", 10)
                page = 1 << pb
                blocks[f"fahd_{nm}"] = fahd(client, esz, pb, n,
                                            addr[f"fadb_{nm}"])
                if n <= page:  # unpaged data block
                    elems = b"".join(fa_elem(i, raw)
                                     for i, (_, raw) in enumerate(s["chunks"]))
                    blocks[f"fadb_{nm}"] = fadb(client, addr[f"fahd_{nm}"], elems)
                else:  # PAGED: bitmap in the data block, element pages after
                    npages = (n + page - 1) // page
                    uninit = s.get("fa_uninit", set())
                    bm = bytearray((npages + 7) // 8)
                    d = (b"FADB" + u8(0) + u8(client) +
                         u64(addr[f"fahd_{nm}"]))
                    pages = b""
                    for p in range(npages):
                        pn = min(page, n - p * page)
                        if p in uninit:
                            pages += b"\x00" * (pn * esz + 4)
                        else:
                            bm[p // 8] |= 1 << (7 - p % 8)
                            body = b"".join(
                                fa_elem(i, s["chunks"][i][1])
                                for i in range(p * page, p * page + pn))
                            pages += body + u32(lookup3(body))
                    d += bytes(bm)
                    blocks[f"fadb_{nm}"] = d + u32(lookup3(d)) + pages
            elif s["form"] == "v4_ea":
                n = len(s["chunks"])
                plan = s["ea_plan"]
                filtered = bool(s["filters"])
                client = 1 if filtered else 0
                cbytes = int(np.prod(s["cdims"])) * s["dt"].itemsize
                L = min(8, 1 + ((cbytes.bit_length() - 1) + 8) // 8) \
                    if filtered else 0
                esz = 8 + L + 4 if filtered else 8
                ao = plan["arr_off"]
                hdr_a = addr[f"eahd_{nm}"]

                def ea_el(i, *, _nm=nm, _f=filtered, _L=L, _n=n):
                    if i >= _n or s["chunks"][i][1] is None:
                        return u64(UNDEF) + (b"\x00" * (_L + 4) if _f else b"")
                    raw = s["chunks"][i][1]
                    return (u64(addr[f"chunk_{_nm}_{i}"]) +
                            (len(raw).to_bytes(_L, "little") + u32(0)
                             if _f else b""))
                idxe = s["ea_params"][1]
                inline = b"".join(ea_el(i) for i in range(idxe))
                dblk_addrs = [UNDEF] * plan["nda"]
                for (slot, start, ne) in plan["direct"]:
                    dblk_addrs[slot] = addr[f"eadb_{nm}_{slot}"]
                    blocks[f"eadb_{nm}_{slot}"] = ea_dblock(
                        client, hdr_a, start - idxe, ao,
                        b"".join(ea_el(start + k) for k in range(ne)))
                sblk_addrs = [UNDEF] * plan["nsa"]
                uninit = s.get("ea_uninit", set())
                for (si, start, nd, ne, np_) in plan["sblks"]:
                    bmper = (np_ + 7) // 8 if np_ else 0
                    bm = bytearray(bmper * nd)
                    dbs = []
                    for j in range(nd):
                        if start + j * ne >= n:
                            dbs.append(UNDEF)
                            continue
                        a = addr[f"easbdb_{nm}_{si}_{j}"]
                        dbs.append(a)
                        if np_ == 0:
                            blocks[f"easbdb_{nm}_{si}_{j}"] = ea_dblock(
                                client, hdr_a, start - idxe + j * ne, ao,
                                b"".join(ea_el(start + j * ne + k)
                                         for k in range(ne)))
                        else:
                            pages = []
                            pn = plan["page"]
                            for p in range(np_):
                                if (si, j, p) in uninit:
                                    pages.append((b"\x00" * (pn * esz), False))
                                else:
                                    bm[j * bmper + p // 8] |= 1 << (7 - p % 8)
                                    pages.append((b"".join(
                                        ea_el(start + j * ne + p * pn + k)
                                        for k in range(pn)), True))
                            blocks[f"easbdb_{nm}_{si}_{j}"] = ea_dblock_paged(
                                client, hdr_a, start - idxe + j * ne, ao, pages)
                    sblk_addrs[si] = addr[f"easb_{nm}_{si}"]
                    blocks[f"easb_{nm}_{si}"] = ea_sblock(
                        client, hdr_a, start - idxe, ao, bytes(bm), dbs)
                blocks[f"eaib_{nm}"] = ea_iblock(
                    client, hdr_a, inline, dblk_addrs, sblk_addrs)
                blocks[f"eahd_{nm}"] = ea_hdr(
                    client, esz, s["ea_params"],
                    (len(plan["sblks"]), 0, len(plan["direct"]), 0, n, n),
                    addr[f"eaib_{nm}"])
            elif s["form"] == "v4_bt2":
                bt = s["bt2"]
                filtered = bool(s["filters"])
                bttype = 11 if filtered else 10
                present = [i for i, (_, raw) in enumerate(s["chunks"])
                           if raw is not None]

                def rec_bytes(ci, *, _nm=nm, _f=filtered):
                    og, raw = s["chunks"][ci]
                    scaled = [o // c for o, c in zip(og, s["cdims"])]
                    r = u64(addr[f"chunk_{_nm}_{ci}"])
                    if _f:
                        r += len(raw).to_bytes(bt["L"], "little") + u32(0)
                    return r + b"".join(u64(sc) for sc in scaled)
                counter = [0]

                def emit(node, lo, hi):
                    if node[0] == "leaf":
                        body = b"BTLF" + u8(0) + u8(bttype) + b"".join(
                            rec_bytes(present[i]) for i in range(lo, hi))
                        nm2 = f"bt2_{nm}_leaf{counter[0]}"
                        counter[0] += 1
                        blocks[nm2] = body + u32(lookup3(body))
                        return nm2, node[1], node[1]
                    _, depth, r, children = node
                    pos = lo
                    childinfo = []
                    seps = []
                    for ci2, ch in enumerate(children):
                        tot = bt2_total(ch)
                        childinfo.append(emit(ch, pos, pos + tot))
                        pos += tot
                        if ci2 < len(children) - 1:
                            seps.append(present[pos])
                            pos += 1
                    assert pos == hi, (pos, hi)
                    body = b"BTIN" + u8(0) + u8(bttype) + b"".join(
                        rec_bytes(ci3) for ci3 in seps)
                    tot_size = bt["cums"][depth - 1] if depth >= 2 else 0
                    for (cnm, cn, ctot) in childinfo:
                        body += u64(addr[cnm]) + cn.to_bytes(bt["mns"], "little")
                        if tot_size:
                            body += int(ctot).to_bytes(tot_size, "little")
                    nm2 = f"bt2_{nm}_int{counter[0]}"
                    counter[0] += 1
                    blocks[nm2] = body + u32(lookup3(body))
                    return nm2, r, hi - lo
                structure = bt["names"][-1][1]
                root_name, root_nrec, total = emit(structure, 0, len(present))
                h = (b"BTHD" + u8(0) + u8(bttype) + u32(bt["node_size"]) +
                     u16(bt["rrec"]) + u16(bt["depth"]) + u8(100) + u8(40) +
                     u64(addr[root_name]) + u16(root_nrec) + u64(total))
                blocks[f"bthd2_{nm}"] = h + u32(lookup3(h))
        gsize = 512
        while True:
            g = bytearray()
            for i, data in enumerate(gobjs):
                g += u16(i + 1) + u16(1) + u32(0) + u64(len(data)) + pad8(data)
            head = b"GCOL" + u8(1) + b"\x00" * 3 + u64(gsize)
            free = gsize - len(head) - len(g)
            if free >= 16:
                break
            gsize *= 2
        g += u16(0) + u16(0) + u32(0) + u64(free)
        blocks["gheap"] = head + bytes(g) + b"\x00" * (free - 16)
        for i in range(ndims):
            if dim_has_coord[i]:
                blocks[f"cdata_{i}"] = dim_coords[i].tobytes()
        for s in var_specs:
            nm = s["name"]
            if s["form"] in ("v3_contig", "v4_contig"):
                blocks[f"vdata_{nm}"] = s["arr"].tobytes()
            elif s["form"] == "v4_implicit":
                # implicit index: chunks stored contiguously in grid order
                blocks[f"vdata_{nm}"] = b"".join(raw for _, raw in s["chunks"])
            else:
                for i, (_, raw) in enumerate(s["chunks"]):
                    if raw is not None:
                        blocks[f"chunk_{nm}_{i}"] = raw
        return blocks

    addr = {k: 0 for k in order}
    sizes = {k: len(v) for k, v in build(addr, 0).items()}
    off = 0
    for k in order:
        addr[k] = off
        off += sizes[k]
    blocks = build(addr, off)
    data = b"".join(blocks[k] for k in order)
    assert len(data) == off
    with open(out, "wb") as f:
        f.write(data)
    for nm, cnt, chk in expects:
        print(f"EXPECT {nm} {cnt} {chk}")
    dtstr = ",".join(str(d) for d in dtypes)
    forms = ",".join(s["form"] + ("(miss)" if s["missing_set"] else "") for s in var_specs)
    dmode = ("dense" + ("/d1" if dns.get("depth1") else "/d0") +
             ("/rootdir" if dns.get("root_direct") else "/indirect")
             if dense else "compact")
    print(f"INFO sb={sb_version} dims={dim_sizes} vars={nvars} "
          f"dtypes={dtstr} forms={forms} links={dmode}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]))
