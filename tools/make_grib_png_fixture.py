#!/usr/bin/env python3
"""Generate a GRIB2 fixture using data representation template 5.41
(PNG packing), plus its flattened parquet mirror, committed under
data/grib/.

Bytes are written directly from the public WMO FM 92 GRIB edition 2 spec
and the PNG specification (RFC 2083 / ISO 15948) with struct.pack and
Python's zlib — deliberately NOT via a GRIB or image library and NOT via
the Scala reader under test (the deflate side is CPython zlib, the
inflate side under test is the JDK Inflater: independent codec
implementations). Same discipline as make_grib_fixture.py (5.0) and
make_grib_complex_fixture.py (5.2/5.3).

Coverage: the four whole-byte PNG sample widths practical GRIB encoders
emit (8/16-bit grayscale, 24-bit RGB, 32-bit RGBA — NCEP g2clib
pngpack.c rounds the packed width to exactly these), both raster
layouts seen in the wild (g2clib's 1-row strip width=ndpts and an
Ni x Nj grid raster, plus a transposed factorization — the decoder's
contract is one pixel per data point, any factorization), all five PNG
filter types, a split-IDAT stream with an interleaved ancillary tEXt
chunk, a section-6 bitmap, and a constant field (nbits 0, empty
section 7).

Decode math: Y = (R + X*2^E) / 10^D, bit-identical between numpy here
and the JVM reader (R is an exact float32 widening; E=-1, D=1 keep the
products exact in float64 before the one shared division).

Run once, commit outputs:
  python3 tools/make_grib_png_fixture.py
"""
import calendar
import struct
import zlib

import numpy as np

NI, NJ = 9, 5  # lons, lats
LAT_FIRST, LON_FIRST = 12000000, 4000000  # micro-degrees, lat descending
DINC = 100000  # 0.1 degrees
REF = (2023, 11, 2, 6, 0, 0)
REF_EPOCH = calendar.timegm(REF + (0, 0))
E, D = -1, 1  # values on a 0.05 grid


def s16(v: int) -> bytes:
    return struct.pack(">H", (0x8000 | -v) if v < 0 else v)


def s32(v: int) -> bytes:
    return struct.pack(">I", (0x80000000 | -v) if v < 0 else v)


def section(num: int, body: bytes) -> bytes:
    return struct.pack(">IB", 5 + len(body), num) + body


def png_chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data)))


def encode_png(vals, nbits, width, height, filters, split_idat=False):
    """PNG stream holding `vals` (one per pixel) as big-endian samples:
    nbits 8/16 -> grayscale at that depth, 24 -> 8-bit RGB, 32 -> 8-bit
    RGBA. `filters` gives the per-scanline filter type (0-4); filtering
    is applied here forward (x - predictor) so the reader must run the
    full reconstruction."""
    assert len(vals) == width * height
    depth, color = {8: (8, 0), 16: (16, 0), 24: (8, 2), 32: (8, 6)}[nbits]
    bpp = nbits // 8  # bytes per pixel (= channels * depth/8)
    stride = width * bpp
    sample_bytes = b"".join(
        int(v).to_bytes(bpp, "big") for v in vals)
    rows = [sample_bytes[y * stride:(y + 1) * stride] for y in range(height)]
    filtered = bytearray()
    prev = bytes(stride)
    for row, ft in zip(rows, filters):
        filtered.append(ft)
        for i in range(stride):
            x = row[i]
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                v = x
            elif ft == 1:
                v = x - a
            elif ft == 2:
                v = x - b
            elif ft == 3:
                v = x - ((a + b) >> 1)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                v = x - pred
            filtered.append(v & 0xFF)
        prev = row
    comp = zlib.compress(bytes(filtered), 9)
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + png_chunk(b"IHDR", ihdr)
    if split_idat:
        half = len(comp) // 2
        out += png_chunk(b"IDAT", comp[:half])
        out += png_chunk(b"tEXt", b"Software\x00make_grib_png_fixture")
        out += png_chunk(b"IDAT", comp[half:])
    else:
        out += png_chunk(b"IDAT", comp)
    return out + png_chunk(b"IEND", b"")


def message(member, step_hours, field, nbits, width_height=None,
            filters=None, missing_mask=None, split_idat=False):
    npts = NI * NJ
    present = np.ones(npts, bool) if missing_mask is None else ~missing_mask.reshape(-1)
    scaled = np.round(field * 10.0 ** D / 2.0 ** E).astype(np.int64)
    vals = scaled.reshape(-1)[present]
    tmin = int(vals.min()) if vals.size else 0
    R = float(np.float32(tmin * 2.0 ** E))
    X = [int(v - tmin) for v in vals]
    if nbits:
        assert max(X) < (1 << nbits), (max(X), nbits)
    else:
        assert all(x == 0 for x in X)

    sec1 = section(1, struct.pack(">HHBBB", 98, 0, 2, 1, 1)
                   + struct.pack(">H", REF[0]) + struct.pack(">BBBBB", *REF[1:])
                   + struct.pack(">BB", 0, 1))
    sec3 = section(3,
        struct.pack(">B", 0)
        + struct.pack(">I", npts)
        + struct.pack(">BB", 0, 0)
        + struct.pack(">H", 0)
        + struct.pack(">BBIBIBI", 6, 0, 0, 0, 0, 0, 0)
        + struct.pack(">II", NI, NJ)
        + struct.pack(">II", 0, 0)
        + s32(LAT_FIRST) + s32(LON_FIRST)
        + struct.pack(">B", 0x30)
        + s32(LAT_FIRST - (NJ - 1) * DINC) + s32(LON_FIRST + (NI - 1) * DINC)
        + struct.pack(">II", DINC, DINC)
        + struct.pack(">B", 0))
    body4 = (struct.pack(">H", 0)
             + struct.pack(">H", 1 if member is not None else 0)
             + struct.pack(">BB", 0, 197)
             + struct.pack(">B", 2)
             + struct.pack(">BB", 255, 255)
             + struct.pack(">HB", 0, 0)
             + struct.pack(">B", 1)
             + struct.pack(">i", step_hours)
             + struct.pack(">BBi", 1, 0, 0)
             + struct.pack(">BBi", 255, 0, 0))
    if member is not None:
        body4 += struct.pack(">BBB", 3 if member > 0 else 0, member, 4)
    sec4 = section(4, body4)

    # DRS template 5.41: R, E, D, depth of image (bits per value), orig type
    sec5 = section(5, struct.pack(">IH", int(present.sum()), 41)
                   + struct.pack(">f", R) + s16(E) + s16(D)
                   + struct.pack(">BB", nbits, 0))
    if missing_mask is None:
        sec6 = section(6, struct.pack(">B", 255))
    else:
        acc, n, bm = 0, 0, bytearray()
        for p in present.astype(int):
            acc = (acc << 1) | int(p)
            n += 1
            if n == 8:
                bm.append(acc)
                acc, n = 0, 0
        if n:
            bm.append((acc << (8 - n)) & 0xFF)
        sec6 = section(6, struct.pack(">B", 0) + bytes(bm))
    if nbits == 0:
        sec7_body = b""  # constant field: no raster at all (g2clib lpack=0)
    else:
        w, h = width_height
        sec7_body = encode_png(X, nbits, w, h, filters, split_idat)
    sec7 = section(7, sec7_body)
    body = sec1 + sec3 + sec4 + sec5 + sec6 + sec7
    total = 16 + len(body) + 4
    msg = (b"GRIB" + struct.pack(">HBB", 0, 1, 2)
           + struct.pack(">Q", total) + body + b"7777")
    decoded = (np.float64(np.float32(R))
               + np.array(X, np.float64) * 2.0 ** E) / 10.0 ** D
    return msg, present, decoded


def field_for(member, step, kind, scale=1.0):
    m = 0 if member is None else member
    j, i = np.mgrid[0:NJ, 0:NI].astype(np.float64)
    if kind == "constant":
        return np.full((NJ, NI), 12.35)
    base = 3.0 + 0.4 * i + 0.15 * j * j + 2.0 * m + 0.9 * (step // 24)
    if kind == "wavy":
        base += 1.5 * np.round(np.sin(i * 1.1 + j) * 10) / 20.0
    return np.round(base * scale * 20) / 20.0  # snap to the 0.05 grid


def fuzz_main(out: str, seed: int, n_msgs: int = 6):
    """PNG_FUZZ mode (GribPngFuzzSpec drives this): seeded random
    messages with randomized grid dims, all four sample widths (plus
    constants), random per-scanline filter types, random raster
    factorizations of the present-point count (the decoder's contract is
    one pixel per point, ANY w x h), sparse bitmaps, split IDAT, and
    negative reference values. Offsets keep |tmin| < 2^23 so R is an
    exact float32 and sum(round(value*20)) is an exact integer — the
    same whole-file checksum line the complex/CCSDS fuzz modes print."""
    global NI, NJ
    rng = np.random.default_rng(seed)
    msgs, checks = [], []
    for mi in range(n_msgs):
        NI = int(rng.integers(1, 41))
        NJ = int(rng.integers(1, 31))
        npts = NI * NJ
        nbits = int(rng.choice([0, 8, 16, 24, 32]))
        lo = int(rng.integers(-8_000_000, 8_000_000))
        if nbits == 0:
            S = np.full(npts, lo, np.int64)
        else:
            span = min((1 << nbits) - 1, 10_000_000)
            S = lo + rng.integers(0, span + 1, npts, dtype=np.int64)
        field = (S.astype(np.float64) / 20.0).reshape(NJ, NI)
        mask = None
        if rng.integers(0, 3) == 0 and npts > 4:
            mask = rng.random((NJ, NI)) < 0.1
            if mask.all():
                mask[0, 0] = False
        n_present = npts if mask is None else int((~mask).sum())
        if nbits == 0:
            wh, filters = None, None
        else:
            divs = [d for d in range(1, n_present + 1) if n_present % d == 0]
            w = int(rng.choice(divs))
            h = n_present // w
            wh = (w, h)
            filters = [int(f) for f in rng.integers(0, 5, h)]
        member = None if mi == 0 else mi
        msg, present, decoded = message(
            member, 24 * (1 + mi % 3), field, nbits, wh, filters, mask,
            split_idat=bool(rng.integers(0, 2)))
        msgs.append(msg)
        checks.append(int(np.round(decoded * 20).astype(np.int64).sum()))
    with open(out, "wb") as fh:
        fh.write(b"".join(msgs))
    print(f"expected sum_scaled over file: {sum(checks)}")
    print(f"wrote {len(msgs)} PNG-packed messages to {out}")


if __import__("os").environ.get("PNG_FUZZ"):
    import sys
    fuzz_main(sys.argv[1], int(sys.argv[2]))
    raise SystemExit(0)


import pyarrow as pa
import pyarrow.parquet as pq

msgs, rows = [], []
lats = [(LAT_FIRST - j * DINC) / 1e6 for j in range(NJ)]
lons = [(LON_FIRST + i * DINC) / 1e6 for i in range(NI)]
npts = NI * NJ

bitmap_mask = np.zeros((NJ, NI), bool)
bitmap_mask[0, 0] = bitmap_mask[2, 4] = bitmap_mask[4, 8] = bitmap_mask[1, 7] = True

# (member, step, nbits, (w, h), filters, mask, split_idat, field kind, scale)
specs = [
    # 8-bit gray, grid raster, all five filter types across the rows
    (None, 24, 8, (NI, NJ), [0, 1, 2, 3, 4], None, False, "plain", 1.0),
    # 16-bit gray, g2clib 1-row strip, Sub filter over the whole strip
    (1, 24, 16, (npts, 1), [1], None, False, "wavy", 40.0),
    # 24-bit RGB, grid raster, filters reversed, large dynamic range
    (2, 48, 24, (NI, NJ), [4, 3, 2, 1, 0], None, False, "wavy", 9000.0),
    # 32-bit RGBA, transposed factorization (w*h = npts either way)
    (3, 48, 32, (NJ, NI), [2] * NI, None, False, "plain", 300000.0),
    # constant field: nbits 0, empty section 7
    (1, 48, 0, None, None, None, False, "constant", 1.0),
    # bitmap: strip holds only the 41 present values
    (2, 24, 8, (npts - 4, 1), [0], bitmap_mask, False, "plain", 1.0),
    # split IDAT with an ancillary tEXt chunk between the halves
    (3, 24, 16, (NI, NJ), [3, 4, 0, 1, 2], None, True, "wavy", 40.0),
]
for member, step, nbits, wh, filters, mask, split, kind, scale in specs:
    f = field_for(member, step, kind, scale)
    eff_mask = mask
    msg, present, decoded = message(member, step, f, nbits, wh, filters,
                                    eff_mask, split)
    msgs.append(msg)
    it = iter(decoded)
    for j in range(NJ):
        for i in range(NI):
            p = present[j * NI + i]
            rows.append((lats[j], lons[i],
                         None if member is None else member, step,
                         REF_EPOCH, next(it) if p else None))

with open("data/grib/png.grib2", "wb") as fh:
    fh.write(b"".join(msgs))

cols = list(zip(*rows))
table = pa.table({
    "latitude": pa.array(cols[0], pa.float64()),
    "longitude": pa.array(cols[1], pa.float64()),
    "number": pa.array(cols[2], pa.int32()),
    "step_hours": pa.array(cols[3], pa.int32()),
    "ref_time": pa.array(cols[4], pa.int64()),
    "value": pa.array(cols[5], pa.float64()),
})
pq.write_table(table, "data/grib/png_expected.parquet")
print(f"wrote {len(msgs)} GRIB2 messages ({sum(len(m) for m in msgs)} bytes), "
      f"expected parquet ({table.num_rows} rows)")
