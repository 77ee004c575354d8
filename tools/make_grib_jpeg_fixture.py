#!/usr/bin/env python3
"""Generate the DRS 5.40 (JPEG2000 packing) GRIB2 fixture, committed under
data/grib/jpeg2000.grib2.

One message, written directly from the public WMO FM 92 GRIB2 spec like
every other fixture here: sections 0-8 with data representation template
5.40 (octets 12-21 as simple packing, then type-of-compression=1 LOSSY
and a target ratio), section 7 carrying a JPEG 2000 codestream prefix
(SOC + SIZ markers).

Since round 18 GribSource DECODES lossless 5.40 from spec (J2kDecoder +
tools/make_grib_j2k_fixture.py); this fixture pins the remaining REJECT
path — LOSSY (rate-controlled 9/7) streams have no exact integer
reconstruction, so indexing this file must fail with a named error that
identifies the lossy 5.40 cause and the conversion escape hatch
(grib_set -s packingType=grid_simple), never a silent skip or a generic
parse error.

Run once, commit output:
  python3 tools/make_grib_jpeg_fixture.py
"""
import struct

NI, NJ = 8, 6
LAT_FIRST, LON_FIRST = 17975000, -17975000
DINC = 50000


def s16(v):
    return struct.pack(">H", (0x8000 | -v) if v < 0 else v)


def s32(v):
    return struct.pack(">I", (0x80000000 | -v) if v < 0 else v)


def section(num, body):
    return struct.pack(">IB", 5 + len(body), num) + body


npts = NI * NJ
sec1 = section(1, struct.pack(">HHBBB", 98, 0, 2, 1, 1)
               + struct.pack(">H", 2023) + struct.pack(">BBBBB", 10, 1, 0, 0, 0)
               + struct.pack(">BB", 0, 1))
sec3 = section(3,
    struct.pack(">B", 0) + struct.pack(">I", npts) + struct.pack(">BB", 0, 0)
    + struct.pack(">H", 0)
    + struct.pack(">BBIBIBI", 6, 0, 0, 0, 0, 0, 0)
    + struct.pack(">II", NI, NJ) + struct.pack(">II", 0, 0)
    + s32(LAT_FIRST) + s32(LON_FIRST) + struct.pack(">B", 0x30)
    + s32(LAT_FIRST - (NJ - 1) * DINC) + s32(LON_FIRST + (NI - 1) * DINC)
    + struct.pack(">II", DINC, DINC) + struct.pack(">B", 0))
sec4 = section(4, struct.pack(">H", 0) + struct.pack(">H", 0)
               + struct.pack(">BB", 0, 197) + struct.pack(">B", 2)
               + struct.pack(">BB", 255, 255) + struct.pack(">HB", 0, 0)
               + struct.pack(">B", 1) + struct.pack(">i", 24)
               + struct.pack(">BBi", 1, 0, 0) + struct.pack(">BBi", 255, 0, 0))
# DRS template 5.40: R, E, D, nbits as simple packing; then original field
# type (0), type of compression (0 = lossless), target compression ratio
# (255 = undefined for lossless)
# type of compression 1 = LOSSY: the reject case that remains after
# round 18's lossless decoder — no exact integer reconstruction exists
# for a rate-controlled 9/7 stream, so the index-time error names the
# cause and the grib_set conversion
sec5 = section(5, struct.pack(">IH", npts, 40)
               + struct.pack(">f", 5.0) + s16(-1) + s16(1)
               + struct.pack(">BB", 12, 0) + struct.pack(">BB", 1, 128))
sec6 = section(6, struct.pack(">B", 255))
# A JPEG 2000 codestream prefix: SOC, then a SIZ segment sized for the
# grid (the reject path never reads it, but a future decoder's fixture
# should at least open with the real markers).
siz_body = struct.pack(">HIIIIIIIIH", 0, NI, NJ, 0, 0, NI, NJ, 0, 0, 1) + bytes([11, 1, 1])
siz = b"\xff\x51" + struct.pack(">H", 2 + len(siz_body)) + siz_body
sec7 = section(7, b"\xff\x4f" + siz + b"\xff\xd9")
body = sec1 + sec3 + sec4 + sec5 + sec6 + sec7
total = 16 + len(body) + 4
msg = (b"GRIB" + struct.pack(">HBB", 0, 1, 2) + struct.pack(">Q", total)
       + body + b"7777")

if __name__ == "__main__":
    with open("data/grib/jpeg2000.grib2", "wb") as f:
        f.write(msg)
    print(f"jpeg2000.grib2: {len(msg)} bytes, 1 message, DRS 5.40")
