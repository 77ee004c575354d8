#!/usr/bin/env python3
"""Generate a GRIB2 fixture using data representation template 5.4 (IEEE
floating point), plus its flattened parquet mirror, committed under
data/grib/.

Bytes are written directly from the public WMO FM 92 GRIB edition 2 spec
with struct.pack — deliberately NOT via a GRIB library and NOT via the
Scala reader under test (same discipline as the other grib fixture
writers). Template 5.4 is the one "unpacked" representation: section 7
is raw big-endian IEEE samples over the present cells, no R/E/D
scaling — float32 and float64 both widen to the Double `value` column
BIT-EXACTLY, so the fixture is exactly hash-checkable like every other
packing. (The r19 reject rationale "no packed integers to reconstruct
exactly" was wrong; round 20 decodes it. Precision 3 = 128-bit keeps a
loud reject: no Double-exact widening exists.)

Coverage: float32 (precision 1) plain; float64 (precision 2) plain —
with values chosen so the f64 payload does NOT round-trip through f32
(pinning that the reader honors the precision code); float32 + bitmap;
float64 + bitmap; a constant float32 field; negative/subnormal-adjacent
magnitudes.

Run once, commit outputs:
  python3 tools/make_grib_ieee_fixture.py
"""
import calendar
import struct

import numpy as np

NI, NJ = 9, 5  # lons, lats
LAT_FIRST, LON_FIRST = 12000000, 4000000  # micro-degrees, lat descending
DINC = 100000  # 0.1 degrees
REF = (2023, 11, 2, 6, 0, 0)
REF_EPOCH = calendar.timegm(REF + (0, 0))


def s32(v: int) -> bytes:
    return struct.pack(">I", (0x80000000 | -v) if v < 0 else v)


def section(num: int, body: bytes) -> bytes:
    return struct.pack(">IB", 5 + len(body), num) + body


def message(member, step_hours, field, precision, missing_mask=None):
    npts = NI * NJ
    present = (np.ones(npts, bool) if missing_mask is None
               else ~missing_mask.reshape(-1))
    vals = field.reshape(-1)[present]

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

    # DRS 5.4: number of data points, template 4, precision code — the
    # entire section is 12 octets (no R/E/D/nbits)
    sec5 = section(5, struct.pack(">IH", int(present.sum()), 4)
                   + struct.pack(">B", precision))
    if missing_mask is None:
        sec6 = section(6, struct.pack(">B", 255))
    else:
        bits = np.packbits(present.astype(np.uint8))
        sec6 = section(6, struct.pack(">B", 0) + bits.tobytes())
    if precision == 1:
        payload = vals.astype(">f4").tobytes()
        decoded = vals.astype(np.float32).astype(np.float64)
    else:
        payload = vals.astype(">f8").tobytes()
        decoded = vals.astype(np.float64)
    sec7 = section(7, payload)

    body = sec1 + sec3 + sec4 + sec5 + sec6 + sec7
    total = 16 + len(body) + 4
    msg = (b"GRIB" + struct.pack(">HBB", 0, 1, 2)
           + struct.pack(">Q", total) + body + b"7777")
    return msg, present, decoded


def field_for(member, step, kind):
    m = 0 if member is None else member
    j, i = np.mgrid[0:NJ, 0:NI].astype(np.float64)
    if kind == "constant":
        return np.full((NJ, NI), np.float64(np.float32(7.25)))
    # deliberately NOT representable on any coarse grid: thirds and
    # sevenths force every f64 bit to carry information, so a reader
    # that silently narrowed through f32 would hash-mismatch
    return (3.0 + i / 3.0 - j / 7.0 + 2.0 * m + 0.9 * (step // 24)
            - 11.0 * ((i + j) % 2))


import pyarrow as pa
import pyarrow.parquet as pq

msgs, rows = [], []
lats = [(LAT_FIRST - j * DINC) / 1e6 for j in range(NJ)]
lons = [(LON_FIRST + i * DINC) / 1e6 for i in range(NI)]
# (member, step, precision, bitmap, field kind)
specs = [
    (None, 24, 1, False, "plain"),    # float32 plain
    (1,    24, 2, False, "plain"),    # float64 plain (f32-unrepresentable)
    (2,    24, 1, True,  "plain"),    # float32 + bitmap
    (3,    48, 2, True,  "plain"),    # float64 + bitmap
    (1,    48, 1, False, "constant"), # constant float32 field
]
for member, step, precision, with_bitmap, kind in specs:
    f = field_for(member, step, kind)
    mask = None
    if with_bitmap:
        mask = np.zeros((NJ, NI), bool)
        mask[0, 0] = mask[2, 4] = mask[4, 8] = mask[1, 7] = True
    msg, present, decoded = message(member, step, f, precision, mask)
    msgs.append(msg)
    it = iter(decoded)
    for j in range(NJ):
        for i in range(NI):
            p = present[j * NI + i]
            rows.append((lats[j], lons[i],
                         None if member is None else member, step,
                         REF_EPOCH, float(next(it)) if p else None))

with open("data/grib/ieee.grib2", "wb") as fh:
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
pq.write_table(table, "data/grib/ieee_expected.parquet")
print(f"wrote {len(msgs)} GRIB2 messages ({sum(len(m) for m in msgs)} bytes), "
      f"expected parquet ({table.num_rows} rows)")
