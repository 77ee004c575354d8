#!/usr/bin/env python3
"""Generate the >255-message GRIB2 day fixture + parquet mirror, committed
under data/grib/.

Same independent from-spec byte writing as make_grib_fixture.py (WMO FM 92
GRIB2: sections 0-8, grid template 3.0, product template 4.1, simple
packing 5.0), but at the full GloFAS ensemble width: 51 members (0 =
control) x 6 steps = 306 messages in ONE file — past the 255 boundary that
a byte-sized anything in the reader's message indexing would silently wrap
at, and past one-message-per-member assumptions. Grid stays the small 6x8
so the mirror (14,688 rows) is committed-oracle-sized.

Run once, commit outputs:
  python3 tools/make_grib_bigday_fixture.py
"""
import calendar
import struct

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

NI, NJ = 8, 6
LAT_FIRST, LON_FIRST = 17975000, -17975000
DINC = 50000
REF = (2023, 10, 1, 0, 0, 0)
REF_EPOCH = calendar.timegm(REF + (0, 0))
MEMBERS = 51
STEPS = [24 * d for d in range(1, 7)]
D, E, NBITS = 1, -1, 12


def s16(v: int) -> bytes:
    return struct.pack(">H", (0x8000 | -v) if v < 0 else v)


def s32(v: int) -> bytes:
    return struct.pack(">I", (0x80000000 | -v) if v < 0 else v)


def section(num: int, body: bytes) -> bytes:
    return struct.pack(">IB", 5 + len(body), num) + body


def pack_bits(values, nbits: int) -> bytes:
    out, acc, n = bytearray(), 0, 0
    for v in values:
        acc = (acc << nbits) | int(v)
        n += nbits
        while n >= 8:
            n -= 8
            out.append((acc >> n) & 0xFF)
    if n:
        out.append((acc << (8 - n)) & 0xFF)
    return bytes(out)


def field_for(member: int, step: int) -> np.ndarray:
    idx = np.arange(NI * NJ, dtype=np.float64).reshape(NJ, NI)
    return 5.0 + 0.4 * idx + 7.0 * member + 1.3 * (step // 24)


def message(member: int, step_hours: int, field: np.ndarray) -> bytes:
    npts = NI * NJ
    scaled = np.round(field * 10.0 ** D / 2.0 ** E)
    vals = scaled.reshape(-1)
    R = float(np.float32(vals.min() * 2.0 ** E))
    X = np.round(vals - R / 2.0 ** E).astype(np.int64)
    assert (X >= 0).all() and (X < 2 ** NBITS).all()

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
             + struct.pack(">H", 1)  # template 4.1
             + struct.pack(">BB", 0, 197)
             + struct.pack(">B", 2)
             + struct.pack(">BB", 255, 255)
             + struct.pack(">HB", 0, 0)
             + struct.pack(">B", 1)
             + struct.pack(">i", step_hours)
             + struct.pack(">BBi", 1, 0, 0)
             + struct.pack(">BBi", 255, 0, 0)
             + struct.pack(">BBB", 3 if member > 0 else 0, member, MEMBERS))
    sec4 = section(4, body4)
    sec5 = section(5, struct.pack(">IH", npts, 0)
                   + struct.pack(">f", R) + s16(E) + s16(D)
                   + struct.pack(">BB", NBITS, 0))
    sec6 = section(6, struct.pack(">B", 255))
    sec7 = section(7, pack_bits(X, NBITS))
    body = sec1 + sec3 + sec4 + sec5 + sec6 + sec7
    total = 16 + len(body) + 4
    return (b"GRIB" + struct.pack(">HBB", 0, 1, 2)
            + struct.pack(">Q", total) + body + b"7777")


lats = [(LAT_FIRST - j * DINC) / 1e6 for j in range(NJ)]
lons = [(LON_FIRST + i * DINC) / 1e6 for i in range(NI)]
msgs, rows = [], []
for step in STEPS:
    for member in range(MEMBERS):
        f = field_for(member, step)
        msgs.append(message(member, step, f))
        # expected decoded values via the packing round trip
        scaled = np.round(f * 10.0 ** D / 2.0 ** E)
        vals = scaled.reshape(-1)
        R = float(np.float32(vals.min() * 2.0 ** E))
        X = np.round(vals - R / 2.0 ** E)
        decoded = (np.float64(np.float32(R)) + X * 2.0 ** E) / 10.0 ** D
        it = iter(decoded)
        for j in range(NJ):
            for i in range(NI):
                rows.append((lats[j], lons[i], member, step, REF_EPOCH, next(it)))

with open("data/grib/bigday.grib2", "wb") as fh:
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
pq.write_table(table, "data/grib/bigday_expected.parquet")
print(f"wrote {len(msgs)} GRIB2 messages ({sum(len(m) for m in msgs)} bytes), "
      f"expected parquet ({table.num_rows} rows)")
