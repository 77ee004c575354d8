#!/usr/bin/env python3
"""Generate the GRIB2 test fixture + its flattened parquet mirror, committed
under data/grib/.

Bytes are written directly from the public WMO FM 92 GRIB edition 2 spec
(sections 0-8, grid definition template 3.0 regular lat/lon, product
definition templates 4.0/4.1, data representation template 5.0 simple
packing, optional section-6 bitmap) with struct.pack — deliberately NOT via
a GRIB library and NOT via the Scala reader under test, so the fixture is an
independent implementation of the format.

Shape mirrors a (shrunk) GloFAS ensemble forecast file
(flood/api/glofas_fetcher.py: cems-glofas-forecast, dis24): one message per
(perturbationNumber, step); grid Nj=6 lats descending × Ni=8 lons; 3
perturbed members × 2 steps, plus 1 control (template 4.1 type=0) and one
message carrying a bitmap with missing cells.

Decode math (simple packing): Y = (R + X * 2^E) / 10^D, all in float64 —
bit-identical between numpy here and the JVM reader (R is an exact float32
widening, 2^E and 10^D exact for the chosen E/D).

Run once, commit outputs:
  python3 tools/make_grib_fixture.py
"""
import calendar
import struct

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

NI, NJ = 8, 6  # lons, lats
LAT_FIRST, LON_FIRST = 17975000, -17975000  # micro-degrees, lat descending
DINC = 50000  # 0.05 degrees
REF = (2023, 10, 1, 0, 0, 0)
REF_EPOCH = calendar.timegm(REF + (0, 0))


def s16(v: int) -> bytes:
    """GRIB2 sign-and-magnitude int16 (high bit = sign)."""
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


def message(member, step_hours, field, missing_mask=None):
    """member None → template 4.0 (deterministic forecast); else 4.1."""
    npts = NI * NJ
    # simple packing parameters: D scales to integers, E rebins to halves
    D, E, NBITS = 1, -1, 12
    scaled = np.round(field * 10.0 ** D / 2.0 ** E)  # Y·10^D in units of 2^E
    present = np.ones(npts, bool) if missing_mask is None else ~missing_mask.reshape(-1)
    vals = scaled.reshape(-1)[present]
    R = float(np.float32(vals.min() * 2.0 ** E)) if vals.size else 0.0
    X = np.round(vals - R / 2.0 ** E).astype(np.int64)  # Y = (R + X·2^E)/10^D
    assert (X >= 0).all() and (X < 2 ** NBITS).all()

    # Section 1: identification — centre 98/ECMWF, ref time, forecast data
    sec1 = section(1, struct.pack(">HHBBB", 98, 0, 2, 1, 1)
                   + struct.pack(">H", REF[0]) + struct.pack(">BBBBB", *REF[1:])
                   + struct.pack(">BB", 0, 1))
    # Section 3: grid definition template 3.0 (regular lat/lon)
    sec3 = section(3,
        struct.pack(">B", 0)  # source of grid definition
        + struct.pack(">I", npts)
        + struct.pack(">BB", 0, 0)  # no optional numbers list
        + struct.pack(">H", 0)  # template 3.0
        + struct.pack(">BBIBIBI", 6, 0, 0, 0, 0, 0, 0)  # spherical earth
        + struct.pack(">II", NI, NJ)
        + struct.pack(">II", 0, 0)  # basic angle + subdivisions
        + s32(LAT_FIRST) + s32(LON_FIRST)
        + struct.pack(">B", 0x30)  # resolution/component flags: Di, Dj given
        + s32(LAT_FIRST - (NJ - 1) * DINC) + s32(LON_FIRST + (NI - 1) * DINC)
        + struct.pack(">II", DINC, DINC)
        + struct.pack(">B", 0))  # scanning mode 0: +i (lon asc), -j (lat desc)
    # Section 4: product definition template 4.0 / 4.1 (ensemble)
    body4 = (struct.pack(">H", 0)  # number of coordinate values
             + struct.pack(">H", 1 if member is not None else 0)  # template number
             + struct.pack(">BB", 0, 197)       # category 0, parameter 197 (discharge)
             + struct.pack(">B", 2)             # type of generating process: forecast
             + struct.pack(">BB", 255, 255)     # background/process identifiers
             + struct.pack(">HB", 0, 0)         # data cutoff hours, minutes
             + struct.pack(">B", 1)             # indicator of unit of time: hour
             + struct.pack(">i", step_hours)    # forecast time
             + struct.pack(">BBi", 1, 0, 0)     # first surface: ground
             + struct.pack(">BBi", 255, 0, 0))  # second surface: missing
    if member is not None:
        body4 += struct.pack(">BBB", 3 if member > 0 else 0, member, 4)
    sec4 = section(4, body4)
    sec5 = section(5, struct.pack(">IH", int(present.sum()), 0)
                   + struct.pack(">f", R) + s16(E) + s16(D)
                   + struct.pack(">BB", NBITS, 0))
    if missing_mask is None:
        sec6 = section(6, struct.pack(">B", 255))
    else:
        bits = pack_bits(present.astype(int), 1)
        sec6 = section(6, struct.pack(">B", 0) + bits)
    sec7 = section(7, pack_bits(X, NBITS))
    body = sec1 + sec3 + sec4 + sec5 + sec6 + sec7
    total = 16 + len(body) + 4
    return (b"GRIB" + struct.pack(">HBB", 0, 1, 2)  # reserved, discipline 1 (hydro), ed. 2
            + struct.pack(">Q", total) + body + b"7777")


def field_for(member, step):
    m = 0 if member is None else member
    idx = np.arange(NI * NJ, dtype=np.float64).reshape(NJ, NI)
    return 5.0 + 0.4 * idx + 7.0 * m + 1.3 * (step // 24)


msgs, rows = [], []
lats = [(LAT_FIRST - j * DINC) / 1e6 for j in range(NJ)]
lons = [(LON_FIRST + i * DINC) / 1e6 for i in range(NI)]
specs = [(None, 24, False), (1, 24, False), (2, 24, True), (3, 24, False),
         (1, 48, False), (2, 48, False), (3, 48, False)]
for member, step, with_bitmap in specs:
    f = field_for(member, step)
    mask = None
    if with_bitmap:
        mask = np.zeros((NJ, NI), bool)
        mask[0, 0] = mask[3, 5] = mask[5, 7] = True
    msgs.append(message(member, step, f, mask))
    # expected decoded values: re-derive through the packing round trip
    D, E = 1, -1
    scaled = np.round(f * 10.0 ** D / 2.0 ** E)
    present = np.ones(NJ * NI, bool) if mask is None else ~mask.reshape(-1)
    vals = scaled.reshape(-1)[present]
    R = float(np.float32(vals.min() * 2.0 ** E))
    X = np.round(vals - R / 2.0 ** E)
    decoded = (np.float64(np.float32(R)) + X * 2.0 ** E) / 10.0 ** D
    it = iter(decoded)
    for j in range(NJ):
        for i in range(NI):
            p = present[j * NI + i]
            rows.append((lats[j], lons[i],
                         None if member is None else member, step,
                         REF_EPOCH, next(it) if p else None))

with open("data/grib/forecast.grib2", "wb") as fh:
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
pq.write_table(table, "data/grib/forecast_expected.parquet")
print(f"wrote {len(msgs)} GRIB2 messages ({sum(len(m) for m in msgs)} bytes), "
      f"expected parquet ({table.num_rows} rows)")
