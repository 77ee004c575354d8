#!/usr/bin/env python3
"""Generate a FULL-SIZE synthetic GloFAS day for scale measurement (dev
tool — output goes to /tmp, nothing is committed).

Shape matches the reference's operational day (databricks/config.json +
BASELINE.md): 30 GRIB2 files (one per leadtime, 24 h..720 h), each holding
51 ensemble members (template 4.1, member 0 = control) on a 460 x 1400
regular lat/lon grid at 0.05 deg -> 644,000 cells/message, 1530 messages,
~985 M cells/day. Byte layout is the same from-spec GRIB2 writing as
tools/make_grib_fixture.py (sections 0-8, grid template 3.0, product
template 4.1, simple packing 5.0) but vectorized with numpy: NBITS=16 so
the packed payload IS the big-endian uint16 array (no bit-level Python
loop over 10^9 values).

Values are seeded per (member, step) and span 0..655.35 (R=0, E=0, D=2,
Y = X/100) — plausible discharge magnitudes so threshold joins downstream
have realistic selectivity.

  python3 tools/make_glofas_day.py [outdir] [ni] [nj] [days]
  # defaults: /tmp/glofas_day 1400 460 1  (one full-size operational day)
  # days > 1 emits a multi-day backfill drop (one ref_time per day,
  # 30 files/day in the same directory) for streaming soak runs —
  # shrink ni/nj to keep a week tractable on a dev box
"""
import os
import struct
import sys

import numpy as np

NI, NJ = 1400, 460  # lons, lats -> 644,000 cells
LAT_FIRST, LON_FIRST = 17975000, -17975000  # micro-degrees, lat descending
DINC = 50000  # 0.05 degrees
REF = (2023, 10, 1, 0, 0, 0)
MEMBERS = 51  # 0 = control, 1..50 perturbed
STEPS = [24 * d for d in range(1, 31)]  # 30 leadtimes
D, E, NBITS = 2, 0, 16  # Y = X / 100


def s32(v: int) -> bytes:
    return struct.pack(">I", (0x80000000 | -v) if v < 0 else v)


def section(num: int, body: bytes) -> bytes:
    return struct.pack(">IB", 5 + len(body), num) + body


def message(member: int, step_hours: int, x: np.ndarray, ref=REF) -> bytes:
    npts = NI * NJ
    sec1 = section(1, struct.pack(">HHBBB", 98, 0, 2, 1, 1)
                   + struct.pack(">H", ref[0]) + struct.pack(">BBBBB", *ref[1:])
                   + struct.pack(">BB", 0, 1))
    sec3 = section(3,
        struct.pack(">B", 0)
        + struct.pack(">I", npts)
        + struct.pack(">BB", 0, 0)
        + struct.pack(">H", 0)  # template 3.0
        + struct.pack(">BBIBIBI", 6, 0, 0, 0, 0, 0, 0)
        + struct.pack(">II", NI, NJ)
        + struct.pack(">II", 0, 0)
        + s32(LAT_FIRST) + s32(LON_FIRST)
        + struct.pack(">B", 0x30)
        + s32(LAT_FIRST - (NJ - 1) * DINC) + s32(LON_FIRST + (NI - 1) * DINC)
        + struct.pack(">II", DINC, DINC)
        + struct.pack(">B", 0))  # +i (lon asc), -j (lat desc)
    body4 = (struct.pack(">H", 0)
             + struct.pack(">H", 1)  # template 4.1 (ensemble)
             + struct.pack(">BB", 0, 197)
             + struct.pack(">B", 2)
             + struct.pack(">BB", 255, 255)
             + struct.pack(">HB", 0, 0)
             + struct.pack(">B", 1)  # unit: hour
             + struct.pack(">i", step_hours)
             + struct.pack(">BBi", 1, 0, 0)
             + struct.pack(">BBi", 255, 0, 0)
             + struct.pack(">BBB", 3 if member > 0 else 0, member, MEMBERS))
    sec4 = section(4, body4)
    sec5 = section(5, struct.pack(">IH", npts, 0)
                   + struct.pack(">f", 0.0)  # R = 0
                   + struct.pack(">HH", E, D)  # E,D >= 0: plain uint16
                   + struct.pack(">BB", NBITS, 0))
    sec6 = section(6, struct.pack(">B", 255))  # no bitmap
    sec7 = section(7, x.astype(">u2").tobytes())  # NBITS=16: payload = BE uint16
    body = sec1 + sec3 + sec4 + sec5 + sec6 + sec7
    total = 16 + len(body) + 4
    return (b"GRIB" + struct.pack(">HBB", 0, 1, 2)
            + struct.pack(">Q", total) + body + b"7777")


def main() -> None:
    global NI, NJ
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/glofas_day"
    if len(sys.argv) > 2:
        NI = int(sys.argv[2])
    if len(sys.argv) > 3:
        NJ = int(sys.argv[3])
    days = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    os.makedirs(outdir, exist_ok=True)
    total_bytes = 0
    nfiles = 0
    for day in range(days):
        ref = (REF[0], REF[1], REF[2] + day) + REF[3:]
        for step in STEPS:
            parts = []
            for member in range(MEMBERS):
                rng = np.random.default_rng((day * 31 + step) * 1000 + member)
                x = rng.integers(0, 2 ** NBITS, NI * NJ, dtype=np.uint32)
                parts.append(message(member, step, x, ref))
            name = (f"glofas_lt{step:03d}.grib2" if days == 1
                    else f"glofas_d{day:02d}_lt{step:03d}.grib2")
            with open(os.path.join(outdir, name), "wb") as fh:
                fh.write(b"".join(parts))
            nfiles += 1
            total_bytes += sum(len(p) for p in parts)
    cells = days * len(STEPS) * MEMBERS * NI * NJ
    print(f"wrote {nfiles} files, {nfiles * MEMBERS} messages, "
          f"{cells:,} cells, {total_bytes / 1e9:.2f} GB -> {outdir}")


if __name__ == "__main__":
    main()
