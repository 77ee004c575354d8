#!/usr/bin/env python3
"""Seeded randomized GRIB2 simple-packing files for differential fuzzing
of the Scala reader (GribFuzzSpec drives this).

Same from-spec byte construction as make_grib_fixture.py (WMO FM 92 via
struct.pack, independent of the reader under test), with every message
parameter randomized from the seed: grid dims (incl. 1-wide), scan
direction (+j/-j), simple-packing bit width 0-20 (0 = constant field),
binary scale E in [-3, 0] (D = 0 so values are exact dyadics and
`round(value * 8)` is engine-exact), optional bitmap, deterministic
(4.0) vs ensemble (4.1) product templates, varied steps. ~1 in 4
messages uses DRS 5.4 (raw IEEE f32/f64 samples, round 20) on the same
dyadic values instead of simple packing.

Per message the generator prints:
  EXPECT <number|-> <step> <n_present> <sum of round(value*8) over present>

Usage: python3 tools/make_grib_fuzz.py <out.grib2> <seed>
"""
import calendar
import struct
import sys

import numpy as np

REF = (2024, 3, 5, 12, 0, 0)
REF_EPOCH = calendar.timegm(REF + (0, 0))


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


def message(rng, ni, nj, member, step, nbits, E, j_asc, with_bitmap, ieee=0):
    npts = ni * nj
    dinc = 50000
    lat_first = int(rng.integers(-800, 800)) * 10000
    lon_first = int(rng.integers(-1700, 1700)) * 10000
    present = np.ones(npts, bool)
    if with_bitmap:
        present = rng.random(npts) >= 0.25
        if not present.any():
            present[0] = True
    # field on the 2^E grid so (R + X*2^E) is exact (and, for the IEEE
    # template, exactly f32-representable dyadics)
    X = rng.integers(0, (1 << nbits) if nbits else 1, int(present.sum()))
    rmin = 0 if ieee else int(rng.integers(-500, 500))
    R = float(np.float32(rmin * 2.0 ** E))
    vals = (np.float64(np.float32(R)) + X.astype(np.float64) * 2.0 ** E)

    sec1 = section(1, struct.pack(">HHBBB", 98, 0, 2, 1, 1)
                   + struct.pack(">H", REF[0]) + struct.pack(">BBBBB", *REF[1:])
                   + struct.pack(">BB", 0, 1))
    # scanning mode: bit 0x40 set = +j (lat ascending)
    scan = 0x40 if j_asc else 0x00
    lat_last = lat_first + (nj - 1) * dinc * (1 if j_asc else -1)
    sec3 = section(3,
        struct.pack(">B", 0) + struct.pack(">I", npts)
        + struct.pack(">BB", 0, 0) + struct.pack(">H", 0)
        + struct.pack(">BBIBIBI", 6, 0, 0, 0, 0, 0, 0)
        + struct.pack(">II", ni, nj) + struct.pack(">II", 0, 0)
        + s32(lat_first) + s32(lon_first)
        + struct.pack(">B", 0x30)
        + s32(lat_last) + s32(lon_first + (ni - 1) * dinc)
        + struct.pack(">II", dinc, dinc)
        + struct.pack(">B", scan))
    body4 = (struct.pack(">H", 0)
             + struct.pack(">H", 1 if member is not None else 0)
             + struct.pack(">BB", 0, 197) + struct.pack(">B", 2)
             + struct.pack(">BB", 255, 255) + struct.pack(">HB", 0, 0)
             + struct.pack(">B", 1) + struct.pack(">i", step)
             + struct.pack(">BBi", 1, 0, 0) + struct.pack(">BBi", 255, 0, 0))
    if member is not None:
        body4 += struct.pack(">BBB", 3 if member > 0 else 0, member, 4)
    sec4 = section(4, body4)
    if ieee:  # DRS 5.4: 12-octet section 5, raw IEEE samples in section 7
        sec5 = section(5, struct.pack(">IH", int(present.sum()), 4)
                       + struct.pack(">B", ieee))
        sec7 = section(7, vals.astype(">f4" if ieee == 1 else ">f8").tobytes())
    else:
        sec5 = section(5, struct.pack(">IH", int(present.sum()), 0)
                       + struct.pack(">f", R) + s16(E) + s16(0)
                       + struct.pack(">BB", nbits, 0))
        sec7 = section(7, pack_bits(X, nbits) if nbits else b"")
    if with_bitmap:
        sec6 = section(6, struct.pack(">B", 0) + pack_bits(present.astype(int), 1))
    else:
        sec6 = section(6, struct.pack(">B", 255))
    body = sec1 + sec3 + sec4 + sec5 + sec6 + sec7
    total = 16 + len(body) + 4
    msg = (b"GRIB" + struct.pack(">HBB", 0, 1, 2)
           + struct.pack(">Q", total) + body + b"7777")
    chk = int(np.round(vals * 8).astype(np.int64).sum())
    return msg, int(present.sum()), chk


def main():
    out, seed = sys.argv[1], int(sys.argv[2])
    rng = np.random.default_rng(seed)
    nmsg = int(rng.integers(3, 9))
    with open(out, "wb") as fh:
        for k in range(nmsg):
            ni = int(rng.integers(1, 41))
            nj = int(rng.integers(1, 41))
            member = None if rng.integers(0, 3) == 0 else int(rng.integers(0, 10))
            step = (k + 1) * 24  # unique per message: the EXPECT key
            nbits = int(rng.integers(0, 21))
            E = int(rng.integers(-3, 1))
            j_asc = bool(rng.integers(0, 2))
            with_bitmap = bool(rng.integers(0, 3) == 0)
            # ~1 in 4 messages rides DRS 5.4 (raw IEEE f32/f64) instead
            # of simple packing, on the same dyadic values
            ieee = int(rng.choice([0, 0, 0, 1, 2]))
            msg, n_present, chk = message(
                rng, ni, nj, member, step, nbits, E, j_asc, with_bitmap, ieee)
            fh.write(msg)
            print(f"EXPECT {'-' if member is None else member} {step} "
                  f"{n_present} {chk}")
    print(f"WROTE {out} {nmsg} messages")


if __name__ == "__main__":
    main()
