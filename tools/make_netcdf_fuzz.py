#!/usr/bin/env python3
"""Seeded randomized NetCDF classic files for differential fuzzing of the
Scala reader (NetcdfFuzzSpec drives this).

Same from-spec byte construction as make_netcdf_fixture.py (struct.pack
per the Unidata classic-format spec, independent of the reader under
test), but every structural parameter randomizes from the seed: CDF-1 vs
CDF-2, grid dims, coordinate direction, 1-4 data variables over random
numeric types (f4/f8/i4/i2), optional _FillValue with a random fill
mask, and extra global/variable attributes of random padded lengths.
Values land on the 1/8 grid so `round(value * 1000)` is engine-exact.

For each variable the generator prints one expectation line:
  EXPECT <var> <non_fill_count> <sum of round(value*1000) over non-fill>

Usage: python3 tools/make_netcdf_fuzz.py <out.nc> <seed>
"""
import struct
import sys

import numpy as np

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
NC_DIMENSION, NC_VARIABLE, NC_ATTRIBUTE = 10, 11, 12


def pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def name(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">i", len(b)) + pad4(b)


def att_char(n: str, s: str) -> bytes:
    b = s.encode()
    return name(n) + struct.pack(">ii", NC_CHAR, len(b)) + pad4(b)


def att_typed(n: str, nc_type: int, raw: bytes) -> bytes:
    return name(n) + struct.pack(">ii", nc_type, 1) + pad4(raw)


def att_list(atts: list) -> bytes:
    if not atts:
        return struct.pack(">ii", 0, 0)
    return struct.pack(">ii", NC_ATTRIBUTE, len(atts)) + b"".join(atts)


TYPES = {  # nc_type -> (numpy dtype BE, size, pack fmt)
    NC_SHORT: (">i2", 2, ">h"),
    NC_INT: (">i4", 4, ">i"),
    NC_FLOAT: (">f4", 4, ">f"),
    NC_DOUBLE: (">f8", 8, ">d"),
}


def main():
    out, seed = sys.argv[1], int(sys.argv[2])
    rng = np.random.default_rng(seed)
    cdf2 = bool(rng.integers(0, 2))
    nlat = int(rng.integers(1, 24))
    nlon = int(rng.integers(1, 24))
    lat_desc = bool(rng.integers(0, 2))
    nvars = int(rng.integers(1, 5))

    lat0 = float(rng.integers(-60, 60))
    lon0 = float(rng.integers(-170, 170))
    step = 0.25
    lat = np.array([lat0 + (-i if lat_desc else i) * step for i in range(nlat)])
    lon = np.array([lon0 + j * step for j in range(nlon)])

    data_vars = []
    for v in range(nvars):
        nc_type = int(rng.choice([NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE]))
        # eighth-grid values: ints for integer types
        if nc_type in (NC_SHORT, NC_INT):
            vals = rng.integers(-1000, 1000, (nlat, nlon)).astype(np.float64)
        else:
            vals = rng.integers(-8000, 8000, (nlat, nlon)).astype(np.float64) / 8.0
        has_fill = bool(rng.integers(0, 2))
        fill_mask = (rng.random((nlat, nlon)) < 0.2) if has_fill else \
            np.zeros((nlat, nlon), bool)
        fill_raw = {NC_SHORT: -32767.0, NC_INT: -2147483647.0,
                    NC_FLOAT: -9999.0, NC_DOUBLE: -9999.0}[nc_type]
        data_vars.append((f"var{v}", nc_type, vals, has_fill, fill_mask, fill_raw))

    # ---- header
    version = 2 if cdf2 else 1
    magic = b"CDF" + bytes([version])
    header = magic + struct.pack(">i", 0)  # numrecs = 0
    header += struct.pack(">ii", NC_DIMENSION, 2)
    header += name("lat") + struct.pack(">i", nlat)
    header += name("lon") + struct.pack(">i", nlon)
    header += att_list([att_char("title", f"fuzz seed {seed}"),
                        att_char("history", "x" * int(rng.integers(1, 40)))])

    def begin(v: int) -> bytes:
        return struct.pack(">q", v) if cdf2 else struct.pack(">i", v)

    def var_header(n, dimids, atts, nc_type, vsize, beg):
        return (name(n) + struct.pack(">i", len(dimids))
                + b"".join(struct.pack(">i", d) for d in dimids)
                + att_list(atts)
                + struct.pack(">ii", nc_type, vsize) + begin(beg))

    grid = nlat * nlon
    entries = [("lat", [0], [], NC_DOUBLE, pad4_len(nlat * 8)),
               ("lon", [1], [], NC_DOUBLE, pad4_len(nlon * 8))]
    for (vn, nc_type, _, has_fill, _, fill_raw) in data_vars:
        size = TYPES[nc_type][1]
        atts = []
        if has_fill:
            atts.append(att_typed("_FillValue", nc_type,
                                  struct.pack(TYPES[nc_type][2],
                                              int(fill_raw) if nc_type in (NC_SHORT, NC_INT)
                                              else fill_raw)))
        if rng.integers(0, 2):
            atts.append(att_char("units", "m" * int(rng.integers(1, 9))))
        entries.append((vn, [0, 1], atts, nc_type, pad4_len(grid * size)))

    # two passes: measure header with dummy begins, then rewrite
    def build(begins):
        h = header + struct.pack(">ii", NC_VARIABLE, len(entries))
        for (e, b) in zip(entries, begins):
            vn, dimids, atts, nc_type, vsize = e
            h += var_header(vn, dimids, atts, nc_type, vsize, b)
        return h

    dummy = build([0] * len(entries))
    begins = []
    at = len(dummy)
    for (_, _, _, _, vsize) in entries:
        begins.append(at)
        at += vsize

    body = bytearray()
    body += pad4(lat.astype(">f8").tobytes())
    body += pad4(lon.astype(">f8").tobytes())
    for (vn, nc_type, vals, has_fill, fill_mask, fill_raw) in data_vars:
        stored = vals.copy()
        stored[fill_mask] = fill_raw
        body += pad4(stored.astype(TYPES[nc_type][0]).tobytes())
        keep = vals[~fill_mask]
        print(f"EXPECT {vn} {keep.size} "
              f"{int(np.round(keep * 1000).astype(np.int64).sum())}")

    with open(out, "wb") as fh:
        fh.write(build(begins) + bytes(body))
    print(f"WROTE {out} cdf{version} {nlat}x{nlon} vars={nvars}")


def pad4_len(n: int) -> int:
    return n + (-n % 4)


if __name__ == "__main__":
    main()
