#!/usr/bin/env python3
"""Generate the record-dimension (unlimited) NetCDF fixture + parquet
mirror, committed under data/netcdf/.

Same independent from-spec byte writing as make_netcdf_fixture.py, but the
outermost dimension is the RECORD dimension (length 0 in the header,
numrecs in the magic block) — the most common real-world NetCDF shape
(time-series rasters; flood/etl/utils.py opens arbitrary NetCDF). Record
variables interleave per record: record r of variable v lives at
begin_v + r * recsize, where recsize is the sum of every record variable's
padded record slab. This fixture has TWO record variables (so recsize !=
either slab and the interleaving is non-trivial) plus a record coordinate
variable time(time), plus a FIXED variable on (lat, lon) to prove the two
layouts coexist.

Layout:
  dims:  time=UNLIMITED (4 records written), lat=6 (descending), lon=8
  vars:  time(time) f8                        — record coordinate var
         lat(lat) f8, lon(lon) f8             — fixed coordinate vars
         static_mask(lat,lon) i4              — fixed data var
         discharge(time,lat,lon) f4, _FillValue=-9999.0 (some cells)
         temp(time,lat,lon) f8                — second record var

Run once, commit outputs:
  python3 tools/make_netcdf_record_fixture.py
"""
import struct

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

NC_CHAR, NC_INT, NC_FLOAT, NC_DOUBLE = 2, 4, 5, 6
NC_DIMENSION, NC_VARIABLE, NC_ATTRIBUTE = 10, 11, 12

NRECS, NLAT, NLON = 4, 6, 8
time_vals = np.array([86400.0 * (d + 1) for d in range(NRECS)], dtype=np.float64)
lat = np.array([17.975 - i * 0.05 for i in range(NLAT)], dtype=np.float64)
lon = np.array([-17.975 + j * 0.05 for j in range(NLON)], dtype=np.float64)

idx3 = np.arange(NRECS * NLAT * NLON).reshape(NRECS, NLAT, NLON)
discharge = (idx3 * np.float32(0.37) + np.float32(1.5)).astype(np.float32)
fill_mask = (idx3 % 13) == 0
discharge[fill_mask] = np.float32(-9999.0)
temp = idx3 * 0.125 + 270.0  # float64
idx2 = np.arange(NLAT * NLON).reshape(NLAT, NLON)
static_mask = (idx2 % 3).astype(np.int32)


def pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def name(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">i", len(b)) + pad4(b)


def att_float(n: str, v: float) -> bytes:
    return name(n) + struct.pack(">ii", NC_FLOAT, 1) + pad4(struct.pack(">f", v))


def att_list(atts: list) -> bytes:
    if not atts:
        return struct.pack(">ii", 0, 0)
    return struct.pack(">ii", NC_ATTRIBUTE, len(atts)) + b"".join(atts)


def var_header(n, dimids, atts, nc_type, vsize, begin):
    return (name(n) + struct.pack(">i", len(dimids))
            + b"".join(struct.pack(">i", d) for d in dimids)
            + att_list(atts)
            + struct.pack(">iii", nc_type, vsize, begin))  # CDF-1: 4-byte begin


# dims: 0=time (record, length 0), 1=lat, 2=lon
# vsize per spec: slab size padded to 4 (record vars: one record's slab)
vsizes = [8, NLAT * 8, NLON * 8, NLAT * NLON * 4,  # time, lat, lon, static_mask
          NLAT * NLON * 4, NLAT * NLON * 8]        # discharge, temp (per record)
specs = [
    ("time", [0], [], NC_DOUBLE),
    ("lat", [1], [], NC_DOUBLE),
    ("lon", [2], [], NC_DOUBLE),
    ("static_mask", [1, 2], [], NC_INT),
    ("discharge", [0, 1, 2], [att_float("_FillValue", -9999.0)], NC_FLOAT),
    ("temp", [0, 1, 2], [], NC_DOUBLE),
]


def build(begins):
    h = b"CDF\x01" + struct.pack(">i", NRECS)  # magic, numrecs
    h += struct.pack(">ii", NC_DIMENSION, 3)
    h += name("time") + struct.pack(">i", 0)  # record dim: length 0
    h += name("lat") + struct.pack(">i", NLAT)
    h += name("lon") + struct.pack(">i", NLON)
    h += att_list([])
    h += struct.pack(">ii", NC_VARIABLE, len(specs))
    for (n, dimids, atts, t), vs, bg in zip(specs, vsizes, begins):
        h += var_header(n, dimids, atts, t, vs, bg)
    return h


hdr_len = len(build([0] * len(specs)))
# fixed vars first (lat, lon, static_mask), then the record section:
# time | discharge | temp interleaved per record
begins, off = [0] * len(specs), hdr_len
for i in (1, 2, 3):  # lat, lon, static_mask
    begins[i] = off
    off += vsizes[i]
rec_start = off
begins[0] = rec_start                 # time slab first in each record
begins[4] = rec_start + 8             # then discharge
begins[5] = rec_start + 8 + NLAT * NLON * 4  # then temp
recsize = 8 + NLAT * NLON * 4 + NLAT * NLON * 8  # all slabs already 4-aligned
header = build(begins)
assert len(header) == hdr_len

body = (lat.astype(">f8").tobytes() + lon.astype(">f8").tobytes()
        + static_mask.astype(">i4").tobytes())
records = b"".join(
    struct.pack(">d", time_vals[r])
    + discharge[r].astype(">f4").tobytes()
    + temp[r].astype(">f8").tobytes()
    for r in range(NRECS))
assert len(records) == NRECS * recsize

with open("data/netcdf/timeseries.nc", "wb") as f:
    f.write(header + body + records)

# Flattened long-form mirror of the RECORD scan (time, lat, lon, discharge,
# temp) — row-major over (time, lat, lon), fill → null.
table = pa.table({
    "time": pa.array(np.repeat(time_vals, NLAT * NLON), pa.float64()),
    "lat": pa.array(np.tile(np.repeat(lat, NLON), NRECS), pa.float64()),
    "lon": pa.array(np.tile(lon, NRECS * NLAT), pa.float64()),
    "discharge": pa.array(discharge.reshape(-1), pa.float32(),
                          mask=fill_mask.reshape(-1)),
    "temp": pa.array(temp.reshape(-1), pa.float64()),
})
pq.write_table(table, "data/netcdf/timeseries_expected.parquet")
print(f"wrote timeseries.nc ({hdr_len} header + {len(body)} fixed + "
      f"{len(records)} record bytes), expected parquet ({table.num_rows} rows)")
