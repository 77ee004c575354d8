#!/usr/bin/env python3
"""Generate the NetCDF classic (CDF-1) test fixture + its flattened parquet
mirror, both committed under data/netcdf/.

The .nc bytes are written directly from the public NetCDF classic format
spec (Unidata, "The NetCDF Classic Format Specification") with struct.pack
— deliberately NOT via a netcdf library and NOT via the Scala reader under
test, so the fixture is an independent implementation of the format. The
parquet mirror is the reference's raster→table flattening
(to_dataframe().reset_index(): long-form rows over the lat×lon cross
product) and serves as the DuckDB oracle for q_netcdf_raster.

Layout (GloFAS-threshold-shaped, flood/etl/utils.py:8-14):
  dims:  lat=6 (descending, GloFAS-style), lon=8 (ascending)
  vars:  lat(lat) f8, lon(lon) f8          — coordinate variables
         threshold_2y(lat,lon)  f4, _FillValue=-9999.0 (some cells filled)
         threshold_5y(lat,lon)  f8
         threshold_20y(lat,lon) f8          — the full GloFAS raster trio
         upstream_area(lat,lon) i4          — no fills (keeps pandas int32)
  global attr: title (char)

Run once, commit outputs:
  python3 tools/make_netcdf_fixture.py
"""
import struct

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
NC_DIMENSION, NC_VARIABLE, NC_ATTRIBUTE = 10, 11, 12

NLAT, NLON = 6, 8
lat = np.array([17.975 - i * 0.05 for i in range(NLAT)], dtype=np.float64)
lon = np.array([-17.975 + j * 0.05 for j in range(NLON)], dtype=np.float64)

idx = np.arange(NLAT * NLON).reshape(NLAT, NLON)
t2 = (idx * np.float32(0.37) + np.float32(1.5)).astype(np.float32)
fill_mask = (idx % 11) == 0
t2[fill_mask] = np.float32(-9999.0)
t5 = idx * 1.75 + 0.125  # float64
t20 = idx * 2.5 + 9.25  # float64
ua = (idx * 1000 + 7).astype(np.int32)


def pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def name(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">i", len(b)) + pad4(b)


def att_char(n: str, s: str) -> bytes:
    b = s.encode()
    return name(n) + struct.pack(">ii", NC_CHAR, len(b)) + pad4(b)


def att_float(n: str, v: float) -> bytes:
    return name(n) + struct.pack(">ii", NC_FLOAT, 1) + pad4(struct.pack(">f", v))


def att_list(atts: list) -> bytes:
    if not atts:
        return struct.pack(">ii", 0, 0)  # ABSENT
    return struct.pack(">ii", NC_ATTRIBUTE, len(atts)) + b"".join(atts)


def var_header(n: str, dimids: list, atts: list, nc_type: int, vsize: int, begin: int) -> bytes:
    return (name(n) + struct.pack(">i", len(dimids))
            + b"".join(struct.pack(">i", d) for d in dimids)
            + att_list(atts)
            + struct.pack(">iii", nc_type, vsize, begin))  # CDF-1: 4-byte begin


# variable order in file: lat, lon, thresholds, upstream_area
vsizes = [NLAT * 8, NLON * 8, NLAT * NLON * 4, NLAT * NLON * 8,
          NLAT * NLON * 8, NLAT * NLON * 4]
specs = [
    ("lat", [0], [att_char("units", "degrees_north")], NC_DOUBLE),
    ("lon", [1], [att_char("units", "degrees_east")], NC_DOUBLE),
    ("threshold_2y", [0, 1], [att_float("_FillValue", -9999.0)], NC_FLOAT),
    ("threshold_5y", [0, 1], [], NC_DOUBLE),
    ("threshold_20y", [0, 1], [], NC_DOUBLE),
    ("upstream_area", [0, 1], [], NC_INT),
]

# Two-pass: header size depends only on fixed-length fields above.
def build(begins):
    h = b"CDF\x01" + struct.pack(">i", 0)  # magic, numrecs
    h += struct.pack(">ii", NC_DIMENSION, 2)
    h += name("lat") + struct.pack(">i", NLAT)
    h += name("lon") + struct.pack(">i", NLON)
    h += att_list([att_char("title", "graft netcdf fixture")])
    h += struct.pack(">ii", NC_VARIABLE, len(specs))
    for (n, dimids, atts, t), vs, bg in zip(specs, vsizes, begins):
        h += var_header(n, dimids, atts, t, vs, bg)
    return h


hdr_len = len(build([0] * len(specs)))
begins, off = [], hdr_len
for vs in vsizes:
    begins.append(off)
    off += vs  # all vsizes already multiples of 4 → no inter-var padding
header = build(begins)
assert len(header) == hdr_len

data = (lat.astype(">f8").tobytes() + lon.astype(">f8").tobytes()
        + t2.astype(">f4").tobytes() + t5.astype(">f8").tobytes()
        + t20.astype(">f8").tobytes() + ua.astype(">i4").tobytes())

with open("data/netcdf/thresholds.nc", "wb") as f:
    f.write(header + data)

# Flattened long-form mirror: fill → null, row-major (lat outer, lon inner).
lat_col = np.repeat(lat, NLON)
lon_col = np.tile(lon, NLAT)
t2_flat = t2.reshape(-1)
table = pa.table({
    "lat": pa.array(lat_col, pa.float64()),
    "lon": pa.array(lon_col, pa.float64()),
    "threshold_2y": pa.array(t2_flat, pa.float32(), mask=fill_mask.reshape(-1)),
    "threshold_5y": pa.array(t5.reshape(-1), pa.float64()),
    "threshold_20y": pa.array(t20.reshape(-1), pa.float64()),
    "upstream_area": pa.array(ua.reshape(-1), pa.int32()),
})
pq.write_table(table, "data/netcdf/thresholds_expected.parquet")
print(f"wrote thresholds.nc ({hdr_len} header + {len(data)} data bytes), "
      f"expected parquet ({table.num_rows} rows)")
