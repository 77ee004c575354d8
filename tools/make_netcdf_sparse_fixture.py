#!/usr/bin/env python3
"""Parquet mirror (committed) for the sparse CDF-2 >2 GiB-offset fixture.

The .nc itself is NOT committed: its begin offsets sit past 2^31, so the
file is ~3 GB *logical* (a few hundred KB on disk as a sparse file) — git
would materialize the holes on every checkout. Instead the Scala dev util
`graft.sources.SparseCdf2Fixture.ensure()` writes the byte-identical file
on demand (seek+write, instant), and THIS script independently computes
the expected flattened rows that DuckDB replays as the oracle. The layout
constants here and in SparseCdf2Fixture.scala are the contract — change
both together.

What the fixture proves: CDF-2's 8-byte `begin` offsets are read as
longs, and the executor-side ranged reads (`begin + outerIdx * stride`)
stay in 64-bit arithmetic — an int overflow anywhere shows up as a hash
mismatch against this mirror, at gate time, on every round.

Layout:
  magic CDF\\x02; dims lat=100 (descending), lon=200 (ascending)
  lat(lat) f8, lon(lon) f8                       — begin right after header
  discharge(lat,lon) f4, _FillValue=-9999.0      — begin 2,500,000,000
  uparea(lat,lon) i4                             — begin 3,000,000,000

Run once, commit output:
  python3 tools/make_netcdf_sparse_fixture.py
"""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

NLAT, NLON = 100, 200
lat = np.array([17.975 - i * 0.05 for i in range(NLAT)], dtype=np.float64)
lon = np.array([-17.975 + j * 0.05 for j in range(NLON)], dtype=np.float64)

idx = np.arange(NLAT * NLON).reshape(NLAT, NLON)
discharge = (idx * np.float32(0.37) + np.float32(1.5)).astype(np.float32)
fill_mask = (idx % 97) == 0
discharge[fill_mask] = np.float32(-9999.0)
uparea = (idx * 1000 + 7).astype(np.int32)

table = pa.table({
    "lat": pa.array(np.repeat(lat, NLON), pa.float64()),
    "lon": pa.array(np.tile(lon, NLAT), pa.float64()),
    "discharge": pa.array(discharge.reshape(-1), pa.float32(),
                          mask=fill_mask.reshape(-1)),
    "uparea": pa.array(uparea.reshape(-1), pa.int32()),
})
pq.write_table(table, "data/netcdf/sparse2g_expected.parquet")
print(f"wrote expected parquet ({table.num_rows} rows)")
