#!/usr/bin/env python3
"""libhdf5_cross_*.nc — OPTIONAL differential fixtures written by REAL
libhdf5 (via h5py), cross-read by the Scala NetCDF-4 source.

Every committed NetCDF-4 fixture in this repo is written by an
independent from-spec Python writer (no HDF5 library exists in the
build container), so a shared misreading of the H5EA/H5B2/H5FA spec by
both sides would slip through the differential mirror. This script
closes that hole WHEN an h5py/libhdf5 install is available (a dev
machine, a richer CI image): with `libver='latest'` libhdf5 itself
picks the new chunk indexes — extensible array for one unlimited dim,
v2 B-tree for two, fixed array for bounded chunked datasets — and
`Netcdf4LibCrossSpec` reads each file through the production source
and re-derives every cell from the deterministic pattern below.

One file per variable (the table model flattens one dim tuple per
file); every dim carries a real dimension scale (h5py attach_scale
writes the same DIMENSION_LIST/REFERENCE_LIST/CLASS/NAME attribute
wiring netCDF-4 does), with coordinates = 10 * index so coordinate
resolution through a libhdf5-written global heap is also crossed.

    libhdf5_cross_ea.nc:  v_ea[t, y]    = t * 1000 + y           f4, 30x11,
                          t unlimited, chunks (4,4)  -> EXTENSIBLE ARRAY
    libhdf5_cross_bt2.nc: v_bt2[t, y]   = t * 37 - y * 5         i4, 12x7,
                          both unlimited, chunks (3,2) -> V2 B-TREE
    libhdf5_cross_fa.nc:  v_fixed[t, y] = (t * 13 + y * 7) % 100 f8, 10x6,
                          bounded, chunks (3,3)       -> FIXED ARRAY

Exit codes: 0 = written; 2 = h5py not installed (callers treat as
"skip", keeping the differential CI-optional).

Usage: python3 tools/make_libhdf5_fixture.py [outdir]
       default outdir: data/netcdf (files NOT committed; regenerate
       wherever h5py exists, or point GRAFT_LIBHDF5_DIR at them)
"""
import os
import sys

try:
    import h5py
    import numpy as np
except ImportError:
    print("h5py/numpy not installed - skipping libhdf5 cross fixtures",
          file=sys.stderr)
    sys.exit(2)

outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(__file__), "..", "data", "netcdf")


def write(name, var, shape, maxshape, chunks, dtype, fn):
    path = os.path.join(outdir, name)
    with h5py.File(path, "w", libver="latest") as f:
        ds = f.create_dataset(var, shape=tuple(0 if m is None else s
                                               for s, m in zip(shape, maxshape)),
                              maxshape=maxshape, chunks=chunks, dtype=dtype)
        ds.resize(shape)
        ds[...] = np.fromfunction(fn, shape)
        for axis, (dim, size) in enumerate(zip(("t", "y"), shape)):
            unlimited = maxshape[axis] is None
            scale = f.create_dataset(
                dim, shape=(0,) if unlimited else (size,),
                maxshape=(None,) if unlimited else (size,),
                chunks=(4,) if unlimited else None, dtype="f8")
            if unlimited:
                scale.resize((size,))
            scale[...] = np.arange(size) * 10.0
            scale.make_scale(dim)
            ds.dims[axis].attach_scale(scale)
    print(f"wrote {path}")


write("libhdf5_cross_ea.nc", "v_ea", (30, 11), (None, 11), (4, 4), "f4",
      lambda t, y: t * 1000 + y)
write("libhdf5_cross_bt2.nc", "v_bt2", (12, 7), (None, None), (3, 2), "i4",
      lambda t, y: t * 37 - y * 5)
write("libhdf5_cross_fa.nc", "v_fixed", (10, 6), (10, 6), (3, 3), "f8",
      lambda t, y: (t * 13 + y * 7) % 100)
