#!/usr/bin/env python3
"""Generate a MIXED-PACKING synthetic GloFAS day for scale measurement
(dev tool — output goes to /tmp, nothing is committed).

Same operational-day shape as tools/make_glofas_day.py (30 files x 51
members on a 460 x 1400 grid -> 985 M cells), but each member's messages
use a different data representation template — the real CDS shape, where
a day's drop mixes encodings across products and archive eras:

  member % 17 == 2            -> DRS 5.42 CCSDS/AEC   (3 members,  ~58 M cells)
  else member % 3 == 0        -> DRS 5.2/5.3 complex  (16 members, ~309 M cells)
  else                        -> DRS 5.0 simple       (32 members, ~618 M cells)

Complex messages cycle the spatial-differencing order (member+step) % 3
over {0 -> 5.2, 1, 2 -> 5.3}. Encoders are the vectorized forms of the
committed fixture generators (bit-exact same wire layouts):

  - simple: NBITS=16 -> the payload IS the big-endian uint16 array;
  - complex: uniform group width (widthBits=0), group length 64 — the
    make_grib_complex_fixture.py GC_BIG path;
  - CCSDS: ALL blocks take the uncompressed option with preprocessing
    OFF (flags without F_PP) — the legal subset whose constant per-block
    bit length (id_len + J*nbits) vectorizes to one np.packbits. The
    mixed-OPTION decode rate (zero runs, k-splits, second extension) is
    pinned separately by the CC_BIG 18 M-cell file; this day pins the
    day-scale DISPATCH and volume.

  python3 tools/make_glofas_day_mixed.py [outdir] [ni] [nj] [days]
  # defaults: /tmp/glofas_day_mixed 1400 460 1
  # days > 1 emits a multi-day mixed-encoding backfill (one ref_time per
  # day, day-stamped file names) for the StreamSoak week drill
"""
import os
import struct
import sys

import numpy as np

NI, NJ = 1400, 460
LAT_FIRST, LON_FIRST = 17975000, -17975000
DINC = 50000
REF = (2023, 10, 1, 0, 0, 0)
MEMBERS = 51
STEPS = [24 * d for d in range(1, 31)]


def s16(v: int) -> bytes:
    return struct.pack(">H", (0x8000 | -v) if v < 0 else v)


def s32(v: int) -> bytes:
    return struct.pack(">I", (0x80000000 | -v) if v < 0 else v)


def section(num: int, body: bytes) -> bytes:
    return struct.pack(">IB", 5 + len(body), num) + body


def sections_1346(member: int, step_hours: int, npts: int):
    sec1 = section(1, struct.pack(">HHBBB", 98, 0, 2, 1, 1)
                   + struct.pack(">H", REF[0]) + struct.pack(">BBBBB", *REF[1:])
                   + struct.pack(">BB", 0, 1))
    sec3 = section(3,
        struct.pack(">B", 0) + struct.pack(">I", npts) + struct.pack(">BB", 0, 0)
        + struct.pack(">H", 0)
        + struct.pack(">BBIBIBI", 6, 0, 0, 0, 0, 0, 0)
        + struct.pack(">II", NI, NJ) + struct.pack(">II", 0, 0)
        + s32(LAT_FIRST) + s32(LON_FIRST) + struct.pack(">B", 0x30)
        + s32(LAT_FIRST - (NJ - 1) * DINC) + s32(LON_FIRST + (NI - 1) * DINC)
        + struct.pack(">II", DINC, DINC) + struct.pack(">B", 0))
    sec4 = section(4, struct.pack(">H", 0) + struct.pack(">H", 1)
                   + struct.pack(">BB", 0, 197) + struct.pack(">B", 2)
                   + struct.pack(">BB", 255, 255) + struct.pack(">HB", 0, 0)
                   + struct.pack(">B", 1) + struct.pack(">i", step_hours)
                   + struct.pack(">BBi", 1, 0, 0) + struct.pack(">BBi", 255, 0, 0)
                   + struct.pack(">BBB", 3 if member > 0 else 0, member, MEMBERS))
    sec6 = section(6, struct.pack(">B", 255))
    return sec1, sec3, sec4, sec6


def grib(body: bytes) -> bytes:
    total = 16 + len(body) + 4
    return (b"GRIB" + struct.pack(">HBB", 0, 1, 2)
            + struct.pack(">Q", total) + body + b"7777")


def pack_bits_np(vals: np.ndarray, nbits: int) -> bytes:
    """Big-endian bit-pack equal-width values (vectorized)."""
    if nbits == 0:
        return b""
    bits = ((vals[:, None] >> np.arange(nbits - 1, -1, -1)) & 1).astype(np.uint8)
    return np.packbits(bits.reshape(-1)).tobytes()


def msg_simple(member, step, rng):
    npts = NI * NJ
    x = rng.integers(0, 1 << 16, npts, dtype=np.uint32)
    sec1, sec3, sec4, sec6 = sections_1346(member, step, npts)
    sec5 = section(5, struct.pack(">IH", npts, 0) + struct.pack(">f", 0.0)
                   + struct.pack(">HH", 0, 2) + struct.pack(">BB", 16, 0))
    sec7 = section(7, x.astype(">u2").tobytes())
    return grib(sec1 + sec3 + sec4 + sec5 + sec6 + sec7)


def msg_complex(member, step, order, rng):
    """The make_grib_complex_fixture GC_BIG encoding: uniform width
    (widthBits=0), fixed group length 64."""
    E, D = -1, 1
    npts = NI * NJ
    j, i = np.mgrid[0:NJ, 0:NI]
    field = (5.0 + 0.001 * i + 0.002 * j + 0.05 * np.round(
        rng.normal(40.0 * member % 7, 8.0, (NJ, NI))))
    scaled = np.round(field * 10.0 ** D / 2.0 ** E).astype(np.int64).reshape(-1)
    tmin = int(scaled.min())
    R = float(np.float32(tmin * 2.0 ** E))
    S = scaled - tmin
    extra_oct = 3
    if order == 0:
        seq, ivals = S, []
    else:
        ivals = [int(v) for v in S[:order]]
        seq = np.concatenate([np.zeros(order, np.int64), np.diff(S, n=order)])
    if order:
        dmin = int(seq[order:].min())
        h = seq.copy()
        h[order:] -= dmin
    else:
        dmin, h = 0, seq
    glen = 64
    ng = (npts + glen - 1) // glen
    pad = ng * glen - npts
    hp = np.concatenate([h, np.zeros(pad, np.int64)]).reshape(ng, glen)
    if pad:
        hp[-1, glen - pad:] = hp[-1, 0]
    refs = hp.min(axis=1)
    res = (hp - refs[:, None]).reshape(-1)
    width = int(res.max()).bit_length()
    nbits = int(refs.max()).bit_length()
    if pad:
        res = res[:npts]

    def sign_mag(v, octets):
        return (1 << (octets * 8 - 1)) | -v if v < 0 else v

    head = b"".join(struct.pack(">I", sign_mag(iv, extra_oct))[1:] for iv in ivals)
    if order:
        head += struct.pack(">I", sign_mag(dmin, extra_oct))[1:]
    sec7_body = (head + pack_bits_np(refs, nbits)
                 + bytes((ng * 6 + 7) // 8)  # scaled lengths: zeros, 6 bits
                 + pack_bits_np(res, width))
    drs_tail = (struct.pack(">BBB", nbits, 0, 1) + struct.pack(">B", 0)
                + struct.pack(">II", 0, 0) + struct.pack(">I", ng)
                + struct.pack(">BB", width, 0)  # uniform width, widthBits=0
                + struct.pack(">I", glen) + struct.pack(">B", 1)
                + struct.pack(">I", npts - (ng - 1) * glen) + struct.pack(">B", 6))
    if order:
        drs_tail += struct.pack(">BB", order, extra_oct)
    sec1, sec3, sec4, sec6 = sections_1346(member, step, npts)
    sec5 = section(5, struct.pack(">IH", npts, 3 if order else 2)
                   + struct.pack(">f", R) + s16(E) + s16(D) + drs_tail)
    sec7 = section(7, sec7_body)
    return grib(sec1 + sec3 + sec4 + sec5 + sec6 + sec7)


def msg_ccsds(member, step, rng):
    """DRS 5.42 with every block UNCOMPRESSED and preprocessing off —
    constant (id_len + J*nbits) bits per block, one np.packbits."""
    F_MSB = 4  # libaec flag values, as DRS 5.42 carries them
    nbits, J, rsi = 12, 32, 128
    id_len = 4  # nbits 9..16
    npts = NI * NJ
    x = rng.integers(0, 1 << nbits, npts, dtype=np.int64)
    n_blocks = (npts + J - 1) // J
    padded = np.concatenate([x, np.repeat(x[-1], n_blocks * J - npts)])
    # bit matrix: per block 4 id bits (all ones) + J samples x nbits
    sample_bits = ((padded[:, None] >> np.arange(nbits - 1, -1, -1)) & 1) \
        .astype(np.uint8).reshape(n_blocks, J * nbits)
    id_bits = np.ones((n_blocks, id_len), np.uint8)
    stream = np.concatenate([id_bits, sample_bits], axis=1).reshape(-1)
    sec7_body = np.packbits(stream).tobytes()
    sec1, sec3, sec4, sec6 = sections_1346(member, step, npts)
    sec5 = section(5, struct.pack(">IH", npts, 42) + struct.pack(">f", 0.0)
                   + struct.pack(">HH", 0, 2)  # E=0, D=2: Y = X/100
                   + struct.pack(">BB", nbits, 0)
                   + struct.pack(">BBH", F_MSB, J, rsi))
    sec7 = section(7, sec7_body)
    return grib(sec1 + sec3 + sec4 + sec5 + sec6 + sec7)


def kind_of(member: int) -> str:
    if member % 17 == 2:
        return "ccsds"
    if member % 3 == 0:
        return "complex"
    return "simple"


def main() -> None:
    global NI, NJ, REF
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/glofas_day_mixed"
    if len(sys.argv) > 2:
        NI = int(sys.argv[2])
    if len(sys.argv) > 3:
        NJ = int(sys.argv[3])
    days = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    os.makedirs(outdir, exist_ok=True)
    counts = {"simple": 0, "complex": 0, "ccsds": 0}
    total_bytes = 0
    nfiles = 0
    for day in range(days):
        REF = (2023, 10, 1 + day, 0, 0, 0)
        for step in STEPS:
            parts = []
            for member in range(MEMBERS):
                rng = np.random.default_rng((day * 31 + step) * 1000 + member)
                k = kind_of(member)
                counts[k] += 1
                if k == "ccsds":
                    parts.append(msg_ccsds(member, step, rng))
                elif k == "complex":
                    parts.append(msg_complex(member, step, (member + step) % 3, rng))
                else:
                    parts.append(msg_simple(member, step, rng))
            name = (f"glofas_lt{step:03d}.grib2" if days == 1
                    else f"glofas_d{day:02d}_lt{step:03d}.grib2")
            with open(os.path.join(outdir, name), "wb") as fh:
                fh.write(b"".join(parts))
            nfiles += 1
            total_bytes += sum(len(p) for p in parts)
    cells = days * len(STEPS) * MEMBERS * NI * NJ
    print(f"wrote {nfiles} files, {sum(counts.values())} messages "
          f"({counts}), {cells:,} cells, {total_bytes / 1e9:.2f} GB -> {outdir}")


if __name__ == "__main__":
    main()
