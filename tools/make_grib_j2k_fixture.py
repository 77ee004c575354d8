#!/usr/bin/env python3
"""GRIB2 DRS 5.40 (JPEG 2000 packing) fixtures with REAL lossless
codestreams — the round-18 headline GRIB item: the one ecCodes packing
the reader previously rejected now decodes from spec.

No JPEG 2000 library exists in this environment (documented honestly, the
CCSDS/JPEG discipline), so this file carries BOTH sides of a differential
pair built from the public ITU-T T.800 / ISO 15444-1 spec text:

  - an ENCODER (forward 5/3 reversible DWT per Annex F, EBCOT Tier-1
    context modeling per Annex D driving the MQ arithmetic coder of
    Annex C, tag-tree + packet headers per Annex B, SOC/SIZ/COD/QCD/SOT/
    SOD/EOC codestream) writing the subset GRIB encoders emit: one tile,
    one component, reversible 5/3, no quantization, 1 layer, LRCP, no
    precinct subdivision, code-block style 0;
  - an INDEPENDENT DECODER (its own MQ decoder, tag-tree reader, Tier-1
    pass structure, packet parser, inverse DWT) that every emitted
    codestream is verified against BIT-EXACTLY before it leaves the
    generator — a mismatch between the two spec readings fails loudly at
    generation time, never in a committed fixture.

The Scala side (graft/sources/J2kDecoder.scala) is a third reading of
the same spec, compared against these fixtures through the DuckDB
oracle (q_grib_jpeg) and the seeded fuzz (GribJ2kFuzzSpec).

GRIB mapping (template 5.40): the packed integers X (same R/E/D/nbits
scaling as simple packing) ride a single-component unsigned image —
(NI, NJ) when every cell is present, (nPresent, 1) when a bitmap
compacts the field (the g2clib jpcpack shape). Type of compression 0 =
lossless; lossy (1) stays a loud reject with the grib_set escape hatch.

Usage:
  python3 tools/make_grib_j2k_fixture.py            # committed fixture
  J2K_FUZZ=1 python3 ... <out.grib2> <seed>         # seeded fuzz file
"""
import os
import struct
import sys

import numpy as np

NI, NJ = 29, 17
LAT_FIRST, LON_FIRST = 17975000, -17975000
DINC = 50000
REF = (2023, 10, 1, 0, 0, 0)
E, D = -1, 1


def s16(v: int) -> bytes:
    return struct.pack(">H", (0x8000 | -v) if v < 0 else v)


def s32(v: int) -> bytes:
    return struct.pack(">I", (0x80000000 | -v) if v < 0 else v)


def section(num: int, body: bytes) -> bytes:
    return struct.pack(">IB", 5 + len(body), num) + body


# ===================================================================== MQ
# T.800 Annex C arithmetic coder. The Qe table (Table C.2) is shared by
# encoder and decoder; (Qe, NMPS, NLPS, SWITCH).
QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]
N_CTX = 19
CTX_UNI = 18
CTX_RL = 17


def init_ctx():
    st = [[0, 0] for _ in range(N_CTX)]  # (state index, MPS)
    st[CTX_UNI][0] = 46
    st[CTX_RL][0] = 3
    st[0][0] = 4
    return st


class MQEncoder:
    """C.2 encoder, software conventions (C.10-C.14 flowcharts). `b` is
    the pending byte at BP (None = the sentinel before the stream, whose
    emission is skipped)."""

    def __init__(self):
        self.ctx = init_ctx()
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.b = None       # pending byte
        self.out = bytearray()

    def _emit_pending(self):
        if self.b is not None:
            self.out.append(self.b)

    def _byteout(self):
        if self.b == 0xFF:
            self._emit_pending()
            # NOT masked to 7 bits: a pending carry (C bit 27) rides as
            # the stuffed byte's top bit (legal: the marker rule only
            # fires above 0x8F)
            self.b = (self.c >> 20) & 0xFF
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            self._emit_pending()
            self.b = (self.c >> 19) & 0xFF
            self.c &= 0x7FFFF
            self.ct = 8
        else:  # carry into the pending byte
            self.b = 1 if self.b is None else self.b + 1
            if self.b == 0xFF:
                self.c &= 0x7FFFFFF
                self._emit_pending()
                self.b = (self.c >> 20) & 0xFF
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                self._emit_pending()
                self.b = (self.c >> 19) & 0xFF
                self.c &= 0x7FFFF
                self.ct = 8

    def _renorm(self):
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def encode(self, cx: int, d: int):
        st = self.ctx[cx]
        qe, nmps, nlps, sw = QE[st[0]]
        if d == st[1]:  # MPS path
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            st[0] = nmps
            self._renorm()
        else:  # LPS path
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if sw:
                st[1] = 1 - st[1]
            st[0] = nlps
            self._renorm()

    def flush(self) -> bytes:
        # C.2.9 FLUSH: SETBITS then two byteouts; a final PENDING 0xFF is
        # discarded (the decoder's marker rule feeds 1s past the end)
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        if self.b is not None and self.b != 0xFF:
            self.out.append(self.b)
        return bytes(self.out)


class MQDecoder:
    """C.3 decoder, software conventions."""

    def __init__(self, data: bytes):
        self.ctx = init_ctx()
        self.data = data
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c <<= 7
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self):
        d = self.data
        if self.bp < len(d) and d[self.bp] == 0xFF:
            nxt = d[self.bp + 1] if self.bp + 1 < len(d) else 0xFF
            if nxt > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += d[self.bp] << 9
                self.ct = 7
        else:
            self.bp += 1
            nxt = d[self.bp] if self.bp < len(d) else 0xFF
            self.c += nxt << 8
            self.ct = 8

    def decode(self, cx: int) -> int:
        st = self.ctx[cx]
        qe, nmps, nlps, sw = QE[st[0]]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange
            if self.a < qe:
                d = st[1]
                st[0] = nmps
            else:
                d = 1 - st[1]
                if sw:
                    st[1] = 1 - st[1]
                st[0] = nlps
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return st[1]
            if self.a < qe:
                d = 1 - st[1]
                if sw:
                    st[1] = 1 - st[1]
                st[0] = nlps
            else:
                d = st[1]
                st[0] = nmps
        # renorm
        while True:
            if self.ct == 0:
                self._bytein()
            self.a <<= 1
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


# ================================================================ tag tree
class TagTree:
    """B.10.2 tag tree over an (w x h) grid; encoder sets leaf values,
    decoder discovers them. Both sides share the node walk; `known` on
    the encoder mirrors `value resolved` on the decoder."""

    def __init__(self, w: int, h: int):
        self.levels = []
        lw, lh = w, h
        while True:
            self.levels.append((lw, lh))
            if lw == 1 and lh == 1:
                break
            lw, lh = (lw + 1) // 2, (lh + 1) // 2
        n = sum(lw * lh for lw, lh in self.levels)
        self.value = [0] * n
        self.low = [0] * n
        self.known = [False] * n

    def _index(self, level: int, x: int, y: int) -> int:
        off = sum(lw * lh for lw, lh in self.levels[:level])
        return off + y * self.levels[level][0] + x

    def set_values(self, vals):
        """Leaf values row-major; internal nodes = min of children."""
        w0, h0 = self.levels[0]
        for y in range(h0):
            for x in range(w0):
                self.value[self._index(0, x, y)] = vals[y * w0 + x]
        for lv in range(1, len(self.levels)):
            lw, lh = self.levels[lv]
            pw, ph = self.levels[lv - 1]
            for y in range(lh):
                for x in range(lw):
                    best = None
                    for dy in range(2):
                        for dx in range(2):
                            cx, cy = 2 * x + dx, 2 * y + dy
                            if cx < pw and cy < ph:
                                v = self.value[self._index(lv - 1, cx, cy)]
                                best = v if best is None else min(best, v)
                    self.value[self._index(lv, x, y)] = best

    def _path(self, x: int, y: int):
        path = []
        for lv in range(len(self.levels)):
            path.append(self._index(lv, x >> lv, y >> lv))
        return list(reversed(path))  # root first

    def encode(self, bw, x: int, y: int, threshold: int):
        low = 0
        for idx in self._path(x, y):
            if low > self.low[idx]:
                self.low[idx] = low
            else:
                low = self.low[idx]
            while low < threshold:
                if low >= self.value[idx]:
                    if not self.known[idx]:
                        bw.bit(1)
                        self.known[idx] = True
                    break
                bw.bit(0)
                low += 1
            self.low[idx] = low
            if self.known[idx]:
                low = self.value[idx]

    def decode(self, br, x: int, y: int, threshold: int) -> bool:
        """True iff value(x, y) < threshold (value then exact in .value)."""
        low = 0
        for idx in self._path(x, y):
            if low > self.low[idx]:
                self.low[idx] = low
            else:
                low = self.low[idx]
            while not self.known[idx] and low < threshold:
                if br.bit():
                    self.value[idx] = low
                    self.known[idx] = True
                else:
                    low += 1
            self.low[idx] = low
            if self.known[idx]:
                low = self.value[idx]
        leaf = self._path(x, y)[-1]
        return self.known[leaf] and self.value[leaf] < threshold


class HeaderBitWriter:
    """Packet-header bit packer (B.10.1): MSB first, a 0 bit stuffed
    after any 0xFF byte; a trailing 0xFF gets a stuffed 0x00."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0
        self.lim = 8

    def bit(self, b: int):
        if self.n == 0:
            self.lim = 7 if self.out and self.out[-1] == 0xFF else 8
        self.acc = (self.acc << 1) | (b & 1)
        self.n += 1
        if self.n == self.lim:
            self.out.append(self.acc)
            self.acc, self.n = 0, 0

    def bits(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1)

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc << (self.lim - self.n))
            self.acc, self.n = 0, 0
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0)
        return bytes(self.out)


class HeaderBitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.prev_ff = False

    def bit(self) -> int:
        if self.n == 0:
            b = self.data[self.pos]
            self.pos += 1
            if self.prev_ff:
                assert b < 0x80, "missing stuff bit after 0xFF"
                self.acc, self.n = b, 7
            else:
                self.acc, self.n = b, 8
            self.prev_ff = b == 0xFF
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> int:
        """End of header: skip any partial byte (and the stuffed 0x00
        after a final 0xFF); returns the body offset."""
        self.n = 0
        if self.prev_ff:
            assert self.data[self.pos] == 0
            self.pos += 1
            self.prev_ff = False
        return self.pos


# ================================================================= 5/3 DWT
def _fwd1d(x):
    n = len(x)
    if n == 1:
        return x[:], []
    def g(i):
        if i < 0:
            i = -i
        if i > n - 1:
            i = 2 * (n - 1) - i
        return x[i]
    nh = n // 2
    nl = n - nh
    d = [0] * nh
    s = [0] * nl
    for k in range(nh):
        d[k] = g(2 * k + 1) - ((g(2 * k) + g(2 * k + 2)) >> 1)
    def gd(k):
        if k < 0:
            k = -k - 1
        if k > nh - 1:
            k = 2 * nh - 1 - k
        return d[k] if nh else 0
    for k in range(nl):
        s[k] = g(2 * k) + ((gd(k - 1) + gd(k) + 2) >> 2)
    return s, d


def _inv1d(s, d):
    nl, nh = len(s), len(d)
    n = nl + nh
    if n == 1:
        return s[:]
    def gd(k):
        if k < 0:
            k = -k - 1
        if k > nh - 1:
            k = 2 * nh - 1 - k
        return d[k] if nh else 0
    x = [0] * n
    for k in range(nl):
        x[2 * k] = s[k] - ((gd(k - 1) + gd(k) + 2) >> 2)
    def gx(i):
        if i < 0:
            i = -i
        if i > n - 1:
            i = 2 * (n - 1) - i
        return x[i]
    for k in range(nh):
        x[2 * k + 1] = d[k] + ((gx(2 * k) + gx(2 * k + 2)) >> 1)
    return x


def fdwt53(img, levels):
    """img: list of rows of ints. Returns {(.. subband key ..): 2d list}:
    keys ('LL', levels) and ('HL'|'LH'|'HH', lev) for lev 1..levels.
    Forward: rows first, then columns (mirrored exactly by idwt53)."""
    bands = {}
    cur = [row[:] for row in img]
    for lev in range(1, levels + 1):
        h = len(cur)
        w = len(cur[0]) if h else 0
        rows_l, rows_h = [], []
        for row in cur:
            s, d = _fwd1d(row)
            rows_l.append(s)
            rows_h.append(d)
        def colsplit(mat):
            if not mat or not mat[0]:
                return [], []
            wv = len(mat[0])
            top, bot = [], []
            colsL = []
            colsH = []
            for cx in range(wv):
                s, d = _fwd1d([mat[ry][cx] for ry in range(len(mat))])
                colsL.append(s)
                colsH.append(d)
            nl = len(colsL[0])
            nh = len(colsH[0])
            top = [[colsL[cx][ry] for cx in range(wv)] for ry in range(nl)]
            bot = [[colsH[cx][ry] for cx in range(wv)] for ry in range(nh)]
            return top, bot
        ll, lh = colsplit(rows_l)
        hl, hh = colsplit(rows_h)
        bands[("HL", lev)] = hl
        bands[("LH", lev)] = lh
        bands[("HH", lev)] = hh
        cur = ll
    bands[("LL", levels)] = cur
    return bands


def idwt53(bands, levels):
    cur = bands[("LL", levels)]
    for lev in range(levels, 0, -1):
        hl = bands[("HL", lev)]
        lh = bands[("LH", lev)]
        hh = bands[("HH", lev)]
        def coljoin(top, bot):
            ht, hb = len(top), len(bot)
            wv = len(top[0]) if ht else (len(bot[0]) if hb else 0)
            if wv == 0:  # zero-width half: keep the row count, no columns
                return [[] for _ in range(ht + hb)]
            cols = []
            for cx in range(wv):
                s = [top[ry][cx] for ry in range(ht)]
                d = [bot[ry][cx] for ry in range(hb)]
                cols.append(_inv1d(s, d))
            n = len(cols[0])
            return [[cols[cx][ry] for cx in range(wv)] for ry in range(n)]
        left = coljoin(cur, lh)
        right = coljoin(hl, hh)
        rows = []
        for ry in range(len(left)):
            s = left[ry]
            d = right[ry] if right else []
            rows.append(_inv1d(s, d))
        cur = rows
    return cur


# ================================================================== Tier-1
# Annex D context tables. Zero-coding context from (h, v, d) neighbor
# significance counts, per subband orientation.
def zc_ctx(h, v, d, orient):
    if orient == "HH":
        hv = h + v
        if d >= 3:
            return 8
        if d == 2:
            return 7 if hv >= 1 else 6
        if d == 1:
            return 5 if hv >= 2 else (4 if hv == 1 else 3)
        return 2 if hv >= 2 else (1 if hv == 1 else 0)
    if orient == "HL":  # transpose h/v
        h, v = v, h
    if h == 2:
        return 8
    if h == 1:
        if v >= 1:
            return 7
        return 6 if d >= 1 else 5
    if v == 2:
        return 4
    if v == 1:
        return 3
    return 2 if d >= 2 else (1 if d == 1 else 0)


SC_TABLE = {  # (H, V) -> (ctx, xor)
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}


class T1Block:
    """Shared Tier-1 state walk: both coder directions subclass the pass
    structure so the context decisions are literally the same code."""

    def __init__(self, w, h, orient):
        self.w, self.h, self.orient = w, h, orient
        n = w * h
        self.sig = [0] * n
        self.sgn = [0] * n
        self.visited = [0] * n
        self.refined = [0] * n
        self.mag = [0] * n

    def _nb(self, x, y):
        """(h, v, d) significant-neighbor counts."""
        w, hgt = self.w, self.h
        def s(xx, yy):
            if 0 <= xx < w and 0 <= yy < hgt:
                return self.sig[yy * w + xx]
            return 0
        hh = s(x - 1, y) + s(x + 1, y)
        vv = s(x, y - 1) + s(x, y + 1)
        dd = (s(x - 1, y - 1) + s(x + 1, y - 1) +
              s(x - 1, y + 1) + s(x + 1, y + 1))
        return hh, vv, dd

    def _sc(self, x, y):
        w, hgt = self.w, self.h
        def sv(xx, yy):
            if 0 <= xx < w and 0 <= yy < hgt and self.sig[yy * w + xx]:
                return -1 if self.sgn[yy * w + xx] else 1
            return 0
        hc = max(-1, min(1, sv(x - 1, y) + sv(x + 1, y)))
        vc = max(-1, min(1, sv(x, y - 1) + sv(x, y + 1)))
        return SC_TABLE[(hc, vc)]

    def scan(self):
        for y0 in range(0, self.h, 4):
            for x in range(self.w):
                yield x, y0, min(4, self.h - y0)


def t1_encode(coefs, w, h, orient, Mb):
    """coefs: row-major signed ints. Returns (bytes, npasses, numbps) —
    numbps = coded magnitude planes; 0 planes -> block not included."""
    t = T1Block(w, h, orient)
    for i, v in enumerate(coefs):
        t.mag[i] = abs(v)
        t.sgn[i] = 1 if v < 0 else 0
    maxmag = max(t.mag) if coefs else 0
    numbps = maxmag.bit_length()
    assert numbps <= Mb, (numbps, Mb)
    if numbps == 0:
        return b"", 0, 0
    mq = MQEncoder()

    def sig_pass(p):
        for x, y0, rows in t.scan():
            for dy in range(rows):
                y = y0 + dy
                i = y * w + x
                t.visited[i] = 0
                if t.sig[i]:
                    continue
                hh, vv, dd = t._nb(x, y)
                cx = zc_ctx(hh, vv, dd, orient)
                if cx == 0:
                    continue
                bit = (t.mag[i] >> p) & 1
                mq.encode(cx, bit)
                t.visited[i] = 1
                if bit:
                    sc, xr = t._sc(x, y)
                    mq.encode(sc, t.sgn[i] ^ xr)
                    t.sig[i] = 1

    def ref_pass(p):
        for x, y0, rows in t.scan():
            for dy in range(rows):
                y = y0 + dy
                i = y * w + x
                if not t.sig[i] or t.visited[i]:
                    continue
                if not t.refined[i]:
                    hh, vv, dd = t._nb(x, y)
                    cx = 15 if (hh + vv + dd) > 0 else 14
                    t.refined[i] = 1
                else:
                    cx = 16
                mq.encode(cx, (t.mag[i] >> p) & 1)
                t.visited[i] = 1

    def cleanup_pass(p):
        for x, y0, rows in t.scan():
            start = 0
            if rows == 4:
                all_rl = True
                for dy in range(4):
                    i = (y0 + dy) * w + x
                    if t.sig[i] or t.visited[i]:
                        all_rl = False
                        break
                    hh, vv, dd = t._nb(x, y0 + dy)
                    if zc_ctx(hh, vv, dd, orient) != 0:
                        all_rl = False
                        break
                if all_rl:
                    first = -1
                    for dy in range(4):
                        if (t.mag[(y0 + dy) * w + x] >> p) & 1:
                            first = dy
                            break
                    if first < 0:
                        mq.encode(CTX_RL, 0)
                        for dy in range(4):
                            t.visited[(y0 + dy) * w + x] = 0
                        continue
                    mq.encode(CTX_RL, 1)
                    mq.encode(CTX_UNI, (first >> 1) & 1)
                    mq.encode(CTX_UNI, first & 1)
                    y = y0 + first
                    i = y * w + x
                    sc, xr = t._sc(x, y)
                    mq.encode(sc, t.sgn[i] ^ xr)
                    t.sig[i] = 1
                    start = first + 1
            for dy in range(start, rows):
                y = y0 + dy
                i = y * w + x
                if t.visited[i]:
                    t.visited[i] = 0
                    continue
                if t.sig[i]:
                    continue
                hh, vv, dd = t._nb(x, y)
                cx = zc_ctx(hh, vv, dd, orient)
                bit = (t.mag[i] >> p) & 1
                mq.encode(cx, bit)
                if bit:
                    sc, xr = t._sc(x, y)
                    mq.encode(sc, t.sgn[i] ^ xr)
                    t.sig[i] = 1
        for i in range(w * h):
            t.visited[i] = 0

    cleanup_pass(numbps - 1)
    npasses = 1
    for p in range(numbps - 2, -1, -1):
        sig_pass(p)
        ref_pass(p)
        cleanup_pass(p)
        npasses += 3
    return mq.flush(), npasses, numbps


def t1_decode(data, w, h, orient, numbps, npasses):
    """Independent mirror of t1_encode — the generator self-check."""
    t = T1Block(w, h, orient)
    if numbps == 0:
        return [0] * (w * h)
    mq = MQDecoder(data)
    passno = 0

    def sig_pass(p):
        for x, y0, rows in t.scan():
            for dy in range(rows):
                y = y0 + dy
                i = y * w + x
                t.visited[i] = 0
                if t.sig[i]:
                    continue
                hh, vv, dd = t._nb(x, y)
                cx = zc_ctx(hh, vv, dd, orient)
                if cx == 0:
                    continue
                t.visited[i] = 1
                if mq.decode(cx):
                    sc, xr = t._sc(x, y)
                    t.sgn[i] = mq.decode(sc) ^ xr
                    t.sig[i] = 1
                    t.mag[i] |= 1 << p

    def ref_pass(p):
        for x, y0, rows in t.scan():
            for dy in range(rows):
                y = y0 + dy
                i = y * w + x
                if not t.sig[i] or t.visited[i]:
                    continue
                if not t.refined[i]:
                    hh, vv, dd = t._nb(x, y)
                    cx = 15 if (hh + vv + dd) > 0 else 14
                    t.refined[i] = 1
                else:
                    cx = 16
                if mq.decode(cx):
                    t.mag[i] |= 1 << p
                else:
                    t.mag[i] &= ~(1 << p)
                t.visited[i] = 1

    def cleanup_pass(p):
        for x, y0, rows in t.scan():
            start = 0
            if rows == 4:
                all_rl = True
                for dy in range(4):
                    i = (y0 + dy) * w + x
                    if t.sig[i] or t.visited[i]:
                        all_rl = False
                        break
                    hh, vv, dd = t._nb(x, y0 + dy)
                    if zc_ctx(hh, vv, dd, orient) != 0:
                        all_rl = False
                        break
                if all_rl:
                    if not mq.decode(CTX_RL):
                        for dy in range(4):
                            t.visited[(y0 + dy) * w + x] = 0
                        continue
                    first = (mq.decode(CTX_UNI) << 1) | mq.decode(CTX_UNI)
                    y = y0 + first
                    i = y * w + x
                    sc, xr = t._sc(x, y)
                    t.sgn[i] = mq.decode(sc) ^ xr
                    t.sig[i] = 1
                    t.mag[i] |= 1 << p
                    start = first + 1
            for dy in range(start, rows):
                y = y0 + dy
                i = y * w + x
                if t.visited[i]:
                    t.visited[i] = 0
                    continue
                if t.sig[i]:
                    continue
                hh, vv, dd = t._nb(x, y)
                cx = zc_ctx(hh, vv, dd, orient)
                if mq.decode(cx):
                    sc, xr = t._sc(x, y)
                    t.sgn[i] = mq.decode(sc) ^ xr
                    t.sig[i] = 1
                    t.mag[i] |= 1 << p
        for i in range(w * h):
            t.visited[i] = 0

    cleanup_pass(numbps - 1)
    passno = 1
    p = numbps - 2
    while passno < npasses:
        sig_pass(p)
        ref_pass(p)
        cleanup_pass(p)
        passno += 3
        p -= 1
    return [(-m if s else m)
            for m, s in zip(t.mag, t.sgn)]


# ============================================================== codestream
def band_dims(W, H, levels):
    """Subband extents for an origin-0 (W x H) image: {key: (w, h)} —
    every band's own origin is 0 for this geometry."""
    def ce(a, b):
        return -(-a // b)
    dims = {}
    for lev in range(1, levels + 1):
        sc = 1 << lev
        half = 1 << (lev - 1)
        dims[("HL", lev)] = (ce(W - half, sc), ce(H, sc))
        dims[("LH", lev)] = (ce(W, sc), ce(H - half, sc))
        dims[("HH", lev)] = (ce(W - half, sc), ce(H - half, sc))
    dims[("LL", levels)] = (ce(W, 1 << levels), ce(H, 1 << levels))
    return dims


def pkt_bands(levels, r):
    if r == 0:
        return [("LL", levels)]
    lev = levels - r + 1
    return [("HL", lev), ("LH", lev), ("HH", lev)]


GAIN = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}


def npasses_code(bw, n):
    if n == 1:
        bw.bit(0)
    elif n == 2:
        bw.bits(0b10, 2)
    elif n <= 5:
        bw.bits(0b11, 2)
        bw.bits(n - 3, 2)
    elif n <= 36:
        bw.bits(0b1111, 4)
        bw.bits(n - 6, 5)
    else:
        assert n <= 164
        bw.bits(0b111111111, 9)
        bw.bits(n - 37, 7)


def npasses_read(br):
    if br.bit() == 0:
        return 1
    if br.bit() == 0:
        return 2
    v = br.bits(2)
    if v < 3:
        return 3 + v
    v = br.bits(5)
    if v < 31:
        return 6 + v
    return 37 + br.bits(7)


def encode_codestream(samples, W, H, depth, levels, cbw_exp, cbh_exp):
    """samples: row-major unsigned ints < 2^depth. Returns codestream."""
    half = 1 << (depth - 1)
    img = [[samples[y * W + x] - half for x in range(W)] for y in range(H)]
    bands = fdwt53(img, levels)
    dims = band_dims(W, H, levels)
    for k, (bwd, bhd) in dims.items():
        got_h = len(bands[k])
        got_w = len(bands[k][0]) if got_h else 0
        if bwd == 0 or bhd == 0:  # empty bands carry no shape in list form
            assert got_h == 0 or got_w == 0, (k, got_w, got_h)
        else:
            assert (got_w, got_h) == (bwd, bhd), (k, got_w, got_h, bwd, bhd)
    # guard bits: cover actual coefficient growth (eps = depth + gain)
    need_g = 2
    for k, mat in bands.items():
        mx = max((abs(v) for row in mat for v in row), default=0)
        eps = depth + GAIN[k[0]]
        need_g = max(need_g, mx.bit_length() - eps + 1)
    G = need_g
    assert G <= 7, f"guard bits {G} exceed the 3-bit field"
    cbw, cbh = 1 << cbw_exp, 1 << cbh_exp

    # Tier-1 per code-block, grouped per band
    coded = {}
    for k, mat in bands.items():
        bwd, bhd = dims[k]
        ncx = -(-bwd // cbw) if bwd else 0
        ncy = -(-bhd // cbh) if bhd else 0
        Mb = G + (depth + GAIN[k[0]]) - 1
        blocks = []
        for by in range(ncy):
            for bx in range(ncx):
                x0, y0 = bx * cbw, by * cbh
                x1, y1 = min(x0 + cbw, bwd), min(y0 + cbh, bhd)
                sub = [mat[y][x] for y in range(y0, y1) for x in range(x0, x1)]
                data, npass, nbps = t1_encode(sub, x1 - x0, y1 - y0, k[0], Mb)
                # generator self-check: the independent Tier-1 decoder
                # reproduces the coefficients bit-exactly
                back = t1_decode(data, x1 - x0, y1 - y0, k[0], nbps, npass)
                assert back == sub, f"T1 self-check failed for {k} block {bx},{by}"
                blocks.append((data, npass, nbps, x1 - x0, y1 - y0))
        coded[k] = (ncx, ncy, Mb, blocks)

    # packets, LRCP with 1 layer = one packet per resolution
    body = bytearray()
    for r in range(levels + 1):
        bw = HeaderBitWriter()
        pieces = []
        any_data = any(
            dims[k][0] > 0 and dims[k][1] > 0 for k in pkt_bands(levels, r))
        if not any_data:
            bw.bit(0)
            body += bw.flush()
            continue
        bw.bit(1)
        for k in pkt_bands(levels, r):
            bwd, bhd = dims[k]
            if bwd == 0 or bhd == 0:
                continue
            ncx, ncy, Mb, blocks = coded[k]
            incl = TagTree(ncx, ncy)
            zbp = TagTree(ncx, ncy)
            incl.set_values([0 if b[1] > 0 else 1 for b in blocks])
            zbp.set_values([Mb - b[2] if b[1] > 0 else 0 for b in blocks])
            for by in range(ncy):
                for bx in range(ncx):
                    data, npass, nbps, _, _ = blocks[by * ncx + bx]
                    incl.encode(bw, bx, by, 1)
                    if npass == 0:
                        continue
                    zbp.encode(bw, bx, by, (Mb - nbps) + 1)
                    npasses_code(bw, npass)
                    # LBlock signalling (B.10.7), state starts at 3
                    lblock = 3
                    nbits_len = len(data).bit_length()
                    need = nbits_len - (npass.bit_length() - 1)
                    k_extra = max(0, need - lblock)
                    for _ in range(k_extra):
                        bw.bit(1)
                    bw.bit(0)
                    lblock += k_extra
                    bw.bits(len(data), lblock + (npass.bit_length() - 1))
                    pieces.append(data)
        body += bw.flush()
        for p in pieces:
            body += p

    # markers
    siz = struct.pack(">HHIIIIIIIIH", 38 + 3, 0, W, H, 0, 0, W, H, 0, 0, 1)
    siz += bytes([depth - 1, 1, 1])
    cod = struct.pack(">HBBHB", 12, 0, 0, 1, 0)  # Scod, LRCP, 1 layer, no MCT
    cod += bytes([levels, cbw_exp - 2, cbh_exp - 2, 0, 1])
    nb = 3 * levels + 1
    qcd = struct.pack(">HB", 3 + nb, (G << 5) | 0)
    subs = [("LL", levels)]
    for lev in range(levels, 0, -1):
        subs += [("HL", lev), ("LH", lev), ("HH", lev)]
    for k in subs:
        qcd += bytes([(depth + GAIN[k[0]]) << 3])
    out = bytearray()
    out += b"\xff\x4f"
    out += b"\xff\x51" + siz
    out += b"\xff\x52" + cod
    out += b"\xff\x5c" + qcd
    psot = 12 + 2 + len(body)
    out += b"\xff\x90" + struct.pack(">HHIBB", 10, 0, psot, 0, 1)
    out += b"\xff\x93"
    out += body
    out += b"\xff\xd9"
    return bytes(out)


def decode_codestream(cs):
    """Independent decoder (the generator self-check side): returns
    (W, H, samples row-major unsigned)."""
    assert cs[:2] == b"\xff\x4f", "SOC"
    pos = 2
    W = H = depth = levels = cbw = cbh = None
    G = None
    eps = {}
    body_at = None
    while True:
        marker = cs[pos:pos + 2]
        pos += 2
        if marker == b"\xff\x93":  # SOD
            body_at = pos
            break
        ln = struct.unpack(">H", cs[pos:pos + 2])[0]
        seg = cs[pos + 2:pos + ln]
        if marker == b"\xff\x51":
            (_, W, H, xo, yo, tw, th, txo, tyo, nc) = struct.unpack(
                ">HIIIIIIIIH", seg[:36])
            assert (xo, yo, txo, tyo) == (0, 0, 0, 0) and nc == 1
            assert (tw, th) == (W, H), "single tile covering the image"
            depth = (seg[36] & 0x7F) + 1
            assert seg[36] & 0x80 == 0, "unsigned"
        elif marker == b"\xff\x52":
            scod = seg[0]
            assert scod == 0
            prog, layers, mct = struct.unpack(">BHB", seg[1:5])
            assert prog == 0 and layers == 1 and mct == 0
            levels = seg[5]
            cbw = 1 << (seg[6] + 2)
            cbh = 1 << (seg[7] + 2)
            assert seg[8] == 0 and seg[9] == 1  # style 0, 5/3
        elif marker == b"\xff\x5c":
            G = seg[0] >> 5
            assert seg[0] & 0x1F == 0
            subs = [("LL", levels)]
            for lev in range(levels, 0, -1):
                subs += [("HL", lev), ("LH", lev), ("HH", lev)]
            for i, k in enumerate(subs):
                eps[k] = seg[1 + i] >> 3
        elif marker == b"\xff\x90":
            pass  # single tile-part
        else:
            raise AssertionError(f"unexpected marker {marker.hex()}")
        pos += ln
    dims = band_dims(W, H, levels)
    bands = {}
    pos = body_at
    for r in range(levels + 1):
        br = HeaderBitReader(cs, pos)
        if not br.bit():
            pos = br.align()
            for k in pkt_bands(levels, r):
                bwd, bhd = dims[k]
                bands[k] = [[0] * bwd for _ in range(bhd)]
            continue
        todo = []
        for k in pkt_bands(levels, r):
            bwd, bhd = dims[k]
            bands[k] = [[0] * bwd for _ in range(bhd)]
            if bwd == 0 or bhd == 0:
                continue
            ncx, ncy = -(-bwd // cbw), -(-bhd // cbh)
            Mb = G + eps[k] - 1
            incl = TagTree(ncx, ncy)
            zbp = TagTree(ncx, ncy)
            for by in range(ncy):
                for bx in range(ncx):
                    if not incl.decode(br, bx, by, 1):
                        continue
                    zp = 0
                    while not zbp.decode(br, bx, by, zp + 1):
                        zp += 1
                    npass = npasses_read(br)
                    lblock = 3
                    while br.bit():
                        lblock += 1
                    ln = br.bits(lblock + (npass.bit_length() - 1))
                    todo.append((k, bx, by, Mb - zp, npass, ln))
        pos = br.align()
        for k, bx, by, nbps, npass, ln in todo:
            bwd, bhd = dims[k]
            x0, y0 = bx * cbw, by * cbh
            x1, y1 = min(x0 + cbw, bwd), min(y0 + cbh, bhd)
            coefs = t1_decode(cs[pos:pos + ln], x1 - x0, y1 - y0,
                              k[0], nbps, npass)
            pos += ln
            i = 0
            for y in range(y0, y1):
                for x in range(x0, x1):
                    bands[k][y][x] = coefs[i]
                    i += 1
    assert cs[pos:pos + 2] == b"\xff\xd9", "EOC"
    img = idwt53(bands, levels)
    half = 1 << (depth - 1)
    out = [img[y][x] + half for y in range(H) for x in range(W)]
    assert all(0 <= v < (1 << depth) for v in out), "sample out of range"
    return W, H, out


# ================================================================== GRIB
def message(member, step_hours, field, nbits, levels, cbw_exp, cbh_exp,
            missing_mask=None):
    npts = NI * NJ
    present = (np.ones(npts, bool) if missing_mask is None
               else ~missing_mask.reshape(-1))
    scaled = np.round(field * 10.0 ** D / 2.0 ** E).astype(np.int64)
    vals = scaled.reshape(-1)[present]
    tmin = int(vals.min()) if vals.size else 0
    R = float(np.float32(tmin * 2.0 ** E))
    X = [int(v - tmin) for v in vals]
    assert nbits > 0 and max(X) < (1 << nbits), (max(X) if X else 0, nbits)
    if missing_mask is None:
        w, h = NI, NJ
    else:
        w, h = len(X), 1  # the g2clib jpcpack shape: compacted 1-row image
    cs = encode_codestream(X, w, h, nbits, levels, cbw_exp, cbh_exp)
    # generator self-check: the independent decoder round-trips exactly
    dw, dh, back = decode_codestream(cs)
    assert (dw, dh) == (w, h) and back == X, "codestream self-check failed"

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
    body4 = (struct.pack(">H", 0)
             + struct.pack(">H", 1 if member is not None else 0)
             + struct.pack(">BB", 0, 197) + struct.pack(">B", 2)
             + struct.pack(">BB", 255, 255) + struct.pack(">HB", 0, 0)
             + struct.pack(">B", 1) + struct.pack(">i", step_hours)
             + struct.pack(">BBi", 1, 0, 0) + struct.pack(">BBi", 255, 0, 0))
    if member is not None:
        body4 += struct.pack(">BBB", 3 if member > 0 else 0, member, 4)
    sec4 = section(4, body4)
    # template 5.40: R, E, D, nbits, orig type; compression 0 = lossless,
    # target ratio 255 = undefined
    sec5 = section(5, struct.pack(">IH", int(present.sum()), 40)
                   + struct.pack(">f", R) + s16(E) + s16(D)
                   + struct.pack(">BB", nbits, 0) + struct.pack(">BB", 0, 255))
    if missing_mask is None:
        sec6 = section(6, struct.pack(">B", 255))
    else:
        acc, nb, bm = 0, 0, bytearray()
        for p in present.astype(int):
            acc, nb = (acc << 1) | int(p), nb + 1
            if nb == 8:
                bm.append(acc)
                acc, nb = 0, 0
        if nb:
            bm.append((acc << (8 - nb)) & 0xFF)
        sec6 = section(6, struct.pack(">B", 0) + bytes(bm))
    sec7 = section(7, cs)
    body = sec1 + sec3 + sec4 + sec5 + sec6 + sec7
    total = 16 + len(body) + 4
    msg = (b"GRIB" + struct.pack(">HBB", 0, 1, 2)
           + struct.pack(">Q", total) + body + b"7777")
    decoded = (np.float64(np.float32(R))
               + np.array(X, np.float64) * 2.0 ** E) / 10.0 ** D
    return msg, present, decoded


def field_for(member, step, kind):
    m = 0 if member is None else member
    j, i = np.mgrid[0:NJ, 0:NI].astype(np.float64)
    if kind == "smooth":
        return np.round((3.0 + 0.4 * i + 0.15 * j + 2.0 * m) * 20) / 20.0
    if kind == "wavy":
        return np.round((5.0 + np.sin(i * 0.7 + j * 0.5 + m) * 4) * 20) / 20.0
    rng = np.random.default_rng(777 + m + step)
    return np.round(rng.uniform(0, 40, (NJ, NI)) * 20) / 20.0


def fixture_main():
    import calendar
    import pyarrow as pa
    import pyarrow.parquet as pq
    msgs = []
    rows = {"latitude": [], "longitude": [], "number": [], "step_hours": [],
            "ref_time": [], "value": []}
    ref_epoch = calendar.timegm(REF)
    lat = [(LAT_FIRST - j * DINC) / 1e6 for j in range(NJ)]
    lon = [(LON_FIRST + i * DINC) / 1e6 for i in range(NI)]
    specs = [
        (None, 24, "smooth", 10, 2, 6, 6, False),  # control, 2 levels
        (1, 24, "wavy", 12, 3, 4, 4, False),       # small code-blocks
        (2, 24, "noisy", 14, 1, 6, 5, False),      # 1 level, wide range
        (1, 48, "smooth", 10, 2, 6, 6, True),      # bitmap -> 1-row image
    ]
    for member, step, kind, nbits, levels, cbw, cbh, bm in specs:
        field = field_for(member, step, kind)
        mask = None
        if bm:
            jj, ii = np.mgrid[0:NJ, 0:NI]
            mask = ((ii * 7 + jj * 3) % 11 == 0)
        msg, present, decoded = message(member, step, field, nbits,
                                        levels, cbw, cbh, mask)
        msgs.append(msg)
        pidx = 0
        pres = present.reshape(NJ, NI)
        for jy in range(NJ):
            for ix in range(NI):
                rows["latitude"].append(lat[jy])
                rows["longitude"].append(lon[ix])
                rows["number"].append(member)
                rows["step_hours"].append(step)
                rows["ref_time"].append(ref_epoch)
                # bitmap-missing cells are NULL rows (the source contract)
                if pres[jy, ix]:
                    rows["value"].append(float(decoded[pidx]))
                    pidx += 1
                else:
                    rows["value"].append(None)
    with open("data/grib/j2k.grib2", "wb") as f:
        f.write(b"".join(msgs))
    pq.write_table(pa.table({
        "latitude": pa.array(rows["latitude"], pa.float64()),
        "longitude": pa.array(rows["longitude"], pa.float64()),
        "number": pa.array(rows["number"], pa.int32()),
        "step_hours": pa.array(rows["step_hours"], pa.int32()),
        "ref_time": pa.array(rows["ref_time"], pa.int64()),
        "value": pa.array(rows["value"], pa.float64()),
    }), "data/grib/j2k_expected.parquet", compression="snappy")
    print(f"j2k.grib2: {sum(len(m) for m in msgs)} bytes, {len(msgs)} "
          f"messages, DRS 5.40 lossless (levels 1-3, bitmap variant)")


def fuzz_main(out, seed):
    global NI, NJ
    rng = np.random.default_rng(seed)
    n_msgs = int(rng.integers(2, 5))
    msgs = []
    chk = 0
    for m in range(n_msgs):
        NI = int(rng.integers(2, 70))
        NJ = int(rng.integers(2, 40))
        nbits = int(rng.integers(4, 17))
        levels = int(rng.integers(1, 5))
        cbw = int(rng.integers(2, 7))
        cbh = int(rng.integers(2, 7))
        j, i = np.mgrid[0:NJ, 0:NI].astype(np.float64)
        style = int(rng.integers(0, 3))
        if style == 0:
            field = np.round((1.0 + 0.3 * i + 0.2 * j + m) * 20) / 20.0
        elif style == 1:
            field = np.round(
                rng.uniform(0, (1 << nbits) / 40.0, (NJ, NI)) * 20) / 20.0
        else:
            field = np.round((2.0 + np.sin(i * 0.9 + j * 0.4) *
                              min(500.0, (1 << nbits) / 50.0)) * 20) / 20.0
        # clamp into nbits range after scaling
        maxv = (1 << nbits) - 1
        scaled = np.round(field * 10.0 ** D / 2.0 ** E)
        scaled -= scaled.min()
        scaled = np.minimum(scaled, maxv)
        field = scaled * 2.0 ** E / 10.0 ** D
        mask = None
        if rng.integers(0, 2):
            mask = rng.random((NJ, NI)) < 0.1
            if mask.all():
                mask[0, 0] = False
        msg, present, decoded = message(
            int(rng.integers(0, 9)), 24, field, nbits, levels, cbw, cbh, mask)
        msgs.append(msg)
        # order-independent (Spark rows are unordered); placement is pinned
        # by the committed fixture's coordinate-keyed oracle
        chk += sum(int(round(v * 1000)) for v in decoded)
    with open(out, "wb") as f:
        f.write(b"".join(msgs))
    print(f"expected sum_scaled over file: {chk}")
    print(f"INFO msgs={n_msgs}")


if __name__ == "__main__" and os.environ.get("J2K_FUZZ"):
    fuzz_main(sys.argv[1], int(sys.argv[2]))
elif __name__ == "__main__":
    fixture_main()
