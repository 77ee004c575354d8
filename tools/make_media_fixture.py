#!/usr/bin/env python3
"""Generate real media-file fixtures (BMP / PNG / WAV) + the expected
decoded-metadata parquet, all committed under data/media/.

The bytes are written directly from the public format specs with
struct.pack — BMP from the Windows BITMAPINFOHEADER layout, PNG from the
W3C PNG spec (zlib IDAT, CRC-32 chunk trailers), WAV from the RIFF/WAVE
PCM layout — deliberately NOT via an image/audio library and NOT via the
Scala decoder under test, so the fixture is an independent implementation
of each format. The parquet mirror holds the spec-derived dimensions /
channel counts / frame counts and serves as the DuckDB oracle for
q_multimodal_decode.

Coverage notes:
  - one BMP is top-down (negative biHeight) — decoders must abs() it
  - PNGs cover grayscale / RGB / RGBA color types
  - one WAV carries a LIST chunk before `data` — decoders must walk
    chunks, not assume data at byte 36; one has an odd-sized data chunk
    (RIFF pads chunks to even length)
  - media_15.bin is an opaque payload (no known magic) — decoders fall
    back to the documented checksum stub
  - palette (color-type-3) PNGs cover index depths 8/4/1, a short
    (non-power-of-two) PLTE, and per-row filters over the packed bytes
  - JPEGs (baseline SOF0 and progressive SOF2) carry real dimensions in
    the frame header; their entropy stream is junk — the fixture pins
    the marker walk, and pixel decoders must STUB, never misread

Run once, commit outputs:
  python3 tools/make_media_fixture.py
"""
import os
import struct
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__), "..", "data", "media")
PRIME = 1000000007  # graft.llm.TextHash.Prime


def checksum(b: bytes) -> int:
    c = 7
    for x in b:
        c = (c * 31 + x) % PRIME
    return c


# ---------------------------------------------------------------- BMP

def make_bmp(width: int, height: int, top_down: bool = False,
             perturb: bool = False) -> bytes:
    """24-bit BITMAPINFOHEADER BMP; deterministic pixel pattern.
    perturb=True nudges the blue channel of a sparse pixel subset (the
    planted NEAR-duplicate: same image to a perceptual hash, different
    bytes)."""
    stride = (width * 3 + 3) & ~3
    pixels = bytearray()
    for y in range(height):
        row = bytearray()
        for x in range(width):
            b0 = (x * 7 + y * 13) % 256
            if perturb and (x + 7 * y) % 13 == 0:
                b0 = min(255, b0 + 9)
            row += bytes((b0, (x * 3 + y) % 256, (x + y * 5) % 256))
        row += b"\x00" * (stride - len(row))
        pixels += row
    data_off = 14 + 40
    file_size = data_off + len(pixels)
    bi_height = -height if top_down else height
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, width, bi_height, 1, 24, 0,
                       len(pixels), 2835, 2835, 0, 0)
    return header + info + bytes(pixels)


# ---------------------------------------------------------------- PNG

def png_chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def make_png(width: int, height: int, color_type: int) -> bytes:
    """8-bit-depth PNG; color_type 0 = gray, 2 = RGB, 6 = RGBA."""
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter: None
        for x in range(width):
            for c in range(channels):
                raw.append((x * 11 + y * 17 + c * 29) % 256)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n"
            + png_chunk(b"IHDR", ihdr)
            + png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + png_chunk(b"IEND", b""))


def _palette(n: int) -> bytes:
    return bytes(byte for i in range(n)
                 for byte in ((i * 37) % 256, (i * 73 + 11) % 256, (i * 11 + 5) % 256))


def _palette_idx(x: int, y: int, n: int) -> int:
    return (x * 3 + y * 7) % n


def make_png_palette(width: int, height: int, bit_depth: int,
                     filtered: bool = False, n_colors: int = None) -> bytes:
    """Color-type-3 PNG: packed indices at bit_depth 1/2/4/8 into a PLTE
    table; filtered=True runs row y through filter y % 5 on the PACKED
    bytes (bpp = 1 per spec)."""
    n = min(n_colors or (1 << bit_depth), 1 << bit_depth, 256)
    stride = (width * bit_depth + 7) // 8
    rows = []
    for y in range(height):
        packed = bytearray(stride)
        for x in range(width):
            v = _palette_idx(x, y, n)
            bitpos = x * bit_depth
            packed[bitpos // 8] |= v << (8 - bit_depth - (bitpos % 8))
        rows.append(bytes(packed))
    stream = bytearray()
    prev = bytes(stride)
    for y, row in enumerate(rows):
        ft = (y % 5) if filtered else 0
        stream.append(ft)
        for i, x in enumerate(row):
            a = row[i - 1] if i >= 1 else 0
            b = prev[i]
            c = prev[i - 1] if i >= 1 else 0
            if ft == 0:
                v = x
            elif ft == 1:
                v = (x - a) & 0xFF
            elif ft == 2:
                v = (x - b) & 0xFF
            elif ft == 3:
                v = (x - (a + b) // 2) & 0xFF
            else:
                v = (x - _paeth(a, b, c)) & 0xFF
            stream.append(v)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, 3, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n"
            + png_chunk(b"IHDR", ihdr)
            + png_chunk(b"PLTE", _palette(n))
            + png_chunk(b"IDAT", zlib.compress(bytes(stream), 6))
            + png_chunk(b"IEND", b""))


def png_palette_norm_pixels(width: int, height: int, bit_depth: int,
                            n_colors: int = None) -> bytes:
    n = min(n_colors or (1 << bit_depth), 1 << bit_depth, 256)
    pal = _palette(n)
    out = bytearray()
    for y in range(height):
        for x in range(width):
            i = _palette_idx(x, y, n)
            out += pal[i * 3:i * 3 + 3]
    return bytes(out)


# ---------------------------------------------------------------- JPEG

def make_jpeg(width: int, height: int, ncomp: int = 3,
              progressive: bool = False) -> bytes:
    """Minimal marker-valid JPEG: SOI, JFIF APP0, a DQT, SOF0 (baseline)
    or SOF2 (progressive) carrying the dimensions, a DHT, SOS, token
    entropy bytes, EOI. Dimension metadata is real per the JPEG marker
    spec; the entropy stream is junk (metadata walkers never reach it)."""
    def seg(marker, payload):
        return bytes((0xFF, marker)) + struct.pack(">H", 2 + len(payload)) + payload
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = bytes([0]) + bytes((i * 7 + 3) % 255 + 1 for i in range(64))
    sof = struct.pack(">BHHB", 8, height, width, ncomp) + b"".join(
        struct.pack(">BBB", i + 1, 0x11, 0) for i in range(ncomp))
    dht = bytes([0x00]) + bytes(16)
    sos = struct.pack(">B", ncomp) + b"".join(
        struct.pack(">BB", i + 1, 0) for i in range(ncomp)) + bytes((0, 63, 0))
    return (b"\xFF\xD8" + seg(0xE0, app0) + seg(0xDB, dqt)
            + seg(0xC2 if progressive else 0xC0, sof)
            + seg(0xC4, dht) + seg(0xDA, sos) + b"\x12\x34\x56" + b"\xFF\xD9")


# ---------------------------------------------------------------- MP4

def mp4_box(tag: bytes, payload: bytes, largesize: bool = False) -> bytes:
    """ISO BMFF box; largesize=True uses the size==1 64-bit form."""
    if largesize:
        return struct.pack(">I", 1) + tag + struct.pack(">Q", 16 + len(payload)) + payload
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def mp4_tkhd(width: int, height: int, track_id: int, v1: bool = False) -> bytes:
    """tkhd payload: 16.16 fixed-point presentation dims at the end of
    the fixed layout (ISO 14496-12 §8.3.2)."""
    head = (bytes([1, 0, 0, 0]) + struct.pack(">QQI", 0, 0, track_id)
            + bytes(4) + struct.pack(">Q", 0)) if v1 else \
           (bytes([0, 0, 0, 0]) + struct.pack(">III", 0, 0, track_id)
            + bytes(4) + struct.pack(">I", 0))
    tail = (bytes(8)                      # reserved
            + struct.pack(">HHHH", 0, 0, 0x0100, 0)  # layer/alt/volume/res
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", width << 16, height << 16))
    return mp4_box(b"tkhd", head + tail)


def make_mp4(timescale: int, duration: int, track_dims: list,
             v1: bool = False, large_mdat: bool = False) -> bytes:
    """Minimal ISO BMFF movie: ftyp + moov{mvhd, trak{tkhd}...} + mdat.
    track_dims is [(w, h)] per track; (0, 0) marks a non-visual track."""
    ftyp = mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp42")
    mvhd_tail = (struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
                 + bytes(10) + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000,
                                           0, 0, 0, 0x40000000)
                 + bytes(24) + struct.pack(">I", len(track_dims) + 1))
    if v1:
        mvhd = mp4_box(b"mvhd", bytes([1, 0, 0, 0])
                       + struct.pack(">QQIQ", 0, 0, timescale, duration) + mvhd_tail)
    else:
        mvhd = mp4_box(b"mvhd", bytes([0, 0, 0, 0])
                       + struct.pack(">IIII", 0, 0, timescale, duration) + mvhd_tail)
    traks = b"".join(
        mp4_box(b"trak", mp4_tkhd(w, h, i + 1, v1=(v1 and i == 0)))
        for i, (w, h) in enumerate(track_dims))
    mdat = mp4_box(b"mdat", bytes((i * 31 + 7) % 256 for i in range(48)),
                   largesize=large_mdat)
    return ftyp + mp4_box(b"moov", mvhd + traks) + mdat


# ---------------------------------------------------------------- WAV

def make_wav(channels: int, sample_rate: int, n_frames: int,
             bits: int = 16, with_list_chunk: bool = False,
             odd_data: bool = False, perturb: bool = False,
             fmt_code: int = 1, extensible: bool = False) -> bytes:
    """RIFF/WAVE. fmt_code 1 = PCM (bits 8/16/24/32), 3 = IEEE float
    (bits 32, sample = v/32768 — exact in float32); extensible=True wraps
    the code in WAVE_FORMAT_EXTENSIBLE (0xFFFE + subformat GUID, the
    container 24-bit tooling writes). odd_data appends one extra byte to
    the data chunk (legal for 8-bit mono; the chunk is then padded to
    even length). perturb=True nudges every 7th frame's first channel
    (the planted NEAR-duplicate: same envelope to the fingerprint,
    different bytes)."""
    block_align = channels * bits // 8
    data = bytearray()
    for i in range(n_frames):
        for c in range(channels):
            v = ((i * 37 + c * 101) % 65536) - 32768
            if perturb and c == 0 and i % 7 == 0:
                v = min(32767, v + 900)
            if fmt_code == 3 and bits == 64:
                data += struct.pack("<d", v / 32768.0)
            elif fmt_code == 3:
                data += struct.pack("<f", v / 32768.0)
            elif bits == 16:
                data += struct.pack("<h", v)
            elif bits == 8:
                data += struct.pack("<B", (v >> 8) + 128)
            elif bits == 24:
                data += struct.pack("<i", v << 8)[:3]
            else:
                data += struct.pack("<i", v << 16)
    if odd_data:
        assert bits == 8 and channels == 1
        data += b"\x7f"
        n_frames += 1
    if extensible:
        guid = struct.pack("<H", fmt_code) + b"\x00\x00" + bytes(
            [0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA,
             0x00, 0x38, 0x9B, 0x71])
        fmt = struct.pack("<HHIIHH", 0xFFFE, channels, sample_rate,
                          sample_rate * block_align, block_align, bits)
        fmt += struct.pack("<HHI", 22, bits, 0) + guid
    else:
        fmt = struct.pack("<HHIIHH", fmt_code, channels, sample_rate,
                          sample_rate * block_align, block_align, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if with_list_chunk:
        info = b"INFOISFT" + struct.pack("<I", 6) + b"graft\x00"
        chunks += b"LIST" + struct.pack("<I", len(info)) + info
    chunks += b"data" + struct.pack("<I", len(data)) + bytes(data)
    if len(data) % 2:
        chunks += b"\x00"  # RIFF even-size pad
    riff = b"WAVE" + chunks
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ---------------------------------------------------------------- GIF
# From-spec GIF87a/89a writer with a self-checking LZW pair: the encoder
# (greedy dictionary build) and an INDEPENDENT decoder (the spec's
# variable-width/KwKwK rules, mirroring nothing of the Scala source) are
# both implemented here, and every emitted stream is decode-verified
# before it leaves the generator — the discipline the JPEG encoder set.

def gif_lzw_encode(indices, min_code):
    clear = 1 << min_code
    end = clear + 1
    out = bytearray()
    acc = 0
    nacc = 0
    code_size = min_code + 1

    def emit(code):
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += code_size
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    w = (indices[0],)
    for k in indices[1:]:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code <= 4095:
            table[wk] = next_code
            next_code += 1
            # the decoder adds its mirror entry one code LATER, so it
            # widens after processing the code we just emitted; widen here
            # when the DECODER's table is about to need the wider size
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        w = (k,)
    emit(table[w])
    emit(end)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_lzw_decode(data, min_code, n_pix):
    """Reference decoder for the self-check (spec rules, written against
    the GIF spec text, not against either encoder)."""
    clear = 1 << min_code
    end = clear + 1
    acc = 0
    nacc = 0
    pos = 0
    code_size = min_code + 1
    out = []
    table = None
    prev = None
    while len(out) < n_pix:
        while nacc < code_size:
            assert pos < len(data), "LZW stream truncated"
            acc |= data[pos] << nacc
            nacc += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nacc -= code_size
        if code == clear:
            table = {i: (i,) for i in range(clear)}
            code_size = min_code + 1
            prev = None
        elif code == end:
            raise AssertionError("end code before all pixels")
        elif prev is None:
            assert table is not None and code < clear
            out.extend(table[code])
            prev = code
        else:
            nxt = end + 1 + len(table) - clear
            if code in table:
                entry = table[code]
            else:
                assert code == nxt, f"invalid code {code}"
                entry = table[prev] + (table[prev][0],)
            out.extend(entry)
            table[nxt] = table[prev] + (entry[0],)
            if nxt + 1 == (1 << code_size) and code_size < 12:
                code_size += 1
            prev = code
    return out


def gif_palette(n_colors):
    return [((j * 37 + 11) % 256, (j * 59 + 23) % 256, (j * 83 + 5) % 256)
            for j in range(n_colors)]


def gif_indices(w, h, n_colors):
    # runs + variation: exercises dictionary chains without being flat
    return [((p // 3) + (p % 7) + (p // (w * 2 + 1))) % n_colors
            for p in range(w * h)]


GIF_INTERLACE = [(0, 8), (4, 8), (2, 4), (1, 2)]


def gif_interlaced_rows(h):
    rows = []
    for start, step in GIF_INTERLACE:
        rows.extend(range(start, h, step))
    return rows


def make_gif(w, h, n_colors=16, interlaced=False, local_palette=False,
             frames=1, gce=False):
    pal = gif_palette(n_colors)
    pal_bits = max(1, (n_colors - 1).bit_length())
    pal_size = 1 << pal_bits
    pal_bytes = b"".join(bytes(c) for c in pal) + b"\x00" * (3 * (pal_size - n_colors))
    out = bytearray(b"GIF89a" if gce or frames > 1 else b"GIF87a")
    out += struct.pack("<HH", w, h)
    if local_palette:
        out += bytes((0x00, 0, 0))  # no global table
    else:
        out += bytes((0x80 | (pal_bits - 1), 0, 0))
        out += pal_bytes
    min_code = max(2, pal_bits)
    for f in range(frames):
        if gce:
            # graphic control: transparency index 0 — decoders must skip
            # by framing and still emit palette colors
            out += bytes((0x21, 0xF9, 4, 0x01, 0, 0, 0, 0))
        out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h)
        if local_palette:
            out += bytes(((0x80 | (0x40 if interlaced else 0) | (pal_bits - 1)),))
            out += pal_bytes
        else:
            out += bytes(((0x40 if interlaced else 0),))
        idx = gif_indices(w, h, n_colors)
        if f > 0:  # later frames: a shifted pattern (ignored by frame-1 truth)
            idx = [(i + f) % n_colors for i in idx]
        stream = idx
        if interlaced:
            stream = []
            for r in gif_interlaced_rows(h):
                stream.extend(idx[r * w:(r + 1) * w])
        lzw = gif_lzw_encode(stream, min_code)
        assert gif_lzw_decode(lzw, min_code, w * h) == stream, "LZW self-check"
        out += bytes((min_code,))
        for i in range(0, len(lzw), 255):
            block = lzw[i:i + 255]
            out += bytes((len(block),)) + block
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


def gif_norm_pixels(w, h, n_colors=16):
    pal = gif_palette(n_colors)
    px = []
    for i in gif_indices(w, h, n_colors):
        px.extend(pal[i])
    return px


# ---------------------------------------------------------------- opaque

def make_blob(n: int) -> bytes:
    return bytes(((i * 197 + 11) % 256) for i in range(n))


# ------------------------------------------- pixel/sample ground truth
# Independent computation of what a pixel-level decoder must produce:
# top-down row-major RGB/gray/RGBA bytes for images, canonical signed
# samples for PCM audio. Mirrors the construction above, NOT the Scala
# decoder under test.

def bmp_norm_pixels(width: int, height: int, top_down: bool = False,
                    perturb: bool = False) -> bytes:
    rows = []
    for y in range(height):  # stored order; stored bytes are (B, G, R)
        row = bytearray()
        for x in range(width):
            b0, b1, b2 = (x * 7 + y * 13) % 256, (x * 3 + y) % 256, (x + y * 5) % 256
            if perturb and (x + 7 * y) % 13 == 0:
                b0 = min(255, b0 + 9)
            row += bytes((b2, b1, b0))  # normalized to RGB
        rows.append(bytes(row))
    if not top_down:
        rows.reverse()  # bottom-up storage: first stored row is the bottom
    return b"".join(rows)


def png_norm_pixels(width: int, height: int, color_type: int) -> bytes:
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    out = bytearray()
    for y in range(height):
        for x in range(width):
            for c in range(channels):
                out.append((x * 11 + y * 17 + c * 29) % 256)
    return bytes(out)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def make_png_filtered(width: int, height: int, color_type: int) -> bytes:
    """Same pixel pattern as make_png, but row y uses filter type y % 5 —
    exercises Sub/Up/Average/Paeth reconstruction in decoders (make_png
    emits only filter 0). Filtering per the W3C spec, independent of the
    decoder under test."""
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    bpp = channels  # 8-bit depth
    stream = bytearray()
    prev = bytes(width * channels)
    for y in range(height):
        row = bytes((x * 11 + y * 17 + c * 29) % 256
                    for x in range(width) for c in range(channels))
        ft = y % 5
        stream.append(ft)
        for i, x in enumerate(row):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                v = x
            elif ft == 1:
                v = (x - a) & 0xFF
            elif ft == 2:
                v = (x - b) & 0xFF
            elif ft == 3:
                v = (x - (a + b) // 2) & 0xFF
            else:
                v = (x - _paeth(a, b, c)) & 0xFF
            stream.append(v)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n"
            + png_chunk(b"IHDR", ihdr)
            + png_chunk(b"IDAT", zlib.compress(bytes(stream), 6))
            + png_chunk(b"IEND", b""))


def _filter_rows(rows, stride, bpp, filtered):
    """Filter a sub-image's rows per the W3C spec (row y -> type y % 5
    when filtered, else 0), independent of the decoder under test."""
    stream = bytearray()
    prev = bytes(stride)
    for y, row in enumerate(rows):
        ft = (y % 5) if filtered else 0
        stream.append(ft)
        for i, x in enumerate(row):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                v = x
            elif ft == 1:
                v = (x - a) & 0xFF
            elif ft == 2:
                v = (x - b) & 0xFF
            elif ft == 3:
                v = (x - (a + b) // 2) & 0xFF
            else:
                v = (x - _paeth(a, b, c)) & 0xFF
            stream.append(v)
        prev = row
    return stream


_ADAM7 = (  # (x_start, y_start, x_step, y_step) per pass
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def make_png_general(width: int, height: int, color_type: int,
                     bit_depth: int = 8, interlace: int = 0,
                     filtered: bool = False, n_colors: int = None) -> bytes:
    """One builder for every layout the reader supports: color types
    0/2/4/6 at depths 8 and 16 (16-bit sample = (pattern<<8)|noise, so
    the HIGH byte is the same pattern png_norm_pixels describes — the
    16->8 reduction ground truth), palette type 3 at depths 1/2/4/8, each
    optionally Adam7-INTERLACED (each pass independently filtered per the
    spec) and optionally per-row filtered."""
    palette = color_type == 3
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    sb = 1 if palette else bit_depth // 8
    n = min(n_colors or (1 << bit_depth), 1 << bit_depth, 256) if palette else 0

    def sample_bytes(x, y, c):
        hi = (x * 11 + y * 17 + c * 29) % 256
        if sb == 1:
            return bytes([hi])
        return bytes([hi, (x * 5 + y * 3 + c) % 256])

    def sub_rows(px, py, pw, ph, xstep, ystep):
        rows = []
        for j in range(ph):
            yy = py + j * ystep
            if palette:
                stride = (pw * bit_depth + 7) // 8
                packed = bytearray(stride)
                for i in range(pw):
                    xx = px + i * xstep
                    v = _palette_idx(xx, yy, n)
                    bitpos = i * bit_depth
                    packed[bitpos // 8] |= v << (8 - bit_depth - (bitpos % 8))
                rows.append(bytes(packed))
            else:
                row = bytearray()
                for i in range(pw):
                    xx = px + i * xstep
                    for c in range(channels):
                        row += sample_bytes(xx, yy, c)
                rows.append(bytes(row))
        return rows

    bpp = 1 if palette else channels * sb
    stream = bytearray()
    if interlace == 0:
        rows = sub_rows(0, 0, width, height, 1, 1)
        stream += _filter_rows(rows, len(rows[0]) if rows else 0, bpp, filtered)
    else:
        for (xs, ys_, xt, yt) in _ADAM7:
            pw = (width - xs + xt - 1) // xt if width > xs else 0
            ph = (height - ys_ + yt - 1) // yt if height > ys_ else 0
            if pw == 0 or ph == 0:
                continue
            rows = sub_rows(xs, ys_, pw, ph, xt, yt)
            stream += _filter_rows(rows, len(rows[0]), bpp, filtered)
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type,
                       0, 0, interlace)
    chunks = (b"\x89PNG\r\n\x1a\n" + png_chunk(b"IHDR", ihdr))
    if palette:
        chunks += png_chunk(b"PLTE", _palette(n))
    return (chunks + png_chunk(b"IDAT", zlib.compress(bytes(stream), 6))
            + png_chunk(b"IEND", b""))


def wav_canonical_samples(channels: int, n_frames: int, bits: int = 16,
                          odd_data: bool = False, perturb: bool = False,
                          fmt_code: int = 1) -> list:
    """Signed canonical samples: 16-bit as stored; 8-bit as stored - 128;
    24/32-bit PCM sign-extended as stored (v<<8 / v<<16 by construction);
    float via floor(f*32767 + 0.5) — the documented half-up rule the
    Scala decoder shares (the product is exact in double, so the two
    sides agree even exactly at .5)."""
    import math
    out = []
    for i in range(n_frames):
        for c in range(channels):
            v = ((i * 37 + c * 101) % 65536) - 32768
            if perturb and c == 0 and i % 7 == 0:
                v = min(32767, v + 900)
            if fmt_code == 3:
                out.append(int(math.floor((v / 32768.0) * 32767.0 + 0.5)))
            elif bits == 16:
                out.append(v)
            elif bits == 8:
                out.append(((v >> 8) + 128) - 128)
            elif bits == 24:
                out.append(v << 8)
            else:
                out.append(v << 16)
    if odd_data:
        out.append(0x7F - 128)
    return out


def sample_checksum(samples: list) -> int:
    c = 7
    for s in samples:
        c = (c * 31 + (s + 32768)) % PRIME
    return c


RESIZE_MAX_DIM = 32


def resize_expect(width: int, height: int, channels: int, px: bytes):
    """Nearest-neighbor resize mirror of Multimodal.resizePixels: integer
    percent scale bounded to RESIZE_MAX_DIM, out dims clamped to >= 1,
    source index = (out_idx * src_dim) // out_dim."""
    ms = max(width, height)
    pct = 100 if ms <= RESIZE_MAX_DIM else (RESIZE_MAX_DIM * 100) // ms
    ow = max(1, (width * pct) // 100)
    oh = max(1, (height * pct) // 100)
    out = bytearray()
    for y in range(oh):
        sy = min(height - 1, (y * height) // oh)
        for x in range(ow):
            sx = min(width - 1, (x * width) // ow)
            for c in range(channels):
                out.append(px[(sy * width + sx) * channels + c])
    return ow, oh, bytes(out)


def phash_expect(width: int, height: int, channels: int, px: bytes):
    """Perceptual-hash mirror of Multimodal.pHashOne: integer grayscale
    (floor mean over channels), nearest-neighbor grids with the SAME
    index arithmetic as the resize mirror, aHash = each 8x8 cell vs the
    floor mean, dHash = horizontal gradient sign on a 9x8 grid. Bit
    (y*8+x), emitted as signed int64."""
    def gray_at(sx, sy):
        base = (sy * width + sx) * channels
        return sum(px[base + c] for c in range(channels)) // channels

    def grid(gw, gh):
        return [[gray_at(min(width - 1, (x * width) // gw),
                         min(height - 1, (y * height) // gh))
                 for x in range(gw)] for y in range(gh)]

    g8 = grid(8, 8)
    mean = sum(v for row in g8 for v in row) // 64
    ah = 0
    for y in range(8):
        for x in range(8):
            if g8[y][x] > mean:
                ah |= 1 << (y * 8 + x)
    g9 = grid(9, 8)
    dh = 0
    for y in range(8):
        for x in range(8):
            if g9[y][x + 1] > g9[y][x]:
                dh |= 1 << (y * 8 + x)

    def signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v
    return mean, signed(ah), signed(dh)


def afp_expect(channels: int, samples: list):
    """Energy-envelope fingerprint mirror of
    Multimodal.audioFingerprintOne: 65 nearest-neighbor windows over the
    sample frames, per-window sum of |sample| over all channels, bit k =
    energy rises from window k to k+1. Signed int64."""
    nf = len(samples) // channels
    F = 65
    energies = [0] * F
    for k in range(F):
        s0 = (k * nf) // F
        s1 = ((k + 1) * nf) // F
        for i in range(s0, s1):
            for c in range(channels):
                energies[k] += abs(samples[i * channels + c])
    fp = 0
    for b in range(64):
        if energies[b + 1] > energies[b]:
            fp |= 1 << b
    if fp >= (1 << 63):
        fp -= 1 << 64
    return nf, sum(energies), fp


def main():
    os.makedirs(OUT, exist_ok=True)
    rows = []
    pixel_rows = []
    resize_rows = []
    phash_rows = []
    afp_rows = []

    def emit(doc_id, ext, media_type, payload, decoder,
             width=None, height=None, n_channels=None, sample_rate=None,
             n_frames=1):
        name = f"media_{doc_id:03d}.{ext}"
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(payload)
        rows.append(dict(doc_id=doc_id, media_type=media_type,
                         decoder=decoder, n_bytes=len(payload),
                         width=width, height=height, n_channels=n_channels,
                         sample_rate=sample_rate, n_frames=n_frames,
                         checksum=checksum(payload)))

    def expect_image(doc_id, decoder, width, height, channels, px):
        pixel_rows.append(dict(
            doc_id=doc_id, decoder=decoder, width=width, height=height,
            n_channels=channels, sample_rate=None, n_units=width * height,
            sum_abs=sum(px), peak=max(px), checksum_px=checksum(px)))
        ow, oh, rpx = resize_expect(width, height, channels, px)
        resize_rows.append(dict(
            doc_id=doc_id, width=width, height=height,
            out_width=ow, out_height=oh,
            sum_resized=sum(rpx), checksum_resized=checksum(rpx)))
        mean, ah, dh = phash_expect(width, height, channels, px)
        phash_rows.append(dict(
            doc_id=doc_id, width=width, height=height,
            gray_mean=mean, ahash=ah, dhash=dh))

    def expect_audio(doc_id, channels, rate, samples):
        pixel_rows.append(dict(
            doc_id=doc_id, decoder="wav", width=None, height=None,
            n_channels=channels, sample_rate=rate,
            n_units=len(samples) // channels,
            sum_abs=sum(abs(s) for s in samples),
            peak=max(abs(s) for s in samples),
            checksum_px=sample_checksum(samples)))
        nf, etot, fp = afp_expect(channels, samples)
        afp_rows.append(dict(
            doc_id=doc_id, n_frames=nf, sample_rate=rate,
            energy_total=etot, afp=fp))

    def expect_stub(doc_id, payload):
        pixel_rows.append(dict(
            doc_id=doc_id, decoder="stub", width=None, height=None,
            n_channels=None, sample_rate=None, n_units=len(payload),
            sum_abs=sum(payload), peak=max(payload),
            checksum_px=checksum(payload)))

    # BMPs (decoder reports channels from bit depth)
    emit(0, "bmp", "image/bmp", make_bmp(13, 7), "bmp", 13, 7, 3)
    expect_image(0, "bmp", 13, 7, 3, bmp_norm_pixels(13, 7))
    emit(1, "bmp", "image/bmp", make_bmp(64, 64), "bmp", 64, 64, 3)
    expect_image(1, "bmp", 64, 64, 3, bmp_norm_pixels(64, 64))
    emit(2, "bmp", "image/bmp", make_bmp(21, 9, top_down=True), "bmp", 21, 9, 3)
    expect_image(2, "bmp", 21, 9, 3, bmp_norm_pixels(21, 9, top_down=True))
    emit(3, "bmp", "image/bmp", make_bmp(1, 1), "bmp", 1, 1, 3)
    expect_image(3, "bmp", 1, 1, 3, bmp_norm_pixels(1, 1))

    # PNGs
    emit(4, "png", "image/png", make_png(16, 12, 2), "png", 16, 12, 3)
    expect_image(4, "png", 16, 12, 3, png_norm_pixels(16, 12, 2))
    emit(5, "png", "image/png", make_png(33, 1, 0), "png", 33, 1, 1)
    expect_image(5, "png", 33, 1, 1, png_norm_pixels(33, 1, 0))
    emit(6, "png", "image/png", make_png(8, 8, 6), "png", 8, 8, 4)
    expect_image(6, "png", 8, 8, 4, png_norm_pixels(8, 8, 6))
    emit(7, "png", "image/png", make_png(640, 2, 2), "png", 640, 2, 3)
    expect_image(7, "png", 640, 2, 3, png_norm_pixels(640, 2, 2))

    # WAVs (width/height null; n_frames = PCM sample frames)
    emit(8, "wav", "audio/wav", make_wav(1, 8000, 800), "wav",
         n_channels=1, sample_rate=8000, n_frames=800)
    expect_audio(8, 1, 8000, wav_canonical_samples(1, 800))
    emit(9, "wav", "audio/wav", make_wav(2, 44100, 441), "wav",
         n_channels=2, sample_rate=44100, n_frames=441)
    expect_audio(9, 2, 44100, wav_canonical_samples(2, 441))
    emit(10, "wav", "audio/wav", make_wav(2, 16000, 160, with_list_chunk=True),
         "wav", n_channels=2, sample_rate=16000, n_frames=160)
    expect_audio(10, 2, 16000, wav_canonical_samples(2, 160))
    emit(11, "wav", "audio/wav", make_wav(1, 22050, 99, bits=8, odd_data=True),
         "wav", n_channels=1, sample_rate=22050, n_frames=100)
    expect_audio(11, 1, 22050, wav_canonical_samples(1, 99, bits=8, odd_data=True))

    # filtered PNGs: every row uses filter y % 5 — pins Sub/Up/Average/Paeth
    # reconstruction against this independent implementation
    emit(12, "png", "image/png", make_png_filtered(24, 10, 2), "png", 24, 10, 3)
    expect_image(12, "png", 24, 10, 3, png_norm_pixels(24, 10, 2))
    emit(13, "png", "image/png", make_png_filtered(9, 6, 0), "png", 9, 6, 1)
    expect_image(13, "png", 9, 6, 1, png_norm_pixels(9, 6, 0))

    # palette (color type 3) PNGs: PLTE expansion at index depths 8/4/1,
    # incl. per-row filters on the PACKED bytes and a short palette
    emit(16, "png", "image/png", make_png_palette(19, 11, 8, filtered=True),
         "png", 19, 11, 3)
    expect_image(16, "png", 19, 11, 3, png_palette_norm_pixels(19, 11, 8))
    emit(17, "png", "image/png", make_png_palette(22, 7, 4, n_colors=13),
         "png", 22, 7, 3)
    expect_image(17, "png", 22, 7, 3, png_palette_norm_pixels(22, 7, 4, n_colors=13))
    emit(18, "png", "image/png", make_png_palette(30, 5, 1, filtered=True),
         "png", 30, 5, 3)
    expect_image(18, "png", 30, 5, 3, png_palette_norm_pixels(30, 5, 1))

    # JPEGs: SOF marker walk yields real dimensions; pixel decode is out
    # of scope (no from-spec DCT), so the pixel table records the stub
    jb = make_jpeg(320, 200, 3)
    emit(19, "jpg", "image/jpeg", jb, "jpeg", 320, 200, 3)
    expect_stub(19, jb)
    jp = make_jpeg(17, 4096, 1, progressive=True)
    emit(20, "jpg", "image/jpeg", jp, "jpeg", 17, 4096, 1)
    expect_stub(20, jp)

    # REAL baseline JPEGs (round 17): pixel decode through the shared
    # integer inverse pipeline (JpegDecoder <-> jpeg_decode_truth) — a
    # grayscale frame and a 4:2:0 color frame with restart markers
    j25, t25 = make_jpeg_real(24, 16, gray=True)
    emit(25, "jpg", "image/jpeg", j25, "jpeg", 24, 16, 1)
    expect_image(25, "jpeg", 24, 16, 1, list(t25))
    j26, t26 = make_jpeg_real(35, 21, subsample=(2, 2), restart=2)
    emit(26, "jpg", "image/jpeg", j26, "jpeg", 35, 21, 3)
    expect_image(26, "jpeg", 35, 21, 3, list(t26))
    # PROGRESSIVE encoding of the same 4:2:0 image: the scan script
    # transmits full precision, so it must decode to media_026's exact
    # pixels — the pixel mirror rows differ only in doc_id
    j27, t27 = make_jpeg_prog(35, 21, subsample=(2, 2))
    assert t27 == t26, "progressive truth must equal the baseline truth"
    emit(27, "jpg", "image/jpeg", j27, "jpeg", 35, 21, 3)
    expect_image(27, "jpeg", 35, 21, 3, list(t27))

    # MP4s: real ISO BMFF box walk — moov/mvhd timescale+duration, tkhd
    # 16.16 dims, track count; pixel decode is out of scope (no entropy
    # decode), so the pixel table records the stub. 21: v0 boxes, a video
    # and a non-visual track. 22: v1 (64-bit) mvhd/tkhd + largesize mdat.
    m21 = make_mp4(1000, 5400, [(320, 240), (0, 0)])
    emit(21, "mp4", "video/mp4", m21, "mp4", 320, 240,
         n_channels=2, sample_rate=1000, n_frames=5400)
    expect_stub(21, m21)
    m22 = make_mp4(90000, 90000 * 7 + 123, [(1920, 1080)], v1=True,
                   large_mdat=True)
    emit(22, "mp4", "video/mp4", m22, "mp4", 1920, 1080,
         n_channels=1, sample_rate=90000, n_frames=90000 * 7 + 123)
    expect_stub(22, m22)

    # planted audio NEAR-DUPLICATE of media_008: every 7th frame nudged
    # +900 — byte-different PCM, 2 envelope-delta bits apart
    emit(24, "wav", "audio/wav", make_wav(1, 8000, 800, perturb=True), "wav",
         n_channels=1, sample_rate=8000, n_frames=800)
    expect_audio(24, 1, 8000, wav_canonical_samples(1, 800, perturb=True))

    # planted perceptual NEAR-DUPLICATE of media_001: byte-different
    # (sparse blue-channel nudges), perceptually the same image — the
    # q_media_neardup pair the pHash banding must recover
    emit(23, "bmp", "image/bmp", make_bmp(64, 64, perturb=True), "bmp", 64, 64, 3)
    expect_image(23, "bmp", 64, 64, 3, bmp_norm_pixels(64, 64, perturb=True))

    # GIFs (round 18): from-spec LZW + palette (+ interlace); media_028 is
    # an animated GIF89a with a GCE whose transparency index is ignored by
    # design — frame 1 is the pixel truth, the frame COUNT surfaces in the
    # metadata mirror like MP4 duration; media_029 exercises the 4-pass
    # interlace + a local (short) palette with no global table
    g28 = make_gif(23, 11, n_colors=16, gce=True, frames=2)
    emit(28, "gif", "image/gif", g28, "gif", 23, 11, 3, n_frames=2)
    expect_image(28, "gif", 23, 11, 3, gif_norm_pixels(23, 11, 16))
    g29 = make_gif(19, 13, n_colors=5, interlaced=True, local_palette=True)
    emit(29, "gif", "image/gif", g29, "gif", 19, 13, 3)
    expect_image(29, "gif", 19, 13, 3, gif_norm_pixels(19, 13, 5))

    # 4-COMPONENT JPEGs (round 19): the web-corpus CMYK shapes. media_030
    # is Adobe CMYK (APP14 transform 0, samples stored inverted, restart
    # markers); media_031 is YCCK (transform 2 — what Photoshop actually
    # writes). Metadata reports the FILE's 4 components; the pixel decode
    # emits 3-channel RGB through the documented quick conversion
    # (R = uC*uK//255 on the inverted-ink values, shared integer math).
    j30, t30 = make_jpeg_cmyk(29, 18, ycck=False, restart=3)
    emit(30, "jpg", "image/jpeg", j30, "jpeg", 29, 18, 4)
    expect_image(30, "jpeg", 29, 18, 3, list(t30))
    j31, t31 = make_jpeg_cmyk(21, 27, ycck=True)
    emit(31, "jpg", "image/jpeg", j31, "jpeg", 21, 27, 4)
    expect_image(31, "jpeg", 21, 27, 3, list(t31))

    # round 20: media_032 is APP14 transform 0 on THREE components — Adobe
    # RGB (Photoshop "save as RGB JPEG"): channels stored as R,G,B with NO
    # YCbCr inverse, here with subsampled channels 1,2 + restarts so the
    # pass-through path also exercises upsampling; media_033 is YCCK at
    # 4:2:0 (Y and K carry 2x2 sampling factors, Cb/Cr 1x1) with odd
    # dimensions and restart markers — the Photoshop corner the r19
    # fixtures didn't sweep.
    j32, t32 = make_jpeg_real(27, 19, subsample=(2, 2), restart=2,
                              adobe_transform=0)
    emit(32, "jpg", "image/jpeg", j32, "jpeg", 27, 19, 3)
    expect_image(32, "jpeg", 27, 19, 3, list(t32))
    j33, t33 = make_jpeg_cmyk(33, 23, ycck=True, restart=3, subsample=(2, 2))
    emit(33, "jpg", "image/jpeg", j33, "jpeg", 33, 23, 4)
    expect_image(33, "jpeg", 33, 23, 3, list(t33))

    # 12-BIT extended sequential (SOF1, round 20): 16-bit DQT entries,
    # DC categories past 11, +2048 level shift with the 4095 clamp,
    # samples reduced to their high 8 bits (the 16-bit-PNG convention,
    # shared with the decoder). media_034 color 4:2:0 + restarts,
    # media_035 grayscale.
    j34, t34 = make_jpeg_real(31, 17, subsample=(2, 2), restart=2,
                              precision=12)
    emit(34, "jpg", "image/jpeg", j34, "jpeg", 31, 17, 3)
    expect_image(34, "jpeg", 31, 17, 3, list(t34))
    j35, t35 = make_jpeg_real(19, 26, gray=True, precision=12)
    emit(35, "jpg", "image/jpeg", j35, "jpeg", 19, 26, 1)
    expect_image(35, "jpeg", 19, 26, 1, list(t35))
    # 12-bit PROGRESSIVE (SOF2): the full scan script transmits full
    # precision, so it must decode identically to the sequential file of
    # the same image — the same invariant the 8-bit pair 026/027 pins
    j36, t36 = make_jpeg_prog(23, 14, subsample=(2, 1), precision=12)
    emit(36, "jpg", "image/jpeg", j36, "jpeg", 23, 14, 3)
    expect_image(36, "jpeg", 23, 14, 3, list(t36))

    # opaque fallback -> stub decode (dims are the documented checksum fiction)
    blob = make_blob(1000)
    c = checksum(blob)
    emit(15, "bin", "application/octet-stream", blob, "stub",
         width=int(64 + c % 512), height=int(64 + (c // 512) % 512),
         n_frames=1000 // 256 + 1)
    expect_stub(15, blob)

    schema = pa.schema([
        ("doc_id", pa.int64()), ("media_type", pa.string()),
        ("decoder", pa.string()), ("n_bytes", pa.int64()),
        ("width", pa.int32()), ("height", pa.int32()),
        ("n_channels", pa.int32()), ("sample_rate", pa.int32()),
        ("n_frames", pa.int64()), ("checksum", pa.int64()),
    ])
    table = pa.Table.from_pylist(rows, schema=schema)
    pq.write_table(table, os.path.join(OUT, "decode_expected.parquet"))

    pixel_schema = pa.schema([
        ("doc_id", pa.int64()), ("decoder", pa.string()),
        ("width", pa.int32()), ("height", pa.int32()),
        ("n_channels", pa.int32()), ("sample_rate", pa.int32()),
        ("n_units", pa.int64()), ("sum_abs", pa.int64()),
        ("peak", pa.int32()), ("checksum_px", pa.int64()),
    ])
    pq.write_table(pa.Table.from_pylist(pixel_rows, schema=pixel_schema),
                   os.path.join(OUT, "pixel_expected.parquet"))

    resize_schema = pa.schema([
        ("doc_id", pa.int64()), ("width", pa.int32()), ("height", pa.int32()),
        ("out_width", pa.int32()), ("out_height", pa.int32()),
        ("sum_resized", pa.int64()), ("checksum_resized", pa.int64()),
    ])
    pq.write_table(pa.Table.from_pylist(resize_rows, schema=resize_schema),
                   os.path.join(OUT, "resize_expected.parquet"))

    phash_schema = pa.schema([
        ("doc_id", pa.int64()), ("width", pa.int32()), ("height", pa.int32()),
        ("gray_mean", pa.int32()), ("ahash", pa.int64()), ("dhash", pa.int64()),
    ])
    pq.write_table(pa.Table.from_pylist(phash_rows, schema=phash_schema),
                   os.path.join(OUT, "phash_expected.parquet"))

    afp_schema = pa.schema([
        ("doc_id", pa.int64()), ("n_frames", pa.int64()),
        ("sample_rate", pa.int32()), ("energy_total", pa.int64()),
        ("afp", pa.int64()),
    ])
    pq.write_table(pa.Table.from_pylist(afp_rows, schema=afp_schema),
                   os.path.join(OUT, "afp_expected.parquet"))
    print(f"wrote {len(rows)} media files + decode/pixel/resize/phash expectations under {OUT}")


def fuzz(outdir: str, seed: int):
    """Seeded randomized media files + EXPECT lines for the differential
    MediaFuzzSpec: random BMP dims/orientation, PNG color types (incl.
    palette depths 1/2/4/8) with per-row random filters, and PCM WAV
    layouts. Each line:
      EXPECT <doc_id> <n_units> <sum_abs> <peak> <checksum_px>
    """
    import numpy as np
    rng = np.random.default_rng(seed)
    os.makedirs(outdir, exist_ok=True)
    doc_id = 0

    def out(ext, payload, n_units, sum_abs, peak, chk):
        nonlocal doc_id
        with open(os.path.join(outdir, f"media_{doc_id:03d}.{ext}"), "wb") as f:
            f.write(payload)
        print(f"EXPECT {doc_id} {n_units} {sum_abs} {peak} {chk}")
        doc_id += 1

    for _ in range(int(rng.integers(2, 5))):  # BMPs
        w, h = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        td = bool(rng.integers(0, 2))
        px = bmp_norm_pixels(w, h, td)
        out("bmp", make_bmp(w, h, td), w * h, sum(px), max(px), checksum(px))
    for _ in range(int(rng.integers(2, 5))):  # non-palette PNGs
        w, h = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        ct = int(rng.choice([0, 2, 4, 6]))
        filt = bool(rng.integers(0, 2))
        payload = (make_png_filtered if filt else make_png)(w, h, ct)
        px = png_norm_pixels(w, h, ct)
        out("png", payload, w * h, sum(px), max(px), checksum(px))
    for _ in range(int(rng.integers(2, 5))):  # 16-bit / interlaced PNGs
        w, h = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        ct = int(rng.choice([0, 2, 4, 6]))
        depth = int(rng.choice([8, 16]))
        inter = int(rng.integers(0, 2))
        filt = bool(rng.integers(0, 2))
        payload = make_png_general(w, h, ct, bit_depth=depth,
                                   interlace=inter, filtered=filt)
        # ground truth: the 16-bit HIGH byte carries the 8-bit pattern,
        # and interlacing only changes the encoding, never the pixels
        px = png_norm_pixels(w, h, ct)
        out("png", payload, w * h, sum(px), max(px), checksum(px))
    for _ in range(int(rng.integers(2, 5))):  # interlaced palette PNGs
        w, h = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        depth = int(rng.choice([1, 2, 4, 8]))
        ncol = int(rng.integers(1, (1 << depth) + 1))
        filt = bool(rng.integers(0, 2))
        payload = make_png_general(w, h, 3, bit_depth=depth, interlace=1,
                                   filtered=filt, n_colors=ncol)
        px = png_palette_norm_pixels(w, h, depth, n_colors=ncol)
        out("png", payload, w * h, sum(px), max(px), checksum(px))
    for _ in range(int(rng.integers(2, 5))):  # palette PNGs
        w, h = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        depth = int(rng.choice([1, 2, 4, 8]))
        ncol = int(rng.integers(1, (1 << depth) + 1))
        filt = bool(rng.integers(0, 2))
        payload = make_png_palette(w, h, depth, filtered=filt, n_colors=ncol)
        px = png_palette_norm_pixels(w, h, depth, n_colors=ncol)
        out("png", payload, w * h, sum(px), max(px), checksum(px))
    for _ in range(int(rng.integers(2, 5))):  # GIFs: LZW + palette forms
        w, h = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        nc = int(rng.integers(2, 257))
        inter = bool(rng.integers(0, 2))
        lp = bool(rng.integers(0, 2))
        fr = int(rng.integers(1, 3))
        gce = bool(rng.integers(0, 2))
        payload = make_gif(w, h, n_colors=nc, interlaced=inter,
                           local_palette=lp, frames=fr, gce=gce)
        px = gif_norm_pixels(w, h, nc)
        out("gif", payload, w * h, sum(px), max(px), checksum(px))
    for _ in range(int(rng.integers(2, 5))):  # real baseline JPEGs
        w, h = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        kind = int(rng.integers(0, 4))
        gray = kind == 0
        sub = (1, 1) if gray else [(1, 1), (2, 2), (2, 1)][kind - 1]
        rst = int(rng.choice([0, 0, 2, 4]))
        payload, truth = make_jpeg_real(w, h, gray=gray, subsample=sub,
                                        restart=rst)
        out("jpg", payload, w * h, sum(truth), max(truth), checksum(truth))
    for _ in range(int(rng.integers(2, 5))):  # 4-component CMYK/YCCK JPEGs
        w, h = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        kind = int(rng.integers(0, 3))  # 0 Adobe CMYK, 1 YCCK, 2 bare CMYK
        rst = int(rng.choice([0, 0, 2, 4]))
        # YCCK additionally sweeps subsampled Cb/Cr (the 4:2:0/4:2:2
        # Photoshop shapes) — always with the DRI/restart dice above
        sub = ([(1, 1), (2, 2), (2, 1)][int(rng.integers(0, 3))]
               if kind == 1 else (1, 1))
        payload, truth = make_jpeg_cmyk(w, h, ycck=kind == 1, restart=rst,
                                        adobe=kind != 2, subsample=sub)
        out("jpg", payload, w * h, sum(truth), max(truth), checksum(truth))
    for _ in range(int(rng.integers(2, 5))):  # APP14 transform-0 RGB JPEGs
        w, h = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        sub = [(1, 1), (2, 2), (2, 1)][int(rng.integers(0, 3))]
        rst = int(rng.choice([0, 0, 2, 4]))
        payload, truth = make_jpeg_real(w, h, subsample=sub, restart=rst,
                                        adobe_transform=0)
        out("jpg", payload, w * h, sum(truth), max(truth), checksum(truth))
    for _ in range(int(rng.integers(2, 5))):  # 12-bit SOF1/SOF2 JPEGs
        w, h = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        kind = int(rng.integers(0, 4))
        gray = kind == 0
        sub = (1, 1) if gray else [(1, 1), (2, 2), (2, 1)][kind - 1]
        if bool(rng.integers(0, 2)):
            payload, truth = make_jpeg_prog(w, h, gray=gray, subsample=sub,
                                            precision=12)
        else:
            rst = int(rng.choice([0, 0, 2, 4]))
            payload, truth = make_jpeg_real(w, h, gray=gray, subsample=sub,
                                            restart=rst, precision=12)
        out("jpg", payload, w * h, sum(truth), max(truth), checksum(truth))
    for _ in range(int(rng.integers(2, 5))):  # PROGRESSIVE JPEGs: the
        # scan script transmits full precision, so the truth is the
        # baseline decode of the same image
        w, h = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        kind = int(rng.integers(0, 4))
        gray = kind == 0
        sub = (1, 1) if gray else [(1, 1), (2, 2), (2, 1)][kind - 1]
        payload, truth = make_jpeg_prog(w, h, gray=gray, subsample=sub)
        out("jpg", payload, w * h, sum(truth), max(truth), checksum(truth))
    for _ in range(int(rng.integers(2, 5))):  # WAVs
        ch = int(rng.integers(1, 3))
        fmt_code = int(rng.choice([1, 1, 3]))  # PCM twice as likely
        bits = (int(rng.choice([32, 64])) if fmt_code == 3
                else int(rng.choice([8, 16, 24, 32])))
        ext = bool(rng.integers(0, 2))
        nf = int(rng.integers(1, 400))
        rate = int(rng.choice([8000, 16000, 44100]))
        lst = bool(rng.integers(0, 2))
        odd = fmt_code == 1 and bits == 8 and ch == 1 and bool(rng.integers(0, 2))
        payload = make_wav(ch, rate, nf, bits=bits, with_list_chunk=lst,
                           odd_data=odd, fmt_code=fmt_code, extensible=ext)
        samples = wav_canonical_samples(ch, nf, bits=bits, odd_data=odd,
                                        fmt_code=fmt_code)
        out("wav", payload, len(samples) // ch,
            sum(abs(s) for s in samples), max(abs(s) for s in samples),
            sample_checksum(samples))
    for _ in range(int(rng.integers(2, 5))):  # MP4s (metadata decode)
        ts = int(rng.choice([600, 1000, 90000]))
        dur = int(rng.integers(0, 10 ** 7))
        v1 = bool(rng.integers(0, 2))
        large = bool(rng.integers(0, 2))
        ntr = int(rng.integers(1, 4))
        dims = [((int(rng.integers(1, 4000)), int(rng.integers(1, 4000)))
                 if rng.integers(0, 2) else (0, 0)) for _ in range(ntr)]
        payload = make_mp4(ts, dur, dims, v1=v1, large_mdat=large)
        first = next(((w, h) for w, h in dims if w > 0 and h > 0), None)
        w, h = first if first else (-1, -1)
        # the pixel sweep sees the stub path (raw payload stats); the
        # MEXPECT line pins the real metadata decode
        out("mp4", payload, len(payload), sum(payload), max(payload),
            checksum(payload))
        print(f"MEXPECT {doc_id - 1} {w} {h} {ntr} {ts} {dur}")
    print(f"WROTE {doc_id} files to {outdir}")


# ------------------------------------------------------- real baseline JPEG
# A from-spec baseline sequential JPEG ENCODER (Annex K tables) plus the
# ground-truth DECODE of its own output — the differential counterpart of
# the Scala JpegDecoder. The lossy forward path (float DCT + quantize) is
# encoder-side only; ground truth re-derives pixels from the QUANTIZED
# coefficients through the same integer inverse pipeline the Scala side
# implements: the shared 13-bit fixed-point IDCT basis and the shared
# integer YCbCr->RGB constants, so both sides agree to the bit with no
# libm in either.

JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]

# shared fixed-point IDCT basis: B[u][x] = round((c(u)/2)*cos((2x+1)u*pi/16)*2^13)
JPEG_IDCT_B = [
    [2896, 2896, 2896, 2896, 2896, 2896, 2896, 2896],
    [4017, 3406, 2276, 799, -799, -2276, -3406, -4017],
    [3784, 1567, -1567, -3784, -3784, -1567, 1567, 3784],
    [3406, -799, -4017, -2276, 2276, 4017, 799, -3406],
    [2896, -2896, -2896, 2896, 2896, -2896, -2896, 2896],
    [2276, -4017, 799, 3406, -3406, -799, 4017, -2276],
    [1567, -3784, 3784, -1567, -1567, 3784, -3784, 1567],
    [799, -2276, 3406, -4017, 4017, -3406, 2276, -799]]

# Annex K quantization tables (luminance, chrominance), natural order
JPEG_QL = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99]
JPEG_QC = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99]

# Annex K huffman tables: (bits[1..16], values)
JPEG_HUFF = {
    ("dc", 0): ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12))),
    ("dc", 1): ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12))),
    ("ac", 0): ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
                [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
                 0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
                 0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
                 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
                 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
                 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
                 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
                 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
                 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
                 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
                 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
                 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
                 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
                 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
                 0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
                 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
                 0xF9, 0xFA]),
    ("ac", 1): ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
                [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
                 0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
                 0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
                 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
                 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
                 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
                 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
                 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
                 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
                 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
                 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
                 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
                 0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
                 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
                 0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
                 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
                 0xF9, 0xFA])}


def _huff_codes(bits, vals):
    """Canonical huffman: value -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _JpegBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def pad(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-fill per spec


def _fdct_quant(block, qtab):
    """Float forward DCT of a level-shifted 8x8 block, quantized to ints
    in natural order (encoder-side only — lossy by design)."""
    import math as _m
    F = [[0.0] * 8 for _ in range(8)]
    for v in range(8):
        for u in range(8):
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += (block[y][x] *
                          _m.cos((2 * x + 1) * u * _m.pi / 16) *
                          _m.cos((2 * y + 1) * v * _m.pi / 16))
            cu = (1 / _m.sqrt(2)) if u == 0 else 1.0
            cv = (1 / _m.sqrt(2)) if v == 0 else 1.0
            F[v][u] = s * cu * cv / 4.0
    return [int(round(F[i // 8][i % 8] / qtab[i])) for i in range(64)]


def _jpeg_rgb(x, y, c):
    return (x * 11 + y * 17 + c * 29) % 256


def _jpeg_box_subsample(plane, width, height, sh, sv):
    """Box-average a full-resolution plane down by (sh, sv)."""
    cw = (width + sh - 1) // sh
    ch = (height + sv - 1) // sv
    out = []
    for j in range(ch):
        row = []
        for i in range(cw):
            acc, cnt = 0, 0
            for dj in range(sv):
                for di in range(sh):
                    yy, xx = j * sv + dj, i * sh + di
                    if yy < height and xx < width:
                        acc += plane[yy][xx]
                        cnt += 1
            row.append(round(acc / cnt))
        out.append(row)
    return out


def _jpeg_px12(x, y, c):
    return (x * 211 + y * 337 + c * 419) % 4096


def make_jpeg_real(width, height, gray=False, subsample=(1, 1), restart=0,
                   adobe_transform=None, precision=8):
    """Baseline sequential JPEG of the house pixel pattern. subsample =
    (h, v) chroma sampling divisors (1,1)=4:4:4, (2,2)=4:2:0, (2,1)=4:2:2.
    adobe_transform writes an APP14 Adobe marker with that transform code;
    transform 0 on 3 components means the channels are stored as R,G,B
    DIRECTLY (Photoshop "save as RGB JPEG") — no YCbCr forward transform
    and a pass-through inverse in the truth. Returns (bytes, ground-truth
    pixel array) where the ground truth is the decode of the QUANTIZED
    stream through the shared integer inverse pipeline (see
    jpeg_decode_truth)."""
    assert precision in (8, 12)
    sh, sv = (1, 1) if gray else subsample
    comps = 1 if gray else 3
    rgb_direct = (not gray) and adobe_transform == 0
    px = _jpeg_px12 if precision == 12 else _jpeg_rgb
    smax = (1 << precision) - 1
    mid = 1 << (precision - 1)
    # component planes in YCbCr (float rounded to int per JFIF)
    if gray:
        planes = [[[px(x, y, 0) for x in range(width)]
                   for y in range(height)]]
    elif rgb_direct:
        # channels stored as-is; channels 1,2 still ride the "chroma"
        # sampling factors (legal, exercises the upsample path on RGB)
        ys = [[px(x, y, 0) for x in range(width)] for y in range(height)]
        cbs = [[px(x, y, 1) for x in range(width)] for y in range(height)]
        crs = [[px(x, y, 2) for x in range(width)] for y in range(height)]
    else:
        ys, cbs, crs = [], [], []
        for y in range(height):
            ry, rcb, rcr = [], [], []
            for x in range(width):
                r, g, b = (px(x, y, 0), px(x, y, 1), px(x, y, 2))
                ry.append(min(smax, max(0, round(0.299 * r + 0.587 * g + 0.114 * b))))
                rcb.append(min(smax, max(0, round(mid - 0.168736 * r
                                                  - 0.331264 * g + 0.5 * b))))
                rcr.append(min(smax, max(0, round(mid + 0.5 * r - 0.418688 * g
                                                  - 0.081312 * b))))
            ys.append(ry)
            cbs.append(rcb)
            crs.append(rcr)
    if not gray:
        # box-average chroma subsample (channels 1,2 in either color space)
        planes = [ys,
                  _jpeg_box_subsample(cbs, width, height, sh, sv),
                  _jpeg_box_subsample(crs, width, height, sh, sv)]

    # sampling factors per component: Y gets (sh, sv), chroma (1, 1)
    sf = [(sh, sv)] + [(1, 1)] * (comps - 1) if not gray else [(1, 1)]
    hmax = max(f[0] for f in sf)
    vmax = max(f[1] for f in sf)
    qsel = [0] + [1] * (comps - 1)
    qtabs = [JPEG_QL, JPEG_QC]

    # per-component padded dims + quantized blocks
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    qblocks = [dict() for _ in range(comps)]  # (bx, by) -> 64 ints
    for ci in range(comps):
        h, v = sf[ci]
        pw, ph = mcux * 8 * h, mcuy * 8 * v
        plane = planes[ci]
        rows = len(plane)
        cols = len(plane[0]) if rows else 0
        for by in range(ph // 8):
            for bx in range(pw // 8):
                blk = [[0] * 8 for _ in range(8)]
                for yy in range(8):
                    for xx in range(8):
                        py = min(by * 8 + yy, rows - 1)
                        pxx = min(bx * 8 + xx, cols - 1)
                        blk[yy][xx] = plane[py][pxx] - mid
                qblocks[ci][(bx, by)] = _fdct_quant(blk, qtabs[qsel[ci]])

    # entropy encode, MCU-interleaved
    dcc = [_huff_codes(*JPEG_HUFF[("dc", 0)]), _huff_codes(*JPEG_HUFF[("dc", 1)])]
    acc_ = [_huff_codes(*JPEG_HUFF[("ac", 0)]), _huff_codes(*JPEG_HUFF[("ac", 1)])]
    hsel = [0] + [1] * (comps - 1)
    w = _JpegBitWriter()
    pred = [0] * comps
    mcu_i = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_i and mcu_i % restart == 0:
                w.pad()
                w.out += bytes((0xFF, 0xD0 + rst))
                rst = (rst + 1) % 8
                pred = [0] * comps
            mcu_i += 1
            for ci in range(comps):
                h, v = sf[ci]
                for dy in range(v):
                    for dx in range(h):
                        blk = qblocks[ci][(mx * h + dx, my * v + dy)]
                        zz = [blk[JPEG_ZIGZAG[k]] for k in range(64)]
                        diff = zz[0] - pred[ci]
                        pred[ci] = zz[0]
                        s = abs(diff).bit_length()
                        code, ln = dcc[hsel[ci]][s]
                        w.put(code, ln)
                        if s:
                            w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
                        run = 0
                        for k in range(1, 64):
                            if zz[k] == 0:
                                run += 1
                                continue
                            while run >= 16:
                                code, ln = acc_[hsel[ci]][0xF0]
                                w.put(code, ln)
                                run -= 16
                            s = abs(zz[k]).bit_length()
                            code, ln = acc_[hsel[ci]][(run << 4) | s]
                            w.put(code, ln)
                            w.put(zz[k] if zz[k] >= 0 else zz[k] + (1 << s) - 1, s)
                            run = 0
                        if run:
                            code, ln = acc_[hsel[ci]][0x00]
                            w.put(code, ln)
    w.pad()
    # generator self-check: an independent bit-level huffman decode of the
    # entropy stream must reproduce every quantized block (the aec_decode_py
    # discipline — no JPEG library exists in this environment, so the
    # encoder proves its own stream before the fixture ships)
    _jpeg_entropy_check(bytes(w.out), qblocks, sf, qsel, hsel, comps,
                        mcux, mcuy, restart)

    def seg(marker, payload):
        return bytes((0xFF, marker)) + struct.pack(">H", 2 + len(payload)) + payload
    out = b"\xFF\xD8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    if adobe_transform is not None:
        # APP14: tag, DCTEncodeVersion, flags0, flags1, transform
        out += seg(0xEE, b"Adobe" + struct.pack(">HHHB", 100, 0, 0,
                                                adobe_transform))
    def dqt_seg(tq, tab):
        if precision == 12:  # Pq=1: 16-bit entries (T.81 requires for 12-bit)
            return seg(0xDB, bytes([0x10 | tq]) +
                       b"".join(struct.pack(">H", tab[JPEG_ZIGZAG[k]])
                                for k in range(64)))
        return seg(0xDB, bytes([tq]) + bytes(tab[JPEG_ZIGZAG[k]]
                                             for k in range(64)))
    out += dqt_seg(0, JPEG_QL)
    if comps > 1:
        out += dqt_seg(1, JPEG_QC)
    sof = struct.pack(">BHHB", precision, height, width, comps)
    for ci in range(comps):
        sof += struct.pack(">BBB", ci + 1, (sf[ci][0] << 4) | sf[ci][1], qsel[ci])
    # 12-bit rides SOF1 (extended sequential); baseline SOF0 is 8-bit only
    out += seg(0xC1 if precision == 12 else 0xC0, sof)
    for (kind, tid), (bits, vals) in JPEG_HUFF.items():
        if comps == 1 and tid == 1:
            continue
        tc = 0 if kind == "dc" else 1
        out += seg(0xC4, bytes([(tc << 4) | tid] + bits) + bytes(vals))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = struct.pack(">B", comps)
    for ci in range(comps):
        sos += struct.pack(">BB", ci + 1, (hsel[ci] << 4) | hsel[ci])
    sos += bytes((0, 63, 0))
    out += seg(0xDA, sos)
    out += bytes(w.out) + b"\xFF\xD9"

    truth = jpeg_decode_truth(qblocks, sf, qsel, width, height, comps,
                              mcux, mcuy, rgb_direct=rgb_direct,
                              precision=precision)
    return out, truth


def _jpeg_entropy_check(stream, qblocks, sf, qsel, hsel, comps, mcux, mcuy,
                        restart):
    """Decode the stuffed entropy stream with table-walk huffman (an
    implementation independent of the writer above) and assert every
    quantized coefficient round-trips."""
    # value -> (code, len) inverted to (len, code) -> value
    dec = {}
    for (kind, tid), (bits, vals) in JPEG_HUFF.items():
        table = {}
        for v, (code, ln) in _huff_codes(bits, vals).items():
            table[(ln, code)] = v
        dec[(kind, tid)] = table

    pos = 0      # bit position
    data = stream

    def read_bit():
        nonlocal pos
        byte_i = pos >> 3
        b = data[byte_i]
        # skip stuffed 0x00 after 0xFF transparently via pre-scan below
        bit = (b >> (7 - (pos & 7))) & 1
        pos += 1
        return bit

    # unstuff + split at restart markers first (simpler than inline)
    segments = []
    cur = bytearray()
    i = 0
    while i < len(data):
        if data[i] == 0xFF and i + 1 < len(data):
            nxt = data[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(data[i])
        i += 1
    segments.append(bytes(cur))

    def huff_read(table, seg, state):
        code, ln = 0, 0
        while ln <= 16:
            byte_i = state[0] >> 3
            bit = (seg[byte_i] >> (7 - (state[0] & 7))) & 1
            state[0] += 1
            code = (code << 1) | bit
            ln += 1
            if (ln, code) in table:
                return table[(ln, code)]
        raise AssertionError("huffman walk exceeded 16 bits")

    def bits_read(seg, state, n):
        v = 0
        for _ in range(n):
            byte_i = state[0] >> 3
            v = (v << 1) | ((seg[byte_i] >> (7 - (state[0] & 7))) & 1)
            state[0] += 1
        return v

    def extend(v, s):
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    mcu_per_seg = restart if restart else mcux * mcuy
    mcu_i = 0
    seg_i = 0
    state = [0]
    pred = [0] * comps
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_i and mcu_i % restart == 0:
                seg_i += 1
                state = [0]
                pred = [0] * comps
            mcu_i += 1
            seg = segments[seg_i]
            for ci in range(comps):
                h, v = sf[ci]
                for dy in range(v):
                    for dx in range(h):
                        want = qblocks[ci][(mx * h + dx, my * v + dy)]
                        zz = [0] * 64
                        s_ = huff_read(dec[("dc", hsel[ci])], seg, state)
                        diff = extend(bits_read(seg, state, s_), s_) if s_ else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = huff_read(dec[("ac", hsel[ci])], seg, state)
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            s_ = rs & 0xF
                            zz[k] = extend(bits_read(seg, state, s_), s_)
                            k += 1
                        got = [zz[k] for k in range(64)]
                        exp = [want[JPEG_ZIGZAG[k]] for k in range(64)]
                        assert got == exp, (mx, my, ci, got[:8], exp[:8])


def jpeg_decode_truth(qblocks, sf, qsel, width, height, comps, mcux, mcuy,
                      rgb_direct=False, precision=8):
    """The shared integer inverse pipeline: dequant -> 13-bit fixed IDCT
    (JPEG_IDCT_B) -> level shift (+128, or +2048 clamped to 4095 and
    reduced to the high 8 bits for 12-bit frames) -> nearest upsample ->
    integer YCbCr->RGB (or pass-through when rgb_direct: the
    APP14-transform-0 RGB shape). Returns top-down row-major gray or RGB
    bytes (the Scala decoder's contract)."""
    qtabs = [JPEG_QL, JPEG_QC]
    hmax = max(f[0] for f in sf)
    vmax = max(f[1] for f in sf)
    planes = []
    for ci in range(comps):
        h, v = sf[ci]
        pw, ph = mcux * 8 * h, mcuy * 8 * v
        plane = [[0] * pw for _ in range(ph)]
        for (bx, by), blk in qblocks[ci].items():
            deq = [blk[k] * qtabs[qsel[ci]][k] for k in range(64)]
            for y in range(8):
                for x in range(8):
                    acc = 0
                    for u in range(8):
                        for v2 in range(8):
                            acc += (deq[v2 * 8 + u] * JPEG_IDCT_B[u][x]
                                    * JPEG_IDCT_B[v2][y])
                    p = ((acc + (1 << 25)) >> 26) + (1 << (precision - 1))
                    p = min((1 << precision) - 1, max(0, p))
                    plane[by * 8 + y][bx * 8 + x] = p >> (precision - 8)
        planes.append(plane)
    out = bytearray()
    for y in range(height):
        for x in range(width):
            if comps == 1:
                out.append(planes[0][y][x])
            else:
                # nearest upsample by the component's sampling ratio
                def samp(ci):
                    h, v = sf[ci]
                    return planes[ci][y * v // vmax][x * h // hmax]
                if rgb_direct:
                    out += bytes((samp(0), samp(1), samp(2)))
                else:
                    yy, cb, cr = samp(0), samp(1), samp(2)
                    r = yy + ((91881 * (cr - 128) + 32768) >> 16)
                    g = yy - ((22554 * (cb - 128) + 46802 * (cr - 128) + 32768) >> 16)
                    b = yy + ((116130 * (cb - 128) + 32768) >> 16)
                    out += bytes((min(255, max(0, r)), min(255, max(0, g)),
                                  min(255, max(0, b))))
    return bytes(out)


# -------------------------------------------------------- CMYK / YCCK JPEG
def _jpeg_ink(x, y, c):
    return (x * 7 + y * 23 + c * 41) % 256


def make_jpeg_cmyk(width, height, ycck=False, restart=0, adobe=True,
                   subsample=(1, 1)):
    """4-component JPEG (the Photoshop web-corpus shape): Adobe APP14 with
    transform 0 (CMYK, samples stored INVERTED per the Adobe convention)
    or transform 2 (YCCK: the inverted CMY channels ride the YCbCr forward
    transform, K passes through inverted). `adobe=False` writes a bare
    4-component file (no APP14): samples are then plain non-inverted CMYK.
    `subsample` (YCCK only) subsamples the Cb/Cr channels exactly like the
    3-component case — Y and K keep the max sampling factors, the
    Photoshop 4:2:0 YCCK shape. Returns (bytes, RGB ground truth) where
    the truth is the decode of the quantized stream through the shared
    integer pipeline plus the documented quick CMYK->RGB conversion
    (R = uC*uK//255 on the inverted-ink values) — embedded identically in
    JpegDecoder."""
    assert not (ycck and not adobe), "YCCK requires the Adobe marker"
    assert subsample == (1, 1) or ycck, "only YCCK subsamples"
    sh, sv = subsample
    comps = 4
    # stored planes (what the entropy stream encodes)
    inks = [[[_jpeg_ink(x, y, c) for x in range(width)] for y in range(height)]
            for c in range(4)]
    if ycck:
        planes = [None, None, None, None]
        ys_, cbs, crs = [], [], []
        for y in range(height):
            ry, rcb, rcr = [], [], []
            for x in range(width):
                # inverted CMY looks like RGB; standard forward transform
                r, g, b = (255 - inks[0][y][x], 255 - inks[1][y][x],
                           255 - inks[2][y][x])
                ry.append(min(255, max(0, round(0.299 * r + 0.587 * g + 0.114 * b))))
                rcb.append(min(255, max(0, round(128 - 0.168736 * r
                                                 - 0.331264 * g + 0.5 * b))))
                rcr.append(min(255, max(0, round(128 + 0.5 * r - 0.418688 * g
                                                 - 0.081312 * b))))
            ys_.append(ry)
            cbs.append(rcb)
            crs.append(rcr)
        planes = [ys_,
                  _jpeg_box_subsample(cbs, width, height, sh, sv),
                  _jpeg_box_subsample(crs, width, height, sh, sv),
                  [[255 - inks[3][y][x] for x in range(width)]
                   for y in range(height)]]
    elif adobe:
        planes = [[[255 - inks[c][y][x] for x in range(width)]
                   for y in range(height)] for c in range(4)]
    else:
        planes = [[[inks[c][y][x] for x in range(width)]
                   for y in range(height)] for c in range(4)]

    # Y and K ride the max sampling factors, Cb/Cr stay (1,1) — so the
    # stored Cb/Cr planes are the subsampled ones (identity when 4:4:4)
    sf = [(sh, sv), (1, 1), (1, 1), (sh, sv)]
    qsel = [0, 1, 1, 1]
    hsel = [0, 1, 1, 1]
    qtabs = [JPEG_QL, JPEG_QC]
    mcux = (width + 8 * sh - 1) // (8 * sh)
    mcuy = (height + 8 * sv - 1) // (8 * sv)
    qblocks = [dict() for _ in range(comps)]
    for ci in range(comps):
        h, v = sf[ci]
        pw, ph = mcux * 8 * h, mcuy * 8 * v
        plane = planes[ci]
        rows = len(plane)
        cols = len(plane[0]) if rows else 0
        for by in range(ph // 8):
            for bx in range(pw // 8):
                blk = [[0] * 8 for _ in range(8)]
                for yy in range(8):
                    for xx in range(8):
                        py = min(by * 8 + yy, rows - 1)
                        px = min(bx * 8 + xx, cols - 1)
                        blk[yy][xx] = plane[py][px] - 128
                qblocks[ci][(bx, by)] = _fdct_quant(blk, qtabs[qsel[ci]])

    dcc = [_huff_codes(*JPEG_HUFF[("dc", 0)]), _huff_codes(*JPEG_HUFF[("dc", 1)])]
    acc_ = [_huff_codes(*JPEG_HUFF[("ac", 0)]), _huff_codes(*JPEG_HUFF[("ac", 1)])]
    w = _JpegBitWriter()
    pred = [0] * comps
    mcu_i = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_i and mcu_i % restart == 0:
                w.pad()
                w.out += bytes((0xFF, 0xD0 + rst))
                rst = (rst + 1) % 8
                pred = [0] * comps
            mcu_i += 1
            for ci in range(comps):
                h, v = sf[ci]
                for dy in range(v):
                    for dx in range(h):
                        blk = qblocks[ci][(mx * h + dx, my * v + dy)]
                        zz = [blk[JPEG_ZIGZAG[k]] for k in range(64)]
                        diff = zz[0] - pred[ci]
                        pred[ci] = zz[0]
                        s = abs(diff).bit_length()
                        code, ln = dcc[hsel[ci]][s]
                        w.put(code, ln)
                        if s:
                            w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
                        run = 0
                        for k in range(1, 64):
                            if zz[k] == 0:
                                run += 1
                                continue
                            while run >= 16:
                                code, ln = acc_[hsel[ci]][0xF0]
                                w.put(code, ln)
                                run -= 16
                            s = abs(zz[k]).bit_length()
                            code, ln = acc_[hsel[ci]][(run << 4) | s]
                            w.put(code, ln)
                            w.put(zz[k] if zz[k] >= 0 else zz[k] + (1 << s) - 1, s)
                            run = 0
                        if run:
                            code, ln = acc_[hsel[ci]][0x00]
                            w.put(code, ln)
    w.pad()
    _jpeg_entropy_check(bytes(w.out), qblocks, sf, qsel, hsel, comps,
                        mcux, mcuy, restart)

    def seg(marker, payload):
        return bytes((0xFF, marker)) + struct.pack(">H", 2 + len(payload)) + payload
    out = b"\xFF\xD8"
    if adobe:  # APP14: tag, DCTEncodeVersion, flags0, flags1, transform
        out += seg(0xEE, b"Adobe" + struct.pack(">HHHB", 100, 0, 0,
                                                2 if ycck else 0))
    out += seg(0xDB, bytes([0]) + bytes(JPEG_QL[JPEG_ZIGZAG[k]] for k in range(64)))
    out += seg(0xDB, bytes([1]) + bytes(JPEG_QC[JPEG_ZIGZAG[k]] for k in range(64)))
    sof = struct.pack(">BHHB", 8, height, width, comps)
    for ci in range(comps):
        sof += struct.pack(">BBB", ci + 1, (sf[ci][0] << 4) | sf[ci][1],
                           qsel[ci])
    out += seg(0xC0, sof)
    for (kind, tid), (bits, vals) in JPEG_HUFF.items():
        tc = 0 if kind == "dc" else 1
        out += seg(0xC4, bytes([(tc << 4) | tid] + bits) + bytes(vals))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = struct.pack(">B", comps)
    for ci in range(comps):
        sos += struct.pack(">BB", ci + 1, (hsel[ci] << 4) | hsel[ci])
    sos += bytes((0, 63, 0))
    out += seg(0xDA, sos)
    out += bytes(w.out) + b"\xFF\xD9"

    truth = jpeg_cmyk_truth(qblocks, qsel, width, height, mcux, mcuy,
                            ycck=ycck, adobe=adobe, sf=sf)
    return out, truth


def jpeg_cmyk_truth(qblocks, qsel, width, height, mcux, mcuy, ycck, adobe,
                    sf=None):
    """Shared integer inverse pipeline for the 4-component case: dequant ->
    13-bit IDCT -> +128 clamp -> nearest upsample by the component's
    sampling ratio, then the inverted-ink resolution (YCCK -> fixed-point
    YCbCr inverse; Adobe CMYK -> stored; bare CMYK -> 255-s) and the quick
    conversion R = uC*uK//255."""
    if sf is None:
        sf = [(1, 1)] * 4
    hmax = max(f[0] for f in sf)
    vmax = max(f[1] for f in sf)
    qtabs = [JPEG_QL, JPEG_QC]
    planes = []
    for ci in range(4):
        h, v = sf[ci]
        plane = [[0] * (mcux * 8 * h) for _ in range(mcuy * 8 * v)]
        for (bx, by), blk in qblocks[ci].items():
            deq = [blk[k] * qtabs[qsel[ci]][k] for k in range(64)]
            for y in range(8):
                for x in range(8):
                    acc = 0
                    for u in range(8):
                        for v2 in range(8):
                            acc += (deq[v2 * 8 + u] * JPEG_IDCT_B[u][x]
                                    * JPEG_IDCT_B[v2][y])
                    p = ((acc + (1 << 25)) >> 26) + 128
                    plane[by * 8 + y][bx * 8 + x] = min(255, max(0, p))
        planes.append(plane)

    def samp(ci, y, x):
        h, v = sf[ci]
        return planes[ci][y * v // vmax][x * h // hmax]
    out = bytearray()
    for y in range(height):
        for x in range(width):
            if ycck:
                yy, cb, cr = (samp(0, y, x), samp(1, y, x) - 128,
                              samp(2, y, x) - 128)
                uc = yy + ((91881 * cr + 32768) >> 16)
                um = yy - ((22554 * cb + 46802 * cr + 32768) >> 16)
                uy = yy + ((116130 * cb + 32768) >> 16)
                uc, um, uy = (min(255, max(0, v)) for v in (uc, um, uy))
                uk = samp(3, y, x)
            elif adobe:
                uc, um, uy, uk = (samp(c, y, x) for c in range(4))
            else:
                uc, um, uy, uk = (255 - samp(c, y, x) for c in range(4))
            out += bytes((uc * uk // 255, um * uk // 255, uy * uk // 255))
    return bytes(out)


# ----------------------------------------------------- progressive JPEG
# PROGRESSIVE (SOF2) encoder over the same quantized blocks as
# make_jpeg_real, with a scan script exercising every progressive decode
# path: interleaved DC first (Al=1) + DC refinement, per-component AC
# spectral-selection bands with successive approximation (Al=1, EOB
# runs), and AC refinement scans (correction bits). The script transmits
# EVERY bit, so the file decodes to the IDENTICAL pixel array as the
# baseline encoding of the same image — the ground truth is shared.

# progressive AC table: the Annex K sequential AC tables carry no EOBn
# (r<<4, s=0, r>=1) symbols, so progressive scans need their own. A
# flat-length canonical table over every symbol a progressive AC scan can
# emit (EOB0..EOB14, ZRL, and (run,size) for size 1..10) is legal and
# trivially canonical: 176 symbols, all 8-bit codes.
JPEG_PROG_AC_SYMS = ([r << 4 for r in range(15)] + [0xF0] +
                     [(r << 4) | s for r in range(16) for s in range(1, 11)])
JPEG_HUFF_PROG_AC = ([0] * 7 + [len(JPEG_PROG_AC_SYMS)] + [0] * 8,
                     sorted(JPEG_PROG_AC_SYMS))


def _prog_scan_script(comps):
    # (kind, comp_indices, Ss, Se, Ah, Al)
    scans = [("dc_first", list(range(comps)), 0, 0, 0, 1),
             ("dc_refine", list(range(comps)), 0, 0, 1, 0)]
    for ci in range(comps):
        scans.append(("ac_first", [ci], 1, 5, 0, 1))
        scans.append(("ac_first", [ci], 6, 63, 0, 1))
    for ci in range(comps):
        scans.append(("ac_refine", [ci], 1, 63, 1, 0))
    return scans


def make_jpeg_prog(width, height, gray=False, subsample=(1, 1), precision=8):
    sh, sv = (1, 1) if gray else subsample
    comps = 1 if gray else 3
    base, truth = make_jpeg_real(width, height, gray=gray, subsample=subsample,
                                 precision=precision)
    # recompute the quantized blocks exactly as make_jpeg_real does
    qb, sf, qsel, mcux, mcuy = _jpeg_planes_qblocks(width, height, gray,
                                                    (sh, sv), precision)
    hmax = max(f[0] for f in sf)
    vmax = max(f[1] for f in sf)
    # per-component ceil-dims block counts (non-interleaved AC scans)
    cbw, cbh = [], []
    for ci in range(comps):
        cw = (width * sf[ci][0] + hmax - 1) // hmax
        ch = (height * sf[ci][1] + vmax - 1) // vmax
        cbw.append((cw + 7) // 8)
        cbh.append((ch + 7) // 8)
    hsel = [0] + [1] * (comps - 1)
    dcc = [_huff_codes(*JPEG_HUFF[("dc", 0)]), _huff_codes(*JPEG_HUFF[("dc", 1)])]
    prog_ac = _huff_codes(*JPEG_HUFF_PROG_AC)
    acc_ = [prog_ac, prog_ac]

    def zz_of(ci, bx, by):
        blk = qb[ci][(bx, by)]
        return [blk[JPEG_ZIGZAG[k]] for k in range(64)]

    scan_payloads = []
    for (kind, cis, ss, se, ah, al) in _prog_scan_script(comps):
        w = _JpegBitWriter()
        if kind == "dc_first":
            pred = {ci: 0 for ci in cis}
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci in cis:
                        h, v = sf[ci]
                        for dy in range(v):
                            for dx in range(h):
                                dc = zz_of(ci, mx * h + dx, my * v + dy)[0] >> al
                                diff = dc - pred[ci]
                                pred[ci] = dc
                                s_ = abs(diff).bit_length()
                                code, ln = dcc[hsel[ci]][s_]
                                w.put(code, ln)
                                if s_:
                                    w.put(diff if diff >= 0 else
                                          diff + (1 << s_) - 1, s_)
        elif kind == "dc_refine":
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci in cis:
                        h, v = sf[ci]
                        for dy in range(v):
                            for dx in range(h):
                                dc = zz_of(ci, mx * h + dx, my * v + dy)[0]
                                w.put((dc >> al) & 1, 1)
        elif kind == "ac_first":
            ci = cis[0]
            table = acc_[hsel[ci]]
            eobrun = 0

            def flush_eob():
                nonlocal eobrun
                if eobrun == 0:
                    return
                r = eobrun.bit_length() - 1
                code, ln = table[r << 4]
                w.put(code, ln)
                if r:
                    w.put(eobrun - (1 << r), r)
                eobrun = 0
            for by in range(cbh[ci]):
                for bx in range(cbw[ci]):
                    zz = zz_of(ci, bx, by)
                    band = []
                    for k in range(ss, se + 1):
                        v0 = zz[k]
                        band.append((1 if v0 >= 0 else -1) * (abs(v0) >> al))
                    if all(v0 == 0 for v0 in band):
                        eobrun += 1
                        if eobrun == 32767:
                            flush_eob()
                        continue
                    flush_eob()
                    run = 0
                    last_nz = max(i for i, v0 in enumerate(band) if v0 != 0)
                    for i, v0 in enumerate(band):
                        if i > last_nz:
                            break
                        if v0 == 0:
                            run += 1
                            continue
                        while run >= 16:
                            code, ln = table[0xF0]
                            w.put(code, ln)
                            run -= 16
                        s_ = abs(v0).bit_length()
                        code, ln = table[(run << 4) | s_]
                        w.put(code, ln)
                        w.put(v0 if v0 >= 0 else v0 + (1 << s_) - 1, s_)
                        run = 0
                    if last_nz < len(band) - 1:
                        eobrun += 1
                        if eobrun == 32767:
                            flush_eob()
            flush_eob()
        else:  # ac_refine — the G.1.2.3 correction-bit algorithm, in the
            # canonical structure (jcphuff): ZRLs also fire at correction
            # positions, buffered bits flush after EVERY emitted symbol,
            # and a block ending exactly at its last coded coefficient
            # contributes NO EOB.
            ci = cis[0]
            table = acc_[hsel[ci]]
            eobrun = 0
            bits_pending = []  # BE: correction bits riding the next EOB flush

            def flush_refine():
                nonlocal eobrun, bits_pending
                if eobrun == 0:
                    assert not bits_pending
                    return
                r = eobrun.bit_length() - 1
                code, ln = table[r << 4]
                w.put(code, ln)
                if r:
                    w.put(eobrun - (1 << r), r)
                for bit in bits_pending:
                    w.put(bit, 1)
                bits_pending = []
                eobrun = 0
            for by in range(cbh[ci]):
                for bx in range(cbw[ci]):
                    zz = zz_of(ci, bx, by)
                    cur = []
                    for k in range(ss, se + 1):
                        v0 = zz[k]
                        cur.append((1 if v0 >= 0 else -1) * (abs(v0) >> al))
                    # EOB = index of the LAST newly-nonzero (|cur| == 1 ⇔
                    # newly nonzero under successive approximation)
                    eob_last = -1
                    for i, v0 in enumerate(cur):
                        if abs(v0) == 1:
                            eob_last = i
                    r = 0
                    block_bits = []  # BR: bits since the last emitted symbol
                    for i, v0 in enumerate(cur):
                        temp = abs(v0)
                        if temp == 0:
                            r += 1
                            continue
                        while r > 15 and i <= eob_last:
                            flush_refine()
                            code, ln = table[0xF0]
                            w.put(code, ln)
                            r -= 16
                            for bit in block_bits:
                                w.put(bit, 1)
                            block_bits = []
                        if temp > 1:
                            block_bits.append(temp & 1)
                            continue
                        flush_refine()
                        code, ln = table[(r << 4) | 1]
                        w.put(code, ln)
                        w.put(1 if v0 > 0 else 0, 1)
                        for bit in block_bits:
                            w.put(bit, 1)
                        block_bits = []
                        r = 0
                    if r > 0 or block_bits:
                        eobrun += 1
                        bits_pending.extend(block_bits)
                        if eobrun == 32767:
                            flush_refine()
            flush_refine()
        w.pad()
        scan_payloads.append((kind, cis, ss, se, ah, al, bytes(w.out)))

    # generator self-check (the aec/baseline discipline): an independent
    # bit-level progressive decode must reassemble every coefficient
    _jpeg_prog_check(scan_payloads, qb, sf, mcux, mcuy, cbw, cbh, hsel, comps)

    qsel_ = [0] + [1] * (comps - 1)

    def seg(marker, payload):
        return bytes((0xFF, marker)) + struct.pack(">H", 2 + len(payload)) + payload
    out = b"\xFF\xD8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")

    def dqt_seg(tq, tab):
        if precision == 12:  # Pq=1: 16-bit entries
            return seg(0xDB, bytes([0x10 | tq]) +
                       b"".join(struct.pack(">H", tab[JPEG_ZIGZAG[k]])
                                for k in range(64)))
        return seg(0xDB, bytes([tq]) + bytes(tab[JPEG_ZIGZAG[k]]
                                             for k in range(64)))
    out += dqt_seg(0, JPEG_QL)
    if comps > 1:
        out += dqt_seg(1, JPEG_QC)
    sof = struct.pack(">BHHB", precision, height, width, comps)
    for ci in range(comps):
        sof += struct.pack(">BBB", ci + 1, (sf[ci][0] << 4) | sf[ci][1], qsel_[ci])
    out += seg(0xC2, sof)
    for tid in ([0] if comps == 1 else [0, 1]):
        bits, vals = JPEG_HUFF[("dc", tid)]
        out += seg(0xC4, bytes([tid] + bits) + bytes(vals))
        pbits, pvals = JPEG_HUFF_PROG_AC
        out += seg(0xC4, bytes([(1 << 4) | tid] + pbits) + bytes(pvals))
    for (kind, cis, ss, se, ah, al, payload) in scan_payloads:
        sos = struct.pack(">B", len(cis))
        for ci in cis:
            # DC scans use the DC table selector; AC scans the AC one
            t = hsel[ci]
            sos += struct.pack(">BB", ci + 1,
                               (t << 4) | (0 if kind.startswith("dc") else t))
        sos += bytes((ss, se, (ah << 4) | al))
        out += seg(0xDA, sos)
        out += payload
    out += b"\xFF\xD9"
    return out, truth


def _jpeg_planes_qblocks(width, height, gray, subsample, precision=8):
    """The plane/FDCT/quantize stage of make_jpeg_real, factored so the
    progressive encoder reuses the exact same quantized blocks."""
    sh, sv = (1, 1) if gray else subsample
    comps = 1 if gray else 3
    px12 = _jpeg_px12 if precision == 12 else _jpeg_rgb
    smax = (1 << precision) - 1
    mid = 1 << (precision - 1)
    if gray:
        planes = [[[px12(x, y, 0) for x in range(width)]
                   for y in range(height)]]
    else:
        ys, cbs, crs = [], [], []
        for y in range(height):
            ry, rcb, rcr = [], [], []
            for x in range(width):
                r, g, b = (px12(x, y, 0), px12(x, y, 1), px12(x, y, 2))
                ry.append(min(smax, max(0, round(0.299 * r + 0.587 * g + 0.114 * b))))
                rcb.append(min(smax, max(0, round(mid - 0.168736 * r
                                                  - 0.331264 * g + 0.5 * b))))
                rcr.append(min(smax, max(0, round(mid + 0.5 * r - 0.418688 * g
                                                  - 0.081312 * b))))
            ys.append(ry)
            cbs.append(rcb)
            crs.append(rcr)
        planes = [ys,
                  _jpeg_box_subsample(cbs, width, height, sh, sv),
                  _jpeg_box_subsample(crs, width, height, sh, sv)]
    sf = [(sh, sv)] + [(1, 1)] * (comps - 1) if not gray else [(1, 1)]
    hmax = max(f[0] for f in sf)
    vmax = max(f[1] for f in sf)
    qsel = [0] + [1] * (comps - 1)
    qtabs = [JPEG_QL, JPEG_QC]
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    qblocks = [dict() for _ in range(comps)]
    for ci in range(comps):
        h, v = sf[ci]
        pw, ph = mcux * 8 * h, mcuy * 8 * v
        plane = planes[ci]
        rows = len(plane)
        cols = len(plane[0]) if rows else 0
        for by in range(ph // 8):
            for bx in range(pw // 8):
                blk = [[0] * 8 for _ in range(8)]
                for yy in range(8):
                    for xx in range(8):
                        py = min(by * 8 + yy, rows - 1)
                        pxx = min(bx * 8 + xx, cols - 1)
                        blk[yy][xx] = plane[py][pxx] - mid
                qblocks[ci][(bx, by)] = _fdct_quant(blk, qtabs[qsel[ci]])
    return qblocks, sf, qsel, mcux, mcuy


def _jpeg_prog_check(scan_payloads, qblocks, sf, mcux, mcuy, cbw, cbh, hsel,
                     comps):
    """Reassemble the coefficient arrays from the progressive scan
    payloads with an independent bit-level decoder and assert they equal
    the encoder's quantized blocks — the encoder proves its own stream."""
    dec_dc = {}
    for tid in (0, 1):
        bits, vals = JPEG_HUFF[("dc", tid)]
        dec_dc[tid] = {(ln, code): v
                       for v, (code, ln) in _huff_codes(bits, vals).items()}
    dec_ac = {(ln, code): v for v, (code, ln)
              in _huff_codes(*JPEG_HUFF_PROG_AC).items()}

    # coefficient store per component at padded dims, zigzag order
    coefs = [dict() for _ in range(comps)]
    for ci in range(comps):
        h, v = sf[ci]
        for by in range(mcuy * v):
            for bx in range(mcux * h):
                coefs[ci][(bx, by)] = [0] * 64

    def extend(v, s):
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    for (kind, cis, ss, se, ah, al, stuffed) in scan_payloads:
        # unstuff 0xFF00 before bit access (restart markers are not used
        # in the progressive scans)
        payload = bytearray()
        i = 0
        while i < len(stuffed):
            payload.append(stuffed[i])
            if stuffed[i] == 0xFF:
                assert i + 1 < len(stuffed) and stuffed[i + 1] == 0x00
                i += 1
            i += 1
        payload = bytes(payload)
        state = [0]

        def bit():
            i = state[0]
            state[0] += 1
            return (payload[i >> 3] >> (7 - (i & 7))) & 1

        def bits(n):
            v = 0
            for _ in range(n):
                v = (v << 1) | bit()
            return v

        def huff(table):
            code, ln = 0, 0
            while ln <= 16:
                code = (code << 1) | bit()
                ln += 1
                if (ln, code) in table:
                    return table[(ln, code)]
            raise AssertionError("bad huffman walk")

        if kind == "dc_first":
            pred = {ci: 0 for ci in cis}
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci in cis:
                        h, v = sf[ci]
                        for dy in range(v):
                            for dx in range(h):
                                s_ = huff(dec_dc[hsel[ci]])
                                diff = extend(bits(s_), s_) if s_ else 0
                                pred[ci] += diff
                                coefs[ci][(mx * h + dx, my * v + dy)][0] = \
                                    pred[ci] << al
        elif kind == "dc_refine":
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci in cis:
                        h, v = sf[ci]
                        for dy in range(v):
                            for dx in range(h):
                                c = coefs[ci][(mx * h + dx, my * v + dy)]
                                c[0] |= bit() << al
        elif kind == "ac_first":
            ci = cis[0]
            eobrun = 0
            for by in range(cbh[ci]):
                for bx in range(cbw[ci]):
                    c = coefs[ci][(bx, by)]
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = huff(dec_ac)
                        r, s_ = rs >> 4, rs & 0xF
                        if s_ == 0:
                            if r == 15:
                                k += 16
                                continue
                            eobrun = (1 << r) - 1 + (bits(r) if r else 0)
                            break
                        k += r
                        assert k <= se
                        c[k] = extend(bits(s_), s_) << al
                        k += 1
        else:  # ac_refine — jdphuff decode structure
            ci = cis[0]
            eobrun = 0
            p1 = 1 << al
            m1 = -1 << al
            for by in range(cbh[ci]):
                for bx in range(cbw[ci]):
                    c = coefs[ci][(bx, by)]
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = huff(dec_ac)
                            r, s_ = rs >> 4, rs & 0xF
                            sval = 0
                            if s_ == 0:
                                if r != 15:
                                    # EOB run INCLUDES this block: fall to
                                    # the eobrun handler below
                                    eobrun = (1 << r) + (bits(r) if r else 0)
                                    break
                                # r == 15: ZRL — skip 16 zero-history slots
                            else:
                                assert s_ == 1
                                sval = p1 if bit() else m1
                            while True:
                                if c[k] != 0:
                                    if bit() and (abs(c[k]) & p1) == 0:
                                        c[k] += p1 if c[k] > 0 else m1
                                else:
                                    r -= 1
                                    if r < 0:
                                        break
                                k += 1
                                if k > se:
                                    break
                            if sval and k <= se:
                                c[k] = sval
                            k += 1
                    if eobrun > 0:
                        while k <= se:
                            if c[k] != 0:
                                if bit() and (abs(c[k]) & p1) == 0:
                                    c[k] += p1 if c[k] > 0 else m1
                            k += 1
                        eobrun -= 1
    # every coefficient must round-trip to the original quantized value
    for ci in range(comps):
        for (bx, by), got in coefs[ci].items():
            # AC band positions only covered for in-ceil-dims blocks;
            # padded-only blocks carry DC only — compare what was coded
            blk = qblocks[ci][(bx, by)]
            want = [blk[JPEG_ZIGZAG[k]] for k in range(64)]
            in_ac = bx < cbw[ci] and by < cbh[ci]
            for k in range(64):
                exp = want[k] if (k == 0 or in_ac) else 0
                assert got[k] == exp, (ci, bx, by, k, got[k], exp)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "--fuzz":
        fuzz(sys.argv[2], int(sys.argv[3]))
    else:
        main()
