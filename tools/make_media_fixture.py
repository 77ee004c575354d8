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

def make_bmp(width: int, height: int, top_down: bool = False) -> bytes:
    """24-bit BITMAPINFOHEADER BMP; deterministic pixel pattern."""
    stride = (width * 3 + 3) & ~3
    pixels = bytearray()
    for y in range(height):
        row = bytearray()
        for x in range(width):
            row += bytes(((x * 7 + y * 13) % 256, (x * 3 + y) % 256, (x + y * 5) % 256))
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


# ---------------------------------------------------------------- WAV

def make_wav(channels: int, sample_rate: int, n_frames: int,
             bits: int = 16, with_list_chunk: bool = False,
             odd_data: bool = False) -> bytes:
    """RIFF/WAVE PCM. odd_data appends one extra byte to the data chunk
    (legal for 8-bit mono; the chunk is then padded to even length)."""
    block_align = channels * bits // 8
    data = bytearray()
    for i in range(n_frames):
        for c in range(channels):
            v = ((i * 37 + c * 101) % 65536) - 32768
            if bits == 16:
                data += struct.pack("<h", v)
            else:
                data += struct.pack("<B", (v >> 8) + 128)
    if odd_data:
        assert bits == 8 and channels == 1
        data += b"\x7f"
        n_frames += 1
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
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


# ---------------------------------------------------------------- opaque

def make_blob(n: int) -> bytes:
    return bytes(((i * 197 + 11) % 256) for i in range(n))


def main():
    os.makedirs(OUT, exist_ok=True)
    rows = []

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

    # BMPs (decoder reports channels from bit depth)
    emit(0, "bmp", "image/bmp", make_bmp(13, 7), "bmp", 13, 7, 3)
    emit(1, "bmp", "image/bmp", make_bmp(64, 64), "bmp", 64, 64, 3)
    emit(2, "bmp", "image/bmp", make_bmp(21, 9, top_down=True), "bmp", 21, 9, 3)
    emit(3, "bmp", "image/bmp", make_bmp(1, 1), "bmp", 1, 1, 3)

    # PNGs
    emit(4, "png", "image/png", make_png(16, 12, 2), "png", 16, 12, 3)
    emit(5, "png", "image/png", make_png(33, 1, 0), "png", 33, 1, 1)
    emit(6, "png", "image/png", make_png(8, 8, 6), "png", 8, 8, 4)
    emit(7, "png", "image/png", make_png(640, 2, 2), "png", 640, 2, 3)

    # WAVs (width/height null; n_frames = PCM sample frames)
    emit(8, "wav", "audio/wav", make_wav(1, 8000, 800), "wav",
         n_channels=1, sample_rate=8000, n_frames=800)
    emit(9, "wav", "audio/wav", make_wav(2, 44100, 441), "wav",
         n_channels=2, sample_rate=44100, n_frames=441)
    emit(10, "wav", "audio/wav", make_wav(2, 16000, 160, with_list_chunk=True),
         "wav", n_channels=2, sample_rate=16000, n_frames=160)
    emit(11, "wav", "audio/wav", make_wav(1, 22050, 99, bits=8, odd_data=True),
         "wav", n_channels=1, sample_rate=22050, n_frames=100)

    # opaque fallback -> stub decode (dims are the documented checksum fiction)
    blob = make_blob(1000)
    c = checksum(blob)
    emit(15, "bin", "application/octet-stream", blob, "stub",
         width=int(64 + c % 512), height=int(64 + (c // 512) % 512),
         n_frames=1000 // 256 + 1)

    schema = pa.schema([
        ("doc_id", pa.int64()), ("media_type", pa.string()),
        ("decoder", pa.string()), ("n_bytes", pa.int64()),
        ("width", pa.int32()), ("height", pa.int32()),
        ("n_channels", pa.int32()), ("sample_rate", pa.int32()),
        ("n_frames", pa.int64()), ("checksum", pa.int64()),
    ])
    table = pa.Table.from_pylist(rows, schema=schema)
    pq.write_table(table, os.path.join(OUT, "decode_expected.parquet"))
    print(f"wrote {len(rows)} media files + decode_expected.parquet under {OUT}")


if __name__ == "__main__":
    main()
