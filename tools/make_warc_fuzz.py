#!/usr/bin/env python3
"""Seeded randomized WARC generator for the differential fuzz spec
(WarcFuzzSpec) — the make_grib_fuzz.py discipline applied to the crawl
source: an INDEPENDENT python implementation of WARC 1.1 + RFC 9112
framing (shared spec with make_warc_fixture.py, not the Scala reader)
emits a random record stream and prints one EXPECT line per record with
what a correct reader must produce:

  EXPECT <idx> <type> <status|-> <payload_len> <payload_md5>

Randomized per seed: record count and types, header order and LWS
folding, response body bytes (printable + binary), HTTP framing
(Content-Length / chunked with random chunk sizes + optional extension
and trailers / gzip content-coding / chunked+gzip), statuses, non-HTTP
record blocks. Both layout twins are written: <out>.warc (plain) and
<out>.warc.gz (record-per-member gzip of the same bytes).

Corruption mode (`corrupt` as the third arg) instead writes files a
reader must REJECT loudly: a truncated final block, a bad version line,
and a non-numeric Content-Length — printed as EXPECTFAIL <file>.

Usage: make_warc_fuzz.py <out-prefix> <seed> [corrupt]
"""
import gzip
import hashlib
import zlib
import random
import sys

CRLF = b"\r\n"


def uuid(i):
    return f"<urn:uuid:00000000-0000-4000-8000-{i:012d}>"


def http_response(status, reason, headers, body):
    head = [f"HTTP/1.1 {status} {reason}".encode("ascii")]
    for k, v in headers:
        head.append(f"{k}: {v}".encode("ascii"))
    return CRLF.join(head) + CRLF + CRLF + body


def chunked(rnd, body):
    out = b""
    pos = 0
    while pos < len(body):
        n = rnd.randint(1, max(1, min(len(body) - pos, 700)))
        piece = body[pos:pos + n]
        pos += n
        size = f"{len(piece):x}"
        if rnd.random() < 0.3:
            size = size.upper()
        if rnd.random() < 0.3:
            size += ";fuzz=" + "x" * rnd.randint(1, 5)
        out += size.encode("ascii") + CRLF + piece + CRLF
    out += b"0" + CRLF
    if rnd.random() < 0.5:
        out += b"X-Trailer: " + str(rnd.randint(0, 9)).encode() + CRLF
    out += CRLF
    return out


def warc_record(i, rtype, headers, block, folded_value=None):
    lines = [b"WARC/1.1"]
    lines.append(f"WARC-Type: {rtype}".encode("ascii"))
    lines.append(f"WARC-Record-ID: {uuid(i)}".encode("ascii"))
    lines.append(f"WARC-Date: 2026-08-15T00:{i // 60:02d}:{i % 60:02d}Z"
                 .encode("ascii"))
    for k, v in headers:
        lines.append(f"{k}: {v}".encode("ascii"))
    if folded_value is not None:
        cut = len(folded_value) // 2
        ws = "\t" if i % 2 else " "
        lines.append(f"WARC-Concurrent-To: {folded_value[:cut]}".encode())
        lines.append((ws + folded_value[cut:]).encode())
    lines.append(f"Content-Length: {len(block)}".encode("ascii"))
    return CRLF.join(lines) + CRLF + CRLF + block + CRLF + CRLF


def rand_body(rnd):
    n = rnd.randint(0, 5000)
    if rnd.random() < 0.5:
        return bytes(rnd.randrange(256) for _ in range(n))
    return ("".join(rnd.choice("abcdefgh <>&\n\t") for _ in range(n))
            .encode("utf-8"))


def main():
    prefix, seed = sys.argv[1], int(sys.argv[2])
    corrupt = len(sys.argv) > 3 and sys.argv[3] == "corrupt"
    rnd = random.Random(seed)

    if corrupt:
        good = warc_record(0, "metadata", [], b"fine")
        cases = {
            f"{prefix}_truncblock.warc":
                good + warc_record(1, "metadata", [], b"x" * 100)[:-60],
            f"{prefix}_badversion.warc":
                b"WARC/9.9-nonsense\r\n" + good[10:],
            f"{prefix}_badlength.warc":
                good.replace(b"Content-Length: 4", b"Content-Length: four"),
        }
        for path, data in cases.items():
            with open(path, "wb") as f:
                f.write(data)
            print(f"EXPECTFAIL {path}")
        return

    nrec = rnd.randint(5, 25)
    stream = b""
    members = []
    for i in range(nrec):
        kind = rnd.choices(
            ["response", "request", "metadata", "resource", "revisit"],
            weights=[6, 1, 1, 1, 1])[0]
        folded = uuid(i + 1000)[1:-1] if rnd.random() < 0.2 else None
        if kind == "response":
            body = rand_body(rnd)
            status = rnd.choice([200, 200, 200, 301, 404, 503])
            ct = rnd.choice(["text/html", "text/plain",
                             "application/octet-stream"])
            hh = [("Content-Type", ct), ("Server", "fuzz/1.0")]
            framing = rnd.choice(["cl", "chunked", "gzip", "chunked+gzip",
                                  "deflate", "raw-deflate",
                                  "chunked+deflate"])
            if framing == "cl":
                wire = body
                hh.append(("Content-Length", str(len(body))))
            elif framing == "chunked":
                wire = chunked(rnd, body)
                hh.append(("Transfer-Encoding", "chunked"))
            elif framing == "gzip":
                wire = gzip.compress(body, mtime=0)
                hh.append(("Content-Encoding", "gzip"))
                hh.append(("Content-Length", str(len(wire))))
            elif framing == "deflate":  # RFC 9110 reading: zlib container
                wire = zlib.compress(body)
                hh.append(("Content-Encoding", "deflate"))
                hh.append(("Content-Length", str(len(wire))))
            elif framing == "raw-deflate":  # common server misbehavior
                c = zlib.compressobj(wbits=-zlib.MAX_WBITS)
                wire = c.compress(body) + c.flush()
                hh.append(("Content-Encoding", "deflate"))
                hh.append(("Content-Length", str(len(wire))))
            elif framing == "chunked+deflate":
                wire = chunked(rnd, zlib.compress(body))
                hh.append(("Content-Encoding", "deflate"))
                hh.append(("Transfer-Encoding", "chunked"))
            else:
                gz = gzip.compress(body, mtime=0)
                wire = chunked(rnd, gz)
                hh.append(("Content-Encoding", "gzip"))
                hh.append(("Transfer-Encoding", "chunked"))
            rnd.shuffle(hh)
            block = http_response(status, "Fuzz", hh, wire)
            headers = [
                ("WARC-Target-URI", f"https://fuzz.example/{seed}/{i}"),
                ("Content-Type",
                 "application/http;msgtype=response"
                 if rnd.random() < 0.5 else "application/http"),
            ]
            payload = body
            st = str(status)
        else:
            block = rand_body(rnd)
            headers = []
            if kind in ("request", "revisit"):
                headers.append(
                    ("WARC-Target-URI", f"https://fuzz.example/{seed}/{i}"))
            payload = block
            st = "-"
        rec = warc_record(i, kind, headers, block, folded)
        stream += rec
        members.append(rec)
        print(f"EXPECT {i} {kind} {st} {len(payload)} "
              f"{hashlib.md5(payload).hexdigest()}")

    with open(f"{prefix}.warc", "wb") as f:
        f.write(stream)
    with open(f"{prefix}.warc.gz", "wb") as f:
        for m in members:
            f.write(gzip.compress(m, mtime=0))


if __name__ == "__main__":
    main()
