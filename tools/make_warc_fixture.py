#!/usr/bin/env python3
"""Generate a WARC (ISO 28500 / WARC 1.1) crawl fixture + expected parquet,
committed under data/warc/.

The bytes are written directly from the public specs — WARC 1.1 record
framing (version line, CRLF header block with LWS continuation folding,
Content-Length-framed block, CRLF CRLF separator), HTTP/1.1 message
framing (RFC 9112: status line, headers, chunked transfer coding with
chunk extensions + trailers, gzip content coding) — deliberately NOT via
warcio/requests and NOT via the Scala reader under test, so the fixture
is an independent implementation of each spec. Two copies of the same
record stream are emitted:

  crawl.warc     — uncompressed
  crawl.warc.gz  — one gzip member PER RECORD (the ISO 28500 annex /
                   CommonCrawl convention, so members are independently
                   seekable given a CDX-style index)

records_expected.parquet is the spec-derived parse of every record
(offsets counted in the uncompressed stream — identical for both files
by construction) and serves as the DuckDB oracle for q_warc_records /
q_warc_responses. `payload` is the decoded HTTP body for response
records (de-chunked, then content-decoded per Content-Encoding: gzip)
and the raw record block otherwise; the parquet stores its md5 hex.

text_expected.parquet is the GRAFT-HTML-TEXT v1 extraction (below) of
every 200 text/html response, tokenized by python's stdlib html.parser —
an independent HTML tokenizer from the Scala scanner under test.

GRAFT-HTML-TEXT v1 (both implementations follow this; the Scala side is
graft.functions.GraftHtmlOps.htmlText):
  1. Comments, <!...> declarations, <?...?> processing instructions are
     dropped. The entire CONTENTS of script/style/template/noscript
     elements are dropped (case-insensitive; script/style close only at
     the matching case-insensitive end tag, per the HTML CDATA rule).
  2. '<' starts markup only when followed by [a-zA-Z], '/', '!' or '?';
     otherwise it is literal text. Quoted attribute values may contain
     '>' without ending the tag.
  3. Character references in text are decoded with the SEMICOLON-REQUIRED
     rule: &#NNN; and &#xHH; (code points), plus the named set
     {amp, lt, gt, quot, apos, nbsp→space}; anything else (unknown
     names, bare '&') is kept verbatim. The fixture never emits a
     semicolon-less reference (engines disagree on those).
  4. Opening AND closing tags of block elements (BLOCK set below; br/hr
     are void) contribute a line break; all other tags contribute
     nothing. Whitespace characters in source text (space, tab, CR, LF,
     FF) all count as collapsible space — source newlines do NOT create
     line breaks (pre included: v1 does not preserve pre layout).
  5. Normalize: collapse whitespace runs within each line, strip each
     line, drop empty lines, join with '\n'.

Run once, commit outputs:
  python3 tools/make_warc_fixture.py
"""
import gzip
import hashlib
import os
import re
import zlib
from html.parser import HTMLParser

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__), "..", "data", "warc")

CRLF = b"\r\n"

BLOCK = {
    "address", "article", "aside", "blockquote", "body", "br", "caption",
    "dd", "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "head", "header", "hr",
    "html", "li", "main", "nav", "ol", "p", "pre", "section", "table",
    "tbody", "td", "tfoot", "th", "thead", "title", "tr", "ul",
}
SKIP = {"script", "style", "template", "noscript"}

NAMED = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
         "nbsp": " "}

_REF = re.compile(r"&(#[0-9]+|#[xX][0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]*);")


def decode_refs(s):
    """GRAFT-HTML-TEXT v1 rule 3: semicolon-required reference decode."""
    def sub(m):
        body = m.group(1)
        if body.startswith("#"):
            cp = int(body[2:], 16) if body[1] in "xX" else int(body[1:])
            # surrogate cps stay verbatim: chr() would build a lone
            # surrogate that neither parquet nor the Scala side can carry
            if 0 < cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
                return chr(cp)
            return m.group(0)
        return NAMED.get(body, m.group(0))
    return _REF.sub(sub, s)


class TextExtractor(HTMLParser):
    """GRAFT-HTML-TEXT v1 via the stdlib tokenizer (independent of the
    Scala scanner). convert_charrefs=False so rule-3 decoding is our own
    regex pass, identical on both sides."""

    def __init__(self):
        super().__init__(convert_charrefs=False)
        self.parts = []
        self.skip_depth = 0  # inside script/style/template/noscript

    def _block(self, tag):
        if tag in BLOCK:
            self.parts.append("\n")

    def handle_starttag(self, tag, attrs):
        if tag in SKIP:
            self.skip_depth += 1
        self._block(tag)

    def handle_endtag(self, tag):
        if tag in SKIP and self.skip_depth > 0:
            self.skip_depth -= 1
        self._block(tag)

    def handle_startendtag(self, tag, attrs):
        self._block(tag)

    def handle_data(self, data):
        if self.skip_depth == 0:
            # rule 4: source newlines are collapsible space, not breaks
            self.parts.append(re.sub(r"[\r\n\t\f]", " ", data))

    def handle_entityref(self, name):
        if self.skip_depth == 0:
            self.parts.append(decode_refs(f"&{name};"))

    def handle_charref(self, name):
        if self.skip_depth == 0:
            self.parts.append(decode_refs(f"&#{name};"))

    # comments / decls / PIs dropped (rule 1)
    def handle_comment(self, d):
        pass

    def handle_decl(self, d):
        pass

    def handle_pi(self, d):
        pass

    def text(self):
        raw = "".join(self.parts)
        lines = []
        for line in raw.split("\n"):
            line = re.sub(r"[ \t\r\f]+", " ", line).strip()
            if line:
                lines.append(line)
        return "\n".join(lines)


def extract_text(html):
    p = TextExtractor()
    p.feed(html)
    p.close()
    return p.text()


# --------------------------------------------------------------- HTML pages

PAGE1 = """<!DOCTYPE html>
<html><head>
<title>Graft &amp; the crawl</title>
<meta charset="utf-8">
<style>body > p { color: red; } /* <p> inside style is dropped */</style>
<script type="text/javascript">
  if (a < b) { document.write("<div>not text</div>"); }
</script>
</head>
<BODY>
<!-- a comment, dropped -->
<h1>Heading &lt;one&gt;</h1>
<p>First paragraph with <b>bold</b> and <i>italic</i> runs,
spanning source lines.</p>
<p>Entities: 5 &lt; 7 &amp;&amp; 9 &gt; 3, "&quot;quoted&quot;",
it&apos;s, non&nbsp;breaking, unknown &copy; stays, hex &#x1F600; and
decimal &#228; decode.</p>
<p>Literal math: a < b when b > a.</p>
<ul><li>alpha</li><li>beta<br/>gamma</li></ul>
<table><tr><td>r1c1</td><td>r1c2</td></tr>
<tr><td>r2c1</td><td>r2c2</td></tr></table>
<a href="/next?x=1&amp;y=2" title="a>b">inline link</a> trailing text
<p>日本語のテキストと émojis 🚀 survive.</p>
<div>unclosed paragraph<p>inside a div</div>
</BODY></html>
"""

PAGE2 = """<html><head><title>Chunked page</title></head><body>
<h2>Delivered in chunks</h2>
<p>The transfer coding is invisible to the text layer.</p>
<pre>v1 collapses   pre   whitespace too</pre>
</body></html>
"""

PAGE3 = """<html><body>
<h2>Gzip page</h2>
<p>Content-Encoding: gzip bodies are decoded before extraction.</p>
<SCRIPT>var s = "</sCRipt is not a close"; // tricky</SCRIPT>
<p>After the script.</p>
</body></html>
"""

PAGE4 = """<html><body>
<h2>Chunked + gzip</h2>
<p>De-chunk first, then content-decode &#8212; the RFC 9110 order.</p>
</body></html>
"""

PAGE5 = """<html><body>
<h2>Deflate page</h2>
<p>Content-Encoding: deflate is the RFC 1950 zlib container per RFC 9110.</p>
</body></html>
"""

PAGE6 = """<html><body>
<h2>Raw deflate page</h2>
<p>A known server population ships RFC 1951 raw deflate under the same
token; browsers accept both, so the reader must too.</p>
</body></html>
"""

PAGE404 = "<html><body><h1>404</h1><p>not found</p></body></html>\n"

PLAIN = "just plain text, no markup; the text query must skip it\n"

ROBOTS = "User-agent: *\nDisallow: /private\n"


# ------------------------------------------------------------- HTTP framing

def http_response(status, reason, headers, body):
    head = [f"HTTP/1.1 {status} {reason}".encode("ascii")]
    for k, v in headers:
        head.append(f"{k}: {v}".encode("ascii"))
    return CRLF.join(head) + CRLF + CRLF + body


def chunked(body, sizes):
    """Split body into chunks of the given sizes (remainder in a final
    chunk), with one uppercase-hex size, one chunk extension, and a
    trailer section — the RFC 9112 features a de-chunker must survive."""
    out = b""
    pos = 0
    pieces = []
    for n in sizes:
        pieces.append(body[pos:pos + n])
        pos += n
    if pos < len(body):
        pieces.append(body[pos:])
    for i, piece in enumerate(pieces):
        size = f"{len(piece):x}"
        if i == 1:
            size = size.upper() + ";graft=ext"  # extension after size
        out += size.encode("ascii") + CRLF + piece + CRLF
    out += b"0" + CRLF + b"X-Trailer: yes" + CRLF + CRLF
    return out


# ------------------------------------------------------------- WARC framing

def uuid(i):
    return f"<urn:uuid:00000000-0000-4000-8000-{i:012d}>"


def warc_record(i, rtype, headers, block, folded=False):
    """One WARC 1.1 record. folded=True spreads a WARC-Concurrent-To
    value over an LWS continuation line (ISO 28500 §4: header fields may
    span lines begun with space/tab)."""
    lines = [b"WARC/1.1"]
    lines.append(f"WARC-Type: {rtype}".encode("ascii"))
    lines.append(f"WARC-Record-ID: {uuid(i)}".encode("ascii"))
    lines.append(f"WARC-Date: 2026-08-15T00:00:{i:02d}Z".encode("ascii"))
    for k, v in headers:
        lines.append(f"{k}: {v}".encode("ascii"))
    if folded:
        cid = uuid(i - 1)
        lines.append(f"WARC-Concurrent-To: {cid[:20]}".encode("ascii"))
        lines.append(f"\t{cid[20:]}".encode("ascii"))
    lines.append(f"Content-Length: {len(block)}".encode("ascii"))
    return CRLF.join(lines) + CRLF + CRLF + block + CRLF + CRLF


def main():
    os.makedirs(OUT, exist_ok=True)

    html_ct = "text/html; charset=utf-8"
    p1 = PAGE1.encode("utf-8")
    p2 = PAGE2.encode("utf-8")
    p3 = PAGE3.encode("utf-8")
    p4 = PAGE4.encode("utf-8")
    p3gz = gzip.compress(p3, mtime=0)
    p4gz = gzip.compress(p4, mtime=0)
    p5 = PAGE5.encode("utf-8")
    p6 = PAGE6.encode("utf-8")
    p5zlib = zlib.compress(p5)                       # RFC 1950 container
    raw = zlib.compressobj(wbits=-zlib.MAX_WBITS)    # RFC 1951 raw stream
    p6raw = raw.compress(p6) + raw.flush()

    info_block = (b"software: graft-fixture/1.0\r\n"
                  b"format: WARC File Format 1.1\r\n")
    req_block = (b"GET /page1 HTTP/1.1\r\nHost: example.org\r\n"
                 b"User-Agent: graft\r\n\r\n")

    # (record_type, warc_headers, block, http fields for expectations)
    # http = (status, content_type, payload_bytes) or None
    recs = []

    recs.append(("warcinfo",
                 [("Content-Type", "application/warc-fields")],
                 info_block, None, None, False))
    recs.append(("request",
                 [("WARC-Target-URI", "http://example.org/page1"),
                  ("Content-Type", "application/http; msgtype=request")],
                 req_block, None, "http://example.org/page1", False))
    recs.append(("response",
                 [("WARC-Target-URI", "http://example.org/page1"),
                  ("Content-Type", "application/http; msgtype=response")],
                 http_response(200, "OK",
                               [("Content-Type", html_ct),
                                ("Content-Length", str(len(p1)))], p1),
                 (200, html_ct, p1), "http://example.org/page1", True))
    recs.append(("response",
                 [("WARC-Target-URI", "http://example.org/page2"),
                  ("Content-Type", "application/http; msgtype=response")],
                 http_response(200, "OK",
                               [("Content-Type", html_ct),
                                ("Transfer-Encoding", "chunked")],
                               chunked(p2, [1, 40, 7])),
                 (200, html_ct, p2), "http://example.org/page2", False))
    recs.append(("response",
                 [("WARC-Target-URI", "http://example.org/page3"),
                  ("Content-Type", "application/http; msgtype=response")],
                 http_response(200, "OK",
                               [("Content-Type", html_ct),
                                ("Content-Encoding", "gzip"),
                                ("Content-Length", str(len(p3gz)))], p3gz),
                 (200, html_ct, p3), "http://example.org/page3", False))
    recs.append(("response",
                 [("WARC-Target-URI", "http://example.org/page4"),
                  ("Content-Type", "application/http; msgtype=response")],
                 http_response(200, "OK",
                               [("Content-Type", html_ct),
                                ("Content-Encoding", "gzip"),
                                ("Transfer-Encoding", "chunked")],
                               chunked(p4gz, [3, 10])),
                 (200, html_ct, p4), "http://example.org/page4", False))
    recs.append(("response",
                 [("WARC-Target-URI", "http://example.org/page5"),
                  ("Content-Type", "application/http; msgtype=response")],
                 http_response(200, "OK",
                               [("Content-Type", html_ct),
                                ("Content-Encoding", "deflate"),
                                ("Content-Length", str(len(p5zlib)))], p5zlib),
                 (200, html_ct, p5), "http://example.org/page5", False))
    recs.append(("response",
                 [("WARC-Target-URI", "http://example.org/page6"),
                  ("Content-Type", "application/http; msgtype=response")],
                 http_response(200, "OK",
                               [("Content-Type", html_ct),
                                ("Content-Encoding", "deflate"),
                                ("Content-Length", str(len(p6raw)))], p6raw),
                 (200, html_ct, p6), "http://example.org/page6", False))
    recs.append(("response",
                 [("WARC-Target-URI", "http://example.org/notes.txt"),
                  ("Content-Type", "application/http; msgtype=response")],
                 http_response(200, "OK",
                               [("Content-Type", "text/plain"),
                                ("Content-Length", str(len(PLAIN)))],
                               PLAIN.encode("utf-8")),
                 (200, "text/plain", PLAIN.encode("utf-8")),
                 "http://example.org/notes.txt", False))
    recs.append(("response",
                 [("WARC-Target-URI", "http://example.org/missing"),
                  ("Content-Type", "application/http; msgtype=response")],
                 http_response(404, "Not Found",
                               [("Content-Type", html_ct),
                                ("Content-Length", str(len(PAGE404)))],
                               PAGE404.encode("utf-8")),
                 (404, html_ct, PAGE404.encode("utf-8")),
                 "http://example.org/missing", False))
    meta_block = b"fetchTimeMs: 312\r\ncharset-detected: utf-8\r\n"
    recs.append(("metadata",
                 [("WARC-Target-URI", "http://example.org/page1"),
                  ("Content-Type", "application/warc-fields")],
                 meta_block, None, "http://example.org/page1", False))
    recs.append(("revisit",
                 [("WARC-Target-URI", "http://example.org/page1"),
                  ("WARC-Profile",
                   "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"),
                  ("Content-Type", "application/http; msgtype=response")],
                 b"HTTP/1.1 304 Not Modified\r\n\r\n", None,
                 "http://example.org/page1", False))
    recs.append(("resource",
                 [("WARC-Target-URI", "http://example.org/robots.txt"),
                  ("Content-Type", "text/plain")],
                 ROBOTS.encode("utf-8"), None,
                 "http://example.org/robots.txt", False))

    plain_parts = []
    rows = []
    offset = 0
    for i, (rtype, headers, block, http, uri, folded) in enumerate(recs):
        rec = warc_record(i, rtype, headers, block, folded=folded)
        plain_parts.append(rec)
        ct = dict(headers).get("Content-Type")
        if http is not None:
            status, hct, payload = http
        else:
            status, hct, payload = None, None, block
        rows.append({
            "record_idx": i,
            "offset": offset,
            "record_type": rtype,
            "record_id": uuid(i)[1:-1],
            "target_uri": uri,
            "warc_date": f"2026-08-15T00:00:{i:02d}Z",
            "content_type": ct,
            "content_length": len(block),
            "http_status": status,
            "http_content_type": hct,
            "payload_len": len(payload),
            "payload_md5": hashlib.md5(payload).hexdigest(),
            "_payload": payload,
        })
        offset += len(rec)

    with open(os.path.join(OUT, "crawl.warc"), "wb") as f:
        for rec in plain_parts:
            f.write(rec)
    with open(os.path.join(OUT, "crawl.warc.gz"), "wb") as f:
        for rec in plain_parts:  # one member per record
            f.write(gzip.compress(rec, mtime=0))

    cols = ["record_idx", "offset", "record_type", "record_id",
            "target_uri", "warc_date", "content_type", "content_length",
            "http_status", "http_content_type", "payload_len",
            "payload_md5"]
    types = {"record_idx": pa.int64(), "offset": pa.int64(),
             "content_length": pa.int64(), "http_status": pa.int32(),
             "payload_len": pa.int64()}
    table = pa.table({c: pa.array([r[c] for r in rows],
                                  type=types.get(c, pa.string()))
                      for c in cols})
    pq.write_table(table, os.path.join(OUT, "records_expected.parquet"))

    text_rows = [(r["record_idx"], r["target_uri"],
                  extract_text(r["_payload"].decode("utf-8")))
                 for r in rows
                 if r["http_status"] == 200
                 and (r["http_content_type"] or "").startswith("text/html")]
    ttable = pa.table({
        "record_idx": pa.array([t[0] for t in text_rows], type=pa.int64()),
        "target_uri": pa.array([t[1] for t in text_rows], type=pa.string()),
        "text": pa.array([t[2] for t in text_rows], type=pa.string()),
    })
    pq.write_table(ttable, os.path.join(OUT, "text_expected.parquet"))

    # Separate fixture: a response with an unsupported Content-Encoding
    # (brotli). Kept OUT of crawl.warc — the reader must reject it loudly
    # on payload materialization, so it gets its own file a dedicated
    # test scans. The body bytes are opaque (no br encoder needed: the
    # reader must refuse before ever looking at them).
    br_rec = warc_record(
        99, "response",
        [("WARC-Target-URI", "http://example.org/br-page"),
         ("Content-Type", "application/http; msgtype=response")],
        http_response(200, "OK",
                      [("Content-Type", html_ct),
                       ("Content-Encoding", "br"),
                       ("Content-Length", "8")], b"\x8b\x03\x80br-ish\x03"[:8]))
    with open(os.path.join(OUT, "unsupported_ce.warc"), "wb") as f:
        f.write(br_rec)

    print(f"wrote {len(rows)} records "
          f"({sum(len(p) for p in plain_parts)} bytes plain), "
          f"{len(text_rows)} extracted texts")
    for t in text_rows:
        print("----", t[1])
        print(t[2])


if __name__ == "__main__":
    main()
