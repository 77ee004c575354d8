#!/usr/bin/env python3
"""Seeded random HTML for the GRAFT-HTML-TEXT v1 differential fuzz
(GraftHtmlFuzzSpec): documents drawn from the v1 contract space —
nested block/inline elements with random case, whitespace, and quoted
attributes (including '>' inside values), text with the decodable
entity set and literal '<'/'&' uses, comments/doctypes/PIs, raw-text
script/style with failed-close-tag bait, suppressed template/noscript,
void elements, and occasional unclosed tags — with the expected text
computed by the INDEPENDENT python html.parser implementation
(imported from make_warc_fixture.py).

Writes <out>/html.parquet with (doc_id, html, expected). The Scala spec
runs the kernel over `html` and compares against `expected`.

Usage: make_html_fuzz.py <outdir> <seed> <ndocs>
"""
import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_warc_fixture import extract_text  # noqa: E402

BLOCK = ["p", "div", "h1", "h2", "li", "ul", "td", "tr", "table",
         "section", "article", "blockquote"]
INLINE = ["b", "i", "a", "span", "em", "strong", "code"]
VOID = ["br", "hr"]
WORDS = ["alpha", "beta", "gamma", "text", "word", "data", "x", "y1",
         "longish-token", "mixedCase"]
ENTS = ["&amp;", "&lt;", "&gt;", "&quot;", "&apos;", "&nbsp;",
        "&#65;", "&#x42;", "&#228;", "&copy;",  # &copy; stays verbatim
        # surrogate-range and out-of-range refs stay verbatim (rule 3)
        "&#xD800;", "&#56320;", "&#xDFFF;", "&#x110000;", "&#0;"]
LITERALS = ["a < b", "x <3 y", "5 < 6", "a & b", "& loose"]


def rand_case(rnd, s):
    return "".join(c.upper() if rnd.random() < 0.3 else c for c in s)


def rand_text(rnd):
    parts = []
    for _ in range(rnd.randint(1, 6)):
        r = rnd.random()
        if r < 0.6:
            parts.append(rnd.choice(WORDS))
        elif r < 0.8:
            parts.append(rnd.choice(ENTS))
        else:
            parts.append(rnd.choice(LITERALS))
    sep = rnd.choice([" ", "  ", "\n", "\t", " \n "])
    return sep.join(parts)


def rand_attrs(rnd):
    out = ""
    for _ in range(rnd.randint(0, 2)):
        name = rnd.choice(["id", "class", "href", "title", "data-x"])
        val = rnd.choice(["v1", "a>b", "x y", "q'q", "/u?a=1&b=2"])
        quote = '"' if "'" in val or rnd.random() < 0.7 else "'"
        out += f" {name}={quote}{val}{quote}"
    return out


def element(rnd, depth):
    r = rnd.random()
    if depth > 3 or r < 0.35:
        return rand_text(rnd)
    if r < 0.40:
        return f"<!-- comment {rnd.randint(0, 99)} <p>ignored</p> -->"
    if r < 0.44:
        return rnd.choice(["<!DOCTYPE html>", "<?php echo 1 ?>"])
    if r < 0.50:
        tag = rand_case(rnd, rnd.choice(["script", "style"]))
        bait = rnd.choice(["if (a<b) { x(); }", 'var s = "</scr";',
                           "p > q { c: '</sty'; }", "// </ x >"])
        return f"<{tag}{rand_attrs(rnd)}>{bait}</{tag}>"
    if r < 0.55:
        tag = rnd.choice(["template", "noscript"])
        inner = element(rnd, depth + 1)
        return f"<{tag}><p>hidden {inner}</p></{tag}>"
    if r < 0.60:
        return f"<{rand_case(rnd, rnd.choice(VOID))}{rand_attrs(rnd)}>"
    tag = rnd.choice(BLOCK + INLINE)
    inner = "".join(element(rnd, depth + 1)
                    for _ in range(rnd.randint(1, 3)))
    open_tag = rand_case(rnd, tag)
    if rnd.random() < 0.1:
        return f"<{open_tag}{rand_attrs(rnd)}>{inner}"  # unclosed
    return f"<{open_tag}{rand_attrs(rnd)}>{inner}</{rand_case(rnd, tag)}>"


def main():
    outdir, seed, ndocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    rnd = random.Random(seed)
    ids, htmls, expects = [], [], []
    for i in range(ndocs):
        doc = "".join(element(rnd, 0) for _ in range(rnd.randint(2, 8)))
        ids.append(i)
        htmls.append(doc)
        expects.append(extract_text(doc))
    os.makedirs(outdir, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "html": pa.array(htmls, type=pa.string()),
        "expected": pa.array(expects, type=pa.string()),
    }), os.path.join(outdir, "html.parquet"))
    print(f"WROTE {ndocs}")


if __name__ == "__main__":
    main()
