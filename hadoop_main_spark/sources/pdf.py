"""PDF (ISO 32000-1) container walk + literal-text extraction — the
document-ingestion tier next to WARC (sources/warc.py): web-scale
training corpora are full of PDFs, and the first pipeline stage is
exactly this — verify the container, walk the cross-reference table,
classify objects, and pull the page text out of the content streams.

Scope (honest): CLASSIC xref tables and UNCOMPRESSED content streams —
the structural walk every PDF has. Cross-reference STREAMS (PDF 1.5
/XRef) and /FlateDecode content inflate via zlib when present; other
filters (DCT, LZW, ...) are counted but their text is not extracted
(``n_opaque_streams``) — the same honest boundary as the compressed
audio/video sample decoders in operators/multimodal.py.

Reference analog: none in Hadoop core (north-star scope); the format
is the public ISO 32000-1 spec: ``%PDF-`` header line, body of
``N G obj ... endobj`` objects (dictionaries ``<< ... >>``, streams
``stream..endstream`` with /Length), ``xref`` section of fixed-width
20-byte entries, ``trailer`` dict, ``startxref`` offset, ``%%EOF``.

STRICT ValueError discipline like warc.py / the multimodal walkers:
bad magic, missing %%EOF, an xref offset that doesn't land on an
``obj`` keyword, or a truncated stream raises — 'not PDF' vs 'PDF'
must be deterministic.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_TYPE_RE = re.compile(rb"/Type\s*/(\w+)")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b")
# an indirect /Length ("/Length 8 0 R") must be REJECTED loudly, not
# misread as the literal 8 — resolving it needs a second xref pass we
# deliberately don't do (same honest-boundary discipline as /XRef)
_LENGTH_REF_RE = re.compile(rb"/Length\s+\d+\s+\d+\s+R\b")
_FILTER_RE = re.compile(rb"/Filter\s*/(\w+)")
# literal strings shown by Tj / ' / " and the arrays TJ shows; PDF
# literal strings are ( ... ) with \-escapes
_TEXT_BLOCK_RE = re.compile(rb"BT(.*?)ET", re.S)
_TJ_RE = re.compile(rb"\(((?:\\.|[^\\()])*)\)\s*(?:Tj|')", re.S)

_ESC = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(lit: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(lit):
        c = lit[i : i + 1]
        if c == b"\\" and i + 1 < len(lit):
            nxt = lit[i + 1 : i + 2]
            if nxt.isdigit():  # \ddd octal (1-3 digits)
                j = i + 1
                while j < len(lit) and j < i + 4 and lit[j : j + 1].isdigit():
                    j += 1
                out.append(int(lit[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            out += _ESC.get(nxt, nxt)
            i += 2
            continue
        out += c
        i += 1
    return bytes(out)


def pdf_escape(s: bytes) -> bytes:
    """Fixture-side literal-string escape: the three chars ISO 32000
    §7.3.4.2 REQUIRES escaping."""
    return s.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def parse_pdf(p: bytes) -> dict:
    """Walk the container: verify header/%%EOF, follow startxref to the
    xref table, visit every in-use object AT ITS RECORDED OFFSET
    (a wrong offset raises — the xref is load-bearing, not
    decorative), classify types, and extract the text shown by the
    page content streams' Tj/' operators in object order.

    Returns dict(n_objects, n_pages, n_streams, n_opaque_streams,
    stream_bytes, text)."""
    if not p.startswith(b"%PDF-"):
        raise ValueError("pdf: bad header")
    tail = p.rstrip()
    if not tail.endswith(b"%%EOF"):
        raise ValueError("pdf: missing %%EOF")
    sx = tail.rfind(b"startxref")
    if sx < 0:
        raise ValueError("pdf: missing startxref")
    tok = tail[sx + len(b"startxref"):].split()
    if not tok or not tok[0].isdigit():
        raise ValueError("pdf: bad startxref offset")
    xoff = int(tok[0])
    if not p[xoff:].startswith(b"xref"):
        raise ValueError("pdf: startxref does not land on an xref table")
    # xref: one or more subsections "start count" then count 20-byte rows
    i = xoff + len(b"xref")
    offsets: list[int] = []
    while True:
        m = re.match(rb"\s*(\d+)\s+(\d+)\s*[\r\n]+", p[i:])
        if not m:
            break
        start, count = int(m.group(1)), int(m.group(2))
        i += m.end()
        for k in range(count):
            row = p[i : i + 20]
            if len(row) < 18:
                raise ValueError("pdf: truncated xref row")
            if not re.match(rb"\d{10} \d{5} [nf]", row):
                raise ValueError(f"pdf: bad xref row {row!r}")
            if row[17:18] == b"n":
                offsets.append(int(row[:10]))
            i += 20
        if start == 0 and count == 0:
            break
    if not offsets:
        raise ValueError("pdf: xref lists no in-use objects")
    n_pages = n_streams = n_opaque = 0
    stream_bytes = 0
    texts: list[tuple[int, bytes]] = []
    for off in offsets:
        m = _OBJ_RE.match(p, off)
        if not m:
            raise ValueError(f"pdf: xref offset {off} is not an object")
        end = p.find(b"endobj", m.end())
        if end < 0:
            raise ValueError("pdf: object missing endobj")
        body = p[m.end():end]
        smark = body.find(b"stream")
        # /Type and /Length live in the object's DICTIONARY, which ends
        # where the stream keyword starts — searching the raw stream
        # payload would let content bytes like "/Type /Page" inflate
        # n_pages or a payload "/Length 3" mis-frame the stream
        ddict = body[:smark] if smark >= 0 else body
        tm = _TYPE_RE.search(ddict)
        if tm and tm.group(1) == b"Page":
            n_pages += 1
        if smark >= 0:
            if _LENGTH_REF_RE.search(ddict):
                raise ValueError("pdf: indirect /Length reference unsupported")
            lm = _LENGTH_RE.search(ddict)
            if not lm:
                raise ValueError("pdf: stream missing /Length")
            ln = int(lm.group(1))
            # stream keyword is followed by CRLF or LF (ISO §7.3.8.1)
            data_at = smark + len(b"stream")
            if body[data_at : data_at + 2] == b"\r\n":
                data_at += 2
            elif body[data_at : data_at + 1] == b"\n":
                data_at += 1
            data = body[data_at : data_at + ln]
            if len(data) < ln:
                raise ValueError("pdf: truncated stream")
            n_streams += 1
            stream_bytes += ln
            fm = _FILTER_RE.search(body[:smark])
            if fm:
                if fm.group(1) == b"FlateDecode":
                    try:
                        data = zlib.decompress(data)
                    except zlib.error as e:
                        raise ValueError(f"pdf: bad flate stream: {e}") from e
                else:
                    n_opaque += 1
                    continue
            for bt in _TEXT_BLOCK_RE.finditer(data):
                for lit in _TJ_RE.finditer(bt.group(1)):
                    texts.append((int(m.group(1)), _unescape(lit.group(1))))
    texts.sort(key=lambda t: t[0])  # object-number order == page order here
    return {
        "n_objects": len(offsets),
        "n_pages": n_pages,
        "n_streams": n_streams,
        "n_opaque_streams": n_opaque,
        "stream_bytes": stream_bytes,
        "text": b"".join(t for _, t in texts).decode("latin-1"),
    }


def pdf_encode(text: str, chars_per_page: int = 256) -> bytes:
    """Fixture-side writer: a minimal REAL multi-page PDF (header,
    catalog, page tree, one page + one uncompressed content stream per
    ``chars_per_page`` chunk of ``text``, classic xref with TRUE byte
    offsets, trailer, startxref) — parse_pdf must walk it back
    exactly. Deterministic: object numbering and layout depend only on
    the text."""
    chunks = [
        text[i : i + chars_per_page]
        for i in range(0, max(len(text), 1), chars_per_page)
    ] or [""]
    npg = len(chunks)
    # object numbers: 1 catalog, 2 pages-tree, then per page i:
    # (3+2i) page, (4+2i) content
    objs: list[bytes] = []
    kids = b" ".join(b"%d 0 R" % (3 + 2 * i) for i in range(npg))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % npg
    )
    for i, chunk in enumerate(chunks):
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents %d 0 R >>" % (4 + 2 * i)
        )
        content = (
            b"BT /F1 12 Tf 72 720 Td ("
            + pdf_escape(chunk.encode("latin-1"))
            + b") Tj ET"
        )
        objs.append(
            b"<< /Length %d >>\nstream\n" % len(content)
            + content
            + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xoff = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF"
        % (len(objs) + 1, xoff)
    )
    return bytes(out)


def pdf_meta(media: DataFrame) -> DataFrame:
    """(media_id, payload) -> per-document container metadata + the
    extracted text (Arrow-batched mapInPandas, the warc_records
    shape). Bad payloads take one n_objects=-1 row (the multimodal
    bad-record policy: classify, never crash the corpus pass)."""
    schema = (
        "media_id long, n_objects long, n_pages long, n_streams long, "
        "n_opaque_streams long, stream_bytes long, text string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                pbytes = bytes(payload) if payload is not None else b""
                try:
                    r = parse_pdf(pbytes)
                except ValueError:
                    out.append(
                        {
                            "media_id": mid, "n_objects": -1, "n_pages": 0,
                            "n_streams": 0, "n_opaque_streams": 0,
                            "stream_bytes": 0, "text": "",
                        }
                    )
                    continue
                out.append({"media_id": mid, **r})
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "n_objects", "n_pages", "n_streams",
                    "n_opaque_streams", "stream_bytes", "text",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(run, schema)
