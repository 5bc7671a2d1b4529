"""WARC record walk (sources/warc.py) + structural HTML->text
extraction (operators/html.py) — the Common Crawl first mile."""

import pytest

from hadoop_main_spark.operators.html import extract_html_text, html_to_text
from hadoop_main_spark.sources import warc as W


def test_html_to_text_contract():
    h = (
        '<!DOCTYPE html><html><head><title> Doc &amp; 7 </title>'
        "<style>body{color:red}</style><script>var x=\"<p>evil</p>\";</script>"
        '</head><body><nav><a href="/x">Home</a> | <a href="/y">About</a></nav>'
        "<h1>Head&nbsp;line</h1><p>first   line</p><p><b>bo</b>ld word</p>"
        "<!-- secret --><div>last</div></body></html>"
    )
    text, title, n_links = html_to_text(h)
    # script/style/comment content never leaks; inline tags vanish
    # mid-word; blocks separate; entities decode before collapsing
    assert text == "Doc & 7 Home | About Head line first line bold word last"
    assert title == "Doc & 7" and n_links == 2
    assert html_to_text("") == ("", "", 0)
    assert html_to_text("<p>unclosed <b>stuff") == ("unclosed stuff", "", 0)
    # a case-twisted script tag still drops its subtree
    assert "evil" not in html_to_text("<SCRIPT>evil</script>ok")[0]


def test_html_extract_spark_pass(spark):
    pages = spark.createDataFrame(
        [(1, "<title>t</title><p>a</p><p>b</p>"), (2, None)],
        "page_id long, markup string",
    )
    rows = {r.page_id: r for r in extract_html_text(pages).collect()}
    assert rows[1].text == "t a b" and rows[1].title == "t"
    assert rows[2].text == "" and rows[2].n_chars == 0


def test_warc_roundtrip_both_layouts():
    html = b"<html><title>t</title><p>hello &amp; world</p></html>"
    uri = "http://e.org/1"
    recs = [
        dict(warc_type="warcinfo", block=b"software: hms\r\n",
             content_type="application/warc-fields"),
        dict(warc_type="request", block=W.http_request(uri), target_uri=uri,
             content_type="application/http; msgtype=request"),
        dict(warc_type="response", block=W.http_response(html),
             target_uri=uri, content_type="application/http; msgtype=response"),
    ]
    for gz in (False, True):
        out = W.parse_warc(W.build_warc(recs, gzip_members=gz))
        assert [r["warc_type"] for r in out] == ["warcinfo", "request", "response"]
        assert out[2]["http_status"] == 200
        assert out[2]["http_content_type"] == "text/html"
        assert out[2]["body"] == html
        assert out[1]["is_http"] and out[1]["body"] == b""  # bare GET
        assert not out[0]["is_http"] and out[0]["block"].startswith(b"software")
        # Content-Length is the BLOCK length per ISO 28500
        assert out[2]["content_length"] == len(W.http_response(html))


def test_warc_strictness():
    html = b"<p>x</p>"
    rec = [dict(warc_type="response", block=W.http_response(html),
                target_uri="u", content_type="application/http; msgtype=response")]
    plain, gz = W.build_warc(rec), W.build_warc(rec, gzip_members=True)
    for bad in (
        plain[:-3],                      # trailing CRLFCRLF cut
        gz[:-3],                         # truncated gzip member (eof check)
        b"HTTP nope",                    # no WARC/ magic
        plain.replace(b"Content-Length", b"X-Length", 1),  # no length
        b"WARC/1.0\r\nContent-Length: 99\r\n\r\nxx",       # block escapes
    ):
        with pytest.raises(ValueError):
            W.parse_warc(bad)


def test_warc_records_bad_record_row(spark):
    media = spark.createDataFrame(
        [(1, b"not a warc"), (2, None)], "media_id long, payload binary"
    )
    rows = {r.media_id: r for r in W.warc_records(media).collect()}
    assert rows[1].warc_type == "bad" and rows[2].warc_type == "bad"


def test_robots_pattern_regex_and_decide(spark):
    """RFC 9309 semantics: metachar-escaping compiler, * span, $ end
    anchor, most-specific wins, allow wins ties, default allow for
    no-match and no-robots hosts."""
    from pyspark.sql import functions as F

    from hadoop_main_spark.operators.crawl import (
        robots_decide,
        robots_pattern_regex,
    )

    rx = {
        r.p: r.rx
        for r in spark.createDataFrame(
            [("/articles/*.html$",), ("/a+b(c)*",), ("/x$y",)], "p string"
        ).select("p", robots_pattern_regex("p").alias("rx")).collect()
    }
    assert rx["/articles/*.html$"] == r"^/articles/.*\.html$"
    assert rx["/a+b(c)*"] == r"^/a\+b\(c\).*"
    assert rx["/x$y"] == r"^/x\$y"  # mid-pattern $ is literal

    urls = spark.createDataFrame(
        [
            (1, "a", "/private/data"),        # disallow /private
            (2, "a", "/private/files/x"),     # longer allow overrides
            (3, "a", "/pub"),                 # no match -> allowed
            (4, "b", "/docs/x.html"),         # $ anchor hits
            (5, "b", "/docs/x.html?q=1"),     # $ anchor misses -> / disallow
            (6, "c", "/anything"),            # host without robots
            (7, "a", "/tie"),                 # equal-length tie -> allow
        ],
        "url_id long, host string, path string",
    )
    rules = spark.createDataFrame(
        [
            ("a", False, "/private"),
            ("a", True, "/private/files"),
            ("a", False, "/tie"),
            ("a", True, "/tie"),
            ("b", False, "/"),
            ("b", True, "/docs/*.html$"),
        ],
        "host string, allow boolean, pattern string",
    )
    got = {r.url_id: r for r in robots_decide(urls, F.broadcast(rules)).collect()}
    assert not got[1].allowed and got[1].matched_pattern == "/private"
    assert got[2].allowed and got[2].matched_pattern == "/private/files"
    assert got[3].allowed and got[3].matched_pattern == ""
    assert got[4].allowed and got[4].matched_pattern == "/docs/*.html$"
    assert not got[5].allowed and got[5].matched_pattern == "/"
    assert got[6].allowed and got[6].matched_len == 0
    assert got[7].allowed  # RFC: tie resolves to allow


def test_parse_robots_txt_grammar():
    from hadoop_main_spark.operators.crawl import (
        parse_robots_txt,
        select_agent_group,
    )

    txt = (
        "# robots\n"
        "User-agent: hms-bot\n"
        "User-agent: otherbot\n"    # shared group
        "Disallow: /private # inline comment\n"
        "Allow: /private/files\n"
        "\n"                        # blank line does NOT close the group
        "User-agent: *\n"
        "Disallow: /\n"
        "Crawl-delay: 10\n"         # unknown directive ignored
        "Disallow:\n"               # empty pattern = no rule
        "garbage line without colon\n"
    )
    rules = parse_robots_txt(txt)
    assert ("hms-bot", False, "/private") in rules
    assert ("otherbot", True, "/private/files") in rules
    assert ("*", False, "/") in rules
    assert len([r for r in rules if r[2] == ""]) == 0
    # exact beats *, case-insensitive token; no rules -> empty
    assert select_agent_group(rules, "HMS-Bot") == [
        (False, "/private"), (True, "/private/files")
    ]
    assert select_agent_group(rules, "nobody") == [(False, "/")]
    assert select_agent_group([], "x") == []
    assert parse_robots_txt(None) == []


def test_http_wire_forms_chunked_and_gzip():
    """RFC 9112 chunked framing and gzip Content-Encoding both undo
    to the same entity bytes; truncated/malformed chunk streams
    raise."""
    body = b"<html><p>" + b"z" * 300 + b"</p></html>"
    for chunked in (False, True):
        for gz in (False, True):
            blk = W.http_response(body, chunked=chunked, gzip_body=gz)
            rec = [dict(warc_type="response", block=blk, target_uri="u",
                        content_type="application/http; msgtype=response")]
            out = W.parse_warc(W.build_warc(rec, gzip_members=True))
            assert out[0]["body"] == body, (chunked, gz)
            assert out[0]["http_status"] == 200
    # multi-chunk stream with a chunk extension, decoded manually
    wire = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            b"5;ext=1\r\nhello\r\n6\r\n world\r\n0\r\n\r\n")
    assert W._parse_http(wire)[2] == b"hello world"
    import pytest as _pytest
    for bad_body in (
        b"5\r\nhel",                 # truncated chunk
        b"zz\r\nhello\r\n0\r\n\r\n", # bad hex size
        b"5\r\nhelloXX0\r\n\r\n",    # missing chunk CRLF
        b"5\r\nhello\r\n",           # no terminator size line... 
    ):
        with _pytest.raises(ValueError):
            W._dechunk(bad_body)


def test_decode_http_body_charsets():
    from hadoop_main_spark.operators.html import decode_http_body

    assert decode_http_body(
        "héllo".encode("latin-1"), "text/html; charset=ISO-8859-1"
    ) == "héllo"
    assert decode_http_body("héllo".encode("utf-8"), "text/html") == "héllo"
    assert decode_http_body(b"\xff\xfeh\x00i\x00", 'text/html; charset="utf-16"') == "hi"
    # unknown labels and broken bytes degrade, never raise
    assert decode_http_body(b"x\xff", "text/html; charset=bogus-enc") == "x�"
    assert decode_http_body(b"\xff", "text/html") == "�"


def test_dechunk_rejects_nonhex_tokens():
    # RFC 9112 chunk-size is 1*HEXDIG: int(x, 16) alone would accept
    # negatives, 0x prefixes, and underscores and silently mis-frame.
    for bad_body in (
        b"-2\r\n0\r\n\r\n",
        b"0x5\r\nhello\r\n0\r\n\r\n",
        b"1_0\r\n0123456789abcdef\r\n0\r\n\r\n",
        b"\r\n0\r\n\r\n",  # empty size token
        b"+5\r\nhello\r\n0\r\n\r\n",
    ):
        with pytest.raises(ValueError):
            W._dechunk(bad_body)


def test_warc_rejects_bad_content_length():
    html = b"<p>x</p>"
    rec = [dict(warc_type="response", block=W.http_response(html),
                target_uri="u", content_type="application/http; msgtype=response")]
    plain = W.build_warc(rec)
    real = next(ln for ln in plain.split(b"\r\n") if ln.startswith(b"Content-Length:"))
    # a negative / signed / underscored length must raise, never step the
    # cursor backwards into the header block
    for bad_val in (b"-4", b"+4", b"4_0", b" ", b""):
        bad = plain.replace(real, b"Content-Length: " + bad_val, 1)
        with pytest.raises(ValueError):
            W.parse_warc(bad)


def test_html_metadata_from_cleaned_markup():
    # title inside a <script> string literal must NOT become the page
    # title; commented-out anchors must not inflate n_links
    h = ('<script>document.write("<title>fake</title>")</script>'
         "<title>real</title><!-- <a href=x>dead</a> -->"
         '<p><a href="/live">live</a></p>')
    text, title, n_links = html_to_text(h)
    assert title == "real"
    assert n_links == 1
    assert "fake" not in text


def test_parse_robots_delays_adversarial_values():
    """'never raises' contract on untrusted robots.txt (r9 ADVICE):
    inf/nan round() would raise OverflowError/ValueError, and a huge
    finite value would overflow the scheduler's int64 ms column —
    all must be skipped, while sane decimal delays still parse."""
    from hadoop_main_spark.operators.crawl import (
        parse_robots_delays,
        select_crawl_delay,
    )

    body = (
        "User-agent: *\n"
        "Crawl-delay: inf\n"
        "User-agent: *\n"
        "Crawl-delay: nan\n"
        "User-agent: *\n"
        "Crawl-delay: -inf\n"
        "User-agent: *\n"
        "Crawl-delay: 1e30\n"
        "User-agent: *\n"
        "Crawl-delay: 1e400\n"
        "User-agent: *\n"
        "Crawl-delay: -3\n"
        "User-agent: bot\n"
        "Crawl-delay: 2.5\n"
    )
    rows = parse_robots_delays(body)
    assert rows == [("bot", 2500)]
    assert select_crawl_delay(rows, "Bot") == 2500
    assert select_crawl_delay(rows, "other") is None
    # every surviving delay fits int64 milliseconds
    assert all(0 <= ms <= 365 * 24 * 3600 * 1000 for _, ms in rows)


def test_pdf_roundtrip_and_adversarial():
    """sources/pdf.py: multi-page encode -> parse roundtrip (text,
    page/object/stream counts), literal-string escapes (required
    chars + octal), FlateDecode inflation, opaque-filter counting,
    and the strict not-PDF-must-raise contract."""
    import zlib

    import pytest

    from hadoop_main_spark.sources.pdf import parse_pdf, pdf_encode

    for text in ("hello world", "a" * 600, "", "with (parens) \\ bs", "x" * 256):
        r = parse_pdf(pdf_encode(text))
        exp_pages = max(1, (len(text) + 255) // 256)
        assert r["text"] == text
        assert r["n_pages"] == exp_pages == r["n_streams"]
        assert r["n_objects"] == 2 + 2 * exp_pages
        assert r["n_opaque_streams"] == 0

    def mini(objbody):
        out = bytearray(b"%PDF-1.4\n")
        offs = []
        bodies = [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            objbody,
        ]
        for num, body in enumerate(bodies, 1):
            offs.append(len(out))
            out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
        x = len(out)
        out += b"xref\n0 %d\n" % (len(offs) + 1) + b"0000000000 65535 f \n"
        for o in offs:
            out += b"%010d 00000 n \n" % o
        out += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF" % (
            len(offs) + 1, x,
        )
        return bytes(out)

    comp = zlib.compress(b"BT /F1 12 Tf (zipped text) Tj ET")
    r = parse_pdf(
        mini(b"<< /Filter /FlateDecode /Length %d >>\nstream\n" % len(comp)
             + comp + b"\nendstream")
    )
    assert r["text"] == "zipped text" and r["n_opaque_streams"] == 0
    r = parse_pdf(
        mini(b"<< /Filter /DCTDecode /Length 4 >>\nstream\n\xff\xd8\xff\xd9\nendstream")
    )
    assert r["n_opaque_streams"] == 1 and r["text"] == ""
    r = parse_pdf(mini(b"<< /Length 26 >>\nstream\nBT (\\101\\102 \\(x\\)) Tj ET\nendstream"))
    assert r["text"] == "AB (x)"
    good = pdf_encode("x")
    for bad in (
        b"",
        b"%PDF-1.4\nno eof",
        good[:-6],                             # truncated %%EOF
        good.replace(b"xref", b"XREF", 1),     # startxref -> not a table
        good.replace(b"00000 n ", b"00000 q ", 1),   # bad xref row kind
        good.replace(b"/Length", b"/Lengxx", 1),     # stream missing /Length
    ):
        with pytest.raises(ValueError):
            parse_pdf(bad)
    # a LYING xref offset must raise, not silently skip the object
    off = good.find(b"3 0 obj")
    lying = good.replace(b"%010d 00000 n " % off, b"%010d 00000 n " % (off + 2), 1)
    with pytest.raises(ValueError):
        parse_pdf(lying)


def test_pdf15_xref_stream_roundtrip_and_adversarial():
    """sources/pdf.py PDF 1.5 form: ObjStm + xref-stream encode ->
    parse roundtrip (text, page/object/stream counts with structure
    streams included), cross-form text equality, and the strict
    raise contract for /Prev chains, bad ObjStm headers, and
    mismatched xref-stream object numbers."""
    import pytest

    from hadoop_main_spark.sources.pdf import (
        parse_pdf,
        pdf15_encode,
        pdf_encode,
    )

    for text in ("hello", "a" * 600, "", "with (parens) \\ bs", "y" * 256):
        r = parse_pdf(pdf15_encode(text))
        np = max(1, (len(text) + 255) // 256)
        assert r["text"] == text == parse_pdf(pdf_encode(text))["text"]
        assert r["n_pages"] == np
        assert r["n_objects"] == 2 * np + 4
        assert r["n_streams"] == np + 2  # contents + ObjStm + XRef
        assert r["n_opaque_streams"] == 0
    good = pdf15_encode("x")
    with pytest.raises(ValueError, match="Prev"):
        parse_pdf(good.replace(b"/Type /XRef", b"/Type /XRef /Prev 9", 1))
    # corrupt the RAW xref-stream row for object 1 (type-2, W=[1 4 2]:
    # its ObjStm index is the row's last 2 bytes): pointing it at
    # index 1 must trip the ObjStm-header objnum verification
    rows_at = good.find(b"stream\n", good.find(b"/Type /XRef")) + 7
    row1_idx = rows_at + 7 + 5  # skip obj0's row, then type+field2
    bad = good[:row1_idx] + (1).to_bytes(2, "big") + good[row1_idx + 2:]
    with pytest.raises(ValueError, match="ObjStm header says"):
        parse_pdf(bad)
    # ... and an out-of-range index must raise too
    bad = good[:row1_idx] + (99).to_bytes(2, "big") + good[row1_idx + 2:]
    with pytest.raises(ValueError, match="ObjStm index"):
        parse_pdf(bad)
    with pytest.raises(ValueError):
        parse_pdf(good.replace(b"/W [1 4 2]", b"/Q [1 4 2]", 1))
