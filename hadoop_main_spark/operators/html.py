"""HTML -> text extraction (the trafilatura/jusText TIER of a web
curation pipeline, by STRUCTURAL rules only — no ML, no external
libraries; stdlib ``html.unescape`` + regex over well-formed-enough
markup).

Reference analog: none in Hadoop core — this is north-star scope for
the 100 TB training-data pipeline (Common Crawl: WARC -> HTTP body ->
HTML -> text is the first mile of every web corpus; see
sources/warc.py for the container side).

Extraction contract (deterministic, so the registry query can carry a
closed-form DuckDB oracle over the generating template):
 1. ``<script>``/``<style>``/``<noscript>``/``<template>`` subtrees
    and ``<!-- comments -->`` are dropped whole (content never leaks).
 2. Every remaining tag is stripped; block-level open/close tags
    (p, div, br, li, tr, h1..h6, title, section, article) become a
    single space so words across blocks never concatenate.
 3. Entities decode via the full HTML5 table (stdlib), THEN
    whitespace collapses to single spaces and trims — decode-then-
    collapse order matters (``&nbsp;`` is whitespace after decoding).
 4. The first ``<title>`` text and the ``href`` count of ``<a>`` tags
    are surfaced as metadata (boilerplate signals at scale).

Everything is ValueError-free by design: HTML on the web is broken by
default, so the extractor never raises — worst case it returns the
tag-stripped soup (bad-record policy lives at the payload layer, not
here).
"""

from __future__ import annotations

import html as _html
import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

_DROP_SUBTREE = re.compile(
    r"<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_TITLE = re.compile(r"<title\b[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL)
_HREF = re.compile(r"<a\b[^>]*\bhref\s*=", re.IGNORECASE)
_BLOCK_TAG = re.compile(
    r"</?(?:p|div|br|li|ul|ol|tr|td|th|table|h[1-6]|title|head|body|html|"
    r"section|article|header|footer|nav|blockquote|pre)\b[^>]*/?>",
    re.IGNORECASE,
)
_ANY_TAG = re.compile(r"<[^>]*>")
_WS = re.compile(r"\s+")


def html_to_text(markup: str) -> tuple[str, str, int]:
    """(text, title, n_links) per the module contract. Never raises."""
    if not markup:
        return "", "", 0
    # Drop non-content subtrees FIRST so a <title> string literal inside a
    # <script> can never become the page title and commented-out anchors
    # never inflate n_links ("content never leaks" contract).
    s = _DROP_SUBTREE.sub(" ", markup)
    s = _COMMENT.sub(" ", s)
    m = _TITLE.search(s)
    title = ""
    if m:
        title = _WS.sub(" ", _html.unescape(_ANY_TAG.sub(" ", m.group(1)))).strip()
    n_links = len(_HREF.findall(s))
    s = _BLOCK_TAG.sub(" ", s)
    s = _ANY_TAG.sub("", s)  # inline tags vanish: "<b>w</b>ord" stays one word
    s = _html.unescape(s)
    s = _WS.sub(" ", s).strip()
    return s, title, n_links


def extract_html_text(pages: DataFrame, id_col: str = "page_id",
                      html_col: str = "markup") -> DataFrame:
    """Arrow-batched extraction pass: (id, markup) -> (id, text,
    title, n_links, n_chars). Text stays inside the batch until the
    caller decides what to shuffle — downstream quality/dedup stages
    usually reduce to digests and counts first (the
    line-dedup/winnowing discipline)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            texts, titles, links = [], [], []
            for mk in b[html_col]:
                t, ti, nl = html_to_text(mk if mk is not None else "")
                texts.append(t)
                titles.append(ti)
                links.append(nl)
            yield pd.DataFrame(
                {
                    id_col: b[id_col],
                    "text": texts,
                    "title": titles,
                    "n_links": pd.Series(links, dtype="int64"),
                    "n_chars": pd.Series([len(t) for t in texts], dtype="int64"),
                }
            )

    return pages.select(id_col, html_col).mapInPandas(
        run,
        f"{id_col} long, text string, title string, n_links long, n_chars long",
    )


_HREF_VAL = re.compile(
    r"""<a\b[^>]*\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE,
)


def extract_links(pages: DataFrame, id_col: str = "page_id",
                  html_col: str = "markup") -> DataFrame:
    """Outlink extraction — the link-graph side of the HTML tier
    (html_to_text counts anchors; this returns their href VALUES, one
    (id, href) row per anchor, double/single/unquoted attribute forms
    all parsed). The same content-never-leaks contract applies:
    script/style/template subtrees and comments drop BEFORE href
    extraction, so commented-out or script-string anchors never enter
    the web graph. Arrow-batched; never raises (broken markup yields
    whatever anchors still parse)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, hrefs = [], []
            for pid, mk in zip(b[id_col], b[html_col]):
                s = _DROP_SUBTREE.sub(" ", mk if mk is not None else "")
                s = _COMMENT.sub(" ", s)
                for m in _HREF_VAL.finditer(s):
                    ids.append(pid)
                    hrefs.append(m.group(1) or m.group(2) or m.group(3) or "")
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"),
                 "href": pd.Series(hrefs, dtype="object")}
            )

    return pages.select(id_col, html_col).mapInPandas(
        run, f"{id_col} long, href string"
    )


def decode_http_body(body: bytes, content_type: str = "") -> str:
    """HTTP entity bytes -> text using the Content-Type charset
    parameter (case-insensitive; utf-8 default per WHATWG reality,
    latin-1/iso-8859-1/windows-1252/ascii/utf-16 honored), with
    errors='replace' — a mojibake'd page is a quality-filter problem,
    not a pipeline crash (the html_to_text never-raise policy)."""
    cs = "utf-8"
    ct = (content_type or "").lower()
    if "charset=" in ct:
        raw = ct.split("charset=", 1)[1].split(";", 1)[0].strip().strip('"\'')
        cs = {
            "iso-8859-1": "latin-1",
            "windows-1252": "cp1252",
            "us-ascii": "ascii",
        }.get(raw, raw)
    try:
        return body.decode(cs, errors="replace")
    except LookupError:  # unknown charset label -> the default
        return body.decode("utf-8", errors="replace")
