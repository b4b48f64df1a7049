"""Deterministic boilerplate-stripping HTML -> text extraction (E1).

The reference extracts plain text from PDFs (PyMuPDF ``page.get_text()``
concatenation, src/data_prep/convert_reports.py:36-40).  The rebuild's input
is Common-Crawl-style pages (``html BINARY`` per BASELINE.json input_hint),
so E1 becomes an HTML extractor with a hard invariant: the ``text`` column
produced by the Spark stage must be **byte-identical per url** to this pure
reference function.  The same function therefore (a) generates the gold
``text`` column of the synthetic corpus, (b) runs inside the extract-stage
Arrow UDF, and (c) is pinned by byte-exact fixtures in
tests/test_extract.py so any drift is caught.

Rules (fixed; stdlib-only, no network, no wall clock):
  * bytes are decoded as UTF-8 with ``errors="replace"``;
  * content inside <script> <style> <noscript> <template> <head> <svg>
    <iframe> is dropped;
  * content inside the classic boilerplate containers <nav> <header>
    <footer> <aside> is dropped (boilerplate stripping);
  * HTML comments and tags are dropped; entities are unescaped;
  * block-level tags open a new line; text inside a line has whitespace
    runs collapsed to single spaces and is stripped;
  * empty lines are dropped; lines join with "\n"; no trailing newline.
"""

from __future__ import annotations

from html.parser import HTMLParser

_DROP_CONTENT = {
    "script", "style", "noscript", "template", "head", "svg", "iframe",
    # boilerplate containers
    "nav", "header", "footer", "aside",
}

_BLOCK_TAGS = {
    "p", "div", "br", "li", "ul", "ol", "table", "tr", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "article", "section", "main",
    "blockquote", "pre", "figure", "figcaption", "hr", "dl", "dt", "dd",
    "caption", "thead", "tbody", "tfoot", "form", "title", "body", "html",
}


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._drop_depth = 0
        self._lines: list[str] = []
        self._current: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_CONTENT:
            self._drop_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _DROP_CONTENT and self._drop_depth > 0:
            self._drop_depth -= 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._drop_depth == 0 and data:
            self._current.append(data)

    def _flush(self) -> None:
        if self._current:
            line = " ".join("".join(self._current).split())
            if line:
                self._lines.append(line)
            self._current = []

    def result(self) -> str:
        self._flush()
        return "\n".join(self._lines)


def extract_text(html: bytes | str) -> str:
    """Pure reference extractor: HTML bytes -> boilerplate-stripped text."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    parser = _TextExtractor()
    parser.feed(html)
    parser.close()
    return parser.result()


# --------------------------------------------------------------------------
# E2: the second, independent extraction path (md-flavoured)
# --------------------------------------------------------------------------
# The reference converts every report TWICE (txt and md,
# convert_reports.py) and diffs the entity hits of the two extractions
# (tests/compare_txt_md.py:20-69).  The rebuild's second path is a
# regex-based markdown-flavoured extractor sharing no code with the
# HTMLParser path above: headings get a "# " prefix, list items a "- "
# prefix, formatting differs — but the differential test asserts the
# structured entity hits agree between the two extractions.

import re as _re

_MD_DROP_RE = _re.compile(
    r"<(script|style|noscript|template|head|svg|iframe|nav|header|footer|"
    r"aside)\b[^>]*>.*?</\1\s*>",
    _re.IGNORECASE | _re.DOTALL)
_MD_COMMENT_RE = _re.compile(r"<!--.*?-->", _re.DOTALL)
_MD_HEADING_RE = _re.compile(r"<h([1-6])\b[^>]*>", _re.IGNORECASE)
_MD_LI_RE = _re.compile(r"<li\b[^>]*>", _re.IGNORECASE)
_MD_BLOCK_RE = _re.compile(
    r"</?(p|div|br|li|ul|ol|table|tr|td|th|h[1-6]|article|section|main|"
    r"blockquote|pre|figure|figcaption|hr|dl|dt|dd|caption|thead|tbody|"
    r"tfoot|form|title|body|html)\b[^>]*/?>",
    _re.IGNORECASE)
_MD_TAG_RE = _re.compile(r"<[^>]+>")


def extract_text_md(html: bytes | str) -> str:
    """Independent md-flavoured extractor (E2's second conversion path)."""
    import html as _htmllib

    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    s = _MD_COMMENT_RE.sub(" ", html)
    s = _MD_DROP_RE.sub(" ", s)
    s = _MD_HEADING_RE.sub(lambda m: "\n" + "#" * int(m.group(1)) + " ", s)
    s = _MD_LI_RE.sub("\n- ", s)
    s = _MD_BLOCK_RE.sub("\n", s)
    s = _MD_TAG_RE.sub(" ", s)
    s = _htmllib.unescape(s)
    lines = []
    for raw in s.split("\n"):
        line = " ".join(raw.split())
        if line and line not in ("#", "-"):
            lines.append(line)
    return "\n".join(lines)
