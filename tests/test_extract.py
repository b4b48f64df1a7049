"""E1 extractor tests: determinism, boilerplate stripping, and the
byte-pinned fixture lock (SURVEY.md §5 "byte-identical extracted text")."""

import hashlib

from apt_bron_re_spark.functions.extract_text import extract_text
from apt_bron_re_spark.sources.pages import generate_page, generate_pages


def test_strips_script_style_nav_footer():
    html = (
        b"<html><head><style>x{}</style><title>T</title></head><body>"
        b"<script>evil()</script><nav>Menu</nav>"
        b"<p>Hello   world</p><footer>legal</footer></body></html>"
    )
    # <head> content (incl. <title>) is dropped wholesale
    assert extract_text(html) == "Hello world"


def test_inline_tags_do_not_break_lines():
    html = b"<p>The <b>quick</b> fox uses <i>Mimikatz</i>.</p>"
    assert extract_text(html) == "The quick fox uses Mimikatz."


def test_entities_unescaped_and_whitespace_collapsed():
    html = b"<p>AT&amp;T \n\t reported&nbsp;issues</p>"
    # &nbsp; (\xa0) is whitespace for str.split -> collapsed like any other
    assert extract_text(html) == "AT&T reported issues"


def test_invalid_utf8_replaced():
    assert extract_text(b"<p>a\xffb</p>") == "a�b"


def test_deterministic():
    page_a = generate_page(7)
    page_b = generate_page(7)
    assert page_a == page_b
    assert extract_text(page_a["html"]) == page_a["text"]


# Byte-pinned fixture: sha256 of the extracted text of the first 5 synthetic
# pages (seed 42).  Any drift in the extractor or the generator is an
# invariant violation (BASELINE.json input_hint), not a harmless change —
# regenerate ONLY with a conscious decision.
PINNED = {
    0: "64840334ba159c604699cf3a631a650415d43c3101f8a7e39c0d83963e79adde",
    1: "d528cb107ce382da2462a3f6de1551df855322d81ca9ce123e71fbc7132aef12",
    2: "841edc49c80d5c6a8969d1531d3361e9ca1c811ad2b29aefa3125433a11cd3e9",
    3: "c1b922675074de834c81276b82629b8ec1dade365ff97c23609262b3cc059f12",
    4: "539838f39e48441b30682559acaa120a82cd559d8c0c049d676204249f4285d8",
}


def test_pinned_extraction_bytes():
    pages = generate_pages(5)
    got = {
        i: hashlib.sha256(p["text"].encode("utf-8")).hexdigest()
        for i, p in enumerate(pages)
    }
    assert got == PINNED
