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
    0: "9802a6a51e93c9f8fc1bb319e37da94532f33cff4bf299a08ccf436b5ebb0f46",
    1: "a4e644cd77c1ec30dfd49124df3ec34b3f25472a3e984dab95e697678a6d7667",
    2: "476e8d9861e37d02de9200a40eb4d0900ffb5cefd57a30b7d4f6e545cd6ed19d",
    3: "3577a7ed91ca2425dafebb5fff89c9191b0f9228918f93af797b0f41bcfb3706",
    4: "58ac1577d37bf6515689c3ca53c441270473033733d8e6987b00d78d2d355f85",
}


def test_pinned_extraction_bytes():
    pages = generate_pages(5)
    got = {
        i: hashlib.sha256(p["text"].encode("utf-8")).hexdigest()
        for i, p in enumerate(pages)
    }
    assert got == PINNED
