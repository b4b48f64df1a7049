"""Unit tests for D1 variant generation and D7 CPE word extraction
(reference ner.py:23-37, export_bron_nodes.py:31-48)."""

from apt_bron_re_spark.functions.variants import (
    cpe_at_least,
    extract_cpe_words,
    generate_variants,
    generate_variants_extended,
)


def test_variants_multiword():
    assert generate_variants("Command Line") == {
        "command line",
        "command_line",
        "commandline",
        "command-line",
    }


def test_variants_dash_and_underscore():
    assert generate_variants("x-y_z") == {
        "x-y_z", "x y_z", "x-y z",
    }


def test_variants_single_token():
    assert generate_variants("Mimikatz") == {"mimikatz"}


def test_variants_extended_plurals():
    got = generate_variants_extended("Hidden Cobra")
    assert "hidden cobras" in got and "hidden cobra's" in got
    assert "hiddencobras" in got and "hidden-cobras" in got
    # underscore transforms are NOT in the harness set
    assert "hidden_cobra" not in got
    # variants already ending in 's' gain no plural forms
    assert generate_variants_extended("mantis") == {"mantis"}


def test_cpe_words_skips_prefix_and_wildcards():
    oid = "cpe:2.3:a:apache:struts:2.3.31:*:*:*:*:*:*:*"
    assert extract_cpe_words(oid) == ["apache", "struts", "2.3.31"]
    assert extract_cpe_words(oid, version="2.3.31", exclude_version=True) == [
        "apache", "struts",
    ]


def test_cpe_words_ordered_dedup():
    oid = "cpe:2.3:a:foo:foo:1.0:-:*:bar:foo:*:*:*"
    assert extract_cpe_words(oid) == ["foo", "1.0", "bar"]


def test_at_least():
    assert cpe_at_least(["a", "b"]) == 2
    assert cpe_at_least(["a", "b", "c"]) == 2
    assert cpe_at_least(["a", "b", "c", "d"]) == 3
    assert cpe_at_least([]) == 1
