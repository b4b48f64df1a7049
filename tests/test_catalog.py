"""Catalog compile tests: first-writer-wins collisions, alias precedence,
technique-id map, exact-count goldens (style of reference tests/neo4j_test.py)."""

from apt_bron_re_spark.catalog.build import compile_catalog
from apt_bron_re_spark.catalog.synthetic import EXPECTED_COUNTS, build_layer_map


def test_exact_counts(layer_map):
    got = {label: len(nodes) for label, nodes in layer_map.items()}
    assert got == EXPECTED_COUNTS


def test_alias_collision_first_writer_wins(compiled_catalog):
    # "Cobalt Viper" is an alias of both Azure Serpent (G0102, listed first)
    # and Amber Wolf (G0104).  basic.py:91: first writer keeps the variant.
    info = compiled_catalog.variant_to_node["group"]["cobalt viper"]
    assert info["node"]["original_id"] == "G0102"
    assert info["alias"] == "Cobalt Viper"


def test_alias_claims_variant_before_own_name(compiled_catalog):
    # Aliases are inserted before name/id variants (basic.py:88-98), so an
    # alias hit carries the alias string in its payload.
    info = compiled_catalog.variant_to_node["group"]["hidden cobra"]
    assert info["alias"] == "Hidden Cobra"
    assert info["node"]["original_id"] == "G0101"
    # A group's own name variant can itself be claimed by one of its
    # aliases when the alias lowers to the same string ("obsidian_tiger"
    # -> "obsidian tiger"): aliases insert first (basic.py:88-98).
    hub = compiled_catalog.variant_to_node["group"]["obsidian tiger"]
    assert hub["alias"] == "obsidian_tiger"
    # Own-name variants of an alias-free group carry alias=None
    own = compiled_catalog.variant_to_node["group"]["velvet crow"]
    assert own["alias"] is None


def test_technique_id_map(compiled_catalog):
    node = compiled_catalog.technique_id_to_node["t1059.001"]
    assert node["name"] == "PowerShell"
    assert "t1566" in compiled_catalog.technique_id_to_node


def test_cpe_versioned_keyed_by_version(compiled_catalog):
    vm = compiled_catalog.variant_to_node["cpe_versioned"]
    assert "2.3.31" in vm
    assert vm["2.3.31"]["product"] == "struts"
    assert vm["2.3.31"]["at_least"] == 2  # words [apache, struts] -> 2//2+1


def test_cross_label_collision_both_labels_keep_variant(compiled_catalog):
    # "phishing" exists as technique and capec; each label has its own
    # dictionary (basic.py:57), so both match independently.
    assert "phishing" in compiled_catalog.variant_to_node["technique"]
    assert "phishing" in compiled_catalog.variant_to_node["capec"]
