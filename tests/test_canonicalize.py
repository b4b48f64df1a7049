"""Stage-4 connected-components tests: generic operator on a skewed graph
(FIXTURES.md §7) and the alias-graph canonical map."""

from apt_bron_re_spark.operators.canonicalize import (
    canonical_map,
    connected_components,
)


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("z", "z")],
        "src string, dst string")
    comp = {r.id: r.component for r in connected_components(edges).collect()}
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["x"] == comp["y"] == "x"
    assert comp["z"] == "z"


def test_connected_components_skewed_hub(spark):
    # One hub connected to 200 spokes + a 30-node chain (worst case for
    # min-propagation rounds) — exercises the salted aggregation path.
    hub = [("hub", f"spoke{i:03d}") for i in range(200)]
    chain = [(f"c{i:02d}", f"c{i + 1:02d}") for i in range(30)]
    edges = spark.createDataFrame(hub + chain, "src string, dst string")
    comp = {r.id: r.component
            for r in connected_components(edges, n_salts=4).collect()}
    assert len({comp[f"spoke{i:03d}"] for i in range(200)}) == 1
    assert comp["hub"] == comp["spoke000"]
    assert len({comp[f"c{i:02d}"] for i in range(31)}) == 1


def test_canonical_map_merges_shared_alias(spark, layer_map):
    canon = {(r.label, r.original_id): r.canon_id
             for r in canonical_map(spark, layer_map).collect()}
    # G0102 and G0104 share the alias "Cobalt Viper" -> one canonical id
    assert canon[("group", "G0102")] == canon[("group", "G0104")] == "G0102"
    # Phishing exists as technique and capec but labels never merge
    assert canon[("technique", "T1566")] == "T1566"
    assert canon[("capec", "CAPEC-98")] == "CAPEC-98"
    # an alias-free group maps to itself
    assert canon[("group", "G0107")] == "G0107"
