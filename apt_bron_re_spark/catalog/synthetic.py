"""Deterministic synthetic BRON node catalog.

Replaces the reference's Neo4j export (src/data_prep/export_bron_nodes.py,
S6/S8): one list of records per label, with the exact record schemas of the
exported layer JSONs (FIXTURES.md §2):

  * tactic/capec/cwe/technique: ``{name, original_id}``
  * group adds ``MITRE_aliases`` / ``malpedia_aliases``
    (mitre_groups_to_aliases.py:36-39, malpedia_groups_to_aliases.py:41-57)
  * software adds ``software_type`` (export_bron_nodes.py:22)
  * cpe splits into cpe_versioned / cpe_unversioned with
    ``product, vendor, version, words, at_least`` (export_bron_nodes.py:75-94)

The catalog is hand-authored (not random) so the tricky cases are guaranteed
present: colliding variants across nodes (first-writer-wins,
basic.py:78,91,96,105), an alias equal to another label's name (cross-label
link case, ner.py:179-198), multi-word names exercising every variant
transform, and a "hub" group for the skew fixtures.
"""

from __future__ import annotations

from ..functions.variants import cpe_at_least, extract_cpe_words

_TACTICS = [
    ("Initial Access", "TA0001"),
    ("Execution", "TA0002"),
    ("Persistence", "TA0003"),
    ("Privilege Escalation", "TA0004"),
    ("Defense Evasion", "TA0005"),
    ("Credential Access", "TA0006"),
    ("Discovery", "TA0007"),
    ("Lateral Movement", "TA0008"),
    ("Collection", "TA0009"),
    ("Exfiltration", "TA0010"),
    ("Command and Control", "TA0011"),
    ("Impact", "TA0040"),
]

_TECHNIQUES = [
    ("Command and Scripting Interpreter", "T1059"),
    ("PowerShell", "T1059.001"),
    ("Windows Command Shell", "T1059.003"),
    ("Phishing", "T1566"),
    ("Spearphishing Attachment", "T1566.001"),
    ("OS Credential Dumping", "T1003"),
    ("LSASS Memory", "T1003.001"),
    ("Scheduled Task", "T1053.005"),
    ("Remote Services", "T1021"),
    ("Data Encrypted for Impact", "T1486"),
    ("Exfiltration Over C2 Channel", "T1041"),
    ("Process Injection", "T1055"),
    ("Masquerading", "T1036"),
    ("Ingress Tool Transfer", "T1105"),
    ("Lateral Tool Transfer", "T1570"),
]

# (name, original_id, MITRE_aliases, malpedia_aliases)
_GROUPS = [
    ("Crimson Mantis", "G0101",
     ["Hidden Cobra", "Scarlet Hive"], ["mantis-crew"]),
    ("Azure Serpent", "G0102",
     ["Cobalt Viper"], ["serpent_gang", "azure-serpent"]),
    ("Quiet Lynx", "G0103", [], ["lynx-team"]),
    # alias collides with another group's alias -> first-writer-wins (D4)
    ("Amber Wolf", "G0104", ["Cobalt Viper", "Night Howler"], []),
    # alias equals a software name -> cross-label case (L3)
    ("Iron Sparrow", "G0105", ["ShadowPad"], []),
    # the hub entity for skew fixtures
    ("Obsidian Tiger", "G0106", ["ObsidianTiger", "Stone Cat"], ["obsidian_tiger"]),
    ("Velvet Crow", "G0107", [], []),
]

# (name, original_id, software_type)
_SOFTWARE = [
    ("Mimikatz", "S0002", "tool"),
    ("ShadowPad", "S0596", "malware"),
    ("Cobalt Strike", "S0154", "tool"),
    ("PlugX", "S0013", "malware"),
    ("Empire", "S0363", "tool"),
    ("Night Howler", "S0901", "malware"),  # collides with a group alias
    ("QuasarRAT", "S0262", "malware"),
    ("BloodHound", "S0521", "tool"),
    ("Raccoon Stealer", "S0902", "malware"),
    ("SharpHound", "S0903", "tool"),
]

_CAPEC = [
    ("SQL Injection", "CAPEC-66"),
    ("Cross Site Scripting", "CAPEC-63"),
    ("Phishing", "CAPEC-98"),  # same name as technique Phishing (collision across labels)
    ("Session Hijacking", "CAPEC-593"),
    ("Buffer Overflow via Environment Variables", "CAPEC-10"),
    ("Using Malicious Files", "CAPEC-563"),
]

_CWE = [
    ("Improper Input Validation", "CWE-20"),
    ("Out-of-bounds Write", "CWE-787"),
    ("SQL Injection", "CWE-89"),  # collides with CAPEC name inside another label
    ("Use After Free", "CWE-416"),
    ("Cross-site Request Forgery", "CWE-352"),
    ("Path Traversal", "CWE-22"),
]

# (product, vendor, version) -> cpe:2.3 original_id
_CPES = [
    ("struts", "apache", "2.3.31"),
    ("log4j", "apache", "2.14.1"),
    ("exchange_server", "microsoft", "2019"),
    ("safari", "apple", "17.6"),
    ("openssl", "openssl", "1.0.2k"),
    # unversioned (version "*" / "-") -> cpe_unversioned (dead code path M6)
    ("windows_10", "microsoft", "*"),
    ("chrome", "google", "-"),
]


def _cpe_id(vendor: str, product: str, version: str) -> str:
    return f"cpe:2.3:a:{vendor}:{product}:{version}:*:*:*:*:*:*:*"


def build_layer_map() -> dict[str, list[dict]]:
    """The full synthetic catalog, shaped like the reference layer JSONs."""
    layers: dict[str, list[dict]] = {
        "tactic": [{"name": n, "original_id": i} for n, i in _TACTICS],
        "technique": [{"name": n, "original_id": i} for n, i in _TECHNIQUES],
        "capec": [{"name": n, "original_id": i} for n, i in _CAPEC],
        "cwe": [{"name": n, "original_id": i} for n, i in _CWE],
        "group": [
            {"name": n, "original_id": i,
             "MITRE_aliases": ma, "malpedia_aliases": pa}
            for n, i, ma, pa in _GROUPS
        ],
        "software": [
            {"name": n, "original_id": i, "software_type": t}
            for n, i, t in _SOFTWARE
        ],
    }

    versioned: list[dict] = []
    unversioned: list[dict] = []
    for product, vendor, version in _CPES:
        oid = _cpe_id(vendor, product, version)
        node = {
            "name": oid,
            "original_id": oid,
            "product": product,
            "vendor": vendor,
            "version": version,
        }
        if version not in ("*", "-"):
            words = extract_cpe_words(oid, version, exclude_version=True)
            node["words"] = words
            node["at_least"] = cpe_at_least(words)
            versioned.append(node)
        else:
            words = extract_cpe_words(oid)
            node["words"] = words
            node["at_least"] = cpe_at_least(words)
            unversioned.append(node)
    layers["cpe_versioned"] = versioned
    layers["cpe_unversioned"] = unversioned
    return layers


# Exact-count goldens in the style of the reference's tests/neo4j_test.py:25-58.
EXPECTED_COUNTS = {
    "tactic": len(_TACTICS),
    "technique": len(_TECHNIQUES),
    "group": len(_GROUPS),
    "software": len(_SOFTWARE),
    "capec": len(_CAPEC),
    "cwe": len(_CWE),
    "cpe_versioned": sum(1 for _, _, v in _CPES if v not in ("*", "-")),
    "cpe_unversioned": sum(1 for _, _, v in _CPES if v in ("*", "-")),
}
