"""Surface-form variant generation and CPE word extraction.

Pure functions used on the driver when building the broadcast pattern
dictionaries, and inside pandas UDFs for per-hit search-term expansion.

Reference parity:
  * ``generate_variants``   — src/nodes_extraction/ner.py:23-37 (D1)
  * ``extract_cpe_words``   — src/data_prep/export_bron_nodes.py:31-48 (D7)
"""

from __future__ import annotations


def generate_variants(text: str) -> set[str]:
    """Six lowercase surface variants of an entity name or id.

    Identity, dash->space, underscore->space, space->underscore,
    space->removed, space->dash.  (Reference ner.py:23-37.)
    """
    base = text.lower()
    return {
        base,
        base.replace("-", " "),
        base.replace("_", " "),
        base.replace(" ", "_"),
        base.replace(" ", ""),
        base.replace(" ", "-"),
    }


def generate_variants_extended(text: str) -> set[str]:
    """The reference *test harness* variant set (tests/
    compare_groups_and_aliases.py:24-37): a smaller transform set (no
    underscore transforms) plus plural ``s``/``'s`` forms for variants not
    already ending in ``s``.  Not used by the pipeline itself (the pipeline
    matches the reference pipeline's ``generate_variants``); provided for
    coverage-analysis parity."""
    base = text.lower()
    variants = {
        base,
        base.replace("-", " "),
        base.replace(" ", ""),
        base.replace(" ", "-"),
    }
    plural_forms = set()
    for v in variants:
        if not v.endswith("s"):
            plural_forms.add(v + "s")
            plural_forms.add(v + "'s")
    return variants | plural_forms


def extract_cpe_words(original_id: str, version: str | None = None,
                      exclude_version: bool = False) -> list[str]:
    """Unique non-wildcard words of a CPE id, in first-seen order.

    Splits on ``:`` and skips the first three fields (``cpe:2.3:a``), drops
    ``*`` and ``-`` placeholders, optionally drops the version string.
    (Reference export_bron_nodes.py:31-48.)
    """
    parts = original_id.split(":")[3:]
    raw_words = [p for p in parts if p != "*" and p != "-"]

    seen: set[str] = set()
    words: list[str] = []
    for word in raw_words:
        if exclude_version and word == version:
            continue
        if word not in seen:
            seen.add(word)
            words.append(word)
    return words


def cpe_at_least(words: list[str]) -> int:
    """Minimum co-occurring word count for a CPE context hit.

    ``len(words) // 2 + 1`` (reference export_bron_nodes.py:87,94).
    """
    return len(words) // 2 + 1
