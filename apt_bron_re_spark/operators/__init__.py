"""Pipeline operators: extract, mention, link, canonicalize, materialize,
plus training-data-pipeline operators (dedup, similarity, text stats)."""
