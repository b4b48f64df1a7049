"""Pipeline orchestration: staged tables, lineage, resume."""
