"""Regenerate the gold fixtures (tests/fixtures/gold_triples.json).

The gold is produced by the INDEPENDENT reference interpreter
(scripts/ref_interpreter.py) — a straight-line Python implementation of
the reference semantics sharing no transformation code with the pipeline —
so the P/R >= 0.95 gate validates the pipeline against an independent
derivation, not against its own frozen output.
"""
import runpy
import sys
from pathlib import Path

sys.argv = [sys.argv[0], "60"]
runpy.run_path(str(Path(__file__).with_name("ref_interpreter.py")),
               run_name="__main__")
