"""Fixed-work CPU probe (scripts/calib.py): ref-file semantics and the
bench_scaling wiring.

The probe exists because vCPU steal only counts runnable-time theft —
a window where the hypervisor merely slows cycles reads quiet-but-slow
(round 6 measured every pipeline stage at ~1.22x baseline under a
5.9 s steal bracket).  These tests pin the reference-file min-ever
semantics and that the measurement templates actually carry the probe;
the probe's wall time itself is host-dependent and not asserted.
"""
from __future__ import annotations

import importlib
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))

calib = importlib.import_module("calib")


def test_probe_returns_positive_seconds():
    # tiny iteration count: asserts mechanics, not host speed
    s = calib.cpu_calib_s(iters=50, reps=2)
    assert 0 < s < 5


def test_update_ref_keeps_minimum(tmp_path, monkeypatch):
    monkeypatch.setattr(calib, "REF_PATH", tmp_path / "calib_ref.json")
    assert calib.read_ref() is None
    assert calib.update_ref(0.30) == 0.30
    # slower observation never raises the reference
    assert calib.update_ref(0.45) == 0.30
    # faster one lowers it, and it persists
    assert calib.update_ref(0.25) == 0.25
    on_disk = json.loads((tmp_path / "calib_ref.json").read_text())
    assert on_disk["calib_ref_s"] == 0.25


def test_degradation_ratio(tmp_path, monkeypatch):
    monkeypatch.setattr(calib, "REF_PATH", tmp_path / "calib_ref.json")
    assert calib.degradation(0.3) is None  # no reference yet
    calib.update_ref(0.25)
    assert calib.degradation(0.25) == 1.0
    assert calib.degradation(0.305) == 1.22
    # explicit ref overrides the file
    assert calib.degradation(0.5, ref=0.25) == 2.0


def test_runner_template_carries_probe():
    """The scaling subprocess template must import the probe and emit
    both bracket fields — a format()-time regression would otherwise
    only surface during an hours-long protocol run."""
    import bench_scaling as bs
    code = bs.RUNNER.format(repo=str(REPO), cpus=2, n_pages=10,
                            shuffle=2, page_scale=1, hub_rate=None)
    assert "from calib import cpu_calib_s" in code
    assert '"calib_in_s"' in code and '"calib_out_s"' in code
    compile(code, "<runner>", "exec")  # template yields valid python
