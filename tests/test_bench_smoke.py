"""bench.py end-to-end smoke on CPU (tiny model, scan default path).

Catches bench refactor regressions (the contract is ONE JSON line with the
documented fields) without touching the TPU or the recorded baseline file.
"""

import importlib
import json
import sys
import os

import pytest


def test_bench_main_prints_json(tmp_path, capsys, monkeypatch):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    importlib.reload(bench)
    # keep the real BENCH_BASELINE.json (the TPU anchor) untouched
    monkeypatch.setattr(bench, "BASELINE_FILE", str(tmp_path / "baseline.json"))
    monkeypatch.delenv("CPCSV_BENCH_OVERRIDES", raising=False)
    monkeypatch.delenv("CPCSV_BENCH_STEP", raising=False)
    monkeypatch.delenv("CPCSV_BENCH_DONATE", raising=False)
    monkeypatch.delenv("CPCSV_BENCH_SCALE", raising=False)

    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec["metric"] == "train_frames_per_sec_per_chip"
    assert rec["unit"] == "frames/s"
    assert rec["value"] > 0
    assert rec["ms_per_step"] > 0
    assert rec["tflops_per_step"] > 0
    assert rec["vs_baseline"] == 1.0  # fresh baseline file in tmp_path
    # round-4 de-noising contract: median of N windows with spread fields
    assert rec["windows"] >= 1
    assert rec["ms_per_step_min"] <= rec["ms_per_step"] <= rec["ms_per_step_max"]
