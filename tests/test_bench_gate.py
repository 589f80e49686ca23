"""Bench regression gate logic (tools/bench_gate.py) off-TPU: baseline
write, pass/fail drift classification, stale-row detection.  The measure
step is stubbed — on-chip measurement is exercised by run.sh bench_gate."""

import pytest

import importlib.util
import json
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _load_gate():
    spec = importlib.util.spec_from_file_location(
        "bench_gate", ROOT / "tools" / "bench_gate.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _rows(ms_by_key):
    return {
        k: {"model": k.split("|")[0], "batch": 1, "kernel_mode": "fused",
            "ms": ms, "std_ms": 0.001, "iters": 100, "repeats": 5}
        for k, ms in ms_by_key.items()
    }


def test_gate_update_writes_baseline_and_passes(tmp_path, monkeypatch, capsys):
    gate = _load_gate()
    monkeypatch.setattr(gate, "BASELINE_PATH", tmp_path / "headline.json")
    monkeypatch.setattr(gate, "measure_rows",
                        lambda: _rows({"a|b1|fused": 0.100}))
    assert gate.main(["--update"]) == 0
    saved = json.loads((tmp_path / "headline.json").read_text())
    assert saved["a|b1|fused"]["ms"] == 0.100
    # re-run within tolerance: ok
    monkeypatch.setattr(gate, "measure_rows",
                        lambda: _rows({"a|b1|fused": 0.105}))
    assert gate.main([]) == 0
    assert "bench_gate OK" in capsys.readouterr().out


def test_gate_fails_on_drift_and_stale_rows(tmp_path, monkeypatch, capsys):
    gate = _load_gate()
    monkeypatch.setattr(gate, "BASELINE_PATH", tmp_path / "headline.json")
    baseline = _rows({"a|b1|fused": 0.100, "gone|b1|fused": 0.2})
    (tmp_path / "headline.json").write_text(json.dumps(baseline))
    # 20% regression on a, missing baseline row for new, stale row gone
    monkeypatch.setattr(gate, "measure_rows",
                        lambda: _rows({"a|b1|fused": 0.120,
                                       "new|b1|fused": 0.05}))
    assert gate.main([]) == 1
    out = capsys.readouterr().out
    assert "drifted" in out and "no baseline row" in out
    assert "no longer measured" in out
    # wider tolerance passes the drift but stale/missing rows still fail
    assert gate.main(["--tolerance", "0.5"]) == 1


def test_gate_fast_drift_warns_but_passes(tmp_path, monkeypatch, capsys):
    """Faster-than-tolerance is not a regression (b1 rows land 10-30%
    under baseline in lucky quiet windows) — warn + re-baseline hint,
    exit 0."""
    gate = _load_gate()
    monkeypatch.setattr(gate, "BASELINE_PATH", tmp_path / "headline.json")
    (tmp_path / "headline.json").write_text(
        json.dumps(_rows({"a|b1|fused": 0.100})))
    monkeypatch.setattr(gate, "measure_rows",
                        lambda: _rows({"a|b1|fused": 0.080}))
    assert gate.main([]) == 0
    out = capsys.readouterr().out
    assert "fast" in out and "re-baseline" in out


def test_gate_sweep_out_appends_sweep_schema_rows(tmp_path, monkeypatch):
    gate = _load_gate()
    monkeypatch.setattr(gate, "BASELINE_PATH", tmp_path / "headline.json")
    monkeypatch.setattr(gate, "measure_rows",
                        lambda: _rows({"deit_tiny|b1|fused": 0.05}))
    sweep = tmp_path / "sweep.jsonl"
    assert gate.main(["--update", "--sweep-out", str(sweep)]) == 0
    row = json.loads(sweep.read_text().strip())
    assert row["name"] == "deit_tiny_fused" and row["impl"] == "fused"
    assert row["ms"] == 0.05 and row["repeats"] == 5
    assert row["img_per_s"] == 20000.0


def test_gate_missing_baseline_writes_one(tmp_path, monkeypatch):
    gate = _load_gate()
    monkeypatch.setattr(gate, "BASELINE_PATH", tmp_path / "none.json")
    monkeypatch.setattr(gate, "measure_rows",
                        lambda: _rows({"a|b1|fused": 0.1}))
    assert gate.main([]) == 0  # first run bootstraps the baseline
    assert (tmp_path / "none.json").exists()


def test_probe_int4_pack_roundtrip():
    """tools/probe_int4.py nibble packing: pairs (j, j+n/2) per byte so the
    [hi, lo] concat unpack restores natural column order exactly."""
    import importlib.util
    import pathlib

    import numpy as np

    root = pathlib.Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "probe_int4", root / "tools" / "probe_int4.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.RandomState(3)
    w = rng.randint(-8, 8, (32, 20)).astype(np.int8)
    packed = np.asarray(mod.pack_nibbles(w))
    assert packed.shape == (32, 10)
    unpacked = np.asarray(mod.unpack_nibbles(packed))
    np.testing.assert_array_equal(unpacked, w)
