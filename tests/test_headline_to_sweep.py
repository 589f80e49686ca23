"""tools/headline_to_sweep.py: gate-baseline rows translate into the sweep
schema tools/make_benchmarks_md.py consumes (name suffixing by kernel_mode,
impl collapse to int8, derived img/s)."""

import pytest

import importlib.util
import json
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _load():
    spec = importlib.util.spec_from_file_location(
        "headline_to_sweep", ROOT / "tools" / "headline_to_sweep.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_converts_every_mode_and_derives_img_per_s(tmp_path):
    src = tmp_path / "headline.json"
    out = tmp_path / "sweep.jsonl"
    src.write_text(json.dumps({
        "deit_tiny|b1|int8_static": {
            "model": "deit_tiny", "batch": 1, "kernel_mode": "int8_static",
            "ms": 0.05, "std_ms": 0.001, "iters": 100, "repeats": 5},
        "swin_tiny|b32|fused": {
            "model": "swin_tiny", "batch": 32, "kernel_mode": "fused",
            "ms": 6.4, "std_ms": 0.01, "iters": 100, "repeats": 5},
        "deit_tiny|b1|xla": {
            "model": "deit_tiny", "batch": 1, "kernel_mode": "xla",
            "ms": 0.09, "std_ms": 0.002, "iters": 100, "repeats": 5},
    }))
    _load().main(str(src), str(out))
    rows = {r["name"]: r for r in map(json.loads, out.read_text().splitlines())}
    assert rows["deit_tiny_int8_static"]["impl"] == "int8"
    assert rows["deit_tiny_int8_static"]["img_per_s"] == 20000.0
    assert rows["swin_tiny_fused"]["fused"] is True
    assert rows["swin_tiny_fused"]["img_per_s"] == 5000.0
    assert rows["deit_tiny"]["impl"] == "xla" and not rows["deit_tiny"]["fused"]
    # appends, never truncates: a second run doubles the line count
    _load().main(str(src), str(out))
    assert len(out.read_text().splitlines()) == 6
