"""BENCHMARKS.md renderer (tools/make_benchmarks_md.py) off-TPU: the
fastest-p50 dedup across same-code sessions, the ±std / n noise columns
(verdict r2 weak #8), error-row supersession, and extras sections."""

import pytest

import importlib.util
import json
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _load_renderer():
    spec = importlib.util.spec_from_file_location(
        "make_benchmarks_md", ROOT / "tools" / "make_benchmarks_md.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _render(tmp_path, lines):
    jl = tmp_path / "sweep.jsonl"
    jl.write_text("".join(json.dumps(d) + "\n" for d in lines))
    out = tmp_path / "B.md"
    _load_renderer().main(str(jl), str(out))
    return out.read_text()


def test_dedup_keeps_fastest_p50_and_renders_noise_columns(tmp_path):
    md = _render(tmp_path, [
        {"check": "sweep start"},
        # two same-code sessions: jitter only adds time -> keep the min
        {"name": "deit_tiny_fused", "batch": 1, "fused": True,
         "impl": "fused", "ms": 0.0601, "img_per_s": 16639, "iters": 100},
        {"name": "deit_tiny_fused", "batch": 1, "fused": True,
         "impl": "fused", "ms": 0.0530, "img_per_s": 18868,
         "std_ms": 0.0021, "repeats": 5, "iters": 100},
        {"training_steps": {"deit_tiny_b64": {"finetune": {"p50_ms": 11.7}}}},
    ])
    assert "| ±std | n |" in md
    assert "| 0.0530 | 0.0021 | 5x100 |" in md
    assert "0.0601" not in md  # slower same-code session row dropped
    assert "## training_steps" in md and "11.7" in md


def test_noisy_row_loses_to_quiet_row_even_if_faster(tmp_path):
    """A bursty-contention loop-delta can UNDERSHOOT (std ~ mean): the
    fastest-p50 dedup must prefer a quiet row over a faster-but-noisy one
    (std/p50 > 0.25), and only fall back to noisy rows when no quiet
    measurement exists for the key."""
    md = _render(tmp_path, [
        # noisy row is faster but std/p50 = 0.89 -> quiet 3.23 row wins
        {"name": "t2t_vit_14", "batch": 32, "fused": False, "impl": "xla",
         "ms": 2.8019, "img_per_s": 11421, "std_ms": 2.4904, "repeats": 3,
         "iters": 20},
        {"name": "t2t_vit_14", "batch": 32, "fused": False, "impl": "xla",
         "ms": 3.2275, "img_per_s": 9915, "std_ms": 0.2025, "repeats": 3,
         "iters": 20},
        # only-noisy key still renders (fallback)
        {"name": "swin_x", "batch": 1, "fused": True, "impl": "fused",
         "ms": 1.0, "img_per_s": 1000, "std_ms": 0.9, "repeats": 3,
         "iters": 20},
    ])
    assert "| 3.2275 |" in md and "| 2.8019 |" not in md
    assert "| 1.0000 |" in md


def test_legacy_no_std_row_loses_to_slower_quiet_row(tmp_path):
    """Rows from before std_ms landed carry no noise evidence, so they rank
    below any measured-quiet row: a contention undershoot recorded without
    std (t2t_7 b32 xla 1.33 vs 1.69 across interleaved clean-window A/Bs)
    must not stick as the published number."""
    md = _render(tmp_path, [
        {"name": "t2t_vit_7", "batch": 32, "fused": False, "impl": "xla",
         "ms": 1.3321, "img_per_s": 24022, "iters": 20},
        {"name": "t2t_vit_7", "batch": 32, "fused": False, "impl": "xla",
         "ms": 1.6903, "img_per_s": 18931, "std_ms": 0.1083, "repeats": 4,
         "iters": 20},
    ])
    assert "| 1.6903 |" in md and "| 1.3321 |" not in md


def test_two_repeats_are_not_noise_evidence(tmp_path):
    """std over 2 samples can be tiny while both land inside one contention
    burst (observed int8 1.429 '±0.00001' at 2x20 vs 1.71-1.79 clean): rows
    with repeats < 3 rank with the no-evidence tier, so a slower >=3-repeat
    quiet row wins."""
    md = _render(tmp_path, [
        {"name": "t2t_vit_7_int8_static", "batch": 32, "fused": True,
         "impl": "int8", "ms": 1.4290, "img_per_s": 22393,
         "std_ms": 0.00001, "repeats": 2, "iters": 20},
        {"name": "t2t_vit_7_int8_static", "batch": 32, "fused": True,
         "impl": "int8", "ms": 1.6913, "img_per_s": 18920,
         "std_ms": 0.0793, "repeats": 3, "iters": 20},
    ])
    assert "| 1.6913 |" in md and "| 1.4290 |" not in md


def test_legacy_rows_without_std_render_dashes(tmp_path):
    md = _render(tmp_path, [
        {"name": "swin_tiny", "batch": 1, "fused": False, "impl": "xla",
         "ms": 0.4308, "img_per_s": 2321, "iters": 100},
    ])
    row = next(l for l in md.splitlines() if l.startswith("| swin_tiny "))
    assert "| — | — |" in row


def test_error_rows_superseded_by_later_success(tmp_path):
    md = _render(tmp_path, [
        {"name": "t2t_vit_7_int8_static", "batch": 1, "impl": "int8",
         "error": "RuntimeError: tunnel down"},
        {"name": "t2t_vit_7_int8_static", "batch": 1, "fused": True,
         "impl": "int8", "ms": 0.08, "img_per_s": 12500,
         "std_ms": 0.001, "repeats": 5, "iters": 100},
        {"name": "only_failed", "batch": 1, "impl": "xla",
         "error": "ValueError: boom"},
    ])
    assert "tunnel down" not in md
    assert "## Errors" in md and "only_failed" in md


def test_memory_footprint_renders_as_table(tmp_path):
    """The memory_footprint extras record (tools/memory_table.py) renders as
    a markdown table — the reference's TFLite init/peak-memory lines."""
    md = _render(tmp_path, [
        {"name": "deit_tiny", "batch": 1, "fused": False, "impl": "xla",
         "ms": 0.089, "img_per_s": 11237, "std_ms": 0.002, "repeats": 3,
         "iters": 100},
        {"memory_footprint": {
            "deit_tiny_b1_int8_static": {
                "args_mb": 7.4, "out_mb": 0.004, "temp_mb": 0.0,
                "code_mb": 3.91, "total_mb": 11.31, "init_s": 8.76},
            "error:swin_rows": "RuntimeError: tunnel down",
        }},
    ])
    assert "## memory_footprint" in md
    assert ("| deit_tiny_b1_int8_static | 7.4 | 0.004 | 0.0 | 3.91 | 11.31 "
            "| 8.76 |") in md
    assert "error: RuntimeError: tunnel down" in md
