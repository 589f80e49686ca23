"""Profiler CSV + analyser roundtrip tests (CPU; timings meaningless but the
schema/aggregation logic is what's under test)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from edgevisiontransformer_tpu.bench.analyse import (
    analyse_attn_ffn,
    analyse_gelu_ln,
    analyse_op,
    fetch_all_op_latency,
    find_op_wise_range,
)
from edgevisiontransformer_tpu.bench.profile import profile_vit, write_profile_csv
from edgevisiontransformer_tpu.models.vit import ViT, deit_config


def _csv_repr(v: float) -> float:
    """avg_ms exactly as it survives the "%.6f" CSV round trip."""
    return float(f"{v:.6f}")


def _make_csv(tmp_path):
    cfg = deit_config("tiny").replace(
        image_size=32, patch_size=16, dim=64, depth=2, heads=2, mlp_dim=128,
        num_classes=10,
    )
    model = ViT(cfg)
    x = jnp.ones((1, 3, 32, 32))
    params = model.init(jax.random.key(0), x)
    rows, total = profile_vit(model, params, x, iters=3, repeats=1)
    path = str(tmp_path / "profile.csv")
    write_profile_csv(path, rows, total)
    return path, rows, total


def test_profile_and_analyse_roundtrip(tmp_path):
    path, rows, total = _make_csv(tmp_path)
    # schema found
    import csv as _csv

    with open(path) as f:
        raw = list(_csv.reader(f))
    b, e, schema = find_op_wise_range(raw)
    assert {"node type", "name", "avg_ms", "%", "start"} <= set(schema)
    assert e - b == len(rows)

    table = analyse_op(path)
    assert "FULLY_CONNECTED" in table and "ATTENTION" in table
    # Aggregated latency equals sum of rows.  The CSV stores avg_ms as
    # "%.6f", so the oracle is the round-tripped representation, not the raw
    # float (a raw-float rtol here flakes on sub-µs CPU rows).
    agg = sum(v["latency"] for v in table.values())
    expected = sum(_csv_repr(r["avg_ms"]) for r in rows)
    np.testing.assert_allclose(agg, expected, rtol=1e-9, atol=1e-12)


def test_attn_ffn_split(tmp_path):
    path, rows, _ = _make_csv(tmp_path)
    split = analyse_attn_ffn(path)
    attn_expected = sum(_csv_repr(r["avg_ms"]) for r in rows if "/attn/" in r["name"])
    np.testing.assert_allclose(split["attention_ms"], attn_expected, rtol=1e-9, atol=1e-12)
    ffn_expected = sum(_csv_repr(r["avg_ms"]) for r in rows if "/ffn/" in r["name"])
    np.testing.assert_allclose(split["ffn_ms"], ffn_expected, rtol=1e-9, atol=1e-12)


def test_gelu_ln_and_series(tmp_path):
    path, rows, _ = _make_csv(tmp_path)
    g = analyse_gelu_ln(path)
    # CPU loop-delta times can legitimately be 0.0 for tiny ops; check the
    # aggregation picked up the right row classes instead of positivity.
    ln_expected = sum(_csv_repr(r["avg_ms"]) for r in rows if r["node_type"] == "LAYER_NORM")
    np.testing.assert_allclose(g["layernorm_ms"], ln_expected, rtol=1e-9, atol=1e-12)
    # activation-only rows (profile emits fc1/gelu/fc2 separately so the
    # GELU share matches the reference's POW-decomposition semantics)
    gelu_expected = sum(_csv_repr(r["avg_ms"]) for r in rows if r["node_type"] == "GELU")
    assert any(r["node_type"] == "GELU" for r in rows)
    assert not any(r["node_type"] == "GELU_MLP" for r in rows)
    np.testing.assert_allclose(g["gelu_ms"], gelu_expected, rtol=1e-9, atol=1e-12)
    series = fetch_all_op_latency(path)
    assert len(series) == len(rows)
    assert series[0][0] == rows[0]["name"]  # ordered by start


def test_gelu_mlp_legacy_rows_still_counted(tmp_path):
    """Old CSVs with the coarse GELU_MLP rows keep working."""
    path = str(tmp_path / "legacy.csv")
    with open(path, "w") as f:
        f.write(
            "Operator-wise Profiling Info for Regular Benchmark Run\n"
            "\n"
            "node type,name,avg_ms,%,start\n"
            "LAYER_NORM,b0/ln,0.5,25%,0.0\n"
            "GELU_MLP,b0/mlp,1.5,75%,0.5\n"
            "\n"
        )
    g = analyse_gelu_ln(path)
    assert g["gelu_ms"] == 1.5 and g["layernorm_ms"] == 0.5


def test_profile_trace_mode(tmp_path):
    """Real-device-trace mode: per-HLO-op rows from jax.profiler, CSV
    roundtrip through the analyser, per-op sum is finite and positive
    (the §4.4 reconciliation oracle runs on TPU via `cli profile --mode
    trace`; here the CPU backend exercises the parse/aggregate path)."""
    from edgevisiontransformer_tpu.bench.profile import profile_trace

    f = jax.jit(lambda x: jnp.tanh(x @ x) @ x)
    x = jnp.ones((256, 256))
    f(x).block_until_ready()

    def run_once():
        jax.device_get(f(x))

    rows, total = profile_trace(run_once, iters=4, warmup=1)
    assert rows and total > 0
    names = [r["name"] for r in rows]
    assert any("dot" in n for n in names), names
    assert any(r["node_type"] == "FULLY_CONNECTED" for r in rows)
    path = str(tmp_path / "trace.csv")
    write_profile_csv(path, rows, total)
    table = analyse_op(path)
    agg = sum(v["latency"] for v in table.values())
    assert agg > 0


def test_reference_style_csv_flex_renaming(tmp_path):
    """Analyser must also parse reference-format CSVs incl. Flex rows."""
    path = str(tmp_path / "ref.csv")
    with open(path, "w") as f:
        f.write(
            "junk line\n"
            "Operator-wise Profiling Info for Regular Benchmark Run\n"
            "\n"
            "node type,name,avg_ms,%,start\n"
            "TfLiteFlexDelegate,model/roll_1:0,1.5,10%,0.0\n"
            "CONV_2D,model/conv,3.0,20%,1.5\n"
            "\n"
        )
    table = analyse_op(path, model_type="swin")
    assert table["ROLL"]["latency"] == 1.5
    assert table["CONV_2D"]["percent"] == 20.0
