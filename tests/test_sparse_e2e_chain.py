"""End-to-end movement-pruning artifact chain (VERDICT r3 directive #4).

CPU version of run.sh sparse_e2e: preset -> sparse_train (4 steps,
synthetic) -> compiled shrunken checkpoint -> convert --quantization int8
honoring the checkpoint's embedded pruned config -> benchmark
--quantized-checkpoint rebuilds the exact pruned model from the artifact
meta (timer stubbed) -> quant_accuracy --checkpoint runs the drift table on
the compiled params.  The TPU recording of the same chain lives in
BENCHMARKS.md sparse_e2e.
"""

import json

import jax
import pytest

from edgevisiontransformer_tpu.cli import main


@pytest.fixture(scope="module")
def sparse_ckpt(tmp_path_factory):
    out_dir = tmp_path_factory.mktemp("e2e") / "ckpt"
    rc = main([
        "sparse_train", "--model", "deit_tiny", "--synthetic", "2",
        "--batch", "2", "--steps", "4", "--warmup-steps", "2",
        "--preset", "topk-hybrid-struct-layerwise-tiny",
        "--layerwise-thresholds", "-".join(["h_0.67_d_0.5"] * 12),
        "--output", str(out_dir),
    ])
    assert rc == 0
    return out_dir


def test_convert_honors_compiled_config(sparse_ckpt, tmp_path, capsys):
    meta = json.loads((sparse_ckpt / "meta.json").read_text())
    assert "config" in meta and meta["heads_per_layer"]

    out_dir = tmp_path / "int8"
    rc = main(["convert", "--checkpoint", str(sparse_ckpt),
               "--quantization", "int8", "--model", "deit_tiny",
               "--calib-batches", "2", "--output", str(out_dir)])
    assert rc == 0
    art_meta = json.loads((out_dir / "meta.json").read_text())
    # artifact embeds the pruned config so every consumer rebuilds the
    # exact shrunken shapes
    assert art_meta["config"]["heads_per_layer"] == meta["heads_per_layer"]
    assert art_meta["config"]["mlp_dim_per_layer"] == meta["mlp_dim_per_layer"]

    # consume: benchmark rebuilds the pruned model from the artifact meta
    import edgevisiontransformer_tpu.bench.looptimer as lt

    orig = lt.measure_op_time
    try:
        def stub(fn, args, **kw):
            out = jax.eval_shape(fn, *args)
            assert out.shape[-1] == 1000
            return {"p50_ms": 1.0, "avg_ms": 1.0, "std_ms": 0.0,
                    "min_ms": 1.0, "max_ms": 1.0,
                    "iters": kw.get("iters", 1),
                    "repeats": kw.get("repeats", 1)}

        lt.measure_op_time = stub
        rc = main(["benchmark", "--quantized-checkpoint", str(out_dir),
                   "--iters", "2", "--repeats", "1"])
    finally:
        lt.measure_op_time = orig
    assert rc == 0


def test_quant_accuracy_on_compiled_checkpoint(sparse_ckpt, capsys):
    rc = main(["quant_accuracy", "--checkpoint", str(sparse_ckpt),
               "--batches", "1", "--batch", "2", "--calib-batches", "2"])
    assert rc in (0, None)
    out = capsys.readouterr().out
    stats = json.loads(out.strip().splitlines()[-1])
    assert {"bf16", "dynamic_int8", "static_int8"} <= set(stats)
    # the pruned config was actually used (printout mentions it)
    assert "checkpoint config" in out
