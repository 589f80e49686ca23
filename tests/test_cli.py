"""CLI smoke tests (subprocess-free: call main() directly on CPU)."""

import json
import os

import numpy as np
import pytest

from edgevisiontransformer_tpu.cli import main


def test_models_list(capsys):
    assert main(["models"]) == 0
    out = capsys.readouterr().out
    assert "deit_tiny" in out and "swin_base" in out and "t2t_vit_14" in out


def test_help():
    assert main([]) == 0
    assert main(["bogus_command"]) == 1


def test_flops_cmd(capsys):
    assert main(["flops"]) == 0
    data = json.loads(capsys.readouterr().out)
    assert data["model_flops"]["deit_tiny"] == 2548260836


def test_analyse_op_cmd(tmp_path, capsys):
    f = tmp_path / "p.csv"
    f.write_text(
        "x\nOperator-wise Profiling Info for Regular Benchmark Run\n\n"
        "node type,name,avg_ms,%,start\nSOFTMAX,a,1.0,50%,0\nSOFTMAX,b,1.0,50%,1\n\n"
    )
    assert main(["analyse_op", "--file", str(f)]) == 0
    out = capsys.readouterr().out
    assert "SOFTMAX" in out and "2.00" in out


def test_prune_heads_cmd(tmp_path, capsys):
    imp = tmp_path / "imp.txt"
    np.savetxt(imp, np.random.RandomState(0).rand(12, 3))
    assert main([
        "prune_heads", "--model", "deit_tiny", "--importance-file", str(imp),
        "--prune-percent", "30",
    ]) == 0
    out = capsys.readouterr().out
    assert "heads_per_layer" in out


def test_convert_cmd(tmp_path, capsys):
    out_dir = tmp_path / "ckpt"
    assert main([
        "convert", "--model", "deit_tiny", "--quantization", "dynamic",
        "--output", str(out_dir),
    ]) == 0
    assert (out_dir / "meta.json").exists()
    meta = json.loads((out_dir / "meta.json").read_text())
    assert meta["quantization"] == "dynamic"


def test_eval_cmd_impl_consistency(tmp_path, capsys):
    """Same tiny ImageFolder through xla and int8 impls (cross-runtime
    consistency analogue)."""
    from PIL import Image

    rng = np.random.RandomState(0)
    for cls in ["a", "b"]:
        d = tmp_path / "val" / cls
        d.mkdir(parents=True)
        for i in range(2):
            Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(
                d / f"{i}.jpg")
    for impl in ("xla", "int8"):
        assert main([
            "eval", "--model", "deit_tiny", "--data-dir", str(tmp_path / "val"),
            "--batch", "2", "--impl", impl,
        ]) == 0
        out = capsys.readouterr().out
        assert "top1" in out


def test_registry_covers_cnn_zoo():
    from edgevisiontransformer_tpu.models.registry import available_models, build_model

    names = available_models()
    assert "mobilenet_v2" in names and "inception_v3" in names
    import jax
    import jax.numpy as jnp

    model, shape = build_model("mobilenet_v2", dtype=jnp.bfloat16)
    assert shape == (3, 224, 224)
    v = jax.eval_shape(lambda: model.init(jax.random.key(0), jnp.ones((1,) + shape)))
    assert "params" in v
