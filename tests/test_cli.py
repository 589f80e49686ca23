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


def test_convert_int8_static_differs_from_dynamic(tmp_path, capsys):
    """convert --quantization int8 must run the calibration pass and save
    activation scales (the full-integer mode the reference gets from
    TFLITE_BUILTINS_INT8) — NOT the dynamic path."""
    out_dir = tmp_path / "ckpt8"
    assert main([
        "convert", "--model", "deit_tiny", "--quantization", "int8",
        "--calib-batches", "2", "--output", str(out_dir),
    ]) == 0
    meta = json.loads((out_dir / "meta.json").read_text())
    assert meta["quantization"] == "int8"
    scales = np.asarray(meta["act_scales"])
    assert scales.shape == (12, 4) and (scales > 0).all()
    assert "calibrated" in capsys.readouterr().out


def test_convert_swin_dynamic_saves_stage_stacks(tmp_path, capsys):
    """Swin convert saves the per-stage stacked int8 kernel pytree (stage 0
    excluded by the whole-stage min-dim gate at dim 96)."""
    out_dir = tmp_path / "swin8"
    assert main([
        "convert", "--model", "swin_tiny", "--quantization", "dynamic",
        "--output", str(out_dir),
    ]) == 0
    meta = json.loads((out_dir / "meta.json").read_text())
    assert meta["int8_stages"] == [1, 2, 3]
    from edgevisiontransformer_tpu.utils.checkpoint import load_checkpoint

    tree = load_checkpoint(str(out_dir))
    assert set(tree) == {"stage_1", "stage_2", "stage_3", "variables"}
    assert "qkv_w" in tree["stage_1"] and "act_inv" not in tree["stage_1"]
    # the bundled float variables make the artifact standalone-runnable
    assert "params" in tree["variables"]


def test_swin_artifact_dtype_reconciliation(tmp_path, monkeypatch, capsys):
    """Loading a (fp32-saved) Swin artifact at --dtype bfloat16 must cast
    the float glue to the compute dtype — the same dtype mix the
    prepare-time path produces — while int8 weights and fp32 scales keep
    their artifact dtypes.  Then the benchmark consume path traces."""
    import jax
    import jax.numpy as jnp

    import edgevisiontransformer_tpu.bench.looptimer as lt
    from edgevisiontransformer_tpu.cli import _load_quantized_artifact

    out_dir = tmp_path / "swin_dyn"
    assert main(["convert", "--model", "swin_tiny",
                 "--quantization", "dynamic", "--output", str(out_dir)]) == 0

    model, in_shape, qargs, fn = _load_quantized_artifact(
        str(out_dir), "bfloat16")
    v, prep, q = qargs
    assert model.config.dtype == jnp.bfloat16
    # float glue follows the compute dtype
    leaf = v["params"]["patch_kernel"]
    assert leaf.dtype == jnp.bfloat16
    st = q[1]
    assert st["qkv_w"].dtype == jnp.int8
    assert st["qkv_s"].dtype == jnp.float32
    for k in ("qkv_b", "proj_b", "fc1_b", "fc2_b", "ln1_g", "ln2_b"):
        assert st[k].dtype == jnp.bfloat16, (k, st[k].dtype)

    def stub(fn_, args_, **kw):
        out = jax.eval_shape(fn_, *args_)
        assert out.shape[-1] == 1000
        return {"p50_ms": 1.0, "avg_ms": 1.0, "std_ms": 0.0, "min_ms": 1.0,
                "max_ms": 1.0, "iters": kw.get("iters", 1),
                "repeats": kw.get("repeats", 1)}

    monkeypatch.setattr(lt, "measure_op_time", stub)
    rc = main(["benchmark", "--quantized-checkpoint", str(out_dir),
               "--iters", "2", "--repeats", "1"])
    assert rc == 0
    capsys.readouterr()


def test_quantized_checkpoint_consume(tmp_path, monkeypatch, capsys):
    """The convert -> run loop (reference tf2tflite -> mobile_benchmark /
    eval_tflite): benchmark and eval consume a saved dynamic/int8 artifact
    through the deployment kernels.  The timer / eval loop are stubbed with
    eval_shape so the kernel paths trace abstractly (no interpret-mode
    execution); stack bit-identity is asserted in test_quant."""
    import jax

    import edgevisiontransformer_tpu.bench.looptimer as lt
    import edgevisiontransformer_tpu.utils.imagenet as im

    out_dir = tmp_path / "dyn"
    assert main(["convert", "--model", "deit_tiny",
                 "--quantization", "dynamic", "--output", str(out_dir)]) == 0

    def stub(fn, args, **kw):
        out = jax.eval_shape(fn, *args)
        assert out.shape[-1] == 1000
        return {"p50_ms": 1.0, "avg_ms": 1.0, "std_ms": 0.0, "min_ms": 1.0,
                "max_ms": 1.0, "iters": kw.get("iters", 1),
                "repeats": kw.get("repeats", 1)}

    monkeypatch.setattr(lt, "measure_op_time", stub)
    rc = main(["benchmark", "--quantized-checkpoint", str(out_dir),
               "--iters", "2", "--repeats", "1"])
    assert rc == 0
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["model"] == str(out_dir)

    def eval_stub(apply_fn, params, *a, **kw):
        out = jax.eval_shape(apply_fn, params,
                             jax.ShapeDtypeStruct((2, 3, 224, 224),
                                                  jax.numpy.float32))
        assert out.shape == (2, 1000)
        return 0.5

    monkeypatch.setattr(im, "evaluate", eval_stub)
    rc = main(["eval", "--quantized-checkpoint", str(out_dir),
               "--data-dir", str(tmp_path)])
    assert rc == 0
    assert "top1 0.5000" in capsys.readouterr().out

    # T2T artifact: encoder int8, tokenizer float (constants preserved)
    t2t_dir = tmp_path / "t2t"
    assert main(["convert", "--model", "t2t_vit_7",
                 "--quantization", "dynamic", "--output", str(t2t_dir)]) == 0
    rc = main(["benchmark", "--quantized-checkpoint", str(t2t_dir),
               "--iters", "2", "--repeats", "1"])
    assert rc == 0
    capsys.readouterr()

    # a float16 cast artifact is NOT consumable through the int8 path
    fp_dir = tmp_path / "fp16"
    assert main(["convert", "--model", "deit_tiny",
                 "--quantization", "float16", "--output", str(fp_dir)]) == 0
    with pytest.raises(SystemExit):
        main(["benchmark", "--quantized-checkpoint", str(fp_dir)])


def test_plot_cmd(tmp_path, capsys):
    """plot renders the draw.py-style figures (anchor curve + measured
    latency-vs-MACs from a sweep jsonl)."""
    out = tmp_path / "ma.png"
    assert main(["plot", "macs_accuracy", "--output", str(out)]) == 0
    assert out.stat().st_size > 1000
    sweep = tmp_path / "s.jsonl"
    sweep.write_text(
        json.dumps({"name": "deit_tiny", "batch": 1, "ms": 0.08,
                    "img_per_s": 12500, "impl": "xla"}) + "\n"
        + json.dumps({"name": "pruned_deit_tiny@all_head1_ffn0.3_fused",
                      "batch": 1, "ms": 0.03, "img_per_s": 3e4,
                      "impl": "fused"}) + "\n")
    out2 = tmp_path / "lm.png"
    assert main(["plot", "latency_macs", "--sweep", str(sweep),
                 "--output", str(out2)]) == 0
    assert out2.stat().st_size > 1000


def test_quant_accuracy_cmd(capsys):
    assert main([
        "quant_accuracy", "--model", "deit_tiny", "--batches", "1",
        "--batch", "2", "--calib-batches", "2", "--with-mse",
    ]) == 0
    out = capsys.readouterr().out
    assert "static_int8" in out and "dynamic_int8" in out
    table = json.loads(out.strip().splitlines()[-1])
    # quantized logits stay in a sane envelope on random init
    assert table["static_int8"]["max_rel"] < 0.5
    assert table["dynamic_int8"]["max_rel"] < 0.5
    assert table["static_int8_mse"]["max_rel"] < 0.5


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


def test_eval_cmd_swin_fused_impls(tmp_path, capsys):
    """eval --impl fused/int8 dispatches Swin through the whole-stage
    kernels (was ViT-only and would mis-apply fused_vit_apply)."""
    from PIL import Image

    rng = np.random.RandomState(0)
    for cls in ["a", "b"]:
        d = tmp_path / "val" / cls
        d.mkdir(parents=True)
        Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(
            d / "0.jpg")
    for impl in ("fused", "int8"):
        assert main([
            "eval", "--model", "swin_tiny", "--data-dir",
            str(tmp_path / "val"), "--batch", "2", "--impl", impl,
        ]) == 0
        assert "top1" in capsys.readouterr().out


def _tiny_imagefolder(tmp_path, n_cls=2, n_img=2, size=64):
    from PIL import Image

    rng = np.random.RandomState(0)
    root = tmp_path / "val"
    for c in range(n_cls):
        d = root / f"cls{c}"
        d.mkdir(parents=True)
        for i in range(n_img):
            Image.fromarray(rng.randint(0, 255, (size, size, 3), np.uint8)).save(
                d / f"{i}.jpg")
    return str(root)


def test_prune_heads_requires_importance_source():
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["prune_heads", "--model", "deit_tiny", "--prune-percent", "30"])


def test_prune_heads_real_importance_and_eval(tmp_path, capsys):
    """No importance file: the CLI must compute real Taylor importance from
    data (not silently random) and can eval the pruned model."""
    data = _tiny_imagefolder(tmp_path)
    assert main([
        "prune_heads", "--model", "deit_tiny", "--data-dir", data,
        "--importance-batches", "1", "--batch", "2", "--limit", "2",
        "--prune-percent", "30", "--eval",
    ]) == 0
    out = capsys.readouterr().out
    assert "computed head importance from data" in out
    assert "heads_per_layer" in out
    assert "pruned top1" in out


def test_finetune_cmd(tmp_path, capsys):
    out_dir = tmp_path / "ft"
    assert main([
        "finetune", "--model", "deit_tiny", "--synthetic", "3", "--batch", "2",
        "--max-steps", "3", "--optimizer", "sgd", "--output", str(out_dir),
    ]) == 0
    assert (out_dir / "meta.json").exists()
    assert "finetune done" in capsys.readouterr().out


def test_sparse_train_cmd(tmp_path, capsys):
    out_dir = tmp_path / "sparse"
    assert main([
        "sparse_train", "--model", "deit_tiny", "--synthetic", "2",
        "--batch", "2", "--steps", "4", "--warmup-steps", "2",
        "--preset", "topk-hybrid-struct-layerwise-tiny",
        "--layerwise-thresholds", "-".join(["h_0.67_d_0.5"] * 12),
        "--output", str(out_dir),
    ]) == 0
    out = capsys.readouterr().out
    summary = json.loads(out.strip().splitlines()[-2])
    assert "heads_per_layer" in summary and len(summary["heads_per_layer"]) == 12
    meta = json.loads((out_dir / "meta.json").read_text())
    assert meta["preset"] == "topk-hybrid-struct-layerwise-tiny"


def test_latency_model_fit_predict_cmd(tmp_path, capsys):
    """fit/predict on a synthetic csv (collect needs a device worth timing)."""
    from edgevisiontransformer_tpu.utils.latency_model import (
        parse_features,
        sample_random_configs,
    )

    encs = sample_random_configs(30, depth=12, max_heads=3, seed=1)
    csv_path = tmp_path / "lat.csv"
    with open(csv_path, "w") as f:
        f.write("encoding,ms\n")
        for e in encs:
            feats = parse_features(e)
            ms = 0.01 * sum(feats[0::2]) + 0.02 * sum(feats[1::2])
            f.write(f"{e},{ms}\n")
    pkl = tmp_path / "lat.pkl"
    assert main(["latency_model", "fit", "--data", str(csv_path),
                 "--output", str(pkl)]) == 0
    out = capsys.readouterr().out
    assert "saved predictor" in out
    assert main(["latency_model", "predict", "--predictor", str(pkl),
                 "--encoding", encs[0]]) == 0
    assert "ms" in capsys.readouterr().out

    # --max-noise drops rows above their own noise floor (needs std column)
    csv2 = tmp_path / "lat_noise.csv"
    with open(csv2, "w") as f:
        f.write("encoding,ms,std_ms,iters\n")
        for i, e in enumerate(encs):
            feats = parse_features(e)
            ms = 0.01 * sum(feats[0::2]) + 0.02 * sum(feats[1::2])
            std = ms * (0.5 if i < 3 else 0.01)  # 3 noisy rows
            f.write(f"{e},{ms},{std},100\n")
    assert main(["latency_model", "fit", "--data", str(csv2),
                 "--output", str(pkl), "--max-noise", "0.05"]) == 0
    assert "dropping 3 rows" in capsys.readouterr().out
    with pytest.raises(SystemExit):
        main(["latency_model", "fit", "--data", str(csv_path),
              "--output", str(pkl), "--max-noise", "0.05"])


def test_logscrape_cmd(tmp_path, capsys):
    """logscrape = the reference's fetch_latency_std subcommand + the
    fetch_results marker walk, CLI-exposed (tools.py:1059-1060)."""
    log = tmp_path / "bench.log"
    log.write_text("Avg latency 1.2345 ms, Std 0.0321 ms\n"
                   "Mem footprint(MB): 26.66\ntop1 0.7221\n")
    assert main(["logscrape", "latency_std", "--file", str(log)]) == 0
    assert "1.2345 0.0321" in capsys.readouterr().out
    assert main(["logscrape", "mem", "--file", str(log)]) == 0
    assert "26.66" in capsys.readouterr().out
    assert main(["logscrape", "accuracy", "--file", str(log)]) == 0
    assert "0.7221" in capsys.readouterr().out
    d = tmp_path / "models" / "deit_tiny_p50"
    d.mkdir(parents=True)
    (d / "accuracy7221.txt").touch()
    assert main(["logscrape", "markers", "--dir", str(tmp_path / "models")]) == 0
    assert "deit_tiny_p50 0.7221" in capsys.readouterr().out


def test_experiments_prune_grid_cmd(capsys):
    assert main(["experiments", "prune_grid", "--size", "tiny"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert "all_head3_ffn0.9" in out and "all_head1_ffn1.0" in out


def test_experiments_micro_cmd(capsys):
    assert main(["experiments", "micro", "--dim", "32", "--heads", "2",
                 "--iters", "3", "--repeats", "1"]) == 0
    data = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(data) == {"attention", "ffn", "dense_plus_input"}


def test_benchmark_train_rejects_sparse_non_vit():
    """sparse mode addresses the ViT param tree; non-ViT models must fail
    loudly, not crash inside init_mask_scores."""
    with pytest.raises(SystemExit, match="ViT-family"):
        main(["benchmark_train", "--model", "swin_tiny", "--mode", "sparse",
              "--batch", "2", "--iters", "2", "--repeats", "1"])


def test_main_coerces_non_int_returns(capsys):
    """cmd_benchmark returns its result dict for programmatic callers;
    main() must still exit 0 (a dict reaching sys.exit means exit 1)."""
    rc = main(["benchmark", "--model", "deit_tiny", "--batch", "1",
               "--iters", "2", "--repeats", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert json.loads(out.strip().splitlines()[-1])["model"] == "deit_tiny"


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


def test_benchmark_int8_dispatch_arity_t2t_and_pruned(monkeypatch):
    """cmd_benchmark --kernel-mode int8 for T2T and layerwise-pruned ViT:
    fn/extra/chain_arg arities must line up and the kernel paths must trace
    (eval_shape walks the pallas_calls abstractly; the timer is stubbed so
    no interpret-mode execution happens)."""
    import jax

    import edgevisiontransformer_tpu.bench.looptimer as lt

    seen = []

    def stub(fn, args, **kw):
        out = jax.eval_shape(fn, *args)
        seen.append((len(args), out.shape))
        return {"p50_ms": 1.0, "avg_ms": 1.0, "std_ms": 0.0, "min_ms": 1.0,
                "iters": kw.get("iters", 1), "repeats": kw.get("repeats", 1)}

    monkeypatch.setattr(lt, "measure_op_time", stub)

    rc = main(["benchmark", "--model", "t2t_vit_7", "--kernel-mode", "int8",
               "--iters", "2", "--repeats", "1"])
    assert rc == 0
    enc = "layerwise_" + "_".join(["h2-d0.5", "h1-d0.3"] * 6)
    rc = main(["benchmark", "--model", f"pruned_deit_tiny@{enc}",
               "--kernel-mode", "int8", "--iters", "2", "--repeats", "1"])
    assert rc == 0
    assert [s for _, s in seen] == [(1, 1000), (1, 1000)]
    # T2T threads (v, sq, prep, x); pruned ViT threads (v, sq, x)
    assert [n for n, _ in seen] == [4, 3]
