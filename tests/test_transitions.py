"""Layer2NoNorm / GeLU2ReLU transitions, QAT fake-quant, and the
pytorch_prune magnitude pruner ports (LnSmart, block, hybrid).

Parity oracles: torch re-implementations of the reference pruners
(deit_pruning/src/pytorch_prune/{ln_smart,block}.py) and exactness at the
transition endpoints (mix=1 == LayerNorm/GELU; mix=0+compile == affine/ReLU).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgevisiontransformer_tpu.models.vit import ViT, deit_config
from edgevisiontransformer_tpu.ops.layers import layer_norm
from edgevisiontransformer_tpu.pruning.magnitude_pruners import (
    block_prune_mask,
    hybrid_prune_params,
    ln_smart_structured_mask,
)
from edgevisiontransformer_tpu.pruning.transitions import (
    compile_nonorm,
    compile_transitions,
    gelu2relu,
    init_ln_accumulators,
    layer2nonorm,
    transition_delta,
    transition_mix,
    vit_forward_transitions,
)


def _tiny_cfg(**kw):
    return deit_config("tiny").replace(
        image_size=32, patch_size=16, dim=64, depth=2, heads=2, mlp_dim=128,
        num_classes=10, **kw,
    )


# ---------------------------------------------------------------------------
# transitions
# ---------------------------------------------------------------------------


def test_transition_schedules():
    assert transition_mix(0, 100) == 1.0
    assert transition_mix(100, 100) == 0.0
    assert transition_mix(200, 100) == 0.0
    assert transition_delta(0, 100, 0.99) == pytest.approx(0.99)
    assert transition_delta(100, 100, 0.99) == 1.0


def test_layer2nonorm_mix1_equals_layernorm():
    """mix=1 uses pure batch statistics == LayerNorm (nonorm.py:74-76)."""
    x = jax.random.normal(jax.random.key(0), (2, 5, 16))
    g = jax.random.normal(jax.random.key(1), (16,))
    b = jax.random.normal(jax.random.key(2), (16,))
    acc = jnp.zeros(3)
    y, _ = layer2nonorm(x, g, b, acc, mix=1.0, delta=0.99, eps=1e-6)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(layer_norm(x, g, b, 1e-6)), rtol=2e-5, atol=2e-5)


def test_layer2nonorm_compile_matches_mix0():
    """After stats accumulate, compiled affine == mix=0 forward."""
    g = jnp.ones((16,)) * 1.5
    b = jnp.ones((16,)) * 0.25
    acc = jnp.zeros(3)
    key = jax.random.key(3)
    for i in range(20):
        x = 2.0 + jax.random.normal(jax.random.fold_in(key, i), (4, 7, 16))
        _, acc = layer2nonorm(x, g, b, acc, mix=0.5, delta=0.9, eps=1e-6)
    x = 2.0 + jax.random.normal(jax.random.fold_in(key, 99), (4, 7, 16))
    y_run, _ = layer2nonorm(x, g, b, acc, mix=0.0, delta=1.0, eps=1e-6,
                            train=False)
    w, bias = compile_nonorm(g, b, acc, 1e-6)
    np.testing.assert_allclose(
        np.asarray(y_run), np.asarray(x * w + bias), rtol=1e-4, atol=1e-5)


def test_gelu2relu_endpoints():
    x = jnp.linspace(-3, 3, 101)
    np.testing.assert_allclose(
        np.asarray(gelu2relu(x, 0.0)), np.asarray(jax.nn.relu(x)))
    np.testing.assert_allclose(
        np.asarray(gelu2relu(x, 1.0)),
        np.asarray(jax.nn.gelu(x, approximate=False)), rtol=1e-6)


def test_vit_forward_transitions_mix1_matches_apply():
    """At schedule start (mix=1) the transition forward IS the normal model."""
    cfg = _tiny_cfg()
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 32, 32))
    params = model.init(jax.random.key(1), x)
    acc = init_ln_accumulators(cfg)
    logits, new_acc = vit_forward_transitions(
        cfg, params, x, acc, mix_ln=1.0, delta=0.99, mix_gelu=1.0)
    ref = model.apply(params, x)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # accumulators picked up stats
    assert float(new_acc["block_0"]["ln1"][2]) > 0


def test_compile_transitions_matches_endpoint_forward():
    """compile_transitions + ordinary ViT(norm_mode=nonorm, act=relu) ==
    the transition forward at its endpoint (mix=0, delta=1)."""
    cfg = _tiny_cfg()
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 32, 32))
    params = model.init(jax.random.key(1), x)
    acc = init_ln_accumulators(cfg)
    for i in range(10):
        xb = jax.random.normal(jax.random.fold_in(jax.random.key(2), i),
                               (2, 3, 32, 32))
        _, acc = vit_forward_transitions(
            cfg, params, xb, acc, mix_ln=0.5, delta=0.9, mix_gelu=0.5)

    logits_end, _ = vit_forward_transitions(
        cfg, params, x, acc, mix_ln=0.0, delta=1.0, mix_gelu=0.0, train=False)

    new_cfg, new_params = compile_transitions(cfg, params, acc)
    assert new_cfg.norm_mode == "nonorm" and new_cfg.act == "relu"
    logits_c = ViT(new_cfg).apply(new_params, x)
    np.testing.assert_allclose(np.asarray(logits_c), np.asarray(logits_end),
                               rtol=2e-3, atol=2e-3)


def test_preset_driven_transitions_and_qat(tmp_path):
    """A reference-format preset requesting layer_norm_patch/gelu_patch/qat
    must actually exercise the transitions (no silent no-op)."""
    preset = {
        "attention_pruning_method": "topK",
        "dense_pruning_method": "topK:1d_alt",
        "initial_threshold": 1.0, "final_threshold": 0.5,
        "initial_warmup": 1, "final_warmup": 1,
        "regularization": None, "regularization_final_lambda": 0.0,
        "attention_block_rows": -1, "attention_block_cols": -1,
        "layer_norm_patch": True, "layer_norm_patch_steps": 6,
        "layer_norm_patch_start_delta": 0.9,
        "gelu_patch": True, "gelu_patch_steps": 6,
        "qat": True,
    }
    path = tmp_path / "preset.json"
    path.write_text(json.dumps(preset))

    from edgevisiontransformer_tpu.pruning.sparse_driver import (
        run_sparse_finetune,
        sparse_config_from_preset,
    )

    sparse = sparse_config_from_preset(str(path), warmup_steps=2)
    assert sparse.layer_norm_patch and sparse.gelu_patch and sparse.qat
    assert sparse.layer_norm_patch_steps == 6

    cfg = _tiny_cfg()
    model = ViT(cfg)
    x0 = jnp.ones((2, 3, 32, 32))
    params = model.init(jax.random.key(0), x0)

    rng = np.random.RandomState(0)
    data = [(rng.randn(2, 3, 32, 32).astype(np.float32),
             rng.randint(0, 10, size=2).astype(np.int32)) for _ in range(3)]
    res = run_sparse_finetune(
        model.apply, cfg, params, sparse, lambda: list(data), total_steps=8,
        lr=1e-4, mask_lr=1e-2, log=lambda *_: None,
    )
    assert res.ln_acc is not None
    assert float(res.ln_acc["block_0"]["ln1"][2]) > 0  # stats accumulated
    assert res.compiled_cfg.norm_mode == "nonorm"
    assert res.compiled_cfg.act == "relu"
    # compiled model runs and is finite
    y = ViT(res.compiled_cfg).apply(res.compiled_params, x0)
    assert np.isfinite(np.asarray(y)).all()


def test_fake_quant_ste_identity_grad_and_grid():
    from edgevisiontransformer_tpu.ops.quant import fake_quant_ste

    w = jax.random.normal(jax.random.key(0), (8, 16))
    wq = fake_quant_ste(w)
    # on the int8 grid per output channel
    scale = np.abs(np.asarray(w)).max(axis=0) / 127.0
    steps = np.asarray(wq) / scale[None, :]
    np.testing.assert_allclose(steps, np.round(steps), atol=1e-4)
    # straight-through gradient
    g = jax.grad(lambda t: jnp.sum(fake_quant_ste(t) * 3.0))(w)
    np.testing.assert_allclose(np.asarray(g), 3.0)


# ---------------------------------------------------------------------------
# magnitude pruners vs torch reference semantics
# ---------------------------------------------------------------------------


def _torch_ln_smart_mask(w, amount, ord=1):
    """Direct re-statement of LnSmartStructured.compute_mask (ln_smart.py)."""
    import torch

    t = torch.tensor(w).double()  # float64 both sides: rank stability
    rows, cols = t.shape
    k = int(round(amount * min(rows, cols)))
    row_sum = torch.topk(torch.linalg.norm(t, dim=1, ord=ord), k=k,
                         largest=False).values.sum() / (cols ** (1 / ord))
    col_sum = torch.topk(torch.linalg.norm(t, dim=0, ord=ord), k=k,
                         largest=False).values.sum() / (rows ** (1 / ord))
    prune_row = bool(col_sum >= row_sum)
    n = int(round(amount * (rows if prune_row else cols)))
    mask = torch.ones_like(t)
    if n:
        idx = torch.topk(torch.linalg.norm(t, dim=1 if prune_row else 0),
                         k=n, largest=False).indices
        if prune_row:
            mask[idx, :] = 0
        else:
            mask[:, idx] = 0
    return mask.numpy()


def test_ln_smart_matches_torch_reference():
    rng = np.random.RandomState(0)
    for shape in [(12, 48), (48, 12), (32, 32)]:
        for amount in (0.25, 0.5):
            w = rng.randn(*shape).astype(np.float32)
            ours = ln_smart_structured_mask(w, amount)
            ref = _torch_ln_smart_mask(w, amount)
            np.testing.assert_array_equal(ours, ref)


def test_ln_smart_picks_weaker_dimension():
    # rows 0..2 tiny -> row pruning chosen; cols strong
    w = np.ones((8, 6), np.float32)
    w[:3] *= 1e-3
    m = ln_smart_structured_mask(w, 0.375)  # 3 of 8 rows
    assert (m[:3] == 0).all() and (m[3:] == 1).all()


def test_block_prune_mask_matches_torch_reference():
    import torch

    rng = np.random.RandomState(1)
    w = rng.randn(16, 24).astype(np.float32)
    amount, br, bc = 0.5, 4, 6
    ours = block_prune_mask(w, amount, br, bc)

    t = torch.tensor(w)
    brows, bcols = 16 // br, 24 // bc
    blocks = torch.stack([
        t[i // bcols * br:(i // bcols + 1) * br,
          i % bcols * bc:(i % bcols + 1) * bc]
        for i in range(brows * bcols)
    ])
    norms = torch.linalg.norm(blocks, ord="fro", dim=(1, 2))
    idx = torch.topk(norms, k=int(round(amount * brows * bcols)),
                     largest=False).indices
    ref = torch.ones((brows, bcols))
    ref.view(-1)[idx] = 0
    ref = torch.repeat_interleave(torch.repeat_interleave(ref, br, 0), bc, 1)
    np.testing.assert_array_equal(ours, ref.numpy())


def test_hybrid_prune_params_sparsifies_encoder():
    cfg = _tiny_cfg()
    model = ViT(cfg)
    params = model.init(jax.random.key(0), jnp.ones((1, 3, 32, 32)))
    pruned = hybrid_prune_params(cfg, params, amount=0.5)
    blk = pruned["params"]["block_0"]
    for w in (blk["attn"]["qkv_kernel"], blk["ffn"]["fc1_kernel"],
              blk["ffn"]["fc2_kernel"]):
        frac = float(np.mean(np.asarray(w) == 0.0))
        assert 0.3 < frac <= 0.7, frac
    # model still runs
    y = model.apply(pruned, jnp.ones((1, 3, 32, 32)))
    assert np.isfinite(np.asarray(y)).all()


def test_prune_cli(tmp_path, capsys):
    from edgevisiontransformer_tpu.cli import main

    assert main(["prune", "--model", "deit_tiny", "--func", "hybrid",
                 "--amount", "0.5"]) == 0
    out = capsys.readouterr().out
    rep = json.loads(out.strip().splitlines()[-1])
    assert rep["overall_sparsity"] > 0.2


def test_fused_paths_reject_transition_configs():
    """Transitions-compiled models (NoNorm/ReLU) must not silently run
    through the fused kernels, which hardcode LayerNorm+GELU."""
    import pytest as _pytest

    from edgevisiontransformer_tpu.models.vit import (
        fused_vit_apply,
        fused_vit_apply_int8,
    )

    cfg = _tiny_cfg(norm_mode="nonorm", act="relu")
    model = ViT(cfg)
    x = jnp.ones((1, 3, 32, 32))
    v = jax.eval_shape(lambda: model.init(jax.random.key(0), x))
    with _pytest.raises(ValueError, match="norm_mode"):
        fused_vit_apply(model, v, x)
    with _pytest.raises(ValueError, match="norm_mode"):
        fused_vit_apply_int8(model, v, x, stacked_q={})


def test_sparse_train_cli_saves_transition_config(tmp_path):
    """A transitions preset run through the CLI must persist norm_mode/act in
    the checkpoint meta (reloading with a default config would silently
    re-normalize the affine-folded LN params)."""
    import json as _json

    from edgevisiontransformer_tpu.cli import main

    preset = {
        "attention_pruning_method": "topK",
        "dense_pruning_method": "topK:1d_alt",
        "initial_threshold": 1.0, "final_threshold": 0.5,
        "initial_warmup": 1, "final_warmup": 1,
        "layer_norm_patch": True, "layer_norm_patch_steps": 4,
        "gelu_patch": True, "gelu_patch_steps": 4,
    }
    ppath = tmp_path / "p.json"
    ppath.write_text(_json.dumps(preset))
    out = tmp_path / "ckpt"
    assert main([
        "sparse_train", "--model", "deit_tiny", "--synthetic", "2",
        "--batch", "2", "--steps", "4", "--warmup-steps", "2",
        "--preset", str(ppath), "--output", str(out),
    ]) == 0
    meta = _json.loads((out / "meta.json").read_text())
    assert meta["norm_mode"] == "nonorm" and meta["act"] == "relu"
    assert meta["config"]["norm_mode"] == "nonorm"


def test_qat_fake_quant_targets_encoder_only():
    """fake_quant_vit_encoder must touch exactly the kernels the int8
    deployment path quantizes — embeddings/head stay exact."""
    from edgevisiontransformer_tpu.ops.quant import fake_quant_vit_encoder

    cfg = _tiny_cfg()
    model = ViT(cfg)
    v = model.init(jax.random.key(0), jnp.ones((1, 3, 32, 32)))
    q = fake_quant_vit_encoder(v)
    p, qp = v["params"], q["params"]
    # untouched: embeddings + head
    np.testing.assert_array_equal(np.asarray(p["pos_embedding"]),
                                  np.asarray(qp["pos_embedding"]))
    np.testing.assert_array_equal(np.asarray(p["patch_kernel"]),
                                  np.asarray(qp["patch_kernel"]))
    # quantized: encoder matmuls (values change, land on int8 grid)
    w0 = np.asarray(p["block_0"]["attn"]["qkv_kernel"])
    wq = np.asarray(qp["block_0"]["attn"]["qkv_kernel"])
    assert not np.array_equal(w0, wq)
    scale = np.abs(w0).max(axis=0) / 127.0
    steps = wq / scale[None, :]
    np.testing.assert_allclose(steps, np.round(steps), atol=1e-3)
