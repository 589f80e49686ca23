"""Quantization tests: int8 roundtrip error bounds, dynamic matmul accuracy,
whole-model int8 accuracy drift, calibration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgevisiontransformer_tpu.models.vit import ViT, deit_config
from edgevisiontransformer_tpu.ops.quant import (
    calibrate_activation_scales,
    cast_params,
    dequantize_weight_int8,
    int8_matmul_dynamic,
    int8_vit_apply,
    quantize_activation_rows,
    quantize_vit_params_int8,
    quantize_weight_int8,
    representative_batches,
)


def test_weight_quant_roundtrip_error():
    w = jax.random.normal(jax.random.key(0), (64, 32))
    q, s = quantize_weight_int8(w)
    assert q.dtype == jnp.int8
    back = dequantize_weight_int8(q, s)
    err = np.abs(np.asarray(back - w))
    # per-channel symmetric: max error <= scale/2 per channel
    assert (err <= np.asarray(s)[None, :] * 0.5 + 1e-7).all()


def test_weight_quant_zero_channel():
    w = jnp.zeros((8, 4)).at[:, 1].set(1.0)
    q, s = quantize_weight_int8(w)
    assert np.asarray(s)[0] == 1.0  # zero channel -> scale 1, no NaN
    assert (np.asarray(q)[:, 0] == 0).all()


def test_activation_row_quant():
    x = jnp.array([[1.0, -2.0, 0.5], [100.0, 50.0, -100.0]])
    q, s = quantize_activation_rows(x)
    np.testing.assert_allclose(np.asarray(s).ravel(), [2.0 / 127, 100.0 / 127])
    assert np.asarray(q)[0, 1] == -127


def test_int8_matmul_dynamic_close_to_float():
    x = jax.random.normal(jax.random.key(0), (16, 64))
    w = jax.random.normal(jax.random.key(1), (64, 32)) * 0.1
    wq, ws = quantize_weight_int8(w)
    got = int8_matmul_dynamic(x, wq, ws)
    ref = x @ w
    rel = np.abs(np.asarray(got - ref)).max() / np.abs(np.asarray(ref)).max()
    assert rel < 0.05, rel


def test_int8_vit_apply_close_to_float():
    cfg = deit_config("tiny").replace(
        image_size=32, patch_size=16, dim=64, depth=2, heads=2, mlp_dim=128,
        num_classes=10,
    )
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 32, 32))
    params = model.init(jax.random.key(1), x)
    qparams = quantize_vit_params_int8(params)
    # quantized kernels really are int8
    assert qparams["params"]["block_0"]["attn"]["qkv_kernel"]["q"].dtype == jnp.int8
    ref = np.asarray(model.apply(params, x))
    got = np.asarray(int8_vit_apply(model, qparams, x))
    # top-1 agreement is the metric that matters
    assert (ref.argmax(-1) == got.argmax(-1)).all()
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.1, rel


def test_cast_params_dtype():
    params = {"a": jnp.ones((2, 2)), "b": jnp.arange(3)}
    out = cast_params(params, jnp.float16)
    assert out["a"].dtype == jnp.float16
    assert out["b"].dtype == jnp.int32  # ints untouched


def test_calibration():
    def collect(x):
        return {"input": x, "double": 2.0 * x}

    scales = calibrate_activation_scales(collect, representative_batches(3, 1, (4,)))
    assert scales["double"] == pytest.approx(2 * scales["input"], rel=1e-6)
    assert scales["input"] > 0


def test_calibration_percentile_clips_outliers():
    def collect(x):
        return {"t": x}

    batches = [np.concatenate([np.ones(999, np.float32), [1000.0]])]
    full = calibrate_activation_scales(collect, batches)
    clipped = calibrate_activation_scales(collect, batches, percentile=99.0)
    assert full["t"] == pytest.approx(1000.0 / 127)
    assert clipped["t"] == pytest.approx(1.0 / 127, rel=1e-3)


def _tiny_model():
    cfg = deit_config("tiny").replace(
        image_size=32, patch_size=16, dim=64, depth=2, heads=2, mlp_dim=128,
        num_classes=10,
    )
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 32, 32))
    params = model.init(jax.random.key(1), x)
    return model, params, x


def test_calibrate_vit_shapes_and_consistency():
    from edgevisiontransformer_tpu.ops.quant import (
        VIT_ACT_KEYS,
        calibrate_vit,
        vit_collect_matmul_inputs,
    )

    model, params, x = _tiny_model()
    acts = vit_collect_matmul_inputs(model, params, x)
    assert set(acts) == {f"block_{i}/{k}" for i in range(2) for k in VIT_ACT_KEYS}
    scales = calibrate_vit(model, params, batches=[np.asarray(x)])
    assert scales.shape == (2, 4)
    # calibrating on the eval batch itself -> scale == absmax/127 exactly
    assert scales[0, 0] == pytest.approx(
        float(jnp.max(jnp.abs(acts["block_0/qkv_in"]))) / 127, rel=1e-5)


def test_calibrate_vit_mse_survives_zero_activation():
    # an all-zero matmul input (here: fc1 kernel+bias zeroed -> fc2_in ==
    # gelu(0) == 0) must not poison the MSE clip search with 0/0 NaNs;
    # the zero column falls back to scale 1.0 like the absmax path
    import flax

    from edgevisiontransformer_tpu.ops.quant import calibrate_vit

    model, params, x = _tiny_model()
    flat = flax.traverse_util.flatten_dict(params["params"])
    flat = {k: (jnp.zeros_like(v) if "fc1" in "_".join(map(str, k)) else v)
            for k, v in flat.items()}
    p0 = {"params": flax.traverse_util.unflatten_dict(flat)}
    scales = calibrate_vit(model, p0, batches=[np.asarray(x)], method="mse")
    assert np.isfinite(scales).all() and (scales > 0).all()
    # fc2_in is the zeroed column: VIT_ACT_KEYS order has it at index 3
    assert scales[0, 3] == 1.0


def test_calibrate_vit_mse_clip_search():
    """method="mse" picks per-tensor clips from ratio*absmax (ratio in
    MSE_CLIP_RATIOS) minimizing calibration-set quantization MSE — never
    larger than absmax, never below the smallest candidate, and at least as
    good on the calibration set by construction (argmin includes ratio 1.0)."""
    from edgevisiontransformer_tpu.ops.quant import (
        MSE_CLIP_RATIOS,
        calibrate_vit,
        int8_vit_apply_static,
        quantize_vit_params_int8_static,
    )

    model, params, x = _tiny_model()
    calib = [np.asarray(jax.random.normal(jax.random.key(i), x.shape))
             for i in range(2, 6)]
    base = calibrate_vit(model, params, batches=calib)
    mse = calibrate_vit(model, params, batches=calib, method="mse")
    assert mse.shape == base.shape
    ratio = mse / base
    assert np.all(ratio <= 1.0 + 1e-6)
    assert np.all(ratio >= min(MSE_CLIP_RATIOS) - 1e-6)
    # each chosen ratio is one of the candidates
    cand = np.asarray(MSE_CLIP_RATIOS)
    assert np.all(np.min(np.abs(ratio[..., None] - cand), -1) < 1e-5)
    # end-to-end oracle still tracks the float model
    qparams = quantize_vit_params_int8_static(params, mse)
    ref = np.asarray(model.apply(params, x))
    got = np.asarray(int8_vit_apply_static(model, qparams, x))
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.15, rel
    with pytest.raises(ValueError):
        calibrate_vit(model, params, batches=calib, method="entropy")


def test_int8_vit_apply_static_close_to_float():
    """Static (full-integer-style) int8: calibrated per-tensor activation
    scales; accuracy within the same envelope as dynamic when calibrated on
    representative data (reference TFLITE_BUILTINS_INT8 methodology,
    utils.py:263-277)."""
    from edgevisiontransformer_tpu.ops.quant import (
        calibrate_vit,
        int8_vit_apply_static,
        quantize_vit_params_int8_static,
    )

    model, params, x = _tiny_model()
    calib = [np.asarray(jax.random.normal(jax.random.key(i), x.shape))
             for i in range(2, 5)]
    scales = calibrate_vit(model, params, batches=calib)
    qparams = quantize_vit_params_int8_static(params, scales)
    leaf = qparams["params"]["block_0"]["attn"]["qkv_kernel"]
    assert leaf["q"].dtype == jnp.int8 and "act_scale" in leaf
    ref = np.asarray(model.apply(params, x))
    got = np.asarray(int8_vit_apply_static(model, qparams, x))
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.1, rel
    # static per-tensor scales lose at most ~2x vs per-row dynamic (random-init
    # argmax margins are sub-noise, so logit error IS the accuracy metric here;
    # real-weight argmax agreement is covered by the quant_accuracy CLI table)
    dyn = np.asarray(int8_vit_apply(model, quantize_vit_params_int8(params), x))
    rel_dyn = np.abs(dyn - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2.5 * rel_dyn + 1e-3, (rel, rel_dyn)


def test_stacks_from_quantized_tree_bit_identical():
    """The convert -> run loop: re-stacking a saved quantized tree must be
    BIT-identical to prepare-time quantization (same per-channel rounding),
    for both dynamic and static modes (reference tf2tflite ->
    mobile_benchmark consumes the converted artifact, tools.py:1023-1075)."""
    from edgevisiontransformer_tpu.models.vit import (
        prepare_vit_int8,
        prepare_vit_int8_static,
        stacks_from_quantized_tree,
    )
    from edgevisiontransformer_tpu.ops.quant import (
        calibrate_vit,
        quantize_vit_params_int8_static,
    )

    model, params, x = _tiny_model()
    qd = quantize_vit_params_int8(params)
    got = stacks_from_quantized_tree(model.config, qd)
    want = prepare_vit_int8(model, params)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]),
                                      err_msg=k)

    scales = calibrate_vit(model, params, batches=[np.asarray(x)])
    qs = quantize_vit_params_int8_static(params, scales)
    got_s = stacks_from_quantized_tree(model.config, qs)
    want_s = prepare_vit_int8_static(model, params, act_scales=scales)
    assert set(got_s) == set(want_s) and "act_inv" in got_s
    for k in want_s:
        np.testing.assert_allclose(np.asarray(got_s[k], np.float32),
                                   np.asarray(want_s[k], np.float32),
                                   rtol=1e-6, err_msg=k)


def test_fused_int8_layerwise_pruned_segments():
    """Layerwise-pruned models run one int8 kernel per uniform segment
    (fused_vit_apply's segmentation) — the reference's prune -> quantize ->
    benchmark pipeline needs quantized pruned models (ViT_Pruned encodings
    vit.py:58-97 + tf2tflite quantization utils.py:242-294)."""
    from edgevisiontransformer_tpu.models.vit import (
        ViT,
        encoder_segments,
        fused_vit_apply_int8,
        prepare_vit_int8_static,
        pruned_vit_config,
    )
    from edgevisiontransformer_tpu.ops.quant import (
        calibrate_vit,
        int8_vit_apply_static,
        quantize_vit_params_int8_static,
    )

    enc = "layerwise_" + "_".join(["h2-d0.5", "h1-d0.3"] * 6)
    cfg = pruned_vit_config("tiny", enc, dtype=jnp.float32)
    model = ViT(cfg)
    assert len(encoder_segments(cfg)) == 12
    x = jax.random.normal(jax.random.key(0), (1, 3, 224, 224))
    v = model.init(jax.random.key(1), x)
    ref = np.asarray(model.apply(v, x))
    denom = np.abs(ref).max() + 1e-9

    scales = calibrate_vit(model, v, batches=[np.asarray(x)])
    qs = quantize_vit_params_int8_static(v, scales)
    oracle = np.asarray(int8_vit_apply_static(model, qs, x))

    # convert -> run for pruned models: the saved quantized tree re-stacks
    # into one segment per uniform run, identical to prepare-time stacks
    from edgevisiontransformer_tpu.models.vit import stacks_from_quantized_tree

    got = stacks_from_quantized_tree(cfg, qs)
    want = prepare_vit_int8_static(model, v, act_scales=scales)
    assert len(got["segments"]) == len(want["segments"]) == 12
    for gs, ws in zip(got["segments"], want["segments"]):
        for k in ws:
            np.testing.assert_allclose(np.asarray(gs[k], np.float32),
                                       np.asarray(ws[k], np.float32),
                                       rtol=1e-6, err_msg=k)

    sq = prepare_vit_int8_static(model, v, act_scales=scales)
    assert len(sq["segments"]) == 12
    got = np.asarray(fused_vit_apply_int8(model, v, x, sq))
    assert np.abs(got - oracle).max() / denom < 0.1
    assert np.abs(got - ref).max() / denom < 0.15

    # dynamic multi-segment form (per-row act quant, no act_inv in stacks)
    from edgevisiontransformer_tpu.models.vit import prepare_vit_int8

    sqd = prepare_vit_int8(model, v)
    assert len(sqd["segments"]) == 12
    assert all("act_inv" not in s for s in sqd["segments"])
    gotd = np.asarray(fused_vit_apply_int8(model, v, x, sqd))
    assert np.abs(gotd - ref).max() / denom < 0.15


# ---------------------------------------------------------------------------
# SmoothQuant-style offline scale migration
# ---------------------------------------------------------------------------


def test_smooth_vit_exact_float_equivalence():
    """Smoothing is a re-parameterization: the float forward must be
    unchanged (up to fp32 rounding) while the weights really moved."""
    from edgevisiontransformer_tpu.ops.quant import smooth_vit

    model, params, x = _tiny_model()
    psm = smooth_vit(model, params, batches=[np.asarray(x)], alpha=0.5)
    ref = np.asarray(model.apply(params, x))
    got = np.asarray(model.apply(psm, x))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=0)
    moved = np.abs(
        np.asarray(psm["params"]["block_0"]["attn"]["qkv_kernel"])
        - np.asarray(params["params"]["block_0"]["attn"]["qkv_kernel"])).max()
    assert moved > 1e-6, "smoothing left the qkv kernel untouched"


def test_smooth_vit_reference_residual_gates_ln_folds():
    """With the TF pre-norm quirk the LN output feeds the skip path, so only
    the out_in (v-column) fold may apply — LN params must stay untouched and
    the forward must still be exactly equivalent."""
    from edgevisiontransformer_tpu.ops.quant import smooth_vit

    cfg = deit_config("tiny").replace(
        image_size=32, patch_size=16, dim=64, depth=2, heads=2, mlp_dim=128,
        num_classes=10, reference_residual=True,
    )
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 32, 32))
    params = model.init(jax.random.key(1), x)
    psm = smooth_vit(model, params, batches=[np.asarray(x)], alpha=0.5)
    np.testing.assert_array_equal(
        np.asarray(psm["params"]["block_0"]["ln1"]["scale"]),
        np.asarray(params["params"]["block_0"]["ln1"]["scale"]))
    np.testing.assert_array_equal(
        np.asarray(psm["params"]["block_0"]["ln2"]["bias"]),
        np.asarray(params["params"]["block_0"]["ln2"]["bias"]))
    ref = np.asarray(model.apply(params, x))
    got = np.asarray(model.apply(psm, x))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=0)


def test_smooth_vit_shrinks_outlier_channels_and_quantizes():
    """Inject a 50x activation-outlier channel via the LN scale; smoothing
    must shrink the qkv_in per-channel spread, and the smoothed static-int8
    pipeline must produce tighter logits than the unsmoothed one."""
    from edgevisiontransformer_tpu.ops.quant import (
        calibrate_vit,
        int8_vit_apply_static,
        quantize_vit_params_int8_static,
        smooth_vit,
        vit_collect_matmul_inputs,
    )

    model, params, x = _tiny_model()
    p = params["params"]
    g = np.asarray(p["block_0"]["ln1"]["scale"]).copy()
    g[7] *= 50.0
    p["block_0"]["ln1"]["scale"] = jnp.asarray(g)

    def spread(tree):
        a = np.abs(np.asarray(
            vit_collect_matmul_inputs(model, tree, x)["block_0/qkv_in"]))
        ch = a.reshape(-1, a.shape[-1]).max(0)
        return ch.max() / np.median(ch)

    psm = smooth_vit(model, params, batches=[np.asarray(x)], alpha=0.5)
    assert spread(psm) < 0.5 * spread(params), (spread(psm), spread(params))

    ref = np.asarray(model.apply(params, x))

    def max_err(tree):
        q = quantize_vit_params_int8_static(
            tree, calibrate_vit(model, tree, batches=[np.asarray(x)]))
        out = np.asarray(int8_vit_apply_static(model, q, x))
        return np.abs(out - ref).max()

    assert max_err(psm) < max_err(params), (max_err(psm), max_err(params))


def test_fake_quant_vit_apply_static_matches_deployment_and_grads():
    """Static-aware QAT forward (ops/quant.fake_quant_vit_apply_static):
    (a) sees the deployment quantization — its logits match
    int8_vit_apply_static on the statically-quantized tree (same quant
    points: per-channel weight absmax x calibrated per-tensor act scale);
    (b) is differentiable with straight-through grads (nonzero, finite)."""
    import numpy as np

    from edgevisiontransformer_tpu.models.vit import ViT, deit_config
    from edgevisiontransformer_tpu.ops.quant import (
        calibrate_vit,
        fake_quant_act_ste,
        fake_quant_vit_apply_static,
        int8_vit_apply_static,
        quantize_vit_params_int8_static,
    )

    cfg = deit_config("tiny").replace(depth=2, num_classes=7)
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 224, 224))
    params = model.init(jax.random.key(1), x[:1])

    scales = calibrate_vit(model, params, batches=[np.asarray(x)])
    ref = np.asarray(int8_vit_apply_static(
        model, quantize_vit_params_int8_static(params, scales), x))
    got = np.asarray(fake_quant_vit_apply_static(model, params, scales, x))
    denom = np.abs(ref).max() + 1e-9
    # same quant points; the deployment kernel accumulates EXACTLY in
    # int32 while the fq forward accumulates dequantized f32 products, and
    # LN amplifies the difference across blocks — ~1e-2 relative
    assert np.abs(got - ref).max() / denom < 2e-2

    # STE: identity gradient through the activation fake-quant inside the
    # clip range, ZERO in the saturated region (the forward is flat there —
    # |x| > 127*scale)
    g = jax.grad(lambda v: fake_quant_act_ste(v, 0.1).sum())(
        jnp.array([0.33, -1.7, 20.0]))
    assert np.allclose(np.asarray(g), [1.0, 1.0, 0.0])

    # traced-scale variant: same forward, same clip-masked STE, but scale
    # is a jax operand (live-observer path — no recompile on scale update)
    from edgevisiontransformer_tpu.ops.quant import fake_quant_act
    v = jnp.array([0.33, -1.7, 20.0, -14.0])
    sc = jnp.float32(0.1)
    assert np.allclose(np.asarray(fake_quant_act(v, sc)),
                       np.asarray(fake_quant_act_ste(v, 0.1)))
    g2 = jax.grad(lambda t: fake_quant_act(t, sc).sum())(v)
    assert np.allclose(np.asarray(g2), [1.0, 1.0, 0.0, 0.0])

    # whole-forward grads flow to the fake-quantized weights
    def loss(p):
        out = fake_quant_vit_apply_static(model, p, scales, x)
        return (out ** 2).mean()

    grads = jax.grad(loss)(params)
    gleaf = grads["params"]["block_0"]["attn"]["qkv_kernel"]
    gn = float(jnp.linalg.norm(gleaf))
    assert np.isfinite(gn) and gn > 0

    # observed variant: identical logits + a [depth, 4] batch-absmax the
    # training loop can EMA scales from (live-observer QAT); the absmax of
    # the qkv input must match the actual post-LN activation absmax
    from edgevisiontransformer_tpu.ops.quant import (
        fake_quant_vit_apply_observed,
    )
    lo, seen = fake_quant_vit_apply_observed(model, params, scales, x)
    assert np.allclose(np.asarray(lo), got, atol=1e-5)
    seen = np.asarray(seen)
    assert seen.shape == (cfg.depth, 4) and (seen > 0).all()
    # scales came from absmax/127 calibration on this same batch, so the
    # observed absmax of matmul input 0 (qkv_in) ~= scales[0,0]*127
    assert abs(seen[0, 0] / 127.0 - float(np.asarray(scales)[0, 0])) < 1e-4
