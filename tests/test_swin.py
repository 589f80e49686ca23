"""Swin tests: window ops roundtrip, shift mask structure, relative position
index symmetry, full model forward, HF-torch parity (skipped w/o weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgevisiontransformer_tpu.models.swin import (
    SwinTransformer,
    relative_position_index,
    shifted_window_mask,
    swin_config,
    window_partition,
    window_reverse,
)


def test_window_partition_roundtrip():
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 5))
    w = 4
    wins = window_partition(x, w)
    assert wins.shape == (2 * 4, 16, 5)
    back = window_reverse(wins, w, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_window_partition_content():
    # Pixel (0..w) of the first window must be the top-left block.
    x = jnp.arange(1 * 4 * 4 * 1, dtype=jnp.float32).reshape(1, 4, 4, 1)
    wins = window_partition(x, 2)
    np.testing.assert_array_equal(
        np.asarray(wins[0, :, 0]), np.array([0.0, 1.0, 4.0, 5.0])
    )


def test_relative_position_index_properties():
    w = 3
    idx = relative_position_index(w)
    assert idx.shape == (9, 9)
    assert idx.min() >= 0 and idx.max() < (2 * w - 1) ** 2
    # self-offset is the center entry everywhere on the diagonal
    center = (w - 1) * (2 * w - 1) + (w - 1)
    assert (np.diag(idx) == center).all()
    # symmetric pairs map to mirrored offsets
    assert idx[0, 8] + idx[8, 0] == 2 * center


def test_shifted_window_mask_blocks():
    m = shifted_window_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    # top-left window is contiguous -> no masking
    np.testing.assert_array_equal(m[0], np.zeros((16, 16)))
    # bottom-right window mixes 4 regions -> has -100 entries
    assert (m[-1] == -100.0).any()
    # mask is symmetric in structure (masked iff regions differ)
    np.testing.assert_array_equal(m[-1], m[-1].T)


@pytest.mark.parametrize("image_size", [56])
def test_swin_forward_small(image_size):
    # 56px -> resolutions 14,7,3... use depths (1,1) to keep it cheap.
    cfg = swin_config("tiny").replace(
        image_size=image_size, depths=(1, 2), num_heads=(3, 6), num_classes=10
    )
    model = SwinTransformer(cfg)
    x = jnp.ones((1, 3, image_size, image_size))
    variables = model.init(jax.random.key(0), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 10)
    assert jnp.isfinite(y).all()


def test_swin_init_has_no_calibration_collections(image_size=56):
    # the calibration sows ("acts"/"acts_full") must not leak into
    # model.init output: checkpoint restore targets are built from init
    # and a pre-calibration checkpoint would fail structure matching
    cfg = swin_config("tiny").replace(
        image_size=image_size, depths=(1, 2), num_heads=(3, 6), num_classes=10
    )
    model = SwinTransformer(cfg)
    x = jnp.ones((1, 3, image_size, image_size))
    variables = model.init(jax.random.key(0), x)
    assert set(variables) <= {"params", "constants"}, sorted(variables)


def test_swin_tiny_full_shapes():
    cfg = swin_config("tiny")
    model = SwinTransformer(cfg)
    x = jnp.ones((1, 3, 224, 224))
    variables = jax.eval_shape(lambda: model.init(jax.random.key(0), x))
    n = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(variables))
    # Swin-Tiny ~28M params (+ constant tables).
    assert 27e6 < n < 30e6, n


def test_swin_shift_changes_output():
    """Shifted block must differ from unshifted (mask + roll active)."""
    cfg = swin_config("tiny").replace(
        image_size=56, depths=(2,), num_heads=(3,), num_classes=4
    )
    model = SwinTransformer(cfg)
    x = jax.random.normal(jax.random.key(0), (1, 3, 56, 56))
    variables = model.init(jax.random.key(1), x)
    y = model.apply(variables, x)
    assert jnp.isfinite(y).all()
    # constants collection carries the attn mask for the shifted block
    flat = jax.tree_util.tree_flatten_with_path(variables["constants"])[0]
    assert any("attn_mask" in jax.tree_util.keystr(kp) for kp, _ in flat)


def test_swin_pallas_window_attention_matches_xla():
    """kernel_mode=pallas (fused window attention) == xla path."""
    cfg = swin_config("tiny").replace(
        image_size=56, depths=(2,), num_heads=(3,), num_classes=7
    )
    model = SwinTransformer(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 56, 56))
    variables = model.init(jax.random.key(1), x)
    ref = model.apply(variables, x)
    got = SwinTransformer(cfg.replace(kernel_mode="pallas")).apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_window_pack_parity():
    """window_pack=2 (block-diagonal packed attention) must be numerically
    equivalent to unpacked — cross-window logits underflow to exactly 0."""
    cfg1 = swin_config("tiny", image_size=56, embed_dim=32, depths=(2, 2),
                       num_heads=(2, 4), window_pack=1)
    cfg2 = cfg1.replace(window_pack=2)
    x = jax.random.normal(jax.random.key(0), (1, 3, 56, 56))
    m1, m2 = SwinTransformer(cfg1), SwinTransformer(cfg2)
    v = m1.init(jax.random.key(1), x)
    y1 = m1.apply(v, x)
    y2 = m2.apply(v, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=2e-4, atol=2e-4)


def test_fused_swin_apply_parity():
    """Whole-block Pallas path (interpret mode off-TPU) vs module forward,
    with and without the prepared-constants fast path."""
    from edgevisiontransformer_tpu.models.swin import (
        fused_swin_apply,
        prepare_swin_fused,
    )

    cfg = swin_config("tiny", image_size=56, embed_dim=32, depths=(2, 2),
                      num_heads=(2, 4), window_pack=1)
    m = SwinTransformer(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 56, 56))
    v = m.init(jax.random.key(1), x)
    y_ref = m.apply(v, x)
    # exp2 softmax + deferred approx-reciprocal normalization: ~1e-3 abs
    y_fused = fused_swin_apply(m, v, x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fused),
                               rtol=2e-3, atol=2e-3)
    prep = prepare_swin_fused(m, v)
    y_prep = fused_swin_apply(m, v, x, prepared=prep)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_prep),
                               rtol=2e-3, atol=2e-3)
    # XLA fallback stages must also agree
    y_mixed = fused_swin_apply(m, v, x, pallas_stages=(1,), prepared=prep)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_mixed),
                               rtol=2e-3, atol=2e-3)


def test_stage_kernel_window_pack_parity():
    """Block-diagonal window packing in the whole-stage kernel (_PACK=2,
    the r4-directive b32 A/B probe path): P consecutive windows share one
    [P*pn, P*pn] attention with _NEG off-diagonal blocks — must be exact
    vs the unpacked kernel, including shifted blocks (their per-window
    masks ride the packed diagonal)."""
    from edgevisiontransformer_tpu.models.swin import fused_swin_apply
    from edgevisiontransformer_tpu.ops.pallas import swin_block as sb

    cfg = swin_config("tiny", image_size=56, embed_dim=32, depths=(2, 2),
                      num_heads=(2, 4), num_classes=5, window_pack=1)
    m = SwinTransformer(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 56, 56))
    v = m.init(jax.random.key(1), x)
    y_ref = m.apply(v, x)

    assert sb._PACK == 1  # production default must stay unpacked
    sb._PACK = 2
    try:
        y_packed = fused_swin_apply(m, v, x)
    finally:
        sb._PACK = 1
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_packed),
                               rtol=2e-3, atol=2e-3)


def test_stage_kernel_fori_pair_loop_parity():
    """The whole-stage kernel's lax.fori pair-loop path (unroll=False, used
    for depth-18 stages) must match the unrolled path and the XLA module
    forward, including shifted blocks (depth 4, res 14, 4 windows)."""
    from edgevisiontransformer_tpu.models.swin import fused_swin_apply
    from edgevisiontransformer_tpu.ops.pallas import swin_block as sb

    cfg = swin_config("tiny", image_size=56, embed_dim=32, depths=(4,),
                      num_heads=(2,), num_classes=5)
    m = SwinTransformer(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 56, 56))
    v = m.init(jax.random.key(1), x)
    y_ref = m.apply(v, x)

    orig = sb.swin_stage_forward_pipelined
    calls = []

    def forced(*a, **kw):
        kw["unroll"] = False
        calls.append(1)
        return orig(*a, **kw)

    sb.swin_stage_forward_pipelined = forced
    try:
        y_fori = fused_swin_apply(m, v, x)
    finally:
        sb.swin_stage_forward_pipelined = orig
    assert calls, "whole-stage path was not dispatched"
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fori),
                               rtol=2e-3, atol=2e-3)


def test_stage_transition_perm_matches_roll_bracket():
    """stage_transition_perm == window-major composition of roll+partition."""
    from edgevisiontransformer_tpu.ops.pallas.swin_block import (
        stage_transition_perm)

    res, w, shift, n_pad = 14, 7, 3, 56
    n = w * w
    nwin = (res // w) ** 2
    rng = np.random.RandomState(0)
    fm = rng.randn(1, res, res, 3).astype(np.float32)
    # reference: roll then partition
    ref = np.asarray(window_partition(
        jnp.roll(jnp.asarray(fm), (-shift, -shift), axis=(1, 2)), w))
    # kernel form: partition, pad, P @ rows
    wm = np.asarray(window_partition(jnp.asarray(fm), w))  # [nW, n, C]
    wm_p = np.zeros((nwin, n_pad, 3), np.float32)
    wm_p[:, :n] = wm
    P = stage_transition_perm(res, w, shift, n_pad)
    got = (P @ wm_p.reshape(nwin * n_pad, 3)).reshape(nwin, n_pad, 3)[:, :n]
    np.testing.assert_array_equal(got, ref)
    # reverse transition: P^T
    back = (P.T @ (P @ wm_p.reshape(-1, 3))).reshape(nwin, n_pad, 3)[:, :n]
    np.testing.assert_array_equal(back, wm)


def test_stage_transition_perm_banded_matches_full():
    """Banded factorization reconstructs the full one-hot perm exactly
    (stage-0 geometry res 56 / w 7: nb 8 bands of 448 rows)."""
    from edgevisiontransformer_tpu.ops.pallas.swin_block import (
        stage_transition_perm, stage_transition_perm_banded)

    res, w, shift, n_pad = 56, 7, 3, 56
    P = stage_transition_perm(res, w, shift, n_pad)
    pL, pR = stage_transition_perm_banded(res, w, shift, n_pad)
    nb = res // w
    rb = nb * n_pad
    rng = np.random.RandomState(0)
    x = rng.randn(nb * rb, 5).astype(np.float32)
    xg = x.reshape(nb, rb, 5)
    fwd = np.concatenate(
        [pL[b] @ xg[b] + pR[b] @ xg[(b + 1) % nb] for b in range(nb)], 0)
    np.testing.assert_array_equal(fwd, P @ x)
    rev = np.concatenate(
        [pL[b].T @ xg[b] + pR[(b - 1) % nb].T @ xg[(b - 1) % nb]
         for b in range(nb)], 0)
    np.testing.assert_array_equal(rev, P.T @ x)


def test_fused_swin_banded_stage0_parity():
    """Whole-stage kernel on a REAL stage-0 geometry (res 56, w 7,
    R = 3584 > the full-perm threshold): the banded in-kernel bracket must
    match the module forward."""
    from edgevisiontransformer_tpu.models.swin import fused_swin_apply
    from edgevisiontransformer_tpu.ops.pallas.swin_block import (
        swin_stage_pipelined_fits)

    assert swin_stage_pipelined_fits(32, 64, 2, nwin=64, n_pad=56, heads=2)
    cfg = swin_config("tiny", image_size=112, patch_size=2, embed_dim=32,
                      depths=(2,), num_heads=(2,), num_classes=7)
    m = SwinTransformer(cfg)
    x = jax.random.normal(jax.random.key(0), (1, 3, 112, 112))
    v = m.init(jax.random.key(1), x)
    y_ref = np.asarray(m.apply(v, x))
    y_fused = np.asarray(fused_swin_apply(m, v, x))
    np.testing.assert_allclose(y_fused, y_ref, rtol=2e-3, atol=2e-3)


def test_stage_kernel_odd_depth_unrolls():
    """Odd-depth shift-free stages (depth 7, nwin 1) must not drop the tail
    block: auto-unroll, and unroll=False is rejected loudly."""
    from edgevisiontransformer_tpu.models.swin import fused_swin_apply
    from edgevisiontransformer_tpu.ops.pallas import swin_block as sb

    cfg = swin_config("tiny", image_size=28, embed_dim=32, depths=(7,),
                      num_heads=(2,), num_classes=5)
    m = SwinTransformer(cfg)
    x = jax.random.normal(jax.random.key(0), (1, 3, 28, 28))
    v = m.init(jax.random.key(1), x)
    y_ref = m.apply(v, x)
    y_fused = fused_swin_apply(m, v, x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fused),
                               rtol=2e-3, atol=2e-3)

    orig = sb.swin_stage_forward_pipelined
    def forced(*a, **kw):
        kw["unroll"] = False
        return orig(*a, **kw)
    sb.swin_stage_forward_pipelined = forced
    try:
        with pytest.raises(ValueError, match="depth must be even"):
            fused_swin_apply(m, v, x)
    finally:
        sb.swin_stage_forward_pipelined = orig


def test_fused_swin_int8_parity():
    """int8 whole-stage path: logits track the bf16 fused path within
    dynamic-range-int8 tolerance and agree on argmax."""
    from edgevisiontransformer_tpu.models.swin import (
        fused_swin_apply, prepare_swin_fused, prepare_swin_int8)

    cfg = swin_config("tiny", image_size=56, embed_dim=32, depths=(2, 2),
                      num_heads=(2, 4), num_classes=11)
    m = SwinTransformer(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 56, 56))
    v = m.init(jax.random.key(1), x)
    prep = prepare_swin_fused(m, v)
    q = prepare_swin_int8(m, v, min_dim=0)
    assert q, "no stage qualified for the int8 whole-stage kernel"
    y_bf16 = np.asarray(fused_swin_apply(m, v, x, prepared=prep))
    y_int8 = np.asarray(fused_swin_apply(m, v, x, prepared=prep,
                                         int8_prepared=q))
    assert not np.allclose(y_bf16, y_int8)  # actually quantized
    np.testing.assert_allclose(y_int8, y_bf16, rtol=0.1, atol=0.15)
    np.testing.assert_array_equal(y_int8.argmax(-1), y_bf16.argmax(-1))


def test_fused_swin_int8_static_parity():
    """STATIC int8 whole-stage path (calibrated per-tensor act scales from
    SMEM, combined dequant multipliers): logits track bf16 within int8
    tolerance, agree on argmax, and differ from dynamic int8 (different
    quantization points).  Full-integer Swin analogue of the ViT static
    mode (reference TFLITE_BUILTINS_INT8, utils.py:263-277)."""
    from edgevisiontransformer_tpu.models.swin import (
        calibrate_swin, fused_swin_apply, prepare_swin_fused,
        prepare_swin_int8_static)

    cfg = swin_config("tiny", image_size=56, embed_dim=32, depths=(2, 2),
                      num_heads=(2, 4), num_classes=11)
    m = SwinTransformer(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 56, 56))
    v = m.init(jax.random.key(1), x)
    scales = calibrate_swin(m, v, n=4)
    assert set(scales) == {0, 1} and scales[0].shape == (2, 4)
    assert (np.asarray(scales[0]) > 0).all()
    prep = prepare_swin_fused(m, v)
    q = prepare_swin_int8_static(m, v, n=4, min_dim=0)
    assert q and all("act_inv" in s for s in q.values())
    y_bf16 = np.asarray(fused_swin_apply(m, v, x, prepared=prep))
    y_stat = np.asarray(fused_swin_apply(m, v, x, prepared=prep,
                                         int8_prepared=q))
    assert not np.allclose(y_bf16, y_stat)  # actually quantized
    np.testing.assert_allclose(y_stat, y_bf16, rtol=0.1, atol=0.2)
    np.testing.assert_array_equal(y_stat.argmax(-1), y_bf16.argmax(-1))

    # MSE clip-search calibration (calibrate_vit's search, swin sow form):
    # per-tensor clips stay in [0.6, 1.0] x absmax and at least one tensor
    # actually tightens on random-normal calibration data
    from edgevisiontransformer_tpu.ops.quant import MSE_CLIP_RATIOS

    mse_scales = calibrate_swin(m, v, n=4, method="mse")
    ratio = np.concatenate([np.asarray(mse_scales[si] / scales[si]).ravel()
                            for si in scales])
    assert (ratio <= 1.0 + 1e-6).all()
    assert (ratio >= min(MSE_CLIP_RATIOS) - 1e-6).all()
    qm = prepare_swin_int8_static(m, v, n=4, min_dim=0, method="mse")
    y_mse = np.asarray(fused_swin_apply(m, v, x, prepared=prep,
                                        int8_prepared=qm))
    np.testing.assert_allclose(y_mse, y_bf16, rtol=0.1, atol=0.2)
    np.testing.assert_array_equal(y_mse.argmax(-1), y_bf16.argmax(-1))


def test_stage_geometry_matches_module_progression():
    """_stage_geometry must follow the module's res //= 2 progression (the
    prepare_* fns previously clamped at the window size and could disagree
    with fused_swin_apply off the standard configs), and int8 dispatch must
    actually engage for every stage prepare_swin_int8 emits."""
    from edgevisiontransformer_tpu.models.swin import (
        _stage_geometry, fused_swin_apply, prepare_swin_int8)
    from edgevisiontransformer_tpu.ops.pallas import swin_block as sb

    # window 4, image 128 / patch 4: res 32, 16, 8, 4 — every stage
    # divisible (the module supports only divisible windows), stage 3 at
    # w == res == 4
    cfg = swin_config("tiny", image_size=128, window_size=4, embed_dim=32,
                      depths=(2, 2, 2, 2), num_heads=(2, 2, 4, 4),
                      num_classes=5)
    m = SwinTransformer(cfg)
    x = jnp.ones((1, 3, 128, 128))
    v = m.init(jax.random.key(0), x)
    geoms = list(_stage_geometry(cfg, v["params"]))
    assert [g.res for g in geoms] == [32, 16, 8, 4]
    assert [g.w for g in geoms] == [4, 4, 4, 4]
    assert [g.nwin for g in geoms] == [64, 16, 4, 1]

    q = prepare_swin_int8(m, v, min_dim=0)
    int8_calls = []
    orig = sb.swin_stage_forward_pipelined

    def spy(*a, **kw):
        if kw.get("int8"):
            int8_calls.append(kw["nwin"])
        return orig(*a, **kw)

    sb.swin_stage_forward_pipelined = spy
    try:
        y = fused_swin_apply(m, v, x, int8_prepared=q)
    finally:
        sb.swin_stage_forward_pipelined = orig
    assert jnp.isfinite(y).all()
    # every prepared stage must have dispatched int8 (gate agreement)
    assert len(int8_calls) == len(q), (len(int8_calls), len(q))


def test_merge_perm_banded_structure():
    """Every output row selects exactly one input row; pad rows select none;
    group g=(dy,dx) of output token (y',x') sources pixel (2y'+dy, 2x'+dx)."""
    from edgevisiontransformer_tpu.ops.pallas.swin_merge import (
        merge_perm_banded)

    for res, w, n_pad in [(56, 7, 56), (28, 7, 56), (14, 7, 56), (8, 4, 16)]:
        P = merge_perm_banded(res, w, n_pad)
        n = w * w
        rowsum = P.sum(-1)  # [4, nb, rb_o]
        nb, rb_o = P.shape[1], P.shape[2]
        nwc_o = (res // 2) // w
        valid = np.zeros((nb, rb_o), bool)
        for b in range(nb):
            for k in range(rb_o):
                valid[b, k] = (k % n_pad) < n
        for g in range(4):
            assert (rowsum[g][valid] == 1.0).all()
            assert (rowsum[g][~valid] == 0.0).all()
        assert (P.sum((2,)) <= 1.0).all()  # each input row used at most once/group


def test_fused_swin_merge_kernel_runs_and_matches():
    """fused_swin_apply with prepared constants must actually route patch
    merging through the window-major banded-perm kernel (no silent XLA
    fallback) and keep exact-path parity."""
    import edgevisiontransformer_tpu.ops.pallas.swin_merge as sm
    from edgevisiontransformer_tpu.models.swin import (
        fused_swin_apply,
        prepare_swin_fused,
    )

    cfg = swin_config("tiny", image_size=56, embed_dim=32, depths=(2, 2),
                      num_heads=(2, 4), window_pack=1)
    m = SwinTransformer(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 56, 56))
    v = m.init(jax.random.key(1), x)
    y_ref = np.asarray(m.apply(v, x))
    prep = prepare_swin_fused(m, v)

    calls = []
    orig = sm.swin_merge_forward

    def spy(*a, **kw):
        calls.append(a[0].shape)
        return orig(*a, **kw)

    try:
        sm.swin_merge_forward = spy
        import edgevisiontransformer_tpu.models.swin as msw
        y_k = np.asarray(fused_swin_apply(m, v, x, prepared=prep))
        assert len(calls) == 1, calls  # one merge in a 2-stage config
        y_off = np.asarray(fused_swin_apply(m, v, x, prepared=prep,
                                            merge_kernel=False))
        assert len(calls) == 1  # kernel path skipped when disabled
    finally:
        sm.swin_merge_forward = orig
    np.testing.assert_allclose(y_k, y_ref, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(y_off, y_ref, rtol=2e-3, atol=2e-3)


def test_smooth_swin_exact_float_equivalence():
    """smooth_swin is an exact re-parameterization: the float forward is
    unchanged (window ops permute tokens, not channels; residuals branch
    before the LNs) while LN/qkv/proj/fc1 params really moved."""
    from edgevisiontransformer_tpu.models.swin import smooth_swin

    cfg = swin_config("tiny", image_size=56, embed_dim=32, depths=(2, 2),
                      num_heads=(2, 4), num_classes=11)
    m = SwinTransformer(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 56, 56))
    v = m.init(jax.random.key(1), x)
    vsm = smooth_swin(m, v, batches=[np.asarray(x)], alpha=0.5)
    ref = np.asarray(m.apply(v, x))
    got = np.asarray(m.apply(vsm, x))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=0)
    blk0, blk0s = v["params"]["stage_0_block_0"], vsm["params"]["stage_0_block_0"]
    assert np.abs(np.asarray(blk0s["ln1_scale"])
                  - np.asarray(blk0["ln1_scale"])).max() > 1e-6
    assert np.abs(np.asarray(blk0s["attn"]["proj"]["kernel"])
                  - np.asarray(blk0["attn"]["proj"]["kernel"])).max() > 1e-6


def test_smooth_swin_static_int8_pipeline_runs():
    """Smoothed tree flows through prepare_swin_fused +
    prepare_swin_int8_static and the whole-stage kernels: argmax agreement
    with the unsmoothed float forward."""
    from edgevisiontransformer_tpu.models.swin import (
        fused_swin_apply, prepare_swin_fused, prepare_swin_int8_static,
        smooth_swin)

    cfg = swin_config("tiny", image_size=56, embed_dim=32, depths=(2, 2),
                      num_heads=(2, 4), num_classes=11)
    m = SwinTransformer(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 56, 56))
    v = m.init(jax.random.key(1), x)
    vsm = smooth_swin(m, v, batches=[np.asarray(x)], alpha=0.5)
    qs = prepare_swin_int8_static(m, vsm, batches=[np.asarray(x)], min_dim=0)
    assert qs, "no stage qualified for the int8 whole-stage kernel"
    y = np.asarray(fused_swin_apply(m, vsm, x,
                                    prepared=prepare_swin_fused(m, vsm),
                                    int8_prepared=qs))
    ref = np.asarray(m.apply(v, x))
    np.testing.assert_array_equal(y.argmax(-1), ref.argmax(-1))
    np.testing.assert_allclose(y, ref, rtol=0.1, atol=0.2)
