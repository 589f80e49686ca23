"""Pallas kernels vs jnp reference numerics (interpret mode on CPU).

The reference's fusion-test methodology (experiments.py:32-87) becomes our
kernel acceptance tests: each fused kernel must match the XLA-path math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgevisiontransformer_tpu.ops import attention as attn_ref
from edgevisiontransformer_tpu.ops import layers as layers_ref
from edgevisiontransformer_tpu.ops.activations import get_gelu
from edgevisiontransformer_tpu.ops.pallas import fused_attention, fused_mlp, layernorm


@pytest.mark.parametrize("b,h,n,d", [(1, 3, 197, 64), (2, 2, 50, 32)])
def test_pallas_sdpa_matches_reference(b, h, n, d):
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (b, h, n, d))
    k = jax.random.normal(ks[1], (b, h, n, d))
    v = jax.random.normal(ks[2], (b, h, n, d))
    ref = attn_ref.sdpa(q, k, v)
    got = fused_attention.sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pallas_attention_block_matches_reference():
    b, n, dim, h, d = 2, 197, 192, 3, 64
    ks = jax.random.split(jax.random.key(1), 5)
    x = jax.random.normal(ks[0], (b, n, dim))
    w_qkv = jax.random.normal(ks[1], (dim, 3 * h * d)) * 0.05
    b_qkv = jax.random.normal(ks[2], (3 * h * d,)) * 0.05
    w_out = jax.random.normal(ks[3], (h * d, dim)) * 0.05
    b_out = jax.random.normal(ks[4], (dim,)) * 0.05
    ref = attn_ref.attention_xla(x, w_qkv, b_qkv, w_out, b_out, h, d)
    got = fused_attention.attention(x, w_qkv, b_qkv, w_out, b_out, h, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("rows,dim,hidden", [(197, 192, 768), (64, 128, 256)])
@pytest.mark.parametrize("approx", [True, False])
def test_pallas_mlp_matches_reference(rows, dim, hidden, approx):
    ks = jax.random.split(jax.random.key(2), 5)
    x = jax.random.normal(ks[0], (2, rows, dim))
    w1 = jax.random.normal(ks[1], (dim, hidden)) * 0.05
    b1 = jax.random.normal(ks[2], (hidden,)) * 0.05
    w2 = jax.random.normal(ks[3], (hidden, dim)) * 0.05
    b2 = jax.random.normal(ks[4], (dim,)) * 0.05
    ref = layers_ref.mlp_block(x, w1, b1, w2, b2, get_gelu(approx))
    got = fused_mlp.mlp(x, w1, b1, w2, b2, approx_gelu=approx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("rows,dim", [(197, 192), (50, 64)])
def test_pallas_layernorm_matches_reference(rows, dim):
    ks = jax.random.split(jax.random.key(3), 3)
    x = jax.random.normal(ks[0], (2, rows, dim)) * 3.0
    g = jax.random.normal(ks[1], (dim,)) + 1.0
    b = jax.random.normal(ks[2], (dim,))
    ref = layers_ref.layer_norm(x, g, b, 1e-5)
    got = layernorm.layer_norm(x, g, b, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_vit_pallas_mode_matches_xla_mode():
    """End-to-end: whole DeiT forward with kernel_mode=pallas == xla."""
    from edgevisiontransformer_tpu.models.vit import ViT, deit_config

    cfg = deit_config("tiny").replace(
        image_size=32, patch_size=16, dim=64, depth=2, heads=2, mlp_dim=128,
        num_classes=10,
    )
    x = jax.random.normal(jax.random.key(0), (2, 3, 32, 32))
    model = ViT(cfg)
    params = model.init(jax.random.key(1), x)
    ref = model.apply(params, x)
    got = ViT(cfg.replace(kernel_mode="pallas")).apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_pallas_sdpa_bf16():
    q = jax.random.normal(jax.random.key(0), (1, 3, 197, 64), jnp.bfloat16)
    ref = attn_ref.sdpa(q, q, q)
    got = fused_attention.sdpa(q, q, q)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=0.05, atol=0.05
    )


def test_fused_encoder_batched_attn_parity():
    """_BATCHED_ATTN (one 3-D dot_general per head over the program's bm
    images, the r5 issue-overhead A/B) must match the unrolled per-image
    form exactly on a multi-image block, in both the bf16 and the static
    int8 kernels."""
    import edgevisiontransformer_tpu.ops.pallas.fused_encoder as fe
    from edgevisiontransformer_tpu.models.vit import (
        ViT,
        deit_config,
        fused_vit_apply,
        fused_vit_apply_int8,
        prepare_vit_int8_static,
    )

    cfg = deit_config("tiny").replace(
        image_size=32, patch_size=16, dim=64, depth=2, heads=2, mlp_dim=128,
        num_classes=10,
    )
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (4, 3, 32, 32))
    params = model.init(jax.random.key(1), x[:1])
    sq = prepare_vit_int8_static(model, params, calib_batches=[
        np.asarray(x, np.float32)])

    assert fe._BATCHED_ATTN is False  # unrolled is the measured-on default
    outs = {}
    for batched in (False, True):
        fe._BATCHED_ATTN = batched
        try:
            outs[batched] = (
                np.asarray(fused_vit_apply(model, params, x), np.float32),
                np.asarray(fused_vit_apply_int8(model, params, x, sq),
                           np.float32),
            )
        finally:
            fe._BATCHED_ATTN = False
    np.testing.assert_allclose(outs[True][0], outs[False][0],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(outs[True][1], outs[False][1],
                               rtol=1e-5, atol=1e-5)


def test_fully_fused_vit_matches_xla():
    """Whole-model single-kernel path == standard apply."""
    from edgevisiontransformer_tpu.models.vit import (
        ViT,
        deit_config,
        fully_fused_vit_apply,
    )

    cfg = deit_config("tiny").replace(depth=2)
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 224, 224))
    params = model.init(jax.random.key(1), x)
    ref = np.asarray(model.apply(params, x))
    got = np.asarray(fully_fused_vit_apply(model, params, x))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=5e-4)


def test_fully_fused_rejects_reference_head():
    from edgevisiontransformer_tpu.models.vit import (
        ViT,
        deit_config,
        fully_fused_vit_apply,
    )
    import pytest as _pytest

    cfg = deit_config("tiny", "reference").replace(depth=1)
    model = ViT(cfg)
    x = jnp.ones((1, 3, 224, 224))
    params = model.init(jax.random.key(0), x)
    with _pytest.raises(ValueError):
        fully_fused_vit_apply(model, params, x)


def test_fused_encoder_uniform_pruned():
    """Uniformly pruned models ('all_headH_ffnF') run through the fused kernel."""
    from edgevisiontransformer_tpu.models.vit import (
        ViT,
        fused_vit_apply,
        pruned_vit_config,
    )

    cfg = pruned_vit_config(size="tiny", prune_encoding="all_head2_ffn0.5").replace(depth=2)
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (1, 3, 224, 224))
    params = model.init(jax.random.key(1), x)
    ref = np.asarray(model.apply(params, x))
    got = np.asarray(fused_vit_apply(model, params, x))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=5e-4)

    # non-uniform (layerwise) shapes run segmented (round 2): parity vs XLA
    enc = "layerwise_" + "_".join(["h2-d0.5"] * 6 + ["h3-d1.0"] * 6)
    cfg2 = pruned_vit_config(size="tiny", prune_encoding=enc).replace(
        image_size=32, patch_size=16, dim=64, mlp_dim=64, head_dim=16,
        num_classes=10,
    )
    from edgevisiontransformer_tpu.config import decode_prune_encoding

    hpl, mpl = decode_prune_encoding(enc, 12, 64)
    cfg2 = cfg2.replace(heads_per_layer=hpl, mlp_dim_per_layer=mpl)
    m2 = ViT(cfg2)
    x2 = jax.random.normal(jax.random.key(3), (1, 3, 32, 32))
    p2 = m2.init(jax.random.key(0), x2)
    got2 = fused_vit_apply(m2, p2, x2)
    ref2 = m2.apply(p2, x2)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=1e-4, atol=5e-4)


def test_fused_encoder_head_packed():
    """Head-packed layerwise path (stack_vit_layer_params_packed): an
    alternating-shape model runs as ONE zero-padded kernel, exactly equal
    to the segmented path and to XLA (VERDICT r2 #7)."""
    from edgevisiontransformer_tpu.config import decode_prune_encoding
    from edgevisiontransformer_tpu.models.vit import (
        ViT,
        fused_vit_apply,
        pruned_vit_config,
    )

    enc = "layerwise_" + "_".join(["h2-d0.5", "h1-d0.3"] * 6)
    cfg = pruned_vit_config(size="tiny", prune_encoding=enc).replace(
        image_size=32, patch_size=16, dim=64, mlp_dim=64, head_dim=16,
        num_classes=10,
    )
    hpl, mpl = decode_prune_encoding(enc, 12, 64)
    cfg = cfg.replace(heads_per_layer=hpl, mlp_dim_per_layer=mpl)
    m = ViT(cfg)
    x = jax.random.normal(jax.random.key(5), (2, 3, 32, 32))
    p = m.init(jax.random.key(0), x)
    ref = np.asarray(m.apply(p, x))
    packed = np.asarray(fused_vit_apply(m, p, x, pack_layers=True))
    seg = np.asarray(fused_vit_apply(m, p, x, pack_layers=False))
    np.testing.assert_allclose(packed, ref, rtol=1e-4, atol=5e-4)
    # packed and segmented are the same math modulo fp reassociation
    np.testing.assert_allclose(packed, seg, rtol=1e-5, atol=1e-5)
    # default never packs (measured negative result, see fused_vit_apply)
    auto = np.asarray(fused_vit_apply(m, p, x))
    np.testing.assert_allclose(auto, seg, rtol=0, atol=0)


def test_block_spec_validator_catches_smem_violation():
    """The validator reproduces the Mosaic rule that interpret mode skips:
    a (1, 4) block over a [12, 4] SMEM array (the round-3 streamed-int8 bug)
    must raise at call time on CPU."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from edgevisiontransformer_tpu.ops.pallas.common import (
        check_block_shape,
        install_block_spec_validator,
    )

    install_block_spec_validator()  # idempotent

    with pytest.raises(ValueError, match="Mosaic block rule"):
        check_block_shape((1, 4), (12, 4), "unit")
    check_block_shape((1, 4), (1, 4))        # equal dims: fine
    check_block_shape((8, 128), (64, 512))   # divisible: fine

    def k(s_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:] * s_ref[0, 0]

    bad = pl.pallas_call(
        k,
        grid=(12,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=True,
    )
    with pytest.raises(ValueError, match="Mosaic block rule"):
        bad(jnp.ones((12, 4), jnp.float32), jnp.ones((8, 128), jnp.float32))


def test_blocked_encoder_matches_plain():
    """MLP-blocked kernel variant == plain fused kernel == XLA."""
    from edgevisiontransformer_tpu.models.vit import ViT, deit_config
    from edgevisiontransformer_tpu.ops.pallas.fused_encoder import (
        encoder_forward,
        encoder_forward_blocked,
        stack_vit_layer_params,
    )

    cfg = deit_config("tiny").replace(depth=2)
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 197, 192))
    params = model.init(jax.random.key(1), jnp.ones((1, 3, 224, 224)))["params"]
    stacked = stack_vit_layer_params(params, 2, cfg.qkv_bias)
    ref = encoder_forward(x, stacked, heads=3, head_dim=64, eps=1e-6)
    got = encoder_forward_blocked(x, stacked, heads=3, head_dim=64, eps=1e-6,
                                  mlp_chunk=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pipelined_encoder_matches_plain():
    """Double-buffered-DMA kernel (both unrolled and fori forms, and the int8
    form) == plain fused kernel, including lane-unaligned (pruned) shapes."""
    from edgevisiontransformer_tpu.models.vit import ViT, pruned_vit_config
    from edgevisiontransformer_tpu.ops.pallas.fused_encoder import (
        encoder_forward,
        encoder_forward_int8,
        encoder_forward_int8_pipelined,
        encoder_forward_pipelined,
        quantize_stacked_int8,
        stack_vit_layer_params,
    )

    # tiny pruned shape: qkv lane 384, mlp 538 — exercises the 128-padding
    cfg = pruned_vit_config(size="tiny", prune_encoding="all_head2_ffn0.7").replace(depth=3)
    model = ViT(cfg)
    params = model.init(jax.random.key(1), jnp.ones((1, 3, 224, 224)))["params"]
    stacked = stack_vit_layer_params(params, 3, cfg.qkv_bias)
    x = jax.random.normal(jax.random.key(0), (2, 197, 192))
    kw = dict(heads=2, head_dim=64, eps=1e-6)
    ref = np.asarray(encoder_forward(x, stacked, **kw))
    for unroll in (True, False):
        got = np.asarray(encoder_forward_pipelined(x, stacked, unroll=unroll, **kw))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    # int8: compare against the per-layer chain of the reference kernel —
    # the pipelined kernel is bit-identical to it, while the grid-streamed
    # kernel's multi-layer composition wobbles by ~1 ulp (different XLA
    # fusion), which the per-row quantization amplifies into quant-step flips
    sq = quantize_stacked_int8(stacked)
    y = x
    for li in range(3):
        sl = {key: v[li:li + 1] for key, v in sq.items()}
        y = encoder_forward_int8(y, sl, **kw)
    got8 = np.asarray(encoder_forward_int8_pipelined(x, sq, unroll=True, **kw))
    np.testing.assert_allclose(got8, np.asarray(y), rtol=1e-5, atol=1e-5)
    # the fori form compiles the layer body once, so XLA fuses it differently;
    # a ~1-ulp fp difference before jnp.round flips quant buckets — agreement
    # is only up to quantization noise (same bound as the int8-vs-XLA test)
    got8f = np.asarray(encoder_forward_int8_pipelined(x, sq, unroll=False, **kw))
    np.testing.assert_allclose(got8f, np.asarray(y), rtol=0.03, atol=0.06)


def test_base_dispatches_to_blocked():
    """fused_vit_apply on DeiT-Base shapes must route to the blocked kernel
    and match XLA."""
    from edgevisiontransformer_tpu.models.vit import ViT, deit_config, fused_vit_apply

    cfg = deit_config("base").replace(depth=1)
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (1, 3, 224, 224))
    params = model.init(jax.random.key(1), x)
    ref = np.asarray(model.apply(params, x))
    got = np.asarray(fused_vit_apply(model, params, x))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=5e-4)


def test_int8_fused_encoder_matches_xla_int8():
    """encoder_forward_int8 (interpret off-TPU) must reproduce the XLA
    dynamic-int8 path (ops/quant.int8_vit_apply) — same per-row activation
    quantization, per-channel weight scales."""
    from edgevisiontransformer_tpu.models.vit import (
        ViT,
        deit_config,
        fused_vit_apply_int8,
        prepare_vit_int8,
    )
    from edgevisiontransformer_tpu.ops.quant import (
        int8_vit_apply,
        quantize_vit_params_int8,
    )

    cfg = deit_config("tiny").replace(
        image_size=32, patch_size=16, dim=64, depth=3, heads=2, mlp_dim=128,
        num_classes=10,
    )
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 32, 32))
    v = model.init(jax.random.key(1), x)
    ref = int8_vit_apply(model, quantize_vit_params_int8(v), x)
    got = fused_vit_apply_int8(model, v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
    # prepared fast path identical
    sq = prepare_vit_int8(model, v)
    got2 = fused_vit_apply_int8(model, v, x, sq)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got), rtol=0, atol=0)


def test_int8_static_fused_matches_xla_static():
    """Static-scale int8 kernels (streamed + pipelined) must reproduce the
    XLA static path (ops/quant.int8_vit_apply_static): calibrated per-tensor
    activation scales, combined dequant multipliers."""
    from edgevisiontransformer_tpu.models.vit import (
        ViT,
        deit_config,
        fused_vit_apply_int8,
        prepare_vit_int8_static,
    )
    from edgevisiontransformer_tpu.ops.quant import (
        calibrate_vit,
        int8_vit_apply_static,
        quantize_vit_params_int8_static,
    )

    cfg = deit_config("tiny").replace(
        image_size=32, patch_size=16, dim=64, depth=3, heads=2, mlp_dim=128,
        num_classes=10,
    )
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 32, 32))
    v = model.init(jax.random.key(1), x)
    calib = [np.asarray(jax.random.normal(jax.random.key(i), x.shape))
             for i in range(2, 4)]
    scales = calibrate_vit(model, v, batches=calib)

    ref = int8_vit_apply_static(model, quantize_vit_params_int8_static(v, scales), x)
    sq = prepare_vit_int8_static(model, v, act_scales=scales)
    assert "act_inv" in sq
    for variant in ("streamed", "pipelined"):
        got = fused_vit_apply_int8(model, v, x, sq, variant=variant)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3, err_msg=variant)


def test_fully_fused_pipelined_multistep_grid():
    """bm < b with bm % 8 != 0 pads the output block to 8 sublanes."""
    import jax.numpy as jnp

    from edgevisiontransformer_tpu.models.vit import (
        ViT,
        deit_config,
        fully_fused_vit_apply,
    )

    cfg = deit_config("tiny").replace(image_size=32, patch_size=16, dim=64,
                                      depth=2, heads=2, mlp_dim=128,
                                      num_classes=10)
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (6, 3, 32, 32))
    params = model.init(jax.random.key(1), x)
    ref = np.asarray(model.apply(params, x))
    got = np.asarray(fully_fused_vit_apply(model, params, x, batch_block=2))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_performer_kernel_matches_reference_chain():
    """Whole-TokenPerformer kernel (ops/pallas/performer.py) vs the XLA
    chain (_performer_rest), incl. a non-multiple-of-8 token count to cover
    the padded-row kp masking."""
    from edgevisiontransformer_tpu.models.t2t_vit import _performer_rest
    from edgevisiontransformer_tpu.ops.pallas.performer import performer_rest

    class Cfg:
        dtype = jnp.bfloat16
        gelu_approx = True

    ts, m = 64, 32
    r = np.random.RandomState(0)
    p = {
        "attn_output": {"kernel": jnp.asarray(r.randn(ts, ts) * 0.1, jnp.float32),
                        "bias": jnp.asarray(r.randn(ts) * 0.1, jnp.float32)},
        "norm2_scale": jnp.asarray(1 + r.randn(ts) * 0.1, jnp.float32),
        "norm2_bias": jnp.asarray(r.randn(ts) * 0.1, jnp.float32),
        "mlp_fc1_kernel": jnp.asarray(r.randn(ts, ts) * 0.1, jnp.float32),
        "mlp_fc1_bias": jnp.asarray(r.randn(ts) * 0.1, jnp.float32),
        "mlp_fc2_kernel": jnp.asarray(r.randn(ts, ts) * 0.1, jnp.float32),
        "mlp_fc2_bias": jnp.asarray(r.randn(ts) * 0.1, jnp.float32),
    }
    w = jnp.asarray(r.randn(m, ts) * 0.3, jnp.float32)
    for n in (784, 50):  # 50 exercises the n%8!=0 padded-row mask
        x = jnp.asarray(r.randn(2, n, 3 * ts) * 0.5, jnp.bfloat16)
        ref = np.asarray(_performer_rest(x, p, {"w": w}, Cfg, ts), np.float32)
        got = np.asarray(
            performer_rest(x, p, w, eps_ln=1e-5, approx_gelu=True), np.float32)
        assert got.shape == ref.shape
        rel = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 0.02, (n, rel)


def test_encoder_forward_xla_matches_kernel():
    """The functional XLA encoder (ops/attention.encoder_forward_xla) must
    agree with the streamed Pallas encoder on the same stacked params — it
    is the dispatch target for kernel-losing regimes (dim<=256, b>=8)."""
    from edgevisiontransformer_tpu.ops.attention import encoder_forward_xla
    from edgevisiontransformer_tpu.ops.pallas.fused_encoder import (
        encoder_forward)

    dim, depth, heads, mlp, n, b = 128, 3, 2, 256, 50, 2
    r = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(r.randn(*s) * 0.05, jnp.float32)
    stacked = {
        "qkv_w": mk(depth, dim, 3 * dim), "qkv_b": mk(depth, 1, 3 * dim),
        "out_w": mk(depth, dim, dim), "out_b": mk(depth, 1, dim),
        "fc1_w": mk(depth, dim, mlp), "fc1_b": mk(depth, 1, mlp),
        "fc2_w": mk(depth, mlp, dim), "fc2_b": mk(depth, 1, dim),
        "ln1_g": 1 + mk(depth, 1, dim), "ln1_b": mk(depth, 1, dim),
        "ln2_g": 1 + mk(depth, 1, dim), "ln2_b": mk(depth, 1, dim),
    }
    stacked = jax.tree.map(lambda a: a.astype(jnp.bfloat16), stacked)
    x = jnp.asarray(r.randn(b, n, dim) * 0.5, jnp.bfloat16)
    for rr in (False, True):
        y_x = np.asarray(encoder_forward_xla(
            x, stacked, heads=heads, head_dim=dim // heads, eps=1e-6,
            reference_residual=rr), np.float32)
        y_k = np.asarray(encoder_forward(
            x, stacked, heads=heads, head_dim=dim // heads, eps=1e-6,
            reference_residual=rr), np.float32)
        rel = np.abs(y_x - y_k).max() / (np.abs(y_x).max() + 1e-9)
        assert rel < 0.03, (rr, rel)
