"""T2T-ViT tests: unfold vs torch.nn.Unfold oracle, performer numerics, model shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgevisiontransformer_tpu.models.t2t_vit import (
    T2TViT,
    TokenPerformer,
    sinusoid_encoding,
    t2t_vit_config,
)
from edgevisiontransformer_tpu.ops.unfold import unfold, unfold_output_size


@pytest.mark.parametrize("k,s,p", [(7, 4, 2), (3, 2, 1)])
def test_unfold_matches_torch(k, s, p):
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).randn(2, 3, 16, 16).astype(np.float32)
    ours = np.asarray(unfold(jnp.asarray(x), k, s, p))
    ref = torch.nn.functional.unfold(
        torch.from_numpy(x), kernel_size=k, stride=s, padding=p
    ).numpy()  # [b, c*k*k, n]
    ref = np.transpose(ref, (0, 2, 1))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_unfold_tf_order():
    """tf order is (kh, kw, c) per patch — check against manual permute."""
    x = np.arange(2 * 2 * 4 * 4, dtype=np.float32).reshape(2, 2, 4, 4)
    t = np.asarray(unfold(jnp.asarray(x), 3, 2, 1, channel_order="torch"))
    f = np.asarray(unfold(jnp.asarray(x), 3, 2, 1, channel_order="tf"))
    b, n, ckk = t.shape
    perm = t.reshape(b, n, 2, 9).transpose(0, 1, 3, 2).reshape(b, n, ckk)
    np.testing.assert_array_equal(f, perm)


def test_unfold_output_size():
    assert unfold_output_size(224, 7, 4, 2) == 56
    assert unfold_output_size(56, 3, 2, 1) == 28
    assert unfold_output_size(28, 3, 2, 1) == 14


def test_sinusoid_encoding_values():
    t = sinusoid_encoding(4, 6)
    assert t.shape == (4, 6)
    np.testing.assert_allclose(t[0, 0::2], 0.0, atol=1e-8)  # sin(0)
    np.testing.assert_allclose(t[0, 1::2], 1.0, atol=1e-8)  # cos(0)
    np.testing.assert_allclose(t[2, 0], np.sin(2.0), rtol=1e-6)


def test_token_performer_forward():
    m = TokenPerformer(hidden_size=64)
    x = jax.random.normal(jax.random.key(0), (2, 10, 64))
    variables = m.init(jax.random.key(1), x)
    y = m.apply(variables, x)
    assert y.shape == (2, 10, 64)
    assert jnp.isfinite(y).all()


def test_token_performer_stability_large_inputs():
    """prm_exp must not overflow for large activations (fp32 exp guard)."""
    m = TokenPerformer(hidden_size=64)
    x = 30.0 * jax.random.normal(jax.random.key(0), (1, 8, 64))
    variables = m.init(jax.random.key(1), x)
    y = m.apply(variables, x)
    assert jnp.isfinite(y).all()


@pytest.mark.parametrize("variant,dim,depth", [(7, 256, 7), (14, 384, 14)])
def test_t2t_config_shapes(variant, dim, depth):
    cfg = t2t_vit_config(variant)
    assert cfg.dim == dim and cfg.depth == depth


def test_performer_training_dropout():
    """train=True applies the reference's dp1/dp2 dropouts (transformer_
    encoder.py:47,56): stochastic across rng, identity when train=False."""
    m = TokenPerformer(hidden_size=64)
    x = jax.random.normal(jax.random.key(0), (1, 8, 64))
    v = m.init(jax.random.key(1), x)
    y_eval = m.apply(v, x)
    y_eval2 = m.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(y_eval2))
    y_a = m.apply(v, x, train=True, rngs={"dropout": jax.random.key(2)})
    y_b = m.apply(v, x, train=True, rngs={"dropout": jax.random.key(3)})
    assert not np.allclose(np.asarray(y_a), np.asarray(y_b))
    assert not np.allclose(np.asarray(y_a), np.asarray(y_eval))
    # the full model threads train= down through the tokenizer
    cfg = t2t_vit_config(7, image_size=64, depth=1, num_classes=10)
    model = T2TViT(cfg)
    xi = jnp.ones((1, 3, 64, 64))
    vv = model.init(jax.random.key(0), xi)
    ya = model.apply(vv, xi, train=True, rngs={"dropout": jax.random.key(2)})
    yb = model.apply(vv, xi, train=False)
    assert not np.allclose(np.asarray(ya), np.asarray(yb))


def test_t2t_vit_forward_small():
    # Shrink image to keep CPU test fast: 64px -> t2t tokens 4x4.
    cfg = t2t_vit_config(7, image_size=64, depth=2, num_classes=10)
    model = T2TViT(cfg)
    x = jnp.ones((1, 3, 64, 64))
    variables = model.init(jax.random.key(0), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 10)
    assert jnp.isfinite(y).all()
    # sinusoid pos table is a non-trainable constant
    assert "constants" in variables


# ---------------------------------------------------------------------------
# Official-checkpoint converter parity: a torch re-statement of the official
# yitu-opensource T2T-ViT (whose *.pth.tar files the reference loads,
# tools.py:360-365) is the numerics oracle for import_t2t_torch.
# ---------------------------------------------------------------------------


def _build_torch_t2t(variant=7, num_classes=10, seed=0):
    import math

    import torch
    import torch.nn as tnn

    torch.manual_seed(seed)
    shapes = {7: (256, 7, 4, 512), 14: (384, 14, 6, 1152)}
    dim, depth, heads, mlp_dim = shapes[variant]
    token_dim = 64

    class TokenPerformer(tnn.Module):
        def __init__(self, in_feat, emb):
            super().__init__()
            self.emb = emb
            self.kqv = tnn.Linear(in_feat, 3 * emb)
            self.proj = tnn.Linear(emb, emb)
            self.norm1 = tnn.LayerNorm(in_feat)
            self.norm2 = tnn.LayerNorm(emb)
            self.mlp = tnn.Sequential(
                tnn.Linear(emb, emb), tnn.GELU(), tnn.Linear(emb, emb))
            self.m = int(emb * 0.5)
            self.register_parameter(
                "w",
                tnn.Parameter(
                    tnn.init.orthogonal_(torch.randn(self.m, emb))
                    * math.sqrt(self.m),
                    requires_grad=False,
                ),
            )
            self.epsilon = 1e-8

        def prm_exp(self, x):
            xd = (x * x).sum(-1, keepdim=True).repeat(1, 1, self.m) / 2
            wtx = torch.einsum("bti,mi->btm", x.float(), self.w)
            return torch.exp(wtx - xd) / math.sqrt(self.m)

        def forward(self, x):
            x = self.norm1(x)
            k, q, v = torch.split(self.kqv(x), self.emb, dim=-1)
            kp, qp = self.prm_exp(k), self.prm_exp(q)
            D = torch.einsum("bti,bi->bt", qp, kp.sum(1)).unsqueeze(2)
            kptv = torch.einsum("bin,bim->bnm", v.float(), kp)
            y = torch.einsum("bti,bni->btn", qp, kptv) / (
                D.repeat(1, 1, self.emb) + self.epsilon)
            y = v + self.proj(y)
            return y + self.mlp(self.norm2(y))

    class T2TModule(tnn.Module):
        def __init__(self):
            super().__init__()
            self.soft_split0 = tnn.Unfold(7, stride=4, padding=2)
            self.soft_split1 = tnn.Unfold(3, stride=2, padding=1)
            self.soft_split2 = tnn.Unfold(3, stride=2, padding=1)
            self.attention1 = TokenPerformer(3 * 7 * 7, token_dim)
            self.attention2 = TokenPerformer(token_dim * 9, token_dim)
            self.project = tnn.Linear(token_dim * 9, dim)

        def forward(self, x):
            x = self.soft_split0(x).transpose(1, 2)
            x = self.attention1(x)
            B, n, C = x.shape
            s = int(n ** 0.5)
            x = x.transpose(1, 2).reshape(B, C, s, s)
            x = self.soft_split1(x).transpose(1, 2)
            x = self.attention2(x)
            B, n, C = x.shape
            s = int(n ** 0.5)
            x = x.transpose(1, 2).reshape(B, C, s, s)
            x = self.soft_split2(x).transpose(1, 2)
            return self.project(x)

    class Mlp(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = tnn.Linear(dim, mlp_dim)
            self.act = tnn.GELU()
            self.fc2 = tnn.Linear(mlp_dim, dim)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    class Attention(tnn.Module):
        def __init__(self):
            super().__init__()
            self.qkv = tnn.Linear(dim, dim * 3, bias=False)
            self.proj = tnn.Linear(dim, dim)
            self.heads = heads

        def forward(self, x):
            B, N, C = x.shape
            hd = C // self.heads
            qkv = self.qkv(x).reshape(B, N, 3, self.heads, hd).permute(
                2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) * (hd ** -0.5)
            attn = attn.softmax(dim=-1)
            x = (attn @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj(x)

    class Block(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = tnn.LayerNorm(dim)
            self.attn = Attention()
            self.norm2 = tnn.LayerNorm(dim)
            self.mlp = Mlp()

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp(self.norm2(x))

    class T2TViTTorch(tnn.Module):
        def __init__(self):
            super().__init__()
            from edgevisiontransformer_tpu.models.t2t_vit import (
                sinusoid_encoding,
            )

            self.tokens_to_token = T2TModule()
            self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
            self.register_parameter(
                "pos_embed",
                tnn.Parameter(
                    torch.tensor(sinusoid_encoding(197, dim)[None]),
                    requires_grad=False,
                ),
            )
            self.blocks = tnn.ModuleList([Block() for _ in range(depth)])
            self.norm = tnn.LayerNorm(dim)
            self.head = tnn.Linear(dim, num_classes)

        def forward(self, x):
            x = self.tokens_to_token(x)
            cls = self.cls_token.expand(x.shape[0], -1, -1)
            x = torch.cat([cls, x], dim=1) + self.pos_embed
            for blk in self.blocks:
                x = blk(x)
            x = self.norm(x)
            return self.head(x[:, 0])

    return T2TViTTorch().eval()


def test_t2t_torch_checkpoint_parity():
    """import_t2t_torch must reproduce official-T2T logits exactly (fp32)."""
    import torch

    from edgevisiontransformer_tpu.models.t2t_vit import T2TViT
    from edgevisiontransformer_tpu.utils.hf_import import import_t2t_torch

    tm = _build_torch_t2t(variant=7, num_classes=10)
    x = np.random.RandomState(0).randn(2, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()

    cfg, variables = import_t2t_torch(tm.state_dict(), 7, num_classes=10)
    assert cfg.qkv_bias is False and cfg.layernorm_eps == 1e-5
    model = T2TViT(cfg)
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_fused_t2t_apply_parity():
    """Fast-stage1 tokenizer + resident fused encoder == module forward."""
    from edgevisiontransformer_tpu.models.t2t_vit import (
        fused_t2t_apply,
        prepare_t2t_fused,
    )

    cfg = t2t_vit_config(7, "reference", num_classes=10)
    model = T2TViT(cfg)
    x = jax.random.normal(jax.random.key(0), (1, 3, 224, 224))
    v = model.init(jax.random.key(1), x)
    ref = model.apply(v, x)
    got = fused_t2t_apply(model, v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
    prep = prepare_t2t_fused(model, v)
    got2 = fused_t2t_apply(model, v, x, prep)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_fused_t2t_apply_large_batch_parity():
    """b>=8 dispatches the plain-unfold tokenizer + streamed encoder (the
    shift-expanded stage-1 matmul regresses throughput); numerics must still
    match the module forward."""
    from edgevisiontransformer_tpu.models.t2t_vit import (
        fused_t2t_apply,
        prepare_t2t_fused,
    )

    cfg = t2t_vit_config(7, "reference", num_classes=6, depth=2)
    model = T2TViT(cfg)
    x = jax.random.normal(jax.random.key(0), (8, 3, 224, 224))
    v = model.init(jax.random.key(1), x[:1])
    ref = model.apply(v, x)
    prep = prepare_t2t_fused(model, v)
    got = fused_t2t_apply(model, v, x, prep)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_t2t_int8_static_end_to_end():
    """T2T full-integer static int8: calibrate_t2t scales, the XLA oracles,
    and the fused int8 encoder kernels all agree with the float forward
    within the int8 envelope (tokenizer stays float, like the ViT patch
    embed; reference TFLITE_BUILTINS_INT8 methodology utils.py:263-277)."""
    from edgevisiontransformer_tpu.models.t2t_vit import (
        fused_t2t_apply_int8,
        prepare_t2t_int8,
        prepare_t2t_int8_static,
    )
    from edgevisiontransformer_tpu.ops.quant import (
        calibrate_t2t,
        int8_t2t_apply,
        int8_t2t_apply_static,
        quantize_vit_params_int8,
        quantize_vit_params_int8_static,
    )

    cfg = t2t_vit_config(7, "reference", num_classes=6, depth=2)
    model = T2TViT(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 224, 224))
    v = model.init(jax.random.key(1), x[:1])
    ref = np.asarray(model.apply(v, x))
    denom = np.abs(ref).max() + 1e-9

    scales = calibrate_t2t(model, v, batches=[np.asarray(x)])
    assert scales.shape == (cfg.depth, 4)

    qs = quantize_vit_params_int8_static(v, scales)
    # sibling collections (sinusoid pos, performer consts) must survive
    assert set(qs) == set(v)
    ys = np.asarray(int8_t2t_apply_static(model, qs, x))
    assert np.abs(ys - ref).max() / denom < 0.15
    assert (ys.argmax(-1) == ref.argmax(-1)).all()

    yd = np.asarray(int8_t2t_apply(model, quantize_vit_params_int8(v), x))
    assert np.abs(yd - ref).max() / denom < 0.15

    # fused int8 encoder kernels vs their XLA oracles (interpret mode off-TPU)
    ks = np.asarray(fused_t2t_apply_int8(
        model, v, x, prepare_t2t_int8_static(model, v, act_scales=scales)))
    assert np.abs(ks - ys).max() / denom < 0.1
    kd = np.asarray(fused_t2t_apply_int8(model, v, x, prepare_t2t_int8(model, v)))
    assert np.abs(kd - yd).max() / denom < 0.1

    # MSE clip-search calibration walks the same t2t embed (two passes) —
    # scales stay in [0.6, 1.0] x absmax and the oracle still tracks float
    mse = calibrate_t2t(model, v, batches=[np.asarray(x)], method="mse")
    assert mse.shape == scales.shape
    assert np.all(mse <= scales + 1e-6) and np.all(mse >= 0.6 * scales - 1e-6)
    ym = np.asarray(int8_t2t_apply_static(
        model, quantize_vit_params_int8_static(v, mse), x))
    assert np.abs(ym - ref).max() / denom < 0.15


def test_t2t_stem_int8_static():
    """Stem static-int8 (stage-1/2 kqv + projection on the int8 MXU path,
    VERDICT r3 directive #5): calibrated scales are sane, the quantized
    stem tracks the float tokenizer within the int8 envelope end-to-end,
    and the b1 fast form composes (kqv1 stays float there by design)."""
    from edgevisiontransformer_tpu.models.t2t_vit import (
        calibrate_t2t_stem,
        fused_t2t_apply_int8,
        prepare_t2t_int8_static,
        prepare_t2t_stem_int8_static,
        t2t_tokenize,
    )

    cfg = t2t_vit_config(7, "reference", num_classes=6, depth=2)
    model = T2TViT(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 224, 224))
    v = model.init(jax.random.key(1), x[:1])

    batches = [np.asarray(x)]
    scales = calibrate_t2t_stem(model, v, batches=batches)
    assert set(scales) == {"kqv1", "kqv2", "project"}
    assert all(s > 0 for s in scales.values())

    sq = prepare_t2t_stem_int8_static(model, v, batches=batches)
    assert sq["project"]["q"].dtype == jnp.int8
    # combined scale = w_scale * act_scale, one column per output channel
    assert sq["kqv2"]["scale"].shape == (
        v["params"]["tokens_to_token"]["performer2"]["kqv"]["kernel"].shape[1],)

    ref_tok = np.asarray(t2t_tokenize(model, v, x, fast=False))
    got_tok = np.asarray(t2t_tokenize(model, v, x, fast=False, stem_q=sq))
    denom = np.abs(ref_tok).max() + 1e-9
    assert got_tok.shape == ref_tok.shape
    assert np.abs(got_tok - ref_tok).max() / denom < 0.15

    # whole model: float vs encoder-int8 + stem-int8
    ref = np.asarray(model.apply(v, x))
    enc_q = prepare_t2t_int8_static(model, v, calib_batches=batches)
    ys = np.asarray(fused_t2t_apply_int8(model, v, x, enc_q, stem_q=sq))
    d = np.abs(ref).max() + 1e-9
    assert np.abs(ys - ref).max() / d < 0.2
    assert (ys.argmax(-1) == ref.argmax(-1)).all()

    # fast (b1) form: kqv1 float, kqv2/project int8 — still composes
    got_fast = np.asarray(t2t_tokenize(model, v, x[:1], fast=True, stem_q=sq))
    assert got_fast.shape == (1,) + ref_tok.shape[1:]


def test_stage1_kqv_kernel_matches_fast_form():
    """ops/pallas/t2t_stage1: the fused shift-concat+kqv+LN kernel must
    reproduce fast_stage1_kqv (itself parity-tested against the plain
    unfold tokenizer) bit-near in bf16 and fp32."""
    from edgevisiontransformer_tpu.models.t2t_vit import (
        fast_stage1_kqv,
        prepare_t2t_fused,
    )
    from edgevisiontransformer_tpu.ops.pallas.t2t_stage1 import (
        stage1_kqv_kernel,
    )

    cfg = t2t_vit_config(7, "reference", num_classes=6, depth=1)
    model = T2TViT(cfg)
    x32 = jax.random.normal(jax.random.key(0), (2, 3, 224, 224))
    v = model.init(jax.random.key(1), x32[:1])
    prep = prepare_t2t_fused(model, v)
    eps = TokenPerformer.layernorm_eps

    for dt, tol in ((jnp.float32, 2e-5), (jnp.bfloat16, 0.04)):
        x = x32.astype(dt)
        ref = np.asarray(fast_stage1_kqv(
            x, prep["W9"].astype(dt), prep["M9"].astype(dt),
            prep["c1"], prep["c2"], eps=eps)).astype(np.float32)
        got = np.asarray(stage1_kqv_kernel(
            x, prep["W9"].astype(dt), prep["M9"], prep["c1"], prep["c2"],
            eps=eps)).astype(np.float32)
        assert got.shape == ref.shape == (2, 3136, 192)
        denom = np.abs(ref).max() + 1e-9
        assert np.abs(got - ref).max() / denom < tol, dt
