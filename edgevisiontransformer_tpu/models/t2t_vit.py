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

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
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
        y = vf + attn_out(y.astype(self.dtype)).astype(jnp.float32)
        y = y.astype(self.dtype)

        h = layer_norm(y, g2, b2, self.layernorm_eps)
        h = mlp_block(h, w1.astype(self.dtype), bb1.astype(self.dtype),
                      w2.astype(self.dtype), bb2.astype(self.dtype),
                      get_gelu(self.gelu_approx))
        return y + h


class T2TModule(nn.Module):
    """Tokens-to-Token tokenizer (reference t2t_vit.py:43-88)."""

    embedding_size: int
    token_size: int = 64
    image_size: int = 224
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jax.Array) -> jax.Array:
        # img: NCHW [b, 3, H, W]
        b = img.shape[0]
        x = unfold(img.astype(self.dtype), 7, 4, 2)  # [b, 56*56, 147]
        s0 = unfold_output_size(self.image_size, 7, 4, 2)

        x = TokenPerformer(self.token_size, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="performer1")(x)
        x = x.reshape(b, s0, s0, self.token_size)
        x = jnp.transpose(x, (0, 3, 1, 2))  # NCHW for unfold
        x = unfold(x, 3, 2, 1)  # [b, 28*28, token*9]
        s1 = unfold_output_size(s0, 3, 2, 1)

        x = TokenPerformer(self.token_size, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="performer2")(x)
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
    def __call__(self, img: jax.Array) -> jax.Array:
        cfg = self.config
        n = (cfg.image_size // 16) ** 2  # 3 soft-splits: strides 4*2*2

        x = T2TModule(
            embedding_size=cfg.dim,
            token_size=self.token_size,
            image_size=cfg.image_size,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            name="tokens_to_token",
        )(img)

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
            x = EncoderBlock(cfg, i, name=f"block_{i}")(x)

        x = LayerNormP(cfg, name="final_norm")(x)
        x = x[:, 0]
        return nn.Dense(
            cfg.num_classes, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="head"
        )(x)


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
