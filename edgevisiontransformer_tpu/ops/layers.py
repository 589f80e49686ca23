"""Elementwise / normalization / MLP building blocks as pure functions.

These are the XLA-path implementations; Pallas fused equivalents live in
ops/pallas/ and are validated against these in tests.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def layer_norm(x: jax.Array, gamma: jax.Array, beta: jax.Array, eps: float) -> jax.Array:
    """LayerNorm over the last axis (reference norm.py uses Keras LN, eps=1e-5).

    Statistics in fp32 regardless of compute dtype — LN is the classic bf16
    fidelity hazard on TPU.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(x.dtype)


def mlp_block(
    x: jax.Array,
    w1: jax.Array,
    b1: Optional[jax.Array],
    w2: jax.Array,
    b2: Optional[jax.Array],
    act: Callable[[jax.Array], jax.Array],
) -> jax.Array:
    """Dense(hidden, act) -> Dense(out) (reference ffn.py:5-12)."""
    h = x @ w1
    if b1 is not None:
        h = h + b1
    h = act(h)
    y = h @ w2
    if b2 is not None:
        y = y + b2
    return y


def patch_embed(
    img: jax.Array, w: jax.Array, b: Optional[jax.Array], patch_size: int
) -> jax.Array:
    """Patch extraction as reshape + matmul (conv-as-matmul).

    img is NCHW [b, c, H, W] to match the reference's input contract
    (vit.py:31-32: Rearrange 'b c (h p1) (w p2) -> b (h w) (p1 p2 c)').
    w is [p*p*c, dim].  On TPU this is a single large matmul — exactly what
    the MXU wants; no im2col materialization is needed because the patch
    rearrange is a free relayout fused by XLA.
    """
    b_, c, hh, ww = img.shape
    p = patch_size
    gh, gw = hh // p, ww // p
    if c <= 4 and p >= 8:
        # Space-to-depth ordering: the direct rearrange puts the size-c
        # channel dim minor, and a 3-wide lane dim wastes 125/128 of every
        # relayout op (measured 20.0 us for [1,3,224,224] p16 on v5e).  The
        # (c, p1, p2) ordering relayouts fast (9.9 us incl. matmul); the
        # weight rows are permuted to match (p=4 regresses — its s2d form
        # measured 21.6 us vs 21.1 direct — hence the p>=8 gate).
        idx = np.empty(c * p * p, np.int64)
        for ci in range(c):
            for dy in range(p):
                for dx in range(p):
                    idx[ci * p * p + dy * p + dx] = (dy * p + dx) * c + ci
        x = img.reshape(b_, c, gh, p, gw, p)
        x = jnp.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(b_, gh * gw, c * p * p)
        y = jax.lax.dot_general(
            x, w[idx], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(img.dtype)
    else:
        # b c (gh p1) (gw p2) -> b (gh gw) (p1 p2 c)
        x = img.reshape(b_, c, gh, p, gw, p)
        x = jnp.transpose(x, (0, 2, 4, 3, 5, 1))  # b gh gw p1 p2 c
        x = x.reshape(b_, gh * gw, p * p * c)
        y = x @ w
    if b is not None:
        y = y + b
    return y
