"""T2T stage-1 tokenizer kernel: shift-concat + kqv matmul + pre-LN, fused.

The b1 stem wall (VERDICT r3 directive #5 / tools/probe_t2t_stem.py):
``fast_stage1_kqv`` — kqv(LN(unfold(img, k7 s4 p2))) via the shift-expanded
matmul (models/t2t_vit.py:251-277) — measured 50 of t2t_7's ~83 us stem at
b1, ~19x off its 2.7 us MXU roofline: XLA materializes the 9-shift concat
(big [b, 3136, 432], 2.7 MB), runs three separate dot_generals (out / mu /
sq) plus the normalize chain, each a dispatch at b1.

This kernel keeps the whole padded s2d tensor (tp [58, 58, 48], 323 KB) in
VMEM and, per 8-row block of the 56x56 token grid, gathers the 9 shifted
views in-register, concatenates on the lane dim ([448, 432]) and runs ONE
[448, 432] @ [432, 3*emb] MXU matmul; mu/var come from VPU lane reductions
over the same registers (M9 as a 0/1 mask row — matmul-free).  One pass,
no HBM intermediates.

Numerics match fast_stage1_kqv exactly modulo bf16 rounding (f32
accumulation in both; golden-tested in tests/test_t2t.py).

Reference capability anchor: /root/reference/modeling/models/t2t_vit.py
stage-1 soft-split (torch nn.Unfold k7 s4 p2) — here re-designed TPU-first
instead of materializing the 147-column unfold.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import use_interpret

_SHIFTS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _stage1_kernel(tp_ref, w9_ref, m9_ref, c1_ref, c2_ref, o_ref, *,
                   eps: float, rows: int):
    """Grid (b, 56 // rows).  tp_ref [1, 58, 58, 48]; o_ref [1, rows*56, d]."""
    ri = pl.program_id(1)
    y0 = ri * rows
    parts = []
    for dy, dx in _SHIFTS:
        sl = tp_ref[0, pl.ds(y0 + 1 + dy, rows), 1 + dx:57 + dx, :]
        parts.append(sl.reshape(rows * 56, 48))
    big = jnp.concatenate(parts, axis=-1)            # [rows*56, 432]
    bigf = big.astype(jnp.float32)

    out = jax.lax.dot(big, w9_ref[:],
                      preferred_element_type=jnp.float32)  # [rows*56, d]
    m9 = m9_ref[:].astype(jnp.float32)               # [1, 432] 0/1 mask
    mu = jnp.sum(bigf * m9, axis=-1, keepdims=True) / 147.0
    sq = jnp.sum(bigf * bigf * m9, axis=-1, keepdims=True) / 147.0
    var = sq - mu * mu
    y = (out - mu * c1_ref[:]) * jax.lax.rsqrt(var + eps) + c2_ref[:]
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps",))
def stage1_kqv_kernel(img: jax.Array, W9: jax.Array, M9: jax.Array,
                      c1: jax.Array, c2: jax.Array,
                      eps: float = 1e-5) -> jax.Array:
    """Drop-in for fast_stage1_kqv (same prepared weights, same output).

    The s2d relayout + pad stay in XLA (one fused transpose); everything
    after runs in the kernel.
    """
    b = img.shape[0]
    dt = img.dtype
    d = W9.shape[1]
    t = img.reshape(b, 3, 56, 4, 56, 4)
    t = jnp.transpose(t, (0, 2, 4, 1, 3, 5)).reshape(b, 56, 56, 48)
    tp = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)))

    rows = 8
    # M9 arrives [432, 1]; the kernel wants a [1, 432] lane mask
    m9_row = M9.reshape(1, 432)

    kernel = functools.partial(_stage1_kernel, eps=eps, rows=rows)
    out = pl.pallas_call(
        kernel,
        grid=(b, 56 // rows),
        in_specs=[
            pl.BlockSpec((1, 58, 58, 48), lambda bi, ri: (bi, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # W9 [432, d]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # M9 [1, 432]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # c1 [1, d]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # c2 [1, d]
        ],
        out_specs=pl.BlockSpec((1, rows * 56, d), lambda bi, ri: (bi, ri, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 3136, d), dt),
        interpret=use_interpret(),
    )(tp, W9.astype(dt), m9_row.astype(dt),
      c1.astype(jnp.float32).reshape(1, d), c2.astype(jnp.float32).reshape(1, d))
    return out
