"""Whole-TokenPerformer Pallas kernel for the T2T tokenizer stages.

The reference tokenizer (/root/reference/T2T-ViT lineage,
modeling/layers/transformer_encoder.py:67-94) runs the performer chain as
~10 separate ops: kqv split, two prm_exp (matmul + exp), the D and kptv
reductions, the y recombination, attn_output, the v-skip, LN and the MLP.
On TPU each step is a [n_tokens, ts] HBM round-trip (n = 3136 / 784 tokens,
ts = 64) — low arithmetic intensity, bandwidth-bound.  At these shapes one
batch element's ENTIRE working set is ~3 MB, so this kernel runs the whole
chain per batch element out of VMEM with a single input DMA ([n, 3*ts]) and
a single output DMA ([n, ts]).

Numerics mirror models/t2t_vit._performer_rest exactly: fp32 prm_exp/D/kptv,
the attn_output matmul on the bf16-cast y, the skip from v (not x), LN
stats in fp32, MLP in compute dtype with fp32 accumulation.

Grid: one program per batch element — the D / kptv reductions are global
over tokens, so token-blocking would need a two-phase pass; at n<=3136 the
whole token axis fits VMEM and the batch grid double-buffers the per-image
DMAs instead.

MEASURED NEGATIVE RESULT (kept for the record, NOT dispatched): same-session
TPU v5e A/B vs the XLA chain (models/t2t_vit._performer_rest):
n=3136: b1 11.2 vs 7.1 us, b32 0.352 vs 0.099 ms; n=784: b1 4.1 vs 3.3 us,
b32 0.093 vs 0.030 ms.  At ts=64 every op in the chain is too narrow to
fill the MXU from one image's rows, and the per-image grid serializes what
XLA batches across images; the ~10 HBM round-trips this kernel saves are
cheaper than the lost batching.  models/t2t_vit._performer_dispatch keeps
the XLA chain.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import round_up, use_interpret
from .mathlib import gelu_kernel


def _performer_kernel(k_ref, q_ref, v_ref, w_ref, wo_ref, bo_ref,
                      g2_ref, be2_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      o_ref, *, m: int, eps_ln: float, approx: bool,
                      n_valid: int):
    inv_sqrt_m = 1.0 / math.sqrt(m)
    dt = o_ref.dtype

    def prm_exp(t_ref):
        t = t_ref[0].astype(jnp.float32)  # [n, ts]
        td = jnp.sum(t * t, axis=-1, keepdims=True) * 0.5
        wtd = jax.lax.dot_general(
            t, w_ref[:].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [n, m]
        return jnp.exp(wtd - td) * inv_sqrt_m

    kp = prm_exp(k_ref)
    qp = prm_exp(q_ref)
    if n_valid != kp.shape[0]:
        # padded token rows: exp(0-0)=1 would pollute the global reductions
        row = jax.lax.broadcasted_iota(jnp.int32, kp.shape, 0)
        kp = jnp.where(row < n_valid, kp, 0.0)
    vf = v_ref[0].astype(jnp.float32)  # [n, ts]

    kp_sum = jnp.sum(kp, axis=0, keepdims=True)  # [1, m]
    d = jax.lax.dot_general(
        qp, kp_sum, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [n, 1]
    kptv = jax.lax.dot_general(
        vf, kp, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [ts, m]
    # reference guards with d + 1e-8; Mosaic folds that add into the dot's
    # reduction accumulator init and rejects it ("only neutral accumulator
    # supported"), so guard with max() — identical for d >> 1e-8, which
    # always holds (kp rows are positive exp sums)
    y = jax.lax.dot_general(
        qp, kptv, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / jnp.maximum(d, 1e-8)  # [n, ts]

    ao = jax.lax.dot_general(
        y.astype(dt), wo_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[:].astype(jnp.float32)
    y2 = (vf + ao).astype(dt)  # skip from v, not x (reference quirk)

    xf = y2.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps_ln)
    h = h * g2_ref[:].astype(jnp.float32) + be2_ref[:].astype(jnp.float32)

    h = jax.lax.dot_general(
        h.astype(dt), w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:].astype(jnp.float32)
    h = gelu_kernel(h.astype(dt), approx)
    h = jax.lax.dot_general(
        h, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:].astype(jnp.float32)

    o_ref[0] = (y2.astype(jnp.float32) + h).astype(dt)


def performer_rest(x_kqv: jax.Array, p: dict, w: jax.Array, *,
                   eps_ln: float, approx_gelu: bool) -> jax.Array:
    """Fused replacement for models/t2t_vit._performer_rest.

    x_kqv: [b, n, 3*ts]; p: the performer param subtree (attn_output, norm2,
    mlp_fc*); w: [m, ts] frozen random-feature matrix.  Returns [b, n, ts].
    """
    b, n, three_ts = x_kqv.shape
    ts = three_ts // 3
    m = w.shape[0]
    dt = x_kqv.dtype

    n_pad = round_up(n, 8)
    k, q, v = jnp.split(x_kqv, 3, axis=-1)
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        k, q, v = jnp.pad(k, pad), jnp.pad(q, pad), jnp.pad(v, pad)

    wo = p["attn_output"]["kernel"].astype(dt)
    bo = p["attn_output"]["bias"].reshape(1, ts)
    g2 = p["norm2_scale"].reshape(1, ts)
    be2 = p["norm2_bias"].reshape(1, ts)
    w1 = p["mlp_fc1_kernel"].astype(dt)
    b1 = p["mlp_fc1_bias"].reshape(1, -1)
    w2 = p["mlp_fc2_kernel"].astype(dt)
    b2 = p["mlp_fc2_bias"].reshape(1, ts)
    hidden = w1.shape[1]

    tok_spec = pl.BlockSpec((1, n_pad, ts), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_performer_kernel, m=m, eps_ln=eps_ln,
                          approx=approx_gelu, n_valid=n),
        grid=(b,),
        in_specs=[
            tok_spec, tok_spec, tok_spec,
            const((m, ts)), const((ts, ts)), const((1, ts)),
            const((1, ts)), const((1, ts)),
            const((ts, hidden)), const((1, hidden)),
            const((hidden, ts)), const((1, ts)),
        ],
        out_specs=tok_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_pad, ts), dt),
        interpret=use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * ts * (2 * m + m + m + ts + hidden * 2),
            bytes_accessed=b * n_pad * ts * 4 * dt.itemsize,
            transcendentals=b * n_pad * (2 * m + hidden),
        ),
    )(k, q, v, w.astype(dt), wo, bo, g2, be2, w1, b1, w2, b2)
    return out[:, :n] if n_pad != n else out
