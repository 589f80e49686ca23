"""Fused Swin patch-merging kernel on window-major tokens.

The XLA transpose-form merge (models/swin.py fused_swin_apply, reference
Swin lineage downsample: 2x2 space-to-depth + LN + [4C -> 2C] linear) costs
21 us at stage 0 / b1 — CLAUDE.md records 22 us as the measured XLA relayout
floor, i.e. the 2x2-s2d data movement at dim 96 is the cost, not the math.
It also forces a window_reverse before and a window_partition after, because
the s2d needs the [B, res, res, C] image layout.

This kernel keeps the tokens WINDOW-MAJOR end to end: each output token
(y', x') of group g = (dy, dx) sources input token (2y'+dy, 2x'+dx), a fixed
permutation of window-major rows, expressed as one-hot matmuls (the
established exact-in-bf16 trick from swin_block.stage_transition_perm).  The
2x2 subsampling only ever reads input WINDOW-ROW bands {2b, 2b+1} for output
band b — contiguous in window-major order — so the [R_out, R_in] one-hot is
block-banded: [4, nb_out, rb_out, 2*rb_in] (stage 0: 6.4 MB vs 25 MB full).
LN (fp32 stats) + the reduction matmul run in the same VMEM pass, and the
output is window-major for the NEXT stage — both window brackets and the s2d
relayout disappear.

Grid: one program per image (the whole [R_in, C] slab is <=2.7 MB for every
Swin stage); perms/params are VMEM-resident across programs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import use_interpret


def merge_perm_banded(res: int, w: int, n_pad: int) -> np.ndarray:
    """One-hot [4, nb_out, rb_out, 2*rb_in] with, for group g = 2*dy+dx and
    output window-row band b,

        merged[band b, :, g*C:(g+1)*C] =
            P[g, b] @ x_in[2*b*rb_in : (2*b+2)*rb_in]

    where rb_in = (res//w)*n_pad rows per input band.  Output rows are
    window-major at res//2 (pad rows map to zero)."""
    res_o = res // 2
    nwc_i = res // w
    nwc_o = res_o // w
    assert res % w == 0 and res_o % w == 0, (res, w)
    nb_o = nwc_o
    rb_o = nwc_o * n_pad
    rb_i2 = 2 * nwc_i * n_pad

    def row(y, x, nwc):
        return ((y // w) * nwc + x // w) * n_pad + (y % w) * w + x % w

    P = np.zeros((4, nb_o, rb_o, rb_i2), np.float32)
    for dy in range(2):
        for dx in range(2):
            g = 2 * dy + dx
            for yo in range(res_o):
                for xo in range(res_o):
                    yi, xi = 2 * yo + dy, 2 * xo + dx
                    b = yo // w
                    ro = row(yo, xo, nwc_o) - b * rb_o
                    ri = row(yi, xi, nwc_i) - 2 * b * (nwc_i * n_pad)
                    assert 0 <= ri < rb_i2, (yo, xo, ri)
                    P[g, b, ro, ri] = 1.0
    return P


def _merge_kernel(x_ref, perm_ref, g_ref, b_ref, w_ref, o_ref, *,
                  nb_o: int, eps: float):
    dt = o_ref.dtype
    rb_o = perm_ref.shape[2]
    rb_i2 = perm_ref.shape[3]
    rb_in = rb_i2 // 2

    bands = []
    for b in range(nb_o):
        seg = x_ref[2 * b * rb_in:(2 * b + 2) * rb_in]  # [2*rb_in, C]
        groups = [
            jax.lax.dot(perm_ref[g, b], seg,
                        preferred_element_type=jnp.float32).astype(dt)
            for g in range(4)
        ]
        bands.append(jnp.concatenate(groups, axis=-1))  # [rb_o, 4C]
    m = jnp.concatenate(bands, 0) if nb_o > 1 else bands[0]

    xf = m.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    h = h * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    o_ref[:] = jax.lax.dot(h.astype(dt), w_ref[:],
                           preferred_element_type=jnp.float32).astype(dt)


def swin_merge_forward(xw: jax.Array, merge_params: dict, *, res: int,
                       window: int, eps: float,
                       perms: jax.Array | None = None) -> jax.Array:
    """Patch merging on window-major tokens.

    xw: [B*nW, n_pad, C] PADDED window-major tokens at ``res`` (pad-row
    content is ignored — the perms never select pad rows).  merge_params:
    the prepared transpose-form merge dict (models/swin.py prepare_swin_fused
    ``merge_<si>``: (dy, dx, c)-ordered ``norm_scale``/``norm_bias``/
    ``kernel``), whose feature order matches the group-concat here.
    Returns [B*nW_out, n_pad, 2C] padded window-major tokens at res//2.
    Pad rows carry LN(0)*gamma+beta @ W garbage — harmless: window attention
    masks pad COLUMNS via the rel-pos bias and pad-row outputs are sliced off
    after the last stage, exactly as with the zero-padded XLA path.
    """
    bwin, n_pad, c = xw.shape
    nwin = (res // window) ** 2
    assert bwin % nwin == 0, (bwin, nwin)
    bsz = bwin // nwin
    dt = xw.dtype
    res_o = res // 2
    nwin_o = (res_o // window) ** 2
    r_in = nwin * n_pad
    r_out = nwin_o * n_pad

    if perms is None:
        perms = jnp.asarray(merge_perm_banded(res, window, n_pad), dt)
    nb_o = perms.shape[1]

    g = merge_params["norm_scale"].reshape(1, 4 * c)
    b = merge_params["norm_bias"].reshape(1, 4 * c)
    wred = merge_params["kernel"].astype(dt)  # [4C, 2C]

    vres = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_merge_kernel, nb_o=nb_o, eps=eps),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((r_in, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            vres(tuple(perms.shape)), vres((1, 4 * c)), vres((1, 4 * c)),
            vres((4 * c, 2 * c)),
        ],
        out_specs=pl.BlockSpec((r_out, 2 * c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz * r_out, 2 * c), dt),
        interpret=use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * (4 * nb_o * perms.shape[2] * perms.shape[3] * c
                             + r_out * 4 * c * 2 * c),
            bytes_accessed=bsz * (r_in * c + r_out * 2 * c) * dt.itemsize,
            transcendentals=0,
        ),
    )(xw.reshape(bsz * r_in, c), perms, g, b, wred)
    return out.reshape(bsz * nwin_o, n_pad, 2 * c)
