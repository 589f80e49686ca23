"""Math helpers for Pallas TPU kernels.

Mosaic's TPU lowering lacks erf/erfc (measured: NotImplementedError for both
on this toolchain), so exact GELU inside kernels needs its own erf.  The
round-2 implementation was the Abramowitz & Stegun 7.1.26 rational form
(poly + exp + reciprocal); profiling showed exact GELU cost ~1.06 ms of the
4.58 ms deit_tiny b128 encoder (23%) — exp and the divide dominate.  The
round-3 form composes the hardware tanh with an odd polynomial:

    erf(x) ~= tanh(x * P(x^2)),  x clamped to [-3.625, 3.625]

with P a degree-5 minimax-fitted polynomial (least-squares against scipy
erf over the clamp range; max |err| = 7.2e-7 in fp32, same accuracy class
as A&S at roughly a third of the VPU cost: clamp + square + 5 FMA + mul +
one tanh, no exp, no reciprocal).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# tanh-composed erf: erf(x) ~= tanh(x * P(x*x)) on [-_B, _B], saturates
# outside (erf(3.625) = 1 - 3e-7).  Coefficients: least-squares fit of
# tanh(x*P(x^2)) - erf(x), degree 5 in x^2.
_B = 3.625
_C = (
    1.1283768106947623,
    0.10279185770257758,
    -0.00024362921688681947,
    -0.0005756630517682698,
    7.142110761477812e-05,
    -3.0996621469932794e-06,
)


def erf_poly(x: jax.Array) -> jax.Array:
    """erf via tanh(x * P(x^2)) minimax composition (fp32, |err| <= 7.2e-7)."""
    xf = jnp.clip(x.astype(jnp.float32), -_B, _B)
    u = xf * xf
    p = jnp.float32(_C[-1])
    for c in _C[-2::-1]:
        p = p * u + jnp.float32(c)
    return jnp.tanh(xf * p).astype(x.dtype)


# Tanh-free exact GELU: Phi(x) ~= 0.5 + clip(x)*P(t), t = 2*clip(x)^2/25 - 1,
# P a degree-12 weighted-minimax Chebyshev fit (converted to monomial-in-t
# Horner; |gelu err| <= 1.4e-6 in f32 eval, same accuracy class as the
# tanh-erf form).  17 plain VPU ops vs the tanh form's ~9 + one hardware
# tanh — wins only if tanh costs > ~8 elementwise passes.  MEASURED
# NEGATIVE (tools/probe_vit_gelu.py, tiny b128, 3 interleaved rounds):
# poly 3.760 vs tanh 3.253 fused (+15.6%), 3.693 vs 3.206 int8 (+15.2%)
# — the VPU tanh is only ~1-2 pass-equivalents, so the 13-FMA chain is a
# large net loss (and bounds GELU's true share of the MLP wall well below
# the earlier ~0.35 ms estimate).  The tanh-erf form stays; the poly is
# kept as a fallback for toolchains without a tanh lowering.
_GELU_POLY = False
_PB = 5.0
_PC = (
    0.14136378760433171, -0.07029628057749472, 0.05152052278865894,
    -0.040442608496557085, 0.03144216521916479, -0.023268644876852672,
    0.01640221189220709, -0.011164360769470324, 0.006410424200907841,
    -0.002685549858701659, 0.0017228887800965576, -0.001613275686346649,
    0.0006086931868887893,
)


def gelu_poly(x: jax.Array) -> jax.Array:
    """Exact GELU via the tanh-free Phi polynomial (see _GELU_POLY note)."""
    xf = x.astype(jnp.float32)
    xc = jnp.clip(xf, -_PB, _PB)
    t = xc * xc * jnp.float32(2.0 / (_PB * _PB)) - 1.0
    p = jnp.float32(_PC[-1])
    for c in _PC[-2::-1]:
        p = p * t + jnp.float32(c)
    return (xf * (0.5 + xc * p)).astype(x.dtype)


def gelu_kernel(x: jax.Array, approx: bool) -> jax.Array:
    """GELU usable inside Pallas TPU kernels for both variants."""
    if approx:
        return jax.nn.gelu(x, approximate=True)  # tanh form lowers fine
    if _GELU_POLY:
        return gelu_poly(x)
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + erf_poly(xf * 0.7071067811865476))).astype(x.dtype)
