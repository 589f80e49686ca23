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


def gelu_kernel(x: jax.Array, approx: bool) -> jax.Array:
    """GELU usable inside Pallas TPU kernels for both variants."""
    if approx:
        return jax.nn.gelu(x, approximate=True)  # tanh form lowers fine
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + erf_poly(xf * 0.7071067811865476))).astype(x.dtype)
