"""Math helpers for Pallas TPU kernels.

Mosaic's TPU lowering lacks erf/erfc (measured: NotImplementedError for both
on this toolchain), so exact GELU inside kernels uses a polynomial erf
(Abramowitz & Stegun 7.1.26, |err| <= 1.5e-7) built from exp — which does
lower.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_A1 = 0.254829592
_A2 = -0.284496736
_A3 = 1.421413741
_A4 = -1.453152027
_A5 = 1.061405429
_P = 0.3275911


def erf_poly(x: jax.Array) -> jax.Array:
    """erf via A&S 7.1.26 rational approximation (fp32)."""
    xf = x.astype(jnp.float32)
    sign = jnp.sign(xf)
    ax = jnp.abs(xf)
    t = 1.0 / (1.0 + _P * ax)
    poly = t * (_A1 + t * (_A2 + t * (_A3 + t * (_A4 + t * _A5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return (sign * y).astype(x.dtype)


def gelu_kernel(x: jax.Array, approx: bool) -> jax.Array:
    """GELU usable inside Pallas TPU kernels for both variants."""
    if approx:
        return jax.nn.gelu(x, approximate=True)  # tanh form lowers fine
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + erf_poly(xf * 0.7071067811865476))).astype(x.dtype)
