"""Activation functions.

The reference uses the tanh-approximate GELU everywhere
(/root/reference/modeling/layers/activation.py:4-15); HF ViT/DeiT weights were
trained with exact-erf GELU. Both are exposed and selected by
``ViTConfig.gelu_approx``.
"""

from __future__ import annotations

import jax


def gelu_tanh(x: jax.Array) -> jax.Array:
    """Tanh-approximated GELU (matches the TF reference numerically)."""
    return jax.nn.gelu(x, approximate=True)


def gelu_exact(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


def get_gelu(approx: bool):
    return gelu_tanh if approx else gelu_exact


def get_act(cfg) -> "callable":
    """Config-selected MLP activation: ReLU for GeLU2ReLU-compiled models
    (vendor gelu2relu.py:40-41 mix=0 endpoint), else the configured GELU."""
    if getattr(cfg, "act", "gelu") == "relu":
        return jax.nn.relu
    return get_gelu(cfg.gelu_approx)
