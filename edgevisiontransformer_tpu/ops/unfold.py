"""Sliding-window patch extraction (torch.nn.Unfold / tf.image.extract_patches).

The reference implements torch Unfold on TF via pad + extract_patches
(/root/reference/modeling/models/t2t_vit.py:7-40, "tf_Unfold") and notes that
TF's patch channel ordering (kh, kw, c) differs from torch's (c, kh, kw)
unless a per-channel loop is used ("exact_same_as_torch").

On TPU we express unfold as `lax.conv_general_dilated_patches`, which XLA
lowers to an efficient gather/reshape and which natively produces the torch
ordering (c, kh, kw) — so the "exact" mode is the fast default here rather
than a slow per-channel loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def unfold(
    x: jax.Array,
    kernel_size: int,
    stride: int,
    padding: int,
    channel_order: str = "torch",
) -> jax.Array:
    """Extract sliding patches.

    Args:
      x: NCHW input [b, c, h, w].
      channel_order: "torch" => per-patch features ordered (c, kh, kw)
        (torch.nn.Unfold); "tf" => ordered (kh, kw, c)
        (tf.image.extract_patches, the reference's fast path).

    Returns:
      [b, n_patches, c * k * k] with patches in row-major spatial order.
    """
    b, c, h, w = x.shape
    k, s, p = kernel_size, stride, padding
    patches = lax.conv_general_dilated_patches(
        x,
        filter_shape=(k, k),
        window_strides=(s, s),
        padding=((p, p), (p, p)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # [b, c*k*k, oh, ow], feature axis ordered (c, kh, kw)
    _, ckk, oh, ow = patches.shape
    patches = patches.reshape(b, ckk, oh * ow)
    patches = jnp.transpose(patches, (0, 2, 1))  # [b, n, c*k*k]
    if channel_order == "tf":
        patches = (
            patches.reshape(b, oh * ow, c, k * k)
            .transpose(0, 1, 3, 2)
            .reshape(b, oh * ow, ckk)
        )
    elif channel_order != "torch":
        raise ValueError(f"unknown channel_order {channel_order!r}")
    return patches


def unfold_output_size(size: int, kernel_size: int, stride: int, padding: int) -> int:
    return (size + 2 * padding - kernel_size) // stride + 1
