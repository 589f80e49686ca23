"""Shared helpers for Pallas TPU kernels."""

from __future__ import annotations

import jax


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def use_interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (tests on the CPU mesh)."""
    return jax.default_backend() != "tpu"


def default_batch_block(dim: int) -> int:
    """VMEM-scaled images-per-program for the fused ViT encoders (round-2
    b128 sweep: tiny bm=16 28.1k img/s, bm=32 fails to compile; small bm=4
    13.1k vs bm=8 11.0k; base bm=1)."""
    return max(1, (16 * 192 * 192) // (dim * dim))
