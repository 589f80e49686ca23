"""Shared helpers for Pallas TPU kernels."""

from __future__ import annotations

import jax


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def use_interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (tests on the CPU mesh)."""
    return jax.default_backend() != "tpu"
