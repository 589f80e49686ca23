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


def snap_batch_block(bm: int, b: int) -> int:
    """Largest block in [bm/2, bm] dividing the batch, else ``bm``.

    Padding the batch up to a block multiple wastes REAL compute:
    default_batch_block(256) = 9 at b=32 pads to 36 (+12.5%), measured as
    the entire t2t_vit_7 b32 fused-vs-XLA deficit (round-3).  A slightly
    smaller divisor only costs a few extra grid steps; below bm/2 the lost
    per-program weight-DMA amortization outweighs the padding, so odd
    batches keep ``bm`` and accept the pad."""
    bm = max(1, min(bm, b))
    for cand in range(bm, max(bm // 2, 1) - 1, -1):
        if b % cand == 0:
            return cand
    return bm
