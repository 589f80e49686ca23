"""Shared helpers for Pallas TPU kernels."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Max-free softmax clamp: normalization is deferred past PV in every kernel
# that calls softmax_unnorm, so the row-max subtract is mathematically
# redundant — exp2(min(s, CLAMP)) provides the overflow safety.  60 (not
# 120): 2^60 ≈ 1.2e18, so even a pathological row where every one of
# n_pad≈256 keys hits the clamp keeps r ≈ 3e20 and the f32 PV accumulator
# ≈ 1e22 comfortably below f32 inf (3.4e38) — at 120 those overflowed to
# inf/NaN instead of tying the row.  LN-bounded scores are O(±30), so the
# two clamps behave identically on every realistic input.
SOFTMAX_CLAMP = 60.0


def softmax_unnorm(s, dtype, *, nomax: bool = True, clamp: float = SOFTMAX_CLAMP):
    """Unnormalized softmax probabilities + row sums, shared by the ViT
    fused-encoder and both Swin kernel families so numerics fixes cannot
    diverge between copies.

    Returns ``(p, r)`` with ``p`` the unnormalized exp2 scores (f32) and
    ``r`` the row sums; callers divide AFTER the PV matmul (deferred
    normalization — the measured VPU-wall optimization).  The max-free fast
    path (measured +4-9%/stage in Swin, -2..-9% on ViT rows) is used for
    bf16/f32; float16 falls back to the row-max subtract because
    ``p.astype(f16)`` would overflow (f16 max 65504 < 2^CLAMP).  Masked
    keys at -1e30 underflow to 0 either way; the 1e-30 floor on r covers
    the all-masked corner (r=0 → div-by-0)."""
    if nomax and dtype != jnp.float16:
        p = jnp.exp2(jnp.minimum(s, clamp))
        r = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    else:
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        r = jnp.sum(p, axis=-1, keepdims=True)
    return p, r


def use_interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (tests on the CPU mesh)."""
    return jax.default_backend() != "tpu"


def default_batch_block(dim: int) -> int:
    """VMEM-scaled images-per-program for the fused ViT encoders (round-2
    b128 sweep: tiny bm=16 28.1k img/s, bm=32 fails to compile; small bm=4
    13.1k vs bm=8 11.0k; base bm=1)."""
    return max(1, (16 * 192 * 192) // (dim * dim))


def check_block_shape(block_shape, array_shape, where: str = "") -> None:
    """Enforce the Mosaic TPU block rule off-TPU: the last two dims of a
    block must be divisible by (8, 128) respectively OR equal the full array
    dims.  Interpret-mode kernels skip Mosaic entirely, so a violating spec
    passes every CPU test and then fails to compile on the chip (hit once:
    a (1, 4) SMEM block over a [12, 4] scale array).  Conservative: only
    int-valued block dims on >=2-D operands are checked."""
    if block_shape is None or array_shape is None:
        return
    if len(array_shape) < 2 or len(block_shape) != len(array_shape):
        return
    for axis, div in ((-1, 128), (-2, 8)):
        b, a = block_shape[axis], array_shape[axis]
        if not isinstance(b, int) or not isinstance(a, int):
            continue
        if b == a or b % div == 0:
            continue
        raise ValueError(
            f"Mosaic block rule violation{' in ' + where if where else ''}: "
            f"block {tuple(block_shape)} over array {tuple(array_shape)} — "
            f"dim {axis} block size {b} is neither divisible by {div} nor "
            f"equal to the array dim {a}; this compiles in interpret mode "
            f"but fails Mosaic lowering on TPU")


def install_block_spec_validator() -> None:
    """Wrap pl.pallas_call so every invocation validates its in/out
    BlockSpecs against check_block_shape at call time.  Installed by the
    test suite (tests/conftest.py) — the CPU-mesh equivalent of a TPU
    compile check for the block-shape rules."""
    from jax.experimental import pallas as pl_mod

    orig = pl_mod.pallas_call
    if getattr(orig, "_evt_validating", False):
        return

    def validating_pallas_call(kernel, *args, **kwargs):
        inner = orig(kernel, *args, **kwargs)
        in_specs = kwargs.get("in_specs")
        out_specs = kwargs.get("out_specs")
        out_shape = kwargs.get("out_shape")
        name = getattr(kernel, "func", kernel)
        where = getattr(name, "__name__", str(name))

        def wrapped(*operands):
            if in_specs is not None and len(in_specs) == len(operands):
                for i, (spec, op) in enumerate(zip(in_specs, operands)):
                    if spec is not None:
                        check_block_shape(
                            getattr(spec, "block_shape", None),
                            getattr(op, "shape", None),
                            f"{where} args[{i}]")
            specs = (out_specs if isinstance(out_specs, (list, tuple))
                     else [out_specs])
            shapes = (out_shape if isinstance(out_shape, (list, tuple))
                      else [out_shape])
            if len(specs) == len(shapes):
                for i, (spec, sh) in enumerate(zip(specs, shapes)):
                    if spec is not None and sh is not None:
                        check_block_shape(
                            getattr(spec, "block_shape", None),
                            getattr(sh, "shape", None),
                            f"{where} outs[{i}]")
            return inner(*operands)

        return wrapped

    validating_pallas_call._evt_validating = True
    pl_mod.pallas_call = validating_pallas_call


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
