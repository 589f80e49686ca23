"""Loop-delta device timing: the only reliable wall-clock method here.

Motivation (measured, see git history): on the tunneled TPU runtime,
``block_until_ready`` acks at dispatch, not device completion — per-call
timings report impossible numbers (2.6 PFLOP/s on a v5e).  A device->host
fetch is the only true sync, but costs ~30 ms of tunnel round-trip.

Method: build ``run(n)`` = jit(fori_loop(n, fn-chained)), returning a scalar
derived from the last output (forces execution; 4-byte fetch).  Measure
wall(run(K)) and wall(run(1)); per-op time = (t_K - t_1) / (K - 1).  Fixed
costs — dispatch, tunnel round trip, the fetch — cancel in the difference.
Chaining feeds a numerically-negligible, data-dependent perturbation of the
previous output back into one input leaf so XLA cannot elide or reorder
iterations.
"""

from __future__ import annotations

import statistics
import time
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _chained_runner(fn: Callable, args: Sequence[Any], chain_arg: int):
    """jit((n, args) -> scalar) executing fn n times with data-dependent
    chaining.  args are REAL jit arguments — closing over them would embed
    every weight as an HLO constant (measured: DeiT-Base inflated the compile
    request to >300 MB and the remote compiler rejected it)."""
    args = tuple(args)

    def body(i, carry):
        cur_args = carry
        out = fn(*cur_args)
        # Full reduction over EVERY output leaf: without it XLA slice-pushes
        # the dependency down to a single element and skips nearly all the
        # work (measured: a 4096^2 matmul "ran" at 5 PFLOP/s with a [:1]
        # tick).  The reduction forces each iteration's complete compute.
        tick = sum(
            jnp.sum(jnp.asarray(leaf).astype(jnp.float32))
            for leaf in jax.tree.leaves(out)
        ) * 1e-38

        leaves, treedef = jax.tree_util.tree_flatten(cur_args[chain_arg])
        leaves = [leaves[0] + tick.astype(leaves[0].dtype)] + leaves[1:]
        new_arg = jax.tree_util.tree_unflatten(treedef, leaves)
        new_args = tuple(
            new_arg if idx == (chain_arg % len(cur_args)) else a
            for idx, a in enumerate(cur_args)
        )
        return new_args

    @jax.jit
    def run(n, cur_args):
        final_args = jax.lax.fori_loop(0, n, body, cur_args)
        out = fn(*final_args)
        return sum(
            jnp.sum(jnp.asarray(leaf).astype(jnp.float32))
            for leaf in jax.tree.leaves(out)
        )

    return lambda n: run(n, args)


def measure_op_time(
    fn: Callable,
    args: Sequence[Any],
    *,
    iters: int = 100,
    repeats: int = 5,
    chain_arg: int = -1,
    warmup: int = 1,
    auto_iters: bool = True,
    min_delta_ms: float = 1.0,
    max_iters: int = 200_000,
) -> dict:
    """Per-op device time via the loop-delta method.

    Returns dict with ms statistics across ``repeats`` measurements.

    ``auto_iters``: the loop delta must clear the fixed-cost jitter (~36 ms
    tunnel round trip on TPU) or the estimate degenerates to 0-clamped noise —
    for sub-µs ops the default 100 iters is orders of magnitude short.  When
    on, iters is scaled until wall(run(K)) - wall(run(1)) >= the larger of
    ``min_delta_ms`` and half the measured fixed cost wall(run(1)) — adaptive,
    so CPU runs (fixed cost ~µs) don't over-scale while tunneled-TPU runs
    (fixed cost ~36 ms) demand a delta that dwarfs the jitter.  The loop bound
    is a dynamic jit argument, so rescaling never recompiles.
    """
    run = _chained_runner(fn, args, chain_arg)

    def timed(n) -> float:
        t0 = time.perf_counter()
        val = run(n)
        np.asarray(val)  # true sync: 4-byte fetch
        return time.perf_counter() - t0

    # Compile + warm both paths (n is a dynamic argument -> one executable).
    for _ in range(warmup):
        timed(1)
        timed(iters)

    if auto_iters:
        for _ in range(16):
            if iters >= max_iters:
                break
            t1 = timed(1)
            delta_ms = (timed(iters) - t1) * 1e3
            floor_ms = max(min_delta_ms, 0.5 * t1 * 1e3)
            if delta_ms >= floor_ms:
                break
            if delta_ms <= 0:
                iters = min(max_iters, iters * 8)
            else:
                # Aim for 2x the floor so one rescale usually suffices.
                need = int(iters * 2.0 * floor_ms / delta_ms)
                iters = min(max_iters, max(iters * 2, need))
            timed(iters)  # warm the new trip count's execution profile

    samples = []
    for _ in range(repeats):
        t1 = timed(1)
        tk = timed(iters)
        samples.append(max(tk - t1, 0.0) / (iters - 1) * 1e3)

    samples.sort()
    return {
        "avg_ms": sum(samples) / len(samples),
        "p50_ms": samples[len(samples) // 2],
        "min_ms": samples[0],
        "max_ms": samples[-1],
        "std_ms": statistics.pstdev(samples) if len(samples) > 1 else 0.0,
        "iters": iters,
        "repeats": repeats,
    }
