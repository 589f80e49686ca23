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
            jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(out)
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
            jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(out)
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
) -> dict:
    """Per-op device time via the loop-delta method.

    Returns dict with ms statistics across ``repeats`` measurements.
    """
    run = _chained_runner(fn, args, chain_arg)

    def timed(n) -> float:
        t0 = time.perf_counter()
        val = run(n)
        np.asarray(val)  # true sync: 4-byte fetch
        return time.perf_counter() - t0

    # Compile both branch counts (jit caches on shape, n is dynamic -> one
    # executable; still warm both paths).
    for _ in range(warmup):
        timed(1)
        timed(iters)

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
