#!/usr/bin/env python
"""Probe: is int4 weight streaming a win on this v5e chip?

Motivation: the b1 fused paths for DeiT-Base / Swin are weight-DMA-heavy
(CLAUDE.md perf notes); int8 static already ships.  int4 would halve the
weight bytes again — but the v5e MXU has no native s4 mode, so the weights
must be widened to int8 (or bf16) before the matmul, and the widening runs
on the VPU.  Roofline math says the unpack cost (~2 VPU ops/weight over
85M weights for base ≈ 45 us/forward) rivals the DMA saved (~53 us), so
this is measured BEFORE building any kernel.

Three candidate mechanisms, each timed against the shipping int8 dot:
  a) XLA native jnp.int4: if XLA packs s4 2-per-byte in HBM and lowers the
     s4->s8 convert into the matmul's operand pipeline, DMA halves ~free.
  b) Manual nibble-packing in int8 (pairs (j, j+n/2) packed so hi/lo planes
     concat back in natural column order): hi = p >> 4, lo = (p << 4) >> 4,
     3 shifts / 2 weights on the VPU, then the normal int8 dot.
  c) int4-as-int8 control: same dot with values clipped to [-8,7] — isolates
     any value-dependent MXU timing (expect none).

Shapes: the b1 fused-encoder matmul shapes for base (m=208) at qkv/fc1
sizes, plus a batch-32 row.  Interpret the deltas against session jitter
(~5-15%): only a mechanism that beats int8 OUTSIDE jitter on the DMA-bound
shapes justifies a kernel variant.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_int4.py
"""

import json
import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from edgevisiontransformer_tpu.bench.looptimer import measure_op_time  # noqa: E402
from edgevisiontransformer_tpu.cache import enable_compilation_cache  # noqa: E402


def pack_nibbles(w8: np.ndarray) -> np.ndarray:
    """Pack int4-valued int8 [k, n] -> int8 [k, n//2]: byte j holds
    (col j << 4) | (col j + n//2 & 0xF), so unpack's [hi, lo] concat
    restores natural column order (no in-kernel permute)."""
    k, n = w8.shape
    hi = w8[:, : n // 2].astype(np.int32)
    lo = w8[:, n // 2:].astype(np.int32)
    return ((hi << 4) | (lo & 0xF)).astype(np.int8)


def unpack_nibbles(p: jax.Array) -> jax.Array:
    """int8 [k, n//2] packed -> int8 [k, n] via arithmetic shifts."""
    p32 = p.astype(jnp.int32)
    hi = (p32 >> 4).astype(jnp.int8)
    lo = (jnp.left_shift(p32, 28) >> 28).astype(jnp.int8)  # sign-extend low nibble
    return jnp.concatenate([hi, lo], axis=1)


def main():
    enable_compilation_cache()
    rng = np.random.RandomState(0)
    rows = []
    for m, k, n, iters in (
        (208, 768, 3072, 400),      # base fc1 at b1
        (208, 768, 2304, 400),      # base qkv at b1
        (208 * 32, 768, 3072, 60),  # fc1 at b32
    ):
        x8 = jnp.asarray(rng.randint(-127, 128, (m, k)), jnp.int8)
        w_vals = rng.randint(-8, 8, (k, n))          # int4-valued
        w8 = jnp.asarray(rng.randint(-127, 128, (k, n)), jnp.int8)
        w8_4val = jnp.asarray(w_vals, jnp.int8)
        wp = jnp.asarray(pack_nibbles(w_vals.astype(np.int8)), jnp.int8)

        dot = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

        case = {"m": m, "k": k, "n": n,
                "w_bytes_int8_mb": round(k * n / 2**20, 2)}
        case["int8_ms"] = measure_op_time(
            lambda a, b: dot(a, b), (x8, w8), iters=iters, repeats=3,
            chain_arg=0)["p50_ms"]
        case["int8_int4vals_ms"] = measure_op_time(
            lambda a, b: dot(a, b), (x8, w8_4val), iters=iters, repeats=3,
            chain_arg=0)["p50_ms"]
        try:
            # materialize the S4 buffer ON DEVICE (host->device transfer of
            # s4 is not supported by this runtime — observed RecursionError
            # in the transfer path), then time the dot with the s4 ARG so
            # its HBM read is the halved one.
            w4 = jax.jit(lambda b: b.astype(jnp.int4))(w8_4val)
            jax.block_until_ready(w4)
            case["native_s4_ms"] = measure_op_time(
                lambda a, b: dot(a, b.astype(jnp.int8)), (x8, w4),
                iters=iters, repeats=3, chain_arg=0)["p50_ms"]
        except Exception as e:  # noqa: BLE001 — s4 may not lower on TPU
            case["native_s4_error"] = f"{type(e).__name__}: {e}"[:160]
        case["packed_unpack_ms"] = measure_op_time(
            lambda a, b: dot(a, unpack_nibbles(b)), (x8, wp),
            iters=iters, repeats=3, chain_arg=0)["p50_ms"]
        # parity check for the packing round-trip (once, cheap)
        assert bool(jnp.all(unpack_nibbles(wp) == w8_4val)), "unpack mismatch"
        rows.append(case)
        print(json.dumps(case))
    print(json.dumps({"probe_int4": rows}))


if __name__ == "__main__":
    main()
