"""On-TPU latency / memory benchmark harness.

TPU-native replacement for the reference's adb + TFLite
``benchmark_model_plus_flex`` loop (/root/reference/benchmark/run_on_device.py:4-30,
README.md:34-65): same protocol (configurable warmup/measure runs, default
num_runs=50 warmup_runs=50 per README.md:45-47), same reported statistics
(avg/std/min/max + init time + memory footprint) — but the timed region is a
jit-compiled XLA executable, and the memory number is live/peak HBM from the
device allocator instead of /proc RSS on a phone.

Timing core: ``looptimer.measure_op_time`` (loop-delta method).  On this
tunneled runtime ``block_until_ready`` acks at *dispatch*, not device
completion, so naive per-dispatch wall timing reports impossible numbers
(measured 2.6 PFLOP/s); the loop-delta method chains K in-jit iterations and
differences against a 1-iteration run so every fixed cost (dispatch, tunnel
round trip, the sync fetch) cancels.  It reproduces the v5e bf16 roofline
within ~4%.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Any, Callable, Optional, Sequence

import jax

from .looptimer import measure_op_time


@dataclasses.dataclass
class BenchResult:
    name: str
    avg_ms: float
    std_ms: float
    min_ms: float
    max_ms: float
    p50_ms: float
    p99_ms: float
    first_ms: float          # first post-compile dispatch+sync wall (incl. ~30 ms tunnel RT)
    init_ms: float           # trace+compile wall time (reference "init" line)
    count: int
    warmup: int
    iters: int = 0           # loop-delta chain length actually used
    peak_hbm_mb: Optional[float] = None
    live_hbm_mb: Optional[float] = None
    throughput_per_s: Optional[float] = None  # items/s if batch provided

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    def summary(self) -> str:
        # Mirrors the reference's printed contract (tools.py:550):
        # "Avg latency X ms, Std Y ms, Mem footprint(MB): Z"
        mem = f"{self.peak_hbm_mb:.2f}" if self.peak_hbm_mb is not None else "n/a"
        return (
            f"{self.name}: Avg latency {self.avg_ms:.3f} ms, Std {self.std_ms:.3f} ms, "
            f"p50 {self.p50_ms:.3f} ms, init {self.init_ms:.1f} ms, "
            f"Mem footprint(MB): {mem}"
        )


def device_mem_mb(device=None) -> tuple[Optional[float], Optional[float]]:
    """(peak_mb, live_mb) from the device allocator, or (None, None) if the
    backend doesn't expose memory_stats (the reference reads peak RSS from the
    TFLite binary's "Peak memory footprint" line, README.md:64-65)."""
    device = device if device is not None else jax.devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        return None, None
    if not stats:
        return None, None
    live = stats.get("bytes_in_use")
    peak = stats.get("peak_bytes_in_use", live)
    to_mb = lambda b: b / (1024 * 1024) if b is not None else None
    return to_mb(peak), to_mb(live)


# Back-compat alias (pre-round-2 private name).
_device_mem_mb = device_mem_mb


def compiled_mem_mb(jitted, args) -> Optional[float]:
    """Static HBM footprint (MB) of the compiled executable: args + outputs +
    XLA temp buffers + program.  The honest "Mem footprint(MB)" source on
    this backend, where ``device.memory_stats()`` returns None; exact for
    static shapes."""
    try:
        m = jitted.lower(*args).compile().memory_analysis()
    except Exception:
        return None
    if m is None:
        return None
    total = (
        m.argument_size_in_bytes
        + m.output_size_in_bytes
        + m.temp_size_in_bytes
        + m.generated_code_size_in_bytes
    )
    return total / (1024 * 1024)


def benchmark_fn(
    fn: Callable,
    args: Sequence[Any],
    *,
    name: str = "fn",
    num_runs: int = 50,
    warmup_runs: int = 2,
    batch_size: Optional[int] = None,
    iters: int = 100,
    chain_arg: int = -1,
) -> BenchResult:
    """Benchmark a jittable function with device-true timing.

    ``num_runs`` = loop-delta repeats (each repeat is one (K,1) measurement
    pair, matching the reference's num_runs samples); ``iters`` is the
    starting chain length, auto-raised until the delta clears the fixed-cost
    jitter.  ``init_ms`` is the jit trace+compile wall time, the analogue of
    TFLite's "init" line (on this runtime the remote compile happens
    synchronously inside the first dispatch, so the wall time captures it).
    """
    jfn = jax.jit(fn)

    t0 = time.perf_counter()
    out = jfn(*args)
    jax.block_until_ready(out)
    init_ms = (time.perf_counter() - t0) * 1e3

    t0 = time.perf_counter()
    out = jfn(*args)
    jax.block_until_ready(out)
    first_ms = (time.perf_counter() - t0) * 1e3

    stats = measure_op_time(
        fn, args, iters=iters, repeats=num_runs, chain_arg=chain_arg,
        warmup=warmup_runs,
    )
    peak_mb, live_mb = device_mem_mb()
    if peak_mb is None:
        peak_mb = compiled_mem_mb(jfn, args)
    avg = stats["avg_ms"]
    return BenchResult(
        name=name,
        avg_ms=avg,
        std_ms=stats["std_ms"],
        min_ms=stats["min_ms"],
        max_ms=stats["max_ms"],
        p50_ms=stats["p50_ms"],
        p99_ms=stats["max_ms"],
        first_ms=first_ms,
        init_ms=init_ms,
        count=num_runs,
        warmup=warmup_runs,
        iters=stats["iters"],
        peak_hbm_mb=peak_mb,
        live_hbm_mb=live_mb,
        throughput_per_s=(batch_size * 1e3 / avg) if batch_size and avg > 0 else None,
    )


def benchmark_throughput(
    fn: Callable,
    args: Sequence[Any],
    *,
    name: str = "fn",
    num_runs: int = 10,
    warmup_runs: int = 2,
    batch_size: int = 1,
    iters: int = 30,
) -> BenchResult:
    """Throughput-oriented variant: same loop-delta core, larger-batch args.

    The in-jit chained loop keeps the device queue saturated (how a serving
    deployment drives TPU), so items/s = batch / per-iteration device time.
    """
    res = benchmark_fn(
        fn, args, name=name, num_runs=num_runs, warmup_runs=warmup_runs,
        batch_size=batch_size, iters=iters,
    )
    return res
