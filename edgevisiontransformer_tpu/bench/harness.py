"""On-TPU latency / memory benchmark harness.

TPU-native replacement for the reference's adb + TFLite
``benchmark_model_plus_flex`` loop (/root/reference/benchmark/run_on_device.py:4-30,
README.md:34-65): same protocol (configurable warmup/measure runs, default
num_runs=50 warmup_runs=50 per README.md:45-47), same reported statistics
(avg/std/min/max + init time + memory footprint) — but the timed region is a
jit-compiled XLA executable driven to completion with ``block_until_ready``,
and the memory number is live/peak HBM from the device allocator instead of
/proc RSS on a phone.
"""

from __future__ import annotations

import dataclasses
import json
import statistics
import time
from typing import Any, Callable, Optional, Sequence

import jax


@dataclasses.dataclass
class BenchResult:
    name: str
    avg_ms: float
    std_ms: float
    min_ms: float
    max_ms: float
    p50_ms: float
    p99_ms: float
    first_ms: float          # first post-compile run (reference "first" line)
    init_ms: float           # compile time (reference "init" line)
    count: int
    warmup: int
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


def _device_mem_mb(device) -> tuple[Optional[float], Optional[float]]:
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


def benchmark_fn(
    fn: Callable,
    args: Sequence[Any],
    *,
    name: str = "fn",
    num_runs: int = 50,
    warmup_runs: int = 50,
    batch_size: Optional[int] = None,
    donate: bool = False,
) -> BenchResult:
    """Benchmark a jittable function.

    Per-run wall times with a full device sync each run (batch-1 latency
    semantics, like the reference's per-inference timing). ``init_ms`` is the
    jit trace+compile wall time, the analogue of TFLite's "init" line.
    """
    jfn = jax.jit(fn, donate_argnums=tuple(range(len(args))) if donate else ())

    t0 = time.perf_counter()
    out = jfn(*args)
    jax.block_until_ready(out)
    init_ms = (time.perf_counter() - t0) * 1e3

    t0 = time.perf_counter()
    out = jfn(*args)
    jax.block_until_ready(out)
    first_ms = (time.perf_counter() - t0) * 1e3

    for _ in range(warmup_runs):
        out = jfn(*args)
    jax.block_until_ready(out)

    times = []
    for _ in range(num_runs):
        t0 = time.perf_counter()
        out = jfn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) * 1e3)

    times_sorted = sorted(times)
    avg = sum(times) / len(times)
    device = jax.devices()[0]
    peak_mb, live_mb = _device_mem_mb(device)
    return BenchResult(
        name=name,
        avg_ms=avg,
        std_ms=statistics.pstdev(times) if len(times) > 1 else 0.0,
        min_ms=times_sorted[0],
        max_ms=times_sorted[-1],
        p50_ms=times_sorted[len(times) // 2],
        p99_ms=times_sorted[min(len(times) - 1, int(len(times) * 0.99))],
        first_ms=first_ms,
        init_ms=init_ms,
        count=num_runs,
        warmup=warmup_runs,
        peak_hbm_mb=peak_mb,
        live_hbm_mb=live_mb,
        throughput_per_s=(batch_size * 1e3 / avg) if batch_size else None,
    )


def benchmark_throughput(
    fn: Callable,
    args: Sequence[Any],
    *,
    name: str = "fn",
    num_runs: int = 30,
    warmup_runs: int = 10,
    batch_size: int = 1,
    iters_per_run: int = 10,
) -> BenchResult:
    """Throughput-oriented variant: pipelined dispatch, sync per chunk.

    Lets the device queue stay full (how a serving deployment drives TPU),
    so the number reflects device throughput rather than host dispatch gaps.
    """
    jfn = jax.jit(fn)

    t0 = time.perf_counter()
    out = jfn(*args)
    jax.block_until_ready(out)
    init_ms = (time.perf_counter() - t0) * 1e3
    first_ms = init_ms

    for _ in range(warmup_runs):
        out = jfn(*args)
    jax.block_until_ready(out)

    times = []
    for _ in range(num_runs):
        t0 = time.perf_counter()
        for _ in range(iters_per_run):
            out = jfn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) * 1e3 / iters_per_run)

    times_sorted = sorted(times)
    avg = sum(times) / len(times)
    peak_mb, live_mb = _device_mem_mb(jax.devices()[0])
    return BenchResult(
        name=name,
        avg_ms=avg,
        std_ms=statistics.pstdev(times) if len(times) > 1 else 0.0,
        min_ms=times_sorted[0],
        max_ms=times_sorted[-1],
        p50_ms=times_sorted[len(times) // 2],
        p99_ms=times_sorted[-1],
        first_ms=first_ms,
        init_ms=init_ms,
        count=num_runs,
        warmup=warmup_runs,
        peak_hbm_mb=peak_mb,
        live_hbm_mb=live_mb,
        throughput_per_s=batch_size * 1e3 / avg,
    )
