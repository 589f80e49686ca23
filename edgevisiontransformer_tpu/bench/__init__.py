from .harness import BenchResult, benchmark_fn, benchmark_throughput  # noqa: F401
