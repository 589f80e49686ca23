#!/usr/bin/env python
"""Measure ad-hoc (model, batch, kernel-mode) rows and append them to the
sweep jsonl in the exact schema tools/make_benchmarks_md.py consumes —
the one-off-row analogue of tools/bench_gate.py (shares its translation
helper so the two cannot drift).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/add_rows.py \
      bench_sweep_r3.jsonl deit_tiny:32:int8_static deit_base:32:fused ...

Each spec is model:batch:kernel_mode[:iters[:repeats]].
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from bench_gate import append_sweep_rows, row_key  # noqa: E402


def main():
    args = sys.argv[1:]
    if not args or ":" not in args[-1] and len(args) == 1:
        raise SystemExit(__doc__)
    sweep = args[0] if args[0].endswith(".jsonl") else None
    specs = args[1:] if sweep else args

    from edgevisiontransformer_tpu.cache import enable_compilation_cache
    from edgevisiontransformer_tpu.cli import cmd_benchmark

    enable_compilation_cache()
    rows = {}
    for spec in specs:
        parts = spec.split(":")
        model, batch, mode = parts[0], int(parts[1]), parts[2]
        iters = int(parts[3]) if len(parts) > 3 else (100 if batch == 1 else 30)
        repeats = int(parts[4]) if len(parts) > 4 else 5
        print(f"=== {model} b{batch} {mode}")
        r = cmd_benchmark([
            "--model", model, "--batch", str(batch), "--kernel-mode", mode,
            "--iters", str(iters), "--repeats", str(repeats),
        ])
        # key includes the sample index: repeated specs are interleaved
        # re-measurements and must ALL land in the sweep (the dedup there
        # picks the best quiet row); a bare row_key silently kept only the
        # last sample of a repeated spec
        rows[f"{row_key(model, batch, mode)}#{len(rows)}"] = {
            "model": model, "batch": batch, "kernel_mode": mode,
            "ms": round(r["p50_ms"], 5), "std_ms": round(r["std_ms"], 5),
            "iters": r["iters"], "repeats": r["repeats"],
        }
    if sweep:
        append_sweep_rows(rows, sweep)


if __name__ == "__main__":
    main()
