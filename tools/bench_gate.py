#!/usr/bin/env python
"""Benchmark regression gate (round-2 verdict #9).

Re-measures the ~10 headline rows and fails loudly if any drifts more than
``--tolerance`` (default 10%) from the checked-in baseline
``bench_headline.json``.  Protects the published BENCHMARKS.md numbers from
silently regressing — and from being silently "improved" by TPU-contention
skew, which burned rounds 1-2 twice (CLAUDE.md perf notes: concurrent
sessions skew b1 rows 1.3-1.5x).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_gate.py
    ... --update        # re-baseline from this run (records std/iters too)
    ... --tolerance 0.15

Every row records p50/std/iters so the baseline itself documents its
measurement discipline (verdict weak #8).  Exit code 1 on any failure.
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, ".")

# The shipping-best (model, batch, kernel_mode) per family — keep in sync
# with the headline rows in BENCHMARKS.md / README.md.
HEADLINE = [
    ("deit_tiny", 1, "int8_static"),
    ("deit_tiny", 128, "int8_static"),
    ("deit_small", 1, "int8_static"),
    ("deit_base", 1, "int8_static"),
    ("deit_base", 64, "int8_static"),
    ("swin_tiny", 1, "int8_static"),
    ("swin_tiny", 32, "fused"),
    ("t2t_vit_14", 1, "fused"),
    ("t2t_vit_14", 32, "fused"),
    ("pruned_deit_tiny@all_head1_ffn0.3", 128, "fused"),
]

BASELINE_PATH = pathlib.Path(__file__).resolve().parent.parent / "bench_headline.json"


def row_key(model: str, batch: int, mode: str) -> str:
    return f"{model}|b{batch}|{mode}"


def measure_rows():
    from edgevisiontransformer_tpu.cache import enable_compilation_cache
    from edgevisiontransformer_tpu.cli import cmd_benchmark

    enable_compilation_cache()
    rows = {}
    for model, batch, mode in HEADLINE:
        print(f"=== {model} b{batch} {mode}")
        r = cmd_benchmark([
            "--model", model, "--batch", str(batch), "--kernel-mode", mode,
            "--iters", "100", "--repeats", "5",
        ])
        rows[row_key(model, batch, mode)] = {
            "model": model, "batch": batch, "kernel_mode": mode,
            "ms": round(r["p50_ms"], 5), "std_ms": round(r["std_ms"], 5),
            "iters": r["iters"], "repeats": r["repeats"],
        }
    return rows


SWEEP_SUFFIX = {"xla": "", "fused": "_fused", "int8": "_int8",
                "int8_static": "_int8_static"}


def append_sweep_rows(rows: dict, sweep_path: str) -> None:
    """Feed this gate run's measurements into the sweep jsonl (the same
    translation tools/headline_to_sweep.py does for the baseline file), so
    every 5-repeat gate run also improves/confirms the published table."""
    with open(sweep_path, "a") as fh:
        for r in rows.values():
            mode = r["kernel_mode"]
            fh.write(json.dumps({
                "name": r["model"] + SWEEP_SUFFIX[mode],
                "batch": r["batch"],
                "fused": mode != "xla",
                "impl": "int8" if "int8" in mode else mode,
                "ms": r["ms"],
                "img_per_s": round(r["batch"] / (r["ms"] / 1e3), 1),
                "std_ms": r["std_ms"], "repeats": r["repeats"],
                "iters": r["iters"]}) + "\n")
    print(f"appended {len(rows)} rows to {sweep_path}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tolerance", type=float, default=0.10,
                   help="max fractional drift of p50 vs baseline")
    p.add_argument("--update", action="store_true",
                   help="write this run as the new baseline")
    p.add_argument("--sweep-out", default=None, metavar="JSONL",
                   help="also append this run's rows to a sweep jsonl")
    args = p.parse_args(argv)

    rows = measure_rows()
    if args.sweep_out:
        append_sweep_rows(rows, args.sweep_out)
    if args.update or not BASELINE_PATH.exists():
        BASELINE_PATH.write_text(json.dumps(rows, indent=1) + "\n")
        print(f"baseline written: {BASELINE_PATH} ({len(rows)} rows)")
        return 0

    baseline = json.loads(BASELINE_PATH.read_text())
    failures = []
    for key, row in rows.items():
        base = baseline.get(key)
        if base is None:
            failures.append(f"{key}: no baseline row (run --update)")
            continue
        drift = row["ms"] / base["ms"] - 1.0
        # Asymmetric: slower than tolerance = regression = FAIL; faster
        # than tolerance is not a regression — on this tunneled chip b1
        # rows land 10-30% under the baseline in a lucky quiet window
        # (e.g. deit_tiny b1 int8_static 0.0435 vs baseline 0.0493 at
        # 5x960 quiet) — surface it as a re-baseline hint instead.
        if drift > args.tolerance:
            status = "FAIL"
        elif drift < -args.tolerance:
            status = "fast"
        else:
            status = "ok"
        print(f"{status:4s} {key}: {row['ms']:.4f} ms vs baseline "
              f"{base['ms']:.4f} ({drift:+.1%}, std {row['std_ms']:.4f}, "
              f"iters {row['iters']})")
        if status == "FAIL":
            failures.append(
                f"{key}: {row['ms']:.4f} ms drifted {drift:+.1%} from "
                f"{base['ms']:.4f} (tolerance +{args.tolerance:.0%})")
        elif status == "fast":
            print(f"     ^ faster than baseline by more than "
                  f"{args.tolerance:.0%} — if this repeats, re-baseline "
                  f"with --update")
    for key in baseline:
        if key not in rows:
            failures.append(f"{key}: baseline row no longer measured "
                            f"(update HEADLINE or --update)")
    if failures:
        print("\nbench_gate FAILED:")
        for f in failures:
            print(f"  - {f}")
        return 1
    print(f"\nbench_gate OK: {len(rows)} rows within ±{args.tolerance:.0%}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
