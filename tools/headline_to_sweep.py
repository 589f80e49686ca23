#!/usr/bin/env python
"""Append bench_headline.json rows (the regression-gate baseline, measured
5x in the cleanest window by tools/bench_gate.py --update) to a sweep jsonl
in the schema tools/make_benchmarks_md.py consumes — so the table's
published numbers and the gate baseline come from the same measurements
instead of drifting apart.

Usage: python tools/headline_to_sweep.py [bench_headline.json] [out.jsonl]
"""
import json
import sys

SUFFIX = {"xla": "", "fused": "_fused", "int8": "_int8",
          "int8_static": "_int8_static"}


def main(src="bench_headline.json", out="bench_sweep_r3.jsonl"):
    rows = json.load(open(src))
    with open(out, "a") as fh:
        for r in rows.values():
            mode = r["kernel_mode"]
            d = {
                "name": r["model"] + SUFFIX[mode],
                "batch": r["batch"],
                "fused": mode != "xla",
                "impl": "int8" if "int8" in mode else mode,
                "ms": round(r["ms"], 5),
                "img_per_s": round(r["batch"] / (r["ms"] / 1e3), 1),
                "std_ms": round(r["std_ms"], 5),
                "repeats": r["repeats"],
                "iters": r["iters"],
            }
            fh.write(json.dumps(d) + "\n")
            print(json.dumps(d))


if __name__ == "__main__":
    main(*sys.argv[1:])
