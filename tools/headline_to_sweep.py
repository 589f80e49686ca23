#!/usr/bin/env python
"""Append bench_headline.json rows (the regression-gate baseline, measured
5x in the cleanest window by tools/bench_gate.py --update) to a sweep jsonl
in the schema tools/make_benchmarks_md.py consumes — so the table's
published numbers and the gate baseline come from the same measurements
instead of drifting apart.

Reuses bench_gate.append_sweep_rows for the actual translation so the two
schemas cannot drift (same reason tools/add_rows.py imports it).

Usage: python tools/headline_to_sweep.py [bench_headline.json] [out.jsonl]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_gate import append_sweep_rows  # noqa: E402


def main(src="bench_headline.json", out="bench_sweep_r3.jsonl"):
    append_sweep_rows(json.load(open(src)), out)


if __name__ == "__main__":
    main(*sys.argv[1:])
