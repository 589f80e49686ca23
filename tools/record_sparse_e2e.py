#!/usr/bin/env python
"""Record the sparse_e2e run (run.sh sparse_e2e) into the sweep jsonl.

Parses the tee'd outputs of the pipeline stages (train summary, convert,
b1/b128 benchmark, quant_accuracy), appends the two benchmark rows as
normal sweep rows (so the table ranks them) plus ONE {"sparse_e2e": ...}
extras section documenting the whole artifact chain — the reference's
train->compile->eval story (deit_pruning/src/train_main.py:387-421,
eval_main.py:91-104) as a single recorded run.
"""
import json
import sys

sys.path.insert(0, ".")


def last_json(path):
    out = None
    try:
        for line in open(path):
            line = line.strip()
            if line.startswith("{"):
                try:
                    out = json.loads(line)
                except json.JSONDecodeError:
                    pass
    except FileNotFoundError:
        pass
    return out


def main():
    sweep = sys.argv[1] if len(sys.argv) > 1 else "bench_sweep_r4.jsonl"
    train = last_json("/tmp/sparse_e2e_train.out")
    b1 = last_json("/tmp/sparse_e2e_b1.out")
    b128 = last_json("/tmp/sparse_e2e_b128.out")
    qa = last_json("/tmp/sparse_e2e_qa.out")

    rows = []
    for r in (b1, b128):
        if not r:
            continue
        rows.append({
            "name": "sparse_e2e_tiny_int8_static", "batch": r["batch"],
            "fused": True, "impl": "int8",
            "ms": round(r["p50_ms"], 5),
            "img_per_s": round(r["batch"] / (r["p50_ms"] / 1e3), 1),
            "std_ms": round(r["std_ms"], 5), "repeats": r["repeats"],
            "iters": r["iters"],
        })

    section = {
        "method": "run.sh sparse_e2e — preset topk-hybrid-struct-layerwise-"
                  "tiny -> sparse_train (synthetic schedule) -> "
                  "compile_sparse_model (static shrunken shapes) -> convert "
                  "--quantization int8 (artifact embeds the compiled "
                  "config) -> benchmark --quantized-checkpoint b1/b128 on "
                  "TPU -> quant_accuracy --checkpoint (drift vs the "
                  "compiled model's own fp32 logits). The reference's "
                  "train->compile->eval flagship story as one recorded "
                  "run.",
        "train_summary": train,
        "benchmark_rows": rows,
        "quant_accuracy": qa,
    }
    with open(sweep, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write(json.dumps({"sparse_e2e": section}) + "\n")
    print(f"recorded sparse_e2e ({len(rows)} rows) -> {sweep}")


if __name__ == "__main__":
    main()
