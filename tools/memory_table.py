#!/usr/bin/env python
"""Memory-footprint + init-time table for the headline (model, impl, batch)
rows -> appends one {"memory_footprint": {...}} record to the sweep jsonl.

The reference's TFLite harness prints "Init: ... Peak memory footprint
(MB): ..." per benchmarked model (/root/reference/README.md:53-65,
benchmark/bench_utils.py:1-29 parses them).  On this tunneled backend
``device.memory_stats()`` is unavailable, so the honest footprint is the
compiled executable's static HBM budget (args + outputs + XLA temps +
program), exact for static shapes (bench/harness.compiled_mem_mb).

``init_s`` is the trace+compile wall with the persistent compilation cache
enabled — the deployment-analogue of TFLite's interpreter-init line (cold
Pallas compiles are a one-time cost the cache absorbs; Swin whole-model
cold compiles run ~13 min and are NOT what a user redeploying a cached
model pays).

Run: PYTHONPATH=/root/repo:/root/.axon_site \
     python tools/memory_table.py [bench_sweep_r3.jsonl]
"""

import json
import sys
import time
import traceback

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from edgevisiontransformer_tpu.cache import enable_compilation_cache  # noqa: E402

DT = jnp.bfloat16


def measure(fn, args):
    """(footprint breakdown MB, compile wall s) of jit(fn)(*args)."""
    t0 = time.time()
    compiled = jax.jit(fn).lower(*args).compile()
    init_s = time.time() - t0
    m = compiled.memory_analysis()
    mb = 1024 * 1024
    return {
        "args_mb": round(m.argument_size_in_bytes / mb, 2),
        "out_mb": round(m.output_size_in_bytes / mb, 3),
        "temp_mb": round(m.temp_size_in_bytes / mb, 2),
        "code_mb": round(m.generated_code_size_in_bytes / mb, 2),
        "total_mb": round((m.argument_size_in_bytes + m.output_size_in_bytes
                           + m.temp_size_in_bytes
                           + m.generated_code_size_in_bytes) / mb, 2),
        "init_s": round(init_s, 2),
    }


def vit_rows(out):
    from edgevisiontransformer_tpu.models.vit import (
        fused_vit_apply, fused_vit_apply_int8, get_deit_base, get_deit_small,
        get_deit_tiny, prepare_vit_int8_static,
    )

    for name, factory, big_b in (("deit_tiny", get_deit_tiny, 128),
                                 ("deit_small", get_deit_small, 128),
                                 ("deit_base", get_deit_base, 64)):
        m = factory("standard", dtype=DT)
        v = m.init(jax.random.key(0), jnp.ones((1, 3, 224, 224), DT))
        sqs = prepare_vit_int8_static(m, v)
        for b in (1, big_b):
            x = jnp.ones((b, 3, 224, 224), DT)
            out[f"{name}_b{b}_xla"] = measure(
                lambda vv, xx: m.apply(vv, xx), (v, x))
            out[f"{name}_b{b}_fused"] = measure(
                lambda vv, xx: fused_vit_apply(m, vv, xx), (v, x))
            out[f"{name}_b{b}_int8_static"] = measure(
                lambda vv, ss, xx: fused_vit_apply_int8(m, vv, xx, ss),
                (v, sqs, x))


def swin_rows(out):
    from edgevisiontransformer_tpu.models.swin import (
        SwinTransformer, fused_swin_apply, prepare_swin_fused,
        prepare_swin_int8_static, swin_config,
    )

    for size in ("tiny", "small", "base"):
        cfg = swin_config(size, dtype=DT)
        m = SwinTransformer(cfg)
        v = m.init(jax.random.key(0), jnp.ones((1, 3, 224, 224), DT))
        prep = prepare_swin_fused(m, v)
        qs = prepare_swin_int8_static(m, v)
        x = jnp.ones((1, 3, 224, 224), DT)
        out[f"swin_{size}_b1_xla"] = measure(
            lambda vv, xx: m.apply(vv, xx), (v, x))
        out[f"swin_{size}_b1_fused"] = measure(
            lambda vv, pp, xx: fused_swin_apply(m, vv, xx, prepared=pp),
            (v, prep, x))
        out[f"swin_{size}_b1_int8_static"] = measure(
            lambda vv, pp, qq, xx: fused_swin_apply(
                m, vv, xx, prepared=pp, int8_prepared=qq), (v, prep, qs, x))


def t2t_rows(out):
    from edgevisiontransformer_tpu.models.t2t_vit import (
        T2TViT, fused_t2t_apply, prepare_t2t_fused, t2t_vit_config,
    )

    for var in (7, 14):
        cfg = t2t_vit_config(var, dtype=DT)
        m = T2TViT(cfg)
        v = m.init(jax.random.key(0), jnp.ones((1, 3, 224, 224), DT))
        prep = prepare_t2t_fused(m, v)
        x = jnp.ones((1, 3, 224, 224), DT)
        out[f"t2t_vit_{var}_b1_xla"] = measure(
            lambda vv, xx: m.apply(vv, xx), (v, x))
        out[f"t2t_vit_{var}_b1_fused"] = measure(
            lambda vv, pp, xx: fused_t2t_apply(m, vv, xx, pp), (v, prep, x))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_sweep_r3.jsonl"
    enable_compilation_cache()
    out = {}
    for fn in (vit_rows, swin_rows, t2t_rows):
        try:
            fn(out)
        except Exception as e:  # noqa: BLE001 — record, keep other families
            traceback.print_exc()
            out[f"error:{fn.__name__}"] = f"{type(e).__name__}: {e}"
        print(json.dumps({fn.__name__: "done"}))
    with open(out_path, "a") as fh:
        fh.write(json.dumps({"memory_footprint": out}) + "\n")
    print(json.dumps({"memory_footprint": out}, indent=2))


if __name__ == "__main__":
    main()
