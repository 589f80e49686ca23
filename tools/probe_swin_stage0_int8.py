#!/usr/bin/env python
"""A/B: Swin stage-0 whole-stage kernel, bf16 vs STATIC int8.

prepare_swin_int8 keeps `min_dim=128` (stage 0 excluded) on a round-2
measurement taken with DYNAMIC int8, where the per-row activation
absmax/reciprocal at R=3584 rows cost more than the ~150 KB/block weight
saving (models/swin.py:515-520).  Static scales (round 3) removed that
per-row work — the in-kernel quantize is one multiply+round off an SMEM
scale — and the int8 MXU runs 2x bf16, so the old negative no longer
follows.  This probe times the STAGE-0 kernel standalone (banded perm
path, the same program fused_swin_apply would run), bf16 vs static-int8,
interleaved in one session, at b1 and b32.

Run (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site \
        timeout 3000 python tools/probe_swin_stage0_int8.py
"""
import json
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from edgevisiontransformer_tpu.bench.looptimer import measure_op_time  # noqa: E402
from edgevisiontransformer_tpu.cache import enable_compilation_cache  # noqa: E402
from edgevisiontransformer_tpu.models.swin import (  # noqa: E402
    SwinTransformer,
    _block_bias,
    _stack_stage_params,
    _stage_geometry,
    prepare_swin_int8_static,
    relative_position_index,
    shifted_window_mask,
    swin_config,
    window_partition,
)
from edgevisiontransformer_tpu.ops.layers import layer_norm, patch_embed  # noqa: E402
from edgevisiontransformer_tpu.ops.pallas.swin_block import (  # noqa: E402
    _padded_bias,
    swin_stage_forward_pipelined,
)

ROUNDS = 3


def stage0_input(model, params, batch):
    cfg = model.config
    dt = cfg.dtype
    p = params["params"]
    img = jnp.ones((batch, 3, cfg.image_size, cfg.image_size), dt)
    x = patch_embed(img, p["patch_kernel"].astype(dt),
                    p["patch_bias"].astype(dt), cfg.patch_size)
    x = layer_norm(x, p["embed_norm_scale"], p["embed_norm_bias"],
                   cfg.layernorm_eps)
    g = next(iter(_stage_geometry(cfg, p)))
    assert g.si == 0
    pw = window_partition(x.reshape(batch, g.res, g.res, g.dim), g.w)
    xw = jnp.pad(pw, ((0, 0), (0, g.n_pad - g.n), (0, 0)))
    return g, jax.block_until_ready(xw)


def main():
    enable_compilation_cache()
    cfg = swin_config("tiny", dtype=jnp.bfloat16)
    model = SwinTransformer(cfg)
    x0 = jnp.ones((1, 3, cfg.image_size, cfg.image_size), cfg.dtype)
    params = model.init(jax.random.key(0), x0)
    p = params["params"]

    q = prepare_swin_int8_static(model, params, n=4, min_dim=0)
    if 0 not in q:
        raise SystemExit("stage 0 failed the whole-stage fits gate — "
                         "nothing to probe")
    print(f"int8-static stages with min_dim=0: {sorted(q)}", flush=True)

    g, _ = stage0_input(model, params, 1)
    rpi = relative_position_index(g.w).reshape(-1)
    biases = jnp.stack([
        _padded_bias(_block_bias(p[f"stage_0_block_{bi}"], None, 0, bi, rpi,
                                 g.w, g.heads)[0], g.n, g.n_pad)
        for bi in range(g.depth)])
    mask = jnp.asarray(shifted_window_mask(g.res, g.res, g.w, g.w // 2))
    stacked_bf16 = _stack_stage_params(p, 0, g.depth, g.dim, cfg.dtype)

    def run(stacked, use_int8, xw):
        return swin_stage_forward_pipelined(
            xw, stacked, biases, heads=g.heads, head_dim=g.dim // g.heads,
            eps=cfg.layernorm_eps, approx_gelu=cfg.gelu_approx,
            nwin=g.nwin, res=g.res, window=g.w, mask=mask, int8=use_int8,
            n_valid=g.n)

    fn_bf16 = lambda s, xw: run(s, False, xw)
    fn_int8 = lambda s, xw: run(s, True, xw)

    for batch, iters in ((1, 400), (32, 40)):
        _, xw = stage0_input(model, params, batch)
        rows = {"bf16": [], "int8_static": []}
        for rnd in range(ROUNDS):
            for impl, fn, st in (("bf16", fn_bf16, stacked_bf16),
                                 ("int8_static", fn_int8, q[0])):
                t0 = time.time()
                r = measure_op_time(fn, (st, xw), iters=iters, repeats=4,
                                    chain_arg=1)
                rows[impl].append(r["p50_ms"])
                print(json.dumps({
                    "probe": "swin_stage0", "batch": batch, "impl": impl,
                    "round": rnd, "p50_ms": round(r["p50_ms"], 5),
                    "std_ms": round(r["std_ms"], 5),
                    "compile_s": round(time.time() - t0, 1)}), flush=True)
        a = min(rows["bf16"])
        b = min(rows["int8_static"])
        print(f"b{batch}: stage0 bf16 {a:.4f} ms vs int8_static {b:.4f} ms "
              f"-> int8 {'WINS' if b < a else 'loses'} "
              f"({(a - b) / a * 100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
