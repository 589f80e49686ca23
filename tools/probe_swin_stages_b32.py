#!/usr/bin/env python
"""Swin per-stage cost decomposition AT BATCH (VERDICT r3 directive #1b).

The b1 decomposition exists (CLAUDE.md perf notes); this measures the b32
batch path — patch-embed, each whole-stage kernel (bf16 AND static-int8
where prepared), each merge kernel, and the head — so the top cost term of
the batch story can be attacked with evidence.  swin_base has HALF
deit_base's FLOPs yet 2x its batch-normalized time; this table says where.

Every span chains on its own input via the loop-delta timer; spans are
interleaved across rounds in one session.

Run (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site timeout 4000 \
        python tools/probe_swin_stages_b32.py [--size tiny] [--batch 32]
"""
import argparse
import json
import sys

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
    prepare_swin_fused,
    prepare_swin_int8_static,
    relative_position_index,
    shifted_window_mask,
    swin_config,
)
from edgevisiontransformer_tpu.ops.layers import layer_norm, patch_embed  # noqa: E402
from edgevisiontransformer_tpu.ops.pallas.swin_block import (  # noqa: E402
    _padded_bias,
    swin_stage_forward_pipelined,
)
from edgevisiontransformer_tpu.ops.pallas.swin_merge import (  # noqa: E402
    swin_merge_forward,
)


def build_spans(model, variables, prep, q, batch):
    cfg = model.config
    dt = cfg.dtype
    p = variables["params"]
    spans = {}

    img = jnp.ones((batch, 3, cfg.image_size, cfg.image_size), dt)

    def pe(pv, im):
        x = patch_embed(im, pv["patch_kernel"].astype(dt),
                        pv["patch_bias"].astype(dt), cfg.patch_size)
        return layer_norm(x, pv["embed_norm_scale"], pv["embed_norm_bias"],
                          cfg.layernorm_eps)

    spans["patch_embed"] = (pe, (p, img))

    for g in _stage_geometry(cfg, p):
        si = g.si
        rpi = relative_position_index(g.w).reshape(-1)
        biases = []
        for bi in range(g.depth):
            blk = p[f"stage_{si}_block_{bi}"]
            bias, prepadded = _block_bias(blk, prep, si, bi, rpi, g.w,
                                          g.heads)
            biases.append(bias if prepadded else _padded_bias(bias, g.n,
                                                              g.n_pad))
        biases = jnp.stack(biases)
        mask = (jnp.asarray(shifted_window_mask(g.res, g.res, g.w, g.w // 2))
                if g.nwin > 1 and g.depth > 1 else None)
        xw = jnp.ones((batch * g.nwin, g.n_pad, g.dim), dt)

        def stage_fn(st, b_, x_, g=g, mask=mask, use_int8=False):
            return swin_stage_forward_pipelined(
                x_, st, b_, heads=g.heads, head_dim=g.dim // g.heads,
                eps=cfg.layernorm_eps, approx_gelu=cfg.gelu_approx,
                nwin=g.nwin, res=g.res, window=g.w, mask=mask,
                int8=use_int8, n_valid=g.n)

        stacked = _stack_stage_params(p, si, g.depth, g.dim, dt)
        spans[f"stage{si}_bf16"] = (stage_fn, (stacked, biases, xw))
        if q is not None and si in q:
            spans[f"stage{si}_int8"] = (
                lambda st, b_, x_, g=g, mask=mask: swin_stage_forward_pipelined(
                    x_, st, b_, heads=g.heads, head_dim=g.dim // g.heads,
                    eps=cfg.layernorm_eps, approx_gelu=cfg.gelu_approx,
                    nwin=g.nwin, res=g.res, window=g.w, mask=mask,
                    int8=True, n_valid=g.n),
                (q[si], biases, xw))
        if si < len(cfg.depths) - 1:
            spans[f"merge{si}"] = (
                lambda mp_, x_, g=g: swin_merge_forward(
                    x_, mp_, res=g.res, window=g.w, eps=cfg.layernorm_eps),
                (prep[f"merge_{si}"], xw))

    last = list(_stage_geometry(cfg, p))[-1]
    xf = jnp.ones((batch, last.n, last.dim), dt)

    def head(pv, x_):
        x_ = layer_norm(x_, pv["final_norm_scale"], pv["final_norm_bias"],
                        cfg.layernorm_eps)
        x_ = jnp.mean(x_, axis=1)
        return x_ @ pv["head"]["kernel"].astype(dt) + pv["head"][
            "bias"].astype(dt)

    spans["head"] = (head, (p, xf))
    return spans


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="tiny")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--min-dim", type=int, default=0,
                    help="int8 stage gate (0 = all stages, probing)")
    args = ap.parse_args()

    enable_compilation_cache()
    cfg = swin_config(args.size, dtype=jnp.bfloat16)
    model = SwinTransformer(cfg)
    x0 = jnp.ones((1, 3, cfg.image_size, cfg.image_size), cfg.dtype)
    variables = model.init(jax.random.key(0), x0)
    prep = prepare_swin_fused(model, variables)
    q = prepare_swin_int8_static(model, variables, n=4,
                                 min_dim=args.min_dim)
    print(f"int8 stages: {sorted(q)}", flush=True)

    spans = build_spans(model, variables, prep, q, args.batch)
    best = {}
    for rnd in range(args.rounds):
        for name, (fn, fargs) in spans.items():
            r = measure_op_time(fn, fargs, iters=args.iters, repeats=3,
                                chain_arg=-1)
            best[name] = min(best.get(name, 1e9), r["p50_ms"])
            print(json.dumps({
                "probe": f"swin_{args.size}_stages", "batch": args.batch,
                "span": name, "round": rnd, "p50_ms": round(r["p50_ms"], 5),
                "std_ms": round(r["std_ms"], 5), "iters": r["iters"]}),
                flush=True)
    total_bf16 = sum(v for k, v in best.items()
                     if not k.endswith("_int8"))
    print(f"\n== {args.size} b{args.batch} span bests (ms):", flush=True)
    for k, v in best.items():
        print(f"  {k:<14} {v:8.4f}")
    print(f"  span-sum (bf16 path) {total_bf16:.4f}")


if __name__ == "__main__":
    main()
