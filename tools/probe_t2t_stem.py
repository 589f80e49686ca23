#!/usr/bin/env python
"""T2T small-variant stem decomposition (VERDICT r3 directive #5).

t2t_7's encoder is only ~40% of its time — the float tokenizer stem
dominates and has had no int8/fusion attempt beyond stage-1.  This probe
produces the stem-vs-encoder and per-span cost rows at b1 and b32 that
either justify an attack (int8 the big stem matmuls: stage-1 kqv, stage-2
kqv, project) or write the measured wall.

Spans (plain-unfold tokenizer, the b>=8 form; fast stage-1 at b1):
  s1_kqv   unfold(7,4,2) + LN + kqv matmul   [b,3136,147]@[147,192]
  perf1    performer-rest 1 (prm_exp chain + attn_out + MLP) at n=3136
  s2_kqv   reshape + unfold(3,2,1) + LN + kqv [b,784,576]@[576,192]
  perf2    performer-rest 2 at n=784
  project  reshape + unfold(3,2,1) + project  [b,196,2304]@[2304,256]
  stem     whole t2t_tokenize (as dispatched)
  encoder  encoder as dispatched (xla at dim<=256 b>=8) + int8_static
  full     fused_t2t_apply / fused_t2t_apply_int8

Run (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
        python tools/probe_t2t_stem.py [--variant 7] [--rounds 2]
"""
import argparse
import json
import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from edgevisiontransformer_tpu.bench.looptimer import measure_op_time  # noqa: E402
from edgevisiontransformer_tpu.cache import enable_compilation_cache  # noqa: E402
from edgevisiontransformer_tpu.models.t2t_vit import (  # noqa: E402
    T2TViT,
    TokenPerformer,
    _perf_const,
    _performer_rest,
    fast_stage1_kqv,
    fused_t2t_apply,
    fused_t2t_apply_int8,
    get_t2t_vit,
    prepare_t2t_fused,
    prepare_t2t_int8_static,
    prepare_t2t_stem_int8_static,
    t2t_tokenize,
)
from edgevisiontransformer_tpu.ops.quant import int8_matmul_static  # noqa: E402
from edgevisiontransformer_tpu.ops.attention import encoder_forward_xla  # noqa: E402
from edgevisiontransformer_tpu.ops.layers import layer_norm  # noqa: E402
from edgevisiontransformer_tpu.ops.pallas.fused_encoder import (  # noqa: E402
    stack_vit_layer_params,
)
from edgevisiontransformer_tpu.ops.unfold import unfold  # noqa: E402


def spans(model, variables, batch):
    """{name: (fn, args)} — each span chains on its own input."""
    cfg = model.config
    dt = cfg.dtype
    p = variables["params"]
    tok = p["tokens_to_token"]
    consts = variables.get("constants", {})
    tok_c = consts.get("tokens_to_token", {})
    eps = TokenPerformer.layernorm_eps
    ts = tok["performer1"]["mlp_fc1_kernel"].shape[0]

    img = jnp.ones((batch, 3, 224, 224), dt)
    prep = prepare_t2t_fused(model, variables)

    def s1_plain(p1, im):
        x = unfold(im, 7, 4, 2)
        x = layer_norm(x, p1["norm1_scale"], p1["norm1_bias"], eps)
        x = x @ p1["kqv"]["kernel"].astype(dt)
        if "bias" in p1["kqv"]:
            x = x + p1["kqv"]["bias"].astype(dt)
        return x

    def s1_fast(pr, im):
        return fast_stage1_kqv(im, pr["W9"], pr["M9"], pr["c1"], pr["c2"])

    c1 = tok_c.get("performer1") or _perf_const(model, variables, 1)
    c2 = tok_c.get("performer2") or _perf_const(model, variables, 2)

    def perf(pp, cc, xk):
        return _performer_rest(xk, pp, cc, cfg, ts)

    def s2(p2, x):
        b = x.shape[0]
        x = x.reshape(b, 56, 56, ts).transpose(0, 3, 1, 2)
        x = unfold(x, 3, 2, 1)
        x = layer_norm(x, p2["norm1_scale"], p2["norm1_bias"], eps)
        x = x @ p2["kqv"]["kernel"].astype(dt)
        if "bias" in p2["kqv"]:
            x = x + p2["kqv"]["bias"].astype(dt)
        return x

    def s3(pj, x):
        b = x.shape[0]
        x = x.reshape(b, 28, 28, ts).transpose(0, 3, 1, 2)
        x = unfold(x, 3, 2, 1)
        return x @ pj["kernel"].astype(dt) + pj["bias"].astype(dt)

    n1 = 3136
    xk1 = jnp.ones((batch, n1, 3 * ts), dt)
    x1 = jnp.ones((batch, n1, ts), dt)
    xk2 = jnp.ones((batch, 784, 3 * ts), dt)
    x2 = jnp.ones((batch, 784, ts), dt)

    stacked = jax.tree.map(
        lambda a: a.astype(dt),
        stack_vit_layer_params(p, cfg.depth, cfg.qkv_bias))
    sq = prepare_t2t_int8_static(model, variables)
    xe = jnp.ones((batch, 197, cfg.dim), dt)

    def enc_xla(st, x):
        return encoder_forward_xla(
            x, st, heads=cfg.heads, head_dim=cfg.resolved_head_dim,
            eps=cfg.layernorm_eps, reference_residual=cfg.reference_residual,
            approx_gelu=cfg.gelu_approx)

    def enc_int8(q, x):
        from edgevisiontransformer_tpu.models.vit import _int8_encoder_dispatch

        return _int8_encoder_dispatch(x, q, heads=cfg.heads, depth=cfg.depth,
                                      cfg=cfg, batch_block=None,
                                      variant="auto")

    stq = prepare_t2t_stem_int8_static(model, variables, n=8)

    def s1_int8(q1, im):
        p1 = tok["performer1"]
        x = unfold(im, 7, 4, 2)
        x = layer_norm(x, p1["norm1_scale"], p1["norm1_bias"], eps)
        x = int8_matmul_static(x, q1["q"], q1["scale"], q1["act_scale"])
        return x + q1["bias"].astype(dt) if "bias" in q1 else x

    def s2_int8(q2, x):
        b = x.shape[0]
        p2 = tok["performer2"]
        x = x.reshape(b, 56, 56, ts).transpose(0, 3, 1, 2)
        x = unfold(x, 3, 2, 1)
        x = layer_norm(x, p2["norm1_scale"], p2["norm1_bias"], eps)
        x = int8_matmul_static(x, q2["q"], q2["scale"], q2["act_scale"])
        return x + q2["bias"].astype(dt) if "bias" in q2 else x

    def s3_int8(qp, x):
        b = x.shape[0]
        x = x.reshape(b, 28, 28, ts).transpose(0, 3, 1, 2)
        x = unfold(x, 3, 2, 1)
        return (int8_matmul_static(x, qp["q"], qp["scale"], qp["act_scale"])
                + qp["bias"].astype(dt))

    def s1_relayout(im):
        # the fast form's s2d relayout alone (fast_stage1_kqv's first part)
        b = im.shape[0]
        t = im.reshape(b, 3, 56, 4, 56, 4)
        t = jnp.transpose(t, (0, 2, 4, 1, 3, 5)).reshape(b, 56, 56, 48)
        return jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)))

    from edgevisiontransformer_tpu.ops.pallas.t2t_stage1 import (
        stage1_kqv_kernel,
    )

    def s1_kernel(pr, im):
        return stage1_kqv_kernel(im, pr["W9"].astype(dt), pr["M9"],
                                 pr["c1"], pr["c2"], eps=eps)

    out = {
        "s1_kqv_plain": (s1_plain, (tok["performer1"], img)),
        "s1_kqv_fast": (s1_fast, (prep, img)),
        "s1_kqv_kernel": (s1_kernel, (prep, img)),
        "s1_relayout": (s1_relayout, (img,)),
        "s1_kqv_int8": (s1_int8, (stq["kqv1"], img)),
        "perf1": (perf, (tok["performer1"], c1, xk1)),
        "s2_kqv": (s2, (tok["performer2"], x1)),
        "s2_kqv_int8": (s2_int8, (stq["kqv2"], x1)),
        "perf2": (perf, (tok["performer2"], c2, xk2)),
        "project": (s3, (tok["project"], x2)),
        "project_int8": (s3_int8, (stq["project"], x2)),
        # prepared MUST ride as an argument: t2t_tokenize would otherwise
        # call prepare_t2t_fused on traced params (np ops on tracers)
        "stem": (lambda v, pr2, im: t2t_tokenize(model, v, im, prepared=pr2),
                 (variables, prep, img)),
        "stem_int8": (
            lambda v, pr2, st, im: t2t_tokenize(model, v, im, prepared=pr2,
                                                stem_q=st),
            (variables, prep, stq, img)),
        "enc_xla": (enc_xla, (stacked, xe)),
        "enc_int8_static": (enc_int8, (sq, xe)),
        "full_fused": (lambda v, pr, im: fused_t2t_apply(model, v, im, pr),
                       (variables, prep, img)),
        "full_int8_static": (
            lambda v, q, pr, im: fused_t2t_apply_int8(model, v, im, q,
                                                      prepared=pr),
            (variables, sq, prep, img)),
        "full_int8_stem": (
            lambda v, q, pr, st, im: fused_t2t_apply_int8(
                model, v, im, q, prepared=pr, stem_q=st),
            (variables, sq, prep, stq, img)),
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", type=int, default=7)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 32])
    ap.add_argument("--iters-b1", type=int, default=200)
    ap.add_argument("--iters-bN", type=int, default=50)
    args = ap.parse_args()

    enable_compilation_cache()
    model = get_t2t_vit(args.variant, dtype=jnp.bfloat16)
    img = jnp.ones((1, 3, 224, 224), jnp.bfloat16)
    variables = model.init(jax.random.key(0), img)

    for batch in args.batches:
        sp = spans(model, variables, batch)
        iters = args.iters_b1 if batch == 1 else args.iters_bN
        best = {}
        for rnd in range(args.rounds):
            for name, (fn, fargs) in sp.items():
                try:
                    r = measure_op_time(fn, fargs, iters=iters, repeats=3,
                                        chain_arg=-1)
                except Exception as e:  # e.g. a Mosaic lowering rejection
                    print(json.dumps({
                        "probe": f"t2t{args.variant}_stem", "batch": batch,
                        "span": name, "round": rnd,
                        "error": str(e).splitlines()[0][:300]}), flush=True)
                    continue
                best[name] = min(best.get(name, 1e9), r["p50_ms"])
                print(json.dumps({
                    "probe": f"t2t{args.variant}_stem", "batch": batch,
                    "span": name, "round": rnd,
                    "p50_ms": round(r["p50_ms"], 5),
                    "std_ms": round(r["std_ms"], 5),
                    "iters": r["iters"]}), flush=True)
        g = lambda k: best.get(k, float("nan"))
        stem_sum = sum(g(k) for k in
                       ("s1_kqv_plain" if batch >= 8 else "s1_kqv_fast",
                        "perf1", "s2_kqv", "perf2", "project"))
        print(f"b{batch}: stem {g('stem'):.4f} (span-sum {stem_sum:.4f}) "
              f"enc_xla {g('enc_xla'):.4f} "
              f"enc_int8 {g('enc_int8_static'):.4f} | full fused "
              f"{g('full_fused'):.4f} int8 {g('full_int8_static'):.4f} "
              f"int8+stem {g('full_int8_stem'):.4f} | s1 kernel "
              f"{g('s1_kqv_kernel'):.4f} vs fast {g('s1_kqv_fast'):.4f}",
              flush=True)


if __name__ == "__main__":
    main()
