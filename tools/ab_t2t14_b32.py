"""Interleaved A/B: t2t_vit_14 b32 fused-path encoder vs whole-model XLA.

Round-2 verdict #4 asked that the dispatch never ship a losing kernel.
Cross-session sweep bests straddle: one window measured fused 3.95 vs XLA
4.00 ms (kernel wins), another XLA 3.23 vs fused 3.48 (XLA wins) — t2t b32
jitters ~15% session-to-session on this tunneled chip, so only an
INTERLEAVED same-session A/B (alternating measurements, N rounds) can
decide whether the dim-384 serving-batch gate in fused_t2t_apply
(models/t2t_vit.py dispatch: XLA encoder at bsz>=8 iff dim<=256) should
extend to dim 384.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_t2t14_b32.py
"""
import json

import jax
import jax.numpy as jnp

from edgevisiontransformer_tpu.bench.looptimer import measure_op_time
from edgevisiontransformer_tpu.cache import enable_compilation_cache
from edgevisiontransformer_tpu.models.t2t_vit import (
    T2TViT,
    fused_t2t_apply,
    prepare_t2t_fused,
    t2t_vit_config,
)

ROUNDS = 4

enable_compilation_cache()
model = T2TViT(t2t_vit_config(14, dtype=jnp.bfloat16))
x = jnp.ones((32, 3, 224, 224), jnp.bfloat16)
params = model.init(jax.random.key(0), jnp.ones((1, 3, 224, 224), jnp.bfloat16))
prep = prepare_t2t_fused(model, params)

fused = lambda p, pp, xx: fused_t2t_apply(model, p, xx, pp)
xla = lambda p, pp, xx: model.apply(p, xx)

rows = []
for rnd in range(ROUNDS):
    for name, fn in (("fused", fused), ("xla", xla)):
        r = measure_op_time(fn, (params, prep, x), iters=20, repeats=2,
                            chain_arg=2)
        rows.append({"round": rnd, "impl": name, "p50_ms": r["p50_ms"],
                     "min_ms": r["min_ms"], "std_ms": r["std_ms"]})
        print(json.dumps(rows[-1]), flush=True)

for name in ("fused", "xla"):
    ms = [r["p50_ms"] for r in rows if r["impl"] == name]
    mins = [r["min_ms"] for r in rows if r["impl"] == name]
    print(json.dumps({"impl": name, "p50s": [round(m, 4) for m in ms],
                      "best_p50": round(min(ms), 4),
                      "best_min": round(min(mins), 4)}))
