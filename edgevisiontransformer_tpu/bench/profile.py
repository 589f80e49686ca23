"""Per-op profiling -> TFLite-schema CSV.

The reference gets per-op latencies from the TFLite benchmark binary's
``--enable_op_profiling`` CSV (/root/reference/benchmark/run_on_device.py:17,
analyse.py:25-39).  On TPU, XLA fuses ops, so the honest per-op story is the
reference's *other* methodology — micro-benchmark decomposition
(utils.py:322-406 micro models; SURVEY.md §4.4): each pipeline stage of the
model is timed in isolation with the loop-delta timer and emitted as a row.

The CSV reproduces the schema analyse.py consumes: a section headed
"Operator-wise Profiling Info for Regular Benchmark Run", a schema row with
``node type,name,avg_ms,%,start``, then one row per op — so the analyser
(bench/analyse.py, a port of the reference's) reads both our files and
original phone CSVs.
"""

from __future__ import annotations

import csv
from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.activations import get_gelu
from ..ops.attention import merge_heads, qkv_split, sdpa
from ..ops.layers import layer_norm, mlp_block, patch_embed
from .looptimer import measure_op_time


def profile_vit(model, params, x: jax.Array, iters: int = 100, repeats: int = 3):
    """Stage-wise latency decomposition of a ViT forward.

    Returns (rows, total_ms): rows are dicts with node_type/name/avg_ms/start.
    Stage names embed block index + sublayer (attn/ffn) so the
    attention-vs-FFN analyser split works like the reference's
    layer-norm-alternation heuristic (analyse.py:136-190).
    """
    cfg = model.config
    p = params["params"]
    hd = cfg.resolved_head_dim
    b = x.shape[0]

    x0 = x.astype(cfg.dtype)
    act = get_gelu(cfg.gelu_approx)

    rows: List[Dict] = []

    def time_stage(node_type, name, fn, args):
        r = measure_op_time(fn, args, iters=iters, repeats=repeats, chain_arg=0)
        rows.append({
            "node_type": node_type,
            "name": name,
            "avg_ms": r["p50_ms"],
        })

    # embed
    time_stage(
        "PATCH_EMBED", "embed/patch_to_embedding",
        lambda img: patch_embed(img, p["patch_kernel"].astype(cfg.dtype),
                                p["patch_bias"].astype(cfg.dtype), cfg.patch_size),
        (x0,),
    )

    # representative per-layer stages (layer 0 weights; all layers same shape
    # for unpruned models) scaled by depth
    emb = patch_embed(x0, p["patch_kernel"].astype(cfg.dtype),
                      p["patch_bias"].astype(cfg.dtype), cfg.patch_size)
    cls = jnp.broadcast_to(p["cls_token"].astype(cfg.dtype), (b, 1, cfg.dim))
    h0 = jnp.concatenate([cls, emb], axis=1) + p["pos_embedding"].astype(cfg.dtype)

    for i in range(cfg.depth):
        blk = p[f"block_{i}"]
        heads = cfg.layer_heads(i)
        ln1 = lambda t, blk=blk: layer_norm(
            t, blk["ln1"]["scale"], blk["ln1"]["bias"], cfg.layernorm_eps)
        qkv_fn = lambda t, blk=blk: t @ blk["attn"]["qkv_kernel"].astype(cfg.dtype)
        qkv_out = qkv_fn(h0)
        sdpa_fn = lambda qkv, heads=heads: sdpa(*qkv_split(qkv, heads, hd), scale=hd**-0.5)
        ctx = sdpa_fn(qkv_out)
        out_fn = lambda c, blk=blk: merge_heads(c) @ blk["attn"]["out_kernel"].astype(cfg.dtype)
        mlp_fn = lambda t, blk=blk: mlp_block(
            t,
            blk["ffn"]["fc1_kernel"].astype(cfg.dtype),
            blk["ffn"]["fc1_bias"].astype(cfg.dtype),
            blk["ffn"]["fc2_kernel"].astype(cfg.dtype),
            blk["ffn"]["fc2_bias"].astype(cfg.dtype),
            act,
        )
        time_stage("LAYER_NORM", f"block_{i}/attn/layer_norm", ln1, (h0,))
        time_stage("FULLY_CONNECTED", f"block_{i}/attn/qkv", qkv_fn, (h0,))
        time_stage("ATTENTION", f"block_{i}/attn/sdpa", sdpa_fn, (qkv_out,))
        time_stage("FULLY_CONNECTED", f"block_{i}/attn/out_proj", out_fn, (ctx,))
        time_stage("LAYER_NORM", f"block_{i}/ffn/layer_norm", ln1, (h0,))
        time_stage("GELU_MLP", f"block_{i}/ffn/mlp", mlp_fn, (h0,))

    if cfg.final_norm:
        time_stage(
            "LAYER_NORM", "final/layer_norm",
            lambda t: layer_norm(t, p["final_norm"]["scale"], p["final_norm"]["bias"],
                                 cfg.layernorm_eps),
            (h0,),
        )

    # full model for the total
    total = measure_op_time(
        lambda pp, img: model.apply(pp, img), (params, x0),
        iters=iters, repeats=repeats, chain_arg=1,
    )
    total_ms = total["p50_ms"]

    # assign % and synthetic start timestamps
    cum = 0.0
    for r in rows:
        r["percent"] = 100.0 * r["avg_ms"] / total_ms if total_ms else 0.0
        r["start"] = cum
        cum += r["avg_ms"]
    return rows, total_ms


def write_profile_csv(path: str, rows: Sequence[Dict], total_ms: float) -> None:
    """Emit the TFLite op-profiling CSV section analyse.py parses
    (analyse.py:25-39: header line, blank, schema row, data rows)."""
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([f"Total inference avg_ms {total_ms:.4f}"])
        w.writerow(["Operator-wise Profiling Info for Regular Benchmark Run"])
        w.writerow([])
        w.writerow(["node type", "name", "avg_ms", "%", "start"])
        for r in rows:
            w.writerow([
                r["node_type"], r["name"], f"{r['avg_ms']:.6f}",
                f"{r['percent']:.3f}%", f"{r['start']:.6f}",
            ])
        w.writerow([])
