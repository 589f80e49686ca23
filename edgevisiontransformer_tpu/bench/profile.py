"""Per-op profiling -> TFLite-schema CSV.

The reference gets per-op latencies from the TFLite benchmark binary's
``--enable_op_profiling`` CSV (/root/reference/benchmark/run_on_device.py:17,
analyse.py:25-39).  Two modes reproduce that here:

* **micro** (``profile_vit``): micro-benchmark decomposition — each pipeline
  stage of the model is timed in isolation with the loop-delta timer and
  emitted as a row (the reference's other methodology, utils.py:322-406
  micro models; SURVEY.md §4.4).  Honest about XLA fusion: stages, not HLOs.
* **trace** (``profile_trace``): a REAL device trace via ``jax.profiler`` —
  per-HLO-op execution events parsed from the xplane protobuf and aggregated
  per op, the analogue of the native binary's op profiler.  The §4.4 sanity
  oracle applies: per-op sums must reconcile with end-to-end latency.

Both emit the schema analyse.py consumes: a section headed
"Operator-wise Profiling Info for Regular Benchmark Run", a schema row with
``node type,name,avg_ms,%,start``, then one row per op — so the analyser
(bench/analyse.py, a port of the reference's) reads our files and original
phone CSVs alike.
"""

from __future__ import annotations

import collections
import csv
import glob
import os
import tempfile
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
        # FFN decomposed so the activation gets its OWN row — the GELU-share
        # metric then means the same thing as the reference's 8-row POW
        # decomposition (analyse.py:99-129), which isolates the activation
        # from the matmuls
        fc1_fn = lambda t, blk=blk: (
            t @ blk["ffn"]["fc1_kernel"].astype(cfg.dtype)
            + blk["ffn"]["fc1_bias"].astype(cfg.dtype))
        hid0 = fc1_fn(h0)
        gelu_fn = lambda t: act(t)
        fc2_fn = lambda t, blk=blk: (
            t @ blk["ffn"]["fc2_kernel"].astype(cfg.dtype)
            + blk["ffn"]["fc2_bias"].astype(cfg.dtype))

        time_stage("LAYER_NORM", f"block_{i}/attn/layer_norm", ln1, (h0,))
        time_stage("FULLY_CONNECTED", f"block_{i}/attn/qkv", qkv_fn, (h0,))
        time_stage("ATTENTION", f"block_{i}/attn/sdpa", sdpa_fn, (qkv_out,))
        time_stage("FULLY_CONNECTED", f"block_{i}/attn/out_proj", out_fn, (ctx,))
        time_stage("LAYER_NORM", f"block_{i}/ffn/layer_norm", ln1, (h0,))
        time_stage("FULLY_CONNECTED", f"block_{i}/ffn/fc1", fc1_fn, (h0,))
        time_stage("GELU", f"block_{i}/ffn/gelu", gelu_fn, (hid0,))
        time_stage("FULLY_CONNECTED", f"block_{i}/ffn/fc2", fc2_fn, (hid0,))

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


_HLO_NODE_TYPES = (
    ("dot", "FULLY_CONNECTED"),
    ("conv", "CONV_2D"),
    ("custom-call", "PALLAS"),
    ("fusion", "FUSION"),
    ("reduce", "REDUCE"),
    ("transpose", "TRANSPOSE"),
    ("copy", "COPY"),
    ("dynamic", "SLICE"),
    ("all-reduce", "ALL_REDUCE"),
    ("all-gather", "ALL_GATHER"),
)


def _hlo_node_type(hlo_op: str) -> str:
    base = hlo_op.split(".")[0].split("-fusion")[0]
    for prefix, node_type in _HLO_NODE_TYPES:
        if base.startswith(prefix) or ("fusion" in base and prefix == "fusion"):
            return node_type
    return base.upper()


def profile_trace(run_once: Callable[[], None], iters: int = 10,
                  warmup: int = 3, module_hint: str | None = None):
    """REAL device trace via ``jax.profiler``: run ``run_once`` (one blocked
    iteration of the target function) ``iters`` times under a trace, parse
    the xplane protobuf, and aggregate per-HLO-op device execution events.

    The analogue of the reference's ``--enable_op_profiling`` pull
    (/root/reference/benchmark/run_on_device.py:17): true per-op runtime
    events, not micro-bench decomposition.  Returns (rows, total_ms) in the
    profile_vit schema; ``total_ms`` is the per-iteration sum of op events —
    the reference's §4.4 oracle is that this reconciles with the end-to-end
    loop-delta latency.

    ``module_hint``: substring selecting the traced hlo_module (default: the
    module with the largest total event time — drive-by modules like the
    device fetch are excluded that way)."""
    from jax.profiler import ProfileData

    for _ in range(warmup):
        run_once()
    tmpdir = tempfile.mkdtemp(prefix="evt_trace_")
    with jax.profiler.trace(tmpdir):
        for _ in range(iters):
            run_once()

    pbs = glob.glob(os.path.join(tmpdir, "**", "*.xplane.pb"), recursive=True)
    if not pbs:
        raise RuntimeError(f"profiler produced no xplane.pb under {tmpdir}")
    # per (module, op): [total_ns, count, first_start]
    agg: Dict[Tuple[str, str], List[float]] = {}
    module_ns: Dict[str, float] = collections.defaultdict(float)
    for pb in pbs:
        pd = ProfileData.from_file(pb)
        for plane in pd.planes:
            for line in plane.lines:
                for ev in line.events:
                    stats = dict(ev.stats)
                    op = stats.get("hlo_op")
                    mod = stats.get("hlo_module")
                    if not op or not mod or ev.name.startswith("end:"):
                        continue
                    dur = float(ev.duration_ns or 0.0)
                    key = (mod, op)
                    if key in agg:
                        agg[key][0] += dur
                        agg[key][1] += 1
                    else:
                        agg[key] = [dur, 1, float(ev.start_ns or 0.0)]
                    module_ns[mod] += dur
    if not module_ns:
        raise RuntimeError(
            "trace contains no hlo_op events (backend does not expose a "
            "device trace) — use the micro mode instead")
    if module_hint is not None:
        candidates = [m for m in module_ns if module_hint in m]
        if not candidates:
            raise RuntimeError(
                f"no traced module matches {module_hint!r}; got "
                f"{sorted(module_ns)}")
        module = max(candidates, key=module_ns.__getitem__)
    else:
        module = max(module_ns, key=module_ns.__getitem__)

    rows: List[Dict] = []
    for (mod, op), (tot_ns, _cnt, first_start) in agg.items():
        if mod != module:
            continue
        rows.append({
            "node_type": _hlo_node_type(op),
            "name": f"{mod}/{op}",
            "avg_ms": tot_ns / iters / 1e6,
            "start": first_start / 1e6,
        })
    rows.sort(key=lambda r: r["start"])
    t0 = rows[0]["start"] if rows else 0.0
    total_ms = sum(r["avg_ms"] for r in rows)
    for r in rows:
        r["start"] -= t0
        r["percent"] = 100.0 * r["avg_ms"] / total_ms if total_ms else 0.0
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
