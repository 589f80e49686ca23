"""Sparse-finetune driver — the deit_pruning/train_main.py analogue.

Wires presets -> SparseConfig -> the jit sparse train step -> compile ->
final finetune, following /root/reference/deit_pruning/src/train_main.py:
104-437: JSON preset resolution (:209-215), lr scaling (:225-227), sparse
training with scheduled thresholds, ``compile_model`` at the end (:388-389),
``unzero_parameters`` + head-only final finetune (:375-377), save + sparsity
report (:392-421).

Preset JSONs use the reference's key names (config/*.json) so existing
configs port over verbatim.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ViTConfig
from .movement import (
    SparseConfig,
    compile_sparse_model,
    init_mask_scores,
    schedule_thresholds,
    sparsity_report,
    unzero_params,
)
from .sparse_train import make_sparse_train_step

PRESET_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def sparse_config_from_preset(
    name_or_path: str,
    warmup_steps: int = 120,
    layerwise_thresholds: Optional[str] = None,
    **overrides,
) -> SparseConfig:
    """Load a reference-format preset JSON into a SparseConfig.

    Accepts a preset name (resolved in edgevisiontransformer_tpu/configs/,
    like train_main.py:52-57 resolves ./config/<name>.json) or a path.
    """
    path = name_or_path
    if not os.path.exists(path):
        path = os.path.join(PRESET_DIR, name_or_path)
        if not path.endswith(".json"):
            path += ".json"
    with open(path) as f:
        d = json.load(f)

    method = d.get("attention_pruning_method", "topK").lower()
    if method == "topk":
        method = "topk"
    dense_method = d.get("dense_pruning_method", "topK:1d_alt")
    dense_pruning = dense_method.split(":")[1] if ":" in dense_method else "blocks"

    kw = dict(
        method=method,
        attn_block_rows=d.get("attention_block_rows", -1),
        attn_block_cols=d.get("attention_block_cols", -1),
        dense_pruning=dense_pruning,
        initial_threshold=d.get("initial_threshold", 1.0),
        final_threshold=d.get("final_threshold", 0.5),
        initial_warmup=d.get("initial_warmup", 1),
        final_warmup=d.get("final_warmup", 2),
        warmup_steps=warmup_steps,
        regularization=d.get("regularization"),
        regu_lambda_attention=d.get("regularization_final_lambda", 0.0),
        regu_lambda_dense=d.get("regularization_final_lambda", 0.0)
        * d.get("dense_lambda", 1.0),
        dense_block_rows=d.get("dense_block_rows", 1),
        dense_block_cols=d.get("dense_block_cols", 1),
        layerwise_thresholds=layerwise_thresholds,
        # transition + QAT knobs (SparseTrainingArguments names preserved)
        layer_norm_patch=bool(d.get("layer_norm_patch", False)),
        layer_norm_patch_steps=d.get("layer_norm_patch_steps", 50000),
        layer_norm_patch_start_delta=d.get("layer_norm_patch_start_delta", 0.99),
        gelu_patch=bool(d.get("gelu_patch", False)),
        gelu_patch_steps=d.get("gelu_patch_steps", 50000),
        qat=bool(d.get("qat", False)),
    )
    kw.update(overrides)
    return SparseConfig(**kw)


@dataclasses.dataclass
class SparseRunResult:
    params: dict
    mask_scores: dict
    compiled_cfg: Optional[ViTConfig] = None
    compiled_params: Optional[dict] = None
    report: Optional[dict] = None
    sparsity: Optional[dict] = None
    ln_acc: Optional[dict] = None  # Layer2NoNorm accumulators (if patched)


def run_sparse_finetune(
    model_apply: Callable,
    cfg: ViTConfig,
    params: dict,
    sparse: SparseConfig,
    batches: Callable[[], Iterable],
    total_steps: int,
    lr: float = 5e-5,
    mask_lr: float = 1e-2,
    teacher_apply: Optional[Callable] = None,
    teacher_params=None,
    do_compile: bool = True,
    final_finetune_steps: int = 0,
    seed: int = 0,
    log: Callable[[str], None] = print,
) -> SparseRunResult:
    """Full sparse run: train masks+weights, then compile to static shapes.

    With ``teacher_params``, teacher_apply is (teacher_params, images) -> logits
    and the teacher tree threads through the jit step as an argument (never
    close a real teacher over the step — HLO-constant bloat, CLAUDE.md).
    """
    scores = init_mask_scores(cfg, sparse, jax.random.key(seed))
    opt_p = optax.adamw(lr)
    opt_s = optax.adam(mask_lr)  # mask-lr group (patch_coordinator.py:669-704)

    transitions = sparse.layer_norm_patch or sparse.gelu_patch
    ln_acc = None
    if transitions:
        from .sparse_train import make_sparse_train_step_transitions
        from .transitions import (
            init_ln_accumulators,
            transition_delta,
            transition_mix,
        )

        ln_acc = init_ln_accumulators(cfg)
        step_fn = jax.jit(make_sparse_train_step_transitions(
            cfg, sparse, opt_p, opt_s, teacher_apply,
            with_teacher_params=teacher_params is not None))
    else:
        step_fn = jax.jit(make_sparse_train_step(
            model_apply, cfg, sparse, opt_p, opt_s, teacher_apply,
            with_teacher_params=teacher_params is not None))

    st_p = opt_p.init(params)
    st_s = opt_s.init(scores)
    step = 0
    while step < total_steps:
        for images, labels in batches():
            thr, regu_mul = schedule_thresholds(step, total_steps, cfg, sparse)
            if transitions:
                tmix = jnp.asarray([
                    transition_mix(step, sparse.layer_norm_patch_steps),
                    transition_delta(step, sparse.layer_norm_patch_steps,
                                     sparse.layer_norm_patch_start_delta),
                    transition_mix(step, sparse.gelu_patch_steps),
                ])
                params, scores, ln_acc, st_p, st_s, metrics = step_fn(
                    params, scores, ln_acc, st_p, st_s,
                    jnp.asarray(images), jnp.asarray(labels),
                    jnp.asarray(thr), jnp.asarray(regu_mul), tmix,
                    teacher_params,
                )
            else:
                params, scores, st_p, st_s, metrics = step_fn(
                    params, scores, st_p, st_s,
                    jnp.asarray(images), jnp.asarray(labels),
                    jnp.asarray(thr), jnp.asarray(regu_mul),
                    teacher_params,
                )
            step += 1
            if step % 10 == 0:
                log(f"step {step}/{total_steps} loss {float(metrics['loss']):.4f} "
                    f"thr_a {thr[0][0]:.3f} thr_d {thr[0][1]:.3f}")
            if step >= total_steps:
                break

    result = SparseRunResult(params=params, mask_scores=scores, ln_acc=ln_acc)
    compile_cfg, compile_params = cfg, params
    if transitions and do_compile:
        # Bake transitions to their endpoints BEFORE the structural shrink:
        # LN params absorb the running stats (NoNorm), act becomes ReLU.
        from .transitions import compile_transitions

        compile_cfg, compile_params = compile_transitions(
            cfg, params, ln_acc,
            ln_patch=sparse.layer_norm_patch, gelu_patch=sparse.gelu_patch,
        )
    if do_compile:
        new_cfg, new_params, report = compile_sparse_model(
            compile_cfg, compile_params, scores, sparse)
        result.compiled_cfg = new_cfg
        result.compiled_params = new_params
        result.report = report
        result.sparsity = sparsity_report(new_params)
        log(f"compiled: heads_per_layer={new_cfg.heads_per_layer} "
            f"mlp_dim_per_layer={new_cfg.mlp_dim_per_layer}")

        if final_finetune_steps > 0:
            # reference final_finetune: re-seed zeros then short head finetune
            from ..models.vit import ViT
            from ..utils.finetune import FinetuneConfig, finetune

            new_params = unzero_params(new_params, jax.random.key(seed + 1))
            model = ViT(new_cfg)
            new_params = finetune(
                model.apply, new_params, batches,
                FinetuneConfig(lr=lr, optimizer="adamw",
                               max_steps=final_finetune_steps, epochs=10**6),
                log=log,
            )
            result.compiled_params = new_params
    return result
