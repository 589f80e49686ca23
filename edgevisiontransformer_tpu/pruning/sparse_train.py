"""Sparse (movement-pruning) training loop pieces.

Replaces the reference's SparseTrainer/HF-Trainer stack
(/root/reference/deit_pruning/vendor/.../sparse_trainer.py:85-128,
deit_pruning/src/trainer.py:48-121) with one jit-compiled step:

  loss = task_ce (+ distillation) + regu_mul * regularization
  grads flow to weights AND mask scores (STE through the binarizers);
  mask scores get their own optimizer/lr (the reference's mask-lr param
  group, patch_coordinator.py:669-704).

The per-step thresholds come from schedule_thresholds() on the host (pure
python, like SparseTrainer.training_step -> schedule_threshold) and are fed
in as a [depth, 2] array so the jitted step never recompiles.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import ViTConfig
from ..parallel.train import cross_entropy
from .movement import SparseConfig, apply_masks, distillation_loss, regularization_loss


@dataclasses.dataclass
class SparseTrainState:
    params: Any
    mask_scores: Any
    opt_state_p: Any
    opt_state_s: Any
    step: int = 0


def init_sparse_state(
    params, mask_scores, opt_params: optax.GradientTransformation,
    opt_scores: optax.GradientTransformation,
) -> SparseTrainState:
    return SparseTrainState(
        params=params,
        mask_scores=mask_scores,
        opt_state_p=opt_params.init(params),
        opt_state_s=opt_scores.init(mask_scores),
        step=0,
    )


def make_sparse_train_step(
    apply_fn: Callable,
    cfg: ViTConfig,
    sparse: SparseConfig,
    opt_params: optax.GradientTransformation,
    opt_scores: optax.GradientTransformation,
    teacher_apply: Optional[Callable] = None,
    with_teacher_params: bool = False,
):
    """Returns jittable step(params, scores, opt_p, opt_s, images, labels,
    thresholds[depth,2], regu_mul[, teacher_params]) ->
    (params, scores, opt_p, opt_s, metrics).

    ``with_teacher_params``: teacher_apply takes (teacher_params, images) and
    the step gains a trailing teacher_params argument — REQUIRED for real
    teacher models: a closure over the teacher tree would embed every weight
    as an HLO constant in the jitted step (the remote compiler rejects
    >~300 MB bodies, see CLAUDE.md).  The closure form (teacher_apply(images))
    remains for small tests.
    """

    def loss_fn(params, scores, images, labels, thresholds, regu_mul, tparams):
        thr_list = [(thresholds[i, 0], thresholds[i, 1]) for i in range(cfg.depth)]
        masked = apply_masks(cfg, params, scores, thr_list, sparse)
        if sparse.qat:
            from ..ops.quant import fake_quant_vit_encoder

            masked = fake_quant_vit_encoder(masked)
        logits = apply_fn(masked, images)
        ce = cross_entropy(logits, labels)
        loss = ce
        if teacher_apply is not None:
            t_logits = teacher_apply(tparams, images) if with_teacher_params \
                else teacher_apply(images)
            t_logits = jax.lax.stop_gradient(t_logits)
            loss = distillation_loss(
                logits, t_logits, ce, sparse.distil_alpha, sparse.distil_temperature
            )
        regu = regularization_loss(scores, sparse, regu_mul)
        return loss + regu, {"ce": ce, "loss": loss, "regu": regu}

    def step(params, scores, opt_p, opt_s, images, labels, thresholds,
             regu_mul, teacher_params=None):
        (_, metrics), (gp, gs) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, scores, images, labels, thresholds, regu_mul, teacher_params)
        up, opt_p = opt_params.update(gp, opt_p, params)
        params = optax.apply_updates(params, up)
        us, opt_s = opt_scores.update(gs, opt_s, scores)
        scores = optax.apply_updates(scores, us)
        return params, scores, opt_p, opt_s, metrics

    return step


def make_sparse_train_step_transitions(
    cfg: ViTConfig,
    sparse: SparseConfig,
    opt_params: optax.GradientTransformation,
    opt_scores: optax.GradientTransformation,
    teacher_apply: Optional[Callable] = None,
    with_teacher_params: bool = False,
):
    """Sparse step with LayerNorm->NoNorm / GeLU->ReLU transitions active
    (preset layer_norm_patch / gelu_patch; pruning/transitions.py).

    step(params, scores, ln_acc, opt_p, opt_s, images, labels,
         thresholds[depth,2], regu_mul, tmix[3]=(mix_ln, delta, mix_gelu))
    -> (params, scores, ln_acc, opt_p, opt_s, metrics).

    The forward is the transition-aware functional ViT (not apply_fn) so the
    accumulators thread through the jit step without module state.
    """
    from .transitions import vit_forward_transitions

    def loss_fn(params, scores, ln_acc, images, labels, thresholds, regu_mul,
                tmix, tparams):
        thr_list = [(thresholds[i, 0], thresholds[i, 1]) for i in range(cfg.depth)]
        masked = apply_masks(cfg, params, scores, thr_list, sparse)
        if sparse.qat:
            from ..ops.quant import fake_quant_vit_encoder

            masked = fake_quant_vit_encoder(masked)
        logits, new_acc = vit_forward_transitions(
            cfg, masked, images, ln_acc, tmix[0], tmix[1], tmix[2],
            ln_patch=sparse.layer_norm_patch, gelu_patch=sparse.gelu_patch,
            train=True,
        )
        new_acc = jax.lax.stop_gradient(new_acc)
        ce = cross_entropy(logits, labels)
        loss = ce
        if teacher_apply is not None:
            t_logits = teacher_apply(tparams, images) if with_teacher_params \
                else teacher_apply(images)
            t_logits = jax.lax.stop_gradient(t_logits)
            loss = distillation_loss(
                logits, t_logits, ce, sparse.distil_alpha, sparse.distil_temperature
            )
        regu = regularization_loss(scores, sparse, regu_mul)
        return loss + regu, ({"ce": ce, "loss": loss, "regu": regu}, new_acc)

    def step(params, scores, ln_acc, opt_p, opt_s, images, labels,
             thresholds, regu_mul, tmix, teacher_params=None):
        (_, (metrics, new_acc)), (gp, gs) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, scores, ln_acc, images, labels, thresholds, regu_mul, tmix,
          teacher_params)
        up, opt_p = opt_params.update(gp, opt_p, params)
        params = optax.apply_updates(params, up)
        us, opt_s = opt_scores.update(gs, opt_s, scores)
        scores = optax.apply_updates(scores, us)
        return params, scores, new_acc, opt_p, opt_s, metrics

    return step
