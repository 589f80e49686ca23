"""Finetune / retrain driver — the classifier_training.py + finetune.py
analogue (/root/reference/are_16_heads/classifier_training.py:18-184).

One jit step over the dp/tp mesh replaces torch DDP; epoch/step bounding,
gradient accumulation, periodic eval and LR scaling follow the reference's
protocol (SGD, epoch- or step-bounded via islice, lr*gpus*mbs/512 from
train_main.py:225-227).
"""

from __future__ import annotations

import dataclasses
import itertools
import time
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..parallel.train import cross_entropy, make_train_step, scaled_lr


@dataclasses.dataclass
class FinetuneConfig:
    lr: float = 5e-5
    optimizer: str = "sgd"  # sgd | adamw (reference uses SGD for retrain)
    momentum: float = 0.9
    weight_decay: float = 0.0
    epochs: int = 1
    max_steps: Optional[int] = None      # islice bound (classifier_training.py)
    grad_accum: int = 1
    lr_scale_batch: Optional[int] = None  # if set: lr *= n_dev*mbs/512
    n_devices: int = 1
    log_every: int = 10
    # Mid-training resume (a capability the reference lacks, SURVEY §5.4):
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 100
    # Donate params/opt_state buffers to the step (halves their HBM
    # watermark — XLA updates in place).  Opt-in: donation invalidates the
    # CALLER's params object after the first step, so it is only safe when
    # the caller rebinds (params = finetune(...)) and never reuses the
    # original tree, as the CLI drivers do.
    donate: bool = False


def build_optimizer(cfg: FinetuneConfig) -> optax.GradientTransformation:
    lr = cfg.lr
    if cfg.lr_scale_batch:
        lr = scaled_lr(cfg.lr, cfg.n_devices, cfg.lr_scale_batch)
    if cfg.optimizer == "sgd":
        tx = optax.sgd(lr, momentum=cfg.momentum)
    elif cfg.optimizer == "adamw":
        tx = optax.adamw(lr, weight_decay=cfg.weight_decay)
    else:
        raise ValueError(cfg.optimizer)
    return tx


def finetune(
    apply_fn: Callable,
    params,
    batches: Callable[[], Iterable],  # () -> iterable of (images, labels)
    cfg: FinetuneConfig,
    eval_fn: Optional[Callable] = None,
    log: Callable[[str], None] = print,
):
    """Train and return updated params.

    ``batches()`` is called once per epoch and may yield numpy or jnp pairs.
    """
    optimizer = build_optimizer(cfg)
    step_fn = jax.jit(make_train_step(apply_fn, optimizer, cross_entropy,
                                      cfg.grad_accum),
                      donate_argnums=(0, 1) if cfg.donate else ())
    opt_state = optimizer.init(params)

    step = 0
    if cfg.checkpoint_dir:
        import os

        from .checkpoint import load_checkpoint, load_meta

        latest = os.path.join(cfg.checkpoint_dir, "latest")
        meta = load_meta(latest)
        if meta is not None:
            state = load_checkpoint(latest, {"params": params, "opt_state": opt_state})
            params, opt_state = state["params"], state["opt_state"]
            step = int(meta.get("step", 0))
            log(f"resumed from {latest} at step {step}")
    t0 = time.time()
    for epoch in range(cfg.epochs):
        it = batches()
        if cfg.max_steps is not None:
            it = itertools.islice(it, cfg.max_steps - step)
        for images, labels in it:
            params, opt_state, metrics = step_fn(
                params, opt_state, jnp.asarray(images), jnp.asarray(labels)
            )
            step += 1
            if step % cfg.log_every == 0:
                log(f"epoch {epoch} step {step} loss {float(metrics['loss']):.4f} "
                    f"({step / (time.time() - t0):.2f} it/s)")
            if cfg.checkpoint_dir and step % cfg.checkpoint_every == 0:
                import os

                from .checkpoint import save_checkpoint

                save_checkpoint(
                    os.path.join(cfg.checkpoint_dir, "latest"),
                    {"params": params, "opt_state": opt_state},
                    meta={"step": step},
                )
            if cfg.max_steps is not None and step >= cfg.max_steps:
                break
        if eval_fn is not None:
            log(f"epoch {epoch} eval: {eval_fn(params):.4f}")
        if cfg.max_steps is not None and step >= cfg.max_steps:
            break
    return params
