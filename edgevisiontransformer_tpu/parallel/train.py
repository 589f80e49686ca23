"""Data/tensor-parallel train + eval steps.

Replaces the reference's three DDP flavors (torch DataParallel / DDP /
HF-Trainer DDP, SURVEY.md §2.4) with one jit-compiled step over a
("dp", "tp") mesh: the batch is dp-sharded, params follow the TP rules in
parallel.mesh, and XLA inserts the gradient psum / activation all-reduces.
Gradient accumulation (reference train_main.py:239-240 micro/macro split) is
a lax.scan over microbatches.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import tree_partition_specs


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


def scaled_lr(base_lr: float, n_devices: int, micro_batch: int, denom: int = 512) -> float:
    """Linear LR scaling rule (reference train_main.py:225-227: lr*gpus*mbs/512)."""
    return base_lr * n_devices * micro_batch / denom


def make_train_step(
    apply_fn: Callable,
    optimizer: optax.GradientTransformation,
    loss_fn: Callable = cross_entropy,
    grad_accum: int = 1,
):
    """Build a jittable (params, opt_state, batch) -> (params, opt_state, metrics)."""

    def loss_of(params, images, labels):
        logits = apply_fn(params, images)
        return loss_fn(logits, labels)

    def train_step(params, opt_state, images, labels):
        if grad_accum == 1:
            loss, grads = jax.value_and_grad(loss_of)(params, images, labels)
        else:
            mb_images = images.reshape((grad_accum, -1) + images.shape[1:])
            mb_labels = labels.reshape((grad_accum, -1))

            def micro(carry, mb):
                g_acc, l_acc = carry
                l, g = jax.value_and_grad(loss_of)(params, mb[0], mb[1])
                return (jax.tree.map(jnp.add, g_acc, g), l_acc + l), None

            zero = jax.tree.map(jnp.zeros_like, params)
            (grads, loss), _ = jax.lax.scan(micro, (zero, 0.0), (mb_images, mb_labels))
            grads = jax.tree.map(lambda g: g / grad_accum, grads)
            loss = loss / grad_accum

        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss}

    return train_step


def make_eval_step(apply_fn: Callable):
    """DP eval step: returns (n_correct, n_total); psum is implicit via jit
    sharding propagation (replaces classifier_eval.py:100-106 dist.reduce)."""

    def eval_step(params, images, labels):
        logits = apply_fn(params, images)
        pred = jnp.argmax(logits, axis=-1)
        return jnp.sum(pred == labels), labels.shape[0]

    return eval_step


def jit_sharded_train_step(
    train_step: Callable,
    mesh: Mesh,
    params_example,
):
    """jit the train step with explicit in/out shardings over the mesh."""
    pspecs = tree_partition_specs(params_example)
    to_sharding = lambda spec: NamedSharding(mesh, spec)
    param_shardings = jax.tree.map(to_sharding, pspecs)
    batch_sharding = NamedSharding(mesh, P("dp"))
    # opt_state sharding: match params where leaves mirror param shapes;
    # let XLA decide elsewhere.
    return jax.jit(
        train_step,
        in_shardings=(param_shardings, None, batch_sharding, batch_sharding),
        out_shardings=(param_shardings, None, None),
    )
