"""Pipeline (pp) and sequence (sp) parallelism for the uniform-block encoder.

The reference's only distribution scheme is NCCL data parallelism
(SURVEY.md §2.4).  The TPU-native design adds, on top of the ("dp", "tp")
mesh in parallel/mesh.py:

* pp — GPipe-schedule pipeline parallelism over a "pp" mesh axis, written
  with ``shard_map`` + ``lax.ppermute``: the stacked per-layer params are
  sharded on their layer axis (each device holds depth/S consecutive
  blocks), activations for each microbatch hop stage-to-stage over ICI.
  Deterministic compiler-friendly schedule: a single fori-style python loop
  of M + S - 1 ticks, every tick = one block-stack apply + one ppermute —
  no data-dependent control flow, so XLA overlaps the permute with the next
  tick's compute.
* sp — sequence sharding: activations are sharded over the token axis for
  the (per-token) LN/MLP stretches; a sharding constraint flips them to
  head-sharded for attention.  XLA inserts the all-to-alls (this is the
  "How to Scale Your Model" recipe: annotate, let the compiler place
  collectives).

Both run on any mesh (tests use the 8-device virtual CPU mesh), no
NCCL/MPI translation.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
    _SHMAP_NOREP = {"check_vma": False}
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
    _SHMAP_NOREP = {"check_rep": False}


def vit_block_apply(pl: dict, h: jax.Array, *, heads: int, eps: float,
                    approx_gelu: bool, reference_residual: bool) -> jax.Array:
    """One pre-norm encoder block from a per-layer slice of the stacked
    params (ops/pallas/fused_encoder.stack_vit_layer_params layout: vectors
    [1, d], matrices [in, out]).  Mirrors models/vit.EncoderBlock exactly
    (reference modeling/models/vit.py:60-74 pre-norm quirk included)."""
    from ..ops.activations import get_gelu
    from ..ops.layers import layer_norm, mlp_block

    b, n, d = h.shape
    hd = pl["qkv_w"].shape[1] // (3 * heads)

    def attn(x):
        qkv = x @ pl["qkv_w"] + pl["qkv_b"][0]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda t: t.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd ** -0.5)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, heads * hd)
        return o @ pl["out_w"] + pl["out_b"][0]

    def ffn(x):
        return mlp_block(x, pl["fc1_w"], pl["fc1_b"][0], pl["fc2_w"],
                         pl["fc2_b"][0], get_gelu(approx_gelu))

    ln1 = lambda x: layer_norm(x, pl["ln1_g"][0], pl["ln1_b"][0], eps)
    ln2 = lambda x: layer_norm(x, pl["ln2_g"][0], pl["ln2_b"][0], eps)
    if reference_residual:
        hh = ln1(h)
        h = attn(hh) + hh
        hh = ln2(h)
        h = ffn(hh) + hh
    else:
        h = h + attn(ln1(h))
        h = h + ffn(ln2(h))
    return h


def pipeline_encoder_apply(
    stacked: dict,
    x: jax.Array,
    mesh: Mesh,
    *,
    microbatches: int,
    heads: int,
    eps: float = 1e-6,
    approx_gelu: bool = False,
    reference_residual: bool = False,
    axis: str = "pp",
    block_fn: Callable | None = None,
) -> jax.Array:
    """GPipe forward of a depth-L uniform encoder over the mesh's ``axis``.

    stacked: [L, ...] param pytree (stack_vit_layer_params); L must divide
    by the pp size S.  x: [B, n, d] with B divisible by ``microbatches``.
    Returns [B, n, d] (replicated).

    Schedule: M + S - 1 ticks; at tick t stage 0 feeds microbatch t (zeros
    once the real ones run out), every stage applies its L/S blocks, then a
    single collective permute shifts activations one stage down the ring.
    The last stage's outputs are collected into an [M, ...] buffer and
    broadcast back with a psum (cheap at dryrun scale; production serving
    reads logits off the last stage directly).
    """
    if block_fn is None:
        block_fn = functools.partial(
            vit_block_apply, heads=heads, eps=eps, approx_gelu=approx_gelu,
            reference_residual=reference_residual)
    depth = jax.tree.leaves(stacked)[0].shape[0]
    S = mesh.shape[axis]
    M = microbatches
    b, n, d = x.shape
    if depth % S != 0:
        raise ValueError(f"depth {depth} not divisible by pp={S}")
    if b % M != 0:
        raise ValueError(f"batch {b} not divisible by microbatches={M}")
    x_mb = x.reshape(M, b // M, n, d)

    def stage_fn(params_local, xs):
        # params_local: [L/S, ...] (this stage's blocks); xs: [M, mb, n, d]
        idx = jax.lax.axis_index(axis)

        def blocks(h):
            def body(h, pl):
                return block_fn(pl, h), None
            h, _ = jax.lax.scan(body, h, params_local)
            return h

        mb = xs.shape[1]
        recv = jnp.zeros((mb, n, d), xs.dtype)
        outs = jnp.zeros((M, mb, n, d), xs.dtype)
        perm = [(i, (i + 1) % S) for i in range(S)]
        for t in range(M + S - 1):
            feed = xs[t] if t < M else jnp.zeros_like(xs[0])
            inp = jnp.where(idx == 0, feed, recv)
            out = blocks(inp)
            if t >= S - 1:
                outs = outs.at[t - (S - 1)].set(out)
            recv = jax.lax.ppermute(out, axis, perm)
        # only the LAST stage's collected outputs are real; broadcast them
        outs = jnp.where(idx == S - 1, outs, jnp.zeros_like(outs))
        return jax.lax.psum(outs, axis)

    specs_in = (
        jax.tree.map(lambda _: P(axis), stacked),
        P(),
    )
    out = shard_map(
        stage_fn, mesh=mesh, in_specs=specs_in, out_specs=P(),
        **_SHMAP_NOREP,
    )(stacked, x_mb)
    return out.reshape(b, n, d)


def make_pipeline_train_step(
    mesh: Mesh,
    *,
    microbatches: int,
    heads: int,
    eps: float = 1e-6,
    approx_gelu: bool = False,
    reference_residual: bool = False,
    axis: str = "pp",
    learning_rate: float = 1e-3,
):
    """SGD training step THROUGH the GPipe pipeline forward.

    Round-2 review: pp was a forward-only demo (no grads).  The schedule in
    ``pipeline_encoder_apply`` is fully differentiable — ``ppermute``
    transposes to the reversed ring permute, ``psum`` to a broadcast, and
    the zero-feed/`where` selects zero out every garbage tick's
    contribution — so the backward pass IS the reversed pipeline: grads for
    each stage's layer-shard ride the same ICI ring in the opposite
    direction.  No activation-stash machinery is needed at GPipe depth
    (XLA keeps the M+S-1 tick activations live; use jax.checkpoint around
    ``block_fn`` for long pipelines).

    Returns ``step(stacked, head_w, x, labels) -> (stacked', head_w',
    loss)`` jitted over ``mesh`` with the stacked params layer-sharded on
    ``axis`` (same placement the forward uses) and the classifier head
    replicated.  Loss: mean-pooled linear head + softmax cross-entropy, the
    reference finetune objective (are_16_heads/classifier_training loss).
    """

    def loss_fn(stacked, head_w, x, labels):
        h = pipeline_encoder_apply(
            stacked, x, mesh, microbatches=microbatches, heads=heads,
            eps=eps, approx_gelu=approx_gelu,
            reference_residual=reference_residual, axis=axis)
        logits = h.mean(axis=1) @ head_w
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()

    def step(stacked, head_w, x, labels):
        loss, (gs, gh) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            stacked, head_w, x, labels)
        new_stacked = jax.tree.map(lambda p, g: p - learning_rate * g,
                                   stacked, gs)
        return new_stacked, head_w - learning_rate * gh, loss

    stacked_shard = lambda tree: jax.tree.map(
        lambda _: NamedSharding(mesh, P(axis)), tree)
    rep = NamedSharding(mesh, P())
    cache: dict = {}

    def jitted(stacked, head_w, x, labels):
        # build the jitted step ONCE per stacked-tree structure — re-wrapping
        # in jax.jit every call would re-trace the whole GPipe step per
        # training step
        key = jax.tree.structure(stacked)
        if key not in cache:
            cache[key] = jax.jit(
                step,
                in_shardings=(stacked_shard(stacked), rep, rep, rep),
                out_shardings=(stacked_shard(stacked), rep, None),
            )
        return cache[key](stacked, head_w, x, labels)

    return jitted


# ---------------------------------------------------------------------------
# Sequence parallelism: shard the token axis for per-token work, flip to
# head sharding for attention.  Pure annotations — XLA inserts all-to-alls.
# ---------------------------------------------------------------------------


def sequence_sharded_encoder_apply(
    stacked: dict,
    x: jax.Array,
    mesh: Mesh,
    *,
    heads: int,
    eps: float = 1e-6,
    approx_gelu: bool = False,
    reference_residual: bool = False,
    axis: str = "tp",
) -> jax.Array:
    """Encoder forward with sequence-parallel activations: LN/MLP stretches
    constrained to token-sharded [B, n/axis, d], attention to head-sharded.
    ``axis`` defaults to "tp" so the standard ("dp","tp") mesh serves; the
    constraint structure is what matters, XLA chooses the collectives."""
    from ..ops.activations import get_gelu
    from ..ops.layers import layer_norm, mlp_block

    seq = lambda t: jax.lax.with_sharding_constraint(
        t, NamedSharding(mesh, P(None, axis, None)))
    hds = lambda t: jax.lax.with_sharding_constraint(
        t, NamedSharding(mesh, P(None, axis, None, None)))

    depth = jax.tree.leaves(stacked)[0].shape[0]
    b, n, d = x.shape
    gelu = get_gelu(approx_gelu)

    def one(h, pl):
        hd = pl["qkv_w"].shape[1] // (3 * heads)
        h_in = seq(h)
        hh = layer_norm(h_in, pl["ln1_g"][0], pl["ln1_b"][0], eps)
        qkv = seq(hh @ pl["qkv_w"] + pl["qkv_b"][0])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda t: hds(
            t.reshape(b, n, heads, hd).transpose(0, 2, 1, 3))
        qh, kh, vh = split(q), split(k), split(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * (hd ** -0.5)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(h.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, heads * hd)
        att = seq(o @ pl["out_w"] + pl["out_b"][0])
        h = (att + hh) if reference_residual else (h_in + att)
        hh = layer_norm(h, pl["ln2_g"][0], pl["ln2_b"][0], eps)
        f = seq(mlp_block(hh, pl["fc1_w"], pl["fc1_b"][0], pl["fc2_w"],
                          pl["fc2_b"][0], gelu))
        h = (f + hh) if reference_residual else (h + f)
        return seq(h), None

    h, _ = jax.lax.scan(one, x, stacked)
    return h
