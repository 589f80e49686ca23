"""Taylor-expansion head importance, JAX-native.

Reference semantics (/root/reference/are_16_heads/classifier_eval.py:111-225):
loss = logits.sum(); per layer, per head, per token compute
dot[b,h,t] = <grad(ctx), ctx> over the feature dim of the per-head context
activations, then importance[l,h] = sum_{b,t} |dot|; accumulate over batches;
normalize rows [:-1] by total tokens and row [-1] by #examples (a reference
quirk we reproduce); finally L2-normalize per layer.

Instead of torch hooks retaining ``context_layer_val`` grads (the reference
hacks HF ViT for this), we differentiate w.r.t. a ones-valued mask of shape
[L, B, H, N] multiplied into each layer's context: d loss/d mask[l,b,h,t]
== <grad(ctx), ctx>[b,h,t] exactly, so one jax.grad gives every per-token
dot product without touching model internals.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np

from ..config import ViTConfig
from ..ops.activations import get_gelu
from ..ops.attention import merge_heads, qkv_split, sdpa
from ..ops.layers import layer_norm, mlp_block, patch_embed


def vit_forward_head_mask(
    cfg: ViTConfig, params: dict, img: jax.Array, head_mask: jax.Array
) -> jax.Array:
    """ViT forward with a per-(layer, batch, head, token) context mask.

    head_mask: [depth, B, heads, n_tokens].  Uses the same params as
    models/vit.py (uniform per-layer shapes).
    """
    p = params["params"] if "params" in params else params
    x = patch_embed(img, p["patch_kernel"], p["patch_bias"], cfg.patch_size)
    cls = jnp.broadcast_to(p["cls_token"], (x.shape[0], 1, cfg.dim))
    x = jnp.concatenate([cls, x], axis=1) + p["pos_embedding"]

    act = get_gelu(cfg.gelu_approx)
    hd = cfg.resolved_head_dim
    for i in range(cfg.depth):
        blk = p[f"block_{i}"]
        heads = cfg.layer_heads(i)
        h = layer_norm(x, blk["ln1"]["scale"], blk["ln1"]["bias"], cfg.layernorm_eps)
        qkv = h @ blk["attn"]["qkv_kernel"]
        if cfg.qkv_bias:
            qkv = qkv + blk["attn"]["qkv_bias"]
        q, k, v = qkv_split(qkv, heads, hd)
        ctx = sdpa(q, k, v, scale=hd**-0.5)  # [b, h, n, d]
        # mask rows 0..heads-1 (pruned models have fewer heads than the mask)
        ctx = ctx * head_mask[i][:, :heads, :, None]
        attn_out = merge_heads(ctx) @ blk["attn"]["out_kernel"] + blk["attn"]["out_bias"]
        x = (attn_out + h) if cfg.reference_residual else (x + attn_out)

        h2 = layer_norm(x, blk["ln2"]["scale"], blk["ln2"]["bias"], cfg.layernorm_eps)
        mlp = mlp_block(
            h2,
            blk["ffn"]["fc1_kernel"], blk["ffn"]["fc1_bias"],
            blk["ffn"]["fc2_kernel"], blk["ffn"]["fc2_bias"],
            act,
        )
        x = (mlp + h2) if cfg.reference_residual else (x + mlp)

    if cfg.final_norm:
        x = layer_norm(
            x, p["final_norm"]["scale"], p["final_norm"]["bias"], cfg.layernorm_eps
        )
    x = x[:, 0]
    if cfg.mlp_head:
        h = act(x @ p["head_fc1"]["kernel"] + p["head_fc1"]["bias"])
        return h @ p["head_fc2"]["kernel"] + p["head_fc2"]["bias"]
    return x @ p["head"]["kernel"] + p["head"]["bias"]


def head_importance_batch(
    cfg: ViTConfig, params: dict, images: jax.Array
) -> jax.Array:
    """Unnormalized importance accumulation for one batch: [depth, heads]."""
    b = images.shape[0]
    n = cfg.num_patches + 1
    mask = jnp.ones((cfg.depth, b, cfg.heads, n), jnp.float32)

    def loss_fn(mask):
        logits = vit_forward_head_mask(cfg, params, images, mask)
        return jnp.sum(logits.astype(jnp.float32))

    g = jax.grad(loss_fn)(mask)  # [L, B, H, N] per-token dots
    return jnp.sum(jnp.abs(g), axis=(1, 3))  # sum |dot| over batch + tokens


def calculate_head_importance(
    cfg: ViTConfig,
    params: dict,
    batches,
    normalize_scores_by_layer: bool = True,
    mesh=None,
) -> np.ndarray:
    """Accumulate over an iterable of image batches (reference
    classifier_eval.py:111-225).  With a mesh, batches are dp-sharded and the
    accumulation psum replaces the reference's NCCL all_reduce (:210-215)."""
    seq_len = cfg.num_patches + 1
    step = jax.jit(lambda p, x: head_importance_batch(cfg, p, x))

    if mesh is not None:
        # dp-shard each image batch over the mesh; the batch-sum inside
        # head_importance_batch then compiles to an XLA psum across devices
        # — the reference's NCCL all_reduce of per-rank importance
        # (classifier_eval.py:210-215) as a sharding annotation.
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sharding = NamedSharding(mesh, P("dp"))

        def run(p, images):
            x = jax.device_put(jnp.asarray(images), batch_sharding)
            with mesh:
                return step(p, x)
    else:
        def run(p, images):
            return step(p, jnp.asarray(images))

    importance = np.zeros((cfg.depth, cfg.heads), np.float64)
    tot_tokens = 0
    n_examples = 0
    for images in batches:
        importance += np.asarray(run(params, images), np.float64)
        tot_tokens += seq_len
        n_examples += images.shape[0]

    # Reference normalization quirk: rows [:-1] by token count, row [-1] by
    # example count (classifier_eval.py:217-218).
    importance[:-1] /= max(tot_tokens, 1)
    importance[-1] /= max(n_examples, 1)
    if normalize_scores_by_layer:
        norm = np.sqrt(np.sum(importance**2, axis=-1, keepdims=True))
        importance = importance / (norm + 1e-20)
    return importance
