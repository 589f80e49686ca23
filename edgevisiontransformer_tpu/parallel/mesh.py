"""Device mesh + sharding rules.

The reference's only parallelism is NCCL data parallelism
(SURVEY.md §2.4; /root/reference/are_16_heads/run_classifier.py:110).  The
TPU-native design generalizes it to a 2-D ("dp", "tp") mesh:

* dp — batch sharding; gradient psum rides ICI (replaces every DDP
  all_reduce site).
* tp — megatron-style tensor parallelism over attention heads and the MLP
  hidden dim: qkv/fc1 column-sharded, out/fc2 row-sharded, so each block
  needs a single all-reduce per sublayer, inserted automatically by XLA from
  the sharding annotations.

No NCCL/MPI translation: shardings are declared with NamedSharding /
PartitionSpec and XLA chooses the collectives.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp={dp*tp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


# Param-name-pattern -> PartitionSpec over ("dp", "tp").
# Column-parallel: shard output features; row-parallel: shard input features.
_PARAM_RULES = [
    (r".*attn/qkv_kernel$", P(None, "tp")),
    (r".*attn/qkv_bias$", P("tp")),
    (r".*attn/out_kernel$", P("tp", None)),
    (r".*ffn/fc1_kernel$", P(None, "tp")),
    (r".*ffn/fc1_bias$", P("tp")),
    (r".*ffn/fc2_kernel$", P("tp", None)),
    (r".*kqv/kernel$", P(None, "tp")),
    (r".*kqv/bias$", P("tp")),
    (r".*attn_output/kernel$", P("tp", None)),
]


def param_partition_spec(path: str) -> P:
    for pattern, spec in _PARAM_RULES:
        if re.match(pattern, path):
            return spec
    return P()  # replicated


def tree_partition_specs(params) -> object:
    """PartitionSpec pytree for a model param tree (flax dict)."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(
            getattr(k, "key", getattr(k, "idx", str(k))) if not isinstance(k, str) else k
            for k in [getattr(p, "key", str(p)) for p in kp]
        )

    specs = {}
    for kp, _ in flat:
        specs[jax.tree_util.keystr(kp)] = None

    def map_fn(kp, leaf):
        path = "/".join(str(getattr(p, "key", p)) for p in kp)
        return param_partition_spec(path)

    return jax.tree_util.tree_map_with_path(map_fn, params)


def shard_params(params, mesh: Mesh):
    """Place a param pytree onto the mesh per the TP rules."""
    specs = tree_partition_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_spec() -> P:
    return P("dp")
