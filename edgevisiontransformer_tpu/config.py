"""Model / run configuration dataclasses.

One typed config system replaces the reference's four overlapping mechanisms
(argparse dispatch, JSON presets, string DSLs, DeepSpeed JSON — see
/root/reference/tools.py:1011-1086, deit_pruning/src/train_main.py:209-215).
The two string DSLs the reference's assets use are still accepted as *input
formats* and parsed into these dataclasses:

  * prune encodings ``"all_head2_ffn0.7"`` / ``"layerwise_h2-d1.0_..."``
    (reference modeling/models/vit.py:77-97) -> :func:`decode_prune_encoding`
  * layerwise thresholds ``"h_0.5_d_0.3-..."``
    (reference patch_coordinator.py:396-406) -> parsed in pruning.movement
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp


@dataclass(frozen=True)
class ViTConfig:
    """Configuration for ViT/DeiT-family encoders.

    Two fidelity targets exist (SURVEY.md §2.1 #7):

    * ``variant="reference"`` reproduces the TF reference semantics
      (/root/reference/modeling/models/vit.py:11-55): pre-norm blocks where the
      skip path *also* passes through LayerNorm (``fn(LN(x)) + LN(x)``,
      norm.py:10-12 + residual.py:9), a 2-layer GELU MLP classifier head
      (vit.py:38-39), tanh-approx GELU (activation.py:13-15), fused QKV with
      no bias (attention.py:17), eps=1e-5, and **no** final LayerNorm.
    * ``variant="standard"`` is the real DeiT/HF form for weight parity:
      ``x + fn(LN(x))``, single Linear head, final LayerNorm, qkv bias,
      exact GELU.
    """

    image_size: int = 224
    patch_size: int = 16
    num_classes: int = 1000
    dim: int = 768
    depth: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    head_dim: Optional[int] = None  # default: dim // heads
    in_channels: int = 3

    # Per-layer pruned shapes (static!). None => uniform (heads, mlp_dim).
    heads_per_layer: Optional[Tuple[int, ...]] = None
    mlp_dim_per_layer: Optional[Tuple[int, ...]] = None

    # Fidelity switches.
    reference_residual: bool = False  # True => fn(LN(x)) + LN(x) quirk
    mlp_head: bool = False            # True => Dense(mlp_dim, gelu) + Dense(C)
    final_norm: bool = True           # standard DeiT has a final LN
    qkv_bias: bool = True
    gelu_approx: bool = False         # True => tanh approximation
    layernorm_eps: float = 1e-6

    # Compute/param dtypes.
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    # Dropout (reference T2T performer uses 0.1; DeiT finetunes use 0).
    dropout_rate: float = 0.0

    # Kernel selection: "xla" = plain jnp (reference impl), "pallas" = fused.
    kernel_mode: str = "xla"

    # Per-block gradient rematerialization (jax.checkpoint): training-side
    # memory knob the reference lacks (its GPU stacks lean on DeepSpeed for
    # memory; the TPU analogue is remat — trade one extra forward per block
    # for not materializing block internals across the backward).
    remat: bool = False

    # Compiled-transition modes (nn_pruning's Layer2NoNorm / GeLU2ReLU,
    # vendor nonorm.py:6-139 + gelu2relu.py:7-50): after a transition-schedule
    # sparse run is compiled, norms collapse to an affine (NoNorm) and GELUs
    # to ReLU.  "layernorm"/"gelu" are the normal models.
    norm_mode: str = "layernorm"  # "layernorm" | "nonorm"
    act: str = "gelu"             # "gelu" | "relu"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def resolved_head_dim(self) -> int:
        return self.head_dim if self.head_dim is not None else self.dim // self.heads

    def layer_heads(self, i: int) -> int:
        return self.heads_per_layer[i] if self.heads_per_layer is not None else self.heads

    def layer_mlp_dim(self, i: int) -> int:
        return (
            self.mlp_dim_per_layer[i]
            if self.mlp_dim_per_layer is not None
            else self.mlp_dim
        )

    def replace(self, **kw) -> "ViTConfig":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["dtype"] = jnp.dtype(self.dtype).name
        d["param_dtype"] = jnp.dtype(self.param_dtype).name
        return json.dumps(d, indent=2)

    @staticmethod
    def from_json(s: str) -> "ViTConfig":
        d = json.loads(s)
        d["dtype"] = jnp.dtype(d["dtype"])
        d["param_dtype"] = jnp.dtype(d["param_dtype"])
        for k in ("heads_per_layer", "mlp_dim_per_layer"):
            if d.get(k) is not None:
                d[k] = tuple(d[k])
        return ViTConfig(**d)


REFERENCE_STYLE = dict(
    reference_residual=True,
    mlp_head=True,
    final_norm=False,
    qkv_bias=False,
    gelu_approx=True,
    layernorm_eps=1e-5,
)

STANDARD_STYLE = dict(
    reference_residual=False,
    mlp_head=False,
    final_norm=True,
    qkv_bias=True,
    gelu_approx=False,
    layernorm_eps=1e-6,
)


def decode_prune_encoding(prune_encoding: str, depth: int, mlp_dim: int):
    """Parse the reference's prune-encoding DSL.

    ``"all_headH_ffnF"`` => every layer keeps H heads and int(F*mlp_dim) FFN
    units; ``"layerwise_h2-d1.0_h3-d0.5_..."`` => per-layer settings.
    Mirrors /root/reference/modeling/models/vit.py:77-97.
    """
    tokens = prune_encoding.split("_")
    setting = tokens[0]
    if setting == "all":
        num_heads = int(tokens[1].replace("head", ""))
        ffn_threshold = float(tokens[2].replace("ffn", ""))
        heads_per_layer = tuple(num_heads for _ in range(depth))
        mlp_per_layer = tuple(int(ffn_threshold * mlp_dim) for _ in range(depth))
    elif setting == "layerwise":
        heads, ffns = [], []
        for token in tokens[1:]:
            hx, dx = token.split("-")
            heads.append(int(hx.replace("h", "")))
            ffns.append(float(dx.replace("d", "")))
        if len(heads) != depth:
            raise ValueError(
                f"layerwise encoding has {len(heads)} entries, expected depth={depth}"
            )
        heads_per_layer = tuple(heads)
        mlp_per_layer = tuple(int(f * mlp_dim) for f in ffns)
    else:
        raise ValueError(f"unknown prune setting {setting!r}")
    return heads_per_layer, mlp_per_layer


def encode_prune_encoding(
    heads_per_layer: Sequence[int], mlp_dims: Sequence[int], mlp_dim: int
) -> str:
    """Inverse of :func:`decode_prune_encoding` (layerwise form)."""
    parts = [
        f"h{h}-d{m / mlp_dim:g}" for h, m in zip(heads_per_layer, mlp_dims)
    ]
    return "layerwise_" + "_".join(parts)
