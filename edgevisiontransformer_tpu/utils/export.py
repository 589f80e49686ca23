"""Serialized model export — the ONNX-export analogue.

The reference exports models to ONNX/TFLite flatbuffers as the deployment
interchange format (/root/reference/utils.py:154-239, tools.py:735-809).  The
TPU-native equivalent is `jax.export`: the jitted forward (params baked or as
arguments) is serialized to a portable StableHLO artifact that any JAX
runtime can reload and run without the Python model code.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def export_forward(
    apply_fn,
    params,
    input_shape: Sequence[int],
    out_path: str,
    dtype=jnp.float32,
    bake_params: bool = True,
    meta: Optional[dict] = None,
) -> str:
    """Serialize a jitted forward to a StableHLO artifact (+ meta sidecar).

    bake_params=True closes over the weights (single-file deployable model,
    like an ONNX export); False exports fn(params, x).
    """
    from jax import export as jexport

    x_spec = jax.ShapeDtypeStruct(tuple(input_shape), dtype)
    if bake_params:
        fn = lambda x: apply_fn(params, x)
        exported = jexport.export(jax.jit(fn))(x_spec)
    else:
        p_spec = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params
        )
        exported = jexport.export(jax.jit(apply_fn))(p_spec, x_spec)

    blob = exported.serialize()
    out = Path(out_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(blob)
    out.with_suffix(out.suffix + ".json").write_text(json.dumps({
        "input_shape": list(input_shape),
        "dtype": jnp.dtype(dtype).name,
        "baked_params": bake_params,
        **(meta or {}),
    }, indent=2))
    return str(out)


def load_exported(path: str):
    """Deserialize and return a callable running the exported model."""
    from jax import export as jexport

    blob = Path(path).read_bytes()
    exported = jexport.deserialize(blob)
    return exported.call
