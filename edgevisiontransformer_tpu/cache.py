"""Persistent XLA compilation cache setup.

Remote-compiled Pallas programs take minutes to build on this runtime; the
on-disk jit cache makes every subsequent process reuse them.  Call
``enable_compilation_cache()`` early (bench.py, CLI, graft entry do).
"""

from __future__ import annotations

import os

import jax

_DEFAULT = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> str:
    path = os.path.abspath(path or os.environ.get("EVT_JAX_CACHE", _DEFAULT))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
