"""Checkpoint save/restore via orbax.

The reference has no mid-training resume (SURVEY.md §5.4) — models are saved
with HF ``save_pretrained`` into ``.../final`` directories per prune level
(run_classifier.py:252-256).  We keep that directory convention but store
orbax checkpoints of {params, opt_state?, mask state?} plus a JSON sidecar
with the config / prune topology, enabling true resume.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Optional

import jax


def save_checkpoint(path: str, tree: Any, meta: Optional[dict] = None) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    if meta is not None:
        (path / "meta.json").write_text(json.dumps(meta, indent=2))


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        target = jax.tree.map(lambda x: x, target)  # shallow copy
    return ckptr.restore(path, target)


def load_meta(path: str) -> Optional[dict]:
    meta = Path(path).absolute() / "meta.json"
    if meta.exists():
        return json.loads(meta.read_text())
    return None
