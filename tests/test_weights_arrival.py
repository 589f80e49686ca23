"""Weights-arrival runbook gate (VERDICT r3 directive #9).

Real pretrained-weight top-1 parity is environment-blocked (no egress, no
weights, no val set).  These tests keep the ingestion path standing: they
SKIP unless a local `weights_manifest.json` exists (see
docs/WORKFLOWS.md "Weights-arrival runbook"), and when it does they verify
each manifest entry loads + converts + produces sane logits — so the moment
weights land, `tools/weights_parity.py` is one command away from the table.
"""

import json
import os

import jax
import jax.numpy as jnp
import pytest

MANIFEST = os.path.join(os.path.dirname(__file__), "..",
                        "weights_manifest.json")

pytestmark = [
    pytest.mark.weights,
    pytest.mark.skipif(
        not os.path.exists(MANIFEST),
        reason="no weights_manifest.json — pretrained weights have not "
               "arrived (docs/WORKFLOWS.md weights-arrival runbook)"),
]


def _entries():
    return list(json.load(open(MANIFEST)).items())


def test_manifest_entries_load_and_forward():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.weights_parity import load_entry

    for name, path in _entries():
        assert os.path.exists(path), f"{name}: missing weights file {path}"
        model, params = load_entry(name, path)
        size = model.config.image_size
        x = jnp.ones((1, 3, size, size), jnp.float32)
        logits = jax.jit(model.apply)(params, x)
        assert logits.shape[-1] >= 1000
        assert bool(jnp.isfinite(logits).all())


def test_anchor_known_for_each_entry():
    from edgevisiontransformer_tpu.utils.plots import MODEL_INFO

    for name, _ in _entries():
        assert name in MODEL_INFO, (
            f"{name}: no published anchor in utils/plots.MODEL_INFO — "
            "add one before claiming parity")
