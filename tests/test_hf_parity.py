"""Numerical parity vs HuggingFace torch implementations (random-init models,
no network): the strongest correctness oracle available offline.

The reference validated via cross-runtime accuracy comparison
(SURVEY.md §4 item 3); here we compare logits elementwise."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from edgevisiontransformer_tpu.models.swin import SwinTransformer
from edgevisiontransformer_tpu.models.vit import ViT
from edgevisiontransformer_tpu.utils.hf_import import (
    import_hf_swin,
    import_hf_vit,
    swin_config_from_hf,
    vit_config_from_hf,
)


def test_vit_matches_hf_torch():
    from transformers import ViTConfig as HFViTConfig, ViTForImageClassification

    hf_cfg = HFViTConfig(
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        image_size=32,
        patch_size=16,
        num_labels=10,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = ViTForImageClassification(hf_cfg).eval()

    cfg = vit_config_from_hf(hf_cfg, num_classes=10)
    params = import_hf_vit(hf.state_dict(), cfg)
    model = ViT(cfg)

    x = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x)).logits.numpy()
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_swin_matches_hf_torch():
    from transformers import SwinConfig as HFSwinConfig, SwinForImageClassification

    hf_cfg = HFSwinConfig(
        image_size=32,
        patch_size=2,
        embed_dim=24,
        depths=[2, 2],
        num_heads=[3, 6],
        window_size=4,
        num_labels=10,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0,
    )
    torch.manual_seed(0)
    hf = SwinForImageClassification(hf_cfg).eval()

    cfg = swin_config_from_hf(hf_cfg, num_classes=10)
    variables = import_hf_swin(hf.state_dict(), cfg)
    model = SwinTransformer(cfg)

    x = np.random.RandomState(1).randn(2, 3, 32, 32).astype(np.float32)
    # constants (rel-pos index, masks) are rebuilt natively by init
    init_vars = model.init(jax.random.key(0), jnp.asarray(x))
    variables = {**variables, "constants": init_vars["constants"]}

    with torch.no_grad():
        ref = hf(torch.from_numpy(x)).logits.numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
