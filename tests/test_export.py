"""StableHLO export/reload roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np

from edgevisiontransformer_tpu.models.vit import ViT, deit_config
from edgevisiontransformer_tpu.utils.export import export_forward, load_exported


def test_export_roundtrip(tmp_path):
    cfg = deit_config("tiny").replace(
        image_size=32, patch_size=16, dim=64, depth=2, heads=2, mlp_dim=128,
        num_classes=10,
    )
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 3, 32, 32))
    params = model.init(jax.random.key(1), x)
    ref = np.asarray(model.apply(params, x))

    path = export_forward(
        model.apply, params, (2, 3, 32, 32), str(tmp_path / "deit.stablehlo"),
        meta={"model": "deit_tiny_test"},
    )
    fn = load_exported(path)
    got = np.asarray(fn(x))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    assert (tmp_path / "deit.stablehlo.json").exists()


def test_export_with_params_arg(tmp_path):
    cfg = deit_config("tiny").replace(
        image_size=32, patch_size=16, dim=64, depth=1, heads=2, mlp_dim=64,
        num_classes=4,
    )
    model = ViT(cfg)
    x = jnp.ones((1, 3, 32, 32))
    params = model.init(jax.random.key(0), x)
    path = export_forward(model.apply, params, (1, 3, 32, 32),
                          str(tmp_path / "m.hlo"), bake_params=False)
    fn = load_exported(path)
    np.testing.assert_allclose(
        np.asarray(fn(params, x)), np.asarray(model.apply(params, x)),
        rtol=1e-5, atol=1e-5,
    )
