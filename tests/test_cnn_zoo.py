"""CNN zoo tests: forward shapes + parameter counts vs published numbers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgevisiontransformer_tpu.models.cnn.zoo import CNN_ZOO, get_cnn

# (name, params_low, params_high) — published ImageNet model sizes
PARAM_RANGES = {
    "mobilenet_v1": (4.0e6, 4.5e6),
    "mobilenet_v2": (3.3e6, 3.7e6),
    "mobilenet_v3_large": (5.2e6, 5.7e6),
    "mobilenet_v3_small": (2.3e6, 2.8e6),
    "squeezenet": (1.2e6, 1.4e6),
    "resnet50": (25.0e6, 26.0e6),
    "resnet50_v2": (25.0e6, 26.2e6),
    "efficientnet_b0": (5.0e6, 5.6e6),
    "efficientnet_lite0": (4.4e6, 4.9e6),
    "shufflenet_v1": (1.6e6, 2.1e6),
    "shufflenet_v2": (2.1e6, 2.5e6),
    "mnasnet": (4.2e6, 4.6e6),
    "proxyless_mobile": (3.9e6, 4.4e6),
    "inception_v3": (23.0e6, 24.5e6),
    "inception_resnet_v2": (54.0e6, 57.5e6),  # keras: 55,873,736
}


@pytest.mark.parametrize("name", sorted(CNN_ZOO))
def test_cnn_shapes_and_params(name):
    model = get_cnn(name, num_classes=1000)
    x = jnp.ones((1, 3, 224, 224))
    variables = jax.eval_shape(lambda: model.init(jax.random.key(0), x))
    n = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(variables["params"]))
    lo, hi = PARAM_RANGES[name]
    assert lo < n < hi, f"{name}: {n} params not in [{lo}, {hi}]"


@pytest.mark.parametrize("name", ["mobilenet_v2", "squeezenet", "shufflenet_v2"])
def test_cnn_forward_runs(name):
    model = get_cnn(name, num_classes=10)
    x = jax.random.normal(jax.random.key(0), (2, 3, 64, 64))
    variables = model.init(jax.random.key(1), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 10)
    assert jnp.isfinite(y).all()


def test_unknown_cnn():
    with pytest.raises(KeyError):
        get_cnn("nope")
