"""Model registry: name -> (flax module, example NCHW input shape).

The string names mirror the reference's model-key conventions
(/root/reference/tools.py model names like deit_tiny / t2t_vit_14) so CLI
invocations port over.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import flax.linen as nn

from .swin import get_swin
from .t2t_vit import get_t2t_vit
from .vit import get_deit_base, get_deit_small, get_deit_tiny, get_pruned_vit

_REGISTRY: Dict[str, Callable[..., nn.Module]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def available_models():
    return sorted(_REGISTRY)


def build_model(name: str, **kw) -> Tuple[nn.Module, Tuple[int, ...]]:
    """Build a model by name; returns (module, example input shape sans batch)."""
    if name.startswith("pruned_deit_"):
        # e.g. pruned_deit_tiny@all_head2_ffn0.5
        rest = name[len("pruned_deit_"):]
        size, _, enc = rest.partition("@")
        model = get_pruned_vit(size=size, prune_encoding=enc or "all_head12_ffn1.0", **kw)
        return model, (3, model.config.image_size, model.config.image_size)
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: {available_models()}")
    model = _REGISTRY[name](**kw)
    img = getattr(model, "config").image_size
    return model, (3, img, img)


for _size in ("tiny", "small", "base"):
    _REGISTRY[f"deit_{_size}"] = {
        "tiny": get_deit_tiny,
        "small": get_deit_small,
        "base": get_deit_base,
    }[_size]

for _v in (7, 10, 12, 14):
    _REGISTRY[f"t2t_vit_{_v}"] = (lambda v: lambda **kw: get_t2t_vit(v, **kw))(_v)

for _size in ("tiny", "small", "base"):
    _REGISTRY[f"swin_{_size}"] = (lambda s: lambda **kw: get_swin(s, **kw))(_size)


class _CNNWrapper:
    """Adapter giving CNN zoo models the registry interface (a .config with
    image_size; flax BatchNorm stats folded into variables)."""

    def __init__(self, module):
        self.module = module

        class _Cfg:
            image_size = 224

        self.config = _Cfg()

    def init(self, rng, x):
        return self.module.init(rng, x)

    def apply(self, variables, x, **kw):
        return self.module.apply(variables, x, **kw)


def _make_cnn(name):
    def build(**kw):
        from .cnn.zoo import get_cnn

        kw.pop("dtype", None)  # CNN zoo modules are dtype-agnostic (fp32 BN)
        kw.pop("style", None)
        return _CNNWrapper(get_cnn(name, **kw))

    return build


from .cnn.zoo import CNN_ZOO as _CNN_ZOO  # noqa: E402

for _name in _CNN_ZOO:
    _REGISTRY[_name] = _make_cnn(_name)
