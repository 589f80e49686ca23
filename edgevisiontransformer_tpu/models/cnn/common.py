"""Shared CNN building blocks (conv-bn-act, SE, inverted residual, shuffle).

The reference vendors ~5400 LoC of per-model imgclsmob implementations
(/root/reference/modeling/models/{shufflenet,shufflenetv2,mnasnet,
proxylessnas,squeezenet,common}.py).  Here one small block kit expresses the
whole zoo; models are config lists (models/cnn/zoo.py).

TPU notes: everything is NHWC (XLA's preferred conv layout); the package API
stays NCHW like the ViT family and transposes once at the input.  BatchNorm
runs in inference mode by default (running stats in the ``batch_stats``
collection) since the zoo exists for benchmarking/eval parity.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def hard_sigmoid(x):
    return jax.nn.relu6(x + 3.0) / 6.0


def hard_swish(x):
    return x * hard_sigmoid(x)


ACTS = {
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "hswish": hard_swish,
    "swish": jax.nn.silu,
    "linear": lambda x: x,
}


class ConvBNAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: str = "relu"
    use_bn: bool = True
    padding: str | Sequence = "SAME"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            feature_group_count=self.groups,
            padding=self.padding,
            use_bias=not self.use_bn,
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-3)(x)
        return ACTS[self.act](x)


class DepthwiseConvBNAct(nn.Module):
    kernel: int = 3
    stride: int = 1
    act: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        return ConvBNAct(c, self.kernel, self.stride, groups=c, act=self.act)(
            x, train
        )


class SEBlock(nn.Module):
    reduction: int = 4
    gate: str = "hsigmoid"  # hsigmoid | sigmoid

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(max(c // self.reduction, 8), (1, 1))(s)
        s = jax.nn.relu(s)
        s = nn.Conv(c, (1, 1))(s)
        s = hard_sigmoid(s) if self.gate == "hsigmoid" else jax.nn.sigmoid(s)
        return x * s


class InvertedResidual(nn.Module):
    """MobileNetV2/V3 / MNASNet / Proxyless MBConv block."""

    features: int
    expand: float = 6.0
    kernel: int = 3
    stride: int = 1
    act: str = "relu6"
    se: bool = False
    se_reduction: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        hidden = int(round(c_in * self.expand))
        h = x
        if hidden != c_in:
            h = ConvBNAct(hidden, 1, act=self.act)(h, train)
        h = ConvBNAct(hidden, self.kernel, self.stride, groups=hidden,
                      act=self.act)(h, train)
        if self.se:
            h = SEBlock(self.se_reduction)(h)
        h = ConvBNAct(self.features, 1, act="linear")(h, train)
        if self.stride == 1 and c_in == self.features:
            h = h + x
        return h


def channel_shuffle(x: jax.Array, groups: int) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


class FireModule(nn.Module):
    """SqueezeNet fire module."""

    squeeze: int
    expand1: int
    expand3: int

    @nn.compact
    def __call__(self, x):
        s = jax.nn.relu(nn.Conv(self.squeeze, (1, 1))(x))
        e1 = jax.nn.relu(nn.Conv(self.expand1, (1, 1))(s))
        e3 = jax.nn.relu(nn.Conv(self.expand3, (3, 3), padding="SAME")(s))
        return jnp.concatenate([e1, e3], axis=-1)


class ResNetBottleneck(nn.Module):
    features: int  # bottleneck width; output = 4x
    stride: int = 1
    preact: bool = False  # v2-style

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_c = self.features * 4
        shortcut = x
        if self.preact:
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = jax.nn.relu(x)
            if x.shape[-1] != out_c or self.stride != 1:
                shortcut = nn.Conv(out_c, (1, 1), strides=(self.stride,) * 2)(x)
            h = nn.Conv(self.features, (1, 1))(x)
            h = jax.nn.relu(nn.BatchNorm(use_running_average=not train)(h))
            h = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                        padding="SAME")(h)
            h = jax.nn.relu(nn.BatchNorm(use_running_average=not train)(h))
            h = nn.Conv(out_c, (1, 1))(h)
            return h + shortcut
        h = ConvBNAct(self.features, 1, act="relu")(x, train)
        h = ConvBNAct(self.features, 3, self.stride, act="relu")(h, train)
        h = ConvBNAct(out_c, 1, act="linear")(h, train)
        if x.shape[-1] != out_c or self.stride != 1:
            shortcut = ConvBNAct(out_c, 1, self.stride, act="linear")(x, train)
        return jax.nn.relu(h + shortcut)
