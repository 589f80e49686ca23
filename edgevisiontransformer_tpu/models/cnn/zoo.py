"""CNN model zoo — config-driven baselines (reference cnn_zoo.py:50-119).

The reference benchmarks 15 CNNs against the ViTs (mobilenet v1/v2/v3,
squeezenet, efficientnet(-lite), resnet50(v2), shufflenet v1/v2, proxyless,
mnasnet, inception).  Each model here is a stage-config list over the shared
block kit in common.py; all take NCHW input like the rest of the package.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import (
    ACTS,
    ConvBNAct,
    FireModule,
    InvertedResidual,
    ResNetBottleneck,
    SEBlock,
    channel_shuffle,
)


def _nchw_to_nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


class _Classifier(nn.Module):
    num_classes: int = 1000
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x):
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes)(x)


class MobileNetV1(nn.Module):
    num_classes: int = 1000
    width: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = lambda ch: max(8, int(ch * self.width))
        x = _nchw_to_nhwc(x)
        x = ConvBNAct(c(32), 3, 2)(x, train)
        # (features, stride) depthwise-separable stack
        for feats, stride in [(64, 1), (128, 2), (128, 1), (256, 2), (256, 1),
                              (512, 2), *[(512, 1)] * 5, (1024, 2), (1024, 1)]:
            cin = x.shape[-1]
            x = ConvBNAct(cin, 3, stride, groups=cin)(x, train)  # depthwise
            x = ConvBNAct(c(feats), 1)(x, train)                  # pointwise
        return _Classifier(self.num_classes)(x)


_MBV2_CFG = [  # t, c, n, s
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
]


class MobileNetV2(nn.Module):
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _nchw_to_nhwc(x)
        x = ConvBNAct(32, 3, 2, act="relu6")(x, train)
        for t, ch, n, s in _MBV2_CFG:
            for i in range(n):
                x = InvertedResidual(ch, t, 3, s if i == 0 else 1, "relu6")(x, train)
        x = ConvBNAct(1280, 1, act="relu6")(x, train)
        return _Classifier(self.num_classes)(x)


# k, exp, out, se, act, stride
_MBV3_LARGE = [
    (3, 16, 16, False, "relu", 1),
    (3, 64, 24, False, "relu", 2), (3, 72, 24, False, "relu", 1),
    (5, 72, 40, True, "relu", 2), (5, 120, 40, True, "relu", 1), (5, 120, 40, True, "relu", 1),
    (3, 240, 80, False, "hswish", 2), (3, 200, 80, False, "hswish", 1),
    (3, 184, 80, False, "hswish", 1), (3, 184, 80, False, "hswish", 1),
    (3, 480, 112, True, "hswish", 1), (3, 672, 112, True, "hswish", 1),
    (5, 672, 160, True, "hswish", 2), (5, 960, 160, True, "hswish", 1),
    (5, 960, 160, True, "hswish", 1),
]
_MBV3_SMALL = [
    (3, 16, 16, True, "relu", 2),
    (3, 72, 24, False, "relu", 2), (3, 88, 24, False, "relu", 1),
    (5, 96, 40, True, "hswish", 2), (5, 240, 40, True, "hswish", 1),
    (5, 240, 40, True, "hswish", 1), (5, 120, 48, True, "hswish", 1),
    (5, 144, 48, True, "hswish", 1), (5, 288, 96, True, "hswish", 2),
    (5, 576, 96, True, "hswish", 1), (5, 576, 96, True, "hswish", 1),
]


class MobileNetV3(nn.Module):
    num_classes: int = 1000
    variant: str = "large"

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = _MBV3_LARGE if self.variant == "large" else _MBV3_SMALL
        last = 960 if self.variant == "large" else 576
        x = _nchw_to_nhwc(x)
        x = ConvBNAct(16, 3, 2, act="hswish")(x, train)
        for k, exp, out, se, act, s in cfg:
            cin = x.shape[-1]
            x = InvertedResidual(out, exp / cin, k, s, act, se=se)(x, train)
        x = ConvBNAct(last, 1, act="hswish")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(1280 if self.variant == "large" else 1024)(x)
        x = ACTS["hswish"](x)
        return nn.Dense(self.num_classes)(x)


class SqueezeNet(nn.Module):
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _nchw_to_nhwc(x)
        x = jax.nn.relu(nn.Conv(96, (7, 7), strides=(2, 2))(x))
        x = nn.max_pool(x, (3, 3), (2, 2))
        for sq, e1, e3 in [(16, 64, 64), (16, 64, 64), (32, 128, 128)]:
            x = FireModule(sq, e1, e3)(x)
        x = nn.max_pool(x, (3, 3), (2, 2))
        for sq, e1, e3 in [(32, 128, 128), (48, 192, 192), (48, 192, 192),
                           (64, 256, 256)]:
            x = FireModule(sq, e1, e3)(x)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = FireModule(64, 256, 256)(x)
        x = jax.nn.relu(nn.Conv(self.num_classes, (1, 1))(x))
        return jnp.mean(x, axis=(1, 2))


class ResNet50(nn.Module):
    num_classes: int = 1000
    preact: bool = False  # v2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _nchw_to_nhwc(x)
        x = ConvBNAct(64, 7, 2)(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2), padding="SAME")
        for stage, (blocks, width) in enumerate([(3, 64), (4, 128), (6, 256), (3, 512)]):
            for i in range(blocks):
                stride = 2 if (i == 0 and stage > 0) else 1
                x = ResNetBottleneck(width, stride, preact=self.preact)(x, train)
        if self.preact:
            x = jax.nn.relu(nn.BatchNorm(use_running_average=not train)(x))
        return _Classifier(self.num_classes)(x)


# EfficientNet-B0 MBConv config: (expand, c, n, s, k)
_EFFNET_B0 = [
    (1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5), (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5), (6, 192, 4, 2, 5), (6, 320, 1, 1, 3),
]


class EfficientNet(nn.Module):
    num_classes: int = 1000
    lite: bool = False  # lite: ReLU6, no SE

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = "relu6" if self.lite else "swish"
        x = _nchw_to_nhwc(x)
        x = ConvBNAct(32, 3, 2, act=act)(x, train)
        for t, ch, n, s, k in _EFFNET_B0:
            for i in range(n):
                x = InvertedResidual(
                    ch, t, k, s if i == 0 else 1, act,
                    se=not self.lite, se_reduction=4 * t,
                )(x, train)
        x = ConvBNAct(1280, 1, act=act)(x, train)
        return _Classifier(self.num_classes)(x)


class ShuffleUnitV2(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stride == 1:
            left, right = jnp.split(x, 2, axis=-1)
        else:
            left = right = x
            cin = x.shape[-1]
            left = ConvBNAct(cin, 3, 2, groups=cin, act="linear")(left, train)
            left = ConvBNAct(self.features // 2, 1)(left, train)
        c = self.features // 2
        right = ConvBNAct(c, 1)(right, train)
        right = ConvBNAct(c, 3, self.stride, groups=c, act="linear")(right, train)
        right = ConvBNAct(c, 1)(right, train)
        out = jnp.concatenate([left, right], axis=-1)
        return channel_shuffle(out, 2)


class ShuffleNetV2(nn.Module):
    num_classes: int = 1000
    channels: Tuple[int, ...] = (116, 232, 464)  # 1.0x

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _nchw_to_nhwc(x)
        x = ConvBNAct(24, 3, 2)(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2), padding="SAME")
        for ch, blocks in zip(self.channels, (4, 8, 4)):
            x = ShuffleUnitV2(ch, 2)(x, train)
            for _ in range(blocks - 1):
                x = ShuffleUnitV2(ch, 1)(x, train)
        x = ConvBNAct(1024, 1)(x, train)
        return _Classifier(self.num_classes)(x)


class ShuffleUnitV1(nn.Module):
    features: int
    groups: int = 3
    stride: int = 1
    first: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        mid = self.features // 4
        out_c = self.features - cin if self.stride == 2 else self.features
        h = ConvBNAct(mid, 1, groups=1 if self.first else self.groups)(x, train)
        h = channel_shuffle(h, self.groups)
        h = ConvBNAct(mid, 3, self.stride, groups=mid, act="linear")(h, train)
        h = ConvBNAct(out_c, 1, groups=self.groups, act="linear")(h, train)
        if self.stride == 2:
            short = nn.avg_pool(x, (3, 3), (2, 2), padding="SAME")
            return jax.nn.relu(jnp.concatenate([short, h], axis=-1))
        return jax.nn.relu(h + x)


class ShuffleNetV1(nn.Module):
    num_classes: int = 1000
    groups: int = 3
    channels: Tuple[int, ...] = (240, 480, 960)  # g=3, 1.0x

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _nchw_to_nhwc(x)
        x = ConvBNAct(24, 3, 2)(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2), padding="SAME")
        for si, (ch, blocks) in enumerate(zip(self.channels, (4, 8, 4))):
            x = ShuffleUnitV1(ch, self.groups, 2, first=si == 0)(x, train)
            for _ in range(blocks - 1):
                x = ShuffleUnitV1(ch, self.groups, 1)(x, train)
        return _Classifier(self.num_classes)(x)


# MNASNet-B1: (expand, c, n, s, k, se)
_MNASNET_B1 = [
    (1, 16, 1, 1, 3, False), (3, 24, 3, 2, 3, False), (3, 40, 3, 2, 5, False),
    (6, 80, 3, 2, 5, False), (6, 96, 2, 1, 3, False), (6, 192, 4, 2, 5, False),
    (6, 320, 1, 1, 3, False),
]

# ProxylessNAS-mobile: (expand, c, n, s, k) — mixed NAS-style expansions,
# sized to the published ~4.1M params
_PROXYLESS_MOBILE = [
    (1, 16, 1, 1, 3), (3, 32, 2, 2, 5), (3, 40, 4, 2, 7),
    (6, 80, 2, 2, 7), (3, 80, 2, 1, 5),
    (6, 96, 2, 1, 5), (3, 96, 2, 1, 5),
    (6, 192, 1, 2, 7), (3, 192, 3, 1, 7), (6, 320, 1, 1, 7),
]


class MNASNet(nn.Module):
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _nchw_to_nhwc(x)
        x = ConvBNAct(32, 3, 2)(x, train)
        cin = x.shape[-1]
        x = ConvBNAct(cin, 3, 1, groups=cin)(x, train)
        x = ConvBNAct(16, 1, act="linear")(x, train)
        for t, ch, n, s, k, se in _MNASNET_B1[1:]:
            for i in range(n):
                x = InvertedResidual(ch, t, k, s if i == 0 else 1, "relu",
                                     se=se)(x, train)
        x = ConvBNAct(1280, 1)(x, train)
        return _Classifier(self.num_classes)(x)


class ProxylessNAS(nn.Module):
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _nchw_to_nhwc(x)
        x = ConvBNAct(32, 3, 2, act="relu6")(x, train)
        for t, ch, n, s, k in _PROXYLESS_MOBILE:
            for i in range(n):
                x = InvertedResidual(ch, t, k, s if i == 0 else 1, "relu6")(x, train)
        x = ConvBNAct(1280, 1, act="relu6")(x, train)
        return _Classifier(self.num_classes)(x)


from .inception import InceptionResNetV2, InceptionV3

CNN_ZOO = {
    "inception_v3": lambda **kw: InceptionV3(**kw),
    "inception_resnet_v2": lambda **kw: InceptionResNetV2(**kw),
    "mobilenet_v1": lambda **kw: MobileNetV1(**kw),
    "mobilenet_v2": lambda **kw: MobileNetV2(**kw),
    "mobilenet_v3_large": lambda **kw: MobileNetV3(variant="large", **kw),
    "mobilenet_v3_small": lambda **kw: MobileNetV3(variant="small", **kw),
    "squeezenet": lambda **kw: SqueezeNet(**kw),
    "resnet50": lambda **kw: ResNet50(**kw),
    "resnet50_v2": lambda **kw: ResNet50(preact=True, **kw),
    "efficientnet_b0": lambda **kw: EfficientNet(**kw),
    "efficientnet_lite0": lambda **kw: EfficientNet(lite=True, **kw),
    "shufflenet_v1": lambda **kw: ShuffleNetV1(**kw),
    "shufflenet_v2": lambda **kw: ShuffleNetV2(**kw),
    "mnasnet": lambda **kw: MNASNet(**kw),
    "proxyless_mobile": lambda **kw: ProxylessNAS(**kw),
}


def get_cnn(name: str, **kw) -> nn.Module:
    if name not in CNN_ZOO:
        raise KeyError(f"unknown CNN {name!r}; available: {sorted(CNN_ZOO)}")
    return CNN_ZOO[name](**kw)
