"""Inception V3 (the reference zoo includes keras-applications inception,
cnn_zoo.py:50-119).  Standard 299x299 architecture; accepts 224 too (all
pooling is SAME/VALID-consistent, spatial dims just shrink)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import ConvBNAct


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = ConvBNAct(64, 1)(x, train)
        b5 = ConvBNAct(48, 1)(x, train)
        b5 = ConvBNAct(64, 5)(b5, train)
        b3 = ConvBNAct(64, 1)(x, train)
        b3 = ConvBNAct(96, 3)(b3, train)
        b3 = ConvBNAct(96, 3)(b3, train)
        bp = nn.avg_pool(x, (3, 3), (1, 1), padding="SAME")
        bp = ConvBNAct(self.pool_features, 1)(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        b3 = ConvBNAct(384, 3, 2, padding="VALID")(x, train)
        bd = ConvBNAct(64, 1)(x, train)
        bd = ConvBNAct(96, 3)(bd, train)
        bd = ConvBNAct(96, 3, 2, padding="VALID")(bd, train)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c7 = self.channels_7x7
        b1 = ConvBNAct(192, 1)(x, train)

        def conv7(h, feats, kh, kw):
            h = nn.Conv(feats, (kh, kw), padding="SAME", use_bias=False)(h)
            h = nn.BatchNorm(use_running_average=not train, epsilon=1e-3)(h)
            return jax.nn.relu(h)

        b7 = ConvBNAct(c7, 1)(x, train)
        b7 = conv7(b7, c7, 1, 7)
        b7 = conv7(b7, 192, 7, 1)

        b77 = ConvBNAct(c7, 1)(x, train)
        b77 = conv7(b77, c7, 7, 1)
        b77 = conv7(b77, c7, 1, 7)
        b77 = conv7(b77, c7, 7, 1)
        b77 = conv7(b77, 192, 1, 7)

        bp = nn.avg_pool(x, (3, 3), (1, 1), padding="SAME")
        bp = ConvBNAct(192, 1)(bp, train)
        return jnp.concatenate([b1, b7, b77, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        b3 = ConvBNAct(192, 1)(x, train)
        b3 = ConvBNAct(320, 3, 2, padding="VALID")(b3, train)
        b7 = ConvBNAct(192, 1)(x, train)
        b7 = nn.Conv(192, (1, 7), padding="SAME", use_bias=False)(b7)
        b7 = jax.nn.relu(nn.BatchNorm(use_running_average=not train, epsilon=1e-3)(b7))
        b7 = nn.Conv(192, (7, 1), padding="SAME", use_bias=False)(b7)
        b7 = jax.nn.relu(nn.BatchNorm(use_running_average=not train, epsilon=1e-3)(b7))
        b7 = ConvBNAct(192, 3, 2, padding="VALID")(b7, train)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv(h, feats, kh, kw):
            h = nn.Conv(feats, (kh, kw), padding="SAME", use_bias=False)(h)
            h = nn.BatchNorm(use_running_average=not train, epsilon=1e-3)(h)
            return jax.nn.relu(h)

        b1 = ConvBNAct(320, 1)(x, train)
        b3 = ConvBNAct(384, 1)(x, train)
        b3 = jnp.concatenate(
            [conv(b3, 384, 1, 3), conv(b3, 384, 3, 1)], axis=-1)
        bd = ConvBNAct(448, 1)(x, train)
        bd = ConvBNAct(384, 3)(bd, train)
        bd = jnp.concatenate(
            [conv(bd, 384, 1, 3), conv(bd, 384, 3, 1)], axis=-1)
        bp = nn.avg_pool(x, (3, 3), (1, 1), padding="SAME")
        bp = ConvBNAct(192, 1)(bp, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def _conv_bn(h, feats, kh, kw, stride=1, padding="SAME", act=True, train=False):
    """conv + BN + optional relu with rectangular kernels (keras conv2d_bn)."""
    h = nn.Conv(feats, (kh, kw), strides=(stride, stride), padding=padding,
                use_bias=False)(h)
    h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-3)(h)
    return jax.nn.relu(h) if act else h


class InceptionResNetBlock(nn.Module):
    """Residual Inception block (block35 / block17 / block8 of
    keras-applications InceptionResNetV2, the reference zoo's
    `get_inception_resnetv2`, cnn_zoo.py:36-38,84): branches -> 1x1 linear
    "up" conv -> x + scale*up, optional relu."""

    kind: str         # "block35" | "block17" | "block8"
    scale: float
    relu_out: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        if self.kind == "block35":
            b0 = _conv_bn(x, 32, 1, 1, train=train)
            b1 = _conv_bn(x, 32, 1, 1, train=train)
            b1 = _conv_bn(b1, 32, 3, 3, train=train)
            b2 = _conv_bn(x, 32, 1, 1, train=train)
            b2 = _conv_bn(b2, 48, 3, 3, train=train)
            b2 = _conv_bn(b2, 64, 3, 3, train=train)
            mixed = jnp.concatenate([b0, b1, b2], axis=-1)
        elif self.kind == "block17":
            b0 = _conv_bn(x, 192, 1, 1, train=train)
            b1 = _conv_bn(x, 128, 1, 1, train=train)
            b1 = _conv_bn(b1, 160, 1, 7, train=train)
            b1 = _conv_bn(b1, 192, 7, 1, train=train)
            mixed = jnp.concatenate([b0, b1], axis=-1)
        else:  # block8
            b0 = _conv_bn(x, 192, 1, 1, train=train)
            b1 = _conv_bn(x, 192, 1, 1, train=train)
            b1 = _conv_bn(b1, 224, 1, 3, train=train)
            b1 = _conv_bn(b1, 256, 3, 1, train=train)
            mixed = jnp.concatenate([b0, b1], axis=-1)
        # "up" projection: plain conv with bias, no BN, linear (keras semantics)
        up = nn.Conv(cin, (1, 1), use_bias=True)(mixed)
        out = x + self.scale * up
        return jax.nn.relu(out) if self.relu_out else out


class InceptionResNetV2(nn.Module):
    """Inception-ResNet-v2 (reference cnn_zoo.py:36-38: keras applications,
    299x299; ~55.9M params).  Stem -> mixed_5b -> 10x block35 -> reduction-A
    -> 20x block17 -> reduction-B -> 10x block8 -> conv 1536 -> GAP -> fc."""

    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        # stem
        x = _conv_bn(x, 32, 3, 3, stride=2, padding="VALID", train=train)
        x = _conv_bn(x, 32, 3, 3, padding="VALID", train=train)
        x = _conv_bn(x, 64, 3, 3, train=train)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = _conv_bn(x, 80, 1, 1, padding="VALID", train=train)
        x = _conv_bn(x, 192, 3, 3, padding="VALID", train=train)
        x = nn.max_pool(x, (3, 3), (2, 2))
        # mixed_5b
        b0 = _conv_bn(x, 96, 1, 1, train=train)
        b1 = _conv_bn(x, 48, 1, 1, train=train)
        b1 = _conv_bn(b1, 64, 5, 5, train=train)
        b2 = _conv_bn(x, 64, 1, 1, train=train)
        b2 = _conv_bn(b2, 96, 3, 3, train=train)
        b2 = _conv_bn(b2, 96, 3, 3, train=train)
        bp = nn.avg_pool(x, (3, 3), (1, 1), padding="SAME")
        bp = _conv_bn(bp, 64, 1, 1, train=train)
        x = jnp.concatenate([b0, b1, b2, bp], axis=-1)  # 320
        for _ in range(10):
            x = InceptionResNetBlock("block35", 0.17)(x, train)
        # mixed_6a (reduction-A)
        b0 = _conv_bn(x, 384, 3, 3, stride=2, padding="VALID", train=train)
        b1 = _conv_bn(x, 256, 1, 1, train=train)
        b1 = _conv_bn(b1, 256, 3, 3, train=train)
        b1 = _conv_bn(b1, 384, 3, 3, stride=2, padding="VALID", train=train)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        x = jnp.concatenate([b0, b1, bp], axis=-1)  # 1088
        for _ in range(20):
            x = InceptionResNetBlock("block17", 0.10)(x, train)
        # mixed_7a (reduction-B)
        b0 = _conv_bn(x, 256, 1, 1, train=train)
        b0 = _conv_bn(b0, 384, 3, 3, stride=2, padding="VALID", train=train)
        b1 = _conv_bn(x, 256, 1, 1, train=train)
        b1 = _conv_bn(b1, 288, 3, 3, stride=2, padding="VALID", train=train)
        b2 = _conv_bn(x, 256, 1, 1, train=train)
        b2 = _conv_bn(b2, 288, 3, 3, train=train)
        b2 = _conv_bn(b2, 320, 3, 3, stride=2, padding="VALID", train=train)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        x = jnp.concatenate([b0, b1, b2, bp], axis=-1)  # 2080
        for _ in range(9):
            x = InceptionResNetBlock("block8", 0.20)(x, train)
        x = InceptionResNetBlock("block8", 1.0, relu_out=False)(x, train)
        x = _conv_bn(x, 1536, 1, 1, train=train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes)(x)


class InceptionV3(nn.Module):
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        x = ConvBNAct(32, 3, 2, padding="VALID")(x, train)
        x = ConvBNAct(32, 3, padding="VALID")(x, train)
        x = ConvBNAct(64, 3)(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = ConvBNAct(80, 1, padding="VALID")(x, train)
        x = ConvBNAct(192, 3, padding="VALID")(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = InceptionA(32)(x, train)
        x = InceptionA(64)(x, train)
        x = InceptionA(64)(x, train)
        x = InceptionB()(x, train)
        x = InceptionC(128)(x, train)
        x = InceptionC(160)(x, train)
        x = InceptionC(160)(x, train)
        x = InceptionC(192)(x, train)
        x = InceptionD()(x, train)
        x = InceptionE()(x, train)
        x = InceptionE()(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes)(x)
