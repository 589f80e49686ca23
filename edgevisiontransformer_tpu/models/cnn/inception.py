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
