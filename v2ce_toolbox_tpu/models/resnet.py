"""ResNet classifier — the GAN's non-patch discriminator backbone.

Flax equivalent of the reference's torchvision-style ResNet
(reference: train/scripts/model/resnet.py:1-284 and the GAN's copy at
train/scripts/model/gan.py:13-99: conv7 s2 -> maxpool -> 4 stages of
LeakyReLU residual blocks [3,4,6,3] at 64/128/256/512 -> global avg pool
-> linear head). Used by `Discriminator` when use_patch_gan=False
(gan.py:226-234). Channels-last (N, H, W, C)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class _ResBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name=name)
        residual = x
        out = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                      padding=((1, 1), (1, 1)), name="conv1")(x)
        out = norm("bn1")(out)
        out = nn.leaky_relu(out, 0.01)
        out = nn.Conv(self.features, (3, 3), (1, 1),
                      padding=((1, 1), (1, 1)), name="conv2")(out)
        out = norm("bn2")(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1, 1),
                               (self.stride, self.stride),
                               name="downsample_conv")(x)
            residual = norm("downsample_bn")(residual)
        return nn.leaky_relu(out + residual, 0.01)


class ResNet(nn.Module):
    num_classes: int = 10
    layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(64, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                    name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="stem_bn")(x)
        x = nn.leaky_relu(x, 0.01)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        for stage, (feats, n_blocks, stride) in enumerate(
                zip((64, 128, 256, 512), self.layers, (1, 2, 2, 2))):
            for b in range(n_blocks):
                x = _ResBlock(feats, stride if b == 0 else 1,
                              name=f"stage{stage}_block{b}")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))                   # global avg pool
        return nn.Dense(self.num_classes, name="fc")(x)


class ResNetDiscriminator(nn.Module):
    """(N, H, W, C) -> (N, 2) logits (reference: gan.py:226-234)."""

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return ResNet(num_classes=2, name="resnet")(x, train=train)
