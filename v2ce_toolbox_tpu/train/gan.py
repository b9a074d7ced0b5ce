"""PatchGAN discriminator + adversarial loss for stage-1 training.

Re-design of the reference GAN loss (reference: train/scripts/model/gan.py):
the reference's GANLoss module *owns a second Adam optimizer* and performs
`gan_k` discriminator updates inside its forward pass (gan.py:263-299). In
JAX that becomes explicit state: the training step carries a discriminator
TrainState and calls `discriminator_update` (gan_k unrolled steps on the
stopped-gradient fake) before computing the generator's adversarial term.

Discriminator architecture: PatchGAN with NO norm layers (the reference
builds NLayerDiscriminator with norm_layer=None and never appends it,
gan.py:153-203), convs k4 s2 p1 -> 64/128/256, then k4 s1 p1 -> 512 -> 1.
The 3D variant uses padding 2 (gan.py:100-151).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn


class PatchDiscriminator2D(nn.Module):
    """(N, H, W, C) -> (N, H', W', 1) patch logits
    (reference: gan.py:153-203 via Patch_Discriminator gan.py:205-226)."""

    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        def conv(feats, stride):
            return nn.Conv(feats, (4, 4), strides=(stride, stride),
                           padding=((1, 1), (1, 1)))

        x = conv(self.ndf, 2)(x)
        x = nn.leaky_relu(x, 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            x = conv(self.ndf * nf, 2)(x)
            x = nn.leaky_relu(x, 0.2)
        nf = min(2 ** self.n_layers, 8)
        x = conv(self.ndf * nf, 1)(x)
        x = nn.leaky_relu(x, 0.2)
        return conv(1, 1)(x)


class PatchDiscriminator3D(nn.Module):
    """(N, P, C, H, W) reference layout -> channels-last (N, C, H, W, P)
    patch logits (reference: gan.py:100-151; k4 p2)."""

    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        def conv(feats, stride):
            return nn.Conv(feats, (4, 4, 4), strides=(stride,) * 3,
                           padding=((2, 2),) * 3)

        x = conv(self.ndf, 2)(x)
        x = nn.leaky_relu(x, 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            x = conv(self.ndf * nf, 2)(x)
            x = nn.leaky_relu(x, 0.2)
        nf = min(2 ** self.n_layers, 8)
        x = conv(self.ndf * nf, 1)(x)
        x = nn.leaky_relu(x, 0.2)
        return conv(1, 1)(x)


def make_discriminator(use_3d_conv: bool = False) -> nn.Module:
    # reference: model_interface.py:28-33 (in_channels 2 vs 20 is implied
    # by the input layout; flax convs infer input channels)
    return PatchDiscriminator3D() if use_3d_conv else PatchDiscriminator2D()


def make_disc_optimizer() -> optax.GradientTransformation:
    """Adam(lr 1e-5, betas (0, 0.9), eps 1e-8, weight_decay 1e-5)
    (reference: gan.py:252-258; torch weight_decay is additive L2)."""
    return optax.chain(
        optax.add_decayed_weights(1e-5),
        optax.scale_by_adam(b1=0.0, b2=0.9, eps=1e-8),
        optax.scale_by_learning_rate(1e-5),
    )


def _bce_logits(logits: jax.Array, target: float) -> jax.Array:
    labels = jnp.full_like(logits, target)
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))


def _prep(voxels: jax.Array, use_3d_conv: bool) -> jax.Array:
    """Channels-last model voxels (B, L, H, W, 20) -> discriminator input.

    The reference flattens frames into batch ('b l c h w -> (b l) c h w',
    model_interface.py:288) and for 3D splits polarity ('b (p c) h w ->
    b p c h w', gan.py:267-269)."""
    b, l, h, w, c = voxels.shape
    x = voxels.reshape(b * l, h, w, c)
    if not use_3d_conv:
        return x                                   # (N, H, W, 20)
    x = x.reshape(b * l, h, w, 2, c // 2)          # split polarity
    return jnp.transpose(x, (0, 4, 1, 2, 3))       # (N, C10, H, W, P)


def discriminator_update(
    disc: nn.Module,
    disc_params,
    disc_opt_state,
    fake_voxels: jax.Array,
    real_voxels: jax.Array,
    *,
    gan_k: int = 3,
    use_3d_conv: bool = False,
    optimizer: optax.GradientTransformation = None,
) -> Tuple[dict, optax.OptState, jax.Array]:
    """Run gan_k discriminator BCE updates (reference: gan.py:271-289).
    Returns (new_params, new_opt_state, mean_d_loss)."""
    if optimizer is None:
        optimizer = make_disc_optimizer()
    fake = jax.lax.stop_gradient(_prep(fake_voxels, use_3d_conv))
    real = jax.lax.stop_gradient(_prep(real_voxels, use_3d_conv))

    def d_loss_fn(params):
        d_fake = disc.apply({"params": params}, fake)
        d_real = disc.apply({"params": params}, real)
        return _bce_logits(d_fake, 0.0) + _bce_logits(d_real, 1.0)

    total_d = 0.0
    for _ in range(gan_k):
        d_loss, grads = jax.value_and_grad(d_loss_fn)(disc_params)
        updates, disc_opt_state = optimizer.update(grads, disc_opt_state,
                                                   disc_params)
        disc_params = optax.apply_updates(disc_params, updates)
        total_d = total_d + d_loss
    return disc_params, disc_opt_state, total_d / gan_k


def generator_adversarial_loss(
    disc: nn.Module, disc_params, fake_voxels: jax.Array,
    *, use_3d_conv: bool = False,
) -> jax.Array:
    """BCE(disc(fake), real-label): gradient flows into the generator
    through fake (reference: gan.py:292-299)."""
    logits = disc.apply(
        {"params": jax.lax.stop_gradient(disc_params)},
        _prep(fake_voxels, use_3d_conv),
    )
    return _bce_logits(logits, 1.0)
