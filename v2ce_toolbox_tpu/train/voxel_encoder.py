"""VoxelEncoder + EncoderLoss — perceptual voxel-embedding loss.

Flax equivalent of the reference's frozen voxel encoder
(reference: train/scripts/model/losses.py:51-114): a conv downsample stack
(64 -> 128 -> 256 with BN/ReLU/maxpool, global avg pool) feeding a 2-layer
TransformerEncoder (d_model=256, 2 heads) and a linear head to 512-d
embeddings; the loss is the MSE between the pred and GT embeddings.

The reference loads frozen weights from `train/scripts/weights/
voxel_encoder.pt`, which is NOT shipped in the mirror — so EncoderLoss
here accepts any param pytree (converted checkpoint or seeded init). With
random init it is still a valid perceptual distance (random-feature MSE),
but numbers will not match a reference run.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class _TransformerLayer(nn.Module):
    """Post-norm transformer encoder layer with torch defaults
    (d_model, nhead=2, dim_feedforward=2048, relu)."""

    d_model: int
    n_heads: int = 2
    d_ff: int = 2048

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, name="self_attn")(x, x)
        x = nn.LayerNorm(name="norm1")(x + attn)
        ff = nn.Dense(self.d_ff, name="linear1")(x)
        ff = nn.relu(ff)
        ff = nn.Dense(self.d_model, name="linear2")(ff)
        return nn.LayerNorm(name="norm2")(x + ff)


class VoxelEncoder(nn.Module):
    """(B, L, H, W, C=20) voxels -> (B, L, out_channels) embeddings
    (reference: losses.py:51-96)."""

    in_channels: int = 20
    out_channels: int = 512
    hidden_size: int = 64

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b, l, h, w, c = x.shape
        x = x.reshape(b * l, h, w, c)
        hs = self.hidden_size

        def block(x, feats, name):
            x = nn.Conv(feats, (3, 3), padding=((1, 1), (1, 1)),
                        name=f"{name}_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             name=f"{name}_bn")(x)
            x = nn.relu(x)
            return x

        x = block(x, hs, "down0")
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = block(x, hs * 2, "down1")
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = block(x, hs * 4, "down2")
        x = jnp.mean(x, axis=(1, 2))                   # adaptive avg pool 1x1
        x = x.reshape(b, l, hs * 4)

        for i in range(2):
            x = _TransformerLayer(d_model=hs * 4, name=f"encoder_{i}")(x)
        return nn.Dense(self.out_channels, name="output")(x)


class EncoderLoss:
    """Frozen-encoder MSE (reference: losses.py:98-114). Params are frozen
    by construction (never passed to the optimizer)."""

    def __init__(self, params=None, rng: Optional[jax.Array] = None,
                 input_shape=(1, 1, 64, 64, 20)):
        self.encoder = VoxelEncoder()
        if params is None:
            variables = self.encoder.init(
                rng if rng is not None else jax.random.key(0),
                jnp.zeros(input_shape, jnp.float32))
            self.variables = variables
        else:
            self.variables = params

    def __call__(self, pred: jax.Array, gt: jax.Array) -> jax.Array:
        e_pred = self.encoder.apply(self.variables, pred, train=False)
        e_gt = self.encoder.apply(self.variables, gt, train=False)
        return jnp.mean(jnp.square(e_pred - e_gt))
