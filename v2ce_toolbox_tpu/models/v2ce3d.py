"""V2ce3d — the flagship stage-1 model (reference: scripts/v2ce_3d.py:12-30).

Takes (B, L, H, W, 2) stacked consecutive-frame pairs and predicts a
(B, L, H, W, 20) event-count voxel grid. The 20 output channels are
(polarity, time-bin) pairs: channel p*10+c, with polarity index 0 mapping to
DVS polarity 1 (ON) downstream — see ops/ldati.py and
reference scripts/LDATI.py:290-303.

Unlike the reference there is no NCDHW<->NDCHW permute pair: the model is
channels-last end to end; `voxels_to_reference_layout` converts to the
reference's (B, L, 2, 10, H, W) only at host boundaries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from v2ce_toolbox_tpu.config import ModelConfig
from v2ce_toolbox_tpu.models.unet3d import UNet3D


class V2ce3d(nn.Module):
    config: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        return UNet3D(
            name="unet",
            num_input_channels=cfg.in_channels,
            num_output_channels=cfg.out_channels,
            skip_type=cfg.skip_type,
            activation=cfg.final_activation,
            num_encoders=cfg.num_encoders,
            base_num_channels=cfg.base_num_channels,
            num_residual_blocks=cfg.num_residual_blocks,
            norm=cfg.norm,
            sn=cfg.spectral_norm,
            compute_dtype=cfg.compute_dtype,
            remat=cfg.remat,
            conv_impl=cfg.conv_impl,
            subpixel_decoder=cfg.subpixel_decoder,
            subpixel_impl=cfg.subpixel_impl,
            subpixel_blocks=cfg.subpixel_blocks,
            decoder_split=cfg.decoder_split,
            out_layout=cfg.out_layout,
        )(x, train=train)


def voxels_to_reference_layout(v: jax.Array) -> jax.Array:
    """(B, L, H, W, 20) -> (B, L, 2, 10, H, W), the reference output layout
    consumed by merge_voxels / LDATI (reference: v2ce.py:352)."""
    b, l, h, w, c = v.shape
    v = jnp.transpose(v, (0, 1, 4, 2, 3))
    return v.reshape(b, l, 2, c // 2, h, w)


def voxels_from_reference_layout(v: jax.Array) -> jax.Array:
    """(B, L, 2, 10, H, W) -> (B, L, H, W, 20)."""
    b, l, p, c, h, w = v.shape
    return jnp.transpose(v.reshape(b, l, p * c, h, w), (0, 1, 3, 4, 2))
