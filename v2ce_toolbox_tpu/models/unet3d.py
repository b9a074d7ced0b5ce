"""3D recurrent-free UNet for event-voxel prediction, channels-last.

Architecture parity with the reference UNet3D
(reference: scripts/unet_2layer.py:203-378):

  head:      ConvLayer3D(in -> 32, k3 s1 p1, LeakyReLU, no norm, no SN)
  encoders:  4x ResidualBlock3D stride (1,2,2) (frames preserved, spatial /2)
             32->64->128->256->512, BN, no SN
  resblocks: 2x ResidualBlock3D 512->512, BN, SN
  decoders:  per-frame nearest upsample to the skip's (H, W), concat skip
             (1.5x channels), ResidualBlock3D -> half channels, BN, SN
  pred:      ConvLayer3D(32 -> out, k1, activation) + activation

Tensors are (B, L, H, W, C); the frame axis L is the conv depth dim.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from v2ce_toolbox_tpu.models.layers import (
    ConvLayer3D,
    DecoderResidualBlock3D,
    ResidualBlock3D,
    SplitInputResidualBlock3D,
    upsample_nearest_to,
)


class UNet3D(nn.Module):
    num_input_channels: int = 2
    num_output_channels: int = 20
    skip_type: str = "concat"          # 'concat' | 'sum'
    activation: str = "relu"
    num_encoders: int = 4
    base_num_channels: int = 32
    num_residual_blocks: int = 2
    norm: Optional[str] = "BN"
    sn: bool = True
    compute_dtype: jnp.dtype = jnp.float32
    remat: bool = False
    conv_impl: str = "xla"
    subpixel_decoder: bool = False
    subpixel_impl: str = "pfold"
    subpixel_blocks: int = -1          # last N decoder blocks; -1 = all
    decoder_split: bool = False
    out_layout: str = "cl"             # 'cl' | 'cm' (see ModelConfig)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cd = self.compute_dtype
        ci = self.conv_impl
        base = self.base_num_channels
        max_ch = base * (2 ** self.num_encoders)

        # Rematerialization: recompute block activations in the backward
        # pass instead of storing them — trades ~1/3 more FLOPs for O(depth)
        # less activation memory, the standard TPU trick for training at
        # full 260x346x16 resolution (HBM is the constraint, not FLOPs).
        Block = (nn.remat(ResidualBlock3D, static_argnums=(2,))
                 if self.remat else ResidualBlock3D)

        x = ConvLayer3D(name="head", features=base, kernel_size=3,
                        stride=(1, 1, 1), padding=1, activation="LeakyReLU",
                        norm=None, sn=False, compute_dtype=cd)(x, train=train)

        skips = []
        for i in range(self.num_encoders):
            skips.append(x)
            x = Block(name=f"encoder_{i}",
                      features=base * (2 ** (i + 1)),
                      stride=(1, 2, 2), norm=self.norm, sn=False,
                      compute_dtype=cd, conv_impl=ci)(x, train)

        for i in range(self.num_residual_blocks):
            x = Block(name=f"resblock_{i}", features=max_ch,
                      stride=(1, 1, 1), norm=self.norm, sn=self.sn,
                      compute_dtype=cd, conv_impl=ci)(x, train)

        DecBlock = (nn.remat(DecoderResidualBlock3D, static_argnums=(3,))
                    if self.remat else DecoderResidualBlock3D)
        n_dec = len(skips)
        for i, skip in enumerate(reversed(skips)):
            th, tw = skip.shape[2], skip.shape[3]
            sp_block = (self.subpixel_blocks < 0
                        or i >= n_dec - self.subpixel_blocks)
            if (self.subpixel_decoder and sp_block
                    and self.skip_type == "concat"
                    and th in (2 * x.shape[2], 2 * x.shape[2] - 1)
                    and tw in (2 * x.shape[3], 2 * x.shape[3] - 1)):
                # sub-pixel decoder: conv1/projection computed on the
                # coarse grid (exact rewrite, 4/9 FLOPs on the upsampled
                # branch); parameter tree identical to the concat block
                x = DecBlock(name=f"decoder_{i}",
                             features=max_ch // (2 ** (i + 1)),
                             norm=self.norm, sn=self.sn,
                             compute_dtype=cd, conv_impl=ci,
                             subpixel_impl=self.subpixel_impl)(x, skip, train)
                continue
            x = upsample_nearest_to(x, (th, tw))
            if self.skip_type != "concat":
                x = x + skip
                x = Block(name=f"decoder_{i}",
                          features=max_ch // (2 ** (i + 1)),
                          stride=(1, 1, 1), norm=self.norm, sn=self.sn,
                          compute_dtype=cd, conv_impl=ci)(x, train)
            elif self.decoder_split:
                SBlock = (nn.remat(SplitInputResidualBlock3D,
                                   static_argnums=(3,))
                          if self.remat else SplitInputResidualBlock3D)
                x = SBlock(name=f"decoder_{i}",
                           features=max_ch // (2 ** (i + 1)),
                           norm=self.norm, sn=self.sn,
                           compute_dtype=cd, conv_impl=ci)(x, skip, train)
            else:
                x = jnp.concatenate([x, skip], axis=-1)
                x = Block(name=f"decoder_{i}",
                          features=max_ch // (2 ** (i + 1)),
                          stride=(1, 1, 1), norm=self.norm, sn=self.sn,
                          compute_dtype=cd, conv_impl=ci)(x, train)

        if self.out_layout == "cm":
            # channel-major prediction: (B, L, C, H, W) out, W-minor
            # layout — the stage-2 sampler's input layout, replacing the
            # driver's out-of-jit transpose of a lane-sparse (.., 20)
            # tensor (see ModelConfig.out_layout)
            x = jnp.transpose(x, (0, 1, 4, 2, 3))
            return ConvLayer3D(name="pred",
                               features=self.num_output_channels,
                               kernel_size=1, stride=(1, 1, 1), padding=0,
                               activation=self.activation, norm=None,
                               sn=False, compute_dtype=cd,
                               channel_major=True)(x, train=train)
        x = ConvLayer3D(name="pred", features=self.num_output_channels,
                        kernel_size=1, stride=(1, 1, 1), padding=0,
                        activation=self.activation, norm=None, sn=False,
                        compute_dtype=cd)(x, train=train)
        return x
