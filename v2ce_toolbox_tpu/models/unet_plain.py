"""Plain-conv UNet variants (non-residual twin of unet3d/unet2d).

Flax equivalents of the reference's `train/scripts/model/unet.py`: same
encoder/decoder skeleton as unet_2layer but with plain ConvLayer encoders
and decoders instead of residual blocks (unet.py:256-269, 290-308), an
optional `multi` mode that attaches a prediction head after every decoder
and feeds the prediction back via the skip connection (unet.py:310-323,
352-360), and `sum` as the default skip type (unet.py:195).
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from v2ce_toolbox_tpu.models.layers import (
    ConvLayer3D,
    ResidualBlock3D,
    upsample_nearest_to,
)


class UNetPlain3D(nn.Module):
    num_input_channels: int = 160
    num_output_channels: int = 16
    skip_type: str = "sum"             # reference default (unet.py:195)
    activation: Optional[str] = "sigmoid"
    num_encoders: int = 4
    base_num_channels: int = 32
    num_residual_blocks: int = 2
    norm: Optional[str] = None
    sn: bool = False
    multi: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    def _skip(self, x, skip):
        if self.skip_type == "sum":
            return x + skip
        return jnp.concatenate([x, skip], axis=-1)

    @nn.compact
    def __call__(self, x: jax.Array,
                 train: bool = False) -> Union[jax.Array, List[jax.Array]]:
        cd = self.compute_dtype
        base = self.base_num_channels
        max_ch = base * (2 ** self.num_encoders)

        x = ConvLayer3D(name="head", features=base, kernel_size=3,
                        stride=(1, 1, 1), padding=1, activation="LeakyReLU",
                        norm=None, sn=False, compute_dtype=cd)(x, train=train)

        skips = []
        for i in range(self.num_encoders):
            skips.append(x)
            # plain conv encoder, stride (1,2,2) (unet.py:266-268)
            x = ConvLayer3D(name=f"encoder_{i}",
                            features=base * (2 ** (i + 1)), kernel_size=3,
                            stride=(1, 2, 2), padding=1,
                            activation="LeakyReLU", norm=self.norm,
                            sn=False, compute_dtype=cd)(x, train=train)

        for i in range(self.num_residual_blocks):
            x = ResidualBlock3D(name=f"resblock_{i}", features=max_ch,
                                stride=(1, 1, 1), norm=self.norm, sn=self.sn,
                                compute_dtype=cd)(x, train=train)

        all_pred: List[jax.Array] = []
        for i, skip in enumerate(reversed(skips)):
            x = upsample_nearest_to(x, (skip.shape[2], skip.shape[3]))
            x = self._skip(x, skip)
            x = ConvLayer3D(name=f"decoder_{i}",
                            features=max_ch // (2 ** (i + 1)), kernel_size=3,
                            stride=(1, 1, 1), padding=1,
                            activation="LeakyReLU", norm=self.norm,
                            sn=self.sn, compute_dtype=cd)(x, train=train)
            if self.multi:
                pred_i = ConvLayer3D(name=f"pred_{i}",
                                     features=self.num_output_channels,
                                     kernel_size=1, stride=(1, 1, 1),
                                     padding=0, activation=self.activation,
                                     norm=None, sn=False,
                                     compute_dtype=cd)(x, train=train)
                all_pred.append(pred_i)
                x = self._skip(x, pred_i) if self.skip_type == "sum" else \
                    jnp.concatenate([x, pred_i], axis=-1)

        if self.multi:
            return all_pred

        return ConvLayer3D(name="pred", features=self.num_output_channels,
                           kernel_size=1, stride=(1, 1, 1), padding=0,
                           activation=self.activation, norm=None, sn=False,
                           compute_dtype=cd)(x, train=train)
