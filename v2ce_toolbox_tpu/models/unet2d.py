"""2D UNet variant and its per-frame V2CE wrapper.

Parity targets:
- UNet (reference: scripts/unet_2layer.py:25-200): ResidualBlock head,
  stride-2 residual encoders, SN resblocks/decoders, optional multiscale
  ("multi") prediction heads whose outputs are concatenated back into the
  decoder stream.
- V2ce (reference: train/scripts/model/v2ce.py:11-44): folds the frame axis
  into the batch and runs the 2D UNet per frame.

Channels-last (B, H, W, C); 2D ResidualBlock reuses the 3D block semantics
with 2D convs (reference: scripts/submodules.py:166-214).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from v2ce_toolbox_tpu.models.layers import BatchNorm, Conv, SNConv, _activation


class ResidualBlock2D(nn.Module):
    features: int
    stride: int = 1
    norm: Optional[str] = None
    sn: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        use_bias = self.norm != "BN"
        conv_cls = SNConv if self.sn else Conv
        s = (self.stride, self.stride)
        pad1 = ((1, 1), (1, 1))

        out = conv_cls(name="conv1", features=self.features, kernel_size=(3, 3),
                       strides=s, padding=pad1, use_bias=use_bias,
                       compute_dtype=self.compute_dtype)(x)
        if self.norm in ("BN", "IN"):
            out = BatchNorm(name="bn1")(out, train=train)
        out = jax.nn.relu(out)
        out = conv_cls(name="conv2", features=self.features, kernel_size=(3, 3),
                       strides=(1, 1), padding=pad1, use_bias=use_bias,
                       compute_dtype=self.compute_dtype)(out)
        if self.norm in ("BN", "IN"):
            out = BatchNorm(name="bn2")(out, train=train)

        # Always-on projection shortcut — the reference's `stride == 1` guard
        # compares a tuple to an int and never fires (reference:
        # submodules.py:170,194-197); see ResidualBlock3D in layers.py.
        residual = Conv(name="downsample_conv", features=self.features,
                        kernel_size=(1, 1), strides=s, padding=((0, 0),) * 2,
                        use_bias=True, compute_dtype=self.compute_dtype)(x)
        residual = BatchNorm(name="downsample_bn")(residual, train=train)
        return jax.nn.relu(out + residual)


class ConvLayer2D(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    activation: Optional[str] = "LeakyReLU"
    norm: Optional[str] = None
    sn: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        use_bias = self.norm != "BN"
        conv_cls = SNConv if self.sn else Conv
        out = conv_cls(name="conv", features=self.features,
                       kernel_size=(self.kernel_size,) * 2,
                       strides=(self.stride,) * 2,
                       padding=((self.padding, self.padding),) * 2,
                       use_bias=use_bias, compute_dtype=self.compute_dtype)(x)
        if self.norm == "BN":
            out = BatchNorm(torch_momentum=0.01, name="norm")(out, train=train)
        act = _activation(self.activation)
        if act is not None:
            out = act(out)
        return out


def _upsample2d_nearest_to(x: jax.Array, target_hw) -> jax.Array:
    """(B, H, W, C) nearest upsample, torch floor(dst*in/out) convention;
    2x / 2x-1 targets use the repeat-broadcast fast path (see the 3D twin
    in layers.upsample_nearest_to)."""
    th, tw = target_hw
    b, h, w, c = x.shape
    if th in (2 * h, 2 * h - 1) and tw in (2 * w, 2 * w - 1):
        y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
        return y.reshape(b, 2 * h, 2 * w, c)[:, :th, :tw]
    hi = (jnp.arange(th) * h) // th
    wi = (jnp.arange(tw) * w) // tw
    return x[:, hi][:, :, wi]


class UNet2D(nn.Module):
    num_input_channels: int = 2
    num_output_channels: int = 20
    skip_type: str = "concat"
    activation: str = "relu"
    num_encoders: int = 4
    base_num_channels: int = 32
    num_residual_blocks: int = 2
    norm: Optional[str] = "BN"
    sn: bool = True
    multi: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        cd = self.compute_dtype
        base = self.base_num_channels
        max_ch = base * (2 ** self.num_encoders)

        x = ResidualBlock2D(name="head", features=base, stride=1,
                            norm=None, sn=False, compute_dtype=cd)(x, train=train)

        skips = []
        for i in range(self.num_encoders):
            skips.append(x)
            x = ResidualBlock2D(name=f"encoder_{i}",
                                features=base * (2 ** (i + 1)), stride=2,
                                norm=self.norm, sn=False,
                                compute_dtype=cd)(x, train=train)

        for i in range(self.num_residual_blocks):
            x = ResidualBlock2D(name=f"resblock_{i}", features=max_ch,
                                norm=self.norm, sn=self.sn,
                                compute_dtype=cd)(x, train=train)

        all_pred = []
        for i, skip in enumerate(reversed(skips)):
            x = _upsample2d_nearest_to(x, (skip.shape[1], skip.shape[2]))
            if self.skip_type == "concat":
                x = jnp.concatenate([x, skip], axis=-1)
            else:
                x = x + skip
            x = ResidualBlock2D(name=f"decoder_{i}",
                                features=max_ch // (2 ** (i + 1)),
                                norm=self.norm, sn=self.sn,
                                compute_dtype=cd)(x, train=train)
            if self.multi:
                pred = ConvLayer2D(name=f"pred_{i}",
                                   features=self.num_output_channels,
                                   kernel_size=1, padding=0, norm=None,
                                   sn=False, activation=self.activation,
                                   compute_dtype=cd)(x, train=train)
                all_pred.append(pred)
                if self.skip_type == "concat":
                    x = jnp.concatenate([x, pred], axis=-1)
                else:
                    x = x + pred

        if self.multi:
            return all_pred
        return ConvLayer2D(name="pred", features=self.num_output_channels,
                           kernel_size=1, padding=0, norm=None, sn=False,
                           activation=self.activation,
                           compute_dtype=cd)(x, train=train)


class V2ce2d(nn.Module):
    """Per-frame 2D variant (reference: train/scripts/model/v2ce.py:11-44)."""

    in_channels: int = 2
    out_channels: int = 20
    unet_multi: bool = True
    real_multi_out: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_units: jax.Array, train: bool = False):
        # image_units: (B, L, H, W, C) -> fold frames into batch
        b, l, h, w, c = image_units.shape
        x = image_units.reshape(b * l, h, w, c)
        out = UNet2D(name="unet", num_input_channels=self.in_channels,
                     num_output_channels=self.out_channels,
                     skip_type="concat", activation="relu", num_encoders=4,
                     base_num_channels=32, num_residual_blocks=2, norm="BN",
                     sn=True, multi=self.unet_multi,
                     compute_dtype=self.compute_dtype)(x, train=train)
        if self.unet_multi:
            if self.real_multi_out:
                return [v.reshape(b, l, h, w, self.out_channels) for v in out]
            out = out[-1]
        return out.reshape(b, l, h, w, self.out_channels)
