"""Building-block layers for the V2CE stage-1 models, in flax.linen.

TPU-first design notes
----------------------
- All tensors are channels-last: 3D feature maps are (B, L, H, W, C) with the
  frame axis L acting as the conv "depth" dimension. XLA tiles channels-last
  convs straight onto the MXU; the reference's NCDHW torch layout
  (reference: scripts/submodules.py:85-124) is never materialized.
- Spectral norm follows the reference's module-wrapper semantics
  (reference: scripts/spectral_norm.py:19-31,62-64): ONE power iteration from
  the stored (u, v) on every forward, sigma computed with the *updated*
  vectors. In training mode the updated vectors are written back into the
  'sn' variable collection; in inference the iteration still runs (it is a
  couple of tiny matvecs) but nothing mutates, which reproduces the torch
  model's first eval forward bit-for-bit given converted weights.
- BatchNorm keeps torch conventions: epsilon 1e-5; flax momentum is
  (1 - torch_momentum). ConvLayer3D uses torch momentum 0.01
  (reference: scripts/submodules.py:111) and ResidualBlock3D uses the torch
  default 0.1 (reference: scripts/submodules.py:230).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype


def _apply_conv(x: jax.Array, kernel: jax.Array, strides, padding,
                compute_dtype, conv_impl: str) -> jax.Array:
    """Product conv path: the native XLA lowering, in compute_dtype with an
    f32 output. Every algebraic/Mosaic rewrite that was measured against it
    (fold/d2/d2s/wpack/pallas — all in-model losers, PERF.md rounds 2-4)
    plus the knockout-profiling backend lives in ops/research.dispatch_conv,
    reachable only by explicitly configuring a non-'xla' conv_impl
    (tools/perf_probe.py and the rewrite parity tests do)."""
    if conv_impl != "xla":
        from v2ce_toolbox_tpu.ops.research import dispatch_conv

        return dispatch_conv(x, kernel, strides, padding, compute_dtype,
                             conv_impl)
    ndim_sp = kernel.ndim - 2
    dn_in = "N" + "DHW"[3 - ndim_sp:] + "C"
    dn_k = "DHW"[3 - ndim_sp:] + "IO"
    return jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        kernel.astype(compute_dtype),
        window_strides=strides,
        padding=list(padding),
        dimension_numbers=(dn_in, dn_k, dn_in),
        preferred_element_type=jnp.float32,
    )


def _l2normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    # reference: scripts/spectral_norm.py:5-6
    return v / (jnp.linalg.norm(v) + eps)


def _kaiming_normal_conv_init(gain_a: float = 10.0):
    """Kaiming-normal init with the reference's a=10 leaky slope
    (reference: scripts/unet_2layer.py:255-261 uses
    nn.init.kaiming_normal_(w, 10.)), i.e. std = gain / sqrt(fan_in) with
    gain = sqrt(2 / (1 + a^2))."""

    def init(key, shape, dtype=jnp.float32):
        # shape: (*spatial, in_ch, out_ch); fan_in = in_ch * prod(spatial)
        receptive = math.prod(shape[:-2])
        fan_in = shape[-2] * receptive
        gain = math.sqrt(2.0 / (1.0 + gain_a ** 2))
        std = gain / math.sqrt(fan_in)
        return std * jax.random.normal(key, shape, dtype)

    return init


class SNConv(nn.Module):
    """Conv (any spatial rank) with the reference's custom spectral norm.

    Stores `kernel_bar` as the trainable parameter and (u, v) power-iteration
    vectors in the 'sn' collection, flattened in the torch (O, I, *spatial)
    order so converted checkpoints iterate over the exact same matrix.
    """

    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...]
    padding: Sequence[Tuple[int, int]]
    use_bias: bool = True
    compute_dtype: Dtype = jnp.float32
    conv_impl: str = "xla"
    channel_major: bool = False        # not supported on the SN path

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert not self.channel_major, "SNConv is channels-last only"
        in_ch = x.shape[-1]
        kshape = (*self.kernel_size, in_ch, self.features)
        kernel_bar = self.param("kernel_bar", _kaiming_normal_conv_init(), kshape)

        out_dim = self.features
        flat_dim = in_ch * math.prod(self.kernel_size)
        u_var = self.variable(
            "sn", "u",
            lambda: _l2normalize(jax.random.normal(
                self.make_rng("params") if self.has_rng("params") else jax.random.key(0),
                (out_dim,))))
        v_var = self.variable(
            "sn", "v",
            lambda: _l2normalize(jax.random.normal(
                self.make_rng("params") if self.has_rng("params") else jax.random.key(1),
                (flat_dim,))))

        # torch layout (O, I, *spatial) flattening (reference:
        # scripts/spectral_norm.py:26-30). kernel_bar is (*spatial, I, O).
        ndim_sp = len(self.kernel_size)
        perm = (ndim_sp + 1, ndim_sp) + tuple(range(ndim_sp))
        w2d = jnp.transpose(kernel_bar, perm).reshape(out_dim, flat_dim)
        w2d = w2d.astype(jnp.float32)

        v = _l2normalize(w2d.T @ u_var.value)
        u = _l2normalize(w2d @ v)
        sigma = u @ (w2d @ v)

        if not self.is_initializing() and self.is_mutable_collection("sn"):
            u_var.value = u
            v_var.value = v

        kernel = kernel_bar / sigma

        y = _apply_conv(x, kernel, self.strides, self.padding,
                        self.compute_dtype, self.conv_impl)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


class Conv(nn.Module):
    """Plain conv with torch-compatible explicit padding and kaiming-a10 init."""

    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...]
    padding: Sequence[Tuple[int, int]]
    use_bias: bool = True
    compute_dtype: Dtype = jnp.float32
    conv_impl: str = "xla"
    channel_major: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[2] if self.channel_major else x.shape[-1]
        kshape = (*self.kernel_size, in_ch, self.features)
        kernel = self.param("kernel", _kaiming_normal_conv_init(), kshape)
        if self.channel_major:
            y = jax.lax.conv_general_dilated(
                x.astype(self.compute_dtype),
                kernel.astype(self.compute_dtype),
                window_strides=self.strides, padding=list(self.padding),
                dimension_numbers=("NDCHW", "DHWIO", "NDCHW"),
                preferred_element_type=jnp.float32)
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,))
                y = y + bias[None, None, :, None, None]
            return y
        y = _apply_conv(x, kernel, self.strides, self.padding,
                        self.compute_dtype, self.conv_impl)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


def _activation(name: Optional[str]):
    """Resolve the reference's activation names (reference:
    scripts/submodules.py:100-105: 'LeakyReLU' -> nn.LeakyReLU() with torch
    default slope 0.01; anything else -> getattr(torch, name))."""
    if name is None:
        return None
    if name == "LeakyReLU":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.01)
    if name == "relu":
        return jax.nn.relu
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "tanh":
        return jnp.tanh
    raise ValueError(f"unknown activation {name!r}")


class BatchNorm(nn.Module):
    """Torch-convention BatchNorm over the channel (last) axis.

    compute_dtype controls the OUTPUT/activation dtype: with bf16 the whole
    network's stored activations halve in size (the model is HBM-bound on
    TPU — f32 activations between bf16 convs erase the bf16 win). Params
    and running stats stay float32."""

    torch_momentum: float = 0.1
    epsilon: float = 1e-5
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bn = nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.torch_momentum,
            epsilon=self.epsilon,
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name="bn",
        )
        return bn(x)


class ConvLayer3D(nn.Module):
    """conv3d + optional BN + optional activation
    (reference: scripts/submodules.py:85-124).

    channel_major=True takes/returns (B, L, C, H, W) tensors, running the
    conv with NDCHW dimension numbers — used for the 'cm' out_layout pred
    head, where a channels-minor (.., 20) f32 output would pad 6.4x under
    the TPU's (8,128) tiling while W-minor pads only 346->384."""

    features: int
    kernel_size: int = 3
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: int = 0
    activation: Optional[str] = "LeakyReLU"
    norm: Optional[str] = None
    sn: bool = False
    compute_dtype: Dtype = jnp.float32
    conv_impl: str = "xla"
    channel_major: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        use_bias = self.norm != "BN"   # reference: submodules.py:95
        k = (self.kernel_size,) * 3
        pad = ((self.padding, self.padding),) * 3
        conv_cls = SNConv if self.sn else Conv
        kw = dict(features=self.features, kernel_size=k, strides=self.stride,
                  padding=pad, use_bias=use_bias, compute_dtype=self.compute_dtype,
                  conv_impl=self.conv_impl, channel_major=self.channel_major)
        out = conv_cls(name="conv", **kw)(x)
        if self.norm == "BN":
            # reference: submodules.py:111 — BatchNorm3d(momentum=0.01)
            assert not self.channel_major, "BN expects channels-last"
            out = BatchNorm(torch_momentum=0.01, name="norm",
                            compute_dtype=self.compute_dtype)(out, train=train)
        act = _activation(self.activation)
        if act is not None:
            out = act(out)
        return out


class ResidualBlock3D(nn.Module):
    """conv-bn-relu-conv-bn + projection shortcut
    (reference: scripts/submodules.py:216-264)."""

    features: int
    stride: Tuple[int, int, int] = (1, 1, 1)
    norm: Optional[str] = None
    sn: bool = False
    compute_dtype: Dtype = jnp.float32
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        use_bias = self.norm != "BN"
        conv_cls = SNConv if self.sn else Conv
        pad1 = ((1, 1), (1, 1), (1, 1))

        out = conv_cls(name="conv1", features=self.features, kernel_size=(3, 3, 3),
                       strides=self.stride, padding=pad1, use_bias=use_bias,
                       compute_dtype=self.compute_dtype,
                       conv_impl=self.conv_impl)(x)
        if self.norm in ("BN", "IN"):
            out = BatchNorm(name="bn1",
                            compute_dtype=self.compute_dtype)(out, train=train)
        out = jax.nn.relu(out)
        out = conv_cls(name="conv2", features=self.features, kernel_size=(3, 3, 3),
                       strides=(1, 1, 1), padding=pad1, use_bias=use_bias,
                       compute_dtype=self.compute_dtype,
                       conv_impl=self.conv_impl)(out)
        if self.norm in ("BN", "IN"):
            out = BatchNorm(name="bn2",
                            compute_dtype=self.compute_dtype)(out, train=train)

        # Projection path: 1x1x1 conv (bias=True — torch Conv3d default)
        # followed by an unconditional BatchNorm. The reference guards this
        # with `not (stride == 1 and in==out)`, but stride has already been
        # normalized to a tuple there, so `stride == 1` is always False and
        # EVERY block gets the projection — including the identity-shaped
        # bottleneck resblocks (reference: submodules.py:220,244-247).
        residual = Conv(name="downsample_conv", features=self.features,
                        kernel_size=(1, 1, 1), strides=self.stride,
                        padding=((0, 0),) * 3, use_bias=True,
                        compute_dtype=self.compute_dtype)(x)
        residual = BatchNorm(name="downsample_bn",
                             compute_dtype=self.compute_dtype)(residual,
                                                               train=train)

        return jax.nn.relu(out + residual)


class SplitInputResidualBlock3D(nn.Module):
    """ResidualBlock3D over concat(up, skip) WITHOUT materializing the
    concat: conv1 and the projection distribute over the channel concat,
    so each runs as two convs (kernel sliced at up's channel count) summed.

    The trace_attrib profile (round 3) shows the decoder concats cost
    ~5.8 ms/window in relayout/materialization at 260x346 — this block
    removes them at the price of float reassociation only. Parameter tree
    is identical to ResidualBlock3D on the concat input, so converted
    reference weights (scripts/unet_2layer.py:355-371) load unchanged."""

    features: int
    norm: Optional[str] = None
    sn: bool = False
    compute_dtype: Dtype = jnp.float32
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, up: jax.Array, skip: jax.Array,
                 train: bool = False) -> jax.Array:
        up_c = up.shape[-1]
        in_ch = up_c + skip.shape[-1]
        use_bias = self.norm != "BN"
        cd = self.compute_dtype
        pad1 = ((1, 1), (1, 1), (1, 1))

        kernel_cls = _SNKernel if self.sn else _ConvKernel
        k1, bias1 = kernel_cls(name="conv1", features=self.features,
                               kernel_size=(3, 3, 3), in_channels=in_ch,
                               use_bias=use_bias)()
        out = _apply_conv(up, k1[..., :up_c, :], (1, 1, 1), pad1, cd,
                          self.conv_impl)
        out = out + _apply_conv(skip, k1[..., up_c:, :], (1, 1, 1), pad1,
                                cd, self.conv_impl)
        if use_bias:
            out = out + bias1
        if self.norm in ("BN", "IN"):
            out = BatchNorm(name="bn1", compute_dtype=cd)(out, train=train)
        out = jax.nn.relu(out)

        conv_cls = SNConv if self.sn else Conv
        out = conv_cls(name="conv2", features=self.features,
                       kernel_size=(3, 3, 3), strides=(1, 1, 1),
                       padding=pad1, use_bias=use_bias, compute_dtype=cd,
                       conv_impl=self.conv_impl)(out)
        if self.norm in ("BN", "IN"):
            out = BatchNorm(name="bn2", compute_dtype=cd)(out, train=train)

        kd, bias_d = _ConvKernel(name="downsample_conv",
                                 features=self.features,
                                 kernel_size=(1, 1, 1), in_channels=in_ch,
                                 use_bias=True)()
        residual = _apply_conv(up, kd[..., :up_c, :], (1, 1, 1),
                               ((0, 0),) * 3, cd, "xla")
        residual = residual + _apply_conv(skip, kd[..., up_c:, :], (1, 1, 1),
                                          ((0, 0),) * 3, cd, "xla") + bias_d
        residual = BatchNorm(name="downsample_bn",
                             compute_dtype=cd)(residual, train=train)

        return jax.nn.relu(out + residual)


class _SNKernel(nn.Module):
    """Parameter-compatible twin of SNConv that RETURNS the spectrally
    normalized kernel instead of applying it (same param/variable names:
    kernel_bar + sn/{u,v}, same one-power-iteration semantics), for blocks
    that apply the kernel through a custom algebraic path
    (DecoderResidualBlock3D's sub-pixel split)."""

    features: int
    kernel_size: Tuple[int, ...]
    in_channels: int
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        in_ch = self.in_channels
        kshape = (*self.kernel_size, in_ch, self.features)
        kernel_bar = self.param("kernel_bar", _kaiming_normal_conv_init(),
                                kshape)
        out_dim = self.features
        flat_dim = in_ch * math.prod(self.kernel_size)
        u_var = self.variable(
            "sn", "u",
            lambda: _l2normalize(jax.random.normal(
                self.make_rng("params") if self.has_rng("params")
                else jax.random.key(0), (out_dim,))))
        v_var = self.variable(
            "sn", "v",
            lambda: _l2normalize(jax.random.normal(
                self.make_rng("params") if self.has_rng("params")
                else jax.random.key(1), (flat_dim,))))

        ndim_sp = len(self.kernel_size)
        perm = (ndim_sp + 1, ndim_sp) + tuple(range(ndim_sp))
        w2d = jnp.transpose(kernel_bar, perm).reshape(out_dim, flat_dim)
        w2d = w2d.astype(jnp.float32)
        v = _l2normalize(w2d.T @ u_var.value)
        u = _l2normalize(w2d @ v)
        sigma = u @ (w2d @ v)
        if not self.is_initializing() and self.is_mutable_collection("sn"):
            u_var.value = u
            v_var.value = v
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return kernel_bar / sigma, bias


class _ConvKernel(nn.Module):
    """Parameter-compatible twin of Conv returning (kernel, bias)."""

    features: int
    kernel_size: Tuple[int, ...]
    in_channels: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kshape = (*self.kernel_size, self.in_channels, self.features)
        kernel = self.param("kernel", _kaiming_normal_conv_init(), kshape)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return kernel, bias


class DecoderResidualBlock3D(nn.Module):
    """ResidualBlock3D over concat(nearest_up2(coarse), skip), computed
    WITHOUT materializing the upsampled tensor: conv1 and the projection
    split across the concat (conv distributes over channel concat) and
    their upsampled-branch halves run on the coarse grid with folded
    sub-pixel kernels — 4/9 the FLOPs of that branch, exact to float
    reassociation (ops/subpixel.py). Parameter tree is identical to
    ResidualBlock3D on the concat input, so converted reference weights
    (scripts/unet_2layer.py:355-371 decoders) load unchanged."""

    features: int
    norm: Optional[str] = None
    sn: bool = False
    compute_dtype: Dtype = jnp.float32
    conv_impl: str = "xla"
    subpixel_impl: str = "split"   # 'split' | 'wfold' | 'pfold' | 'pallas'

    @nn.compact
    def __call__(self, coarse: jax.Array, skip: jax.Array,
                 train: bool = False) -> jax.Array:
        from v2ce_toolbox_tpu.ops.subpixel import (
            conv1x1_on_nearest_up2,
            conv3d_on_nearest_up2,
            conv3d_on_nearest_up2_pfold,
            conv3d_on_nearest_up2_wfold,
        )

        up_c = coarse.shape[-1]
        in_ch = up_c + skip.shape[-1]
        target_hw = (skip.shape[2], skip.shape[3])
        use_bias = self.norm != "BN"
        cd = self.compute_dtype

        kernel_cls = _SNKernel if self.sn else _ConvKernel
        k1, bias1 = kernel_cls(name="conv1", features=self.features,
                               kernel_size=(3, 3, 3), in_channels=in_ch,
                               use_bias=use_bias)()
        k1 = k1.astype(cd)

        kd, bias_d = _ConvKernel(name="downsample_conv",
                                 features=self.features,
                                 kernel_size=(1, 1, 1), in_channels=in_ch,
                                 use_bias=True)()
        kd = kd.astype(cd)
        fused_residual = None
        if self.subpixel_impl == "pallas":
            # fused Pallas kernel: up + concat + conv1 on the coarse grid;
            # the residual projection rides the same dots when its N lanes
            # fit (Co <= 32). Forward-only (guarded in train/step.py).
            from v2ce_toolbox_tpu.ops.decoder_pallas import (
                fused_up_concat_conv)
            if 4 * self.features <= 128:
                out, fused_residual = fused_up_concat_conv(
                    coarse.astype(cd), skip.astype(cd), k1, kd,
                    out_dtype=cd)
            else:
                out = fused_up_concat_conv(
                    coarse.astype(cd), skip.astype(cd), k1, out_dtype=cd)
        else:
            conv_up = {
                "split": conv3d_on_nearest_up2,
                "wfold": conv3d_on_nearest_up2_wfold,
                "pfold": conv3d_on_nearest_up2_pfold}[self.subpixel_impl]
            out = conv_up(coarse.astype(cd), k1[..., :up_c, :], target_hw)
            out = out + _apply_conv(skip, k1[..., up_c:, :], (1, 1, 1),
                                    ((1, 1),) * 3, cd, self.conv_impl)
        if use_bias:
            out = out + bias1
        if self.norm in ("BN", "IN"):
            out = BatchNorm(name="bn1", compute_dtype=cd)(out, train=train)
        out = jax.nn.relu(out)

        conv_cls = SNConv if self.sn else Conv
        out = conv_cls(name="conv2", features=self.features,
                       kernel_size=(3, 3, 3), strides=(1, 1, 1),
                       padding=((1, 1),) * 3, use_bias=use_bias,
                       compute_dtype=cd, conv_impl=self.conv_impl)(out)
        if self.norm in ("BN", "IN"):
            out = BatchNorm(name="bn2", compute_dtype=cd)(out, train=train)

        if fused_residual is not None:
            residual = fused_residual + bias_d
        else:
            residual = conv1x1_on_nearest_up2(coarse.astype(cd),
                                              kd[..., :up_c, :], target_hw)
            residual = residual + jax.lax.conv_general_dilated(
                skip.astype(cd), kd[..., up_c:, :], (1, 1, 1),
                ((0, 0),) * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32) + bias_d
        residual = BatchNorm(name="downsample_bn",
                             compute_dtype=cd)(residual, train=train)

        return jax.nn.relu(out + residual)


def upsample_nearest_to(x: jax.Array, target_hw: Tuple[int, int]) -> jax.Array:
    """Nearest-neighbor upsample of (B, L, H, W, C) to a target (H, W) using
    torch's F.interpolate index convention src = floor(dst * in / out)
    (reference: scripts/unet_2layer.py:358-362). jax.image.resize uses
    pixel-center sampling which differs for odd sizes like 260/346.

    UNet decoder targets are always 2*in or 2*in - 1 (skip sizes come from
    repeated ceil-halving); for those, floor(dst*in/out) == floor(dst/2)
    for every dst in range, so the upsample is an exact repeat-2 broadcast
    truncated to the target — a pure relayout XLA fuses, instead of a
    gather (13x slower on TPU at these activation sizes). Other ratios
    fall back to the explicit-index gather."""
    th, tw = target_hw
    b, l, h, w, c = x.shape

    def axis_fast(size, target):
        return target in (2 * size, 2 * size - 1)

    if axis_fast(h, th) and axis_fast(w, tw):
        y = jnp.broadcast_to(x[:, :, :, None, :, None, :],
                             (b, l, h, 2, w, 2, c))
        y = y.reshape(b, l, 2 * h, 2 * w, c)
        return y[:, :, :th, :tw]

    hi = (jnp.arange(th) * h) // th
    wi = (jnp.arange(tw) * w) // tw
    return x[:, :, hi][:, :, :, wi]
