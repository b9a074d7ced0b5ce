"""FastFlowNet — coarse-to-fine optical flow, in flax.

Architecture port of the reference's flow network
(reference: train/scripts/utils/fastflownet.py:19-169), whose CUDA
correlation extension is replaced by the Pallas/jnp cost volume
(ops/correlation.py). Used by the offline data pipeline to attach optical
flow to training packets; the reference's `fastflownet_ft_mix.pth`
checkpoint is not shipped in the mirror, so this is random-init unless a
converted checkpoint is supplied (data/mvsec.farneback_flow is the
host-side fallback).

Structure: shared 3-level conv pyramid (16/32/64ch, each /2) extended by
avg-pools to 1/64; at each of 5 levels, a 53-tap dilated selection of the
81-tap cost volume between f1 and the flow-warped f2, concatenated with
reduced features and the upsampled coarser flow, decoded by grouped convs
with channel shuffle. Channels-last throughout.

Deviation: the 2x flow upsampling uses flax ConvTranspose with SAME
padding (torch's ConvTranspose2d(4,2,1) equivalent sizing); exact transpose
-conv weight conversion is only meaningful with released weights.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from v2ce_toolbox_tpu.ops.correlation import correlation_jnp

# 53 of the 81 correlation channels, dilated pattern
# (reference: fastflownet.py:72-80)
CORR_INDEX = np.array([
    0, 2, 4, 6, 8,
    10, 12, 14, 16,
    18, 20, 21, 22, 23, 24, 26,
    28, 29, 30, 31, 32, 33, 34,
    36, 38, 39, 40, 41, 42, 44,
    46, 47, 48, 49, 50, 51, 52,
    54, 56, 57, 58, 59, 60, 62,
    64, 66, 68, 70,
    72, 74, 76, 78, 80])


def _convrelu(feats, k=3, s=1, groups=1, name=None):
    return nn.Sequential([
        nn.Conv(feats, (k, k), (s, s), padding=((k // 2,) * 2,) * 2,
                feature_group_count=groups),
        lambda x: nn.leaky_relu(x, 0.1),
    ], name=name)


def _channel_shuffle(x: jax.Array, groups: int) -> jax.Array:
    """(N, H, W, C) channel shuffle (reference: fastflownet.py:33-39)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    return jnp.swapaxes(x, 3, 4).reshape(n, h, w, c)


def bilinear_warp(x: jax.Array, flow: jax.Array) -> jax.Array:
    """Warp (N, H, W, C) by (N, H, W, 2) pixel-space flow with bilinear
    sampling, zeros out of bounds (reference grid_sample warp,
    fastflownet.py:105-118)."""
    n, h, w, c = x.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=flow.dtype),
                          jnp.arange(w, dtype=flow.dtype), indexing="ij")
    sx = xx[None] + flow[..., 0]
    sy = yy[None] + flow[..., 1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0

    def gather(xi, yi):
        ok = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = jax.vmap(lambda img, yq, xq: img[yq, xq])(x, yi, xi)
        return vals * ok[..., None]

    return (gather(x0, y0) * ((1 - wx) * (1 - wy))[..., None]
            + gather(x0 + 1, y0) * (wx * (1 - wy))[..., None]
            + gather(x0, y0 + 1) * ((1 - wx) * wy)[..., None]
            + gather(x0 + 1, y0 + 1) * (wx * wy)[..., None])


class FlowDecoder(nn.Module):
    """87ch -> 2ch flow (reference: fastflownet.py:19-52)."""

    groups: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        g = self.groups
        x = _convrelu(96, name="conv1")(x)
        x = _channel_shuffle(_convrelu(96, groups=g, name="conv2")(x), g)
        x = _channel_shuffle(_convrelu(96, groups=g, name="conv3")(x), g)
        x = _channel_shuffle(_convrelu(96, groups=g, name="conv4")(x), g)
        x = _convrelu(64, name="conv5")(x)
        x = _convrelu(32, name="conv6")(x)
        return nn.Conv(2, (3, 3), padding=((1, 1), (1, 1)), name="conv7")(x)


class FastFlowNet(nn.Module):
    groups: int = 3

    @nn.compact
    def __call__(self, img_pair: jax.Array, train: bool = False):
        """img_pair: (N, H, W, 6) two stacked RGB frames, H, W % 64 == 0.
        Returns 1/4-res flow (N, H/4, W/4, 2); in train mode all 5 levels."""
        pyramid1 = nn.Sequential([_convrelu(16, s=2), _convrelu(16)],
                                 name="pconv1")
        pyramid2 = nn.Sequential([_convrelu(32, s=2), _convrelu(32),
                                  _convrelu(32)], name="pconv2")
        pyramid3 = nn.Sequential([_convrelu(64, s=2), _convrelu(64),
                                  _convrelu(64)], name="pconv3")

        def pool(x):
            return nn.avg_pool(x, (2, 2), (2, 2))

        f11 = pyramid1(img_pair[..., :3])
        f21 = pyramid1(img_pair[..., 3:6])
        f12, f22 = pyramid2(f11), pyramid2(f21)
        f13, f23 = pyramid3(f12), pyramid3(f22)
        f14, f24 = pool(f13), pool(f23)
        f15, f25 = pool(f14), pool(f24)
        f16, f26 = pool(f15), pool(f25)

        rconv = {lvl: _convrelu(32, name=f"rconv{lvl}")
                 for lvl in (2, 3, 4, 5, 6)}
        up = {lvl: nn.ConvTranspose(2, (4, 4), (2, 2), padding="SAME",
                                    name=f"up{lvl}")
              for lvl in (3, 4, 5, 6)}
        decoder = {lvl: FlowDecoder(self.groups, name=f"decoder{lvl}")
                   for lvl in (2, 3, 4, 5, 6)}

        idx = jnp.asarray(CORR_INDEX)

        def cv(f1, f2):
            return correlation_jnp(f1, f2, max_displacement=4)[..., idx]

        # level 6 (1/64)
        flow7_up = jnp.zeros((*f16.shape[:3], 2), f16.dtype)
        cat6 = jnp.concatenate([cv(f16, f26), rconv[6](f16), flow7_up], -1)
        flow6 = decoder[6](cat6)

        flows = {6: flow6}
        feats1 = {5: f15, 4: f14, 3: f13, 2: f12}
        feats2 = {5: f25, 4: f24, 3: f23, 2: f22}
        scale = {5: 0.625, 4: 1.25, 3: 2.5, 2: 5.0}
        for lvl in (5, 4, 3, 2):
            flow_up = up[lvl + 1](flows[lvl + 1])
            f2w = bilinear_warp(feats2[lvl], flow_up * scale[lvl])
            cat = jnp.concatenate(
                [cv(feats1[lvl], f2w), rconv[lvl](feats1[lvl]), flow_up], -1)
            flows[lvl] = decoder[lvl](cat) + flow_up

        if train:
            return tuple(flows[i] for i in (2, 3, 4, 5, 6))
        return flows[2]


class OpticalFlowCalculator:
    """Size-padding wrapper (reference: train/scripts/utils/optical_flow.py:
    20-116): pads H/W to multiples of div_size, runs the net, scales by
    div_flow, resizes flow back to input resolution."""

    def __init__(self, variables=None, div_flow: float = 20.0,
                 div_size: int = 64, rng: Optional[jax.Array] = None):
        self.net = FastFlowNet()
        self.div_flow = div_flow
        self.div_size = div_size
        if variables is None:
            dummy = jnp.zeros((1, div_size, div_size, 6), jnp.float32)
            variables = self.net.init(
                rng if rng is not None else jax.random.key(0), dummy)
        self.variables = variables

    def __call__(self, img1: jax.Array, img2: jax.Array) -> jax.Array:
        """(N, H, W, 3) pairs -> (N, H, W, 2) flow."""
        n, h, w, _ = img1.shape
        ph = -h % self.div_size
        pw = -w % self.div_size
        x = jnp.concatenate([img1, img2], axis=-1)
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        flow = self.net.apply(self.variables, x)        # 1/4 res
        flow = self.div_flow * flow
        # bilinear resize back to full resolution, scale vectors by 4
        flow = jax.image.resize(flow, (n, h + ph, w + pw, 2), "bilinear") * 4.0
        return flow[:, :h, :w]
