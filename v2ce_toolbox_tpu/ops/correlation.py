"""Correlation (cost volume) op — Pallas TPU kernel + jnp reference.

TPU-native equivalent of the reference's single native-code dependency:
FastFlowNet's CUDA correlation extension
(reference: train/scripts/utils/fastflownet.py:5 imports
`from .correlation_package.correlation import Correlation` with
pad_size=4, kernel_size=1, max_displacement=4, stride1=1, stride2=1 —
i.e. a (2*4+1)^2 = 81-tap cost volume, output normalized by channel count).

corr[b, y, x, d] = mean_c f1[b, y, x, c] * f2[b, y+dy, x+dx, c]
for (dy, dx) in [-md, md]^2, zero-padded out of bounds.

The naive XLA formulation re-reads f2 from HBM once per displacement (81x
traffic); the Pallas kernel loads each image's features into VMEM once and
computes every displacement from there. Inputs are optical-flow pyramid
features (the reference correlates at 1/16 resolution and below,
fastflownet.py forward), so a whole image fits VMEM comfortably.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def correlation_jnp(f1: jax.Array, f2: jax.Array,
                    max_displacement: int = 4) -> jax.Array:
    """Reference implementation: (B, H, W, C) x2 -> (B, H, W, D*D)."""
    md = max_displacement
    b, h, w, c = f1.shape
    f2p = jnp.pad(f2, ((0, 0), (md, md), (md, md), (0, 0)))
    outs = []
    for dy in range(2 * md + 1):
        for dx in range(2 * md + 1):
            shifted = lax.dynamic_slice(f2p, (0, dy, dx, 0), (b, h, w, c))
            outs.append(jnp.mean(f1 * shifted, axis=-1))
    return jnp.stack(outs, axis=-1)


def _corr_kernel(f1_ref, f2_ref, out_ref, *, md: int):
    """One grid step = one image: (H, W, C) f1 x (H+2md, W+2md, C) padded f2
    -> (H, W, D*D), all operands resident in VMEM."""
    f1 = f1_ref[0]                      # (H, W, C)
    f2 = f2_ref[0]                      # (H + 2md, W + 2md, C)
    h, w, c = f1.shape
    inv_c = 1.0 / c
    d = 2 * md + 1
    for dy in range(d):
        for dx in range(d):
            win = f2[dy:dy + h, dx:dx + w, :]
            out_ref[0, :, :, dy * d + dx] = jnp.sum(
                f1 * win, axis=-1) * inv_c


@functools.partial(jax.jit, static_argnames=("max_displacement", "interpret"))
def correlation(f1: jax.Array, f2: jax.Array, max_displacement: int = 4,
                interpret: bool = False) -> jax.Array:
    """Pallas cost volume: (B, H, W, C) x2 -> (B, H, W, D*D)."""
    from jax.experimental import pallas as pl

    md = max_displacement
    b, h, w, c = f1.shape
    d2 = (2 * md + 1) ** 2
    f2p = jnp.pad(f2, ((0, 0), (md, md), (md, md), (0, 0)))

    return pl.pallas_call(
        functools.partial(_corr_kernel, md=md),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h + 2 * md, w + 2 * md, c),
                         lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w, d2), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, d2), f1.dtype),
        interpret=interpret,
    )(f1, f2p)
