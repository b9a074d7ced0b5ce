"""Sub-pixel (folded-kernel) convolution over nearest-upsampled inputs.

The UNet decoder computes `conv3d_3x3x3(concat(nearest_up2(coarse), skip))`
(reference: scripts/unet_2layer.py:355-371). Convolution distributes over
channel concat, and a 3x3 conv of a 2x-nearest-upsampled image touches at
most 2x2 distinct coarse pixels per output, so the upsampled branch can be
computed ON THE COARSE GRID with four folded (3, 2, 2) kernels — 4/9 of
the FLOPs, no upsampled tensor materialized, bit-exact up to float
reassociation. This is an algebraic rewrite, not an approximation; tests
pin it against upsample+conv for every odd/even target-size parity.

Derivation (per spatial axis, fine index y = 2i + p, 'same' padding):
  out[2i]   = in[2i-1]*K0 + in[2i]*K1 + in[2i+1]*K2
            = coarse[i-1]*K0 + coarse[i]*(K1+K2)          (p=0 fold)
  out[2i+1] = coarse[i]*(K0+K1) + coarse[i+1]*K2          (p=1 fold)
Odd targets (2h-1) crop the last upsampled row; outputs never read past
it except the LAST p=0 row, whose K2 tap saw a zero — fixed by a rank-1
boundary correction (with an inclusion-exclusion corner term when both
axes are odd).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Fold matrices F[p][dh, a]: K'_p[a] = sum_dh F[p][dh, a] * K[dh]
_F0 = np.array([[1.0, 0.0], [0.0, 1.0], [0.0, 1.0]])   # rows (i-1, i)
_F1 = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])   # rows (i, i+1)
# 'same' padding per parity: p=0 needs coarse row i-1 -> pad left
_PAD = {0: (1, 0), 1: (0, 1)}


def _conv(x: jax.Array, k: jax.Array, pad_h, pad_w) -> jax.Array:
    return lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1), pad_h, pad_w],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)


def conv3d_on_nearest_up2(coarse: jax.Array, kernel: jax.Array,
                          target_hw: Tuple[int, int]) -> jax.Array:
    """conv3d(kernel 3x3x3, stride 1, 'same') applied to
    `nearest_up2(coarse)[:, :, :H, :W]`, computed on the coarse grid.

    Args:
      coarse: (B, L, hc, wc, C); kernel: (3, 3, 3, C, Co).
      target_hw: (H, W) with H in {2*hc, 2*hc - 1}, same for W.
    Returns:
      (B, L, H, W, Co) float32.
    """
    b, l, hc, wc, c = coarse.shape
    th, tw = target_hw
    assert th in (2 * hc, 2 * hc - 1) and tw in (2 * wc, 2 * wc - 1), (
        coarse.shape, target_hw)
    odd_h = th == 2 * hc - 1
    odd_w = tw == 2 * wc - 1
    fh = [jnp.asarray(_F0, kernel.dtype), jnp.asarray(_F1, kernel.dtype)]

    outs = {}
    for p in (0, 1):
        for q in (0, 1):
            kf = jnp.einsum("ha,wb,dhwio->dabio", fh[p], fh[q], kernel)
            outs[(p, q)] = _conv(coarse, kf, _PAD[p], _PAD[q])

    if odd_h:
        # last p=0 row read a zero where the fold assumed coarse[hc-1]:
        # remove the dh=2 tap's contribution (w still folded per q)
        row = coarse[:, :, hc - 1:hc]
        for q in (0, 1):
            k2 = jnp.einsum("wb,dwio->dbio", fh[q], kernel[:, 2])[:, None]
            corr = _conv(row, k2, (0, 0), _PAD[q])
            outs[(0, q)] = outs[(0, q)].at[:, :, hc - 1:hc].add(-corr)
    if odd_w:
        col = coarse[:, :, :, wc - 1:wc]
        for p in (0, 1):
            k2 = jnp.einsum("ha,dhio->daio", fh[p], kernel[:, :, 2])[:, :, None]
            corr = _conv(col, k2, _PAD[p], (0, 0))
            outs[(p, 0)] = outs[(p, 0)].at[:, :, :, wc - 1:wc].add(-corr)
    if odd_h and odd_w:
        # corner removed twice (once per axis) -> add the (dh=2, dw=2)
        # cross term back once
        corner = coarse[:, :, hc - 1:hc, wc - 1:wc]
        k22 = kernel[:, 2, 2][:, None, None]
        corr = _conv(corner, k22, (0, 0), (0, 0))
        outs[(0, 0)] = outs[(0, 0)].at[:, :, hc - 1:, wc - 1:].add(corr)

    # interleave parities: fine[2i+p, 2j+q] = outs[(p,q)][i, j]
    co = kernel.shape[-1]
    fine = jnp.stack(
        [jnp.stack([outs[(0, 0)], outs[(0, 1)]], axis=4),
         jnp.stack([outs[(1, 0)], outs[(1, 1)]], axis=4)], axis=3)
    # (B, L, hc, 2, wc, 2, Co) -> (B, L, 2hc, 2wc, Co)
    fine = jnp.transpose(fine, (0, 1, 2, 3, 4, 5, 6)).reshape(
        b, l, 2 * hc, 2 * wc, co)
    return fine[:, :, :th, :tw]


def conv1x1_on_nearest_up2(coarse: jax.Array, kernel: jax.Array,
                           target_hw: Tuple[int, int]) -> jax.Array:
    """1x1x1 conv commutes with nearest upsampling: compute on the coarse
    grid then repeat (exact — a 1x1 kernel never reads the cropped row).
    kernel: (1, 1, 1, C, Co)."""
    th, tw = target_hw
    y = lax.conv_general_dilated(
        coarse, kernel, (1, 1, 1), [(0, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)
    b, l, hc, wc, co = y.shape
    y = jnp.broadcast_to(y[:, :, :, None, :, None, :],
                         (b, l, hc, 2, wc, 2, co))
    return y.reshape(b, l, 2 * hc, 2 * wc, co)[:, :, :th, :tw]
