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


def conv3d_on_nearest_up2_pfold(coarse: jax.Array, kernel: jax.Array,
                                target_hw: Tuple[int, int]) -> jax.Array:
    """Same contract as :func:`conv3d_on_nearest_up2`, reformulated for
    the MXU: BOTH output parities ride the output-channel axis of ONE
    conv on the coarse grid.

    The split formulation above computes four (3,2,2)-kernel convs with
    cout=Co each — 4/9 the FLOPs but 25% MXU lane fill at the model's
    Co=32, and a strided parity interleave XLA lowers as gathers; it
    measured 78 ms vs 51 ms in-model (PERF.md round 2). Here the folded
    per-parity kernels are zero-embedded into a single (3, 3, 3) kernel
    with cout=4*Co, so XLA sees one dense conv at FULL lane fill on the
    quarter-size coarse grid — the same dot volume as the direct conv on
    the upsampled grid, but none of its 4x input re-reads, no upsample or
    concat materialization, and the parity interleave collapses to one
    (hc, wc, 2, 2Co) -> (hc, 2, wc, 2Co) transpose plus free reshapes
    (the W parity is channel-adjacent in memory, so its interleave is a
    pure bitcast).

    Output channel layout before interleave: c = p*2*Co + q*Co + co for
    fine pixel (2i+p, 2j+q) at coarse (i, j). Odd targets get the same
    rank-1 boundary corrections as the split form, applied on the
    coarse-grid output (channel-half slices).
    """
    b, l, hc, wc, c = coarse.shape
    th, tw = target_hw
    assert th in (2 * hc, 2 * hc - 1) and tw in (2 * wc, 2 * wc - 1), (
        coarse.shape, target_hw)
    odd_h = th == 2 * hc - 1
    odd_w = tw == 2 * wc - 1
    co = kernel.shape[-1]

    # W fold, q in cout (extent-2 folds zero-embedded at extent 3 so one
    # 'same'-padded conv serves both alignments):
    #   q=0: taps (b=-1: K0, b=0: K1+K2); q=1: (b=0: K0+K1, b=+1: K2)
    z = jnp.zeros_like(kernel[:, :, :1])
    kq0 = jnp.concatenate(
        [kernel[:, :, :1], (kernel[:, :, 1] + kernel[:, :, 2])[:, :, None],
         z], axis=2)
    kq1 = jnp.concatenate(
        [z, (kernel[:, :, 0] + kernel[:, :, 1])[:, :, None],
         kernel[:, :, 2:]], axis=2)
    kw = jnp.concatenate([kq0, kq1], axis=-1)          # (3, 3, 3, C, 2Co)

    # H fold, p in cout, same zero-embedding on the dh axis
    zp = jnp.zeros_like(kw[:, :1])
    kp0 = jnp.concatenate(
        [kw[:, :1], (kw[:, 1] + kw[:, 2])[:, None], zp], axis=1)
    kp1 = jnp.concatenate(
        [zp, (kw[:, 0] + kw[:, 1])[:, None], kw[:, 2:]], axis=1)
    kf = jnp.concatenate([kp0, kp1], axis=-1)          # (3, 3, 3, C, 4Co)

    out = _conv(coarse, kf, (1, 1), (1, 1))            # (B, L, hc, wc, 4Co)

    if odd_w:
        # q=0's b=0 tap folded K2, but at coarse col wc-1 the fine col
        # 2wc-1 it came from is cropped: subtract K2 * coarse[wc-1] from
        # the q=0 channel quarter of each p half (H-folded like kf).
        k2 = kernel[:, :, 2]                           # (3, 3, C, Co)
        z2 = jnp.zeros_like(k2[:, :1])
        k2p0 = jnp.concatenate(
            [k2[:, :1], (k2[:, 1] + k2[:, 2])[:, None], z2], axis=1)
        k2p1 = jnp.concatenate(
            [z2, (k2[:, 0] + k2[:, 1])[:, None], k2[:, 2:]], axis=1)
        col = coarse[:, :, :, wc - 1:wc]
        c0 = _conv(col, k2p0[:, :, None], (1, 1), (0, 0))[:, :, :, 0]
        c1 = _conv(col, k2p1[:, :, None], (1, 1), (0, 0))[:, :, :, 0]
        out = out.at[:, :, :, wc - 1, 0:co].add(-c0)
        out = out.at[:, :, :, wc - 1, 2 * co:3 * co].add(-c1)
    if odd_h:
        # p=0's dh=0 tap folded K[2]; fine row 2hc-1 is cropped:
        # subtract the W-folded K[2] row term from the whole p=0 half.
        k2h = kw[:, 2]                                 # (3, 3, C, 2Co)
        row = coarse[:, :, hc - 1:hc]
        ch = _conv(row, k2h[:, None], (0, 0), (1, 1))[:, :, 0]
        out = out.at[:, :, hc - 1, :, 0:2 * co].add(-ch)
    if odd_h and odd_w:
        # corner removed once per axis -> add the (dh=2, dw=2) cross
        # term back once (p=0, q=0 quarter only)
        corner = coarse[:, :, hc - 1:hc, wc - 1:wc]
        k22 = kernel[:, 2, 2][:, None, None]
        cc = _conv(corner, k22, (0, 0), (0, 0))[:, :, 0, 0]
        out = out.at[:, :, hc - 1, wc - 1, 0:co].add(cc)

    # interleave: channel c = p*2Co + (q*Co + co); the (q, co) pair is
    # already W-minor-adjacent so (wc, 2Co) -> (2wc, Co) is a free
    # reshape; only p needs a real transpose past wc.
    out = out.reshape(b, l, hc, wc, 2, 2 * co)
    out = jnp.transpose(out, (0, 1, 2, 4, 3, 5))
    out = out.reshape(b, l, 2 * hc, 2 * wc, co)
    return out[:, :, :th, :tw]


def conv3d_on_nearest_up2_wfold(coarse: jax.Array, kernel: jax.Array,
                                target_hw: Tuple[int, int]) -> jax.Array:
    """Half-way point between the split and pfold forms: the W parity
    rides cout (free interleave, 2*Co lanes) while the H parity keeps the
    split form's two extent-2 convs (asymmetric padding) — 2/3 the direct
    dot volume at 50% lane fill, stacking the two H-parity outputs on a
    fresh length-2 axis (one relayout copy XLA can fuse into the conv
    epilogues)."""
    b, l, hc, wc, c = coarse.shape
    th, tw = target_hw
    assert th in (2 * hc, 2 * hc - 1) and tw in (2 * wc, 2 * wc - 1), (
        coarse.shape, target_hw)
    odd_h = th == 2 * hc - 1
    odd_w = tw == 2 * wc - 1
    co = kernel.shape[-1]
    fh = [jnp.asarray(_F0, kernel.dtype), jnp.asarray(_F1, kernel.dtype)]

    z = jnp.zeros_like(kernel[:, :, :1])
    kq0 = jnp.concatenate(
        [kernel[:, :, :1], (kernel[:, :, 1] + kernel[:, :, 2])[:, :, None],
         z], axis=2)
    kq1 = jnp.concatenate(
        [z, (kernel[:, :, 0] + kernel[:, :, 1])[:, :, None],
         kernel[:, :, 2:]], axis=2)
    kw = jnp.concatenate([kq0, kq1], axis=-1)          # (3, 3, 3, C, 2Co)

    outs = []
    for p in (0, 1):
        kf = jnp.einsum("ha,dhwio->dawio", fh[p], kw)  # (3, 2, 3, C, 2Co)
        outs.append(_conv(coarse, kf, _PAD[p], (1, 1)))

    if odd_w:
        k2 = kernel[:, :, 2]
        for p in (0, 1):
            k2f = jnp.einsum("ha,dhio->daio", fh[p], k2)[:, :, None]
            corr = _conv(coarse[:, :, :, wc - 1:wc], k2f, _PAD[p],
                         (0, 0))[:, :, :, 0]
            outs[p] = outs[p].at[:, :, :, wc - 1, 0:co].add(-corr)
    if odd_h:
        k2h = kw[:, 2][:, None]                        # (3, 1, 3, C, 2Co)
        corr = _conv(coarse[:, :, hc - 1:hc], k2h, (0, 0), (1, 1))[:, :, 0]
        outs[0] = outs[0].at[:, :, hc - 1].add(-corr)
    if odd_h and odd_w:
        corner = coarse[:, :, hc - 1:hc, wc - 1:wc]
        k22 = kernel[:, 2, 2][:, None, None]
        cc = _conv(corner, k22, (0, 0), (0, 0))[:, :, 0, 0]
        outs[0] = outs[0].at[:, :, hc - 1, wc - 1, 0:co].add(cc)

    out = jnp.stack(outs, axis=3)                      # (B, L, hc, 2, wc, 2Co)
    out = out.reshape(b, l, 2 * hc, 2 * wc, co)
    return out[:, :, :th, :tw]


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
