"""W-packed conv3d: fold the width-axis taps into the channel dimension.

Why: the model's hot 3x3x3 convs (reference layer set:
scripts/unet_2layer.py:203-378) run at 10-30% of the chip's practical
matmul peak under XLA's native conv3d lowering (tools/perf_probe.py
roofline, PERF.md round 3). Two structural causes:

  * small-Cout decoder layers (32/64) fill only 32/128 or 64/128 of the
    MXU's output lanes;
  * the kernel's W-axis taps contract one C-sized K slice at a time,
    wasting K occupancy whenever C < 128 and tripling pass count.

The fix is algebraic, not a new kernel: group output width into quads of
ws = 128 // min(co, 128) positions and express the conv as

    out[l, h, q, (s, co)] = sum_{dl, dh} xT[l+dl, h+dh, q] @ W'[dl, dh]

where xT[..., q, (j, c)] = x[..., q*ws*sw + (j-1)*1 ..., c] is the
(ws+2)-tap width window covering the quad (sw = W stride), built with two
lane-aligned slices + concat, and W'[dl, dh, (j, c), (s, co)] embeds the
3 genuine dw taps of each output phase s (zeros elsewhere). The result is
ONE (3, 3, 1) conv with channels (ws+2)*c -> ws*co: the W dimension is no
longer convolved, K and N are both 128-dense, and XLA lowers it as plain
batched GEMMs.

FLOP accounting: ws = 1 (co >= 128) is FLOP-neutral (27 taps of K=c
become 9 of K=3c); ws = 2 costs 4/3 the MACs, ws = 4 costs 2x — but the
dense-GEMM rate dwarfs the overhead on the affected layers (measured in
tools/perf_probe.py wpack probe).

Strided width (sw = 2) uses a (2*ws + 1)-tap window, same machinery.
Everything is standard jnp/lax, so the rewrite is differentiable and
train-compatible (unlike the forward-only Pallas kernel in
conv3d_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pick_ws(co: int) -> int:
    if co >= 128:
        return 1
    return max(1, 128 // co)


@functools.lru_cache(maxsize=None)
def _weight_index(kw: int, ws: int, sw: int, taps: int) -> np.ndarray:
    """(taps, ws) int map: dw tap index of (window tap j, phase s), or -1.

    Output position w = q*ws*sw + s*sw reads inputs w + dw - 1 for
    dw in [0, kw); window tap j covers input q*ws*sw + (j - 1).
    So j = s*sw + dw, valid iff 0 <= j - s*sw < kw.
    """
    idx = np.full((taps, ws), -1, np.int64)
    for s in range(ws):
        for dw in range(kw):
            idx[s * sw + dw, s] = dw
    return idx


def pack_weights(k: jax.Array, ws: int, sw: int = 1) -> jax.Array:
    """(kl, kh, kw, c, co) -> (kl, kh, 1, taps*c, ws*co) packed kernel."""
    kl, kh, kw, c, co = k.shape
    taps = (ws - 1) * sw + kw
    idx = _weight_index(kw, ws, sw, taps)
    # gather dw planes; -1 -> zeros
    kz = jnp.concatenate([k, jnp.zeros((kl, kh, 1, c, co), k.dtype)], axis=2)
    w = kz[:, :, idx]                       # (kl, kh, taps, ws, c, co)
    w = jnp.moveaxis(w, 3, 4)               # (kl, kh, taps, c, ws, co)
    return w.reshape(kl, kh, 1, taps * c, ws * co)


def pack_input(x: jax.Array, ws: int, sw: int = 1,
               kw: int = 3) -> Tuple[jax.Array, int]:
    """(B, L, H, W, C) -> (B, L, H, nq, taps*C) width-window view.

    Returns (xT, w_out) where w_out = ceil(W / sw) is the logical output
    width before quad padding; nq = ceil(w_out / ws).
    """
    b, l, h, w, c = x.shape
    w_out = -(-w // sw)
    nq = -(-w_out // ws)
    taps = (ws - 1) * sw + kw
    # pad W so that input index q*ws*sw + (j-1) for q in [0, nq), j in
    # [0, taps) stays in range after the left pad of 1
    w_need = (nq - 1) * ws * sw + taps - 1
    xp = jnp.pad(x, ((0, 0),) * 3 + ((1, max(w_need - w, 1)), (0, 0)))
    # window j spans lane offset (j-1+1)*c = j*c in xp; quads stride
    # ws*sw*c. Build by slicing xp at byte offset j*c for each j-block of
    # size ws*sw*c, then keeping the c-slice — equivalently: taps slices
    # of shape (nq, c) strided ws*sw in w.
    cols = []
    for j in range(taps):
        sl = jax.lax.slice_in_dim(xp, j, j + (nq - 1) * ws * sw + 1, axis=3)
        sl = sl[:, :, :, ::ws * sw, :]       # (b, l, h, nq, c)
        cols.append(sl)
    return jnp.concatenate(cols, axis=-1), w_out


def conv3d_wpack(x: jax.Array, k: jax.Array,
                 strides: Tuple[int, int, int] = (1, 1, 1),
                 compute_dtype=jnp.float32,
                 ws: int | None = None) -> jax.Array:
    """'same'-padded conv3d via width-packing; numerically equal to
    lax.conv_general_dilated(..., padding=((1,1),(1,1),(1,1))) for
    3x3x3 kernels (up to f32 accumulation order).

    x: (B, L, H, W, C) channels-last; k: (3, 3, 3, C, Co).
    strides: (sl, sh, sw) with sl == 1 (the model never strides L).
    """
    kl, kh, kw, c, co = k.shape
    sl_, sh, sw = strides
    assert sl_ == 1, "temporal stride unsupported"
    if ws is None:
        ws = _pick_ws(co)
    xT, w_out = pack_input(x.astype(compute_dtype), ws, sw, kw)
    wP = pack_weights(k.astype(compute_dtype), ws, sw)
    out = jax.lax.conv_general_dilated(
        xT, wP,
        window_strides=(1, sh, 1),
        padding=((kl // 2, kl // 2), (kh // 2, kh // 2), (0, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )                                        # (b, l, h_out, nq, ws*co)
    b, l, h_out, nq, _ = out.shape
    out = out.reshape(b, l, h_out, nq * ws, co)
    return out[:, :, :, :w_out]
