"""Mosaic Winograd F(4x3)_L x F(4x3)_H kernel for the stride-1 3x3x3 convs.

The lever (see ops/winograd.py for the why): the top-resolution small-cout
convs are fill-bound at their measured speed of light under every direct
schedule, so the only way under is fewer dot FLOPs. This kernel applies
1-D Winograd F(4,3) along BOTH the frame axis L and the row axis H —
the two dims that are neither lanes nor sublanes in the channels-last
(L, H, W, C) layout — so every tile gather, transform add, and output
interleave is pure addressing on free dims; the W taps fold into the
matmul N dimension (N = 3*cout) and combine as sublane shifts.

Per (L-tile, H-tile) of 4x4 outputs, the dot volume is 6*6 transform
positions x 3 W-taps = 108 MACs per (cin, cout) pair vs 4*4*27 = 432
direct: a 4.0x cut (3.6x net of the L/H-halo overheads at the model's
block sizes).

Data flow per grid step (one (B, L-block, H-block) cell):

    slab  (LT+2, TH+2, Wp+8, C)    <- one manual halo DMA from HBM
    E_lam (LT+2, TH/4, Wp+8, C)     = sum_b BTL[lam,b] slab[:, 4i+b]
    V_xl  (LT/4, TH/4, Wp+8, C)     = sum_a BTL[xi,a]  E[4j+a]
    z     (..., 3co) f32            = V @ U[xi,lam]    (the only MXU work)
    m     (..., Wp, co)             = z[w, dw0] + z[w+1, dw1] + z[w+2, dw2]
    p_a  += ATL[a,xi]  * m          (collapse xi)
    y_ab += ATL[b,lam] * p_a        (collapse lam)
    out[4j+a, 4i+b]  = y_ab         <- strided stores on free dims

Filter transform U[xi,lam] = (G k G^T) over (dl, dh) is precomputed in
f32 outside the kernel (G has 1/6, 1/12, 1/24 entries — the one inexact
step, shared by every Winograd implementation); BT/AT entries are small
integers, exact in bf16. Accumulation: the dot and everything after it
is f32; V/E are kept in the input dtype.

Forward-only, like ops/conv3d_pallas. Reference layer set: the stride-1
3x3x3 resblock convs of scripts/unet_2layer.py:203-378 (reference repo).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# F(4,3) transform matrices, interpolation points (0, 1, -1, 2, -2, inf).
BT4 = np.array([
    [4, 0, -5, 0, 1, 0],
    [0, -4, -4, 1, 1, 0],
    [0, 4, -4, -1, 1, 0],
    [0, -2, -1, 2, 1, 0],
    [0, 2, -1, -2, 1, 0],
    [0, 4, 0, -5, 0, 1],
], np.float32)
G4 = np.array([
    [1 / 4, 0, 0],
    [-1 / 6, -1 / 6, -1 / 6],
    [-1 / 6, 1 / 6, -1 / 6],
    [1 / 24, 1 / 12, 1 / 6],
    [1 / 24, -1 / 12, 1 / 6],
    [0, 0, 1],
], np.float32)
AT4 = np.array([
    [1, 1, 1, 1, 1, 0],
    [0, 1, -1, 2, -2, 0],
    [0, 1, 1, 4, 4, 0],
    [0, 1, -1, 8, -8, 1],
], np.float32)

_M = 4                                  # outputs per 1-D tile


def _lincomb(terms, coeffs):
    """sum_i coeffs[i] * terms[i], skipping zeros and folding +-1."""
    out = None
    for t, cf in zip(terms, coeffs):
        if cf == 0:
            continue
        term = t if cf == 1 else (-t if cf == -1 else t * float(cf))
        out = term if out is None else out + term
    return out


def _stride4(arr, off, n, axis=0):
    """arr[off + 4*i] for i < n along `axis`, as contiguous-slice ->
    reshape -> unit-slice (pure addressing on free dims — Mosaic has no
    >2D strided gather). Requires arr.shape[axis] >= off + 4*n."""
    view = jax.lax.slice_in_dim(arr, off, off + _M * n, axis=axis)
    shape = list(arr.shape)
    shape[axis:axis + 1] = [n, _M]
    view = view.reshape(shape)
    return jax.lax.index_in_dim(view, 0, axis=axis + 1, keepdims=False)


def _kernel(u_ref, xp_ref, out_ref, slab, sem, *,
            lt, th, wp, w_out, c, co, n_lt, n_ht, ablate="full"):
    # ablate: probe-only cost attribution — 'nodot' fakes z from v
    # (measures DMA + transforms + epilogue), 'noinv' skips the AT
    # collapses (measures everything but the 180 accumulate ops).
    b = pl.program_id(0)
    li = pl.program_id(1)
    hi = pl.program_id(2)

    # slab scratch is (lt+8, th+8, wp, c) but only the leading
    # (lt+2, th+2) region is filled — the extra rows let the stride-4
    # reshape views stay in bounds; the stale tail is sliced away before
    # any reduction.
    copy = pltpu.make_async_copy(
        xp_ref.at[b, pl.ds(li * lt, lt + 2), pl.ds(hi * th, th + 2)],
        slab.at[pl.ds(0, lt + 2), pl.ds(0, th + 2)], sem)
    copy.start()
    copy.wait()

    cdt = slab.dtype
    bt = BT4.astype(np.float32)
    at = AT4.astype(np.float32)

    # y accumulators, one per (a, bh) output phase, kept 3co wide: the
    # W-tap combine is linear so it commutes with the AT collapses —
    # doing it LAST runs the slice-heavy stage 16x instead of 36x
    y = [[None for _ in range(_M)] for _ in range(_M)]

    x_in = slab[:lt + 2]                # (lt+2, th+8, wp, c)

    for lam in range(6):
        # H transform: E[i] = sum_b BT[lam, b] slab[:, 4*i + b]
        e_terms = [_stride4(x_in, bb, n_ht, axis=1) for bb in range(6)]
        e = _lincomb(e_terms, bt[lam]).astype(cdt)  # (lt+2, n_ht, wp, c)
        # pad L so the stride-4 views for a in 0..5 stay in bounds
        e = jnp.concatenate(
            [e, jnp.zeros((6, n_ht, wp, c), cdt)], axis=0)

        p = [None] * _M
        for xi in range(6):
            # L transform: V[j] = sum_a BT[xi, a] E[4*j + a]
            v_terms = [_stride4(e, aa, n_lt) for aa in range(6)]
            v = _lincomb(v_terms, bt[xi]).astype(cdt)
            # (n_lt, n_ht, wp, c)

            if ablate == "nodot":
                vv = v.astype(jnp.float32)
                if c >= 3 * co:
                    z = jax.lax.slice_in_dim(vv, 0, 3 * co, axis=3)
                else:
                    z = jnp.concatenate(
                        [vv] * (-(-3 * co // c)), axis=3)[..., :3 * co]
            else:
                z = jax.lax.dot_general(
                    v.reshape(n_lt * n_ht * wp, c), u_ref[xi, lam],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(n_lt, n_ht, wp, 3 * co)

            if ablate == "noinv":
                y[0][0] = z if y[0][0] is None else y[0][0] + z
                continue
            for a in range(_M):
                cf = at[a, xi]
                if cf == 0:
                    continue
                term = z if cf == 1 else (-z if cf == -1 else z * float(cf))
                p[a] = term if p[a] is None else p[a] + term

        for a in range(_M):
            for bh in range(_M):
                cf = at[bh, lam]
                if cf == 0:
                    continue
                term = (p[a] if cf == 1
                        else (-p[a] if cf == -1 else p[a] * float(cf)))
                y[a][bh] = term if y[a][bh] is None else y[a][bh] + term

    if ablate == "noinv":
        for a in range(_M):
            for bh in range(_M):
                y[a][bh] = y[0][0]

    # W-tap combine on the 16 collapsed accumulators:
    # out[w] = y[w, dw0] + y[w+1, dw1] + y[w+2, dw2]
    yc = [[(y[a][bh][:, :, 0:w_out, 0:co]
            + y[a][bh][:, :, 1:w_out + 1, co:2 * co]
            + y[a][bh][:, :, 2:w_out + 2, 2 * co:3 * co])
           for bh in range(_M)] for a in range(_M)]

    # assemble (lt, th, w_out, co) from the 16 phase accumulators with
    # free-dim stacks (out rows (4j + a, 4i + bh))
    rows = [jnp.stack([yc[a][bh] for bh in range(_M)], axis=2)
            for a in range(_M)]          # each (n_lt, n_ht, 4, w_out, co)
    full = jnp.stack(rows, axis=1)       # (n_lt, 4, n_ht, 4, w_out, co)
    out_ref[0] = full.reshape(lt, th, w_out, co).astype(out_ref.dtype)


def filter_transform_lh(k: jax.Array) -> jax.Array:
    """(3, 3, 3, C, Co) -> U (6, 6, C, 3*Co): U[xi, lam, :, (dw, co)] =
    sum_{dl, dh} G[xi, dl] G[lam, dh] k[dl, dh, dw]."""
    g = jnp.asarray(G4)
    u = jnp.einsum("xa,yb,abwio->xyiwo", g, g, k.astype(jnp.float32))
    return u.reshape(6, 6, k.shape[3], 3 * k.shape[4])


def conv3d_wino4(x: jax.Array, k: jax.Array, out_dtype=jnp.float32,
                 lt: int = 8, th: int = 8, ablate: str = "full"
                 ) -> jax.Array:
    """3x3x3 stride-1 'same' conv via Winograd F(4,3) over L and H.

    Args:
      x: (B, L, H, W, C) activations (bf16 or f32).
      k: (3, 3, 3, C, Co) filter, same dtype family as x.
      lt, th: output frames / rows per grid block (multiples of 4).
    Returns:
      (B, L, H, W, Co) in out_dtype (f32 accumulation either way).

    Runs in interpreter mode off-TPU so CPU tests exercise the same path.
    """
    interpret = jax.default_backend() != "tpu"
    b, l, h, w, c = x.shape
    co = k.shape[-1]
    assert lt % _M == 0 and th % _M == 0
    lp = -l % lt
    hp = -h % th
    n_lb, n_hb = (l + lp) // lt, (h + hp) // th
    n_lt, n_ht = lt // _M, th // _M
    # kernel-visible width: w_out output cols (16-aligned for the reshape
    # legality), slab width w_out + 8 covers the +2 W halo with an
    # 8-aligned DMA size
    w_out = -(-w // 16) * 16
    wp = w_out + 8
    cp = -(-c // 128) * 128 if c > 8 else -(-c // 8) * 8

    xp = jnp.pad(x, ((0, 0), (1, 1 + lp), (1, 1 + hp), (1, 7 + w_out - w),
                     (0, cp - c)))
    u = filter_transform_lh(jnp.pad(k, ((0, 0),) * 3
                                    + ((0, cp - c), (0, 0))))
    u = u.astype(x.dtype)

    out = pl.pallas_call(
        functools.partial(_kernel, lt=lt, th=th, wp=wp, w_out=w_out,
                          c=cp, co=co, n_lt=n_lt, n_ht=n_ht,
                          ablate=ablate),
        grid=(b, n_lb, n_hb),
        in_specs=[
            pl.BlockSpec((6, 6, cp, 3 * co), lambda bi, li, hi: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, lt, th, w_out, co),
            lambda bi, li, hi: (bi, li, hi, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l + lp, h + hp, w_out, co),
                                       out_dtype),
        scratch_shapes=[
            pltpu.VMEM((lt + 2, th + 8, wp, cp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * l * h * w * c * co * 27 * 36 // 144,
            bytes_accessed=(xp.size * x.dtype.itemsize
                            + b * l * h * w * co
                            * jnp.dtype(out_dtype).itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(u, xp)
    return out[:, :l, :h, :w]
