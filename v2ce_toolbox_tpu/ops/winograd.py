"""Winograd F(2x2,3x3) convolution for the stage-1 UNet's fill-bound layers.

Why: PERF.md's round-3 roofline shows the top-resolution small-cout convs
(decoder_3/conv1 96->32 @260x346: 7.81 ms at 31 TF/s; decoder_2/conv1
192->64 @130x173: 3.97 ms at 60 TF/s) run AT their MXU lane-fill-bound
speed of light under every *FLOP-preserving* schedule tried (XLA direct,
d2 depth-fold, quad W-pack, implicit-GEMM Pallas — all measured, all at
the same plateau). Winograd is the orthogonal lever: F(2x2,3x3) computes
each 2x2 output tile with 16 multiplies per (cin, cout) pair instead of
36 — a 2.25x cut in dot volume that goes under the fill-bound ceiling
instead of trying to raise it.

Formulation (2D spatial Winograd x temporal direct):

    out[l] = sum_dl conv2d_wino(x[l+dl-1], k[dl])

with the temporal taps folded into the matmul N dimension (N = 3*cout:
one transform-domain GEMM per (xi, nu) tile position produces all three
temporal partials, shift-added over l afterwards *in the transform
domain* — the inverse transform is linear so the order is free). For
decoder_3/conv1 this makes each GEMM (tiles, 96) @ (96, 96): 75% lane
fill instead of the 25% a naive N=cout layout would get.

Transforms (Lavin & Gray 2015, arXiv:1509.09308):

    BT = [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]]
    G  = [[1, 0, 0], [1/2, 1/2, 1/2], [1/2, -1/2, 1/2], [0, 0, 1]]
    AT = [[1, 1, 1, 0], [0, 1, -1, -1]]

    V = BT d B   (4x4 input tile, stride-2 tiling of the padded input)
    U = G g GT   (per temporal tap)
    M = V @ U    (contraction over cin; the only MXU work)
    Y = AT M A   (2x2 output tile)

All coefficients are 0, +-1, +-1/2: exactly representable in bf16, so the
transform itself adds no rounding error beyond the reassociation already
inherent in any conv schedule.

This module holds the pure-XLA formulation (correctness oracle + measured
evidence for PERF.md); the Mosaic kernel that keeps V/M in VMEM lives in
ops/winograd_pallas.py. Reference layer set: the stride-1 3x3x3 resblock
convs of scripts/unet_2layer.py:203-378 (reference repo).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

BT = np.array([[1, 0, -1, 0],
               [0, 1, 1, 0],
               [0, -1, 1, 0],
               [0, 1, 0, -1]], np.float32)
G = np.array([[1, 0, 0],
              [0.5, 0.5, 0.5],
              [0.5, -0.5, 0.5],
              [0, 0, 1]], np.float32)
AT = np.array([[1, 1, 1, 0],
               [0, 1, -1, -1]], np.float32)


def filter_transform(k: jax.Array) -> jax.Array:
    """(3, 3, 3, cin, cout) -> U (4, 4, 3, cin, cout): U[.., dl] = G k[dl] GT
    over the two spatial tap axes (dh, dw)."""
    g = jnp.asarray(G, k.dtype)
    return jnp.einsum("xa,yb,tabio->xytio", g, g, k)


def input_transform(xp: jax.Array) -> jax.Array:
    """Padded input (b, l, 2*nh + 2, 2*nw + 2, c) -> V (4, 4, b, l, nh, nw, c).

    d[a, b][i, j] = xp[2i + a, 2j + b]; V = BT d B. BT rows have exactly two
    nonzero +-1 entries, so V is 16 four-term +-sums of the 16 strided views
    — XLA fuses the whole transform into elementwise adds over slices."""
    b_, l, hp2, wp2, c = xp.shape
    nh, nw = (hp2 - 2) // 2, (wp2 - 2) // 2
    d = [[xp[:, :, a:a + 2 * nh:2, bb:bb + 2 * nw:2, :] for bb in range(4)]
         for a in range(4)]
    bt = BT

    def row(vals, mat_row):
        out = None
        for coef, v in zip(mat_row, vals):
            if coef == 0:
                continue
            term = v if coef == 1 else (-v if coef == -1 else coef * v)
            out = term if out is None else out + term
        return out

    # e[xi][b] = sum_a BT[xi, a] d[a][b]   (transform along the patch rows)
    e = [[row([d[a][bb] for a in range(4)], bt[xi]) for bb in range(4)]
         for xi in range(4)]
    # V[xi][nu] = sum_b BT[nu, b] e[xi][b]
    v = [[row(e[xi], bt[nu]) for nu in range(4)] for xi in range(4)]
    return jnp.stack([jnp.stack(vr, 0) for vr in v], 0)


def output_transform(m: jax.Array) -> jax.Array:
    """M (4, 4, b, l, nh, nw, co) -> (b, l, 2*nh, 2*nw, co): Y = AT M A,
    2x2 tiles interleaved back to the pixel grid."""
    at = AT
    # p[a][nu] = sum_xi AT[a, xi] M[xi, nu]
    p = [[sum(at[a, xi] * m[xi, nu] for xi in range(4) if at[a, xi] != 0)
          for nu in range(4)] for a in range(2)]
    y = [[sum(at[bb, nu] * p[a][nu] for nu in range(4) if at[bb, nu] != 0)
          for bb in range(2)] for a in range(2)]
    # y[a][b]: (b, l, nh, nw, co) -> out[.., 2i+a, 2j+b, ..]
    rows = [jnp.stack([y[a][0], y[a][1]], axis=4) for a in range(2)]
    t = jnp.stack(rows, axis=3)                 # (b, l, nh, 2, nw, 2, co)
    b_, l, nh, _, nw, _, co = t.shape
    return t.reshape(b_, l, 2 * nh, 2 * nw, co)


def conv3d_winograd(x: jax.Array, k: jax.Array,
                    compute_dtype=jnp.float32) -> jax.Array:
    """3x3x3 stride-1 'same' conv via spatial Winograd F(2x2,3x3).

    Args:
      x: (B, L, H, W, C) channels-last activations.
      k: (3, 3, 3, C, Co) filter, taps ordered (dl, dh, dw).
    Returns:
      (B, L, H, W, Co) float32.
    """
    b, l, h, w, c = x.shape
    co = k.shape[-1]
    cd = compute_dtype
    nh, nw = -(-h // 2), -(-w // 2)
    # pad to even tiling + the conv's own 'same' halo of 1
    xp = jnp.pad(x.astype(cd), ((0, 0), (0, 0), (1, 1 + (2 * nh - h)),
                                (1, 1 + (2 * nw - w)), (0, 0)))
    v = input_transform(xp)                      # (4,4,b,l,nh,nw,c)
    u = filter_transform(k.astype(cd))           # (4,4,3,c,co)
    # one GEMM per (xi, nu): N = 3*co (temporal taps in the lane dim)
    u3 = u.reshape(4, 4, 3, c, co).transpose(0, 1, 3, 2, 4) \
          .reshape(4, 4, c, 3 * co)
    z = jnp.einsum("xyblnmc,xyck->xyblnmk", v, u3,
                   preferred_element_type=jnp.float32)
    z = z.reshape(4, 4, b, l, nh, nw, 3, co)
    # shift-add over l in the transform domain:
    # M[l] = Z[l-1, dl=0] + Z[l, dl=1] + Z[l+1, dl=2]  (zero outside)
    m = z[:, :, :, :, :, :, 1]
    m = m.at[:, :, :, 1:].add(z[:, :, :, :-1, :, :, 0])
    m = m.at[:, :, :, :-1].add(z[:, :, :, 1:, :, :, 2])
    y = output_transform(m)
    return y[:, :, :h, :w]
