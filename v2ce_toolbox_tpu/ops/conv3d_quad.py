"""Quad-packed Pallas implicit-GEMM convs — the round-3 stage-1 schedule.

Why a second Pallas conv: the round-2 implicit-GEMM kernel
(ops/conv3d_pallas.py) and EVERY XLA formulation (native conv3d, einsum,
width-packed (3,3,1) conv, 2D decomposition — all measured,
tools/perf_probe.py) plateau at 10-55% of the chip's practical matmul
peak (93 TF/s, roofline probe). The structural reason on the decoder
layers is MXU lane waste: with Cout = 32/64 every dot fills only 32/64
of the 128 output lanes, and the 27 per-tap dots contract only C <= 128
at a time.

This kernel packs a QUAD of ws adjacent output width positions into the
dot's N dimension (N = ws*Cout >= 128) and folds the kw width taps into
K:

    out[(l, h, q), (s, co)] =
        sum_{dl, dh} sum_{half in 0,1}
            slab[l+dl, h+dh, q+half] @ Wh[dl, dh, half]

where the input is lane-flattened into width-quads of QW = ws*C lanes
(x_flat[..., q, (w_in_quad, c)]) and Wh embeds k[dl, dh, dw] at rows
(j = s + dw - half*ws, c) of column (s, co) — zeros elsewhere. Each dot
is (M = l_t*th*nq, K = QW, N = 128): K and N both lane-dense, no
gathers, no transposes, no in-VMEM concats (the two window halves are
plain slab slices). Useful-MAC fraction kw/(2*ws): 75% for the ws=2
layers vs the 18-25% lane occupancy of the per-tap formulation.

Two public entry points:
  * conv3d_quad      — 3x3x3 stride (1,1,1) 'same' (every
    ResidualBlock3D conv1/conv2 and decoder conv; reference layer set
    scripts/unet_2layer.py:203-378).
  * conv3d_quad_s122 — 3x3x3 stride (1,2,2) 'same' (the four encoder
    downsampling convs, unet_2layer.py:266-279): host-side
    space-to-depth folds the H/W phases into 4C channels, turning the
    strided conv into a dense stride-1 (3,2,2) conv whose taps are
    100%-useful for Cout >= 128 — where XLA's strided lowering measured
    6-13 TF/s.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 11 * 1024 * 1024
_LANES = 128


def _pick_ws(co: int, kw: int) -> int:
    # quads must cover the kw taps in a 2-quad window (ws >= kw - 1);
    # cap at 8: beyond that the zero-weight overhead (kw/(2*ws) useful)
    # outgrows the lane-fill win
    return min(8, max(kw - 1, -(-_LANES // co)))


def _sublane_mult(dtype) -> int:
    return 16 if jnp.dtype(dtype).itemsize == 2 else 8


def pack_weights_quad(k: jax.Array, ws: int) -> jax.Array:
    """(kl, kh, kw, c, co) -> (kl*kh*2, ws*c, ws*co): per (dl, dh, half)
    K-dense weight blocks. Row (j, c) of block half holds k[dl, dh, dw]
    for dw = (j + half*ws) - s, zero when dw is outside [0, kw)."""
    kl, kh, kw, c, co = k.shape
    assert kw - 1 <= ws, (kw, ws)
    qw = ws * c
    blocks = []
    for dl in range(kl):
        for dh in range(kh):
            for half in (0, 1):
                w = jnp.zeros((ws, c, ws, co), k.dtype)
                for s in range(ws):
                    for dw in range(kw):
                        j = s + dw - half * ws
                        if 0 <= j < ws:
                            w = w.at[j, :, s, :].set(k[dl, dh, dw])
                blocks.append(w.reshape(qw, ws * co))
    return jnp.stack(blocks, axis=0)


def _pick_tiles(l: int, h: int, nq_p: int, qw: int, n_full: int,
                n_blocks: int, kl: int, kh: int, itemsize: int, sub: int):
    """(l_t, th, nq_t): L/H/quad tiling maximizing the matmul M within the
    VMEM budget while minimizing halo re-DMA (the quad halo is 8 quads —
    Mosaic's HBM slice-size alignment — so prefer large nq_t)."""
    n_t = min(n_full, _LANES)
    wgt = n_blocks * qw * n_t * itemsize * 2      # double-buffered operand
    best = None
    for l_t in (16, 8, 4, 2, 1):
        if l_t > l:
            continue
        for th in (64, 32, 16, 8, 4, 2, 1):
            if th > h:
                continue
            for nq_t in range(nq_p, 0, -sub):
                slab = ((l_t + kl - 1) * (th + kh - 1) * (nq_t + 8)
                        * qw * itemsize)
                m = l_t * th * nq_t
                acc = m * n_t * 4
                outb = m * n_t * 4 * 2            # double-buffered output
                if slab + wgt + acc + outb > _VMEM_BUDGET:
                    continue
                # DMA amplification from halos
                halo = ((l_t + kl - 1) / l_t * (th + kh - 1) / th
                        * (nq_t + 8) / nq_t)
                key = (min(m, 4096), -halo, m)
                if best is None or key > best[0]:
                    best = (key, (l_t, th, nq_t))
                break
    if best is None:
        raise ValueError(f"no VMEM-feasible quad tiling: "
                         f"l={l} h={h} nq_p={nq_p} qw={qw} n={n_full}")
    return best[1]


def _kernel(w_ref, xf_ref, out_ref, slab, sem, *, l_t, th, nq_t, qw, n_t,
            kl, kh):
    b = pl.program_id(0)
    lt = pl.program_id(1)
    ht = pl.program_id(2)
    qt = pl.program_id(3)
    ni = pl.program_id(4)

    @pl.when(ni == 0)
    def _():
        copy = pltpu.make_async_copy(
            xf_ref.at[b, pl.ds(lt * l_t, l_t + kl - 1),
                      pl.ds(ht * th, th + kh - 1),
                      pl.ds(qt * nq_t, nq_t + 8)],
            slab, sem)
        copy.start()
        copy.wait()

    m = l_t * th * nq_t
    acc = jnp.zeros((m, n_t), jnp.float32)
    i = 0
    for dl in range(kl):
        for dh in range(kh):
            for half in (0, 1):
                a = slab[dl:dl + l_t, dh:dh + th, half:half + nq_t, :]
                a = a.reshape(m, qw)
                acc = acc + jax.lax.dot_general(
                    a, w_ref[i],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                i += 1
    out_ref[0] = acc.reshape(l_t, th, nq_t, n_t).astype(out_ref.dtype)


def _quad_core(x: jax.Array, k: jax.Array, out_dtype, ws: int,
               tiles=None):
    """VALID conv of pre-padded x (B, Lp, Hp, Wp, C) with k
    (kl, kh, kw, C, Co), W handled in ws-quads. Returns
    (B, Lp-kl+1, Hp-kh+1, Wp-kw+1, Co)."""
    interpret = jax.default_backend() != "tpu"
    b, lp_in, hp_in, wp_in, c = x.shape
    kl, kh, kw, _, co = k.shape
    l_out = lp_in - kl + 1
    h_out = hp_in - kh + 1
    w_out = wp_in - kw + 1
    qw = ws * c
    assert qw % _LANES == 0, (
        f"quad lane width {qw} (ws={ws} * c={c}) must be a 128-multiple")
    nq = -(-w_out // ws)
    sub = _sublane_mult(x.dtype)
    nq_p = -(-nq // sub) * sub
    n_blocks = kl * kh * 2
    if tiles is not None:
        l_t, th, nq_t = tiles
    else:
        l_t, th, nq_t = _pick_tiles(l_out, h_out, nq_p, qw, ws * co,
                                    n_blocks, kl, kh, x.dtype.itemsize,
                                    sub)
    nq_p = -(-nq_p // nq_t) * nq_t
    hp = -h_out % th
    lp = -l_out % l_t
    n_full = ws * co
    n_t = min(n_full, _LANES)
    n_nt = -(-n_full // n_t)

    # tile padding + right-pad W to (nq_p + 8) full quads: the kernel's
    # 2-quad window reads quad q+1 (taps satisfy s + dw < 2*ws), and the
    # slab's HBM slice on this second-minor dim must be 8-aligned
    xp = jnp.pad(x, ((0, 0), (0, lp), (0, hp),
                     (0, (nq_p + 8) * ws - wp_in), (0, 0)))
    xf = xp.reshape(b, lp_in + lp, hp_in + hp, nq_p + 8, qw)

    wq = pack_weights_quad(k, ws)
    if n_full % n_t:
        wq = jnp.pad(wq, ((0, 0), (0, 0), (0, n_nt * n_t - n_full)))

    out = pl.pallas_call(
        functools.partial(_kernel, l_t=l_t, th=th, nq_t=nq_t, qw=qw,
                          n_t=n_t, kl=kl, kh=kh),
        grid=(b, -(-l_out // l_t), (h_out + hp) // th, nq_p // nq_t,
              n_nt),
        in_specs=[
            pl.BlockSpec((n_blocks, qw, n_t),
                         lambda bi, li, hi, qi, ni: (0, 0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, l_t, th, nq_t, n_t),
            lambda bi, li, hi, qi, ni: (bi, li, hi, qi, ni),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, -(-l_out // l_t) * l_t, h_out + hp, nq_p, n_nt * n_t),
            out_dtype),
        scratch_shapes=[
            pltpu.VMEM((l_t + kl - 1, th + kh - 1, nq_t + 8, qw), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary",
                                 "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * l_out * h_out * w_out * c * co * kl * kh * kw,
            bytes_accessed=(xf.size * x.dtype.itemsize
                            + b * l_out * h_out * w_out * co * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(wq, xf)
    # (b, L, H, nq_p, n_nt*n_t): N layout is (s, co); crop + unpack
    out = out[:, :l_out, :h_out, :, :n_full]
    out = out.reshape(b, l_out, h_out, nq_p, ws, co)
    out = out.reshape(b, l_out, h_out, nq_p * ws, co)
    return out[:, :, :, :w_out]


def conv3d_quad(x: jax.Array, k: jax.Array,
                out_dtype=jnp.float32,
                ws: Optional[int] = None,
                tiles=None) -> jax.Array:
    """3x3x3 stride-1 'same' conv, channels-last, quad-packed N.

    x: (B, L, H, W, C) (bf16 or f32); k: (3, 3, 3, C, Co).
    Returns (B, L, H, W, Co) in out_dtype (f32 accumulation).
    Runs in interpreter mode off-TPU so CPU tests exercise the same path.
    """
    if ws is None:
        ws = _pick_ws(k.shape[-1], 3)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    return _quad_core(xp, k, out_dtype, ws, tiles=tiles)


def conv3d_quad_s122(x: jax.Array, k: jax.Array,
                     out_dtype=jnp.float32,
                     ws: Optional[int] = None) -> jax.Array:
    """3x3x3 stride-(1,2,2) 'same' conv via space-to-depth phase folding.

    The H/W phases fold into 4C channels, turning the strided conv into
    a stride-1 (3, 2, 2) conv: tap (du, dv) at phase (ph_h, ph_w) embeds
    k[dl, 2*du + ph_h, 2*dv + ph_w] (zero when the index reaches 3), so
    for Cout >= 128 every MAC is useful — versus XLA's strided conv3d
    lowering at 6-13 TF/s on these layers (roofline probe).

    x: (B, L, H, W, C); k: (3, 3, 3, C, Co).
    Returns (B, L, ceil(H/2), ceil(W/2), Co) in out_dtype.
    """
    xf, k4 = fold_s122(x, k)
    if ws is None:
        ws = _pick_ws(k.shape[-1], 2)
    return _quad_core(xf, k4, out_dtype, ws)


def fold_s122(x: jax.Array, k: jax.Array):
    """Space-to-depth phase fold of a 3x3x3 stride-(1,2,2) 'same' conv:
    returns (xf, k4) such that a stride-1 all-VALID (3, 2, 2) conv of xf
    with k4 equals the strided conv (xf already carries the L (1, 1) and
    folded-H/W halo padding). Shared by the Pallas quad kernel above and
    the pure-XLA conv_impl='fold' path (models/layers._apply_conv)."""
    b, l, h, w, c = x.shape
    co = k.shape[-1]
    ho, wo = -(-h // 2), -(-w // 2)
    # pad: L same (1,1); H/W left 1 then to 2*(out+1) for the phase fold
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 2 * (ho + 1) - h - 1),
                     (1, 2 * (wo + 1) - w - 1), (0, 0)))
    # fold H phases -> channels (ph_h, c), then W -> (ph_w, ph_h, c)
    xh = jnp.concatenate([xp[:, :, 0::2], xp[:, :, 1::2]], axis=-1)
    xf = jnp.concatenate([xh[:, :, :, 0::2], xh[:, :, :, 1::2]], axis=-1)

    # k4[dl, du, dv, (ph_w, ph_h, c), co]
    kz = jnp.concatenate([k, jnp.zeros((3, 1, 3, c, co), k.dtype)], axis=1)
    kz = jnp.concatenate(
        [kz, jnp.zeros((3, 4, 1, c, co), kz.dtype)], axis=2)
    parts = []
    for ph_w in (0, 1):
        for ph_h in (0, 1):
            # (3, du 2, dv 2, c, co)
            parts.append(kz[:, [0 + ph_h, 2 + ph_h]][:, :, [0 + ph_w,
                                                            2 + ph_w]])
    k4 = jnp.concatenate(parts, axis=3)      # (3, 2, 2, 4c, co)
    return xf, k4
