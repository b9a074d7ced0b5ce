"""Fused Pallas decoder-block convolution: nearest-up2 + concat + conv3d
(+ the residual 1x1 projection) in ONE kernel on the COARSE grid.

The UNet decoder computes `conv3d_3x3x3(concat(nearest_up2(coarse), skip))`
plus a 1x1 projection of the same concat input (reference:
scripts/unet_2layer.py:355-371). Round 3/4 measurements (PERF.md) proved
this is fill/HBM-bound in every XLA formulation: the direct schedule runs
the top-resolution decoder convs at 24-31 TF/s, and every XLA-level
algebraic rewrite (split/wfold/pfold sub-pixel forms, Winograd) lowers to
something slower. But the coarse-grid conv geometry itself — quarter the
spatial positions, 2-4x the channels — measures 65-81 TF/s on this chip
(perf_probe.py fused_geometry). This kernel keeps that geometry while
doing the up/concat/interleave entirely through index arithmetic, which
XLA could not:

  - The skip's W parity is channel-adjacent in channels-last layout, so
    folding it into K is a FREE reshape; only the H parity costs one XLA
    transpose (skip -> (hc, wc, 4*Cs), layout (alpha, beta, cs)).
  - The coarse branch needs no upsample at all: a 3x3 conv of a
    2x-nearest-upsampled image touches at most 2x2 coarse pixels per
    output, so per output H-parity p the fused conv has taps
    (dl in 3) x (da in {p-1, p}) x (db in {-1, 0, 1}) with pre-folded
    kernels (the same fold algebra as ops/subpixel.py, zero-embedded so
    both output W-parities ride the dot's N dimension q-major).
  - The output writes land in a (..., hc, 2, wc, 2*Co) buffer whose
    fine-grid view (..., 2hc, 2wc, Co) is a free reshape — no parity
    interleave transpose, the XLA-pfold killer.

MXU shaping (the v1 lesson, measured): with N = 2*Co the model's Co=32
decoder runs 64-lane dots at ~half rate. When 2*Co <= 64 the residual
1x1x1 projection of the same concat input is folded into the SAME dots
as extra N lanes (one tap carries its weights, the rest are zero) — N
reaches 128, the projection's separate XLA cost disappears, and both
outputs share one buffer. The folded kernel loads ONCE into persistent
scratch via a first-step-guarded DMA instead of a double-buffered
BlockSpec operand, so VMEM goes to big slabs (M >= ~2500) instead of a
second kernel copy.

Odd fine sizes (2hc-1 / 2wc-1) crop the last upsampled row/col; the fold
wrongly reads coarse[hc-1] where the conv's zero pad should be, fixed by
the same rank-1 boundary corrections as ops/subpixel.py (conv1's up
branch only: the skip is genuinely zero-padded, which already matches
'same' padding, and a 1x1 projection never reads a cropped row).

Forward-only (no custom VJP) — inference path; training keeps the XLA
decoder (guarded in train/step.py like conv_impl='pallas').
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# the chip's scoped-vmem stack limit is 16 MB (measured: a 16.99M
# allocation was rejected); leave headroom for compiler overheads
_VMEM_BUDGET = 13 * 1024 * 1024

# Fold matrices F[p][dh, a]: K'_p[a] = sum_dh F[p][dh, a] * K[dh]
# (ops/subpixel.py convention: p=0 folds taps (K0 | K1+K2) over coarse
# rows (i-1, i); p=1 folds (K0+K1 | K2) over rows (i, i+1)).
_F = [np.array([[1.0, 0.0], [0.0, 1.0], [0.0, 1.0]]),
      np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])]


def fold_decoder_kernel(kernel: jax.Array, cu: int,
                        proj_kernel: Optional[jax.Array] = None
                        ) -> jax.Array:
    """Fold a (3, 3, 3, Cu+Cs, Co) concat-conv kernel (and optionally the
    (1, 1, 1, Cu+Cs, Co) residual projection) for the fused coarse-grid
    kernel.

    Returns kf (2, 3, 2, 3, Cu + 4*Cs, N): dims are (output H-parity p,
    dl, a with coarse row offset da = p - 1 + a, db + 1), K rows are
    [coarse channels | skip (alpha, beta, cs)], N columns are q-major
    (q * Co + co) for conv1, then the projection's q-major block.
    """
    cin, co = kernel.shape[-2:]
    cs = cin - cu
    k = kernel.astype(jnp.float32)
    ku, ks = k[..., :cu, :], k[..., cu:, :]
    n = 2 * co * (2 if proj_kernel is not None else 1)

    kf = jnp.zeros((2, 3, 2, 3, cu + 4 * cs, n), jnp.float32)
    for p in (0, 1):
        for q in (0, 1):
            nlo = q * co
            # --- coarse (upsampled) branch: fold dy with F[p], dx with
            # F[q]; F[q]'s extent-2 db axis zero-embeds at db = q-1 + b.
            kuf = jnp.einsum("ha,wb,dhwio->dabio",
                             jnp.asarray(_F[p]), jnp.asarray(_F[q]), ku)
            for a in (0, 1):
                for b in (0, 1):
                    db = q - 1 + b
                    kf = kf.at[p, :, a, db + 1, :cu, nlo:nlo + co].add(
                        kuf[:, a, b])
            # --- skip branch: fine tap (dy, dx) lives at coarse offset
            # (da, db) and parity (alpha, beta) with dy = 2*da + alpha - p
            for a in (0, 1):
                da = p - 1 + a
                for alpha in (0, 1):
                    dy = 2 * da + alpha - p
                    if not -1 <= dy <= 1:
                        continue
                    for db in (-1, 0, 1):
                        for beta in (0, 1):
                            dx = 2 * db + beta - q
                            if not -1 <= dx <= 1:
                                continue
                            klo = cu + alpha * 2 * cs + beta * cs
                            kf = kf.at[p, :, a, db + 1, klo:klo + cs,
                                       nlo:nlo + co].add(
                                ks[:, dy + 1, dx + 1])
            # --- residual projection: a single tap (center dl, da=0 ->
            # a = 1-p, db=0) reads coarse (i, j) and the skip's own
            # (p, q) parity plane — exact for a 1x1 kernel.
            if proj_kernel is not None:
                kd = proj_kernel.astype(jnp.float32)[0, 0, 0]
                nplo = 2 * co + q * co
                kf = kf.at[p, 1, 1 - p, 1, :cu, nplo:nplo + co].add(
                    kd[:cu])
                klo = cu + p * 2 * cs + q * cs
                kf = kf.at[p, 1, 1 - p, 1, klo:klo + cs,
                           nplo:nplo + co].add(kd[cu:])
    return kf


def fold_skip(skip: jax.Array, hc: int, wc: int) -> jax.Array:
    """(B, L, hf, wf, Cs) -> (B, L, hc, wc, 4*Cs) with channel layout
    (alpha, beta, cs); odd fine dims are zero-padded (matching the
    concat-conv's 'same' zero padding). The beta fold is a free reshape
    in channels-last layout; only alpha needs a transpose."""
    b, l, hf, wf, cs = skip.shape
    skip = jnp.pad(skip, ((0, 0), (0, 0), (0, 2 * hc - hf),
                          (0, 2 * wc - wf), (0, 0)))
    skip = skip.reshape(b, l, hc, 2, wc, 2 * cs)
    skip = jnp.transpose(skip, (0, 1, 2, 4, 3, 5))
    return skip.reshape(b, l, hc, wc, 4 * cs)


def _pick_tiles(l: int, hc: int, w_out: int, kp: int, n: int,
                isz: int, osz: int, budget: int) -> Tuple[int, int]:
    """Pick (l_t, th) fitting VMEM with the largest matmul M."""
    kf_b = 2 * 3 * 2 * 3 * kp * n * isz        # persistent scratch, 1 copy
    best = None
    for l_t in (l, 16, 8, 4, 2, 1):
        if l_t > l or l % l_t:
            continue
        for th in (hc, 32, 16, 13, 8, 5, 4, 2, 1):
            if th > hc:
                continue
            slab = (l_t + 2) * (th + 2) * (w_out + 8) * kp * isz
            acc = l_t * th * w_out * n * 4
            outb = l_t * th * 2 * w_out * n * osz * 2
            if kf_b + slab + acc + outb <= budget:
                m = l_t * th * w_out
                # tie-break: least slab-halo DMA amplification (th=1
                # re-reads every row 3x)
                halo = ((l_t + 2) * (th + 2)) / (l_t * th)
                key = (min(m, 8192), -halo)
                if best is None or key > best[0]:
                    best = (key, (l_t, th))
                break
    if best is None:
        raise ValueError(
            f"no VMEM-feasible tiling for fused decoder L{l} "
            f"{hc}x{w_out}xK{kp}->{n}")
    return best[1]


def _kernel(kf_ref, xp_ref, out_ref, kf_vmem, slab, sem, ksem,
            *, l_t, th, w_out, n):
    b = pl.program_id(0)
    lt = pl.program_id(1)
    ht = pl.program_id(2)

    @pl.when(jnp.logical_and(b == 0, jnp.logical_and(lt == 0, ht == 0)))
    def _load_kf():
        kcopy = pltpu.make_async_copy(kf_ref, kf_vmem, ksem)
        kcopy.start()
        kcopy.wait()

    copy = pltpu.make_async_copy(
        xp_ref.at[b, pl.ds(lt * l_t, l_t + 2), pl.ds(ht * th, th + 2)],
        slab, sem)
    copy.start()
    copy.wait()

    for p in (0, 1):
        acc = jnp.zeros((l_t * th * w_out, n), jnp.float32)
        for dl in range(3):
            for a in range(2):
                r0 = p + a          # slab row offset: (da = p-1+a) + 1
                for db in range(3):
                    x = slab[dl:dl + l_t, r0:r0 + th, db:db + w_out, :]
                    x = x.reshape(l_t * th * w_out, x.shape[-1])
                    acc = acc + jax.lax.dot_general(
                        x, kf_vmem[p, dl, a, db],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        out_ref[0, :, :, p] = acc.reshape(l_t, th, w_out, n).astype(
            out_ref.dtype)


def _fused_conv_even(x: jax.Array, kf: jax.Array, out_dtype,
                     k_align: int = 128) -> jax.Array:
    """Run the fused kernel on the folded input x (B, L, hc, wc, K) with
    kf (2, 3, 2, 3, K, N); returns the even coarse-parity output
    (B, L, hc, 2, wc, N) cropped to hc/wc (fine views are the caller's
    free reshapes)."""
    b, l, hc, wc, k = x.shape
    n = kf.shape[-1]
    interpret = jax.default_backend() != "tpu"
    isz = x.dtype.itemsize
    osz = jnp.dtype(out_dtype).itemsize
    # K padded to a lane-tile multiple (the manual slab DMA slices the
    # lane dim in full; Mosaic wants 128-aligned arrays — k_align=64 is
    # an experimental half-tile mode)
    kp = -(-k // k_align) * k_align
    wp = -(-wc // 16) * 16             # sublane-tile aligned kernel width
    # interpret mode (CPU tests) has no real VMEM; relax so tiny f32
    # test shapes with outsized folded kernels still pick a tiling
    budget = _VMEM_BUDGET * (8 if interpret else 1)
    l_t, th = _pick_tiles(l, hc, wp, kp, n, isz, osz, budget)
    hp = -hc % th
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + hp), (1, 7 + wp - wc),
                     (0, kp - k)))
    kfp = jnp.pad(kf.astype(x.dtype), ((0, 0),) * 4 + ((0, kp - k), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, l_t=l_t, th=th, w_out=wp, n=n),
        grid=(b, l // l_t, (hc + hp) // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, l_t, th, 2, wp, n),
            lambda bi, li, hi: (bi, li, hi, 0, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, hc + hp, 2, wp, n),
                                       out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 3, 2, 3, kp, n), x.dtype),
            pltpu.VMEM((l_t + 2, th + 2, wp + 8, kp), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * l * (hc + hp) * wp * kp * n * 36,
            bytes_accessed=(xp.size * isz
                            + b * l * hc * 2 * wp * n * osz),
            transcendentals=0,
        ),
        interpret=interpret,
    )(kfp, xp)
    return out[:, :, :hc, :, :wc]


def _conv(x, k, pad_l, pad_h, pad_w):
    return lax.conv_general_dilated(
        x, k, (1, 1, 1), [pad_l, pad_h, pad_w],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)


def fused_up_concat_conv(
    coarse: jax.Array,
    skip: jax.Array,
    kernel: jax.Array,
    proj_kernel: Optional[jax.Array] = None,
    out_dtype: Optional[jnp.dtype] = None,
    k_align: int = 128,
):
    """conv3d(3x3x3, stride 1, 'same') of concat([nearest_up2(coarse)
    cropped to skip's (H, W), skip], channel-last) — the decoder block's
    conv1 (reference: scripts/unet_2layer.py:355-371) — as one fused
    Pallas kernel on the coarse grid, optionally co-computing the
    residual 1x1x1 projection of the same concat input in the same dots.

    Args:
      coarse: (B, L, hc, wc, Cu); skip: (B, L, hf, wf, Cs) with
        hf in {2hc, 2hc-1}, wf in {2wc, 2wc-1}.
      kernel: (3, 3, 3, Cu+Cs, Co), concat channel order (up | skip).
      proj_kernel: optional (1, 1, 1, Cu+Cs, Co); only supported when
        2*Co <= 64 (the projection fills the dot's N to a full lane
        tile). No bias — add it outside.
    Returns:
      (B, L, hf, wf, Co) in out_dtype (default: coarse.dtype; f32
      accumulation), or a (conv_out, proj_out) pair when proj_kernel
      is given.
    """
    b, l, hc, wc, cu = coarse.shape
    hf, wf = skip.shape[2], skip.shape[3]
    assert hf in (2 * hc, 2 * hc - 1) and wf in (2 * wc, 2 * wc - 1), (
        coarse.shape, skip.shape)
    co = kernel.shape[-1]
    assert 2 * co <= 128, (
        f"fused decoder kernel supports Co <= 64 (one N tile); got {co}")
    assert proj_kernel is None or 4 * co <= 128, (
        f"projection fusion needs Co <= 32 (4*Co N lanes); got {co}")
    out_dtype = out_dtype or coarse.dtype

    kf = fold_decoder_kernel(kernel, cu, proj_kernel)
    x = jnp.concatenate([coarse, fold_skip(skip, hc, wc)], axis=-1)
    out = _fused_conv_even(x, kf, out_dtype, k_align)   # (B,L,hc,2,wc,N)
    if proj_kernel is not None:
        proj = out[..., 2 * co:].reshape(b, l, 2 * hc, 2 * wc, co)
        proj = proj[:, :, :hf, :wf]
        out = out[..., :2 * co]
    fine = out.reshape(b, l, 2 * hc, 2 * wc, co)

    # Odd-size boundary corrections (conv1's up branch only; the
    # zero-padded skip already matches the conv's 'same' padding, and a
    # 1x1 projection never reads a cropped row): the fold assumed fine
    # row 2hc-1 = coarse[hc-1], but for odd hf that row is cropped and
    # 'same' pads it with zero. Mirrors ops/subpixel.py's corrections,
    # applied on the uncropped even grid — the fine slice happens last.
    ku = kernel.astype(jnp.float32)[..., :cu, :]
    fh = [jnp.asarray(f, jnp.float32) for f in _F]
    cf = coarse.astype(jnp.float32)
    odd_h, odd_w = hf == 2 * hc - 1, wf == 2 * wc - 1
    if odd_h:
        # output fine row 2hc-2 (p=0, dy=+1): subtract the dh=2 tap of
        # the W-upsampled coarse row hc-1, with dx folded per q.
        row = cf[:, :, hc - 1:hc]                      # (B, L, 1, wc, Cu)
        corr_rows = []
        for q in (0, 1):
            k2 = jnp.einsum("wb,dwio->dbio", fh[q], ku[:, 2])[:, None]
            corr = _conv(row, k2, (1, 1), (0, 0),
                         (1, 0) if q == 0 else (0, 1))[:, :, 0]
            corr_rows.append(corr)                     # (B, L, wc, Co)
        delta = jnp.stack(corr_rows, axis=3)           # (B, L, wc, 2, Co)
        delta = delta.reshape(b, l, 2 * wc, co)
        fine = fine.at[:, :, 2 * hc - 2].add(-delta.astype(fine.dtype))
    if odd_w:
        col = cf[:, :, :, wc - 1:wc]                   # (B, L, hc, 1, Cu)
        corr_cols = []
        for p in (0, 1):
            k2 = jnp.einsum("ha,dhio->daio", fh[p], ku[:, :, 2])[:, :, None]
            corr = _conv(col, k2, (1, 1),
                         (1, 0) if p == 0 else (0, 1), (0, 0))[:, :, :, 0]
            corr_cols.append(corr)                     # (B, L, hc, Co)
        delta = jnp.stack(corr_cols, axis=3)           # (B, L, hc, 2, Co)
        delta = delta.reshape(b, l, 2 * hc, co)
        fine = fine.at[:, :, :, 2 * wc - 2].add(-delta.astype(fine.dtype))
    if odd_h and odd_w:
        # the (dh=2, dw=2) cross term was removed once per axis: add it
        # back once at fine (2hc-2, 2wc-2)
        corner = cf[:, :, hc - 1:hc, wc - 1:wc]
        k22 = ku[:, 2, 2][:, None, None]
        cc = _conv(corner, k22, (1, 1), (0, 0), (0, 0))[:, :, 0, 0]
        fine = fine.at[:, :, 2 * hc - 2, 2 * wc - 2].add(
            cc.astype(fine.dtype))

    fine = fine[:, :, :hf, :wf]
    if proj_kernel is not None:
        return fine, proj
    return fine
