"""Fused candidate-generation kernel for the v3 LDATI sampler.

One Pallas pass replaces the sampler's generation phase — relocation
(`ldati.relocate_counts`, the reference's integer/tendency split,
/root/reference/scripts/LDATI.py:86-106), slope fitting
(`ldati.slope_params`, LDATI.py:25-45,188-190) and candidate-key packing
(`ldati._sample_events_v3` step 1) — which as XLA ops materializes
counts/tendency/k grids between stages (~740 MB of HBM traffic per
16-frame window) AND needs the pre-ordering transpose of the 115 MB
input grid. The kernel reads the sampler's native (B, P, C, H, W) grid
directly (the polarity flip and the bin-major reordering are index
arithmetic, not data movement), keeps every intermediate in VMEM, and
writes only the packed candidate keys (+ slope payload). Measured on
chip (tools/perf_probe.py gen): 7.1 ms -> 4.4 ms per 16-frame window;
sampler total 19.7 -> 15.4 ms (probe sampler_t).

Bit-exactness contract: every float expression reproduces the XLA path's
op sequence (same f32 ops in the same order, same truncating converts),
so the packed keys, payloads and the emit/capacity-drop totals are
IDENTICAL to the unfused path — asserted stream-for-stream in
tests/test_gen_pallas.py. Integer sums are order-independent, so the
per-frame reductions accumulate per grid step without loss.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INVALID = np.int32(np.iinfo(np.int32).max)
_LANES = 128


def _block_rows(h: int) -> int:
    """Row-block height. The TPU lowering requires the sublane
    (second-to-last) block dim to be a multiple of 8 or the full array
    dim, and the block must tile H exactly (padded rows would poison the
    emit sums) — so: the largest multiple-of-8 divisor of h up to 64,
    else the whole height (a 260x346 f32 plane is ~0.35 MB; the full-H
    working set still fits VMEM, see `supported`)."""
    best = h
    for th in range(8, min(h, 64) + 1, 8):
        if h % th == 0:
            best = th
    return best


def supported(h: int, w: int, strategy: str, mepv: int) -> bool:
    """Whether the fused kernel covers this sampler configuration.

    The uncovered corners (bidirectional relocation, spatial pooling,
    mepv == 1 with the 'slope' strategy whose slot-0 draw happens on the
    grid, and grids whose blocks would blow VMEM) fall back to the XLA
    generation path in `ldati.sample_events`.
    """
    if strategy not in ("none", "slope"):
        return False
    if strategy == "slope" and mepv <= 1:
        return False
    # per-step VMEM with polarity in the grid: input block (C planes) +
    # keys/kx blocks (2*(C-1)), double-buffered by the pipeline, plus
    # ~3*(C+1) live temporaries (counts/tendency/cnt_f). The compiled
    # scoped-vmem limit is 100 MB (vmem_limit_bytes below); keep the
    # model under 90 MB so wide pano grids (merged strips, W > 346:
    # pipeline/driver.py) either fit or fall back instead of failing
    # compile with a scoped-vmem OOM.
    th = _block_rows(h)
    planes = 2 * (10 + 2 * 9) + 3 * 11
    return planes * th * w * 4 <= 90 * 1024 * 1024


def _gen_kernel(v_ref, keys_ref, *rest, cb, p, th, w, h, fps_f, cbf, vs2,
                bs_f, bs_us, vox_bits, ts_cap, mepv, with_kx, n_h):
    if with_kx:
        kx_ref, sums_ref = rest[0], rest[1]
    else:
        kx_ref, sums_ref = None, rest[0]
    acc = rest[-1]                     # SMEM (2,) int32: emit, capdrop

    po = pl.program_id(1)              # output polarity (0 = ON); the
    hi = pl.program_id(2)              # input BlockSpec applies the flip

    @pl.when((po == 0) & (hi == 0))
    def _():
        acc[0] = 0
        acc[1] = 0

    rows = jax.lax.broadcasted_iota(jnp.int32, (th, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (th, w), 1)

    emit_acc = jnp.zeros((), jnp.int32)
    drop_acc = jnp.zeros((), jnp.int32)

    # --- relocation: 9-step debt scan over the time bins
    # (LDATI.py:99), identical f32 ops to ldati.relocate_counts ----
    debt = jnp.zeros((th, w), jnp.float32)
    counts = []
    tend = []
    for ci in range(cb):
        yb = v_ref[0, 0, ci]
        avail = yb - debt
        cf = jnp.ceil(avail - 1e-6)
        debt = cf - avail
        counts.append(cf.astype(jnp.int32))
        tend.append(debt)
    # fold the final input bin into the last output bin, truncating
    # toward zero (ldati.relocate_counts / LDATI.py:106)
    counts[cb - 1] = counts[cb - 1] + (
        v_ref[0, 0, cb] - debt).astype(jnp.int32)

    cnt_f = [c.astype(jnp.float32) for c in counts]

    # within-bin flat voxel id on the P-flipped (p, h, w) order
    vox = (po * h + hi * th + rows) * w + cols

    for ci in range(cb):
        cnt = counts[ci]
        is_chain = cnt == 1
        if with_kx:
            emit = jnp.where(is_chain, 1, jnp.minimum(cnt, mepv))
            emit = jnp.maximum(emit, 0)
        else:
            emit = is_chain.astype(jnp.int32)

        # chain timestamp -> relative µs (same float path as the
        # wrapper: tendency / fps / cb + bin_start, * 1e6, truncate)
        ts_us = ((tend[ci] / fps_f / cbf + bs_f[ci])
                 * jnp.float32(1e6)).astype(jnp.int32)
        rel = jnp.clip(ts_us - bs_us[ci], 0, ts_cap)
        if with_kx:
            rel = jnp.where(is_chain, rel, 0)

        keys_ref[0, ci, 0] = jnp.where(
            emit > 0, (rel << vox_bits) | vox, INVALID)

        if with_kx:
            # slope k (ldati.slope_params: symmetric difference of
            # the relocated integer counts, zero at the boundary
            # bins) with the extra-event count packed into its 8 low
            # mantissa bits
            if ci == 0 or ci == cb - 1:
                k = jnp.zeros((th, w), jnp.float32)
            else:
                k_raw = (cnt_f[ci + 1] - cnt_f[ci - 1]
                         ) * jnp.float32(0.5)
                k = k_raw / vs2 / (cnt_f[ci] + jnp.float32(1e-8))
            extra = jnp.minimum(jnp.maximum(cnt - 1, 0), mepv - 1)
            extra = jnp.minimum(extra, 255)
            kbits = pltpu.bitcast(k, jnp.int32)
            kx_ref[0, ci, 0] = (kbits & ~jnp.int32(0xFF)) | extra
            drop_acc = drop_acc + jnp.sum(
                jnp.where(cnt > mepv, cnt - mepv, 0))
        emit_acc = emit_acc + jnp.sum(emit)

    acc[0] = acc[0] + emit_acc
    acc[1] = acc[1] + drop_acc

    @pl.when((po == p - 1) & (hi == n_h - 1))
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
        row0 = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 0) == 0
        sums_ref[0] = jnp.where(
            row0 & (lane == 0), acc[0],
            jnp.where(row0 & (lane == 1), acc[1], 0))


@functools.partial(
    jax.jit,
    static_argnames=("fps", "t0", "strategy", "mepv", "vox_bits"))
def gen_pack(voxels: jax.Array, *, fps: int, t0: float, strategy: str,
             mepv: int, vox_bits: int
             ) -> Tuple[jax.Array, Optional[jax.Array],
                        jax.Array, jax.Array]:
    """Fused relocate + slope + candidate packing on the raw voxel grid.

    Args:
      voxels: (B, P, C, H, W) float voxel grid (C = 10 input bins,
        P index 0 = ON) — the `sample_events` entry layout; the kernel
        applies the polarity flip and bin-major candidate ordering via
        index arithmetic.
      vox_bits: bit width of the within-bin voxel id in the packed key.
    Returns:
      keys:  (B, C-1, P, H, W) int32 packed candidates (INVALID = empty);
        reshaping to (B*(C-1), P*H*W) yields the bin-major rows the
        chain compaction consumes.
      kx:    same-shape slope payload (strategy='slope'), else None.
      emit:  (B,) int32 per-frame emitted-candidate totals.
      drop:  (B,) int32 per-frame over-cap (counts > mepv) drop totals.
    """
    bb, p, c, h, w = voxels.shape
    cb = c - 1
    th = _block_rows(h)
    assert strategy in ("none", "slope")
    n_h = h // th
    with_kx = strategy == "slope"
    voxel_step = 1.0 / fps / cb
    ts_cap = (1 << (31 - vox_bits)) - 2

    # per-bin f32 constants, computed with numpy f32 semantics so they
    # match XLA's constant folding of the wrapper's arange expressions
    bs_np = (np.arange(cb, dtype=np.float32) * np.float32(voxel_step)
             + np.float32(t0))
    bs_us_np = (bs_np * np.float32(1e6)).astype(np.int32)

    kernel = functools.partial(
        _gen_kernel, cb=cb, p=p, th=th, w=w, h=h,
        fps_f=np.float32(fps), cbf=np.float32(cb),
        vs2=np.float32(voxel_step ** 2),
        bs_f=[np.float32(v) for v in bs_np],
        bs_us=[np.int32(v) for v in bs_us_np],
        vox_bits=vox_bits, ts_cap=np.int32(ts_cap), mepv=mepv,
        with_kx=with_kx, n_h=n_h)

    out_shapes = [jax.ShapeDtypeStruct((bb, cb, p, h, w), jnp.int32)]
    out_specs = [pl.BlockSpec((1, cb, 1, th, w),
                              lambda b, po, hi: (b, 0, po, hi, 0),
                              memory_space=pltpu.VMEM)]
    if with_kx:
        out_shapes.append(
            jax.ShapeDtypeStruct((bb, cb, p, h, w), jnp.int32))
        out_specs.append(pl.BlockSpec((1, cb, 1, th, w),
                                      lambda b, po, hi: (b, 0, po, hi, 0),
                                      memory_space=pltpu.VMEM))
    # per-frame sums ride out in one (8, 128) tile per frame, written at
    # the final row block: [0, 0] = emit total, [0, 1] = capacity drops
    out_shapes.append(jax.ShapeDtypeStruct((bb, 8, _LANES), jnp.int32))
    out_specs.append(pl.BlockSpec((1, 8, _LANES),
                                  lambda b, po, hi: (b, 0, 0),
                                  memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        kernel,
        # polarity rides the grid (output po reads input plane p-1-po:
        # the flip is the index map) so the per-step block set is half
        # the full-P version's — wide merged-pano grids (W > 346) fit
        # the 100 MB scoped-vmem limit instead of OOMing at compile
        grid=(bb, p, n_h),
        in_specs=[pl.BlockSpec((1, 1, c, th, w),
                               lambda b, po, hi: (b, p - 1 - po, 0, hi, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            # 260 has no multiple-of-8 divisor, so the row block is the
            # full height and the in+keys+kx blocks total ~15 MB —
            # above the 16 MB default scoped-vmem budget, well inside
            # the chip's 128 MB
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(voxels.astype(jnp.float32))

    keys = outs[0]
    kx = outs[1] if with_kx else None
    sums = outs[-1]
    emit = sums[:, 0, 0]
    drop = sums[:, 0, 1] if with_kx else jnp.zeros((bb,), jnp.int32)
    return keys, kx, emit, drop
