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
_INT32_MIN = np.int32(np.iinfo(np.int32).min)


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


# ---------------------------------------------------------------------------
# Fused generation + chain compaction
# ---------------------------------------------------------------------------
#
# gen_pack writes the (B, C-1, P, H, W) keys/kx grids to HBM (~208 MB per
# 16-frame 260x346 window) only for the chain compaction to stream them
# straight back in.  At the measured Mosaic stream rate that round trip is
# the compaction's DMA floor (tools/perf_probe.py stage2_roofline).
# `gen_compact` fuses both passes: the same per-column relocation/slope/
# key-packing math runs on (H, 128) column blocks, each bin's candidates
# are front-packed per 128-sublane sub-chunk and placed into a per-bin
# VMEM accumulator (the `place` algorithm of compact_pallas), and only the
# compacted (frame*bin, cap_bin) rows ever reach HBM.
#
# Candidate order within a row becomes (polarity, w-block, h, w%128)
# instead of the unfused (polarity, h, w).  The downstream per-row sort
# canonicalizes order (ties break on the voxel id packed in the key's low
# bits, which encodes the TRUE grid position either way), so the final
# event stream is bit-identical to the unfused path whenever the capacity
# knobs don't bind; for W <= 128 the processing order coincides and the
# paths are bit-identical unconditionally (tests/test_gen_pallas.py).
# Under cap_bin/multi_cap overflow the two paths drop *different* whole
# chunks — both account the loss exactly via `dropped`.


def supported_compact(h: int, w: int, strategy: str, mepv: int,
                      chunk: int = 16384) -> bool:
    """Whether the fused gen+compact kernel covers this configuration.

    Uncovered corners (bidirectional relocation, spatial pooling, the
    'random' strategy, mepv == 1 slope, VMEM blow-ups) fall back to
    `gen_pack` + `compact_rows`, then to the pure-XLA path."""
    if strategy not in ("none", "slope"):
        return False
    if strategy == "slope" and mepv <= 1:
        return False
    n_pay = 1 if strategy == "slope" else 0
    sc = chunk // _LANES
    cb = 9
    vmem = (2 * 11 * h * _LANES * 4            # double-buffered input block
            + cb * (1 + n_pay) * (sc + h + 1) * _LANES * 4   # accumulators
            + (1 + n_pay) * sc * _LANES * 4                  # send buffer
            + (6 + 2 * cb) * h * _LANES * 4)   # live temporaries
    return vmem <= 90 * 1024 * 1024


def _gen_compact_kernel(v_ref, *rest, cb, p, h, w, n_wi, fps_f, cbf, vs2,
                        bs_f, bs_us, vox_bits, ts_cap, mepv, with_kx,
                        chunk, cap_chunks):
    from v2ce_toolbox_tpu.ops.compact_pallas import _front_pack, _roll

    n_pay = 1 if with_kx else 0
    out_keys = rest[0]
    out_kx = rest[1] if with_kx else None
    sums_ref = rest[1 + n_pay]
    acc = rest[2 + n_pay]         # VMEM (cb, 1+n_pay, 2*sc+1, 128)
    send = rest[3 + n_pay]        # VMEM (1+n_pay, sc, 128)
    state = rest[-3]              # SMEM (cb, 4): pend, cidx, total, kept
    fsums = rest[-2]              # SMEM (2,): frame emit, cap-drop
    sem = rest[-1]

    b = pl.program_id(0)
    po = pl.program_id(1)
    wi = pl.program_id(2)
    sc = chunk // _LANES

    @pl.when((po == 0) & (wi == 0))
    def _():
        fsums[0] = 0
        fsums[1] = 0
        for ci in range(cb):
            state[ci, 0] = 0
            state[ci, 1] = 0
            state[ci, 2] = 0
            state[ci, 3] = 0
            acc[ci, 0] = jnp.full_like(acc[ci, 0], INVALID)
            for i in range(n_pay):
                acc[ci, 1 + i] = jnp.zeros_like(acc[ci, 1 + i])

    lane = jax.lax.broadcasted_iota(jnp.int32, (h, _LANES), 1)
    rows_g = jax.lax.broadcasted_iota(jnp.int32, (h, _LANES), 0)
    col = wi * _LANES + lane
    in_col = col < w              # the last W block reads padding lanes

    # --- relocation: identical f32 op sequence to _gen_kernel (the
    # debt scan is per-column, and the wi blocks cover disjoint columns,
    # so every covered column computes bit-identically) ----
    debt = jnp.zeros((h, _LANES), jnp.float32)
    counts = []
    tend = []
    for ci in range(cb):
        yb = v_ref[0, 0, ci]
        avail = yb - debt
        cf = jnp.ceil(avail - 1e-6)
        debt = cf - avail
        counts.append(cf.astype(jnp.int32))
        tend.append(debt)
    counts[cb - 1] = counts[cb - 1] + (
        v_ref[0, 0, cb] - debt).astype(jnp.int32)
    cnt_f = [c.astype(jnp.float32) for c in counts]

    vox = (po * h + rows_g) * w + col

    emit_acc = jnp.zeros((), jnp.int32)
    drop_acc = jnp.zeros((), jnp.int32)

    for ci in range(cb):
        cnt = counts[ci]
        is_chain = cnt == 1
        if with_kx:
            emit = jnp.where(is_chain, 1, jnp.minimum(cnt, mepv))
            emit = jnp.maximum(emit, 0)
        else:
            emit = is_chain.astype(jnp.int32)
        emit = jnp.where(in_col, emit, 0)   # padding lanes never emit

        ts_us = ((tend[ci] / fps_f / cbf + bs_f[ci])
                 * jnp.float32(1e6)).astype(jnp.int32)
        rel = jnp.clip(ts_us - bs_us[ci], 0, ts_cap)
        if with_kx:
            rel = jnp.where(is_chain, rel, 0)
        key = jnp.where(emit > 0, (rel << vox_bits) | vox, INVALID)

        pays = []
        if with_kx:
            if ci == 0 or ci == cb - 1:
                k = jnp.zeros((h, _LANES), jnp.float32)
            else:
                k_raw = (cnt_f[ci + 1] - cnt_f[ci - 1]) * jnp.float32(0.5)
                k = k_raw / vs2 / (cnt_f[ci] + jnp.float32(1e-8))
            extra = jnp.minimum(jnp.maximum(cnt - 1, 0), mepv - 1)
            extra = jnp.minimum(extra, 255)
            kbits = pltpu.bitcast(k, jnp.int32)
            pays = [(kbits & ~jnp.int32(0xFF)) | extra]
            drop_acc = drop_acc + jnp.sum(
                jnp.where(in_col & (cnt > mepv), cnt - mepv, 0))
        emit_acc = emit_acc + jnp.sum(emit)

        # --- compaction: ONE front-pack of the whole (h, 128) block,
        # then place at this bin row's running offset with as many pops
        # as the block can overflow (per-sub-chunk packing measured
        # slower on chip: 3x the sequencing units for 15% fewer
        # butterfly element-stages) ----
        sub_w = h * _LANES
        lane_s = jax.lax.broadcasted_iota(jnp.int32, (h, _LANES), 1)
        flat_s = (jax.lax.broadcasted_iota(
            jnp.int32, (h, _LANES), 0) * _LANES + lane_s)
        k_sub, p_subs, cnt_v = _front_pack(key, list(pays), lane_s,
                                           flat_s, sub_w)

        pend = state[ci, 0]
        state[ci, 2] = state[ci, 2] + cnt_v
        rr = pend // _LANES
        ll = pend % _LANES
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (h + 1, _LANES), 1)
        gflat = (rr + jax.lax.broadcasted_iota(
            jnp.int32, (h + 1, _LANES), 0)) * _LANES + lane2
        window_m = (gflat >= pend) & (gflat < pend + cnt_v)

        def place(tile, fill, slot, ci=ci, ll=ll, rr=rr,
                  window_m=window_m, lane2=lane2):
            padded = jnp.concatenate(
                [tile, jnp.full((1, _LANES), fill, tile.dtype)], axis=0)
            al = pltpu.roll(padded, ll, axis=1)
            bl = pltpu.roll(_roll(padded, 1, axis=0), ll, axis=1)
            shifted = jnp.where(lane2 >= ll, al, bl)
            region = acc[ci, slot, pl.ds(rr, h + 1)]
            acc[ci, slot, pl.ds(rr, h + 1)] = jnp.where(
                window_m, shifted, region)

        place(k_sub, INVALID, 0)
        for i, ps in enumerate(p_subs):
            place(ps, 0, 1 + i)

        new_pend = pend + cnt_v
        n_pops = (chunk - 1 + h * _LANES) // chunk
        for _pop in range(n_pops):
            cidx = state[ci, 1]

            @pl.when((new_pend >= chunk) & (cidx < cap_chunks))
            def _(ci=ci, cidx=cidx):
                send[0] = acc[ci, 0, :sc]
                copy = pltpu.make_async_copy(
                    send.at[0], out_keys.at[b * cb + ci, cidx], sem)
                copy.start()
                copy.wait()
                for i in range(n_pay):
                    send[1 + i] = acc[ci, 1 + i, :sc]
                    copy = pltpu.make_async_copy(
                        send.at[1 + i], out_kx.at[b * cb + ci, cidx], sem)
                    copy.start()
                    copy.wait()
                state[ci, 1] = cidx + 1
                state[ci, 3] = state[ci, 3] + chunk

            @pl.when(new_pend >= chunk)
            def _(ci=ci):
                fills = [jnp.full((sc, _LANES), INVALID, jnp.int32)] + [
                    jnp.zeros((sc, _LANES), jnp.int32)] * n_pay
                for slot in range(1 + n_pay):
                    acc[ci, slot] = jnp.concatenate(
                        [acc[ci, slot, sc:], fills[slot]], axis=0)

            new_pend = jnp.where(new_pend >= chunk, new_pend - chunk,
                                 new_pend)

        state[ci, 0] = new_pend

    fsums[0] = fsums[0] + emit_acc
    fsums[1] = fsums[1] + drop_acc

    @pl.when((po == p - 1) & (wi == n_wi - 1))
    def _():
        for ci in range(cb):
            cidx2 = state[ci, 1]

            @pl.when((state[ci, 0] > 0) & (cidx2 < cap_chunks))
            def _(ci=ci, cidx2=cidx2):
                send[0] = acc[ci, 0, :sc]
                copy = pltpu.make_async_copy(
                    send.at[0], out_keys.at[b * cb + ci, cidx2], sem)
                copy.start()
                copy.wait()
                for i in range(n_pay):
                    send[1 + i] = acc[ci, 1 + i, :sc]
                    copy = pltpu.make_async_copy(
                        send.at[1 + i], out_kx.at[b * cb + ci, cidx2], sem)
                    copy.start()
                    copy.wait()
                state[ci, 3] = state[ci, 3] + state[ci, 0]

            lane0 = jax.lax.broadcasted_iota(jnp.int32, (sc, _LANES), 1)
            counts_tile = jnp.where(
                lane0 == 0, state[ci, 3],
                jnp.where(lane0 == 1, state[ci, 2], 0))
            send[0] = counts_tile
            copy = pltpu.make_async_copy(
                send.at[0], out_keys.at[b * cb + ci, cap_chunks], sem)
            copy.start()
            copy.wait()

        lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
        row0 = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 0) == 0
        sums_ref[0] = jnp.where(
            row0 & (lane8 == 0), fsums[0],
            jnp.where(row0 & (lane8 == 1), fsums[1], 0))


@functools.partial(
    jax.jit,
    static_argnames=("fps", "t0", "strategy", "mepv", "vox_bits",
                     "cap_bin", "chunk"))
def gen_compact(voxels: jax.Array, *, fps: int, t0: float, strategy: str,
                mepv: int, vox_bits: int, cap_bin: int, chunk: int = 16384
                ) -> Tuple[jax.Array, Optional[jax.Array], jax.Array,
                           jax.Array, jax.Array, jax.Array]:
    """Fused relocate + slope + candidate packing + CHAIN COMPACTION.

    Returns:
      rows_keys: (B*(C-1), cap') int32 front-packed per-(frame, bin)
        candidate rows (cap' = cap_bin rounded up to a chunk multiple),
        INVALID beyond `kept` — drop-in for the output of
        ``compact_rows(gen_pack(...), cap=cap_bin)``.
      rows_kx:   same-shape slope payload rows ('slope'), else None.
      kept:      (B*(C-1),) int32 valid count per row (min(total, cap')).
      total:     (B*(C-1),) int32 pre-cap candidate count per row.
      emit:      (B,) int32 per-frame emitted-candidate totals.
      drop:      (B,) int32 per-frame over-cap (counts > mepv) drops.
    """
    bb, p, c, h, w = voxels.shape
    cb = c - 1
    n_wi = -(-w // _LANES)
    with_kx = strategy == "slope"
    n_pay = 1 if with_kx else 0
    cap_chunks = -(-cap_bin // chunk)
    cap_pad = cap_chunks * chunk
    sc = chunk // _LANES
    voxel_step = 1.0 / fps / cb
    ts_cap = (1 << (31 - vox_bits)) - 2

    bs_np = (np.arange(cb, dtype=np.float32) * np.float32(voxel_step)
             + np.float32(t0))
    bs_us_np = (bs_np * np.float32(1e6)).astype(np.int32)

    kernel = functools.partial(
        _gen_compact_kernel, cb=cb, p=p, h=h, w=w, n_wi=n_wi,
        fps_f=np.float32(fps), cbf=np.float32(cb),
        vs2=np.float32(voxel_step ** 2),
        bs_f=[np.float32(v) for v in bs_np],
        bs_us=[np.int32(v) for v in bs_us_np],
        vox_bits=vox_bits, ts_cap=np.int32(ts_cap), mepv=mepv,
        with_kx=with_kx, chunk=chunk, cap_chunks=cap_chunks)

    out_shapes = [jax.ShapeDtypeStruct((bb * cb, cap_chunks + 1, sc,
                                        _LANES), jnp.int32)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
    if with_kx:
        out_shapes.append(jax.ShapeDtypeStruct(
            (bb * cb, cap_chunks, sc, _LANES), jnp.int32))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
    out_shapes.append(jax.ShapeDtypeStruct((bb, 8, _LANES), jnp.int32))
    out_specs.append(pl.BlockSpec((1, 8, _LANES),
                                  lambda b, po, wi: (b, 0, 0),
                                  memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        kernel,
        grid=(bb, p, n_wi),
        in_specs=[pl.BlockSpec((1, 1, c, h, _LANES),
                               lambda b, po, wi: (b, p - 1 - po, 0, 0, wi),
                               memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((cb, 1 + n_pay, sc + h + 1, _LANES), jnp.int32),
            pltpu.VMEM((1 + n_pay, sc, _LANES), jnp.int32),
            pltpu.SMEM((cb, 4), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(voxels.astype(jnp.float32))

    keys_and_counts = outs[0]
    kept = keys_and_counts[:, cap_chunks, 0, 0]
    total = keys_and_counts[:, cap_chunks, 0, 1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (bb * cb, cap_pad), 1)
    mask = idx < kept[:, None]
    rows_keys = jnp.where(
        mask, keys_and_counts[:, :cap_chunks].reshape(bb * cb, cap_pad),
        INVALID)
    rows_kx = None
    if with_kx:
        rows_kx = jnp.where(mask, outs[1].reshape(bb * cb, cap_pad), 0)
    sums = outs[-1]
    emit = sums[:, 0, 0]
    drop = sums[:, 0, 1] if with_kx else jnp.zeros((bb,), jnp.int32)
    return rows_keys, rows_kx, kept, total, emit, drop
