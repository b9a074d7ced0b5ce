"""LDATI — stage-2 statistical event sampler, as fixed-shape XLA.

Re-design of the reference sampler (reference: scripts/LDATI.py:126-310) for
TPU. The reference pipeline is:

  1. ``y_relocate``: a left-to-right debt-carrying ceil over the 10 time
     bins turns continuous voxel values into integer per-voxel event counts
     plus a fractional "tendency" (the sub-bin offset of the chained event)
     (LDATI.py:80-123). The 10 input bins produce 9 output bins.
  2. Chain timestamps: tendency * voxel_step + bin start + t0, in int µs
     (LDATI.py:155-165).
  3. Voxels with count >= 2 draw *all* their events from a linear-density
     inverse CDF whose slope comes from a 3-tap least-squares fit over
     neighboring bins (LDATI.py:13-51, 188-196); count == 1 voxels keep the
     deterministic chain timestamp (LDATI.py:228); count == 1 voxels are
     excluded from the additional draw (LDATI.py:236).
  4. ``pick_and_sort``: a python loop over batch x channel doing boolean
     gathers, hstacks, argsort, and GPU->CPU transfers per channel
     (LDATI.py:248-310).

The TPU version keeps (1)-(3) as vectorized jnp (scan over bins for the
debt chain) and replaces (4) with compaction designs that avoid TPU's
slow primitives entirely (measured rates in PERF.md: sort 0.4-0.8
Gelem/s, gathers 0.06-1.9 Gelem/s, scatter serializes):

  - the DEFAULT v3 path (`_sample_events_v3`) packs each candidate into a
    30-bit int32 key (sub-bin µs << vox_bits | voxel id), roll-compacts
    the mostly-empty candidate grid with the Pallas kernel in
    ops/compact_pallas.py (2.2 Gelem/s — no sorts/gathers/scatters), and
    needs only ONE small batched sort over the compacted rows. 31 ms per
    16 frames at 260x346 vs 215 ms for the sort/gather design.
  - the v2 path (`compact_frame_events` + `_compact_one_frame`) remains
    for the 'random' strategy, whose whole-frame µs offsets do not fit
    the packed key: one flat kv sort over all candidates with a
    block-granular top_k multi pool.

Candidates that don't fit (per-voxel cap, multi-voxel pool, tier sizes,
buffer capacity) are counted in `dropped` — never silently lost. This
removes every data-dependent shape (the reference sizes its buffer by the
*runtime* max voxel count, LDATI.py:169-171), every per-channel python
loop, and every device->host sync from the hot path.

Numerics notes:
  - The reference computes chain timestamps in float64 (its tendency tensor
    is torch float64); we stay in float32, which can shift a truncated µs
    timestamp by 1 the rare time a value lands on an integer boundary.
  - The inverse-CDF discriminant b^2 + 2*k*u is clamped at 0 before sqrt.
    The reference takes sqrt of a possibly (pathologically) negative value
    and lets NaNs flow into the int cast; clamping yields the CDF endpoint
    instead, which only differs where the reference is undefined.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from v2ce_toolbox_tpu.events import EventStream, to_recarrays

_INT32_MAX = jnp.iinfo(jnp.int32).max


# ---------------------------------------------------------------------------
# 1. Debt-carrying relocation (reference: scripts/LDATI.py:80-123)
# ---------------------------------------------------------------------------

def relocate_counts(
    y: jax.Array,
    *,
    bidirectional: bool = False,
    erase_beginning: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Continuous voxels -> integer counts + fractional tendency.

    Args:
      y: (N, C, H, W) float voxel values (N = batch*polarity, C = 10 bins).
    Returns:
      counts: (N, C-1, H, W) int32 per-voxel event counts.
      tendency: (N, C-1, H, W) float32 sub-bin offsets (unit: one bin).
    """
    n, c, h, w = y.shape
    y = y.astype(jnp.float32)
    if erase_beginning:
        # reference: LDATI.py:86-87
        y = jnp.where(y < 0.001, jnp.zeros_like(y), y)

    from_left_until = (c - 1) if not bidirectional else (c - 1) // 2

    def fwd_step(debt, yslice):
        avail = yslice - debt
        count_f = jnp.ceil(avail - 1e-6)       # reference: LDATI.py:99
        new_debt = count_f - avail
        return new_debt, (count_f, new_debt)

    debt0 = jnp.zeros((n, h, w), jnp.float32)
    fwd_in = jnp.moveaxis(y[:, :from_left_until], 1, 0)
    final_debt, (fwd_counts, fwd_tendency) = lax.scan(fwd_step, debt0, fwd_in)
    fwd_counts = jnp.moveaxis(fwd_counts, 0, 1)
    fwd_tendency = jnp.moveaxis(fwd_tendency, 0, 1)

    if not bidirectional:
        counts = fwd_counts.astype(jnp.int32)
        # Fold the final input bin into the last output bin, truncating
        # toward zero (reference: LDATI.py:106 uses .int()).
        counts = counts.at[:, -1].add((y[:, -1] - final_debt).astype(jnp.int32))
        return counts, fwd_tendency

    # --- bidirectional variant (reference: LDATI.py:107-123) -------------
    # Forward fills bins [0, (C-1)//2); backward fills (C//2, C-2]; the
    # middle bin C//2 meets both. NOTE: for C=10 the reference leaves bin
    # index 4 untouched (forward stops at 3, middle is 5) — we reproduce
    # that behavior exactly.
    counts = jnp.zeros((n, c - 1, h, w), jnp.int32)
    tendency = jnp.zeros((n, c - 1, h, w), jnp.float32)
    counts = counts.at[:, :from_left_until].set(fwd_counts.astype(jnp.int32))
    tendency = tendency.at[:, :from_left_until].set(fwd_tendency)

    def bwd_step(bless, yslice):
        tend = bless                            # recorded BEFORE the update
        y_slice_f = jnp.floor(yslice + bless + 1e-6)
        new_bless = jnp.clip(yslice - y_slice_f + bless, min=0)
        return new_bless, (y_slice_f, tend)

    bwd_idx = list(range(c - 2, c // 2, -1))    # e.g. [8, 7, 6] for C=10
    bwd_in = jnp.stack([y[:, i] for i in bwd_idx], axis=0)
    bless0 = y[:, c - 1]
    final_bless, (bwd_counts, bwd_tendency) = lax.scan(bwd_step, bless0, bwd_in)
    for pos, i in enumerate(bwd_idx):
        counts = counts.at[:, i].set(bwd_counts[pos].astype(jnp.int32))
        tendency = tendency.at[:, i].set(bwd_tendency[pos])

    mid = c // 2
    tendency = tendency.at[:, mid].set(final_bless - final_debt)
    counts = counts.at[:, mid].set(
        jnp.ceil(y[:, mid] + final_bless - final_debt).astype(jnp.int32)
    )
    return counts, tendency


# ---------------------------------------------------------------------------
# 2. Linear-density slope fit (reference: scripts/LDATI.py:13-51, 176-196)
# ---------------------------------------------------------------------------

def _pool_counts(y: jax.Array, pooling_type: str, kernel_size: int) -> jax.Array:
    """Optional spatial pooling before the slope fit
    (reference: LDATI.py:176-184). y: (N, C, H, W) float."""
    if pooling_type == "none":
        return y
    n, c, h, w = y.shape
    x = y.reshape(n * c, h, w, 1)
    if pooling_type == "weighted":
        kern = jnp.array([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]]) / 16.0
        kern = kern[:, :, None, None]
        out = lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    elif pooling_type == "avg":
        k = kernel_size
        pad = k // 2
        # torch AvgPool2d(count_include_pad=True): divide by k*k always.
        out = lax.reduce_window(
            x, 0.0, lax.add, (1, k, k, 1), (1, 1, 1, 1),
            ((0, 0), (pad, pad), (pad, pad), (0, 0)),
        ) / float(k * k)
    else:
        raise ValueError(f"unknown pooling_type {pooling_type!r}")
    return out.reshape(n, c, h, w)


def slope_params(
    counts_f: jax.Array,
    fps: float,
    *,
    pooling_type: str = "none",
    pooling_kernel_size: int = 3,
) -> Tuple[jax.Array, jax.Array]:
    """Per-voxel linear-density parameters (k, b) for additional events.

    The reference's 3-tap least-squares over reflect-padded bins reduces to
    k_raw[c] = (y[c+1] - y[c-1]) / 2, with k_raw = 0 at both boundary bins
    (reflection makes the symmetric difference vanish — LDATI.py:25-45).
    Normalization: k = k_raw / voxel_step^2 / (y + 1e-8); b = 1/voxel_step
    - voxel_step*k/2 so the density integrates to 1 (LDATI.py:188-190).

    Args:
      counts_f: (N, C, H, W) float relocated counts (possibly pooled).
    Returns:
      (k, b): each (N, C, H, W) float32.
    """
    y = _pool_counts(counts_f.astype(jnp.float32), pooling_type, pooling_kernel_size)
    c = y.shape[1]
    voxel_step = 1.0 / fps / c  # after relocation C is already bins-1
    zero = jnp.zeros_like(y[:, :1])
    k_raw = jnp.concatenate([zero, (y[:, 2:] - y[:, :-2]) * 0.5, zero], axis=1)
    k = k_raw / (voxel_step ** 2) / (y + 1e-8)
    b = 1.0 / voxel_step - voxel_step * k / 2.0
    return k, b


def _inverse_cdf_ts(u: jax.Array, k: jax.Array, b: jax.Array,
                    voxel_step: float) -> jax.Array:
    """Sample t in [0, voxel_step] from density f(t) = k*t + b given uniform
    u (reference: LDATI.py:195-196). k == 0 falls back to uniform."""
    disc = jnp.maximum(b * b + 2.0 * k * u, 0.0)
    t = (-b + jnp.sqrt(disc)) / jnp.where(k == 0, 1.0, k)
    return jnp.where(k == 0, u * voxel_step, t)


# ---------------------------------------------------------------------------
# 3. Stream compaction into fixed-capacity buffers
# ---------------------------------------------------------------------------

def compact_frame_events(
    emit_count: jax.Array,     # (V,) int32 — events to emit per voxel
    ts_fn,                     # ts_fn(j, u, vox_idx|None) -> (n,) int32 µs
    key: jax.Array,
    *,
    max_events_per_voxel: int,
    max_multi_voxels: int,
    capacity: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Sort-compact all events of one frame into a capacity-E buffer ordered
    by timestamp — the TPU replacement for the reference's per-channel
    boolean-gather/argsort loops (LDATI.py:248-310 and the twin
    pick_and_sort implementations of the ablation samplers).

    Every voxel contributes its slot-0 event when emit_count > 0; voxels
    with emit_count >= 2 are compacted via top_k into a max_multi_voxels
    pool that contributes slots 1..max_events_per_voxel-1. `ts_fn(j, u,
    vox_idx)` maps slot j and uniform draws u to int32 µs timestamps;
    vox_idx is None for the full-voxel slot-0 call, else the pool's voxel
    indices.

    Returns (t_us, vox_id, count, dropped): sorted timestamps, the flat
    voxel index of each event, the valid count, and how many events were
    lost to the pool/capacity limits (never silently).
    """
    num_voxels = emit_count.shape[0]
    vox_ids = lax.broadcasted_iota(jnp.int32, emit_count.shape, 0)

    u0 = jax.random.uniform(jax.random.fold_in(key, 0), emit_count.shape)
    keys0 = jnp.where(emit_count > 0, ts_fn(0, u0, None), _INT32_MAX)
    key_parts = [keys0]
    id_parts = [vox_ids]
    emitted = jnp.sum((emit_count > 0).astype(jnp.int32))

    if max_events_per_voxel > 1:
        pool = min(max_multi_voxels, num_voxels)
        extra = jnp.maximum(emit_count - 1, 0)
        block = 16
        if num_voxels % block == 0 and pool % block == 0 and \
                pool < num_voxels:
            # Block-granular pool selection: top_k over per-block maxima is
            # 16x less data than top_k over voxels (top_k costs like a full
            # sort on TPU regardless of k). Whole blocks enter the pool;
            # non-multi slots are masked by the pool_extra > j guard below,
            # and multis beyond the pool's blocks surface in `dropped`.
            # Blocks land in the pool in descending-score order, which the
            # tiered slot sizing below relies on.
            vb = num_voxels // block
            block_score = extra.reshape(vb, block).max(axis=1)
            _, blk_idx = lax.top_k(block_score, pool // block)
            pool_idx = (blk_idx[:, None].astype(jnp.int32) * block +
                        lax.broadcasted_iota(jnp.int32, (1, block), 1)
                        ).reshape(pool)
            pool_extra = extra[pool_idx]
        else:
            pool_extra, pool_idx = lax.top_k(extra, pool)
            pool_idx = pool_idx.astype(jnp.int32)

        # Tiered slot sizing: slot j >= 1 is only usable by voxels with
        # extra >= j, which get exponentially rarer with j, yet a flat
        # (mepv-1) x pool candidate buffer dominates the kv-sort volume
        # (2.03M of 3.65M slots at the bench config). The pool is ordered
        # by (block-)extra descending, so the high-j slots only need a
        # prefix of it: full size for j <= 3, then halving with a 4096
        # floor. Any voxel whose extras exceed its tier surfaces in
        # `dropped` via the emitted sum below — never silently.
        def tier(j):
            if j <= 3:
                return pool
            return min(pool, max(pool >> (j - 3), 4096))

        for j in range(1, max_events_per_voxel):
            n_j = tier(j)
            u = jax.random.uniform(jax.random.fold_in(key, j), (n_j,))
            ts_j = ts_fn(j, u, pool_idx[:n_j])
            valid_j = pool_extra[:n_j] >= j
            key_parts.append(jnp.where(valid_j, ts_j, _INT32_MAX))
            id_parts.append(pool_idx[:n_j])
            emitted = emitted + jnp.sum(valid_j, dtype=jnp.int32)

    all_keys = jnp.concatenate(key_parts)
    all_ids = jnp.concatenate(id_parts)
    if all_keys.shape[0] < capacity:                     # tiny inputs
        pad = capacity - all_keys.shape[0]
        all_keys = jnp.pad(all_keys, (0, pad), constant_values=_INT32_MAX)
        all_ids = jnp.pad(all_ids, (0, pad))
    sorted_keys, sorted_ids = lax.sort((all_keys, all_ids), num_keys=1)

    count = jnp.minimum(emitted, capacity)
    total = jnp.sum(emit_count)
    dropped = total - count

    return (
        lax.dynamic_slice_in_dim(sorted_keys, 0, capacity),
        lax.dynamic_slice_in_dim(sorted_ids, 0, capacity),
        count,
        dropped,
    )


def compact_dispatch(
    emit_count: jax.Array,
    ts_fn,
    key: jax.Array,
    *,
    bin_start_us: jax.Array,   # (cb,) int32
    cb: int,
    seg: int,
    max_rel_us: int,
    max_events_per_voxel: int,
    max_multi_voxels: int,
    capacity: int,
    use_binned_compaction: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Pick the compaction strategy.

    Measured on TPU v5e: the binned packed-key path's batched sorts are
    ~1.7x cheaper than the flat kv sort, but its compaction/merge steps are
    gather-bound and TPU gathers cost ~8-14 ns/element — about as much as
    sorting the same volume — making the binned path a net 16x LOSS
    (1011 ms vs 61 ms per 16 frames at 260x346). The flat path therefore
    stays the default; the binned path is kept behind
    `use_binned_compaction=True` for future hardware/compilers where
    gathers vectorize.
    """
    vox_bits = max(int(np.ceil(np.log2(max(seg, 2)))), 1)
    ts_bits = max(int(np.ceil(np.log2(max_rel_us + 3))), 1)
    if use_binned_compaction and ts_bits + vox_bits <= 31:
        return compact_frame_events_binned(
            emit_count, ts_fn, bin_start_us, key,
            cb=cb, seg=seg, ts_bits=ts_bits,
            max_events_per_voxel=max_events_per_voxel,
            capacity=capacity,
            pool_bin=min(max(max_multi_voxels // cb, 128), 8192),
        )
    return compact_frame_events(
        emit_count, ts_fn, key,
        max_events_per_voxel=max_events_per_voxel,
        max_multi_voxels=max_multi_voxels, capacity=capacity)


def _batched_searchsorted_right(offsets: jax.Array, q: jax.Array) -> jax.Array:
    """Row-wise searchsorted(offsets[r], q[r], side='right') - 1."""
    return jax.vmap(lambda o, qq: jnp.searchsorted(o, qq, side="right") - 1)(
        offsets, q)


def compact_frame_events_binned(
    emit_count: jax.Array,      # (V,) int32, bin-major (cb, seg) layout
    ts_fn,                      # ts_fn(j, u, vox_idx|None) -> abs int32 µs
    bin_start_us: jax.Array,    # (cb,) int32 bin starts incl t0
    key: jax.Array,
    *,
    cb: int,
    seg: int,
    ts_bits: int,
    max_events_per_voxel: int,
    capacity: int,
    tile: int = 2048,
    cap_bin: Optional[int] = None,
    pool_bin: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Two-level sort compaction with per-bin packed int32 keys.

    The flat global sort of compact_frame_events is O(V log^2 V) with a
    (key, payload) pair; here the per-bin sub-bin timestamp (ts_bits) and
    the within-bin voxel id pack into ONE int32 key, and the sort happens
    at three small scales instead of one big one:

      1. tile sort: (cb * seg/tile, tile) batched sorts — short segments,
         single key, cheapest way to push invalid slots to tile tails;
      2. gather-compaction of tiles into a (cb, cap_bin) buffer using
         exclusive tile-count cumsums + take_along_axis (no scatter);
      3. a small per-bin sort of the compacted buffer (+ appended
         multi-voxel extras) yields bin-sorted rows, whose concatenation
         is globally time-sorted; a final gather-merge emits the
         (capacity,) stream.

    The multi-voxel pool is selected by re-sorting the compacted buffer
    with an "is-multi" key — no O(V) top_k.

    Requires ts_bits + ceil(log2(seg)) <= 31 (callers fall back to
    compact_frame_events otherwise, e.g. LDATI's 'random' strategy whose
    raw-seconds timestamps span the whole frame: LDATI.py:173-174).

    Returns (packed-decoded t_us, vox_id, count, dropped) like
    compact_frame_events.
    """
    vox_bits = max(int(np.ceil(np.log2(max(seg, 2)))), 1)
    assert ts_bits + vox_bits <= 31, (ts_bits, vox_bits)
    ts_cap = (1 << ts_bits) - 2
    if cap_bin is None:
        cap_bin = min(_round_up(max(capacity // cb, 1024), 128),
                      _round_up(seg, tile))
    if pool_bin is None:
        pool_bin = 4096
    pool_bin = min(pool_bin, cap_bin)

    n_tiles = -(-seg // tile)
    seg_pad = n_tiles * tile
    vox_in_seg = lax.broadcasted_iota(jnp.int32, (cb, seg), 1)
    bin_of = lax.broadcasted_iota(jnp.int32, (cb, seg), 0)

    emit2 = emit_count.reshape(cb, seg)
    starts = bin_start_us[:, None]

    def pack(abs_ts_us, valid):
        rel = jnp.clip(abs_ts_us.reshape(cb, seg) - starts, 0, ts_cap)
        packed = (rel << vox_bits) | vox_in_seg
        return jnp.where(valid, packed, _INT32_MAX)

    # 1. first-event candidates, tile-sorted
    u0 = jax.random.uniform(jax.random.fold_in(key, 0), (cb * seg,))
    keys0 = pack(ts_fn(0, u0, None), emit2 > 0)
    keys0 = jnp.pad(keys0, ((0, 0), (0, seg_pad - seg)),
                    constant_values=_INT32_MAX)
    tiles = lax.sort(keys0.reshape(cb * n_tiles, tile), dimension=1)

    # 2. gather-compact tiles into (cb, cap_bin)
    tile_counts = jnp.sum(tiles < _INT32_MAX, axis=1,
                          dtype=jnp.int32).reshape(cb, n_tiles)
    bin_total = tile_counts.sum(axis=1)                     # (cb,)
    tile_off = jnp.cumsum(tile_counts, axis=1) - tile_counts
    q = lax.broadcasted_iota(jnp.int32, (cb, cap_bin), 1)
    r = jnp.maximum(_batched_searchsorted_right(tile_off, q), 0)
    idx = q - jnp.take_along_axis(tile_off, r, axis=1)
    flat_idx = jnp.clip(r * tile + idx, 0, seg_pad - 1)
    compacted = jnp.take_along_axis(
        tiles.reshape(cb, seg_pad), flat_idx, axis=1)
    compacted = jnp.where(q < bin_total[:, None], compacted, _INT32_MAX)

    emitted = jnp.minimum(bin_total, cap_bin).sum()

    rows = [compacted]
    if max_events_per_voxel > 1:
        # slot emit counts for the compacted events
        slot_vox = (compacted & ((1 << vox_bits) - 1)) + \
            lax.broadcasted_iota(jnp.int32, (cb, cap_bin), 0) * seg
        slot_vox = jnp.clip(slot_vox, 0, cb * seg - 1)
        slot_emit = jnp.where(
            compacted < _INT32_MAX,
            emit_count[slot_vox.reshape(-1)].reshape(cb, cap_bin), 0)

        # 3. multi-voxel pool: re-sort by is-multi (keeps ts order)
        multi_keys = jnp.where(slot_emit >= 2, compacted, _INT32_MAX)
        pool = lax.sort(multi_keys, dimension=1)[:, :pool_bin]
        pool_valid = pool < _INT32_MAX
        pool_vox_local = pool & ((1 << vox_bits) - 1)
        pool_vox = jnp.clip(
            pool_vox_local +
            lax.broadcasted_iota(jnp.int32, (cb, pool_bin), 0) * seg,
            0, cb * seg - 1)
        pool_emit = jnp.where(pool_valid,
                              emit_count[pool_vox.reshape(-1)]
                              .reshape(cb, pool_bin), 0)
        # Multi voxels beyond the pool lose their extra events; the loss
        # is accounted through `dropped` = total - emitted below.

        for j in range(1, max_events_per_voxel):
            u = jax.random.uniform(jax.random.fold_in(key, j),
                                   (cb * pool_bin,))
            ts_j = ts_fn(j, u, pool_vox.reshape(-1)).reshape(cb, pool_bin)
            rel = jnp.clip(ts_j - starts, 0, ts_cap)
            packed_j = (rel << vox_bits) | pool_vox_local
            rows.append(jnp.where(pool_valid & (pool_emit > j),
                                  packed_j, _INT32_MAX))
            emitted = emitted + jnp.sum(
                pool_valid & (pool_emit > j), dtype=jnp.int32)

    # 4. per-bin final sort; concatenated bins are globally time-sorted
    rows = jnp.concatenate(rows, axis=1)
    rows = lax.sort(rows, dimension=1)
    row_len = rows.shape[1]
    row_counts = jnp.sum(rows < _INT32_MAX, axis=1, dtype=jnp.int32)

    # 5. gather-merge into the (capacity,) output
    off = jnp.cumsum(row_counts) - row_counts
    qq = lax.broadcasted_iota(jnp.int32, (capacity,), 0)
    rb = jnp.maximum(
        jnp.searchsorted(off, qq, side="right").astype(jnp.int32) - 1, 0)
    pos = qq - off[rb]
    flat = jnp.clip(rb * row_len + pos, 0, cb * row_len - 1)
    out = rows.reshape(-1)[flat]
    count = jnp.minimum(emitted, capacity)
    valid_out = qq < count
    out = jnp.where(valid_out, out, _INT32_MAX)

    t_us = jnp.where(valid_out, (out >> vox_bits) + bin_start_us[rb],
                     _INT32_MAX)
    vox_id = jnp.where(valid_out,
                       (out & ((1 << vox_bits) - 1)) + rb * seg, 0)

    total = jnp.sum(emit_count)
    dropped = total - count
    return t_us, vox_id, count, dropped


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _compact_one_frame(
    emit_count: jax.Array,
    chain_ts_us: jax.Array,
    is_chain: jax.Array,
    k: jax.Array,
    b: jax.Array,
    bin_start_s: jax.Array,
    bin_start_us: jax.Array,   # (cb,) int32
    key: jax.Array,
    *,
    strategy: str,
    voxel_step: float,
    cb: int,
    seg: int,
    max_events_per_voxel: int,
    max_multi_voxels: int,
    capacity: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """LDATI-specific slot->timestamp rule on top of the compaction: slot 0
    is the chain timestamp for count==1 voxels and a stochastic draw
    otherwise; slots >= 1 are stochastic (reference: LDATI.py:228-245)."""

    def additional_us(u, kk, bb, bins):
        if strategy == "slope":
            t_add = _inverse_cdf_ts(u, kk, bb, voxel_step)
        else:  # 'random' — reference keeps raw U[0,1) seconds
            t_add = u                          # reference: LDATI.py:173-174
        return ((t_add + bins) * 1e6).astype(jnp.int32)

    def ts_fn(j, u, vox_idx):
        if strategy == "none":
            return chain_ts_us if vox_idx is None else chain_ts_us[vox_idx]
        if vox_idx is None:
            return jnp.where(is_chain, chain_ts_us,
                             additional_us(u, k, b, bin_start_s))
        return additional_us(u, k[vox_idx], b[vox_idx], bin_start_s[vox_idx])

    # 'random' draws raw U[0,1) *seconds*, spanning the whole frame -> the
    # sub-bin packing is infeasible; compact_dispatch falls back.
    max_rel_us = (int(1e6) if strategy == "random"
                  else int(voxel_step * 1e6) + 2)
    return compact_dispatch(
        emit_count, ts_fn, key,
        bin_start_us=bin_start_us, cb=cb, seg=seg, max_rel_us=max_rel_us,
        max_events_per_voxel=(1 if strategy == "none"
                              else max_events_per_voxel),
        max_multi_voxels=max_multi_voxels,
        capacity=capacity,
    )


def frame_order_voxels(a: jax.Array, bb: int, p: int, cb: int, h: int,
                       w: int) -> jax.Array:
    """(B*P, C, H, W)-shaped per-voxel data -> per-frame flattened voxel
    order (C, P_flipped, H, W): OFF before ON within a bin, mirroring the
    reference's neg-then-pos concatenation (tie-break only;
    LDATI.py:290-296)."""
    a = a.reshape(bb, p, cb, h, w)
    a = jnp.flip(a, axis=1)                  # P: [OFF, ON]
    a = jnp.swapaxes(a, 1, 2)                # (B, C, P, H, W)
    return a.reshape(bb, cb * p * h * w)


def decode_event_stream(t_us, vox_id, count, dropped, p, h, w) -> EventStream:
    """Decode flat (C, P_flipped, H, W) voxel ids back to (x, y, polarity)
    and mask invalid slots."""
    hw = h * w
    rem = vox_id % (p * hw)
    p_idx = rem // hw                      # 0 = OFF slot (flipped), 1 = ON
    yx = rem % hw
    y_idx = (yx // w).astype(jnp.int16)
    x_idx = (yx % w).astype(jnp.int16)
    polarity = p_idx.astype(jnp.int8)      # flipped P: index 1 is ON -> 1

    valid = lax.broadcasted_iota(jnp.int32, t_us.shape, 1) < count[:, None]
    t_us = jnp.where(valid, t_us, _INT32_MAX)
    return EventStream(t_us=t_us, x=x_idx, y=y_idx, p=polarity,
                       count=count, dropped=dropped)


# ---------------------------------------------------------------------------
# 3b. v3 compaction pipeline — roll-compactor instead of sort/gather
# ---------------------------------------------------------------------------

def _sample_events_v3(
    counts: jax.Array,         # (N = B*P, cb, H, W) int32 relocated counts
    chain_ts_us: jax.Array,    # (N, cb, H, W) int32 chain timestamps (abs)
    k: jax.Array,              # (N, cb, H, W) f32 slope params
    b: jax.Array,
    bin_start_us_i: jax.Array,  # (cb,) int32
    key: jax.Array,
    *,
    bb: int, p: int, cb: int, h: int, w: int,
    strategy: str,
    voxel_step: float,
    t0: float,
    max_events_per_voxel: int,
    cap_bin: int,
    multi_cap: int,
    capacity: int,
    sort_cap: Optional[int] = None,
    pre_ordered: bool = False,
    packed=None,
    packed_rows=None,
    return_rows: bool = False,
):
    """Sort-light sampler core. The reference's per-channel gather/argsort
    loops (LDATI.py:248-310) and the v2 flat kv sort (an honest 215 ms per
    16 frames: sort 66 ms + gathers ~100 ms, tools/perf_probe.py) become:

      1. elementwise packed candidate keys (sub-bin µs << vox_bits | voxel
         id) on the bin-major grid — no data movement. The slope k rides
         as ONE routed payload with the voxel's extra-event count packed
         into its 8 low mantissa bits (b is a pure function of k,
         slope_params; the ~1e-5 relative slope nudge is far below the
         sampler's distributional tolerance and does not affect counts);
      2. ONE roll-compaction of the ~90%-empty candidate grid
         (ops/compact_pallas.py — no sorts/gathers/scatters);
      3. multi-event voxels are re-compacted from the ALREADY-compacted
         rows (5-6x less volume than the grid), and the inverse-CDF draws
         for additional events (LDATI.py:188-196) happen elementwise on
         that pool — the v2 design's gathers never happen;
      4. ONE batched single-key sort over (frame*bin, cap_bin + extras)
         rows — an order of magnitude less volume than sorting the full
         grid; ties break by voxel id (the key's low bits), reproducing
         the reference's neg-then-pos concat order;
      5. a final roll-compaction merges each frame's time-disjoint bins
         into the (capacity,) stream; bin start times are recomputed
         arithmetically at decode (a per-event table lookup measured
         ~60 ms of gathers).

    Every capacity loss (bin cap, multi pool, tiers, frame capacity) lands
    in `dropped` exactly via total_emitted - kept.
    """
    from v2ce_toolbox_tpu.ops.compact_pallas import (
        INVALID as _INV,
        compact_rows,
        merge_sorted_rows,
    )

    seg = p * h * w
    vox_bits = max(int(np.ceil(np.log2(max(seg, 2)))), 1)
    f = bb
    mepv = max_events_per_voxel
    vox_mask = (1 << vox_bits) - 1
    ts_cap = (1 << (31 - vox_bits)) - 2
    # the multi-pool ordering key packs the slot iota into the low 22 bits;
    # a larger pool would overflow into the extra field and silently break
    # the descending-extra tier priority
    assert multi_cap < (1 << 22), (
        f"multi_cap={multi_cap} must fit the 22-bit slot field of the "
        "multi-pool ordering key")

    def frame_order(a):
        # pre_ordered: the caller already laid the grid out as
        # (B, C, P_flipped*H, W) — frame order is a free reshape
        if pre_ordered:
            return a.reshape(f, cb, seg)
        return frame_order_voxels(a, bb, p, cb, h, w).reshape(f, cb, seg)

    use_multi = strategy != "none" and mepv > 1

    # 'random' (reference LDATI.py:173-174): additional timestamps are
    # raw U[0,1) SECONDS past the bin start — ~20 rel-µs bits, too wide
    # for the packed key. The pipeline runs in two-word form: the packed
    # keys keep carrying identity (and the in-bin chain rel) through the
    # compactions, while a separate rel-µs word becomes the single sort
    # key with the voxel id routed as payload. Bins still concatenate in
    # bin order (the reference sorts per channel and concatenates,
    # LDATI.py:290-300, so its 'random' streams are not globally
    # time-sorted either).
    wide = strategy == "random"
    wide_cap = np.int32(int(1e6) + int(voxel_step * 1e6) + 2)

    # defer non-chain slot-0 draws to AFTER the chain compaction: the
    # drawn timestamp only matters for the post-compaction sort, and the
    # compaction neither orders by key value nor drops by it (whole
    # chunks drop in grid order), so drawing on the (f*cb, cap_bin)
    # compacted rows instead of the full ~26M grid is exact — an ~11x cut
    # in RNG + inverse-CDF volume. Needs the kx payload to identify
    # non-chain slots (extra >= 1 iff counts >= 2 when mepv > 1), so the
    # mepv == 1 corner keeps the pre-compaction draw — except for 'random'
    # whose wide draws can only be applied post-compaction (the payload's
    # extra field is widened below to keep the non-chain marker).
    defer_draw = use_multi or wide

    if packed_rows is not None:
        # fully fused generation + chain compaction (ops/gen_pallas.
        # gen_compact): the candidate grids never reach HBM; the kernel
        # hands back the already-compacted (frame*bin, cap_bin) rows
        # plus the per-frame emit/over-cap totals (tests/test_gen_pallas
        # .py asserts stream equality vs the unfused chain)
        assert strategy == "none" or defer_draw, (
            "packed generation requires the deferred-draw path")
        chain_keys, chain_pays, total_emit_pre, cap_dropped_pre = \
            packed_rows
        keys0 = payloads = None
    elif packed is not None:
        # fused generation (ops/gen_pallas.gen_pack): keys/payloads and
        # the per-frame emit/over-cap totals were produced in ONE Pallas
        # pass over the voxel grid — bit-identical to the block below
        # (tests/test_gen_pallas.py asserts stream equality)
        assert strategy == "none" or defer_draw, (
            "packed generation requires the deferred-draw path")
        keys0, payloads, total_emit_pre, cap_dropped_pre = packed
    else:
        is_chain = counts == 1
        if strategy == "none":
            emit = is_chain.astype(jnp.int32)
        else:
            emit = jnp.where(is_chain, 1, jnp.minimum(counts, mepv))
            emit = jnp.maximum(emit, 0)

        # slot-0 timestamps, absolute int µs (same float math as the v2
        # path and the reference)
        bin_start_s = bin_start_us_i.astype(jnp.float32) * 1e-6
        if strategy == "none":
            ts0 = chain_ts_us
        elif defer_draw:
            ts0 = chain_ts_us           # non-chain slots drawn later
        else:
            u0 = jax.random.uniform(jax.random.fold_in(key, 0),
                                    counts.shape)
            t_add = _inverse_cdf_ts(u0, k, b, voxel_step)
            ts0 = jnp.where(
                is_chain, chain_ts_us,
                ((t_add + bin_start_s[None, :, None, None]) * 1e6
                 ).astype(jnp.int32))
        rel0 = jnp.clip(ts0 - bin_start_us_i[None, :, None, None], 0,
                        ts_cap)
        if defer_draw:
            rel0 = jnp.where(is_chain, rel0, 0)  # placeholder, drawn below

        # bin-major packed keys; vox id = within-bin flat id (P-flipped,
        # matching the reference's neg-then-pos tie order,
        # LDATI.py:290-296)
        rel0_f = frame_order(rel0)
        emit_f = frame_order(emit)
        vox_iota = lax.broadcasted_iota(jnp.int32, (f, cb, seg), 2)
        packed0 = (rel0_f << vox_bits) | vox_iota
        keys0 = jnp.where(emit_f > 0, packed0, _INV).reshape(f * cb, seg)

        payloads = []
        if use_multi or wide:
            # 'random' with mepv == 1 runs no tiers but still needs the
            # deferred wide draw, so extra keeps marking counts >= 2
            xcap = 255 if (wide and mepv == 1) else mepv - 1
            extra = jnp.minimum(jnp.maximum(counts - 1, 0), xcap)
            extra = jnp.minimum(extra, 255)
            kx = lax.bitcast_convert_type(k.astype(jnp.float32), jnp.int32)
            kx = (kx & ~jnp.int32(0xFF)) | extra
            payloads = [frame_order(kx).reshape(f * cb, seg)]

    chunk = 16384   # measured (round 3, compact_chunk probe): 2.24 Gelem/s
                    # at 16384 vs 2.13 at 8192 and 1.93 at 32768; the
                    # place-based kernel lifts it to 2.86 (compact_algo)
    if packed_rows is None:
        chain_keys, chain_pays, _, _ = compact_rows(
            keys0, payloads, cap=cap_bin, chunk=chunk, algo="place")

    chain_rel = None
    if defer_draw:
        # deferred slot-0 draw for non-chain voxels (extra >= 1), on the
        # compacted rows only. Bin starts recompute arithmetically per
        # row (identical float expressions to the grid path: the caller
        # builds bin_start_us_i as ((bin*step + t0)*1e6).astype(int32)).
        ckx0 = chain_pays[0]
        u0c = jax.random.uniform(jax.random.fold_in(key, 0),
                                 chain_keys.shape)
        if wide:
            t_add_c = u0c              # raw U[0,1) s (LDATI.py:173-174)
        else:
            k_c = lax.bitcast_convert_type(ckx0 & ~jnp.int32(0xFF),
                                           jnp.float32)
            b_c = 1.0 / voxel_step - voxel_step * k_c / 2.0
            t_add_c = _inverse_cdf_ts(u0c, k_c, b_c, voxel_step)
        rb = (lax.broadcasted_iota(jnp.int32, chain_keys.shape, 0)
              % cb).astype(jnp.float32)
        bs_us_row = ((rb * voxel_step + t0) * 1e6).astype(jnp.int32)
        bs_s_row = bs_us_row.astype(jnp.float32) * 1e-6
        ts_draw = ((t_add_c + bs_s_row) * 1e6).astype(jnp.int32)
        rel_draw = jnp.clip(ts_draw - bs_us_row, 0,
                            wide_cap if wide else ts_cap)
        non_chain = (chain_keys != _INV) & ((ckx0 & 0xFF) > 0)
        if wide:
            # two-word form: the wide rel-µs never enters the packed key
            chain_rel = jnp.where(chain_keys != _INV,
                                  chain_keys >> vox_bits, _INV)
            chain_rel = jnp.where(non_chain, rel_draw, chain_rel)
        else:
            chain_keys = jnp.where(
                non_chain,
                (rel_draw << vox_bits) | (chain_keys & vox_mask),
                chain_keys)

    rows = [chain_keys]
    if wide:
        rows_rel = [chain_rel]
        rows_vox = [jnp.where(chain_keys != _INV,
                              chain_keys & vox_mask, 0)]

    if use_multi:
        ckx = chain_pays[0]
        c_extra = ckx & 0xFF
        multi_keys_in = jnp.where((c_extra > 0) & (chain_keys != _INV),
                                  chain_keys, _INV)
        # place algo + 4096 chunk: the window algo at 2048 measured ~3x
        # the per-element cost (tools/perf_probe.py compact_block /
        # flatten side-pass A/B); cap rounds up to one chunk
        mchunk = min(chunk, max(128, (multi_cap // 128) * 128))
        m_keys, (mkx,), _, _ = compact_rows(
            multi_keys_in, [ckx], cap=multi_cap, chunk=mchunk,
            algo="place")
        mc = m_keys.shape[1]
        # order the pool by extra-count DESCENDING (stable) so the tiered
        # slot prefixes below cover the highest-multiplicity voxels first
        # — the same priority v2's top_k pool had; a tier only drops when
        # #(extra >= j) genuinely exceeds n_j (exact via `dropped`)
        mvox0 = jnp.where(m_keys != _INV, m_keys & vox_mask, 0)
        m_extra0 = jnp.where(m_keys != _INV, mkx & 0xFF, 0)
        order = ((255 - m_extra0) << 22) | lax.broadcasted_iota(
            jnp.int32, m_extra0.shape, 1)
        _, mkx, mvox = lax.sort((order, mkx, mvox0), dimension=1,
                                num_keys=1)
        # invalid pool slots carried payload 0 -> extra 0, never selected
        m_extra = mkx & 0xFF
        mk_f = lax.bitcast_convert_type(mkx & ~jnp.int32(0xFF), jnp.float32)
        mb_f = 1.0 / voxel_step - voxel_step * mk_f / 2.0

        # tiered extra-slot sizing: full pool for slots 1-2, halving from
        # slot 3 with a 256 floor (extras get exponentially rarer with j;
        # any voxel beyond its tier surfaces in `dropped`). NOTE: the v2
        # compact_frame_events tier halves from slot 4 (j <= 3 full) — v3
        # trades that tail coverage for a narrower sort; the difference is
        # accounted exactly in `dropped`.
        def tier(j):
            if j <= 2:
                return mc
            return min(mc, max(multi_cap >> (j - 2), 128))

        for j in range(1, mepv):
            n_j = tier(j)
            u = jax.random.uniform(jax.random.fold_in(key, j), (f * cb, n_j))
            valid_j = m_extra[:, :n_j] >= j
            if wide:
                # same float path as the reference (raw seconds + bin
                # start, truncate to µs: LDATI.py:173-174,211-214)
                ts_j = ((u + bs_s_row[:, :n_j]) * 1e6).astype(jnp.int32)
                rel = jnp.clip(ts_j - bs_us_row[:, :n_j], 0, wide_cap)
                rows_rel.append(jnp.where(valid_j, rel, _INV))
                rows_vox.append(mvox[:, :n_j])
                continue
            t_add = _inverse_cdf_ts(u, mk_f[:, :n_j], mb_f[:, :n_j],
                                    voxel_step)
            rel = jnp.clip((t_add * 1e6).astype(jnp.int32), 0, ts_cap)
            rows.append(jnp.where(valid_j, (rel << vox_bits) | mvox[:, :n_j],
                                  _INV))

    # ONE batched single-key sort per (frame, bin) row. The concatenated
    # width (cap_bin + tier caps, ~31.6k at defaults) is capacity padding
    # that is mostly INVALID in practice, and every segment is a
    # front-packed valid prefix (chain rows by compaction, tier rows
    # because the pool is extra-descending so `extra >= j` is a prefix) —
    # so a pre-sort compaction to `sort_cap` cuts the sort's O(W log W)
    # volume ~2x. Chunks beyond sort_cap drop whole, chains first in the
    # concat order (favored on overflow); every such drop lands in
    # `dropped` exactly via total_emit - kept below.
    if wide:
        # two-word final sort: rel-µs is the single sort key, the voxel
        # id rides as payload (lax.sort is stable, so ties keep the
        # bin-major voxel order like the packed key's low bits do)
        rel_in = jnp.concatenate(rows_rel, axis=1)
        vox_in = jnp.concatenate(rows_vox, axis=1)
        if sort_cap is not None and sort_cap < rel_in.shape[1]:
            rel_in, (vox_in,), _, _ = compact_rows(
                rel_in, [vox_in], cap=sort_cap,
                chunk=min(16384, sort_cap), algo="place")
        rel_only, vox_s = lax.sort((rel_in, vox_in), dimension=1,
                                   num_keys=1)
        row_bin = lax.broadcasted_iota(
            jnp.int32, (f * cb, rel_only.shape[1]), 0) % cb
        gvox = jnp.where(rel_only != _INV, vox_s + row_bin * seg, 0)
    else:
        merged_in = jnp.concatenate(rows, axis=1)
        if sort_cap is not None and sort_cap < merged_in.shape[1]:
            # chunk <= sort_cap so the effective cap (rounded up to a
            # chunk multiple) stays at sort_cap for power-of-two caps;
            # 16384 chunks run ~1.65x cheaper per element than 4096
            # (compact_block sweep)
            merged_in, _, _, _ = compact_rows(
                merged_in, (), cap=sort_cap, chunk=min(16384, sort_cap),
                algo="place")
        merged = lax.sort(merged_in, dimension=1)

        # merge the time-disjoint bins of each frame; carry the global
        # voxel id (bin * seg + vox) as payload so decode survives the
        # merge
        row_bin = lax.broadcasted_iota(
            jnp.int32, (f * cb, merged.shape[1]), 0) % cb
        gvox = jnp.where(merged != _INV,
                         (merged & vox_mask) + row_bin * seg, 0)
        rel_only = jnp.where(merged != _INV, merged >> vox_bits, _INV)

    # per-frame emit totals are bounded by cb*seg*mepv <= ~26M per frame,
    # far inside int32 — sum in int32 (int64 is unavailable without x64)
    if packed is not None or packed_rows is not None:
        total_emit = total_emit_pre
        cap_dropped_f = cap_dropped_pre
    else:
        total_emit = emit_f.sum(axis=(1, 2), dtype=jnp.int32)
        cap_dropped = jnp.where(counts > mepv, counts - mepv, 0)
        if strategy == "none":
            cap_dropped = jnp.zeros_like(cap_dropped)
        cap_dropped_f = frame_order(cap_dropped).sum(axis=(1, 2))

    if return_rows:
        # fused wire-format path (pipeline/driver._sample_flatten_window):
        # hand back the post-sort (f*cb, W) rows so the caller can fold
        # the frame merge, the stream flatten, and the bit-packing into
        # ONE merge pass instead of merge -> per-frame buffers -> append
        return rel_only, gvox, total_emit, cap_dropped_f

    # bins are time-disjoint and each row is sorted, so the frame stream
    # is the concatenation of the rows' valid prefixes — an O(W) append
    # (merge_sorted_rows) instead of an O(W log W) re-compaction of the
    # (f, cb * W) grid (measured ~3.5 ms -> ~0.5 ms, sampler_phases)
    #
    # The merge can never emit more than cb * W valid events per frame
    # (W = post-sort row width), so clamp the requested capacity to that
    # bound (rounded up to the merge kernel's 128-lane granularity).
    # Exact: the clipped slots are always-INVALID tail padding — and the
    # driver's downstream stream flatten sweeps 3.6x fewer slots at the
    # defaults (524,288 -> 147,456 slots/frame).
    cap_bound = cb * rel_only.shape[1]
    cap_eff = min(capacity, -(-cap_bound // 128) * 128)
    out_rel, (out_vox,), kept, _ = merge_sorted_rows(
        rel_only, [gvox], nb=cb, cap=cap_eff)

    # decode: abs µs = rel + bin_start(bin), with the bin start recomputed
    # arithmetically (identical float expression to bin_starts above — a
    # per-event table gather here measured ~60 ms)
    out_bin = jnp.minimum(out_vox // seg, cb - 1)
    bin_start_dec = ((out_bin.astype(jnp.float32) * voxel_step + t0)
                     * 1e6).astype(jnp.int32)
    t_us = jnp.where(out_rel != _INV, out_rel + bin_start_dec, _INT32_MAX)

    dropped = total_emit - kept + cap_dropped_f
    return decode_event_stream(t_us, out_vox, kept, dropped, p, h, w)


# ---------------------------------------------------------------------------
# 4. Full sampler (reference: scripts/LDATI.py:126-214 + 248-310)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=(
        "t0", "fps", "pooling_type", "pooling_kernel_size",
        "additional_events_strategy", "bidirectional",
        "max_events_per_voxel", "max_multi_voxels", "capacity",
        "use_v3", "cap_bin", "multi_cap", "sort_cap", "use_gen_kernel",
        "use_gen_compact", "return_rows",
    ),
)
def sample_events(
    voxels: jax.Array,
    key: jax.Array,
    *,
    t0: float = 0.0,
    fps: int = 30,
    pooling_type: str = "none",
    pooling_kernel_size: int = 3,
    additional_events_strategy: str = "slope",
    bidirectional: bool = False,
    max_events_per_voxel: int = 16,
    max_multi_voxels: int = 1 << 16,
    capacity: int = 1 << 19,
    use_v3: bool = True,
    cap_bin: int = 1 << 14,
    multi_cap: int = 4096,
    sort_cap: Optional[int] = 1 << 14,
    use_gen_kernel: bool = True,
    use_gen_compact: bool = True,
    return_rows: bool = False,
):
    """Sample a timestamped event stream from predicted voxels — the
    jit-compiled core of the LDATI sampler.

    Args:
      voxels: (B, P, C, H, W) float voxel grid, P=2 (index 0 = ON),
        C=10 time bins (the reference layout, scripts/LDATI.py:129).
      key: PRNG key for the stochastic additional-event timestamps.
    Returns:
      EventStream with per-frame buffers of width `capacity` clamped to
      the cb*W merge bound rounded up to 128 lanes (cb = C-1 bins, W =
      post-sort row width; 524,288 -> 147,456 at the defaults — the
      merge can never emit more events per frame), timestamps in int32
      µs relative to t0, sorted ascending; invalid slots hold INT32_MAX.
    """
    assert additional_events_strategy in ("none", "random", "slope")
    assert pooling_type in ("none", "avg", "weighted")
    bb, p, c, h, w = voxels.shape
    n = bb * p
    voxel_step = 1.0 / fps / (c - 1)
    cb = c - 1  # bins after relocation

    # v3 roll-compaction path: used whenever the CHAIN sub-bin µs fit the
    # packed int32 key (true at any realistic fps). The 'random' strategy
    # draws raw U[0,1)-second offsets for additional events (reference:
    # LDATI.py:173-174) — those need ~20 µs-bits and cannot share the
    # packed key, so _sample_events_v3 runs them in its two-word form
    # (rel-µs sort key + routed voxel payload); only the final sort
    # widens, the compaction machinery is shared.
    seg_bits = max(int(np.ceil(np.log2(max(p * h * w, 2)))), 1)
    max_rel_us = int(voxel_step * 1e6) + 2
    take_v3 = (use_v3
               and additional_events_strategy in ("none", "slope", "random")
               and max_rel_us <= (1 << (31 - seg_bits)) - 2)
    # pre-ordered layout: apply the frame_order_voxels transpose ONCE to
    # the input grid — (B, P, C, H, W) -> (B, C, P_flipped*H, W) — so
    # every downstream frame_order is a free reshape instead of a
    # 26M-element plane copy. relocate/slope/packing are elementwise over
    # the trailing dims, so the math is bit-identical; spatial pooling
    # would cross the P*H fold, so it keeps the per-polarity layout.
    pre_ordered = take_v3 and pooling_type == "none"

    if pre_ordered and use_gen_kernel and not bidirectional:
        from v2ce_toolbox_tpu.ops.gen_pallas import gen_compact, gen_pack
        from v2ce_toolbox_tpu.ops.gen_pallas import supported as _gen_ok
        from v2ce_toolbox_tpu.ops.gen_pallas import (
            supported_compact as _gen_compact_ok,
        )

        if (use_gen_compact
                and _gen_compact_ok(h, w, additional_events_strategy,
                                    max_events_per_voxel)):
            # fully fused generation + chain compaction: the candidate
            # grids stay in VMEM; only the compacted (frame*bin,
            # cap_bin) rows reach HBM (~208 MB of key/kx round-trip
            # traffic removed per 16-frame 260x346 window). Candidate
            # order within a row becomes (polarity, w-block, h, w%128);
            # the downstream sort canonicalizes, so the stream is
            # bit-identical to the unfused chain whenever cap_bin /
            # multi_cap don't bind (and always for W <= 128 or
            # strategy='none'; tests/test_gen_pallas.py).
            seg = p * h * w
            rows_keys, rows_kx, _, _, emit_tot, drop_tot = gen_compact(
                voxels, fps=fps, t0=t0,
                strategy=additional_events_strategy,
                mepv=max_events_per_voxel, vox_bits=seg_bits,
                cap_bin=cap_bin)
            bin_starts = (jnp.arange(cb, dtype=jnp.float32) * voxel_step
                          + t0)
            row_pays = [rows_kx] if rows_kx is not None else []
            return _sample_events_v3(
                None, None, None, None,
                (bin_starts * 1e6).astype(jnp.int32), key,
                bb=bb, p=p, cb=cb, h=h, w=w,
                strategy=additional_events_strategy,
                voxel_step=voxel_step, t0=t0,
                max_events_per_voxel=max_events_per_voxel,
                cap_bin=cap_bin, multi_cap=multi_cap, capacity=capacity,
                sort_cap=sort_cap, pre_ordered=True,
                packed_rows=(rows_keys, row_pays, emit_tot, drop_tot),
                return_rows=return_rows)

        if _gen_ok(h, w, additional_events_strategy, max_events_per_voxel):
            # fused generation: relocate + slope + candidate packing in
            # ONE Pallas pass over the RAW (B, P, C, H, W) grid — the
            # polarity flip / bin-major reorder happen as index
            # arithmetic instead of a 115 MB transpose, and the
            # counts/tendency/k intermediates never leave VMEM.
            # Bit-identical to the relocate_counts/slope_params path
            # below; measured on chip 7.1 -> 4.4 ms per 16-frame window
            # (tools/perf_probe.py gen), sampler total 19.7 -> 15.4 ms.
            seg = p * h * w
            keys_g, kx_g, emit_tot, drop_tot = gen_pack(
                voxels, fps=fps, t0=t0,
                strategy=additional_events_strategy,
                mepv=max_events_per_voxel, vox_bits=seg_bits)
            bin_starts = (jnp.arange(cb, dtype=jnp.float32) * voxel_step
                          + t0)
            payloads = ([kx_g.reshape(bb * cb, seg)]
                        if kx_g is not None else [])
            return _sample_events_v3(
                None, None, None, None,
                (bin_starts * 1e6).astype(jnp.int32), key,
                bb=bb, p=p, cb=cb, h=h, w=w,
                strategy=additional_events_strategy,
                voxel_step=voxel_step, t0=t0,
                max_events_per_voxel=max_events_per_voxel,
                cap_bin=cap_bin, multi_cap=multi_cap, capacity=capacity,
                sort_cap=sort_cap, pre_ordered=True,
                packed=(keys_g.reshape(bb * cb, seg), payloads,
                        emit_tot, drop_tot),
                return_rows=return_rows)

    if pre_ordered:
        y = jnp.swapaxes(jnp.flip(voxels, 1), 1, 2)
        y = y.reshape(bb, c, p * h, w).astype(jnp.float32)
    else:
        y = voxels.reshape(n, c, h, w).astype(jnp.float32)

    counts, tendency = relocate_counts(y, bidirectional=bidirectional)

    # Chain timestamps in µs (reference: LDATI.py:155-165).
    bin_starts = (jnp.arange(cb, dtype=jnp.float32) * voxel_step + t0)
    chain_ts = tendency / fps / cb + bin_starts[None, :, None, None]
    chain_ts_us = (chain_ts * 1e6).astype(jnp.int32)

    if additional_events_strategy == "slope":
        k, b = slope_params(
            counts.astype(jnp.float32), fps,
            pooling_type=pooling_type, pooling_kernel_size=pooling_kernel_size,
        )
    else:
        k = jnp.zeros_like(chain_ts)
        b = jnp.zeros_like(chain_ts)

    if take_v3:
        return _sample_events_v3(
            counts, chain_ts_us, k, b,
            (bin_starts * 1e6).astype(jnp.int32), key,
            bb=bb, p=p, cb=cb, h=h, w=w,
            strategy=additional_events_strategy,
            voxel_step=voxel_step, t0=t0,
            max_events_per_voxel=max_events_per_voxel,
            cap_bin=cap_bin, multi_cap=multi_cap, capacity=capacity,
            sort_cap=sort_cap, pre_ordered=pre_ordered,
            return_rows=return_rows,
        )
    if return_rows:
        raise ValueError(
            "return_rows requires the v3 sampler path (strategy in "
            "none/slope/random, no pooling on this shape); callers gate "
            "on ldati.supports_rows() and fall back otherwise")

    # Per-voxel emit counts. count == 1 voxels emit their chain event;
    # count >= 2 voxels emit `count` stochastic events (LDATI.py:228-239);
    # with strategy 'none' only chain events are emitted (LDATI.py:241).
    if additional_events_strategy == "none":
        emit = (counts == 1).astype(jnp.int32)
    else:
        emit = jnp.where(
            counts == 1, 1, jnp.minimum(counts, max_events_per_voxel)
        )
        emit = jnp.maximum(emit, 0)
    cap_dropped = jnp.where(
        counts > max_events_per_voxel, counts - max_events_per_voxel, 0
    )
    if additional_events_strategy == "none":
        cap_dropped = jnp.zeros_like(cap_dropped)

    def frame_order(a):
        return frame_order_voxels(a, bb, p, cb, h, w)

    emit_f = frame_order(emit)
    chain_f = frame_order(chain_ts_us)
    is_chain_f = frame_order((counts == 1).astype(jnp.int32)) > 0
    k_f = frame_order(k)
    b_f = frame_order(b)
    bin_start_f = frame_order(
        jnp.broadcast_to(bin_starts[None, :, None, None], (n, cb, h, w))
    )
    cap_dropped_f = frame_order(cap_dropped).sum(axis=-1)

    bin_start_us_i = (bin_starts * 1e6).astype(jnp.int32)   # (cb,)

    keys = jax.random.split(key, bb)
    compact = functools.partial(
        _compact_one_frame,
        strategy=additional_events_strategy,
        voxel_step=voxel_step,
        cb=cb,
        seg=p * h * w,
        max_events_per_voxel=(
            max_events_per_voxel if additional_events_strategy != "none" else 1
        ),
        max_multi_voxels=max_multi_voxels,
        capacity=capacity,
    )
    t_us, vox_id, count, dropped = jax.vmap(
        compact, in_axes=(0, 0, 0, 0, 0, 0, None, 0)
    )(emit_f, chain_f, is_chain_f, k_f, b_f, bin_start_f, bin_start_us_i,
      keys)
    return decode_event_stream(t_us, vox_id, count, dropped + cap_dropped_f,
                               p, h, w)


def supports_rows(p: int, h: int, w: int, *, fps: int, c: int = 10,
                  additional_events_strategy: str = "slope",
                  pooling_type: str = "none",
                  use_v3: bool = True) -> bool:
    """Whether `sample_events(..., return_rows=True)` covers this config —
    the exact take_v3 gate of sample_events (callers that fuse the wire
    format, e.g. pipeline/driver._sample_flatten_window, fall back to the
    per-frame EventStream path otherwise)."""
    seg_bits = max(int(np.ceil(np.log2(max(p * h * w, 2)))), 1)
    max_rel_us = int(1.0 / fps / (c - 1) * 1e6) + 2
    return (use_v3
            and additional_events_strategy in ("none", "slope", "random")
            and pooling_type in ("none", "avg", "weighted")
            and max_rel_us <= (1 << (31 - seg_bits)) - 2)


def sample_voxel_statistical(
    y,
    t0: float = 0,
    fps: int = 30,
    pooling_type: str = "none",
    pooling_kernel_size: int = 3,
    additional_events_strategy: str = "slope",
    bidirectional: bool = False,
    key: Optional[jax.Array] = None,
    max_events_per_voxel: int = 16,
    max_multi_voxels: int = 1 << 16,
    capacity: int = 1 << 19,
):
    """Drop-in equivalent of the reference entry point
    (reference: scripts/LDATI.py:126): takes a (B, P, C, H, W) voxel grid,
    returns a list of B numpy recarrays sorted by timestamp.

    This is the *host-edge* wrapper; pipelines should call `sample_events`
    and keep the EventStream on device.
    """
    if key is None:
        key = jax.random.key(0)
    stream = sample_events(
        jnp.asarray(y),
        key,
        t0=float(t0),
        fps=fps,
        pooling_type=pooling_type,
        pooling_kernel_size=pooling_kernel_size,
        additional_events_strategy=additional_events_strategy,
        bidirectional=bidirectional,
        max_events_per_voxel=max_events_per_voxel,
        max_multi_voxels=max_multi_voxels,
        capacity=capacity,
    )
    return to_recarrays(stream)
