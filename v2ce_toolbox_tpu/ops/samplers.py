"""Stage-2 ablation samplers: random/even baseline and pure-slope.

TPU re-designs of the reference's ablation samplers
(reference: train/scripts/stage2/sample_methods/random_even_sample.py and
pure_slope_sample.py), built on the same sort-based compaction as LDATI
(ops/ldati.compact_frame_events). Unlike LDATI these do NOT relocate: the
voxel keeps its 10 bins, the integer part floor(y) emits that many events,
and the fractional part emits one Bernoulli-gated event
(random_even_sample.py:118-170, pure_slope_sample.py:93-152).

Timestamp rules per sampler (delta = 1/(fps*C), C=10):
  random:      every event uniform in [0, delta)
  even:        integer event j at j/(n+1)*delta; Bernoulli event at
               n/(n+1)*delta (random_even_sample.py:131-149)
  pure_slope:  every event from the linear-density inverse CDF; bin 9 is
               folded into bin 8 first (pure_slope_sample.py:93-94)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from v2ce_toolbox_tpu.events import EventStream, to_recarrays
from v2ce_toolbox_tpu.ops.ldati import (
    _inverse_cdf_ts,
    compact_dispatch,
    decode_event_stream,
    frame_order_voxels,
    slope_params,
)


def _prepare(y: jax.Array):
    bb, p, c, h, w = y.shape
    n = bb * p
    return y.reshape(n, c, h, w).astype(jnp.float32), bb, p, c, h, w


@functools.partial(
    jax.jit,
    static_argnames=("fps", "mode", "max_events_per_voxel",
                     "max_multi_voxels", "capacity"),
)
def sample_events_baseline(
    voxels: jax.Array,
    key: jax.Array,
    *,
    t0: float = 0.0,
    fps: int = 30,
    mode: str = "random",            # 'random' | 'even'
    max_events_per_voxel: int = 16,
    max_multi_voxels: int = 1 << 16,
    capacity: int = 1 << 19,
) -> EventStream:
    """Random/even baseline sampler
    (reference: random_even_sample.py:118-170)."""
    assert mode in ("random", "even")
    y, bb, p, c, h, w = _prepare(voxels)
    delta = 1.0 / (fps * c)

    int_part = jnp.floor(y)
    frac = y - int_part
    bern = (jax.random.uniform(jax.random.fold_in(key, 10_001), y.shape)
            < frac).astype(jnp.int32)
    n_int = jnp.maximum(int_part, 0).astype(jnp.int32)
    emit = n_int + bern

    bin_starts = jnp.arange(c, dtype=jnp.float32) * delta + t0
    bins = jnp.broadcast_to(bin_starts[None, :, None, None], y.shape)

    fo = lambda a: frame_order_voxels(a, bb, p, c, h, w)
    emit_f = fo(emit)
    n_int_f = fo(n_int)
    bins_f = fo(bins)

    def ts_fn_for(n_int_v, bins_v):
        def ts_fn(j, u, vox_idx):
            nv = n_int_v if vox_idx is None else n_int_v[vox_idx]
            bv = bins_v if vox_idx is None else bins_v[vox_idx]
            if mode == "random":
                sub = u * delta
            else:
                nv_f = nv.astype(jnp.float32)
                sub_int = j / (nv_f + 1.0) * delta
                sub_dec = nv_f / (nv_f + 1.0) * delta
                sub = jnp.where(j < nv, sub_int, sub_dec)
            return ((sub + bv) * 1e6).astype(jnp.int32)

        return ts_fn

    bin_start_us_i = (bin_starts * 1e6).astype(jnp.int32)

    def compact(emit_v, n_int_v, bins_v, bus, k_):
        return compact_dispatch(
            emit_v, ts_fn_for(n_int_v, bins_v), k_,
            bin_start_us=bus, cb=c, seg=p * h * w,
            max_rel_us=int(delta * 1e6) + 2,
            max_events_per_voxel=max_events_per_voxel,
            max_multi_voxels=max_multi_voxels, capacity=capacity,
        )

    keys = jax.random.split(key, bb)
    t_us, vox_id, count, dropped = jax.vmap(
        compact, in_axes=(0, 0, 0, None, 0))(
        emit_f, n_int_f, bins_f, bin_start_us_i, keys)
    cap_drop = fo(jnp.maximum(emit - max_events_per_voxel, 0)).sum(axis=-1)
    return decode_event_stream(t_us, vox_id, count, dropped + cap_drop,
                               p, h, w)


@functools.partial(
    jax.jit,
    static_argnames=("fps", "pooling_type", "pooling_kernel_size",
                     "max_events_per_voxel", "max_multi_voxels", "capacity"),
)
def sample_events_pure_slope(
    voxels: jax.Array,
    key: jax.Array,
    *,
    t0: float = 0.0,
    fps: int = 30,
    pooling_type: str = "none",
    pooling_kernel_size: int = 3,
    max_events_per_voxel: int = 16,
    max_multi_voxels: int = 1 << 16,
    capacity: int = 1 << 19,
) -> EventStream:
    """Pure-slope sampler: all events (integer and Bernoulli-fractional)
    draw from the linear-density inverse CDF; no chain decoupling
    (reference: pure_slope_sample.py:57-152)."""
    y, bb, p, c, h, w = _prepare(voxels)
    delta = 1.0 / (fps * c)

    # Slope from the un-folded voxel (the reference computes k before the
    # fold, pure_slope_sample.py:79-91). slope_params uses voxel_step =
    # 1/fps/C with C = y.shape[1] = 10 here — exactly the reference's
    # 1/(fps*10) convention (pure_slope_sample.py:79).
    k, b = slope_params(y, fps, pooling_type=pooling_type,
                        pooling_kernel_size=pooling_kernel_size)

    # Fold bin 9 into bin 8 (pure_slope_sample.py:93-94).
    y = y.at[:, c - 2].add(y[:, c - 1])
    y = y.at[:, c - 1].set(0.0)

    int_part = jnp.floor(y)
    frac = y - int_part
    bern = (jax.random.uniform(jax.random.fold_in(key, 10_001), y.shape)
            < frac).astype(jnp.int32)
    n_int = jnp.maximum(int_part, 0).astype(jnp.int32)
    emit = n_int + bern

    bin_starts = jnp.arange(c, dtype=jnp.float32) * delta + t0
    bins = jnp.broadcast_to(bin_starts[None, :, None, None], y.shape)

    fo = lambda a: frame_order_voxels(a, bb, p, c, h, w)
    emit_f, k_f, b_f, bins_f = fo(emit), fo(k), fo(b), fo(bins)

    def ts_fn_for(kv, bv, binsv):
        def ts_fn(j, u, vox_idx):
            kk = kv if vox_idx is None else kv[vox_idx]
            bb_ = bv if vox_idx is None else bv[vox_idx]
            bn = binsv if vox_idx is None else binsv[vox_idx]
            sub = _inverse_cdf_ts(u, kk, bb_, delta)
            return ((sub + bn) * 1e6).astype(jnp.int32)

        return ts_fn

    bin_start_us_i = (bin_starts * 1e6).astype(jnp.int32)

    def compact(emit_v, kv, bv, binsv, bus, k_):
        return compact_dispatch(
            emit_v, ts_fn_for(kv, bv, binsv), k_,
            bin_start_us=bus, cb=c, seg=p * h * w,
            max_rel_us=int(delta * 1e6) + 2,
            max_events_per_voxel=max_events_per_voxel,
            max_multi_voxels=max_multi_voxels, capacity=capacity,
        )

    keys = jax.random.split(key, bb)
    t_us, vox_id, count, dropped = jax.vmap(
        compact, in_axes=(0, 0, 0, 0, None, 0))(
        emit_f, k_f, b_f, bins_f, bin_start_us_i, keys)
    cap_drop = fo(jnp.maximum(emit - max_events_per_voxel, 0)).sum(axis=-1)
    return decode_event_stream(t_us, vox_id, count, dropped + cap_drop,
                               p, h, w)


# -- host-edge wrappers (reference call signatures) -------------------------

def sample_voxel_baseline(y, t0=0, fps=30, even=False, random=False,
                          key: Optional[jax.Array] = None, **kw):
    """reference: random_even_sample.py:118."""
    assert even or random
    if key is None:
        key = jax.random.key(0)
    stream = sample_events_baseline(
        jnp.asarray(y), key, t0=float(t0), fps=fps,
        mode="even" if even else "random", **kw)
    return to_recarrays(stream)


def sample_voxel_pure_slope(y, t0=0, fps=30, pooling_type="none",
                            pooling_kernel_size=3,
                            key: Optional[jax.Array] = None, **kw):
    """reference: pure_slope_sample.py:57 (sample_voxel_statistical)."""
    if key is None:
        key = jax.random.key(0)
    stream = sample_events_pure_slope(
        jnp.asarray(y), key, t0=float(t0), fps=fps,
        pooling_type=pooling_type, pooling_kernel_size=pooling_kernel_size,
        **kw)
    return to_recarrays(stream)
