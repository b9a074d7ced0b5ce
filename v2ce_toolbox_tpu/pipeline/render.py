"""Event-frame rendering: voxels -> displayable uint8 frames.

Mirrors write_event_frame_video (reference: v2ce.py:241-280): sum the voxel
grid over time bins, map polarities to R/G channels (blue zero) or replicate
the polarity-sum to gray, bound values by min(percentile of nonzero values,
ceil), clip-normalize, and scale to uint8. The reductions and the
percentile run on device; only the final uint8 frames go to the host.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def render_event_frames(voxels, *, ceil: float = 10.0,
                        upper_bound_percentile: int = 98,
                        keep_polarity: bool = True):
    """Dispatch: device render for short clips, host numpy for long ones.

    XLA pads channels-minor f32 arrays to 128 lanes on TPU — the
    (T, H, W, 2/3) event-frame temporaries expand 43-65x, and the
    321-frame reference workload OOMs HBM at 28 GB. The reference renders
    on host CPU anyway (v2ce.py:241-280); we keep the fused device path
    where it fits (short clips, tests) and mirror the same math in numpy
    beyond that."""
    t = voxels.shape[0]
    if t <= 64:
        return _render_event_frames_jit(
            voxels, ceil=float(ceil),
            upper_bound_percentile=upper_bound_percentile,
            keep_polarity=keep_polarity)
    v = np.asarray(voxels)
    tt, h, w, c = v.shape
    v = v.reshape(tt, h, w, 2, c // 2)
    if keep_polarity:
        efs = np.concatenate(
            [v.sum(axis=-1), np.zeros((tt, h, w, 1), v.dtype)], axis=-1)
    else:
        efs = np.repeat(v.sum(axis=(-2, -1))[..., None], 3, axis=-1)
    nz = efs[efs > 0]
    bound = (np.percentile(nz, upper_bound_percentile) if nz.size else 1.0)
    bound = max(min(bound, float(ceil)), 1e-6)
    efs = np.clip(efs, 0, bound) / bound
    return (efs * 255.0).astype(np.uint8)


def render_event_frames_cmajor(voxels, *, ceil: float = 10.0,
                               upper_bound_percentile: int = 98,
                               keep_polarity: bool = True) -> np.ndarray:
    """Channel-major (T, 20, H, W) device voxels -> (T, H, W, 3) uint8
    host frames, entirely on device until the uint8 fetch.

    This is the driver's path: W-minor layouts pad only 346->384 under
    TPU tiling (channels-minor f32 pads 6.4-65x and OOM'd long clips),
    and the fetch is CONTENT channels only — 2 uint8 planes for rgb
    (B is identically zero, appended on host), 1 for gray (replicated on
    host): ~40x less tunnel traffic than pulling f32 voxels, 1.5-3x less
    than fetching the assembled 3-channel frames."""
    out = _render_cmajor_jit(
        voxels, ceil=float(ceil),
        upper_bound_percentile=upper_bound_percentile,
        keep_polarity=keep_polarity)
    return _assemble_channels(np.asarray(out), keep_polarity)


def _assemble_channels(out: np.ndarray, keep_polarity: bool) -> np.ndarray:
    """(T, 2|1, H, W) fetched content channels -> (T, H, W, 3) frames."""
    t, _, h, w = out.shape
    if keep_polarity:
        out = np.concatenate(
            [out, np.zeros((t, 1, h, w), np.uint8)], axis=1)
    else:
        out = np.repeat(out, 3, axis=1)
    return np.moveaxis(out, 1, -1)


def _percentile_bound(flat, upper_bound_percentile, ceil, *,
                      select_len=None, dup=1):
    """min(percentile of nonzero values, ceil): exact order-statistic
    interpolation for small inputs, count-threshold bisection beyond (the
    nanpercentile sort crashes the TPU compiler at ~86M elements).

    select_len/dup preserve bit-exact parity with the legacy 3-channel
    bound when the caller passes content channels only: the exact-vs-
    bisection switch uses the virtual 3-channel length, and gray-mode
    values are re-duplicated (dup=3) on the exact path (quantile
    interpolation over the duplicated multiset differs slightly from the
    unique set; the bisection is scale-invariant so dup is skipped there,
    and zeros never enter either bound)."""
    if (select_len if select_len is not None else flat.shape[0]) <= (1 << 21):
        if dup > 1:
            flat = jnp.repeat(flat, dup)
        nz = jnp.where(flat > 0, flat, jnp.nan)
        bound = jnp.nanpercentile(nz, upper_bound_percentile)
        bound = jnp.nan_to_num(bound, nan=1.0)
    else:
        n = jnp.sum(flat > 0)
        k = n.astype(jnp.float32) * (1.0 - upper_bound_percentile / 100.0)

        def body(_, st):
            lo, hi = st
            mid = 0.5 * (lo + hi)
            pred = jnp.sum(flat > mid).astype(jnp.float32) > k
            return (jnp.where(pred, mid, lo), jnp.where(pred, hi, mid))

        _, hi = jax.lax.fori_loop(0, 30, body,
                                  (jnp.float32(0.0),
                                   jnp.max(flat).astype(jnp.float32)))
        bound = jnp.where(n == 0, 1.0, hi)
    bound = jnp.minimum(bound, float(ceil))
    return jnp.maximum(bound, 1e-6)


def render_event_frames_from_sums(ef2, *, ceil: float = 10.0,
                                  upper_bound_percentile: int = 98,
                                  keep_polarity: bool = True) -> np.ndarray:
    """Per-polarity event-frame sums (T, 2, H, W) -> (T, H, W, 3) uint8
    host frames — the streaming driver's path (it never materializes the
    whole voxel grid, only these light per-window sums)."""
    out = _finish_render_jit(
        ef2, ceil=float(ceil),
        upper_bound_percentile=upper_bound_percentile,
        keep_polarity=keep_polarity)
    return _assemble_channels(np.asarray(out), keep_polarity)


@functools.partial(jax.jit, static_argnames=("keep_polarity",
                                             "upper_bound_percentile",
                                             "ceil"))
def _finish_render_jit(ef2, *, ceil, upper_bound_percentile,
                       keep_polarity):
    """Device render down to CONTENT channels only: (t, 2, h, w) uint8 for
    rgb (R = ON, G = OFF; the zero B plane is appended host-side), (t, 1,
    h, w) for gray (replicated host-side) — the host fetch is the CLI's
    dominant cost through the tunnel and the dropped planes carry no
    information. The percentile bound stays bit-identical to the legacy
    3-channel math via select_len/dup (see _percentile_bound)."""
    t, _, h, w = ef2.shape
    if keep_polarity:
        efs = ef2
    else:
        efs = ef2.sum(axis=1, keepdims=True)
    bound = _percentile_bound(
        efs.reshape(-1), upper_bound_percentile, ceil,
        select_len=t * 3 * h * w, dup=1 if keep_polarity else 3)
    efs = jnp.clip(efs, 0, bound) / bound
    return (efs * 255.0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("keep_polarity",
                                             "upper_bound_percentile",
                                             "ceil"))
def _render_cmajor_jit(voxels, *, ceil, upper_bound_percentile,
                       keep_polarity):
    t, c, h, w = voxels.shape
    v = voxels.reshape(t, 2, c // 2, h, w)
    return _finish_render_jit(
        v.sum(axis=2), ceil=ceil,
        upper_bound_percentile=upper_bound_percentile,
        keep_polarity=keep_polarity)


@functools.partial(jax.jit, static_argnames=("keep_polarity", "upper_bound_percentile", "ceil"))
def _render_event_frames_jit(
    voxels: jax.Array,
    *,
    ceil: float = 10.0,
    upper_bound_percentile: int = 98,
    keep_polarity: bool = True,
) -> jax.Array:
    """(T, L_bins... ) channels-last voxels (T, H, W, 20) -> (T, H, W, 3) uint8 RGB.

    Channel layout of the input follows the model: c = p*10 + bin with p=0
    the ON polarity.
    """
    t, h, w, c = voxels.shape
    v = voxels.reshape(t, h, w, 2, c // 2)
    if keep_polarity:
        # R = ON sum, G = OFF sum, B = 0 (reference: v2ce.py:254-257)
        efs = jnp.concatenate(
            [v.sum(axis=-1), jnp.zeros((t, h, w, 1), v.dtype)], axis=-1
        )
    else:
        total = v.sum(axis=(-2, -1))[..., None]
        efs = jnp.repeat(total, 3, axis=-1)        # gray (v2ce.py:259-260)

    # Upper bound = min(percentile of nonzero values, ceil) (v2ce.py:261-264).
    flat = efs.reshape(-1)
    if flat.shape[0] <= (1 << 21):
        # exact order-statistic interpolation for short clips / tests
        nz = jnp.where(flat > 0, flat, jnp.nan)
        bound = jnp.nanpercentile(nz, upper_bound_percentile)
        bound = jnp.nan_to_num(bound, nan=1.0)
    else:
        # long videos: nanpercentile lowers to a global sort that crashes
        # the TPU compiler at ~86M elements (321-frame README workload);
        # a count-threshold bisection converges to the same bound with 30
        # cheap reductions and no sort
        n = jnp.sum(flat > 0)
        k = n.astype(jnp.float32) * (1.0 - upper_bound_percentile / 100.0)

        def body(_, st):
            lo, hi = st
            mid = 0.5 * (lo + hi)
            above = jnp.sum(flat > mid).astype(jnp.float32)
            pred = above > k
            return (jnp.where(pred, mid, lo), jnp.where(pred, hi, mid))

        _, hi = jax.lax.fori_loop(0, 30, body,
                                  (jnp.float32(0.0),
                                   jnp.max(flat).astype(jnp.float32)))
        bound = jnp.where(n == 0, 1.0, hi)
    bound = jnp.minimum(bound, float(ceil))
    bound = jnp.maximum(bound, 1e-6)

    efs = jnp.clip(efs, 0, bound) / bound
    return (efs * 255.0).astype(jnp.uint8)
