"""Stage-2 quality metrics: timestamp error vs GT events.

Vectorized re-design of the reference's ts_diff_metric
(reference: train/scripts/stage2/stage2_metrics.py:22-88). The reference
builds 346x260x2 python lists of per-pixel timestamps and then runs a pure
python loop over every GT event (with an inner loop over the xy search
neighborhood); here the predicted stream is sorted once by a packed
(pixel, timestamp) int64 key and every GT event resolves its nearest
neighbor with two binary searches — O((N+M) log M) total, numpy-native.

Semantics preserved exactly: per-GT-event minimum |Δt| against predicted
events of the same polarity within `search_range` pixels, clamped at 3 time
bins (1e6/fps/10*3 µs); the clamped events are counted as overflow; returns
[mean diff in µs, overflow count].
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

_TS_PACK = 1 << 40  # > any µs timestamp we ever see in a packet


def _pixel_id(x, y, p, height: int):
    return (np.int64(x) * height + np.int64(y)) * 2 + np.int64(p)


def ts_diff_metric(
    event_gt: np.ndarray,
    event_pred: np.ndarray,
    search_range: int = 0,
    fps: int = 30,
    width: int = 346,
    height: int = 260,
) -> np.ndarray:
    """Per-GT-event nearest-timestamp error (µs) and overflow count.

    Args:
      event_gt / event_pred: structured arrays with fields
        (timestamp, x, y, polarity); GT polarity may use -1 for OFF.
    Returns: np.array([avg_diff_us, overflow_count])
    """
    clamp = 1e6 / fps / 10 * 3           # 3 bins (stage2_metrics.py:83-85)
    if len(event_gt) == 0:
        return np.array([0.0, 0])
    gt_p = event_gt["polarity"].astype(np.int64)
    gt_p = np.where(gt_p == -1, 0, gt_p)  # stage2_metrics.py:37-39

    if len(event_pred) == 0:
        return np.array([clamp, len(event_gt)])

    # Sort predictions once by packed (pixel, ts).
    pred_pix = _pixel_id(event_pred["x"], event_pred["y"],
                         event_pred["polarity"], height)
    pred_ts = event_pred["timestamp"].astype(np.int64)
    pred_key = pred_pix * _TS_PACK + pred_ts
    order = np.argsort(pred_key)
    skey = pred_key[order]
    sts = pred_ts[order]
    spix = pred_pix[order]

    gt_ts = event_gt["timestamp"].astype(np.int64)
    best = np.full(len(event_gt), np.inf)

    offsets = range(-search_range, search_range + 1)
    for dx in offsets:
        qx = event_gt["x"].astype(np.int64) + dx
        ok_x = (qx >= 0) & (qx < width)
        for dy in offsets:
            qy = event_gt["y"].astype(np.int64) + dy
            ok = ok_x & (qy >= 0) & (qy < height)
            qpix = (qx * height + qy) * 2 + gt_p
            q = qpix * _TS_PACK + gt_ts
            pos = np.searchsorted(skey, q)
            # candidate on the right (>= query ts, same pixel)
            right = np.minimum(pos, len(skey) - 1)
            d_right = np.where(
                (spix[right] == qpix), np.abs(sts[right] - gt_ts), np.inf)
            # candidate on the left (< query ts, same pixel)
            left = np.maximum(pos - 1, 0)
            d_left = np.where(
                (spix[left] == qpix) & (pos > 0),
                np.abs(sts[left] - gt_ts), np.inf)
            d = np.minimum(d_right, d_left)
            best = np.minimum(best, np.where(ok, d, np.inf))

    # events with no neighbor found keep the reference's 1e6 placeholder
    best = np.where(np.isinf(best), 1e6, best)
    overflow = best > clamp
    best = np.where(overflow, clamp, best)
    return np.array([best.mean(), int(overflow.sum())])


def event_count_ratio(event_gt: np.ndarray, event_pred: np.ndarray) -> float:
    """Pred/GT event-count ratio (reference: stage2_metrics.py:146,256)."""
    return len(event_pred) / max(len(event_gt), 1)


def roundtrip_voxel_consistency(
    voxel: np.ndarray,
    event_pred: np.ndarray,
    fps: int = 30,
) -> Dict[str, float]:
    """Re-voxelize sampled events and compare to the (relocated) input voxel
    — the reference's embedded sanity check (stage2_metrics.py:187-190).

    voxel: (2, 10, H, W) reference-layout stage-2 input for ONE frame;
    event_pred: that frame's sampled events (local µs timestamps).
    Returns abs-difference stats between the re-binned event counts and the
    integer relocated counts.
    """
    import jax.numpy as jnp

    from v2ce_toolbox_tpu.ops.ldati import relocate_counts

    p2, c, h, w = voxel.shape
    counts, _ = relocate_counts(
        jnp.asarray(voxel.reshape(p2, c, h, w), jnp.float32))
    counts = np.asarray(counts)                      # (2, 9, H, W)
    cb = c - 1
    grid = np.zeros_like(counts)
    if len(event_pred):
        bin_us = 1e6 / fps / cb
        b = np.clip(((event_pred["timestamp"] + 1) / bin_us).astype(int),
                    0, cb - 1)
        pol = np.where(event_pred["polarity"] > 0, 0, 1)  # P idx 0 = ON
        np.add.at(grid, (pol, b, event_pred["y"].astype(int),
                         event_pred["x"].astype(int)), 1)
    diff = np.abs(grid - np.maximum(counts, 0))
    return {
        "abs_diff_mean": float(diff.mean()),
        "abs_diff_max": float(diff.max()),
        "pred_total": int(grid.sum()),
        "relocated_total": int(np.maximum(counts, 0).sum()),
    }


def evaluate_samplers_on_frame(
    gt_events: np.ndarray,
    voxel: np.ndarray,
    samplers: Sequence[str] = ("ldati", "random", "even", "slope"),
    fps: int = 30,
    search_range: int = 0,
    key=None,
) -> Dict[str, Tuple[float, int, float]]:
    """Score each sampler on one frame: (avg ts error µs, overflow,
    pred/GT count ratio) — the reference's CSV row triple
    (stage2_metrics.py:256-266)."""
    import jax

    from v2ce_toolbox_tpu.ops.ldati import sample_voxel_statistical
    from v2ce_toolbox_tpu.ops.samplers import (
        sample_voxel_baseline,
        sample_voxel_pure_slope,
    )

    if key is None:
        key = jax.random.key(0)
    v = voxel[np.newaxis]                            # (1, 2, 10, H, W)
    out = {}
    for name in samplers:
        if name == "ldati":
            rec = sample_voxel_statistical(v, fps=fps, key=key)[0]
        elif name == "ldati_bidirectional":
            # reference ablation flags (LDATI.py:107-123 bidirectional
            # relocation; stage2 sweep contract stage2_metrics.py:256-266)
            rec = sample_voxel_statistical(v, fps=fps, key=key,
                                           bidirectional=True)[0]
        elif name == "ldati_pool_avg":
            rec = sample_voxel_statistical(v, fps=fps, key=key,
                                           pooling_type="avg")[0]
        elif name == "ldati_pool_weighted":
            rec = sample_voxel_statistical(v, fps=fps, key=key,
                                           pooling_type="weighted")[0]
        elif name == "random":
            rec = sample_voxel_baseline(v, fps=fps, random=True, key=key)[0]
        elif name == "even":
            rec = sample_voxel_baseline(v, fps=fps, even=True, key=key)[0]
        elif name == "slope":
            rec = sample_voxel_pure_slope(v, fps=fps, key=key)[0]
        else:
            raise ValueError(name)
        h, w = voxel.shape[-2:]
        diff, overflow = ts_diff_metric(gt_events, rec,
                                        search_range=search_range, fps=fps,
                                        width=w, height=h)
        out[name] = (float(diff), int(overflow),
                     event_count_ratio(gt_events, rec))
    return out
