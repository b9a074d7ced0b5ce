"""Evaluation metrics for voxel prediction quality, as pure jnp functions.

Functional equivalents of the reference metrics
(reference: train/scripts/model/metrics.py), operating on channels-last
voxels (B, L, H, W, 20) with channel c = p*10 + bin.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp

from v2ce_toolbox_tpu.train.losses import _avg_pool_nd, _to_bp_lc_hw


def _reduce(v: jax.Array, op_type: str) -> jax.Array:
    """'raw' keeps the voxel; 'sum_c' sums time bins per polarity; 'sum_cp'
    sums bins and polarities (reference: metrics.py:46-53, 100-106)."""
    if op_type == "raw":
        return v
    b, l, h, w, c = v.shape
    split = v.reshape(b, l, h, w, 2, c // 2)
    if op_type == "sum_c":
        return split.sum(axis=-1)              # (B, L, H, W, P)
    if op_type == "sum_cp":
        return split.sum(axis=(-2, -1))        # (B, L, H, W)
    raise ValueError(f"invalid op_type {op_type!r}")


def binary_match(pred: jax.Array, y: jax.Array, op_type: str = "raw",
                 threshold: float = 0.01) -> jax.Array:
    """Binary occupancy agreement at >0.01 (reference: metrics.py:39-62)."""
    p = _reduce(pred, op_type) > threshold
    g = _reduce(y, op_type) > threshold
    return jnp.mean((p == g).astype(jnp.float64 if jax.config.x64_enabled
                                    else jnp.float32))


def f1score(pred_binary: jax.Array, y_binary: jax.Array) -> jax.Array:
    """F1 on {0,1} arrays (reference: metrics.py:65-90)."""
    pred_binary = pred_binary.astype(jnp.float32)
    y_binary = y_binary.astype(jnp.float32)
    tp = jnp.sum(pred_binary * y_binary)
    fp = jnp.sum(pred_binary * (1 - y_binary))
    fn = jnp.sum((1 - pred_binary) * y_binary)
    precision = tp / (tp + fp + 1e-8)
    recall = tp / (tp + fn + 1e-8)
    return 2 * precision * recall / (precision + recall + 1e-8)


def binary_match_f1(pred: jax.Array, y: jax.Array, op_type: str = "sum_cp",
                    threshold: float = 0.01) -> jax.Array:
    p = (_reduce(pred, op_type) > threshold)
    g = (_reduce(y, op_type) > threshold)
    return f1score(p, g)


def pool_mse(pred: jax.Array, y: jax.Array, kernel_size: int = 2) -> jax.Array:
    """MSE of AvgPool3d(k) over the (l*c, h, w) volume
    (reference: metrics.py:117-128)."""
    k = kernel_size
    win = (k, k, k)
    p = _avg_pool_nd(_to_bp_lc_hw(pred), win, win, ((0, 0),) * 3)
    g = _avg_pool_nd(_to_bp_lc_hw(y), win, win, ((0, 0),) * 3)
    return jnp.mean(jnp.square(p - g))


def mean_ratio(pred: jax.Array, y: jax.Array) -> jax.Array:
    """Symmetric per-voxel magnitude ratio (reference: metrics.py:131-140)."""
    ratio = (pred + 0.01) / (y + 0.01)
    ratio = jnp.where(ratio < 1, 1 / ratio, ratio)
    return jnp.mean(ratio)


def accuracy(pred: jax.Array, y: jax.Array) -> jax.Array:
    """Last-axis argmax agreement (reference: metrics.py:27-36)."""
    return jnp.mean((jnp.argmax(pred, -1) == jnp.argmax(y, -1))
                    .astype(jnp.float32))


def l1_metric(pred: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - y))


def build_metric_suite(
    names: Sequence[str] = ("binarymatch", "binarymatchf1", "poolmse", "l1"),
    acc_types: Sequence[str] = ("raw", "sum_c", "sum_cp"),
    f1_types: Sequence[str] = ("raw", "sum_c", "sum_cp"),
    poolmse_kernel_sizes: Sequence[int] = (2, 4),
) -> Dict[str, Callable]:
    """Named metric suite mirroring configure_metrics
    (reference: model_interface.py:374-403)."""
    import functools

    suite: Dict[str, Callable] = {}
    names = [n.lower() for n in names]
    if "acc" in names:
        suite["Acc"] = accuracy
    if "binarymatch" in names:
        for t in acc_types:
            suite[f"BinaryMatch_{t}"] = functools.partial(binary_match, op_type=t)
    if "binarymatchf1" in names:
        for t in f1_types:
            suite[f"BinaryMatchF1_{t}"] = functools.partial(binary_match_f1, op_type=t)
    if "meanratio" in names:
        suite["MeanRatio"] = mean_ratio
    if "poolmse" in names:
        for k in poolmse_kernel_sizes:
            suite[f"PoolMSE_{k}"] = functools.partial(pool_mse, kernel_size=k)
    if "l1" in names:
        suite["L1"] = l1_metric
    return suite
