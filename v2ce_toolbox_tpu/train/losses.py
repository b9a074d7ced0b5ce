"""Stage-1 training losses, as pure jnp functions.

Functional re-design of the reference's loss zoo
(reference: train/scripts/model/losses.py, composed by
train/scripts/model/model_interface.py:154-343). All functions take
channels-last voxels (B, L, H, W, 20) where channel c = p*10 + bin with
p=0 the ON polarity, and return scalars numerically equal to the reference
applied to the equivalent (B, L, 20, H, W) torch tensors.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _mse(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(a - b))


def _to_bp_lc_hw(v: jax.Array) -> jax.Array:
    """(B, L, H, W, 20) -> (B*P, L*C, H, W), the reference's
    'b l (p c) h w -> (b p) (l c) h w' rearrange (model_interface.py:262)."""
    b, l, h, w, c = v.shape
    v = v.reshape(b, l, h, w, 2, c // 2)
    v = jnp.transpose(v, (0, 4, 1, 5, 2, 3))
    return v.reshape(b * 2, l * (c // 2), h, w)


def _avg_pool_nd(x: jax.Array, window: Tuple[int, ...],
                 strides: Tuple[int, ...],
                 padding: Tuple[Tuple[int, int], ...]) -> jax.Array:
    """Torch-convention average pool (count_include_pad=True) over the
    trailing len(window) axes of x."""
    nd = len(window)
    full_window = (1,) * (x.ndim - nd) + window
    full_strides = (1,) * (x.ndim - nd) + strides
    full_pad = ((0, 0),) * (x.ndim - nd) + padding
    summed = lax.reduce_window(x, 0.0, lax.add, full_window, full_strides,
                               full_pad)
    import math

    return summed / float(math.prod(window))


def pyramid3d_loss(pred: jax.Array, gt: jax.Array,
                   add_base_loss: bool = False,
                   scales: Sequence[int] = (2, 4, 8)) -> jax.Array:
    """MSE over AvgPool3d pyramids of the (l*c, h, w) volume
    (reference: losses.py:16-30; the 4-D input makes torch's AvgPool3d pool
    over the channel axis too)."""
    p = _to_bp_lc_hw(pred)
    g = _to_bp_lc_hw(gt)
    loss = _mse(p, g) if add_base_loss else 0.0
    for s in scales:
        win = (s, s, s)
        loss = loss + _mse(
            _avg_pool_nd(p, win, win, ((0, 0),) * 3),
            _avg_pool_nd(g, win, win, ((0, 0),) * 3),
        )
    return loss / len(scales)


def pyramid_temporal_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """MSE over 1-D average pools of the temporal (l*c) axis
    (reference: losses.py:32-49 with the (b p)(l c) rearrange of
    model_interface.py:274-277)."""
    def prep(v):
        x = _to_bp_lc_hw(v)                       # (N, D, H, W)
        n, d, h, w = x.shape
        return jnp.transpose(x.reshape(n, d, h * w), (0, 2, 1))  # (N, HW, D)

    p, g = prep(pred), prep(gt)
    loss = _mse(p, g)
    loss = loss + _mse(
        _avg_pool_nd(p, (3,), (3,), ((1, 1),)),
        _avg_pool_nd(g, (3,), (3,), ((1, 1),)),
    )
    loss = loss + _mse(
        _avg_pool_nd(p, (5,), (5,), ((0, 0),)),
        _avg_pool_nd(g, (5,), (5,), ((0, 0),)),
    )
    return loss / 2.0


def event_frame_loss(pred: jax.Array, gt: jax.Array, *,
                     split_polarity: bool, ef_type: str = "c+cl",
                     alpha_efc: float = 5.0) -> jax.Array:
    """Event-frame MSE over bin/frame-collapsed voxels
    (reference: model_interface.py:193-235).

    In the reference layout the voxel is (B, L, C20, H, W) for 'ef' and
    (B, L, C10, P, H, W) for 'ef_splitp'; 'cl' sums dims (1, 2) and
    'only_c' sums dim 2. The ef_splitp variant is weighted x2 by the
    caller.
    """
    b, l, h, w, c = pred.shape
    if split_polarity:
        # (B, L, C10, P, H, W): sum over C keeps P
        pv = jnp.transpose(pred.reshape(b, l, h, w, 2, c // 2), (0, 1, 5, 4, 2, 3))
        gv = jnp.transpose(gt.reshape(b, l, h, w, 2, c // 2), (0, 1, 5, 4, 2, 3))
    else:
        pv = jnp.transpose(pred, (0, 1, 4, 2, 3))   # (B, L, 20, H, W)
        gv = jnp.transpose(gt, (0, 1, 4, 2, 3))

    if ef_type == "cl":
        return _mse(jnp.abs(pv).sum(axis=(1, 2)), jnp.abs(gv).sum(axis=(1, 2)))
    if ef_type == "only_c":
        return _mse(jnp.abs(pv).sum(axis=2), jnp.abs(gv).sum(axis=2))
    if ef_type == "c+cl":
        loss_c = _mse(jnp.abs(pv).sum(axis=2), jnp.abs(gv).sum(axis=2))
        loss_cl = _mse(jnp.abs(pv).sum(axis=(1, 2)), jnp.abs(gv).sum(axis=(1, 2)))
        return alpha_efc * loss_c + loss_cl
    raise ValueError(f"invalid ef_type {ef_type!r}")


def match_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """NLL over the frame axis against the GT's argmax frame
    (reference: losses.py:116-127 — torch softmax/NLLLoss use dim 1, which
    for a (B, L, C, H, W) voxel is the L axis)."""
    pv = jnp.transpose(pred, (0, 1, 4, 2, 3))      # (B, L, C, H, W)
    gv = jnp.transpose(gt, (0, 1, 4, 2, 3))
    logp = jax.nn.log_softmax(pv, axis=1)
    target = jnp.argmax(gv, axis=1)                # (B, C, H, W)
    picked = jnp.take_along_axis(logp, target[:, None], axis=1)[:, 0]
    return -jnp.mean(picked)


def compensation_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """MSE of masked mean activity over dims (2, 3) of the (B, L, C, H, W)
    layout (reference: losses.py:129-142 — note the reference reduces over
    (C, H) only, keeping W; reproduced exactly)."""
    pv = jnp.transpose(pred, (0, 1, 4, 2, 3))
    gv = jnp.transpose(gt, (0, 1, 4, 2, 3))

    def masked_mean(v):
        mask = v > 0.01
        s = jnp.sum(v * mask, axis=(2, 3), keepdims=True)
        n = jnp.clip(jnp.sum(mask, axis=(2, 3), keepdims=True), min=1)
        return s / n

    return _mse(masked_mean(pv), masked_mean(gv))


def l1_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - gt))


def l2_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    return _mse(pred, gt)


def norm_l1(pred: jax.Array) -> jax.Array:
    return jnp.sum(jnp.abs(pred))


def norm_l2(pred: jax.Array) -> jax.Array:
    return jnp.sqrt(jnp.sum(jnp.square(pred)))


# ---------------------------------------------------------------------------
# composition (reference: model_interface.py:154-343)
# ---------------------------------------------------------------------------

#: Complete set of composable loss names (reference:
#: model_interface.py:345-368 — anything else raises 'Invalid loss type').
KNOWN_LOSS_NAMES = frozenset({
    "imu", "physical", "ef", "ef_splitp", "encoder", "pyramid", "pt",
    "gan", "match", "compensation", "l1", "l2", "norml1", "norml2",
})

DEFAULT_ALPHAS: Dict[str, float] = {
    # reference: train/main.py:128-140
    "alpha_imu": 1.0,
    "alpha_att": 10.0,
    "alpha_gan": 1.0,
    "alpha_pyramid": 1000.0,
    "alpha_ef": 0.5,
    "alpha_encoder": 1.0,
    "alpha_efc": 5.0,
    "alpha_match": 0.5,
    "alpha_compensation": 1.0,
    "alpha_pt": 1.0,
    "alpha_norm": 1e-5,
}


def compose_losses(
    pred: jax.Array,
    gt: jax.Array,
    loss_names: Sequence[str],
    *,
    ef_type: str = "c+cl",
    add_base_loss: bool = False,
    alphas: Dict[str, float] = DEFAULT_ALPHAS,
    gan_loss_value: jax.Array = None,
    encoder_loss_fn=None,
    pred_extras: Dict[str, jax.Array] = None,
    batch: Dict[str, jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Weighted sum of the configured voxel losses. GAN is handled by the
    training step (it owns a second optimizer) and its generator term is
    passed in via `gan_loss_value`.

    Multi-output model terms (reference: model_interface.py:162-184):
    `pred_extras` carries the auxiliary model outputs ('imu' predictions,
    'physical_atts' attention maps in channels-last (B, L, h', w', 1)) and
    `batch` the matching targets ('imu', 'physical_att'). The physical-att
    term is skipped when the model emits no attention maps, mirroring the
    reference's `'physical_atts' in pred.keys()` gate; 'imu' requires both
    sides and raises if absent (the reference KeyErrors there too).

    Unknown loss names raise ValueError (reference:
    model_interface.py:367-368).
    """
    unknown = set(loss_names) - KNOWN_LOSS_NAMES
    if unknown:
        raise ValueError(
            f"Invalid loss type(s) {sorted(unknown)!r}; "
            f"known: {sorted(KNOWN_LOSS_NAMES)}")
    a = {**DEFAULT_ALPHAS, **alphas}
    pred_extras = pred_extras or {}
    batch = batch or {}
    total = 0.0
    logs: Dict[str, jax.Array] = {}

    if "imu" in loss_names:
        # reference: model_interface.py:162-168
        if "imu" not in pred_extras or "imu" not in batch:
            raise ValueError(
                "--loss imu needs a model emitting pred_extras['imu'] and a "
                "batch carrying 'imu' targets")
        v = _mse(pred_extras["imu"], batch["imu"])
        total += a["alpha_imu"] * v
        logs["imu_loss"] = v

    if "physical" in loss_names and pred_extras.get("physical_atts"):
        # reference: model_interface.py:171-184 — averaged MSE of each
        # predicted attention stage against the single GT map.
        gt_att = batch["physical_att"]
        atts = pred_extras["physical_atts"]
        v = sum(_mse(att, gt_att) for att in atts) / len(atts)
        total += a["alpha_att"] * v
        logs["att_loss"] = v

    ef_terms = []
    if "ef" in loss_names:
        ef_terms.append(event_frame_loss(
            pred, gt, split_polarity=False, ef_type=ef_type,
            alpha_efc=a["alpha_efc"]))
    if "ef_splitp" in loss_names:
        # x2 balance (model_interface.py:230)
        ef_terms.append(2.0 * event_frame_loss(
            pred, gt, split_polarity=True, ef_type=ef_type,
            alpha_efc=a["alpha_efc"]))
    if ef_terms:
        ef = sum(ef_terms) / len(ef_terms)
        total += a["alpha_ef"] * ef
        logs["ef_loss"] = ef

    if "pyramid" in loss_names:
        v = pyramid3d_loss(pred, gt, add_base_loss=add_base_loss)
        total += a["alpha_pyramid"] * v
        logs["pyramid_loss"] = v
    if "pt" in loss_names:
        # NOTE: the reference weights pt by alpha_pyramid (a likely bug at
        # model_interface.py:282 — alpha_pt is only used in the log line);
        # we follow the reference.
        v = pyramid_temporal_loss(pred, gt)
        total += a["alpha_pyramid"] * v
        logs["pt_loss"] = v
    if "encoder" in loss_names:
        # reference: model_interface.py:238-247 — frozen VoxelEncoder MSE.
        if encoder_loss_fn is None:
            raise ValueError(
                "--loss encoder needs an EncoderLoss instance "
                "(train.voxel_encoder.EncoderLoss) passed as encoder_loss_fn")
        v = encoder_loss_fn(pred, gt)
        total += a["alpha_encoder"] * v
        logs["encoder_loss"] = v
    if "match" in loss_names:
        v = match_loss(pred, gt)
        total += a["alpha_match"] * v
        logs["match"] = v
    if "compensation" in loss_names:
        v = compensation_loss(pred, gt)
        total += a["alpha_compensation"] * v
        logs["compensation"] = v
    if "l1" in loss_names:
        v = l1_loss(pred, gt)
        total += v
        logs["l1"] = v
    if "l2" in loss_names:
        v = l2_loss(pred, gt)
        total += v
        logs["l2"] = v
    if "norml1" in loss_names:
        v = norm_l1(pred)
        total += a["alpha_norm"] * v
        logs["norml1"] = v
    if "norml2" in loss_names:
        v = norm_l2(pred)
        total += a["alpha_norm"] * v
        logs["norml2"] = v
    if "gan" in loss_names and gan_loss_value is not None:
        total += a["alpha_gan"] * gan_loss_value
        logs["gan_loss"] = gan_loss_value

    return total, logs
