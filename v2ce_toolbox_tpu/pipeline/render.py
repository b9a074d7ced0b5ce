"""Event-frame rendering: voxels -> displayable uint8 frames.

Mirrors write_event_frame_video (reference: v2ce.py:241-280): sum the voxel
grid over time bins, map polarities to R/G channels (blue zero) or replicate
the polarity-sum to gray, bound values by min(percentile of nonzero values,
ceil), clip-normalize, and scale to uint8. The reductions and the
percentile run on device; only the final uint8 frames go to the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("keep_polarity", "upper_bound_percentile", "ceil"))
def render_event_frames(
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
    nz = jnp.where(flat > 0, flat, jnp.nan)
    bound = jnp.nanpercentile(nz, upper_bound_percentile)
    bound = jnp.minimum(jnp.nan_to_num(bound, nan=1.0), float(ceil))
    bound = jnp.maximum(bound, 1e-6)

    efs = jnp.clip(efs, 0, bound) / bound
    return (efs * 255.0).astype(jnp.uint8)
