"""Jitted stage-1 forward step with center-crop / panoramic width tiling.

Center mode crops the middle `width` columns (reference: v2ce.py:66-89).
Pano mode tiles the width into ceil(W/width) strips — the last strip
right-aligned — runs the model on every strip, trims the last strip to the
remainder, and concatenates on width (reference: v2ce.py:91-129).

TPU re-design: strips are independent, so instead of the reference's
sequential per-strip loop they are folded into the batch axis of ONE
forward pass — the MXU sees a single large batch, and under pjit the same
axis shards across chips.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from v2ce_toolbox_tpu.pipeline.preprocess import normalize_pairs


def _center_crop(units: jax.Array, width: int) -> jax.Array:
    """Center-crop the width axis of (B, L, H, W, C) units
    (reference: v2ce.py:78)."""
    w = units.shape[3]
    lo = w // 2 - width // 2
    return jax.lax.slice_in_dim(units, lo, lo + width, axis=3)


def make_forward_fn(
    model,
    variables,
    *,
    infer_type: str = "center",
    width: int = 346,
    resized_width: Optional[int] = None,
    compute_dtype=jnp.float32,
    donate: bool = False,
    mesh=None,
) -> Callable[[jax.Array], jax.Array]:
    """Build a jitted (B, L+1, H, W') frames -> (B, L, H, W_out, 20) voxels
    forward step (normalization + pairing fused in).

    Args:
      model: flax module with .apply(variables, x, train=False).
      variables: converted/initialized variables pytree.
      infer_type: 'center' | 'pano'.
      width: model input width (346).
      resized_width: W' of the incoming frames; required for 'pano'.
    """
    if infer_type not in ("center", "pano"):
        raise ValueError(f"invalid infer_type {infer_type!r}")

    if infer_type == "pano":
        if resized_width is None:
            raise ValueError("pano mode needs resized_width")
        n_strips = -(-resized_width // width)
        remainder = resized_width % width

    def fwd(frames: jax.Array) -> jax.Array:
        units = normalize_pairs(frames.astype(compute_dtype))
        if infer_type == "center":
            units = _center_crop(units, width)
            return model.apply(variables, units, train=False)

        # pano: strips -> batch axis
        b, l, h, _, c = units.shape
        strips = [
            jax.lax.slice_in_dim(units, i * width, (i + 1) * width, axis=3)
            for i in range(n_strips - 1)
        ]
        strips.append(units[:, :, :, -width:, :])  # right-aligned last strip
        x = jnp.concatenate(strips, axis=0)        # (n_strips*B, L, H, width, C)
        out = model.apply(variables, x, train=False)
        outs = jnp.split(out, n_strips, axis=0)
        if remainder != 0:
            outs[-1] = outs[-1][:, :, :, -remainder:, :]
        return jnp.concatenate(outs, axis=3)       # (B, L, H, W', 20)

    if mesh is not None:
        # Inference is embarrassingly parallel along the window batch
        # (SURVEY.md §2.5): shard axis 0 over the 'data' mesh axis, params
        # replicated; XLA keeps everything chip-local (no collectives).
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = NamedSharding(mesh, P("data"))
        return jax.jit(fwd, in_shardings=data, out_shardings=data,
                       donate_argnums=(0,) if donate else ())
    return jax.jit(fwd, donate_argnums=(0,) if donate else ())
