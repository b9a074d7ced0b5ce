"""Frame preprocessing: host-side decode/resize, device-side normalize.

The reference preprocesses on the host with torchvision
(reference: v2ce.py:45-64): uint8 -> float/255 -> cv2.resize so height
becomes 260 (width scaled to keep aspect) -> stack consecutive-frame pairs
-> Normalize(mean=0.153, std=0.165).

TPU split: the resize stays on host (it is part of video decode, runs
concurrently with TPU compute), while pair-stacking and normalization are
folded into the jit graph so XLA fuses them into the first conv.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from v2ce_toolbox_tpu.config import FRAME_MEAN, FRAME_STD


def resize_frames(frames: np.ndarray, height: int = 260) -> np.ndarray:
    """uint8 (N, H, W) grayscale frames -> float32 (N, height, W') in [0,1].

    Width is scaled to preserve aspect ratio, truncating like the reference
    (`int(w/h*height)`, v2ce.py:59). Uses cv2 bilinear (the reference's
    default interpolation).
    """
    import cv2  # local: host-only dependency

    frames = frames.astype(np.float32) / 255.0
    h, w = frames.shape[-2:]
    out_w = int(w / h * height)
    if (h, w) == (height, out_w):
        return frames
    return np.stack(
        [cv2.resize(f, (out_w, height)) for f in frames], axis=0
    )


def normalize_pairs(frames: jax.Array) -> jax.Array:
    """(B, L+1, H, W) float frames -> (B, L, H, W, 2) normalized pair units.

    Channel 0 is frame_t, channel 1 is frame_{t+1}
    (reference: v2ce.py:62-63). Runs inside jit.
    """
    pairs = jnp.stack([frames[:, :-1], frames[:, 1:]], axis=-1)
    return (pairs - FRAME_MEAN) / FRAME_STD
