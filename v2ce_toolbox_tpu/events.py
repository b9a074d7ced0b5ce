"""Fixed-capacity event-stream containers (SoA) and host-edge converters.

The reference represents event streams as ragged numpy recarrays with dtype
[('timestamp', '<i8'), ('x', '<i2'), ('y', '<i2'), ('polarity', 'i1')]
(reference: scripts/LDATI.py:308-309). Ragged shapes cannot live inside an
XLA graph, so on device an event stream is a struct-of-arrays with a static
capacity, a per-frame validity count, and an overflow (dropped-event)
counter. Conversion to the reference's recarray format happens only at the
host boundary (file writing / interop).
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# The reference's on-disk structured dtype (reference: scripts/LDATI.py:308-309).
EVENT_DTYPE = np.dtype(
    [("timestamp", "<i8"), ("x", "<i2"), ("y", "<i2"), ("polarity", "i1")]
)


class EventStream(NamedTuple):
    """A batch of per-frame fixed-capacity event buffers.

    All arrays share the leading batch (frame) axis B and capacity E.
    Slots >= count[b] are invalid padding (timestamp sentinel INT32_MAX).

    Timestamps are int32 microseconds *within the local time window* (the
    per-frame / per-chunk t0 offset is applied at the host edge in int64,
    mirroring v2ce.py:363-366 which adds `i/fps*1e6` after sampling).
    """

    t_us: jax.Array      # (B, E) int32, sorted ascending per frame
    x: jax.Array         # (B, E) int16  — width index
    y: jax.Array         # (B, E) int16  — height index
    p: jax.Array         # (B, E) int8   — 1 = ON, 0 = OFF
    count: jax.Array     # (B,) int32    — number of valid events
    dropped: jax.Array   # (B,) int32    — events lost to capacity/cap limits

    @property
    def capacity(self) -> int:
        return self.t_us.shape[-1]


def to_recarrays(stream: EventStream, t0_offsets_us=None) -> List[np.recarray]:
    """Convert an on-device EventStream to the reference's list-of-recarrays.

    Args:
      stream: device or host EventStream.
      t0_offsets_us: optional (B,) int64 offsets added per frame, mirroring
        the `i / fps * 1e6` shift of v2ce.py:365.
    """
    t, x, y, p, count = (
        np.asarray(stream.t_us),
        np.asarray(stream.x),
        np.asarray(stream.y),
        np.asarray(stream.p),
        np.asarray(stream.count),
    )
    num_frames = t.shape[0]
    if t0_offsets_us is None:
        t0_offsets_us = np.zeros((num_frames,), np.int64)
    out = []
    for i in range(num_frames):
        n = int(count[i])
        rec = np.rec.fromarrays(
            [
                t[i, :n].astype(np.int64) + int(t0_offsets_us[i]),
                x[i, :n].astype(np.int16),
                y[i, :n].astype(np.int16),
                p[i, :n].astype(np.int8),
            ],
            names=["timestamp", "x", "y", "polarity"],
        )
        out.append(rec)
    return out


def concatenate_recarrays(recs: List[np.recarray]) -> np.ndarray:
    """Concatenate per-frame recarrays into one stream (v2ce.py:367)."""
    return np.concatenate(recs)


def from_recarray(rec: np.ndarray, capacity: int) -> EventStream:
    """Host helper: pack a single reference recarray into a 1-frame buffer."""
    n = min(len(rec), capacity)
    t = np.full((1, capacity), np.iinfo(np.int32).max, np.int32)
    x = np.zeros((1, capacity), np.int16)
    y = np.zeros((1, capacity), np.int16)
    p = np.zeros((1, capacity), np.int8)
    t[0, :n] = rec["timestamp"][:n]
    x[0, :n] = rec["x"][:n]
    y[0, :n] = rec["y"][:n]
    p[0, :n] = rec["polarity"][:n]
    return EventStream(
        t_us=jnp.asarray(t),
        x=jnp.asarray(x),
        y=jnp.asarray(y),
        p=jnp.asarray(p),
        count=jnp.asarray([n], jnp.int32),
        dropped=jnp.asarray([max(0, len(rec) - capacity)], jnp.int32),
    )
