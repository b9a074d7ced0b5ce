#!/usr/bin/env python
"""Visualization helpers: image grids, voxel cubes, event scatter plots.

Matplotlib equivalents of the reference viz toolbox
(reference: tools/vis_tools.py:13-432). The reference's plotly-based 3D
views (vis_cubes_plt companion plot_raw_events_xyt_plotly) fall back to
matplotlib 3D here — plotly is not available in this environment.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def batch_show(images: Sequence[np.ndarray], cols: int = 4,
               titles: Optional[Sequence[str]] = None,
               cmap: str = "gray", save_path: Optional[str] = None):
    """Grid display of a batch of images (reference: vis_tools.py:13-60)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(images)
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows),
                             squeeze=False)
    for i in range(rows * cols):
        ax = axes[i // cols][i % cols]
        ax.axis("off")
        if i < n:
            ax.imshow(np.asarray(images[i]), cmap=cmap)
            if titles is not None and i < len(titles):
                ax.set_title(titles[i], fontsize=8)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
        return save_path
    return fig


def vis_cubes(voxel: np.ndarray, threshold: float = 0.5,
              save_path: Optional[str] = None):
    """3D cube view of a (C, H, W) voxel grid
    (reference: vis_tools.py vis_cubes_plt)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    c, h, w = voxel.shape
    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(projection="3d")
    cc, yy, xx = np.nonzero(voxel > threshold)
    vals = voxel[cc, yy, xx]
    ax.scatter(xx, cc, yy, c=vals, s=2, cmap="viridis", alpha=0.5)
    ax.set_xlabel("x")
    ax.set_ylabel("bin")
    ax.set_zlabel("y")
    ax.invert_zaxis()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
        return save_path
    return fig


def plot_raw_events_xyt(events: np.ndarray, max_events: int = 50000,
                        save_path: Optional[str] = None):
    """x-y-t scatter of a raw event stream, ON red / OFF blue
    (reference: vis_tools.py plot_raw_events_xyt_plotly — plotly
    unavailable, matplotlib 3D instead)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if len(events) > max_events:
        sel = np.random.RandomState(0).choice(len(events), max_events,
                                              replace=False)
        events = events[np.sort(sel)]
    fig = plt.figure(figsize=(9, 6))
    ax = fig.add_subplot(projection="3d")
    colors = np.where(events["polarity"] > 0, "r", "b")
    ax.scatter(events["timestamp"], events["x"], events["y"],
               c=colors, s=1, alpha=0.4)
    ax.set_xlabel("t (µs)")
    ax.set_ylabel("x")
    ax.set_zlabel("y")
    ax.invert_zaxis()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
        return save_path
    return fig


def event_frame_rgb(voxel_frame: np.ndarray, bound: float = 5.0) -> np.ndarray:
    """(2, C, H, W) single-frame voxel -> RGB uint8 preview (polarity to
    R/G like the CLI video writer, v2ce.py:254-257)."""
    ef = voxel_frame.sum(axis=1)                      # (2, H, W)
    ef = np.clip(ef / bound, 0, 1)
    h, w = ef.shape[1:]
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[..., 0] = (ef[0] * 255).astype(np.uint8)
    rgb[..., 1] = (ef[1] * 255).astype(np.uint8)
    return rgb
