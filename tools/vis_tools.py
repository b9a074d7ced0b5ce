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


# ---------------------------------------------------------------------------
# optical-flow color wheel (reference: train/scripts/utils/flow_vis.py)
# ---------------------------------------------------------------------------

def _make_colorwheel() -> np.ndarray:
    """Baker et al. flow color wheel, 55 colors (standard flow_vis)."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[0:RY, 0] = 255
    wheel[0:RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    wheel[col:col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    wheel[col:col + YG, 1] = 255
    col += YG
    wheel[col:col + GC, 1] = 255
    wheel[col:col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    wheel[col:col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col:col + CB, 2] = 255
    col += CB
    wheel[col:col + BM, 2] = 255
    wheel[col:col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    wheel[col:col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col:col + MR, 0] = 255
    return wheel


def flow_to_color(flow: np.ndarray, clip_flow: float = None) -> np.ndarray:
    """(H, W, 2) optical flow -> (H, W, 3) uint8 color render
    (reference: train/scripts/utils/flow_vis.py, the standard colorwheel)."""
    u, v = flow[..., 0].astype(np.float64), flow[..., 1].astype(np.float64)
    if clip_flow is not None:
        u, v = np.clip(u, -clip_flow, clip_flow), np.clip(v, -clip_flow, clip_flow)
    rad = np.sqrt(u ** 2 + v ** 2)
    rad_max = max(rad.max(), 1e-5)
    u, v = u / rad_max, v / rad_max
    rad = rad / rad_max

    wheel = _make_colorwheel()
    ncols = wheel.shape[0]
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(int)
    k1 = (k0 + 1) % ncols
    f = fk - k0
    out = np.zeros((*u.shape, 3), np.uint8)
    for ch in range(3):
        col0 = wheel[k0, ch] / 255.0
        col1 = wheel[k1, ch] / 255.0
        col = (1 - f) * col0 + f * col1
        col = 1 - rad * (1 - col)          # saturate with radius
        out[..., ch] = np.floor(255 * col)
    return out


def plot_confusion_matrix(cm: np.ndarray, class_names, save_path=None):
    """Confusion-matrix figure (reference:
    train/scripts/utils/confusion_matrix.py, matplotlib part)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6))
    im = ax.imshow(cm, cmap="Blues")
    ax.set_xticks(range(len(class_names)), class_names, rotation=45)
    ax.set_yticks(range(len(class_names)), class_names)
    norm = cm.astype(np.float64) / np.maximum(cm.sum(axis=1, keepdims=True), 1)
    for i in range(cm.shape[0]):
        for j in range(cm.shape[1]):
            ax.text(j, i, f"{cm[i, j]}\n{norm[i, j]:.2f}",
                    ha="center", va="center",
                    color="white" if norm[i, j] > 0.5 else "black",
                    fontsize=8)
    ax.set_xlabel("Predicted")
    ax.set_ylabel("True")
    fig.colorbar(im)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
        return save_path
    return fig


_XYT_HTML_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>__TITLE__</title>
<style>
 body{margin:0;background:#111;color:#ddd;font:13px sans-serif;overflow:hidden}
 #hud{position:fixed;top:8px;left:10px;opacity:.8}
 canvas{display:block;cursor:grab}
</style></head><body>
<div id="hud">__TITLE__ — drag to rotate, wheel to zoom<br>
 <span style="color:lightcoral">&#9632;</span> ON
 <span style="color:lightgreen">&#9632;</span> OFF</div>
<canvas id="c"></canvas>
<script>
const DATA = __DATA__;           // [t, x, y, p] columns, normalized later
const cv = document.getElementById('c'), ctx = cv.getContext('2d');
let W, H; function resize(){W=cv.width=innerWidth;H=cv.height=innerHeight;}
resize(); addEventListener('resize', ()=>{resize();draw();});
const n = DATA.t.length;
// normalize each axis to [-1, 1]
function norm(a){const lo=Math.min(...a),hi=Math.max(...a),s=hi>lo?hi-lo:1;
  return a.map(v=>2*(v-lo)/s-1);}
const T=norm(DATA.t), X=norm(DATA.x), Y=norm(DATA.y), P=DATA.p;
let rx=-0.4, ry=0.7, zoom=0.9;
let dragging=false, px=0, py=0;
cv.onmousedown=e=>{dragging=true;px=e.clientX;py=e.clientY;};
onmouseup=()=>dragging=false;
onmousemove=e=>{if(!dragging)return;
  ry+=(e.clientX-px)*0.006; rx+=(e.clientY-py)*0.006;
  px=e.clientX; py=e.clientY; draw();};
cv.onwheel=e=>{zoom*=e.deltaY<0?1.1:0.9; draw(); e.preventDefault();};
function draw(){
  ctx.fillStyle='#111'; ctx.fillRect(0,0,W,H);
  const cX=Math.cos(rx),sX=Math.sin(rx),cY=Math.cos(ry),sY=Math.sin(ry);
  const s=Math.min(W,H)*0.35*zoom;
  // draw a faint axis frame (t axis longest: aspect 1.5,1,0.75)
  for(let i=0;i<n;i++){
    // world coords: z=t (depth axis), x=x, y=y (screen up inverted)
    let wx=X[i], wy=-Y[i]*0.75, wz=T[i]*1.5;
    let x1=wx*cY+wz*sY, z1=-wx*sY+wz*cY;          // rotate about Y
    let y2=wy*cX-z1*sX, z2=wy*sX+z1*cX;           // rotate about X
    const persp=1/(1+z2*0.25);
    const sx=W/2+x1*s*persp, sy=H/2+y2*s*persp;
    ctx.fillStyle = P[i] ? 'rgba(240,128,128,0.75)'
                         : 'rgba(144,238,144,0.75)';
    ctx.fillRect(sx, sy, 1.6*persp+0.4, 1.6*persp+0.4);
  }
}
draw();
</script></body></html>
"""


def plot_raw_events_xyt_html(events, out_path, timespan: int = 1500,
                             max_events: int = 60000,
                             title: str = "raw events (x, y, t)") -> str:
    """Interactive 3D x-y-t scatter as a SELF-CONTAINED html file — the
    plotly-parity fallback (reference: tools/vis_tools.py:268-326 uses
    plotly Scatter3d; plotly is not installed here, so the viewer is a
    vendored ~60-line canvas renderer with drag-rotate/zoom, same
    lightcoral/lightgreen polarity palette and the same 260-y flip).

    Args:
      events: structured array with timestamp/x/y/polarity fields, or an
        (N, 4) float array of [t, x, y, p] rows like the reference.
      timespan: keep events with t - t.min() < timespan (reference arg).
    Returns out_path.
    """
    import json

    if events.dtype.names:
        t = np.asarray(events["timestamp"], np.float64)
        x = np.asarray(events["x"], np.float64)
        y = 260.0 - np.asarray(events["y"], np.float64)
        p = np.asarray(events["polarity"], np.int32)
    else:
        t = np.asarray(events[:, 0], np.float64)
        x = np.asarray(events[:, 1], np.float64)
        y = 260.0 - np.asarray(events[:, 2], np.float64)
        p = np.asarray(events[:, 3], np.int32)

    if timespan is not None and len(t):
        keep = (t - t.min()) < timespan
        t, x, y, p = t[keep], x[keep], y[keep], p[keep]
    if len(t) > max_events:
        sel = np.sort(np.random.RandomState(0).choice(
            len(t), max_events, replace=False))
        t, x, y, p = t[sel], x[sel], y[sel], p[sel]

    data = json.dumps({"t": t.tolist(), "x": x.tolist(),
                       "y": y.tolist(), "p": p.astype(int).tolist()})
    html = (_XYT_HTML_TEMPLATE
            .replace("__TITLE__", title)
            .replace("__DATA__", data))
    with open(out_path, "w") as f:
        f.write(html)
    return out_path
