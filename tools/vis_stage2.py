#!/usr/bin/env python
"""Stage-2 sampler visual comparison (script form of the reference's
vis_stage2.ipynb, train/scripts/stage2/README.md:10): synthetic events ->
GT voxel -> each sampler -> side-by-side xyt scatter + per-bin histograms.

Usage: python tools/vis_stage2.py -o /tmp/vis_stage2   (writes PNGs)
"""

import argparse
import os
import os.path as op
import sys

import numpy as np

sys.path.insert(0, op.dirname(op.dirname(op.abspath(__file__))))


def synth_events(n=4000, h=64, w=80, seed=0):
    """A moving-edge synthetic stream: denser events later in the frame."""
    from v2ce_toolbox_tpu.events import EVENT_DTYPE

    rng = np.random.RandomState(seed)
    ev = np.zeros(n, EVENT_DTYPE)
    # quadratic time density (tests the slope sampler's raison d'etre)
    u = rng.rand(n)
    ev["timestamp"] = np.sort((u ** 0.5 * 33333).astype(np.int64))
    edge_x = (ev["timestamp"] / 33333 * w * 0.8).astype(int)
    ev["x"] = np.clip(edge_x + rng.randint(-2, 3, n), 0, w - 1)
    ev["y"] = rng.randint(0, h, n)
    ev["polarity"] = rng.randint(0, 2, n)
    return ev


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--out_dir", default="/tmp/vis_stage2")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    import jax

    from tools.vis_tools import plot_raw_events_xyt
    from v2ce_toolbox_tpu.data.voxelize import gen_discretized_event_volume_np
    from v2ce_toolbox_tpu.ops.ldati import sample_voxel_statistical
    from v2ce_toolbox_tpu.ops.samplers import (
        sample_voxel_baseline,
        sample_voxel_pure_slope,
    )

    h, w = 64, 80
    gt = synth_events(h=h, w=w)
    voxel = gen_discretized_event_volume_np(gt, (20, h, w)).reshape(
        1, 2, 10, h, w)

    streams = {"gt": gt}
    key = jax.random.key(0)
    streams["ldati"] = sample_voxel_statistical(voxel, key=key)[0]
    streams["random"] = sample_voxel_baseline(voxel, random=True, key=key)[0]
    streams["even"] = sample_voxel_baseline(voxel, even=True, key=key)[0]
    streams["slope"] = sample_voxel_pure_slope(voxel, key=key)[0]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    for name, s in streams.items():
        ax.hist(s["timestamp"], bins=60, histtype="step", label=name)
    ax.set_xlabel("t (µs)")
    ax.set_ylabel("events")
    ax.legend()
    fig.savefig(op.join(args.out_dir, "timestamp_hist.png"), dpi=120)

    for name, s in streams.items():
        plot_raw_events_xyt(s, save_path=op.join(args.out_dir,
                                                 f"xyt_{name}.png"))
        print(f"{name}: {len(s)} events")
    print(f"wrote plots to {args.out_dir}")


if __name__ == "__main__":
    main()
